"""BPE-merge trainer tests (operators/bpe.py): hand-computed merges and the
greedy non-overlapping application order."""

from cartography_spark.operators.bpe import bpe_learn_merges, bpe_segment


def test_learn_merges_hand_example(spark):
    docs = spark.createDataFrame(
        [(1, "aa ab"), (2, "ab ab")], "doc_id long, text string"
    )
    rows = bpe_learn_merges(docs, n_merges=2).orderBy("rank").collect()
    assert [(r["rank"], r["lhs"], r["rhs"], r["merged"], r["weight"]) for r in rows] == [
        (1, "a", "b", "ab", 3),
        (2, "a", "a", "aa", 1),
    ]


def test_apply_is_greedy_non_overlapping(spark):
    # "aaa" under merge (a,a): left-to-right gives [aa, a], never [a, aa]
    # and never a double-merge into one symbol
    docs = spark.createDataFrame([(1, "aaa aaaa")], "doc_id long, text string")
    seg = bpe_segment(docs, [("a", "a")]).collect()[0]
    # aaa -> [aa, a] (2 symbols); aaaa -> [aa, aa] (2 symbols)
    assert seg["n_words"] == 2 and seg["n_symbols"] == 4


def test_merge_then_merged_symbol_pairs(spark):
    # after (a,b)->ab, the pair (ab, c) is countable and mergeable
    docs = spark.createDataFrame([(1, "abc abc abc")], "doc_id long, text string")
    rows = bpe_learn_merges(docs, n_merges=2).orderBy("rank").collect()
    assert (rows[0]["lhs"], rows[0]["rhs"]) == ("a", "b")
    assert (rows[1]["lhs"], rows[1]["rhs"], rows[1]["merged"]) == ("ab", "c", "abc")


def test_merge_application_preserves_words(spark):
    """Property: applying ANY learned merge sequence never changes the
    underlying word — removing the symbol separators always reconstructs
    the original corpus tokens (segmentation is a partition, not a
    rewrite)."""
    from pyspark.sql import functions as F

    from cartography_spark.operators.bpe import _apply_merge, word_freqs
    from cartography_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    wf = word_freqs(docs)
    for pair in [("e", "r"), ("t", "h"), ("th", "e"), ("a", "n")]:
        wf = _apply_merge(wf, *pair)
    bad = wf.filter(F.replace(F.col("sym"), F.lit(" "), F.lit("")) != F.col("word"))
    assert bad.count() == 0
