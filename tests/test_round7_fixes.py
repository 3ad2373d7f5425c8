"""Round-7 regression tests for the four round-6 ADVICE findings:
degenerate-input guards in gini_concentration and welch_ttest, the
token_f1_pairs one-row-per-pair contract for fully-empty pairs, and the
degree-assortativity documented headroom (sanity-checked numerically).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_gini_all_zero_values_yields_null_not_error(spark):
    from cartography_spark.operators.profiling import gini_concentration

    df = spark.createDataFrame([(i, 0) for i in range(5)], "id long, x long")
    out = gini_concentration(df, "id", "x").head()
    assert out.n == 5 and out.total == 0
    assert out.gini_num == 0 and out.gini_den == 0
    # 0/0 must surface as NULL, not NaN -> ANSI cast error
    assert out.gini_micros is None


def test_gini_unchanged_on_regular_input(spark):
    from cartography_spark.operators.profiling import gini_concentration

    # one holder has everything: G = (n-1)/n = 0.75 for n=4
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 100)], "id long, x long"
    )
    out = gini_concentration(df, "id", "x").head()
    assert out.gini_micros == 750_000


def test_welch_singleton_arm_yields_null_not_error(spark):
    from cartography_spark.operators.profiling import welch_ttest

    # arm b has n=1: no sample variance exists -> NULL t/df, not an
    # Inf/NaN that crashes the bigint quantization under ANSI
    rows = [("a", 10), ("a", 12), ("a", 14), ("b", 20)]
    df = spark.createDataFrame(rows, "grp string, x long")
    out = welch_ttest(df, "grp", "x", "a", "b").head()
    assert out.n_a == 3 and out.n_b == 1
    assert out.t_micros is None and out.df_milli is None
    assert out.reject_95 is None


def test_welch_empty_arm_yields_null_not_error(spark):
    from cartography_spark.operators.profiling import welch_ttest

    rows = [("a", 10), ("a", 12), ("a", 14)]
    df = spark.createDataFrame(rows, "grp string, x long")
    out = welch_ttest(df, "grp", "x", "a", "b").head()
    assert out.n_b == 0
    assert out.t_micros is None and out.df_milli is None


def test_token_f1_fully_empty_pair_kept_as_zero_row(spark):
    from cartography_spark.operators.textstats import token_f1_pairs

    pairs = spark.createDataFrame(
        [
            (0, "the cat sat", "the cat sat"),
            (1, "", ""),          # zero tokens on BOTH sides
            (2, "!!!", "???"),    # tokenizes to zero tokens on both sides
            (3, "dog", ""),       # candidate-only tokens
        ],
        "pair_id long, cand_text string, ref_text string",
    )
    out = {r.pair_id: r for r in token_f1_pairs(pairs).collect()}
    assert set(out) == {0, 1, 2, 3}, "one row per pair, including empty pairs"
    assert out[0].f1_micros == 1_000_000
    for pid in (1, 2):
        r = out[pid]
        assert (r.n_overlap, r.cand_len, r.ref_len, r.f1_micros) == (0, 0, 0, 0)
    assert out[3].cand_len == 1 and out[3].ref_len == 0 and out[3].f1_micros == 0


def test_assortativity_moments_match_documented_bound(spark):
    from cartography_spark.operators.graph import degree_assortativity

    # star graph K_{1,3}: hub degree 3, leaves degree 1 -> r = -1
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    out = degree_assortativity(edges).head()
    # symmetrized: 6 directed edges; sum_dx2 = 3*9 + 3*1 = 30 <= 2E*maxdeg^2
    assert out.n_edges == 6
    assert out.sum_dx2 == 30 and out.sum_dy2 == 30
    assert out.sum_dx2 <= 2 * out.n_edges * 9
    assert out.assortativity_micros == -1_000_000
