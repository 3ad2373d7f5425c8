"""Graph algorithms on hand-checkable graphs: the oracle gate proves
engine-vs-engine agreement at data scale; these prove the absolute
semantics on graphs small enough to verify by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from cartography_spark.operators.graph import (
    PR_SCALE,
    bellman_ford,
    connected_components,
    orient_by_degree,
    pagerank_exact,
    symmetrize,
    triangle_count,
)


def _edges(spark, pairs, cols=("u", "v")):
    return spark.createDataFrame(pairs, list(cols))


def test_triangle_count_k4(spark):
    # K4 has exactly C(4,3)=4 triangles and 6 edges.
    k4 = _edges(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    row = triangle_count(k4).collect()[0]
    assert row.n_triangles == 4 and row.n_edges == 6


def test_triangle_count_none_in_bipartite(spark):
    # Bipartite graphs are triangle-free.
    bip = _edges(spark, [(a, b) for a in (0, 1, 2) for b in (10, 11)])
    assert triangle_count(bip).collect()[0].n_triangles == 0


def test_orientation_preserves_edge_count(spark):
    star = _edges(spark, [(0, i) for i in range(1, 6)] + [(1, 2)])
    assert orient_by_degree(star).count() == star.count()


def test_connected_components_two_chains(spark):
    # Chain 1-2-3-4 and chain 10-11; component = min node id.
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {r.node: r.comp for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    # 40-node path: path-halving must finish well under max_iterations.
    e = _edges(spark, [(i, i + 1) for i in range(40)])
    comps = {r.comp for r in connected_components(e, max_iterations=15).collect()}
    assert comps == {0}


def test_bellman_ford_prefers_cheap_detour(spark):
    # 1->2 costs 10 direct, but 1->3->2 costs 1+1=2; node 4 via 2.
    e = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (3, 2, 1), (2, 4, 1)], "src LONG, dst LONG, w LONG"
    )
    got = {r.node: r.cost for r in bellman_ford(e, source=1, rounds=4).collect()}
    assert got == {1: 0, 2: 2, 3: 1, 4: 3}


def test_bellman_ford_hop_bound_semantics(spark):
    # With rounds=1 only the direct (expensive) edge is visible.
    e = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (3, 2, 1)], "src LONG, dst LONG, w LONG"
    )
    got = {r.node: r.cost for r in bellman_ford(e, source=1, rounds=1).collect()}
    assert got[2] == 10 and got[3] == 1


def test_pagerank_symmetric_pair_is_uniform(spark):
    # Two nodes with one symmetric edge: rank stays at the fixed point
    # base + 85% of the other's full rank share = SCALE/2 (mod flooring).
    e = symmetrize(_edges(spark, [(1, 2)]), "u", "v")
    rows = {r.node: r.r for r in pagerank_exact(e, iterations=3).collect()}
    assert rows[1] == rows[2]
    assert abs(rows[1] - PR_SCALE // 2) <= 2  # flooring loss only


def test_pagerank_hub_outranks_leaves(spark):
    # Star graph: the hub accumulates every leaf's full contribution.
    e = symmetrize(_edges(spark, [(0, i) for i in range(1, 6)]), "u", "v")
    rows = {r.node: r.r for r in pagerank_exact(e, iterations=5).collect()}
    assert rows[0] > max(v for k, v in rows.items() if k != 0)
    leaf_ranks = {v for k, v in rows.items() if k != 0}
    assert len(leaf_ranks) == 1  # symmetry: all leaves identical


def test_kcore_peels_tail_and_keeps_clique(spark):
    # 4-clique (nodes 1-4, degree 3 each) with a pendant chain 4-5-6.
    # k=2: node 6 (deg 1) peels in round 1, which drops 5 to deg 1 and it
    # peels in round 2 — the cascade the synchronous rounds must capture.
    from cartography_spark.operators.graph import kcore

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = spark.createDataFrame(clique + [(4, 5), (5, 6)], "u LONG, v LONG")
    got = {r.node: r.deg for r in kcore(e, k=2, rounds=4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_insufficient_rounds_is_deterministic_superset(spark):
    # With rounds=1 the 5-6 chain cascade is cut short: 5 survives round 1
    # (deg 2) and only the final filter applies — deterministic bounded
    # semantics, matching what an unrolled oracle computes.
    from cartography_spark.operators.graph import kcore

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = spark.createDataFrame(clique + [(4, 5), (5, 6)], "u LONG, v LONG")
    got = {r.node: r.deg for r in kcore(e, k=2, rounds=1).collect()}
    assert set(got) == {1, 2, 3, 4}  # 5 drops in the final degree filter


def test_label_propagation_two_triangles(spark):
    """Two triangles joined by a bridge resolve into two communities;
    deterministic min-label tie-breaks at every step."""
    from cartography_spark.operators.graph import label_propagation, symmetrize

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "a bigint, b bigint",
    )
    got = {
        r.node: r.label
        for r in label_propagation(symmetrize(edges, "a", "b"), rounds=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_neighbor_jaccard_hand_computed(spark):
    """|A∩B|/|A∪B| over item sets; pairs below threshold are dropped."""
    from cartography_spark.operators.graph import neighbor_jaccard_pairs

    rel = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "z"), (2, "x"), (2, "y"), (3, "z"), (3, "w")],
        "id bigint, item string",
    )
    got = {(r.a, r.b): r.jaccard for r in
           neighbor_jaccard_pairs(rel, "id", "item", threshold=0.5).collect()}
    # J(1,2) = 2/3, J(1,3) = 1/4 (dropped), J(2,3) = 0 (no shared item row)
    assert got == {(1, 2): round(2 / 3, 6)}


def test_modularity_hand_computed(spark):
    """Two triangles + bridge with the LPA communities: 2m=14, intra2=12,
    D_c = 7 each -> Q*(2m)^2 = 14*12 - 98 = 70, Q ~ 0.357."""
    from cartography_spark.operators.graph import (
        label_propagation,
        modularity_exact,
        symmetrize,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "a bigint, b bigint",
    )
    sym = symmetrize(edges, "a", "b")
    r = modularity_exact(sym, label_propagation(sym, rounds=3)).collect()[0]
    assert (r.two_m, r.intra2, r.q_num, r.q_micro) == (14, 12, 70, 70 * 1000000 // 196)


def test_temporal_reachability_respects_time(spark):
    """An edge departing before you arrive is unusable: 2->3 at t=3 is
    dead when node 2 is only reached at t=5; the detour via 4 wins."""
    from cartography_spark.operators.graph import temporal_reachability

    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 3), (2, 4, 7), (4, 3, 9)],
        "src bigint, dst bigint, t bigint",
    )
    got = {r.node: r.arrival for r in temporal_reachability(edges, 1, rounds=4).collect()}
    assert got == {1: 0, 2: 5, 4: 7, 3: 9}


def test_adamic_adar_weights_rare_neighbors_higher(spark):
    """A pair sharing one RARE item must outscore a pair sharing one
    POPULAR item, degree-1 items contribute nothing, and the score is the
    exact integer sum of per-item millinat weights."""
    import math

    from cartography_spark.operators.graph import adamic_adar_pairs

    rel = spark.createDataFrame(
        # item r (deg 2, rare) shared by (1,2); item p (deg 4, popular)
        # shared by (3,4),(3,5),(4,5)...; item u (deg 1) never pairs
        [(1, "r"), (2, "r"), (3, "p"), (4, "p"), (5, "p"), (6, "p"), (7, "u")],
        "id long, item string",
    )
    rows = {(r.a, r.b): r for r in adamic_adar_pairs(rel, "id", "item").collect()}
    w_r = round(1000 / math.log(2))
    w_p = round(1000 / math.log(4))
    assert rows[(1, 2)].aa_millinat == w_r
    assert rows[(3, 4)].aa_millinat == w_p
    assert w_r > w_p  # rare shared neighbor outscores popular one
    assert rows[(1, 2)].n_common == 1
    assert not any(a == 7 or b == 7 for (a, b) in rows)
