"""Tests for the scale-path operators (plans/inventory_scale.py,
operators/incremental.py): incremental aggregate maintenance, block
checksums, transition matrix, mergeable argmax, interval overlap join."""

from __future__ import annotations

from pyspark.sql import functions as F

from cartography_spark.operators.incremental import merge_partials, partial_aggregate
from cartography_spark.plans.registry import REGISTRY, all_queries
from cartography_spark.sources.parquet import load_table

from tests.conftest import SF_SMOKE

all_queries()


def test_merge_equals_full_recompute(spark):
    """merge(partial(A), partial(B), partial(C)) == partial(A+B+C) exactly
    for any 3-way split — the algebra the maintenance path relies on."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    keys, metrics = ["l_returnflag"], ["l_quantity", "l_extendedprice"]
    splits = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    merged = merge_partials([partial_aggregate(s, keys, metrics) for s in splits], keys, metrics)
    full = partial_aggregate(li, keys, metrics)
    assert set(map(tuple, merged.collect())) == set(map(tuple, full.collect()))


def test_merge_is_order_insensitive(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    keys, metrics = ["l_linestatus"], ["l_quantity"]
    a = partial_aggregate(li.filter(F.col("l_orderkey") % 2 == 0), keys, metrics)
    b = partial_aggregate(li.filter(F.col("l_orderkey") % 2 == 1), keys, metrics)
    ab = set(map(tuple, merge_partials([a, b], keys, metrics).collect()))
    ba = set(map(tuple, merge_partials([b, a], keys, metrics).collect()))
    assert ab == ba


def test_checksum_localizes_single_row_change(spark):
    """Perturbing one row changes exactly one block's checksum and no
    other block — the property that makes block-diff reconciliation work."""
    spec = REGISTRY["table_checksum_blocks"]
    base = {r["block_id"]: (r["n_rows"], r["checksum"]) for r in spec.spark(spark, SF_SMOKE).collect()}

    li = load_table(spark, SF_SMOKE, "lineitem")
    first = li.orderBy("l_orderkey", "l_linenumber").limit(1).collect()[0]
    changed_block = (first["l_orderkey"] * 10 + first["l_linenumber"]) % 64

    mutated = li.withColumn(
        "l_quantity",
        F.when(
            (F.col("l_orderkey") == first["l_orderkey"])
            & (F.col("l_linenumber") == first["l_linenumber"]),
            F.col("l_quantity") + 1,
        ).otherwise(F.col("l_quantity")),
    )
    # rebuild fingerprints over the mutated table via the same plan shape
    from cartography_spark.plans import inventory_scale as sc_mod

    orig_loader = sc_mod.T
    try:
        sc_mod.T = lambda s, d, name: mutated if name == "lineitem" else orig_loader(s, d, name)
        after = {r["block_id"]: (r["n_rows"], r["checksum"]) for r in spec.spark(spark, SF_SMOKE).collect()}
    finally:
        sc_mod.T = orig_loader

    diff = {b for b in base if base[b] != after.get(b)}
    assert diff == {changed_block}
    assert base[changed_block][0] == after[changed_block][0]  # count unchanged


def test_transition_matrix_denominator_consistency(spark):
    rows = REGISTRY["event_transition_matrix"].spark(spark, SF_SMOKE).collect()
    by_prev: dict[str, list] = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, group in by_prev.items():
        total = group[0]["n_from_prev"]
        assert all(r["n_from_prev"] == total for r in group)
        assert sum(r["n_transitions"] for r in group) == total


def test_argmax_matches_window_top1(spark):
    """The mergeable max_by aggregate must agree with the window row_number
    formulation on every group, including ties (struct total order)."""
    got = {
        r["n_name"]: (r["top_orderkey"], r["top_price"])
        for r in REGISTRY["argmax_mergeable_top1"].spark(spark, SF_SMOKE).collect()
    }
    from pyspark.sql import Window

    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    n = load_table(spark, SF_SMOKE, "nation")
    j = o.join(c, o.o_custkey == c.c_custkey).join(n, c.c_nationkey == n.n_nationkey)
    w = Window.partitionBy("n_name").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").desc())
    expect = {
        r["n_name"]: (r["o_orderkey"], r["top_price"])
        for r in j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("n_name", "o_orderkey", F.round("o_totalprice", 2).alias("top_price"))
        .collect()
    }
    assert got == expect


def test_interval_overlap_bucketing_is_lossless(spark):
    """The bucketed equi-join plan must find exactly the pairs the naive
    quadratic theta join finds (blocking is a candidate filter, never a
    result filter)."""
    got = {
        (r["user_a"], r["user_b"]): r["n_overlaps"]
        for r in REGISTRY["interval_overlap_pairs"].spark(spark, SF_SMOKE).collect()
    }
    e = load_table(spark, SF_SMOKE, "events").filter(F.col("event_type") == "error")
    s = e.select(
        "event_id", "user_id", F.unix_micros("ts").alias("st"), (F.unix_micros("ts") + 300_000_000).alias("en")
    )
    a, b = s.alias("a"), s.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.st") <= F.col("b.en"))
            & (F.col("b.st") <= F.col("a.en")),
        )
        .groupBy(F.col("a.user_id").alias("ua"), F.col("b.user_id").alias("ub"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == {(r["ua"], r["ub"]): r["n"] for r in naive}


def test_interval_overlap_plan_has_no_cartesian(spark):
    plan = REGISTRY["interval_overlap_pairs"].spark(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_plan_scans_lineitem_twice_only(spark):
    """The maintenance query reads base and delta (two scans of the same
    file at test scale — separate partitions in production), never a third
    full-recompute scan."""
    plan = (
        REGISTRY["incremental_agg_maintenance"].spark(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("lineitem.parquet") == 2


def test_cdc_apply_hand_computed(spark):
    """Latest seq wins regardless of row order; D tombstones drop keys."""
    from cartography_spark.operators.incremental import cdc_apply

    log = spark.createDataFrame(
        [
            (1, "a", 1, "I"),
            (2, "b", 1, "I"),
            (2, "B", 2, "U"),
            (3, "c", 1, "I"),
            (3, None, 2, "D"),
            (4, "d", 5, "I"),
            (4, "stale", 3, "U"),
        ],
        "k bigint, name string, seq int, op string",
    )
    got = {r.k: r.name for r in cdc_apply(log, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}


def test_delta_join_decomposition(spark):
    """M + delta(M) == (A+dA) JOIN (B+dB), including the dAxdB corner
    (a key present ONLY in both deltas)."""
    from cartography_spark.operators.incremental import delta_join

    base_a = spark.createDataFrame([(1, "a1"), (2, "a2")], "k bigint, av string")
    delta_a = spark.createDataFrame([(3, "a3")], "k bigint, av string")
    base_b = spark.createDataFrame([(1, "b1"), (3, "b3x")], "k bigint, bv string")
    delta_b = spark.createDataFrame([(2, "b2"), (3, "b3y")], "k bigint, bv string")
    m = base_a.join(base_b, ["k"])
    dm = delta_join(base_a, delta_a, base_b, delta_b, ["k"])
    got = sorted(tuple(r) for r in m.unionByName(dm).collect())
    full = base_a.unionByName(delta_a).join(base_b.unionByName(delta_b), ["k"])
    assert got == sorted(tuple(r) for r in full.collect())
