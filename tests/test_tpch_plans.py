"""Plan-shape gates for the TPC-H completion set: the physical plans the
100 TB deployment needs, not just correct answers at sf0.01."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _reg():
    from cartography_spark.plans.registry import REGISTRY, all_queries

    all_queries()
    return REGISTRY


def test_q9_dims_all_broadcast(spark):
    """Q9 joins lineitem to part and supplier⋈nation — every build side is
    a filtered dimension, so the fact table must never shuffle for a join
    (broadcast hash joins only; the single exchange is the final agg)."""
    plan = _plan(_reg()["tpch_q9_product_profit"].spark(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q6_pure_scan_aggregate(spark):
    """Q6 is scan→filter→agg: the shipdate band must reach the parquet
    scan as a pushed filter and the plan must contain no join at all."""
    plan = _plan(_reg()["tpch_q6_forecast_revenue"].spark(spark, SF_SMOKE))
    assert "Join" not in plan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q17_decorrelated_equi_join(spark):
    """Q17's correlated AVG must plan as a grouped aggregate equi-joined
    back on l_partkey — hash join, never a per-row nested-loop probe."""
    plan = _plan(_reg()["tpch_q17_small_qty_revenue"].spark(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q2_min_join_back_is_hash(spark):
    """Q2's decorrelated min rejoins offers on (p_partkey, offer_cents):
    both the aggregate and the join key on the same columns, hash-joined."""
    plan = _plan(_reg()["tpch_q2_min_cost_offer"].spark(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan


def test_q3_limit_has_total_order(spark):
    """The top-10 must be deterministic: TakeOrderedAndProject carries the
    (revenue desc, orderkey asc) tiebreak instead of a bare CollectLimit."""
    plan = _plan(_reg()["tpch_q3_shipping_priority"].spark(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "l_orderkey" in plan.split("TakeOrderedAndProject")[1][:300]
