"""Bucketed co-located join: the shuffle is paid at write time, so the
join plan must contain NO Exchange on either side — and results must
equal the plain join."""

from __future__ import annotations

from cartography_spark.sources.bucketed import bucketed_join, write_bucketed
from cartography_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def test_bucketed_join_is_exchange_free(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderdate")
    try:
        write_bucketed(li, "li_b", "l_orderkey", 8)
        write_bucketed(orders, "ord_b", "o_orderkey", 8)
        joined = bucketed_join(spark, "li_b", "ord_b", "l_orderkey", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides pre-bucketed on the key
        assert joined.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_mismatch_still_correct(spark):
    """A bucketed-vs-unbucketed join falls back to shuffling only the
    unbucketed side when bucket counts allow — correctness never depends
    on layout."""
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    try:
        write_bucketed(li, "li_b2", "l_orderkey", 8)
        got = (
            spark.table("li_b2")
            .hint("merge")
            .join(orders, spark.table("li_b2").l_orderkey == orders.o_orderkey)
            .count()
        )
        assert got == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b2")
