"""Boundary-semantics tests for the range join (bucket-straddling matches,
inclusive window edges) and the continuous-aggregate rollup (associative
merge equals direct aggregation, raw data scanned once)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cartography_spark.operators.rangejoin import interval_join_backward
from cartography_spark.operators.rollup import continuous_aggregate, finalize


def test_interval_join_edges_and_buckets(spark):
    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame([(1, 7, t(50))], "lid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [
            (100, 7, t(50)),  # equal ts -> included
            (101, 7, t(40)),  # exactly window lower edge (50-10) -> included
            (102, 7, t(39)),  # just outside -> excluded
            (103, 7, t(51)),  # future -> excluded
            (104, 8, t(50)),  # other key -> excluded
            (105, 7, t(45)),  # previous 10s bucket (40-49) vs left bucket (50-59)
        ],
        "event_id long, k long, ts timestamp",
    )
    out = interval_join_backward(
        left, right, by="k", ts="ts", window_seconds=10, right_cols=("event_id",)
    )
    matched = sorted(r.r_event_id for r in out.collect())
    assert matched == [100, 101, 105]


def test_rollup_merge_equals_direct(spark):
    rows = [
        (i, datetime(2024, 1, 1 + i % 3, i % 24, i % 60, 13), float(i))
        for i in range(500)
    ]
    e = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    day = finalize(continuous_aggregate(e)["day"]).orderBy("bucket").collect()
    direct = (
        e.groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
            F.round(F.min("value"), 2).alias("mn"),
            F.round(F.max("value"), 2).alias("mx"),
        )
        .orderBy("bucket")
        .collect()
    )
    assert [(r.bucket, r.n_events, r.total_value, r.min_value, r.max_value) for r in day] == [
        (r.bucket, r.n, r.s, r.mn, r.mx) for r in direct
    ]


def test_rollup_scans_raw_once(spark):
    """The hour level must be derived from minute partials — its plan must
    not contain a second scan of the raw input."""
    e = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0, 0), 1.0)], "event_id long, ts timestamp, value double"
    )
    hour = continuous_aggregate(e)["hour"]
    plan = hour._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") <= 1
