"""Bloom-prefilter invariants: no false negatives (the join-correctness
property), real selectivity at the default sizing, and a shuffle-free
physical plan for the prefilter stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from cartography_spark.operators.bloom import bloom_build, bloom_prefilter


def test_bloom_no_false_negatives_and_exact_after_join(spark):
    small = spark.createDataFrame([(i,) for i in range(50)], "k long")
    big = spark.createDataFrame([(i % 1000, i) for i in range(5000)], "k long, payload long")
    kept = bloom_prefilter(big, small, "k", "k")
    # every true member survives the prefilter
    true_members = big.join(small, "k", "left_semi")
    assert kept.join(true_members, ["k", "payload"], "left_semi").count() == true_members.count()
    # the exact join after the prefilter equals the plain join
    a = sorted(map(tuple, kept.join(small, "k").collect()))
    b = sorted(map(tuple, big.join(small, "k").collect()))
    assert a == b


def test_bloom_is_selective(spark):
    small = spark.createDataFrame([(i,) for i in range(50)], "k long")
    big = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    kept = bloom_prefilter(big, small, "k", "k").count()
    # 50 true members; with m=1024/k=3 the false-positive rate is ~0.3%
    assert 50 <= kept < 50 + 0.05 * 5000


def test_bloom_prefilter_plan_is_shuffle_free(spark):
    small = spark.createDataFrame([(i,) for i in range(10)], "k long")
    big = spark.createDataFrame([(i,) for i in range(100)], "k long")
    plan = bloom_prefilter(big, small, "k", "k")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_bloom_bitset_deterministic(spark):
    small = spark.createDataFrame([(i,) for i in range(20)], "k long")
    b1 = bloom_build(small, "k")
    b2 = bloom_build(small.repartition(7), "k")
    assert b1 == b2 and len(b1) == 1024 and b1.count("1") <= 60
