"""Analysis DSL effect tests (reference graph/analysis.py:71-150 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cartography_spark.plans.analysis import (
    AddRelationship,
    AddToSet,
    AnalysisJob,
    AnalysisStatement,
    SetProperty,
    SetRelationshipProperty,
)
from cartography_spark.plans.inventory_lifecycle import base_catalog
from cartography_spark.plans.query import match


def test_set_property_and_rerun(spark, sf_dir):
    cat = base_catalog(spark, sf_dir)

    def matcher(c):
        return match(c, "Supplier", "s").where(F.col("s__acctbal") > 5000).df

    job = AnalysisJob(
        "flag", (AnalysisStatement(matcher, (SetProperty("Supplier", "s__id", "rich", True),)),)
    )
    job.run(cat, 200)
    sup = cat.node("Supplier")
    flagged = {r.id for r in sup.filter(F.col("rich") == True).collect()}  # noqa: E712
    expect = {r.id for r in sup.filter(F.col("acctbal") > 5000).collect()}
    assert flagged == expect
    # rerun with a narrower match: previously flagged nodes are cleared
    def matcher2(c):
        return match(c, "Supplier", "s").where(F.col("s__acctbal") > 9000).df

    AnalysisJob(
        "flag", (AnalysisStatement(matcher2, (SetProperty("Supplier", "s__id", "rich", True),)),)
    ).run(cat, 300)
    sup2 = cat.node("Supplier")
    assert sup2.filter((F.col("rich") == True) & (F.col("acctbal") <= 9000)).count() == 0  # noqa: E712


def test_add_to_set_dedup(spark, sf_dir):
    cat = base_catalog(spark, sf_dir)

    def matcher(c):
        return c.node("Supplier").select(F.col("id").alias("sid"), F.lit("tag-a").alias("v"))

    eff = AddToSet("Supplier", "sid", "tags", F.col("v"))
    AnalysisJob("t", (AnalysisStatement(matcher, (eff,)),)).run(cat, 200)
    AnalysisJob("t", (AnalysisStatement(matcher, (eff,)),)).run(cat, 300)
    rows = cat.node("Supplier").select("tags").collect()
    assert all(r.tags == ["tag-a"] for r in rows), "AddToSet must dedup across reruns"


def test_add_to_set_non_string_values(spark, sf_dir):
    # the empty-array base must adopt the value's element type (int here) —
    # a hardcoded array<string> base would fail to concat
    cat = base_catalog(spark, sf_dir)

    def matcher(c):
        return c.node("Supplier").select(
            F.col("id").alias("sid"), F.col("s_nationkey").cast("int").alias("v")
        )

    eff = AddToSet("Supplier", "sid", "nation_set", F.col("v"))
    AnalysisJob("t", (AnalysisStatement(matcher, (eff,)),)).run(cat, 200)
    rows = cat.node("Supplier").select("s_nationkey", "nation_set").collect()
    assert all(r.nation_set == [r.s_nationkey] for r in rows)


def test_set_relationship_property(spark, sf_dir):
    cat = base_catalog(spark, sf_dir)
    key = ("Supplier", "LOCATED_IN", "Nation")

    def matcher(c):
        return c.edge(*key).select("src_id", "dst_id").limit(0)

    # set on ALL edges via a full matcher
    def matcher_all(c):
        return c.edge(*key).select("src_id", "dst_id", F.lit("verified").alias("v"))

    eff = SetRelationshipProperty(key, "src_id", "dst_id", "status", F.col("v"))
    AnalysisJob("rp", (AnalysisStatement(matcher_all, (eff,)),)).run(cat, 200)
    e = cat.edge(*key)
    assert e.filter(F.col("status") == "verified").count() == e.count()


def test_add_relationship_cleanup_scoping(spark, sf_dir):
    cat = base_catalog(spark, sf_dir)

    def matcher(c):
        return (
            match(c, "Order", "o")
            .out("PLACED_BY", "Customer", "cu")
            .df.select(F.col("cu__id").alias("src"), F.col("o__id").alias("dst"))
        )

    eff = AddRelationship("Customer", "HAS_ORDER", "Order", "src", "dst")
    AnalysisJob("d", (AnalysisStatement(matcher, (eff,)),)).run(cat, 200)
    n1 = cat.edge("Customer", "HAS_ORDER", "Order").count()
    assert n1 > 0
    # narrower rerun -> auto-cleanup shrinks the derived edge table
    def matcher2(c):
        return matcher(c).limit(10)

    AnalysisJob("d", (AnalysisStatement(matcher2, (eff,)),)).run(cat, 300)
    assert cat.edge("Customer", "HAS_ORDER", "Order").count() == 10
