"""GraphJob JSON round-trip, SQL statements over catalog views, sync
orchestration, sync metadata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cartography_spark.plans.inventory_lifecycle import base_catalog
from cartography_spark.plans.job import GraphJob, GraphStatement, merge_sync_metadata
from cartography_spark.sync import Sync


def test_graph_job_sql_and_write(spark, sf_dir):
    cat = base_catalog(spark, sf_dir)
    job = GraphJob(
        name="flag rich suppliers",
        short_name="rich",
        statements=(
            GraphStatement(
                query="SELECT *, acctbal > $THRESHOLD AS rich FROM n_Supplier",
                writes="Supplier",
            ),
            GraphStatement(query="SELECT count(*) AS n FROM n_Supplier WHERE rich"),
        ),
    )
    results = job.run(cat, {"THRESHOLD": 5000})
    n_rich = results[1].head().n
    assert n_rich == cat.node("Supplier").filter(F.col("acctbal") > 5000).count()


def test_graph_job_json_roundtrip(spark, sf_dir):
    job = GraphJob(
        name="cleanup stale",
        statements=(
            GraphStatement(
                query="SELECT * FROM n_Supplier WHERE lastupdated = $UPDATE_TAG",
                writes="Supplier",
            ),
        ),
    )
    blob = job.as_json(indent=2)
    restored = GraphJob.from_json(blob)
    assert restored == job
    cat = base_catalog(spark, sf_dir)
    before = cat.node("Supplier").count()
    restored.run(cat, {"UPDATE_TAG": 100})
    assert cat.node("Supplier").count() == before  # everything is fresh at T1


def test_graph_job_fail_fast(spark, sf_dir):
    cat = base_catalog(spark, sf_dir)
    job = GraphJob(
        name="bad",
        statements=(GraphStatement(query="SELECT * FROM does_not_exist"),),
    )
    with pytest.raises(RuntimeError, match="failed at statement 0"):
        job.run(cat)


def test_sync_stages_and_metadata(spark, sf_dir):
    cat = base_catalog(spark, sf_dir)
    ran = []

    def stage_a(c, cfg):
        ran.append(("a", cfg["UPDATE_TAG"]))
        merge_sync_metadata(c, "Region", "0", "Supplier", cfg["UPDATE_TAG"])

    def stage_fail(c, cfg):
        raise ValueError("boom")

    def stage_b(c, cfg):
        ran.append(("b", cfg["UPDATE_TAG"]))

    s = Sync()
    s.add_stage("a", stage_a)
    s.add_stage("fail", stage_fail)
    s.add_stage("b", stage_b)

    errors = s.run(cat, {"UPDATE_TAG": 999}, best_effort=True)
    assert list(errors) == ["fail"] and [r[0] for r in ran] == ["a", "b"]
    md = cat.node("SyncMetadata").collect()
    assert len(md) == 1 and md[0].syncedtype == "Supplier" and md[0].lastupdated == 999
    # metadata upsert: re-sync updates lastupdated, keeps firstseen
    merge_sync_metadata(cat, "Region", "0", "Supplier", 1000)
    md2 = cat.node("SyncMetadata").collect()
    assert len(md2) == 1 and md2[0].lastupdated == 1000 and md2[0].firstseen == 999

    with pytest.raises(RuntimeError, match="stage 'fail' failed"):
        s.run(cat, {"UPDATE_TAG": 1001}, best_effort=False)


def test_sync_dependency_gating(spark, sf_dir):
    """A stage with unmet prerequisites is SKIPPED, not failed
    (run_analysis_and_ensure_deps semantics)."""
    cat = base_catalog(spark, sf_dir)
    ran = []

    def ok(name):
        return lambda c, cfg: ran.append(name)

    def failing(c, cfg):
        raise ValueError("boom")

    s = Sync()
    s.add_stage("ingest", ok("ingest"))
    s.add_stage("broken", failing)
    s.add_stage("analysis", ok("analysis"), requires=("ingest",))
    s.add_stage("gated-off", ok("gated-off"), requires=("broken",))

    errors = s.run(cat, best_effort=True)
    assert ran == ["ingest", "analysis"]
    assert list(errors) == ["broken"]
    assert s.skipped == ["gated-off"]


def test_sync_records_stage_metrics(spark):
    """Every executed stage leaves a timer metric (the statsd-parity
    surface: reference sync.py:431-438); skipped stages leave none."""
    from cartography_spark.catalog import GraphCatalog
    from cartography_spark.sync import Sync

    s = Sync()
    s.add_stage("a", lambda c, cfg: None)
    s.add_stage("b", lambda c, cfg: None, requires=("missing",))
    errs = s.run(GraphCatalog(spark))
    assert errs == {} and s.skipped == ["b"]
    assert [m["stage"] for m in s.metrics] == ["a"]
    m = s.metrics[0]
    assert m["status"] == "ok" and m["wall_s"] >= 0


def test_sync_metrics_on_best_effort_error(spark):
    """best_effort keeps going and records the failing stage's metric."""
    from cartography_spark.catalog import GraphCatalog
    from cartography_spark.sync import Sync

    def boom(c, cfg):
        raise ValueError("nope")

    s = Sync()
    s.add_stage("bad", boom)
    s.add_stage("good", lambda c, cfg: None)
    errs = s.run(GraphCatalog(spark), best_effort=True)
    assert set(errs) == {"bad"}
    assert [(m["stage"], m["status"]) for m in s.metrics] == [
        ("bad", "error"),
        ("good", "ok"),
    ]
