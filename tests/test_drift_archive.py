"""Drift archive lifecycle tests (reference driftdetect/get_states.py,
add_shortcut.py, detect_deviations.py:70-91)."""

from __future__ import annotations

import json
import os

import pytest

from cartography_spark.plans import driftarchive as da


def _run_query_factory(spark, rows_by_sql):
    def run(sql):
        rows = rows_by_sql[sql]
        return spark.createDataFrame(rows, "id string, tags array<string>")

    return run


def test_archive_roundtrip_and_validation(spark, tmp_path):
    root = str(tmp_path)
    da.init_query(root, "assets", "Q1")
    da.init_query(root, "users", "Q2")

    run1 = _run_query_factory(spark, {
        "Q1": [("a", ["x"]), ("b", ["y", "z"])],
        "Q2": [("u1", ["r"])],
    })
    written1 = da.get_states(root, run1, filename="t1.json")
    assert len(written1) == 2 and all(os.path.isfile(p) for p in written1)
    # '|'-joined storage format for list columns (serializers.py:9-28)
    payload = json.load(open(os.path.join(root, "assets", "t1.json")))
    assert ["b", "y|z"] in payload["results"]

    run2 = _run_query_factory(spark, {
        "Q1": [("b", ["y", "z"]), ("c", ["w"])],  # a removed, c added
        "Q2": [("u1", ["r"])],
    })
    da.get_states(root, run2, filename="t2.json")

    # shortcut points at the latest sweep
    assert da.resolve_shortcut(os.path.join(root, "assets"), "most-recent") == "t2.json"

    start = da.load_state(spark, root, "assets", "t1.json")
    end = da.load_state(spark, root, "assets", "most-recent")
    diff = {(r.id, r.status) for r in da.perform_drift_detection(start, end).collect()}
    assert diff == {("c", "new"), ("a", "missing")}

    # cross-query validation: states of different names refuse to diff
    other = da.load_state(spark, root, "users", "most-recent")
    with pytest.raises(ValueError, match="names do not match"):
        da.perform_drift_detection(start, other)

    # query-text validation: editing the template invalidates old states
    da.init_query(root, "assets", "Q1-changed")
    da.get_states(root, _run_query_factory(spark, {
        "Q1-changed": [("b", ["y", "z"])],
        "Q2": [("u1", ["r"])],
    }), filename="t3.json")
    changed = da.load_state(spark, root, "assets", "t3.json")
    with pytest.raises(ValueError, match="queries do not match"):
        da.perform_drift_detection(start, changed)
