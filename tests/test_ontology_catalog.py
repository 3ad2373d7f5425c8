"""Ontology catalog + mapping-spec compiler unit tests
(reference models/ontology/labels.py, mapping/specs.py,
graph/querybuilder.py:24-415)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cartography_spark.functions.ontology_catalog import (
    ONTOLOGY_LABELS,
    OntologyFieldMapping,
    OntologyNodeMapping,
    apply_node_mapping,
    compile_field,
    labels_df,
)


def test_catalog_has_all_42_labels(spark):
    assert len(ONTOLOGY_LABELS) == 42
    df = labels_df(spark)
    assert df.count() == 42
    names = {r.label for r in df.collect()}
    for expected in ("ComputeInstance", "UserAccount", "Tenant", "ObjectStorage",
                     "Ontology", "CVE", "VirtualNetwork"):
        assert expected in names


def test_to_boolean_semantics(spark):
    # querybuilder.py:41-56: castable keeps truth, other non-null -> true,
    # null -> false
    df = spark.createDataFrame(
        [("true",), ("false",), ("garbage",), (None,)], "v string"
    )
    out = df.select(
        compile_field(
            OntologyFieldMapping("f", "v", special_handling="to_boolean")
        ).alias("b")
    ).collect()
    assert [r.b for r in out] == [True, False, True, False]


def test_static_value_and_mapping(spark):
    df = spark.createDataFrame([(0,), (1,), (7,)], "k int")
    out = df.select(
        compile_field(
            OntologyFieldMapping("s", "", special_handling="static_value",
                                 extra={"value": "fixed"})
        ).alias("s"),
        compile_field(
            OntologyFieldMapping("m", "k", special_handling="mapping",
                                 extra={"map": {0: "builtin", 1: "custom"}})
        ).alias("m"),
    ).collect()
    assert [(r.s, r.m) for r in out] == [
        ("fixed", "builtin"), ("fixed", "custom"), ("fixed", None)
    ]


def test_required_field_eligibility(spark):
    df = spark.createDataFrame([("a", "x"), ("b", None)], "id string, email string")
    nm = OntologyNodeMapping(
        node_label="User",
        fields=(OntologyFieldMapping("email", "email", required=True),),
    )
    out = {r.id: r._ont_eligible for r in apply_node_mapping(df, nm).collect()}
    assert out == {"a": True, "b": False}


def test_unknown_handler_raises():
    with pytest.raises(ValueError, match="unknown special_handling"):
        compile_field(OntologyFieldMapping("x", "c", special_handling="bogus"))


def test_mapping_stays_in_one_codegen_select(spark):
    # the whole projection must be a single Project over the scan: no
    # shuffle, no extra exchange
    df = spark.createDataFrame([("a", 1)], "id string, k int")
    nm = OntologyNodeMapping(
        node_label="X",
        fields=(
            OntologyFieldMapping("plain", "id"),
            OntologyFieldMapping("kind", "k", special_handling="mapping",
                                 extra={"map": {1: "one"}}),
        ),
    )
    plan = apply_node_mapping(df, nm)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
