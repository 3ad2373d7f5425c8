"""Ontology field mappings: project provider-specific columns into
normalized ``_ont_*`` columns at ingest time with per-field transforms.

Reference: cartography/graph/querybuilder.py:24-415 — the transforms are
``invert_boolean``, ``to_boolean``, ``equal_boolean``, ``or_boolean``,
``nor_boolean``, value ``mapping`` (a CASE expression) and ``coalesce``.
Spark-native: each transform is a Column expression, so the whole
projection stays inside whole-stage codegen; applying N mappings is one
``select`` — no extra pass over the data.

Cast semantics mirror Cypher's lenient ``toBooleanOrNull`` (null on bad
input), which is exactly Spark's ``try_cast``.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_boolean(col: Column | str) -> Column:
    """Lenient boolean cast — null on uncastable input (toBooleanOrNull,
    querybuilder.py:30-56)."""
    return F.col(col).try_cast("boolean") if isinstance(col, str) else col.try_cast("boolean")


def invert_boolean(col: Column | str) -> Column:
    return ~to_boolean(col)


def equal_boolean(col: Column | str, value: Any) -> Column:
    """True iff the column equals the given value (null-safe: null input
    yields false, matching the reference's CASE ... THEN true ELSE false)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.eqNullSafe(F.lit(value))


def or_boolean(*cols: Column | str) -> Column:
    """True if ANY of the inputs is true; nulls treated as false."""
    out = F.lit(False)
    for c in cols:
        out = out | F.coalesce(to_boolean(c), F.lit(False))
    return out


def nor_boolean(*cols: Column | str) -> Column:
    """True if NONE of the inputs is true."""
    return ~or_boolean(*cols)


def value_mapping(col: Column | str, mapping: Mapping[Any, Any], default: Any = None) -> Column:
    """CASE WHEN col = k THEN v ... ELSE default — the reference compiles
    ontology ``mapping`` dicts to exactly this shape."""
    c = F.col(col) if isinstance(col, str) else col
    out: Column | None = None
    for k, v in mapping.items():
        out = F.when(c == F.lit(k), F.lit(v)) if out is None else out.when(c == F.lit(k), F.lit(v))
    assert out is not None, "mapping must be non-empty"
    return out.otherwise(F.lit(default))


def ont_coalesce(*cols: Column | str) -> Column:
    return F.coalesce(*[F.col(c) if isinstance(c, str) else c for c in cols])


def apply_ontology_mappings(df: DataFrame, mappings: Mapping[str, Column]) -> DataFrame:
    """Attach ``_ont_<name>`` columns in one select (single codegen stage)."""
    return df.select(
        "*", *[expr.alias(f"_ont_{name}") for name, expr in mappings.items()]
    )
