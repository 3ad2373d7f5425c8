"""Drift detection: snapshot a query's result set at two times and diff.

Reference: driftdetect/detect_deviations.py:70-117 —
``perform_drift_detection`` validates the two states ran the same query,
then ``compare_states`` (:92-117) computes new = end - start and
missing = start - end over row tuples, splitting ``|``-joined multi-value
fields. Spark: ``exceptAll`` both directions; list-valued columns are
serialized with '|' exactly like the reference's storage format
(serializers.py:9-28).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


@dataclass(frozen=True)
class DriftState:
    """A named snapshot of a validation query's results
    (driftdetect/get_states.py:111-160). ``query`` carries the validation
    query text so archive loads can validate cross-snapshot identity
    (detect_deviations.py:82-87)."""

    name: str
    properties: tuple[str, ...]
    results: DataFrame
    query: str | None = None


def snapshot(name: str, df: DataFrame) -> DriftState:
    """Serialize list columns to '|'-joined strings (the reference's storage
    format) so set-difference works on flat tuples."""
    cols = []
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, ArrayType):
            cols.append(F.array_join(F.col(f_.name).cast("array<string>"), "|").alias(f_.name))
        else:
            cols.append(F.col(f_.name))
    return DriftState(name=name, properties=tuple(df.columns), results=df.select(*cols))


def compare_states(start: DriftState, end: DriftState) -> DataFrame:
    """Rows with status 'new' (in end only) / 'missing' (in start only) —
    detect_deviations.py:92-117 run in both directions."""
    if start.properties != end.properties:
        raise ValueError(
            f"cannot diff states with different properties: {start.properties} vs {end.properties}"
        )
    new = end.results.exceptAll(start.results).withColumn("status", F.lit("new"))
    missing = start.results.exceptAll(end.results).withColumn("status", F.lit("missing"))
    return new.unionByName(missing)
