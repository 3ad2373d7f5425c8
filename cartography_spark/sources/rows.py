"""Row-oriented input: the reference ingests ``list[dict]`` batches from JSON
APIs (cartography/client/core/tx.py:637-698, 10k-row batches). In Spark a
whole batch is one DataFrame; schema is supplied explicitly so absent dict
keys become typed nulls (same semantics as Cypher's missing-property null).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def rows_to_df(spark: SparkSession, rows: Iterable[Mapping[str, Any]], schema: StructType) -> DataFrame:
    """Create a DataFrame from dict rows with an explicit schema.

    Missing keys -> null (matches the reference's tolerance of sparse dicts);
    extra keys are dropped (the reference only SETs declared properties,
    cartography/graph/querybuilder.py:1266-1279).
    """
    names = set(schema.fieldNames())
    cleaned = [{k: v for k, v in r.items() if k in names} for r in rows]
    return spark.createDataFrame(cleaned, schema)
