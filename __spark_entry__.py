"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship 5-hop revenue query at sf0.001;
``queries()``/``oracle_sql()`` expose the full SURVEY §2 operator inventory
from :mod:`cartography_spark.plans.registry`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cartography_spark.plans.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cartography_spark.plans.inventory_relational import q_multihop

    return q_multihop(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (omitted entries get a
    rows-only check)."""
    return all_oracles()
