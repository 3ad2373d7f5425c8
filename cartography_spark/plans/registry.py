"""Query registry: every implemented operator from SURVEY.md §2 is declared
here as a (spark_builder, oracle_sql) pair.

- ``spark_builder(spark, sf_dir) -> DataFrame`` builds the declarative
  DataFrame plan (Catalyst optimizes it).
- ``oracle_sql`` is ANSI SQL that DuckDB runs over the same parquet views;
  the driver hash-compares both result sets (order-insensitive, columns
  sorted by name) — so column names and rounding must agree exactly.

Entries with ``oracle_sql=None`` are genuinely non-SQL-expressible and get a
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a query spec."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return wrap


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Importing the inventory modules populates REGISTRY.
    import cartography_spark.plans.inventory_relational  # noqa: F401
    import cartography_spark.plans.inventory_lifecycle  # noqa: F401
    import cartography_spark.plans.inventory_llm  # noqa: F401
    import cartography_spark.plans.inventory_extended  # noqa: F401
    import cartography_spark.plans.inventory_prep  # noqa: F401
    import cartography_spark.plans.inventory_graph  # noqa: F401
    import cartography_spark.plans.inventory_catalog  # noqa: F401
    import cartography_spark.plans.inventory_analytics  # noqa: F401
    import cartography_spark.plans.inventory_warehouse  # noqa: F401
    import cartography_spark.plans.inventory_scale  # noqa: F401

    return {name: spec.spark for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    all_queries()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
