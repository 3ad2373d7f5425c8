"""Parquet scan source.

The reference's "get" stage paginates provider APIs into ``list[dict]``
(cartography/intel/aws/ec2/instances.py:95-109); our batch inputs are
columnar parquet scans, which Catalyst serves with predicate pushdown and
column pruning for free. Keep ``spark.read.parquet`` declarative — never
collect-and-recreate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes the events table's NANOS
    timestamps (illegal for Spark's vectorized parquet reader) to a proper
    TimestampType column via integer division — ``ts DIV 1000`` keeps exact
    long arithmetic (a double divide would lose microseconds at 1.7e18 ns).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(raw.dtypes)["ts"]
        if ts_type == "bigint":
            return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        # already a physical timestamp (possibly NTZ); session tz is UTC so
        # the cast is value-preserving and gives downstream windows/watermarks
        # the TimestampType they expect
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TPCH_TABLES) -> dict[str, DataFrame]:
    """Load the driver-generated synthetic tables as DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in tables}


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TPCH_TABLES) -> dict[str, DataFrame]:
    """Load tables and register them as temp views for ``spark.sql``."""
    dfs = load_tables(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
