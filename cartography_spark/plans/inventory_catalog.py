"""Catalog-engine utilities inventory: profiling, fuzzy entity
resolution, and multi-dimensional layout.

The reference's whole reason to exist is cataloguing assets and their
relationships (SURVEY §1). These queries are that mission applied to
tabular data:

- ``table_profile``: per-column inventory stats in one scan — the
  tabular analogue of the reference's node/property introspection
  (cartography/client/core/tx.py read helpers).
- ``entity_resolution_fuzzy``: blocked fuzzy matching (levenshtein
  within an equality block) — the approximate version of the
  reference's exact MatchLink (querybuilder.py:1755); blocking keeps
  the candidate space linear, never all-pairs.
- ``layout_zorder``: Morton-interleaved clustering key over two query
  dimensions — the data-layout lever (Delta/Iceberg OPTIMIZE ZORDER)
  that makes file skipping work for either predicate at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cartography_spark.operators.profiling import profile_table, zorder_key, zorder_sql
from cartography_spark.plans.registry import query
from cartography_spark.sources.parquet import load_table as T


@query(
    "table_profile",
    oracle="""
    WITH o AS (SELECT *, date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS o_epoch_day FROM orders)
    SELECT 'o_orderkey' AS col_name,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS DOUBLE) AS min_num, CAST(max(o_orderkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM o
    UNION ALL
    SELECT 'o_custkey', CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_custkey), CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
           NULL, NULL FROM o
    UNION ALL
    SELECT 'o_totalprice', CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_totalprice), min(o_totalprice), max(o_totalprice), NULL, NULL FROM o
    UNION ALL
    SELECT 'o_epoch_day', CAST(sum(CASE WHEN o_epoch_day IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_epoch_day), CAST(min(o_epoch_day) AS DOUBLE), CAST(max(o_epoch_day) AS DOUBLE),
           NULL, NULL FROM o
    UNION ALL
    SELECT 'o_orderstatus', CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderstatus), NULL, NULL, min(o_orderstatus), max(o_orderstatus) FROM o
    UNION ALL
    SELECT 'o_orderpriority', CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderpriority), NULL, NULL, min(o_orderpriority), max(o_orderpriority) FROM o
    """,
    doc="One-scan per-column profile of orders (operators/profiling.py:"
    "profile_table): nulls, distinct counts, numeric/string ranges. Spark "
    "computes all 20 aggregates in a single pass (count-distincts share "
    "one Expand) then explodes to rows; the oracle re-scans per column.",
    tags=("profiling", "catalog"),
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").withColumn(
        "o_epoch_day", F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long")
    )
    return profile_table(
        o,
        numeric_cols=["o_orderkey", "o_custkey", "o_totalprice", "o_epoch_day"],
        string_cols=["o_orderstatus", "o_orderpriority"],
    )


@query(
    "entity_resolution_fuzzy",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM names a JOIN names b
      ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= 4
    """,
    doc="Blocked fuzzy entity resolution over part names: equality block "
    "on the noun token, levenshtein<=4 within the block. The approximate "
    "MatchLink (reference's exact-key matchlink: querybuilder.py:1755). "
    "Blocking turns the all-pairs O(n^2) into per-block candidates — at "
    "scale the block key is the shuffle key and skewed blocks get salted "
    "like any hot aggregation key.",
    tags=("join", "fuzzy", "catalog"),
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = T(spark, sf_dir, "part").select("p_name").distinct()
    blk = lambda c: F.element_at(F.split(F.col(c), " "), 2)  # noqa: E731
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(
            b,
            (blk("name_a") == blk("name_b"))
            & (F.col("name_a") < F.col("name_b"))
            & (F.levenshtein("name_a", "name_b") <= 4),
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
        )
    )


@query(
    "layout_zorder",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey,
             o_custkey % 65536 AS x,
             date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) % 65536 AS y
      FROM orders
    )
    SELECT o_orderkey, CAST({zorder_sql("x", "y")} AS BIGINT) AS zval
    FROM o ORDER BY zval ASC, o_orderkey ASC LIMIT 50
    """,
    doc="Morton z-order clustering key over (customer, order-day) "
    "(operators/profiling.py:zorder_key): pure per-row bit arithmetic, "
    "no shuffle; sorting by it co-locates rows close in BOTH dimensions "
    "so parquet min/max skipping serves either predicate. Bit-identical "
    "in the oracle via the arithmetic zorder_sql form.",
    tags=("layout", "catalog"),
)
def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).alias("x"),
        (F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long") % 65536).alias("y"),
    )
    return (
        o.select("o_orderkey", zorder_key("x", "y").alias("zval"))
        .orderBy(F.asc("zval"), F.asc("o_orderkey"))
        .limit(50)
    )
