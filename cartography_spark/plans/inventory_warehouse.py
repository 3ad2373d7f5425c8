"""Warehouse-workload inventory: the classic decision-support query shapes
(TPC-H-style) a user of any analytics engine runs daily, expressed over the
driver tables. None of these exist verbatim in the reference (its read
surface is rule Facts — SURVEY §3.2); they prove the query surface is a
complete warehouse engine, not just the reference's operator list:

- ``order_count_distribution`` (TPC-H Q13 shape): LEFT join + conditional
  count + histogram of the counts — two aggregations, the second over the
  first's output (tiny).
- ``big_spender_orders`` (Q18 shape): groupBy HAVING over integer cents
  (exact at any scale; float sums would make the HAVING boundary
  engine-dependent).
- ``supplier_wait_chain`` (Q21 shape): EXISTS + NOT EXISTS correlated
  subqueries against the same fact table — planned as one left-semi and
  one left-anti join, no per-row re-scan.
- ``idle_rich_customers`` (Q22 shape): scalar AVG subquery + NOT EXISTS
  anti-join.
- ``promo_parts_share`` (Q14 shape): conditional aggregation; numerator
  and denominator reported as exact cents instead of a float ratio.
- ``top_supplied_parts_nested_in`` (Q20 shape): two nested IN subqueries
  with a HAVING-gated inner aggregate.
- ``window_percent_rank``: percent_rank + cume_dist (rank-family
  completion).
- ``grouping_sets_revenue``: explicit GROUPING SETS (CUBE/ROLLUP already
  covered) with grouping_id disambiguation.
- ``window_range_frame``: RANGE frame (2-hour trailing sum) over event
  time in integer cents — time-based frames, not row-based.
- ``median_value_by_type``: exact median over integer cents (interpolated
  midpoints of ints are exact doubles in any engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cartography_spark.plans.registry import query
from cartography_spark.sources.parquet import load_table as T


@query(
    "order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS n_custs
    FROM per_cust GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: orders-per-customer histogram including "
    "zero-order customers (LEFT join keeps them; the filter rides the "
    "join condition, not a WHERE, so unmatched customers survive). "
    "Second aggregation input is |customers| rows — trivial shuffle.",
    tags=("join", "aggregation", "warehouse"),
)
def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("n_custs"))


@query(
    "big_spender_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
           count(*) AS n_orders
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    HAVING CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) > 100000000
    """,
    doc="TPC-H Q18 shape: HAVING over a grouped sum. Summed in integer "
    "cents so the HAVING boundary is exact — a float sum's last-ulp "
    "noise would make >10^8 engine- and partition-order-dependent.",
    tags=("aggregation", "warehouse"),
)
def q_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(cents).alias("spend_cents"), F.count("*").alias("n_orders"))
        .filter(F.col("spend_cents") > 100000000)
    )


@query(
    "supplier_wait_chain",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape: the last-to-ship supplier per finished "
    "multi-supplier order. EXISTS -> left-semi join, NOT EXISTS -> "
    "left-anti join, both on l_orderkey — Catalyst runs them as two "
    "hash joins against the same shuffled fact, never a per-row probe.",
    tags=("subquery", "join", "warehouse"),
)
def q_supplier_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = T(spark, sf_dir, "supplier")
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    for t in ("supplier", "lineitem"):
        T(spark, sf_dir, t).createOrReplaceTempView(f"{t}_v")
    o.createOrReplaceTempView("orders_f_v")
    return spark.sql(
        """
        SELECT s.s_name, count(*) AS numwait
        FROM supplier_v s
        JOIN lineitem_v l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders_f_v o ON o.o_orderkey = l1.l_orderkey
        WHERE EXISTS (SELECT 1 FROM lineitem_v l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem_v l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s.s_name
        """
    )


@query(
    "idle_rich_customers",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_custs,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 300000)
    GROUP BY c.c_mktsegment
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no large orders. "
    "The scalar AVG subquery becomes a broadcast scalar; NOT EXISTS a "
    "left-anti join on o_custkey. Balance totals in exact cents.",
    tags=("subquery", "warehouse"),
)
def q_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        T(spark, sf_dir, t).createOrReplaceTempView(f"{t}_v")
    return spark.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n_custs,
               CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        FROM customer_v c
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer_v c2
                             WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders_v o WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 300000)
        GROUP BY c.c_mktsegment
        """
    )


@query(
    "promo_parts_share",
    oracle="""
    SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate < TIMESTAMP '1995-10-01'
    """,
    doc="TPC-H Q14 shape: promo revenue share for one ship month. "
    "Conditional aggregation reported as exact (numerator, denominator) "
    "cents — the ratio is one driver-side division away, and the exact "
    "integers stay engine-portable where a float percentage would not. "
    "Ship-date filter pushes to the parquet scan.",
    tags=("aggregation", "warehouse"),
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part")
    rev_cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev_cents).otherwise(F.lit(0))).alias(
                "promo_cents"
            ),
            F.sum(rev_cents).alias("total_cents"),
        )
    )


@query(
    "top_supplied_parts_nested_in",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN (SELECT p.p_partkey FROM part p WHERE p.p_name LIKE 's%')
      GROUP BY l.l_suppkey
      HAVING sum(l.l_quantity) > 2500
    )
    """,
    doc="TPC-H Q20 shape: two nested IN subqueries, the inner one "
    "aggregate-gated (HAVING). Both collapse to semi-joins; the part "
    "filter prunes before the lineitem aggregation. l_quantity is "
    "integral in the data so the HAVING boundary is exact.",
    tags=("subquery", "warehouse"),
)
def q_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "lineitem", "part"):
        T(spark, sf_dir, t).createOrReplaceTempView(f"{t}_v")
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name
        FROM supplier_v s
        WHERE s.s_suppkey IN (
          SELECT l.l_suppkey FROM lineitem_v l
          WHERE l.l_partkey IN (SELECT p.p_partkey FROM part_v p WHERE p.p_name LIKE 's%')
          GROUP BY l.l_suppkey
          HAVING sum(l.l_quantity) > 2500
        )
        """
    )


@query(
    "window_percent_rank",
    oracle="""
    SELECT c_custkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WHERE c_nationkey < 3
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    doc="percent_rank + cume_dist: the remaining rank-family windows "
    "(row_number/lag/ntile already covered). Same (rank-1)/(n-1) and "
    "rank/n formulas in every engine — rounded at 6 to absorb nothing "
    "but display formatting.",
    tags=("window", "warehouse"),
)
def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 3)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS — the irregular grouping combination "
    "CUBE/ROLLUP can't express ((status), (priority), () but never "
    "(status, priority)). One Expand over one scan; grouping_id "
    "distinguishes a literal 'ALL' value from a rolled-up row.",
    tags=("aggregation", "olap", "warehouse"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    T(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_cents
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY epoch(ts)
                   RANGE BETWEEN 7200 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_2h_cents
    FROM events
    WHERE user_id < 10
    """,
    doc="Time-based RANGE frame: per-user trailing-2-hour value sum, "
    "ordered by event time in epoch seconds. RANGE frames bound by VALUE "
    "distance (7200 s), not row count — the sliding-aggregate shape "
    "row-based frames can't express; one user_id shuffle + sort.",
    tags=("window", "temporal", "warehouse"),
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-7200, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.sum(cents).over(w).alias("trailing_2h_cents")
    )


@query(
    "median_value_by_type",
    oracle="""
    SELECT event_type,
           median(CAST(round(value * 100) AS BIGINT)) AS median_cents,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="Exact (interpolating) median per group, computed over integer "
    "cents: the even-count midpoint of two bigints is an exact double in "
    "any engine, where interpolating raw floats would differ in the last "
    "ulp between lower+(upper-lower)/2 and (lower+upper)/2 formulations. "
    "Spark plans exact percentiles as a single sort-based aggregate.",
    tags=("aggregation", "warehouse"),
)
def q_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    return e.groupBy("event_type").agg(
        F.median(cents).alias("median_cents"), F.count("*").alias("n")
    )


@query(
    "unpivot_lineitem_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, round(val, 2) AS val
    FROM (
      UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                      l_discount, l_tax
               FROM lineitem WHERE l_orderkey < 100)
      ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME metric VALUE val
    )
    """,
    doc="UNPIVOT / melt: wide metric columns to long (row, metric, value) "
    "form — the inverse of the pivot already covered. Spark plans it as "
    "an Expand (4 output rows per input row, one scan, zero shuffles); "
    "values pass through untouched so no rounding semantics are in play.",
    tags=("reshape", "warehouse"),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
                  "l_discount", "l_tax")
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            variableColumnName="metric",
            valueColumnName="v",
        )
        .select("l_orderkey", "l_linenumber", "metric", F.round("v", 2).alias("val"))
    )


@query(
    "outlier_zscore_exact",
    oracle="""
    WITH u AS (
      SELECT event_id, event_type, CAST(round(value) AS BIGINT) AS x FROM events
    ),
    s AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM u GROUP BY event_type
    )
    SELECT u.event_id, u.event_type
    FROM u JOIN s ON u.event_type = s.event_type
    WHERE (s.n * u.x - s.sx) * (s.n * u.x - s.sx) > 4 * (s.n * s.sxx - s.sx * s.sx)
    """,
    doc="Integer-exact z-score outlier flags (|z| > 2 per event_type): "
    "the float inequality (x-mean)/sigma > k cross-multiplies to "
    "(n*x - S)^2 > k^2*(n*Sxx - S^2) over integer units — no float "
    "mean/stddev, so the outlier set is bit-reproducible across engines "
    "and partition orders. One aggregation + one broadcast join back; "
    "bigint-safe while n*max(x) < 3e9 (values <=561 here: past sf100).",
    tags=("aggregation", "quality", "warehouse"),
)
def q_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round("value").cast("bigint").alias("x")
    )
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"), F.sum(F.col("x") * F.col("x")).alias("sxx")
    )
    j = e.join(F.broadcast(s), "event_type")
    dev = F.col("n") * F.col("x") - F.col("sx")
    var_num = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return j.filter(dev * dev > 4 * var_num).select("event_id", "event_type")


@query(
    "linear_trend_exact",
    oracle="""
    WITH u AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) - floor(epoch(TIMESTAMP '2024-01-01') / 3600) AS BIGINT) AS x,
             CAST(round(value) AS BIGINT) AS y
      FROM events
    )
    SELECT event_type,
           CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS slope_num,
           CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS slope_den
    FROM u GROUP BY event_type
    """,
    doc="Exact least-squares trend per event_type: the OLS slope "
    "(n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) reported as its exact integer "
    "numerator/denominator over (hour-index, integer-unit) pairs — the "
    "float division is one driver-side op away, while the distributed "
    "aggregation stays bit-reproducible. One map-side-combined "
    "aggregation, no joins; bigint-safe to ~sf10 for this data shape.",
    tags=("aggregation", "warehouse"),
)
def q_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    anchor = F.floor(F.unix_timestamp(F.lit("2024-01-01").cast("timestamp")) / 3600)
    u = e.select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600) - anchor).cast("bigint").alias("x"),
        F.round("value").cast("bigint").alias("y"),
    )
    return u.groupBy("event_type").agg(
        (F.count("*") * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
        .cast("bigint")
        .alias("slope_num"),
        (F.count("*") * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
        .cast("bigint")
        .alias("slope_den"),
    )


@query(
    "throttle_dedup",
    oracle="""
    WITH ordered AS (
      SELECT event_id, user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events WHERE user_id < 50
    )
    SELECT event_id FROM ordered
    WHERE prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 300
    """,
    doc="Event throttling / rate-limit dedup: keep an event only if the "
    "previous event of the same (user, type) is more than 5 minutes "
    "older — the batch twin of the streaming "
    "dropDuplicatesWithinWatermark path (streaming/events.py). One "
    "window shuffle on (user_id, event_type); ties broken by event_id "
    "so the kept set is deterministic.",
    tags=("window", "dedup", "warehouse"),
)
def q_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.select("event_id", "ts", F.lag("ts").over(w).alias("prev_ts"))
        .filter(
            F.col("prev_ts").isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 300)
        )
        .select("event_id")
    )


@query(
    "disjunctive_predicate_revenue",
    oracle="""
    SELECT
      CAST(count(*) AS BIGINT) AS n_lines,
      CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        AS revenue_micros
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19-shape disjunctive join predicate: OR of AND-groups "
    "mixing build-side (brand/size) and probe-side (quantity) columns. "
    "Catalyst extracts the common conjuncts per side and pushes the "
    "derivable disjunctions (brand IN set, size <= 35, quantity <= 30) "
    "below the join as scan-level PushedFilters, so the join probes a "
    "pre-filtered fraction of both inputs — the classic OR-predicate "
    "pushdown test. Revenue accumulated as price_cents x (100 - "
    "discount_pct) integer micros: order-free, bit-exact in any engine.",
    tags=("warehouse", "join"),
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    grp = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc = F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(grp)
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(cents * disc).cast("bigint").alias("revenue_micros"),
        )
    )


@query(
    "outlier_mad_robust",
    oracle="""
    WITH cents AS (
      SELECT l_returnflag AS g, CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
    ),
    med AS (
      SELECT g, c AS med FROM (
        SELECT g, c, row_number() OVER (PARTITION BY g ORDER BY c) AS rn,
               count(*) OVER (PARTITION BY g) AS n
        FROM cents
      ) WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT cents.g, c, med, abs(c - med) AS d FROM cents JOIN med USING (g)
    ),
    mad AS (
      SELECT g, d AS mad FROM (
        SELECT g, d, row_number() OVER (PARTITION BY g ORDER BY d) AS rn,
               count(*) OVER (PARTITION BY g) AS n
        FROM dev
      ) WHERE rn = (n + 1) // 2
    )
    SELECT dev.g AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(max(med) AS BIGINT) AS med_cents,
           CAST(max(mad) AS BIGINT) AS mad_cents,
           CAST(sum(CASE WHEN d > 3 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (g)
    GROUP BY dev.g
    """,
    doc="Robust outlier flags via median + MAD on integer cents "
    "(operators/profiling.py:mad_outlier_stats): |x - med| > 3*MAD, "
    "the breakdown-resistant complement to outlier_zscore_exact — a few "
    "extreme rows cannot drag a median-based threshold. Lower medians "
    "are exact order statistics (row_number at floor((n+1)/2)), so "
    "every intermediate is an exact BIGINT; the 100 TB path swaps the "
    "two per-group sorts for the mergeable histogram sketch.",
    tags=("warehouse", "quality"),
)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.operators.profiling import mad_outlier_stats

    li = T(spark, sf_dir, "lineitem")
    return mad_outlier_stats(
        li.select(F.col("l_returnflag"), F.col("l_extendedprice")),
        "l_returnflag",
        "l_extendedprice",
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT DISTINCT o_custkey,
           count(*) OVER w AS n_orders,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER w AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first_value / last_value / nth_value over an explicit unbounded "
    "ROWS frame (the frame makes last/nth see the WHOLE partition — the "
    "default running frame silently truncates them): per customer, the "
    "first, last, and second order in (date, key) order; second_key is "
    "NULL for single-order customers. One window sort on o_custkey; "
    "completes the analytic-function surface next to "
    "lag/ntile/percent_rank/range-frame coverage.",
    tags=("warehouse", "window"),
)
def q_window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.count("*").over(w).alias("n_orders"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    ).distinct()


@query(
    "events_gaps_islands",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
               AS grp
      FROM events WHERE user_id < 100
    )
    SELECT user_id, event_type, min(ts) AS run_start, max(ts) AS run_end,
           CAST(count(*) AS BIGINT) AS run_length
    FROM seq GROUP BY user_id, event_type, grp
    HAVING count(*) >= 2
    """,
    doc="Gaps-and-islands: maximal runs of consecutive same-type events "
    "per user via the classic row_number-difference grouping (two "
    "window functions over ONE (user_id)-partitioned sort — the second "
    "window's (user_id, event_type) partitioning is a subsort of the "
    "first, so Catalyst plans a single Exchange). Runs >= 2 reported "
    "with their time span — the sessionless sequence-grouping pattern "
    "next to session windows and funnels.",
    tags=("warehouse", "window"),
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = e.withColumn(
        "grp", F.row_number().over(w_all) - F.row_number().over(w_type)
    )
    return (
        seq.groupBy("user_id", "event_type", "grp")
        .agg(
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count("*").cast("bigint").alias("run_length"),
        )
        .filter(F.col("run_length") >= 2)
        .drop("grp")
    )


@query(
    "timeseries_time_weighted_avg",
    oracle="""
    WITH stepped AS (
      SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dur_us
      FROM events WHERE user_id < 200
    )
    SELECT user_id,
           CAST(sum(dur_us) AS BIGINT) AS span_us,
           CAST(sum(cents * dur_us) AS BIGINT) AS weighted_cent_us,
           CAST(sum(cents * dur_us) // sum(dur_us) AS BIGINT) AS twap_cents
    FROM stepped WHERE dur_us IS NOT NULL
    GROUP BY user_id
    """,
    doc="Time-weighted average over irregular events (step interpolation: "
    "each value holds until the next observation — the TWAP/telemetry "
    "standard, where a plain AVG over-weights bursts): one lead window "
    "per user, then integer cents x microsecond sums with a floor-divided "
    "final average — exact BIGINTs end to end. Single-event users have "
    "no holding intervals and drop out, matching the oracle.",
    tags=("warehouse", "timeseries"),
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = e.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return stepped.groupBy("user_id").agg(
        F.sum("dur_us").cast("long").alias("span_us"),
        F.sum(F.col("cents") * F.col("dur_us")).cast("long").alias("weighted_cent_us"),
        F.expr("CAST(sum(cents * dur_us) DIV sum(dur_us) AS BIGINT)").alias("twap_cents"),
    )


@query(
    "division_full_coverage",
    oracle="""
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_shipments
    FROM lineitem
    WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
      AND l_quantity > 40
    GROUP BY l_suppkey
    HAVING count(DISTINCT date_part('month', l_shipdate)) = 12
    """,
    doc="Relational division (the 'for ALL' query shape — suppliers with "
    "a bulk shipment in EVERY month of 1995): expressed as "
    "count(DISTINCT month) == |divisor| over one filtered groupBy — one "
    "pushed-down scan + one aggregate, instead of the textbook double "
    "NOT EXISTS (two correlated anti-joins). The date-range and "
    "quantity predicates land in the parquet scan.",
    tags=("warehouse", "agg"),
)
def q_division_full_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_quantity") > 40)
        )
        .groupBy("l_suppkey")
        .agg(
            F.count("*").cast("bigint").alias("n_shipments"),
            F.countDistinct(F.month("l_shipdate")).alias("__months"),
        )
        .filter(F.col("__months") == 12)
        .drop("__months")
    )


@query(
    "ratio_to_report_revenue",
    oracle="""
    WITH pr AS (
      SELECT o_orderpriority,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, cents,
           CAST((cents * 1000) // sum(cents) OVER () AS BIGINT) AS share_permille
    FROM pr
    """,
    doc="Ratio-to-report: each priority's share of total revenue via a "
    "window sum OVER () on the 5-row aggregate (the whole-relation "
    "window runs on sketch-sized data — the detail rows were already "
    "collapsed by the map-side-combinable groupBy). Integer permille "
    "via floor division, bit-exact.",
    tags=("warehouse", "window"),
)
def q_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    pr = o.groupBy("o_orderpriority").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("cents")
    )
    w = Window.partitionBy()
    return pr.select(
        "o_orderpriority",
        "cents",
        F.expr("CAST((cents * 1000) DIV sum(cents) OVER () AS BIGINT)").alias(
            "share_permille"
        ),
    )


@query(
    "theil_sen_trend_robust",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) - floor(epoch(TIMESTAMP '2024-01-01') / 3600) AS BIGINT) AS x,
             CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY event_type, 2
    ),
    p AS (
      SELECT a.event_type, b.y - a.y AS num, b.x - a.x AS den
      FROM h a JOIN h b ON a.event_type = b.event_type AND a.x < b.x
    ),
    r AS (
      SELECT event_type, num, den,
             row_number() OVER (PARTITION BY event_type
               ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE), num, den) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM p
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           CAST(num AS BIGINT) AS med_num, CAST(den AS BIGINT) AS med_den
    FROM r WHERE rn = (n + 1) // 2
    """,
    doc="Theil-Sen robust trend per event_type (operators/profiling.py:"
    "theil_sen_trend): the median of all pairwise slopes over the HOURLY "
    "rollup — the robust companion to linear_trend_exact's OLS (Theil-Sen "
    "ignores up to ~29% contaminated points; OLS chases every outlier). "
    "Slopes stay exact integer num/den; the median is selected "
    "positionally with ranking by one correctly-rounded IEEE division "
    "(engine-identical) and (num, den) tiebreak, so the reported rational "
    "is bit-exact. Scale contract: the O(n^2) pair space runs over the "
    "BOUNDED hourly grid (the 30-day window caps points per group at "
    "~720 whatever the raw event volume), one co-partitioned self-join + "
    "bounded-partition median windows; the raw table is touched once by "
    "the map-side-combinable hourly aggregate.",
    tags=("aggregation", "warehouse"),
)
def q_theil_sen_trend_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.operators.profiling import theil_sen_trend

    e = T(spark, sf_dir, "events")
    anchor = F.floor(F.unix_timestamp(F.lit("2024-01-01").cast("timestamp")) / 3600)
    h = (
        e.select(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 3600) - anchor).cast("long").alias("x"),
            F.round("value").cast("long").alias("v"),
        )
        .groupBy("event_type", "x")
        .agg(F.sum("v").cast("long").alias("y"))
    )
    return theil_sen_trend(h, "event_type", "x", "y")


@query(
    "revenue_gini_concentration",
    oracle="""
    WITH x AS (
      SELECT o_custkey, CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) AS i FROM x
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rev) AS BIGINT) AS total_rev,
             CAST(sum(i * rev) AS BIGINT) AS weighted_sum
      FROM r
    )
    SELECT n AS n_customers, total_rev, weighted_sum,
           CAST(2 * weighted_sum - (n + 1) * total_rev AS BIGINT) AS gini_num,
           CAST(n * total_rev AS BIGINT) AS gini_den,
           CAST(round(1000000.0
                 * CAST(2 * weighted_sum - (n + 1) * total_rev AS DOUBLE)
                 / CAST(n * total_rev AS DOUBLE)) AS BIGINT) AS gini_micros
    FROM s
    """,
    doc="Gini coefficient of customer revenue concentration: "
    "G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending-"
    "sorted per-customer revenue — the one-number Lorenz-curve summary "
    "('do 20% of customers carry 80% of revenue?') every account-"
    "planning dashboard wants. Revenue collapses to per-customer "
    "integer dollars first (map-side combine), so the rank window runs "
    "on customer cardinality, not order cardinality, and the entire "
    "statistic is exact BIGINT arithmetic (rank ties carry equal "
    "values, so the weighted sum is tie-order invariant); the single "
    "float op is the final quantized ratio. At 100 TB replace the "
    "exact global rank with a binned Lorenz approximation — same "
    "num/den contract on the bin boundaries.",
    tags=("warehouse", "analytics", "window"),
)
def q_revenue_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.operators.profiling import gini_concentration

    o = T(spark, sf_dir, "orders")
    x = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice")).cast("bigint")).cast("bigint").alias("rev")
    )
    return gini_concentration(x, "o_custkey", "rev").select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_rev"),
        "weighted_sum",
        "gini_num",
        "gini_den",
        "gini_micros",
    )
