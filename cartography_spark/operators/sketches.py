"""Mergeable sketch operators with ENGINE-PORTABLE determinism: every
hash is md5-derived (same convention as operators/dedup.py), so the
DuckDB oracle reproduces sketch contents bit-exactly — the sketches are
verified end-to-end, not within-tolerance.

- KMV (k-minimum-values) distinct-count: keep the k smallest 32-bit
  hashes of the value domain; estimate N ~ (k-1) * 2^32 / h_(k).
  Distributed cost: one hash projection + a global TakeOrdered(k) —
  no full shuffle; merging sketches = union + re-take-k (associative).
- Count-Min frequency sketch: depth x width counter matrix,
  bucket(r, x) = md5(r:x) % width; point estimate = min over rows.
  The sketch build is one groupBy of (row, bucket) — map-side
  combinable, k*width cells regardless of input size; merging = cell-
  wise sum. Estimates are biased UP (collisions only add).

Both are the associative/mergeable building blocks a 100 TB profiler
needs: per-partition sketches merge without rescanning data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h32(col) -> F.Column:
    """Portable 32-bit hash: first 8 hex digits of md5 (same as the
    dedup/minhash convention)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """KMV cardinality estimate of ``col``: one row with the exact count
    (for the oracle comparison), the sketch estimate, and k."""
    hashes = df.select(_h32(F.col(col)).alias("h")).distinct()
    kth = hashes.orderBy("h").limit(k).agg(F.max("h").alias("kth"), F.count("*").alias("got"))
    return kth.select(
        F.lit(k).alias("k"),
        # fewer than k distinct values -> the sketch is exact (got)
        F.when(
            F.col("got") < k, F.col("got").cast("double")
        ).otherwise(F.round((F.lit(float(k - 1)) * F.lit(float(2**32))) / F.col("kth"), 2)).alias(
            "estimate"
        ),
    )


def countmin_build(
    df: DataFrame, col: str, width: int = 16, depth: int = 4
) -> DataFrame:
    """Build the depth x width Count-Min counter table: one map-side-
    combinable groupBy; at most depth*width output cells."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r")
    cells = df.select(F.col(col).alias("__x"), rows).select(
        "r", (_h32(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("__x"))) % width).alias("b")
    )
    return cells.groupBy("r", "b").agg(F.count("*").cast("bigint").alias("n"))


def countmin_estimate(
    sketch: DataFrame, candidates: DataFrame, col: str, width: int = 16, depth: int = 4
) -> DataFrame:
    """Point-estimate each candidate's frequency: min over the depth rows
    of its bucket counters. Candidates x depth is broadcast-joined to the
    tiny sketch table."""
    probes = candidates.select(F.col(col)).crossJoin(
        F.broadcast(
            candidates.sparkSession.range(depth).select(F.col("id").cast("int").alias("r"))
        )
    )
    probes = probes.withColumn(
        "b", _h32(F.concat(F.col("r").cast("string"), F.lit(":"), F.col(col))) % width
    )
    joined = probes.join(F.broadcast(sketch), ["r", "b"], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0))
    )
    return joined.groupBy(col).agg(F.min("n").cast("bigint").alias("est_n"))
