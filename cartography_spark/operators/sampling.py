"""Deterministic sampling and dataset splitting for training pipelines.

Random `df.sample()` is seed- and partitioning-dependent — two runs (or two
engines) disagree, which poisons train/test hygiene. Hash-based assignment
is the reproducible alternative: a row's bucket is a pure function of its
id, so membership is stable across runs, engines, repartitions, and
incremental re-syncs (new docs never move old docs between splits).
All md5-derived, so any engine recomputes the identical assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cartography_spark.operators.dedup import portable_hash32


def hash_bucket(col: Column, n_buckets: int = 100, salt: str = "split") -> Column:
    """Stable bucket in [0, n_buckets) from the salted md5 of the id."""
    return portable_hash32(col, salt=salt) % n_buckets


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose hash bucket falls
    below fraction*1000 (0.1% resolution)."""
    return df.filter(hash_bucket(F.col(id_col), 1000, salt) < int(fraction * 1000))


def assign_splits(
    df: DataFrame,
    weights: dict[str, int] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Attach a ``split`` column (e.g. train/val/test 80/10/10): bucket
    ranges over a 100-bucket hash. Weights must sum to 100."""
    weights = weights or {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100, got {weights}")
    b = hash_bucket(F.col(id_col), 100, salt)
    expr = None
    lo = 0
    for name, w in weights.items():
        cond = (b >= lo) & (b < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn("split", expr)


def weighted_sample_topk(
    df: DataFrame, weight_col: Column, k: int, id_col: str = "doc_id", salt: str = "ws"
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): per-row key = ln(u)/w with u derived from the salted
    md5 hash, take the k largest keys. Inclusion probability is
    proportional to weight, yet fully reproducible. Distributed cost: a
    narrow projection + TakeOrdered(k) — no shuffle, merges across
    partitions like any top-k."""
    u = (portable_hash32(F.col(id_col), salt=salt) + 1) / F.lit(4294967296.0)
    key = F.log(u) / weight_col
    return (
        df.select(F.col(id_col), weight_col.cast("bigint").alias("weight"), key.alias("__key"))
        .orderBy(F.col("__key").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "weight", F.round("__key", 6).alias("sample_key"))
    )


def stratified_sample_topk(
    df: DataFrame, group_col: str, k: int, id_col: str = "doc_id", salt: str = "strat"
) -> DataFrame:
    """Exactly k rows per group (fewer if the group is smaller), chosen by
    hash order — a deterministic stratified sample. One shuffle on the
    group key; within each group the hash order is a uniform permutation."""
    from pyspark.sql import Window

    h = portable_hash32(F.col(id_col), salt=salt)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.select(F.col(group_col), F.col(id_col))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
