"""Skew mitigation: salting helpers for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime for sort-merge joins, but two shapes still need explicit salting at
100 TB:

- aggregations where one key dominates (a single reducer receives the hot
  key's entire partition): two-phase salted aggregation spreads the partial
  work over ``salt_buckets`` reducers, then combines the partials — valid
  for any algebraic aggregate (sum/count/min/max).
- joins of a skewed fact against a small-but-not-broadcastable dim:
  salt the fact side, EXPLODE the dim side across all salt values, join on
  (key, salt). Row multiplication is |dim| x salt_buckets — bounded and
  chosen by the caller.

Both are plan-level rewrites: no RDDs, no custom partitioners, fully
codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Attach a uniform random-ish salt derived from a row hash — stable
    per-row (crc32 of all columns), not an RNG, so retries/replays are
    deterministic."""
    h = F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns]))
    return df.withColumn(salt_col, (h % salt_buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) computes partials, then
    groupBy(keys) combines. ``aggs`` maps output name -> phase-1 aggregate
    expression; phase 2 re-combines with the matching combiner (count->sum,
    sum->sum, min->min, max->max) inferred from the expression name.
    """
    salted = with_salt(df, salt_buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )

    def combiner(name: str, expr: Column) -> Column:
        s = expr._jc.toString().lower()
        col = F.col(f"__p_{name}")
        if s.startswith("count"):
            return F.sum(col).alias(name)
        if s.startswith("min"):
            return F.min(col).alias(name)
        if s.startswith("max"):
            return F.max(col).alias(name)
        return F.sum(col).alias(name)

    return phase1.groupBy(*keys).agg(*[combiner(n, e) for n, e in aggs.items()])


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the (possibly skewed) fact side gets a salt;
    the dim side is replicated across every salt value; the join runs on
    keys + salt so a hot key's rows spread over ``salt_buckets`` tasks."""
    f = with_salt(fact, salt_buckets)
    d = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")))
    out = f.join(d, [*on, "__salt"], how)
    return out.drop("__salt")
