"""Differential-privacy release primitives.

The reference exposes per-tenant/per-label aggregate counts to downstream
consumers (e.g. rule rollups, `cartography/rules/` framework summaries);
this module provides the epsilon-DP counterpart for releasing such counts
outside the trust boundary. Spark-first: the mechanism is a pure-Column
expression over ONE map-side-combinable aggregate — no UDFs, no driver
loop — so it rides the same scale shape as any grouped count.

Determinism contract (repo-wide): randomness is derived from md5 of the
group key + a caller-supplied salt, identically parseable in any engine
(first 13 hex chars = 52 uniform bits), so tests and the DuckDB oracle
reproduce the release bit-for-bit. Production use would rotate the salt
per release; determinism-per-salt is a feature (idempotent re-runs emit
identical releases), not a weakness of the mechanism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^13 = 2^52: the first 13 md5 hex chars as a uniform integer
_HEX13 = 4_503_599_627_370_496.0


def dp_laplace_counts(
    df: DataFrame, group: Column, epsilon_micros: int = 1_000_000, salt: str = "dp"
) -> DataFrame:
    """Epsilon-differentially-private grouped counts via the Laplace
    mechanism: count(*) per group plus Laplace(1/epsilon) noise
    (sensitivity of a count under add/remove-one adjacency is 1). The
    release primitive for publishing per-tenant / per-label volumes
    outside the trust boundary, where k-anonymity/l-diversity (the
    neighboring privacy_* queries) audit the TABLE but the COUNTS
    themselves still leak.

    Noise derivation, identical in any engine: u = (k + 0.5)/2^52 with
    k the first 13 md5 hex chars of salt:group (u in (0,1), the +0.5
    dodges the ln(0) edge exactly), w = u - 0.5, and the inverse-CDF
    transform lap = -(1/eps) * sign(w) * ln(1 - 2|w|). |lap| is bounded
    by ~36*b (52-bit tail), so the micros quantization never overflows.
    One fixed float expression; quantized once to micros.

    Scale shape: ONE map-side-combinable count per group; the noise is
    a per-row Column expression on the |groups|-row frame. Nothing
    data-sized after the collapse.
    """
    per_g = df.groupBy(group.alias("g")).agg(F.count("*").cast("long").alias("c"))
    k = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col("g").cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")
    u = (k.cast("double") + 0.5) / F.lit(_HEX13)
    w = u - 0.5
    b = F.lit(1_000_000.0) / F.lit(float(epsilon_micros))
    lap = -b * F.signum(w) * F.log(F.lit(1.0) - 2.0 * F.abs(w))
    noisy = F.col("c").cast("double") + lap
    return per_g.select(
        F.col("g").alias("group_key"),
        F.round(noisy * 1_000_000).cast("bigint").alias("noisy_count_micros"),
        F.lit(epsilon_micros).cast("long").alias("epsilon_micros"),
    )
