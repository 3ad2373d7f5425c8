"""Interleaved A/B benchmark: alternate two plan variants in ONE Spark
session so host noise (hypervisor steal-time, JVM warmup position, GC
pressure drift) hits both sides equally.

Twice now a round-over-round artifact delta turned out to be measurement
position, not a plan change (r3: q9/BM25 on the JIT-warmup shoulder; r4:
the minhash collapsed-loop fusion). Both times the resolution was an
ad-hoc interleaved A/B; this checks the method in.

Usage (from the repo root):

    python tools/ab_bench.py SPEC_A SPEC_B [--runs N] [--sf DIR]

A SPEC is one of
  * a registry query name            (e.g. ``dedup_minhash_collapsed``)
  * a named variant from VARIANTS    (e.g. ``minhash_collapsed_perhop``)
  * ``path/to/file.py:function``     (fn(spark, sf_dir) -> DataFrame)

The canonical example — the r3 per-hop vs r4 fused cluster loop that
settled the round-4 "regression" (SCALE.md):

    python tools/ab_bench.py dedup_minhash_collapsed minhash_collapsed_perhop --sf /root/testdata/sf1

Each run materializes through the noop sink (full distributed compute, no
driver Row materialization). One unmeasured warmup per side, then A,B
alternating ``--runs`` times each; prints per-run times plus min/median
per side and the min-vs-min verdict as one JSON line.
"""

from __future__ import annotations

import argparse
import gc
import importlib.util
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _minhash_variant(hop_fusion: bool):
    def run(spark, sf_dir):
        from pyspark.sql import functions as F

        from cartography_spark.operators import dedup as dd
        from cartography_spark.sources.parquet import load_table

        docs = load_table(spark, sf_dir, "documents")
        copies = docs.filter(F.col("doc_id") < 50).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
        return dd.minhash_cluster_collapsed(
            docs.unionByName(copies),
            num_perm=32, n=3, bands=4, max_iter=6, hop_fusion=hop_fusion,
        )

    return run


VARIANTS = {
    # the r3 cluster-loop shape — per-hop schedule (1,1,1,...). As of
    # round 5 this IS the registry default (the round-5 interleaved A/Bs
    # at sf0.1 and sf1 measured it 15-20% faster than the fused form,
    # non-overlapping ranges — see SCALE.md).
    "minhash_collapsed_perhop": _minhash_variant(hop_fusion=False),
    # the r4 fused 1,1,2,2 schedule, kept reproducible for the record
    "minhash_collapsed_fused": _minhash_variant(hop_fusion=True),
}


def resolve(spec: str):
    """SPEC -> (label, fn(spark, sf_dir) -> DataFrame)."""
    if spec in VARIANTS:
        return spec, VARIANTS[spec]
    if ":" in spec and (spec.split(":")[0].endswith(".py") or "/" in spec):
        path, _, fn_name = spec.rpartition(":")
        mod_spec = importlib.util.spec_from_file_location("_ab_variant", path)
        mod = importlib.util.module_from_spec(mod_spec)
        mod_spec.loader.exec_module(mod)
        return f"{Path(path).stem}:{fn_name}", getattr(mod, fn_name)
    from cartography_spark.plans.registry import REGISTRY, all_queries

    all_queries()
    if spec not in REGISTRY:
        sys.exit(f"unknown spec {spec!r}: not a registry query, VARIANTS entry, or file.py:fn")
    return spec, REGISTRY[spec].spark


def _run_once(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    # reclaim checkpointed RDD blocks before the other side's timing
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("spec_a")
    ap.add_argument("spec_b")
    ap.add_argument("--runs", type=int, default=4, help="measured runs per side")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    label_a, fn_a = resolve(args.spec_a)
    label_b, fn_b = resolve(args.spec_b)

    from cartography_spark.session import get_spark, set_session_mode

    set_session_mode("oneshot")
    spark = get_spark("ab_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # one unmeasured warmup each (JIT + parquet footer caches), in A,B order
    _run_once(fn_a, spark, args.sf)
    _run_once(fn_b, spark, args.sf)

    times_a: list[float] = []
    times_b: list[float] = []
    for i in range(args.runs):
        times_a.append(_run_once(fn_a, spark, args.sf))
        times_b.append(_run_once(fn_b, spark, args.sf))
        print(
            f"round {i + 1}: {label_a} {times_a[-1]:.2f}s  {label_b} {times_b[-1]:.2f}s",
            file=sys.stderr,
        )

    min_a, min_b = min(times_a), min(times_b)
    # noise floor: within 5% min-vs-min is a tie
    verdict = "tie" if abs(min_a - min_b) <= 0.05 * max(min_a, min_b) else (
        label_a if min_a < min_b else label_b
    )
    print(
        json.dumps(
            {
                "a": {"spec": label_a, "runs": [round(t, 3) for t in times_a],
                      "min": round(min_a, 3), "median": round(statistics.median(times_a), 3)},
                "b": {"spec": label_b, "runs": [round(t, 3) for t in times_b],
                      "min": round(min_b, 3), "median": round(statistics.median(times_b), 3)},
                "faster": verdict,
                "sf_dir": args.sf,
            }
        )
    )


if __name__ == "__main__":
    main()
