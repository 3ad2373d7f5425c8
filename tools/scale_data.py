"""Scale rehearsal data generator: replicate /root/testdata/sf0.1 N times
with consistent key offsets, producing an sf~1 dataset under
.scaledata/sf1/ (gitignored).

The driver's testdata is read-only and tops out at sf0.1 (~600k lineitem).
VERDICT r1 item 7 asks for a bench rehearsal at sf1 (~6M lineitem) to
surface super-linear behavior that sf0.1 hides (iterative-join round cost,
LSH band skew, vocab-id windows). Key offsets keep every FK consistent
(orders->customer, lineitem->orders/part/supplier, events->user) so join
selectivities match the original distribution; nation/region are dimension
tables and stay fixed.

Replicated text/embeddings mean each document gains REPS-1 exact twins —
deliberately, a dup-heavy stress for the dedup family (bucket density ×REPS).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SCALE_DST", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaledata", "sf1"))
REPS = int(os.environ.get("SCALE_REPS", "10"))

# table -> {column: stride} ; stride = cardinality of the referenced key space
STRIDES = {
    "customer": {"c_custkey": 15000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "events": {"event_id": 100000, "user_id": 1500},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}
DIMS = ["nation", "region"]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied", file=sys.stderr)
    for t, strides in STRIDES.items():
        cols = [c[0] for c in con.execute(
            f"SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 0").description]
        sel = ", ".join(
            f"({c} + r.rep * {strides[c]}) AS {c}" if c in strides else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
            f"(SELECT unnest(range({REPS})) AS rep) r) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(t, n, file=sys.stderr)
    print(DST)


if __name__ == "__main__":
    main()
