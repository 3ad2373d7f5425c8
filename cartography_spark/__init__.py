"""cartography_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cartography-cncf/cartography.

The reference (at /root/reference, snapshot 2026-08-07) stores a labeled
property graph in Neo4j and compiles declarative dataclass schemas to Cypher
(cartography/graph/querybuilder.py). This engine re-expresses the same
semantics Spark-first:

- node labels  -> one DataFrame per label (``catalog.GraphCatalog``)
- rel types    -> one edge DataFrame per (src_label, rel, dst_label)
- MERGE upsert -> set-based full-outer-join snapshot rewrite preserving
                  ``firstseen`` (``operators/upsert.py``)
- scoped stale cleanup -> anti-join keep-rewrite (``operators/cleanup.py``)
- analysis DSL effects -> DataFrame jobs (``plans/analysis.py``)
- rules/facts  -> parameterized DataFrame queries (``plans/rules.py``)

Everything is declarative DataFrame API so Catalyst performs predicate
pushdown, column pruning, join reordering and broadcast selection.
"""

__version__ = "0.1.0"
