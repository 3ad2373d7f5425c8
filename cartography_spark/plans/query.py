"""Read-side pattern-match surface: Cypher MATCH chains as DataFrame joins.

``match(catalog, "Customer", "c").out("PLACED_BY", ...)`` is wrong-way-round
for Cypher fans, so the API mirrors edge storage: ``out`` follows an edge
table (label)-[rel]->(dst); ``inward`` follows (src)-[rel]->(label)
backwards. Every hop is one equi-join on the edge table — Catalyst picks
broadcast vs shuffle per side. Columns are exposed as ``<alias>__<col>``.

Reference: multi-hop MATCH patterns, e.g. the 5-join LB exposure chain
(analysis/aws/analysis.py:63), sample queries 2-4 hops
(docs/root/usage/samplequeries.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cartography_spark.catalog import GraphCatalog


def _prefixed(df: DataFrame, alias: str) -> DataFrame:
    return df.select([F.col(c).alias(f"{alias}__{c}") for c in df.columns])


class Pattern:
    def __init__(self, catalog: GraphCatalog, label: str, alias: str | None = None):
        self.catalog = catalog
        alias = alias or label.lower()
        self._last_alias = alias
        self._last_label = label
        self.df = _prefixed(catalog.node(label), alias)

    def where(self, cond: Column) -> Pattern:
        self.df = self.df.filter(cond)
        return self

    def out(self, rel: str, dst_label: str, alias: str | None = None) -> Pattern:
        """Follow (current)-[rel]->(dst_label)."""
        alias = alias or dst_label.lower()
        edges = self.catalog.edge(self._last_label, rel, dst_label).select("src_id", "dst_id")
        dst = _prefixed(self.catalog.node(dst_label), alias)
        self.df = (
            self.df.join(edges, self.df[f"{self._last_alias}__id"] == edges.src_id)
            .join(dst, F.col("dst_id") == dst[f"{alias}__id"])
            .drop("src_id", "dst_id")
        )
        self._last_alias, self._last_label = alias, dst_label
        return self

    def inward(self, rel: str, src_label: str, alias: str | None = None) -> Pattern:
        """Follow (src_label)-[rel]->(current) backwards."""
        alias = alias or src_label.lower()
        edges = self.catalog.edge(src_label, rel, self._last_label).select("src_id", "dst_id")
        src = _prefixed(self.catalog.node(src_label), alias)
        self.df = (
            self.df.join(edges, self.df[f"{self._last_alias}__id"] == edges.dst_id)
            .join(src, F.col("src_id") == src[f"{alias}__id"])
            .drop("src_id", "dst_id")
        )
        self._last_alias, self._last_label = alias, src_label
        return self

    def select(self, *cols: str) -> DataFrame:
        return self.df.select(*cols)


def match(catalog: GraphCatalog, label: str, alias: str | None = None) -> Pattern:
    return Pattern(catalog, label, alias)


def any_rel_neighbors(catalog: GraphCatalog, label: str) -> DataFrame:
    """Undirected wildcard match ``MATCH (n:label)-[r]-(m)`` — union over
    every edge table touching the label, both directions
    (docs/root/usage/samplequeries.md:104-119). Returns
    (id, rel_label, neighbor_label, neighbor_id); each union branch is an
    independent scan, so Catalyst runs them in parallel with no join at all.
    """
    parts: list[DataFrame] = []
    for (sl, rl, dl), edges in catalog.edges.items():
        if sl == label:
            parts.append(
                edges.select(
                    F.col("src_id").alias("id"),
                    F.lit(rl).alias("rel_label"),
                    F.lit(dl).alias("neighbor_label"),
                    F.col("dst_id").alias("neighbor_id"),
                )
            )
        if dl == label:
            parts.append(
                edges.select(
                    F.col("dst_id").alias("id"),
                    F.lit(rl).alias("rel_label"),
                    F.lit(sl).alias("neighbor_label"),
                    F.col("src_id").alias("neighbor_id"),
                )
            )
    if not parts:
        raise ValueError(f"no edge tables touch label {label}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
