"""Typed analysis DSL — the reference's "second compiler"
(cartography/graph/analysis.py:12-260 IR; compiled by
graph/analysisbuilder.py:36-556 to Cypher writes + auto-generated cleanup).

Spark-native: an ``AnalysisStatement`` holds a *matcher* (a function
``catalog -> DataFrame`` — typically built with plans.query.match) and a
list of typed effects compiled to DataFrame rewrites:

- ``SetProperty``            analysis.py:71-88   -> join target ids, withColumn
- ``AddToSet``               analysis.py:114-132 -> array_distinct(concat(...))
- ``AddRelationship``        analysis.py:134-150 -> edge upsert into a derived
                                                    edge table
- ``SetRelationshipProperty`` analysis.py:90-112 -> edge-table update

Auto-cleanup (analysisbuilder.py:132-165,385-490): derived properties are
cleared on nodes NOT matched in the current run; derived edges with
``lastupdated <> tag`` are deleted — same anti-join shape as §2.7 cleanup.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cartography_spark.catalog import GraphCatalog
from cartography_spark.operators.upsert import _merge_edges

Matcher = Callable[[GraphCatalog], DataFrame]


@dataclass(frozen=True)
class SetProperty:
    """Set ``prop`` = ``value`` on nodes of ``target_label`` whose id is in
    the matched frame's ``id_col``."""

    target_label: str
    id_col: str
    prop: str
    value: Any  # Column or literal

    def apply(self, catalog: GraphCatalog, matched: DataFrame, update_tag: int) -> None:
        ids = matched.select(F.col(self.id_col).alias("id"), _as_col(self.value).alias("__v")).dropDuplicates(
            ["id"]
        )
        table = catalog.node(self.target_label)
        joined = table.drop(self.prop).join(ids, "id", "left")
        catalog.nodes[self.target_label] = joined.withColumnRenamed("__v", self.prop)

    def cleanup(self, catalog: GraphCatalog, update_tag: int) -> None:
        # property is rebuilt (null for unmatched) on every apply — no-op
        pass


@dataclass(frozen=True)
class AddToSet:
    """Append ``value`` to the array property ``prop``, dedup'd —
    coalesce(n.p, []) + filter idiom (analysisbuilder.py:285-307)."""

    target_label: str
    id_col: str
    prop: str
    value: Any

    def apply(self, catalog: GraphCatalog, matched: DataFrame, update_tag: int) -> None:
        vals = (
            matched.select(F.col(self.id_col).alias("id"), _as_col(self.value).alias("__v"))
            .groupBy("id")
            .agg(F.collect_set("__v").alias("__vs"))
        )
        table = catalog.node(self.target_label)
        has = self.prop in table.columns
        joined = table.join(vals, "id", "left")
        # empty-array base must match the VALUE's element type (an
        # array<string> literal would fail to concat with e.g. int sets)
        base = (
            F.col(self.prop)
            if has
            else F.array().cast(vals.schema["__vs"].dataType.simpleString())
        )
        newcol = F.array_distinct(
            F.concat(F.coalesce(base, F.array()), F.coalesce(F.col("__vs"), F.array()))
        )
        out = joined.withColumn("__new", newcol).drop("__vs")
        if has:
            out = out.drop(self.prop)
        catalog.nodes[self.target_label] = out.withColumnRenamed("__new", self.prop)

    def cleanup(self, catalog: GraphCatalog, update_tag: int) -> None:
        pass


@dataclass(frozen=True)
class AddRelationship:
    """Create derived edges (src_col -> dst_col) in the edge table
    (src_label, rel_label, dst_label); e.g. STS_ASSUMEROLE_ALLOW from the
    instance->profile->role chain (analysis/aws/analysis.py:10-29)."""

    src_label: str
    rel_label: str
    dst_label: str
    src_col: str
    dst_col: str

    def key(self) -> tuple[str, str, str]:
        return (self.src_label, self.rel_label, self.dst_label)

    def apply(self, catalog: GraphCatalog, matched: DataFrame, update_tag: int) -> None:
        edges = (
            matched.select(
                F.col(self.src_col).alias("src_id"), F.col(self.dst_col).alias("dst_id")
            )
            .dropDuplicates(["src_id", "dst_id"])
            .withColumn("lastupdated", F.lit(update_tag).cast("long"))
            .withColumn("firstseen", F.lit(update_tag).cast("long"))
        )
        existing = catalog.edges.get(self.key())
        catalog.edges[self.key()] = edges if existing is None else _merge_edges(existing, edges)

    def cleanup(self, catalog: GraphCatalog, update_tag: int) -> None:
        """Auto-cleanup: drop derived edges not refreshed this run
        (analysisbuilder.py:385-490)."""
        key = self.key()
        if key in catalog.edges:
            catalog.edges[key] = catalog.edges[key].filter(F.col("lastupdated") == update_tag)


@dataclass(frozen=True)
class SetRelationshipProperty:
    """Set a property on matched edges (analysis.py:90-112).
    ``if_missing=True`` only fills nulls."""

    edge_key: tuple[str, str, str]
    src_col: str
    dst_col: str
    prop: str
    value: Any
    if_missing: bool = False

    def apply(self, catalog: GraphCatalog, matched: DataFrame, update_tag: int) -> None:
        sel = matched.select(
            F.col(self.src_col).alias("src_id"),
            F.col(self.dst_col).alias("dst_id"),
            _as_col(self.value).alias("__v"),
        ).dropDuplicates(["src_id", "dst_id"])
        edges = catalog.edge(*self.edge_key)
        has = self.prop in edges.columns
        joined = edges.join(sel, ["src_id", "dst_id"], "left")
        if has and self.if_missing:
            newcol = F.coalesce(F.col(self.prop), F.col("__v"))
        elif has:
            newcol = F.coalesce(F.col("__v"), F.col(self.prop))
        else:
            newcol = F.col("__v")
        out = joined.withColumn("__new", newcol).drop("__v")
        if has:
            out = out.drop(self.prop)
        catalog.edges[self.edge_key] = out.withColumnRenamed("__new", self.prop)

    def cleanup(self, catalog: GraphCatalog, update_tag: int) -> None:
        pass


def _as_col(v: Any) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


Effect = SetProperty | AddToSet | AddRelationship | SetRelationshipProperty


@dataclass(frozen=True)
class AnalysisStatement:
    """match + effects (reference analysis.py:39-68)."""

    matcher: Matcher
    effects: tuple[Effect, ...]


@dataclass(frozen=True)
class AnalysisJob:
    """Ordered statements, fail-fast, with auto-cleanup of effects after all
    statements ran (reference graph/job.py:133-254 execution contract)."""

    name: str
    statements: tuple[AnalysisStatement, ...]

    def run(self, catalog: GraphCatalog, update_tag: int) -> None:
        for stmt in self.statements:
            matched = stmt.matcher(catalog)
            for effect in stmt.effects:
                effect.apply(catalog, matched, update_tag)
        for stmt in self.statements:
            for effect in stmt.effects:
                effect.cleanup(catalog, update_tag)
