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
    the matched frame's ``id_col``.

    SET touches only matched nodes (reference SET semantics): values written
    by earlier statements in the same run survive. A companion audit column
    ``<prop>__tag`` records the run that last set each value; auto-cleanup
    then nulls values not refreshed in the current run — the Spark analog of
    the generated ``REMOVE`` statements (analysisbuilder.py:385-490).
    Setting an explicit ``None`` value is indistinguishable from "not set"
    and is therefore cleaned; the reference uses REMOVE for that too."""

    target_label: str
    id_col: str
    prop: str
    value: Any  # Column or literal

    def _tag_col(self) -> str:
        return f"{self.prop}__tag"

    def apply(self, catalog: GraphCatalog, matched: DataFrame, update_tag: int) -> None:
        ids = matched.select(F.col(self.id_col).alias("id"), _as_col(self.value).alias("__v")).dropDuplicates(
            ["id"]
        )
        table = catalog.node(self.target_label)
        tagc = self._tag_col()
        has = self.prop in table.columns
        joined = table.join(ids, "id", "left")
        newval = F.coalesce(F.col("__v"), F.col(self.prop)) if has else F.col("__v")
        newtag = (
            F.when(F.col("__v").isNotNull(), F.lit(update_tag).cast("long")).otherwise(F.col(tagc))
            if has and tagc in table.columns
            else F.when(F.col("__v").isNotNull(), F.lit(update_tag).cast("long"))
        )
        out = joined.withColumn("__newv", newval).withColumn("__newt", newtag).drop("__v")
        if has:
            out = out.drop(self.prop)
        if tagc in table.columns:
            out = out.drop(tagc)
        catalog.nodes[self.target_label] = out.withColumnRenamed("__newv", self.prop).withColumnRenamed(
            "__newt", tagc
        )

    def cleanup(self, catalog: GraphCatalog, update_tag: int) -> None:
        """Null out values whose tag was not refreshed this run (REMOVE)."""
        table = catalog.node(self.target_label)
        tagc = self._tag_col()
        if self.prop not in table.columns or tagc not in table.columns:
            return
        fresh = F.col(tagc) == update_tag
        catalog.nodes[self.target_label] = table.withColumn(
            self.prop, F.when(fresh, F.col(self.prop))
        ).withColumn(tagc, F.when(fresh, F.col(tagc)))


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
        # never-set base is a typed NULL (not an empty array: unmatched
        # nodes must keep the property NULL); the cast matches the VALUE's
        # element type so concat typechecks for e.g. int sets
        base = (
            F.col(self.prop)
            if has
            else F.lit(None).cast(vals.schema["__vs"].dataType.simpleString())
        )
        # SET only fires on MATCHED nodes (reference analysisbuilder.py:
        # 285-307 compiles MATCH ... SET): unmatched nodes — and matches
        # contributing only NULL values — keep their previous property
        # (NULL if never set); they do NOT gain an empty array. Surfaced
        # by the one orderless customer at sf0.1.
        appended = F.array_distinct(F.concat(F.coalesce(base, F.array()), F.col("__vs")))
        newcol = F.when(F.size(F.col("__vs")) > 0, appended).otherwise(base)
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


@dataclass(frozen=True)
class AddValuesToSet:
    """Append MULTIPLE values to the array property ``prop``, dedup'd — the
    reference's AddValuesToSet (analysis.py:114-132 family; compiled as the
    same coalesce(n.p,[]) + filter idiom with one term per value,
    analysisbuilder.py:285-307)."""

    target_label: str
    id_col: str
    prop: str
    values: tuple[Any, ...]

    def apply(self, catalog: GraphCatalog, matched: DataFrame, update_tag: int) -> None:
        vals = (
            matched.select(
                F.col(self.id_col).alias("id"),
                F.explode(F.array(*[_as_col(v) for v in self.values])).alias("__v"),
            )
            .groupBy("id")
            .agg(F.collect_set("__v").alias("__vs"))
        )
        table = catalog.node(self.target_label)
        has = self.prop in table.columns
        joined = table.join(vals, "id", "left")
        # typed-NULL base: unmatched nodes keep the property NULL (see
        # AddToSet above)
        base = (
            F.col(self.prop)
            if has
            else F.lit(None).cast(vals.schema["__vs"].dataType.simpleString())
        )
        # SET only fires on MATCHED nodes (reference analysisbuilder.py:
        # 285-307 compiles MATCH ... SET): unmatched nodes — and matches
        # contributing only NULL values — keep their previous property
        # (NULL if never set); they do NOT gain an empty array. Surfaced
        # by the one orderless customer at sf0.1.
        appended = F.array_distinct(F.concat(F.coalesce(base, F.array()), F.col("__vs")))
        newcol = F.when(F.size(F.col("__vs")) > 0, appended).otherwise(base)
        out = joined.withColumn("__new", newcol).drop("__vs")
        if has:
            out = out.drop(self.prop)
        catalog.nodes[self.target_label] = out.withColumnRenamed("__new", self.prop)

    def cleanup(self, catalog: GraphCatalog, update_tag: int) -> None:
        pass


def SetRelationshipPropertyIfMissing(
    edge_key: tuple[str, str, str], src_col: str, dst_col: str, prop: str, value: Any
) -> SetRelationshipProperty:
    """Reference parity constructor (analysis.py:104-112): set a property on
    matched edges only where it is currently null — existing values win."""
    return SetRelationshipProperty(edge_key, src_col, dst_col, prop, value, if_missing=True)


def _as_col(v: Any) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


Effect = SetProperty | AddToSet | AddValuesToSet | AddRelationship | SetRelationshipProperty


@dataclass(frozen=True)
class AnalysisStatement:
    """match + effects (reference analysis.py:39-68).

    ``incremental_on`` (reference analysis.py:28-36 IncrementalMatch;
    analysisbuilder.py:195-232) names columns of the MATCHED frame that
    carry ``lastupdated`` values; when the job runs with
    ``incremental=True`` (a stock sync run), matched rows are gated on
    every named column equalling the current update tag — so the statement
    only acts on entities refreshed this sync."""

    matcher: Matcher
    effects: tuple[Effect, ...]
    incremental_on: tuple[str, ...] = field(default=())


@dataclass(frozen=True)
class AnalysisJob:
    """Ordered statements, fail-fast, with auto-cleanup of effects after all
    statements ran (reference graph/job.py:133-254 execution contract)."""

    name: str
    statements: tuple[AnalysisStatement, ...]

    def run(self, catalog: GraphCatalog, update_tag: int, incremental: bool = False) -> None:
        for stmt in self.statements:
            matched = stmt.matcher(catalog)
            if incremental and stmt.incremental_on:
                for col in stmt.incremental_on:
                    matched = matched.filter(F.col(col) == update_tag)
            for effect in stmt.effects:
                effect.apply(catalog, matched, update_tag)
        for stmt in self.statements:
            for effect in stmt.effects:
                effect.cleanup(catalog, update_tag)
