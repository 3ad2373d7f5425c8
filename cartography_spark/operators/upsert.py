"""Upsert: the engine's core write operator.

Reference semantics (cartography/graph/querybuilder.py:1219-1317, template at
1266-1279):

    UNWIND $DictList AS item
    MERGE (i:Label {id: item.id})
    ON CREATE SET i.firstseen = timestamp()
    SET i.lastupdated = $lastupdated_tag, i.prop = item.prop, ...

plus conditional extra labels (:486-575) and relationship attachment through
the four matcher modes (:632-666, 711-736).

Spark-first design: one set-based snapshot rewrite per batch —

1. project the batch through the schema's PropertyRefs (dedup on id);
2. full-outer-join with the existing node table on id;
3. matched rows take the batch's property values but keep ``firstseen``;
   unmatched existing rows pass through untouched; new rows get
   ``firstseen = lastupdated = update_tag``.

This is exactly Delta's ``MERGE INTO`` decomposed into vanilla DataFrame
ops, so it runs anywhere. At scale the join shuffles on ``id`` once; with a
tenant-partitioned table and a tenant filter pushed down, only the touched
partitions rewrite (partition pruning replaces Neo4j's index seek).

Relationship attach mirrors OPTIONAL MATCH tolerance
(querybuilder.py:866-867): an inner join against the target table simply
drops rows whose target is missing — identical visible semantics to
OPTIONAL MATCH + null-filter.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cartography_spark.catalog import GraphCatalog
from cartography_spark.schema import LinkDirection, NodeSchema, PropertyRef, RelSchema


def project_batch(
    batch: DataFrame,
    schema: NodeSchema,
    update_tag: int,
    params: dict[str, Any] | None = None,
) -> DataFrame:
    """Project raw batch rows into the node-table shape declared by the
    schema: id + declared properties + labels + engine columns."""
    cols: list[Column] = [schema.properties[schema.id_property].expr(params).cast("string").alias("id")]
    for out_name, ref in schema.properties.items():
        if out_name == schema.id_property:
            continue
        cols.append(ref.expr(params).alias(out_name))
    # conditional extra labels -> labels array column (reference nodes.py:88-147)
    if schema.extra_node_labels:
        label_exprs = [
            F.when(el.condition(), F.lit(el.label)).otherwise(F.lit(None)) for el in schema.extra_node_labels
        ]
        labels = F.array_compact(F.array(F.lit(schema.label), *label_exprs))
        cols.append(labels.alias("labels"))
    projected = batch.select(*cols).filter(F.col("id").isNotNull())
    # MERGE processes per-id sequentially; set-based equivalent: one row per id
    projected = projected.dropDuplicates(["id"])
    return projected.withColumn("lastupdated", F.lit(update_tag).cast("long"))


def upsert_nodes(
    catalog: GraphCatalog,
    schema: NodeSchema,
    batch: DataFrame,
    update_tag: int,
    params: dict[str, Any] | None = None,
    scope_col: str | None = None,
    scope_value: Any | None = None,
) -> DataFrame:
    """MERGE the projected batch into the catalog's node table for
    ``schema.label``; returns the new table (also stored in the catalog).

    ``scope_col``/``scope_value`` enable the tenant-scoped fast path: only
    the touched tenant's slice joins the batch; every other tenant's rows
    pass through untouched with no shuffle. On a table partitioned by
    ``scope_col`` (catalog.partition_cols) both branches are partition-
    pruned scans, so a one-tenant sync over a 1000-tenant warehouse
    shuffles 1/1000th of the data — the Spark analogue of the reference
    syncing one account at a time against Neo4j indexes
    (intel/aws/__init__.py:598-684 per-account loop).
    """
    incoming = project_batch(batch, schema, update_tag, params).withColumn(
        "firstseen", F.lit(update_tag).cast("long")
    )
    existing = catalog.nodes.get(schema.label)
    if existing is None:
        merged = incoming
    elif scope_col is not None and scope_col in existing.columns:
        touched = existing.filter(F.col(scope_col).eqNullSafe(F.lit(scope_value)))
        untouched = existing.filter(~F.col(scope_col).eqNullSafe(F.lit(scope_value)))
        merged = untouched.unionByName(_merge(touched, incoming), allowMissingColumns=True)
    else:
        merged = _merge(existing, incoming)
    catalog.nodes[schema.label] = merged
    return merged


def _merge(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Full-outer merge keyed on id. Batch wins on every declared property;
    ``firstseen`` survives from the existing row (ON CREATE SET semantics);
    existing-only rows pass through with all their columns."""
    e = existing.alias("e")
    i = incoming.alias("i")
    joined = e.join(i, F.col("e.id") == F.col("i.id"), "full_outer")

    in_batch = F.col("i.id").isNotNull()
    out_cols: list[Column] = [F.coalesce(F.col("i.id"), F.col("e.id")).alias("id")]
    all_props = [c for c in dict.fromkeys(existing.columns + incoming.columns) if c != "id"]
    for c in all_props:
        has_e, has_i = c in existing.columns, c in incoming.columns
        if c == "firstseen":
            out_cols.append(F.coalesce(F.col("e.firstseen"), F.col("i.firstseen")).alias("firstseen"))
        elif has_e and has_i:
            # batch value wins even when null (SET overwrites), except rows
            # not in the batch keep their existing value
            out_cols.append(F.when(in_batch, F.col(f"i.{c}")).otherwise(F.col(f"e.{c}")).alias(c))
        elif has_i:
            out_cols.append(F.col(f"i.{c}").alias(c))
        else:
            out_cols.append(F.when(in_batch, F.lit(None)).otherwise(F.col(f"e.{c}")).alias(c))
    return joined.select(*out_cols)


def attach_relationships(
    catalog: GraphCatalog,
    schema: NodeSchema,
    batch: DataFrame,
    update_tag: int,
    params: dict[str, Any] | None = None,
) -> None:
    """Resolve and upsert the edges declared by the node schema
    (sub-resource first, then other_relationships) — reference
    querybuilder.py:816-1013."""
    for rel in schema.all_relationships():
        upsert_rel(catalog, schema, rel, batch, update_tag, params)


def _matcher_condition(rel: RelSchema, target: DataFrame, params: dict[str, Any] | None) -> Column:
    """Build the join condition for the rel's matcher keys, honouring the
    PropertyRef flags — the four matcher join modes of
    querybuilder.py:632-666,711-736."""
    conds: list[Column] = []
    for target_key, ref in rel.target_node_matcher.keys.items():
        t = target[target_key]
        b = ref.expr(params)
        if ref.one_to_many:
            # n.key IN item.list_ref (common.py:84-96)
            conds.append(F.array_contains(b, t))
        elif ref.fuzzy_and_ignore_case:
            conds.append(F.lower(t).contains(F.lower(b)))
        elif ref.ignore_case:
            conds.append(F.lower(t) == F.lower(b))
        else:
            conds.append(t == b)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def upsert_rel(
    catalog: GraphCatalog,
    schema: NodeSchema,
    rel: RelSchema,
    batch: DataFrame,
    update_tag: int,
    params: dict[str, Any] | None = None,
) -> DataFrame:
    """Join batch rows to the target node table via the matcher, derive
    (src_id, dst_id) per LinkDirection, and MERGE into the edge table.

    A target label absent from the catalog matches ZERO nodes (Cypher
    MATCH semantics: the reference's MERGE query simply binds no target
    rows, tx.py:846-921) — so a partial sync that loads a label before
    its relationship targets creates no edges rather than failing."""
    if rel.target_node_label not in catalog.nodes:
        return batch.sparkSession.createDataFrame(
            [], "src_id string, dst_id string, lastupdated long, firstseen long"
        )
    target = catalog.node(rel.target_node_label)
    src_id = schema.properties[schema.id_property].expr(params).cast("string")
    rows = batch.withColumn("__src_id", src_id).filter(F.col("__src_id").isNotNull())

    cond = _matcher_condition(rel, target, params)
    # small target tables (tenants/dims) broadcast; Catalyst/AQE decides
    matched = rows.join(target, cond, "inner")  # OPTIONAL MATCH tolerance: missing targets drop
    edge_cols = [
        F.col("__src_id").alias("src_id"),
        target["id"].alias("dst_id"),
    ]
    for out_name, ref in rel.properties.items():
        edge_cols.append(ref.expr(params).alias(out_name))
    edges = matched.select(*edge_cols)

    if rel.direction == LinkDirection.INWARD:
        # arrow points at the source: store (target -> source)
        edges = edges.select(
            F.col("dst_id").alias("src_id"),
            F.col("src_id").alias("dst_id"),
            *[c for c in edges.columns if c not in ("src_id", "dst_id")],
        )
        key = (rel.target_node_label, rel.rel_label, schema.label)
    else:
        key = (schema.label, rel.rel_label, rel.target_node_label)

    edges = edges.dropDuplicates(["src_id", "dst_id"]).withColumn(
        "lastupdated", F.lit(update_tag).cast("long")
    ).withColumn("firstseen", F.lit(update_tag).cast("long"))

    existing = catalog.edges.get(key)
    if existing is None:
        merged = edges
    else:
        merged = _merge_edges(existing, edges)
    catalog.edges[key] = merged
    return merged


def _merge_edges(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    e = existing.alias("e")
    i = incoming.alias("i")
    on = (F.col("e.src_id") == F.col("i.src_id")) & (F.col("e.dst_id") == F.col("i.dst_id"))
    joined = e.join(i, on, "full_outer")
    in_batch = F.col("i.src_id").isNotNull()
    cols = [
        F.coalesce(F.col("i.src_id"), F.col("e.src_id")).alias("src_id"),
        F.coalesce(F.col("i.dst_id"), F.col("e.dst_id")).alias("dst_id"),
    ]
    for c in dict.fromkeys(existing.columns + incoming.columns):
        if c in ("src_id", "dst_id"):
            continue
        has_e, has_i = c in existing.columns, c in incoming.columns
        if c == "firstseen":
            cols.append(F.coalesce(F.col("e.firstseen"), F.col("i.firstseen")).alias("firstseen"))
        elif has_e and has_i:
            cols.append(F.when(in_batch, F.col(f"i.{c}")).otherwise(F.col(f"e.{c}")).alias(c))
        elif has_i:
            cols.append(F.col(f"i.{c}").alias(c))
        else:
            cols.append(F.when(in_batch, F.lit(None)).otherwise(F.col(f"e.{c}")).alias(c))
    return joined.select(*cols)


def load(
    catalog: GraphCatalog,
    schema: NodeSchema,
    batch: DataFrame,
    update_tag: int,
    params: dict[str, Any] | None = None,
    scope_col: str | None = None,
    scope_value: Any | None = None,
) -> DataFrame:
    """The reference's ``load()`` (client/core/tx.py:783-845): upsert nodes,
    then attach all declared relationships. Nodes commit before edges so
    edges always reference existing ids (SURVEY §7.3 atomicity note).
    ``scope_col``/``scope_value`` select the tenant-scoped merge fast path
    (see :func:`upsert_nodes`)."""
    merged = upsert_nodes(catalog, schema, batch, update_tag, params, scope_col, scope_value)
    attach_relationships(catalog, schema, batch, update_tag, params)
    return merged
