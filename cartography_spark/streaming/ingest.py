"""Streaming ingestion into the graph catalog: readStream -> foreachBatch
-> the REAL upsert/cleanup operators.

The reference's sync is a periodic batch loop (cartography/sync.py:240-297);
this is its continuous form: each micro-batch runs the same
schema->upsert->edge pipeline (operators/upsert.load) with the batch id as
the update tag, so ``firstseen``/``lastupdated`` lifecycle semantics carry
over unchanged and a stale-cleanup against the latest tag behaves exactly
like the batch engine's.

Scale note: foreachBatch makes the micro-batch a plain DataFrame, so every
batch gets the full Catalyst plan (broadcasts, AQE) — state lives in the
catalog tables, not the streaming state store.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from cartography_spark.catalog import GraphCatalog
from cartography_spark.operators.upsert import load
from cartography_spark.schema import NodeSchema


def run_stream_upsert(
    catalog: GraphCatalog,
    schema: NodeSchema,
    stream_df: DataFrame,
    update_tag_fn: Callable[[int], int] | None = None,
):
    """Run the stream to completion (Trigger.AvailableNow) upserting each
    micro-batch; after it finishes the catalog holds the merged state and
    the per-batch lineage is checkpointed (bounded plans across batches)."""
    tag_of = update_tag_fn or (lambda batch_id: int(batch_id) + 1)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        load(catalog, schema, batch_df, tag_of(batch_id))
        catalog.checkpoint()

    q = stream_df.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    return catalog
