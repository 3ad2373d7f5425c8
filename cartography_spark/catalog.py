"""GraphCatalog — the stored property graph as a catalog of DataFrames.

Reference: the graph lives in Neo4j; here it is
``nodes[label] -> DataFrame`` and ``edges[(src_label, rel, dst_label)] ->
DataFrame`` (SURVEY §1.4). Node tables always carry the engine-managed
columns ``id``, ``firstseen``, ``lastupdated`` (reference nodes.py:48-70);
edge tables carry ``(src_id, dst_id, firstseen, lastupdated, ...props)``.

Scale design: tables are plain DataFrames so they can be parquet- or
Delta-backed; ``save``/``load`` round-trips through parquet partitioned by
the tenant column when one is declared — the Spark analogue of the
reference's tenant-scoped cleanup indexes (partition pruning replaces
index seeks, SURVEY §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EdgeKey = tuple[str, str, str]  # (src_label, rel_label, dst_label)

ENGINE_NODE_COLS = ("id", "firstseen", "lastupdated")
ENGINE_EDGE_COLS = ("src_id", "dst_id", "firstseen", "lastupdated")


@dataclass
class GraphCatalog:
    spark: SparkSession
    nodes: dict[str, DataFrame] = field(default_factory=dict)
    edges: dict[EdgeKey, DataFrame] = field(default_factory=dict)
    # partition column per label (e.g. tenant id) for parquet layout
    partition_cols: dict[str, str] = field(default_factory=dict)

    def node(self, label: str) -> DataFrame:
        if label not in self.nodes:
            raise KeyError(f"unknown node label {label!r}; have {sorted(self.nodes)}")
        return self.nodes[label]

    def edge(self, src_label: str, rel: str, dst_label: str) -> DataFrame:
        key = (src_label, rel, dst_label)
        if key not in self.edges:
            raise KeyError(f"unknown edge {key!r}; have {sorted(self.edges)}")
        return self.edges[key]

    def set_node(self, label: str, df: DataFrame) -> None:
        missing = [c for c in ENGINE_NODE_COLS if c not in df.columns]
        if missing:
            raise ValueError(f"node table {label!r} missing engine columns {missing}")
        self.nodes[label] = df

    def set_edge(self, key: EdgeKey, df: DataFrame) -> None:
        missing = [c for c in ENGINE_EDGE_COLS if c not in df.columns]
        if missing:
            raise ValueError(f"edge table {key!r} missing engine columns {missing}")
        self.edges[key] = df

    def copy(self) -> GraphCatalog:
        """Shallow copy: DataFrames are immutable, so copying the dicts gives
        an independently mutable catalog sharing the underlying plans."""
        return GraphCatalog(
            self.spark,
            dict(self.nodes),
            dict(self.edges),
            dict(self.partition_cols),
        )

    def checkpoint(self) -> None:
        """Truncate plan lineage on every table. Each sync stage chains a
        full-outer merge over the previous table; after many stages Catalyst
        replans the whole chain per action (quadratic). Call between stages
        (or rely on ``save``/``load`` which truncates via parquet) — the
        reference gets this implicitly because Neo4j persists every write."""
        for label, df in list(self.nodes.items()):
            self.nodes[label] = df.localCheckpoint(eager=True)
        for key, df in list(self.edges.items()):
            self.edges[key] = df.localCheckpoint(eager=True)

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        """Write every table as parquet under ``path`` (tenant-partitioned
        when a partition column is registered)."""
        for label, df in self.nodes.items():
            w = df.write.mode("overwrite")
            part = self.partition_cols.get(label)
            if part and part in df.columns:
                w = w.partitionBy(part)
            w.parquet(f"{path}/nodes/{label}")
        for (sl, rl, dl), df in self.edges.items():
            df.write.mode("overwrite").parquet(f"{path}/edges/{sl}__{rl}__{dl}")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> GraphCatalog:
        import os

        cat = cls(spark)
        node_dir = f"{path}/nodes"
        if os.path.isdir(node_dir):
            for label in os.listdir(node_dir):
                cat.nodes[label] = spark.read.parquet(f"{node_dir}/{label}")
        edge_dir = f"{path}/edges"
        if os.path.isdir(edge_dir):
            for name in os.listdir(edge_dir):
                sl, rl, dl = name.split("__")
                cat.edges[(sl, rl, dl)] = spark.read.parquet(f"{edge_dir}/{name}")
        return cat

    # -- test helpers (ports of reference integration-test asserts,
    #    tests/integration/util.py:11-80) -----------------------------------

    def check_nodes(self, label: str, attrs: list[str]) -> set[tuple]:
        return {tuple(r) for r in self.node(label).select(*attrs).collect()}

    def check_rels(
        self,
        src_label: str,
        src_attr: str,
        dst_label: str,
        dst_attr: str,
        rel: str,
    ) -> set[tuple]:
        e = self.edge(src_label, rel, dst_label).select("src_id", "dst_id")
        s = self.node(src_label).select(F.col("id").alias("src_id"), F.col(src_attr).alias("_src_attr"))
        d = self.node(dst_label).select(F.col("id").alias("dst_id"), F.col(dst_attr).alias("_dst_attr"))
        joined = e.join(s, "src_id").join(d, "dst_id").select("_src_attr", "_dst_attr")
        return {tuple(r) for r in joined.collect()}
