"""SURVEY §2.7/§2.8/§3 lifecycle operator inventory: upsert, scoped and
cascade cleanup, analysis DSL effects, rules compliance, drift, and the
variable-length closure — each run through the REAL engine operators on a
graph catalog built from the driver tables, with a DuckDB oracle that
computes the expected end state relationally.

These are the queries that prove the engine's write path (MERGE semantics,
firstseen preservation, tenant scoping) — the reference's core loop
(querybuilder.py:1266-1279; cleanupbuilder.py:16-122).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cartography_spark.catalog import GraphCatalog
from cartography_spark.operators.cleanup import cleanup_cascade, cleanup_nodes
from cartography_spark.operators.closure import transitive_closure
from cartography_spark.operators.upsert import load
from cartography_spark.plans.registry import query
from cartography_spark.schema import NodeSchema, PropertyRef, RelSchema, TargetNodeMatcher
from cartography_spark.sources.parquet import load_table

T1, T2 = 100, 200

_BASE_CACHE: dict[tuple[int, str], GraphCatalog] = {}


def base_catalog(spark: SparkSession, sf_dir: str) -> GraphCatalog:
    """Build (once per session+sf_dir) the FIXTURES §B catalog at T1 and
    hand out cheap copies."""
    key = (id(spark), sf_dir)
    if key not in _BASE_CACHE:
        from cartography_spark.plans.graph_fixture import build_catalog

        _BASE_CACHE[key] = build_catalog(spark, sf_dir, T1)
    return _BASE_CACHE[key].copy()


def _supplier_batches(spark: SparkSession, sf_dir: str):
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    b1 = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_regionkey")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).withColumn("s_acctbal_positive", F.col("s_acctbal") > 0)
    b2 = b1.filter(F.col("s_suppkey") % 2 == 0).withColumn("s_acctbal", F.col("s_acctbal") + 1000)
    return b1, b2


def _lifecycle_catalog(spark: SparkSession, sf_dir: str) -> GraphCatalog:
    """T1: all suppliers; T2: even suppkeys with acctbal+1000 — the
    sync-twice pattern of the reference's integration tests."""
    from cartography_spark.plans.graph_fixture import SUPPLIER_SCHEMA

    cat = base_catalog(spark, sf_dir)
    _, b2 = _supplier_batches(spark, sf_dir)
    load(cat, SUPPLIER_SCHEMA, b2, T2)
    return cat


@query(
    "upsert_lifecycle",
    oracle="""
    SELECT CAST(s_suppkey AS VARCHAR) AS id,
           ROUND(CASE WHEN s_suppkey % 2 = 0 THEN s_acctbal + 1000 ELSE s_acctbal END, 2) AS acctbal,
           CAST(100 AS BIGINT) AS firstseen,
           CAST(CASE WHEN s_suppkey % 2 = 0 THEN 200 ELSE 100 END AS BIGINT) AS lastupdated
    FROM supplier
    """,
    doc="MERGE upsert lifecycle (querybuilder.py:1266-1279): batch2 mutates "
    "even suppliers at T2; firstseen survives from T1, lastupdated and the "
    "mutated property reflect the latest batch.",
    tags=("engine", "mutation"),
)
def q_upsert_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _lifecycle_catalog(spark, sf_dir)
    return cat.node("Supplier").select(
        "id", F.round("acctbal", 2).alias("acctbal"), "firstseen", "lastupdated"
    )


@query(
    "cleanup_scoped",
    oracle="""
    SELECT CAST(s_suppkey AS VARCHAR) AS id,
           CAST(CASE WHEN s_suppkey % 2 = 0 THEN 200 ELSE 100 END AS BIGINT) AS lastupdated
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE NOT (s_suppkey % 2 = 1 AND n_regionkey = 0)
    """,
    doc="Tenant-scoped stale cleanup (cleanupbuilder.py:16-122 case 1, "
    ":244-390): after the T2 sync of tenant Region-0, stale suppliers in "
    "that region are deleted; stale rows of other tenants survive.",
    tags=("engine", "mutation"),
)
def q_cleanup_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.graph_fixture import SUPPLIER_SCHEMA

    cat = _lifecycle_catalog(spark, sf_dir)
    cleanup_nodes(cat, SUPPLIER_SCHEMA, T2, tenant_id="0")
    return cat.node("Supplier").select("id", "lastupdated")


@query(
    "cleanup_unscoped",
    oracle="""
    SELECT CAST(s_suppkey AS VARCHAR) AS id
    FROM supplier WHERE s_suppkey % 2 = 0
    """,
    doc="Unscoped (global) stale cleanup (cleanupbuilder.py:386-452): only "
    "rows touched at T2 survive.",
    tags=("engine", "mutation"),
)
def q_cleanup_unscoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.graph_fixture import SUPPLIER_SCHEMA

    cat = _lifecycle_catalog(spark, sf_dir)
    cleanup_nodes(cat, SUPPLIER_SCHEMA, T2, tenant_id=None)
    return cat.node("Supplier").select("id")


_LINEITEM_SCHEMA = NodeSchema(
    label="Lineitem",
    properties={
        "id": PropertyRef("li_id"),
        "quantity": PropertyRef("l_quantity"),
        "l_orderkey": PropertyRef("l_orderkey"),
    },
    other_relationships=(
        RelSchema(
            rel_label="PART_OF",
            target_node_label="Order",
            target_node_matcher=TargetNodeMatcher({"id": PropertyRef("l_orderkey_str")}),
        ),
    ),
    scoped_cleanup=False,
)


def _lineitem_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("li_id", F.concat_ws("-", "l_orderkey", "l_linenumber"))
        .withColumn("l_orderkey_str", F.col("l_orderkey").cast("string"))
    )


@query(
    "cleanup_cascade",
    oracle="""
    SELECT (SELECT count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem WHERE l_orderkey % 2 = 0)
             AS n_lineitems,
           (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0) AS n_orders
    """,
    doc="Cascade delete (cleanupbuilder.py:309-334): T2 syncs only even "
    "orders + their lineitems; stale parents AND their stale children are "
    "deleted in one pass.",
    tags=("engine", "mutation"),
)
def q_cleanup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.graph_fixture import ORDER_SCHEMA

    cat = base_catalog(spark, sf_dir)
    li = _lineitem_batch(spark, sf_dir)
    load(cat, _LINEITEM_SCHEMA, li, T1)
    load(cat, ORDER_SCHEMA, load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 2 == 0), T2)
    load(cat, _LINEITEM_SCHEMA, li.filter(F.col("l_orderkey") % 2 == 0), T2)
    cleanup_cascade(
        cat,
        parent_schema=ORDER_SCHEMA,
        child_schema=_LINEITEM_SCHEMA,
        child_edge=("Lineitem", "PART_OF", "Order"),
        update_tag=T2,
    )
    # One lazy plan instead of two count() driver actions + an ExistingRDD
    # (r8 opt §36): the two MERGE/cascade chains are independent subtrees,
    # so a single action schedules them concurrently and the bench's noop
    # sink is the only materialization. Same 1-row (n_lineitems, n_orders).
    n_li = cat.node("Lineitem").agg(F.count(F.lit(1)).cast("bigint").alias("n_lineitems"))
    n_o = cat.node("Order").agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    return n_li.crossJoin(n_o)


@query(
    "analysis_set_property",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS id
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_totalprice > 300000
    """,
    doc="Analysis DSL SetProperty (analysis.py:71-88; e.g. exposed_internet "
    "flags, analysis/aws/analysis.py:96-330): 3-hop match -> derived boolean "
    "property on Order nodes.",
    tags=("engine", "analysis"),
)
def q_analysis_set_property(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.analysis import AnalysisJob, AnalysisStatement, SetProperty
    from cartography_spark.plans.query import match

    cat = base_catalog(spark, sf_dir)

    def matcher(c: GraphCatalog) -> DataFrame:
        return (
            match(c, "Order", "o")
            .where(F.col("o__totalprice") > 300000)
            .out("PLACED_BY", "Customer", "c")
            .inward("RESOURCE", "Region", "r")
            .df.filter(F.col("r__name") == "ASIA")
        )

    job = AnalysisJob(
        name="high-value-asia",
        statements=(
            AnalysisStatement(
                matcher=matcher,
                effects=(SetProperty("Order", "o__id", "high_value", True),),
            ),
        ),
    )
    job.run(cat, T2)
    return cat.node("Order").filter(F.col("high_value") == True).select("id")  # noqa: E712


@query(
    "analysis_add_relationship",
    oracle="""
    SELECT s_nationkey AS supplier_nation, count(*) AS n_edges
    FROM (
      SELECT DISTINCT o_custkey, l_suppkey
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ) pairs
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
    doc="Analysis DSL AddRelationship + auto-cleanup "
    "(analysis.py:134-150; analysisbuilder.py:385-490; mirrors "
    "AWS_EC2_IAM_INSTANCE_PROFILE, analysis/aws/analysis.py:10-29): derive "
    "(Customer)-[:BUYS_FROM]->(Supplier) through the order->lineitem chain; "
    "a second run restricted to status-F orders cleans stale derived edges.",
    tags=("engine", "analysis"),
)
def q_analysis_add_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.analysis import AddRelationship, AnalysisJob, AnalysisStatement

    cat = base_catalog(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def matcher_all(c: GraphCatalog) -> DataFrame:
        return (
            orders.join(li, orders.o_orderkey == li.l_orderkey)
            .select(
                F.col("o_custkey").cast("string").alias("cust_id"),
                F.col("l_suppkey").cast("string").alias("supp_id"),
                "o_orderstatus",
            )
        )

    def matcher_f(c: GraphCatalog) -> DataFrame:
        return matcher_all(c).filter(F.col("o_orderstatus") == "F")

    effect = AddRelationship("Customer", "BUYS_FROM", "Supplier", "cust_id", "supp_id")
    AnalysisJob("buys-from", (AnalysisStatement(matcher_all, (effect,)),)).run(cat, T1)
    # second run: only F orders still produce the edge -> auto-cleanup drops the rest
    AnalysisJob("buys-from", (AnalysisStatement(matcher_f, (effect,)),)).run(cat, T2)

    edges = cat.edge("Customer", "BUYS_FROM", "Supplier")
    sup = cat.node("Supplier").select(F.col("id").alias("dst_id"), "s_nationkey")
    return (
        edges.join(sup, "dst_id")
        .groupBy(F.col("s_nationkey").alias("supplier_nation"))
        .agg(F.count("*").alias("n_edges"))
    )


@query(
    "analysis_aibom_runs_on",
    oracle="""
    SELECT n_regionkey AS regionkey, CAST(count(*) AS BIGINT) AS n_runs_on
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_regionkey
    """,
    doc="1:1 port of the reference's aibom analysis job "
    "(analysis/aibom/analysis.py:5-23): MATCH (a:AIBOMSource)-"
    "[:SCANNED_IMAGE]->(i:Image)<-[:RESOLVED_IMAGE]-(c:Container) => "
    "AddRelationship(a, RUNS_ON, c) with auto-cleanup. Same 2-hop "
    "shared-middle shape on the fixture graph: (Order)-[:PLACED_BY]->"
    "(Customer)<-[:RESOURCE]-(Region) => (Order)-[:RUNS_ON]->(Region). "
    "The middle node is chosen for the reference's FAN-OUT PROFILE: an "
    "image resolves to a bounded set of containers, so the derived edge "
    "set is linear in the source side (one edge per order here) — a "
    "low-cardinality middle (e.g. Nation) would make the output "
    "|A_m|x|C_m| per middle, quadratic under replication, which is NOT "
    "the reference job's shape (measured: 2.5 s -> 88 s at 10x before "
    "this remap). The job runs TWICE (idempotency: MERGE + auto-cleanup "
    "keeps the derived edge set stable — a duplicated edge would double "
    "the oracle counts).",
    tags=("engine", "analysis"),
)
def q_analysis_aibom_runs_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.analysis import AddRelationship, AnalysisJob, AnalysisStatement
    from cartography_spark.plans.query import match

    cat = base_catalog(spark, sf_dir)

    def matcher(c: GraphCatalog) -> DataFrame:
        return (
            match(c, "Order", "a")
            .out("PLACED_BY", "Customer", "i")
            .inward("RESOURCE", "Region", "c")
            .select(F.col("a__id").alias("src"), F.col("c__id").alias("dst"))
        )

    effect = AddRelationship("Order", "RUNS_ON", "Region", "src", "dst")
    job = AnalysisJob(
        "aibom_runs_on_container_analysis",
        (AnalysisStatement(matcher, (effect,)),),
    )
    job.run(cat, T1)
    job.run(cat, T2)  # idempotent re-run: auto-cleanup keeps the set stable

    edges = cat.edge("Order", "RUNS_ON", "Region")
    return (
        edges.groupBy(F.col("dst_id").cast("long").alias("regionkey"))
        .agg(F.count("*").alias("n_runs_on"))
    )


@query(
    "analysis_exposure_chain",
    oracle="""
    WITH exposed_cust AS (
      SELECT c_custkey FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND c_acctbal > 0
      UNION
      SELECT o_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'O'
    )
    SELECT CAST(l_suppkey AS VARCHAR) AS supplier_id,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exposing_customers,
           CAST('via_order_only' AS VARCHAR) AS exposure_type,
           TRUE AS exposed_internet
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_custkey IN (SELECT c_custkey FROM exposed_cust)
    GROUP BY l_suppkey
    """,
    doc="Port of the reference's AWS internet-exposure analysis chain "
    "(analysis/aws/analysis.py:63-330) onto the fixture graph: statement 1 "
    "seeds 'direct' exposure (EUROPE customers with positive balance — the "
    "internet-facing-LB analog, SetProperty + AddToSet), statement 2 adds "
    "urgent-open-order exposure with AddValuesToSet and an incremental_on "
    "update-tag gate (analysis.py:28-36), statement 3 walks the 5-hop "
    "exposed-customer -> order -> lineitem -> supplier chain (the "
    "LB->ECS-container shape, analysis/aws/analysis.py:63-76) deriving "
    "(Customer)-[:EXPOSES]->(Supplier) edges plus "
    "SetRelationshipPropertyIfMissing(exposure_type) and supplier-side "
    "exposure flags. The oracle recomputes the whole chain relationally.",
    tags=("engine", "analysis"),
)
def q_analysis_exposure_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.analysis import (
        AddRelationship,
        AddToSet,
        AddValuesToSet,
        AnalysisJob,
        AnalysisStatement,
        SetProperty,
        SetRelationshipPropertyIfMissing,
    )
    from cartography_spark.plans.query import match

    cat = base_catalog(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")

    def direct_matcher(c: GraphCatalog) -> DataFrame:
        return (
            match(c, "Customer", "c")
            .where(F.col("c__acctbal") > 0)
            .inward("RESOURCE", "Region", "r")
            .df.filter(F.col("r__name") == "EUROPE")
            .select(F.col("c__id").alias("cust_id"))
        )

    def urgent_matcher(c: GraphCatalog) -> DataFrame:
        return (
            c.node("Order")
            .filter((F.col("priority") == "1-URGENT") & (F.col("status") == "O"))
            .select(
                F.col("o_custkey").cast("string").alias("cust_id"),
                F.col("lastupdated").alias("o_lastupdated"),
            )
        )

    def chain_matcher(c: GraphCatalog) -> DataFrame:
        exposed = (
            c.node("Customer")
            .filter(F.col("exposed_internet") == True)  # noqa: E712
            .select(F.col("id").alias("cust_id"))
        )
        orders = c.node("Order").select(
            F.col("id").alias("order_id"), F.col("o_custkey").cast("string").alias("cust_id")
        )
        items = li.select(
            F.col("l_orderkey").cast("string").alias("order_id"),
            F.col("l_suppkey").cast("string").alias("supp_id"),
        )
        return exposed.join(orders, "cust_id").join(items, "order_id")

    job = AnalysisJob(
        name="fixture-exposure-chain",
        statements=(
            AnalysisStatement(
                direct_matcher,
                (
                    SetProperty("Customer", "cust_id", "exposed_internet", True),
                    AddToSet("Customer", "cust_id", "exposed_internet_type", "direct"),
                ),
            ),
            AnalysisStatement(
                urgent_matcher,
                (
                    SetProperty("Customer", "cust_id", "exposed_internet", True),
                    AddValuesToSet(
                        "Customer", "cust_id", "exposed_internet_type", ("order", "urgent")
                    ),
                ),
                incremental_on=("o_lastupdated",),
            ),
            AnalysisStatement(
                chain_matcher,
                (
                    AddRelationship("Customer", "EXPOSES", "Supplier", "cust_id", "supp_id"),
                    SetRelationshipPropertyIfMissing(
                        ("Customer", "EXPOSES", "Supplier"),
                        "cust_id",
                        "supp_id",
                        "exposure_type",
                        "via_order_only",
                    ),
                    SetProperty("Supplier", "supp_id", "exposed_internet", True),
                    AddToSet("Supplier", "supp_id", "exposed_internet_type", "customer"),
                ),
            ),
        ),
    )
    job.run(cat, T1, incremental=True)

    edges = cat.edge("Customer", "EXPOSES", "Supplier")
    exposed_sup = cat.node("Supplier").filter(F.col("exposed_internet") == True).select(  # noqa: E712
        F.col("id").alias("supplier_id"), "exposed_internet"
    )
    return (
        edges.groupBy(F.col("dst_id").alias("supplier_id"))
        .agg(
            F.countDistinct("src_id").alias("n_exposing_customers"),
            F.max("exposure_type").alias("exposure_type"),
        )
        .join(exposed_sup, "supplier_id")
        .select("supplier_id", "n_exposing_customers", "exposure_type", "exposed_internet")
    )


@query(
    "analysis_k8s_exposure",
    oracle="""
    WITH lbs AS (
      SELECT n_nationkey FROM nation
      WHERE n_nationkey % 5 = 0 OR (n_regionkey = 2 AND n_name LIKE 'C%')
    ),
    svc AS (
      SELECT c_custkey, c_nationkey FROM customer
      JOIN nation n ON c_nationkey = n.n_nationkey
      WHERE n.n_regionkey = 0 AND c_nationkey IN (SELECT n_nationkey FROM lbs)
    ),
    pod AS (
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM svc)
    ),
    cont AS (
      SELECT DISTINCT s.c_nationkey AS lb_id, l.l_suppkey AS supp_id
      FROM pod p JOIN svc s ON p.o_custkey = s.c_custkey
      JOIN lineitem l ON l.l_orderkey = p.o_orderkey
    )
    SELECT CAST(supp_id AS VARCHAR) AS supplier_id,
           CAST(count(DISTINCT lb_id) AS BIGINT) AS n_exposing_lbs,
           CAST('via_lb_only' AS VARCHAR) AS exposure_type,
           TRUE AS exposed_internet
    FROM cont GROUP BY supp_id
    """,
    doc="Port of the reference's KUBERNETES internet-exposure analysis "
    "package (analysis/kubernetes/analysis.py:8-150) onto the fixture "
    "graph — the second end-to-end AnalysisJob family after the AWS "
    "chain. The k8s shape distinctives all appear: a ScopeById tenant "
    "anchor restricting every statement AND the generated cleanup to one "
    "cluster (here Region 0; scope members via RESOURCE edges, "
    "analysis.py:12-24), the disjunctive LB predicate "
    "(lb.exposed_internet OR (scheme='internet-facing' AND "
    "type='network') -> nationkey%5=0 OR (regionkey=2 AND name LIKE "
    "'C%')), and the CASCADING svc->pod->container exposure: statement 2 "
    "matches on the exposed_internet flag statement 1 just wrote "
    "(K8S_POD_ASSET_EXPOSURE matching {exposed_internet: true}), and "
    "statement 3 on statement 2's. SetProperties writes the pod's "
    "multi-prop update in one pass (analysis.py:81-88); AddToSet "
    "accumulates exposed_internet_type; AddRelationship + "
    "SetRelationshipPropertyIfMissing derive the "
    "(lb)-[:EXPOSE {exposure_type}]->(container) edges of "
    "K8S_LB_CONTAINER_EXPOSURE. The oracle recomputes the whole cascade "
    "relationally.",
    tags=("engine", "analysis"),
)
def q_analysis_k8s_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.analysis import (
        AddRelationship,
        AddToSet,
        AnalysisJob,
        AnalysisStatement,
        ScopeById,
        SetProperties,
        SetProperty,
        SetRelationshipPropertyIfMissing,
    )

    cat = base_catalog(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")

    # the "internet-facing load balancer" analog: a disjunctive predicate
    # over the Nation label, mirroring `lb.exposed_internet = true OR
    # (lb.scheme = 'internet-facing' AND lb.type = 'network')`
    def lb_nations(c: GraphCatalog) -> DataFrame:
        n = c.node("Nation")
        cond = (F.col("n_nationkey") % 5 == 0) | (
            (F.col("n_regionkey") == 2) & F.col("name").startswith("C")
        )
        return n.filter(cond).select(F.col("id").alias("lb_id"))

    # statement 1 — service exposure: customers LOCATED_IN an exposed LB
    # nation (K8S_SERVICE_ASSET_EXPOSURE's svc-[:USES_LOAD_BALANCER]->lb)
    def svc_matcher(c: GraphCatalog) -> DataFrame:
        e = c.edge("Customer", "LOCATED_IN", "Nation")
        return (
            e.join(lb_nations(c), e.dst_id == F.col("lb_id"))
            .select(F.col("src_id").alias("cid"))
            .distinct()
        )

    # statement 2 — pod exposure: orders PLACED_BY a service exposed by
    # statement 1 (matching on the flag the previous statement wrote)
    def pod_matcher(c: GraphCatalog) -> DataFrame:
        exposed = (
            c.node("Customer")
            .filter(F.col("exposed_internet") == True)  # noqa: E712
            .select(F.col("id").alias("cid"))
        )
        orders = c.node("Order").select(
            F.col("id").alias("oid"), F.col("o_custkey").cast("string").alias("cid")
        )
        return orders.join(exposed, "cid")

    # statement 3 — container exposure + derived LB->container EXPOSE
    # edges: exposed pods' lineitems reach suppliers; the exposing LB is
    # the service's nation
    def cont_matcher(c: GraphCatalog) -> DataFrame:
        pods = (
            c.node("Order")
            .filter(F.col("exposed_internet") == True)  # noqa: E712
            .select(F.col("id").alias("oid"), F.col("o_custkey").cast("string").alias("cid"))
        )
        loc = c.edge("Customer", "LOCATED_IN", "Nation").select(
            F.col("src_id").alias("cid"), F.col("dst_id").alias("lb_id")
        )
        items = li.select(
            F.col("l_orderkey").cast("string").alias("oid"),
            F.col("l_suppkey").cast("string").alias("sid"),
        )
        return pods.join(loc, "cid").join(items, "oid")

    job = AnalysisJob(
        name="k8s-compute-exposure",
        scope=ScopeById("Region", "CLUSTER_ID", scope_on="cid", member_label="Customer"),
        statements=(
            AnalysisStatement(
                svc_matcher,
                (
                    SetProperty("Customer", "cid", "exposed_internet", True),
                    AddToSet("Customer", "cid", "exposed_internet_type", "lb"),
                ),
            ),
            AnalysisStatement(
                pod_matcher,
                (
                    SetProperties(
                        "Order", "oid", {"exposed_internet": True, "exposure_surface": "pod"}
                    ),
                    AddToSet("Order", "oid", "exposed_internet_type", "lb"),
                ),
            ),
            AnalysisStatement(
                cont_matcher,
                (
                    SetProperty("Supplier", "sid", "exposed_internet", True),
                    AddToSet("Supplier", "sid", "exposed_internet_type", "lb"),
                    AddRelationship("Nation", "EXPOSE", "Supplier", "lb_id", "sid"),
                    SetRelationshipPropertyIfMissing(
                        ("Nation", "EXPOSE", "Supplier"),
                        "lb_id",
                        "sid",
                        "exposure_type",
                        "via_lb_only",
                    ),
                ),
            ),
        ),
    )
    job.run(cat, T1, params={"CLUSTER_ID": "0"})

    edges = cat.edge("Nation", "EXPOSE", "Supplier")
    exposed_sup = (
        cat.node("Supplier")
        .filter(F.col("exposed_internet") == True)  # noqa: E712
        .select(F.col("id").alias("supplier_id"), "exposed_internet")
    )
    return (
        edges.groupBy(F.col("dst_id").alias("supplier_id"))
        .agg(
            F.countDistinct("src_id").alias("n_exposing_lbs"),
            F.max("exposure_type").alias("exposure_type"),
        )
        .join(exposed_sup, "supplier_id")
        .select("supplier_id", "n_exposing_lbs", "exposure_type", "exposed_internet")
    )


_PART_SCHEMA = NodeSchema(
    label="Part",
    properties={
        "id": PropertyRef("p_partkey"),
        "name": PropertyRef("p_name"),
        "brand": PropertyRef("p_brand"),
        "size": PropertyRef("p_size"),
    },
    scoped_cleanup=False,
)


@query(
    "analysis_gcp_ontology_projection",
    oracle="""
    WITH ret AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT CAST(p_partkey AS VARCHAR) AS part_id,
           CASE WHEN coalesce(p_brand, '') = 'Brand#11' THEN FALSE
                ELSE coalesce(p_size > 40, FALSE)
                     OR (p_partkey IN (SELECT l_partkey FROM ret)) END AS ont_public,
           CASE WHEN p_size > 45 THEN TRUE ELSE FALSE END AS exposed_internet,
           CASE WHEN p_size > 45 THEN 'direct' ELSE NULL END AS exposed_internet_type
    FROM part
    """,
    doc="Port of the reference's GCP analysis package shapes "
    "(analysis/gcp/analysis.py) onto the fixture graph — closing the "
    "analysis family alongside the AWS chain and the Kubernetes cascade. "
    "Exercises the VALUE-TERM AST of SURVEY §2.8: "
    "GCP_BUCKET_PUBLIC_PROJECTION's Case(when=..., else_=RawCypher(...)) "
    "effect value (analysis/gcp/analysis.py:52-77) becomes an F.when "
    "whose else-branch is an F.expr over matcher-computed columns — the "
    "EXISTS{} subquery inside the RawCypher is the matcher's left-semi "
    "flag join. Also mirrors GCP_COMPUTE_FORWARDING_RULE_EXPOSURE's "
    "two-statement idiom (:79-100): SetProperties(exposed_internet, "
    "type) on the matched subset, then a DEFAULT-FILL statement matching "
    "`exposed_internet IS NULL` and setting false — so the projected "
    "column is total (no null booleans) without touching rows the first "
    "statement wrote.",
    tags=("engine", "analysis"),
)
def q_analysis_gcp_ontology_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.analysis import (
        AnalysisJob,
        AnalysisStatement,
        SetProperties,
        SetProperty,
    )

    cat = base_catalog(spark, sf_dir)
    load(cat, _PART_SCHEMA, load_table(spark, sf_dir, "part"), T1)
    li = load_table(spark, sf_dir, "lineitem")

    # GCPBucket -> Part: the public-access projection over EVERY node of
    # the label (MATCH (b:GCPBucket), no WHERE)
    def bucket_matcher(c: GraphCatalog) -> DataFrame:
        parts = c.node("Part").select(F.col("id").alias("pid"), "brand", "size")
        returned = (
            li.filter(F.col("l_returnflag") == "R")
            .select(F.col("l_partkey").cast("string").alias("pid"))
            .distinct()
            .withColumn("__r", F.lit(True))
        )
        return parts.join(returned, "pid", "left").withColumn(
            "has_return", F.coalesce("__r", F.lit(False))
        )

    # Case(when=(prevention='enforced', False), else_=RawCypher(acl OR EXISTS))
    ont_public = F.when(
        F.coalesce(F.col("brand"), F.lit("")) == "Brand#11", F.lit(False)
    ).otherwise(F.expr("coalesce(size > 40, false) OR has_return"))

    def external_matcher(c: GraphCatalog) -> DataFrame:
        return c.node("Part").filter(F.col("size") > 45).select(F.col("id").alias("pid"))

    def unset_matcher(c: GraphCatalog) -> DataFrame:
        return (
            c.node("Part")
            .filter(F.col("exposed_internet").isNull())
            .select(F.col("id").alias("pid"))
        )

    job = AnalysisJob(
        name="gcp-ontology-projection",
        statements=(
            AnalysisStatement(
                bucket_matcher, (SetProperty("Part", "pid", "ont_public", ont_public),)
            ),
            AnalysisStatement(
                external_matcher,
                (
                    SetProperties(
                        "Part",
                        "pid",
                        {"exposed_internet": True, "exposed_internet_type": "direct"},
                    ),
                ),
            ),
            AnalysisStatement(
                unset_matcher, (SetProperty("Part", "pid", "exposed_internet", False),)
            ),
        ),
    )
    job.run(cat, T1)
    return cat.node("Part").select(
        F.col("id").alias("part_id"),
        "ont_public",
        "exposed_internet",
        "exposed_internet_type",
    )


@query(
    "rule_compliance_counts",
    oracle="""
    SELECT CAST('negative-balance-customers' AS VARCHAR) AS fact_id,
           CAST(count(DISTINCT CASE WHEN c_acctbal < 0 THEN c_custkey END) AS BIGINT) AS failing,
           CAST(count(DISTINCT c_custkey) - count(DISTINCT CASE WHEN c_acctbal < 0 THEN c_custkey END) AS BIGINT) AS passing,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS total
    FROM customer
    """,
    doc="Rules engine compliance math (rules/runners.py:121-134): failing = "
    "distinct asset_id_field values; passing = total - failing.",
    tags=("engine", "rules"),
)
def q_rule_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.rules import Fact, compliance_summary

    cat = base_catalog(spark, sf_dir)
    fact = Fact(
        fact_id="negative-balance-customers",
        name="Customers with negative account balance",
        query=lambda c: c.node("Customer").filter(F.col("acctbal") < 0).select(
            F.col("id").alias("asset_id"), "name", "acctbal"
        ),
        asset_label="Customer",
        asset_id_field="asset_id",
    )
    return compliance_summary([fact.run(cat)])


@query(
    "drift_detect_states",
    oracle="""
    WITH s1 AS (SELECT o_orderpriority, o_orderstatus FROM orders WHERE year(o_orderdate) <= 1996),
         s2 AS (SELECT o_orderpriority, o_orderstatus FROM orders WHERE year(o_orderdate) <= 1997)
    SELECT o_orderpriority, o_orderstatus, 'new' AS status
    FROM (SELECT * FROM s2 EXCEPT ALL SELECT * FROM s1)
    UNION ALL
    SELECT o_orderpriority, o_orderstatus, 'missing' AS status
    FROM (SELECT * FROM s1 EXCEPT ALL SELECT * FROM s2)
    """,
    doc="Drift detection (detect_deviations.py:70-117): multiset difference "
    "of two query snapshots in both directions via exceptAll.",
    tags=("engine", "drift"),
)
def q_drift_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.drift import compare_states, snapshot

    o = load_table(spark, sf_dir, "orders")
    s1 = snapshot("t1", o.filter(F.year("o_orderdate") <= 1996).select("o_orderpriority", "o_orderstatus"))
    s2 = snapshot("t2", o.filter(F.year("o_orderdate") <= 1997).select("o_orderpriority", "o_orderstatus"))
    return compare_states(s1, s2)


@query(
    "variable_length_closure",
    oracle="""
    WITH RECURSIVE ring AS (
      SELECT n_nationkey AS src, (n_nationkey + 1) % 25 AS dst FROM nation
    ), r(src, dst, hops) AS (
      SELECT src, dst, 1 FROM ring
      UNION ALL
      SELECT r.src, ring.dst, r.hops + 1
      FROM r JOIN ring ON r.dst = ring.src
      WHERE r.hops < 3
    )
    SELECT CAST(src AS VARCHAR) AS src_id, CAST(dst AS VARCHAR) AS dst_id,
           CAST(min(hops) AS INT) AS hops
    FROM r GROUP BY src, dst
    """,
    doc="Variable-length path [:REL*1..3] (14 reference use sites, e.g. "
    "intel/googleworkspace/groups.py; SURVEY §2.3) -> bounded iterative "
    "self-join with frontier dedup (operators/closure.py) vs a recursive "
    "CTE oracle.",
    tags=("engine", "graph"),
)
def q_varlen_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    edges = n.select(
        F.col("n_nationkey").cast("string").alias("src_id"),
        ((F.col("n_nationkey") + 1) % 25).cast("string").alias("dst_id"),
    )
    return transitive_closure(edges, max_hops=3)


@query(
    "pattern_multihop_read",
    oracle="""
    SELECT r_name, count(*) AS n_suppliers
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Pattern-match read surface (plans/query.py): "
    "(Supplier)-[:LOCATED_IN]->(Nation)<-[:RESOURCE]-(Region) as chained "
    "equi-joins over the graph catalog.",
    tags=("engine", "query"),
)
def q_pattern_multihop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.query import match

    cat = base_catalog(spark, sf_dir)
    return (
        match(cat, "Supplier", "s")
        .out("LOCATED_IN", "Nation", "n")
        .inward("RESOURCE", "Region", "r")
        .df.groupBy(F.col("r__name").alias("r_name"))
        .agg(F.count("*").alias("n_suppliers"))
    )


@query(
    "analysis_ontology_owns",
    oracle="""
    WITH ident AS (
      SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS src_id,
             CAST(s_suppkey AS VARCHAR) AS dst_id
      FROM customer JOIN supplier
        ON CAST(string_split(lower(trim(c_name)), '#')[2] AS BIGINT)
         = CAST(string_split(lower(trim(s_name)), '#')[2] AS BIGINT)
      WHERE c_name IS NOT NULL AND trim(c_name) <> ''
        AND s_name IS NOT NULL AND trim(s_name) <> ''
    ),
    chain AS (
      SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS src_id,
             CAST(l_suppkey AS VARCHAR) AS dst_id
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
    )
    SELECT src_id, dst_id FROM ident
    UNION
    SELECT src_id, dst_id FROM chain
    """,
    doc="Port of the reference's ontology Devices-OWNS linking job "
    "(analysis/ontology/analysis.py:40-130 DEVICE_OWNS_LINKING): one "
    "derived relationship label populated by MULTIPLE evidence-path "
    "statements that merge into a single deduped edge set. Statement 1 "
    "is the normalized-identity path (the toLower(trim(email)) match, "
    "analysis.py:46) — lowercased/trimmed names joined on their numeric "
    "suffix; statement 2 is the account-chain path (the "
    "User->HAS_ACCOUNT->...->Device chains, analysis.py:54-100) — "
    "customer -> urgent order -> lineitem -> supplier, gated "
    "incremental_on the order's update tag exactly like the reference "
    "gates on IncrementalMatch('obs'). AddRelationship dedups within a "
    "statement and MERGEs across statements; auto-cleanup drops edges "
    "not refreshed this run (analysisbuilder.py:385-490).",
    tags=("engine", "analysis"),
)
def q_analysis_ontology_owns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.analysis import (
        AddRelationship,
        AnalysisJob,
        AnalysisStatement,
    )

    cat = base_catalog(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")

    def identity_matcher(c: GraphCatalog) -> DataFrame:
        suffix = lambda col: F.split(F.lower(F.trim(col)), "#").getItem(1).cast("long")  # noqa: E731
        cust = c.node("Customer").filter(
            F.col("name").isNotNull() & (F.trim("name") != "")
        ).select(F.col("id").alias("cust_id"), suffix(F.col("name")).alias("__sfx"))
        sup = c.node("Supplier").filter(
            F.col("name").isNotNull() & (F.trim("name") != "")
        ).select(F.col("id").alias("supp_id"), suffix(F.col("name")).alias("__sfx"))
        return cust.join(sup, "__sfx")

    def chain_matcher(c: GraphCatalog) -> DataFrame:
        orders = c.node("Order").filter(F.col("priority") == "1-URGENT").select(
            F.col("id").alias("order_id"),
            F.col("o_custkey").cast("string").alias("cust_id"),
            F.col("lastupdated").alias("o_lastupdated"),
        )
        items = li.select(
            F.col("l_orderkey").cast("string").alias("order_id"),
            F.col("l_suppkey").cast("string").alias("supp_id"),
        )
        return orders.join(items, "order_id")

    owns = AddRelationship("Customer", "OWNS", "Supplier", "cust_id", "supp_id")
    job = AnalysisJob(
        name="ontology-owns-linking",
        statements=(
            AnalysisStatement(identity_matcher, (owns,)),
            AnalysisStatement(chain_matcher, (owns,), incremental_on=("o_lastupdated",)),
        ),
    )
    job.run(cat, update_tag=100)
    return cat.edge("Customer", "OWNS", "Supplier").select("src_id", "dst_id")


@query(
    "analysis_semgrep_risk_matrix",
    oracle="""
    WITH f AS (
      SELECT o_orderkey AS k,
             CASE substring(o_orderpriority, 1, 1)
               WHEN '1' THEN 'CRITICAL' WHEN '2' THEN 'HIGH'
               WHEN '3' THEN 'MEDIUM' WHEN '4' THEN 'LOW'
               ELSE 'INFO' END AS severity,
             CASE o_orderkey % 3 WHEN 0 THEN 'REACHABLE'
               WHEN 1 THEN 'UNREACHABLE' ELSE 'MANUAL REVIEW' END AS reachability,
             CASE o_orderkey % 4 WHEN 0 THEN 'NO REACHABILITY ANALYSIS'
               WHEN 1 THEN 'CONDITIONALLY REACHABLE'
               WHEN 2 THEN 'ALWAYS REACHABLE'
               ELSE 'REACHABLE' END AS rcheck,
             (c_custkey % 7 = 0) AS archived
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT CAST(k AS VARCHAR) AS finding_id, severity, reachability,
           rcheck AS reachability_check,
           COALESCE(CASE
             WHEN archived THEN 'INFO'
             WHEN reachability = 'UNREACHABLE' AND rcheck = 'NO REACHABILITY ANALYSIS'
                  AND severity = 'CRITICAL' THEN 'LOW'
             WHEN reachability = 'UNREACHABLE' THEN 'INFO'
             WHEN reachability = 'REACHABLE' AND rcheck = 'CONDITIONALLY REACHABLE'
                  AND severity IN ('LOW', 'MEDIUM') THEN 'LOW'
             WHEN reachability = 'REACHABLE' AND rcheck = 'CONDITIONALLY REACHABLE'
                  AND severity = 'HIGH' THEN 'MEDIUM'
             WHEN reachability = 'REACHABLE' AND rcheck = 'CONDITIONALLY REACHABLE'
                  AND severity = 'CRITICAL' THEN 'HIGH'
             WHEN reachability = 'REACHABLE' AND rcheck = 'ALWAYS REACHABLE'
                  AND severity IN ('LOW', 'MEDIUM') THEN 'LOW'
             WHEN reachability = 'REACHABLE' AND rcheck = 'ALWAYS REACHABLE'
                  AND severity = 'HIGH' THEN 'MEDIUM'
             WHEN reachability = 'REACHABLE' AND rcheck = 'ALWAYS REACHABLE'
                  AND severity = 'CRITICAL' THEN 'CRITICAL'
             WHEN reachability = 'REACHABLE' AND rcheck = 'REACHABLE' THEN severity
           END, 'UNSET') AS reachability_risk
    FROM f
    """,
    doc="Port of the reference's SEMGREP SCA reachability-risk matrix "
    "(analysis/semgrep/analysis.py:30-132, SEMGREP_SCA_RISK_ANALYSIS) "
    "onto the fixture graph — the fourth end-to-end AnalysisJob family "
    "(after the AWS exposure chain, k8s exposure, GCP Case projection). "
    "Its DSL distinctives: ELEVEN ordered statements where a LATER "
    "SetProperty on the same (node, prop) OVERRIDES an earlier one "
    "(statement 2 writes INFO for every UNREACHABLE finding, statement 4 "
    "then upgrades the NRA+CRITICAL slice to LOW — Neo4j sequential SET "
    "semantics, preserved by the engine's coalesce-latest apply), and a "
    "Var-valued SetProperty (reachability_risk := s.severity, the "
    "reference's Var('s.severity')) compiled as a matched-frame Column. "
    "Findings=Orders (severity/reachability/check derived "
    "deterministically from orderkey+priority), repos=Customers "
    "(archived = custkey%7=0) via FOUND_IN=PLACED_BY. Deployment "
    "ScopeById is exercised by analysis_k8s_exposure / "
    "analysis_scoped_set_property and omitted here. The oracle restates "
    "the whole matrix as one precedence-ordered CASE; unmatched findings "
    "stay UNSET (prop never written, nulled by auto-cleanup).",
    tags=("engine", "analysis"),
)
def q_analysis_semgrep_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.analysis import (
        AnalysisJob,
        AnalysisStatement,
        SetProperty,
    )

    cat = base_catalog(spark, sf_dir)

    def findings(c: GraphCatalog) -> DataFrame:
        o = c.node("Order")
        k = F.col("id").cast("long")
        sev = (
            F.when(F.substring("priority", 1, 1) == "1", "CRITICAL")
            .when(F.substring("priority", 1, 1) == "2", "HIGH")
            .when(F.substring("priority", 1, 1) == "3", "MEDIUM")
            .when(F.substring("priority", 1, 1) == "4", "LOW")
            .otherwise("INFO")
        )
        reach = (
            F.when(k % 3 == 0, "REACHABLE")
            .when(k % 3 == 1, "UNREACHABLE")
            .otherwise("MANUAL REVIEW")
        )
        rcheck = (
            F.when(k % 4 == 0, "NO REACHABILITY ANALYSIS")
            .when(k % 4 == 1, "CONDITIONALLY REACHABLE")
            .when(k % 4 == 2, "ALWAYS REACHABLE")
            .otherwise("REACHABLE")
        )
        repos = c.node("Customer").select(
            F.col("id").alias("cid"),
            (F.col("c_custkey").cast("long") % 7 == 0).alias("archived"),
        )
        return (
            o.select(
                F.col("id").alias("fid"),
                F.col("o_custkey").cast("string").alias("cid"),
                sev.alias("sev"),
                reach.alias("reach"),
                rcheck.alias("rcheck"),
            )
            .join(repos, "cid")
        )

    # Every predicate in the reference job matches on IMMUTABLE ingest
    # attributes (severity/reachability/check/archived) — never on the
    # risk property the statements write — so the findings frame is
    # derived ONCE from the pre-job catalog. Deriving it per-statement
    # from the evolving node table would embed the accumulated
    # SetProperty layers into every matcher and double the plan per
    # statement (2^11 growth); with the fixed base frame the node
    # table accrues the 11 write layers linearly.
    fbase = findings(cat)

    def m(pred):
        """matcher: base findings frame filtered by the statement's predicate"""
        return lambda c: fbase.filter(pred)

    RISK = lambda v: SetProperty("Order", "fid", "reachability_risk", v)  # noqa: E731
    not_arch = ~F.col("archived")
    unreach = F.col("reach") == "UNREACHABLE"
    reachable = F.col("reach") == "REACHABLE"
    nra = F.col("rcheck") == "NO REACHABILITY ANALYSIS"
    cond = F.col("rcheck") == "CONDITIONALLY REACHABLE"
    alway = F.col("rcheck") == "ALWAYS REACHABLE"
    job = AnalysisJob(
        name="semgrep-sca-risk",
        statements=(
            AnalysisStatement(m(F.col("archived")), (RISK("INFO"),)),
            AnalysisStatement(m(unreach), (RISK("INFO"),)),
            AnalysisStatement(
                m(not_arch & unreach & nra & F.col("sev").isin("LOW", "MEDIUM", "HIGH")),
                (RISK("INFO"),),
            ),
            AnalysisStatement(
                m(not_arch & unreach & nra & (F.col("sev") == "CRITICAL")), (RISK("LOW"),)
            ),
            AnalysisStatement(
                m(not_arch & reachable & cond & F.col("sev").isin("LOW", "MEDIUM")),
                (RISK("LOW"),),
            ),
            AnalysisStatement(
                m(not_arch & reachable & cond & (F.col("sev") == "HIGH")), (RISK("MEDIUM"),)
            ),
            AnalysisStatement(
                m(not_arch & reachable & cond & (F.col("sev") == "CRITICAL")), (RISK("HIGH"),)
            ),
            AnalysisStatement(
                m(not_arch & reachable & alway & F.col("sev").isin("LOW", "MEDIUM")),
                (RISK("LOW"),),
            ),
            AnalysisStatement(
                m(not_arch & reachable & alway & (F.col("sev") == "HIGH")), (RISK("MEDIUM"),)
            ),
            AnalysisStatement(
                m(not_arch & reachable & alway & (F.col("sev") == "CRITICAL")),
                (RISK("CRITICAL"),),
            ),
            AnalysisStatement(
                m(not_arch & reachable & (F.col("rcheck") == "REACHABLE")),
                (RISK(F.col("sev")),),
            ),
        ),
    )
    job.run(cat, update_tag=T1)
    risk = cat.node("Order").select(F.col("id").alias("fid"), "reachability_risk")
    return fbase.join(risk, "fid").select(
        F.col("fid").alias("finding_id"),
        F.col("sev").alias("severity"),
        F.col("reach").alias("reachability"),
        F.col("rcheck").alias("reachability_check"),
        F.coalesce("reachability_risk", F.lit("UNSET")).alias("reachability_risk"),
    )


@query(
    "analysis_azure_lb_exposure",
    oracle="""
    WITH lbn AS (SELECT n_nationkey FROM nation WHERE n_nationkey % 4 = 1),
    s AS (
      SELECT s_suppkey, s_nationkey,
             s_acctbal > 0 AS direct,
             s_nationkey IN (SELECT n_nationkey FROM lbn) AS vialb,
             n_regionkey
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
    )
    SELECT CAST(s_suppkey AS VARCHAR) AS supplier_id,
           (direct OR vialb) AS exposed_internet,
           CASE WHEN direct AND vialb THEN 'direct,lb'
                WHEN direct THEN 'direct'
                WHEN vialb THEN 'lb' END AS exposure_types,
           CASE WHEN vialb AND NOT direct AND n_regionkey = 1
                THEN 'via_lb_only' END AS lb_exposure_type
    FROM s
    """,
    doc="Port of the reference's AZURE analysis package "
    "(analysis/azure/analysis.py:9-141) onto the fixture graph — the "
    "compute-asset exposure battery plus the scoped LB-EXPOSE job. "
    "Statement order mirrors AZURE_COMPUTE_ASSET_EXPOSURE_JOBS "
    "(lb, vm, container): the LB statement writes "
    "Nation.exposed_internet and the VM via-lb statement MATCHES ON "
    "that flag ({exposed_internet: true}, :26-37); 'direct' exposure is "
    "the pip.ip_address IS NOT NULL analog (acctbal > 0); the final "
    "statements are the azure signature DEFAULT-BACKFILL (WHERE "
    "exposed_internet IS NULL -> false, :36-43) so the flag is total "
    "over BOTH labels. The second job is AZURE_LB_EXPOSURE (:96-117): "
    "ScopeById(subscription->Region 1) with the NEGATED pattern "
    "predicate `WHERE NOT (nic)-[:ASSOCIATED_WITH]->(pip)` compiled as "
    "an anti-join (only NOT-directly-exposed suppliers get the EXPOSE "
    "edge), and the edge's exposure_type='via_lb_only' property "
    "(AddRelationship properties= analog via "
    "SetRelationshipPropertyIfMissing). The oracle recomputes all of "
    "it relationally; exposure_types is the sorted csv of the AddToSet "
    "array so the set semantics hash exactly.",
    tags=("engine", "analysis"),
)
def q_analysis_azure_lb_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.analysis import (
        AddRelationship,
        AddToSet,
        AnalysisJob,
        AnalysisStatement,
        ScopeById,
        SetProperty,
        SetRelationshipPropertyIfMissing,
    )

    cat = base_catalog(spark, sf_dir)

    # job 1 statement 1 — LB exposure (AzureLoadBalancer via frontend
    # public IP): nations with n_nationkey % 4 == 1
    def lb_matcher(c: GraphCatalog) -> DataFrame:
        return (
            c.node("Nation")
            .filter(F.col("n_nationkey") % 4 == 1)
            .select(F.col("id").alias("lbid"))
        )

    # statement 2 — VM direct exposure: pip.ip_address IS NOT NULL analog
    def direct_matcher(c: GraphCatalog) -> DataFrame:
        return (
            c.node("Supplier").filter(F.col("acctbal") > 0).select(F.col("id").alias("sid"))
        )

    # statement 3 — VM via-LB exposure: MATCH (lb {exposed_internet:
    # true})-...->(vm), reading the flag statement 1 just wrote
    def vialb_matcher(c: GraphCatalog) -> DataFrame:
        lb = (
            c.node("Nation")
            .filter(F.col("exposed_internet") == True)  # noqa: E712
            .select(F.col("id").alias("lbid"))
        )
        loc = c.edge("Supplier", "LOCATED_IN", "Nation")
        return loc.join(lb, loc.dst_id == F.col("lbid")).select(F.col("src_id").alias("sid"))

    # statements 4/5 — the azure default-backfill: WHERE exposed_internet
    # IS NULL -> false, on both labels
    def null_sup(c: GraphCatalog) -> DataFrame:
        return (
            c.node("Supplier")
            .filter(F.col("exposed_internet").isNull())
            .select(F.col("id").alias("sid"))
        )

    def null_lb(c: GraphCatalog) -> DataFrame:
        return (
            c.node("Nation")
            .filter(F.col("exposed_internet").isNull())
            .select(F.col("id").alias("lbid"))
        )

    battery = AnalysisJob(
        name="azure-compute-asset-exposure",
        statements=(
            AnalysisStatement(lb_matcher, (SetProperty("Nation", "lbid", "exposed_internet", True),)),
            AnalysisStatement(
                direct_matcher,
                (
                    SetProperty("Supplier", "sid", "exposed_internet", True),
                    AddToSet("Supplier", "sid", "exposed_internet_type", "direct"),
                ),
            ),
            AnalysisStatement(
                vialb_matcher,
                (
                    SetProperty("Supplier", "sid", "exposed_internet", True),
                    AddToSet("Supplier", "sid", "exposed_internet_type", "lb"),
                ),
            ),
            AnalysisStatement(null_sup, (SetProperty("Supplier", "sid", "exposed_internet", False),)),
            AnalysisStatement(null_lb, (SetProperty("Nation", "lbid", "exposed_internet", False),)),
        ),
    )
    battery.run(cat, T1)

    # job 2 — AZURE_LB_EXPOSURE: scoped to one subscription (Region 1),
    # EXPOSE edges only for vms NOT directly exposed (the negated
    # pattern predicate), with the via_lb_only edge property
    def expose_matcher(c: GraphCatalog) -> DataFrame:
        lb = (
            c.node("Nation")
            .filter(F.col("exposed_internet") == True)  # noqa: E712
            .select(F.col("id").alias("lbid"))
        )
        loc = c.edge("Supplier", "LOCATED_IN", "Nation")
        vms = loc.join(lb, loc.dst_id == F.col("lbid")).select(
            F.col("src_id").alias("sid"), "lbid"
        )
        direct = (
            c.node("Supplier")
            .filter(F.col("acctbal") > 0)
            .select(F.col("id").alias("sid"))
        )
        return vms.join(direct, "sid", "left_anti")

    expose = AnalysisJob(
        name="azure-lb-exposure",
        scope=ScopeById("Region", "AZURE_SUBSCRIPTION_ID", scope_on="sid", member_label="Supplier"),
        statements=(
            AnalysisStatement(
                expose_matcher,
                (
                    AddRelationship("Nation", "EXPOSE", "Supplier", "lbid", "sid"),
                    SetRelationshipPropertyIfMissing(
                        ("Nation", "EXPOSE", "Supplier"),
                        "lbid",
                        "sid",
                        "exposure_type",
                        "via_lb_only",
                    ),
                ),
            ),
        ),
    )
    expose.run(cat, T1, params={"AZURE_SUBSCRIPTION_ID": "1"})

    sup = cat.node("Supplier").select(
        F.col("id").alias("supplier_id"),
        "exposed_internet",
        F.when(
            F.col("exposed_internet_type").isNotNull(),
            F.array_join(F.array_sort("exposed_internet_type"), ","),
        ).alias("exposure_types"),
    )
    lb_edges = cat.edge("Nation", "EXPOSE", "Supplier").select(
        F.col("dst_id").alias("supplier_id"), F.col("exposure_type").alias("lb_exposure_type")
    )
    return sup.join(lb_edges, "supplier_id", "left")


@query(
    "analysis_intune_policy_union",
    oracle="""
    WITH pol AS (SELECT n_nationkey, n_regionkey FROM nation WHERE n_regionkey = 2),
    cust AS (
      SELECT c_custkey, c_nationkey, n_regionkey
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ),
    a AS (
      SELECT p.n_nationkey AS pid, o.o_orderkey AS did
      FROM pol p
      JOIN cust c ON c.c_nationkey = p.n_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
    ),
    b AS (
      SELECT p.n_nationkey AS pid, o.o_orderkey AS did
      FROM pol p
      JOIN cust c ON c.n_regionkey = p.n_regionkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE p.n_nationkey % 3 = 0
    ),
    c2 AS (
      SELECT p.n_nationkey AS pid, o.o_orderkey AS did
      FROM pol p
      JOIN cust c ON c.n_regionkey = p.n_regionkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE p.n_nationkey % 5 = 0
    ),
    u AS (SELECT * FROM a UNION SELECT * FROM b UNION SELECT * FROM c2)
    SELECT CAST(pid AS VARCHAR) AS policy_id,
           CAST(count(DISTINCT did) AS BIGINT) AS n_devices,
           CAST(100 AS BIGINT) AS firstseen
    FROM u GROUP BY pid
    """,
    doc="Port of the reference's INTUNE compliance-policy resolution "
    "(analysis/microsoft/intune/analysis.py:7-56) onto the fixture "
    "graph. The intune signature: THREE statements deriving the SAME "
    "relationship type (policy)-[:APPLIES_TO]->(device) from three "
    "different match paths — assigned-group membership, "
    "applies_to_all_users, applies_to_all_devices — whose edge sets "
    "OVERLAP; the engine must union-dedup them into one edge table "
    "(same (src,dst) from two statements merges, firstseen preserved "
    "from the first write, upsert.py _merge_edges). Every statement "
    "carries the reference's incremental_on=('policy','device') gate "
    "(run with incremental=True, so only entities refreshed this sync "
    "act), and the whole job is ScopeById(EntraTenant->Region 2, "
    "scoped on the policy like the reference scope_on='policy'). "
    "Mapping: policy=Nation, user=Customer (LOCATED_IN group), "
    "device=Order, tenant=Region.",
    tags=("engine", "analysis"),
)
def q_analysis_intune_policy_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.analysis import (
        AddRelationship,
        AnalysisJob,
        AnalysisStatement,
        ScopeById,
    )

    cat = base_catalog(spark, sf_dir)

    def _orders(c: GraphCatalog) -> DataFrame:
        return c.node("Order").select(
            F.col("id").alias("did"),
            F.col("o_custkey").cast("string").alias("cid"),
            F.col("lastupdated").alias("d_lastupdated"),
        )

    def _cust_region(c: GraphCatalog) -> DataFrame:
        # user -> group membership: customer LOCATED_IN nation, nation in region
        loc = c.edge("Customer", "LOCATED_IN", "Nation").select(
            F.col("src_id").alias("cid"), F.col("dst_id").alias("nid")
        )
        nat = c.node("Nation").select(F.col("id").alias("nid"), "n_regionkey")
        return loc.join(F.broadcast(nat), "nid")

    # statement 1 — ASSIGNED_TO group: policy applies to devices of users
    # located in the policy's nation-group
    def assigned_matcher(c: GraphCatalog) -> DataFrame:
        pol = c.node("Nation").select(F.col("id").alias("pid"))
        users = _cust_region(c).select("cid", F.col("nid").alias("pid"))
        return _orders(c).join(users, "cid").join(F.broadcast(pol), "pid")

    # statement 2 — applies_to_all_users = true (n_nationkey % 3 == 0):
    # every enrolled device of every user in the tenant
    def _flagged_matcher(c: GraphCatalog, mod: int) -> DataFrame:
        pol = (
            c.node("Nation")
            .filter(F.col("n_nationkey") % mod == 0)
            .select(F.col("id").alias("pid"), F.col("n_regionkey").alias("prk"))
        )
        users = _cust_region(c).select("cid", F.col("n_regionkey").alias("prk"))
        return _orders(c).join(users, "cid").join(F.broadcast(pol), "prk")

    def all_users_matcher(c: GraphCatalog) -> DataFrame:
        return _flagged_matcher(c, 3)

    # statement 3 — applies_to_all_devices = true (n_nationkey % 5 == 0)
    def all_devices_matcher(c: GraphCatalog) -> DataFrame:
        return _flagged_matcher(c, 5)

    rel = AddRelationship("Nation", "APPLIES_TO", "Order", "pid", "did")
    job = AnalysisJob(
        name="intune-compliance-policy-device",
        scope=ScopeById("Region", "TENANT_ID", scope_on="pid", member_label="Nation"),
        statements=(
            AnalysisStatement(assigned_matcher, (rel,), incremental_on=("d_lastupdated",)),
            AnalysisStatement(all_users_matcher, (rel,), incremental_on=("d_lastupdated",)),
            AnalysisStatement(all_devices_matcher, (rel,), incremental_on=("d_lastupdated",)),
        ),
    )
    job.run(cat, T1, incremental=True, params={"TENANT_ID": "2"})

    edges = cat.edge("Nation", "APPLIES_TO", "Order")
    return edges.groupBy(F.col("src_id").alias("policy_id")).agg(
        F.countDistinct("dst_id").alias("n_devices"),
        F.min("firstseen").alias("firstseen"),
    )


@query(
    "analysis_identity_projection",
    oracle="""
    WITH pairs AS (
      SELECT c_custkey, s_suppkey FROM customer JOIN supplier
      ON c_nationkey = s_nationkey AND c_custkey % 7 = s_suppkey % 7
    ),
    minsup AS (SELECT c_custkey, min(s_suppkey) AS msk FROM pairs GROUP BY c_custkey),
    en AS (
      SELECT m.c_custkey, s.s_acctbal > 0 AS enabled
      FROM minsup m JOIN supplier s ON s.s_suppkey = m.msk
    )
    SELECT CAST(c.c_custkey AS VARCHAR) AS customer_id,
           (en.c_custkey IS NOT NULL) AS linked,
           CASE WHEN en.enabled THEN 'true' WHEN NOT en.enabled THEN 'false' END
             AS ont_enabled
    FROM customer c LEFT JOIN en ON c.c_custkey = en.c_custkey
    """,
    doc="Port of the reference's GSUITE human-identity link "
    "(analysis/gsuite/analysis.py:8-25) and ENTRA ontology projection "
    "(analysis/microsoft/entra/analysis.py:7-24) — the last two "
    "unported analysis packages. GSuite shape: a PROPERTY-EQUALITY "
    "match between two labels with no pre-existing edge between them "
    "(`MATCH (human:Human), (guser:GSuiteUser) WHERE human.email = "
    "guser.email`) deriving IDENTITY edges — here Customer x Supplier "
    "on (same nation, key mod 7) as the email analog, an equi-join on "
    "the computed keys, never a cartesian. Entra shape: SetProperty "
    "with a Var() VALUE FROM THE MATCHED VARIABLE (`Var('sp."
    "account_enabled')`) under an OPTIONAL MATCH — compiled as a "
    "Column over the matcher frame; unlinked customers keep the "
    "property NULL (reference OPTIONAL MATCH null propagation), and "
    "the min-key supplier is the deterministic pick (`WITH app, sp`).",
    tags=("engine", "analysis"),
)
def q_analysis_identity_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.plans.analysis import (
        AddRelationship,
        AnalysisJob,
        AnalysisStatement,
        SetProperty,
    )

    cat = base_catalog(spark, sf_dir)

    def _pairs(c: GraphCatalog) -> DataFrame:
        cust = c.node("Customer").select(
            F.col("id").alias("cid"),
            (F.col("c_custkey") % 7).alias("ekey"),
            F.col("c_nationkey").alias("nk"),
        )
        sup = c.node("Supplier").select(
            F.col("id").alias("sid"),
            "s_suppkey",
            (F.col("s_suppkey") % 7).alias("ekey"),
            F.col("s_nationkey").alias("nk"),
            (F.col("acctbal") > 0).alias("enabled"),
        )
        return cust.join(sup, ["nk", "ekey"])

    # entra optional-match projection: every customer, left-joined to its
    # min-key identity supplier's account_enabled flag (null when none)
    def entra_matcher(c: GraphCatalog) -> DataFrame:
        best = (
            _pairs(c)
            .groupBy("cid")
            .agg(F.min_by("enabled", "s_suppkey").alias("enabled"))
        )
        return c.node("Customer").select(F.col("id").alias("cid")).join(best, "cid", "left")

    job = AnalysisJob(
        name="gsuite-entra-identity",
        statements=(
            AnalysisStatement(
                _pairs, (AddRelationship("Customer", "IDENTITY_GSUITE", "Supplier", "cid", "sid"),)
            ),
            AnalysisStatement(
                entra_matcher,
                (SetProperty("Customer", "cid", "_ont_enabled", F.col("enabled")),),
            ),
        ),
    )
    job.run(cat, T1)

    linked = (
        cat.edge("Customer", "IDENTITY_GSUITE", "Supplier")
        .select(F.col("src_id").alias("customer_id"))
        .distinct()
        .withColumn("__l", F.lit(True))
    )
    return (
        cat.node("Customer")
        .select(F.col("id").alias("customer_id"), F.col("_ont_enabled").alias("ont_enabled"))
        .join(linked, "customer_id", "left")
        .select(
            "customer_id",
            F.coalesce("__l", F.lit(False)).alias("linked"),
            # tri-state as a nullable string: a NULL BOOLEAN column hashes
            # differently across pandas conversions (None vs NaN)
            F.when(F.col("ont_enabled"), "true")
            .when(~F.col("ont_enabled"), "false")
            .alias("ont_enabled"),
        )
    )
