"""Built-in rule library: the reference ships 37 rule files under
cartography/rules/data/rules/ — these port the four dominant QUERY SHAPES
of that corpus onto the fixture catalog, end-to-end through the Fact/Rule
engine (plans/rules.py):

- existential-subquery fact (rules/data/rules/object_storage_public.py:14-29
  — asset is failing iff a related record EXISTS with given predicates)
- multi-hop scope fact (asset filtered through a 2-hop tenancy chain, the
  analysis/aws/analysis.py:63 join-chain shape)
- negation / anti-join fact (asset failing iff NO related record exists —
  the EXISTS{}=false idiom)
- aggregation-threshold fact (asset failing iff count of related records
  exceeds N — the corpus's count(...) > N / HAVING idiom)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cartography_spark.catalog import GraphCatalog
from cartography_spark.plans.query import match
from cartography_spark.plans.rules import Fact, Rule


def _neg_bal_high_value(c: GraphCatalog):
    """Customers with negative balance AND >=1 high-value order (EXISTS)."""
    orders = c.node("Order").filter(F.col("totalprice") > 300000)
    return (
        c.node("Customer")
        .filter(F.col("acctbal") < 0)
        .join(
            orders.select(F.col("o_custkey").cast("string").alias("id")).distinct(),
            "id",
            "left_semi",
        )
        .select(F.col("id").alias("asset_id"), "name", "acctbal")
    )


def _asia_negative_suppliers(c: GraphCatalog):
    """Suppliers in region ASIA with negative balance (2-hop tenancy)."""
    p = (
        match(c, "Supplier", "s")
        .where(F.col("s__acctbal") < 0)
        .out("LOCATED_IN", "Nation", "n")
        .inward("RESOURCE", "Region", "r")
    )
    return p.df.filter(F.col("r__name") == "ASIA").select(
        F.col("s__id").alias("asset_id"), F.col("s__name").alias("name")
    )


def _bulk_order_customers(c: GraphCatalog):
    """Customers with more than 30 orders (aggregation-threshold / HAVING
    shape — the rules corpus's count(...) > N idiom)."""
    heavy = (
        c.node("Order")
        .groupBy(F.col("o_custkey").cast("string").alias("id"))
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > 30)
    )
    return (
        c.node("Customer")
        .join(heavy, "id")
        .select(F.col("id").alias("asset_id"), "name", "n_orders")
    )


def _customers_without_orders(c: GraphCatalog):
    """Customers with NO orders at all (anti-join / NOT EXISTS)."""
    orders = c.node("Order").select(F.col("o_custkey").cast("string").alias("id")).distinct()
    return (
        c.node("Customer")
        .join(orders, "id", "left_anti")
        .select(F.col("id").alias("asset_id"), "name")
    )


ACCOUNT_HYGIENE = Rule(
    rule_id="account-hygiene",
    name="Account balance and activity hygiene",
    facts=(
        Fact(
            fact_id="neg-balance-high-value-customers",
            name="Negative-balance customers with high-value orders",
            query=_neg_bal_high_value,
            asset_label="Customer",
            asset_id_field="asset_id",
        ),
        Fact(
            fact_id="asia-negative-suppliers",
            name="ASIA-region suppliers with negative balance",
            query=_asia_negative_suppliers,
            asset_label="Supplier",
            asset_id_field="asset_id",
        ),
        Fact(
            fact_id="bulk-order-customers",
            name="Customers exceeding 30 orders",
            query=_bulk_order_customers,
            asset_label="Customer",
            asset_id_field="asset_id",
        ),
        Fact(
            fact_id="customers-without-orders",
            name="Customers with no orders",
            query=_customers_without_orders,
            asset_label="Customer",
            asset_id_field="asset_id",
        ),
    ),
    frameworks={"CIS": "1.12", "SOC2": "CC6.1", "ISO27001": "A.9.2"},
)
