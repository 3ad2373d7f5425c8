"""Security-rules engine: Facts, Rules, Findings and compliance math.

Reference: cartography/rules/spec/model.py (Fact :363-462, Finding
:464-505, Rule :505-560) executed by rules/runners.py (_run_fact :72-188;
failing = distinct asset_id_field values :121-125; passing = count_query
total - failing :127-134).

Spark-native: a Fact's query is a function ``(catalog) -> DataFrame`` whose
result must expose the declared ``asset_id_field``; the compliance math is
two aggregates over DataFrames.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cartography_spark.catalog import GraphCatalog


@dataclass(frozen=True)
class Fact:
    """A single detection query (reference model.py:363-462)."""

    fact_id: str
    name: str
    query: Callable[[GraphCatalog], DataFrame]
    asset_label: str
    asset_id_field: str
    # total-asset counter; defaults to counting the asset label's node table
    count_query: Callable[[GraphCatalog], int] | None = None

    def run(self, catalog: GraphCatalog) -> FactResult:
        df = self.query(catalog)
        if self.asset_id_field not in df.columns:
            raise ValueError(
                f"fact {self.fact_id}: result is missing asset_id_field "
                f"{self.asset_id_field!r} (schema validation, model.py:414-462)"
            )
        failing = df.select(self.asset_id_field).distinct().count()
        if self.count_query is not None:
            total = self.count_query(catalog)
        else:
            total = catalog.node(self.asset_label).count()
        return FactResult(
            fact=self,
            findings=df,
            failing_assets=failing,
            total_assets=total,
            passing_assets=max(total - failing, 0),
        )


@dataclass(frozen=True)
class FactResult:
    fact: Fact
    findings: DataFrame
    failing_assets: int
    total_assets: int
    passing_assets: int


@dataclass(frozen=True)
class Rule:
    """A group of facts with metadata + framework mappings
    (reference model.py:505-560; frameworks under rules/data/frameworks/)."""

    rule_id: str
    name: str
    facts: tuple[Fact, ...]
    frameworks: dict[str, str] = field(default_factory=dict)

    def run(self, catalog: GraphCatalog) -> list[FactResult]:
        return [f.run(catalog) for f in self.facts]


def compliance_summary(results: list[FactResult]) -> DataFrame:
    """One row per fact: (fact_id, failing, passing, total) — the formatter
    contract (rules/formatters.py:122+)."""
    if not results:
        raise ValueError("no results")
    spark = results[0].findings.sparkSession
    rows = [
        (r.fact.fact_id, r.failing_assets, r.passing_assets, r.total_assets) for r in results
    ]
    return spark.createDataFrame(rows, "fact_id string, failing long, passing long, total long")
