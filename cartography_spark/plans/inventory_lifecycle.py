"""SURVEY §2.7/§2.8 lifecycle operators (upsert, cleanup, analysis DSL,
rules, drift, closure) expressed as deterministic query pipelines so the
DuckDB oracle can verify them. Populated incrementally."""

from __future__ import annotations
