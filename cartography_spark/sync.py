"""Sync orchestration — the reference's top-level pipeline
(cartography/sync.py:240-297: ordered stages, one session, lazy stage
import; intel/aws/__init__.py:598-684: per-account loop with best-effort
error aggregation).

Spark port: a Sync is an ordered dict of stage callables
``stage(catalog, config) -> None``; stages run sequentially (their INNER
work is distributed — each load/cleanup is a cluster job). Per-tenant
parallelism needs no thread pool: tenant batches union into one DataFrame
and partitioning does the rest.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from cartography_spark.catalog import GraphCatalog

StageFunc = Callable[[GraphCatalog, dict[str, Any]], None]


@dataclass
class Sync:
    """Ordered stages, run sequentially; ``best_effort`` aggregates stage
    errors instead of failing fast (the reference does both: stages fail
    fast in Sync.run, accounts aggregate in _sync_multiple_accounts).

    ``requires`` implements dependency gating
    (util.py run_analysis_and_ensure_deps :145+; orchestration
    intel/aws/__init__.py:712-787): a stage listing prerequisites is
    SKIPPED — not failed — unless every prerequisite stage ran
    successfully in this sync. Skipped stages are reported so callers can
    distinguish "gated off" from "errored".
    """

    stages: dict[str, StageFunc] = field(default_factory=dict)
    requires: dict[str, tuple[str, ...]] = field(default_factory=dict)

    def add_stage(self, name: str, fn: StageFunc, requires: tuple[str, ...] = ()) -> None:
        self.stages[name] = fn
        if requires:
            self.requires[name] = tuple(requires)

    def run(
        self,
        catalog: GraphCatalog,
        config: dict[str, Any] | None = None,
        best_effort: bool = False,
    ) -> dict[str, Exception]:
        config = dict(config or {})
        # default update_tag = epoch seconds (sync.py:494-496)
        config.setdefault("UPDATE_TAG", int(time.time()))
        errors: dict[str, Exception] = {}
        succeeded: set[str] = set()
        self.skipped: list[str] = []
        # per-stage timer metrics — the Spark stand-in for the reference's
        # statsd timers around each sync stage (sync.py:431-438, timeit
        # decorators in util.py): recorded in-process, queryable after run
        self.metrics: list[dict[str, Any]] = []
        for name, fn in self.stages.items():
            deps = self.requires.get(name, ())
            missing = [d for d in deps if d not in succeeded]
            if missing:
                self.skipped.append(name)
                continue
            t0 = time.monotonic()
            try:
                fn(catalog, config)
                succeeded.add(name)
                status = "ok"
            except Exception as exc:
                status = "error"
                if not best_effort:
                    self.metrics.append(
                        {"stage": name, "status": status,
                         "wall_s": round(time.monotonic() - t0, 3)}
                    )
                    raise RuntimeError(f"sync stage {name!r} failed") from exc
                errors[name] = exc
            self.metrics.append(
                {"stage": name, "status": status,
                 "wall_s": round(time.monotonic() - t0, 3)}
            )
        return errors


# Canonical stage set of the fixture sync, in default run order — the analog
# of the reference's TOP_LEVEL_MODULES registry (sync.py:500-540).
TOP_LEVEL_STAGES: tuple[str, ...] = ("region", "nation", "supplier", "customer", "orders")


def parse_and_validate_selected_stages(selected_stages: str) -> list[str]:
    """Parse a comma-separated stage selection, validating each name against
    TOP_LEVEL_STAGES (reference sync.py:542-586
    parse_and_validate_selected_modules): whitespace-tolerant, order- and
    dedup-preserving, with an error message that lists every valid value."""
    validated: list[str] = []
    for stage in selected_stages.split(","):
        stage = stage.strip()
        if stage in TOP_LEVEL_STAGES:
            if stage not in validated:
                validated.append(stage)
        else:
            valid = ", ".join(TOP_LEVEL_STAGES)
            raise ValueError(
                f'Error parsing `selected_stages`. You specified "{selected_stages}". '
                f"Please check that your string is formatted properly. "
                f'Example valid input looks like "region,nation" or "supplier, orders". '
                f"Our full list of valid values is: {valid}."
            )
    return validated


def build_staged_sync(stages: dict[str, Any], selected_stages: str | None = None) -> "Sync":
    """Build a Sync over ``stages`` (name -> StageFunc), optionally limited
    to a validated selection in the order the user listed it (reference
    sync.py:588-640 build_sync)."""
    sync = Sync()
    names = (
        parse_and_validate_selected_stages(selected_stages)
        if selected_stages
        else [n for n in TOP_LEVEL_STAGES if n in stages] or list(stages)
    )
    for name in names:
        if name not in stages:
            raise ValueError(f"unknown stage {name!r}; available: {', '.join(stages)}")
        sync.add_stage(name, stages[name])
    return sync
