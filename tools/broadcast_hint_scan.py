"""Scan plans modules for F.broadcast hints on SF-scaling base tables.

A forced broadcast hint on a table that grows with scale factor (part,
supplier, customer, orders, lineitem) is a 100 TB liability: AQE's runtime
broadcast conversion makes the same choice when the side is genuinely small,
so the hint only removes the safety valve and turns a working query into an
executor OOM at 100x the data. Dimension tables with bounded cardinality
(nation, region) and 1-row global aggregates remain legitimate hint targets.

Heuristic, per function body, in assignment order:
- track for each local name the set of scaling base tables its defining
  expression transitively reads (via ``T(spark, sf_dir, "<tbl>")`` and via
  other locals), and whether the expression is cardinality-bounded
  (a global ``.agg(`` with no ``.groupBy(``/``groupBy(`` upstream of it in
  the same expression, or a ``.limit(``).
- flag every ``F.broadcast(arg)`` whose arg reads a scaling table and is not
  bounded.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

SCALING_TABLES = {"part", "supplier", "customer", "orders", "lineitem"}

# Graph-catalog node labels backed by scaling tables (``c.node("Supplier")``).
SCALING_NODES = {"Supplier": "supplier", "Customer": "customer", "Order": "orders",
                 "LineItem": "lineitem", "Part": "part"}

# (filename, function, FULL broadcast-arg source) -> justification for a
# hint the heuristic flags but whose cardinality is domain-bounded, not
# SF-bounded. Keyed on the complete argument source text (not its first
# identifier) so a different frame that merely shares a variable-name prefix
# cannot silently inherit an allowlist entry. Every entry must say WHY the
# frame stays broadcastable at 100 TB.
ALLOWLIST: dict[tuple[str, str, str], str] = {
    ("inventory_analytics.py", "q_pareto_skyline", "run"):
        "per-date running maxima: rows = distinct calendar dates (~2.5k over "
        "the 7-year TPC-H window), bounded by time not data volume",
    ("inventory_analytics.py", "q_conformal_interval", "mu"):
        "per-group means grouped by o_orderpriority (5 distinct values)",
    ("inventory_analytics.py", "q_conformal_interval", "calib"):
        "conformal calibration produces a single (n_cal, k, q_hat) row",
    ("inventory_analytics.py", "q_conformal_mondrian_coverage", "mu"):
        "per-group means grouped by o_orderpriority (5 distinct values)",
    ("inventory_analytics.py", "q_conformal_mondrian_coverage",
     'calib.withColumnRenamed("group_key", "g")'):
        "Mondrian calibration: one (n_cal, k, q_hat) row PER GROUP, "
        "bounded by the 5-value priority domain",
    ("inventory_catalog.py", "q_layout_overlap_depth", "b"):
        "file-metadata frame: rows = number of files (min/max per file_id), "
        "metadata-scale (100 TB / 1 GB files = 1e5 rows), not row-scale",
}


def _expr_src(node: ast.AST, src: str) -> str:
    return ast.get_source_segment(src, node) or ""


class _FnScanner(ast.NodeVisitor):
    def __init__(self, src: str, fname: str):
        self.src = src
        self.fname = fname
        self.violations: list[tuple[int, str, str]] = []

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        env_tables: dict[str, frozenset[str]] = {}
        env_bounded: dict[str, bool] = {}
        env_grouped: dict[str, bool] = {}

        def tables_of(expr: ast.AST) -> frozenset[str]:
            out: set[str] = set()
            for sub in ast.walk(expr):
                if (
                    isinstance(sub, ast.Call)
                    and isinstance(sub.func, ast.Name)
                    and sub.func.id == "T"
                    and sub.args
                ):
                    last = sub.args[-1]
                    if isinstance(last, ast.Constant) and last.value in SCALING_TABLES:
                        out.add(last.value)
                if (
                    isinstance(sub, ast.Call)
                    and isinstance(sub.func, ast.Attribute)
                    and sub.func.attr == "node"
                    and sub.args
                ):
                    first = sub.args[0]
                    if isinstance(first, ast.Constant) and first.value in SCALING_NODES:
                        out.add(SCALING_NODES[first.value])
                if isinstance(sub, ast.Name) and sub.id in env_tables:
                    out |= env_tables[sub.id]
            return frozenset(out)

        def bounded(expr: ast.AST) -> bool:
            # AST-resolved (not raw-source substrings, which misfire on
            # '.agg(' inside strings or a groupBy spelled via an
            # intermediate variable): a chain bounds cardinality iff it
            # contains .limit(...), or a GLOBAL .agg(...) — one whose
            # IMMEDIATE receiver is a plain DataFrame, not GroupedData.
            # The receiver is GroupedData only when it is itself a
            # .groupBy(...) call, or a variable whose defining expression
            # ends in .groupBy(...). A groupBy buried deeper in the
            # lineage (df.groupBy(k).agg(...) assigned, then .agg() on
            # that result) does NOT make the later agg grouped.
            def receiver_is_grouped_data(recv: ast.AST) -> bool:
                if isinstance(recv, ast.Call) and isinstance(recv.func, ast.Attribute):
                    return recv.func.attr in ("groupBy", "groupby", "rollup", "cube")
                if isinstance(recv, ast.Name):
                    return env_grouped.get(recv.id, False)
                return False

            for sub in ast.walk(expr):
                if isinstance(sub, ast.Call) and isinstance(sub.func, ast.Attribute):
                    if sub.func.attr == "limit":
                        return True
                    if sub.func.attr == "agg" and not receiver_is_grouped_data(sub.func.value):
                        return True
                if isinstance(sub, ast.Name) and env_bounded.get(sub.id):
                    return True
            return False

        def grouped(expr: ast.AST) -> bool:
            # True iff the expression's value IS a GroupedData: its
            # top-level node is a .groupBy(...) call or an alias of one.
            if isinstance(expr, ast.Call) and isinstance(expr.func, ast.Attribute):
                return expr.func.attr in ("groupBy", "groupby", "rollup", "cube")
            if isinstance(expr, ast.Name):
                return env_grouped.get(expr.id, False)
            return False

        for stmt in ast.walk(node):
            if isinstance(stmt, ast.Assign) and len(stmt.targets) == 1 and isinstance(
                stmt.targets[0], ast.Name
            ):
                name = stmt.targets[0].id
                env_tables[name] = tables_of(stmt.value)
                env_bounded[name] = bounded(stmt.value)
                env_grouped[name] = grouped(stmt.value)

        for sub in ast.walk(node):
            if (
                isinstance(sub, ast.Call)
                and isinstance(sub.func, ast.Attribute)
                and sub.func.attr == "broadcast"
                and isinstance(sub.func.value, ast.Name)
                and sub.func.value.id == "F"
                and sub.args
            ):
                arg = sub.args[0]
                tbls = tables_of(arg)
                arg_src = _expr_src(arg, self.src)
                if (self.fname, node.name, arg_src) in ALLOWLIST:
                    continue
                if tbls and not bounded(arg):
                    self.violations.append(
                        (sub.lineno, node.name, f"{sorted(tbls)}: {_expr_src(arg, self.src)[:80]}")
                    )
        # don't recurse into nested defs separately; ast.walk above covered them


def scan(paths: list[Path]) -> list[str]:
    out = []
    for p in paths:
        src = p.read_text()
        tree = ast.parse(src)
        sc = _FnScanner(src, p.name)
        for n in tree.body:
            if isinstance(n, ast.FunctionDef):
                sc.visit_FunctionDef(n)
        for lineno, fn, detail in sc.violations:
            out.append(f"{p.name}:{lineno} in {fn}: broadcast hint on scaling table {detail}")
    return out


if __name__ == "__main__":
    root = Path(__file__).resolve().parent.parent / "cartography_spark" / "plans"
    hits = scan(sorted(root.glob("*.py")))
    print("\n".join(hits))
    print(f"{len(hits)} violations")
    sys.exit(1 if hits else 0)
