"""Plan-quality gate: no forced broadcast hints on SF-scaling base tables.

An explicit ``F.broadcast`` on part/supplier/customer/orders/lineitem (or a
frame derived from them without a cardinality-bounding global aggregate) is
correct at sf0.1 but *forces* a broadcast of a table that no longer fits at
100x the data, turning a working query into an executor OOM. AQE's runtime
broadcast conversion (enabled in session.py) makes the same plan choice when
the side is genuinely small — the hint only removes the safety valve.

``tools/broadcast_hint_scan.py`` holds the AST analysis and the justified
allowlist (domain-bounded frames: calendar-dated maxima, 5-value priority
groups, file-metadata frames).
"""

from pathlib import Path

from tools.broadcast_hint_scan import scan


def test_no_broadcast_hints_on_scaling_tables():
    root = Path(__file__).resolve().parent.parent / "cartography_spark" / "plans"
    hits = scan(sorted(root.glob("*.py")))
    assert not hits, "forced broadcast hints on SF-scaling tables:\n" + "\n".join(hits)
