"""Self-enforcing registry rotation (round-6 verdict item 1).

The driver's CORRECTNESS gate walks ``queries()`` in insertion order under a
~50-query budget, so cumulative driver coverage depends on every query that
has NO ``CORRECTNESS_r*.json`` row sorting BEFORE every query that has one.
Round 6 lost its entire driver budget re-verifying the round-5 window because
the rotation procedure was a comment, not a test. This test makes the
procedure mechanical: it fails the suite the moment an unverified query sits
behind a verified one — including any query added mid-round and appended in
the wrong place.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_verified() -> set[str]:
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            doc = json.load(f)
        queries = doc.get("queries", doc)
        if isinstance(queries, dict):
            names |= set(queries.keys())
        else:
            names |= {q["name"] for q in queries}
    return names


def test_unverified_queries_sort_before_verified():
    from cartography_spark.plans.registry import PRIORITY

    verified = _driver_verified()
    assert verified, "no CORRECTNESS_r*.json artifacts found at repo root"
    first_verified_pos = None
    for pos, name in enumerate(PRIORITY):
        if name in verified:
            if first_verified_pos is None:
                first_verified_pos = pos
        elif first_verified_pos is not None:
            raise AssertionError(
                f"rotation violated: driver-unverified query {name!r} at "
                f"PRIORITY position {pos} sorts after driver-verified "
                f"{PRIORITY[first_verified_pos]!r} at position "
                f"{first_verified_pos}; move every query with no "
                f"CORRECTNESS_r*.json row to the front of PRIORITY"
            )


def test_priority_matches_registry_exactly():
    from cartography_spark.plans.registry import PRIORITY, all_queries

    names = set(all_queries())
    assert len(PRIORITY) == len(set(PRIORITY)), "duplicate names in PRIORITY"
    assert set(PRIORITY) == names, (
        f"PRIORITY out of sync with REGISTRY: "
        f"missing={sorted(names - set(PRIORITY))[:5]} "
        f"extra={sorted(set(PRIORITY) - names)[:5]}"
    )
