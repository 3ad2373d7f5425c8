"""Stage-selection parity with the reference's --selected-modules
(sync.py:542-640 parse_and_validate_selected_modules / build_sync)."""

import pytest

from cartography_spark.sync import (
    TOP_LEVEL_STAGES,
    build_staged_sync,
    parse_and_validate_selected_stages,
)


def test_parse_valid_selection_keeps_order_and_dedups():
    assert parse_and_validate_selected_stages("nation,region") == ["nation", "region"]
    assert parse_and_validate_selected_stages(" supplier , orders ,supplier") == [
        "supplier", "orders",
    ]


def test_parse_invalid_selection_lists_valid_values():
    with pytest.raises(ValueError) as exc:
        parse_and_validate_selected_stages("region,aws")
    msg = str(exc.value)
    assert "aws" in msg or "region,aws" in msg
    for name in TOP_LEVEL_STAGES:
        assert name in msg


def test_build_staged_sync_selection_and_default():
    ran = []
    stages = {n: (lambda n: lambda cat, cfg: ran.append(n))(n) for n in TOP_LEVEL_STAGES}
    sync = build_staged_sync(stages, "orders,region")
    assert list(sync.stages) == ["orders", "region"]
    full = build_staged_sync(stages)
    assert list(full.stages) == list(TOP_LEVEL_STAGES)
    with pytest.raises(ValueError):
        build_staged_sync({"region": stages["region"]}, "nation")
