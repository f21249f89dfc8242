"""Golden way-for-way end-to-end parity of the pandas kernel.

Runs the full pipeline on the reference's 138-way corpus and diffs every
golden column of every golden row (164 rows after offset explosion and
deletes).  The golden file is the behavioral contract (SURVEY.md §5).
"""

import json

import numpy as np
import pandas as pd
import pytest

from cqi_engine.io import read_geojson_lines
from cqi_engine.kernel.pipeline import final_projection, score_ways

INPUT = "/root/reference/data/test_ways/test_ways.geojson"
GOLDEN = "/root/reference/data/test_ways/test_ways_alex.geojson"


@pytest.fixture(scope="module")
def scored() -> pd.DataFrame:
    return final_projection(score_ways(read_geojson_lines(INPUT)))


@pytest.fixture(scope="module")
def golden() -> pd.DataFrame:
    with open(GOLDEN, encoding="utf-8") as fh:
        feats = json.load(fh)["features"]
    return pd.DataFrame([f["properties"] for f in feats])


def _keyed(df: pd.DataFrame) -> pd.DataFrame:
    key = df["side"].astype(object).where(pd.notna(df["side"]), "")
    return df.set_index([df["id"], key]).sort_index()


def test_row_multiplicity(scored, golden):
    assert len(scored) == 164
    sk = set(zip(scored["id"], scored["side"].where(pd.notna(scored["side"]), "")))
    gk = set(zip(golden["id"], golden["side"].where(pd.notna(golden["side"]), "")))
    assert sk == gk


def test_deleted_ways(scored):
    deleted = {"fw04_no", "fw05_usesidepath", "unusual_values01",
               "informal_path01", "trunk01_bicycle_no",
               "path03_bicycle_dismount", "idx07_bicycle_road_private"}
    assert deleted.isdisjoint(set(scored["id"]))


def _values_equal(gv, sv) -> bool:
    gnull = gv is None or (isinstance(gv, float) and np.isnan(gv))
    snull = sv is None or (isinstance(sv, float) and np.isnan(sv))
    if gnull or snull:
        return gnull and snull
    if isinstance(gv, (int, float)) or isinstance(sv, (int, float)):
        try:
            return abs(float(gv) - float(sv)) < 1e-9
        except (TypeError, ValueError):
            pass
    return str(gv) == str(sv)


def test_every_golden_cell(scored, golden):
    sm = _keyed(scored)
    gm = _keyed(golden)
    mismatches = []
    for key in gm.index:
        srow = sm.loc[key]
        grow = gm.loc[key]
        if isinstance(srow, pd.DataFrame):
            srow = srow.iloc[0]
        if isinstance(grow, pd.DataFrame):
            grow = grow.iloc[0]
        for col in gm.columns:
            if col in ("id", "side"):
                continue
            if not _values_equal(grow[col], srow.get(col)):
                mismatches.append((key, col, grow[col], srow.get(col)))
    assert not mismatches, f"{len(mismatches)} cell mismatches: {mismatches[:10]}"


def test_anchor_values(scored):
    """FIXTURES.md §4 numeric anchors."""
    fw01 = scored[(scored["id"] == "fw01_yes")].iloc[0]
    assert fw01["way_type"] == "shared footway"
    assert fw01["base_index"] == 50
    assert fw01["proc_width"] == 3.2
    assert fw01["fac_width"] == 0.846
    assert fw01["index"] == 46
    assert fw01["stress_level"] == 1
    assert fw01["data_missing"] == "width;surface;smoothness;lit"
    assert fw01["data_incompleteness"] == 80.0
    cl01 = scored[scored["id"] == "cl01_centerline"]
    assert len(cl01) == 3
    assert set(cl01["index"]) == {16, 49, 39}
