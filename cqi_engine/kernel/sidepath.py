"""Stage 1 — sidepath detection (J1-J6, A1-A5 of SURVEY.md §2).

Samples check points every 100 m along each path, finds roads within 22 m of
each point (same OSM ``layer`` only), aggregates per-way adjacency counters,
and applies the 2/3-majority vote plus highway/maxspeed/name transfers
(ref:cycling_quality_index.py:1471-1579,168-251).

This module is the *kernel*: plain pandas + numpy, shared by the pytest
golden harness and by the Spark operator (which runs the candidate search per
cell partition and the aggregation as a real shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import config as C
from ..geometry import (point_to_polyline_dist, sample_points_along,
                        segment_bbox_cells)
from ..parse import falsy, get_number, truthy

# counter quirk: the reference seeds each first appearance with 2
# (``.get(key, 1) + 1``, ref:cycling_quality_index.py:1567-1572)
COUNT_SEED = 1

JOIN_CELL_SIZE = 64.0  # meters; >= 2*22m keeps the probe to a single cell


def is_path_highway(hw: pd.Series) -> pd.Series:
    return hw.isin(C.PATH_HIGHWAYS).fillna(False)


def is_road_highway(hw: pd.Series) -> pd.Series:
    # NULL highway counts as a road (QGIS `IS NOT` semantics,
    # ref:cycling_quality_index.py:1485)
    return ~hw.isin(C.ROAD_EXCLUDED_HIGHWAYS).fillna(False)


def sample_check_points(ways: pd.DataFrame,
                        coords_col: str = "geom_metric") -> pd.DataFrame:
    """One row per check point of every path way (J1+J2)."""
    rows = []
    for ix, row in ways.iterrows():
        pts = sample_points_along(np.asarray(row[coords_col]),
                                  C.SIDEPATH_SAMPLE_SPACING_M)
        for k, (x, y) in enumerate(pts):
            rows.append((row["id"], row.get("layer"), float(x), float(y), k))
    return pd.DataFrame(rows, columns=["way_id", "layer", "x", "y", "pt_seq"])


def find_candidates(points: pd.DataFrame, roads: pd.DataFrame,
                    coords_col: str = "geom_metric") -> pd.DataFrame:
    """dwithin(22m) candidate pairs via a grid-cell index (J3+J4+J5).

    Roads are registered in every ~64 m cell their 22 m-dilated envelope
    covers, so each point probes exactly one cell — the same equi-join
    shape the Spark operator uses at scale.
    """
    cell_index: dict[tuple[int, int], list[int]] = {}
    road_rows = list(roads.index)
    for rix in road_rows:
        coords = np.asarray(roads.at[rix, coords_col])
        for cell in segment_bbox_cells(coords, JOIN_CELL_SIZE,
                                       C.SIDEPATH_BUFFER_SIZE_M):
            cell_index.setdefault(cell, []).append(rix)

    out = []
    for pix, p in points.iterrows():
        cell = (int(np.floor(p["x"] / JOIN_CELL_SIZE)),
                int(np.floor(p["y"] / JOIN_CELL_SIZE)))
        for rix in cell_index.get(cell, ()):  # noqa: B020
            road = roads.loc[rix]
            if not _layer_match(p["layer"], road.get("layer")):
                continue
            d = point_to_polyline_dist(np.array([p["x"]]), np.array([p["y"]]),
                                       np.asarray(road[coords_col]))[0]
            if d <= C.SIDEPATH_BUFFER_SIZE_M:
                out.append((p["way_id"], p["pt_seq"], road["id"],
                            road.get("highway"), road.get("name"),
                            get_number(pd.Series([road.get("maxspeed")]))[0]))
    return pd.DataFrame(out, columns=["way_id", "pt_seq", "road_id",
                                      "road_highway", "road_name",
                                      "road_maxspeed"])


def _layer_match(a, b) -> bool:
    """same-`layer` guard (ref:cycling_quality_index.py:1550-1552)."""
    an = a is None or (isinstance(a, float) and np.isnan(a))
    bn = b is None or (isinstance(b, float) and np.isnan(b))
    if an and bn:
        return True
    if an or bn:
        return False
    return str(a) == str(b)


def aggregate_sidepath(points: pd.DataFrame,
                       candidates: pd.DataFrame) -> dict:
    """Per-way adjacency counters (A1).  Returns
    {way_id: {checks, id: {k: n}, highway: {..}, name: {..}, maxspeed: {..}}}
    with the reference's seed-2 counting."""
    agg: dict = {}
    for way_id, grp in points.groupby("way_id", sort=False):
        agg[way_id] = {"checks": len(grp), "id": {}, "highway": {},
                       "name": {}, "maxspeed": {}}
    if len(candidates) == 0:
        return agg
    for (way_id, _pt), grp in candidates.groupby(["way_id", "pt_seq"],
                                                 sort=False):
        entry = agg[way_id]
        # per-point de-dup mirrors the reference's distinct lists
        for rid in dict.fromkeys(grp["road_id"]):
            entry["id"][rid] = entry["id"].get(rid, COUNT_SEED) + 1
        for hw in dict.fromkeys(grp["road_highway"]):
            entry["highway"][hw] = entry["highway"].get(hw, COUNT_SEED) + 1
        for nm in dict.fromkeys(grp["road_name"]):
            entry["name"][nm] = entry["name"].get(nm, COUNT_SEED) + 1
        ms_per_hw: dict = {}
        for hw, ms in zip(grp["road_highway"], grp["road_maxspeed"]):
            cur = ms_per_hw.get(hw)
            if hw not in ms_per_hw or (pd.notna(ms)
                                       and (cur is None or pd.isna(cur)
                                            or cur < ms)):
                ms_per_hw[hw] = ms
        for hw, ms in ms_per_hw.items():
            cur = entry["maxspeed"].get(hw)
            if hw not in entry["maxspeed"] or (
                    pd.notna(ms) and (cur is None or pd.isna(cur) or cur < ms)):
                entry["maxspeed"][hw] = ms
    return agg


def _majority(entry: dict, key: str) -> bool:
    """2/3 vote (ref:cycling_quality_index.py:168-172)."""
    return sum(entry.get(key, {}).values()) >= (2 / 3) * entry["checks"]


def _argmax_highway(counts: dict) -> object:
    """Highest-ranked highway class among max-count keys
    (ref:cycling_quality_index.py:193-207)."""
    if not counts:
        return None
    mx = max(counts.values())
    ranking = C.HIGHWAY_CLASS_RANKING
    min_index = len(ranking) - 1  # index of the trailing None
    for key in counts:
        if counts[key] != mx:
            continue
        k = None if (key is None or (isinstance(key, float) and np.isnan(key))) else key
        if k in ranking and ranking.index(k) < min_index:
            min_index = ranking.index(k)
    return ranking[min_index]


def determine_maxspeed_value(maxspeed, highway):
    """walk->10, none->299, living_street default 10
    (ref:cycling_quality_index.py:157-165)."""
    ms_falsy = maxspeed is None or maxspeed == "" or (
        isinstance(maxspeed, float) and np.isnan(maxspeed))
    if maxspeed == "walk" or (ms_falsy and highway == "living_street"):
        return 10.0
    if maxspeed == "none":
        return 299.0
    if ms_falsy:
        return np.nan
    try:
        return float(maxspeed)
    except (TypeError, ValueError):
        return np.nan


def apply_sidepath(ways: pd.DataFrame, agg: dict) -> pd.DataFrame:
    """Write proc_sidepath / proc_highway / proc_maxspeed / name (A2-A5,
    ref:cycling_quality_index.py:175-251)."""
    ways = ways.copy()
    path_like = ways["highway"].isin(C.PATH_HIGHWAYS).fillna(False)

    # non-path rows: direct transfer
    non_path = ~path_like
    ways.loc[non_path, "proc_highway"] = ways.loc[non_path, "highway"]
    ways.loc[non_path, "proc_maxspeed"] = [
        determine_maxspeed_value(ms, hw)
        for ms, hw in zip(ways.loc[non_path, "maxspeed"],
                          ways.loc[non_path, "highway"])
    ]

    for ix in ways.index[path_like]:
        wid = ways.at[ix, "id"]
        if wid not in agg:
            continue
        entry = agg[wid]
        is_sp = ways.at[ix, "is_sidepath"]
        if ways.at[ix, "footway"] == "sidewalk":
            is_sp = "yes"
        if falsy(pd.Series([is_sp]))[0]:
            is_sp = "no"
            for key in ("id", "highway", "name"):
                if _majority(entry, key):
                    is_sp = "yes"
                    break
        ways.at[ix, "proc_sidepath"] = is_sp
        if is_sp != "yes":
            continue
        is_sp_of = ways.at[ix, "is_sidepath:of"]
        if falsy(pd.Series([is_sp_of]))[0] and len(entry["highway"]):
            is_sp_of = _argmax_highway(entry["highway"])
        ways.at[ix, "proc_highway"] = is_sp_of
        key = is_sp_of
        if key in entry["maxspeed"]:
            ms = entry["maxspeed"][key]
            if ms is not None and pd.notna(ms) and ms != 0:
                ways.at[ix, "proc_maxspeed"] = float(ms)
        if len(entry["name"]):
            name = max(entry["name"], key=lambda k: entry["name"][k])
            if name is not None and not (isinstance(name, float)
                                         and np.isnan(name)) and name != "":
                ways.at[ix, "name"] = name
    return ways


def run_sidepath_stage(ways: pd.DataFrame,
                       coords_col: str = "geom_metric") -> pd.DataFrame:
    paths = ways[is_path_highway(ways["highway"])]
    roads = ways[is_road_highway(ways["highway"])]
    points = sample_check_points(paths, coords_col)
    cands = find_candidates(points, roads, coords_col)
    agg = aggregate_sidepath(points, cands)
    return apply_sidepath(ways, agg)
