"""Vectorized per-way rule evaluation (R1-R18 of SURVEY.md §2.8).

Pure pandas/numpy — no Spark imports — so the same kernel runs:
  * standalone under pytest against the reference's golden corpus, and
  * inside Spark via ``mapInPandas`` Arrow batches (engine hot path).

Semantics follow the reference pipeline (ref:cycling_quality_index.py) with
the golden output file as the arbiter where the snapshot's dead code diverges
(see SURVEY.md §2.9).  All rules are row-local; nothing here shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import config as C
from ..parse import (
    falsy, truthy, get_number, first_nonfalsy, split_both_to_sides,
    weakest_surface, get_access, last_lane_value, series_round,
)

# upstream allowed-bicycle values: the golden corpus deletes
# bicycle=use_sidepath ways (fw05) — unlike ref:cycling_quality_index.py:36
ALLOWED_BICYCLE = ["yes", "permissive", "designated", "optional_sidepath",
                   "discouraged"]

CYCLE_FAMILY = [
    "cycle path", "cycle track", "shared path", "shared footway", "crossing",
    "link", "cycle lane (advisory)", "cycle lane (exclusive)",
    "cycle lane (protected)", "cycle lane (central)",
]
SHARED_FAMILY = ["shared road", "shared traffic lane", "shared bus lane",
                 "bicycle road", "track or service"]


def _s(df: pd.DataFrame, col: str) -> pd.Series:
    if col in df.columns:
        return df[col]
    return pd.Series(None, index=df.index, dtype=object)


def _none(df: pd.DataFrame) -> pd.Series:
    return pd.Series(None, index=df.index, dtype=object)


def ensure_attributes(df: pd.DataFrame) -> pd.DataFrame:
    """Schema alignment: add every declared column as NULL
    (ref:cycling_quality_index.py:143-154)."""
    missing = {}
    for c in C.TAG_WHITELIST:
        if c not in df.columns:
            missing[c] = None
    for c in C.DERIVED_COLUMNS:
        if c not in df.columns:
            missing[c] = None
    if missing:
        df = pd.concat(
            [df, pd.DataFrame(missing, index=df.index, dtype=object)], axis=1)
    return df


# --------------------------------------------------------------------------
# deletes (P6/P7)
# --------------------------------------------------------------------------

def delete_mask(df: pd.DataFrame) -> pd.Series:
    """Rows removed before scoring (ref:cycling_quality_index.py:367-374)."""
    bike_access = get_access(df, "bicycle")
    no_access = truthy(bike_access) & ~bike_access.isin(ALLOWED_BICYCLE)
    informal = (
        (_s(df, "highway") == "path")
        & (_s(df, "informal") == "yes")
        & _s(df, "bicycle").isna()
    )
    return (no_access | informal).fillna(False)


# --------------------------------------------------------------------------
# deriveSeparation (ref:definitions.py:26-49)
# --------------------------------------------------------------------------

def derive_separation_mode(df: pd.DataFrame, mode: str) -> pd.Series:
    sep_l = _s(df, "separation:left")
    sep_r = _s(df, "separation:right")
    tm_l = _s(df, "traffic_mode:left")
    tm_r = _s(df, "traffic_mode:right")
    out = _none(df)
    if mode == "foot":
        m1 = tm_l == "foot"
        out[m1] = sep_l[m1]
        m2 = falsy(tm_r) | (tm_r == "foot")
        out[m2] = sep_r[m2]
    elif mode == "motor_vehicle":
        m1 = tm_r.isin(["motor_vehicle", "parking", "psv"])
        out[m1] = sep_r[m1]
        m2 = falsy(tm_l) | tm_l.isin(["motor_vehicle", "parking", "psv"])
        out[m2] = sep_l[m2]
    return out


# --------------------------------------------------------------------------
# R1: way-type classifier (ref:cycling_quality_index.py:377-464)
# --------------------------------------------------------------------------

def classify_way_type(df: pd.DataFrame) -> pd.Series:
    hw = _s(df, "highway")
    side = _s(df, "side")
    has_side = truthy(side)
    bicycle = _s(df, "bicycle")
    foot = _s(df, "foot")
    segregated = _s(df, "segregated")
    is_sidepath = _s(df, "is_sidepath")
    proc_sidepath = _s(df, "proc_sidepath")
    lane_markings = _s(df, "lane_markings")
    typ = _s(df, "type")

    def any_eq(cols: list[str], value) -> pd.Series:
        m = pd.Series(False, index=df.index)
        for c in cols:
            m = m | (_s(df, c) == value)
        return m.fillna(False)

    def any_in(cols: list[str], values: list[str]) -> pd.Series:
        m = pd.Series(False, index=df.index)
        for c in cols:
            m = m | _s(df, c).isin(values)
        return m.fillna(False)

    cw4 = ["cycleway", "cycleway:both", "cycleway:left", "cycleway:right"]
    cw4_lane = [f"{c}:lane" for c in cw4]
    cw4_foot = [f"{c}:foot" for c in cw4]
    cw4_seg = [f"{c}:segregated" for c in cw4]
    sw4_bic = ["sidewalk:bicycle", "sidewalk:both:bicycle",
               "sidewalk:left:bicycle", "sidewalk:right:bicycle"]

    sep_foot = derive_separation_mode(df, "foot")
    sep_mv = derive_separation_mode(df, "motor_vehicle")
    sep_mv_str = sep_mv.fillna("").astype(str)
    sep_mv_present = truthy(sep_mv) & ~sep_mv.isin(["no", "none"])
    sep_mv_kerbish = sep_mv_present & (
        sep_mv_str.str.contains("kerb") | sep_mv_str.str.contains("tree_row"))

    lanes_central = _s(df, "cycleway:lanes").fillna("").astype(str).str.contains(
        r"no\|lane\|no", regex=True)

    # ordered first-match-wins conditions
    conds: list[tuple[pd.Series, object]] = []

    conds.append(((_s(df, "bicycle_road") == "yes") & ~has_side,
                  "bicycle road"))
    conds.append((any_eq(C.LINK_TAGS, "link"), "link"))
    conds.append((any_eq(C.CROSSING_TAGS, "crossing"), "crossing"))
    # footway family: golden keeps every surviving row as shared footway
    # (deletes are access-based only; the snapshot's in-classifier delete at
    # ref:cycling_quality_index.py:396-400 is not what produced the golden)
    conds.append((hw.isin(C.SHARED_FOOTWAY_HIGHWAYS), "shared footway"))

    is_path = hw == "path"
    conds.append((is_path & (foot == "designated") & (bicycle != "designated"),
                  "shared footway"))
    conds.append((is_path & (segregated == "yes"), "segregated path"))
    conds.append((is_path, "shared path"))

    is_cw = hw == "cycleway"
    conds.append((is_cw & foot.isin(["yes", "designated", "permissive"]),
                  "shared path"))
    conds.append((is_cw & (sep_foot == "no"), "segregated path"))
    tag_unset = ~is_sidepath.isin(["yes", "no"])
    conds.append((is_cw & tag_unset & (proc_sidepath == "yes"), "cycle track"))
    conds.append((is_cw & tag_unset, "cycle path"))
    conds.append((is_cw & (is_sidepath == "yes") & sep_mv_kerbish,
                  "cycle track"))
    conds.append((is_cw & (is_sidepath == "yes") & sep_mv_present,
                  "cycle lane (protected)"))
    conds.append((is_cw & (is_sidepath == "yes"), "cycle track"))
    conds.append((is_cw, "cycle path"))

    conds.append((hw.isin(["service", "track"]), "track or service"))

    big_road = hw.isin(["motorway", "trunk", "primary", "secondary"])
    lm_yes = lane_markings == "yes"
    conds.append((~has_side & (lm_yes | big_road), "shared traffic lane"))
    conds.append((~has_side, "shared road"))

    conds.append((typ == "sidewalk", "shared footway"))

    has_lane = any_eq(cw4, "lane")
    conds.append((has_lane & lanes_central, "cycle lane (central)"))
    conds.append((has_lane & sep_mv_present, "cycle lane (protected)"))
    conds.append((has_lane & any_eq(cw4_lane, "exclusive"),
                  "cycle lane (exclusive)"))
    conds.append((has_lane, "cycle lane (advisory)"))

    has_track = any_eq(cw4, "track")
    conds.append((has_track & any_in(cw4_foot, ["yes", "designated",
                                                "permissive"]), "shared path"))
    conds.append((has_track & any_eq(cw4_seg, "yes"), "segregated path"))
    conds.append((has_track & any_eq(cw4_seg, "no"), "shared path"))
    conds.append((has_track & (sep_foot == "no"), "segregated path"))
    conds.append((has_track & sep_mv_kerbish, "cycle track"))
    conds.append((has_track & sep_mv_present, "cycle lane (protected)"))
    conds.append((has_track, "cycle track"))

    conds.append((any_eq(cw4, "share_busway"), "shared bus lane"))
    conds.append((any_eq(sw4_bic, "yes"), "shared footway"))

    big_road2 = hw.isin(["primary", "secondary"])
    conds.append(((lm_yes | big_road2), "shared traffic lane"))

    out = np.select([m.to_numpy(dtype=bool) for m, _ in conds],
                    [v for _, v in conds], default="shared road")
    return pd.Series(out, index=df.index, dtype=object)


# --------------------------------------------------------------------------
# R2: oneway (ref:cycling_quality_index.py:479-525)
# --------------------------------------------------------------------------

def derive_oneway(df: pd.DataFrame, way_type: pd.Series) -> pd.Series:
    oneway = _s(df, "oneway")
    ob = _s(df, "oneway:bicycle")
    cw_ow = _s(df, "cycleway:oneway")
    side = _s(df, "side")
    out = _none(df)

    in_cycle = way_type.isin(C.CYCLEWAY_WAY_TYPES)
    # determine_cycleway_oneway, first-match-wins
    v = np.select(
        [
            (in_cycle & oneway.isin(C.ONEWAY_VALUES)).to_numpy(dtype=bool),
            (in_cycle & cw_ow.isin(C.ONEWAY_VALUES)).to_numpy(dtype=bool),
            (in_cycle & way_type.isin(["cycle track", "shared path",
                                       "shared footway"])
             & truthy(side)).to_numpy(dtype=bool),
            (in_cycle & way_type.str.contains("cycle lane",
                                              regex=False).fillna(False)
             ).to_numpy(dtype=bool),
            (in_cycle & ob.isin(C.ONEWAY_VALUES)).to_numpy(dtype=bool),
            in_cycle.to_numpy(dtype=bool),
        ],
        [oneway, cw_ow,
         np.full(len(df), C.DEFAULT_ONEWAY_CYCLE_TRACK, dtype=object),
         np.full(len(df), C.DEFAULT_ONEWAY_CYCLE_LANE, dtype=object),
         ob, np.full(len(df), "no", dtype=object)],
        default=None,
    )
    out[in_cycle] = pd.Series(v, index=df.index)[in_cycle]

    out[way_type == "shared bus lane"] = "yes"

    shared = way_type.isin(C.SHARED_WAY_TYPES)
    ow_valid = oneway.isin(C.ONEWAY_VALUES)
    same = falsy(ob) | (oneway == ob)
    v2 = np.select(
        [
            (shared & same & ow_valid).to_numpy(dtype=bool),
            (shared & same).to_numpy(dtype=bool),
            (shared & (ob == "no") & ow_valid).to_numpy(dtype=bool),
            (shared & (ob == "no")).to_numpy(dtype=bool),
            shared.to_numpy(dtype=bool),
        ],
        [oneway, np.full(len(df), "no", dtype=object),
         oneway.fillna("").astype(str) + "_motor_vehicles",
         np.full(len(df), "no", dtype=object),
         np.full(len(df), "yes", dtype=object)],
        default=None,
    )
    out[shared] = pd.Series(v2, index=df.index)[shared]

    out[falsy(out)] = "unknown"
    return out


def _oneway_yes(proc_oneway: pd.Series) -> pd.Series:
    """substring test `'yes' in proc_oneway` (matches 'yes_motor_vehicles')."""
    return proc_oneway.fillna("").astype(str).str.contains("yes", regex=False)


# --------------------------------------------------------------------------
# R3: width (ref:cycling_quality_index.py:569-897)
# --------------------------------------------------------------------------

def _parking_width_default(side_val, orientation, width):
    out = width.astype(float).copy() if width.dtype != object else get_number(width)
    need = side_val.isin(["lane", "half_on_kerb"]) & falsy(width)
    out[need & (orientation == "diagonal")] = C.WIDTH_PARKING_DIAGONAL
    out[need & (orientation == "perpendicular")] = C.WIDTH_PARKING_PERPENDICULAR
    out[need & ~orientation.isin(["diagonal", "perpendicular"])] = (
        C.WIDTH_PARKING_PARALLEL)
    half = side_val == "half_on_kerb"
    out[half] = out[half] / 2.0
    return out.fillna(0.0)


def calc_width(df: pd.DataFrame, way_type: pd.Series,
               proc_oneway: pd.Series):
    """Returns (proc_width: float Series, miss: dict[str, bool Series])."""
    n = len(df)
    proc = pd.Series(np.nan, index=df.index, dtype=float)
    miss_width = pd.Series(False, index=df.index)
    miss_width2 = pd.Series(False, index=df.index)  # segregated-path double append
    miss_lanes = pd.Series(False, index=df.index)
    miss_parking = pd.Series(False, index=df.index)

    ow_yes = _oneway_yes(proc_oneway)
    ow_no = proc_oneway == "no"
    w_cw = get_number(_s(df, "cycleway:width"))
    w_tag = get_number(_s(df, "width"))

    # family A: dedicated cycling infrastructure
    fam_a = way_type.isin(CYCLE_FAMILY)
    pre = w_cw.where(truthy(w_cw), w_tag)
    have_pre = truthy(pre)
    proc[fam_a & have_pre] = pre[fam_a & have_pre]
    defaults = pd.Series(C.DEFAULT_HIGHWAY_WIDTH["cycleway"], index=df.index)
    defaults[way_type.isin(["cycle path", "shared path",
                            "cycle lane (protected)"])] = (
        C.DEFAULT_HIGHWAY_WIDTH["path"])
    defaults[way_type == "shared footway"] = C.DEFAULT_HIGHWAY_WIDTH["footway"]
    defaults = defaults.where(~ow_no, defaults * 1.6)
    need_def = fam_a & ~have_pre
    proc[need_def] = defaults[need_def]
    miss_width |= need_def

    # family B: segregated path
    fam_b = way_type == "segregated path"
    is_path = _s(df, "highway") == "path"
    bp = fam_b & is_path
    proc[bp & truthy(w_cw)] = w_cw[bp & truthy(w_cw)]
    bp_rest = bp & ~truthy(w_cw)
    fw_w = get_number(_s(df, "footway:width"))
    w_foot = pd.Series(np.nan, index=df.index, dtype=float)
    have_w = truthy(w_tag)
    w_foot[have_w & truthy(fw_w)] = (w_tag - fw_w)[have_w & truthy(fw_w)]
    w_foot[have_w & ~truthy(fw_w)] = (w_tag / 2.0)[have_w & ~truthy(fw_w)]
    proc[bp_rest] = w_foot[bp_rest]
    miss_width |= bp_rest
    bo = fam_b & ~is_path
    proc[bo] = w_tag[bo]
    b_need_def = fam_b & falsy(pd.Series(proc, index=df.index))
    path_def = C.DEFAULT_HIGHWAY_WIDTH["path"]
    proc[b_need_def & ow_no] = path_def * 1.6
    proc[b_need_def & ~ow_no] = path_def
    miss_width2 |= b_need_def & bp_rest  # second append on the same row
    miss_width |= b_need_def & ~miss_width

    # family C: motor-traffic ways
    fam_c = way_type.isin(SHARED_FAMILY)
    stl = way_type == "shared traffic lane"
    sbl = way_type == "shared bus lane"
    wl = _s(df, "width:lanes")
    wlf = _s(df, "width:lanes:forward")
    wlb = _s(df, "width:lanes:backward")
    side = _s(df, "side")
    has_pipe = wl.fillna("").astype(str).str.contains("|", regex=False)
    has_pipe_f = wlf.fillna("").astype(str).str.contains("|", regex=False)
    has_pipe_b = wlb.fillna("").astype(str).str.contains("|", regex=False)
    lane_w = pd.Series(np.nan, index=df.index, dtype=float)
    c1 = (stl | sbl) & (ow_yes | ~sbl) & truthy(wl) & has_pipe
    lane_w[c1] = last_lane_value(wl.astype(object).astype("string"))[c1]
    c2 = sbl & ~ow_yes & (side == "right") & truthy(wlf) & has_pipe_f & ~c1
    lane_w[c2] = last_lane_value(wlf.astype(object).astype("string"))[c2]
    c3 = sbl & ~ow_yes & (side == "left") & truthy(wlb) & has_pipe_b & ~c1 & ~c2
    lane_w[c3] = last_lane_value(wlb.astype(object).astype("string"))[c3]
    c_else = (stl | sbl) & ~c1 & ~c2 & ~c3
    lane_w[c_else & sbl] = C.WIDTH_BUS_LANE
    lane_w[c_else & stl] = C.WIDTH_TRAFFIC_LANE
    miss_lanes |= c_else & stl
    proc[fam_c] = lane_w[fam_c]

    done = fam_c & truthy(proc)
    todo = fam_c & ~truthy(proc)
    w_eff = get_number(_s(df, "width:effective"))
    proc[todo & truthy(w_eff)] = w_eff[todo & truthy(w_eff)]
    done = fam_c & truthy(proc)
    todo = fam_c & ~truthy(proc)
    lanes = get_number(_s(df, "lanes"))
    lane_based = falsy(w_tag) & truthy(lanes)
    proc[todo & lane_based] = (lanes * C.WIDTH_TRAFFIC_LANE)[todo & lane_based]
    todo = fam_c & ~truthy(proc)

    # C5: carriageway arithmetic
    pl, pr = split_both_to_sides(_s(df, "parking:both"),
                                 _s(df, "parking:left"),
                                 _s(df, "parking:right"))
    plo, pro = split_both_to_sides(_s(df, "parking:both:orientation"),
                                   _s(df, "parking:left:orientation"),
                                   _s(df, "parking:right:orientation"))
    plw, prw = split_both_to_sides(_s(df, "parking:both:width"),
                                   _s(df, "parking:left:width"),
                                   _s(df, "parking:right:width"))
    plw_n = _parking_width_default(pl, plo, get_number(plw))
    prw_n = _parking_width_default(pr, pro, get_number(prw))

    carr = w_tag.copy()
    hw_def = _s(df, "highway").map(C.DEFAULT_HIGHWAY_WIDTH).fillna(
        C.DEFAULT_HIGHWAY_WIDTH_FALLBACK)
    carr_def = hw_def.where(~ow_yes, series_round(hw_def / 1.6, 1))
    need_carr_def = falsy(w_tag)
    carr[need_carr_def] = carr_def[need_carr_def]
    miss_width |= todo & need_carr_def

    # cycle lanes mapped on the centerline reduce the usable carriageway.
    # fan precedence: own side tag > bare `cycleway` > `cycleway:both`.
    # The bare tag fans to the left only on two-way roads (golden cl22: the
    # snapshot hardcodes oneway=False at ref:cycling_quality_index.py:870,
    # but the golden centerline width proves the oneway guard was live)
    twoway = falsy(proc_oneway) | (proc_oneway == "no")
    cw = _s(df, "cycleway")
    cw_b = _s(df, "cycleway:both")
    cw_l = first_nonfalsy(_s(df, "cycleway:left"),
                          cw.where(twoway, None), cw_b)
    cw_r = first_nonfalsy(_s(df, "cycleway:right"), cw, cw_b)
    cww = get_number(_s(df, "cycleway:width"))
    cww_b = get_number(_s(df, "cycleway:both:width"))
    either_lane = (cw_l == "lane") | (cw_r == "lane")
    cww_l = get_number(_s(df, "cycleway:left:width")).astype(object).copy()
    cww_r = get_number(_s(df, "cycleway:right:width")).astype(object).copy()
    # width fan only happens when a lane is present (ref:827-839); the bare
    # cycleway:width fans left only on two-way roads, cycleway:both:width
    # fans unconditionally (golden cl19)
    fan_l1 = either_lane & falsy(cww_l) & twoway & truthy(cww)
    cww_l[fan_l1] = cww[fan_l1]
    fan_l2 = either_lane & falsy(cww_l) & truthy(cww_b)
    cww_l[fan_l2] = cww_b[fan_l2]
    fan_r = either_lane & falsy(cww_r)
    cww_r[fan_r] = first_nonfalsy(cww, cww_b)[fan_r]
    cww_l = get_number(cww_l)
    cww_r = get_number(cww_r)
    cww_l[(cw_l == "lane") & falsy(cww_l)] = C.WIDTH_CYCLE_LANE
    cww_r[(cw_r == "lane") & falsy(cww_r)] = C.WIDTH_CYCLE_LANE
    cww_l = cww_l.fillna(0.0)
    cww_r = cww_r.fillna(0.0)

    def _buffer_chain(side_key: str, buf_side: str) -> pd.Series:
        chain = [
            f"cycleway:{side_key}:buffer:{buf_side}",
            f"cycleway:{side_key}:buffer:both",
            f"cycleway:{side_key}:buffer",
            "cycleway:both:buffer:" + buf_side,
            "cycleway:both:buffer:both",
            "cycleway:both:buffer",
            "cycleway:buffer:" + buf_side,
            "cycleway:buffer:both",
            "cycleway:buffer",
        ]
        return first_nonfalsy(*[_s(df, c) for c in chain])

    buf_total = pd.Series(0.0, index=df.index)
    for side_key, flag in (("right", cw_r == "lane"), ("left", cw_l == "lane")):
        for buf_side in ("left", "right"):
            b = get_number(_buffer_chain(side_key, buf_side)).fillna(0.0)
            buf_total += b.where(flag, 0.0)

    eff = carr - cww_r.fillna(0.0) - cww_l.fillna(0.0) - buf_total
    has_parking = truthy(pl) | truthy(pr)
    eff = eff.where(~(todo & has_parking), eff - prw_n - plw_n)
    cap = np.where(ow_yes, 4.0, 5.5)
    no_park_shared = todo & ~has_parking & (way_type == "shared road")
    eff[no_park_shared] = np.minimum(eff[no_park_shared], cap[no_park_shared])
    miss_parking |= todo & ~has_parking & (way_type == "shared road")

    floor_mask = todo & (eff < C.WIDTH_TRAFFIC_LANE) & (miss_width & todo)
    eff[floor_mask] = C.WIDTH_TRAFFIC_LANE
    proc[todo] = eff[todo]
    proc[fam_c & falsy(proc)] = np.nan

    return proc, {
        "width": miss_width, "width2": miss_width2,
        "width:lanes": miss_lanes, "parking": miss_parking,
    }


# --------------------------------------------------------------------------
# R4/R5: surface & smoothness (ref:cycling_quality_index.py:900-973)
# --------------------------------------------------------------------------

# upstream highway->default-surface values reverse-engineered from the golden
# corpus (footway/cycleway -> asphalt, path -> ground, fallback 'path')
_UPSTREAM_HIGHWAY_SURFACE = dict(C.DEFAULT_HIGHWAY_SURFACE)
_UPSTREAM_HIGHWAY_SURFACE.update(
    {"footway": "asphalt", "cycleway": "asphalt", "path": "ground"})
_UPSTREAM_SURFACE_FALLBACK = _UPSTREAM_HIGHWAY_SURFACE["path"]
_UPSTREAM_TRACK_SURFACE_DEFAULT = C.DEFAULT_TRACK_SURFACE["grade3"]
_UPSTREAM_CYCLEWAY_SURFACE_TRACKS = "asphalt"


def derive_surface(df: pd.DataFrame, way_type: pd.Series):
    sb = _s(df, "surface:bicycle")
    proc = _none(df)
    in_dict = sb.isin(list(C.SURFACE_FACTOR))
    proc[in_dict] = sb[in_dict]
    semi = truthy(sb) & ~in_dict & sb.fillna("").astype(str).str.contains(";")
    proc[semi] = weakest_surface(sb[semi])

    have = truthy(proc)  # surface:bicycle supplied the value
    miss = pd.Series(False, index=df.index)

    surface = _s(df, "surface")
    is_seg = way_type == "segregated path"
    seg_todo = ~have & is_seg
    cw_surface = _s(df, "cycleway:surface")
    proc[seg_todo] = cw_surface[seg_todo]
    seg_fall = seg_todo & falsy(proc)
    hw_default = _s(df, "highway").map(_UPSTREAM_HIGHWAY_SURFACE).fillna(
        _UPSTREAM_SURFACE_FALLBACK)
    proc[seg_fall & truthy(surface)] = surface[seg_fall & truthy(surface)]
    proc[seg_fall & ~truthy(surface)] = hw_default[seg_fall & ~truthy(surface)]
    # golden path01: no missing flag when the plain surface tag was used
    miss |= seg_fall & ~truthy(surface)

    other = ~have & ~is_seg
    proc[other] = surface[other]
    other_fall = other & falsy(proc)
    wt_default = hw_default.copy()
    wt_default[way_type.isin(["cycle lane (advisory)", "cycle lane (exclusive)",
                              "cycle lane (protected)",
                              "cycle lane (central)"])] = (
        C.DEFAULT_CYCLEWAY_SURFACE_LANES)
    wt_default[way_type == "cycle track"] = _UPSTREAM_CYCLEWAY_SURFACE_TRACKS
    tos = way_type == "track or service"
    tt_default = _s(df, "tracktype").map(C.DEFAULT_TRACK_SURFACE).fillna(
        _UPSTREAM_TRACK_SURFACE_DEFAULT)
    wt_default[tos] = tt_default[tos]
    proc[other_fall] = wt_default[other_fall]
    miss |= other_fall

    # weakest of ';' lists, then validity gate — but values accepted straight
    # from surface:bicycle skip the gate (ref:cycling_quality_index.py:925-926)
    gated = ~have
    semi2 = gated & proc.fillna("").astype(str).str.contains(";")
    proc[semi2] = weakest_surface(proc[semi2])
    bad = gated & ~proc.isin(list(C.SURFACE_FACTOR))
    proc[bad] = None
    # `have` = surface:bicycle path taken — the golden corpus also skips the
    # smoothness-missing flag for those rows (surf04/surf09)
    return proc, miss, have


def derive_smoothness(df: pd.DataFrame, way_type: pd.Series):
    sb = _s(df, "smoothness:bicycle")
    proc = _none(df)
    ok = sb.isin(list(C.SMOOTHNESS_FACTOR))
    proc[ok] = sb[ok]
    todo = falsy(proc)
    is_seg = way_type == "segregated path"
    fallback = first_nonfalsy(_s(df, "cycleway:smoothness"), _s(df, "smoothness"))
    fallback = fallback.where(is_seg, _s(df, "smoothness"))
    proc[todo] = fallback[todo]
    miss = todo & falsy(proc)
    proc[~proc.isin(list(C.SMOOTHNESS_FACTOR))] = None
    return proc, miss


# --------------------------------------------------------------------------
# R6/R7: traffic modes, separation, buffer
# (ref:cycling_quality_index.py:976-1090)
# --------------------------------------------------------------------------

def derive_traffic_modes(df: pd.DataFrame, way_type: pd.Series):
    tm_l, tm_r = split_both_to_sides(_s(df, "traffic_mode:both"),
                                     _s(df, "traffic_mode:left"),
                                     _s(df, "traffic_mode:right"))
    central = way_type == "cycle lane (central)"
    tm_l = tm_l.astype(object).copy()
    tm_r = tm_r.astype(object).copy()
    tm_l[central] = "motor_vehicle"
    tm_r[central] = "motor_vehicle"

    pl, pr = split_both_to_sides(_s(df, "parking:both"), _s(df, "parking:left"),
                                 _s(df, "parking:right"))
    park_l = truthy(pl) & (pl != "no")
    park_r = truthy(pr) & (pr != "no")
    side = _s(df, "side")
    is_sp = _s(df, "proc_sidepath")
    side_park = ((side == "right") & park_r) | ((side == "left") & park_l)

    is_lane = way_type.fillna("").astype(str).str.contains("cycle lane",
                                                           regex=False)
    trackish = way_type.isin(["cycle track", "shared path", "segregated path",
                              "shared footway"]) & (is_sp == "yes")

    # left side (ref:980-991)
    need_l = ~central & falsy(tm_l)
    fill_l = np.select(
        [
            (way_type == "cycle path").to_numpy(dtype=bool),
            (trackish & side_park & (tm_r != "parking")).to_numpy(dtype=bool),
            trackish.to_numpy(dtype=bool),
            (is_lane | way_type.isin(["shared road", "shared traffic lane",
                                      "shared bus lane", "crossing"])
             ).to_numpy(dtype=bool),
        ],
        ["no", "parking", "motor_vehicle", "motor_vehicle"],
        default=None,
    )
    tm_l[need_l] = pd.Series(fill_l, index=df.index, dtype=object)[need_l]

    # right side (ref:994-1007) — uses the (possibly just-filled) tm_l
    need_r = ~central & falsy(tm_r)
    fill_r = np.select(
        [
            (way_type == "cycle path").to_numpy(dtype=bool),
            (way_type == "crossing").to_numpy(dtype=bool),
            (is_lane & side_park & (tm_l != "parking")).to_numpy(dtype=bool),
            is_lane.to_numpy(dtype=bool),
            trackish.to_numpy(dtype=bool),
        ],
        ["no", "motor_vehicle", "parking", "foot", "foot"],
        default=None,
    )
    tm_r[need_r] = pd.Series(fill_r, index=df.index, dtype=object)[need_r]
    return tm_l, tm_r


def _assign_general_to_side(general: pd.Series, left: pd.Series,
                            right: pd.Series, tm_l: pd.Series,
                            tm_r: pd.Series):
    """Right-hand-traffic disambiguation of an unsided separation/buffer value
    (ref:cycling_quality_index.py:1018-1028)."""
    left = left.astype(object).copy()
    right = right.astype(object).copy()
    have = truthy(general)
    motorish_l = tm_l.isin(["motor_vehicle", "psv", "parking"])
    to_left = have & motorish_l & falsy(left)
    left[to_left] = general[to_left]
    to_right = have & ~motorish_l & (tm_r == "motor_vehicle") & falsy(right)
    right[to_right] = general[to_right]
    return left, right


def derive_separation(df: pd.DataFrame, tm_l, tm_r):
    sl, sr = split_both_to_sides(_s(df, "separation:both"),
                                 _s(df, "separation:left"),
                                 _s(df, "separation:right"))
    sl, sr = _assign_general_to_side(_s(df, "separation"), sl, sr, tm_l, tm_r)
    sl[falsy(sl)] = "no"
    sr[falsy(sr)] = "no"
    return sl, sr


def derive_buffer(df: pd.DataFrame, tm_l, tm_r):
    bl, br = split_both_to_sides(get_number(_s(df, "buffer:both")),
                                 get_number(_s(df, "buffer:left")),
                                 get_number(_s(df, "buffer:right")))
    bl, br = _assign_general_to_side(get_number(_s(df, "buffer")), bl, br,
                                     tm_l, tm_r)
    return get_number(bl), get_number(br)


# --------------------------------------------------------------------------
# R8: mandatory use (ref:cycling_quality_index.py:1093-1136)
# --------------------------------------------------------------------------

def derive_mandatory(df: pd.DataFrame, way_type: pd.Series,
                     proc_oneway: pd.Series):
    bicycle = _s(df, "bicycle")
    cw = _s(df, "cycleway")
    cw_b = _s(df, "cycleway:both")
    cw_r = _s(df, "cycleway:right")
    sign = _s(df, "traffic_sign")
    is_sp = _s(df, "proc_sidepath")
    ow_yes = _oneway_yes(proc_oneway)

    out = _none(df)
    shared = way_type.isin(C.SHARED_WAY_TYPES)
    lane_like = ["lane", "share_busway"]
    use_sp = cw.isin(lane_like) | cw_b.isin(lane_like) | (ow_yes & cw_r.isin(lane_like))
    opt_sp = (cw == "track") | (cw_b == "track") | (ow_yes & (cw_r == "track"))
    out[shared & opt_sp] = "optional_sidepath"
    out[shared & use_sp] = "use_sidepath"
    explicit = bicycle.isin(["use_sidepath", "optional_sidepath"])
    out[shared & explicit] = bicycle[shared & explicit]

    sp_branch = ~shared & (is_sp == "yes") & truthy(sign)

    def _sign_mandatory(v):
        parts = str(v).replace(",", ";").split(";")
        res = "no"
        for s in parts:
            if any(m in s for m in C.MANDATORY_TRAFFIC_SIGNS):
                res = "yes"
        return res

    out[sp_branch] = sign[sp_branch].map(_sign_mandatory)

    prohibited = (_s(df, "highway").isin(C.CYCLING_PROHIBITED_HIGHWAYS)
                  | (bicycle == "no"))
    out[prohibited] = "prohibited"
    return out, sign.astype(object).where(truthy(sign), None)


# --------------------------------------------------------------------------
# R9-R18: scoring (ref:cycling_quality_index.py:1210-1434,1609-1798)
# --------------------------------------------------------------------------

def _py_round_series(s: pd.Series, nd: int) -> pd.Series:
    """Element-wise Python round() (correctly-rounded decimal, banker's).

    Rounds each DISTINCT value once and scatters back through factorize
    codes: the rule tables and logistic curves emit few distinct factor
    values even on huge corpora (values are functions of the bounded tag
    vocabulary), so n Python-level round() calls become k (k = distinct
    non-null values) with bit-identical output — the same round() call
    decides every element.
    """
    arr = s.to_numpy(dtype=float, na_value=np.nan)
    codes, uniq = pd.factorize(arr, use_na_sentinel=True)
    rounded = np.fromiter((round(float(v), nd) for v in uniq),
                          dtype=float, count=len(uniq))
    out = np.full(len(arr), np.nan)
    ok = codes >= 0
    out[ok] = rounded[codes[ok]]
    return pd.Series(out, index=s.index)


def score(df: pd.DataFrame) -> pd.DataFrame:
    """Factor math + index assembly.  Expects proc_* columns present."""
    wt = _s(df, "way_type")
    proc_oneway = _s(df, "proc_oneway")
    proc_width = get_number(_s(df, "proc_width"))
    proc_surface = _s(df, "proc_surface")
    proc_smoothness = _s(df, "proc_smoothness")
    proc_highway = _s(df, "proc_highway")
    proc_maxspeed = get_number(_s(df, "proc_maxspeed"))
    is_sp = _s(df, "proc_sidepath")
    tm_l = _s(df, "proc_traffic_mode_left")
    tm_r = _s(df, "proc_traffic_mode_right")
    buf_l = get_number(_s(df, "proc_buffer_left"))
    buf_r = get_number(_s(df, "proc_buffer_right"))
    ow_yes = _oneway_yes(proc_oneway)

    bonus = [[] for _ in range(len(df))]
    malus = [[] for _ in range(len(df))]
    idx_of = {ix: k for k, ix in enumerate(df.index)}

    def add(series_mask: pd.Series, bucket: list, text: str):
        for ix in df.index[series_mask.fillna(False).astype(bool)]:
            bucket[idx_of[ix]].append(text)

    # base index + motor vehicle override (ref:1210-1218)
    base = wt.map(C.BASE_INDEX)
    mv_access = get_access(df, "motor_vehicle")
    in_shared = wt.isin(C.SHARED_WAY_TYPES)
    mv_override = in_shared & mv_access.isin(list(C.MOTOR_VEHICLE_ACCESS_INDEX))
    base = base.astype(object)
    base[mv_override] = mv_access[mv_override].map(C.MOTOR_VEHICLE_ACCESS_INDEX)
    add(mv_override, bonus, "motor vehicle restricted")
    base = get_number(base)

    # width factor (ref:1220-1254) + upstream minimum-factor clamp
    dedicated = ~wt.isin(SHARED_FAMILY) | (mv_access == "no")
    calc_w = proc_width.copy()
    m = dedicated & truthy(calc_w) & ~ow_yes
    calc_w[m] = calc_w[m] / 1.6
    nd = ~dedicated
    m_stl = nd & truthy(calc_w) & (wt == "shared traffic lane")
    calc_w[m_stl] = np.maximum(calc_w[m_stl] - 2 + (4.5 - calc_w[m_stl]) / 3, 0)
    m_sbl = nd & truthy(calc_w) & (wt == "shared bus lane")
    calc_w[m_sbl] = np.maximum(calc_w[m_sbl] - 3 + (5.5 - calc_w[m_sbl]) / 3, 0)
    m_oth = nd & truthy(calc_w) & ~(wt == "shared traffic lane") & ~(wt == "shared bus lane")
    two = m_oth & ~ow_yes
    calc_w[two] = calc_w[two] / 1.6
    calc_w[m_oth] = calc_w[m_oth] - 2

    have_cw = truthy(calc_w)
    cw_pos = np.maximum(0.001, calc_w.fillna(0.0))
    steep = (cw_pos <= 3) | wt.isin(SHARED_FAMILY)
    fac_width_raw = np.where(
        steep, 1.1 / (1 + 20 * np.exp(-2.1 * cw_pos)),
        2 / (1 + 1.8 * np.exp(-0.24 * cw_pos)))
    fac_width = pd.Series(fac_width_raw, index=df.index)
    uplift = wt.isin(["bicycle road", "shared road", "shared traffic lane",
                      "track or service"]) & mv_access.isin(
        list(C.MOTOR_VEHICLE_ACCESS_INDEX))
    fac_width[uplift] = fac_width[uplift] + (1 - fac_width[uplift]) / 2
    fac_width = _py_round_series(fac_width, 3)
    # upstream clamps non-dedicated ways to a 0.25 floor (golden sr23)
    fac_width[nd] = np.maximum(fac_width[nd], 0.25)
    fac_width[~have_cw] = np.nan
    add(fac_width > 1, bonus, "wide width")
    add(truthy(fac_width) & (fac_width <= 0.5), malus, "narrow width")

    # surface factor (ref:1266-1277)
    fac_surface = proc_smoothness.map(C.SMOOTHNESS_FACTOR)
    fac_surface = fac_surface.where(pd.notna(fac_surface),
                                    proc_surface.map(C.SURFACE_FACTOR))
    fac_surface = get_number(fac_surface)
    add(truthy(fac_surface) & (fac_surface > 1), bonus, "excellent surface")
    add(truthy(fac_surface) & (fac_surface <= 0.5), malus, "bad surface")

    # highway & maxspeed factors (ref:1279-1294)
    fac_highway = proc_highway.map(C.HIGHWAY_FACTOR).fillna(1.0)
    # descending threshold scan, first threshold <= speed wins (ref:1279-1286)
    fac_maxspeed = pd.Series(1.0, index=df.index)
    assigned = pd.Series(False, index=df.index)
    for ms in sorted(C.MAXSPEED_FACTOR, reverse=True):
        hit = truthy(proc_maxspeed) & (proc_maxspeed >= ms) & ~assigned
        fac_maxspeed[hit] = C.MAXSPEED_FACTOR[ms]
        assigned |= hit

    # fac_1 (ref:1297-1308) — kept unrounded for the index product; the
    # golden indices only reproduce from the unrounded factor chain
    w_w = np.maximum(1 - fac_width.fillna(0.0), 0) + 0.5
    w_s = np.maximum(1 - fac_surface.fillna(0.0), 0) + 0.5
    both = truthy(fac_width) & truthy(fac_surface)
    fac_1 = pd.Series(1.0, index=df.index)
    fac_1[both] = ((w_w * fac_width + w_s * fac_surface) / (w_w + w_s))[both]
    only_w = truthy(fac_width) & ~truthy(fac_surface)
    fac_1[only_w] = fac_width[only_w]
    only_s = ~truthy(fac_width) & truthy(fac_surface)
    fac_1[only_s] = fac_surface[only_s]

    # fac_2 (ref:1311-1319)
    weight = wt.map(C.HIGHWAY_FACTOR_WEIGHT).fillna(1.0)
    path_not_sp = wt.isin(["shared path", "segregated path",
                           "shared footway"]) & (is_sp != "yes")
    weight[path_not_sp] = 0.0
    fac_2 = fac_highway * fac_maxspeed
    fac_2 = fac_2 + (1 - fac_2) * (1 - weight)
    fac_2[falsy(fac_2)] = 1.0

    w_ge = weight >= 0.5
    add(w_ge & (fac_2 > 1), bonus, "slow traffic")
    add(w_ge & (fac_highway <= 0.7), malus, "along a major road")
    add(w_ge & (fac_maxspeed <= 0.7), malus,
        "along a road with high speed limits")

    fac_3 = pd.Series(1.0, index=df.index)

    # fac_4 (ref:1322-1391)
    fac_4 = pd.Series(1.0, index=df.index)
    cw4 = [_s(df, c) for c in ("cycleway", "cycleway:both", "cycleway:left",
                               "cycleway:right")]
    sharrow = pd.Series(False, index=df.index)
    for c in cw4:
        sharrow |= (c == "shared_lane").fillna(False)
    sharrow &= wt.isin(["shared road", "shared traffic lane"])
    fac_4[sharrow] += 0.1
    add(sharrow, bonus, "shared lane markings")

    colour_scope = (wt.fillna("").astype(str).str.contains("cycle lane", regex=False)
                    | wt.isin(["crossing", "shared bus lane", "link",
                               "bicycle road"])
                    | (wt.isin(["shared path", "segregated path"])
                       & (is_sp == "yes")))
    sc = _s(df, "surface:colour")
    has_colour = truthy(sc) & ~sc.isin(["no", "none", "grey", "gray", "black"])
    cb = colour_scope & has_colour
    fac_4[cb & (wt == "crossing")] += 0.15
    fac_4[cb & (wt != "crossing")] += 0.05
    add(cb, bonus, "surface colour")

    miss_crossing = pd.Series(False, index=df.index)
    miss_markings = pd.Series(False, index=df.index)
    is_x = wt == "crossing"
    crossing = _s(df, "crossing")
    markings = _s(df, "crossing:markings")
    miss_crossing |= is_x & falsy(crossing)
    miss_markings |= is_x & falsy(markings)
    signalled = is_x & (crossing == "traffic_signals")
    marked = is_x & ~signalled & (crossing.isin(["marked", "zebra"])
                                  | (truthy(markings) & (markings != "no")))
    fac_4[signalled] += 0.2
    fac_4[marked] += 0.1
    add(signalled, bonus, "signalled crossing")
    add(marked, bonus, "marked crossing")

    lit = _s(df, "lit")
    miss_lit = falsy(lit)
    unlit = lit == "no"
    fac_4[unlit] -= 0.1
    add(unlit, malus, "no street lighting")

    dooring_scope = (wt.fillna("").astype(str).str.contains("cycle lane", regex=False)
                     | (wt.isin(["cycle track", "shared path",
                                 "segregated path"]) & (is_sp == "yes")))
    park_l = (tm_l == "parking") & truthy(buf_l) & (buf_l < 1)
    park_r = (tm_r == "parking") & truthy(buf_r) & (buf_r < 1)
    doored = (park_l | park_r) & dooring_scope
    diff = pd.Series(0.0, index=df.index)
    ml = doored & (tm_l == "parking")
    diff[ml] = (buf_l[ml] - 1).abs() / 5
    mr = doored & (tm_r == "parking")
    diff[mr] = (buf_r[mr] - 1).abs() / 5
    mb = doored & (tm_l == "parking") & (tm_r == "parking")
    diff[mb] = ((buf_l[mb] + buf_r[mb]) / 2 - 1).abs() / 5
    fac_4[doored] -= diff[doored]
    add(doored, malus, "insufficient dooring buffer")

    permissive = _s(df, "bicycle") == "permissive"
    fac_4[permissive] -= 0.2
    add(permissive, malus, "cycling not intended")

    # index assembly (ref:1731-1782) from the unrounded factor chain
    have_base = pd.notna(base)
    raw = base * fac_1 * fac_2 * fac_3 * fac_4
    clamped = np.minimum(100.0, np.maximum(0.0, raw))
    index = _py_round_series(pd.Series(clamped, index=df.index), 0)
    index[~have_base] = np.nan
    index_10 = np.floor(index / 10)

    # LTS (ref:1393-1434)
    lts = _lts(df, wt, proc_oneway, proc_width, proc_maxspeed, proc_highway,
               mv_access)

    out = df.copy()
    out["base_index"] = base
    out["fac_width"] = fac_width
    out["fac_surface"] = fac_surface
    out["fac_highway"] = fac_highway
    out["fac_maxspeed"] = fac_maxspeed
    out["fac_1"] = _py_round_series(fac_1, 2)
    out["fac_2"] = _py_round_series(fac_2, 2).where(have_base)
    out["fac_3"] = fac_3.where(have_base)
    out["fac_4"] = _py_round_series(fac_4, 2).where(have_base)
    out["index"] = index
    out["index_10"] = index_10
    out["stress_level"] = lts

    # data strings: bonus/malus joined; missing handled by caller
    out["data_bonus"] = [";".join(b) for b in bonus]
    out["data_malus"] = [";".join(m) for m in malus]
    out["_miss_crossing"] = miss_crossing
    out["_miss_markings"] = miss_markings
    out["_miss_lit"] = miss_lit
    # fac_2/3/4 are only written when base_index is set in the reference;
    # fac_1 likewise
    out["fac_1"] = out["fac_1"].where(have_base)
    return out


def _lts(df, wt, proc_oneway, proc_width, proc_maxspeed, proc_highway,
         mv_access):
    lts = pd.Series(np.nan, index=df.index)
    ms = proc_maxspeed
    w = proc_width
    ow = proc_oneway

    m = wt.isin(["cycle path", "cycle track", "segregated path",
                 "cycle lane (protected)"])
    lts[m] = 1

    m = wt.isin(["shared path", "shared footway"])
    hard = (~ow.isin(["yes", "-1"]) & truthy(w) & (w < 3)
            & truthy(ms) & (ms > 30))
    lts[m & hard] = 3
    lts[m & ~hard] = 1

    m = wt.isin(["cycle lane (advisory)", "cycle lane (central)",
                 "shared bus lane", "link", "crossing"])
    lts[m] = np.select(
        [
            (truthy(ms) & (ms <= 10))[m].to_numpy(dtype=bool),
            (truthy(ms) & (ms <= 30))[m].to_numpy(dtype=bool),
            (truthy(w) & (w >= 1.5))[m].to_numpy(dtype=bool),
        ],
        [1, 2, 3], default=4)

    m = wt == "cycle lane (exclusive)"
    lts[m] = np.select(
        [
            (truthy(ms) & (ms <= 10))[m].to_numpy(dtype=bool),
            (truthy(ms) & (ms <= 50) & truthy(w) & (w >= 1.85))[m].to_numpy(dtype=bool),
        ],
        [1, 2], default=3)

    m = wt.isin(["bicycle road", "shared road", "shared traffic lane"])
    br_quiet = (wt == "bicycle road") & mv_access.isin(
        list(C.MOTOR_VEHICLE_ACCESS_INDEX))
    lts[m & br_quiet] = 1
    rest = m & ~br_quiet
    prio = _s(df, "priority_road")
    calm1 = (truthy(ms) & (ms <= 10)
             & proc_highway.isin(["residential", "living_street"])
             & (falsy(prio) | (prio == "no")))
    calm2 = (truthy(ms) & (ms <= 30)
             & proc_highway.isin(["tertiary", "tertiary_link", "unclassified",
                                  "road", "residential", "living_street"]))
    lts[rest & calm1] = 1
    lts[rest & calm2 & ~calm1] = 2
    lts[rest & ~calm1 & ~calm2] = 4

    m = wt == "track or service"
    lts[m & truthy(ms) & (ms <= 10)] = 1
    lts[m & ~(truthy(ms) & (ms <= 10))] = 2
    return lts
