"""Stage 2 — side-row synthesis for centerline-mapped cycleways/sidewalks
(G1-G3 of SURVEY.md §2.6).

The snapshot's offset wiring is dead code (SURVEY.md §2.9); the golden output
is the contract.  Reverse-engineered behavior:

* a left/right *cycleway* row is emitted when any of
  [cycleway, cycleway:both, cycleway:<side>] is lane/track/share_busway
  (ref:cycling_quality_index.py:269-301);
* a left/right *sidewalk* row when any of [sidewalk:bicycle,
  sidewalk:both:bicycle, sidewalk:<side>:bicycle] is yes/designated/permissive;
* each row gets offset/type/side, proc_sidepath='yes',
  proc_highway=parent highway, proc_maxspeed=float(parent maxspeed), and
  width/oneway/oneway:bicycle/traffic_sign/surface/smoothness re-derived
  from its own type:side tag matrix (ref:cycling_quality_index.py:315-344,
  deriveAttribute ref:definitions.py:4-21);
* cycleway rows additionally re-derive separation/buffer/traffic_mode/
  surface:colour and collapse the cycleway tag matrix to their own side —
  the golden cl01 left row classifies as `cycle track` although the parent
  also carries cycleway:right=lane, so the opposite side's tags must not
  leak into the classifier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import config as C
from ..parse import falsy, first_nonfalsy, get_number, truthy

CYCLEWAY_TRIGGERS = ["lane", "track", "share_busway"]
SIDEWALK_TRIGGERS = ["yes", "designated", "permissive"]

# sub-attributes whose cycleway matrix is collapsed onto the side row
COLLAPSE_SUBS = ["", "lane", "foot", "segregated"]
CYCLEWAY_EXTRA_ATTRS = [
    "separation", "separation:both", "separation:left", "separation:right",
    "buffer", "buffer:both", "buffer:left", "buffer:right",
    "traffic_mode:both", "traffic_mode:left", "traffic_mode:right",
    "surface:colour",
]


def _col(df: pd.DataFrame, name: str) -> pd.Series:
    if name in df.columns:
        return df[name]
    return pd.Series(None, index=df.index, dtype=object)


def derive_attribute(df: pd.DataFrame, typ: str, side: str,
                     attr: str) -> pd.Series:
    """type:side:attr -> type:both:attr -> type:attr (ref:definitions.py:4-21)."""
    return first_nonfalsy(
        _col(df, f"{typ}:{side}:{attr}"),
        _col(df, f"{typ}:both:{attr}"),
        _col(df, f"{typ}:{attr}"),
    )


def offset_flags(df: pd.DataFrame) -> dict[tuple[str, str], pd.Series]:
    """Which (type, side) rows each way emits
    (ref:cycling_quality_index.py:269-301)."""
    cw = _col(df, "cycleway")
    cw_b = _col(df, "cycleway:both")
    flags = {}
    for side in ("left", "right"):
        cw_s = _col(df, f"cycleway:{side}")
        flags[("cycleway", side)] = (
            cw.isin(CYCLEWAY_TRIGGERS) | cw_b.isin(CYCLEWAY_TRIGGERS)
            | cw_s.isin(CYCLEWAY_TRIGGERS)).fillna(False)
        sw = _col(df, "sidewalk:bicycle")
        sw_b = _col(df, "sidewalk:both:bicycle")
        sw_s = _col(df, f"sidewalk:{side}:bicycle")
        flags[("sidewalk", side)] = (
            sw.isin(SIDEWALK_TRIGGERS) | sw_b.isin(SIDEWALK_TRIGGERS)
            | sw_s.isin(SIDEWALK_TRIGGERS)).fillna(False)
    return flags


def _offset_magnitude(df: pd.DataFrame, typ: str,
                      offset_distance) -> pd.Series:
    """Per-row offset distance (ref:cycling_quality_index.py:254-266).

    'realistic': width/2 for cycleways, width/2 + 2 for sidewalks, where
    width = getNumber(way.width) or the per-highway default
    (ref:cycling_quality_index.py:278-279, parameter.py:29-50; Python
    ``or`` => 0/None both fall back).  Numeric: the literal distance.
    """
    if offset_distance == "realistic":
        width_num = get_number(_col(df, "width"))
        hw_default = df["highway"].map(C.DEFAULT_HIGHWAY_WIDTH).fillna(
            C.DEFAULT_HIGHWAY_WIDTH_FALLBACK)
        base = width_num.where(width_num.notna() & (width_num != 0),
                               hw_default).astype(float)
        return base / 2 + (2.0 if typ == "sidewalk" else 0.0)
    val = get_number(pd.Series([offset_distance], dtype=object)).iloc[0]
    return pd.Series(0.0 if pd.isna(val) else float(val), index=df.index)


def _make_side_rows(df: pd.DataFrame, typ: str, side: str,
                    offset_distance=None) -> pd.DataFrame:
    if offset_distance is None:
        offset_distance = C.OFFSET_DISTANCE
    rows = df.copy()
    off = _offset_magnitude(df, typ, offset_distance)
    rows["offset"] = off.to_numpy()
    if offset_distance != 0 and "geom_metric" in rows.columns:
        # native:offsetline semantics: positive distance offsets LEFT of
        # the line direction; right-side rows shift the other way.  The
        # `offset` attribute keeps the unsigned magnitude (ref stores the
        # positive offset_{type}_{side} value).
        from ..geometry import offset_polyline
        sign = 1.0 if side == "left" else -1.0
        rows["geom_metric"] = [
            offset_polyline(np.asarray(g, dtype=float), sign * o)
            for g, o in zip(rows["geom_metric"], off)]
    rows["type"] = typ
    rows["side"] = side
    rows["proc_sidepath"] = "yes"
    rows["proc_highway"] = rows["highway"]
    rows["proc_maxspeed"] = get_number(_col(rows, "maxspeed"))

    # attribute transfer (ref:cycling_quality_index.py:324-326)
    rows["width"] = get_number(derive_attribute(df, typ, side, "width"))
    rows["oneway"] = derive_attribute(df, typ, side, "oneway")
    rows["oneway:bicycle"] = derive_attribute(df, typ, side, "oneway:bicycle")
    # the reference float-casts traffic_sign here (vartype 'float'), which
    # nulls out non-numeric signs on side rows
    rows["traffic_sign"] = get_number(
        derive_attribute(df, typ, side, "traffic_sign"))

    # surface/smoothness: overwrite with the type-matrix derivation (even to
    # NULL) for sidewalk rows, cycleway *tracks*, or when side surface /
    # smoothness tags exist; otherwise (plain lanes/busways) keep the parent
    # tags (ref:cycling_quality_index.py:328-336 with QGIS-truthy presence
    # checks; golden: cl03 lane inherits asphalt, cl11 track goes NULL)
    derived_surface = derive_attribute(df, typ, side, "surface")
    derived_smoothness = derive_attribute(df, typ, side, "smoothness")
    overwrite = pd.Series(typ != "cycleway", index=df.index)
    overwrite |= (_col(df, f"cycleway:{side}") == "track").fillna(False)
    overwrite |= (_col(df, "cycleway:both") == "track").fillna(False)
    overwrite |= (_col(df, "cycleway") == "track").fillna(False)
    overwrite |= truthy(derived_surface) | truthy(derived_smoothness)
    rows["surface"] = derived_surface.where(overwrite, _col(df, "surface"))
    rows["smoothness"] = derived_smoothness.where(overwrite,
                                                  _col(df, "smoothness"))

    if typ == "cycleway":
        for attr in CYCLEWAY_EXTRA_ATTRS:
            rows[attr] = derive_attribute(df, "cycleway", side, attr)
        # collapse the cycleway tag matrix onto this side so the classifier
        # only sees this side's infrastructure
        collapsed = {}
        for sub in COLLAPSE_SUBS:
            attr = sub if sub else None
            if attr is None:
                collapsed["cycleway"] = first_nonfalsy(
                    _col(df, f"cycleway:{side}"), _col(df, "cycleway:both"),
                    _col(df, "cycleway"))
            else:
                collapsed[f"cycleway:{attr}"] = derive_attribute(
                    df, "cycleway", side, attr)
        for sub in COLLAPSE_SUBS:
            base = "cycleway" if not sub else f"cycleway:{sub}"
            for s in ("both", "left", "right"):
                colname = f"cycleway:{s}" if not sub else f"cycleway:{s}:{sub}"
                if colname in rows.columns:
                    rows[colname] = None
        for k, v in collapsed.items():
            rows[k] = v
    return rows


def run_offset_stage(df: pd.DataFrame,
                     offset_distance=None) -> pd.DataFrame:
    """Emit centerline + synthesized side rows (union, ref:362-364,1593).

    ``offset_distance`` defaults to config.OFFSET_DISTANCE (0, the golden
    contract); pass 'realistic' or a number to exercise the data-defined
    geometric offset (G2).

    The union is a hand-rolled per-column ``np.concatenate`` as object
    arrays: ``pd.concat`` on ~200 mixed object/float columns falls into a
    per-element all-NA validation path that costs more than the entire rest
    of the scoring kernel (measured 52% of batch time).
    """
    flags = offset_flags(df)
    parts = [df]
    for (typ, side), mask in flags.items():
        if mask.any():
            parts.append(_make_side_rows(df[mask], typ, side,
                                         offset_distance))
    if len(parts) == 1:
        return df.reset_index(drop=True)
    cols: list[str] = list(df.columns)
    seen = set(cols)
    for p in parts[1:]:
        cols.extend(c for c in p.columns if c not in seen)
        seen.update(p.columns)
    data = {
        c: np.concatenate([
            p[c].to_numpy(dtype=object, copy=False) if c in p.columns
            else np.full(len(p), None, dtype=object)
            for p in parts
        ])
        for c in cols
    }
    return pd.DataFrame(data)
