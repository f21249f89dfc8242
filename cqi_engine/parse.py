"""Vectorized tag-parsing primitives (pandas / numpy).

Each helper mirrors a scalar function of the reference
(``ref:definitions.py``) but operates on whole pandas Series so it can run
inside Arrow-batched UDFs without per-row Python.

NULL semantics: the reference's QGIS ``NULL`` is represented as ``None`` /
``NaN``.  The reference's truthiness (``if not value``) treats NULL, empty
string and 0 as false — :func:`falsy` encodes exactly that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .config import (
    ACCESS_FALLBACK_CHAIN,
    SURFACE_QUALITY_ORDER,
)

# rank of each surface value: index of FIRST occurrence (list.index semantics,
# ref:definitions.py:127)
_SURFACE_RANK: dict[str, int] = {}
for _i, _v in enumerate(SURFACE_QUALITY_ORDER):
    _SURFACE_RANK.setdefault(_v, _i)


def obj(s: pd.Series) -> pd.Series:
    """Normalize a tag Series to object dtype with None for missing."""
    return s.astype(object).where(pd.notna(s), None)


def falsy(s: pd.Series) -> pd.Series:
    """QGIS-style truthiness: NULL, '' and 0 are all falsy.

    ref: pervasive ``if not attribute`` checks in cycling_quality_index.py.
    """
    out = s.isna()
    if s.dtype == object:
        out = out | (s == "") | (s == 0)
    else:
        out = out | (s == 0)
    return out.fillna(True).astype(bool)


def truthy(s: pd.Series) -> pd.Series:
    return ~falsy(s)


def get_number(s: pd.Series) -> pd.Series:
    """``float(value)`` with silent NULL on failure (ref:definitions.py:77-86).

    Note: unlike SQL casts, Python float() accepts 'inf'/'nan' and
    underscores are rejected by neither — pd.to_numeric matches closely
    enough for OSM tag payloads; empty string -> NULL like float('') raising.
    """
    return pd.to_numeric(s, errors="coerce")


def first_nonfalsy(*series: pd.Series) -> pd.Series:
    """Left-to-right coalesce under QGIS truthiness ('' counts as missing)."""
    out = series[0].copy().astype(object)
    for nxt in series[1:]:
        mask = falsy(out)
        out[mask] = nxt[mask]
    return out.where(pd.notna(out), None)


def split_both_to_sides(both: pd.Series, left: pd.Series, right: pd.Series):
    """X:both fans out to missing X:left / X:right
    (ref:cycling_quality_index.py:593-597)."""
    has_both = truthy(both)
    left = left.astype(object).copy()
    right = right.astype(object).copy()
    lmask = has_both & falsy(left)
    rmask = has_both & falsy(right)
    left[lmask] = both[lmask]
    right[rmask] = both[rmask]
    return left, right


def weakest_surface_value(value: str | None) -> str | None:
    """Worst surface from a ';'-joined list (ref:definitions.py:117-129)."""
    if value is None:
        return None
    worst, worst_rank = None, -1
    for item in str(value).split(";"):
        rank = _SURFACE_RANK.get(item)
        if rank is None:
            continue
        if worst is None or rank > worst_rank:
            worst, worst_rank = item, rank
    return worst


def weakest_surface(s: pd.Series) -> pd.Series:
    return s.map(weakest_surface_value, na_action="ignore").astype(object)


def get_access(df: pd.DataFrame, mode: str) -> pd.Series:
    """Access-tag inheritance chain per traffic mode
    (ref:definitions.py:54-72)."""
    cols = [mode] + ACCESS_FALLBACK_CHAIN.get(mode, [])
    series = [df[c] if c in df.columns else pd.Series(None, index=df.index, dtype=object)
              for c in cols]
    return first_nonfalsy(*series)


def last_lane_value(s: pd.Series) -> pd.Series:
    """Value after the last '|' in a lanes string — the rightmost lane
    (ref:cycling_quality_index.py:674)."""
    return get_number(s.str.rsplit("|", n=1).str[-1])


def bankers_round(x: pd.Series | np.ndarray, ndigits: int = 0):
    """Python3 round() = IEEE round-half-to-even, which numpy.round also uses.

    The reference relies on Python round semantics (e.g. index = int(round(x)),
    ref:cycling_quality_index.py:1774) — numpy matches, Spark's ROUND does not.
    """
    return np.round(np.asarray(x, dtype=float), ndigits)


def series_round(s: pd.Series, ndigits: int) -> pd.Series:
    return pd.Series(bankers_round(s.to_numpy(dtype=float), ndigits),
                     index=s.index)
