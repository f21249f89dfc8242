"""Vectorized planar geometry for LineString processing (pure numpy).

The reference delegates geometry to QGIS/GEOS (reproject, points-along-line,
buffer, distance — ref:cycling_quality_index.py:125-131,1491-1512).  No
geometry library is assumed here; everything is numpy so it can run inside
Arrow-batched pandas UDFs on executors.

Coordinates are processed in a metric transverse-Mercator plane
(ETRS89 / UTM zone 33N, EPSG:25833 — ref:parameter.py:5) computed with the
Karney-Krüger series (public formulas from C.F.F. Karney, "Transverse
Mercator with an accuracy of a few nanometers", J. Geodesy 85(8), 2011).
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid (used by ETRS89)
_A = 6378137.0
_F = 1.0 / 298.257222101
_K0 = 0.9996
_LON0_DEG = 15.0  # UTM zone 33
_FALSE_E = 500000.0
_FALSE_N = 0.0

_N = _F / (2.0 - _F)
_N2, _N3, _N4, _N5, _N6 = _N**2, _N**3, _N**4, _N**5, _N**6
_ABAR = _A / (1 + _N) * (1 + _N2 / 4 + _N4 / 64 + _N6 / 256)

# Krüger series coefficients, forward (alpha) and inverse (beta), order 6
_ALPHA = np.array([
    _N / 2 - 2 * _N2 / 3 + 5 * _N3 / 16 + 41 * _N4 / 180 - 127 * _N5 / 288
    + 7891 * _N6 / 37800,
    13 * _N2 / 48 - 3 * _N3 / 5 + 557 * _N4 / 1440 + 281 * _N5 / 630
    - 1983433 * _N6 / 1935360,
    61 * _N3 / 240 - 103 * _N4 / 140 + 15061 * _N5 / 26880
    + 167603 * _N6 / 181440,
    49561 * _N4 / 161280 - 179 * _N5 / 168 + 6601661 * _N6 / 7257600,
    34729 * _N5 / 80640 - 3418889 * _N6 / 1995840,
    212378941 * _N6 / 319334400,
])
_BETA = np.array([
    _N / 2 - 2 * _N2 / 3 + 37 * _N3 / 96 - _N4 / 360 - 81 * _N5 / 512
    + 96199 * _N6 / 604800,
    _N2 / 48 + _N3 / 15 - 437 * _N4 / 1440 + 46 * _N5 / 105
    - 1118711 * _N6 / 3870720,
    17 * _N3 / 480 - 37 * _N4 / 840 - 209 * _N5 / 4480 + 5569 * _N6 / 90720,
    4397 * _N4 / 161280 - 11 * _N5 / 504 - 830251 * _N6 / 7257600,
    4583 * _N5 / 161280 - 108847 * _N6 / 3991680,
    20648693 * _N6 / 638668800,
])
_J = np.arange(1, 7)


def lonlat_to_metric(lon: np.ndarray, lat: np.ndarray):
    """EPSG:4326 -> EPSG:25833 (easting, northing), fully vectorized."""
    lon = np.asarray(lon, dtype=float)
    lat = np.asarray(lat, dtype=float)
    phi = np.radians(lat)
    lam = np.radians(lon - _LON0_DEG)
    e = np.sqrt(_F * (2 - _F))
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1 + t * t))
    j2xi = 2 * _J[:, None] * xi_p.reshape(-1)[None, :]
    j2eta = 2 * _J[:, None] * eta_p.reshape(-1)[None, :]
    xi = xi_p.reshape(-1) + (_ALPHA[:, None] * np.sin(j2xi) * np.cosh(j2eta)).sum(0)
    eta = eta_p.reshape(-1) + (_ALPHA[:, None] * np.cos(j2xi) * np.sinh(j2eta)).sum(0)
    x = _FALSE_E + _K0 * _ABAR * eta
    y = _FALSE_N + _K0 * _ABAR * xi
    return x.reshape(lon.shape), y.reshape(lat.shape)


def metric_to_lonlat(x: np.ndarray, y: np.ndarray):
    """EPSG:25833 -> EPSG:4326 (lon, lat), vectorized inverse series."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    eta = (x - _FALSE_E) / (_K0 * _ABAR)
    xi = (y - _FALSE_N) / (_K0 * _ABAR)
    j2xi = 2 * _J[:, None] * xi.reshape(-1)[None, :]
    j2eta = 2 * _J[:, None] * eta.reshape(-1)[None, :]
    xi_p = xi.reshape(-1) - (_BETA[:, None] * np.sin(j2xi) * np.cosh(j2eta)).sum(0)
    eta_p = eta.reshape(-1) - (_BETA[:, None] * np.cos(j2xi) * np.sinh(j2eta)).sum(0)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    # footpoint latitude by Newton iteration on the conformal latitude
    e = np.sqrt(_F * (2 - _F))
    phi = chi.copy()
    for _ in range(6):
        sphi = np.sin(phi)
        target = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
        dtarget = (np.cosh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
                   * (1 / (1 - sphi**2) - e * e / (1 - (e * sphi) ** 2))
                   * np.cos(phi))
        phi = phi - (target - np.tan(chi)) / np.maximum(dtarget, 1e-12)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon = np.degrees(lam) + _LON0_DEG
    lat = np.degrees(phi)
    return lon.reshape(x.shape), lat.reshape(y.shape)


def line_length(coords: np.ndarray) -> float:
    """Total length of a polyline given an (n,2) metric coordinate array."""
    d = np.diff(coords, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def sample_points_along(coords: np.ndarray, spacing: float) -> np.ndarray:
    """Points every `spacing` meters from the start, plus the end vertex.

    Mirrors the union of QGIS ``native:pointsalonglines`` (first point at the
    start, then every ``spacing`` m while the chainage does not exceed the
    length) and ``native:extractspecificvertices`` VERTICES='-1'
    (ref:cycling_quality_index.py:1491-1506).  The two layers are merged
    without dedup in the reference, so a coincident end point appears twice.
    """
    coords = np.asarray(coords, dtype=float)
    seg = np.diff(coords, axis=0)
    seglen = np.hypot(seg[:, 0], seg[:, 1])
    cum = np.concatenate([[0.0], np.cumsum(seglen)])
    total = cum[-1]
    distances = np.arange(0.0, total + 1e-9, spacing) if total > 0 else np.array([0.0])
    idx = np.clip(np.searchsorted(cum, distances, side="right") - 1, 0, len(seglen) - 1 if len(seglen) else 0)
    if len(seglen) == 0:
        pts = np.repeat(coords[:1], len(distances), axis=0)
    else:
        frac = (distances - cum[idx]) / np.where(seglen[idx] > 0, seglen[idx], 1.0)
        pts = coords[idx] + seg[idx] * frac[:, None]
    return np.vstack([pts, coords[-1:]])


def sample_points_along_batch(
        M: np.ndarray, offs: np.ndarray, spacing: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized :func:`sample_points_along` over a batch of polylines.

    ``M`` is the (N, 2) concatenation of every way's metric vertices and
    ``offs`` the (n_ways+1,) slice offsets.  Returns ``(way, seq, px, py)``
    rows in way order: for way w the same points, in the same order, that
    ``sample_points_along(M[offs[w]:offs[w+1]], spacing)`` yields —
    spacing samples first (seq 0..m-1), end vertex last (seq m).  Sample
    chainages are the identical ``k*spacing`` floats; per-way cumulative
    lengths come from one global cumsum re-based per way, which can differ
    from an independent per-way cumsum by ~1 ulp (inside every downstream
    tolerance; the 22 m predicate operates at whole-meter margins).
    """
    offs = np.asarray(offs, dtype=np.int64)
    npts = np.diff(offs)
    nway = len(npts)
    if nway == 0 or len(M) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, np.empty(0), np.empty(0)
    nseg = np.maximum(npts - 1, 0)
    segoff = np.concatenate([[0], np.cumsum(nseg)])
    mask = np.ones(max(len(M) - 1, 0), dtype=bool)
    b = offs[1:-1] - 1
    mask[b[(b >= 0) & (b < len(mask))]] = False
    dvec = (M[1:] - M[:-1])[mask]
    seglen = np.hypot(dvec[:, 0], dvec[:, 1])
    gc = np.concatenate([[0.0], np.cumsum(seglen)])
    base = gc[segoff[:-1]]
    total = gc[segoff[1:]] - base
    m = np.where(total > 0,
                 np.ceil((total + 1e-9) / spacing).astype(np.int64), 1)
    cnt = m + 1
    tot = int(cnt.sum())
    way = np.repeat(np.arange(nway), cnt)
    row_start = np.concatenate([[0], np.cumsum(cnt)])
    seq = np.arange(tot) - row_start[way]
    is_end = seq == cnt[way] - 1

    px = np.empty(tot)
    py = np.empty(tot)
    interp = (~is_end) & (nseg[way] > 0)
    iw = np.nonzero(interp)[0]
    if len(iw):
        w_i = way[iw]
        dist = seq[iw].astype(float) * spacing
        g = np.searchsorted(gc, base[w_i] + dist, side="right") - 1
        idx = np.clip(g - segoff[w_i], 0, nseg[w_i] - 1)
        gidx = segoff[w_i] + idx
        sl = seglen[gidx]
        frac = (dist - (gc[gidx] - base[w_i])) / np.where(sl > 0, sl, 1.0)
        v = offs[w_i] + idx
        px[iw] = M[v, 0] + dvec[gidx, 0] * frac
        py[iw] = M[v, 1] + dvec[gidx, 1] * frac
    rest = np.nonzero(~interp)[0]
    if len(rest):
        last_v = offs[way[rest]] + npts[way[rest]] - 1
        px[rest] = M[last_v, 0]
        py[rest] = M[last_v, 1]
    return way, seq, px, py


def point_to_polyline_dist(px: np.ndarray, py: np.ndarray,
                           coords: np.ndarray) -> np.ndarray:
    """Min distance from each point (px[i], py[i]) to a polyline. O(P*S)."""
    coords = np.asarray(coords, dtype=float)
    if len(coords) == 1:
        return np.hypot(px - coords[0, 0], py - coords[0, 1])
    a = coords[:-1]
    b = coords[1:]
    ab = b - a
    ablen2 = (ab**2).sum(1)
    ablen2 = np.where(ablen2 > 0, ablen2, 1.0)
    apx = px[:, None] - a[None, :, 0]
    apy = py[:, None] - a[None, :, 1]
    t = np.clip((apx * ab[None, :, 0] + apy * ab[None, :, 1]) / ablen2[None, :], 0.0, 1.0)
    dx = apx - t * ab[None, :, 0]
    dy = apy - t * ab[None, :, 1]
    return np.sqrt(dx * dx + dy * dy).min(axis=1)


def offset_polyline(coords: np.ndarray, distance: float) -> np.ndarray:
    """Simple parallel offset of a polyline (positive = left of direction).

    Miter-join offset via averaged segment normals — adequate for the
    engine's side-row geometry synthesis (QGIS ``native:offsetline``,
    ref:cycling_quality_index.py:305-312).  Degenerate for self-intersecting
    results, which the scoring pipeline never consumes.
    """
    coords = np.asarray(coords, dtype=float)
    if distance == 0 or len(coords) < 2:
        return coords.copy()
    seg = np.diff(coords, axis=0)
    seglen = np.hypot(seg[:, 0], seg[:, 1])
    seglen = np.where(seglen > 0, seglen, 1.0)
    nx = -seg[:, 1] / seglen
    ny = seg[:, 0] / seglen
    vx = np.empty(len(coords))
    vy = np.empty(len(coords))
    vx[0], vy[0] = nx[0], ny[0]
    vx[-1], vy[-1] = nx[-1], ny[-1]
    if len(coords) > 2:
        mx = (nx[:-1] + nx[1:]) / 2
        my = (ny[:-1] + ny[1:]) / 2
        norm = np.hypot(mx, my)
        norm = np.where(norm > 1e-12, norm, 1.0)
        vx[1:-1] = mx / norm
        vy[1:-1] = my / norm
    out = coords.copy()
    out[:, 0] += distance * vx
    out[:, 1] += distance * vy
    return out


def points_to_segments_dist(px: np.ndarray, py: np.ndarray,
                            segs: np.ndarray) -> np.ndarray:
    """Min distance from each point (px[i], py[i]) to ANY of a set of
    independent segments given as an (s, 4) array [ax, ay, bx, by].

    Unlike :func:`point_to_polyline_dist` this does not assume the
    segments are connected — it is the refine kernel for cell-clipped
    road geometry, where only the segments near one cell are carried and
    a phantom chord between non-adjacent segments would under-estimate
    the true distance.
    """
    segs = np.asarray(segs, dtype=float)
    a = segs[:, 0:2]
    b = segs[:, 2:4]
    ab = b - a
    ablen2 = (ab ** 2).sum(1)
    ablen2 = np.where(ablen2 > 0, ablen2, 1.0)
    apx = px[:, None] - a[None, :, 0]
    apy = py[:, None] - a[None, :, 1]
    t = np.clip((apx * ab[None, :, 0] + apy * ab[None, :, 1])
                / ablen2[None, :], 0.0, 1.0)
    dx = apx - t * ab[None, :, 0]
    dy = apy - t * ab[None, :, 1]
    return np.sqrt(dx * dx + dy * dy).min(axis=1)


def segment_cells_clipped(coords: np.ndarray, cell_size: float,
                          pad: float) -> dict[tuple[int, int], np.ndarray]:
    """Per covered cell, the (s, 4) segments whose `pad`-dilated bbox
    touches that cell.

    This is the payload-bounded variant of :func:`segment_bbox_cells`:
    instead of registering the FULL polyline in every covered cell
    (multiplicative shuffle payload for long ways crossing many cells),
    each cell carries only its local segments.  Exact for any
    ``dist <= pad`` predicate: a segment within `pad` of a point inside
    cell C has its dilated bbox intersecting C, so it is registered there.
    """
    coords = np.asarray(coords, dtype=float)
    if len(coords) < 2:
        segs = np.hstack([coords[:1], coords[:1]])
    else:
        segs = np.hstack([coords[:-1], coords[1:]])
    by_cell: dict[tuple[int, int], list[int]] = {}
    for si in range(len(segs)):
        ax, ay, bx, by = segs[si]
        x0, x1 = min(ax, bx) - pad, max(ax, bx) + pad
        y0, y1 = min(ay, by) - pad, max(ay, by) + pad
        for ix in range(int(np.floor(x0 / cell_size)),
                        int(np.floor(x1 / cell_size)) + 1):
            for iy in range(int(np.floor(y0 / cell_size)),
                            int(np.floor(y1 / cell_size)) + 1):
                by_cell.setdefault((ix, iy), []).append(si)
    return {c: segs[idx] for c, idx in by_cell.items()}


def segment_cells_clipped_batch(
        M: np.ndarray, offs: np.ndarray, cell_size: float, pad: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[np.ndarray]]:
    """Vectorized :func:`segment_cells_clipped` over a batch of polylines.

    ``M`` is the (N, 2) concatenation of every way's metric vertices and
    ``offs`` the (n_ways+1,) slice offsets (way w = ``M[offs[w]:offs[w+1]]``).
    Returns ``(way, ix, iy, seg_splits)`` — one entry per (way, covered
    cell) group, where ``seg_splits[g]`` is the (s, 4) segment array that
    ``segment_cells_clipped`` would return for that way at cell
    ``(ix[g], iy[g])`` (same segments, same order).  One numpy pass per
    batch instead of one Python loop per segment.
    """
    offs = np.asarray(offs, dtype=np.int64)
    npts = np.diff(offs)
    n = len(npts)
    if len(M) == 0 or n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, []
    # regular segments: consecutive vertex pairs, cross-way pairs masked
    mask = np.ones(max(len(M) - 1, 0), dtype=bool)
    boundary = offs[1:-1] - 1
    mask[boundary[(boundary >= 0) & (boundary < len(mask))]] = False
    segs = np.hstack([M[:-1][mask], M[1:][mask]])
    way = np.repeat(np.arange(n), np.maximum(npts - 1, 0))
    # degenerate segment for single-vertex ways (mirrors the per-way form)
    single = np.nonzero(npts == 1)[0]
    if len(single):
        c = M[offs[single]]
        segs = np.vstack([segs, np.hstack([c, c])])
        way = np.concatenate([way, single])
        order = np.argsort(way, kind="stable")
        segs, way = segs[order], way[order]
    # dilated bbox -> covered cell ranges per segment
    x0 = np.minimum(segs[:, 0], segs[:, 2]) - pad
    x1 = np.maximum(segs[:, 0], segs[:, 2]) + pad
    y0 = np.minimum(segs[:, 1], segs[:, 3]) - pad
    y1 = np.maximum(segs[:, 1], segs[:, 3]) + pad
    ix0 = np.floor(x0 / cell_size).astype(np.int64)
    ix1 = np.floor(x1 / cell_size).astype(np.int64)
    iy0 = np.floor(y0 / cell_size).astype(np.int64)
    iy1 = np.floor(y1 / cell_size).astype(np.int64)
    ny = iy1 - iy0 + 1
    counts = (ix1 - ix0 + 1) * ny
    total = int(counts.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, []
    rep = np.repeat(np.arange(len(segs)), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    k = np.arange(total) - np.repeat(starts, counts)
    nyr = ny[rep]
    ix = ix0[rep] + k // nyr
    iy = iy0[rep] + k % nyr
    wayr = way[rep]
    # group by (way, ix, iy); rep ascending keeps segment order in-group
    order = np.lexsort((rep, iy, ix, wayr))
    wayr, ix, iy, rep = wayr[order], ix[order], iy[order], rep[order]
    new = np.empty(total, dtype=bool)
    new[:1] = True
    new[1:] = ((wayr[1:] != wayr[:-1]) | (ix[1:] != ix[:-1])
               | (iy[1:] != iy[:-1]))
    g_start = np.nonzero(new)[0]
    seg_splits = np.split(segs[rep], g_start[1:])
    return wayr[g_start], ix[g_start], iy[g_start], seg_splits


def segment_bbox_cells(coords: np.ndarray, cell_size: float,
                       pad: float) -> set[tuple[int, int]]:
    """All (ix, iy) grid cells whose box dilated by `pad` touches the line.

    Used to index road geometries for the cell-bucketed dwithin join: a road
    is registered in every cell its padded envelope covers, so a point only
    needs to probe its own cell.
    """
    coords = np.asarray(coords, dtype=float)
    cells: set[tuple[int, int]] = set()
    for i in range(max(len(coords) - 1, 1)):
        seg = coords[i:i + 2] if len(coords) > 1 else coords[:1]
        x0, y0 = seg[:, 0].min() - pad, seg[:, 1].min() - pad
        x1, y1 = seg[:, 0].max() + pad, seg[:, 1].max() + pad
        for ix in range(int(np.floor(x0 / cell_size)), int(np.floor(x1 / cell_size)) + 1):
            for iy in range(int(np.floor(y0 / cell_size)), int(np.floor(y1 / cell_size)) + 1):
                cells.add((ix, iy))
    return cells
