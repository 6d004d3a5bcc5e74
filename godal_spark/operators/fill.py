"""Pixel neighborhood operators: FillNoData, Nearblack, Dem, Viewshed, Grid.

Reference semantics pinned by goldens:
  * FillNoData (godal.go:372-391; godal_test.go:2285-2363): inverse-
    distance fill of nodata from nearby valid pixels, MaxDistance default
    100 px, SmoothingIterations post-pass; uniform sources fill exactly.
  * Nearblack (godal.go:4235-4294; godal_test.go:4638-4780): collapse
    near-black (or near-white) BORDER-CONNECTED pixels within threshold
    to the pure value; ramp 0..12 @near=10 → 0 x11,11,12.
  * Dem hillshade/slope (godal.go:4099-4127; godal_test.go:5243-5359):
    3x3 Horn kernel; edge rows/cols nodata 0.
  * Viewshed (godal.go:4188-4219; godal_test.go:4472-4592): per-observer
    line-of-sight over a DEM; modes NORMAL / MinTargetHeightFromDem /
    MinTargetHeightFromGround.
  * Grid linear/nearest/IDW/min/max/... (godal.go:4001-4084;
    godal_test.go:4190-4440): scattered points → regular grid with GDAL's
    half-pixel-center convention.

Distributed shape: these are per-image stencil ops → one task per
(image_id, band) via applyInPandas (images bounded; see polygonize.py
rationale). The per-tile halo-exchange variant (self-join on the 8
block-neighborhood) is the plan for single giant rasters — implemented
as `halo_join` here and usable by any stencil op.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


# ---------------------------------------------------------------------------
# FillNoData
# ---------------------------------------------------------------------------

_DIRS8 = [(1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1)]


def fillnodata(arr: np.ndarray, valid: np.ndarray, max_distance: int = 100,
               smoothing: int = 0) -> np.ndarray:
    """Inverse-distance fill from the nearest valid pixel along 8 search
    directions (GDALFillNodata shape). Uniform neighborhoods fill exactly
    to the uniform value (golden 128-patch)."""
    h, w = arr.shape
    out = arr.astype(np.float64).copy()
    vals = np.zeros((8, h, w), dtype=np.float64)
    dist = np.full((8, h, w), np.inf)

    arr64 = arr.astype(np.float64)
    invalid = ~valid
    for k, (dx, dy) in enumerate(_DIRS8):
        v = np.where(valid, arr64, np.nan)
        d = np.where(valid, 0.0, np.inf)
        step = math.hypot(dx, dy)
        src_y = slice(max(-dy, 0), h - max(dy, 0))
        dst_y = slice(max(dy, 0), h - max(-dy, 0))
        src_x = slice(max(-dx, 0), w - max(dx, 0))
        dst_x = slice(max(dx, 0), w - max(-dx, 0))
        # propagate along the direction, max_distance steps; work only
        # on the shifted sub-window (the previous full-frame sv/sd
        # temporaries allocated 6 area-sized arrays per step, r4)
        for it in range(max_distance):
            cand_v = v[src_y, src_x].copy()  # copy: src/dst overlap
            cand_d = d[src_y, src_x] + step
            dv = d[dst_y, dst_x]
            better = cand_d < dv
            if not better.any():
                # fixed point: along one direction each pixel's distance
                # is set exactly once (single upstream path), so a no-
                # update pass means every reachable pixel is final. The
                # previous test — every invalid pixel finite — never
                # fired when a border-adjacent hole had no valid pixel
                # upstream in this direction (d stays inf), silently
                # running all max_distance passes (round 5c: 7x on 30%-
                # hole tiles).
                break
            v[dst_y, dst_x][better] = cand_v[better]
            dv[better] = cand_d[better]
        vals[k] = np.nan_to_num(v)
        dist[k] = d

    need = ~valid
    wsum = np.zeros((h, w))
    vsum = np.zeros((h, w))
    for k in range(8):
        ok = np.isfinite(dist[k]) & (dist[k] <= max_distance) & (dist[k] > 0)
        wgt = np.where(ok, 1.0 / np.maximum(dist[k], 1e-9), 0.0)
        wsum += wgt
        vsum += wgt * vals[k]
    filled = need & (wsum > 0)
    out[filled] = vsum[filled] / wsum[filled]

    for _ in range(smoothing):
        sm = out.copy()
        acc = np.zeros((h, w))
        cnt = np.zeros((h, w))
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ys = slice(max(dy, 0), h + min(dy, 0))
                yd = slice(max(-dy, 0), h + min(-dy, 0))
                xs = slice(max(dx, 0), w + min(dx, 0))
                xd = slice(max(-dx, 0), w + min(-dx, 0))
                acc[yd, xd] += out[ys, xs]
                cnt[yd, xd] += 1
        sm[filled] = (acc / cnt)[filled]
        out = sm
    if np.issubdtype(arr.dtype, np.integer):
        info = np.iinfo(arr.dtype)
        return np.clip(np.floor(out + 0.5), info.min, info.max).astype(arr.dtype)
    return out.astype(arr.dtype)


# ---------------------------------------------------------------------------
# Nearblack
# ---------------------------------------------------------------------------

def nearblack(arr: np.ndarray, near: int = 15, white: bool = False) -> np.ndarray:
    """Flood border-connected pixels within `near` of black (or white) to
    the pure value (gdal_nearblack semantics)."""
    target = 255 if white else 0
    h, w = arr.shape
    closeto = (np.abs(arr.astype(np.int32) - target) <= near)
    # BFS flood from image borders over `closeto` pixels
    mask = np.zeros((h, w), dtype=bool)
    stack = []
    for x in range(w):
        if closeto[0, x]:
            stack.append((0, x))
        if closeto[h - 1, x]:
            stack.append((h - 1, x))
    for y in range(h):
        if closeto[y, 0]:
            stack.append((y, 0))
        if closeto[y, w - 1]:
            stack.append((y, w - 1))
    while stack:
        y, x = stack.pop()
        if mask[y, x]:
            continue
        mask[y, x] = True
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            yy, xx = y + dy, x + dx
            if 0 <= yy < h and 0 <= xx < w and closeto[yy, xx] and not mask[yy, xx]:
                stack.append((yy, xx))
    out = arr.copy()
    out[mask] = target
    return out


# ---------------------------------------------------------------------------
# Dem (hillshade / slope, Horn 3x3)
# ---------------------------------------------------------------------------

def dem_slope(arr: np.ndarray, cell_size: float = 1.0, scale: float = 1.0,
              alg: str = "Horn") -> np.ndarray:
    """Slope in degrees; edge pixels set to 0 (GDAL writes nodata 0 at
    edges — golden godal_test.go:5243-5359)."""
    a = arr.astype(np.float64)
    h, w = a.shape
    out = np.zeros((h, w), dtype=np.float64)
    z = a
    # Horn kernel on the interior
    dzdx = ((z[:-2, 2:] + 2 * z[1:-1, 2:] + z[2:, 2:])
            - (z[:-2, :-2] + 2 * z[1:-1, :-2] + z[2:, :-2])) / (8 * cell_size * scale)
    dzdy = ((z[2:, :-2] + 2 * z[2:, 1:-1] + z[2:, 2:])
            - (z[:-2, :-2] + 2 * z[:-2, 1:-1] + z[:-2, 2:])) / (8 * cell_size * scale)
    out[1:-1, 1:-1] = np.degrees(np.arctan(np.hypot(dzdx, dzdy)))
    return out


def dem_hillshade(arr: np.ndarray, azimuth: float = 315.0, altitude: float = 45.0,
                  cell_size: float = 1.0, z_factor: float = 1.0) -> np.ndarray:
    """Hillshade 1..255 interior, 0 at edges (GDAL convention)."""
    a = arr.astype(np.float64) * z_factor
    h, w = a.shape
    out = np.zeros((h, w), dtype=np.float64)
    z = a
    dzdx = ((z[:-2, 2:] + 2 * z[1:-1, 2:] + z[2:, 2:])
            - (z[:-2, :-2] + 2 * z[1:-1, :-2] + z[2:, :-2])) / (8 * cell_size)
    dzdy = ((z[2:, :-2] + 2 * z[2:, 1:-1] + z[2:, 2:])
            - (z[:-2, :-2] + 2 * z[:-2, 1:-1] + z[:-2, 2:])) / (8 * cell_size)
    slope = np.arctan(np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    az = math.radians(360.0 - azimuth + 90.0)
    alt = math.radians(altitude)
    shade = (np.sin(alt) * np.cos(slope)
             + np.cos(alt) * np.sin(slope) * np.cos(az - aspect))
    out[1:-1, 1:-1] = np.clip(1.0 + 254.0 * np.maximum(shade, 0.0), 1, 255)
    return np.floor(out + 0.5).astype(np.uint8)


def _horn_gradients(a: np.ndarray, cell_size: float = 1.0):
    """Interior Horn 3x3 (dzdx, dzdy) — shared by slope/hillshade/aspect."""
    z = a
    dzdx = ((z[:-2, 2:] + 2 * z[1:-1, 2:] + z[2:, 2:])
            - (z[:-2, :-2] + 2 * z[1:-1, :-2] + z[2:, :-2])) / (8 * cell_size)
    dzdy = ((z[2:, :-2] + 2 * z[2:, 1:-1] + z[2:, 2:])
            - (z[:-2, :-2] + 2 * z[:-2, 1:-1] + z[:-2, 2:])) / (8 * cell_size)
    return dzdx, dzdy


def dem_aspect(arr: np.ndarray, flat_nodata: float = -9999.0) -> np.ndarray:
    """Aspect in degrees clockwise from north (gdaldem aspect formula,
    godal.go:4099-4127 pass-through). Edges and flat cells → flat_nodata
    (GDAL's default without -compute_edges / -zero_for_flat)."""
    a = arr.astype(np.float64)
    h, w = a.shape
    out = np.full((h, w), flat_nodata, dtype=np.float64)
    dzdx, dzdy = _horn_gradients(a)
    asp = np.degrees(np.arctan2(dzdy, -dzdx))
    asp = np.where(asp > 90.0, 450.0 - asp, 90.0 - asp)
    asp = np.where(asp == 360.0, 0.0, asp)
    flat = (dzdx == 0) & (dzdy == 0)
    out[1:-1, 1:-1] = np.where(flat, flat_nodata, asp)
    return out


def _neighbors(a: np.ndarray):
    """The 8 interior-neighborhood views (N, S, E, W + diagonals)."""
    return [a[:-2, :-2], a[:-2, 1:-1], a[:-2, 2:],
            a[1:-1, :-2], a[1:-1, 2:],
            a[2:, :-2], a[2:, 1:-1], a[2:, 2:]]


def dem_tri(arr: np.ndarray, alg: str = "Riley") -> np.ndarray:
    """Terrain Ruggedness Index; Riley (default, gdaldem >= 3.3):
    sqrt(sum (z_i - z_c)^2); Wilson: mean |z_i - z_c|. Edges 0."""
    a = arr.astype(np.float64)
    h, w = a.shape
    out = np.zeros((h, w), dtype=np.float64)
    c = a[1:-1, 1:-1]
    diffs = [n - c for n in _neighbors(a)]
    if alg.lower() == "riley":
        out[1:-1, 1:-1] = np.sqrt(sum(d * d for d in diffs))
    elif alg.lower() == "wilson":
        out[1:-1, 1:-1] = sum(np.abs(d) for d in diffs) / 8.0
    else:
        raise ValueError(f"dem tri: unknown alg {alg!r}")
    return out


def dem_tpi(arr: np.ndarray) -> np.ndarray:
    """Topographic Position Index: z_center − mean(8 neighbors). Edges 0."""
    a = arr.astype(np.float64)
    h, w = a.shape
    out = np.zeros((h, w), dtype=np.float64)
    out[1:-1, 1:-1] = a[1:-1, 1:-1] - sum(_neighbors(a)) / 8.0
    return out


def dem_roughness(arr: np.ndarray) -> np.ndarray:
    """Roughness: max − min over the 3x3 window. Edges 0."""
    a = arr.astype(np.float64)
    h, w = a.shape
    out = np.zeros((h, w), dtype=np.float64)
    win = _neighbors(a) + [a[1:-1, 1:-1]]
    out[1:-1, 1:-1] = np.maximum.reduce(win) - np.minimum.reduce(win)
    return out


def dem_color_relief(arr: np.ndarray, ramp: list[tuple[float, int, int, int]],
                     interpolate: bool = True) -> np.ndarray:
    """Elevation → RGB via a color ramp (gdaldem color-relief):
    ramp = [(elev, r, g, b), ...]; linear interpolation between stops by
    default, nearest-below ('-exact_color_entry'-style stepping) when
    interpolate=False. Below/above the ramp clamps to the end stops."""
    if not ramp:
        raise ValueError("color-relief: empty ramp")
    ramp = sorted(ramp)
    elevs = np.array([r[0] for r in ramp], dtype=np.float64)
    cols = np.array([r[1:4] for r in ramp], dtype=np.float64)
    a = arr.astype(np.float64)
    out = np.empty(a.shape + (3,), dtype=np.uint8)
    idx = np.searchsorted(elevs, a, side="right") - 1
    idx = np.clip(idx, 0, len(ramp) - 1)
    if not interpolate or len(ramp) == 1:
        out[:] = cols[idx].astype(np.uint8)
        return out
    nxt = np.clip(idx + 1, 0, len(ramp) - 1)
    span = elevs[nxt] - elevs[idx]
    t = np.where(span > 0, (a - elevs[idx]) / np.where(span > 0, span, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    mixed = cols[idx] + t[..., None] * (cols[nxt] - cols[idx])
    return np.floor(mixed + 0.5).astype(np.uint8)


# ---------------------------------------------------------------------------
# Viewshed
# ---------------------------------------------------------------------------

def viewshed_ref(dem: np.ndarray, ox: int, oy: int, oz: float = 0.0) -> np.ndarray:
    """Wang reference-plane viewshed: per-cell minimum observable height
    (relative to the DEM datum) from observer at (ox, oy, dem+oz).

    Recurrence pinned cell-for-cell by godal_test.go:4472-4592:
      ring 1:            ref = z (adjacent cells always visible)
      on-axis/diagonal:  ref = prop(prev) * r / (r - 1)
      edge cells:        ref = (Za*j + Zb*(i-j)) / (i-1)   [i=major dist,
                         j=minor dist, Za=prop(major-1, minor),
                         Zb=prop(major-1, minor-1 toward observer)]
    where prop(cell) = max(z, ref) propagates occlusion outward.
    Heights are relative to the observer eye, converted back on return.
    """
    h, w = dem.shape
    z = dem.astype(np.float64) - (dem[oy, ox] + oz)
    ref = np.zeros((h, w), dtype=np.float64)
    prop = np.zeros((h, w), dtype=np.float64)
    ref[oy, ox] = z[oy, ox]
    prop[oy, ox] = z[oy, ox]
    max_r = max(ox, w - 1 - ox, oy, h - 1 - oy)
    # ring r cells read ONLY ring r-1 (za/zb/prev neighbors all have
    # Chebyshev radius r-1), so each ring vectorizes as one numpy batch
    # — same per-cell float ops as the original per-pixel loop
    # (bit-equal; goldens pinned), O(max_r) Python iterations instead of
    # O(area): 256^2 went 0.9 s → 8 ms (round 4)
    for r in range(1, max_r + 1):
        side = np.arange(-r, r + 1, dtype=np.int64)
        inner = side[1:-1]
        dx = np.concatenate([side, side,
                             np.full(inner.size, -r), np.full(inner.size, r)])
        dy = np.concatenate([np.full(side.size, -r), np.full(side.size, r),
                             inner, inner])
        x = ox + dx
        y = oy + dy
        inb = (x >= 0) & (x < w) & (y >= 0) & (y < h)
        if not inb.any():
            continue
        dx, dy, x, y = dx[inb], dy[inb], x[inb], y[inb]
        sx = np.sign(dx)
        sy = np.sign(dy)
        if r == 1:
            rv = z[y, x]
        else:
            adx, ady = np.abs(dx), np.abs(dy)
            j = np.minimum(adx, ady).astype(np.float64)
            prev = prop[y - sy, x - sx]
            rv = prev * r / (r - 1)
            off = (dx != 0) & (dy != 0) & (adx != ady)
            if off.any():
                horiz = adx > ady
                za = np.where(horiz, prop[y, x - sx], prop[y - sy, x])
                zb = prev
                rv_off = (za * j + zb * (r - j)) / (r - 1)
                rv = np.where(off, rv_off, rv)
        ref[y, x] = rv
        prop[y, x] = np.maximum(z[y, x], rv)
    return ref + (dem[oy, ox] + oz)


def viewshed(dem: np.ndarray, ox: int, oy: int, oz: float = 0.0,
             mode: str = "normal", visible_val: int = 127,
             invisible_val: int = 0, out_dtype=np.int8) -> np.ndarray:
    """Band.Viewshed (godal.go:4188-4219). Modes:
      normal → visible_val where z ≥ observable else invisible_val;
      dem    → max(0, observable)            (MinTargetHeightFromDem);
      ground → max(0, observable - z)        (MinTargetHeightFromGround).
    """
    obs = viewshed_ref(dem, ox, oy, oz)
    z = dem.astype(np.float64)
    if mode == "normal":
        return np.where(z >= obs, visible_val, invisible_val).astype(out_dtype)
    if mode == "dem":
        return np.maximum(0.0, obs)
    if mode == "ground":
        return np.maximum(0.0, obs - z)
    raise ValueError(f"viewshed mode {mode!r}")


# ---------------------------------------------------------------------------
# Grid (scattered points → raster)
# ---------------------------------------------------------------------------

def grid_create(alg: str, px: np.ndarray, py: np.ndarray, pz: np.ndarray,
                out_w: int, out_h: int, minx: float, maxx: float,
                miny: float, maxy: float, **kw) -> np.ndarray:
    """GDALGridCreate work-alike. Output row 0 is the MAX-Y row scanning
    downward when ymin>ymax is passed swapped by the caller; here the
    convention matches godal's GridCreate golden: sample (col,row) maps
    to x = minx + (col+0.5)*(maxx-minx)/w, y = miny + (row+0.5)*...
    (half-pixel centers — the 0.00390625 = 1/256 offset golden,
    godal_test.go:4264-4276)."""
    xs = minx + (np.arange(out_w) + 0.5) * (maxx - minx) / out_w
    ys = miny + (np.arange(out_h) + 0.5) * (maxy - miny) / out_h
    gx, gy = np.meshgrid(xs, ys)
    return _grid_eval(alg, px, py, pz, gx, gy, **kw)


def _grid_eval(alg: str, px, py, pz, gx: np.ndarray, gy: np.ndarray,
               **kw) -> np.ndarray:
    """Evaluate a grid algorithm on explicit sample-center arrays —
    shared by the whole-array grid_create and the tile-windowed
    grid_tiles (windows pass centers from the SAME global half-pixel
    formula, so tiled output is bit-equal to the single array)."""
    alg = alg.split(":")[0].lower()
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    pz = np.asarray(pz, dtype=np.float64)

    if alg == "linear":
        return _grid_linear(px, py, pz, gx, gy)

    # bound the nodes×points temporaries: chunk the node axis so the
    # distance matrix stays ~32 MB — every alg below reduces along the
    # points axis per node, so chunking is exact (round 5c: the
    # unchunked 16k-node × 2k-point case built five 260 MB temps)
    if alg != "average_distance_pts" and gx.size * max(px.size, 1) > 4_000_000 \
            and gx.size > 1:
        gxf, gyf = gx.ravel(), gy.ravel()
        step = max(1, 4_000_000 // max(px.size, 1))
        parts = [_grid_eval(alg, px, py, pz, gxf[i:i + step],
                            gyf[i:i + step], **kw)
                 for i in range(0, gxf.size, step)]
        return np.concatenate(parts).reshape(gx.shape)

    d2 = ((gx[..., None] - px) ** 2 + (gy[..., None] - py) ** 2)
    radius = kw.get("radius", 0.0)
    if radius:
        inr = d2 <= radius * radius
    else:
        inr = np.ones_like(d2, dtype=bool)

    if alg in ("maximum", "minimum", "range", "count", "average",
               "average_distance", "average_distance_pts"):
        zz = np.broadcast_to(pz, d2.shape)
        masked = np.where(inr, zz, np.nan)
        if alg == "maximum":
            return np.nanmax(masked, axis=-1)
        if alg == "minimum":
            return np.nanmin(masked, axis=-1)
        if alg == "range":
            return np.nanmax(masked, axis=-1) - np.nanmin(masked, axis=-1)
        if alg == "count":
            return inr.sum(axis=-1).astype(np.float64)
        if alg == "average":
            return np.nanmean(masked, axis=-1)
        if alg == "average_distance":
            return np.nanmean(np.where(inr, np.sqrt(d2), np.nan), axis=-1)
        if alg == "average_distance_pts":
            # GDAL GDALGridAverageDistancePts (gridAlgFromString,
            # godal.go:1776-1803): mean PAIRWISE distance between the
            # points inside each node's search radius; 0 when < 2 points
            pd = np.sqrt((px[:, None] - px[None, :]) ** 2
                         + (py[:, None] - py[None, :]) ** 2)
            out = np.zeros(gx.shape, dtype=np.float64)
            flat_in = inr.reshape(-1, len(px))
            flat_out = out.reshape(-1)
            iu = np.triu_indices(len(px), k=1)
            for node in range(flat_in.shape[0]):
                m = flat_in[node]
                if m.sum() < 2:
                    continue
                pair_mask = m[iu[0]] & m[iu[1]]
                if pair_mask.any():
                    flat_out[node] = pd[iu][pair_mask].mean()
            return out
    if alg == "nearest":
        return pz[np.argmin(d2, axis=-1)]
    if alg in ("invdist", "invdistnn"):
        power = kw.get("power", 2.0)
        if power == 2.0:  # default: d2 ** 1 — skip the pow call
            w8 = 1.0 / np.maximum(d2, 1e-300)
        else:
            w8 = 1.0 / np.maximum(d2 ** (power / 2), 1e-300)
        w8 = np.where(inr, w8, 0.0)
        exact = d2 < 1e-24
        out = (w8 * pz).sum(axis=-1) / np.maximum(w8.sum(axis=-1), 1e-300)
        if exact.any():
            idx = np.argmin(d2, axis=-1)
            out = np.where(exact.any(axis=-1), pz[idx], out)
        return out
    raise ValueError(f"unknown grid alg {alg!r}")


def _delaunay(pts: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer–Watson Delaunay triangulation (deterministic insertion in
    input order; cocircular ties resolve by insertion order like qhull's
    joggled input — pinned by the 4-corner grid golden).

    Round 5c kernel audit: the per-insertion Python passes — seed scan
    over every live triangle, full edge_map rebuild, full-list filter —
    were O(n) heavy-Python each, O(n²) overall (127 s at 4,000 points).
    The live set now keeps cached per-triangle geometry in growing
    numpy arrays so the containing-triangle seed search and the
    incircle carve test are vectorized, and the edge→triangle map is
    maintained incrementally (O(carved) per insertion). The carve
    closure is a SET (order-independent), so the produced triangle SET
    is identical to the reference loop — pinned by a differential test
    and the corner goldens."""
    n = len(pts)
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    r = max(np.abs(pts[:, 0] - cx).max(), np.abs(pts[:, 1] - cy).max(), 1.0) * 64
    sup = np.array([[cx - 2 * r, cy - r], [cx + 2 * r, cy - r], [cx, cy + 2 * r]])
    allp = np.vstack([pts, sup])
    S0, S1, S2 = n, n + 1, n + 2

    # growing triangle store: vertex ids + cached barycentric geometry
    # per triangle (for the vectorized seed search); `alive` masks
    # carved entries
    cap = max(16, 4 * n)
    tv = np.empty((cap, 3), dtype=np.int64)        # vertex ids
    det_c = np.empty(cap)                          # barycentric det
    bc1 = np.empty((cap, 2))                       # l1 row: (by-cy, cx-bx)
    bc2 = np.empty((cap, 2))                       # l2 row: (cy-ay, ax-cx)
    cxy = np.empty((cap, 2))                       # vertex C coords
    alive = np.zeros(cap, dtype=bool)
    ntri = 0

    def add_tri(a, b, c):
        nonlocal ntri, cap, tv, det_c, bc1, bc2, cxy, alive
        if ntri == cap:
            cap *= 2
            tv = np.resize(tv, (cap, 3))
            det_c = np.resize(det_c, cap)
            bc1 = np.resize(bc1, (cap, 2))
            bc2 = np.resize(bc2, (cap, 2))
            cxy = np.resize(cxy, (cap, 2))
            na = np.zeros(cap, dtype=bool)
            na[:ntri] = alive[:ntri]
            alive = na
        i = ntri
        ntri += 1
        tv[i] = (a, b, c)
        A, B, C = allp[a], allp[b], allp[c]
        cxy[i] = C
        det_c[i] = (B[1] - C[1]) * (A[0] - C[0]) + (C[0] - B[0]) * (A[1] - C[1])
        bc1[i] = (B[1] - C[1], C[0] - B[0])
        bc2[i] = (C[1] - A[1], A[0] - C[0])
        alive[i] = True
        for e in ((a, b), (b, c), (c, a)):
            edge_map.setdefault((min(e), max(e)), []).append(i)

    edge_map: dict[tuple[int, int], list] = {}
    add_tri(S0, S1, S2)

    def incircle_exact(i, p):
        """Reference-identical incircle: +1 inside, 0 cocircular within
        the scale-relative eps, -1 outside."""
        a, b, c = tv[i]
        ax2, ay2 = allp[a]
        bx2, by2 = allp[b]
        cx2, cy2 = allp[c]
        px_, py_ = allp[p]
        m = np.array([
            [ax2 - px_, ay2 - py_, (ax2 - px_) ** 2 + (ay2 - py_) ** 2],
            [bx2 - px_, by2 - py_, (bx2 - px_) ** 2 + (by2 - py_) ** 2],
            [cx2 - px_, cy2 - py_, (cx2 - px_) ** 2 + (cy2 - py_) ** 2],
        ])
        orient = (bx2 - ax2) * (cy2 - ay2) - (by2 - ay2) * (cx2 - ax2)
        det = float(np.linalg.det(m)) * (1.0 if orient >= 0 else -1.0)
        mag = float(np.abs(m[:, :2]).max()) or 1.0
        eps = 1e-12 * mag ** 4
        if det > eps:
            return 1
        if det < -eps:
            return -1
        return 0

    for p in range(n):
        P = allp[p]
        # vectorized containing-triangle seed search over live triangles
        live = np.nonzero(alive[:ntri])[0]
        dets = det_c[live]
        ok = np.abs(dets) >= 1e-30
        dx = P[0] - cxy[live, 0]
        dy = P[1] - cxy[live, 1]
        with np.errstate(divide="ignore", invalid="ignore"):
            l1 = (bc1[live, 0] * dx + bc1[live, 1] * dy) / dets
            l2 = (bc2[live, 0] * dx + bc2[live, 1] * dy) / dets
        inside = ok & (l1 >= -1e-12) & (l2 >= -1e-12) \
            & ((1 - l1 - l2) >= -1e-12)
        seed = live[inside]
        if seed.size == 0:
            continue
        bad_set = set(int(s) for s in seed)
        frontier = list(bad_set)
        while frontier:
            t = frontier.pop()
            a, b, c = tv[t]
            for e in ((a, b), (b, c), (c, a)):
                for nb in edge_map[(min(e), max(e))]:
                    if nb not in bad_set and alive[nb] \
                            and incircle_exact(nb, p) >= 0:
                        bad_set.add(nb)
                        frontier.append(nb)
        # polygon boundary of the bad-triangle union
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad_set:
            a, b, c = tv[t]
            for e in ((a, b), (b, c), (c, a)):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        boundary = [e for e, cnt in edge_count.items() if cnt == 1]
        for t in bad_set:
            alive[t] = False
            a, b, c = tv[t]
            for e in ((a, b), (b, c), (c, a)):
                key = (min(e), max(e))
                lst = edge_map[key]
                lst.remove(t)
                if not lst:
                    del edge_map[key]
        for e in boundary:
            add_tri(e[0], e[1], p)
    return [tuple(int(v) for v in tv[i])
            for i in np.nonzero(alive[:ntri])[0] if tv[i].max() < n]


def _grid_linear(px, py, pz, gx, gy):
    """Barycentric interpolation over the Delaunay triangulation (GDAL's
    linear alg; golden corner values incl. the 1/256 half-pixel offset,
    godal_test.go:4279-4332).

    Round 5c: on a REGULAR grid (the only shape grid_create/grid_tiles
    produce) each triangle tests only the node-index window of its
    tolerance-padded bbox instead of every node — total work O(covered
    nodes), not O(tris × nodes). Claim order per node is unchanged
    (same triangle list order, same test), so assignment is identical:
    the pad is ≥ tol·|det| / min row-gradient, the geometric distance
    at which the relaxed barycentric test could still pass. Irregular
    node sets fall back to the full scan."""
    pts = np.stack([px, py], axis=1)
    tris = _delaunay(pts)
    gxf, gyf = gx.ravel(), gy.ravel()
    res = np.full(gxf.shape, np.nan)

    # regular-grid detection: gxf tiles xs, gyf repeats ys
    xs = np.unique(gxf)
    ys = np.unique(gyf)
    regular = (xs.size * ys.size == gxf.size
               and np.array_equal(gxf, np.tile(xs, ys.size))
               and np.array_equal(gyf, np.repeat(ys, xs.size)))

    # two passes: exact assignment, then a relaxed pass that catches
    # points sitting on shared edges where fp noise makes both triangles
    # report "slightly outside" (both give the same plane value there)
    for tol in (1e-12, 1e-7):
        for t in tris:
            a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
            det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
            if abs(det) < 1e-30:
                continue
            if regular:
                g1 = np.hypot(b[1] - c[1], c[0] - b[0])
                g2 = np.hypot(c[1] - a[1], a[0] - c[0])
                g3 = np.hypot(a[1] - b[1], b[0] - a[0])
                pad = tol * abs(det) / max(min(g1, g2, g3), 1e-300)
                x0 = np.searchsorted(xs, min(a[0], b[0], c[0]) - pad)
                x1 = np.searchsorted(xs, max(a[0], b[0], c[0]) + pad, "right")
                y0 = np.searchsorted(ys, min(a[1], b[1], c[1]) - pad)
                y1 = np.searchsorted(ys, max(a[1], b[1], c[1]) + pad, "right")
                if x0 >= x1 or y0 >= y1:
                    continue
                iy, ix = np.meshgrid(np.arange(y0, y1), np.arange(x0, x1),
                                     indexing="ij")
                sel = (iy * xs.size + ix).ravel()
                wx, wy = gxf[sel], gyf[sel]
            else:
                sel = slice(None)
                wx, wy = gxf, gyf
            l1 = ((b[1] - c[1]) * (wx - c[0]) + (c[0] - b[0]) * (wy - c[1])) / det
            l2 = ((c[1] - a[1]) * (wx - c[0]) + (a[0] - c[0]) * (wy - c[1])) / det
            l3 = 1 - l1 - l2
            inside = (l1 >= -tol) & (l2 >= -tol) & (l3 >= -tol) \
                & np.isnan(res[sel])
            if inside.any():
                vals = l1 * pz[t[0]] + l2 * pz[t[1]] + l3 * pz[t[2]]
                if isinstance(sel, slice):
                    res[inside] = vals[inside]
                else:
                    res[sel[inside]] = vals[inside]
        if not np.isnan(res).any():
            break
    return res.reshape(gx.shape)


# ---------------------------------------------------------------------------
# halo join: tile + 8-neighbor margins (the giant-raster stencil plan)
# ---------------------------------------------------------------------------

def halo_join(tiles: DataFrame) -> DataFrame:
    """Self-join tiles with their 8 block-neighbors: output rows
    (image_id, band, block_x, block_y, n_dx, n_dy, neighbor payload...).
    Stencil ops gather the margins they need from the neighbor rows.
    One shuffle on (image_id, band, block ids)."""
    neigh = tiles.select(
        "image_id", "band",
        F.col("block_x").alias("nbx"), F.col("block_y").alias("nby"),
        F.col("payload").alias("n_payload"), F.col("bw").alias("n_bw"),
        F.col("bh").alias("n_bh"), F.col("dtype").alias("n_dtype"))
    dx = F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("n_dx")
    dy = F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("n_dy")
    expanded = tiles.select("*", dx).select("*", dy)
    cond = ((expanded.image_id == neigh.image_id) & (expanded.band == neigh.band)
            & (expanded.block_x + expanded.n_dx == neigh.nbx)
            & (expanded.block_y + expanded.n_dy == neigh.nby))
    return expanded.join(neigh, cond, "inner") \
        .drop(neigh.image_id).drop(neigh.band)


# ---------------------------------------------------------------------------
# Spark runners: per-image kernel + distributed grid
# ---------------------------------------------------------------------------

def image_kernel_pixels(images: DataFrame, fn,
                        probes: list[tuple[int, int]] | None = None) -> DataFrame:
    """Run a whole-image numpy kernel per image row ON THE WORKERS (the
    per-image stencil shape documented in the module header) and emit
    per-pixel rows (image_id, y, x, value).

    `fn(arr) -> 2-D array` runs once per image inside an Arrow-batched
    mapInPandas stage — pixels cross JVM<->Python once, images stay
    distributed (one task can hold many images; a 1000-executor run
    spreads the catalog by partition).

    `probes` (list of (y, x)) pushes a pixel-coordinate filter INTO the
    kernel stage so only the probed pixels cross Arrow — use it when the
    caller needs a handful of samples from a large kernel output (the
    equivalent of a projection pushdown for pixel data).
    """
    from godal_spark.functions import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode(r.bytes, r.fmt, r.w, r.h)
                if arr.ndim == 3:
                    arr = arr[:, :, 0]
                res = np.asarray(fn(arr), dtype=np.float64)
                if probes is not None:
                    ys = np.array([p[0] for p in probes], np.int32)
                    xs = np.array([p[1] for p in probes], np.int32)
                    vals = res[ys, xs]
                else:
                    h, w = res.shape
                    yy, xx = np.mgrid[0:h, 0:w]
                    ys = yy.ravel().astype(np.int32)
                    xs = xx.ravel().astype(np.int32)
                    vals = res.ravel()
                # numpy columns straight into the frame — no per-pixel
                # boxed Python objects in the hot stage
                frames.append(pd.DataFrame(
                    {"image_id": np.repeat(r.image_id, len(ys)),
                     "y": ys, "x": xs, "value": vals}))
            yield (pd.concat(frames) if frames else pd.DataFrame(
                {"image_id": [], "y": [], "x": [], "value": []}))

    return images.mapInPandas(
        run, schema="image_id string, y int, x int, value double")


def grid_tiles(spark: SparkSession, alg: str, px, py, pz,
               out_w: int, out_h: int, minx: float, maxx: float,
               miny: float, maxy: float, block: int = 256,
               **kw) -> DataFrame:
    """Distributed GridCreate (godal.go:4001-4084 semantics): the target
    raster is split into block x block windows enumerated by spark.range
    (codegen — never a driver-side tile list); each task evaluates the
    grid kernel on its window against the BROADCAST point set.

    Scale shape: scattered points are the small side (broadcast once);
    the output grid is the big side (one embarrassingly-parallel task
    per tile, zero shuffles). Window sample centers use the same global
    half-pixel formula as grid_create, so the tiled output is bit-equal
    to the single-array kernel (pinned by the oracle-gate probes).
    Returns per-pixel rows (y, x, value).
    """
    nbx = -(-out_w // block)
    nby = -(-out_h // block)
    bpts = spark.sparkContext.broadcast(
        (np.asarray(px, np.float64), np.asarray(py, np.float64),
         np.asarray(pz, np.float64)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ppx, ppy, ppz = bpts.value
        for pdf in batches:
            frames = []
            for tid in pdf["id"].tolist():
                bx, by = int(tid) % nbx, int(tid) // nbx
                x0, x1 = bx * block, min((bx + 1) * block, out_w)
                y0, y1 = by * block, min((by + 1) * block, out_h)
                xs = minx + (np.arange(x0, x1) + 0.5) * (maxx - minx) / out_w
                ys = miny + (np.arange(y0, y1) + 0.5) * (maxy - miny) / out_h
                gx, gy = np.meshgrid(xs, ys)
                res = _grid_eval(alg, ppx, ppy, ppz, gx, gy, **kw)
                yy, xx = np.mgrid[y0:y1, x0:x1]
                frames.append(pd.DataFrame(
                    {"y": yy.ravel().astype(np.int32),
                     "x": xx.ravel().astype(np.int32),
                     "value": res.ravel().astype(np.float64)}))
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"y": [], "x": [], "value": []})

    n_tiles = nbx * nby
    grid = spark.range(0, n_tiles, 1, min(n_tiles, 32))
    return grid.mapInPandas(run, schema="y int, x int, value double")
