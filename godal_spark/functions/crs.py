"""CRS transforms + affine geotransform math (pyproj/OSR stand-in).

The reference wraps OSR (reference srs.go, godal.go:2044-2233). This
environment has no PROJ, so the engine implements the transforms its
operator surface actually exercises, from public formulas:

  * EPSG:4326 (lon/lat, WGS84) <-> EPSG:3857 (spherical Web Mercator)
  * EPSG:4326 <-> UTM zones EPSG:326xx / 327xx (Transverse Mercator,
    Krüger series — standard published expansion)
  * the GDAL affine geotransform [x0, dx, rx, y0, ry, dy] pixel<->geo
    mapping and corner-based bounds reprojection (reference
    srs.go:74-106: corners only, no edge densification — documented
    quirk preserved).

All functions are vectorized over numpy arrays (batch point transform =
reference Transform.TransformEx, godal.go:2151-2233 — per-point success
flags; out-of-domain latitudes fail, godal_test.go:1767-1776).
"""

from __future__ import annotations

import math

import numpy as np

R = 6378137.0  # WGS84 semi-major (spherical mercator radius)
F = 1 / 298.257223563
E2 = F * (2 - F)
MAX_MERC_LAT = 85.051128779806604


def _parse_epsg(srs: str) -> int:
    s = srs.strip().upper()
    if s.startswith("EPSG:"):
        return int(s[5:])
    return int(s)


def transform_points(xs, ys, src: str, dst: str):
    """(x', y', ok) batch transform. ok mirrors godal's per-point success
    flags: False where input is out of the source CRS domain."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    s, d = _parse_epsg(src), _parse_epsg(dst)
    if s == d:
        return xs.copy(), ys.copy(), np.ones(xs.shape, dtype=bool)
    lon, lat, ok = _to_4326(xs, ys, s)
    ox, oy, ok2 = _from_4326(lon, lat, d)
    return ox, oy, ok & ok2


def _to_4326(xs, ys, epsg: int):
    ok = np.ones(xs.shape, dtype=bool)
    if epsg == 4326:
        ok &= (np.abs(xs) <= 180.0) & (np.abs(ys) <= 90.0)
        return xs, ys, ok
    if epsg == 3857:
        lon = xs / R * 180.0 / math.pi
        lat = (2.0 * np.arctan(np.exp(ys / R)) - math.pi / 2.0) * 180.0 / math.pi
        return lon, lat, ok
    if 32601 <= epsg <= 32660 or 32701 <= epsg <= 32760:
        zone = epsg % 100
        south = epsg // 100 == 327
        lon, lat = _utm_to_ll(xs, ys, zone, south)
        return lon, lat, ok
    raise NotImplementedError(f"EPSG:{epsg} not supported (no PROJ in this env)")


def _from_4326(lon, lat, epsg: int):
    ok = (np.abs(lon) <= 360.0) & (np.abs(lat) <= 90.0)
    if epsg == 4326:
        return lon, lat, ok
    if epsg == 3857:
        ok = ok & (np.abs(lat) <= MAX_MERC_LAT)
        latc = np.clip(lat, -MAX_MERC_LAT, MAX_MERC_LAT)
        x = lon * math.pi / 180.0 * R
        y = R * np.log(np.tan(math.pi / 4.0 + latc * math.pi / 360.0))
        return x, y, ok
    if 32601 <= epsg <= 32660 or 32701 <= epsg <= 32760:
        zone = epsg % 100
        south = epsg // 100 == 327
        x, y = _ll_to_utm(lon, lat, zone, south)
        return x, y, ok
    raise NotImplementedError(f"EPSG:{epsg} not supported (no PROJ in this env)")


# --- Transverse Mercator (standard series, public formulas) ----------------

_K0 = 0.9996
_E4 = E2 * E2
_E6 = _E4 * E2


def _ll_to_utm(lon, lat, zone: int, south: bool):
    lon = np.asarray(lon, dtype=np.float64) * math.pi / 180.0
    lat = np.asarray(lat, dtype=np.float64) * math.pi / 180.0
    lon0 = math.radians((zone - 1) * 6 - 180 + 3)
    ep2 = E2 / (1 - E2)
    N = R_a / np.sqrt(1 - E2 * np.sin(lat) ** 2)
    T = np.tan(lat) ** 2
    C = ep2 * np.cos(lat) ** 2
    A = np.cos(lat) * (lon - lon0)
    M = R_a * ((1 - E2 / 4 - 3 * _E4 / 64 - 5 * _E6 / 256) * lat
               - (3 * E2 / 8 + 3 * _E4 / 32 + 45 * _E6 / 1024) * np.sin(2 * lat)
               + (15 * _E4 / 256 + 45 * _E6 / 1024) * np.sin(4 * lat)
               - (35 * _E6 / 3072) * np.sin(6 * lat))
    x = _K0 * N * (A + (1 - T + C) * A**3 / 6
                   + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120) + 500000.0
    y = _K0 * (M + N * np.tan(lat) * (A**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
               + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720))
    if south:
        y = y + 10000000.0
    return x, y


def _utm_to_ll(x, y, zone: int, south: bool):
    x = np.asarray(x, dtype=np.float64) - 500000.0
    y = np.asarray(y, dtype=np.float64)
    if south:
        y = y - 10000000.0
    lon0 = math.radians((zone - 1) * 6 - 180 + 3)
    ep2 = E2 / (1 - E2)
    M = y / _K0
    mu = M / (R_a * (1 - E2 / 4 - 3 * _E4 / 64 - 5 * _E6 / 256))
    e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    phi1 = (mu + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
            + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
            + (151 * e1**3 / 96) * np.sin(6 * mu)
            + (1097 * e1**4 / 512) * np.sin(8 * mu))
    C1 = ep2 * np.cos(phi1) ** 2
    T1 = np.tan(phi1) ** 2
    N1 = R_a / np.sqrt(1 - E2 * np.sin(phi1) ** 2)
    R1 = R_a * (1 - E2) / (1 - E2 * np.sin(phi1) ** 2) ** 1.5
    D = x / (N1 * _K0)
    lat = phi1 - (N1 * np.tan(phi1) / R1) * (
        D**2 / 2 - (5 + 3 * T1 + 10 * C1 - 4 * C1**2 - 9 * ep2) * D**4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1**2 - 252 * ep2 - 3 * C1**2) * D**6 / 720)
    lon = lon0 + (D - (1 + 2 * T1 + C1) * D**3 / 6
                  + (5 - 2 * C1 + 28 * T1 - 3 * C1**2 + 8 * ep2 + 24 * T1**2) * D**5 / 120) / np.cos(phi1)
    return lon * 180.0 / math.pi, lat * 180.0 / math.pi


R_a = 6378137.0  # WGS84 semi-major for TM series


# ---------------------------------------------------------------------------
# geotransform math (reference godal.go:866-896; bounds godal.go:761-795)
# ---------------------------------------------------------------------------

def pixel_to_geo(gt, px, py):
    """Pixel (col,row) → geo; gt = [x0, dx, rx, y0, ry, dy] (GDAL order)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    return gt[0] + px * gt[1] + py * gt[2], gt[3] + px * gt[4] + py * gt[5]


def geo_to_pixel(gt, gx, gy):
    """Inverse affine (general 2×2 inversion)."""
    gx = np.asarray(gx, dtype=np.float64) - gt[0]
    gy = np.asarray(gy, dtype=np.float64) - gt[3]
    det = gt[1] * gt[5] - gt[2] * gt[4]
    px = (gx * gt[5] - gy * gt[2]) / det
    py = (gy * gt[1] - gx * gt[4]) / det
    return px, py


def dataset_bounds(gt, w: int, h: int) -> tuple[float, float, float, float]:
    """Envelope of the 4 corners (handles rotation/negative dy)."""
    cx, cy = pixel_to_geo(gt, np.array([0, w, 0, w]), np.array([0, 0, h, h]))
    return float(cx.min()), float(cy.min()), float(cx.max()), float(cy.max())


def reproject_bounds(bounds, src: str, dst: str) -> tuple[float, float, float, float]:
    """Corner-only bounds reprojection (reference srs.go:74-106 — exactly
    the 4 corners, min/max; NO edge densification, quirk preserved)."""
    minx, miny, maxx, maxy = bounds
    xs = np.array([minx, maxx, minx, maxx])
    ys = np.array([miny, miny, maxy, maxy])
    ox, oy, ok = transform_points(xs, ys, src, dst)
    if not ok.all():
        raise ValueError("bounds corner out of CRS domain")
    return float(ox.min()), float(oy.min()), float(ox.max()), float(oy.max())


def fit_gcps(gcps) -> list[float]:
    """Least-squares affine geotransform from ground control points
    (reference godal.go:4404-4458; golden godal_test.go:5191-5241).
    gcps: iterable of (pixel, line, X, Y). Requires ≥3 non-degenerate."""
    g = np.asarray(list(gcps), dtype=np.float64)
    if len(g) < 3:
        raise ValueError("GCPsToGeoTransform requires >= 3 GCPs")
    A = np.stack([np.ones(len(g)), g[:, 0], g[:, 1]], axis=1)
    coef_x, res_x, rank_x, _ = np.linalg.lstsq(A, g[:, 2], rcond=None)
    coef_y, res_y, rank_y, _ = np.linalg.lstsq(A, g[:, 3], rcond=None)
    if rank_x < 3 or rank_y < 3:
        raise ValueError("degenerate GCPs: cannot fit affine")
    return [float(coef_x[0]), float(coef_x[1]), float(coef_x[2]),
            float(coef_y[0]), float(coef_y[1]), float(coef_y[2])]
