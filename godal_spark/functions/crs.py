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

DATUM SHIFTS: two tiers. (1) Modern geocentric datums (NAD83, ETRS89,
RGF93, GDA94, NZGD2000) are treated as ≡ WGS84 — exact to ~1-2 m
(NAD83) / ~0.7 m (ETRS89, drifting ~2.5 cm/yr), far below a tile pixel
at served zoom levels. (2) Classical datums get a TRUE Helmert
7-parameter position-vector transformation (EPSG method 9606, round 5):
OSGB36 (EPSG:27700) and Ireland 1965 (EPSG:29903) use the published
country-wide fits, accurate to ~2 m against the definitive grid
transformations (OSTN15 / OSi-OSNI), which require PROJ + grid files
this environment does not have. NOT survey-grade; adding a family is a
documented manual step (see _PROJ_REGISTRY below).

FORMULAIC EPSG RANGES (round 5b, epsg_to_proj4): whole national-grid
families resolve by rule into PROJ4 strings on the shared dispatch —
ETRS89 UTM 25828-38, NAD83 UTM 26901-23, NAD27 UTM 26701-22 (+4267),
ED50 UTM 23028-38 (+4230), GDA94 MGA 28348-58, GDA2020 MGA 7846-59,
WGS72 UTM 322xx/323xx, DHDN Gauss-Krüger 31466-69, Arctic-SDI LAEA
3571-76 (exact polar-aspect equations), UPS 5041/5042/32661/32761
(polar stereographic variant A, EPSG G7-2 worked example < 1 cm),
GDA94 Lambert 3112. Classical-datum members carry their standard
published towgs84 shifts (few-metre accuracy without regional grids).
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
    flags: False where input is out of the source CRS domain. src/dst
    are EPSG codes ('EPSG:4326' / '4326') or PROJ4 definition strings
    ('+proj=tmerc +lat_0=...' — see the proj4 subset note below)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    ssrc, sdst = src.strip(), dst.strip()

    def _is_defn(s: str) -> bool:
        return s.startswith("+") or s[:6].upper() in ("PROJCS", "GEOGCS")

    if _is_defn(ssrc) or _is_defn(sdst):
        if ssrc == sdst:
            return xs.copy(), ys.copy(), np.ones(xs.shape, dtype=bool)
        if _is_defn(ssrc):
            lon, lat = _proj4_pair(ssrc)[1](xs, ys)
            ok = np.isfinite(lon) & np.isfinite(lat)
        else:
            lon, lat, ok = _to_4326(xs, ys, _parse_epsg(ssrc))
        if _is_defn(sdst):
            ox, oy = _proj4_pair(sdst)[0](lon, lat)
            return ox, oy, ok & np.isfinite(ox) & np.isfinite(oy)
        ox, oy, ok2 = _from_4326(lon, lat, _parse_epsg(sdst))
        return ox, oy, ok & ok2
    s, d = _parse_epsg(ssrc), _parse_epsg(sdst)
    if s == d:
        return xs.copy(), ys.copy(), np.ones(xs.shape, dtype=bool)
    lon, lat, ok = _to_4326(xs, ys, s)
    ox, oy, ok2 = _from_4326(lon, lat, d)
    return ox, oy, ok & ok2


# geographic CRSes treated as ≡ WGS84 (no datum shift; accuracy note in
# the module docstring): NAD83 (4269), ETRS89 (4258), generic lon/lat CRS84
_GEOGRAPHIC_WGS84_ALIASES = {4269, 4258}


def _to_4326(xs, ys, epsg: int):
    ok = np.ones(xs.shape, dtype=bool)
    if epsg in _GEOGRAPHIC_WGS84_ALIASES:
        epsg = 4326
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
    if epsg in _PROJ_REGISTRY:
        lon, lat = _PROJ_REGISTRY[epsg][1](xs, ys)
        return lon, lat, ok
    p4 = epsg_to_proj4(epsg)
    if p4 is not None:
        lon, lat = _proj4_pair(p4)[1](xs, ys)
        return lon, lat, ok & np.isfinite(lon) & np.isfinite(lat)
    raise NotImplementedError(f"EPSG:{epsg} not supported (no PROJ in this env)")


def _from_4326(lon, lat, epsg: int):
    ok = (np.abs(lon) <= 360.0) & (np.abs(lat) <= 90.0)
    if epsg in _GEOGRAPHIC_WGS84_ALIASES:
        epsg = 4326
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
    if epsg in _PROJ_REGISTRY:
        x, y = _PROJ_REGISTRY[epsg][0](lon, lat)
        return x, y, ok
    p4 = epsg_to_proj4(epsg)
    if p4 is not None:
        x, y = _proj4_pair(p4)[0](lon, lat)
        return x, y, ok & np.isfinite(x) & np.isfinite(y)
    raise NotImplementedError(f"EPSG:{epsg} not supported (no PROJ in this env)")


# --- Transverse Mercator (standard series, public formulas) ----------------

_K0 = 0.9996
_E4 = E2 * E2
_E6 = _E4 * E2


def _ll_to_utm(lon, lat, zone: int, south: bool):
    return _ll_to_tm(lon, lat, (zone - 1) * 6 - 180 + 3, _K0,
                     500000.0, 10000000.0 if south else 0.0)


def _utm_to_ll(x, y, zone: int, south: bool):
    return _tm_to_ll(x, y, (zone - 1) * 6 - 180 + 3, _K0,
                     500000.0, 10000000.0 if south else 0.0)


def _tm_meridian_arc(lat, a: float, e2: float):
    """Meridian arc length M(lat) — the standard series shared by the
    forward and the lat0 offset (lat in radians)."""
    e4 = e2 * e2
    e6 = e4 * e2
    return a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat
                - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * lat)
                + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * lat)
                - (35 * e6 / 3072) * np.sin(6 * lat))


def _ll_to_tm(lon, lat, lon0_deg: float, k0: float, fe: float, fn: float,
              a: float | None = None, e2: float | None = None,
              lat0_deg: float = 0.0):
    """Transverse Mercator forward (same standard series as the UTM
    path, parameterized for non-UTM TM grids: NZTM lat0=0 on WGS84,
    OSGB lat0=49 on Airy 1830 — pass (a, e2, lat0_deg))."""
    a = R_a if a is None else a
    e2 = E2 if e2 is None else e2
    lon = np.asarray(lon, dtype=np.float64) * math.pi / 180.0
    lat = np.asarray(lat, dtype=np.float64) * math.pi / 180.0
    lon0 = math.radians(lon0_deg)
    ep2 = e2 / (1 - e2)
    N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    T = np.tan(lat) ** 2
    C = ep2 * np.cos(lat) ** 2
    A = np.cos(lat) * (lon - lon0)
    M = _tm_meridian_arc(lat, a, e2)
    M0 = float(_tm_meridian_arc(np.float64(math.radians(lat0_deg)), a, e2))
    x = k0 * N * (A + (1 - T + C) * A**3 / 6
                  + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120) + fe
    y = k0 * (M - M0 + N * np.tan(lat) * (A**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
              + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720)) + fn
    return x, y


def _tm_to_ll(x, y, lon0_deg: float, k0: float, fe: float, fn: float,
              a: float | None = None, e2: float | None = None,
              lat0_deg: float = 0.0):
    a = R_a if a is None else a
    e2 = E2 if e2 is None else e2
    e4 = e2 * e2
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    lon0 = math.radians(lon0_deg)
    ep2 = e2 / (1 - e2)
    M0 = float(_tm_meridian_arc(np.float64(math.radians(lat0_deg)), a, e2))
    M = y / k0 + M0
    mu = M / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e4 * e2 / 256))
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    phi1 = (mu + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
            + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
            + (151 * e1**3 / 96) * np.sin(6 * mu)
            + (1097 * e1**4 / 512) * np.sin(8 * mu))
    C1 = ep2 * np.cos(phi1) ** 2
    T1 = np.tan(phi1) ** 2
    N1 = a / np.sqrt(1 - e2 * np.sin(phi1) ** 2)
    R1 = a * (1 - e2) / (1 - e2 * np.sin(phi1) ** 2) ** 1.5
    D = x / (N1 * k0)
    lat = phi1 - (N1 * np.tan(phi1) / R1) * (
        D**2 / 2 - (5 + 3 * T1 + 10 * C1 - 4 * C1**2 - 9 * ep2) * D**4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1**2 - 252 * ep2 - 3 * C1**2) * D**6 / 720)
    lon = lon0 + (D - (1 + 2 * T1 + C1) * D**3 / 6
                  + (5 - 2 * C1 + 28 * T1 - 3 * C1**2 + 8 * ep2 + 24 * T1**2) * D**5 / 120) / np.cos(phi1)
    return lon * 180.0 / math.pi, lat * 180.0 / math.pi


R_a = 6378137.0  # WGS84 semi-major for TM series


# ---------------------------------------------------------------------------
# equal-area + polar families (round 2: the codes large-scale pipelines
# warp into — EASE-Grid 2.0, LAEA Europe, Albers CONUS, polar stereo).
# Snyder/EPSG-guidance ellipsoidal formulas; shared authalic machinery.
# NAD83/ETRS89 are treated as WGS84 (datum shifts are centimetric —
# documented deviation; reference delegates datum handling to PROJ).
# ---------------------------------------------------------------------------

_E = math.sqrt(E2)
_E8 = _E6 * E2


def _q_authalic(sinphi):
    """Snyder's q: the authalic-latitude integral."""
    sinphi = np.asarray(sinphi, dtype=np.float64)
    return (1 - E2) * (sinphi / (1 - E2 * sinphi ** 2)
                       - (1 / (2 * _E)) * np.log((1 - _E * sinphi)
                                                 / (1 + _E * sinphi)))


_QP = float(_q_authalic(1.0))


def _phi_from_beta(beta):
    """Inverse authalic latitude (series, Snyder 3-18)."""
    return (beta
            + (E2 / 3 + 31 * _E4 / 180 + 517 * _E6 / 5040) * np.sin(2 * beta)
            + (23 * _E4 / 360 + 251 * _E6 / 3780) * np.sin(4 * beta)
            + (761 * _E6 / 45360) * np.sin(6 * beta))


def _m_of(phi):
    return np.cos(phi) / np.sqrt(1 - E2 * np.sin(phi) ** 2)


def _wrap_lon(deg):
    return (np.asarray(deg, dtype=np.float64) + 180.0) % 360.0 - 180.0


def _cea(lat_ts_deg: float):
    """Cylindrical equal-area (EASE-Grid 2.0 family)."""
    ts = math.radians(lat_ts_deg)
    k0 = math.cos(ts) / math.sqrt(1 - E2 * math.sin(ts) ** 2)

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        return R_a * k0 * lam, R_a * _q_authalic(np.sin(phi)) / (2 * k0)

    def inv(x, y):
        beta = np.arcsin(np.clip(2 * np.asarray(y, np.float64) * k0 / (R_a * _QP), -1, 1))
        return (np.degrees(np.asarray(x, np.float64) / (R_a * k0)),
                np.degrees(_phi_from_beta(beta)))

    return fwd, inv


def _laea(lat0_deg: float, lon0_deg: float, fe: float, fn: float):
    """Lambert azimuthal equal-area, ellipsoidal (EPSG guidance 7-2).
    |lat0| = 90 uses the exact polar-aspect equations (Snyder 24-29..34:
    rho = a*sqrt(qp -/+ q)) — the oblique form's D = a*m0/(Rq*cos b0)
    degenerates 0/0 at the pole (the Arctic-SDI 3571-3576 family)."""
    lam0 = math.radians(lon0_deg)
    if abs(lat0_deg) == 90.0:
        north = lat0_deg > 0

        def fwd(lon, lat):
            lam = np.radians(np.asarray(lon, np.float64)) - lam0
            q = _q_authalic(np.sin(np.radians(
                np.asarray(lat, np.float64))))
            rho = R_a * np.sqrt(np.maximum(
                _QP - q if north else _QP + q, 0.0))
            x = fe + rho * np.sin(lam)
            y = fn + (-rho * np.cos(lam) if north else rho * np.cos(lam))
            return x, y

        def inv(x, y):
            xp = np.asarray(x, np.float64) - fe
            yp = np.asarray(y, np.float64) - fn
            rho = np.hypot(xp, yp)
            q = (_QP - (rho / R_a) ** 2 if north
                 else (rho / R_a) ** 2 - _QP)
            beta = np.arcsin(np.clip(q / _QP, -1, 1))
            lam = np.arctan2(xp, -yp) if north else np.arctan2(xp, yp)
            return (_wrap_lon(np.degrees(lam0 + lam)),
                    np.degrees(_phi_from_beta(beta)))

        return fwd, inv
    phi0 = math.radians(lat0_deg)
    q0 = float(_q_authalic(math.sin(phi0)))
    beta0 = math.asin(q0 / _QP)
    rq = R_a * math.sqrt(_QP / 2)
    d = R_a * float(_m_of(phi0)) / (rq * math.cos(beta0))

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, np.float64)) - lam0
        phi = np.radians(np.asarray(lat, np.float64))
        beta = np.arcsin(np.clip(_q_authalic(np.sin(phi)) / _QP, -1, 1))
        b = rq * np.sqrt(2 / (1 + math.sin(beta0) * np.sin(beta)
                              + math.cos(beta0) * np.cos(beta) * np.cos(lam)))
        x = fe + b * d * np.cos(beta) * np.sin(lam)
        y = fn + (b / d) * (math.cos(beta0) * np.sin(beta)
                            - math.sin(beta0) * np.cos(beta) * np.cos(lam))
        return x, y

    def inv(x, y):
        xp = (np.asarray(x, np.float64) - fe) / d
        yp = (np.asarray(y, np.float64) - fn) * d
        rho = np.hypot(xp, yp)
        ce = 2 * np.arcsin(np.clip(rho / (2 * rq), -1, 1))
        rho = np.where(rho == 0, 1.0, rho)
        beta = np.arcsin(np.clip(np.cos(ce) * math.sin(beta0)
                                 + yp * np.sin(ce) * math.cos(beta0) / rho, -1, 1))
        lam = np.arctan2(xp * np.sin(ce),
                         rho * math.cos(beta0) * np.cos(ce)
                         - yp * math.sin(beta0) * np.sin(ce))
        return _wrap_lon(np.degrees(lam0 + lam)), np.degrees(_phi_from_beta(beta))

    return fwd, inv


def _albers(lat1_deg, lat2_deg, lat0_deg, lon0_deg, fe, fn):
    """Albers equal-area conic, ellipsoidal (Snyder 14-1..14-11)."""
    p1, p2 = math.radians(lat1_deg), math.radians(lat2_deg)
    phi0, lam0 = math.radians(lat0_deg), math.radians(lon0_deg)
    m1, m2 = float(_m_of(p1)), float(_m_of(p2))
    q1, q2 = float(_q_authalic(math.sin(p1))), float(_q_authalic(math.sin(p2)))
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    c = m1 * m1 + n * q1
    rho0 = R_a * math.sqrt(c - n * float(_q_authalic(math.sin(phi0)))) / n

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, np.float64)) - lam0
        phi = np.radians(np.asarray(lat, np.float64))
        rho = R_a * np.sqrt(np.maximum(c - n * _q_authalic(np.sin(phi)), 0)) / n
        th = n * lam
        return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)

    def inv(x, y):
        xp = np.asarray(x, np.float64) - fe
        yp = rho0 - (np.asarray(y, np.float64) - fn)
        rho = np.hypot(xp, yp)
        th = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
        q = (c - (rho * n / R_a) ** 2) / n
        beta = np.arcsin(np.clip(q / _QP, -1, 1))
        return (_wrap_lon(np.degrees(lam0 + th / n)),
                np.degrees(_phi_from_beta(beta)))

    return fwd, inv


def _polar_stereo(lat_ts_deg: float, lon0_deg: float, fe: float, fn: float,
                  south: bool, k0: float | None = None):
    """Polar stereographic variant B (standard parallel lat_ts); with
    `k0` given, variant A instead (EPSG 9810: scale at the pole — the
    UPS form, rho = 2 a k0 t / sqrt((1+e)^(1+e) (1-e)^(1-e))). Both
    share the kernel because only the rho/t ratio differs. South
    aspect = north mirrored."""
    lam0 = math.radians(lon0_deg)
    phi_f = math.radians(abs(lat_ts_deg))
    e = _E

    def _t(phi):
        return (np.tan(math.pi / 4 - phi / 2)
                * ((1 + e * np.sin(phi)) / (1 - e * np.sin(phi))) ** (e / 2))

    if k0 is not None:  # variant A
        ratio = 2.0 * k0 / math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
    else:  # variant B
        ratio = float(_m_of(phi_f)) / float(_t(np.array(phi_f)))

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, np.float64)) - lam0
        phi = np.radians(np.asarray(lat, np.float64))
        if south:
            phi = -phi
        rho = R_a * ratio * _t(phi)
        x = rho * np.sin(lam)
        y = -rho * np.cos(lam)
        if south:
            y = -y
        return fe + x, fn + y

    def inv(x, y):
        xp = np.asarray(x, np.float64) - fe
        yp = np.asarray(y, np.float64) - fn
        if south:
            yp = -yp
        rho = np.hypot(xp, yp)
        t = rho / (R_a * ratio)
        chi = math.pi / 2 - 2 * np.arctan(t)
        phi = (chi
               + (E2 / 2 + 5 * _E4 / 24 + _E6 / 12 + 13 * _E8 / 360) * np.sin(2 * chi)
               + (7 * _E4 / 48 + 29 * _E6 / 240 + 811 * _E8 / 11520) * np.sin(4 * chi)
               + (7 * _E6 / 120 + 81 * _E8 / 1120) * np.sin(6 * chi)
               + (4279 * _E8 / 161280) * np.sin(8 * chi))
        lam = np.arctan2(xp, -yp)
        if south:
            phi = -phi
        return _wrap_lon(np.degrees(lam0 + lam)), np.degrees(phi)

    return fwd, inv


def _lcc_core(n: float, big_f: float, t0: float, lam0: float, k0: float,
              fe: float, fn: float, a: float, e2: float):
    """Shared LCC machinery: given the cone constant n, F, and t at the
    origin, build (fwd, inv) on ellipsoid (a, e2) with scale k0."""
    e = math.sqrt(e2)
    e4 = e2 * e2
    e6 = e4 * e2
    e8 = e6 * e2
    rho0 = a * k0 * big_f * t0 ** n

    def _t(phi):
        return (np.tan(math.pi / 4 - phi / 2)
                * ((1 + e * np.sin(phi)) / (1 - e * np.sin(phi))) ** (e / 2))

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, np.float64)) - lam0
        phi = np.radians(np.asarray(lat, np.float64))
        rho = a * k0 * big_f * _t(phi) ** n
        th = n * lam
        return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)

    def inv(x, y):
        xp = np.asarray(x, np.float64) - fe
        yp = rho0 - (np.asarray(y, np.float64) - fn)
        rho = np.sign(n) * np.hypot(xp, yp)
        th = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
        tp = np.maximum(rho / (a * k0 * big_f), 1e-300) ** (1.0 / n)
        chi = math.pi / 2 - 2 * np.arctan(tp)
        phi = (chi
               + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * np.sin(2 * chi)
               + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * np.sin(4 * chi)
               + (7 * e6 / 120 + 81 * e8 / 1120) * np.sin(6 * chi)
               + (4279 * e8 / 161280) * np.sin(8 * chi))
        return _wrap_lon(np.degrees(lam0 + th / n)), np.degrees(phi)

    return fwd, inv, _t


def _lcc2sp(lat1_deg, lat2_deg, lat0_deg, lon0_deg, fe, fn,
            a: float | None = None, e2: float | None = None):
    """Lambert conformal conic 2SP, ellipsoidal (Snyder 15-1..15-11 /
    EPSG guidance 7-2 method 9802), any ellipsoid since round 5
    (defaults WGS84). Validated by its DEFINING properties in tests (no
    PROJ in this env for a numeric oracle): grid origin maps to
    (FE, FN) exactly, scale factor k = 1 on both standard parallels,
    local conformality, sub-nanodegree round-trips."""
    a = R_a if a is None else a
    e2 = E2 if e2 is None else e2
    e = math.sqrt(e2)
    p1, p2 = math.radians(lat1_deg), math.radians(lat2_deg)
    phi0, lam0 = math.radians(lat0_deg), math.radians(lon0_deg)

    def m_of(phi):
        return math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)

    def t_of(phi):
        return (math.tan(math.pi / 4 - phi / 2)
                * ((1 + e * math.sin(phi)) / (1 - e * math.sin(phi))) ** (e / 2))

    m1, m2 = m_of(p1), m_of(p2)
    t1, t2 = t_of(p1), t_of(p2)
    n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    big_f = m1 / (n * t1 ** n)
    fwd, inv, _ = _lcc_core(n, big_f, t_of(phi0), lam0, 1.0, fe, fn, a, e2)
    return fwd, inv


def _lcc1sp(lat0_deg, lon0_deg, k0, fe, fn, a: float, e2: float):
    """Lambert conformal conic 1SP (EPSG method 9801): the cone is
    tangent at the single parallel (n = sin(phi0)) and k0 scales it —
    the classical national form (Jamaica 1969, French legacy Lambert
    zones via proj4)."""
    e = math.sqrt(e2)
    phi0, lam0 = math.radians(lat0_deg), math.radians(lon0_deg)
    n = math.sin(phi0)
    m0 = math.cos(phi0) / math.sqrt(1 - e2 * math.sin(phi0) ** 2)
    t0 = (math.tan(math.pi / 4 - phi0 / 2)
          * ((1 + e * math.sin(phi0)) / (1 - e * math.sin(phi0))) ** (e / 2))
    big_f = m0 / (n * t0 ** n)
    fwd, inv, _ = _lcc_core(n, big_f, t0, lam0, k0, fe, fn, a, e2)
    return fwd, inv


def _conformal_lat_inverse(chi, e2: float):
    """Inverse conformal latitude: phi from chi (EPSG G7-2 series in
    powers of e2 — shared by ellipsoidal Mercator and any future
    conformal inverse)."""
    e4 = e2 * e2
    e6 = e4 * e2
    e8 = e6 * e2
    return (chi
            + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * np.sin(2 * chi)
            + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * np.sin(4 * chi)
            + (7 * e6 / 120 + 81 * e8 / 1120) * np.sin(6 * chi)
            + (4279 * e8 / 161280) * np.sin(8 * chi))


def _merc_ellipsoidal(lat_ts_deg: float, k: float, lon0_deg: float,
                      fe: float, fn: float, a: float, e2: float):
    """Ellipsoidal Mercator — EPSG methods 9804 (1SP, scale k at the
    equator: EPSG:3395 World Mercator, Makassar/NEIEZ) and 9805 (two
    standard parallels via lat_ts: Caspian-style grids). PROJ's
    +proj=merc default form. Forward is the isometric-latitude
    closed form; inverse goes through the conformal-latitude series
    (sub-mm). Reference delegates to PROJ (srs.go); formulas are the
    published EPSG Guidance 7-2 ones."""
    e = math.sqrt(e2)
    if lat_ts_deg != 0.0:
        s1 = math.sin(math.radians(lat_ts_deg))
        k0 = k * math.cos(math.radians(lat_ts_deg)) / math.sqrt(
            1 - e2 * s1 * s1)
    else:
        k0 = k
    lam0 = math.radians(lon0_deg)

    def fwd(lon, lat):
        lam = np.radians(_wrap_lon(np.asarray(lon, np.float64)
                                   - lon0_deg)) + 0.0
        phi = np.radians(np.clip(np.asarray(lat, np.float64),
                                 -MAX_MERC_LAT, MAX_MERC_LAT))
        esin = e * np.sin(phi)
        x = a * k0 * lam + fe
        y = a * k0 * np.log(np.tan(math.pi / 4 + phi / 2)
                            * ((1 - esin) / (1 + esin)) ** (e / 2)) + fn
        return x, y

    def inv(x, y):
        lam = (np.asarray(x, np.float64) - fe) / (a * k0) + lam0
        t = np.exp(-(np.asarray(y, np.float64) - fn) / (a * k0))
        chi = math.pi / 2 - 2 * np.arctan(t)
        phi = _conformal_lat_inverse(chi, e2)
        return np.degrees(lam), np.degrees(phi)

    return fwd, inv


def _sinusoidal(lon0_deg: float, fe: float, fn: float,
                a: float, e2: float):
    """Sinusoidal (equal-area, +proj=sinu): x = a cos(phi) dlam / sqrt(
    1 - e2 sin^2 phi), y = M(phi). The MODIS land grid is this
    projection on the authalic sphere R = 6371007.181 (pass a=R, e2=0 —
    both reduce to the spherical x = R dlam cos phi, y = R phi).
    Inverse latitude reuses the TM footpoint series (exact for e2=0)."""
    e4 = e2 * e2

    def fwd(lon, lat):
        dlam = np.radians(_wrap_lon(np.asarray(lon, np.float64)
                                    - lon0_deg))
        phi = np.radians(np.asarray(lat, np.float64))
        x = a * np.cos(phi) * dlam / np.sqrt(1 - e2 * np.sin(phi) ** 2) + fe
        y = _tm_meridian_arc(phi, a, e2) + fn
        return x, y

    def inv(x, y):
        m = (np.asarray(y, np.float64) - fn)
        mu = m / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e4 * e2 / 256))
        if e2 == 0.0:
            phi = mu
        else:
            e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
            phi = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
                   + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
                   + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
                   + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))
        cos = np.cos(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            dlam = (np.asarray(x, np.float64) - fe) \
                * np.sqrt(1 - e2 * np.sin(phi) ** 2) / (a * cos)
            dlam = np.where(np.abs(cos) < 1e-12, 0.0, dlam)
        return np.degrees(dlam) + lon0_deg, np.degrees(phi)

    return fwd, inv


# ---------------------------------------------------------------------------
# datum shifts (round 5): Helmert 7-parameter position-vector
# transformation (EPSG method 9606) in pure numpy — unlocks the
# non-WGS84-datum national grids (OSGB 27700, Irish Grid 29903) that the
# "no datum shifts" policy above excluded. Accuracy: the single-Helmert
# country-wide fits are ~2 m against the definitive grid transformations
# (OSTN15 / OSi-OSNI polynomial), which need PROJ + grid files this
# environment does not have. Documented bound, NOT survey-grade.
# ---------------------------------------------------------------------------

def _geodetic_to_ecef(lon_deg, lat_deg, a: float, e2: float):
    """Geodetic (h=0) → geocentric cartesian on the given ellipsoid."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    n = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    return (n * np.cos(phi) * np.cos(lam),
            n * np.cos(phi) * np.sin(lam),
            n * (1 - e2) * np.sin(phi))


def _ecef_to_geodetic(X, Y, Z, a: float, e2: float):
    """Geocentric cartesian → geodetic lon/lat (height discarded — 2-D
    CRS transform). Fixed-point iteration on phi; converges to < 1e-12
    rad in ≤ 6 rounds for |h| < 10 km."""
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    Z = np.asarray(Z, dtype=np.float64)
    lam = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    phi = np.arctan2(Z, p * (1 - e2))
    for _ in range(6):
        n = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        h = p / np.cos(phi) - n
        phi = np.arctan2(Z, p * (1 - e2 * n / (n + h)))
    return np.degrees(lam), np.degrees(phi)


def _helmert_pair(tx, ty, tz, rx_as, ry_as, rz_as, s_ppm):
    """(forward, exact inverse) cartesian maps for the position-vector
    convention: V' = t + m·R·V with R = [[1,-rz,ry],[rz,1,-rx],[-ry,rx,1]]
    (rotations in arc-seconds, scale in ppm). The inverse uses the true
    matrix inverse (not the sign-flipped small-angle approximation) so
    round-trips close to machine precision."""
    rx, ry, rz = (math.radians(v / 3600.0) for v in (rx_as, ry_as, rz_as))
    m = 1.0 + s_ppm * 1e-6
    rot = np.array([[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]])
    fwd_m = m * rot
    inv_m = np.linalg.inv(fwd_m)
    t = np.array([tx, ty, tz])

    def fwd(X, Y, Z):
        return (fwd_m[0, 0] * X + fwd_m[0, 1] * Y + fwd_m[0, 2] * Z + t[0],
                fwd_m[1, 0] * X + fwd_m[1, 1] * Y + fwd_m[1, 2] * Z + t[1],
                fwd_m[2, 0] * X + fwd_m[2, 1] * Y + fwd_m[2, 2] * Z + t[2])

    def inv(X, Y, Z):
        X, Y, Z = X - t[0], Y - t[1], Z - t[2]
        return (inv_m[0, 0] * X + inv_m[0, 1] * Y + inv_m[0, 2] * Z,
                inv_m[1, 0] * X + inv_m[1, 1] * Y + inv_m[1, 2] * Z,
                inv_m[2, 0] * X + inv_m[2, 1] * Y + inv_m[2, 2] * Z)

    return fwd, inv


def _on_datum(pair, a: float, e2: float, helm):
    """Wrap a projection (fwd from local-datum geodetic, inv back to it)
    with a Helmert datum hop: helm = (wgs84→local, local→wgs84)
    cartesian maps. The generic form of _tm_on_datum below — any
    ellipsoid-parameterized projection family composes with it."""
    pf, pi = pair
    wgs_to_local, local_to_wgs = helm

    def fwd(lon, lat):
        X, Y, Z = _geodetic_to_ecef(lon, lat, R_a, E2)
        lon2, lat2 = _ecef_to_geodetic(*wgs_to_local(X, Y, Z), a, e2)
        return pf(lon2, lat2)

    def inv(x, y):
        lon2, lat2 = pi(x, y)
        X, Y, Z = _geodetic_to_ecef(lon2, lat2, a, e2)
        return _ecef_to_geodetic(*local_to_wgs(X, Y, Z), R_a, E2)

    return fwd, inv


def _tm_on_datum(a: float, inv_f: float, lat0: float, lon0: float,
                 k0: float, fe: float, fn: float, helmert):
    """Projected CRS = TM(ellipsoid a, 1/f) ∘ Helmert(WGS84 → datum).
    `helmert` = (tx, ty, tz, rx", ry", rz", s_ppm), position-vector."""
    f = 1.0 / inv_f
    e2 = f * (2 - f)
    h_fwd, h_inv = _helmert_pair(*helmert)

    def fwd(lon, lat):
        X, Y, Z = _geodetic_to_ecef(lon, lat, R_a, E2)
        lon2, lat2 = _ecef_to_geodetic(*h_fwd(X, Y, Z), a, e2)
        return _ll_to_tm(lon2, lat2, lon0, k0, fe, fn,
                         a=a, e2=e2, lat0_deg=lat0)

    def inv(x, y):
        lon2, lat2 = _tm_to_ll(x, y, lon0, k0, fe, fn,
                               a=a, e2=e2, lat0_deg=lat0)
        X, Y, Z = _geodetic_to_ecef(lon2, lat2, a, e2)
        return _ecef_to_geodetic(*h_inv(X, Y, Z), R_a, E2)

    return fwd, inv


# Airy 1830 / Airy 1830 Modified semi-major + 1/f (public EPSG ellipsoid
# parameters); Helmert sets are the published country-wide fits:
# WGS84→OSGB36 from the OS "A guide to coordinate systems in Great
# Britain" (±2 m vs OSTN15); WGS84→Ireland65 from the OSi/OSNI joint
# publication (±1 m class).
_AIRY_A, _AIRY_INVF = 6377563.396, 299.3249646
_AIRY_MOD_A = 6377340.189
_OSGB36_HELMERT = (-446.448, 125.157, -542.060,
                   -0.1502, -0.2470, -0.8421, 20.4894)
_IRELAND65_HELMERT = (-482.530, 130.596, -564.557,
                      -1.042, -0.214, -0.631, -8.150)

def epsg_to_proj4(epsg: int):
    """Formulaic EPSG ranges → PROJ4 definition strings (public EPSG
    registry parameters), routed through the same from_proj4 dispatch
    as user-supplied strings — this is how the engine covers whole
    national-grid families without a PROJ database. Datum notes:
    ETRS89/NAD83/GDA94/GDA2020 ≡ WGS84 (metre-level, module policy);
    NAD27/ED50/WGS72/DHDN carry their standard published towgs84
    shifts (few-metre accuracy without regional grids — documented).
    Returns None for codes outside the rules (caller stays
    error-first). Reference: godal accepts any EPSG via PROJ
    (srs.go NewSpatialRefFromEPSG)."""
    if 25828 <= epsg <= 25838:    # ETRS89 / UTM zones 28N..38N
        return f"+proj=utm +zone={epsg - 25800} +ellps=grs80"
    if 26901 <= epsg <= 26923:    # NAD83 / UTM zones 1N..23N
        return f"+proj=utm +zone={epsg - 26900} +ellps=grs80"
    if 26701 <= epsg <= 26722:    # NAD27 / UTM (Clarke 1866, CONUS shift)
        return (f"+proj=utm +zone={epsg - 26700} +ellps=clrk66 "
                "+towgs84=-8,160,176")
    if 23028 <= epsg <= 23038:    # ED50 / UTM (International 1924)
        return (f"+proj=utm +zone={epsg - 23000} +ellps=intl "
                "+towgs84=-87,-98,-121")
    if 28348 <= epsg <= 28358:    # GDA94 / MGA zones 48..58
        return f"+proj=utm +zone={epsg - 28300} +south +ellps=grs80"
    if 7846 <= epsg <= 7859:      # GDA2020 / MGA zones 46..59
        return f"+proj=utm +zone={epsg - 7800} +south +ellps=grs80"
    if 32201 <= epsg <= 32260:    # WGS 72 / UTM north
        return (f"+proj=utm +zone={epsg - 32200} +ellps=wgs72 "
                "+towgs84=0,0,4.5,0,0,0.554,0.219")
    if 32301 <= epsg <= 32360:    # WGS 72 / UTM south
        return (f"+proj=utm +zone={epsg - 32300} +south +ellps=wgs72 "
                "+towgs84=0,0,4.5,0,0,0.554,0.219")
    if 31466 <= epsg <= 31469:    # DHDN / 3-deg Gauss-Krüger zones 2..5
        z = epsg - 31464
        return (f"+proj=tmerc +lat_0=0 +lon_0={3 * z} +k=1 "
                f"+x_0={z * 1000000 + 500000} +y_0=0 +ellps=bessel "
                "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7")
    if 27561 <= epsg <= 27564 or 27571 <= epsg <= 27574:
        # NTF (Paris) / Lambert zones (EPSG 9801 1SP on Clarke 1880 IGN,
        # longitudes from the Paris meridian; 2757x are the "étendu"
        # variants with the zone folded into the false northing).
        # Published registry parameters; NTF->WGS84 is the standard
        # -168,-60,320 three-parameter shift (few-metre class).
        z = epsg % 10
        lat0 = {1: 49.5, 2: 46.8, 3: 44.1, 4: 42.165}[z]
        k0 = {1: 0.999877341, 2: 0.99987742,
              3: 0.999877499, 4: 0.99994471}[z]
        x0 = 600000.0 if z != 4 else 234.358
        y0 = 200000.0 if z != 4 else 185861.369
        if epsg >= 27571:
            y0 += z * 1000000.0
        return (f"+proj=lcc +lat_1={lat0} +lat_0={lat0} +lon_0=0 "
                f"+k_0={k0} +x_0={x0} +y_0={y0} +ellps=clrk80ign "
                "+towgs84=-168,-60,320 +pm=paris")
    if 3571 <= epsg <= 3576:      # WGS 84 / North Pole LAEA (Arctic SDI)
        lon0 = {3571: 180.0, 3572: -150.0, 3573: -100.0, 3574: -40.0,
                3575: 10.0, 3576: 90.0}[epsg]
        return (f"+proj=laea +lat_0=90 +lon_0={lon0} +x_0=0 +y_0=0 "
                "+ellps=wgs84")
    if epsg in (5041, 32661):     # WGS 84 / UPS North (EPSG 9810, k0)
        return ("+proj=stere +lat_0=90 +k=0.994 +x_0=2000000 "
                "+y_0=2000000 +ellps=wgs84")
    if epsg in (5042, 32761):     # WGS 84 / UPS South
        return ("+proj=stere +lat_0=-90 +k=0.994 +x_0=2000000 "
                "+y_0=2000000 +ellps=wgs84")
    if epsg == 4267:              # NAD27 geographic
        return "+proj=longlat +ellps=clrk66 +towgs84=-8,160,176"
    if epsg == 4230:              # ED50 geographic
        return "+proj=longlat +ellps=intl +towgs84=-87,-98,-121"
    if epsg == 3112:              # GDA94 / Geoscience Australia Lambert
        return ("+proj=lcc +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=134 "
                "+x_0=0 +y_0=0 +ellps=grs80")
    return None


_PROJ_REGISTRY = {
    6933: _cea(30.0),                                # WGS84 / EASE-Grid 2.0 Global
    3035: _laea(52.0, 10.0, 4321000.0, 3210000.0),   # ETRS89 / LAEA Europe
    5070: _albers(29.5, 45.5, 23.0, -96.0, 0.0, 0.0),  # NAD83 / CONUS Albers
    3031: _polar_stereo(-71.0, 0.0, 0.0, 0.0, True),   # Antarctic PS
    3413: _polar_stereo(70.0, -45.0, 0.0, 0.0, False),  # NSIDC Arctic PS
    # round 4 (families on demand — r3 verdict item 9). Datum policy
    # unchanged (RGF93/NAD83/GDA94 ≡ WGS84, metre-level; header note):
    2154: _lcc2sp(49.0, 44.0, 46.5, 3.0,
                  700000.0, 6600000.0),                # RGF93 / Lambert-93
    3978: _lcc2sp(49.0, 77.0, 49.0, -95.0, 0.0, 0.0),  # NAD83 / Canada Atlas
    3577: _albers(-18.0, -36.0, 0.0, 132.0, 0.0, 0.0),  # GDA94 / Australian Albers
    # NZGD2000 / NZTM2000: plain TM (lat0=0, k0=0.9996) on the shared
    # parameterized series; NZGD2000 ≡ WGS84 under the datum policy.
    # NZ spans ±7 deg from the central meridian (UTM zones span ±3), so
    # the series truncation grows to ~15 cm at the country's edges —
    # documented accuracy bound, sub-pixel at tile zoom levels
    2193: (lambda lon, lat: _ll_to_tm(lon, lat, 173.0, _K0,
                                      1600000.0, 10000000.0),
           lambda x, y: _tm_to_ll(x, y, 173.0, _K0,
                                  1600000.0, 10000000.0)),
    # round 5 — first TRUE datum shifts (Helmert kernel above):
    # OSGB36 / British National Grid: TM on Airy 1830, lat0 49N,
    # lon0 2W, k0 0.9996012717, FE 400000, FN -100000
    27700: _tm_on_datum(_AIRY_A, _AIRY_INVF, 49.0, -2.0, 0.9996012717,
                        400000.0, -100000.0, _OSGB36_HELMERT),
    # TM75 / Irish Grid: TM on Airy Modified, lat0 53.5N, lon0 8W,
    # k0 1.000035, FE 200000, FN 250000
    29903: _tm_on_datum(_AIRY_MOD_A, _AIRY_INVF, 53.5, -8.0, 1.000035,
                        200000.0, 250000.0, _IRELAND65_HELMERT),
    # WGS 84 / World Mercator (EPSG method 9804, true ellipsoidal — the
    # nautical-chart Mercator; NOT the web-mercator sphere of 3857)
    3395: _merc_ellipsoidal(0.0, 1.0, 0.0, 0.0, 0.0, R_a, E2),
}


# ---------------------------------------------------------------------------
# PROJ.4 definition strings (round 5). The reference accepts arbitrary
# PROJ4/WKT CRS definitions (srs.go NewSpatialRefFromProj4 /
# godal.go:2044-2143); this engine accepts the PROJ4 subset its
# projection kernels implement:
#   +proj= longlat/latlong | tmerc | utm | merc (ellipsoidal 9804/9805
#          by default, spherical web-mercator when +a=+b/+R) | sinu |
#          lcc (1SP/2SP) | aea | laea | cea | stere (polar)
#   +ellps / +a +rf / +R (any ellipsoid or sphere on the longlat/tmerc/
#     utm/merc/sinu/lcc families — where the world's classical grids
#     live; the equal-area/polar families are WGS84/GRS80-ellipsoid
#     only, error-first otherwise)
#   +pm= named or numeric prime meridian (NTF/Paris-class datums)
#   +towgs84= 3- or 7-parameter (position-vector, local→WGS84 — the
#     PROJ convention; applied through the exact-inverse Helmert kernel)
#   +lat_0 +lat_1 +lat_2 +lat_ts +lon_0 +k/+k_0 +x_0 +y_0 +zone +south
# Anything else (grids=, nadgrids, units!=m, unlisted projections) is
# error-first. This is how a user expresses an EPSG code the registry
# lacks: e.g. DHDN Gauss-Krüger zone 3 (EPSG:31467) =
#   +proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0
#   +ellps=bessel +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7
# ---------------------------------------------------------------------------

_ELLIPSOIDS = {
    # name: (semi-major a, inverse flattening 1/f) — public EPSG values
    "wgs84": (6378137.0, 298.257223563),
    "grs80": (6378137.0, 298.257222101),
    "airy": (6377563.396, 299.3249646),
    "mod_airy": (6377340.189, 299.3249646),
    "intl": (6378388.0, 297.0),
    "clrk66": (6378206.4, 294.9786982),
    "clrk80ign": (6378249.2, 293.4660212936),
    "krass": (6378245.0, 298.3),
    "wgs72": (6378135.0, 298.26),
    "bessel": (6377397.155, 299.1528128),
    "grs67": (6378160.0, 298.247167427),
    "aust_sa": (6378160.0, 298.25),
}

_WGS84_LIKE = ("wgs84", "grs80")  # a identical, 1/f differs at 1e-9

_PRIME_MERIDIANS = {
    # PROJ's named prime meridians (degrees east of Greenwich) — the
    # classical national datums (NTF/Paris, the Ferro grids) reckon
    # longitude from these
    "greenwich": 0.0,
    "paris": 2.337229166666667,       # 2°20'14.025"E
    "lisbon": -9.131906111111112,     # 9°07'54.862"W
    "bogota": -74.08091666666667,     # 74°04'51.30"W
    "madrid": -3.687938888888889,     # 3°41'16.58"W
    "rome": 12.452333333333334,       # 12°27'08.40"E
    "bern": 7.439583333333333,        # 7°26'22.50"E
    "jakarta": 106.80771944444444,    # 106°48'27.79"E
    "ferro": -17.666666666666668,     # 17°40'00"W
    "brussels": 4.367975,             # 4°22'04.71"E
    "stockholm": 18.058277777777778,  # 18°03'29.80"E
    "athens": 23.7163375,             # 23°42'58.815"E
    "oslo": 10.722916666666666,       # 10°43'22.50"E
}


def _parse_proj4(defn: str) -> dict:
    out: dict = {}
    for tok in defn.split():
        if not tok.startswith("+"):
            raise ValueError(f"proj4: bad token {tok!r}")
        body = tok[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            out["r" if k == "R" else k] = v
        else:
            out[body] = True
    return out


def _proj4_ellipsoid(p: dict) -> tuple[float, float]:
    """(a, e2) from +ellps or +a/+rf/+b or +R (default WGS84)."""
    if "r" in p:  # sphere of the given radius (+R — MODIS sinusoidal)
        return float(p["r"]), 0.0
    if "a" in p:
        a = float(p["a"])
        if "rf" in p:
            f = 1.0 / float(p["rf"])
        elif "b" in p:
            f = (a - float(p["b"])) / a
        else:
            f = 0.0  # sphere
        return a, f * (2 - f)
    name = str(p.get("ellps", "WGS84")).lower()
    if name not in _ELLIPSOIDS:
        raise NotImplementedError(f"proj4: ellipsoid {p.get('ellps')!r}")
    a, invf = _ELLIPSOIDS[name]
    f = 1.0 / invf
    return a, f * (2 - f)


def _proj4_helmert(p: dict):
    """(to_local, from_local) cartesian maps from +towgs84 (PROJ
    convention: the parameters take LOCAL datum → WGS84, position
    vector). Returns None when absent or all-zero."""
    if "towgs84" not in p:
        return None
    vals = [float(v) for v in str(p["towgs84"]).split(",")]
    if len(vals) == 3:
        vals += [0.0, 0.0, 0.0, 0.0]
    if len(vals) != 7:
        raise ValueError("proj4: towgs84 needs 3 or 7 parameters")
    if all(v == 0.0 for v in vals):
        return None
    local_to_wgs, wgs_to_local = _helmert_pair(*vals)
    return wgs_to_local, local_to_wgs


def _require_wgs84_ellipsoid(p: dict, proj: str) -> None:
    a, e2 = _proj4_ellipsoid(p)
    f = 1 - math.sqrt(1 - e2)
    if abs(a - R_a) > 1e-3 or abs(f - F) > 1e-9:
        raise NotImplementedError(
            f"proj4: +proj={proj} is implemented on the WGS84/GRS80 "
            "ellipsoid only (tmerc/utm/longlat accept any ellipsoid)")


def from_proj4(defn: str):
    """(fwd, inv) transform pair for a PROJ4 definition string:
    fwd(lon_wgs84, lat_wgs84) -> (x, y), inv(x, y) -> (lon, lat) on
    WGS84. See the subset note above; error-first beyond it."""
    return _build_transform(_parse_proj4(defn))


def _build_transform(p: dict):
    """Dispatch a parsed parameter dict (proj4 tokens — also the target
    the WKT1 parser lowers into) to the projection kernels."""
    proj = str(p.get("proj", ""))
    if p.get("units", "m") not in ("m", True):
        raise NotImplementedError("proj4: only metre units")
    for unsupported in ("nadgrids", "grids", "geoidgrids"):
        if unsupported in p:
            raise NotImplementedError(f"proj4: +{unsupported} needs PROJ")
    pm = 0.0
    if "pm" in p:
        # non-Greenwich prime meridian (NTF's Paris, the Ferro grids):
        # lon_0 is reckoned FROM that meridian, so its Greenwich
        # longitude is lon_0 + pm; geographic outputs subtract pm
        v = str(p["pm"]).lower()
        if v in _PRIME_MERIDIANS:
            pm = _PRIME_MERIDIANS[v]
        else:
            try:
                pm = float(v)
            except ValueError:
                raise NotImplementedError(f"proj4: +pm={p['pm']!r}")
        p = dict(p)
        p["lon_0"] = float(p.get("lon_0", 0.0)) + pm
    helm = _proj4_helmert(p)

    def num(key, default=0.0):
        return float(p.get(key, default))

    if proj in ("longlat", "latlong", "latlon", "lonlat"):
        a, e2 = _proj4_ellipsoid(p)
        ident = (lambda lon, lat: (np.asarray(lon, np.float64).copy(),
                                   np.asarray(lat, np.float64).copy()),
                 lambda x, y: (np.asarray(x, np.float64).copy(),
                               np.asarray(y, np.float64).copy()))
        pair = ident if helm is None else _on_datum(ident, a, e2, helm)
        if pm:
            bf, bi = pair
            pair = ((lambda lon, lat: (lambda o: (o[0] - pm, o[1]))(
                        bf(lon, lat))),
                    (lambda x, y: bi(np.asarray(x, np.float64) + pm, y)))
        return pair

    if proj in ("tmerc", "utm"):
        a, e2 = _proj4_ellipsoid(p)
        if proj == "utm":
            zone = int(p["zone"])
            lon0 = (zone - 1) * 6 - 180 + 3
            k0, fe = _K0, 500000.0
            fn = 10000000.0 if p.get("south") else 0.0
            lat0 = 0.0
        else:
            lon0 = num("lon_0")
            k0 = float(p.get("k", p.get("k_0", 1.0)))
            fe, fn, lat0 = num("x_0"), num("y_0"), num("lat_0")
        pair = (lambda lon, lat: _ll_to_tm(lon, lat, lon0, k0, fe, fn,
                                           a=a, e2=e2, lat0_deg=lat0),
                lambda x, y: _tm_to_ll(x, y, lon0, k0, fe, fn,
                                       a=a, e2=e2, lat0_deg=lat0))
        return pair if helm is None else _on_datum(pair, a, e2, helm)

    if proj == "lcc":
        a, e2 = _proj4_ellipsoid(p)
        k0 = float(p.get("k", p.get("k_0", 1.0)))
        if "lat_2" in p:  # 2SP (EPSG 9802): no scale factor
            if k0 != 1.0:
                raise NotImplementedError("proj4: lcc 2SP with k_0 != 1")
            pair = _lcc2sp(num("lat_1"), num("lat_2"), num("lat_0"),
                           num("lon_0"), num("x_0"), num("y_0"),
                           a=a, e2=e2)
        else:  # 1SP (EPSG 9801): tangent cone at the origin parallel
            lat1 = num("lat_1", num("lat_0"))
            lat0 = num("lat_0", lat1)
            if lat0 != lat1:
                raise NotImplementedError(
                    "proj4: lcc 1SP with lat_0 != lat_1 (the 9801 form "
                    "puts the projection origin ON the standard "
                    "parallel; a split origin is not implemented)")
            if lat1 == 0.0:
                raise NotImplementedError(
                    "proj4: lcc 1SP at the equator degenerates "
                    "(n = sin 0) — use mercator")
            pair = _lcc1sp(lat1, num("lon_0"), k0,
                           num("x_0"), num("y_0"), a, e2)
        return pair if helm is None else _on_datum(pair, a, e2, helm)
    if proj == "merc":
        # PROJ's +proj=merc is ELLIPSOIDAL by default (EPSG 9804/9805);
        # an explicitly spherical definition (+a=+b / +R — EPSG:3857's
        # canonical string) gets the spherical web-mercator kernel.
        # The two differ ~30 km at mid-latitudes, so the split is on
        # the DEFINITION, never silent.
        k = float(p.get("k", p.get("k_0", 1.0)))
        lat_ts = num("lat_ts", num("lat_1"))  # WKT Mercator_2SP → lat_1
        fe, fn = num("x_0"), num("y_0")
        lon0 = num("lon_0")
        if "r" in p or float(p.get("b", -1.0)) == float(p.get("a", -2.0)):
            if helm is not None:
                raise NotImplementedError(
                    "proj4: +towgs84 on a spherical merc (a sphere has "
                    "no geodetic datum to shift)")
            radius = float(p.get("r", p.get("a", R_a)))
            k0 = k * math.cos(math.radians(lat_ts))

            def fwd(lon, lat):
                lam = np.radians(_wrap_lon(
                    np.asarray(lon, np.float64) - lon0))
                phi = np.radians(np.clip(np.asarray(lat, np.float64),
                                         -MAX_MERC_LAT, MAX_MERC_LAT))
                return (radius * k0 * lam + fe,
                        radius * k0 * np.log(
                            np.tan(math.pi / 4.0 + phi / 2.0)) + fn)

            def inv(x, y):
                lam = (np.asarray(x, np.float64) - fe) / (radius * k0)
                phi = 2.0 * np.arctan(np.exp(
                    (np.asarray(y, np.float64) - fn) / (radius * k0))) \
                    - math.pi / 2.0
                return np.degrees(lam) + lon0, np.degrees(phi)

            return fwd, inv
        a, e2 = _proj4_ellipsoid(p)
        pair = _merc_ellipsoidal(lat_ts, k, lon0, fe, fn, a, e2)
        return pair if helm is None else _on_datum(pair, a, e2, helm)
    if proj == "sinu":
        a, e2 = _proj4_ellipsoid(p)
        pair = _sinusoidal(num("lon_0"), num("x_0"), num("y_0"), a, e2)
        return pair if helm is None else _on_datum(pair, a, e2, helm)
    if helm is not None:
        raise NotImplementedError(
            f"proj4: +towgs84 is supported on longlat/tmerc/utm/lcc/"
            f"merc/sinu only (+proj={proj} runs on the WGS84 datum)")
    if proj == "aea":
        _require_wgs84_ellipsoid(p, proj)
        return _albers(num("lat_1"), num("lat_2"), num("lat_0"),
                       num("lon_0"), num("x_0"), num("y_0"))
    if proj == "laea":
        _require_wgs84_ellipsoid(p, proj)
        return _laea(num("lat_0"), num("lon_0"), num("x_0"), num("y_0"))
    if proj == "cea":
        _require_wgs84_ellipsoid(p, proj)
        if num("x_0") or num("y_0"):
            raise NotImplementedError("proj4: cea with false offsets")
        return _cea(num("lat_ts"))
    if proj == "stere":
        _require_wgs84_ellipsoid(p, proj)
        lat0 = num("lat_0")
        if abs(lat0) != 90.0:
            raise NotImplementedError("proj4: stere is polar-only here")
        if "lat_ts" not in p and ("k" in p or "k_0" in p):
            # variant A (EPSG 9810): scale at the pole — the UPS form
            return _polar_stereo(90.0 if lat0 > 0 else -90.0,
                                 num("lon_0"), num("x_0"), num("y_0"),
                                 lat0 < 0,
                                 k0=float(p.get("k", p.get("k_0", 1.0))))
        return _polar_stereo(num("lat_ts", 90.0 if lat0 > 0 else -90.0),
                             num("lon_0"), num("x_0"), num("y_0"),
                             lat0 < 0)
    raise NotImplementedError(f"proj4: +proj={proj!r}")


# ---------------------------------------------------------------------------
# WKT1 CRS definitions (round 5): the reference's third CRS entry point
# (srs.go NewSpatialRefFromWKT). The parser lowers PROJCS/GEOGCS trees
# into the same parameter dict the proj4 path dispatches, so the two
# front-ends share every kernel and the same documented subset.
# ---------------------------------------------------------------------------

_WKT_PROJECTIONS = {
    "transverse_mercator": "tmerc",
    "lambert_conformal_conic_2sp": "lcc",
    "lambert_conformal_conic_1sp": "lcc",
    "lambert_conformal_conic": "lcc",
    "albers_conic_equal_area": "aea",
    "lambert_azimuthal_equal_area": "laea",
    "cylindrical_equal_area": "cea",
    "polar_stereographic": "stere",
    "mercator_1sp": "merc",
    "mercator_2sp": "merc",   # standard_parallel_1 → lat_1 → lat_ts
    "mercator": "merc",
    "sinusoidal": "sinu",
}

_WKT_PARAMS = {
    "latitude_of_origin": "lat_0", "latitude_of_center": "lat_0",
    "central_meridian": "lon_0", "longitude_of_center": "lon_0",
    "scale_factor": "k_0", "false_easting": "x_0",
    "false_northing": "y_0", "standard_parallel_1": "lat_1",
    "standard_parallel_2": "lat_2",
}


def _wkt_tokenize(s: str):
    """WKT1 node tree: (name, [children]); children are nodes, quoted
    strings, or numbers."""
    import re

    toks = re.findall(r'"[^"]*"|[A-Za-z_][A-Za-z0-9_]*|[-+0-9.eE]+|[\[\],()]',
                      s)
    pos = 0

    def node():
        nonlocal pos
        name = toks[pos]
        pos += 1
        if pos >= len(toks) or toks[pos] not in "[(":
            return name
        pos += 1  # [
        kids = []
        while toks[pos] not in "])":
            if toks[pos] == ",":
                pos += 1
                continue
            t = toks[pos]
            if t.startswith('"'):
                kids.append(t[1:-1])
                pos += 1
            elif t[0].isalpha() or t[0] == "_":
                kids.append(node())
            else:
                kids.append(float(t))
                pos += 1
        pos += 1  # ]
        return (name.upper(), kids)

    return node()


def _wkt_find(node, name: str):
    if isinstance(node, tuple):
        if node[0] == name:
            return node
        for k in node[1]:
            got = _wkt_find(k, name)
            if got is not None:
                return got
    return None


def from_wkt_crs(wkt: str):
    """(fwd, inv) transform pair for a WKT1 CRS string (PROJCS/GEOGCS).
    Same projection/datum subset as from_proj4; error-first beyond."""
    root = _wkt_tokenize(wkt.strip())
    if not isinstance(root, tuple) or root[0] not in ("PROJCS", "GEOGCS"):
        raise ValueError("wkt crs: expected PROJCS[...] or GEOGCS[...]")
    p: dict = {}
    sph = _wkt_find(root, "SPHEROID")
    if sph is not None:
        nums = [v for v in sph[1] if isinstance(v, float)]
        p["a"] = str(nums[0])
        if nums[1] != 0.0:
            p["rf"] = str(nums[1])
        else:
            p["b"] = str(nums[0])  # sphere
    tw = _wkt_find(root, "TOWGS84")
    if tw is not None:
        p["towgs84"] = ",".join(str(v) for v in tw[1]
                                if isinstance(v, float))
    pm = _wkt_find(root, "PRIMEM")
    if pm is not None:
        nums = [v for v in pm[1] if isinstance(v, float)]
        if nums and nums[0] != 0.0:
            p["pm"] = str(nums[0])  # degrees east of Greenwich (WKT1)
    if root[0] == "GEOGCS":
        p["proj"] = "longlat"
        return _build_transform(p)
    prj = _wkt_find(root, "PROJECTION")
    if prj is None:
        raise ValueError("wkt crs: PROJCS without PROJECTION")
    pname = str(prj[1][0]).lower()
    if pname not in _WKT_PROJECTIONS:
        raise NotImplementedError(f"wkt crs: projection {prj[1][0]!r}")
    p["proj"] = _WKT_PROJECTIONS[pname]
    unit = None
    for k in root[1]:
        if isinstance(k, tuple) and k[0] == "UNIT":
            unit = k
    if unit is not None:
        nums = [v for v in unit[1] if isinstance(v, float)]
        if nums and abs(nums[0] - 1.0) > 1e-12:
            raise NotImplementedError("wkt crs: only metre units")

    def walk_params(node):
        if isinstance(node, tuple):
            if node[0] == "PARAMETER":
                key = str(node[1][0]).lower()
                val = node[1][1]
                if key in _WKT_PARAMS:
                    p[_WKT_PARAMS[key]] = str(val)
                else:
                    raise NotImplementedError(f"wkt crs: parameter {key!r}")
            else:
                for k in node[1]:
                    walk_params(k)

    walk_params(root)
    if p["proj"] == "stere":
        # WKT Polar_Stereographic: latitude_of_origin IS the standard
        # parallel; the pole comes from its hemisphere
        ts = float(p.pop("lat_0", 90.0))
        p["lat_ts"] = str(ts)
        p["lat_0"] = "90" if ts >= 0 else "-90"
    if p["proj"] == "cea" and "lat_1" in p:
        p["lat_ts"] = p.pop("lat_1")
    if p["proj"] == "lcc" and "lat_2" not in p and "lat_1" not in p:
        p["lat_1"] = p.get("lat_0", "0")  # 1SP form
    return _build_transform(p)


_PROJ4_CACHE: dict[str, tuple] = {}


def _proj4_pair(defn: str):
    if defn not in _PROJ4_CACHE:
        if defn.lstrip()[:6].upper() in ("PROJCS", "GEOGCS"):
            _PROJ4_CACHE[defn] = from_wkt_crs(defn)
        else:
            _PROJ4_CACHE[defn] = from_proj4(defn)
    return _PROJ4_CACHE[defn]


def supported_epsg() -> list[int]:
    """Registry-backed EPSG codes (plus 4326/3857/UTM 326xx/327xx, the
    no-datum-shift geographic aliases 4269/4258, and the formulaic
    ranges epsg_to_proj4 resolves — ETRS89/NAD83/NAD27/ED50/WGS72 UTM,
    GDA94/GDA2020 MGA, DHDN GK, Arctic LAEA, UPS — which are not
    enumerated here)."""
    return sorted([4326, 3857, 4269, 4258, *_PROJ_REGISTRY])


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
