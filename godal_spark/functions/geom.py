"""Minimal computational-geometry kernel (shapely stand-in).

The reference delegates geometry to OGR/GEOS (reference godal.go:2666-2897,
WKB/WKT io godal.go:3532-3702). No GEOS binding exists in this
environment, so the engine carries its own small, deterministic kernel:

  * WKB / WKT / GeoJSON encode-decode (2-D, little-endian ISO codes) —
    geometry travels between Spark rows as WKB ``binary`` columns;
  * vectorized point-in-polygon (ray casting, numpy) — the PIP join's
    exact refine stage, the analogue of a broadcast *prepared* geometry;
  * shoelace area, bounds, centroid, distance;
  * intersects / contains predicates (bbox short-circuit + exact);
  * boolean ops (intersection / union / difference) — exact for
    axis-aligned rectilinear polygons via coordinate-grid decomposition
    (covers the reference's golden corpus: godal_test.go:2960-3021 areas
    3.0 / 1.0 / 7.0 over unit squares); convex clips via
    Sutherland–Hodgman; GENERAL polygons (concave, with holes, multi)
    via the snap-rounded overlay further down (round 2; fuzz-tested
    against containment oracles);
  * buffer (convex, arc-segmented; negative buffer may collapse to
    EMPTY — godal_test.go:2807-2811) and Douglas–Peucker simplify.

Everything here is plain numpy — inside an Arrow-batched pandas UDF this
is the same class of inner loop as GEOS's C.
"""

from __future__ import annotations

import json
import math
import struct
from dataclasses import dataclass, field

import numpy as np

# ISO WKB geometry type codes
_WKB_CODES = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
    "GeometryCollection": 7,
}
_WKB_NAMES = {v: k for k, v in _WKB_CODES.items()}


@dataclass
class Geom:
    """Tiny geometry holder.

    coords layout by type:
      Point               -> (x, y) tuple (or None for EMPTY)
      LineString          -> float ndarray (n, 2)
      Polygon             -> list[ndarray (n, 2)]  (ring 0 = shell, rest holes;
                             rings closed: first == last)
      MultiPoint          -> ndarray (n, 2)
      MultiLineString     -> list[ndarray]
      MultiPolygon        -> list[list[ndarray]]
      GeometryCollection  -> list[Geom]
    """

    type: str
    coords: object = field(default=None)

    # -- predicates -------------------------------------------------------
    @property
    def is_empty(self) -> bool:
        if self.coords is None:
            return True
        if self.type == "Point":
            return False
        if self.type in ("LineString", "MultiPoint"):
            return len(self.coords) == 0
        return len(self.coords) == 0

    @property
    def is_valid(self) -> bool:
        # structural validity (ring closure + ≥4 pts) plus the cheap GEOS
        # check the container goldens exercise: every interior ring must
        # lie inside the shell (godal_test.go:3131-3133 asserts the
        # ForceToPolygon result with an outside ring is invalid)
        if self.type == "Polygon":
            if not all(len(r) >= 4 and np.allclose(r[0], r[-1]) for r in self.coords):
                return False
            if len(self.coords) > 1:
                shell = np.asarray(self.coords[0], dtype=np.float64)
                for hole in self.coords[1:]:
                    h = np.asarray(hole, dtype=np.float64)
                    if not points_in_ring(h[:-1, 0], h[:-1, 1], shell).any():
                        return False
            return True
        if self.type == "MultiPolygon":
            return all(Geom("Polygon", p).is_valid for p in self.coords)
        return not self.is_empty

    def name(self) -> str:
        """OGR-style geometry type name (reference Geometry.Name →
        OGR_G_GetGeometryName, godal.go:2679-2681): the WKT tag in
        uppercase, e.g. 'POLYGON', 'GEOMETRYCOLLECTION'."""
        return self.type.upper()

    # -- measures ---------------------------------------------------------
    def area(self) -> float:
        """Polygon area (0.0 for non-areal types — reference godal.go:2674-2676)."""
        if self.type == "Polygon":
            return _rings_area(self.coords)
        if self.type == "MultiPolygon":
            return float(sum(_rings_area(p) for p in self.coords))
        if self.type == "GeometryCollection":
            return float(sum(g.area() for g in self.coords))
        return 0.0

    def bounds(self) -> tuple[float, float, float, float]:
        pts = self._all_points()
        if len(pts) == 0:
            return (0.0, 0.0, 0.0, 0.0)
        return (float(pts[:, 0].min()), float(pts[:, 1].min()),
                float(pts[:, 0].max()), float(pts[:, 1].max()))

    def centroid(self) -> tuple[float, float]:
        pts = self._all_points()
        return (float(pts[:, 0].mean()), float(pts[:, 1].mean()))

    def _all_points(self) -> np.ndarray:
        t, c = self.type, self.coords
        if c is None:
            return np.zeros((0, 2))
        if t == "Point":
            return np.array([c], dtype=np.float64)
        if t in ("LineString", "MultiPoint"):
            return np.asarray(c, dtype=np.float64).reshape(-1, 2)
        if t in ("Polygon", "MultiLineString"):
            return np.vstack([np.asarray(r) for r in c]) if c else np.zeros((0, 2))
        if t == "MultiPolygon":
            return np.vstack([np.asarray(r) for p in c for r in p]) if c else np.zeros((0, 2))
        if t == "GeometryCollection":
            return np.vstack([g._all_points() for g in c]) if c else np.zeros((0, 2))
        raise ValueError(t)

    def polygons(self) -> list[list[np.ndarray]]:
        """As a list of polygons (each a ring list) regardless of type."""
        if self.type == "Polygon":
            return [self.coords]
        if self.type == "MultiPolygon":
            return list(self.coords)
        if self.type == "GeometryCollection":
            return [p for g in self.coords for p in g.polygons()]
        return []


def _rings_area(rings) -> float:
    a = 0.0
    for i, r in enumerate(rings):
        r = np.asarray(r, dtype=np.float64)
        s = shoelace(r)
        a += s if i == 0 else -s
    return float(a)


def shoelace(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(abs(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1])) / 2.0)


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------

def point(x: float, y: float) -> Geom:
    return Geom("Point", (float(x), float(y)))


def box(minx: float, miny: float, maxx: float, maxy: float) -> Geom:
    ring = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
        dtype=np.float64,
    )
    return Geom("Polygon", [ring])


def polygon(shell, holes=()) -> Geom:
    rings = [_close(np.asarray(shell, dtype=np.float64))]
    rings += [_close(np.asarray(h, dtype=np.float64)) for h in holes]
    return Geom("Polygon", rings)


def multipolygon(polys: list[Geom]) -> Geom:
    return Geom("MultiPolygon", [p.coords for p in polys])


def empty(gtype: str = "Polygon") -> Geom:
    return Geom(gtype, [] if gtype != "Point" else None)


def _close(r: np.ndarray) -> np.ndarray:
    if len(r) and not np.allclose(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


# ---------------------------------------------------------------------------
# WKB
# ---------------------------------------------------------------------------

def to_wkb(g: Geom) -> bytes:
    return b"\x01" + _wkb_body(g)


def _wkb_body(g: Geom) -> bytes:
    code = _WKB_CODES[g.type]
    out = struct.pack("<I", code)
    t = g.type
    if t == "Point":
        x, y = (math.nan, math.nan) if g.coords is None else g.coords
        return out + struct.pack("<dd", x, y)
    if t == "LineString":
        pts = np.asarray(g.coords, dtype="<f8").reshape(-1, 2)
        return out + struct.pack("<I", len(pts)) + pts.tobytes()
    if t == "Polygon":
        out += struct.pack("<I", len(g.coords))
        for r in g.coords:
            r = np.asarray(r, dtype="<f8")
            out += struct.pack("<I", len(r)) + r.tobytes()
        return out
    if t == "MultiPoint":
        pts = np.asarray(g.coords, dtype=np.float64).reshape(-1, 2)
        out += struct.pack("<I", len(pts))
        for x, y in pts:
            out += b"\x01" + _wkb_body(point(x, y))
        return out
    if t == "MultiLineString":
        out += struct.pack("<I", len(g.coords))
        for ls in g.coords:
            out += b"\x01" + _wkb_body(Geom("LineString", ls))
        return out
    if t == "MultiPolygon":
        out += struct.pack("<I", len(g.coords))
        for p in g.coords:
            out += b"\x01" + _wkb_body(Geom("Polygon", p))
        return out
    if t == "GeometryCollection":
        out += struct.pack("<I", len(g.coords))
        for sub in g.coords:
            out += b"\x01" + _wkb_body(sub)
        return out
    raise ValueError(t)


def from_wkb(buf: bytes) -> Geom:
    g, _ = _parse_wkb(memoryview(buf), 0)
    return g


def _parse_wkb(mv, off: int):
    endian = "<" if mv[off] == 1 else ">"
    code = struct.unpack_from(endian + "I", mv, off + 1)[0] & 0xFF
    t = _WKB_NAMES[code]
    off += 5
    if t == "Point":
        x, y = struct.unpack_from(endian + "dd", mv, off)
        return Geom("Point", None if math.isnan(x) else (x, y)), off + 16
    if t == "LineString":
        n = struct.unpack_from(endian + "I", mv, off)[0]
        off += 4
        pts = np.frombuffer(mv, dtype=endian + "f8", count=n * 2, offset=off).reshape(n, 2).copy()
        return Geom("LineString", pts), off + 16 * n
    if t == "Polygon":
        nr = struct.unpack_from(endian + "I", mv, off)[0]
        off += 4
        rings = []
        for _ in range(nr):
            n = struct.unpack_from(endian + "I", mv, off)[0]
            off += 4
            rings.append(np.frombuffer(mv, dtype=endian + "f8", count=n * 2, offset=off).reshape(n, 2).copy())
            off += 16 * n
        return Geom("Polygon", rings), off
    # multi / collection types: n sub-geometries each with own header
    n = struct.unpack_from(endian + "I", mv, off)[0]
    off += 4
    subs = []
    for _ in range(n):
        sub, off = _parse_wkb(mv, off)
        subs.append(sub)
    if t == "MultiPoint":
        return Geom("MultiPoint", np.array([s.coords for s in subs], dtype=np.float64).reshape(-1, 2)), off
    if t == "MultiLineString":
        return Geom("MultiLineString", [s.coords for s in subs]), off
    if t == "MultiPolygon":
        return Geom("MultiPolygon", [s.coords for s in subs]), off
    return Geom("GeometryCollection", subs), off


# ---------------------------------------------------------------------------
# WKT  (enough of the grammar for the operator surface + goldens)
# ---------------------------------------------------------------------------

def to_wkt(g: Geom, digits: int | None = None) -> str:
    def fmt(v: float) -> str:
        if digits is not None:
            v = round(v, digits)
        if v == int(v):
            return str(int(v))
        return repr(float(v))

    def pts(arr):
        return ",".join(f"{fmt(p[0])} {fmt(p[1])}" for p in np.asarray(arr).reshape(-1, 2))

    t = g.type
    if g.is_empty:
        return f"{t.upper()} EMPTY"
    if t == "Point":
        return f"POINT ({fmt(g.coords[0])} {fmt(g.coords[1])})"
    if t == "LineString":
        return f"LINESTRING ({pts(g.coords)})"
    if t == "Polygon":
        return "POLYGON (" + ",".join(f"({pts(r)})" for r in g.coords) + ")"
    if t == "MultiPoint":
        return "MULTIPOINT (" + ",".join(f"({fmt(p[0])} {fmt(p[1])})" for p in g.coords) + ")"
    if t == "MultiLineString":
        return "MULTILINESTRING (" + ",".join(f"({pts(ls)})" for ls in g.coords) + ")"
    if t == "MultiPolygon":
        return ("MULTIPOLYGON ("
                + ",".join("(" + ",".join(f"({pts(r)})" for r in p) + ")" for p in g.coords)
                + ")")
    if t == "GeometryCollection":
        return "GEOMETRYCOLLECTION (" + ",".join(to_wkt(s, digits) for s in g.coords) + ")"
    raise ValueError(t)


def from_wkt(s: str) -> Geom:
    s = s.strip()
    head = s.split("(", 1)[0].strip().upper()
    rest = s[len(s.split("(", 1)[0]):].strip() if "(" in s else ""
    name_map = {k.upper(): k for k in _WKB_CODES}
    if head.endswith("EMPTY"):
        return empty(name_map[head.replace("EMPTY", "").strip()])
    t = name_map[head]
    body = rest[1:-1]  # strip outer parens

    def parse_pts(txt):
        pts = []
        for pair in txt.split(","):
            xy = pair.split()
            pts.append((float(xy[0]), float(xy[1])))
        return np.array(pts, dtype=np.float64)

    def split_groups(txt):
        """Split on top-level commas."""
        groups, depth, cur = [], 0, []
        for ch in txt:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                groups.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            groups.append("".join(cur))
        return [g.strip() for g in groups]

    if t == "Point":
        p = parse_pts(body)[0]
        return point(p[0], p[1])
    if t == "LineString":
        return Geom("LineString", parse_pts(body))
    if t == "Polygon":
        return Geom("Polygon", [parse_pts(r.strip()[1:-1]) for r in split_groups(body)])
    if t == "MultiPoint":
        pts = [parse_pts(gtxt.strip(" ()")) for gtxt in split_groups(body)]
        return Geom("MultiPoint", np.vstack(pts))
    if t == "MultiLineString":
        return Geom("MultiLineString", [parse_pts(gtxt.strip()[1:-1]) for gtxt in split_groups(body)])
    if t == "MultiPolygon":
        polys = []
        for ptxt in split_groups(body):
            ptxt = ptxt.strip()[1:-1]
            polys.append([parse_pts(r.strip()[1:-1]) for r in split_groups(ptxt)])
        return Geom("MultiPolygon", polys)
    if t == "GeometryCollection":
        return Geom("GeometryCollection", [from_wkt(gtxt) for gtxt in split_groups(body)])
    raise ValueError(t)


# ---------------------------------------------------------------------------
# GeoJSON (default 7 significant decimal digits like OGR's RFC7946 writer;
# reference golden godal_test.go:3067-3076)
# ---------------------------------------------------------------------------

def to_geojson(g: Geom, digits: int = 7) -> str:
    def rnd(arr):
        return [[round(float(x), digits), round(float(y), digits)] for x, y in np.asarray(arr).reshape(-1, 2)]

    t = g.type
    if t == "Point":
        coords = rnd([g.coords])[0]
    elif t in ("LineString", "MultiPoint"):
        coords = rnd(g.coords)
    elif t in ("Polygon", "MultiLineString"):
        coords = [rnd(r) for r in g.coords]
    elif t == "MultiPolygon":
        coords = [[rnd(r) for r in p] for p in g.coords]
    else:
        return json.dumps({
            "type": t,
            "geometries": [json.loads(to_geojson(s, digits)) for s in g.coords],
        }, separators=(", ", ": "))
    return json.dumps({"type": t, "coordinates": coords}, separators=(", ", ": "))


def from_geojson(s: str) -> Geom:
    d = json.loads(s)
    t = d["type"]
    if t == "GeometryCollection":
        return Geom(t, [from_geojson(json.dumps(x)) for x in d["geometries"]])
    c = d["coordinates"]
    if t == "Point":
        return point(c[0], c[1])
    if t in ("LineString", "MultiPoint"):
        return Geom(t, np.array(c, dtype=np.float64))
    if t in ("Polygon", "MultiLineString"):
        return Geom(t, [np.array(r, dtype=np.float64) for r in c])
    if t == "MultiPolygon":
        return Geom(t, [[np.array(r, dtype=np.float64) for r in p] for p in c])
    raise ValueError(t)


# ---------------------------------------------------------------------------
# GML io — both dialects the reference pins (godal_test.go:3078-3104):
# GML2 ("x,y x,y" coordinates) and GML3 (posList/pos, exterior/interior,
# OGC_URN srsName with geographic lat/lon axis order); import since r5
# ---------------------------------------------------------------------------

def _gml_coords(arr) -> str:
    return " ".join(f"{_numfmt(p[0])},{_numfmt(p[1])}"
                    for p in np.asarray(arr).reshape(-1, 2))


def _numfmt(v: float) -> str:
    v = float(v)
    return str(int(v)) if v == int(v) else repr(v)


# EPSG geographic codes whose OGC URN axis order is lat/lon (the GML3
# SRSNAME_FORMAT=OGC_URN axis swap in the reference golden,
# godal_test.go:3095-3099)
_GML_LATLON_URN = {4326, 4269, 4258}


def _gml_poslist(arr, swap: bool) -> str:
    pts = np.asarray(arr).reshape(-1, 2)
    if swap:
        pts = pts[:, ::-1]
    return " ".join(f"{_numfmt(p[0])} {_numfmt(p[1])}" for p in pts)


def _gml_urn_swaps(srs_name: str | None) -> bool:
    if not srs_name or not srs_name.startswith("urn:"):
        return False
    try:
        return int(srs_name.rsplit(":", 1)[1]) in _GML_LATLON_URN
    except ValueError:
        return False


def to_gml(g: Geom, srs_name: str | None = None, fmt: str = "gml2",
           srsname_format: str = "SHORT") -> str:
    """GML export, both dialects the reference pins
    (godal_test.go:3085-3104):
      * fmt='gml2' — <gml:coordinates> 'x,y x,y', outer/innerBoundaryIs;
      * fmt='gml3' — <gml:posList>/<gml:pos>, exterior/interior;
        srsname_format 'OGC_URN' emits urn:ogc:def:crs:EPSG::<code> and
        swaps to the authority's lat/lon axis order for geographic EPSG
        codes (the golden's '0 0 0 2 2 2 2 0 0 0').
    srs_name (e.g. 'EPSG:4326') lands as srsName= on the outer element.
    """
    fmt = fmt.lower()
    if fmt not in ("gml2", "gml3"):
        raise ValueError(f"GML format {fmt!r}")
    attr = ""
    swap = False
    if srs_name is not None:
        name = srs_name
        if fmt == "gml3":
            sf = srsname_format.upper()
            if sf == "OGC_URN":
                code = srs_name.split(":")[-1]
                name = f"urn:ogc:def:crs:EPSG::{code}"
                swap = _gml_urn_swaps(name)
            elif sf != "SHORT":
                raise ValueError(f"GML SRSNAME_FORMAT {srsname_format!r}")
        attr = f' srsName="{name}"'
    t = g.type

    def ring2(r, kind):
        return (f"<gml:{kind}><gml:LinearRing><gml:coordinates>"
                f"{_gml_coords(r)}</gml:coordinates></gml:LinearRing></gml:{kind}>")

    def ring3(r, kind):
        return (f"<gml:{kind}><gml:LinearRing><gml:posList>"
                f"{_gml_poslist(r, swap)}</gml:posList></gml:LinearRing></gml:{kind}>")

    if fmt == "gml2":
        if t == "Point":
            return f"<gml:Point{attr}><gml:coordinates>{_gml_coords([g.coords])}</gml:coordinates></gml:Point>"
        if t == "LineString":
            return f"<gml:LineString{attr}><gml:coordinates>{_gml_coords(g.coords)}</gml:coordinates></gml:LineString>"
        if t == "Polygon":
            parts = [ring2(g.coords[0], "outerBoundaryIs")]
            parts += [ring2(h, "innerBoundaryIs") for h in g.coords[1:]]
            return f"<gml:Polygon{attr}>" + "".join(parts) + "</gml:Polygon>"
        if t == "MultiPolygon":
            inner = "".join(
                f"<gml:polygonMember>{to_gml(Geom('Polygon', p))}</gml:polygonMember>"
                for p in g.coords)
            return f"<gml:MultiPolygon{attr}>{inner}</gml:MultiPolygon>"
        raise NotImplementedError(f"GML export for {t}")
    # gml3
    if t == "Point":
        return f"<gml:Point{attr}><gml:pos>{_gml_poslist([g.coords], swap)}</gml:pos></gml:Point>"
    if t == "LineString":
        return f"<gml:LineString{attr}><gml:posList>{_gml_poslist(g.coords, swap)}</gml:posList></gml:LineString>"
    if t == "Polygon":
        parts = [ring3(g.coords[0], "exterior")]
        parts += [ring3(h, "interior") for h in g.coords[1:]]
        return f"<gml:Polygon{attr}>" + "".join(parts) + "</gml:Polygon>"
    if t == "MultiPolygon":
        # rings built inline (not via a nested to_gml call) so the URN
        # axis swap from the OUTER srsName applies to every member
        inner = "".join(
            "<gml:surfaceMember><gml:Polygon>"
            + "".join([ring3(p[0], "exterior")]
                      + [ring3(h, "interior") for h in p[1:]])
            + "</gml:Polygon></gml:surfaceMember>" for p in g.coords)
        return f"<gml:MultiSurface{attr}>{inner}</gml:MultiSurface>"
    raise NotImplementedError(f"GML export for {t}")


def from_gml(s: str) -> Geom:
    """GML import (round 5: full parser for both exported dialects plus
    attribute-carrying elements). Handles gml:coordinates ('x,y x,y'),
    gml:posList / gml:pos (flat 'x y x y'), outer/innerBoundaryIs and
    exterior/interior rings, MultiPolygon / MultiSurface, MultiPoint and
    MultiLineString, and undoes the OGC-URN lat/lon axis swap when
    srsName is a geographic EPSG urn."""
    import re

    s = s.strip()
    s = re.sub(r"^<\?xml[^?]*\?>\s*", "", s)
    head = re.match(r"<gml:(\w+)([^>]*)>", s)
    if not head:
        raise ValueError("unrecognized GML")
    tag = head.group(1)
    srs = re.search(r'srsName="([^"]*)"', head.group(2) or "")
    swap = _gml_urn_swaps(srs.group(1) if srs else None)

    def coords_in(txt: str) -> np.ndarray:
        m = re.search(r"<gml:coordinates[^>]*>([^<]*)</gml:coordinates>", txt)
        if m:
            pts = np.array([tuple(map(float, pair.split(",")))
                            for pair in m.group(1).split()], dtype=np.float64)
        else:
            m = re.search(r"<gml:(?:posList|pos)[^>]*>([^<]*)</gml:(?:posList|pos)>", txt)
            if not m:
                raise ValueError("GML element without coordinates/posList")
            flat = np.array([float(v) for v in m.group(1).split()],
                            dtype=np.float64)
            pts = flat.reshape(-1, 2)
        return pts[:, ::-1] if swap else pts

    def rings_in(txt: str) -> list:
        return [_close(coords_in(m)) for m in re.findall(
            r"<gml:LinearRing[^>]*>.*?</gml:LinearRing>", txt, re.S)]

    if tag == "Point":
        p = coords_in(s)[0]
        return point(p[0], p[1])
    if tag == "LineString":
        return Geom("LineString", coords_in(s))
    if tag == "Polygon":
        return Geom("Polygon", rings_in(s))
    if tag in ("MultiPolygon", "MultiSurface"):
        polys = [rings_in(m) for m in re.findall(
            r"<gml:Polygon[^>]*>.*?</gml:Polygon>", s, re.S)]
        return Geom("MultiPolygon", polys)
    if tag == "MultiPoint":
        pts = np.vstack([coords_in(m) for m in re.findall(
            r"<gml:Point[^>]*>.*?</gml:Point>", s, re.S)])
        return Geom("MultiPoint", pts)
    if tag in ("MultiLineString", "MultiCurve"):
        lines = [coords_in(m) for m in re.findall(
            r"<gml:LineString[^>]*>.*?</gml:LineString>", s, re.S)]
        return Geom("MultiLineString", lines)
    raise ValueError("unrecognized GML")


# ---------------------------------------------------------------------------
# point-in-polygon — the vectorized "prepared geometry" refine stage
# ---------------------------------------------------------------------------

def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast; boundary points count as inside
    (matches GDAL rasterize center-point inclusion for our goldens).

    Chunked over points so the (points x segments) temporaries stay
    inside cache-friendly bounds: unchunked, 100k points against a
    2,000-vertex ring allocated ~1.6 GB PER temporary and ran 78 s;
    chunked it's ~2 s for identical output (round-4 finding)."""
    ring = np.asarray(ring, dtype=np.float64)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n, s = len(px), len(x0)
    if s >= 256 and n >= 64:
        return _points_in_ring_banded(px, py, x0, y0, x1, y1)
    chunk = max(256, (1 << 22) // max(s, 1))
    if n <= chunk:
        return _points_in_ring_block(px[:, None], py[:, None],
                                     x0, y0, x1, y1)
    out = np.empty(n, dtype=bool)
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        out[lo:hi] = _points_in_ring_block(px[lo:hi, None],
                                           py[lo:hi, None], x0, y0, x1, y1)
    return out


def _points_in_ring_banded(px, py, x0, y0, x1, y1, eps=1e-12):
    """Exact y-banded ray cast for BIG rings (round 5c): the crossing
    test only ever involves segments whose eps-padded y-span contains
    the point's y, and every such segment lands in the point's band, so
    testing only the band's segment list returns bit-identical results
    to the full O(points × segments) block at ~O(points × s/bands) —
    the overlay classification against jagged 2,000-vertex rings went
    superquadratic through this kernel (6.2 s per intersection)."""
    n, s = px.size, x0.size
    ylo = min(float(y0.min()), float(y1.min())) - eps
    yhi = max(float(y0.max()), float(y1.max())) + eps
    nb = int(np.clip(s // 8, 16, 4096))
    bh = (yhi - ylo) / nb
    if bh <= 0:
        return _points_in_ring_block(px[:, None], py[:, None],
                                     x0, y0, x1, y1)
    out = np.zeros(n, dtype=bool)
    inr = (py >= ylo) & (py <= yhi)   # outside the y-range: False
    pb = np.clip(((py - ylo) / bh).astype(np.int64), 0, nb - 1)
    # CSR of segments per band (a segment spans [slo, shi] bands)
    slo = np.clip(((np.minimum(y0, y1) - eps - ylo) / bh).astype(np.int64),
                  0, nb - 1)
    shi = np.clip(((np.maximum(y0, y1) + eps - ylo) / bh).astype(np.int64),
                  0, nb - 1)
    cnt = shi - slo + 1
    rep = np.repeat(np.arange(s), cnt)
    base = np.cumsum(cnt) - cnt
    band_of = slo[rep] + (np.arange(rep.size) - base[rep])
    o = np.argsort(band_of, kind="stable")
    segs_sorted = rep[o]
    starts = np.searchsorted(band_of[o], np.arange(nb + 1))
    # points grouped by band
    pidx = np.nonzero(inr)[0]
    po = pidx[np.argsort(pb[pidx], kind="stable")]
    pstarts = np.searchsorted(pb[po], np.arange(nb + 1))
    for b in range(nb):
        ps = po[pstarts[b]:pstarts[b + 1]]
        if ps.size == 0:
            continue
        ss = segs_sorted[starts[b]:starts[b + 1]]
        if ss.size == 0:
            continue
        out[ps] = _points_in_ring_block(px[ps][:, None], py[ps][:, None],
                                        x0[ss], y0[ss], x1[ss], y1[ss])
    return out


def _points_in_ring_block(px, py, x0, y0, x1, y1) -> np.ndarray:
    cond = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / np.where(y1 == y0, np.inf, (y1 - y0))
    inside = np.where(cond, px < xint, False).sum(axis=1) % 2 == 1
    # boundary: point exactly on a segment — needed only where the ray
    # cast said OUTSIDE (an on-boundary point that cast True is already
    # in; the or below makes the answers identical)
    miss = ~inside
    if miss.any():
        inside[miss] |= _on_segment(px[miss], py[miss],
                                    x0, y0, x1, y1).any(axis=1)
    return inside


def _on_segment(px, py, x0, y0, x1, y1, eps=1e-12):
    cross = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    within = ((px >= np.minimum(x0, x1) - eps) & (px <= np.maximum(x0, x1) + eps)
              & (py >= np.minimum(y0, y1) - eps) & (py <= np.maximum(y0, y1) + eps))
    return (np.abs(cross) < eps) & within


def points_in_polygon(px, py, g: Geom) -> np.ndarray:
    """Vectorized containment over all polygon parts (shell minus holes)."""
    px = np.asarray(px, dtype=np.float64)
    out = np.zeros(len(px), dtype=bool)
    for rings in g.polygons():
        m = points_in_ring(px, py, rings[0])
        for hole in rings[1:]:
            m &= ~points_in_ring(px, py, hole)
        out |= m
    return out


class Prepared:
    """Broadcast-side prepared geometry: bbox pre-test + ring arrays cached."""

    def __init__(self, g: Geom):
        self.g = g
        self.bbox = g.bounds()

    def contains_points(self, px, py) -> np.ndarray:
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        minx, miny, maxx, maxy = self.bbox
        cand = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
        out = np.zeros(len(px), dtype=bool)
        if cand.any():
            out[cand] = points_in_polygon(px[cand], py[cand], self.g)
        return out


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------

def bbox_intersects(a: Geom, b: Geom) -> bool:
    a0, a1, a2, a3 = a.bounds()
    b0, b1, b2, b3 = b.bounds()
    return not (a2 < b0 or b2 < a0 or a3 < b1 or b3 < a1)


def intersects(a: Geom, b: Geom) -> bool:
    """Exact intersects for point/polygon/linestring combos (GEOS-present
    semantics of reference godal.go:2800-2811)."""
    if not bbox_intersects(a, b):
        return False
    if a.type == "Point" and b.type == "Point":
        return bool(np.allclose(a.coords, b.coords))
    if a.type == "Point":
        if b.polygons():
            return bool(points_in_polygon([a.coords[0]], [a.coords[1]], b)[0])
        return _any_vertex_touch(a, b)
    if b.type == "Point":
        return intersects(b, a)
    # polygon/polygon or line cases: vertex containment either way, or edge crossing
    if _any_vertex_in(a, b) or _any_vertex_in(b, a):
        return True
    return _edges_cross(a, b)


def map_coords(g: Geom, fn) -> Geom:
    """Apply a vectorized coordinate mapping ``fn(x_arr, y_arr) ->
    (x'_arr, y'_arr)`` to every vertex, returning a new Geom of the same
    type — e.g. moving a geometry into pixel space (affine, so incidence
    topology is preserved) for exact per-pixel footprint tests."""
    t, c = g.type, g.coords
    if c is None:
        return Geom(t, None)

    def arr(a):
        a = np.asarray(a, dtype=np.float64).reshape(-1, 2)
        nx, ny = fn(a[:, 0], a[:, 1])
        return np.column_stack([np.asarray(nx, np.float64),
                                np.asarray(ny, np.float64)])

    if t == "Point":
        nx, ny = fn(np.array([c[0]]), np.array([c[1]]))
        return Geom(t, (float(nx[0]), float(ny[0])))
    if t in ("LineString", "MultiPoint"):
        return Geom(t, arr(c))
    if t in ("Polygon", "MultiLineString"):
        return Geom(t, [arr(r) for r in c])
    if t == "MultiPolygon":
        return Geom(t, [[arr(r) for r in rings] for rings in c])
    if t == "GeometryCollection":
        return Geom(t, [map_coords(gg, fn) for gg in c])
    raise ValueError(f"map_coords: unsupported type {t!r}")


def boxes_intersect_geom(minx, miny, maxx, maxy, g: Geom, *,
                         chunk: int = 2048) -> np.ndarray:
    """Vectorized ``intersects(box(minx[i], ...), g)`` for N axis-aligned
    boxes against ONE geometry — the batched kernel behind the
    all-touched rasterize path (a per-pixel Python loop before round 4).

    Same decomposition as :func:`intersects` for box/polygon pairs:
    geometry vertex inside a box, box corner inside the geometry, or a
    proper edge crossing (the strict d1*d2<0 & d3*d4<0 test of
    ``_polyline_cross``). Chunked so the (boxes x segments) orientation
    arrays stay bounded."""
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    out = np.zeros(len(minx), dtype=bool)
    g0, g1, g2, g3 = g.bounds()
    cand = ~((maxx < g0) | (g2 < minx) | (maxy < g1) | (g3 < miny))
    if not cand.any():
        return out
    idx = np.flatnonzero(cand)
    pts = g._all_points()
    seg_list = [s for s in _segments(g) if len(s) >= 2]
    if seg_list:
        C = np.concatenate([s[:-1] for s in seg_list]).astype(np.float64)
        D = np.concatenate([s[1:] for s in seg_list]).astype(np.float64)
    eps = 1e-12
    for lo in range(0, len(idx), chunk):
        ii = idx[lo:lo + chunk]
        bx0, by0 = minx[ii], miny[ii]
        bx1, by1 = maxx[ii], maxy[ii]
        m = np.zeros(len(ii), dtype=bool)
        if len(pts):
            vx, vy = pts[:, 0][None, :], pts[:, 1][None, :]
            m |= ((vx >= bx0[:, None] - eps) & (vx <= bx1[:, None] + eps)
                  & (vy >= by0[:, None] - eps)
                  & (vy <= by1[:, None] + eps)).any(axis=1)
        rem = np.flatnonzero(~m)
        if len(rem) and g.polygons():
            cxs = np.stack([bx0, bx1, bx1, bx0], axis=1)[rem]
            cys = np.stack([by0, by0, by1, by1], axis=1)[rem]
            hit = points_in_polygon(cxs.ravel(), cys.ravel(), g) \
                .reshape(-1, 4).any(axis=1)
            m[rem[hit]] = True
            rem = rem[~hit]
        if len(rem) and seg_list:
            # proper crossing of a geometry segment with any of the 4
            # box edges, all boxes at once: (r, 4, S) orientation tests
            x0b, y0b = bx0[rem], by0[rem]
            x1b, y1b = bx1[rem], by1[rem]
            ax = np.stack([x0b, x1b, x1b, x0b], axis=1)[:, :, None]
            ay = np.stack([y0b, y0b, y1b, y1b], axis=1)[:, :, None]
            bx = np.stack([x1b, x1b, x0b, x0b], axis=1)[:, :, None]
            by = np.stack([y0b, y1b, y1b, y0b], axis=1)[:, :, None]
            cx, cy = C[:, 0][None, None, :], C[:, 1][None, None, :]
            dx, dy = D[:, 0][None, None, :], D[:, 1][None, None, :]
            d1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            d2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
            d3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
            d4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
            crossed = ((d1 * d2 < 0) & (d3 * d4 < 0)).any(axis=(1, 2))
            m[rem[crossed]] = True
        out[ii] = m
    return out


def _any_vertex_in(a: Geom, b: Geom) -> bool:
    if not b.polygons():
        return False
    pts = a._all_points()
    if len(pts) == 0:
        return False
    return bool(points_in_polygon(pts[:, 0], pts[:, 1], b).any())


def _any_vertex_touch(a: Geom, b: Geom) -> bool:
    pts = b._all_points()
    return bool(np.any(np.all(np.isclose(pts, np.asarray(a.coords)), axis=1)))


def _segments(g: Geom):
    segs = []
    if g.type in ("LineString",):
        arr = np.asarray(g.coords)
        segs.append(arr)
    for rings in g.polygons():
        segs.extend(rings)
    if g.type == "MultiLineString":
        segs.extend(np.asarray(ls) for ls in g.coords)
    return segs


def _edges_cross(a: Geom, b: Geom) -> bool:
    for ra in _segments(a):
        for rb in _segments(b):
            if _polyline_cross(ra, rb):
                return True
    return False


def _polyline_cross(p: np.ndarray, q: np.ndarray) -> bool:
    ax, ay, bx, by = p[:-1, 0], p[:-1, 1], p[1:, 0], p[1:, 1]
    cx, cy, dx, dy = q[:-1, 0], q[:-1, 1], q[1:, 0], q[1:, 1]
    # pairwise orientation tests (n × m)
    def orient(ox, oy, pxx, pyy, qxx, qyy):
        return (pxx - ox) * (qyy - oy) - (pyy - oy) * (qxx - ox)

    AX, CX = ax[:, None], cx[None, :]
    AY, CY = ay[:, None], cy[None, :]
    BX, DX = bx[:, None], dx[None, :]
    BY, DY = by[:, None], dy[None, :]
    d1 = orient(AX, AY, BX, BY, CX, CY)
    d2 = orient(AX, AY, BX, BY, DX, DY)
    d3 = orient(CX, CY, DX, DY, AX, AY)
    d4 = orient(CX, CY, DX, DY, BX, BY)
    return bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0)))


def contains(a: Geom, b: Geom) -> bool:
    """a contains b (vertex-complete test; exact for convex/rectilinear)."""
    pts = b._all_points()
    if len(pts) == 0 or not a.polygons():
        return False
    return bool(points_in_polygon(pts[:, 0], pts[:, 1], a).all())


# ---------------------------------------------------------------------------
# boolean ops
# ---------------------------------------------------------------------------

def _is_rectilinear(g: Geom) -> bool:
    for rings in g.polygons():
        for r in rings:
            dx = np.diff(r[:, 0])
            dy = np.diff(r[:, 1])
            if not np.all((dx == 0) | (dy == 0)):
                return False
    return bool(g.polygons())


def _grid_decompose(a: Geom, b: Geom):
    """Coordinate-grid decomposition: unique xs/ys from both polys carve the
    plane into cells; classify each cell center against A and B. Exact for
    axis-aligned rectilinear inputs."""
    pts = np.vstack([a._all_points(), b._all_points()])
    xs = np.unique(pts[:, 0])
    ys = np.unique(pts[:, 1])
    cx = (xs[:-1] + xs[1:]) / 2.0
    cy = (ys[:-1] + ys[1:]) / 2.0
    gx, gy = np.meshgrid(cx, cy)
    in_a = points_in_polygon(gx.ravel(), gy.ravel(), a).reshape(gx.shape)
    in_b = points_in_polygon(gx.ravel(), gy.ravel(), b).reshape(gx.shape)
    return xs, ys, in_a, in_b


def _cells_to_geom(xs, ys, mask) -> Geom:
    """Merge selected grid cells into a MultiPolygon of row-run rectangles.
    (Area-exact; does not dissolve shared edges between rows — area and
    containment semantics are what downstream consumers use.)"""
    polys = []
    for j in range(mask.shape[0]):
        i = 0
        while i < mask.shape[1]:
            if mask[j, i]:
                k = i
                while k + 1 < mask.shape[1] and mask[j, k + 1]:
                    k += 1
                polys.append(box(xs[i], ys[j], xs[k + 1], ys[j + 1]).coords)
                i = k + 1
            else:
                i += 1
    if not polys:
        return empty("Polygon")
    if len(polys) == 1:
        return Geom("Polygon", polys[0])
    return Geom("MultiPolygon", polys)


def _boolean(a: Geom, b: Geom, op: str) -> Geom:
    if _is_rectilinear(a) and _is_rectilinear(b):
        xs, ys, in_a, in_b = _grid_decompose(a, b)
        mask = {"intersection": in_a & in_b, "union": in_a | in_b,
                "difference": in_a & ~in_b}[op]
        return _cells_to_geom(xs, ys, mask)
    # Sutherland–Hodgman is only SAFE for convex SUBJECTS: clipping a
    # concave subject bridges multi-component results into one bogus
    # ring (found by the star-polygon fuzz test). Convex ∩ convex is the
    # one shape where it's exact — everything else takes the general
    # overlay. (It also drops subject holes, hence the hole guards.)
    if op == "intersection" and _is_convex(a) and _is_convex(b):
        return _sutherland_hodgman(b, a)
    return _overlay(a, b, op)


# -- general (concave, holes) overlay ----------------------------------------
#
# Classic boundary-subdivision overlay (the structure GEOS'
# OverlayNG implements industrially, godal.go:2814-2853 semantics):
# split every boundary edge of A at its intersections with B's boundary
# (and vice versa), classify each sub-edge's midpoint against the other
# polygon (in / out / on), keep the subset the op calls for, then stitch
# the kept directed edges back into rings and sort shells/holes by
# signed area. Exact for polygons in general position incl. shared
# edges; coincident-boundary degeneracies beyond that are handled by
# duplicate/opposite edge cancellation + zero-area ring filtering.

def _signed_ring_area(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) / 2.0


def _orient_polys(g: Geom) -> list[list[np.ndarray]]:
    """Canonical orientation: shells CCW, holes CW."""
    out = []
    for rings in g.polygons():
        rr = []
        for i, r in enumerate(rings):
            r = np.asarray(r, dtype=np.float64)
            ccw = _signed_ring_area(r) > 0
            if ccw != (i == 0):
                r = r[::-1].copy()
            rr.append(r)
        out.append(rr)
    return out


def _directed_edges(polys) -> list[tuple[tuple, tuple]]:
    edges = []
    for rings in polys:
        for r in rings:
            for i in range(len(r) - 1):
                p = (float(r[i, 0]), float(r[i, 1]))
                q = (float(r[i + 1, 0]), float(r[i + 1, 1]))
                if p != q:
                    edges.append((p, q))
    return edges


def _seg_intersections(p, q, a, b, eps=1e-12):
    """[(t, u, point)] where segment pq meets segment ab. The point is
    computed ONCE and shared by both segments' subdivisions — computing
    it independently from each segment's parametrization produces
    last-digit disagreements that split the stitch graph (fuzz-found)."""
    rx, ry = q[0] - p[0], q[1] - p[1]
    sx, sy = b[0] - a[0], b[1] - a[1]
    den = rx * sy - ry * sx
    wx, wy = a[0] - p[0], a[1] - p[1]
    scale = max(1.0, abs(rx), abs(ry))
    out = []
    if abs(den) < eps * scale:
        if abs(wx * ry - wy * rx) > eps * scale:
            return out
        rr = rx * rx + ry * ry
        ss = sx * sx + sy * sy
        if rr == 0 or ss == 0:
            return out
        # collinear overlap: cut pq at ab's endpoints and vice versa —
        # the shared points are exact input vertices
        for u_end, pt in ((0.0, a), (1.0, b)):
            t = ((pt[0] - p[0]) * rx + (pt[1] - p[1]) * ry) / rr
            if -eps <= t <= 1 + eps:
                out.append((t, u_end, (float(pt[0]), float(pt[1]))))
        for t_end, pt in ((0.0, p), (1.0, q)):
            u = ((pt[0] - a[0]) * sx + (pt[1] - a[1]) * sy) / ss
            if -eps <= u <= 1 + eps:
                out.append((t_end, u, (float(pt[0]), float(pt[1]))))
        return out
    t = (wx * sy - wy * sx) / den
    u = (wx * ry - wy * rx) / den
    if -eps <= u <= 1 + eps and -eps <= t <= 1 + eps:
        pt = (p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1]))
        out.append((t, u, pt))
    return out


def _subdivide_pair(ea, eb, eps=1e-12):
    """Subdivide BOTH edge sets at their mutual intersections, sharing
    each intersection point between the two cut lists."""
    cuts_a: list[list] = [[] for _ in ea]
    cuts_b: list[list] = [[] for _ in eb]
    # vectorized bbox prefilter: only segment pairs whose eps-padded
    # bboxes overlap can intersect — the exact test (a Python call per
    # pair) was O(Ea*Eb) on every pair: 4M calls / ~4.5 s for two
    # 2,000-vertex rings, vs ~1% surviving the prefilter (round 4)
    if ea and eb:
        A = np.asarray([(p[0], p[1], q[0], q[1]) for p, q in ea])
        B = np.asarray([(p[0], p[1], q[0], q[1]) for p, q in eb])
        # pad matches the exact test's RELATIVE tolerance (eps * scale
        # with scale up to the coordinate magnitude), so the prefilter
        # can never drop a pair the exact test would accept
        pad = eps * 4 * (1.0 + max(np.abs(A).max(), np.abs(B).max()))
        aminx = np.minimum(A[:, 0], A[:, 2])[:, None] - pad
        amaxx = np.maximum(A[:, 0], A[:, 2])[:, None] + pad
        aminy = np.minimum(A[:, 1], A[:, 3])[:, None] - pad
        amaxy = np.maximum(A[:, 1], A[:, 3])[:, None] + pad
        bminx = np.minimum(B[:, 0], B[:, 2])[None, :]
        bmaxx = np.maximum(B[:, 0], B[:, 2])[None, :]
        bminy = np.minimum(B[:, 1], B[:, 3])[None, :]
        bmaxy = np.maximum(B[:, 1], B[:, 3])[None, :]
        overlap = ((aminx <= bmaxx) & (bminx <= amaxx)
                   & (aminy <= bmaxy) & (bminy <= amaxy))
        cand_i, cand_j = np.nonzero(overlap)
    else:
        cand_i = cand_j = ()
    for i, j in zip(cand_i, cand_j):
        p, q = ea[i]
        c, d = eb[j]
        for t, u, pt in _seg_intersections(p, q, c, d):
            if eps < t < 1 - eps:
                cuts_a[i].append((t, pt))
            if eps < u < 1 - eps:
                cuts_b[j].append((u, pt))

    def build(edges, cuts):
        out = []
        for (p, q), cl in zip(edges, cuts):
            pts = [p] + [pt for _, pt in sorted(cl)] + [q]
            for i in range(len(pts) - 1):
                if pts[i] != pts[i + 1]:
                    out.append((pts[i], pts[i + 1]))
        return out

    return build(ea, cuts_a), build(eb, cuts_b)


def _side_classify(edges, other: Geom, scale: float):
    """Per sub-edge: (left_in, right_in) — is a point nudged just off the
    edge's left/right side inside `other`? Uniformly resolves shared
    boundaries: an edge lying ON the other boundary reports the side the
    other interior actually occupies, no 'on' special-casing."""
    if not edges:
        return []
    P = np.array([e[0] for e in edges], dtype=np.float64)
    Q = np.array([e[1] for e in edges], dtype=np.float64)
    mid = (P + Q) / 2
    d = Q - P
    ln = np.hypot(d[:, 0], d[:, 1])
    ln = np.where(ln == 0, 1.0, ln)
    nx, ny = -d[:, 1] / ln, d[:, 0] / ln  # unit left normal
    eps = 1e-7 * max(scale, 1.0)
    lin = points_in_polygon(mid[:, 0] + nx * eps, mid[:, 1] + ny * eps, other)
    rin = points_in_polygon(mid[:, 0] - nx * eps, mid[:, 1] - ny * eps, other)
    return list(zip(lin, rin))


def _stitch(edges) -> list[np.ndarray]:
    """Closed rings from directed edges; at multi-way junctions take the
    leftmost (most counterclockwise) turn, which closes the tightest
    consistently-oriented loop."""
    # tolerance snap: map each endpoint to a canonical representative
    # within ~1e-9 (plain rounding can split two renderings of the same
    # point across a grid boundary — fuzz-found seam)
    from collections import Counter, defaultdict

    tol = 1e-9
    reps: dict = {}

    # integer fast path (pixel-grid dissolve feeds exact integers): the
    # 9-probe fuzzy snap per endpoint dominated large dissolves (r4)
    all_int = all(float(c).is_integer()
                  for p, q in edges for c in (*p, *q))

    def key(pt):
        if all_int:
            return (pt[0], pt[1])
        gx, gy = round(pt[0] / tol), round(pt[1] / tol)
        for dx in (0, -1, 1):
            for dy in (0, -1, 1):
                r = reps.get((gx + dx, gy + dy))
                if r is not None and abs(r[0] - pt[0]) <= tol \
                        and abs(r[1] - pt[1]) <= tol:
                    return r
        reps[(gx, gy)] = pt
        return pt

    # cancel duplicate / opposite directed edges
    bag = Counter()
    for p, q in edges:
        kp, kq = key(p), key(q)
        if kp == kq:
            continue
        if bag[(kq, kp)] > 0:
            bag[(kq, kp)] -= 1  # opposite edges annihilate
        else:
            bag[(kp, kq)] += 1
    uniq = [e for e, n in bag.items() if n > 0]
    outs = defaultdict(list)
    for (p, q) in uniq:
        outs[p].append((p, q))
    used = set()
    rings = []
    for start in uniq:
        if start in used:
            continue
        ring = [start[0]]
        walk = []  # commit to `used` only if the ring closes — a failed
        # walk must not consume edges other components still need
        walk_set = set()  # incremental membership (used.union(walk)
        # per step was O(walk^2) — quadratic on long rings, r4)
        cur = start
        for _ in range(len(uniq) + 1):
            walk.append(cur)
            walk_set.add(cur)
            ring.append(cur[1])
            if cur[1] == start[0]:
                break
            cands = [e for e in outs[cur[1]]
                     if e not in used and e not in walk_set]
            if not cands:
                ring = None
                break
            if len(cands) == 1:
                cur = cands[0]
                continue
            din = (cur[1][0] - cur[0][0], cur[1][1] - cur[0][1])

            def turn(e):
                d = (e[1][0] - e[0][0], e[1][1] - e[0][1])
                return math.atan2(din[0] * d[1] - din[1] * d[0],
                                  din[0] * d[0] + din[1] * d[1])

            cur = max(cands, key=turn)
        else:
            ring = None
        if ring and len(ring) >= 4:
            used.update(walk)
            rings.append(np.array(ring, dtype=np.float64))
        else:
            used.add(start)  # dangling start — never retry, release the rest
    return rings


def _assemble(rings) -> Geom:
    rings = [r for r in rings if abs(_signed_ring_area(r)) > 1e-12]
    shells = [r for r in rings if _signed_ring_area(r) > 0]
    holes = [r for r in rings if _signed_ring_area(r) < 0]
    if not shells:
        return empty("Polygon")
    polys = [[s] for s in shells]
    # bbox prefilter + cached shell areas: a hole's bbox is contained in
    # its parent shell's bbox (nesting, boundary contact allowed), so
    # most shell candidates reject on four comparisons instead of a full
    # every-vertex ray cast (the classification dominated large
    # multi-part dissolves, r4)
    eps = 1e-9
    shell_bb = [(s[:, 0].min(), s[:, 1].min(), s[:, 0].max(), s[:, 1].max())
                for s in shells]
    shell_area = [abs(_signed_ring_area(s)) for s in shells]
    for hole in holes:
        hb = (hole[:, 0].min(), hole[:, 1].min(),
              hole[:, 0].max(), hole[:, 1].max())
        best, best_area = None, None
        for i, p in enumerate(polys):
            sb = shell_bb[i]
            if (hb[0] < sb[0] - eps or hb[1] < sb[1] - eps
                    or hb[2] > sb[2] + eps or hb[3] > sb[3] + eps):
                continue
            if best is not None and shell_area[i] >= best_area:
                continue  # can't beat the current tightest parent
            inside = points_in_ring(hole[:-1, 0], hole[:-1, 1], p[0])
            if inside.any():
                best, best_area = i, shell_area[i]
        if best is not None:
            polys[best].append(hole)
    if len(polys) == 1:
        return Geom("Polygon", polys[0])
    return Geom("MultiPolygon", polys)


def _overlay(a: Geom, b: Geom, op: str) -> Geom:
    pa, pb = _orient_polys(a), _orient_polys(b)
    if not pa or not pb:
        if op == "intersection":
            return empty("Polygon")
        if op == "union":
            return a if pa else b
        return a if op == "difference" else empty("Polygon")
    ea, eb = _directed_edges(pa), _directed_edges(pb)
    sa, sb = _subdivide_pair(ea, eb)
    ba, bb = a.bounds(), b.bounds()
    scale = max(abs(v) for v in (*ba, *bb, ba[2] - ba[0], ba[3] - ba[1],
                                 bb[2] - bb[0], bb[3] - bb[1]))
    ca = _side_classify(sa, b, scale)
    cb = _side_classify(sb, a, scale)
    keep = []
    # A/B edges are oriented with their own interior on the LEFT
    # (shells CCW, holes CW); result edges must keep the RESULT's
    # interior on the left:
    if op == "intersection":
        keep += [e for e, (left, _) in zip(sa, ca) if left]
        keep += [e for e, (left, _) in zip(sb, cb) if left]
    elif op == "union":
        keep += [e for e, (_, right) in zip(sa, ca) if not right]
        keep += [e for e, (_, right) in zip(sb, cb) if not right]
    elif op == "difference":
        keep += [e for e, (left, _) in zip(sa, ca) if not left]
        keep += [(q, p) for (p, q), (_, right) in zip(sb, cb) if right]
    else:
        raise ValueError(op)
    return _assemble(_stitch(keep))


def intersection(a: Geom, b: Geom) -> Geom:
    return _boolean(a, b, "intersection")


def union(a: Geom, b: Geom) -> Geom:
    return _boolean(a, b, "union")


def difference(a: Geom, b: Geom) -> Geom:
    return _boolean(a, b, "difference")


def _is_convex(g: Geom) -> bool:
    polys = g.polygons()
    if len(polys) != 1 or len(polys[0]) != 1:
        return False
    r = polys[0][0]
    d = np.diff(r, axis=0)
    # include the wrap-around turn at the closing vertex — without it a
    # polygon concave exactly at vertex 0 passes as convex (caught by
    # the star-polygon fuzz test) and the S-H fast path miscomputes
    d = np.vstack([d, d[:1]])
    cross = d[:-1, 0] * d[1:, 1] - d[:-1, 1] * d[1:, 0]
    return bool(np.all(cross >= 0) or np.all(cross <= 0))


def _sutherland_hodgman(subject: Geom, clip: Geom) -> Geom:
    crings = clip.polygons()[0][0]
    # ensure CCW clip ring
    x, y = crings[:-1, 0], crings[:-1, 1]
    if (np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) < 0:
        crings = crings[::-1]
    out_polys = []
    for rings in subject.polygons():
        pts = list(map(tuple, rings[0][:-1]))
        for i in range(len(crings) - 1):
            if not pts:
                break
            cx0, cy0 = crings[i]
            cx1, cy1 = crings[i + 1]
            new_pts = []
            for j, cur in enumerate(pts):
                prev = pts[j - 1]
                side_cur = (cx1 - cx0) * (cur[1] - cy0) - (cy1 - cy0) * (cur[0] - cx0)
                side_prev = (cx1 - cx0) * (prev[1] - cy0) - (cy1 - cy0) * (prev[0] - cx0)
                if side_cur >= 0:
                    if side_prev < 0:
                        new_pts.append(_seg_line_int(prev, cur, (cx0, cy0), (cx1, cy1)))
                    new_pts.append(cur)
                elif side_prev >= 0:
                    new_pts.append(_seg_line_int(prev, cur, (cx0, cy0), (cx1, cy1)))
            pts = new_pts
        if len(pts) >= 3:
            out_polys.append([_close(np.array(pts, dtype=np.float64))])
    if not out_polys:
        return empty("Polygon")
    if len(out_polys) == 1:
        return Geom("Polygon", out_polys[0])
    return Geom("MultiPolygon", out_polys)


def _seg_line_int(p, q, a, b):
    x1, y1 = p
    x2, y2 = q
    x3, y3 = a
    x4, y4 = b
    den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
    return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))


# ---------------------------------------------------------------------------
# geometry container API (godal.go:2683-2795; goldens godal_test.go:3106-3151)
# ---------------------------------------------------------------------------

def geometry_count(g: Geom) -> int:
    """OGR_G_GetGeometryCount: members for Multi*/collections, rings for
    Polygon, 0 for points/linestrings."""
    if g.is_empty:
        return 0
    if g.type in ("MultiPolygon", "MultiLineString", "MultiPoint",
                  "GeometryCollection"):
        return len(g.coords)
    if g.type == "Polygon":
        return len(g.coords)
    return 0


def sub_geometry(g: Geom, i: int) -> Geom:
    """i-th sub-geometry; out-of-range raises (error-first, the reference
    golden asserts SubGeometry(2) of a 2-member multipolygon errors)."""
    n = geometry_count(g)
    if not 0 <= i < n:
        raise IndexError(f"sub_geometry: index {i} out of range 0..{n - 1}")
    if g.type == "MultiPolygon":
        return Geom("Polygon", [np.asarray(r, dtype=np.float64).copy()
                                for r in g.coords[i]])
    if g.type == "MultiLineString":
        return Geom("LineString", np.asarray(g.coords[i], dtype=np.float64).copy())
    if g.type == "MultiPoint":
        return Geom("Point", tuple(g.coords[i]))
    if g.type == "GeometryCollection":
        return g.coords[i]
    if g.type == "Polygon":  # OGR returns the ring as a line
        return Geom("LineString", np.asarray(g.coords[i], dtype=np.float64).copy())
    raise ValueError(f"sub_geometry: {g.type} has no sub-geometries")


def add_geometry(g: Geom, sub: Geom) -> Geom:
    """OGR_G_AddGeometry work-alike (returns a NEW Geom; the reference
    mutates the handle, but engine columns are immutable values)."""
    if g.type == "MultiPolygon" and sub.type == "Polygon":
        return Geom("MultiPolygon", list(g.coords) + [sub.coords])
    if g.type == "MultiPolygon" and sub.type == "MultiPolygon":
        return Geom("MultiPolygon", list(g.coords) + list(sub.coords))
    if g.type == "Polygon" and sub.type == "LineString":
        ring = _close(np.asarray(sub.coords, dtype=np.float64))
        return Geom("Polygon", list(g.coords) + [ring])
    if g.type == "GeometryCollection":
        return Geom("GeometryCollection", list(g.coords) + [sub])
    if g.type == "MultiPoint" and sub.type == "Point":
        pts = np.asarray(g.coords, dtype=np.float64).reshape(-1, 2)
        return Geom("MultiPoint", np.vstack([pts, np.array([sub.coords])]))
    if g.type == "MultiLineString" and sub.type == "LineString":
        return Geom("MultiLineString", list(g.coords) + [np.asarray(sub.coords)])
    raise ValueError(f"add_geometry: cannot add {sub.type} to {g.type}")


def force_to_polygon(g: Geom) -> Geom:
    """OGR_G_ForceToPolygon: a multipolygon collapses to ONE polygon whose
    ring list is the concatenation of every member's rings — possibly
    invalid, exactly like the reference golden (godal_test.go:3129-3133)."""
    if g.type == "Polygon":
        return g
    if g.type == "MultiPolygon":
        rings = [np.asarray(r, dtype=np.float64) for p in g.coords for r in p]
        return Geom("Polygon", rings)
    if g.type == "LineString":
        return Geom("Polygon", [_close(np.asarray(g.coords, dtype=np.float64))])
    raise ValueError(f"force_to_polygon: unsupported {g.type}")


def force_to_multipolygon(g: Geom) -> Geom:
    """OGR_G_ForceToMultiPolygon: wrap a polygon as a 1-member multi."""
    if g.type == "MultiPolygon":
        return g
    if g.type == "Polygon":
        return Geom("MultiPolygon", [g.coords])
    raise ValueError(f"force_to_multipolygon: unsupported {g.type}")


# ---------------------------------------------------------------------------
# buffer / simplify
# ---------------------------------------------------------------------------

def buffer(g: Geom, dist: float, segs: int = 30) -> Geom:
    """Buffer. Point → arc-segmented circle. Polygon → edge offset (convex
    exact; concave approximate). Negative dist shrinks; fully-collapsed
    result is EMPTY (reference golden godal_test.go:2807-2811).

    Deviations from GEOS' round-join Buffer (documented): polygon corners
    use MITRE joins — a rectangle buffered by d gains exactly (w+2d)(h+2d)
    area (the pinned goldens/oracle assume this) — where GEOS rounds
    corners with arc segments. Interior rings are offset inward by -dist
    (holes shrink as the polygon fattens) and dropped when they collapse;
    a negative-dist buffer grows holes correspondingly."""
    if g.type == "Point":
        if dist <= 0:
            return empty("Polygon")
        ang = np.linspace(0, 2 * math.pi, max(segs, 8) * 4, endpoint=False)
        ring = np.stack([g.coords[0] + dist * np.cos(ang), g.coords[1] + dist * np.sin(ang)], axis=1)
        return Geom("Polygon", [_close(ring)])
    polys = g.polygons()
    if not polys:
        return empty("Polygon")
    out = []
    for rings in polys:
        shell = _offset_ring(rings[0], dist, segs)
        if shell is None:
            continue
        new_rings = [shell]
        for hole in rings[1:]:
            h2 = _offset_ring(hole, -dist, segs)
            if h2 is not None:
                new_rings.append(h2)
        out.append(new_rings)
    if not out:
        return empty("Polygon")
    return Geom("Polygon", out[0]) if len(out) == 1 else Geom("MultiPolygon", out)


def _offset_ring(ring: np.ndarray, dist: float, segs: int):
    r = np.asarray(ring, dtype=np.float64)
    # normalize to CCW
    x, y = r[:-1, 0], r[:-1, 1]
    if (np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) < 0:
        r = r[::-1]
    pts = r[:-1]
    n = len(pts)
    edges = []
    for i in range(n):
        p, q = pts[i], pts[(i + 1) % n]
        d = q - p
        ln = math.hypot(d[0], d[1])
        if ln == 0:
            continue
        nx, ny = d[1] / ln, -d[0] / ln  # outward normal for CCW
        edges.append((p + np.array([nx, ny]) * dist, q + np.array([nx, ny]) * dist))
    if not edges:
        return None
    new_pts = []
    m = len(edges)
    for i in range(m):
        a0, a1 = edges[i - 1]
        b0, b1 = edges[i]
        den = (a1[0] - a0[0]) * (b1[1] - b0[1]) - (a1[1] - a0[1]) * (b1[0] - b0[0])
        if abs(den) < 1e-12:
            new_pts.append(tuple(b0))
        else:
            t = ((b0[0] - a0[0]) * (b1[1] - b0[1]) - (b0[1] - a0[1]) * (b1[0] - b0[0])) / den
            new_pts.append((a0[0] + t * (a1[0] - a0[0]), a0[1] + t * (a1[1] - a0[1])))
    out = _close(np.array(new_pts, dtype=np.float64))
    if shoelace(out) <= 1e-12:
        return None
    if dist < 0:
        # inward offset past collapse produces an inverted ring: detect by
        # checking the result stays inside the original (convex case)
        if not points_in_ring(out[:-1, 0], out[:-1, 1], _close(r)).all():
            return None
        if shoelace(out) > shoelace(_close(r)):
            return None
    return out


def simplify(g: Geom, tol: float) -> Geom:
    """Douglas–Peucker (reference godal.go:2697-2711)."""
    if g.type == "LineString":
        return Geom("LineString", _dp(np.asarray(g.coords), tol))
    if g.type == "Polygon":
        return Geom("Polygon", [_dp_ring(r, tol) for r in g.coords])
    if g.type == "MultiPolygon":
        return Geom("MultiPolygon", [[_dp_ring(r, tol) for r in p] for p in g.coords])
    return g


def _dp_ring(r: np.ndarray, tol: float) -> np.ndarray:
    open_part = _dp(np.asarray(r)[:-1], tol)
    return _close(open_part)


def _dp(pts: np.ndarray, tol: float) -> np.ndarray:
    if len(pts) < 3:
        return pts.copy()
    keep = np.zeros(len(pts), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        p, q = pts[i], pts[j]
        d = q - p
        ln = math.hypot(d[0], d[1])
        seg = pts[i + 1:j]
        if ln == 0:
            dist = np.hypot(seg[:, 0] - p[0], seg[:, 1] - p[1])
        else:
            dist = np.abs(d[0] * (p[1] - seg[:, 1]) - d[1] * (p[0] - seg[:, 0])) / ln
        k = int(np.argmax(dist))
        if dist[k] > tol:
            keep[i + 1 + k] = True
            stack.extend([(i, i + 1 + k), (i + 1 + k, j)])
    return pts[keep].copy()
