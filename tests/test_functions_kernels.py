"""Pure-kernel goldens (no Spark) — reference literal expectations."""

import math

import numpy as np
import pytest

from godal_spark.functions import cellindex, codecs, crs, geom as G
from godal_spark.functions.resampling import resample
from godal_spark.operators.tiling import block_grid_list, overview_levels, overview_size


# --- BlockIterator golden (godal_test.go:1037-1094; structure.go:30-64) ----

def test_block_grid_63x65_at_32():
    got = block_grid_list(63, 65, 32, 32)
    exp = [
        (0, 0, 0, 0, 32, 32), (1, 0, 32, 0, 31, 32),
        (0, 1, 0, 32, 32, 32), (1, 1, 32, 32, 31, 32),
        (0, 2, 0, 64, 32, 1), (1, 2, 32, 64, 31, 1),
    ]
    assert got == exp


def test_block_grid_exact_fit():
    got = block_grid_list(64, 64, 32, 32)
    assert len(got) == 4
    assert all(t[4] == 32 and t[5] == 32 for t in got)


def test_block_grid_positive_sizes():
    with pytest.raises(ValueError):
        block_grid_list(0, 10, 32, 32)


# --- BuildOverviews auto-level goldens (godal_test.go:2008-2064) -----------

def test_overview_levels_2000_at_256():
    assert overview_levels(2000, 2000, 256) == [2, 4, 8]


def test_overview_levels_minsize_200():
    levels = overview_levels(2000, 2000, 200)
    sizes = [overview_size(2000, 2000, lv)[0] for lv in levels]
    assert sizes[-1] <= 200
    assert all(s > 100 for s in sizes)


def test_overview_levels_explicit():
    assert overview_levels(2000, 2000, 256, explicit=[2, 4]) == [2, 4]
    with pytest.raises(ValueError):
        overview_levels(2000, 2000, 256, explicit=[1, 2])


def test_overview_levels_small_image_none():
    assert overview_levels(100, 100, 256) == []


# --- Resampling value tables (godal_test.go:2101-2172) ---------------------

RAMP = np.arange(100, dtype=np.uint8).reshape(10, 10)

IO_EXPECT = {"nearest": (3, 11), "average": (2, 6), "cubic": (3, 12),
             "bilinear": (3, 14), "cubicspline": (3, 18), "gauss": (3, 22),
             "lanczos": (3, 11), "mode": (3, 0)}


@pytest.mark.parametrize("alg,case", sorted(IO_EXPECT.items()))
def test_resample_io_goldens(alg, case):
    wsz, exp = case
    assert resample(RAMP, 1, 1, alg=alg, path="io", window=(0, 0, wsz, wsz))[0, 0] == exp


OVR_EXPECT = {"nearest": 0, "average": 6, "cubic": 6, "bilinear": 8,
              "cubicspline": 10, "gauss": 11, "lanczos": 6, "mode": 0}


@pytest.mark.parametrize("alg,exp", sorted(OVR_EXPECT.items()))
def test_resample_overview_goldens(alg, exp):
    assert resample(RAMP, 5, 5, alg=alg, path="overview")[0, 0] == exp


@pytest.mark.parametrize("alg", ["max", "min", "median", "q1", "q3", "sum"])
def test_resample_unsupported_algs_error(alg):
    with pytest.raises(ValueError):
        resample(RAMP, 1, 1, alg=alg, path="io")
    with pytest.raises(ValueError):
        resample(RAMP, 5, 5, alg=alg, path="overview")


# --- codecs -----------------------------------------------------------------

def test_png_roundtrip_gray_and_rgb():
    gray = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(gray)), gray)
    rgb = np.random.default_rng(42).integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(rgb)), rgb)


def test_raw8_roundtrip():
    a = np.random.default_rng(1).integers(0, 256, (7, 9, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_raw8(codecs.encode_raw8(a), 9, 7), a)


def test_fake_jpeg_psnr_above_40():
    a = np.random.default_rng(2).integers(0, 256, (32, 32), dtype=np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_fake_jpeg(a))
    assert codecs.psnr(a, dec) >= 40.0


def test_real_jpeg_roundtrip_gray_psnr():
    y, x = np.mgrid[0:41, 0:53]
    a = ((x * 2 + y) % 256).astype(np.uint8)
    buf = codecs.encode(a, "jpeg")
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    dec = codecs.decode(buf, "jpeg")
    assert dec.shape == a.shape
    assert codecs.psnr(a, dec) >= 40.0


def test_real_jpeg_roundtrip_rgb_psnr():
    y, x = np.mgrid[0:32, 0:48]
    a = np.stack([(x * 3 + y) % 256, (x + 2 * y) % 256,
                  np.minimum(x + y, 255)], axis=-1).astype(np.uint8)
    dec = codecs.decode(codecs.encode(a, "jpeg"), "jpeg")
    assert dec.shape == a.shape
    assert codecs.psnr(a, dec) >= 40.0


def test_real_jpeg_noise_worstcase_psnr():
    a = np.random.default_rng(3).integers(0, 256, (64, 64), dtype=np.uint8)
    dec = codecs.decode(codecs.encode(a, "jpeg"), "jpeg")
    assert codecs.psnr(a, dec) >= 40.0


def test_jpeg_quality_scaling_monotone():
    from godal_spark.functions import jpeg as J

    y, x = np.mgrid[0:40, 0:40]
    a = ((x + y) * 3 % 256).astype(np.uint8)
    prev = -1.0
    for q in (50, 75, 90, 95):
        dec = J.decode_jpeg_real(J.encode_jpeg(a, quality=q))
        p = codecs.psnr(a, dec)
        assert p >= prev
        prev = p
    assert prev >= 40.0


def test_jpeg_rejects_alpha():
    a = np.zeros((16, 16, 4), dtype=np.uint8)
    with pytest.raises(NotImplementedError):
        codecs.encode(a, "jpeg")


# --- geometry goldens --------------------------------------------------------

def test_wkt_point_roundtrip():
    # godal_test.go:2892-2931
    wkt = "POINT (30 10)"
    g = G.from_wkt(wkt)
    g2 = G.from_wkb(G.to_wkb(g))
    assert G.to_wkt(g2) == wkt


def test_area_ops_goldens():
    # godal_test.go:2960-3021: squares (0,0)-(2,2) and (1,1)-(3,3)
    a = G.box(0, 0, 2, 2)
    b = G.box(1, 1, 3, 3)
    assert G.intersection(a, b).area() == pytest.approx(1.0)
    assert G.union(a, b).area() == pytest.approx(7.0)
    assert G.difference(a, b).area() == pytest.approx(3.0)


def test_multipolygon_area_18():
    # godal_test.go:3113: two disjoint polys area 18 total
    mp = G.multipolygon([G.box(0, 0, 3, 3), G.box(10, 10, 13, 13)])
    assert mp.area() == pytest.approx(18.0)


def test_bounds_golden():
    g = G.box(100, 0, 101, 1)
    assert g.bounds() == (100.0, 0.0, 101.0, 1.0)


def test_intersects_goldens():
    a = G.box(0, 0, 2, 2)
    assert G.intersects(a, G.box(1, 1, 3, 3))
    assert not G.intersects(a, G.box(5, 5, 6, 6))
    assert G.intersects(G.point(1, 1), a)
    assert not G.intersects(G.point(9, 9), a)


def test_contains():
    a = G.box(0, 0, 4, 4)
    assert G.contains(a, G.box(1, 1, 2, 2))
    assert not G.contains(G.box(1, 1, 2, 2), a)


def test_buffer_negative_collapses_empty():
    # godal_test.go:2807-2811
    sq = G.box(0, 0, 1, 1)
    assert G.buffer(sq, -2.0).is_empty
    grown = G.buffer(sq, 1.0)
    assert grown.area() == pytest.approx(9.0)  # square edge-offset (no arcs)


def test_simplify_douglas_peucker():
    ls = G.Geom("LineString", np.array([[0, 0], [1, 0.01], [2, 0], [3, 0.01], [4, 0]]))
    out = G.simplify(ls, 0.1)
    assert len(out.coords) == 2


def test_geojson_precision_goldens():
    # godal_test.go:3067-3076
    p = G.point(10.123456789, 10)
    assert "10.1234568" in G.to_geojson(p, 7)
    assert "10.123" in G.to_geojson(p, 3) and "10.1234" not in G.to_geojson(p, 3)


def test_wkt_polygon_roundtrip_and_multi():
    w = "POLYGON ((100 0,101 0,101 1,100 1,100 0))"
    assert G.to_wkt(G.from_wkt(w)) == w
    mp = G.from_wkb(G.to_wkb(G.multipolygon([G.box(0, 0, 1, 1), G.box(2, 2, 3, 3)])))
    assert mp.type == "MultiPolygon" and mp.area() == pytest.approx(2.0)


def test_points_in_polygon_vectorized():
    g = G.box(0, 0, 10, 10)
    px = np.array([5.0, 15.0, 0.0, 10.0])
    py = np.array([5.0, 5.0, 0.0, 10.0])
    got = G.points_in_polygon(px, py, g)
    assert got.tolist() == [True, False, True, True]  # boundary inclusive


# --- cell index ---------------------------------------------------------------

def test_cell_pack_unpack_roundtrip():
    x, y = cellindex.cell_xy(11.5, 45.5, 12)
    cid = cellindex.pack(x, y, 12)
    x2, y2, r2 = cellindex.unpack(cid)
    assert (x2, y2, r2) == (x, y, 12)


def test_cell_bounds_contains_point():
    cid = cellindex.cell_of(11.5, 45.5, 12)
    minlon, minlat, maxlon, maxlat = cellindex.cell_bounds(cid)
    assert minlon <= 11.5 < maxlon and minlat <= 45.5 < maxlat


def test_ring_sizes():
    assert len(cellindex.ring(100, 100, 12, 0)) == 1
    assert len(cellindex.ring(100, 100, 12, 1)) == 8
    assert len(cellindex.ring(100, 100, 12, 2)) == 16
    assert len(cellindex.disk(100, 100, 12, 2)) == 25


def test_cells_covering_bbox():
    cells = cellindex.cells_covering_bbox(10.0, 45.0, 10.3, 45.3, 10)
    # res 10 cell ~0.35deg wide: tiny bbox → 1..4 cells
    assert 1 <= len(cells) <= 4
    # exact-boundary bbox does not leak into next cell
    b = cellindex.cell_bounds(cells[0])


def test_sql_and_numpy_cell_agree():
    import duckdb
    lons = [-170.0, 0.0, 11.33, 179.9]
    lats = [-80.0, 0.0, 45.77, 89.9]
    for lon, lat in zip(lons, lats):
        expr = cellindex.sql_cell_expr(str(lon), str(lat), 12)
        sql_val = duckdb.sql(f"select {expr}").fetchone()[0]
        np_val = int(cellindex.cell_of(lon, lat, 12))
        assert sql_val == np_val


# --- CRS ---------------------------------------------------------------------

def test_4326_3857_roundtrip():
    lon = np.array([-170.0, 0.0, 11.33, 179.0])
    lat = np.array([-80.0, 0.0, 45.77, 84.0])
    x, y, ok = crs.transform_points(lon, lat, "EPSG:4326", "EPSG:3857")
    assert ok.all()
    lon2, lat2, ok2 = crs.transform_points(x, y, "EPSG:3857", "EPSG:4326")
    assert ok2.all()
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_3857_known_point():
    # public anchor: lon 180 -> 20037508.342789244
    x, y, ok = crs.transform_points([180.0], [0.0], "EPSG:4326", "EPSG:3857")
    assert ok.all()
    assert x[0] == pytest.approx(20037508.342789244)
    assert y[0] == pytest.approx(0.0, abs=1e-6)


def test_out_of_domain_flags():
    # godal_test.go:1767-1776: lat 91 fails
    _, _, ok = crs.transform_points([0.0], [91.0], "EPSG:4326", "EPSG:3857")
    assert not ok[0]


def test_utm_roundtrip():
    lon = np.array([9.0, 9.5, 8.7])
    lat = np.array([48.0, 44.2, 52.9])
    x, y, ok = crs.transform_points(lon, lat, "EPSG:4326", "EPSG:32632")
    assert ok.all()
    lon2, lat2, ok2 = crs.transform_points(x, y, "EPSG:32632", "EPSG:4326")
    np.testing.assert_allclose(lon2, lon, atol=1e-7)
    np.testing.assert_allclose(lat2, lat, atol=1e-7)


def test_utm_known_anchor():
    # zone 32N central meridian 9E: easting 500000 at lon=9
    x, y, ok = crs.transform_points([9.0], [0.0], "EPSG:4326", "EPSG:32632")
    assert x[0] == pytest.approx(500000.0, abs=1e-3)
    assert y[0] == pytest.approx(0.0, abs=1e-3)


def test_geotransform_bounds():
    # test.tif analog: gt (45,1,0,35,0,-1), 10x10 ⇒ [45,25,55,35]
    # (doc_test.go:293-297, godal_test.go:490-500)
    gt = [45.0, 1.0, 0.0, 35.0, 0.0, -1.0]
    assert crs.dataset_bounds(gt, 10, 10) == (45.0, 25.0, 55.0, 35.0)


def test_geo_pixel_inverse():
    gt = [45.0, 0.5, 0.0, 35.0, 0.0, -0.25]
    px, py = crs.geo_to_pixel(gt, *crs.pixel_to_geo(gt, [3.0], [7.0]))
    assert px[0] == pytest.approx(3.0) and py[0] == pytest.approx(7.0)


def test_gcp_fit_golden():
    # godal_test.go:5191-5241: affine recoverable from >=3 GCPs
    gt = [100.0, 0.5, 0.1, 200.0, -0.2, -0.5]
    pts = [(0, 0), (10, 0), (0, 10), (7, 3)]
    gcps = []
    for px, py in pts:
        gx = gt[0] + px * gt[1] + py * gt[2]
        gy = gt[3] + px * gt[4] + py * gt[5]
        gcps.append((px, py, gx, gy))
    fit = crs.fit_gcps(gcps)
    np.testing.assert_allclose(fit, gt, atol=1e-9)
    with pytest.raises(ValueError):
        crs.fit_gcps(gcps[:2])


def test_gml_roundtrips():
    # godal_test.go:3078-3104 GML io family
    for g in [G.point(30, 10), G.Geom("LineString", np.array([[0, 0], [1, 1], [2, 0]], float)),
              G.box(100, 0, 101, 1),
              G.multipolygon([G.box(0, 0, 1, 1), G.box(2, 2, 3, 3)])]:
        back = G.from_gml(G.to_gml(g))
        assert back.type == g.type
        assert back.area() == pytest.approx(g.area())
    hole = G.Geom("Polygon", [G.box(0, 0, 4, 4).coords[0], G.box(1, 1, 2, 2).coords[0]])
    assert G.from_gml(G.to_gml(hole)).area() == pytest.approx(15.0)


def test_gml_reference_goldens_exact():
    """The two EXACT GML strings the reference pins
    (godal_test.go:3095-3099): GML2 with srsName, and GML3 with
    SRSNAME_FORMAT=OGC_URN (urn srsName + lat/lon axis order); plus the
    error on an unknown SRSNAME_FORMAT (godal_test.go:3101-3103)."""
    g = G.from_wkt("POLYGON ((0 0,2 0,2 2,0 2,0 0))")
    assert G.to_gml(g, srs_name="EPSG:4326") == (
        '<gml:Polygon srsName="EPSG:4326"><gml:outerBoundaryIs>'
        '<gml:LinearRing><gml:coordinates>0,0 2,0 2,2 0,2 0,0'
        '</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>'
        '</gml:Polygon>')
    gml3 = G.to_gml(g, srs_name="EPSG:4326", fmt="gml3",
                    srsname_format="OGC_URN")
    assert gml3 == (
        '<gml:Polygon srsName="urn:ogc:def:crs:EPSG::4326"><gml:exterior>'
        '<gml:LinearRing><gml:posList>0 0 0 2 2 2 2 0 0 0</gml:posList>'
        '</gml:LinearRing></gml:exterior></gml:Polygon>')
    with pytest.raises(ValueError, match="SRSNAME_FORMAT"):
        G.to_gml(g, srs_name="EPSG:4326", fmt="gml3", srsname_format="fake")
    # import round-trips BOTH dialects back to the source coordinates
    # (the urn import undoes the axis swap)
    for s in (G.to_gml(g, srs_name="EPSG:4326"), gml3,
              G.to_gml(g, fmt="gml3")):
        back = G.from_gml(s)
        assert back.type == "Polygon"
        assert np.allclose(back.coords[0], g.coords[0])
    # GML3 multipolygon (MultiSurface) + multilinestring + multipoint
    mp = G.multipolygon([G.box(0, 0, 1, 1), G.box(2, 2, 3, 3)])
    back = G.from_gml(G.to_gml(mp, srs_name="EPSG:4326", fmt="gml3",
                               srsname_format="OGC_URN"))
    assert back.type == "MultiPolygon" and back.area() == pytest.approx(2.0)
    mls = ('<gml:MultiLineString><gml:lineStringMember>'
           '<gml:LineString><gml:coordinates>0,0 1,1</gml:coordinates>'
           '</gml:LineString></gml:lineStringMember><gml:lineStringMember>'
           '<gml:LineString><gml:posList>2 2 3 3</gml:posList>'
           '</gml:LineString></gml:lineStringMember></gml:MultiLineString>')
    got = G.from_gml(mls)
    assert got.type == "MultiLineString" and len(got.coords) == 2
    mpt = ('<gml:MultiPoint><gml:pointMember><gml:Point>'
           '<gml:pos>5 6</gml:pos></gml:Point></gml:pointMember>'
           '</gml:MultiPoint>')
    assert G.from_gml(mpt).type == "MultiPoint"
    # attribute-carrying INNER elements (OGR emits cs/ts/decimal on
    # gml:coordinates; srsName can land on LinearRing too)
    pt = G.from_gml('<gml:Point><gml:coordinates decimal="." cs="," '
                    'ts=" ">1,2</gml:coordinates></gml:Point>')
    assert pt.coords == (1.0, 2.0)
    poly = G.from_gml(
        '<gml:Polygon><gml:outerBoundaryIs><gml:LinearRing srsName="x">'
        '<gml:coordinates cs=",">0,0 4,0 4,4 0,4 0,0</gml:coordinates>'
        '</gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>')
    assert poly.area() == pytest.approx(16.0)


def test_morton_roundtrip():
    from godal_spark.functions.cellindex import morton, morton_decode
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 26, 500)
    y = rng.integers(0, 1 << 26, 500)
    x2, y2 = morton_decode(morton(x, y))
    assert np.array_equal(x, x2) and np.array_equal(y, y2)


# --- round 2: general overlay, container API, buffer holes -------------------

def _membership_check(a, b):
    """Point-membership oracle: for sampled points, in(op(A,B)) must equal
    the boolean combination of in(A)/in(B)."""
    rng = np.random.default_rng(11)
    ba, bb = a.bounds(), b.bounds()
    x = rng.uniform(min(ba[0], bb[0]) - 0.5, max(ba[2], bb[2]) + 0.5, 3000)
    y = rng.uniform(min(ba[1], bb[1]) - 0.5, max(ba[3], bb[3]) + 0.5, 3000)
    ia = G.points_in_polygon(x, y, a)
    ib = G.points_in_polygon(x, y, b)
    for op, exp in (("intersection", ia & ib), ("union", ia | ib),
                    ("difference", ia & ~ib)):
        res = getattr(G, op)(a, b)
        got = (G.points_in_polygon(x, y, res) if not res.is_empty
               else np.zeros_like(ia))
        assert (got != exp).mean() < 0.005, op
    ai = G.intersection(a, b).area()
    assert abs(G.union(a, b).area() - (a.area() + b.area() - ai)) < 1e-6
    assert abs(G.difference(a, b).area() - (a.area() - ai)) < 1e-6


def test_overlay_concave_triangle():
    a = G.polygon(np.array([[0, 0], [4, 0], [4, 4], [2, 1.5], [0, 4], [0, 0]], float))
    b = G.polygon(np.array([[1, -1], [5, 2], [1, 5], [1, -1]], float))
    _membership_check(a, b)


def test_overlay_multipart_result():
    # comb vs slanted quad -> intersection has multiple components
    a = G.polygon(np.array([[0, 0], [6, 0], [6, 1], [1, 1], [1, 2],
                            [6, 2], [6, 3], [0, 3], [0, 0]], float))
    b = G.polygon(np.array([[0.5, -0.5], [5.5, -0.2], [5.2, 2.8],
                            [0.2, 2.5], [0.5, -0.5]], float))
    _membership_check(a, b)


def test_overlay_with_hole():
    a = G.polygon(np.array([[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]], float),
                  holes=[np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], float)])
    b = G.polygon(np.array([[3, 1], [7, 1.5], [6.5, 5], [3, 4.5], [3, 1]], float))
    _membership_check(a, b)


def test_overlay_shared_edge_union_dissolves():
    # force the general path with a slanted pair sharing an edge
    a = G.polygon(np.array([[0, 0], [2, 0.5], [2, 2.5], [0, 2], [0, 0]], float))
    b = G.polygon(np.array([[2, 0.5], [4, 0], [4, 2], [2, 2.5], [2, 0.5]], float))
    u = G.union(a, b)
    assert abs(u.area() - (a.area() + b.area())) < 1e-9
    assert G.intersection(a, b).area() < 1e-9


def test_geometry_container_goldens():
    # godal_test.go:3106-3151
    mp = G.from_wkt("MULTIPOLYGON(((1 1,5 1,5 5,1 5,1 1),(2 2,2 3,3 3,3 2,2 2)),"
                    "((6 3,9 2,9 4,6 3)))")
    assert mp.area() == 18.0
    assert G.geometry_count(mp) == 2
    sub0 = G.sub_geometry(mp, 0)
    assert sub0.type == "Polygon" and G.geometry_count(sub0) == 2
    assert sub0.area() == 15.0
    sub1 = G.sub_geometry(mp, 1)
    assert sub1.type == "Polygon" and sub1.area() == 3.0
    with pytest.raises(IndexError):
        G.sub_geometry(mp, 2)

    poly = G.force_to_polygon(mp)
    assert poly.type == "Polygon" and len(poly.coords) == 3
    assert not poly.is_valid  # third ring lies outside the shell

    p = G.from_wkt("POLYGON((1 1,5 1,5 5,1 5,1 1))")
    m = G.force_to_multipolygon(p)
    assert m.type == "MultiPolygon" and G.geometry_count(m) == 1
    assert p.is_valid

    m1 = G.from_wkt("MULTIPOLYGON (((1 1,5 1,5 5,1 5,1 1)))")
    tri = G.from_wkt("POLYGON((6 3,9 2,9 4,6 3))")
    assert not G.contains(m1, tri)
    m2 = G.add_geometry(m1, tri)
    assert G.geometry_count(m2) == 2
    assert G.to_wkt(G.sub_geometry(m2, 1)) == G.to_wkt(tri)


def test_buffer_preserves_holes():
    a = G.polygon(np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float),
                  holes=[np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)])
    out = G.buffer(a, 1.0)
    # mitre: shell 12x12, hole shrinks to 0 -> wait, hole 2x2 - 2*1 = 0 (collapses)
    assert abs(out.area() - 144.0) < 1e-9
    out2 = G.buffer(a, 0.5)
    # shell 11x11 = 121, hole 1x1 = 1
    assert abs(out2.area() - 120.0) < 1e-9
    assert len(out2.coords) == 2  # hole survived
    # negative buffer grows the hole: shell 8x8, hole 4x4
    out3 = G.buffer(a, -1.0)
    assert abs(out3.area() - (64.0 - 16.0)) < 1e-9


# --- round 2: equal-area / polar CRS families ---------------------------------

def test_crs_registry_defining_anchors():
    def pt(epsg, lon, lat):
        x, y, ok = crs.transform_points([lon], [lat], "EPSG:4326", f"EPSG:{epsg}")
        assert ok.all()
        return float(x[0]), float(y[0])
    # projection centers / false origins are exact by definition
    assert pt(3035, 10, 52) == (4321000.0, 3210000.0)
    assert pt(5070, -96, 23) == (0.0, 0.0)
    assert pt(3031, 0, -90) == (0.0, 0.0)
    assert pt(3413, -45, 90) == (0.0, 0.0)
    assert pt(6933, 0, 0) == (0.0, 0.0)
    # IOGP Guidance Note 7-2 LAEA worked example (ETRS89): 50N 5E
    x, y = pt(3035, 5, 50)
    assert x == pytest.approx(3962799.45, abs=0.01)
    assert y == pytest.approx(2999718.85, abs=0.01)


def test_crs_lcc2sp_defining_properties():
    """Lambert-93 (EPSG:2154) / Canada Atlas (EPSG:3978): no PROJ oracle
    exists in this env, so the LCC 2SP implementation is validated by
    the projection's DEFINING properties — origin exactness, k = 1 on
    both standard parallels (secant signature: k < 1 between, k > 1
    outside), conformality, plus a published-coordinate sanity band."""
    import math

    def k_parallel(epsg, lon, lat):
        d = 1e-6
        x1, y1, _ = crs.transform_points([lon], [lat], "EPSG:4326", epsg)
        x2, y2, _ = crs.transform_points([lon + d], [lat], "EPSG:4326", epsg)
        ground = math.radians(d) * crs.R_a * float(
            crs._m_of(np.array(math.radians(lat))))
        return math.hypot(x2[0] - x1[0], y2[0] - y1[0]) / ground

    def k_meridian(epsg, lon, lat):
        d = 1e-6
        x1, y1, _ = crs.transform_points([lon], [lat], "EPSG:4326", epsg)
        x2, y2, _ = crs.transform_points([lon], [lat + d], "EPSG:4326", epsg)
        s = math.sin(math.radians(lat))
        m_rad = crs.R_a * (1 - crs.E2) / (1 - crs.E2 * s * s) ** 1.5
        return math.hypot(x2[0] - x1[0], y2[0] - y1[0]) / (math.radians(d) * m_rad)

    # grid origin exact by definition
    x, y, ok = crs.transform_points([3.0], [46.5], "EPSG:4326", "EPSG:2154")
    assert ok.all()
    assert x[0] == pytest.approx(700000.0, abs=1e-6)
    assert y[0] == pytest.approx(6600000.0, abs=1e-6)
    # k = 1 on the standard parallels; secant cone between/outside
    for lat in (49.0, 44.0):
        assert k_parallel("EPSG:2154", 3.0, lat) == pytest.approx(1.0, abs=1e-7)
    assert k_parallel("EPSG:2154", 3.0, 46.5) < 1.0
    assert k_parallel("EPSG:2154", 3.0, 52.0) > 1.0
    # conformal: meridian scale == parallel scale everywhere sampled
    for lon, lat in ((2.35, 48.86), (5.0, 43.3), (-1.5, 47.2)):
        assert k_parallel("EPSG:2154", lon, lat) == pytest.approx(
            k_meridian("EPSG:2154", lon, lat), abs=1e-5)
    # Paris (2.3522E, 48.8566N) lands in the published Lambert-93 band
    x, y, _ = crs.transform_points([2.3522], [48.8566],
                                   "EPSG:4326", "EPSG:2154")
    assert 650000 < x[0] < 660000 and 6858000 < y[0] < 6868000
    # NZTM grid origin exact; Wellington in the published band
    x, y, _ = crs.transform_points([173.0], [0.0], "EPSG:4326", "EPSG:2193")
    assert x[0] == pytest.approx(1600000.0, abs=1e-6)
    assert y[0] == pytest.approx(10000000.0, abs=1e-6)
    x, y, _ = crs.transform_points([174.7762], [-41.2865],
                                   "EPSG:4326", "EPSG:2193")
    assert 1740000 < x[0] < 1760000 and 5420000 < y[0] < 5436000
    # Canada Atlas: origin + standard parallels
    x, y, _ = crs.transform_points([-95.0], [49.0], "EPSG:4326", "EPSG:3978")
    assert abs(x[0]) < 1e-6
    for lat in (49.0, 77.0):
        assert k_parallel("EPSG:3978", -95.0, lat) == pytest.approx(1.0, abs=1e-7)


def test_crs_proj4_definitions():
    """PROJ4 definition strings (round 5; reference accepts arbitrary
    PROJ4 via srs.go NewSpatialRefFromProj4): tmerc/utm/lcc route to the
    shared kernels, +towgs84 (PROJ's local→WGS84 position-vector
    convention) through the exact-inverse Helmert."""
    # published OSGB proj4 string == the EPSG:27700 registry entry; the
    # towgs84 sign-flip vs the registry's exact matrix inverse differs
    # at the mm level (and the published params are 3-dp rounded)
    osgb = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
            "+y_0=-100000 +ellps=airy +towgs84=446.448,-125.157,542.06,"
            "0.15,0.247,0.842,-20.489 +units=m +no_defs")
    lon = np.array([-0.1278, -3.0])
    lat = np.array([51.5074, 55.0])
    x1, y1, ok = crs.transform_points(lon, lat, "EPSG:4326", osgb)
    x2, y2, _ = crs.transform_points(lon, lat, "EPSG:4326", "EPSG:27700")
    assert ok.all()
    assert np.abs(x1 - x2).max() < 0.01 and np.abs(y1 - y2).max() < 0.01
    bx, by, _ = crs.transform_points(x1, y1, osgb, "EPSG:4326")
    assert np.abs(bx - lon).max() < 1e-7 and np.abs(by - lat).max() < 1e-7
    # arbitrary Gauss-Krüger (DHDN zone 3 / EPSG:31467 as proj4): false
    # easting recovered at the central meridian, datum shift ~dozens m
    gk3 = ("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0 "
           "+ellps=bessel +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7")
    x, y, _ = crs.transform_points([9.0], [50.0], "EPSG:4326", gk3)
    assert abs(x[0] - 3500000) < 200 and 5.50e6 < y[0] < 5.58e6
    gx, gy, _ = crs.transform_points(x, y, gk3, "EPSG:4326")
    assert abs(gx[0] - 9.0) < 1e-7 and abs(gy[0] - 50.0) < 1e-7
    # proj4 utm/lcc are bit-equal to their EPSG registry twins
    xu, yu, _ = crs.transform_points([7.1], [50.7], "EPSG:4326",
                                     "+proj=utm +zone=32")
    xe, ye, _ = crs.transform_points([7.1], [50.7], "EPSG:4326",
                                     "EPSG:32632")
    assert xu[0] == xe[0] and yu[0] == ye[0]
    l93 = ("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
           "+x_0=700000 +y_0=6600000 +ellps=GRS80")
    xl, yl, _ = crs.transform_points([2.35], [48.86], "EPSG:4326", l93)
    xf, yf, _ = crs.transform_points([2.35], [48.86], "EPSG:4326",
                                     "EPSG:2154")
    # proj4 uses the TRUE GRS80 flattening; the registry's WGS84
    # shortcut differs at the sub-micrometre level
    assert abs(xl[0] - xf[0]) < 1e-4 and abs(yl[0] - yf[0]) < 1e-4
    # LCC 1SP (EPSG method 9801): the EPSG Guidance 7-2 worked example —
    # Jamaica 1969 national grid on Clarke 1866 — reproduces the
    # published coordinates to < 2 mm
    jam = ("+proj=lcc +lat_1=18 +lat_0=18 +lon_0=-77 +k_0=1 "
           "+x_0=250000 +y_0=150000 +ellps=clrk66")
    jlat = 17 + 55 / 60 + 55.80 / 3600
    jlon = -(76 + 56 / 60 + 37.26 / 3600)
    jx, jy, _ = crs.transform_points([jlon], [jlat], "EPSG:4326", jam)
    assert jx[0] == pytest.approx(255966.58, abs=0.01)
    assert jy[0] == pytest.approx(142493.51, abs=0.01)
    # LCC 2SP on a classical ellipsoid + datum shift (NAD27-style):
    # round-trips to sub-nanodegree through the Helmert hop
    tx27 = ("+proj=lcc +lat_1=28.383333 +lat_2=30.283333 "
            "+lat_0=27.833333 +lon_0=-99 +x_0=600000 +y_0=0 "
            "+ellps=clrk66 +towgs84=-8,160,176")
    xt, yt, _ = crs.transform_points([-98.5], [29.5], "EPSG:4326", tx27)
    bx2, by2, _ = crs.transform_points(xt, yt, tx27, "EPSG:4326")
    assert abs(bx2[0] + 98.5) < 1e-7 and abs(by2[0] - 29.5) < 1e-7
    # spherical web-mercator proj4 (EPSG:3857's canonical string) is
    # bit-equal to the registry entry
    merc = ("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 "
            "+x_0=0 +y_0=0 +k=1 +units=m +no_defs")
    xm, ym, _ = crs.transform_points([2.35], [48.86], "EPSG:4326", merc)
    xr, yr, _ = crs.transform_points([2.35], [48.86], "EPSG:4326",
                                     "EPSG:3857")
    assert abs(xm[0] - xr[0]) < 1e-6 and abs(ym[0] - yr[0]) < 1e-6
    # error-first beyond the subset
    for bad in ("+proj=robin",
                "+proj=tmerc +nadgrids=foo",
                "+proj=lcc +lat_1=10 +lat_2=20 +k_0=0.99",
                "+proj=aea +lat_1=20 +lat_2=40 +towgs84=1,2,3",
                # a sphere has no geodetic datum to Helmert-shift
                "+proj=merc +R=6371000 +towgs84=1,2,3",
                # lcc 1SP with a split origin isn't the 9801 form
                "+proj=lcc +lat_1=18 +lat_0=17 +k_0=1",
                # lcc 1SP degenerates at the equator (n = sin 0)
                "+proj=lcc +lat_1=0 +k_0=1"):
        with pytest.raises(NotImplementedError):
            crs.transform_points([0.0], [0.0], "EPSG:4326", bad)


def test_crs_mercator_ellipsoidal_and_sinusoidal():
    """Ellipsoidal Mercator (EPSG methods 9804/9805 — PROJ's +proj=merc
    default and EPSG:3395 World Mercator) pinned to BOTH EPSG Guidance
    7-2 published worked examples; sinusoidal (+proj=sinu) pinned to the
    MODIS grid's published constants; +pm= prime meridians."""
    # 9804 (1SP): Makassar / NEIEZ on Bessel 1841 — k0 0.997, lon0 110E,
    # FE 3900000 FN 900000; G7-2 test point 3S 120E
    nez = ("+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 +y_0=900000 "
           "+ellps=bessel")
    x, y, ok = crs.transform_points([120.0], [-3.0], "EPSG:4326", nez)
    assert ok.all()
    assert x[0] == pytest.approx(5009726.58, abs=0.01)
    assert y[0] == pytest.approx(569150.82, abs=0.01)
    bx, by, _ = crs.transform_points(x, y, nez, "EPSG:4326")
    assert abs(bx[0] - 120.0) < 1e-9 and abs(by[0] + 3.0) < 1e-9
    # 9805 (2SP): Pulkovo 1942 / Caspian on Krassowsky — lat_ts 42N,
    # lon0 51E; G7-2 test point 53N 53E
    casp = "+proj=merc +lat_ts=42 +lon_0=51 +ellps=krass"
    x2, y2, _ = crs.transform_points([53.0], [53.0], "EPSG:4326", casp)
    assert x2[0] == pytest.approx(165704.29, abs=0.01)
    assert y2[0] == pytest.approx(5171848.07, abs=0.01)
    # same CRS through the WKT1 front-end (Mercator_2SP lowering)
    wkt = ('PROJCS["Caspian",GEOGCS["Pulkovo 1942",DATUM["P42",'
           'SPHEROID["Krassowsky 1940",6378245,298.3]],'
           'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Mercator_2SP"],'
           'PARAMETER["standard_parallel_1",42],'
           'PARAMETER["central_meridian",51],'
           'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
           'UNIT["metre",1]]')
    x3, y3, _ = crs.transform_points([53.0], [53.0], "EPSG:4326", wkt)
    assert x3[0] == x2[0] and y3[0] == y2[0]
    # EPSG:3395 registry: equator x equals 3857's, y diverges ~37 km
    # at 60N (the ellipsoidal-vs-spherical gap)
    xw, yw, _ = crs.transform_points([10.0, 0.0], [0.0, 60.0],
                                     "EPSG:4326", "EPSG:3395")
    xs, ys, _ = crs.transform_points([10.0, 0.0], [0.0, 60.0],
                                     "EPSG:4326", "EPSG:3857")
    assert xw[0] == pytest.approx(xs[0], abs=1e-6)
    assert 36000 < (ys[1] - yw[1]) < 38000
    bxw, byw, _ = crs.transform_points(xw, yw, "EPSG:3395", "EPSG:4326")
    assert np.abs(bxw - [10.0, 0.0]).max() < 1e-9
    assert np.abs(byw - [0.0, 60.0]).max() < 1e-9
    # ellipsoidal merc + datum shift round-trips within the 2D
    # height-drop bound (~0.2 m; same property as PROJ with 2D coords)
    dm = "+proj=merc +ellps=bessel +towgs84=-377,571,-467"
    xd, yd, _ = crs.transform_points([7.0], [47.0], "EPSG:4326", dm)
    bd, cd, _ = crs.transform_points(xd, yd, dm, "EPSG:4326")
    assert abs(bd[0] - 7.0) < 1e-5 and abs(cd[0] - 47.0) < 1e-5
    # sinusoidal on the MODIS authalic sphere: the grid's published
    # constants — half-width pi*R, 10-deg tile width 2*pi*R/36
    modis = "+proj=sinu +R=6371007.181 +lon_0=0 +x_0=0 +y_0=0"
    xt, yt, _ = crs.transform_points([10.0, 0.0], [0.0, 45.0],
                                     "EPSG:4326", modis)
    assert xt[0] == pytest.approx(2 * math.pi * 6371007.181 / 36, abs=1e-6)
    assert yt[1] == pytest.approx(math.pi / 4 * 6371007.181, abs=1e-6)
    bt, ct, _ = crs.transform_points(xt, yt, modis, "EPSG:4326")
    assert np.abs(bt - [10.0, 0.0]).max() < 1e-8
    assert np.abs(ct - [0.0, 45.0]).max() < 1e-8
    # ellipsoidal sinusoidal round-trip (WGS84)
    se = "+proj=sinu +ellps=WGS84"
    xe, ye, _ = crs.transform_points([-70.0], [-33.0], "EPSG:4326", se)
    be, ce, _ = crs.transform_points(xe, ye, se, "EPSG:4326")
    assert abs(be[0] + 70.0) < 1e-9 and abs(ce[0] + 33.0) < 1e-9
    # +pm=paris: longitudes reckoned from the Paris meridian
    ntf_ll = "+proj=longlat +ellps=clrk80ign +pm=paris"
    lo, la, _ = crs.transform_points([2.337229166666667], [48.0],
                                     "EPSG:4326", ntf_ll)
    assert abs(lo[0]) < 1e-12 and la[0] == 48.0
    lo2, la2, _ = crs.transform_points([0.0], [48.0], ntf_ll, "EPSG:4326")
    assert lo2[0] == pytest.approx(2.337229166666667, abs=1e-12)
    # NTF Lambert zone II (EPSG:27572-class): lcc 1SP on Clarke 1880 IGN
    # with the Paris meridian + datum shift — Paris city lands in the
    # published neighbourhood (600.9 km E, 427 km N zone-II) and
    # round-trips
    lamb2 = ("+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 "
             "+k_0=0.99987742 +x_0=600000 +y_0=200000 "
             "+a=6378249.2 +b=6356515 +towgs84=-168,-60,320 +pm=paris")
    xp, yp, _ = crs.transform_points([2.3522], [48.8566],
                                     "EPSG:4326", lamb2)
    assert 599000 < xp[0] < 603000 and 425000 < yp[0] < 430000
    bp, cp, _ = crs.transform_points(xp, yp, lamb2, "EPSG:4326")
    assert abs(bp[0] - 2.3522) < 1e-5 and abs(cp[0] - 48.8566) < 1e-5


def test_crs_wkt1_definitions():
    """WKT1 CRS strings (round 5; reference srs.go NewSpatialRefFromWKT):
    PROJCS/GEOGCS trees lower into the same parameter dispatch as proj4
    — SPHEROID/TOWGS84/PROJECTION/PARAMETER all honored."""
    osgb_wkt = (
        'PROJCS["OSGB 1936 / British National Grid",'
        'GEOGCS["OSGB 1936",DATUM["OSGB_1936",'
        'SPHEROID["Airy 1830",6377563.396,299.3249646],'
        'TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",49],'
        'PARAMETER["central_meridian",-2],'
        'PARAMETER["scale_factor",0.9996012717],'
        'PARAMETER["false_easting",400000],'
        'PARAMETER["false_northing",-100000],'
        'UNIT["metre",1],AUTHORITY["EPSG","27700"]]')
    lon = np.array([-0.1278])
    lat = np.array([51.5074])
    x1, y1, ok = crs.transform_points(lon, lat, "EPSG:4326", osgb_wkt)
    x2, y2, _ = crs.transform_points(lon, lat, "EPSG:4326", "EPSG:27700")
    assert ok.all()
    assert abs(x1[0] - x2[0]) < 0.01 and abs(y1[0] - y2[0]) < 0.01
    bx, by, _ = crs.transform_points(x1, y1, osgb_wkt, "EPSG:4326")
    assert abs(bx[0] - lon[0]) < 1e-7 and abs(by[0] - lat[0]) < 1e-7
    utm32 = ('PROJCS["WGS 84 / UTM zone 32N",GEOGCS["WGS 84",'
             'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
             'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
             'PROJECTION["Transverse_Mercator"],'
             'PARAMETER["latitude_of_origin",0],'
             'PARAMETER["central_meridian",9],'
             'PARAMETER["scale_factor",0.9996],'
             'PARAMETER["false_easting",500000],'
             'PARAMETER["false_northing",0],UNIT["metre",1]]')
    xu, yu, _ = crs.transform_points([7.1], [50.7], "EPSG:4326", utm32)
    xe, ye, _ = crs.transform_points([7.1], [50.7], "EPSG:4326",
                                     "EPSG:32632")
    assert xu[0] == xe[0] and yu[0] == ye[0]
    geog = ('GEOGCS["WGS 84",DATUM["WGS_1984",'
            'SPHEROID["WGS 84",6378137,298.257223563]],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]')
    gx, gy, _ = crs.transform_points([5.0], [45.0], geog, "EPSG:4326")
    assert gx[0] == 5.0 and gy[0] == 45.0
    with pytest.raises(NotImplementedError, match="Robinson"):
        crs.transform_points(
            [0.0], [0.0], "EPSG:4326",
            'PROJCS["x",GEOGCS["y",DATUM["z",SPHEROID["s",6378137,298]]],'
            'PROJECTION["Robinson"],UNIT["metre",1]]')


def test_crs_osgb_datum_shift():
    """EPSG:27700 (round 5 — first TRUE Helmert datum shift). The TM-on-
    Airy projection core reproduces the OS 'Guide to coordinate systems
    in Great Britain' worked example to < 1 mm (OSGB36 geographic input,
    so no datum shift in that leg); the WGS84 path applies the published
    7-parameter fit (documented accuracy ~2 m vs OSTN15, NOT
    survey-grade — module header note)."""
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    f = 1 / crs._AIRY_INVF
    e2 = f * (2 - f)
    x, y = crs._ll_to_tm([lon], [lat], -2.0, 0.9996012717,
                         400000.0, -100000.0,
                         a=crs._AIRY_A, e2=e2, lat0_deg=49.0)
    assert x[0] == pytest.approx(651409.903, abs=1e-3)
    assert y[0] == pytest.approx(313177.270, abs=1e-3)
    # grid origin: OSGB36 (49N, 2W) -> (400000, -100000) exactly
    x, y = crs._ll_to_tm([-2.0], [49.0], -2.0, 0.9996012717,
                         400000.0, -100000.0,
                         a=crs._AIRY_A, e2=e2, lat0_deg=49.0)
    assert x[0] == pytest.approx(400000.0, abs=1e-6)
    assert y[0] == pytest.approx(-100000.0, abs=1e-6)
    # WGS84->OSGB36 horizontal displacement at London: the documented
    # ~120 m (nationally 50-180 m)
    X, Y, Z = crs._geodetic_to_ecef([-0.1278], [51.5074], crs.R_a, crs.E2)
    hf, hi = crs._helmert_pair(*crs._OSGB36_HELMERT)
    lo2, la2 = crs._ecef_to_geodetic(*hf(X, Y, Z), crs._AIRY_A, e2)
    dm = np.hypot((lo2 + 0.1278) * np.cos(np.radians(51.5)) * 111320,
                  (la2 - 51.5074) * 111320)[0]
    assert 90 < dm < 160
    # Helmert inverse is the exact matrix inverse (not the sign-flipped
    # small-angle approximation): cartesian round trip < 1e-9 m
    V = hi(*hf(X, Y, Z))
    assert np.hypot(np.hypot(V[0] - X, V[1] - Y), V[2] - Z)[0] < 1e-9
    # Irish grid origin: TM75 (53.5N, 8W) -> (200000, 250000)
    x, y, ok = crs.transform_points([-6.26], [53.35],
                                    "EPSG:4326", "EPSG:29903")
    assert ok.all() and 300000 < x[0] < 330000 and 220000 < y[0] < 250000


@pytest.mark.parametrize("epsg,lonr,latr", [
    (6933, (-179, 179), (-84, 84)), (3035, (-10, 30), (35, 70)),
    (5070, (-125, -65), (23, 50)), (3031, (-179, 179), (-89, -60)),
    (3413, (-179, 179), (60, 89)),
    (2154, (-5, 10), (41, 51)), (3978, (-140, -55), (42, 83)),
    (3577, (113, 154), (-44, -10)), (2193, (167, 178), (-47, -34)),
    # round 5: datum-shifted national grids (Helmert + TM on Airy)
    (27700, (-6.5, 1.7), (50.0, 60.5)), (29903, (-10.3, -5.6), (51.5, 55.3))])
def test_crs_registry_roundtrip(epsg, lonr, latr):
    rng = np.random.default_rng(1)
    lons = rng.uniform(*lonr, 300)
    lats = rng.uniform(*latr, 300)
    x, y, ok = crs.transform_points(lons, lats, "EPSG:4326", f"EPSG:{epsg}")
    lo, la, ok2 = crs.transform_points(x, y, f"EPSG:{epsg}", "EPSG:4326")
    assert ok.all() and ok2.all()
    # 2193 (NZTM) spans ±7 deg of its central meridian: TM series
    # truncation reaches ~1.7e-6 deg (~15 cm) at the domain edge
    tol = 1e-5 if epsg == 2193 else 1e-7
    assert max(np.abs(lo - lons).max(), np.abs(la - lats).max()) < tol


@pytest.mark.parametrize("epsg,cell", [
    (6933, (10, 11, 45, 46)), (3035, (10, 11, 45, 46)),
    (5070, (-96, -95, 40, 41)), (3031, (10, 11, -76, -75)),
    (3413, (10, 11, 75, 76)), (3577, (132, 133, -26, -25))])
def test_crs_equal_area_property(epsg, cell):
    """Equal-area projections must map any region to its authalic area;
    polar stereographic is conformal NOT equal-area — expect distortion."""
    l1, l2, p1, p2 = cell
    n = 400
    lon = np.concatenate([np.linspace(l1, l2, n), np.full(n, l2),
                          np.linspace(l2, l1, n), np.full(n, l1)])
    lat = np.concatenate([np.full(n, p1), np.linspace(p1, p2, n),
                          np.full(n, p2), np.linspace(p2, p1, n)])
    x, y, _ = crs.transform_points(lon, lat, "EPSG:4326", f"EPSG:{epsg}")
    area = abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) / 2
    import math
    dq = float(crs._q_authalic(np.sin(np.radians(p2)))
               - crs._q_authalic(np.sin(np.radians(p1))))
    truth = math.radians(l2 - l1) * crs.R_a ** 2 * dq / 2
    if epsg in (6933, 3035, 5070, 3577):
        assert abs(area / truth - 1) < 1e-6
    else:  # polar stereo: conformal NOT equal-area — scale is 1 only on
        # the standard parallel, so this off-parallel cell's area deviates
        assert abs(area / truth - 1) > 0.001


def test_reproject_bounds_new_codes():
    b = crs.reproject_bounds((5, 45, 15, 55), "EPSG:4326", "EPSG:3035")
    assert b[0] < 4321000 < b[2] and b[1] < 3210000 < b[3]


# --- JPEG 4:2:0 / restart intervals (round-3: real-world ingest streams) ----

def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 chroma-subsampled streams (what real-world encoders emit)
    decode correctly: luma survives at PSNR>=40, chroma at the box-filter
    fidelity bound. The decoder path (sampling-factor MCU walk, chroma
    upsample) shares no code with the encoder's subsampler."""
    from godal_spark.functions import jpeg as J

    y, x = np.mgrid[0:50, 0:70]
    img = np.stack([(y * 2 + x) % 256, (x * 2) % 256, ((x + y)) % 256],
                   axis=-1).astype(np.uint8)
    buf = J.encode_jpeg(img, quality=95, subsampling="420")
    # stream really is 4:2:0: SOF1 sampling byte for comp 1 is 0x22
    sof = buf.index(b"\xFF\xC0")
    assert buf[sof + 11] == 0x22 and buf[sof + 14] == 0x11
    dec = J.decode_jpeg_real(buf)
    assert dec.shape == img.shape
    # luma fidelity: Y plane of decode vs Y plane of source
    def luma(a):
        return (0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2])
    assert codecs.psnr(luma(img).astype(np.uint8),
                       luma(dec).astype(np.uint8)) >= 40.0
    # full-pixel fidelity bounded by chroma decimation, not broken decode
    assert codecs.psnr(img, dec) >= 30.0
    # 4:2:0 must be materially smaller than 4:4:4 of the same content
    assert len(buf) < len(J.encode_jpeg(img, quality=95))


@pytest.mark.parametrize("sub", ["420", "422", "440"])
def test_jpeg_subsampling_smooth_psnr40(sub):
    """On smooth content (the chroma-bandlimited case subsampling is FOR)
    every supported sampling hits PSNR>=40 end-to-end at q95."""
    from godal_spark.functions import jpeg as J

    y, x = np.mgrid[0:48, 0:64]
    img = np.stack([120 + y // 4, 90 + x // 4, 100 + (x + y) // 8],
                   axis=-1).astype(np.uint8)
    dec = J.decode_jpeg_real(J.encode_jpeg(img, quality=95, subsampling=sub))
    assert codecs.psnr(img, dec) >= 40.0


def test_jpeg_external_encoder_fixtures():
    """Decode JPEGs produced by an EXTERNAL encoder (javax.imageio, no
    shared code or conventions with this engine): baseline 4:2:0 q95,
    the same content as a multi-scan progressive (SOF2 with per-scan
    DHT redefinition — the round-4 bug: tables must be snapshotted at
    each scan's position), and a q50 baseline. PSNR vs the KNOWN source
    pixels, not a round-trip (r3 verdict item 1)."""
    import base64
    from godal_spark.functions import jpeg as J
    from godal_spark.functions.jpeg_fixtures import (
        JAVA_BASELINE_420_Q95, JAVA_BASELINE_420_Q50,
        JAVA_PROGRESSIVE_420_Q95)

    y, x = np.mgrid[0:48, 0:64]
    src = np.stack([120 + y // 4, 90 + x // 4, 100 + (x + y) // 8],
                   axis=-1).astype(np.uint8)
    for b64, min_psnr, marker in [(JAVA_BASELINE_420_Q95, 40.0, b"\xFF\xC0"),
                                  (JAVA_PROGRESSIVE_420_Q95, 40.0, b"\xFF\xC2"),
                                  (JAVA_BASELINE_420_Q50, 35.0, b"\xFF\xC0")]:
        buf = base64.b64decode(b64)
        assert marker in buf  # really is the claimed SOF type
        sof = buf.index(marker)
        assert buf[sof + 11] == 0x22  # really is 4:2:0
        dec = J.decode_jpeg_real(buf)
        assert dec.shape == src.shape
        assert codecs.psnr(src, dec) >= min_psnr


def test_jpeg_upsample_non_dividing_factors():
    """Index-mapped chroma upsample handles spec-legal NON-dividing
    sampling combos (e.g. hi=3 with hmax=4) that integer-repeat could
    not express (ADVICE r3). Compare against a per-pixel loop oracle."""
    from godal_spark.functions import jpeg as J

    rng = np.random.default_rng(7)
    for (hi, vi, hmax, vmax, w, h) in [
            (3, 1, 4, 2, 17, 9),    # non-dividing horizontal
            (2, 3, 3, 4, 10, 13),   # non-dividing both axes
            (1, 1, 3, 3, 12, 12),   # dividing factor 3
            (2, 2, 2, 2, 8, 8),     # identity
            (1, 2, 2, 2, 33, 21)]:  # classic 4:4:0-ish
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        p = rng.integers(0, 256, (ch, cw)).astype(np.float64)
        got = J._upsample_plane(p, hi, vi, hmax, vmax, w, h)
        assert got.shape == (h, w)
        for y in range(h):
            for x in range(w):
                assert got[y, x] == p[min((y * vi) // vmax, ch - 1),
                                      min((x * hi) // hmax, cw - 1)]


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn streams: markers present, DC predictors reset per
    segment, decode equals the no-restart decode exactly."""
    from godal_spark.functions import jpeg as J

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    plain = J.decode_jpeg_real(J.encode_jpeg(img, quality=95))
    for ri in (1, 2, 5):
        buf = J.encode_jpeg(img, quality=95, restart_interval=ri)
        assert b"\xFF\xDD" in buf  # DRI
        assert any(bytes([0xFF, 0xD0 + k]) in buf for k in range(8))
        assert (J.decode_jpeg_real(buf) == plain).all()
    # 4:2:0 + restarts combined (the common camera-pipeline shape)
    buf = J.encode_jpeg(img, quality=95, subsampling="420", restart_interval=2)
    plain420 = J.decode_jpeg_real(J.encode_jpeg(img, quality=95, subsampling="420"))
    assert (J.decode_jpeg_real(buf) == plain420).all()


def test_jpeg_dc_only_fast_path_exact():
    """Flat blocks take the DC-only IDCT shortcut — must be bit-equal to
    the general path's output (constant image decodes to a constant)."""
    from godal_spark.functions import jpeg as J

    img = np.full((32, 48), 137, np.uint8)
    dec = J.decode_jpeg_real(J.encode_jpeg(img, quality=95))
    assert dec.shape == (32, 48)
    assert np.unique(dec).size <= 2 and abs(int(dec[0, 0]) - 137) <= 1


def test_jpeg_odd_dims_subsampled():
    """Odd (non-multiple-of-16) dimensions with 4:2:0: MCU padding crops
    back to exact size."""
    from godal_spark.functions import jpeg as J

    y, x = np.mgrid[0:17, 0:23]
    img = np.stack([y * 7 % 256, x * 5 % 256, (x * y) % 256], -1).astype(np.uint8)
    dec = J.decode_jpeg_real(J.encode_jpeg(img, quality=95, subsampling="420"))
    assert dec.shape == (17, 23, 3)


def test_jpeg_progressive_bit_identical_to_baseline():
    """Progressive (SOF2, spectral selection + successive approximation)
    encodes the SAME quantized coefficients as baseline, so a correct
    multi-scan decoder must return bit-identical pixels. Covers DC
    first/refine, AC first/refine, EOBRUN, ZRL-with-correction-bits."""
    from godal_spark.functions import jpeg as J

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:48, 0:64]
    cases = [
        ("smooth", np.stack([100 + yy // 2, 80 + xx // 2,
                             90 + (xx + yy) // 4], -1).astype(np.uint8), "444"),
        ("noisy", rng.integers(0, 256, (64, 64, 3), dtype=np.uint8), "420"),
        ("gray", ((yy * 3 + xx * 2) % 256).astype(np.uint8), "444"),
        ("odd", rng.integers(0, 256, (17, 23, 3), dtype=np.uint8), "422"),
    ]
    sparse = np.zeros((40, 40), np.uint8)
    sparse[::7, ::5] = 200  # long zero runs: ZRL + EOBRUN stress
    cases.append(("sparse", sparse, "444"))
    for name, img, sub in cases:
        kw = {"subsampling": sub} if img.ndim == 3 else {}
        buf = J.encode_jpeg(img, quality=95, progressive=True, **kw)
        assert buf[buf.index(b"\xFF\xC2") + 1] == 0xC2  # really SOF2
        assert buf.count(b"\xFF\xDA") > 1  # really multi-scan
        base = J.decode_jpeg_real(J.encode_jpeg(img, quality=95, **kw))
        assert (J.decode_jpeg_real(buf) == base).all(), name


def test_jpeg_progressive_fuzz_small():
    """Randomized sizes/qualities/samplings: progressive == baseline."""
    from godal_spark.functions import jpeg as J

    rng = np.random.default_rng(42)
    for _ in range(10):
        h, w = int(rng.integers(8, 50)), int(rng.integers(8, 50))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        q = int(rng.choice([40, 75, 95]))
        sub = str(rng.choice(["444", "420"]))
        base = J.decode_jpeg_real(J.encode_jpeg(img, quality=q, subsampling=sub))
        prog = J.decode_jpeg_real(
            J.encode_jpeg(img, quality=q, subsampling=sub, progressive=True))
        assert (base == prog).all(), (h, w, q, sub)


def test_crs_geographic_datum_aliases():
    """NAD83 (EPSG:4269) and ETRS89 (EPSG:4258) transform as ≡ WGS84
    (metre-level identity, documented — no PROJ/datum grids in env)."""
    from godal_spark.functions import crs as CRS

    xs = np.array([-96.0, 10.0])
    ys = np.array([40.0, 52.0])
    for code in ("EPSG:4269", "EPSG:4258"):
        gx, gy, ok = CRS.transform_points(xs, ys, code, "EPSG:4326")
        assert ok.all() and np.allclose([gx, gy], [xs, ys])
        # through a projected family and back
        mx, my, ok = CRS.transform_points(xs, ys, code, "EPSG:3857")
        assert ok.all()
        bx, by, ok = CRS.transform_points(mx, my, "EPSG:3857", code)
        assert np.allclose([bx, by], [xs, ys], atol=1e-9)
    assert 4269 in CRS.supported_epsg() and 4258 in CRS.supported_epsg()


def _psnr12(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(4095.0 ** 2 / mse)


def test_jpeg_12bit_roundtrip():
    """Extended sequential 12-bit DCT (T.81 sample precision 12):
    uint16 gray and RGB (444 + 420), SOF1 marker, level shift 2048,
    wider DC-15/AC-14 Huffman alphabets; restart intervals too."""
    from godal_spark.functions import jpeg as J

    y, x = np.mgrid[0:180, 0:220]
    g12 = ((1800 + 6 * (y // 3) + 5 * (x // 2)) % 4096).astype(np.uint16)
    rgb12 = np.stack([(1900 + 8 * (y // 4)) % 4096,
                      (1400 + 9 * (x // 4)) % 4096,
                      (1600 + 7 * ((x + y) // 8)) % 4096],
                     axis=-1).astype(np.uint16)
    for arr, sub, floor in [(g12, "444", 60.0), (rgb12, "444", 60.0),
                            (rgb12, "420", 55.0)]:
        buf = J.encode_jpeg(arr, 95, subsampling=sub, precision=12)
        assert b"\xff\xc1" in buf  # SOF1 extended sequential
        dec = J.decode_jpeg_real(buf)
        assert dec.dtype == np.uint16 and dec.shape == arr.shape
        assert _psnr12(arr, dec) >= floor
    # full-range noise stays decodable (exercises the wide categories)
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 4096, (64, 48), dtype=np.uint16)
    dec = J.decode_jpeg_real(J.encode_jpeg(noise, 95, precision=12))
    assert _psnr12(noise, dec) >= 30.0  # noise is the lossy worst case
    # restart intervals reset the wide-range DC predictor correctly
    buf = J.encode_jpeg(g12, 90, precision=12, restart_interval=4)
    assert _psnr12(g12, J.decode_jpeg_real(buf)) >= 55.0


def test_jpeg_12bit_straightloop_reference_encoder():
    """Decode a 12-bit stream produced by a from-the-spec scalar
    encoder living in this test (math.cos DCT, its own bit writer —
    no code shared with the library's vectorized path). Catches
    vectorization bugs the library round-trip can't."""
    import math
    import struct as _s
    from godal_spark.functions import jpeg as J

    y, x = np.mgrid[0:24, 0:16]
    card = ((1000 + 90 * (y // 8) + 70 * (x // 8) + 5 * x) % 4096)

    qtbl = [[16] * 8 for _ in range(8)]
    # scalar FDCT per T.81 A.3.3
    def fdct(block):
        out = [[0.0] * 8 for _ in range(8)]
        for u in range(8):
            for v in range(8):
                cu = 1 / math.sqrt(2) if u == 0 else 1.0
                cv = 1 / math.sqrt(2) if v == 0 else 1.0
                s = 0.0
                for yy in range(8):
                    for xx in range(8):
                        s += (block[yy][xx] - 2048.0) * \
                            math.cos((2 * yy + 1) * u * math.pi / 16) * \
                            math.cos((2 * xx + 1) * v * math.pi / 16)
                out[u][v] = cu * cv * s / 4.0
        return out

    bits_out = []

    def put(val, n):
        for k in range(n - 1, -1, -1):
            bits_out.append((val >> k) & 1)

    dc_enc = J._DC12_ENC
    ac_enc = J._AC12_ENC

    def mag(v):
        if v == 0:
            return 0, 0
        size = abs(v).bit_length()
        return size, (v + (1 << size) - 1) if v < 0 else v

    zig = [(0, 0)]
    # build the zigzag walk scalar-style from the library's table ONLY
    # as coordinates (it is spec data, not code)
    zz_idx = list(J.ZIGZAG)
    pred = 0
    payload_bits = []
    bh, bw_ = 24 // 8, 16 // 8
    for by in range(bh):
        for bx in range(bw_):
            block = [[float(card[by * 8 + yy][bx * 8 + xx])
                      for xx in range(8)] for yy in range(8)]
            co = fdct(block)
            q = [round(co[i // 8][i % 8] / qtbl[i // 8][i % 8])
                 for i in range(64)]
            zz = [q[zz_idx[k]] for k in range(64)]
            size, amp = mag(int(zz[0]) - pred)
            pred = int(zz[0])
            c, ln = dc_enc[size]
            put(c, ln), put(amp, size)
            run = 0
            last = max([k for k in range(1, 64) if zz[k] != 0], default=0)
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    c, ln = ac_enc[0xF0]
                    put(c, ln)
                    run -= 16
                size, amp = mag(v)
                c, ln = ac_enc[(run << 4) | size]
                put(c, ln), put(amp, size)
                run = 0
            if last < 63:
                c, ln = ac_enc[0x00]
                put(c, ln)
    while len(bits_out) % 8:
        bits_out.append(1)
    ent = bytearray()
    for i in range(0, len(bits_out), 8):
        b = 0
        for bit in bits_out[i:i + 8]:
            b = (b << 1) | bit
        ent.append(b)
        if b == 0xFF:
            ent.append(0x00)  # byte stuffing

    def seg(m, p):
        return bytes([0xFF, m]) + _s.pack(">H", len(p) + 2) + p

    zzq = bytes(16 for _ in range(64))
    dqt = seg(0xDB, bytes([0]) + zzq)
    sof = seg(0xC1, _s.pack(">BHHB", 12, 24, 16, 1) + bytes([1, 0x11, 0]))
    dcb, dcs = J._DC12_SPEC
    acb, acs = J._AC12_SPEC
    dht = (seg(0xC4, bytes([0x00]) + bytes(dcb) + bytes(dcs))
           + seg(0xC4, bytes([0x10]) + bytes(acb) + bytes(acs)))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    stream = b"\xFF\xD8" + dqt + sof + dht + sos + bytes(ent) + b"\xFF\xD9"

    dec = J.decode_jpeg_real(stream)
    assert dec.dtype == np.uint16 and dec.shape == (24, 16)
    assert _psnr12(card, dec) >= 40.0


def test_jpeg_12bit_16bit_quant_tables():
    """DQT with Pq=1 (16-bit big-endian entries — what real 12-bit
    encoders emit for tables > 255): rewrite the library's 8-bit DQT
    into the 16-bit form; decode must be bit-identical."""
    import struct as _s
    from godal_spark.functions import jpeg as J

    y, x = np.mgrid[0:40, 0:56]
    g12 = ((900 + 11 * (y // 2) + 3 * x) % 4096).astype(np.uint16)
    buf = J.encode_jpeg(g12, 85, precision=12)
    base = J.decode_jpeg_real(buf)

    out = bytearray()
    pos = 0
    while pos < len(buf):
        if buf[pos] == 0xFF and pos + 1 < len(buf) and buf[pos + 1] == 0xDB:
            ln = _s.unpack_from(">H", buf, pos + 2)[0]
            body = buf[pos + 4:pos + 2 + ln]
            tq = body[0] & 0xF
            entries = body[1:65]
            wide = b"".join(_s.pack(">H", v) for v in entries)
            npay = bytes([(1 << 4) | tq]) + wide
            out += bytes([0xFF, 0xDB]) + _s.pack(">H", len(npay) + 2) + npay
            pos += 2 + ln
        else:
            out.append(buf[pos])
            pos += 1
    dec = J.decode_jpeg_real(bytes(out))
    assert np.array_equal(dec, base)


def test_jpeg_12bit_error_first():
    import pytest
    from godal_spark.functions import jpeg as J

    g12 = np.zeros((8, 8), np.uint16)
    with pytest.raises(ValueError, match="uint16"):
        J.encode_jpeg(g12.astype(np.uint8), precision=12)
    with pytest.raises(ValueError, match="out of range"):
        J.encode_jpeg(np.full((8, 8), 4096, np.uint16), precision=12)
    # progressive 12-bit is REAL since round 5e (SOF2 precision 12) —
    # test_jpeg_progressive_12bit covers it; here just prove it encodes
    assert J.encode_jpeg(g12, precision=12, progressive=True)[:2] == \
        b"\xFF\xD8"
    with pytest.raises(NotImplementedError, match="precision 10"):
        J.encode_jpeg(g12, precision=10)
    with pytest.raises(ValueError, match="uint8"):
        J.encode_jpeg(g12)  # uint16 at precision 8


def test_crs_formulaic_epsg_ranges():
    """epsg_to_proj4: whole national-grid families routed through the
    from_proj4 dispatch — ETRS89/NAD83/GDA94/GDA2020 UTM (≡ WGS84
    datum policy), NAD27/ED50/WGS72/DHDN with their standard published
    towgs84 shifts, Arctic LAEA, UPS."""
    from godal_spark.functions import crs as C

    def tp(x, y, s, d):
        gx, gy, ok = C.transform_points(
            np.array([x]), np.array([y]), s, d)
        return float(gx[0]), float(gy[0]), bool(ok[0])

    # ETRS89 / GDA2020 UTM ≡ WGS84 UTM (grs80 vs wgs84: sub-mm)
    for code, ref, pt in [("EPSG:25832", "EPSG:32632", (12.0, 55.0)),
                          ("EPSG:26915", "EPSG:32615", (-93.0, 45.0)),
                          ("EPSG:7850", "EPSG:32750", (117.0, -32.0)),
                          ("EPSG:28355", "EPSG:32755", (145.0, -37.0))]:
        a = tp(*pt, "EPSG:4326", code)
        w = tp(*pt, "EPSG:4326", ref)
        assert abs(a[0] - w[0]) < 1e-3 and abs(a[1] - w[1]) < 1e-3, code

    # classical datums: real displacement vs the modern grid + exact
    # round-trips through the Helmert kernel
    n27 = tp(-93.0, 45.0, "EPSG:4326", "EPSG:26715")
    n83 = tp(-93.0, 45.0, "EPSG:4326", "EPSG:26915")
    d = float(np.hypot(n27[0] - n83[0], n27[1] - n83[1]))
    assert 10 < d < 400  # NAD27 CONUS shift is tens-hundreds of m
    rt = tp(n27[0], n27[1], "EPSG:26715", "EPSG:4326")
    assert abs(rt[0] + 93) < 1e-8 and abs(rt[1] - 45) < 1e-8
    e50 = tp(5.0, 52.0, "EPSG:4326", "EPSG:23031")
    w84 = tp(5.0, 52.0, "EPSG:4326", "EPSG:32631")
    d = float(np.hypot(e50[0] - w84[0], e50[1] - w84[1]))
    assert 50 < d < 400  # ED50 mean-European shift
    w72 = tp(3.0, 50.0, "EPSG:4326", "EPSG:32231")
    w84b = tp(3.0, 50.0, "EPSG:4326", "EPSG:32631")
    d = float(np.hypot(w72[0] - w84b[0], w72[1] - w84b[1]))
    assert 1 < d < 30  # WGS72->WGS84: ~metres (dz 4.5 m + rotation)
    gk = tp(9.5, 50.0, "EPSG:4326", "EPSG:31467")  # DHDN GK zone 3
    assert 3400000 < gk[0] < 3600000
    rt = tp(gk[0], gk[1], "EPSG:31467", "EPSG:4326")
    # 7-param Helmert + TM series truncation: ~mm-level round trip
    assert abs(rt[0] - 9.5) < 5e-8 and abs(rt[1] - 50) < 5e-8

    # geographic classical datums
    nad27 = tp(-93.0, 45.0, "EPSG:4326", "EPSG:4267")
    d = float(np.hypot((nad27[0] + 93) * 78800, (nad27[1] - 45) * 111100))
    assert 10 < d < 400

    # unknown code stays error-first
    import pytest
    with pytest.raises(NotImplementedError, match="EPSG:29999"):
        tp(0.0, 0.0, "EPSG:4326", "EPSG:29999")


def test_crs_ups_epsg_worked_example():
    """UPS North (EPSG 5041/32661, polar stereographic variant A,
    k0 = 0.994): the EPSG Guidance 7-2 worked example — phi 73N,
    lam 44E -> E 3320416.75, N 632668.43 — reproduced < 1 cm; the
    south aspect and both alias codes round-trip."""
    from godal_spark.functions import crs as C

    def tp(x, y, s, d):
        gx, gy, ok = C.transform_points(
            np.array([x]), np.array([y]), s, d)
        return float(gx[0]), float(gy[0]), bool(ok[0])

    e, n, ok = tp(44.0, 73.0, "EPSG:4326", "EPSG:5041")
    assert ok and abs(e - 3320416.75) < 0.01 and abs(n - 632668.43) < 0.01
    assert tp(44.0, 73.0, "EPSG:4326", "EPSG:32661")[:2] == (e, n)
    b = tp(e, n, "EPSG:5041", "EPSG:4326")
    assert abs(b[0] - 44) < 1e-9 and abs(b[1] - 73) < 1e-8
    s = tp(44.0, -73.0, "EPSG:4326", "EPSG:5042")
    rt = tp(s[0], s[1], "EPSG:32761", "EPSG:4326")
    assert abs(rt[0] - 44) < 1e-9 and abs(rt[1] + 73) < 1e-8


def test_crs_polar_laea_exact_snyder():
    """Arctic-SDI LAEA (EPSG 3571-3576): the oblique formula's
    D = a*m0/(Rq*cos b0) is 0/0 at the pole, so lat0=90 dispatches to
    the exact polar-aspect equations — pinned here against an
    independent scalar Snyder 24-29..34 implementation."""
    import math
    from godal_spark.functions import crs as C

    a, e2 = 6378137.0, 0.00669437999014
    e = math.sqrt(e2)

    def q(phi):
        s = math.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s * s)
                           - (1 / (2 * e)) * math.log((1 - e * s)
                                                      / (1 + e * s)))

    qp = q(math.pi / 2)
    for lon, lat, code, lon0 in [(25.0, 64.0, "EPSG:3575", 10.0),
                                 (-120.0, 70.0, "EPSG:3572", -150.0),
                                 (170.0, 55.0, "EPSG:3571", 180.0)]:
        rho = a * math.sqrt(qp - q(math.radians(lat)))
        lam = math.radians(lon - lon0)
        xe, ye = rho * math.sin(lam), -rho * math.cos(lam)
        gx, gy, ok = C.transform_points(np.array([lon]), np.array([lat]),
                                        "EPSG:4326", code)
        assert ok[0] and abs(gx[0] - xe) < 0.01 and abs(gy[0] - ye) < 0.01
        bx, by, ok = C.transform_points(gx, gy, code, "EPSG:4326")
        assert abs(bx[0] - lon) < 1e-8 and abs(by[0] - lat) < 1e-8
    # the pole itself maps to the origin
    gx, gy, _ = C.transform_points(np.array([123.0]), np.array([90.0]),
                                   "EPSG:4326", "EPSG:3575")
    assert abs(gx[0]) < 1e-6 and abs(gy[0]) < 1e-6


def test_jpeg_vectorized_scan_matches_scalar():
    """The vectorized entropy coder must produce byte-identical scans to
    the per-block _encode_block walk (retained in jpeg.py as
    _encode_scan_scalar, the differential oracle) across sampling
    modes, 8- and 12-bit alphabets, and degenerate inputs — the
    speedup may not change the stream."""
    import godal_spark.functions.jpeg as J

    def scan_scalar(planes, samp, nbx, mcux, mcuy, dc_enc, ac_enc):
        return J._encode_scan_scalar(planes, samp, nbx, mcux, mcuy,
                                     dc_enc, ac_enc)

    def build_planes(arr, subsampling, quality, precision=8):
        half = float(1 << (precision - 1))
        if arr.ndim == 2:
            comps = [arr.astype(np.float64)]
            samp = [(1, 1)]
        else:
            r = arr[:, :, 0].astype(np.float64)
            g = arr[:, :, 1].astype(np.float64)
            b = arr[:, :, 2].astype(np.float64)
            comps = [0.299 * r + 0.587 * g + 0.114 * b,
                     -0.168736 * r - 0.331264 * g + 0.5 * b + half,
                     0.5 * r - 0.418688 * g - 0.081312 * b + half]
            samp = J._SAMPLING[subsampling]
        h, w = arr.shape[:2]
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        lum, chm = J.quant_tables(quality)
        qtbls = [lum] + ([chm] if len(comps) == 3 else [])
        planes, nbx = [], []
        for ci, comp in enumerate(comps):
            hi, vi = samp[ci]
            plane = J._box_downsample(comp, hmax // hi, vmax // vi)
            th, tw = mcuy * vi * 8, mcux * hi * 8
            plane = np.pad(plane, ((0, th - plane.shape[0]),
                                   (0, tw - plane.shape[1])), mode="edge")
            zz, _, bx = J._fdct_quant(plane, qtbls[0] if ci == 0 else qtbls[1],
                                      shift=half)
            planes.append(zz)
            nbx.append(bx)
        return planes, samp, nbx, mcux, mcuy

    rng = np.random.default_rng(11)
    cases = [(rng.integers(0, 256, (8, 8)).astype(np.uint8), "444", 90, 8),
             (rng.integers(0, 256, (41, 33, 3)).astype(np.uint8), "422", 90, 8),
             (rng.integers(0, 256, (100, 64, 3)).astype(np.uint8), "440", 75, 8),
             (rng.integers(0, 256, (64, 56, 3)).astype(np.uint8), "420", 95, 8),
             (np.zeros((32, 32), np.uint8), "444", 90, 8),
             (np.clip(np.cumsum(rng.integers(-2, 3, (96, 96, 3)), axis=1),
                      0, 255).astype(np.uint8), "420", 10, 8),
             (rng.integers(0, 4096, (48, 40)).astype(np.uint16), "444", 90, 12)]
    for i, (arr, sub, q, prec) in enumerate(cases):
        planes, samp, nbx, mcux, mcuy = build_planes(arr, sub, q, prec)
        dce, ace = ((J._DC12_ENC, J._AC12_ENC) if prec == 12
                    else (J._DC_ENC, J._AC_ENC))
        a = scan_scalar(planes, samp, nbx, mcux, mcuy, dce, ace)
        b = J._encode_scan_vec(planes, samp, nbx, mcux, mcuy, dce, ace)
        assert a == b, (i, arr.shape, sub, q, prec)

    # restart intervals: segment DC resets, per-segment byte padding,
    # RSTn cycling, >8 segments, ri larger than the MCU count, 12-bit
    # alphabets — all must be byte-identical to the scalar walk too
    rng2 = np.random.default_rng(23)
    ri_cases = [(rng2.integers(0, 256, (64, 56, 3)).astype(np.uint8),
                 "420", 85, 8, 1),
                (rng2.integers(0, 256, (64, 56, 3)).astype(np.uint8),
                 "420", 85, 8, 3),
                (rng2.integers(0, 256, (96, 96, 3)).astype(np.uint8),
                 "444", 50, 8, 2),     # 72 segments: RSTn wraps 9x
                (rng2.integers(0, 256, (41, 33)).astype(np.uint8),
                 "444", 90, 8, 7),
                (np.zeros((48, 48, 3), np.uint8), "422", 90, 8, 2),
                (rng2.integers(0, 256, (24, 24)).astype(np.uint8),
                 "444", 90, 8, 1000),  # ri > #MCUs: single segment
                (rng2.integers(0, 4096, (48, 40)).astype(np.uint16),
                 "444", 90, 12, 4)]
    for i, (arr, sub, q, prec, ri) in enumerate(ri_cases):
        planes, samp, nbx, mcux, mcuy = build_planes(arr, sub, q, prec)
        dce, ace = ((J._DC12_ENC, J._AC12_ENC) if prec == 12
                    else (J._DC_ENC, J._AC_ENC))
        a = J._encode_scan_scalar(planes, samp, nbx, mcux, mcuy,
                                  dce, ace, ri=ri)
        b = J._encode_scan_vec(planes, samp, nbx, mcux, mcuy,
                               dce, ace, ri=ri)
        assert a == b, ("ri", i, arr.shape, sub, q, prec, ri)


def test_mode_resample_vectorized_matches_unique_loop():
    """Round-5c arbitrary-factor mode vote (pair-map + sorted run-length)
    must match the per-output-pixel np.unique loop exactly — including
    overlapping box ranges, ties (smallest value wins), and int64
    categories above 2^53 on both the composite-key and lexsort paths."""
    from godal_spark.functions import resampling as RS
    from godal_spark.functions.resampling import _box_ranges

    def mode_loop(win, out_h, out_w):
        out = np.zeros((out_h, out_w), dtype=win.dtype)
        for i, ylo, yhi in _box_ranges(win.shape[0], out_h):
            for jj, xlo, xhi in _box_ranges(win.shape[1], out_w):
                blk = win[ylo:yhi, xlo:xhi]
                vals, counts = np.unique(blk, return_counts=True)
                out[i, jj] = vals[np.argmax(counts)]
        return out

    rng = np.random.default_rng(21)
    for trial in range(15):
        h = int(rng.integers(3, 80))
        w = int(rng.integers(3, 80))
        oh = int(rng.integers(1, h + 1))
        ow = int(rng.integers(1, w + 1))
        dt = [np.uint8, np.int16, np.int32, np.int64][trial % 4]
        lo, hi = ((-(2 ** 40), 2 ** 40) if dt == np.int64 and trial % 2
                  else (0, 9))
        a = rng.integers(lo, hi, (h, w)).astype(dt)
        got = RS.resample(a, ow, oh, alg="mode", out_dtype=np.int64)
        assert np.array_equal(np.asarray(got, np.int64),
                              mode_loop(a, oh, ow).astype(np.int64)), trial
    big = np.array([[2 ** 60, 2 ** 60 + 1], [2 ** 60 + 1, 2 ** 60]],
                   dtype=np.int64)
    got = RS.resample(big, 1, 1, alg="mode", out_dtype=np.int64)
    assert int(np.asarray(got).ravel()[0]) == 2 ** 60  # tie -> smallest


def test_points_in_ring_banded_matches_brute():
    """The round-5c y-banded ray cast must be bit-identical to the full
    points x segments block — every segment whose eps-padded y-span
    contains a point's y lands in that point's band, so the subset test
    is exact. Adversarial shapes: jagged stars, rectilinear staircases
    (horizontal segments), near-flat slivers; boundary points included."""
    import godal_spark.functions.geom as G

    rng = np.random.default_rng(17)
    for trial in range(12):
        nv = int(rng.integers(260, 2000))
        kind = trial % 3
        if kind == 0:
            ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
            ring = np.column_stack([np.cos(ang) * (1 + 0.5 * rng.random(nv)),
                                    np.sin(ang) * (1 + 0.5 * rng.random(nv))])
        elif kind == 1:
            xs = np.arange(nv // 2)
            ys = rng.integers(0, 5, nv // 2)
            ring = np.empty((2 * (nv // 2), 2))
            ring[0::2, 0] = xs
            ring[0::2, 1] = ys
            ring[1::2, 0] = xs + 1
            ring[1::2, 1] = ys
        else:
            xs = np.linspace(0, 100, nv)
            ring = np.column_stack([xs, 1e-9 * rng.standard_normal(nv)])
        ring = np.vstack([ring, ring[:1]])
        m = int(rng.integers(64, 2000))
        px = rng.uniform(ring[:, 0].min() - 1, ring[:, 0].max() + 1, m)
        py = rng.uniform(ring[:, 1].min() - 1, ring[:, 1].max() + 1, m)
        px[:10] = ring[:10, 0]
        py[:10] = ring[:10, 1]
        px[10:20] = (ring[:10, 0] + ring[1:11, 0]) / 2
        py[10:20] = (ring[:10, 1] + ring[1:11, 1]) / 2
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        brute = G._points_in_ring_block(px[:, None], py[:, None],
                                        x0, y0, x1, y1)
        banded = G._points_in_ring_banded(px, py, x0, y0, x1, y1)
        assert np.array_equal(brute, banded), (trial, kind, nv, m)


def test_jpeg_decode_window_chunk_rebase(monkeypatch):
    """Entropy segments larger than _WIN_CHUNK decode through the
    chunked window-rebase path; the result must be bit-identical to the
    single-chunk decode of the same stream (rebases land mid-segment,
    so any off-by-one in the base/pos bookkeeping shows up as garbage
    coefficients)."""
    import godal_spark.functions.jpeg as J

    rng = np.random.default_rng(11)
    # high-entropy content, no restart interval -> ONE big segment
    arr = rng.integers(0, 256, (160, 160, 3), dtype=np.uint8)
    buf = J.encode_jpeg(arr, quality=95, subsampling="444")
    ref = J.decode_jpeg_real(buf)
    # force several rebases: chunk base advances must stay margin-safe
    monkeypatch.setattr(J, "_WIN_CHUNK", 16384)
    monkeypatch.setattr(J, "_WIN_MARGIN", 4096)
    out = J.decode_jpeg_real(buf)
    assert out.dtype == ref.dtype and out.shape == ref.shape
    assert np.array_equal(out, ref)


def test_jpeg_progressive_vectorized_matches_scalar():
    """The vectorized progressive emitters (DC first/refine, AC
    first/refine with EOBRUN + buffered correction bits) must produce
    byte-identical streams to the per-block walk retained as
    _emit_progressive_scans_scalar — including the >32767-block EOBRUN
    cap (both the empty-block and the trailing-zero increment paths)
    and single-channel / chroma-subsampled layouts."""
    import godal_spark.functions.jpeg as J

    def prog(arr, q, sub, scalar):
        orig = J._emit_progressive_scans
        if scalar:
            J._emit_progressive_scans = J._emit_progressive_scans_scalar
        try:
            return J.encode_jpeg(arr, quality=q, subsampling=sub,
                                 progressive=True)
        finally:
            J._emit_progressive_scans = orig

    rng = np.random.default_rng(31)
    yy, xx = np.mgrid[0:72, 0:56]
    grad = ((yy * 2 + xx) % 251).astype(np.uint8)
    cases = [
        (rng.integers(0, 256, (48, 40, 3), np.uint8).astype(np.uint8),
         85, "420"),
        (rng.integers(0, 256, (41, 33), np.uint8).astype(np.uint8),
         50, "444"),
        (np.stack([grad, 255 - grad, grad // 3], -1), 92, "422"),
        (np.zeros((32, 24, 3), np.uint8), 90, "440"),
        (np.full((24, 24), 130, np.uint8), 10, "444"),
    ]
    for i, (arr, q, sub) in enumerate(cases):
        a = prog(arr, q, sub, True)
        b = prog(arr, q, sub, False)
        assert a == b, (i, arr.shape, q, sub, len(a), len(b))
        dec = J.decode_jpeg_real(b)
        assert dec.shape[:2] == arr.shape[:2]

    # EOBRUN cap paths: 41,625 AC-empty blocks (caps on the empty-block
    # increment) and a content block after a >32767-block gap (cap +
    # boundary flush in one scan)
    big = np.full((1480, 1800), 77, np.uint8)
    assert prog(big, 90, "444", True) == prog(big, 90, "444", False)
    big2 = np.full((1480, 1800), 140, np.uint8)
    big2[-8:, -8:] = (np.arange(64, dtype=np.uint8) * 4).reshape(8, 8)
    a2 = prog(big2, 90, "444", True)
    assert a2 == prog(big2, 90, "444", False)


def test_jpeg_progressive_12bit():
    """12-bit progressive (SOF2 at sample precision 12, T.81 Table B.2
    allows 8 or 12): the vectorized emitters must match the scalar walk
    byte-for-byte with the wider DC-15/AC-14 alphabets, and since the
    quantized coefficients are identical to the sequential SOF1 encode,
    the decoder must return bit-identical uint16 pixels for both."""
    import godal_spark.functions.jpeg as J

    rng = np.random.default_rng(13)
    yy, xx = np.mgrid[0:60, 0:44]
    cases = [rng.integers(0, 4096, (60, 44), dtype=np.uint16),
             ((yy * 31 + xx * 17) % 4096).astype(np.uint16)]

    def prog(a, scalar):
        orig = J._emit_progressive_scans
        if scalar:
            J._emit_progressive_scans = J._emit_progressive_scans_scalar
        try:
            return J.encode_jpeg(a, quality=90, progressive=True,
                                 precision=12)
        finally:
            J._emit_progressive_scans = orig

    for i, a in enumerate(cases):
        pv, ps = prog(a, False), prog(a, True)
        assert ps == pv, i
        dec_p = J.decode_jpeg_real(pv)
        dec_s = J.decode_jpeg_real(J.encode_jpeg(a, quality=90,
                                                 precision=12))
        assert dec_p.dtype == np.uint16
        assert np.array_equal(dec_p, dec_s), i
        err = dec_p.astype(np.int64) - a.astype(np.int64)
        mse = float((err.astype(np.float64) ** 2).mean())
        psnr = 10 * np.log10(4095.0 ** 2 / mse) if mse else 99.0
        assert psnr >= 40.0, (i, psnr)


def test_jpeg_segment_parallel_decode():
    """Restart segments decode independently: decode_jpeg_segments on
    arbitrary segment runs, reassembled, is bit-identical to the whole
    decode — across samplings, 12-bit, trailing short segments, and
    the trivial ri=0 single-segment case. Error-first for progressive
    streams and bad ranges."""
    import pytest

    import godal_spark.functions.jpeg as J

    rng = np.random.default_rng(41)
    cases = [((70, 110), "420", 4, 8), ((64, 48), "444", 1, 8),
             ((50, 90), "422", 7, 8), ((45, 77), "444", 5, 12),
             ((33, 33), "420", 0, 8)]
    for hw, sub, ri, prec in cases:
        h, w = hw
        if prec == 12:
            arr = rng.integers(0, 4096, (h, w), np.uint16) \
                .astype(np.uint16)
        else:
            arr = rng.integers(0, 256, (h, w, 3), np.uint8) \
                .astype(np.uint8)
        buf = J.encode_jpeg(arr, quality=85, subsampling=sub,
                            restart_interval=ri, precision=prec)
        whole = J.decode_jpeg_real(buf)
        info = J.jpeg_scan_info(buf)
        ns = info["n_segments"]
        cuts = sorted({0, ns // 3, (2 * ns) // 3, ns})
        parts = [J.decode_jpeg_segments(buf, a, b - a)
                 for a, b in zip(cuts, cuts[1:]) if b > a]
        asm = J.assemble_jpeg_segments(info, parts[::-1])  # any order
        assert np.array_equal(asm, whole), (hw, sub, ri, prec)

    buf = J.encode_jpeg(rng.integers(0, 256, (32, 32), np.uint8)
                        .astype(np.uint8), restart_interval=2)
    info = J.jpeg_scan_info(buf)
    with pytest.raises(ValueError, match="segment range"):
        J.decode_jpeg_segments(buf, info["n_segments"], 1)
    with pytest.raises(ValueError, match="covered twice"):
        p = J.decode_jpeg_segments(buf, 0, 1)
        J.assemble_jpeg_segments(info, [p, p])
    prog = J.encode_jpeg(rng.integers(0, 256, (32, 32), np.uint8)
                         .astype(np.uint8), progressive=True)
    with pytest.raises(NotImplementedError, match="segment-parallel"):
        J.jpeg_scan_info(prog)


def test_crs_french_lambert_zones():
    """NTF (Paris) / Lambert zones 27561-4 + étendu 27571-4 (EPSG 9801
    1SP on Clarke 1880 IGN, Paris prime meridian, published registry
    parameters). Invariants that need no external tool: the natural
    origin (Paris-meridian longitude 0, lat_0) maps to exactly
    (x_0, y_0) in the zone's own datum; WGS84 round-trips are identity;
    a zone and its étendu variant differ by exactly z*1e6 m northing."""
    from godal_spark.functions import crs as C

    ntf = "+proj=longlat +ellps=clrk80ign +towgs84=-168,-60,320 +pm=paris"
    cases = [(27561, 49.5, 600000.0, 200000.0),
             (27562, 46.8, 600000.0, 200000.0),
             (27563, 44.1, 600000.0, 200000.0),
             (27564, 42.165, 234.358, 185861.369),
             (27571, 49.5, 600000.0, 1200000.0),
             (27572, 46.8, 600000.0, 2200000.0),
             (27573, 44.1, 600000.0, 3200000.0),
             (27574, 42.165, 234.358, 4185861.369)]
    for code, lat0, x0, y0 in cases:
        x, y, ok = C.transform_points(np.array([0.0]), np.array([lat0]),
                                      ntf, f"EPSG:{code}")
        assert ok[0] and abs(x[0] - x0) < 1e-3 and abs(y[0] - y0) < 1e-3, \
            (code, x[0], y[0])
        gx, gy, ok = C.transform_points(np.array([2.35]), np.array([48.85]),
                                        "EPSG:4326", f"EPSG:{code}")
        bx, by, _ = C.transform_points(gx, gy, f"EPSG:{code}", "EPSG:4326")
        assert ok[0] and abs(bx[0] - 2.35) < 1e-7 \
            and abs(by[0] - 48.85) < 1e-7, code
    gx2, gy2, _ = C.transform_points(np.array([2.35]), np.array([48.85]),
                                     "EPSG:4326", "EPSG:27562")
    gxe, gye, _ = C.transform_points(np.array([2.35]), np.array([48.85]),
                                     "EPSG:4326", "EPSG:27572")
    assert abs(gx2[0] - gxe[0]) < 1e-9
    assert abs((gye[0] - gy2[0]) - 2_000_000) < 1e-9


def test_jpeg_segment_range_read_decode():
    """Cluster-scale range-read path: workers get only
    buf[:header_end] + their buf[a:b] segment slices
    (info['segment_ranges']) and decode via decode_jpeg_segment_slices
    — bit-identical to the whole decode, including the short final
    segment decoded far from its local index."""
    import godal_spark.functions.jpeg as J

    rng = np.random.default_rng(53)
    arr = rng.integers(0, 256, (70, 110, 3), np.uint8).astype(np.uint8)
    buf = J.encode_jpeg(arr, quality=85, subsampling="420",
                        restart_interval=4)
    whole = J.decode_jpeg_real(buf)
    info = J.jpeg_scan_info(buf)
    header = buf[:info["header_end"]]
    ns = info["n_segments"]
    parts = []
    for a, b in zip(range(0, ns, 2), list(range(2, ns, 2)) + [ns]):
        if b <= a:
            continue
        slices = [buf[x:y] for x, y in info["segment_ranges"][a:b]]
        parts.append(J.decode_jpeg_segment_slices(header, slices, a))
    assert np.array_equal(J.assemble_jpeg_segments(info, parts), whole)
    # the header is a few hundred bytes; slices exclude RST markers
    assert len(header) < 1024
    spans = info["segment_ranges"]
    assert all(b2 > a2 for a2, b2 in spans) and len(spans) == ns
