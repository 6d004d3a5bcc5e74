"""FillNoData / Nearblack / Dem / Viewshed / Grid kernel goldens."""

import numpy as np
import pytest

from godal_spark.operators.fill import (
    dem_hillshade, dem_slope, fillnodata, grid_create, nearblack, viewshed)


@pytest.fixture(scope="module")
def patch_image():
    arr = np.zeros((1000, 1000), np.uint8)
    arr[495:505, 495:505] = 128
    return arr, arr != 0


def test_fillnodata_default_distance(patch_image):
    # godal_test.go:2305-2315
    arr, valid = patch_image
    out = fillnodata(arr, valid, max_distance=100)
    assert out[595, 500] == 128
    assert out[604, 509] == 0


def test_fillnodata_max_distance_10(patch_image):
    # godal_test.go:2317-2327
    arr, valid = patch_image
    out = fillnodata(arr, valid, max_distance=10)
    assert out[595, 500] == 0
    assert out[510, 510] == 128


def test_fillnodata_smoothing_changes_result():
    # godal_test.go:2329-2345
    arr = np.zeros((1000, 1000), np.uint8)
    arr[495:505, 495:505] = (np.arange(100) + 23).reshape(10, 10).astype(np.uint8)
    valid = arr != 0
    a = fillnodata(arr, valid)[500, 520]
    b = fillnodata(arr, valid, smoothing=20)[500, 520]
    assert a != b


def test_nearblack_goldens():
    # godal_test.go:4703-4707, 4774-4779
    ramp = np.tile(np.arange(256, dtype=np.uint8), (4, 1))
    nb = nearblack(ramp, near=10)
    assert nb[0, :13].tolist() == [0] * 11 + [11, 12]
    wb = nearblack(255 - ramp, near=10, white=True)
    assert wb[0, :13].tolist() == [255] * 11 + [244, 243]


def test_nearblack_interior_preserved():
    # interior dark pixels not connected to the border stay
    arr = np.full((9, 9), 100, np.uint8)
    arr[4, 4] = 2
    assert nearblack(arr, near=10)[4, 4] == 2


def test_dem_edges_are_nodata_zero():
    # godal_test.go:5243-5359: edge row/col = 0
    z = np.outer(np.arange(10), np.ones(10)) * 5
    s = dem_slope(z)
    assert (s[0] == 0).all() and (s[-1] == 0).all()
    assert (s[:, 0] == 0).all() and (s[:, -1] == 0).all()
    # interior of a constant-gradient plane: constant slope
    assert np.allclose(s[1:-1, 1:-1], s[1, 1])
    assert s[1, 1] == pytest.approx(np.degrees(np.arctan(5.0)))
    hs = dem_hillshade(z)
    assert (hs[0] == 0).all() and 1 <= hs[1:-1, 1:-1].min()


VS_IN = np.array([
    -1, 0, 1, 0, -1,
    -1, 2, 0, 4, -1,
    -1, 1, 0, -1, -1,
    0, 3, 0, 2, 0,
    -1, 0, 0, 3, -1], dtype=np.int8).reshape(5, 5)
VS_OBSERVABLE = np.array([
    4, 2, 0, 4, 8,
    3, 2, 0, 4, 3,
    2, 1, 0, -1, -2,
    4, 3, 0, 2, 1,
    6, 3, 0, 2, 4], dtype=float).reshape(5, 5)


def test_viewshed_golden_tables():
    # godal_test.go:4472-4592: all three height modes, exact tables
    v = viewshed(VS_IN, 2, 2, 0.0, mode="normal")
    assert np.array_equal(v, np.where(VS_IN >= VS_OBSERVABLE, 127, 0).astype(np.int8))
    d = viewshed(VS_IN, 2, 2, 0.0, mode="dem")
    assert np.array_equal(d, np.maximum(0.0, VS_OBSERVABLE))
    g = viewshed(VS_IN, 2, 2, 0.0, mode="ground")
    assert np.array_equal(g, np.maximum(0.0, VS_OBSERVABLE - VS_IN))


def test_viewshed_basic():
    # flat dem: everything visible; wall hides what's behind it
    flat = np.zeros((5, 5))
    v = viewshed(flat, 2, 2, oz=1.0)
    assert (v == 127).all()
    wall = np.zeros((5, 5))
    wall[2, 3] = 10.0  # wall east of observer
    v = viewshed(wall, 2, 2, oz=1.0)
    assert v[2, 3] == 127  # the wall itself is visible
    assert v[2, 4] == 0    # behind the wall: hidden


def test_dem_hillshade_full_golden():
    # godal_test.go:5243-5359: linear E-W ramp grid (Int16) → hillshade
    # values {182,183}, line thickness 2, spacing 62, borders nodata 0
    import itertools

    px = np.array([500000.0, 500000.0, 600000.0, 600000.0])
    py = np.array([500000.0, 600000.0, 600000.0, 500000.0])
    pz = np.array([10.0, 10.0, 2026.0, 2026.0])
    g = grid_create("linear", px, py, pz, 2048, 2048,
                    500000, 600000, 500000, 600000).astype(np.int16)
    hs = dem_hillshade(g, cell_size=100000 / 2048)
    assert hs[0, 0] == 0 and hs[0, -1] == 0 and hs[-1, 0] == 0 and hs[-1, -1] == 0
    for x in range(1, 256):
        assert (hs[1:-1, x] == hs[1, x]).all()
    row = hs[1024, 1:-1]
    assert set(np.unique(row).tolist()) == {182, 183}
    runs = [(k, len(list(v))) for k, v in itertools.groupby(row.tolist())]
    for val, ln in runs[1:-1]:  # interior runs
        if val == 182:
            assert ln == 2
        else:
            assert ln == 62


def test_grid_linear_goldens():
    # godal_test.go:4279-4332 (incl. the 1/256 half-pixel offsets)
    px = np.array([0.0, 1.0, 0.0, 1.0])
    py = np.array([0.0, 0.0, 1.0, 1.0])
    pz = np.array([1.0, 0.0, 0.0, 1.0])
    g = grid_create("linear", px, py, pz, 256, 256, 0.0, 1.0, 0.0, 1.0)
    assert g[0, 0] == 1.0
    assert g[0, 255] == 0.00390625
    assert g[255, 0] == 0.00390625
    assert g[255, 255] == 1.0
    assert g[127, 255] == 0.5


def test_grid_maximum_golden():
    # godal_test.go:4404-4440: all sampled values 1.0
    px = np.array([0.0, 1.0, 0.0, 1.0])
    py = np.array([0.0, 0.0, 1.0, 1.0])
    pz = np.array([1.0, 1.0, 1.0, 1.0])
    g = grid_create("maximum", px, py, pz, 64, 64, 0.0, 1.0, 0.0, 1.0, radius=2.0)
    assert np.allclose(g, 1.0)


def test_grid_nearest_and_invdist():
    px = np.array([0.0, 10.0])
    py = np.array([0.0, 0.0])
    pz = np.array([1.0, 9.0])
    g = grid_create("nearest", px, py, pz, 10, 1, 0.0, 10.0, -0.5, 0.5)
    assert g[0, 0] == 1.0 and g[0, -1] == 9.0
    gi = grid_create("invdist", px, py, pz, 10, 1, 0.0, 10.0, -0.5, 0.5)
    assert 1.0 < gi[0, 4] < 9.0


def test_grid_linear_outside_hull_is_nan():
    px = np.array([0.0, 1.0, 0.5])
    py = np.array([0.0, 0.0, 1.0])
    pz = np.array([1.0, 1.0, 1.0])
    g = grid_create("linear", px, py, pz, 8, 8, -2.0, 3.0, -2.0, 3.0)
    assert np.isnan(g[0, 0])  # far corner outside the triangle
    assert np.isfinite(g[3, 3])


def test_dem_aspect_plane_goldens():
    from godal_spark.operators.fill import dem_aspect
    # z = x: downslope faces west -> 270; z = y (south-down): north -> 0
    zx = np.add.outer(np.zeros(6), np.arange(6.0))
    zy = np.add.outer(np.arange(6.0), np.zeros(6))
    ax = dem_aspect(zx)
    ay = dem_aspect(zy)
    assert np.allclose(ax[1:-1, 1:-1], 270.0)
    assert np.allclose(ay[1:-1, 1:-1], 0.0)
    # edges + flat cells are nodata
    flat = dem_aspect(np.full((5, 5), 7.0))
    assert (flat == -9999.0).all()
    assert (ax[0] == -9999.0).all() and (ax[:, 0] == -9999.0).all()


def test_dem_tri_tpi_roughness_plane_goldens():
    from godal_spark.operators.fill import dem_roughness, dem_tpi, dem_tri
    z = np.add.outer(np.zeros(6), np.arange(6.0))  # plane z = x
    # Riley: diffs (-1,0,1)x2 diag + (-1,1) lateral -> sum sq 6
    assert np.allclose(dem_tri(z)[1:-1, 1:-1], np.sqrt(6.0))
    assert np.allclose(dem_tri(z, alg="Wilson")[1:-1, 1:-1], 0.75)
    assert np.allclose(dem_tpi(z)[1:-1, 1:-1], 0.0)
    assert np.allclose(dem_roughness(z)[1:-1, 1:-1], 2.0)
    # a single spike: TPI at the spike = spike - mean(flat) = 8
    s = np.zeros((5, 5))
    s[2, 2] = 8.0
    assert dem_tpi(s)[2, 2] == 8.0
    assert dem_roughness(s)[2, 2] == 8.0
    assert np.isclose(dem_tri(s)[2, 2], np.sqrt(8 * 64.0))
    assert np.isclose(dem_tri(s, alg="Wilson")[2, 2], 8.0)


def test_dem_color_relief_golden():
    from godal_spark.operators.fill import dem_color_relief
    ramp = [(0.0, 0, 0, 0), (100.0, 200, 100, 50)]
    z = np.array([[0.0, 50.0, 100.0, 150.0, -10.0]])
    rgb = dem_color_relief(z, ramp)
    assert rgb.shape == (1, 5, 3)
    assert tuple(rgb[0, 0]) == (0, 0, 0)
    assert tuple(rgb[0, 1]) == (100, 50, 25)
    assert tuple(rgb[0, 2]) == (200, 100, 50)
    assert tuple(rgb[0, 3]) == (200, 100, 50)   # clamp above
    assert tuple(rgb[0, 4]) == (0, 0, 0)        # clamp below
    stepped = dem_color_relief(z, ramp, interpolate=False)
    assert tuple(stepped[0, 1]) == (0, 0, 0)


def test_dataset_dem_modes_dispatch(spark):
    from godal_spark import datagen
    from godal_spark.dataset import RasterCatalog
    z = np.add.outer(np.arange(8.0), np.arange(8.0))
    cat = RasterCatalog(spark, datagen.images_df(spark, [
        datagen.image_row("dem", z.astype(np.uint8), "raw8")]))
    ds = cat.open("dem")
    for mode in ("aspect", "tri", "tpi", "roughness"):
        out = ds.dem(mode)
        assert out.shape == (8, 8)
    rgb = ds.dem("color-relief", ramp=[(0, 0, 0, 0), (14, 255, 255, 255)])
    assert rgb.shape == (8, 8, 3)


def test_grid_average_distance_pts():
    from godal_spark.operators.fill import grid_create
    # 3 collinear points spaced 1 apart: pairwise dists {1,1,2} -> mean 4/3
    px = np.array([0.0, 1.0, 2.0])
    py = np.array([0.0, 0.0, 0.0])
    pz = np.array([5.0, 6.0, 7.0])
    out = grid_create("average_distance_pts", px, py, pz,
                      1, 1, 0.0, 2.0, -1.0, 1.0)
    assert np.isclose(out[0, 0], 4.0 / 3.0)
    # radius excluding the far point: only the pair (0,1) remains -> 1.0
    out2 = grid_create("average_distance_pts", px, py, pz,
                       1, 1, -0.5, 0.5, -0.5, 0.5, radius=1.6)
    assert np.isclose(out2[0, 0], 1.0)
    # fewer than 2 points in radius -> 0
    out3 = grid_create("average_distance_pts", px, py, pz,
                       1, 1, -3.5, -2.5, -0.5, 0.5, radius=0.4)
    assert out3[0, 0] == 0.0


def test_delaunay_matches_reference_walk():
    """Round-5c vectorized Bowyer–Watson must produce the IDENTICAL
    triangle set as the per-triangle Python reference it replaced (kept
    verbatim here), including cocircular grids where the insertion-order
    tie rule decides the diagonals."""
    from godal_spark.operators.fill import _delaunay

    def ref_delaunay(pts):
        n = len(pts)
        cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
        r = max(np.abs(pts[:, 0] - cx).max(),
                np.abs(pts[:, 1] - cy).max(), 1.0) * 64
        sup = np.array([[cx - 2 * r, cy - r], [cx + 2 * r, cy - r],
                        [cx, cy + 2 * r]])
        allp = np.vstack([pts, sup])
        tris = [(n, n + 1, n + 2)]

        def incircle(t, p):
            ax, ay = allp[t[0]]
            bx, by = allp[t[1]]
            cx_, cy_ = allp[t[2]]
            px_, py_ = allp[p]
            m = np.array([
                [ax - px_, ay - py_, (ax - px_) ** 2 + (ay - py_) ** 2],
                [bx - px_, by - py_, (bx - px_) ** 2 + (by - py_) ** 2],
                [cx_ - px_, cy_ - py_, (cx_ - px_) ** 2 + (cy_ - py_) ** 2]])
            orient = (bx - ax) * (cy_ - ay) - (by - ay) * (cx_ - ax)
            det = float(np.linalg.det(m)) * (1.0 if orient >= 0 else -1.0)
            eps = 1e-12 * ((float(np.abs(m[:, :2]).max()) or 1.0) ** 4)
            return 1 if det > eps else (-1 if det < -eps else 0)

        def contains(t, p):
            a, b, c = allp[t[0]], allp[t[1]], allp[t[2]]
            det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
            if abs(det) < 1e-30:
                return False
            l1 = ((b[1] - c[1]) * (allp[p][0] - c[0])
                  + (c[0] - b[0]) * (allp[p][1] - c[1])) / det
            l2 = ((c[1] - a[1]) * (allp[p][0] - c[0])
                  + (a[0] - c[0]) * (allp[p][1] - c[1])) / det
            return l1 >= -1e-12 and l2 >= -1e-12 and (1 - l1 - l2) >= -1e-12

        for p in range(n):
            seed = [t for t in tris if contains(t, p)]
            if not seed:
                continue
            bad_set = set(seed)
            frontier = list(seed)
            edge_map = {}
            for t in tris:
                for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                    edge_map.setdefault((min(e), max(e)), []).append(t)
            while frontier:
                t = frontier.pop()
                for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                    for nb in edge_map[(min(e), max(e))]:
                        if nb not in bad_set and incircle(nb, p) >= 0:
                            bad_set.add(nb)
                            frontier.append(nb)
            edge_count = {}
            for t in bad_set:
                for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                    key = (min(e), max(e))
                    edge_count[key] = edge_count.get(key, 0) + 1
            boundary = [e for e, cnt in edge_count.items() if cnt == 1]
            tris = [t for t in tris if t not in bad_set]
            for e in boundary:
                tris.append((e[0], e[1], p))
        return [t for t in tris if max(t) < n]

    def canon(tris):
        return sorted(tuple(sorted(t)) for t in tris)

    rng = np.random.default_rng(5)
    for trial in range(8):
        m = int(rng.integers(3, 80))
        pts = rng.random((m, 2)) * 100
        if trial % 3 == 0:  # cocircular-heavy grid
            k = int(rng.integers(2, 6))
            pts = np.array([(i * 10.0, j * 10.0)
                            for i in range(k) for j in range(k)])
        assert canon(ref_delaunay(np.asarray(pts))) \
            == canon(_delaunay(np.asarray(pts))), trial


def test_grid_linear_windowed_matches_full_scan():
    """The regular-grid node-window fast path must assign bit-identical
    values (incl. the NaN hull pattern) to the full-scan fallback,
    exercised by shuffling the node order (irregular -> fallback)."""
    from godal_spark.operators import fill as FL

    rng = np.random.default_rng(9)
    for trial in range(5):
        m = int(rng.integers(4, 50))
        pts = rng.random((m, 3)) * 100
        px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
        full = FL.grid_create("linear", px, py, pz, 33, 27, 0, 100, 0, 100)
        xs = (np.arange(33) + 0.5) * 100 / 33
        ys = (np.arange(27) + 0.5) * 100 / 27
        gx, gy = np.meshgrid(xs, ys)
        perm = rng.permutation(gx.size)
        scat = FL._grid_eval("linear", px, py, pz,
                             gx.ravel()[perm], gy.ravel()[perm])
        assert np.array_equal(full.ravel(), scat[np.argsort(perm)],
                              equal_nan=True), trial


def test_fillnodata_fixed_point_break_matches_reference():
    """The round-5c convergence break (no update -> stop) must give
    results identical to the full-iteration reference loop, including
    border holes with no valid pixel upstream in a direction (the case
    where the old every-pixel-finite early-exit never fired and all
    max_distance passes ran)."""
    import math

    from godal_spark.operators import fill as FL

    def fill_ref(arr, valid, max_distance=100):
        h, w = arr.shape
        out = arr.astype(np.float64).copy()
        vals = np.zeros((8, h, w))
        dist = np.full((8, h, w), np.inf)
        arr64 = arr.astype(np.float64)
        for k, (dx, dy) in enumerate(FL._DIRS8):
            v = np.where(valid, arr64, np.nan)
            d = np.where(valid, 0.0, np.inf)
            step = math.hypot(dx, dy)
            src_y = slice(max(-dy, 0), h - max(dy, 0))
            dst_y = slice(max(dy, 0), h - max(-dy, 0))
            src_x = slice(max(-dx, 0), w - max(dx, 0))
            dst_x = slice(max(dx, 0), w - max(-dx, 0))
            for _ in range(max_distance):  # reference: ALWAYS all passes
                cand_v = v[src_y, src_x].copy()
                cand_d = d[src_y, src_x] + step
                dv = d[dst_y, dst_x]
                better = cand_d < dv
                if better.any():
                    v[dst_y, dst_x][better] = cand_v[better]
                    dv[better] = cand_d[better]
            vals[k] = np.nan_to_num(v)
            dist[k] = d
        wsum = np.zeros((h, w))
        vsum = np.zeros((h, w))
        for k in range(8):
            ok = np.isfinite(dist[k]) & (dist[k] <= max_distance) & (dist[k] > 0)
            wgt = np.where(ok, 1.0 / np.maximum(dist[k], 1e-9), 0.0)
            wsum += wgt
            vsum += wgt * vals[k]
        filled = ~valid & (wsum > 0)
        out[filled] = vsum[filled] / wsum[filled]
        return out.astype(arr.dtype)

    rng = np.random.default_rng(3)
    for trial in range(6):
        n = int(rng.integers(8, 60))
        a = (rng.random((n, n)) * 255).astype(np.float32)
        valid = rng.random((n, n)) >= rng.uniform(0.1, 0.9)
        md = int(rng.integers(3, 40))
        assert np.array_equal(FL.fillnodata(a, valid, max_distance=md),
                              fill_ref(a, valid, max_distance=md),
                              equal_nan=True), trial
    a = (rng.random((40, 40)) * 255).astype(np.float32)
    valid = np.ones((40, 40), bool)
    valid[:5] = False
    valid[:, :3] = False
    assert np.array_equal(FL.fillnodata(a, valid, 20),
                          fill_ref(a, valid, 20), equal_nan=True)
