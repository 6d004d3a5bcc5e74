"""Translate/Warp goldens (godal_test.go:1817-1982)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from godal_spark import datagen
from godal_spark.functions import codecs
from godal_spark.operators import tiling, translate as TR, warp as WP


def test_translate_switch_validation():
    with pytest.raises(ValueError):
        TR.parse_translate_switches(["-bogus"])
    with pytest.raises(ValueError):
        TR.parse_translate_switches(None, creation=["BAR=BAZ"])
    cfg = TR.parse_translate_switches(
        ["-outsize", "200%", "200%"],
        creation=["TILED=YES", "BLOCKXSIZE=32", "BLOCKYSIZE=16"])
    assert TR.out_size(20, 20, cfg) == (40, 40)
    assert cfg.block_size == (32, 16)


def test_translate_resize_golden(spark):
    # 20x20 -outsize 200% → 40x40; blocks 32x16 (godal_test.go:1839-1850)
    arr = np.arange(400, dtype=np.uint8).reshape(20, 20)
    images = datagen.images_df(spark, [datagen.image_row("t", arr, "raw8",
                                                         gt=[0, 2, 0, 0, 0, -2])])
    out = TR.translate(images, ["-outsize", "200%", "200%"],
                       creation=["TILED=YES", "BLOCKXSIZE=32", "BLOCKYSIZE=16"])
    row = out.first()
    assert (row.w, row.h) == (40, 40)
    assert row.gt[1] == pytest.approx(1.0) and row.gt[5] == pytest.approx(-1.0)
    tiles = tiling.explode_tiles(out, bw=32, bh=16)
    grid = {(t.block_x, t.block_y, t.bw, t.bh) for t in tiles.collect()}
    assert grid == {(0, 0, 32, 16), (1, 0, 8, 16), (0, 1, 32, 16), (1, 1, 8, 16),
                    (0, 2, 32, 8), (1, 2, 8, 8)}


def test_translate_cast_and_window(spark):
    # CastedIO analog: -ot + -srcwin (godal_test.go:753-778 semantics)
    arr = np.arange(100, dtype=np.uint8).reshape(10, 10)
    images = datagen.images_df(spark, [datagen.image_row("c", arr, "raw8")])
    out = TR.translate(images, ["-srcwin", "2", "3", "4", "4"])
    row = out.first()
    got = codecs.decode(row.bytes, "raw8", row.w, row.h)
    assert np.array_equal(got, arr[3:7, 2:6])


def test_warp_switch_validation():
    with pytest.raises(ValueError):
        WP.parse_warp_switches(["-bogus"])
    cfg = WP.parse_warp_switches(["-ts", "40", "40", "-t_srs", "EPSG:3857"])
    assert cfg.ts == (40, 40) and cfg.t_srs == "EPSG:3857"


def test_warp_multi_mosaic_golden(spark):
    # two 5x5 const @45E/50E → 10x5, left 200 right 100 (godal_test.go:1895-1944)
    a = np.full((5, 5), 200, np.uint8)
    b = np.full((5, 5), 100, np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("ds1", a, "raw8", gt=[45, 1, 0, 35, 0, -1], srs="EPSG:4326"),
        datagen.image_row("ds2", b, "raw8", gt=[50, 1, 0, 35, 0, -1], srs="EPSG:4326"),
    ])
    tiles = WP.warp(spark, images, [], block=256)
    rows = tiles.collect()
    assert len(rows) == 1
    t = rows[0]
    assert (t.w, t.h) == (10, 5)
    got = np.frombuffer(t.payload, dtype=np.uint8).reshape(5, 10)
    exp = np.array([[200] * 5 + [100] * 5] * 5, dtype=np.uint8)
    assert np.array_equal(got, exp)


def test_warp_into_golden(spark):
    # 155 warped into a 200-filled 5x5 on the same grid → px(0,0)=155
    # (godal_test.go:1945-1982)
    base = np.full((5, 5), 200, np.uint8)
    src = np.full((5, 5), 155, np.uint8)
    base_images = datagen.images_df(spark, [
        datagen.image_row("out", base, "raw8", gt=[45, 1, 0, 35, 0, -1])])
    into_tiles = tiling.explode_tiles(base_images, bw=256, bh=256)
    src_images = datagen.images_df(spark, [
        datagen.image_row("in", src, "raw8", gt=[45, 1, 0, 35, 0, -1])])
    out = WP.warp(spark, src_images, [], block=256,
                  into_tiles=into_tiles,
                  into_meta={"gt": [45, 1, 0, 35, 0, -1], "w": 5, "h": 5,
                             "srs": "EPSG:4326"})
    t = out.first()
    got = np.frombuffer(t.payload, dtype=np.uint8).reshape(5, 5)
    assert got[0, 0] == 155 and (got == 155).all()


def test_warp_reproject_4326_to_3857(spark):
    # round-trip sanity: constant image stays constant through reprojection
    a = np.full((8, 8), 42, np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("r", a, "raw8", gt=[10, 0.1, 0, 45, 0, -0.1], srs="EPSG:4326")])
    tiles = WP.warp(spark, images, ["-t_srs", "EPSG:3857", "-ts", "8", "8"], block=256)
    t = tiles.first()
    got = np.frombuffer(t.payload, dtype=np.uint8).reshape(8, 8)
    assert (got == 42).all()
    assert t.srs == "EPSG:3857"


def test_warp_reproject_4326_to_lambert93(spark):
    """Round-4 CRS family (LCC 2SP) through the full warp path: a
    gradient over France reprojected into EPSG:2154 keeps its value set
    and lands at the right metric scale (~111 km per degree at these
    latitudes -> a 1-deg-square source becomes ~78-111 km in grid
    units)."""
    y, x = np.mgrid[0:8, 0:8]
    a = (20 + 10 * x + y).astype(np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("fr", a, "raw8",
                          gt=[2.0, 0.125, 0, 47.0, 0, -0.125],
                          srs="EPSG:4326")])
    tiles = WP.warp(spark, images, ["-t_srs", "EPSG:2154", "-ts", "8", "8"],
                    block=256)
    t = tiles.first()
    got = np.frombuffer(t.payload, dtype=np.uint8).reshape(8, 8)
    assert t.srs == "EPSG:2154"
    # values come from the source (nearest): subset, gradient preserved
    assert set(np.unique(got)) <= set(np.unique(a))
    assert got[0, 0] != got[-1, -1]
    gt = list(t.gt)
    # pixel width in metres: 1 deg lon at 46.5N is ~76.5 km -> the
    # 1-degree source maps to ~76-78 km east-west, /8 px
    assert 8000 < gt[1] < 11000
    assert -15000 < gt[5] < -8000


def test_warp_reproject_4326_to_osgb(spark):
    """Round-5 datum-shifted family (EPSG:27700, Helmert + TM on Airy)
    through the full warp path: a gradient over southern England keeps
    its value set and lands at metric grid scale (~69.5 km per degree of
    longitude at 51.5N)."""
    y, x = np.mgrid[0:8, 0:8]
    a = (20 + 10 * x + y).astype(np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("uk", a, "raw8",
                          gt=[-1.0, 0.125, 0, 52.0, 0, -0.125],
                          srs="EPSG:4326")])
    tiles = WP.warp(spark, images, ["-t_srs", "EPSG:27700", "-ts", "8", "8"],
                    block=256)
    t = tiles.first()
    got = np.frombuffer(t.payload, np.uint8).reshape(8, 8)
    assert t.srs == "EPSG:27700"
    assert set(np.unique(got)) <= set(np.unique(a))
    assert got[0, 0] != got[-1, -1]
    gt = list(t.gt)
    # 1-deg-lon source at 51.5N ~ 69.5 km east-west, /8 px
    assert 7000 < gt[1] < 11000
    assert -16000 < gt[5] < -9000


def test_warp_reproject_proj4_target(spark):
    """A PROJ4 definition string as -t_srs through the full warp path
    (reference accepts PROJ4 CRSes; round-5 from_proj4): arbitrary
    Gauss-Krüger zone over Germany on the Bessel ellipsoid + datum
    shift."""
    gk3 = ("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0 "
           "+ellps=bessel +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7")
    y, x = np.mgrid[0:8, 0:8]
    a = (20 + 10 * x + y).astype(np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("de", a, "raw8",
                          gt=[8.5, 0.125, 0, 51.0, 0, -0.125],
                          srs="EPSG:4326")])
    tiles = WP.warp(spark, images, ["-t_srs", gk3, "-ts", "8", "8"],
                    block=256)
    t = tiles.first()
    got = np.frombuffer(t.payload, np.uint8).reshape(8, 8)
    assert t.srs == gk3
    assert set(np.unique(got)) <= set(np.unique(a))
    gt = list(t.gt)
    # 1 deg lon at 50.5N ~ 70.9 km -> /8 px; easting near the 3.5e6 FE
    assert 7000 < gt[1] < 11000 and -16000 < gt[5] < -9000
    assert 3.43e6 < gt[0] < 3.52e6


def _mosaic_array(tiles, tw, th, dtype=np.uint8):
    out = np.zeros((th, tw), dtype=dtype)
    for t in tiles:
        a = np.frombuffer(t.payload, dtype=np.dtype(t.dtype)).reshape(t.bh, t.bw)
        out[t.y0:t.y0 + t.bh, t.x0:t.x0 + t.bw] = a
    return out


def test_warp_into_partial_coverage(spark):
    """Source covers only the left 3 columns of a 6x4 base: the right
    columns must KEEP their original values (round-1 zeroed them —
    reference WarpInto overwrites only the overlap, godal_test.go:1945+)."""
    base = np.full((4, 6), 200, np.uint8)
    src = np.full((4, 3), 155, np.uint8)
    base_images = datagen.images_df(spark, [
        datagen.image_row("out", base, "raw8", gt=[45, 1, 0, 35, 0, -1])])
    into_tiles = tiling.explode_tiles(base_images, bw=256, bh=256)
    src_images = datagen.images_df(spark, [
        datagen.image_row("in", src, "raw8", gt=[45, 1, 0, 35, 0, -1])])
    out = WP.warp(spark, src_images, [], block=256,
                  into_tiles=into_tiles,
                  into_meta={"gt": [45, 1, 0, 35, 0, -1], "w": 6, "h": 4,
                             "srs": "EPSG:4326"})
    t = out.first()
    got = np.frombuffer(t.payload, dtype=np.uint8).reshape(4, 6)
    exp = np.concatenate([np.full((4, 3), 155, np.uint8),
                          np.full((4, 3), 200, np.uint8)], axis=1)
    assert np.array_equal(got, exp)


@pytest.mark.parametrize("alg", ["nearest", "bilinear"])
def test_warp_tiled_equals_untiled(spark, alg):
    """Tile decomposition must be invisible: block=8 (multi source/target
    tiles + halo path) equals block=256 (single tile) bit-for-bit."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, size=(20, 28), dtype=np.uint8).astype(np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("big", arr, "raw8", gt=[10, 0.5, 0, 50, 0, -0.5])])
    sw = ["-ts", "35", "25", "-r", alg]
    small = WP.warp(spark, images, sw, block=8).collect()
    big = WP.warp(spark, images, sw, block=256).collect()
    a = _mosaic_array(small, 35, 25)
    b = _mosaic_array(big, 35, 25)
    assert np.array_equal(a, b)
    assert len(small) > 1 and len(big) == 1


def test_warp_mosaic_order_later_wins(spark):
    """Overlapping sources: ascending image_id order, later overwrites."""
    a = np.full((4, 4), 10, np.uint8)
    b = np.full((4, 4), 20, np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("a_first", a, "raw8", gt=[0, 1, 0, 4, 0, -1]),
        datagen.image_row("b_second", b, "raw8", gt=[2, 1, 0, 4, 0, -1]),
    ])
    tiles = WP.warp(spark, images, [], block=256).collect()
    got = _mosaic_array(tiles, 6, 4)
    assert (got[:, :2] == 10).all() and (got[:, 2:6] == 20).all()


def test_translate_ot_cast_survives_reencode(spark):
    """-ot UInt16/Float64 must change the fmt tag so the cast survives
    re-encode (ADVICE round 1: raw8 coerced the cast back to uint8)."""
    arr = np.arange(100, dtype=np.uint8).reshape(10, 10)
    images = datagen.images_df(spark, [datagen.image_row("c", arr, "raw8")])
    out = TR.translate(images, ["-ot", "UInt16"]).first()
    assert out.fmt == "raw16"
    got = codecs.decode(out.bytes, out.fmt, out.w, out.h)
    assert got.dtype == np.uint16 and np.array_equal(got, arr.astype(np.uint16))
    out2 = TR.translate(images, ["-ot", "Float64", "-outsize", "200%", "200%"]).first()
    assert out2.fmt == "rawf64"
    got2 = codecs.decode(out2.bytes, out2.fmt, out2.w, out2.h)
    assert got2.dtype == np.float64 and got2.shape == (20, 20)


def test_translate_ot_rejects_8bit_codecs(spark):
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    images = datagen.images_df(spark, [datagen.image_row("p", arr, "png")])
    with pytest.raises(Exception, match="incompatible"):
        TR.translate(images, ["-ot", "UInt16"]).first()


def test_warp_into_rotated_target_grid(spark):
    """Rotated target geotransform: compare the tiled distributed render
    against a dense numpy reference (same inverse-affine + nearest
    sampling computed directly)."""
    import math
    rng = np.random.default_rng(21)
    src = rng.integers(1, 255, (20, 24), dtype=np.uint8).astype(np.uint8)
    src_gt = [10.0, 0.5, 0.0, 50.0, 0.0, -0.5]
    images = datagen.images_df(spark, [
        datagen.image_row("s", src, "raw8", gt=src_gt, srs="EPSG:4326")])
    th_deg = 25.0
    c, s = math.cos(math.radians(th_deg)), math.sin(math.radians(th_deg))
    # rotated target grid centered on the source area
    tgt_gt = [8.0, 0.4 * c, 0.4 * s, 51.0, 0.4 * s, -0.4 * c]
    tw = th = 16
    out = WP.warp(spark, images, [], block=8,
                  into_tiles=spark.createDataFrame([], tiling.TILE_SCHEMA),
                  into_meta={"gt": tgt_gt, "w": tw, "h": th, "srs": "EPSG:4326"})
    got = _mosaic_array(out.collect(), tw, th)

    # dense reference
    ref = np.zeros((th, tw), np.uint8)
    for y in range(th):
        for x in range(tw):
            gx = tgt_gt[0] + (x + 0.5) * tgt_gt[1] + (y + 0.5) * tgt_gt[2]
            gy = tgt_gt[3] + (x + 0.5) * tgt_gt[4] + (y + 0.5) * tgt_gt[5]
            sx = (gx - src_gt[0]) / src_gt[1]
            sy = (gy - src_gt[3]) / src_gt[5]
            ix, iy = int(np.floor(sx)), int(np.floor(sy))
            if 0 <= ix < 24 and 0 <= iy < 20:
                ref[y, x] = src[iy, ix]
    assert np.array_equal(got, ref)
    assert (got > 0).any()  # overlap exists


def test_warp_tiled_equals_untiled_randomized(spark):
    """Randomized sizes/blocks/scales: halo + ownership math must keep
    the tile decomposition invisible for both kernels."""
    rng = np.random.default_rng(17)
    for trial in range(3):
        h = int(rng.integers(9, 40))
        w = int(rng.integers(9, 40))
        tw = int(rng.integers(7, 45))
        th = int(rng.integers(7, 45))
        blk = int(rng.integers(5, 12))
        alg = ("nearest", "bilinear")[trial % 2]
        arr = rng.integers(0, 255, (h, w), dtype=np.uint8).astype(np.uint8)
        images = datagen.images_df(spark, [
            datagen.image_row(f"z{trial}", arr, "raw8",
                              gt=[3, 0.37, 0, 44, 0, -0.41])])
        sw = ["-ts", str(tw), str(th), "-r", alg]
        a = _mosaic_array(WP.warp(spark, images, sw, block=blk).collect(), tw, th)
        b = _mosaic_array(WP.warp(spark, images, sw, block=256).collect(), tw, th)
        assert np.array_equal(a, b), (trial, h, w, tw, th, blk, alg)


@pytest.mark.parametrize("alg", ["cubic", "lanczos"])
def test_warp_kernel_identity_grid(spark, alg):
    """On an aligned same-resolution grid every sample lands exactly on a
    pixel center where Catmull-Rom and Lanczos weights collapse to the
    identity — output must equal input bit-for-bit."""
    rng = np.random.default_rng(31)
    arr = rng.integers(0, 255, (12, 17), dtype=np.uint8).astype(np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("idg", arr, "raw8", gt=[5, 0.25, 0, 40, 0, -0.25])])
    out = WP.warp(spark, images, ["-r", alg], block=256)
    got = _mosaic_array(out.collect(), 17, 12)
    assert np.array_equal(got, arr)


@pytest.mark.parametrize("alg", ["cubic", "cubicspline", "lanczos"])
def test_warp_kernel_tiled_equals_untiled(spark, alg):
    """Kernel-radius halos must keep tiling invisible for radius-2/3
    kernels too."""
    rng = np.random.default_rng(33)
    arr = rng.integers(0, 255, (18, 22), dtype=np.uint8).astype(np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("k", arr, "raw8", gt=[0, 1, 0, 18, 0, -1])])
    sw = ["-ts", "30", "25", "-r", alg]
    a = _mosaic_array(WP.warp(spark, images, sw, block=6).collect(), 30, 25)
    b = _mosaic_array(WP.warp(spark, images, sw, block=256).collect(), 30, 25)
    assert np.array_equal(a, b)


def test_warp_unknown_kernel_raises_error_first():
    import godal_spark.operators.warp as W
    with pytest.raises(ValueError, match="unknown -r alg"):
        W.warp(None, None, ["-r", "sinc2000"])


def test_warp_mode_downscale_golden(spark):
    """-r mode (forward value voting): aligned 2:1 downscale — each
    target cell is the MAJORITY value of its 2x2 source block; ties
    break to the LOWEST value (deterministic under any partition order;
    GDAL's scan-order tie-break is not reproducible distributed).
    Hand-derived table."""
    arr = np.array([
        [5, 5, 9, 9, 1, 2, 7, 7],
        [5, 3, 9, 4, 2, 1, 7, 0],
        [8, 8, 6, 6, 3, 3, 4, 5],
        [8, 8, 2, 6, 3, 1, 5, 4],
    ], dtype=np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("c", arr, "raw8", gt=[0, 1, 0, 4, 0, -1])])
    out = WP.warp(spark, images, ["-ts", "4", "2", "-r", "mode"], block=256)
    got = _mosaic_array(out.collect(), 4, 2)
    exp = np.array([
        [5, 9, 1, 7],   # 5x3 beats 3; 9x3 beats 4; {1,2} tie -> 1; 7x3
        [8, 6, 3, 4],   # 8x4; 6x3; 3x3; {4,5} tie -> 4
    ], dtype=np.uint8)
    assert np.array_equal(got, exp)


def test_warp_mode_tiled_equals_untiled(spark):
    rng = np.random.default_rng(17)
    arr = (rng.integers(0, 5, (16, 24)) * 40).astype(np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("m", arr, "raw8", gt=[0, 1, 0, 16, 0, -1])])
    sw = ["-ts", "12", "8", "-r", "mode"]
    a = _mosaic_array(WP.warp(spark, images, sw, block=5).collect(), 12, 8)
    b = _mosaic_array(WP.warp(spark, images, sw, block=256).collect(), 12, 8)
    assert np.array_equal(a, b)
    # every output value must be one of the categorical inputs
    assert set(np.unique(a)) <= set(np.unique(arr))


def _gauss_forward_reference(arr, src_gt, tgt_gt, tw, th, sigma):
    """Independent straight-loop reference for the forward gauss kernel
    (pinned-value golden in the godal_test.go:2108-2172 style)."""
    import math
    acc = np.zeros((th, tw)); wsum = np.zeros((th, tw))
    sh, sw_ = arr.shape
    for sy in range(sh):
        for sx in range(sw_):
            gx = src_gt[0] + (sx + 0.5) * src_gt[1]
            gy = src_gt[3] + (sy + 0.5) * src_gt[5]
            tx = (gx - tgt_gt[0]) / tgt_gt[1]
            ty = (gy - tgt_gt[3]) / tgt_gt[5]
            cx, cy = int(np.floor(tx)), int(np.floor(ty))
            for oy in (-1, 0, 1):
                for ox in (-1, 0, 1):
                    ix, iy = cx + ox, cy + oy
                    if not (0 <= ix < tw and 0 <= iy < th):
                        continue
                    d2 = (tx - (ix + 0.5)) ** 2 + (ty - (iy + 0.5)) ** 2
                    w = math.exp(-d2 / (2 * sigma * sigma))
                    acc[iy, ix] += w * float(arr[sy, sx])
                    wsum[iy, ix] += w
    out = np.where(wsum > 0, acc / np.where(wsum == 0, 1, wsum), 0)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def test_warp_gauss_downscale_matches_reference(spark):
    """-r gauss: 2:1 downscale equals the independent forward-mapped
    gaussian reference, and the plan is tile-invisible (block=5 crosses
    the 3x3 spread across target-block seams)."""
    import godal_spark.operators.warp as W
    rng = np.random.default_rng(23)
    arr = rng.integers(0, 255, (16, 24), dtype=np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("g", arr, "raw8", gt=[0, 1, 0, 16, 0, -1])])
    sw = ["-ts", "12", "8", "-r", "gauss"]
    a = _mosaic_array(WP.warp(spark, images, sw, block=5).collect(), 12, 8)
    b = _mosaic_array(WP.warp(spark, images, sw, block=256).collect(), 12, 8)
    assert np.array_equal(a, b)
    exp = _gauss_forward_reference(
        arr, [0, 1, 0, 16, 0, -1], [0, 2.0, 0, 16, 0, -2.0], 12, 8,
        W._GAUSS_SIGMA)
    assert np.array_equal(b, exp)


def test_warp_gauss_constant_preserved(spark):
    """gauss of a constant field is that constant (weights cancel)."""
    images = datagen.images_df(spark, [
        datagen.image_row("k", np.full((12, 12), 93, np.uint8), "raw8",
                          gt=[0, 1, 0, 12, 0, -1])])
    got = _mosaic_array(
        WP.warp(spark, images, ["-ts", "6", "6", "-r", "gauss"], block=4)
        .collect(), 6, 6)
    assert (got == 93).all()


def test_warp_average_downscale_golden(spark):
    """-r average (forward mapping): aligned 2:1 downscale makes every
    target pixel the mean of its 2x2 source block — hand-derivable."""
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    images = datagen.images_df(spark, [
        datagen.image_row("a", arr, "raw8", gt=[0, 1, 0, 8, 0, -1])])
    out = WP.warp(spark, images, ["-ts", "4", "4", "-r", "average"], block=256)
    got = _mosaic_array(out.collect(), 4, 4)
    exp = np.floor(arr.reshape(4, 2, 4, 2).mean(axis=(1, 3)) + 0.5).astype(np.uint8)
    assert np.array_equal(got, exp)


def test_warp_average_tiled_and_multisource(spark):
    """average must be tile-invisible and respect source order."""
    rng = np.random.default_rng(41)
    arr = rng.integers(0, 255, (16, 24), dtype=np.uint8).astype(np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("m", arr, "raw8", gt=[0, 1, 0, 16, 0, -1])])
    sw = ["-ts", "12", "8", "-r", "average"]
    a = _mosaic_array(WP.warp(spark, images, sw, block=5).collect(), 12, 8)
    b = _mosaic_array(WP.warp(spark, images, sw, block=256).collect(), 12, 8)
    assert np.array_equal(a, b)
    # two overlapping constants: later image_id wins on the overlap
    i2 = datagen.images_df(spark, [
        datagen.image_row("a_lo", np.full((4, 4), 10, np.uint8), "raw8",
                          gt=[0, 1, 0, 4, 0, -1]),
        datagen.image_row("b_hi", np.full((4, 4), 200, np.uint8), "raw8",
                          gt=[2, 1, 0, 4, 0, -1])])
    got = _mosaic_array(WP.warp(spark, i2, ["-r", "average"], block=256)
                        .collect(), 6, 4)
    assert (got[:, :2] == 10).all() and (got[:, 2:] == 200).all()


def test_warp_forward_kernels_multiband(spark):
    """average/mode over a 3-band source: each band reduces
    independently (per-(image, band) forward accumulation)."""
    rng = np.random.default_rng(53)
    arr = np.stack([rng.integers(0, 200, (8, 8)),
                    (rng.integers(0, 4, (8, 8)) * 60),
                    np.full((8, 8), 99)], axis=-1).astype(np.uint8)
    images = datagen.images_df(spark, [
        datagen.image_row("mb", arr, "raw8", gt=[0, 1, 0, 8, 0, -1])])
    for alg in ("average", "mode"):
        tiles = WP.warp(spark, images, ["-ts", "4", "4", "-r", alg],
                        block=256).collect()
        got = {t.band: np.frombuffer(t.payload, np.uint8).reshape(4, 4)
               for t in tiles}
        assert set(got) == {0, 1, 2}
        # constant band stays constant under both kernels
        assert (got[2] == 99).all()
        if alg == "average":
            exp0 = np.floor(arr[:, :, 0].reshape(4, 2, 4, 2)
                            .mean(axis=(1, 3)) + 0.5).astype(np.uint8)
            assert np.array_equal(got[0], exp0)
        else:
            # every mode output value must come from the band's inputs
            assert set(np.unique(got[1])) <= set(np.unique(arr[:, :, 1]))
