"""Raster↔vector round trip (north_star): Rasterize → Polygonize must
reproduce the source geometry set exactly."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from godal_spark import datagen
from godal_spark.functions import crs as CRS, geom as G
from godal_spark.operators import polygonize as PZ, rasterize as RZ, tiling


def test_rasterize_polygonize_roundtrip_exact(spark):
    # burn the canonical unit square onto a grid aligned to it, polygonize
    # back, and require the EXACT source geometry (godal round-trip rule)
    fps = datagen.canonical_footprints(spark)
    # grid: extent [99,-1]x[102,2], 30x30 → pixel 0.1°, square edges on
    # pixel boundaries → lossless rasterization
    out = RZ.rasterize(fps, te=(99, -1, 102, 2), ts=(30, 30), init=0, burn=1)
    r = out.first()
    arr = np.frombuffer(r.payload, np.uint8).reshape(30, 30)
    gt = list(r.gt)

    feats = PZ.polygonize_array(arr, gt=gt)
    burned = [(v, n, g) for v, n, g in feats if v == 1]
    assert len(burned) == 1
    v, n, g = burned[0]
    assert n == 100  # 10x10 pixels
    # geometry set equality: same bounds, same area, same WKT ring
    assert g.bounds() == (100.0, 0.0, 101.0, 1.0)
    assert g.area() == pytest.approx(1.0)
    src = G.from_wkb(bytes(fps.first().geometry))
    assert {tuple(p) for p in g.polygons()[0][0][:-1].tolist()} == \
           {tuple(p) for p in src.polygons()[0][0][:-1].tolist()}


def test_rasterize_polygonize_multi_region(spark):
    # two disjoint boxes → two features with exact bounds back
    boxes = [G.box(100, 0, 101, 1), G.box(101.5, 0.5, 102.0, 1.5)]
    fps = spark.createDataFrame(
        pd.DataFrame({"fid": [0, 1], "geometry": [G.to_wkb(b) for b in boxes]}),
        "fid long, geometry binary")
    out = RZ.rasterize(fps, te=(99.5, -0.5, 102.5, 2.0), ts=(30, 25), init=0, burn=7)
    r = out.first()
    arr = np.frombuffer(r.payload, np.uint8).reshape(25, 30)
    feats = [f for f in PZ.polygonize_array(arr, gt=list(r.gt)) if f[0] == 7]
    assert len(feats) == 2
    got_bounds = sorted(g.bounds() for _, _, g in feats)
    assert got_bounds[0] == pytest.approx((100.0, 0.0, 101.0, 1.0))
    assert got_bounds[1] == pytest.approx((101.5, 0.5, 102.0, 1.5))


def test_polygonize_geo_coords_through_spark(spark):
    # full engine path: image with gt → tiles → polygonize → geo geometry
    arr = np.zeros((8, 8), np.uint8)
    arr[2:6, 2:6] = 9
    images = datagen.images_df(spark, [
        datagen.image_row("g", arr, "raw8", gt=[100.0, 0.125, 0, 1.0, 0, -0.125])])
    tiles = tiling.explode_tiles(images, bw=8, bh=8)
    feats = PZ.polygonize(tiles).collect()
    # geometry currently emitted in PIXEL space by the Spark wrapper;
    # convert with the gt and compare
    nine = [f for f in feats if f.value == 9.0]
    assert len(nine) == 1
    g = G.from_wkb(bytes(nine[0].geometry))
    ring = g.polygons()[0][0]
    gx = 100.0 + ring[:, 0] * 0.125
    gy = 1.0 + ring[:, 1] * -0.125
    assert (gx.min(), gy.min(), gx.max(), gy.max()) == (100.25, 0.25, 100.75, 0.75)


def test_polygonize_emits_geo_coords_with_images(spark):
    arr = np.zeros((8, 8), np.uint8)
    arr[2:6, 2:6] = 9
    images = datagen.images_df(spark, [
        datagen.image_row("g2", arr, "raw8", gt=[100.0, 0.125, 0, 1.0, 0, -0.125])])
    tiles = tiling.explode_tiles(images, bw=8, bh=8)
    feats = PZ.polygonize(tiles, images=images).collect()
    nine = [f for f in feats if f.value == 9.0]
    g = G.from_wkb(bytes(nine[0].geometry))
    assert g.bounds() == (100.25, 0.25, 100.75, 0.75)
    assert g.area() == pytest.approx(0.25)
