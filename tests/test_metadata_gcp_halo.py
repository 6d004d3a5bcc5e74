"""Metadata KV / color table / GCP accessors + halo join."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from godal_spark import datagen, dataset as DS
from godal_spark.operators import fill, tiling


@pytest.fixture(scope="module")
def ds(spark):
    images = datagen.images_df(spark, [
        datagen.image_row("m", datagen.pixels_ramp(8, 8), "raw8")])
    return DS.RasterCatalog(spark, images).open("m")


def test_metadata_kv(ds):
    # godal.go:1876-1944: string KV per domain
    assert ds.metadata("foo") is None
    ds.set_metadata("foo", "bar")
    ds.set_metadata("k", "v", domain="custom")
    assert ds.metadata("foo") == "bar"
    assert ds.metadata("k", domain="custom") == "v"
    assert ds.metadata("k") is None
    assert set(ds.metadata_domains()) == {"", "custom"}


def test_color_table_expand(ds):
    # godal.go:666-739: palette [][4]int16 → RGBA expansion
    ct = [(i, 255 - i, 0, 255) for i in range(256)]
    ds.set_color_table(0, ct)
    assert ds.color_table(0)[5] == (5, 250, 0, 255)
    rgba = ds.expand_palette(0)
    assert rgba.shape == (8, 8, 4)
    # pixel value v maps to entry v
    assert rgba[0, 3].tolist() == [3, 252, 0, 255]


def test_gcps_fit(ds):
    # godal.go:4296-4458
    gt = [10.0, 0.5, 0.0, 20.0, 0.0, -0.5]
    gcps = []
    for px, py in [(0, 0), (8, 0), (0, 8), (5, 3)]:
        gcps.append((px, py, gt[0] + px * gt[1], gt[3] + py * gt[5]))
    ds.set_gcps(gcps)
    assert len(ds.gcps()) == 4
    np.testing.assert_allclose(ds.gcps_to_geotransform(), gt, atol=1e-9)
    ds.set_gcps(gcps[:2])
    with pytest.raises(ValueError):
        ds.gcps_to_geotransform()


def test_halo_join_neighbors(spark):
    # 3x3 grid of 4px tiles: center tile must see 9 neighbor rows
    # (itself + 8), corner tile 4
    arr = np.arange(144, dtype=np.uint8).reshape(12, 12)
    images = datagen.images_df(spark, [datagen.image_row("h", arr, "raw8")])
    tiles = tiling.explode_tiles(images, bw=4, bh=4)
    halo = fill.halo_join(tiles)
    counts = {(r["block_x"], r["block_y"]): r["n"] for r in
              halo.groupBy("block_x", "block_y").agg(F.count("*").alias("n")).collect()}
    assert counts[(1, 1)] == 9
    assert counts[(0, 0)] == 4
    assert counts[(1, 0)] == 6
    # the (dx,dy)=(0,0) neighbor row carries the tile's own payload
    self_rows = halo.filter((F.col("n_dx") == 0) & (F.col("n_dy") == 0))
    r = self_rows.filter((F.col("block_x") == 1) & (F.col("block_y") == 1)).first()
    own = np.frombuffer(r["payload"], np.uint8)
    nb = np.frombuffer(r["n_payload"], np.uint8)
    assert np.array_equal(own, nb)
