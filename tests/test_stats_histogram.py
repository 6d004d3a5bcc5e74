"""Statistics + histogram goldens (godal_test.go:428-478, 4080-4177)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from godal_spark import datagen
from godal_spark.operators import raster_stats as RS, tiling


@pytest.fixture(scope="module")
def stats_tiles(spark):
    # 5x5 float64 grid, nodata -1, row-block tiles (5x1) to mirror the
    # Memory driver's scanline blocks (drives the approximate sampling)
    images = datagen.images_df(spark, [
        datagen.image_row("sg", (datagen.STATS_GRID * 50 + 50).astype(np.uint8), "raw8")])
    # uint8 encoding loses the float values — build float tiles directly
    import pandas as pd
    rows = []
    for by in range(5):
        rows.append({
            "image_id": "sg", "band": 0, "level": 0, "block_x": 0, "block_y": by,
            "x0": 0, "y0": by, "bw": 5, "bh": 1, "w": 5, "h": 5,
            "dtype": "float64",
            "payload": datagen.STATS_GRID[by].astype("<f8").tobytes(),
            "caption": "c",
        })
    return spark.createDataFrame(pd.DataFrame(rows), schema=tiling.TILE_SCHEMA).cache()


def test_statistics_exact_golden(spark, stats_tiles):
    st = RS.compute_statistics_single(stats_tiles, "sg", nodata=-1.0)
    assert st.min == 0.12 and st.max == 4.04
    assert round(st.mean, 2) == 2.12
    assert round(st.std, 2) == 1.32
    assert not st.approximate


def test_statistics_approximate_golden(spark, stats_tiles):
    # rows 0,2,4 sampled → mean 2.00, std 1.59 (godal_test.go:4144-4160)
    st = RS.compute_statistics_single(stats_tiles, "sg", nodata=-1.0, approximate=True)
    assert st.min == 0.12 and st.max == 4.04
    assert round(st.mean, 2) == 2.0
    assert round(st.std, 2) == 1.59
    assert st.approximate


def test_statistics_cache_semantics(spark, stats_tiles):
    cache = RS.StatsCache()
    st0, ok = cache.get("sg", 0)
    assert not ok and st0.min == 0.0 and st0.max == 0.0
    # SetStatistics path
    cache.set("sg", 0, RS.Statistics(5.0, 0.94, 10.0, 0.29))
    st1, ok = cache.get("sg", 0)
    assert ok and (st1.min, st1.max, st1.mean, st1.std) == (5.0, 0.94, 10.0, 0.29)
    cache.clear()
    # approximate compute does NOT satisfy an exact get, but does satisfy
    # an Approximate() get (godal_test.go:4152-4165)
    RS.compute_statistics_single(stats_tiles, "sg", nodata=-1.0,
                                 approximate=True, cache=cache)
    _, ok_exact = cache.get("sg", 0, approximate=False)
    st2, ok_approx = cache.get("sg", 0, approximate=True)
    assert not ok_exact and ok_approx
    assert round(st2.mean, 2) == 2.0 and round(st2.std, 2) == 1.59


def test_statistics_all_nodata_errors(spark):
    import pandas as pd
    rows = [{"image_id": "nd", "band": 0, "level": 0, "block_x": 0, "block_y": 0,
             "x0": 0, "y0": 0, "bw": 5, "bh": 5, "w": 5, "h": 5, "dtype": "float64",
             "payload": np.ones(25).astype("<f8").tobytes(), "caption": "c"}]
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=tiling.TILE_SCHEMA)
    with pytest.raises(ValueError):
        RS.compute_statistics_single(tiles, "nd", nodata=1.0)


def test_histogram_default_golden(spark):
    # 16x16 ramp 0..255 → 256 buckets [i-0.5, i+0.5), count 1 each
    arr = np.arange(256, dtype=np.uint8).reshape(16, 16)
    images = datagen.images_df(spark, [datagen.image_row("h", arr, "raw8")])
    tiles = tiling.explode_tiles(images, bw=16, bh=4)
    h = RS.histogram_single(tiles, "h")
    assert len(h) == 256
    for i in (0, 1, 100, 255):
        mn, mx, c = h.bucket(i)
        assert mn == i - 0.5 and mx == i + 0.5 and c == 1


def test_histogram_intervals_out_of_range_golden(spark):
    # Intervals(64, 63.5, 191.5) + IncludeOutOfRange: ends 66, middle 2
    arr = np.arange(256, dtype=np.uint8).reshape(16, 16)
    images = datagen.images_df(spark, [datagen.image_row("h2", arr, "raw8")])
    tiles = tiling.explode_tiles(images, bw=16, bh=16)
    h = RS.histogram_single(tiles, "h2", buckets=64, vmin=63.5, vmax=191.5,
                            include_out_of_range=True)
    assert len(h) == 64
    for i in range(64):
        mn, mx, c = h.bucket(i)
        assert mn == 63.5 + i * 2 and mx == 63.5 + (i + 1) * 2
        assert c == (66 if i in (0, 63) else 2)


def test_histogram_without_out_of_range_drops(spark):
    arr = np.arange(256, dtype=np.uint8).reshape(16, 16)
    images = datagen.images_df(spark, [datagen.image_row("h3", arr, "raw8")])
    tiles = tiling.explode_tiles(images, bw=16, bh=16)
    h = RS.histogram_single(tiles, "h3", buckets=64, vmin=63.5, vmax=191.5)
    assert h.counts.sum() == 128  # only in-range values counted
