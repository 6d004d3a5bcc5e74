"""Source/sink layer: catalog-first IO with parquet fallback + layout."""

import numpy as np
import pytest

from godal_spark import datagen
from godal_spark.operators import tiling
from godal_spark.sources import catalog as CAT


def test_is_table_name():
    assert CAT.is_table_name("lake.images")
    assert CAT.is_table_name("images")
    assert not CAT.is_table_name("/tmp/x")
    assert not CAT.is_table_name("data/images.parquet")
    assert not CAT.is_table_name("file:/x")


def test_tiles_roundtrip_layout_and_pruning(spark, tmp_path):
    imgs = datagen.synth_images(spark, 30)
    tiles = tiling.explode_tiles(imgs, bw=32, bh=32)
    pyr = tiles.unionByName(tiling.build_overviews(tiles, min_size=32))
    dst = str(tmp_path / "tiles")
    CAT.write_tiles(pyr, dst, mode="overwrite", num_files=4)
    # physical layout: level=*/cell_bucket=* directories
    import os
    lvl_dirs = [d for d in os.listdir(dst) if d.startswith("level=")]
    assert "level=0" in lvl_dirs and len(lvl_dirs) >= 2

    back = CAT.read_tiles(spark, dst)
    assert back.count() == pyr.count()
    # LOD read prunes partitions: the plan's partition filters mention level
    l0 = CAT.read_tiles(spark, dst, level=0)
    assert l0.count() == tiles.count()
    plan = l0._jdf.queryExecution().executedPlan().toString()
    assert "level" in plan


def test_read_images_validates_schema(spark, tmp_path):
    p = str(tmp_path / "bad")
    spark.range(3).write.parquet(p)
    with pytest.raises(ValueError, match="missing columns"):
        CAT.read_images(spark, p)
    imgs = datagen.synth_images(spark, 5)
    good = str(tmp_path / "good")
    imgs.write.parquet(good)
    assert CAT.read_images(spark, good).count() == 5
