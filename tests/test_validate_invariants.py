"""Pipeline invariants: PSNR + caption equality through shuffles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from godal_spark import datagen
from godal_spark.operators import tiling, validate


def test_invariants_hold_through_pipeline(spark):
    images = datagen.synth_images(spark, 60, partitions=4).cache()
    tiles = tiling.explode_tiles(images, bw=32, bh=32)
    # force a real shuffle between explode and validate
    tiles = tiles.repartition(8, "image_id", "block_x")
    summary = validate.assert_invariants(images, tiles)
    assert summary["images"] == 60
    assert summary["worst_psnr_db"] >= 40.0


def test_invariants_catch_corruption(spark):
    images = datagen.images_df(spark, [
        datagen.image_row("ok", datagen.pixels_ramp(20, 20), "raw8")])
    tiles = tiling.explode_tiles(images, bw=16, bh=16)
    # corrupt captions downstream
    bad = tiles.withColumn("caption", F.lit("tampered"))
    with pytest.raises(AssertionError, match="caption"):
        validate.assert_invariants(images, bad)
    # corrupt payload of one tile
    bad2 = tiles.withColumn(
        "payload",
        F.when((F.col("block_x") == 0) & (F.col("block_y") == 0),
               F.expr("repeat(x'00', 256)").cast("binary")).otherwise(F.col("payload")))
    with pytest.raises(AssertionError):
        validate.assert_invariants(images, bad2)
