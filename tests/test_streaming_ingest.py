"""Incremental image-tiling stream: batch operator reused under
Structured Streaming, exactly-once via sink checkpoint."""

import numpy as np
from pyspark.sql import functions as F

from godal_spark import datagen
from godal_spark.streaming.events import streaming_ingest_images


def test_streaming_ingest_images(spark, tmp_path):
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "tiles_out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two images land
    rows1 = [datagen.image_row("s1", datagen.pixels_ramp(40, 40), "png"),
             datagen.image_row("s2", datagen.pixels_const3(33, 20), "raw8")]
    datagen.images_df(spark, rows1).coalesce(1).write.mode("append").parquet(src)
    q = streaming_ingest_images(spark, src, out, ckpt)
    q.awaitTermination(120)

    got1 = spark.read.parquet(out)
    n1 = got1.count()
    # s1: 2x2 grid = 4 tiles; s2: 3 bands x 2x1 grid = 6 tiles
    assert n1 == 10

    # batch 2: one more image lands; only IT is tiled (incremental)
    rows2 = [datagen.image_row("s3", datagen.pixels_maxxy(10, 10), "raw8")]
    datagen.images_df(spark, rows2).coalesce(1).write.mode("append").parquet(src)
    q2 = streaming_ingest_images(spark, src, out, ckpt)
    q2.awaitTermination(120)

    got2 = spark.read.parquet(out)
    assert got2.count() == n1 + 1  # s3 is one 32-block tile
    # no duplicates for already-processed images (exactly-once)
    assert got2.filter(F.col("image_id") == "s1").count() == 4
    # payload correctness through the stream
    t3 = got2.filter(F.col("image_id") == "s3").first()
    arr = np.frombuffer(t3.payload, np.uint8).reshape(10, 10)
    assert arr[9, 4] == 9 and arr[2, 7] == 7
