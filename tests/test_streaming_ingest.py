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


def test_tile_completeness_stateful(spark, tmp_path):
    """applyInPandasWithState across micro-batches: an image completes
    only once ALL its tiles have arrived (possibly in later batches)."""
    import pandas as pd
    from godal_spark.streaming.events import tile_completeness

    src = tmp_path / "tiles_in"
    out_ck = str(tmp_path / "ck")
    src.mkdir()

    def chunk(name, rows):
        pd.DataFrame(rows, columns=["image_id", "block_x", "block_y",
                                    "n_expected"]).to_parquet(src / name)

    # image A has 4 tiles split over two files; B has 2 tiles, only 1 yet
    chunk("f1.parquet", [("A", 0, 0, 4), ("A", 1, 0, 4), ("B", 0, 0, 2)])
    chunk("f2.parquet", [("A", 0, 1, 4), ("A", 1, 1, 4)])

    schema = "image_id string, block_x long, block_y long, n_expected long"
    out_dir = str(tmp_path / "done_out")

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        q = (tile_completeness(stream)
             .writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").option("checkpointLocation", out_ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r.image_id: r.n_tiles
                for r in spark.read.parquet(out_dir).collect()}

    got = run_once()
    assert got == {"A": 4}  # B incomplete -> not emitted

    # B's last tile lands later: resume from the SAME checkpoint
    chunk("f3.parquet", [("B", 1, 0, 2)])
    got2 = run_once()
    # state for B survived the restart: its count includes the batch-1 tile
    assert got2 == {"A": 4, "B": 2}


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    """Streaming exact dedup (built-in stateful dropDuplicates) keeps
    exactly one row per distinct text across micro-batches — the same
    survivor multiset as batch exact dedup."""
    import pandas as pd
    from godal_spark.streaming import events as EV

    import os
    src = str(tmp_path / "docs_in")
    os.makedirs(src, exist_ok=True)
    # two files -> two micro-batches; dups within AND across batches
    pd.DataFrame({"doc_id": [1, 2, 3], "text": ["aa", "bb", "aa"]}) \
        .to_parquet(src + "/p1.parquet")
    pd.DataFrame({"doc_id": [4, 5], "text": ["bb", "cc"]}) \
        .to_parquet(src + "/p2.parquet")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = EV.stream_exact_dedup(stream)
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = spark.sql("SELECT text FROM dedup_out").toPandas()["text"].tolist()
    assert sorted(got) == ["aa", "bb", "cc"]


def test_stream_exact_dedup_event_time_distinct_timestamps(spark, tmp_path):
    """With an event-time column, duplicate text arriving at DIFFERENT
    timestamps must still be dropped (ADVICE r3: dropDuplicates on
    (hash, ts) only dropped identical pairs; now
    dropDuplicatesWithinWatermark keys state by the hash alone)."""
    import os
    import pandas as pd
    from godal_spark.streaming import events as EV

    src = str(tmp_path / "docs_ts_in")
    os.makedirs(src, exist_ok=True)
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    df1 = pd.DataFrame({"doc_id": [1, 2],
                        "text": ["aa", "bb"],
                        "ts": [t0, t0 + pd.Timedelta(minutes=1)]})
    df1["ts"] = df1["ts"].astype("datetime64[us]")
    df1.to_parquet(src + "/p1.parquet")
    # same text 'aa', later timestamp, later micro-batch
    df2 = pd.DataFrame({"doc_id": [3, 4],
                        "text": ["aa", "cc"],
                        "ts": [t0 + pd.Timedelta(minutes=5),
                               t0 + pd.Timedelta(minutes=6)]})
    df2["ts"] = df2["ts"].astype("datetime64[us]")
    df2.to_parquet(src + "/p2.parquet")
    stream = (spark.readStream
              .schema("doc_id long, text string, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = EV.stream_exact_dedup(stream, ts_col="ts", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_ts_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = spark.sql("SELECT text FROM dedup_ts_out").toPandas()["text"]
    assert sorted(got.tolist()) == ["aa", "bb", "cc"]
