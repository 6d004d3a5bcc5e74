"""Structured Streaming operators over the events table shape.

The reference is single-process/synchronous (no streaming surface —
SURVEY.md §2.9 'missing'); the engine adds the standard streaming story:

  * windowed_counts  — tumbling-window counts with watermarked late-data
    handling; identical logical plan batch vs stream (tested both ways:
    the batch run is the oracle for the streamed run).
  * sessionize       — session windows per user.
  * streaming_ingest_images — file-source stream of image rows → tile
    explode → append sink; demonstrates the engine pipeline running
    incrementally (new imagery arriving as files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling window per event_type; watermark bounds state for late
    rows when the input is a stream (no-op semantics change on batch)."""
    # watermarks require TIMESTAMP (not NTZ); cast identically in batch
    # mode so batch results stay the oracle for streamed results
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (e.groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("win.start").alias("win_start"), "event_type",
                    "n", "sum_value"))


def sessionize(events: DataFrame, gap: str = "30 minutes",
               watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (gap-based)."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (e.groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("sess.start").alias("sess_start"),
                    F.col("sess.end").alias("sess_end"), "user_id",
                    "n_events", "sum_value"))


def streaming_ingest_images(spark, src_path: str, out_path: str,
                            checkpoint: str, bw: int = 32, bh: int = 32):
    """Incremental tile pipeline: a parquet-file stream of image rows →
    block-grid tile explode (the SAME operator as batch — mapInPandas
    works unchanged under Structured Streaming) → append sink.

    Models new imagery landing in object storage: each micro-batch tiles
    only the new files; exactly-once via the sink checkpoint. Returns the
    StreamingQuery (caller awaits/stops)."""
    from godal_spark.datagen import IMAGES_SCHEMA
    from godal_spark.operators.tiling import explode_tiles
    from pyspark.sql import types as T

    schema = T._parse_datatype_string(IMAGES_SCHEMA)
    stream = spark.readStream.schema(schema).parquet(src_path)
    tiles = explode_tiles(stream, bw=bw, bh=bh)
    return (tiles.writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def stream_events_from_dir(spark, path: str, schema) -> DataFrame:
    """File-source stream (one parquet dir) — the test harness feeds this
    by dropping files in, which models object-store micro-batches."""
    return spark.readStream.schema(schema).parquet(path)


def run_stream_to_memory(df: DataFrame, name: str, timeout_s: float = 60.0):
    """Drive a streaming query to completion of available data (tests)."""
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(timeout_s)
    return q


def tile_completeness(tile_stream: DataFrame, expected_col: str = "n_expected"):
    """Custom stateful streaming operator (applyInPandasWithState): track
    per-image tile arrivals ACROSS micro-batches and emit one row the
    moment an image's full block grid has landed.

    The ingest problem this models: tiles of one image arrive scattered
    over many object-store files/micro-batches; downstream stages (e.g.
    overview build) need whole images. State per image_id = the set of
    distinct (block_x, block_y) seen + the expected count; state is
    dropped on completion (bounded by in-flight images, not by history).
    Late duplicates after completion re-open state and may re-emit —
    at-least-once emission; dedupe downstream on image_id if exactness
    is needed.

    Input columns: image_id, block_x, block_y, `expected_col`.
    Output: (image_id, n_tiles, complete=true).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import _parse_datatype_string

    out_schema = _parse_datatype_string(
        "image_id string, n_tiles bigint, complete boolean")
    state_schema = _parse_datatype_string("seen array<long>, expected long")

    def fn(key, pdfs, state):
        image_id = key[0]
        seen: set[int] = set()
        expected = None
        if state.exists:
            s_seen, s_exp = state.get
            seen = set(s_seen or [])
            expected = s_exp
        for pdf in pdfs:
            for bx, by, exp in zip(pdf["block_x"], pdf["block_y"],
                                   pdf[expected_col]):
                seen.add((int(bx) << 21) | int(by))
                expected = int(exp)
        if expected is not None and len(seen) >= expected:
            state.remove()
            yield pd.DataFrame({"image_id": [image_id],
                                "n_tiles": [len(seen)],
                                "complete": [True]})
        else:
            state.update((sorted(seen), expected))

    return tile_stream.groupBy("image_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)


def stream_exact_dedup(docs_stream: DataFrame, *, text_col: str = "text",
                       ts_col: str | None = None,
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: drop later arrivals of an already-seen
    text. Spark-first: this IS the built-in stateful dropDuplicates —
    state keyed by the content hash, bounded by the watermark when an
    event-time column exists (unbounded state otherwise, the documented
    Spark semantics for keep-forever dedup)."""
    hashed = docs_stream.withColumn("__th", F.md5(F.col(text_col)))
    if ts_col is not None:
        # dropDuplicatesWithinWatermark keys state by the hash ALONE, so a
        # later arrival of already-seen text with a *different* event time
        # is still dropped (as long as it lands within the watermark delay);
        # state per key is evicted once the watermark passes.  A plain
        # dropDuplicates(['__th', ts_col]) would only drop identical
        # (text, timestamp) pairs — not the dedup contract.
        return (hashed.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["__th"]).drop("__th"))
    return hashed.dropDuplicates(["__th"]).drop("__th")
