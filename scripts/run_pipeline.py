#!/usr/bin/env python
"""Production pipeline entrypoint (spark-submit --py-files target).

The north-rule deployment shape: tile + index + PIP-join a (huge) images
table, checkpointing per partition with lineage + throughput metrics so
a killed run resumes without recomputing completed cells.

Cluster:
    zip -r godal_spark.zip godal_spark
    spark-submit --py-files godal_spark.zip \
        --num-executors $N --executor-cores 4 --executor-memory 8g \
        scripts/run_pipeline.py --images <path> --footprints <path> \
        --out <dir> --partitions 64

Local smoke (this sandbox):
    python scripts/run_pipeline.py --synthetic 20000 --out /tmp/run1
    # kill it mid-run, run again: completed partitions are skipped.

Partitioning: work is split by a cell-prefix key (top bits of the tile
cell id) so each unit is geographically coherent; the hot-cell skew goes
through the salted join inside each unit.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", help="images parquet path")
    ap.add_argument("--footprints", help="footprints parquet path")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic images instead of --images")
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=16,
                    help="number of checkpoint partitions (cell-prefix buckets)")
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--res", type=int, default=9, help="cell resolution for the PIP join")
    ap.add_argument("--executors", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from godal_spark import datagen
    from godal_spark.operators import pip as pip_op, tiling
    from godal_spark.plans.lineage import CheckpointedWriter, run_partitioned
    from godal_spark.session import get_spark

    spark = get_spark("godal-pipeline", executors=args.executors)

    if args.synthetic:
        images = datagen.synth_images(spark, args.synthetic)
        fps = pip_op.with_bbox(datagen.synth_footprints(spark, max(500, args.synthetic // 10)))
    else:
        images = spark.read.parquet(args.images)
        fps = spark.read.parquet(args.footprints)
        if "minx" not in fps.columns:
            fps = pip_op.with_bbox(fps)

    # tile-assignment + cell index + PIP join (the benchmark spine)
    meta = images.select("image_id", "w", "h", "gt")
    tiles = tiling.with_block_grid(meta, bw=args.block, bh=args.block)
    tiles = tiles.withColumn(
        "lon", F.col("gt")[0] + (F.col("x0") + F.col("bw") / 2.0) * F.col("gt")[1]
    ).withColumn(
        "lat", F.col("gt")[3] + (F.col("y0") + F.col("bh") / 2.0) * F.col("gt")[5]
    ).drop("gt")
    joined = pip_op.pip_join(tiles, fps, res=args.res, broadcast_footprints=True)
    # checkpoint partition key: top bits of the join cell (geo-coherent)
    joined = joined.withColumn(
        "part_key", F.pmod(F.shiftright(F.col("cell"), 40), F.lit(args.partitions)))

    writer = CheckpointedWriter(args.out)
    t0 = time.time()

    def df_for_key(k):
        return joined.filter(F.col("part_key") == int(k))

    metas = run_partitioned(writer, [str(i) for i in range(args.partitions)], df_for_key)
    lineage = writer.lineage()
    total_rows = sum(m["rows"] for m in lineage)
    print(json.dumps({
        "completed_partitions": len(lineage),
        "newly_written": len(metas),
        "resumed_skipped": args.partitions - len(metas),
        "total_rows": total_rows,
        "wall_s": round(time.time() - t0, 2),
        "rows_per_sec": round(total_rows / max(time.time() - t0, 1e-9), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
