"""Per-row pipeline invariants (BASELINE.json input_hint):

  * decoded-pixel fidelity: reassembling an image from its tiles must
    match the source decode EXACTLY for lossless formats and at
    PSNR ≥ 40 dB for lossy ones — through every shuffle;
  * caption equality: the caption must survive byte-identical.

`validate_tiles` computes both per image, distributed: tiles shuffle to
their image (one group per image — bounded), the source row broadcasts
through a join, PSNR in numpy. Run it after any pipeline stage that
rewrites tiles; the output is a small per-image report suitable for a
lineage/metrics table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from godal_spark.functions import codecs

LOSSLESS = {"raw8", "png"}

REPORT_SCHEMA = ("image_id string, psnr_db double, exact boolean, "
                 "caption_ok boolean, n_tiles bigint")


def validate_tiles(images: DataFrame, tiles: DataFrame, band: int = 0) -> DataFrame:
    """→ (image_id, psnr_db, exact, caption_ok, n_tiles) per image."""
    src = images.select("image_id", "bytes", "fmt",
                        F.col("w").alias("src_w"), F.col("h").alias("src_h"),
                        F.col("caption").alias("src_caption"))
    t = tiles.filter((F.col("band") == band) & (F.col("level") == 0)) \
        .join(src, "image_id")

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (image_id,) = key
        r0 = pdf.iloc[0]
        arr = codecs.decode(r0["bytes"], r0["fmt"], int(r0["src_w"]), int(r0["src_h"]))
        plane = arr if arr.ndim == 2 else arr[:, :, band]
        re = np.zeros_like(plane)
        for r in pdf.itertuples(index=False):
            re[r.y0:r.y0 + r.bh, r.x0:r.x0 + r.bw] = \
                np.frombuffer(r.payload, dtype=np.dtype(r.dtype)).reshape(r.bh, r.bw)
        p = codecs.psnr(plane, re)
        cap_ok = bool((pdf["caption"] == r0["src_caption"]).all())
        return pd.DataFrame({
            "image_id": [image_id],
            "psnr_db": [min(p, 999.0)],
            "exact": [bool(np.array_equal(plane, re))],
            "caption_ok": [cap_ok],
            "n_tiles": [len(pdf)],
        })

    return t.groupBy("image_id").applyInPandas(run, schema=REPORT_SCHEMA)


def assert_invariants(images: DataFrame, tiles: DataFrame, band: int = 0,
                      min_psnr: float = 40.0) -> dict:
    """Raises if any image violates the invariants; returns summary.

    Fully distributed: fmt joins back into the report (round 2 collected
    an {image_id: fmt} dict — unbounded driver growth at fleet scale);
    the driver sees 3 aggregate scalars plus at most 10 violation rows.
    """
    rep = validate_tiles(images, tiles, band) \
        .join(images.select("image_id", "fmt"), "image_id")
    lossless = F.col("fmt").isin(*sorted(LOSSLESS))
    viol = (F.when(~F.col("caption_ok"), F.lit("caption"))
            .when(lossless & ~F.col("exact"), F.lit("not exact (lossless fmt)"))
            .when(~lossless & (F.col("psnr_db") < min_psnr),
                  F.format_string("psnr %.1f < " + str(min_psnr),
                                  F.col("psnr_db"))))
    rep = rep.withColumn("viol", viol).persist()
    try:
        agg = rep.agg(F.count("*").alias("n"),
                      F.min("psnr_db").alias("worst"),
                      F.count("viol").alias("nbad")).first()
        if agg["nbad"]:
            bad = [(r["image_id"], r["viol"]) for r in
                   rep.filter(F.col("viol").isNotNull())
                      .select("image_id", "viol").limit(10).collect()]
            raise AssertionError(
                f"invariant violations: {bad} (of {agg['nbad']})")
        return {"images": agg["n"],
                "worst_psnr_db": agg["worst"] if agg["worst"] is not None
                else float("inf")}
    finally:
        rep.unpersist()
