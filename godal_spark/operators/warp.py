"""Warp — gdalwarp work-alike (godal.go:983-1072): reprojection +
multi-source mosaic, the "join" of the raster world.

Golden contracts (godal_test.go:1852-1982):
  * -ts 40 40 resize with CRS kept;
  * multi-source mosaic unions extents: two 5x5 @45E/50E → one 10x5,
    left half 200, right half 100;
  * WarpInto overwrites the overlap of an existing dataset (155 over 200).

Distributed shape (north_star): the target grid is computed driver-side
from source METADATA only (small agg); each target tile inverse-maps to
the source images whose footprint intersects it via a broadcast
metadata join; pixel gather + resample happens once per (target tile ×
source) inside applyInPandas. Sources are applied in input order, later
sources overwriting valid pixels (GDAL order semantics).

Switches parsed error-first driver-side (invalid switch errors before
any job — godal_test.go:1872-1875).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from godal_spark.functions import codecs, crs as CRS
from godal_spark.functions.resampling import SUPPORTED as RESAMPLING_ALGS
from godal_spark.operators.tiling import TILE_SCHEMA, block_grid_list


@dataclass
class WarpConfig:
    t_srs: str | None = None
    ts: tuple[int, int] | None = None
    te: tuple[float, float, float, float] | None = None
    tr: tuple[float, float] | None = None
    resampling: str = "nearest"
    init_nodata: float = 0.0


def parse_warp_switches(switches: list[str] | None) -> WarpConfig:
    cfg = WarpConfig()
    sw = list(switches or [])
    i = 0
    while i < len(sw):
        s = sw[i]
        if s == "-t_srs":
            cfg.t_srs = sw[i + 1]
            i += 2
        elif s == "-ts":
            cfg.ts = (int(sw[i + 1]), int(sw[i + 2]))
            i += 3
        elif s == "-te":
            cfg.te = tuple(float(v) for v in sw[i + 1:i + 5])
            i += 5
        elif s == "-tr":
            cfg.tr = (float(sw[i + 1]), float(sw[i + 2]))
            i += 3
        elif s == "-r":
            if sw[i + 1].lower() not in RESAMPLING_ALGS:
                raise ValueError(f"warp: unknown -r alg {sw[i + 1]!r}")
            cfg.resampling = sw[i + 1].lower()
            i += 2
        elif s == "-co":
            raise ValueError("warp: creation options not valid as a switch here")
        else:
            raise ValueError(f"warp: invalid switch {s!r}")
    return cfg


def _target_grid(meta: list[dict], cfg: WarpConfig):
    """Driver-side plan: (gt, w, h, srs) of the output grid.

    Extent = union of source bounds reprojected to t_srs; resolution from
    the first source (GDAL computes an equivalent-res heuristic; for the
    axis-aligned goldens they coincide); -ts/-te/-tr override.
    """
    t_srs = cfg.t_srs or meta[0]["srs"]
    minx = miny = np.inf
    maxx = maxy = -np.inf
    for m in meta:
        b = CRS.dataset_bounds(m["gt"], m["w"], m["h"])
        if m["srs"] != t_srs:
            b = CRS.reproject_bounds(b, m["srs"], t_srs)
        minx, miny = min(minx, b[0]), min(miny, b[1])
        maxx, maxy = max(maxx, b[2]), max(maxy, b[3])
    if cfg.te:
        minx, miny, maxx, maxy = cfg.te
    if cfg.ts:
        w, h = cfg.ts
        px, py = (maxx - minx) / w, (maxy - miny) / h
    else:
        m0 = meta[0]
        if m0["srs"] == t_srs:
            px, py = abs(m0["gt"][1]), abs(m0["gt"][5])
        else:
            b0 = CRS.dataset_bounds(m0["gt"], m0["w"], m0["h"])
            rb = CRS.reproject_bounds(b0, m0["srs"], t_srs)
            px = (rb[2] - rb[0]) / m0["w"]
            py = (rb[3] - rb[1]) / m0["h"]
        if cfg.tr:
            px, py = cfg.tr
        w = int(round((maxx - minx) / px))
        h = int(round((maxy - miny) / py))
    gt = [minx, px, 0.0, maxy, 0.0, -py]
    return gt, w, h, t_srs


def warp(spark: SparkSession, images: DataFrame, switches: list[str] | None = None,
         *, block: int = 256, into_tiles: DataFrame | None = None,
         into_meta: dict | None = None) -> DataFrame:
    """Warp the images table into one mosaic; returns the target's tile
    DataFrame (level 0) whose gt/srs are stamped in extra columns.

    into_tiles/into_meta: WarpInto mode — reuse the existing dataset's
    grid (into_meta = {gt,w,h,srs}) and initialize target tiles from it.
    """
    cfg = parse_warp_switches(switches)  # fail-fast

    meta_rows = images.select("image_id", "w", "h", "gt", "srs").collect()
    src_order = {r.image_id: i for i, r in enumerate(meta_rows)}
    meta = [{"image_id": r.image_id, "w": r.w, "h": r.h,
             "gt": list(r.gt), "srs": r.srs} for r in meta_rows]
    if into_meta is not None:
        tgt_gt, tw, th, t_srs = (into_meta["gt"], into_meta["w"],
                                 into_meta["h"], into_meta["srs"])
    else:
        tgt_gt, tw, th, t_srs = _target_grid(meta, cfg)

    # target tile grid (driver-side; bounded by output size)
    grid = block_grid_list(tw, th, block, block)
    tile_rows = []
    for (bx, by, x0, y0, bw, bh) in grid:
        gminx, gmaxy = CRS.pixel_to_geo(tgt_gt, np.array([x0]), np.array([y0]))
        gmaxx, gminy = CRS.pixel_to_geo(tgt_gt, np.array([x0 + bw]), np.array([y0 + bh]))
        tile_rows.append((bx, by, x0, y0, bw, bh,
                          float(min(gminx[0], gmaxx[0])), float(min(gminy[0], gmaxy[0])),
                          float(max(gminx[0], gmaxx[0])), float(max(gminy[0], gmaxy[0]))))
    tiles = spark.createDataFrame(
        pd.DataFrame(tile_rows, columns=["block_x", "block_y", "x0", "y0", "bw", "bh",
                                         "tminx", "tminy", "tmaxx", "tmaxy"]))

    # source footprints in target srs (broadcast metadata join)
    fp_rows = []
    for m in meta:
        b = CRS.dataset_bounds(m["gt"], m["w"], m["h"])
        if m["srs"] != t_srs:
            b = CRS.reproject_bounds(b, m["srs"], t_srs)
        fp_rows.append((m["image_id"], b[0], b[1], b[2], b[3]))
    fps = spark.createDataFrame(
        pd.DataFrame(fp_rows, columns=["image_id", "sminx", "sminy", "smaxx", "smaxy"]))

    pairs = tiles.join(
        F.broadcast(fps),
        (F.col("tminx") < F.col("smaxx")) & (F.col("sminx") < F.col("tmaxx"))
        & (F.col("tminy") < F.col("smaxy")) & (F.col("sminy") < F.col("tmaxy")),
        "inner")
    pairs = pairs.join(images.select("image_id", "bytes", "fmt", "w", "h", "gt", "srs",
                                     "caption"), "image_id")

    tgt_gt_b = list(map(float, tgt_gt))
    alg = cfg.resampling
    order_map = src_order

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by = key
        r0 = pdf.iloc[0]
        x0, y0, bw, bh = int(r0.x0), int(r0.y0), int(r0.bw), int(r0.bh)
        # target pixel centers in target geo coords
        pxs = np.arange(x0, x0 + bw) + 0.5
        pys = np.arange(y0, y0 + bh) + 0.5
        gx, gy = np.meshgrid(pxs, pys)
        tx, ty = CRS.pixel_to_geo(tgt_gt_b, gx.ravel(), gy.ravel())
        outs: list[np.ndarray] = []
        dt = None
        pdf = pdf.assign(__ord=[order_map.get(i, 0) for i in pdf["image_id"]])
        for r in pdf.sort_values("__ord").itertuples(index=False):
            arr = codecs.decode(r.bytes, r.fmt, r.w, r.h)
            planes = [arr] if arr.ndim == 2 else [arr[:, :, b] for b in range(arr.shape[2])]
            if dt is None:
                dt = planes[0].dtype
                outs = [np.zeros(bw * bh, dtype=dt) for _ in planes]
            while len(outs) < len(planes):
                outs.append(np.zeros(bw * bh, dtype=dt))
            sx, sy = tx, ty
            if r.srs != t_srs:
                sx, sy, ok = CRS.transform_points(tx, ty, t_srs, r.srs)
            else:
                ok = np.ones(tx.shape, dtype=bool)
            ppx, ppy = CRS.geo_to_pixel(list(r.gt), sx, sy)
            if alg == "bilinear":
                # sample at pixel centers: fractional coords relative to
                # the center lattice
                fx = np.clip(ppx - 0.5, 0, r.w - 1)
                fy = np.clip(ppy - 0.5, 0, r.h - 1)
                x0i = np.floor(fx).astype(np.int64)
                y0i = np.floor(fy).astype(np.int64)
                x1i = np.minimum(x0i + 1, r.w - 1)
                y1i = np.minimum(y0i + 1, r.h - 1)
                wx = fx - x0i
                wy = fy - y0i
                inb = ok & (ppx >= 0) & (ppx < r.w) & (ppy >= 0) & (ppy < r.h)
                for b, plane in enumerate(planes):
                    p = plane.astype(np.float64)
                    v = (p[y0i, x0i] * (1 - wx) * (1 - wy) + p[y0i, x1i] * wx * (1 - wy)
                         + p[y1i, x0i] * (1 - wx) * wy + p[y1i, x1i] * wx * wy)
                    if np.issubdtype(dt, np.integer):
                        v = np.clip(np.floor(v + 0.5), np.iinfo(dt).min, np.iinfo(dt).max)
                    outs[b][inb] = v[inb].astype(dt)
            else:  # nearest (GDAL warp default)
                ix = np.floor(ppx).astype(np.int64)
                iy = np.floor(ppy).astype(np.int64)
                inb = ok & (ix >= 0) & (ix < r.w) & (iy >= 0) & (iy < r.h)
                for b, plane in enumerate(planes):
                    outs[b][inb] = plane[iy[inb], ix[inb]]
        return pd.DataFrame({
            "image_id": ["warped"] * len(outs), "band": list(range(len(outs))),
            "level": [0] * len(outs),
            "block_x": [bx] * len(outs), "block_y": [by] * len(outs),
            "x0": [x0] * len(outs), "y0": [y0] * len(outs),
            "bw": [bw] * len(outs), "bh": [bh] * len(outs),
            "w": [tw] * len(outs), "h": [th] * len(outs),
            "dtype": [str(dt)] * len(outs),
            "payload": [o.reshape(bh, bw).tobytes() for o in outs],
            "caption": [pdf.iloc[0].caption] * len(outs),
        })

    out_tiles = pairs.groupBy("block_x", "block_y").applyInPandas(render, schema=TILE_SCHEMA)
    out_tiles = (out_tiles.withColumn("gt", F.array(*[F.lit(v) for v in tgt_gt_b]))
                 .withColumn("srs", F.lit(t_srs)))
    if into_tiles is not None:
        # WarpInto: keep existing tiles where no source covered the block
        covered = out_tiles.select("block_x", "block_y").distinct()
        keep = into_tiles.join(covered, ["block_x", "block_y"], "left_anti")
        out_tiles = out_tiles.unionByName(keep, allowMissingColumns=True)
    return out_tiles
