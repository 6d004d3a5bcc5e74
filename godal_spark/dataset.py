"""User-facing façade: godal-style Dataset/Band/Layer API over the engine.

A godal user works with `Dataset` handles (Open → Bands → Read /
Translate / Warp / BuildOverviews / Polygonize...; reference
godal.go:1517-1568, 157-533). This module offers the same verbs, backed
by DataFrames: a `RasterCatalog` holds the images + tiles tables; a
`RasterDataset` is a lightweight handle (catalog, image_id) whose
methods launch engine stages. Per-dataset reads gather that image's
tiles (bounded — a godal Dataset is one in-memory raster); bulk
operations stay fully distributed across the catalog.

Layout contracts of Dataset.Read (reference godal.go:1184-1264;
goldens godal_test.go:704-751, 832-1035): band subsetting, pixel- vs
band-interleaved output, dtype casting on read.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from godal_spark.functions import codecs, crs as CRS
from godal_spark.functions.resampling import resample
from godal_spark.operators import tiling
from godal_spark.operators.raster_stats import StatsCache, Statistics, compute_statistics_single, histogram_single


class RasterCatalog:
    """The engine's table pair (images, tiles) + stats cache."""

    def __init__(self, spark: SparkSession, images: DataFrame,
                 block: int = 256):
        self.spark = spark
        self.images = images
        self.block = block
        self._tiles: DataFrame | None = None
        self.stats = StatsCache()

    @property
    def tiles(self) -> DataFrame:
        if self._tiles is None:
            self._tiles = tiling.explode_tiles(self.images, bw=self.block, bh=self.block)
        return self._tiles

    def open(self, image_id: str) -> "RasterDataset":
        """Open by id (reference Open, godal.go:1532-1568). Missing ids
        raise — the error-first contract."""
        row = self.images.filter(F.col("image_id") == image_id).first()
        if row is None:
            raise KeyError(f"dataset {image_id!r} not found")
        return RasterDataset(self, row)


class RasterDataset:
    def __init__(self, catalog: RasterCatalog, row):
        self.catalog = catalog
        self.image_id = row["image_id"]
        self._row = row
        # per-handle mutable attrs (reference: dataset-level metadata KV
        # godal.go:1876-1944; color table godal.go:666-739; GCPs
        # godal.go:4296-4458). In production these are table columns
        # (map<string,string>, array<array<smallint>>, array<struct>);
        # the handle caches them for the godal-style accessor surface.
        self._metadata: dict[str, dict[str, str]] = {"": {}}
        self._color_tables: dict[int, list[tuple[int, int, int, int]]] = {}
        self._gcps: list[tuple[float, float, float, float]] = []
        self._scale_offset: dict[int, tuple[float, float]] = {}
        # explicit mask bands: key = band index, or None for the
        # dataset-level (GMF_PER_DATASET) mask shared by all bands
        self._masks: dict[int | None, "np.ndarray"] = {}
        self._mask_flags: dict[int | None, int] = {}

    # -- metadata KV (godal.go:1876-1944) -----------------------------------
    def set_metadata(self, key: str, value: str, domain: str = "") -> None:
        self._metadata.setdefault(domain, {})[key] = value

    def metadata(self, key: str, domain: str = "") -> str | None:
        return self._metadata.get(domain, {}).get(key)

    def metadata_domains(self) -> list[str]:
        return [d for d, kv in self._metadata.items() if kv]

    # -- color table (godal.go:666-739) --------------------------------------
    def set_color_table(self, band: int, entries: list[tuple[int, int, int, int]]):
        self._color_tables[band] = list(entries)

    def color_table(self, band: int = 0):
        return self._color_tables.get(band, [])

    def expand_palette(self, band: int = 0) -> np.ndarray:
        """Palette-indexed band → RGBA (the palette is a tiny broadcast
        lookup at scale; numpy fancy-index here)."""
        ct = self._color_tables.get(band)
        if not ct:
            raise ValueError("band has no color table")
        lut = np.zeros((256, 4), dtype=np.uint8)
        for i, rgba in enumerate(ct[:256]):
            lut[i] = rgba
        plane = self._decode()
        plane = plane if plane.ndim == 2 else plane[:, :, band]
        return lut[plane]

    # -- GCPs (godal.go:4296-4458) -------------------------------------------
    def set_gcps(self, gcps: list[tuple[float, float, float, float]]):
        self._gcps = list(gcps)

    def gcps(self):
        return list(self._gcps)

    def gcps_to_geotransform(self) -> list[float]:
        """Least-squares affine from the attached GCPs (errors with <3 —
        godal_test.go:5165-5241)."""
        return CRS.fit_gcps(self._gcps)

    # -- band scale/offset (godal.go:216-232; godal_test.go:569-589) -------
    def set_scale_offset(self, band: int, scale: float, offset: float) -> None:
        self._scale_offset[band] = (float(scale), float(offset))

    def clear_scale_offset(self, band: int) -> None:
        """Reset to the identity (Structure reads 1.0 / 0.0 after —
        godal_test.go:587-589)."""
        self._scale_offset.pop(band, None)

    def scale_offset(self, band: int = 0) -> tuple[float, float]:
        return self._scale_offset.get(band, (1.0, 0.0))

    def apply_scale_offset(self, band: int = 0) -> np.ndarray:
        """Physical values: raw * scale + offset (the GDAL unscaling
        convention consumers of Scale/Offset metadata apply)."""
        arr = self._decode()
        plane = arr if arr.ndim == 2 else arr[:, :, band]
        sc, off = self.scale_offset(band)
        return plane.astype(np.float64) * sc + off

    # -- mask bands (godal.go:250-296; flag goldens godal_test.go:
    #    1190-1239, mask-driven polygonize godal_test.go:2218-2238) -------
    GMF_ALL_VALID = 0x1
    GMF_PER_DATASET = 0x2
    GMF_ALPHA = 0x4
    GMF_NODATA = 0x8

    def mask_flags(self, band: int = 0) -> int:
        """GDAL mask-flag resolution: an explicit band mask wins, then
        the dataset-level (PER_DATASET) mask, then a nodata value
        implies GMF_NODATA, else GMF_ALL_VALID (the reference's default
        — godal_test.go:1196 expects 0x01 on a fresh band)."""
        if band in self._mask_flags:
            return self._mask_flags[band]
        if None in self._mask_flags:
            return self._mask_flags[None]
        if self._row["nodata"] is not None:
            return self.GMF_NODATA
        return self.GMF_ALL_VALID

    def mask_band(self, band: int = 0) -> np.ndarray:
        """The 0/255 validity mask for `band` — explicit if created,
        else derived from nodata, else all-valid (uint8, image-sized).
        Distributed ops consume masks through their own arguments
        (polygonize use_nodata_mask / polygonize_array valid=...); this
        is the godal-parity accessor surface."""
        if band in self._masks:
            return self._masks[band]
        if None in self._masks:
            return self._masks[None]
        arr = self._decode()
        plane = arr if arr.ndim == 2 else arr[:, :, band]
        nd = self._row["nodata"]
        if nd is not None:
            return ((plane != nd) * 255).astype(np.uint8)
        return np.full(plane.shape, 255, dtype=np.uint8)

    def create_mask(self, flags: int, band: int = 0) -> np.ndarray:
        """Create an explicit writable mask for one band (reference
        Band.CreateMask — after it, MaskFlags returns exactly `flags`,
        godal_test.go:1226-1233 pins 0x00). Initialized all-valid (255)
        so an unwritten mask changes nothing; the reference goldens
        always write before reading."""
        h, w = self._row["h"], self._row["w"]
        self._masks[band] = np.full((h, w), 255, dtype=np.uint8)
        self._mask_flags[band] = int(flags)
        return self._masks[band]

    def create_mask_band(self, flags: int) -> np.ndarray:
        """Dataset-level shared mask (reference Dataset.CreateMaskBand
        with GMF_PER_DATASET — godal_test.go:1199-1206 pins MaskFlags
        0x02 afterwards)."""
        h, w = self._row["h"], self._row["w"]
        self._masks[None] = np.full((h, w), 255, dtype=np.uint8)
        self._mask_flags[None] = int(flags)
        return self._masks[None]

    def write_mask(self, data: np.ndarray, band: int | None = 0) -> None:
        """Write into a previously-created mask (error-first without
        CreateMask, matching the reference's handle contract)."""
        key = band if band in self._masks else (
            None if None in self._masks else band)
        if key not in self._masks:
            raise ValueError("write_mask: no mask created for this band "
                             "(call create_mask/create_mask_band first)")
        m = self._masks[key]
        if data.shape != m.shape:
            raise ValueError(f"write_mask: shape {data.shape} != {m.shape}")
        m[...] = np.asarray(data, dtype=np.uint8)

    # -- structure (reference structure.go:66-95) --------------------------
    @property
    def structure(self) -> dict:
        return {
            "w": self._row["w"], "h": self._row["h"],
            "block_w": self.catalog.block, "block_h": self.catalog.block,
            "nbands": self._nbands(),
            "dtype": "uint8",
            "scale": self.scale_offset(0)[0],
            "offset": self.scale_offset(0)[1],
        }

    def _nbands(self) -> int:
        arr = self._decode()
        return 1 if arr.ndim == 2 else arr.shape[2]

    def _decode(self) -> np.ndarray:
        return codecs.decode(self._row["bytes"], self._row["fmt"],
                             self._row["w"], self._row["h"])

    def geotransform(self):
        return list(self._row["gt"]) if self._row["gt"] is not None else None

    def bounds(self, dst_srs: str | None = None):
        b = CRS.dataset_bounds(self.geotransform(), self._row["w"], self._row["h"])
        if dst_srs and dst_srs != self._row["srs"]:
            b = CRS.reproject_bounds(b, self._row["srs"], dst_srs)
        return b

    # -- pixel IO (godal.go:1184-1264 layout contracts) ---------------------
    def read(self, x0: int = 0, y0: int = 0, w: int | None = None,
             h: int | None = None, *, out_w: int | None = None,
             out_h: int | None = None, bands: list[int] | None = None,
             interleave: str = "pixel", dtype=None,
             resampling: str = "nearest") -> np.ndarray:
        """Windowed read with optional resample-on-read (Window smaller or
        larger than out size ⇒ resample with alg — godal_test.go:2100-2142),
        band subset, cast, and pixel-/band-interleaved layout."""
        arr = self._decode()
        full_h, full_w = arr.shape[:2]
        w = w if w is not None else full_w
        h = h if h is not None else full_h
        out_w = out_w or w
        out_h = out_h or h
        planes = [arr] if arr.ndim == 2 else [arr[:, :, b] for b in range(arr.shape[2])]
        if bands is not None:
            planes = [planes[b] for b in bands]
        dt = np.dtype(dtype) if dtype is not None else planes[0].dtype
        out_planes = []
        for p in planes:
            if (out_w, out_h) != (w, h):
                out_planes.append(resample(p, out_w, out_h, alg=resampling,
                                           path="io", out_dtype=dt,
                                           window=(x0, y0, w, h)))
            else:
                out_planes.append(p[y0:y0 + h, x0:x0 + w].astype(dt))
        if len(out_planes) == 1:
            return out_planes[0]
        if interleave == "pixel":
            return np.stack(out_planes, axis=2)
        if interleave == "band":
            return np.stack(out_planes, axis=0)
        raise ValueError(f"interleave {interleave!r}")

    # -- engine verbs --------------------------------------------------------
    def _self_df(self) -> DataFrame:
        return self.catalog.images.filter(F.col("image_id") == self.image_id)

    def translate(self, switches=None, creation=None) -> "RasterDataset":
        from godal_spark.operators.translate import translate

        out = translate(self._self_df(), switches, creation)
        row = out.first()
        cat = RasterCatalog(self.catalog.spark, out, block=self.catalog.block)
        return RasterDataset(cat, row)

    def warp(self, switches=None, block: int | None = None) -> DataFrame:
        from godal_spark.operators.warp import warp

        return warp(self.catalog.spark, self._self_df(), switches,
                    block=block or self.catalog.block)

    def build_overviews(self, min_size: int | None = None,
                        alg: str = "average") -> DataFrame:
        my_tiles = self.catalog.tiles.filter(F.col("image_id") == self.image_id)
        ms = min_size if min_size is not None else self.catalog.block
        return tiling.build_overviews(my_tiles, min_size=ms, alg=alg,
                                      block=self.catalog.block)

    def compute_statistics(self, band: int = 0, approximate: bool = False) -> Statistics:
        nodata = self._row["nodata"]
        return compute_statistics_single(
            self.catalog.tiles, self.image_id, band, nodata=nodata,
            approximate=approximate, cache=self.catalog.stats)

    def get_statistics(self, band: int = 0, approximate: bool = False):
        return self.catalog.stats.get(self.image_id, band, approximate)

    def set_statistics(self, mn, mx, mean, std, band: int = 0):
        self.catalog.stats.set(self.image_id, band,
                               Statistics(mn, mx, mean, std, False))

    def clear_statistics(self):
        self.catalog.stats.clear(self.image_id)

    def histogram(self, band: int = 0, **kw):
        return histogram_single(self.catalog.tiles, self.image_id, band, **kw)

    def _apply_kernel(self, fn, band: int = 0, out_dtype=None) -> np.ndarray:
        """Run a whole-image numpy kernel on one band (stencil ops:
        FillNoData/Dem/Viewshed/Sieve/Nearblack gather per image — see
        operators/fill.py scale rationale). Bulk/distributed variants run
        the same kernels inside applyInPandas over the catalog."""
        arr = self._decode()
        plane = arr if arr.ndim == 2 else arr[:, :, band]
        return fn(plane)

    def fill_nodata(self, band: int = 0, max_distance: int = 100,
                    smoothing: int = 0) -> np.ndarray:
        from godal_spark.operators.fill import fillnodata

        nd = self._row["nodata"]
        if nd is None:
            raise ValueError("FillNoData: band has no nodata value")
        return self._apply_kernel(
            lambda a: fillnodata(a, a != nd, max_distance, smoothing), band)

    def dem(self, processing: str = "hillshade", band: int = 0, **kw) -> np.ndarray:
        """All gdaldem processings (godal.go:4099-4127 passes the mode
        string through to gdaldem; same surface here)."""
        from godal_spark.operators import fill as FL

        kernels = {
            "hillshade": FL.dem_hillshade, "slope": FL.dem_slope,
            "aspect": FL.dem_aspect, "tri": FL.dem_tri, "tpi": FL.dem_tpi,
            "roughness": FL.dem_roughness, "color-relief": FL.dem_color_relief,
        }
        fn = kernels.get(processing.lower())
        if fn is None:
            raise ValueError(f"dem processing {processing!r}")
        return self._apply_kernel(lambda a: fn(a, **kw), band)

    def viewshed(self, ox: int, oy: int, oz: float = 0.0, mode: str = "normal",
                 band: int = 0) -> np.ndarray:
        from godal_spark.operators.fill import viewshed

        return self._apply_kernel(lambda a: viewshed(a, ox, oy, oz, mode=mode), band)

    def sieve_filter(self, threshold: int, band: int = 0, eight: bool = False,
                     no_mask: bool = False) -> np.ndarray:
        from godal_spark.operators.polygonize import sieve_array

        nd = self._row["nodata"]
        valid = None
        if nd is not None and not no_mask:
            valid_fn = lambda a: sieve_array(a, threshold, eight=eight, valid=a != nd)  # noqa: E731
        else:
            valid_fn = lambda a: sieve_array(a, threshold, eight=eight)  # noqa: E731
        return self._apply_kernel(valid_fn, band)

    def sieve_filter_tiles(self, threshold: int, band: int = 0,
                           eight: bool = False,
                           no_mask: bool = False) -> DataFrame:
        """Distributed SieveFilter over this dataset's tile rows —
        the scale path (global cross-tile component sizes, no
        whole-raster gather); `sieve_filter` above is the in-memory
        single-array form (godal SieveFilter, godal.go:394-413)."""
        from godal_spark.operators.polygonize import sieve_tiles

        t = self.catalog.tiles.filter(
            (F.col("image_id") == self.image_id) & (F.col("band") == band)
            & (F.col("level") == 0))
        nd = self._row["nodata"]
        return sieve_tiles(t, threshold, eight=eight,
                           use_nodata_mask=nd is not None and not no_mask,
                           nodata=nd)

    def nearblack(self, near: int = 15, white: bool = False, band: int = 0) -> np.ndarray:
        from godal_spark.operators.fill import nearblack

        return self._apply_kernel(lambda a: nearblack(a, near, white), band)

    def polygonize(self, band: int = 0, eight: bool = False) -> DataFrame:
        from godal_spark.operators.polygonize import polygonize

        t = self.catalog.tiles.filter(
            (F.col("image_id") == self.image_id) & (F.col("band") == band))
        nodata = self._row["nodata"]
        return polygonize(t, eight=eight,
                          use_nodata_mask=nodata is not None, nodata=nodata)


def build_vrt(tile_dfs: list[DataFrame]) -> DataFrame:
    """BuildVRT (reference godal.go:3962-3995): a virtual mosaic = union
    of tile DataFrames with source priority — NO data copy, later sources
    win on (band, level, block) collisions via row_number dedup."""
    from functools import reduce

    from pyspark.sql import Window

    tagged = [df.withColumn("__src", F.lit(i)) for i, df in enumerate(tile_dfs)]
    u = reduce(lambda a, b: a.unionByName(b), tagged)
    w = Window.partitionBy("band", "level", "block_x", "block_y") \
        .orderBy(F.col("__src").desc())
    return (u.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn", "__src"))


def execute_sql(spark: SparkSession, sql: str, layers: dict[str, DataFrame] | None = None,
                spatial_filter: bytes | None = None,
                geometry: str = "geometry") -> DataFrame:
    """ExecuteSQL (reference godal.go:3433-3465): register layers as temp
    views, run Spark SQL (the OGRSQL/SQLite dialect superset), then apply
    the optional SpatialFilter as a cell-prefiltered intersects refine."""
    from godal_spark.operators.pip import spatial_filter as sf
    from godal_spark.operators.vector import register_st_functions

    register_st_functions(spark)
    for name, df in (layers or {}).items():
        df.createOrReplaceTempView(name)
    out = spark.sql(sql)
    if spatial_filter is not None:
        out = sf(out, spatial_filter, geometry=geometry)
    return out
