"""Dataset.Translate — gdal_translate work-alike (godal.go:936-965).

CLI-style switches are parsed and validated DRIVER-SIDE before any job
launches, matching the reference's error-first contract (invalid switch
errors before execution — cpp:567-575, golden godal_test.go:1829-1850):

  -outsize W H      absolute px or "N%" (golden: 200% of 20x20 → 40x40)
  -ot TYPE          dtype cast (Byte/UInt16/Int16/.../Float64)
  -b N [...]        band select (1-indexed like the CLI)
  -srcwin x y w h   window crop
  -a_srs SRS        stamp srs (no reprojection)
  -a_nodata V       stamp nodata
  -r ALG            resampling for size changes

Execution is one Arrow-batched mapInPandas over the images table:
decode → window → band-select → resample → cast → re-encode. Block-size
creation options re-parameterize the downstream tile explode (tiling is
a separate stage in this engine, so TILED/BLOCKXSIZE map to
explode_tiles arguments — the golden's block assertions are checked on
the re-tiled output).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from godal_spark.functions import codecs
from godal_spark.functions.resampling import SUPPORTED as RESAMPLING_ALGS

_DTYPES = {
    "byte": np.uint8, "int8": np.int8, "uint16": np.uint16, "int16": np.int16,
    "uint32": np.uint32, "int32": np.int32, "float32": np.float32,
    "float64": np.float64,
}

_KNOWN_CREATION_OPTS = {"TILED", "BLOCKXSIZE", "BLOCKYSIZE", "COMPRESS", "BIGTIFF"}

# -ot target → raw fmt tag so the cast SURVIVES re-encode (round 1
# re-encoded with the source fmt, whose raw8/png coders coerced back to
# uint8 — '-ot UInt16' silently truncated)
_FMT_OF_DTYPE = {
    "byte": "raw8", "int8": "rawi8", "uint16": "raw16", "int16": "rawi16",
    "uint32": "raw32", "int32": "rawi32", "float32": "rawf32",
    "float64": "rawf64",
}


@dataclass
class TranslateConfig:
    outsize: tuple[str, str] | None = None
    dtype: str | None = None
    bands: list[int] = field(default_factory=list)
    srcwin: tuple[int, int, int, int] | None = None
    a_srs: str | None = None
    a_nodata: float | None = None
    resampling: str = "nearest"
    creation: dict[str, str] = field(default_factory=dict)

    @property
    def block_size(self) -> tuple[int, int]:
        return (int(self.creation.get("BLOCKXSIZE", 256)),
                int(self.creation.get("BLOCKYSIZE", 256)))


def parse_translate_switches(switches: list[str] | None,
                             creation: list[str] | None = None) -> TranslateConfig:
    """Error-first switch parsing (reference contract: fail before launch)."""
    cfg = TranslateConfig()
    sw = list(switches or [])
    i = 0
    while i < len(sw):
        s = sw[i]
        if s == "-outsize":
            cfg.outsize = (sw[i + 1], sw[i + 2])
            i += 3
        elif s == "-ot":
            t = sw[i + 1].lower()
            if t not in _DTYPES:
                raise ValueError(f"translate: unknown -ot type {sw[i + 1]!r}")
            cfg.dtype = t
            i += 2
        elif s == "-b":
            cfg.bands.append(int(sw[i + 1]))
            i += 2
        elif s == "-srcwin":
            cfg.srcwin = tuple(int(v) for v in sw[i + 1:i + 5])
            i += 5
        elif s == "-a_srs":
            cfg.a_srs = sw[i + 1]
            i += 2
        elif s == "-a_nodata":
            cfg.a_nodata = float(sw[i + 1])
            i += 2
        elif s == "-r":
            if sw[i + 1].lower() not in RESAMPLING_ALGS:
                raise ValueError(f"translate: unknown -r alg {sw[i + 1]!r}")
            cfg.resampling = sw[i + 1].lower()
            i += 2
        else:
            raise ValueError(f"translate: invalid switch {s!r}")
    for co in creation or []:
        k, _, v = co.partition("=")
        if k.upper() not in _KNOWN_CREATION_OPTS:
            raise ValueError(f"translate: invalid creation option {co!r}")
        cfg.creation[k.upper()] = v
    return cfg


def out_size(w: int, h: int, cfg: TranslateConfig) -> tuple[int, int]:
    if cfg.srcwin:
        w, h = cfg.srcwin[2], cfg.srcwin[3]
    if not cfg.outsize:
        return w, h
    def one(spec: str, cur: int) -> int:
        spec = spec.strip()
        if spec.endswith("%"):
            return int(round(cur * float(spec[:-1]) / 100.0))
        return int(spec)
    return one(cfg.outsize[0], w), one(cfg.outsize[1], h)


def translate(images: DataFrame, switches: list[str] | None = None,
              creation: list[str] | None = None) -> DataFrame:
    """images table → translated images table (same schema).

    gt is rescaled for size changes / shifted for -srcwin; caption,
    image_id, phash carried through untouched (the per-row invariant).
    """
    cfg = parse_translate_switches(switches, creation)  # fail-fast, driver-side

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from godal_spark.functions.resampling import resample

        for pdf in batches:
            out = pdf.copy()
            new_bytes, new_w, new_h, new_gt = [], [], [], []
            new_srs, new_nodata, new_fmt = [], [], []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode(r.bytes, r.fmt, r.w, r.h)
                planes = [arr] if arr.ndim == 2 else [arr[:, :, b] for b in range(arr.shape[2])]
                if cfg.bands:
                    planes = [planes[b - 1] for b in cfg.bands]
                x0 = y0 = 0
                if cfg.srcwin:
                    x0, y0, ww, wh = cfg.srcwin
                    planes = [p[y0:y0 + wh, x0:x0 + ww] for p in planes]
                src_w, src_h = planes[0].shape[1], planes[0].shape[0]
                ow, oh = out_size(r.w, r.h, cfg)
                dt = _DTYPES[cfg.dtype] if cfg.dtype else planes[0].dtype
                if (ow, oh) != (src_w, src_h):
                    planes = [resample(p, ow, oh, alg=cfg.resampling, path="io",
                                       out_dtype=dt) for p in planes]
                else:
                    planes = [p.astype(dt) for p in planes]
                img = planes[0] if len(planes) == 1 else np.stack(planes, axis=2)
                fmt_out = r.fmt
                if cfg.dtype and cfg.dtype != "byte":
                    if r.fmt.lower() in ("png", "jpeg", "jpg", "fjpg"):
                        raise ValueError(
                            f"translate: -ot {cfg.dtype} incompatible with "
                            f"8-bit codec {r.fmt!r}; source must be a raw format")
                    fmt_out = _FMT_OF_DTYPE[cfg.dtype]
                new_fmt.append(fmt_out)
                new_bytes.append(codecs.encode(img, fmt_out))
                new_w.append(ow)
                new_h.append(oh)
                gt = list(r.gt) if r.gt is not None else None
                if gt is not None:
                    gt = [gt[0] + x0 * gt[1], gt[1] * src_w / ow, gt[2],
                          gt[3] + y0 * gt[5], gt[4], gt[5] * src_h / oh]
                new_gt.append(gt)
                new_srs.append(cfg.a_srs if cfg.a_srs else r.srs)
                new_nodata.append(cfg.a_nodata if cfg.a_nodata is not None else r.nodata)
            out["bytes"] = new_bytes
            out["fmt"] = new_fmt
            out["w"] = new_w
            out["h"] = new_h
            out["gt"] = new_gt
            out["srs"] = new_srs
            out["nodata"] = new_nodata
            yield out

    return images.mapInPandas(gen, schema=images.schema)
