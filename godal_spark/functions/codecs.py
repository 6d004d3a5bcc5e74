"""Pixel codecs for the `bytes`/`fmt` columns of the images table.

The reference delegates decoding to GDAL drivers (reference driver.go:
20-109 registry). No imaging library exists in this environment, so:

  * ``raw8``  — row-major uint8, band-interleaved-by-pixel (the input_hint
    layout); pure numpy reshape. Lossless.
  * ``png``   — real, self-contained PNG codec (functions/png.py):
    depths 1/2/4/8/16, gray / gray+alpha / RGB / RGBA / palette+tRNS,
    all five filters both ways, Adam7 interlace on decode; validated
    against external javax.imageio fixtures. Lossless, so the PSNR
    invariant is exact.
  * ``jpeg``  — real baseline JFIF codec, pure numpy (functions/jpeg.py):
    vectorized DCT, Annex-K quantization with IJG quality scaling,
    canonical Huffman. Lossy; default quality 95 keeps PSNR ≥ 40 dB
    (the BASELINE.json fidelity invariant) with margin. The legacy
    deterministic FJPG container from round 1 still decodes.

Decoded shape convention: (h, w) for 1 band, (h, w, bands) otherwise.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# raw8
# ---------------------------------------------------------------------------

def encode_raw8(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr.astype(np.uint8)).tobytes()


def decode_raw8(buf: bytes, w: int, h: int) -> np.ndarray:
    arr = np.frombuffer(buf, dtype=np.uint8)
    bands = arr.size // (w * h)
    if bands * w * h != arr.size:
        raise ValueError(f"raw8 size {arr.size} not divisible by {w}x{h}")
    if bands == 1:
        return arr.reshape(h, w).copy()
    return arr.reshape(h, w, bands).copy()


# png — full codec in functions/png.py (depths 1-16, palette, Adam7;
# external javax.imageio fixture validation in png_fixtures.py)
# ---------------------------------------------------------------------------

from godal_spark.functions.png import decode_png, encode_png, png_info  # noqa: F401,E402


# ---------------------------------------------------------------------------
# jpeg — real baseline codec in functions/jpeg.py; FJPG kept for the
# round-1 deterministic-lossy container (legacy rows decode unchanged)
# ---------------------------------------------------------------------------

_FJPG = b"FJPG"
JPEG_QUALITY = 95


def encode_fake_jpeg(arr: np.ndarray) -> bytes:
    """Deterministic stand-in for a lossy codec: stores raw8 plus a marker.
    Real JPEG would need a DCT library unavailable here; the Spark-side
    plumbing (binary column, batch decode UDF, PSNR check) is identical."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    bands = 1 if arr.ndim == 2 else arr.shape[2]
    # quantize to simulate loss (deterministic): round to multiples of 4
    lossy = ((arr.astype(np.int32) + 2) // 4 * 4).clip(0, 255).astype(np.uint8)
    return _FJPG + struct.pack("<III", w, h, bands) + lossy.tobytes()


def decode_jpeg(buf: bytes) -> np.ndarray:
    if buf[:4] == _FJPG:
        w, h, bands = struct.unpack_from("<III", buf, 4)
        arr = np.frombuffer(buf, dtype=np.uint8, offset=16)
        return arr.reshape(h, w) if bands == 1 else arr.reshape(h, w, bands)
    if buf[:2] == b"\xFF\xD8":
        from godal_spark.functions.jpeg import decode_jpeg_real

        return decode_jpeg_real(bytes(buf))
    raise ValueError("jpeg: unrecognized payload (neither JFIF nor FJPG)")


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

# raw formats for the full GDAL dtype table (godal.go:41-69): unsigned
# and complex types have no Spark scalar — they travel as binary + this
# fmt tag and decode to native numpy inside Arrow batches (SURVEY §1.1)
_RAW_DTYPES = {
    "raw8": np.uint8, "rawi8": np.int8,
    "raw16": np.uint16, "rawi16": np.int16,
    "raw32": np.uint32, "rawi32": np.int32,
    "rawf32": np.float32, "rawf64": np.float64,
    "rawc64": np.complex64, "rawc128": np.complex128,
}


def decode_raw(buf: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    dt = np.dtype(_RAW_DTYPES[fmt]).newbyteorder("<")
    arr = np.frombuffer(buf, dtype=dt)
    bands = arr.size // (w * h)
    if bands * w * h != arr.size:
        raise ValueError(f"{fmt} size {arr.size} not divisible by {w}x{h}")
    out = arr.reshape(h, w) if bands == 1 else arr.reshape(h, w, bands)
    return out.astype(_RAW_DTYPES[fmt])


def decode(buf: bytes, fmt: str, w: int | None = None, h: int | None = None) -> np.ndarray:
    f = fmt.lower()
    if f in _RAW_DTYPES:
        return decode_raw(buf, f, w, h)
    if f == "png":
        return decode_png(bytes(buf))
    if f in ("jpeg", "jpg", "fjpg"):
        return decode_jpeg(bytes(buf))
    if f in ("tiff", "tif", "gtiff", "cog"):
        from godal_spark.functions.tiff import decode_tiff

        return decode_tiff(bytes(buf))[0]
    raise ValueError(f"unknown fmt {fmt!r}")


def encode(arr: np.ndarray, fmt: str) -> bytes:
    f = fmt.lower()
    if f in _RAW_DTYPES:
        return np.ascontiguousarray(
            arr.astype(np.dtype(_RAW_DTYPES[f]).newbyteorder("<"))).tobytes()
    if f == "png":
        return encode_png(arr)
    if f in ("jpeg", "jpg"):
        from godal_spark.functions.jpeg import encode_jpeg

        return encode_jpeg(arr, quality=JPEG_QUALITY)
    if f == "fjpg":
        return encode_fake_jpeg(arr)
    if f in ("tiff", "tif", "gtiff"):
        from godal_spark.functions.tiff import encode_tiff

        return encode_tiff(arr, compression="deflate")
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    import math
    return 10.0 * math.log10(peak * peak / mse)
