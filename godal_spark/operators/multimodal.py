"""Multimodal-column operators: opaque binary payloads + typed metadata.

Image payloads are REAL for raw8/png/jpeg (godal_spark.functions.
codecs); audio WAV/PCM decode is REAL since round 5 (functions/wav.py —
stdlib RIFF parser, int 8/16/24/32 + IEEE-float PCM); video and
COMPRESSED audio decode are STUBBED (no codec libraries in this
environment) behind deterministic fakes so the Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and
tested.

  * decode_image_features — decode → (mean/std/shape/phash64) features
  * resize_images         — decode → resample → re-encode (batch)
  * frame_sample_video    — one row per sampled frame; REAL decode for
    RIFF/AVI (uncompressed DIB + MJPG riding the engine's own JPEG
    decoder, functions/avi.py), error-first for compressed containers
    (decoder='fake' opts into the deterministic stub)
  * audio_features        — per-window RMS; REAL decode for WAV,
    error-first for compressed (decoder='fake' opts into the stub)
  * audio_summary         — per-clip rate/duration/RMS/peak/ZCR over
    the real WAV decoder
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from godal_spark.functions import codecs
from godal_spark.functions.resampling import resample


def decode_image_features(images: DataFrame) -> DataFrame:
    """(image_id, w, h, bands, px_mean, px_std, phash64) per image."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "w": [], "h": [], "bands": [],
                   "px_mean": [], "px_std": [], "phash64": []}
            for r in pdf.itertuples(index=False):
                arr = codecs.decode(r.bytes, r.fmt, r.w, r.h)
                plane = arr if arr.ndim == 2 else arr.mean(axis=2)
                # dct-free perceptual hash: 8x8 average-downsample > median
                small = resample(plane.astype(np.float64), 8, 8, alg="average",
                                 path="overview", out_dtype=np.float64)
                bits = (small > np.median(small)).ravel()
                ph = 0
                for i, b in enumerate(bits):
                    if b:
                        ph |= 1 << i
                out["image_id"].append(r.image_id)
                out["w"].append(arr.shape[1])
                out["h"].append(arr.shape[0])
                out["bands"].append(1 if arr.ndim == 2 else arr.shape[2])
                out["px_mean"].append(float(arr.mean()))
                out["px_std"].append(float(arr.std()))
                out["phash64"].append(ph - (1 << 64) if ph >= (1 << 63) else ph)
            yield pd.DataFrame(out)

    return images.mapInPandas(
        gen, schema="image_id string, w int, h int, bands int, "
                    "px_mean double, px_std double, phash64 long")


def resize_images(images: DataFrame, out_w: int, out_h: int,
                  alg: str = "bilinear") -> DataFrame:
    """Batch resize keeping the images schema (bytes/w/h replaced)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            bs, ws, hs = [], [], []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode(r.bytes, r.fmt, r.w, r.h)
                if arr.ndim == 2:
                    res = resample(arr, out_w, out_h, alg=alg, path="io")
                else:
                    res = np.stack([resample(arr[:, :, b], out_w, out_h, alg=alg,
                                             path="io") for b in range(arr.shape[2])], axis=2)
                bs.append(codecs.encode(res, r.fmt))
                ws.append(out_w)
                hs.append(out_h)
            out["bytes"] = bs
            out["w"] = ws
            out["h"] = hs
            yield out

    return images.mapInPandas(gen, schema=images.schema)


def _fake_video_frames(payload: bytes, n_frames: int, w: int = 16, h: int = 16):
    """STUB for a video decoder (NotImplementedError path documented):
    deterministic frames seeded by the payload hash. A real deployment
    replaces only this function with e.g. a PyAV frame iterator."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    for i in range(n_frames):
        yield i, rng.integers(0, 256, (h, w), dtype=np.uint8)


def frame_sample_video(videos: DataFrame, every_n: int = 10,
                       total_frames: int = 100,
                       decoder: str = "auto") -> DataFrame:
    """videos(video_id, bytes, ...) → one row per sampled frame with a
    frame feature vector. RIFF/AVI payloads decode for REAL since
    round 5 (functions/avi.py: uncompressed DIB + MJPG-over-our-JPEG);
    other containers are compressed video and error-first
    (decoder='fake' keeps the deterministic stub for plumbing tests)."""
    from godal_spark.functions import avi as AVI

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "mean": [], "std": []}
            for r in pdf.itertuples(index=False):
                payload = bytes(r.bytes)
                if decoder == "fake":
                    n = total_frames // every_n
                    sampled = ((i * every_n, f) for i, f in
                               _fake_video_frames(payload, n))
                elif AVI.is_avi(payload):
                    frames, _ = AVI.decode_avi(payload,
                                               max_frames=total_frames)
                    sampled = ((i, f) for i, f in enumerate(frames)
                               if i % every_n == 0)
                else:
                    raise NotImplementedError(
                        "video decode: non-AVI container — compressed "
                        "video needs an external codec library (pass "
                        "decoder='fake' for plumbing tests)")
                for idx, frame in sampled:
                    plane = frame if frame.ndim == 2 else frame.mean(axis=2)
                    out["video_id"].append(r.video_id)
                    out["frame_idx"].append(idx)
                    out["mean"].append(float(plane.mean()))
                    out["std"].append(float(plane.std()))
            yield pd.DataFrame(out)

    return videos.mapInPandas(
        gen, schema="video_id string, frame_idx int, mean double, std double")


def _fake_pcm(payload: bytes, n: int = 16000) -> np.ndarray:
    """STUB decoder for COMPRESSED audio only (same contract note as
    _fake_video_frames; WAV/PCM decodes for real — functions/wav.py)."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32)


_FAKE_PCM_RATE = 16000


def _decode_pcm(payload: bytes, decoder: str) -> tuple[np.ndarray, int]:
    """Dispatch → (pcm, sample_rate). RIFF/WAVE decodes for real
    (round 5 — stdlib RIFF parser, int 8/16/24/32 + float PCM); anything
    else is compressed and error-first unless the caller explicitly opts
    into the fake. The single dispatch point for every audio operator."""
    from godal_spark.functions import wav as WAV

    if decoder == "fake":
        return _fake_pcm(payload), _FAKE_PCM_RATE
    if WAV.is_wav(payload):
        return WAV.decode_wav(payload)
    raise NotImplementedError(
        "audio decode: non-WAV payload — compressed audio needs an "
        "external codec library (pass decoder='fake' for plumbing tests)")


def audio_features(audio: DataFrame, frame_len: int = 1024,
                   decoder: str = "auto") -> DataFrame:
    """audio(audio_id, bytes) → per-window RMS rows. WAV/PCM payloads
    decode for REAL (functions/wav.py); compressed audio is error-first
    (decoder='fake' keeps the deterministic stub for plumbing tests)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"audio_id": [], "win": [], "rms": []}
            for r in pdf.itertuples(index=False):
                pcm, _ = _decode_pcm(bytes(r.bytes), decoder)
                nwin = len(pcm) // frame_len
                w = pcm[:nwin * frame_len].reshape(nwin, frame_len)
                rms = np.sqrt((w * w).mean(axis=1))
                for i, v in enumerate(rms):
                    out["audio_id"].append(r.audio_id)
                    out["win"].append(i)
                    out["rms"].append(float(v))
            yield pd.DataFrame(out)

    return audio.mapInPandas(gen, schema="audio_id string, win int, rms double")


def audio_summary(audio: DataFrame, decoder: str = "auto") -> DataFrame:
    """Per-clip audio features over REAL WAV decode: sample rate,
    length, duration, RMS, peak, zero-crossing rate. One Arrow-batched
    stage; clips stay distributed (the 100 TB shape: many small clips
    per partition, features tiny)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"audio_id": [], "sample_rate": [], "n_samples": [],
                   "duration_s": [], "rms": [], "peak": [], "zcr": []}
            for r in pdf.itertuples(index=False):
                pcm, rate = _decode_pcm(bytes(r.bytes), decoder)
                out["audio_id"].append(r.audio_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(pcm))
                out["duration_s"].append(len(pcm) / rate if rate else 0.0)
                out["rms"].append(float(np.sqrt(np.mean(pcm * pcm))) if len(pcm) else 0.0)
                out["peak"].append(float(np.abs(pcm).max()) if len(pcm) else 0.0)
                zc = int(np.count_nonzero(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
                out["zcr"].append(zc / max(len(pcm) - 1, 1))
            yield pd.DataFrame(out)

    return audio.mapInPandas(
        gen, schema="audio_id string, sample_rate int, n_samples long, "
                    "duration_s double, rms double, peak double, zcr double")


def decode_jpeg_distributed(spark, buf: bytes, n_tasks: int = 8) -> np.ndarray:
    """Decode ONE large restart-interval baseline JPEG across workers:
    each task entropy-decodes a contiguous run of restart segments
    (DC predictors reset at every RSTn marker, so segments are
    independent — the reason the engine's encoder emits DRI) and ships
    back MCU pixel tiles; the driver assembles and crops. Bit-identical
    to functions.jpeg.decode_jpeg_real of the same stream (tested).

    This is the single-scene scale path: a 100k x 100k aerial JPEG is
    one entropy stream, but with DRI it splits into thousands of
    independent segments. Here the stream travels by broadcast; on a
    real cluster the same API takes (headers + per-segment byte ranges)
    so workers range-read only their slice from object storage."""
    from godal_spark.functions import jpeg as J

    info = J.jpeg_scan_info(buf)
    ns = info["n_segments"]
    n_tasks = max(1, min(n_tasks, ns))
    bounds = [round(i * ns / n_tasks) for i in range(n_tasks + 1)]
    ranges = [(a, b - a) for a, b in zip(bounds, bounds[1:]) if b > a]
    bc = spark.sparkContext.broadcast(buf)
    df = spark.createDataFrame(ranges, "seg_start int, seg_count int") \
        .repartition(len(ranges))

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from godal_spark.functions import jpeg as JW
        local = bc.value
        for pdf in batches:
            out = {"first_mcu": [], "n": [], "tiles": []}
            for r in pdf.itertuples(index=False):
                fm, tiles = JW.decode_jpeg_segments(
                    local, int(r.seg_start), int(r.seg_count))
                out["first_mcu"].append(fm)
                out["n"].append(tiles.shape[0])
                out["tiles"].append(tiles.tobytes())
            yield pd.DataFrame(out)

    parts_df = df.mapInPandas(
        work, schema="first_mcu long, n int, tiles binary")
    th, tw = 8 * info["vmax"], 8 * info["hmax"]
    nc = info["ncomp"]
    dt = np.uint8 if info["prec"] == 8 else np.uint16
    parts = []
    for r in parts_df.collect():       # bounded: sums to ONE image
        shape = (r.n, th, tw) + ((3,) if nc == 3 else ())
        parts.append((r.first_mcu,
                      np.frombuffer(bytes(r.tiles), dtype=dt)
                      .reshape(shape)))
    return J.assemble_jpeg_segments(info, parts)
