"""RIFF/AVI uncompressed-video decoder — pure stdlib struct + numpy.

The video half of the multimodal layer, same move as functions/wav.py
for audio (round 5): containers carrying UNCOMPRESSED frames decode for
real; every compressed codec (MJPEG is the one exception — it rides the
engine's own JPEG decoder) stays error-first because the environment
has no video codec libraries.

Supported: RIFF 'AVI ' with a 'vids' stream whose BITMAPINFOHEADER is
BI_RGB (0) at 24/32-bit BGR(A) or 8-bit paletted/gray — bottom-up DIB
rows, 4-byte row stride — or MJPG (each '00dc' chunk is a baseline
JPEG, decoded by functions/jpeg.py). Frames come from the 'movi' LIST's
'##db'/'##dc' chunks in stream order.

Reference parity note: godal treats non-raster payloads as opaque
binaries; this module exists for the training-pipeline operators
(operators/multimodal.py frame sampling).
"""

from __future__ import annotations

import struct

import numpy as np


def is_avi(payload: bytes) -> bool:
    return (len(payload) >= 12 and payload[:4] == b"RIFF"
            and payload[8:12] == b"AVI ")


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) for chunks in [start, end);
    descends into LIST chunks via the caller."""
    pos = start
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(payload: bytes, max_frames: int | None = None):
    """→ (frames, meta): frames = list of (h, w) gray or (h, w, 3) RGB
    uint8 arrays; meta = {width, height, n_frames, usec_per_frame,
    codec}. Raises NotImplementedError for compressed streams other
    than MJPG."""
    if not is_avi(payload):
        raise ValueError("decode_avi: not a RIFF/AVI payload")
    end = len(payload)
    width = height = 0
    bitcount = 0
    compression = 0
    usec = 0
    top_down = False
    stream_idx = -1       # index of the current strl being parsed
    video_stream = -1     # index of the 'vids' stream (frames come from it)
    cur_is_video = False
    palette: np.ndarray | None = None
    frames: list[np.ndarray] = []

    def parse_strf(body: bytes):
        nonlocal width, height, bitcount, compression, palette, top_down
        (_, w, h, _, bc, comp) = struct.unpack_from("<IiiHHI", body, 0)
        width, height, bitcount, compression = w, abs(h), bc, comp
        top_down = h < 0  # negative biHeight = rows stored top-first
        if bc == 8 and len(body) >= 40 + 4 * 256:
            pal = np.frombuffer(body[40:40 + 1024], np.uint8).reshape(256, 4)
            palette = pal[:, :3][:, ::-1].copy()  # BGRX -> RGB

    def parse_frame(body: bytes):
        if compression == 0x47504A4D:  # 'MJPG' — ride our JPEG decoder
            from godal_spark.functions.jpeg import decode_jpeg_real

            frames.append(decode_jpeg_real(bytes(body)))
            return
        if compression != 0:
            raise NotImplementedError(
                f"decode_avi: compressed codec 0x{compression:08x} needs "
                "an external library (BI_RGB and MJPG decode for real)")
        stride = (width * bitcount // 8 + 3) & ~3
        rows = np.frombuffer(body[:stride * height], np.uint8) \
            .reshape(height, stride)
        if not top_down:  # bottom-up DIB (positive biHeight): flip
            rows = rows[::-1]
        if bitcount == 24:
            a = rows[:, :width * 3].reshape(height, width, 3)[:, :, ::-1]
            frames.append(a.copy())
        elif bitcount == 32:
            a = rows[:, :width * 4].reshape(height, width, 4)
            frames.append(a[:, :, 2::-1].copy())  # BGRA -> RGB
        elif bitcount == 8:
            idx = rows[:, :width]
            if palette is not None and not np.array_equal(
                    palette, np.repeat(np.arange(256, dtype=np.uint8),
                                       3).reshape(256, 3)):
                frames.append(palette[idx].copy())
            else:
                frames.append(idx.copy())
        else:
            raise NotImplementedError(f"decode_avi: {bitcount}-bit DIB")

    def recurse(start: int, stop: int):
        nonlocal usec, stream_idx, video_stream, cur_is_video
        for cid, bstart, bsize in _walk(payload, start, stop):
            if cid in (b"LIST",):
                recurse(bstart + 4, bstart + bsize)
            elif cid == b"avih":
                usec = struct.unpack_from("<I", payload, bstart)[0]
            elif cid == b"strh":
                # stream headers arrive in stream-number order; ONLY a
                # 'vids' stream's strf carries a BITMAPINFOHEADER (an
                # audio-first AVI previously poisoned width/height)
                stream_idx += 1
                cur_is_video = payload[bstart:bstart + 4] == b"vids"
                if cur_is_video and video_stream < 0:
                    video_stream = stream_idx
            elif cid == b"strf":
                if cur_is_video and width == 0:
                    parse_strf(payload[bstart:bstart + bsize])
            elif len(cid) == 4 and cid[2:4] in (b"db", b"dc") \
                    and cid[:2].isdigit():
                # frames belong to the video stream's 2-digit prefix
                if int(cid[:2]) == max(video_stream, 0) and \
                        (max_frames is None or len(frames) < max_frames):
                    parse_frame(payload[bstart:bstart + bsize])

    recurse(12, end)
    if width == 0:
        raise ValueError("decode_avi: no video stream header (strf)")
    return frames, {"width": width, "height": height,
                    "n_frames": len(frames), "usec_per_frame": usec,
                    "codec": "MJPG" if compression == 0x47504A4D else "DIB"}


def encode_avi(frames, rate: int = 25, codec: str = "DIB") -> bytes:
    """Minimal conforming AVI writer (fixtures + round-trip validation):
    gray (h, w) → 8-bit paletted DIB, RGB (h, w, 3) → 24-bit DIB, or
    codec='MJPG' (each frame JPEG-encoded by functions/jpeg.py)."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    gray = frames[0].ndim == 2
    if codec == "MJPG":
        from godal_spark.functions.jpeg import encode_jpeg

        blobs = [encode_jpeg(f if f.ndim == 3 else
                             np.repeat(f[:, :, None], 3, axis=2))
                 for f in frames]
        bitcount, comp = 24, 0x47504A4D
        pal = b""
    else:
        blobs = []
        bitcount = 8 if gray else 24
        comp = 0
        stride = (w * bitcount // 8 + 3) & ~3
        for f in frames:
            rows = np.zeros((h, stride), np.uint8)
            if gray:
                rows[:, :w] = f[::-1]
            else:
                rows[:, :w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
            blobs.append(rows.tobytes())
        pal = (np.repeat(np.arange(256, dtype=np.uint8), 4)
               .reshape(256, 4).tobytes() if gray else b"")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + \
            (b"\0" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    bih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bitcount, comp,
                      len(blobs[0]), 0, 0, 256 if pal else 0, 0) + pal
    strh = (b"vids" + (b"MJPG" if comp else b"DIB ")
            + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, rate, 0,
                          len(blobs), max(len(b) for b in blobs),
                          0xFFFFFFFF // 2, 0, 0, 0, w, h))
    avih = struct.pack("<IIIIIIIIIIIIII", 1000000 // rate, 0, 0, 0x10,
                       len(blobs), 0, 1, max(len(b) for b in blobs),
                       w, h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", bih)))
    movi = lst(b"movi", b"".join(
        chunk(b"00dc" if comp else b"00db", b) for b in blobs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
