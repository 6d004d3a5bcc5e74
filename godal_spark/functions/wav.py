"""RIFF/WAVE PCM decoder — pure stdlib struct + numpy (round 5).

The audio half of the multimodal layer no longer needs a codec library:
WAV containers carrying integer PCM (8/16/24/32-bit) or IEEE float
(32/64-bit) decode for real here. Anything compressed (fmt tag other
than 1/3, e.g. MP3-in-WAV, ADPCM, or non-RIFF containers entirely)
stays error-first — that half genuinely requires external codecs.

Parsing is chunk-walking RIFF (not the stdlib `wave` module, which
rejects IEEE-float and extensible-format files): 'fmt ' provides the
format tag / channels / rate / bits, 'data' the frames. WAVE_FORMAT_
EXTENSIBLE (0xFFFE) resolves through its SubFormat GUID.

Reference parity note: godal treats non-raster payloads as opaque
binaries (no audio support in godal itself); this module exists for the
training-pipeline operators (operators/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_INT = 1
_IEEE_FLOAT = 3
_EXTENSIBLE = 0xFFFE


def is_wav(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload to (mono float64 in [-1, 1], rate).

    Multi-channel audio is downmixed by mean. Raises ValueError on a
    malformed container and NotImplementedError on compressed formats.
    """
    if not is_wav(payload):
        raise ValueError("decode_wav: not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("decode_wav: missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("decode_wav: short fmt chunk")
    tag, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == _EXTENSIBLE:
        if len(fmt) < 40:
            raise ValueError("decode_wav: short extensible fmt chunk")
        tag = struct.unpack_from("<H", fmt, 24)[0]  # SubFormat GUID head
    if n_ch == 0 or rate == 0:
        raise ValueError("decode_wav: zero channels or sample rate")
    if tag == _PCM_INT:
        if bits == 8:  # 8-bit WAV PCM is unsigned
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[:len(raw) - len(raw) % 3].reshape(-1, 3)
            v = (raw[:, 0].astype(np.int32)
                 | (raw[:, 1].astype(np.int32) << 8)
                 | (raw[:, 2].astype(np.int32) << 16))
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"decode_wav: {bits}-bit integer PCM")
    elif tag == _IEEE_FLOAT:
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"decode_wav: {bits}-bit float PCM")
    else:
        raise NotImplementedError(
            f"decode_wav: compressed format tag {tag} requires an external "
            "codec library (error-first; see module header)")
    if n_ch > 1:
        x = x[:len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, int(rate)


def encode_wav(pcm: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Encode mono float [-1, 1] to a 16-bit PCM WAV (test fixtures +
    round-trip validation; only 16-bit int output)."""
    if bits != 16:
        raise NotImplementedError("encode_wav: 16-bit PCM only")
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    data = (x * 32767.0).round().astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", _PCM_INT, 1, rate, rate * 2, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
