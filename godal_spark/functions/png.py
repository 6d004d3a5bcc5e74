"""Full PNG codec — pure numpy + stdlib zlib.

Round-5 upgrade of the 8-bit-only codec that lived in codecs.py:

  decode:  bit depths 1/2/4/8/16, color types 0 (gray), 2 (RGB),
           3 (palette + PLTE/tRNS), 4 (gray+alpha), 6 (RGBA),
           all five scanline filters, Adam7 interlace, 16-bit
           big-endian samples -> uint16.  Palette images expand to
           RGB (or RGBA when tRNS is present) by default; pass
           ``expand_palette=False`` to get the raw index band plus
           the color table via ``png_info`` (the GDAL PNG driver's
           color-table band shape, reference driver.go:20-109).
  encode:  depths 8 (uint8) and 16 (uint16) gray/gray+alpha/RGB/RGBA;
           palette encode (``palette=``) packs indices at the
           smallest depth in {1,2,4,8}; per-row filter choice
           ``none`` (default, byte-stable with earlier rounds) /
           ``sub`` / ``up`` / ``paeth`` / ``adaptive``
           (min-sum-of-abs heuristic, fully vectorized because
           encode-side filters read ORIGINAL neighbor bytes).

Validated against EXTERNAL javax.imageio PNG fixtures
(functions/png_fixtures.py — an encoder sharing no code with this
module), including Adam7-interlaced ones, plus spec-derived filtered
streams built forward in the tests by an independent scalar filter
implementation.

Performance: filters 0/2 unfilter as whole-row numpy ops and filter 1
as a per-lane cumsum (mod-256 addition commutes with cumsum); only
Average/Paeth rows fall back to a scalar byte walk (unavoidable: each
byte depends on the just-decoded left neighbor).  The engine's own
writes default to filter 0, so its round-trips never touch the scalar
path; bulk ingest of Paeth-heavy external PNGs should transcode at
the edge like LZW TIFFs (see tiff.py performance note).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# (xstart, ystart, xstep, ystep) for the seven Adam7 passes
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


# ---------------------------------------------------------------------------
# unfiltering
# ---------------------------------------------------------------------------

def _unfilter(filters: np.ndarray, data: np.ndarray, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering. data is (nrows, stride) uint8 (filter
    byte already stripped); returns the reconstructed bytes in place."""
    nrows, stride = data.shape
    out = np.zeros((nrows, stride), dtype=np.uint8)
    lanes = stride // bpp if stride % bpp == 0 else 0
    zero_prev = np.zeros(stride, dtype=np.uint8)
    for y in range(nrows):
        f = int(filters[y])
        line = data[y]
        prev = out[y - 1] if y > 0 else zero_prev
        if f == 0:
            out[y] = line
        elif f == 2:  # Up — whole-row vector add
            out[y] = line + prev  # uint8 wraps mod 256
        elif f == 1:  # Sub — per-lane cumsum (addition mod 256 commutes)
            if lanes:
                out[y] = (np.cumsum(line.reshape(lanes, bpp).astype(np.int64),
                                    axis=0) & 0xFF).astype(np.uint8).reshape(stride)
            else:  # sub-byte depths: bpp == 1 always divides; defensive
                out[y] = (np.cumsum(line.astype(np.int64)) & 0xFF).astype(np.uint8)
        elif f == 3:  # Average — sequential in left; scalar byte walk
            ln = line.tolist()
            pv = prev.tolist()
            o = [0] * stride
            for x in range(stride):
                left = o[x - bpp] if x >= bpp else 0
                o[x] = (ln[x] + ((left + pv[x]) >> 1)) & 0xFF
            out[y] = o
        elif f == 4:  # Paeth — sequential in left; scalar byte walk
            ln = line.tolist()
            pv = prev.tolist()
            o = [0] * stride
            for x in range(stride):
                a = o[x - bpp] if x >= bpp else 0
                b = pv[x]
                c = pv[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                o[x] = (ln[x] + pred) & 0xFF
            out[y] = o
        else:
            raise ValueError(f"png: filter type {f}")
    return out


def _unpack_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """(nrows, stride) reconstructed bytes -> (nrows, w*ch) sample array
    (uint8 for depth<=8, uint16 for depth 16). MSB-first bit order."""
    nrows = rows.shape[0]
    if depth == 8:
        return rows[:, :w * ch]
    if depth == 16:
        return rows.reshape(nrows, -1).view(">u2")[:, :w * ch].astype(np.uint16)
    # sub-byte gray / palette indices (ch == 1 per spec for depth < 8)
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    shifts = np.arange(per_byte - 1, -1, -1, dtype=np.uint8) * depth
    expanded = (rows[:, :, None] >> shifts[None, None, :]) & mask
    return expanded.reshape(nrows, -1)[:, :w * ch].astype(np.uint8)


def _decode_subimage(raw: memoryview, w: int, h: int, ch: int,
                     depth: int) -> tuple[np.ndarray, int]:
    """Decode one (sub)image's filtered scanlines. Returns
    ((h, w*ch) samples, bytes consumed)."""
    stride = (w * ch * depth + 7) // 8
    need = h * (stride + 1)
    block = np.frombuffer(raw[:need], dtype=np.uint8).reshape(h, stride + 1)
    bpp = max(1, (ch * depth) // 8)
    rows = _unfilter(block[:, 0], block[:, 1:].copy(), bpp)
    return _unpack_samples(rows, w, ch, depth), need


# ---------------------------------------------------------------------------
# public decode
# ---------------------------------------------------------------------------

def _parse_chunks(buf: bytes):
    if bytes(buf[:8]) != PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    hdr = None
    idat = []
    plte = None
    trns = None
    while off + 8 <= len(buf):
        ln = struct.unpack_from(">I", buf, off)[0]
        tag = bytes(buf[off + 4:off + 8])
        payload = buf[off + 8:off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3).copy()
        elif tag == b"tRNS":
            trns = bytes(payload)
        elif tag == b"IEND":
            break
    if hdr is None:
        raise ValueError("png: missing IHDR")
    return hdr, b"".join(idat), plte, trns


def png_info(buf: bytes) -> dict:
    """Header + color table metadata without decoding pixels."""
    (w, h, depth, ctype, comp, filt, interlace), _, plte, trns = _parse_chunks(buf)
    if comp != 0 or filt != 0:
        raise NotImplementedError("png: nonzero compression/filter method")
    info = {"w": w, "h": h, "depth": depth, "ctype": ctype,
            "interlace": interlace, "bands": _CHANNELS.get(ctype),
            "palette": plte}
    if trns is not None:
        if ctype == 3:
            alpha = np.full(len(plte) if plte is not None else 0, 255, np.uint8)
            a = np.frombuffer(trns, dtype=np.uint8)
            alpha[:a.size] = a
            info["trns"] = alpha
        else:
            # gray / RGB transparency key: 16-bit sample values (nodata)
            info["trns"] = struct.unpack(">" + "H" * (len(trns) // 2), trns)
    else:
        info["trns"] = None
    return info


def decode_png(buf: bytes, expand_palette: bool = True) -> np.ndarray:
    """Decode any PNG this codec understands. Returns uint8 (depth<=8)
    or uint16 (depth 16) array, (h, w) for one band else (h, w, bands).
    Palette images expand to RGB / RGBA (tRNS) unless
    ``expand_palette=False`` (raw index band; palette via png_info)."""
    (w, h, depth, ctype, comp, filt, interlace), idat, plte, trns = _parse_chunks(buf)
    if comp != 0 or filt != 0:
        raise NotImplementedError("png: nonzero compression/filter method")
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"png: color type {ctype}")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"png: bit depth {depth}")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(f"png: depth {depth} invalid for color type {ctype}")
    ch = _CHANNELS[ctype]
    raw = memoryview(zlib.decompress(idat))
    sample_dt = np.uint16 if depth == 16 else np.uint8
    if interlace == 0:
        samples, _ = _decode_subimage(raw, w, h, ch, depth)
        img = samples.reshape(h, w, ch).astype(sample_dt)
    elif interlace == 1:
        img = np.zeros((h, w, ch), dtype=sample_dt)
        pos = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            samples, used = _decode_subimage(raw[pos:], pw, ph, ch, depth)
            pos += used
            img[y0::dy, x0::dx, :] = samples.reshape(ph, pw, ch)
    else:
        raise NotImplementedError(f"png: interlace method {interlace}")

    if ctype == 3 and expand_palette:
        if plte is None:
            raise ValueError("png: palette image without PLTE")
        idx = img[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(plte.shape[0], 255, np.uint8)
            a = np.frombuffer(trns, dtype=np.uint8)
            alpha[:a.size] = a
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if ch == 1:
        return img[:, :, 0]
    return img


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _filter_rows(flat: np.ndarray, bpp: int, mode: str) -> bytes:
    """flat: (h, stride) uint8 sample bytes. Forward filtering reads
    ORIGINAL neighbors, so every candidate row is a whole-array vector op."""
    h, stride = flat.shape
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    left = np.zeros_like(flat)
    left[:, bpp:] = flat[:, :-bpp]
    if mode == "none":
        cands = {0: flat}
    elif mode == "sub":
        cands = {1: flat - left}
    elif mode == "up":
        cands = {2: flat - up}
    elif mode in ("paeth", "adaptive"):
        ul = np.zeros_like(flat)
        ul[1:, bpp:] = flat[:-1, :-bpp]
        a = left.astype(np.int32)
        b = up.astype(np.int32)
        c = ul.astype(np.int32)
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
        paeth = (flat.astype(np.int32) - pred).astype(np.uint8)
        if mode == "paeth":
            cands = {4: paeth}
        else:
            avg = (flat.astype(np.int32)
                   - ((left.astype(np.int32) + up.astype(np.int32)) >> 1)
                   ).astype(np.uint8)
            cands = {0: flat, 1: flat - left, 2: flat - up, 3: avg, 4: paeth}
    else:
        raise ValueError(f"png: filter mode {mode!r}")
    if len(cands) == 1:
        ((ftype, rows),) = cands.items()
        choice = np.full(h, ftype, np.uint8)
        chosen = rows
    else:
        keys = sorted(cands)
        stack = np.stack([cands[k] for k in keys])  # (nf, h, stride)
        # spec-recommended heuristic: minimize sum of |signed byte|
        cost = np.abs(stack.astype(np.int8).astype(np.int32)).sum(axis=2)
        best = cost.argmin(axis=0)
        choice = np.array([keys[i] for i in best], dtype=np.uint8)
        chosen = stack[best, np.arange(h)]
    out = np.empty((h, stride + 1), dtype=np.uint8)
    out[:, 0] = choice
    out[:, 1:] = chosen
    return out.tobytes()


def encode_png(arr: np.ndarray, level: int = 6, *, palette: np.ndarray | None = None,
               filter: str = "none") -> bytes:
    """Encode uint8 (depth 8) or uint16 (depth 16) arrays; (h, w) gray,
    (h, w, {2,3,4}) gray+alpha / RGB / RGBA. With ``palette`` (K<=256
    rows of RGB uint8), arr must be a (h, w) index band; indices pack at
    the smallest depth in {1,2,4,8}."""
    arr = np.asarray(arr)
    if palette is not None:
        palette = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
        if arr.ndim != 2:
            raise ValueError("png: palette encode needs a (h, w) index band")
        k = palette.shape[0]
        if k > 256 or int(arr.max(initial=0)) >= k:
            raise ValueError("png: palette indices out of range")
        depth = 1 if k <= 2 else 2 if k <= 4 else 4 if k <= 16 else 8
        h, w = arr.shape
        idx = arr.astype(np.uint8)
        if depth < 8:
            per_byte = 8 // depth
            stride = (w * depth + 7) // 8
            padded = np.zeros((h, stride * per_byte), dtype=np.uint8)
            padded[:, :w] = idx
            lanes = padded.reshape(h, stride, per_byte)
            shifts = np.arange(per_byte - 1, -1, -1, dtype=np.uint8) * depth
            flat = (lanes << shifts[None, None, :]).sum(axis=2, dtype=np.uint32
                                                        ).astype(np.uint8)
        else:
            flat = idx
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
        body = _filter_rows(flat, 1, filter)
        return (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", palette.tobytes())
                + _chunk(b"IDAT", zlib.compress(body, level)) + _chunk(b"IEND", b""))

    if arr.dtype == np.uint16:
        depth = 16
    else:
        arr = arr.astype(np.uint8)
        depth = 8
    if arr.ndim == 2:
        h, w, bands = arr.shape[0], arr.shape[1], 1
    else:
        h, w, bands = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(bands)
    if ctype is None:
        raise ValueError(f"png: {bands} bands")
    if depth == 16:
        flat = np.ascontiguousarray(arr.astype(">u2")).reshape(h, -1).view(np.uint8)
    else:
        flat = np.ascontiguousarray(arr).reshape(h, -1)
    bpp = bands * (depth // 8)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    body = _filter_rows(flat.copy(), bpp, filter)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(body, level)) + _chunk(b"IEND", b""))
