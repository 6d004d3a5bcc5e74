"""Pure-numpy baseline JPEG (JFIF) codec.

No imaging library exists in this environment (reference delegates to
GDAL's libjpeg, godal.go:1532-1568 GTiff/JPEG open path), so this module
implements baseline sequential JPEG from the spec:

  encode: level-shift → (RGB→YCbCr, 4:4:4, no subsampling) → 8×8 blocks
  → vectorized type-II DCT (one einsum over all blocks) → quality-scaled
  Annex-K quantization → zigzag → DC-diff/AC run-length → canonical
  Huffman → byte-stuffed entropy stream in a standard JFIF container.

  decode: generic segment parser (DQT/SOF0/DHT/SOS), canonical Huffman
  decode (handles ANY baseline table carried in DHT, not just ours),
  dequant → IDCT → YCbCr→RGB.

Huffman tables: the encoder emits flat canonical tables (all 12 DC
symbols at 4 bits, all 162 AC symbols at 8 bits) — spec-valid (carried
in DHT, counts < 2^length, all-ones code unused) and typo-proof, at a
modest compression cost vs the Annex-K optimized tables. Quantization —
which controls PSNR — uses the real Annex-K base matrices with IJG
quality scaling.

Only baseline DCT, 8-bit, 1 or 3 components, 4:4:4, no restart markers.
Progressive / subsampled / arithmetic streams raise NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

# Annex K.1/K.2 base quantization tables (row-major)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

# zigzag scan order: ZIGZAG[i] = row-major index of the i-th zigzag coeff
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# orthonormal 8-point DCT-II matrix
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    _C[_u] = _a * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16)

# our flat canonical Huffman tables: (bits_per_length[1..16], symbols)
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
_DC_SPEC = ([0, 0, 0, 12] + [0] * 12, _DC_SYMBOLS)          # 12 codes @ 4 bits
_AC_SPEC = ([0] * 7 + [162] + [0] * 8, sorted(_AC_SYMBOLS))  # 162 codes @ 8 bits


def _canonical_codes(bits, symbols):
    """symbol -> (code, length) from the DHT (bits, values) spec."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(*_DC_SPEC)
_AC_ENC = _canonical_codes(*_AC_SPEC)


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K base tables."""
    q = min(100, max(1, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QUANT_LUMA * s + 50) // 100, 1, 255).astype(np.int32)
    chm = np.clip((QUANT_CHROMA * s + 50) // 100, 1, 255).astype(np.int32)
    return lum, chm


# ---------------------------------------------------------------------------
# block helpers
# ---------------------------------------------------------------------------

def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(n_blocks, 8, 8) float64 with edge-replication padding."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    by, bx = hh // 8, ww // 8
    blocks = (plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
              .reshape(by * bx, 8, 8).astype(np.float64))
    return blocks, by, bx


def _from_blocks(blocks: np.ndarray, by: int, bx: int, h: int, w: int) -> np.ndarray:
    full = (blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8))
    return full[:h, :w]


def _fdct_quant(plane: np.ndarray, qtbl: np.ndarray) -> tuple[np.ndarray, int, int]:
    blocks, by, bx = _to_blocks(plane)
    blocks -= 128.0
    coef = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    q = np.round(coef / qtbl[None, :, :]).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG], by, bx  # zigzag-ordered rows


def _dequant_idct(zz: np.ndarray, qtbl: np.ndarray, by: int, bx: int,
                  h: int, w: int) -> np.ndarray:
    coef = np.zeros((zz.shape[0], 64), dtype=np.float64)
    coef[:, ZIGZAG] = zz * qtbl.reshape(-1)[ZIGZAG][None, :]
    coef = coef.reshape(-1, 8, 8)
    blocks = np.einsum("xu,nuv,yv->nxy", _C.T, coef, _C.T)
    out = np.clip(np.round(_from_blocks(blocks, by, bx, h, w) + 128.0), 0, 255)
    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# entropy coding
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s... (see below)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per spec F.1.2.1: negatives use the
    (v + 2^size - 1) representation."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _encode_component(bw: _BitWriter, zz: np.ndarray, pred: int,
                      dc_enc: dict, ac_enc: dict) -> int:
    for row in zz:
        dc = int(row[0])
        size, amp = _magnitude(dc - pred)
        pred = dc
        c, ln = dc_enc[size]
        bw.put(c, ln)
        bw.put(amp, size)
        run = 0
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(row[i])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                c, ln = ac_enc[0xF0]  # ZRL
                bw.put(c, ln)
                run -= 16
            size, amp = _magnitude(v)
            c, ln = ac_enc[(run << 4) | size]
            bw.put(c, ln)
            bw.put(amp, size)
            run = 0
        if last < 63:
            c, ln = ac_enc[0x00]  # EOB
            bw.put(c, ln)
    return pred


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, spec) -> bytes:
    bits, symbols = spec
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """Baseline JFIF encode of uint8 (h, w) grayscale or (h, w, 3) RGB."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("jpeg: only uint8 input")
    if arr.ndim == 2:
        comps = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    else:
        raise NotImplementedError("jpeg: 1 (gray) or 3 (RGB) bands only")
    h, w = arr.shape[:2]
    lum, chm = quant_tables(quality)
    qtbls = [lum] + ([chm] if len(comps) == 3 else [])

    out = bytearray(b"\xFF\xD8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in enumerate(qtbls):
        zz = qt.reshape(-1)[ZIGZAG]
        out += _seg(0xDB, bytes([tid]) + bytes(int(v) for v in zz))
    ncomp = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0, 0, _DC_SPEC))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_SPEC))
    if ncomp == 3:
        out += _seg(0xC4, _dht_payload(0, 1, _DC_SPEC))
        out += _seg(0xC4, _dht_payload(1, 1, _AC_SPEC))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tbl = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tbl << 4) | tbl])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    # non-interleaved would need multiple scans; emit ONE interleaved scan:
    # with 4:4:4 sampling the MCU is one block per component in raster order
    planes = []
    for ci, comp in enumerate(comps):
        qt = qtbls[0] if ci == 0 else qtbls[1]
        zz, by, bx = _fdct_quant(comp, qt)
        planes.append(zz)
    bw = _BitWriter()
    preds = [0] * ncomp
    n_mcu = planes[0].shape[0]
    for m in range(n_mcu):
        for ci in range(ncomp):
            dc_enc, ac_enc = _DC_ENC, _AC_ENC
            preds[ci] = _encode_component(
                bw, planes[ci][m:m + 1], preds[ci], dc_enc, ac_enc)
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """Reads the entropy stream with 0xFF00 unstuffing."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.n += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # marker: stop consuming, pad with zeros
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v


def _build_decode(bits, symbols):
    """(length, code) -> symbol for canonical tables."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_real(buf: bytes) -> np.ndarray:
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    pos = 2
    qt = {}
    huff = {}
    comps = []
    h = w = None
    scan_comps = None
    data_start = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", buf, pos)[0]
        payload = buf[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:
            off = 0
            while off < len(payload):
                pq, tq = payload[off] >> 4, payload[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                zz = np.frombuffer(payload, dtype=np.uint8,
                                   count=64, offset=off + 1).astype(np.int32)
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = zz
                qt[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            for ci in range(nc):
                cid, samp, tq = payload[6 + 3 * ci:9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError("jpeg: only 4:4:4 sampling")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("jpeg: only baseline sequential (SOF0)")
        elif marker == 0xC4:
            off = 0
            while off < len(payload):
                tc, th = payload[off] >> 4, payload[off] & 0xF
                bits = list(payload[off + 1:off + 17])
                n = sum(bits)
                symbols = list(payload[off + 17:off + 17 + n])
                huff[(tc, th)] = _build_decode(bits, symbols)
                off += 17 + n
        elif marker == 0xDD:
            raise NotImplementedError("jpeg: restart intervals unsupported")
        elif marker == 0xDA:
            ns = payload[0]
            scan_comps = []
            for si in range(ns):
                cid, tt = payload[1 + 2 * si:3 + 2 * si]
                scan_comps.append({"id": cid, "dc": tt >> 4, "ac": tt & 0xF})
            data_start = pos
            break
    if data_start is None or h is None:
        raise ValueError("jpeg: missing SOS/SOF")

    br = _BitReader(buf[data_start:])
    by, bx = (h + 7) // 8, (w + 7) // 8
    n_mcu = by * bx
    zz_planes = [np.zeros((n_mcu, 64), dtype=np.int32) for _ in comps]
    preds = [0] * len(comps)
    order = {c["id"]: i for i, c in enumerate(comps)}
    for m in range(n_mcu):
        for sc in scan_comps:
            ci = order[sc["id"]]
            dct = huff[(0, sc["dc"])]
            act = huff[(1, sc["ac"])]
            size = _huff_decode(br, dct)
            diff = _extend(br.read(size), size)
            preds[ci] += diff
            row = zz_planes[ci][m]
            row[0] = preds[ci]
            k = 1
            while k <= 63:
                rs = _huff_decode(br, act)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("jpeg: coefficient overflow")
                row[k] = _extend(br.read(s), s)
                k += 1

    planes = []
    for ci, comp in enumerate(comps):
        planes.append(_dequant_idct(zz_planes[ci], qt[comp["tq"]], by, bx, h, w)
                      .astype(np.float64))
    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
