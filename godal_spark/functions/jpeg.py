"""Pure-numpy baseline JPEG (JFIF) codec.

No imaging library exists in this environment (reference delegates to
GDAL's libjpeg, godal.go:1532-1568 GTiff/JPEG open path), so this module
implements baseline sequential JPEG from the spec:

  encode: level-shift → RGB→YCbCr → optional 4:2:0 chroma subsampling
  (2x2 box filter) → 8×8 blocks → vectorized type-II DCT (one einsum
  over all blocks) → quality-scaled Annex-K quantization → zigzag →
  DC-diff/AC run-length → canonical Huffman → byte-stuffed entropy
  stream in a standard JFIF container; optional restart intervals
  (DRI + RSTn every Ri MCUs).

  decode: generic segment parser (DQT/SOF0/DHT/SOS/DRI), canonical
  Huffman decode via a 16-bit prefix LUT (handles ANY baseline table
  carried in DHT, not just ours), ARBITRARY sampling factors hi x vi
  (4:4:4, 4:2:0, 4:2:2, 4:4:0, ...) with interleaved MCU order, restart
  markers (byte-align + DC predictor reset), dequant → IDCT → nearest
  chroma upsample → YCbCr→RGB.

Huffman tables: the encoder emits flat canonical tables (all 12 DC
symbols at 4 bits, all 162 AC symbols at 8 bits; the wider 16/240
alphabets for 12-bit precision) — spec-valid (carried
in DHT, counts < 2^length, all-ones code unused) and typo-proof, at a
modest compression cost vs the Annex-K optimized tables. Quantization —
which controls PSNR — uses the real Annex-K base matrices with IJG
quality scaling.

Encoder emits baseline DCT (SOF0), 8-bit, 1 or 3 components — or
extended sequential (SOF1) at 12-bit sample precision (uint16 < 4096,
level shift 2048 — the aerial-imagery tier). The DECODER additionally
handles progressive DCT (SOF2: spectral selection + successive
approximation, interleaved DC scans + per-component AC scans), 12-bit
SOF1 with 8- or 16-bit DQT entries, and any spec-legal
sampling-factor combination via index-mapped nearest upsample.
Arithmetic-coded / lossless streams raise NotImplementedError
(error-first, reference errs.go pattern).
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

# our flat canonical Huffman tables: (bits_per_length[1..16], symbols).
# AC includes EOB0 (0x00), ZRL (0xF0), the EOBn run codes 0x10..0xE0
# (progressive EOBRUN), and all (run, size) pairs: 176 codes @ 8 bits —
# spec-valid (< 255, all-ones code unused).
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = ([0x00, 0xF0] + [r << 4 for r in range(1, 15)]
               + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_DC_SPEC = ([0, 0, 0, 12] + [0] * 12, _DC_SYMBOLS)          # 12 codes @ 4 bits
_AC_SPEC = ([0] * 7 + [176] + [0] * 8, sorted(_AC_SYMBOLS))  # 176 codes @ 8 bits

# 12-bit sample precision (T.81 tables B.5/F.1): DC categories reach
# 15 and AC magnitude sizes reach 14 — wider flat canonical tables,
# same construction (16 DC codes @ 5 bits, 240 AC codes @ 8 bits,
# all-ones unused in both).
_DC12_SYMBOLS = list(range(16))
_AC12_SYMBOLS = ([0x00, 0xF0] + [r << 4 for r in range(1, 15)]
                 + [(r << 4) | s for r in range(16) for s in range(1, 15)])
_DC12_SPEC = ([0, 0, 0, 0, 16] + [0] * 11, _DC12_SYMBOLS)
_AC12_SPEC = ([0] * 7 + [240] + [0] * 8, sorted(_AC12_SYMBOLS))

_SAMPLING = {"444": [(1, 1), (1, 1), (1, 1)],
             "420": [(2, 2), (1, 1), (1, 1)],
             "422": [(2, 1), (1, 1), (1, 1)],
             "440": [(1, 2), (1, 1), (1, 1)]}


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
_DC12_ENC = _canonical_codes(*_DC12_SPEC)
_AC12_ENC = _canonical_codes(*_AC12_SPEC)


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


def _fdct_quant(plane: np.ndarray, qtbl: np.ndarray,
                shift: float = 128.0) -> tuple[np.ndarray, int, int]:
    blocks, by, bx = _to_blocks(plane)
    blocks -= shift
    # C @ block @ C.T as two broadcasted matmuls (BLAS) — ~5x faster
    # than the equivalent einsum contraction on small batch sizes
    coef = (_C @ blocks) @ _C.T
    q = np.round(coef / qtbl[None, :, :]).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG], by, bx  # zigzag-ordered rows


def _dequant_idct(zz: np.ndarray, qtbl: np.ndarray, by: int, bx: int,
                  h: int, w: int, prec: int = 8) -> np.ndarray:
    coef = np.zeros((zz.shape[0], 64), dtype=np.float64)
    coef[:, ZIGZAG] = zz * qtbl.reshape(-1)[ZIGZAG][None, :]
    # DC-only fast path: flat blocks (most of any smooth/overview image)
    # are a constant DC/8 — skip their IDCT entirely
    ac_any = (coef[:, 1:] != 0).any(axis=1)
    blocks = np.empty((zz.shape[0], 8, 8), dtype=np.float64)
    if not ac_any.all():
        blocks[~ac_any] = (coef[~ac_any, 0] * 0.125)[:, None, None]
    if ac_any.any():
        sub = coef[ac_any].reshape(-1, 8, 8)
        blocks[ac_any] = (_C.T @ sub) @ _C
    half, maxv = float(1 << (prec - 1)), (1 << prec) - 1
    out = np.clip(np.round(_from_blocks(blocks, by, bx, h, w) + half),
                  0, maxv)
    return out.astype(np.uint8 if prec == 8 else np.uint16)


def _box_downsample(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """fy x fx box-filter decimation with edge padding (the encoder's
    chroma subsampler)."""
    if fx == 1 and fy == 1:
        return plane
    h, w = plane.shape
    plane = np.pad(plane, ((0, -h % fy), (0, -w % fx)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))


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
            self.put(0x7F, 8 - self.n)  # 1-bit padding to the byte boundary

    def marker(self, m: int):
        """Byte-align and emit a bare marker (RSTn) — NOT stuffed."""
        self.flush()
        self.buf.append(0xFF)
        self.buf.append(m)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per spec F.1.2.1: negatives use the
    (v + 2^size - 1) representation."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _encode_block(bw: _BitWriter, row: np.ndarray, pred: int,
                  dc_enc: dict, ac_enc: dict) -> int:
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


_POW2 = (1 << np.arange(17)).astype(np.int64)


def _enc_arrays(enc: dict, n: int) -> tuple[np.ndarray, np.ndarray]:
    codes = np.zeros(n, dtype=np.int64)
    lens = np.zeros(n, dtype=np.int64)
    for sym, (c, ln) in enc.items():
        codes[sym] = c
        lens[sym] = ln
    return codes, lens


def _pack_fields(codes: np.ndarray, lens: np.ndarray) -> bytes:
    """Shared scan-byte packer: variable-width MSB-first fields (already
    in stream order) -> bit array (1-padded to the byte boundary, the
    scalar flush) -> bytes with 0xFF00 stuffing as one np.insert."""
    offsets = np.cumsum(lens) - lens
    total = int(offsets[-1] + lens[-1]) if lens.size else 0
    rep = np.repeat(np.arange(lens.size), lens)
    j = np.arange(total, dtype=np.int64) - offsets[rep]
    bits = ((codes[rep] >> (lens[rep] - 1 - j)) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, np.uint8)])  # flush 1s
    body = np.packbits(bits)
    stuff = np.nonzero(body == 0xFF)[0]
    if stuff.size:
        body = np.insert(body, stuff + 1, 0)
    return body.tobytes()


def _encode_scan_vec(planes, samp, nbx, mcux, mcuy,
                     dc_enc: dict, ac_enc: dict, ri: int = 0) -> bytes:
    """Vectorized baseline/extended-sequential scan entropy coder,
    byte-identical to the _encode_block loop it replaces (differential-
    tested, restart intervals included): builds one flat field table —
    (code, bit-length) per DC code/amp, ZRL, AC code/amp, EOB — with
    (block-slot, coeff, sub) sort keys, lexsorts it into scan order,
    and packs bits via repeat/cumsum + np.packbits; 0xFF stuffing is
    one np.insert. The per-block Python walk (put() per symbol) was
    ~90% of encode wall (round-5c profile).

    ri > 0 (DRI restart interval, in MCUs): DC prediction chains reset
    at every segment start, each segment is independently 1-padded to
    its byte boundary, and RST(0..7 cycling) markers — raw, never
    stuffed — separate consecutive segments. At engine scale restart
    segments are what make one scan splittable across workers, so this
    path must be as fast as the plain one."""
    ncomp = len(planes)
    bper = [samp[ci][0] * samp[ci][1] for ci in range(ncomp)]
    B = sum(bper)
    offs = np.cumsum([0] + bper)
    dc_codes, dc_lens = _enc_arrays(dc_enc, 16)
    ac_codes, ac_lens = _enc_arrays(ac_enc, 256)

    f_code, f_len, f_slot, f_pos, f_sub = [], [], [], [], []

    def emit(code, ln, slot, pos, sub):
        f_code.append(code.astype(np.int64))
        f_len.append(ln.astype(np.int64))
        f_slot.append(slot.astype(np.int64))
        f_pos.append(pos.astype(np.int64))
        f_sub.append(sub.astype(np.int64))

    M = mcuy * mcux
    mygrid = np.repeat(np.arange(mcuy, dtype=np.int64), mcux)
    mxgrid = np.tile(np.arange(mcux, dtype=np.int64), mcuy)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        rows = mygrid[:, None] * vi + np.repeat(np.arange(vi), hi)[None, :]
        cols = mxgrid[:, None] * hi + np.tile(np.arange(hi), vi)[None, :]
        order = (rows * nbx[ci] + cols).ravel()
        Zo = np.asarray(planes[ci], dtype=np.int64)[order]
        nblk = Zo.shape[0]
        slot = (np.arange(nblk) // bper[ci]) * B + offs[ci] \
            + np.arange(nblk) % bper[ci]

        # DC: prediction chain in MCU order (resets at restart segments)
        dc = Zo[:, 0]
        diff = np.empty_like(dc)
        diff[0] = dc[0]
        diff[1:] = dc[1:] - dc[:-1]
        if ri:
            segb = (np.arange(nblk) // bper[ci]) // ri
            resets = np.nonzero(np.r_[False, segb[1:] != segb[:-1]])[0]
            diff[resets] = dc[resets]
        size = np.searchsorted(_POW2, np.abs(diff), side="right")
        amp = np.where(diff < 0, diff + (1 << size) - 1, diff)
        z = np.zeros(nblk, dtype=np.int64)
        emit(dc_codes[size], dc_lens[size], slot, z, z)
        emit(amp, size, slot, z, z + 1)

        # AC: nonzero runs
        A = Zo[:, 1:]
        bid, pos = np.nonzero(A != 0)
        if bid.size:
            firstnz = np.ones(bid.size, dtype=bool)
            firstnz[1:] = bid[1:] != bid[:-1]
            prevpos = np.empty_like(pos)
            prevpos[1:] = pos[:-1]
            prevpos[firstnz] = -1
            run = pos - prevpos - 1
            nzrl = run >> 4
            vals = A[bid, pos]
            vsize = np.searchsorted(_POW2, np.abs(vals), side="right")
            vamp = np.where(vals < 0, vals + (1 << vsize) - 1, vals)
            sym = ((run & 15) << 4) | vsize
            cslot = slot[bid]
            cpos = pos + 1  # coeff index 1..63; DC owns pos 0
            # ZRL fields (sub 0..nzrl-1 before the coeff's own fields)
            tot = int(nzrl.sum())
            if tot:
                rep = np.repeat(np.arange(nzrl.size), nzrl)
                base = np.cumsum(nzrl) - nzrl
                k = np.arange(tot, dtype=np.int64) - base[rep]
                emit(np.full(tot, ac_codes[0xF0]),
                     np.full(tot, ac_lens[0xF0]),
                     cslot[rep], cpos[rep], k)
            emit(ac_codes[sym], ac_lens[sym], cslot, cpos,
                 np.full(cslot.size, 16, dtype=np.int64))
            emit(vamp, vsize, cslot, cpos,
                 np.full(cslot.size, 17, dtype=np.int64))
            # EOB where the block's last nonzero coeff index < 63
            lastnz = np.zeros(nblk, dtype=np.int64)
            lastnz[bid] = cpos  # ascending pos per block: last write wins
            needs_eob = lastnz < 63
        else:
            needs_eob = np.ones(nblk, dtype=bool)
        eb = np.nonzero(needs_eob)[0]
        emit(np.full(eb.size, ac_codes[0x00]),
             np.full(eb.size, ac_lens[0x00]),
             slot[eb], np.full(eb.size, 64, dtype=np.int64),
             np.zeros(eb.size, dtype=np.int64))

    codes = np.concatenate(f_code)
    lens = np.concatenate(f_len)
    slots = np.concatenate(f_slot)
    o = np.lexsort((np.concatenate(f_sub), np.concatenate(f_pos), slots))
    codes, lens, slots = codes[o], lens[o], slots[o]

    if not ri:
        return _pack_fields(codes, lens)

    # Restart path: same flat field table, but every ri-MCU segment is
    # bit-packed against its own byte-aligned base (pad bits are 1s,
    # exactly the scalar flush), then stuffed globally and stitched
    # with RSTn markers at the post-stuff segment boundaries.
    seg_f = (slots // B) // ri                       # nondecreasing
    starts = np.nonzero(np.r_[True, seg_f[1:] != seg_f[:-1]])[0]
    bitsum = np.add.reduceat(lens, starts)           # bits per segment
    seg_sizes = bitsum + ((-bitsum) % 8)             # padded to bytes
    seg_base = np.cumsum(seg_sizes) - seg_sizes      # start bit per seg
    gcs = np.cumsum(lens) - lens
    segidx = np.cumsum(np.r_[0, (seg_f[1:] != seg_f[:-1]).astype(np.int64)])
    off = seg_base[segidx] + (gcs - gcs[starts][segidx])
    total = int(seg_sizes.sum())
    bits = np.ones(total, np.uint8)                  # pad bits = 1s
    rep = np.repeat(np.arange(lens.size), lens)
    j = np.arange(int(lens.sum()), dtype=np.int64) - gcs[rep]
    bits[off[rep] + j] = (codes[rep] >> (lens[rep] - 1 - j)) & 1
    body = np.packbits(bits)
    stuff = np.nonzero(body == 0xFF)[0]
    if stuff.size:
        body = np.insert(body, stuff + 1, 0)
    nseg = starts.size
    if nseg == 1:
        return body.tobytes()
    ends = (seg_base + seg_sizes) // 8               # pre-stuff byte ends
    ends = ends + np.searchsorted(stuff, ends)       # shift past 0x00s
    parts = np.split(body, ends[:-1])
    out = bytearray()
    for k in range(nseg - 1):
        out += parts[k].tobytes()
        out += bytes((0xFF, 0xD0 + (k & 7)))
    out += parts[-1].tobytes()
    return bytes(out)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, spec) -> bytes:
    bits, symbols = spec
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)


def encode_jpeg(arr: np.ndarray, quality: int = 90, *,
                subsampling: str = "444", restart_interval: int = 0,
                progressive: bool = False, precision: int = 8) -> bytes:
    """JFIF encode of uint8 (h, w) grayscale or (h, w, 3) RGB.
    precision=12 encodes extended sequential 12-bit DCT (T.81 sample
    precision 12: uint16 input < 4096, level shift 2048, the wider
    DC-category-15 / AC-size-14 Huffman alphabets) — the aerial /
    satellite-imagery tier; combines with progressive=True (SOF2
    at 12-bit precision, T.81 Table B.2) using the same wider alphabets.

    subsampling: "444" (default), "420" (2x2 chroma decimation — what
    virtually all real-world encoders emit), "422", "440"; ignored for
    grayscale. restart_interval: emit DRI + an RSTn marker every Ri MCUs
    (DC predictors reset — makes long scans seekable/error-resilient,
    and at engine scale lets a decoder split one scan across workers).
    progressive: SOF2 multi-scan stream (spectral selection + 1-bit
    successive approximation: DC first/refine interleaved, per-component
    AC bands 1-5 / 6-63 first then refined) — the web's second-most
    common JPEG shape after baseline 4:2:0. Quantized coefficients are
    IDENTICAL to the baseline encode, so a correct decoder returns
    bit-identical pixels for both. restart_interval is ignored for
    progressive scans.
    """
    arr = np.asarray(arr)
    if precision == 8:
        if arr.dtype != np.uint8:
            raise ValueError("jpeg: only uint8 input at precision 8")
    elif precision == 12:
        if arr.dtype != np.uint16:
            raise ValueError("jpeg: 12-bit input must be uint16 (< 4096)")
        if arr.size and int(arr.max()) > 4095:
            raise ValueError("jpeg: 12-bit sample out of range (>= 4096)")
    else:
        raise NotImplementedError(f"jpeg: precision {precision} "
                                  "(8 and 12 supported)")
    half = float(1 << (precision - 1))
    if arr.ndim == 2:
        comps = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + half
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + half
        comps = [y, cb, cr]
    else:
        raise NotImplementedError("jpeg: 1 (gray) or 3 (RGB) bands only")
    h, w = arr.shape[:2]
    ncomp = len(comps)
    if ncomp == 1:
        samp = [(1, 1)]
    else:
        if subsampling not in _SAMPLING:
            raise NotImplementedError(f"jpeg: subsampling {subsampling!r} "
                                      "(supported: 444/420/422/440)")
        samp = _SAMPLING[subsampling]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    ri = int(restart_interval)

    lum, chm = quant_tables(quality)
    qtbls = [lum] + ([chm] if ncomp == 3 else [])

    out = bytearray(b"\xFF\xD8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in enumerate(qtbls):
        zz = qt.reshape(-1)[ZIGZAG]
        out += _seg(0xDB, bytes([tid]) + bytes(int(v) for v in zz))
    dc_spec, ac_spec = ((_DC12_SPEC, _AC12_SPEC) if precision == 12
                        else (_DC_SPEC, _AC_SPEC))
    dc_enc, ac_enc = ((_DC12_ENC, _AC12_ENC) if precision == 12
                      else (_DC_ENC, _AC_ENC))
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    # 12-bit sequential is SOF1 (extended); 8-bit stays SOF0/SOF2
    sof_marker = 0xC2 if progressive else (0xC1 if precision == 12
                                           else 0xC0)
    out += _seg(sof_marker, sof)
    out += _seg(0xC4, _dht_payload(0, 0, dc_spec))
    out += _seg(0xC4, _dht_payload(1, 0, ac_spec))
    if ncomp == 3:
        out += _seg(0xC4, _dht_payload(0, 1, dc_spec))
        out += _seg(0xC4, _dht_payload(1, 1, ac_spec))
    if ri and not progressive:
        out += _seg(0xDD, struct.pack(">H", ri))

    # quantized zigzag coefficient planes, MCU-aligned grids
    planes = []
    nbx = []
    for ci, comp in enumerate(comps):
        hi, vi = samp[ci]
        plane = _box_downsample(comp, hmax // hi, vmax // vi)
        # pad the component to its exact MCU-aligned block grid
        th, tw = mcuy * vi * 8, mcux * hi * 8
        plane = np.pad(plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
                       mode="edge")
        qt = qtbls[0] if ci == 0 else qtbls[1]
        zz, _, bx = _fdct_quant(plane, qt, shift=half)
        planes.append(zz)
        nbx.append(bx)

    if progressive:
        _emit_progressive_scans(out, planes, samp, nbx, mcux, mcuy,
                                h, w, hmax, vmax, dc_enc, ac_enc)
        out += b"\xFF\xD9"
        return bytes(out)

    sos = bytes([ncomp])
    for ci in range(ncomp):
        tbl = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tbl << 4) | tbl])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    # one interleaved scan; MCU = hi x vi blocks per component. Both
    # the plain and the restart-interval stream take the vectorized
    # coder (byte-identical to the scalar walk — differential-tested
    # against _encode_scan_scalar).
    out += _encode_scan_vec(planes, samp, nbx, mcux, mcuy,
                            dc_enc, ac_enc, ri=ri)
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def _encode_scan_scalar(planes, samp, nbx, mcux, mcuy,
                        dc_enc: dict, ac_enc: dict, ri: int = 0) -> bytes:
    """Reference per-block scalar scan coder (the pre-vectorization
    walk) — retained ONLY as the differential-test oracle for
    _encode_scan_vec; no production path calls it."""
    ncomp = len(planes)
    bw = _BitWriter()
    preds = [0] * ncomp
    rst_n = 0
    for m in range(mcuy * mcux):
        if ri and m and m % ri == 0:
            bw.marker(0xD0 + rst_n)
            rst_n = (rst_n + 1) & 7
            preds = [0] * ncomp
        mx, my = m % mcux, m // mcux
        for ci in range(ncomp):
            hi, vi = samp[ci]
            for v in range(vi):
                for hh in range(hi):
                    idx = (my * vi + v) * nbx[ci] + (mx * hi + hh)
                    preds[ci] = _encode_block(
                        bw, planes[ci][idx], preds[ci], dc_enc, ac_enc)
    bw.flush()
    return bytes(bw.buf)


def _sos_header(scomps: list[tuple[int, int, int]], ss: int, se: int,
                ah: int, al: int) -> bytes:
    """SOS payload: [(comp_id, dc_tbl, ac_tbl)], spectral band, approx."""
    p = bytes([len(scomps)])
    for cid, dc, ac in scomps:
        p += bytes([cid, (dc << 4) | ac])
    return p + bytes([ss, se, (ah << 4) | al])


def _emit_progressive_scans_scalar(out: bytearray, planes, samp, nbx,
                                   mcux, mcuy, h, w, hmax, vmax,
                                   dc_enc=None, ac_enc=None) -> None:
    """Reference per-block progressive emitter (the pre-vectorization
    walk) — retained ONLY as the differential-test oracle for
    _emit_progressive_scans; no production path calls it."""
    dc_enc = dc_enc or _DC_ENC
    ac_enc = ac_enc or _AC_ENC
    ncomp = len(planes)

    def comp_blocks(ci):
        """(indices, in component raster order) for non-interleaved scans:
        the component's OWN grid, not the MCU-padded one."""
        hi, vi = samp[ci]
        cbx = ((w * hi + hmax - 1) // hmax + 7) // 8
        cby = ((h * vi + vmax - 1) // vmax + 7) // 8
        return [by * nbx[ci] + bx for by in range(cby) for bx in range(cbx)]

    # ---- scan 1: DC first, interleaved, Al=1
    out += _seg(0xDA, _sos_header(
        [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)], 0, 0, 0, 1))
    bw = _BitWriter()
    preds = [0] * ncomp
    for m in range(mcuy * mcux):
        mx, my = m % mcux, m // mcux
        for ci in range(ncomp):
            hi, vi = samp[ci]
            for v in range(vi):
                for hh in range(hi):
                    idx = (my * vi + v) * nbx[ci] + (mx * hi + hh)
                    val = int(planes[ci][idx][0]) >> 1  # arithmetic, Al=1
                    size, amp = _magnitude(val - preds[ci])
                    preds[ci] = val
                    c, ln = dc_enc[size]
                    bw.put(c, ln)
                    bw.put(amp, size)
    bw.flush()
    out += bw.buf

    # ---- AC first scans: per component, bands (1-5) and (6-63), Al=1
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            out += _seg(0xDA, _sos_header(
                [(ci + 1, 0, 0 if ci == 0 else 1)], ss, se, 0, 1))
            bw = _BitWriter()
            _enc_ac_first(bw, planes[ci], comp_blocks(ci), ss, se, 1,
                          ac_enc)
            bw.flush()
            out += bw.buf

    # ---- DC refinement: interleaved, Ah=1 Al=0 (raw bits, no huffman)
    out += _seg(0xDA, _sos_header(
        [(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 1, 0))
    bw = _BitWriter()
    for m in range(mcuy * mcux):
        mx, my = m % mcux, m // mcux
        for ci in range(ncomp):
            hi, vi = samp[ci]
            for v in range(vi):
                for hh in range(hi):
                    idx = (my * vi + v) * nbx[ci] + (mx * hi + hh)
                    bw.put(int(planes[ci][idx][0]) & 1, 1)
    bw.flush()
    out += bw.buf

    # ---- AC refinement scans: per component, same bands, Ah=1 Al=0
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            out += _seg(0xDA, _sos_header(
                [(ci + 1, 0, 0 if ci == 0 else 1)], ss, se, 1, 0))
            bw = _BitWriter()
            _enc_ac_refine(bw, planes[ci], comp_blocks(ci), ss, se, 0,
                           ac_enc)
            bw.flush()
            out += bw.buf


def _enc_ac_first(bw: _BitWriter, plane, idxs, ss: int, se: int, al: int,
                  ac_enc: dict) -> None:
    """Progressive AC first pass (T.81 G.1.2.2): run-length over the
    point-transformed band with EOBRUN accumulation."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            c, ln = ac_enc[r << 4]
            bw.put(c, ln)
            bw.put(eobrun - (1 << r), r)
            eobrun = 0

    for idx in idxs:
        row = plane[idx]
        band = row[ss:se + 1].astype(np.int64)
        shifted = np.sign(band) * (np.abs(band) >> al)  # toward zero
        nz = np.flatnonzero(shifted)
        if len(nz) == 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        last = nz[-1]
        for i in range(last + 1):
            v = int(shifted[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_enc[0xF0]  # ZRL
                bw.put(c, ln)
                run -= 16
            size, amp = _magnitude(v)
            c, ln = ac_enc[(run << 4) | size]
            bw.put(c, ln)
            bw.put(amp, size)
            run = 0
        if last < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:  # cap check was missing on this path:
                flush_eob()       # a 32768th increment would overflow
                                  # the 14-bit EOBRUN alphabet (r=15
                                  # collides with ZRL) — invalid stream
    flush_eob()


def _enc_ac_refine(bw: _BitWriter, plane, idxs, ss: int, se: int, al: int,
                   ac_enc: dict) -> None:
    """Progressive AC refinement (T.81 G.1.2.3): newly-nonzero coeffs as
    (run,1)+sign, correction bits for already-nonzero coeffs, EOBRUN with
    buffered correction bits."""
    eobrun = 0
    pending: list[int] = []

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            c, ln = ac_enc[r << 4]
            bw.put(c, ln)
            bw.put(eobrun - (1 << r), r)
            eobrun = 0
        for b in pending:
            bw.put(b, 1)
        pending = []

    for idx in idxs:
        row = plane[idx]
        band = row[ss:se + 1].astype(np.int64)
        absv = np.abs(band) >> al
        newly = np.flatnonzero(absv == 1)
        eob_i = int(newly[-1]) if len(newly) else -1  # last newly-nonzero
        run = 0
        br: list[int] = []
        for i in range(se - ss + 1):
            t = int(absv[i])
            if t == 0:
                run += 1
                continue
            # the ZRL check precedes BOTH nonzero branches (T.81 G.1.2.3
            # / libjpeg): a pending 16+ zero-run must be emitted before an
            # already-nonzero coefficient buffers its correction bit, or
            # the decoder's ZRL advance reads the bit on the wrong side;
            # past the last newly-nonzero (i > eob_i) runs fold into EOB
            while run > 15 and i <= eob_i:
                flush_eob()
                c, ln = ac_enc[0xF0]
                bw.put(c, ln)
                run -= 16
                for b in br:
                    bw.put(b, 1)
                br = []
            if t > 1:
                # already nonzero at coarser precision: correction bit
                br.append(t & 1)
                continue
            # newly nonzero (t == 1)
            flush_eob()
            c, ln = ac_enc[(run << 4) | 1]
            bw.put(c, ln)
            bw.put(1 if band[i] > 0 else 0, 1)
            for b in br:
                bw.put(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _interleave_slots(planes, samp, nbx, mcux, mcuy):
    """Per component: (dc values in MCU order, interleaved slot keys)."""
    ncomp = len(planes)
    bper = [samp[ci][0] * samp[ci][1] for ci in range(ncomp)]
    B = sum(bper)
    offs = np.cumsum([0] + bper)
    mygrid = np.repeat(np.arange(mcuy, dtype=np.int64), mcux)
    mxgrid = np.tile(np.arange(mcux, dtype=np.int64), mcuy)
    out = []
    for ci in range(ncomp):
        hi, vi = samp[ci]
        rows = mygrid[:, None] * vi + np.repeat(np.arange(vi), hi)[None, :]
        cols = mxgrid[:, None] * hi + np.tile(np.arange(hi), vi)[None, :]
        order = (rows * nbx[ci] + cols).ravel()
        dc = np.asarray(planes[ci], dtype=np.int64)[order, 0]
        nblk = dc.shape[0]
        slot = (np.arange(nblk) // bper[ci]) * B + offs[ci] \
            + np.arange(nblk) % bper[ci]
        out.append((dc, slot))
    return out


def _enc_dc_first_vec(planes, samp, nbx, mcux, mcuy, dc_enc) -> bytes:
    """Vectorized progressive DC-first scan (interleaved, point
    transform Al applied by the caller as dc >> Al arithmetic shift):
    per-component differential chains in MCU order, lexsorted into the
    interleaved slot order."""
    dc_codes, dc_lens = _enc_arrays(dc_enc, 16)
    f_code, f_len, f_slot, f_sub = [], [], [], []
    for dc, slot in _interleave_slots(planes, samp, nbx, mcux, mcuy):
        val = dc >> 1  # Al=1 point transform (arithmetic, like Python)
        diff = np.empty_like(val)
        diff[0] = val[0]
        diff[1:] = val[1:] - val[:-1]
        size = np.searchsorted(_POW2, np.abs(diff), side="right")
        amp = np.where(diff < 0, diff + (1 << size) - 1, diff)
        n = val.shape[0]
        f_code += [dc_codes[size], amp]
        f_len += [dc_lens[size], size]
        f_slot += [slot, slot]
        f_sub += [np.zeros(n, np.int64), np.ones(n, np.int64)]
    codes = np.concatenate(f_code)
    lens = np.concatenate(f_len)
    o = np.lexsort((np.concatenate(f_sub), np.concatenate(f_slot)))
    return _pack_fields(codes[o], lens[o])


def _enc_dc_refine_vec(planes, samp, nbx, mcux, mcuy) -> bytes:
    """Vectorized progressive DC refinement: one raw LSB per block in
    interleaved MCU order (no entropy coding at Ah=1/Al=0)."""
    f_bit, f_slot = [], []
    for dc, slot in _interleave_slots(planes, samp, nbx, mcux, mcuy):
        f_bit.append(dc & 1)
        f_slot.append(slot)
    bits = np.concatenate(f_bit)
    o = np.argsort(np.concatenate(f_slot), kind="stable")
    return _pack_fields(bits[o], np.ones(bits.size, np.int64))


def _eobrun_fields(contrib, event_blocks, nb):
    """Shared EOBRUN bookkeeping for the progressive AC scans: given a
    0/1 per-block end-contribution array and the sorted unique blocks
    that carry emissions (flush points), return the EOBRUN field rows
    (value, block, kind) where kind 0 = boundary flush (sorts before
    that block's fields) and kind 1 = 0x7FFF cap flush (fires at the
    contributing block's END). Returns (values, blocks, kinds)."""
    P = np.cumsum(contrib)                       # through block i
    Pm1 = np.concatenate([[0], P])               # through block i-1
    bnd = np.concatenate([event_blocks, [nb]])   # flush boundaries
    Cb = Pm1[bnd]
    Cprev = np.concatenate([[0], Cb[:-1]])
    R = Cb - Cprev
    q = R // 0x7FFF
    rem = R % 0x7FFF
    vals, blks, kinds = [], [], []
    ncaps = int(q.sum())
    if ncaps:                                    # exotic: ≥32767-block gaps
        rep = np.repeat(np.arange(q.size), q)
        base = np.cumsum(q) - q
        k = np.arange(ncaps, dtype=np.int64) - base[rep] + 1
        targets = Cprev[rep] + k * 0x7FFF
        capblk = np.searchsorted(P, targets, side="left")
        vals.append(np.full(ncaps, 0x7FFF, np.int64))
        blks.append(capblk.astype(np.int64))
        kinds.append(np.ones(ncaps, np.int64))
    m = rem > 0
    if m.any():
        vals.append(rem[m])
        blks.append(bnd[m].astype(np.int64))
        kinds.append(np.zeros(int(m.sum()), np.int64))
    if not vals:
        return (np.zeros(0, np.int64),) * 3
    return (np.concatenate(vals), np.concatenate(blks),
            np.concatenate(kinds))


def _enc_ac_first_vec(plane, idxs, ss, se, al, ac_enc) -> bytes:
    """Vectorized progressive AC-first scan (T.81 G.1.2.2),
    byte-identical to _enc_ac_first: baseline-style run/ZRL/amp field
    table per nonzero coefficient of the point-transformed band, plus
    EOBRUN flush fields placed before each emitting block (boundary)
    or at the capping block's end (0x7FFF)."""
    A = np.asarray(plane, dtype=np.int64)[np.asarray(idxs, np.int64)]
    A = A[:, ss:se + 1]
    shifted = np.sign(A) * (np.abs(A) >> al)
    nb, W = shifted.shape
    ac_codes, ac_lens = _enc_arrays(ac_enc, 256)

    f_code, f_len, f_blk, f_pos, f_sub = [], [], [], [], []

    def emit(code, ln, blk, pos, sub):
        f_code.append(np.asarray(code, np.int64))
        f_len.append(np.asarray(ln, np.int64))
        f_blk.append(np.asarray(blk, np.int64))
        f_pos.append(np.asarray(pos, np.int64))
        f_sub.append(np.asarray(sub, np.int64))

    bid, pos = np.nonzero(shifted != 0)
    if bid.size:
        firstnz = np.ones(bid.size, dtype=bool)
        firstnz[1:] = bid[1:] != bid[:-1]
        prevpos = np.empty_like(pos)
        prevpos[1:] = pos[:-1]
        prevpos[firstnz] = -1
        run = pos - prevpos - 1
        nzrl = run >> 4
        vals = shifted[bid, pos]
        vsize = np.searchsorted(_POW2, np.abs(vals), side="right")
        vamp = np.where(vals < 0, vals + (1 << vsize) - 1, vals)
        sym = ((run & 15) << 4) | vsize
        tot = int(nzrl.sum())
        if tot:
            rep = np.repeat(np.arange(nzrl.size), nzrl)
            base = np.cumsum(nzrl) - nzrl
            k = np.arange(tot, dtype=np.int64) - base[rep]
            emit(np.full(tot, ac_codes[0xF0]), np.full(tot, ac_lens[0xF0]),
                 bid[rep], pos[rep], k)
        emit(ac_codes[sym], ac_lens[sym], bid, pos,
             np.full(bid.size, 16, np.int64))
        emit(vamp, vsize, bid, pos, np.full(bid.size, 17, np.int64))

    has = np.zeros(nb, dtype=bool)
    lastnz = np.full(nb, -1, np.int64)
    if bid.size:
        has[bid] = True
        lastnz[bid] = pos          # ascending per block: last write wins
    contrib = (~has | (lastnz < W - 1)).astype(np.int64)
    ev, eb, ek = _eobrun_fields(contrib, np.nonzero(has)[0], nb)
    if ev.size:
        r = np.searchsorted(_POW2, ev, side="right") - 1
        # boundary flushes sort before the block's fields (pos -1);
        # cap flushes fire after the block's trailing contribution
        fpos = np.where(ek == 1, W + 2, -1)
        emit(ac_codes[r << 4], ac_lens[r << 4], eb, fpos,
             np.zeros(ev.size, np.int64))
        emit(ev - (1 << r), r, eb, fpos, np.ones(ev.size, np.int64))

    if not f_code:
        return b""
    codes = np.concatenate(f_code)
    lens = np.concatenate(f_len)
    o = np.lexsort((np.concatenate(f_sub), np.concatenate(f_pos),
                    np.concatenate(f_blk)))
    return _pack_fields(codes[o], lens[o])


def _enc_ac_refine_vec(plane, idxs, ss, se, al, ac_enc) -> bytes:
    """Vectorized progressive AC refinement (T.81 G.1.2.3),
    byte-identical to _enc_ac_refine. The stream interleaves three
    field kinds whose ORDER is data-dependent but statically known at
    encode time (unlike decode, there is no feedback loop):

      * events — newly-nonzero (|v|>>Al == 1) codes (run<<4|1)+sign and
        ZRL codes where a ≥16-zero run is pending at a nonzero coeff
        with index ≤ the block's last newly-nonzero;
      * attached correction bits — already-nonzero coeffs buffer their
        LSB, flushed after the NEXT event in the same block;
      * EOBRUN flushes with pending correction bits from block tails.

    Events get per-block ordinals; every field sorts on
    (block, 2*event_ordinal ± phase, sub) where boundary flushes take
    2*first_event-1 and block-end cap flushes take 2*n_events."""
    A = np.asarray(plane, dtype=np.int64)[np.asarray(idxs, np.int64)]
    A = A[:, ss:se + 1]
    t = np.abs(A) >> al
    nb, W = t.shape
    ac_codes, ac_lens = _enc_arrays(ac_enc, 256)
    newly = t == 1
    corr = t > 1

    arW = np.arange(W, dtype=np.int64)
    idxn = np.where(newly, arW[None, :], -1)
    eob = idxn.max(axis=1) if W else np.full(nb, -1, np.int64)  # -1 if none
    # zeros before position i, per block (zb[:, i] = zeros at < i)
    zb = np.zeros((nb, W + 1), np.int64)
    zb[:, 1:] = np.cumsum(t == 0, axis=1)
    # last newly strictly before i
    pn = np.maximum.accumulate(idxn, axis=1)
    pnb = np.full((nb, W), -1, np.int64)
    pnb[:, 1:] = pn[:, :-1]
    # zeros inside the current newly-segment, before i
    zseg = zb[:, :W] - np.take_along_axis(zb, pnb + 1, axis=1)

    # --- events -----------------------------------------------------
    # ZRL events: at nonzero coeffs with pos <= eob, the cumulative
    # in-segment ZRL count is floor(zseg/16); new events at a coeff =
    # its cumulative minus the previous nonzero coeff's (same segment).
    cb, cp = np.nonzero(newly | corr)
    ev_blk, ev_key, ev_isn, ev_run, ev_sign = (np.zeros(0, np.int64),) * 5
    if cb.size:
        gate = cp <= eob[cb]
        zrlc = np.where(gate, zseg[cb, cp] >> 4, 0)
        seg = pnb[cb, cp]
        gfirst = np.ones(cb.size, dtype=bool)
        gfirst[1:] = (cb[1:] != cb[:-1]) | (seg[1:] != seg[:-1])
        prev = np.empty_like(zrlc)
        prev[1:] = zrlc[:-1]
        prev[gfirst] = 0
        nzr = zrlc - prev
        ztot = int(nzr.sum())
        parts_blk, parts_key, parts_isn = [], [], []
        parts_run, parts_sign = [], []
        if ztot:
            rep = np.repeat(np.arange(nzr.size), nzr)
            base = np.cumsum(nzr) - nzr
            k = np.arange(ztot, dtype=np.int64) - base[rep]
            parts_blk.append(cb[rep])
            parts_key.append(cp[rep] * 8 + k)      # k <= 3 for W <= 63
            parts_isn.append(np.zeros(ztot, np.int64))
            parts_run.append(np.zeros(ztot, np.int64))
            parts_sign.append(np.zeros(ztot, np.int64))
        nsel = newly[cb, cp]
        nblk2, npos2 = cb[nsel], cp[nsel]
        parts_blk.append(nblk2)
        parts_key.append(npos2 * 8 + 7)
        parts_isn.append(np.ones(nblk2.size, np.int64))
        parts_run.append(zseg[nblk2, npos2] & 15)
        parts_sign.append((A[nblk2, npos2] > 0).astype(np.int64))
        ev_blk = np.concatenate(parts_blk)
        ev_key = np.concatenate(parts_key)
        ev_isn = np.concatenate(parts_isn)
        ev_run = np.concatenate(parts_run)
        ev_sign = np.concatenate(parts_sign)
        o = np.lexsort((ev_key, ev_blk))
        ev_blk, ev_key, ev_isn = ev_blk[o], ev_key[o], ev_isn[o]
        ev_run, ev_sign = ev_run[o], ev_sign[o]
    nev = ev_blk.size
    # per-block event ordinals + per-block counts/offsets
    ev_count = np.bincount(ev_blk, minlength=nb + 1) if nev else \
        np.zeros(nb + 1, np.int64)
    ev_off = np.concatenate([[0], np.cumsum(ev_count)])
    ev_ord = np.arange(nev, dtype=np.int64) - ev_off[ev_blk]

    f_code, f_len, f_blk, f_eord, f_sub = [], [], [], [], []

    def emit(code, ln, blk, eord, sub):
        f_code.append(np.asarray(code, np.int64))
        f_len.append(np.asarray(ln, np.int64))
        f_blk.append(np.asarray(blk, np.int64))
        f_eord.append(np.asarray(eord, np.int64))
        f_sub.append(np.asarray(sub, np.int64))

    if nev:
        code = np.where(ev_isn == 1,
                        ac_codes[(ev_run << 4) | 1], ac_codes[0xF0])
        ln = np.where(ev_isn == 1,
                      ac_lens[(ev_run << 4) | 1], ac_lens[0xF0])
        emit(code, ln, ev_blk, 2 * ev_ord, np.zeros(nev, np.int64))
        m = ev_isn == 1
        if m.any():
            emit(ev_sign[m], np.ones(int(m.sum()), np.int64),
                 ev_blk[m], 2 * ev_ord[m], np.ones(int(m.sum()), np.int64))

    # --- attached correction bits ------------------------------------
    qb, qp = np.nonzero(corr)
    if qb.size:
        bits = t[qb, qp] & 1
        # first event in the block with pos > q  <=>  ev_key >= (q+1)*8
        srt_key = ev_blk * (W + 2) * 8 + ev_key if nev else \
            np.zeros(0, np.int64)
        want = qb * (W + 2) * 8 + (qp + 1) * 8
        at = np.searchsorted(srt_key, want, side="left")
        attached = (at < nev) & (ev_blk[np.minimum(at, max(nev - 1, 0))]
                                 == qb) if nev else np.zeros(qb.size, bool)
        aidx = at[attached]
        # sub ordinal within the attachment group, in position order
        # (qb, qp) are lexicographically sorted already; group by aidx
        if aidx.size:
            gfirst = np.ones(aidx.size, dtype=bool)
            gfirst[1:] = aidx[1:] != aidx[:-1]
            gstart = np.maximum.accumulate(
                np.where(gfirst, np.arange(aidx.size, dtype=np.int64), 0))
            ordinal = np.arange(aidx.size, dtype=np.int64) - gstart
            emit(bits[attached], np.ones(aidx.size, np.int64),
                 ev_blk[aidx], 2 * ev_ord[aidx], 2 + ordinal)
        pend_mask = ~attached
    else:
        pend_mask = np.zeros(0, dtype=bool)

    # --- EOBRUN flushes + pending bits --------------------------------
    contrib = (eob < W - 1).astype(np.int64)
    ev_blocks = np.nonzero(ev_count[:nb] > 0)[0]
    fv, fb, fk = _eobrun_fields(contrib, ev_blocks, nb)
    if fv.size:
        # flush ordering keys in emission (block) order: boundary at
        # block b covers tail bits of blocks < b; a cap at block x
        # covers blocks <= x. Encode as half-open block coordinates.
        fcoord = np.where(fk == 1, fb * 2 + 1, fb * 2 - 1)
        fo = np.argsort(fcoord, kind="stable")
        fv, fb, fk, fcoord = fv[fo], fb[fo], fk[fo], fcoord[fo]
        feord = np.where(fk == 1, 2 * ev_count[np.minimum(fb, nb - 1)],
                         2 * np.zeros(fv.size, np.int64) - 1)
        # boundary flush sorts before the block's first event: ordinal
        # -1 works because event ordinals start at 0; the final flush
        # (block == nb) also uses -1 on an empty block
        r = np.searchsorted(_POW2, fv, side="right") - 1
        emit(ac_codes[r << 4], ac_lens[r << 4], fb, feord,
             np.zeros(fv.size, np.int64))
        emit(fv - (1 << r), r, fb, feord, np.ones(fv.size, np.int64))
        # pending bits: tail correction bits (pos > eob) flushed by the
        # first flush whose coverage includes their block
        if qb.size and pend_mask.any():
            pb, pp = qb[pend_mask], qp[pend_mask]
            pbits = t[pb, pp] & 1
            fl = np.searchsorted(fcoord, pb * 2, side="left")
            # every pending bit MUST find a flush (the scan-end flush
            # covers everything): fl < fv.size by construction
            gfirst = np.ones(fl.size, dtype=bool)
            gfirst[1:] = fl[1:] != fl[:-1]
            gstart = np.maximum.accumulate(
                np.where(gfirst, np.arange(fl.size, dtype=np.int64), 0))
            ordinal = np.arange(fl.size, dtype=np.int64) - gstart
            emit(pbits, np.ones(fl.size, np.int64), fb[fl], feord[fl],
                 2 + ordinal)

    if not f_code:
        return b""
    codes = np.concatenate(f_code)
    lens = np.concatenate(f_len)
    o = np.lexsort((np.concatenate(f_sub), np.concatenate(f_eord),
                    np.concatenate(f_blk)))
    return _pack_fields(codes[o], lens[o])


def _emit_progressive_scans(out: bytearray, planes, samp, nbx,
                            mcux, mcuy, h, w, hmax, vmax,
                            dc_enc=None, ac_enc=None) -> None:
    """Default progressive scan script (T.81 Annex G encoder): DC first
    (interleaved, Al=1) → per-component AC bands 1-5 and 6-63 at Al=1 →
    DC refinement (Ah=1, Al=0) → per-component AC refinements. Coded
    coefficients are exactly the baseline-quantized planes. All four
    scan kinds are vectorized (byte-identical to the scalar walk in
    _emit_progressive_scans_scalar, the differential-test oracle).
    dc_enc/ac_enc default to the 8-bit tables; precision 12 passes the
    wider DC-15/AC-14 alphabets (T.81 allows SOF2 at 8 or 12 bit)."""
    dc_enc = dc_enc or _DC_ENC
    ac_enc = ac_enc or _AC_ENC
    ncomp = len(planes)

    def comp_blocks(ci):
        hi, vi = samp[ci]
        cbx = ((w * hi + hmax - 1) // hmax + 7) // 8
        cby = ((h * vi + vmax - 1) // vmax + 7) // 8
        return [by * nbx[ci] + bx for by in range(cby) for bx in range(cbx)]

    out += _seg(0xDA, _sos_header(
        [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)], 0, 0, 0, 1))
    out += _enc_dc_first_vec(planes, samp, nbx, mcux, mcuy, dc_enc)

    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            out += _seg(0xDA, _sos_header(
                [(ci + 1, 0, 0 if ci == 0 else 1)], ss, se, 0, 1))
            out += _enc_ac_first_vec(planes[ci], comp_blocks(ci),
                                     ss, se, 1, ac_enc)

    out += _seg(0xDA, _sos_header(
        [(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 1, 0))
    out += _enc_dc_refine_vec(planes, samp, nbx, mcux, mcuy)

    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            out += _seg(0xDA, _sos_header(
                [(ci + 1, 0, 0 if ci == 0 else 1)], ss, se, 1, 0))
            out += _enc_ac_refine_vec(planes[ci], comp_blocks(ci),
                                      ss, se, 0, ac_enc)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_LUT_CACHE: dict[bytes, tuple[np.ndarray, np.ndarray]] = {}


def _build_lut(bits, symbols) -> tuple[np.ndarray, np.ndarray]:
    """16-bit prefix lookup: for any next-16-bits value, (symbol, code
    length). One array index replaces the bit-by-bit tree walk — the
    round-2 Huffman loop was the decode hot spot (VERDICT r2 §perf ③).
    Cached by table contents: a fleet of images from one encoder shares
    its DHTs, so each worker builds each LUT once."""
    key = bytes(bits) + bytes(symbols)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, dtype=np.int16)
    length = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            hi = lo + (1 << (16 - ln))
            sym[lo:hi] = symbols[k]
            length[lo:hi] = ln
            code += 1
            k += 1
        code <<= 1
    _LUT_CACHE[key] = (sym, length)
    if len(_LUT_CACHE) > 64:  # bound worker memory (64 x 192 KiB)
        _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
    return sym, length


def _split_scan(buf: bytes, start: int
                ) -> tuple[list[bytes], int, list[tuple[int, int]]]:
    """Unstuff + split ONE scan's entropy-coded data at RST markers,
    vectorized. Returns (segments, end, ranges): `end` is the absolute
    offset of the terminating marker's 0xFF (the next scan header /
    EOI) so multi-scan streams keep parsing; `ranges` are the ABSOLUTE
    (start, stop) byte offsets of each segment's still-stuffed bytes in
    the original buffer (RST markers excluded) — the slice a worker
    range-reads to decode just that segment."""
    data = np.frombuffer(buf, dtype=np.uint8, offset=start)
    ff = np.flatnonzero(data == 0xFF)
    if len(ff) and ff[-1] == len(data) - 1:
        ff = ff[:-1]
    nxt = data[ff + 1]
    # scan ends at the first marker that is neither stuffing nor RSTn
    is_stuff = nxt == 0x00
    is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    enders = ff[~is_stuff & ~is_rst]
    end = int(enders[0]) if len(enders) else len(data)
    keep_rst = ff[is_rst & (ff < end)]
    cuts = [0]
    for r in keep_rst:
        cuts.append(int(r))
        cuts.append(int(r) + 2)
    cuts.append(end)
    stuff_pos = ff[is_stuff] + 1  # positions of the stuffed 0x00 bytes
    segs = []
    ranges = []
    for i in range(0, len(cuts), 2):
        a, b = cuts[i], cuts[i + 1]
        seg = data[a:b]
        drop = stuff_pos[(stuff_pos >= a) & (stuff_pos < b)] - a
        if len(drop):
            seg = np.delete(seg, drop)
        segs.append(seg.tobytes())
        ranges.append((start + a, start + b))
    return segs, start + end, ranges


_PACK_CACHE: dict = {}

# extend() as table lookups: v >= _EXT_HALF[s] keeps v, else v - _EXT_OFF[s]
_EXT_HALF = [0] + [1 << (s - 1) for s in range(1, 17)]
_EXT_OFF = [0] + [(1 << s) - 1 for s in range(1, 17)]
_BIT_MASK = [(1 << k) - 1 for k in range(17)]

# windows beyond this many bytes from the chunk base trigger a rebase;
# one MCU is < 3 KB compressed (10 blocks x 64 codes x 27 bits), so an
# 8 KB margin before the chunk end is always enough for one whole MCU
_WIN_CHUNK = 1 << 22  # 4 MiB of windows (~118 MB as a Python int list)
_WIN_MARGIN = 8192


def _packed_lut(sym: np.ndarray, length: np.ndarray) -> list:
    """(length<<8)|symbol as a plain Python list: ONE list index in the
    decode loop replaces two numpy scalar reads (each ~100 ns).
    Entry 0 (length 0) marks an invalid prefix."""
    key = length.tobytes() + sym.tobytes()
    hit = _PACK_CACHE.get(key)
    if hit is None:
        hit = ((length.astype(np.int32) << 8)
               | sym.astype(np.int32)).tolist()
        _PACK_CACHE[key] = hit
        if len(_PACK_CACHE) > 16:  # ~2 MB per packed table
            _PACK_CACHE.pop(next(iter(_PACK_CACHE)))
    return hit


def _windows32(seg: bytes, base: int, limit: int) -> list:
    """Sliding big-endian 32-bit windows w[i] = seg[base+i : base+i+4]
    (zero-padded past the end), as a Python int list. Built vectorized;
    indexing one is ~40 ns vs ~400 ns for composing 4 byte loads."""
    u8 = np.frombuffer(seg, dtype=np.uint8, offset=base,
                       count=min(limit, len(seg) - base))
    u8 = np.concatenate([u8, np.zeros(4, dtype=np.uint8)])
    w = ((u8[:-3].astype(np.uint32) << 24)
         | (u8[1:-2].astype(np.uint32) << 16)
         | (u8[2:-1].astype(np.uint32) << 8)
         | u8[3:].astype(np.uint32))
    return w.tolist()


def _decode_baseline_scan(scan, comps, order, luts, zz_planes, nbx,
                          mcux, n_mcu, dri):
    """One interleaved baseline scan (DC+AC together).

    Hot path: the entropy loop runs as plain local-int Python — packed
    list LUTs, a precomputed 32-bit window list instead of per-peek
    byte composition, and coefficient writes batched into Python lists
    with ONE vectorized scatter per component at scan end (a numpy
    scalar store is ~10x an append). ~3x over the round-2 byte-compose bit-reader loop."""
    sched = []
    out_idx: list[list] = [[] for _ in zz_planes]
    out_val: list[list] = [[] for _ in zz_planes]
    for sc in scan["comps"]:
        ci = order[sc["id"]]
        dsym, dlen = luts[(0, sc["dc"])]
        asym, alen = luts[(1, sc["ac"])]
        sched.append((_packed_lut(dsym, dlen), _packed_lut(asym, alen),
                      comps[ci]["v"], comps[ci]["h"], nbx[ci], ci,
                      out_idx[ci].append, out_val[ci].append))
    seg_mcus = dri if dri else n_mcu
    half = _EXT_HALF
    off = _EXT_OFF
    msk = _BIT_MASK
    m = 0
    for seg in scan["segments"]:
        if m >= n_mcu:
            break
        wbase = 0                     # byte offset of w[0] inside seg
        w = _windows32(seg, 0, _WIN_CHUNK + 4)
        wlim = (len(w) - _WIN_MARGIN) << 3 if len(seg) > _WIN_CHUNK \
            else 1 << 62
        pos = 0                       # bit offset relative to wbase
        preds = [0] * len(comps)
        stop = min(n_mcu, m + seg_mcus)
        while m < stop:
            if pos >= wlim:           # rebase the window chunk
                wbase += pos >> 3
                pos &= 7
                w = _windows32(seg, wbase, _WIN_CHUNK + 4)
                if (len(seg) - wbase) <= _WIN_CHUNK:
                    wlim = 1 << 62
            mx = m % mcux
            my = m // mcux
            for dl, al, vi, hi, bxi, ci, iapp, vapp in sched:
                pred = preds[ci]
                base_y = my * vi
                base_x = mx * hi
                for v in range(vi):
                    rowbase = ((base_y + v) * bxi + base_x) << 6
                    for hh in range(hi):
                        row0 = rowbase + (hh << 6)
                        sh = pos & 7
                        e = dl[(w[pos >> 3] >> (16 - sh)) & 0xFFFF]
                        ln = e >> 8
                        if not ln:
                            raise ValueError("jpeg: invalid Huffman code")
                        s = e & 255
                        pos += ln
                        if s:
                            sh = pos & 7
                            val = (w[pos >> 3] >> (32 - sh - s)) & msk[s]
                            pos += s
                            pred += val if val >= half[s] else val - off[s]
                        iapp(row0)
                        vapp(pred)
                        k = 1
                        while k <= 63:
                            sh = pos & 7
                            e = al[(w[pos >> 3] >> (16 - sh)) & 0xFFFF]
                            ln = e >> 8
                            if not ln:
                                raise ValueError("jpeg: invalid Huffman code")
                            rs = e & 255
                            pos += ln
                            s = rs & 0xF
                            if not s:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError(
                                    "jpeg: coefficient overflow")
                            sh = pos & 7
                            val = (w[pos >> 3] >> (32 - sh - s)) & msk[s]
                            pos += s
                            iapp(row0 + k)
                            vapp(val if val >= half[s] else val - off[s])
                            k += 1
                preds[ci] = pred
            m += 1
    if m < n_mcu:
        raise ValueError(f"jpeg: truncated scan ({m}/{n_mcu} MCUs)")
    for ci, plane in enumerate(zz_planes):
        if out_idx[ci]:
            plane.reshape(-1)[np.array(out_idx[ci], dtype=np.int64)] = \
                np.array(out_val[ci], dtype=np.int32)


def _decode_progressive_scan(scan, comps, order, luts, py_planes, nbx,
                             mcux, mcuy, dri, w, h, hmax, vmax):
    """One progressive scan (T.81 §G.2): spectral selection Ss..Se at
    successive-approximation bit position Al; Ah=0 first pass, Ah>0
    refinement. DC scans may interleave components (MCU order); AC scans
    cover exactly one component in ITS OWN raster block order.

    `py_planes` are Python list-of-list coefficient rows, shared across
    the stream's scans: refinement READS per-coefficient state before
    each correction bit, so writes can't be batched into a scatter the
    way the baseline scan's can — list rows make each read/write a
    plain Python op instead of a numpy scalar op (was the decode wall:
    11 s for a 1 Mpx progressive stream, now ~1.5 s)."""
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    scomps = scan["comps"]
    half = _EXT_HALF
    off = _EXT_OFF
    msk = _BIT_MASK
    if ss == 0:
        # ---- DC scan (interleaved or single-component) ----
        sched = []
        for sc in scomps:
            ci = order[sc["id"]]
            if ah == 0:
                dsym, dlen = luts[(0, sc["dc"])]
                dl = _packed_lut(dsym, dlen)
            else:
                dl = None
            sched.append((py_planes[ci], dl,
                          comps[ci]["v"], comps[ci]["h"], nbx[ci], ci))
        if len(scomps) == 1:
            ci = order[scomps[0]["id"]]
            cbx = ((w * comps[ci]["h"] + hmax - 1) // hmax + 7) // 8
            cby = ((h * comps[ci]["v"] + vmax - 1) // vmax + 7) // 8
            n_units = cbx * cby
        else:
            cbx = cby = 0
            n_units = mcux * mcuy
        seg_units = dri if dri else n_units
        p1 = 1 << al
        m = 0
        for seg in scan["segments"]:
            if m >= n_units:
                break
            wbase = 0
            wl = _windows32(seg, 0, _WIN_CHUNK + 4)
            wlim = (len(wl) - _WIN_MARGIN) << 3 \
                if len(seg) > _WIN_CHUNK else 1 << 62
            pos = 0
            preds = [0] * len(comps)
            stop = min(n_units, m + seg_units)
            while m < stop:
                if pos >= wlim:
                    wbase += pos >> 3
                    pos &= 7
                    wl = _windows32(seg, wbase, _WIN_CHUNK + 4)
                    if (len(seg) - wbase) <= _WIN_CHUNK:
                        wlim = 1 << 62
                for plane, dl, vi, hi, bxi, ci in sched:
                    if cbx:
                        idxs = ((m // cbx) * bxi + (m % cbx),)
                    else:
                        mx, my = m % mcux, m // mcux
                        idxs = [(my * vi + v) * bxi + (mx * hi + hh)
                                for v in range(vi) for hh in range(hi)]
                    for idx in idxs:
                        row = plane[idx]
                        if dl is not None:
                            sh = pos & 7
                            e = dl[(wl[pos >> 3] >> (16 - sh)) & 0xFFFF]
                            ln = e >> 8
                            if not ln:
                                raise ValueError(
                                    "jpeg: invalid Huffman code")
                            s = e & 255
                            pos += ln
                            if s:
                                sh = pos & 7
                                v = (wl[pos >> 3] >> (32 - sh - s)) & msk[s]
                                pos += s
                                preds[ci] += v if v >= half[s] \
                                    else v - off[s]
                            row[0] = preds[ci] << al
                        else:  # DC refinement: one bit per block
                            bit = (wl[pos >> 3] >> (31 - (pos & 7))) & 1
                            pos += 1
                            if bit:
                                row[0] |= p1
                m += 1
        if m < n_units:
            raise ValueError(f"jpeg: truncated DC scan ({m}/{n_units})")
        return
    # ---- AC scan: exactly one component, own block raster order ----
    if len(scomps) != 1:
        raise ValueError("jpeg: progressive AC scan must be single-component")
    ci = order[scomps[0]["id"]]
    plane = py_planes[ci]
    asym, alen = luts[(1, scomps[0]["ac"])]
    alut = _packed_lut(asym, alen)
    bxi = nbx[ci]
    cbx = ((w * comps[ci]["h"] + hmax - 1) // hmax + 7) // 8
    cby = ((h * comps[ci]["v"] + vmax - 1) // vmax + 7) // 8
    n_units = cbx * cby
    seg_units = dri if dri else n_units
    p1 = 1 << al
    m1 = -1 << al
    m = 0
    for seg in scan["segments"]:
        if m >= n_units:
            break
        wbase = 0
        wl = _windows32(seg, 0, _WIN_CHUNK + 4)
        wlim = (len(wl) - _WIN_MARGIN) << 3 \
            if len(seg) > _WIN_CHUNK else 1 << 62
        pos = 0
        eobrun = 0
        stop = min(n_units, m + seg_units)
        while m < stop:
            if pos >= wlim:
                wbase += pos >> 3
                pos &= 7
                wl = _windows32(seg, wbase, _WIN_CHUNK + 4)
                if (len(seg) - wbase) <= _WIN_CHUNK:
                    wlim = 1 << 62
            row = plane[(m // cbx) * bxi + (m % cbx)]
            if ah == 0:
                # first pass (G.2.2): ordinary run-length + EOBRUN
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        sh = pos & 7
                        e = alut[(wl[pos >> 3] >> (16 - sh)) & 0xFFFF]
                        ln = e >> 8
                        if not ln:
                            raise ValueError("jpeg: invalid Huffman code")
                        rs = e & 255
                        pos += ln
                        s = rs & 0xF
                        if not s:
                            r = rs >> 4
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    sh = pos & 7
                                    eobrun += (wl[pos >> 3]
                                               >> (32 - sh - r)) & msk[r]
                                    pos += r
                                break
                            k += 16  # ZRL
                            continue
                        k += rs >> 4
                        if k > se:
                            raise ValueError("jpeg: AC overflow")
                        sh = pos & 7
                        v = (wl[pos >> 3] >> (32 - sh - s)) & msk[s]
                        pos += s
                        row[k] = (v if v >= half[s] else v - off[s]) << al
                        k += 1
            else:
                # refinement pass (G.2.3 / libjpeg decode_mcu_AC_refine)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sh = pos & 7
                        e = alut[(wl[pos >> 3] >> (16 - sh)) & 0xFFFF]
                        ln = e >> 8
                        if not ln:
                            raise ValueError("jpeg: invalid Huffman code")
                        rs = e & 255
                        pos += ln
                        r, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r)
                                if r:
                                    sh = pos & 7
                                    eobrun += (wl[pos >> 3]
                                               >> (32 - sh - r)) & msk[r]
                                    pos += r
                                break
                            # r == 15: skip over 16 zero-history coeffs
                        else:
                            if s != 1:
                                raise ValueError("jpeg: bad refine size")
                            bit = (wl[pos >> 3] >> (31 - (pos & 7))) & 1
                            pos += 1
                            val = p1 if bit else m1
                        # advance past r zero-history coefficients, applying
                        # correction bits to already-nonzero ones
                        while k <= se:
                            c = row[k]
                            if c:
                                bit = (wl[pos >> 3]
                                       >> (31 - (pos & 7))) & 1
                                pos += 1
                                if bit and not \
                                        ((c if c >= 0 else -c) & p1):
                                    row[k] = c + (p1 if c >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            row[k] = val
                        k += 1
                if eobrun > 0:
                    # EOB band: correction bits for remaining nonzero coeffs
                    while k <= se:
                        c = row[k]
                        if c:
                            bit = (wl[pos >> 3] >> (31 - (pos & 7))) & 1
                            pos += 1
                            if bit and not ((c if c >= 0 else -c) & p1):
                                row[k] = c + (p1 if c >= 0 else m1)
                        k += 1
                    eobrun -= 1
            m += 1
    if m < n_units:
        raise ValueError(f"jpeg: truncated AC scan ({m}/{n_units})")


def _upsample_plane(p: np.ndarray, hi: int, vi: int, hmax: int, vmax: int,
                    w: int, h: int) -> np.ndarray:
    """Nearest-neighbour upsample of a component plane to full (h, w).

    Index-mapped so it handles ANY spec-legal factor combination,
    including non-dividing ones (e.g. hi=3 with hmax=4): output pixel
    (y, x) reads plane pixel (floor(y*vi/vmax), floor(x*hi/hmax)).
    Integer-repeat (vmax//vi) only worked when factors divide
    (ADVICE r3)."""
    if vi == vmax and hi == hmax:
        return p[:h, :w]
    yi = (np.arange(h, dtype=np.int64) * vi) // vmax
    xi = (np.arange(w, dtype=np.int64) * hi) // hmax
    return p[np.minimum(yi, p.shape[0] - 1)[:, None],
             np.minimum(xi, p.shape[1] - 1)[None, :]]


def _parse_stream(buf: bytes) -> dict:
    """Marker-level parse shared by decode_jpeg_real and the
    segment-parallel API: quant tables, component layout, Huffman LUT
    snapshots, restart interval, and per-scan entropy segments."""
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    pos = 2
    qt = {}
    luts = {}
    comps = []
    h = w = None
    progressive = False
    scans = []
    dri = 0
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
                if pq == 0:
                    zz = np.frombuffer(payload, dtype=np.uint8, count=64,
                                       offset=off + 1).astype(np.int32)
                    off += 65
                elif pq == 1:  # 16-bit entries (12-bit precision streams)
                    zz = np.frombuffer(payload, dtype=">u2", count=64,
                                       offset=off + 1).astype(np.int32)
                    off += 129
                else:
                    raise ValueError(f"jpeg: bad quant precision {pq}")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = zz
                qt[tq] = tbl.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"jpeg: precision {prec} (8 and 12 supported)")
            for ci in range(nc):
                cid, sampb, tq = payload[6 + 3 * ci:9 + 3 * ci]
                hi, vi = sampb >> 4, sampb & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"jpeg: bad sampling {hi}x{vi}")
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: only baseline (SOF0/1) and progressive (SOF2) DCT")
        elif marker == 0xC4:
            off = 0
            while off < len(payload):
                tc, th = payload[off] >> 4, payload[off] & 0xF
                bits = list(payload[off + 1:off + 17])
                n = sum(bits)
                symbols = list(payload[off + 17:off + 17 + n])
                luts[(tc, th)] = _build_lut(bits, symbols)
                off += 17 + n
        elif marker == 0xDD:
            dri = struct.unpack_from(">H", payload, 0)[0]
        elif marker == 0xDA:
            ns = payload[0]
            scomps = []
            for si in range(ns):
                cid, tt = payload[1 + 2 * si:3 + 2 * si]
                scomps.append({"id": cid, "dc": tt >> 4, "ac": tt & 0xF})
            ss_, se_, a = payload[1 + 2 * ns:4 + 2 * ns]
            data_start = pos
            segments, pos, seg_ranges = _split_scan(buf, pos)
            # snapshot the Huffman tables CURRENT at this scan's
            # position: real encoders (libjpeg, javax.imageio) emit a
            # fresh DHT before each progressive scan, reusing table ids
            # — decoding every scan with the final tables produced
            # garbage (caught by the round-4 external-encoder fixture)
            scans.append({"comps": scomps, "ss": ss_, "se": se_,
                          "ah": a >> 4, "al": a & 0xF,
                          "segments": segments, "dri": dri,
                          "data_start": data_start,
                          "seg_ranges": seg_ranges,
                          "luts": dict(luts)})
    if not scans or h is None:
        raise ValueError("jpeg: missing SOS/SOF")
    return {"qt": qt, "comps": comps, "scans": scans, "h": h, "w": w,
            "prec": prec, "progressive": progressive}


def decode_jpeg_real(buf: bytes) -> np.ndarray:
    """Decode a JFIF/JPEG byte stream to uint8 (h, w) or (h, w, 3) RGB.
    Baseline (SOF0), extended sequential (SOF1, incl. 12-bit sample
    precision -> uint16 output) AND progressive (SOF2) DCT, arbitrary
    sampling factors (4:4:4, 4:2:0, 4:2:2, 4:4:0, ...), any
    DHT-carried canonical Huffman tables (8- or 16-bit DQT entries),
    restart intervals, multi-scan spectral selection + successive
    approximation. Arithmetic/lossless raise."""
    st = _parse_stream(buf)
    qt, comps, scans = st["qt"], st["comps"], st["scans"]
    h, w, prec, progressive = (st["h"], st["w"], st["prec"],
                               st["progressive"])

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcuy * mcux
    order = {c["id"]: i for i, c in enumerate(comps)}
    # per-component block grids (MCU-aligned)
    nbx = [mcux * c["h"] for c in comps]
    nby = [mcuy * c["v"] for c in comps]
    zz_planes = [np.zeros((nbx[i] * nby[i], 64), dtype=np.int32)
                 for i in range(len(comps))]
    if progressive:
        # list-of-list rows for the whole multi-scan pass (see
        # _decode_progressive_scan); one tolist/np.array pair per plane
        # replaces millions of numpy scalar reads/writes
        py_planes = [p.tolist() for p in zz_planes]
        for scan in scans:
            _decode_progressive_scan(scan, comps, order, scan["luts"],
                                     py_planes, nbx, mcux, mcuy,
                                     scan["dri"], w, h, hmax, vmax)
        zz_planes = [np.asarray(p, dtype=np.int32) for p in py_planes]
    else:
        _decode_baseline_scan(scans[0], comps, order, scans[0]["luts"],
                              zz_planes, nbx, mcux, n_mcu,
                              scans[0]["dri"])

    planes = []
    for ci, comp in enumerate(comps):
        cw = (w * comp["h"] + hmax - 1) // hmax
        ch = (h * comp["v"] + vmax - 1) // vmax
        p = _dequant_idct(zz_planes[ci], qt[comp["tq"]],
                          nby[ci], nbx[ci], ch, cw,
                          prec=prec).astype(np.float64)
        planes.append(_upsample_plane(p, comp["h"], comp["v"],
                                      hmax, vmax, w, h))
    odt = np.uint8 if prec == 8 else np.uint16
    if len(planes) == 1:
        return planes[0].astype(odt)
    half, maxv = float(1 << (prec - 1)), (1 << prec) - 1
    y, cb, cr = planes
    r = y + 1.402 * (cr - half)
    g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
    b = y + 1.772 * (cb - half)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, maxv).astype(odt)


# ---------------------------------------------------------------------------
# segment-parallel decode (splittable restart-interval scans)
# ---------------------------------------------------------------------------

def jpeg_scan_info(buf: bytes) -> dict:
    """Header-level facts needed to split one baseline scan across
    workers: restart interval (MCUs per segment), segment count, MCU
    grid, sampling ceiling, precision. Error-first for progressive
    streams (multi-scan EOBRUN state is still per-segment, but the
    per-scan pass structure makes tile-level splits the better unit
    there) and for streams without restart markers beyond the trivial
    single-segment split."""
    st = _parse_stream(buf)
    if st["progressive"]:
        raise NotImplementedError(
            "jpeg: segment-parallel decode targets baseline scans")
    comps = st["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (st["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (st["h"] + 8 * vmax - 1) // (8 * vmax)
    scan = st["scans"][0]
    return {"w": st["w"], "h": st["h"], "prec": st["prec"],
            "ncomp": len(comps), "hmax": hmax, "vmax": vmax,
            "mcux": mcux, "mcuy": mcuy, "n_mcu": mcux * mcuy,
            "dri": scan["dri"], "n_segments": len(scan["segments"]),
            # range-read recipe: a worker needs ONLY
            # buf[:header_end] + buf[a:b] per assigned segment — see
            # decode_jpeg_segment_slices
            "header_end": scan["data_start"],
            "segment_ranges": list(scan["seg_ranges"])}


def decode_jpeg_segments(buf: bytes, seg_start: int = 0,
                         seg_count: int | None = None, *,
                         global_seg_start: int | None = None
                         ) -> tuple[int, np.ndarray]:
    """Decode a contiguous run of restart segments of a BASELINE scan,
    independently of every other segment (DC predictors reset at each
    RST marker — that independence is the whole point of emitting DRI
    at engine scale: one huge scene JPEG becomes a splittable input,
    each worker entropy-decoding only its segment run).

    Returns (first_mcu, tiles): tiles has shape
    (n, 8*vmax, 8*hmax[, 3]) — one full MCU pixel tile per decoded MCU
    (edge tiles include the encoder's padding; assemble_jpeg_segments
    crops). Decoding every segment and assembling is bit-identical to
    decode_jpeg_real."""
    st = _parse_stream(buf)
    if st["progressive"]:
        raise NotImplementedError(
            "jpeg: segment-parallel decode targets baseline scans")
    qt, comps = st["qt"], st["comps"]
    prec = st["prec"]
    scan = st["scans"][0]
    info = jpeg_scan_info(buf)
    dri, n_mcu = info["dri"], info["n_mcu"]
    hmax, vmax = info["hmax"], info["vmax"]
    nseg = info["n_segments"]
    if seg_count is None:
        seg_count = nseg - seg_start
    if not (0 <= seg_start < nseg and seg_count > 0
            and seg_start + seg_count <= nseg):
        raise ValueError(f"jpeg: segment range [{seg_start}, "
                         f"{seg_start + seg_count}) outside 0..{nseg}")
    seg_mcus = dri if dri else n_mcu
    # global_seg_start: when `buf` is a rebuilt mini-stream (range-read
    # path) the local indices start at 0 but the MCU positions -- and
    # the short final segment -- are governed by the TRUE position
    gstart = seg_start if global_seg_start is None else global_seg_start
    first_mcu = gstart * seg_mcus
    span = min(n_mcu, first_mcu + seg_count * seg_mcus) - first_mcu

    # decode into a VIRTUAL single-row MCU grid (mcux = span): the
    # entropy stream never depends on MCU coordinates, so the span's
    # blocks land in a compact horizontal-strip layout per component
    order = {c["id"]: i for i, c in enumerate(comps)}
    nbx_v = [span * c["h"] for c in comps]
    zz_span = [np.zeros((nbx_v[i] * comps[i]["v"], 64), dtype=np.int32)
               for i in range(len(comps))]
    sub = dict(scan)
    sub["segments"] = scan["segments"][seg_start:seg_start + seg_count]
    _decode_baseline_scan(sub, comps, order, scan["luts"], zz_span,
                          nbx_v, span, span, dri if dri else 0)

    # strip-level dequant + IDCT + upsample + color: MCU boundaries
    # align with sampling boundaries, so the per-tile pixels are
    # bit-identical to the full-image path (index-mapped upsample)
    planes = []
    for ci, comp in enumerate(comps):
        ch, cw = comp["v"] * 8, nbx_v[ci] * 8
        pl = _dequant_idct(zz_span[ci], qt[comp["tq"]], comp["v"],
                           nbx_v[ci], ch, cw, prec=prec)             .astype(np.float64)
        planes.append(_upsample_plane(pl, comp["h"], comp["v"],
                                      hmax, vmax, span * 8 * hmax,
                                      8 * vmax))
    odt = np.uint8 if prec == 8 else np.uint16
    if len(planes) == 1:
        strip = planes[0].astype(odt)
    else:
        half, maxv = float(1 << (prec - 1)), (1 << prec) - 1
        y, cb, cr = planes
        r = y + 1.402 * (cr - half)
        g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
        b = y + 1.772 * (cb - half)
        strip = np.clip(np.round(np.stack([r, g, b], axis=-1)),
                        0, maxv).astype(odt)
    # (8*vmax, span*8*hmax[, 3]) -> (span, 8*vmax, 8*hmax[, 3])
    tiles = strip.reshape(strip.shape[0], span, 8 * hmax, -1)         .swapaxes(0, 1)
    if tiles.shape[-1] == 1:
        tiles = tiles[..., 0]
    return first_mcu, np.ascontiguousarray(tiles)


def assemble_jpeg_segments(info: dict, parts) -> np.ndarray:
    """Reassemble decode_jpeg_segments outputs (any order, must cover
    every MCU exactly once) into the full image, cropped to (h, w) —
    bit-identical to decode_jpeg_real of the same stream."""
    th, tw = 8 * info["vmax"], 8 * info["hmax"]
    mcux, mcuy = info["mcux"], info["mcuy"]
    ncomp = info["ncomp"]
    odt = np.uint8 if info["prec"] == 8 else np.uint16
    shape = (mcuy * th, mcux * tw) + ((3,) if ncomp == 3 else ())
    out = np.zeros(shape, dtype=odt)
    seen = np.zeros(mcux * mcuy, dtype=bool)
    for first_mcu, tiles in parts:
        for k in range(tiles.shape[0]):
            m = first_mcu + k
            if seen[m]:
                raise ValueError(f"jpeg: MCU {m} covered twice")
            seen[m] = True
            my, mx = divmod(m, mcux)
            out[my * th:(my + 1) * th, mx * tw:(mx + 1) * tw] = tiles[k]
    if not seen.all():
        raise ValueError("jpeg: assembled parts do not cover the scan")
    return out[:info["h"], :info["w"]]


def decode_jpeg_segment_slices(header: bytes, slices: list[bytes],
                               seg_start: int) -> tuple[int, np.ndarray]:
    """Range-read worker path for cluster-scale single-scene decode:
    the planner ships `header = buf[:info['header_end']]` (a few KB of
    tables) and each worker range-reads ONLY its assigned
    `buf[a:b]` slices from info['segment_ranges'] — never the whole
    stream. Rebuilds a minimal JPEG (slices re-joined with RST
    markers, EOI appended) and decodes with the true global segment
    position so MCU placement and the short final segment are exact.
    Bit-identical to decode_jpeg_segments on the full buffer (tested).

    The rebuilt stream re-inserts RST0 between every pair of slices;
    this decoder splits on ANY RST0-7 without validating the modulo-8
    cycle, which T.81 permits (the cycle exists for resync after
    corruption, not as stream state)."""
    mini = header + b"\xFF\xD0".join(slices) + b"\xFF\xD9"
    return decode_jpeg_segments(mini, 0, len(slices),
                                global_seg_start=seg_start)
