"""Full PNG codec: external javax.imageio fixtures, all filter types,
sub-byte depths, 16-bit, palette, Adam7 (reference reads PNGs through
GDAL's PNG driver — driver.go:20-109; parity is pixel-exact because
PNG is lossless)."""
import base64
import struct
import zlib

import numpy as np
import pytest

from godal_spark.functions import png_fixtures as pf
from godal_spark.functions.png import PNG_SIG, decode_png, encode_png, png_info

W, H = 64, 48
_yy, _xx = np.mgrid[0:H, 0:W]
RGB_CARD = np.dstack([(120 + _yy // 4) & 0xFF, (90 + _xx // 4) & 0xFF,
                      (100 + (_xx + _yy) // 8) & 0xFF]).astype(np.uint8)
G16_CARD = ((_xx * 521 + _yy * 797) % 65536).astype(np.uint16)
PAL_IDX = ((_xx // 4 + _yy // 4) % 16).astype(np.uint8)
_i = np.arange(16)
PALETTE = np.stack([(_i * 16) & 0xFF, (255 - _i * 16) & 0xFF,
                    (_i * 8 + 7) & 0xFF], axis=1).astype(np.uint8)
BILEVEL = ((_xx // 8 + _yy // 8) % 2).astype(np.uint8)
GRAYA = np.dstack([(40 + _xx * 3 + _yy) & 0xFF,
                   255 - ((_xx + 2 * _yy) & 0x7F)]).astype(np.uint8)
RGBA = np.dstack([RGB_CARD, (255 - ((_xx * 2 + _yy) & 0x3F)).astype(np.uint8)])

_EXPECT = {"RGB8": RGB_CARD, "RGB8_ADAM7": RGB_CARD, "GRAY16": G16_CARD,
           "GRAY16_ADAM7": G16_CARD, "PAL4": PALETTE[PAL_IDX],
           "BILEVEL1": BILEVEL, "GRAYA8": GRAYA, "RGBA8": RGBA}


@pytest.mark.parametrize("name", sorted(_EXPECT))
def test_external_java_fixture_decodes_exactly(name):
    out = decode_png(base64.b64decode(pf.ALL[name]))
    exp = _EXPECT[name]
    assert out.shape == exp.shape and out.dtype == exp.dtype
    assert np.array_equal(out, exp)


def test_fixture_palette_raw_band_and_info():
    buf = base64.b64decode(pf.ALL["PAL4"])
    idx = decode_png(buf, expand_palette=False)
    assert np.array_equal(idx, PAL_IDX)
    info = png_info(buf)
    assert info["ctype"] == 3 and info["trns"] is None
    assert np.array_equal(info["palette"], PALETTE)


def test_fixture_adam7_flag_visible_in_info():
    assert png_info(base64.b64decode(pf.ALL["RGB8_ADAM7"]))["interlace"] == 1
    assert png_info(base64.b64decode(pf.ALL["RGB8"]))["interlace"] == 0


# ---------------------------------------------------------------------------
# spec-derived filtered streams: an INDEPENDENT scalar forward-filter
# implementation builds the stream; decode must invert it exactly.
# ---------------------------------------------------------------------------

def _chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _build_filtered_png(img, ftype):
    """Straight-loop forward filtering per PNG spec §6 (scalar, no numpy
    tricks shared with the codec)."""
    h, w, ch = img.shape
    bpp = ch
    stream = bytearray()
    prev = [0] * (w * ch)
    for y in range(h):
        line = [int(v) for v in img[y].ravel()]
        stream.append(ftype)
        for x in range(w * ch):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                f = line[x]
            elif ftype == 1:
                f = (line[x] - a) & 0xFF
            elif ftype == 2:
                f = (line[x] - b) & 0xFF
            elif ftype == 3:
                f = (line[x] - ((a + b) >> 1)) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f = (line[x] - pred) & 0xFF
            stream.append(f)
        prev = line
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(stream)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 3])
def test_every_filter_type_inverts(ftype, ch):
    rng = np.random.default_rng(ftype * 10 + ch)
    img = rng.integers(0, 256, (11, 13, ch), dtype=np.uint8)
    out = decode_png(_build_filtered_png(img, ftype))
    exp = img[:, :, 0] if ch == 1 else img
    assert np.array_equal(out, exp)


def _build_subbyte_gray(img, depth):
    """Pack a small-valued gray image at depth 1/2/4, filter 0."""
    h, w = img.shape
    per = 8 // depth
    stream = bytearray()
    for y in range(h):
        stream.append(0)
        acc, n, row = 0, 0, bytearray()
        for x in range(w):
            acc = (acc << depth) | int(img[y, x])
            n += 1
            if n == per:
                row.append(acc)
                acc, n = 0, 0
        if n:
            row.append(acc << (depth * (per - n)))
        stream += row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(stream)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_decode(depth):
    rng = np.random.default_rng(depth)
    img = rng.integers(0, 1 << depth, (9, 21), dtype=np.uint8)  # odd width: pad path
    assert np.array_equal(decode_png(_build_subbyte_gray(img, depth)), img)


# ---------------------------------------------------------------------------
# encode round-trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["none", "sub", "up", "paeth", "adaptive"])
@pytest.mark.parametrize("shape", [(10, 7), (10, 7, 2), (10, 7, 3), (10, 7, 4)])
def test_encode_filter_modes_roundtrip(mode, shape):
    rng = np.random.default_rng(hash((mode, shape)) % 2**32)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter=mode)), img)


@pytest.mark.parametrize("bands", [1, 3])
def test_encode_16bit_roundtrip(bands):
    rng = np.random.default_rng(bands)
    shape = (12, 9) if bands == 1 else (12, 9, bands)
    img = rng.integers(0, 65536, shape, dtype=np.uint16)
    out = decode_png(encode_png(img, filter="adaptive"))
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)


@pytest.mark.parametrize("k", [2, 4, 16, 200])
def test_encode_palette_roundtrip_all_depths(k):
    rng = np.random.default_rng(k)
    pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
    idx = rng.integers(0, k, (14, 23), dtype=np.uint8)
    buf = encode_png(idx, palette=pal)
    info = png_info(buf)
    assert info["depth"] == {2: 1, 4: 2, 16: 4, 200: 8}[k]
    assert np.array_equal(decode_png(buf, expand_palette=False), idx)
    assert np.array_equal(decode_png(buf), pal[idx])


def test_trns_palette_expands_to_rgba():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    base = encode_png(idx, palette=pal)
    # splice a tRNS chunk after PLTE (entry 1 semi-transparent, rest opaque)
    plte_end = base.index(b"PLTE") + 4 + 9 + 4
    trns = _chunk(b"tRNS", bytes([255, 128]))
    buf = base[:plte_end] + trns + base[plte_end:]
    out = decode_png(buf)
    assert out.shape == (2, 3, 4)
    assert np.array_equal(out[:, :, :3], pal[idx])
    assert np.array_equal(out[:, :, 3], np.where(idx == 1, 128, 255))
    info = png_info(buf)
    assert list(info["trns"]) == [255, 128, 255]


def test_adaptive_filter_shrinks_smooth_raster():
    # a smooth gradient (DEM-tile shape) should compress far better
    # with adaptive filtering than with none
    img = (np.add.outer(np.arange(200), np.arange(300)) % 256).astype(np.uint8)
    plain = encode_png(img, filter="none")
    adapt = encode_png(img, filter="adaptive")
    assert np.array_equal(decode_png(adapt), img)
    assert len(adapt) < len(plain) / 2


def test_error_first_unknowns():
    with pytest.raises(ValueError):
        decode_png(b"nope" * 4)
    bad_depth = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
    sig = bad_depth.index(b"IHDR") + 4
    bad_depth[sig + 8] = 3  # depth 3 is invalid
    with pytest.raises(ValueError):
        decode_png(bytes(bad_depth))
