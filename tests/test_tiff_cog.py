"""TIFF / GeoTIFF / COG codec + cogify sink (round 5).

Round-trips for every compression and layout, EXTERNAL javax.imageio
fixtures (encoder sharing no code with ours), and the end-to-end
distributed cog_write sink.
"""

import base64

import numpy as np
import pytest

from godal_spark.functions import tiff as T
from godal_spark.functions import tiff_fixtures as FX


def _gray_card(w, h):
    y, x = np.mgrid[0:h, 0:w]
    return ((120 + y // 4 + x // 3) % 256).astype(np.uint8)


def _rgb_card(w, h):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(120 + y // 4) % 256, (90 + x // 4) % 256,
                     (100 + (x + y) // 8) % 256], axis=2).astype(np.uint8)


@pytest.mark.parametrize("comp", ["none", "deflate", "lzw", "packbits"])
def test_tiff_roundtrip_compressions(comp):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    back, meta = T.decode_tiff(T.encode_tiff(a, compression=comp))
    assert np.array_equal(back, a)


def test_tiff_roundtrip_layouts_dtypes():
    rng = np.random.default_rng(8)
    a16 = rng.integers(0, 65536, (70, 90), dtype=np.uint16)
    buf = T.encode_tiff(a16, tile=(32, 32), compression="deflate",
                        predictor=2)
    assert np.array_equal(T.decode_tiff(buf)[0], a16)
    f32 = rng.standard_normal((20, 30)).astype(np.float32)
    assert np.array_equal(
        T.decode_tiff(T.encode_tiff(f32, compression="lzw"))[0], f32)
    i16 = rng.integers(-30000, 30000, (15, 17), dtype=np.int16)
    assert np.array_equal(T.decode_tiff(T.encode_tiff(i16))[0], i16)
    rgb = rng.integers(0, 256, (25, 31, 3), dtype=np.uint8)
    buf = T.encode_tiff(rgb, tile=(16, 16), compression="lzw", predictor=2)
    assert np.array_equal(T.decode_tiff(buf)[0], rgb)


def test_tiff_geo_tags_roundtrip():
    a = _gray_card(16, 12)
    gt = [45.0, 0.25, 0.0, 51.0, 0.0, -0.25]
    back, meta = T.decode_tiff(T.encode_tiff(a, gt=gt, epsg=4326))
    assert meta["gt"] == gt and meta["epsg"] == 4326
    back, meta = T.decode_tiff(T.encode_tiff(a, gt=gt, epsg=27700))
    assert meta["epsg"] == 27700  # projected key
    # rotated gts round-trip via ModelTransformationTag since round 5c
    _, meta = T.decode_tiff(T.encode_tiff(a, gt=[0, 1, 0.1, 0, 0.1, -1]))
    assert meta["gt"] == [0, 1, 0.1, 0, 0.1, -1]


def test_tiff_cog_multi_ifd():
    a = _gray_card(61, 43)
    levels = [a, a[::2, ::2].copy(), a[::4, ::4].copy()]
    gt = [10.0, 0.5, 0.0, 50.0, 0.0, -0.5]
    cog = T.encode_cog(levels, tile=(16, 16), gt=gt, epsg=4326)
    arrays, metas = T.decode_tiff_all(cog)
    assert len(arrays) == 3
    for got, exp in zip(arrays, levels):
        assert np.array_equal(got, exp)
    assert metas[0]["gt"] == gt and metas[0]["epsg"] == 4326
    # COG layout: every IFD (metadata) precedes every pixel chunk
    _, m0 = T.decode_tiff(cog)
    assert m0["n_ifds"] == 3


@pytest.mark.parametrize("name,card", [
    ("GRAY_NONE", "gray"), ("GRAY_LZW", "gray"), ("GRAY_DEFLATE", "gray"),
    ("GRAY_PACKBITS", "gray"), ("RGB_LZW", "rgb"), ("RGB_DEFLATE", "rgb")])
def test_tiff_external_javax_fixtures(name, card):
    """javax.imageio-encoded TIFFs (strip layouts, LZW early-change,
    Deflate, PackBits) decode pixel-exact — the external-encoder
    contract (same strategy as the round-4 JPEG fixtures)."""
    buf = base64.b64decode(getattr(FX, f"JAVA_{name}"))
    exp = _gray_card(61, 43) if card == "gray" else _rgb_card(40, 30)
    arr, _ = T.decode_tiff(buf)
    assert np.array_equal(arr, exp)


def test_tiff_error_first():
    with pytest.raises(ValueError, match="byte-order"):
        T.decode_tiff(b"XXXX")
    import struct
    with pytest.raises(ValueError, match="bad magic"):
        T.decode_tiff(struct.pack("<2sHI", b"II", 41, 8))


def test_bigtiff_roundtrip():
    """BigTIFF (magic 43, u64 offsets, 20-byte IFD entries) — the form
    a >4 GB mosaic COG needs: strips, tiled multi-IFD chains, geo tags,
    LONG8 offset/byte-count entries, all round-trip; classic output is
    byte-layout unchanged."""
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (50, 70), dtype=np.uint8)
    buf = T.encode_tiff(a, compression="deflate", big=True)
    assert buf[2:4] == b"\x2b\x00"  # magic 43
    assert np.array_equal(T.decode_tiff(buf)[0], a)
    gt = [1.0, 0.5, 0.0, 9.0, 0.0, -0.5]
    cog = T.encode_cog([a, a[::2, ::2].copy()], tile=(32, 32),
                       gt=gt, epsg=32630, big=True)
    arrays, metas = T.decode_tiff_all(cog)
    assert len(arrays) == 2
    assert np.array_equal(arrays[0], a)
    assert np.array_equal(arrays[1], a[::2, ::2])
    assert metas[0]["gt"] == gt and metas[0]["epsg"] == 32630
    # classic path still emits magic 42 and decodes
    buf2 = T.encode_tiff(a)
    assert buf2[2:4] == b"\x2a\x00"
    assert np.array_equal(T.decode_tiff(buf2)[0], a)
    # uint16 + predictor through the big layout
    a16 = rng.integers(0, 65536, (33, 41), dtype=np.uint16)
    b16 = T.encode_tiff(a16, tile=(16, 16), predictor=2, big=True)
    assert np.array_equal(T.decode_tiff(b16)[0], a16)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_tiff_jpeg_roundtrip():
    """New-style JPEG-in-TIFF (compression 7): strips and tiles, gray
    (photometric 1) and RGB (photometric 6, YCbCr 4:2:0), PSNR >= 40
    at the default quality 95 — the lossy COG-for-imagery shape."""
    gray, rgb = _gray_card(260, 300), _rgb_card(260, 300)
    for arr in (gray, rgb):
        for tile in (None, (64, 64)):
            buf = T.encode_tiff(arr, tile=tile, compression="jpeg")
            dec, _ = T.decode_tiff(buf)
            assert dec.shape == arr.shape and dec.dtype == np.uint8
            assert _psnr(arr, dec) >= 40.0
    # RGB tags: compression 7, photometric 6, 2x2 subsampling
    _, tl = T._walk_ifds(T.encode_tiff(rgb, tile=(64, 64),
                                       compression="jpeg"))
    assert tl[0][T._T_COMPRESSION][0] == 7
    assert tl[0][T._T_PHOTOMETRIC][0] == 6
    assert tl[0][T._T_YCBCR_SUBSAMPLING] == (2, 2)
    # lower quality shrinks the stream but keeps shape
    small = T.encode_tiff(rgb, tile=(64, 64), compression="jpeg",
                          quality=50)
    assert len(small) < len(T.encode_tiff(rgb, tile=(64, 64),
                                          compression="jpeg"))


def test_tiff_jpeg_external_javax_fixtures():
    """javax.imageio TIFFs with compression type JPEG (quality 0.95,
    standalone per-strip streams, photometric 1 / 6+subsampling) —
    an encoder sharing no code with this engine's JPEG or TIFF
    writers — decode within lossy tolerance of the analytic cards."""
    buf = base64.b64decode(FX.JAVA_GRAY_JPEG)
    dec, _ = T.decode_tiff(buf)
    assert dec.shape == (43, 61)
    assert _psnr(_gray_card(61, 43), dec) >= 40.0
    buf = base64.b64decode(FX.JAVA_RGB_JPEG)
    dec, _ = T.decode_tiff(buf)
    assert dec.shape == (30, 40, 3)
    assert _psnr(_rgb_card(40, 30), dec) >= 40.0


def test_tiff_jpeg_tables_abbreviated_streams():
    """TechNote 2's other shape: shared DQT/DHT hoisted into the
    JPEGTables tag (a SOI..tables..EOI stream) with abbreviated
    per-tile streams. Synthesized from the engine's own standalone
    output by splitting segments — decode must splice the tables back
    and produce the identical pixels."""
    import struct as _s
    rgb = _rgb_card(130, 100)
    buf = T.encode_tiff(rgb, tile=(64, 64), compression="jpeg")
    full, _ = T.decode_tiff(buf)
    en, tl = T._walk_ifds(buf)
    tags = dict(tl[0])

    def split(stream):
        """-> (tables_segments, abbreviated_stream)"""
        tabs, keep, pos = bytearray(), bytearray(b"\xFF\xD8"), 2
        while pos < len(stream):
            assert stream[pos] == 0xFF
            m = stream[pos + 1]
            if m == 0xD9:
                keep += stream[pos:pos + 2]
                break
            ln = _s.unpack_from(">H", stream, pos + 2)[0]
            seg = stream[pos:pos + 2 + ln]
            (tabs if m in (0xDB, 0xC4) else keep).extend(seg)
            pos += 2 + ln
            if m == 0xDA:  # entropy data until EOI
                keep += stream[pos:len(stream) - 2] + b"\xFF\xD9"
                break
        return bytes(tabs), bytes(keep)

    chunks, tables = [], None
    for o, c in zip(tags[T._T_TILE_OFFSETS], tags[T._T_TILE_BYTE_COUNTS]):
        tabs, abbr = split(buf[o:o + c])
        tables = b"\xFF\xD8" + tabs + b"\xFF\xD9"
        chunks.append(abbr)
    tags[T._T_JPEG_TABLES] = (tables,)
    tags[T._T_TILE_OFFSETS] = tuple(
        np.cumsum([0] + [len(c) for c in chunks[:-1]]))
    tags[T._T_TILE_BYTE_COUNTS] = tuple(len(c) for c in chunks)
    dec = T._decode_one_ifd(b"".join(chunks), tags, en)
    assert np.array_equal(dec, full)


def test_tiff_jpeg_cog_and_sink():
    """encode_cog with JPEG tiles: full pyramid + geo tags; and the
    distributed cog_write sink accepts compression='jpeg'."""
    rgb = _rgb_card(150, 120)
    gt = [10.0, 0.5, 0.0, 20.0, 0.0, -0.5]
    cog = T.encode_cog([rgb, rgb[::2, ::2].copy()], tile=(64, 64),
                       compression="jpeg", gt=gt, epsg=3857)
    arrays, metas = T.decode_tiff_all(cog)
    assert [a.shape for a in arrays] == [(120, 150, 3), (60, 75, 3)]
    assert all(_psnr(e, g) >= 40.0 for e, g in
               zip([rgb, rgb[::2, ::2]], arrays))
    assert metas[0]["gt"] == gt and metas[0]["epsg"] == 3857


def test_tiff_jpeg_12bit():
    """12-bit JPEG-in-TIFF (BitsPerSample 12, extended sequential
    SOF1 streams) — the aerial/satellite GeoTIFF shape: uint16 input
    < 4096 round-trips through strips, tiles and the COG chain."""
    y, x = np.mgrid[0:150, 0:130]
    g12 = ((1800 + 6 * (y // 3) + 5 * (x // 2)) % 4096).astype(np.uint16)
    rgb12 = np.stack([(1900 + 8 * (y // 4)) % 4096,
                      (1400 + 9 * (x // 4)) % 4096,
                      (1600 + 7 * ((x + y) // 8)) % 4096],
                     axis=-1).astype(np.uint16)

    def psnr12(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(4095.0 ** 2 / mse)

    for arr in (g12, rgb12):
        for tile in (None, (64, 64)):
            buf = T.encode_tiff(arr, tile=tile, compression="jpeg")
            _, tl = T._walk_ifds(buf)
            assert tl[0][T._T_BITS_PER_SAMPLE][0] == 12
            dec, _ = T.decode_tiff(buf)
            assert dec.dtype == np.uint16 and dec.shape == arr.shape
            assert psnr12(arr, dec) >= 55.0
    cog = T.encode_cog([g12, g12[::2, ::2].copy()], tile=(64, 64),
                       compression="jpeg", gt=[0, 1, 0, 0, 0, -1],
                       epsg=32630)
    arrs, metas = T.decode_tiff_all(cog)
    assert [a.shape for a in arrs] == [(150, 130), (75, 65)]
    assert psnr12(g12, arrs[0]) >= 55.0 and metas[0]["epsg"] == 32630
    with pytest.raises(ValueError, match="16-bit JPEG"):
        T.encode_tiff(np.full((8, 8), 60000, np.uint16),
                      compression="jpeg")


def test_tiff_jpeg_error_first():
    with pytest.raises(ValueError, match="uint8 or 12-bit"):
        T.encode_tiff(np.zeros((8, 8), np.float32), compression="jpeg")
    with pytest.raises(ValueError, match="predictor"):
        T.encode_tiff(np.zeros((8, 8), np.uint8), compression="jpeg",
                      predictor=2)
    # old-style JPEG (compression 6) is error-first on decode
    buf = T.encode_tiff(np.zeros((8, 8), np.uint8))
    en, tl = T._walk_ifds(buf)
    tags = dict(tl[0])
    tags[T._T_COMPRESSION] = (6,)
    with pytest.raises(NotImplementedError, match="old-style"):
        T._decode_one_ifd(buf, tags, en)
    # RGB-coded (photometric 2) JPEG is error-first too
    jbuf = T.encode_tiff(_rgb_card(32, 32), compression="jpeg")
    en2, tl2 = T._walk_ifds(jbuf)
    tags2 = dict(tl2[0])
    tags2[T._T_PHOTOMETRIC] = (2,)
    with pytest.raises(NotImplementedError, match="RGB-coded"):
        T._decode_one_ifd(jbuf, tags2, en2)


def test_tiff_sparse_chunks_and_float_predictor():
    """GDAL SPARSE_OK emits byte-count-0 strips/tiles (fill-value holes);
    the decoder must keep them zero instead of decompressing b''. And
    predictor 2 is integer-only by spec — float input is error-first on
    both the encode and decode sides."""
    a = (np.arange(200 * 64, dtype=np.uint16).reshape(200, 64) % 251)
    buf = T.encode_tiff(a)
    en, tag_list = T._walk_ifds(buf)
    tags = dict(tag_list[0])
    rps = tags[T._T_ROWS_PER_STRIP][0]
    cnts = list(tags[T._T_STRIP_BYTE_COUNTS])
    assert len(cnts) >= 3
    cnts[1] = 0  # emulate a sparse hole in strip 1
    tags[T._T_STRIP_BYTE_COUNTS] = tuple(cnts)
    out = T._decode_one_ifd(buf, tags, en).squeeze()
    exp = a.copy()
    exp[rps:2 * rps] = 0
    assert np.array_equal(out, exp)

    buf2 = T.encode_tiff(a, tile=(32, 32))
    en2, tl2 = T._walk_ifds(buf2)
    tags2 = dict(tl2[0])
    c2 = list(tags2[T._T_TILE_BYTE_COUNTS])
    c2[0] = 0
    tags2[T._T_TILE_BYTE_COUNTS] = tuple(c2)
    out2 = T._decode_one_ifd(buf2, tags2, en2).squeeze()
    exp2 = a.copy()
    exp2[:32, :32] = 0
    assert np.array_equal(out2, exp2)

    f = np.linspace(0, 1, 32 * 32, dtype=np.float32).reshape(32, 32)
    with pytest.raises(NotImplementedError, match="predictor 2"):
        T.encode_tiff(f, predictor=2)
    # float WITHOUT predictor still round-trips
    assert np.array_equal(T.decode_tiff(T.encode_tiff(f))[0].squeeze(), f)


def test_tiff_predictor3_float():
    """Floating-point predictor (3, TIFF TechNote 3): big-endian
    byte-split + byte-wise differencing. Round-trips for f32/f64,
    strips/tiles, gray/RGB; byte layout pinned against a scalar
    straight-loop reference; and it actually compresses smooth float
    rasters (the reason it exists)."""
    rng = np.random.default_rng(11)
    f32 = rng.standard_normal((45, 37)).astype(np.float32)
    f64 = rng.standard_normal((20, 30)).astype(np.float64)
    rgbf = rng.standard_normal((33, 21, 3)).astype(np.float32)
    for arr, tile in [(f32, None), (f32, (16, 16)), (f64, None),
                      (rgbf, (16, 16)), (rgbf, None)]:
        buf = T.encode_tiff(arr, tile=tile, compression="deflate",
                            predictor=3)
        assert np.array_equal(T.decode_tiff(buf)[0], arr)
        buf = T.encode_tiff(arr, tile=tile, compression="lzw",
                            predictor=3)
        assert np.array_equal(T.decode_tiff(buf)[0], arr)
    smooth = np.linspace(0, 1, 64 * 64, dtype=np.float32).reshape(64, 64)
    assert len(T.encode_tiff(smooth, compression="deflate", predictor=3)) \
        < len(T.encode_tiff(smooth, compression="deflate")) / 5
    # scalar straight-loop reference for the byte layout
    row = np.array([[1.5, -2.25, 3.125]], dtype=np.float32)
    got = T._apply_predictor3(row)
    import struct as _s
    split = [[], [], [], []]
    for v in row[0]:
        bb = _s.pack(">f", v)
        for k in range(4):
            split[k].append(bb[k])
    stream = [b for plane in split for b in plane]
    exp = [stream[0]] + [(stream[i] - stream[i - 1]) % 256
                         for i in range(1, len(stream))]
    assert got[0].tolist() == exp
    assert np.array_equal(
        T._undo_predictor3(got.tobytes(), 1, 3, np.dtype(np.float32)),
        row)
    # error-first: predictor 3 on integers
    with pytest.raises(ValueError, match="predictor 3"):
        T.encode_tiff(np.zeros((8, 8), np.uint8), predictor=3)


def test_tiff_planar_config2():
    """PlanarConfiguration 2 (separate sample planes, plane-major
    chunk order) decodes for strips and tiles, with compression and
    predictor 2 — synthesized by re-chunking the interleaved encoder's
    pixels (no planar writer here: GDAL emits INTERLEAVE=BAND files
    like these)."""
    import zlib
    rng = np.random.default_rng(12)
    rgb = rng.integers(0, 256, (25, 31, 3), dtype=np.uint8)

    buf = T.encode_tiff(rgb, compression="none")
    en, tl = T._walk_ifds(buf)
    tags = dict(tl[0])
    rps = tags[T._T_ROWS_PER_STRIP][0]
    chunks = [rgb[y0:y0 + rps, :, plane].tobytes()
              for plane in range(3) for y0 in range(0, 25, rps)]
    offs = list(np.cumsum([0] + [len(c) for c in chunks[:-1]]))
    tags[T._T_PLANAR_CONFIG] = (2,)
    tags[T._T_STRIP_OFFSETS] = tuple(offs)
    tags[T._T_STRIP_BYTE_COUNTS] = tuple(len(c) for c in chunks)
    assert np.array_equal(T._decode_one_ifd(b"".join(chunks), tags, en),
                          rgb)

    buf2 = T.encode_tiff(rgb, tile=(16, 16), compression="none")
    en2, tl2 = T._walk_ifds(buf2)
    tg = dict(tl2[0])
    chunks = []
    for plane in range(3):
        for ty in range(2):
            for tx in range(2):
                block = np.zeros((16, 16), np.uint8)
                ys, xs = min(16, 25 - ty * 16), min(16, 31 - tx * 16)
                block[:ys, :xs] = rgb[ty * 16:ty * 16 + ys,
                                      tx * 16:tx * 16 + xs, plane]
                d = block.astype(np.int16)
                diff = np.empty_like(d)
                diff[:, 0] = d[:, 0]
                diff[:, 1:] = d[:, 1:] - d[:, :-1]
                chunks.append(zlib.compress(
                    diff.astype(np.uint8).tobytes()))
    offs = list(np.cumsum([0] + [len(c) for c in chunks[:-1]]))
    tg[T._T_PLANAR_CONFIG] = (2,)
    tg[T._T_COMPRESSION] = (8,)
    tg[T._T_PREDICTOR] = (2,)
    tg[T._T_TILE_OFFSETS] = tuple(offs)
    tg[T._T_TILE_BYTE_COUNTS] = tuple(len(c) for c in chunks)
    assert np.array_equal(T._decode_one_ifd(b"".join(chunks), tg, en2),
                          rgb)
    # planar float strips with predictor 3
    rgbf = rng.standard_normal((10, 7, 3)).astype(np.float32)
    b3 = T.encode_tiff(rgbf[:, :, 0], compression="deflate", predictor=3)
    en3, tl3 = T._walk_ifds(b3)
    t3 = dict(tl3[0])
    rps = t3[T._T_ROWS_PER_STRIP][0]
    chunks = [zlib.compress(
        T._apply_predictor3(
            rgbf[y0:y0 + rps, :, plane].reshape(min(rps, 10 - y0), -1)
        ).tobytes())
        for plane in range(3) for y0 in range(0, 10, rps)]
    offs = list(np.cumsum([0] + [len(c) for c in chunks[:-1]]))
    t3[T._T_SAMPLES_PER_PIXEL] = (3,)
    t3[T._T_BITS_PER_SAMPLE] = (32, 32, 32)
    t3[T._T_SAMPLE_FORMAT] = (3, 3, 3)
    t3[T._T_PLANAR_CONFIG] = (2,)
    t3[T._T_STRIP_OFFSETS] = tuple(offs)
    t3[T._T_STRIP_BYTE_COUNTS] = tuple(len(c) for c in chunks)
    assert np.array_equal(T._decode_one_ifd(b"".join(chunks), t3, en3),
                          rgbf)


def test_codecs_dispatch_tiff():
    from godal_spark.functions import codecs

    a = _gray_card(20, 14)
    buf = codecs.encode(a, "tiff")
    assert np.array_equal(codecs.decode(buf, "tiff"), a)


def test_tiff_ingest_through_tiles(spark):
    """images table rows with fmt='tiff' flow through the normal tile
    explode (codecs dispatch → functions/tiff.py decode)."""
    from godal_spark import datagen
    from godal_spark.operators import tiling as TL

    a = _gray_card(40, 28)
    imgs = datagen.images_df(spark, [datagen.image_row("t", a, "tiff")])
    tiles = TL.explode_tiles(imgs, bw=16, bh=16)
    got = {}
    for r in tiles.collect():
        arr = np.frombuffer(r.payload, np.dtype(r.dtype)).reshape(r.bh, r.bw)
        got[(r.block_y, r.block_x)] = arr
    full = np.zeros_like(a)
    for (by, bx), arr in got.items():
        full[by * 16:by * 16 + arr.shape[0],
             bx * 16:bx * 16 + arr.shape[1]] = arr
    assert np.array_equal(full, a)


def test_cog_write_end_to_end(spark):
    """Distributed cogify: image → tile explode → overview pyramid →
    cog_write → REAL COG bytes whose IFD chain reproduces every level
    and the geo tags."""
    from godal_spark import datagen
    from godal_spark.operators import tiling as TL

    a = np.full((40, 40), 7, np.uint8)
    gt = [10.0, 0.5, 0.0, 50.0, 0.0, -0.5]
    imgs = datagen.images_df(spark, [
        datagen.image_row("cogx", a, "raw8", gt=gt, srs="EPSG:4326")])
    t0 = TL.explode_tiles(imgs, bw=16, bh=16)
    ov = TL.build_overviews(t0, min_size=16, block=16)
    out = TL.cog_write(t0.unionByName(ov), images_meta=imgs,
                       tile_size=16).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n_levels == 3  # 40, 20, 10
    arrays, metas = T.decode_tiff_all(bytes(row.cog))
    assert [x.shape for x in arrays] == [(40, 40), (20, 20), (10, 10)]
    for x in arrays:
        assert (x == 7).all()  # constant image: every overview stays 7
    assert metas[0]["gt"] == gt and metas[0]["epsg"] == 4326


# ---------------------------------------------------------------------------
# sub-byte (bilevel / mask-band) samples — round 5c
# ---------------------------------------------------------------------------

def test_tiff_bilevel_external_javax_fixtures():
    """Depth-1 TIFFs from javax.imageio: BitsPerSample tag omitted
    (spec default 1), odd width 61 -> scanline byte padding; all three
    byte-stream compressions."""
    yy, xx = np.mgrid[0:23, 0:61]
    exp = ((xx // 3 + yy // 2) % 2).astype(np.uint8)
    for name in ("BILEVEL_NONE", "BILEVEL_DEFLATE", "BILEVEL_PACKBITS"):
        buf = base64.b64decode(getattr(FX, f"JAVA_{name}"))
        arr, _ = T.decode_tiff(buf)
        assert arr.dtype == np.uint8 and arr.shape == (23, 61), name
        assert np.array_equal(arr, exp), name


@pytest.mark.parametrize("bits", [1, 2, 4])
def test_tiff_subbyte_roundtrip(bits):
    rng = np.random.default_rng(bits)
    img = rng.integers(0, 1 << bits, (37, 53), dtype=np.uint8)
    for comp in ("none", "deflate", "packbits", "lzw"):
        for tile in (None, (16, 16)):
            buf = T.encode_tiff(img, bits=bits, compression=comp, tile=tile)
            out, _ = T.decode_tiff(buf)
            assert np.array_equal(out, img), (comp, tile)


def test_tiff_subbyte_error_first():
    img = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError):
        T.encode_tiff(img, bits=3)
    with pytest.raises(ValueError):
        T.encode_tiff(img + 2, bits=1)  # value out of range
    with pytest.raises(ValueError):
        T.encode_tiff(np.zeros((8, 8, 3), np.uint8), bits=1)  # multi-band
    with pytest.raises(ValueError):
        T.encode_tiff(img, bits=1, compression="jpeg")


def test_lzw_packbits_match_scalar_references():
    """The round-5c vectorized LZW/PackBits coders must emit the SAME
    BYTES as the straight-loop implementations they replaced (kept here
    verbatim as references) — the speedup is not allowed to change the
    streams, only how fast they're produced. LZW: per-byte bigint bit
    reader was 0.5 MB/s decode / 0.05 MB/s encode — an ingest wall for
    the most common GeoTIFF compression in the wild."""

    def ref_lzw_encode(data):
        out_bits = []
        table = {}

        def reset():
            table.clear()
            for i in range(256):
                table[bytes([i])] = i
            return 258, 9

        next_code, width = reset()
        out_bits.append((256, width))
        w = b""
        for byte in data:
            c = bytes([byte])
            if w + c in table:
                w = w + c
                continue
            out_bits.append((table[w], width))
            table[w + c] = next_code
            next_code += 1
            if next_code + 1 > (1 << width) and width < 12:
                width += 1
            if next_code >= 4094:
                out_bits.append((256, width))
                next_code, width = reset()
            w = c
        if w:
            out_bits.append((table[w], width))
        out_bits.append((257, width))
        buf = bytearray()
        acc = nacc = 0
        for code, wd in out_bits:
            acc = (acc << wd) | code
            nacc += wd
            while nacc >= 8:
                buf.append((acc >> (nacc - 8)) & 0xFF)
                nacc -= 8
        if nacc:
            buf.append((acc << (8 - nacc)) & 0xFF)
        return bytes(buf)

    def ref_pb_encode(data):
        out = bytearray()
        i = 0
        n = len(data)
        while i < n:
            j = i
            while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
                j += 1
            if j > i:
                out.append(257 - (j - i + 1))
                out.append(data[i])
                i = j + 1
                continue
            j = i
            while (j + 1 < n and j - i < 127
                   and not (j + 2 < n
                            and data[j + 1] == data[j + 2] == data[j])):
                j += 1
            out.append(j - i)
            out += data[i:j + 1]
            i = j + 1
        return bytes(out)

    rng = np.random.default_rng(7)
    cases = [b"", b"A", b"AAA", b"ABABAB", b"TOBEORNOTTOBEORTOBEORNOT" * 50,
             bytes(10000),                                # deep-match + clears
             bytes(rng.integers(0, 256, 30000, dtype=np.uint8)),   # noisy
             bytes(np.repeat(rng.integers(0, 8, 4000),
                             rng.integers(1, 9, 4000)).astype(np.uint8))]
    for t in range(30):
        n = int(rng.integers(1, 500))
        cases.append(bytes(np.repeat(rng.integers(0, 4, n),
                                     rng.integers(1, 6, n)).astype(np.uint8)))
    for i, c in enumerate(cases):
        le = T._lzw_encode(c)
        assert le == ref_lzw_encode(c), ("lzw", i)
        assert T._lzw_decode(le) == c, ("lzw-rt", i)
        pe = T._packbits_encode(c)
        assert pe == ref_pb_encode(c), ("pb", i)
        assert T._packbits_decode(pe) == c, ("pb-rt", i)


def test_tiff_rotated_gt_model_transformation():
    """Rotated geotransforms round-trip through ModelTransformationTag
    (GeoTIFF §2.6.1 raster→model affine); north-up rasters keep the
    PixelScale+Tiepoint form, and a present transformation tag takes
    priority over PixelScale — GDAL's precedence."""
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    rot = [100.0, 0.3, 0.1, 50.0, -0.05, -0.4]
    out, info = T.decode_tiff(T.encode_tiff(a, gt=rot, epsg=32633))
    assert np.array_equal(out, a)
    assert info["gt"] == rot
    assert info["epsg"] == 32633
    north = [10.0, 0.5, 0.0, 20.0, 0.0, -0.5]
    _, info2 = T.decode_tiff(T.encode_tiff(a, gt=north))
    assert info2["gt"] == north
