"""Façade API: Open/Read layout contracts, BuildVRT, ExecuteSQL."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from godal_spark import datagen, dataset as DS
from godal_spark.functions import geom as G
from godal_spark.operators import tiling


@pytest.fixture(scope="module")
def catalog(spark):
    rows = [
        datagen.image_row("const3", datagen.pixels_const3(20, 10), "raw8"),
        datagen.image_row("maxxy", datagen.pixels_maxxy(10, 10), "raw8"),
        datagen.image_row("ramp", datagen.pixels_ramp(10, 10), "raw8",
                          gt=[45, 1, 0, 35, 0, -1]),
    ]
    return DS.RasterCatalog(spark, datagen.images_df(spark, rows), block=32)


def test_open_missing_errors(catalog):
    with pytest.raises(KeyError):
        catalog.open("nope")


def test_structure_and_bounds(catalog):
    ds = catalog.open("ramp")
    st = ds.structure
    assert (st["w"], st["h"], st["nbands"]) == (10, 10, 1)
    # test.tif analog bounds golden [45,25,55,35] (godal_test.go:490-500)
    assert ds.bounds() == (45.0, 25.0, 55.0, 35.0)


def test_read_pixel_vs_band_interleave(catalog):
    # const3: bands 0/10/20 (TestDatasetRead godal_test.go:704-751)
    ds = catalog.open("const3")
    px = ds.read(interleave="pixel")
    assert px.shape == (10, 20, 3)
    assert px[0, 0].tolist() == [0, 10, 20]
    bd = ds.read(interleave="band")
    assert bd.shape == (3, 10, 20)
    assert [int(bd[b, 0, 0]) for b in range(3)] == [0, 10, 20]
    # band subset (options.go:697-717: 0-indexed API)
    sub = ds.read(bands=[2, 0], interleave="band")
    assert [int(sub[b, 0, 0]) for b in range(2)] == [20, 0]


def test_read_cast_and_window(catalog):
    # CastedIO golden analog (godal_test.go:753-778): implicit cast on read
    ds = catalog.open("maxxy")
    got = ds.read(2, 3, 4, 4, dtype=np.float64)
    assert got.dtype == np.float64
    exp = np.maximum(*np.mgrid[0:10, 0:10][::-1])[3:7, 2:6]
    assert np.array_equal(got, exp)


def test_read_resampled(catalog):
    # window 3x3 → 1x1 bilinear = 14 (godal_test.go:2108-2140)
    ds = catalog.open("ramp")
    assert ds.read(0, 0, 3, 3, out_w=1, out_h=1, resampling="bilinear")[0, 0] == 14
    assert ds.read(0, 0, 3, 3, out_w=1, out_h=1, resampling="nearest")[0, 0] == 11


def test_statistics_and_histogram_via_facade(catalog):
    ds = catalog.open("ramp")
    _, ok = ds.get_statistics()
    assert not ok
    st = ds.compute_statistics()
    assert st.min == 0.0 and st.max == 99.0
    st2, ok2 = ds.get_statistics()
    assert ok2 and st2.mean == st.mean
    ds.clear_statistics()
    _, ok3 = ds.get_statistics()
    assert not ok3
    h = ds.histogram(buckets=10, vmin=-0.5, vmax=99.5)
    assert h.counts.sum() == 100 and h.counts[0] == 10


def test_translate_via_facade(catalog):
    out = catalog.open("ramp").translate(["-outsize", "200%", "200%"])
    assert out.structure["w"] == 20 and out.structure["h"] == 20


def test_polygonize_via_facade(spark):
    images = datagen.images_df(spark, [datagen.image_row("diag", datagen.pixels_diag(8), "raw8")])
    cat = DS.RasterCatalog(spark, images, block=256)
    feats = cat.open("diag").polygonize()
    assert feats.count() == 10
    feats8 = cat.open("diag").polygonize(eight=True)
    assert feats8.count() == 2


def test_build_vrt_priority(spark):
    a = datagen.images_df(spark, [datagen.image_row("x", np.full((4, 4), 1, np.uint8), "raw8")])
    b = datagen.images_df(spark, [datagen.image_row("x", np.full((4, 4), 9, np.uint8), "raw8")])
    ta = tiling.explode_tiles(a, bw=4, bh=4)
    tb = tiling.explode_tiles(b, bw=4, bh=4)
    v = DS.build_vrt([ta, tb])
    rows = v.collect()
    assert len(rows) == 1  # later source wins the colliding block
    assert np.frombuffer(rows[0].payload, np.uint8)[0] == 9


def test_execute_sql_goldens(spark):
    # godal_test.go:2562-2634: SELECT 1; SELECT * (2 rows); + spatial filter → 1
    fps = datagen.canonical_footprints(spark)
    out = DS.execute_sql(spark, "SELECT 1 AS one")
    assert out.first().one == 1
    two = fps.limit(1).unionByName(
        spark.createDataFrame(
            [(9, G.to_wkb(G.box(10, 10, 11, 11)), "far", "EPSG:4326")],
            fps.schema))
    all_rows = DS.execute_sql(spark, "SELECT * FROM test", layers={"test": two})
    assert all_rows.count() == 2
    flt = G.to_wkb(G.buffer(G.point(100.5, 0.5), 0.1))
    filtered = DS.execute_sql(spark, "SELECT * FROM test", layers={"test": two},
                              spatial_filter=flt)
    assert filtered.count() == 1


def test_sieve_filter_tiles_via_facade(spark):
    """Distributed sieve through the Dataset facade == the in-memory
    sieve_filter kernel on the same dataset."""
    arr = np.zeros((16, 16), dtype=np.uint8)
    arr[2, 2] = 9          # 1-px speck
    arr[5:9, 5:12] = 7     # large region
    images = datagen.images_df(spark, [datagen.image_row("sv", arr, "raw8")])
    cat = DS.RasterCatalog(spark, images, block=8)
    ds = cat.open("sv")
    want = ds.sieve_filter(3)
    tiles = ds.sieve_filter_tiles(3).collect()
    got = np.zeros_like(arr)
    for t in tiles:
        got[t.y0:t.y0 + t.bh, t.x0:t.x0 + t.bw] = \
            np.frombuffer(t.payload, np.uint8).reshape(t.bh, t.bw)
    assert np.array_equal(got, want)
    assert got[2, 2] == 0 and (got[5:9, 5:12] == 7).all()


def test_set_scale_offset_golden(catalog):
    """godal_test.go:569-589: set (100, 100) on a band, Structure reads
    them back; clear resets to the (1.0, 0.0) identity."""
    ds = catalog.open("ramp")
    ds.set_scale_offset(0, 100, 100)
    assert ds.scale_offset(0) == (100.0, 100.0)
    assert ds.structure["scale"] == 100.0 and ds.structure["offset"] == 100.0
    # unscaling convention: physical = raw * scale + offset
    phys = ds.apply_scale_offset(0)
    raw = ds.read().astype(np.float64)
    raw = raw if raw.ndim == 2 else raw[:, :, 0]
    assert np.allclose(phys, raw * 100 + 100)
    ds.clear_scale_offset(0)
    assert ds.scale_offset(0) == (1.0, 0.0)
    assert ds.structure["scale"] == 1.0 and ds.structure["offset"] == 0.0


def test_mask_band_surface(spark):
    """Mask-band facade parity (godal.go:250-296): default flags 0x01
    on a fresh band (godal_test.go:1196), CreateMaskBand(0x02) flips
    MaskFlags to 0x02 (1199-1206), Band.CreateMask(0x00) to 0x00
    (1226-1233); a nodata value implies GMF_NODATA and a nodata-derived
    0/255 mask; the written diagonal mask drives polygonize_array to
    the reference's 2-poly golden (godal_test.go:2218-2238)."""
    import numpy as np

    from godal_spark import datagen, dataset as DS
    from godal_spark.operators.polygonize import polygonize_array

    arr = np.full((8, 8), 1, np.uint8)
    cat = DS.RasterCatalog(spark, datagen.images_df(
        spark, [datagen.image_row("m", arr, "raw8")]), block=8)
    ds = cat.open("m")
    assert ds.mask_flags() == 0x01
    assert ds.mask_band().min() == 255            # all-valid default

    ds.create_mask_band(0x02)
    assert ds.mask_flags() == 0x02
    m = ds.create_mask(0x00, band=0)              # band mask wins
    assert ds.mask_flags() == 0x00
    assert m.shape == (8, 8) and m.min() == 255   # unwritten = all valid

    # reference polygonize-with-mask golden: diagonal invalid -> the
    # uniform image splits into exactly 2 polygons
    diag = np.full((8, 8), 255, np.uint8)
    np.fill_diagonal(diag, 0)
    ds.write_mask(diag)
    feats = polygonize_array(ds._decode(), valid=ds.mask_band() != 0)
    assert len(feats) == 2, [f[:2] for f in feats]

    # nodata-derived mask path
    ds2 = cat.open("m")
    ds2._row = dict(ds2._row.asDict()) if hasattr(ds2._row, "asDict") else \
        dict(ds2._row)
    ds2._row["nodata"] = 1.0
    assert ds2.mask_flags() == 0x08
    assert int(ds2.mask_band().max()) == 0        # whole image == nodata

    import pytest
    with pytest.raises(ValueError, match="no mask created"):
        cat.open("m").write_mask(diag)
