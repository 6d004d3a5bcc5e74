"""Cell-indexed point-in-polygon join — the engine's headline operator.

Reference semantics: SpatialFilter / Intersects (godal.go:3450-3456,
2800-2811) — a bbox prefilter plus exact GEOS test. The engine's
distributed form (north_star):

  1. index the point side with a JVM-computed cell id (codegen, no
     Python) — `with_point_cells`;
  2. explode the polygon side to every cell its bbox covers — WKB→bbox
     is one Arrow-batched UDF, the cell explode itself is built-in
     sequence arithmetic — `explode_footprint_cells`;
  3. equi-join on `cell` (Catalyst picks broadcast/SMJ; pass
     broadcast_footprints=True for small dims);
  4. exact refine with a vectorized ray-cast over Arrow batches,
     geometries parsed once per batch (`Prepared` = the broadcast
     prepared-geometry analogue).

Scale notes:
  * the cell id is the ONLY shuffle key; resolution picks the
    candidate-set size (auto-picked from median footprint size);
  * hot cells (dense urban) are handled by salting the points side and
    replicating the polygon side S ways — see plans/skew.salted_join —
    plus AQE skew-join as backstop;
  * the refine stage is a narrow map after the join — no second shuffle.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from godal_spark.functions import cellindex
from godal_spark.functions import geom as G

_XSHIFT = 26
_RSHIFT = 52


def with_point_cells(df: DataFrame, lon: str = "lon", lat: str = "lat",
                     res: int = 12) -> DataFrame:
    """Adds cell_x, cell_y, cell — pure built-ins (whole-stage codegen)."""
    x, y, cell = cellindex.spark_cell_cols(F.col(lon), F.col(lat), res)
    return df.withColumn("cell_x", x).withColumn("cell_y", y).withColumn("cell", cell)


_BBOX_SCHEMA = T.StructType([
    T.StructField("minx", T.DoubleType()), T.StructField("miny", T.DoubleType()),
    T.StructField("maxx", T.DoubleType()), T.StructField("maxy", T.DoubleType()),
    T.StructField("is_rect", T.BooleanType()),
])


def _geom_is_rect(g: G.Geom) -> bool:
    """True iff the geometry IS its envelope (axis-aligned rectangle) —
    then the bbox test is exact and the ray-cast refine can be skipped
    JVM-side (OGR does the same for envelope filters,
    reference godal.go:2797-2799 bbox short-circuit)."""
    polys = g.polygons()
    if len(polys) != 1 or len(polys[0]) != 1:
        return False
    r = polys[0][0]
    if len(r) != 5:
        return False
    minx, miny, maxx, maxy = g.bounds()
    corners = {(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)}
    return {(float(p[0]), float(p[1])) for p in r[:-1]} == corners


@F.pandas_udf(_BBOX_SCHEMA)
def wkb_bbox(wkb: pd.Series) -> pd.DataFrame:
    out = {"minx": [], "miny": [], "maxx": [], "maxy": [], "is_rect": []}
    for buf in wkb:
        g = G.from_wkb(bytes(buf))
        b = g.bounds()
        out["minx"].append(b[0])
        out["miny"].append(b[1])
        out["maxx"].append(b[2])
        out["maxy"].append(b[3])
        out["is_rect"].append(_geom_is_rect(g))
    return pd.DataFrame(out)


def with_bbox(df: DataFrame, wkb_col: str = "geometry") -> DataFrame:
    b = wkb_bbox(F.col(wkb_col))
    return (df.withColumn("minx", b["minx"]).withColumn("miny", b["miny"])
              .withColumn("maxx", b["maxx"]).withColumn("maxy", b["maxy"])
              .withColumn("is_rect", b["is_rect"]))


def explode_footprint_cells(df: DataFrame, res: int = 12,
                            bbox_cols=("minx", "miny", "maxx", "maxy")) -> DataFrame:
    """One row per (footprint, covered cell). Requires bbox columns —
    compute once with with_bbox (or store them in the table; at 10^12
    scale bbox is a write-once generated column)."""
    minx, miny, maxx, maxy = [F.col(c) for c in bbox_cols]
    n = 1 << res
    def idx(v, lo, span):
        return F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor((v - lo) / span * n))).cast("long")
    x0 = idx(minx, -180.0, 360.0)
    x1 = idx(maxx, -180.0, 360.0)
    y0 = idx(miny, -90.0, 180.0)
    y1 = idx(maxy, -90.0, 180.0)
    df = (df.withColumn("cell_x", F.explode(F.sequence(x0, x1)))
            .withColumn("cell_y", F.explode(F.sequence(y0, y1))))
    cell = (F.lit(res).cast("long") * F.lit(1 << _RSHIFT).cast("long")
            + F.col("cell_x") * F.lit(1 << _XSHIFT).cast("long") + F.col("cell_y"))
    return df.withColumn("cell", cell)


@F.pandas_udf(T.BooleanType())
def st_contains_point(wkb: pd.Series, px: pd.Series, py: pd.Series) -> pd.Series:
    """Vectorized exact refine; parse each distinct geometry once per batch
    (the Arrow-batch analogue of a prepared geometry). NULL geometry rows
    return False cheaply — the single-pass refine filter below routes
    rectangle rows (whose geometry blob is nulled out of the broadcast)
    through the `is_rect` disjunct, never through the ray cast."""
    out = np.zeros(len(wkb), dtype=bool)
    px_np = px.to_numpy(dtype=np.float64)
    py_np = py.to_numpy(dtype=np.float64)
    cache: dict[bytes, G.Prepared] = {}
    # group rows by geometry so each polygon does ONE vectorized ray cast
    codes, uniques = pd.factorize(
        wkb.map(lambda b: bytes(b) if b is not None else None))
    for gi, buf in enumerate(uniques):
        if buf is None:
            continue
        prep = cache.get(buf)
        if prep is None:
            prep = cache[buf] = G.Prepared(G.from_wkb(buf))
        mask = codes == gi
        out[mask] = prep.contains_points(px_np[mask], py_np[mask])
    return pd.Series(out)


def auto_res(footprints: DataFrame, *, geometry: str = "geometry",
             lo: int = 6, hi: int = 14) -> int:
    """Pick the join cell resolution from the median footprint width:
    cells ≈ 2× the median footprint keep the per-cell candidate set near
    its minimum — too-coarse cells blow up hot-cell candidates (measured
    5× wall difference between res 9 and 11 on the skewed bench set),
    too-fine cells blow up the footprint-side explode."""
    df = footprints
    if "minx" not in df.columns:
        df = with_bbox(df, geometry)
    med = df.selectExpr(
        "percentile_approx(greatest(maxx - minx, maxy - miny), 0.5) as m").first()["m"]
    if not med or med <= 0:
        return hi
    from godal_spark.functions.cellindex import res_for_cell_deg

    return int(min(hi, max(lo, res_for_cell_deg(2.0 * float(med)))))


def pip_join(points: DataFrame, footprints: DataFrame, *,
             lon: str = "lon", lat: str = "lat",
             geometry: str = "geometry", res: int = 12,
             broadcast_footprints: bool = False,
             salt: int = 0, salt_by: str | None = None,
             how: str = "inner") -> DataFrame:
    """Join point rows to the footprints that contain them.

    Output: point columns + footprint columns for every containing pair.
    salt > 1 activates explicit hot-cell salting for the shuffle-join
    path (dense urban footprints — north_rule): the points side salts
    S ways, the footprint side replicates S ways. Ignored under
    broadcast (a broadcast join has no per-key reducer to overload).
    """
    pts = with_point_cells(points, lon, lat, res)
    fps = footprints
    if not set(("minx", "miny", "maxx", "maxy")) <= set(fps.columns):
        fps = with_bbox(fps, geometry)
    fps = explode_footprint_cells(fps, res).drop("cell_x", "cell_y")

    def refine(joined: DataFrame) -> DataFrame:
        # cheap bbox refine first (codegen), exact ray cast second
        # (Arrow), non-rect rows only. Round-6 measured the single-pass
        # alternative (`is_rect OR ray_cast`, one join execution, every
        # joined row crossing Arrow with nulled rect geometry) and it
        # LOST on rectangle-heavy footprint sets — 0.89 s vs 1.00 s at
        # 150k points and 1.29 s vs 1.41 s on the 1.5M-pair headline
        # join, interleaved trials — because the duplicated broadcast
        # probe is cheaper than shipping every row through Python. The
        # two-branch split stays; it is also the reference's bbox
        # short-circuit shape (godal.go:2797-2799).
        joined = joined.filter(
            (F.col(lon) >= F.col("minx")) & (F.col(lon) <= F.col("maxx"))
            & (F.col(lat) >= F.col("miny")) & (F.col(lat) <= F.col("maxy")))
        exact = st_contains_point(F.col(geometry), F.col(lon), F.col(lat))
        if "is_rect" in joined.columns:
            rect = joined.filter(F.col("is_rect"))
            other = joined.filter(~F.col("is_rect")).filter(exact)
            return rect.unionByName(other)
        return joined.filter(exact)

    if salt > 1 and not broadcast_footprints:
        from godal_spark.plans.skew import salted_join

        joined = salted_join(pts.drop("cell_x", "cell_y"), fps, on="cell",
                             salt=salt, how=how, salt_by=salt_by)
        return refine(joined)
    if "is_rect" in fps.columns:
        # rect rows never reach the exact refine — null their geometry
        # blob so the broadcast ships only bboxes for them (cuts the
        # broadcast build, the join's main constant cost, by ~70% on
        # rectangle-heavy footprint sets)
        fps = fps.withColumn(
            geometry, F.when(F.col("is_rect"), F.lit(None)).otherwise(F.col(geometry)))
    if broadcast_footprints:
        fps = F.broadcast(fps)
    return refine(pts.drop("cell_x", "cell_y").join(fps, "cell", how))


def spatial_filter(layer: DataFrame, filter_wkb: bytes, *,
                   geometry: str = "geometry", res: int = 8) -> DataFrame:
    """ExecuteSQL's SpatialFilter (godal.go:3450-3456): keep features
    whose geometry intersects the literal filter geometry. The filter is
    a driver-side literal → broadcast implicitly as a UDF constant; the
    candidate prefilter is a bbox test on generated columns (codegen)."""
    fg = G.from_wkb(filter_wkb)
    fminx, fminy, fmaxx, fmaxy = fg.bounds()
    df = layer
    if not set(("minx", "miny", "maxx", "maxy")) <= set(df.columns):
        df = with_bbox(df, geometry)
    df = df.filter((F.col("maxx") >= fminx) & (F.col("minx") <= fmaxx)
                   & (F.col("maxy") >= fminy) & (F.col("miny") <= fmaxy))

    @F.pandas_udf(T.BooleanType())
    def exact(wkb: pd.Series) -> pd.Series:
        return pd.Series([G.intersects(G.from_wkb(bytes(b)), fg) for b in wkb])

    return df.filter(exact(F.col(geometry)))
