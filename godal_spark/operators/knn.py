"""kNN join via cell-ring expansion (north_rule operator; absent in the
reference — godal's closest analogue is Grid's invdistnn neighbor search,
godal.go:4001-4084).

Distributed shape (three tiers, each orders of magnitude smaller):

  1. ring pass — index both sides at one resolution (JVM arithmetic);
     explode each query point to its ring-0..R candidate cells (built-in
     sequence cross), equi-join on cell, distance (codegen),
     `row_number()` top-k.
  2. guaranteed re-probe — the ring top-k is only the TRUE top-k when
     the k-th distance is < R·min(cell_w, cell_h): any point outside the
     (2R+1)² block is at least that far away (the query sits somewhere
     inside its own cell, so every block face is ≥ R cells from it).
     Queries violating the bound re-run the ring pass with per-query
     rings = floor(kth/min_cell)+1 — since adding candidates can only
     shrink the k-th distance, that radius is sufficient, so the
     re-probe result is exact.
  3. brute fallback — queries that found < k candidates in reach (or
     whose re-probe radius exceeds `max_reprobe_rings`) get an exact
     cross-join + window pass. Pathological by construction (k close to
     |P|, or a query in an empty region), so the cross join is tiny.

The ring join's cost is (2R+1)² × |Q| candidate rows BEFORE the join —
explicit and tunable, unlike a cross join's |Q|×|P|. Euclidean degree
metric (consistent with the oracle); swap in haversine via the same
column expression if needed.

`res=None` picks the resolution from point density (like pip.auto_res):
aim for the (2R+1)² ring block to hold ≈ 8k candidates, estimated from
|P| and its bounding box. Too-coarse cells make the ring pass
near-brute-force (the round-1 res=4 configuration probed ~10 % of all
points per query); too-fine cells push every query into the re-probe
tier.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from godal_spark.functions import cellindex

_XSHIFT = 26
_RSHIFT = 52


def _cell_col(res: int):
    return (F.lit(res).cast("long") * F.lit(1 << _RSHIFT).cast("long")
            + F.col("cell_x") * F.lit(1 << _XSHIFT).cast("long") + F.col("cell_y"))


def cell_deg(res: int) -> tuple[float, float]:
    """(cell_w, cell_h) in degrees at resolution `res`."""
    n = 1 << res
    return 360.0 / n, 180.0 / n


def auto_res(points: DataFrame, k: int, rings: int = 2, *,
             lon: str = "lon", lat: str = "lat",
             lo: int = 2, hi: int = 12, target_factor: int = 8) -> int:
    """Resolution from point density: choose res so a query's ring block
    ((2·rings+1)² cells) holds ≈ target_factor·k points, estimating the
    per-cell density from |P| over its bounding-box cell span. One cheap
    metadata agg (count + 4 min/max) — no data collect."""
    st = points.agg(F.count("*").alias("n"),
                    F.min(lon).alias("x0"), F.max(lon).alias("x1"),
                    F.min(lat).alias("y0"), F.max(lat).alias("y1")).first()
    n_pts = st["n"] or 0
    if n_pts == 0:
        return lo
    frac = max(((st["x1"] - st["x0"]) / 360.0) * ((st["y1"] - st["y0"]) / 180.0),
               1e-6)
    block = (2 * rings + 1) ** 2
    # want: block * n_pts / (4^res * frac) ≈ target_factor * k
    want_cells = block * n_pts / (frac * max(target_factor * k, 1))
    res = int(round(math.log(max(want_cells, 1.0), 4)))
    return int(min(hi, max(lo, res)))


def _ring_candidates(q: DataFrame, p: DataFrame, res: int, rings_col,
                     q_id: str, q_lon: str, q_lat: str) -> DataFrame:
    """Explode q to its ring cells (rings_col may be per-row), join on
    cell, compute distance. p must carry (cell, __pid, __plon, __plat)."""
    n = 1 << res
    qx, qy, _ = cellindex.spark_cell_cols(F.col(q_lon), F.col(q_lat), res)
    qq = (q.withColumn("qcx", qx).withColumn("qcy", qy)
          .withColumn("__r", rings_col.cast("int"))
          .withColumn("dx", F.explode(F.sequence(-F.col("__r"), F.col("__r"))))
          .withColumn("dy", F.explode(F.sequence(-F.col("__r"), F.col("__r"))))
          .withColumn("cell_x", F.pmod(F.col("qcx") + F.col("dx"), F.lit(n)).cast("long"))
          .withColumn("cell_y", (F.col("qcy") + F.col("dy")).cast("long"))
          .filter((F.col("cell_y") >= 0) & (F.col("cell_y") < n))
          .withColumn("cell", _cell_col(res))
          .drop("dx", "dy", "qcx", "qcy", "cell_x", "cell_y", "__r"))
    return qq.join(p, "cell").withColumn(
        "dist",
        F.sqrt(F.pow(F.col(q_lon) - F.col("__plon"), 2)
               + F.pow(F.col(q_lat) - F.col("__plat"), 2))).drop("cell")


def _rank_topk(cand: DataFrame, k: int, q_id: str) -> DataFrame:
    w = Window.partitionBy(q_id).orderBy(F.col("dist").asc(), F.col("__pid").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _finalize(ranked: DataFrame, complete_col) -> DataFrame:
    return (ranked.withColumn("complete", complete_col)
            .withColumnRenamed("__pid", "neighbor_id")
            .withColumnRenamed("__plon", "neighbor_lon")
            .withColumnRenamed("__plat", "neighbor_lat"))


def knn_join(queries: DataFrame, points: DataFrame, k: int, *,
             q_id: str, q_lon: str = "lon", q_lat: str = "lat",
             p_id: str, p_lon: str = "lon", p_lat: str = "lat",
             res: int | None = None, rings: int = 2,
             broadcast_points: bool = False,
             guarantee: bool = True, max_reprobe_rings: int = 64) -> DataFrame:
    """Top-k nearest points per query. Output columns: the query's
    columns, neighbor_id/neighbor_lon/neighbor_lat, dist, rank (1-based),
    and `complete`.

    guarantee=True (default): results are the EXACT top-k — queries whose
    ring-pass k-th distance can't be certified (kth ≥ rings·min cell
    size, or fewer than k candidates found) are re-probed at the exact
    radius the observed kth distance requires, falling back to a
    cross-join brute pass for the (pathological) remainder; `complete`
    is then simply `found == k` (false only when k > |P|).

    guarantee=False: single ring pass; `complete` certifies the bound
    (found ≥ k AND kth dist < rings·min(cell_w, cell_h)) — a false flag
    means the top-k may be missing a true neighbor just outside the ring
    block. Round 1 shipped complete = found ≥ k, which wrongly certified
    results whose true k-th neighbor sat outside the scanned block.

    Deterministic: ties broken by (dist, p_id).
    """
    if res is None:
        res = auto_res(points, k, rings, lon=p_lon, lat=p_lat)
    n = 1 << res
    cw, ch = cell_deg(res)
    min_cell = min(cw, ch)
    bound = rings * min_cell

    px, py, pcell = cellindex.spark_cell_cols(F.col(p_lon), F.col(p_lat), res)
    p = points.withColumn("cell", pcell).select(
        "cell", F.col(p_id).alias("__pid"),
        F.col(p_lon).alias("__plon"), F.col(p_lat).alias("__plat"))
    if broadcast_points:
        p = F.broadcast(p)

    cand = _ring_candidates(queries, p, res, F.lit(rings), q_id, q_lon, q_lat)
    # ring cells are distinct, EXCEPT when the ring span wraps the whole
    # longitude range (2*rings+1 >= 2^res): then the pmod wrap aliases
    # cells and the same point appears twice for one query — dedup
    if 2 * rings + 1 >= n:
        cand = cand.dropDuplicates([q_id, "__pid"])
    ranked = _rank_topk(cand, k, q_id)

    if guarantee:
        # the guarantee check below is an ACTION; without materialization
        # the ring pass would run once for the check and again for the
        # caller's action. `ranked` is result-sized (≤ |Q|·k rows).
        ranked = ranked.localCheckpoint(eager=True)
    stats = ranked.groupBy(q_id).agg(F.max("rank").alias("__found"),
                                     F.max("dist").alias("__kth"))
    ok = (F.col("__found") >= k) & (F.col("__kth") < bound)

    if not guarantee:
        out = ranked.join(stats, q_id).withColumn("complete", ok)
        return out.drop("__found", "__kth") \
                  .withColumnRenamed("__pid", "neighbor_id") \
                  .withColumnRenamed("__plon", "neighbor_lon") \
                  .withColumnRenamed("__plat", "neighbor_lat")

    # ---- tier 2/3: certify or re-probe -----------------------------------
    good_ids = stats.filter(ok).select(q_id)
    # bad = bound violated, found < k, or zero candidates (absent from stats)
    bad = queries.join(good_ids, q_id, "left_anti") \
                 .join(stats, q_id, "left")
    # small metadata agg: how bad is the worst violator?
    agg = bad.agg(F.count("*").alias("n"),
                  F.max(F.when(F.col("__found") >= k, F.col("__kth"))).alias("mk"),
                  F.sum(F.when(F.col("__found").isNull() | (F.col("__found") < k), 1)
                        .otherwise(0)).alias("n_under")).first()
    n_bad = agg["n"] or 0
    if n_bad == 0:
        return _finalize(ranked.join(good_ids, q_id, "left_semi"), F.lit(True))

    parts = [_finalize(ranked.join(good_ids, q_id, "left_semi"), F.lit(True))]

    # tier 2: found >= k but bound violated — exact radius from observed kth.
    # kth_true <= kth_observed, and rings2·min_cell > kth_observed, so the
    # widened block provably contains the true top-k.
    reprobe = bad.filter(F.col("__found") >= k) \
                 .withColumn("__r2", F.least(
                     F.lit(max_reprobe_rings),
                     (F.floor(F.col("__kth") / F.lit(min_cell)) + 1).cast("int")))
    # violators whose radius exceeds the cap go to brute instead
    over_cap = F.col("__kth") >= F.lit(max_reprobe_rings * min_cell)
    to_brute = bad.filter(F.col("__found").isNull() | (F.col("__found") < k)
                          | over_cap).drop("__found", "__kth")
    reprobe = reprobe.filter(~over_cap)

    qcols = queries.columns
    rcand = _ring_candidates(reprobe, p, res, F.col("__r2"), q_id, q_lon, q_lat)
    # per-query rings may wrap the grid — always dedup this (small) tier
    rcand = rcand.dropDuplicates([q_id, "__pid"])
    parts.append(_finalize(
        _rank_topk(rcand.drop("__found", "__kth", "__r2"), k, q_id), F.lit(True)))

    # tier 3: brute — exact cross join for the pathological remainder
    pb = points.select(F.col(p_id).alias("__pid"),
                       F.col(p_lon).alias("__plon"), F.col(p_lat).alias("__plat"))
    bcand = (F.broadcast(to_brute.select(*qcols)).crossJoin(pb)
             .withColumn("dist",
                         F.sqrt(F.pow(F.col(q_lon) - F.col("__plon"), 2)
                                + F.pow(F.col(q_lat) - F.col("__plat"), 2))))
    branked = _rank_topk(bcand, k, q_id)
    bstats = branked.groupBy(q_id).agg(F.max("rank").alias("__bf"))
    parts.append(_finalize(
        branked.join(bstats, q_id).withColumn("c", F.col("__bf") >= k)
        .drop("__bf"), F.col("c")).drop("c"))

    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    return out
