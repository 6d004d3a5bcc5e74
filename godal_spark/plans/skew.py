"""Explicit skew handling for hot cells (north_rule requirement).

Dense urban footprints concentrate on a few cell ids; a plain equi-join
on `cell` then puts one reducer on the hot key. Two engine-level levers
(SURVEY.md §4 custom rule 1) on top of AQE's runtime skew-join backstop:

  * salted_join — salt the large (points/tiles) side S ways
    (`pmod(hash(row), S)`), replicate the small (footprints) side S ways
    with a built-in explode, join on (cell, salt). Deterministic result,
    S× small-side duplication, hot reducer split S ways.
  * range_repartition_tiles — range-partition tile writes by
    (cell-prefix, level) so output files stay balanced and reads
    partition-prune on cell prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(large: DataFrame, small: DataFrame, on: str = "cell",
                salt: int = 8, how: str = "inner",
                salt_by: str | None = None) -> DataFrame:
    """Equi-join on `on` with an S-way salt.

    salt_by: column of `large` whose hash spreads the salt (defaults to a
    random-ish deterministic mix of all join-side values via
    monotonically-increasing id is NOT used — nondeterministic across
    retries; callers pass a stable id column).
    """
    if salt <= 1:
        return large.join(small, on, how)
    key = F.col(salt_by) if salt_by else F.spark_partition_id()
    lg = large.withColumn("__salt", F.pmod(F.hash(key), F.lit(salt)).cast("int"))
    sm = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return lg.join(sm, [on, "__salt"], how).drop("__salt")


def range_repartition_tiles(tiles: DataFrame, num_partitions: int,
                            prefix_bits: int = 12) -> DataFrame:
    """Range-repartition tile rows by (cell prefix, level, block ids) —
    the write layout that keeps one image's blocks together (COG sort
    order analogue, cogify/cogify-main.go:59-157) while bounding any one
    partition's share of a hot cell."""
    pref = F.shiftright(F.col("cell"), 52 - prefix_bits) if "cell" in tiles.columns else F.lit(0)
    return tiles.repartitionByRange(
        num_partitions, pref, F.col("image_id"), F.col("level"),
        F.col("block_y"), F.col("block_x"))
