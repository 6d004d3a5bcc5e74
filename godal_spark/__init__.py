"""godal_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-creates the operator surface of GDAL as exposed by airbusgeo/godal
(reference at /root/reference, studied for SEMANTICS only — see SURVEY.md)
as idiomatic Spark: DataFrame/SQL logical plans, Arrow-vectorized pandas
UDF stages for pixel math, cell-indexed spatial joins, power-of-two
overview pyramids as tile reduces, and explicit partition/skew handling.

Layout:
  functions/  — pure numpy/stdlib kernels (cell index, geometry, CRS,
                codecs, resampling); no Spark imports, unit-testable.
  operators/  — DataFrame-level operators (tiling, warp, PIP join, kNN,
                stats, polygonize, dedup, similarity, text, multimodal).
  plans/      — physical-planning helpers (skew salting, checkpoint
                lineage, partition layout).
  streaming/  — Structured Streaming operators.
"""

__version__ = "0.1.0"
