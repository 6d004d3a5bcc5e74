"""Pure numpy/stdlib kernels — no Spark imports here.

Everything in this package is deterministic and unit-testable without a
SparkSession; the operators/ layer wraps these into DataFrame stages.
"""
