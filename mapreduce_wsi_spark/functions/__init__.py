"""Engine scalar/aggregate function helpers.

Mostly thin re-exports of ``pyspark.sql.functions`` (JVM-side, codegen'd —
the fast path); plus the reference workload's exact-integer-arithmetic
aggregate (TestReducer.java:26-38), which Spark's ``avg`` cannot replicate
(double division vs Java truncating long division).
"""

from mapreduce_wsi_spark.functions.integer_mean import integer_mean_expr

__all__ = ["integer_mean_expr"]
