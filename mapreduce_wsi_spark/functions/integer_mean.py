"""The reference test workload's per-key integer mean.

Semantics (TestReducer.java:26-38): accumulate sum and count in ``long``,
then emit ``(int)((sum / count) - (sum % count) * 100)`` where ``/`` is
Java truncating integer division. The ``- (sum % count) * 100`` term is a
deliberate tripwire: it is zero only when the division is exact, so any
engine that silently switches to floating-point averaging produces visibly
corrupted results (exactness requirement: EndToEndTest.java:52-54).

Spark mapping: sum/count stay ``long``; truncating division is computed as
``(s - s % n) / n`` in decimal(38,0) so it is exact for sums beyond 2^53
(a ``floor(double)`` formulation would silently lose precision at 100 TB
scale). Everything stays JVM-side inside whole-stage codegen — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def integer_mean_expr(value_col: str | Column) -> Column:
    """Aggregate expression: Java-truncating integer mean with tripwire.

    Use inside ``groupBy(...).agg(integer_mean_expr("v").alias("mean"))``.
    Matches ``(int)((sum/count) - (sum%count)*100)`` of TestReducer.java:26-38
    for non-negative sums (the reference's domain: parsed CSV naturals).
    """
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    v = c.cast("long")
    s = F.sum(v)
    n = F.count(v)
    rem = s % n
    # (s - rem) is divisible by n, so the decimal division is exact at any
    # magnitude; cast back to long drops the .000000 scale.
    quot = ((s - rem).cast("decimal(38,0)") / n).cast("long")
    return (quot - rem * F.lit(100)).cast("int")
