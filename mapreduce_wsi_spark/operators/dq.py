"""Data-quality profiling (Deequ/DataProfiler-shape): one-pass per-table
column profiles — the "what is in this table" primitive that gates a
100 TB ingest before anything joins against it.

Complements the existing DQ surface: dq_constraints (rule violations,
plans/q_extras.py) checks declared expectations; profile_columns derives
the facts those expectations come from.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# spec: column name -> (native value column, canonical-string cast applied
# AFTER the min/max aggregation). Min/max aggregate on the NATIVE type
# (string min of an int column would rank '10' < '9'), only the display
# form is stringified — with explicit casts (decimal for doubles, date
# for timestamps) so the rendering is engine-portable, not locale/format
# luck.
ProfileSpec = dict[str, tuple[Column, Callable[[Column], Column]]]


def profile_columns(df: DataFrame, spec: ProfileSpec) -> DataFrame:
    """One row per profiled column: ``(col_name, n_rows, n_null,
    n_distinct, min_str, max_str)``.

    Single aggregation pass: all per-column aggregates run in ONE job
    (Catalyst plans the multi-count-distinct via one Expand — cost grows
    with the number of profiled columns, not with extra table scans),
    then the 1-row result unpivots via ``stack`` into the row-per-column
    shape. No second scan, no driver-side loop over columns.
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for name, (c, _) in spec.items():
        aggs += [
            F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("bigint")
            .alias(f"__null_{name}"),
            F.count_distinct(c).cast("bigint").alias(f"__nd_{name}"),
            F.min(c).alias(f"__min_{name}"),
            F.max(c).alias(f"__max_{name}"),
        ]
    row = df.agg(*aggs)
    shaped = row.select(
        F.col("__n"),
        *[x for name, (_, to_str) in spec.items()
          for x in (F.col(f"__null_{name}"), F.col(f"__nd_{name}"),
                    to_str(F.col(f"__min_{name}")).alias(f"__mins_{name}"),
                    to_str(F.col(f"__max_{name}")).alias(f"__maxs_{name}"))])
    stack_args = ", ".join(
        f"'{name}', __null_{name}, __nd_{name}, __mins_{name}, __maxs_{name}"
        for name in spec)
    return shaped.selectExpr(
        f"stack({len(spec)}, {stack_args}) AS "
        "(col_name, n_null, n_distinct, min_str, max_str)",
        "__n AS n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct",
             "min_str", "max_str")
