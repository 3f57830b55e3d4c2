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


# log10(1 + 1/d) for d = 1..9 in integer nanos — Benford's-law first-
# digit probabilities as engine-portable plan constants (truncated, the
# FS-weights convention)
BENFORD_P_NANOS = (301029995, 176091259, 124938736, 96910013, 79181246,
                   66946789, 57991946, 51152522, 45757490)


def benford_first_digit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of a positive
    numeric column — the classic fabricated-data / unit-mixing smell
    test for financial columns: observed count per leading digit vs
    the log10(1 + 1/d) expectation, with the chi-square contribution
    per digit. First digit extracted EXACTLY as the first character of
    the integer part's decimal string (no float log10 — values must be
    >= 1). exp_nanos = n * p_nanos stays a BIGINT product; the chi2
    term is derived from those exact integers by one fixed IEEE
    expression, 9dp-rounded, so engines agree bit-for-bit. One
    aggregation pass; 9 output rows."""
    d = F.substring(F.floor(F.col(value_col)).cast("string"), 1, 1) \
         .cast("int")
    obs = (df.filter(F.col(value_col) >= 1)
           .groupBy(d.alias("digit"))
           .agg(F.count(F.lit(1)).alias("n_obs")))
    total = obs.agg(F.sum("n_obs").alias("__n"))
    digits = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit"),
        F.element_at(F.array(*[F.lit(p) for p in BENFORD_P_NANOS]),
                     F.col("id").cast("int")).cast("long")
        .alias("p_nanos"))
    out = (digits.join(obs, "digit", "left")
           .select("digit",
                   F.coalesce("n_obs", F.lit(0)).cast("long")
                   .alias("n_obs"), "p_nanos")
           .crossJoin(F.broadcast(total)))
    exp_nanos = (F.col("__n") * F.col("p_nanos")).cast("long")
    diff = (F.col("n_obs") * F.lit(1_000_000_000).cast("long")
            - exp_nanos).cast("double") / 1e9
    chi2 = diff * diff / (exp_nanos.cast("double") / 1e9)
    return out.select(
        "digit", "n_obs", exp_nanos.alias("exp_nanos"),
        F.round(chi2, 9).alias("chi2_term")).orderBy("digit")


def k_anonymity_audit(df: DataFrame, quasi_cols: list[str],
                      k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple: every record
    must share its quasi-identifier combination with >= k-1 others or
    it is re-identifiable — the release gate a privacy review runs
    before a dataset leaves the trust boundary.

    One aggregation to the equivalence-class table (quasi tuple ->
    size), then a 1-row summary: class counts, the minimum class size
    (the dataset's actual k), how many RECORDS sit in sub-k classes
    (the suppression set a k-anonymizer would drop or generalize),
    and the suppression rate in exact ppm (integer division — no
    float ratios to disagree on). Scale: the only shuffle is the
    quasi-key groupBy; the summary aggregates the class table, which
    is bounded by the quasi-key cardinality, not the row count.
    """
    classes = (df.groupBy(*quasi_cols)
               .agg(F.count(F.lit(1)).alias("__n")))
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("__n").alias("min_class_size"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .alias("n_suppressed_rows"),
        F.sum("__n").alias("n_rows")).select(
        "n_classes", "min_class_size",
        F.col("n_suppressed_rows").cast("long")
        .alias("n_suppressed_rows"),
        F.expr("n_suppressed_rows * 1000000L div n_rows")
        .alias("suppression_ppm"),
        (F.col("min_class_size") >= k).alias("is_k_anonymous"))
