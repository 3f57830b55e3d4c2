"""Driver-canon output-envelope regression tests.

Round 8 produced the repo's first driver-red rows since round 1, and
both were ENVELOPE defects, not wrong answers (VERDICT r8 "What's
wrong" #1/#2): the driver's pandas-based canonicalization dies on raw
array cells (``sort_values`` -> TypeError: unhashable type: 'list' —
the exact ``array_funcs2`` traceback preserved in
CORRECTNESS_r08.json) and silently degrades int/Decimal magnitudes
beyond float64's exact 2^53 range (``mm_audio_goertzel``'s
DECIMAL(38,0) energies ~1e29 hash-diverged on bit-identical rows).
The local parity gate canonicalized both happily — it was MORE
permissive than the driver it mirrors, so 1089 green local tests
over-promised.

These tests pin the fix: ``plans/parity.py::envelope_violations`` now
runs inside ``compare`` (so the full-catalog oracle replay in
test_oracle_parity.py enforces the envelope catalog-wide), and the
r8 forms of both red entries are reproduced here in miniature and
MUST fail the gate while the shipped (fixed) forms pass.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from mapreduce_wsi_spark.plans.parity import compare, duckdb_connection

pytestmark = pytest.mark.driver_gate


@pytest.fixture(scope="module")
def duck(sf_oracle):
    con = duckdb_connection(sf_oracle)
    yield con
    con.close()


def test_raw_array_column_fails_envelope(spark, duck):
    """The r8 form of array_funcs2 in miniature: a raw array<bigint>
    output column must be rejected even when both sides agree — the
    driver's pandas canon cannot sort list cells."""
    df = spark.range(1).select(
        F.sequence(F.lit(1), F.lit(3)).alias("seq"))
    res = compare("synthetic_raw_array", df, duck,
                  "SELECT generate_series(1, 3) AS seq")
    assert not res.ok
    assert "driver-envelope violation" in res.detail
    assert "container-typed" in res.detail


def test_joined_array_passes_envelope(spark, duck):
    """The fixed form: the same array, shipped as a ','-joined string,
    is inside the envelope and value-matches."""
    df = spark.range(1).select(
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(3)),
                        lambda x: x.cast("string")), ",").alias("seq"))
    res = compare("synthetic_joined_array", df, duck,
                  "SELECT array_to_string(generate_series(1, 3), ',')"
                  " AS seq")
    assert res.ok, res.detail


def test_decimal_beyond_2_53_fails_envelope(spark, duck):
    """The r8 form of mm_audio_goertzel in miniature: a DECIMAL(38,0)
    cell ~1e29 — far beyond float64's exact 2^53 range — must be
    rejected even though the values are bit-identical (the driver
    hash-diverged on exactly this class)."""
    big = Decimal(10) ** 29
    df = spark.createDataFrame([(big,)], "e decimal(38,0)")
    res = compare(
        "synthetic_wide_decimal", df, duck,
        "SELECT CAST(100000000000000000000000000000 AS DECIMAL(38,0))"
        " AS e")
    assert not res.ok
    assert "driver-envelope violation" in res.detail
    assert "exceeds float64's exact range" in res.detail


def test_wide_decimal_as_digit_string_passes_envelope(spark, duck):
    """The fixed form: the same ~1e29 value as a digit string."""
    df = spark.createDataFrame([(Decimal(10) ** 29,)],
                               "e decimal(38,0)").select(
        F.col("e").cast("string").alias("e_str"))
    res = compare(
        "synthetic_wide_decimal_str", df, duck,
        "SELECT CAST(CAST(100000000000000000000000000000"
        " AS DECIMAL(38,0)) AS VARCHAR) AS e_str")
    assert res.ok, res.detail


def test_bigint_beyond_2_53_fails_envelope(spark, duck):
    """int64 is NOT exempt: an int cell past 2^53 rides the same
    pandas float64 coercion risk (e.g. nullable int64 -> float64), so
    the envelope flags it on either side."""
    df = spark.range(1).select(
        F.lit(2 ** 53).cast("bigint").alias("n"))
    res = compare("synthetic_wide_bigint", df, duck,
                  "SELECT CAST(9007199254740992 AS BIGINT) AS n")
    assert not res.ok
    assert "exceeds float64's exact range" in res.detail


def test_boundary_bigint_passes_envelope(spark, duck):
    """2^53 - 1 is the last exactly-representable integer — inside."""
    df = spark.range(1).select(
        F.lit(2 ** 53 - 1).cast("bigint").alias("n"))
    res = compare("synthetic_boundary_bigint", df, duck,
                  "SELECT CAST(9007199254740991 AS BIGINT) AS n")
    assert res.ok, res.detail


def test_floats_are_exempt_from_magnitude_rule(spark, duck):
    """Doubles are float64 end-to-end on both engines — no coercion
    step exists to degrade them, so magnitude does not apply."""
    df = spark.range(1).select(F.lit(1.0e120).alias("x"))
    res = compare("synthetic_huge_double", df, duck,
                  "SELECT CAST(1.0e120 AS DOUBLE) AS x")
    assert res.ok, res.detail


def test_zero_row_duckdb_container_fails_envelope(spark, duck):
    """ADVICE r9: the DuckDB-side container check must be TYPE-level,
    not cell-level — a zero-row oracle result with a LIST column has no
    cells to inspect, but the driver's pandas canon still dies on the
    dtype. Both sides are empty and column-compatible here; only the
    Arrow-schema check can reject it."""
    df = (spark.range(1).filter(F.lit(False))
          .select(F.array(F.lit(1)).alias("seq")))
    res = compare("synthetic_empty_duck_list", df, duck,
                  "SELECT [1] AS seq WHERE FALSE")
    assert not res.ok
    assert "container-typed" in res.detail
    # and specifically the DuckDB side must be named even though the
    # Spark side (also container-typed here) fires first in the list
    df2 = (spark.range(1).filter(F.lit(False))
           .select(F.lit("x").alias("seq")))
    res2 = compare("synthetic_empty_duck_list_only", df2, duck,
                   "SELECT [1] AS seq WHERE FALSE")
    assert not res2.ok
    assert "duckdb column 'seq' is container-typed" in res2.detail


def test_fixed_catalog_entries_pass_the_gate(spark, sf_oracle, duck):
    """The two r8 reds, in their fixed shipped forms, pass the
    now-stricter local gate end-to-end at the oracle scale."""
    from mapreduce_wsi_spark.plans.registry import load_catalog

    catalog = load_catalog()
    for name in ("array_funcs2", "mm_audio_goertzel"):
        entry = catalog[name]
        res = compare(name, entry.fn(spark, sf_oracle), duck,
                      entry.oracle)
        assert res.ok, f"{name}: {res.detail}"
