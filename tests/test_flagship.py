"""Flagship pipeline: reference-e2e semantics (SURVEY.md §2 B3->B5) and the
golden-value property from the reference's own test design
(EndToEndTest.java:37-54): a rotating (base+k)%7 input makes every column's
exact integer mean 3, and the tripwire term stays 0 only under exact
integer division.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_wsi_spark.plans.flagship import (
    flagship,
    lineitem_as_csv_lines,
    per_key_integer_mean,
    positional_explode,
)


def test_entry_contract(spark, sf_smoke):
    import __spark_entry__ as entry_mod
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 7
    assert df.columns == ["id", "mean"]


def test_flagship_runs(spark, sf_smoke):
    rows = flagship(spark, sf_smoke).collect()
    assert sorted(r["id"] for r in rows) == list(range(7))


def test_reference_golden_mean_is_exactly_3(spark):
    """Rebuild the reference's synthetic input (EndToEndTest.java:160-191):
    row base gets num_k = (base+k) % 7 -> every column's mean is exactly 3
    and the tripwire contributes 0."""
    n = 7 * 200  # any multiple of 7 preserves the property (EndToEndTest.java:168)
    base = spark.range(n).select(
        F.concat_ws(",", *[((F.col("id") + k) % 7).cast("string")
                           for k in range(7)]).alias("value"))
    out = {r["id"]: r["mean"]
           for r in per_key_integer_mean(positional_explode(base)).collect()}
    assert out == {i: 3 for i in range(7)}


def test_tripwire_corrupts_inexact_division(spark):
    """When division is inexact the -(sum%count)*100 term must fire
    (TestReducer.java:34-37) — guards against a silent avg() regression."""
    df = spark.createDataFrame([("0,1",)], ["value"])  # idx1 mean exact, idx0 exact
    df2 = spark.createDataFrame([("1",), ("2",)], ["value"])  # mean 1.5 -> trips
    out = {r["id"]: r["mean"]
           for r in per_key_integer_mean(positional_explode(df2)).collect()}
    assert out[0] == 1 - 1 * 100  # (3/2=1) - (3%2)*100


def test_csv_serialization_shape(spark, sf_smoke):
    lines = lineitem_as_csv_lines(
        spark.read.parquet(f"{sf_smoke}/lineitem.parquet"))
    row = lines.first()
    assert len(row["value"].split(",")) == 7


def test_reference_e2e_scale_1_4m_rows(spark):
    """The reference's ACTUAL test scale: 1,400,000 rows of the rotating
    (base+k) % 7 pattern (COUNT_INPUT_TUPLES, EndToEndTest.java:81) — every
    column's integer mean must still be exactly 3 with a zero tripwire."""
    n = 1_400_000
    base = spark.range(n).select(
        F.concat_ws(",", *[((F.col("id") + k) % 7).cast("string")
                           for k in range(7)]).alias("value"))
    out = {r["id"]: r["mean"]
           for r in per_key_integer_mean(positional_explode(base)).collect()}
    assert out == {i: 3 for i in range(7)}
