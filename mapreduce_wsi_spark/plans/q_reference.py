"""Reference-fidelity queries: the flagship e2e pipeline (SURVEY.md §2 B3-B5),
in both the native-JVM form and the Arrow-batched pandas dataflow form."""

from __future__ import annotations

from mapreduce_wsi_spark.plans.flagship import (
    flagship,
    flagship_oracle_sql,
    lineitem_as_csv_lines,
)
from mapreduce_wsi_spark.plans.registry import register, tbl

register(
    "flagship_integer_mean",
    oracle=flagship_oracle_sql(),
    note="reference e2e workload: CSV serialize -> positional explode -> "
         "exact integer mean with tripwire (TestMapper.java:23-45, "
         "TestReducer.java:26-38)",
)(flagship)


def _map_parse(batches):
    """Map stage as pandas batches: parse CSV line -> (idx, v) pairs
    (TestMapper.java:23-45 semantics, Arrow transfer instead of text pipes).
    """
    import pandas as pd

    for pdf in batches:
        ex = pdf["value"].str.split(",").explode()
        yield pd.DataFrame({
            "idx": ex.groupby(level=0).cumcount().astype("int32"),
            "v": ex.str.strip().astype("int64"),
        })


def _reduce_mean(pdf):
    """Reduce stage per key: exact integer mean + tripwire
    (TestReducer.java:26-38). Python ``//`` floors where Java ``/``
    truncates — identical on this non-negative domain."""
    import pandas as pd

    s, n = int(pdf["v"].sum()), len(pdf)
    return pd.DataFrame({"id": [int(pdf["idx"].iloc[0])],
                         "mean": [(s // n) - (s % n) * 100]})


@register(
    "flagship_arrow_pandas",
    oracle=flagship_oracle_sql(),
    note="the same reference e2e workload through the modern dataflow "
         "surface (operators/dataflow.py::arrow_map_reduce): mapInPandas "
         "parse + applyInPandas reduce — the Arrow-batched successor to "
         "Hadoop Streaming's forked scripts (MapReduceWSIImpl.java:132-211)")
def flagship_arrow_pandas(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dataflow import arrow_map_reduce

    lines = lineitem_as_csv_lines(tbl(spark, sf_dir, "lineitem"))
    return arrow_map_reduce(
        lines, _map_parse, "idx int, v long",
        group_cols=["idx"], reduce_fn=_reduce_mean,
        reduce_schema="id int, mean int")
