"""Flagship pipeline — the reference's end-to-end test workload, Spark-first.

Reference dataflow (SURVEY.md §2 B3→B4→B5):
  1. map: parse a 7-field comma-separated text line, emit ``(i, num_i)``
     for i in 0..6 (TestMapper.java:23-45; Python twin EndToEndTest.java:84-88)
  2. shuffle: partition + group by key (Runner.java:42-46 — no combiner)
  3. reduce: per-key exact integer mean with tripwire (TestReducer.java:26-38)

Engine expression: the CSV line is synthesized from ``lineitem`` (FIXTURES.md
§C keeps driver tables as the only input source), then
``posexplode(split(...))`` + ``groupBy(pos)`` + ``integer_mean_expr``. Spark
upgrades the physical plan for free: partial aggregation happens map-side
(HashAggregateExec partial→final) where the reference configured no combiner,
and no intermediate DFS materialization occurs between "map" and "reduce".

Scale note: the whole plan is scan→project→generate→hash-agg with 7 distinct
keys; shuffle volume after partial agg is O(7 × shuffle_partitions) rows —
this survives 100 TB trivially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_wsi_spark.functions import integer_mean_expr

# Seven integer-castable expressions from lineitem (FIXTURES.md §C): these
# play the role of the reference's num0..num6 columns (EndToEndTest.java:160-163).
_SEVEN_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "cast(l_linenumber as bigint)",
    "cast(l_quantity as bigint)",
    "l_orderkey % 7",
    "l_linenumber % 7",
)


def lineitem_as_csv_lines(lineitem: DataFrame) -> DataFrame:
    """Serialize 7 lineitem expressions into the post-import text shape
    (one comma-joined string per row — FIXTURES.md §A2, TestMapper.java:26-30).
    """
    return lineitem.select(
        F.concat_ws(",", *[F.expr(c).cast("string") for c in _SEVEN_COLS]
                    ).alias("value"))


def positional_explode(lines: DataFrame) -> DataFrame:
    """Map stage (B3): CSV split + positional explode → (idx, v) pairs.

    TestMapper.java:30-44 hard-fails on arity mismatch; here the typed cast
    yields NULL on garbage, and the strict variant is available via
    ``spark.sql.ansi.enabled``. Offsets/keys are dropped (TestMapper.java:27-28).
    """
    return (lines
            .select(F.posexplode(F.split(F.col("value"), ",")).alias("idx", "raw"))
            .select(F.col("idx").cast("int").alias("idx"),
                    F.trim(F.col("raw")).cast("long").alias("v")))


def per_key_integer_mean(pairs: DataFrame) -> DataFrame:
    """Reduce stage (B5): per-index exact integer mean (TestReducer.java:26-38).

    Output schema matches the reference's export table ``(id INT, mean INT)``
    (EndToEndTest.java:164-165).
    """
    return (pairs.groupBy(F.col("idx").cast("int").alias("id"))
            .agg(integer_mean_expr("v").alias("mean")))


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scan → serialize → positional explode → shuffle → integer mean."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return per_key_integer_mean(positional_explode(lineitem_as_csv_lines(lineitem)))


def flagship_oracle_sql() -> str:
    """DuckDB twin: same semantics via UNION ALL positional unpivot.

    ``//`` is DuckDB integer division (truncating for the non-negative
    domain, like Java's ``/`` in TestReducer.java:34).
    """
    selects = [
        f"SELECT {i} AS id, CAST({c} AS BIGINT) AS v FROM lineitem"
        for i, c in enumerate(_SEVEN_COLS)
    ]
    unioned = " UNION ALL ".join(selects)
    return f"""
        SELECT CAST(id AS INTEGER) AS id,
               CAST((sum(v) // count(v)) - (sum(v) % count(v)) * 100 AS INTEGER) AS mean
        FROM ({unioned}) t
        GROUP BY id
    """
