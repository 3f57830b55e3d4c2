"""Query/oracle registry — the driver-contract backbone.

Every implemented operator from SURVEY.md §2 registers here with a Spark
builder ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a
DuckDB oracle string over the pre-registered fixture views. The driver
compares the two at sf0.01 (row-count + schema + order-insensitive
value-hash, columns sorted by name) — so every computed column is aliased
identically on both sides, and float-valued aggregates go through exact
decimal(18,2) arithmetic before a final cast to double (the fixture doubles
are all 2-decimal values, so the casts are lossless; see FIXTURES.md §B).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogEntry:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver records a weaker rows-only check
    note: str = ""


CATALOG: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None = None, note: str = ""):
    """Decorator: add a query builder to the catalog."""
    def deco(fn):
        if name in CATALOG:
            raise ValueError(f"duplicate catalog entry {name!r}")
        CATALOG[name] = CatalogEntry(fn=fn, oracle=oracle, note=note)
        return fn
    return deco


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Every catalog query funnels through here: guarantee Python workers
    # can unpickle UDFs referencing this package even when the driver
    # harness imports us from an arbitrary cwd (see util.py).
    from mapreduce_wsi_spark.util import ensure_package_on_workers
    ensure_package_on_workers(spark)
    if name == "events":
        return events_tbl(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_tbl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects outright. Read nanos as long and convert to a
    microsecond timestamp (truncating div — exactly DuckDB's ns->us cast, so
    oracle comparisons stay bit-identical)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_catalog() -> dict[str, CatalogEntry]:
    """Import all query-definition modules (side-effect: registration)."""
    import mapreduce_wsi_spark.plans.q_relational  # noqa: F401
    import mapreduce_wsi_spark.plans.q_tpch_more  # noqa: F401
    import mapreduce_wsi_spark.plans.q_extras  # noqa: F401
    import mapreduce_wsi_spark.plans.q_functions  # noqa: F401
    import mapreduce_wsi_spark.plans.q_streaming  # noqa: F401
    import mapreduce_wsi_spark.plans.q_llm  # noqa: F401
    import mapreduce_wsi_spark.plans.q_pipeline  # noqa: F401
    import mapreduce_wsi_spark.plans.q_reference  # noqa: F401
    return CATALOG
