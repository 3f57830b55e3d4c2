"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``mapreduce_wsi_spark/`` — the catalog of
queries/oracles is ``mapreduce_wsi_spark/plans/`` (one registered entry per
operator in SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's CWD.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Reference-e2e semantics (SURVEY.md §2 B3->B5): CSV serialize ->
    positional explode -> per-index exact integer mean with tripwire.
    """
    from mapreduce_wsi_spark.plans.flagship import flagship
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mapreduce_wsi_spark.plans.registry import load_catalog
    return {name: e.fn for name, e in load_catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query (same column
    aliases as the Spark side; omitted entries get rows-only checks)."""
    from mapreduce_wsi_spark.plans.registry import load_catalog
    return {name: e.oracle for name, e in load_catalog().items()
            if e.oracle is not None}
