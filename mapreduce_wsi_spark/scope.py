"""Scoped namespaces — isolated per-client data staging.

Reference semantics (MapReduceWSIImpl.java:59-87): ``createScope`` draws a
random positive long, creates ``<hdfsBase>/<id>`` + a remote local dir, and
returns the id; ``deleteScope`` recursively removes both. Isolation is
path-prefix-only by design (MapReduceWSIImpl.java:35-44) — we keep those
(documented) semantics but add a Spark SQL database per scope so scoped
datasets are addressable through the catalog as well as by path.

Collision posture matches the reference (MapReduceWSIImpl.java:61-65):
ids are drawn from a 63-bit space; callers tolerate the astronomically
unlikely clash.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _scope_db(scope_id: int) -> str:
    return f"scope_{scope_id}"


def scope_path(base_path: str, scope_id: int, name: str = "") -> str:
    """Resolve a dataset name inside a scope (ref: MapReduceWSIImpl.java:312-320).

    Empty ``name`` returns the scope root. Names may contain globs for
    multi-file reads (ref: MapReduceWSI.java:93-95).
    """
    root = f"{base_path.rstrip('/')}/{scope_id}"
    return f"{root}/{name}" if name else root


def create_scope(spark: SparkSession, base_path: str) -> int:
    """Allocate an isolated namespace; returns its id (ref: MapReduceWSIImpl.java:59-76)."""
    scope_id = uuid.uuid4().int % (2**63 - 1) + 1  # positive 63-bit, like abs(nextLong)
    Path(scope_path(base_path, scope_id)).mkdir(parents=True, exist_ok=True)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_scope_db(scope_id)}")
    return scope_id


def delete_scope(spark: SparkSession, base_path: str, scope_id: int) -> None:
    """Destroy all scope data, recursively (ref: MapReduceWSIImpl.java:78-87)."""
    spark.sql(f"DROP DATABASE IF EXISTS {_scope_db(scope_id)} CASCADE")
    shutil.rmtree(scope_path(base_path, scope_id), ignore_errors=True)


def save_dataset(df: DataFrame, base_path: str, scope_id: int, name: str,
                 fmt: str = "parquet", mode: str = "overwrite") -> str:
    """Persist a DataFrame as a named dataset inside a scope.

    The reference's datasets are text files under the scope dir
    (MapReduceWSIImpl.java:260-261); we default to parquet (columnar,
    pushdown-capable) and keep text/csv available via ``fmt``.
    """
    path = scope_path(base_path, scope_id, name)
    df.write.mode(mode).format(fmt).save(path)
    return path


def load_dataset(spark: SparkSession, base_path: str, scope_id: int, name: str,
                 fmt: str = "parquet", **options) -> DataFrame:
    """Read a named (possibly glob) dataset from a scope."""
    return spark.read.format(fmt).options(**options).load(
        scope_path(base_path, scope_id, name))
