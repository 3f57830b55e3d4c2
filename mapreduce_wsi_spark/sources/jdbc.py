"""Partitioned JDBC ingest/egress — the reference's Sqoop surface, native.

importIntoHDFS (MapReduceWSIImpl.java:220-280) accepts a restricted SQL
fragment, injects Sqoop's ``$CONDITIONS`` partition predicate, synthesizes a
``SELECT MIN,MAX`` boundary query when the split column isn't projected, and
shells out to ``sqoop import``. Spark's JDBC source already implements the
per-partition range predicates (A3b) and pushes the whole subquery down to
the RDBMS — the one missing piece is boundary derivation (A3c), which Spark
requires as explicit lowerBound/upperBound; ``derive_bounds`` replays the
reference's synthesis (MapReduceWSIImpl.java:242-258) as one MIN/MAX query.

exportToRDBMS (MapReduceWSIImpl.java:282-305) appends tab-delimited scope
files into a pre-existing table; here: read the scope dataset, append via
DataFrameWriter.jdbc — same "table must pre-exist, inserts must satisfy
constraints" contract (MapReduceWSI.java:155-158).

The reference's shell-escaping (A9, flagged unverified by its own author at
MapReduceWSIImpl.java:308) disappears: parameters travel as JDBC properties,
closing the injection hole by construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from mapreduce_wsi_spark.scope import scope_path

# ≈ the reference's selectPattern (MapReduceWSIImpl.java:216-218): a
# restricted SELECT ... FROM ... [WHERE ...] fragment. Catalyst subsumes
# real parsing; this shim only mirrors the documented "simple projections
# and filters" API rule (MapReduceWSI.java:114-124) for early, clear errors.
_SELECT_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<from>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)


@dataclass(frozen=True)
class ImportQuery:
    select: str
    from_: str
    where: str | None

    @property
    def sql(self) -> str:
        q = f"SELECT {self.select} FROM {self.from_}"
        return f"{q} WHERE {self.where}" if self.where else q


def parse_import_query(query: str) -> ImportQuery:
    """Validate/decompose the restricted import fragment
    (≈ MapReduceWSIImpl.java:231-234, incl. its rejection behavior)."""
    m = _SELECT_RE.match(query)
    if not m:
        raise ValueError(
            f"import query must be SELECT ... FROM ... [WHERE ...]: {query!r}")
    return ImportQuery(m.group("select").strip(), m.group("from").strip(),
                       m.group("where").strip() if m.group("where") else None)


def split_column_projected(q: ImportQuery, split_column: str) -> bool:
    """Word-boundary check whether the split column appears in the SELECT
    list (≈ MapReduceWSIImpl.java:248-253, excluding AS-aliases the same
    way: only a literal occurrence counts)."""
    bare = split_column.split(".")[-1]
    return re.search(rf"(?<!\w){re.escape(bare)}(?!\w)",
                     q.select) is not None


def bounds_query(q: ImportQuery, split_column: str) -> str:
    """The synthesized boundary query (≈ MapReduceWSIImpl.java:248-258):
    MIN/MAX of the split column over the same FROM/WHERE."""
    base = f"SELECT MIN({split_column}) AS mn, MAX({split_column}) AS mx " \
           f"FROM {q.from_}"
    return f"{base} WHERE {q.where}" if q.where else base


def validate_split_column(split_column: str) -> None:
    """Require a table-qualified split column (MapReduceWSIImpl.java:225-228)."""
    if "." not in split_column:
        raise ValueError(
            f"partition column must be table-qualified (got {split_column!r})")


def derive_bounds(spark, url: str, q: ImportQuery, split_column: str,
                  properties: dict | None) -> tuple[int, int]:
    """Run the boundary query against the RDBMS (one-row read)."""
    bq = bounds_query(q, split_column)
    row = (spark.read.format("jdbc")
           .option("url", url)
           .option("query", bq)
           .options(**(properties or {}))
           .load().collect())[0]
    # positional access: RDBMSes case-fold the mn/mx aliases differently
    if row[0] is None:
        raise ValueError("split column has no rows / only NULLs")
    return int(row[0]), int(row[1])


def import_jdbc(engine, scope_id: int, url: str, query: str,
                split_column: str, destination_name: str,
                num_partitions: int = 8,
                properties: dict | None = None) -> DataFrame:
    """Parallel partitioned JDBC -> scope ingest (A3).

    Pipeline: validate fragment -> derive MIN/MAX bounds -> partitioned
    ``spark.read.jdbc`` (each partition issues the pushed-down subquery with
    its own range predicate — Spark's built-in $CONDITIONS equivalent) ->
    persist as parquet under the scope (columnar upgrade of the reference's
    comma-delimited text parts; the text shape remains available via
    sources.files.write_kv_text).
    """
    validate_split_column(split_column)
    q = parse_import_query(query)
    lo, hi = derive_bounds(engine.spark, url, q, split_column, properties)
    bare = split_column.split(".")[-1]
    # Spark partitions on a column of the subquery itself; if the user did
    # not project the split column (the case the reference's boundary-query
    # synthesis exists for, MapReduceWSIImpl.java:242-258), project it
    # under a reserved alias and drop it after the read.
    drop_split = not split_column_projected(q, split_column)
    select = f"{q.select}, {split_column} AS spark_gen_split" if drop_split else q.select
    sub = ImportQuery(select, q.from_, q.where).sql
    df = (engine.spark.read.format("jdbc")
          .option("url", url)
          .option("dbtable", f"({sub}) spark_gen_import_q")
          .option("partitionColumn", "spark_gen_split" if drop_split else bare)
          .option("lowerBound", lo)
          .option("upperBound", hi + 1)  # Spark upper bound is exclusive
          .option("numPartitions", num_partitions)
          .options(**(properties or {}))
          .load())
    if drop_split:
        df = df.drop("spark_gen_split")
    dest = scope_path(engine.base_path, scope_id, destination_name)
    df.write.mode("overwrite").parquet(dest)
    return df


def export_jdbc(engine, scope_id: int, url: str, table: str,
                source_name: str, properties: dict | None = None,
                source_format: str = "parquet") -> None:
    """Scope dataset -> pre-existing RDBMS table, append-only (A4).

    ``source_format='text_tsv'`` reads the reference's tab-delimited on-disk
    shape (MapReduceWSIImpl.java:296-300) as all-string columns.
    """
    path = scope_path(engine.base_path, scope_id, source_name)
    if source_format == "text_tsv":
        df = engine.spark.read.option("sep", "\t").csv(path)
    else:
        df = engine.spark.read.format(source_format).load(path)
    (df.write.mode("append")
     .format("jdbc")
     .option("url", url)
     .option("dbtable", table)
     .options(**(properties or {}))
     .save())
