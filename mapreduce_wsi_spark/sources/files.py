"""File sources & sinks.

Reference surface: TextInputFormat line scans with dir/file/glob inputs
(Runner.java:36-37, MapReduceWSI.java:93-95) and TextOutputFormat
``key \\t value`` sinks (Runner.java:39-40). The engine keeps those edge
formats byte-compatible and adds typed columnar formats (parquet/csv/json)
as the production path — schemas are explicit at ingest (fail-fast), with a
``permissive`` untyped-text mode to emulate the reference's
"schema is whatever parses" model (TestMapper.java:26-38).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text(spark: SparkSession, path_glob: str) -> DataFrame:
    """Line scan: one ``value: string`` column; glob-capable.

    The MR offset key (LongWritable) is dropped — it is meaningless to the
    reference's own workloads too (TestMapper.java:27-28).
    """
    return spark.read.text(path_glob)


def read_csv(spark: SparkSession, path_glob: str, schema=None, sep: str = ",",
             header: bool = False, permissive: bool = True) -> DataFrame:
    """Delimited scan. ``schema=None`` + ``permissive`` = all-string columns
    (reference fidelity: untyped text until user code parses,
    TestMapper.java:30,38); with a schema, malformed rows fail fast unless
    ``permissive``.
    """
    reader = spark.read.option("sep", sep).option("header", header)
    if schema is not None:
        reader = reader.schema(schema).option(
            "mode", "PERMISSIVE" if permissive else "FAILFAST")
    return reader.csv(path_glob)


def read_parquet(spark: SparkSession, path_glob: str) -> DataFrame:
    return spark.read.parquet(path_glob)


def read_json(spark: SparkSession, path_glob: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path_glob)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line — the splittable layout;
    a single JSON array would force one reader per file)."""
    df.write.mode(mode).json(path)


def write_kv_text(df: DataFrame, path: str, sep: str = "\t",
                  mode: str = "overwrite") -> None:
    """TextOutputFormat-compatible sink: ``key<sep>value`` lines
    (ref: Runner.java:39-40; export edge expects tab,
    MapReduceWSIImpl.java:296-300). All columns are concat'd with ``sep``.
    """
    line = F.concat_ws(sep, *[F.col(c).cast("string") for c in df.columns])
    df.select(line.alias("value")).write.mode(mode).text(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def load_sf_tables(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = ("region", "nation", "customer",
                                             "supplier", "part", "orders",
                                             "lineitem", "events", "documents",
                                             "embeddings")) -> dict[str, DataFrame]:
    """Load the driver fixture tables (TESTDATA.md) as DataFrames."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def save_bucketed(df, table: str, buckets: int, key_cols: list[str],
                  sort_cols: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    """Persist as a bucketed (+ sorted-within-bucket) managed table.

    Two tables bucketed on the same keys with the same bucket count join
    with NO shuffle exchange on either side — the co-located-join strategy
    for repeated 100 TB fact-fact joins, amortizing one shuffle at write
    time across every subsequent join (verified by
    tests/test_scale_ops.py::test_bucketed_join_is_shuffle_free).
    """
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *key_cols)
    w = w.sortBy(*(sort_cols or key_cols))
    w.saveAsTable(table)


def read_orc(spark: SparkSession, path_glob: str) -> DataFrame:
    return spark.read.orc(path_glob)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def save_range_clustered(df: DataFrame, path: str, cols: list[str],
                         n_files: int = 8, mode: str = "overwrite") -> None:
    """Range-clustered layout: repartitionByRange + sortWithinPartitions
    on the cluster key before writing parquet. File-level (and row-group)
    min/max statistics on the key become pairwise disjoint, so a range
    predicate prunes whole files at planning time — the data-skipping
    layout for append-heavy 100 TB tables where directory partitioning
    (low-cardinality keys only) doesn't apply. Disjointness is asserted
    from the actual parquet footers in
    tests/test_sources.py::test_range_clustered_files_are_disjoint."""
    (df.repartitionByRange(n_files, *cols)
     .sortWithinPartitions(*cols)
     .write.mode(mode).parquet(path))


def compact_files(spark: SparkSession, path: str,
                  target_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_size / target_bytes) files. Streaming sinks and incremental
    ingests accrete thousands of KB-sized files; at 100 TB the resulting
    task-per-file scheduling and footer overhead dominate scan time, so
    periodic bin-packing to ~128 MB (one HDFS block / one comfortable task)
    is standard table maintenance. Write-audit-publish: compacts into a
    sibling dir, atomically swaps, removes the old data. Returns the new
    file count."""
    import math
    import os
    import shutil

    total = sum(os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path) for f in fs
                if f.endswith(".parquet"))
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    tmp, old = path + ".__compact", path + ".__old"
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return n_out


def read_csv_quarantine(spark: SparkSession, path_glob: str, schema,
                        sep: str = ","):
    """PERMISSIVE CSV ingest with corrupt-row capture: returns
    ``(good, quarantine)`` where ``good`` carries the declared schema
    (corrupt rows nulled out and removed) and ``quarantine`` holds each
    malformed line verbatim for replay/inspection — the
    dead-letter-queue pattern of a production ingest (FAILFAST kills
    the job on one bad byte; silent PERMISSIVE loses the evidence).

    The frame is cached before splitting: Spark refuses a filter that
    references ONLY the internal corrupt-record column of an
    un-materialized CSV relation (SPARK-21610) — and the cache also
    means the file parses once for both branches.
    """
    from pyspark.sql import types as T

    aug = T.StructType(list(schema.fields)
                       + [T.StructField("_corrupt_record",
                                        T.StringType(), True)])
    df = (spark.read.option("sep", sep)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .schema(aug).csv(path_glob)).cache()
    good = (df.filter(F.col("_corrupt_record").isNull())
            .drop("_corrupt_record"))
    bad = (df.filter(F.col("_corrupt_record").isNotNull())
           .select(F.col("_corrupt_record").alias("raw_line")))
    return good, bad
