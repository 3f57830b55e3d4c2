"""File sources/sinks: format round-trips and partition pruning.

Partition pruning is the single biggest 100 TB lever for the scan side —
a date-partitioned layout turns a full-corpus scan into a handful of
directory reads. The plan assertion pins that Catalyst actually prunes
(PartitionFilters on the scan, not a post-scan Filter).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from mapreduce_wsi_spark.plans.registry import tbl
from mapreduce_wsi_spark.sources.files import (
    read_orc,
    write_orc,
    write_parquet,
)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_orc_roundtrip(spark, sf_oracle, tmp_path):
    src = tbl(spark, sf_oracle, "supplier")
    path = str(tmp_path / "supplier_orc")
    write_orc(src, path)
    assert _canon(read_orc(spark, path)) == _canon(src)


def test_partitioned_write_prunes_partitions(spark, sf_oracle, tmp_path):
    li = tbl(spark, sf_oracle, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate"))
    path = str(tmp_path / "li_by_year")
    write_parquet(li, path, partition_by=["ship_year"])

    back = spark.read.parquet(path).filter(F.col("ship_year") == 1996)
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2, "scan has no PartitionFilters"
    assert "ship_year" in pf[1].split("]", 1)[0]
    # pruning must not change results vs a post-scan filter
    expect = li.filter(F.col("ship_year") == 1996).count()
    assert back.count() == expect
    # and the partition column must NOT appear as a pushed *data* filter
    if "PushedFilters: [" in plan:
        pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
        assert "ship_year" not in pushed


def test_partitioned_orc_roundtrip(spark, sf_oracle, tmp_path):
    ev = tbl(spark, sf_oracle, "events").withColumn(
        "day", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    write_orc(ev, path, partition_by=["day"])
    back = spark.read.orc(path)
    assert back.count() == ev.count()
    assert set(back.columns) == set(ev.columns)


def test_csv_permissive_vs_failfast(spark, tmp_path):
    """Untyped-text edge semantics (SURVEY §7.4 risk 3): the reference
    tolerates any line shape until user code parses it. Permissive mode
    reproduces that (garbage -> NULLs, user decides); FAILFAST is the
    typed fast path that rejects the file at read time."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from mapreduce_wsi_spark.sources.files import read_csv

    p = tmp_path / "mixed.csv"
    p.write_text("1,2,3\n4,notanint,6\n7,8,9\n")
    schema = "a int, b int, c int"

    rows = sorted(tuple(r) for r in
                  read_csv(spark, str(p), schema=schema).collect())
    assert rows == [(1, 2, 3), (4, None, 6), (7, 8, 9)]

    with _pytest.raises((Py4JJavaError, Exception)):
        read_csv(spark, str(p), schema=schema, permissive=False).collect()

    # schema=None: all-string columns, nothing is garbage (reference mode)
    raw = read_csv(spark, str(p))
    assert [f.dataType.simpleString() for f in raw.schema.fields] == \
        ["string", "string", "string"]
    assert raw.count() == 3


def test_json_roundtrip_with_explicit_schema(spark, sf_oracle, tmp_path):
    """JSON-lines sink -> source with an explicit schema (production path:
    no inference scan); values and types survive the trip."""
    from mapreduce_wsi_spark.sources.files import read_json, write_json

    src = tbl(spark, sf_oracle, "supplier")
    path = str(tmp_path / "supplier_json")
    write_json(src, path)
    back = read_json(spark, path, schema=src.schema)
    assert back.schema == src.schema
    assert _canon(back) == _canon(src)


def test_range_clustered_files_are_disjoint(spark, sf_oracle, tmp_path):
    """save_range_clustered must produce files whose min/max footer stats
    on the cluster key are pairwise disjoint — the property that lets a
    range predicate skip whole files."""
    import pyarrow.parquet as pq

    from mapreduce_wsi_spark.sources.files import save_range_clustered

    li = tbl(spark, sf_oracle, "lineitem")
    path = str(tmp_path / "li_clustered")
    save_range_clustered(li, path, ["l_orderkey"], n_files=8)

    ranges = []
    for f in (tmp_path / "li_clustered").glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(md.row_group(rg).column(i)
                       for i in range(md.row_group(rg).num_columns)
                       if md.row_group(rg).column(i).path_in_schema
                       == "l_orderkey")
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {hi1} > {lo2}"
    # contents unchanged by re-layout
    assert (spark.read.parquet(path).count() == li.count())


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution: files written before a column existed merge with
    newer files (mergeSchema), old rows reading NULL for the new column."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string") \
        .write.parquet(p + "/batch=1")
    spark.createDataFrame([(2, "b", 9.5)], "id long, v string, score double") \
        .write.parquet(p + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) >= {"id", "v", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_csv_corrupt_record_quarantine(spark, tmp_path):
    """Quarantine pattern: PERMISSIVE + a _corrupt_record column splits an
    ingest into clean rows and a reviewable reject table in one pass —
    how a 100 TB ingest keeps going without silently dropping garbage."""
    p = tmp_path / "mixed.csv"
    p.write_text("1,2,3\n4,notanint,6\n7,8,9\n")
    df = (spark.read
          .schema("a int, b int, c int, _corrupt_record string")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .csv(str(p)))
    df = df.cache()  # corrupt-record column requires a stable scan
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    rejects = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(tuple(r) for r in clean.collect()) == [(1, 2, 3), (7, 8, 9)]
    assert [r["_corrupt_record"] for r in rejects.collect()] == ["4,notanint,6"]
    df.unpersist()


def test_custom_python_datasource_parallel_scan(spark):
    """Custom connector via the Python DataSource API: deterministic
    synthetic docs, planned as N parallel partitions (the extension path
    for bespoke 100 TB sources — replaces the reference's 'write an MR
    job' escape hatch)."""
    from mapreduce_wsi_spark.sources.custom import (
        _doc_text,
        register_synth_docs,
    )

    register_synth_docs(spark)
    df = (spark.read.format("synthdocs")
          .option("rows", 200).option("partitions", 5).load())
    assert df.rdd.getNumPartitions() == 5
    rows = {r["doc_id"]: (r["text"], r["n_words"]) for r in df.collect()}
    assert len(rows) == 200
    # deterministic content, parallel-partition independent
    assert rows[7][0] == _doc_text(7)
    assert all(t.count(" ") + 1 == n for t, n in rows.values())
    # composes with the relational surface like any scan
    from pyspark.sql import functions as F
    agg = df.agg(F.sum("n_words").alias("s")).collect()[0]["s"]
    assert agg == sum(n for _, n in rows.values())


def test_compact_files_reduces_file_count_preserves_rows(spark, tmp_path):
    from mapreduce_wsi_spark.sources.files import compact_files

    p = str(tmp_path / "fragmented")
    # 40 tiny files (streaming-sink accretion pattern)
    spark.range(0, 4_000).repartition(40).write.parquet(p)
    before_files = len(list((tmp_path / "fragmented").glob("*.parquet")))
    assert before_files == 40
    before = sorted(r["id"] for r in spark.read.parquet(p).collect())

    n_out = compact_files(spark, p, target_bytes=10 * 1024 * 1024)
    after_files = len(list((tmp_path / "fragmented").glob("*.parquet")))
    assert after_files == n_out < before_files
    assert sorted(r["id"] for r in spark.read.parquet(p).collect()) == before


def test_csv_quarantine_splits_malformed_rows(spark, tmp_path):
    """Dead-letter ingest: typed rows parse into the schema; malformed
    lines land verbatim in the quarantine, nothing is silently lost."""
    from pyspark.sql import types as T

    from mapreduce_wsi_spark.sources.files import read_csv_quarantine

    p = tmp_path / "in.csv"
    p.write_text("1,alpha,2.5\n"
                 "2,beta,not_a_number\n"
                 "3,gamma,4.0\n"
                 "oops\n")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ])
    good, bad = read_csv_quarantine(spark, str(p), schema)
    rows = {r["id"]: (r["name"], r["score"]) for r in good.collect()}
    assert rows == {1: ("alpha", 2.5), 3: ("gamma", 4.0)}
    raws = sorted(r["raw_line"] for r in bad.collect())
    assert raws == ["2,beta,not_a_number", "oops"]
    assert good.count() + bad.count() == 4
