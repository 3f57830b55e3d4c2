"""Structured Streaming: the incremental plans must agree with their batch
twins (the oracle-checked queries in plans/q_streaming.py), watermarking
must withhold open windows in append mode, and dedup-within-watermark must
collapse duplicates across microbatches.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mapreduce_wsi_spark.plans.registry import events_tbl
from mapreduce_wsi_spark.streaming.windows import (
    dedup_within_watermark,
    run_stream_to_memory,
    session_counts,
    stream_events,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke, tmp_path_factory):
    """A streaming source dir: the raw events file split into several
    parquet files (ts still as raw nanos long) to get multiple microbatches."""
    out = tmp_path_factory.mktemp("events_stream")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_smoke}/events.parquet")
    raw.repartition(4).write.mode("overwrite").parquet(str(out / "src"))
    yield str(out / "src")
    shutil.rmtree(out, ignore_errors=True)


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_streaming_tumbling_matches_batch(spark, sf_smoke, events_dir):
    stream = stream_events(spark, events_dir, max_files_per_trigger=1)
    got = run_stream_to_memory(
        tumbling_counts(stream, watermark=None), "tumble_out", "complete")
    batch = tumbling_counts(events_tbl(spark, sf_smoke), watermark=None)
    assert _canon(got.collect()) == _canon(batch.collect())


def test_streaming_session_matches_batch(spark, sf_smoke, events_dir):
    stream = stream_events(spark, events_dir)
    got = run_stream_to_memory(
        session_counts(stream, watermark="10 minutes"), "sess_out", "append")
    batch = session_counts(events_tbl(spark, sf_smoke), watermark=None)
    got_rows = _canon(got.collect())
    batch_rows = _canon(batch.collect())
    # append mode emits only watermark-closed sessions; all emitted sessions
    # must be exact, and nearly all sessions close over a month of fixture data
    assert set(got_rows) <= set(batch_rows)
    assert len(got_rows) >= 0.9 * len(batch_rows)


def test_append_mode_withholds_open_windows(spark, events_dir):
    stream = stream_events(spark, events_dir, max_files_per_trigger=2)
    got = run_stream_to_memory(
        tumbling_counts(stream, watermark="2 hours"), "tumble_append", "append")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_src = (spark.read.parquet(events_dir)
                 .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
    batch = tumbling_counts(batch_src, watermark=None)
    n_got, n_all = got.count(), batch.count()
    # windows inside the final watermark stay open and unemitted
    assert 0 < n_got < n_all


def test_dedup_within_watermark(spark, events_dir, tmp_path):
    # duplicate every event across two files -> duplicates span microbatches
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(events_dir)
    dup_dir = str(tmp_path / "dup")
    raw.coalesce(1).write.mode("overwrite").parquet(dup_dir)
    raw.coalesce(1).write.mode("append").parquet(dup_dir)

    stream = stream_events(spark, dup_dir, max_files_per_trigger=1)
    got = run_stream_to_memory(
        dedup_within_watermark(stream, ["event_id"], "4 hours"),
        "dedup_out", "append")
    n_distinct = raw.select("event_id").distinct().count()
    assert got.count() == n_distinct
