"""Structured Streaming: the incremental plans must agree with their batch
twins (the oracle-checked queries in plans/q_streaming.py), watermarking
must withhold open windows in append mode, and dedup-within-watermark must
collapse duplicates across microbatches.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mapreduce_wsi_spark.plans.registry import events_tbl, normalize_event_ts
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
    parquet files (ts kept in its raw on-disk layout) to get multiple
    microbatches; stream_events normalizes ts on read."""
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
    batch_src = normalize_event_ts(spark.read.parquet(events_dir))
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


def test_stateful_running_counts_match_batch(spark, sf_smoke, events_dir):
    """applyInPandasWithState running per-user stats: the LAST update row
    emitted per user must equal the batch groupBy."""
    from mapreduce_wsi_spark.streaming.stateful import running_user_stats

    stream = stream_events(spark, events_dir, max_files_per_trigger=1)
    got = run_stream_to_memory(
        running_user_stats(stream), "stateful_counts", "update")
    # update mode re-emits per microbatch; the max n_events per user is the
    # final cumulative state
    final = (got.groupBy("user_id")
             .agg(F.max("n_events").alias("n_events"))
             .collect())
    batch = (events_tbl(spark, sf_smoke)
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
             .collect())
    assert ({(r["user_id"], r["n_events"]) for r in final} ==
            {(r["user_id"], r["n"]) for r in batch})


def test_stateful_sessions_respect_gap(spark, sf_smoke, events_dir):
    """Custom sessionization: every closed session's internal gaps are
    < gap_ms and sessions per user don't overlap."""
    from mapreduce_wsi_spark.streaming.stateful import inactivity_sessions

    gap_ms = 30 * 60 * 1000
    stream = stream_events(spark, events_dir, max_files_per_trigger=2)
    got = run_stream_to_memory(
        inactivity_sessions(stream, gap_ms=gap_ms, watermark="10 minutes"),
        "stateful_sessions", "append").collect()
    assert len(got) > 0
    by_user: dict = {}
    for r in got:
        assert r["session_start_ms"] <= r["session_end_ms"]
        assert r["n_events"] >= 1
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start_ms"], r["session_end_ms"]))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert s2 - e1 > gap_ms, "adjacent sessions violate the gap"


def test_stream_static_join_matches_batch(spark, sf_smoke, events_dir):
    from mapreduce_wsi_spark.streaming.windows import enrich_with_static

    dim = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 3).alias("cohort"))
    stream = stream_events(spark, events_dir, max_files_per_trigger=2)
    got = run_stream_to_memory(
        enrich_with_static(stream, dim).select("event_id", "user_id", "cohort"),
        "enriched", "append")
    batch = enrich_with_static(events_tbl(spark, sf_smoke), dim).select(
        "event_id", "user_id", "cohort")
    assert _canon(got.collect()) == _canon(batch.collect())


def test_stream_stream_join_bounded_state(spark, sf_smoke, events_dir):
    """Self-join: every (signup, purchase) pair per user within 1 hour.
    The streaming result must equal the batch time-range join."""
    from mapreduce_wsi_spark.streaming.windows import correlate_streams

    def split(df):
        a = (df.filter(F.col("event_type") == "signup")
             .select("user_id", "ts", F.col("event_id").alias("eid_l")))
        b = (df.filter(F.col("event_type") == "purchase")
             .select(F.col("user_id").alias("user_id_r"),
                     F.col("ts").alias("ts_r"),
                     F.col("event_id").alias("eid_r")))
        return a, b

    sl, sr = split(stream_events(spark, events_dir, max_files_per_trigger=2))
    got = run_stream_to_memory(
        correlate_streams(sl, sr).select("eid_l", "eid_r"),
        "ss_join", "append")

    bl, br = split(events_tbl(spark, sf_smoke))
    batch = bl.join(
        br, (bl["user_id"] == br["user_id_r"]) &
            (br["ts_r"] >= bl["ts"]) &
            (br["ts_r"] <= bl["ts"] + F.expr("INTERVAL 1 HOUR"))
    ).select("eid_l", "eid_r")
    assert _canon(got.collect()) == _canon(batch.collect())


def test_checkpoint_restart_is_exactly_once(spark, events_dir, tmp_path):
    """Kill-and-restart with the same checkpoint must not reprocess: the
    file-source offsets live in the checkpoint, so a restarted query
    appends nothing for already-committed microbatches, and a new source
    file is consumed exactly once."""
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    # private copy of the source dir — this test appends files to it
    src = str(tmp_path / "src")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(events_dir).repartition(4).write.parquet(src)
    events_dir = src

    def run_once():
        q = (stream_events(spark, events_dir, max_files_per_trigger=1)
             .select("event_id", "user_id")
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .outputMode("append").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n_events = spark.read.parquet(events_dir).count()
    assert spark.read.parquet(sink).count() == n_events

    # restart on an unchanged source: nothing may be re-emitted
    run_once()
    assert spark.read.parquet(sink).count() == n_events

    # grow the source; only the delta lands, once
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    extra = spark.read.parquet(events_dir).limit(50)
    extra.coalesce(1).write.mode("append").parquet(events_dir)
    run_once()
    assert spark.read.parquet(sink).count() == n_events + 50


def test_upsert_sink_latest_wins_and_survives_restart(spark, tmp_path):
    """foreachBatch MERGE sink: one row per key, newest order_col wins
    across microbatches regardless of arrival order; a checkpoint restart
    changes nothing; late (older) updates lose to existing state."""
    import time

    from mapreduce_wsi_spark.streaming.sinks import upsert_parquet_sink

    src = str(tmp_path / "src")
    target = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v string, ord long"

    spark.createDataFrame(
        [(1, "a1", 10), (2, "b1", 10), (3, "c1", 10)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes -> two microbatches (1 file/trigger)
    spark.createDataFrame(
        [(2, "b2", 20),   # genuine update: newer ord
         (1, "a0", 5),    # late arrival: older ord, must NOT win
         (4, "d1", 20)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = upsert_parquet_sink(stream, keys=["k"], order_col="ord",
                                target_dir=target, checkpoint_dir=ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    expect = {1: ("a1", 10), 2: ("b2", 20), 3: ("c1", 10), 4: ("d1", 20)}
    state = {r["k"]: (r["v"], r["ord"])
             for r in spark.read.parquet(target).collect()}
    assert state == expect

    # restart with the same checkpoint: no reprocessing, same state
    run_once()
    assert {r["k"]: (r["v"], r["ord"])
            for r in spark.read.parquet(target).collect()} == expect

    # a new file merges incrementally (and only the delta is read)
    spark.createDataFrame([(3, "c2", 30)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    run_once()
    expect[3] = ("c2", 30)
    assert {r["k"]: (r["v"], r["ord"])
            for r in spark.read.parquet(target).collect()} == expect


def test_available_now_trigger_drains_and_stops(spark, tmp_path):
    """Trigger.AvailableNow: process the whole backlog in rate-limited
    microbatches, then stop on its own — the batch-like mode for periodic
    jobs over a streaming source (state/checkpoint preserved between
    runs, unlike a plain batch read)."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    for i in range(3):
        spark.createDataFrame([(i, f"v{i}")], "k long, v string") \
            .coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema("k long, v string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination(120)  # self-terminates after draining
    assert not q.isActive
    assert spark.read.parquet(sink).count() == 3


def test_stream_stream_left_outer_emits_unmatched_after_watermark(
        spark, tmp_path):
    """Left-outer stream-stream join: an unmatched left event must emit
    with a NULL right side — but only after the watermark passes its join
    window. A far-future third batch advances the watermark to flush it."""
    import datetime as dt
    import time

    from mapreduce_wsi_spark.streaming.windows import correlate_streams

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write(path_dir, rows, schema):
        spark.createDataFrame(rows, schema) \
            .coalesce(1).write.mode("append").parquet(path_dir)
        time.sleep(1.1)  # distinct mtimes -> ordered microbatches

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    lsch = "user_id long, ts timestamp, eid_l long"
    rsch = "user_id_r long, ts_r timestamp, eid_r long"
    # batch 1: left events for users 1 (will match) and 2 (never matches)
    write(lsrc, [(1, t0, 101), (2, t0, 102)], lsch)
    # right: a match for user 1 within the hour; plus far-future rows on
    # BOTH sides — the global watermark is the MIN across sources, so each
    # stream must see newer data before the unmatched row can flush
    write(rsrc, [(1, t0 + dt.timedelta(minutes=10), 201)], rsch)
    write(rsrc, [(99, t0 + dt.timedelta(hours=12), 299)], rsch)
    write(lsrc, [(98, t0 + dt.timedelta(hours=12), 198)], lsch)

    sl = (spark.readStream.schema(lsch)
          .option("maxFilesPerTrigger", 1).parquet(lsrc))
    sr = (spark.readStream.schema(rsch)
          .option("maxFilesPerTrigger", 1).parquet(rsrc))
    joined = correlate_streams(sl, sr, watermark="30 minutes",
                               how="left_outer").select("eid_l", "eid_r")
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName("ss_left").start())
    try:
        q.processAllAvailable()
        # one more empty-ish pass lets the final watermark commit flush
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["eid_l"], r["eid_r"])
           for r in spark.sql("SELECT * FROM ss_left").collect()}
    assert (101, 201) in got            # matched pair
    assert (102, None) in got           # unmatched left emitted with NULL


def test_custom_python_streaming_source_offsets(spark, tmp_path):
    """Custom streaming connector (SimpleDataSourceStreamReader): row-index
    offsets, deterministic replay; draining via availableNow yields every
    row exactly once across microbatches."""
    from mapreduce_wsi_spark.sources.custom import register_synth_docs

    register_synth_docs(spark)
    stream = (spark.readStream.format("synthdocs")
              .option("rows", 120).option("batchrows", 50).load())
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (stream.writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .outputMode("append").start())
    try:
        q.processAllAvailable()  # source runs dry at rows=120
    finally:
        q.stop()
    got = spark.read.parquet(sink)
    ids = sorted(r["doc_id"] for r in got.collect())
    assert ids == list(range(120))  # each row exactly once, 3 microbatches



def test_stateful_api_dispatch_and_shared_helpers():
    """The api= knob: 'auto' falls back to applyInPandasWithState when
    protobuf is absent, 'tws' raises a clear error instead of crashing
    at query start; the interval helpers shared by both paths merge and
    close sessions correctly."""
    from mapreduce_wsi_spark.streaming import stateful as st

    if st.tws_available():  # this sandbox lacks protobuf; self-skip if not
        assert st._resolve_api("auto") == "tws"
    else:
        assert st._resolve_api("auto") == "apiws"
        with pytest.raises(RuntimeError, match="protobuf"):
            st._resolve_api("tws")
    with pytest.raises(ValueError):
        st._resolve_api("bogus")

    # gap-merge: 0..10 and 15..20 merge at gap>=5; singleton at 100 stays
    merged = st._merge_new_events(
        [[0, 10, 2], [15, 20, 1], [100, 100, 1]], iter(()), gap_ms=5)
    assert merged == [[0, 20, 3], [100, 100, 1]]
    # close rule: end + gap <= watermark
    closed, open_ivs = st._split_closed(merged, wm=26, gap_ms=5)
    assert closed == [(0, 20, 3)] and open_ivs == [(100, 100, 1)]


@pytest.mark.skipif(
    "not __import__('mapreduce_wsi_spark.streaming.stateful', "
    "fromlist=['x']).tws_available()",
    reason="transformWithStateInPandas needs google.protobuf")
def test_stateful_tws_counts_match_batch(spark, sf_smoke, events_dir):
    """Where protobuf exists, the transformWithStateInPandas twin must
    produce the same final per-user stats as the batch groupBy (the same
    contract the apiws path is pinned to above)."""
    from mapreduce_wsi_spark.streaming.stateful import running_user_stats

    stream = stream_events(spark, events_dir, max_files_per_trigger=1)
    got = run_stream_to_memory(
        running_user_stats(stream, api="tws"), "tws_counts", "update")
    final = (got.groupBy("user_id")
             .agg(F.max("n_events").alias("n_events"))
             .collect())
    batch = (events_tbl(spark, sf_smoke)
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
             .collect())
    assert ({(r["user_id"], r["n_events"]) for r in final} ==
            {(r["user_id"], r["n"]) for r in batch})


def test_stream_stream_full_outer_emits_both_unmatched(spark, tmp_path):
    """FULL-outer stream-stream join: unmatched rows on BOTH sides
    emit with NULLs once the watermark passes their join windows —
    the third outer mode (inner and left_outer are covered above),
    completing the stream-stream join surface."""
    import datetime as dt
    import time

    from mapreduce_wsi_spark.streaming.windows import correlate_streams

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write(path_dir, rows, schema):
        spark.createDataFrame(rows, schema) \
            .coalesce(1).write.mode("append").parquet(path_dir)
        time.sleep(1.1)

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    lsch = "user_id long, ts timestamp, eid_l long"
    rsch = "user_id_r long, ts_r timestamp, eid_r long"
    # left: user 1 (matches), user 2 (never matches)
    write(lsrc, [(1, t0, 101), (2, t0, 102)], lsch)
    # right: match for user 1 + an unmatched RIGHT row for user 3
    write(rsrc, [(1, t0 + dt.timedelta(minutes=10), 201),
                 (3, t0 + dt.timedelta(minutes=5), 203)], rsch)
    # far-future rows on both sides push the min-across-sources watermark
    write(rsrc, [(99, t0 + dt.timedelta(hours=12), 299)], rsch)
    write(lsrc, [(98, t0 + dt.timedelta(hours=12), 198)], lsch)

    sl = (spark.readStream.schema(lsch)
          .option("maxFilesPerTrigger", 1).parquet(lsrc))
    sr = (spark.readStream.schema(rsch)
          .option("maxFilesPerTrigger", 1).parquet(rsrc))
    joined = correlate_streams(sl, sr, watermark="30 minutes",
                               how="full_outer").select("eid_l", "eid_r")
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName("ss_full").start())
    try:
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["eid_l"], r["eid_r"])
           for r in spark.sql("SELECT * FROM ss_full").collect()}
    assert (101, 201) in got            # matched pair
    assert (102, None) in got           # unmatched left
    assert (None, 203) in got           # unmatched right
