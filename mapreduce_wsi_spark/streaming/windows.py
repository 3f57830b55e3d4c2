"""Streaming windowed aggregation: tumbling / sliding / session windows,
watermarks, and dedup-within-watermark.

Batch twins of these plans live in plans/q_streaming.py (that's what the
DuckDB oracle can check); here the same logical plans run incrementally.
At scale the state store is the thing to protect: every operator takes a
watermark so state is evicted, and keys are (window, type)- or user-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def stream_events(spark: SparkSession, path: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of events with a proper timestamp column.

    File streams need an explicit schema; take it from a batch footer
    read of the same path so the stream adapts to whichever ts layout
    the fixture shipped (raw nanos long or TIMESTAMP_NTZ micros — see
    registry.normalize_event_ts)."""
    from mapreduce_wsi_spark.plans.registry import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(path)
    return normalize_event_ts(raw)


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str | None = "2 hours") -> DataFrame:
    """Tumbling-window count+sum per event type; watermark bounds state and
    admits late data up to the delay."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                 .alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "sum_value"))


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str | None = "2 hours") -> DataFrame:
    src = events.withWatermark("ts", watermark) if watermark else events
    return (src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), "event_type", "n"))


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str | None = "2 hours") -> DataFrame:
    """Session windows per user: a session extends while the next event
    arrives strictly before last_ts + gap; end = last_ts + gap."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events"))


def dedup_within_watermark(events: DataFrame, keys: list[str],
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming dedup with bounded state: duplicates arriving within the
    watermark delay of each other are dropped; state for old keys evicted."""
    return events.withWatermark("ts", watermark) \
        .dropDuplicatesWithinWatermark(keys)


def run_stream_to_memory(df: DataFrame, name: str,
                         output_mode: str = "complete") -> DataFrame:
    """Drive a streaming plan to completion over a finite file source and
    return the materialized result (test/verification harness)."""
    q = (df.writeStream.outputMode(output_mode)
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {name}")


def enrich_with_static(events: DataFrame, dim: DataFrame,
                       on: str = "user_id") -> DataFrame:
    """Stream-static join: each microbatch joins against the (re-read)
    static side — at 100 TB the dim is a broadcast or bucketed table and
    the stream side never re-shuffles history."""
    return events.join(F.broadcast(dim), on=on, how="left")


def correlate_streams(left: DataFrame, right: DataFrame,
                      on: str = "user_id",
                      left_ts: str = "ts", right_ts: str = "ts_r",
                      within: str = "1 hour",
                      watermark: str = "2 hours",
                      how: str = "inner") -> DataFrame:
    """Stream-stream join: pair events per key whose event times lie
    within ``within`` of each other. Both sides carry watermarks plus a
    time-range join condition, so Spark can bound the join state it
    buffers (without the range condition, state grows forever).

    ``how='left_outer'``: unmatched left rows are NOT dropped — they emit
    with a NULL right side once the watermark passes their join window
    (i.e. only when a match has become impossible). Until the watermark
    moves past them they sit in state, so the last events of a stream
    surface only after later data (or an empty-batch watermark advance)
    pushes the watermark — the canonical stream-outer-join gotcha."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = ((l[on] == r[f"{on}_r"]) &
            (r[right_ts] >= l[left_ts]) &
            (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}")))
    return l.join(r, cond, how)
