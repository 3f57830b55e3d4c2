"""Streaming-surface queries in their batch-testable form (SURVEY.md §2C).

Each is the exact logical plan the streaming module runs incrementally
(streaming/windows.py) executed as a batch aggregation — the DuckDB-checkable
twin the driver contract asks for. True readStream paths are exercised in
tests/test_streaming.py (non-SQL-expressible -> not oracle entries).

Window alignment: Spark tumbling/sliding windows align to the Unix epoch;
the oracles reproduce that with date_trunc / epoch-bucket arithmetic (both
are midnight-aligned, and the fixture windows divide a day evenly).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_wsi_spark.plans.registry import register, tbl


@register(
    "stream_tumbling_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR AS window_end,
           event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    note="tumbling 1h window agg (batch twin of streaming/windows.py:"
         "tumbling_counts); single shuffle on (window, type)")
def stream_tumbling_window(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                 .alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "sum_value"))


@register(
    "stream_sliding_window",
    oracle="""
    WITH buck AS (
        SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP)
                   AS window_start, event_type
        FROM events
        UNION ALL
        SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP)
                   - INTERVAL 30 MINUTE, event_type
        FROM events
    )
    SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
           event_type, count(*) AS n
    FROM buck GROUP BY 1, 2, 3
    """,
    note="sliding 1h/30m window: every event lands in exactly 2 windows; "
         "oracle replays the expansion with epoch-bucket arithmetic")
def stream_sliding_window(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                       "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), "event_type", "n"))


@register(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, sess_id
    """,
    note="session windows (30m gap) per user; oracle is the classic "
         "gaps-and-islands rewrite. Spark session semantics: event joins a "
         "session iff ts < last_ts + gap (end-exclusive), end = last_ts + gap")
def stream_session_window(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    return (ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events"))


@register(
    "stream_stream_join",
    oracle="""
    SELECT c.event_id AS eid_l, v.event_id AS eid_r, c.user_id,
           c.ts AS ts, v.ts AS ts_r
    FROM events c JOIN events v
      ON v.user_id = c.user_id
     AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND v.event_type = 'view'
    """,
    note="batch twin of the stream-stream interval join (streaming/"
         "windows.py:correlate_streams — watermarks on both sides + the "
         "time-range condition bound the buffered state; true-streaming "
         "semantics incl. left-outer watermark emission in "
         "tests/test_streaming.py): clicks pair with same-user views "
         "within the following 30 minutes. withWatermark is a no-op on "
         "the batch path, so the exact streaming plan runs against the "
         "oracle")
def stream_stream_join(spark, sf_dir):
    from mapreduce_wsi_spark.streaming.windows import correlate_streams
    ev = tbl(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("eid_l"), "user_id", "ts"))
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("eid_r"),
                     F.col("user_id").alias("user_id_r"),
                     F.col("ts").alias("ts_r")))
    joined = correlate_streams(clicks, views, on="user_id",
                               within="30 minutes")
    return joined.select("eid_l", "eid_r", "user_id", "ts", "ts_r")


@register(
    "stream_stream_left_outer",
    oracle="""
    SELECT c.event_id AS eid_l, v.event_id AS eid_r, c.user_id,
           c.ts AS ts, v.ts AS ts_r
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.user_id = c.user_id
     AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    note="batch twin of the LEFT-OUTER stream-stream join: clicks with "
         "no same-user view in the following 30min survive with a NULL "
         "right side — in true streaming those rows emit only once the "
         "watermark passes their join window (the canonical outer-join "
         "gotcha, pinned in test_stream_stream_left_outer_emits_"
         "unmatched_after_watermark); the batch twin pins the row set "
         "that emission must converge to")
def stream_stream_left_outer(spark, sf_dir):
    from mapreduce_wsi_spark.streaming.windows import correlate_streams
    ev = tbl(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("eid_l"), "user_id", "ts"))
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("eid_r"),
                     F.col("user_id").alias("user_id_r"),
                     F.col("ts").alias("ts_r")))
    joined = correlate_streams(clicks, views, on="user_id",
                               within="30 minutes", how="left_outer")
    return joined.select("eid_l", "eid_r", "user_id", "ts", "ts_r")


@register(
    "stream_dedup_within_watermark",
    oracle="""
    WITH arrivals AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
        FROM events
        UNION ALL
        SELECT event_id, CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE,
               user_id, event_type
        FROM events)
    SELECT event_id, ts, user_id, event_type
    FROM arrivals
    QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY ts) = 1
    """,
    note="batch twin of streaming dedup-within-watermark "
         "(streaming/windows.py:dedup_within_watermark, true-streaming "
         "semantics in tests/test_streaming.py): duplicates are planted "
         "deterministically (every event re-arrives 30min late) and the "
         "first arrival per event_id must survive")
def stream_dedup_within_watermark(spark, sf_dir):
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type")
    late = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
    both = ev.unionByName(late)
    w = Window.partitionBy("event_id").orderBy("ts")
    return (both.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))
