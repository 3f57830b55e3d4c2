"""Behavioral / event-sequence analytics catalog entries (events table).

The event-log analyses a reference user would hand-script as map/reduce
passes (reference: src/MapReduceWSIImpl.java:89-197 runs arbitrary
per-row programs), expressed declaratively: funnels, cohort retention,
transition matrices, sweep-line concurrency, rolling outlier detection,
robust (median/MAD) stats, winsorized aggregation, and partial-sketch
rollup (HLL merge across grains — the at-scale pattern where per-day
sketches are stored and merged instead of rescanning raw data).

Cross-engine exactness: event values carry exactly 2 decimals
(FIXTURES.md), so every derived statistic here is computed in integer
cents with multiplied-through inequalities — no floats, no division —
and timestamps stay in microseconds end-to-end. DuckDB's window
sum(BIGINT) widens to HUGEINT; every oracle casts aggregates back to
BIGINT so the driver's type-aware hash sees identical schemas.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.behavior import (
    cohort_retention,
    funnel_first_touch,
    peak_concurrency,
    rolling_zscore_anomalies,
    transition_counts,
)
from mapreduce_wsi_spark.operators.pipeline import quantile_disc
from mapreduce_wsi_spark.plans.registry import register, tbl


@register(
    "funnel_steps",
    oracle="""
    WITH w1 AS (
        SELECT user_id, ts, event_type,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t0
        FROM events
    ), w2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > t0 THEN ts END)
                      OVER (PARTITION BY user_id) AS t1
        FROM w1
    ), w3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t1 THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM w2
    ), per AS (
        SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
        FROM w3 GROUP BY user_id
    )
    SELECT count(t0) AS users_view, count(t1) AS users_click,
           count(t2) AS users_purchase
    FROM per
    """,
    note="first-touch funnel view > click > purchase (strict ts order); "
         "chained conditional window-mins ride ONE user_id shuffle "
         "(exchange reuse) — operators/behavior.py:funnel_first_touch")
def funnel_steps(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    per = funnel_first_touch(ev, ("view", "click", "purchase"))
    return per.agg(F.count("t0").alias("users_view"),
                   F.count("t1").alias("users_click"),
                   F.count("t2").alias("users_purchase"))


@register(
    "event_transition_matrix",
    oracle="""
    WITH lagged AS (
        SELECT event_type AS next_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, next_type, count(*) AS n
    FROM lagged WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
    note="Markov transition counts over per-user event sequences, total "
         "order (ts, event_id); lag window + small-keyspace groupBy")
def event_transition_matrix(spark, sf_dir):
    return transition_counts(tbl(spark, sf_dir, "events"))


@register(
    "cohort_retention_weekly",
    oracle="""
    WITH base AS (
        SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
               CAST(min(date_trunc('week', ts))
                        OVER (PARTITION BY user_id) AS DATE) AS cohort_week
        FROM events
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, wk) // 7 AS BIGINT)
               AS week_offset,
           count(DISTINCT user_id) AS active_users
    FROM base GROUP BY cohort_week, week_offset
    """,
    note="weekly cohort retention grid (first-activity week x offset); "
         "Monday-aligned date_trunc('week') in both engines")
def cohort_retention_weekly(spark, sf_dir):
    return cohort_retention(tbl(spark, sf_dir, "events"))


@register(
    "interval_peak_concurrency",
    oracle="""
    WITH pts AS (
        SELECT event_type, ts AS t, 1 AS delta FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL 5 MINUTE AS t, -1 AS delta
        FROM events
    ), sweep AS (
        SELECT event_type, delta,
               CAST(sum(delta) OVER (PARTITION BY event_type
                                     ORDER BY t, delta
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS active
        FROM pts
    )
    SELECT event_type, max(active) AS peak_concurrency,
           CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_intervals
    FROM sweep GROUP BY event_type
    """,
    note="sweep-line max-overlap of [ts, ts+5min) intervals; (t, delta) "
         "order makes same-instant end-before-start = half-open semantics. "
         "Spark side is the scalable two-phase sweep (per-day windows + "
         "broadcast day-offset table) — oracle is the single-window twin")
def interval_peak_concurrency(spark, sf_dir):
    return peak_concurrency(tbl(spark, sf_dir, "events"),
                            duration="5 minutes")


@register(
    "anomaly_zscore_rolling",
    oracle="""
    WITH sc AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS xc,
               count(*) OVER w AS n,
               sum(CAST(round(value * 100) AS BIGINT)) OVER w AS s,
               sum(CAST(round(value * 100) AS BIGINT)
                   * CAST(round(value * 100) AS BIGINT)) OVER w AS ss
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id,
           count(*) FILTER (WHERE n >= 12) AS n_scored,
           count(*) FILTER (WHERE n >= 12
                            AND (n*xc - s) * (n*xc - s) * (n - 1)
                                > 9 * n * (n*ss - s*s)) AS n_anomalies
    FROM sc GROUP BY user_id
    """,
    note="rolling |z|>3 outliers over a 20-event preceding frame per "
         "user, decided by the multiplied-through integer-cents "
         "inequality (n*x-s)^2*(n-1) > 9*n*(n*ss-s^2) — zero floats, "
         "bit-identical across engines; ~265 anomalies at sf0.01 so the "
         "check is non-vacuous")
def anomaly_zscore_rolling(spark, sf_dir):
    return rolling_zscore_anomalies(tbl(spark, sf_dir, "events"),
                                    lookback=20, min_n=12)


@register(
    "winsorized_sum",
    oracle="""
    WITH cd AS (
        SELECT event_type, value,
               cume_dist() OVER (PARTITION BY event_type
                                 ORDER BY value) AS cd
        FROM events
    ), q AS (
        SELECT event_type,
               min(CASE WHEN cd >= 0.05 THEN value END) AS p05,
               min(CASE WHEN cd >= 0.95 THEN value END) AS p95
        FROM cd GROUP BY event_type
    )
    SELECT e.event_type, q.p05 AS p05, q.p95 AS p95,
           CAST(sum(least(greatest(CAST(round(e.value * 100) AS BIGINT),
                                   CAST(round(q.p05 * 100) AS BIGINT)),
                          CAST(round(q.p95 * 100) AS BIGINT))) AS BIGINT)
               AS sum_winsorized_cents
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type, q.p05, q.p95
    """,
    note="winsorized sum per type: clamp to exact PERCENTILE_DISC "
         "p05/p95 (cume_dist recipe, values that exist in the data so "
         "they compare bitwise) then sum in integer cents; the 5-row "
         "quantile table joins back broadcast")
def winsorized_sum(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    q = (quantile_disc(ev, "event_type", "value", (0.05, 0.95))
         .select("event_type", F.col("p5").alias("p05"),
                 F.col("p95").alias("p95")))
    cents = F.round(F.col("value") * 100).cast("bigint")
    lo = F.round(F.col("p05") * 100).cast("bigint")
    hi = F.round(F.col("p95") * 100).cast("bigint")
    return (ev.join(F.broadcast(q), "event_type")
            .withColumn("clipped", F.least(F.greatest(cents, lo), hi))
            .groupBy("event_type", "p05", "p95")
            .agg(F.sum("clipped").alias("sum_winsorized_cents")))


@register(
    "robust_mad_stats",
    oracle="""
    WITH cd AS (
        SELECT event_type, value,
               cume_dist() OVER (PARTITION BY event_type
                                 ORDER BY value) AS cd
        FROM events
    ), med AS (
        SELECT event_type,
               min(CASE WHEN cd >= 0.5 THEN value END) AS med
        FROM cd GROUP BY event_type
    ), dev AS (
        SELECT e.event_type,
               abs(CAST(round(e.value * 100) AS BIGINT)
                   - CAST(round(m.med * 100) AS BIGINT)) AS d
        FROM events e JOIN med m USING (event_type)
    ), cd2 AS (
        SELECT event_type, d,
               cume_dist() OVER (PARTITION BY event_type ORDER BY d) AS cd
        FROM dev
    ), mad AS (
        SELECT event_type, min(CASE WHEN cd >= 0.5 THEN d END) AS mad_cents
        FROM cd2 GROUP BY event_type
    )
    SELECT m.event_type,
           CAST(round(m.med * 100) AS BIGINT) AS median_cents,
           mad.mad_cents AS mad_cents
    FROM med m JOIN mad USING (event_type)
    """,
    note="median + MAD per type via two exact PERCENTILE_DISC passes in "
         "integer cents (deviations from a disc median are themselves "
         "exact); robust-stats building block for outlier fences")
def robust_mad_stats(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    med = (quantile_disc(ev, "event_type", "value", (0.5,))
           .select("event_type",
                   F.round(F.col("p50") * 100).cast("bigint")
                   .alias("median_cents")))
    cents = F.round(F.col("value") * 100).cast("bigint")
    dev = (ev.join(F.broadcast(med), "event_type")
           .select("event_type",
                   F.abs(cents - F.col("median_cents")).alias("d")))
    mad = (quantile_disc(dev, "event_type", "d", (0.5,))
           .select("event_type", F.col("p50").alias("mad_cents")))
    return med.join(F.broadcast(mad), "event_type") \
        .select("event_type", "median_cents", "mad_cents")


@register(
    "ols_trend_per_type",
    oracle="""
    WITH b AS (
        SELECT event_type,
               CAST(floor((epoch(date_trunc('second', ts))
                           - epoch(TIMESTAMP '2024-01-01 00:00:00'))
                          / 3600.0) AS BIGINT) AS x,
               CAST(round(value * 100) AS BIGINT) AS y
        FROM events
    )
    SELECT event_type, count(*) AS n,
           CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
               AS slope_num,
           CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
               AS slope_den
    FROM b GROUP BY event_type
    """,
    note="closed-form OLS trend of value-vs-time per type, kept exact: "
         "x in whole hours since the epoch anchor, y in cents, and the "
         "slope reported as the integer pair (num, den) of "
         "(n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) — no floating point, so the "
         "driver hash is bit-exact; one partial-aggregated groupBy "
         "(the moment sums are classic map-side combine). x is FLOOR of "
         "second-truncated epoch deltas on BOTH sides (floor == trunc "
         "only for post-anchor events; a fixture regen with pre-anchor "
         "timestamps must not split the engines, so neither side uses "
         "trunc-toward-zero date_diff/div)")
def ols_trend_per_type(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.floor((F.unix_timestamp("ts") -
                 F.unix_timestamp(F.lit("2024-01-01 00:00:00")
                                  .cast("timestamp"))) / F.lit(3600.0))
        .cast("bigint").alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"))
    agg = b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    return agg.select(
        "event_type", "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .alias("slope_den"))


@register(
    "rfm_scores",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                              DATE '2002-01-01') AS BIGINT) AS recency_days,
               count(*) AS frequency,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_score,
           ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
           ntile(4) OVER (ORDER BY monetary_cents DESC, o_custkey)
               AS m_score
    FROM cust
    """,
    note="RFM customer quartiles (recency vs 2002-01-01 anchor, "
         "frequency, monetary in cents) with deterministic (metric, "
         "custkey) ties. r10: the three GLOBAL ntile windows (every "
         "customer through one task) are replaced by the factored "
         "bucketed prefix-sum ntile (operators/pipeline.py::"
         "ntile_bucketed with empty part_cols = global): rank within "
         "value-range buckets, broadcast exclusive bucket prefixes, "
         "arithmetic quartile — bit-identical to ntile(4) (DESC "
         "orders via negated columns, same custkey tie-break). The "
         "oracle still runs the three ntile windows; the plan test "
         "pins ntile out and bucket keys into every row-level window")
def rfm_scores(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import ntile_bucketed

    o = tbl(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.datediff(F.lit("2002-01-01").cast("date"),
                   F.max(F.col("o_orderdate").cast("date")))
        .cast("bigint").alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .alias("monetary_cents"))
    s = (cust.withColumn("__negf", -F.col("frequency"))
         .withColumn("__negm", -F.col("monetary_cents")))
    s = ntile_bucketed(s, [], "recency_days", "o_custkey",
                       n_tiles=4, bucket_width=64, tile_col="r_score")
    s = ntile_bucketed(s, [], "__negf", "o_custkey",
                       n_tiles=4, bucket_width=4, tile_col="f_score")
    s = ntile_bucketed(s, [], "__negm", "o_custkey",
                       n_tiles=4, bucket_width=65536, tile_col="m_score")
    return s.select(
        "o_custkey", "recency_days", "frequency", "monetary_cents",
        "r_score", "f_score", "m_score")


@register(
    "trending_topk_daily",
    oracle="""
    WITH c AS (
        SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
        FROM events GROUP BY day, event_type
    )
    SELECT day, event_type, n,
           CAST(rnk AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY day
                                       ORDER BY n DESC, event_type) AS rnk
          FROM c)
    WHERE rnk <= 3
    """,
    note="per-day trending top-3 event types: partial-agg counts, then "
         "rank within day partitions with a total (n DESC, type) order; "
         "the window sees post-aggregation rows (days x types), not the "
         "event stream")
def trending_topk_daily(spark, sf_dir):
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events")
    c = (ev.groupBy(F.to_date("ts").alias("day"), "event_type")
         .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("day").orderBy(F.col("n").desc(), "event_type")
    return (c.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3))


@register(
    "stateful_user_stats",
    oracle="""
    WITH sc AS (
        SELECT user_id, ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS yc,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           count(*) AS n,
           CAST(sum(yc) AS BIGINT) AS sum_cents,
           min(yc) AS min_cents, max(yc) AS max_cents,
           CAST(max(CASE WHEN rn = 1 THEN yc END) AS BIGINT)
               AS last_cents
    FROM sc GROUP BY user_id
    """,
    note="custom stateful aggregation surface in its batch-checkable "
         "form: an Arrow applyInPandas kernel folds each user's ordered "
         "event stream into running state (n/sum/min/max/last) — the "
         "same per-key fold streaming/stateful.py runs incrementally "
         "under applyInPandasWithState; oracle recovers the fold with "
         "plain SQL aggregates")
def stateful_user_stats(spark, sf_dir):
    import pandas as pd

    ev = tbl(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("yc"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "n": [len(pdf)],
            "sum_cents": [pdf["yc"].sum()],
            "min_cents": [pdf["yc"].min()],
            "max_cents": [pdf["yc"].max()],
            "last_cents": [pdf["yc"].iloc[-1]],
        })

    return ev.groupBy("user_id").applyInPandas(
        fold, "user_id long, n long, sum_cents long, min_cents long, "
              "max_cents long, last_cents long")


@register(
    "attribution_last_touch",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, 1 AS tag, event_id,
               CAST(NULL AS BIGINT) AS click_id,
               CAST(NULL AS TIMESTAMP) AS click_ts
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, 0, NULL, event_id, ts
        FROM events WHERE event_type = 'click'
    ), carried AS (
        SELECT user_id, ts, tag, event_id,
               last_value(click_id IGNORE NULLS) OVER w AS click_id,
               last_value(click_ts IGNORE NULLS) OVER w AS click_ts
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_id, user_id, ts,
           CASE WHEN click_ts IS NOT NULL
                 AND date_diff('second', click_ts, ts) <= 3600
                THEN click_id END AS attributed_click_id,
           CASE WHEN click_ts IS NOT NULL
                 AND date_diff('second', click_ts, ts) <= 3600
                THEN CAST(date_diff('second', click_ts, ts) AS BIGINT)
           END AS latency_s
    FROM carried WHERE tag = 1
    """,
    note="last-touch attribution: each purchase joined as-of backward to "
         "the user's most recent click, attributed only within a 1-hour "
         "window (tolerance applied post-carry). Rides the as-of "
         "union+carry composition (operators/relational.py:asof_join) — "
         "one user_id shuffle, no range explosion; (user_id, ts) is "
         "collision-free in the fixtures so the carry is total-ordered")
def attribution_last_touch(spark, sf_dir):
    from mapreduce_wsi_spark.operators.relational import asof_join

    ev = tbl(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("click_ts"))
    j = asof_join(p, c, on=["user_id"], left_ts="ts", right_ts="click_ts",
                  right_values=["click_id"])
    lat = F.expr("unix_timestamp(ts) - unix_timestamp(click_ts_asof)")
    within = F.col("click_ts_asof").isNotNull() & (lat <= 3600)
    return j.select(
        "event_id", "user_id", "ts",
        F.when(within, F.col("click_id_asof")).alias("attributed_click_id"),
        F.when(within, lat.cast("bigint")).alias("latency_s"))


@register(
    "session_path_trigrams",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               -- date_diff('second') counts whole-second boundaries =
               -- Spark's cast-to-long truncation (the sessionize_lag_cumsum
               -- pairing); an exact INTERVAL comparison would disagree on
               -- sub-second boundary gaps
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) >= 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
    ), tri AS (
        SELECT user_id, sess_id, event_type,
               lag(event_type, 2) OVER w2 AS t1,
               lag(event_type, 1) OVER w2 AS t2,
               lag(sess_id, 2) OVER w2 AS s1,
               lag(sess_id, 1) OVER w2 AS s2
        FROM sess
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1 || '>' || t2 || '>' || event_type AS trigram,
           count(*) AS n
    FROM tri
    WHERE s1 = sess_id AND s2 = sess_id
    GROUP BY trigram
    ORDER BY n DESC, trigram LIMIT 10
    """,
    note="sequential pattern mining lite: 30-min-gap sessionization "
         "(gaps-and-islands) then event-type trigrams that stay inside "
         "one session (lagged sess_id equality), global top-10 by the "
         "total (n DESC, trigram) order. Both lag frames and the "
         "session cumsum ride ONE user_id exchange")
def session_path_trigrams(spark, sf_dir):
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    sess = (ev
            .withColumn("new_sess",
                        F.when(F.lag("ts").over(w).isNull()
                               | (gap >= 1800), 1).otherwise(0))
            .withColumn("sess_id", F.sum("new_sess").over(run)))
    tri = (sess
           .withColumn("t1", F.lag("event_type", 2).over(w))
           .withColumn("t2", F.lag("event_type", 1).over(w))
           .withColumn("s1", F.lag("sess_id", 2).over(w))
           .withColumn("s2", F.lag("sess_id", 1).over(w))
           .filter((F.col("s1") == F.col("sess_id"))
                   & (F.col("s2") == F.col("sess_id"))))
    return (tri.select(F.concat_ws(">", "t1", "t2", "event_type")
                       .alias("trigram"))
            .groupBy("trigram").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), "trigram").limit(10))


@register(
    "hll_sketch_rollup",
    oracle="""
    SELECT count(DISTINCT CAST(ts AS DATE)) AS n_days,
           true AS users_within_tol
    FROM events
    """,
    note="partial-sketch rollup: per-day Datasketches HLL of user_id, "
         "merged with hll_union_agg to a whole-range estimate — the "
         "at-scale pattern (store day sketches, merge grains, never "
         "rescan raw). Contract: merged estimate within 5% of the exact "
         "distinct-user count (lgConfigK=12 => ~1.6% rse, so 5% ≈ 3 "
         "sigma). FIXTURE-DEPENDENT tolerance, same class as "
         "approx_distinct_hll: the oracle hard-codes "
         "users_within_tol=true, so the 5% bound is asserted Spark-side "
         "only — if a fixture regeneration ever flips this entry red "
         "with no code change, triage it as a margin event (estimate "
         "landed outside 3 sigma on the new draw), not a sketch bug; "
         "the exactness anchor is the oracle-checked n_days")
def hll_sketch_rollup(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    daily = (ev.groupBy(F.to_date("ts").alias("day"))
             .agg(F.hll_sketch_agg("user_id", 12).alias("sk")))
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"))
    exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    both = merged.crossJoin(F.broadcast(exact))
    within = (F.abs(F.col("approx_users").cast("double")
                    - F.col("exact_users"))
              / F.col("exact_users")) <= 0.05
    return both.select("n_days", within.alias("users_within_tol"))


@register(
    "events_ewma_smooth",
    oracle="""
    WITH r AS (
        SELECT event_id, user_id,
               CAST(round(value * 100) AS BIGINT) AS xc,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events)
    SELECT event_id, user_id, CAST(rn AS INT) AS rn, num, den,
           CAST(num AS DOUBLE) / den AS ewma_cents
    FROM (
        SELECT a.event_id, a.user_id, a.rn,
               CAST(sum(b.xc * (CAST(1 AS BIGINT) << (9 - (a.rn - b.rn))))
                    AS BIGINT) AS num,
               CAST(sum(CAST(1 AS BIGINT) << (9 - (a.rn - b.rn)))
                    AS BIGINT) AS den
        FROM r a JOIN r b ON a.user_id = b.user_id
                         AND b.rn BETWEEN a.rn - 9 AND a.rn
        GROUP BY 1, 2, 3) t
    """,
    note="EWMA smoothing (alpha=0.5, last-10 frame) per user in EXACT "
         "integer arithmetic: cents x power-of-two weights -> integer "
         "num/den, one correctly-rounded final division — bit-identical "
         "across engines like the integer-cents z-score. Spark plans ONE "
         "window shuffle (bounded collect_list + JVM weighted fold, no "
         "self-join); the DuckDB twin is the equivalent rn-range "
         "self-join (operators/behavior.py::ewma_smooth)")
def events_ewma_smooth(spark, sf_dir):
    from mapreduce_wsi_spark.operators.behavior import ewma_smooth
    return ewma_smooth(tbl(spark, sf_dir, "events"))


@register(
    "sketch_kmv_overlap",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view'),
    b AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase'),
    u AS (SELECT count(*) AS n_union FROM
          (SELECT user_id FROM a UNION SELECT user_id FROM b) t),
    i AS (SELECT count(*) AS n_inter FROM a JOIN b USING (user_id))
    SELECT CAST(n_union AS BIGINT) AS exact_union,
           CAST(n_inter AS BIGINT) AS exact_inter,
           n_union > 64 AS saturated,
           true AS union_ok,
           true AS inter_ok
    FROM u, i
    """,
    note="KMV/theta-style distinct sketch (k=64 minimum hash values): "
         "audience-overlap estimation — set INTERSECTION cardinality, "
         "which HLL structurally cannot do (Beyer et al. SIGMOD'07). "
         "Driver contract: union and intersection estimates within 25% "
         "of the exact counts computed in the same plan (measured ~2% "
         "at sf0.01, deterministic — xxhash64, no randomness); "
         "'saturated' (exact in SQL on both sides) records whether the "
         "sketch actually estimated or degenerated to exact "
         "(operators/sketch.py::kmv_sketch / kmv_overlap_estimate)")
def sketch_kmv_overlap(spark, sf_dir):
    from mapreduce_wsi_spark.operators.sketch import (
        kmv_overlap_estimate,
        kmv_sketch,
    )
    k = 64
    ev = tbl(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    est = kmv_overlap_estimate(kmv_sketch(a, "user_id", k),
                               kmv_sketch(b, "user_id", k), k)
    ad, bd = a.distinct(), b.distinct()
    exact = (ad.unionByName(bd).distinct()
             .agg(F.count(F.lit(1)).alias("exact_union"))
             .crossJoin(ad.join(bd, "user_id")
                        .agg(F.count(F.lit(1)).alias("exact_inter"))))
    tol = 0.25
    return (exact.crossJoin(est).select(
        F.col("exact_union").cast("bigint").alias("exact_union"),
        F.col("exact_inter").cast("bigint").alias("exact_inter"),
        (F.col("exact_union") > k).alias("saturated"),
        (F.abs(F.col("est_union") - F.col("exact_union"))
         <= F.lit(tol) * F.col("exact_union")).alias("union_ok"),
        (F.abs(F.col("est_inter") - F.col("exact_inter"))
         <= F.lit(tol) * F.col("exact_union")).alias("inter_ok")))


@register(
    "topp_mass_cutoff",
    oracle="""
    WITH g AS (SELECT event_type, user_id,
                      CAST(sum(CAST(round(value * 100) AS BIGINT))
                           AS BIGINT) AS amt_c
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, user_id, amt_c,
                 sum(amt_c) OVER (PARTITION BY event_type
                                  ORDER BY amt_c DESC, user_id
                                  ROWS UNBOUNDED PRECEDING) AS run_c,
                 sum(amt_c) OVER (PARTITION BY event_type) AS tot_c
          FROM g)
    SELECT event_type, user_id, amt_c,
           CAST(run_c AS BIGINT) AS run_c
    FROM r
    WHERE (run_c - amt_c) * 10 < tot_c * 9
    """,
    note="top-p (nucleus) selection per group: the smallest prefix of "
         "users (by spend desc, id tie-break) covering 90% of each "
         "event_type's value mass — the probability-mass truncation "
         "pattern (vocab cuts, source mixing by mass). Decided by the "
         "multiplied-through integer-cents inequality (prev_cum * 10 "
         "< total * 9): zero floats, bit-identical across engines; a "
         "row enters iff the mass BEFORE it is still short of p. r10: "
         "the running sum is the BUCKETED prefix-sum (the ntile "
         "recipe's associative-statistic generalization, closing the "
         "last residual total-order site): in-bucket running sums "
         "keyed (event_type, spend-range bucket) compose with "
         "broadcast exclusive bucket masses — run_c is the identical "
         "integer, the oracle keeps the one-window form, and no "
         "window ever holds a whole event_type's user list")
def topp_mass_cutoff(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    g = (ev.groupBy("event_type", "user_id")
         .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
              .cast("bigint").alias("amt_c")))
    # bucket by the ORDER key (spend desc => floor(-amt/4096) asc):
    # equal amounts share a bucket, so (bucket asc, amt desc, user asc)
    # is exactly the old (amt desc, user asc) total order
    b = g.withColumn("__vb",
                     F.floor(-F.col("amt_c") / 4096).cast("long"))
    w_in = (Window.partitionBy("event_type", "__vb")
            .orderBy(F.col("amt_c").desc(), F.col("user_id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    within = b.withColumn("__rw", F.sum("amt_c").over(w_in))
    bsum = (b.groupBy("event_type", "__vb")
            .agg(F.sum("amt_c").alias("__bm")))
    w_b = (Window.partitionBy("event_type").orderBy("__vb")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = (bsum.withColumn("__pre",
                           F.sum("__bm").over(w_b) - F.col("__bm"))
           .select("event_type", "__vb", "__pre"))
    tot = (bsum.groupBy("event_type")
           .agg(F.sum("__bm").alias("tot_c")))
    r = (within.join(F.broadcast(pre), ["event_type", "__vb"])
         .join(F.broadcast(tot), "event_type")
         .withColumn("run_c", F.col("__rw") + F.col("__pre")))
    return (r.filter((F.col("run_c") - F.col("amt_c")) * 10
                     < F.col("tot_c") * 9)
            .select("event_type", "user_id", "amt_c",
                    F.col("run_c").cast("bigint").alias("run_c")))


@register(
    "theil_sen_user_trend",
    oracle="""
    WITH r AS (
        SELECT user_id, rn, yc FROM (
            SELECT user_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   CAST(round(value * 100) AS BIGINT) AS yc
            FROM events) t
        WHERE rn <= 30),
    p AS (SELECT a.user_id,
                 CAST(b.yc - a.yc AS DOUBLE) / (b.rn - a.rn) AS s
          FROM r a JOIN r b ON a.user_id = b.user_id AND a.rn < b.rn),
    c AS (SELECT user_id, s,
                 cume_dist() OVER (PARTITION BY user_id ORDER BY s) AS cd
          FROM p)
    SELECT user_id, CAST(count(*) AS INT) AS n_pairs,
           min(CASE WHEN cd >= 0.5 THEN s END) AS ts_slope
    FROM c GROUP BY user_id
    """,
    note="Theil-Sen robust trend per user (median of pairwise slopes "
         "over the first 30 events, x = rank, y = integer cents): the "
         "29%-breakdown robust counterpart of ols_trend_per_type — one "
         "wild outlier cannot drag it. Single-division doubles + "
         "PERCENTILE_DISC median, so bitwise cross-engine; the "
         "max_points cap bounds the quadratic pair step at O(k²) per "
         "key (operators/behavior.py::theil_sen_trend)")
def theil_sen_user_trend(spark, sf_dir):
    from mapreduce_wsi_spark.operators.behavior import theil_sen_trend
    return theil_sen_trend(tbl(spark, sf_dir, "events"))


@register(
    "funnel_within_window",
    oracle="""
    WITH w1 AS (
        SELECT user_id, ts, event_type,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t0
        FROM events
    ), w2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > t0
                           AND ts <= t0 + INTERVAL 1 DAY THEN ts END)
                      OVER (PARTITION BY user_id) AS t1
        FROM w1
    ), w3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t1
                           AND ts <= t1 + INTERVAL 1 DAY THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM w2
    ), per AS (
        SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
        FROM w3 GROUP BY user_id
    )
    SELECT count(t0) AS users_view, count(t1) AS users_click,
           count(t2) AS users_purchase
    FROM per
    """,
    note="CONVERSION-WINDOW funnel: view > click > purchase with each "
         "step within 1 day of the previous one (the form every "
         "funnel report actually uses — unbounded funnels overcount); "
         "identical one-shuffle chained-window plan as funnel_steps, "
         "the bound is one more predicate inside each conditional min "
         "(operators/behavior.py::funnel_first_touch max_gap)")
def funnel_within_window(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    per = funnel_first_touch(ev, ("view", "click", "purchase"),
                             max_gap="1 day")
    return per.agg(F.count("t0").alias("users_view"),
                   F.count("t1").alias("users_click"),
                   F.count("t2").alias("users_purchase"))


@register(
    "streak_longest_per_user",
    oracle="""
    WITH r AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rnt
        FROM events),
    isl AS (SELECT user_id, event_type, rn - rnt AS grp,
                   count(*) AS len
            FROM r GROUP BY 1, 2, 3),
    best AS (SELECT user_id, event_type, len FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                     ORDER BY len DESC, event_type) AS pick
                 FROM isl) t
             WHERE pick = 1)
    SELECT user_id, event_type AS streak_type,
           CAST(len AS INT) AS streak_len
    FROM best
    """,
    note="gaps-and-islands streaks: longest run of consecutive "
         "same-type events per user via the classic rn - rn_per_type "
         "island key (two windows over ONE user ordering, no "
         "self-join); ties broken (len desc, type) so the per-user "
         "champion is deterministic. The pattern behind retention "
         "streaks / consecutive-day badges at any scale — all windows "
         "partition on the user key")
def streak_longest_per_user(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type") \
        .orderBy("ts", "event_id")
    r = (ev.withColumn("rn", F.row_number().over(w_all))
         .withColumn("rnt", F.row_number().over(w_typ)))
    isl = (r.groupBy("user_id", "event_type",
                     (F.col("rn") - F.col("rnt")).alias("grp"))
           .agg(F.count(F.lit(1)).alias("len")))
    pick = Window.partitionBy("user_id").orderBy(
        F.desc("len"), F.col("event_type").asc())
    return (isl.withColumn("__p", F.row_number().over(pick))
            .filter(F.col("__p") == 1)
            .select("user_id", F.col("event_type").alias("streak_type"),
                    F.col("len").cast("int").alias("streak_len")))


@register(
    "window_moving_median",
    oracle="""
    WITH r AS (
        SELECT event_id, user_id,
               CAST(round(value * 100) AS BIGINT) AS xc,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events),
    fr AS (SELECT event_id, user_id, rn,
                  list_sort(list(xc) OVER (PARTITION BY user_id ORDER BY rn
                            ROWS BETWEEN 10 PRECEDING AND CURRENT ROW))
                      AS l
           FROM r)
    SELECT event_id, user_id, CAST(rn AS INT) AS rn,
           l[CAST(ceil(len(l) / 2.0) AS INT)] AS med_cents
    FROM fr
    """,
    note="rolling EXACT median over the last-11 frame per user (integer "
         "cents, PERCENTILE_DISC low-middle selection — an actual data "
         "value, bitwise cross-engine): the robust smoothing companion "
         "to the EWMA (one spike cannot move a median). One window "
         "shuffle; the frame rides a bounded collect_list like "
         "events_ewma_smooth")
def window_moving_median(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-10, 0)
    xc = F.round(F.col("value") * 100).cast("bigint")
    arr = F.array_sort(F.collect_list(xc).over(frame))
    s = F.size(arr)
    med = F.element_at(arr, F.ceil(s / F.lit(2.0)).cast("int"))
    return ev.select("event_id", "user_id",
                     F.row_number().over(w).alias("rn"),
                     med.alias("med_cents"))


@register(
    "sketch_tdigest_quantiles",
    oracle="""
    SELECT CAST(0.5 AS DOUBLE) AS q,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS exact,
           true AS within_tol
    FROM lineitem
    UNION ALL
    SELECT CAST(0.95 AS DOUBLE),
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95), true
    FROM lineitem
    UNION ALL
    SELECT CAST(0.99 AS DOUBLE),
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99), true
    FROM lineitem
    """,
    note="t-digest quantile sketch (Dunning & Ertl, delta=200): "
         "per-partition sort + k1 scale-function compression in one "
         "Arrow pass (only centroid rows move), single-task final "
         "merge, midpoint-interpolated p50/p95/p99. The sketch "
         "estimate is build-order-specific, so the driver contract is "
         "the approx_quantiles convention: the exact percentile "
         "(cross-engine anchored by quantile_cont_exact) plus a "
         "Spark-side <=1% relative-error boolean vs the in-plan exact "
         "(measured rank error ~3e-4 at delta=200) "
         "(operators/sketch.py::tdigest_quantiles)")
def sketch_tdigest_quantiles(spark, sf_dir):
    from mapreduce_wsi_spark.operators.sketch import tdigest_quantiles

    li = tbl(spark, sf_dir, "lineitem")
    est = tdigest_quantiles(li, "l_extendedprice", (0.5, 0.95, 0.99))
    exact = li.agg(
        F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.5)")
        .alias("e50"),
        F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.95)")
        .alias("e95"),
        F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.99)")
        .alias("e99"))
    joined = est.crossJoin(F.broadcast(exact))
    pick = (F.when(F.col("q") == 0.5, F.col("e50"))
            .when(F.col("q") == 0.95, F.col("e95"))
            .otherwise(F.col("e99")))
    return joined.select(
        "q", pick.alias("exact"),
        (F.abs(F.col("est") - pick) / pick <= 0.01).alias("within_tol"))


@register(
    "time_linear_interpolate",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, epoch_us(ts) AS t,
               CASE WHEN event_id % 5 = 0 THEN NULL
                    ELSE CAST(round(value * 100) AS BIGINT) END AS c
        FROM events),
    w AS (SELECT event_id, user_id, c,
                 t,
                 last_value(c IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS pv,
                 last_value(CASE WHEN c IS NOT NULL THEN t END
                            IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS pt,
                 first_value(c IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY t
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                     AS nv,
                 first_value(CASE WHEN c IS NOT NULL THEN t END
                             IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY t
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                     AS nt
          FROM base)
    SELECT event_id, user_id,
           round(CASE WHEN c IS NOT NULL THEN CAST(c AS DOUBLE)
                      WHEN pv IS NOT NULL AND nv IS NOT NULL
                           AND nt != pt
                      THEN CAST(pv AS DOUBLE)
                           + CAST(nv - pv AS DOUBLE) * (t - pt)
                             / (nt - pt)
                      ELSE CAST(coalesce(pv, nv) AS DOUBLE) END, 9)
               AS filled_cents,
           c IS NULL AS was_gap
    FROM w
    """,
    note="Linear interpolation gap-fill per user (every 5th event's "
         "value nulled deterministically, then reconstructed from its "
         "time-weighted neighbors; leading/trailing gaps fall back to "
         "the single anchor): integer cents + epoch-micros anchors -> "
         "one identical IEEE interpolation expression per engine. TWO "
         "ignore-nulls frames share ONE (user, ts) window exchange — "
         "no self-join, no spine "
         "(operators/behavior.py::linear_interpolate)")
def time_linear_interpolate(spark, sf_dir):
    from mapreduce_wsi_spark.operators.behavior import linear_interpolate

    ev = tbl(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_id") % 5 == 0, None)
        .otherwise(F.col("value")).alias("value"))
    out = linear_interpolate(ev, "user_id", "ts", "value")
    return out.select("event_id", "user_id", "filled_cents", "was_gap")


@register(
    "events_cusum_shift",
    oracle="""
    WITH base AS (SELECT user_id, ts, event_id,
                         CAST(round(value * 100) AS BIGINT) AS v
                  FROM events),
    tot AS (SELECT user_id, count(*) AS n, sum(v) AS s
            FROM base GROUP BY 1),
    p AS (SELECT b.user_id, t.n, b.ts, b.event_id,
                 sum(b.v * t.n - t.s) OVER w AS pp
          FROM base b JOIN tot t USING (user_id)
          WINDOW w AS (PARTITION BY b.user_id ORDER BY b.ts, b.event_id
                       ROWS UNBOUNDED PRECEDING)),
    e AS (SELECT user_id, n,
                 pp - least(0, min(pp) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING))
                     AS exc
          FROM p)
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           round(CAST(max(exc) AS DOUBLE) / (100.0 * n), 9)
               AS max_excursion
    FROM e GROUP BY user_id, n
    """,
    note="per-user CUSUM mean-shift score via the closed form "
         "S_i = P_i - least(0, running_min(P)) (P_0=0 baseline, so "
         "shift-up-first series score their full excursion): two "
         "stacked windows on ONE "
         "user_id exchange; deviations are mean-scaled to exact "
         "BIGINTs (n*v - sum), only the final unscaling divide is "
         "IEEE (operators/behavior.py::cusum_max_excursion)")
def events_cusum_shift(spark, sf_dir):
    from mapreduce_wsi_spark.operators.behavior import (
        cusum_max_excursion)
    ev = tbl(spark, sf_dir, "events")
    return cusum_max_excursion(ev, "user_id", "ts", "event_id", "value")


@register(
    "ts_autocorr_lag",
    oracle="""
    WITH daily AS (SELECT event_type,
                          CAST(ts AS DATE) AS d,
                          CAST(round(sum(CAST(value AS DECIMAL(18,2)))
                                     * 100) AS BIGINT) AS cents
                   FROM events GROUP BY 1, 2),
    lagged AS (SELECT event_type, 1 AS lag, cents AS y,
                      lag(cents, 1) OVER w AS x
               FROM daily WINDOW w AS (PARTITION BY event_type
                                       ORDER BY d)
               UNION ALL
               SELECT event_type, 2 AS lag, cents AS y,
                      lag(cents, 2) OVER w2 AS x
               FROM daily WINDOW w2 AS (PARTITION BY event_type
                                        ORDER BY d)),
    mm AS (SELECT event_type, lag, count(*) AS n,
                  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                  CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE)
                      AS sxx,
                  CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE)
                      AS syy,
                  CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE)
                      AS sxy
           FROM lagged WHERE x IS NOT NULL GROUP BY 1, 2)
    SELECT event_type, CAST(lag AS INT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx)
                    * sqrt(n * syy - sy * sy)), 9) AS acf
    FROM mm
    """,
    note="lag-1/lag-2 autocorrelation of the per-type daily-revenue "
         "series: the series pre-aggregates to (type, day) cents "
         "first, both lags reuse one window exchange, the five "
         "moments are exact DECIMAL(38,0) sums, r is one fixed IEEE "
         "expression (operators/behavior.py::autocorr_lags)")
def ts_autocorr_lag(spark, sf_dir):
    from mapreduce_wsi_spark.operators.behavior import autocorr_lags
    ev = tbl(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.col("ts").cast("date").alias("d"))
             .agg(F.sum(F.col("value").cast("decimal(18,2)"))
                  .alias("rev")))
    return autocorr_lags(daily, "event_type", "d", "rev", lags=(1, 2))


@register(
    "events_pattern_regex",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts)
                            >= 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
    ), j AS (
        SELECT user_id, sess_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS journey
        FROM sess GROUP BY 1, 2
    )
    SELECT 'v.*c.*p' AS pattern,
           CAST(sum(CASE WHEN regexp_matches(journey, 'v.*c.*p')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM j
    UNION ALL
    SELECT 's.*p',
           CAST(sum(CASE WHEN regexp_matches(journey, 's.*p')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM j
    UNION ALL
    SELECT 'e.*e.*e',
           CAST(sum(CASE WHEN regexp_matches(journey, 'e.*e.*e')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM j
    """,
    note="MATCH_RECOGNIZE-style sequence detection: 30-min "
         "sessionization (the session_path_trigrams pairing), each "
         "session folded to an ordered initial-letter journey string "
         "(array_sort over (ts, event_id, code) structs — "
         "deterministic without a second window), then unanchored "
         "regex per pattern (view->click->purchase, signup->purchase, "
         "3+ errors). The journey fold and both windows ride one "
         "user_id exchange; patterns are subsequence-safe because "
         "event-type initials are distinct in the fixture")
def events_pattern_regex(spark, sf_dir):
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    sess = (ev
            .withColumn("new_sess",
                        F.when(F.lag("ts").over(w).isNull()
                               | (gap >= 1800), 1).otherwise(0))
            .withColumn("sess_id", F.sum("new_sess").over(run)))
    j = (sess.groupBy("user_id", "sess_id")
         .agg(F.expr(
             "concat_ws('', transform("
             "array_sort(collect_list(struct(ts, event_id, "
             "substr(event_type, 1, 1) AS code))), x -> x.code))")
              .alias("journey")))
    pats = ["v.*c.*p", "s.*p", "e.*e.*e"]
    out = None
    for p in pats:
        row = j.agg(
            F.sum(F.when(F.col("journey").rlike(p), 1).otherwise(0))
            .cast("long").alias("n_sessions")).select(
                F.lit(p).alias("pattern"), "n_sessions")
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "ts_seasonality_dow",
    oracle="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                          CAST(round(sum(CAST(value AS DECIMAL(18,2)))
                                     * 100) AS BIGINT) AS cents
                   FROM events GROUP BY 1, 2),
    dw AS (SELECT event_type, isodow(d) - 1 AS dow,
                  count(*) AS n_days, sum(cents) AS s
           FROM daily GROUP BY 1, 2),
    tot AS (SELECT event_type, sum(cents) AS st, count(*) AS nt
            FROM daily GROUP BY 1)
    SELECT dw.event_type, CAST(dow AS INT) AS dow,
           CAST(n_days AS BIGINT) AS n_days,
           round(CAST(s AS DOUBLE) / (100.0 * n_days), 9) AS dow_mean,
           round(CAST(s AS DOUBLE) * nt
                 / (CAST(n_days AS DOUBLE) * st), 9) AS seasonal_ratio
    FROM dw JOIN tot USING (event_type)
    """,
    note="day-of-week seasonality profile per event type: daily cents "
         "pre-aggregate (exact DECIMAL), per-(type, dow) and per-type "
         "totals as exact BIGINTs, seasonal ratio = dow mean / type "
         "mean as ONE fixed IEEE expression over the exact counts. "
         "Monday=0 via Spark weekday() == DuckDB isodow()-1 (the "
         "dayofweek builtins disagree on week origin across engines)")
def ts_seasonality_dow(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.col("ts").cast("date").alias("d"))
             .agg(F.round(F.sum(F.col("value").cast("decimal(18,2)"))
                          * 100).cast("bigint").alias("cents")))
    dw = (daily.groupBy("event_type",
                        F.weekday("d").cast("int").alias("dow"))
          .agg(F.count(F.lit(1)).alias("n_days"),
               F.sum("cents").alias("s")))
    tot = (daily.groupBy("event_type")
           .agg(F.sum("cents").alias("st"),
                F.count(F.lit(1)).alias("nt")))
    return (dw.join(tot, "event_type")
            .select("event_type", "dow",
                    F.col("n_days").cast("long").alias("n_days"),
                    F.round(F.col("s").cast("double")
                            / (100.0 * F.col("n_days")), 9)
                    .alias("dow_mean"),
                    F.round(F.col("s").cast("double") * F.col("nt")
                            / (F.col("n_days").cast("double")
                               * F.col("st")), 9)
                    .alias("seasonal_ratio")))


@register(
    "ts_holt_forecast",
    oracle="""
    WITH RECURSIVE s AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS y,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events),
    init AS (
        SELECT a1.user_id, a1.n, 1 AS i,
               a1.y AS l, a2.y - a1.y AS b
        FROM s a1 JOIN s a2 ON a2.user_id = a1.user_id AND a2.rn = 2
        WHERE a1.rn = 1 AND a1.n >= 2),
    rec AS (
        SELECT user_id, n, i, l, b FROM init
        UNION ALL
        SELECT user_id, n, i, lnew AS l,
               (3 * (lnew - l) + 7 * b) // 10 AS b
        FROM (SELECT r.user_id, r.n, r.i + 1 AS i, r.l, r.b,
                     (2 * sy.y + 8 * (r.l + r.b)) // 10 AS lnew
              FROM rec r
              JOIN s sy ON sy.user_id = r.user_id AND sy.rn = r.i + 1
              WHERE r.i < r.n) t)
    SELECT user_id, CAST(n AS BIGINT) AS n,
           CAST(l AS BIGINT) AS level_cents,
           CAST(b AS BIGINT) AS trend_cents,
           CAST(l + b AS BIGINT) AS forecast_cents
    FROM rec WHERE i = n
    """,
    note="Holt double exponential smoothing per user (alpha=0.2, "
         "beta=0.3 as integer ratios, floor division — every state "
         "integer, so the walk is bit-exact cross-engine where float "
         "smoothing never hash-matches): 1-step-ahead forecast = "
         "level + trend. Sequential per key, parallel across keys as "
         "an Arrow applyInPandas fold (the stateful_user_stats "
         "shape); the twin replays the recurrence with WITH RECURSIVE "
         "(operators/behavior.py::holt_forecast)")
def ts_holt_forecast(spark, sf_dir):
    from mapreduce_wsi_spark.operators.behavior import holt_forecast
    ev = tbl(spark, sf_dir, "events")
    return holt_forecast(ev, "user_id", "ts", "event_id", "value")


@register(
    "dq_freshness_lag",
    oracle="""
    WITH m AS (SELECT event_type, max(ts) AS max_ts FROM events
               GROUP BY 1),
    g AS (SELECT max(max_ts) AS global_max FROM m)
    SELECT event_type, max_ts,
           CAST(date_diff('second', max_ts, global_max) AS BIGINT)
               AS lag_seconds,
           date_diff('second', max_ts, global_max) > 3600 AS is_stale
    FROM m, g
    """,
    note="per-source freshness audit: each event type's high-water "
         "timestamp vs the global high-water mark, lag in whole "
         "seconds (date_diff boundary-count == Spark cast-to-long "
         "difference on microsecond timestamps), stale flag at 1h — "
         "the ingestion-monitoring check a pipeline pages on. Two "
         "tiny aggregations, the global row broadcast")
def dq_freshness_lag(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(F.max("ts").alias("max_ts"))
    g = m.agg(F.max("max_ts").alias("global_max"))
    lag = (F.col("global_max").cast("long")
           - F.col("max_ts").cast("long"))
    return (m.crossJoin(F.broadcast(g))
            .select("event_type", "max_ts",
                    lag.alias("lag_seconds"),
                    (lag > 3600).alias("is_stale")))


@register(
    "session_duration_stats",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts)
                            >= 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_id,
               sum(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
    ), d AS (
        SELECT user_id, sess_id,
               date_diff('second', min(ts), max(ts)) AS dur,
               count(*) AS n_events
        FROM sess GROUP BY 1, 2
    ), cd AS (
        SELECT dur, n_events,
               cume_dist() OVER (ORDER BY dur) AS cd
        FROM d)
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(CAST(sum(dur) AS DOUBLE) / count(*), 9)
               AS mean_duration_s,
           CAST(min(CASE WHEN cd >= 0.5 THEN dur END) AS BIGINT)
               AS p50_duration_s,
           CAST(min(CASE WHEN cd >= 0.9 THEN dur END) AS BIGINT)
               AS p90_duration_s
    FROM cd
    """,
    note="session-duration distribution: 30-min-gap sessionization "
         "(the session_path_trigrams pairing), per-session duration "
         "in whole seconds (min/max boundary-count == cast-to-long "
         "difference), then exact PERCENTILE_DISC p50/p90 over the "
         "SESSION table (orders of magnitude smaller than events) "
         "and a mean from exact integer sums — the engagement "
         "readout product analytics publishes")
def session_duration_stats(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    sess = (ev
            .withColumn("new_sess",
                        F.when(F.lag("ts").over(w).isNull()
                               | (gap >= 1800), 1).otherwise(0))
            .withColumn("sess_id", F.sum("new_sess").over(run)))
    d = (sess.groupBy("user_id", "sess_id")
         .agg((F.max(F.col("ts").cast("long"))
               - F.min(F.col("ts").cast("long"))).alias("dur"),
              F.count(F.lit(1)).alias("n_events")))
    # cume_dist over the PER-VALUE aggregate, not per-session rows
    # (r9 audit): a global Window.orderBy over the session table is a
    # single unsplittable task at corpus scale, while distinct integer
    # durations are domain-bounded (seconds within the 30-min-gap
    # session cap). cume_dist of a row equals cum(count)/n of its
    # value — same operands, same one double division, identical
    # p50/p90 picks.
    vals = d.groupBy("dur").agg(F.count(F.lit(1)).alias("__cnt"),
                                F.sum("n_events").alias("__ne"))
    wv = (Window.orderBy("dur")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cd = vals.select(
        "dur", "__cnt", "__ne",
        (F.sum("__cnt").over(wv).cast("double")
         / F.sum("__cnt").over(Window.partitionBy())).alias("cd"))
    return cd.agg(
        F.coalesce(F.sum("__cnt"), F.lit(0)).cast("long")
        .alias("n_sessions"),
        F.coalesce(F.sum("__ne"), F.lit(0)).cast("long")
        .alias("n_events"),
        F.round(F.sum(F.col("dur") * F.col("__cnt")).cast("double")
                / F.sum("__cnt"), 9).alias("mean_duration_s"),
        F.min(F.when(F.col("cd") >= 0.5, F.col("dur"))).cast("long")
        .alias("p50_duration_s"),
        F.min(F.when(F.col("cd") >= 0.9, F.col("dur"))).cast("long")
        .alias("p90_duration_s"))


@register(
    "stream_lateness_audit",
    oracle="""
    WITH o AS (SELECT event_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS sec
               FROM events),
    r AS (SELECT sec,
                 max(sec) OVER (ORDER BY event_id
                                ROWS UNBOUNDED PRECEDING) AS high
          FROM o)
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN high - sec > 1800 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late_over_30min,
           CAST(max(high - sec) AS BIGINT) AS max_lateness_s,
           round(CAST(sum(high - sec) AS DOUBLE) / count(*), 9)
               AS mean_lateness_s
    FROM r
    """,
    note="watermark-sizing audit: per event, lateness = (running max "
         "event-time in ARRIVAL order, event_id) minus own event time "
         "— how out-of-order the stream really is, and what a 30-min "
         "watermark would drop. The running max is the two-phase "
         "prefix (per-1000-id bucket windows + an exclusive "
         "bucket-max broadcast — never one global window task; "
         "max is associative so bucket prefixes compose exactly). "
         "All integer seconds; the oracle is the single-window twin")
def stream_lateness_audit(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    o = ev.select("event_id", F.col("ts").cast("long").alias("sec"),
                  (F.col("event_id") / 1000).cast("bigint").alias("__b"))
    wb = (Window.partitionBy("__b").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    within = o.withColumn("__bmax", F.max("sec").over(wb))
    btab = o.groupBy("__b").agg(F.max("sec").alias("__bm"))
    woff = (Window.orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = btab.select("__b", F.max("__bm").over(woff).alias("__prior"))
    late = (within.join(F.broadcast(offs), "__b")
            .select((F.greatest(F.coalesce("__prior", F.lit(0)),
                                F.col("__bmax"))
                     - F.col("sec")).alias("__l")))
    return late.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("__l") > 1800, 1).otherwise(0)).cast("long")
        .alias("n_late_over_30min"),
        F.max("__l").cast("long").alias("max_lateness_s"),
        F.round(F.sum("__l").cast("double") / F.count(F.lit(1)), 9)
        .alias("mean_lateness_s"))


@register(
    "funnel_time_to_convert",
    oracle="""
    WITH w1 AS (
        SELECT user_id, ts, event_type,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t0
        FROM events
    ), w2 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t0
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t1
        FROM w1
    ), per AS (
        SELECT user_id, max(t0) AS t0, max(t1) AS t1
        FROM w2 GROUP BY user_id
    ), conv AS (
        SELECT date_diff('second', t0, t1) AS ttc
        FROM per WHERE t1 IS NOT NULL
    ), cd AS (
        SELECT ttc, cume_dist() OVER (ORDER BY ttc) AS cd FROM conv)
    SELECT CAST((SELECT count(*) FROM per) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(CASE WHEN cd >= 0.5 THEN ttc END) AS BIGINT)
               AS p50_ttc_s,
           CAST(min(CASE WHEN cd >= 0.9 THEN ttc END) AS BIGINT)
               AS p90_ttc_s,
           round(CAST(sum(ttc) AS DOUBLE) / count(*), 9) AS mean_ttc_s
    FROM cd
    """,
    note="funnel time-to-convert: first view -> first subsequent "
         "purchase per user (the funnel_steps window chain), whole-"
         "second deltas for converters, exact disc p50/p90 over the "
         "CONVERTER table (users-sized, not events-sized) and a mean "
         "from exact integer sums — the latency view of the funnel "
         "(operators/behavior.py::funnel_first_touch)")
def funnel_time_to_convert(spark, sf_dir):
    from pyspark.sql import Window
    from mapreduce_wsi_spark.operators.behavior import (
        funnel_first_touch)
    ev = tbl(spark, sf_dir, "events")
    per = funnel_first_touch(ev, ("view", "purchase"))
    n_users = per.agg(F.count(F.lit(1)).alias("n_users"))
    conv = (per.filter(F.col("t1").isNotNull())
            .select((F.col("t1").cast("long")
                     - F.col("t0").cast("long")).alias("ttc")))
    # per-value cume_dist, same rewrite as session_duration_stats
    # (r9 audit): the global window runs over distinct integer ttc
    # values, never the converter rows
    vals = conv.groupBy("ttc").agg(F.count(F.lit(1)).alias("__cnt"))
    wv = (Window.orderBy("ttc")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cd = vals.select(
        "ttc", "__cnt",
        (F.sum("__cnt").over(wv).cast("double")
         / F.sum("__cnt").over(Window.partitionBy())).alias("cd"))
    agg = cd.agg(
        F.coalesce(F.sum("__cnt"), F.lit(0)).cast("long")
        .alias("n_converted"),
        F.min(F.when(F.col("cd") >= 0.5, F.col("ttc"))).cast("long")
        .alias("p50_ttc_s"),
        F.min(F.when(F.col("cd") >= 0.9, F.col("ttc"))).cast("long")
        .alias("p90_ttc_s"),
        F.round(F.sum(F.col("ttc") * F.col("__cnt")).cast("double")
                / F.sum("__cnt"), 9).alias("mean_ttc_s"))
    return (n_users.crossJoin(agg)
            .select(F.col("n_users").cast("long").alias("n_users"),
                    F.col("n_converted").cast("long")
                    .alias("n_converted"),
                    "p50_ttc_s", "p90_ttc_s", "mean_ttc_s"))


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH base AS (
        SELECT user_id, value, ts,
               CAST(min(date_trunc('week', ts))
                        OVER (PARTITION BY user_id) AS DATE)
                   AS cohort_week
        FROM events
    ), sz AS (
        SELECT cohort_week, count(DISTINCT user_id) AS cohort_users
        FROM base GROUP BY 1
    ), rev AS (
        SELECT cohort_week,
               CAST(date_diff('day', cohort_week,
                              CAST(date_trunc('week', ts) AS DATE))
                    // 7 AS BIGINT) AS week_offset,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM base GROUP BY 1, 2
    ), cum AS (
        SELECT cohort_week, week_offset,
               sum(cents) OVER (PARTITION BY cohort_week
                                ORDER BY week_offset
                                ROWS UNBOUNDED PRECEDING) AS cum_cents
        FROM rev)
    SELECT c.cohort_week, c.week_offset,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           CAST(c.cum_cents AS BIGINT) AS cum_revenue_cents,
           CAST(c.cum_cents AS BIGINT) // s.cohort_users
               AS ltv_cents_per_user
    FROM cum c JOIN sz s USING (cohort_week)
    """,
    note="cohort LTV curve: per (first-activity week, week offset) "
         "the CUMULATIVE revenue and integer cents-per-user — the "
         "lifetime-value readout stacked on the cohort grid "
         "(cohort_retention_weekly's pairing). Exact cents; the "
         "cumsum window runs over the tiny (cohort x offset) grid, "
         "never raw events")
def cohort_ltv_curve(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    base = ev.withColumn(
        "cohort_week",
        F.min(wk).over(Window.partitionBy("user_id")).cast("date"))
    sz = (base.groupBy("cohort_week")
          .agg(F.countDistinct("user_id").alias("cohort_users")))
    rev = (base.groupBy(
        "cohort_week",
        F.expr("datediff(cast(date_trunc('week', ts) as date), "
               "cohort_week) div 7").cast("long").alias("week_offset"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
             .cast("long").alias("cents")))
    cum = rev.withColumn(
        "cum_cents",
        F.sum("cents").over(
            Window.partitionBy("cohort_week").orderBy("week_offset")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (cum.join(sz, "cohort_week")
            .select("cohort_week", "week_offset",
                    F.col("cohort_users").cast("long")
                    .alias("cohort_users"),
                    F.col("cum_cents").cast("long")
                    .alias("cum_revenue_cents"),
                    F.expr("cum_cents div cohort_users").cast("long")
                    .alias("ltv_cents_per_user")))


def _markov_stationary_oracle(n_iter: int = 8) -> str:
    """Unrolled power-iteration twin over the tiny transition matrix
    (the pca/kmeans decimal-rounded-iterates discipline)."""
    parts = ["""
    lagged AS (SELECT event_type AS j,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS i
               FROM events),
    m0 AS (SELECT i, j, count(*) AS c FROM lagged
           WHERE i IS NOT NULL GROUP BY 1, 2),
    rws AS (SELECT i, sum(c) AS r FROM m0 GROUP BY 1),
    m AS (SELECT m0.i, m0.j, m0.c, rws.r FROM m0 JOIN rws USING (i)),
    st AS (SELECT i FROM rws),
    kk AS (SELECT count(*) AS k FROM st),
    p0 AS (SELECT i, CAST(round(CAST(1.0 AS DOUBLE) / k, 12)
                          AS DECIMAL(38,12)) AS p
           FROM st, kk)"""]
    for t in range(1, n_iter + 1):
        parts.append(f"""
    t{t} AS (SELECT m.j,
                    CAST(round(CAST(p.p AS DOUBLE) * m.c / m.r, 12)
                         AS DECIMAL(38,12)) AS tt
             FROM m JOIN p{t - 1} p ON p.i = m.i),
    p{t} AS (SELECT j AS i,
                    CAST(round(CAST(sum(tt) AS DOUBLE), 12)
                         AS DECIMAL(38,12)) AS p
             FROM t{t} GROUP BY 1)""")
    return ("WITH" + ",".join(parts) + f"""
    SELECT i AS event_type,
           round(CAST(p AS DOUBLE), 9) AS stationary_p
    FROM p{n_iter}
    """)


@register(
    "events_markov_stationary",
    oracle=_markov_stationary_oracle(8),
    note="stationary distribution of the event-type Markov chain "
         "(power iteration pi' = pi P, 8 rounds): where user behavior "
         "settles long-run. Transition counts are exact BIGINTs from "
         "ONE lag-window pass; every iterate term rounds to 12dp and "
         "sums as DECIMAL (order-free), so the unrolled twin walks "
         "identical iterates — the PCA/kmeans discipline applied to "
         "the K x K behavioral matrix; rounds are broadcast joins "
         "over a few dozen rows "
         "(operators/behavior.py::markov_stationary)")
def events_markov_stationary(spark, sf_dir):
    from mapreduce_wsi_spark.operators.behavior import markov_stationary
    ev = tbl(spark, sf_dir, "events")
    return markov_stationary(ev, n_iter=8)


@register(
    "window_rolling_slope",
    oracle="""
    WITH b AS (SELECT user_id, event_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS x,
                      CAST(round(value * 100) AS BIGINT) AS y,
                      count(*) OVER w AS n,
                      sum(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
                          AS sx,
                      sum(CAST(round(value * 100) AS BIGINT)) OVER w
                          AS sy,
                      sum(CAST(floor(epoch(ts)) AS BIGINT)
                          * CAST(round(value * 100) AS BIGINT)) OVER w
                          AS sxy
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
    SELECT user_id,
           CAST(sum(CASE WHEN n >= 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_scored,
           CAST(sum(CASE WHEN n >= 20 AND n * sxy - sx * sy > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_rising
    FROM b GROUP BY user_id
    """,
    note="rolling OLS trend sign over a 20-event frame per user: the "
         "slope's sign is decided by the exact BIGINT numerator "
         "n*sxy - sx*sy alone (the denominator n*sxx - sx^2 is "
         "positive whenever times differ) — zero floats, "
         "bit-identical in any engine; counts of rising windows per "
         "user are the momentum feature. One user_id exchange, "
         "O(frame) per row (epoch-seconds x cents products stay "
         "far under BIGINT range at any frame length)")
def window_rolling_slope(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    x = F.col("ts").cast("long")
    y = F.round(F.col("value") * 100).cast("bigint")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-19, 0))
    b = (ev.select("user_id", "ts", "event_id",
                   x.alias("x"), y.alias("y"))
         .withColumn("n", F.count(F.lit(1)).over(w))
         .withColumn("sx", F.sum("x").over(w))
         .withColumn("sy", F.sum("y").over(w))
         .withColumn("sxy", F.sum(F.col("x") * F.col("y")).over(w)))
    rising = ((F.col("n") >= 20)
              & (F.col("n") * F.col("sxy")
                 - F.col("sx") * F.col("sy") > 0))
    return (b.groupBy("user_id")
            .agg(F.sum(F.when(F.col("n") >= 20, 1).otherwise(0))
                 .cast("long").alias("n_scored"),
                 F.sum(F.when(rising, 1).otherwise(0)).cast("long")
                 .alias("n_rising")))


@register(
    "events_kaplan_meier",
    oracle="""
    WITH u AS (SELECT user_id,
                      min(CAST(ts AS DATE)) AS first_d,
                      max(CAST(ts AS DATE)) AS last_d
               FROM events GROUP BY 1),
    g AS (SELECT max(last_d) AS corpus_end FROM u),
    lt AS (SELECT CAST(date_diff('day', first_d, last_d) AS BIGINT)
                      AS t,
                  CASE WHEN date_diff('day', last_d,
                                      (SELECT corpus_end FROM g)) < 7
                       THEN 1 ELSE 0 END AS censored
           FROM u),
    bytime AS (SELECT t,
                      sum(CASE WHEN censored = 0 THEN 1 ELSE 0 END)
                          AS d,
                      sum(censored) AS c,
                      count(*) AS n_at
               FROM lt GROUP BY 1),
    risk AS (SELECT t, d, c,
                    sum(n_at) OVER (ORDER BY t DESC
                                    ROWS UNBOUNDED PRECEDING)
                        AS n_risk
             FROM bytime),
    terms AS (SELECT t, d, c, n_risk,
                     CASE WHEN d > 0 THEN
                         CAST(round(ln(1.0 - CAST(d AS DOUBLE)
                                             / n_risk), 15)
                              AS DECIMAL(38,15))
                     ELSE CAST(0 AS DECIMAL(38,15)) END AS term
              FROM risk)
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_churned,
           CAST(c AS BIGINT) AS n_censored,
           round(CAST(sum(term) OVER (ORDER BY t
                                      ROWS UNBOUNDED PRECEDING)
                      AS DOUBLE), 9) AS ln_survival
    FROM terms
    """,
    note="Kaplan-Meier churn curve with right-censoring: per-user "
         "observed lifetime (first to last activity day; censored if "
         "still active within 7 days of corpus end), risk sets via a "
         "DESCENDING cumulative count over the tiny distinct-lifetime "
         "table, and the survival curve reported as ln S(t) — the "
         "cumulative DECIMAL sum of 15dp-rounded ln(1 - d/n) terms, "
         "sidestepping the cross-engine exp(); consumers exponentiate "
         "client-side. Survival analysis: the retention family's "
         "censoring-aware upgrade over raw cohort curves")
def events_kaplan_meier(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    u = (ev.groupBy("user_id")
         .agg(F.min(F.col("ts").cast("date")).alias("first_d"),
              F.max(F.col("ts").cast("date")).alias("last_d")))
    g = u.agg(F.max("last_d").alias("corpus_end"))
    lt = (u.crossJoin(F.broadcast(g))
          .select(F.datediff("last_d", "first_d").cast("long")
                  .alias("t"),
                  F.when(F.datediff("corpus_end", "last_d") < 7, 1)
                  .otherwise(0).alias("censored")))
    bytime = (lt.groupBy("t")
              .agg(F.sum(F.when(F.col("censored") == 0, 1)
                         .otherwise(0)).alias("d"),
                   F.sum("censored").alias("c"),
                   F.count(F.lit(1)).alias("n_at")))
    wdesc = (Window.orderBy(F.col("t").desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = bytime.withColumn("n_risk", F.sum("n_at").over(wdesc))
    term = (F.when(F.col("d") > 0,
                   F.round(F.log(1.0 - F.col("d").cast("double")
                                 / F.col("n_risk")), 15)
                   .cast("decimal(38,15)"))
            .otherwise(F.lit(0).cast("decimal(38,15)")))
    wasc = (Window.orderBy("t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (risk.withColumn("term", term)
            .select("t", F.col("n_risk").cast("long").alias("n_risk"),
                    F.col("d").cast("long").alias("n_churned"),
                    F.col("c").cast("long").alias("n_censored"),
                    F.round(F.sum("term").over(wasc).cast("double"), 9)
                    .alias("ln_survival")))


@register(
    "interval_union_time",
    oracle="""
    WITH iv AS (SELECT user_id,
                       -- floor, not ::BIGINT: DuckDB casts DOUBLE to
                       -- int by rounding; Spark's timestamp->long
                       -- truncates sub-second parts
                       CAST(floor(epoch(ts)) AS BIGINT) AS s,
                       CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e,
                       event_id
                FROM events),
    m AS (SELECT user_id, s, e,
                 max(e) OVER (PARTITION BY user_id
                              ORDER BY s, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_max
          FROM iv),
    isl AS (SELECT user_id, s, e,
                   sum(CASE WHEN prev_max IS NULL OR s > prev_max
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id
                             ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS island
            FROM m),
    seg AS (SELECT user_id, island,
                   max(e) - min(s) AS span
            FROM isl GROUP BY 1, 2)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(span) AS BIGINT) AS active_seconds
    FROM seg GROUP BY 1
    """,
    note="union of overlapping intervals per user ([ts, ts+5min) "
         "activity windows): the merged-coverage / billable-time "
         "computation — islands start where an interval's start "
         "clears the running max end (the gaps-and-islands running-"
         "max form; a plain lag(e) would WRONGLY split islands when "
         "an earlier interval outspans a later one), island spans "
         "sum exactly in integer seconds. Two stacked windows on one "
         "user_id exchange — the measure dual of "
         "interval_peak_concurrency's count sweep")
def interval_union_time(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    iv = ev.select("user_id", "event_id",
                   F.col("ts").cast("long").alias("s"),
                   (F.col("ts").cast("long") + 300).alias("e"))
    wprev = (Window.partitionBy("user_id").orderBy("s", "event_id")
             .rowsBetween(Window.unboundedPreceding, -1))
    m = iv.withColumn("prev_max", F.max("e").over(wprev))
    wrun = (Window.partitionBy("user_id").orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    isl = m.withColumn(
        "island",
        F.sum(F.when(F.col("prev_max").isNull()
                     | (F.col("s") > F.col("prev_max")), 1)
              .otherwise(0)).over(wrun))
    seg = (isl.groupBy("user_id", "island")
           .agg((F.max("e") - F.min("s")).alias("span")))
    return (seg.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_islands"),
                 F.sum("span").cast("long").alias("active_seconds")))


@register(
    "events_protocol_conformance",
    oracle="""
    WITH w AS (SELECT user_id, event_type,
                      min(CASE WHEN event_type = 'view' THEN ts END)
                          OVER (PARTITION BY user_id) AS first_view,
                      ts
               FROM events)
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN event_type = 'purchase'
                          AND (first_view IS NULL OR ts < first_view)
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations,
           CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                           AND (first_view IS NULL OR ts < first_view)
                          THEN user_id END) AS BIGINT)
               AS n_violating_users
    FROM w
    """,
    note="protocol-conformance audit (a purchase must be preceded by "
         "at least one view): violations found with ONE conditional "
         "window-min per user — no sequence materialization, no "
         "regex; the funnel machinery's validation dual. The "
         "violation count is the data-contract check an event "
         "pipeline alerts on")
def events_protocol_conformance(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    first_view = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))).over(
        Window.partitionBy("user_id"))
    w = ev.withColumn("first_view", first_view)
    viol = ((F.col("event_type") == "purchase")
            & (F.col("first_view").isNull()
               | (F.col("ts") < F.col("first_view"))))
    return w.agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(F.when(viol, 1).otherwise(0)).cast("long")
        .alias("n_violations"),
        F.countDistinct(F.when(viol, F.col("user_id"))).cast("long")
        .alias("n_violating_users"))
