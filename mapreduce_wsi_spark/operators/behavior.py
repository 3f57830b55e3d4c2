"""Behavioral / event-sequence analytics over an event log.

The reference's workload model is "rows through map/reduce"
(reference: src/MapReduceWSIImpl.java:89-197 runs arbitrary per-row
programs); these operators cover the event-log analyses such a user
would script by hand — funnels, cohort retention, transition matrices,
interval concurrency — as declarative DataFrame compositions instead,
so Catalyst keeps pushdown/partial-agg and every shuffle is on an
explicit, bounded key.

Scale posture (100 TB): everything here partitions by user_id or
(group, day) — no global windows. The concurrency sweep is the classic
running-sum-over-a-global-order problem; it is implemented two-phase
(per-day windows + a tiny per-day offset table joined back broadcast),
the same trick as pipeline.py's dense global IDs, so no single task
ever sees more than one (group, day) slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_first_touch(events: DataFrame,
                       steps: tuple[str, ...],
                       max_gap: str | None = None) -> DataFrame:
    """First-touch funnel: per user, the timestamp of the first ``steps[0]``
    event, the first ``steps[1]`` event strictly after it, and so on.
    Returns one row per user with columns t0..t{k-1} (NULL once the funnel
    is abandoned).

    Each step is a windowed conditional-min over the same user_id
    partitioning, so the whole chain costs ONE shuffle (exchange reuse
    across the stacked Window operators) plus the final per-user
    aggregation that rides the same partitioning.

    ``max_gap`` (an INTERVAL string, e.g. "30 minutes") additionally
    bounds each step's delay after the previous one — the
    conversion-window form every funnel report actually uses; None
    keeps the unbounded chain. Same plan either way (the bound is one
    more predicate inside the conditional min).
    """
    w = Window.partitionBy("user_id")
    df = events.select("user_id", "ts", "event_type")
    prev: str | None = None
    for i, step in enumerate(steps):
        cond = F.col("event_type") == step
        if prev is not None:
            cond = cond & (F.col("ts") > F.col(prev))
            if max_gap is not None:
                cond = cond & (
                    F.col("ts") <= F.col(prev) + F.expr(f"INTERVAL {max_gap}"))
        df = df.withColumn(f"t{i}", F.min(F.when(cond, F.col("ts"))).over(w))
        prev = f"t{i}"
    return df.groupBy("user_id").agg(
        *[F.max(f"t{i}").alias(f"t{i}") for i in range(len(steps))])


def transition_counts(events: DataFrame) -> DataFrame:
    """Markov transition matrix of the event stream: count of
    (previous event_type -> event_type) pairs per user step, ordered by
    (ts, event_id) for a total, deterministic order. One shuffle on
    user_id (the lag window), then a partial-aggregated groupBy on the
    5x5 type-pair key space."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (events
            .withColumn("prev_type", F.lag("event_type").over(w))
            .filter(F.col("prev_type").isNotNull())
            .groupBy("prev_type", F.col("event_type").alias("next_type"))
            .agg(F.count(F.lit(1)).alias("n")))


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their first
    activity; for each (cohort_week, week_offset) the number of distinct
    cohort members active that week. Window-min on user_id (one shuffle),
    then a distinct-count on the small (cohort, offset) grid."""
    wk = F.date_trunc("week", F.col("ts"))
    cohort = F.min(wk).over(Window.partitionBy("user_id"))
    return (events
            .withColumn("wk", F.to_date(wk))
            .withColumn("cohort_week", F.to_date(cohort))
            .withColumn("week_offset",
                        F.expr("datediff(wk, cohort_week) div 7"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.countDistinct("user_id").alias("active_users")))


def peak_concurrency(events: DataFrame, duration: str = "5 minutes",
                     group_col: str = "event_type") -> DataFrame:
    """Max number of concurrently-open intervals per group, where each
    event opens the half-open interval [ts, ts + duration).

    Sweep-line: +1 at each start, -1 at each end, running sum in
    (t, delta) order — delta ASC puts ends before starts at the same
    instant, which is exactly half-open semantics. The running sum is
    NOT one global window: phase 1 computes it within (group, day)
    partitions, phase 2 adds each day's exclusive prefix total from a
    tiny per-(group, day) table joined back broadcast — so the sweep
    scales out across days instead of serializing per group.
    """
    starts = events.select(F.col(group_col).alias("g"),
                           F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = events.select(F.col(group_col).alias("g"),
                         (F.col("ts") + F.expr(f"INTERVAL {duration}"))
                         .alias("t"), F.lit(-1).alias("delta"))
    pts = starts.unionByName(ends).withColumn("day", F.to_date("t"))

    day_w = Window.partitionBy("g", "day").orderBy("t", "delta") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    within = pts.withColumn("run", F.sum("delta").over(day_w))

    # Exclusive prefix of per-day totals: n_groups x n_days rows.
    totals = pts.groupBy("g", "day").agg(F.sum("delta").alias("day_tot"))
    off_w = Window.partitionBy("g").orderBy("day") \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "day_off", F.coalesce(F.sum("day_tot").over(off_w), F.lit(0)))

    active = (within.join(F.broadcast(offsets.select("g", "day", "day_off")),
                          ["g", "day"])
              .withColumn("active", F.col("run") + F.col("day_off")))
    return (active.groupBy("g")
            .agg(F.max("active").alias("peak_concurrency"),
                 F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
                 .alias("n_intervals"))
            .withColumnRenamed("g", group_col))


def rolling_zscore_anomalies(events: DataFrame, lookback: int = 20,
                             min_n: int = 12) -> DataFrame:
    """Per-user rolling z-score outliers, fully cross-engine exact.

    value has exactly 2 decimals (FIXTURES.md), so it is scored in
    integer cents and |z| > 3 is decided by the multiplied-through
    integer inequality  (n*x - s)^2 * (n-1) > 9 * n * (n*ss - s^2)
    over a [lookback preceding, 1 preceding] frame — no floating point,
    no division, bit-identical in any engine. One shuffle (user_id
    window); frames are O(lookback) per row.
    """
    xc = F.round(F.col("value") * 100).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(-lookback, -1)
    scored = (events
              .withColumn("xc", xc)
              .withColumn("n", F.count("xc").over(w))
              .withColumn("s", F.sum("xc").over(w))
              .withColumn("ss", F.sum(F.col("xc") * F.col("xc")).over(w)))
    dev = F.col("n") * F.col("xc") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    is_anom = (F.col("n") >= min_n) & \
        (dev * dev * (F.col("n") - 1) > 9 * F.col("n") * var_n2)
    return (scored
            .groupBy("user_id")
            .agg(F.sum(F.when(F.col("n") >= min_n, 1).otherwise(0))
                 .alias("n_scored"),
                 F.sum(F.when(is_anom, 1).otherwise(0)).alias("n_anomalies")))


def ewma_smooth(events: DataFrame, key_col: str = "user_id",
                value_col: str = "value", id_col: str = "event_id",
                ts_col: str = "ts", lookback: int = 10) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 0.5) of the last
    ``lookback`` values per key, in EXACT integer arithmetic: values go
    to cents (the fixture doubles are 2-decimal), weights are powers of
    two (2^(lookback-1-distance)), so numerator and denominator are
    integer sums — bit-identical across engines and partitionings, the
    same discipline as the integer-cents z-score. The only float is ONE
    final correctly-rounded division.

    Plan: a single window shuffle on the key; the frame's values ride a
    collect_list bounded at ``lookback`` rows (constant memory per row),
    and the weighted fold is a JVM higher-order expression — no UDF, no
    self-join. (The DuckDB twin uses the equivalent rn-range self-join:
    unordered integer sums, same exact totals.)

    Output: (id, key, rn, num, den, ewma_cents) with ewma_cents =
    num / den — in cents, like the integer sums it derives from.
    """
    xc = F.round(F.col(value_col) * 100).cast("long")
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    frame = w.rowsBetween(-(lookback - 1), 0)
    arr = F.collect_list(xc).over(frame)
    s = F.size(arr)
    top = F.lit(lookback)
    # element i (1-based) of an s-long frame sits distance s-i from the
    # current row -> weight 2^(lookback-1-(s-i)) = 2^(lookback-s+i-1)
    # 2^k via pow (exact in doubles for k <= 52, then a lossless long
    # cast) — shiftleft would be the natural fit but takes only literal
    # bit counts, and the exponent here is column-valued
    def p2(k):
        return F.pow(F.lit(2.0), k.cast("double")).cast("long")

    weighted = F.zip_with(
        arr, F.sequence(F.lit(1), s),
        lambda x, i: x * p2(top - s + i - F.lit(1)))
    num = F.aggregate(weighted, F.lit(0).cast("long"), lambda a, x: a + x)
    # sum of the geometric weights has the closed form 2^L - 2^(L-s)
    den = p2(top) - p2(top - s)
    return (events.select(
        F.col(id_col), F.col(key_col),
        F.row_number().over(w).alias("rn"),
        num.alias("num"), den.alias("den"))
        .withColumn("ewma_cents",
                    F.col("num").cast("double") / F.col("den")))


def theil_sen_trend(events: DataFrame, key_col: str = "user_id",
                    value_col: str = "value", id_col: str = "event_id",
                    ts_col: str = "ts", max_points: int = 30) -> DataFrame:
    """Theil-Sen robust trend per key: the MEDIAN of all pairwise slopes
    ``(y_j - y_i) / (j - i)`` over the key's first ``max_points`` events
    (x = event rank, y = integer cents) — the estimator a single wild
    outlier cannot drag, unlike the OLS slope (29% breakdown point).

    Exactness: each slope is ONE correctly-rounded double division of
    integers (identical both engines), and the median is
    PERCENTILE_DISC semantics (smallest value with cume_dist >= 0.5 —
    an actual slope, no interpolation), so results compare bitwise.
    Scale: the pairwise expansion is the quadratic step, hence the
    ``max_points`` cap — O(k²) pairs per key regardless of how many
    events a hot key has (the standard guard; raise it knowingly).
    Pairs build from a rank self-join keyed by ``key_col``.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(),
                                            F.col(id_col).asc())
    r = (events
         .withColumn("rn", F.row_number().over(w))
         .filter(F.col("rn") <= max_points)
         .select(key_col, "rn",
                 F.round(F.col(value_col) * 100).cast("bigint").alias("yc")))
    a = r.select(F.col(key_col), F.col("rn").alias("__ra"),
                 F.col("yc").alias("__ya"))
    b = r.select(F.col(key_col), F.col("rn").alias("__rb"),
                 F.col("yc").alias("__yb"))
    pairs = (a.join(b, key_col)
             .filter(F.col("__ra") < F.col("__rb"))
             .select(key_col,
                     ((F.col("__yb") - F.col("__ya")).cast("double")
                      / (F.col("__rb") - F.col("__ra"))).alias("s")))
    cd = F.cume_dist().over(Window.partitionBy(key_col).orderBy("s"))
    return (pairs.select(key_col, "s", cd.alias("cd"))
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_pairs"),
                 F.min(F.when(F.col("cd") >= 0.5, F.col("s")))
                 .alias("ts_slope")))


def linear_interpolate(df: DataFrame, key_col: str, ts_col: str,
                       value_col: str) -> DataFrame:
    """Linear interpolation of missing values over each key's time
    series — the gap-fill a forward-fill (time_spine_gapfill) only
    approximates: a NULL at time t between anchors (t0, v0) and
    (t1, v1) becomes v0 + (v1 - v0) * (t - t0) / (t1 - t0); leading /
    trailing gaps fall back to the single available anchor
    (coalesce — interpolation needs two sides, extrapolation is a
    different decision).

    Exactness posture: anchors enter as integer cents and epoch
    MICROS (micros, not seconds: second-truncated timestamps tie under
    sub-second event spacing and ties make the ignore-nulls frames
    order-dependent; ts must be unique per key), so the one
    interpolation expression computes from exact
    integers identically on any engine. Shape: TWO frames over ONE
    ordering — last(...ignoreNulls) unbounded-preceding and
    first(...ignoreNulls) unbounded-following share the (key, ts)
    window exchange; no self-join, no spine table."""
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    es = F.unix_micros(F.col(ts_col))
    base = df.withColumn("__c", cents).withColumn("__t", es)
    w_prev = (Window.partitionBy(key_col).orderBy("__t")
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy(key_col).orderBy("__t")
              .rowsBetween(0, Window.unboundedFollowing))
    pv = F.last("__c", ignorenulls=True).over(w_prev)
    pt = F.last(F.when(F.col("__c").isNotNull(), F.col("__t")),
                ignorenulls=True).over(w_prev)
    nv = F.first("__c", ignorenulls=True).over(w_next)
    nt = F.first(F.when(F.col("__c").isNotNull(), F.col("__t")),
                 ignorenulls=True).over(w_next)
    interp = (pv.cast("double")
              + (nv - pv).cast("double") * (F.col("__t") - pt)
              / (nt - pt))
    filled = (F.when(F.col("__c").isNotNull(),
                     F.col("__c").cast("double"))
              .when(pv.isNotNull() & nv.isNotNull() & (nt != pt),
                    interp)
              .otherwise(F.coalesce(pv, nv).cast("double")))
    return (base.withColumn("filled_cents", F.round(filled, 9))
            .withColumn("was_gap", F.col("__c").isNull())
            .drop("__c", "__t"))


def cusum_max_excursion(events: DataFrame, key_col: str, ts_col: str,
                        order_col: str, value_col: str) -> DataFrame:
    """Per-key CUSUM mean-shift score: the maximum excursion of the
    cumulative sum of deviations from the key's own mean — the
    standard drift detector for a metric stream (a key whose values
    shift mid-history scores high; a stationary key scores near 0).

    The textbook recurrence S_i = max(0, S_{i-1} + dev_i) is not a
    window expression, but its closed form is: S_i = P_i - min_{0<=j<=i}
    P_j with P the plain prefix sum of deviations AND P_0 = 0 in the
    running min (the recurrence's max-with-0 floor: a series that
    shifts UP from the very first rows has an all-positive prefix sum,
    and its excursion is P_i itself, not P_i - min of later P).
    Hence least(0, running_min) below. So the whole detector is two
    stacked windows over ONE key exchange (prefix sum, running min)
    plus a max.

    Exactness: values enter as integer cents; deviation from the key
    mean (v - S/n, rational) is scaled by n to n*v - S, an exact
    BIGINT, so every prefix sum, running min, and the max are exact —
    only the final unscaling divide (by 100*n, back to value units) is
    IEEE. Ordering ties break on order_col (unique event id).
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    base = events.select(F.col(key_col).alias("__k"),
                         F.col(ts_col).alias("__ts"),
                         F.col(order_col).alias("__o"),
                         cents.alias("__v"))
    tot = base.groupBy("__k").agg(F.count(F.lit(1)).alias("__n"),
                                  F.sum("__v").alias("__s"))
    w = Window.partitionBy("__k").orderBy("__ts", "__o")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dev = F.col("__v") * F.col("__n") - F.col("__s")
    curs = (base.join(tot, "__k")
            .withColumn("__p", F.sum(dev).over(run))
            .withColumn("__m", F.min(F.col("__p")).over(run))
            .withColumn("__e",
                        F.col("__p") - F.least(F.lit(0), F.col("__m"))))
    return (curs.groupBy("__k")
            .agg(F.first("__n").cast("long").alias("n_events"),
                 F.round(F.max("__e").cast("double")
                         / (100.0 * F.first("__n").cast("double")), 9)
                 .alias("max_excursion"))
            .select(F.col("__k").alias(key_col), "n_events",
                    "max_excursion"))


def autocorr_lags(series: DataFrame, key_col: str, ord_col: str,
                  value_col: str, lags: tuple[int, ...] = (1, 2)
                  ) -> DataFrame:
    """Lag-k Pearson autocorrelation of a keyed, ordered series (e.g.
    the daily-revenue series per segment) — the seasonality /
    persistence probe a forecasting pipeline runs before model choice.

    For each lag the (x, y) = (value, lag-k value) pairs come from one
    window lag over the key exchange; the five moments (n, sx, sy,
    sxx, syy, sxy) are exact DECIMAL(38,0) sums of integer cents (and
    their products), so partial-agg order cannot perturb them; r is
    one fixed IEEE expression over the exact moments. All requested
    lags reuse the SAME window partitioning (one exchange).

    series must already be aggregated to one row per (key, ord) — the
    caller owns that reduction (keeps this operator O(series), not
    O(raw rows)).
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    base = series.select(F.col(key_col).alias("__k"),
                         F.col(ord_col).alias("__t"),
                         cents.alias("__y"))
    w = Window.partitionBy("__k").orderBy("__t")
    out = None
    for lag in lags:
        paired = (base.withColumn("__x", F.lag("__y", lag).over(w))
                  .filter(F.col("__x").isNotNull()))
        d = "decimal(38,0)"
        m = paired.groupBy("__k").agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("__x").cast(d)).alias("sx"),
            F.sum(F.col("__y").cast(d)).alias("sy"),
            F.sum((F.col("__x") * F.col("__x")).cast(d)).alias("sxx"),
            F.sum((F.col("__y") * F.col("__y")).cast(d)).alias("syy"),
            F.sum((F.col("__x") * F.col("__y")).cast(d)).alias("sxy"))
        n = F.col("n_pairs").cast("double")
        sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
        sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
        sxy = F.col("sxy").cast("double")
        r = ((n * sxy - sx * sy)
             / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)))
        row = m.select(F.col("__k").alias(key_col),
                       F.lit(lag).cast("int").alias("lag"),
                       F.col("n_pairs").cast("long").alias("n_pairs"),
                       F.round(r, 9).alias("acf"))
        out = row if out is None else out.unionByName(row)
    return out


def holt_forecast(events: DataFrame, key_col: str, ts_col: str,
                  order_col: str, value_col: str) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) per
    key, in EXACT fixed-point integer arithmetic — the 1-step-ahead
    forecaster a metrics pipeline runs per segment/tenant. alpha=0.2,
    beta=0.3 as integer ratios with floor division:

        l_i = (2*y_i + 8*(l + b)) // 10
        b_i = (3*(l_i - l) + 7*b) // 10        (i = 2..n)

    init l = y_1, b = y_2 - y_1; keys with < 2 points are dropped
    (no trend is defined). Returns (key, n, level_cents, trend_cents,
    forecast_cents = l_n + b_n).

    The recurrence is inherently sequential per key, so it runs as a
    JVM-side ``aggregate`` fold over the (ts, order)-sorted per-key
    sequence — keys parallelize, the walk is row-local. r14 rewrite
    (guide §4.1): the previous Arrow applyInPandas fold moved every
    event across the JVM/Python boundary and paid per-GROUP pandas
    DataFrame construction (thousands of tiny groups at any scale);
    the collect_list + fold form keeps the identical shuffle (one
    exchange keyed by user) and eliminates the Python plan node
    outright (FlatMapGroupsInPandas -> ObjectHashAggregate, pinned in
    plans/r14). Spark's integer ``div`` truncates toward zero, exactly
    the DuckDB ``//`` semantics the old Python tdiv re-implemented, so
    every state stays the same integer — the DuckDB WITH RECURSIVE
    twin replays the walk bit-for-bit (float smoothing would diverge
    in the last ulp and never hash-match).
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    base = events.select(F.col(key_col).alias("__k"),
                         F.col(ts_col).alias("__ts"),
                         F.col(order_col).alias("__o"),
                         cents.alias("__y"))
    # array_sort on struct(__ts, __o, __y) orders by (ts, order) — the
    # order key is unique per event, so the trailing __y never decides
    seq = (base.groupBy("__k")
           .agg(F.array_sort(F.collect_list(
               F.struct("__ts", "__o", "__y"))).alias("__s"))
           .filter(F.size("__s") >= 2))
    fold = F.expr(
        "aggregate(slice(__s, 3, size(__s) - 2), "
        "named_struct("
        "'l', (2 * __s[1].__y + 8 * (__s[0].__y "
        "      + (__s[1].__y - __s[0].__y))) div 10, "
        "'b', (3 * (((2 * __s[1].__y + 8 * (__s[0].__y "
        "      + (__s[1].__y - __s[0].__y))) div 10) - __s[0].__y) "
        "      + 7 * (__s[1].__y - __s[0].__y)) div 10), "
        "(acc, s) -> named_struct("
        "'l', (2 * s.__y + 8 * (acc.l + acc.b)) div 10, "
        "'b', (3 * (((2 * s.__y + 8 * (acc.l + acc.b)) div 10) - acc.l) "
        "      + 7 * acc.b) div 10))")
    return (seq.select(F.col("__k").alias(key_col),
                       F.size("__s").cast("long").alias("n"),
                       fold.alias("__f"))
            .select(key_col, "n",
                    F.col("__f.l").alias("level_cents"),
                    F.col("__f.b").alias("trend_cents"),
                    (F.col("__f.l") + F.col("__f.b"))
                    .alias("forecast_cents")))


def markov_stationary(events: DataFrame, n_iter: int = 8) -> DataFrame:
    """Stationary distribution of the event-type Markov chain: power
    iteration pi' = pi P over the transition matrix estimated from
    per-user event sequences — where user behavior settles long-run,
    the summary a session-simulation or retention model starts from.

    Exactness discipline (the pca_power_component pattern): transition
    COUNTS are exact BIGINTs; each update term
    pi_i * c_ij / r_i is one fixed IEEE expression rounded to 12dp
    and cast to DECIMAL before the (order-free) sum over i; pi
    re-rounds to 12dp each round, so the DuckDB unrolled twin walks
    identical iterates. Everything after the one lag-window pass over
    events operates on the K x K matrix (K = event types) — the
    iterate joins are broadcasts over tables of a few dozen rows.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (events
             .withColumn("__prev", F.lag("event_type").over(w))
             .filter(F.col("__prev").isNotNull())
             .groupBy(F.col("__prev").alias("i"),
                      F.col("event_type").alias("j"))
             .agg(F.count(F.lit(1)).alias("c")))
    pairs = pairs.localCheckpoint()
    rows = pairs.groupBy("i").agg(F.sum("c").alias("r"))
    m = pairs.join(rows, "i")
    states = rows.select("i")
    k = states.count()
    d_t = "decimal(38,12)"
    pi = states.select(
        F.col("i"), F.round(F.lit(1.0) / k, 12).cast(d_t).alias("p"))
    for _ in range(n_iter):
        term = (m.join(F.broadcast(pi), "i")
                .select("j",
                        F.round(F.col("p").cast("double") * F.col("c")
                                / F.col("r"), 12).cast(d_t)
                        .alias("__t")))
        pi = (term.groupBy(F.col("j").alias("i"))
              .agg(F.round(F.sum("__t").cast("double"), 12).cast(d_t)
                   .alias("p")))
        pi = pi.localCheckpoint()
    return pi.select(F.col("i").alias("event_type"),
                     F.round(F.col("p").cast("double"), 9)
                     .alias("stationary_p"))
