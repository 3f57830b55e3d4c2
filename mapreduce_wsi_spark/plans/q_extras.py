"""Coverage extras: distribution/frame window functions, map-typed columns,
and higher-order array lambdas — the remaining §2C scalar/window families
not exercised by q_relational/q_functions.

In the reference these are expressible only inside user map/reduce code
(MapReduceWSI.java:62-105); here each is declarative and Catalyst-planned
(window exchanges reuse one shuffle per partition key; higher-order
functions run inside whole-stage codegen, no Python boundary).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_wsi_spark.plans.registry import register, tbl


@register(
    "window_dist_lead",
    oracle="""
    SELECT o_orderkey, o_custkey,
           percent_rank() OVER w AS pr,
           cume_dist()    OVER w AS cd,
           lead(o_orderkey) OVER w AS next_okey,
           first_value(o_orderkey) OVER w AS first_okey,
           last_value(o_orderkey)  OVER w_full AS last_okey,
           nth_value(o_orderkey, 2) OVER w_full AS second_okey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING)
    """,
    note="distribution (percent_rank/cume_dist) + navigation (lead/first/"
         "last/nth_value) window functions; unique total order per "
         "partition makes every value deterministic; one shuffle on "
         "o_custkey shared by both frames")
def window_dist_lead(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey", "o_custkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.lead("o_orderkey").over(w).alias("next_okey"),
        F.first("o_orderkey").over(w).alias("first_okey"),
        F.last("o_orderkey").over(w_full).alias("last_okey"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_okey"))


@register(
    "window_range_frame",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           count(*) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey
                          RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)
           AS n_within10
    FROM supplier
    """,
    note="RANGE (value-based) frame, vs the ROWS frames elsewhere: counts "
         "suppliers whose key lies within 10 of the current key — frame "
         "membership decided by value distance, not row offset")
def window_range_frame(spark, sf_dir):
    s = tbl(spark, sf_dir, "supplier")
    w = (Window.partitionBy("s_nationkey").orderBy("s_suppkey")
         .rangeBetween(-10, Window.currentRow))
    return s.select("s_suppkey", "s_nationkey",
                    F.count(F.lit(1)).over(w).alias("n_within10"))


@register(
    "map_funcs",
    oracle="""
    SELECT p_partkey,
           p_brand AS brand_val,
           p_type  AS type_val,
           2       AS n_keys,
           'brand,type' AS keys_sorted,
           p_size  AS size_back
    FROM part
    """,
    note="map-typed column round-trip: create_map -> element_at/map_keys/"
         "size, plus str_to_map parsing of a k:v string; the oracle states "
         "the identities the map ops must preserve (extract(create(x))==x)")
def map_funcs(spark, sf_dir):
    p = tbl(spark, sf_dir, "part")
    m = F.create_map(F.lit("brand"), F.col("p_brand"),
                     F.lit("type"), F.col("p_type"))
    parsed = F.expr("str_to_map(concat('size:', CAST(p_size AS STRING)), ',', ':')")
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.element_at(m, "type").alias("type_val"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(parsed, "size").cast("int").alias("size_back"))


@register(
    "array_higher_order",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_words,
           len(list_filter(string_split(p_name, ' '),
                           w -> len(w) > 4)) AS n_long,
           CAST(list_sum(list_transform(string_split(p_name, ' '),
                                        w -> len(w))) AS BIGINT) AS n_chars,
           array_to_string(list_transform(string_split(p_name, ' '),
                                          w -> upper(w)), '_') AS upper_joined
    FROM part
    """,
    note="higher-order array lambdas (filter/transform/aggregate) — run "
         "JVM-side inside codegen, the scale-safe alternative to a Python "
         "UDF for per-row array work")
def array_higher_order(spark, sf_dir):
    p = tbl(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).cast("long")
        .alias("n_long"),
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w)).alias("n_chars"),
        F.array_join(F.transform(words, F.upper), "_").alias("upper_joined"))


@register(
    "agg_exact_stats",
    oracle="""
    SELECT l_returnflag,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qp,
           all_low_disc, any_big_qty
    FROM (
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             bool_and(l_discount <= 0.1) AS all_low_disc,
             bool_or(l_quantity > 45)    AS any_big_qty
      FROM lineitem GROUP BY l_returnflag) t
    """,
    note="exact correlation from decimal moments (native corr()'s double "
         "summation order is partitioning-dependent) + bool_and/bool_or "
         "aggregates; one fixed-order double expression at the end")
def agg_exact_stats(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    base = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
        F.bool_and(F.col("l_discount") <= 0.1).alias("all_low_disc"),
        F.bool_or(F.col("l_quantity") > 45).alias("any_big_qty"))
    corr = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
               * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))))
    return base.select("l_returnflag", corr.alias("corr_qp"),
                       "all_low_disc", "any_big_qty")


@register(
    "time_spine_gapfill",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1),
    spine AS (
      SELECT CAST(unnest(generate_series(
               (SELECT min(day) FROM daily),
               (SELECT max(day) FROM daily),
               INTERVAL 1 DAY)) AS DATE) AS day)
    SELECT s.day,
           coalesce(d.n, 0) AS n_orders,
           CAST(coalesce(d.rev, 0.00) AS DOUBLE) AS revenue,
           CAST(last_value(d.rev IGNORE NULLS)
                OVER (ORDER BY s.day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS revenue_ffill
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    """,
    note="time-series resample: date spine (sequence/generate_series) + "
         "outer join so silent days exist, zero-fill for counts and "
         "forward-fill (last ignore-nulls window) for values — the "
         "gap-fill operator every time-series pipeline needs")
def time_spine_gapfill(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    daily = (o.groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .alias("rev")))
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (bounds.select(F.explode(F.sequence(
        F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))).alias("day")))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    return (spine.join(daily, on="day", how="left")
            .select("day",
                    F.coalesce("n", F.lit(0)).alias("n_orders"),
                    F.coalesce(F.col("rev"),
                               F.lit("0.00").cast("decimal(18,2)"))
                    .cast("double").alias("revenue"),
                    F.last("rev", ignorenulls=True).over(w).cast("double")
                    .alias("revenue_ffill")))


@register(
    "upsert_merge",
    oracle="""
    SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           coalesce(u.o_totalprice, b.o_totalprice) AS o_totalprice,
           b.o_orderstatus AS o_orderstatus
    FROM (SELECT o_orderkey, o_totalprice, o_orderstatus
          FROM orders WHERE o_orderkey % 3 != 0) b
    FULL JOIN (SELECT o_orderkey,
                      CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2
                           AS DOUBLE) AS o_totalprice
               FROM orders WHERE o_orderkey % 2 = 0) u
      ON b.o_orderkey = u.o_orderkey
    """,
    note="MERGE/upsert emulation (operators/relational.py::upsert): "
         "full-outer join on the key; updated rows win, unmatched base "
         "rows survive, new keys append. o_orderstatus is NULL for "
         "insert-only keys — exactly MERGE's WHEN NOT MATCHED INSERT "
         "with an unset column")
def upsert_merge(spark, sf_dir):
    from mapreduce_wsi_spark.operators.relational import upsert
    o = tbl(spark, sf_dir, "orders")
    base = (o.filter(F.col("o_orderkey") % 3 != 0)
            .select("o_orderkey", "o_totalprice", "o_orderstatus"))
    updates = (o.filter(F.col("o_orderkey") % 2 == 0)
               .select("o_orderkey",
                       (F.col("o_totalprice").cast("decimal(18,2)") * 2)
                       .cast("double").alias("o_totalprice")))
    return upsert(base, updates, ["o_orderkey"])


@register(
    "null_semantics",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st, o_totalprice
        FROM orders),
    dim(st, label) AS (
        VALUES ('O', 'open'), ('F', 'final'), (NULL, 'unknown'))
    SELECT base.st, label AS status_label,
           count(*) AS n,
           count(base.st) AS n_nonnull,
           CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS min_price
    FROM base JOIN dim ON base.st IS NOT DISTINCT FROM dim.st
    GROUP BY base.st, label
    """,
    note="NULL semantics corner: NULL as a grouping key (one group), "
         "count(*) vs count(col) null-skipping, and a null-safe equality "
         "join (eqNullSafe / IS NOT DISTINCT FROM) against a broadcast "
         "dim carrying a NULL key")
def null_semantics(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    base = o.select("o_orderkey",
                    F.nullif("o_orderstatus", F.lit("P")).alias("st"),
                    "o_totalprice")
    from mapreduce_wsi_spark.util import literal_df
    dim = literal_df(
        spark, [("O", "open"), ("F", "final"), (None, "unknown")],
        "st string, label string")
    j = base.join(F.broadcast(dim),
                  base["st"].eqNullSafe(dim["st"]), "inner")
    return (j.groupBy(base["st"].alias("st"),
                      F.col("label").alias("status_label"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count(base["st"]).alias("n_nonnull"),
                 F.min(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("min_price")))


@register(
    "dq_constraints",
    oracle="""
    SELECT 'qty_in_range' AS rule,
           CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'disc_low', CAST(sum(CASE WHEN NOT (l_discount <= 0.05)
                               THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'price_positive', CAST(sum(CASE WHEN NOT (l_extendedprice > 0)
                                     THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'flag_valid', CAST(sum(CASE WHEN NOT (l_returnflag IN
                                  ('A', 'N', 'R')) THEN 1 ELSE 0 END)
                              AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'shipdate_nonnull', CAST(sum(CASE WHEN NOT (l_shipdate IS NOT
                                        NULL) THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'unique_l_orderkey_l_linenumber',
           CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
                AS BIGINT)
    FROM lineitem
    """,
    note="data-quality gate (operators/relational.py::constraint_"
         "violations): N range/domain/null rules folded into ONE scan "
         "(single global aggregate) + tuple-uniqueness via distinct "
         "count; the admission check every ingest pipeline runs")
def dq_constraints(spark, sf_dir):
    from mapreduce_wsi_spark.operators.relational import constraint_violations
    li = tbl(spark, sf_dir, "lineitem")
    rules = [
        ("qty_in_range", F.col("l_quantity").between(1, 50)),
        ("disc_low", F.col("l_discount") <= 0.05),
        ("price_positive", F.col("l_extendedprice") > 0),
        ("flag_valid", F.col("l_returnflag").isin("A", "N", "R")),
        ("shipdate_nonnull", F.col("l_shipdate").isNotNull()),
    ]
    return constraint_violations(li, rules,
                                 unique_keys=[["l_orderkey",
                                               "l_linenumber"]])


@register(
    "sessionize_lag_cumsum",
    oracle="""
    SELECT event_id, user_id, session_seq,
           CAST(count(*) OVER (PARTITION BY user_id, session_seq) AS BIGINT)
               AS session_size
    FROM (
        SELECT event_id, user_id,
               -- CAST: DuckDB's windowed sum(int) is HUGEINT, which the
               -- driver's Arrow-typed hash never matches to Spark bigint
               CAST(sum(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND
                                 CURRENT ROW) AS BIGINT) AS session_seq
        FROM (
            SELECT event_id, user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                             OR date_diff('second',
                                    lag(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id),
                                    ts) > 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM events) t) s
    """,
    note="batch sessionization via lag-gap + running cumsum (the "
         "watermark-free twin of session_window): one shuffle on user_id "
         "reused by all three window frames; 30-min gap")
def sessionize_lag_cumsum(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    by_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_ts)
    is_new = (F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0))
    run = by_ts.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_seq = (ev.select("event_id", "user_id", "ts",
                          is_new.alias("is_new"))
                .withColumn("session_seq", F.sum("is_new").over(run)))
    sess_w = Window.partitionBy("user_id", "session_seq")
    return with_seq.select(
        "event_id", "user_id", "session_seq",
        F.count(F.lit(1)).over(sess_w).alias("session_size"))


@register(
    "window_count_distinct",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey)
                AS BIGINT) AS n_supp_in_order
    FROM lineitem
    """,
    note="COUNT(DISTINCT) OVER — unsupported natively in Spark; the "
         "standard recipe is max(dense_rank) over the same partition "
         "(two frames, one shuffle). DuckDB states the semantics directly")
def window_count_distinct(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    rank_w = Window.partitionBy("l_orderkey").orderBy("l_suppkey")
    part_w = Window.partitionBy("l_orderkey")
    return (li.withColumn("__dr", F.dense_rank().over(rank_w))
            .select("l_orderkey", "l_linenumber",
                    F.max("__dr").over(part_w).cast("long")
                    .alias("n_supp_in_order")))


@register(
    "yoy_revenue_growth",
    oracle="""
    SELECT yr, rev,
           rev - lag(rev) OVER (ORDER BY yr) AS delta,
           CASE WHEN lag(rev) OVER (ORDER BY yr) != 0
                THEN rev / lag(rev) OVER (ORDER BY yr)
                ELSE NULL END AS ratio
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev
        FROM orders GROUP BY 1) t
    """,
    note="year-over-year growth: agg to one row per year (tiny), then a "
         "lag window over the aggregate — the window sorts post-"
         "aggregation rows, never the fact table")
def yoy_revenue_growth(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    yearly = (o.groupBy(F.year("o_orderdate").cast("int").alias("yr"))
              .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   .cast("double").alias("rev")))
    w = Window.orderBy("yr")
    prev = F.lag("rev").over(w)
    return yearly.select(
        "yr", "rev",
        (F.col("rev") - prev).alias("delta"),
        F.when(prev != 0, F.col("rev") / prev).alias("ratio"))


@register(
    "share_of_total",
    oracle="""
    SELECT n_name, CAST(rev_d AS DOUBLE) AS rev,
           CAST(rev_d AS DOUBLE) / CAST(sum(rev_d) OVER () AS DOUBLE)
               AS share_global,
           CAST(rev_d AS DOUBLE)
               / CAST(sum(rev_d) OVER (PARTITION BY r_name) AS DOUBLE)
               AS share_in_region,
           r_name
    FROM (
        SELECT n_name, r_name,
               sum(CAST(c_acctbal AS DECIMAL(18,2))) AS rev_d
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2) t
    """,
    note="share-of-total at two grains (global + within region) as window "
         "sums over the AGGREGATED rows (25 nations) — the fact scan "
         "aggregates first, windows never see raw rows; sums stay decimal "
         "through the window, one double division at the end")
def share_of_total(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    base = (c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .groupBy("n_name", "r_name")
            .agg(F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .alias("rev_d")))
    # window sums stay in exact decimal; ONE double division at the end —
    # double-summed window totals differ across engines by accumulation
    # order (1-ULP flakes under the hash compare)
    g = F.sum("rev_d").over(Window.partitionBy())
    reg = F.sum("rev_d").over(Window.partitionBy("r_name"))
    return base.select(
        "n_name", F.col("rev_d").cast("double").alias("rev"),
        (F.col("rev_d").cast("double") / g.cast("double"))
        .alias("share_global"),
        (F.col("rev_d").cast("double") / reg.cast("double"))
        .alias("share_in_region"),
        "r_name")


@register(
    "window_ntile_bins",
    oracle="""
    WITH b AS (
        SELECT o_orderpriority,
               ntile(10) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey) AS bin,
               o_totalprice
        FROM orders)
    SELECT o_orderpriority, bin, CAST(count(*) AS BIGINT) AS n,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
    FROM b GROUP BY o_orderpriority, bin
    """,
    note="equi-depth decile binning, BUCKETED prefix-sum form (r10 — "
         "the SCALE.md r9 recipe proven on one of the residual "
         "total-order sites; VERDICT r9 ask #4): rank within (priority, "
         "price-range bucket) windows, compose with broadcast exclusive "
         "bucket prefixes, then derive the ntile bin ARITHMETICALLY "
         "from (rank, n) — bin sizes ceil(n/10) for the first n%10 "
         "bins, floor after, exactly Spark/DuckDB ntile semantics, so "
         "output is bit-identical to the old ntile window (the oracle "
         "still runs ntile). No window ever sees a whole priority "
         "group: the in-bucket window is bounded by the price-range "
         "bucket's density (degenerate all-one-price data would refill "
         "one bucket — the documented residual), the bucket-level "
         "cumsum runs over |priority x bucket| aggregate rows. "
         "tests/test_plan_shapes.py pins ntile out of the plan")
def window_ntile_bins(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    b = o.select("o_orderpriority", "o_totalprice", "o_orderkey",
                 F.floor(F.col("o_totalprice") / 4096).cast("long")
                 .alias("__vb"))
    w_in = Window.partitionBy("o_orderpriority", "__vb").orderBy(
        "o_totalprice", "o_orderkey")
    within = b.withColumn("__r", F.row_number().over(w_in))
    counts = (b.groupBy("o_orderpriority", "__vb")
              .agg(F.count(F.lit(1)).alias("__c")))
    w_b = (Window.partitionBy("o_orderpriority").orderBy("__vb")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = (counts.withColumn("__pre",
                             F.sum("__c").over(w_b) - F.col("__c"))
           .select("o_orderpriority", "__vb", "__pre"))
    tot = (counts.groupBy("o_orderpriority")
           .agg(F.sum("__c").alias("__n")))
    ranked = (within
              .join(F.broadcast(pre), ["o_orderpriority", "__vb"])
              .join(F.broadcast(tot), "o_orderpriority")
              .withColumn("__gr", F.col("__r") + F.col("__pre")))
    # ntile(10): first n%10 bins hold q+1 rows (q = n div 10), the
    # rest q rows — all integer arithmetic, bit-identical to ntile
    binned = ranked.withColumn(
        "bin",
        F.expr("CAST(CASE WHEN __gr <= (__n % 10) * (__n div 10 + 1) "
               "THEN (__gr + (__n div 10)) div (__n div 10 + 1) "
               "ELSE (__n % 10) + (__gr - (__n % 10) * (__n div 10 + 1) "
               "+ (__n div 10) - 1) div (__n div 10) END AS INT)"))
    return (binned.groupBy("o_orderpriority", "bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("o_totalprice").alias("lo"),
                 F.max("o_totalprice").alias("hi"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("tot")))


@register(
    "join_range_intervals",
    oracle="""
    SELECT o_orderdate, CAST(count(*) AS BIGINT) AS n_in_transit
    FROM (SELECT DISTINCT o_orderdate FROM orders) s
    JOIN lineitem
      ON l_shipdate <= o_orderdate
     AND o_orderdate < l_shipdate + to_days(CAST(l_linenumber * 5 AS INT))
    GROUP BY o_orderdate
    """,
    note="keyless point-in-interval join (in-transit lineitems per order "
         "date, transit window l_linenumber*5 days): naive Spark plans a "
         "nested loop; operators/relational.py::interval_join explodes "
         "each interval into its covering 32-day buckets and equi-joins "
         "on bucket, then re-checks the exact predicate — O(rows x "
         "intervals_per_bucket) shuffle instead of O(n x m) compare")
def join_range_intervals(spark, sf_dir):
    from mapreduce_wsi_spark.operators.relational import interval_join
    epoch = F.lit("1970-01-01")
    pts = (tbl(spark, sf_dir, "orders").select("o_orderdate").distinct()
           .withColumn("d_days", F.datediff("o_orderdate", epoch)))
    iv = tbl(spark, sf_dir, "lineitem").select(
        F.datediff("l_shipdate", epoch).alias("lo_days"),
        (F.datediff("l_shipdate", epoch) + F.col("l_linenumber") * 5)
        .alias("hi_days"))
    return (interval_join(pts, iv, "d_days", "lo_days", "hi_days",
                          bucket_width=32)
            .groupBy("o_orderdate")
            .agg(F.count(F.lit(1)).alias("n_in_transit")))


@register(
    "time_rollup_multigrain",
    oracle="""
    WITH base AS (
        SELECT date_trunc('day', ts) AS day, date_trunc('hour', ts) AS hour,
               event_type, user_id, CAST(value AS DECIMAL(18,2)) AS val_d
        FROM events)
    SELECT 'day' AS grain, day AS bucket, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(val_d) AS DOUBLE) AS sum_value
    FROM base GROUP BY day, event_type
    UNION ALL
    SELECT 'hour', hour, event_type,
           CAST(count(*) AS BIGINT), CAST(count(DISTINCT user_id) AS BIGINT),
           CAST(sum(val_d) AS DOUBLE)
    FROM base GROUP BY hour, event_type
    """,
    note="hypertable-style continuous-aggregate rollup: day AND hour "
         "grains per event_type in ONE scan via GROUPING SETS (single "
         "Expand + hash agg) — the oracle's UNION ALL of per-grain "
         "aggregates would be N scans; at 100 TB the Expand costs one "
         "shuffle of 2x the (pre-aggregated) rows instead of N passes")
def time_rollup_multigrain(spark, sf_dir):
    from mapreduce_wsi_spark.operators.relational import grouping_sets
    ev = tbl(spark, sf_dir, "events")
    base = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "event_type", "user_id",
        F.col("value").cast("decimal(18,2)").alias("val_d"))
    gs = grouping_sets(
        base, [["day", "event_type"], ["hour", "event_type"]],
        [F.count(F.lit(1)).alias("n_events"),
         # NB: Column stringification drops countDistinct's DISTINCT
         # flag — spell it in SQL so the helper round-trips it intact
         F.expr("count(DISTINCT user_id)").alias("n_users"),
         F.sum("val_d").cast("double").alias("sum_value")],
        view_name="__rollup_input")
    return gs.select(
        F.when(F.col("hour").isNotNull(), F.lit("hour"))
        .otherwise(F.lit("day")).alias("grain"),
        F.coalesce("hour", "day").alias("bucket"),
        "event_type", "n_events", "n_users", "sum_value")


@register(
    "join_fuzzy_levenshtein",
    oracle="""
    WITH d AS (
        SELECT doc_id, lang, source, substr(text, 1, 4) AS blk,
               substr(text, 1, 24) AS prefix
        FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.source = b.source AND a.blk = b.blk
     AND a.doc_id < b.doc_id
    WHERE levenshtein(a.prefix, b.prefix) <= 12
    """,
    note="fuzzy (edit-distance) similarity join with blocking: candidate "
         "pairs come from an equi-join on (lang, source, 4-char prefix) — "
         "never a cross join — and only candidates pay the O(m*n) "
         "levenshtein verify; the record-linkage pattern that scales "
         "because block sizes, not table sizes, bound the pair count")
def join_fuzzy_levenshtein(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source",
        F.substring("text", 1, 4).alias("blk"),
        F.substring("text", 1, 24).alias("prefix"))
    a = docs.alias("a")
    b = docs.alias("b")
    lev = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    return (a.join(b, (F.col("a.lang") == F.col("b.lang")) &
                   (F.col("a.source") == F.col("b.source")) &
                   (F.col("a.blk") == F.col("b.blk")) &
                   (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    lev.cast("long").alias("edit_dist"))
            .filter(F.col("edit_dist") <= 12))


@register(
    "hierarchy_roots_depth",
    oracle="""
    WITH RECURSIVE nodes AS (
        SELECT CAST(s_suppkey AS BIGINT) AS id,
               CASE WHEN s_suppkey > 5 THEN CAST(s_suppkey - 5 AS BIGINT)
                    END AS parent
        FROM supplier),
    walk(id, cur, depth) AS (
        SELECT id, id, 0 FROM nodes
        UNION ALL
        SELECT w.id, n.parent, w.depth + 1
        FROM walk w JOIN nodes n ON n.id = w.cur
        WHERE n.parent IS NOT NULL)
    SELECT id, CAST(max_by(cur, depth) AS BIGINT) AS root,
           CAST(max(depth) AS INT) AS depth
    FROM walk GROUP BY id
    """,
    note="recursive-CTE query class (org charts, BOMs, thread trees) — "
         "Spark has no WITH RECURSIVE; re-expressed as pointer doubling "
         "(operators/graph.py::resolve_roots): O(log depth) self-join "
         "rounds instead of O(depth), each round lineage-cut via "
         "localCheckpoint; the oracle runs DuckDB's honest WITH RECURSIVE "
         "over the same supplier forest (5 chains, parent = key - 5)")
def hierarchy_roots_depth(spark, sf_dir):
    from mapreduce_wsi_spark.operators.graph import resolve_roots
    s = tbl(spark, sf_dir, "supplier")
    nodes = s.select(
        F.col("s_suppkey").cast("long").alias("id"),
        F.when(F.col("s_suppkey") > 5,
               (F.col("s_suppkey") - 5).cast("long")).alias("parent"))
    out = resolve_roots(nodes, "id", "parent")
    return out.select("id", "root", F.col("depth").cast("int").alias("depth"))


@register(
    "scd2_intervals",
    oracle="""
    SELECT o_custkey,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to,
           o_orderstatus AS status,
           CAST(lead(o_orderdate) OVER w IS NULL AS BOOLEAN) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    note="SCD Type-2 reconstruction: a change stream (orders as status "
         "changes per customer) becomes versioned dimension rows with "
         "[valid_from, valid_to) intervals and an is_current flag — one "
         "window shuffle on the business key, no self-join; the "
         "open-ended current row is the NULL lead. Tie-broken by "
         "(date, orderkey) so versions are deterministic")
def scd2_intervals(spark, sf_dir):
    from pyspark.sql import Window
    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        F.col("o_orderstatus").alias("status"),
        nxt.isNull().alias("is_current"))


@register(
    "skew_key_diagnostics",
    oracle="""
    WITH c AS (
        SELECT l_suppkey AS k, count(*) AS n
        FROM lineitem GROUP BY l_suppkey
    ), ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, k) AS rn FROM c
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(n) AS BIGINT) AS total_rows,
               CAST(max(n) AS BIGINT) AS max_rows
        FROM c
    )
    SELECT n_keys, total_rows, max_rows,
           CAST((SELECT sum(n) FROM ranked WHERE rn <= 10) AS BIGINT)
               AS top10_rows,
           CAST(max_rows * 1000000 // total_rows AS BIGINT)
               AS max_share_ppm
    FROM tot
    """,
    note="shuffle-key skew pre-flight: per-key row counts in one "
         "partial-aggregated pass, heaviest-10 via TakeOrdered (10 rows "
         "cross the driver), max share in exact ppm (integer div). The "
         "diagnostic you run BEFORE picking a salt factor / AQE skew "
         "threshold on a new join key — operational companion to "
         "join_salted_skew")
def skew_key_diagnostics(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_suppkey").alias("k")) \
        .agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.count(F.lit(1)).alias("n_keys"),
                F.sum("n").alias("total_rows"),
                F.max("n").alias("max_rows"))
    top10 = (c.orderBy(F.col("n").desc(), "k").limit(10)
             .agg(F.sum("n").alias("top10_rows")))
    return (tot.crossJoin(top10)
            .select("n_keys", "total_rows", "max_rows", "top10_rows",
                    F.expr("max_rows * 1000000 div total_rows")
                    .alias("max_share_ppm")))


@register(
    "weighted_median_exact",
    oracle="""
    WITH b AS (
        SELECT l_returnflag AS g,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS vc,
               CAST(l_quantity AS BIGINT) AS w,
               l_orderkey, l_linenumber
        FROM lineitem
    ), run AS (
        SELECT g, vc,
               CAST(sum(w) OVER (PARTITION BY g
                                 ORDER BY vc, l_orderkey, l_linenumber
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS running_w,
               CAST(sum(w) OVER (PARTITION BY g) AS BIGINT) AS total_w
        FROM b
    )
    SELECT g AS l_returnflag,
           min(CASE WHEN 2 * running_w >= total_w THEN vc END)
               AS weighted_median_cents,
           max(total_w) AS total_weight
    FROM run GROUP BY g
    """,
    note="exact weighted median (quantity-weighted price): smallest "
         "value whose running weight reaches half the group total. "
         "Integer cents + integer weights so the threshold predicate is "
         "exact. r10: rewritten from the row-level running window to "
         "the per-VALUE cumsum (the r9 percentile-rewrite form): "
         "groupBy (group, cents) sums weights first, the running sum "
         "cumsums the per-value aggregate — value-domain bounded, "
         "never a window over raw lineitem rows. Bit-identical because "
         "a mid-run threshold crossing always selects that run's value "
         "(the row where 2*running_w first reaches total_w has vc = "
         "min v with 2*cum_w(<=v) >= total_w — the old min(CASE) pick); "
         "the oracle still runs the row-level running form, so the "
         "equivalence is driver-checked. Plan test pins the raw-row "
         "tie-break column out of every window spec")
def weighted_median_exact(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("vc"),
        F.col("l_quantity").cast("bigint").alias("w"))
    per_v = b.groupBy("g", "vc").agg(F.sum("w").alias("wv"))
    wp = Window.partitionBy("g")
    run_w = wp.orderBy("vc") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored = per_v.withColumn("cum_w", F.sum("wv").over(run_w)) \
        .withColumn("total_w", F.sum("wv").over(wp))
    return (scored.groupBy(F.col("g").alias("l_returnflag"))
            .agg(F.min(F.when(2 * F.col("cum_w") >= F.col("total_w"),
                              F.col("vc"))).alias("weighted_median_cents"),
                 F.max("total_w").alias("total_weight")))


@register(
    "dq_profile_columns",
    oracle="""
    SELECT 'o_orderdate' AS col_name,
           (SELECT count(*) FROM orders) AS n_rows,
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_orderdate) AS BIGINT) AS n_distinct,
           CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS min_str,
           CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderkey', (SELECT count(*) FROM orders),
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(DISTINCT o_orderkey) AS BIGINT),
           CAST(min(o_orderkey) AS VARCHAR),
           CAST(max(o_orderkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', (SELECT count(*) FROM orders),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', (SELECT count(*) FROM orders),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', (SELECT count(*) FROM orders),
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    """,
    note="Deequ-style one-pass column profile of orders (row count, "
         "null count, exact distinct count, canonical-string min/max "
         "per column): ONE aggregation job (multi-count-distinct via a "
         "single Expand), then stack-unpivot of the 1-row result — no "
         "per-column scans, no driver loop. Min/max aggregate on native "
         "types; only the display form stringifies, through "
         "engine-portable casts (operators/dq.py::profile_columns)")
def dq_profile_columns(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dq import profile_columns
    o = tbl(spark, sf_dir, "orders")
    as_is = lambda c: c.cast("string")  # noqa: E731
    spec = {
        "o_orderdate": (F.col("o_orderdate"),
                        lambda c: c.cast("date").cast("string")),
        "o_orderkey": (F.col("o_orderkey"), as_is),
        "o_orderpriority": (F.col("o_orderpriority"), as_is),
        "o_orderstatus": (F.col("o_orderstatus"), as_is),
        "o_totalprice": (F.col("o_totalprice"),
                         lambda c: c.cast("decimal(18,2)").cast("string")),
    }
    return profile_columns(o, spec)


def _geo_oracle() -> str:
    """Brute-force DuckDB twin of the grid-blocked radius join: same
    md5-derived synthetic coordinates, same plan-literal km-per-degree
    factors (full-precision repr), exhaustive pair scan — the blocked
    engine path must reproduce it exactly."""
    from mapreduce_wsi_spark.operators.geo import (
        KM_PER_DEG_LAT, km_per_deg_lon)
    kx = repr(km_per_deg_lon(40.1))
    ky = repr(KM_PER_DEG_LAT)
    bucket = ("CAST(CAST(('0x' || substr(md5(CAST({k} AS VARCHAR)), 1, 8)) "
              "AS BIGINT) % 1000 AS INT)")
    blat = bucket.format(k="c_custkey")
    blon = bucket.format(k="c_custkey + 1000000")
    return f"""
    WITH p AS (SELECT c_custkey AS id,
                      40.0 + {blat} / 1000.0 * 0.2 AS lat,
                      -74.0 + {blon} / 1000.0 * 0.2 AS lon
               FROM customer)
    SELECT a.id AS id_a, b.id AS id_b,
           sqrt(((b.lon - a.lon) * {kx}) * ((b.lon - a.lon) * {kx})
                + ((b.lat - a.lat) * {ky}) * ((b.lat - a.lat) * {ky}))
               AS dist_km
    FROM p a JOIN p b ON a.id < b.id
    WHERE sqrt(((b.lon - a.lon) * {kx}) * ((b.lon - a.lon) * {kx})
               + ((b.lat - a.lat) * {ky}) * ((b.lat - a.lat) * {ky}))
          <= 2.0
    """


@register(
    "geo_radius_join",
    oracle=_geo_oracle(),
    note="geospatial radius self-join (pairs within 2 km): fixed-grid "
         "blocking with cell edge >= radius, 3x3 neighbor explode on one "
         "side, equi-join on the cell, exact distance verify on "
         "candidates only — never all-pairs. Coordinates synthesized "
         "from the portable md5 bucket of c_custkey (a ~22 km city box); "
         "distance is the local planar metric with km-per-degree "
         "factors as full-precision plan literals — pure arithmetic, "
         "bit-identical cross-engine, vs the brute-force exhaustive "
         "DuckDB twin (operators/geo.py::grid_radius_join)")
def geo_radius_join(spark, sf_dir):
    from mapreduce_wsi_spark.operators.geo import grid_radius_join
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    cust = tbl(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        (F.lit(40.0) + portable_bucket(F.col("c_custkey"), 1000)
         / F.lit(1000.0) * F.lit(0.2)).alias("lat"),
        (F.lit(-74.0) + portable_bucket(F.col("c_custkey") + 1000000, 1000)
         / F.lit(1000.0) * F.lit(0.2)).alias("lon"))
    return grid_radius_join(pts, radius_km=2.0, ref_lat_deg=40.1)


@register(
    "join_bloom_prune",
    oracle="""
    WITH sk AS (SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS k
                FROM part WHERE p_brand = 'Brand#23' AND p_size <= 10),
    pos AS (SELECT CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT)
                   % 4096 AS p FROM sk
            UNION
            SELECT CAST(('0x' || substr(md5(k), 9, 8)) AS BIGINT)
                   % 4096 FROM sk),
    cand AS (SELECT l_partkey, l_quantity, l_extendedprice
             FROM lineitem
             WHERE CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 4096
                       IN (SELECT p FROM pos)
               AND CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)),
                                        9, 8)) AS BIGINT) % 4096
                       IN (SELECT p FROM pos)),
    mt AS (SELECT c.* FROM cand c
           JOIN (SELECT p_partkey FROM part
                 WHERE p_brand = 'Brand#23' AND p_size <= 10) p
             ON c.l_partkey = p.p_partkey)
    SELECT (SELECT count(*) FROM lineitem) AS n_big,
           (SELECT count(*) FROM cand) AS n_candidates,
           (SELECT count(*) FROM mt) AS n_matched,
           (SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                        AS DOUBLE) FROM mt) AS sum_qty,
           (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                        AS DOUBLE) FROM mt) AS sum_price
    """,
    note="Explicit Bloom-filter semi-join reduction: a 4096-bit / "
         "2-hash filter over the ~10 selected part keys broadcasts as "
         "ONE map row (512 bytes) and prunes lineitem MAP-SIDE before "
         "the join shuffle — the runtime-filter pattern surfaced as a "
         "composable operator so a pipeline can prune before decode/"
         "UDF stages too. n_candidates is the filter's EXACT behavior "
         "(bit-for-bit: the oracle replays the same md5-window bit "
         "positions), n_matched/sums come from the real join that "
         "clears false positives; false negatives are impossible by "
         "construction (operators/relational.py::bloom_prune_join)")
def join_bloom_prune(spark, sf_dir):
    from mapreduce_wsi_spark.operators.relational import bloom_prune_join

    part = tbl(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10))
    li = tbl(spark, sf_dir, "lineitem")
    pruned = bloom_prune_join(li, part, "l_partkey", "p_partkey")
    matched = pruned.join(F.broadcast(part.select("p_partkey")),
                          pruned["l_partkey"] == F.col("p_partkey"))

    n_big = li.agg(F.count(F.lit(1)).alias("n_big"))
    n_cand = pruned.agg(F.count(F.lit(1)).alias("n_candidates"))
    stats = matched.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double").alias("sum_price"))
    return n_big.crossJoin(n_cand).crossJoin(stats)


@register(
    "dq_benford_prices",
    oracle="""
    WITH obs AS (SELECT CAST(substr(CAST(CAST(floor(l_extendedprice)
                              AS BIGINT) AS VARCHAR), 1, 1) AS INT)
                            AS digit,
                        count(*) AS n_obs
                 FROM lineitem WHERE l_extendedprice >= 1
                 GROUP BY 1),
    tot AS (SELECT sum(n_obs) AS n FROM obs),
    p AS (SELECT unnest(generate_series(1, 9)) AS digit,
                 unnest([301029995, 176091259, 124938736, 96910013,
                         79181246, 66946789, 57991946, 51152522,
                         45757490]) AS p_nanos),
    j AS (SELECT p.digit,
                 CAST(coalesce(obs.n_obs, 0) AS BIGINT) AS n_obs,
                 CAST(tot.n * p.p_nanos AS BIGINT) AS exp_nanos
          FROM p LEFT JOIN obs ON obs.digit = p.digit, tot)
    SELECT digit, n_obs, exp_nanos,
           round(power(CAST(n_obs * 1000000000 - exp_nanos AS DOUBLE)
                       / 1e9, 2)
                 / (CAST(exp_nanos AS DOUBLE) / 1e9), 9) AS chi2_term
    FROM j ORDER BY digit
    """,
    note="Benford's-law first-digit audit of lineitem prices (the "
         "fabricated-data / unit-mixing smell test for financial "
         "columns): exact string-extracted leading digit, expectation "
         "n*log10(1+1/d) as a BIGINT nanos product (probabilities are "
         "truncated plan constants shared verbatim with the twin), "
         "chi-square contribution per digit from one fixed IEEE "
         "expression. TPC-H prices are ~uniform on a wide range, so "
         "the audit FAILS loudly here — which is the demonstration: "
         "the op detects non-Benford data, it does not assume it "
         "(operators/dq.py::benford_first_digit)")
def dq_benford_prices(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dq import benford_first_digit
    li = tbl(spark, sf_dir, "lineitem")
    return benford_first_digit(li, "l_extendedprice")


@register(
    "agg_skyline_pareto",
    oracle="""
    SELECT p_partkey, p_size, p_retailprice
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_size <= p.p_size
          AND q.p_retailprice >= p.p_retailprice
          AND (q.p_size < p.p_size
               OR q.p_retailprice > p.p_retailprice))
    """,
    note="2D skyline / Pareto front (smallest size, highest price — "
         "no part strictly dominated in both): two-phase distributed "
         "plan — batch-local numpy skyline in one Arrow pass (a "
         "correct prefilter by domination transitivity; the corpus "
         "never shuffles), then an exact range-frame window sweep over "
         "the BOUNDED survivor union only. The oracle is the honest "
         "O(n^2) NOT EXISTS the sweep replaces "
         "(operators/relational.py::skyline_2d)")
def agg_skyline_pareto(spark, sf_dir):
    from mapreduce_wsi_spark.operators.relational import skyline_2d
    part = tbl(spark, sf_dir, "part")
    return skyline_2d(part, "p_size", "p_retailprice",
                      "p_partkey").select(
        "p_partkey", "p_size", "p_retailprice")


@register(
    "join_point_in_time",
    oracle="""
    WITH ver AS (
        SELECT o_custkey, o_orderdate AS vfrom, o_orderstatus AS status,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders WHERE o_orderkey % 2 = 0),
    v AS (SELECT o_custkey, vfrom, status FROM ver WHERE rn = 1),
    f AS (SELECT o_custkey, o_orderdate, o_totalprice
          FROM orders WHERE o_orderkey % 2 = 1),
    pit AS (SELECT f.o_totalprice,
                   (SELECT v.status FROM v
                    WHERE v.o_custkey = f.o_custkey
                      AND v.vfrom <= f.o_orderdate
                    ORDER BY v.vfrom DESC LIMIT 1) AS status
            FROM f)
    SELECT coalesce(status, '<none>') AS status,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM pit GROUP BY 1
    """,
    note="point-in-time dimension lookup: facts (odd orders) resolve "
         "the customer-status version (from even orders, last-writer-"
         "wins deduped per (key, date)) valid AT each fact's date — "
         "the SCD2 read path. Runs as a backward as-of join (union + "
         "carried-value window, ONE shuffle on the business key — "
         "operators/relational.py::asof_join), never the exploding "
         "theta-join; facts preceding any version surface as '<none>' "
         "instead of silently dropping. Oracle is the correlated "
         "latest-version subquery, single-node")
def join_point_in_time(spark, sf_dir):
    from pyspark.sql import Window
    from mapreduce_wsi_spark.operators.relational import asof_join

    o = tbl(spark, sf_dir, "orders")
    wv = (Window.partitionBy("o_custkey", "o_orderdate")
          .orderBy(F.col("o_orderkey").desc()))
    v = (o.filter(F.col("o_orderkey") % 2 == 0)
         .withColumn("__rn", F.row_number().over(wv))
         .filter(F.col("__rn") == 1)
         .select("o_custkey", F.col("o_orderdate").alias("vfrom"),
                 F.col("o_orderstatus").alias("status")))
    f = (o.filter(F.col("o_orderkey") % 2 == 1)
         .select("o_custkey", "o_orderdate", "o_totalprice"))
    pit = asof_join(f, v, on=["o_custkey"], left_ts="o_orderdate",
                    right_ts="vfrom", right_values=["status"])
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (pit.groupBy(F.coalesce("status_asof", F.lit("<none>"))
                        .alias("status"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(cents).alias("total_cents")))


def _geohash_oracle() -> str:
    from mapreduce_wsi_spark.operators.geo import geohash_sql
    bucket = ("CAST(CAST(('0x' || substr(md5(CAST({k} AS VARCHAR)), 1, 8)) "
              "AS BIGINT) % 1000 AS INT)")
    blat = bucket.format(k="c_custkey")
    blon = bucket.format(k="c_custkey + 1000000")
    lat = f"40.0 + {blat} / 1000.0 * 0.2"
    lon = f"-74.0 + {blon} / 1000.0 * 0.2"
    gh = geohash_sql(lat, lon, precision=6)
    return f"""
    SELECT {gh} AS cell, count(*) AS n_customers,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
    FROM customer GROUP BY 1
    """


@register(
    "geo_geohash_cells",
    oracle=_geohash_oracle(),
    note="standard geohash cell rollup (Niemeyer base32, precision 6 "
         "~= 1.2x0.6 km): quantized lat/lon indices bit-interleaved "
         "with generated shift/mask terms — pure integer ops, no "
         "libm, no UDF; the DuckDB twin is emitted from the SAME bit "
         "layout (operators/geo.py::geohash_sql). The cell id is the "
         "spatial shuffle/rollup key: prefix truncation coarsens the "
         "grid, equal prefixes co-locate neighbors — how a 100 TB "
         "point table partitions spatially "
         "(operators/geo.py::geohash_column)")
def geo_geohash_cells(spark, sf_dir):
    from mapreduce_wsi_spark.operators.geo import geohash_column
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    cust = tbl(spark, sf_dir, "customer")
    pts = cust.select(
        "c_nationkey",
        (F.lit(40.0) + portable_bucket(F.col("c_custkey"), 1000)
         / F.lit(1000.0) * F.lit(0.2)).alias("lat"),
        (F.lit(-74.0) + portable_bucket(F.col("c_custkey") + 1000000, 1000)
         / F.lit(1000.0) * F.lit(0.2)).alias("lon"))
    return (pts.groupBy(geohash_column(F.col("lat"), F.col("lon"), 6)
                        .alias("cell"))
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.countDistinct("c_nationkey").cast("long")
                 .alias("n_nations")))


@register(
    "dq_k_anonymity",
    oracle="""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
               count(*) AS n
        FROM customer GROUP BY 1, 2, 3),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_classes,
                 CAST(min(n) AS BIGINT) AS min_class_size,
                 CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
                     AS n_suppressed_rows,
                 CAST(sum(n) AS BIGINT) AS n_rows
          FROM classes)
    SELECT n_classes, min_class_size, n_suppressed_rows,
           n_suppressed_rows * 1000000 // n_rows AS suppression_ppm,
           min_class_size >= 5 AS is_k_anonymous
    FROM s
    """,
    note="k-anonymity release gate (k=5) over the quasi-identifier "
         "tuple (nation, segment, $1000 balance band): one groupBy to "
         "the equivalence-class table, then a 1-row summary — actual "
         "k, records in sub-k classes (the suppression set), exact "
         "integer-ppm rate. The class table is bounded by quasi-key "
         "cardinality, not rows "
         "(operators/dq.py::k_anonymity_audit)")
def dq_k_anonymity(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dq import k_anonymity_audit
    cust = tbl(spark, sf_dir, "customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 1000).cast("bigint"))
    return k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment", "bal_band"], k=5)


@register(
    "join_size_preflight",
    oracle="""
    WITH ca AS (SELECT o_custkey AS k, count(*) AS c
                FROM orders GROUP BY 1),
    cb AS (SELECT c_custkey AS k, count(*) AS c
           FROM customer GROUP BY 1),
    prod AS (SELECT ca.k, ca.c * cb.c AS p
             FROM ca JOIN cb USING (k)),
    mx AS (SELECT k, p FROM prod ORDER BY p DESC, k DESC LIMIT 1)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM ca) AS n_keys_left,
           (SELECT CAST(count(*) AS BIGINT) FROM cb) AS n_keys_right,
           CAST(count(*) AS BIGINT) AS n_keys_matched,
           CAST(sum(p) AS BIGINT) AS join_rows,
           (SELECT CAST(k AS BIGINT) FROM mx) AS heaviest_key,
           (SELECT CAST(p AS BIGINT) FROM mx) AS heaviest_key_rows
    FROM prod
    """,
    note="exact equi-join size forecast WITHOUT running the join: "
         "sum of per-key count products over the key tables plus the "
         "heaviest key (struct-max argmax, same pass) — the planner "
         "pre-flight that catches many-to-many explosions and feeds "
         "the salting decision. Struct max ties break toward the "
         "larger key, mirrored by the oracle's (p DESC, k DESC) "
         "(operators/relational.py::join_size_preflight)")
def join_size_preflight_entry(spark, sf_dir):
    from mapreduce_wsi_spark.operators.relational import (
        join_size_preflight)
    return join_size_preflight(tbl(spark, sf_dir, "orders"),
                               tbl(spark, sf_dir, "customer"),
                               "o_custkey", "c_custkey")


@register(
    "dedup_time_window",
    oracle="""
    WITH w AS (
        SELECT event_type,
               row_number() OVER (
                   PARTITION BY user_id, event_type,
                       CAST(floor(epoch(ts) / 3600) AS BIGINT)
                   ORDER BY ts, event_id) AS rn
        FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept
    FROM w GROUP BY 1
    """,
    note="batch twin of rolling dedup: keep the FIRST event per "
         "(user, type) inside each 1h tumbling window — the "
         "at-most-once-per-hour throttle a notification/feature "
         "pipeline applies. One composite-key window ((user, type, "
         "hour-bucket) partitioning spreads hot users across hours), "
         "total (ts, event_id) order; the streaming sibling is "
         "dropDuplicates-within-watermark "
         "(streaming tests: stream_dedup_within_watermark)")
def dedup_time_window(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    hour = F.floor(F.col("ts").cast("long") / 3600).cast("bigint")
    w = (Window.partitionBy("user_id", "event_type", hour)
         .orderBy("ts", "event_id"))
    r = ev.withColumn("__rn", F.row_number().over(w))
    return (r.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.when(F.col("__rn") == 1, 1).otherwise(0))
                 .cast("long").alias("n_kept")))


@register(
    "seq_gap_audit",
    oracle="""
    WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
    b AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(min(k) AS BIGINT) AS min_key,
                 CAST(max(k) AS BIGINT) AS max_key
          FROM k),
    gaps AS (SELECT a.k FROM k a LEFT JOIN k b2 ON b2.k = a.k + 1
             WHERE b2.k IS NULL AND a.k < (SELECT max_key FROM b))
    SELECT n_keys, min_key, max_key,
           (SELECT CAST(count(*) AS BIGINT) FROM gaps) AS n_gaps,
           max_key - min_key + 1 - n_keys AS n_missing
    FROM b
    """,
    note="sequence-gap audit over a surrogate-key column: gap starts "
         "via the shifted self anti-join (k+1 absent — an equi-join, "
         "parallel on the key, never a global sort), missing total "
         "from range arithmetic — the ingestion-completeness check "
         "run after every backfill. At sf0.01 orders keys are dense "
         "(0 gaps), so the zero must be PROVEN by the same plan that "
         "finds real gaps (planted-gap pytest)")
def seq_gap_audit(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")).distinct()
    b = o.agg(F.count(F.lit(1)).alias("n_keys"),
              F.min("k").cast("long").alias("min_key"),
              F.max("k").cast("long").alias("max_key"))
    gap_starts = (o.join(o.select(F.col("k").alias("__k2")),
                         F.col("k") + 1 == F.col("__k2"), "left_anti"))
    n_gaps = (gap_starts.crossJoin(F.broadcast(b.select("max_key")))
              .filter(F.col("k") < F.col("max_key"))
              .agg(F.count(F.lit(1)).alias("n_gaps")))
    return (b.crossJoin(F.broadcast(n_gaps))
            .select("n_keys", "min_key", "max_key",
                    F.col("n_gaps").cast("long").alias("n_gaps"),
                    (F.col("max_key") - F.col("min_key") + 1
                     - F.col("n_keys")).alias("n_missing")))


@register(
    "window_time_range_frame",
    oracle="""
    WITH e AS (SELECT user_id, ts, event_id,
                      CAST(round(value * 100) AS BIGINT) AS cents,
                      epoch(ts)::BIGINT AS sec
               FROM events)
    SELECT user_id, event_id,
           CAST(count(*) OVER w - 1 AS BIGINT) AS n_prev_1h,
           CAST(sum(cents) OVER w - cents AS BIGINT)
               AS prev_1h_cents
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    note="time-interval RANGE frame (the rate-limiter / velocity "
         "feature): per event, how many prior same-user events and "
         "cents landed in the trailing hour — frame membership by "
         "TIME distance on the epoch second, not row offset, so "
         "bursts and quiet periods produce different frame widths. "
         "Same-timestamp peers share a frame (RANGE semantics); the "
         "current row is subtracted out in-plan, keeping the output "
         "deterministic without an exclusion clause (Spark lacks "
         "EXCLUDE CURRENT ROW). One user_id exchange")
def window_time_range_frame(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    e = ev.select("user_id", "event_id",
                  F.round(F.col("value") * 100).cast("bigint")
                  .alias("cents"),
                  F.col("ts").cast("long").alias("sec"))
    w = (Window.partitionBy("user_id").orderBy("sec")
         .rangeBetween(-3600, 0))
    return e.select(
        "user_id", "event_id",
        (F.count(F.lit(1)).over(w) - 1).cast("long").alias("n_prev_1h"),
        (F.sum("cents").over(w) - F.col("cents")).cast("long")
        .alias("prev_1h_cents"))


@register(
    "dq_outlier_iqr",
    oracle="""
    WITH cd AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS c,
               cume_dist() OVER (PARTITION BY event_type
                                 ORDER BY round(value * 100)) AS cd
        FROM events),
    q AS (SELECT event_type,
                 min(CASE WHEN cd >= 0.25 THEN c END) AS p25,
                 min(CASE WHEN cd >= 0.75 THEN c END) AS p75
          FROM cd GROUP BY 1),
    f AS (SELECT event_type, p25, p75,
                 4 * p25 - 3 * (p75 - p25) AS lo4,
                 4 * p75 + 3 * (p75 - p25) AS hi4
          FROM q)
    SELECT e.event_type,
           CAST(f.p25 AS BIGINT) AS p25_cents,
           CAST(f.p75 AS BIGINT) AS p75_cents,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN 4 * CAST(round(e.value * 100) AS BIGINT)
                              < f.lo4
                          OR 4 * CAST(round(e.value * 100) AS BIGINT)
                              > f.hi4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN f USING (event_type)
    GROUP BY 1, 2, 3
    """,
    note="Tukey IQR-fence outlier audit per type: exact "
         "PERCENTILE_DISC quartiles (cume_dist recipe), fences "
         "multiplied through by 4 so the 1.5*IQR test is pure integer "
         "(4v < 4*p25 - 3*IQR) — no float quartile arithmetic to "
         "disagree on; quartile table broadcast back over one more "
         "scan. The boxplot sibling of robust_mad_stats")
def dq_outlier_iqr(spark, sf_dir):
    from pyspark.sql import Window
    ev = tbl(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("bigint")
    # cume_dist over the PER-VALUE aggregate (r9 audit): the raw-row
    # form pushed every event of a type through one unsplittable
    # window partition; distinct (type, cents) pairs are value-domain
    # bounded. cume_dist of a row equals cum(count)/n of its value —
    # same operands, same division, identical quartile picks.
    vals = (ev.select("event_type", c.alias("c"))
            .groupBy("event_type", "c")
            .agg(F.count(F.lit(1)).alias("__cnt")))
    wv = (Window.partitionBy("event_type").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy("event_type")
    cd = vals.select(
        "event_type", "c",
        (F.sum("__cnt").over(wv).cast("double")
         / F.sum("__cnt").over(wt)).alias("cd"))
    q = (cd.groupBy("event_type")
         .agg(F.min(F.when(F.col("cd") >= 0.25, F.col("c")))
              .alias("p25"),
              F.min(F.when(F.col("cd") >= 0.75, F.col("c")))
              .alias("p75")))
    f = q.select("event_type", "p25", "p75",
                 (4 * F.col("p25") - 3 * (F.col("p75") - F.col("p25")))
                 .alias("lo4"),
                 (4 * F.col("p75") + 3 * (F.col("p75") - F.col("p25")))
                 .alias("hi4"))
    j = ev.select("event_type", c.alias("c")).join(F.broadcast(f),
                                                   "event_type")
    return (j.groupBy("event_type", F.col("p25").alias("p25_cents"),
                      F.col("p75").alias("p75_cents"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when((4 * F.col("c") < F.col("lo4"))
                              | (4 * F.col("c") > F.col("hi4")), 1)
                       .otherwise(0)).cast("long").alias("n_outliers")))


@register(
    "laplace_mechanism_demo",
    oracle="""
    WITH c AS (SELECT event_type, count(*) AS n FROM events
               GROUP BY 1),
    u AS (SELECT event_type, n,
                 (CAST(CAST(('0x' || substr(md5('dp:' || event_type),
                                            1, 8)) AS BIGINT) % 1000000
                       AS DOUBLE) + 0.5) / 1000000.0 AS uu
          FROM c),
    z AS (SELECT event_type, n,
                 round(CASE WHEN uu >= 0.5
                            THEN -ln(1.0 - 2.0 * (uu - 0.5))
                            ELSE  ln(1.0 - 2.0 * (0.5 - uu)) END, 9)
                     AS noise
          FROM u)
    SELECT event_type,
           CAST(n + round(noise) AS BIGINT) AS noisy_count
    FROM z
    """,
    note="Laplace-mechanism SHAPE demo — NOT a differential-privacy "
         "release (ADVICE r7): the noise is an inverse-CDF transform "
         "of the md5-uniform of the PUBLIC group key, so anyone can "
         "recompute and subtract it — zero privacy by design, which "
         "is exactly what makes the twin replayable under the repo's "
         "no-rand() discipline. The entry demonstrates the "
         "distributed mechanics a real release would use (per-group "
         "sensitivity-1 counts, inverse-CDF b=1/eps noise, "
         "integerized post-rounding at 9dp); a REAL release must draw "
         "the uniform from a secret per-publication seed held outside "
         "the published plan, and would then not be oracle-twinnable. "
         "No epsilon column — this table grants no privacy budget")
def laplace_mechanism_demo(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    h = F.conv(F.substring(F.md5(F.concat(F.lit("dp:"),
                                          F.col("event_type"))), 1, 8),
               16, 10).cast("long")
    uu = ((h % 1000000).cast("double") + 0.5) / 1000000.0
    noise = F.round(
        F.when(uu >= 0.5, -F.log(1.0 - 2.0 * (uu - 0.5)))
        .otherwise(F.log(1.0 - 2.0 * (0.5 - uu))), 9)
    return c.select(
        "event_type",
        (F.col("n") + F.round(noise)).cast("long").alias("noisy_count"))


@register(
    "sketch_bloom_fpr",
    oracle="""
    WITH sk AS (SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS k
                FROM part WHERE p_partkey % 2 = 0),
    pos AS (SELECT CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT)
                   % 4096 AS p FROM sk
            UNION
            SELECT CAST(('0x' || substr(md5(k), 9, 8)) AS BIGINT)
                   % 4096 FROM sk),
    probe AS (SELECT CAST(p_partkey AS VARCHAR) AS k FROM part
              WHERE p_partkey % 2 = 1),
    hits AS (SELECT k FROM probe
             WHERE CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT)
                       % 4096 IN (SELECT p FROM pos)
               AND CAST(('0x' || substr(md5(k), 9, 8)) AS BIGINT)
                       % 4096 IN (SELECT p FROM pos))
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM sk) AS n_members,
           (SELECT CAST(count(*) AS BIGINT) FROM pos) AS n_bits_set,
           (SELECT CAST(count(*) AS BIGINT) FROM probe) AS n_probes,
           CAST(count(*) AS BIGINT) AS n_false_positives,
           (SELECT count(*) FROM hits) * 1000000
               // (SELECT count(*) FROM probe) AS fpr_ppm
    FROM hits
    """,
    note="measured Bloom false-positive rate: build the 4096-bit "
         "2-hash md5 filter (the join_bloom_prune convention) on the "
         "EVEN part keys, probe the disjoint ODD keys — every hit is "
         "a false positive by construction, so the entry reports the "
         "filter's actual FPR in exact integer ppm (vs the (1-e^-kn/m)^k "
         "theory a sizing decision starts from). Deterministic: the "
         "filter is a pure function of the member set")
def sketch_bloom_fpr(spark, sf_dir):
    part = tbl(spark, sf_dir, "part")
    k = F.col("p_partkey").cast("string")
    h1 = F.conv(F.substring(F.md5(k), 1, 8), 16, 10).cast("long") % 4096
    h2 = F.conv(F.substring(F.md5(k), 9, 8), 16, 10).cast("long") % 4096
    members = part.filter(F.col("p_partkey") % 2 == 0)
    pos = (members.select(h1.alias("p"))
           .unionByName(members.select(h2.alias("p"))).distinct())
    probes = part.filter(F.col("p_partkey") % 2 == 1)
    hits = (probes
            .join(pos.withColumnRenamed("p", "__p1"),
                  h1 == F.col("__p1"), "left_semi")
            .join(pos.withColumnRenamed("p", "__p2"),
                  h2 == F.col("__p2"), "left_semi"))
    nm = members.select(k.alias("k")).distinct().agg(
        F.count(F.lit(1)).alias("n_members"))
    nb = pos.agg(F.count(F.lit(1)).alias("n_bits_set"))
    np_ = probes.agg(F.count(F.lit(1)).alias("n_probes"))
    nf = hits.agg(F.count(F.lit(1)).alias("n_false_positives"))
    return (nm.crossJoin(nb).crossJoin(np_).crossJoin(nf)
            .select("n_members", "n_bits_set", "n_probes",
                    "n_false_positives",
                    F.expr("n_false_positives * 1000000L div n_probes")
                    .alias("fpr_ppm")))


from mapreduce_wsi_spark.plans.q_graph import _EDGES_CTE  # noqa: E402


@register(
    "graph_degree_distribution",
    oracle=f"""
    WITH e AS ({_EDGES_CTE}),
    und AS (SELECT lo AS src FROM e UNION ALL SELECT hi FROM e),
    deg AS (SELECT src, count(*) AS d FROM und GROUP BY 1)
    SELECT CAST(d AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY 1
    """,
    note="degree distribution of the co-purchase graph — the "
         "skew/power-law diagnostic read before choosing graph "
         "partitioning (a heavy-tail histogram argues for the "
         "star-contraction components and salting paths the repo "
         "already ships). Two partial-agg groupBys, output bounded "
         "by the max degree")
def graph_degree_distribution(spark, sf_dir):
    from mapreduce_wsi_spark.plans.q_graph import part_edges
    li = tbl(spark, sf_dir, "lineitem")
    e = part_edges(li).select("lo", "hi")
    und = (e.select(F.col("lo").alias("src"))
           .unionByName(e.select(F.col("hi").alias("src"))))
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    return (deg.groupBy(F.col("d").cast("long").alias("degree"))
            .agg(F.count(F.lit(1)).alias("n_nodes")))
