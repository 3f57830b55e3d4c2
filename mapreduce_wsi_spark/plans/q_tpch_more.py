"""Extended relational corpus: the remaining TPC-H query *shapes* adapted to
the driver fixtures, plus operator families not yet covered by q_relational
(EXISTS/non-equi semi, decorrelated scalar subqueries, multiset set-ops,
sequence/range joins, ordinal explode, exact variance, arg_max, string_agg).

The reference exposes none of these natively — in MR-land they live inside
user map/reduce code (MapReduceWSI.java:62-105); here each is a declarative
DataFrame plan Catalyst can optimize (broadcast dims, pushed filters,
partial aggs), with a DuckDB oracle twin.

Determinism contract (driver hash-compares float reprs bit-exactly):
- monetary math in DECIMAL(18,2/4), cast to double only at the end;
- any double division/multiplication appears in the SAME textual order on
  both sides (IEEE ops are deterministic given identical operand order);
- every LIMIT carries a unique total order; ties in arg_max are broken via
  a composite integer key.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from mapreduce_wsi_spark.plans.registry import register, tbl

_DEC = "decimal(18,2)"
_DISC_DEC = ("CAST(l_extendedprice AS DECIMAL(18,2)) * "
             "CAST(1.0 - l_discount AS DECIMAL(18,2))")


def _dec(c: Column) -> Column:
    return c.cast(_DEC)


def _disc_price(li) -> Column:
    return _dec(li["l_extendedprice"]) * _dec(F.lit(1.0) - li["l_discount"])


# --------------------------------------------------------------------------
# TPC-H query shapes (adapted to fixture schema — no commitdate/receiptdate,
# partsupp, or TPC-H text columns; predicates target the driver's value
# domains, see FIXTURES.md §B)
# --------------------------------------------------------------------------

@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    note="TPC-H Q6 shape: scan + conjunctive pushed filters + scalar agg; "
         "no shuffle beyond the single-row final agg")
def q6_forecast_revenue(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    return (li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24))
        .agg(F.sum(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount")))
             .cast("double").alias("revenue")))


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    note="TPC-H Q4 shape: EXISTS with a non-equi correlated predicate -> "
         "left-semi join (equi key + theta residual) then agg")
def q4_order_priority(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (o.join(li, (o["o_orderkey"] == li["l_orderkey"])
                   & (li["l_shipdate"] > o["o_orderdate"]), "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(sum({_DISC_DEC.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    note="TPC-H Q7 shape: 5-way join, two broadcast dim paths to the same "
         "nation table, disjunctive cross-dim predicate, agg by derived year")
def q7_volume_shipping(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    n1 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    j = (li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
         .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
         .join(o, li["l_orderkey"] == o["o_orderkey"])
         .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
         .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
         .filter(((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
                 | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("l_year"))
            .agg(F.sum(_disc_price(li)).cast("double").alias("revenue")))


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE CAST(0.00 AS DECIMAL(38,4)) END) AS DOUBLE)
                AS DOUBLE)
           / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             CAST({_DISC_DEC.replace('l_', 'l.l_')} AS DECIMAL(38,4)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
    ) t
    GROUP BY o_year
    """,
    note="TPC-H Q8 shape: 8-way snowflake join + conditional share-of-total; "
         "numerator/denominator summed exactly in decimal, one double division")
def q8_market_share(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    s = tbl(spark, sf_dir, "supplier")
    n1 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey"))
    n2 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = _disc_price(li).cast("decimal(38,4)")
    t = (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
         .join(o, li["l_orderkey"] == o["o_orderkey"])
         .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
         .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
         .join(F.broadcast(r), F.col("n1_rkey") == F.col("r_regionkey"))
         .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
         .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
         .select(F.year(o["o_orderdate"]).alias("o_year"),
                 vol.alias("volume"), F.col("supp_nation")))
    num = F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(F.lit("0.00").cast("decimal(38,4)"))).cast("double")
    den = F.sum(F.col("volume")).cast("double")
    return t.groupBy("o_year").agg((num / den).alias("mkt_share"))


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, year(l.l_shipdate) AS o_year,
           CAST(sum(CAST({_DISC_DEC.replace('l_', 'l.l_')} AS DECIMAL(18,4))
                    - CAST(CAST(p.p_retailprice AS DECIMAL(18,2))
                           * CAST(l.l_quantity AS DECIMAL(18,2))
                           AS DECIMAL(18,4))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(l.l_shipdate)
    """,
    note="TPC-H Q9 shape (partsupp-free): profit expression in exact decimal, "
         "LIKE-filtered part dim broadcast, agg by nation x year")
def q9_product_profit(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    profit = (_disc_price(li).cast("decimal(18,4)")
              - (_dec(F.col("p_retailprice")) * _dec(li["l_quantity"]))
              .cast("decimal(18,4)"))
    return (li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("l_shipdate").alias("o_year"))
            .agg(F.sum(profit).cast("double").alias("profit")))


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum({_DISC_DEC.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    note="TPC-H Q10 shape: fact-fact join + broadcast dims + top-20 by "
         "revenue (TakeOrderedAndProject, no global sort)")
def q10_returned_items(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = tbl(spark, sf_dir, "nation")
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.sum(_disc_price(li)).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


@register(
    "q12_late_shipment",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           count(*) AS total_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    note="TPC-H Q12 shape: conditional aggregation over interval arithmetic "
         "(timestamp + INTERVAL) across a fact-fact join")
def q12_late_shipment(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    late = F.when(
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS"),
        F.lit(1)).otherwise(F.lit(0))
    return (o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.sum(late).alias("late_count"),
                 F.count(F.lit(1)).alias("total_count")))


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                 THEN CAST({_DISC_DEC.replace('l_', 'l.l_')}
                                      AS DECIMAL(38,4))
                                 ELSE CAST(0.00 AS DECIMAL(38,4)) END) AS DOUBLE)
           / CAST(sum(CAST({_DISC_DEC.replace('l_', 'l.l_')}
                      AS DECIMAL(38,4))) AS DOUBLE) AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-02-01'
    """,
    note="TPC-H Q14 shape: conditional share-of-total in one pass; exact "
         "decimal sums, single double divide at the end")
def q14_promo_revenue(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp")))
    p = tbl(spark, sf_dir, "part")
    vol = _disc_price(li).cast("decimal(38,4)")
    num = F.sum(F.when(F.col("p_type") == "PROMO", vol)
                .otherwise(F.lit("0.00").cast("decimal(38,4)"))).cast("double")
    den = F.sum(vol).cast("double")
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .agg((F.lit(100.0) * num / den).alias("promo_revenue")))


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    note="TPC-H Q18 shape: IN over a HAVING-filtered agg (semi join against "
         "an aggregated subquery), then re-agg + top-100")
def q18_large_volume_customer(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    # fresh scan for the subquery side: a shared `li` lineage would make
    # l_quantity ambiguous after the semi-join (classic self-join pitfall)
    li_sub = tbl(spark, sf_dir, "lineitem")
    big = (li_sub.groupBy("l_orderkey")
           .agg(F.sum(_dec(F.col("l_quantity"))).alias("q"))
           .filter(F.col("q") > 300)
           .select(F.col("l_orderkey").alias("big_okey")))
    return (o.join(big, o["o_orderkey"] == big["big_okey"], "left_semi")
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(li, o["o_orderkey"] == li["l_orderkey"])
            .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                     "o_totalprice")
            .agg(F.sum(_dec(li["l_quantity"])).cast("double").alias("total_qty"))
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(100))


@register(
    "q19_disjunctive_pred",
    oracle=f"""
    SELECT CAST(sum({_DISC_DEC.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 30)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    note="TPC-H Q19 shape: disjunction of conjunctive cross-table "
         "predicates — Catalyst extracts the common join key, pushes "
         "single-table residuals below the join")
def q19_disjunctive_pred(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part")
    cond = (((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
             & F.col("l_quantity").between(1, 30))
            | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
               & F.col("l_quantity").between(10, 40))
            | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
               & F.col("l_quantity").between(20, 50)))
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .filter(cond)
            .agg(F.sum(_disc_price(li)).cast("double").alias("revenue")))


@register(
    "top_supplier_per_nation",
    oracle="""
    SELECT n_name, s_name, s_acctbal FROM (
      SELECT n.n_name, s.s_name, s.s_acctbal,
             row_number() OVER (PARTITION BY s.s_nationkey
                                ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rn
      FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    ) t WHERE rn = 1
    """,
    note="TPC-H Q2 shape (min-cost-supplier analogue): per-group argmax via "
         "ranked window, the decorrelated form of Q2's scalar subquery")
def top_supplier_per_nation(spark, sf_dir):
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("n_name", "s_name", "s_acctbal"))


@register(
    "above_avg_balance",
    oracle="""
    SELECT c.c_nationkey, count(*) AS n_above
    FROM customer c
    JOIN (SELECT c_nationkey AS nk, count(*) AS n,
                 sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s
          FROM customer GROUP BY c_nationkey) g
      ON c.c_nationkey = g.nk
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * g.n > g.s
    GROUP BY c.c_nationkey
    """,
    note="decorrelated scalar subquery (TPC-H Q22 pattern): 'acctbal above "
         "nation average' tested as acctbal*n > sum — multiply instead of "
         "divide keeps the comparison in exact decimal")
def above_avg_balance(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    g = (c.groupBy(F.col("c_nationkey").alias("nk"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(_dec(F.col("c_acctbal"))).alias("s")))
    return (c.join(F.broadcast(g), c["c_nationkey"] == g["nk"])
            .filter(_dec(c["c_acctbal"]) * F.col("n") > F.col("s"))
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_above")))


# --------------------------------------------------------------------------
# Operator families beyond the TPC-H shapes
# --------------------------------------------------------------------------

@register(
    "string_agg_sorted",
    oracle="""
    SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
    note="ordered list aggregation: collect_list -> array_sort -> array_join "
         "(deterministic regardless of shuffle arrival order)")
def string_agg_sorted(spark, sf_dir):
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    return (n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .groupBy("r_name")
            .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",")
                 .alias("nations")))


@register(
    "argmax_per_group",
    oracle="""
    SELECT l_returnflag,
           arg_max(l_partkey,
                   CAST(round(l_extendedprice * 100) AS BIGINT) * 10000000
                   + l_partkey) AS top_partkey,
           arg_min(l_partkey,
                   CAST(round(l_extendedprice * 100) AS BIGINT) * 10000000
                   + l_partkey) AS bottom_partkey
    FROM lineitem GROUP BY l_returnflag
    """,
    note="arg_max/arg_min (max_by/min_by): ties on the 2-decimal price are "
         "broken by folding the key into a composite integer ordering value")
def argmax_per_group(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    ckey = (F.round(F.col("l_extendedprice") * 100).cast("long")
            * F.lit(10000000) + F.col("l_partkey"))
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_partkey", ckey).alias("top_partkey"),
        F.min_by("l_partkey", ckey).alias("bottom_partkey"))


@register(
    "var_std_exact",
    oracle="""
    SELECT l_returnflag, n,
           (s2 - s1 * s1 / n) / (n - 1) AS var_qty,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std_qty
    FROM (
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM lineitem GROUP BY l_returnflag
    ) t
    """,
    note="sample variance/stddev with deterministic float result: moments "
         "accumulated exactly in decimal, one fixed-order double expression "
         "at the end (native stddev_samp's summation order is "
         "partitioning-dependent and would not hash-match)")
def var_std_exact(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    q = _dec(F.col("l_quantity"))
    base = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"))
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return base.select("l_returnflag", "n", var.alias("var_qty"),
                       F.sqrt(var).alias("std_qty"))


@register(
    "set_except_all",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    EXCEPT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    note="multiset difference (EXCEPT ALL) — preserves duplicate "
         "cardinalities, unlike the distinct-izing EXCEPT in set_except")
def set_except_all(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return a.exceptAll(r)


@register(
    "set_intersect_all",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    note="multiset intersection (INTERSECT ALL) with duplicate preservation")
def set_intersect_all(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return a.intersectAll(r)


@register(
    "histogram_fixed_buckets",
    oracle="""
    SELECT t.bucket, count(l.l_orderkey) AS n
    FROM range(0, 13) t(bucket)
    LEFT JOIN lineitem l
      ON CAST(floor(l.l_quantity / 4.0) AS BIGINT) = t.bucket
    GROUP BY t.bucket
    """,
    note="sequence generation (spark.range) + outer join so empty buckets "
         "survive — fixed-width histogram without a driver-side loop")
def histogram_fixed_buckets(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    buckets = spark.range(0, 13).select(F.col("id").alias("bucket"))
    li_b = li.select(
        F.floor(F.col("l_quantity") / F.lit(4.0)).cast("long").alias("b"),
        "l_orderkey")
    return (F.broadcast(buckets).join(li_b, buckets["bucket"] == li_b["b"], "left")
            .groupBy("bucket")
            .agg(F.count("l_orderkey").alias("n")))


@register(
    "explode_words_ordinal",
    oracle="""
    SELECT p_partkey, pos1,
           string_split(p_name, ' ')[CAST(pos1 AS INT)] AS word
    FROM (SELECT p_partkey, p_name,
                 unnest(generate_series(1, len(string_split(p_name, ' '))))
                 AS pos1
          FROM part) t
    """,
    note="ordinal explode (posexplode): UNNEST WITH ORDINALITY equivalent; "
         "position is data, not arrival order")
def explode_words_ordinal(spark, sf_dir):
    p = tbl(spark, sf_dir, "part")
    return (p.select("p_partkey",
                     F.posexplode(F.split(F.col("p_name"), " ")))
            .select("p_partkey", (F.col("pos") + 1).cast("long").alias("pos1"),
                    F.col("col").alias("word")))


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
    note="TPC-H Q13 shape: outer join so zero-order customers count, then "
         "a histogram over the per-customer counts (double aggregation)")
def q13_customer_distribution(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    per_cust = (c.join(o, c["c_custkey"] == o["o_custkey"], "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, sum({_DISC_DEC}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    note="TPC-H Q15 shape: scalar subquery against a derived aggregate "
         "(max-of-agg) — decorrelated as a broadcast of the 1-row max; "
         "equality on exact decimal, so ties are exact, not float-fuzzy")
def q15_top_supplier(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    rev = (li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
        .groupBy("l_suppkey")
        .agg(F.sum(_disc_price(li)).alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("mx"))
            .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
            .select("s_suppkey", "s_name",
                    F.col("total_revenue").cast("double").alias("total_revenue")))


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey AS pk, count(*) AS n,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS s
          FROM lineitem GROUP BY l_partkey) t ON t.pk = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * t.n < t.s
    GROUP BY ()
    """,
    note="TPC-H Q17 shape: correlated scalar avg (qty < 0.2*avg(qty) per "
         "part) decorrelated to a per-part (n, sum) join; the threshold "
         "test is multiplied through (5*qty*n < s) to stay in exact "
         "decimal — no float avg on either side")
def q17_small_quantity_revenue(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = (tbl(spark, sf_dir, "lineitem")
                .groupBy(F.col("l_partkey").alias("pk"))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(_dec(F.col("l_quantity"))).alias("s")))
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .join(per_part, li["l_partkey"] == per_part["pk"])
            .filter(_dec(li["l_quantity"]) * F.lit(5) * F.col("n") < F.col("s"))
            .agg((F.sum(_dec(li["l_extendedprice"])).cast("double") / F.lit(7.0))
                 .cast("double").alias("avg_yearly")))


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH ostat AS (
      SELECT l.l_orderkey,
             count(DISTINCT l.l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l.l_shipdate >
                                      o.o_orderdate + INTERVAL 90 DAY
                                 THEN l.l_suppkey END) AS n_late_supp
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey)
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN ostat t ON t.l_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND t.n_supp >= 2 AND t.n_late_supp = 1
    GROUP BY s.s_name
    """,
    note="TPC-H Q21 shape: EXISTS + correlated NOT EXISTS decorrelated to "
         "per-order (distinct suppliers, distinct late suppliers) counts — "
         "'the only late supplier on a multi-supplier finished order'")
def q21_waiting_supplier(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = tbl(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    base = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    ostat = (base.groupBy(li["l_orderkey"].alias("okey"))
             .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                  F.countDistinct(F.when(late, F.col("l_suppkey")))
                  .alias("n_late_supp")))
    l1 = tbl(spark, sf_dir, "lineitem")
    return (l1.join(o, l1["l_orderkey"] == o["o_orderkey"])
            .filter(l1["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 90 DAYS"))
            .join(ostat, l1["l_orderkey"] == F.col("okey"))
            .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
            .join(F.broadcast(s), l1["l_suppkey"] == s["s_suppkey"])
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait")))


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH pos AS (SELECT count(*) AS n,
                        sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s
                 FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_nationkey AS cntrycode, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           AS totacctbal
    FROM customer c, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c.c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
    note="TPC-H Q22 shape (phone prefix -> nationkey): global scalar avg "
         "(as exact bal*n > s), anti join against urgent orders, agg by "
         "country code")
def q22_global_sales_opportunity(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    pos = (c.filter(F.col("c_acctbal") > 0.0)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(_dec(F.col("c_acctbal"))).alias("s")))
    return (c.crossJoin(F.broadcast(pos))
            .filter(_dec(F.col("c_acctbal")) * F.col("n") > F.col("s"))
            .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
            .groupBy(F.col("c_nationkey").alias("cntrycode"))
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.sum(_dec(F.col("c_acctbal"))).cast("double")
                 .alias("totacctbal")))


@register(
    "q11_important_stock",
    oracle=f"""
    WITH sup_val AS (
      SELECT s.s_nationkey, l.l_suppkey, sum({_DISC_DEC.replace('l_', 'l.l_')})
             AS val
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey)
    SELECT l_suppkey, CAST(val AS DOUBLE) AS val
    FROM sup_val, (SELECT sum(val) AS tot FROM sup_val) t
    WHERE val * 1000 > tot
    """,
    note="TPC-H Q11 shape (partsupp -> lineitem-revenue proxy): HAVING "
         "against a global scalar aggregate; threshold multiplied through "
         "(val*1000 > tot) to stay in exact decimal, broadcast 1-row total")
def q11_important_stock(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    sup_val = (li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
               .groupBy("s_nationkey", "l_suppkey")
               .agg(F.sum(_disc_price(li)).alias("val")))
    tot = sup_val.agg(F.sum("val").alias("tot"))
    return (sup_val.crossJoin(F.broadcast(tot))
            .filter(F.col("val") * 1000 > F.col("tot"))
            .select("l_suppkey", F.col("val").cast("double").alias("val")))


@register(
    "q16_supplier_relationship",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    note="TPC-H Q16 shape (partsupp -> lineitem bridge): NOT IN subquery "
         "as left-anti join against the excluded-supplier set, "
         "count-distinct per part attribute triple")
def q16_supplier_relationship(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad = (tbl(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"],
                    "left_anti")
            .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@register(
    "q20_excess_shipper",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey),
    pt AS (SELECT l_partkey AS pk, sum(sq) AS tq FROM pq GROUP BY 1)
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT pq.l_suppkey FROM pq
                          JOIN pt ON pt.pk = pq.l_partkey
                          WHERE pq.sq * 2 > pt.tq)
    """,
    note="TPC-H Q20 shape (availqty -> shipped-quantity proxy): IN over a "
         "join of two derived aggregates ('supplier shipped more than half "
         "of some part's 1996 volume'), decorrelated as semi join; "
         "threshold in exact decimal (sq*2 > tq)")
def q20_excess_shipper(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    s = tbl(spark, sf_dir, "supplier")
    pq = (li.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum(_dec(F.col("l_quantity"))).alias("sq")))
    pt = (pq.groupBy(F.col("l_partkey").alias("pk"))
          .agg(F.sum("sq").alias("tq")))
    excess = (pq.join(pt, pq["l_partkey"] == pt["pk"])
              .filter(F.col("sq") * 2 > F.col("tq"))
              .select(F.col("l_suppkey").alias("xs")))
    return (s.join(excess, s["s_suppkey"] == excess["xs"], "left_semi")
            .select("s_suppkey", "s_name"))
