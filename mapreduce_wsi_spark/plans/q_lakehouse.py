"""Lakehouse table-maintenance entries: MERGE/upsert (CDC apply),
incremental aggregate maintenance, Z-order clustering keys.

No reference analogue (the reference's tables are write-once text dumps +
RDBMS appends, MapReduceWSIImpl.java:180-210) — but any user keeping a
large table current runs exactly these, so they're first-class catalog
entries with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.lakehouse import (
    merge_aggregates, merge_upsert, zorder_key, zorder_key_sql)
from mapreduce_wsi_spark.plans.registry import register, tbl

# Deterministic CDC batch derived from orders: every 10th key is an
# update (after-image: status 'U', price +100), every 50th of those a
# delete, and every 100th key re-appears shifted by +10,000,000 as an
# insert. Spark and DuckDB build the identical batch from the same scan.
_SRC_SQL = """
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_custkey,
           'U' AS o_orderstatus,
           o_totalprice + 100.0 AS o_totalprice,
           o_orderdate, o_orderpriority,
           (o_orderkey % 50 = 0) AS is_delete
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT CAST(o_orderkey AS BIGINT) + 10000000, o_custkey, 'N',
           o_totalprice, o_orderdate, o_orderpriority, false
    FROM orders WHERE o_orderkey % 100 = 0
"""


def _cdc_batch(orders):
    updates = (orders.filter(F.col("o_orderkey") % 10 == 0)
               .select(F.col("o_orderkey").cast("long").alias("o_orderkey"),
                       "o_custkey",
                       F.lit("U").alias("o_orderstatus"),
                       (F.col("o_totalprice") + F.lit(100.0))
                       .alias("o_totalprice"),
                       "o_orderdate", "o_orderpriority",
                       (F.col("o_orderkey") % 50 == 0).alias("is_delete")))
    inserts = (orders.filter(F.col("o_orderkey") % 100 == 0)
               .select((F.col("o_orderkey").cast("long") + 10000000)
                       .alias("o_orderkey"),
                       "o_custkey",
                       F.lit("N").alias("o_orderstatus"),
                       "o_totalprice", "o_orderdate", "o_orderpriority",
                       F.lit(False).alias("is_delete")))
    return updates.unionByName(inserts)


@register(
    "merge_upsert_cdc",
    oracle=f"""
    WITH src AS ({_SRC_SQL})
    SELECT CAST(t.o_orderkey AS BIGINT) AS o_orderkey, t.o_custkey,
           t.o_orderstatus, t.o_totalprice, t.o_orderdate, t.o_orderpriority
    FROM orders t
    WHERE CAST(t.o_orderkey AS BIGINT) NOT IN (SELECT o_orderkey FROM src)
    UNION ALL
    SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice,
           s.o_orderdate, s.o_orderpriority
    FROM src s
    WHERE NOT s.is_delete
      AND s.o_orderkey IN (SELECT CAST(o_orderkey AS BIGINT) FROM orders)
    UNION ALL
    SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice,
           s.o_orderdate, s.o_orderpriority
    FROM src s
    WHERE s.o_orderkey NOT IN (SELECT CAST(o_orderkey AS BIGINT) FROM orders)
    """,
    note="copy-on-write MERGE (update + delete + insert in one batch): "
         "target scanned but never shuffled — the CDC batch is broadcast "
         "on every pass and the insert branch anti-joins the batch against "
         "the small matched-key set, not the target; at 100 TB the cost is "
         "two table scans + one broadcast, the copy-on-write floor")
def merge_upsert_cdc(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders").withColumn(
        "o_orderkey", F.col("o_orderkey").cast("long"))
    batch = _cdc_batch(tbl(spark, sf_dir, "orders"))
    return merge_upsert(orders, batch, keys=["o_orderkey"],
                        delete_col="is_delete")


@register(
    "incremental_agg_merge",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    note="incremental view maintenance: the pre-cutoff aggregate (the "
         "'materialized view') is refreshed by merging the post-cutoff "
         "delta's partial aggregate — count/sum merge associatively, avg "
         "re-derives from merged sums; the oracle recomputes from the full "
         "base table and must agree exactly (decimal sums). At 100 TB the "
         "refresh touches O(groups) rows, not the base table")
def incremental_agg_merge(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-01-01").cast("date")

    def partial(df):
        return (df.groupBy("l_returnflag", "l_linestatus")
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                     .alias("sum_qty_d"),
                     F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                     .alias("sum_price_d")))

    prev = partial(li.filter(F.col("l_shipdate") < cutoff))
    delta = partial(li.filter(F.col("l_shipdate") >= cutoff))
    merged = merge_aggregates(prev, delta,
                              keys=["l_returnflag", "l_linestatus"],
                              count_col="n_rows",
                              sum_cols=["sum_qty_d", "sum_price_d"])
    return merged.select(
        "l_returnflag", "l_linestatus", "n_rows",
        F.col("sum_qty_d").cast("double").alias("sum_qty"),
        F.col("sum_price_d").cast("double").alias("sum_price"),
        (F.col("sum_qty_d").cast("double")
         / F.col("n_rows").cast("double")).alias("avg_qty"))


_Z_BITS = 8

@register(
    "layout_zorder_key",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_custkey % 256 AS zx,
               date_diff('day', DATE '1992-01-01',
                         CAST(o_orderdate AS DATE)) % 256 AS zy
        FROM orders)
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(zx AS BIGINT) AS zx, CAST(zy AS BIGINT) AS zy,
           CAST({zorder_key_sql('zx', 'zy', _Z_BITS)} AS BIGINT) AS zval
    FROM base
    """,
    note="Z-order (Morton) clustering key over (custkey, order date): "
         "sorting by the interleaved key clusters BOTH dimensions, so "
         "file-level min/max pruning works for predicates on either — the "
         "data-layout primitive behind OPTIMIZE ZORDER BY; unrolled "
         "div/mod arithmetic stays in whole-stage codegen and runs "
         "verbatim in the oracle; see test_zorder_clusters_both_dims for "
         "the measured pruning-span win")
def layout_zorder_key(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    zx = F.col("o_custkey").cast("long") % 256
    zy = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")) \
        .cast("long") % 256
    return orders.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        zx.alias("zx"), zy.alias("zy"),
        zorder_key(F.col("o_custkey"),
                   F.datediff(F.col("o_orderdate"),
                              F.lit("1992-01-01").cast("date")),
                   bits=_Z_BITS).alias("zval"))


@register(
    "table_diff_keyed",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           'changed' AS change_type
    FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 50 <> 0
    UNION ALL
    SELECT CAST(o_orderkey AS BIGINT), 'removed'
    FROM orders WHERE o_orderkey % 50 = 0
    UNION ALL
    SELECT CAST(o_orderkey AS BIGINT) + 10000000, 'added'
    FROM orders WHERE o_orderkey % 100 = 0
    """,
    note="keyed table diff (added/removed/changed) of orders vs its "
         "CDC-merged twin — must recover exactly the applied batch's "
         "classification, making this a composition test of merge_upsert "
         "AND table_diff; non-key columns collapse to an xxhash64 "
         "fingerprint per side so the full-outer join shuffles a key "
         "index, not whole rows; bucketed inputs make it exchange-free")
def table_diff_keyed(spark, sf_dir):
    from mapreduce_wsi_spark.operators.lakehouse import table_diff
    orders = tbl(spark, sf_dir, "orders").withColumn(
        "o_orderkey", F.col("o_orderkey").cast("long"))
    new = merge_upsert(orders, _cdc_batch(tbl(spark, sf_dir, "orders")),
                       keys=["o_orderkey"], delete_col="is_delete")
    return table_diff(orders, new, keys=["o_orderkey"])


@register(
    "incremental_join_view",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    note="Incremental join-view maintenance (append-only): V = orders "
         "JOIN lineitem is refreshed from date-cutoff deltas as "
         "V_old UNION [dA JOIN B_new UNION A_old JOIN dB] — the delta "
         "sides broadcast, V_old is never rescanned, and the full join "
         "never re-runs. The oracle IS the full recompute, so the "
         "incremental algebra must agree with it exactly, row counts "
         "and sums (operators/lakehouse.py::join_view_delta)")
def incremental_join_view(spark, sf_dir):
    from mapreduce_wsi_spark.operators.lakehouse import join_view_delta

    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = tbl(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_shipdate",
        "l_quantity")
    co = F.lit("1997-01-01").cast("timestamp")
    cl = F.lit("1997-06-01").cast("timestamp")
    a_old = orders.filter(F.col("o_orderdate") < co)
    d_a = orders.filter(F.col("o_orderdate") >= co)
    b_old = li.filter(F.col("l_shipdate") < cl)
    d_b = li.filter(F.col("l_shipdate") >= cl)

    v_old = a_old.join(b_old, on=["o_orderkey"])
    cols = ["o_orderkey", "o_orderpriority", "l_quantity"]
    delta = join_view_delta(a_old, d_a, b_old, d_b, ["o_orderkey"])
    v = v_old.select(*cols).unionByName(delta.select(*cols))
    return v.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double").alias("sum_qty"))


@register(
    "lakehouse_incremental_files",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_new_rows,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS new_cents
    FROM orders WHERE o_orderkey % 2 = 1
    """,
    note="manifest-driven incremental ingest: batch 1 (even orders) "
         "lands and is recorded in the processed-file manifest; batch "
         "2 (odd orders) appends to the same directory; the "
         "incremental read filters input_file_name() against the "
         "manifest, so only the NEW files' rows flow — the oracle "
         "over the odd half proves no old row leaks through and no "
         "new row is lost. File-path filtering prunes whole files at "
         "the scan; cost is O(new data) "
         "(operators/lakehouse.py::incremental_new_files)")
def lakehouse_incremental_files(spark, sf_dir):
    from mapreduce_wsi_spark.operators.lakehouse import (
        incremental_new_files)
    from mapreduce_wsi_spark.util import scratch_dir

    orders = tbl(spark, sf_dir, "orders")
    base = scratch_dir("incr_files", sf_dir)
    orders.filter(F.col("o_orderkey") % 2 == 0).write.parquet(
        base, mode="overwrite")
    manifest = spark.read.parquet(base).select(
        F.input_file_name().alias("f")).distinct()
    processed = [r["f"] for r in manifest.collect()]
    orders.filter(F.col("o_orderkey") % 2 == 1).write.parquet(
        base, mode="append")
    new = incremental_new_files(spark, base, processed)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return new.agg(
        F.count(F.lit(1)).alias("n_new_rows"),
        F.countDistinct("o_orderstatus").cast("long")
        .alias("n_statuses"),
        F.sum(cents).alias("new_cents"))


@register(
    "lakehouse_time_travel",
    oracle="""
    WITH v1 AS (SELECT count(*) AS n1,
                       CAST(sum(CAST(round(o_totalprice * 100)
                                AS BIGINT)) AS BIGINT) AS cents1
                FROM orders WHERE o_orderkey % 2 = 0),
    v2 AS (SELECT count(*) AS n2,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS cents2
           FROM orders)
    SELECT CAST(n1 AS BIGINT) AS v1_rows, cents1 AS v1_cents,
           CAST(n2 AS BIGINT) AS v2_rows, cents2 AS v2_cents,
           CAST(n2 - n1 AS BIGINT) AS rows_added
    FROM v1, v2
    """,
    note="snapshot time travel on the ORACLE path: v1 commits the "
         "even orders, v2 commits all; the query reads BOTH versions "
         "through read_snapshot and aggregates each — v1's numbers "
         "must match the even half even though v2 exists (immutable "
         "versioned directories; writers only create v=k+1, readers "
         "of v=k are isolated). The pytest suite covers the "
         "mechanism; this entry puts version isolation itself under "
         "the driver hash (operators/lakehouse.py::write_snapshot/"
         "read_snapshot)")
def lakehouse_time_travel(spark, sf_dir):
    from mapreduce_wsi_spark.operators.lakehouse import (
        read_snapshot, write_snapshot)
    from mapreduce_wsi_spark.util import scratch_dir

    orders = tbl(spark, sf_dir, "orders")
    base = scratch_dir("time_travel", sf_dir)
    write_snapshot(orders.filter(F.col("o_orderkey") % 2 == 0), base)
    write_snapshot(orders, base)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    v1 = read_snapshot(spark, base, 1).agg(
        F.count(F.lit(1)).alias("v1_rows"),
        F.sum(cents).alias("v1_cents"))
    v2 = read_snapshot(spark, base, 2).agg(
        F.count(F.lit(1)).alias("v2_rows"),
        F.sum(cents).alias("v2_cents"))
    return (v1.crossJoin(v2)
            .withColumn("rows_added",
                        F.col("v2_rows") - F.col("v1_rows")))
