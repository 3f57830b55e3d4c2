"""Lakehouse maintenance ops: MERGE semantics, incremental aggregate
maintenance, Z-order clustering quality, and the scale contract that the
MERGE never shuffles the target side."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.lakehouse import (
    merge_aggregates, merge_upsert, zorder_key)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, s string, v double")
    # 1 -> update, 3 -> delete, 9 -> insert; 9's delete flag is ignored
    # for unmatched rows (nothing to delete), matching MERGE semantics.
    source = spark.createDataFrame(
        [(1, "A", 11.0, False), (3, "c", 30.0, True), (9, "z", 90.0, False)],
        "k int, s string, v double, is_delete boolean")
    got = sorted(merge_upsert(target, source, keys=["k"],
                              delete_col="is_delete").collect())
    assert [tuple(r) for r in got] == [
        (1, "A", 11.0), (2, "b", 20.0), (9, "z", 90.0)]


def test_merge_upsert_unmatched_delete_is_insert_noop(spark):
    target = spark.createDataFrame([(1, "a")], "k int, s string")
    source = spark.createDataFrame([(5, "x", True)],
                                   "k int, s string, is_delete boolean")
    got = sorted(merge_upsert(target, source, ["k"], "is_delete").collect())
    # A delete for a key that doesn't exist must not insert it.
    assert [tuple(r) for r in got] == [(1, "a")]


def test_merge_never_shuffles_target(spark, sf_oracle):
    """The 100 TB contract: every join in the merge plan is a broadcast
    hash join — the target table is scanned but no exchange redistributes
    it. Exchanges in the plan must all be broadcast exchanges."""
    target = spark.read.parquet(f"{sf_oracle}/orders.parquet")
    source = (target.limit(100)
              .withColumn("is_delete", F.lit(False)))
    merged = merge_upsert(target, source, keys=["o_orderkey"],
                          delete_col="is_delete")
    plan = _plan(merged).split("\n\n")[0]
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # Spark renders broadcast exchanges as "Exchange SinglePartition" /
    # "BroadcastExchange"; forbid the shuffle variant explicitly.
    assert "Exchange hashpartitioning" not in plan


def test_incremental_merge_equals_full_recompute(spark, sf_oracle):
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")

    def partial(df):
        return (df.groupBy("l_returnflag")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                     .alias("sq")))

    for cutoff in ["1994-06-01", "1996-01-01", "1998-12-01"]:
        c = F.lit(cutoff).cast("timestamp")
        merged = merge_aggregates(
            partial(li.filter(F.col("l_shipdate") < c)),
            partial(li.filter(F.col("l_shipdate") >= c)),
            keys=["l_returnflag"], count_col="n", sum_cols=["sq"])
        full = partial(li)
        assert sorted(map(tuple, merged.collect())) == \
            sorted(map(tuple, full.collect()))


def test_zorder_clusters_both_dims(spark, sf_oracle):
    """Sort by the Z-value, cut into 16 contiguous buckets (files), and
    measure each bucket's min-max span in BOTH dimensions. Versus a
    single-column sort, the Z-order layout must shrink the *other*
    dimension's average span — that span is exactly what file-level
    min/max pruning skips."""
    orders = spark.read.parquet(f"{sf_oracle}/orders.parquet")
    dims = orders.select(
        (F.col("o_custkey") % 256).cast("long").alias("x"),
        (F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")) % 256)
        .cast("long").alias("y"))

    from pyspark.sql import Window

    def avg_y_span(df, order_col):
        bucketed = df.withColumn(
            "b", F.ntile(16).over(Window.orderBy(order_col)))
        spans = (bucketed.groupBy("b")
                 .agg((F.max("y") - F.min("y")).alias("span")))
        return spans.agg(F.avg("span")).first()[0]

    zsorted = dims.withColumn("z", zorder_key(F.col("x"), F.col("y"), 8))
    span_z = avg_y_span(zsorted, "z")
    span_x = avg_y_span(dims, "x")
    # Sorting by x alone leaves y unclustered (span ~ full 0-255 range);
    # Z-ordering must cut the average y-span substantially.
    assert span_x > 200
    assert span_z < 0.5 * span_x


def test_zorder_known_values(spark):
    df = spark.range(1).select(
        zorder_key(F.lit(3), F.lit(0), 4).alias("a"),
        zorder_key(F.lit(0), F.lit(3), 4).alias("b"),
        zorder_key(F.lit(5), F.lit(6), 4).alias("c"))
    a, b, c = df.first()
    assert a == 0b0101
    assert b == 0b1010
    # x=0101, y=0110: x bits at even positions (1+16), y at odd (8+32)
    assert c == 57


def test_table_diff_classifies_changes(spark):
    from mapreduce_wsi_spark.operators.lakehouse import table_diff
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "k int, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0)],
        "k int, s string, v double")
    got = sorted(map(tuple, table_diff(old, new, ["k"]).collect()))
    assert got == [(2, "changed"), (3, "removed"), (4, "added")]


def test_fuzzy_join_has_no_cartesian(spark, sf_oracle):
    from mapreduce_wsi_spark.plans.registry import load_catalog
    df = load_catalog()["join_fuzzy_levenshtein"].fn(spark, sf_oracle)
    plan = _plan(df).split("\n\n")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_snapshot_time_travel_roundtrip(spark, tmp_path):
    """Versioned snapshots: write v1, MERGE into v2, read either version
    independently, diff the two via table_diff, vacuum to the newest."""
    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.operators.lakehouse import (
        latest_snapshot_version,
        merge_upsert,
        read_snapshot,
        table_diff,
        vacuum_snapshots,
        write_snapshot,
    )

    path = str(tmp_path / "tbl")
    t1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                               "id bigint, val string")
    assert write_snapshot(t1, path) == 1
    batch = spark.createDataFrame([(2, "B", "u"), (4, "d", "i")],
                                  "id bigint, val string, op string")
    t2 = merge_upsert(read_snapshot(spark, path), 
                      batch.filter(F.col("op") != "d")
                      .select("id", "val"), ["id"])
    assert write_snapshot(t2, path) == 2
    assert latest_snapshot_version(spark, path) == 2

    v1 = {r["id"]: r["val"] for r in read_snapshot(spark, path, 1).collect()}
    v2 = {r["id"]: r["val"] for r in read_snapshot(spark, path).collect()}
    assert v1 == {1: "a", 2: "b", 3: "c"}
    assert v2 == {1: "a", 2: "B", 3: "c", 4: "d"}

    diff = {(r["id"], r["change_type"]) for r in table_diff(
        read_snapshot(spark, path, 1), read_snapshot(spark, path, 2),
        ["id"]).collect()}
    assert (4, "added") in diff and (2, "changed") in diff

    assert vacuum_snapshots(spark, path, keep_last=1) == [1]
    assert latest_snapshot_version(spark, path) == 2
    import pytest as _pt
    with _pt.raises(FileNotFoundError):
        read_snapshot(spark, path, 1)


def test_join_view_delta_equals_full_recompute_any_cutoff(spark):
    """V_old + dV == full A JOIN B exactly (set semantics with
    multiplicity), for several delta cutoffs including empty and
    everything-delta; no row counted twice (the dA x dB overlap trap)."""
    from mapreduce_wsi_spark.operators.lakehouse import join_view_delta

    a = spark.createDataFrame(
        [(k, t, f"a{k}") for t in range(4) for k in range(6)],
        "k long, ta int, av string")
    b = spark.createDataFrame(
        [(k, t, f"b{k}") for t in range(4) for k in range(0, 12, 2)],
        "k long, tb int, bv string")
    full = sorted(tuple(r) for r in
                  a.join(b, "k").select("k", "av", "bv").collect())
    for ca in (0, 2, 4):
        for cb in (0, 1, 4):
            a_old, d_a = a.filter(f"ta < {ca}"), a.filter(f"ta >= {ca}")
            b_old, d_b = b.filter(f"tb < {cb}"), b.filter(f"tb >= {cb}")
            v_old = a_old.join(b_old, "k").select("k", "av", "bv")
            dv = join_view_delta(a_old, d_a, b_old, d_b, ["k"]) \
                .select("k", "av", "bv")
            got = sorted(tuple(r) for r in
                         v_old.unionByName(dv).collect())
            assert got == full, f"cutoffs ({ca},{cb})"
