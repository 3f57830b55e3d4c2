"""Scale machinery: salted skew joins, bucketed co-located joins, IVF ANN.

These operators exist purely for the 100 TB case — at test SF they are
verified for (a) result-equivalence with their naive twins and (b) the
physical-plan property that motivates them (shuffle-free bucketed join).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.relational import salted_join
from mapreduce_wsi_spark.operators.similarity import cosine_topk, ivf_cosine_topk
from mapreduce_wsi_spark.plans.registry import tbl
from mapreduce_wsi_spark.sources.files import save_bucketed


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


# --- salted join -----------------------------------------------------------

def test_salted_join_matches_plain_join(spark, sf_oracle):
    li = tbl(spark, sf_oracle, "lineitem").select("l_orderkey", "l_partkey")
    o = tbl(spark, sf_oracle, "orders").select("o_orderkey", "o_custkey")
    plain = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_partkey", "o_custkey")
    salted = salted_join(li, o, "l_orderkey", "o_orderkey", salt=8).select(
        "l_orderkey", "l_partkey", "o_custkey")
    assert _canon(salted) == _canon(plain)


def test_salted_left_join_preserves_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "rk long, rv string")
    out = salted_join(left, right, "k", "rk", how="left", salt=4)
    rows = {(r["k"], r["rv"]) for r in out.collect()}
    assert rows == {(1, "x"), (2, "y"), (99, None)}


def test_salted_join_rejects_right_outer(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, "id", "id", how="right")


def test_salted_join_spreads_hot_key(spark):
    """One key holding every row must land in >1 shuffle partition."""
    hot = spark.range(10_000).select(F.lit(7).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(7, "x")], "rk long, rv string")
    out = salted_join(hot, dim, "k", "rk", salt=8)
    assert out.count() == 10_000
    # the salted left side hashes to >1 partition pre-join
    salted_keys = hot.withColumn("_s", (F.rand(42) * 8).cast("int"))
    n_parts = (salted_keys.repartition(8, "k", "_s")
               .withColumn("p", F.spark_partition_id())
               .select("p").distinct().count())
    assert n_parts > 1


# --- bucketed co-located join ---------------------------------------------

def test_bucketed_join_is_shuffle_free(spark, sf_oracle):
    """Two tables bucketed on the join key (same bucket count) must
    sort-merge-join with zero Exchange nodes — the write-time shuffle is
    amortized across every later join."""
    o = tbl(spark, sf_oracle, "orders").select("o_orderkey", "o_custkey")
    li = (tbl(spark, sf_oracle, "lineitem")
          .select("l_orderkey", "l_quantity"))
    save_bucketed(o, "bkt_orders", 8, ["o_orderkey"])
    save_bucketed(li, "bkt_lineitem", 8, ["l_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo = spark.table("bkt_orders")
        bl = spark.table("bkt_lineitem")
        j = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # and it computes the same thing as the unbucketed join
        assert j.count() == li.join(
            o, li["l_orderkey"] == o["o_orderkey"]).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


# --- IVF ANN ---------------------------------------------------------------

def test_ivf_recall_vs_exact(spark, sf_oracle):
    emb = tbl(spark, sf_oracle, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=10)
    approx = ivf_cosine_topk(emb, queries, k=10, n_centroids=8, n_probe=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"IVF recall too low: {recall:.2f}"


def test_ivf_probe_all_cells_is_exact(spark, sf_oracle):
    """Probing every cell must reduce IVF to the exact result."""
    emb = tbl(spark, sf_oracle, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = cosine_topk(emb, queries, k=5)
    full = ivf_cosine_topk(emb, queries, k=5, n_centroids=4, n_probe=4)
    assert ({(r["query_id"], r["vec_id"]) for r in exact.collect()} ==
            {(r["query_id"], r["vec_id"]) for r in full.collect()})


# --- upsert / MERGE emulation ---------------------------------------------

def test_upsert_semantics(spark):
    from mapreduce_wsi_spark.operators.relational import upsert

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, tag string, v long")
    updates = spark.createDataFrame(
        [(2, 99), (4, 44)], "k long, v long")
    got = {r["k"]: (r["tag"], r["v"])
           for r in upsert(base, updates, ["k"]).collect()}
    assert got == {
        1: ("a", 10),     # untouched base row survives
        2: ("b", 99),     # update wins on collision, tag carried over
        3: ("c", 30),
        4: (None, 44),    # insert-only key: unset column is NULL
    }


def test_upsert_on_bucketed_tables_is_shuffle_free(spark, sf_oracle):
    """upsert() is a full-outer join on the key; with base and updates both
    bucketed on that key the MERGE plans with zero Exchange — the 100 TB
    contract claimed in operators/relational.py::upsert."""
    from mapreduce_wsi_spark.operators.relational import upsert

    import shutil

    o = tbl(spark, sf_oracle, "orders").select("o_orderkey", "o_totalprice")
    upd = (tbl(spark, sf_oracle, "orders")
           .filter(F.col("o_orderkey") % 2 == 0)
           .select("o_orderkey",
                   (F.col("o_totalprice") * 2).alias("o_totalprice")))
    for t in ("bkt_ups_base", "bkt_ups_upd"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    save_bucketed(o, "bkt_ups_base", 8, ["o_orderkey"])
    save_bucketed(upd, "bkt_ups_upd", 8, ["o_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        merged = upsert(spark.table("bkt_ups_base"),
                        spark.table("bkt_ups_upd"), ["o_orderkey"],
                        null_safe=False)  # <=> defeats bucket matching
        buf = io.StringIO()
        with redirect_stdout(buf):
            merged.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin FullOuter" in plan
        assert "Exchange" not in plan, "bucketed upsert still shuffles"
        assert merged.count() == o.count()  # no new keys in updates
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew handling: a join partition dominated by one hot
    key must be split into parallel sub-reads (SortMergeJoin(skew=true) +
    'AQEShuffleRead skewed' in the FINAL adaptive plan). This is the
    native complement to salted_join — AQE splits oversized partitions at
    runtime; salting is for when one single KEY exceeds what a task can
    hold."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "50KB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 1_000_000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id"))
            .alias("k"), F.col("id").alias("v"))
        right = spark.range(0, 100_000).select(
            F.col("id").alias("rk"), (F.col("id") * 2).alias("rv"))
        j = left.join(right, left["k"] == right["rk"]).groupBy().count()
        assert j.collect()[0]["count"] == 910_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_interval_join_matches_naive_theta(spark):
    from mapreduce_wsi_spark.operators.relational import interval_join
    pts = spark.createDataFrame([(i,) for i in range(0, 200, 7)], ["p"])
    iv = spark.createDataFrame(
        [(i, i + (i * 13 % 40)) for i in range(0, 200, 11)], ["lo", "hi"])
    got = sorted(
        (r["p"], r["lo"], r["hi"])
        for r in interval_join(pts, iv, "p", "lo", "hi",
                               bucket_width=16).collect())
    want = sorted(
        (r["p"], r["lo"], r["hi"])
        for r in pts.crossJoin(iv)
        .filter("lo <= p AND p < hi").collect())
    assert got == want and len(want) > 0


def test_interval_join_avoids_nested_loop(spark, sf_oracle):
    from mapreduce_wsi_spark.plans.registry import load_catalog
    import io
    from contextlib import redirect_stdout
    df = load_catalog()["join_range_intervals"].fn(spark, sf_oracle)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree


def test_grid_radius_join_equals_bruteforce(spark):
    """Blocked spatial join vs exhaustive pairs on seeded random points —
    including pairs straddling cell boundaries (the 3x3 coverage
    claim)."""
    import math
    import random

    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.operators.geo import (
        grid_radius_join,
        km_per_deg_lon,
    )

    rng = random.Random(11)
    pts = [(i, 40.0 + rng.random() * 0.1, -74.0 + rng.random() * 0.1)
           for i in range(150)]
    df = spark.createDataFrame(pts, "id bigint, lat double, lon double")
    got = {(r["id_a"], r["id_b"]) for r in
           grid_radius_join(df, radius_km=1.5, ref_lat_deg=40.1).collect()}
    kx, ky = km_per_deg_lon(40.1), 111.32
    want = set()
    for i, la, lo in pts:
        for j, lb, lj in pts:
            if i < j:
                d = math.sqrt(((lj - lo) * kx) ** 2 + ((lb - la) * ky) ** 2)
                if d <= 1.5:
                    want.add((i, j))
    assert got == want and len(want) > 100


# --- Bloom-filter semi-join reduction -------------------------------------

def test_bloom_prune_never_drops_matches_and_clears_with_real_join(spark):
    """No false negatives at ANY filter size: the pruned big side always
    contains every row whose key exists on the small side — even with an
    adversarially tiny 64-bit filter that is mostly false positives. At a
    comfortable size the candidate set collapses to near the true
    matches, and (pruned ⋉ small) == (big ⋉ small) exactly."""
    from mapreduce_wsi_spark.operators.relational import bloom_prune_join

    big = spark.range(0, 2000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame(
        [(i * 37,) for i in range(8)], "k long")  # 8 keys in [0, 259+]

    true_rows = sorted(tuple(r) for r in
                       big.join(small.hint("broadcast"), "k").select(
                           "k", "v").collect())

    for m_bits in (64, 4096):
        pruned = bloom_prune_join(big, small, "k", "k", m_bits=m_bits)
        got = set(tuple(r) for r in pruned.select("k", "v").collect())
        assert set(true_rows) <= got, f"false negative at m={m_bits}"
        cleared = sorted(tuple(r) for r in
                         pruned.join(small.hint("broadcast"), "k")
                         .select("k", "v").collect())
        assert cleared == true_rows
    # the honest filter prunes: most of the 500 keys miss both hashes
    pruned = bloom_prune_join(big, small, "k", "k", m_bits=4096)
    assert pruned.count() < big.count() / 10


def test_bloom_prune_probe_is_broadcast_no_shuffle(spark):
    """The probe side must see only a BroadcastExchange (the 1-row map),
    never a shuffle of the big side: pruning that costs a shuffle would
    defeat its own purpose."""
    from mapreduce_wsi_spark.operators.relational import bloom_prune_join

    big = spark.range(0, 1000).select((F.col("id") % 100).alias("k"))
    small = spark.range(0, 10).select((F.col("id") * 7).alias("k"))
    pruned = bloom_prune_join(big, small, "k", "k")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    probe_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in probe_side


# --- product quantization ANN ---------------------------------------------

def test_pq_recall_and_code_structure(spark, sf_oracle):
    """ADC+re-rank recall@10 must clear the entry's contract with margin;
    codes are M ints in [0, K); encoding is map-only (codebooks are plan
    literals — any Exchange or Join in the encode plan means the
    codebook leaked into a join)."""
    from mapreduce_wsi_spark.operators.similarity import (
        build_pq_codebooks, cosine_topk, pq_cosine_topk, pq_encode)

    emb = tbl(spark, sf_oracle, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, q, k=10).select("query_id", "vec_id")
    ann = pq_cosine_topk(emb, q, k=10).select("query_id", "vec_id")
    hits = exact.join(ann, ["query_id", "vec_id"]).count()
    assert hits / (5 * 10) >= 0.5, f"mean recall {hits / 50}"

    books = build_pq_codebooks(emb)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)
    codes = pq_encode(emb, books)
    row = codes.first()
    assert len(row["codes"]) == 8
    assert all(0 <= c < 16 for c in row["codes"])
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


# --- 2D skyline -----------------------------------------------------------

def test_skyline_matches_bruteforce_with_ties_and_partitions(spark):
    """Exact skyline on a hand-built set with same-min ties, duplicate
    points, and a dominated chain — identical under any partitioning
    (phase-1 is per-batch, phase-2 repairs)."""
    import itertools

    from mapreduce_wsi_spark.operators.relational import skyline_2d

    pts = [(1, 1, 9.0), (2, 1, 9.0),   # duplicate skyline points
           (3, 1, 5.0),                # same min, smaller max: dominated
           (4, 2, 9.5), (5, 2, 9.5),   # next step up
           (6, 3, 9.5),                # dominated by 4/5 (strict min)
           (7, 4, 11.0),               # skyline
           (8, 5, 10.0), (9, 9, 1.0)]  # dominated by 7
    df = spark.createDataFrame(pts, "id long, mn int, mx double")

    def brute(rows):
        keep = []
        for p in rows:
            dom = any(q[1] <= p[1] and q[2] >= p[2]
                      and (q[1] < p[1] or q[2] > p[2]) for q in rows)
            if not dom:
                keep.append(p[0])
        return sorted(keep)

    exp = brute(pts)
    for parts in (1, 3, 7):
        got = sorted(r["id"] for r in
                     skyline_2d(df.repartition(parts), "mn", "mx",
                                "id").collect())
        assert got == exp, f"parts={parts}: {got} != {exp}"
    assert exp == [1, 2, 4, 5, 7]


def test_geohash_matches_bisection_reference(spark):
    """geohash_column vs a from-the-spec iterative-bisection encoder
    (Niemeyer): known city cell (Statue of Liberty -> dr5r7p) plus a
    seeded random sweep including southern/western hemispheres. The
    direct floor-quantization and the bisection walk agree everywhere
    except exact dyadic boundaries (measure zero; the random draw
    avoids them)."""
    import random
    from pyspark.sql import functions as F
    from mapreduce_wsi_spark.operators.geo import geohash_column

    def ref_geohash(lat, lon, precision):
        b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
        bits, out, even, ch = 0, "", True, 0
        while len(out) < precision:
            if even:
                mid = (lon_rng[0] + lon_rng[1]) / 2
                if lon >= mid:
                    ch, lon_rng[0] = (ch << 1) | 1, mid
                else:
                    ch, lon_rng[1] = ch << 1, mid
            else:
                mid = (lat_rng[0] + lat_rng[1]) / 2
                if lat >= mid:
                    ch, lat_rng[0] = (ch << 1) | 1, mid
                else:
                    ch, lat_rng[1] = ch << 1, mid
            even = not even
            bits += 1
            if bits == 5:
                out += b32[ch]
                bits, ch = 0, 0
        return out

    rng = random.Random(42)
    pts = [(40.689247, -74.044502)] + [
        (rng.uniform(-89.9, 89.9), rng.uniform(-179.9, 179.9))
        for _ in range(200)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = [r["gh"] for r in
           df.select(geohash_column(F.col("lat"), F.col("lon"), 6)
                     .alias("gh")).collect()]
    assert got[0] == "dr5r7p"
    want = [ref_geohash(la, lo, 6) for la, lo in pts]
    assert got == want
