"""Misra-Gries heavy hitters: the mergeable-summaries bound, fuzzed.

The operator's correctness claim (operators/sketch.py) is the Agarwal et
al. PODS'12 theorem: for ANY merge tree over partition sketches,
    est(t) <= true(t)  and  est(t) >= true(t) - n/(k+1)
with at most k counters surviving. The hypothesis test drives the pure
merge rule through random data + random partitionings; the Spark test
pins the distributed plan (mapInPandas sketch -> combine -> subtract)
against exact counts under several partition layouts.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_wsi_spark.operators.sketch import _mg_fold


@settings(max_examples=200, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=0, max_value=25), min_size=1,
                    max_size=400),
    cuts=st.lists(st.integers(min_value=0, max_value=400), max_size=6),
    k=st.integers(min_value=1, max_value=12),
)
def test_mg_merge_tree_bound(tokens, cuts, k):
    """Split the stream at arbitrary points, sketch each chunk batch-wise,
    merge left-to-right, then apply the final global subtract exactly as
    the Spark plan does — the MG bound must hold for every token."""
    n = len(tokens)
    bounds = sorted({c % (n + 1) for c in cuts})
    chunks, prev = [], 0
    for b in bounds + [n]:
        if b > prev:
            chunks.append(tokens[prev:b])
            prev = b
    if not chunks:
        chunks = [tokens]

    # per-chunk sketches (the per-partition mapInPandas pass)
    sketches = [_mg_fold({}, Counter(c), k) for c in chunks]
    # global combine: sum per token, subtract (k+1)th largest, positives
    combined: dict = {}
    for s in sketches:
        for t, c in s.items():
            combined[t] = combined.get(t, 0) + c
    if len(combined) > k:
        d = sorted(combined.values(), reverse=True)[k]
        combined = {t: c - d for t, c in combined.items() if c - d > 0}

    true = Counter(tokens)
    assert len(combined) <= k
    for t, est in combined.items():
        assert est <= true[t]
    for t, cnt in true.items():
        est = combined.get(t, 0)
        assert est >= cnt - n / (k + 1)
    # detection guarantee follows: anything above n/(k+1) has est > 0
    for t, cnt in true.items():
        if cnt > n / (k + 1):
            assert t in combined


def test_mg_spark_bound_across_partitionings(spark):
    """Distributed sketch vs exact counts: skewed synthetic stream, the
    bound and size cap must hold at every partition count."""
    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.operators.sketch import misra_gries_heavy_hitters

    data = (["alpha"] * 500 + ["beta"] * 300 + ["gamma"] * 120
            + [f"tail{i}" for i in range(200)])
    n, k = len(data), 8
    true = Counter(data)
    df = spark.createDataFrame([(t,) for t in data], "token string")
    for parts in (1, 3, 16):
        sk = dict(misra_gries_heavy_hitters(df.repartition(parts),
                                            "token", k=k).collect())
        assert len(sk) <= k, (parts, sk)
        for t, est in sk.items():
            assert est <= true[t], (parts, t)
        for t, cnt in true.items():
            assert sk.get(t, 0) >= cnt - n / (k + 1), (parts, t)
        # alpha (500 of 1120 > n/9) is guaranteed-found at any layout
        assert "alpha" in sk


def test_leakage_safe_split_no_pair_straddles(spark, sf_smoke):
    """The whole point of split_leakage_safe: every near-dup pair must
    land in ONE split. Checked directly against the exact Jaccard pairs
    the entry derives its components from."""
    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.operators.dedup import jaccard_pairs
    from mapreduce_wsi_spark.plans.registry import load_catalog, tbl

    cat = load_catalog()
    split = cat["split_leakage_safe"].fn(spark, sf_smoke)
    docs = tbl(spark, sf_smoke, "documents")
    pairs = jaccard_pairs(docs, "text", "doc_id", n=3, min_jaccard=0.1)
    a = split.select(F.col("doc_id").alias("doc_a"),
                     F.col("split").alias("split_a"))
    b = split.select(F.col("doc_id").alias("doc_b"),
                     F.col("split").alias("split_b"))
    straddlers = (pairs.join(a, "doc_a").join(b, "doc_b")
                  .filter(F.col("split_a") != F.col("split_b")))
    assert straddlers.count() == 0
    # and the split is a real 3-way partition of the corpus
    assert split.count() == docs.count()
    sides = {r["split"] for r in split.select("split").distinct().collect()}
    assert sides <= {"train", "val", "test"}


def test_kmv_exact_when_unsaturated_and_bounded_when_saturated(spark):
    """KMV semantics: below k the sketch IS the distinct set (estimates
    exact); above k the union/intersection estimates stay within the
    3-sigma-ish analytic bound; all deterministic across partitionings."""
    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.operators.sketch import (
        kmv_overlap_estimate,
        kmv_sketch,
    )

    a = spark.range(0, 2000).select(F.col("id").alias("k"))
    b = spark.range(1000, 3000).select(F.col("id").alias("k"))
    for parts in (1, 7):
        est = kmv_overlap_estimate(
            kmv_sketch(a.repartition(parts), "k", 128),
            kmv_sketch(b.repartition(parts), "k", 128), 128).collect()[0]
        assert abs(est["est_union"] - 3000) <= 0.3 * 3000
        assert abs(est["est_inter"] - 1000) <= 0.3 * 3000
    # unsaturated: the sketch saw everything, so estimates are exact
    sa = spark.range(0, 40).select(F.col("id").alias("k"))
    sb = spark.range(20, 60).select(F.col("id").alias("k"))
    est = kmv_overlap_estimate(kmv_sketch(sa, "k", 128),
                               kmv_sketch(sb, "k", 128), 128).collect()[0]
    assert est["est_union"] == 60.0
    assert est["est_inter"] == 20.0


def test_tdigest_rank_error_and_small_n_exactness(spark):
    """t-digest contracts: (1) on a heavy-tailed corpus the estimated
    p50/p95/p99 land within 1% RANK error of the truth; (2) when
    n << delta every value is its own centroid and the estimate is the
    exact midpoint interpolation; (3) the estimate is monotone in q;
    (4) accuracy holds across partition layouts (the merge absorbs
    build order)."""
    import numpy as np

    from mapreduce_wsi_spark.operators.sketch import tdigest_quantiles

    rng = np.random.default_rng(2)
    vals = rng.lognormal(3.0, 1.5, 20000)
    sv = np.sort(vals)
    for n_parts in (4, 16):
        df = (spark.createDataFrame([(float(v),) for v in vals],
                                    "x double").repartition(n_parts))
        out = {r["q"]: r for r in
               tdigest_quantiles(df, "x", (0.5, 0.95, 0.99)).collect()}
        for q, r in out.items():
            rank = np.searchsorted(sv, r["est"]) / len(sv)
            assert abs(rank - q) < 0.01, (n_parts, q, rank)
            assert r["n_centroids"] < 450
        assert out[0.5]["est"] < out[0.95]["est"] < out[0.99]["est"]

    small = (spark.createDataFrame([(float(i),) for i in range(1, 101)],
                                   "x double").repartition(4))
    o2 = {r["q"]: r["est"]
          for r in tdigest_quantiles(small, "x", (0.5,)).collect()}
    assert abs(o2[0.5] - 50.5) < 1e-9


def test_tdigest_compress_invariants():
    """The compression kernel: total weight preserved, means sorted,
    tail centroids stay near-singleton (the k1 scale function's
    defining property), and a sorted singleton stream of n <= delta/2
    values stays uncompressed."""
    import numpy as np

    from mapreduce_wsi_spark.operators.sketch import _tdigest_compress

    rng = np.random.default_rng(5)
    v = np.sort(rng.normal(0, 1, 50000))
    m, w = _tdigest_compress(v, np.ones_like(v), 200.0)
    assert abs(w.sum() - 50000) < 1e-6
    assert (np.diff(m) >= 0).all()
    # k1 capacity at the tails is ~n*(pi/delta)^2/2 ~ 6 here, vs fat
    # belly centroids near n/delta*pi ~ 780: the tail/belly asymmetry
    # IS the scale function working
    assert w[0] < 20 and w[-1] < 20
    assert w.max() > 100
    assert w[0] < w.max() / 10 and w[-1] < w.max() / 10
    small = np.arange(50, dtype=np.float64)
    m2, w2 = _tdigest_compress(small, np.ones_like(small), 200.0)
    assert len(m2) == 50 and (w2 == 1).all()


def test_bitmap_distinct_exact_incl_bit63(spark):
    """Word-bitmap distinct is EXACT: duplicates collapse, ids landing
    on bit 63 (two's-complement sign bit) count correctly, and the
    merged __all__ row equals the true global distinct — not the sum
    of per-grain counts (overlapping ids across grains dedupe)."""
    from mapreduce_wsi_spark.operators.sketch import (
        bitmap_distinct_rollup)
    rows = ([("a", i) for i in [0, 63, 63, 64, 127, 128, 5000]]
            + [("b", i) for i in [63, 64, 1, 5000, 9999]])
    df = spark.createDataFrame(rows, "g string, uid long").repartition(7)
    got = {r["g"]: r["n_distinct"]
           for r in bitmap_distinct_rollup(df, "g", "uid").collect()}
    # union = {0, 1, 63, 64, 127, 128, 5000, 9999}
    assert got == {"a": 6, "b": 5, "__all__": 8}


def test_bitmap_distinct_large_ids_and_negative_contract(spark):
    """Word index must be integer `div`: at ids >= 2^53 float division
    loses the low bits and merges/splits words (ADVICE r7). Two ids 64
    apart up there must land in DIFFERENT words (distinct=3 with their
    shared neighbor), and a negative id must raise, not mis-bucket."""
    import pytest
    from mapreduce_wsi_spark.operators.sketch import (
        bitmap_distinct_rollup)
    big = 2**60 + 64  # float64 spacing at 2^60 is 256: /64.0 collides
    rows = [("a", big), ("a", big + 64), ("a", big + 65)]
    df = spark.createDataFrame(rows, "g string, uid long")
    got = {r["g"]: r["n_distinct"]
           for r in bitmap_distinct_rollup(df, "g", "uid").collect()}
    assert got == {"a": 3, "__all__": 3}

    bad = spark.createDataFrame([("a", -1)], "g string, uid long")
    with pytest.raises(Exception, match="negative id"):
        bitmap_distinct_rollup(bad, "g", "uid").collect()
