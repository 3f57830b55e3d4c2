"""Property-based tests (hypothesis) for the semantics that must be
bit-exact at any scale: the reference integer-mean (Java truncating
division + tripwire, TestReducer.java:26-38) and salted-join equivalence.

Each example runs a real Spark job, so example counts are kept small —
the properties target semantic edge cases (inexact division, negative
values, hot keys), not throughput.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from mapreduce_wsi_spark.functions.integer_mean import integer_mean_expr
from mapreduce_wsi_spark.operators.relational import salted_join


def _java_int_mean(values: list[int]) -> int:
    """TestReducer.java:26-38 in Python: long sum/count, Java truncating
    division (== Python // for non-negative operands), int overflow wrap."""
    s, n = sum(values), len(values)
    r = (s // n) - (s % n) * 100
    r &= 0xFFFFFFFF
    return r - 0x100000000 if r >= 0x80000000 else r


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=1, max_size=40))
def test_integer_mean_matches_java_semantics(spark, values):
    df = spark.createDataFrame([(0, v) for v in values], "k int, v long")
    got = (df.groupBy("k").agg(integer_mean_expr("v").alias("mean"))
           .collect()[0]["mean"])
    assert got == _java_int_mean(values)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)),
                min_size=0, max_size=30),
       st.lists(st.tuples(st.integers(0, 5), st.text(max_size=3)),
                min_size=0, max_size=10))
def test_salted_join_equals_plain_join(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows or [(99, 99)], "k long, v long")
    right = spark.createDataFrame(right_rows or [(98, "z")], "rk long, rv string")
    plain = sorted(
        (r["k"], r["v"], r["rv"])
        for r in left.join(right, left["k"] == right["rk"]).collect())
    salted = sorted(
        (r["k"], r["v"], r["rv"])
        for r in salted_join(left, right, "k", "rk", salt=4).collect())
    assert salted == plain


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                min_size=1, max_size=50, unique=True))
def test_portable_bucket_matches_independent_md5(spark, keys):
    """portable_bucket must equal a from-scratch Python md5 derivation —
    the property that makes splits auditable outside the engine."""
    import hashlib

    from mapreduce_wsi_spark.operators.pipeline import portable_bucket

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r["k"]: r["b"]
           for r in df.select("k", portable_bucket(F.col("k"), 100)
                              .alias("b")).collect()}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        assert got[k] == int(h[:8], 16) % 100


def _brute_peak(intervals):
    """Max overlap of half-open [s, e) integer intervals by scanning
    every start point."""
    best = 0
    for s, _ in intervals:
        best = max(best, sum(1 for s2, e2 in intervals if s2 <= s < e2))
    return best


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(0, 3000), min_size=1, max_size=25))
def test_peak_concurrency_matches_bruteforce(spark, starts):
    """Two-phase sweep == O(n^2) brute force on arbitrary minute offsets
    (including cross-midnight: offsets span >1 day at 3000 minutes)."""
    import datetime as dt

    from mapreduce_wsi_spark.operators.behavior import peak_concurrency

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(i, t0 + dt.timedelta(minutes=m), 1, "g", 1.0)
            for i, m in enumerate(starts)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    got = peak_concurrency(ev, duration="5 minutes").collect()[0]
    expect = _brute_peak([(m, m + 5) for m in starts])
    assert got["peak_concurrency"] == expect
    assert got["n_intervals"] == len(starts)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 200),
                          st.sampled_from(["view", "click", "purchase"])),
                min_size=1, max_size=30))
def test_funnel_counts_are_monotone(spark, rows):
    """users_view >= users_click >= users_purchase for ANY event set —
    each funnel stage conditions on the previous one."""
    import datetime as dt

    from mapreduce_wsi_spark.operators.behavior import funnel_first_touch

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    ev = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=m), u, ty, 1.0)
         for i, (u, m, ty) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")
    per = funnel_first_touch(ev, ("view", "click", "purchase"))
    agg = per.agg(F.count("t0").alias("a"), F.count("t1").alias("b"),
                  F.count("t2").alias("c")).collect()[0]
    assert agg["a"] >= agg["b"] >= agg["c"]


def _brute_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: node -> smallest id in its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                min_size=1, max_size=40))
def test_connected_components_algorithms_agree(spark, raw_edges):
    """label, star, and auto must all equal the union-find ground truth
    on ANY random multigraph (self-loops and duplicates included)."""
    from mapreduce_wsi_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in raw_edges if a != b]
    if not edges:
        return
    expect = _brute_components(edges)
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    for algo in ("label", "star", "auto"):
        got = {r["id"]: r["comp"]
               for r in connected_components(
                   pairs, algorithm=algo, label_rounds=2).collect()}
        assert got == expect, algo


def _pack_reference(rows, budget, n_shards):
    """pack_context_windows in plain Python: md5-shard, order by (md5
    hex, key), shard-local running offsets -> window assignment."""
    import hashlib

    by_shard: dict[int, list] = {}
    for key, tokens in rows:
        hx = hashlib.md5(str(key).encode()).hexdigest()
        by_shard.setdefault(int(hx[:8], 16) % n_shards, []).append(
            (hx, key, tokens))
    out = {}
    for shard, docs in by_shard.items():
        cum = 0
        for hx, key, tokens in sorted(docs):
            out[key] = (shard, cum // budget, cum % budget)
            cum += tokens
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.dictionaries(st.integers(0, 10**6), st.integers(1, 40),
                       min_size=1, max_size=60),
       st.sampled_from([7, 16, 64]))
def test_pack_context_windows_budget_order_and_no_loss(spark, docs, budget):
    """The packing invariants, fuzzed: (1) lossless — every doc appears
    exactly once with its token count intact; (2) assignment matches the
    shard-local running-offset reference exactly (hash order preserved,
    offsets are the running sum); (3) offset_in_window < budget always,
    and within a window every doc except the final straddler starts
    inside the budget, so window total minus its last doc's tokens <
    budget; (4) when every doc fits the budget, shard window ids are
    contiguous from 0 (nothing skipped)."""
    from mapreduce_wsi_spark.operators.pipeline import pack_context_windows

    rows = sorted(docs.items())
    df = spark.createDataFrame(rows, "doc_key long, n_tokens long")
    got = pack_context_windows(df, "doc_key", "n_tokens", budget=budget,
                               n_shards=4).collect()

    # (1) lossless
    assert sorted((r["doc_key"], r["n_tokens"]) for r in got) == rows

    # (2) exact match with the Python reference
    ref = _pack_reference(rows, budget, n_shards=4)
    for r in got:
        assert (r["shard"], r["window_id"], r["offset_in_window"]) \
            == ref[r["doc_key"]], r["doc_key"]

    # (3) budget: starts stay inside the window
    windows: dict[tuple, list] = {}
    for r in got:
        windows.setdefault((r["shard"], r["window_id"]), []).append(
            (r["offset_in_window"], r["n_tokens"]))
    for (shard, wid), members in windows.items():
        members.sort()
        assert all(0 <= off < budget for off, _ in members)
        total = sum(t for _, t in members)
        assert total - members[-1][1] < budget

    # (4) contiguity when no doc exceeds the budget
    if all(t <= budget for t in docs.values()):
        for shard in {r["shard"] for r in got}:
            wids = sorted({r["window_id"] for r in got
                           if r["shard"] == shard})
            assert wids == list(range(len(wids)))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.integers(0, 5), min_size=0, max_size=12),
                min_size=1, max_size=12))
def test_duplicate_spans_matches_bruteforce(spark, docs):
    """duplicate_spans == the obvious Python counter over every span
    position, including within-doc repeats and the <n-words exclusion."""
    from collections import Counter

    from mapreduce_wsi_spark.operators.text import duplicate_spans

    n = 3
    texts = [" ".join(f"w{t}" for t in toks) for toks in docs]
    spans_per_doc = {}
    counts = Counter()
    for i, toks in enumerate(docs):
        spans = [" ".join(f"w{t}" for t in toks[j:j + n])
                 for j in range(len(toks) - n + 1)] if len(toks) >= n else []
        spans_per_doc[i] = spans
        counts.update(spans)
    expected = {
        i: (len(sp), sum(1 for s in sp if counts[s] > 1))
        for i, sp in spans_per_doc.items() if sp}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.doc_id: (r.n_spans, r.n_dup_spans)
           for r in duplicate_spans(df, "text", "doc_id", n=n).collect()}
    assert got == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 4), st.integers(1, 10**6)),
                min_size=1, max_size=30))
def test_temperature_mix_rate_invariants(spark, rows):
    """For any stratum weights: rates lie in (0, 1], the min-weight
    stratum keeps everything, and rates are antitone in stratum weight."""
    from mapreduce_wsi_spark.operators.pipeline import temperature_mix

    df = spark.createDataFrame(
        [(i, f"s{s}", w) for i, (s, w) in enumerate(rows)],
        "k long, src string, w long")
    out = temperature_mix(df, "k", "src", "w", flatten_exp=0.5)
    rates = {r.src: r.keep_rate
             for r in out.select("src", "keep_rate").distinct().collect()}
    weights = {}
    for s, w in rows:
        weights[f"s{s}"] = weights.get(f"s{s}", 0) + w
    assert all(0.0 < r <= 1.0 for r in rates.values())
    wmin = min(weights.values())
    for src, w in weights.items():
        if w == wmin:
            assert rates[src] == 1.0
    for a in rates:
        for b in rates:
            if weights[a] <= weights[b]:
                assert rates[a] >= rates[b]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                min_size=1, max_size=15),
       st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                min_size=0, max_size=15))
def test_asof_nearest_matches_bruteforce(spark, lrows, rrows):
    """asof_join(direction='nearest') == per-row argmin |dt| with ties
    to the backward side, across duplicate left timestamps, one-sided
    keys and keyless rows."""
    from mapreduce_wsi_spark.operators.relational import asof_join

    rrows = list({(k, t) for k, t in rrows})  # right (k, ts) unique
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        "i long, k long, t long")
    right = spark.createDataFrame(rrows or [(99, -1)], "k long, rt long")
    got = {r["i"]: r["rt_asof"]
           for r in asof_join(left, right, ["k"], "t", "rt", [],
                              direction="nearest").collect()}
    for i, (k, t) in enumerate(lrows):
        cands = [rt for rk, rt in rrows if rk == k]
        if not cands and not rrows:
            cands = []
        if not cands:
            assert got[i] is None
            continue
        best = min(cands, key=lambda rt: (abs(rt - t), rt > t))
        assert got[i] == best, (i, k, t, cands, got[i], best)


def test_ewma_matches_python_reference(spark):
    """ewma_smooth's integer num/den vs an independent pure-Python fold
    over seeded random series and partitionings — the window
    collect_list frame order is load-bearing and this pins it."""
    import random

    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.operators.behavior import ewma_smooth

    rng = random.Random(3)
    rows = []
    eid = 0
    series = {}
    for uid in range(6):
        n = rng.randint(1, 25)
        vals = [round(rng.uniform(0, 500), 2) for _ in range(n)]
        series[uid] = vals
        for i, v in enumerate(vals):
            rows.append((eid, uid, v, i))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, value double, ts bigint") \
        .withColumn("ts", F.timestamp_micros("ts"))

    def ref(vals, L=10):
        out = []
        cents = [round(v * 100) for v in vals]
        for t in range(len(cents)):
            lo = max(0, t - L + 1)
            frame = cents[lo:t + 1]
            s = len(frame)
            num = sum(x * (1 << (L - s + i)) for i, x in enumerate(frame))
            den = (1 << L) - (1 << (L - s))
            out.append((num, den))
        return out

    for parts in (1, 5):
        got = {(r["user_id"], r["rn"]): (r["num"], r["den"])
               for r in ewma_smooth(df.repartition(parts)).collect()}
        for uid, vals in series.items():
            for i, nd in enumerate(ref(vals), start=1):
                assert got[(uid, i)] == nd, (parts, uid, i)


def test_seq_gap_audit_finds_planted_gaps(spark, tmp_path):
    """seq_gap_audit on a keyspace with two planted holes: keys
    0..9 minus {3,4,7} -> 2 gap runs, 3 missing. Guards against the
    vacuous-zero trap (fixture orderkeys are dense, so the catalog
    parity alone cannot distinguish 'no gaps' from 'gap finder
    broken')."""
    import os
    from pyspark.sql import functions as F
    from mapreduce_wsi_spark.plans.registry import CATALOG, load_catalog
    load_catalog()
    keys = [k for k in range(10) if k not in (3, 4, 7)]
    d = os.path.join(str(tmp_path), "orders.parquet")
    spark.createDataFrame([(k,) for k in keys], "o_orderkey long") \
        .write.parquet(d)
    out = CATALOG["seq_gap_audit"].fn(spark, str(tmp_path)).collect()[0]
    assert (out["n_keys"], out["min_key"], out["max_key"]) == (7, 0, 9)
    assert out["n_gaps"] == 2 and out["n_missing"] == 3


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 500)),
                min_size=2, max_size=60))
def test_ks_two_sample_matches_bruteforce(spark, rows):
    """Bucketed two-phase KS D equals the brute-force ECDF max-gap on
    random two-group integer data (exact rational comparison)."""
    from fractions import Fraction
    from mapreduce_wsi_spark.operators.evaluation import ks_two_sample
    labeled = [("a" if g % 2 == 0 else "b", float(v)) for g, v in rows]
    a = sorted(v for g, v in labeled if g == "a")
    b = sorted(v for g, v in labeled if g == "b")
    if not a or not b:
        return
    df = spark.createDataFrame(labeled, "g string, v double") \
        .repartition(5)
    got = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    vs = sorted(set(a) | set(b))
    want = max(Fraction(sum(1 for x in a if x <= v), len(a))
               - Fraction(sum(1 for x in b if x <= v), len(b))
               for v in vs)
    want = max(want, max(
        Fraction(sum(1 for x in b if x <= v), len(b))
        - Fraction(sum(1 for x in a if x <= v), len(a)) for v in vs))
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["d_stat"] == round(float(want), 9)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 300)),
                min_size=1, max_size=80))
def test_bitmap_distinct_matches_set_semantics(spark, rows):
    """Word-bitmap distinct equals Python set cardinality per grain
    and globally, for any id pattern (dense, sparse, duplicated)."""
    from mapreduce_wsi_spark.operators.sketch import (
        bitmap_distinct_rollup)
    df = spark.createDataFrame(
        [(f"g{g}", i) for g, i in rows], "g string, uid long") \
        .repartition(7)
    got = {r["g"]: r["n_distinct"]
           for r in bitmap_distinct_rollup(df, "g", "uid").collect()}
    per = {}
    for g, i in rows:
        per.setdefault(f"g{g}", set()).add(i)
    for g, ids in per.items():
        assert got[g] == len(ids)
    assert got["__all__"] == len({i for _, i in rows})


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                min_size=1, max_size=40),
       st.integers(2, 4))
def test_kcore_matches_sequential_peel(spark, pairs, k):
    """Synchronous distributed peel reaches the same k-core as the
    classic sequential peel (the k-core is unique, so any peel order
    converges to it)."""
    from mapreduce_wsi_spark.operators.graph import kcore_nodes
    edges = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    if not edges:
        return
    adj = {}
    for lo, hi in edges:
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    while True:
        bad = [n for n, nb in adj.items() if len(nb) < k]
        if not bad:
            break
        for n in bad:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    df = spark.createDataFrame(edges, "lo int, hi int").repartition(3)
    got = sorted(r["id"] for r in kcore_nodes(df, k=k).collect())
    assert got == sorted(adj)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(-10**6, 10**6), min_size=2, max_size=30))
def test_holt_matches_pure_recurrence(spark, cents):
    """The Arrow Holt fold equals the pure-Python truncating-division
    recurrence on random series including negative values (where
    floor vs truncate differ — the cross-engine trap)."""
    import datetime as dt
    from mapreduce_wsi_spark.operators.behavior import holt_forecast

    def tdiv(a):
        return a // 10 if a >= 0 else -((-a) // 10)

    level, trend = cents[0], cents[1] - cents[0]
    for y in cents[1:]:
        nl = tdiv(2 * y + 8 * (level + trend))
        trend = tdiv(3 * (nl - level) + 7 * trend)
        level = nl
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(seconds=i), i, c / 100.0)
            for i, c in enumerate(cents)]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, o int, v double").repartition(4)
    got = holt_forecast(df, "k", "ts", "o", "v").collect()[0]
    assert (got["level_cents"], got["trend_cents"]) == (level, trend)
    assert got["forecast_cents"] == level + trend


def test_psi_drift_fires_on_planted_shift(spark, tmp_path):
    """dq_psi_drift on planted data: identical halves score ~0 (the
    fixture case), a shifted odd half scores far above the 0.2
    retrain threshold — the entry's zero must be a measured zero."""
    import os
    from mapreduce_wsi_spark.plans.registry import CATALOG, load_catalog
    load_catalog()
    d = os.path.join(str(tmp_path), "lineitem.parquet")
    rows = ([(2 * i, 5000.0) for i in range(200)]
            + [(2 * i + 1, 50000.0) for i in range(200)])
    spark.createDataFrame(rows, "l_orderkey long, l_extendedprice double") \
        .write.parquet(d)
    out = CATALOG["dq_psi_drift"].fn(spark, str(tmp_path)).collect()[0]
    # fully disjoint bins -> every bin empty on one side -> excluded;
    # use a partial overlap instead to get a finite large PSI
    import shutil
    shutil.rmtree(d)
    rows = ([(2 * i, 5000.0) for i in range(190)]
            + [(2 * i, 50000.0) for i in range(10)]
            + [(2 * i + 1, 50000.0) for i in range(190)]
            + [(2 * i + 1, 5000.0) for i in range(10)])
    spark.createDataFrame(rows, "l_orderkey long, l_extendedprice double") \
        .write.parquet(d)
    out = CATALOG["dq_psi_drift"].fn(spark, str(tmp_path)).collect()[0]
    assert out["psi"] > 0.2
    # identical halves: PSI exactly ~0
    shutil.rmtree(d)
    rows = ([(2 * i, float(1000 + i)) for i in range(200)]
            + [(2 * i + 1, float(1000 + i)) for i in range(200)])
    spark.createDataFrame(rows, "l_orderkey long, l_extendedprice double") \
        .write.parquet(d)
    out = CATALOG["dq_psi_drift"].fn(spark, str(tmp_path)).collect()[0]
    assert abs(out["psi"]) < 1e-9


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 3),
                          st.integers(0, 10_000),
                          st.floats(-1.0, 1.0, allow_nan=False)),
                min_size=1, max_size=60, unique_by=lambda t: (t[0], t[1])),
       st.integers(1, 5))
def test_salted_topk_equals_single_window_topk(spark, rows, k):
    """similarity.salted_topk must return EXACTLY the single-window
    per-group top-k — same rows, same rn — for arbitrary groups,
    scores (including ties; the id tiebreak is the total order), group
    sizes below/above k, and k. The salt only changes the plan."""
    from pyspark.sql import Window as W

    from mapreduce_wsi_spark.operators.similarity import salted_topk

    df = spark.createDataFrame(rows, "g int, id long, score double")
    got = (salted_topk(df, "g",
                       [F.col("score").desc(), F.col("id").asc()],
                       "id", k, salt_buckets=4)
           .select("g", "id", "rn"))
    w = W.partitionBy("g").orderBy(F.col("score").desc(),
                                   F.col("id").asc())
    want = (df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).select("g", "id", "rn"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
