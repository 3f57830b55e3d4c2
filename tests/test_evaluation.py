"""Directed pins for the evaluation-metric operators: tiny hand-computed
fixtures (the DuckDB parity gate checks the full-fixture versions; these
check the MATH on examples small enough to verify by hand)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.evaluation import (
    cms_build, cms_estimate, cohens_kappa, equiwidth_histogram,
    group_auc, reservoir_sample_per_key, retrieval_metrics)


def test_group_auc_hand_computed_with_ties(spark):
    """scores pos=[3,2], neg=[2,1]: ranks 1,(2.5,2.5),4 — R_pos =
    2.5 + 4 = 6.5, AUC = (6.5 - 3) / 4 = 0.875. A perfect and a
    degenerate group ride along."""
    rows = [("g", 3, 1), ("g", 2, 1), ("g", 2, 0), ("g", 1, 0),
            ("p", 9, 1), ("p", 1, 0),
            ("d", 5, 1), ("d", 6, 1)]
    df = spark.createDataFrame(rows, "g string, s int, y int")
    out = {r["g"]: r for r in group_auc(df, "g", "s", "y").collect()}
    assert out["g"]["auc"] == 0.875
    assert out["p"]["auc"] == 1.0
    assert out["d"]["auc"] is None  # no negatives
    assert (out["g"]["n_pos"], out["g"]["n_neg"]) == (2, 2)


def test_cohens_kappa_hand_computed(spark):
    """Classic 2x2: both-yes 20, both-no 15, a-only 10, b-only 5 ->
    p_o = 0.7, p_a = 0.6, p_b = 0.5, p_e = 0.5, kappa = 0.4."""
    rows = ([("x", 1, 1)] * 20 + [("x", 0, 0)] * 15
            + [("x", 1, 0)] * 10 + [("x", 0, 1)] * 5)
    df = spark.createDataFrame(rows, "g string, a int, b int")
    r = cohens_kappa(df, "g", "a", "b").collect()[0]
    assert abs(r["p_observed"] - 0.7) < 1e-12
    assert abs(r["p_expected"] - 0.5) < 1e-12
    assert abs(r["kappa"] - 0.4) < 1e-12


def test_cohens_kappa_degenerate_group_is_null(spark):
    df = spark.createDataFrame([("c", 1, 1)] * 4, "g string, a int, b int")
    r = cohens_kappa(df, "g", "a", "b").collect()[0]
    assert r["kappa"] is None and r["p_observed"] == 1.0


def test_retrieval_metrics_hand_computed(spark):
    """5 candidates, k=3. System order (score desc, id): d1(rel 3),
    d2(rel 0), d3(rel 1). Ideal: rel 3, 2, 1.
    DCG = 7/1 + 0 + 1/2 = 7.5; IDCG = 7 + 3/log2(3) + 1/2;
    P@3 = 2/3; MRR = 1 (first hit at rank 1)."""
    rows = [("q", 1, 90, 3), ("q", 2, 80, 0), ("q", 3, 70, 1),
            ("q", 4, 60, 2), ("q", 5, 50, 0)]
    df = spark.createDataFrame(rows, "q string, id int, s int, rel int")
    r = retrieval_metrics(df, "q", "id", "s", "rel", k=3).collect()[0]
    idcg = 7.0 + 3.0 / math.log2(3.0) + 0.5
    assert abs(r["dcg"] - 7.5) < 1e-12
    assert abs(r["ndcg"] - 7.5 / idcg) < 1e-12
    assert abs(r["p_at_k"] - 2 / 3) < 1e-12
    assert r["mrr"] == 1.0


def test_retrieval_metrics_mrr_and_no_hit(spark):
    """First relevant at rank 2 -> MRR 0.5; an all-irrelevant query
    reports 0 metrics (NULL ndcg: idcg == 0)."""
    rows = [("a", 1, 9, 0), ("a", 2, 8, 2),
            ("z", 7, 5, 0), ("z", 8, 4, 0)]
    df = spark.createDataFrame(rows, "q string, id int, s int, rel int")
    out = {r["q"]: r for r in
           retrieval_metrics(df, "q", "id", "s", "rel", k=2).collect()}
    assert out["a"]["mrr"] == 0.5
    assert out["z"]["mrr"] == 0.0 and out["z"]["p_at_k"] == 0.0
    assert out["z"]["ndcg"] is None


def test_cms_estimate_upper_bounds_exact_counts(spark):
    """Structural CMS guarantee: estimate >= exact count for every key
    (min over hash rows can only over-count via collisions)."""
    df = spark.range(0, 3000).select((F.col("id") % 50).alias("k"))
    sketch = cms_build(df, "k", depth=4, width=32)
    probes = df.distinct()
    est = {r["k"]: r["cms_est"] for r in
           cms_estimate(probes, sketch, "k", depth=4, width=32).collect()}
    exact = {r["k"]: r["n"] for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # width >> keys: no collisions -> exact everywhere
    sketch2 = cms_build(df, "k", depth=4, width=4096)
    est2 = {r["k"]: r["cms_est"] for r in
            cms_estimate(probes, sketch2, "k", depth=4,
                         width=4096).collect()}
    assert est2 == exact


def test_equiwidth_histogram_bins_and_edges(spark):
    """Values 0..99 into 10 bins: each bin holds exactly 10, bin_lo are
    the multiples of 9.9; the max value folds into the last bin."""
    df = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
    out = {r["bin"]: r for r in
           equiwidth_histogram(df, "v", n_bins=10).collect()}
    assert sorted(out) == list(range(10))
    assert all(out[b]["n"] == 10 for b in out)
    assert out[3]["bin_lo"] == 3 * 99.0 / 10  # mn + bin*(mx-mn)/n_bins
    const = spark.createDataFrame([(5.0,)] * 7, "v double")
    r = equiwidth_histogram(const, "v", n_bins=10).collect()
    assert len(r) == 1 and r[0]["bin"] == 0 and r[0]["n"] == 7


def test_reservoir_sample_deterministic_and_sized(spark):
    """Exactly min(k, group size) rows per key, stable across runs, and
    a no-replacement uniform-hash sample: changing k=2 -> k=4 KEEPS the
    k=2 rows (hash order is a fixed permutation)."""
    df = spark.range(0, 200).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id"))
    take2 = reservoir_sample_per_key(df, "g", "id", k=2)
    take4 = reservoir_sample_per_key(df, "g", "id", k=4)
    s2 = {(r["g"], r["id"]) for r in take2.collect()}
    s4 = {(r["g"], r["id"]) for r in take4.collect()}
    assert len(s2) == 6 and len(s4) == 12 and s2 < s4
    again = {(r["g"], r["id"]) for r in take2.collect()}
    assert again == s2
    tiny = spark.createDataFrame([("a", 1), ("a", 2)], "g string, id int")
    assert reservoir_sample_per_key(tiny, "g", "id", k=5).count() == 2


def test_calibration_curve_hand_computed(spark):
    """Two bins: p=0.05 x4 (1 positive) and p=0.95 x2 (2 positives) ->
    bin 0: mean_p 0.05, frac 0.25; bin 9: mean_p 0.95, frac 1.0.
    p=1.0 folds into the last bin."""
    from mapreduce_wsi_spark.operators.evaluation import calibration_curve

    rows = [(0.05, 0), (0.05, 0), (0.05, 0), (0.05, 1),
            (0.95, 1), (0.95, 1), (1.0, 1)]
    df = spark.createDataFrame(rows, "p double, y int")
    out = {r["bin"]: r for r in
           calibration_curve(df, "p", "y", n_bins=10).collect()}
    assert set(out) == {0, 9}
    assert abs(out[0]["mean_p"] - 0.05) < 1e-12
    assert out[0]["frac_pos"] == 0.25
    assert out[9]["n"] == 3 and out[9]["frac_pos"] == 1.0


def test_confusion_f1_hand_computed(spark):
    """truth a,a,b,b,b; pred a,b,b,b,c -> class a: P=1, R=0.5, F1=2/3;
    class b: P=2/3, R=2/3; class c: predicted-only, P=0, R undefined on
    0 truths -> NULL, F1 NULL (0 + NULL-coalesced 0)."""
    from mapreduce_wsi_spark.operators.evaluation import confusion_f1

    rows = [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("b", "c")]
    df = spark.createDataFrame(rows, "truth string, pred string")
    out = {r["cls"]: r for r in confusion_f1(df, "truth", "pred").collect()}
    assert abs(out["a"]["f1"] - 2 / 3) < 1e-12
    assert out["a"]["precision"] == 1.0 and out["a"]["recall"] == 0.5
    assert abs(out["b"]["precision"] - 2 / 3) < 1e-12
    assert out["c"]["n_truth"] == 0 and out["c"]["recall"] is None
    assert out["c"]["precision"] == 0.0 and out["c"]["f1"] is None


def test_group_auc_fuzz_equals_pair_counting(spark):
    """Property: the rank-statistic AUC equals the brute-force pair
    definition (wins + half-ties over pos x neg pairs) on random
    fixtures with heavy ties."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 1)),
                    min_size=2, max_size=40))
    def run(rows):
        data = [("g", s, y) for s, y in rows]
        df = spark.createDataFrame(data, "g string, s int, y int")
        got = group_auc(df, "g", "s", "y").collect()[0]["auc"]
        pos = [s for s, y in rows if y == 1]
        neg = [s for s, y in rows if y == 0]
        if not pos or not neg:
            assert got is None
            return
        wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
        assert abs(got - wins / (len(pos) * len(neg))) < 1e-9

    run()


def test_retrieval_metrics_fuzz_equals_reference(spark):
    """Property: the windowed DCG/NDCG/MRR/P@k agree with a plain
    Python re-implementation over the same (score desc, id) order."""
    import math as m

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 100), st.integers(0, 3)),
                    min_size=1, max_size=25),
           st.integers(1, 10))
    def run(rows, k):
        data = [("q", i, s, r) for i, (s, r) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "q string, id int, s int, rel int")
        got = retrieval_metrics(df, "q", "id", "s", "rel",
                                k=k).collect()[0]
        sys_order = sorted(data, key=lambda t: (-t[2], t[1]))[:k]
        ideal = sorted(data, key=lambda t: (-t[3], t[1]))[:k]
        dcg = sum((2.0 ** r[3] - 1) / m.log2(p + 2)
                  for p, r in enumerate(sys_order))
        idcg = sum((2.0 ** r[3] - 1) / m.log2(p + 2)
                   for p, r in enumerate(ideal))
        mrr = next((1.0 / (p + 1) for p, r in enumerate(sys_order)
                    if r[3] > 0), 0.0)
        p_at_k = sum(r[3] > 0 for r in sys_order) / k
        assert abs(got["dcg"] - dcg) < 1e-9
        assert abs(got["p_at_k"] - p_at_k) < 1e-12
        assert got["mrr"] == mrr
        if idcg > 0:
            assert abs(got["ndcg"] - dcg / idcg) < 1e-9
        else:
            assert got["ndcg"] is None

    run()


def test_covariance_topk_matches_numpy(spark):
    """covariance_topk equals numpy's biased covariance matrix on a
    small random corpus, including the |cov| ordering and rounding."""
    import numpy as np

    from mapreduce_wsi_spark.operators.similarity import covariance_topk

    rng = np.random.default_rng(5)
    dim, n = 6, 40
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<float>")
    got = covariance_topk(df, "embedding", dim=dim, k=5).collect()
    c = np.cov(vecs.astype(np.float64).T, bias=True)
    exp = sorted(((round(c[i, j], 9), i, j)
                  for i in range(dim) for j in range(i + 1, dim)),
                 key=lambda t: (-abs(t[0]), t[1], t[2]))[:5]
    assert [(r["i"], r["j"]) for r in got] == [(i, j) for _, i, j in exp]
    for r, (v, _i, _j) in zip(got, exp):
        assert abs(r["cov"] - v) < 1e-9


def test_chi2_independence_fires_on_planted_dependence(spark):
    """A perfectly dependent pair (b == a) produces large chi-square
    terms; an independent 50/50 grid with exactly proportional cells
    produces all-zero terms; expectations are the textbook
    margin-product values."""
    from mapreduce_wsi_spark.operators.evaluation import (
        chi2_independence)

    dep = spark.createDataFrame(
        [(x, x) for x in ("u", "v") for _ in range(50)],
        "a string, b string")
    got = chi2_independence(dep, "a", "b").collect()
    assert sum(r["chi2_term"] for r in got) > 50  # n * 1 for 2x2 exact
    for r in got:
        assert r["expected"] == 25.0  # 50*50/100

    ind = spark.createDataFrame(
        [(x, y) for x in ("u", "v") for y in ("p", "q")
         for _ in range(25)],
        "a string, b string")
    got2 = chi2_independence(ind, "a", "b").collect()
    assert all(r["chi2_term"] == 0.0 for r in got2)


def test_gini_known_distributions(spark):
    """Gini = 0 for perfectly equal values; approaches (n-1)/n when one
    key holds everything; matches a hand-computed mixed case; invariant
    across partition layouts (the two-phase rank must reproduce the
    global order)."""
    from mapreduce_wsi_spark.operators.evaluation import gini_coefficient

    equal = spark.createDataFrame(
        [(i, 5.0) for i in range(100)], "k long, v double")
    assert gini_coefficient(equal, "v", "k").first()["gini"] == 0.0

    concentrated = spark.createDataFrame(
        [(i, 0.01) for i in range(99)] + [(99, 10000.0)],
        "k long, v double")
    g = gini_coefficient(concentrated, "v", "k").first()["gini"]
    assert g > 0.95

    vals = [1.0, 2.0, 3.0, 4.0]  # hand: G = 0.25 for 1..4
    mixed = spark.createDataFrame(
        list(enumerate(vals)), "k long, v double")
    n, s = len(vals), sum(vals)
    exp = (2 * sum((i + 1) * v for i, v in enumerate(sorted(vals)))
           - (n + 1) * s) / (n * s)
    got = gini_coefficient(mixed, "v", "k").first()["gini"]
    assert abs(got - exp) < 1e-9

    base = spark.createDataFrame(
        [(i, float((i * 37) % 101) + 1) for i in range(500)],
        "k long, v double")
    g1 = gini_coefficient(base.repartition(1), "v", "k").first()["gini"]
    g7 = gini_coefficient(base.repartition(7), "v", "k").first()["gini"]
    assert g1 == g7


def test_ks_two_sample_planted_shift(spark):
    """KS D: identical samples give D=0; a planted disjoint shift gives
    D=1; a half-overlap gives the hand-computable gap."""
    from mapreduce_wsi_spark.operators.evaluation import ks_two_sample
    same = spark.createDataFrame(
        [("a", float(v)) for v in range(10)]
        + [("b", float(v)) for v in range(10)], "g string, v double")
    assert ks_two_sample(same, "g", "v", "a", "b").collect()[0][
        "d_stat"] == 0.0
    disjoint = spark.createDataFrame(
        [("a", float(v)) for v in range(10)]
        + [("b", float(v + 100)) for v in range(10)],
        "g string, v double")
    assert ks_two_sample(disjoint, "g", "v", "a", "b").collect()[0][
        "d_stat"] == 1.0
    # a = {0..9}, b = {5..14}: max gap at v=4 -> F_a=0.5, F_b=0 -> 0.5
    half = spark.createDataFrame(
        [("a", float(v)) for v in range(10)]
        + [("b", float(v + 5)) for v in range(10)],
        "g string, v double").repartition(5)
    assert ks_two_sample(half, "g", "v", "a", "b").collect()[0][
        "d_stat"] == 0.5
