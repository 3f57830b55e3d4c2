"""Semantic tests for the training-data pipeline operators
(operators/pipeline.py) beyond the oracle hash-match: determinism,
distribution, planted-case behavior, and plan shape (broadcast sides)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.pipeline import (
    decontaminate,
    mode_deterministic,
    quantile_disc,
    repetition_stats,
    scrub_text,
    shuffle_shards,
    split_assign,
    stratified_sample,
)


def test_split_is_deterministic_and_roughly_proportional(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    a = split_assign(df, "k")
    counts = {r["split"]: r["n"]
              for r in a.groupBy("split").agg(F.count("*").alias("n"))
              .collect()}
    assert set(counts) == {"train", "val", "test"}
    # md5 buckets over 10k keys: expect ~80/10/10 within a loose band
    assert 0.76 < counts["train"] / 10_000 < 0.84
    assert 0.07 < counts["val"] / 10_000 < 0.13
    # same keys -> identical assignment (it's a pure function of the key)
    b = {r["k"]: r["split"] for r in split_assign(df, "k").collect()}
    a_map = {r["k"]: r["split"] for r in a.collect()}
    assert a_map == b


def test_split_stable_under_corpus_growth(spark):
    """Adding rows must not move existing keys between splits."""
    small = split_assign(spark.range(0, 100).withColumnRenamed("id", "k"),
                         "k")
    big = split_assign(spark.range(0, 1_000).withColumnRenamed("id", "k"),
                       "k")
    small_map = {r["k"]: r["split"] for r in small.collect()}
    big_map = {r["k"]: r["split"] for r in big.collect()}
    assert all(big_map[k] == v for k, v in small_map.items())


def test_stratified_sample_rates_and_broadcast(spark):
    df = (spark.range(0, 6_000)
          .select(F.col("id").alias("k"),
                  F.when(F.col("id") % 2 == 0, "a").otherwise("b")
                  .alias("grp")))
    out = stratified_sample(df, "k", "grp", {"a": 100, "b": 0},
                            default_pct=0)
    got = out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    assert {r["grp"]: r["n"] for r in got} == {"a": 3_000}
    # the rates side must be broadcast, not shuffled
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_scrub_text_redacts_planted_pii(spark):
    df = spark.createDataFrame(
        [(1, "Write  to Bob.Smith@corp.example or  see "
             "https://internal.example/x then call 555-0199 now")],
        "doc_id long, text string")
    row = scrub_text(df, "text", "doc_id").collect()[0]
    assert "<EMAIL>" in row["scrubbed"]
    assert "<URL>" in row["scrubbed"]
    assert "<PHONE>" in row["scrubbed"]
    assert "@" not in row["scrubbed"]
    assert "  " not in row["scrubbed"]  # whitespace collapsed
    assert (row["n_email"], row["n_url"], row["n_phone"]) == (1, 1, 1)


def test_decontaminate_flags_only_overlapping_docs(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "prefix words the quick brown fox jumps again"),  # 5-gram hit
         (2, "totally unrelated text with no overlap at all"),
         (3, "quick brown fox alone")],  # < 5 shared words in a row
        "doc_id long, text string")
    hits = decontaminate(corpus, bench, "text", "doc_id", n=5)
    got = {r["doc_id"]: r["n_bench_docs_hit"] for r in hits.collect()}
    assert got == {1: 1}
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # benchmark side broadcast


def test_repetition_stats_on_planted_doc(spark):
    df = spark.createDataFrame([(1, "a a a b c")],
                               "doc_id long, text string")
    r = repetition_stats(df, "text", "doc_id").collect()[0]
    assert r["n_words"] == 5 and r["n_distinct"] == 3
    assert r["top_word_frac"] == 3 / 5
    assert r["dup_word_frac"] == 3 / 5  # only 'a' occurrences repeat
    assert r["distinct_ratio"] == 3 / 5


def test_quantile_disc_matches_sorted_python(spark):
    import math
    vals = [(g, float(v)) for g in ("x", "y")
            for v in range(1, 101 if g == "x" else 8)]
    df = spark.createDataFrame(vals, "g string, v double")
    got = {r["g"]: r for r in
           quantile_disc(df, "g", "v", (0.5, 0.9)).collect()}

    def disc(data, p):
        # smallest value whose cume_dist >= p
        data = sorted(data)
        n = len(data)
        for i, v in enumerate(data, 1):
            if i / n >= p:
                return v
        return data[-1]

    for g in ("x", "y"):
        data = [v for gg, v in vals if gg == g]
        assert got[g]["p50"] == disc(data, 0.5)
        assert got[g]["p90"] == disc(data, 0.9)
        assert math.isclose(got[g]["n"], len(data))


def test_mode_tie_breaks_to_smallest_value(spark):
    df = spark.createDataFrame(
        [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c")],
        "grp string, v string")
    r = mode_deterministic(df, "grp", "v").collect()[0]
    assert (r["mode_value"], r["mode_count"]) == ("a", 2)


def test_shuffle_shards_is_a_permutation_and_deterministic(spark):
    df = spark.range(0, 1_000).withColumnRenamed("id", "k")
    s1 = shuffle_shards(df, "k", n_shards=4)
    rows = s1.collect()
    # every row exactly once, positions contiguous from 1 within each shard
    assert len(rows) == 1_000
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic across runs
    s2 = {(r["k"]): (r["shard"], r["pos"])
          for r in shuffle_shards(df, "k", n_shards=4).collect()}
    assert all(s2[r["k"]] == (r["shard"], r["pos"]) for r in rows)
    # not the identity order: shards interleave the key space
    first_shard_keys = sorted(k for k, (s, _) in s2.items() if s == 0)
    assert first_shard_keys != list(range(len(first_shard_keys)))


def test_global_ids_dense_contiguous_deterministic(spark):
    from mapreduce_wsi_spark.operators.pipeline import assign_global_ids

    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    out = assign_global_ids(df, "k", n_shards=32)
    ids = [r["global_id"] for r in out.collect()]
    assert sorted(ids) == list(range(10_000))  # dense 0..N-1, no gaps
    # deterministic mapping across independent runs
    m1 = {r["k"]: r["global_id"] for r in out.collect()}
    m2 = {r["k"]: r["global_id"]
          for r in assign_global_ids(df, "k", n_shards=32).collect()}
    assert m1 == m2
    # shard-major: ids within a shard are contiguous
    by_shard = {}
    for r in out.collect():
        by_shard.setdefault(r["shard"], []).append(r["global_id"])
    for g in by_shard.values():
        g = sorted(g)
        assert g == list(range(g[0], g[0] + len(g)))


def test_mix_sources_epoch_counts(spark):
    from mapreduce_wsi_spark.operators.pipeline import mix_sources

    df = spark.createDataFrame(
        [(1, "wiki"), (2, "wiki"), (3, "web")], "k long, src string")
    out = mix_sources(df, "k", "src", {"wiki": 3}, default_epochs=1)
    got = {(r["k"], r["epoch"]) for r in out.collect()}
    assert got == {(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 3), (3, 1)}


def test_pack_context_windows_respects_budget(spark):
    from mapreduce_wsi_spark.operators.pipeline import pack_context_windows

    df = (spark.range(0, 500).withColumnRenamed("id", "k")
          .withColumn("toks", (F.col("k") % 90 + 10).cast("int")))
    out = pack_context_windows(df, "k", "toks", budget=256, n_shards=4)
    rows = out.collect()
    # every doc starts inside its window's budget
    assert all(0 <= r["offset_in_window"] < 256 for r in rows)
    # window ids per shard are contiguous from 0
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], set()).add(r["window_id"])
    for wins in by_shard.values():
        assert wins == set(range(max(wins) + 1))
    # deterministic
    again = {(r["k"]): (r["shard"], r["window_id"], r["offset_in_window"])
             for r in pack_context_windows(df, "k", "toks", budget=256,
                                           n_shards=4).collect()}
    assert all(again[r["k"]] == (r["shard"], r["window_id"],
                                 r["offset_in_window"]) for r in rows)


def test_operators_tolerate_empty_input(spark):
    """Empty partitions/corpora appear constantly at 100 TB (filtered
    shards, fresh scopes); every pipeline operator must return an empty,
    correctly-typed result instead of raising."""
    from mapreduce_wsi_spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
    )
    from mapreduce_wsi_spark.operators.pipeline import (
        assign_global_ids,
        pack_context_windows,
        quantile_disc,
        repetition_stats,
        scrub_text,
        shuffle_shards,
        split_assign,
    )
    from mapreduce_wsi_spark.operators.relational import upsert

    docs = spark.createDataFrame([], "doc_id long, text string")
    kv = spark.createDataFrame([], "k long, v long")

    assert split_assign(docs, "doc_id").count() == 0
    assert scrub_text(docs, "text", "doc_id").count() == 0
    assert repetition_stats(docs, "text", "doc_id").count() == 0
    assert jaccard_pairs(docs, "text", "doc_id").count() == 0
    assert shuffle_shards(docs, "doc_id").count() == 0
    assert assign_global_ids(docs, "doc_id", n_shards=4).count() == 0
    assert quantile_disc(kv.withColumnRenamed("v", "val"), "k", "val").count() == 0
    assert pack_context_windows(
        kv.withColumnRenamed("v", "toks"), "k", "toks", 128).count() == 0
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0
    # upsert: empty updates -> base unchanged; empty base -> all inserts
    base = spark.createDataFrame([(1, 10)], "k long, v long")
    assert upsert(base, kv, ["k"]).collect() == base.collect()
    assert sorted(tuple(r) for r in upsert(kv, base, ["k"]).collect()) == \
        [(1, 10)]


def test_asof_join_forward_matches_bruteforce(spark):
    from mapreduce_wsi_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40), (2, 5)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b"), (2, 1, "c")], "k long, rt long, val string")
    got = {(r["k"], r["t"]): (r["rt_asof"], r["val_asof"])
           for r in asof_join(left, right, ["k"], "t", "rt", ["val"],
                              direction="forward").collect()}
    assert got == {
        (1, 10): (10, "a"),   # tie matches forward
        (1, 25): (30, "b"),   # next following
        (1, 40): (None, None),  # nothing after
        (2, 5): (None, None),   # right exists only before
    }
    # backward still behaves as before
    back = {(r["k"], r["t"]): r["val_asof"]
            for r in asof_join(left, right, ["k"], "t", "rt",
                               ["val"]).collect()}
    assert back == {(1, 10): "a", (1, 25): "a", (1, 40): "b", (2, 5): "c"}


def test_weighted_sample_prefers_heavy_weights(spark):
    from mapreduce_wsi_spark.operators.pipeline import weighted_sample
    rows = [(i, 1e6 if i < 5 else 1e-3) for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "w"])
    # ln(u)/w for heavy rows is ~0-, for light rows hugely negative:
    # the five heavy rows must be exactly the top-5 sample
    got = {r["k"] for r in weighted_sample(df, "k", "w", 5).collect()}
    assert got == {0, 1, 2, 3, 4}
    # deterministic under repartitioning (pure function of the key)
    got2 = [r["k"] for r in
            weighted_sample(df.repartition(7), "k", "w", 5).collect()]
    assert set(got2) == got


def test_temperature_mix_rates_and_flattening(spark):
    """keep_rate = (W_min/W_s)^exp: smallest stratum keeps all, rates
    fall with stratum weight, and exp=1 equalizes expected kept weight."""
    from mapreduce_wsi_spark.operators.pipeline import temperature_mix

    rows = [(i, "a" if i < 10 else ("b" if i < 40 else "c"), 100)
            for i in range(100)]
    df = spark.createDataFrame(rows, "k long, src string, w long")
    # W_a=1000, W_b=3000, W_c=6000
    out = temperature_mix(df, "k", "src", "w", flatten_exp=0.5)
    rates = {r.src: r.keep_rate for r in
             out.select("src", "keep_rate").distinct().collect()}
    assert rates["a"] == 1.0
    assert abs(rates["b"] - round((1000 / 3000) ** 0.5, 6)) < 1e-12
    assert abs(rates["c"] - round((1000 / 6000) ** 0.5, 6)) < 1e-12
    assert rates["a"] > rates["b"] > rates["c"]

    flat = temperature_mix(df, "k", "src", "w", flatten_exp=1.0)
    fr = {r.src: r.keep_rate for r in
          flat.select("src", "keep_rate").distinct().collect()}
    # expected kept weight per stratum = W_s * rate = W_min for all
    assert abs(fr["b"] * 3000 - 1000) < 1e-2
    assert abs(fr["c"] * 6000 - 1000) < 1e-2

    # determinism: the kept set is a pure function of the key
    k1 = {r.k for r in out.filter("kept").collect()}
    k2 = {r.k for r in
          temperature_mix(df, "k", "src", "w", 0.5).filter("kept").collect()}
    assert k1 == k2


def test_decontaminate_bloom_is_exactly_decontaminate(spark):
    """The Bloom prefilter may only cut shuffled bytes — results must be
    row-identical to the plain exact-overlap operator, including docs
    whose shingles pass the Bloom AND but fail the exact verify."""
    from mapreduce_wsi_spark.operators.pipeline import decontaminate_bloom

    rows = [(i, f"tok{i} w x y z common phrase here tok{i}")
            for i in range(40)]
    rows += [(100, "common phrase here appears twice common phrase here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = df.filter(F.col("doc_id") % 5 == 0)
    corpus = df.filter(F.col("doc_id") % 5 != 0)
    exact = {(r.doc_id, r.n_shared_shingles, r.n_bench_docs_hit)
             for r in decontaminate(corpus, bench, "text", "doc_id",
                                    n=4).collect()}
    # tiny bit space forces real false positives through the prefilter
    bloom = {(r.doc_id, r.n_shared_shingles, r.n_bench_docs_hit)
             for r in decontaminate_bloom(corpus, bench, "text", "doc_id",
                                          n=4, n_bits_log2=6).collect()}
    assert bloom == exact and exact


def test_length_buckets_quartiles_balanced_and_exact(spark):
    """Buckets are defined by exact PERCENTILE_DISC boundaries: each
    boundary is a value present in the data, bucket counts are balanced
    on a uniform distribution, and assignment is monotone in length."""
    from mapreduce_wsi_spark.operators.pipeline import length_buckets

    df = spark.createDataFrame([(i, (i * 7) % 100 + 1) for i in range(200)],
                               "k long, n long")
    out = length_buckets(df, "k", "n").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.n)
    assert set(by_bucket) == {1, 2, 3, 4}
    # uniform 1..100 -> quartiles of ~50 rows each
    assert all(40 <= len(v) <= 60 for v in by_bucket.values())
    # monotone: every bucket-k value <= every bucket-(k+1) value
    for b in (1, 2, 3):
        assert max(by_bucket[b]) <= min(by_bucket[b + 1])


def test_asof_join_nearest_picks_closer_side(spark):
    """direction='nearest': closer of backward/forward wins, |dt| ties
    go backward, one-sided keys fall back to the existing side, and
    keys with no right rows keep NULLs."""
    from mapreduce_wsi_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 21), (1, 29), (1, 20), (2, 5), (3, 7)],
        "k long, t long")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b"), (2, 50, "c")],
        "k long, rt long, val string")
    got = {(r["k"], r["t"]): (r["rt_asof"], r["val_asof"])
           for r in asof_join(left, right, ["k"], "t", "rt", ["val"],
                              direction="nearest").collect()}
    assert got == {
        (1, 10): (10, "a"),   # exact hit
        (1, 21): (30, "b"),   # 11 back vs 9 fwd -> forward closer
        (1, 29): (30, "b"),   # forward closer
        (1, 20): (10, "a"),   # tie (10 back, 10 fwd) -> backward wins
        (2, 5): (50, "c"),    # only a forward row exists
        (3, 7): (None, None),  # no right rows for key
    }


def test_dsir_upweights_target_like_docs(spark):
    """DSIR contract: a raw document written in the target slice's
    vocabulary must get a higher importance log-weight than one written
    in off-target vocabulary, and every target-slice doc itself scores
    high (its grams define the target model)."""
    from mapreduce_wsi_spark.operators.pipeline import dsir_select

    rows = [(i, "alpha beta gamma alpha beta", "tgt") for i in range(5)]
    rows += [(10 + i, "delta epsilon zeta delta epsilon", "raw")
             for i in range(5)]
    rows += [(20, "alpha beta gamma beta alpha", "raw"),  # target-like
             (21, "eta theta iota kappa mu", "raw")]      # off both
    df = spark.createDataFrame(rows, "doc_id bigint, text string, "
                                     "src string")
    out = {r["doc_id"]: r for r in dsir_select(
        df, "text", "doc_id", "src", ("tgt",), n_buckets=64,
        k=len(rows)).collect()}
    assert out[20]["log_w"] > out[10]["log_w"]
    assert out[20]["log_w"] > out[21]["log_w"]
    # signs: target-vocabulary grams carry positive log ratios, raw-only
    # vocabulary is downweighted below smoothing level
    assert out[20]["log_w"] > 0
    assert out[10]["log_w"] < 0


def test_dsir_materialize_identical_output(spark):
    """The materialize knob (persist the twice-consumed (doc, bucket)
    frame — the 100 TB recipe from the docstring) must be a pure
    execution-strategy switch: bit-identical rows either way."""
    from mapreduce_wsi_spark.operators.pipeline import dsir_select

    rows = [(i, f"alpha beta w{i % 7} gamma w{i % 3}", 
             "tgt" if i % 4 == 0 else "raw") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, "
                                     "src string")
    args = dict(text_col="text", id_col="doc_id", target_col="src",
                target_values=("tgt",), n_buckets=64, k=15)
    plain = sorted(map(tuple, dsir_select(df, **args).collect()))
    mat = sorted(map(tuple, dsir_select(df, materialize=True,
                                        **args).collect()))
    assert plain == mat


def test_token_budget_mix_cap_and_exact_quotas(spark):
    """Hand-checked quotas: a domain whose target exceeds 4x its supply
    is capped with the exact shortfall; an undersubscribed domain plans
    (avail*epochs)//1e6 tokens; weights fall back to the default."""
    from mapreduce_wsi_spark.operators.pipeline import token_budget_mix

    rows = [("a", 100)] * 10 + [("b", 50)] * 10 + [("c", 200)] * 10
    df = spark.createDataFrame(rows, "domain string, n_tokens long")
    got = {r["domain"]: r for r in token_budget_mix(
        df, "domain", "n_tokens",
        weights_ppm={"a": 700000, "b": 200000}, default_ppm=100000,
        budget_tokens=10000, max_epochs_ppm=4_000_000).collect()}
    # a: avail 1000, target 7000 -> epochs 7.0 -> capped at 4.0
    assert got["a"]["epochs_ppm"] == 7_000_000 and got["a"]["capped"]
    assert got["a"]["planned_tokens"] == 4000
    assert got["a"]["shortfall"] == 3000
    # b: avail 500, target 2000 -> epochs 4.0 exactly: NOT capped
    assert got["b"]["epochs_ppm"] == 4_000_000 and not got["b"]["capped"]
    assert got["b"]["planned_tokens"] == 2000 and got["b"]["shortfall"] == 0
    # c: default weight 10% -> target 1000 over avail 2000 -> 0.5 epochs
    assert got["c"]["epochs_ppm"] == 500_000
    assert got["c"]["planned_tokens"] == 1000


def test_rendezvous_minimal_disruption_and_balance(spark):
    """Adding one shard to 8 moves only ~1/9 of keys, every moved key
    lands ON the new shard (HRW's defining property — untouched keys
    keep their argmax), and the 8-shard assignment is roughly
    balanced."""
    from mapreduce_wsi_spark.operators.pipeline import rendezvous_assign

    keys = spark.range(0, 3000).withColumnRenamed("id", "k")
    s8 = [f"s{i}" for i in range(8)]
    a = rendezvous_assign(keys, "k", s8, "shard8")
    a = rendezvous_assign(a, "k", s8 + ["s8"], "shard9").collect()
    moved = [r for r in a if r["shard8"] != r["shard9"]]
    assert all(r["shard9"] == "s8" for r in moved), \
        "every relocated key must land on the NEW shard"
    frac = len(moved) / len(a)
    assert 0.05 < frac < 0.20, frac  # ~1/9 expected
    from collections import Counter
    sizes = Counter(r["shard8"] for r in a)
    assert len(sizes) == 8
    assert max(sizes.values()) < 2.0 * min(sizes.values())
