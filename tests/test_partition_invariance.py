"""Partition-count invariance — the single-row-group blind spot.

Every fixture parquet at test SF is ONE row group, and a row group is
Spark's minimum split unit — so by default every query effectively runs
single-partition and a whole class of 100 TB bugs (partial-agg merge
order, window frames crossing splits, per-partition hash mins,
shuffle-key coverage) stays invisible. These tests rewrite the fixtures
as 16-file parquet (a genuinely splittable layout), shrink
``spark.sql.files.maxPartitionBytes`` so each file scans as its own
partition, and assert results are IDENTICAL to the single-partition
baseline — the property that lets the same plan run on one executor or a
thousand.

The curated ENTRIES list names exact-arithmetic paths
(decimal/integer/hash/rank) chosen per round for per-test visibility;
since r8 `test_full_catalog_invariant_under_input_splitting` sweeps
EVERY remaining catalog entry in one bulk test, so the whole (386-entry as of r10)
surface is invariance-pinned. Float-summing entries keep their sums in
decimal through the shuffle for exactly this reason (see FIXTURES.md
§B / the share_of_total note).
"""

from __future__ import annotations

import pytest

from mapreduce_wsi_spark.plans.parity import FIXTURE_TABLES, canon_rows
from mapreduce_wsi_spark.plans.registry import load_catalog

CATALOG = load_catalog()

ENTRIES = [
    "q1_pricing_summary",        # decimal partial+final agg
    "flagship_integer_mean",     # integer tripwire mean over explode
    "window_rank_lag",           # rank/lag over shuffled windows
    "topk_per_group",            # per-group top-k across splits
    "dedup_minhash_lsh",         # per-doc hash mins + LSH band join
    "sessionize_lag_cumsum",     # ordered cumsum sessionization
    "text_bm25_topk",            # decimal per-term score sum across splits
    "weighted_sample_es",        # heap top-k across partition layouts
    "join_range_intervals",      # bucketed interval join across splits
    "interval_peak_concurrency",  # two-phase sweep: day windows + offsets
    "anomaly_zscore_rolling",    # ordered 20-row frames across splits
    "graph_bfs_hops",            # iterative frontier joins across splits
    # r5: corpus-wide span counts (count window keyed by span must see
    # every split), banded hamming self-join across splits, per-stratum
    # integer weight sums -> rates, Bloom semi-joins + exact verify
    "text_dup_spans",
    "mm_image_neardup",
    "mix_temperature_flatten",
    "decontam_bloom_prefilter",
    "text_strip_dup_spans",      # span window + array-mask edit
    "batch_length_buckets",      # exact PERCENTILE_DISC boundaries
    # r5 second tranche: deterministic vocab rank + per-doc OOV re-agg,
    # component-hash splits, per-row fold cosine top-k + vote, MG sketch
    # contract booleans (estimates vary by partition layout; the emitted
    # booleans/exact counts must not), map-only URL canon, cell-local
    # cosine keep set (planted margin >> threshold)
    "text_vocab_oov",
    "split_leakage_safe",
    "knn_label_vote",
    "heavy_hitters_mg",
    "url_normalize",
    "dedup_semdedup",
    "graph_pagerank",            # integer fixed-point ranks across splits
    "dq_profile_columns",        # one-pass Expand profile across splits
    "dedup_containment",         # shingle self-join + least-size ratio
    "dedup_keep_longest",        # components + per-cluster rank window
    "pipeline_prepare_web",      # url window dedup + gate + hash split
    "events_ewma_smooth",        # integer-weight frames across splits
    "dedup_prefix_filter",       # global token rank + prefix join
    "sketch_kmv_overlap",        # k-smallest hashes across splits
    "vector_quantize_int8",      # per-dim min/max broadcast, exact codes
    "topp_mass_cutoff",          # integer-cents cumsum cutoff
    "text_bigram_logprob",       # decimal-rounded ln terms per doc
    "join_asof_tolerance",       # carried window + tolerance nulls
    "theil_sen_user_trend",      # pairwise slopes + disc median
    "graph_label_propagation",   # mode-of-neighbors rounds
    "text_phrase_match",         # positional adjacency self-join
    "geo_radius_join",           # grid blocking + literal-factor metric
    "text_bpe_apply",            # map-only merge chain, md5 pinned
    "streak_longest_per_user",   # island keys from dual row_numbers
    "window_moving_median",      # sorted bounded frames
    "embedding_label_coherence", # decimal centroid sums + rounded cos
    "text_bpe_learn",            # exact pair counts + lexicographic argmax
    "dsir_importance_select",    # decimal bucket-model deltas + Gumbel top-k
    "text_kneser_ney_logprob",   # fixed IEEE shape over exact counts
    "sketch_tdigest_quantiles",  # exact anchor + tolerance booleans
    # r7: Bloom words bit_or-aggregate across splits, SNM windows over
    # split blocks, FS scoring atop SNM, integer HITS half-rounds,
    # domain token sums, leading-digit counts, the two-phase skyline
    # (phase-1 batch boundaries MOVE with partitioning — phase 2 must
    # erase that), telescoped decimal ECE, Welch decimal moments, and
    # the join-view delta union
    "join_bloom_prune",
    "dedup_sorted_neighborhood",
    "er_fellegi_sunter",
    "graph_hits",
    "pipeline_token_budget_mix",
    "dq_benford_prices",
    "agg_skyline_pareto",
    "eval_ece",
    "eval_welch_ttest",
    "incremental_join_view",
    "dedup_weighted_minhash",    # capped tf mins + banded join across splits
    "pipeline_prepare_er",       # SNM + FS + components composition
    # r7 session 2: word-bitmap bit_or across splits, bucketed KS
    # prefix-sums, peel rounds over split edges, wedge joins, CUSUM
    # stacked windows, decimal autocorr moments, array_sort journey
    # fold (collect_list order MOVES with partitioning — the sort must
    # erase it), as-of carry, fixed-width pad/parse roundtrip
    "distinct_bitmap_rollup",
    "eval_ks_test",
    "graph_kcore",
    "graph_link_prediction",
    "events_cusum_shift",
    "ts_autocorr_lag",
    "events_pattern_regex",
    "join_point_in_time",
    "source_fixed_width",
    # late session 2: bit-exact Lloyd rounds, truncating Holt fold,
    # two-phase arrival-order prefix max
    "cluster_kmeans_lloyd",
    "ts_holt_forecast",
    "stream_lateness_audit",
    # final tranche: two-phase pooled ranks, descending prefix sums,
    # md5 CDF-inversion draws
    "quantile_normalize_groups",
    "agg_pareto_8020",
    "sample_negative_unigram",
    # closing tranche: descending risk-set cumsum + decimal ln terms,
    # exact SSIM moments over banded pairs, banded skip-gram position
    # joins, decimal centroid argmax, matrix power rounds
    "events_kaplan_meier",
    "mm_image_ssim",
    "text_skipgram_pmi",
    "eval_nearest_centroid",
    "events_markov_stationary",
    "interval_union_time",   # running-max islands across splits
]

SMALL_SPLIT_BYTES = 65536


@pytest.fixture(scope="module")
def split_sf_dir(spark, sf_oracle, tmp_path_factory) -> str:
    """sf0.01 fixtures rewritten as 16 parquet files per table. events.ts
    is copied in its raw on-disk layout (nanos-as-long or micros NTZ) —
    it round-trips and registry.events_tbl's normalize_event_ts applies
    identically on read-back."""
    out = tmp_path_factory.mktemp("sfsplit")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name in FIXTURE_TABLES:
        (spark.read.parquet(f"{sf_oracle}/{name}.parquet")
         .repartition(16)
         .write.mode("overwrite").parquet(f"{out}/{name}.parquet"))
    return str(out)


def _canon(df):
    return canon_rows(df.columns, [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_under_input_splitting(name, spark, sf_oracle,
                                                split_sf_dir):
    conf = spark.conf
    default = conf.get("spark.sql.files.maxPartitionBytes")
    entry = CATALOG[name]
    baseline = _canon(entry.fn(spark, sf_oracle))
    try:
        conf.set("spark.sql.files.maxPartitionBytes", str(SMALL_SPLIT_BYTES))
        # sanity: the split layout really scans as many partitions (guard
        # against small-file packing making this test vacuous)
        probe = spark.read.parquet(f"{split_sf_dir}/lineitem.parquet")
        n_parts = probe.rdd.getNumPartitions()
        assert n_parts > 8, f"scan did not split (partitions={n_parts})"
        assert _canon(entry.fn(spark, split_sf_dir)) == baseline
    finally:
        conf.set("spark.sql.files.maxPartitionBytes", default)


def test_full_catalog_invariant_under_input_splitting(spark, sf_oracle,
                                                      split_sf_dir):
    """FULL-CATALOG partition invariance (r8): every catalog entry not
    in the curated ENTRIES list above, swept in ONE test (a catalog-wide
    parametrize would add minutes of per-test fixture overhead). The
    perturbed run flips BOTH partitioning axes at once — 16-file
    64 KiB-split input layout AND spark.sql.shuffle.partitions 32 -> 7
    (the driver's plain session runs 200; results must not care). The
    r8 exploratory sweeps found 260/260 (input splitting) and 341/341
    (shuffle count) bitwise-invariant — including every
    sketch-convention entry, whose emitted contract booleans and exact
    anchors must not move with partitioning even though their internal
    estimates may. A future entry whose result depends on either axis
    fails here with its name."""
    conf = spark.conf
    default = conf.get("spark.sql.files.maxPartitionBytes")
    default_shuf = conf.get("spark.sql.shuffle.partitions")
    rest = [n for n in CATALOG if n not in ENTRIES]
    failures = []
    try:
        for name in rest:
            entry = CATALOG[name]
            conf.set("spark.sql.files.maxPartitionBytes", default)
            conf.set("spark.sql.shuffle.partitions", default_shuf)
            baseline = _canon(entry.fn(spark, sf_oracle))
            conf.set("spark.sql.files.maxPartitionBytes",
                     str(SMALL_SPLIT_BYTES))
            conf.set("spark.sql.shuffle.partitions", "7")
            if _canon(entry.fn(spark, split_sf_dir)) != baseline:
                failures.append(name)
    finally:
        conf.set("spark.sql.files.maxPartitionBytes", default)
        conf.set("spark.sql.shuffle.partitions", default_shuf)
    assert not failures, f"partition-dependent results: {failures}"
