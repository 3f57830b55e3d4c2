#!/usr/bin/env python3
"""Regenerate PLANS.md: formatted physical plans for the headline queries.

The plans are the scale argument made concrete — pushed filters, pruned
read schemas, broadcast joins, partial aggregation, TakeOrderedAndProject —
exactly what tests/test_plan_shapes.py pins as regressions.

Usage: python3 tools/dump_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHOWN = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q5_local_supplier_volume",
    "q18_large_volume_customer",
    "topk_global",
    "window_running_agg",
    "flagship_integer_mean",
    "dedup_exact",
    "sim_cosine_topk",
    "split_hash_deterministic",
    "decontam_ngram_overlap",
    "quantile_disc_exact",
    "pipeline_prepare_corpus",
    "quality_repetition",
    "dedup_minhash_lsh",
    "sim_embedding_neardup",
    "mm_decode_ppm",
    "text_bm25_topk",
    "weighted_sample_es",
    "merge_upsert_cdc",
    "time_rollup_multigrain",
    "table_diff_keyed",
    "join_fuzzy_levenshtein",
    "funnel_steps",
    "interval_peak_concurrency",
    "graph_bfs_hops",
    "text_bpe_pretokenize",
    # r5: span-dedup shuffle shape, banded dhash near-dup, Bloom decontam
    # semi-joins, and the two map-only gates
    "text_dup_spans",
    "text_strip_dup_spans",
    "mm_image_neardup",
    "decontam_bloom_prefilter",
    "quality_model_gate",
    "vector_random_projection",
    "hybrid_retrieval_rrf",
    # r5 second tranche: the sketch shuffle shape, within-cell semantic
    # dedup, integer PageRank rounds, one-pass profile, map-only URL canon
    "heavy_hitters_mg",
    "dedup_semdedup",
    "graph_pagerank",
    "dq_profile_columns",
    "url_normalize",
    "text_vocab_oov",
    "dedup_prefix_filter",
    "sketch_kmv_overlap",
    "vector_quantize_int8",
    "events_ewma_smooth",
    "text_phrase_match",
    "graph_label_propagation",
    "theil_sen_user_trend",
    "funnel_within_window",
    # r6: eval tranche shuffle shapes — dictionary-sized AUC window,
    # zero-join bigram construction, one-scan CMS build, broadcast
    # histogram bounds, and the mm encode->decode Arrow pipelines
    "eval_group_auc",
    "eval_retrieval_metrics",
    "text_bigram_pmi",
    "sketch_cms_frequency",
    "hist_equiwidth_prices",
    "eval_confusion_f1",
    "mm_decode_jpeg_progressive",
    "mm_decode_ok_rate",
    # r6 second tranche: DSIR's pre-aggregated broadcast-model scoring,
    # the KN four-aggregate join-back, and the map-only entropy gate
    "dsir_importance_select",
    "text_kneser_ney_logprob",
    "text_char_entropy",
    # r7 session 2: the two-level bit_or rollup, the bucketed KS
    # prefix-sums, one Lloyd assignment round (broadcast centroids,
    # corpus never shuffles), the single-exchange time-range frame,
    # and the geohash map-only interleave
    "distinct_bitmap_rollup",
    "eval_ks_test",
    "cluster_kmeans_lloyd",
    "window_time_range_frame",
    "geo_geohash_cells",
    # r10: the bucketed-prefix-sum ntile rewrite, degree-oriented
    # triangles, and the curation tranche's shuffle shapes —
    # cross-snapshot banding, canonical-URL group join, positional
    # contamination coverage, char-gram repetition explode, PPS
    # bucketed cumsum, and the staged dedup funnel
    "window_ntile_bins",
    "triangle_count",
    "dedup_incremental_minhash",
    "dedup_url_canonical",
    "decontam_token_fraction",
    "text_char_ngram_repetition",
    "sample_pps_systematic",
    "pipeline_dedup_funnel",
    # r10 session-2: the CDC map-only fold (no Window anywhere) and the
    # factored bucketed-prefix-sum ntile (no ntile, bucket-keyed rank)
    "dedup_cdc_sentences",
    "mix_curriculum_schedule",
    # r10 session-2 ceiling removals: per-value weighted median, global
    # bucketed ntile (RFM), bucketed running mass (top-p)
    "weighted_median_exact",
    "rfm_scores",
    "topp_mass_cutoff",
    # r11: the count+semi-join char-repetition form (no collect_list),
    # CDC across snapshots (distinct-hash equi-join, no pairwise), the
    # salted per-host crawl budget, the distillation score path
    # (token-keyed model join), and the token-budget pacing cumsum over
    # stage-level aggregates
    "dedup_cdc_cross_snapshot",
    "web_host_crawl_budget",
    "quality_distill_student_agreement",
    "mix_token_budget_pacing",
    # r12 tranche: the chain attribution's two incremental-minhash legs
    # + left join + tiny aggregate, the host-keyed bucketed ntile, and
    # the gram-novelty min-introduction aggregate
    "dedup_chain_minhash_first_seen",
    "mix_host_curriculum_pacing",
    "text_ngram_novelty_decay",
    # r13 tranche: the BPE-token budget composition (learned merges as
    # plan literals + keeper join + waterfall broadcasts) and the
    # IVF-PQ composed serve (broadcast probes, cell-equi code join,
    # salted shortlist + re-rank)
    "mix_bpe_token_budget",
    "sim_ann_ivfpq_grid_recall",
]

# Longer-form commentary (beyond the catalog note) rendered above the plan.
PROSE = {
    "window_ntile_bins": """\
r10 rewrite (VERDICT r9 ask #4): the equi-depth decile binning that used
to be one ntile window per o_orderpriority — a whole priority group
through one task — is now the bucketed prefix-sum composition: a
row_number window keyed (priority, price-range bucket), a bucket-count
aggregate whose exclusive prefix comes from a window over BUCKET rows
(thousands, not millions), two broadcast joins back, and the ntile bin
derived arithmetically from (global rank, n). The oracle still runs
ntile — output is bit-identical — and no window in this plan ever sees
an unbounded partition. The plan shows both windows and the broadcasts;
tests/test_plan_shapes.py::test_ntile_bins_is_bucketed_prefix_sum pins
ntile out.""",
    "triangle_count": """\
r10 rewrite (VERDICT r9 ask #3): wedges now come from the DEGREE-ORIENTED
edge list (low-degree -> high-degree, tie to smaller id) instead of the
(lo < hi) chain join. The plan gains the degree aggregate + two joins
that attach endpoint degrees, and in exchange every node's out-degree is
O(sqrt(m)) — a power-law hub emits O(m) wedge candidates instead of
#lower x #higher ~ deg^2 (the planted-hub test measures 10,000 -> 3).
Same count, same oracle.""",
    "funnel_steps": """\
First-touch funnel (view > click > purchase, strict ts order). The three
conditional window-mins are sequentially dependent (step k's predicate
references step k-1's timestamp), yet all share the user_id partitioning —
so Catalyst plans ONE Exchange and stacks the three Window operators plus
the final per-user HashAggregate on top of it. At 100 TB this is a single
shuffle of (user_id, ts, event_type) — the projection already pruned
value/props at the scan.

Iteration note: the naive formulation (groupBy per step + self-joins)
costs k shuffles and k joins; the chained-window form was chosen
specifically to collapse that to one exchange
(tests/test_behavior.py::test_funnel_is_one_shuffle pins it).""",
    "interval_peak_concurrency": """\
Sweep-line max-overlap, two-phase. A textbook sweep is a running sum over
ONE global (t, delta) order — an Exchange SinglePartition that caps out at
one core no matter the cluster. Here phase 1 computes the running sum
within (group, day) partitions; phase 2 joins each day's exclusive prefix
total back from a per-(group, day) aggregate that is tiny (groups x days
rows) and therefore broadcast. The plan shows both windows partitioned,
the BroadcastExchange for the offsets, and NO single-partition exchange
(pinned by tests/test_plan_shapes.py::test_sweep_concurrency_has_no_global_sort).
Same trick as global_ids_dense — the prefix-sum decomposition is the
generic cure for "ordered scan of everything" shapes.""",
    "graph_bfs_hops": """\
Frontier BFS over the support>=2 co-purchase graph (cyclic, so the
pointer-doubling hierarchy operator doesn't apply). Each round is
frontier JOIN edges -> distinct -> LEFT ANTI visited, lineage cut per
round via util.iter_checkpoint; the plan below is the RESULT's shape —
the checkpoint guarantees the executed plan stays this size regardless
of round count (the lineage-growth trap that kills iterative Spark
jobs). Work per round is O(frontier x degree); rounds = diameter. The
1-row min-node collect is the only driver-side value. DuckDB verifies
via an honest WITH RECURSIVE UNION twin.""",
    "text_bpe_pretokenize": """\
GPT-2-style pre-tokenization as a map-only stage: one regexp_extract_all
+ md5 projection straight over the scan — no shuffle, no Python. At
100 TB this pipelines into pack_context_windows/shuffle_shards without a
boundary.""",
}

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from mapreduce_wsi_spark.session import get_spark
    from mapreduce_wsi_spark.plans.registry import load_catalog

    spark = get_spark(app_name="dump_plans",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    catalog = load_catalog()

    out = [
        "# PLANS — physical plans of the headline queries\n",
        f"Generated by `tools/dump_plans.py` at `{SF_DIR}` "
        "(plan shapes are SF-independent; AQE may further coalesce at "
        "runtime). Regression-pinned properties: "
        "`tests/test_plan_shapes.py`.\n",
    ]
    for name in SHOWN:
        entry = catalog[name]
        df = entry.fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"## {name}\n")
        if name in PROSE:
            out.append(PROSE[name] + "\n")
        elif entry.note:
            out.append(f"_{entry.note}_\n")
        out.append("```\n" + buf.getvalue().strip() + "\n```\n")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWN)} plans)")


if __name__ == "__main__":
    main()
