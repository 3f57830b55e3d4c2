"""Pins the driver-scored window: the round driver's correctness gate
checks only the FIRST 50 catalog entries in registration order. From
round 4 the window ROTATES — 5 fixed sentinels plus never-before-stamped
entries — so the driver's cumulative evidence grows every round instead
of re-stamping the same 50. From round 5 the window also carries an
explicit staleness tier (WINDOW_STALENESS_PAD): once fewer than 45
entries remain unstamped, the free slots re-check the entries whose
driver stamp is oldest. Family coverage is asserted over the CUMULATIVE
stamped set (union of past CORRECTNESS_r*.json + the current window),
and rotation hygiene is asserted directly: apart from the sentinels and
the declared pad, the window must contain only entries no prior round
stamped. Prior rounds are keyed by ROUND number — a file
CORRECTNESS_rNN.json is a prior iff NN < registry.ROUND — not by any
overlap heuristic."""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from mapreduce_wsi_spark.plans.registry import (
    DRIVER_WINDOW, ROUND, WINDOW_STALENESS_PAD, load_catalog)

pytestmark = pytest.mark.driver_gate

CATALOG = load_catalog()

REPO = Path(__file__).resolve().parent.parent


def _round_of(path: Path) -> int:
    m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path.name)
    assert m, f"unexpected correctness filename {path.name}"
    return int(m.group(1))


# stamped green by the driver in any completed prior round. GREEN only:
# a red row (r8 had two — the driver-canon envelope defects) is not a
# stamp, and counting it would both block its re-queue here and
# undercount the remaining backlog (same defect class as the ADVICE r8
# window_audit pad fix — keep the predicate in sync with
# tools/window_audit.py).
EVER_STAMPED: set[str] = set()
for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
    if _round_of(f) < ROUND:
        rows = json.loads(f.read_text())
        EVER_STAMPED |= {n for n, r in rows.items()
                         if r.get("rows_match") and r.get("schema_match")
                         and r.get("hash_match", True) and not r.get("err")}

# regression canaries: driver-stamped every round by design
SENTINELS = {"q1_pricing_summary", "flagship_integer_mean",
             "merge_upsert_cdc", "dedup_components", "funnel_steps"}

# one-plus representative per family the judge inventories (SURVEY.md §2C
# categories + the LLM-pipeline capabilities); coverage is cumulative
FAMILY_REPRESENTATIVES = {
    "tpch": {"q1_pricing_summary", "q3_shipping_priority",
             "q11_important_stock", "q16_supplier_relationship",
             "q20_excess_shipper"},
    "agg": {"agg_distinct_counts", "var_std_exact", "argmax_per_group",
            "mode_per_group", "winsorized_sum"},
    "approx_sketch": {"approx_distinct_hll", "approx_quantiles",
                      "hll_sketch_rollup"},
    "join": {"join_left_outer_counts", "join_semi", "join_asof_last_error",
             "join_range_intervals", "join_salted_skew",
             "join_fuzzy_levenshtein"},
    "window": {"window_rank_lag", "sessionize_lag_cumsum",
               "window_range_frame", "window_count_distinct"},
    "topk": {"topk_per_group", "topk_global", "trending_topk_daily"},
    "grouping": {"grouping_sets_agg"},
    "setop": {"set_union"},
    "reshape": {"pivot_qty", "unpivot_part", "explode_words_ordinal"},
    "null_semantics": {"null_semantics"},
    "scalar_funcs": {"scalar_string_funcs", "scalar_date_funcs",
                     "scalar_math_funcs", "json_typed_struct",
                     "array_higher_order", "map_funcs"},
    "streaming": {"stream_tumbling_window", "stream_session_window",
                  "stream_sliding_window", "stream_dedup_within_watermark",
                  "stateful_user_stats"},
    "udf": {"udaf_pandas_integer_mean", "flagship_arrow_pandas"},
    "flagship": {"flagship_integer_mean"},
    "dedup": {"dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
              "dedup_components", "dedup_simhash"},
    "similarity": {"sim_cosine_topk", "sim_ann_ivf", "sim_ann_lsh",
                   "sim_embedding_neardup"},
    "text": {"text_token_stats", "text_quality", "text_langid",
             "text_tf_df", "text_bm25_topk", "text_inverted_index",
             "text_fingerprint"},
    "multimodal": {"mm_blob_meta", "mm_decode_ppm", "mm_decode_wav",
                   "mm_decode_bmp", "mm_sample_frames"},
    "pipeline": {"split_hash_deterministic", "quantile_disc_exact",
                 "global_ids_dense", "pipeline_prepare_corpus",
                 "sample_stratified_hash", "sample_k_per_group",
                 "text_scrub_pii", "decontam_ngram_overlap",
                 "quality_repetition", "shuffle_shards",
                 "pack_context_windows", "weighted_sample_es"},
    "lakehouse_merge": {"merge_upsert_cdc", "scd2_intervals",
                        "table_diff_keyed", "layout_zorder_key"},
    "hierarchy": {"hierarchy_roots_depth"},
    "udtf": {"udtf_chunk_text"},
    "time_rollup": {"time_rollup_multigrain"},
    "behavioral": {"funnel_steps", "interval_peak_concurrency",
                   "event_transition_matrix", "anomaly_zscore_rolling",
                   "cohort_retention_weekly", "attribution_last_touch",
                   "rfm_scores", "session_path_trigrams"},
    "graph": {"triangle_count", "graph_bfs_hops", "copurchase_pairs_topk",
              "entity_resolution_pipeline"},
}


def test_window_is_first_50_in_catalog_order():
    assert len(DRIVER_WINDOW) == 50
    assert list(CATALOG)[:50] == list(DRIVER_WINDOW)


def test_window_rotation_targets_never_stamped_entries():
    """Apart from the 5 sentinels and the declared staleness pad, every
    windowed entry must be one no prior round stamped — that is the whole
    point of rotating. Prior rounds are keyed by round number (< ROUND),
    so a driver-written current-round file never skews the check."""
    fresh = set(DRIVER_WINDOW) - SENTINELS - set(WINDOW_STALENESS_PAD)
    already_prior = fresh & EVER_STAMPED
    assert not already_prior, (
        f"window wastes slots on already-stamped entries: {already_prior}")


def test_pad_is_exactly_the_oldest_stamps():
    """VERDICT r10 ask #5 — the pad rule is enforced mechanically, not
    by prose: the pad must consist of exactly the N entries whose
    LATEST green driver stamp is oldest (ties broken by name), where N
    is the free-slot count (50 - sentinels - never-stamped additions).
    Recomputed here from CORRECTNESS_r*.json, so a hand-picked or
    stale pad fails the suite."""
    n_pad = len(WINDOW_STALENESS_PAD)
    if n_pad == 0:
        return  # no free slots this round; nothing to enforce
    latest: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        if _round_of(f) >= ROUND:
            continue
        rows = json.loads(f.read_text())
        for n, r in rows.items():
            if (r.get("rows_match") and r.get("schema_match")
                    and r.get("hash_match", True) and not r.get("err")):
                latest[n] = max(latest.get(n, 0), _round_of(f))
    ranked = sorted((rnd, name) for name, rnd in latest.items()
                    if name not in SENTINELS)
    expected = tuple(name for _rnd, name in ranked[:n_pad])
    assert tuple(sorted(WINDOW_STALENESS_PAD)) == tuple(
        sorted(expected)), (
        f"pad {WINDOW_STALENESS_PAD} != oldest-stamp set {expected}")


def test_staleness_pad_entries_were_previously_stamped():
    """The pad exists to RE-check old stamps; a pad entry the driver
    never stamped would belong in the fresh tier instead."""
    assert set(WINDOW_STALENESS_PAD) <= EVER_STAMPED
    assert set(WINDOW_STALENESS_PAD) <= set(DRIVER_WINDOW)
    assert not set(WINDOW_STALENESS_PAD) & SENTINELS


def test_round_constant_is_current():
    """ROUND must exceed every prior correctness file on disk; if the
    driver has already written this round's file, it may equal ROUND."""
    rounds = [_round_of(f) for f in REPO.glob("CORRECTNESS_r*.json")]
    assert rounds, "no correctness files found"
    assert ROUND >= max(rounds), (
        f"registry.ROUND={ROUND} is behind CORRECTNESS_r{max(rounds):02d}")


def test_sentinels_always_in_window():
    assert SENTINELS <= set(DRIVER_WINDOW)


def test_cumulative_coverage_samples_every_family():
    covered = EVER_STAMPED | set(DRIVER_WINDOW)
    missing = {fam: reps for fam, reps in FAMILY_REPRESENTATIVES.items()
               if not reps & covered}
    assert not missing, f"families with no driver-scored entry: {missing}"


def test_window_entries_all_have_oracles():
    no_oracle = [n for n in DRIVER_WINDOW if CATALOG[n].oracle is None]
    assert not no_oracle


def test_every_family_representative_exists():
    all_reps = set().union(*FAMILY_REPRESENTATIVES.values())
    unknown = all_reps - set(CATALOG)
    assert not unknown
