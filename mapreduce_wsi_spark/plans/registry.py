"""Query/oracle registry — the driver-contract backbone.

Every implemented operator from SURVEY.md §2 registers here with a Spark
builder ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a
DuckDB oracle string over the pre-registered fixture views. The driver
compares the two at sf0.01 (row-count + schema + order-insensitive
value-hash, columns sorted by name) — so every computed column is aliased
identically on both sides, and float-valued aggregates go through exact
decimal(18,2) arithmetic before a final cast to double (the fixture doubles
are all 2-decimal values, so the casts are lossless; see FIXTURES.md §B).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogEntry:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver records a weaker rows-only check
    note: str = ""


CATALOG: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None = None, note: str = ""):
    """Decorator: add a query builder to the catalog."""
    def deco(fn):
        if name in CATALOG:
            raise ValueError(f"duplicate catalog entry {name!r}")
        CATALOG[name] = CatalogEntry(fn=fn, oracle=oracle, note=note)
        return fn
    return deco


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Every catalog query funnels through here: guarantee Python workers
    # can unpickle UDFs referencing this package even when the driver
    # harness imports us from an arbitrary cwd (see util.py).
    from mapreduce_wsi_spark.util import ensure_package_on_workers
    ensure_package_on_workers(spark)
    if name == "events":
        return events_tbl(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """events.ts has shipped as TIMESTAMP(NANOS) in some fixture
    generations (Spark's vectorized reader rejects that outright; only
    readable as a raw long via ``nanosAsLong``) and TIMESTAMP(MICROS) in
    others (read as TIMESTAMP_NTZ). Normalize either to a session-TZ
    (UTC) microsecond TIMESTAMP: truncating ``div 1000`` for the nanos
    case — exactly DuckDB's ns->us cast, so oracle comparisons stay
    bit-identical — and a plain cast for the NTZ case (lossless under
    the UTC session timezone pinned in session.py)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def events_tbl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read events.parquet with ts normalized across fixture layouts
    (see normalize_event_ts). Spark has no per-read parquet option for
    nanos handling, so ``nanosAsLong`` must be session conf: session.py
    sets it in the engine's own defaults; the guard below covers
    externally-created sessions (the driver's) without re-mutating conf
    on every catalog build."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    if spark.conf.get(key, "false") != "true":
        spark.conf.set(key, "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_event_ts(raw)


# The driver's correctness gate scores the FIRST 50 catalog entries in
# registration order, and the window ROTATES each round so cumulative
# driver evidence grows instead of re-stamping the same 50. Rounds 1-9
# stamped the ENTIRE 341-entry r9 catalog green (cumulative 341/341,
# r9 50/50). With the backlog closed, growth RESUMED this round per the
# COVERAGE.md policy (<=45 net-new per round, sized to the non-sentinel
# window slots): the r10 tranche adds exactly 40 web-corpus-curation
# entries (plans/q_curation.py — URL canonical dedup, cross-snapshot
# incremental dedup, contamination scoring, quota/PPS sampling,
# Gopher/C4 gates, dedup audits, LLM-eval metrics) and a session-2
# tranche of 5 r11-queue entries (manifest-keyed incremental dedup,
# CDC sentence dedup, CCNet paragraph LM, curriculum ntile, embedding
# recall audit) — exactly the 45-entry budget, so this window =
# 5 sentinels + all 45 new entries; the staleness pad shrank to zero
# per its shrink-first rule. Every new entry is driver-stamped the
# round it lands; the backlog can never re-form.
# tests/test_driver_window.py pins the order, asserts the rotation
# hygiene (non-sentinel, non-pad entries must be never-stamped), and
# checks family coverage over the CUMULATIVE stamped set.
ROUND = 10  # current build round; CORRECTNESS_r{<ROUND}.json are priors

# staleness re-checks: previously stamped (allowed to repeat). The pad
# exists only when free slots remain after covering never-stamped
# entries and SHRINKS FIRST — and this round it shrank to zero: the
# session-2 tranche (5 more r11-queue entries, bringing r10 growth to
# exactly the 45-entry budget) fills every non-sentinel slot with
# never-stamped entries. The round-2-vintage staleness candidates
# (above_avg_balance, distinct_rows, histogram_fixed_buckets,
# q10_returned_items, q12_late_shipment) re-queue for the next round
# with free slots.
WINDOW_STALENESS_PAD: tuple[str, ...] = ()

DRIVER_WINDOW: tuple[str, ...] = (
    # sentinels (driver-stamped every round; regression canaries)
    "q1_pricing_summary", "flagship_integer_mean", "merge_upsert_cdc",
    "dedup_components", "funnel_steps",
    # r10 tranche (plans/q_curation.py), registration order:
    # URL / web family
    "url_host_rollup", "dedup_url_canonical", "web_robots_filter",
    "url_tracking_params_audit",
    # cross-snapshot incremental dedup
    "dedup_cross_snapshot_exact", "dedup_cross_snapshot_bloom",
    "dedup_incremental_minhash", "dedup_snapshot_delta_stats",
    # contamination scoring
    "decontam_token_fraction", "decontam_longest_run",
    # mixing / sampling
    "mix_perplexity_target", "sample_quota_largest_remainder",
    "sample_pps_systematic",
    # Gopher / C4 quality gates
    "text_gopher_quality_rules", "quality_rejection_reasons",
    "text_c4_heuristics", "text_char_ngram_repetition",
    # dedup reports / audits
    "dedup_cluster_size_hist", "dedup_lsh_recall_audit",
    "text_boilerplate_prefix_clusters", "dedup_paragraph_exact",
    # LLM-eval metrics
    "eval_pass_at_k", "eval_bleu_ngram_precision",
    "eval_pairwise_winrate",
    # corpus profiling / composition
    "text_ngram_novelty", "text_idf_rarity_score",
    "text_vocab_coverage_topv", "dq_json_key_profile",
    "text_hash_bucket_balance", "dq_pii_density",
    "dedup_composition_drift", "dedup_keep_best_quality",
    "pipeline_dedup_funnel", "dedup_minhash_error_audit",
    "text_lang_mix_entropy", "text_token_len_hist",
    "pipeline_shard_size_audit", "text_hapax_ratio",
    "mix_domain_kl_divergence", "eval_fleiss_kappa",
    # session-2 tranche (r11-queue pulls; registered in q_curation.py)
    "dedup_cdc_sentences", "text_ccnet_paragraph_lm",
    "mix_curriculum_schedule", "dedup_manifest_cross_snapshot",
    "dedup_embedding_recall_audit",
) + WINDOW_STALENESS_PAD


def load_catalog() -> dict[str, CatalogEntry]:
    """Import all query-definition modules (side-effect: registration),
    then order the catalog so DRIVER_WINDOW comes first."""
    import mapreduce_wsi_spark.plans.q_relational  # noqa: F401
    import mapreduce_wsi_spark.plans.q_tpch_more  # noqa: F401
    import mapreduce_wsi_spark.plans.q_extras  # noqa: F401
    import mapreduce_wsi_spark.plans.q_functions  # noqa: F401
    import mapreduce_wsi_spark.plans.q_streaming  # noqa: F401
    import mapreduce_wsi_spark.plans.q_llm  # noqa: F401
    import mapreduce_wsi_spark.plans.q_pipeline  # noqa: F401
    import mapreduce_wsi_spark.plans.q_reference  # noqa: F401
    import mapreduce_wsi_spark.plans.q_lakehouse  # noqa: F401
    import mapreduce_wsi_spark.plans.q_events  # noqa: F401
    import mapreduce_wsi_spark.plans.q_eval  # noqa: F401
    import mapreduce_wsi_spark.plans.q_graph  # noqa: F401
    import mapreduce_wsi_spark.plans.q_curation  # noqa: F401
    import mapreduce_wsi_spark.plans.q_curation2  # noqa: F401
    ordered = {name: CATALOG[name] for name in DRIVER_WINDOW}
    for name, e in CATALOG.items():
        if name not in ordered:
            ordered[name] = e
    CATALOG.clear()
    CATALOG.update(ordered)
    return CATALOG
