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
# driver evidence grows instead of re-stamping the same 50. Rounds 1-6
# stamped 208 distinct entries green — every pre-r6 entry. This
# round's window = the 5 fixed sentinels (cross-round regression
# canaries) + ALL 30 never-stamped r6 additions + 15 entries ADDED
# THIS ROUND (stamped in the same round they ship, so no backlog
# accrues). The fresh queue exceeds the 45 non-sentinel slots, so the
# staleness pad SHRINKS TO ZERO per its own rule; r7 entries
# registered after the rotation (mm_edge_sobel onward — see
# COVERAGE.md) head the r8 queue. A green round lifts cumulative
# driver coverage to 253 of the catalog.
# tests/test_driver_window.py pins the order, asserts the rotation
# hygiene (non-sentinel, non-pad entries must be never-stamped), and
# checks family coverage over the CUMULATIVE stamped set.
ROUND = 7  # current build round; CORRECTNESS_r{<ROUND}.json are priors

# staleness re-checks: previously stamped (allowed to repeat). The pad
# exists only when free slots remain after covering never-stamped
# entries and SHRINKS FIRST. This round the fresh queue is 30 r6 + 16
# r7 = 46 for 45 slots, so the pad is empty; the round-2-vintage
# re-checks it carried earlier in r7 move to the r8 pad candidates
# ("above_avg_balance", "distinct_rows", "histogram_fixed_buckets",
# "q10_returned_items", "q12_late_shipment" — still the oldest stamps).
WINDOW_STALENESS_PAD: tuple[str, ...] = ()

DRIVER_WINDOW: tuple[str, ...] = (
    # sentinels (driver-stamped every round; regression canaries)
    "q1_pricing_summary", "flagship_integer_mean", "merge_upsert_cdc",
    "dedup_components", "funnel_steps",
    # r6 additions: data selection / sketches / tokenizer training
    "dsir_importance_select", "sketch_tdigest_quantiles",
    "sketch_cms_frequency", "text_bpe_learn", "text_bpe_learn_apply",
    # r6 text-statistics tail
    "text_kneser_ney_logprob", "text_char_entropy", "text_zipf_fit",
    "text_heaps_law", "text_nfc_normalize", "text_bigram_pmi",
    # r6 embedding linear algebra
    "embedding_pca_power", "embedding_covariance_topk",
    # r6 evaluation family
    "eval_group_auc", "eval_cohens_kappa", "eval_retrieval_metrics",
    "eval_calibration_curve", "eval_confusion_f1",
    "hist_equiwidth_prices", "sample_reservoir_per_key",
    # r6 sources / joins
    "source_orc_roundtrip", "join_privacy_hashed",
    # r6 codecs + media ops
    "mm_decode_jpeg_progressive", "mm_decode_png_adam7",
    "mm_decode_bmp_rle8", "mm_decode_tiff", "mm_decode_wav_adpcm",
    "mm_decode_gif_interlaced", "mm_decode_ok_rate", "mm_resize_area",
    # r7 additions (stamped the round they ship)
    "eval_log_loss_brier", "eval_spearman_corr",
    "eval_average_precision", "eval_kendall_tau", "agg_skew_kurtosis",
    "text_perplexity_buckets", "text_hashed_tfidf",
    "mm_decode_tga", "mm_decode_qoi", "sim_mmr_diversify",
    "text_winnow_fingerprint", "text_gopher_repetition",
    "text_mattr_diversity", "pipeline_chunk_overlap", "mm_video_frames",
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
    ordered = {name: CATALOG[name] for name in DRIVER_WINDOW}
    for name, e in CATALOG.items():
        if name not in ordered:
            ordered[name] = e
    CATALOG.clear()
    CATALOG.update(ordered)
    return CATALOG
