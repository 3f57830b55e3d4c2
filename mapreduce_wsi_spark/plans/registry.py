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
# driver evidence grows instead of re-stamping the same 50. Rounds 1-4
# stamped 128 distinct entries green. This round's window = the 5 fixed
# sentinels (cross-round regression canaries) + 45 never-stamped
# entries (the full r4 backlog plus the oldest-queued r5 additions —
# the staleness pad was reclaimed because the fresh queue exceeds the
# free slots; see WINDOW_STALENESS_PAD). A green round lifts cumulative
# driver coverage to 173 of the 208 registered entries; the remaining
# 35 never-stamped r5 additions (verified by set arithmetic in
# tests/test_driver_window.py and listed by COVERAGE.md's queue note)
# fit the r6 window with 10 slots to spare for staleness re-checks.
# tests/test_driver_window.py pins the order, asserts the rotation
# hygiene (non-sentinel, non-pad entries must be never-stamped), and
# checks family coverage over the CUMULATIVE stamped set.
ROUND = 5  # current build round; CORRECTNESS_r{<ROUND}.json are priors

# staleness re-checks: previously stamped (allowed to repeat). The pad
# exists only when free slots remain after covering never-stamped
# entries and SHRINKS FIRST — with the r5 second tranche the fresh
# queue (19) exceeds the free slots, so the pad is empty this round and
# its two slots went to the oldest-queued fresh entries instead
WINDOW_STALENESS_PAD: tuple[str, ...] = ()

DRIVER_WINDOW: tuple[str, ...] = (
    # sentinels (driver-stamped every round; regression canaries)
    "q1_pricing_summary", "flagship_integer_mean", "merge_upsert_cdc",
    "dedup_components", "funnel_steps",
    # exact/robust statistics tail
    "quantile_cont_exact", "agg_exact_stats", "weighted_median_exact",
    "robust_mad_stats", "ols_trend_per_type",
    # window variants
    "window_dist_lead", "window_ntile_bins",
    # relational/analytic leftovers
    "time_spine_gapfill", "yoy_revenue_growth", "share_of_total",
    "skew_key_diagnostics", "rare_terms_df",
    # lakehouse/dq leftovers
    "upsert_merge", "dq_constraints", "table_fingerprint",
    "incremental_agg_merge",
    # scalar-function tail
    "scalar_math_funcs", "scalar_conditional", "json_extract",
    "array_funcs", "scalar_string_funcs2", "scalar_datetime_funcs2",
    "scalar_hash_bitwise",
    # sketch + vector tail
    "hll_sketch_rollup", "vector_normalize",
    # corpus-prep leftover
    "mix_sources_epochs",
    # r4 post-window additions
    "dedup_components_star", "text_bpe_pretokenize",
    "mm_decode_features", "mm_features_real", "mm_resize_real", "mm_resize",
    # r5 additions: real PNG + baseline-JPEG decoders, audio frame
    # features, perceptual-hash image near-dup, substring-level dedup,
    # temperature mixing, Bloom decontam, random projection, the
    # stream-stream join twin, and the model quality gate
    "mm_decode_png", "mm_decode_jpeg",
    "mm_audio_frames", "mm_image_dhash", "mm_image_neardup",
    "text_dup_spans", "decontam_bloom_prefilter", "mix_temperature_flatten",
    "vector_random_projection", "stream_stream_join", "quality_model_gate",
    # reclaimed pad slots: the two oldest-queued never-stamped r5
    # additions (stream-stream left-outer twin, nearest-direction as-of)
    "stream_stream_left_outer", "join_asof_nearest",
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
    import mapreduce_wsi_spark.plans.q_graph  # noqa: F401
    ordered = {name: CATALOG[name] for name in DRIVER_WINDOW}
    for name, e in CATALOG.items():
        if name not in ordered:
            ordered[name] = e
    CATALOG.clear()
    CATALOG.update(ordered)
    return CATALOG
