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
# driver evidence grows instead of re-stamping the same 50. Rounds 1-11
# stamped the ENTIRE 426-entry r11 catalog green (cumulative 426/426,
# r11 50/50). r12 continues the COVERAGE.md growth policy (<=45
# net-new per round, minus the re-queued staleness slots): the r12
# tranche adds exactly 15 entries (plans/q_round12.py — the declared
# r12 queue, complete: the whole-slide-image TIFF surface stamped
# [tiled/LZW/Deflate/predictor rotation, pyramid page reads, IFD-chain
# inventory], three-way snapshot chains for NEAR-dup first-seen
# attribution at doc and CLUSTER level, n-gram crawl-novelty decay,
# CDC chunk-size audit, distillation calibration + threshold sweep,
# per-host curriculum pacing, epoch-repeat budgeting, IVF n_probe
# recall + cell balance, plus JPEG-in-TIFF Compression 7 — the
# Aperio-SVS layout, single-IFD and full JPEG-coded pyramid), so this
# window = 5 sentinels + 15
# never-stamped + the 30-slot oldest-stamp pad (the r2-vintage
# staleness re-checks VERDICT r11 queued).
# tests/test_driver_window.py pins the order, asserts the rotation
# hygiene (non-sentinel, non-pad entries must be never-stamped),
# recomputes the pad MECHANICALLY (oldest latest-stamp first, name
# tie-break — VERDICT r10 ask #5), and checks family coverage over the
# CUMULATIVE stamped set.
ROUND = 12  # current build round; CORRECTNESS_r{<ROUND}.json are priors

# staleness re-checks: previously stamped (allowed to repeat). The pad
# fills the free slots left after every never-stamped entry is
# windowed, picking the entries whose LATEST green stamp is oldest
# (ties broken by name) — exactly the five round-2-vintage entries
# that re-queued when the r10 session-2 tranche squeezed the pad to
# zero. test_driver_window.py::test_pad_is_exactly_the_oldest_stamps
# recomputes this from CORRECTNESS_r*.json, so the pad can never be
# hand-picked.
WINDOW_STALENESS_PAD: tuple[str, ...] = (
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q17_small_quantity_revenue", "q18_large_volume_customer",
    "q19_disjunctive_pred", "q21_waiting_supplier",
    "q22_global_sales_opportunity", "q4_order_priority",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "set_except", "set_except_all",
    "set_intersect_all", "string_agg_sorted", "top_supplier_per_nation",
    "agg_distinct_counts", "approx_distinct_hll", "argmax_per_group",
    "array_higher_order", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "explode_words_ordinal",
    "flagship_arrow_pandas", "global_ids_dense", "grouping_sets_agg",
    "hierarchy_roots_depth",
)

DRIVER_WINDOW: tuple[str, ...] = (
    # sentinels (driver-stamped every round; regression canaries)
    "q1_pricing_summary", "flagship_integer_mean", "merge_upsert_cdc",
    "dedup_components", "funnel_steps",
    # r12 tranche (plans/q_round12.py), registration order:
    # whole-slide-image TIFF surface (VERDICT r11 missing #2)
    "mm_decode_tiff_tiled", "mm_decode_tiff_pyramid",
    "mm_tiff_pyramid_meta",
    # three-way snapshot chains / crawl novelty / CDC audit
    "dedup_chain_minhash_first_seen", "dedup_chain_cluster_first_seen",
    "text_ngram_novelty_decay", "dedup_cdc_chunk_size_audit",
    # distillation calibration
    "quality_distill_calibration", "quality_distill_threshold_sweep",
    # per-host pacing / epoch budgeting
    "mix_host_curriculum_pacing", "mix_epoch_token_budget",
    # ANN serving audits
    "sim_ann_ivf_nprobe_recall", "embedding_ivf_cell_balance",
    # JPEG-in-TIFF (Compression 7) and the full SVS shape (JPEG-coded
    # chained-IFD pyramid) — added after the tranche shipped; each
    # displaces the newest pad slot per the mechanical rule
    "mm_decode_tiff_jpeg", "mm_decode_tiff_svs",
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
    import mapreduce_wsi_spark.plans.q_round12  # noqa: F401
    import mapreduce_wsi_spark.plans.q_round13  # noqa: F401
    ordered = {name: CATALOG[name] for name in DRIVER_WINDOW}
    for name, e in CATALOG.items():
        if name not in ordered:
            ordered[name] = e
    CATALOG.clear()
    CATALOG.update(ordered)
    return CATALOG
