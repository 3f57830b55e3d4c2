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
    (see normalize_event_ts)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_event_ts(raw)


# The driver's correctness gate scores the FIRST 50 catalog entries in
# registration order. This list pins that window to one-plus
# representative per operator family — TPC-H spine, every agg flavor,
# joins (incl. the custom as-of), windows/sessionize, top-k, grouping
# sets, set ops, pivot/unpivot/explode, null semantics, scalar function
# families, streaming, pandas UDAF + Arrow mapInPandas, the flagship
# reference workload, dedup (exact/jaccard/minhash/components),
# similarity (exact/IVF/near-dup), text analysis, multimodal (blob meta +
# real PPM decode), the LLM-pipeline ops, and the round-3 families
# (lakehouse MERGE, recursive hierarchy, Python UDTF, multi-grain
# rollup) — so every family carries a driver-issued green stamp, not
# just the local replay's.
# tests/test_driver_window.py pins both the order and the family coverage.
DRIVER_WINDOW: tuple[str, ...] = (
    # TPC-H spine + aggregation families (string_agg_sorted /
    # histogram_fixed_buckets moved past the window in round 3 to make
    # room for the behavioral-analytics family; still replay-verified)
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "merge_upsert_cdc", "agg_distinct_counts", "var_std_exact",
    "argmax_per_group", "funnel_steps", "interval_peak_concurrency",
    "approx_distinct_hll", "hierarchy_roots_depth",
    # joins (incl. custom as-of)
    "join_left_outer_counts", "join_semi", "join_asof_last_error",
    # windows / sessionization / top-k
    "window_rank_lag", "sessionize_lag_cumsum", "udtf_chunk_text",
    "topk_global",
    # grouping sets / set ops / reshape
    "grouping_sets_agg", "set_union", "pivot_qty", "unpivot_part",
    "explode_words_ordinal", "null_semantics",
    # scalar function families
    "scalar_string_funcs", "scalar_date_funcs", "time_rollup_multigrain",
    "json_typed_struct", "array_higher_order", "map_funcs",
    # streaming (batch twins of the Structured Streaming plans)
    "stream_tumbling_window", "stream_session_window",
    # UDF surfaces + reference flagship workload
    "udaf_pandas_integer_mean", "flagship_integer_mean",
    "flagship_arrow_pandas",
    # LLM pipeline: dedup family
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_components",
    # LLM pipeline: similarity search
    "sim_cosine_topk", "sim_ann_ivf", "sim_embedding_neardup",
    # LLM pipeline: text analysis
    "text_token_stats", "text_quality",
    # LLM pipeline: multimodal (incl. the real PPM decoder)
    "mm_blob_meta", "mm_decode_ppm",
    # LLM pipeline: corpus preparation
    "split_hash_deterministic", "quantile_disc_exact", "global_ids_dense",
    "pipeline_prepare_corpus",
)


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
