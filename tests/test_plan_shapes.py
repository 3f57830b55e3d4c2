"""Physical-plan regression tests — the 100 TB design contract.

Correctness tests prove the small-SF answer; these prove the *plan* is the
one that survives a 1000-executor / 100 TB scale-up:

- filters and column pruning reach the parquet scan (no full-table reads),
- small dimensions broadcast (no shuffle of the fact side for dim joins),
- global top-k plans as TakeOrderedAndProject (no total sort),
- aggregations are partial+final (map-side combine before the shuffle),
- relational/oracle-backed paths stay JVM-side (no row-at-a-time Python).

The reference has no optimizer to test (SURVEY.md §4.1); these pin the
Catalyst behaviors the engine relies on instead of hand-scheduling.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from mapreduce_wsi_spark.plans.registry import load_catalog

CATALOG = load_catalog()


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def build(name: str, spark, sf_dir: str):
    return CATALOG[name].fn(spark, sf_dir)


def test_filter_and_column_pushdown_reach_scan(spark, sf_oracle):
    """Q6: conjunctive filters push to parquet; scan reads only the 4
    referenced columns of lineitem's 10."""
    plan = plan_of(build("q6_forecast_revenue", spark, sf_oracle))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_orderkey" not in read_schema, "column pruning failed"
    assert "l_comment" not in read_schema


def test_dim_joins_broadcast(spark, sf_oracle):
    """Q5: region/nation/supplier/customer dims broadcast — the lineitem
    fact side must never shuffle for a dimension join."""
    plan = plan_of(build("q5_local_supplier_volume", spark, sf_oracle))
    assert plan.count("BroadcastHashJoin") >= 3
    plan7 = plan_of(build("q7_volume_shipping", spark, sf_oracle))
    assert plan7.count("BroadcastHashJoin") >= 4


def test_global_topk_avoids_total_sort(spark, sf_oracle):
    """orderBy().limit(k) must plan as TakeOrderedAndProject (per-partition
    heap + driver merge), not a global Sort + Limit."""
    plan = plan_of(build("topk_global", spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan


def test_vocab_oov_topk_avoids_global_window(spark, sf_oracle):
    """The vocabulary top-k must lower to TakeOrderedAndProject, not an
    unpartitioned row_number window (a single-partition sort over the
    whole distinct-token dictionary)."""
    plan = plan_of(build("text_vocab_oov", spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_agg_is_partial_then_final(spark, sf_oracle):
    """Q1: two HashAggregate nodes (partial before the exchange, final
    after) — map-side combine is what keeps the shuffle O(groups), the
    property MR only gets with an explicit combiner (Runner.java:42-43
    sets none)."""
    plan = plan_of(build("q1_pricing_summary", spark, sf_oracle))
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan
    # partial agg appears before the first Exchange in the formatted tree
    first_exchange = plan.index("Exchange")
    assert "HashAggregate" in plan[:first_exchange] or \
        plan.count("HashAggregate") >= 2


def test_flagship_stays_jvm_side(spark, sf_oracle):
    """The flagship explode->agg pipeline is pure codegen: no Python
    evaluation nodes, and whole-stage codegen spans exist."""
    df = build("flagship_integer_mean", spark, sf_oracle)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan
    # AQE finalizes the physical plan only on execution; the `*(n)` node
    # prefixes in the executed plan mark whole-stage-codegen spans.
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "*(1)" in executed, "no whole-stage codegen span in final plan"


@pytest.mark.parametrize(
    "name", sorted(n for n, e in CATALOG.items() if e.oracle))
def test_no_rowwise_python_in_oracle_paths(name, spark, sf_oracle):
    """Every oracle-backed (relational-surface) query must compile to a
    plan with no row-at-a-time Python UDF — the 10-100x slow path. Arrow
    (`ArrowEvalPython`/`MapInPandas`) nodes are allowed where declared;
    none of the oracle-backed paths need even those today."""
    plan = plan_of(build(name, spark, sf_oracle), "simple")
    assert "BatchEvalPython" not in plan, f"{name} uses row-wise Python"


def test_exchange_reuse_in_multiframe_window(spark, sf_oracle):
    """window_dist_lead uses two frames over the same partition key: the
    plan must contain exactly one shuffle exchange (both frames reuse the
    o_custkey partitioning)."""
    plan = plan_of(build("window_dist_lead", spark, sf_oracle), "simple")
    assert plan.count("Exchange hashpartitioning") == 1


def test_ivf_query_path_is_broadcast_only(spark, sf_oracle):
    """IVF serving: the centroid table and the probe set broadcast; the
    corpus side must never shuffle for a query batch (the 100 TB serving
    contract — corpus-side shuffles would scale with the index, not the
    queries)."""
    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.operators.similarity import (
        build_ivf_index,
        ivf_query,
    )

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    assigned, centroids = build_ivf_index(emb, n_centroids=8)
    df = ivf_query(assigned, centroids, emb.filter(F.col("vec_id") < 5),
                   k=10, n_probe=4)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan  # probes joined to assigned cells
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_probe_side_is_broadcast_only(spark, sf_oracle):
    """IVF-PQ composed serving (r13): same contract as ivf_query — the
    centroid table and the ADC-table-carrying probe set broadcast; the
    code table must never shuffle for a query batch. The one allowed
    wide op on the serve path is the salted shortlist/re-rank pair."""
    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.operators.similarity import (
        build_ivf_index, build_pq_codebooks, ivfpq_query, pq_encode)

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    assigned, centroids = build_ivf_index(emb, n_centroids=8)
    books = build_pq_codebooks(emb, m_subspaces=4, n_codes=16)
    codes = (pq_encode(emb, books)
             .join(assigned.select("vec_id", "__cell"), "vec_id"))
    df = ivfpq_query(assigned, centroids, codes, books, emb,
                     emb.filter(F.col("vec_id") < 5), k=10, n_probe=4)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_filtered_ivfpq_adds_no_exchange(spark, sf_oracle):
    """filter_expr (r14): fusing a metadata predicate into the IVF-PQ
    probe must stay a pure Filter on the code-table side — same
    broadcast-only probe contract, IDENTICAL Exchange count as the
    unfiltered serve (a predicate is never a reason to shuffle), no
    cartesian product, no Python."""
    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.operators.similarity import (
        build_ivf_index, build_pq_codebooks, ivfpq_query, pq_encode)

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    assigned, centroids = build_ivf_index(emb, n_centroids=8)
    books = build_pq_codebooks(emb, m_subspaces=4, n_codes=16)
    codes = (pq_encode(emb, books)
             .join(assigned.select("vec_id", "__cell"), "vec_id")
             .join(emb.select("vec_id", "label"), "vec_id"))
    q = emb.filter(F.col("vec_id") < 5)

    def serve(pred):
        return plan_of(ivfpq_query(assigned, centroids, codes, books,
                                   emb, q, k=10, n_probe=4,
                                   filter_expr=pred))

    unfiltered = serve(None)
    filtered = serve(F.col("label") == 0)
    tree_u = unfiltered.split("\n\n", 1)[0]
    tree_f = filtered.split("\n\n", 1)[0]
    assert tree_f.count("Exchange") == tree_u.count("Exchange")
    assert "CartesianProduct" not in filtered
    assert "BatchEvalPython" not in filtered
    assert "BroadcastHashJoin" in filtered


def test_ivf_assign_is_map_only(spark, sf_oracle):
    """ivf_assign (r14, incremental maintenance): routing a new batch
    to the standing quantizer is ONE whole-stage-codegen projection —
    centroids ride as plan literals, so the tree has no Exchange, no
    join, no aggregate, no Python."""
    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.operators.similarity import (
        build_ivf_index, ivf_assign)

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    _, centroids = build_ivf_index(emb, n_centroids=8)
    plan = plan_of(ivf_assign(emb.filter(F.col("vec_id") % 2 == 1),
                              centroids))
    tree = plan.split("\n\n", 1)[0]
    assert "Exchange" not in tree
    assert "Join" not in tree
    assert "HashAggregate" not in tree
    assert "BatchEvalPython" not in plan
    assert "* Project" in tree  # the projection is codegen'd


def test_minhash_signature_is_single_pass_agg(spark, sf_oracle):
    """MinHash signatures: the k hash-min columns must come from ONE
    hash-aggregate over the shingle table (k aggregate expressions), not
    k passes or a row explosion."""
    from mapreduce_wsi_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    plan = plan_of(minhash_signatures(docs, "text", "doc_id", k=64))
    tree = plan.split("\n\n", 1)[0]  # the operator tree (nodes repeat in
    # the per-node detail sections below it)
    assert tree.count("HashAggregate") == 2  # partial + final, once
    assert tree.count("Exchange") == 1  # one shuffle for the whole build
    assert plan.count("partial_min(xxhash64") == 64  # k mins, one pass


def test_multimodal_payload_never_shuffles(spark, sf_oracle):
    """Featurization before aggregation: the binary payload column must
    not cross an exchange — only the small feature output may shuffle."""
    from mapreduce_wsi_spark.operators.multimodal import (
        decode_features,
        to_blob_table,
    )

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    feats = decode_features(to_blob_table(docs))
    plan = plan_of(feats)
    assert "Exchange" not in plan, "payload bytes crossed a shuffle"
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_embedding_neardup_joins_candidates_by_id(spark, sf_oracle):
    """The LSH self-join must emit id-pairs and re-attach vectors by id —
    the distinct must hash two longs, never float arrays (the measured
    20x trap from round 1)."""
    from mapreduce_wsi_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    plan = plan_of(embedding_near_dup_pairs(emb, min_cos=0.5), "extended")
    # the aggregate that implements .distinct() must group on the two id
    # columns only (no array column in any grouping key)
    import re

    for m in re.finditer(r"HashAggregate\(keys=\[([^\]]*)\]", plan):
        assert "__cv" not in m.group(1) and "__uv" not in m.group(1)


def test_weighted_sample_is_heap_topk_no_shuffle(spark, sf_oracle):
    """ES weighted sampling must lower to TakeOrderedAndProject straight
    over the scan — per-partition k-heaps, no Exchange of the data."""
    tree = plan_of(build("weighted_sample_es", spark, sf_oracle)).split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree
    assert "Exchange" not in tree


def test_bm25_joins_are_broadcast(spark, sf_oracle):
    """BM25: df(term) and corpus stats are tiny aggregates broadcast back
    to the tf rows — never a sort-merge join; the only data-sized
    exchange is the per-doc score sum."""
    tree = plan_of(build("text_bm25_topk", spark, sf_oracle)).split("\n\n")[0]
    assert "SortMergeJoin" not in tree
    assert "BroadcastHashJoin" in tree


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_oracle):
    """Scale feature pin: with runtime bloom-filter injection on, a
    selective dim-side filter produces a bloom_filter_agg on the dim and
    a might_contain probe on the fact side — the fact scan is pruned by
    the dim predicate before the join shuffle. At 100 TB this is the
    difference between shuffling all of lineitem and shuffling only the
    ~matching fraction."""
    from pyspark.sql import functions as F

    saved = {k: spark.conf.get(k, None) for k in (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold")}
    try:
        # shrink thresholds so injection triggers at test SF; force a
        # shuffle join (broadcast joins don't need the bloom filter)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
        o = (spark.read.parquet(f"{sf_oracle}/orders.parquet")
             .filter(F.col("o_orderpriority") == "1-URGENT"))
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        plan = plan_of(j)
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_copurchase_topk_lowers_to_take_ordered(spark, sf_oracle):
    plan = plan_of(build("copurchase_pairs_topk", spark, sf_oracle), "simple")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_winsorize_quantile_table_is_broadcast(spark, sf_oracle):
    """The 5-row p05/p95 table must join back broadcast — a sort-merge
    join here would shuffle the full event scan a second time."""
    plan = plan_of(build("winsorized_sum", spark, sf_oracle), "simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sweep_concurrency_has_no_global_sort(spark, sf_oracle):
    """The two-phase sweep's whole point: the running sum must ride
    (group, day) partitions with a broadcast day-offset join — never a
    single-partition global window."""
    plan = plan_of(build("interval_peak_concurrency", spark, sf_oracle),
                   "simple")
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan


def test_bpe_pretokenize_is_map_only(spark, sf_oracle):
    """GPT-2-style pre-tokenization must be a single JVM-side projection
    over the scan: no shuffle, no Python worker — the shape that pipelines
    into pack/shard stages at 100 TB without a stage boundary."""
    plan = plan_of(build("text_bpe_pretokenize", spark, sf_oracle))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ReadSchema" in plan and "doc_id" in plan


def test_quality_model_gate_is_map_only(spark, sf_oracle):
    """The logistic quality gate must fuse into the scan projection: no
    shuffle, no Python worker — the model coefficients are plan literals,
    so at 100 TB the gate costs one scan."""
    plan = plan_of(build("quality_model_gate", spark, sf_oracle))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_random_projection_is_map_only(spark, sf_oracle):
    """Signed random projection: ±1 matrix as literals, JVM fold dots —
    no shuffle, no Python, and column pruning keeps the scan to
    (vec_id, embedding)."""
    plan = plan_of(build("vector_random_projection", spark, sf_oracle))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "label" not in plan.split("ReadSchema: ", 1)[1].splitlines()[0]


def test_decontam_bloom_prefilter_joins_broadcast(spark, sf_oracle):
    """The Bloom position semi-joins AND the exact verify join must all
    broadcast the (tiny) benchmark side — the corpus never shuffles for
    decontamination."""
    plan = plan_of(build("decontam_bloom_prefilter", spark, sf_oracle))
    assert plan.count("BroadcastHashJoin") >= 3  # 2 bloom semis + verify
    assert "SortMergeJoin" not in plan


def test_temperature_mix_rates_join_broadcast(spark, sf_oracle):
    """Rates come from a dozens-of-rows aggregate and broadcast back —
    the corpus side of the mix must not shuffle for the rate join."""
    plan = plan_of(build("mix_temperature_flatten", spark, sf_oracle))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_url_normalize_is_map_only(spark, sf_oracle):
    """URL canonicalization fuses into the scan: parse_url + sort_array
    are JVM expressions, nothing shuffles."""
    plan = plan_of(build("url_normalize", spark, sf_oracle))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_vocab_oov_membership_join_is_broadcast(spark, sf_oracle):
    """The top-K vocab (K rows) must broadcast into the membership join —
    the token stream is never shuffled BY TOKEN for membership (its only
    token-keyed exchange is the vocab count itself)."""
    plan = plan_of(build("text_vocab_oov", spark, sf_oracle))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semdedup_compares_within_cells_only(spark, sf_oracle):
    """SemDeDup's pair generation must be an equi-join on the k-means
    cell id — an all-pairs cartesian would defeat the whole design."""
    plan = plan_of(build("dedup_semdedup", spark, sf_oracle))
    assert "CartesianProduct" not in plan


def test_pagerank_rounds_join_equi(spark, sf_oracle):
    """Every PageRank round is an equi-join of ranks vs edges plus a
    hash aggregation; the only nested-loop is the broadcast of the
    1-row node-count."""
    plan = plan_of(build("graph_pagerank", spark, sf_oracle))
    assert "CartesianProduct" not in plan


def test_dq_profile_is_single_aggregation_pass(spark, sf_oracle):
    """The column profile must scan orders ONCE: all per-column
    aggregates ride one Expand-based aggregation, then the 1-row result
    unpivots — no per-column scans."""
    plan = plan_of(build("dq_profile_columns", spark, sf_oracle))
    # one scan node: "Scan parquet" appears once in the tree and once as
    # the node-detail header, so count the per-scan Location line instead
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Expand" in plan


def test_zipf_top30_is_take_ordered(spark, sf_oracle):
    """The Zipf top-30 cut lowers to TakeOrderedAndProject over the
    token counts — no dictionary-wide sort or window (the vocab_oov
    lesson, pinned here too); the only rank window runs over 30 rows."""
    plan = plan_of(build("text_zipf_fit", spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_heaps_checkpoints_broadcast(spark, sf_oracle):
    """Heaps'-law checkpoints (10 rows) broadcast into both counting
    joins — the dictionary is never sort-merge-joined or rescanned per
    checkpoint."""
    plan = plan_of(build("text_heaps_law", spark, sf_oracle))
    assert "BroadcastNestedLoopJoin" in plan or \
        "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_covariance_shuffle_carries_partials_only(spark, sf_oracle):
    """The covariance kernel's only corpus-wide stage is the Arrow
    partial pass: every Exchange in the plan sits ABOVE the
    mapInPandas output (O(dim^2) rows per partition), and the margins
    join back broadcast."""
    plan = plan_of(build("embedding_covariance_topk", spark, sf_oracle))
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # the top-k cut


def test_cms_passes_are_codegen_scan_aggs(spark, sf_oracle):
    """Each CMS BUILD pass must stay a codegen'd scan->partial-agg
    pipeline (the measured 2.2x win vs the explode shape): no
    generator node over the corpus. The full entry may explode the
    ~20-row PROBE set (seeds per probe) — that generator is allowed;
    the corpus-side build is checked in isolation."""
    from mapreduce_wsi_spark.operators.evaluation import cms_build

    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet") \
        .select("l_partkey")
    plan = plan_of(cms_build(li, "l_partkey"))
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan
    full = plan_of(build("sketch_cms_frequency", spark, sf_oracle))
    assert "BatchEvalPython" not in full
    assert "BroadcastHashJoin" in full


def test_privacy_hashed_join_has_no_raw_key_exchange(spark, sf_oracle):
    """The privacy join shuffles only the sha256 token column — the
    raw custkey never appears in an Exchange's partitioning
    expression."""
    import re

    plan = plan_of(build("join_privacy_hashed", spark, sf_oracle))
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "custkey" not in m.group(1), m.group(0)


def test_char_entropy_is_map_only_pruned_scan(spark, sf_oracle):
    """The entropy gate must stay scan->project: no generator, no
    Python, read schema pruned to the two used columns. The only
    allowed exchange is the round-robin _spread below the HOF project
    (the interpreted array fold is the whole cost of this operator, and
    the fixture is one input split — without the fan-out it runs on one
    core; at production split counts the spread is a guarded no-op)."""
    import re

    plan = plan_of(build("text_char_entropy", spark, sf_oracle))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", plan)))
    assert n_ex <= 1, "only the pre-HOF round-robin spread"
    if n_ex:
        assert "RoundRobinPartitioning" in plan
        assert "hashpartitioning" not in plan
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan
    assert "lang" not in plan and "source" not in plan  # pruned


def test_dsir_model_joins_are_broadcast(spark, sf_oracle):
    """DSIR's model tables (256-row delta, 1-row totals) join back
    broadcast — the corpus-sized (doc, bucket) frame is never
    sort-merge-joined — and selection lowers to
    TakeOrderedAndProject."""
    plan = plan_of(build("dsir_importance_select", spark, sf_oracle))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or \
        "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_kneser_ney_rollup_has_no_python(spark, sf_oracle):
    """KN scoring stays JVM-side end to end (counts, the fixed IEEE
    probability expression, decimal rounding) — no Python eval node
    anywhere in the plan."""
    plan = plan_of(build("text_kneser_ney_logprob", spark, sf_oracle))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_bpe_learn_argmax_is_take_ordered(spark, sf_oracle):
    """Each BPE round's argmax must lower to TakeOrderedAndProject over
    the pair counts (per-partition heaps + 1-row merge), never a global
    sort of the pair table."""
    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.plans.registry import tbl
    from mapreduce_wsi_spark.operators.text import words

    docs = tbl(spark, sf_oracle, "documents")
    wf = (docs.select(F.explode(words(F.col("text"))).alias("word"))
          .where(F.col("word") != "")
          .groupBy("word").agg(F.count("*").alias("freq"))
          .select(F.split("word", "").alias("toks"), "freq"))
    pairs = (wf.where(F.size("toks") >= 2)
             .select(F.explode(F.arrays_zip(
                 F.slice("toks", 1, F.size("toks") - 1).alias("a"),
                 F.slice("toks", 2, F.size("toks") - 1).alias("b")))
                 .alias("p"), "freq")
             .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
             .agg(F.sum("freq").alias("cnt")))
    plan = plan_of(pairs.orderBy(F.desc("cnt"), "a", "b").limit(1))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_tdigest_build_is_arrow_pass_plus_single_merge(spark, sf_oracle):
    """The t-digest plan: corpus-side work is mapInPandas (centroid
    rows only cross the wire), no sort-merge join anywhere, and the
    exact-anchor join back is broadcast."""
    plan = plan_of(build("sketch_tdigest_quantiles", spark, sf_oracle))
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or \
        "BroadcastHashJoin" in plan


def test_area_resize_has_single_python_stage(spark, sf_oracle):
    """Area downscale: exactly one Arrow python stage (decode +
    block-mean fused in one kernel); the only allowed exchange is the
    round-robin _spread of the narrow TEXT rows below the kernel (the
    single-input-split fan-out) — payload bytes still never shuffle,
    and the md5 projection stays JVM-side."""
    import re

    plan = plan_of(build("mm_resize_area", spark, sf_oracle))
    # one distinct MapInPandas node id (the formatted dump names each
    # node twice: tree + detail section)
    assert len(set(re.findall(r"MapInPandas \((\d+)\)", plan))) == 1
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", plan)))
    assert n_ex <= 1, "only the pre-kernel round-robin spread"
    if n_ex:  # the one exchange must be the round-robin text fan-out
        assert "RoundRobinPartitioning" in plan
        assert "hashpartitioning" not in plan


def test_snm_has_no_block_cardinality_window(spark, sf_oracle):
    """sorted_neighborhood_pairs (r8 rebuild): the blocking pass must
    never funnel through a window partitioned only by the block column
    — block cardinality is bounded (5 langs) at any corpus size, so
    that window caps parallelism at 5 tasks with 41% skew to 'en'
    (measured: 2.06M rows through ONE task at the sf100 probe). The
    plan must carry the range prefix-sum instead: a rangepartitioning
    exchange for the order, windows keyed by the synthetic __sn_pid
    (one per range partition — parallelism tracks data), and position
    equi-joins. A lang-keyed window spec anywhere in the SNM subtree is
    the regression."""
    import re

    # The range exchange itself is invisible here: _snm_pass_pairs
    # pins the sampled layout with iter_checkpoint, and the checkpoint
    # scan truncates the visible plan (same as every iterative op). So
    # pin the two things the final plan CAN show: (1) the rank windows
    # are keyed by the synthetic __sn_pid — one per range partition,
    # parallelism tracks data — and (2) no window anywhere in the tree
    # is keyed by the bounded-cardinality block column.
    plan = plan_of(build("dedup_sorted_neighborhood", spark, sf_oracle))
    specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
    assert specs, "SNM rank windows missing from the plan"
    for spec in specs:
        assert "__sn_pid" in spec, f"block-keyed window: {spec}"
    # and the range partitioner IS in the pre-checkpoint subtree
    from mapreduce_wsi_spark.plans.registry import tbl
    from pyspark.sql import functions as F
    base = tbl(spark, sf_oracle, "documents").select(
        F.col("doc_id").alias("__sn_id"), F.col("lang"),
        F.substring("text", 1, 8).alias("__sn_k"))
    pre = plan_of(base.repartitionByRange("lang", "__sn_k", "__sn_id"))
    assert "rangepartitioning" in pre


def test_percentile_entries_window_over_per_value_aggregates(spark,
                                                             sf_oracle):
    """session_duration_stats / funnel_time_to_convert /
    dq_outlier_iqr (r9 audit): their exact-percentile extraction runs
    a cumsum over the PER-VALUE count aggregate (distinct integer
    seconds/cents — value-domain bounded), never cume_dist over raw
    session/converter/event rows (a single unsplittable window task at
    corpus scale). The per-value form needs no cume_dist at all, so
    its reappearance in these plans IS the regression."""
    for name in ("session_duration_stats", "funnel_time_to_convert",
                 "dq_outlier_iqr"):
        plan = plan_of(build(name, spark, sf_oracle))
        assert "cume_dist" not in plan, (
            f"{name}: cume_dist over raw rows returned")


def test_dup_span_counting_has_no_span_keyed_window(spark, sf_oracle):
    """text_dup_spans / text_strip_dup_spans (r9 audit): corpus-wide
    span counting must be groupBy(span) + join-back, never a count
    window partitioned by span — a window partition is unsplittable,
    so a boilerplate-grade hot span (substring dedup's EXPECTED input)
    buffers every occurrence through one task, while the groupBy
    partial-combines map-side and the join-back is AQE-skew-splittable.
    The regression is any span-keyed windowspecdefinition in either
    plan."""
    import re

    for name in ("text_dup_spans", "text_strip_dup_spans"):
        plan = plan_of(build(name, spark, sf_oracle))
        specs = re.findall(r"windowspecdefinition\(span[^)]*", plan)
        assert not specs, f"{name}: span-keyed window returned: {specs}"


def test_per_group_samplers_use_salted_two_phase_rank(spark, sf_oracle):
    """sample_k_per_group / sample_neyman_allocation (r9 scale audit):
    a rank window partitioned ONLY by the stratum column sorts the
    whole population through |strata| tasks — the bounded-cardinality
    ceiling the SNM rebuild removed (5 langs at any corpus size). Both
    samplers must carry the two-phase form: a phase-1 window keyed by
    (stratum, salt) that prunes to <= salt_count * k survivors before
    the stratum-keyed re-rank. The regression is a plan whose ONLY
    rank window is stratum-keyed."""
    import re

    for name, salt_col in (("sample_k_per_group", "__s"),
                           ("sample_neyman_allocation", "__salt")):
        plan = plan_of(build(name, spark, sf_oracle))
        specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
        assert specs, f"{name}: no window specs in plan"
        assert any(salt_col in s for s in specs), (
            f"{name}: phase-1 salted window missing — plan regressed "
            f"to the single stratum-keyed rank: {specs}")


def test_light_media_kernels_skip_the_spread_exchange(spark, sf_oracle):
    """mm_decode_ppm / mm_decode_wav opted out of the _spread fan-out
    (r8 drift adjudication, SCALE.md: their whole-fixture serial cost
    sits at the Arrow floor, so the round-robin exchange costs more
    than the parallelism recovers) — their plans must be map-only:
    scan -> project -> one Arrow kernel, ZERO exchanges. The heavy
    control (mm_decode_jpeg) must still carry the fan-out at fixture
    split counts."""
    import re

    for name in ("mm_decode_ppm", "mm_decode_wav"):
        plan = plan_of(build(name, spark, sf_oracle))
        assert "Exchange" not in plan, name
        assert len(set(re.findall(r"MapInPandas \((\d+)\)", plan))) == 1

    plan = plan_of(build("mm_decode_jpeg", spark, sf_oracle))
    assert "RoundRobinPartitioning" in plan


def test_link_prediction_topk_is_take_ordered(spark, sf_oracle):
    """graph_link_prediction's top-20 lowers to TakeOrderedAndProject
    (per-partition heap), never a global Sort+Limit over the wedge
    output."""
    plan = plan_of(build("graph_link_prediction", spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan


def test_bitmap_rollup_is_two_level_bitor(spark, sf_oracle):
    """distinct_bitmap_rollup: the word bitmaps aggregate map-side
    (partial bit_or) and no Python stage exists anywhere — the rollup
    must be pure JVM intrinsics."""
    plan = plan_of(build("distinct_bitmap_rollup", spark, sf_oracle))
    assert "bit_or" in plan
    assert "bit_count" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_time_range_frame_single_exchange(spark, sf_oracle):
    """window_time_range_frame: both frame aggregates ride ONE user_id
    exchange (exchange reuse), and the frame is RANGE, not ROWS."""
    plan = plan_of(build("window_time_range_frame", spark, sf_oracle))
    assert plan.count("+- Exchange") == 1
    assert "hashpartitioning(user_id" in plan
    assert "RangeFrame" in plan


def test_point_in_time_is_single_key_exchange_no_theta(spark, sf_oracle):
    """join_point_in_time must run as the union-carry window (shuffles
    keyed on the business key), never a nested-loop/theta join that
    explodes fact x versions."""
    plan = plan_of(build("join_point_in_time", spark, sf_oracle))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_geohash_is_map_only_no_python(spark, sf_oracle):
    """geo_geohash_cells: the 30-term bit-interleave is pure codegen
    expression work — one scan, one small groupBy, zero Python."""
    plan = plan_of(build("geo_geohash_cells", spark, sf_oracle))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_kmeans_assignment_is_exchange_free(spark, sf_oracle):
    """cluster_kmeans_lloyd (VERDICT r7 #1): the in-loop assignment is
    a pure map-side expression — argmin via least() over literal
    (dist, cell) structs — so its plan has ZERO exchanges, no window,
    no join (the r7 form's row_number-over-__id window shuffled the
    full corpus, vectors and all, every round). The returned plan's
    only exchanges are the k-row stats aggregate's hash partition and
    its broadcast — combined partials, never corpus rows."""
    from pyspark.sql import functions as F
    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, _kmeans_assign)
    from mapreduce_wsi_spark.plans.registry import tbl

    emb = tbl(spark, sf_oracle, "embeddings")
    vecs = emb.select(F.col("vec_id").alias("__id"),
                      _as_double(F.col("embedding")).alias("__cv"))
    asg = plan_of(_kmeans_assign(vecs, [(i, [0.1] * 64)
                                        for i in range(8)]))
    assert asg.count("Exchange") == 0
    assert "Window" not in asg and "Join" not in asg

    plan = plan_of(build("cluster_kmeans_lloyd", spark, sf_oracle))
    assert "SortMergeJoin" not in plan and "Window" not in plan
    # the one shuffle: the k-row stats aggregate (combined partials);
    # formatted mode prints each node in tree + detail, hence <= 2
    assert plan.count("Exchange hashpartitioning") <= 2


def test_ntile_bins_is_bucketed_prefix_sum(spark, sf_oracle):
    """window_ntile_bins (VERDICT r9 ask #4): the decile binning must
    carry the bucketed prefix-sum composition — rank windows keyed by
    (priority, price-range bucket), exclusive bucket prefixes broadcast
    back, bin derived arithmetically — and NO ntile window anywhere
    (an ntile over the bare priority key funnels each whole priority
    group through one task). The oracle still runs ntile, so output
    stays bit-identical; this pins the plan shape only."""
    import re

    plan = plan_of(build("window_ntile_bins", spark, sf_oracle))
    assert not re.search(r"ntile\(", plan), "ntile window returned"
    specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
    assert any("__vb" in s for s in specs), (
        f"in-bucket rank window missing: {specs}")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_curriculum_schedule_uses_factored_bucketed_ntile(spark, sf_oracle):
    """mix_curriculum_schedule rides the FACTORED bucketed-prefix-sum
    ntile (operators/pipeline.py::ntile_bucketed — the window_ntile_bins
    recipe promoted to a reusable helper): no ntile window and no rank
    window keyed on the bare source column (20 sources over an unbounded
    corpus is exactly the SNM bounded-keyset defect class); the only
    row-level window is keyed by (source, __vb value bucket), and the
    bucket prefixes/totals come back as broadcasts. The oracle still
    runs ntile(4), so output is bit-identical; this pins plan shape."""
    import re

    plan = plan_of(build("mix_curriculum_schedule", spark, sf_oracle))
    assert not re.search(r"ntile\(", plan), "ntile window returned"
    row_level = re.findall(
        r"row_number\(\) windowspecdefinition\(([^)]*)", plan)
    assert row_level and all("__vb" in s for s in row_level), (
        f"row-level window not bucket-keyed: {row_level}")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_host_pacing_uses_factored_bucketed_ntile(spark, sf_oracle):
    """mix_host_curriculum_pacing (r12): same law as the curriculum
    pin, on the HOST partition key — no ntile window, no rank window
    keyed on the bare host column (hosts are an unbounded keyset in
    production; one hot host must never funnel through one task); the
    only row-level window is (host, __vb value bucket)-keyed and the
    bucket prefixes/per-split totals ride broadcasts. The oracle keeps
    the raw ntile-over-host form, so the algebraic equivalence stays
    driver-checked while this pins the plan."""
    import re

    plan = plan_of(build("mix_host_curriculum_pacing", spark, sf_oracle))
    assert not re.search(r"ntile\(", plan), "ntile window returned"
    row_level = re.findall(
        r"row_number\(\) windowspecdefinition\(([^)]*)", plan)
    assert row_level and all("__vb" in s for s in row_level), (
        f"row-level window not bucket-keyed: {row_level}")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_cdc_chunking_is_map_only_fold_no_window(spark, sf_oracle):
    """dedup_cdc_sentences chunks with ONE map-only SQL aggregate fold
    per document — the plan must contain no Window at all (the naive
    form is posexplode words -> per-doc running-sum window -> re-group,
    three times the shuffled rows) and only hash-aggregate exchanges
    (the first-occurrence groupBy and the per-doc rollup)."""
    plan = plan_of(build("dedup_cdc_sentences", spark, sf_oracle))
    assert "Window" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan \
        or "ShuffledHashJoin" in plan  # the join-back to firsts


def test_weighted_median_windows_over_per_value_aggregates(spark,
                                                           sf_oracle):
    """weighted_median_exact (r10): the running-weight cumsum must run
    over the per-(group, cents) aggregate — value-domain bounded —
    never over raw lineitem rows. The raw-row form is identifiable by
    its tie-break: a window spec ordering on l_orderkey/l_linenumber
    means the window's input is the row stream again."""
    import re

    plan = plan_of(build("weighted_median_exact", spark, sf_oracle))
    specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
    assert specs, "no window specs in plan"
    offenders = [s for s in specs
                 if "l_orderkey" in s or "l_linenumber" in s]
    assert not offenders, (
        f"raw-row running window returned: {offenders}")


def test_rfm_scores_has_no_global_ntile_window(spark, sf_oracle):
    """rfm_scores (r10): the three customer quartiles must come from
    the bucketed prefix-sum ntile — no ntile window (a global ntile
    funnels every customer through ONE task), and every row-level
    window spec keyed by a __vb value bucket."""
    import re

    plan = plan_of(build("rfm_scores", spark, sf_oracle))
    assert not re.search(r"ntile\(", plan), "global ntile window returned"
    row_level = re.findall(
        r"row_number\(\) windowspecdefinition\(([^)]*)", plan)
    assert len(row_level) == 3 and all(
        s.startswith("__vb") for s in row_level), (
        f"row-level windows not bucket-keyed: {row_level}")


def test_cosine_topk_uses_salted_two_phase_rank(spark, sf_oracle):
    """sim_cosine_topk (r10): exact brute-force top-k must rank in two
    phases — phase 1 within (query, salt) cells, phase 2 over the
    <= salt_buckets*k survivors — never one window per query over the
    whole scored corpus (parallelism = |queries| at any corpus size,
    the bounded-keyset ceiling). The regression is a plan whose only
    rank window is query-keyed."""
    import re

    plan = plan_of(build("sim_cosine_topk", spark, sf_oracle))
    row_level = re.findall(
        r"row_number\(\) windowspecdefinition\(([^)]*)", plan)
    assert len(row_level) == 2, f"expected 2 rank phases: {row_level}"
    assert any("__s" in s for s in row_level), (
        f"phase-1 salted window missing: {row_level}")


def test_similarity_stack_rank_windows_are_all_salted(spark, sf_oracle):
    """Every per-query/anchor selection in the similarity stack (exact,
    LSH-ANN, IVF serve, PQ ADC shortlist, hard negatives) rides
    salted_topk: in each operator's plan, every row_number window that
    partitions on the query/anchor key alone must not exist — phase-1
    windows carry the __s salt, and the only unsalted rank windows are
    phase-2 re-ranks over bounded survivors (identified by __r1 having
    pruned before them, i.e. a salted window appears in the same plan).
    Regression = a plan with rank windows but no salted one."""
    import re

    from pyspark.sql import functions as F

    from mapreduce_wsi_spark.operators.similarity import (
        ann_cosine_topk, build_ivf_index, build_pq_codebooks,
        hard_negatives, ivf_query, ivfpq_query, pq_encode, pq_query)

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    plans = {"ann": plan_of(ann_cosine_topk(emb, q, k=10))}
    assigned, centroids = build_ivf_index(emb, n_centroids=8)
    plans["ivf"] = plan_of(ivf_query(assigned, centroids, q, k=10,
                                     n_probe=4))
    books = build_pq_codebooks(emb, m_subspaces=4, n_codes=16)
    codes = pq_encode(emb, books)
    plans["pq"] = plan_of(pq_query(codes, books, emb, q, k=10))
    plans["ivfpq"] = plan_of(ivfpq_query(
        assigned, centroids,
        codes.join(assigned.select("vec_id", "__cell"), "vec_id"),
        books, emb, q, k=10, n_probe=4))
    plans["hardneg"] = plan_of(hard_negatives(emb, q, k=3))
    for name, plan in plans.items():
        row_level = re.findall(
            r"row_number\(\) windowspecdefinition\(([^)]*)", plan)
        assert row_level, f"{name}: no rank windows found"
        assert any("__s" in s for s in row_level), (
            f"{name}: no salted phase-1 rank window: {row_level}")


def test_topp_mass_running_sum_is_bucket_keyed(spark, sf_oracle):
    """topp_mass_cutoff (r10): the per-user running mass must cumsum
    within (event_type, spend-range bucket) windows composed with
    broadcast bucket prefixes — never one sum window per event_type
    over the whole user list (|event_types| tasks at any corpus size).
    The regression marker: a window spec ordering on user_id whose
    partition key lacks the __vb bucket."""
    import re

    plan = plan_of(build("topp_mass_cutoff", spark, sf_oracle))
    specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
    offenders = [s for s in specs
                 if "user_id" in s and "__vb" not in s]
    assert not offenders, (
        f"whole-group running window returned: {offenders}")
    assert any("__vb" in s for s in specs)


def test_quantile_disc_has_no_rowlevel_cume_dist(spark, sf_oracle):
    """quantile_disc (the shared exact-percentile helper, r10): the
    cume_dist window over raw rows is gone from every consumer at once
    — the cumsum runs over the per-(group, value) aggregate. The
    regression is cume_dist anywhere in these plans."""
    for name in ("quantile_disc_exact", "winsorized_sum",
                 "anomaly_zscore_rolling", "batch_length_buckets"):
        plan = plan_of(build(name, spark, sf_oracle))
        assert "cume_dist" not in plan, f"{name}: cume_dist returned"


def test_char_ngram_repetition_is_row_local(spark, sf_oracle):
    """char_ngram_repetition (r14 rewrite, superseding the r11 window
    form): duplicated-gram detection AND the interval union are
    per-document facts, so the whole statistic is one projection over
    the scan — ZERO exchanges, no window, no join, no explode. The
    regression markers are any Exchange / Window / Generate node, or a
    collect_list buffer, reappearing in the plan."""
    plan = plan_of(build("text_char_ngram_repetition", spark, sf_oracle))
    assert "collect_list" not in plan, "position buffer returned"
    for node in ("Exchange", "Window", "Generate", "Join"):
        assert node not in plan, f"{node} returned — row-local form lost"


def test_r11_per_group_selections_are_salted(spark, sf_oracle):
    """web_host_crawl_budget (hosts are the classic crawl skew key) and
    embedding_quantization_recall's two per-query top-10 selections
    must carry the salted two-phase rank — a phase-1 window keyed by
    (group, __s salt) pruning to <= salt_buckets * k before the
    group-keyed re-rank. Regression = only group-keyed rank windows."""
    import re

    for name in ("web_host_crawl_budget", "embedding_quantization_recall"):
        plan = plan_of(build(name, spark, sf_oracle))
        specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
        assert specs, f"{name}: no window specs in plan"
        assert any("__s" in s for s in specs), (
            f"{name}: phase-1 salted window missing: {specs}")


def test_cdc_cross_snapshot_has_no_pairwise_join(spark, sf_oracle):
    """dedup_cdc_cross_snapshot: the old snapshot collapses to DISTINCT
    chunk hashes before one hash-equi join — the plan must contain no
    cartesian/nested-loop pairing and the join side must be the
    aggregated hash set (HashAggregate feeding the join), never
    doc x doc."""
    plan = plan_of(build("dedup_cdc_cross_snapshot", spark, sf_oracle))
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan  # the distinct-hash collapse
