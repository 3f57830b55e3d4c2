"""Round-14 catalog tranche — the VERDICT r13 asks #2 and #3:

- FILTERED IVF-PQ serving (`sim_ann_ivfpq_filtered`): the metadata
  predicate fused into the probe — "top-k WHERE label<n" — with the
  starvation/truncation decomposition measured on a selectivity x
  n_probe grid: a starved shortlist (filtered pool <= shortlist)
  degenerates EXACTLY to the filtered routing ceiling, full-probe
  starved serve is EXACT, and a pool >> shortlist at full probe makes
  ADC truncation the binding loss;
- INCREMENTAL ANN index maintenance (`sim_ann_ivf_incremental`):
  a new vector batch discovered through the lakehouse incremental
  file manifest is assigned to the STANDING coarse quantizer
  (ivf_assign — no retrain) and encoded with the STANDING PQ
  codebooks, the union serves through the stamped ivfpq path, and
  codebook-staleness drift is priced by pq_reconstruction_error
  (standing vs retrained books on the new batch, panel-bounded).

Reference parity note: neither exists in the reference
(acgessler/mapreduce-wsi) — its only analytics surface is
user-supplied map/reduce code behind runMapReduce (MapReduceWSI.java:
61-105). North-star surface, Spark-first, DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_wsi_spark.plans.registry import register, tbl

# ---------------------------------------------------------------------------
# A. Filtered ANN: the RAG serving query (VERDICT r13 ask #2)
# ---------------------------------------------------------------------------

# (n_labels, n_probe, recall lo_pct) — bounds pinned from sf0.01
# measurement (38.5 / 100 / 27 / 78.5 %; the dropped (1,8) midpoint
# measured 70.5 on the same sweep) with ~2x margin; filter =
# label < n_labels (~10% / ~50% selectivity on the 10-class fixture),
# 16 cells, shortlist 50, 20-query panel, k=10.
_FILTERED_GRID = ((1, 4, 18), (1, 16, 50),
                  (5, 2, 13), (5, 16, 39))

_N_CELLS = 16
_SHORTLIST = 50


def _filtered_exact_sql(n_labels: int) -> str:
    """Exact filtered-cosine top-10 truth for filter label<n_labels —
    the corpus side filtered, the query panel NOT (a RAG query
    constrains the corpus, not itself)."""
    return f"""
    (SELECT q.vec_id AS qid, c.vec_id AS cid,
            row_number() OVER (PARTITION BY q.vec_id ORDER BY
                list_dot_product(q.v, c.v)
                / (sqrt(list_dot_product(q.v, q.v))
                   * sqrt(list_dot_product(c.v, c.v))) DESC,
                c.vec_id) AS rn
     FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 20) q
     CROSS JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings
                 WHERE vec_id < 500 AND label < {n_labels}) c
     WHERE c.vec_id <> q.vec_id)"""


@register(
    "sim_ann_ivfpq_filtered",
    oracle=f"""
    WITH {", ".join(
        f'''t{n} AS (SELECT count(*) AS ne FROM {_filtered_exact_sql(n)}
                     x WHERE rn <= 10)'''
        for n in sorted({n for n, _, _ in _FILTERED_GRID}))},
    cfg AS (SELECT CAST(t.nl AS INT) AS n_labels,
                   CAST(t.np AS INT) AS n_probe
            FROM (VALUES {", ".join(f"({nl}, {np})"
                                    for nl, np, _ in _FILTERED_GRID)})
                 t(nl, np))
    SELECT n_labels, n_probe,
           CAST(CASE WHEN n_labels = 1 THEN (SELECT ne FROM t1)
                ELSE (SELECT ne FROM t5) END AS BIGINT) AS n_exact,
           true AS recall_ok, true AS degenerate_ok, true AS exact_ok,
           true AS trunc_ok
    FROM cfg
    """,
    note="FILTERED IVF-PQ serving (VERDICT r13 ask #2 — the 'top-k "
         "WHERE lang=en' RAG query every production vector search "
         "runs): the label<n_labels predicate prunes the CODE TABLE "
         "before the cell probe (filter_expr on ivfpq_query — at "
         "100 TB it reaches the code-table scan, so non-matching "
         "codes never enter the ADC race), measured on a selectivity "
         "x n_probe grid vs exact filtered-cosine truth. The "
         "DECOMPOSITION is the point: (a) degenerate_ok — whenever "
         "the in-plan filtered pool (max per-query filtered "
         "candidates in probed cells) is <= shortlist, the shortlist "
         "is starved, ADC truncation vanishes, and the filtered PQ "
         "result must equal the exact-rescored filtered-IVF ceiling "
         "ROW FOR ROW (a theorem, so fixture regeneration cannot "
         "redden it); (b) exact_ok — full probe + starved pool must "
         "be EXACT (routing covers every cell); (c) trunc_ok — full "
         "probe with pool >= 3x shortlist must LOSE >= 5 recall pts "
         "to ADC truncation (measured 21.5 at sf0.01): the filtered "
         "twin of the adaptive-shortlist capacity rule — under "
         "selective filters, recall comes from MORE PROBES, not a "
         "longer shortlist. recall_ok bounds 18/50/13/39 (~2x "
         "margin under measured 38.5/100/27/78.5; the probe-recovery "
         "midpoint (1,8) measured 70.5 on the same sweep) "
         "(operators/similarity.py::ivfpq_query filter_expr)")
def sim_ann_ivfpq_filtered(spark, sf_dir):
    from pyspark.sql import Window
    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, build_ivf_index, build_pq_codebooks, cosine,
        ivf_query, ivfpq_query, pq_encode, salted_topk)
    from mapreduce_wsi_spark.util import iter_checkpoint

    emb = (tbl(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") < 500))
    c = emb.select("vec_id", "label",
                   _as_double(F.col("embedding")).alias("v"))
    qs = (c.filter(F.col("vec_id") < 20)
          .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    assigned, centroids = build_ivf_index(
        emb, "vec_id", "embedding", n_centroids=_N_CELLS, seed=42)
    books = build_pq_codebooks(emb, m_subspaces=8, n_codes=16)
    # checkpointed: every grid row's serve + pool audit reads this
    # table, and the checkpoint cuts the repeated encode+join subplan
    # out of the 4-branch union (panel-sized, the grid-entry pattern)
    codes = iter_checkpoint(
        pq_encode(emb, books)
        .join(assigned.select("vec_id", "__cell"), "vec_id")
        .join(emb.select("vec_id", "label"), "vec_id"))
    asg = assigned.join(emb.select("vec_id", "label"), "vec_id")
    queries = emb.filter(F.col("vec_id") < 20)

    # query -> probed cells (ivf_query's own routing block, re-derived
    # here to measure the filtered candidate pool the serve path sees);
    # checkpointed at max probe depth (20 x 16 rows), filtered per row
    q = queries.select(F.col("vec_id").alias("qid"),
                       _as_double(F.col("embedding")).alias("__qv"))
    w_probe = Window.partitionBy("qid").orderBy(
        F.col("__qc").desc(), F.col("cell").asc())
    probe_all = iter_checkpoint(
        q.crossJoin(F.broadcast(centroids))
        .withColumn("__qc", cosine(F.col("__qv"), F.col("centroid")))
        .withColumn("__pr", F.row_number().over(w_probe))
        .select("qid", "cell", "__pr"))

    truth: dict[int, object] = {}
    cell_counts: dict[int, object] = {}
    for nl in sorted({n for n, _, _ in _FILTERED_GRID}):
        ex = (qs.crossJoin(F.broadcast(c.filter(F.col("label") < nl)))
              .filter(F.col("vec_id") != F.col("qid"))
              .select("qid", F.col("vec_id").alias("cid"),
                      cosine(F.col("qv"), F.col("v")).alias("s")))
        top = iter_checkpoint(
            salted_topk(ex, "qid",
                        [F.col("s").desc(), F.col("cid")], "cid",
                        k=10)
            .select("qid", "cid"))
        truth[nl] = (top, top.agg(F.count(F.lit(1)).alias("ne")))
        cell_counts[nl] = iter_checkpoint(
            codes.filter(F.col("label") < nl).groupBy("__cell")
            .agg(F.count(F.lit(1)).alias("__cn")))

    rows = None
    for nl, np_, lo_pct in _FILTERED_GRID:
        pred = F.col("label") < nl
        top_ex, n_exact = truth[nl]
        # the filtered pool each query's probe actually admits
        pool = (probe_all.filter(F.col("__pr") <= np_)
                .select("qid", F.col("cell").alias("__cell"))
                .join(F.broadcast(cell_counts[nl]), "__cell")
                .groupBy("qid").agg(F.sum("__cn").alias("__pool"))
                .agg(F.max("__pool").alias("max_pool")))
        got = (ivfpq_query(assigned, centroids, codes, books, emb,
                           queries, k=10, n_probe=np_,
                           shortlist=_SHORTLIST, filter_expr=pred)
               .select(F.col("query_id").alias("qid"),
                       F.col("vec_id").alias("cid")))
        ceil = (ivf_query(asg, centroids, queries, k=10, n_probe=np_,
                          filter_expr=pred)
                .select(F.col("query_id").alias("qid"),
                        F.col("vec_id").alias("cid")))
        found = got.join(top_ex, ["qid", "cid"]).agg(
            F.count(F.lit(1)).alias("__found"))
        npq = got.agg(F.count(F.lit(1)).alias("__npq"))
        nivf = ceil.agg(F.count(F.lit(1)).alias("__nivf"))
        olap = got.join(ceil, ["qid", "cid"]).agg(
            F.count(F.lit(1)).alias("__olap"))
        starved = F.col("max_pool") <= F.lit(_SHORTLIST)
        row = (found.crossJoin(F.broadcast(n_exact))
               .crossJoin(F.broadcast(npq))
               .crossJoin(F.broadcast(nivf))
               .crossJoin(F.broadcast(olap))
               .crossJoin(F.broadcast(pool))
               .select(
                   F.lit(nl).cast("int").alias("n_labels"),
                   F.lit(np_).cast("int").alias("n_probe"),
                   F.col("ne").cast("bigint").alias("n_exact"),
                   (F.col("__found") * 100 >= F.lit(lo_pct)
                    * F.col("ne")).alias("recall_ok"),
                   (~starved
                    | ((F.col("__olap") == F.col("__npq"))
                       & (F.col("__npq") == F.col("__nivf"))))
                   .alias("degenerate_ok"),
                   (F.lit(np_ < _N_CELLS) | ~starved
                    | (F.col("__found") == F.col("ne")))
                   .alias("exact_ok"),
                   (F.lit(np_ < _N_CELLS)
                    | (F.col("max_pool") < F.lit(3 * _SHORTLIST))
                    | ((F.col("ne") - F.col("__found")) * 100
                       >= 5 * F.col("ne"))).alias("trunc_ok")))
        rows = row if rows is None else rows.unionByName(row)
    return rows


# ---------------------------------------------------------------------------
# B. Incremental ANN index maintenance (VERDICT r13 ask #3)
# ---------------------------------------------------------------------------

# (n_probe, recall lo_pct, new_served lo_pct) — sf0.01 measured
# 44.5%/57% recall and 37%/41.5% new-id share of returned rows
# (96/200 truth rows are new); ~2x margin.
_INCR_GRID = ((4, 22, 18), (8, 28, 20))


@register(
    "sim_ann_ivf_incremental",
    oracle=f"""
    WITH ex AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                row_number() OVER (PARTITION BY q.vec_id ORDER BY
                    list_dot_product(q.v, c.v)
                    / (sqrt(list_dot_product(q.v, q.v))
                       * sqrt(list_dot_product(c.v, c.v))) DESC,
                    c.vec_id) AS rn
         FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 20) q
         CROSS JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings WHERE vec_id < 500) c
         WHERE c.vec_id <> q.vec_id),
    counts AS (SELECT
        CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_standing,
        CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_new
        FROM embeddings WHERE vec_id < 500),
    truth AS (SELECT count(*) AS ne FROM ex WHERE rn <= 10),
    cfg AS (SELECT CAST(t.np AS INT) AS n_probe
            FROM (VALUES {", ".join(f"({np})"
                                    for np, _, _ in _INCR_GRID)}) t(np))
    SELECT n_probe, counts.n_standing, counts.n_new,
           CAST(truth.ne AS BIGINT) AS n_exact,
           true AS recall_ok, true AS new_served_ok, true AS drift_ok
    FROM cfg CROSS JOIN counts CROSS JOIN truth
    """,
    note="INCREMENTAL ANN index maintenance (VERDICT r13 ask #3): the "
         "new-vector batch arrives through the LAKEHOUSE INCREMENTAL "
         "MANIFEST (even vec_ids land and are recorded in the "
         "processed-file manifest; odd vec_ids append; "
         "incremental_new_files reads ONLY the new files — the "
         "lakehouse_incremental_files x build_ivf_index composition), "
         "is assigned to the STANDING coarse quantizer by ivf_assign "
         "(map-only argmin vs centroid literals — no retrain, proven "
         "identical to the build's own KMeans.transform rule) and "
         "encoded with the STANDING PQ codebooks (pq_encode, map-"
         "only), and the standing+new union serves through the "
         "stamped ivfpq path — the standing CODE TABLE is never "
         "rewritten, the new codes are a separate appendable table "
         "(at 100 TB: the daily batch costs O(new batch), zero "
         "touch of the standing index). recall_ok bounds 22/28 "
         "(measured 44.5/57 at n_probe 4/8 — at parity with the "
         "from-scratch index's 42% at the same scale); new_served_ok "
         "pins that >= 18/20% of returned rows are NEW ids (measured "
         "37/41.5 — new vectors are genuinely servable); drift_ok "
         "prices codebook staleness: mean pq_reconstruction_error of "
         "the new batch under standing books <= 2x retrained-on-"
         "union books (measured 1.16x) "
         "(operators/similarity.py::ivf_assign, "
         "pq_reconstruction_error; operators/lakehouse.py::"
         "incremental_new_files)")
def sim_ann_ivf_incremental(spark, sf_dir):
    from mapreduce_wsi_spark.operators.lakehouse import (
        incremental_new_files)
    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, build_ivf_index, build_pq_codebooks, cosine,
        ivf_assign, ivfpq_query, pq_encode, pq_reconstruction_error,
        salted_topk)
    from mapreduce_wsi_spark.util import scratch_dir

    emb = (tbl(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") < 500))

    # the manifest composition: standing batch lands, manifest records
    # its files, the new batch appends, the incremental read sees ONLY
    # the new files (file-path pruning at the scan)
    base = scratch_dir("incr_ann", sf_dir)
    emb.filter(F.col("vec_id") % 2 == 0).write.parquet(
        base, mode="overwrite")
    manifest = (spark.read.parquet(base)
                .select(F.input_file_name().alias("f")).distinct())
    processed = [r["f"] for r in manifest.collect()]
    emb.filter(F.col("vec_id") % 2 == 1).write.parquet(
        base, mode="append")
    standing = (spark.read.parquet(base)
                .filter(F.input_file_name().isin(processed)))
    new = incremental_new_files(spark, base, processed)

    # standing index: built once, never touched again
    assigned_o, centroids = build_ivf_index(
        standing, "vec_id", "embedding", n_centroids=16, seed=42)
    books = build_pq_codebooks(standing, m_subspaces=8, n_codes=16)
    codes_o = (pq_encode(standing, books)
               .join(assigned_o.select("vec_id", "__cell"), "vec_id"))

    # incremental maintenance: assign + encode the new batch only.
    # The union code table is checkpointed — both serve rows read it,
    # and at scale it is exactly the standing table + the appended
    # new-batch files (never a rewrite)
    from mapreduce_wsi_spark.util import iter_checkpoint
    assigned_n = ivf_assign(new, centroids)
    codes_n = (pq_encode(new, books)
               .join(assigned_n.select("vec_id", "__cell"), "vec_id"))
    codes_u = iter_checkpoint(codes_o.unionByName(codes_n))
    assigned_u = assigned_o.unionByName(assigned_n)

    queries = emb.filter(F.col("vec_id") < 20)
    c = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    qs = (c.filter(F.col("vec_id") < 20)
          .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    ex = (qs.crossJoin(F.broadcast(c))
          .filter(F.col("vec_id") != F.col("qid"))
          .select("qid", F.col("vec_id").alias("cid"),
                  cosine(F.col("qv"), F.col("v")).alias("s")))
    top_ex = iter_checkpoint(
        salted_topk(ex, "qid",
                    [F.col("s").desc(), F.col("cid")], "cid",
                    k=10)
        .select("qid", "cid"))
    n_exact = top_ex.agg(F.count(F.lit(1)).alias("ne"))
    n_std = standing.agg(F.count(F.lit(1)).alias("ns"))
    n_new = new.agg(F.count(F.lit(1)).alias("nn"))

    # codebook-staleness drift, computed once (shared by both rows)
    books_r = build_pq_codebooks(emb, m_subspaces=8, n_codes=16)
    drift = (pq_reconstruction_error(new, books)
             .agg(F.avg("__rerr").alias("e_standing"))
             .crossJoin(F.broadcast(
                 pq_reconstruction_error(new, books_r)
                 .agg(F.avg("__rerr").alias("e_retrained")))))

    rows = None
    for np_, lo_pct, served_lo in _INCR_GRID:
        got = (ivfpq_query(assigned_u, centroids, codes_u, books, emb,
                           queries, k=10, n_probe=np_)
               .select(F.col("query_id").alias("qid"),
                       F.col("vec_id").alias("cid")))
        found = got.join(top_ex, ["qid", "cid"]).agg(
            F.count(F.lit(1)).alias("__found"))
        served = got.agg(
            F.count(F.lit(1)).alias("__tot"),
            F.sum((F.col("cid") % 2 == 1).cast("int"))
            .alias("__new_served"))
        row = (found.crossJoin(F.broadcast(n_exact))
               .crossJoin(F.broadcast(served))
               .crossJoin(F.broadcast(n_std))
               .crossJoin(F.broadcast(n_new))
               .crossJoin(F.broadcast(drift))
               .select(
                   F.lit(np_).cast("int").alias("n_probe"),
                   F.col("ns").cast("bigint").alias("n_standing"),
                   F.col("nn").cast("bigint").alias("n_new"),
                   F.col("ne").cast("bigint").alias("n_exact"),
                   (F.col("__found") * 100
                    >= F.lit(lo_pct) * F.col("ne")).alias("recall_ok"),
                   (F.col("__new_served") * 100
                    >= F.lit(served_lo) * F.col("__tot"))
                   .alias("new_served_ok"),
                   (F.col("e_standing") <= 2.0 * F.col("e_retrained"))
                   .alias("drift_ok")))
        rows = row if rows is None else rows.unionByName(row)
    return rows
