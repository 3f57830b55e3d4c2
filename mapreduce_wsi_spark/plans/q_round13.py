"""Round-13 catalog tranche — the VERDICT r12 asks, implemented, plus
the r14-queue items pulled forward:

- real-BPE-token budgets (the stamped tokenizer composed with the
  waterfall budgeter, so a mixing run budgets what a trainer actually
  consumes — learned-BPE tokens, not characters), with the tokenizer
  compression curve (merge depth 0/2/4/6), the token-vs-char mixture
  SHIFT table, and the train/held-out TRANSFER curve;
- IVF-PQ composed serving (the faiss ``IVFx,PQy`` shape: coarse
  routing + ADC within probed cells + exact re-rank) — recall on a
  (n_probe, m) grid, the serve-phase residency audit (code rows
  scanned vs balanced), and recall at a second corpus scale (the
  fixed-shortlist decay rule measured);
- the WSI decoder notch: PlanarConfiguration-2 and 16-bit TIFF decode
  for real (single-IFD, the combined planar16 container, and the
  16-bit planar chained-IFD pyramid read at page 1), plus the
  adaptive-shortlist decomposition that separates ADC-truncation
  loss from routing loss.

Reference parity note: none of these exist in the reference
(acgessler/mapreduce-wsi) — its only analytics surface is
user-supplied map/reduce code behind runMapReduce (MapReduceWSI.java:
61-105). They are BASELINE.json north-star surface, built Spark-first
with DuckDB oracle twins like every other family.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_wsi_spark.plans.q_llm import (
    _ASCII_DOCS_SQL,
    _bpe_learn_apply_oracle,
)
from mapreduce_wsi_spark.plans.q_round12 import (
    _IVF_PANEL_SQL,
    _TIFF_4X4_MEANS_ORACLE,
)
from mapreduce_wsi_spark.plans.registry import register, tbl

# ---------------------------------------------------------------------------
# A. Real-token budgets: the learned tokenizer composed with the
#    waterfall budgeter (VERDICT r12 ask #4)
# ---------------------------------------------------------------------------

# The cap-and-redistribute waterfall over a base(source, eff, w) CTE —
# the EXACT arithmetic of mix_epoch_budget_waterfall (q_round12), kept
# as a generator so the char- and token-capacity entries provably run
# the same budget algebra and differ only in the capacity metric.
_WATERFALL_TAIL_SQL = """
    tot AS (SELECT sum(eff) AS te, sum(w) AS sw FROM base),
    r0 AS (SELECT source, eff, w, 3 * eff AS cap,
                  2 * te * w // sw AS tgt0,
                  least(2 * te * w // sw, 3 * eff) AS a0,
                  2 * te * w // sw > 3 * eff AS c0,
                  2 * te AS budget
           FROM base CROSS JOIN tot),
    s1 AS (SELECT max(budget) - sum(a0) AS sur1,
                  sum(CASE WHEN c0 THEN 0 ELSE w END) AS swu1
           FROM r0),
    r1 AS (SELECT r0.*, sur1, swu1,
                  CASE WHEN c0 OR swu1 = 0 THEN 0
                       ELSE sur1 * w // swu1 END AS add1
           FROM r0 CROSS JOIN s1),
    r1b AS (SELECT *, least(a0 + add1, cap) AS a1,
                   NOT c0 AND a0 + add1 > cap AS c1
            FROM r1),
    s2 AS (SELECT max(budget) - sum(a1) AS sur2,
                  sum(CASE WHEN c0 OR c1 THEN 0 ELSE w END) AS swu2
           FROM r1b),
    r2 AS (SELECT r1b.*,
                  CASE WHEN c0 OR c1 OR swu2 = 0 THEN 0
                       ELSE sur2 * w // swu2 END AS add2
           FROM r1b CROSS JOIN s2),
    fin AS (SELECT source, eff, w,
                   least(a1 + add2, cap) AS a2,
                   CASE WHEN c0 THEN 0
                        WHEN c1 THEN 1
                        WHEN NOT c0 AND NOT c1 AND a1 + add2 > cap
                            THEN 2
                        ELSE -1 END AS capped_round
            FROM r2)
    SELECT source, eff AS eff_tokens, w AS policy_w,
           CAST(a2 AS BIGINT) AS alloc_tokens,
           CAST(a2 * 1000 // greatest(eff, 1) AS BIGINT)
               AS epochs_x1000,
           CAST(capped_round AS INT) AS capped_round
    FROM fin
"""


def _budget_waterfall(base):
    """Spark twin of ``_WATERFALL_TAIL_SQL`` over a base frame with
    columns (source, eff bigint, w int) — two unrolled
    cap-and-redistribute rounds, integer floor-division throughout,
    each round one 1-row aggregate broadcast + a map-only update."""
    tot = base.agg(F.sum("eff").alias("te"), F.sum("w").alias("sw"))
    r0 = (base.crossJoin(F.broadcast(tot))
          .withColumn("cap", 3 * F.col("eff"))
          .withColumn("budget", F.expr("2 * te"))
          .withColumn("tgt0", F.expr("2 * te * w div sw"))
          .withColumn("a0", F.least(F.col("tgt0"), F.col("cap")))
          .withColumn("c0", F.col("tgt0") > F.col("cap")))
    s1 = r0.agg(
        (F.max("budget") - F.sum("a0")).alias("sur1"),
        F.sum(F.when(F.col("c0"), 0).otherwise(F.col("w")))
        .alias("swu1"))
    r1 = (r0.crossJoin(F.broadcast(s1))
          .withColumn("add1",
                      F.when(F.col("c0") | (F.col("swu1") == 0), 0)
                      .otherwise(F.expr("sur1 * w div swu1")))
          .withColumn("a1", F.least(F.col("a0") + F.col("add1"),
                                    F.col("cap")))
          .withColumn("c1", ~F.col("c0")
                      & (F.col("a0") + F.col("add1") > F.col("cap"))))
    s2 = r1.agg(
        (F.max("budget") - F.sum("a1")).alias("sur2"),
        F.sum(F.when(F.col("c0") | F.col("c1"), 0)
              .otherwise(F.col("w"))).alias("swu2"))
    r2 = (r1.crossJoin(F.broadcast(s2))
          .withColumn("add2",
                      F.when(F.col("c0") | F.col("c1")
                             | (F.col("swu2") == 0), 0)
                      .otherwise(F.expr("sur2 * w div swu2")))
          .withColumn("a2", F.least(F.col("a1") + F.col("add2"),
                                    F.col("cap")))
          .withColumn(
              "capped_round",
              F.when(F.col("c0"), 0)
              .when(F.col("c1"), 1)
              .when(~F.col("c0") & ~F.col("c1")
                    & (F.col("a1") + F.col("add2") > F.col("cap")), 2)
              .otherwise(-1).cast("int")))
    return r2.select(
        "source", F.col("eff").alias("eff_tokens"),
        F.col("w").alias("policy_w"),
        F.col("a2").cast("bigint").alias("alloc_tokens"),
        F.expr("a2 * 1000 div greatest(eff, 1L)").cast("bigint")
        .alias("epochs_x1000"),
        "capped_round")


@register(
    "mix_bpe_token_budget",
    oracle=rf"""
    WITH ntok AS (SELECT doc_id, n_tokens
                  FROM ({_bpe_learn_apply_oracle(6)}) bq),
    h AS (SELECT doc_id, source,
                 md5(lower(trim(regexp_replace(text, '\s+', ' ',
                                               'g')))) AS h
          FROM documents),
    firsts AS (SELECT h, min(doc_id) AS keeper FROM h GROUP BY h),
    base AS (SELECT s.source,
                    CAST(sum(CASE WHEN s.doc_id = f.keeper
                                  THEN nt.n_tokens ELSE 0 END)
                         AS BIGINT) AS eff,
                    CAST(1 + CAST(('0x' || substr(md5(s.source), 1, 8))
                                  AS BIGINT) % 4 AS INT) AS w
             FROM h s JOIN firsts f ON f.h = s.h
             JOIN ntok nt ON nt.doc_id = s.doc_id
             GROUP BY s.source),
    {_WATERFALL_TAIL_SQL}
    """,
    note="REAL-token budgets (VERDICT r12 ask #4): the waterfall "
         "budgeter re-run with per-source capacity = learned-BPE "
         "token counts instead of the n_chars proxy — train 6 merges "
         "on the corpus (text_bpe_learn_apply's exact trajectory), "
         "tokenize every doc map-side with the learned table as plan "
         "literals, and feed each source's dedup-unique TOKEN mass "
         "(first-occurrence keepers, the mix_epoch_token_budget "
         "convention) into the identical cap-and-redistribute "
         "arithmetic (shared tail: the char and token entries differ "
         "ONLY in the capacity metric — the 'what a 100 TB mixing run "
         "actually budgets' claim made literal; the property test "
         "pins that the two metrics disagree on at least one "
         "source's waterfall outcome). Oracle replays the merge "
         "chain (6 generated CTE rounds) + the budget algebra; "
         "tokenize is map-only, the budget tail is aggregates + "
         "1-row broadcasts")
def mix_bpe_token_budget(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    from mapreduce_wsi_spark.operators.text import bpe_learn_and_apply
    docs = tbl(spark, sf_dir, "documents")
    ntok = (bpe_learn_and_apply(docs, "text", "doc_id", n_merges=6)
            .select("doc_id", "n_tokens"))
    h = docs.select(
        "doc_id", "source",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
        .alias("h"))
    firsts = h.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    base = (h.join(firsts, "h").join(ntok, "doc_id")
            .groupBy("source")
            .agg(F.sum(F.when(F.col("doc_id") == F.col("keeper"),
                              F.col("n_tokens")).otherwise(0))
                 .cast("bigint").alias("eff"))
            .withColumn("w", (F.lit(1)
                              + portable_bucket(F.col("source"), 4))
                        .cast("int")))
    return _budget_waterfall(base)


# ---------------------------------------------------------------------------
# B. IVF-PQ composed serving (VERDICT r12 ask #5)
# ---------------------------------------------------------------------------

_IVFPQ_GRID = ((1, 4, 15), (2, 8, 25), (4, 8, 35), (8, 16, 55))


@register(
    "sim_ann_ivfpq_grid_recall",
    oracle=f"""
    WITH c AS ({_IVF_PANEL_SQL}),
    q AS (SELECT vec_id, v FROM c WHERE vec_id < 20),
    ex AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                      list_dot_product(q.v, c.v)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.v, c.v))) DESC,
                      c.vec_id) AS rn
           FROM q CROSS JOIN c WHERE c.vec_id <> q.vec_id),
    truth AS (SELECT count(*) AS n FROM ex WHERE rn <= 10),
    cfg AS (SELECT CAST(t.np AS INT) AS n_probe, CAST(t.m AS INT) AS m
            FROM (VALUES {", ".join(f"({np}, {m})"
                                    for np, m, _ in _IVFPQ_GRID)})
                 t(np, m))
    SELECT n_probe, m, CAST(max(truth.n) AS BIGINT) AS n_exact,
           true AS recall_ok
    FROM cfg CROSS JOIN truth GROUP BY n_probe, m
    """,
    note="IVF-PQ COMPOSED serving recall (VERDICT r12 ask #5) — the "
         "actual faiss IVFx,PQy index the repo has both halves of: "
         "one 16-cell IVF build routes each query to its n_probe "
         "nearest cells, PQ codebooks (m subspaces x 16 codes, "
         "sample-trained) ADC-score ONLY the probed cells' code "
         "rows, shortlist-50 exact re-rank emits top-10 — measured "
         "against the exact-cosine truth on the fixed 20x300 panel "
         "at grid points (n_probe, m) = "
         + "/".join(f"({np},{m})" for np, m, _ in _IVFPQ_GRID)
         + ". Both error sources compose: routing misses (IVF) and "
         "quantization misses (PQ), so each grid point's recall "
         "sits at-or-under its sim_ann_ivf_nprobe_recall row — "
         "measured at sf0.01: 34/44.5/61/79.5% (vs IVF-only "
         "34/44.5/64.5/84%: at n_probe 1-2 the 50-code shortlist "
         "covers the probed cells entirely and exact re-rank "
         "recovers every routed hit; PQ loss only appears once the "
         "candidate pool outgrows the shortlist). Pinned bounds "
         "(integer-multiplied, ~2x margin under the measurement): "
         "recall >= "
         + "/".join(str(lo) for _, _, lo in _IVFPQ_GRID)
         + " percent. n_exact is oracle-exact; serve phase: "
         "broadcast centroids + broadcast query batch, cell-equi "
         "join on the code table, salted two-phase shortlist rank — "
         "zero Exchange on the probe side "
         "(operators/similarity.py::ivfpq_query)")
def sim_ann_ivfpq_grid_recall(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, build_ivf_index, build_pq_codebooks, cosine,
        ivfpq_query, pq_encode, salted_topk)
    emb = tbl(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    c = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    qs = (c.filter(F.col("vec_id") < 20)
          .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    ex = (qs.crossJoin(F.broadcast(c))
          .filter(F.col("vec_id") != F.col("qid"))
          .select("qid", F.col("vec_id").alias("cid"),
                  cosine(F.col("qv"), F.col("v")).alias("s")))
    top_ex = (salted_topk(ex, "qid", [F.col("s").desc(), F.col("cid")],
                          "cid", k=10)
              .select("qid", "cid"))
    n_exact = top_ex.agg(F.count(F.lit(1)).alias("ne"))

    assigned, centroids = build_ivf_index(emb, "vec_id", "embedding",
                                          n_centroids=16, seed=42)
    queries = emb.filter(F.col("vec_id") < 20)
    codes_by_m: dict = {}
    rows = None
    for n_probe, m, lo_pct in _IVFPQ_GRID:
        if m not in codes_by_m:
            books = build_pq_codebooks(emb, m_subspaces=m, n_codes=16)
            # build-side join: the code table carries its cell id once,
            # amortized across every (n_probe, *) serve at this m
            codes = (pq_encode(emb, books)
                     .join(assigned.select("vec_id", "__cell"),
                           "vec_id"))
            codes_by_m[m] = (books, codes)
        books, codes = codes_by_m[m]
        got = (ivfpq_query(assigned, centroids, codes, books, emb,
                           queries, k=10, n_probe=n_probe)
               .select(F.col("query_id").alias("qid"),
                       F.col("vec_id").alias("cid")))
        row = (got.join(top_ex, ["qid", "cid"])
               .agg(F.count(F.lit(1)).alias("__found"))
               .crossJoin(F.broadcast(n_exact))
               .select(F.lit(n_probe).cast("int").alias("n_probe"),
                       F.lit(m).cast("int").alias("m"),
                       F.col("ne").cast("bigint").alias("n_exact"),
                       (F.col("__found") * 100
                        >= F.lit(lo_pct) * F.col("ne"))
                       .alias("recall_ok")))
        rows = row if rows is None else rows.unionByName(row)
    return rows


# ---------------------------------------------------------------------------
# C. Decoder notch: planar-configuration and 16-bit TIFF — the two
#    smallest named stubs on the WSI format's own axis (VERDICT r12
#    optional #8)
# ---------------------------------------------------------------------------

@register(
    "mm_decode_tiff_planar",
    oracle=_TIFF_4X4_MEANS_ORACLE,  # layout must not change values
    note="PlanarConfiguration 2 TIFF decode (TIFF 6.0 s12 — tag "
         "284 = 2: the segment list is PLANE-MAJOR, all of component "
         "R's strips/tiles then G's then B's, each plane an "
         "independent 1-sample image; scientific/medical TIFF "
         "writers emit this layout): the same 4x4 RGB images as "
         "mm_decode_tiff_tiled, re-containerized planar under a "
         "16-way rotation — byte order (doc_id%2), LZW vs Deflate "
         "((doc_id//2)%2), Predictor 1 vs 2 ((doc_id//4)%2, undone "
         "per PLANE with spp=1), 2-row strips vs 3x2 tiles "
         "((doc_id//8)%2, edge tiles padded per plane). The oracle "
         "recomputes channel means from the source ASCII bytes, so a "
         "plane-order swap, a per-plane predictor misapplied across "
         "planes, or a segment-count miscount shifts a mean "
         "(operators/multimodal.py::_parse_tiff planar branch, "
         "encode_tiff(planar=True))")
def mm_decode_tiff_planar(spark, sf_dir):
    from mapreduce_wsi_spark.operators.multimodal import (
        decode_tiff_stats, encode_tiff)
    from mapreduce_wsi_spark.plans.q_llm import _ascii_docs
    from mapreduce_wsi_spark.plans.q_round12 import _tiff_blobs

    def encode_one(doc_id, img):
        endian = "<" if doc_id % 2 == 0 else ">"
        comp = 5 if (doc_id // 2) % 2 == 0 else 8
        pred = 1 if (doc_id // 4) % 2 == 0 else 2
        if (doc_id // 8) % 2:
            return encode_tiff(img, endian, comp, predictor=pred,
                               tile=(3, 2), planar=True)
        return encode_tiff(img, endian, comp, predictor=pred,
                           rows_per_strip=2, planar=True)

    blobs = _tiff_blobs(_ascii_docs(spark, sf_dir), encode_one)
    stats = decode_tiff_stats(blobs)
    return stats.select("doc_id", "img_w", "img_h", "ok",
                        F.round("mean_r", 9).alias("mean_r"),
                        F.round("mean_g", 9).alias("mean_g"),
                        F.round("mean_b", 9).alias("mean_b"))


@register(
    "mm_decode_tiff_16bit",
    oracle=f"""
    WITH p AS (SELECT doc_id, rpad(substr(text, 1, 48), 48, 'x') AS px
               FROM {_ASCII_DOCS_SQL} documents)
    SELECT doc_id, CAST(4 AS INT) AS img_w, CAST(4 AS INT) AS img_h,
           true AS ok,
           round(list_sum(list_transform(generate_series(0, 15),
                 j -> unicode(px[3*j + 1]))) * 257 / 16.0, 9) AS mean_r,
           round(list_sum(list_transform(generate_series(0, 15),
                 j -> unicode(px[3*j + 2]))) * 257 / 16.0, 9) AS mean_g,
           round(list_sum(list_transform(generate_series(0, 15),
                 j -> unicode(px[3*j + 3]))) * 257 / 16.0, 9) AS mean_b
    FROM p
    """,
    note="16-bit-per-sample TIFF decode (BitsPerSample [16,16,16] — "
         "the depth whole-slide scanners and microscopy actually "
         "capture at): each source ASCII byte v becomes the 16-bit "
         "sample v*257 (= v<<8|v, the exact 8->16 bit replication "
         "scaling), packed in the FILE byte order — so a decoder that "
         "reads the wrong endian, or reads byte pairs as two 8-bit "
         "samples, shifts every mean by orders of magnitude. Rotation: "
         "byte order (doc_id%2) x LZW/Deflate ((doc_id//2)%2) x "
         "Predictor 1/2 ((doc_id//4)%2, SAMPLE-space differencing mod "
         "65536 per spec s14) x strips/tiles ((doc_id//8)%2). Oracle = "
         "the 8-bit channel means scaled by 257 "
         "(operators/multimodal.py::_parse_tiff 16-bit path)")
def mm_decode_tiff_16bit(spark, sf_dir):
    import numpy as np

    from mapreduce_wsi_spark.operators.multimodal import (
        decode_tiff_stats, encode_tiff)
    from mapreduce_wsi_spark.plans.q_llm import _ascii_docs
    from mapreduce_wsi_spark.plans.q_round12 import _tiff_blobs

    def encode_one(doc_id, img):
        img16 = img.astype(np.uint16) * 257
        endian = "<" if doc_id % 2 == 0 else ">"
        comp = 5 if (doc_id // 2) % 2 == 0 else 8
        pred = 1 if (doc_id // 4) % 2 == 0 else 2
        if (doc_id // 8) % 2:
            return encode_tiff(img16, endian, comp, predictor=pred,
                               tile=(3, 2), bits=16)
        return encode_tiff(img16, endian, comp, predictor=pred,
                           rows_per_strip=2, bits=16)

    blobs = _tiff_blobs(_ascii_docs(spark, sf_dir), encode_one)
    stats = decode_tiff_stats(blobs)
    return stats.select("doc_id", "img_w", "img_h", "ok",
                        F.round("mean_r", 9).alias("mean_r"),
                        F.round("mean_g", 9).alias("mean_g"),
                        F.round("mean_b", 9).alias("mean_b"))


# ---------------------------------------------------------------------------
# D. Tokenizer economics: the compression curve and the mixture shift —
#    the two tables a team reads before committing a tokenizer
# ---------------------------------------------------------------------------

def _bpe_ntok_sql(k: int) -> str:
    """Per-doc BPE token counts at merge depth ``k`` as a subquery:
    depth 0 is one aggregate (every word char is a token before any
    merge); k > 0 replays the learn+apply oracle chain."""
    if k == 0:
        return ("(SELECT doc_id, CAST(sum(len(w)) AS INT) AS n_tokens"
                " FROM (SELECT doc_id, unnest(string_split(text, ' '))"
                " AS w FROM documents) s WHERE w <> '' GROUP BY doc_id)")
    return f"(SELECT doc_id, n_tokens FROM ({_bpe_learn_apply_oracle(k)}) q)"


@register(
    "text_bpe_compression_curve",
    oracle=f"""
    WITH u AS ({" UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS n_merges,"
        f" CAST(sum(n_tokens) AS BIGINT) AS total_tokens"
        f" FROM {_bpe_ntok_sql(k)} t{k}"
        for k in (0, 2, 4, 6))}),
    base AS (SELECT total_tokens AS t0 FROM u WHERE n_merges = 0)
    SELECT n_merges, total_tokens,
           CAST((t0 - total_tokens) * 1000000 // greatest(t0, 1)
                AS BIGINT) AS saved_ppm
    FROM u CROSS JOIN base
    """,
    note="tokenizer COMPRESSION CURVE — corpus token mass at merge "
         "depth 0/2/4/6 (the vocab-size-vs-sequence-length dial every "
         "tokenizer-training run sweeps before pinning a vocab): "
         "depth 0 is the raw character count over words, each deeper "
         "point re-trains the BPE table on the corpus and re-tokenizes "
         "map-side with the learned merges as plan literals "
         "(text_bpe_learn_apply's exact trajectory per depth), "
         "saved_ppm = sequence-length reduction vs raw chars. "
         "Diminishing returns are the expected shape — each merge "
         "saves at most its pair's corpus frequency. Oracle replays "
         "all three merge chains (2+4+6 generated CTE rounds) plus "
         "the depth-0 aggregate; Spark side: 12 bounded argmax jobs "
         "at build, then 4 map-only tokenize passes -> 1-row "
         "aggregates (operators/text.py::bpe_learn_and_apply)")
def text_bpe_compression_curve(spark, sf_dir):
    # r14: train ONCE at the deepest point and slice prefixes — BPE
    # merge learning is a deterministic sequence, so learn(k) is
    # exactly learned_6[:k] (same corpus, same fold, same argmax
    # tie-break); the old per-depth retrain paid 2+4+6 = 12 bounded
    # argmax jobs where the shared trajectory needs 6 (guide §1.2:
    # don't recompute a prefix three times). Tokenization per depth is
    # unchanged: the same U+001F strip on both sides, the same
    # bpe_apply_learned plan literals — bit-identical to the per-depth
    # bpe_learn_and_apply the oracle replays.
    from mapreduce_wsi_spark.operators.text import (
        _bpe_learn_merges, bpe_apply_learned)
    docs = tbl(spark, sf_dir, "documents")
    clean = F.replace(F.col("text"), F.lit("\x1f"), F.lit(""))
    docs_c = docs.withColumn("text", clean)
    learned = _bpe_learn_merges(docs_c, "text", 6)
    parts = []
    for k in (0, 2, 4, 6):
        nt = bpe_apply_learned(docs_c, "text", "doc_id", learned[:k])
        parts.append(nt.agg(
            F.lit(k).cast("int").alias("n_merges"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    base = (u.filter(F.col("n_merges") == 0)
            .select(F.col("total_tokens").alias("t0")))
    return (u.crossJoin(F.broadcast(base))
            .select("n_merges", "total_tokens",
                    F.expr("(t0 - total_tokens) * 1000000 "
                           "div greatest(t0, 1L)")
                    .cast("bigint").alias("saved_ppm")))


@register(
    "mix_token_vs_char_shift",
    oracle=rf"""
    WITH ntok AS (SELECT doc_id, n_tokens
                  FROM ({_bpe_learn_apply_oracle(6)}) bq),
    h AS (SELECT doc_id, source, n_chars,
                 md5(lower(trim(regexp_replace(text, '\s+', ' ',
                                               'g')))) AS h
          FROM documents),
    firsts AS (SELECT h, min(doc_id) AS keeper FROM h GROUP BY h),
    per AS (SELECT s.source,
                   CAST(sum(CASE WHEN s.doc_id = f.keeper
                                 THEN s.n_chars ELSE 0 END) AS BIGINT)
                       AS eff_chars,
                   CAST(sum(CASE WHEN s.doc_id = f.keeper
                                 THEN nt.n_tokens ELSE 0 END) AS BIGINT)
                       AS eff_tokens
            FROM h s JOIN firsts f ON f.h = s.h
            JOIN ntok nt ON nt.doc_id = s.doc_id
            GROUP BY s.source),
    tot AS (SELECT sum(eff_chars) AS tc, sum(eff_tokens) AS tt FROM per)
    SELECT source, eff_chars, eff_tokens,
           CAST(eff_chars * 1000000 // greatest(tc, 1) AS BIGINT)
               AS char_share_ppm,
           CAST(eff_tokens * 1000000 // greatest(tt, 1) AS BIGINT)
               AS token_share_ppm,
           CAST(eff_tokens * 1000000 // greatest(tt, 1)
                - eff_chars * 1000000 // greatest(tc, 1) AS BIGINT)
               AS shift_ppm
    FROM per CROSS JOIN tot
    """,
    note="MIXTURE SHIFT under the metric change — per source, its "
         "share of the dedup-unique corpus in chars vs in learned-BPE "
         "tokens, and the signed ppm shift: the one-table answer to "
         "'which domains does a char-weighted mixture over- or under-"
         "sample once the trainer counts tokens?' (sources whose text "
         "compresses BETTER than average lose share — exactly the "
         "bias mix_bpe_token_budget corrects; this entry makes the "
         "delta itself a stamped value claim rather than a property-"
         "test side effect). Same dedup-keeper convention as the "
         "budget entries; one tokenize pass, two aggregates, a 1-row "
         "broadcast")
def mix_token_vs_char_shift(spark, sf_dir):
    from mapreduce_wsi_spark.operators.text import bpe_learn_and_apply
    docs = tbl(spark, sf_dir, "documents")
    ntok = (bpe_learn_and_apply(docs, "text", "doc_id", n_merges=6)
            .select("doc_id", "n_tokens"))
    h = docs.select(
        "doc_id", "source", "n_chars",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
        .alias("h"))
    firsts = h.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    per = (h.join(firsts, "h").join(ntok, "doc_id")
           .groupBy("source")
           .agg(F.sum(F.when(F.col("doc_id") == F.col("keeper"),
                             F.col("n_chars")).otherwise(0))
                .cast("bigint").alias("eff_chars"),
                F.sum(F.when(F.col("doc_id") == F.col("keeper"),
                             F.col("n_tokens")).otherwise(0))
                .cast("bigint").alias("eff_tokens")))
    tot = per.agg(F.sum("eff_chars").alias("tc"),
                  F.sum("eff_tokens").alias("tt"))
    return (per.crossJoin(F.broadcast(tot))
            .select("source", "eff_chars", "eff_tokens",
                    F.expr("eff_chars * 1000000 div greatest(tc, 1L)")
                    .cast("bigint").alias("char_share_ppm"),
                    F.expr("eff_tokens * 1000000 div greatest(tt, 1L)")
                    .cast("bigint").alias("token_share_ppm"),
                    F.expr("eff_tokens * 1000000 div greatest(tt, 1L) "
                           "- eff_chars * 1000000 div greatest(tc, 1L)")
                    .cast("bigint").alias("shift_ppm")))


# ---------------------------------------------------------------------------
# E. r14 queue heads, pre-built (registered after the r13 window ->
#    never-stamped, heading the next rotation — the r12 pattern)
# ---------------------------------------------------------------------------

def _bpe_transfer_oracle(n_merges: int = 6) -> str:
    """The transfer twin: the LEARN rounds run over the doc_id%2==0
    training split only (the learn_where parameter of the shared
    generator — ADVICE r13 replaced the former post-hoc string
    replace + import-time assert with this), the apply stage tokenizes
    EVERY doc — so held-out compression measures how the learned table
    generalizes."""
    return _bpe_learn_apply_oracle(n_merges,
                                   learn_where="doc_id % 2 = 0")


@register(
    "text_bpe_transfer_curve",
    oracle=f"""
    WITH ntok AS (SELECT doc_id, n_tokens
                  FROM ({_bpe_transfer_oracle(6)}) q),
    chars AS (SELECT doc_id,
                     CAST(coalesce(list_sum(list_transform(
                         list_filter(string_split(text, ' '),
                                     w -> w <> ''),
                         w -> len(w))), 0) AS BIGINT) AS n_chars_w
              FROM documents),
    j AS (SELECT CASE WHEN c.doc_id % 2 = 0 THEN 'train'
                      ELSE 'heldout' END AS split,
                 c.n_chars_w, coalesce(n.n_tokens, 0) AS n_tokens
          FROM chars c LEFT JOIN ntok n ON n.doc_id = c.doc_id)
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars_w) AS BIGINT) AS total_chars,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST((sum(n_chars_w) - sum(n_tokens)) * 1000000
                // greatest(sum(n_chars_w), 1) AS BIGINT) AS saved_ppm
    FROM j GROUP BY split
    """,
    note="tokenizer TRANSFER curve (r14 queue head, pre-built: does "
         "the learned table generalize?) — train 6 merges on the "
         "doc_id%%2==0 HALF of the corpus, tokenize EVERYTHING with "
         "that table, report compression separately for the training "
         "split and the held-out split: the train/held-out gap is the "
         "overfit measure every production tokenizer ships with (a "
         "table of memorized rare pairs compresses its training split "
         "and nothing else). Oracle replays the merge chain with the "
         "learn CTEs filtered to the training split (one surgical "
         "WHERE, assert-pinned) and the apply stage unfiltered; Spark "
         "side: operators/text.py::bpe_apply_learned — the apply half "
         "factored from bpe_learn_and_apply so a table trained on one "
         "split tokenizes another. Learn = bounded argmax jobs over "
         "the HALF vocabulary; apply map-only; two aggregate rows out")
def text_bpe_transfer_curve(spark, sf_dir):
    from mapreduce_wsi_spark.operators.text import (
        _bpe_learn_merges, bpe_apply_learned, words)
    docs = tbl(spark, sf_dir, "documents")
    clean = docs.withColumn(
        "text", F.replace(F.col("text"), F.lit("\x1f"), F.lit("")))
    learned = _bpe_learn_merges(
        clean.filter(F.col("doc_id") % 2 == 0), "text", 6)
    ntok = (bpe_apply_learned(clean, "text", "doc_id", learned)
            .select("doc_id", "n_tokens"))
    wl = F.filter(words(F.col("text")), lambda w: w != "")
    chars = clean.select(
        "doc_id",
        F.aggregate(wl, F.lit(0), lambda a, w: a + F.length(w))
        .cast("bigint").alias("n_chars_w"))
    j = (chars.join(ntok, "doc_id")
         .select(F.when(F.col("doc_id") % 2 == 0, "train")
                 .otherwise("heldout").alias("split"),
                 "n_chars_w", "n_tokens"))
    return (j.groupBy("split")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_chars_w").cast("bigint").alias("total_chars"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens"))
            .select("split", "n_docs", "total_chars", "total_tokens",
                    F.expr("(total_chars - total_tokens) * 1000000 "
                           "div greatest(total_chars, 1L)")
                    .cast("bigint").alias("saved_ppm")))


@register(
    "mm_decode_tiff_planar16",
    oracle=f"""
    WITH p AS (SELECT doc_id, rpad(substr(text, 1, 48), 48, 'x') AS px
               FROM {_ASCII_DOCS_SQL} documents)
    SELECT doc_id, CAST(4 AS INT) AS img_w, CAST(4 AS INT) AS img_h,
           true AS ok,
           round(list_sum(list_transform(generate_series(0, 15),
                 j -> unicode(px[3*j + 1]))) * 257 / 16.0, 9) AS mean_r,
           round(list_sum(list_transform(generate_series(0, 15),
                 j -> unicode(px[3*j + 2]))) * 257 / 16.0, 9) AS mean_g,
           round(list_sum(list_transform(generate_series(0, 15),
                 j -> unicode(px[3*j + 3]))) * 257 / 16.0, 9) AS mean_b
    FROM p
    """,
    note="the COMBINED container axes in one file (r14 queue head, "
         "pre-built): PlanarConfiguration 2 x BitsPerSample 16 x "
         "Predictor 1/2 — three separately-stamped decode branches "
         "forced through the same IFD (per-plane segment lists whose "
         "samples are 16-bit in the file byte order, horizontal "
         "differencing in 16-bit sample space per plane), under the "
         "usual rotation: byte order (doc_id%2) x LZW/Deflate "
         "((doc_id//2)%2) x Predictor 1/2 ((doc_id//4)%2) x 2-row "
         "strips vs 3x2 tiles ((doc_id//8)%2). Interactions are where "
         "container parsers rot (a byte-space predictor undo or a "
         "chunky-assumed plane stride each corrupt EXACTLY these "
         "files); oracle = the 257-scaled channel means, so any "
         "corrupt sample shifts a mean "
         "(operators/multimodal.py::_parse_tiff)")
def mm_decode_tiff_planar16(spark, sf_dir):
    import numpy as np

    from mapreduce_wsi_spark.operators.multimodal import (
        decode_tiff_stats, encode_tiff)
    from mapreduce_wsi_spark.plans.q_llm import _ascii_docs
    from mapreduce_wsi_spark.plans.q_round12 import _tiff_blobs

    def encode_one(doc_id, img):
        img16 = img.astype(np.uint16) * 257
        endian = "<" if doc_id % 2 == 0 else ">"
        comp = 5 if (doc_id // 2) % 2 == 0 else 8
        pred = 1 if (doc_id // 4) % 2 == 0 else 2
        if (doc_id // 8) % 2:
            return encode_tiff(img16, endian, comp, predictor=pred,
                               tile=(3, 2), planar=True, bits=16)
        return encode_tiff(img16, endian, comp, predictor=pred,
                           rows_per_strip=2, planar=True, bits=16)

    blobs = _tiff_blobs(_ascii_docs(spark, sf_dir), encode_one)
    stats = decode_tiff_stats(blobs)
    return stats.select("doc_id", "img_w", "img_h", "ok",
                        F.round("mean_r", 9).alias("mean_r"),
                        F.round("mean_g", 9).alias("mean_g"),
                        F.round("mean_b", 9).alias("mean_b"))


@register(
    "sim_ann_ivfpq_scan_fraction",
    oracle=f"""
    WITH c AS ({_IVF_PANEL_SQL}),
    nq AS (SELECT count(*) AS q FROM c WHERE vec_id < 20),
    cn AS (SELECT count(*) AS n FROM c),
    cfg AS (SELECT CAST(unnest([1, 2, 4, 8]) AS INT) AS n_probe)
    SELECT n_probe,
           CAST(max(nq.q) AS BIGINT) AS n_queries,
           CAST(max(cn.n) AS BIGINT) AS corpus_n,
           true AS scan_bounded, true AS monotone_ok
    FROM cfg CROSS JOIN nq CROSS JOIN cn GROUP BY n_probe
    """,
    note="IVF-PQ serve-phase RESIDENCY audit (r14 queue head, "
         "pre-built: the I/O claim behind sim_ann_ivfpq_grid_recall "
         "measured, not asserted): per n_probe, the number of code "
         "rows the ADC stage actually scans (sum of probed cell "
         "sizes over the 20-query panel) against the balanced "
         "expectation n_probe/16 of the corpus — scan_bounded pins "
         "scanned within [1/4x, 4x] of balanced (integer-multiplied; "
         "measured at sf0.01: 1.75/1.21/1.10/1.00x — queries probe "
         "the cells where the data lives, so low n_probe skews "
         "high), monotone_ok computes that widening the probe never "
         "scans fewer rows (per-query cell sets are supersets). "
         "n_queries/corpus_n are oracle-exact; the audit aggregates "
         "the cell-size table the index already carries — at 100 TB "
         "this is the dial that prices a recall target in scan bytes "
         "(m bytes/row vs 4*dim raw: with recall from the grid entry "
         "and scan fraction from this one, cost = corpus * "
         "scan_ppm * m bytes per query batch)")
def sim_ann_ivfpq_scan_fraction(spark, sf_dir):
    from pyspark.sql import Window

    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, build_ivf_index, cosine)
    emb = tbl(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    assigned, centroids = build_ivf_index(emb, "vec_id", "embedding",
                                          n_centroids=16, seed=42)
    sizes = assigned.groupBy("__cell").agg(
        F.count(F.lit(1)).alias("__csz"))
    nq = emb.filter(F.col("vec_id") < 20).agg(
        F.count(F.lit(1)).alias("q"))
    cn = emb.agg(F.count(F.lit(1)).alias("n"))
    q = (emb.filter(F.col("vec_id") < 20)
         .select(F.col("vec_id").alias("qid"),
                 _as_double(F.col("embedding")).alias("__qv")))
    w_probe = Window.partitionBy("qid").orderBy(
        F.col("__qc").desc(), F.col("cell").asc())
    ranked = (q.crossJoin(F.broadcast(centroids))
              .withColumn("__qc", cosine(F.col("__qv"),
                                         F.col("centroid")))
              .withColumn("__pr", F.row_number().over(w_probe))
              .filter(F.col("__pr") <= 8)
              .join(F.broadcast(sizes),
                    F.col("cell") == F.col("__cell"), "left")
              .select("__pr", F.coalesce("__csz", F.lit(0))
                      .alias("__csz")))
    rows = None
    for n_probe in (1, 2, 4, 8):
        row = (ranked.filter(F.col("__pr") <= n_probe)
               .agg(F.sum("__csz").alias("__scanned"))
               .crossJoin(F.broadcast(nq))
               .crossJoin(F.broadcast(cn))
               .select(F.lit(n_probe).cast("int").alias("n_probe"),
                       F.col("q").cast("bigint").alias("n_queries"),
                       F.col("n").cast("bigint").alias("corpus_n"),
                       ((F.col("__scanned") * 16 * 4
                         >= F.lit(n_probe) * F.col("q") * F.col("n"))
                        & (F.col("__scanned") * 16
                           <= 4 * F.lit(n_probe) * F.col("q")
                           * F.col("n"))).alias("scan_bounded"),
                       F.col("__scanned").alias("__scanned")))
        rows = row if rows is None else rows.unionByName(row)
    w = Window.orderBy("n_probe")  # 4-row aggregate frame — bounded
    return (rows
            .withColumn("__prev", F.lag("__scanned").over(w))
            .select("n_probe", "n_queries", "corpus_n", "scan_bounded",
                    F.coalesce(F.col("__scanned") >= F.col("__prev"),
                               F.lit(True)).alias("monotone_ok")))


@register(
    "mm_decode_tiff_pyramid16",
    oracle=f"""
    WITH p AS (SELECT doc_id, rpad(substr(text, 1, 48), 48, 'x') AS px
               FROM {_ASCII_DOCS_SQL} documents)
    SELECT doc_id, CAST(2 AS INT) AS img_w, CAST(2 AS INT) AS img_h,
           true AS ok,
           round(list_sum(list_transform([0, 2, 8, 10],
                 j -> unicode(px[3*j + 1]))) * 257 / 4.0, 9) AS mean_r,
           round(list_sum(list_transform([0, 2, 8, 10],
                 j -> unicode(px[3*j + 2]))) * 257 / 4.0, 9) AS mean_g,
           round(list_sum(list_transform([0, 2, 8, 10],
                 j -> unicode(px[3*j + 3]))) * 257 / 4.0, 9) AS mean_b
    FROM p
    """,
    note="16-bit PLANAR pyramid read (r14 queue head, pre-built: the "
         "depth/layout combination microscopy pyramids actually ship "
         "— encode_tiff_pyramid gained planar/bits in r13): every "
         "level of the chained-IFD pyramid carries plane-major "
         "segment lists of 16-bit samples in the file byte order, "
         "rotating byte order (doc_id%2) x LZW/Deflate ((doc_id//2)%2) "
         "x single-strip-per-plane vs 2x2-tiled planes ((doc_id//4)%2) "
         "x Predictor 1/2 in 16-bit sample space ((doc_id//8)%2). The "
         "query reads PAGE 1 through the chain walk — the zoomed-out "
         "WSI read now exercised at capture depth; oracle = the "
         "257-scaled channel means of the four [::2, ::2] reduction "
         "pixels (operators/multimodal.py::encode_tiff_pyramid, "
         "_parse_tiff)")
def mm_decode_tiff_pyramid16(spark, sf_dir):
    import numpy as np

    from mapreduce_wsi_spark.operators.multimodal import (
        decode_tiff_stats, encode_tiff_pyramid)
    from mapreduce_wsi_spark.plans.q_llm import _ascii_docs
    from mapreduce_wsi_spark.plans.q_round12 import _tiff_blobs

    def encode_one(doc_id, img):
        img16 = img.astype(np.uint16) * 257
        endian = "<" if doc_id % 2 == 0 else ">"
        comp = 5 if (doc_id // 2) % 2 == 0 else 8
        tile = (2, 2) if (doc_id // 4) % 2 else None
        pred = 1 if (doc_id // 8) % 2 == 0 else 2
        return encode_tiff_pyramid([img16, img16[::2, ::2]], endian,
                                   comp, tile=tile, predictor=pred,
                                   planar=True, bits=16)

    blobs = _tiff_blobs(_ascii_docs(spark, sf_dir), encode_one)
    stats = decode_tiff_stats(blobs, page=1)
    return stats.select("doc_id", "img_w", "img_h", "ok",
                        F.round("mean_r", 9).alias("mean_r"),
                        F.round("mean_g", 9).alias("mean_g"),
                        F.round("mean_b", 9).alias("mean_b"))


_IVFPQ_SCALES = ((300, 35), (500, 20))


@register(
    "sim_ann_ivfpq_corpus_scale",
    oracle=f"""
    WITH {" , ".join(
        f'''c{n} AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings WHERE vec_id < {n}),
        ex{n} AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                      list_dot_product(q.v, c.v)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.v, c.v))) DESC,
                      c.vec_id) AS rn
           FROM (SELECT vec_id, v FROM c{n} WHERE vec_id < 20) q
           CROSS JOIN c{n} c WHERE c.vec_id <> q.vec_id)'''
        for n, _ in _IVFPQ_SCALES)}
    {" UNION ALL ".join(
        f'''SELECT CAST({n} AS INT) AS panel_n,
               CAST(4 AS INT) AS n_probe, CAST(8 AS INT) AS m,
               CAST(count(*) AS BIGINT) AS n_exact,
               true AS recall_ok
        FROM ex{n} WHERE rn <= 10'''
        for n, _ in _IVFPQ_SCALES)}
    """,
    note="IVF-PQ recall at a SECOND corpus scale (r14 queue head, "
         "pre-built): the same (n_probe=4, m=8, shortlist=50) serving "
         "point measured on the 300-vector panel AND the full "
         "500-vector table with the cell count held at 16 — recall "
         "measured 61% -> 42% at sf0.01 (bounds 35/20, ~2x margin) "
         "because the candidate pool per query (n_probe x mean cell "
         "size: ~75 -> ~125 rows) outgrows the fixed 50-code ADC "
         "shortlist, so quantization loss compounds with routing "
         "loss. This is the capacity-planning fact the residency "
         "audit prices: at constant cells, recall decays as cells "
         "fill — hold recall by scaling shortlist with cell size or "
         "cells with corpus (the faiss nlist ~ sqrt(n) rule). Panel "
         "truth is oracle-exact per scale; both measurements reuse "
         "the stamped serve path end to end")
def sim_ann_ivfpq_corpus_scale(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, build_ivf_index, build_pq_codebooks, cosine,
        ivfpq_query, pq_encode, salted_topk)
    rows = None
    for panel_n, lo_pct in _IVFPQ_SCALES:
        emb = (tbl(spark, sf_dir, "embeddings")
               .filter(F.col("vec_id") < panel_n))
        c = emb.select("vec_id",
                       _as_double(F.col("embedding")).alias("v"))
        qs = (c.filter(F.col("vec_id") < 20)
              .select(F.col("vec_id").alias("qid"),
                      F.col("v").alias("qv")))
        ex = (qs.crossJoin(F.broadcast(c))
              .filter(F.col("vec_id") != F.col("qid"))
              .select("qid", F.col("vec_id").alias("cid"),
                      cosine(F.col("qv"), F.col("v")).alias("s")))
        top_ex = (salted_topk(ex, "qid",
                              [F.col("s").desc(), F.col("cid")],
                              "cid", k=10)
                  .select("qid", "cid"))
        n_exact = top_ex.agg(F.count(F.lit(1)).alias("ne"))
        assigned, centroids = build_ivf_index(
            emb, "vec_id", "embedding", n_centroids=16, seed=42)
        books = build_pq_codebooks(emb, m_subspaces=8, n_codes=16)
        codes = (pq_encode(emb, books)
                 .join(assigned.select("vec_id", "__cell"), "vec_id"))
        got = (ivfpq_query(assigned, centroids, codes, books, emb,
                           emb.filter(F.col("vec_id") < 20), k=10,
                           n_probe=4)
               .select(F.col("query_id").alias("qid"),
                       F.col("vec_id").alias("cid")))
        row = (got.join(top_ex, ["qid", "cid"])
               .agg(F.count(F.lit(1)).alias("__found"))
               .crossJoin(F.broadcast(n_exact))
               .select(F.lit(panel_n).cast("int").alias("panel_n"),
                       F.lit(4).cast("int").alias("n_probe"),
                       F.lit(8).cast("int").alias("m"),
                       F.col("ne").cast("bigint").alias("n_exact"),
                       (F.col("__found") * 100
                        >= F.lit(lo_pct) * F.col("ne"))
                       .alias("recall_ok")))
        rows = row if rows is None else rows.unionByName(row)
    return rows


_ADAPTIVE_GRID = ((4, 50, 20), (4, 125, 22), (8, 50, 30), (8, 125, 37))


@register(
    "sim_ann_ivfpq_adaptive_shortlist",
    oracle=f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 500),
    q AS (SELECT vec_id, v FROM c WHERE vec_id < 20),
    ex AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                      list_dot_product(q.v, c.v)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.v, c.v))) DESC,
                      c.vec_id) AS rn
           FROM q CROSS JOIN c WHERE c.vec_id <> q.vec_id),
    truth AS (SELECT count(*) AS n FROM ex WHERE rn <= 10),
    cfg AS (SELECT CAST(t.np AS INT) AS n_probe,
                   CAST(t.sl AS INT) AS shortlist
            FROM (VALUES {", ".join(f"({np}, {sl})"
                                    for np, sl, _ in _ADAPTIVE_GRID)})
                 t(np, sl))
    SELECT n_probe, shortlist, shortlist >= 125 AS adaptive,
           CAST(max(truth.n) AS BIGINT) AS n_exact,
           true AS recall_ok, true AS ceiling_ok
    FROM cfg CROSS JOIN truth GROUP BY n_probe, shortlist
    """,
    note="ADAPTIVE-shortlist IVF-PQ (r14 queue head, pre-built: the "
         "fix for the decay sim_ann_ivfpq_corpus_scale measured): on "
         "the full 500-vector panel (cells ~31 rows at 16 cells), the "
         "fixed 50-code shortlist is compared against the capacity "
         "rule shortlist ~ n_probe x cell size (= 125 at n_probe 4). "
         "Measured at sf0.01: (4,50) 42%, (4,125) 45.5%, (8,50) 61%, "
         "(8,125) 74% — and the DECOMPOSITION is the point: at "
         "shortlist 125 recall lands ON the pure-IVF routing ceiling "
         "(91/91 and 148/149 hits vs ivf_query at the same n_probe), "
         "so the residual loss is routing, fixable only by more "
         "probes/cells — while at 50 the ADC truncation eats up to "
         "13.5% extra. ceiling_ok pins the claim: every ADAPTIVE row "
         "must land within 5% of its same-n_probe exact-rescored IVF "
         "hit count (integer-multiplied 20*pq >= 20*ivf - n_exact; "
         "non-adaptive rows pass trivially — their truncation is the "
         "measured phenomenon, not a failure). recall_ok bounds "
         "20/22/30/37 (~2x margin). Serve path unchanged: broadcast "
         "probes, cell-equi code join, salted shortlist rank")
def sim_ann_ivfpq_adaptive_shortlist(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, build_ivf_index, build_pq_codebooks, cosine,
        ivf_query, ivfpq_query, pq_encode, salted_topk)
    emb = tbl(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    c = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    qs = (c.filter(F.col("vec_id") < 20)
          .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    ex = (qs.crossJoin(F.broadcast(c))
          .filter(F.col("vec_id") != F.col("qid"))
          .select("qid", F.col("vec_id").alias("cid"),
                  cosine(F.col("qv"), F.col("v")).alias("s")))
    top_ex = (salted_topk(ex, "qid", [F.col("s").desc(), F.col("cid")],
                          "cid", k=10)
              .select("qid", "cid"))
    n_exact = top_ex.agg(F.count(F.lit(1)).alias("ne"))
    assigned, centroids = build_ivf_index(emb, "vec_id", "embedding",
                                          n_centroids=16, seed=42)
    books = build_pq_codebooks(emb, m_subspaces=8, n_codes=16)
    codes = (pq_encode(emb, books)
             .join(assigned.select("vec_id", "__cell"), "vec_id"))
    queries = emb.filter(F.col("vec_id") < 20)
    ivf_found = {}
    for np_ in sorted({np for np, _, _ in _ADAPTIVE_GRID}):
        ivf_found[np_] = (
            ivf_query(assigned, centroids, queries, k=10, n_probe=np_)
            .select(F.col("query_id").alias("qid"),
                    F.col("vec_id").alias("cid"))
            .join(top_ex, ["qid", "cid"])
            .agg(F.count(F.lit(1)).alias("__ivf")))
    rows = None
    for np_, sl, lo_pct in _ADAPTIVE_GRID:
        got = (ivfpq_query(assigned, centroids, codes, books, emb,
                           queries, k=10, n_probe=np_, shortlist=sl)
               .select(F.col("query_id").alias("qid"),
                       F.col("vec_id").alias("cid")))
        row = (got.join(top_ex, ["qid", "cid"])
               .agg(F.count(F.lit(1)).alias("__found"))
               .crossJoin(F.broadcast(n_exact))
               .crossJoin(F.broadcast(ivf_found[np_]))
               .select(F.lit(np_).cast("int").alias("n_probe"),
                       F.lit(sl).cast("int").alias("shortlist"),
                       F.lit(sl >= 125).alias("adaptive"),
                       F.col("ne").cast("bigint").alias("n_exact"),
                       (F.col("__found") * 100
                        >= F.lit(lo_pct) * F.col("ne"))
                       .alias("recall_ok"),
                       (F.lit(not sl >= 125)
                        | (20 * F.col("__found")
                           >= 20 * F.col("__ivf") - F.col("ne")))
                       .alias("ceiling_ok")))
        rows = row if rows is None else rows.unionByName(row)
    return rows


_NLIST_GRID = ((8, 2, 25), (16, 4, 22), (32, 8, 32))


@register(
    "sim_ann_ivf_nlist_scale",
    oracle=f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 500),
    q AS (SELECT vec_id, v FROM c WHERE vec_id < 20),
    ex AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                      list_dot_product(q.v, c.v)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.v, c.v))) DESC,
                      c.vec_id) AS rn
           FROM q CROSS JOIN c WHERE c.vec_id <> q.vec_id),
    truth AS (SELECT count(*) AS n FROM ex WHERE rn <= 10),
    cfg AS (SELECT CAST(t.nc AS INT) AS n_cells,
                   CAST(t.np AS INT) AS n_probe
            FROM (VALUES {", ".join(f"({nc}, {np})"
                                    for nc, np, _ in _NLIST_GRID)})
                 t(nc, np))
    SELECT n_cells, n_probe,
           CAST(max(truth.n) AS BIGINT) AS n_exact,
           true AS recall_ok, true AS cells_full
    FROM cfg CROSS JOIN truth GROUP BY n_cells, n_probe
    """,
    note="nlist SCALING at constant scan fraction (r14 queue head, "
         "pre-built — the other arm of the capacity rule): exact-"
         "rescored IVF recall on the 500-vector panel at (n_cells, "
         "n_probe) = (8,2)/(16,4)/(32,8), i.e. the SAME 1/4-corpus "
         "scan budget partitioned ever finer. Measured at sf0.01: "
         "50/45.5/64% — deliberately NO monotonicity claim (finer "
         "quantizers usually win at constant scan, but the k-means "
         "partition-quality term is not provably monotone in k, and "
         "the measured dip at 16 cells shows it): the stamped fact is "
         "that nlist moves recall by ~18 points at an IDENTICAL scan "
         "budget, so the faiss nlist ~ sqrt(n) rule is a starting "
         "point one VALIDATES with exactly this measurement, not a "
         "theorem one trusts. recall_ok bounds 25/22/32 (~2x margin); "
         "cells_full pins that every build spread the data (>= half "
         "the cells non-empty, the cell_balance convention). Each "
         "config is one index build + the stamped broadcast-probe "
         "serve; panel-bounded by construction")
def sim_ann_ivf_nlist_scale(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, build_ivf_index, cosine, ivf_query, salted_topk)
    emb = tbl(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    c = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    qs = (c.filter(F.col("vec_id") < 20)
          .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    ex = (qs.crossJoin(F.broadcast(c))
          .filter(F.col("vec_id") != F.col("qid"))
          .select("qid", F.col("vec_id").alias("cid"),
                  cosine(F.col("qv"), F.col("v")).alias("s")))
    top_ex = (salted_topk(ex, "qid", [F.col("s").desc(), F.col("cid")],
                          "cid", k=10)
              .select("qid", "cid"))
    n_exact = top_ex.agg(F.count(F.lit(1)).alias("ne"))
    queries = emb.filter(F.col("vec_id") < 20)
    rows = None
    for n_cells, n_probe, lo_pct in _NLIST_GRID:
        assigned, centroids = build_ivf_index(
            emb, "vec_id", "embedding", n_centroids=n_cells, seed=42)
        occupied = (assigned.groupBy("__cell").agg(F.count(F.lit(1))
                                                   .alias("__c"))
                    .agg(F.count(F.lit(1)).alias("__nc")))
        got = (ivf_query(assigned, centroids, queries, k=10,
                         n_probe=n_probe)
               .select(F.col("query_id").alias("qid"),
                       F.col("vec_id").alias("cid")))
        row = (got.join(top_ex, ["qid", "cid"])
               .agg(F.count(F.lit(1)).alias("__found"))
               .crossJoin(F.broadcast(n_exact))
               .crossJoin(F.broadcast(occupied))
               .select(F.lit(n_cells).cast("int").alias("n_cells"),
                       F.lit(n_probe).cast("int").alias("n_probe"),
                       F.col("ne").cast("bigint").alias("n_exact"),
                       (F.col("__found") * 100
                        >= F.lit(lo_pct) * F.col("ne"))
                       .alias("recall_ok"),
                       (2 * F.col("__nc") >= F.lit(n_cells))
                       .alias("cells_full")))
        rows = row if rows is None else rows.unionByName(row)
    return rows
