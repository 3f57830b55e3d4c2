"""Evaluation-metric and corpus-analysis entries (sixth tranche):
ranking metrics (NDCG/MRR/P@k), per-group ROC AUC, Cohen's kappa,
bigram PMI collocations, Unicode NFC normalization, a count-min
frequency sketch, an equi-width histogram, and a seeded per-key
reservoir sample — the measurement layer a training-data pipeline
wraps around its corpora and quality models.

Reference parity: these are §2C-family analytic workloads a reference
user would hand-roll as MapReduce passes (src/MapReduceWSIImpl.java
runs arbitrary client jobs); here each is one declarative Spark plan
with a bit-exact DuckDB oracle. Determinism discipline matches
plans/q_pipeline.py: md5-derived hashing, tie-broken rank cutoffs,
float expressions mirrored operation-by-operation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.evaluation import (
    cms_build, cms_estimate, cohens_kappa, equiwidth_histogram,
    group_auc, reservoir_sample_per_key, retrieval_metrics)
from mapreduce_wsi_spark.plans.registry import events_tbl, register, tbl


@register(
    "eval_group_auc",
    oracle="""
    WITH base AS (SELECT event_type,
                         CAST(floor(value) AS BIGINT) AS score,
                         CAST(user_id % 2 AS INT) AS label
                  FROM events),
    ps AS (SELECT event_type, score, count(*) AS c,
                  CAST(sum(label) AS BIGINT) AS p
           FROM base GROUP BY 1, 2),
    rk AS (SELECT *, COALESCE(SUM(c) OVER (
               PARTITION BY event_type ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_below
           FROM ps),
    ag AS (SELECT event_type,
                  SUM(p * (cum_below + (c + 1) / 2)) AS r_pos,
                  CAST(SUM(p) AS BIGINT) AS n_pos,
                  CAST(SUM(c) - SUM(p) AS BIGINT) AS n_neg
           FROM rk GROUP BY 1)
    SELECT event_type, n_pos, n_neg,
           round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                 (r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
                 END, 9) AS auc
    FROM ag
    """,
    note="Exact per-group ROC AUC via the Mann-Whitney rank statistic "
         "with AVERAGE ranks for ties (score floors to an integer "
         "precisely so tie blocks exist and the average-rank path is "
         "exercised, not dodged). The window runs over the per-(group, "
         "score) aggregate — one row per distinct score — so the "
         "shuffle is dictionary-sized at any corpus scale. All "
         "intermediate sums are exact multiples of 0.5 (representable "
         "doubles), so partial-aggregation order cannot perturb the "
         "result; label = user_id parity is deterministic")
def eval_group_auc(spark, sf_dir):
    ev = events_tbl(spark, sf_dir)
    df = ev.select(
        "event_type",
        F.floor("value").cast("long").alias("score"),
        (F.col("user_id") % 2).cast("int").alias("label"))
    out = group_auc(df, "event_type", "score", "label")
    return out.select("event_type", "n_pos", "n_neg",
                      F.round("auc", 9).alias("auc"))


@register(
    "eval_cohens_kappa",
    oracle="""
    WITH base AS (SELECT event_type,
        CASE WHEN CAST(floor(value) AS BIGINT) % 2 = 0
             THEN 1 ELSE 0 END AS a,
        CASE WHEN (CAST(floor(value) AS BIGINT) + user_id) % 2 = 0
             THEN 1 ELSE 0 END AS b
        FROM events),
    ag AS (SELECT event_type, count(*) AS n,
                  CAST(sum(a) AS BIGINT) AS na,
                  CAST(sum(b) AS BIGINT) AS nb,
                  CAST(sum(a * b) AS BIGINT) AS nab
           FROM base GROUP BY 1)
    SELECT event_type, n,
           round((2 * nab + n - na - nb) / n, 9) AS p_observed,
           round((na / n) * (nb / n)
                 + (1 - na / n) * (1 - nb / n), 9) AS p_expected,
           round(CASE WHEN (na / n) * (nb / n)
                           + (1 - na / n) * (1 - nb / n) < 1 THEN
                 ((2 * nab + n - na - nb) / n
                  - ((na / n) * (nb / n)
                     + (1 - na / n) * (1 - nb / n)))
                 / (1 - ((na / n) * (nb / n)
                         + (1 - na / n) * (1 - nb / n)))
                 END, 9) AS kappa
    FROM ag
    """,
    note="Cohen's kappa per event_type for two deterministic binary "
         "annotators (value-parity and value+user parity — ~50/50 "
         "marginals with partial agreement, so kappa is properly "
         "between 0 and 1, not degenerate). One aggregation pass: the "
         "four confusion cells reduce map-side from integer parities; "
         "p_o, p_e and kappa are float expressions mirrored "
         "operation-for-operation in the oracle")
def eval_cohens_kappa(spark, sf_dir):
    ev = events_tbl(spark, sf_dir)
    iv = F.floor("value").cast("long")
    df = ev.select(
        "event_type",
        (iv % 2 == 0).cast("int").alias("a"),
        ((iv + F.col("user_id")) % 2 == 0).cast("int").alias("b"))
    out = cohens_kappa(df, "event_type", "a", "b")
    return out.select("event_type", "n",
                      F.round("p_observed", 9).alias("p_observed"),
                      F.round("p_expected", 9).alias("p_expected"),
                      F.round("kappa", 9).alias("kappa"))


_EVAL_QUERIES = ("scan", "window", "customer")


@register(
    "eval_retrieval_metrics",
    oracle=f"""
    WITH q AS (SELECT unnest({list(_EVAL_QUERIES)}) AS query),
    sc AS (SELECT q.query, d.doc_id,
               CAST((length(substr(d.text, 1, 200))
                     - length(replace(substr(d.text, 1, 200),
                                      q.query, '')))
                    / length(q.query) AS INT) AS score,
               least(CAST((length(d.text)
                           - length(replace(d.text, q.query, '')))
                          / length(q.query) AS INT), 3) AS rel
           FROM documents d CROSS JOIN q),
    top AS (SELECT *, row_number() OVER (
                PARTITION BY query ORDER BY score DESC, doc_id) AS pos
            FROM sc QUALIFY pos <= 10),
    sys AS (SELECT query,
                SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) / 10 AS p_at_k,
                COALESCE(MAX(CASE WHEN rel > 0 THEN 1.0 / pos END),
                         0.0) AS mrr,
                SUM((pow(2.0, rel) - 1) / log2(pos + 1)) AS dcg
            FROM top GROUP BY 1),
    ideal AS (SELECT query,
                  SUM((pow(2.0, rel) - 1) / log2(pos + 1)) AS idcg
              FROM (SELECT *, row_number() OVER (
                        PARTITION BY query ORDER BY rel DESC, doc_id)
                        AS pos
                    FROM sc QUALIFY pos <= 10)
              GROUP BY 1)
    SELECT s.query, round(s.p_at_k, 9) AS p_at_k,
           round(s.mrr, 9) AS mrr, round(s.dcg, 9) AS dcg,
           round(CASE WHEN i.idcg > 0 THEN s.dcg / i.idcg END, 9)
               AS ndcg
    FROM sys s JOIN ideal i USING (query)
    """,
    note="Graded-relevance ranking evaluation at k=10 per query: "
         "precision@k, MRR, DCG and NDCG against the ideal ordering "
         "over ALL candidates (the standard definition, not "
         "ideal-of-retrieved). The system ranks by term frequency in "
         "the first 200 chars while relevance grades on the full text "
         "capped at 3 — correlated but different signals, so every "
         "metric lands strictly inside (0, 1). Both rank cutoffs are "
         "top-k-per-group windows with doc_id tie-breaks for "
         "engine-stable boundaries; tf counting is the "
         "substring-occurrence identity (len - len(removed))/len(q) "
         "on both engines")
def eval_retrieval_metrics(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    from mapreduce_wsi_spark.util import literal_df
    qdf = literal_df(spark, [(q,) for q in _EVAL_QUERIES],
                     "query string")
    head = F.substring("text", 1, 200)
    qlen = F.length("query")

    def tf(col):
        return ((F.length(col)
                 - F.length(F.replace(col, F.col("query"), F.lit(""))))
                / qlen).cast("int")

    scored = docs.crossJoin(F.broadcast(qdf)).select(
        "query", "doc_id",
        tf(head).alias("score"),
        F.least(tf(F.col("text")), F.lit(3)).alias("rel"))
    out = retrieval_metrics(scored, "query", "doc_id", "score", "rel",
                            k=10)
    return out.select("query",
                      F.round("p_at_k", 9).alias("p_at_k"),
                      F.round("mrr", 9).alias("mrr"),
                      F.round("dcg", 9).alias("dcg"),
                      F.round("ndcg", 9).alias("ndcg"))


@register(
    "text_bigram_pmi",
    oracle="""
    WITH tk AS (
        SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(
                         regexp_replace(text, '[^a-zA-Z]+', ' ', 'g')),
                         ' '), x -> x <> '') AS l
              FROM documents) t),
    bg AS (SELECT a.w AS w1, b.w AS w2, count(*) AS cxy
           FROM tk a JOIN tk b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
           GROUP BY 1, 2),
    cw AS (SELECT w, count(*) AS c FROM tk GROUP BY 1),
    tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM cw) AS nt,
                   (SELECT CAST(sum(cxy) AS BIGINT) FROM bg) AS nb)
    SELECT b.w1, b.w2, b.cxy,
           round(ln(CAST(b.cxy AS DOUBLE) * t.nt * t.nt
                    / (CAST(t.nb AS DOUBLE) * cx.c * cy.c)), 9) AS pmi
    FROM bg b
    JOIN cw cx ON cx.w = b.w1
    JOIN cw cy ON cy.w = b.w2
    CROSS JOIN tot t
    WHERE b.cxy >= 10
    ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
    note="Pointwise mutual information collocations: adjacent-token "
         "bigrams vs unigram marginals, pmi = ln(c_xy * N_t^2 / (N_b * "
         "c_x * c_y)), support >= 10, top 20 by (rounded pmi, w1, w2) "
         "so the cutoff is engine-stable. Spark builds bigrams with "
         "ZERO joins — slice+arrays_zip inside the row, one explode — "
         "and joins only the tiny unigram dictionary back (broadcast; "
         "a 100 TB corpus still has a broadcastable vocabulary). The "
         "oracle mirrors via generate_subscripts + a positional "
         "self-join, a deliberately different construction converging "
         "on the same counts")
def text_bigram_pmi(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.regexp_replace(F.lower("text"), "[^a-zA-Z]+", " "),
                " "),
        lambda x: x != "")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.arrays_zip(F.slice(toks, 1, n1).alias("w1"),
                         F.slice(toks, 2, n1).alias("w2"))
    tokens = docs.select(F.explode(toks).alias("w"))
    cw = tokens.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    bg = (docs.select(F.explode(pairs).alias("p"))
          .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cxy")))
    tot = cw.agg(F.sum("c").alias("nt")).crossJoin(
        bg.agg(F.sum("cxy").alias("nb")))
    out = (bg.where(F.col("cxy") >= 10)
           .join(F.broadcast(cw.select(F.col("w").alias("w1"),
                                       F.col("c").alias("cx"))), "w1")
           .join(F.broadcast(cw.select(F.col("w").alias("w2"),
                                       F.col("c").alias("cy"))), "w2")
           .crossJoin(F.broadcast(tot)))
    pmi = F.log(F.col("cxy").cast("double") * F.col("nt") * F.col("nt")
                / (F.col("nb").cast("double") * F.col("cx")
                   * F.col("cy")))
    return (out.select("w1", "w2", "cxy",
                       F.round(pmi, 9).alias("pmi"))
            .orderBy(F.col("pmi").desc(), "w1", "w2").limit(20))


@register(
    "text_nfc_normalize",
    oracle="""
    WITH d AS (SELECT doc_id,
                      replace(text, 'e', 'e' || chr(769)) AS t
               FROM documents)
    SELECT doc_id, length(t) AS len_raw,
           length(nfc_normalize(t)) AS len_nfc,
           md5(nfc_normalize(t)) AS nfc_md5
    FROM d
    """,
    note="Unicode NFC normalization through an Arrow-batched pandas UDF "
         "over stdlib unicodedata (the documented exception to the "
         "no-Python rule — Spark has no built-in normalizer; the UDF "
         "is a map-only projection that fuses over the scan). The "
         "fixture is made non-trivial by injecting combining acute "
         "accents after every 'e'; NFC must fold each 2-codepoint "
         "sequence to precomposed U+00E9, pinned by codepoint lengths "
         "AND an md5 over the normalized text vs DuckDB's native "
         "nfc_normalize()")
def text_nfc_normalize(spark, sf_dir):
    from mapreduce_wsi_spark.operators.text import nfc_normalize

    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace("text", "e", "e\u0301").alias("text"))
    out = nfc_normalize(docs)
    return out.select(
        "doc_id",
        F.length("text").alias("len_raw"),
        F.length("text_nfc").alias("len_nfc"),
        F.md5("text_nfc").alias("nfc_md5"))


@register(
    "sketch_cms_frequency",
    oracle="""
    WITH k AS (SELECT l_partkey FROM lineitem),
    seeds AS (SELECT unnest([0, 1, 2, 3]) AS seed),
    sk AS (SELECT s.seed,
                  CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)),
                       s.seed * 8 + 1, 8)) AS BIGINT) % 256 AS bucket,
                  count(*) AS cnt
           FROM k CROSS JOIN seeds s GROUP BY 1, 2),
    pr AS (SELECT DISTINCT l_partkey FROM k WHERE l_partkey % 97 = 0),
    est AS (SELECT p.l_partkey,
                   min(COALESCE(sk.cnt, 0)) AS cms_est
            FROM pr p CROSS JOIN seeds s
            LEFT JOIN sk ON sk.seed = s.seed AND sk.bucket =
                CAST(('0x' || substr(md5(CAST(p.l_partkey AS VARCHAR)),
                     s.seed * 8 + 1, 8)) AS BIGINT) % 256
            GROUP BY 1),
    ex AS (SELECT l_partkey, count(*) AS exact_cnt
           FROM k WHERE l_partkey % 97 = 0 GROUP BY 1)
    SELECT e.l_partkey, ex.exact_cnt, e.cms_est,
           e.cms_est - ex.exact_cnt AS overcount
    FROM est e JOIN ex USING (l_partkey)
    """,
    note="Count-min sketch, fully oracle-checked: 4 hash "
         "rows x 256 buckets carved from ONE md5 digest per key (each row reads its own 8-hex window — 4 hashes for one digest cost; deterministic buckets, so the SKETCH "
         "itself matches DuckDB bit-for-bit, not just a contract), "
         "probed for every l_partkey divisible by 97 and compared "
         "against exact counts — overcount = est - exact makes the "
         "collision error visible and est >= exact is structural. The "
         "sketch is depth*width rows total regardless of corpus size "
         "and broadcast-joins to the probes; the corpus is scanned "
         "once per seed for the build and never again for estimates")
def sketch_cms_frequency(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").select("l_partkey")
    sketch = cms_build(li, "l_partkey", depth=4, width=256)
    probes = li.where(F.col("l_partkey") % 97 == 0).distinct()
    est = cms_estimate(probes, sketch, "l_partkey", depth=4, width=256)
    exact = (li.where(F.col("l_partkey") % 97 == 0)
             .groupBy("l_partkey")
             .agg(F.count(F.lit(1)).alias("exact_cnt")))
    return (est.join(exact, "l_partkey")
            .select("l_partkey", "exact_cnt", "cms_est",
                    (F.col("cms_est") - F.col("exact_cnt"))
                    .alias("overcount")))


@register(
    "hist_equiwidth_prices",
    oracle="""
    WITH b AS (SELECT min(l_extendedprice) AS mn,
                      max(l_extendedprice) AS mx
               FROM lineitem),
    bi AS (SELECT CAST(CASE WHEN b.mx = b.mn THEN 0 ELSE
                      least(19, CAST(floor((l_extendedprice - b.mn)
                            / (b.mx - b.mn) * 20) AS BIGINT))
                      END AS INT) AS bin,
                  b.mn, b.mx
           FROM lineitem CROSS JOIN b)
    SELECT bin, round(mn + bin * (mx - mn) / 20, 9) AS bin_lo,
           count(*) AS n
    FROM bi GROUP BY bin, mn, mx
    """,
    note="Equi-width histogram of l_extendedprice into 20 bins: the "
         "1-row min/max aggregate broadcasts into a map-side bin "
         "assignment (plan-pinned broadcast cross join against one "
         "row), then one tiny group-by on bin id — the two-pass "
         "pattern any distribution profile uses at scale. The max "
         "folds into the last bin (least(19, ...)); bin edges are the "
         "same double expression on both engines")
def hist_equiwidth_prices(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").select("l_extendedprice")
    out = equiwidth_histogram(li, "l_extendedprice", n_bins=20)
    return out.select("bin", F.round("bin_lo", 9).alias("bin_lo"), "n")


@register(
    "sample_reservoir_per_key",
    oracle="""
    SELECT event_type, event_id, CAST(rn AS INT) AS smp_rank
    FROM (SELECT event_type, event_id,
                 row_number() OVER (
                     PARTITION BY event_type
                     ORDER BY md5(CAST(event_id AS VARCHAR))) AS rn
          FROM events)
    WHERE rn <= 5
    """,
    note="Seeded per-key uniform sample: the 5 events with the "
         "smallest md5(event_id) per event_type — a deterministic "
         "reservoir (a uniform hash induces a uniform k-subset) that "
         "is reproducible across engines and reruns, unlike Algorithm "
         "R's RNG state. Top-k-per-group window on the hash; ranks "
         "are part of the output so the oracle pins the full order of "
         "the kept rows, not just membership")
def sample_reservoir_per_key(spark, sf_dir):
    ev = events_tbl(spark, sf_dir).select("event_type", "event_id")
    out = reservoir_sample_per_key(ev, "event_type", "event_id", k=5)
    return out.select("event_type", "event_id",
                      F.col("smp_rank").cast("int").alias("smp_rank"))


@register(
    "eval_calibration_curve",
    oracle="""
    WITH base AS (SELECT (value % 100) / 100 AS p,
        CASE WHEN user_id % 100 < CAST(floor(value % 100) AS BIGINT)
             THEN 1 ELSE 0 END AS y
        FROM events),
    b2 AS (SELECT CAST(least(9, CAST(floor(p * 10) AS BIGINT)) AS INT)
                      AS bin,
                  CAST(round(p, 9) AS DECIMAL(18,9)) AS p_dec, y
           FROM base),
    ag AS (SELECT bin, count(*) AS n, sum(p_dec) AS sum_p,
                  CAST(sum(y) AS BIGINT) AS n_pos
           FROM b2 GROUP BY 1)
    SELECT bin, n, n_pos,
           round(CAST(sum_p AS DOUBLE) / n, 9) AS mean_p,
           round(n_pos / n, 9) AS frac_pos
    FROM ag
    """,
    note="Reliability diagram for a probabilistic classifier: a "
         "synthetic well-calibrated model (p from the value fraction, "
         "outcome drawn by comparing an independent user-id residue "
         "against p — so frac_pos tracks mean_p across bins) bucketed "
         "into 10 equal probability bins. Mean predicted probability "
         "sums 9dp DECIMALs (exact — partial-agg order cannot perturb "
         "it, the repo's decimal-centroid trick) and the observed rate "
         "is an integer-count ratio; ONE tiny group-by, no window, no "
         "join")
def eval_calibration_curve(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import (
        calibration_curve)

    ev = events_tbl(spark, sf_dir)
    p = (F.col("value") % 100) / 100
    y = (F.col("user_id") % 100
         < F.floor(F.col("value") % 100).cast("long")).cast("int")
    df = ev.select(p.alias("p"), y.alias("y"))
    out = calibration_curve(df, "p", "y", n_bins=10)
    return out.select("bin", "n", "n_pos",
                      F.round("mean_p", 9).alias("mean_p"),
                      F.round("frac_pos", 9).alias("frac_pos"))


@register(
    "eval_confusion_f1",
    oracle="""
    WITH base AS (SELECT
        CASE CAST(floor(value) AS BIGINT) % 3
             WHEN 0 THEN 'a' WHEN 1 THEN 'b' ELSE 'c' END AS truth,
        CASE (CAST(floor(value) AS BIGINT) + user_id) % 3
             WHEN 0 THEN 'a' WHEN 1 THEN 'b' ELSE 'c' END AS pred
        FROM events),
    cells AS (SELECT truth, pred, count(*) AS cnt
              FROM base GROUP BY 1, 2),
    tp AS (SELECT truth AS cls, cnt AS tp FROM cells
           WHERE truth = pred),
    pm AS (SELECT pred AS cls, CAST(sum(cnt) AS BIGINT) AS n_pred
           FROM cells GROUP BY 1),
    tm AS (SELECT truth AS cls, CAST(sum(cnt) AS BIGINT) AS n_truth
           FROM cells GROUP BY 1),
    m AS (SELECT COALESCE(tm.cls, pm.cls) AS cls,
                 COALESCE(tp.tp, 0) AS tp,
                 COALESCE(pm.n_pred, 0) AS n_pred,
                 COALESCE(tm.n_truth, 0) AS n_truth
          FROM tm FULL OUTER JOIN pm ON tm.cls = pm.cls
          LEFT JOIN tp ON COALESCE(tm.cls, pm.cls) = tp.cls),
    pr AS (SELECT cls, tp, n_pred, n_truth,
                  CASE WHEN n_pred > 0 THEN tp / n_pred END AS p,
                  CASE WHEN n_truth > 0 THEN tp / n_truth END AS r
           FROM m)
    SELECT cls, tp, n_pred, n_truth,
           round(p, 9) AS precision, round(r, 9) AS recall,
           round(CASE WHEN COALESCE(p, 0) + COALESCE(r, 0) > 0 THEN
                 2 * COALESCE(p, 0) * COALESCE(r, 0)
                 / (COALESCE(p, 0) + COALESCE(r, 0)) END, 9) AS f1
    FROM pr
    """,
    note="Multiclass confusion-matrix metrics: per-class precision / "
         "recall / F1 from deterministic 3-class truth and prediction "
         "derivations (value residue vs value+user residue — partial "
         "agreement on the diagonal). One shuffle to the "
         "|classes|^2-row cell table; margins and the diagonal join "
         "back broadcast. F1 guards the 0/0 case as NULL; float "
         "expressions mirrored operation-for-operation")
def eval_confusion_f1(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import confusion_f1

    ev = events_tbl(spark, sf_dir)
    iv = F.floor("value").cast("long")
    letters = F.array(F.lit("a"), F.lit("b"), F.lit("c"))
    df = ev.select(
        F.element_at(letters, (iv % 3 + 1).cast("int")).alias("truth"),
        F.element_at(letters,
                     ((iv + F.col("user_id")) % 3 + 1).cast("int"))
        .alias("pred"))
    out = confusion_f1(df, "truth", "pred")
    return out.select("cls", "tp", "n_pred", "n_truth",
                      F.round("precision", 9).alias("precision"),
                      F.round("recall", 9).alias("recall"),
                      F.round("f1", 9).alias("f1"))


# ---- storage & privacy additions (r6) --------------------------------


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    note="ORC source/sink roundtrip: the documents projection writes as "
         "ORC (Spark's second native columnar format — the engine must "
         "not be parquet-only) and the aggregate runs over the "
         "read-back, so writer schema mapping, reader predicate/column "
         "plumbing and type fidelity (string + int64) are all on the "
         "verified path; the DuckDB twin aggregates the original "
         "parquet, so any roundtrip corruption breaks the hash. Files "
         "land under the system temp dir, overwritten per run — the "
         "entry is idempotent")
def source_orc_roundtrip(spark, sf_dir):
    from mapreduce_wsi_spark.util import scratch_dir

    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    path = scratch_dir("orc_roundtrip", sf_dir)
    docs.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("total_chars"))


@register(
    "join_privacy_hashed",
    oracle="""
    WITH c AS (SELECT sha256('pepper:' || CAST(c_custkey AS VARCHAR))
                   AS hk, c_mktsegment
               FROM customer),
         o AS (SELECT sha256('pepper:' || CAST(o_custkey AS VARCHAR))
                   AS hk, o_totalprice
               FROM orders)
    SELECT c_mktsegment, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_revenue
    FROM c JOIN o USING (hk) GROUP BY 1
    """,
    note="Privacy-preserving join: both sides tokenize the shared key "
         "as sha256(pepper || key) and join on the 64-hex token — the "
         "standard pattern for joining datasets across a trust "
         "boundary without exchanging raw identifiers (a real pepper "
         "lives in a secret store; here it is a literal so the DuckDB "
         "twin can re-derive it). Scale shape: the hashed key is "
         "maximum-entropy, so the shuffle is perfectly balanced by "
         "construction — hashing the key SOLVES key skew as a side "
         "effect; revenue sums round at 2dp, far above double "
         "accumulation noise")
def join_privacy_hashed(spark, sf_dir):
    def hk(col):
        return F.sha2(F.concat(F.lit("pepper:"), col.cast("string")),
                      256)

    cust = tbl(spark, sf_dir, "customer").select(
        hk(F.col("c_custkey")).alias("hk"), "c_mktsegment")
    orders = tbl(spark, sf_dir, "orders").select(
        hk(F.col("o_custkey")).alias("hk"), "o_totalprice")
    joined = cust.join(orders, "hk")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue"))


# ---- corpus statistics (r6) ------------------------------------------


@register(
    "text_zipf_fit",
    oracle="""
    WITH tk AS (SELECT unnest(list_filter(string_split_regex(lower(
                    regexp_replace(text, '[^a-zA-Z]+', ' ', 'g')), ' '),
                    x -> x <> '')) AS w
                FROM documents),
    top AS (SELECT w, count(*) AS c FROM tk GROUP BY 1
            ORDER BY c DESC, w LIMIT 30),
    rk AS (SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w)
                          AS DOUBLE)) AS x,
                  ln(CAST(c AS DOUBLE)) AS y
           FROM top),
    ag AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                  sum(x * x) AS sxx, sum(x * y) AS sxy
           FROM rk)
    SELECT CAST(n AS INT) AS n_points,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
               AS zipf_slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 9) AS intercept
    FROM ag
    """,
    note="Zipf's-law fit over the top-30 token frequencies: least "
         "squares of ln(count) ~ ln(rank) — the slope is the corpus's "
         "Zipf exponent (natural language ~ -1; this synthetic "
         "word-salad is much flatter, which is exactly what the "
         "statistic is for: distribution-shape QA of a corpus before "
         "training). Scale shape: the top-30 cut lowers to "
         "TakeOrderedAndProject (NO dictionary-wide window — the "
         "vocab_oov lesson) and the rank window runs over 30 rows; "
         "the regression formula is mirrored symbol-for-symbol")
def text_zipf_fit(spark, sf_dir):
    from pyspark.sql import Window

    docs = tbl(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.regexp_replace(F.lower("text"), "[^a-zA-Z]+", " "),
                " "),
        lambda x: x != "")
    top = (docs.select(F.explode(toks).alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
           .orderBy(F.col("c").desc(), "w").limit(30))
    w = Window.orderBy(F.col("c").desc(), "w")
    rk = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"))
    ag = rk.agg(F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"))
    n, sx, sy, sxx, sxy = (F.col(c) for c in
                           ("n", "sx", "sy", "sxx", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return ag.select(
        n.cast("int").alias("n_points"),
        F.round(slope, 9).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 9).alias("intercept"))


@register(
    "text_heaps_law",
    oracle="""
    WITH tk AS (SELECT doc_id,
                       unnest(list_filter(string_split_regex(lower(
                           regexp_replace(text, '[^a-zA-Z]+', ' ',
                                          'g')), ' '),
                           x -> x <> '')) AS w
                FROM documents),
    fs AS (SELECT w, min(doc_id) AS first_seen FROM tk GROUP BY 1),
    mx AS (SELECT max(doc_id) AS mxd FROM documents),
    cp AS (SELECT k, CAST(floor(mx.mxd * k / 10.0) AS BIGINT) AS cut
           FROM generate_series(1, 10) g(k), mx),
    vocab AS (SELECT cp.k, cp.cut, count(*) AS vocab_size
              FROM cp JOIN fs ON fs.first_seen <= cp.cut
              GROUP BY 1, 2),
    dn AS (SELECT cp.k, count(*) AS n_docs
           FROM cp JOIN documents d ON d.doc_id <= cp.cut GROUP BY 1)
    SELECT v.k AS decile, v.cut, dn.n_docs, v.vocab_size
    FROM vocab v JOIN dn USING (k)
    """,
    note="Heaps'-law vocabulary-growth curve: distinct-vocabulary size "
         "at 10 corpus-prefix checkpoints, computed WITHOUT any "
         "cumulative-distinct scan — each token's first-seen doc is "
         "one dictionary aggregate (min doc_id per token), and vocab "
         "size at a checkpoint is a count over first_seen <= cut, so "
         "the whole curve costs one token shuffle + a 10-row broadcast "
         "join. The flattening rate tells you whether more crawl "
         "genuinely buys new vocabulary; all outputs are exact "
         "integers")
def text_heaps_law(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.regexp_replace(F.lower("text"), "[^a-zA-Z]+", " "),
                " "),
        lambda x: x != "")
    fs = (docs.select("doc_id", F.explode(toks).alias("w"))
          .groupBy("w").agg(F.min("doc_id").alias("first_seen")))
    mx = docs.agg(F.max("doc_id").alias("mxd"))
    cp = (spark.range(1, 11).select(F.col("id").cast("int").alias("k"))
          .crossJoin(F.broadcast(mx))
          .select("k", F.floor(F.col("mxd") * F.col("k") / 10.0)
                  .cast("long").alias("cut")))
    vocab = (fs.crossJoin(F.broadcast(cp))
             .where(F.col("first_seen") <= F.col("cut"))
             .groupBy("k", "cut")
             .agg(F.count(F.lit(1)).alias("vocab_size")))
    dn = (docs.select("doc_id").crossJoin(F.broadcast(cp))
          .where(F.col("doc_id") <= F.col("cut"))
          .groupBy("k").agg(F.count(F.lit(1)).alias("n_docs")))
    return (vocab.join(dn, "k")
            .select(F.col("k").alias("decile"), "cut", "n_docs",
                    "vocab_size"))


@register(
    "embedding_covariance_topk",
    oracle="""
    WITH e AS (SELECT embedding FROM embeddings),
    pairs AS (SELECT g1.i, g2.j
              FROM generate_series(1, 64) g1(i),
                   generate_series(1, 64) g2(j)
              WHERE g1.i < g2.j),
    s AS (SELECT p.i, p.j,
                 sum(CAST(e.embedding[p.i] AS DOUBLE)
                     * CAST(e.embedding[p.j] AS DOUBLE)) AS sij
          FROM e, pairs p GROUP BY 1, 2),
    m AS (SELECT g.i, sum(CAST(e.embedding[g.i] AS DOUBLE)) AS si
          FROM e, generate_series(1, 64) g(i) GROUP BY 1),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e)
    SELECT s.i - 1 AS i, s.j - 1 AS j,
           round((s.sij - m1.si * m2.si / n.n) / n.n, 9) AS cov
    FROM s JOIN m m1 ON m1.i = s.i JOIN m m2 ON m2.i = s.j
    CROSS JOIN n
    ORDER BY abs(round((s.sij - m1.si * m2.si / n.n) / n.n, 9)) DESC,
             i, j
    LIMIT 20
    """,
    note="Embedding-dimension covariance profile: the top-20 "
         "off-diagonal |cov(i,j)| pairs — strongly covarying "
         "dimensions flag redundant representation capacity (and "
         "predict random-projection / int8-quantization fidelity). "
         "Spark accumulates E^T E per partition in ONE Arrow kernel "
         "(numpy float64; float32 inputs make every product exact) and "
         "merges O(dim^2)-row partials — corpus size never crosses the "
         "shuffle; the oracle recomputes all 2016 pair sums "
         "relationally. 9dp rounding happens BEFORE the top-k order "
         "(ties on (i,j)) so the cutoff is engine-stable")
def embedding_covariance_topk(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import covariance_topk

    emb = tbl(spark, sf_dir, "embeddings")
    return covariance_topk(emb, "embedding", dim=64, k=20)


@register(
    "embedding_pca_power",
    oracle="""
    WITH e AS (SELECT embedding FROM embeddings),
    pr AS (SELECT g1.i, g2.j
           FROM generate_series(1, 64) g1(i), generate_series(1, 64) g2(j)
           WHERE g1.i <= g2.j),
    s AS (SELECT p.i, p.j,
                 sum(CAST(e.embedding[p.i] AS DOUBLE)
                     * CAST(e.embedding[p.j] AS DOUBLE)) AS sij
          FROM e, pr p GROUP BY 1, 2),
    m AS (SELECT g.i, sum(CAST(e.embedding[g.i] AS DOUBLE)) AS si
          FROM e, generate_series(1, 64) g(i) GROUP BY 1),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
    up AS (SELECT s.i - 1 AS i, s.j - 1 AS j,
                  round((s.sij - m1.si * m2.si / n.n) / n.n, 9) AS cov
           FROM s JOIN m m1 ON m1.i = s.i JOIN m m2 ON m2.i = s.j
           CROSS JOIN n),
    cov AS (SELECT i, j, cov FROM up
            UNION ALL
            SELECT j AS i, i AS j, cov FROM up WHERE i < j),
    v0 AS (SELECT g.i - 1 AS i, 0.125 AS x
           FROM generate_series(1, 64) g(i)),
    w1 AS (SELECT c.i, SUM(CAST(c.cov * v.x AS DECIMAL(28,9))) AS w
             FROM cov c JOIN v0 v ON v.i = c.j GROUP BY c.i),
    n1 AS (SELECT sqrt(CAST(SUM(CAST(CAST(w AS DOUBLE) * CAST(w AS DOUBLE)
                 AS DECIMAL(28,9))) AS DOUBLE)) AS nrm FROM w1),
    v1 AS (SELECT i, round(CAST(w AS DOUBLE) / nrm, 9) AS x
             FROM w1, n1),
    w2 AS (SELECT c.i, SUM(CAST(c.cov * v.x AS DECIMAL(28,9))) AS w
             FROM cov c JOIN v1 v ON v.i = c.j GROUP BY c.i),
    n2 AS (SELECT sqrt(CAST(SUM(CAST(CAST(w AS DOUBLE) * CAST(w AS DOUBLE)
                 AS DECIMAL(28,9))) AS DOUBLE)) AS nrm FROM w2),
    v2 AS (SELECT i, round(CAST(w AS DOUBLE) / nrm, 9) AS x
             FROM w2, n2),
    w3 AS (SELECT c.i, SUM(CAST(c.cov * v.x AS DECIMAL(28,9))) AS w
             FROM cov c JOIN v2 v ON v.i = c.j GROUP BY c.i),
    n3 AS (SELECT sqrt(CAST(SUM(CAST(CAST(w AS DOUBLE) * CAST(w AS DOUBLE)
                 AS DECIMAL(28,9))) AS DOUBLE)) AS nrm FROM w3),
    v3 AS (SELECT i, round(CAST(w AS DOUBLE) / nrm, 9) AS x
             FROM w3, n3),
    w4 AS (SELECT c.i, SUM(CAST(c.cov * v.x AS DECIMAL(28,9))) AS w
             FROM cov c JOIN v3 v ON v.i = c.j GROUP BY c.i),
    n4 AS (SELECT sqrt(CAST(SUM(CAST(CAST(w AS DOUBLE) * CAST(w AS DOUBLE)
                 AS DECIMAL(28,9))) AS DOUBLE)) AS nrm FROM w4),
    v4 AS (SELECT i, round(CAST(w AS DOUBLE) / nrm, 9) AS x
             FROM w4, n4),
    w5 AS (SELECT c.i, SUM(CAST(c.cov * v.x AS DECIMAL(28,9))) AS w
             FROM cov c JOIN v4 v ON v.i = c.j GROUP BY c.i),
    n5 AS (SELECT sqrt(CAST(SUM(CAST(CAST(w AS DOUBLE) * CAST(w AS DOUBLE)
                 AS DECIMAL(28,9))) AS DOUBLE)) AS nrm FROM w5),
    v5 AS (SELECT i, round(CAST(w AS DOUBLE) / nrm, 9) AS x
             FROM w5, n5),
    w6 AS (SELECT c.i, SUM(CAST(c.cov * v.x AS DECIMAL(28,9))) AS w
             FROM cov c JOIN v5 v ON v.i = c.j GROUP BY c.i),
    n6 AS (SELECT sqrt(CAST(SUM(CAST(CAST(w AS DOUBLE) * CAST(w AS DOUBLE)
                 AS DECIMAL(28,9))) AS DOUBLE)) AS nrm FROM w6),
    v6 AS (SELECT i, round(CAST(w AS DOUBLE) / nrm, 9) AS x
             FROM w6, n6),
    lam AS (SELECT CAST(SUM(CAST(c.cov * vi.x * vj.x AS DECIMAL(28,9)))
                        AS DOUBLE) AS eigenvalue
            FROM cov c JOIN v6 vi ON vi.i = c.i
                       JOIN v6 vj ON vj.i = c.j)
    SELECT v.i AS dim_idx, v.x AS component, lam.eigenvalue
    FROM v6 v, lam
    """,
    note="Top principal component of the embedding corpus by power "
         "iteration (6 rounds) on the 9dp-rounded covariance matrix — "
         "distributed PCA step one (whitening / all-but-the-top "
         "dominant-direction removal). The data-sized work is ONE "
         "Arrow moment pass (shared _embedding_moments kernel, "
         "O(dim^2) partials per partition); iterations are broadcast "
         "matrix-vector rounds with every term cast to DECIMAL(28,9) "
         "before the order-free sum, norms squared the same way, and "
         "components re-rounded to 9dp — so Spark and the unrolled-CTE "
         "DuckDB twin walk bit-identical iterates "
         "(operators/similarity.py::pca_power_component)")
def embedding_pca_power(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import (
        pca_power_component)

    emb = tbl(spark, sf_dir, "embeddings")
    return pca_power_component(emb, "embedding", dim=64, n_iter=6)


@register(
    "eval_log_loss_brier",
    oracle="""
    WITH base AS (SELECT event_type,
                         (CAST(floor(value) AS BIGINT) % 99 + 0.5) / 100
                             AS p,
                         CAST(user_id % 2 AS BIGINT) AS y
                  FROM events),
    t AS (SELECT event_type,
                 CAST(-(y * ln(p) + (1 - y) * ln(1 - p))
                      AS DECIMAL(28,9)) AS ll,
                 (CAST(round(p, 9) AS DECIMAL(18,9)) - y)
                 * (CAST(round(p, 9) AS DECIMAL(18,9)) - y) AS sq
          FROM base)
    SELECT event_type, count(*) AS n,
           round(CAST(sum(ll) AS DOUBLE) / count(*), 9) AS log_loss,
           round(CAST(sum(sq) AS DOUBLE) / count(*), 9) AS brier
    FROM t GROUP BY event_type
    """,
    note="Per-group log loss + Brier score (the two proper scoring "
         "rules next to AUC): each row's -[y ln p + (1-y) ln(1-p)] "
         "term rounds to DECIMAL(28,9) before the sum and the squared "
         "error is exact decimal arithmetic over a 9dp-quantized p, "
         "so partial-aggregation order never shows. One partial+final "
         "aggregation; |groups| output rows at any scale. p derives "
         "from floor(value)%99 + 0.5 — strictly inside (0,1) so both "
         "logs are finite (operators/evaluation.py::log_loss_brier)")
def eval_log_loss_brier(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import log_loss_brier

    ev = events_tbl(spark, sf_dir)
    df = ev.select(
        "event_type",
        ((F.floor("value").cast("long") % 99 + 0.5) / 100).alias("p"),
        (F.col("user_id") % 2).cast("long").alias("y"))
    out = log_loss_brier(df, "event_type", "p", "y")
    return out.select("event_type", "n",
                      F.round("log_loss", 9).alias("log_loss"),
                      F.round("brier", 9).alias("brier"))


@register(
    "eval_spearman_corr",
    oracle="""
    WITH r AS (SELECT l_returnflag AS grp,
                      2 * rank() OVER (PARTITION BY l_returnflag
                                       ORDER BY l_quantity)
                      + count(*) OVER (PARTITION BY l_returnflag,
                                       l_quantity) - 2 AS dx,
                      2 * rank() OVER (PARTITION BY l_returnflag
                                       ORDER BY l_extendedprice)
                      + count(*) OVER (PARTITION BY l_returnflag,
                                       l_extendedprice) - 2 AS dy
               FROM lineitem),
    a AS (SELECT grp, count(*) AS n,
                 CAST(sum(dx) AS BIGINT) AS sx,
                 CAST(sum(dy) AS BIGINT) AS sy,
                 CAST(sum(dx * dy) AS BIGINT) AS sxy,
                 CAST(sum(dx * dx) AS BIGINT) AS sxx,
                 CAST(sum(dy * dy) AS BIGINT) AS syy
          FROM r GROUP BY grp)
    SELECT grp, n,
           round(CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                            * sx / n) > 0
                       AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                            * sy / n) > 0 THEN
                 (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                 / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                         * sx / n)
                        * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                           * sy / n)) END, 9) AS spearman
    FROM a
    """,
    note="Per-group Spearman rank correlation (quantity vs price) "
         "with average-rank ties via EXACT integer doubled ranks: "
         "2*rank + ties - 2 is an integer, so every moment aggregates "
         "as an exact BIGINT and Pearson over doubled ranks equals "
         "Pearson over average ranks (scale invariance). Two rank "
         "windows share one group exchange; the float math happens "
         "once per group (operators/evaluation.py::spearman_corr)")
def eval_spearman_corr(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import spearman_corr

    li = tbl(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"), "l_quantity",
        "l_extendedprice")
    out = spearman_corr(li, "grp", "l_quantity", "l_extendedprice")
    return out.select("grp", "n",
                      F.round("spearman", 9).alias("spearman"))


@register(
    "eval_average_precision",
    oracle="""
    WITH base AS (SELECT event_type, event_id,
                         CAST(floor(value) AS BIGINT) AS score,
                         CAST(user_id % 2 AS BIGINT) AS y
                  FROM events),
    rk AS (SELECT event_type, y,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY score DESC, event_id)
                      AS i,
                  sum(y) OVER (PARTITION BY event_type
                               ORDER BY score DESC, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum_pos
           FROM base),
    a AS (SELECT event_type,
                 CAST(sum(y) AS BIGINT) AS n_pos,
                 count(*) AS n,
                 sum(CASE WHEN y = 1 THEN
                     CAST(cum_pos / i AS DECIMAL(28,9)) END)
                     AS sum_prec
          FROM rk GROUP BY event_type)
    SELECT event_type, n, n_pos,
           round(CASE WHEN n_pos > 0 THEN
                 CAST(sum_prec AS DOUBLE) / n_pos END, 9)
               AS avg_precision
    FROM a
    """,
    note="Exact per-group average precision (step-interpolated PR "
         "area): AP = mean over positives of precision@rank under the "
         "(score DESC, id) total order — the id tie-break pins the "
         "curve across engines exactly like retrieval_metrics' "
         "cutoffs; each precision term rounds to DECIMAL(28,9) before "
         "the order-free sum. The per-group sort is the irreducible "
         "exact-PR cost; groups are bounded-cardinality model/query "
         "keys (operators/evaluation.py::average_precision)")
def eval_average_precision(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import average_precision

    ev = events_tbl(spark, sf_dir)
    df = ev.select(
        "event_type", "event_id",
        F.floor("value").cast("long").alias("score"),
        (F.col("user_id") % 2).cast("long").alias("y"))
    out = average_precision(df, "event_type", "event_id", "score", "y")
    return out.select("event_type", "n", "n_pos",
                      F.round("avg_precision", 9).alias("avg_precision"))


@register(
    "agg_skew_kurtosis",
    oracle="""
    WITH a AS (SELECT l_returnflag AS grp, count(*) AS n,
                      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                          AS s1,
                      CAST(sum(CAST(l_quantity AS BIGINT)
                               * CAST(l_quantity AS BIGINT))
                           AS BIGINT) AS s2,
                      CAST(sum(CAST(l_quantity AS BIGINT)
                               * CAST(l_quantity AS BIGINT)
                               * CAST(l_quantity AS BIGINT))
                           AS BIGINT) AS s3,
                      CAST(sum(CAST(l_quantity AS BIGINT)
                               * CAST(l_quantity AS BIGINT)
                               * CAST(l_quantity AS BIGINT)
                               * CAST(l_quantity AS BIGINT))
                           AS BIGINT) AS s4
               FROM lineitem GROUP BY l_returnflag)
    SELECT grp, n,
           round(CASE WHEN (CAST(s2 AS DOUBLE) / n
                            - (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s1 AS DOUBLE) / n)) > 0 THEN
                 (CAST(s3 AS DOUBLE) / n
                  - 3 * (CAST(s1 AS DOUBLE) / n)
                      * CAST(s2 AS DOUBLE) / n
                  + 2 * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n))
                 / pow(CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n), 1.5) END, 9)
               AS skewness,
           round(CASE WHEN (CAST(s2 AS DOUBLE) / n
                            - (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s1 AS DOUBLE) / n)) > 0 THEN
                 (CAST(s4 AS DOUBLE) / n
                  - 4 * (CAST(s1 AS DOUBLE) / n)
                      * CAST(s3 AS DOUBLE) / n
                  + 6 * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n)
                      * CAST(s2 AS DOUBLE) / n
                  - 3 * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n))
                 / ((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n)
                       * (CAST(s1 AS DOUBLE) / n))
                    * (CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n))) - 3 END, 9)
               AS kurtosis
    FROM a
    """,
    note="Per-group population skewness / excess kurtosis from exact "
         "BIGINT power sums S1..S4 (the 3rd/4th-moment extension of "
         "var_std_exact): the only float math is the closed-form "
         "central-moment expansion once per group, mirrored operation "
         "by operation — NOT the sample-adjusted built-ins, whose "
         "correction factors differ across engines "
         "(operators/evaluation.py::skew_kurtosis_exact)")
def agg_skew_kurtosis(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import (
        skew_kurtosis_exact)

    li = tbl(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"), "l_quantity")
    out = skew_kurtosis_exact(li, "grp", "l_quantity")
    return out.select("grp", "n",
                      F.round("skewness", 9).alias("skewness"),
                      F.round("kurtosis", 9).alias("kurtosis"))


@register(
    "eval_kendall_tau",
    oracle="""
    WITH base AS (SELECT event_type AS grp, event_id AS id,
                         CAST(floor(value) AS BIGINT) AS x,
                         CAST(user_id % 97 AS BIGINT) AS y
                  FROM events),
    p AS (SELECT a.grp,
                 CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1
                      WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN -1
                      ELSE 0 END AS s,
                 CASE WHEN a.x <> b.x THEN 1 ELSE 0 END AS dx,
                 CASE WHEN a.y <> b.y THEN 1 ELSE 0 END AS dy
          FROM base a JOIN base b ON a.grp = b.grp AND a.id < b.id),
    ag AS (SELECT grp, CAST(sum(s) AS BIGINT) AS cd,
                  CAST(sum(dx) AS BIGINT) AS nx,
                  CAST(sum(dy) AS BIGINT) AS ny
           FROM p GROUP BY grp),
    cnt AS (SELECT event_type AS grp, count(*) AS n
            FROM events GROUP BY 1)
    SELECT cnt.grp, cnt.n, ag.cd,
           round(CASE WHEN nx > 0 AND ny > 0 THEN
                 cd / sqrt(CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))
                 END, 9) AS tau_b
    FROM cnt JOIN ag ON cnt.grp = ag.grp
    """,
    note="Per-group Kendall tau-b: SQL can only say it as the O(n^2) "
         "within-group pair join the oracle runs — the engine path is "
         "Knight's O(n log n) algorithm (sort by (x,y), discordant "
         "pairs = merge-sort inversions of y, numpy bottom-up merges) "
         "in one Arrow applyInPandas kernel, group-parallel. The "
         "integer C-D and tie counts are exact; one sqrt per group "
         "(operators/evaluation.py::kendall_tau). The exact same "
         "number, two algorithmic complexity classes apart")
def eval_kendall_tau(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import kendall_tau

    ev = events_tbl(spark, sf_dir)
    df = ev.select(
        F.col("event_type").alias("grp"),
        F.floor("value").cast("long").alias("x"),
        (F.col("user_id") % 97).cast("long").alias("y"))
    out = kendall_tau(df, "grp", "x", "y")
    return out.select("grp", "n", "cd",
                      F.round("tau_b", 9).alias("tau_b"))


@register(
    "eval_ece",
    oracle="""
    WITH base AS (SELECT (value % 100) / 100 AS p,
        CASE WHEN user_id % 100 < CAST(floor(value % 100) AS BIGINT)
             THEN 1 ELSE 0 END AS y
        FROM events),
    b2 AS (SELECT CAST(least(9, CAST(floor(p * 10) AS BIGINT)) AS INT)
                      AS bin,
                  CAST(round(p, 9) AS DECIMAL(18,9)) AS p_dec, y
           FROM base),
    ag AS (SELECT bin, count(*) AS n, sum(p_dec) AS sum_p,
                  CAST(sum(y) AS BIGINT) AS n_pos
           FROM b2 GROUP BY 1),
    g AS (SELECT n, abs(sum_p - CAST(n_pos AS DECIMAL(18,9))) AS gap
          FROM ag)
    SELECT CAST(count(*) AS INT) AS n_bins_used,
           CAST(sum(n) AS BIGINT) AS n_total,
           round(CAST(sum(gap) AS DOUBLE) / sum(n), 9) AS ece,
           round(max(CAST(gap AS DOUBLE) / n), 9) AS mce
    FROM g
    """,
    note="Expected Calibration Error over the same synthetic "
         "well-calibrated model as eval_calibration_curve: the "
         "(n_b/N)|mean_p - rate| gap telescopes to |sum_p - n_pos|/N, "
         "so ECE is an EXACT decimal divided once — no per-bin float "
         "accumulation to drift; MCE via one identical IEEE division "
         "per bin then max "
         "(operators/evaluation.py::expected_calibration_error)")
def eval_ece(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import (
        expected_calibration_error)

    ev = events_tbl(spark, sf_dir)
    p = (F.col("value") % 100) / 100
    y = (F.col("user_id") % 100
         < F.floor(F.col("value") % 100).cast("long")).cast("int")
    df = ev.select(p.alias("p"), y.alias("y"))
    return expected_calibration_error(df, "p", "y", n_bins=10)


@register(
    "eval_welch_ttest",
    oracle="""
    WITH g AS (SELECT l_returnflag AS grp,
                      CAST(l_extendedprice AS DECIMAL(18,2)) AS v
               FROM lineitem WHERE l_returnflag IN ('R', 'A')),
    ag AS (SELECT grp, count(*) AS n, sum(v) AS s,
                  sum(CAST(v * v AS DECIMAL(38,4))) AS ss
           FROM g GROUP BY 1),
    a AS (SELECT n AS na, s AS sa, ss AS ssa FROM ag WHERE grp = 'R'),
    b AS (SELECT n AS nb, s AS sb, ss AS ssb FROM ag WHERE grp = 'A'),
    m AS (SELECT na, nb,
                 CAST(sa AS DOUBLE) / na AS ma,
                 CAST(sb AS DOUBLE) / nb AS mb,
                 (CAST(ssa AS DOUBLE)
                  - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na)
                     / (na - 1) / na AS se2a,
                 (CAST(ssb AS DOUBLE)
                  - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb)
                     / (nb - 1) / nb AS se2b
          FROM a, b)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(ma, 9) AS mean_a, round(mb, 9) AS mean_b,
           round((ma - mb) / sqrt(se2a + se2b), 9) AS t_stat,
           round((se2a + se2b) * (se2a + se2b)
                 / (se2a * se2a / (na - 1) + se2b * se2b / (nb - 1)), 9)
               AS df_welch
    FROM m
    """,
    note="Welch's unequal-variance t-test (returned vs in-transit "
         "lineitem prices): exact decimal moments (sum, sum-of-squares "
         "wide decimals — partial-agg order cannot perturb them), then "
         "one fixed IEEE expression for t and the Welch-Satterthwaite "
         "df, mirrored op-by-op in the twin. One aggregation pass, "
         "1-row output (operators/evaluation.py::welch_ttest)")
def eval_welch_ttest(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import welch_ttest
    li = tbl(spark, sf_dir, "lineitem")
    return welch_ttest(li, "l_returnflag", "l_extendedprice", "R", "A")


@register(
    "eval_chi2_independence",
    oracle="""
    WITH obs AS (SELECT l_returnflag AS a, l_linestatus AS b,
                        count(*) AS n_obs
                 FROM lineitem GROUP BY 1, 2),
    cells AS (SELECT g.a, g.b, CAST(coalesce(o.n_obs, 0) AS BIGINT)
                  AS n_obs
              FROM (SELECT DISTINCT a FROM obs) ga(a),
                   (SELECT DISTINCT b FROM obs) gb(b),
                   LATERAL (SELECT ga.a AS a, gb.b AS b) g
              LEFT JOIN obs o ON o.a = g.a AND o.b = g.b),
    m AS (SELECT a, b, n_obs,
                 sum(n_obs) OVER (PARTITION BY a) AS rm,
                 sum(n_obs) OVER (PARTITION BY b) AS cm,
                 sum(n_obs) OVER () AS n
          FROM cells)
    SELECT a, b, n_obs,
           round(CAST(rm * cm AS DOUBLE) / n, 9) AS expected,
           round((n_obs - CAST(rm * cm AS DOUBLE) / n)
                 * (n_obs - CAST(rm * cm AS DOUBLE) / n)
                 / (CAST(rm * cm AS DOUBLE) / n), 9) AS chi2_term
    FROM m
    """,
    note="Pearson chi-square independence test (returnflag x "
         "linestatus): one aggregation to the tiny cell table, margin "
         "window sums over that table only, E and the per-cell "
         "contribution from exact BIGINT counts through one fixed IEEE "
         "expression. The synthetic fixture draws flag and status "
         "independently, so the terms are correctly TINY (total chi2 "
         "~0.1 << the chi2_2 5% critical 5.99) — reporting "
         "independence where it holds; the planted-dependence case "
         "fires in tests (operators/evaluation.py::chi2_independence)")
def eval_chi2_independence(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import (
        chi2_independence)
    li = tbl(spark, sf_dir, "lineitem")
    return chi2_independence(li, "l_returnflag", "l_linestatus")


@register(
    "agg_gini_revenue",
    oracle="""
    WITH rev AS (SELECT o_custkey,
                        CAST(round(sum(o_totalprice) * 100) AS BIGINT)
                            AS v
                 FROM orders GROUP BY 1),
    rk AS (SELECT v, row_number() OVER (ORDER BY v, o_custkey) AS r
           FROM rev),
    ag AS (SELECT count(*) AS n, sum(v) AS sx, sum(r * v) AS srx
           FROM rk)
    SELECT CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS total_cents,
           round((2.0 * srx - (n + 1) * CAST(sx AS DOUBLE))
                 / (n * CAST(sx AS DOUBLE)), 9) AS gini
    FROM ag
    """,
    note="Gini concentration of per-customer revenue: exact integer "
         "cents, global ascending-value ranks via the two-phase "
         "range-bucket prefix-sum (parallel per-bucket windows + a "
         "16-row offset broadcast — never a single-task global "
         "window), closing formula one IEEE expression over exact "
         "BIGINTs. The oracle ranks with a plain global row_number — "
         "same statistic, single-node plan "
         "(operators/evaluation.py::gini_coefficient)")
def agg_gini_revenue(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import gini_coefficient

    rev = (tbl(spark, sf_dir, "orders")
           .groupBy("o_custkey")
           .agg(F.sum("o_totalprice").alias("revenue")))
    return gini_coefficient(rev, "revenue", "o_custkey")


@register(
    "eval_ks_test",
    oracle="""
    WITH g AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                          AS ia,
                      CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END
                          AS ib
               FROM lineitem WHERE l_returnflag IN ('R', 'N')),
    dv AS (SELECT v, sum(ia) AS ca, sum(ib) AS cb FROM g GROUP BY 1),
    c AS (SELECT sum(ca) OVER (ORDER BY v) AS cca,
                 sum(cb) OVER (ORDER BY v) AS ccb
          FROM dv),
    t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                 CAST(sum(cb) AS BIGINT) AS n_b
          FROM dv)
    SELECT n_a, n_b,
           round(CAST(max(abs(cca * n_b - ccb * n_a)) AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * n_b), 9) AS d_stat
    FROM c, t GROUP BY n_a, n_b
    """,
    note="Two-sample Kolmogorov-Smirnov D (returned vs never-shipped "
         "lineitem prices): rows collapse to the distinct-value table "
         "first, CDF gaps are exact cross-multiplied BIGINTs, and the "
         "cumulative counts ride the gini two-phase range-bucket "
         "prefix-sum — parallel per-bucket windows, never a one-task "
         "global ORDER BY. The oracle's plain window is the same "
         "statistic single-node "
         "(operators/evaluation.py::ks_two_sample)")
def eval_ks_test(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import ks_two_sample
    li = tbl(spark, sf_dir, "lineitem")
    return ks_two_sample(li, "l_returnflag", "l_extendedprice",
                         "R", "N")


@register(
    "distinct_bitmap_rollup",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
               AS n_distinct
    FROM events GROUP BY 1
    UNION ALL
    SELECT '__all__' AS event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events
    """,
    note="EXACT distinct users per event type AND overall via "
         "OR-mergeable 64-bit word bitmaps — the exact sibling of "
         "hll_sketch_rollup: the ALL row is computed by BIT_OR-merging "
         "the per-type word bitmaps, never re-reading raw events. "
         "Shuffle key (type, word) spreads each bitmap across "
         "partitions; bit_count is a JVM intrinsic "
         "(operators/sketch.py::bitmap_distinct_rollup)")
def distinct_bitmap_rollup(spark, sf_dir):
    from mapreduce_wsi_spark.operators.sketch import (
        bitmap_distinct_rollup)
    ev = events_tbl(spark, sf_dir)
    return bitmap_distinct_rollup(ev, "event_type", "user_id")


@register(
    "source_fixed_width",
    oracle="""
    SELECT c_mktsegment, count(*) AS n,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS balance_cents
    FROM customer GROUP BY 1
    """,
    note="fixed-width text source: customers serialize to 38-char "
         "records (zero-padded keys, space-padded signed cents and "
         "segment), land as a text file, and the read-back parses "
         "with pure substring/trim column carving — the COBOL-era "
         "mainframe-extract format ETL still ingests. The aggregate "
         "runs over the parsed frame while the twin reads the "
         "original parquet, so pad/parse fidelity (incl. negative "
         "balances) is the verified surface. Scale: text lines split "
         "by byte ranges like any text source; parsing is "
         "whole-stage-codegen substring, no Python")
def source_fixed_width(spark, sf_dir):
    from mapreduce_wsi_spark.util import scratch_dir

    cust = tbl(spark, sf_dir, "customer")
    line = F.concat(
        F.lpad(F.col("c_custkey").cast("string"), 10, "0"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0"),
        F.lpad(F.round(F.col("c_acctbal") * 100).cast("bigint")
               .cast("string"), 12, " "),
        F.rpad(F.col("c_mktsegment"), 12, " "))
    path = scratch_dir("fixed_width", sf_dir)
    cust.select(line.alias("value")).write.mode("overwrite").text(path)
    back = spark.read.text(path)
    parsed = back.select(
        F.substring("value", 1, 10).cast("long").alias("c_custkey"),
        F.substring("value", 11, 4).cast("int").alias("c_nationkey"),
        F.trim(F.substring("value", 15, 12)).cast("long")
        .alias("balance_cents"),
        F.rtrim(F.substring("value", 27, 12)).alias("c_mktsegment"))
    return (parsed.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("c_nationkey").cast("long")
                 .alias("n_nations"),
                 F.sum("balance_cents").alias("balance_cents")))


@register(
    "source_schema_evolution",
    oracle="""
    WITH m AS (
        SELECT o_orderkey, o_totalprice,
               CAST(NULL AS VARCHAR) AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(o_orderpriority) AS BIGINT) AS n_with_priority,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM m
    """,
    note="parquet schema evolution: an old-schema batch (2 columns) "
         "and a widened batch (+o_orderpriority) land as separate "
         "parquet writes; the read uses mergeSchema=true so the "
         "unified scan back-fills NULL for the missing column — the "
         "lakehouse reality where producers add columns over time and "
         "readers must union old and new files without a rewrite. "
         "The twin models the same union in SQL. Footer-merge cost is "
         "per-file metadata only; data pages are never rewritten")
def source_schema_evolution(spark, sf_dir):
    import os

    from mapreduce_wsi_spark.util import scratch_dir

    orders = tbl(spark, sf_dir, "orders")
    base = scratch_dir("schema_evo", sf_dir)
    old = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice")
    new = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    old.write.mode("overwrite").parquet(os.path.join(base, "v1"))
    new.write.mode("overwrite").parquet(os.path.join(base, "v2"))
    merged = (spark.read.option("mergeSchema", "true")
              .parquet(os.path.join(base, "v1"),
                       os.path.join(base, "v2")))
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return merged.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderpriority").alias("n_with_priority"),
        F.sum(cents).alias("total_cents"))


@register(
    "eval_mutual_information",
    oracle="""
    WITH cells AS (SELECT l_returnflag AS a, l_linestatus AS b,
                          count(*) AS nij
                   FROM lineitem GROUP BY 1, 2),
    m AS (SELECT nij,
                 sum(nij) OVER (PARTITION BY a) AS ni,
                 sum(nij) OVER (PARTITION BY b) AS nj,
                 sum(nij) OVER () AS n
          FROM cells),
    t AS (SELECT n,
                 CAST(round(CAST(nij AS DOUBLE) / n
                            * ln(CAST(nij AS DOUBLE) * n
                                 / (CAST(ni AS DOUBLE) * nj)), 15)
                      AS DECIMAL(38,15)) AS term
          FROM m)
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(CAST(sum(term) AS DOUBLE), 9) AS mi_nats
    FROM t GROUP BY n
    """,
    note="mutual information I(returnflag; linestatus) in nats — the "
         "how-much companion to eval_chi2_independence: one agg to "
         "the cell table, margin windows over that tiny table only, "
         "per-cell p*ln terms rounded to 15 decimals and summed as "
         "exact DECIMAL (the text_bigram_logprob pattern — cross-cell "
         "float order cannot move the total) "
         "(operators/evaluation.py::mutual_information)")
def eval_mutual_information(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import (
        mutual_information)
    li = tbl(spark, sf_dir, "lineitem")
    return mutual_information(li, "l_returnflag", "l_linestatus")


@register(
    "eval_ab_proportion_ztest",
    oracle="""
    WITH g AS (SELECT c_mktsegment AS grp,
                      CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END
                          AS s
               FROM customer
               WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
    a AS (SELECT CAST(sum(CASE WHEN grp = 'BUILDING' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN grp = 'BUILDING' THEN s ELSE 0 END)
                      AS BIGINT) AS s_a,
                 CAST(sum(CASE WHEN grp = 'MACHINERY' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_b,
                 CAST(sum(CASE WHEN grp = 'MACHINERY' THEN s ELSE 0 END)
                      AS BIGINT) AS s_b
          FROM g)
    SELECT n_a, s_a, n_b, s_b,
           round(CAST(s_a AS DOUBLE) / n_a, 9) AS rate_a,
           round(CAST(s_b AS DOUBLE) / n_b, 9) AS rate_b,
           round((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
                 / sqrt((CAST(s_a AS DOUBLE) + s_b)
                        / (CAST(n_a AS DOUBLE) + n_b)
                        * (1 - (CAST(s_a AS DOUBLE) + s_b)
                               / (CAST(n_a AS DOUBLE) + n_b))
                        * (1 / CAST(n_a AS DOUBLE)
                           + 1 / CAST(n_b AS DOUBLE))), 9) AS z_stat
    FROM a
    """,
    note="two-proportion z-test (pooled variance), the A/B conversion "
         "readout: positive-balance rate BUILDING vs MACHINERY "
         "customers; one aggregation to four exact BIGINTs, p1/p2/"
         "pooled-p/z in one fixed IEEE expression mirrored op-by-op "
         "(operators/evaluation.py::two_proportion_ztest)")
def eval_ab_proportion_ztest(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import (
        two_proportion_ztest)
    cust = tbl(spark, sf_dir, "customer")
    return two_proportion_ztest(cust, "c_mktsegment",
                                F.col("c_acctbal") > 5000,
                                "BUILDING", "MACHINERY")


@register(
    "agg_pareto_8020",
    oracle="""
    WITH rev AS (SELECT o_custkey AS k,
                        CAST(round(sum(o_totalprice) * 100) AS BIGINT)
                            AS v
                 FROM orders GROUP BY 1),
    rk AS (SELECT v,
                  row_number() OVER (ORDER BY v DESC, k) AS r,
                  sum(v) OVER (ORDER BY v DESC, k
                               ROWS UNBOUNDED PRECEDING) AS cum
           FROM rev),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(sum(v) AS BIGINT) AS total_cents
          FROM rev),
    dec AS (SELECT max(cum) AS dec_s FROM rk, t
            WHERE r <= greatest(1, n_keys // 10))
    SELECT t.n_keys, t.total_cents,
           (SELECT CAST(min(r) AS BIGINT) FROM rk, t
            WHERE 100 * cum >= 80 * total_cents) AS k_for_share,
           round(CAST(dec.dec_s AS DOUBLE) / t.total_cents, 9)
               AS top_decile_share
    FROM t, dec
    """,
    note="Pareto 80/20 concentration of per-customer revenue: fewest "
         "customers covering 80% of revenue + the top decile's share. "
         "Descending two-phase range-bucket prefix sums (per-bucket "
         "windows + a 16-row offsets broadcast — never a one-task "
         "global window); the 80% cut is the multiplied-through "
         "integer test 100*cum >= 80*total, so the cut row is "
         "bit-deterministic. Oracle ranks with the plain global "
         "window single-node "
         "(operators/evaluation.py::pareto_concentration)")
def agg_pareto_8020(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import (
        pareto_concentration)
    rev = (tbl(spark, sf_dir, "orders")
           .groupBy("o_custkey")
           .agg(F.sum("o_totalprice").alias("revenue")))
    return pareto_concentration(rev, "o_custkey", "revenue",
                                share_pct=80)


def _kmeans_oracle(k: int = 8, dim: int = 64, rounds: int = 3) -> str:
    """Unrolled Lloyd twin: every distance term and mean numerator is
    cast to DECIMAL before its (order-free, exact) sum, centroid
    components re-round to 9dp per round — the same discipline as the
    PCA power-iteration twin, so both engines walk identical centroid
    trajectories. AS MATERIALIZED keeps the unroll linear (each round
    references the previous CTE several times — the graph_kcore
    lesson)."""
    dist = (f"list_sum(list_transform(generate_series(1, {dim}), i -> "
            f"CAST((v.cv[i] - c.c[i]) * (v.cv[i] - c.c[i]) "
            f"AS DECIMAL(28,18))))")
    parts = [f"""
    vecs AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings),
    c0 AS MATERIALIZED (
        SELECT CAST(vec_id AS BIGINT) AS cell,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> round(x, 9)) AS c
        FROM embeddings ORDER BY vec_id LIMIT {k})"""]
    for r in range(1, rounds + 1):
        parts.append(f"""
    a{r} AS (SELECT v.vec_id, v.cv, c.cell, {dist} AS d
             FROM vecs v, c{r - 1} c),
    s{r} AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d, cell) AS rn
             FROM a{r}),
    g{r} AS MATERIALIZED (
        SELECT vec_id, cv, cell, d FROM s{r} WHERE rn = 1),
    u{r} AS (SELECT cell, g.i AS i,
                    round(CAST(sum(CAST(cv[g.i] AS DECIMAL(38,20)))
                               AS DOUBLE) / count(*), 9) AS x
             FROM g{r}, generate_series(1, {dim}) g(i) GROUP BY 1, 2),
    n{r} AS (SELECT cell, list(x ORDER BY i) AS c FROM u{r}
             GROUP BY 1),
    c{r} AS MATERIALIZED (
        SELECT p.cell, coalesce(n.c, p.c) AS c
        FROM c{r - 1} p LEFT JOIN n{r} n USING (cell))""")
    return ("WITH" + ",".join(parts) + f"""
    , stats AS (SELECT cell, count(*) AS n_assigned,
                       round(CAST(sum(d) AS DOUBLE), 9) AS inertia
                FROM g{rounds} GROUP BY 1),
    l1 AS (SELECT cell,
                  round(CAST(list_sum(list_transform(c,
                        x -> CAST(abs(x) AS DECIMAL(28,18))))
                        AS DOUBLE), 9) AS centroid_l1
           FROM c{rounds})
    SELECT c.cell,
           CAST(coalesce(s.n_assigned, 0) AS BIGINT) AS n_assigned,
           coalesce(s.inertia, 0.0) AS inertia, l1.centroid_l1
    FROM c{rounds} c LEFT JOIN stats s USING (cell)
    JOIN l1 USING (cell)
    """)


@register(
    "cluster_kmeans_lloyd",
    oracle=_kmeans_oracle(8, 64, 3),
    note="distributed Lloyd k-means (k=8, 3 rounds) with BIT-EXACT "
         "iterates: deterministic k-smallest-id init (orderBy/limit, "
         "exact-k asserted), DECIMAL-cast distance terms and mean "
         "numerators (order-free sums), 9dp-re-rounded centroids per "
         "round — the PCA-twin discipline, replayed by the unrolled "
         "MATERIALIZED-CTE DuckDB twin. Corpus NEVER crosses an "
         "exchange: per round the k*dim centroid table collects to "
         "the driver (bounded, the BPE-argmax action class) and "
         "assignment is a literal least()-over-(dist,cell)-structs "
         "argmin — no window, no join; only combined (cell, dim) "
         "mean partials move. The engine-private alternative "
         "(MLlib KMeans) backs build_ivf_index; this is the "
         "reproducible-across-engines form "
         "(operators/similarity.py::kmeans_lloyd)")
def cluster_kmeans_lloyd(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import kmeans_lloyd
    emb = tbl(spark, sf_dir, "embeddings")
    return kmeans_lloyd(emb, "vec_id", "embedding", k=8, dim=64,
                        n_rounds=3)


@register(
    "eval_mcc",
    oracle="""
    WITH base AS (SELECT
        CAST(floor(value) AS BIGINT) % 2 AS truth,
        (CAST(floor(value) AS BIGINT) + user_id) % 2 AS pred
        FROM events),
    c AS (SELECT
        CAST(sum(CASE WHEN truth = 1 AND pred = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS tp,
        CAST(sum(CASE WHEN truth = 0 AND pred = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS fp,
        CAST(sum(CASE WHEN truth = 1 AND pred = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS fn,
        CAST(sum(CASE WHEN truth = 0 AND pred = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS tn
        FROM base)
    SELECT tp, fp, fn, tn,
           round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                 / sqrt((CAST(tp AS DOUBLE) + fp)
                        * (CAST(tp AS DOUBLE) + fn)
                        * (CAST(tn AS DOUBLE) + fp)
                        * (CAST(tn AS DOUBLE) + fn)), 9) AS mcc
    FROM c
    """,
    note="Matthews correlation coefficient (binary, derived labels as "
         "in eval_confusion_f1's convention): four exact BIGINT "
         "confusion cells from one aggregation, MCC in one fixed IEEE "
         "expression (double products — counts < 2^53 convert "
         "exactly; BIGINT products would overflow at large SF). "
         "Completes the classification set (F1, kappa, AUC, log "
         "loss, calibration, MCC)")
def eval_mcc(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    truth = (F.floor("value").cast("bigint") % 2)
    pred = ((F.floor("value").cast("bigint") + F.col("user_id")) % 2)
    base = ev.select(truth.alias("t"), pred.alias("p"))
    c = base.agg(
        F.sum(F.when((F.col("t") == 1) & (F.col("p") == 1), 1)
              .otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when((F.col("t") == 0) & (F.col("p") == 1), 1)
              .otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when((F.col("t") == 1) & (F.col("p") == 0), 1)
              .otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when((F.col("t") == 0) & (F.col("p") == 0), 1)
              .otherwise(0)).cast("long").alias("tn"))
    tp, fp = F.col("tp").cast("double"), F.col("fp").cast("double")
    fn, tn = F.col("fn").cast("double"), F.col("tn").cast("double")
    mcc = ((tp * tn - fp * fn)
           / F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)))
    return c.select("tp", "fp", "fn", "tn",
                    F.round(mcc, 9).alias("mcc"))


@register(
    "quantile_normalize_groups",
    oracle="""
    WITH base AS (SELECT event_type AS g, event_id AS id,
                         CAST(round(value * 100) AS BIGINT) AS v
                  FROM events),
    sz AS (SELECT g, count(*) AS ng FROM base GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM base),
    ri AS (SELECT b.g, b.v,
                  row_number() OVER (PARTITION BY b.g
                                     ORDER BY b.v, b.id) AS r,
                  s.ng, t.n
           FROM base b JOIN sz s USING (g), tot t),
    tr AS (SELECT g, (r * n + ng - 1) // ng AS tr FROM ri),
    pool AS (SELECT v AS nv,
                    row_number() OVER (ORDER BY v, g, id) AS pr
             FROM base)
    SELECT t.g AS event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(p.nv) AS BIGINT) AS min_norm_cents,
           CAST(max(p.nv) AS BIGINT) AS max_norm_cents,
           CAST(sum(p.nv) AS BIGINT) AS sum_norm_cents
    FROM tr t JOIN pool p ON p.pr = t.tr
    GROUP BY 1
    """,
    note="quantile normalization of per-type value distributions onto "
         "the pooled distribution — batch-effect correction before "
         "mixing sources: within-group ranks remap through "
         "ceil(r*N/n_g) (pure integers) into the pooled rank->value "
         "table built with the gini two-phase prefix-sum; the lookup "
         "is an EQUI join on the computed rank. Per-type summaries "
         "of normalized cents are exact BIGINTs; the oracle uses the "
         "plain global-window pool single-node "
         "(operators/evaluation.py::quantile_normalize)")
def quantile_normalize_groups(spark, sf_dir):
    from mapreduce_wsi_spark.operators.evaluation import (
        quantile_normalize)
    ev = events_tbl(spark, sf_dir)
    return quantile_normalize(ev, "event_type", "value", "event_id")


@register(
    "eval_krippendorff_alpha",
    oracle="""
    WITH r AS (SELECT event_id,
                      CAST(floor(value) AS BIGINT) % 3 AS r1,
                      (CAST(floor(value) AS BIGINT) + user_id) % 3
                          AS r2,
                      (CAST(floor(value) AS BIGINT) + 2 * user_id) % 3
                          AS r3
               FROM events),
    pairs AS (
        SELECT r1 AS c, r2 AS k FROM r UNION ALL
        SELECT r2, r1 FROM r UNION ALL
        SELECT r1, r3 FROM r UNION ALL
        SELECT r3, r1 FROM r UNION ALL
        SELECT r2, r3 FROM r UNION ALL
        SELECT r3, r2 FROM r),
    o AS (SELECT c, k, count(*) AS occ FROM pairs GROUP BY 1, 2),
    marg AS (SELECT c, CAST(sum(occ) AS BIGINT) AS nc FROM o
             GROUP BY 1),
    tot AS (SELECT CAST(sum(occ) AS BIGINT) AS n FROM o),
    do_ AS (SELECT CAST(sum(occ) AS BIGINT) AS d FROM o WHERE c != k),
    de_ AS (SELECT CAST(sum(CAST(a.nc AS DECIMAL(38,0)) * b.nc)
                        AS BIGINT) AS e
            FROM marg a, marg b WHERE a.c != b.c)
    SELECT tot.n AS n_coincidences,
           do_.d AS n_disagreements,
           round(1.0 - CAST(do_.d AS DOUBLE) * (tot.n - 1)
                 / CAST(de_.e AS DOUBLE), 9) AS alpha
    FROM tot, do_, de_
    """,
    note="Krippendorff's alpha (nominal, 3 complete raters — the "
         "multi-annotator generalization of Cohen's kappa): with "
         "m-1 = 2 the coincidence matrix is pure integer ordered-pair "
         "counts (the 1/(m-1) weights scale through), Do and De are "
         "exact BIGINTs and alpha = 1 - Do(n-1)/De is one IEEE "
         "expression. Derived raters follow the eval_cohens_kappa "
         "convention; one explode + two tiny aggregations")
def eval_krippendorff_alpha(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    fv = F.floor("value").cast("bigint")
    r = ev.select((fv % 3).alias("r1"),
                  ((fv + F.col("user_id")) % 3).alias("r2"),
                  ((fv + 2 * F.col("user_id")) % 3).alias("r3"))
    pairs = None
    for a, b in [("r1", "r2"), ("r2", "r1"), ("r1", "r3"),
                 ("r3", "r1"), ("r2", "r3"), ("r3", "r2")]:
        pp = r.select(F.col(a).alias("c"), F.col(b).alias("k"))
        pairs = pp if pairs is None else pairs.unionByName(pp)
    o = pairs.groupBy("c", "k").agg(F.count(F.lit(1)).alias("occ"))
    o = o.localCheckpoint()
    marg = o.groupBy("c").agg(F.sum("occ").alias("nc"))
    tot = o.agg(F.sum("occ").alias("n"))
    do_ = o.filter(F.col("c") != F.col("k")).agg(
        F.sum("occ").alias("d"))
    de_ = (marg.alias("a")
           .crossJoin(marg.select(F.col("c").alias("c2"),
                                  F.col("nc").alias("nc2")))
           .filter(F.col("c") != F.col("c2"))
           .agg(F.sum(F.col("nc").cast("decimal(38,0)")
                      * F.col("nc2")).cast("long").alias("e")))
    alpha = (1.0 - F.col("d").cast("double") * (F.col("n") - 1)
             / F.col("e").cast("double"))
    return (tot.crossJoin(do_).crossJoin(de_)
            .select(F.col("n").cast("long").alias("n_coincidences"),
                    F.col("d").cast("long").alias("n_disagreements"),
                    F.round(alpha, 9).alias("alpha")))


@register(
    "dq_psi_drift",
    oracle="""
    WITH b AS (SELECT CAST(l_orderkey % 2 AS INT) AS grp,
                      least(CAST(CAST(round(l_extendedprice * 100)
                                 AS BIGINT) * 10
                                 // 11000000 AS INT), 9) AS bin
               FROM lineitem),
    c AS (SELECT bin,
                 sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS na,
                 sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS nb
          FROM b GROUP BY 1),
    t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
                 CAST(sum(nb) AS BIGINT) AS tb
          FROM c),
    terms AS (SELECT c.bin, c.na, c.nb,
                     CAST(round((CAST(c.na AS DOUBLE) / t.ta
                                 - CAST(c.nb AS DOUBLE) / t.tb)
                                * ln(CAST(c.na AS DOUBLE) * t.tb
                                     / (CAST(c.nb AS DOUBLE) * t.ta)),
                                15) AS DECIMAL(38,15)) AS term
              FROM c, t WHERE c.na > 0 AND c.nb > 0)
    SELECT CAST(count(*) AS BIGINT) AS n_bins,
           round(CAST(sum(term) AS DOUBLE), 9) AS psi
    FROM terms
    """,
    note="population stability index between the even- and odd-key "
         "halves of lineitem prices (10 fixed-width bins over the "
         "[0, 110k) price range via pure integer bucketing): the "
         "industry drift score a model monitor pages on (PSI > 0.2 "
         "= retrain). Per-bin (p-q)*ln(p/q) terms round to 15dp and "
         "sum as DECIMAL (the MI order-immunity pattern); bins empty "
         "on either side are excluded on both engines. The halves "
         "are i.i.d. so the reported PSI is correctly ~0 — the "
         "planted-drift case fires in pytest")
def dq_psi_drift(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    b = li.select(
        (F.col("l_orderkey") % 2).cast("int").alias("grp"),
        F.least(F.expr(
            f"CAST(CAST(round(l_extendedprice * 100) AS BIGINT) * 10 "
            f"div 11000000 AS INT)"), F.lit(9)).alias("bin"))
    c = (b.groupBy("bin")
         .agg(F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
              .alias("na"),
              F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
              .alias("nb")))
    t = c.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    terms = (c.crossJoin(F.broadcast(t))
             .filter((F.col("na") > 0) & (F.col("nb") > 0))
             .select(F.round(
                 (F.col("na").cast("double") / F.col("ta")
                  - F.col("nb").cast("double") / F.col("tb"))
                 * F.log(F.col("na").cast("double") * F.col("tb")
                         / (F.col("nb").cast("double")
                            * F.col("ta"))), 15)
                 .cast("decimal(38,15)").alias("term")))
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.round(F.sum("term").cast("double"), 9).alias("psi"))
