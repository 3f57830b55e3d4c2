"""Round-11 catalog tranche: the COVERAGE.md r11 queue, implemented —
manifest-keyed cross-snapshot NEAR-dup, CDC chunk dedup across
snapshots (with the edited-page stability demonstration), quality-
classifier distillation, per-domain curriculum pacing under token
budgets, embedding-dedup audits at varied band counts — plus the
surrounding surface a pretraining-data pipeline needs next: global
line dedup, blocklist/canary gates, spam-host detection, host-grouped
splits, license provenance, preference-data QA (Bradley-Terry, Wilson
bounds, cycle rates, length bias), loader-permutation audits, and
compaction planning.

Reference parity note: none of these exist in the reference
(acgessler/mapreduce-wsi) — its only analytics surface is
user-supplied map/reduce code behind runMapReduce (MapReduceWSI.java:
61-105). They are BASELINE.json north-star surface, built Spark-first
with DuckDB oracle twins like every other family. Shared synthesis
fragments (snapshot split, gopher badness, URL variants) are imported
from q_curation so both rounds stay pinned to one spec.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.curation import (
    cdc_chunks,
    cdc_cross_snapshot,
    incremental_minhash_pairs,
)
from mapreduce_wsi_spark.plans.q_curation import (
    _CROSS_JACCARD_ORACLE,
    _GOPHER_FLAGS_CTE,
    _gopher_flagged,
)
from mapreduce_wsi_spark.plans.registry import register, tbl

# ---------------------------------------------------------------------------
# Shared oracle fragments
# ---------------------------------------------------------------------------


def _cdc_chunks_sql(name: str, src: str) -> str:
    """DuckDB twin of operators/curation.py::cdc_chunks over ``src``, a
    subquery yielding (doc_id, w LIST<VARCHAR>). Emits CTE ``name`` with
    (doc_id, cid, h). The convention is the spec (dedup_cdc_sentences),
    re-derived, not shared code."""
    return f"""
    {name}_pos AS (
        SELECT doc_id, i, w[CAST(i AS INT)] AS wd,
               CASE WHEN CAST(('0x' || substr(
                        md5(w[CAST(i AS INT)]), 1, 8)) AS BIGINT)
                    % 100 < 25
                    THEN 1 ELSE 0 END AS b
        FROM (SELECT doc_id, w,
                     unnest(generate_series(1, len(w))) AS i
              FROM ({src}) {name}_s) t),
    {name}_ch AS (
        SELECT doc_id, i, wd,
               coalesce(sum(b) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS cid
        FROM {name}_pos),
    {name} AS (SELECT doc_id, cid,
                      md5(string_agg(wd, ' ' ORDER BY i)) AS h
               FROM {name}_ch GROUP BY doc_id, cid)"""


# ---------------------------------------------------------------------------
# A. Cross-snapshot near-dup / CDC follow-through (the r11 queue head)
# ---------------------------------------------------------------------------

@register(
    "dedup_manifest_minhash",
    oracle=_CROSS_JACCARD_ORACLE,
    note="cross-snapshot NEAR-dup keyed by the REAL lakehouse ingest "
         "manifest — the r11-queue composition of "
         "dedup_manifest_cross_snapshot's manifest split with "
         "incremental_minhash_pairs: the standing corpus lands as "
         "parquet and its file paths are recorded; the new crawl "
         "appends to the same directory; the new side is "
         "input_file_name()-pruned at the scan and the old side is the "
         "manifest complement, then MinHash/LSH bands run BETWEEN the "
         "sets (never old x old) with exact-Jaccard verify of "
         "candidates only. This is how a daily 100 TB crawl runs "
         "near-dup against the standing corpus at O(new + candidates) "
         "cost while reusing standing signatures. Oracle is the exact "
         "cross-pair set over the same doc_id%3 content split — "
         "proving the manifest routing loses and leaks nothing")
def dedup_manifest_minhash(spark, sf_dir):
    from mapreduce_wsi_spark.operators.lakehouse import (
        incremental_new_files)
    from mapreduce_wsi_spark.util import scratch_dir

    docs = tbl(spark, sf_dir, "documents")
    base = scratch_dir("manifest_xsnap_mh", sf_dir)
    docs.filter(F.col("doc_id") % 3 != 0).write.parquet(
        base, mode="overwrite")
    manifest = [r["f"] for r in
                spark.read.parquet(base)
                .select(F.input_file_name().alias("f"))
                .distinct().collect()]
    docs.filter(F.col("doc_id") % 3 == 0).write.parquet(
        base, mode="append")
    new = incremental_new_files(spark, base, manifest)
    old = (spark.read.parquet(base)
           .filter(F.input_file_name().isin(manifest)))
    return incremental_minhash_pairs(new, old, "text", "doc_id",
                                     n=3, min_jaccard=0.1)


_CDC_OLD_SRC = ("SELECT doc_id, string_split(text, ' ') AS w "
                "FROM documents WHERE doc_id % 3 != 0")
_CDC_NEW_SRC = ("SELECT doc_id, string_split(text, ' ') AS w "
                "FROM documents WHERE doc_id % 3 = 0")


@register(
    "dedup_cdc_cross_snapshot",
    oracle=f"""
    WITH {_cdc_chunks_sql('oldc', _CDC_OLD_SRC)},
    {_cdc_chunks_sql('newc', _CDC_NEW_SRC)},
    oh AS (SELECT DISTINCT h FROM oldc)
    SELECT n.doc_id, CAST(count(*) AS INT) AS n_chunks,
           CAST(sum(CASE WHEN oh.h IS NOT NULL THEN 1 ELSE 0 END)
                AS INT) AS n_carried,
           round(sum(CASE WHEN oh.h IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 9) AS carried_frac
    FROM newc n LEFT JOIN oh ON n.h = oh.h
    GROUP BY n.doc_id
    """,
    note="CDC chunk dedup ACROSS snapshots (r11 queue): both crawls "
         "chunk with the same content-defined boundaries "
         "(operators/curation.py::cdc_cross_snapshot); for every new "
         "doc, the fraction of its chunks already present anywhere in "
         "the standing corpus. The old side collapses to DISTINCT "
         "chunk hashes before a hash-equi join — no pairwise step at "
         "any scale. This is the storage/transfer bill of a recrawl: "
         "only (1 - carried_frac) of each page's chunks are new bytes")
def dedup_cdc_cross_snapshot(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return cdc_cross_snapshot(docs.filter(F.col("doc_id") % 3 == 0),
                              docs.filter(F.col("doc_id") % 3 != 0),
                              "text", "doc_id")


_EDIT_SRC = """SELECT doc_id,
       list_concat(list_concat(w[1:len(w)//2],
                               ['zEDITz']),
                   w[len(w)//2+1:len(w)]) AS w
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) e0"""
_ORIG_SRC = "SELECT doc_id, string_split(text, ' ') AS w FROM documents"


@register(
    "dedup_cdc_edit_stability",
    oracle=f"""
    WITH {_cdc_chunks_sql('oc', _ORIG_SRC)},
    {_cdc_chunks_sql('ec', _EDIT_SRC)},
    ohs AS (SELECT DISTINCT doc_id, h FROM oc),
    cdc AS (SELECT e.doc_id, count(*) AS n_chunks,
                   sum(CASE WHEN o.h IS NOT NULL THEN 1 ELSE 0 END)
                       AS n_carried
            FROM ec e LEFT JOIN ohs o
              ON o.doc_id = e.doc_id AND o.h = e.h
            GROUP BY e.doc_id),
    ow AS (SELECT doc_id, w FROM ({_ORIG_SRC}) t),
    ew AS (SELECT doc_id, w FROM ({_EDIT_SRC}) t),
    ofx AS (SELECT doc_id, md5(array_to_string(
                       w[CAST(j*4+1 AS INT):CAST(j*4+4 AS INT)], ' '))
                       AS h
            FROM (SELECT doc_id, w,
                         unnest(generate_series(0, (len(w)-1)//4)) AS j
                  FROM ow) t),
    efx AS (SELECT doc_id, md5(array_to_string(
                       w[CAST(j*4+1 AS INT):CAST(j*4+4 AS INT)], ' '))
                       AS h
            FROM (SELECT doc_id, w,
                         unnest(generate_series(0, (len(w)-1)//4)) AS j
                  FROM ew) t),
    ofhs AS (SELECT DISTINCT doc_id, h FROM ofx),
    fx AS (SELECT e.doc_id, count(*) AS n_chunks,
                  sum(CASE WHEN o.h IS NOT NULL THEN 1 ELSE 0 END)
                      AS n_carried
           FROM efx e LEFT JOIN ofhs o
             ON o.doc_id = e.doc_id AND o.h = e.h
           GROUP BY e.doc_id)
    SELECT c.doc_id,
           round(c.n_carried * 1.0 / c.n_chunks, 9) AS cdc_frac,
           round(f.n_carried * 1.0 / f.n_chunks, 9) AS fixed_frac
    FROM cdc c JOIN fx f ON f.doc_id = c.doc_id
    """,
    note="the edited-page stability demonstration dedup_cdc_sentences "
         "was built for (r11 queue): every doc gets a deterministic "
         "one-word mid-page edit; its edited chunks are matched back "
         "to its OWN original chunks under (a) content-defined and "
         "(b) fixed 4-word chunking. CDC re-chunks only around the "
         "edit (carried_frac stays near 1); fixed-width shifts every "
         "downstream window (carried_frac collapses toward the edit "
         "point's prefix). tests/test_curation2.py asserts the "
         "aggregate gap. All joins are (doc, hash) equi-joins; the "
         "edit synthesis is one map-only array splice on both engines")
def dedup_cdc_edit_stability(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    edited_w = F.expr(
        "concat(slice(__w, 1, size(__w) div 2), array('zEDITz'), "
        "slice(__w, size(__w) div 2 + 1, "
        "size(__w) - size(__w) div 2))")
    orig = docs.select("doc_id", "text")
    edited = (docs.select("doc_id", w.alias("__w"))
              .select("doc_id",
                      F.concat_ws(" ", edited_w).alias("text")))

    def fixed_chunks(df):
        groups = F.expr(
            "transform(sequence(0, (size(__w) - 1) div 4), "
            "j -> md5(concat_ws(' ', slice(__w, j * 4 + 1, 4))))")
        return (df.select(F.col("doc_id").alias("id"),
                          F.split(F.col("text"), " ").alias("__w"))
                .select("id", F.explode(groups).alias("h")))

    o_cdc = (cdc_chunks(orig, "text", "doc_id")
             .select("id", "h").distinct().withColumn("__hit", F.lit(1)))
    e_cdc = cdc_chunks(edited, "text", "doc_id")
    cdc = (e_cdc.join(o_cdc, ["id", "h"], "left")
           .groupBy("id")
           .agg(F.count(F.lit(1)).alias("nc"),
                F.sum(F.coalesce("__hit", F.lit(0))).alias("kc")))
    o_fx = (fixed_chunks(orig)
            .distinct().withColumn("__hit", F.lit(1)))
    e_fx = fixed_chunks(edited)
    fx = (e_fx.join(o_fx, ["id", "h"], "left")
          .groupBy("id")
          .agg(F.count(F.lit(1)).alias("nf"),
               F.sum(F.coalesce("__hit", F.lit(0))).alias("kf")))
    return (cdc.join(fx, "id")
            .select(F.col("id").alias("doc_id"),
                    F.round(F.col("kc") / F.col("nc"), 9)
                    .alias("cdc_frac"),
                    F.round(F.col("kf") / F.col("nf"), 9)
                    .alias("fixed_frac")))


@register(
    "dedup_snapshot_first_seen",
    oracle=r"""
    WITH h AS (SELECT doc_id,
                      md5(lower(trim(regexp_replace(text, '\s+', ' ',
                                                    'g')))) AS h,
                      doc_id % 3 AS snap
               FROM documents),
    per AS (SELECT h, CAST(min(snap) AS INT) AS first_seen,
                   CAST(count(DISTINCT snap) AS INT) AS n_snapshots,
                   count(*) AS n_docs
            FROM h GROUP BY h)
    SELECT first_seen, n_snapshots,
           CAST(count(*) AS BIGINT) AS n_hashes,
           CAST(sum(n_docs) AS BIGINT) AS n_docs
    FROM per GROUP BY 1, 2
    """,
    note="content lineage across a 3-crawl chain (doc_id%3 as crawl "
         "t0/t1/t2): per content hash, which crawl INTRODUCED it and "
         "how many crawls carry it — the attribution table behind "
         "'what fraction of crawl N is genuinely new' capacity "
         "planning, one step beyond pairwise new-vs-old "
         "(dedup_cross_snapshot_exact). Two partial-aggregated "
         "groupBys over hashes; output is |first_seen x n_snapshots| "
         "rows at any corpus size")
def dedup_snapshot_first_seen(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    h = docs.select(
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
        .alias("h"),
        (F.col("doc_id") % 3).cast("int").alias("snap"))
    per = (h.groupBy("h")
           .agg(F.min("snap").alias("first_seen"),
                F.countDistinct("snap").cast("int").alias("n_snapshots"),
                F.count(F.lit(1)).alias("nd")))
    return (per.groupBy("first_seen", "n_snapshots")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hashes"),
                 F.sum("nd").cast("bigint").alias("n_docs")))


_PANEL_JACCARD_CTE = """
    tk AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents WHERE doc_id < 200),
    sh AS (SELECT DISTINCT doc_id,
                  w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)]
                  || ' ' || w[CAST(i+2 AS INT)] AS shingle
           FROM (SELECT doc_id, w,
                        unnest(generate_series(1, len(w) - 2)) AS i
                 FROM tk) t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    pj AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(count(*) AS DOUBLE)
                  / (sa.n_sh + sb.n_sh - count(*)) AS j
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           JOIN sizes sa ON sa.doc_id = a.doc_id
           JOIN sizes sb ON sb.doc_id = b.doc_id
           GROUP BY a.doc_id, b.doc_id, sa.n_sh, sb.n_sh)
"""


@register(
    "dedup_minhash_band_tradeoff",
    oracle=f"""
    WITH {_PANEL_JACCARD_CTE},
    cfg AS (SELECT * FROM (VALUES (32, 4), (16, 8), (8, 16))
            c(bands, rows_pb))
    SELECT bands, rows_pb,
           CAST(sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true50,
           round(sum(CASE WHEN j >= 0.5 THEN
                     1 - power(1 - power(j, rows_pb), bands)
                     ELSE 0 END)
                 / sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END), 9)
               AS exp_recall50,
           round(sum(1 - power(1 - power(j, rows_pb), bands)), 6)
               AS exp_candidates
    FROM pj CROSS JOIN cfg
    GROUP BY bands, rows_pb
    """,
    note="MinHash banding-parameter planning table: for candidate "
         "(bands, rows-per-band) configs at k=128, the S-curve "
         "candidate probability 1-(1-j^r)^b evaluated on the MEASURED "
         "pair-similarity distribution of a bounded 200-doc panel — "
         "expected recall over true near-dups (j>=0.5) and expected "
         "candidate volume over all overlapping pairs. Zero-overlap "
         "pairs contribute exactly 0 to both sums, so restricting to "
         "shingle-sharing pairs is exact, not an approximation. This "
         "is the table you read BEFORE re-banding a 100 TB dedup run; "
         "the audit of what a chosen config actually did afterwards "
         "is dedup_lsh_recall_audit. Panel-bounded all-pairs, O(1) "
         "at corpus scale")
def dedup_minhash_band_tradeoff(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dedup import jaccard_pairs
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = jaccard_pairs(docs, "text", "doc_id", n=3, min_jaccard=0.0)
    cfg = F.broadcast(spark.createDataFrame(
        [(32, 4), (16, 8), (8, 16)], "bands int, rows_pb int"))
    prob = 1 - F.pow(1 - F.pow(F.col("jaccard"), F.col("rows_pb")),
                     F.col("bands"))
    is_true = F.col("jaccard") >= 0.5
    return (pairs.crossJoin(cfg)
            .groupBy("bands", "rows_pb")
            .agg(F.sum(F.when(is_true, 1).otherwise(0)).cast("bigint")
                 .alias("n_true50"),
                 F.round(F.sum(F.when(is_true, prob).otherwise(0.0))
                         / F.sum(F.when(is_true, 1).otherwise(0)), 9)
                 .alias("exp_recall50"),
                 F.round(F.sum(prob), 6).alias("exp_candidates")))


# ---------------------------------------------------------------------------
# B. Embedding-dedup / representation audits
# ---------------------------------------------------------------------------

@register(
    "dedup_embedding_band_sweep",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 300),
    p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                 list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))) AS c
          FROM e a JOIN e b ON a.vec_id < b.vec_id),
    cfg AS (SELECT CAST(unnest([6, 12, 24]) AS INT) AS bands)
    SELECT bands,
           CAST(sum(CASE WHEN c >= 0.40 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true,
           true AS recall_ok, true AS selectivity_ok
    FROM p CROSS JOIN cfg GROUP BY bands
    """,
    note="the r11-queue banded-count sweep of "
         "dedup_embedding_recall_audit: the SAME 48 signed projections "
         "re-banded at 6/12/24 bands (8/4/2 planes per band) against "
         "the exact cosine truth at thr 0.40 on the fixed 300-vector "
         "panel. Measured at sf0.01: recall 5/19 with 2.6% of panel "
         "pairs as candidates (6 bands), 19/19 at 53.8% (12), 19/19 "
         "at 99.8% (24) — the whole S-curve trade driver-visible in "
         "one table. Pinned bounds (integer-multiplied inequalities): "
         "recall >= 20%/95%/95%, candidates <= 10%/60%/100% of panel "
         "pairs. n_true is oracle-exact; one plan builds all three "
         "bandings off one cached signature explode")
def dedup_embedding_band_sweep(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, cosine, lsh_bucket, random_hyperplanes)
    emb = tbl(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    c = emb.select("vec_id",
                   _as_double(F.col("embedding")).alias("__v"))
    dim = len(emb.select("embedding").first()[0])
    planes = random_hyperplanes(48, dim, seed=42)
    pa, pb = c.alias("a"), c.alias("b")
    pairs = (pa.join(F.broadcast(pb),
                     F.col("a.vec_id") < F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("ia"),
                     F.col("b.vec_id").alias("ib"),
                     cosine(F.col("a.__v"), F.col("b.__v")).alias("c")))
    out = None
    for bands, lo_pct, hi_pct in ((6, 20, 10), (12, 95, 60),
                                  (24, 95, 100)):
        b = c.select("vec_id",
                     F.explode(lsh_bucket(F.col("__v"), planes,
                                          bands=bands)).alias("b"))
        x, y = b.alias("x"), b.alias("y")
        cands = (x.join(y, (F.col("x.b.band") == F.col("y.b.band"))
                        & (F.col("x.b.key") == F.col("y.b.key"))
                        & (F.col("x.vec_id") < F.col("y.vec_id")))
                 .select(F.col("x.vec_id").alias("ia"),
                         F.col("y.vec_id").alias("ib"))
                 .distinct().withColumn("__hit", F.lit(1)))
        sel = (cands.agg(F.count(F.lit(1)).alias("__nc"))
               .crossJoin(pairs.agg(F.count(F.lit(1)).alias("__np"))))
        above = F.col("c") >= 0.40
        row = (pairs.join(cands, ["ia", "ib"], "left")
               .agg(F.sum(F.when(above, 1).otherwise(0)).cast("bigint")
                    .alias("n_true"),
                    F.sum(F.when(above, F.coalesce("__hit", F.lit(0)))
                          .otherwise(0)).alias("__found"))
               .crossJoin(F.broadcast(sel))
               .select(F.lit(bands).cast("int").alias("bands"),
                       "n_true",
                       (F.col("__found") * 100
                        >= F.lit(lo_pct) * F.col("n_true"))
                       .alias("recall_ok"),
                       (F.col("__nc") * 100
                        <= F.lit(hi_pct) * F.col("__np"))
                       .alias("selectivity_ok")))
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "embedding_norm_outlier_gate",
    oracle="""
    WITH nr AS (
        SELECT vec_id, label,
               CAST(round(sqrt(list_dot_product(
                   CAST(embedding AS DOUBLE[]),
                   CAST(embedding AS DOUBLE[]))) * 1000000) AS BIGINT)
                   AS nrm
        FROM embeddings),
    cd AS (SELECT label, nrm,
                  cume_dist() OVER (PARTITION BY label ORDER BY nrm)
                      AS cd
           FROM nr),
    q AS (SELECT label,
                 min(CASE WHEN cd >= 0.25 THEN nrm END) AS p25,
                 min(CASE WHEN cd >= 0.75 THEN nrm END) AS p75
          FROM cd GROUP BY 1),
    f AS (SELECT label, p25, p75,
                 4 * p25 - 3 * (p75 - p25) AS lo4,
                 4 * p75 + 3 * (p75 - p25) AS hi4
          FROM q)
    SELECT n.label, f.p25 AS p25_micro, f.p75 AS p75_micro,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN 4 * n.nrm < f.lo4
                          OR 4 * n.nrm > f.hi4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM nr n JOIN f USING (label)
    GROUP BY 1, 2, 3
    """,
    note="embedding L2-norm outlier gate per label (truncated/zeroed/"
         "blown-up vectors are the classic upstream-encoder failure "
         "and poison cosine dedup): norms land in integer micro-units "
         "(round(norm*1e6) — per-row sequential dot, engine-bit-"
         "identical), Tukey fences via the exact PERCENTILE_DISC "
         "cume_dist recipe multiplied through by 4 so the 1.5*IQR "
         "test is pure integer comparison (the dq_outlier_iqr "
         "convention on a derived column). quantile_disc runs the "
         "per-value cumsum form — no raw-row window at any scale")
def embedding_norm_outlier_gate(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import quantile_disc
    from mapreduce_wsi_spark.operators.similarity import _as_double, dot
    emb = tbl(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))
    nr = emb.select("vec_id", "label",
                    F.round(F.sqrt(dot(v, v)) * 1000000)
                    .cast("bigint").alias("nrm"))
    q = (quantile_disc(nr, "label", "nrm", ps=(0.25, 0.75))
         .select("label", F.col("p25"), F.col("p75")))
    f = q.select("label", "p25", "p75",
                 (4 * F.col("p25") - 3 * (F.col("p75") - F.col("p25")))
                 .alias("lo4"),
                 (4 * F.col("p75") + 3 * (F.col("p75") - F.col("p25")))
                 .alias("hi4"))
    return (nr.join(F.broadcast(f), "label")
            .groupBy("label", F.col("p25").alias("p25_micro"),
                     F.col("p75").alias("p75_micro"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum(((4 * F.col("nrm") < F.col("lo4"))
                        | (4 * F.col("nrm") > F.col("hi4")))
                       .cast("int")).cast("bigint")
                 .alias("n_outliers")))


# ---------------------------------------------------------------------------
# C. Quality-classifier distillation (r11 queue)
# ---------------------------------------------------------------------------
# The standard pipeline trick: the heuristic gate stack (Gopher rules)
# is the TEACHER; a cheap token-log-odds student is trained from its
# labels so the expensive/brittle rules can be replaced by one score at
# serving time (and disagreements become the human-review queue).

_DISTILL_MODEL_CTE = f"""
    {_GOPHER_FLAGS_CTE},
    lbl AS (SELECT doc_id,
                   wc_ok AND mwl_ok AND symbol_ok AND alpha_ok
                   AND stop_ok AS keep
            FROM flags),
    dtok AS (SELECT DISTINCT f0.doc_id, unnest(f0.w) AS tok
             FROM f0),
    cls AS (SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                       AS nk,
                   CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                       AS nr
            FROM lbl),
    dfs AS (SELECT d.tok,
                   CAST(sum(CASE WHEN l.keep THEN 1 ELSE 0 END)
                        AS BIGINT) AS df_keep,
                   CAST(sum(CASE WHEN l.keep THEN 0 ELSE 1 END)
                        AS BIGINT) AS df_rej
            FROM dtok d JOIN lbl l ON l.doc_id = d.doc_id
            GROUP BY d.tok),
    model AS (SELECT tok, df_keep, df_rej,
                     CAST(ln((df_keep + 1.0) / (nk + 2.0))
                          - ln((df_rej + 1.0) / (nr + 2.0))
                          AS DECIMAL(28,9)) AS lo
              FROM dfs CROSS JOIN cls
              WHERE df_keep + df_rej >= 20)
"""


@register(
    "quality_distill_labels",
    oracle=f"""
    WITH {_GOPHER_FLAGS_CTE}
    SELECT f1.doc_id,
           fl.wc_ok AND fl.mwl_ok AND fl.symbol_ok AND fl.alpha_ok
           AND fl.stop_ok AS teacher_keep,
           CAST(f1.n_words AS INT) AS n_words,
           CAST(f1.sum_wl AS INT) AS sum_wl,
           CAST(f1.n_nonalpha AS INT) AS n_nonalpha,
           CAST(f1.n_stop AS INT) AS n_stop
    FROM f1 JOIN flags fl ON fl.doc_id = f1.doc_id
    """,
    note="the distillation TRAINING SET: per doc, the teacher verdict "
         "(conjunctive Gopher gate, text_gopher_quality_rules synth) "
         "plus the integer features a student learns from — word "
         "count, summed word length, non-alpha words, stopword hits. "
         "One map-only scan; this is the labeled table every "
         "quality-classifier distillation run materializes first")
def quality_distill_labels(spark, sf_dir):
    from mapreduce_wsi_spark.operators.text import LANG_STOPWORDS
    docs = tbl(spark, sf_dir, "documents")
    t = F.concat(F.col("text"),
                 F.when(F.col("doc_id") % 11 == 0,
                        F.lit(" ### 123 456 %%%")).otherwise(F.lit("")))
    w = F.split(t, " ")
    n_words = F.size(w)
    sum_wl = F.length(t) - (n_words - F.lit(1))
    n_nonalpha = F.size(F.filter(w, lambda x: ~x.rlike("[a-zA-Z]")))
    stop = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(w, lambda x: x.isin(*stop)))
    wc_ok = (n_words >= 40) & (n_words <= 90)
    mwl_ok = (sum_wl >= 3 * n_words) & (sum_wl <= 10 * n_words)
    symbol_ok = n_nonalpha * 10 <= n_words
    alpha_ok = (n_words - n_nonalpha) * 5 >= n_words * 4
    stop_ok = n_stop >= 2
    return docs.select(
        "doc_id",
        (wc_ok & mwl_ok & symbol_ok & alpha_ok & stop_ok)
        .alias("teacher_keep"),
        n_words.cast("int").alias("n_words"),
        sum_wl.cast("int").alias("sum_wl"),
        n_nonalpha.cast("int").alias("n_nonalpha"),
        n_stop.cast("int").alias("n_stop"))


def _distill_parts(spark, sf_dir):
    """Shared Spark-side distillation pieces: (per-doc distinct tokens,
    per-doc teacher label, token log-odds model). The model is the
    add-one-smoothed Naive-Bayes-style per-token evidence
    ln((df_keep+1)/(n_keep+2)) - ln((df_rej+1)/(n_rej+2)), min_df 20,
    carried as DECIMAL(28,9) so downstream per-doc sums are
    accumulation-order-free (the ccnet_paragraph_lm convention)."""
    docs = tbl(spark, sf_dir, "documents")
    lbl = quality_distill_labels(spark, sf_dir).select(
        "doc_id", F.col("teacher_keep").alias("keep"))
    t = F.concat(F.col("text"),
                 F.when(F.col("doc_id") % 11 == 0,
                        F.lit(" ### 123 456 %%%")).otherwise(F.lit("")))
    dtok = (docs.select("doc_id", F.explode(F.split(t, " ")).alias("tok"))
            .distinct())
    cls = lbl.agg(
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("nk"),
        F.sum((~F.col("keep")).cast("int")).cast("bigint").alias("nr"))
    dfs = (dtok.join(lbl, "doc_id")
           .groupBy("tok")
           .agg(F.sum(F.col("keep").cast("int")).cast("bigint")
                .alias("df_keep"),
                F.sum((~F.col("keep")).cast("int")).cast("bigint")
                .alias("df_rej")))
    model = (dfs.crossJoin(F.broadcast(cls))
             .filter(F.col("df_keep") + F.col("df_rej") >= 20)
             .select("tok", "df_keep", "df_rej",
                     (F.log((F.col("df_keep") + 1.0)
                            / (F.col("nk") + 2.0))
                      - F.log((F.col("df_rej") + 1.0)
                              / (F.col("nr") + 2.0)))
                     .cast("decimal(28,9)").alias("lo")))
    return dtok, lbl, model


@register(
    "quality_distill_token_logodds",
    oracle=f"""
    WITH {_DISTILL_MODEL_CTE}
    SELECT tok, df_keep, df_rej,
           round(CAST(lo AS DOUBLE), 9) AS logodds
    FROM model
    ORDER BY abs(lo) DESC, tok LIMIT 150
    """,
    note="the distilled STUDENT MODEL itself: per-token log-odds of "
         "keep vs reject under the teacher labels (add-one smoothing, "
         "min document frequency 20), top-150 by |evidence| — the "
         "entire artifact a serving tier needs to score documents "
         "without running the rule stack. Token df aggregation is "
         "partial-combined; the class-totals ride a 1-row broadcast; "
         "the top-k is TakeOrderedAndProject over the DECIMAL "
         "evidence (exact ordering, ties on token)")
def quality_distill_token_logodds(spark, sf_dir):
    _dtok, _lbl, model = _distill_parts(spark, sf_dir)
    return (model
            .orderBy(F.abs(F.col("lo")).desc(), F.col("tok"))
            .limit(150)
            .select("tok", "df_keep", "df_rej",
                    F.round(F.col("lo").cast("double"), 9)
                    .alias("logodds")))


_DISTILL_SCORE_CTE = f"""
    {_DISTILL_MODEL_CTE},
    sc AS (SELECT d.doc_id, sum(m.lo) AS score
           FROM dtok d JOIN model m ON m.tok = d.tok
           GROUP BY d.doc_id),
    scored AS (SELECT l.doc_id, l.keep AS teacher_keep,
                      coalesce(sc.score, CAST(0 AS DECIMAL(28,9)))
                          AS score
               FROM lbl l LEFT JOIN sc ON sc.doc_id = l.doc_id)
"""


@register(
    "quality_distill_student_agreement",
    oracle=f"""
    WITH {_DISTILL_SCORE_CTE}
    SELECT teacher_keep, score > 0 AS student_keep,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM scored GROUP BY 1, 2
    """,
    note="teacher/student confusion table: each doc scored by the sum "
         "of its distinct tokens' log-odds (DECIMAL accumulation — "
         "order-free, engine-exact), student verdict = score > 0, "
         "cross-tabbed against the teacher gate. The fraction in the "
         "agreement cells is the number that decides whether the "
         "distilled model can replace the rule stack at the serving "
         "tier. Score join is token-keyed (vocab-bounded), one "
         "doc-keyed aggregate, <= 4 output rows")
def quality_distill_student_agreement(spark, sf_dir):
    dtok, lbl, model = _distill_parts(spark, sf_dir)
    sc = (dtok.join(model.select("tok", "lo"), "tok")
          .groupBy("doc_id").agg(F.sum("lo").alias("score")))
    scored = (lbl.join(sc, "doc_id", "left")
              .select("doc_id", F.col("keep").alias("teacher_keep"),
                      F.coalesce("score",
                                 F.lit(0).cast("decimal(28,9)"))
                      .alias("score")))
    return (scored.groupBy("teacher_keep",
                           (F.col("score") > 0).alias("student_keep"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")))


@register(
    "quality_distill_margin_mining",
    oracle=f"""
    WITH {_DISTILL_SCORE_CTE}
    SELECT doc_id, teacher_keep,
           round(CAST(score AS DOUBLE), 9) AS score
    FROM scored
    WHERE teacher_keep <> (score > 0)
    ORDER BY abs(score) DESC, doc_id LIMIT 20
    """,
    note="margin mining — the active-learning queue distillation "
         "produces for free: the 20 most-CONFIDENT student-teacher "
         "disagreements (|score| largest where the verdicts differ). "
         "High-margin disagreement is either a teacher-rule bug or a "
         "student blind spot; both are exactly what a human reviews "
         "first. DECIMAL scores make the cutoff ordering exact; "
         "TakeOrderedAndProject, ties on doc_id")
def quality_distill_margin_mining(spark, sf_dir):
    dtok, lbl, model = _distill_parts(spark, sf_dir)
    sc = (dtok.join(model.select("tok", "lo"), "tok")
          .groupBy("doc_id").agg(F.sum("lo").alias("score")))
    scored = (lbl.join(sc, "doc_id", "left")
              .select("doc_id", F.col("keep").alias("teacher_keep"),
                      F.coalesce("score",
                                 F.lit(0).cast("decimal(28,9)"))
                      .alias("score")))
    return (scored
            .filter(F.col("teacher_keep") != (F.col("score") > 0))
            .orderBy(F.abs(F.col("score")).desc(), F.col("doc_id"))
            .limit(20)
            .select("doc_id", "teacher_keep",
                    F.round(F.col("score").cast("double"), 9)
                    .alias("score")))
