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
    # r15 row-local form (guide §2.4, the char_ngram_repetition
    # treatment): every comparison here is a doc against ITSELF — the
    # edited page's chunks are matched back to the SAME doc's original
    # chunks under both chunkings — so the whole query is a pure
    # function of one text cell. The r11 shape exploded four chunk
    # streams and paid 2 distincts + 2 (id, h) joins + 2 groupBys + a
    # final join (14 Exchange-class ops); this shape is scan ->
    # project: the corpus never leaves its scan task. Chunk-carry
    # membership via array_contains against the original's chunk-hash
    # array == the old LEFT JOIN against its DISTINCT (id, h) set (the
    # join's per-edited-chunk hit predicate is hash membership; the
    # distinct only removed join-side duplicates, which membership
    # never sees). Every intermediate rides a let-binder
    # (transform(array(e), v -> ...)[0]) per the cdc_chunk_arr
    # lambda-inlining discipline; the oracle SQL is unchanged.
    from mapreduce_wsi_spark.operators.curation import _cdc_chunk_expr

    docs = tbl(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    # edited word array spliced directly (the r11 form round-tripped
    # through concat_ws + re-split — identity on split output, since
    # split words never contain the separator)
    spl = ("concat(slice(wo, 1, size(wo) div 2), array('zEDITz'), "
           "slice(wo, size(wo) div 2 + 1, size(wo) - size(wo) div 2))")

    def cdc_h(ref: str) -> str:
        return f"transform({_cdc_chunk_expr(ref)}, c -> md5(c))"

    def fx_h(ref: str) -> str:
        return (f"transform(sequence(0, (size({ref}) - 1) div 4), "
                f"j -> md5(concat_ws(' ', slice({ref}, j * 4 + 1, 4))))")

    st = F.expr(
        f"transform(array(__w), wo -> "
        f"transform(array({spl}), we -> "
        f"transform(array({cdc_h('wo')}), oh -> "
        f"transform(array({cdc_h('we')}), eh -> "
        f"transform(array({fx_h('wo')}), ofx -> "
        f"transform(array({fx_h('we')}), efx -> "
        f"named_struct("
        f"'nc', size(eh), "
        f"'kc', size(filter(eh, h -> array_contains(oh, h))), "
        f"'nf', size(efx), "
        f"'kf', size(filter(efx, h -> array_contains(ofx, h))))"
        f")[0])[0])[0])[0])[0])[0]")
    return (docs.select("doc_id", w.alias("__w"))
            .select("doc_id", st.alias("__s"))
            .select("doc_id",
                    F.round(F.col("__s.kc") / F.col("__s.nc"), 9)
                    .alias("cdc_frac"),
                    F.round(F.col("__s.kf") / F.col("__s.nf"), 9)
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
    from mapreduce_wsi_spark.util import literal_df
    cfg = F.broadcast(literal_df(
        spark, [(32, 4), (16, 8), (8, 16)], "bands int, rows_pb int"))
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
    dtok AS (SELECT DISTINCT doc_id, tok FROM (
                 SELECT f0.doc_id, unnest(f0.w) AS tok FROM f0
                 UNION ALL
                 SELECT doc_id, 'LEN:' || CAST(len(w) // 10 AS VARCHAR)
                 FROM f0) u),
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
              WHERE df_keep + df_rej >= 20),
    model_sel AS (SELECT * FROM model WHERE abs(lo) >= 0.5)
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
    # text tokens + a length-bucket pseudo-token: a bag-of-words
    # student cannot represent the teacher's word-count gate, so the
    # featurizer adds the discretized length as a token (the standard
    # distillation featurization trick) — same expression both engines
    dtok = (docs.select("doc_id",
                        F.explode(F.split(t, " ")).alias("tok"))
            .unionByName(docs.select(
                "doc_id",
                F.concat(F.lit("LEN:"),
                         F.floor(F.size(F.split(t, " ")) / 10)
                         .cast("string")).alias("tok")))
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
    # Evidence-threshold feature selection (|log-odds| >= 0.5): with
    # correlated generic tokens, a naive sum drowns the length/badness
    # signal in hundreds of weakly-positive terms (short reject docs
    # carry fewer tokens, so EVERY common word reads as mild keep
    # evidence); keeping only discriminative features is the standard
    # NB fix and lifts teacher agreement from ~66% to >90%.
    model = (dfs.crossJoin(F.broadcast(cls))
             .filter(F.col("df_keep") + F.col("df_rej") >= 20)
             .select("tok", "df_keep", "df_rej",
                     (F.log((F.col("df_keep") + 1.0)
                            / (F.col("nk") + 2.0))
                      - F.log((F.col("df_rej") + 1.0)
                              / (F.col("nr") + 2.0)))
                     .cast("decimal(28,9)").alias("lo"))
             .filter(F.abs(F.col("lo")) >= 0.5))
    return dtok, lbl, model


@register(
    "quality_distill_token_logodds",
    oracle=f"""
    WITH {_DISTILL_MODEL_CTE}
    SELECT tok, df_keep, df_rej,
           round(CAST(lo AS DOUBLE), 9) AS logodds
    FROM model_sel
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
           FROM dtok d JOIN model_sel m ON m.tok = d.tok
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


# ---------------------------------------------------------------------------
# D. Mixing / curriculum pacing under token budgets (r11 queue)
# ---------------------------------------------------------------------------

@register(
    "mix_token_budget_pacing",
    oracle="""
    WITH s AS (SELECT doc_id, source, n_chars,
                      ntile(4) OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS stage
               FROM documents),
    per AS (SELECT source, CAST(stage AS INT) AS stage,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS stage_tokens
            FROM s GROUP BY 1, 2),
    tot AS (SELECT source, sum(stage_tokens) AS src_tokens FROM per
            GROUP BY 1)
    SELECT p.source, p.stage, p.n_docs, p.stage_tokens,
           CAST(sum(p.stage_tokens) OVER (
               PARTITION BY p.source ORDER BY p.stage) AS BIGINT)
               AS cum_tokens,
           CAST(p.stage_tokens * 1000000 // t.src_tokens AS BIGINT)
               AS share_ppm
    FROM per p JOIN tot t USING (source)
    """,
    note="per-domain curriculum pacing under token budgets (r11 "
         "queue: mix_curriculum_schedule x token accounting): within "
         "each source, docs rank easy-to-hard into 4 stages via the "
         "factored bucketed prefix-sum ntile (no whole-domain window), "
         "then the table reports each stage's TOKEN mass, running "
         "total, and share — the pacing reality check that a "
         "length-ordered curriculum front-loads counts but back-loads "
         "tokens (stage 4 carries the longest docs). The stage-level "
         "cumsum runs over |source x 4| aggregate rows, never data")
def mix_token_budget_pacing(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import ntile_bucketed
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    staged = ntile_bucketed(docs, ["source"], "n_chars", "doc_id",
                            n_tiles=4, bucket_width=64,
                            tile_col="stage")
    per = (staged.groupBy("source", "stage")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("stage_tokens")))
    w_cum = (Window.partitionBy("source").orderBy("stage")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = per.groupBy("source").agg(
        F.sum("stage_tokens").alias("src_tokens"))
    return (per
            .withColumn("cum_tokens",
                        F.sum("stage_tokens").over(w_cum)
                        .cast("bigint"))
            .join(F.broadcast(tot), "source")
            .select("source", "stage", "n_docs", "stage_tokens",
                    "cum_tokens",
                    F.expr("stage_tokens * 1000000 div src_tokens")
                    .cast("bigint").alias("share_ppm")))


@register(
    "mix_dedup_aware_weights",
    oracle=r"""
    WITH h AS (SELECT doc_id, source, n_chars,
                      md5(lower(trim(regexp_replace(text, '\s+', ' ',
                                                    'g')))) AS h
               FROM documents),
    firsts AS (SELECT h, min(doc_id) AS keeper FROM h GROUP BY h),
    per AS (SELECT s.source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN s.doc_id = f.keeper
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_unique,
                   CAST(sum(CASE WHEN s.doc_id = f.keeper
                                 THEN s.n_chars ELSE 0 END) AS BIGINT)
                       AS eff_tokens
            FROM h s JOIN firsts f ON f.h = s.h
            GROUP BY 1),
    tot AS (SELECT sum(eff_tokens) AS te FROM per)
    SELECT source, n_docs, n_unique, eff_tokens,
           CAST(eff_tokens * 1000000 // te AS BIGINT) AS weight_ppm
    FROM per CROSS JOIN tot
    """,
    note="dedup-aware mixture weights: a domain's sampling weight "
         "should follow its UNIQUE token mass, not its raw size — a "
         "crawl-heavy domain that is 40% duplicates would otherwise "
         "be overweighted and the model would see its dups at twice "
         "the intended rate. Exact first-occurrence dedup (hash "
         "groupBy, min-keeper) feeds per-source effective tokens and "
         "the renormalized ppm weight. Two partial-aggregated "
         "shuffles; the corpus total rides a 1-row broadcast")
def mix_dedup_aware_weights(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", "source", "n_chars",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
        .alias("h"))
    firsts = h.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    per = (h.join(firsts, "h")
           .groupBy("source")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum((F.col("doc_id") == F.col("keeper")).cast("int"))
                .cast("bigint").alias("n_unique"),
                F.sum(F.when(F.col("doc_id") == F.col("keeper"),
                             F.col("n_chars")).otherwise(0))
                .cast("bigint").alias("eff_tokens")))
    tot = per.agg(F.sum("eff_tokens").alias("te"))
    return (per.crossJoin(F.broadcast(tot))
            .select("source", "n_docs", "n_unique", "eff_tokens",
                    F.expr("eff_tokens * 1000000 div te")
                    .cast("bigint").alias("weight_ppm")))


@register(
    "mix_anneal_high_quality",
    oracle=f"""
    WITH {_GOPHER_FLAGS_CTE},
    st AS (SELECT doc_id, source, n_chars,
                  ntile(4) OVER (PARTITION BY source
                                 ORDER BY n_chars, doc_id) AS stage
           FROM documents),
    ph AS (SELECT st.source,
                  CASE WHEN st.stage = 4 AND fl.wc_ok AND fl.mwl_ok
                            AND fl.symbol_ok AND fl.alpha_ok
                            AND fl.stop_ok
                       THEN 2 ELSE 1 END AS phase,
                  st.n_chars
           FROM st JOIN flags fl ON fl.doc_id = st.doc_id),
    per AS (SELECT source, CAST(phase AS INT) AS phase,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS tokens
            FROM ph GROUP BY 1, 2),
    tot AS (SELECT source, sum(tokens) AS t FROM per GROUP BY 1)
    SELECT p.source, p.phase, p.n_docs, p.tokens,
           CAST(p.tokens * 1000000 // t.t AS BIGINT) AS share_ppm
    FROM per p JOIN tot t USING (source)
    """,
    note="two-phase anneal schedule (the end-of-training recipe: "
         "finish on the highest-quality slice): phase 2 = docs that "
         "are BOTH in their domain's top length quartile (the "
         "bucketed-prefix-sum ntile, no whole-domain window) AND pass "
         "the full Gopher gate; phase 1 = everything else. The table "
         "reports each domain's anneal token share — the number that "
         "decides whether the anneal phase needs upsampling. "
         "Composes mix_curriculum_schedule x "
         "text_gopher_quality_rules; aggregates only")
def mix_anneal_high_quality(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import ntile_bucketed
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    staged = ntile_bucketed(docs, ["source"], "n_chars", "doc_id",
                            n_tiles=4, bucket_width=64,
                            tile_col="stage")
    keep = _gopher_flagged(spark, sf_dir).select(
        "doc_id", F.col("keep"))
    ph = (staged.join(keep, "doc_id")
          .select("source", "n_chars",
                  F.when((F.col("stage") == 4) & F.col("keep"), 2)
                  .otherwise(1).cast("int").alias("phase")))
    per = (ph.groupBy("source", "phase")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("tokens")))
    tot = per.groupBy("source").agg(F.sum("tokens").alias("t"))
    return (per.join(F.broadcast(tot), "source")
            .select("source", "phase", "n_docs", "tokens",
                    F.expr("tokens * 1000000 div t").cast("bigint")
                    .alias("share_ppm")))


# ---------------------------------------------------------------------------
# E. Web-corpus curation extensions
# ---------------------------------------------------------------------------

@register(
    "text_line_global_dedup",
    oracle="""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents),
    ln AS (SELECT doc_id, j,
                  array_to_string(
                      w[CAST(j*10+1 AS INT):CAST(j*10+10 AS INT)], ' ')
                      AS line
           FROM (SELECT doc_id, w,
                        unnest(generate_series(0, (len(w)-1)//10)) AS j
                 FROM tk) t),
    df AS (SELECT md5(line) AS h, count(DISTINCT doc_id) AS df
           FROM ln GROUP BY 1)
    SELECT l.doc_id, CAST(count(*) AS INT) AS n_lines,
           CAST(sum(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) AS INT)
               AS n_removed,
           round(sum(CASE WHEN d.df >= 3 THEN 0
                          ELSE length(l.line) END) * 1.0
                 / sum(length(l.line)), 9) AS retained_char_frac
    FROM ln l JOIN df d ON d.h = md5(l.line)
    GROUP BY l.doc_id
    """,
    note="C4-style global line dedup (Raffel et al. 2020 removed any "
         "line occurring >= 3 times across the corpus — boilerplate "
         "nav/footer text): lines are fixed 10-word segments of the "
         "single-line fixture docs (the udtf_chunk_text convention); "
         "a line is removed EVERYWHERE when it appears in >= 3 "
         "distinct docs; per doc the retained char fraction — the "
         "actual byte survival rate of the gate. Global line df is "
         "one partial-aggregated groupBy on the line hash; the "
         "re-join is hash-equi. Distinct from dedup_paragraph_exact "
         "(first-occurrence KEEP) — this is the frequency-threshold "
         "REMOVE-ALL form")
def text_line_global_dedup(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    lines = F.expr(
        "transform(sequence(0, (size(__w) - 1) div 10), "
        "j -> concat_ws(' ', slice(__w, j * 10 + 1, 10)))")
    ln = (docs.select(F.col("doc_id"),
                      F.split(F.col("text"), " ").alias("__w"))
          .select("doc_id", F.explode(lines).alias("line"))
          .select("doc_id", "line", F.md5("line").alias("h")))
    df = ln.groupBy("h").agg(
        F.countDistinct("doc_id").alias("df"))
    rm = F.col("df") >= 3
    return (ln.join(df, "h")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("int").alias("n_lines"),
                 F.sum(rm.cast("int")).cast("int").alias("n_removed"),
                 F.round(F.sum(F.when(rm, 0)
                               .otherwise(F.length("line")))
                         / F.sum(F.length("line")), 9)
                 .alias("retained_char_frac")))


@register(
    "text_blocklist_categories",
    oracle="""
    WITH bl AS (SELECT * FROM (VALUES
            ('slow', 'latency'), ('dup', 'duplication'),
            ('big', 'hyperbole'), ('fast', 'hyperbole'))
        b(word, category)),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents),
    hits AS (SELECT b.category, t.doc_id
             FROM tok t JOIN bl b ON b.word = t.w)
    SELECT category,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_hits
    FROM hits GROUP BY 1
    """,
    note="category blocklist gate (the C4 badwords-filter shape, with "
         "fixture-vocabulary stand-ins): a broadcast (word, category) "
         "list joined against the token stream; per category, how "
         "many docs and total occurrences the gate would touch — the "
         "impact report a filter list change ships with. The "
         "blocklist side broadcasts at any corpus size; the token "
         "explode is the linear scan every text gate already pays")
def text_blocklist_categories(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    from mapreduce_wsi_spark.util import literal_df
    bl = F.broadcast(literal_df(
        spark,
        [("slow", "latency"), ("dup", "duplication"),
         ("big", "hyperbole"), ("fast", "hyperbole")],
        "word string, category string"))
    tok = docs.select("doc_id",
                      F.explode(F.split("text", " ")).alias("w"))
    return (tok.join(bl, tok.w == bl.word)
            .groupBy("category")
            .agg(F.countDistinct("doc_id").cast("bigint")
                 .alias("n_docs"),
                 F.count(F.lit(1)).cast("bigint").alias("n_hits")))


@register(
    "decontam_canary_scan",
    oracle="""
    WITH can AS (SELECT doc_id AS canary_src,
                        array_to_string(
                            string_split(text, ' ')[3:8], ' ') AS canary
                 FROM documents WHERE doc_id % 97 = 0),
    hits AS (SELECT c.canary_src, d.doc_id
             FROM can c JOIN documents d
               ON position(c.canary IN d.text) > 0)
    SELECT canary_src,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM hits GROUP BY 1
    """,
    note="canary-string contamination scan: the registry of planted "
         "canaries (here: a 6-word span from every 97th doc — in "
         "production the GUID strings benchmark owners publish) is "
         "swept across the corpus as a substring match; per canary, "
         "how many documents carry it and the first sighting. The "
         "canary side is a bounded broadcast; the scan is one "
         "map-only pass with a nested-loop broadcast join (|canaries| "
         "substring tests per doc — exactly how canary sweeps run at "
         "corpus scale). Self-hits count: a canary that no longer "
         "matches even its source doc signals a broken registry")
def decontam_canary_scan(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    can = F.broadcast(
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("canary_src"),
                F.concat_ws(" ", F.slice(F.split("text", " "), 3, 6))
                .alias("canary")))
    return (docs.join(can, F.instr(F.col("text"), F.col("canary")) > 0)
            .groupBy("canary_src")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.min("doc_id").cast("bigint").alias("first_doc")))


@register(
    "web_spam_host_burst",
    oracle=r"""
    WITH h AS (SELECT doc_id, source || '.example.com' AS host,
                      md5(lower(trim(regexp_replace(text, '\s+', ' ',
                                                    'g')))) AS h
               FROM documents),
    cnt AS (SELECT h, count(*) AS c FROM h GROUP BY 1),
    d AS (SELECT s.host, CASE WHEN c.c >= 2 THEN 1 ELSE 0 END AS is_dup
          FROM h s JOIN cnt c ON c.h = s.h),
    per AS (SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(is_dup) AS BIGINT) AS n_dup
            FROM d GROUP BY 1),
    tot AS (SELECT sum(n_docs) AS td, sum(n_dup) AS tdup FROM per)
    SELECT host, n_docs, n_dup,
           CAST(n_dup * 1000000 // n_docs AS BIGINT) AS dup_ppm,
           n_dup > 0 AND n_dup * td >= 3 * tdup * n_docs AS burst
    FROM per CROSS JOIN tot
    """,
    note="spam/SEO-farm host detection: hosts whose duplicate rate is "
         ">= 3x the corpus rate (content farms re-publish the same "
         "page under many URLs; their hosts light up in exactly this "
         "table). Dup membership is exact hash-count >= 2; the flag "
         "is an integer-multiplied rate comparison (n_dup * total "
         ">= 3 * total_dup * n_docs) — engine-portable, no float "
         "division in the verdict. Two aggregates + a 1-row broadcast")
def web_spam_host_burst(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    h = docs.select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
        .alias("h"))
    cnt = h.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    per = (h.join(cnt, "h")
           .groupBy("host")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum((F.col("c") >= 2).cast("int")).cast("bigint")
                .alias("n_dup")))
    tot = per.agg(F.sum("n_docs").alias("td"),
                  F.sum("n_dup").alias("tdup"))
    return (per.crossJoin(F.broadcast(tot))
            .select("host", "n_docs", "n_dup",
                    F.expr("n_dup * 1000000 div n_docs").cast("bigint")
                    .alias("dup_ppm"),
                    ((F.col("n_dup") > 0)
                     & (F.col("n_dup") * F.col("td")
                        >= 3 * F.col("tdup") * F.col("n_docs")))
                    .alias("burst")))


@register(
    "web_host_crawl_budget",
    oracle="""
    WITH r AS (SELECT source || '.example.com' AS host, doc_id, n_chars,
                      row_number() OVER (
                          PARTITION BY source
                          ORDER BY n_chars DESC, doc_id) AS rn
               FROM documents)
    SELECT host, CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_selected,
           CAST(sum(CASE WHEN rn <= 5 THEN n_chars ELSE 0 END)
                AS BIGINT) AS selected_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM r GROUP BY host
    """,
    note="per-host crawl/recrawl budget: under a politeness budget of "
         "5 fetches per host, keep each host's 5 highest-value pages "
         "(n_chars as the value proxy) — the frontier-prioritization "
         "table a recrawl scheduler executes. The per-host top-k runs "
         "as SALTED two-phase rank (operators/similarity.salted_topk "
         "— no host's full page list ever sits in one window task; "
         "hosts are the classic skew key: one domain can be 1% of the "
         "crawl). Oracle keeps the plain window form — the salted "
         "rewrite must be output-identical")
def web_host_crawl_budget(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import salted_topk
    docs = tbl(spark, sf_dir, "documents").select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        "doc_id", "n_chars")
    sel = (salted_topk(docs, "host",
                       [F.col("n_chars").desc(), F.col("doc_id")],
                       "doc_id", k=5)
           .select("host", "doc_id")
           .withColumn("__sel", F.lit(1)))
    return (docs.join(sel, ["host", "doc_id"], "left")
            .groupBy("host")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_total"),
                 F.sum(F.coalesce("__sel", F.lit(0))).cast("bigint")
                 .alias("n_selected"),
                 F.sum(F.when(F.col("__sel").isNotNull(),
                              F.col("n_chars")).otherwise(0))
                 .cast("bigint").alias("selected_chars"),
                 F.sum("n_chars").cast("bigint").alias("total_chars")))


@register(
    "split_group_host",
    oracle="""
    WITH d AS (SELECT doc_id, source || '.example.com' AS host
               FROM documents),
    sp AS (SELECT doc_id, host,
                  CASE WHEN CAST(('0x' || substr(md5(host), 1, 8))
                            AS BIGINT) % 10 < 8
                       THEN 'train' ELSE 'val' END AS split
           FROM d),
    leak AS (SELECT CAST(count(*) AS BIGINT) AS n_leaked
             FROM (SELECT host FROM sp GROUP BY host
                   HAVING count(DISTINCT split) > 1) t),
    tot AS (SELECT count(*) AS n FROM sp)
    SELECT split, CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) * 1000000 // max(tot.n) AS BIGINT)
               AS docs_ppm,
           max(leak.n_leaked) AS n_leaked_hosts
    FROM sp CROSS JOIN leak CROSS JOIN tot
    GROUP BY split
    """,
    note="host-grouped train/val split: membership is a pure function "
         "of the HOST (portable md5 bucket, 80/20), so every page of "
         "a domain lands on one side — the split that actually "
         "prevents template/boilerplate leakage between train and "
         "val (doc-hash splits leak near-identical sibling pages). "
         "The audit emits per-split host/doc tallies plus the "
         "cross-split host count, which must be zero by construction "
         "and is computed, not asserted")
def split_group_host(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    host = F.concat(F.col("source"), F.lit(".example.com"))
    sp = docs.select(
        "doc_id", host.alias("host"),
        F.when(portable_bucket(host, 10) < 8, "train")
        .otherwise("val").alias("split"))
    leak = (sp.groupBy("host")
            .agg(F.countDistinct("split").alias("ns"))
            .filter(F.col("ns") > 1)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaked")))
    tot = sp.agg(F.count(F.lit(1)).alias("n"))
    return (sp.crossJoin(F.broadcast(leak)).crossJoin(F.broadcast(tot))
            .groupBy("split")
            .agg(F.countDistinct("host").cast("bigint")
                 .alias("n_hosts"),
                 F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.expr("count(1) * 1000000 div max(n)").cast("bigint")
                 .alias("docs_ppm"),
                 F.max("n_leaked").alias("n_leaked_hosts")))


@register(
    "provenance_license_rollup",
    oracle="""
    WITH lic AS (SELECT doc_id, source, n_chars,
                        CASE CAST(('0x' || substr(md5(source), 1, 8))
                                  AS BIGINT) % 4
                             WHEN 0 THEN 'cc-by' WHEN 1 THEN 'cc0'
                             WHEN 2 THEN 'mit' ELSE 'proprietary'
                        END AS license
                 FROM documents),
    tot AS (SELECT sum(n_chars) AS tc FROM lic)
    SELECT license, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) * 1000000 // max(tot.tc) AS BIGINT)
               AS chars_ppm
    FROM lic CROSS JOIN tot GROUP BY license
    """,
    note="license-provenance accounting (the data-governance rollup "
         "every training-corpus release ships): license derives from "
         "the source registry (fixture: portable md5 bucket of the "
         "source — in production a broadcast source->license map), "
         "and the table answers 'how many tokens are cc0 vs "
         "proprietary' in ppm. One aggregate + 1-row broadcast total")
def provenance_license_rollup(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    docs = tbl(spark, sf_dir, "documents")
    lic = docs.select(
        "doc_id", "source", "n_chars",
        F.element_at(
            F.array(F.lit("cc-by"), F.lit("cc0"), F.lit("mit"),
                    F.lit("proprietary")),
            portable_bucket(F.col("source"), 4) + 1).alias("license"))
    tot = lic.agg(F.sum("n_chars").alias("tc"))
    return (lic.crossJoin(F.broadcast(tot))
            .groupBy("license")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.countDistinct("source").cast("bigint")
                 .alias("n_sources"),
                 F.sum("n_chars").cast("bigint").alias("total_chars"),
                 F.expr("sum(n_chars) * 1000000 div max(tc)")
                 .cast("bigint").alias("chars_ppm")))


@register(
    "filter_length_pctile_lang",
    oracle="""
    WITH cd AS (SELECT lang, n_chars,
                       cume_dist() OVER (PARTITION BY lang
                                         ORDER BY n_chars) AS cd
                FROM documents),
    q AS (SELECT lang,
                 min(CASE WHEN cd >= 0.05 THEN n_chars END) AS p5,
                 min(CASE WHEN cd >= 0.95 THEN n_chars END) AS p95
          FROM cd GROUP BY 1)
    SELECT d.lang, CAST(q.p5 AS BIGINT) AS p5,
           CAST(q.p95 AS BIGINT) AS p95,
           CAST(sum(CASE WHEN d.n_chars < q.p5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below,
           CAST(sum(CASE WHEN d.n_chars > q.p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above,
           CAST(sum(CASE WHEN d.n_chars >= q.p5
                          AND d.n_chars <= q.p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN q USING (lang)
    GROUP BY 1, 2, 3
    """,
    note="per-language length-percentile gates (length distributions "
         "differ per language, so one global cut over- or under-"
         "filters the tails): exact PERCENTILE_DISC P5/P95 per lang "
         "via the shared per-value-cumsum helper (no raw-row window), "
         "fence table broadcast back for the kept/dropped tallies. "
         "The gate a multilingual pipeline runs instead of C4's "
         "fixed word-count cut")
def filter_length_pctile_lang(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import quantile_disc
    docs = tbl(spark, sf_dir, "documents")
    q = (quantile_disc(docs, "lang", "n_chars", ps=(0.05, 0.95))
         .select("lang", "p5", "p95"))
    return (docs.join(F.broadcast(q), "lang")
            .groupBy("lang", F.col("p5").cast("bigint").alias("p5"),
                     F.col("p95").cast("bigint").alias("p95"))
            .agg(F.sum((F.col("n_chars") < F.col("p5")).cast("int"))
                 .cast("bigint").alias("n_below"),
                 F.sum((F.col("n_chars") > F.col("p95")).cast("int"))
                 .cast("bigint").alias("n_above"),
                 F.sum(((F.col("n_chars") >= F.col("p5"))
                        & (F.col("n_chars") <= F.col("p95")))
                       .cast("int")).cast("bigint").alias("n_kept")))


# ---------------------------------------------------------------------------
# F. Preference / SFT data QA
# ---------------------------------------------------------------------------

_BT_BATTLES_CTE = """
    b AS (SELECT doc_id,
                 'm' || CAST(doc_id % 4 AS VARCHAR) AS ma,
                 'm' || CAST((doc_id // 4) % 4 AS VARCHAR) AS mb,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1,
                                      8)) AS BIGINT) % 2 = 0 AS a_wins
          FROM documents WHERE doc_id % 4 <> (doc_id // 4) % 4),
    e AS (SELECT ma AS i, mb AS j,
                 CASE WHEN a_wins THEN 1 ELSE 0 END AS w FROM b
          UNION ALL
          SELECT mb, ma, CASE WHEN a_wins THEN 0 ELSE 1 END FROM b),
    p AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(w) AS BIGINT) AS w
          FROM e GROUP BY 1, 2),
    wt AS (SELECT i AS model, CAST(sum(w) AS BIGINT) AS wins,
                  CAST(sum(n) AS BIGINT) AS n_battles
           FROM p GROUP BY 1)
"""


@register(
    "eval_bradley_terry",
    oracle=f"""
    WITH {_BT_BATTLES_CTE},
    s0 AS (SELECT model, CAST(1.0 AS DOUBLE) AS s FROM wt),
    d1 AS (SELECT p.i AS model,
                  CAST(sum(CAST(p.n / (si.s + sj.s)
                                AS DECIMAL(28,12))) AS DOUBLE) AS d
           FROM p JOIN s0 si ON si.model = p.i
                JOIN s0 sj ON sj.model = p.j
           GROUP BY 1),
    s1 AS (SELECT w.model, w.wins / d1.d AS s
           FROM wt w JOIN d1 USING (model)),
    d2 AS (SELECT p.i AS model,
                  CAST(sum(CAST(p.n / (si.s + sj.s)
                                AS DECIMAL(28,12))) AS DOUBLE) AS d
           FROM p JOIN s1 si ON si.model = p.i
                JOIN s1 sj ON sj.model = p.j
           GROUP BY 1),
    s2 AS (SELECT w.model, w.wins / d2.d AS s
           FROM wt w JOIN d2 USING (model))
    SELECT w.model, w.wins, w.n_battles,
           round(s2.s, 9) AS strength
    FROM wt w JOIN s2 USING (model)
    """,
    note="Bradley-Terry strength fitting over the arena battle table "
         "(Hunter 2004 MM updates, two fixed iterations from uniform "
         "init — deterministic, so the whole fit is a driver-hashable "
         "query): s_i <- W_i / sum_j n_ij/(s_i+s_j). Battles "
         "synthesized as in eval_pairwise_winrate but over 4 models; "
         "all iteration state is |models|-row aggregates (the battle "
         "table is the only corpus-scale side), per-term DECIMAL "
         "accumulation keeps the sums order-free. The ladder behind "
         "every LLM-arena leaderboard, as one catalog query")
def eval_bradley_terry(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    docs = tbl(spark, sf_dir, "documents")
    b = (docs.select(
            "doc_id",
            F.concat(F.lit("m"), (F.col("doc_id") % 4).cast("string"))
            .alias("ma"),
            F.concat(F.lit("m"),
                     (F.expr("doc_id div 4") % 4).cast("string"))
            .alias("mb"),
            (portable_bucket(F.col("doc_id")) % 2 == 0).alias("a_wins"))
         .filter(F.col("ma") != F.col("mb")))
    e = (b.select(F.col("ma").alias("i"), F.col("mb").alias("j"),
                  F.col("a_wins").cast("int").alias("w"))
         .unionByName(
             b.select(F.col("mb").alias("i"), F.col("ma").alias("j"),
                      (~F.col("a_wins")).cast("int").alias("w"))))
    p = (e.groupBy("i", "j")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum("w").cast("bigint").alias("w")))
    wt = (p.groupBy(F.col("i").alias("model"))
          .agg(F.sum("w").alias("wins"),
               F.sum("n").alias("n_battles")))
    s = wt.select("model", F.lit(1.0).alias("s"))
    for _ in range(2):
        si = s.select(F.col("model").alias("i"), F.col("s").alias("si"))
        sj = s.select(F.col("model").alias("j"), F.col("s").alias("sj"))
        d = (p.join(F.broadcast(si), "i").join(F.broadcast(sj), "j")
             .groupBy(F.col("i").alias("model"))
             .agg(F.sum((F.col("n") / (F.col("si") + F.col("sj")))
                        .cast("decimal(28,12)"))
                  .cast("double").alias("d")))
        s = (wt.join(d, "model")
             .select("model", (F.col("wins") / F.col("d")).alias("s")))
    return (wt.join(s, "model")
            .select("model", "wins", "n_battles",
                    F.round(F.col("s"), 9).alias("strength")))


@register(
    "sft_turn_alternation_audit",
    oracle="""
    WITH r AS (SELECT user_id, ts, event_id,
                      CASE WHEN event_type IN ('view', 'click')
                           THEN 'user' ELSE 'assistant' END AS role
               FROM events),
    lg AS (SELECT user_id, role, ts, event_id,
                  lag(role) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM r)
    SELECT user_id, CAST(count(*) AS INT) AS n_turns,
           CAST(sum(CASE WHEN role = prev THEN 1 ELSE 0 END) AS INT)
               AS n_violations,
           bool_or(rn = 1 AND role = 'user') AS starts_user,
           sum(CASE WHEN role = prev THEN 1 ELSE 0 END) = 0
           AND bool_or(rn = 1 AND role = 'user')
           AND count(DISTINCT role) = 2 AS well_formed
    FROM lg GROUP BY user_id
    """,
    note="SFT conversation-structure audit: event streams as chat "
         "threads (view/click -> user turn, everything else -> "
         "assistant), per thread the turn count, role-alternation "
         "violations (consecutive same-role turns), whether it opens "
         "with a user turn, and the conjunctive well-formedness gate "
         "an SFT ingest applies before formatting to a chat template. "
         "One per-thread window (bounded by thread length) + one "
         "aggregate — the sessionize plan shape")
def sft_turn_alternation_audit(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    role = (F.when(F.col("event_type").isin("view", "click"), "user")
            .otherwise("assistant"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lg = (ev.select("user_id", "ts", "event_id", role.alias("role"))
          .withColumn("prev", F.lag("role").over(w))
          .withColumn("rn", F.row_number().over(w)))
    viol = (F.col("role") == F.col("prev")).cast("int")
    return (lg.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("int").alias("n_turns"),
                 F.sum(viol).cast("int").alias("n_violations"),
                 F.max((F.col("rn") == 1)
                       & (F.col("role") == "user")).alias("starts_user"),
                 ((F.sum(viol) == 0)
                  & F.max((F.col("rn") == 1)
                          & (F.col("role") == "user"))
                  & (F.countDistinct("role") == 2))
                 .alias("well_formed")))


@register(
    "sft_prompt_dedup",
    oracle="""
    WITH pr AS (SELECT doc_id, n_chars,
                       md5(array_to_string(
                           string_split(text, ' ')[1:6], ' ')) AS ph
                FROM documents),
    r AS (SELECT doc_id, n_chars, ph,
                 row_number() OVER (PARTITION BY ph
                                    ORDER BY n_chars DESC, doc_id)
                     AS rn
          FROM pr)
    SELECT ph AS prompt_h, CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
               AS kept_doc,
           CAST(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
               AS kept_chars
    FROM r GROUP BY ph HAVING count(*) > 1
    """,
    note="prompt-level dedup for SFT sets: instruction datasets "
         "accumulate the same prompt with many responses; group by "
         "the normalized prompt key (first 6 words) and keep the "
         "longest response (ties to the lowest id) — the keep-best "
         "policy, keyed by PROMPT instead of full text (distinct "
         "from dedup_keep_longest, which dedups whole documents). "
         "One struct-argmax aggregate — no window, no pairwise; "
         "only groups with competition are emitted")
def sft_prompt_dedup(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    ph = F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 6)))
    pr = docs.select("doc_id", "n_chars", ph.alias("prompt_h"))
    best = F.max(F.struct(F.col("n_chars"),
                          (-F.col("doc_id")).alias("nd")))
    return (pr.groupBy("prompt_h")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
                 best.alias("__b"))
            .filter(F.col("n_candidates") > 1)
            .select("prompt_h", "n_candidates",
                    (-F.col("__b.nd")).cast("bigint").alias("kept_doc"),
                    F.col("__b.n_chars").cast("bigint")
                    .alias("kept_chars")))


@register(
    "eval_length_bias_audit",
    oracle="""
    WITH pa AS (SELECT doc_id AS a, doc_id + 1 AS bid, n_chars AS ca
                FROM documents WHERE doc_id % 2 = 0),
    battles AS (SELECT pa.a, pa.ca, d.n_chars AS cb,
                       CAST(('0x' || substr(md5(CAST(pa.a AS VARCHAR)),
                                            1, 8)) AS BIGINT) % 2 = 0
                           AS a_wins
                FROM pa JOIN documents d ON d.doc_id = pa.bid
                WHERE pa.ca <> d.n_chars)
    SELECT CAST(count(*) AS BIGINT) AS n_battles,
           CAST(sum(CASE WHEN a_wins = (ca > cb) THEN 1 ELSE 0 END)
                AS BIGINT) AS longer_wins,
           CAST(sum(CASE WHEN a_wins = (ca > cb) THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS win_ppm,
           20 * sum(CASE WHEN a_wins = (ca > cb) THEN 1 ELSE 0 END)
               >= 11 * count(*) AS biased
    FROM battles
    """,
    note="length-bias audit for preference data: across response "
         "pairs with unequal lengths, how often the LONGER side wins "
         "— the best-documented judge artifact; a winrate far above "
         "50% means the reward signal is partly 'longer is better'. "
         "Pairs are adjacent docs, winner by the portable-hash coin "
         "(so the fixture truth is ~50% and the gate must NOT fire); "
         "the bias verdict is the integer inequality 20*wins >= "
         "11*battles (> 55%). One join + one-row aggregate")
def eval_length_bias_audit(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    docs = tbl(spark, sf_dir, "documents")
    pa = (docs.filter(F.col("doc_id") % 2 == 0)
          .select(F.col("doc_id").alias("a"),
                  (F.col("doc_id") + 1).alias("bid"),
                  F.col("n_chars").alias("ca")))
    d2 = docs.select(F.col("doc_id").alias("bid"),
                     F.col("n_chars").alias("cb"))
    battles = (pa.join(d2, "bid")
               .filter(F.col("ca") != F.col("cb"))
               .select("a", "ca", "cb",
                       (portable_bucket(F.col("a")) % 2 == 0)
                       .alias("a_wins")))
    lw = F.sum((F.col("a_wins") == (F.col("ca") > F.col("cb")))
               .cast("int"))
    return battles.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_battles"),
        lw.cast("bigint").alias("longer_wins"),
        F.expr("sum(cast((a_wins = (ca > cb)) as int)) * 1000000 "
               "div count(1)").cast("bigint").alias("win_ppm"),
        (20 * lw >= 11 * F.count(F.lit(1))).alias("biased"))


# ---------------------------------------------------------------------------
# G. Pipeline-ops audits: permutations, compaction, anomaly, ESS,
#    valve recall, preference cycles, corpus drift
# ---------------------------------------------------------------------------

@register(
    "eval_pref_cycle_rate",
    oracle="""
    WITH b AS (SELECT doc_id,
                      'm' || CAST(doc_id % 8 AS VARCHAR) AS ma,
                      'm' || CAST((doc_id // 8) % 8 AS VARCHAR) AS mb,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 8)) AS BIGINT) % 2 = 0
                          AS a_wins
               FROM documents WHERE doc_id % 8 <> (doc_id // 8) % 8),
    n AS (SELECT least(ma, mb) AS i, greatest(ma, mb) AS j,
                 CASE WHEN a_wins = (ma = least(ma, mb))
                      THEN 1 ELSE 0 END AS wi
          FROM b),
    s AS (SELECT i, j, count(*) AS n, sum(wi) AS wi FROM n
          GROUP BY 1, 2),
    edg AS (SELECT i, j,
                   CASE WHEN 2 * wi > n THEN 1
                        WHEN 2 * wi < n THEN 0 END AS i_beats_j
            FROM s WHERE 2 * wi <> n),
    tri AS (SELECT ab.i AS a, ab.j AS b, bc.j AS c,
                   ab.i_beats_j AS dab, bc.i_beats_j AS dbc,
                   ac.i_beats_j AS dac
            FROM edg ab
            JOIN edg bc ON bc.i = ab.j
            JOIN edg ac ON ac.i = ab.i AND ac.j = bc.j)
    SELECT CAST(count(*) AS BIGINT) AS n_triads,
           CAST(sum(CASE WHEN (dab = 1 AND dbc = 1 AND dac = 0)
                           OR (dab = 0 AND dbc = 0 AND dac = 1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_cyclic,
           CAST(sum(CASE WHEN (dab = 1 AND dbc = 1 AND dac = 0)
                           OR (dab = 0 AND dbc = 0 AND dac = 1)
                         THEN 1 ELSE 0 END) * 1000000 // count(*)
                AS BIGINT) AS cyc_ppm
    FROM tri
    """,
    note="preference-transitivity audit: majority edges over 8 models "
         "(ties excluded), every ordered triad a<b<c checked for a "
         "cycle (a>b>c>a or its reverse) — a high cycle rate means "
         "the pairwise preference data cannot be explained by any "
         "scalar strength (Bradley-Terry will underfit) and usually "
         "flags judge noise or prompt-dependent preferences. The "
         "battle table is the only corpus-scale side; edges/triads "
         "are |models choose 2| / |models choose 3| rows — "
         "broadcast-sized at any corpus scale")
def eval_pref_cycle_rate(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    docs = tbl(spark, sf_dir, "documents")
    b = (docs.select(
            "doc_id",
            F.concat(F.lit("m"), (F.col("doc_id") % 8).cast("string"))
            .alias("ma"),
            F.concat(F.lit("m"),
                     (F.expr("doc_id div 8") % 8).cast("string"))
            .alias("mb"),
            (portable_bucket(F.col("doc_id")) % 2 == 0).alias("a_wins"))
         .filter(F.col("ma") != F.col("mb")))
    n = b.select(
        F.least("ma", "mb").alias("i"),
        F.greatest("ma", "mb").alias("j"),
        (F.col("a_wins") == (F.col("ma") == F.least("ma", "mb")))
        .cast("int").alias("wi"))
    s = n.groupBy("i", "j").agg(F.count(F.lit(1)).alias("n"),
                                F.sum("wi").alias("wi"))
    edg = (s.filter(2 * F.col("wi") != F.col("n"))
           .select("i", "j",
                   F.when(2 * F.col("wi") > F.col("n"), 1)
                   .otherwise(0).alias("i_beats_j")))
    ab = edg.select(F.col("i").alias("a"), F.col("j").alias("b"),
                    F.col("i_beats_j").alias("dab"))
    bc = edg.select(F.col("i").alias("b"), F.col("j").alias("c"),
                    F.col("i_beats_j").alias("dbc"))
    ac = edg.select(F.col("i").alias("a"), F.col("j").alias("c"),
                    F.col("i_beats_j").alias("dac"))
    tri = (ab.join(F.broadcast(bc), "b")
           .join(F.broadcast(ac), ["a", "c"]))
    cyc = (((F.col("dab") == 1) & (F.col("dbc") == 1)
            & (F.col("dac") == 0))
           | ((F.col("dab") == 0) & (F.col("dbc") == 0)
              & (F.col("dac") == 1))).cast("int")
    return tri.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triads"),
        F.sum(cyc).cast("bigint").alias("n_cyclic"),
        F.expr("sum(cast(((dab = 1 and dbc = 1 and dac = 0) or "
               "(dab = 0 and dbc = 0 and dac = 1)) as int)) * 1000000 "
               "div count(1)").cast("bigint").alias("cyc_ppm"))


@register(
    "shard_epoch_permutation",
    oracle="""
    WITH ep AS (SELECT CAST(unnest([1, 2, 3]) AS INT) AS epoch),
    pos AS (SELECT e.epoch, d.doc_id,
                   CAST(('0x' || substr(md5(CAST(e.epoch AS VARCHAR)
                         || ':' || CAST(d.doc_id AS VARCHAR)), 1, 12))
                        AS BIGINT) AS pos
            FROM documents d CROSS JOIN ep e),
    buck AS (SELECT epoch, pos % 16 AS b, count(*) AS c
             FROM pos GROUP BY 1, 2),
    uni AS (SELECT epoch, CAST(max(c) AS BIGINT) AS max_bucket,
                   CAST(min(c) AS BIGINT) AS min_bucket
            FROM buck GROUP BY 1),
    adj AS (SELECT p1.epoch,
                   sum(CASE WHEN p1.pos < p2.pos THEN 1 ELSE 0 END)
                       AS conc,
                   count(*) AS np
            FROM pos p1 JOIN pos p2
              ON p2.epoch = p1.epoch AND p2.doc_id = p1.doc_id + 1
            GROUP BY 1)
    SELECT u.epoch,
           CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
           u.max_bucket, u.min_bucket,
           CAST(a.conc * 1000000 // a.np AS BIGINT)
               AS concord_natural_ppm
    FROM uni u JOIN adj a USING (epoch)
    """,
    note="data-loader epoch-permutation audit: each epoch orders the "
         "corpus by a keyed hash (portable md5 of epoch:key — the "
         "shuffle_shards convention per epoch); the audit checks the "
         "permutation is (a) balanced — max/min of 16 position "
         "buckets — and (b) actually a re-shuffle: the fraction of "
         "adjacent natural-order pairs that stay ordered should sit "
         "near 50% ppm, not 100% (a broken epoch seed that reuses "
         "the natural order shows up here immediately). One scan per "
         "epoch, aggregates only; the adjacency probe joins on "
         "(epoch, key+1) — hash-equi, no window")
def shard_epoch_permutation(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents").select("doc_id")
    ep = spark.range(1, 4).select(F.col("id").cast("int").alias("epoch"))
    key = F.concat(F.col("epoch").cast("string"), F.lit(":"),
                   F.col("doc_id").cast("string"))
    pos = (docs.crossJoin(F.broadcast(ep))
           .select("epoch", "doc_id",
                   F.conv(F.substring(F.md5(key), 1, 12), 16, 10)
                   .cast("bigint").alias("pos")))
    buck = (pos.groupBy("epoch", (F.col("pos") % 16).alias("b"))
            .agg(F.count(F.lit(1)).alias("c")))
    uni = (buck.groupBy("epoch")
           .agg(F.max("c").cast("bigint").alias("max_bucket"),
                F.min("c").cast("bigint").alias("min_bucket")))
    p2 = pos.select("epoch", (F.col("doc_id") - 1).alias("doc_id"),
                    F.col("pos").alias("pos2"))
    adj = (pos.join(p2, ["epoch", "doc_id"])
           .groupBy("epoch")
           .agg(F.sum((F.col("pos") < F.col("pos2")).cast("int"))
                .alias("conc"),
                F.count(F.lit(1)).alias("np")))
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (uni.join(adj, "epoch").crossJoin(F.broadcast(nd))
            .select("epoch", "n_docs", "max_bucket", "min_bucket",
                    F.expr("conc * 1000000 div np").cast("bigint")
                    .alias("concord_natural_ppm")))


@register(
    "lakehouse_compaction_plan",
    oracle="""
    WITH fl AS (SELECT source, doc_id // 50 AS fid,
                       CAST(count(*) AS BIGINT) AS n_rows,
                       CAST(sum(n_chars) AS BIGINT) AS bytes
                FROM documents GROUP BY 1, 2),
    pre AS (SELECT source, fid, n_rows, bytes,
                   sum(bytes) OVER (PARTITION BY source ORDER BY fid)
                       - bytes AS prefix
            FROM fl)
    SELECT source, CAST(prefix // 16000 AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           CAST(sum(n_rows) AS BIGINT) AS total_rows,
           CAST(sum(bytes) * 1000000 // 16000 AS BIGINT) AS fill_ppm
    FROM pre GROUP BY 1, 2
    """,
    note="small-file compaction planning: per partition (source), "
         "adjacent files roll into merge jobs by start-offset binning "
         "— file goes to bin floor(prefix_bytes/target) — so every "
         "bin lands within one file of the 16 kB target (the "
         "fixture-scaled 128 MB) and files are never split. The "
         "window cumsum runs over per-FILE aggregate rows (bounded "
         "by file count, not data); this is the job list a nightly "
         "OPTIMIZE executes. Complements the existing compaction "
         "sink (operators/lakehouse.py) by making the plan itself "
         "driver-checkable")
def lakehouse_compaction_plan(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    fl = (docs.groupBy("source",
                       F.expr("doc_id div 50").alias("fid"))
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
               F.sum("n_chars").cast("bigint").alias("bytes")))
    w = (Window.partitionBy("source").orderBy("fid")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = fl.withColumn("prefix",
                        F.sum("bytes").over(w) - F.col("bytes"))
    return (pre.groupBy("source",
                        F.expr("prefix div 16000").cast("bigint")
                        .alias("bin"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_files"),
                 F.sum("bytes").cast("bigint").alias("total_bytes"),
                 F.sum("n_rows").cast("bigint").alias("total_rows"),
                 F.expr("sum(bytes) * 1000000 div 16000")
                 .cast("bigint").alias("fill_ppm")))


@register(
    "ingest_volume_anomaly",
    oracle="""
    WITH per AS (SELECT source, CAST(doc_id % 5 AS INT) AS snap,
                        CAST(count(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY 1, 2),
    tot AS (SELECT source, sum(n_docs) AS t FROM per GROUP BY 1)
    SELECT p.source, p.snap, p.n_docs,
           abs(5 * p.n_docs - t.t) * 10 >= 3 * t.t AS anomaly
    FROM per p JOIN tot t USING (source)
    """,
    note="crawl-volume anomaly detection: per (source, crawl) doc "
         "counts vs the source's own 5-crawl mean; a crawl deviating "
         ">= 30% from the mean flags (a collapsed fetch, a spam "
         "burst, a robots change). The test multiplies through — "
         "|5n - total| * 10 >= 3 * total — pure integers, no float "
         "mean. Two aggregates; output is |source x 5| rows")
def ingest_volume_anomaly(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    per = (docs.groupBy("source",
                        (F.col("doc_id") % 5).cast("int").alias("snap"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")))
    tot = per.groupBy("source").agg(F.sum("n_docs").alias("t"))
    return (per.join(F.broadcast(tot), "source")
            .select("source", "snap", "n_docs",
                    (F.abs(5 * F.col("n_docs") - F.col("t")) * 10
                     >= 3 * F.col("t")).alias("anomaly")))


@register(
    "sample_importance_ess",
    oracle="""
    WITH w AS (SELECT source, n_chars % 97 + 1 AS w,
                      least(n_chars % 97 + 1, 50) AS wt
               FROM documents)
    SELECT source, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(w) * sum(w) * 1000000
                // (sum(w * w) * count(*)) AS BIGINT) AS ess_ppm,
           CAST(sum(wt) * sum(wt) * 1000000
                // (sum(wt * wt) * count(*)) AS BIGINT)
               AS ess_trunc_ppm
    FROM w GROUP BY source
    """,
    note="effective-sample-size audit for importance-weighted "
         "selection (the DSIR/weighted-sample downstream check): per "
         "domain, ESS = (sum w)^2 / sum w^2 as a fraction of n, raw "
         "vs truncated-at-50 weights — weight truncation is the "
         "standard variance/bias trade and this table shows exactly "
         "how much ESS it buys per domain. Kept entirely in integer "
         "arithmetic (ppm with multiplied-through division) — "
         "engine-exact. One aggregation pass")
def sample_importance_ess(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    w = (F.col("n_chars") % 97 + 1).cast("long")
    wt = F.least(w, F.lit(50).cast("long"))
    return (docs.select("source", w.alias("w"), wt.alias("wt"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.expr("sum(w) * sum(w) * 1000000 "
                        "div (sum(w * w) * count(1))").cast("bigint")
                 .alias("ess_ppm"),
                 F.expr("sum(wt) * sum(wt) * 1000000 "
                        "div (sum(wt * wt) * count(1))").cast("bigint")
                 .alias("ess_trunc_ppm")))


@register(
    "corpus_self_bleu_panel",
    oracle="""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents WHERE doc_id < 60),
    g AS (SELECT DISTINCT doc_id,
                 w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] AS g2
          FROM (SELECT doc_id, w,
                       unnest(generate_series(1, len(w) - 1)) AS i
                FROM tk) t),
    sz AS (SELECT doc_id, count(*) AS ga FROM g GROUP BY 1),
    xs AS (SELECT a.doc_id, count(*) AS tot_inter
           FROM g a JOIN g b
             ON b.g2 = a.g2 AND b.doc_id <> a.doc_id
           GROUP BY 1),
    np AS (SELECT count(*) AS n FROM sz)
    SELECT s.doc_id, CAST(s.ga AS INT) AS n_bigrams,
           round(coalesce(x.tot_inter, 0) * 1.0
                 / ((np.n - 1) * s.ga), 9) AS self_bleu2
    FROM sz s LEFT JOIN xs x ON x.doc_id = s.doc_id CROSS JOIN np
    """,
    note="self-BLEU diversity panel (Zhu et al. 2018's texygen "
         "metric, distinct-bigram precision form): on a bounded "
         "60-doc panel, each doc's mean bigram precision against "
         "every other doc — high self-BLEU = a mode-collapsed or "
         "template-heavy corpus sample. The per-doc mean is computed "
         "as ONE integer sum of intersections divided once by "
         "(n-1)*|G(doc)| — no per-pair float accumulation, so the "
         "result is engine-exact at 9dp. Panel-bounded; the corpus "
         "never self-joins")
def corpus_self_bleu_panel(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    grams = F.expr(
        "transform(sequence(1, size(__w) - 1), "
        "i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))")
    g = (docs.select("doc_id", F.split("text", " ").alias("__w"))
         .select("doc_id", F.explode(grams).alias("g2"))
         .distinct())
    sz = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ga"))
    a, b = g.alias("a"), g.alias("b")
    xs = (a.join(b, (F.col("b.g2") == F.col("a.g2"))
                 & (F.col("b.doc_id") != F.col("a.doc_id")))
          .groupBy(F.col("a.doc_id").alias("doc_id"))
          .agg(F.count(F.lit(1)).alias("tot_inter")))
    np_ = sz.agg(F.count(F.lit(1)).alias("n"))
    return (sz.join(xs, "doc_id", "left")
            .crossJoin(F.broadcast(np_))
            .select("doc_id", F.col("ga").cast("int").alias("n_bigrams"),
                    F.round(F.coalesce("tot_inter", F.lit(0))
                            / ((F.col("n") - 1) * F.col("ga")), 9)
                    .alias("self_bleu2")))


@register(
    "text_js_divergence_snapshots",
    oracle="""
    WITH ot AS (SELECT unnest(string_split(text, ' ')) AS w
                FROM documents WHERE doc_id % 3 != 0),
    nt AS (SELECT unnest(string_split(text, ' ')) AS w
           FROM documents WHERE doc_id % 3 = 0),
    oc AS (SELECT w, count(*) AS c FROM ot GROUP BY 1),
    nc AS (SELECT w, count(*) AS c FROM nt GROUP BY 1),
    tot AS (SELECT (SELECT sum(c) FROM oc) AS no,
                   (SELECT sum(c) FROM nc) AS nn),
    u AS (SELECT coalesce(o.w, n.w) AS w,
                 coalesce(o.c, 0) AS co, coalesce(n.c, 0) AS cn
          FROM oc o FULL OUTER JOIN nc n ON n.w = o.w),
    terms AS (
        SELECT w,
            CAST(CASE WHEN co > 0 THEN
                 0.5 * (co * 1.0 / no)
                 * ln((co * 1.0 / no)
                      / (0.5 * (co * 1.0 / no) + 0.5 * (cn * 1.0 / nn)))
                 ELSE 0 END AS DECIMAL(28,12)) AS tp,
            CAST(CASE WHEN cn > 0 THEN
                 0.5 * (cn * 1.0 / nn)
                 * ln((cn * 1.0 / nn)
                      / (0.5 * (co * 1.0 / no) + 0.5 * (cn * 1.0 / nn)))
                 ELSE 0 END AS DECIMAL(28,12)) AS tq
        FROM u CROSS JOIN tot)
    SELECT CAST((SELECT count(*) FROM oc) AS BIGINT) AS n_vocab_old,
           CAST((SELECT count(*) FROM nc) AS BIGINT) AS n_vocab_new,
           round(CAST(sum(tp) + sum(tq) AS DOUBLE), 9) AS jsd_nats
    FROM terms
    """,
    note="vocabulary Jensen-Shannon divergence between crawl "
         "snapshots — the drift alarm between two ingests (a "
         "distribution shift in the unigram mix means the new crawl "
         "is not the corpus the mixture weights were tuned on; the "
         "domain twin is mix_domain_kl_divergence). Per-word JSD "
         "terms are computed in double then DECIMAL-summed "
         "(accumulation-order-free, the ccnet convention); zero-count "
         "sides contribute exactly 0. Two token scans, one full-outer "
         "vocab join — vocab-bounded, never doc-pairwise")
def text_js_divergence_snapshots(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    ot = (docs.filter(F.col("doc_id") % 3 != 0)
          .select(F.explode(F.split("text", " ")).alias("w")))
    nt = (docs.filter(F.col("doc_id") % 3 == 0)
          .select(F.explode(F.split("text", " ")).alias("w")))
    oc = ot.groupBy("w").agg(F.count(F.lit(1)).alias("co"))
    nc = nt.groupBy("w").agg(F.count(F.lit(1)).alias("cn"))
    tot = (oc.agg(F.sum("co").alias("no"))
           .crossJoin(nc.agg(F.sum("cn").alias("nn"))))
    u = (oc.join(nc, "w", "full_outer")
         .select(F.coalesce("co", F.lit(0)).alias("co"),
                 F.coalesce("cn", F.lit(0)).alias("cn"))
         .crossJoin(F.broadcast(tot)))
    p = F.col("co") / F.col("no")
    q = F.col("cn") / F.col("nn")
    m = 0.5 * p + 0.5 * q
    tp = F.when(F.col("co") > 0, 0.5 * p * F.log(p / m)) \
          .otherwise(0.0).cast("decimal(28,12)")
    tq = F.when(F.col("cn") > 0, 0.5 * q * F.log(q / m)) \
          .otherwise(0.0).cast("decimal(28,12)")
    vo = oc.agg(F.count(F.lit(1)).cast("bigint").alias("n_vocab_old"))
    vn = nc.agg(F.count(F.lit(1)).cast("bigint").alias("n_vocab_new"))
    return (u.select(tp.alias("tp"), tq.alias("tq"))
            .agg(F.round((F.sum("tp") + F.sum("tq")).cast("double"), 9)
                 .alias("jsd_nats"))
            .crossJoin(F.broadcast(vo)).crossJoin(F.broadcast(vn))
            .select("n_vocab_old", "n_vocab_new", "jsd_nats"))


# ---------------------------------------------------------------------------
# H. Remaining r11 audits: valve recall, quantization recall, semantic
#    decontam, centroid drift, langid margin, mojibake scan, Wilson CI
# ---------------------------------------------------------------------------

_BOILER = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
           "omega one two three four five six seven eight nine ten "
           "eleven twelve thirteen fourteen fifteen sixteen seventeen "
           "eighteen nineteen twenty")  # 44 words, fixed

_PLANTED_SQL = f"""
        SELECT doc_id,
               '{_BOILER} za' || CAST(doc_id AS VARCHAR)
               || ' zb' || CAST(doc_id AS VARCHAR)
               || ' zc' || CAST(doc_id AS VARCHAR) AS text
        FROM documents WHERE doc_id < 400 AND doc_id % 8 = 0
"""


@register(
    "dedup_star_valve_recall_audit",
    oracle=f"""
    WITH pl AS ({_PLANTED_SQL}),
    tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM pl),
    sh AS (SELECT DISTINCT doc_id,
                  w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)]
                  || ' ' || w[CAST(i+2 AS INT)] AS shingle
           FROM (SELECT doc_id, w,
                        unnest(generate_series(1, len(w) - 2)) AS i
                 FROM tk) t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    tr AS (SELECT count(*) AS n_true FROM (
           SELECT a.doc_id, b.doc_id
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           JOIN sizes sa ON sa.doc_id = a.doc_id
           JOIN sizes sb ON sb.doc_id = b.doc_id
           GROUP BY a.doc_id, b.doc_id, sa.n_sh, sb.n_sh
           HAVING CAST(count(*) AS DOUBLE)
                  / (sa.n_sh + sb.n_sh - count(*)) >= 0.5) q)
    SELECT CAST((SELECT count(*) FROM pl) AS BIGINT) AS n_planted,
           CAST(tr.n_true AS BIGINT) AS n_true,
           true AS star_engaged, true AS components_equal,
           true AS single_cluster
    FROM tr
    """,
    note="the max_bucket star valve's recall contract, driver-stamped "
         "(VERDICT r10 ask #3 as a catalog entry): a planted "
         "degenerate bucket — 50 docs sharing a 44-word boilerplate "
         "core with 3-word unique tails, pairwise j = 0.875 — runs "
         "through the REAL composed pairer twice (max_bucket=25 vs "
         "None; the production default 1000 exceeds fixture scale, "
         "so the audit parameterizes it down to exercise the same "
         "code path). Checks, each computed not asserted: the valve "
         "engaged (fewer verified pairs than the m(m-1)/2 truth), "
         "connected components are IDENTICAL with and without the "
         "valve, and the planted cluster stays one component — the "
         "dedup-level recall statement: star collapse loses PAIRS "
         "(the m^2 explosion is the point) but loses no CLUSTER on "
         "uniform near-dup buckets. The mixed-bucket worst case is "
         "measured separately in tests/test_curation2.py and "
         "SCALE.md r11")
def dedup_star_valve_recall_audit(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dedup import (
        connected_components, minhash_lsh_dedup_pairs)
    docs = tbl(spark, sf_dir, "documents")
    tail = F.col("doc_id").cast("string")
    planted = (docs.filter((F.col("doc_id") < 400)
                           & (F.col("doc_id") % 8 == 0))
               .select("doc_id",
                       F.concat(F.lit(_BOILER + " za"), tail,
                                F.lit(" zb"), tail, F.lit(" zc"), tail)
                       .alias("text")))
    pv = minhash_lsh_dedup_pairs(planted, "text", "doc_id",
                                 min_jaccard=0.5, max_bucket=25)
    pn = minhash_lsh_dedup_pairs(planted, "text", "doc_id",
                                 min_jaccard=0.5, max_bucket=None)
    cv = (connected_components(pv).select("comp").distinct()
          .agg(F.count(F.lit(1)).alias("ncv")))
    cn = (connected_components(pn).select("comp").distinct()
          .agg(F.count(F.lit(1)).alias("ncn")))
    np_ = planted.agg(F.count(F.lit(1)).cast("bigint")
                      .alias("n_planted"))
    nv = pv.agg(F.count(F.lit(1)).alias("n_found_v"))
    nt = pn.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
    return (np_.crossJoin(nt).crossJoin(nv)
            .crossJoin(cv).crossJoin(cn)
            .select("n_planted", "n_true",
                    (F.col("n_found_v") < F.col("n_true"))
                    .alias("star_engaged"),
                    (F.col("ncv") == F.col("ncn"))
                    .alias("components_equal"),
                    (F.col("ncv") == 1).alias("single_cluster")))


@register(
    "embedding_quantization_recall",
    oracle="""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 300),
    q AS (SELECT vec_id, v FROM c WHERE vec_id < 20),
    mm AS (SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
           FROM c, unnest(generate_series(1, 64)) t(i) GROUP BY 1),
    pk AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i)
               AS mxs FROM mm),
    dq AS (SELECT vec_id,
                  [CASE WHEN mxs[i] <> mns[i] THEN
                       round((v[i] - mns[i]) * 254.0
                             / (mxs[i] - mns[i]))
                       * (mxs[i] - mns[i]) / 254.0 + mns[i]
                   ELSE mns[i] END
                   FOR i IN generate_series(1, 64)] AS vq
           FROM c, pk),
    ex AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                      list_dot_product(q.v, c.v)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.v, c.v))) DESC,
                      c.vec_id) AS rn
           FROM q CROSS JOIN c),
    ap AS (SELECT q.vec_id AS qid, d.vec_id AS cid,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                      list_dot_product(q.v, d.vq)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(d.vq, d.vq))) DESC,
                      d.vec_id) AS rn
           FROM q CROSS JOIN dq d)
    SELECT e.qid, CAST(count(a.cid) AS INT) AS overlap10
    FROM (SELECT qid, cid FROM ex WHERE rn <= 10) e
    LEFT JOIN (SELECT qid, cid FROM ap WHERE rn <= 10) a
      ON a.qid = e.qid AND a.cid = e.cid
    GROUP BY e.qid
    """,
    note="int8-quantization retrieval-fidelity audit: per query on a "
         "fixed 20x300 panel, the overlap between exact-cosine top-10 "
         "and ADC top-10 (float query against the DEQUANTIZED int8 "
         "corpus — the asymmetric-distance serve path "
         "vector_quantize_int8 feeds). The table that decides whether "
         "4x shuffle compression is free or costs recall. Quantize "
         "arithmetic is the identical double sequence on both engines "
         "(the q_llm convention); per-query selection rides "
         "salted_topk — no corpus-sized rank window even though the "
         "panel is bounded")
def embedding_quantization_recall(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, cosine, salted_topk)
    emb = tbl(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    c = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    qs = c.filter(F.col("vec_id") < 20) \
          .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    stats = (c.select(F.posexplode("v").alias("__i", "__x"))
             .groupBy("__i")
             .agg(F.min("__x").alias("mn"), F.max("__x").alias("mx")))
    packed = stats.agg(
        F.array_sort(F.collect_list(F.struct("__i", "mn", "mx")))
        .alias("__s"))
    mns = F.transform(F.col("__s"), lambda s: s["mn"])
    mxs = F.transform(F.col("__s"), lambda s: s["mx"])
    vq = F.zip_with(
        F.col("v"), F.arrays_zip(mns, mxs),
        lambda x, mm: F.when(
            mm["1"] != mm["0"],
            F.round((x - mm["0"]) * F.lit(254.0) / (mm["1"] - mm["0"]))
            * (mm["1"] - mm["0"]) / F.lit(254.0) + mm["0"]
        ).otherwise(mm["0"]))
    dq = (c.crossJoin(F.broadcast(packed))
          .select("vec_id", vq.alias("vq")))
    ex = (qs.crossJoin(F.broadcast(c))
          .select("qid", F.col("vec_id").alias("cid"),
                  cosine(F.col("qv"), F.col("v")).alias("s")))
    ap = (qs.crossJoin(F.broadcast(dq))
          .select("qid", F.col("vec_id").alias("cid"),
                  cosine(F.col("qv"), F.col("vq")).alias("s")))
    top_ex = salted_topk(ex, "qid", [F.col("s").desc(), F.col("cid")],
                         "cid", k=10).select("qid", "cid")
    top_ap = (salted_topk(ap, "qid", [F.col("s").desc(), F.col("cid")],
                          "cid", k=10).select("qid", "cid")
              .withColumn("__hit", F.lit(1)))
    return (top_ex.join(top_ap, ["qid", "cid"], "left")
            .groupBy("qid")
            .agg(F.sum(F.coalesce("__hit", F.lit(0))).cast("int")
                 .alias("overlap10")))


@register(
    "decontam_embedding_sim",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    b AS (SELECT vec_id, v FROM e WHERE vec_id < 20),
    c AS (SELECT vec_id, v FROM e WHERE vec_id >= 20),
    p AS (SELECT b.vec_id AS bench_id, c.vec_id AS cid,
                 list_dot_product(b.v, c.v)
                 / (sqrt(list_dot_product(b.v, b.v))
                    * sqrt(list_dot_product(c.v, c.v))) AS s
          FROM b CROSS JOIN c)
    SELECT bench_id,
           CAST(sum(CASE WHEN s >= 0.40 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
           round(max(s), 9) AS top_sim
    FROM p GROUP BY bench_id
    """,
    note="semantic decontamination: the n-gram decontam twins "
         "(decontam_token_fraction etc.) miss paraphrased benchmark "
         "leakage; this sweeps a FIXED benchmark embedding panel "
         "against the corpus embeddings and counts cosine >= 0.40 "
         "hits per benchmark item. The bench side broadcasts (bounded "
         "registry at any scale); the corpus side is one map-side "
         "scored scan + per-bench aggregate — linear, no corpus "
         "self-join. top_sim answers 'how close did the nearest "
         "paraphrase get' even when nothing crosses the threshold")
def decontam_embedding_sim(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, cosine)
    emb = tbl(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    b = (e.filter(F.col("vec_id") < 20)
         .select(F.col("vec_id").alias("bench_id"),
                 F.col("v").alias("bv")))
    c = e.filter(F.col("vec_id") >= 20)
    p = (c.crossJoin(F.broadcast(b))
         .select("bench_id", cosine(F.col("bv"), F.col("v")).alias("s")))
    return (p.groupBy("bench_id")
            .agg(F.sum((F.col("s") >= 0.40).cast("int")).cast("bigint")
                 .alias("n_flagged"),
                 F.round(F.max("s"), 9).alias("top_sim")))


@register(
    "embedding_domain_centroid_drift",
    oracle="""
    WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    pl AS (SELECT label, i, round(sum(v[i]) / count(*), 9) AS m
           FROM e, unnest(generate_series(1, 64)) t(i) GROUP BY 1, 2),
    gl AS (SELECT i, round(sum(v[i]) / count(*), 9) AS g
           FROM e, unnest(generate_series(1, 64)) t(i) GROUP BY 1),
    n AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM e
          GROUP BY 1),
    dots AS (SELECT p.label,
                    CAST(sum(CAST(p.m * g.g AS DECIMAL(28,12)))
                         AS DOUBLE) AS dg,
                    CAST(sum(CAST(p.m * p.m AS DECIMAL(28,12)))
                         AS DOUBLE) AS dl,
                    CAST(sum(CAST(g.g * g.g AS DECIMAL(28,12)))
                         AS DOUBLE) AS gg
             FROM pl p JOIN gl g USING (i) GROUP BY 1)
    SELECT d.label, n.n,
           round(d.dg / (sqrt(d.dl) * sqrt(d.gg)), 9)
               AS cos_to_global
    FROM dots d JOIN n USING (label)
    """,
    note="per-domain embedding centroid drift: each label's mean "
         "vector vs the global centroid, as cosine — a domain whose "
         "centroid swings away between snapshots signals upstream "
         "encoder or content drift before any downstream metric "
         "moves. Per-dim means are 9dp-rounded BEFORE the cosine so "
         "the second stage is exact DECIMAL arithmetic on identical "
         "inputs (the covariance/pca two-stage convention); the only "
         "corpus-scale shuffle is the (label, dim) partial-combined "
         "sum — centroids are |labels| x 64 rows forever")
def embedding_domain_centroid_drift(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import _as_double
    emb = tbl(spark, sf_dir, "embeddings")
    e = emb.select("label", _as_double(F.col("embedding")).alias("v"))
    ex = e.select("label", F.posexplode("v").alias("i", "x"))
    pl = (ex.groupBy("label", "i")
          .agg(F.round(F.sum("x") / F.count(F.lit(1)), 9).alias("m")))
    gl = (ex.groupBy("i")
          .agg(F.round(F.sum("x") / F.count(F.lit(1)), 9).alias("g")))
    n = e.groupBy("label").agg(F.count(F.lit(1)).cast("bigint")
                               .alias("n"))
    dots = (pl.join(F.broadcast(gl), "i")
            .groupBy("label")
            .agg(F.sum((F.col("m") * F.col("g"))
                       .cast("decimal(28,12)")).cast("double")
                 .alias("dg"),
                 F.sum((F.col("m") * F.col("m"))
                       .cast("decimal(28,12)")).cast("double")
                 .alias("dl"),
                 F.sum((F.col("g") * F.col("g"))
                       .cast("decimal(28,12)")).cast("double")
                 .alias("gg")))
    return (dots.join(F.broadcast(n), "label")
            .select("label", "n",
                    F.round(F.col("dg")
                            / (F.sqrt("dl") * F.sqrt("gg")), 9)
                    .alias("cos_to_global")))


@register(
    "text_lang_confidence_margin",
    oracle="""
    WITH s AS (
        SELECT doc_id,
            CAST(len(list_filter(string_split(text,' '), w -> w IN
                ('the','and','of','to','a','in','is'))) AS INT) AS s_en,
            CAST(len(list_filter(string_split(text,' '), w -> w IN
                ('der','die','das','und','ist','nicht'))) AS INT)
                AS s_de,
            CAST(len(list_filter(string_split(text,' '), w -> w IN
                ('el','la','de','los','y','que'))) AS INT) AS s_es,
            CAST(len(list_filter(string_split(text,' '), w -> w IN
                ('le','les','des','et','une','dans'))) AS INT) AS s_fr,
            CAST(len(list_filter(string_split(text,' '), w -> w IN
                ('de','shi','bu','le','wo'))) AS INT) AS s_zh
        FROM documents)
    SELECT doc_id,
           CASE WHEN s_zh > greatest(s_en, s_de, s_es, s_fr) THEN 'zh'
                WHEN s_fr > greatest(s_en, s_de, s_es) THEN 'fr'
                WHEN s_es > greatest(s_en, s_de) THEN 'es'
                WHEN s_de > s_en THEN 'de'
                ELSE 'en' END AS pred_lang,
           greatest(s_en, s_de, s_es, s_fr, s_zh) AS top_score,
           greatest(s_en, s_de, s_es, s_fr, s_zh)
               - list_sort([s_en, s_de, s_es, s_fr, s_zh])[4]
               AS margin,
           greatest(s_en, s_de, s_es, s_fr, s_zh)
               - list_sort([s_en, s_de, s_es, s_fr, s_zh])[4] < 2
               AS low_conf
    FROM s
    """,
    note="language-ID confidence margin: the gap between the best and "
         "second-best stopword-profile scores (text_langid's scorer, "
         "same first-max-wins tie-break) — the margin is what a "
         "pipeline thresholds to route docs to 'confident' vs 'send "
         "to the expensive classifier' paths; pure integer "
         "arithmetic, map-only")
def text_lang_confidence_margin(spark, sf_dir):
    from mapreduce_wsi_spark.operators.text import LANG_STOPWORDS
    docs = tbl(spark, sf_dir, "documents")
    w = F.split("text", " ")
    scores = {lang: F.size(F.filter(w, lambda x: x.isin(*stops)))
              .cast("int")
              for lang, stops in LANG_STOPWORDS.items()}
    s = docs.select("doc_id",
                    *[c.alias(f"s_{lang}") for lang, c in scores.items()])
    cols = [F.col(f"s_{lang}") for lang in LANG_STOPWORDS]
    top = F.greatest(*cols)
    second = F.element_at(F.array_sort(F.array(*cols)),
                          len(LANG_STOPWORDS) - 1)
    pred = (F.when(F.col("s_zh") > F.greatest("s_en", "s_de", "s_es",
                                              "s_fr"), "zh")
            .when(F.col("s_fr") > F.greatest("s_en", "s_de", "s_es"),
                  "fr")
            .when(F.col("s_es") > F.greatest("s_en", "s_de"), "es")
            .when(F.col("s_de") > F.col("s_en"), "de")
            .otherwise("en"))
    return s.select("doc_id", pred.alias("pred_lang"),
                    top.alias("top_score"),
                    (top - second).alias("margin"),
                    (top - second < 2).alias("low_conf"))


@register(
    "dq_control_char_scan",
    oracle="""
    WITH d AS (SELECT doc_id, source,
                      text || CASE WHEN doc_id % 13 = 0
                                   THEN ' ' || chr(7) || chr(27)
                                        || chr(8) ELSE '' END AS tx
               FROM documents),
    m AS (SELECT doc_id, source,
                 CAST(length(tx) - length(regexp_replace(tx,
                      '[\\x00-\\x1f]', '', 'g')) AS INT) AS n_ctrl
          FROM d)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
           CAST(sum(n_ctrl) AS BIGINT) AS total_ctrl
    FROM m GROUP BY source
    """,
    note="control-character / mojibake scan (encoding corruption is "
         "the crawl-ingest defect PII and quality gates don't see): "
         "per source, docs carrying C0 control bytes and the total "
         "count — corruption synthesized deterministically on every "
         "13th doc (BEL/ESC/BS appended, same expression both "
         "engines). Counting is length-minus-stripped-length, one "
         "map-only regexp per doc")
def dq_control_char_scan(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    tx = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 13 == 0,
               F.concat(F.lit(" "), F.expr("char(7)"),
                        F.expr("char(27)"), F.expr("char(8)")))
        .otherwise(F.lit("")))
    n_ctrl = (F.length(tx)
              - F.length(F.regexp_replace(tx, "[\\x00-\\x1f]", ""))
              ).cast("int")
    return (docs.select("source", n_ctrl.alias("n_ctrl"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum((F.col("n_ctrl") > 0).cast("int")).cast("bigint")
                 .alias("n_flagged"),
                 F.sum("n_ctrl").cast("bigint").alias("total_ctrl")))


@register(
    "eval_winrate_wilson",
    oracle="""
    WITH b AS (SELECT doc_id,
                      'm' || CAST(doc_id % 3 AS VARCHAR) AS ma,
                      'm' || CAST((doc_id // 3) % 3 AS VARCHAR) AS mb,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 8)) AS BIGINT) % 2 = 0
                          AS a_wins
               FROM documents),
    n AS (SELECT least(ma, mb) AS model_i, greatest(ma, mb) AS model_j,
                 CASE WHEN a_wins = (ma = least(ma, mb)) THEN 1 ELSE 0
                 END AS win_i
          FROM b WHERE ma <> mb),
    s AS (SELECT model_i, model_j, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(win_i) AS BIGINT) AS wins_i
          FROM n GROUP BY 1, 2),
    w AS (SELECT model_i, model_j, n, wins_i,
                 wins_i * 1.0 / n AS p, 1.96 * 1.96 / n AS z2n
          FROM s)
    SELECT model_i, model_j, n, wins_i,
           round((p + z2n / 2
                  - 1.96 * sqrt(p * (1 - p) / n + z2n / (4 * n)))
                 / (1 + z2n), 9) AS wilson_lo,
           round((p + z2n / 2
                  + 1.96 * sqrt(p * (1 - p) / n + z2n / (4 * n)))
                 / (1 + z2n), 9) AS wilson_hi,
           (p + z2n / 2
            - 1.96 * sqrt(p * (1 - p) / n + z2n / (4 * n)))
           / (1 + z2n) > 0.5
           OR (p + z2n / 2
               + 1.96 * sqrt(p * (1 - p) / n + z2n / (4 * n)))
              / (1 + z2n) < 0.5 AS decisive
    FROM w
    """,
    note="Wilson 95% score interval on pairwise winrates — the "
         "interval the z-test twin (eval_pairwise_winrate) "
         "approximates badly near 0/1 or small n; 'decisive' = the "
         "interval excludes 0.5, the criterion arena leaderboards "
         "actually rank by. Same battle synthesis as the z-test "
         "entry so the two are directly comparable; one aggregate, "
         "|model pairs| output rows, closed-form per-row arithmetic")
def eval_winrate_wilson(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    docs = tbl(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id",
        F.concat(F.lit("m"), (F.col("doc_id") % 3).cast("string"))
        .alias("ma"),
        F.concat(F.lit("m"),
                 (F.expr("doc_id div 3") % 3).cast("string")).alias("mb"),
        (portable_bucket(F.col("doc_id")) % 2 == 0).alias("a_wins"))
    n = (b.filter(F.col("ma") != F.col("mb"))
         .select(F.least("ma", "mb").alias("model_i"),
                 F.greatest("ma", "mb").alias("model_j"),
                 (F.col("a_wins")
                  == (F.col("ma") == F.least("ma", "mb"))).cast("int")
                 .alias("win_i")))
    s = (n.groupBy("model_i", "model_j")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum("win_i").cast("bigint").alias("wins_i")))
    p = F.col("wins_i") * 1.0 / F.col("n")
    z2n = F.lit(1.96) * F.lit(1.96) / F.col("n")
    half = F.lit(1.96) * F.sqrt(p * (1 - p) / F.col("n")
                                + z2n / (4 * F.col("n")))
    lo = (p + z2n / 2 - half) / (1 + z2n)
    hi = (p + z2n / 2 + half) / (1 + z2n)
    return s.select("model_i", "model_j", "n", "wins_i",
                    F.round(lo, 9).alias("wilson_lo"),
                    F.round(hi, 9).alias("wilson_hi"),
                    ((lo > 0.5) | (hi < 0.5)).alias("decisive"))
