"""Round-12 catalog tranche: the COVERAGE.md r12 queue, implemented —
the whole-slide-image TIFF read surface driver-stamped (LZW/Deflate ×
predictor × byte order × strips/tiles, plus pyramid-page reads through
the IFD chain — VERDICT r11 missing #2), three-way snapshot chains for
NEAR-dup first-seen attribution (minhash clusters, not just exact
hashes), quality-distillation calibration (reliability buckets +
operating-point sweep), CDC chunk-size distribution audits, per-host
curriculum pacing (split_group_host × mix_token_budget_pacing), ANN
recall at varied n_probe with the IVF cell-balance health audit, plus
the n-gram-level crawl-novelty decay and epoch-repeat budgeting a
100 TB mixing run plans with.

Reference parity note: none of these exist in the reference
(acgessler/mapreduce-wsi) — its only analytics surface is
user-supplied map/reduce code behind runMapReduce (MapReduceWSI.java:
61-105). They are BASELINE.json north-star surface, built Spark-first
with DuckDB oracle twins like every other family.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_wsi_spark.plans.q_curation import _GOPHER_FLAGS_CTE
from mapreduce_wsi_spark.plans.q_curation2 import (
    _DISTILL_SCORE_CTE,
    _distill_parts,
)
from mapreduce_wsi_spark.plans.q_llm import _ASCII_DOCS_SQL, _ascii_docs
from mapreduce_wsi_spark.plans.registry import register, tbl

# ---------------------------------------------------------------------------
# A. Whole-slide-image TIFF surface (VERDICT r11 missing #2)
# ---------------------------------------------------------------------------

# Channel means over the full 4x4 RGB image synthesized from the doc's
# first 48 printable-ASCII bytes — identical to mm_decode_tiff's oracle:
# the container variant (compression/predictor/byte order/tiling) must
# never change decoded pixel values, so one oracle covers every rotation.
_TIFF_4X4_MEANS_ORACLE = f"""
    WITH p AS (SELECT doc_id, rpad(substr(text, 1, 48), 48, 'x') AS px
               FROM {_ASCII_DOCS_SQL} documents)
    SELECT doc_id, CAST(4 AS INT) AS img_w, CAST(4 AS INT) AS img_h,
           true AS ok,
           round(list_sum(list_transform(generate_series(0, 15),
                 j -> unicode(px[3*j + 1]))) / 16.0, 9) AS mean_r,
           round(list_sum(list_transform(generate_series(0, 15),
                 j -> unicode(px[3*j + 2]))) / 16.0, 9) AS mean_g,
           round(list_sum(list_transform(generate_series(0, 15),
                 j -> unicode(px[3*j + 3]))) / 16.0, 9) AS mean_b
    FROM p
    """


def _tiff_blobs(docs, encode_one):
    """Synthesize per-doc TIFF payloads on the workers: ``encode_one``
    maps (doc_id, 4x4x3 uint8 array) -> bytes. The 48 source bytes ride
    the (tiny) text rows; payloads are born in-plan and never shuffle
    (the mm_* invariant, tests/test_multimodal.py)."""
    import numpy as np
    import pandas as pd

    from mapreduce_wsi_spark.operators.multimodal import BLOB_SCHEMA

    padded = docs.select(
        "doc_id",
        F.encode(F.rpad(F.substring("text", 1, 48), 48, "x"), "UTF-8")
        .alias("raw"))

    def encode(batches):
        for pdf in batches:
            content = []
            for doc_id, b in zip(pdf["doc_id"], pdf["raw"]):
                img = (np.frombuffer(bytes(b), dtype=np.uint8)
                       .reshape(4, 4, 3))
                content.append(encode_one(int(doc_id), img))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "content": content,
                "mime": ["image/tiff"] * len(pdf),
                "n_bytes": pd.Series([len(c) for c in content],
                                     dtype="int32"),
            })

    return padded.mapInPandas(encode, BLOB_SCHEMA)


@register(
    "mm_decode_tiff_tiled",
    oracle=_TIFF_4X4_MEANS_ORACLE,
    note="the r11 TIFF decoder additions, driver-stamped (VERDICT r11 "
         "missing #2): 4x4 RGB images containerized in a 16-way "
         "ROTATING variant — byte order 'II'/'MM' (doc_id%2), "
         "compression TIFF-LZW vs Deflate ((doc_id//2)%2), Predictor "
         "1 vs 2 horizontal differencing ((doc_id//4)%2), and layout "
         "two-row STRIPS vs 3x2 TILES ((doc_id//8)%2 — §15, with "
         "right/bottom edge tiles zero-padded to full size and "
         "cropped on placement, the whole-slide-image geometry). One "
         "entry exercises _parse_tiff's LZW early-change decode, "
         "zlib strips, per-segment predictor undo and the tile "
         "reassembly loop under both endians; the oracle recomputes "
         "channel means from the source ASCII bytes, so any "
         "mis-decoded byte anywhere shifts a mean "
         "(operators/multimodal.py::_parse_tiff, encode_tiff)")
def mm_decode_tiff_tiled(spark, sf_dir):
    from mapreduce_wsi_spark.operators.multimodal import (
        decode_tiff_stats, encode_tiff)

    def encode_one(doc_id, img):
        endian = "<" if doc_id % 2 == 0 else ">"
        comp = 5 if (doc_id // 2) % 2 == 0 else 8
        pred = 1 if (doc_id // 4) % 2 == 0 else 2
        if (doc_id // 8) % 2:
            return encode_tiff(img, endian, comp, predictor=pred,
                               tile=(3, 2))
        return encode_tiff(img, endian, comp, predictor=pred,
                           rows_per_strip=2)

    blobs = _tiff_blobs(_ascii_docs(spark, sf_dir), encode_one)
    stats = decode_tiff_stats(blobs)
    return stats.select("doc_id", "img_w", "img_h", "ok",
                        F.round("mean_r", 9).alias("mean_r"),
                        F.round("mean_g", 9).alias("mean_g"),
                        F.round("mean_b", 9).alias("mean_b"))


@register(
    "mm_decode_tiff_pyramid",
    oracle=f"""
    WITH p AS (SELECT doc_id, rpad(substr(text, 1, 48), 48, 'x') AS px
               FROM {_ASCII_DOCS_SQL} documents)
    SELECT doc_id, CAST(2 AS INT) AS img_w, CAST(2 AS INT) AS img_h,
           true AS ok,
           round(list_sum(list_transform([0, 2, 8, 10],
                 j -> unicode(px[3*j + 1]))) / 4.0, 9) AS mean_r,
           round(list_sum(list_transform([0, 2, 8, 10],
                 j -> unicode(px[3*j + 2]))) / 4.0, 9) AS mean_g,
           round(list_sum(list_transform([0, 2, 8, 10],
                 j -> unicode(px[3*j + 3]))) / 4.0, 9) AS mean_b
    FROM p
    """,
    note="pyramidal (multi-page) TIFF read — the actual whole-slide-"
         "image layout: each doc's payload is a 2-level pyramid "
         "(level 0 = the 4x4 base, level 1 = its [::2, ::2] 2x2 "
         "reduction) written by encode_tiff_pyramid as chained IFDs, "
         "rotating byte order (doc_id%2), LZW vs Deflate "
         "((doc_id//2)%2), single-strip vs 2x2-TILED levels "
         "((doc_id//4)%2) and Predictor 1 vs 2 ((doc_id//8)%2 — the "
         "r13-queue residual: horizontal differencing exercised "
         "through the chained-IFD page walk, not just single-page). "
         "The query reads PAGE 1 via the IFD-chain "
         "walk (_parse_tiff(page=1) through decode_tiff_stats) — the "
         "read a WSI viewer issues for a zoomed-out level without "
         "touching base-resolution bytes. Oracle recomputes the "
         "level-1 channel means from the four source pixels the "
         "[::2, ::2] reduction keeps (flat indices 0/2/8/10)")
def mm_decode_tiff_pyramid(spark, sf_dir):
    from mapreduce_wsi_spark.operators.multimodal import (
        decode_tiff_stats, encode_tiff_pyramid)

    def encode_one(doc_id, img):
        endian = "<" if doc_id % 2 == 0 else ">"
        comp = 5 if (doc_id // 2) % 2 == 0 else 8
        tile = (2, 2) if (doc_id // 4) % 2 else None
        pred = 1 if (doc_id // 8) % 2 == 0 else 2
        return encode_tiff_pyramid([img, img[::2, ::2]], endian, comp,
                                   tile=tile, predictor=pred)

    blobs = _tiff_blobs(_ascii_docs(spark, sf_dir), encode_one)
    stats = decode_tiff_stats(blobs, page=1)
    return stats.select("doc_id", "img_w", "img_h", "ok",
                        F.round("mean_r", 9).alias("mean_r"),
                        F.round("mean_g", 9).alias("mean_g"),
                        F.round("mean_b", 9).alias("mean_b"))


@register(
    "mm_tiff_pyramid_meta",
    oracle=f"""
    SELECT doc_id,
           CAST(2 + doc_id % 2 AS INT) AS n_pages,
           CAST(4 AS INT) AS w0, CAST(4 AS INT) AS h0,
           CAST(2 AS INT) AS w1, CAST(2 AS INT) AS h1,
           CAST(doc_id % 2 AS INT) AS w2,
           CAST(doc_id % 2 AS INT) AS h2
    FROM {_ASCII_DOCS_SQL} documents
    """,
    note="pyramid-level inventory — the catalog read a WSI tile server "
         "does once per slide: walk the IFD chain (tiff_page_offsets), "
         "report page count and per-level dimensions WITHOUT decoding "
         "pixel data (each level's IFD is parsed, its segments are "
         "not). Pyramid DEPTH is data-dependent (odd doc_ids carry a "
         "third 1x1 level; even stop at 2), so the oracle's n_pages/"
         "w2/h2 are functions of the data — a chain walk that "
         "over-reads (follows a stale next-IFD pointer) or under-reads "
         "(drops the tail page) shifts values on half the corpus "
         "rather than tripping an assertion. Same rotating byte-order/"
         "codec/tiling variants as mm_decode_tiff_pyramid")
def mm_tiff_pyramid_meta(spark, sf_dir):
    import pandas as pd

    from mapreduce_wsi_spark.operators.multimodal import (
        _parse_tiff, encode_tiff_pyramid, tiff_page_offsets)

    def encode_one(doc_id, img):
        endian = "<" if doc_id % 2 == 0 else ">"
        comp = 5 if (doc_id // 2) % 2 == 0 else 8
        tile = (2, 2) if (doc_id // 4) % 2 else None
        levels = [img, img[::2, ::2]]
        if doc_id % 2:  # odd docs: full pyramid down to 1x1
            levels.append(img[::4, ::4])
        return encode_tiff_pyramid(levels, endian, comp, tile=tile)

    blobs = _tiff_blobs(_ascii_docs(spark, sf_dir), encode_one)

    def meta(batches):
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "n_pages",
                                    "w0", "h0", "w1", "h1",
                                    "w2", "h2")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(payload) if payload is not None else b""
                pages = tiff_page_offsets(b)
                rows["doc_id"].append(doc_id)
                rows["n_pages"].append(len(pages))
                for i in (0, 1, 2):
                    parsed = (_parse_tiff(b, page=i)
                              if i < len(pages) else None)
                    w, h = (parsed[0], parsed[1]) if parsed else (0, 0)
                    rows[f"w{i}"].append(w)
                    rows[f"h{i}"].append(h)
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(
        meta, "doc_id long, n_pages int, w0 int, h0 int, "
              "w1 int, h1 int, w2 int, h2 int")


# ---------------------------------------------------------------------------
# B. Three-way snapshot chains: NEAR-dup first-seen attribution (r12 queue)
# ---------------------------------------------------------------------------

# Exact word-3-gram Jaccard pair set at j >= 0.5 over the full corpus —
# the shared truth under both chain entries. The fixture's pair
# distribution is strictly bimodal (measured at sf0.01: 25 pairs at
# j >= 0.8, everything else < 0.1), so the 16-band/4-row LSH path's
# recall at the threshold is exactly 1 and the minhash pipelines
# hash-match this exact set (the dedup_minhash_lsh convention).
_J05_PAIRS_CTE = """
    tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)]
                  || ' ' || w[CAST(i+2 AS INT)] AS shingle
           FROM (SELECT doc_id, w,
                        unnest(generate_series(1, len(w) - 2)) AS i
                 FROM tk) t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS inter
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT doc_a, doc_b FROM inter
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE CAST(inter AS DOUBLE)
                    / (sa.n_sh + sb.n_sh - inter) >= 0.5)
"""


@register(
    "dedup_chain_minhash_first_seen",
    oracle=f"""
    WITH {_J05_PAIRS_CTE},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    matched AS (SELECT a AS doc_id, CAST(min(b % 3) AS INT) AS m
                FROM edges WHERE a % 3 > b % 3 GROUP BY 1),
    d AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS snap
          FROM documents)
    SELECT d.snap, coalesce(m.m, d.snap) AS first_seen,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM d LEFT JOIN matched m ON m.doc_id = d.doc_id
    GROUP BY 1, 2
    """,
    note="three-way snapshot chain, NEAR-dup first-seen attribution "
         "(r12 queue: dedup_snapshot_first_seen beyond exact hashes): "
         "crawls t0/t1/t2 = doc_id%3; MinHash signatures are built "
         "ONCE over the chain and sliced per leg (the reusable-"
         "standing-signature story made literal), t1 bands against "
         "t0 and t2 against t0+t1 (operators/curation.py::"
         "lsh_cross_candidates — bands BETWEEN snapshot sets only, "
         "never old x old), one candidates-only exact-Jaccard verify "
         "at j>=0.5 (integer-multiplied: 2*inter >= union), and "
         "each doc's first_seen is the EARLIEST crawl holding a "
         "near-dup of it (its own crawl when none). The (snap, "
         "first_seen) tally is the 'how much of crawl N is retreads "
         "of crawl M' capacity table, now at near-dup rather than "
         "byte-identical granularity. Oracle recomputes the exact "
         "j>=0.5 cross-pair attribution; the chain costs O(new + "
         "candidates) per step and standing signatures are reusable "
         "run-over-run")
def dedup_chain_minhash_first_seen(spark, sf_dir):
    # Signatures and shingles are built ONCE over the whole chain and
    # sliced per leg — the "standing signatures are reusable" claim
    # made literal (the incremental_minhash_pairs convenience would
    # rebuild snapshot-0's signatures for every later crawl). Both
    # banding legs feed ONE candidates-only exact-Jaccard verify.
    from mapreduce_wsi_spark.operators.curation import (
        lsh_cross_candidates)
    from mapreduce_wsi_spark.operators.dedup import (
        minhash_signatures, word_shingles)
    docs = tbl(spark, sf_dir, "documents")
    snap_of = lambda c: (F.col(c) % 3).cast("int")  # noqa: E731
    sig = minhash_signatures(docs, "text", "doc_id", n=3, k=64)
    leg1 = lsh_cross_candidates(sig.filter(F.col("id") % 3 == 1),
                                sig.filter(F.col("id") % 3 == 0),
                                bands=16, rows_per_band=4,
                                max_bucket=1000)
    leg2 = lsh_cross_candidates(sig.filter(F.col("id") % 3 == 2),
                                sig.filter(F.col("id") % 3 != 2),
                                bands=16, rows_per_band=4,
                                max_bucket=1000)
    cands = leg1.unionByName(leg2)  # disjoint by doc_new's snapshot
    sh = word_shingles(docs, "text", "doc_id", n=3)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (cands
             .join(sh.select(F.col("id").alias("doc_new"), "shingle"),
                   "doc_new")
             .join(sh.select(F.col("id").alias("doc_old"), "shingle"),
                   ["doc_old", "shingle"])
             .groupBy("doc_new", "doc_old")
             .agg(F.count(F.lit(1)).alias("inter")))
    pairs = (inter
             .join(sizes.select(F.col("id").alias("doc_new"),
                                F.col("n_sh").alias("n_a")), "doc_new")
             .join(sizes.select(F.col("id").alias("doc_old"),
                                F.col("n_sh").alias("n_b")), "doc_old")
             .filter(F.col("inter")
                     * 2 >= (F.col("n_a") + F.col("n_b")
                             - F.col("inter"))))  # j >= 0.5, integer
    matched = (pairs
               .select("doc_new", snap_of("doc_old").alias("os"))
               .groupBy("doc_new").agg(F.min("os").alias("m")))
    d = docs.select("doc_id", snap_of("doc_id").alias("snap"))
    return (d.join(matched, d.doc_id == matched.doc_new, "left")
            .groupBy("snap",
                     F.coalesce("m", "snap").alias("first_seen"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")))


@register(
    "dedup_chain_cluster_first_seen",
    oracle=f"""
    WITH RECURSIVE {_J05_PAIRS_CTE},
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach AS (
        SELECT DISTINCT src AS id, src AS r FROM edges
        UNION
        SELECT e.dst AS id, reach.r AS r
        FROM reach JOIN edges e ON e.src = reach.id),
    c AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
    SELECT comp, CAST(min(id % 3) AS INT) AS first_seen,
           CAST(count(DISTINCT id % 3) AS INT) AS n_snapshots,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM c GROUP BY comp
    """,
    note="cluster-level lineage over the same three-crawl chain: "
         "MinHash/LSH pairs at j>=0.5 (production valve defaults) -> "
         "connected components (the stamped star/label operators) -> "
         "per CLUSTER, which crawl introduced the content "
         "(first_seen), how many crawls carry a member, and the "
         "cluster size. This is the minhash-cluster form of "
         "dedup_snapshot_first_seen's per-hash table — the artifact a "
         "dedup-aware crawler keeps so a page edited across crawls "
         "still attributes to its original discovery. Oracle: "
         "recursive-CTE transitive closure over the exact j>=0.5 "
         "pair set (the dedup_components convention) aggregated to "
         "the same (comp, first_seen, n_snapshots, n_docs) rows")
def dedup_chain_cluster_first_seen(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dedup import (
        connected_components, minhash_lsh_dedup_pairs)
    docs = tbl(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup_pairs(docs, "text", "doc_id",
                                    min_jaccard=0.5)
    comp = connected_components(pairs)
    return (comp.groupBy("comp")
            .agg(F.min((F.col("id") % 3).cast("int"))
                 .alias("first_seen"),
                 F.countDistinct(F.col("id") % 3).cast("int")
                 .alias("n_snapshots"),
                 F.count(F.lit(1)).cast("bigint").alias("n_docs")))


@register(
    "text_ngram_novelty_decay",
    oracle="""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents),
    g AS (SELECT DISTINCT CAST(doc_id % 3 AS INT) AS snap,
                 md5(w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)]
                     || ' ' || w[CAST(i+2 AS INT)] || ' '
                     || w[CAST(i+3 AS INT)] || ' '
                     || w[CAST(i+4 AS INT)]) AS h
          FROM (SELECT doc_id, w,
                       unnest(generate_series(1, len(w) - 4)) AS i
                FROM tk) t),
    intro AS (SELECT h, min(snap) AS fs FROM g GROUP BY 1)
    SELECT g.snap, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN i.fs = g.snap THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN i.fs = g.snap THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS novel_ppm
    FROM g JOIN intro i ON i.h = g.h
    GROUP BY 1
    """,
    note="crawl-novelty decay at n-gram granularity: per crawl "
         "(doc_id%3 as t0/t1/t2), how many DISTINCT word-5-grams it "
         "contains and what fraction is genuinely new vs carried from "
         "earlier crawls — the gram-level complement of "
         "dedup_snapshot_first_seen (a page can be 'new' while its "
         "phrases are 90% retreads; this table sees through that). "
         "The number every dedup-storage and crawl-scheduling plan "
         "needs: if novel_ppm decays crawl-over-crawl, marginal crawl "
         "budget buys less data. Shingle explode is linear; gram "
         "introduction is one partial-aggregated min per hash; no "
         "pairwise anything at any scale")
def text_ngram_novelty_decay(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dedup import word_shingles
    docs = tbl(spark, sf_dir, "documents")
    g = (word_shingles(docs, "text", "doc_id", n=5)
         .select((F.col("id") % 3).cast("int").alias("snap"),
                 F.md5("shingle").alias("h"))
         .distinct())
    intro = g.groupBy("h").agg(F.min("snap").alias("fs"))
    novel = (F.col("fs") == F.col("snap")).cast("int")
    return (g.join(intro, "h")
            .groupBy("snap")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_grams"),
                 F.sum(novel).cast("bigint").alias("n_novel"),
                 F.expr("sum(cast(fs = snap as int)) * 1000000 "
                        "div count(1)").cast("bigint")
                 .alias("novel_ppm")))


@register(
    "dedup_cdc_chunk_size_audit",
    oracle="""
    WITH pos AS (
        SELECT doc_id, i,
               CASE WHEN CAST(('0x' || substr(
                        md5(w[CAST(i AS INT)]), 1, 8)) AS BIGINT)
                    % 100 < 25
                    THEN 1 ELSE 0 END AS b
        FROM (SELECT doc_id, w,
                     unnest(generate_series(1, len(w))) AS i
              FROM (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents) s) t),
    ch AS (SELECT doc_id, i,
                  coalesce(sum(b) OVER (
                      PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS cid
           FROM pos),
    sz AS (SELECT doc_id, cid, count(*) AS cw FROM ch GROUP BY 1, 2),
    tot AS (SELECT count(*) AS n FROM sz)
    SELECT CAST(cw AS INT) AS chunk_words,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) * 1000000 // max(tot.n) AS BIGINT)
               AS chunk_ppm
    FROM sz CROSS JOIN tot GROUP BY 1
    """,
    note="CDC chunk-size distribution audit (r12 queue): the "
         "histogram of words-per-chunk the 25%-boundary content-"
         "defined chunker actually produces — the table that verifies "
         "the chunker's geometric size profile (mean ~4 words, "
         "heavier tail than fixed-width) and catches a boundary-rule "
         "regression as a shifted histogram rather than a downstream "
         "dedup-rate mystery. Spark side chunks via the same one-"
         "expression map-only fold the dedup entries use "
         "(operators/curation.py::cdc_chunk_arr) and counts words "
         "per chunk; the oracle re-derives chunking as a window "
         "cumsum over boundary flags (the _cdc_chunks_sql spec). "
         "Output is |distinct chunk sizes| rows at any corpus scale")
def dedup_cdc_chunk_size_audit(spark, sf_dir):
    from mapreduce_wsi_spark.operators.curation import cdc_chunk_arr
    docs = tbl(spark, sf_dir, "documents")
    sz = (cdc_chunk_arr(docs.select(F.col("doc_id").alias("id"),
                                    F.split(F.col("text"), " ")
                                    .alias("__w")))
          .select("id", F.posexplode(F.col("__chunks"))
                  .alias("cid", "ctext"))
          .select(F.size(F.split("ctext", " ")).alias("chunk_words")))
    tot = sz.agg(F.count(F.lit(1)).alias("n"))
    return (sz.groupBy("chunk_words")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_chunks"))
            .crossJoin(F.broadcast(tot))
            .select(F.col("chunk_words").cast("int")
                    .alias("chunk_words"),
                    "n_chunks",
                    F.expr("n_chunks * 1000000 div n").cast("bigint")
                    .alias("chunk_ppm")))


# ---------------------------------------------------------------------------
# C. Distillation calibration (r12 queue)
# ---------------------------------------------------------------------------

def _distill_scored(spark, sf_dir):
    """Per-doc distilled-student score + teacher verdict — the shared
    Spark twin of q_curation2's _DISTILL_SCORE_CTE ``scored`` CTE
    (DECIMAL(28,9) accumulation, LEFT-join zero for docs with no
    selected feature)."""
    dtok, lbl, model = _distill_parts(spark, sf_dir)
    sc = (dtok.join(model.select("tok", "lo"), "tok")
          .groupBy("doc_id").agg(F.sum("lo").alias("score")))
    return (lbl.join(sc, "doc_id", "left")
            .select("doc_id", F.col("keep").alias("teacher_keep"),
                    F.coalesce("score",
                               F.lit(0).cast("decimal(28,9)"))
                    .alias("score")))


@register(
    "quality_distill_calibration",
    oracle=f"""
    WITH {_DISTILL_SCORE_CTE}
    SELECT CAST(greatest(-3, least(3,
               floor(CAST(score AS DOUBLE)))) AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN teacher_keep THEN 1 ELSE 0 END)
                AS BIGINT) AS n_teacher_keep,
           CAST(sum(CASE WHEN teacher_keep THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS keep_ppm
    FROM scored GROUP BY 1
    """,
    note="distillation CALIBRATION table (r12 queue: reliability of "
         "the student score vs teacher margins): docs bucketed by "
         "integer-floored student log-odds score (clamped to [-3, 3] "
         "so the tails stay populated), per bucket the observed "
         "teacher keep rate. A well-calibrated student shows keep_ppm "
         "rising monotonically through the buckets and crossing 50% "
         "near score 0 — a flat or folded profile means the score is "
         "a ranking, not a probability, and any threshold other than "
         "the trained one is unsafe. One aggregate over the scored "
         "table; <= 7 output rows at any corpus size")
def quality_distill_calibration(spark, sf_dir):
    scored = _distill_scored(spark, sf_dir)
    bucket = (F.greatest(F.lit(-3),
                         F.least(F.lit(3),
                                 F.floor(F.col("score").cast("double"))))
              .cast("int"))
    return (scored.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum(F.col("teacher_keep").cast("int")).cast("bigint")
                 .alias("n_teacher_keep"),
                 F.expr("sum(cast(teacher_keep as int)) * 1000000 "
                        "div count(1)").cast("bigint")
                 .alias("keep_ppm")))


@register(
    "quality_distill_threshold_sweep",
    oracle=f"""
    WITH {_DISTILL_SCORE_CTE},
    thr AS (SELECT CAST(unnest([-2, -1, 0, 1, 2]) AS INT) AS thr)
    SELECT thr,
           CAST(sum(CASE WHEN teacher_keep AND score > thr
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
           CAST(sum(CASE WHEN NOT teacher_keep AND score > thr
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
           CAST(sum(CASE WHEN teacher_keep AND score <= thr
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_fn,
           CAST(CASE WHEN sum(CASE WHEN score > thr THEN 1 ELSE 0 END)
                          > 0
                THEN sum(CASE WHEN teacher_keep AND score > thr
                              THEN 1 ELSE 0 END) * 1000000
                     // sum(CASE WHEN score > thr THEN 1 ELSE 0 END)
                ELSE -1 END AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN sum(CASE WHEN teacher_keep THEN 1 ELSE 0 END)
                          > 0
                THEN sum(CASE WHEN teacher_keep AND score > thr
                              THEN 1 ELSE 0 END) * 1000000
                     // sum(CASE WHEN teacher_keep THEN 1 ELSE 0 END)
                ELSE -1 END AS BIGINT) AS recall_ppm
    FROM scored CROSS JOIN thr GROUP BY thr
    """,
    note="the student's OPERATING-POINT table: precision/recall "
         "against the teacher at five score thresholds — the sweep "
         "that picks the serving cutoff once calibration "
         "(quality_distill_calibration) says the score is usable. "
         "Raising the threshold trades recall for precision along "
         "the measured curve instead of a guessed one. DECIMAL "
         "scores make every comparison exact; integer-ppm output; "
         "the scored table is computed once and cross-joined against "
         "a 5-row literal — one aggregate, 5 output rows")
def quality_distill_threshold_sweep(spark, sf_dir):
    scored = _distill_scored(spark, sf_dir)
    from mapreduce_wsi_spark.util import literal_df
    thr = literal_df(spark, [(t,) for t in (-2, -1, 0, 1, 2)],
                     "thr int")
    pred = F.col("score") > F.col("thr")
    tp = (F.col("teacher_keep") & pred).cast("int")
    fp = (~F.col("teacher_keep") & pred).cast("int")
    fn = (F.col("teacher_keep") & ~pred).cast("int")
    agg = (scored.crossJoin(F.broadcast(thr))
           .groupBy("thr")
           .agg(F.sum(tp).cast("bigint").alias("n_tp"),
                F.sum(fp).cast("bigint").alias("n_fp"),
                F.sum(fn).cast("bigint").alias("n_fn")))
    return agg.select(
        "thr", "n_tp", "n_fp", "n_fn",
        F.when(F.col("n_tp") + F.col("n_fp") > 0,
               F.expr("n_tp * 1000000 div (n_tp + n_fp)"))
        .otherwise(-1).cast("bigint").alias("precision_ppm"),
        F.when(F.col("n_tp") + F.col("n_fn") > 0,
               F.expr("n_tp * 1000000 div (n_tp + n_fn)"))
        .otherwise(-1).cast("bigint").alias("recall_ppm"))


# ---------------------------------------------------------------------------
# D. Per-host curriculum pacing + epoch budgeting (r12 queue)
# ---------------------------------------------------------------------------

@register(
    "mix_host_curriculum_pacing",
    oracle="""
    WITH d AS (SELECT doc_id, n_chars,
                      source || '.example.com' AS host
               FROM documents),
    sp AS (SELECT doc_id, host, n_chars,
                  CASE WHEN CAST(('0x' || substr(md5(host), 1, 8))
                            AS BIGINT) % 10 < 8
                       THEN 'train' ELSE 'val' END AS split,
                  ntile(4) OVER (PARTITION BY host
                                 ORDER BY n_chars, doc_id) AS stage
           FROM d),
    per AS (SELECT split, CAST(stage AS INT) AS stage,
                   CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS stage_tokens
            FROM sp GROUP BY 1, 2),
    tot AS (SELECT split, sum(stage_tokens) AS st FROM per GROUP BY 1)
    SELECT p.split, p.stage, p.n_hosts, p.n_docs, p.stage_tokens,
           CAST(p.stage_tokens * 1000000 // t.st AS BIGINT)
               AS share_ppm
    FROM per p JOIN tot t USING (split)
    """,
    note="per-HOST curriculum pacing composed with the host-grouped "
         "split (r12 queue: split_group_host x "
         "mix_token_budget_pacing): membership is a pure function of "
         "the host (portable md5 bucket, 80/20 — no doc of a host "
         "ever crosses the split), and within each HOST docs rank "
         "easy-to-hard into 4 stages via the factored bucketed "
         "prefix-sum ntile — finer pacing than per-source staging, "
         "so one boilerplate-heavy host can't drag its whole domain's "
         "schedule. The oracle keeps the raw ntile-over-host window "
         "form, so the ntile_bucketed algebraic equivalence is "
         "driver-checked on a NEW partition key. Output is "
         "|split x 4| rows; the per-split total rides a broadcast")
def mix_host_curriculum_pacing(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import (
        ntile_bucketed, portable_bucket)
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"))
    staged = ntile_bucketed(docs, ["host"], "n_chars", "doc_id",
                            n_tiles=4, bucket_width=64,
                            tile_col="stage")
    sp = staged.withColumn(
        "split", F.when(portable_bucket(F.col("host"), 10) < 8,
                        "train").otherwise("val"))
    per = (sp.groupBy("split", "stage")
           .agg(F.countDistinct("host").cast("bigint").alias("n_hosts"),
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("stage_tokens")))
    tot = per.groupBy("split").agg(F.sum("stage_tokens").alias("st"))
    return (per.join(F.broadcast(tot), "split")
            .select("split", "stage", "n_hosts", "n_docs",
                    "stage_tokens",
                    F.expr("stage_tokens * 1000000 div st")
                    .cast("bigint").alias("share_ppm")))


@register(
    "mix_epoch_token_budget",
    oracle=r"""
    WITH h AS (SELECT doc_id, source, n_chars,
                      md5(lower(trim(regexp_replace(text, '\s+', ' ',
                                                    'g')))) AS h
               FROM documents),
    firsts AS (SELECT h, min(doc_id) AS keeper FROM h GROUP BY h),
    per AS (SELECT s.source,
                   CAST(sum(CASE WHEN s.doc_id = f.keeper
                                 THEN s.n_chars ELSE 0 END) AS BIGINT)
                       AS eff_tokens
            FROM h s JOIN firsts f ON f.h = s.h GROUP BY 1),
    w AS (SELECT source, eff_tokens,
                 CAST(1 + CAST(('0x' || substr(md5(source), 1, 8))
                               AS BIGINT) % 4 AS INT) AS policy_w
          FROM per),
    tot AS (SELECT sum(eff_tokens) AS te, sum(policy_w) AS sw FROM w)
    SELECT source, eff_tokens, policy_w,
           CAST(2 * te * policy_w // sw AS BIGINT) AS target_tokens,
           CAST(least(2 * te * policy_w // sw, 3 * eff_tokens)
                AS BIGINT) AS alloc_tokens,
           CAST(least(2 * te * policy_w // sw, 3 * eff_tokens)
                * 1000 // greatest(eff_tokens, 1) AS BIGINT)
               AS epochs_x1000,
           2 * te * policy_w // sw > 3 * eff_tokens AS capped
    FROM w CROSS JOIN tot
    """,
    note="epoch-repeat budgeting under a mixture policy (r12 queue): "
         "capacity per source = its dedup-unique token mass "
         "(mix_dedup_aware_weights' exact first-occurrence dedup), "
         "demand = a 2x-corpus token budget allocated by policy "
         "weights (fixture: md5-bucket 1-4 standing in for the "
         "human-chosen mixture config a production run carries), "
         "repeat cap = 3 epochs. The table reports each source's "
         "target vs capped allocation and the epoch multiplier "
         "(x1000 fixed-point) — the sheet that says which domains "
         "the budget wants MORE of than exists (capped=true: find "
         "more data or accept more repeats) before any training job "
         "is launched. Pure integer arithmetic end-to-end; the "
         "corpus totals ride a 1-row broadcast")
def mix_epoch_token_budget(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    docs = tbl(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", "source", "n_chars",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
        .alias("h"))
    firsts = h.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    per = (h.join(firsts, "h")
           .groupBy("source")
           .agg(F.sum(F.when(F.col("doc_id") == F.col("keeper"),
                             F.col("n_chars")).otherwise(0))
                .cast("bigint").alias("eff_tokens")))
    w = per.withColumn(
        "policy_w",
        (F.lit(1) + portable_bucket(F.col("source"), 4)).cast("int"))
    tot = w.agg(F.sum("eff_tokens").alias("te"),
                F.sum("policy_w").alias("sw"))
    target = F.expr("2 * te * policy_w div sw")
    alloc = F.least(target, 3 * F.col("eff_tokens"))
    return (w.crossJoin(F.broadcast(tot))
            .select("source", "eff_tokens", "policy_w",
                    target.cast("bigint").alias("target_tokens"),
                    alloc.cast("bigint").alias("alloc_tokens"),
                    F.expr("least(2 * te * policy_w div sw, "
                           "3 * eff_tokens) * 1000 "
                           "div greatest(eff_tokens, 1L)")
                    .cast("bigint").alias("epochs_x1000"),
                    (target > 3 * F.col("eff_tokens")).alias("capped")))


# ---------------------------------------------------------------------------
# E. ANN serving audits: recall vs n_probe, cell balance (r12 queue)
# ---------------------------------------------------------------------------

_IVF_PANEL_SQL = """
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings WHERE vec_id < 300
"""


@register(
    "sim_ann_ivf_nprobe_recall",
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
    cfg AS (SELECT CAST(unnest([1, 2, 4, 8]) AS INT) AS n_probe)
    SELECT n_probe, CAST(max(truth.n) AS BIGINT) AS n_exact,
           true AS recall_ok, true AS monotone_ok
    FROM cfg CROSS JOIN truth GROUP BY n_probe
    """,
    note="IVF serving recall at varied n_probe (r12 queue: the IVF "
         "twin of dedup_embedding_band_sweep): the SAME prebuilt "
         "16-centroid index (build_ivf_index, seed 42) served at "
         "n_probe 1/2/4/8 against the exact-cosine top-10 truth on "
         "the fixed 20x300 panel — the dial a serving tier actually "
         "turns (recall rises, probed volume rises, no re-index). "
         "Measured at sf0.01: 34%/44.5%/64.5%/84% — the operating "
         "curve driver-visible in one table. Pinned bounds (integer-"
         "multiplied): recall >= 15/25/40/60 percent, plus "
         "monotonicity (more probes can NEVER lose a true top-10 "
         "member when rescoring is exact — fewer than k items beat "
         "it globally, so it survives any candidate superset; "
         "computed, not asserted). n_exact is oracle-exact; the "
         "serve path is the production one: broadcast centroid "
         "probe, cell-equi join, salted two-phase rank")
def sim_ann_ivf_nprobe_recall(spark, sf_dir):
    from pyspark.sql import Window

    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, build_ivf_index, cosine, ivf_query, salted_topk)
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
              .select("qid", "cid").withColumn("__t", F.lit(1)))
    n_exact = top_ex.agg(F.count(F.lit(1)).alias("ne"))
    assigned, centroids = build_ivf_index(emb, "vec_id", "embedding",
                                          n_centroids=16, seed=42)
    queries = emb.filter(F.col("vec_id") < 20)
    rows = None
    for n_probe, lo_pct in ((1, 15), (2, 25), (4, 40), (8, 60)):
        got = (ivf_query(assigned, centroids, queries, k=10,
                         n_probe=n_probe)
               .select(F.col("query_id").alias("qid"),
                       F.col("vec_id").alias("cid")))
        row = (got.join(top_ex, ["qid", "cid"])
               .agg(F.count(F.lit(1)).alias("__found"))
               .crossJoin(F.broadcast(n_exact))
               .select(F.lit(n_probe).cast("int").alias("n_probe"),
                       F.col("ne").cast("bigint").alias("n_exact"),
                       F.col("__found").alias("__found"),
                       (F.col("__found") * 100
                        >= F.lit(lo_pct) * F.col("ne"))
                       .alias("recall_ok")))
        rows = row if rows is None else rows.unionByName(row)
    w = Window.orderBy("n_probe")  # 4-row aggregate frame — bounded
    return (rows
            .withColumn("__prev", F.lag("__found").over(w))
            .select("n_probe", "n_exact", "recall_ok",
                    F.coalesce(F.col("__found") >= F.col("__prev"),
                               F.lit(True)).alias("monotone_ok")))


@register(
    "embedding_ivf_cell_balance",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_assigned,
           true AS cells_ok, true AS balance_ok, true AS coverage_ok
    FROM ({_IVF_PANEL_SQL}) p
    """,
    note="IVF index HEALTH audit — the check a serving tier runs "
         "after every index build: every panel vector lands in "
         "exactly one cell (coverage_ok: cell sizes sum back to the "
         "corpus count — a dropped or duplicated row breaks it), the "
         "coarse quantizer actually spread the data (cells_ok: >= 8 "
         "of 16 centroids non-empty; k-means CAN park centroids on "
         "nothing), and no hot cell dominates serve cost (balance_ok: "
         "max cell <= 4x the mean, integer-multiplied as max * "
         "n_cells <= 4 * n_assigned). Measured at sf0.01: 16/16 "
         "cells, max 44 vs mean 18.75 (2.35x). A hot cell is exactly "
         "the case where n_probe recall curves lie — the probe that "
         "hits it rescans half the corpus. n_assigned is "
         "oracle-exact; the audit aggregates the assignment column "
         "the index already carries — no extra shuffle at any scale")
def embedding_ivf_cell_balance(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import build_ivf_index
    emb = tbl(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    assigned, _centroids = build_ivf_index(emb, "vec_id", "embedding",
                                           n_centroids=16, seed=42)
    per = (assigned.groupBy("__cell")
           .agg(F.count(F.lit(1)).alias("c")))
    return (per.agg(F.sum("c").cast("bigint").alias("n_assigned"),
                    F.count(F.lit(1)).alias("__nc"),
                    F.max("c").alias("__mx"))
            .crossJoin(F.broadcast(
                emb.agg(F.count(F.lit(1)).alias("__np"))))
            .select("n_assigned",
                    (F.col("__nc") >= 8).alias("cells_ok"),
                    (F.col("__mx") * F.col("__nc")
                     <= 4 * F.col("n_assigned")).alias("balance_ok"),
                    (F.col("n_assigned") == F.col("__np"))
                    .alias("coverage_ok")))


@register(
    "mm_decode_tiff_jpeg",
    oracle=f"""
    WITH p AS (SELECT doc_id, rpad(substr(text, 1, 16), 16, 'x') AS px
               FROM {_ASCII_DOCS_SQL} documents)
    SELECT doc_id, CAST(32 AS INT) AS img_w, CAST(32 AS INT) AS img_h,
           true AS ok,
           round(list_sum(list_transform(generate_series(1, 16),
                 j -> unicode(px[j]))) / 16.0, 9) AS mean_r,
           round(list_sum(list_transform(generate_series(1, 16),
                 j -> unicode(px[j]))) / 16.0, 9) AS mean_g,
           round(list_sum(list_transform(generate_series(1, 16),
                 j -> unicode(px[j]))) / 16.0, 9) AS mean_b
    FROM p
    """,
    note="JPEG-in-TIFF decode (Compression 7, TIFF Technote 2 — the "
         "Aperio-SVS whole-slide layout: JPEG-coded tiles inside a "
         "TIFF container): 16 ASCII bytes become a 4x4 grid of "
         "uniform 8x8 blocks (the mm_decode_jpeg losslessness trick), "
         "containerized rotating byte order (doc_id%2) x 8-row JPEG "
         "STRIPS vs 16x16 JPEG TILES ((doc_id//2)%2) — each segment a "
         "self-contained JFIF stream run through the repo's own T.81 "
         "decoder (marker walk, Huffman, dequant, IDCT) from inside "
         "the TIFF strip/tile reassembly, with the decoded geometry "
         "of every segment checked against the container's. The "
         "DuckDB twin recomputes channel means from the 16 source "
         "bytes (operators/multimodal.py::_parse_tiff comp-7 branch, "
         "encode_tiff_jpeg)")
def mm_decode_tiff_jpeg(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from mapreduce_wsi_spark.operators.multimodal import (
        BLOB_SCHEMA, decode_tiff_stats, encode_tiff_jpeg)

    docs = _ascii_docs(spark, sf_dir)
    padded = docs.select(
        "doc_id",
        F.encode(F.rpad(F.substring("text", 1, 16), 16, "x"), "UTF-8")
        .alias("raw"))

    def encode(batches):
        for pdf in batches:
            content = []
            for doc_id, b in zip(pdf["doc_id"], pdf["raw"]):
                vals = (np.frombuffer(bytes(b), dtype=np.uint8)
                        .reshape(4, 4))
                endian = "<" if doc_id % 2 == 0 else ">"
                content.append(encode_tiff_jpeg(
                    vals, endian, tile=bool((doc_id // 2) % 2)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "content": content,
                "mime": ["image/tiff"] * len(pdf),
                "n_bytes": pd.Series([len(c) for c in content],
                                     dtype="int32"),
            })

    blobs = padded.mapInPandas(encode, BLOB_SCHEMA)
    stats = decode_tiff_stats(blobs)
    return stats.select("doc_id", "img_w", "img_h", "ok",
                        F.round("mean_r", 9).alias("mean_r"),
                        F.round("mean_g", 9).alias("mean_g"),
                        F.round("mean_b", 9).alias("mean_b"))


@register(
    "mm_decode_tiff_svs",
    oracle=f"""
    WITH p AS (SELECT doc_id, rpad(substr(text, 1, 16), 16, 'x') AS px
               FROM {_ASCII_DOCS_SQL} documents)
    SELECT doc_id, CAST(16 AS INT) AS img_w, CAST(16 AS INT) AS img_h,
           true AS ok,
           round(list_sum(list_transform([1, 3, 9, 11],
                 j -> unicode(px[j]))) / 4.0, 9) AS mean_r,
           round(list_sum(list_transform([1, 3, 9, 11],
                 j -> unicode(px[j]))) / 4.0, 9) AS mean_g,
           round(list_sum(list_transform([1, 3, 9, 11],
                 j -> unicode(px[j]))) / 4.0, 9) AS mean_b
    FROM p
    """,
    note="the FULL Aperio-SVS shape, end to end: a chained-IFD "
         "pyramid whose EVERY level is JPEG-coded (Compression 7) — "
         "level 0 a 4x4 block grid (32x32), level 1 its [::2, ::2] "
         "2x2 reduction (16x16), written as 8-row JPEG strips or "
         "16x16 JPEG tiles ((doc_id//2)%2) under either byte order "
         "(doc_id%2). The query reads PAGE 1: the IFD-chain walk "
         "selects the reduced level, its comp-7 tags route every "
         "segment through the repo's own T.81 decoder, and only "
         "level-1 bytes are touched — exactly the zoomed-out read a "
         "slide viewer issues against an SVS file. Oracle recomputes "
         "the level-1 channel means from the four source bytes the "
         "reduction keeps (grid positions 1/3/9/11) "
         "(operators/multimodal.py::encode_tiff_jpeg_pyramid, "
         "_parse_tiff)")
def mm_decode_tiff_svs(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from mapreduce_wsi_spark.operators.multimodal import (
        BLOB_SCHEMA, decode_tiff_stats, encode_tiff_jpeg_pyramid)

    docs = _ascii_docs(spark, sf_dir)
    padded = docs.select(
        "doc_id",
        F.encode(F.rpad(F.substring("text", 1, 16), 16, "x"), "UTF-8")
        .alias("raw"))

    def encode(batches):
        for pdf in batches:
            content = []
            for doc_id, b in zip(pdf["doc_id"], pdf["raw"]):
                vals = (np.frombuffer(bytes(b), dtype=np.uint8)
                        .reshape(4, 4))
                endian = "<" if doc_id % 2 == 0 else ">"
                content.append(encode_tiff_jpeg_pyramid(
                    [vals, vals[::2, ::2]], endian,
                    tile=bool((doc_id // 2) % 2)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "content": content,
                "mime": ["image/tiff"] * len(pdf),
                "n_bytes": pd.Series([len(c) for c in content],
                                     dtype="int32"),
            })

    blobs = padded.mapInPandas(encode, BLOB_SCHEMA)
    stats = decode_tiff_stats(blobs, page=1)
    return stats.select("doc_id", "img_w", "img_h", "ok",
                        F.round("mean_r", 9).alias("mean_r"),
                        F.round("mean_g", 9).alias("mean_g"),
                        F.round("mean_b", 9).alias("mean_b"))


# ---------------------------------------------------------------------------
# F. r13 queue head, pre-built (registered now -> stamped next rotation)
# ---------------------------------------------------------------------------

@register(
    "sim_ann_pq_m_recall",
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
    cfg AS (SELECT CAST(unnest([2, 4, 8, 16]) AS INT) AS m)
    SELECT m, CAST(max(truth.n) AS BIGINT) AS n_exact,
           true AS recall_ok
    FROM cfg CROSS JOIN truth GROUP BY m
    """,
    note="PQ serving recall at varied subspace count (r13 queue head, "
         "pre-built: the PQ twin of sim_ann_ivf_nprobe_recall): "
         "codebooks trained at m = 2/4/8/16 subspaces x 16 codes over "
         "the same deterministic sample, ADC shortlist-50 + exact "
         "re-rank served against the exact-cosine top-10 truth on the "
         "fixed 20x300 panel — the storage-vs-recall dial (64d floats "
         "-> m bytes: 128x down at m=2, 16x at m=16). Measured at "
         "sf0.01: 55.5/63/68.5/90% — finer subspaces quantize less "
         "signal away. Pinned bounds (integer-multiplied): recall >= "
         "30/40/45/65 percent. NO monotonicity claim: unlike IVF's "
         "probe-superset theorem, PQ recall under a bounded re-rank "
         "shortlist is not provably monotone in m. n_exact is "
         "oracle-exact; codebooks ride as plan literals, encode is "
         "map-only, every selection is the salted two-phase rank")
def sim_ann_pq_m_recall(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, build_pq_codebooks, cosine, pq_encode, pq_query,
        salted_topk)
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
    queries = emb.filter(F.col("vec_id") < 20)
    rows = None
    for m, lo_pct in ((2, 30), (4, 40), (8, 45), (16, 65)):
        books = build_pq_codebooks(emb, m_subspaces=m, n_codes=16)
        codes = pq_encode(emb, books)
        got = (pq_query(codes, books, emb, queries, k=10)
               .select(F.col("query_id").alias("qid"),
                       F.col("vec_id").alias("cid")))
        row = (got.join(top_ex, ["qid", "cid"])
               .agg(F.count(F.lit(1)).alias("__found"))
               .crossJoin(F.broadcast(n_exact))
               .select(F.lit(m).cast("int").alias("m"),
                       F.col("ne").cast("bigint").alias("n_exact"),
                       (F.col("__found") * 100
                        >= F.lit(lo_pct) * F.col("ne"))
                       .alias("recall_ok")))
        rows = row if rows is None else rows.unionByName(row)
    return rows


@register(
    "quality_distill_feature_ablation",
    oracle=f"""
    WITH {_DISTILL_SCORE_CTE},
    dtok2 AS (SELECT doc_id, tok FROM dtok
              WHERE tok NOT LIKE 'LEN:%'),
    dfs2 AS (SELECT d.tok,
                    CAST(sum(CASE WHEN l.keep THEN 1 ELSE 0 END)
                         AS BIGINT) AS df_keep,
                    CAST(sum(CASE WHEN l.keep THEN 0 ELSE 1 END)
                         AS BIGINT) AS df_rej
             FROM dtok2 d JOIN lbl l ON l.doc_id = d.doc_id
             GROUP BY d.tok),
    ms2 AS (SELECT tok,
                   CAST(ln((df_keep + 1.0) / (nk + 2.0))
                        - ln((df_rej + 1.0) / (nr + 2.0))
                        AS DECIMAL(28,9)) AS lo
            FROM dfs2 CROSS JOIN cls
            WHERE df_keep + df_rej >= 20
              AND abs(CAST(ln((df_keep + 1.0) / (nk + 2.0))
                           - ln((df_rej + 1.0) / (nr + 2.0))
                           AS DECIMAL(28,9))) >= 0.5),
    sc2 AS (SELECT d.doc_id, sum(m.lo) AS score
            FROM dtok2 d JOIN ms2 m ON m.tok = d.tok
            GROUP BY d.doc_id),
    scored2 AS (SELECT l.doc_id, l.keep AS teacher_keep,
                       coalesce(sc2.score, CAST(0 AS DECIMAL(28,9)))
                           AS score
                FROM lbl l LEFT JOIN sc2 ON sc2.doc_id = l.doc_id),
    a AS (SELECT 'full' AS variant,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN teacher_keep = (score > 0)
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
          FROM scored
          UNION ALL
          SELECT 'no_length',
                 CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN teacher_keep = (score > 0)
                               THEN 1 ELSE 0 END) AS BIGINT)
          FROM scored2)
    SELECT variant, n_docs, n_agree,
           CAST(n_agree * 1000000 // n_docs AS BIGINT) AS agree_ppm
    FROM a
    """,
    note="distillation FEATURE ABLATION (r13 queue head, pre-built): "
         "teacher agreement of the full student vs a student trained "
         "WITHOUT the discretized-length pseudo-token — the question "
         "'how much of the score is just length?' answered as a "
         "number. The ablated model is re-derived end to end (df "
         "aggregation, add-one log-odds, evidence threshold) over the "
         "filtered token stream, not score-adjusted post hoc — "
         "removing a feature changes every other feature's selection "
         "frequency, and a post-hoc subtraction would miss that. "
         "Same DECIMAL accumulation; two vocab-bounded token joins; "
         "2 output rows")
def quality_distill_feature_ablation(spark, sf_dir):
    dtok, lbl, model = _distill_parts(spark, sf_dir)
    dtok2 = dtok.filter(~F.col("tok").startswith("LEN:"))
    cls = lbl.agg(
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("nk"),
        F.sum((~F.col("keep")).cast("int")).cast("bigint").alias("nr"))
    dfs2 = (dtok2.join(lbl, "doc_id")
            .groupBy("tok")
            .agg(F.sum(F.col("keep").cast("int")).cast("bigint")
                 .alias("df_keep"),
                 F.sum((~F.col("keep")).cast("int")).cast("bigint")
                 .alias("df_rej")))
    model2 = (dfs2.crossJoin(F.broadcast(cls))
              .filter(F.col("df_keep") + F.col("df_rej") >= 20)
              .select("tok",
                      (F.log((F.col("df_keep") + 1.0)
                             / (F.col("nk") + 2.0))
                       - F.log((F.col("df_rej") + 1.0)
                               / (F.col("nr") + 2.0)))
                      .cast("decimal(28,9)").alias("lo"))
              .filter(F.abs(F.col("lo")) >= 0.5))

    def agreement(toks, mdl, variant):
        sc = (toks.join(mdl.select("tok", "lo"), "tok")
              .groupBy("doc_id").agg(F.sum("lo").alias("score")))
        scored = (lbl.join(sc, "doc_id", "left")
                  .select(F.col("keep").alias("teacher_keep"),
                          F.coalesce("score",
                                     F.lit(0).cast("decimal(28,9)"))
                          .alias("score")))
        agree = (F.col("teacher_keep")
                 == (F.col("score") > 0)).cast("int")
        return (scored.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(agree).cast("bigint").alias("n_agree"))
            .select(F.lit(variant).alias("variant"), "n_docs",
                    "n_agree",
                    F.expr("n_agree * 1000000 div n_docs")
                    .cast("bigint").alias("agree_ppm")))

    return (agreement(dtok, model, "full")
            .unionByName(agreement(dtok2, model2, "no_length")))


def _cdc_hist_sql(pct: int) -> str:
    """One boundary_pct variant of the chunk-size CTE chain (the
    _cdc_chunks_sql spec re-derived at a parameterized boundary rate);
    emits ``sz{pct}`` with (doc_id, cid, cw)."""
    return f"""
    pos{pct} AS (
        SELECT doc_id, i,
               CASE WHEN CAST(('0x' || substr(
                        md5(w[CAST(i AS INT)]), 1, 8)) AS BIGINT)
                    % 100 < {pct}
                    THEN 1 ELSE 0 END AS b
        FROM (SELECT doc_id, w,
                     unnest(generate_series(1, len(w))) AS i
              FROM (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents) s{pct}) t{pct}),
    ch{pct} AS (SELECT doc_id, i,
                       coalesce(sum(b) OVER (
                           PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS cid
                FROM pos{pct}),
    sz{pct} AS (SELECT doc_id, cid, count(*) AS cw
                FROM ch{pct} GROUP BY 1, 2)"""


@register(
    "dedup_cdc_boundary_sweep",
    oracle=f"""
    WITH {_cdc_hist_sql(10)},
    {_cdc_hist_sql(25)},
    {_cdc_hist_sql(50)},
    u AS (SELECT 10 AS boundary_pct, cw FROM sz10
          UNION ALL SELECT 25, cw FROM sz25
          UNION ALL SELECT 50, cw FROM sz50)
    SELECT CAST(boundary_pct AS INT) AS boundary_pct,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(cw) * 1000 // count(*) AS BIGINT)
               AS mean_words_x1000,
           CAST(max(cw) AS INT) AS max_words
    FROM u GROUP BY 1
    """,
    note="CDC boundary-rate sweep (r13 queue head, pre-built): the "
         "same corpus chunked at boundary_pct 10/25/50 — expected "
         "mean chunk ~100/pct words (geometric), and the sweep shows "
         "the dedup-granularity trade directly: coarser chunks (10%) "
         "dedupe less but cost fewer hashes; finer (50%) the inverse. "
         "The table a storage planner reads before fixing the "
         "chunker's rate for a 100 TB corpus. Spark side is three "
         "map-only cdc_chunk_arr passes unioned (no shuffle until the "
         "3-row aggregate); the oracle re-derives each rate as a "
         "window cumsum (the _cdc_chunks_sql spec, parameterized)")
def dedup_cdc_boundary_sweep(spark, sf_dir):
    from mapreduce_wsi_spark.operators.curation import cdc_chunk_arr
    docs = tbl(spark, sf_dir, "documents")
    out = None
    for pct in (10, 25, 50):
        sz = (cdc_chunk_arr(docs.select(F.col("doc_id").alias("id"),
                                        F.split(F.col("text"), " ")
                                        .alias("__w")), pct)
              .select(F.posexplode(F.col("__chunks"))
                      .alias("cid", "ctext"))
              .select(F.size(F.split("ctext", " ")).alias("cw")))
        row = sz.agg(
            F.lit(pct).cast("int").alias("boundary_pct"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.expr("sum(cw) * 1000 div count(1)").cast("bigint")
            .alias("mean_words_x1000"),
            F.max("cw").cast("int").alias("max_words"))
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "mix_host_anneal_phase",
    oracle=f"""
    WITH {_GOPHER_FLAGS_CTE},
    st AS (SELECT doc_id, source || '.example.com' AS host, n_chars,
                  ntile(4) OVER (PARTITION BY source || '.example.com'
                                 ORDER BY n_chars, doc_id) AS stage
           FROM documents),
    ph AS (SELECT st.host,
                  CASE WHEN st.stage = 4 AND fl.wc_ok AND fl.mwl_ok
                            AND fl.symbol_ok AND fl.alpha_ok
                            AND fl.stop_ok
                       THEN 2 ELSE 1 END AS phase,
                  st.n_chars
           FROM st JOIN flags fl ON fl.doc_id = st.doc_id),
    per AS (SELECT host, CAST(phase AS INT) AS phase,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS tokens
            FROM ph GROUP BY 1, 2),
    tot AS (SELECT host, sum(tokens) AS t FROM per GROUP BY 1)
    SELECT p.host, p.phase, p.n_docs, p.tokens,
           CAST(p.tokens * 1000000 // t.t AS BIGINT) AS share_ppm
    FROM per p JOIN tot t USING (host)
    """,
    note="per-HOST two-phase anneal schedule (r13 queue head, "
         "pre-built: mix_anneal_high_quality recomposed on the host "
         "key): phase 2 = docs in their HOST's top length quartile "
         "(bucketed prefix-sum ntile, no bare-host window) that also "
         "pass the full Gopher gate; the table reports each host's "
         "anneal token share — host granularity matters because one "
         "template-heavy host inside a domain can carry zero anneal-"
         "quality tokens while its domain average looks fine. The "
         "oracle keeps the raw ntile-over-host form (the algebraic "
         "equivalence re-checked on this key); aggregates only, "
         "per-host totals broadcast")
def mix_host_anneal_phase(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import ntile_bucketed
    from mapreduce_wsi_spark.plans.q_curation import _gopher_flagged
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"))
    staged = ntile_bucketed(docs, ["host"], "n_chars", "doc_id",
                            n_tiles=4, bucket_width=64,
                            tile_col="stage")
    keep = _gopher_flagged(spark, sf_dir).select("doc_id", "keep")
    ph = (staged.join(keep, "doc_id")
          .select("host", "n_chars",
                  F.when((F.col("stage") == 4) & F.col("keep"), 2)
                  .otherwise(1).cast("int").alias("phase")))
    per = (ph.groupBy("host", "phase")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("tokens")))
    tot = per.groupBy("host").agg(F.sum("tokens").alias("t"))
    return (per.join(F.broadcast(tot), "host")
            .select("host", "phase", "n_docs", "tokens",
                    F.expr("tokens * 1000000 div t").cast("bigint")
                    .alias("share_ppm")))


@register(
    "mix_epoch_budget_waterfall",
    oracle=r"""
    WITH h AS (SELECT doc_id, source, n_chars,
                      md5(lower(trim(regexp_replace(text, '\s+', ' ',
                                                    'g')))) AS h
               FROM documents),
    firsts AS (SELECT h, min(doc_id) AS keeper FROM h GROUP BY h),
    base AS (SELECT s.source,
                    CAST(sum(CASE WHEN s.doc_id = f.keeper
                                  THEN s.n_chars ELSE 0 END) AS BIGINT)
                        AS eff,
                    CAST(1 + CAST(('0x' || substr(md5(s.source), 1, 8))
                                  AS BIGINT) % 4 AS INT) AS w
             FROM h s JOIN firsts f ON f.h = s.h GROUP BY s.source),
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
    """,
    note="WATERFALL reallocation for the epoch budgeter (r13 queue "
         "head, pre-built: mix_epoch_token_budget iterated): sources "
         "capped at 3 epochs return their unused budget, which "
         "redistributes to still-uncapped sources by policy weight — "
         "two unrolled redistribution rounds (each round = one 1-row "
         "aggregate broadcast + a map-only update over |sources| "
         "rows; the fixpoint is reached when no new source caps, and "
         "two rounds suffice for any weight profile where caps are "
         "<=2 deep — deeper profiles leave residual surplus visible "
         "as alloc < budget, never a wrong row). All arithmetic is "
         "integer floor-division, so both engines produce the "
         "identical waterfall; capped_round records WHEN each source "
         "hit its ceiling (0/1/2, -1 = never)")
def mix_epoch_budget_waterfall(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    docs = tbl(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", "source", "n_chars",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
        .alias("h"))
    firsts = h.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    base = (h.join(firsts, "h")
            .groupBy("source")
            .agg(F.sum(F.when(F.col("doc_id") == F.col("keeper"),
                              F.col("n_chars")).otherwise(0))
                 .cast("bigint").alias("eff"))
            .withColumn("w", (F.lit(1)
                              + portable_bucket(F.col("source"), 4))
                        .cast("int")))
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
