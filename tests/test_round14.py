"""Round-14 unit tests: the ADVICE r13 fixes (ivfpq_query's assigned
fallback, the BPE oracle WHERE parameterization) and the r14 additions
(filtered IVF-PQ serving, incremental index maintenance, the comp-7
16-bit/planar SVS boundary)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_ivfpq_codes_without_cell_column_uses_assigned(spark, sf_oracle):
    """ADVICE r13 (low): ivfpq_query took an ``assigned`` frame but
    ignored it — a codes table missing the pre-joined ``__cell`` column
    crashed instead of falling back. Now: raw pq_encode output (no
    __cell) must serve IDENTICALLY to the build-side pre-joined table,
    because the fallback join is the same join."""
    from mapreduce_wsi_spark.operators.similarity import (
        build_ivf_index, build_pq_codebooks, ivfpq_query, pq_encode)

    emb = (spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
           .filter(F.col("vec_id") < 200))
    assigned, centroids = build_ivf_index(emb, "vec_id", "embedding",
                                          n_centroids=8, seed=42)
    queries = emb.filter(F.col("vec_id") < 10)
    books = build_pq_codebooks(emb, m_subspaces=8, n_codes=16)
    raw_codes = pq_encode(emb, books)
    pre = (raw_codes.join(assigned.select("vec_id", "__cell"), "vec_id"))

    def rows(codes):
        return sorted(
            (r.query_id, r.vec_id, round(r.cos, 9), r.rn)
            for r in ivfpq_query(assigned, centroids, codes, books,
                                 emb, queries, k=5,
                                 n_probe=2).collect())

    assert rows(raw_codes) == rows(pre)
    assert len(rows(raw_codes)) == 50  # 10 queries x k=5


def test_ivf_assign_matches_build_assignment(spark, sf_oracle):
    """Incremental maintenance contract (r14): assigning vectors to an
    EXISTING quantizer must reproduce the build's own cell choice —
    ivf_assign over the very corpus build_ivf_index trained on returns
    the identical (id, __cell) mapping (argmin squared-L2 on the
    normalized vector, ties to the lowest cell — KMeans.transform's
    rule), and the same __cv payload the serve path joins on."""
    from mapreduce_wsi_spark.operators.similarity import (
        build_ivf_index, ivf_assign)

    emb = (spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
           .filter(F.col("vec_id") < 300))
    assigned, centroids = build_ivf_index(emb, "vec_id", "embedding",
                                          n_centroids=16, seed=42)
    re_assigned = ivf_assign(emb, centroids)
    a = {r.vec_id: r["__cell"] for r in assigned.collect()}
    b = {r.vec_id: r["__cell"] for r in re_assigned.collect()}
    assert a == b
    # __cv is the raw double vector, same as the build's
    row = re_assigned.filter(F.col("vec_id") == 0).collect()[0]
    want = (emb.filter(F.col("vec_id") == 0)
            .select(F.col("embedding").cast("array<double>").alias("v"))
            .collect()[0].v)
    assert row["__cv"] == want


def test_pq_reconstruction_error_matches_numpy(spark, sf_oracle):
    """pq_reconstruction_error's map-only min-distance fold equals the
    numpy recomputation (normalize, slice, min squared-L2 per
    subspace, sum) for every vector in the panel."""
    from mapreduce_wsi_spark.operators.similarity import (
        build_pq_codebooks, pq_reconstruction_error)

    emb = (spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
           .filter(F.col("vec_id") < 100))
    books = build_pq_codebooks(emb, m_subspaces=8, n_codes=16)
    got = {r.vec_id: r["__rerr"]
           for r in pq_reconstruction_error(emb, books).collect()}
    rows = emb.select("vec_id",
                      F.col("embedding").cast("array<double>")
                      .alias("v")).collect()
    b = np.array(books)  # (M, K, d_sub)
    m_sub, _, d_sub = b.shape
    for r in rows:
        v = np.array(r.v)
        v = v / np.linalg.norm(v)
        want = sum(
            (((v[m * d_sub:(m + 1) * d_sub][None, :] - b[m]) ** 2)
             .sum(axis=1)).min()
            for m in range(m_sub))
        assert abs(got[r.vec_id] - want) < 1e-9


def test_filtered_ivfpq_matches_filtered_truth_when_not_starved(
        spark, sf_oracle):
    """filter_expr semantics: every returned id satisfies the
    predicate, and when the filtered pool inside the probed cells is
    <= shortlist, the ADC shortlist admits every candidate, so the
    result equals the exact-rescored filtered-IVF ceiling row for row
    (same routing, same predicate, both re-rank exactly)."""
    from mapreduce_wsi_spark.operators.similarity import (
        build_ivf_index, build_pq_codebooks, ivf_query, ivfpq_query,
        pq_encode)

    emb = (spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
           .filter(F.col("vec_id") < 500))
    assigned, centroids = build_ivf_index(emb, "vec_id", "embedding",
                                          n_centroids=16, seed=42)
    books = build_pq_codebooks(emb, m_subspaces=8, n_codes=16)
    codes = (pq_encode(emb, books)
             .join(assigned.select("vec_id", "__cell"), "vec_id")
             .join(emb.select("vec_id", "label"), "vec_id"))
    asg = assigned.join(emb.select("vec_id", "label"), "vec_id")
    queries = emb.filter(F.col("vec_id") < 10)
    pred = F.col("label") == 0  # ~10% selectivity -> pool << 50
    labels = {r.vec_id: r.label for r in
              emb.select("vec_id", "label").collect()}

    pq = ivfpq_query(assigned, centroids, codes, books, emb, queries,
                     k=5, n_probe=4, shortlist=50, filter_expr=pred)
    pq_rows = sorted((r.query_id, r.vec_id, r.rn)
                     for r in pq.collect())
    assert pq_rows, "filtered serve returned nothing"
    assert all(labels[cid] == 0 for _, cid, _ in pq_rows)

    ivf = ivf_query(asg, centroids, queries, k=5, n_probe=4,
                    filter_expr=pred)
    ivf_rows = sorted((r.query_id, r.vec_id, r.rn)
                      for r in ivf.collect())
    assert pq_rows == ivf_rows  # starved shortlist = routing ceiling


# ---------------------------------------------------------------------------
# The comp-7 16-bit/planar SVS boundary, composed through the pyramid
# walk (VERDICT r13 ask #5 / the last declared r14 queue item)
# ---------------------------------------------------------------------------


def _jpeg_strip_pages(vals_levels):
    """The encode_tiff_jpeg_pyramid page dicts, exposed so a test can
    mutate ONE level's claimed depth/layout while keeping its JFIF
    segments byte-identical — isolating the parser's comp-7 gate as
    the only possible rejection site."""
    from mapreduce_wsi_spark.operators.multimodal import encode_jpeg_dc
    pages = []
    for vals in vals_levels:
        vals = np.asarray(vals, dtype=np.uint8)
        bh, bw = vals.shape
        segs = [encode_jpeg_dc(vals[r], block_w=bw, gray=False)
                for r in range(bh)]
        pages.append(dict(w=bw * 8, h=bh * 8, spp=3, photometric=2,
                          compression=7, segs=segs, rows_per_strip=8,
                          tile=None, predictor=1))
    return pages


def test_comp7_pyramid_rejects_16bit_and_planar_at_the_depth_gate():
    """TIFF Technote 2 defines new-style JPEG-in-TIFF for 8-bit chunky
    data only — a '16-bit planar SVS-shaped' pyramid level must be
    rejected AT THE GATE (the comp==7 depth/layout clause in
    _parse_tiff, pinned precisely in e2cf246), not by an incidental
    downstream failure. The poisoned levels here keep byte-identical,
    individually-decodable JFIF segments and mutate only the IFD's
    claimed BitsPerSample / PlanarConfiguration, so the gate is the
    only thing that can say no; the sibling 8-bit level in the SAME
    chain keeps decoding, and the comp-5 16-bit planar pyramid
    (the combination the spec DOES allow, stamped r13) still decodes
    through the same walk — rejection is specific to comp-7."""
    from mapreduce_wsi_spark.operators.multimodal import (
        _parse_tiff, _tiff_ifd_chain, encode_tiff_pyramid)

    rng = np.random.default_rng(17)
    vals0 = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    vals1 = rng.integers(0, 256, (2, 2), dtype=np.uint8)

    # control: the unmutated comp-7 chain decodes at both levels
    clean = _tiff_ifd_chain("<", _jpeg_strip_pages([vals0, vals1]))
    assert _parse_tiff(clean, page=0) is not None
    assert _parse_tiff(clean, page=1) is not None

    for endian in ("<", ">"):
        for mutation in ({"bits": 16}, {"planar": True},
                         {"bits": 16, "planar": True}):
            pages = _jpeg_strip_pages([vals0, vals1])
            pages[1].update(mutation)
            blob = _tiff_ifd_chain(endian, pages)
            # base level unaffected; the poisoned level rejects
            assert _parse_tiff(blob, page=0) is not None, \
                (endian, mutation)
            assert _parse_tiff(blob, page=1) is None, (endian, mutation)
            # and poisoning the BASE level leaves the clean level 1
            pages = _jpeg_strip_pages([vals0, vals1])
            pages[0].update(mutation)
            blob = _tiff_ifd_chain(endian, pages)
            assert _parse_tiff(blob, page=0) is None, (endian, mutation)
            assert _parse_tiff(blob, page=1) is not None, \
                (endian, mutation)

    # specificity: the same 16-bit planar pyramid WITHOUT JPEG coding
    # (comp 5, the r13-stamped container) decodes through the walk
    img0 = rng.integers(0, 256, (6, 4, 3), dtype=np.uint8)
    img1 = img0[::2, ::2]
    pyr = encode_tiff_pyramid(
        [img0.astype(np.uint16) * 257, img1.astype(np.uint16) * 257],
        compression=5, planar=True, bits=16)
    for page, img in ((0, img0), (1, img1)):
        got = _parse_tiff(pyr, page=page)
        assert got is not None
        assert got[2].dtype == np.uint16
        assert np.array_equal(got[2], img.astype(np.uint16) * 257)
