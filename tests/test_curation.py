"""Unit tests for operators/curation.py (the r10 web-curation tranche)
on hand-built inputs — the oracle parity suite covers fixture-scale
equivalence; these pin edge semantics the fixtures don't reach."""

from __future__ import annotations

from pyspark.sql import functions as F


def _canon(spark, urls):
    from mapreduce_wsi_spark.operators.curation import (
        canonical_host, canonical_url)
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [(r["h"], r["c"]) for r in
            df.select(canonical_host(F.col("u")).alias("h"),
                      canonical_url(F.col("u")).alias("c")).collect()]


def test_canonical_url_normalization_rules(spark):
    """Every documented rule, one probe each: scheme pinning, host
    lowercase + www strip, port drop, fragment drop, trailing-slash
    strip, tracking-param drop, param sort. A host whose LABEL contains
    'www' mid-name must keep it (only the leading 'www.' strips)."""
    rows = _canon(spark, [
        "HTTP://WWW.Ex.COM/A/",                      # scheme+www+slash
        "https://ex.com:8080/A?b=2&a=1",             # port + param sort
        "https://ex.com/A?utm_source=x&a=1#frag",    # tracking + frag
        "https://wwwx.ex.com/A",                     # mid-label www kept
        "https://ex.com/",                           # root slash strips
        "https://ex.com/A?utm_campaign=y&ref=z",     # all params tracked
    ])
    assert rows[0] == ("ex.com", "https://ex.com/A")
    assert rows[1] == ("ex.com", "https://ex.com/A?a=1&b=2")
    assert rows[2] == ("ex.com", "https://ex.com/A?a=1")
    assert rows[3] == ("wwwx.ex.com", "https://wwwx.ex.com/A")
    assert rows[4] == ("ex.com", "https://ex.com")
    assert rows[5] == ("ex.com", "https://ex.com/A")


def test_url_canonical_dedup_keep_first(spark):
    from mapreduce_wsi_spark.operators.curation import url_canonical_dedup
    df = spark.createDataFrame(
        [(1, "https://www.ex.com/p?utm_source=a"),
         (2, "HTTP://ex.com/p"),
         (3, "https://ex.com/p/"),
         (4, "https://ex.com/q")],
        "id long, u string")
    got = {r["id"]: (r["keep"], r["group_n"]) for r in
           url_canonical_dedup(df, "u", "id").collect()}
    assert got == {1: (True, 3), 2: (False, 3), 3: (False, 3),
                   4: (True, 1)}


def test_cross_snapshot_bloom_equals_exact(spark):
    from mapreduce_wsi_spark.operators.curation import (
        cross_snapshot_bloom, cross_snapshot_exact)
    old = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta eps zeta"),
         (3, "Alpha  Beta GAMMA")],  # normalizes to doc 1's text
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "alpha beta gamma"), (11, "fresh new content"),
         (12, "delta eps zeta")],
        "doc_id long, text string")
    exact = {r["doc_id"]: (r["is_carried"], r["matched_old"]) for r in
             cross_snapshot_exact(new, old, "text", "doc_id").collect()}
    bloom = {r["doc_id"]: (r["is_carried"], r["matched_old"]) for r in
             cross_snapshot_bloom(new, old, "text", "doc_id").collect()}
    assert exact == {10: (True, 1), 11: (False, None), 12: (True, 2)}
    assert bloom == exact


def test_contamination_scoring_positions_and_runs(spark):
    """Hand-checkable coverage: corpus doc = 10 words, bench shares the
    5-gram at positions 2..6 (two overlapping start positions 2,3) ->
    6 covered tokens, longest run 2; a clean doc scores 0/0."""
    from mapreduce_wsi_spark.operators.curation import (
        contamination_longest_run, contamination_token_fraction)
    corpus = spark.createDataFrame(
        [(1, "w0 a b c d e f w7 w8 w9"),
         (2, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "a b c d e f")], "doc_id long, text string")
    frac = {r["doc_id"]: (r["n_contam_tokens"], r["contam_frac"]) for r in
            contamination_token_fraction(corpus, bench, "text", "doc_id",
                                         n=5).collect()}
    assert frac[1] == (6, 0.6)
    assert frac[2] == (0, 0.0)
    runs = {r["doc_id"]: (r["n_hit_shingles"], r["longest_run"]) for r in
            contamination_longest_run(corpus, bench, "text", "doc_id",
                                      n=5).collect()}
    assert runs[1] == (2, 2)
    assert runs[2] == (0, 0)


def test_paragraph_dedup_first_occurrence_wins(spark):
    """Doc 1's second 8-word chunk reappears as doc 2's first chunk:
    the doc-2 copy must drop (global first occurrence = (1, 1))."""
    from mapreduce_wsi_spark.operators.curation import paragraph_dedup
    chunk = "p q r s t u v w"
    df = spark.createDataFrame(
        [(1, "a b c d e f g h " + chunk),
         (2, chunk + " z y x w2 v2 u2 t2")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_paras"], r["n_kept"]) for r in
           paragraph_dedup(df, "text", "doc_id").collect()}
    assert got[1] == (2, 2)
    assert got[2] == (2, 1)


def test_gopher_flags_fire_on_engineered_docs(spark):
    from mapreduce_wsi_spark.operators.curation import gopher_quality_flags
    stop = ("the", "and", "of", "to", "a", "in", "is")
    # 50 words, mean word length exactly 3.0 (the inclusive boundary)
    good = "the cat and dog walks to a park in town " * 5
    df = spark.createDataFrame(
        [(1, good.strip()),
         (2, "short text only"),                       # wc fails
         (3, ("### 123 %%% " * 10 + good).strip()),    # symbol+alpha fail
         (4, ("wordwordwordword " * 50).strip())],     # mwl + stop fail
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           gopher_quality_flags(df, "text", "doc_id", stop,
                                min_words=40, max_words=90).collect()}
    assert got[1]["keep"]
    assert not got[2]["wc_ok"] and not got[2]["keep"]
    assert not got[3]["symbol_ok"] and not got[3]["alpha_ok"]
    assert not got[4]["mwl_ok"] and not got[4]["stop_ok"]


def test_pps_systematic_draws_exactly_k_points(spark, sf_oracle):
    """The 50 sampling points each land in exactly one doc's cumulative
    span: sum(n_hits) == 50 at any data size, and every selected doc's
    span really contains its points."""
    from mapreduce_wsi_spark.plans.registry import load_catalog
    rows = load_catalog()["sample_pps_systematic"].fn(
        spark, sf_oracle).collect()
    assert sum(r["n_hits"] for r in rows) == 50


def test_incremental_minhash_never_pairs_old_with_old(spark):
    from mapreduce_wsi_spark.operators.curation import (
        incremental_minhash_pairs)
    text = "the quick brown fox jumps over the lazy dog again and again"
    old = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, text), (11, "totally different words entirely here now")],
        "doc_id long, text string")
    pairs = incremental_minhash_pairs(new, old, "text", "doc_id",
                                      min_jaccard=0.5).collect()
    got = {(r["doc_new"], r["doc_old"]) for r in pairs}
    assert got == {(10, 1), (10, 2)}  # never (1,2), never 11-anything


def test_cdc_chunk_boundaries_are_content_defined(spark):
    """The CDC property that fixed-width paragraphs lack: inserting one
    word into a doc re-chunks only around the edit, so the chunks AFTER
    the insertion's enclosing chunk are byte-identical — verified by
    chunking a doc and its one-word-insert edit and intersecting chunk
    hashes. Also pins the boundary rule itself (portable md5 bucket of
    the word < pct ends a chunk) against a hand-derived doc."""
    import hashlib

    from mapreduce_wsi_spark.operators.curation import cdc_chunk_dedup

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 100

    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    text = " ".join(words)
    edited = " ".join(words[:6] + ["zulu"] + words[6:])
    df = spark.createDataFrame([(1, text), (2, edited)],
                               "doc_id long, text string")
    per_doc = {r["doc_id"]: r for r in
               cdc_chunk_dedup(df, "text", "doc_id",
                               boundary_pct=50).collect()}
    # CDC stability: the edited doc shares every chunk except the one
    # (or two, if zulu is itself a boundary) containing the edit, so
    # n_kept on the edited doc is at most 2 (only the changed chunks
    # are first occurrences beyond doc 1's)
    assert per_doc[2]["n_kept"] <= 2
    assert per_doc[2]["n_chunks"] >= per_doc[1]["n_chunks"]
    # boundary-rule pin: doc 1's chunk count matches the hand-derivation
    boundaries_inside = sum(1 for w in words[:-1] if bucket(w) < 50)
    last_is_boundary = bucket(words[-1]) < 50
    expected = boundaries_inside + (0 if last_is_boundary else 1)
    if last_is_boundary:
        expected += 1  # the closed final chunk still exists
    assert per_doc[1]["n_chunks"] == expected


def test_cdc_single_word_and_all_boundary_docs(spark):
    """Degenerate shapes: a one-word doc yields exactly one chunk
    whether or not the word is a boundary; a doc of all-boundary words
    yields one chunk per word; identical docs dedup to one survivor
    set (second doc keeps nothing)."""
    from mapreduce_wsi_spark.operators.curation import cdc_chunk_dedup

    df = spark.createDataFrame([(1, "solo"), (2, "solo")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           cdc_chunk_dedup(df, "text", "doc_id",
                           boundary_pct=100).collect()}
    assert got[1]["n_chunks"] == 1 and got[1]["n_kept"] == 1
    assert got[2]["n_chunks"] == 1 and got[2]["n_kept"] == 0
    many = spark.createDataFrame([(3, "a b c d e")],
                                 "doc_id long, text string")
    r3 = cdc_chunk_dedup(many, "text", "doc_id",
                         boundary_pct=100).collect()[0]
    assert r3["n_chunks"] == 5  # every word ends its own chunk


def test_ccnet_lm_oov_floor_and_reference_ordering(spark):
    """Hand-check the add-one unigram: reference = 'cat cat dog'
    (N=3, V=2, so nv=5): p(cat)=3/5, p(dog)=2/5, p(OOV)=1/5. A
    paragraph of reference words must score lower cross-entropy than
    an all-OOV paragraph, and the OOV paragraph's xent must equal
    -ln(1/5) exactly (every word hits the same smoothing floor)."""
    import math

    from mapreduce_wsi_spark.operators.curation import ccnet_paragraph_lm

    ref = spark.createDataFrame([(0, "cat cat dog")],
                                "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "cat dog cat dog"), (2, "xx yy zz ww")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            ccnet_paragraph_lm(corpus, ref, "text", "doc_id",
                               para_words=4).collect()}
    assert rows[1]["xent"] < rows[2]["xent"]
    assert abs(rows[2]["xent"] - (-math.log(1 / 5))) < 1e-6
    assert rows[1]["n_words"] == 4 and rows[1]["para"] == 0


def test_ntile_bucketed_matches_ntile_exactly(spark):
    """The factored helper must be BIT-identical to ntile(T) ordered by
    (order, tiebreak) — including groups smaller than T (tile = rank)
    and ties on the order column (tiebreak decides) — across a T that
    divides the group evenly and one that doesn't."""
    from pyspark.sql import Window as W

    from mapreduce_wsi_spark.operators.pipeline import ntile_bucketed

    rows = [(g, i, float((i * 7) % 23)) for g in ("a", "b")
            for i in range(17)] + [("tiny", 99, 1.0), ("tiny", 98, 1.0)]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    for t in (4, 5):
        got = ntile_bucketed(df, ["grp"], "v", "id", n_tiles=t,
                             bucket_width=3.0, tile_col="tile")
        w = W.partitionBy("grp").orderBy("v", "id")
        want = df.withColumn("tile", F.ntile(t).over(w))
        diff = (got.select("grp", "id", "tile")
                .exceptAll(want.select("grp", "id", "tile")))
        assert diff.count() == 0, f"T={t}: {diff.collect()}"


def test_ntile_bucketed_global_and_desc_via_negation(spark):
    """Empty part_cols = GLOBAL ntile (the rfm_scores form), and a
    descending order is the ascending ntile of the negated column —
    both must stay bit-identical to the window ntile."""
    from pyspark.sql import Window as W

    from mapreduce_wsi_spark.operators.pipeline import ntile_bucketed

    df = spark.createDataFrame(
        [(i, float((i * 13) % 37)) for i in range(41)],
        "id long, v double")
    got = ntile_bucketed(df.withColumn("__neg", -F.col("v")), [],
                         "__neg", "id", n_tiles=4, bucket_width=5.0,
                         tile_col="tile")
    want = df.withColumn(
        "tile", F.ntile(4).over(W.orderBy(F.col("v").desc(), "id")))
    diff = (got.select("id", "tile")
            .exceptAll(want.select("id", "tile")))
    assert diff.count() == 0, diff.collect()


def test_cdc_fold_survives_long_documents(spark):
    """The chunking fold is one SQL aggregate expression per doc — make
    sure a 5,000-word document neither breaks codegen nor degrades to
    a wrong chunking: chunk count must equal the hand-derived boundary
    count and every word must land in exactly one chunk (sum of chunk
    word counts = doc words, checked via kept+dropped chunk text)."""
    import hashlib

    from mapreduce_wsi_spark.operators.curation import cdc_chunk_dedup

    words = [f"w{i % 611}x{i % 7}" for i in range(5000)]
    text = " ".join(words)

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 100

    boundaries = sum(1 for w in words[:-1] if bucket(w) < 25)
    expected = boundaries + 1  # last word is a boundary or not: the
    # trailing partial chunk exists iff it is not, and the closed
    # final chunk exists iff it is — either way one more than the
    # internal boundary count
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = cdc_chunk_dedup(df, "text", "doc_id",
                          boundary_pct=25).collect()[0]
    assert row["n_chunks"] == expected
    assert row["n_kept"] <= row["n_chunks"]


def test_char_ngram_repetition_kernel_matches_reference(spark):
    """r15: char_ngram_repetition moved from interpreted Catalyst HOFs
    to a batched numpy kernel (uint64-packed Latin-1 fast path +
    general-unicode lexsort path). Pin both paths against a
    brute-force Python reference of the original definition: union
    length of [p, p+n) over starts whose n-gram occurs >= 2x in the
    doc — including NULL text, docs shorter than n, heavy
    overlap, cross-batch independence, and non-Latin codepoints
    (which force the general path for their batch)."""
    from mapreduce_wsi_spark.operators.curation import (
        char_ngram_repetition,
    )

    def ref(s, n=8):
        if s is None:
            return None, 0
        grams = {}
        for i in range(len(s) - n + 1):
            grams.setdefault(s[i:i + n], []).append(i)
        starts = sorted(p for ps in grams.values() if len(ps) >= 2
                        for p in ps)
        tot, fst, lst = 0, None, None
        for p in starts:
            if lst is None or p - lst > n:
                if lst is not None:
                    tot += lst - fst + n
                fst = lst = p
            else:
                lst = p
        if lst is not None:
            tot += lst - fst + n
        return len(s), tot

    docs = [
        (1, "abcdefghij" * 30),              # heavy overlap, merged runs
        (2, "xyz"),                          # shorter than n
        (4, None),                           # NULL text
        (5, "The quick brown fox jumps over the lazy dog again and "
            "again The quick brown fox"),
        (6, "日本語テキストの重複日本語テキストの重複と少し違う部分"),  # non-Latin
        (7, "mixed ascii と unicode mixed ascii と unicode tail"),
        (8, "a" * 7 + "b" + "a" * 7),        # near-miss windows
        (9, "0123456789abcdef0123456789abcdef0123456789abcdef"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           char_ngram_repetition(df, "text", "doc_id").collect()}
    assert len(got) == len(docs)
    for doc_id, s in docs:
        n_chars, nd = ref(s)
        r = got[doc_id]
        assert r["n_chars"] == n_chars, (doc_id, r)
        if n_chars:
            import decimal
            want = float(decimal.Decimal(repr(nd / n_chars)).quantize(
                decimal.Decimal("1e-9"),
                rounding=decimal.ROUND_HALF_UP))
            assert r["dup_char_frac"] == want, (doc_id, nd, r)
        else:
            assert r["dup_char_frac"] is None, (doc_id, r)
