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
