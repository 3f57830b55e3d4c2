"""Text analysis operators for training-data pipelines (north-star
extension): token statistics, quality scoring, language ID, fingerprinting.

All pure DataFrame expressions (no Python in the row path); each has a
DuckDB-oracle twin registered in plans/q_llm.py. Regex classes stay ASCII
(\\w, \\s) where Java regex and RE2 agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the heuristic language ID.
# Order matters: ties resolve to the first language in this list.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "de", "los", "y", "que"),
    "fr": ("le", "les", "des", "et", "une", "dans"),
    "zh": ("de", "shi", "bu", "le", "wo"),
}

# BPE-ish pre-tokenization: word runs or single non-space punctuation.
TOKEN_REGEX = r"\w+|[^\w\s]"

# GPT-2-style pre-tokenizer, lookahead-free: space-prefixed letter runs,
# digit runs, punctuation runs, or bare space runs. RE2 (DuckDB) has no
# lookahead, so the canonical `\s+(?!\S)` tail is dropped; the explicit
# ASCII classes are the subset where Java regex and RE2 agree exactly
# (alternatives are mutually exclusive at any start position, so
# first-match and longest-match semantics coincide).
BPE_PRETOKEN_REGEX = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"


def bpe_pretokenize(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """GPT-2-style pre-tokenization (the split a BPE tokenizer merges
    within): per doc the token count and an order-sensitive md5 over the
    full token sequence — the md5 pins the exact split points, not just
    the count. One JVM-side regex pass, no explode, no shuffle; at 100 TB
    this is a map-only stage that chains straight into pack/shard."""
    toks = F.regexp_extract_all(F.col(text_col),
                                F.lit(BPE_PRETOKEN_REGEX), 0)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("int").alias("n_bpe_tokens"),
        F.md5(F.array_join(toks, "|")).alias("tok_md5"))


def words(c: Column) -> Column:
    return F.split(c, " ")


def stopword_hits(c: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of words that are in the given stopword set (array filter —
    no explode, no shuffle)."""
    arr = ", ".join(f"'{w}'" for w in stopwords)
    return F.size(F.filter(words(c), lambda w: w.isin(*stopwords))).cast("int")


def duplicate_spans(df: DataFrame, text_col: str, id_col: str,
                    n: int = 5) -> DataFrame:
    """Substring-level duplication profile — the distributed core of
    training-data substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): every length-``n``
    word span is counted CORPUS-WIDE (within-document repeats included);
    a span occurring more than once anywhere is duplicated, and each
    document reports how many of its span positions are duplicated.
    Downstream policy (drop doc / cut span) composes on top.

    Plan: per-position spans via transform-over-sequence (no UDF, no
    per-span row until the single explode), corpus-wide occurrence
    counts via groupBy(span) + join-back. The r5 form used a count
    WINDOW partitioned by span ("one shuffle, no join-back") — wrong
    at scale (r9 audit): a window partition is unsplittable, so a
    boilerplate-grade hot span (the EXPECTED input of substring dedup
    — a license header at 100 TB is ~1e9 occurrences) buffers its
    whole group through one task. The groupBy's map-side combine
    parallelizes the hot span's counting (one partial row per map
    task), and the join-back is an equi-join AQE's skew handling CAN
    split — the shape that survives the skewed corpus the operator
    exists for. At 100 TB the span string would additionally be
    xxhash64-compressed before the shuffles (8-byte keys,
    collision-negligible); the string form is kept here so external
    engines can audit the spans themselves.

    Returns (id_col, n_spans, n_dup_spans, dup_frac); documents with
    fewer than ``n`` words have no spans and are excluded (the shingle
    convention)."""
    w = words(F.col(text_col))
    pos = (df.select(F.col(id_col), w.alias("__w"))
           .filter(F.size("__w") >= n)
           .select(F.col(id_col), F.explode(F.transform(
               F.sequence(F.lit(1), F.size("__w") - (n - 1)),
               lambda i: F.concat_ws(" ", F.slice("__w", i, n))))
               .alias("span")))
    dup_spans = (pos.groupBy("span")
                 .agg(F.count(F.lit(1)).alias("__c"))
                 .filter(F.col("__c") > 1).select("span"))
    c = (pos.join(dup_spans.withColumn("__dup", F.lit(1)),
                  "span", "left"))
    dup = F.sum(F.when(F.col("__dup").isNotNull(), 1).otherwise(0))
    return (c.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_spans"),
                 dup.cast("int").alias("n_dup_spans"))
            .withColumn("dup_frac",
                        F.col("n_dup_spans") / F.col("n_spans")))


def strip_duplicate_spans(df: DataFrame, text_col: str, id_col: str,
                          n: int = 5) -> DataFrame:
    """The cut step of substring-level dedup (Lee et al. 2022): remove
    every token covered by a corpus-wide-duplicated length-``n`` span
    and return the cleaned text. ``duplicate_spans`` profiles; this one
    edits.

    Plan: the same skew-splittable groupBy(span) + join-back as
    ``duplicate_spans`` (positions kept through the join; the r5
    count-window form funneled every occurrence of a hot span through
    one unsplittable window partition — see duplicate_spans), then
    each doc's duplicated START positions aggregate to one small array
    and the removal mask is pure array arithmetic — token ``j`` goes
    iff some start ``s`` satisfies ``s <= j < s + n`` — so the edit
    itself is map-side with no token-level join. Per-token cost is
    O(|dup starts|); pathological docs that are all duplicates stay
    O(tokens^2 / n) row-locally, bounded by the doc length cap any
    corpus pipeline carries. Returns (id, n_tokens, n_removed,
    text_clean); docs shorter than ``n`` words pass through
    unedited."""
    w = words(F.col(text_col))
    base = df.select(F.col(id_col), w.alias("__w"))
    spans = (base.filter(F.size("__w") >= n)
             .select(F.col(id_col), F.posexplode(F.transform(
                 F.sequence(F.lit(1), F.size("__w") - (n - 1)),
                 lambda i: F.concat_ws(" ", F.slice("__w", i, n))))
                 .alias("__p", "span")))
    dup_spans = (spans.groupBy("span")
                 .agg(F.count(F.lit(1)).alias("__c"))
                 .filter(F.col("__c") > 1).select("span"))
    dup_starts = (spans.join(dup_spans, "span")
                  .groupBy(id_col)
                  .agg(F.collect_list(F.col("__p") + 1).alias("__starts")))
    joined = (base.join(dup_starts, on=id_col, how="left")
              .withColumn("__starts", F.coalesce(
                  "__starts", F.array().cast("array<int>"))))
    removed = lambda j: F.exists(  # noqa: E731
        "__starts", lambda s: (s <= j) & (j < s + n))
    kept = F.filter(F.sequence(F.lit(1), F.size("__w")),
                    lambda j: ~removed(j))
    return joined.select(
        F.col(id_col),
        F.size("__w").cast("int").alias("n_tokens"),
        (F.size("__w") - F.size(kept)).cast("int").alias("n_removed"),
        F.array_join(F.transform(kept, lambda j: F.element_at("__w", j)),
                     " ").alias("text_clean"))


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace + regex token counts, char counts, mean token length."""
    t = F.col(text_col)
    n_ws = F.size(words(t)).cast("int")
    return df.select(
        F.col(id_col),
        n_ws.alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)).cast("int")
        .alias("n_re_tokens"),
        F.length(t).cast("int").alias("n_chars"),
        (F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double") / n_ws)
        .alias("mean_tok_len"))


def quality_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality features + composite score in [0, ~1]:
    stopword ratio (fluency proxy), punctuation/digit density, length band.
    Deterministic double arithmetic, fixed evaluation order."""
    t = F.col(text_col)
    n_ws = F.size(words(t)).cast("int")
    n_chars = F.length(t).cast("int")
    n_stop = stopword_hits(t, LANG_STOPWORDS["en"])
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    stop_ratio = n_stop.cast("double") / n_ws
    punct_ratio = n_punct.cast("double") / n_chars
    digit_ratio = n_digit.cast("double") / n_chars
    len_ok = F.when((n_ws >= 10) & (n_ws <= 100000), 1.0).otherwise(0.0)
    score = (stop_ratio * 0.4 + (F.lit(1.0) - punct_ratio) * 0.3
             + (F.lit(1.0) - digit_ratio) * 0.1 + len_ok * 0.2)
    return df.select(
        F.col(id_col), n_ws.alias("n_words"),
        stop_ratio.alias("stop_ratio"), punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"), score.alias("quality_score"))


def unigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Unigram-LM quality signal — the statistical-filter shape of
    CCNet-style corpus scoring with the corpus itself as the LM:
    ``P(tok) = count(tok) / total`` and each document scores the mean
    log-probability of its tokens (low = rare-token soup / noise,
    high = common fluent text; a held-out LM drops in by swapping the
    count table). Per-token ``ln`` is rounded to DECIMAL(28,9) BEFORE
    the per-doc aggregation (the BM25 exactness trick), so the mean is
    accumulation-order-free and cross-engine exact up to one final IEEE
    division. Plan: one vocab-sized count aggregation, totals broadcast
    (1 row), token->count equi-join, one doc rollup — two shuffles,
    both keyed by data (word / doc), nothing driver-side."""
    tok = df.select(F.col(id_col),
                    F.explode(words(F.col(text_col))).alias("w"))
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    scored = (tok.join(cnt, "w")
              .crossJoin(F.broadcast(tot))
              .withColumn("lp",
                          F.log(F.col("c").cast("double") / F.col("n"))
                          .cast("decimal(28,9)")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_tokens"),
                 (F.sum("lp").cast("double") / F.count(F.lit(1)))
                 .cast("double").alias("mean_logp")))


# Fixed logistic-model weights for the model-based quality gate: the
# published-weights stand-in for a fastText/CCNet-style quality
# classifier (features engineered here, coefficients would come from
# offline training). Swapping in trained weights changes literals only —
# the plan, schema and oracle convention are unchanged.
QUALITY_MODEL = {"bias": -1.2, "stop_ratio": 6.0, "punct_ratio": -4.0,
                 "digit_ratio": -2.0, "len_ok": 1.5}


def model_quality_score(df: DataFrame, text_col: str, id_col: str,
                        threshold: float = 0.5) -> DataFrame:
    """Model-based quality gate: logistic score over the engineered
    quality features (sigmoid of a fixed linear model, ``QUALITY_MODEL``)
    with a keep decision at ``threshold``. The trained-classifier shape
    of corpus filtering (CCNet / fastText quality gates) with the
    coefficients as plan literals: map-only, no UDF, no shuffle — at
    100 TB this fuses into the scan projection. The keep decision
    compares the score ROUNDED to 6dp, so the gate reproduces
    identically in any engine (exp is the only libm call; 1-ulp
    divergence dies in the round)."""
    w = QUALITY_MODEL
    feats = quality_scores(df, text_col, id_col)
    len_ok = F.when((F.col("n_words") >= 10)
                    & (F.col("n_words") <= 100000), 1.0).otherwise(0.0)
    z = (F.lit(w["bias"])
         + F.col("stop_ratio") * w["stop_ratio"]
         + F.col("punct_ratio") * w["punct_ratio"]
         + F.col("digit_ratio") * w["digit_ratio"]
         + len_ok * w["len_ok"])
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return feats.select(
        F.col(id_col), score.alias("model_score"),
        (score >= F.lit(threshold)).alias("keep"))


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: stopword-profile hit counts, first-max wins
    in LANG_STOPWORDS order (deterministic tie-break)."""
    t = F.col(text_col)
    scores = {lang: stopword_hits(t, sw) for lang, sw in LANG_STOPWORDS.items()}
    langs = list(LANG_STOPWORDS)
    pred = F.lit(langs[0])
    best = scores[langs[0]]
    for lang in langs[1:]:
        is_better = scores[lang] > best
        pred = F.when(is_better, F.lit(lang)).otherwise(pred)
        best = F.when(is_better, scores[lang]).otherwise(best)
    cols = [F.col(id_col)] + \
        [scores[lang].alias(f"score_{lang}") for lang in langs] + \
        [pred.alias("pred_lang")]
    return df.select(*cols)


def fingerprints(df: DataFrame, text_col: str, id_col: str,
                 n: int = 5) -> DataFrame:
    """Document fingerprints over word n-gram shingles:
    - fp_md5: lexicographic min of md5(shingle) — portable (oracle-checkable)
    - fp_xx:  min xxhash64(shingle) — the cheap engine-native variant
    Equal fingerprints => near-certain shared content prefix window."""
    from mapreduce_wsi_spark.operators.dedup import word_shingles
    sh = word_shingles(df, text_col, id_col, n)
    return (sh.groupBy(F.col("id").alias(id_col))
            .agg(F.min(F.md5(F.col("shingle"))).alias("fp_md5"),
                 F.min(F.xxhash64(F.col("shingle"))).alias("fp_xx")))


def term_components(df: DataFrame, text_col: str, id_col: str,
                    terms: tuple[str, ...]) -> DataFrame:
    """Exact per-(doc, term) retrieval components for a fixed query-term
    set: term frequency ``tf``, document length ``dl`` (in words).

    Zero-shuffle tf: for a small query vocabulary the count is an array
    filter per term (`size(filter(words, w == t))`) stacked into rows —
    no explode of the full token stream, no groupBy. The map-side cost is
    O(len(doc) * |terms|) with |terms| tiny; at 100 TB this is a pure
    scan-side projection that pipelines into whatever consumes it.

    Returns one row per (doc, term) with tf > 0.
    """
    w = words(F.col(text_col))

    def _is(term):
        # single-arg lambda: a 2-arg callable would make F.filter pass the
        # array INDEX as the second argument, shadowing the captured term
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(w, _is(t))).cast("int").alias(f"tf_{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = df.select(F.col(id_col), F.size(w).cast("int").alias("dl"),
                        *tf_cols)
    stack_args = ", ".join(f"'{t}', tf_{i}" for i, t in enumerate(terms))
    stacked = per_doc.select(
        F.col(id_col), F.col("dl"),
        F.expr(f"stack({len(terms)}, {stack_args}) AS (term, tf)"))
    return stacked.filter(F.col("tf") > 0)


def bm25_topk(df: DataFrame, text_col: str, id_col: str,
              terms: tuple[str, ...], k1: float = 1.2, b: float = 0.75,
              k: int = 20) -> DataFrame:
    """Okapi BM25 top-k document ranking for a fixed query-term set,
    as a pure DataFrame composition:

      scan -> per-term tf via array filter (no explode)    [map-side]
      -> df(term) over ~|terms| keys (tiny shuffle)        [broadcast back]
      -> N, avgdl one-row agg                              [broadcast]
      -> per-term score, decimal-rounded, summed per doc   [one shuffle]
      -> global top-k (TakeOrderedAndProject)

    The only data-sized shuffle is the per-doc score sum over docs that
    contain >=1 query term. Cross-engine determinism: each per-term score
    is one IEEE double expression (bit-identical across engines for
    identical inputs) rounded to DECIMAL(28,9) before the sum, so the
    per-doc total is exact decimal arithmetic — accumulation-order-free
    (see share_of_total for the same pattern). The single `ln` per
    (doc, term) is the one libm call; the 1e-9 rounding grain makes a
    cross-libm ULP straddle vanishingly unlikely (verified on fixtures).
    """
    comp = term_components(df, text_col, id_col, terms)
    stats = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size(words(F.col(text_col)))).cast("double")
         / F.count(F.lit(1))).alias("avgdl"))
    dfreq = comp.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    j = (comp.join(F.broadcast(dfreq), "term")
         .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tf_d = F.col("tf").cast("double")
    dl_ratio = F.col("dl").cast("double") / F.col("avgdl")
    tf_norm = (tf_d * F.lit(k1 + 1.0)) / \
        (tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_ratio))
    per_term = j.select(
        F.col(id_col),
        (idf * tf_norm).cast("decimal(28,9)").alias("s"))
    scored = (per_term.groupBy(id_col)
              .agg(F.sum("s").cast("double").alias("bm25")))
    return (scored.orderBy(F.col("bm25").desc(), F.col(id_col))
            .limit(k))


def inverted_index(df: DataFrame, text_col: str, id_col: str,
                   min_df: int = 1, max_df: int = 1 << 31) -> DataFrame:
    """Inverted index build: term -> document frequency ``df``, collection
    frequency ``cf``, and the sorted posting list (comma-joined string —
    portable across engines; production consumers keep the array).

    One shuffle in the default form: explode tokens, then a single
    groupBy(term) whose collect_set/count aggregates partial-combine
    map-side. Posting-list skew (stopword-grade terms appearing in
    every document) is the same hot-key story as shingle dedup: the
    ``max_df`` guard drops terms whose postings would be unboundedly
    long — at 100 TB an every-doc term's posting list is useless for
    retrieval anyway (idf ~ 0). When a real ``max_df`` is given, the
    guard is applied BEFORE the posting aggregation (r9 audit: the
    original post-filter form still MATERIALIZED the every-doc term's
    posting array in one aggregation buffer and only then dropped it —
    the exact OOM the guard exists to prevent): a distinct-pair df
    count finds the hot terms (a tiny, stopword-sized set) and a
    broadcast anti-join removes their tokens, so no aggregation state
    ever exceeds max_df ids. Costs one extra token-stream shuffle —
    only on the guarded path; the unguarded default keeps the
    single-shuffle plan.
    """
    toks = df.select(F.col(id_col).alias("_id"),
                     F.explode(words(F.col(text_col))).alias("term"))
    if max_df < (1 << 31):
        hot = (toks.distinct().groupBy("term")
               .agg(F.count(F.lit(1)).alias("__df"))
               .filter(F.col("__df") > max_df).select("term"))
        toks = toks.join(F.broadcast(hot), "term", "left_anti")
    inv = (toks.groupBy("term")
           .agg(F.count(F.lit(1)).alias("cf"),
                F.sort_array(F.collect_set("_id")).alias("post_arr")))
    return (inv.select(
        "term", F.size("post_arr").cast("long").alias("df"),
        F.col("cf"),
        F.concat_ws(",", F.col("post_arr").cast("array<string>"))
        .alias("postings"))
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df)))


def vocab_oov(df: DataFrame, text_col: str, id_col: str,
              vocab_size: int = 16) -> DataFrame:
    """Vocabulary-coverage analysis: build the top-``vocab_size``
    vocabulary by corpus frequency (ties broken on the token itself, so
    the vocab is deterministic across engines and partitionings), then
    score every document's out-of-vocabulary rate against it.

    The tokenizer-design primitive of a corpus pipeline: OOV rate against
    a candidate vocab decides vocab size / normalization rules before an
    expensive BPE train. Two shuffles total at any scale — one token
    count (partial-combine map-side) and one per-doc re-aggregation; the
    vocab itself is vocab_size rows and broadcast into the membership
    join, so the token stream is never shuffled by token a second time.
    The top-``vocab_size`` selection is ``orderBy().limit()``, which
    lowers to TakeOrderedAndProject (per-partition heaps + a
    vocab_size-row driver merge) — NOT a global row_number window,
    whose single-partition sort over the whole distinct-token
    dictionary is the anti-pattern prefix_filter_jaccard_pairs calls
    out.
    """
    toks = df.select(F.col(id_col).alias("_id"),
                     F.explode(words(F.col(text_col))).alias("token"))
    vocab = (toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy(F.desc("cnt"), F.col("token").asc())
             .limit(vocab_size)
             .select("token", F.lit(True).alias("__in_vocab")))
    scored = toks.join(F.broadcast(vocab), on="token", how="left")
    return (scored.groupBy(F.col("_id").alias(id_col))
            .agg(F.count(F.lit(1)).cast("int").alias("n_tokens"),
                 F.sum(F.when(F.col("__in_vocab").isNull(), 1)
                       .otherwise(0)).cast("int").alias("n_oov"))
            .withColumn("oov_rate",
                        F.col("n_oov").cast("double") / F.col("n_tokens")))


def normalize_url(url: Column) -> Column:
    """Canonicalize a URL for crawl-style dedup, entirely JVM-side:
    lowercase scheme+host, drop the port and fragment, strip trailing
    slashes from the path, and sort query parameters (so ``?b=2&a=1``
    and ``?a=1&b=2`` collapse). The convention is engine-portable — the
    DuckDB twin re-derives the same form with regexes only.
    """
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    path = F.regexp_replace(F.parse_url(url, F.lit("PATH")), "/+$", "")
    query = F.parse_url(url, F.lit("QUERY"))
    sorted_q = F.array_join(F.sort_array(F.split(query, "&")), "&")
    return F.concat(
        F.lit("https://"), host, path,
        F.when(query.isNotNull() & (query != ""),
               F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")))


def bigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Bigram-LM quality signal with add-one smoothing — the next rung
    above ``unigram_logprob``: ``P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1)
    / (c(w_{i-1}·) + V)`` with context counts from the bigram table and
    V the corpus unigram vocabulary. Scores each doc as the mean log
    conditional probability over its bigram positions (repetitive or
    formulaic text scores high, shuffled-word soup scores low even when
    every individual token is common — exactly what the unigram signal
    cannot see). Docs shorter than 2 tokens produce no rows.

    Same exactness discipline as unigram: per-bigram ``ln`` rounds to
    DECIMAL(28,9) before the doc mean, so accumulation order never
    shows. Plan: bigrams form row-locally (zip of two array slices, one
    explode), one bigram-count shuffle, one context-count shuffle, the
    1-row vocab size broadcast, one doc rollup.
    """
    arr = words(F.col(text_col))
    pairs = F.zip_with(
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    bg = (df.select(F.col(id_col), F.explode(pairs).alias("p"))
          .select(id_col, F.col("p.w1").alias("w1"),
                  F.col("p.w2").alias("w2")))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = (df.select(F.explode(words(F.col(text_col))).alias("w"))
         .agg(F.count_distinct("w").alias("v")))
    scored = (bg.join(c2, ["w1", "w2"]).join(c1, "w1")
              .crossJoin(F.broadcast(v))
              .withColumn("lp",
                          F.log((F.col("c2") + 1).cast("double")
                                / (F.col("c1") + F.col("v")))
                          .cast("decimal(28,9)")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_bigrams"),
                 (F.sum("lp").cast("double") / F.count(F.lit(1)))
                 .cast("double").alias("mean_logp")))


def phrase_occurrences(df: DataFrame, text_col: str, id_col: str,
                       w1: Column | None = None,
                       w2: Column | None = None) -> DataFrame:
    """Exact phrase search over a POSITIONAL index: token positions per
    doc, adjacency via a position self-join (``pos2 = pos1 + 1`` on the
    same doc) — the retrieval primitive an inverted index without
    positions cannot answer (bag-of-words matches "new york" and
    "york new" alike). With ``w1``/``w2`` omitted, searches the
    corpus's most frequent adjacent pair (computed in-plan,
    deterministic ties: count desc, then words) — a self-contained
    demonstration query; production callers pass the phrase.

    Returns (id, w1, w2, n_occurrences) for docs containing the phrase.
    Scale: the positional table is the inverted index plus one int; the
    adjacency join is keyed (doc, term) -> equi on (doc, pos+1), and a
    real deployment prunes it to the phrase's two posting lists first —
    exactly what the broadcast single-phrase filter here does.
    """
    pos = (df.select(F.col(id_col).alias("__id"),
                     F.posexplode(words(F.col(text_col)))
                     .alias("__pos", "__term")))
    a = pos.select(F.col("__id"), F.col("__pos"),
                   F.col("__term").alias("w1"))
    b = pos.select(F.col("__id").alias("__id2"),
                   (F.col("__pos") - 1).alias("__pos2"),
                   F.col("__term").alias("w2"))
    adj = a.join(b, (a["__id"] == b["__id2"]) & (a["__pos"] == b["__pos2"]))
    if w1 is None:
        top = (adj.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c"))
               .orderBy(F.desc("__c"), "w1", "w2").limit(1)
               .select("w1", "w2"))
        hits = adj.join(F.broadcast(top), ["w1", "w2"])
    else:
        hits = adj.filter((F.col("w1") == w1) & (F.col("w2") == w2))
    return (hits.groupBy(F.col("__id").alias(id_col), "w1", "w2")
            .agg(F.count(F.lit(1)).cast("int").alias("n_occurrences")))


# A small fixed BPE merge table (rank-ordered, most common English letter
# pairs): the published-weights stand-in for a trained tokenizer's merge
# list — swapping in a real learned table changes literals only, the
# apply machinery and oracle convention are unchanged.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t h", "th"), ("i n", "in"), ("e r", "er"), ("a n", "an"),
    ("r e", "re"), ("o n", "on"), ("s t", "st"), ("e n", "en"),
)


def bpe_apply_fixed(df: DataFrame, text_col: str, id_col: str,
                    merges: tuple[tuple[str, str], ...] = BPE_MERGES
                    ) -> DataFrame:
    """REAL BPE merge application with a fixed rank-ordered merge table:
    each word explodes to space-separated characters, then every merge
    applies exhaustively in rank order (exactly how production BPE
    tokenizers apply a learned table — rank by rank, left-to-right
    non-overlapping within a rank, which a global regexp_replace chain
    reproduces faithfully). Output per doc: the post-merge token count
    and an order-sensitive md5 over the full token sequence (word
    boundaries kept as '|'), pinning the exact segmentation.

    Map-only and JVM-side: the merge chain is a fixed expression tree
    inside one higher-order transform — no shuffle, no UDF; at 100 TB
    this fuses into the scan like the pre-tokenizer. A real 50k-merge
    vocabulary would lift the inner loop into a pandas UDF over a trie;
    the fixed-table form IS the algorithm, at demonstration width.
    """
    def merge_chain(w: Column) -> Column:
        c = F.regexp_replace(w, "(.)", "$1 ")     # a b c ...
        c = F.trim(c)
        for pat, rep in merges:
            c = F.regexp_replace(c, pat.replace(" ", " "), rep)
        return c

    toks = F.flatten(F.transform(
        words(F.col(text_col)),
        lambda w: F.split(merge_chain(w), " ")))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("int").alias("n_tokens"),
        F.md5(F.array_join(toks, "|")).alias("tok_md5"))


def nfc_normalize(df: DataFrame, text_col: str = "text",
                  out_col: str = "text_nfc") -> DataFrame:
    """Unicode NFC normalization (canonical composition) — the standard
    first step of corpus text hygiene: combining sequences ('e' +
    U+0301) fold to their precomposed forms ('é'), so dedup keys,
    shingles and token counts stop splitting on byte-level encoding
    accidents.

    Spark has no built-in normalizer, so this is the documented
    exception to the no-Python-in-the-row-path rule: an Arrow-batched
    pandas UDF over stdlib ``unicodedata`` — vectorized transfer, one
    C-backed normalize call per string, no shuffle (a pure projection
    that fuses over the scan). The DuckDB twin is its native
    nfc_normalize() (plans/q_eval.py pins md5 + codepoint-length
    equality on injected combining sequences)."""
    import pandas  # noqa: F401 — type-hint target for the UDF below
    from pyspark.sql.functions import pandas_udf

    def _nfc_fn(s):
        import unicodedata
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))

    # explicit annotations (resolvable without the module importing
    # pandas at top level, which the no-Python-row-path posture avoids)
    _nfc_fn.__annotations__ = {"s": pandas.Series,
                               "return": pandas.Series}
    _nfc = pandas_udf("string")(_nfc_fn)
    return df.withColumn(out_col, _nfc(F.col(text_col)))


def bpe_learn(df: DataFrame, text_col: str, n_merges: int = 6
              ) -> DataFrame:
    """REAL BPE merge LEARNING (Sennrich et al. 2016) — the training
    half of the tokenizer whose apply half is ``bpe_apply_fixed``:
    starting from characters, repeatedly count adjacent token pairs
    across the corpus and merge the most frequent one, ``n_merges``
    times. Output: the learned merge table (rank, left, right,
    pair_count), fully deterministic — exact integer counts, ties
    broken lexicographically on (left, right).

    Distributed exactly the way a 100 TB tokenizer build must be:
    the corpus collapses ONCE to the (word, freq) vocabulary (the
    classic BPE compression — rounds scale with |vocab|, not corpus
    size) and is persisted; each round is then (a) a vocabulary-sized
    adjacent-pair aggregation weighted by freq, (b) the argmax pair via
    orderBy+limit(1) — TakeOrderedAndProject, never a global sort —
    and (c) a map-only left-to-right non-overlapping merge of the
    winner folded over every word's token array (F.aggregate keeps it
    JVM-side; a token minted by this round's merge can never re-merge
    within the round because left+right != left for nonempty right,
    which is precisely the non-overlapping scan rule). Only the
    ``n_merges`` winner rows ever reach the driver — the same 1-row
    action budget as the JDBC bounds query (sources/jdbc.py:96).
    """
    from mapreduce_wsi_spark.util import literal_df

    spark = df.sparkSession
    learned = _bpe_learn_merges(df, text_col, n_merges)
    return literal_df(
        spark, learned,
        "rank int, left string, right string, pair_count bigint")


def _bpe_merge_fold(toks: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) -> a+b
    over a token array, as a JVM-side fold (see bpe_learn's docstring
    for the no-re-merge argument)."""
    return F.when(F.size(toks) < 2, toks).otherwise(
        F.aggregate(
            F.slice(toks, 2, F.size(toks) - 1),
            F.slice(toks, 1, 1),
            lambda acc, t: F.when(
                (F.element_at(acc, -1) == F.lit(a)) & (t == F.lit(b)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(a + b)))
            ).otherwise(F.concat(acc, F.array(t)))))


def _bpe_learn_merges(df: DataFrame, text_col: str, n_merges: int
                      ) -> list[tuple[int, str, str, int]]:
    """The bpe_learn training loop, returning the learned merges as
    Python tuples (rank, left, right, pair_count) — shared by
    ``bpe_learn`` (table output) and ``bpe_learn_and_apply``
    (tokenize-with-the-learned-table composition)."""
    from pyspark.storagelevel import StorageLevel

    wf = (df.select(F.explode(words(F.col(text_col))).alias("word"))
            .where(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("freq"))
            .select(F.split("word", "").alias("toks"), "freq"))
    wf = wf.persist(StorageLevel.MEMORY_AND_DISK)

    cur = wf
    learned: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = (cur
                 .where(F.size("toks") >= 2)
                 .select(F.explode(F.arrays_zip(
                     F.slice("toks", 1, F.size("toks") - 1).alias("a"),
                     F.slice("toks", 2, F.size("toks") - 1).alias("b")))
                     .alias("p"), "freq")
                 .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                 .agg(F.sum("freq").alias("cnt")))
        win = (pairs.orderBy(F.desc("cnt"), "a", "b").limit(1)
               .collect())  # 1 row/round: the learned merge itself
        if not win:
            break
        a, b, cnt = win[0]["a"], win[0]["b"], int(win[0]["cnt"])
        learned.append((rank, a, b, cnt))
        cur = cur.select(_bpe_merge_fold(F.col("toks"), a, b)
                         .alias("toks"), "freq")
        # k rounds stack k fold expressions; keep the lineage flat so
        # round k's pair scan doesn't re-run rounds 1..k-1 from wf
        if rank % 2 == 0 and rank < n_merges:
            cur = cur.localCheckpoint(eager=False)
    wf.unpersist()
    return learned


def bpe_learn_and_apply(df: DataFrame, text_col: str, id_col: str,
                        n_merges: int = 6) -> DataFrame:
    """End-to-end tokenizer TRAIN + APPLY: learn ``n_merges`` BPE
    merges from the corpus (``bpe_learn``), then tokenize every
    document with the learned table — the full production loop
    (sentencepiece train; tokenizers encode) as one composed operator.

    The apply stage replays the learned merges, in rank order, over a
    \\x1f-BOUNDED string form of the document (every token wrapped in
    \\x1f, words joined by a space): ``replace(s, sep+a+sep+sep+b+sep,
    sep+ab+sep)`` is EXACTLY the trainer's left-to-right
    non-overlapping word-internal merge (the equivalence the oracle
    already relies on — cross-word pairs can't match because the word
    joint is 'sep SPACE sep', and literal replace has no regex false
    matches). One cheap string op per learned merge over the whole doc
    — NOT a per-word nested array fold, whose interpreted
    re-evaluation per reference measured ~4^n_merges blowup — and the
    merges are plan literals, so tokenization fuses into the scan
    exactly like ``bpe_apply_fixed``. Output per doc: post-merge token
    count and an order-sensitive md5 over the full segmentation ('|'
    between tokens, '||' between words).

    The separator-bounded encoding requires the corpus to be free of
    U+001F; a literal \\x1f inside a word would corrupt separator runs
    and silently diverge from the trainer's fold semantics. Enforced,
    not just documented: U+001F is stripped from the text on BOTH the
    train and apply sides (same char stream to both), so the invariant
    holds for any input (ADVICE r6)."""
    clean = F.replace(F.col(text_col), F.lit("\x1f"), F.lit(""))
    df = df.withColumn(text_col, clean)
    learned = _bpe_learn_merges(df, text_col, n_merges)
    return bpe_apply_learned(df, text_col, id_col, learned)


def bpe_apply_learned(df: DataFrame, text_col: str, id_col: str,
                      learned) -> DataFrame:
    """Apply a LEARNED merge table (``_bpe_learn_merges`` tuples) to
    ``df`` — the apply half of ``bpe_learn_and_apply``, factored (r13)
    so a table trained on one split can tokenize another (the
    transfer/held-out measurement every production tokenizer gets).
    ``df``'s text must already be U+001F-free (the caller strips it;
    ``bpe_learn_and_apply`` does so before training for the same char
    stream on both sides)."""
    sep = "\x1f"

    wlist = F.filter(words(F.col(text_col)), lambda w: w != "")
    s = F.array_join(
        F.transform(wlist, lambda w: F.concat(
            F.lit(sep),
            F.array_join(F.split(w, ""), sep + sep),
            F.lit(sep))),
        " ")
    for _, a, b, _cnt in learned:
        s = F.replace(s, F.lit(sep + a + sep + sep + b + sep),
                      F.lit(sep + a + b + sep))
    # tokens = words + inner separators; segmentation string derives
    # from the merged form by rewriting 'sep sep'->'|' (in-word) then
    # 'sep SPACE sep'->'||' (word joints) and trimming the edge seps
    n_inner = F.length(s) - F.length(F.replace(s, F.lit(sep + sep),
                                               F.lit(sep)))
    seg = F.btrim(
        F.replace(F.replace(s, F.lit(sep + sep), F.lit("|")),
                  F.lit(sep + " " + sep), F.lit("||")),
        F.lit(sep))
    return df.select(
        F.col(id_col),
        (F.size(wlist) + n_inner).cast("int").alias("n_tokens"),
        F.md5(seg).alias("tok_md5"))


def kneser_ney_logprob(df: DataFrame, text_col: str, id_col: str,
                       discount: float = 0.75) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    Chen & Goodman 1998 interpolated form with a fixed discount D) —
    the production-grade smoothing rung above ``bigram_logprob``'s
    add-one:

        P(w2|w1) = max(c(w1 w2) - D, 0) / c(w1 .)
                 + D * N1+(w1 .) / c(w1 .) * N1+(. w2) / N1+(. .)

    where N1+(w1 .) counts distinct continuations of w1, N1+(. w2)
    counts distinct left-contexts of w2 (the "how many ways can this
    word appear" continuation probability that makes KN famous:
    'francisco' may be frequent but only ever follows 'san', so its
    continuation mass is tiny), and N1+(. .) is the distinct-bigram
    total. Scores each doc as the mean log probability over its bigram
    positions; the LM is the corpus itself (every scored bigram is
    seen, so the discount term is always positive — the interpolation
    weight still redistributes mass by context diversity).

    Determinism: the probability is one FIXED double expression shape
    over exact integer counts (identical IEEE ops in any engine), its
    ``ln`` rounds to DECIMAL(28,9) before the doc mean. Plan: bigrams
    row-locally, c(w1 w2) one groupBy(w1, w2), c(w1 .) + N1+(w1 .) in
    ONE groupBy(w1) aggregate (count + count_distinct), N1+(. w2) one
    groupBy(w2), the 1-row bigram-total broadcast, then equi-joins back
    on the bigram keys and one doc rollup — every shuffle keyed by
    data, nothing driver-side.
    """
    arr = words(F.col(text_col))
    pairs = F.zip_with(
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    bg = (df.select(F.col(id_col), F.explode(pairs).alias("p"))
          .select(id_col, F.col("p.w1").alias("w1"),
                  F.col("p.w2").alias("w2")))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    left = bg.groupBy("w1").agg(
        F.count(F.lit(1)).alias("c1"),
        F.count_distinct("w2").alias("n1fwd"))
    right = bg.groupBy("w2").agg(
        F.count_distinct("w1").alias("n1back"))
    tot = (bg.select("w1", "w2").distinct()
           .agg(F.count(F.lit(1)).alias("ntot")))
    d = F.lit(float(discount))
    prob = (F.greatest(F.col("c2") - d, F.lit(0.0))
            / F.col("c1")
            + d * F.col("n1fwd") / F.col("c1")
            * (F.col("n1back") / F.col("ntot")))
    scored = (bg.join(c2, ["w1", "w2"]).join(left, "w1")
              .join(right, "w2").crossJoin(F.broadcast(tot))
              .withColumn("lp", F.log(prob).cast("decimal(28,9)")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_bigrams"),
                 (F.sum("lp").cast("double") / F.count(F.lit(1)))
                 .cast("double").alias("mean_logp")))


def char_entropy(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document Shannon character entropy — the
    compression-ratio-class quality signal (RefinedWeb/Gopher-style
    repetition filters): near-zero entropy means the doc is one
    character stuttered, low entropy flags boilerplate/keyboard-mash,
    natural prose lands in a narrow band. H = -sum_c p_c ln p_c over
    the doc's own character distribution.

    Entirely MAP-ONLY: the character histogram is row-local higher-
    order array math (distinct chars x occurrence counts via
    filter-size — O(distinct * len) per row, bounded by any corpus
    length cap), no explode, no shuffle; at 100 TB this fuses into the
    scan like the other quality gates. Each -p ln p term rounds to
    DECIMAL(28,9) before the row-local sum, so the value is identical
    in any engine regardless of the distinct-char enumeration order."""
    chars = F.split(F.col(text_col), "")
    n = F.size(chars)
    # each term rounds to DECIMAL(28,9) then scales to exact integer
    # NANOS — Spark's array-fold needs a fixed accumulator type and
    # decimal addition widens (38,9)+(28,9) -> (38,8), silently losing
    # the 9th digit; long nanos keep the fold exact and portable.
    # The O(distinct x len) filter-count runs ONCE per distinct char
    # (an inner counts array), not twice inside the term expression —
    # the interpreted-HOF scan is the whole cost of this operator
    # (measured 7.6 -> 4.0 s at sf0.1 from this change alone).
    counts = F.transform(
        F.array_distinct(chars),
        lambda c: F.size(F.filter(chars, lambda x: x == c)))
    terms = F.transform(
        counts,
        lambda k: ((-(k / n) * F.log(k / n)).cast("decimal(28,9)")
                   * F.lit(1000000000)).cast("long"))
    total = F.aggregate(terms, F.lit(0).cast("long"),
                        lambda acc, t: acc + t)
    return df.select(
        F.col(id_col),
        n.cast("int").alias("n_chars"),
        F.size(F.array_distinct(chars)).cast("int").alias("n_distinct"),
        (total / F.lit(1000000000.0)).alias("entropy"))


def perplexity_buckets(df: DataFrame, text_col: str, id_col: str,
                       lang_col: str,
                       thresholds: tuple[float, float] = (3.40, 3.41)
                       ) -> DataFrame:
    """CCNet-style perplexity partition (Wenzek et al. 2020): score
    every document's unigram cross-entropy under the corpus LM, cut
    the corpus into head / middle / tail quality buckets at FIXED
    thresholds (in CCNet the cutoffs come from a reference Wikipedia
    LM and are deployment constants — exactly how they enter here: as
    plan literals, not a data-dependent global quantile, so the
    operator stays map-side after the LM join), and report the
    (lang, bucket) composition — the table a curation run reads to
    decide per-language sampling rates.

    Exactness: per-token ln rounds to DECIMAL(28,9) before the doc
    mean (the unigram_logprob idiom); the per-doc cross-entropy then
    re-rounds to DECIMAL(18,9) before the bucket-level mean, so both
    aggregation layers are order-free and the bucket boundary compare
    sees identical doubles on any engine. Shuffles: vocab count, doc
    rollup, |langs x 3| final agg — all data-keyed."""
    tok = df.select(F.col(id_col), F.col(lang_col),
                    F.explode(words(F.col(text_col))).alias("w"))
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    scored = (tok.join(cnt, "w")
              .crossJoin(F.broadcast(tot))
              .withColumn("lp",
                          F.log(F.col("c").cast("double") / F.col("n"))
                          .cast("decimal(28,9)")))
    doc = (scored.groupBy(id_col, lang_col)
           .agg(F.count(F.lit(1)).alias("n_tokens"),
                (-(F.sum("lp").cast("double")) / F.count(F.lit(1)))
                .alias("xent")))
    t1, t2 = thresholds
    bucket = (F.when(F.col("xent") < t1, F.lit("head"))
              .when(F.col("xent") < t2, F.lit("middle"))
              .otherwise(F.lit("tail")))
    return (doc.select(F.col(lang_col), bucket.alias("ppl_bucket"),
                       F.col("n_tokens"),
                       F.round("xent", 9).cast("decimal(18,9)")
                       .alias("xent_dec"))
            .groupBy(lang_col, "ppl_bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 (F.sum("xent_dec").cast("double")
                  / F.count(F.lit(1))).alias("mean_xent")))


def hashed_tfidf(df: DataFrame, text_col: str, id_col: str,
                 n_buckets: int = 64) -> DataFrame:
    """Hashed TF-IDF feature vectors (the 'hashing trick',
    Weinberger et al. 2009) — the input representation for linear
    quality classifiers at corpus scale: words hash into a FIXED
    ``n_buckets``-dim space (no vocabulary table to build, ship, or
    join at serving time), tf-idf weights compute per (doc, bucket),
    and each document's vector L2-normalizes. Output one row per
    non-zero (doc_id, bucket): (tf, w) with w the normalized weight.

    Exact until the final division: idf = ln((N+1)/(df+1)) + 1 rounds
    to DECIMAL(18,9) once per bucket; tf * idf is exact decimal; the
    squared norm sums exact DECIMAL(31,18) terms per doc; only the
    w = tfidf / sqrt(norm) step is float, mirrored operation by
    operation in the oracle. Plan: one (doc, bucket) pre-aggregate
    (THE data-sized shuffle), a <= n_buckets-row df/idf aggregate off
    it (broadcast back), one doc-keyed norm window — the hashed gram
    pipeline shape shared with dsir_select."""
    from pyspark.sql import Window

    from mapreduce_wsi_spark.operators.pipeline import portable_bucket

    tok = df.select(F.col(id_col),
                    F.explode(words(F.col(text_col))).alias("w"))
    doc_bk = (tok.withColumn("bk", portable_bucket(F.col("w"), n_buckets))
              .groupBy(id_col, "bk")
              .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = doc_bk.groupBy("bk").agg(F.count(F.lit(1)).alias("df"))
    ndocs = df.agg(F.countDistinct(id_col).alias("n_docs"))
    idf = (dfreq.crossJoin(F.broadcast(ndocs))
           .select("bk",
                   (F.log((F.col("n_docs") + 1).cast("double")
                          / (F.col("df") + 1)) + 1)
                   .cast("decimal(18,9)").alias("idf")))
    weighted = (doc_bk.join(F.broadcast(idf), "bk")
                .withColumn("tfidf",
                            (F.col("tf").cast("decimal(9,0)")
                             * F.col("idf")).cast("decimal(15,9)")))
    w_norm = Window.partitionBy(id_col)
    sq = (F.col("tfidf") * F.col("tfidf"))  # (15,9)^2 -> (31,18) exact
    out = weighted.withColumn("norm_sq", F.sum(sq).over(w_norm))
    return out.select(
        F.col(id_col), F.col("bk"), F.col("tf"),
        (F.col("tfidf").cast("double")
         / F.sqrt(F.col("norm_sq").cast("double"))).alias("w"))


def winnow_fingerprints(df: DataFrame, text_col: str, id_col: str,
                        k: int = 5, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): hash every char ``k``-gram, slide a ``w``-hash window,
    keep each window's minimum (rightmost on ties), dedupe the
    selections. The guarantee: any shared substring of length
    >= k + w - 1 between two documents yields at least one shared
    fingerprint, with expected density 2/(w+1) — the standard
    plagiarism / near-dup screening primitive.

    Engine-portable: gram hash is the 32-bit md5 prefix (same idiom as
    ``portable_bucket``); the rightmost-tie rule is encoded
    arithmetically as ``key = hash * 2^31 + (2^31 - 1 - pos)`` so ONE
    ``min()`` window aggregate picks (min hash, max pos) — no struct
    ordering semantics to match across engines. Docs shorter than
    k + w - 1 grams still emit >= 1 fingerprint (the frame truncates;
    window starts are capped at max(1, n_grams - w + 1)).

    Scale: one doc-keyed shuffle for the ordered window; selection +
    dedup stay in that partitioning. No self-joins, no driver state;
    at 100 TB this is the cheap first pass BEFORE any pairwise join
    (two docs sharing a fingerprint equi-join on it downstream).
    """
    from pyspark.sql import Window

    m = F.lit(2147483648)  # 2^31: pos < 2^31 holds for any string
    n = F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1))
    g = (df.select(F.col(id_col), F.col(text_col).alias("_t"),
                   F.explode(F.sequence(F.lit(1), n)).alias("pos"))
         .select(id_col, "pos",
                 F.col("_t").substr(F.col("pos"), F.lit(k)).alias("gram")))
    h = g.select(
        id_col, "pos",
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
        .cast("long").alias("hv"))
    keyed = h.select(
        id_col, "pos",
        (F.col("hv") * m + (m - 1 - F.col("pos"))).alias("key"),
        F.count(F.lit(1)).over(
            Window.partitionBy(id_col)).alias("n_grams"))
    win = (Window.partitionBy(id_col).orderBy("pos")
           .rowsBetween(0, w - 1))
    sel = (keyed
           .withColumn("mk", F.min("key").over(win))
           .where(F.col("pos")
                  <= F.greatest(F.col("n_grams") - (w - 1), F.lit(1)))
           .select(id_col, "mk").distinct())
    return sel.select(
        F.col(id_col),
        (m - 1 - F.col("mk") % m).cast("int").alias("pos"),
        F.expr("mk div 2147483648").alias("fp"))


def gopher_repetition(df: DataFrame, text_col: str, id_col: str,
                      top_n: int = 2, dup_n: int = 5,
                      top_thresh: float = 0.20,
                      dup_thresh: float = 0.15) -> DataFrame:
    """Gopher repetition-quality signals (Rae et al. 2021, appendix
    A1.1): per document, (a) the fraction of word characters covered by
    occurrences of the single most frequent word ``top_n``-gram and (b)
    the fraction of word characters inside ANY duplicated word
    ``dup_n``-gram, counting each covered word position once (the
    paper's no-double-count rule). ``keep`` applies the published
    thresholds (0.20 for top-2-grams, 0.15 for dup-5-grams).

    Character counts exclude separators (word chars only), so both
    fractions are exact integer ratios until the final division. The
    most-frequent tie breaks to the lexicographically smallest gram.

    Plan: posexplode words -> lead-window n-grams (one doc-keyed sort),
    (doc, gram) counts, the top-1 via one more doc-keyed window, and
    the dup coverage via explode(sequence) + distinct — every shuffle
    is keyed by doc or (doc, gram), so skew is bounded by document
    length, not corpus size."""
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col),
        F.posexplode(words(F.col(text_col))).alias("pos", "w"))
    wlen = tok.select(id_col, "pos", "w",
                      F.length("w").alias("wl"))
    total = (wlen.groupBy(id_col)
             .agg(F.sum("wl").alias("total_chars"),
                  F.count(F.lit(1)).alias("n_words")))

    ow = Window.partitionBy(id_col).orderBy("pos")

    def ngram(n):
        parts = [F.col("w")] + [F.lead("w", i).over(ow)
                                for i in range(1, n)]
        lens = [F.col("wl")] + [F.lead("wl", i).over(ow)
                                for i in range(1, n)]
        g = wlen.select(
            id_col, "pos",
            F.concat_ws(" ", *parts).alias("gram"),
            sum(lens[1:], lens[0]).alias("gram_chars"),
            F.lead("w", n - 1).over(ow).alias("_last"))
        return g.where(F.col("_last").isNotNull()).drop("_last")

    # (a) most frequent top_n-gram: chars over all its occurrences
    g_top = ngram(top_n)
    cnt = (g_top.groupBy(id_col, "gram", "gram_chars")
           .agg(F.count(F.lit(1)).alias("c")))
    w_rank = Window.partitionBy(id_col).orderBy(
        F.desc("c"), F.asc("gram"))
    top = (cnt.withColumn("rn", F.row_number().over(w_rank))
           .where(F.col("rn") == 1)
           .select(id_col,
                   (F.col("c") * F.col("gram_chars"))
                   .alias("top_cov_chars")))

    # (b) duplicated dup_n-grams: union of covered word positions
    g_dup = ngram(dup_n)
    dups = (g_dup.groupBy(id_col, "gram")
            .agg(F.count(F.lit(1)).alias("c"),
                 F.collect_list("pos").alias("ps"))
            .where(F.col("c") >= 2))
    covered = (dups
               .select(id_col, F.explode("ps").alias("p0"))
               .select(id_col, F.explode(
                   F.sequence(F.col("p0"),
                              F.col("p0") + (dup_n - 1))).alias("cp"))
               .distinct()
               .join(wlen.withColumnRenamed("pos", "cp"),
                     [id_col, "cp"])
               .groupBy(id_col)
               .agg(F.sum("wl").alias("dup_cov_chars")))

    out = (total
           .join(top, id_col, "left")
           .join(covered, id_col, "left")
           .select(
               F.col(id_col), "n_words",
               (F.coalesce("top_cov_chars", F.lit(0))
                / F.col("total_chars")).alias("top_ngram_frac"),
               (F.coalesce("dup_cov_chars", F.lit(0))
                / F.col("total_chars")).alias("dup_ngram_frac")))
    return out.withColumn(
        "keep", (F.col("top_ngram_frac") <= top_thresh)
        & (F.col("dup_ngram_frac") <= dup_thresh))


def mattr_diversity(df: DataFrame, text_col: str, id_col: str,
                    window: int = 25) -> DataFrame:
    """Moving-Average Type-Token Ratio (Covington & McFall 2010, J.
    Quant. Linguistics) — the length-robust lexical-diversity score
    (plain TTR shrinks with document length, so it can't rank docs of
    different sizes): slide a ``window``-word frame, take distinct/window
    per position, average the frames. Docs shorter than the window fall
    back to plain TTR (one frame = the whole doc).

    Plan: one doc-keyed ordered window; the per-frame distinct count is
    ``array_distinct(collect_list)`` over the frame — JVM-side array
    ops on a bounded (<= window) frame, no per-frame shuffle, no UDF.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col),
        F.posexplode(words(F.col(text_col))).alias("pos", "w"))
    fr = (Window.partitionBy(id_col).orderBy("pos")
          .rowsBetween(0, window - 1))
    frames = (tok
              .withColumn("n_words",
                          F.count(F.lit(1)).over(Window.partitionBy(id_col)))
              .withColumn("fdist",
                          F.size(F.array_distinct(
                              F.collect_list("w").over(fr))))
              .withColumn("fsize",
                          F.least(F.lit(window),
                                  F.col("n_words") - F.col("pos"))))
    valid = frames.where(
        F.col("pos") <= F.greatest(F.col("n_words") - window, F.lit(0)))
    return (valid.groupBy(id_col)
            .agg(F.max("n_words").cast("int").alias("n_words"),
                 F.avg(F.col("fdist") / F.col("fsize")).alias("mattr")))


def readability_fk(df: DataFrame, text_col: str,
                   id_col: str) -> DataFrame:
    """Flesch-Kincaid grade level (Kincaid et al. 1975) — the classic
    readability gate in text-quality filtering: 0.39*(words/sentences)
    + 11.8*(syllables/words) - 15.59. Counts are exact integers from
    one map-only projection: words by whitespace split, sentences as
    [.!?]+ runs (floor 1), syllables as [aeiouy]+ vowel groups per
    word with a per-word floor of 1 (the standard heuristic — no
    dictionary). The grade is one fixed IEEE expression over the three
    integers, 9dp-rounded; no shuffle, no UDF."""
    t = F.lower(F.col(text_col))
    words = F.split(t, " ")
    n_words = F.size(words)
    n_sent = F.greatest(
        F.lit(1),
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), "
                      f"'[.!?]+', 0)")))
    n_syl = F.expr(
        "aggregate(transform(split(lower({c}), ' '), "
        "w -> greatest(1, size(regexp_extract_all(w, '[aeiouy]+', 0)))), "
        "0, (a, v) -> a + v)".format(c=text_col))
    grade = (0.39 * (n_words.cast("double") / n_sent)
             + 11.8 * (n_syl.cast("double") / n_words) - 15.59)
    return df.select(
        F.col(id_col), n_words.alias("n_words"),
        n_sent.alias("n_sentences"), n_syl.alias("n_syllables"),
        F.round(grade, 9).alias("fk_grade"))
