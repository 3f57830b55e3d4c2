"""Web-corpus curation operators (round-10 north-star tranche): URL
canonicalization + host-level dedup, cross-snapshot incremental dedup,
eval-contamination scoring, paragraph-level exact dedup, and Gopher-style
document quality gates.

Reference parity note: the reference (acgessler/mapreduce-wsi) provides no
native operators — every capability here is expressible only as user
map/reduce code behind its runMapReduce / runStreamingMapReduce escape
hatch (MapReduceWSI.java:61-105); the engine provides them natively per
the BASELINE.json north star (LLM training-data pipeline at 100 TB).

Scale posture shared by this module: no collects, no total-order windows
over unbounded keysets (per-doc windows are bounded by document length;
host/bucket groupBys partial-aggregate map-side), every pairwise op rides
an equi-join on a hash/shingle key, and the incremental (new-vs-old)
paths never re-pair the old corpus against itself — the whole point of
cross-snapshot dedup is that each crawl pays |new| x bands, not
|corpus|^2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tracking params dropped by canonical_url: the de-facto crawl set
# (Google Analytics utm_*, click ids, bare referrer tags). Kept as a
# regex so the DuckDB oracle twin can restate it verbatim.
TRACKING_PARAM_RE = r"^(utm_[a-z]+|ref|gclid|fbclid)="


def canonical_url(u: Column) -> Column:
    """Crawl-style URL canonicalization (RFC 3986 §6 syntax-based
    normalization plus the scheme/tracking conventions every crawler
    adds): lowercase host, strip a leading ``www.``, drop the port,
    drop the fragment, strip trailing path slashes, drop tracking query
    params (``TRACKING_PARAM_RE``), sort the surviving params, and pin
    the scheme to https (http/https are one document for dedup
    purposes). Pure JVM expression work — ``parse_url`` + regex + array
    ops — so canonicalization is a map-only stage at any scale."""
    host = F.regexp_replace(F.lower(F.parse_url(u, F.lit("HOST"))),
                            r"^www\.", "")
    path = F.regexp_replace(
        F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit("")), r"/+$", "")
    query = F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit(""))
    kept = F.array_join(
        F.array_sort(F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))), "&")
    return F.concat(F.lit("https://"), host, path,
                    F.when(kept == "", F.lit(""))
                    .otherwise(F.concat(F.lit("?"), kept)))


def canonical_host(u: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped (the host-level
    rollup key; ``parse_url`` HOST already excludes the port)."""
    return F.regexp_replace(F.lower(F.parse_url(u, F.lit("HOST"))),
                            r"^www\.", "")


def url_canonical_dedup(urls: DataFrame, url_col: str,
                        id_col: str) -> DataFrame:
    """Keep-first dedup by canonical URL: canonicalize, group by the
    canonical form, survivor = min id. Implemented as a groupBy +
    join-back (never a window over the canonical key: a hot canonical —
    a redirect target with millions of raw variants — partial-aggregates
    map-side under groupBy but would buffer through one window task).
    Returns (id, host, canon_url, keep, group_n)."""
    base = urls.select(
        F.col(id_col), canonical_host(F.col(url_col)).alias("host"),
        canonical_url(F.col(url_col)).alias("canon_url"))
    groups = (base.groupBy("canon_url")
              .agg(F.min(id_col).alias("__keep_id"),
                   F.count(F.lit(1)).alias("group_n")))
    return (base.join(groups, "canon_url")
            .select(id_col, "host", "canon_url",
                    (F.col(id_col) == F.col("__keep_id")).alias("keep"),
                    F.col("group_n").cast("bigint").alias("group_n")))


def cross_snapshot_exact(new_df: DataFrame, old_df: DataFrame,
                         text_col: str, id_col: str) -> DataFrame:
    """Incremental EXACT dedup of a new crawl snapshot against the
    standing corpus: a new doc is "carried" iff its normalized text hash
    already exists in the old snapshot. One hash equi-join; the old side
    ships only (hash, min id) — corpus text never moves. At 100 TB the
    old aggregate is itself large, so this stays a shuffle join (never a
    broadcast of the corpus); AQE picks the strategy when the old side
    is small. Returns (id, is_carried, matched_old)."""
    from mapreduce_wsi_spark.operators.dedup import normalize_text
    old_hashes = (old_df.select(
        F.md5(normalize_text(F.col(text_col))).alias("__h"),
        F.col(id_col).alias("__old_id"))
        .groupBy("__h").agg(F.min("__old_id").alias("matched_old")))
    new_hashed = new_df.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("__h"))
    return (new_hashed.join(old_hashes, "__h", "left")
            .select(id_col,
                    F.col("matched_old").isNotNull().alias("is_carried"),
                    "matched_old"))


def cross_snapshot_bloom(new_df: DataFrame, old_df: DataFrame,
                         text_col: str, id_col: str,
                         n_bits_log2: int = 20,
                         n_hashes: int = 2) -> DataFrame:
    """``cross_snapshot_exact`` with a Bloom prefilter on the NEW side —
    the steady-state shape when |new| << |corpus|: the old snapshot's
    hash set may be billions of strings, but its Bloom bit-position set
    is a bounded int set that broadcast-semi-joins against the new
    batch. Only Bloom survivors (true carries + false positives) reach
    the exact hash join, so the shuffled volume tracks the CARRY RATE,
    not the corpus size. Results are exactly
    ``cross_snapshot_exact``'s — the Bloom stage changes bytes shuffled,
    never answers (same contract as pipeline.decontaminate_bloom)."""
    from mapreduce_wsi_spark.operators.dedup import normalize_text
    m = 1 << n_bits_log2
    old_hashes = (old_df.select(
        F.md5(normalize_text(F.col(text_col))).alias("__h"),
        F.col(id_col).alias("__old_id"))
        .groupBy("__h").agg(F.min("__old_id").alias("matched_old")))
    new_hashed = new_df.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("__h"))
    survivors = new_hashed
    for k in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.col("__h"), F.lit(k)), F.lit(m))
        bits = old_hashes.select(
            F.pmod(F.xxhash64(F.col("__h"), F.lit(k)), F.lit(m))
            .alias(f"__pos{k}")).distinct()
        survivors = (survivors.withColumn(f"__pos{k}", pos)
                     .join(F.broadcast(bits), f"__pos{k}", "left_semi"))
    hits = (survivors.join(old_hashes, "__h")
            .select(id_col, "matched_old"))
    return (new_hashed.select(id_col).join(hits, id_col, "left")
            .select(id_col,
                    F.col("matched_old").isNotNull().alias("is_carried"),
                    "matched_old"))


def lsh_cross_candidates(sig_new: DataFrame, sig_old: DataFrame,
                         bands: int = 16, rows_per_band: int = 4,
                         max_bucket: int | None = None) -> DataFrame:
    """LSH banding BETWEEN two signature sets (new batch vs standing
    corpus): band-explode both sides, equi-join on (band_idx,
    band_hash). Cost is |new| x bands probe rows against a bucketed old
    side — never old x old, never new x old cross product. ``max_bucket``
    (same valve as dedup.lsh_candidate_pairs): an old-side bucket larger
    than the cap — a boilerplate cluster at web scale — contributes only
    its min-id representative instead of every member, bounding the
    per-bucket fan-out at |new_bucket| x 1 with the documented recall
    caveat. Returns distinct (doc_new, doc_old)."""
    def buckets(sig: DataFrame, out: str) -> DataFrame:
        band_arr = F.expr(
            f"transform(sequence(0, {bands - 1}), "
            f"b -> named_struct('band_idx', b, 'band_hash', "
            f"xxhash64(b, slice(signature, b * {rows_per_band} + 1, "
            f"{rows_per_band}))))")
        return (sig.select("id", F.explode(band_arr).alias("b"))
                .select(F.col("id").alias(out), "b.band_idx",
                        "b.band_hash"))
    new_b = buckets(sig_new, "doc_new")
    old_b = buckets(sig_old, "doc_old")
    if max_bucket is not None:
        sizes = (old_b.groupBy("band_idx", "band_hash")
                 .agg(F.count(F.lit(1)).alias("__bs"),
                      F.min("doc_old").alias("__rep")))
        old_b = (old_b.join(sizes, ["band_idx", "band_hash"])
                 .filter((F.col("__bs") <= max_bucket)
                         | (F.col("doc_old") == F.col("__rep")))
                 .select("doc_old", "band_idx", "band_hash"))
    return (new_b.join(old_b, ["band_idx", "band_hash"])
            .select("doc_new", "doc_old").distinct())


def incremental_minhash_pairs(new_df: DataFrame, old_df: DataFrame,
                              text_col: str, id_col: str, n: int = 3,
                              k: int = 64, bands: int = 16,
                              min_jaccard: float = 0.1,
                              max_bucket: int | None = 1000) -> DataFrame:
    """Cross-snapshot NEAR-dup detection: MinHash signatures on both
    snapshots (same seeded hash family, so signatures computed for the
    standing corpus in a previous run are reusable as-is), LSH banding
    across the two sets, exact n-gram-Jaccard verification of the
    candidates only. Incremental by construction: the old corpus is
    never banded against itself, and the verify join touches only
    candidate (new, old) pairs. Returns (doc_new, doc_old, jaccard >=
    min_jaccard)."""
    from mapreduce_wsi_spark.operators.dedup import (
        minhash_signatures, word_shingles)
    sig_new = minhash_signatures(new_df, text_col, id_col, n, k)
    sig_old = minhash_signatures(old_df, text_col, id_col, n, k)
    cands = lsh_cross_candidates(sig_new, sig_old, bands, k // bands,
                                 max_bucket)
    sh_new = word_shingles(new_df, text_col, id_col, n)
    sh_old = word_shingles(old_df, text_col, id_col, n)
    size_new = sh_new.groupBy("id").agg(F.count(F.lit(1)).alias("n_a"))
    size_old = sh_old.groupBy("id").agg(F.count(F.lit(1)).alias("n_b"))
    inter = (cands
             .join(sh_new.select(F.col("id").alias("doc_new"), "shingle"),
                   "doc_new")
             .join(sh_old.select(F.col("id").alias("doc_old"), "shingle"),
                   ["doc_old", "shingle"])
             .groupBy("doc_new", "doc_old")
             .agg(F.count(F.lit(1)).alias("inter")))
    return (inter
            .join(size_new.select(F.col("id").alias("doc_new"), "n_a"),
                  "doc_new")
            .join(size_old.select(F.col("id").alias("doc_old"), "n_b"),
                  "doc_old")
            .withColumn("jaccard", F.col("inter").cast("double")
                        / (F.col("n_a") + F.col("n_b") - F.col("inter")))
            .filter(F.col("jaccard") >= min_jaccard)
            .select("doc_new", "doc_old", "jaccard"))


def positional_shingles(df: DataFrame, text_col: str, id_col: str,
                        n: int = 5) -> DataFrame:
    """Word n-grams WITH their start position (1-based) — the
    contamination-coverage primitive (dedup.word_shingles drops
    positions because set ops don't need them). Returns (id, pos,
    shingle, n_words). Explode factor is ~1 row per word: linear."""
    words = F.split(F.col(text_col), " ")
    parts = ", ".join(f"element_at(__w, i + {j})" for j in range(n))
    gram_structs = F.expr(
        f"CASE WHEN size(__w) >= {n} THEN "
        f"transform(sequence(1, size(__w) - {n - 1}), "
        f"i -> named_struct('pos', i, 'shingle', "
        f"concat_ws(' ', {parts}))) "
        f"ELSE array() END")
    return (df.select(F.col(id_col).alias("id"), words.alias("__w"))
            .select("id", F.size("__w").alias("n_words"),
                    F.explode(gram_structs).alias("g"))
            .select("id", "n_words", "g.pos", "g.shingle"))


def contamination_token_fraction(corpus: DataFrame, bench: DataFrame,
                                 text_col: str, id_col: str,
                                 n: int = 5) -> DataFrame:
    """Per-document contamination SCORE (the PaLM/GPT-3 reporting form,
    beyond decontaminate's boolean hit): the fraction of a corpus doc's
    word positions covered by any n-gram it shares with the benchmark.
    Shared-shingle start positions expand to their n covered positions,
    counted once (distinct union — the no-double-count rule shared with
    gopher_repetition). Benchmark shingles broadcast; coverage explode
    is n x (hit shingles), not n x corpus. Returns (id, n_words,
    n_contam_tokens, contam_frac) for EVERY corpus doc (zero-hit docs
    included)."""
    from mapreduce_wsi_spark.operators.dedup import word_shingles
    c_sh = positional_shingles(corpus, text_col, id_col, n)
    b_sh = (word_shingles(bench, text_col, id_col, n)
            .select("shingle").distinct())
    covered = (c_sh.join(F.broadcast(b_sh), "shingle")
               .select("id", F.explode(F.sequence(
                   F.col("pos"), F.col("pos") + F.lit(n - 1)))
                   .alias("cp"))
               .distinct()
               .groupBy("id")
               .agg(F.count(F.lit(1)).alias("n_contam_tokens")))
    totals = corpus.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), " ")).alias("n_words"))
    return (totals.join(covered, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.col("n_words").cast("int").alias("n_words"),
                    F.coalesce("n_contam_tokens", F.lit(0)).cast("int")
                    .alias("n_contam_tokens"),
                    F.round(F.coalesce("n_contam_tokens", F.lit(0))
                            / F.col("n_words"), 9).alias("contam_frac")))


def contamination_longest_run(corpus: DataFrame, bench: DataFrame,
                              text_col: str, id_col: str,
                              n: int = 5) -> DataFrame:
    """Longest CONTIGUOUS contaminated stretch per corpus doc — the
    signal that separates a quoted benchmark item (one long run) from
    incidental phrase overlap (scattered singletons). Gaps-and-islands
    over shared-shingle start positions: pos - row_number() keys the
    island. The window partitions by doc id — unbounded key cardinality,
    per-partition size bounded by document length, so it is NOT in the
    bounded-key window-ceiling class (r9 audit taxonomy). Returns (id,
    n_hit_shingles, longest_run) for every corpus doc (0 when clean)."""
    from mapreduce_wsi_spark.operators.dedup import word_shingles
    c_sh = positional_shingles(corpus, text_col, id_col, n)
    b_sh = (word_shingles(bench, text_col, id_col, n)
            .select("shingle").distinct())
    hits = c_sh.join(F.broadcast(b_sh), "shingle").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    runs = (hits.withColumn("__isl", F.col("pos") - F.row_number().over(w))
            .groupBy("id", "__isl").agg(F.count(F.lit(1)).alias("__len"))
            .groupBy("id")
            .agg(F.sum("__len").alias("n_hit_shingles"),
                 F.max("__len").alias("longest_run")))
    return (corpus.select(F.col(id_col).alias("id"))
            .join(runs, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("n_hit_shingles", F.lit(0)).cast("int")
                    .alias("n_hit_shingles"),
                    F.coalesce("longest_run", F.lit(0)).cast("int")
                    .alias("longest_run")))


def paragraph_dedup(df: DataFrame, text_col: str, id_col: str,
                    para_words: int = 8) -> DataFrame:
    """Paragraph-granular exact dedup (the practical middle ground
    between doc-level dropDuplicates and full substring dedup): chunk
    each doc into fixed ``para_words``-word paragraphs, hash each, keep
    a paragraph only at its GLOBAL first occurrence (min (doc, chunk)
    in corpus order). First-occurrence selection is one min() aggregate
    over an arithmetic (doc, chunk) key — doc_id * 2^32 + chunk, exact
    in int64 for doc ids < 2^21 and engine-portable — never a global
    window. Returns per doc: (id, n_paras, n_kept, kept_frac)."""
    words = F.split(F.col(text_col), " ")
    paras = F.expr(
        f"transform(sequence(0, (size(__w) - 1) div {para_words}), "
        f"j -> named_struct('chunk', j, 'para', "
        f"concat_ws(' ', slice(__w, j * {para_words} + 1, {para_words}))))")
    exploded = (df.select(F.col(id_col).alias("id"), words.alias("__w"))
                .select("id", F.explode(paras).alias("p"))
                .select("id", "p.chunk", F.md5(F.col("p.para")).alias("h")))
    keyed = exploded.withColumn(
        "__k", F.col("id") * F.lit(4294967296) + F.col("chunk"))
    firsts = keyed.groupBy("h").agg(F.min("__k").alias("__first"))
    return (keyed.join(firsts, "h")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_paras"),
                 F.sum((F.col("__k") == F.col("__first")).cast("int"))
                 .alias("n_kept"))
            .select(F.col("id").alias(id_col),
                    F.col("n_paras").cast("int").alias("n_paras"),
                    F.col("n_kept").cast("int").alias("n_kept"),
                    F.round(F.col("n_kept") / F.col("n_paras"), 9)
                    .alias("kept_frac")))


def gopher_quality_flags(df: DataFrame, text_col: str,
                         id_col: str, stopwords: tuple[str, ...],
                         min_words: int = 5, max_words: int = 1000,
                         min_mwl: int = 3, max_mwl: int = 10) -> DataFrame:
    """Gopher document-quality gates (Rae et al. 2021, appendix A1.1 —
    the non-repetition rules; repetition lives in gopher_repetition):
    word count in [min_words, max_words] (paper: 50..100k, fixture-
    scaled), mean word length in [min_mwl, max_mwl], symbol-word ratio
    <= 0.1 (words with no alphabetic character), >= 80% of words contain
    an alphabetic character (the same signal from the keep side), and
    >= 2 stopword hits. All gates are multiplied-through integer
    comparisons on one map-only scan — no float ratios, no shuffle.
    Returns per doc the five booleans and the conjunctive keep."""
    t = F.col(text_col)
    w = F.split(t, " ")
    n_words = F.size(w)
    # sum of word lengths = chars minus separators (single-space corpus)
    sum_wl = F.length(t) - (n_words - F.lit(1))
    n_nonalpha = F.size(F.filter(w, lambda x: ~x.rlike("[a-zA-Z]")))
    n_stop = F.size(F.filter(w, lambda x: x.isin(*stopwords)))
    wc_ok = (n_words >= min_words) & (n_words <= max_words)
    mwl_ok = ((sum_wl >= min_mwl * n_words)
              & (sum_wl <= max_mwl * n_words))
    symbol_ok = n_nonalpha * 10 <= n_words
    alpha_ok = (n_words - n_nonalpha) * 5 >= n_words * 4
    stop_ok = n_stop >= 2
    return df.select(
        F.col(id_col), n_words.cast("int").alias("n_words"),
        wc_ok.alias("wc_ok"), mwl_ok.alias("mwl_ok"),
        symbol_ok.alias("symbol_ok"), alpha_ok.alias("alpha_ok"),
        stop_ok.alias("stop_ok"),
        (wc_ok & mwl_ok & symbol_ok & alpha_ok & stop_ok).alias("keep"))


def char_ngram_repetition(df: DataFrame, text_col: str, id_col: str,
                          n: int = 8) -> DataFrame:
    """Character-level duplicated-n-gram coverage (the char half of
    Gopher A1.1, complementing the word-level gopher_repetition): the
    fraction of a doc's characters covered by any char n-gram occurring
    >= 2 times WITHIN the doc, covered positions counted once. Explode
    is ~1 row per character — linear, partitioned by doc.

    Coverage counts by INTERVAL UNION, not a position explode: each
    duplicated gram start p covers [p, p+n-1]; two starts p1 <= p2
    yield contiguous coverage iff p2 - p1 <= n, so islands of the
    sorted duplicated starts (gaps-and-islands over a doc-keyed window
    — unbounded keyset, per-partition bounded by doc length) each
    contribute (last - first + n) characters. Identical count to the
    exploded-position distinct-union at a fraction of the shuffled
    rows (the x{n} coverage explode was the plan's top shuffle).

    r14 rewrite made this fully ROW-LOCAL (zero exchanges — both the
    duplicated-gram detection and the interval union are per-document
    facts, so the previous (id, gram)-window + island-window + join
    shape's corpus-sized exchanges are gone; guide §2.4). r15 moves the
    per-task work from interpreted Catalyst HOFs (array_sort of
    (g, pos) structs with a lambda comparator + per-element neighbor
    transforms — measured ~2.3 us per corpus CHARACTER) into one
    batched numpy kernel over mapInPandas (guide §4.2, the mm_*
    pattern): each Arrow batch concatenates its texts into a single
    UTF-32 codepoint array, finds duplicated (doc, n-gram) windows
    EXACTLY via np.unique over (doc_idx, window) rows (structured void
    view — no hashing, no collisions; Python len/UTF-32 == Spark
    length()/substring() codepoint semantics), and unions the
    [p, p+n-1] intervals vectorized (union = n + sum(min(gap, n)) over
    each doc's ascending duplicate starts — the same islands the
    Catalyst fold walked). Only (id, text) cross the Python boundary
    (projected first, §4.1), integer outputs only; the one IEEE
    division + round stays in Catalyst, so results are bit-identical
    (driver-checked vs the exploded-union oracle). Plan: scan ->
    MapInPandas -> project; still zero exchanges."""
    id_t = df.schema[id_col].dataType.simpleString()

    def stats(batches):
        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view
        for pdf in batches:
            m = len(pdf)
            texts = pdf[text_col]
            n_chars = np.empty(m, dtype=object)
            nd = np.zeros(m, dtype=np.int64)
            lens = np.zeros(m, dtype=np.int64)
            parts = []
            for i in range(m):
                s = texts.iat[i]
                if not isinstance(s, str):  # NULL text (None/NaN)
                    continue
                L = len(s)
                n_chars[i] = L
                lens[i] = L
                parts.append(s)
            codes = np.frombuffer(
                "".join(parts).encode("utf-32-le"), dtype=np.uint32)
            if codes.size >= n:
                doc_of = np.repeat(np.arange(m, dtype=np.int64), lens)
                gpos = np.arange(codes.size - n + 1)
                # a window is a real n-gram iff it lies inside one doc
                valid = doc_of[gpos] == doc_of[gpos + n - 1]
                vpos = gpos[valid]
                vdoc = doc_of[vpos]
                nw = codes.size - n + 1
                if n <= 8 and int(codes.max()) < 256:
                    # Latin-1 fast path: n codepoints < 2^8 pack
                    # BIJECTIVELY into one uint64 (exact, no hashing)
                    a = codes.astype(np.uint64)
                    key = np.zeros(nw, dtype=np.uint64)
                    for j in range(n):
                        key = (key << np.uint64(8)) | a[j:nw + j]
                    k = key[valid]
                    order = np.lexsort((k, vdoc))
                    ks, ds = k[order], vdoc[order]
                    eq = (ks[1:] == ks[:-1]) & (ds[1:] == ds[:-1])
                else:
                    # general unicode path: lexsort the raw codepoint
                    # columns (still exact, ~n x slower sort)
                    vw = sliding_window_view(codes, n)[valid]
                    order = np.lexsort(
                        tuple(vw[:, j] for j in range(n - 1, -1, -1))
                        + (vdoc,))
                    sw, ds = vw[order], vdoc[order]
                    eq = ((sw[1:] == sw[:-1]).all(axis=1)
                          & (ds[1:] == ds[:-1]))
                # a window is duplicated iff it equals a sort-neighbor
                # within the same doc
                dmask = np.r_[False, eq] | np.r_[eq, False]
                mask = np.zeros(vpos.size, dtype=bool)
                mask[order[dmask]] = True
                dpos, ddoc = vpos[mask], vdoc[mask]
                if dpos.size:
                    starts = np.nonzero(
                        np.r_[True, ddoc[1:] != ddoc[:-1]])[0]
                    within = np.r_[0, np.minimum(np.diff(dpos), n)]
                    within[starts] = 0
                    cross = np.zeros(dpos.size, dtype=np.int64)
                    cross[starts] = n
                    nd[ddoc[starts]] = np.add.reduceat(
                        within + cross, starts)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "n_chars": n_chars, "__nd": nd})

    kern = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        stats, f"{id_col} {id_t}, n_chars int, __nd long")
    return kern.select(F.col(id_col), "n_chars",
                       F.round(F.col("__nd") / F.col("n_chars"), 9)
                       .alias("dup_char_frac"))


def cdc_chunk_arr(df: DataFrame, boundary_pct: int = 25) -> DataFrame:
    """Content-defined chunking over the pre-split word array ``__w``
    (factored r11 so the cross-snapshot entries chunk both sides with
    literally the same expressions; staged r14): adds ``__chunks``, the
    per-document array of chunk texts. A word ENDS a chunk iff its
    portable md5 bucket < ``boundary_pct``. Map-only, no shuffle.

    r14 shape — boundary positions + slices, replacing the r11
    ``aggregate`` fold: the fold appended to its accumulator arrays
    with ``concat`` (a full copy per word — O(words^2) allocation per
    document in the interpreted HOF evaluator; a wash at fixture doc
    lengths of ~50 words, the asymptotic point at real page sizes).
    Now one indexed transform computes the boundary flags (the md5
    runs ONCE per word, as before), a small CASE closes the trailing
    chunk, and each chunk is a ``slice`` — O(words) total. Identical
    chunks:
    ends = flagged positions (+ the last word when unflagged), chunk i
    = words (prev_end, end].

    The multi-used intermediates (boundary positions, chunk ends) are
    LET-BOUND via single-element ``transform(array(<e>), x -> ...)[0]``
    lambdas, not projection aliases: Catalyst's projection collapse
    inlines aliases into consumers — including into per-ELEMENT lambda
    bodies, where ``ends[i - 1]`` re-evaluated the whole md5 transform
    once per chunk per reference (observed: a 52-copy md5 plan and a
    single task burning minutes interpreted). A lambda variable is
    bound once per row by construction, immune to optimizer
    inlining."""
    return df.withColumn("__chunks",
                         F.expr(_cdc_chunk_expr("__w", boundary_pct)))


def _cdc_chunk_expr(ref: str, boundary_pct: int = 25) -> str:
    """The cdc_chunk_arr chunk expression as a SQL string over an
    arbitrary input reference ``ref`` (a column name or an enclosing
    lambda variable) — factored r15 so row-local consumers (the
    edit-stability entry chunks an original AND an edited word array
    in ONE projection) can embed it under their own let-binders
    instead of layering withColumn projections whose aliases Catalyst
    may inline into lambda bodies (see cdc_chunk_arr's docstring)."""
    flag = (f"cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint) "
            f"% 100 < {boundary_pct}")
    bp = (f"filter(transform(ws, (w, i) -> "
          f"CASE WHEN {flag} THEN i + 1 END), p -> p IS NOT NULL)")
    be = (f"transform(array({bp}), bp -> "
          f"CASE WHEN size(bp) > 0 AND element_at(bp, -1) = size(ws) "
          f"THEN bp ELSE concat(bp, array(size(ws))) END)[0]")
    return (
        f"transform(array({ref}), ws -> "
        f"CASE WHEN size(ws) = 0 THEN array() ELSE "
        f"transform(array({be}), be -> "
        f"transform(be, (e, i) -> concat_ws(' ', slice(ws, "
        f"CASE WHEN i = 0 THEN 1 ELSE be[i - 1] + 1 END, "
        f"e - CASE WHEN i = 0 THEN 1 ELSE be[i - 1] + 1 END + 1))))[0] "
        f"END)[0]")


def cdc_chunks(df: DataFrame, text_col: str, id_col: str,
               boundary_pct: int = 25) -> DataFrame:
    """Per-document CDC chunk stream: (id, cid, h) — chunk ordinal and
    md5 of the chunk text. The shared primitive under cdc_chunk_dedup
    (within-corpus first-occurrence keep) and cdc_cross_snapshot
    (carry detection between crawls)."""
    base = df.select(F.col(id_col).alias("id"),
                     F.split(F.col(text_col), " ").alias("__w"))
    return (cdc_chunk_arr(base, boundary_pct)
            .select("id",
                    F.posexplode(F.col("__chunks")).alias("cid", "ctext"))
            .select("id", "cid", F.md5("ctext").alias("h")))


def cdc_cross_snapshot(new_df: DataFrame, old_df: DataFrame,
                       text_col: str, id_col: str,
                       boundary_pct: int = 25) -> DataFrame:
    """Chunk-level carry detection ACROSS crawl snapshots — the
    operation cdc_chunk_dedup's boundary stability exists for: chunk
    both snapshots with the same content-defined boundaries, then for
    every NEW document count how many of its chunks already exist
    anywhere in the OLD snapshot. Because boundaries are a pure
    function of content, an edited page re-chunks only around the
    edit, so carried_frac stays near 1 for lightly-edited recrawls
    (and the storage/dedup system only pays for the changed chunks).

    Scale: the old side collapses to DISTINCT chunk hashes before the
    join (partial-aggregated), the join is hash-equi on h — no
    pairwise anything. Returns (id, n_chunks, n_carried,
    carried_frac) for the new snapshot."""
    old_h = (cdc_chunks(old_df, text_col, id_col, boundary_pct)
             .select("h").distinct().withColumn("__hit", F.lit(1)))
    newc = cdc_chunks(new_df, text_col, id_col, boundary_pct)
    return (newc.join(old_h, "h", "left")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum(F.coalesce("__hit", F.lit(0))).alias("n_carried"))
            .select(F.col("id").alias(id_col),
                    F.col("n_chunks").cast("int").alias("n_chunks"),
                    F.col("n_carried").cast("int").alias("n_carried"),
                    F.round(F.col("n_carried") / F.col("n_chunks"), 9)
                    .alias("carried_frac")))


def cdc_chunk_dedup(df: DataFrame, text_col: str, id_col: str,
                    boundary_pct: int = 25) -> DataFrame:
    """Sentence-granular exact substring dedup via content-defined
    chunking (the rsync/LBFS boundary trick applied to text): a word
    ENDS a chunk iff its portable md5 bucket < ``boundary_pct``, so
    chunk boundaries are a pure function of content — insert a word
    into a doc and only the chunk containing it changes, unlike
    fixed-width paragraphs where every downstream chunk shifts. That
    stability is what makes chunk-level dedup meaningful across crawl
    snapshots of slightly-edited pages (mean chunk length =
    100/boundary_pct words).

    Chunking is ONE map-only fold per document (SQL ``aggregate`` over
    the word array — no explode-then-window, no shuffle until the
    first-occurrence groupBy); first-occurrence keep is a min()
    aggregate over the arithmetic (doc, chunk) int64 key, the
    paragraph_dedup convention (exact for doc ids < 2^21, engine-
    portable). Returns per doc: (id, n_chunks, n_kept, kept_frac)."""
    keyed = cdc_chunks(df, text_col, id_col, boundary_pct).withColumn(
        "__k", F.col("id") * F.lit(4294967296) + F.col("cid"))
    firsts = keyed.groupBy("h").agg(F.min("__k").alias("__first"))
    return (keyed.join(firsts, "h")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum((F.col("__k") == F.col("__first")).cast("int"))
                 .alias("n_kept"))
            .select(F.col("id").alias(id_col),
                    F.col("n_chunks").cast("int").alias("n_chunks"),
                    F.col("n_kept").cast("int").alias("n_kept"),
                    F.round(F.col("n_kept") / F.col("n_chunks"), 9)
                    .alias("kept_frac")))


def ccnet_paragraph_lm(corpus: DataFrame, ref: DataFrame, text_col: str,
                       id_col: str, para_words: int = 8,
                       cuts: tuple[float, float] = (3.39, 3.42)
                       ) -> DataFrame:
    """CCNet-style per-paragraph LM filtering (Wenzek et al. 2019,
    arXiv:1911.00359): score each PARAGRAPH of every document with a
    language model trained on a trusted reference partition, and bucket
    paragraphs head/middle/tail by cross-entropy — the granularity
    insight of CCNet is that quality filtering at paragraph level keeps
    the good half of a mixed-quality page instead of dropping the doc.

    The LM is an add-one-smoothed word unigram over the reference:
    p(w) = (c_ref(w) + 1) / (N_ref + V_ref), OOV words get the uniform
    1/(N_ref+V_ref) floor from the same formula at c=0. Per-word log
    probs are cast to DECIMAL(28,9) BEFORE summation so the per-
    paragraph cross-entropy is accumulation-order-independent and
    engine-identical (the mix_perplexity_target convention). Shuffles:
    one groupBy for the reference counts (partial-aggregated; vocab-
    sized result reused across the corpus), one token join against
    those counts (AQE broadcasts when vocab is small), one (doc, para)
    groupBy. No windows, no collects — the N+V scalar rides a 1-row
    broadcast. Returns per paragraph: (id, para, n_words, xent,
    bucket)."""
    rt = ref.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
    cnt = rt.groupBy("w").agg(F.count(F.lit(1)).alias("__c"))
    nv = (rt.agg(F.count(F.lit(1)).alias("__n"))
          .crossJoin(cnt.agg(F.count(F.lit(1)).alias("__v")))
          .select((F.col("__n") + F.col("__v")).alias("__nv")))
    paras = F.expr(
        f"transform(sequence(0, (size(__w) - 1) div {para_words}), "
        f"j -> named_struct('para', j, 'pw', "
        f"slice(__w, j * {para_words} + 1, {para_words})))")
    tok = (corpus.select(F.col(id_col).alias("id"),
                         F.split(F.col(text_col), " ").alias("__w"))
           .select("id", F.explode(paras).alias("p"))
           .select("id", F.col("p.para").alias("para"),
                   F.explode("p.pw").alias("w")))
    lp = (tok.join(cnt, "w", "left")
          .crossJoin(F.broadcast(nv))
          .select("id", "para",
                  F.log((F.coalesce(F.col("__c"), F.lit(0)) + 1)
                        .cast("double") / F.col("__nv"))
                  .cast("decimal(28,9)").alias("lp")))
    scored = (lp.groupBy("id", "para")
              .agg(F.count(F.lit(1)).alias("n_words"),
                   ((-F.sum("lp")).cast("double")
                    / F.count(F.lit(1))).alias("xent")))
    bucket = (F.when(F.col("xent") < cuts[0], "head")
              .when(F.col("xent") < cuts[1], "middle")
              .otherwise("tail"))
    return scored.select(F.col("id").alias(id_col), "para",
                         F.col("n_words").cast("int").alias("n_words"),
                         "xent", bucket.alias("bucket"))
