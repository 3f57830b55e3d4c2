"""Round-10 catalog tranche: web-corpus curation queries (north-star
extensions) — URL canonicalization + host-level dedup, cross-snapshot
incremental dedup, eval-contamination scoring, quota / PPS sampling,
Gopher & C4 quality gates, dedup audits/reports, and LLM-eval metrics.

Reference parity note: none of these exist in the reference
(acgessler/mapreduce-wsi) — its only analytics surface is user-supplied
map/reduce code behind runMapReduce / runStreamingMapReduce
(MapReduceWSI.java:61-105). They are the BASELINE.json north-star
surface (training-data pipeline at 100 TB), built Spark-first with
DuckDB oracle twins like every other catalog family.

Raw crawl URLs are synthesized deterministically messy from
(source, doc_id) on BOTH engines — four variants (scheme case, www,
port, trailing slash, fragment, tracking params) that canonicalize to
one form, so the canonical-dedup entries have real collapse structure
(the text_scrub_pii / url_normalize synthesis convention).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.curation import (
    canonical_host,
    canonical_url,
    char_ngram_repetition,
    contamination_longest_run,
    contamination_token_fraction,
    cross_snapshot_bloom,
    cross_snapshot_exact,
    gopher_quality_flags,
    incremental_minhash_pairs,
    paragraph_dedup,
    url_canonical_dedup,
)
from mapreduce_wsi_spark.plans.registry import register, tbl

# ---------------------------------------------------------------------------
# Shared synthesis + oracle CTE fragments
# ---------------------------------------------------------------------------

# Four deterministic raw-URL variants per doc; all four canonicalize to
# https://<source>.example.com/p/<doc_id%5>?id=<doc_id%10>.
_URL_RAW_SQL = """
        CASE doc_id % 4
          WHEN 0 THEN 'https://www.' || source || '.example.com/p/'
                      || CAST(doc_id % 5 AS VARCHAR)
                      || '?utm_source=x&id=' || CAST(doc_id % 10 AS VARCHAR)
          WHEN 1 THEN 'HTTP://' || source || '.EXAMPLE.com/p/'
                      || CAST(doc_id % 5 AS VARCHAR)
                      || '/?id=' || CAST(doc_id % 10 AS VARCHAR)
                      || '&utm_campaign=y'
          WHEN 2 THEN 'https://' || source || '.example.com:8443/p/'
                      || CAST(doc_id % 5 AS VARCHAR)
                      || '?id=' || CAST(doc_id % 10 AS VARCHAR) || '#frag'
          ELSE 'https://www.' || source || '.example.com/p/'
               || CAST(doc_id % 5 AS VARCHAR)
               || '/?id=' || CAST(doc_id % 10 AS VARCHAR) || '&ref=z'
        END
"""

# DuckDB twin of operators/curation.py::canonical_url / canonical_host —
# the convention is the spec (regex re-derivation, no shared code).
_URL_CANON_CTE = f"""
    raw AS (SELECT doc_id, source, {_URL_RAW_SQL} AS u FROM documents),
    parts AS (
        SELECT doc_id, source,
               regexp_replace(lower(regexp_extract(u, '//([^/:?#]+)', 1)),
                              '^www\\.', '') AS host,
               regexp_replace(regexp_extract(u, '//[^/?#]+(/[^?#]*)', 1),
                              '/+$', '') AS path,
               regexp_extract(u, '\\?([^#]*)', 1) AS query
        FROM raw),
    canon AS (
        SELECT doc_id, source, host, path,
               'https://' || host || path ||
               CASE WHEN kept <> '' THEN '?' || kept ELSE '' END
                   AS canon_url
        FROM (SELECT doc_id, source, host, path,
                     array_to_string(list_sort(list_filter(
                         string_split(query, '&'),
                         p -> p <> '' AND NOT regexp_matches(p,
                             '^(utm_[a-z]+|ref|gclid|fbclid)='))), '&')
                         AS kept
              FROM parts) t)
"""


def _synth_url():
    """Spark side of the four-variant raw-URL synthesis (same spec as
    _URL_RAW_SQL)."""
    p = (F.col("doc_id") % 5).cast("string")
    q = (F.col("doc_id") % 10).cast("string")
    s = F.col("source")
    v = F.col("doc_id") % 4
    return (
        F.when(v == 0, F.concat(
            F.lit("https://www."), s, F.lit(".example.com/p/"), p,
            F.lit("?utm_source=x&id="), q))
        .when(v == 1, F.concat(
            F.lit("HTTP://"), s, F.lit(".EXAMPLE.com/p/"), p,
            F.lit("/?id="), q, F.lit("&utm_campaign=y")))
        .when(v == 2, F.concat(
            F.lit("https://"), s, F.lit(".example.com:8443/p/"), p,
            F.lit("?id="), q, F.lit("#frag")))
        .otherwise(F.concat(
            F.lit("https://www."), s, F.lit(".example.com/p/"), p,
            F.lit("/?id="), q, F.lit("&ref=z"))))


def _urls_df(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return docs.select("doc_id", "source", "n_chars",
                       _synth_url().alias("u"))


# old snapshot = doc_id % 3 != 0; new crawl batch = doc_id % 3 == 0
_SNAPSHOT_SPLIT = "doc_id % 3"

# Positional 5-gram shingles + benchmark split for contamination
# entries (bench = doc_id % 20 = 0, the decontam_ngram_overlap split).
_CONTAM_CTE = """
    tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    cs AS (SELECT doc_id, len(w) AS n_words, w,
                  unnest(generate_series(1, len(w) - 4)) AS i
           FROM tk WHERE doc_id % 20 != 0),
    csh AS (SELECT doc_id, n_words, i,
                   w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] || ' '
                   || w[CAST(i+2 AS INT)] || ' ' || w[CAST(i+3 AS INT)]
                   || ' ' || w[CAST(i+4 AS INT)] AS shingle
            FROM cs),
    bsh AS (SELECT DISTINCT
                   w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] || ' '
                   || w[CAST(i+2 AS INT)] || ' ' || w[CAST(i+3 AS INT)]
                   || ' ' || w[CAST(i+4 AS INT)] AS shingle
            FROM (SELECT doc_id, w,
                         unnest(generate_series(1, len(w) - 4)) AS i
                  FROM tk WHERE doc_id % 20 = 0) b),
    hit AS (SELECT DISTINCT c.doc_id, c.i
            FROM csh c JOIN bsh USING (shingle))
"""


# ---------------------------------------------------------------------------
# URL / web family
# ---------------------------------------------------------------------------

@register(
    "url_host_rollup",
    oracle=f"""
    WITH {_URL_CANON_CTE}
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT canon_url) AS BIGINT) AS n_canonical,
           round(1.0 - count(DISTINCT canon_url) * 1.0 / count(*), 9)
               AS dup_rate,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM canon JOIN documents USING (doc_id)
    GROUP BY host
    """,
    note="host-level crawl rollup: canonicalize raw URLs (scheme/case/"
         "port/fragment/trailing-slash/tracking-param normalization, "
         "operators/curation.py::canonical_url), then per host the doc "
         "count, distinct-canonical count, and the URL-dup rate a crawl "
         "scheduler reads to deprioritize mirror-heavy hosts. Map-only "
         "canonicalization + one host groupBy (partial-aggregated "
         "map-side); hosts are unbounded but each group is 4 scalars")
def url_host_rollup(spark, sf_dir):
    urls = _urls_df(spark, sf_dir)
    base = urls.select(
        "doc_id", "n_chars", canonical_host(F.col("u")).alias("host"),
        canonical_url(F.col("u")).alias("cu"))
    return (base.groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("cu").alias("n_canonical"),
                 F.round(F.lit(1.0) - F.countDistinct("cu")
                         / F.count(F.lit(1)), 9).alias("dup_rate"),
                 F.sum("n_chars").cast("bigint").alias("total_chars")))


@register(
    "dedup_url_canonical",
    oracle=f"""
    WITH {_URL_CANON_CTE},
    g AS (SELECT canon_url, min(doc_id) AS keep_id,
                 CAST(count(*) AS BIGINT) AS group_n
          FROM canon GROUP BY canon_url)
    SELECT c.doc_id, c.host, c.canon_url,
           c.doc_id = g.keep_id AS keep, g.group_n
    FROM canon c JOIN g USING (canon_url)
    """,
    note="canonical-URL keep-first dedup (the crawl-dedup stage before "
         "any content hashing): group by canonical form, survivor = min "
         "doc id. groupBy + join-back, never a window keyed on the "
         "canonical URL — a redirect-target URL with millions of raw "
         "variants partial-combines map-side instead of buffering one "
         "window task (operators/curation.py::url_canonical_dedup)")
def dedup_url_canonical(spark, sf_dir):
    return url_canonical_dedup(_urls_df(spark, sf_dir), "u", "doc_id")


@register(
    "web_robots_filter",
    oracle=f"""
    WITH {_URL_CANON_CTE},
    hosts AS (SELECT DISTINCT source, host FROM canon),
    rules AS (SELECT host, '/p/' || pfx AS prefix
              FROM hosts, (SELECT unnest(['1', '3']) AS pfx) p
              WHERE regexp_matches(source, '[13579]$')),
    flagged AS (
        SELECT c.doc_id, c.host,
               max(CASE WHEN r.prefix IS NOT NULL THEN 1 ELSE 0 END)
                   AS blocked
        FROM canon c LEFT JOIN rules r
            ON r.host = c.host AND c.path LIKE r.prefix || '%'
        GROUP BY 1, 2)
    SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(blocked) AS BIGINT) AS n_blocked,
           round(sum(blocked) * 1.0 / count(*), 9) AS block_rate
    FROM flagged GROUP BY host
    """,
    note="robots.txt-style disallow filtering: a per-host prefix rule "
         "set (synthesized: odd-digit hosts disallow /p/1 and /p/3) "
         "broadcast-joins against canonical (host, path) with a "
         "startswith predicate — the rules side is always tiny vs the "
         "frontier, so the filter is map-side at any corpus size; "
         "rolled up to per-host blocked counts a crawler audits")
def web_robots_filter(spark, sf_dir):
    urls = _urls_df(spark, sf_dir)
    base = urls.select(
        "doc_id", "source", canonical_host(F.col("u")).alias("host"),
        F.regexp_replace(
            F.coalesce(F.parse_url(F.col("u"), F.lit("PATH")), F.lit("")),
            r"/+$", "").alias("path"))
    rules = (base.select("source", "host").distinct()
             .filter(F.col("source").rlike("[13579]$"))
             .select(F.col("host").alias("r_host"), F.explode(
                 F.array(F.lit("/p/1"), F.lit("/p/3"))).alias("prefix")))
    joined = base.join(
        F.broadcast(rules),
        (F.col("host") == F.col("r_host"))
        & F.col("path").startswith(F.col("prefix")), "left")
    flagged = (joined.groupBy("doc_id", "host")
               .agg(F.max(F.col("prefix").isNotNull().cast("int"))
                    .alias("blocked")))
    return (flagged.groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("blocked").cast("bigint").alias("n_blocked"),
                 F.round(F.sum("blocked") / F.count(F.lit(1)), 9)
                 .alias("block_rate")))


@register(
    "url_tracking_params_audit",
    oracle=f"""
    WITH raw AS (SELECT doc_id, source, {_URL_RAW_SQL} AS u
                 FROM documents),
    q AS (SELECT doc_id, source,
                 list_filter(string_split(
                     regexp_extract(u, '\\?([^#]*)', 1), '&'),
                     p -> p <> '') AS ps
          FROM raw),
    px AS (SELECT doc_id, source, unnest(ps) AS p FROM q),
    cls AS (SELECT source,
                   CASE WHEN regexp_matches(p,
                       '^(utm_[a-z]+|ref|gclid|fbclid)=') THEN 1 ELSE 0
                   END AS is_tracking
            FROM px)
    SELECT source, CAST(count(*) AS BIGINT) AS n_params,
           CAST(sum(is_tracking) AS BIGINT) AS n_tracking,
           round(sum(is_tracking) * 1.0 / count(*), 9) AS tracking_frac
    FROM cls GROUP BY source
    """,
    note="tracking-parameter audit over raw crawl URLs: per source the "
         "query-param volume and the fraction that canonical_url's "
         "tracking rule (utm_*/ref/gclid/fbclid) strips — the "
         "observability twin of dedup_url_canonical, telling a crawl "
         "operator how much param noise each source emits. Map-only "
         "explode + one small groupBy")
def url_tracking_params_audit(spark, sf_dir):
    urls = _urls_df(spark, sf_dir)
    q = F.coalesce(F.parse_url(F.col("u"), F.lit("QUERY")), F.lit(""))
    params = (urls
              .select("doc_id", "source",
                      F.filter(F.split(q, "&"),
                               lambda p: p != "").alias("ps"))
              .select("doc_id", "source", F.explode("ps").alias("p")))
    is_tracking = F.col("p").rlike(
        "^(utm_[a-z]+|ref|gclid|fbclid)=").cast("int")
    return (params.select("source", is_tracking.alias("is_tracking"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_params"),
                 F.sum("is_tracking").cast("bigint").alias("n_tracking"),
                 F.round(F.sum("is_tracking") / F.count(F.lit(1)), 9)
                 .alias("tracking_frac")))


# ---------------------------------------------------------------------------
# Cross-snapshot incremental dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_cross_snapshot_exact",
    oracle=rf"""
    WITH old_h AS (
        SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                   AS h,
               min(doc_id) AS matched_old
        FROM documents WHERE {_SNAPSHOT_SPLIT} != 0 GROUP BY 1),
    new_h AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                   AS h
        FROM documents WHERE {_SNAPSHOT_SPLIT} = 0)
    SELECT n.doc_id, o.matched_old IS NOT NULL AS is_carried,
           o.matched_old
    FROM new_h n LEFT JOIN old_h o USING (h)
    """,
    note="cross-snapshot EXACT dedup (new crawl batch doc_id%3=0 vs "
         "standing corpus): a new doc is carried iff its normalized "
         "text hash exists in the old snapshot — one hash equi-join, "
         "old side reduced to (hash, min id) so corpus text never "
         "moves; the incremental-crawl primitive "
         "(operators/curation.py::cross_snapshot_exact)")
def dedup_cross_snapshot_exact(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return cross_snapshot_exact(docs.filter(F.col("doc_id") % 3 == 0),
                                docs.filter(F.col("doc_id") % 3 != 0),
                                "text", "doc_id")


@register(
    "dedup_cross_snapshot_bloom",
    oracle=rf"""
    WITH old_h AS (
        SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                   AS h,
               min(doc_id) AS matched_old
        FROM documents WHERE {_SNAPSHOT_SPLIT} != 0 GROUP BY 1),
    new_h AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                   AS h
        FROM documents WHERE {_SNAPSHOT_SPLIT} = 0)
    SELECT n.doc_id, o.matched_old IS NOT NULL AS is_carried,
           o.matched_old
    FROM new_h n LEFT JOIN old_h o USING (h)
    """,
    note="cross_snapshot_exact behind a Bloom prefilter (2 seeded "
         "xxhash64 positions in a 2^20-bit space, the decontam_bloom "
         "convention): the old corpus's hash set broadcasts as a "
         "bounded int set, so only Bloom survivors reach the exact "
         "join and shuffled volume tracks the carry rate, not corpus "
         "size. Oracle is the plain exact twin — the Bloom stage must "
         "change bytes, never results "
         "(operators/curation.py::cross_snapshot_bloom)")
def dedup_cross_snapshot_bloom(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return cross_snapshot_bloom(docs.filter(F.col("doc_id") % 3 == 0),
                                docs.filter(F.col("doc_id") % 3 != 0),
                                "text", "doc_id")


_CROSS_JACCARD_ORACLE = f"""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)]
                  || ' ' || w[CAST(i+2 AS INT)] AS shingle
           FROM (SELECT doc_id, w,
                        unnest(generate_series(1, len(w) - 2)) AS i
                 FROM tk) t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_new, b.doc_id AS doc_old,
               count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle
        WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 != 0
        GROUP BY 1, 2)
    SELECT doc_new, doc_old,
           CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_new
    JOIN sizes sb ON sb.doc_id = doc_old
    WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.1
"""


@register(
    "dedup_incremental_minhash",
    oracle=_CROSS_JACCARD_ORACLE,
    note="cross-snapshot NEAR-dup dedup: MinHash signatures on both "
         "snapshots (same seeded family, so standing-corpus signatures "
         "are reusable run-over-run), LSH banding BETWEEN the sets "
         "(never old x old), exact-Jaccard verify of candidates only "
         "(operators/curation.py::incremental_minhash_pairs). Oracle "
         "is the exact cross-pair set — same convention as "
         "dedup_minhash_lsh: fixture near-dups sit at j>=0.8 where "
         "4-row/16-band recall is ~1, verified below at sf0.01")
def dedup_incremental_minhash(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return incremental_minhash_pairs(
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 != 0),
        "text", "doc_id", n=3, min_jaccard=0.1)


@register(
    "dedup_snapshot_delta_stats",
    oracle=rf"""
    WITH old_h AS (
        SELECT DISTINCT
            md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
        FROM documents WHERE {_SNAPSHOT_SPLIT} != 0),
    new_d AS (
        SELECT doc_id, n_chars,
               md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                   AS h
        FROM documents WHERE {_SNAPSHOT_SPLIT} = 0),
    carried AS (SELECT doc_id FROM new_d JOIN old_h USING (h)),
    near AS (SELECT DISTINCT doc_new AS doc_id
             FROM ({_CROSS_JACCARD_ORACLE}) cj),
    cls AS (SELECT n.doc_id, n.n_chars,
                   CASE WHEN c.doc_id IS NOT NULL THEN 'carried'
                        WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                        ELSE 'novel' END AS kind
            FROM new_d n
            LEFT JOIN carried c ON c.doc_id = n.doc_id
            LEFT JOIN near nr ON nr.doc_id = n.doc_id)
    SELECT CAST(count(*) AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN kind = 'carried' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_carried,
           CAST(sum(CASE WHEN kind = 'near_dup' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_near_dup,
           CAST(sum(CASE WHEN kind = 'novel' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN kind = 'novel' THEN n_chars ELSE 0 END)
                AS BIGINT) AS novel_chars
    FROM cls
    """,
    note="the per-crawl delta report: of the new batch, how many docs "
         "are exact carries of the standing corpus, near-dups of it "
         "(exact carries excluded), or genuinely novel — plus the novel "
         "char volume, the number a curation run actually budgets on. "
         "Composes cross_snapshot_exact + incremental_minhash_pairs; "
         "one row out, all joins hash- or candidate-bounded")
def dedup_snapshot_delta_stats(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    new_df = docs.filter(F.col("doc_id") % 3 == 0)
    old_df = docs.filter(F.col("doc_id") % 3 != 0)
    exact = cross_snapshot_exact(new_df, old_df, "text", "doc_id")
    near = (incremental_minhash_pairs(new_df, old_df, "text", "doc_id",
                                      n=3, min_jaccard=0.1)
            .select(F.col("doc_new").alias("doc_id")).distinct()
            .withColumn("__near", F.lit(True)))
    cls = (exact.join(near, "doc_id", "left")
           .join(new_df.select("doc_id", "n_chars"), "doc_id")
           .select("doc_id", "n_chars",
                   F.when(F.col("is_carried"), "carried")
                   .when(F.col("__near").isNotNull(), "near_dup")
                   .otherwise("novel").alias("kind")))
    return cls.agg(
        F.count(F.lit(1)).alias("n_new"),
        F.sum((F.col("kind") == "carried").cast("int")).cast("bigint")
        .alias("n_carried"),
        F.sum((F.col("kind") == "near_dup").cast("int")).cast("bigint")
        .alias("n_near_dup"),
        F.sum((F.col("kind") == "novel").cast("int")).cast("bigint")
        .alias("n_novel"),
        F.sum(F.when(F.col("kind") == "novel", F.col("n_chars"))
              .otherwise(F.lit(0))).cast("bigint").alias("novel_chars"))


# ---------------------------------------------------------------------------
# Contamination scoring (beyond the boolean decontam hit)
# ---------------------------------------------------------------------------

@register(
    "decontam_token_fraction",
    oracle=f"""
    WITH {_CONTAM_CTE},
    cov AS (SELECT DISTINCT h.doc_id, h.i + o.o AS cp
            FROM hit h, (SELECT unnest(generate_series(0, 4)) AS o) o),
    cc AS (SELECT doc_id, count(*) AS n_contam FROM cov GROUP BY 1),
    tot AS (SELECT doc_id, len(string_split(text, ' ')) AS n_words
            FROM documents WHERE doc_id % 20 != 0)
    SELECT tot.doc_id, CAST(n_words AS INT) AS n_words,
           CAST(coalesce(n_contam, 0) AS INT) AS n_contam_tokens,
           round(coalesce(n_contam, 0) * 1.0 / n_words, 9) AS contam_frac
    FROM tot LEFT JOIN cc ON cc.doc_id = tot.doc_id
    """,
    note="per-doc contamination SCORE (the PaLM/GPT-3 reporting form): "
         "fraction of a corpus doc's word positions covered by any "
         "5-gram shared with the benchmark slice (doc_id%20=0), covered "
         "positions counted once — the no-double-count union shared "
         "with gopher_repetition. Benchmark shingles broadcast; the "
         "coverage explode is 5x the HIT shingles, not 5x the corpus "
         "(operators/curation.py::contamination_token_fraction)")
def decontam_token_fraction(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return contamination_token_fraction(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        "text", "doc_id", n=5)


@register(
    "decontam_longest_run",
    oracle=f"""
    WITH {_CONTAM_CTE},
    isl AS (SELECT doc_id, i,
                   i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
                       AS g
            FROM hit),
    runs AS (SELECT doc_id, count(*) AS len FROM isl GROUP BY doc_id, g),
    agg AS (SELECT doc_id, CAST(sum(len) AS INT) AS n_hit,
                   CAST(max(len) AS INT) AS longest
            FROM runs GROUP BY 1)
    SELECT d.doc_id, coalesce(n_hit, 0) AS n_hit_shingles,
           coalesce(longest, 0) AS longest_run
    FROM (SELECT doc_id FROM documents WHERE doc_id % 20 != 0) d
    LEFT JOIN agg USING (doc_id)
    """,
    note="longest contiguous contaminated stretch per doc — separates a "
         "quoted benchmark item (one long run) from incidental phrase "
         "overlap (scattered singletons). Gaps-and-islands (pos - "
         "row_number) over shared-shingle start positions; the window "
         "partitions by doc id — unbounded keyset, per-partition size "
         "bounded by doc length, NOT the bounded-key ceiling class "
         "(operators/curation.py::contamination_longest_run)")
def decontam_longest_run(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return contamination_longest_run(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        "text", "doc_id", n=5)


# ---------------------------------------------------------------------------
# Mixing / sampling
# ---------------------------------------------------------------------------

@register(
    "mix_perplexity_target",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT count(*) AS n FROM tok),
    scored AS (SELECT doc_id,
                      CAST(ln(CAST(c AS DOUBLE) / n) AS DECIMAL(28,9))
                          AS lp
               FROM tok JOIN cnt USING (w) CROSS JOIN tot),
    d AS (SELECT doc_id, count(*) AS n_tokens,
                 -CAST(sum(lp) AS DOUBLE) / count(*) AS xent
          FROM scored GROUP BY doc_id),
    b AS (SELECT CASE WHEN xent < 3.40 THEN 'head'
                      WHEN xent < 3.41 THEN 'middle'
                      ELSE 'tail' END AS ppl_bucket,
                 n_tokens
          FROM d),
    comp AS (SELECT ppl_bucket, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens
             FROM b GROUP BY 1),
    tgt AS (SELECT * FROM (VALUES ('head', 0.5), ('middle', 0.3),
                                  ('tail', 0.2)) t(ppl_bucket, share)),
    bud AS (SELECT CAST(sum(bucket_tokens) AS BIGINT) // 2 AS budget
            FROM comp)
    SELECT comp.ppl_bucket, n_docs, bucket_tokens,
           round(least(1.0, budget * share / bucket_tokens), 9)
               AS sample_rate,
           CAST(floor(least(1.0, budget * share / bucket_tokens)
                      * bucket_tokens) AS BIGINT) AS expected_tokens
    FROM comp JOIN tgt USING (ppl_bucket) CROSS JOIN bud
    """,
    note="perplexity-bucket mixing to a target distribution (the CCNet "
         "follow-through): given the head/middle/tail composition from "
         "the corpus-LM cross-entropy cut (text_perplexity_buckets "
         "thresholds) and a token budget of half the corpus, compute "
         "per-bucket sampling rates r_b = min(1, budget*share_b/"
         "tokens_b) toward target shares 0.5/0.3/0.2 — single-pass "
         "water-filling, no redistribution of an under-filled bucket's "
         "slack (documented, not hidden). The rate table is 3 rows "
         "from one aggregate; applying it downstream is a map-side "
         "hash filter")
def mix_perplexity_target(spark, sf_dir):
    from mapreduce_wsi_spark.operators.text import perplexity_buckets
    comp = (perplexity_buckets(tbl(spark, sf_dir, "documents"),
                               "text", "doc_id", "lang")
            .groupBy("ppl_bucket")
            .agg(F.sum("n_docs").cast("bigint").alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("bucket_tokens")))
    tgt = F.create_map(
        F.lit("head"), F.lit(0.5), F.lit("middle"), F.lit(0.3),
        F.lit("tail"), F.lit(0.2))
    bud = comp.agg((F.sum("bucket_tokens").cast("bigint") / F.lit(2))
                   .cast("bigint").alias("budget"))
    rate = F.least(F.lit(1.0),
                   F.col("budget") * tgt[F.col("ppl_bucket")]
                   / F.col("bucket_tokens"))
    return (comp.crossJoin(F.broadcast(bud))
            .select("ppl_bucket", "n_docs", "bucket_tokens",
                    F.round(rate, 9).alias("sample_rate"),
                    F.floor(rate * F.col("bucket_tokens")).cast("bigint")
                    .alias("expected_tokens")))


@register(
    "sample_quota_largest_remainder",
    oracle="""
    WITH s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY lang),
    t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM s),
    q AS (SELECT lang, n_docs,
                 (97 * n_docs) // total AS base,
                 (97 * n_docs) % total AS rem
          FROM s CROSS JOIN t),
    r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang ASC)
                        AS rk,
                 CAST(97 - sum(base) OVER () AS BIGINT) AS extra
          FROM q)
    SELECT lang, n_docs,
           CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT)
               AS seats
    FROM r
    """,
    note="largest-remainder (Hamilton) apportionment of a fixed sample "
         "budget (97 seats) across language strata: base = floor share, "
         "leftover seats to the largest integer remainders (tie-break "
         "lang asc) — exact integer arithmetic end-to-end, so the "
         "allocation is engine-identical and sums to the budget by "
         "construction. The window runs over |strata| rows (5), never "
         "the corpus — strata stats come from one partial-aggregated "
         "groupBy")
def sample_quota_largest_remainder(spark, sf_dir):
    s = (tbl(spark, sf_dir, "documents").groupBy("lang")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")))
    t = s.agg(F.sum("n_docs").cast("bigint").alias("total"))
    q = (s.crossJoin(F.broadcast(t))
         .select("lang", "n_docs",
                 F.expr("(97 * n_docs) div total").alias("base"),
                 ((97 * F.col("n_docs")) % F.col("total")).alias("rem")))
    w = Window.orderBy(F.desc("rem"), F.asc("lang"))
    r = (q.withColumn("rk", F.row_number().over(w))
         .withColumn("extra",
                     F.lit(97) - F.sum("base").over(
                         Window.partitionBy())))
    return r.select(
        "lang", "n_docs",
        (F.col("base") + F.when(F.col("rk") <= F.col("extra"), 1)
         .otherwise(0)).cast("bigint").alias("seats"))


@register(
    "sample_pps_systematic",
    oracle="""
    WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w
               FROM documents),
    c AS (SELECT doc_id, w,
                 CAST(sum(w) OVER (ORDER BY doc_id) AS BIGINT) AS cum
          FROM d),
    t AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM d),
    p AS (SELECT total // 50 AS step, (total // 50) // 2 AS off FROM t),
    hits AS (
        SELECT doc_id, w, cum,
               least(50, greatest(0, (cum - off + step - 1) // step))
               - least(50, greatest(0, (cum - w - off + step - 1) // step))
                   AS n_hits
        FROM c CROSS JOIN p)
    SELECT doc_id, w, cum, CAST(n_hits AS INT) AS n_hits
    FROM hits WHERE n_hits >= 1
    """,
    note="PPS systematic sampling (probability proportional to size, "
         "fixed skip interval): 50 sampling points at off + j*step over "
         "the doc_id-ordered cumulative char axis; a doc is drawn once "
         "per point inside its [cum-w, cum) span — all integer "
         "arithmetic, engine-exact. The Spark cumsum is the BUCKETED "
         "prefix-sum form (bucket by doc_id range, window within "
         "buckets, broadcast exclusive bucket prefixes — the r9 "
         "SCALE.md recipe, proven here): no window ever sees a "
         "corpus-sized partition; bucket width scales with the corpus "
         "so the bucket-totals table stays driver-bounded")
def sample_pps_systematic(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("w"))
    # bucketed prefix sum: within-bucket running total + exclusive
    # prefix of bucket totals (broadcast join — totals are tiny)
    b = d.withColumn("__b", F.expr("doc_id div 64"))
    win = (Window.partitionBy("__b").orderBy("doc_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    within = b.withColumn("__within", F.sum("w").over(win))
    btot = b.groupBy("__b").agg(F.sum("w").alias("__bt"))
    bwin = (Window.orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bpre = btot.withColumn(
        "__pre", F.sum("__bt").over(bwin) - F.col("__bt")).drop("__bt")
    c = (within.join(F.broadcast(bpre), "__b")
         .select("doc_id", "w",
                 (F.col("__within") + F.col("__pre")).cast("bigint")
                 .alias("cum")))
    t = d.agg(F.sum("w").cast("bigint").alias("total"))
    p = t.select(F.expr("total div 50").alias("step"),
                 F.expr("(total div 50) div 2").alias("off"))

    def n_lt(x):
        raw = F.expr(f"({x} - off + step - 1) div step")
        return F.least(F.lit(50), F.greatest(F.lit(0), raw))

    hits = (c.crossJoin(F.broadcast(p))
            .withColumn("n_hits", (n_lt("cum") - n_lt("cum - w"))
                        .cast("int"))
            .filter(F.col("n_hits") >= 1))
    return hits.select("doc_id", "w", "cum", "n_hits")


# ---------------------------------------------------------------------------
# Gopher / C4 quality gates
# ---------------------------------------------------------------------------

# Deterministic badness synthesis: every 11th doc gains four non-alpha
# "words" so the symbol/alpha gates have real failures to catch (the
# text_scrub_pii synthesis convention — same expression on both engines).
_GOPHER_SYNTH_SQL = """
        text || CASE WHEN doc_id % 11 = 0
                     THEN ' ### 123 456 %%%' ELSE '' END
"""

_GOPHER_FLAGS_CTE = f"""
    t AS (SELECT doc_id, {_GOPHER_SYNTH_SQL} AS tx FROM documents),
    f0 AS (SELECT doc_id, string_split(tx, ' ') AS w, length(tx) AS nc
           FROM t),
    f1 AS (SELECT doc_id, len(w) AS n_words,
                  nc - (len(w) - 1) AS sum_wl,
                  len(list_filter(w,
                      x -> NOT regexp_matches(x, '[a-zA-Z]')))
                      AS n_nonalpha,
                  len(list_filter(w, x -> x IN
                      ('the','and','of','to','a','in','is'))) AS n_stop
           FROM f0),
    flags AS (SELECT doc_id, CAST(n_words AS INT) AS n_words,
                     n_words >= 40 AND n_words <= 90 AS wc_ok,
                     sum_wl >= 3 * n_words AND sum_wl <= 10 * n_words
                         AS mwl_ok,
                     n_nonalpha * 10 <= n_words AS symbol_ok,
                     (n_words - n_nonalpha) * 5 >= n_words * 4
                         AS alpha_ok,
                     n_stop >= 2 AS stop_ok
              FROM f1)
"""


def _gopher_flagged(spark, sf_dir):
    from mapreduce_wsi_spark.operators.text import LANG_STOPWORDS
    docs = tbl(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.when(F.col("doc_id") % 11 == 0,
                        F.lit(" ### 123 456 %%%"))
                 .otherwise(F.lit(""))).alias("text"))
    return gopher_quality_flags(synth, "text", "doc_id",
                                LANG_STOPWORDS["en"],
                                min_words=40, max_words=90)


@register(
    "text_gopher_quality_rules",
    oracle=f"""
    WITH {_GOPHER_FLAGS_CTE}
    SELECT doc_id, n_words, wc_ok, mwl_ok, symbol_ok, alpha_ok, stop_ok,
           wc_ok AND mwl_ok AND symbol_ok AND alpha_ok AND stop_ok
               AS keep
    FROM flags
    """,
    note="Gopher document-quality gates (Rae et al. 2021 app. A1.1, the "
         "non-repetition rules; repetition is text_gopher_repetition): "
         "word count in [40,90] (paper 50..100k, fixture-scaled), mean "
         "word length in [3,10], symbol-word ratio <= 0.1, >= 80% "
         "alpha-bearing words, >= 2 en stopword hits — all multiplied-"
         "through integer comparisons on one map-only scan "
         "(operators/curation.py::gopher_quality_flags). Badness "
         "synthesized deterministically on every 11th doc")
def text_gopher_quality_rules(spark, sf_dir):
    return _gopher_flagged(spark, sf_dir)


@register(
    "quality_rejection_reasons",
    oracle=f"""
    WITH {_GOPHER_FLAGS_CTE},
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN wc_ok AND mwl_ok AND symbol_ok
                                      AND alpha_ok AND stop_ok
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
            FROM flags),
    per AS (
        SELECT 'wc' AS rule,
               CAST(sum(CASE WHEN NOT wc_ok THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail,
               CAST(sum(CASE WHEN NOT wc_ok AND mwl_ok AND symbol_ok
                                  AND alpha_ok AND stop_ok
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unique_fail
        FROM flags
        UNION ALL
        SELECT 'mwl',
               CAST(sum(CASE WHEN NOT mwl_ok THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(sum(CASE WHEN NOT mwl_ok AND wc_ok AND symbol_ok
                                  AND alpha_ok AND stop_ok
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT 'symbol',
               CAST(sum(CASE WHEN NOT symbol_ok THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(sum(CASE WHEN NOT symbol_ok AND wc_ok AND mwl_ok
                                  AND alpha_ok AND stop_ok
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT 'alpha',
               CAST(sum(CASE WHEN NOT alpha_ok THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(sum(CASE WHEN NOT alpha_ok AND wc_ok AND mwl_ok
                                  AND symbol_ok AND stop_ok
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT 'stop',
               CAST(sum(CASE WHEN NOT stop_ok THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(sum(CASE WHEN NOT stop_ok AND wc_ok AND mwl_ok
                                  AND symbol_ok AND alpha_ok
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM flags)
    SELECT rule, n_fail, n_unique_fail, n_docs, n_keep
    FROM per CROSS JOIN tot
    """,
    note="per-gate rejection attribution over the Gopher rules: for "
         "each rule both the marginal fail count and the UNIQUE fail "
         "count (docs only that rule rejects — the rule's true marginal "
         "value; a rule with zero unique fails is dead weight). "
         "Complements pipeline_quality_funnel's first-failing-gate "
         "attribution. One scan, flags computed once, 5-way rollup of "
         "an already-tiny aggregate")
def quality_rejection_reasons(spark, sf_dir):
    # ONE corpus scan: all twelve counters are aggregate expressions of
    # one pass (a per-rule agg loop would scan the corpus 5x), unpivoted
    # to rule rows afterwards via a 1-row explode.
    flags = _gopher_flagged(spark, sf_dir)
    keep = (F.col("wc_ok") & F.col("mwl_ok") & F.col("symbol_ok")
            & F.col("alpha_ok") & F.col("stop_ok"))
    base = flags.withColumn("__keep", keep)
    rules = ["wc", "mwl", "symbol", "alpha", "stop"]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("__keep").cast("int")).cast("bigint")
            .alias("n_keep")]
    for r in rules:
        ok = F.col(f"{r}_ok")
        others = [F.col(f"{o}_ok") for o in rules if o != r]
        all_others = others[0] & others[1] & others[2] & others[3]
        aggs.append(F.sum((~ok).cast("int")).cast("bigint")
                    .alias(f"__fail_{r}"))
        aggs.append(F.sum((~ok & all_others).cast("int")).cast("bigint")
                    .alias(f"__uniq_{r}"))
    one = base.agg(*aggs)
    rule_structs = F.array(*[
        F.struct(F.lit(r).alias("rule"),
                 F.col(f"__fail_{r}").alias("n_fail"),
                 F.col(f"__uniq_{r}").alias("n_unique_fail"))
        for r in rules])
    return (one.select(F.explode(rule_structs).alias("x"),
                       "n_docs", "n_keep")
            .select("x.rule", "x.n_fail", "x.n_unique_fail",
                    "n_docs", "n_keep"))


@register(
    "text_c4_heuristics",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               text || CASE WHEN doc_id % 13 = 0 THEN ' { code }'
                            ELSE '' END
                    || CASE WHEN doc_id % 17 = 0 THEN ' lorem ipsum'
                            ELSE '' END
                    || CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END
                   AS tx
        FROM documents),
    f AS (SELECT source,
                 CASE WHEN contains(tx, '{') THEN 1 ELSE 0 END AS brace,
                 CASE WHEN contains(tx, 'lorem ipsum') THEN 1 ELSE 0 END
                     AS lorem,
                 CASE WHEN NOT regexp_matches(tx, '[.!?]$') THEN 1
                      ELSE 0 END AS nopunct,
                 CASE WHEN len(string_split(tx, ' ')) < 5 THEN 1
                      ELSE 0 END AS short
          FROM t)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(brace) AS BIGINT) AS n_brace,
           CAST(sum(lorem) AS BIGINT) AS n_lorem,
           CAST(sum(nopunct) AS BIGINT) AS n_nopunct,
           CAST(sum(short) AS BIGINT) AS n_short,
           CAST(sum(CASE WHEN brace = 0 AND lorem = 0 AND nopunct = 0
                              AND short = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep
    FROM f GROUP BY source
    """,
    note="C4 cleaning heuristics (Raffel et al. 2020 §2.2): drop docs "
         "with curly braces (code), the 'lorem ipsum' placeholder, no "
         "terminal punctuation, or under 5 words — per-source drop "
         "accounting. Badness synthesized deterministically (every "
         "13th/17th/odd doc) so each rule has real positives; map-only "
         "scan + one small groupBy")
def text_c4_heuristics(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    tx = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 13 == 0, F.lit(" { code }"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 17 == 0, F.lit(" lorem ipsum"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0, F.lit(".")).otherwise(F.lit("")))
    f = docs.select(
        "source",
        F.col("doc_id"),
        F.contains(tx, F.lit("{")).cast("int").alias("brace"),
        F.contains(tx, F.lit("lorem ipsum")).cast("int").alias("lorem"),
        (~tx.rlike("[.!?]$")).cast("int").alias("nopunct"),
        (F.size(F.split(tx, " ")) < 5).cast("int").alias("short"))
    keep = ((F.col("brace") + F.col("lorem") + F.col("nopunct")
             + F.col("short")) == 0).cast("int")
    return (f.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("brace").cast("bigint").alias("n_brace"),
                 F.sum("lorem").cast("bigint").alias("n_lorem"),
                 F.sum("nopunct").cast("bigint").alias("n_nopunct"),
                 F.sum("short").cast("bigint").alias("n_short"),
                 F.sum(keep).cast("bigint").alias("n_keep")))


@register(
    "text_char_ngram_repetition",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS n_chars, i,
                      substr(text, CAST(i AS INT), 8) AS gm
               FROM (SELECT doc_id, text,
                            unnest(generate_series(1, length(text) - 7))
                                AS i
                     FROM documents) t),
    d AS (SELECT doc_id, gm FROM g GROUP BY doc_id, gm
          HAVING count(*) >= 2),
    cov AS (SELECT DISTINCT g.doc_id, g.i + o.o AS cp
            FROM g JOIN d ON g.doc_id = d.doc_id AND g.gm = d.gm,
                 (SELECT unnest(generate_series(0, 7)) AS o) o),
    cc AS (SELECT doc_id, count(*) AS n_dup FROM cov GROUP BY 1)
    SELECT d2.doc_id, CAST(d2.n_chars AS INT) AS n_chars,
           round(coalesce(n_dup, 0) * 1.0 / d2.n_chars, 9)
               AS dup_char_frac
    FROM (SELECT doc_id, length(text) AS n_chars FROM documents) d2
    LEFT JOIN cc ON cc.doc_id = d2.doc_id
    """,
    note="character-level duplicated-8-gram coverage — the char half of "
         "Gopher A1.1 (word half: text_gopher_repetition): fraction of "
         "a doc's characters inside any char 8-gram repeated within the "
         "doc, positions counted once. ~1 exploded row per char "
         "(linear); coverage via interval-union islands over duplicated "
         "starts (doc-keyed window), never a x8 position explode — the "
         "oracle keeps the exploded-union form, so the algebraic "
         "equivalence is driver-checked "
         "(operators/curation.py::char_ngram_repetition)")
def text_char_ngram_repetition(spark, sf_dir):
    return char_ngram_repetition(tbl(spark, sf_dir, "documents"),
                                 "text", "doc_id", n=8)


# ---------------------------------------------------------------------------
# Dedup reports / audits
# ---------------------------------------------------------------------------

# Recursive transitive closure over the exact 3-gram-Jaccard >= 0.1
# edge set (the dedup_components oracle convention) — body only, callers
# prepend WITH RECURSIVE and append their SELECT.
_CC_COMP_CTE = """
    tkc AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    shc AS (SELECT DISTINCT doc_id,
                   w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)]
                   || ' ' || w[CAST(i+2 AS INT)] AS shingle
            FROM (SELECT doc_id, w,
                         unnest(generate_series(1, len(w) - 2)) AS i
                  FROM tkc) t),
    sizesc AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY 1),
    interc AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM shc a JOIN shc b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    pairsc AS (
        SELECT doc_a, doc_b FROM interc
        JOIN sizesc sa ON sa.doc_id = doc_a
        JOIN sizesc sb ON sb.doc_id = doc_b
        WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.1),
    edgesc AS (SELECT doc_a AS src, doc_b AS dst FROM pairsc
               UNION SELECT doc_b, doc_a FROM pairsc),
    reachc AS (
        SELECT DISTINCT src AS id, src AS r FROM edgesc
        UNION
        SELECT e.dst AS id, reachc.r AS r
        FROM reachc JOIN edgesc e ON e.src = reachc.id),
    compc AS (SELECT id, min(r) AS comp FROM reachc GROUP BY id)
"""


@register(
    "dedup_cluster_size_hist",
    oracle=f"""
    WITH RECURSIVE {_CC_COMP_CTE},
    s AS (SELECT comp, count(*) AS sz FROM compc GROUP BY comp),
    h AS (SELECT CAST(sz AS INT) AS cluster_size,
                 CAST(count(*) AS BIGINT) AS n_clusters,
                 CAST(sum(sz) AS BIGINT) AS n_docs
          FROM s GROUP BY sz)
    SELECT * FROM h
    UNION ALL
    SELECT CAST(1 AS INT),
           CAST((SELECT count(*) FROM documents)
                - (SELECT count(*) FROM compc) AS BIGINT),
           CAST((SELECT count(*) FROM documents)
                - (SELECT count(*) FROM compc) AS BIGINT)
    """,
    note="duplicate-cluster size histogram — the dedup report a corpus "
         "run publishes (how much mass sits in giant boilerplate "
         "clusters vs pairs): connected components over the exact "
         "Jaccard>=0.1 edges, component sizes, histogram + the "
         "singleton row (docs in no dup pair). Components cost only "
         "the dup subgraph; the histogram is an aggregate of an "
         "aggregate — bytes shrink at every step")
def dedup_cluster_size_hist(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dedup import (
        connected_components, jaccard_pairs)
    docs = tbl(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "text", "doc_id", n=3, min_jaccard=0.1)
    comp = connected_components(pairs)
    hist = (comp.groupBy("comp").agg(F.count(F.lit(1)).alias("sz"))
            .groupBy("sz")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
                 F.sum("sz").cast("bigint").alias("n_docs"))
            .select(F.col("sz").cast("int").alias("cluster_size"),
                    "n_clusters", "n_docs"))
    n_tot = docs.agg(F.count(F.lit(1)).alias("__t"))
    n_mem = comp.agg(F.count(F.lit(1)).alias("__m"))
    singles = (n_tot.crossJoin(n_mem)
               .select(F.lit(1).cast("int").alias("cluster_size"),
                       (F.col("__t") - F.col("__m")).cast("bigint")
                       .alias("n_clusters"),
                       (F.col("__t") - F.col("__m")).cast("bigint")
                       .alias("n_docs")))
    return hist.unionByName(singles)


@register(
    "dedup_lsh_recall_audit",
    oracle="""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)]
                  || ' ' || w[CAST(i+2 AS INT)] AS shingle
           FROM (SELECT doc_id, w,
                        unnest(generate_series(1, len(w) - 2)) AS i
                 FROM tk) t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    truth AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.1)
    SELECT CAST(count(*) AS BIGINT) AS n_true,
           true AS recall_ok, true AS precision_ok
    FROM truth
    """,
    note="LSH banding quality audit: the exact Jaccard>=0.1 pair set "
         "(portable, the oracle) vs the 16-band/4-row candidate set "
         "(xxhash64, Spark-side) — recall_ok asserts every true pair "
         "is a candidate (measured 25/25 at sf0.01, the "
         "dedup_minhash_lsh recall convention), precision_ok bounds "
         "candidate waste (>= 2% of candidates are true pairs). The "
         "booleans make banding-quality regressions driver-visible "
         "without shipping seed-dependent pair lists")
def dedup_lsh_recall_audit(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dedup import (
        jaccard_pairs, lsh_candidate_pairs, minhash_signatures)
    docs = tbl(spark, sf_dir, "documents")
    truth = (jaccard_pairs(docs, "text", "doc_id", n=3, min_jaccard=0.1)
             .select("doc_a", "doc_b"))
    cands = lsh_candidate_pairs(
        minhash_signatures(docs, "text", "doc_id", n=3, k=64),
        bands=16, rows_per_band=4)
    found = truth.join(cands, ["doc_a", "doc_b"], "left_semi")
    stats = (truth.agg(F.count(F.lit(1)).alias("n_true"))
             .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
             .crossJoin(cands.agg(F.count(F.lit(1)).alias("n_cand"))))
    return stats.select(
        F.col("n_true").cast("bigint").alias("n_true"),
        (F.col("n_found") == F.col("n_true")).alias("recall_ok"),
        (F.col("n_true") * 50 >= F.col("n_cand")).alias("precision_ok"))


@register(
    "text_boilerplate_prefix_clusters",
    oracle="""
    WITH p AS (SELECT doc_id, source, n_chars,
                      array_to_string(string_split(text, ' ')[1:4], ' ')
                          AS prefix
               FROM documents)
    SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM p GROUP BY prefix HAVING count(*) >= 2
    """,
    note="boilerplate prefix clustering: docs sharing their first 4 "
         "words (site headers, license banners — the highest-yield "
         "cheap boilerplate signal) grouped with doc/source/char "
         "counts, clusters of >= 2 reported. One map-only prefix "
         "projection + one groupBy; a hot prefix (the point of the "
         "query) partial-aggregates map-side")
def text_boilerplate_prefix_clusters(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    p = docs.select(
        "source", "n_chars",
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 4))
        .alias("prefix"))
    return (p.groupBy("prefix")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.countDistinct("source").cast("bigint")
                 .alias("n_sources"),
                 F.sum("n_chars").cast("bigint").alias("total_chars"))
            .filter(F.col("n_docs") >= 2))


@register(
    "dedup_paragraph_exact",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
    p AS (SELECT doc_id, j,
                 md5(array_to_string(
                     w[CAST(j*8+1 AS INT):CAST(j*8+8 AS INT)], ' '))
                     AS h,
                 doc_id * 4294967296 + j AS k
          FROM (SELECT doc_id, w,
                       unnest(generate_series(0, (len(w) - 1) // 8)) AS j
                FROM w) t),
    f AS (SELECT h, min(k) AS fk FROM p GROUP BY h)
    SELECT doc_id, CAST(count(*) AS INT) AS n_paras,
           CAST(sum(CASE WHEN k = fk THEN 1 ELSE 0 END) AS INT)
               AS n_kept,
           round(sum(CASE WHEN k = fk THEN 1 ELSE 0 END) * 1.0
                 / count(*), 9) AS kept_frac
    FROM p JOIN f USING (h) GROUP BY doc_id
    """,
    note="paragraph-granular exact dedup (the practical middle ground "
         "between doc-level dropDuplicates and full substring dedup): "
         "8-word chunks hashed, each kept only at its global first "
         "occurrence — min() over an arithmetic (doc, chunk) int64 key, "
         "never a global window — reported as per-doc surviving-chunk "
         "fraction (operators/curation.py::paragraph_dedup)")
def dedup_paragraph_exact(spark, sf_dir):
    return paragraph_dedup(tbl(spark, sf_dir, "documents"),
                           "text", "doc_id", para_words=8)


# ---------------------------------------------------------------------------
# LLM-eval metrics
# ---------------------------------------------------------------------------

@register(
    "eval_pass_at_k",
    oracle="""
    WITH att AS (
        SELECT doc_id % 50 AS task,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                              1, 8)) AS BIGINT) % 100 < 35
                    THEN 1 ELSE 0 END AS ok
        FROM documents),
    t AS (SELECT task, count(*) AS n, sum(ok) AS c
          FROM att GROUP BY task)
    SELECT CAST(task AS INT) AS task, CAST(n AS INT) AS n,
           CAST(c AS INT) AS c,
           round(c * 1.0 / n, 9) AS pass1,
           round(1.0
                 - (greatest(0, n-c)   * 1.0 / n)
                 * (greatest(0, n-c-1) * 1.0 / (n-1))
                 * (greatest(0, n-c-2) * 1.0 / (n-2))
                 * (greatest(0, n-c-3) * 1.0 / (n-3))
                 * (greatest(0, n-c-4) * 1.0 / (n-4)), 9) AS pass5
    FROM t
    """,
    note="pass@k (Chen et al. 2021, HumanEval): the unbiased estimator "
         "1 - C(n-c,k)/C(n,k) per task, computed as the unrolled "
         "product of (n-c-i)/(n-i) — no factorials, exact-int "
         "numerators, IEEE-identical on both engines; greatest(0,.) "
         "zeroes the product (pass@k = 1) when fewer than k failures "
         "exist. Attempts synthesized: docs are attempts for task "
         "doc_id%50, success by portable md5 bucket (35%)")
def eval_pass_at_k(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    docs = tbl(spark, sf_dir, "documents")
    att = docs.select(
        (F.col("doc_id") % 50).alias("task"),
        (portable_bucket(F.col("doc_id")) < 35).cast("int").alias("ok"))
    t = att.groupBy("task").agg(F.count(F.lit(1)).alias("n"),
                                F.sum("ok").alias("c"))
    n, c = F.col("n"), F.col("c")
    prod = F.lit(1.0)
    for i in range(5):
        prod = prod * (F.greatest(F.lit(0), n - c - i) / (n - i))
    return t.select(F.col("task").cast("int").alias("task"),
                    n.cast("int").alias("n"), c.cast("int").alias("c"),
                    F.round(c / n, 9).alias("pass1"),
                    F.round(F.lit(1.0) - prod, 9).alias("pass5"))


@register(
    "eval_bleu_ngram_precision",
    oracle="""
    WITH tok AS (SELECT doc_id, i, w[CAST(i AS INT)] AS w1,
                        CASE WHEN i < len(w)
                             THEN w[CAST(i AS INT)] || ' '
                                  || w[CAST(i+1 AS INT)] END AS w2,
                        len(w) AS nw
                 FROM (SELECT doc_id, string_split(text, ' ') AS w,
                              unnest(generate_series(1,
                                  len(string_split(text, ' ')))) AS i
                       FROM documents) t),
    u1 AS (SELECT doc_id, w1 AS g, count(*) AS c FROM tok GROUP BY 1, 2),
    u2 AS (SELECT doc_id, w2 AS g, count(*) AS c FROM tok
           WHERE w2 IS NOT NULL GROUP BY 1, 2),
    lens AS (SELECT doc_id, max(nw) AS nw FROM tok GROUP BY doc_id),
    p1 AS (SELECT h.doc_id,
                  CAST(sum(least(h.c, coalesce(r.c, 0))) AS BIGINT)
                      AS clip,
                  CAST(sum(h.c) AS BIGINT) AS tot
           FROM u1 h LEFT JOIN u1 r
               ON r.doc_id = h.doc_id + 1 AND r.g = h.g
           GROUP BY 1),
    p2 AS (SELECT h.doc_id,
                  CAST(sum(least(h.c, coalesce(r.c, 0))) AS BIGINT)
                      AS clip,
                  CAST(sum(h.c) AS BIGINT) AS tot
           FROM u2 h LEFT JOIN u2 r
               ON r.doc_id = h.doc_id + 1 AND r.g = h.g
           GROUP BY 1),
    m AS (SELECT p1.doc_id,
                 p1.clip * 1.0 / p1.tot AS pr1,
                 p2.clip * 1.0 / p2.tot AS pr2,
                 exp(least(0.0, 1.0 - hr.nw * 1.0 / hl.nw)) AS bp
          FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id
          JOIN lens hl ON hl.doc_id = p1.doc_id
          JOIN lens hr ON hr.doc_id = p1.doc_id + 1)
    SELECT doc_id, round(pr1, 9) AS p1, round(pr2, 9) AS p2,
           round(bp, 9) AS bp,
           round(CASE WHEN pr1 > 0 AND pr2 > 0
                      THEN bp * exp(0.5 * (ln(pr1) + ln(pr2)))
                      ELSE 0.0 END, 9) AS bleu2
    FROM m
    """,
    note="BLEU-2 modified n-gram precision (Papineni et al. 2002): "
         "clipped unigram/bigram counts against the reference (doc_id+1 "
         "pairs each doc with its neighbor as hyp/ref), brevity penalty "
         "exp(min(0, 1-r/h)), geometric mean; zero-precision pairs "
         "report bleu2=0 (no smoothing — documented). Counts ride "
         "(doc, gram) groupBys and an equi-join on (ref_id, gram); all "
         "ratios are exact-int divisions rounded once")
def eval_bleu_ngram_precision(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    base = docs.select("doc_id", w.alias("w"), F.size(w).alias("nw"))
    u1 = (base.select("doc_id", F.explode("w").alias("g"))
          .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c")))
    big = F.expr("transform(sequence(1, size(w) - 1), "
                 "i -> concat_ws(' ', element_at(w, i), "
                 "element_at(w, i + 1)))")
    u2 = (base.select("doc_id", F.explode(big).alias("g"))
          .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c")))
    lens = base.select("doc_id", "nw")

    def clipped(u):
        h = u.alias("h")
        r = u.select((F.col("doc_id") - 1).alias("doc_id"),
                     F.col("g"), F.col("c").alias("rc")).alias("r")
        return (h.join(r, ["doc_id", "g"], "left")
                .groupBy("doc_id")
                .agg(F.sum(F.least(F.col("c"),
                                   F.coalesce(F.col("rc"), F.lit(0))))
                     .cast("bigint").alias("clip"),
                     F.sum("c").cast("bigint").alias("tot")))

    c1 = clipped(u1).select("doc_id", F.col("clip").alias("clip1"),
                            F.col("tot").alias("tot1"))
    c2 = clipped(u2).select("doc_id", F.col("clip").alias("clip2"),
                            F.col("tot").alias("tot2"))
    hl = lens.select("doc_id", F.col("nw").alias("h_nw"))
    rl = lens.select((F.col("doc_id") - 1).alias("doc_id"),
                     F.col("nw").alias("r_nw"))
    m = (c1.join(c2, "doc_id").join(hl, "doc_id").join(rl, "doc_id")
         .select("doc_id",
                 (F.col("clip1") / F.col("tot1")).alias("pr1"),
                 (F.col("clip2") / F.col("tot2")).alias("pr2"),
                 F.exp(F.least(F.lit(0.0),
                               F.lit(1.0) - F.col("r_nw")
                               / F.col("h_nw"))).alias("bp")))
    bleu = (F.when((F.col("pr1") > 0) & (F.col("pr2") > 0),
                   F.col("bp") * F.exp(0.5 * (F.log("pr1")
                                              + F.log("pr2"))))
            .otherwise(F.lit(0.0)))
    return m.select("doc_id", F.round("pr1", 9).alias("p1"),
                    F.round("pr2", 9).alias("p2"),
                    F.round("bp", 9).alias("bp"),
                    F.round(bleu, 9).alias("bleu2"))


@register(
    "eval_pairwise_winrate",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               'm' || CAST(doc_id % 3 AS VARCHAR) AS ma,
               'm' || CAST((doc_id // 3) % 3 AS VARCHAR) AS mb,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 = 0 AS a_wins
        FROM documents),
    n AS (SELECT least(ma, mb) AS model_i, greatest(ma, mb) AS model_j,
                 CASE WHEN a_wins = (ma = least(ma, mb)) THEN 1 ELSE 0
                 END AS win_i
          FROM b WHERE ma <> mb),
    s AS (SELECT model_i, model_j, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(win_i) AS BIGINT) AS wins_i
          FROM n GROUP BY 1, 2)
    SELECT model_i, model_j, n, wins_i,
           round(wins_i * 1.0 / n, 9) AS winrate,
           round((wins_i * 1.0 / n - 0.5) * 2 * sqrt(n), 9) AS z,
           abs((wins_i * 1.0 / n - 0.5) * 2 * sqrt(n)) > 1.96
               AS significant
    FROM s
    """,
    note="pairwise model win-rate with a two-sided proportion z-test "
         "(the LLM-arena battle table): battles synthesized from docs "
         "(models doc_id%3 vs (doc_id//3)%3, winner by portable md5 "
         "parity), pairs order-normalized so each unordered pair is one "
         "row; z = (p-0.5)/sqrt(0.25/n) exact in IEEE given integer "
         "wins/n. One groupBy over battles; the battle table is the "
         "corpus-scale side, the output is |model pairs| rows")
def eval_pairwise_winrate(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
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
    p = F.col("wins_i") / F.col("n")
    z = (p - 0.5) * 2 * F.sqrt(F.col("n"))
    return s.select("model_i", "model_j", "n", "wins_i",
                    F.round(p, 9).alias("winrate"),
                    F.round(z, 9).alias("z"),
                    (F.abs(z) > 1.96).alias("significant"))


@register(
    "text_ngram_novelty",
    oracle="""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)]
                  || ' ' || w[CAST(i+2 AS INT)] AS g
           FROM (SELECT doc_id, w,
                        unnest(generate_series(1, len(w) - 2)) AS i
                 FROM tk) t),
    first AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g)
    SELECT sh.doc_id, CAST(count(*) AS INT) AS n_grams,
           CAST(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
                AS INT) AS n_novel,
           round(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 9) AS novelty
    FROM sh JOIN first USING (g) GROUP BY sh.doc_id
    """,
    note="per-doc n-gram novelty in corpus order (the marginal-"
         "information signal curriculum/dedup policies read): a doc's "
         "distinct 3-grams are novel iff their global first occurrence "
         "(min doc id) is this doc. One gram groupBy for firsts + one "
         "join-back; no window, no order-dependent state")
def text_ngram_novelty(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dedup import word_shingles
    sh = word_shingles(tbl(spark, sf_dir, "documents"),
                       "text", "doc_id", n=3)
    first = sh.groupBy("shingle").agg(F.min("id").alias("first_doc"))
    return (sh.join(first, "shingle")
            .groupBy("id")
            .agg(F.count(F.lit(1)).cast("int").alias("n_grams"),
                 F.sum((F.col("first_doc") == F.col("id")).cast("int"))
                 .cast("int").alias("n_novel"),
                 F.round(F.sum((F.col("first_doc") == F.col("id"))
                               .cast("int")) / F.count(F.lit(1)), 9)
                 .alias("novelty"))
            .withColumnRenamed("id", "doc_id"))


# ---------------------------------------------------------------------------
# Corpus profiling / composition
# ---------------------------------------------------------------------------

@register(
    "text_idf_rarity_score",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    idf AS (SELECT w,
                   CAST(ln(CAST(n + 1 AS DOUBLE) / (df + 1)) + 1
                        AS DECIMAL(28,9)) AS idf
            FROM dfq CROSS JOIN nd)
    SELECT doc_id, CAST(sum(tf) AS INT) AS n_tokens,
           round(CAST(sum(CAST(tf AS DECIMAL(9,0)) * idf) AS DOUBLE)
                 / sum(tf), 9) AS rarity
    FROM tf JOIN idf USING (w) GROUP BY doc_id
    """,
    note="per-doc rarity score: mean smoothed IDF over token "
         "occurrences — the cheap 'is this doc about rare things' "
         "quality/curriculum signal. Per-token ln quantizes to "
         "DECIMAL(28,9) before the doc sum (the unigram_logprob "
         "order-free-aggregation idiom); (doc, word) pre-aggregate "
         "keeps the IDF join off raw token rows")
def text_idf_rarity_score(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    tok = docs.select("doc_id",
                      F.explode(F.split(F.col("text"), " ")).alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.countDistinct("doc_id").alias("n"))
    idf = (dfq.crossJoin(F.broadcast(nd))
           .select("w", (F.log((F.col("n") + 1).cast("double")
                               / (F.col("df") + 1)) + 1)
                   .cast("decimal(28,9)").alias("idf")))
    return (tf.join(idf, "w")
            .groupBy("doc_id")
            .agg(F.sum("tf").cast("int").alias("n_tokens"),
                 F.round(F.sum(F.col("tf").cast("decimal(9,0)")
                               * F.col("idf")).cast("double")
                         / F.sum("tf"), 9).alias("rarity")))


@register(
    "text_vocab_coverage_topv",
    oracle="""
    WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    cnt AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(c) AS BIGINT) AS n_tokens
            FROM cnt GROUP BY lang),
    top AS (SELECT lang, c FROM cnt
            QUALIFY row_number() OVER (PARTITION BY lang
                ORDER BY c DESC, w ASC) <= 100),
    cov AS (SELECT lang, CAST(sum(c) AS BIGINT) AS top_tokens
            FROM top GROUP BY lang)
    SELECT tot.lang, n_types, n_tokens,
           round(top_tokens * 1.0 / n_tokens, 9) AS covered_frac
    FROM tot JOIN cov ON tot.lang = cov.lang
    """,
    note="top-V vocabulary coverage per language (the tokenizer-design "
         "signal: what fraction of running tokens the 100 most frequent "
         "types cover). Spark side selects the top-100 with the salted "
         "two-phase rank (phase-1 window keyed (lang, xxhash64(w)%16) "
         "prunes to <=16*100 survivors before the lang-keyed re-rank — "
         "the r9 sampler pattern), so no window ever sorts a full "
         "language's type table through one task; tie-break (count "
         "desc, word asc) is total, making the top set engine-exact")
def text_vocab_coverage_topv(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    tok = docs.select("lang",
                      F.explode(F.split(F.col("text"), " ")).alias("w"))
    cnt = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = (cnt.groupBy("lang")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_types"),
                F.sum("c").cast("bigint").alias("n_tokens")))
    salted = cnt.withColumn("__s", F.pmod(F.xxhash64("w"), F.lit(16)))
    w1 = Window.partitionBy("lang", "__s").orderBy(F.desc("c"), F.asc("w"))
    survivors = (salted.withColumn("__r1", F.row_number().over(w1))
                 .filter(F.col("__r1") <= 100))
    w2 = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("w"))
    top = (survivors.withColumn("__r2", F.row_number().over(w2))
           .filter(F.col("__r2") <= 100))
    cov = top.groupBy("lang").agg(F.sum("c").cast("bigint")
                                  .alias("top_tokens"))
    return (tot.join(cov, "lang")
            .select("lang", "n_types", "n_tokens",
                    F.round(F.col("top_tokens") / F.col("n_tokens"), 9)
                    .alias("covered_frac")))


@register(
    "dq_json_key_profile",
    oracle="""
    WITH j AS (
        SELECT event_id,
               '{"k": ' || CAST(event_id % 100 AS VARCHAR)
               || CASE WHEN event_id % 3 = 0
                       THEN ', "device": "d'
                            || CAST(event_id % 4 AS VARCHAR) || '"'
                       ELSE '' END
               || CASE WHEN event_id % 5 = 0
                       THEN ', "score": '
                            || CAST(event_id % 7 AS VARCHAR) || '.5'
                       ELSE '' END
               || '}' AS js
        FROM events),
    kv AS (SELECT event_id, k,
                  json_extract_string(js, '$.' || k) AS v
           FROM j, unnest(json_keys(js)) AS u(k)),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_events FROM events)
    SELECT k AS key, CAST(count(*) AS BIGINT) AS n_present,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
           round(count(*) * 1.0 / n_events, 9) AS pct_present
    FROM kv CROSS JOIN tot GROUP BY k, n_events
    """,
    note="semi-structured key profiling over a JSON event-props column "
         "(schema drift detection for event pipelines): per key its "
         "presence count/rate and distinct-value cardinality. Spark "
         "parses once to map<string,string> and explodes entries; "
         "DuckDB re-derives via json_keys + json_extract_string — "
         "unquoted scalar extraction matches Spark's map cast on both "
         "string and numeric values. Key variety synthesized "
         "deterministically (device on every 3rd event, score on every "
         "5th) since the fixture ships a single-key props")
def dq_json_key_profile(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    js = F.concat(
        F.lit('{"k": '), (F.col("event_id") % 100).cast("string"),
        F.when(F.col("event_id") % 3 == 0,
               F.concat(F.lit(', "device": "d'),
                        (F.col("event_id") % 4).cast("string"),
                        F.lit('"'))).otherwise(F.lit("")),
        F.when(F.col("event_id") % 5 == 0,
               F.concat(F.lit(', "score": '),
                        (F.col("event_id") % 7).cast("string"),
                        F.lit(".5"))).otherwise(F.lit("")),
        F.lit("}"))
    kv = (ev.select(F.explode(
        F.from_json(js, "map<string,string>")).alias("key", "v")))
    tot = ev.agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    return (kv.groupBy("key")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_present"),
                 F.countDistinct("v").cast("bigint").alias("n_distinct"))
            .crossJoin(F.broadcast(tot))
            .select("key", "n_present", "n_distinct",
                    F.round(F.col("n_present") / F.col("n_events"), 9)
                    .alias("pct_present")))


@register(
    "text_hash_bucket_balance",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents),
    bk AS (SELECT w,
                  CAST(CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)
                       % 64 AS INT) AS bk,
                  count(*) AS c
           FROM tok GROUP BY 1, 2),
    agg AS (SELECT bk, CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(c) AS BIGINT) AS n_tokens
            FROM bk GROUP BY bk),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM agg)
    SELECT bk, n_types, n_tokens,
           round(n_tokens * 1.0 / total, 9) AS token_share
    FROM agg CROSS JOIN tot
    """,
    note="feature-hashing collision audit for the 64-bucket space "
         "text_hashed_tfidf/dsir share: per bucket the type load and "
         "token share — a skewed bucket means the hashing trick is "
         "silently merging a hot word into everything else's feature. "
         "Same engine-portable md5 bucket as the production ops; one "
         "(word) pre-aggregate then a 64-row rollup")
def text_hash_bucket_balance(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    docs = tbl(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
    bk = (tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
          .select(portable_bucket(F.col("w"), 64).alias("bk"), "c"))
    agg = (bk.groupBy("bk")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_types"),
                F.sum("c").cast("bigint").alias("n_tokens")))
    tot = agg.agg(F.sum("n_tokens").cast("bigint").alias("total"))
    return (agg.crossJoin(F.broadcast(tot))
            .select("bk", "n_types", "n_tokens",
                    F.round(F.col("n_tokens") / F.col("total"), 9)
                    .alias("token_share")))


@register(
    "dq_pii_density",
    oracle=r"""
    WITH synth AS (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS n_words,
               text || ' reach me user' || CAST(doc_id AS VARCHAR)
                    || '@example.com via https://ex'
                    || CAST(doc_id AS VARCHAR) || '.org/p 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   AS tx
        FROM documents),
    s0 AS (SELECT doc_id, source, n_words,
                  lower(trim(regexp_replace(tx, '\s+', ' ', 'g'))) AS c
           FROM synth),
    cnt AS (SELECT source, n_words,
                   len(regexp_extract_all(c, '[a-z0-9.]+@[a-z0-9.]+'))
                       AS n_email,
                   len(regexp_extract_all(
                       regexp_replace(c, '[a-z0-9.]+@[a-z0-9.]+',
                                      '<EMAIL>', 'g'),
                       'https?://[^ ]+')) AS n_url,
                   len(regexp_extract_all(
                       regexp_replace(
                           regexp_replace(c, '[a-z0-9.]+@[a-z0-9.]+',
                                          '<EMAIL>', 'g'),
                           'https?://[^ ]+', '<URL>', 'g'),
                       '[0-9]{3}-[0-9]{4}')) AS n_phone
            FROM s0)
    SELECT source,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           round(sum(n_email) * 1000.0 / sum(n_words), 9)
               AS emails_per_1k,
           round(sum(n_url) * 1000.0 / sum(n_words), 9) AS urls_per_1k,
           round(sum(n_phone) * 1000.0 / sum(n_words), 9)
               AS phones_per_1k
    FROM cnt GROUP BY source
    """,
    note="per-source PII density (matches per 1k words of the original "
         "text) using scrub_text's staged detection order — email "
         "redacted before URL before phone, so an address inside a URL "
         "is counted once under its first matching kind, exactly as "
         "the scrubber redacts. The observability layer over "
         "text_scrub_pii: which sources need scrubbing attention. "
         "Same deterministic PII synthesis as that entry")
def dq_pii_density(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import scrub_text
    docs = tbl(spark, sf_dir, "documents")
    synth = docs.withColumn("tx", F.concat(
        F.col("text"), F.lit(" reach me user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via https://ex"),
        F.col("doc_id").cast("string"), F.lit(".org/p 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")))
    scrubbed = scrub_text(synth, "tx", "doc_id")
    joined = scrubbed.join(
        docs.select("doc_id", "source",
                    F.size(F.split(F.col("text"), " ")).alias("n_words")),
        "doc_id")
    return (joined.groupBy("source")
            .agg(F.sum("n_words").cast("bigint").alias("n_words"),
                 F.round(F.sum("n_email") * 1000.0 / F.sum("n_words"), 9)
                 .alias("emails_per_1k"),
                 F.round(F.sum("n_url") * 1000.0 / F.sum("n_words"), 9)
                 .alias("urls_per_1k"),
                 F.round(F.sum("n_phone") * 1000.0 / F.sum("n_words"), 9)
                 .alias("phones_per_1k")))


@register(
    "dedup_composition_drift",
    oracle=r"""
    WITH before AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_before
                    FROM documents GROUP BY lang),
    surv AS (SELECT min(doc_id) AS doc_id
             FROM (SELECT doc_id,
                          md5(lower(trim(regexp_replace(
                              text, '\s+', ' ', 'g')))) AS h
                   FROM documents) t
             GROUP BY h),
    after AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_after
              FROM documents JOIN surv USING (doc_id) GROUP BY lang),
    tb AS (SELECT CAST(sum(n_before) AS BIGINT) AS tb FROM before),
    ta AS (SELECT CAST(sum(n_after) AS BIGINT) AS ta FROM after)
    SELECT lang, n_before, n_after,
           round(n_before * 1.0 / tb, 9) AS share_before,
           round(n_after * 1.0 / ta, 9) AS share_after,
           round((n_after * 1.0 / ta - n_before * 1.0 / tb)
                 * ln((n_after * 1.0 / ta) / (n_before * 1.0 / tb)), 9)
               AS psi_term
    FROM before JOIN after USING (lang) CROSS JOIN tb CROSS JOIN ta
    """,
    note="dedup survivorship drift: language composition before vs "
         "after exact dedup with the per-lang PSI contribution — dedup "
         "is not composition-neutral (boilerplate concentrates in some "
         "languages/sources), and this is the report that catches it. "
         "Exact-int shares, one ln per lang row; survivors from the "
         "dedup_exact min-id convention")
def dedup_composition_drift(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dedup import normalize_text
    docs = tbl(spark, sf_dir, "documents")
    before = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before"))
    surv = (docs.select("doc_id",
                        F.md5(normalize_text(F.col("text"))).alias("h"))
            .groupBy("h").agg(F.min("doc_id").alias("doc_id")))
    after = (docs.join(surv, "doc_id", "left_semi")
             .groupBy("lang")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_after")))
    tb = before.agg(F.sum("n_before").cast("bigint").alias("tb"))
    ta = after.agg(F.sum("n_after").cast("bigint").alias("ta"))
    sb = F.col("n_before") / F.col("tb")
    sa = F.col("n_after") / F.col("ta")
    return (before.join(after, "lang")
            .crossJoin(F.broadcast(tb)).crossJoin(F.broadcast(ta))
            .select("lang", "n_before", "n_after",
                    F.round(sb, 9).alias("share_before"),
                    F.round(sa, 9).alias("share_after"),
                    F.round((sa - sb) * F.log(sa / sb), 9)
                    .alias("psi_term")))


@register(
    "dedup_keep_best_quality",
    oracle=f"""
    WITH RECURSIVE {_CC_COMP_CTE},
    q AS (SELECT doc_id,
                 CAST(len(list_distinct(string_split(text, ' ')))
                      AS INT) AS n_distinct
          FROM documents),
    lab AS (SELECT q.doc_id, compc.comp, q.n_distinct
            FROM q JOIN compc ON compc.id = q.doc_id),
    rk AS (SELECT doc_id, comp, n_distinct,
                  row_number() OVER (PARTITION BY comp
                      ORDER BY n_distinct DESC, doc_id ASC) AS rn
           FROM lab)
    SELECT doc_id, comp, n_distinct, rn = 1 AS keep FROM rk
    UNION ALL
    SELECT q.doc_id, q.doc_id AS comp, q.n_distinct, true AS keep
    FROM q LEFT JOIN compc ON compc.id = q.doc_id
    WHERE compc.id IS NULL
    """,
    note="quality-aware near-dup survivor selection: within each "
         "duplicate cluster keep the doc with the richest vocabulary "
         "(distinct-word count, integer — no float ordering), tie-break "
         "min id; singletons keep by default. The production "
         "alternative to dedup_keep_longest when length is gamed. The "
         "rank window runs only over clustered rows "
         "(dedup.keep_best_in_components)")
def dedup_keep_best_quality(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dedup import (
        connected_components, jaccard_pairs, keep_best_in_components)
    docs = tbl(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.split(F.col("text"), " ")))
        .cast("int").alias("n_distinct"))
    pairs = jaccard_pairs(docs, "text", "doc_id", n=3, min_jaccard=0.1)
    comp = connected_components(pairs)
    out = keep_best_in_components(
        q, comp, "doc_id", [F.desc("n_distinct"), F.asc("doc_id")])
    return out.join(q, "doc_id").select(
        "doc_id", F.col("comp").cast("bigint").alias("comp"),
        "n_distinct", "keep")


@register(
    "pipeline_dedup_funnel",
    oracle=rf"""
    WITH RECURSIVE
    ex AS (SELECT doc_id, n_chars,
                  doc_id = min(doc_id) OVER (PARTITION BY
                      md5(lower(trim(regexp_replace(
                          text, '\s+', ' ', 'g'))))) AS s1
           FROM documents),
    {_URL_CANON_CTE},
    u1 AS (SELECT c.doc_id,
                  c.doc_id = min(c.doc_id) OVER (PARTITION BY
                      c.canon_url) AS s2u
           FROM canon c JOIN ex ON ex.doc_id = c.doc_id AND ex.s1),
    s2t AS (SELECT ex.doc_id, ex.n_chars, ex.s1,
                   coalesce(u1.s2u, false) AS s2
            FROM ex LEFT JOIN u1 ON u1.doc_id = ex.doc_id),
    {_CC_COMP_CTE.strip().lstrip()},
    sedges AS (SELECT e.src, e.dst FROM edgesc e
               JOIN s2t a ON a.doc_id = e.src AND a.s2
               JOIN s2t b ON b.doc_id = e.dst AND b.s2),
    sreach AS (
        SELECT DISTINCT src AS id, src AS r FROM sedges
        UNION
        SELECT e.dst AS id, sreach.r AS r
        FROM sreach JOIN sedges e ON e.src = sreach.id),
    scomp AS (SELECT id, min(r) AS comp FROM sreach GROUP BY id),
    s3t AS (SELECT s2t.doc_id, s2t.n_chars, s1, s2,
                   s2 AND (scomp.id IS NULL OR scomp.comp = s2t.doc_id)
                       AS s3
            FROM s2t LEFT JOIN scomp ON scomp.id = s2t.doc_id)
    SELECT 'raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars FROM s3t
    UNION ALL
    SELECT 'exact', CAST(count(*) AS BIGINT),
           CAST(sum(n_chars) AS BIGINT) FROM s3t WHERE s1
    UNION ALL
    SELECT 'url_canonical', CAST(count(*) AS BIGINT),
           CAST(sum(n_chars) AS BIGINT) FROM s3t WHERE s2
    UNION ALL
    SELECT 'near_dup', CAST(count(*) AS BIGINT),
           CAST(sum(n_chars) AS BIGINT) FROM s3t WHERE s3
    """,
    note="the composed dedup funnel a corpus release publishes: raw -> "
         "exact-hash survivors -> canonical-URL survivors -> near-dup "
         "(Jaccard>=0.1 components, min-id keep) survivors, doc and "
         "char volumes per stage, each stage applied to the previous "
         "stage's survivors (near-dup components computed on the "
         "surviving subgraph only). Composes dedup_exact + "
         "url_canonical_dedup + connected_components; every stage is "
         "hash-keyed — the funnel never pairs docs outside the shingle "
         "equi-join")
def pipeline_dedup_funnel(spark, sf_dir):
    # The survivor-ID sets of each stage are CHECKPOINTED narrow frames
    # (doc_id only — never the text column), so a stage's grouping runs
    # exactly once even though three downstream consumers reference it;
    # the four stage rows then come from ONE labeled aggregate + a
    # 1-row explode, not four aggregates each re-executing the lineage.
    from mapreduce_wsi_spark.operators.dedup import (
        connected_components, jaccard_pairs, normalize_text)
    from mapreduce_wsi_spark.util import iter_checkpoint
    docs = tbl(spark, sf_dir, "documents")
    base = docs.select("doc_id", "n_chars", "text",
                       _synth_url().alias("u"))
    s1_ids = iter_checkpoint(
        base.select("doc_id",
                    F.md5(normalize_text(F.col("text"))).alias("h"))
        .groupBy("h").agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id"))
    s1 = base.join(s1_ids, "doc_id", "left_semi")
    s2_ids = iter_checkpoint(
        s1.select("doc_id", canonical_url(F.col("u")).alias("cu"))
        .groupBy("cu").agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id"))
    s2 = s1.join(s2_ids, "doc_id", "left_semi")
    pairs = jaccard_pairs(s2, "text", "doc_id", n=3, min_jaccard=0.1)
    comp = connected_components(pairs)  # checkpoints internally
    lab = (base.select("doc_id", "n_chars")
           .join(s1_ids.withColumn("__s1", F.lit(1)), "doc_id", "left")
           .join(s2_ids.withColumn("__s2", F.lit(1)), "doc_id", "left")
           .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
           .select("n_chars",
                   F.coalesce("__s1", F.lit(0)).alias("s1"),
                   F.coalesce("__s2", F.lit(0)).alias("s2"),
                   (F.coalesce("__s2", F.lit(0)) *
                    (F.col("comp").isNull()
                     | (F.col("comp") == F.col("doc_id"))).cast("int"))
                   .alias("s3")))
    one = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum("n_chars").cast("bigint").alias("c0"),
        F.sum("s1").cast("bigint").alias("n1"),
        F.sum(F.col("s1") * F.col("n_chars")).cast("bigint").alias("c1"),
        F.sum("s2").cast("bigint").alias("n2"),
        F.sum(F.col("s2") * F.col("n_chars")).cast("bigint").alias("c2"),
        F.sum("s3").cast("bigint").alias("n3"),
        F.sum(F.col("s3") * F.col("n_chars")).cast("bigint").alias("c3"))
    stages = F.array(
        F.struct(F.lit("raw").alias("stage"), F.col("n0").alias("n_docs"),
                 F.col("c0").alias("total_chars")),
        F.struct(F.lit("exact").alias("stage"),
                 F.col("n1").alias("n_docs"),
                 F.col("c1").alias("total_chars")),
        F.struct(F.lit("url_canonical").alias("stage"),
                 F.col("n2").alias("n_docs"),
                 F.col("c2").alias("total_chars")),
        F.struct(F.lit("near_dup").alias("stage"),
                 F.col("n3").alias("n_docs"),
                 F.col("c3").alias("total_chars")))
    return (one.select(F.explode(stages).alias("x"))
            .select("x.stage", "x.n_docs", "x.total_chars"))


@register(
    "dedup_minhash_error_audit",
    oracle="""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)]
                  || ' ' || w[CAST(i+2 AS INT)] AS shingle
           FROM (SELECT doc_id, w,
                        unnest(generate_series(1, len(w) - 2)) AS i
                 FROM tk) t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    truth AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.1)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           true AS max_err_ok, true AS mean_err_ok
    FROM truth
    """,
    note="MinHash estimator-accuracy audit on the true near-dup pairs: "
         "the 64-function signature's matching fraction vs exact "
         "Jaccard — max |err| <= 0.25 (5 sigma at j=0.8, sigma = "
         "sqrt(j(1-j)/64) ~ 0.05) and mean |err| <= 0.10. Booleans "
         "because the seeded xxhash64 family is Spark-side (the "
         "dedup_simhash contract form); the pair count is portable. "
         "Catches a broken hash family or signature truncation the "
         "moment it skews estimates")
def dedup_minhash_error_audit(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dedup import (
        jaccard_pairs, minhash_signatures)
    docs = tbl(spark, sf_dir, "documents")
    truth = jaccard_pairs(docs, "text", "doc_id", n=3, min_jaccard=0.1)
    sigs = minhash_signatures(docs, "text", "doc_id", n=3, k=64)
    sa = sigs.select(F.col("id").alias("doc_a"),
                     F.col("signature").alias("__sa"))
    sb = sigs.select(F.col("id").alias("doc_b"),
                     F.col("signature").alias("__sb"))
    est = (truth.join(sa, "doc_a").join(sb, "doc_b")
           .withColumn("est", F.expr(
               "size(filter(zip_with(__sa, __sb, (x, y) -> x = y), "
               "v -> v)) / 64.0"))
           .withColumn("err", F.abs(F.col("est") - F.col("jaccard"))))
    return est.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (F.max("err") <= 0.25).alias("max_err_ok"),
        (F.avg("err") <= 0.10).alias("mean_err_ok"))


@register(
    "text_lang_mix_entropy",
    oracle="""
    WITH c AS (SELECT source, lang, count(*) AS c
               FROM documents GROUP BY 1, 2),
    t AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot,
                 CAST(count(*) AS INT) AS n_langs
          FROM c GROUP BY source),
    e AS (SELECT c.source,
                 CAST((c.c * 1.0 / t.tot)
                      * ln(c.c * 1.0 / t.tot) AS DECIMAL(28,9)) AS term
          FROM c JOIN t ON c.source = t.source),
    ent AS (SELECT source, round(-CAST(sum(term) AS DOUBLE), 9)
                       AS lang_entropy
            FROM e GROUP BY source),
    mx AS (SELECT source, max(c) AS mc FROM c GROUP BY source),
    dom AS (SELECT c.source, min(c.lang) AS dominant_lang, mx.mc
            FROM c JOIN mx ON c.source = mx.source AND c.c = mx.mc
            GROUP BY c.source, mx.mc)
    SELECT t.source, t.n_langs, ent.lang_entropy,
           dom.dominant_lang,
           round(dom.mc * 1.0 / t.tot, 9) AS dominant_share
    FROM t JOIN ent ON ent.source = t.source
    JOIN dom ON dom.source = t.source
    """,
    note="per-source language-mix report: Shannon entropy of the lang "
         "distribution (per-term DECIMAL(28,9) quantization before the "
         "sum — order-free aggregation) plus the dominant language "
         "(mode, tie-break lang asc) and its share — the signal that "
         "flags a 'monolingual' source drifting multilingual. All over "
         "a |source x lang| aggregate, never raw docs")
def text_lang_mix_entropy(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    t = (c.groupBy("source")
         .agg(F.sum("c").cast("bigint").alias("tot"),
              F.count(F.lit(1)).cast("int").alias("n_langs")))
    e = (c.join(t, "source")
         .select("source",
                 ((F.col("c") / F.col("tot"))
                  * F.log(F.col("c") / F.col("tot")))
                 .cast("decimal(28,9)").alias("term")))
    ent = (e.groupBy("source")
           .agg(F.round(-F.sum("term").cast("double"), 9)
                .alias("lang_entropy")))
    mx = c.groupBy("source").agg(F.max("c").alias("mc"))
    dom = (c.join(mx, "source").filter(F.col("c") == F.col("mc"))
           .groupBy("source", "mc")
           .agg(F.min("lang").alias("dominant_lang")))
    return (t.join(ent, "source").join(dom, "source")
            .select("source", "n_langs", "lang_entropy", "dominant_lang",
                    F.round(F.col("mc") / F.col("tot"), 9)
                    .alias("dominant_share")))


@register(
    "text_token_len_hist",
    oracle="""
    WITH tok AS (SELECT lang, length(unnest(string_split(text, ' ')))
                            AS tok_len
                 FROM documents),
    h AS (SELECT lang, CAST(tok_len AS INT) AS tok_len,
                 CAST(count(*) AS BIGINT) AS n_tokens
          FROM tok GROUP BY 1, 2),
    t AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tot
          FROM h GROUP BY lang)
    SELECT h.lang, h.tok_len, h.n_tokens,
           round(h.n_tokens * 1.0 / t.tot, 9) AS share
    FROM h JOIN t ON h.lang = t.lang
    """,
    note="token-length histogram per language — the ground-truth "
         "distribution tokenizer byte/char budgets are designed "
         "against. One explode + (lang, len) groupBy (both bounded); "
         "shares join against a |langs|-row total, not a window")
def text_token_len_hist(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    tok = (docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .select("lang", F.length("w").cast("int").alias("tok_len")))
    h = (tok.groupBy("lang", "tok_len")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens")))
    t = h.groupBy("lang").agg(F.sum("n_tokens").cast("bigint")
                              .alias("tot"))
    return (h.join(t, "lang")
            .select("lang", "tok_len", "n_tokens",
                    F.round(F.col("n_tokens") / F.col("tot"), 9)
                    .alias("share")))


@register(
    "pipeline_shard_size_audit",
    oracle="""
    WITH s8 AS (SELECT unnest(['s0','s1','s2','s3','s4','s5','s6','s7'])
                    AS s),
    a AS (SELECT doc_id, n_chars, s AS shard FROM (
              SELECT d.doc_id, d.n_chars, s8.s,
                     row_number() OVER (PARTITION BY d.doc_id
                         ORDER BY md5(CAST(d.doc_id AS VARCHAR)
                                      || ':' || s8.s) DESC, s8.s DESC)
                         AS rn
              FROM documents d, s8) t WHERE rn = 1),
    agg AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM a GROUP BY shard),
    tot AS (SELECT CAST(sum(total_chars) AS BIGINT) AS grand FROM agg)
    SELECT shard, n_docs, total_chars,
           round(total_chars * 8.0 / grand, 9) AS balance
    FROM agg CROSS JOIN tot
    """,
    note="shard-balance audit over the rendezvous/HRW assignment "
         "(pipeline.rendezvous_assign, the pipeline_shard_rendezvous "
         "placement): per shard doc count, char volume, and load "
         "relative to perfect balance (1.0) — the check that a hash "
         "family change or shard-list edit did not skew placement. "
         "Map-only assignment + 8-row rollup")
def pipeline_shard_size_audit(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import rendezvous_assign
    docs = tbl(spark, sf_dir, "documents")
    shards = [f"s{i}" for i in range(8)]
    a = rendezvous_assign(docs.select("doc_id", "n_chars"),
                          "doc_id", shards)
    agg = (a.groupBy("shard")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars")))
    tot = agg.agg(F.sum("total_chars").cast("bigint").alias("grand"))
    return (agg.crossJoin(F.broadcast(tot))
            .select("shard", "n_docs", "total_chars",
                    F.round(F.col("total_chars") * 8.0 / F.col("grand"),
                            9).alias("balance")))


@register(
    "text_hapax_ratio",
    oracle="""
    WITH cnt AS (SELECT lang, w, count(*) AS c
                 FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
                       FROM documents) t
                 GROUP BY 1, 2)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 9) AS hapax_ratio
    FROM cnt GROUP BY lang
    """,
    note="hapax legomena ratio per language (types occurring exactly "
         "once / all types) — the vocabulary-richness complement to "
         "text_heaps_law, and the OOV-pressure estimate a tokenizer "
         "vocab size is sanity-checked against. One (lang, word) "
         "aggregate then a |langs|-row rollup")
def text_hapax_ratio(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    cnt = (docs.select("lang",
                       F.explode(F.split(F.col("text"), " ")).alias("w"))
           .groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c")))
    return (cnt.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_types"),
                 F.sum((F.col("c") == 1).cast("int")).cast("bigint")
                 .alias("n_hapax"),
                 F.sum("c").cast("bigint").alias("n_tokens"),
                 F.round(F.sum((F.col("c") == 1).cast("int"))
                         / F.count(F.lit(1)), 9).alias("hapax_ratio")))


@register(
    "mix_domain_kl_divergence",
    oracle="""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    sw AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
    st AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot_s
           FROM sw GROUP BY source),
    cw AS (SELECT w, CAST(sum(c) AS BIGINT) AS cc FROM sw GROUP BY w),
    ct AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM sw),
    terms AS (
        SELECT sw.source,
               CAST((sw.c * 1.0 / st.tot_s)
                    * ln((CAST(sw.c AS DOUBLE) / st.tot_s)
                         * (CAST(ct.tot AS DOUBLE) / cw.cc))
                    AS DECIMAL(28,9)) AS term
        FROM sw JOIN st ON sw.source = st.source
        JOIN cw ON sw.w = cw.w CROSS JOIN ct)
    SELECT st.source, st.tot_s AS n_tokens,
           round(CAST(sum(term) AS DOUBLE), 9) AS kl_divergence
    FROM terms JOIN st ON terms.source = st.source
    GROUP BY st.source, st.tot_s
    """,
    note="per-source KL divergence from the corpus unigram "
         "distribution, KL(P_source || P_corpus) — the domain-shift "
         "signal DoReMi-style mixture reweighting reads. Corpus "
         "support covers every source term, so no smoothing is "
         "needed; per-term DECIMAL(28,9) quantization before the sum, "
         "ln argument factored as (c_sw/tot_s)*(tot/c_w) with the "
         "exact same division order on both engines")
def mix_domain_kl_divergence(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    tok = docs.select("source",
                      F.explode(F.split(F.col("text"), " ")).alias("w"))
    sw = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    st = sw.groupBy("source").agg(F.sum("c").cast("bigint")
                                  .alias("tot_s"))
    cw = sw.groupBy("w").agg(F.sum("c").cast("bigint").alias("cc"))
    ct = sw.agg(F.sum("c").cast("bigint").alias("tot"))
    terms = (sw.join(st, "source").join(cw, "w")
             .crossJoin(F.broadcast(ct))
             .select("source",
                     ((F.col("c") / F.col("tot_s"))
                      * F.log((F.col("c").cast("double")
                               / F.col("tot_s"))
                              * (F.col("tot").cast("double")
                                 / F.col("cc"))))
                     .cast("decimal(28,9)").alias("term")))
    return (terms.groupBy("source")
            .agg(F.round(F.sum("term").cast("double"), 9)
                 .alias("kl_divergence"))
            .join(st, "source")
            .select("source", F.col("tot_s").alias("n_tokens"),
                    "kl_divergence"))


@register(
    "eval_fleiss_kappa",
    oracle="""
    WITH r AS (
        SELECT doc_id, rater,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                     || CAST(rater AS VARCHAR)), 1, 8)) AS BIGINT) % 3
                   AS cat
        FROM documents, (SELECT unnest(generate_series(0, 2)) AS rater)
                            rr),
    cell AS (SELECT doc_id, cat, count(*) AS nij
             FROM r GROUP BY 1, 2),
    s AS (SELECT CAST(sum(nij * nij) AS BIGINT) AS ss,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS n_items
          FROM cell),
    marg AS (SELECT CAST(sum(nij) AS BIGINT) AS cj FROM cell
             GROUP BY cat),
    pe AS (SELECT CAST(sum(cj * cj) AS BIGINT) AS cj2 FROM marg)
    SELECT n_items,
           round((ss - 3.0 * n_items) / (6.0 * n_items), 9) AS p_bar,
           round(cj2 * 1.0 / (9.0 * n_items * n_items), 9) AS p_e,
           round(((ss - 3.0 * n_items) / (6.0 * n_items)
                  - cj2 * 1.0 / (9.0 * n_items * n_items))
                 / (1.0 - cj2 * 1.0 / (9.0 * n_items * n_items)), 9)
               AS kappa
    FROM s CROSS JOIN pe
    """,
    note="Fleiss' kappa (1971) for 3 raters x 3 categories — the "
         "multi-rater agreement companion to eval_cohens_kappa (2 "
         "raters) and eval_krippendorff_alpha: P_bar from the exact "
         "integer sum of squared cell counts, P_e from squared "
         "marginals, single IEEE divisions at the end. Ratings "
         "synthesized per (doc, rater) by portable md5 bucket")
def eval_fleiss_kappa(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    r = (docs.select("doc_id", F.explode(F.sequence(
        F.lit(0), F.lit(2))).alias("rater"))
         .select("doc_id", (F.conv(F.substring(F.md5(F.concat(
             F.col("doc_id").cast("string"), F.lit(":"),
             F.col("rater").cast("string"))), 1, 8), 16, 10)
             .cast("long") % 3).alias("cat")))
    cell = r.groupBy("doc_id", "cat").agg(F.count(F.lit(1)).alias("nij"))
    s = cell.agg(
        F.sum(F.col("nij") * F.col("nij")).cast("bigint").alias("ss"),
        F.countDistinct("doc_id").cast("bigint").alias("n_items"))
    pe = (cell.groupBy("cat").agg(F.sum("nij").cast("bigint").alias("cj"))
          .agg(F.sum(F.col("cj") * F.col("cj")).cast("bigint")
               .alias("cj2")))
    ss, ni, cj2 = F.col("ss"), F.col("n_items"), F.col("cj2")
    p_bar = (ss - 3.0 * ni) / (6.0 * ni)
    p_e = cj2 * 1.0 / (9.0 * ni * ni)
    return (s.crossJoin(F.broadcast(pe))
            .select("n_items", F.round(p_bar, 9).alias("p_bar"),
                    F.round(p_e, 9).alias("p_e"),
                    F.round((p_bar - p_e) / (1.0 - p_e), 9)
                    .alias("kappa")))


# ---------------------------------------------------------------------------
# r10 session-2 additions — the last 5 window slots of the <=45/round
# growth budget (the staleness pad yields per its shrink-first rule).
# Drawn from the r11 queue: manifest-keyed incremental dedup, CDC
# sentence dedup, CCNet paragraph LM, curriculum scheduling, and the
# embedding-dedup recall audit.
# ---------------------------------------------------------------------------


@register(
    "dedup_cdc_sentences",
    oracle="""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents),
    pos AS (SELECT doc_id, i, w[CAST(i AS INT)] AS wd,
                   CASE WHEN CAST(('0x' || substr(
                            md5(w[CAST(i AS INT)]), 1, 8)) AS BIGINT)
                        % 100 < 25
                        THEN 1 ELSE 0 END AS b
            FROM (SELECT doc_id, w,
                         unnest(generate_series(1, len(w))) AS i
                  FROM tk) t),
    ch AS (SELECT doc_id, i, wd,
                  coalesce(sum(b) OVER (
                      PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS cid
           FROM pos),
    chunks AS (SELECT doc_id, cid,
                      md5(string_agg(wd, ' ' ORDER BY i)) AS h,
                      doc_id * 4294967296 + cid AS k
               FROM ch GROUP BY doc_id, cid),
    f AS (SELECT h, min(k) AS fk FROM chunks GROUP BY h)
    SELECT doc_id, CAST(count(*) AS INT) AS n_chunks,
           CAST(sum(CASE WHEN k = fk THEN 1 ELSE 0 END) AS INT)
               AS n_kept,
           round(sum(CASE WHEN k = fk THEN 1 ELSE 0 END) * 1.0
                 / count(*), 9) AS kept_frac
    FROM chunks JOIN f USING (h) GROUP BY doc_id
    """,
    note="sentence-granular exact substring dedup via content-defined "
         "chunking (the rsync/LBFS boundary trick on words: a word ends "
         "a chunk iff its portable md5 bucket < 25, mean chunk ~4 "
         "words): boundaries are a pure function of content, so an "
         "edited page re-chunks only around the edit and chunk-level "
         "dedup stays stable across crawl snapshots — the suffix-"
         "automaton-free substring dedup of the r11 queue. Chunking is "
         "one map-only SQL aggregate fold per doc (no explode-window); "
         "first-occurrence keep is the paragraph_dedup min()-over-"
         "arithmetic-key convention "
         "(operators/curation.py::cdc_chunk_dedup)")
def dedup_cdc_sentences(spark, sf_dir):
    from mapreduce_wsi_spark.operators.curation import cdc_chunk_dedup
    return cdc_chunk_dedup(tbl(spark, sf_dir, "documents"),
                           "text", "doc_id", boundary_pct=25)


@register(
    "text_ccnet_paragraph_lm",
    oracle="""
    WITH rtok AS (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents WHERE doc_id % 5 = 0),
    cnt AS (SELECT w, count(*) AS c FROM rtok GROUP BY w),
    nv AS (SELECT (SELECT count(*) FROM rtok)
                  + (SELECT count(*) FROM cnt) AS nv),
    tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    pw AS (SELECT doc_id, j,
                  unnest(w[CAST(j*8+1 AS INT):CAST(j*8+8 AS INT)]) AS w2
           FROM (SELECT doc_id, w,
                        unnest(generate_series(0, (len(w) - 1) // 8))
                            AS j
                 FROM tk) t),
    lp AS (SELECT doc_id, j,
                  CAST(ln(CAST(coalesce(c, 0) + 1 AS DOUBLE) / nv)
                       AS DECIMAL(28,9)) AS lp
           FROM pw LEFT JOIN cnt ON pw.w2 = cnt.w CROSS JOIN nv),
    x AS (SELECT doc_id, j, -CAST(sum(lp) AS DOUBLE) / count(*) AS xent
          FROM lp GROUP BY 1, 2),
    b AS (SELECT doc_id,
                 CASE WHEN xent < 3.39 THEN 'head'
                      WHEN xent < 3.42 THEN 'middle'
                      ELSE 'tail' END AS bucket
          FROM x),
    comp AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_paras,
                    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
             FROM b GROUP BY 1),
    tot AS (SELECT sum(n_paras) AS tp FROM comp)
    SELECT bucket, n_paras, n_docs,
           round(n_paras * 1.0 / tp, 9) AS share
    FROM comp CROSS JOIN tot
    """,
    note="CCNet-style per-paragraph LM filtering (Wenzek et al. 2019, "
         "arXiv:1911.00359): an add-one word-unigram LM trained on the "
         "trusted reference partition (doc_id%5=0) scores every 8-word "
         "paragraph of the corpus; paragraphs bucket head/middle/tail "
         "by cross-entropy cuts (3.39/3.42, the fixture quartile "
         "region) — CCNet's insight is paragraph granularity keeps the "
         "good half of a mixed-quality page. Per-word log-probs sum in "
         "DECIMAL(28,9) so xent is accumulation-order-independent "
         "(mix_perplexity_target convention); shuffles are one vocab "
         "groupBy + one token join (AQE-broadcast when vocab is small) "
         "+ one (doc,para) groupBy — no windows, no collects "
         "(operators/curation.py::ccnet_paragraph_lm)")
def text_ccnet_paragraph_lm(spark, sf_dir):
    from mapreduce_wsi_spark.operators.curation import ccnet_paragraph_lm
    docs = tbl(spark, sf_dir, "documents")
    scored = ccnet_paragraph_lm(docs, docs.filter(F.col("doc_id") % 5 == 0),
                                "text", "doc_id", para_words=8,
                                cuts=(3.39, 3.42))
    comp = (scored.groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_paras"),
                 F.countDistinct("doc_id").cast("bigint").alias("n_docs")))
    tot = comp.agg(F.sum("n_paras").alias("tp"))
    return (comp.crossJoin(F.broadcast(tot))
            .select("bucket", "n_paras", "n_docs",
                    F.round(F.col("n_paras") / F.col("tp"), 9)
                    .alias("share")))


@register(
    "mix_curriculum_schedule",
    oracle="""
    WITH s AS (SELECT doc_id, source, n_chars,
                      ntile(4) OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS stage
               FROM documents)
    SELECT CAST(stage AS INT) AS stage, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS lo_chars,
           CAST(max(n_chars) AS BIGINT) AS hi_chars,
           round(CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 9) AS mean_chars
    FROM s GROUP BY 1, 2
    """,
    note="domain-balanced curriculum schedule: within every source "
         "domain, docs rank easy-to-hard (n_chars as the difficulty "
         "proxy) and split into 4 curriculum stages — each stage takes "
         "one quartile PER DOMAIN, so stage composition is domain-"
         "balanced by construction. The per-domain quartile is the "
         "factored bucketed prefix-sum arithmetic ntile "
         "(operators/pipeline.py::ntile_bucketed — the SCALE.md r9 "
         "recipe, now a reusable helper): rank within (source, 64-char "
         "value bucket), compose broadcast exclusive bucket prefixes, "
         "derive the tile arithmetically — bit-identical to ntile(4) "
         "with no whole-domain window task; the oracle still runs "
         "ntile. tests/test_plan_shapes.py pins ntile out of the plan")
def mix_curriculum_schedule(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import ntile_bucketed
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    staged = ntile_bucketed(docs, ["source"], "n_chars", "doc_id",
                            n_tiles=4, bucket_width=64,
                            tile_col="stage")
    return (staged.groupBy("stage", "source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.min("n_chars").cast("bigint").alias("lo_chars"),
                 F.max("n_chars").cast("bigint").alias("hi_chars"),
                 F.round(F.sum(F.col("n_chars").cast("decimal(18,2)"))
                         .cast("double") / F.count(F.lit(1)), 9)
                 .alias("mean_chars")))


@register(
    "dedup_manifest_cross_snapshot",
    oracle=rf"""
    WITH old_h AS (
        SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                   AS h,
               min(doc_id) AS matched_old
        FROM documents WHERE {_SNAPSHOT_SPLIT} != 0 GROUP BY 1),
    new_h AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                   AS h
        FROM documents WHERE {_SNAPSHOT_SPLIT} = 0)
    SELECT n.doc_id, o.matched_old IS NOT NULL AS is_carried,
           o.matched_old
    FROM new_h n LEFT JOIN old_h o USING (h)
    """,
    note="cross-snapshot exact dedup keyed by the REAL lakehouse "
         "incremental manifest (the r11-queue composition of "
         "lakehouse_incremental_files with cross_snapshot_exact): "
         "batch 1 (the standing corpus) lands as parquet and its file "
         "paths are recorded; batch 2 (the new crawl) appends to the "
         "same directory; the new side is incremental_new_files "
         "(input_file_name() pruned at the scan, cost O(new data)) and "
         "the old side is the manifest complement — the snapshot split "
         "comes from the ingest manifest itself, not a column filter, "
         "which is how a daily 100 TB crawl actually knows what is "
         "new. The manifest collect is file PATHS (bounded by file "
         "count), never data. Oracle proves the manifest split leaks "
         "no old row into the new side and loses none")
def dedup_manifest_cross_snapshot(spark, sf_dir):
    from mapreduce_wsi_spark.operators.lakehouse import (
        incremental_new_files)
    from mapreduce_wsi_spark.util import scratch_dir

    docs = tbl(spark, sf_dir, "documents")
    base = scratch_dir("manifest_xsnap", sf_dir)
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
    return cross_snapshot_exact(new, old, "text", "doc_id")


@register(
    "dedup_embedding_recall_audit",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 300),
    p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                 list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))) AS c
          FROM e a JOIN e b ON a.vec_id < b.vec_id),
    t AS (SELECT CAST(unnest([0.45, 0.40, 0.35]) AS DOUBLE) AS thr)
    SELECT thr, CAST(count(*) FILTER (c >= thr) AS BIGINT) AS n_true,
           true AS recall_ok, true AS selectivity_ok
    FROM p CROSS JOIN t GROUP BY thr
    """,
    note="embedding-space dedup recall audit (the r11-queue embedding "
         "twin of dedup_lsh_recall_audit): on a FIXED 300-vector audit "
         "panel (bounded, so the exact all-pairs truth side is O(1) at "
         "any corpus scale), the exact cosine pair count at thresholds "
         "0.45/0.40/0.35 (oracle-matched — double dot in list order, "
         "the sim_cosine_topk bit-identity convention) vs the 48-plane/"
         "12-band sign-LSH candidate set: recall_ok asserts found/true "
         ">= 0.99/0.85/0.70 per threshold (measured 3/3, 19/19, 85/97 "
         "at sf0.01, seeded and deterministic). Low thresholds are the "
         "hard regime for sign-LSH (cos 0.35 is a 70-degree angle — "
         "band agreement ~0.14); the audit exists to keep that recall "
         "curve driver-visible when banding knobs change. "
         "selectivity_ok bounds the candidate side the same way the "
         "text twin's precision_ok does: candidates <= 60% of panel "
         "pairs (measured 24,150/44,850 = 0.539 — the honest statement "
         "that 12 bands buy low-threshold recall by candidate volume; "
         "integer-multiplied inequality, engine-portable)")
def dedup_embedding_recall_audit(spark, sf_dir):
    from mapreduce_wsi_spark.operators.similarity import (
        _as_double, cosine, lsh_bucket, random_hyperplanes)
    emb = tbl(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    c = emb.select("vec_id",
                   _as_double(F.col("embedding")).alias("__v"))
    dim = len(emb.select("embedding").first()[0])
    planes = random_hyperplanes(48, dim, seed=42)
    b = c.select("vec_id",
                 F.explode(lsh_bucket(F.col("__v"), planes, bands=12))
                 .alias("b"))
    x, y = b.alias("x"), b.alias("y")
    cands = (x.join(y, (F.col("x.b.band") == F.col("y.b.band"))
                    & (F.col("x.b.key") == F.col("y.b.key"))
                    & (F.col("x.vec_id") < F.col("y.vec_id")))
             .select(F.col("x.vec_id").alias("ia"),
                     F.col("y.vec_id").alias("ib"))
             .distinct()
             .withColumn("__hit", F.lit(1)))
    pa, pb = c.alias("a"), c.alias("b")
    pairs = (pa.join(F.broadcast(pb),
                     F.col("a.vec_id") < F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("ia"),
                     F.col("b.vec_id").alias("ib"),
                     cosine(F.col("a.__v"), F.col("b.__v")).alias("c")))
    thr = (spark.range(1)
           .select(F.explode(F.array(F.lit(0.45), F.lit(0.40),
                                     F.lit(0.35))).alias("thr")))
    bound = (F.when(F.col("thr") == 0.45, F.lit(0.99))
             .when(F.col("thr") == 0.40, F.lit(0.85))
             .otherwise(F.lit(0.70)))
    flagged = pairs.join(cands, ["ia", "ib"], "left")
    sel = (cands.agg(F.count(F.lit(1)).alias("__nc"))
           .crossJoin(pairs.agg(F.count(F.lit(1)).alias("__np"))))
    # Aggregate the UNFILTERED pair x threshold cross join with
    # conditional sums so a threshold with zero true pairs still emits
    # its row (n_true=0), exactly like the oracle's FILTER aggregate —
    # a pre-aggregation .filter(c >= thr) would drop that group.
    above = F.col("c") >= F.col("thr")
    return (flagged.crossJoin(F.broadcast(thr))
            .groupBy("thr")
            .agg(F.sum(F.when(above, 1).otherwise(0))
                 .cast("bigint").alias("n_true"),
                 F.sum(F.when(above, F.coalesce("__hit", F.lit(0)))
                       .otherwise(0)).alias("__found"))
            .crossJoin(F.broadcast(sel))
            .select("thr", "n_true",
                    (F.col("__found") >= bound * F.col("n_true"))
                    .alias("recall_ok"),
                    (F.col("__nc") * 10 <= F.col("__np") * 6)
                    .alias("selectivity_ok")))
