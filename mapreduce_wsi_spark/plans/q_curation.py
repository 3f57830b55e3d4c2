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
