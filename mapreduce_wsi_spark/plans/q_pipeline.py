"""Training-data pipeline queries (north-star extensions): deterministic
splits/sampling, PII scrubbing, benchmark decontamination, repetition
quality, exact quantiles/mode, sharded shuffle, df-tail vocabulary.

All hash-driven selection uses the md5-derived ``portable_bucket``
(operators/pipeline.py) so every entry has a bit-exact DuckDB oracle —
unlike ``rand()``/``F.hash`` approaches, reproducibility is part of the
operator contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.pipeline import (
    decontaminate,
    mode_deterministic,
    quantile_disc,
    rare_terms,
    repetition_stats,
    scrub_text,
    shuffle_shards,
    split_assign,
    stratified_sample,
)
from mapreduce_wsi_spark.plans.registry import register, tbl

# DuckDB twin of operators/pipeline.py::portable_bucket
_BUCKET = ("CAST(CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8)) "
           "AS BIGINT) % {n} AS INT)")


@register(
    "split_hash_deterministic",
    oracle=f"""
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, {_BUCKET.format(key='doc_id', n=100)} AS bucket
          FROM documents) t
    """,
    note="train/val/test split as a pure function of the key (md5 bucket): "
         "map-only, no membership table, stable under corpus growth — the "
         "only split strategy that holds at 100 TB")
def split_hash_deterministic(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    return split_assign(d, "doc_id").select("doc_id", "bucket", "split")


@register(
    "sample_stratified_hash",
    oracle=f"""
    SELECT doc_id, lang, bucket FROM (
        SELECT doc_id, lang,
               {_BUCKET.format(key='doc_id', n=100)} AS bucket,
               CASE lang WHEN 'en' THEN 50 WHEN 'zh' THEN 100
                         WHEN 'de' THEN 25 ELSE 10 END AS pct
        FROM documents) t
    WHERE bucket < pct
    """,
    note="deterministic stratified sampling: per-language keep rates via "
         "broadcast rates join + hash-bucket threshold (reproducible, "
         "unlike sampleBy)")
def sample_stratified_hash(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    out = stratified_sample(d, "doc_id", "lang",
                            {"en": 50, "zh": 100, "de": 25}, default_pct=10)
    return out.select("doc_id", "lang", "bucket")


@register(
    "text_scrub_pii",
    oracle=r"""
    WITH synth AS (
        SELECT doc_id,
               text || ' reach me user' || CAST(doc_id AS VARCHAR)
                    || '@example.com via https://ex'
                    || CAST(doc_id AS VARCHAR) || '.org/p 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        FROM documents),
    s0 AS (SELECT doc_id,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS c
           FROM synth),
    s1 AS (SELECT doc_id,
                  len(regexp_extract_all(c, '[a-z0-9.]+@[a-z0-9.]+'))
                      AS n_email,
                  regexp_replace(c, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g')
                      AS c
           FROM s0),
    s2 AS (SELECT doc_id, n_email,
                  len(regexp_extract_all(c, 'https?://[^ ]+')) AS n_url,
                  regexp_replace(c, 'https?://[^ ]+', '<URL>', 'g') AS c
           FROM s1),
    s3 AS (SELECT doc_id, n_email, n_url,
                  len(regexp_extract_all(c, '[0-9]{3}-[0-9]{4}')) AS n_phone,
                  regexp_replace(c, '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS c
           FROM s2)
    SELECT doc_id, c AS scrubbed,
           CAST(n_email AS INT) AS n_email, CAST(n_url AS INT) AS n_url,
           CAST(n_phone AS INT) AS n_phone
    FROM s3
    """,
    note="normalize (lowercase, whitespace collapse) + typed PII redaction "
         "(email/URL/phone) with per-kind counts; narrow projection, regex "
         "subset common to Java and RE2 dialects")
def text_scrub_pii(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    synth = d.withColumn("text", F.concat(
        F.col("text"), F.lit(" reach me user"),
        F.col("doc_id").cast("string"), F.lit("@example.com via https://ex"),
        F.col("doc_id").cast("string"), F.lit(".org/p 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")))
    return scrub_text(synth, "text", "doc_id")


@register(
    "decontam_ngram_overlap",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                    || ' ' || w[i+4] AS shingle
        FROM (
            SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents) t) q),
    c AS (SELECT * FROM sh WHERE doc_id % 20 != 0),
    b AS (SELECT * FROM sh WHERE doc_id % 20 = 0)
    SELECT c.doc_id AS doc_id,
           count(DISTINCT c.shingle) AS n_shared_shingles,
           count(DISTINCT b.doc_id) AS n_bench_docs_hit
    FROM c JOIN b ON b.shingle = c.shingle
    GROUP BY 1
    """,
    note="test-set decontamination: corpus docs sharing any 5-gram with a "
         "held-out benchmark slice (doc_id%20=0 stands in for the eval "
         "set); shingle equi-join with broadcast benchmark side — one "
         "corpus scan, never doc x doc")
def decontam_ngram_overlap(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    return decontaminate(corpus, bench, "text", "doc_id", n=5)


@register(
    "decontam_bloom_prefilter",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                   AS shingle
        FROM (
            SELECT doc_id, w, unnest(generate_series(1, len(w) - 3)) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents) t) q),
    c AS (SELECT * FROM sh WHERE doc_id % 25 != 0),
    b AS (SELECT * FROM sh WHERE doc_id % 25 = 0)
    SELECT c.doc_id AS doc_id,
           count(DISTINCT c.shingle) AS n_shared_shingles,
           count(DISTINCT b.doc_id) AS n_bench_docs_hit
    FROM c JOIN b ON b.shingle = c.shingle
    GROUP BY 1
    """,
    note="decontamination with a Bloom prefilter (operators/pipeline.py:"
         "decontaminate_bloom): benchmark 4-gram shingles hash to 2 "
         "seeded xxhash64 positions in a 2^20-bit space; corpus shingles "
         "must hit BOTH position sets (two broadcast int semi-joins — "
         "the Bloom AND) before the exact string join removes false "
         "positives. The oracle is the plain exact-overlap twin: the "
         "Bloom stage must change bytes shuffled, never results")
def decontam_bloom_prefilter(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import decontaminate_bloom
    d = tbl(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 25 == 0)
    corpus = d.filter(F.col("doc_id") % 25 != 0)
    return decontaminate_bloom(corpus, bench, "text", "doc_id", n=4)


@register(
    "mix_temperature_flatten",
    oracle="""
    WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS w
               FROM documents GROUP BY source),
    r AS (SELECT source,
                 round(sqrt(CAST((SELECT min(w) FROM s) AS DOUBLE) / w), 6)
                     AS keep_rate
          FROM s)
    SELECT d.doc_id, d.source, r.keep_rate,
           (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) / 4294967296.0) < r.keep_rate AS kept
    FROM documents d JOIN r USING (source)
    """,
    note="temperature-flattened source mixing (operators/pipeline.py:"
         "temperature_mix, T=2 on char weight): keep_rate = "
         "sqrt(W_min/W_s) per source — the p ∝ W^(1/T) curve anchored "
         "at the smallest source; integer-exact weight sums, IEEE sqrt, "
         "md5 keep decision, so the mix is engine-reproducible. Rates "
         "come from a dozens-of-rows aggregate (window never touches "
         "the corpus) and broadcast-join back")
def mix_temperature_flatten(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import temperature_mix
    return temperature_mix(tbl(spark, sf_dir, "documents"),
                           "doc_id", "source", "n_chars", flatten_exp=0.5)


@register(
    "batch_length_buckets",
    oracle="""
    WITH d AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
               FROM documents),
    q AS (SELECT
              percentile_disc(0.25) WITHIN GROUP (ORDER BY n_tokens) AS p25,
              percentile_disc(0.5)  WITHIN GROUP (ORDER BY n_tokens) AS p50,
              percentile_disc(0.75) WITHIN GROUP (ORDER BY n_tokens) AS p75
          FROM d)
    SELECT doc_id, n_tokens,
           CAST(1 + CASE WHEN n_tokens > p25 THEN 1 ELSE 0 END
                  + CASE WHEN n_tokens > p50 THEN 1 ELSE 0 END
                  + CASE WHEN n_tokens > p75 THEN 1 ELSE 0 END AS INT)
               AS bucket
    FROM d, q
    """,
    note="length-bucketed batching (operators/pipeline.py:length_buckets):"
         " docs split into quartile buckets of whitespace-token count at "
         "exact PERCENTILE_DISC boundaries (values that exist in the "
         "data — bitwise cross-engine), boundaries broadcast back — the "
         "padding-waste reducer in front of a training collator")
def batch_length_buckets(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import length_buckets
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_tokens"))
    return length_buckets(d, "doc_id", "n_tokens")


@register(
    "quality_repetition",
    oracle="""
    WITH wc AS (
        SELECT doc_id, word, count(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents) t
        GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_words,
           count(*) AS n_distinct,
           CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS BIGINT)
               AS distinct_ratio,
           CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS BIGINT)
               AS top_word_frac,
           CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
               / CAST(sum(cnt) AS BIGINT) AS dup_word_frac
    FROM wc GROUP BY doc_id
    """,
    note="Gopher-style repetition quality: distinct-word ratio, top-word "
         "fraction, repeated-occurrence fraction; integer counts, one "
         "IEEE-exact division at the end")
def quality_repetition(spark, sf_dir):
    return repetition_stats(tbl(spark, sf_dir, "documents"),
                            "text", "doc_id")


@register(
    "quantile_disc_exact",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           min(CASE WHEN cd >= 0.5 THEN v END) AS p50,
           min(CASE WHEN cd >= 0.9 THEN v END) AS p90
    FROM (SELECT l_returnflag, l_extendedprice AS v,
                 cume_dist() OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice) AS cd
          FROM lineitem) t
    GROUP BY 1
    """,
    note="exact PERCENTILE_DISC(0.5/0.9) per group via distributed "
         "window sort (smallest value with cume_dist >= p — actual data "
         "values, no interpolation, bitwise-portable); the exact "
         "counterpart of approx_quantiles")
def quantile_disc_exact(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    return quantile_disc(li, "l_returnflag", "l_extendedprice", (0.5, 0.9))


@register(
    "mode_per_group",
    oracle="""
    SELECT o_orderstatus, mode_value, mode_count FROM (
        SELECT o_orderstatus, o_orderpriority AS mode_value, cnt AS mode_count,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY cnt DESC, o_orderpriority) AS rn
        FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
              FROM orders GROUP BY 1, 2) c) t
    WHERE rn = 1
    """,
    note="deterministic per-group mode (ties -> smallest value); native "
         "mode() is partitioning-dependent on ties, this count+rank plan "
         "is not")
def mode_per_group(spark, sf_dir):
    return mode_deterministic(tbl(spark, sf_dir, "orders"),
                              "o_orderstatus", "o_orderpriority")


@register(
    "shuffle_shards",
    oracle=f"""
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
                AS INT) AS pos
    FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                 {_BUCKET.format(key='doc_id', n=8)} AS shard
          FROM documents) t
    """,
    note="deterministic sharded shuffle for training-batch interleaving: "
         "md5 shard + per-shard rank; per-shard windows parallelize where "
         "a global row_number would bottleneck on one partition")
def shuffle_shards_q(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    return shuffle_shards(d, "doc_id", n_shards=8).select(
        "doc_id", "shard", "pos")


@register(
    "rare_terms_df",
    oracle="""
    SELECT word, count(*) AS df, min(doc_id) AS example_doc
    FROM (SELECT DISTINCT doc_id, word
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents) u) t
    GROUP BY word HAVING count(*) <= 2
    """,
    note="document-frequency tail (df <= 2) for vocabulary pruning / "
         "tf-idf: distinct (doc, word) then count — integer-only output")
def rare_terms_df(spark, sf_dir):
    return rare_terms(tbl(spark, sf_dir, "documents"), "text", "doc_id",
                      max_df=2)


@register(
    "global_ids_dense",
    oracle=f"""
    SELECT doc_id, shard,
           row_number() OVER (ORDER BY shard, h, doc_id) - 1 AS global_id
    FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                 {_BUCKET.format(key='doc_id', n=16)} AS shard
          FROM documents) t
    """,
    note="dense 0..N-1 global IDs via two-phase prefix-sum (parallel "
         "per-shard ranks + broadcast shard offsets); the oracle's single "
         "global row_number states the semantics the distributed plan "
         "reproduces without a one-task sort")
def global_ids_dense(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import assign_global_ids
    d = tbl(spark, sf_dir, "documents")
    return assign_global_ids(d, "doc_id", n_shards=16).select(
        "doc_id", "shard", "global_id")


@register(
    "pipeline_prepare_corpus",
    oracle=rf"""
    WITH scrubbed AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(
                   lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                   '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                   'https?://[^ ]+', '<URL>', 'g'),
                   '[0-9]{{3}}-[0-9]{{4}}', '<PHONE>', 'g') AS c
        FROM documents),
    quality AS (
        SELECT doc_id, c,
               len(string_split(c, ' ')) AS n_words,
               len(list_distinct(string_split(c, ' '))) AS n_distinct
        FROM scrubbed),
    kept AS (
        SELECT doc_id, c FROM quality
        WHERE n_words >= 5
          AND CAST(n_distinct AS DOUBLE) / n_words >= 0.5),
    survivors AS (
        SELECT md5(c) AS text_hash, min(doc_id) AS doc_id, count(*) AS n_dups
        FROM kept GROUP BY 1)
    SELECT doc_id, n_dups, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, n_dups,
                 {_BUCKET.format(key='doc_id', n=100)} AS bucket
          FROM survivors) t
    """,
    note="the composed training-data pipeline: PII scrub -> quality gate "
         "(length + distinct-word ratio) -> exact dedup (min-id survivor "
         "per scrubbed hash) -> deterministic split. One declarative plan: "
         "scan -> narrow scrub/quality -> one dedup shuffle -> map-only "
         "split; every stage is the already-tested operator")
def pipeline_prepare_corpus(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import (
        repetition_stats as _rep,
        scrub_text as _scrub,
        split_assign as _split,
    )
    d = tbl(spark, sf_dir, "documents")
    s = _scrub(d, "text", "doc_id").select("doc_id",
                                           F.col("scrubbed").alias("c"))
    q = _rep(s.withColumnRenamed("c", "text"), "text", "doc_id")
    kept = (s.join(q.filter((F.col("n_words") >= 5) &
                            (F.col("distinct_ratio") >= 0.5))
                   .select("doc_id"), on="doc_id"))
    survivors = (kept.groupBy(F.md5("c").alias("text_hash"))
                 .agg(F.min("doc_id").alias("doc_id"),
                      F.count(F.lit(1)).alias("n_dups")))
    return (_split(survivors, "doc_id")
            .select("doc_id", "n_dups", "bucket", "split"))


@register(
    "mix_sources_epochs",
    oracle="""
    SELECT doc_id, lang, epoch FROM (
        SELECT doc_id, lang,
               CASE lang WHEN 'en' THEN 3 WHEN 'de' THEN 2 ELSE 1 END
                   AS n_epochs
        FROM documents) t,
    LATERAL unnest(generate_series(1, n_epochs)) AS u(epoch)
    """,
    note="epoch-weighted corpus mixing: integer oversampling per stratum "
         "(3x en, 2x de, 1x rest) via generated sequence explode — "
         "narrow, broadcast rates, no shuffle")
def mix_sources_epochs(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import mix_sources
    d = tbl(spark, sf_dir, "documents")
    out = mix_sources(d, "doc_id", "lang", {"en": 3, "de": 2},
                      default_epochs=1)
    return out.select("doc_id", "lang", F.col("epoch").cast("long"))


@register(
    "pack_context_windows",
    oracle=f"""
    SELECT doc_id, shard,
           CAST(floor((cum - toks) / 512) AS BIGINT) AS window_id,
           CAST((cum - toks) % 512 AS BIGINT) AS offset_in_window
    FROM (
        SELECT doc_id, shard, toks,
               sum(toks) OVER (PARTITION BY shard ORDER BY h, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum
        FROM (SELECT doc_id,
                     len(string_split(text, ' ')) AS toks,
                     md5(CAST(doc_id AS VARCHAR)) AS h,
                     {_BUCKET.format(key='doc_id', n=8)} AS shard
              FROM documents) b) c
    """,
    note="context-window packing: shard-local running token offsets -> "
         "window_id = floor(offset/512); parallel per shard (no global "
         "sequential pass), deterministic md5 order")
def pack_context_windows_q(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import pack_context_windows
    d = tbl(spark, sf_dir, "documents")
    with_toks = d.withColumn("toks", F.size(F.split("text", " ")))
    out = pack_context_windows(with_toks, "doc_id", "toks",
                               budget=512, n_shards=8)
    return out.select("doc_id", "shard", "window_id", "offset_in_window")


@register(
    "sample_k_per_group",
    oracle=f"""
    SELECT doc_id, lang, rn FROM (
        SELECT doc_id, lang,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS INT) AS rn
        FROM documents) t
    WHERE rn <= 10
    """,
    note="exactly-k-per-class sampling: rank by md5 within the stratum, "
         "keep k — deterministic reservoir (same corpus -> same sample), "
         "one shuffle on the stratum; the 'k examples per class' op of "
         "every eval-set builder")
def sample_k_per_group(spark, sf_dir):
    from pyspark.sql import Window
    d = tbl(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    # Two-phase exact top-k (r9 scale audit): a single
    # Window.partitionBy(lang) would sort the WHOLE corpus through
    # |langs| tasks — the same bounded-cardinality ceiling the SNM
    # rebuild removed. Phase 1 ranks within (lang, salt) and keeps k
    # per salt cell (the global top-k per lang is a subset of the
    # union of per-salt top-ks under the same total order); phase 2
    # re-ranks the <= 64*k survivors per lang. Output is identical to
    # the single-window form — the oracle stays the one-window twin.
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(64))
    w1 = Window.partitionBy("lang", "__s").orderBy(h, "doc_id")
    w2 = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (d.withColumn("__s", salt)
            .withColumn("__rn1", F.row_number().over(w1))
            .filter(F.col("__rn1") <= 10)
            .withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= 10)
            .select("doc_id", "lang", "rn"))


@register(
    "table_fingerprint",
    oracle=f"""
    SELECT count(*) AS n_rows,
           CAST(sum({_BUCKET.format(key='o_orderkey', n=1000000007)})
                AS BIGINT) AS fp_orderkey,
           CAST(sum({_BUCKET.format(key='o_orderstatus', n=1000000007)})
                AS BIGINT) AS fp_status,
           CAST(sum({_BUCKET.format(
                key="CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)",
                n=1000000007)}) AS BIGINT) AS fp_price
    FROM orders
    """,
    note="order-insensitive table fingerprint: per-column sums of "
         "md5-derived integers — two tables are (whp) identical iff "
         "fingerprints match, compared without moving either (migration/"
         "replication validation at 100 TB: one scan per side, 4 numbers "
         "across the wire)")
def table_fingerprint(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import portable_bucket
    o = tbl(spark, sf_dir, "orders")
    P = 1000000007
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(portable_bucket(F.col("o_orderkey"), P)).alias("fp_orderkey"),
        F.sum(portable_bucket(F.col("o_orderstatus"), P)).alias("fp_status"),
        F.sum(portable_bucket(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), P))
        .alias("fp_price"))


@register(
    "weighted_sample_es",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(CAST(
               ln((CAST(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                              1, 8)) AS BIGINT) AS DOUBLE) + 0.5)
                  / 4294967296.0)
               / o_totalprice AS DECIMAL(28,9)) AS DOUBLE) AS es_key
    FROM orders ORDER BY es_key DESC, o_orderkey LIMIT 100
    """,
    note="Efraimidis-Spirakis weighted sampling: top-100 orders by "
         "ln(md5-uniform)/weight — deterministic, engine-portable, lowers "
         "to TakeOrderedAndProject (no shuffle of the data); the "
         "weight-proportional pick for corpus mixing at 100 TB")
def weighted_sample_es(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import weighted_sample
    return weighted_sample(tbl(spark, sf_dir, "orders"), "o_orderkey",
                           "o_totalprice", k=100)


@register(
    "dsir_importance_select",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, (source IN ('src1', 'src2', 'src3')) AS tgt,
             string_split(text, ' ') AS ws
      FROM documents),
    g AS (
      SELECT doc_id, tgt,
             unnest(list_concat(ws,
                 CASE WHEN len(ws) >= 2
                      THEN list_transform(range(1, len(ws)),
                                          i -> ws[i] || ' ' || ws[i + 1])
                      ELSE [] END)) AS gram
      FROM w),
    b AS (SELECT doc_id, tgt, {_BUCKET.format(key='gram', n=256)} AS bk
          FROM g),
    db AS (SELECT doc_id, tgt, bk, CAST(count(*) AS BIGINT) AS n
           FROM b GROUP BY 1, 2, 3),
    cnt AS (SELECT bk, SUM(n) AS c_r,
                   SUM(CASE WHEN tgt THEN n ELSE 0 END) AS c_t
            FROM db GROUP BY bk),
    tot AS (SELECT SUM(c_r) AS t_r, SUM(c_t) AS t_t FROM cnt),
    dlt AS (SELECT bk,
                   CAST(CAST(ln(CAST(c_t + 1 AS DOUBLE) / (t_t + 256))
                             AS DECIMAL(28,9))
                        - CAST(ln(CAST(c_r + 1 AS DOUBLE) / (t_r + 256))
                               AS DECIMAL(28,9)) AS DECIMAL(28,9)) AS d
            FROM cnt, tot),
    doc AS (SELECT doc_id, CAST(SUM(n) AS INT) AS n_grams,
                   SUM(CAST(n AS DECIMAL(9,0)) * d) AS lw
            FROM db JOIN dlt USING (bk) GROUP BY doc_id)
    SELECT doc_id, n_grams, CAST(lw AS DOUBLE) AS log_w,
           CAST(CAST(lw AS DECIMAL(28,9)) + CAST(-ln(-ln(
               (CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                           1, 8)) AS BIGINT) AS DOUBLE) + 0.5)
               / 4294967296.0)) AS DECIMAL(28,9)) AS DOUBLE) AS sel_key
    FROM doc ORDER BY sel_key DESC, doc_id LIMIT 100
    """,
    note="DSIR data selection (Xie et al. 2023, arXiv:2302.03169): "
         "importance weights from hashed unigram+bigram bag-of-buckets "
         "models (256 md5 buckets, add-one smoothing) of a target slice "
         "(sources src1-3) vs the raw corpus, then Gumbel top-100 "
         "resampling — sampling without replacement proportional to "
         "exp(log_w). Per-bucket log ratios are DECIMAL(28,9)-rounded "
         "once on the 256-row model table, per-doc weights are exact "
         "decimal sums over the pre-aggregated (doc, bucket) frame, and "
         "the Gumbel key reuses the portable md5-uniform — fully "
         "deterministic, engine-portable "
         "(operators/pipeline.py::dsir_select)")
def dsir_importance_select(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import dsir_select
    return dsir_select(tbl(spark, sf_dir, "documents"), "text", "doc_id",
                       "source", ("src1", "src2", "src3"),
                       n_buckets=256, k=100)


@register(
    "pipeline_chunk_overlap",
    oracle="""
    WITH d AS (SELECT doc_id, text,
                      1 + CAST(ceil(greatest(length(text) - 64, 0)
                                    / 48.0) AS INT) AS nc
               FROM documents),
    ch AS (SELECT doc_id, text,
                  unnest(generate_series(0, nc - 1)) AS chunk_id
           FROM d)
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(chunk_id * 48 + 1 AS INT) AS c_start,
           substr(text, CAST(chunk_id * 48 + 1 AS INT), 64) AS c_text,
           CAST(length(substr(text, CAST(chunk_id * 48 + 1 AS INT), 64))
                AS INT) AS c_len
    FROM ch
    """,
    note="Sliding-window RAG chunking: 64-char chunks at stride 48 "
         "(16-char overlap), chunk count in closed form, last chunk "
         "may run short, every char covered. Map-side only — "
         "sequence + explode + substr, no shuffle, no UDF "
         "(operators/pipeline.py::chunk_overlap)")
def pipeline_chunk_overlap(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import chunk_overlap

    return chunk_overlap(tbl(spark, sf_dir, "documents"),
                         "text", "doc_id", size=64, stride=48)


@register(
    "pipeline_token_budget_mix",
    oracle="""
    WITH t AS (SELECT source AS domain,
                      count(*) AS n_docs,
                      CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                          AS avail_tokens,
                      CAST(CASE WHEN source = 'src0' THEN 400000
                                WHEN source = 'src1' THEN 150000
                                ELSE 25000 END AS BIGINT) AS weight_ppm
               FROM documents GROUP BY source),
    p AS (SELECT *,
                 (weight_ppm * CAST(20000 AS BIGINT)) // 1000000
                     AS target_tokens
          FROM t),
    e AS (SELECT *,
                 (target_tokens * CAST(1000000 AS BIGINT))
                     // avail_tokens AS epochs_ppm
          FROM p),
    c AS (SELECT *, epochs_ppm > 4000000 AS capped,
                 CAST((avail_tokens * least(epochs_ppm,
                       CAST(4000000 AS BIGINT))) // 1000000 AS BIGINT)
                     AS planned_tokens
          FROM e)
    SELECT domain, n_docs, avail_tokens, weight_ppm, target_tokens,
           CAST(epochs_ppm AS BIGINT) AS epochs_ppm, capped,
           planned_tokens,
           greatest(target_tokens - planned_tokens,
                    CAST(0 AS BIGINT)) AS shortfall
    FROM c
    """,
    note="Token-budget mixture planner (the epochs-per-domain solver a "
         "curation run executes before sampling): per-domain available "
         "tokens vs target share of a 20k-token budget (weights in ppm "
         "as plan literals: src0 40%, src1 15%, rest 2.5% each), "
         "repeat factor in ppm fixed-point with a 4-epoch cap "
         "(Muennighoff et al. 2023) and the post-cap shortfall. One "
         "aggregation pass; pure integer floor arithmetic; quotas feed "
         "weighted_sample/mix_sources downstream "
         "(operators/pipeline.py::token_budget_mix)")
def pipeline_token_budget_mix(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import token_budget_mix

    docs = tbl(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")))
    return token_budget_mix(
        docs, "source", "n_tokens",
        weights_ppm={"src0": 400000, "src1": 150000},
        default_ppm=25000, budget_tokens=20000,
        max_epochs_ppm=4_000_000).select(
            "domain", "n_docs", "avail_tokens", "weight_ppm",
            "target_tokens", "epochs_ppm", "capped", "planned_tokens",
            "shortfall")


@register(
    "pipeline_shard_rendezvous",
    oracle="""
    WITH s8 AS (SELECT unnest(['s0','s1','s2','s3','s4','s5','s6','s7'])
                    AS s),
    s9 AS (SELECT s FROM s8 UNION ALL SELECT 's8'),
    a8 AS (SELECT doc_id, s AS shard8 FROM (
               SELECT d.doc_id, s8.s,
                      row_number() OVER (PARTITION BY d.doc_id
                          ORDER BY md5(CAST(d.doc_id AS VARCHAR)
                                       || ':' || s8.s) DESC, s8.s DESC)
                          AS rn
               FROM documents d, s8) t WHERE rn = 1),
    a9 AS (SELECT doc_id, s AS shard9 FROM (
               SELECT d.doc_id, s9.s,
                      row_number() OVER (PARTITION BY d.doc_id
                          ORDER BY md5(CAST(d.doc_id AS VARCHAR)
                                       || ':' || s9.s) DESC, s9.s DESC)
                          AS rn
               FROM documents d, s9) t WHERE rn = 1)
    SELECT a8.doc_id, shard8, shard9,
           shard8 != shard9 AS moved
    FROM a8 JOIN a9 ON a8.doc_id = a9.doc_id
    """,
    note="Rendezvous/HRW sharding (Thaler & Ravishankar 1998): key -> "
         "argmax over shards of md5(key:shard), map-only via one "
         "array_max over (hash, shard) structs. The entry assigns "
         "every doc under 8 AND 9 shards and emits the moved flag — "
         "the minimal-disruption property (only keys whose new-shard "
         "roll wins relocate, ~1/9 of them) is the whole point vs "
         "mod-N. Engine-portable hex convention; moved keys all land "
         "on the NEW shard by construction "
         "(operators/pipeline.py::rendezvous_assign)")
def pipeline_shard_rendezvous(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import rendezvous_assign

    docs = tbl(spark, sf_dir, "documents").select("doc_id")
    s8 = [f"s{i}" for i in range(8)]
    a8 = rendezvous_assign(docs, "doc_id", s8, "shard8")
    a9 = rendezvous_assign(a8, "doc_id", s8 + ["s8"], "shard9")
    return a9.select(
        "doc_id", "shard8", "shard9",
        (F.col("shard8") != F.col("shard9")).alias("moved"))


@register(
    "sample_neyman_allocation",
    oracle="""
    WITH base AS (SELECT c_mktsegment AS h, c_custkey AS id,
                         CAST(round(c_acctbal * 100) AS BIGINT) AS v
                  FROM customer),
    mo AS (SELECT h, count(*) AS n,
                  sum(CAST(v AS DECIMAL(38,0))) AS s,
                  sum(CAST(v AS DECIMAL(38,0)) * v) AS ss
           FROM base GROUP BY 1),
    wt AS (SELECT h, n,
                  n * CAST(round(sqrt((CAST(ss AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                 / CAST(n AS DOUBLE))
                              / (CAST(n AS DOUBLE) - 1)) * 1e6)
                           AS BIGINT) AS w
           FROM mo),
    tot AS (SELECT sum(w) AS wsum FROM wt),
    alloc AS (SELECT h, n,
                     least(CAST(500 AS BIGINT) * w // wsum,
                           CAST(n AS BIGINT)) AS a
              FROM wt, tot),
    ranked AS (SELECT b.h, b.v, a.n, a.a,
                      row_number() OVER (
                          PARTITION BY b.h
                          ORDER BY md5(CAST(b.id AS VARCHAR)), b.id)
                          AS rn
               FROM base b JOIN alloc a USING (h))
    SELECT h AS c_mktsegment,
           CAST(max(n) AS BIGINT) AS stratum_rows,
           CAST(max(a) AS BIGINT) AS n_alloc,
           CAST(count(*) AS BIGINT) AS n_sampled,
           round(CAST(sum(v) AS DOUBLE) / (100.0 * count(*)), 9)
               AS sample_mean
    FROM ranked WHERE rn <= a GROUP BY h
    """,
    note="Neyman-allocation stratified sample (n=500 of customers by "
         "segment, allocated by N_h*S_h): stddevs from exact DECIMAL "
         "moments round to 6 decimals and scale to exact BIGINT "
         "weights, so the floor allocation is pure integer arithmetic "
         "— immune to cross-strata float summation order; selection "
         "is the portable md5-rank window per stratum "
         "(operators/pipeline.py::neyman_stratified_sample)")
def sample_neyman_allocation(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import (
        neyman_stratified_sample)
    cust = tbl(spark, sf_dir, "customer")
    return neyman_stratified_sample(cust, "c_mktsegment", "c_acctbal",
                                    "c_custkey", n_total=500)


@register(
    "sample_negative_unigram",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents),
    cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
    wt AS (SELECT w, c,
                  CAST(round(sqrt(CAST(c AS DOUBLE)
                                  * sqrt(CAST(c AS DOUBLE))) * 1e6)
                       AS BIGINT) AS wgt
           FROM cnt),
    rng AS (SELECT w, c, wgt,
                   sum(wgt) OVER (ORDER BY c DESC, w
                                  ROWS UNBOUNDED PRECEDING) AS hi
            FROM wt),
    rng2 AS (SELECT w, wgt, hi - wgt AS lo, hi FROM rng),
    tot AS (SELECT max(hi) AS t FROM rng2),
    draws AS (SELECT CAST((CAST(CAST(('0x' || substr(
                       md5(CAST(i AS VARCHAR)), 1, 8)) AS BIGINT)
                       AS HUGEINT) * 4294967296
                     + CAST(('0x' || substr(md5(CAST(i AS VARCHAR)),
                                            9, 8)) AS BIGINT))
                     % (SELECT t FROM tot) AS BIGINT) AS u
              FROM generate_series(1, 1000) g(i))
    SELECT r.w AS token, CAST(r.wgt AS BIGINT) AS weight,
           CAST(count(*) AS BIGINT) AS n_drawn
    FROM rng2 r JOIN draws d ON d.u >= r.lo AND d.u < r.hi
    GROUP BY 1, 2
    """,
    note="word2vec-style negative sampling from the smoothed unigram "
         "distribution p(w) ∝ count^0.75: the exponent computes as "
         "sqrt(c*sqrt(c)) — correctly-rounded IEEE ops only, no libm "
         "pow — scaled to exact BIGINT cumulative ranges, and each of "
         "1000 deterministic md5 points inverts the CDF via a range "
         "join (draws broadcast). Reproducible sampling as a row "
         "property, the repo's no-rand() discipline "
         "(operators/pipeline.py::negative_sample_unigram)")
def sample_negative_unigram(spark, sf_dir):
    from mapreduce_wsi_spark.operators.pipeline import (
        negative_sample_unigram)
    docs = tbl(spark, sf_dir, "documents")
    return negative_sample_unigram(docs, "text", n_draws=1000)


@register(
    "pipeline_data_card",
    oracle="""
    WITH base AS (SELECT doc_id, lang, source, n_chars,
                         len(string_split(text, ' ')) AS n_words,
                         md5(text) AS h
                  FROM documents),
    dup AS (SELECT count(*) AS n_docs,
                   count(DISTINCT h) AS n_unique,
                   count(DISTINCT lang) AS n_langs,
                   count(DISTINCT source) AS n_sources,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(n_words) AS BIGINT) AS total_words,
                   CAST(min(n_chars) AS BIGINT) AS min_chars,
                   CAST(max(n_chars) AS BIGINT) AS max_chars
            FROM base)
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_unique AS BIGINT) AS n_unique_texts,
           CAST(n_docs - n_unique AS BIGINT) AS n_exact_dups,
           CAST(n_langs AS BIGINT) AS n_langs,
           CAST(n_sources AS BIGINT) AS n_sources,
           total_chars, total_words, min_chars, max_chars,
           round(CAST(total_words AS DOUBLE) / n_docs, 9)
               AS mean_words_per_doc,
           (n_docs - n_unique) * 1000000 // n_docs AS dup_ppm
    FROM dup
    """,
    note="the data card: the one-row corpus summary a training-data "
         "release ships — doc/unique/dup counts (md5 content "
         "identity), language and source cardinalities, exact char/"
         "word totals and bounds, integer-ppm dup rate. ONE "
         "aggregation pass (count-distincts share the scan via "
         "partial aggregation); every number exact except the single "
         "mean division")
def pipeline_data_card(spark, sf_dir):
    from mapreduce_wsi_spark.operators.text import words
    docs = tbl(spark, sf_dir, "documents")
    base = docs.select(
        "lang", "source", "n_chars",
        F.size(words(F.col("text"))).alias("n_words"),
        F.md5("text").alias("h"))
    d = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h").alias("n_unique"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"))
    return d.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_unique").cast("long").alias("n_unique_texts"),
        (F.col("n_docs") - F.col("n_unique")).cast("long")
        .alias("n_exact_dups"),
        F.col("n_langs").cast("long").alias("n_langs"),
        F.col("n_sources").cast("long").alias("n_sources"),
        "total_chars", "total_words", "min_chars", "max_chars",
        F.round(F.col("total_words").cast("double") / F.col("n_docs"),
                9).alias("mean_words_per_doc"),
        F.expr("(n_docs - n_unique) * 1000000L div n_docs")
        .alias("dup_ppm"))


@register(
    "pack_utilization_stats",
    oracle="""
    WITH t AS (SELECT doc_id,
                      len(string_split(text, ' ')) AS tok,
                      CAST(CAST(('0x' || substr(md5(CAST(doc_id
                               AS VARCHAR)), 1, 8)) AS BIGINT) % 8
                           AS INT) AS shard,
                      md5(CAST(doc_id AS VARCHAR)) AS h
               FROM documents),
    o AS (SELECT shard, tok,
                 COALESCE(sum(tok) OVER (PARTITION BY shard
                                         ORDER BY h, doc_id
                                         ROWS BETWEEN UNBOUNDED
                                         PRECEDING AND 1 PRECEDING),
                          0) AS off
          FROM t),
    w AS (SELECT shard, CAST(off // 512 AS BIGINT) AS window_id,
                 sum(tok) AS toks
          FROM o GROUP BY 1, 2),
    lastw AS (SELECT shard, max(window_id) AS last_w FROM w
              GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(w.toks) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN w.window_id < l.last_w
                         THEN w.toks ELSE 0 END) AS BIGINT)
               AS full_window_tokens,
           CAST(sum(CASE WHEN w.window_id < l.last_w THEN 1 ELSE 0
                    END) AS BIGINT) AS n_full_windows,
           CAST(CASE WHEN sum(CASE WHEN w.window_id < l.last_w
                                   THEN 1 ELSE 0 END) > 0 THEN
               sum(CASE WHEN w.window_id < l.last_w THEN w.toks
                        ELSE 0 END) * 1000000
               // (512 * sum(CASE WHEN w.window_id < l.last_w
                                  THEN 1 ELSE 0 END))
           END AS BIGINT) AS utilization_ppm
    FROM w JOIN lastw l USING (shard)
    """,
    note="packing-efficiency report over pack_context_windows' shard-"
         "parallel scheme (budget 512, 8 shards): window token loads, "
         "and the mean fill of CLOSED windows (each shard's trailing "
         "window is legitimately partial and excluded) in exact "
         "integer ppm — the waste metric that decides whether the "
         "boundary-straddle trade needs sequence-splitting. Same "
         "md5-ordered shard-local running sums as the packer "
         "(operators/pipeline.py::pack_context_windows)")
def pack_utilization_stats(spark, sf_dir):
    from pyspark.sql import Window
    from mapreduce_wsi_spark.operators.text import words
    docs = tbl(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    t = docs.select(
        "doc_id",
        F.size(words(F.col("text"))).alias("tok"),
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 8)
        .cast("int").alias("shard"),
        h.alias("h"))
    w_ord = (Window.partitionBy("shard").orderBy("h", "doc_id")
             .rowsBetween(Window.unboundedPreceding, -1))
    o = t.withColumn("off", F.coalesce(F.sum("tok").over(w_ord),
                                       F.lit(0)))
    w = (o.groupBy("shard",
                   F.expr("off div 512").cast("long")
                   .alias("window_id"))
         .agg(F.sum("tok").alias("toks")))
    lastw = w.groupBy("shard").agg(F.max("window_id").alias("last_w"))
    j = w.join(lastw, "shard")
    closed = F.col("window_id") < F.col("last_w")
    agg = j.agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("toks").cast("long").alias("total_tokens"),
        F.sum(F.when(closed, F.col("toks")).otherwise(0)).cast("long")
        .alias("full_window_tokens"),
        F.sum(F.when(closed, 1).otherwise(0)).cast("long")
        .alias("n_full_windows"))
    return agg.select(
        "n_windows", "total_tokens", "full_window_tokens",
        "n_full_windows",
        F.when(F.col("n_full_windows") > 0,
               F.expr("full_window_tokens * 1000000L "
                      "div (512 * n_full_windows)"))
        .alias("utilization_ppm"))
