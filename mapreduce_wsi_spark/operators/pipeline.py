"""Training-data pipeline operators: deterministic splits and sampling,
PII scrubbing, benchmark decontamination, repetition-quality stats, exact
distributed quantiles, and sharded shuffle for batch interleaving.

These extend the reference's surface per the north star (BASELINE.json) —
the reference itself delegates all record-level logic to user map/reduce
code (/root/reference/src/de/uni_stuttgart/ipvs_as/MapReduceWSI.java:62-105);
here each op is a native, declarative DataFrame plan.

Every selection decision uses an md5-derived bucket — never ``rand()`` —
so splits/samples are reproducible row properties, not run artifacts:
re-running at 100 TB yields byte-identical assignments, joins between a
doc and its split are unnecessary (the split is derivable), and adding
data never reshuffles existing assignments. All bucket math is integer
(no float thresholds drifting between engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def portable_bucket(col: Column, n_buckets: int = 100) -> Column:
    """Deterministic engine-portable bucket in [0, n_buckets): first 8 hex
    chars of md5 -> 32-bit int -> mod. Unlike ``F.hash`` (Murmur3, Spark-
    private) this reproduces identically in DuckDB/Trino/Python, so split
    membership can be audited outside the engine. Narrow (map-only)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % n_buckets).cast("int")


def split_assign(df: DataFrame, key_col: str,
                 breaks: tuple[int, int] = (80, 90)) -> DataFrame:
    """Train/val/test assignment by hash bucket of a stable key. Map-only:
    no shuffle, no state, no split-membership table to join at read time —
    the assignment IS a function of the key, which is the only strategy
    that stays consistent when the corpus grows to 100 TB."""
    b = portable_bucket(F.col(key_col))
    split = (F.when(b < breaks[0], "train")
             .when(b < breaks[1], "val")
             .otherwise("test"))
    return df.withColumn("bucket", b).withColumn("split", split)


def stratified_sample(df: DataFrame, key_col: str, stratum_col: str,
                      rates_pct: dict[str, int],
                      default_pct: int = 10) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its hash bucket
    falls under its stratum's percentage. The rates table is a broadcast
    join (dozens of strata vs billions of rows), keeping the op map-side;
    ``sampleBy`` would give a random, non-reproducible subset instead."""
    from mapreduce_wsi_spark.util import literal_df
    spark = df.sparkSession
    rates = literal_df(spark,
                       [(k, int(v)) for k, v in rates_pct.items()],
                       f"{stratum_col} string, pct int")
    b = portable_bucket(F.col(key_col))
    return (df.join(F.broadcast(rates), on=stratum_col, how="left")
            .withColumn("pct", F.coalesce("pct", F.lit(default_pct)))
            .withColumn("bucket", b)
            .filter(F.col("bucket") < F.col("pct")))


# Redaction patterns deliberately restricted to the regex subset with
# identical semantics in Java (Spark) and RE2 (DuckDB/Go): plain char
# classes, no lookaround, no backrefs.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"),
    (r"https?://[^ ]+", "<URL>"),
    (r"[0-9]{3}-[0-9]{4}", "<PHONE>"),
)


def scrub_text(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Normalize + redact: lowercase, collapse whitespace, replace
    emails/URLs/phone-shaped tokens with typed placeholders, and count
    redactions per kind. Pure narrow projection — the 100 TB cost is one
    scan, no shuffle, and Catalyst pipelines it into adjacent stages."""
    c = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    counts = []
    for pat, tag in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
                      .alias(f"n_{tag.strip('<>').lower()}"))
        c = F.regexp_replace(c, pat, tag)
    return df.select(F.col(id_col), c.alias("scrubbed"), *counts)


def decontaminate(corpus: DataFrame, benchmark: DataFrame, text_col: str,
                  id_col: str, n: int = 5) -> DataFrame:
    """Test-set decontamination: flag corpus docs sharing >=1 word n-gram
    with any benchmark doc. Both sides shingle (distinct n-grams), then an
    equi-join on the shingle — never a doc x doc cross product. The
    benchmark side is tiny relative to the corpus, so its shingle set is
    broadcast: the whole op is one corpus scan + map-side join + one
    groupBy(doc). Returns (doc_id, n_shared_shingles, n_bench_docs_hit)."""
    from mapreduce_wsi_spark.operators.dedup import word_shingles
    c_sh = word_shingles(corpus, text_col, id_col, n=n)
    b_sh = (word_shingles(benchmark, text_col, id_col, n=n)
            .withColumnRenamed("id", "bench_id"))
    hits = c_sh.join(F.broadcast(b_sh), on="shingle", how="inner")
    return (hits.groupBy(F.col("id").alias(id_col))
            .agg(F.countDistinct("shingle").alias("n_shared_shingles"),
                 F.countDistinct("bench_id").alias("n_bench_docs_hit")))


def temperature_mix(df: DataFrame, key_col: str, stratum_col: str,
                    weight_col: str,
                    flatten_exp: float = 0.5) -> DataFrame:
    """Temperature-flattened source mixing: per-stratum deterministic
    downsampling with keep rate ``(W_min / W_s) ** flatten_exp`` where
    ``W_s`` is the stratum's total weight (tokens/chars) — the standard
    ``p_s ∝ W_s^(1/T)`` temperature-sampling curve with ``flatten_exp =
    1 - 1/T``, anchored so the smallest stratum keeps everything
    (rates never exceed 1, no oversampling needed). ``flatten_exp=0``
    keeps all (T=1, proportional); ``flatten_exp=1`` equalizes expected
    weight across strata (T→∞, uniform); the default 0.5 is T=2.

    Plan: one per-stratum aggregation (integer-exact weight sums), a
    window over that DOZENS-OF-ROWS aggregate for W_min (never over the
    corpus), a broadcast join of the rates back, and the same
    engine-portable md5 keep decision as ``stratified_sample`` — so
    the selected subset is reproducible and auditable outside Spark.
    W_min/W_s is a ratio of exact integers and exponent 0.5 goes
    through IEEE-correctly-rounded sqrt, so the rounded rate is
    bit-identical in any engine; other exponents ride libm pow
    (deterministic per platform, 1-ulp across libms).

    Returns the input keys with (stratum, keep_rate, kept)."""
    stats = (df.groupBy(stratum_col)
             .agg(F.sum(weight_col).cast("long").alias("__w")))
    everything = Window.partitionBy()
    ratio = (F.min("__w").over(everything).cast("double")
             / F.col("__w").cast("double"))
    flat = F.sqrt(ratio) if flatten_exp == 0.5 else \
        F.pow(ratio, F.lit(float(flatten_exp)))
    rates = stats.select(
        stratum_col, F.round(flat, 6).alias("keep_rate"))
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8),
               16, 10).cast("long")
    return (df.join(F.broadcast(rates), on=stratum_col)
            .select(F.col(key_col), F.col(stratum_col), F.col("keep_rate"),
                    ((h / F.lit(4294967296.0)) < F.col("keep_rate"))
                    .alias("kept")))


def decontaminate_bloom(corpus: DataFrame, benchmark: DataFrame,
                        text_col: str, id_col: str, n: int = 4,
                        n_bits_log2: int = 20,
                        n_hashes: int = 2) -> DataFrame:
    """``decontaminate`` with a Bloom-filter prefilter in front of the
    exact shingle join — the 100 TB shape: the benchmark's shingle set
    may be millions of strings, but its Bloom BIT-POSITION set is a few
    hundred thousand ints. Corpus shingles hash into the same ``2 **
    n_bits_log2``-bit space (``n_hashes`` seeded xxhash64 positions) and
    must hit on EVERY position (one broadcast semi-join per hash — the
    Bloom AND); only survivors reach the exact string equi-join, which
    removes the false positives. Output is therefore EXACTLY
    ``decontaminate(...)``'s — the Bloom stage changes bytes shuffled,
    not results — while the corpus-side join key narrows from arbitrary
    strings to 8-byte ints. Returns (doc, n_shared_shingles,
    n_bench_docs_hit) like ``decontaminate``."""
    from mapreduce_wsi_spark.operators.dedup import word_shingles
    c_sh = word_shingles(corpus, text_col, id_col, n=n)
    b_sh = (word_shingles(benchmark, text_col, id_col, n=n)
            .withColumnRenamed("id", "bench_id"))
    m = 1 << n_bits_log2

    def positions(col):
        return [F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m))
                for seed in range(n_hashes)]

    survivors = c_sh
    for k, pos in enumerate(positions(F.col("shingle"))):
        bits = (b_sh.select(pos.alias(f"__pos{k}")).distinct())
        survivors = (survivors.withColumn(f"__pos{k}", pos)
                     .join(F.broadcast(bits), f"__pos{k}", "left_semi"))
    hits = survivors.join(F.broadcast(b_sh), on="shingle", how="inner")
    return (hits.groupBy(F.col("id").alias(id_col))
            .agg(F.countDistinct("shingle").alias("n_shared_shingles"),
                 F.countDistinct("bench_id").alias("n_bench_docs_hit")))


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition quality: distinct-word ratio, top-word
    fraction, and the fraction of word occurrences belonging to repeated
    words.

    Zero-shuffle: every ratio is a per-row property of the word array, so
    per-word counts are computed row-locally with higher-order functions
    (O(distinct x words) per doc). The exploded alternative — groupBy
    (doc, word) then a per-doc rollup — pushes the corpus's entire token
    stream through two exchanges, which is the dominant cost at 100 TB;
    this plan is scan -> project, pipelined into whatever runs next.
    Integer counts with IEEE-exact final divisions keep the oracle
    comparison bitwise."""
    d = df.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("__w"),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("__dw"))
    cnts = "transform(__dw, x -> size(filter(__w, y -> y = x)))"
    d = d.select(
        id_col,
        F.size("__w").cast("long").alias("n_words"),
        F.size("__dw").cast("long").alias("n_distinct"),
        F.array_max(F.expr(cnts)).cast("long").alias("top_cnt"),
        F.expr(f"aggregate(filter({cnts}, c -> c > 1), "
               f"cast(0 as bigint), (a, c) -> a + c)").alias("rep_cnt"))
    return d.select(
        id_col, "n_words", "n_distinct",
        (F.col("n_distinct").cast("double") / F.col("n_words"))
        .alias("distinct_ratio"),
        (F.col("top_cnt").cast("double") / F.col("n_words"))
        .alias("top_word_frac"),
        (F.col("rep_cnt").cast("double") / F.col("n_words"))
        .alias("dup_word_frac"))


def quantile_disc(df: DataFrame, group_col: str, value_col: str,
                  ps: tuple[float, ...] = (0.5, 0.9)) -> DataFrame:
    """Exact discrete percentiles per group (PERCENTILE_DISC semantics:
    smallest actual value whose cume_dist >= p — no interpolation, so
    results are values that exist in the data and compare bitwise across
    engines). r10: per-VALUE cumsum form, applied at the shared helper
    so every consumer (quantile_disc_exact, winsorized trim bounds,
    MAD medians, length_buckets boundaries) drops the raw-row
    cume_dist window at once: groupBy (group, value) counts first —
    partial-aggregated map-side — then cumsum the per-value aggregate,
    whose row count is value-domain bounded at any corpus size.
    cume_dist of a row equals cum(count)/n of its value with the SAME
    integer operands and the same single double division, so the picks
    are bit-identical and every cume_dist-based DuckDB oracle is
    unchanged (the r9 percentile-rewrite equivalence, SCALE.md)."""
    per_v = (df.groupBy(group_col, F.col(value_col).alias("v"))
             .agg(F.count(F.lit(1)).alias("__c")))
    w = (Window.partitionBy(group_col).orderBy("v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy(group_col)
    scored = (per_v.withColumn("__cum", F.sum("__c").over(w))
              .withColumn("__n", F.sum("__c").over(wt))
              .withColumn("cd", F.col("__cum") / F.col("__n")))
    aggs = [F.sum("__c").alias("n")]
    for p in ps:
        tag = f"p{int(p * 100)}"
        aggs.append(F.min(F.when(F.col("cd") >= p, F.col("v"))).alias(tag))
    return scored.groupBy(group_col).agg(*aggs)


def length_buckets(df: DataFrame, key_col: str, value_col: str,
                   ps: tuple[float, ...] = (0.25, 0.5, 0.75)) -> DataFrame:
    """Length-bucketed batching assignment: split rows into ``len(ps)+1``
    buckets at the exact PERCENTILE_DISC boundaries of ``value_col``
    (token/char counts) — batching sequences of similar length is the
    standard padding-waste reduction in front of a training collator,
    and percentile boundaries keep the buckets balanced whatever the
    length distribution. Boundaries come from one ``quantile_disc``
    aggregate (values that exist in the data — bitwise comparable
    cross-engine) broadcast back over the corpus; bucket = 1 + number of
    boundaries strictly below the value. Boundary extraction rides
    quantile_disc's per-value cumsum (value-domain bounded, no raw-row
    sort since r10); at 100 TB approxQuantile boundaries remain the
    cheap swap (the bucket JOIN shape is unchanged)."""
    g = df.select(F.lit(1).alias("__g"), F.col(key_col),
                  F.col(value_col))
    q = quantile_disc(g, "__g", value_col, ps=ps).drop("n")
    joined = g.join(F.broadcast(q), "__g")
    bucket = F.lit(1)
    for p in ps:
        tag = f"p{int(p * 100)}"
        bucket = bucket + F.when(F.col(value_col) > F.col(tag), 1) \
            .otherwise(0)
    return joined.select(F.col(key_col), F.col(value_col),
                         bucket.cast("int").alias("bucket"))


def mode_deterministic(df: DataFrame, group_col: str,
                       value_col: str) -> DataFrame:
    """Per-group mode with a total tie-break (highest count, then smallest
    value) — deterministic unlike Spark's native ``mode()``, whose tie
    winner is partitioning-dependent. Count-then-rank: the heavy lifting
    is a partial-aggregated groupBy; the window only sees one row per
    (group, value)."""
    counts = (df.groupBy(group_col, value_col)
              .agg(F.count(F.lit(1)).alias("cnt")))
    rn = F.row_number().over(
        Window.partitionBy(group_col)
        .orderBy(F.col("cnt").desc(), F.col(value_col)))
    return (counts.withColumn("rn", rn).filter(F.col("rn") == 1)
            .select(group_col, F.col(value_col).alias("mode_value"),
                    F.col("cnt").alias("mode_count")))


def shuffle_shards(df: DataFrame, key_col: str,
                   n_shards: int = 8) -> DataFrame:
    """Deterministic global shuffle for training-batch interleaving:
    shard = hash bucket of the key, position = rank of the full md5
    within the shard. Per-shard windows parallelize across executors (a
    single global row_number would serialize on one partition — the
    classic 100 TB trap); readers stream shards round-robin to get an
    unbiased interleave. Reproducible: same corpus -> same order."""
    h = F.md5(F.col(key_col).cast("string"))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
             % n_shards).cast("int")
    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy("h", key_col))
    return (df.withColumn("h", h).withColumn("shard", shard)
            .withColumn("pos", pos).drop("h"))


def rare_terms(df: DataFrame, text_col: str, id_col: str,
               max_df: int = 2) -> DataFrame:
    """Document-frequency tail: terms appearing in <= max_df documents,
    with an example doc. The building block for df-based vocabulary
    pruning and tf-idf (integer df counts — no floating log in the
    comparable output). Distinct (doc, word) first so tf inside one doc
    doesn't inflate df."""
    dw = (df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " "))
                    .alias("word")).distinct())
    return (dw.groupBy("word")
            .agg(F.count(F.lit(1)).alias("df"),
                 F.min(id_col).alias("example_doc"))
            .filter(F.col("df") <= max_df))


def assign_global_ids(df: DataFrame, key_col: str,
                      n_shards: int = 256) -> DataFrame:
    """Dense contiguous global IDs (0..N-1) in a deterministic order,
    without the single-partition bottleneck of a global window.

    Two-phase prefix-sum: (1) shard rows by md5 bucket and rank within
    each shard — parallel per-shard windows; (2) count rows per shard
    (tiny agg: n_shards rows cross the driver, never data), prefix-sum
    the counts into shard offsets, broadcast them back. global_id =
    shard_offset + rank - 1. A naive row_number() OVER (ORDER BY ...)
    funnels the entire corpus through ONE task; this plan's critical
    path is one shuffle per phase and stays parallel at 100 TB.
    """
    h = F.md5(F.col(key_col).cast("string"))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
             % n_shards).cast("int")
    base = df.withColumn("__h", h).withColumn("shard", shard)

    counts = {r["shard"]: r["n"] for r in
              base.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    offsets, acc = [], 0
    for s in range(n_shards):
        offsets.append((s, acc))
        acc += counts.get(s, 0)
    from mapreduce_wsi_spark.util import literal_df
    spark = df.sparkSession
    off = literal_df(spark, offsets, "shard int, __off long")

    rank = F.row_number().over(
        Window.partitionBy("shard").orderBy("__h", key_col))
    return (base.join(F.broadcast(off), on="shard")
            .withColumn("global_id", F.col("__off") + rank - 1)
            .drop("__h", "__off"))


def mix_sources(df: DataFrame, key_col: str, stratum_col: str,
                epochs: dict[str, int], default_epochs: int = 1) -> DataFrame:
    """Epoch-weighted corpus mixing: repeat each stratum's rows
    ``epochs[stratum]`` times (integer oversampling — e.g. 3 epochs of a
    high-quality source vs 1 of web crawl), tagging each copy with an
    ``epoch`` index so downstream shuffling can interleave copies apart.
    Implementation is a generated ``explode(sequence(1, n))`` — narrow,
    no join, no data movement beyond the output rows themselves."""
    from mapreduce_wsi_spark.util import literal_df
    spark = df.sparkSession
    rates = literal_df(spark,
                       [(k, int(v)) for k, v in epochs.items()],
                       f"{stratum_col} string, __n_epochs int")
    return (df.join(F.broadcast(rates), on=stratum_col, how="left")
            .withColumn("__n_epochs",
                        F.coalesce("__n_epochs", F.lit(default_epochs)))
            .withColumn("epoch", F.explode(
                F.sequence(F.lit(1), F.col("__n_epochs"))))
            .drop("__n_epochs"))


def pack_context_windows(df: DataFrame, key_col: str, tokens_col: str,
                         budget: int, n_shards: int = 8) -> DataFrame:
    """Pack documents into fixed token-budget context windows: shard
    deterministically (md5), order within the shard by the hash, then
    assign window_id = floor(running_token_offset / budget). Shard-local
    running sums keep the packing embarrassingly parallel (one window
    sort per shard — no global sequential pass, which is how a naive
    greedy packer dies at 100 TB); windows are only approximately full
    when a document straddles a boundary, the standard trade."""
    h = F.md5(F.col(key_col).cast("string"))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
             % n_shards).cast("int")
    w = (Window.partitionBy("shard").orderBy("__h", key_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("__h", h).withColumn("shard", shard)
            .withColumn("__cum", F.sum(tokens_col).over(w))
            .withColumn("window_id",
                        F.floor((F.col("__cum") - F.col(tokens_col))
                                / F.lit(budget)).cast("long"))
            .withColumn("offset_in_window",
                        ((F.col("__cum") - F.col(tokens_col))
                         % F.lit(budget)).cast("long"))
            .drop("__h", "__cum"))


def weighted_sample(df: DataFrame, key_col: str, weight_col: str,
                    k: int) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row gets key ln(u)/w for a portable pseudo-uniform
    u = (md5-derived 32-bit int + 0.5) / 2^32 in (0,1); the top-k keys ARE
    a weight-proportional sample. One scan, no shuffle of the data — the
    top-k lowers to TakeOrderedAndProject (per-partition heaps + driver
    merge of k rows), so 100 TB costs a map-side pass plus k-row merges.
    Deterministic across runs/engines: u is a pure function of the key,
    and the sort key is rounded to DECIMAL(28,9) (ln is the only libm
    call; the 1e-9 grain absorbs cross-libm ULPs) with key_col tie-break.
    Weights must be > 0."""
    h = (F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8),
                16, 10).cast("long"))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    es = (F.log(u) / F.col(weight_col)).cast("decimal(28,9)")
    return (df.select(F.col(key_col), F.col(weight_col),
                      es.cast("double").alias("es_key"))
            .orderBy(F.col("es_key").desc(), F.col(key_col))
            .limit(k))


def dsir_select(df: DataFrame, text_col: str, id_col: str,
                target_col: str, target_values: tuple[str, ...],
                n_buckets: int = 256, k: int = 100,
                materialize: bool = False) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every raw document by how much more likely
    its hashed n-gram features are under a TARGET distribution than
    under the RAW corpus distribution, then resample top-k with Gumbel
    noise (= sampling without replacement proportional to the importance
    weights). The target here is the subset of ``df`` whose
    ``target_col`` is in ``target_values`` — the "high-quality slice
    defines what to upsample" formulation; an external target corpus
    drops in by unioning it in with a flag.

    Features are unigrams + adjacent bigrams of the space-split text,
    hashed into ``n_buckets`` via the engine-portable md5 bucket. Both
    bag-of-buckets models use add-one smoothing; the per-bucket log
    ratio ln(p_target) - ln(p_raw) is computed once on the <=
    ``n_buckets``-row table with each ln rounded to DECIMAL(28,9) (the
    BM25 exactness idiom), so per-doc weights are order-free exact
    decimal sums. The Gumbel key -ln(-ln(u)) uses the same md5-uniform
    as weighted_sample and is rounded to the same grain.

    Plan shape at 100 TB: grams pre-aggregate per (doc, bucket) BEFORE
    anything joins (one data-sized shuffle keyed by doc x bucket); the
    model tables are a bucket-sized aggregate of that frame, a 1-row
    total, and a broadcast delta table; scoring is a broadcast join +
    one doc-keyed rollup; selection lowers to TakeOrderedAndProject.
    The (doc, bucket) frame is consumed twice (model fit + scoring);
    it is MATERIALIZED once (``iter_checkpoint``) before either
    consumer, so the gram-explode corpus pass runs exactly ONCE per
    execution (r15). r14 left two explode passes: the model branch's
    rollup partial-agg subtree canonicalizes differently from the
    scoring branch's plain agg, so Catalyst's ReuseExchange can never
    dedup them (the committed r14 after-plan still carried 2 Generate/
    scan subtrees). The skeleton is bounded by docs x n_buckets rows —
    far smaller than the explode it replaces — so materializing it is
    the 100 TB recipe (the prepare_er tokenize treatment). The bench
    rebuilds it inside the timed region (BUILD_IN_TIMING), so nothing
    moves out of the measurement. ``materialize=True`` additionally
    persists the frame (kept for API/test compat); results are
    identical either way (pinned by test)."""
    # r15 kernel (guide §4.2): the gram explode + md5 bucketing +
    # (id, tgt, bk) partial count computed in ONE mapInPandas pass —
    # the Catalyst form (interpreted bigram-transform lambda, explode,
    # per-gram md5/conv/substring chain, hash agg) measured ~7.6 us
    # per gram; hashlib.md5 replicates portable_bucket bit-exactly
    # (int(md5hex[:8], 16) % n_buckets over the UTF-8 bytes) and a
    # per-doc Counter IS the (id, tgt, bk) group count (tgt is
    # constant per doc). Only (id, tgt, text) cross the boundary;
    # the skeleton comes back pre-aggregated (docs x <=n_buckets
    # rows), so the kernel output is exactly the frame the old
    # groupBy produced — results bit-identical (oracle + test pinned).
    id_t = df.schema[id_col].dataType.simpleString()
    base = df.select(F.col(id_col),
                     F.col(target_col).isin(*target_values).alias("tgt"),
                     F.col(text_col).alias("__txt"))

    def doc_buckets(batches):
        import hashlib

        from collections import Counter

        import pandas as pd
        md5 = hashlib.md5
        for pdf in batches:
            ids, tgts, bks, ns = [], [], [], []
            for did, tgt, s in zip(pdf[id_col], pdf["tgt"],
                                   pdf["__txt"]):
                if not isinstance(s, str):  # NULL text: no gram rows
                    continue
                w = s.split(" ")
                grams = w + [w[i] + " " + w[i + 1]
                             for i in range(len(w) - 1)]
                c = Counter(
                    int(md5(g.encode()).hexdigest()[:8], 16) % n_buckets
                    for g in grams)
                for bk, cnt in c.items():
                    ids.append(did)
                    tgts.append(tgt)
                    bks.append(bk)
                    ns.append(cnt)
            yield pd.DataFrame({id_col: ids, "tgt": tgts,
                                "bk": bks, "n": ns})

    doc_bk = base.mapInPandas(
        doc_buckets, f"{id_col} {id_t}, tgt boolean, bk int, n long")
    if materialize:
        from pyspark import StorageLevel
        doc_bk = doc_bk.persist(StorageLevel.MEMORY_AND_DISK)
    # ONE explode pass per execution: materialize the (id, tgt, bk, n)
    # skeleton; the model rollup and the scoring join both read the
    # materialized blocks instead of each re-running the corpus-sized
    # gram explode (guide §1.2/§5; see docstring)
    from mapreduce_wsi_spark.util import iter_checkpoint
    doc_bk = iter_checkpoint(doc_bk)
    # ONE aggregation produces the per-bucket counts AND the grand
    # totals (rollup adds the grouping()=1 total row); the totals then
    # ride a window over the <= n_buckets + 1 aggregated rows — the
    # old shape computed tot as a THIRD scan of the gram-explode
    # lineage (doc_bk -> cnt -> tot as its own broadcast subtree),
    # i.e. the corpus-sized explode ran three times per execution (r14)
    cnt = (doc_bk.rollup("bk").agg(
        F.sum("n").alias("c_r"),
        F.sum(F.when(F.col("tgt"), F.col("n")).otherwise(0)).alias("c_t"),
        F.grouping("bk").alias("__g")))
    wall = Window.partitionBy()  # n_buckets + 1 rows — bounded
    dlt = (cnt
           .withColumn("t_r", F.max(F.when(F.col("__g") == 1,
                                           F.col("c_r"))).over(wall))
           .withColumn("t_t", F.max(F.when(F.col("__g") == 1,
                                           F.col("c_t"))).over(wall))
           .filter(F.col("__g") == 0)
           .select(
        "bk",
        (F.log((F.col("c_t") + 1).cast("double")
               / (F.col("t_t") + n_buckets)).cast("decimal(28,9)")
         - F.log((F.col("c_r") + 1).cast("double")
                 / (F.col("t_r") + n_buckets)).cast("decimal(28,9)"))
        # the subtraction widens to decimal(29,9); renarrow (|d| < 30,
        # lossless) so the n*d product stays inside precision 38
        .cast("decimal(28,9)").alias("d")))
    doc = (doc_bk.join(F.broadcast(dlt), "bk")
           .groupBy(id_col)
           .agg(F.sum("n").cast("int").alias("n_grams"),
                # n stays decimal(9,0): bigint * decimal(28,9) would
                # exceed precision 38 and Spark silently drops the
                # scale to 6 (allowPrecisionLoss), breaking exactness
                F.sum(F.col("n").cast("decimal(9,0)")
                      * F.col("d")).alias("lw")))
    h = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16, 10).cast("long"))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    gum = (-F.log(-F.log(u))).cast("decimal(28,9)")
    return (doc.withColumn("sel_key",
                        F.col("lw").cast("decimal(28,9)") + gum)
            .orderBy(F.desc("sel_key"), F.col(id_col))
            .limit(k)
            .select(F.col(id_col), "n_grams",
                    F.col("lw").cast("double").alias("log_w"),
                    F.col("sel_key").cast("double").alias("sel_key")))


def chunk_overlap(df: DataFrame, text_col: str, id_col: str,
                  size: int = 64, stride: int = 48) -> DataFrame:
    """Sliding-window document chunking with overlap — the RAG / context-
    window prep step: chunk ``i`` covers chars [1 + i*stride,
    1 + i*stride + size). The last chunk may be short; a document always
    yields >= 1 chunk; ``stride < size`` gives ``size - stride`` chars
    of overlap so no retrieval-relevant span is split across a boundary
    without also appearing whole in a neighbor.

    n_chunks = 1 + ceil(max(0, len - size) / stride), computed in
    closed form — chunks start strictly inside the text and every char
    is covered. Map-side only: sequence + explode + substr, no shuffle,
    no UDF; at 100 TB this chains into dedup/packing with chunk_id a
    deterministic function of (doc, offset)."""
    n_chunks = (F.lit(1)
                + F.ceil(F.greatest(F.length(F.col(text_col)) - size,
                                    F.lit(0))
                         / F.lit(stride)).cast("int"))
    ch = df.select(
        F.col(id_col), F.col(text_col).alias("_t"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"))
    start = (F.col("chunk_id") * stride + 1)
    return (ch.select(
        id_col, "chunk_id",
        start.cast("int").alias("c_start"),
        F.col("_t").substr(start, F.lit(size)).alias("c_text"))
        .withColumn("c_len", F.length("c_text").cast("int")))


def token_budget_mix(df: DataFrame, domain_col: str, tokens_col: str,
                     weights_ppm: dict[str, int], default_ppm: int,
                     budget_tokens: int,
                     max_epochs_ppm: int = 4_000_000) -> DataFrame:
    """Token-budget mixture planning — the "how many epochs of each
    domain" solver a curation run executes before sampling: given
    per-row token counts, target mixture weights in parts-per-million
    (deployment constants, like the CCNet cutoffs) and a total token
    budget, emit per domain the available tokens, the target share of
    the budget, the repeat factor epochs = target/available in ppm, a
    cap at ``max_epochs_ppm`` (repeating a small domain past ~4 epochs
    measurably hurts, Muennighoff et al. 2023), and the planned tokens
    + shortfall after the cap. All integer arithmetic (ppm fixed-point,
    floor division) — exact on any engine.

    ONE aggregation pass over the corpus; output is |domains| rows. The
    plan feeds `weighted_sample` / `mix_sources` downstream — this
    operator decides the quotas, those execute them."""
    w = F.lit(default_ppm).cast("long")
    for k, v in sorted(weights_ppm.items()):
        w = F.when(F.col(domain_col) == k, F.lit(v).cast("long")) \
             .otherwise(w)
    agg = (df.groupBy(F.col(domain_col).alias("domain"))
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.col(tokens_col)).cast("long")
                .alias("avail_tokens"),
                F.max(w).alias("weight_ppm")))
    out = agg.withColumn(
        "target_tokens",
        F.expr("(weight_ppm * cast({} as bigint)) div 1000000"
               .format(int(budget_tokens))))
    out = out.withColumn(
        "epochs_ppm",
        F.expr("(target_tokens * cast(1000000 as bigint)) "
               "div avail_tokens"))
    out = out.withColumn("capped",
                         F.col("epochs_ppm") > max_epochs_ppm)
    out = out.withColumn(
        "planned_tokens",
        F.expr(f"(avail_tokens * least(epochs_ppm, "
               f"cast({int(max_epochs_ppm)} as bigint))) div 1000000"))
    return out.withColumn(
        "shortfall",
        F.greatest(F.col("target_tokens") - F.col("planned_tokens"),
                   F.lit(0).cast("long")))


def rendezvous_assign(df: DataFrame, key_col: str, shards: list[str],
                      out_col: str = "shard") -> DataFrame:
    """Rendezvous / highest-random-weight sharding (Thaler & Ravishankar
    1998): each key goes to argmax over shards of md5(key || ':' ||
    shard) — the assignment every consistent-serving layer wants,
    because adding or removing ONE shard moves only ~1/(n+1) of the
    keys (each key re-rolls only against the new shard) instead of
    mod-N's wholesale reshuffle. MAP-ONLY: |shards| md5s per row inside
    one array_max over (hash, shard) structs (lexicographic struct
    compare picks the winning hash; md5 ties are cryptographically
    negligible and would break to the larger shard name). The hex-
    string convention keeps it engine-portable — any system re-derives
    the same placement from the key and the shard list alone."""
    structs = [
        F.struct(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":"),
                           F.lit(s))).alias("h"),
            F.lit(s).alias("s"))
        for s in shards]
    return df.withColumn(out_col, F.array_max(F.array(*structs))["s"])


def neyman_stratified_sample(df: DataFrame, stratum_col: str,
                             value_col: str, id_col: str,
                             n_total: int) -> DataFrame:
    """Neyman-allocation stratified sampling: stratum h gets
    n_h = n_total * N_h*S_h / sum(N*S) draws — variance-proportional
    allocation, the survey-sampling optimum for estimating the overall
    mean (high-variance strata get more budget than proportional
    allocation would give). The eval-set designer's upgrade over plain
    stratified sampling.

    Determinism discipline: S_h comes from exact DECIMAL moments, is
    rounded to 6 decimals, and scales to the exact BIGINT weight
    w_h = N_h * round(S_h * 1e6) — so the allocation is pure integer
    arithmetic (n_total * w_h div sum(w)), immune to float summation
    order across strata (a raw double sum(N*S) could flip a floor at
    the last ulp). Selection within each stratum is the md5-rank
    window (portable, seedless, auditable outside the engine), capped
    at N_h. One groupBy for moments (broadcast back), one window for
    selection.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    base = df.select(F.col(stratum_col).alias("__h"),
                     F.col(id_col).alias("__id"),
                     cents.alias("__v"))
    d = "decimal(38,0)"
    mo = base.groupBy("__h").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__v").cast(d)).alias("__s"),
        F.sum((F.col("__v") * F.col("__v")).cast(d)).alias("__ss"))
    n, s, ss = (F.col("__n").cast("double"),
                F.col("__s").cast("double"), F.col("__ss").cast("double"))
    sd = F.sqrt((ss - s * s / n) / (n - 1))
    wt = mo.select(
        "__h", "__n",
        (F.col("__n") * F.round(sd * 1e6).cast("bigint")).alias("__w"))
    tot = wt.agg(F.sum("__w").alias("__wsum"))
    alloc = (wt.crossJoin(F.broadcast(tot))
             .select("__h", "__n",
                     F.least(
                         F.expr(f"CAST({n_total} AS BIGINT) * __w "
                                f"div __wsum"),
                         F.col("__n").cast("bigint")).alias("__alloc")))
    # Two-phase exact top-alloc (r9 scale audit): a single
    # Window.partitionBy(__h) sorts every stratum's full population
    # through one task — the bounded-cardinality window ceiling when
    # strata are few. Phase 1 ranks within (__h, salt) and keeps
    # alloc per salt cell (the true top-alloc under the md5 total
    # order is a subset of the per-salt unions); phase 2 re-ranks
    # the <= 64 * alloc survivors. Identical output; the budget
    # n_total << N_h keeps the phase-2 sort bounded.
    hkey = F.md5(F.col("__id").cast("string"))
    salt = F.pmod(F.xxhash64(F.col("__id")), F.lit(64))
    w1 = Window.partitionBy("__h", "__salt").orderBy(hkey, "__id")
    w = Window.partitionBy("__h").orderBy(hkey, "__id")
    ranked = (base.join(F.broadcast(alloc), "__h")
              .withColumn("__salt", salt)
              .withColumn("__rn1", F.row_number().over(w1))
              .filter(F.col("__rn1") <= F.col("__alloc"))
              .withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= F.col("__alloc")))
    return (ranked.groupBy("__h")
            .agg(F.first("__n").alias("stratum_rows"),
                 F.first("__alloc").alias("n_alloc"),
                 F.count(F.lit(1)).alias("n_sampled"),
                 F.round(F.sum("__v").cast("double")
                         / (100.0 * F.count(F.lit(1))), 9)
                 .alias("sample_mean"))
            .select(F.col("__h").alias(stratum_col),
                    F.col("stratum_rows").cast("long")
                    .alias("stratum_rows"),
                    F.col("n_alloc").cast("long").alias("n_alloc"),
                    F.col("n_sampled").cast("long").alias("n_sampled"),
                    "sample_mean"))


def negative_sample_unigram(docs: DataFrame, text_col: str,
                            n_draws: int = 1000) -> DataFrame:
    """Deterministic draws from the smoothed unigram distribution
    p(w) ∝ count(w)^0.75 — the word2vec negative-sampling / smoothed
    mixing distribution. Replaces the usual alias-table RNG with the
    repo's portable-hash discipline: draw i maps to the md5-uniform
    point u_i = md5(i) mod W and selects the token whose cumulative
    weight range [lo, hi) contains u_i — inverse-CDF sampling as a
    range join, reproducible in any engine.

    Exactness: count^0.75 = sqrt(c * sqrt(c)) uses only IEEE
    correctly-rounded ops (sqrt/multiply — no libm pow), rounded to a
    1e6-scaled BIGINT weight, so the cumulative ranges are exact
    integers. The cumulative window runs over the VOCABULARY (ordered
    count DESC, token — deterministic), never raw tokens; the draw
    table is n_draws rows, broadcast against it (at larger vocabularies
    the range join buckets by weight-range prefix, same two-phase
    shape as the gini ranks). Returns (token, weight, n_drawn > 0).
    """
    from mapreduce_wsi_spark.operators.text import words

    tok = docs.select(F.explode(words(F.col(text_col))).alias("w"))
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    c = F.col("c").cast("double")
    wt = cnt.select(
        "w", "c",
        F.round(F.sqrt(c * F.sqrt(c)) * 1e6).cast("bigint").alias("__wt"))
    win = Window.orderBy(F.col("c").desc(), "w")
    ranges = (wt
              .withColumn("__hi", F.sum("__wt").over(
                  win.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)))
              .withColumn("__lo", F.col("__hi") - F.col("__wt")))
    total = ranges.agg(F.max("__hi").alias("__tot"))
    # 64-bit uniform point from two 32-bit md5 chunks, composed in
    # DECIMAL so h1 * 2^32 cannot overflow BIGINT (the join_bloom_prune
    # two-chunk convention)
    h = F.md5(F.col("__i").cast("string"))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    u64 = (h1.cast("decimal(38,0)") * F.lit(4294967296).cast("long")
           + h2)
    draws = (docs.sparkSession.range(1, n_draws + 1)
             .select(F.col("id").alias("__i"))
             .crossJoin(F.broadcast(total))
             .select((u64 % F.col("__tot")).cast("bigint").alias("__u")))
    hit = ranges.join(F.broadcast(draws),
                      (F.col("__u") >= F.col("__lo"))
                      & (F.col("__u") < F.col("__hi")))
    return (hit.groupBy("w", F.col("__wt").alias("weight"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_drawn"))
            .select(F.col("w").alias("token"), "weight", "n_drawn"))


def ntile_bucketed(df: DataFrame, part_cols: list[str], order_col: str,
                   tiebreak_col: str, n_tiles: int,
                   bucket_width: float,
                   tile_col: str = "__tile") -> DataFrame:
    """Arithmetic ntile WITHOUT a whole-partition window — the SCALE.md
    r9 bucketed prefix-sum recipe, first proven inline by
    window_ntile_bins (r10) and factored here so every per-group
    order-statistic site can reuse it: rank within (group, value-range
    bucket) windows, compose a global in-group rank from broadcast
    exclusive bucket prefixes, then derive the tile ARITHMETICALLY from
    (rank, group size) — bit-identical to ntile(n) ordered by
    (order_col, tiebreak_col): the first n%T tiles hold ceil(n/T) rows,
    the rest floor(n/T), exactly Spark/DuckDB ntile semantics (groups
    smaller than T degrade to tile = rank on both engines, the CASE's
    WHEN branch, so the div-by-zero ELSE is never reached). No window
    ever sees a whole group: the in-bucket window is bounded by the
    value bucket's density (degenerate single-value data refills one
    bucket — the documented residual), the bucket-level cumsum runs
    over |group x bucket| aggregate rows."""
    parts = list(part_cols)
    b = df.withColumn(
        "__vb", F.floor(F.col(order_col) / bucket_width).cast("long"))
    w_in = Window.partitionBy(*parts, "__vb").orderBy(order_col,
                                                      tiebreak_col)
    within = b.withColumn("__r", F.row_number().over(w_in))
    counts = b.groupBy(*parts, "__vb").agg(F.count(F.lit(1)).alias("__c"))
    w_b = (Window.partitionBy(*parts).orderBy("__vb")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = (counts.withColumn("__pre",
                             F.sum("__c").over(w_b) - F.col("__c"))
           .select(*parts, "__vb", "__pre"))
    tot = counts.groupBy(*parts).agg(F.sum("__c").alias("__n"))
    ranked = within.join(F.broadcast(pre), parts + ["__vb"])
    # empty part_cols = GLOBAL ntile (rfm_scores-class): the group
    # total is a 1-row aggregate, joined by crossJoin since an empty
    # equi-join key list is invalid
    if parts:
        ranked = ranked.join(F.broadcast(tot), parts)
    else:
        ranked = ranked.crossJoin(F.broadcast(tot))
    ranked = ranked.withColumn("__gr", F.col("__r") + F.col("__pre"))
    t = n_tiles
    tile = F.expr(
        f"CAST(CASE WHEN __gr <= (__n % {t}) * (__n div {t} + 1) "
        f"THEN (__gr + (__n div {t})) div (__n div {t} + 1) "
        f"ELSE (__n % {t}) + (__gr - (__n % {t}) * (__n div {t} + 1) "
        f"+ (__n div {t}) - 1) div (__n div {t}) END AS INT)")
    return (ranked.withColumn(tile_col, tile)
            .drop("__vb", "__r", "__pre", "__n", "__gr"))
