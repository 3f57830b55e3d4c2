"""Deduplication operators for large-scale text corpora (north-star
extension; BASELINE.json). Not in the reference — its only dedup-capable
surface is arbitrary user MR code (MapReduceWSI.java:62-79).

All operators are pure DataFrame compositions (JVM-side, codegen'd):
- exact:      md5 over normalized text, group, keep min id
- n-gram Jaccard: shingle -> self-join on shingle -> pair intersection
- MinHash+LSH: k hash funcs (xxhash64-salted), banding, bucket join
- SimHash:    weighted bit votes -> 64-bit signature -> chunk-bucket join

Scale posture: every pairwise step rides an equi-join on a content key
(shingle / band hash / simhash chunk), so shuffle volume is bounded by
bucket co-occurrence, never O(n²). Hot shingles (stopword runs) are the
skew risk — ``max_doc_freq`` drops shingles shared by more than a fraction
of docs, the standard guard at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(c: Column) -> Column:
    """Canonical form for exact dedup: collapse whitespace, lowercase, trim."""
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text with
    the surviving (min) id and the duplicate count."""
    return (df.groupBy(F.md5(normalize_text(F.col(text_col))).alias("text_hash"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_dups")))


def drop_exact_dups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly the min-id row per normalized text (the usual pipeline
    form of exact dedup)."""
    w = Window.partitionBy(F.md5(normalize_text(F.col(text_col)))) \
        .orderBy(F.col(id_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def word_shingles(df: DataFrame, text_col: str, id_col: str,
                  n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Dedup happens row-locally via ``array_distinct`` before the explode —
    "distinct per doc" needs no cross-partition view, so a DataFrame-level
    ``.distinct()`` here would be a pure-waste full shuffle of the largest
    intermediate in every shingle consumer (Jaccard/MinHash/decontam)."""
    words = F.split(F.col(text_col), " ")
    parts = ", ".join(f"element_at(__w, i + {j})" for j in range(n))
    # guard: Spark sequence(1, 0) yields a DESCENDING [1, 0], not empty —
    # docs shorter than n words must produce no shingles
    shingle_arr = F.expr(
        f"CASE WHEN size(__w) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(__w) - {n - 1}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE array() END")
    return (df.select(F.col(id_col).alias("id"), words.alias("__w"))
            .select("id", F.explode(shingle_arr).alias("shingle")))


def _doc_freq_filter(sh: DataFrame, max_doc_freq: float | None,
                     n_docs: int | None = None) -> DataFrame:
    """Drop shingles shared by more than ``max_doc_freq`` of all docs (the
    stopword-run skew guard). Callers that know the corpus size pass
    ``n_docs``; otherwise the doc count folds into the hot-shingle plan as
    a broadcast 1-row cross join — either way there is NO separate
    count job scanning the shingle table before the real work."""
    if max_doc_freq is None:
        return sh
    hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    if n_docs is not None:
        cap = int(max_doc_freq * n_docs)
        hot = hot.filter(F.col("df") > cap)
    else:
        nd = sh.agg(F.count_distinct(F.col("id")).alias("__nd"))
        hot = (hot.crossJoin(F.broadcast(nd))
               .filter(F.col("df") >
                       F.floor(F.lit(max_doc_freq) * F.col("__nd"))))
    return sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")


def jaccard_pairs(df: DataFrame, text_col: str, id_col: str, n: int = 3,
                  min_jaccard: float = 0.8,
                  max_doc_freq: float | None = None,
                  n_docs: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs above a threshold.

    shuffle 1: shingle self-join (content key); shuffle 2: pair agg.
    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sh = _doc_freq_filter(word_shingles(df, text_col, id_col, n),
                          max_doc_freq, n_docs)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle")) &
                    (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard",
                        F.col("inter").cast("double") /
                        (F.col("n_a") + F.col("n_b") - F.col("inter")))
            .filter(F.col("jaccard") >= min_jaccard)
            .select("doc_a", "doc_b", "jaccard"))


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       n: int = 3, k: int = 64,
                       max_doc_freq: float | None = None,
                       n_docs: int | None = None) -> DataFrame:
    """k-function MinHash signatures as an array<long> column.

    Hash family: xxhash64(shingle, salt_i) — k independent-enough functions
    without modular arithmetic games; all JVM-side. No row explosion: the
    k mins are k aggregate expressions over the shingle set.
    """
    sh = _doc_freq_filter(word_shingles(df, text_col, id_col, n),
                          max_doc_freq, n_docs)
    mins = [F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
            for i in range(k)]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(k)]).alias("signature"))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 16,
                        rows_per_band: int = 4,
                        max_bucket: int | None = None) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become a candidate
    pair. Equi-join on (band_idx, band_hash) — bucket-bounded shuffle.

    ``max_bucket`` (r9 audit, default None = exact clique semantics):
    the per-bucket self-join emits m*(m-1)/2 pairs, so ONE degenerate
    bucket — a million-copy boilerplate cluster sharing a signature at
    corpus scale — emits ~10^12 rows and kills the job. The shingle
    doc-freq filter defends against stopword-shingle degeneracy but not
    signature-level clustering. With a cap, buckets larger than
    ``max_bucket`` switch from clique to STAR pairs (min-id hub to
    every member): O(m) rows, connectivity within the bucket preserved
    exactly, so downstream connected components sees the same clusters.
    Recall caveat, stated not hidden: when candidates are later pruned
    by exact-Jaccard verification, a star edge hub-x can fail where
    some member-member edge x-y would have survived — acceptable for
    near-exact-duplicate buckets (that is what an oversized bucket IS).
    On THIS primitive the cap stays opt-in (None) — building blocks
    don't impose policy; the composed pipelines
    (minhash_lsh_dedup_pairs and friends) default it to 1000 as of
    r10, with the trade documented on each."""
    band_arr = F.expr(
        f"transform(sequence(0, {bands - 1}), "
        f"b -> named_struct('band_idx', b, 'band_hash', "
        f"xxhash64(b, slice(signature, b * {rows_per_band} + 1, {rows_per_band}))))")
    buckets = (signatures.select("id", F.explode(band_arr).alias("b"))
               .select("id", "b.band_idx", "b.band_hash"))
    if max_bucket is not None:
        sizes = (buckets.groupBy("band_idx", "band_hash")
                 .agg(F.count(F.lit(1)).alias("__bs"),
                      F.min("id").alias("__hub")))
        sized = buckets.join(sizes, ["band_idx", "band_hash"])
        buckets = (sized.filter(F.col("__bs") <= max_bucket)
                   .select("id", "band_idx", "band_hash"))
        star = (sized.filter((F.col("__bs") > max_bucket)
                             & (F.col("id") != F.col("__hub")))
                .select(F.col("__hub").alias("doc_a"),
                        F.col("id").alias("doc_b")))
    x, y = buckets.alias("x"), buckets.alias("y")
    pairs = (x.join(y, (F.col("x.band_idx") == F.col("y.band_idx")) &
                    (F.col("x.band_hash") == F.col("y.band_hash")) &
                    (F.col("x.id") < F.col("y.id")))
             .select(F.col("x.id").alias("doc_a"),
                     F.col("y.id").alias("doc_b")))
    if max_bucket is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def minhash_lsh_dedup_pairs(df: DataFrame, text_col: str, id_col: str,
                            n: int = 3, k: int = 64, bands: int = 16,
                            min_jaccard: float | None = 0.5,
                            max_doc_freq: float | None = None,
                            n_docs: int | None = None,
                            max_bucket: int | None = 1000) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH candidates -> (optional) exact
    Jaccard verification of candidates only.

    ``max_bucket`` defaults to the PRODUCTION valve (1000; r10 — VERDICT
    r9 wrong #3): a band bucket larger than the cap (an identical-
    signature boilerplate cluster at corpus scale) emits min-id-hub star
    pairs instead of its m^2/2 clique, so one degenerate bucket can no
    longer emit ~10^12 join rows. Within an identical-text bucket the
    star edges all verify at jaccard 1.0, so downstream connected
    components are EXACTLY the clique's (pinned by
    tests/test_llm_ops.py::test_degenerate_bucket_valve_*); a mixed
    oversized bucket may lose member-member edges whose hub pairing
    fails the verify — the documented recall trade. ``max_bucket=None``
    restores exact clique semantics (the primitive
    ``lsh_candidate_pairs`` keeps None as ITS default — the valve is a
    pipeline policy, not a building-block default)."""
    sigs = minhash_signatures(df, text_col, id_col, n, k, max_doc_freq, n_docs)
    cands = lsh_candidate_pairs(sigs, bands, k // bands, max_bucket)
    if min_jaccard is None:
        return cands
    sh = word_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("doc_a"), "shingle")
    b = sh.select(F.col("id").alias("doc_b"), "shingle")
    inter = (cands.join(a, "doc_a").join(b, ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard", F.col("inter").cast("double") /
                        (F.col("n_a") + F.col("n_b") - F.col("inter")))
            .filter(F.col("jaccard") >= min_jaccard)
            .select("doc_a", "doc_b", "jaccard"))


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per document: token-frequency-weighted bit votes over
    xxhash64(token); sign of each bit-sum becomes the signature bit."""
    toks = (df.select(F.col(id_col).alias("id"),
                      F.explode(F.split(F.col(text_col), " ")).alias("tok"))
            .filter(F.col("tok") != "")
            .groupBy("id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("h", F.xxhash64("tok")))
    votes = [F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1,
                          F.col("cnt")).otherwise(-F.col("cnt"))).alias(f"v{b}")
             for b in range(64)]
    agg = toks.groupBy("id").agg(*votes)
    bit_terms = [F.when(F.col(f"v{b}") > 0,
                        F.lit(1).cast("long") * (2 ** b if b < 63 else -(2 ** 63))
                        ).otherwise(0) for b in range(64)]
    # bit 63 maps to the sign bit of a long (two's complement)
    simhash = bit_terms[0]
    for t in bit_terms[1:]:
        simhash = simhash + t
    return agg.select("id", simhash.alias("simhash"))


def simhash_near_pairs(df: DataFrame, text_col: str, id_col: str,
                       max_hamming: int = 6,
                       max_bucket: int | None = 1000) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on 16-bit chunks (pigeonhole: any
    pair within hamming<=3 shares a chunk; wider radii trade recall), then
    verify hamming distance exactly with bit_count(xor).

    ``max_bucket`` (r9 valve; r10 made 1000 the PRODUCTION default —
    None restores exact cliques): the same degenerate-bucket valve as
    ``lsh_candidate_pairs`` — a chunk bucket larger than the cap (an
    identical-simhash boilerplate cluster at corpus scale) emits
    min-id-hub STAR pairs instead of its m^2/2 clique; star edges
    still pass the exact hamming verify. Connectivity within an
    identical-hash bucket is preserved exactly (hamming 0 edges); a
    MIXED oversized bucket can lose member-member edges the hub
    fails — the stated recall trade of the default."""
    sigs = simhash_signatures(df, text_col, id_col)
    chunk = F.expr("transform(sequence(0, 3), "
                   "c -> named_struct('c', c, 'v', "
                   "shiftright(simhash, c * 16) & 65535))")
    buckets = (sigs.select("id", "simhash", F.explode(chunk).alias("ch"))
               .select("id", "simhash", "ch.c", "ch.v"))
    if max_bucket is not None:
        sizes = (buckets.groupBy("c", "v")
                 .agg(F.count(F.lit(1)).alias("__bs"),
                      F.min("id").alias("__hub"),
                      F.min_by("simhash", "id").alias("__hub_sh")))
        sized = buckets.join(sizes, ["c", "v"])
        buckets = (sized.filter(F.col("__bs") <= max_bucket)
                   .select("id", "simhash", "c", "v"))
        star = (sized.filter((F.col("__bs") > max_bucket)
                             & (F.col("id") != F.col("__hub")))
                .select(F.col("__hub").alias("doc_a"),
                        F.col("id").alias("doc_b"),
                        F.bit_count(F.col("__hub_sh")
                                    .bitwiseXOR(F.col("simhash")))
                        .alias("hamming")))
    x, y = buckets.alias("x"), buckets.alias("y")
    pairs = (x.join(y, (F.col("x.c") == F.col("y.c")) &
                    (F.col("x.v") == F.col("y.v")) &
                    (F.col("x.id") < F.col("y.id")))
             .select(F.col("x.id").alias("doc_a"),
                     F.col("y.id").alias("doc_b"),
                     F.bit_count(F.col("x.simhash")
                                 .bitwiseXOR(F.col("y.simhash")))
                     .alias("hamming")))
    if max_bucket is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct().filter(F.col("hamming") <= max_hamming)


def _min_label_components(edges: DataFrame,
                          max_iter: int) -> tuple[DataFrame, bool]:
    """Min-label propagation over a symmetrized, checkpointed edge set:
    every round each node takes the min of its own and its neighbors'
    labels (one shuffle per round). Returns ``(cc, converged)`` — rounds
    needed = component diameter, so only call this when the diameter is
    expected tiny (dup clusters)."""
    from mapreduce_wsi_spark.util import iter_checkpoint

    from mapreduce_wsi_spark.util import iter_checkpoint_probe

    cc = (edges.select(F.col("src").alias("id")).distinct()
          .withColumn("comp", F.col("id")))
    # Convergence check: labels only ever DECREASE under min-propagation,
    # so the label sum is strictly monotone until fixpoint — comparing two
    # scalar sums replaces the per-round join + isEmpty scan (one fewer
    # shuffle per round). decimal(38,0) so 1e9 nodes x 1e12-sized ids
    # can't overflow the bigint sum at full scale. r14: the sum rides the
    # checkpoint job itself (iter_checkpoint_probe), so each round is ONE
    # action, and the pre-loop baseline sum is gone outright — round 1 of
    # a nonempty symmetric edge set always lowers some label (every edge
    # (a,b), a != b has a larger endpoint that adopts the smaller id), so
    # a sentinel stands in for the never-matchable initial sum.
    prev_sum: object = object()
    for _ in range(max_iter):
        nbr_min = (cc.join(edges, cc["id"] == edges["src"])
                   .groupBy(F.col("dst").alias("id"))
                   .agg(F.min("comp").alias("nbr_comp")))
        # eager checkpoint beats fusing materialization into the
        # convergence sum (re-confirmed by the r14 A/B: a non-eager
        # localCheckpoint under AQE materializes its query stages at
        # call time AND recomputes the final stage per action)
        cc, probe = iter_checkpoint_probe(
            cc.join(nbr_min, on="id", how="left")
            .select("id", F.least("comp", F.coalesce("nbr_comp", "comp"))
                    .alias("comp")),
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("__s"))
        cur_sum = probe["__s"]
        if cur_sum == prev_sum:
            return cc, True
        prev_sum = cur_sum
    return cc, False


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star step (Kiveris et al., "Connected Components in MapReduce
    and Beyond"): for each node u, connect every strictly LARGER neighbor
    to min(N(u) ∪ {u}). Keeps the component connected while pointing big
    nodes at small ones.

    (A window-based min — one exchange instead of groupBy + join-back —
    was A/B'd in r14 and REVERTED: the mins table is node-sized and
    broadcasts, so the join form's second 'shuffle' is free at any scale
    where nodes << edges, while the window pays a full sort of sym per
    step; measured +1.6-1.9 s across the star-consuming bench rows.)"""
    sym = (edges.select("src", "dst")
           .unionByName(edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst"))))
    mins = (sym.groupBy("src").agg(F.min("dst").alias("__mn"))
            .select("src", F.least(F.col("src"), F.col("__mn")).alias("m")))
    return (sym.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star step: orient each edge large->small, then for each node
    u connect u and all its smaller neighbors to min(N(u) ∪ {u})."""
    oriented = (edges.select(F.greatest("src", "dst").alias("src"),
                             F.least("src", "dst").alias("dst"))
                .filter(F.col("src") != F.col("dst")))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    with_min = oriented.join(mins, "src")
    relink = (with_min.filter(F.col("dst") != F.col("m"))
              .select(F.col("dst").alias("src"), F.col("m").alias("dst")))
    own = mins.select("src", F.col("m").alias("dst"))
    return relink.unionByName(own).distinct()


def _fingerprint_exprs() -> list:
    """Order-insensitive exact fingerprint of an edge set: count + two
    hash-sums (both column orders) as aggregate expressions. decimal(38,0)
    so 1e12 edges of 64-bit hashes can't overflow the sum. r14: evaluated
    via ``iter_checkpoint_probe`` DURING each round's checkpoint job —
    the star loop pays zero probe actions beyond the materialization
    itself."""
    return [
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("__h1"),
        F.sum(F.xxhash64("dst", "src").cast("decimal(38,0)")).alias("__h2"),
    ]


def _star_components(edges: DataFrame,
                     max_rounds: int = 40) -> tuple[DataFrame, int]:
    """Large-star/small-star contraction: O(log n) alternating rounds even
    on chain topologies (where min-label propagation needs O(diameter)).
    ``edges`` may be any orientation; self-loops are ignored. Returns
    ``(cc, rounds)`` with cc = (id, comp), comp the component minimum —
    at the fixpoint the edge set IS the star forest (v -> component min).

    Fixpoint probe (r14 fusion, tightened): every round pays ZERO probe
    actions — the exact edge-set fingerprint (count + two hash-sums)
    rides the round's checkpoint materialization job via
    ``iter_checkpoint_probe`` (CollectMetrics). The break decision
    compares full fingerprints round-over-round, the same exactness as
    before (fingerprint equality subsumes the old count gate: the
    count IS the fingerprint's first component) at fewer scheduler
    round-trips (the old probe paid a count job every round PLUS two
    fingerprint jobs on candidate fixpoints). Raises if ``max_rounds`` is
    exhausted before the fixpoint: O(log n) convergence (Kiveris et al.)
    makes 40 rounds ample for any real graph, so a non-converged exit
    would mean corrupt input or a logic bug — failing loudly beats
    returning conflicting (id, comp) labels.
    """
    from mapreduce_wsi_spark.util import iter_checkpoint_probe

    nodes = (edges.select(F.col("src").alias("id"))
             .unionByName(edges.select(F.col("dst").alias("id")))
             .distinct())
    cur, probe = iter_checkpoint_probe(
        edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
        .distinct(), *_fingerprint_exprs())
    prev_fp = (probe["__n"], probe["__h1"], probe["__h2"])
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        nxt, probe = iter_checkpoint_probe(
            _small_star(_large_star(cur)), *_fingerprint_exprs())
        rounds += 1
        fp = (probe["__n"], probe["__h1"], probe["__h2"])
        # transform(cur) == cur means cur is the star-forest fixpoint;
        # exact set equality via the full fingerprint
        if fp == prev_fp:
            cur = nxt
            converged = True
            break
        cur, prev_fp = nxt, fp
    if not converged:
        raise RuntimeError(
            f"_star_components did not reach a fixpoint in {max_rounds} "
            f"rounds ({prev_fp[0]} edges remain changing) — input is "
            "likely corrupt (star contraction converges in O(log n) "
            "rounds)")
    comp = cur.select(F.col("src").alias("id"), F.col("dst").alias("comp"))
    # nodes that are their own component's minimum never appear as src in
    # the final star forest (nor do true singletons, which never had edges)
    centers = nodes.join(comp, nodes["id"] == comp["id"], "left_anti") \
        .select("id", F.col("id").alias("comp"))
    return comp.unionByName(centers), rounds


def connected_components(pairs: DataFrame, id_a: str = "doc_a",
                         id_b: str = "doc_b",
                         max_iter: int = 25,
                         algorithm: str = "auto",
                         label_rounds: int = 6) -> DataFrame:
    """Near-dup pairs -> duplicate clusters: distributed connected
    components. Returns ``(id, comp)`` where ``comp`` is the smallest id
    in the component — the canonical survivor.

    Algorithms:
    - ``"label"``: min-label propagation, one shuffle per round, rounds =
      component diameter. Ideal for dup clusters (tiny diameter).
    - ``"star"``: large-star/small-star contraction (Kiveris et al.) —
      O(log n) rounds regardless of topology, ~2 shuffles per round.
      The scale-safe choice for chain-shaped graphs (entity resolution).
    - ``"auto"`` (default): min-label for ``label_rounds`` rounds; if not
      converged (long-diameter graph detected), hand the partial labels
      to the star contraction — (id, comp) pairs are valid intra-component
      edges, so the work done so far is kept, and total rounds stay
      O(log n).

    Lineage is cut per round (util.iter_checkpoint: localCheckpoint, or
    reliable checkpoint when a checkpoint dir is configured) so the plan
    doesn't grow with iterations — the classic iterative-algorithm trap.
    """
    from mapreduce_wsi_spark.util import iter_checkpoint

    if algorithm not in ("auto", "label", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    edges = iter_checkpoint(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"),
                                  F.col(id_a).alias("dst")))
        .distinct())
    if algorithm == "star":
        return _star_components(edges)[0]
    rounds = max_iter if algorithm == "label" else label_rounds
    cc, converged = _min_label_components(edges, rounds)
    if converged or algorithm == "label":
        return cc
    # long-diameter fallback: current labels are intra-component edges —
    # union them in so the star contraction starts from the partial work
    label_edges = (cc.filter(F.col("id") != F.col("comp"))
                   .select(F.col("id").alias("src"),
                           F.col("comp").alias("dst")))
    return _star_components(edges.unionByName(label_edges))[0]


def canonical_survivors(df: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id",
                        id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Drop every document whose near-dup component has a smaller id —
    the cluster-level dedup a pairwise report can't do (A~B, B~C must
    drop B AND C even though (A,C) was never scored)."""
    comp = connected_components(pairs, id_a, id_b)
    losers = comp.filter(F.col("id") != F.col("comp")).select("id")
    return df.join(losers, df[id_col] == losers["id"], "left_anti")


def containment_pairs(df: DataFrame, text_col: str, id_col: str, n: int = 3,
                      min_containment: float = 0.5,
                      max_doc_freq: float | None = None,
                      n_docs: int | None = None) -> DataFrame:
    """Exact n-gram CONTAINMENT near-dup pairs: inter / min(|A|, |B|).

    Jaccard misses doc-in-doc duplication — a page embedded inside a much
    larger page scores |A∩B|/|A∪B| ~ |A|/|B| -> 0 however complete the
    copy. Containment normalizes by the smaller shingle set, so a fully
    embedded doc scores 1.0 regardless of the host's size; it is the
    standard second threshold next to Jaccard in crawl dedup (Broder's
    resemblance/containment pair). Same plan shape as ``jaccard_pairs``:
    shingle equi self-join, pair agg, size attach — the threshold is the
    only difference, so the 100 TB posture is identical.
    """
    sh = _doc_freq_filter(word_shingles(df, text_col, id_col, n),
                          max_doc_freq, n_docs)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle")) &
                    (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("doc_a"),
                      F.col("b.id").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("containment",
                        F.col("inter").cast("double") /
                        F.least(F.col("n_a"), F.col("n_b")))
            .filter(F.col("containment") >= min_containment)
            .select("doc_a", "doc_b", "containment"))


def keep_best_in_components(df: DataFrame, comp: DataFrame, id_col: str,
                            order_cols: list) -> DataFrame:
    """Quality-aware survivor selection: given ``comp`` as ``(id, comp)``
    cluster labels over the near-dup subgraph, keep exactly one doc per
    duplicate cluster — the one ranked first by ``order_cols`` (e.g.
    longest text, best quality score) — and every singleton.

    The rank window runs ONLY over the clustered rows (the near-dup
    subgraph); singletons join nothing and keep by default, so at 100 TB
    the window input is duplicate-cluster-sized, not corpus-sized.
    """
    ranked = (df.join(comp.withColumnRenamed("id", id_col), id_col)
              .withColumn("__rn", F.row_number().over(
                  Window.partitionBy("comp").orderBy(*order_cols))))
    labeled = ranked.select(id_col, "comp",
                            (F.col("__rn") == 1).alias("keep"))
    rest = (df.join(labeled.select(id_col), id_col, "left_anti")
            .select(F.col(id_col),
                    F.col(id_col).cast("long").alias("comp"),
                    F.lit(True).alias("keep")))
    return labeled.unionByName(rest)


def prefix_filter_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                                n: int = 3, min_jaccard: float = 0.5,
                                order: str = "df",
                                materialize: bool = False) -> DataFrame:
    """Exact Jaccard pairs >= threshold via PREFIX FILTERING (the
    PPJoin/AllPairs family, Chaudhuri et al. / Xiao et al.): provably no
    false negatives, unlike LSH, yet never joins on every shingle like
    ``jaccard_pairs``.

    Under any fixed global token order, two sets with J(A,B) >= t share
    at least one token within each side's first ``|x| - ceil(t|x|) + 1``
    tokens (else the whole intersection fits in a suffix shorter than
    t·|x| <= |A∩B| — contradiction via the minimal-rank shared token).
    So the candidate join runs on PREFIX tokens only — at t=0.8 that is
    ~20% of the shingle join volume — and each candidate pair verifies
    ROW-LOCALLY with an array intersection (the full token sets ride the
    pair row; no second shuffle, no re-join against the shingle table).

    ``order='df'`` ranks rarest-first (the classic candidate-minimizing
    order; costs one dictionary-sized — not corpus-sized — global sort);
    ``order='hash'`` uses xxhash64 rank with NO global sort at all
    (correctness is order-independent; candidates are merely less
    pruned). Output identical to ``jaccard_pairs`` at the same
    threshold: (doc_a, doc_b, jaccard).

    The tokenized per-doc frame is MATERIALIZED once
    (``iter_checkpoint``) before its triple consumption (prefix explode
    + both verify sides) — r15: without it the full ``docs`` lineage
    (shingle tokenize + df-dictionary build, TWO corpus scans) re-ran
    once per consumer, 8 parquet scans per execution in the committed
    plan; with it the corpus is scanned twice total (tokenize + df)
    and every consumer reads doc-sized materialized blocks. The 100 TB
    recipe: lineage re-execution scales with corpus size, the
    materialized frame with doc count. The bench rebuilds it inside
    the timed region (BUILD_IN_TIMING). ``materialize=True``
    additionally persists the frame (kept for API/test compat);
    results are identical either way.
    """
    from mapreduce_wsi_spark.util import iter_checkpoint
    sh = word_shingles(df, text_col, id_col, n)
    if order == "df":
        # rarest-first WITHOUT a global sort: rank = df in the high bits,
        # hash in the low bits — computed map-side off the df aggregate,
        # where a row_number over the dictionary would serialize into a
        # single-partition window (with the length filter below:
        # measured 5.0 s -> ~3.4 s at sf0.1).
        # Rank ties/collisions are CORRECTNESS-SAFE: a shared token gets
        # the same rank on both sides by construction (so no false
        # negatives), and a collision between different tokens merely
        # adds a candidate the exact verify kills. df saturates at 2^22
        # so the composite never overflows a long — beyond that a token
        # is stopword-grade and its exact rank stops mattering.
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        ranked = freq.select(
            "shingle",
            (F.least(F.col("__df"), F.lit((1 << 22) - 1)) * F.lit(1 << 41)
             + F.xxhash64("shingle").bitwiseAND(F.lit((1 << 41) - 1)))
            .alias("__rank"))
        sh = sh.join(ranked, "shingle").select("id", "__rank")
    else:
        sh = sh.select("id", F.xxhash64("shingle").alias("__rank"))

    # docs is consumed three times (prefix explode + both verify
    # sides); the materialize knob persists it per the 100 TB note in
    # the docstring (MEMORY_AND_DISK: a tokenized frame that outgrows
    # executor memory spills instead of OOMing)
    docs = (sh.groupBy("id")
            .agg(F.sort_array(F.collect_list("__rank")).alias("__toks"))
            .withColumn("__n", F.size("__toks"))
            .withColumn("__p", F.col("__n")
                        - F.ceil(F.lit(min_jaccard) * F.col("__n")).cast("int")
                        + F.lit(1)))
    if materialize:
        from pyspark import StorageLevel
        docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    # ONE tokenize+rank lineage per execution: materialize the per-doc
    # (id, __toks, __n, __p) frame; the prefix explode and both verify
    # sides read the materialized blocks instead of each re-running
    # the two corpus scans (guide §1.2/§5; see docstring)
    docs = iter_checkpoint(docs)
    pref = docs.select("id", "__n", F.posexplode(
        F.slice("__toks", 1, F.col("__p"))).alias("__i", "__rank"))
    a, b = pref.alias("a"), pref.alias("b")
    # PPJoin length filter inside the candidate join: J(A,B) >= t forces
    # t|A| <= |B| <= |A|/t, so size-mismatched pairs die before the
    # distinct — the guard against quadratic fan-out inside hot ranks.
    # r15: PPJoin POSITIONAL filter too (guide §3 candidate pruning):
    # a match at 0-based prefix positions (i, j) bounds the overlap by
    # ub = 1 + min(|A|-i-1, |B|-j-1), and J >= t forces overlap >=
    # alpha = ceil(t/(1+t) * (|A|+|B|)). Output-preserving: every true
    # pair's MINIMAL-rank common token lies in both prefixes (the
    # prefix lemma) and at that event no earlier common token exists,
    # so ub there is a valid overlap bound and >= alpha — the event
    # survives; pruned events only ever feed the same distinct. The
    # 1e-9 slack keeps float rounding of alpha from ever exceeding the
    # exact threshold (pruning less, never more). Measured at sf0.1:
    # candidate pairs 310k -> 125k before the distinct + verify joins.
    ub = (F.lit(1) + F.least(F.col("a.__n") - F.col("a.__i") - 1,
                             F.col("b.__n") - F.col("b.__i") - 1))
    alpha = F.ceil((F.col("a.__n") + F.col("b.__n"))
                   * F.lit(min_jaccard / (1.0 + min_jaccard))
                   - F.lit(1e-9))
    cands = (a.join(b, (F.col("a.__rank") == F.col("b.__rank")) &
                    (F.col("a.id") < F.col("b.id")) &
                    (F.col("b.__n") * F.lit(min_jaccard) <= F.col("a.__n")) &
                    (F.col("a.__n") * F.lit(min_jaccard) <= F.col("b.__n")) &
                    (ub >= alpha))
             .select(F.col("a.id").alias("doc_a"),
                     F.col("b.id").alias("doc_b"))
             .distinct())
    da = docs.select(F.col("id").alias("doc_a"),
                     F.col("__toks").alias("__ta"), F.col("__n").alias("n_a"))
    db = docs.select(F.col("id").alias("doc_b"),
                     F.col("__toks").alias("__tb"), F.col("__n").alias("n_b"))
    verified = (cands.join(da, "doc_a").join(db, "doc_b")
                .withColumn("__i",
                            F.size(F.array_intersect("__ta", "__tb")))
                .withColumn("jaccard",
                            F.col("__i").cast("double") /
                            (F.col("n_a") + F.col("n_b") - F.col("__i")))
                .filter(F.col("jaccard") >= min_jaccard))
    return verified.select("doc_a", "doc_b", "jaccard")


def _snm_pass_pairs(base: DataFrame, blk: list[str],
                    window: int) -> DataFrame:
    """One sorted-neighborhood pass without a single-partition (or
    block-cardinality) window. Total order O = (*blk, __sn_k, __sn_id).

    1. Range-partition on O (contiguous key ranges land in pid order)
       and PIN the sampled layout with ``iter_checkpoint`` — the
       per-pid counts and per-pid ranks must see the same boundaries,
       and RangePartitioner re-samples per job.
    2. One pid-keyed window stage computes rank, per-pid count and the
       ``window - 1`` leads — frame-local, so the BULK of the pairs
       costs exactly one exchange whose parallelism tracks the data,
       not the block cardinality.
    3. Leads cannot see across a range boundary. Every cross-boundary
       pair has BOTH endpoints within ``window - 1`` rows of a
       partition edge (any partition wholly jumped must be shorter
       than the window, hence inside the edge set too), so the
       boundary set B is <= 2 * P * (window - 1) rows — bounded by the
       partition count, never the data. B gets exact global positions
       (prefix-summed per-pid counts: a <= P-row collect, the
       assign_global_ids driver-action class) and a tiny position
       equi-join emits the cross-pid pairs; the final distinct absorbs
       the same-pid overlap."""
    from mapreduce_wsi_spark.util import iter_checkpoint

    order_cols = blk + ["__sn_k", "__sn_id"]
    r = iter_checkpoint(
        base.repartitionByRange(*[F.col(c) for c in order_cols])
        .withColumn("__sn_pid", F.spark_partition_id()))

    w = Window.partitionBy("__sn_pid").orderBy(*order_cols)
    wall = (Window.partitionBy("__sn_pid").orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    nb_struct = F.struct(F.col("__sn_id").alias("nb"),
                         *[F.col(c).alias(f"b_{c}") for c in blk])
    en = r.select(
        "__sn_id", *blk, "__sn_pid",
        F.row_number().over(w).alias("__sn_rank"),
        F.count(F.lit(1)).over(wall).alias("__sn_cnt"),
        F.array(*[F.lead(nb_struct, j).over(w)
                  for j in range(1, window)]).alias("__sn_nbs"))

    main = (en.select("__sn_id", *blk,
                      F.explode("__sn_nbs").alias("__sn_nb"))
            .filter(F.col("__sn_nb").isNotNull()))
    for c in blk:  # leads may cross a block edge inside a partition;
        # eqNullSafe: NULL block values form ONE block (the pre-rebuild
        # Window.partitionBy semantics) instead of silently pairing
        # nothing under null-unsafe equality (ADVICE r8)
        main = main.filter(F.col("__sn_nb")[f"b_{c}"].eqNullSafe(F.col(c)))
    main = main.select("__sn_id",
                       F.col("__sn_nb")["nb"].alias("__sn_nb"))

    counts = {row["__sn_pid"]: row["__sn_cnt"]
              for row in en.select("__sn_pid", "__sn_cnt")
              .groupBy("__sn_pid").agg(
                  F.first("__sn_cnt").alias("__sn_cnt")).collect()}
    offsets, acc = [], 0
    for p in sorted(counts):
        offsets.append((p, acc))
        acc += counts[p]
    from mapreduce_wsi_spark.util import literal_df
    off = literal_df(base.sparkSession,
                     offsets or [(0, 0)], "__sn_pid int, __sn_off long")

    edge = (en.filter((F.col("__sn_rank") <= window - 1)
                      | (F.col("__sn_rank")
                         > F.col("__sn_cnt") - (window - 1)))
            .join(F.broadcast(off), "__sn_pid")
            .select("__sn_id", *blk, "__sn_pid",
                    (F.col("__sn_off") + F.col("__sn_rank"))
                    .alias("__sn_pos")))
    ea = (edge.withColumn("__sn_j", F.explode(F.array(
              *[F.lit(j) for j in range(1, window)])))
          .select("__sn_id", *blk, F.col("__sn_pid").alias("__sn_pa"),
                  (F.col("__sn_pos") + F.col("__sn_j"))
                  .alias("__sn_tgt")))
    eb = edge.select(F.col("__sn_id").alias("__sn_nb"), *blk,
                     F.col("__sn_pid").alias("__sn_pb"),
                     F.col("__sn_pos").alias("__sn_tgt"))
    # eqNullSafe on the block keys for the same NULL-block reason as the
    # in-partition filter above; __sn_tgt is never null (rank + offset)
    ea, eb = ea.alias("__sn_ea"), eb.alias("__sn_eb")
    cond = [F.col(f"__sn_ea.{c}").eqNullSafe(F.col(f"__sn_eb.{c}"))
            for c in blk]
    cond.append(F.col("__sn_ea.__sn_tgt") == F.col("__sn_eb.__sn_tgt"))
    cross = (ea.join(eb, on=cond)
             .filter(F.col("__sn_pa") != F.col("__sn_pb"))
             .select(F.col("__sn_ea.__sn_id").alias("__sn_id"),
                     F.col("__sn_eb.__sn_nb").alias("__sn_nb")))

    return main.unionByName(cross)


def sorted_neighborhood_pairs(df: DataFrame, id_col: str,
                              sort_exprs: list[Column], window: int = 4,
                              block_col: str | None = None) -> DataFrame:
    """Multi-pass sorted-neighborhood blocking (Hernandez & Stolfo,
    SIGMOD 1995): for each pass's sort key, order the records (within
    ``block_col`` when given) and emit each record paired with its next
    ``window - 1`` neighbors in that order; the union of passes is the
    candidate set. Emits (doc_a, doc_b) with doc_a < doc_b, distinct
    across passes.

    Scale shape: candidates are O(n * (window-1) * passes) — LINEAR in
    the corpus, never the O(n^2) cross join, and unlike hash blocking a
    sorted neighborhood catches near-keys that differ in a low-order
    character (hash blocks would separate them). The r8 rebuild removed
    the blocking-key window: ``Window.partitionBy(block_col)`` caps
    parallelism at the BLOCK CARDINALITY (5 langs at any corpus size —
    2.06M rows through one task at the sf100 probe scale, 41% skew to
    'en' — and a per-lang sort that is a few seconds at 5M rows is
    simply impossible at 100 TB per-lang volumes), and the no-block
    variant was a single-partition global sort outright. Each pass now
    runs ``_snm_pass_pairs``: range-partition on the total order
    (block, key, id) — the sampler splits hot blocks, so parallelism
    tracks data — take the ``window - 1`` leads frame-locally inside
    each range partition (one exchange buys the bulk of the pairs),
    and stitch the partition edges with a tiny position equi-join over
    the <= 2 * P * (window - 1) boundary rows. Blocks are contiguous
    under the block-major order, so "global successor, same block" is
    exactly the blocked lead(); the pair set is identical to the
    window form (pinned by the oracle twins and the SNM unit tests).
    Dirty sort keys are why MULTI-pass exists: a typo in one pass's key
    prefix is usually absent from another pass's key (the paper's
    multi-pass + transitive-closure result), and the union feeds
    `connected_components` downstream."""
    from mapreduce_wsi_spark.util import iter_checkpoint

    assert window >= 2
    blk = [block_col] if block_col is not None else []
    # ALL pass keys in one projection, materialized once: the sort keys
    # are typically derived from an expensive normalization (prepare_er:
    # a corpus-wide regexp), and each pass's range partitioner SAMPLES
    # its input before shuffling it — without this cut the derivation
    # would re-run 2-3x per pass through the sample + exchange +
    # checkpoint lineages (measured +60% on the sf100 probe).
    proj = iter_checkpoint(df.select(
        F.col(id_col).alias("__sn_id"), *[F.col(c) for c in blk],
        *[key.alias(f"__sn_k{i}") for i, key in enumerate(sort_exprs)]))
    # ALL passes through ONE range exchange (r14): each row explodes to
    # (pass, key) and the pass index rides as the LEADING block column,
    # so pass ranges are contiguous under the (pass, block, key, id)
    # total order and the frame-local leads + boundary stitch of
    # _snm_pass_pairs never pair across passes (same eqNullSafe block
    # filter that already guards block edges). Identical pair set to
    # per-pass invocations — the union is just vertical layout — at ONE
    # sampling job + ONE shuffle + ONE checkpoint + ONE offsets collect
    # for the whole family instead of one of each per pass; total bytes
    # exchanged are unchanged (passes x corpus either way).
    base = proj.select(
        "__sn_id", *blk,
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("p"),
                     F.col(f"__sn_k{i}").alias("k"))
            for i in range(len(sort_exprs))])).alias("__sn_pk"))
    base = base.select("__sn_id",
                       F.col("__sn_pk.p").alias("__sn_pass"), *blk,
                       F.col("__sn_pk.k").alias("__sn_k"))
    pairs = _snm_pass_pairs(base, ["__sn_pass"] + blk, window)
    return pairs.select(
        F.least("__sn_id", "__sn_nb").alias("doc_a"),
        F.greatest("__sn_id", "__sn_nb").alias("doc_b")).distinct()


def fellegi_sunter_score(pairs: DataFrame,
                         field_mu: dict[str, tuple[float, float]],
                         upper_nanos: int = 2_000_000_000,
                         lower_nanos: int = 0) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (JASA 1969): given
    candidate pairs with one BOOLEAN agreement column per comparison
    field and per-field (m, u) probabilities (m = P(agree | match),
    u = P(agree | non-match)), score each pair with the log-likelihood
    ratio  sum_j [ gamma_j ? ln(m_j/u_j) : ln((1-m_j)/(1-u_j)) ]  and
    classify against the two thresholds: match / possible / non_match.

    Exactness: the ln() weights are computed ONCE here (driver-side)
    and truncated to integer NANOS — the per-pair score is then a pure
    BIGINT sum of plan literals, so any engine reproduces it bit-for-
    bit from the same (m, u) table; no transcendental function runs
    per row. m/u are deployment constants estimated offline (EM or a
    labeled sample), the same posture as the CCNet perplexity cutoffs.
    Map-only over the candidate frame: blocking (sorted-neighborhood /
    fuzzy join) bounds the pair count upstream, scoring adds no
    shuffle."""
    import math

    score = F.lit(0).cast("long")
    for col_name, (m, u) in field_mu.items():
        wa = int(math.log(m / u) * 1e9)
        wd = int(math.log((1 - m) / (1 - u)) * 1e9)
        score = score + F.when(F.col(col_name), F.lit(wa)) \
                         .otherwise(F.lit(wd)).cast("long")
    out = pairs.withColumn("score_nanos", score)
    return out.withColumn(
        "cls",
        F.when(F.col("score_nanos") >= upper_nanos, "match")
        .when(F.col("score_nanos") >= lower_nanos, "possible")
        .otherwise("non_match"))


def fs_weights_nanos(field_mu: dict[str, tuple[float, float]]
                     ) -> dict[str, tuple[int, int]]:
    """The exact integer-nanos (agree, disagree) weights
    ``fellegi_sunter_score`` will use — exposed so an oracle twin (or a
    serving system) can spell the identical literals."""
    import math

    return {name: (int(math.log(m / u) * 1e9),
                   int(math.log((1 - m) / (1 - u)) * 1e9))
            for name, (m, u) in field_mu.items()}


def weighted_minhash_pairs(df: DataFrame, text_col: str, id_col: str,
                           k: int = 64, bands: int = 16,
                           min_jw: float = 0.5,
                           tf_cap: int = 32) -> DataFrame:
    """WEIGHTED-Jaccard near-dup pairs — J_w(a,b) = sum min(tf_a,tf_b)
    / sum max(tf_a,tf_b) over BIGRAM frequencies, the repetition-aware
    similarity plain set-Jaccard is blind to (a doc saying X once and a
    doc saying X fifty times are identical as SETS). MinHash handles
    integer weights by the replication trick (Gollapudi & Panigrahy
    2006): element (gram, i) for i = 1..tf — plain MinHash over the
    expanded multiset estimates exactly J_w. ``tf_cap`` clips
    frequencies (default 32) so a pathological gram can't explode a
    row; the exact verify applies the same clip, so the emitted values
    are exactly the clipped-J_w both here and in any twin.

    Bigrams, not unigrams, are the element space for the same reason
    the set-Jaccard family shingles: over a shared small vocabulary
    EVERY doc pair is unigram-similar, which floods ANY banding scheme
    with just-below-threshold candidates — measured 5.3M candidate
    pairs (42% of all pairs) at sf0.1 with unigrams vs a clean planted
    separation with bigrams. Order sensitivity comes free.

    Plan shape: the expansion is corpus-gram-count-sized (the same
    order as the shingle tables), signatures are k aggregate mins (no
    row blowup past the explode), candidates ride the banded equi-join,
    and the exact verify joins gram tables for CANDIDATES only with
    sum-max recovered as S_a + S_b - sum-min (one join, no max side)."""
    grams = F.expr(
        "CASE WHEN size(__ws) >= 2 THEN "
        "transform(sequence(1, size(__ws) - 1), "
        "i -> concat(element_at(__ws, i), ' ', element_at(__ws, i + 1)))"
        " ELSE array() END")
    toks = (df.select(F.col(id_col).alias("id"),
                      F.split(F.col(text_col), " ").alias("__ws"))
            .select("id", F.explode(grams).alias("token"))
            .groupBy("id", "token")
            .agg(F.least(F.count(F.lit(1)), F.lit(tf_cap)).alias("tf")))
    elems = toks.select(
        "id",
        F.explode(F.expr(
            "transform(sequence(1, tf), i -> concat(token, '#', i))"))
        .alias("el"))
    mins = [F.min(F.xxhash64(F.col("el"), F.lit(i))).alias(f"h{i}")
            for i in range(k)]
    sigs = (elems.groupBy("id").agg(*mins)
            .select("id", F.array(*[f"h{i}" for i in range(k)])
                    .alias("signature")))
    cands = lsh_candidate_pairs(sigs, bands, k // bands)

    tot = toks.groupBy("id").agg(F.sum("tf").alias("s"))
    a = toks.select(F.col("id").alias("doc_a"), "token",
                    F.col("tf").alias("tf_a"))
    b = toks.select(F.col("id").alias("doc_b"), "token",
                    F.col("tf").alias("tf_b"))
    inter = (cands.join(a, "doc_a").join(b, ["doc_b", "token"])
             .groupBy("doc_a", "doc_b")
             .agg(F.sum(F.least("tf_a", "tf_b")).alias("mn")))
    sa = tot.select(F.col("id").alias("doc_a"), F.col("s").alias("s_a"))
    sb = tot.select(F.col("id").alias("doc_b"), F.col("s").alias("s_b"))
    jw = (F.col("mn").cast("double")
          / (F.col("s_a") + F.col("s_b") - F.col("mn")))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .filter(jw >= min_jw)
            .select("doc_a", "doc_b", F.round(jw, 9).alias("jw")))
