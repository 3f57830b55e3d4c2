"""Evaluation metrics for model/retrieval/labeling pipelines.

A training-data platform is judged by the evals it feeds: ranking
quality (NDCG/MRR/precision@k) for retrieval corpora, ROC AUC for
quality classifiers, inter-annotator agreement (Cohen's kappa) for
label audits, plus the supporting distribution tools (equi-width
histograms, count-min frequency sketches, seeded per-key reservoir
samples). Everything here is DETERMINISTIC and engine-portable —
rank-statistic AUC instead of trapezoid sweeps, md5-derived hashing
instead of ``rand()``/``F.hash`` — so every metric has a bit-exact
DuckDB twin (the repo's oracle discipline, see plans/q_eval.py).

Scale posture: each metric is one narrow aggregation over the scored
frame — a per-(group, score) pre-aggregate before any window (so the
window runs over distinct scores, not raw rows), top-k windows for the
rank cutoffs, and broadcastable 1-row or sketch-sized side tables.
Nothing here materializes per-pair data.

Reference parity note: the reference system (acgessler/mapreduce-wsi,
src/*.java) exposes generic MapReduce over SQL imports; metric jobs
like these are the workloads its users hand-roll — re-expressed here
as declarative Spark plans (SURVEY.md §2C behavioral family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_wsi_spark.util import literal_df


def group_auc(df: DataFrame, group_col: str, score_col: str,
              label_col: str) -> DataFrame:
    """Exact ROC AUC per group via the Mann-Whitney rank statistic:
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg), where R_pos is
    the sum of 1-based AVERAGE ranks of the positives (average ranks
    make ties exact — the trapezoid-free, sort-once formulation).

    The window runs over the per-(group, score) AGGREGATE (distinct
    scores), not raw rows: at 100 TB the shuffle carries one row per
    distinct score per group, and the heavy count happens map-side.
    Returns (group, n_pos, n_neg, auc) with auc NULL for degenerate
    groups (all-positive / all-negative).

    Rows with a NULL label are dropped up front (ADVICE r6: counting
    them in c but not in sum(label) would silently score them as
    negatives) — the binary-label contract is enforced, not assumed.
    """
    df = df.where(F.col(label_col).isNotNull())
    per_score = df.groupBy(group_col, score_col).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col(label_col).cast("long")).alias("p"))
    w_lo = (Window.partitionBy(group_col).orderBy(score_col)
            .rowsBetween(Window.unboundedPreceding, -1))
    ranked = per_score.withColumn(
        "cum_below", F.coalesce(F.sum("c").over(w_lo), F.lit(0)))
    # average 1-based rank of this score's tie block: below + (c+1)/2
    contrib = ranked.withColumn(
        "pos_rank_sum",
        F.col("p") * (F.col("cum_below") + (F.col("c") + 1) / 2))
    agg = contrib.groupBy(group_col).agg(
        F.sum("pos_rank_sum").alias("r_pos"),
        F.sum("p").alias("n_pos"),
        (F.sum("c") - F.sum("p")).alias("n_neg"))
    return agg.select(
        group_col, "n_pos", "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            (F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2)
            / (F.col("n_pos") * F.col("n_neg"))).alias("auc"))


def cohens_kappa(df: DataFrame, group_col: str, a_col: str,
                 b_col: str) -> DataFrame:
    """Cohen's kappa per group for two binary annotators: kappa =
    (p_o - p_e) / (1 - p_e) with observed agreement p_o and the
    marginal-product chance agreement p_e. One aggregation pass — the
    four confusion-cell counts reduce map-side; no window, no join.
    kappa is NULL when p_e == 1 (a degenerate constant-label group)."""
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a).alias("na"),
        F.sum(b).alias("nb"),
        F.sum(a * b).alias("nab"))
    n, na, nb, nab = (F.col(c) for c in ("n", "na", "nb", "nab"))
    p_o = (2 * nab + n - na - nb) / n  # both-1 + both-0
    p_e = (na / n) * (nb / n) + (1 - na / n) * (1 - nb / n)
    return agg.select(
        group_col, "n",
        p_o.alias("p_observed"), p_e.alias("p_expected"),
        F.when(p_e < 1, (p_o - p_e) / (1 - p_e)).alias("kappa"))


def retrieval_metrics(scored: DataFrame, query_col: str, id_col: str,
                      score_col: str, rel_col: str,
                      k: int = 10) -> DataFrame:
    """Graded-relevance ranking metrics per query at cutoff k:
    precision@k (binary rel > 0), MRR@k (reciprocal rank of the first
    relevant hit), DCG@k with the (2^rel - 1)/log2(pos+1) gain, and
    NDCG@k against the ideal ordering (rel DESC over ALL candidates,
    not just the retrieved k — the standard definition).

    ``scored`` has one row per (query, candidate) with the system score
    and the true relevance grade. Two top-k windows per query (system
    order and ideal order) — the per-group top-k pattern; everything
    after runs on <= 2k rows per query. Ties break on id for
    engine-stable cutoffs."""
    sys_w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col))
    ideal_w = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col))
    gain = (F.pow(F.lit(2.0), F.col(rel_col)) - 1)

    top = (scored.withColumn("pos", F.row_number().over(sys_w))
           .where(F.col("pos") <= k))
    sys_agg = top.groupBy(query_col).agg(
        (F.sum((F.col(rel_col) > 0).cast("int")) / k).alias("p_at_k"),
        F.coalesce(
            F.max(F.when(F.col(rel_col) > 0, 1.0 / F.col("pos"))),
            F.lit(0.0)).alias("mrr"),
        F.sum(gain / F.log2(F.col("pos") + 1)).alias("dcg"))

    ideal = (scored.withColumn("pos", F.row_number().over(ideal_w))
             .where(F.col("pos") <= k))
    ideal_agg = ideal.groupBy(query_col).agg(
        F.sum(gain / F.log2(F.col("pos") + 1)).alias("idcg"))

    # no broadcast hint: both sides leave a window partitioned by
    # query_col, so the join is already co-partitioned (no extra
    # exchange), and ideal_agg is one row PER QUERY — unbounded in the
    # query set, so pinning it broadcast would contradict the module's
    # scale posture (ADVICE r6). AQE still broadcasts small cases.
    return sys_agg.join(ideal_agg, query_col).select(
        query_col, "p_at_k", "mrr", "dcg",
        F.when(F.col("idcg") > 0,
               F.col("dcg") / F.col("idcg")).alias("ndcg"))


def equiwidth_histogram(df: DataFrame, value_col: str,
                        n_bins: int = 20) -> DataFrame:
    """Equi-width histogram: n_bins equal intervals between the global
    min and max, the top edge inclusive (least(n_bins-1, ...) folds the
    max into the last bin). The 1-row bounds aggregate broadcasts into
    a map-side bin assignment — one scan + one tiny shuffle on bin id;
    the full-range cross join is pinned broadcast so no executor ever
    sees more than its own rows plus two doubles."""
    bounds = df.agg(F.min(value_col).alias("mn"),
                    F.max(value_col).alias("mx"))
    v = F.col(value_col)
    binned = df.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
            F.least(F.lit(n_bins - 1),
                    F.floor((v - F.col("mn"))
                            / (F.col("mx") - F.col("mn")) * n_bins)))
        .cast("int").alias("bin"),
        F.col("mn"), F.col("mx"))
    return binned.groupBy("bin", "mn", "mx").agg(
        F.count(F.lit(1)).alias("n")).select(
        "bin",
        (F.col("mn") + F.col("bin") * (F.col("mx") - F.col("mn"))
         / n_bins).alias("bin_lo"),
        "n")


def calibration_curve(df: DataFrame, prob_col: str, label_col: str,
                      n_bins: int = 10) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier: bucket
    predictions into n_bins equal probability intervals and report the
    mean predicted probability vs the observed positive rate per bin —
    the standard calibration check a quality-model gate runs before its
    scores are trusted as thresholds.

    Order-free arithmetic: predicted probabilities enter the sum as
    9dp DECIMALs (exact, partial-aggregation order cannot perturb
    them — the repo's decimal-centroid trick), and the observed rate
    is an integer count ratio; the only float division happens once,
    per bin, identically on any engine."""
    p = F.col(prob_col)
    binned = df.select(
        F.least(F.lit(n_bins - 1), F.floor(p * n_bins))
        .cast("int").alias("bin"),
        F.round(p, 9).cast("decimal(18,9)").alias("p_dec"),
        F.col(label_col).cast("long").alias("y"))
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p_dec").alias("sum_p"),
        F.sum("y").alias("n_pos"))
    return agg.select(
        "bin", "n", "n_pos",
        (F.col("sum_p").cast("double") / F.col("n")).alias("mean_p"),
        (F.col("n_pos") / F.col("n")).alias("frac_pos"))


def confusion_f1(df: DataFrame, truth_col: str,
                 pred_col: str) -> DataFrame:
    """Per-class precision / recall / F1 from a multiclass prediction
    frame. One shuffle: the (truth, pred) confusion cells aggregate
    map-side to at most |classes|^2 rows; everything after runs on that
    tiny cell table (broadcast joins of its 1-key margins). Classes
    appearing only in truth or only in pred still get a row (full outer
    margin join) with zero-count semantics; F1 is NULL when both
    precision and recall are 0 (undefined 0/0)."""
    cells = df.groupBy(
        F.col(truth_col).alias("truth"), F.col(pred_col).alias("pred")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tp = (cells.where(F.col("truth") == F.col("pred"))
          .select(F.col("truth").alias("cls"),
                  F.col("cnt").alias("tp")))
    pred_m = cells.groupBy(F.col("pred").alias("cls")).agg(
        F.sum("cnt").alias("n_pred"))
    truth_m = cells.groupBy(F.col("truth").alias("cls")).agg(
        F.sum("cnt").alias("n_truth"))
    m = (truth_m.join(F.broadcast(pred_m), "cls", "full_outer")
         .join(F.broadcast(tp), "cls", "left")
         .select("cls",
                 F.coalesce("tp", F.lit(0)).alias("tp"),
                 F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
                 F.coalesce("n_truth", F.lit(0)).alias("n_truth")))
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
    rec = F.when(F.col("n_truth") > 0, F.col("tp") / F.col("n_truth"))
    return m.select(
        "cls", "tp", "n_pred", "n_truth",
        prec.alias("precision"), rec.alias("recall"),
        F.when(F.coalesce(prec, F.lit(0.0))
               + F.coalesce(rec, F.lit(0.0)) > 0,
               2 * F.coalesce(prec, F.lit(0.0))
               * F.coalesce(rec, F.lit(0.0))
               / (F.coalesce(prec, F.lit(0.0))
                  + F.coalesce(rec, F.lit(0.0)))).alias("f1"))


def _md5_bucket(col, seed: int, width: int):
    """Engine-portable hash bucket family: ONE md5 digest per key, with
    hash row ``seed`` reading its own 8-hex-char window (32 hex chars =
    4 independent 32-bit hashes per digest — a measured 4x cut of the
    per-row hash cost vs hashing (key, seed) pairs). DuckDB mirrors it
    with CAST(('0x' || substr(md5(..), 8*seed+1, 8)) AS BIGINT) %
    width. Seeds above 3 fold back onto re-salted digests."""
    assert 0 <= seed <= 3, "one digest carries 4 hash rows"
    return (F.conv(F.substring(F.md5(col.cast("string")),
                               8 * seed + 1, 8), 16, 10)
            .cast("long") % width)


def cms_build(df: DataFrame, key_col: str, depth: int = 4,
              width: int = 256,
              materialize: bool = False) -> DataFrame:
    """Count-min sketch build: ``depth`` hash rows of ``width`` buckets
    carved as 8-hex-char windows of ONE md5 digest per key. Shape: one
    fully-codegen'd scan+partial-agg pass per hash row, unioned —
    measured 2.2x FASTER at sf0.1 than the explode-to-(seed,bucket)
    single-shuffle alternative, because the generator breaks
    whole-stage codegen while each per-row pass pipelines scan ->
    md5 -> hash-agg in one codegen stage (tools note in SCALE.md).
    Each pass's exchange moves <= width rows (map-side partial agg), so
    the ``depth`` rescans read one pruned column each — cheap for
    narrow keys. For WIDE keys on a huge corpus, ``materialize=True``
    persists the 1-digest projection so the key bytes are scanned once
    and the passes re-read 32-hex digests instead; in that mode the
    call returns ``(sketch, digests)`` so the caller has a real handle
    to ``digests.unpersist()`` after its build action (ADVICE r6 — the
    unioned frame's lineage gives no such handle). Deterministic md5
    hashing makes the sketch itself oracle-checkable, not just its
    estimates."""
    digests = df.select(F.md5(F.col(key_col).cast("string"))
                        .alias("_dig"))
    if materialize:
        digests = digests.persist()
    parts = [
        digests.select(
            (F.conv(F.substring("_dig", 8 * s + 1, 8), 16, 10)
             .cast("long") % width).alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit(s).alias("seed"), "bucket", "cnt")
        for s in range(depth)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if materialize:
        return out, digests
    return out


def cms_estimate(probes: DataFrame, sketch: DataFrame, key_col: str,
                 depth: int = 4, width: int = 256) -> DataFrame:
    """Point-frequency estimates: min over the sketch rows of the
    probed bucket's count — the count-min upper-bound estimator
    (est >= true count always; overshoot bounded by collisions).
    Probes explode to ``depth`` rows each and broadcast-join the tiny
    sketch; the corpus is never rescanned."""
    exploded = probes.select(
        key_col,
        F.explode(F.array(*[F.lit(s) for s in range(depth)]))
        .alias("seed"))
    # seed is a COLUMN here, so the bucket hash inlines the same
    # one-digest / per-seed-hex-window derivation _md5_bucket builds
    # for literal seeds
    exploded = exploded.withColumn(
        "bucket",
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")),
                           F.col("seed") * 8 + 1, F.lit(8)),
               16, 10).cast("long") % width)
    joined = exploded.join(F.broadcast(sketch), ["seed", "bucket"],
                           "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))


def reservoir_sample_per_key(df: DataFrame, key_col: str, id_col: str,
                             k: int = 5) -> DataFrame:
    """Seeded per-key uniform sample without replacement: keep the k
    rows with the smallest md5(id) per key — the deterministic
    equivalent of a per-key reservoir (a uniform random hash induces a
    uniform random k-subset), reproducible across engines and runs
    unlike Algorithm R's RNG state. Top-k-per-group window on the hash;
    id_col is a final orderBy tie-break so duplicate ids (which md5 to
    the same digest) still rank deterministically across runs
    (ADVICE r6 — uniqueness is no longer assumed)."""
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(key_col).orderBy(h, F.col(id_col))
    return (df.withColumn("smp_rank", F.row_number().over(w))
            .where(F.col("smp_rank") <= k))


def log_loss_brier(df: DataFrame, group_col: str, prob_col: str,
                   label_col: str) -> DataFrame:
    """Per-group cross-entropy (log loss) and Brier score for a
    probabilistic binary classifier — the two proper scoring rules a
    quality-model gate reports next to AUC (AUC ranks; these two
    punish miscalibrated confidence).

    Order-free arithmetic: each row's -[y ln p + (1-y) ln(1-p)] term
    is one double expression rounded to DECIMAL(28,9) before the sum
    (the char-entropy idiom — identical per-row doubles on any engine,
    then an exact decimal sum no partial-aggregation order can
    perturb); the squared error (p - y)^2 is computed in DECIMAL from
    a 9dp-quantized p, so it is exact by construction. One map-side
    partial + final aggregation per group; no window, no join —
    at 100 TB the shuffle carries |groups| rows. Probabilities must be
    in (0, 1) exclusive; rows violating that (or NULL labels) are the
    caller's contract to pre-filter, matching group_auc."""
    p = F.col(prob_col)
    y = F.col(label_col).cast("long")
    ll_term = (-(y * F.log(p) + (1 - y) * F.log(1 - p))
               ).cast("decimal(28,9)")
    p_dec = F.round(p, 9).cast("decimal(18,9)")
    sq = (p_dec - y) * (p_dec - y)  # decimal: exact
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ll_term).alias("sum_ll"),
        F.sum(sq).alias("sum_sq"))
    return agg.select(
        group_col, "n",
        (F.col("sum_ll").cast("double") / F.col("n")).alias("log_loss"),
        (F.col("sum_sq").cast("double") / F.col("n")).alias("brier"))


def spearman_corr(df: DataFrame, group_col: str, x_col: str,
                  y_col: str) -> DataFrame:
    """Per-group Spearman rank correlation with average-rank tie
    handling — the distribution-free association check between two
    quality signals (does the model score track the heuristic score?).

    EXACT integer arithmetic throughout: the average rank of a tie
    block is (2*min_rank + ties - 1)/2, so DOUBLED average ranks are
    integers — every moment (sum, sum of products, sum of squares)
    aggregates as an exact BIGINT, and Pearson over doubled ranks
    equals Pearson over ranks (scale invariance). The one float
    division happens per group at the end. Shuffle shape: two
    rank windows over the same group partition (one exchange — Spark
    reuses the partitioning) plus per-(group, value) tie counts;
    BIGINT moments hold to ~2.6e5 rows per group (doubled-rank^2 * n
    < 2^63) — past that, widen to DECIMAL(38,0), noted not silent."""
    gw = Window.partitionBy(group_col)
    dx = (2 * F.rank().over(gw.orderBy(x_col))
          + F.count(F.lit(1)).over(Window.partitionBy(group_col, x_col))
          - 2).alias("dx")  # doubled avg rank, 0-based: 2(r-1)+(t-1)
    dy = (2 * F.rank().over(gw.orderBy(y_col))
          + F.count(F.lit(1)).over(Window.partitionBy(group_col, y_col))
          - 2).alias("dy")
    ranked = df.select(F.col(group_col), dx, dy)
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"), F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = F.col("sxy").cast("double") - sx.cast("double") * sy / n
    vx = F.col("sxx").cast("double") - sx.cast("double") * sx / n
    vy = F.col("syy").cast("double") - sy.cast("double") * sy / n
    return agg.select(
        group_col, "n",
        F.when((vx > 0) & (vy > 0),
               cov / F.sqrt(vx * vy)).alias("spearman"))


def average_precision(df: DataFrame, group_col: str, id_col: str,
                      score_col: str, label_col: str) -> DataFrame:
    """Exact per-group average precision (area under the
    precision-recall curve, step interpolation): AP = (1/n_pos) *
    sum over positive ranks i of (cum_pos_i / i), under the total
    order (score DESC, id) — the id tie-break makes the curve, and
    hence AP, engine-stable in the presence of score ties (the same
    convention as retrieval_metrics' cutoffs).

    Each precision@i term is one double division rounded to
    DECIMAL(28,9) before the per-group sum (order-free exact
    decimals); the final /n_pos division happens once per group. The
    ranking window carries the raw scored rows — a per-group sort is
    the irreducible cost of an exact PR curve; groups are queries/
    model-versions (bounded cardinality), and each group's rows spill
    to its own partition, never to one global sort."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col))
    y = F.col(label_col).cast("long")
    ranked = df.select(
        F.col(group_col), y.alias("y"),
        F.row_number().over(w).alias("i"),
        F.sum(y).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_pos"))
    term = F.when(
        F.col("y") == 1,
        (F.col("cum_pos") / F.col("i")).cast("decimal(28,9)"))
    agg = ranked.groupBy(group_col).agg(
        F.sum("y").alias("n_pos"),
        F.count(F.lit(1)).alias("n"),
        F.sum(term).alias("sum_prec"))
    return agg.select(
        group_col, "n", "n_pos",
        F.when(F.col("n_pos") > 0,
               F.col("sum_prec").cast("double") / F.col("n_pos"))
        .alias("avg_precision"))


def skew_kurtosis_exact(df: DataFrame, group_col: str,
                        value_col: str) -> DataFrame:
    """Per-group population skewness and excess kurtosis from EXACT
    integer power sums — the 3rd/4th-moment extension of
    var_std_exact's discipline for integer-valued measures: S1..S4
    aggregate as BIGINTs (order-free), central moments expand via
    m_k = E[(x - mu)^k] in double once per group, skew = m3/m2^1.5,
    kurt = m4/m2^2 - 3. NOT the sample-adjusted estimators some
    engines build in (DuckDB's skewness() applies n/((n-1)(n-2))):
    the explicit formula is mirrored in the oracle operation by
    operation. BIGINT S4 holds for |x| <= ~5500 at 1e6 rows per
    group; wider measures cast S3/S4 to DECIMAL(38,0), noted not
    silent. One partial+final aggregation, |groups| output rows."""
    x = F.col(value_col).cast("long")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"))
    n = F.col("n").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    s3, s4 = F.col("s3").cast("double"), F.col("s4").cast("double")
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * s2 / n + 2 * mu * mu * mu
    m4 = (s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n
          - 3 * mu * mu * mu * mu)
    return agg.select(
        group_col, "n",
        F.when(m2 > 0, m3 / F.pow(m2, 1.5)).alias("skewness"),
        F.when(m2 > 0, m4 / (m2 * m2) - 3).alias("kurtosis"))


def kendall_tau(df: DataFrame, group_col: str, x_col: str,
                y_col: str) -> DataFrame:
    """Per-group Kendall tau-b — the concordance coefficient with tie
    corrections: tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2)), n0 =
    n(n-1)/2, n1/n2 = tied-pair counts in x/y. A genuinely
    non-relational operator: SQL expresses it only as an O(n^2)
    within-group pair join (the oracle's formulation), so the engine
    path is Knight's O(n log n) algorithm (W. R. Knight 1966) inside
    an Arrow ``applyInPandas`` kernel: sort by (x, y), count
    discordant pairs as merge-sort inversions of the y sequence
    (numpy bottom-up merges, searchsorted per run — no Python
    per-element loop), and C - D = n0 - n1 - n2 + n3 - 2*swaps.

    Group-parallel: each group's rows land in one Arrow batch stream
    (the groupBy shuffle is the only data movement) and groups run
    concurrently; the integer C - D and both tie counts are exact, so
    the one sqrt/division per group is engine-portable. tau_b is NULL
    when either denominator factor is 0 (a constant x or y)."""
    import numpy as np
    import pandas as pd

    def inversions(a: "np.ndarray") -> int:
        """Bottom-up merge-count of pairs (i < j, a[i] > a[j])."""
        inv = 0
        runs = [np.sort(a[i:i + 64], kind="stable")
                for i in range(0, len(a), 64)]
        # seed: inversions inside each <=64-run via one vectorized
        # strict upper-triangle comparison (64^2 bools, negligible)
        for i in range(0, len(a), 64):
            blk = a[i:i + 64]
            gt = blk[:, None] > blk[None, :]  # gt[i, j] = a[i] > a[j]
            inv += int(np.triu(gt, 1).sum())  # keep i < j pairs
        while len(runs) > 1:
            nxt = []
            for k in range(0, len(runs) - 1, 2):
                left, right = runs[k], runs[k + 1]
                inv += int(len(left) * len(right)
                           - np.searchsorted(left, right,
                                             side="right").sum())
                nxt.append(np.concatenate([left, right]))
                nxt[-1].sort(kind="stable")
            if len(runs) % 2:
                nxt.append(runs[-1])
            runs = nxt
        return inv

    def tie_pairs(sorted_vals: "np.ndarray") -> int:
        _, counts = np.unique(sorted_vals, return_counts=True)
        return int((counts * (counts - 1) // 2).sum())

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy()
        y = pdf[y_col].to_numpy()
        n = len(x)
        order = np.lexsort((y, x))
        xs, ys = x[order], y[order]
        n0 = n * (n - 1) // 2
        n1 = tie_pairs(xs)
        n2 = tie_pairs(np.sort(y, kind="stable"))
        # joint ties: runs of equal (x, y) in the lexsorted stream
        both = (np.diff(xs) == 0) & (np.diff(ys) == 0)
        runs = np.split(np.arange(n), np.where(~both)[0] + 1)
        n3 = sum(len(r) * (len(r) - 1) // 2 for r in runs)
        swaps = inversions(ys)
        cd = n0 - n1 - n2 + n3 - 2 * swaps
        denom_x, denom_y = n0 - n1, n0 - n2
        tau = (cd / np.sqrt(float(denom_x) * float(denom_y))
               if denom_x > 0 and denom_y > 0 else None)
        return pd.DataFrame({
            group_col: [pdf[group_col].iloc[0]],
            "n": pd.Series([n], dtype="int64"),
            "cd": pd.Series([cd], dtype="int64"),
            # nullable Float64: degenerate groups surface as SQL NULL
            # (a float64 NaN would not hash-match an oracle NULL)
            "tau_b": pd.array([tau], dtype="Float64"),
        })

    schema = (f"{group_col} string, n long, cd long, tau_b double")
    return df.groupBy(group_col).applyInPandas(per_group, schema)


def expected_calibration_error(df: DataFrame, prob_col: str,
                               label_col: str,
                               n_bins: int = 10) -> DataFrame:
    """Expected Calibration Error (Naeini et al. 2015; the headline
    number a reliability diagram summarizes): ECE = sum_b (n_b/N) *
    |mean_p_b - rate_b|. Computed EXACTLY before the one final
    division: the per-bin gap (n_b/N)|mean_p - rate| telescopes to
    |sum_p_b - n_pos_b| / N, where sum_p_b is the 9dp-DECIMAL
    probability sum and n_pos_b an integer — so the whole statistic is
    an exact decimal divided once by N. Also reports MCE (max per-bin
    |gap|, one identical IEEE division per bin then max). One group-by
    to <= n_bins rows; 1-row output."""
    p = F.col(prob_col)
    binned = df.select(
        F.least(F.lit(n_bins - 1), F.floor(p * n_bins))
        .cast("int").alias("bin"),
        F.round(p, 9).cast("decimal(18,9)").alias("p_dec"),
        F.col(label_col).cast("long").alias("y"))
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p_dec").alias("sum_p"),
        F.sum("y").alias("n_pos"))
    gap = F.abs(F.col("sum_p") - F.col("n_pos").cast("decimal(18,9)"))
    return agg.agg(
        F.count(F.lit(1)).cast("int").alias("n_bins_used"),
        F.sum("n").alias("n_total"),
        F.sum(gap).alias("__gapsum"),
        F.max(gap.cast("double") / F.col("n")).alias("mce")
    ).select(
        "n_bins_used", "n_total",
        F.round(F.col("__gapsum").cast("double") / F.col("n_total"), 9)
        .alias("ece"),
        F.round("mce", 9).alias("mce"))


def welch_ttest(df: DataFrame, group_col: str, value_col: str,
                group_a: str, group_b: str) -> DataFrame:
    """Welch's unequal-variance t-test between two groups — the A/B
    significance primitive: t = (m_a - m_b) / sqrt(s_a^2/n_a +
    s_b^2/n_b) with Welch-Satterthwaite degrees of freedom. Moments
    accumulate EXACTLY (values as DECIMAL(18,2); sums and
    sums-of-squares as wide decimals, so partial-aggregation order
    cannot perturb them); every float op afterwards is one fixed IEEE
    expression over those exact moments, mirrored in the twin. One
    aggregation pass, 1-row output."""
    v = F.col(value_col).cast("decimal(18,2)")
    agg = (df.filter(F.col(group_col).isin([group_a, group_b]))
           .groupBy(F.col(group_col).alias("g"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(v).alias("s"),
                F.sum((v * v).cast("decimal(38,4)")).alias("ss")))
    a = agg.filter(F.col("g") == group_a).select(
        F.col("n").alias("na"), F.col("s").alias("sa"),
        F.col("ss").alias("ssa"))
    b = agg.filter(F.col("g") == group_b).select(
        F.col("n").alias("nb"), F.col("s").alias("sb"),
        F.col("ss").alias("ssb"))
    j = a.crossJoin(b)
    ma = F.col("sa").cast("double") / F.col("na")
    mb = F.col("sb").cast("double") / F.col("nb")
    va = ((F.col("ssa").cast("double")
           - F.col("sa").cast("double") * F.col("sa").cast("double")
           / F.col("na")) / (F.col("na") - 1))
    vb = ((F.col("ssb").cast("double")
           - F.col("sb").cast("double") * F.col("sb").cast("double")
           / F.col("nb")) / (F.col("nb") - 1))
    se2a = va / F.col("na")
    se2b = vb / F.col("nb")
    t = (ma - mb) / F.sqrt(se2a + se2b)
    dof = ((se2a + se2b) * (se2a + se2b)
           / (se2a * se2a / (F.col("na") - 1)
              + se2b * se2b / (F.col("nb") - 1)))
    return j.select(
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
        F.round(ma, 9).alias("mean_a"), F.round(mb, 9).alias("mean_b"),
        F.round(t, 9).alias("t_stat"),
        F.round(dof, 9).alias("df_welch"))


def chi2_independence(df: DataFrame, col_a: str,
                      col_b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the are-these-correlated DQ/analysis primitive next to
    the Benford audit: observed cell counts vs E = row_margin *
    col_margin / N, with the per-cell chi-square contribution. One
    aggregation to the |A|x|B| cell table; margins and N are window
    sums over THAT tiny table (never the corpus); E and the term
    derive from exact BIGINT counts through one fixed IEEE expression,
    9dp-rounded. Output: one row per cell of the FULL level grid —
    zero cells included via a cross join of the observed level sets
    (an observed-cells-only chi-square silently halves the statistic
    under perfect dependence, the exact case it must flag)."""
    obs = (df.groupBy(F.col(col_a).alias("a"),
                      F.col(col_b).alias("b"))
           .agg(F.count(F.lit(1)).alias("n_obs")))
    grid = (obs.select("a").distinct()
            .crossJoin(obs.select("b").distinct()))
    cells = (grid.join(obs, ["a", "b"], "left")
             .select("a", "b",
                     F.coalesce("n_obs", F.lit(0)).cast("long")
                     .alias("n_obs")))
    w_a = Window.partitionBy("a")
    w_b = Window.partitionBy("b")
    w_all = Window.partitionBy()
    rm = F.sum("n_obs").over(w_a)
    cm = F.sum("n_obs").over(w_b)
    n = F.sum("n_obs").over(w_all)
    e = (rm * cm).cast("double") / n
    term = (F.col("n_obs") - e) * (F.col("n_obs") - e) / e
    return cells.select(
        "a", "b", "n_obs",
        F.round(e, 9).alias("expected"),
        F.round(term, 9).alias("chi2_term"))


def gini_coefficient(df: DataFrame, value_col: str, key_col: str,
                     n_buckets: int = 16) -> DataFrame:
    """Gini concentration coefficient over a keyed value frame (e.g.
    per-customer revenue): G = (2*sum(r_i*x_i) - (n+1)*sum(x)) /
    (n*sum(x)) with r_i the 1..n rank in ascending value order — the
    inequality/concentration number a revenue or token-distribution
    audit reports. Values enter as integer cents so every aggregate is
    an exact BIGINT; the single closing expression is float.

    The global rank uses the assign_global_ids two-phase prefix-sum,
    adapted to VALUE order: range-bucket by approximate quantile
    boundaries (any contiguous split is CORRECT — balance only affects
    parallelism; boundaries are a bounded n_buckets-value driver
    fetch), rank within buckets in parallel windows, then add the
    prefix-summed bucket offsets (an n_buckets-row driver action).
    A naive row_number() OVER (ORDER BY value) would funnel the corpus
    through one task; ties are safe in either plan because tied values
    contribute the same x at any within-tie rank order."""
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    base = df.select(F.col(key_col).alias("__k"),
                     cents.alias("__v"))
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = base.stat.approxQuantile("__v", probs, 0.001)
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col("__v") > int(b), 1).otherwise(0)
    bk = base.withColumn("__b", bucket.cast("int"))

    counts = {r["__b"]: r["n"] for r in
              bk.groupBy("__b").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    offsets, acc = [], 0
    for s in range(n_buckets):
        offsets.append((s, acc))
        acc += counts.get(s, 0)
    off = literal_df(df.sparkSession, offsets, "__b int, __off long")

    rank = F.row_number().over(
        Window.partitionBy("__b").orderBy("__v", "__k"))
    ranked = (bk.join(F.broadcast(off), on="__b")
              .select("__v", (F.col("__off") + rank).alias("__r")))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__v").alias("sx"),
        F.sum(F.col("__r") * F.col("__v")).alias("srx"))
    g = ((2.0 * F.col("srx").cast("double")
          - (F.col("n") + 1).cast("double") * F.col("sx"))
         / (F.col("n").cast("double") * F.col("sx")))
    return agg.select("n", F.col("sx").alias("total_cents"),
                      F.round(g, 9).alias("gini"))


def ks_two_sample(df: DataFrame, group_col: str, value_col: str,
                  label_a, label_b, n_buckets: int = 16) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D statistic: the max vertical gap
    between the two empirical CDFs — the standard distribution-shift
    test between two cohorts (train vs eval split, this week vs last).

    Exactness: values enter as integer cents; rows first collapse to
    the DISTINCT-value table (v, ca, cb), so every downstream step runs
    over distinct values, not raw rows. The gap at each value is the
    exact BIGINT |cum_a*n_b - cum_b*n_a| (cross-multiplied to avoid
    float CDFs); only the final max/(n_a*n_b) division is IEEE, so
    partial-agg order cannot perturb the statistic.

    Scale posture: the cumulative counts use the same two-phase
    range-bucket prefix-sum as gini_coefficient — per-bucket windows in
    parallel plus an n_buckets-row broadcast of bucket offsets — never
    a single-task global ORDER BY window. The (n_a, n_b) totals ride a
    1-row broadcast cross join.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    g = (df.filter(F.col(group_col).isin([label_a, label_b]))
         .select(cents.alias("__v"),
                 F.when(F.col(group_col) == label_a, F.lit(1))
                  .otherwise(F.lit(0)).alias("__ia"),
                 F.when(F.col(group_col) == label_b, F.lit(1))
                  .otherwise(F.lit(0)).alias("__ib")))
    dv = g.groupBy("__v").agg(F.sum("__ia").alias("__ca"),
                              F.sum("__ib").alias("__cb"))

    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = dv.stat.approxQuantile("__v", probs, 0.001)
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col("__v") > int(b), 1).otherwise(0)
    bk = dv.withColumn("__b", bucket.cast("int"))

    sums = {r["__b"]: (r["sa"], r["sb"]) for r in
            bk.groupBy("__b").agg(F.sum("__ca").alias("sa"),
                                  F.sum("__cb").alias("sb")).collect()}
    offsets, acc_a, acc_b = [], 0, 0
    for s in range(n_buckets):
        offsets.append((s, acc_a, acc_b))
        sa, sb = sums.get(s, (0, 0))
        acc_a += int(sa)
        acc_b += int(sb)
    off = literal_df(df.sparkSession, offsets,
                     "__b int, __offa long, __offb long")

    w = (Window.partitionBy("__b").orderBy("__v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (bk.join(F.broadcast(off), on="__b")
           .select((F.col("__offa") + F.sum("__ca").over(w))
                   .alias("__cca"),
                   (F.col("__offb") + F.sum("__cb").over(w))
                   .alias("__ccb")))
    totals = dv.agg(F.sum("__ca").alias("n_a"),
                    F.sum("__cb").alias("n_b"))
    gap = (cum.crossJoin(F.broadcast(totals))
           .select("n_a", "n_b",
                   F.abs(F.col("__cca") * F.col("n_b")
                         - F.col("__ccb") * F.col("n_a")).alias("__g")))
    agg = gap.groupBy("n_a", "n_b").agg(F.max("__g").alias("__d"))
    d = (F.col("__d").cast("double")
         / (F.col("n_a").cast("double") * F.col("n_b")))
    return agg.select(F.col("n_a").cast("long").alias("n_a"),
                      F.col("n_b").cast("long").alias("n_b"),
                      F.round(d, 9).alias("d_stat"))


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information I(A;B) in nats between two categorical
    columns — the feature-selection / leakage-detection companion to
    chi2_independence (chi2 tests *whether* dependence exists; MI
    measures *how much*).

    One aggregation to the (a, b) cell table, margins via window sums
    over that tiny table, then per-cell terms
    p_ij * ln(p_ij / (p_i p_j)) = (n_ij/n) * ln(n_ij*n / (n_i*n_j)).
    The ln argument is a ratio of exact BIGINTs; each term is rounded
    to 15 decimals and summed as exact DECIMAL — the repo's
    decimal-rounded-ln-terms pattern (text_bigram_logprob), so the
    cross-cell summation order cannot perturb the total.
    """
    cells = (df.groupBy(F.col(col_a).alias("__a"),
                        F.col(col_b).alias("__b"))
             .agg(F.count(F.lit(1)).alias("__nij")))
    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    wn = Window.partitionBy()
    m = (cells
         .withColumn("__ni", F.sum("__nij").over(wa))
         .withColumn("__nj", F.sum("__nij").over(wb))
         .withColumn("__n", F.sum("__nij").over(wn)))
    term = (F.col("__nij").cast("double") / F.col("__n")
            * F.log(F.col("__nij").cast("double") * F.col("__n")
                    / (F.col("__ni").cast("double") * F.col("__nj"))))
    return (m.select(F.round(term, 15).cast("decimal(38,15)")
                     .alias("__t"),
                     F.col("__n").alias("__n"))
            .groupBy("__n")
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum("__t").alias("__mi"))
            .select(F.col("__n").cast("long").alias("n_rows"),
                    F.col("n_cells").cast("long").alias("n_cells"),
                    F.round(F.col("__mi").cast("double"), 9)
                    .alias("mi_nats")))


def two_proportion_ztest(df: DataFrame, group_col: str, success,
                         label_a, label_b) -> DataFrame:
    """Two-proportion z-test (pooled variance): the A/B-test readout
    for conversion-style metrics. ``success`` is a boolean Column
    evaluated per row. Counts are one aggregation; p1, p2, the pooled
    p and z ride one fixed IEEE expression over the exact BIGINTs, so
    the statistic is bit-stable across engines and partitionings.
    """
    g = (df.filter(F.col(group_col).isin([label_a, label_b]))
         .select(F.col(group_col).alias("__g"),
                 F.when(success, 1).otherwise(0).alias("__s")))
    agg = g.groupBy().agg(
        F.sum(F.when(F.col("__g") == label_a, 1).otherwise(0))
        .alias("n_a"),
        F.sum(F.when(F.col("__g") == label_a, F.col("__s"))
              .otherwise(0)).alias("s_a"),
        F.sum(F.when(F.col("__g") == label_b, 1).otherwise(0))
        .alias("n_b"),
        F.sum(F.when(F.col("__g") == label_b, F.col("__s"))
              .otherwise(0)).alias("s_b"))
    na, sa = F.col("n_a").cast("double"), F.col("s_a").cast("double")
    nb, sb = F.col("n_b").cast("double"), F.col("s_b").cast("double")
    p1, p2 = sa / na, sb / nb
    pp = (sa + sb) / (na + nb)
    z = (p1 - p2) / F.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("s_a").cast("long").alias("s_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("s_b").cast("long").alias("s_b"),
        F.round(p1, 9).alias("rate_a"), F.round(p2, 9).alias("rate_b"),
        F.round(z, 9).alias("z_stat"))


def pareto_concentration(df: DataFrame, key_col: str, value_col: str,
                         share_pct: int = 80,
                         n_buckets: int = 16) -> DataFrame:
    """Pareto / 80-20 concentration over a keyed value frame: the
    smallest number of keys whose descending-value prefix covers
    ``share_pct`` percent of the total — plus the share held by the
    top decile of keys. The concentration readout next to
    gini_coefficient's single index.

    Same two-phase scaffolding as the gini ranks, in DESCENDING value
    order: range-bucket by approximate quantiles (correct for any
    split — balance only affects parallelism), per-bucket windows for
    the running sum and rank, bucket offsets (rows + value sums)
    broadcast back. The threshold test is multiplied through to exact
    integers (100 * cum >= share_pct * total), so the cut row is
    bit-deterministic; only the reported top-decile share divides.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    base = df.select(F.col(key_col).alias("__k"), cents.alias("__v"))
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = base.stat.approxQuantile("__v", probs, 0.001)
    bucket = F.lit(0)
    for b in bounds:
        # descending order: bucket 0 holds the LARGEST values
        bucket = bucket + F.when(F.col("__v") <= int(b), 1).otherwise(0)
    bk = base.withColumn("__b", bucket.cast("int"))

    sums = {r["__b"]: (r["n"], int(r["s"])) for r in
            bk.groupBy("__b").agg(F.count(F.lit(1)).alias("n"),
                                  F.sum("__v").alias("s")).collect()}
    offsets, acc_n, acc_s = [], 0, 0
    for s in range(n_buckets):
        offsets.append((s, acc_n, acc_s))
        n, sv = sums.get(s, (0, 0))
        acc_n += int(n)
        acc_s += sv
    off = literal_df(df.sparkSession, offsets,
                     "__b int, __offn long, __offs long")
    total_n, total_s = acc_n, acc_s

    w = (Window.partitionBy("__b")
         .orderBy(F.col("__v").desc(), "__k")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = (bk.join(F.broadcast(off), "__b")
              .select((F.col("__offn") + F.count(F.lit(1)).over(w))
                      .alias("__r"),
                      (F.col("__offs") + F.sum("__v").over(w))
                      .alias("__cum")))
    k80 = (ranked
           .filter(100 * F.col("__cum") >= share_pct * F.lit(total_s))
           .agg(F.min("__r").alias("k_for_share")))
    decile_n = max(1, total_n // 10)
    top_dec = (ranked.filter(F.col("__r") <= decile_n)
               .agg(F.max("__cum").alias("__dec_s")))
    return (k80.crossJoin(F.broadcast(top_dec))
            .select(F.lit(total_n).cast("long").alias("n_keys"),
                    F.lit(total_s).cast("long").alias("total_cents"),
                    F.col("k_for_share").cast("long")
                    .alias("k_for_share"),
                    F.round(F.col("__dec_s").cast("double")
                            / F.lit(float(total_s)), 9)
                    .alias("top_decile_share")))


def quantile_normalize(df: DataFrame, group_col: str, value_col: str,
                       id_col: str, n_buckets: int = 16) -> DataFrame:
    """Quantile normalization: remap each group's values onto the
    POOLED distribution (each row's within-group quantile position is
    looked up in the pooled ranked values) — the batch-effect
    correction that makes per-source score distributions comparable
    before mixing corpora or fusing quality models.

    All-integer plan: within-group rank r (per-group window, ties
    broken by id), target pooled rank = ceil(r * N / n_g) computed as
    (r*N + n_g - 1) div n_g, and the pooled (rank -> value) table
    built with the gini two-phase range-bucket prefix-sum (parallel
    per-bucket windows + bucket-offset broadcast — never one global
    window task). The final lookup is an EQUI join on the computed
    rank. Tied pooled values make value(rank) well-defined under any
    tie order; per-group summaries of the normalized cents are exact
    BIGINTs.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    base = df.select(F.col(group_col).alias("__g"),
                     F.col(id_col).alias("__id"),
                     cents.alias("__v"))
    sizes = base.groupBy("__g").agg(F.count(F.lit(1)).alias("__ng"))
    tot = base.agg(F.count(F.lit(1)).alias("__n"))
    wg = Window.partitionBy("__g").orderBy("__v", "__id")
    ranked_in = (base.withColumn("__r", F.row_number().over(wg))
                 .join(F.broadcast(sizes), "__g")
                 .crossJoin(F.broadcast(tot))
                 .withColumn("__tr",
                             F.expr("(__r * __n + __ng - 1) div __ng")))

    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = base.stat.approxQuantile("__v", probs, 0.001)
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col("__v") > int(b), 1).otherwise(0)
    bk = base.withColumn("__b", bucket.cast("int"))
    counts = {r["__b"]: r["n"] for r in
              bk.groupBy("__b").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    offsets, acc = [], 0
    for s in range(n_buckets):
        offsets.append((s, acc))
        acc += counts.get(s, 0)
    off = literal_df(df.sparkSession, offsets, "__b int, __off long")
    wp = Window.partitionBy("__b").orderBy("__v", "__g", "__id")
    pool = (bk.join(F.broadcast(off), "__b")
            .select((F.col("__off") + F.row_number().over(wp))
                    .alias("__tr"),
                    F.col("__v").alias("__nv")))

    out = ranked_in.join(pool, "__tr")
    return (out.groupBy("__g")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("__nv").alias("min_norm_cents"),
                 F.max("__nv").alias("max_norm_cents"),
                 F.sum("__nv").alias("sum_norm_cents"))
            .select(F.col("__g").alias(group_col),
                    F.col("n").cast("long").alias("n"),
                    F.col("min_norm_cents").cast("long")
                    .alias("min_norm_cents"),
                    F.col("max_norm_cents").cast("long")
                    .alias("max_norm_cents"),
                    F.col("sum_norm_cents").cast("long")
                    .alias("sum_norm_cents")))
