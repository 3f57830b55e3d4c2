"""Mergeable frequency sketches (north-star extension): Misra-Gries
heavy hitters as a distributed, partition-parallel summary.

The reference engine has no sketch surface (its only aggregation is the
per-key integer mean, test/.../mapreduce/TestReducer.java's workload); this
module adds the standard streaming-frequency summary a 100 TB token
pipeline needs: per-partition O(k) state, k rows shuffled per partition
instead of one row per token occurrence, and a provable error bound.

Guarantees (Misra-Gries with k counters; Agarwal et al., "Mergeable
Summaries", PODS 2012):
  * est(t) <= true(t)                            (never overcounts)
  * est(t) >= true(t) - n/(k+1)                  (n = total token count)
  * any t with true(t) > n/(k+1) is in the sketch (follows from the two)
and the bound survives arbitrary merge trees — which is exactly why the
partition-sketch -> sum -> subtract-(k+1)th-largest plan below is valid.

Implementation notes: the per-partition pass is Arrow-batched
(mapInPandas) and vectorized — each batch is reduced with C-speed
``value_counts`` and folded into the running sketch by the MERGE rule
(sum counters, subtract the (k+1)th largest, keep positives), not by the
textbook one-token-at-a-time decrement loop. Both are valid MG summaries
with the same bound; the batch-merge form does O(distinct) work per batch
instead of O(tokens) Python-loop steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_fold(counters: dict, batch_counts: dict, k: int) -> dict:
    """One MG merge step: combined counts, minus the (k+1)th largest,
    positives only (at most k survive — everything ranked below the
    (k+1)th largest value ends <= 0)."""
    for t, c in batch_counts.items():
        counters[t] = counters.get(t, 0) + int(c)
    if len(counters) <= k:
        return counters
    d = sorted(counters.values(), reverse=True)[k]
    return {t: c - d for t, c in counters.items() if c - d > 0}


def misra_gries_heavy_hitters(tokens: DataFrame, token_col: str,
                              k: int = 16) -> DataFrame:
    """Distributed Misra-Gries: ``tokens`` is one row per token
    occurrence; returns at most ``k`` rows ``(token, est)``.

    Plan shape at 100 TB: the token stream never shuffles — each input
    partition reduces to <= k rows in a single Arrow pass, the global
    combine moves <= k x n_partitions rows through one hash aggregation,
    and the final subtract step runs on <= k x n_partitions rows against
    a broadcast 1-row threshold. Driver never sees raw tokens.
    """
    import pandas as pd

    col = token_col

    def sketch_partition(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            counters = _mg_fold(counters, vc.to_dict(), k)
        yield pd.DataFrame({"token": list(counters.keys()),
                            "est": [int(v) for v in counters.values()]})

    parts = tokens.select(F.col(col).alias("token")).mapInPandas(
        sketch_partition, schema="token string, est long")

    combined = parts.groupBy("token").agg(F.sum("est").alias("est"))
    # (k+1)th largest combined estimate, or 0 when <= k tokens survive;
    # deterministic tie-break on token so the limit boundary is stable
    top = combined.orderBy(F.desc("est"), "token").limit(k + 1)
    thresh = top.agg(
        F.when(F.count(F.lit(1)) == k + 1, F.min("est"))
        .otherwise(F.lit(0)).cast("long").alias("__d"))
    return (combined.crossJoin(F.broadcast(thresh))
            .select("token", (F.col("est") - F.col("__d")).alias("est"))
            .filter(F.col("est") > 0))


def kmv_sketch(df: DataFrame, key_col: str, k: int = 128):
    """K-minimum-values (theta-style) distinct sketch: the k smallest
    xxhash64 values of the key, unit-mapped to [0, 1). Returns a 1-row
    DataFrame with a sorted ``sketch`` array (size <= k).

    Plan: distinct on the hash (partial-combine), then k-smallest via
    orderBy+limit — lowers to TakeOrderedAndProject, so each partition
    contributes at most k values and no full sort materializes. The
    sketch is MERGEABLE (k smallest of the concatenation), supports
    union AND — unlike HLL — intersection estimates (Beyer et al.,
    SIGMOD'07): |A ∪ B| ~ (k-1)/rho_k, |A ∩ B| ~ (shared fraction of
    the union sketch) x |A ∪ B|.
    """
    u = ((F.xxhash64(F.col(key_col)).cast("double")
          / F.lit(float(2 ** 64))) + F.lit(0.5)).alias("u")
    return (df.select(u).distinct().orderBy("u").limit(k)
            .agg(F.array_sort(F.collect_list("u")).alias("sketch")))


def kmv_overlap_estimate(sk_a, sk_b, k: int = 128):
    """Estimate |A ∪ B| and |A ∩ B| from two KMV sketches (each a 1-row
    ``sketch`` array frame). Returns one row: (est_union, est_inter).

    Merge = k smallest of the concatenation. When the merged sketch is
    saturated (size == k), rho = its largest value and
    est_union = (k-1)/rho; the intersection scales the union estimate by
    the fraction of merged values present in BOTH input sketches. When
    unsaturated (|A ∪ B| < k) both estimates are EXACT — the sketch has
    seen every distinct hash. All driver-free: three 1-row frames
    cross-joined, array expressions only.
    """
    a = sk_a.select(F.col("sketch").alias("__a"))
    b = sk_b.select(F.col("sketch").alias("__b"))
    merged = F.slice(F.array_sort(F.array_union("__a", "__b")), 1, k)
    both = F.size(F.array_intersect(F.array_intersect(merged, F.col("__a")),
                                    F.col("__b")))
    est_union = F.when(
        F.size(merged) < k, F.size(merged).cast("double")).otherwise(
        F.lit(float(k - 1)) / F.element_at(merged, k))
    est_inter = F.when(
        F.size(merged) < k, both.cast("double")).otherwise(
        both.cast("double") / F.lit(float(k)) * est_union)
    return (a.crossJoin(b)
            .select(est_union.alias("est_union"), est_inter.alias("est_inter")))


def _tdigest_compress(means, weights, delta: float):
    """Single-pass merge of a SORTED centroid stream into a t-digest
    (Dunning & Ertl, 'Computing Extremely Accurate Quantiles Using
    t-Digests'): greedily absorb neighbors while the k1 scale function
    k(q) = delta/(2pi) * asin(2q-1) allows it — centroid capacity
    shrinks toward the tails, which is what buys the sketch its
    relative accuracy exactly where p99s live. Returns (means,
    weights) numpy arrays, <= ~2*delta centroids."""
    import math

    import numpy as np

    total = float(weights.sum())

    def k1(q):
        return delta / (2 * math.pi) * math.asin(
            max(-1.0, min(1.0, 2 * q - 1)))

    out_m, out_w = [], []
    w_before = 0.0
    cur_m, cur_w = float(means[0]), float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        q0 = w_before / total
        q2 = (w_before + cur_w + w) / total
        if k1(q2) - k1(q0) <= 1.0:
            cur_m = (cur_m * cur_w + float(m) * float(w)) \
                / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _tdigest_quantile(means, weights, q: float) -> float:
    """Estimate the q-quantile from a sorted t-digest by linear
    interpolation between centroid midpoints (the standard estimator:
    centroid i covers cumulative weight (W_{<i} + w_i/2))."""
    import numpy as np

    total = float(weights.sum())
    target = q * total
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    j = int(np.searchsorted(cum, target) - 1)
    frac = (target - cum[j]) / (cum[j + 1] - cum[j])
    return float(means[j] + frac * (means[j + 1] - means[j]))


def tdigest_quantiles(df: DataFrame, value_col: str,
                      qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                      delta: float = 200.0) -> DataFrame:
    """Distributed t-digest quantile estimation — THE mergeable
    streaming-quantile sketch serving production p95/p99 dashboards
    (Dunning & Ertl; the same family as percentile_approx's KLL but
    with tail-adaptive accuracy). Two-level build: each input partition
    sorts its values and compresses to <= ~2*delta centroids in one
    Arrow pass (the corpus never shuffles — only centroid rows move);
    the <= 2*delta*n_partitions centroid rows then merge in a single
    final task (sort + one more compression pass) that emits one row
    per requested quantile: (q, est, n_centroids).

    At 100 TB: the sketch column is what you'd persist per
    day/partition and fold with the same merge — this function is the
    one-shot corpus form of that rollup (hll_sketch_rollup is the
    distinct-count analogue)."""
    import pandas as pd

    def sketch_partition(batches):
        import numpy as np

        vals = []
        for pdf in batches:
            v = pdf[value_col].to_numpy(dtype=np.float64)
            if len(v):
                vals.append(v)
        if not vals:
            yield pd.DataFrame({"mean": [], "weight": []})
            return
        v = np.sort(np.concatenate(vals))
        m, w = _tdigest_compress(v, np.ones_like(v), delta)
        yield pd.DataFrame({"mean": m, "weight": w})

    parts = (df.select(F.col(value_col).cast("double").alias(value_col))
             .mapInPandas(sketch_partition,
                          schema="mean double, weight double"))

    def merge_all(batches):
        import numpy as np

        ms, ws = [], []
        for pdf in batches:
            if len(pdf):
                ms.append(pdf["mean"].to_numpy())
                ws.append(pdf["weight"].to_numpy())
        if not ms:
            yield pd.DataFrame({"q": [], "est": [], "n_centroids": []})
            return
        m = np.concatenate(ms)
        w = np.concatenate(ws)
        order = np.argsort(m, kind="stable")
        m, w = _tdigest_compress(m[order], w[order], delta)
        yield pd.DataFrame({
            "q": list(qs),
            "est": [_tdigest_quantile(m, w, q) for q in qs],
            "n_centroids": [int(len(m))] * len(qs),
        })

    return (parts.repartition(1)
            .mapInPandas(merge_all,
                         schema="q double, est double, n_centroids int"))


def bitmap_distinct_rollup(df: DataFrame, grain_col: str,
                           id_col: str) -> DataFrame:
    """EXACT distinct counts via OR-mergeable 64-bit word bitmaps —
    the exact-count sibling of the HLL rollup (hll_sketch_rollup): a
    per-(grain, word) bitmap summary that re-aggregates to any coarser
    grain with plain BIT_OR, never re-touching the raw rows.

    Encoding: word = id div 64, mask = 1 << (id mod 64). Per grain the
    summary is one BIGINT per occupied word — groupBy(grain, word)
    BIT_OR(mask), so partial aggregation combines masks map-side and
    the shuffle moves O(occupied words), not O(rows). The distinct
    count is then sum(bit_count(bits)) per grain, and the ALL-grain
    row below is computed by merging the per-grain word bitmaps
    (BIT_OR again, grouped by word only) — demonstrating the rollup
    property the way a 100 TB daily/weekly/monthly distinct-users
    pipeline uses it: store the word bitmaps once, re-aggregate
    upward for free.

    Scale posture: the shuffle key is (grain, word) — a dense id space
    of N ids occupies N/64 words spread uniformly across partitions,
    so no single reducer holds a grain's whole bitmap. bit_count is a
    JVM intrinsic (two's-complement popcount, exact for bit 63).
    Negative ids would need an offset shift; the ids >= 0 contract is
    asserted in-plan (raise_error on the first negative id) rather
    than trusted: a silent mis-bucket would produce plausible wrong
    counts. The word index uses integer `div` — float division would
    lose bit 53+ of large ids (two ids landing in one word / one id
    splitting across words) exactly where a 100 TB id space lives.
    """
    # The contract check lives INSIDE the word expression (not a
    # separate projected-then-dropped column, which Catalyst would
    # prune away along with the raise_error).
    word = F.expr(
        f"CASE WHEN {id_col} < 0 THEN "
        f"raise_error('bitmap_distinct_rollup: negative id in {id_col}') "
        f"ELSE {id_col} div 64 END").cast("bigint")
    # F.shiftleft only accepts a literal shift; the SQL form takes a
    # column shift amount (still a JVM intrinsic, no Python involved)
    mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                  f"CAST({id_col} % 64 AS INT))")
    words = (df.select(F.col(grain_col).alias("__g"),
                       word.alias("__w"), mask.alias("__m"))
             .groupBy("__g", "__w")
             .agg(F.bit_or("__m").alias("__bits")))
    per_grain = (words.groupBy("__g")
                 .agg(F.sum(F.bit_count("__bits")).alias("n_distinct")))
    merged = (words.groupBy("__w")
              .agg(F.bit_or("__bits").alias("__bits"))
              .agg(F.sum(F.bit_count("__bits")).alias("n_distinct"))
              .select(F.lit("__all__").alias("__g"), "n_distinct"))
    return (per_grain.unionByName(merged)
            .select(F.col("__g").alias(grain_col),
                    F.col("n_distinct").cast("long").alias("n_distinct")))
