"""Mergeable frequency sketches (north-star extension): Misra-Gries
heavy hitters as a distributed, partition-parallel summary.

The reference engine has no sketch surface (its only aggregation is the
per-key integer mean, src/HadoopInterface.java's test workload); this
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
