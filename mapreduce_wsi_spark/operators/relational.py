"""Relational operator recipes beyond single DataFrame calls.

The reference has no native joins/windows/set-ops — those categories are
expressible only inside user map/reduce code (SURVEY.md §2C, the
MapReduceWSI.java:62-105 escape hatch). Here they are first-class, as thin
Catalyst-friendly compositions. Everything is declarative DataFrame API so
predicate pushdown / join selection / AQE apply untouched.

Scale notes are attached per recipe — each one is written for the
1000-executor / 100 TB case first, and merely also works on local[32].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k. Catalyst plans TakeOrderedAndProject: each task keeps a
    k-sized heap, driver merges — no global sort, no full shuffle. Safe at
    any scale for small k."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(df: DataFrame, partition_by: list[str],
                    order_by: list[Column], k: int,
                    rank_col: str = "rn", keep_rank: bool = False) -> DataFrame:
    """Top-k per group via row_number window. One shuffle on the partition
    keys; with AQE skew handling for hot groups. ``order_by`` must be a
    total order (include a unique tiebreaker) for deterministic output."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def _asof_tolerance(df: DataFrame, left_ts: str, right_ts: str,
                    right_values: list[str], suffix: str,
                    tolerance_seconds: float | None) -> DataFrame:
    """Null out an as-of match whose |left_ts - matched_ts| exceeds the
    tolerance — the sensor-join guard (a reading from last week is not
    "the" reading). Pure post-projection on the carried columns: the
    window/carry plan is unchanged, the bound costs nothing at scale.
    Timestamps compare as double epoch seconds (microsecond-exact in
    IEEE range), numerics as their own doubles."""
    if tolerance_seconds is None:
        return df
    within = (F.abs(F.col(left_ts).cast("double")
                    - F.col(f"{right_ts}{suffix}").cast("double"))
              <= F.lit(float(tolerance_seconds)))
    out = df
    for c in [right_ts, *right_values]:
        out = out.withColumn(f"{c}{suffix}",
                             F.when(within, F.col(f"{c}{suffix}")))
    return out


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str,
              right_values: list[str],
              suffix: str = "_asof",
              direction: str = "backward",
              tolerance_seconds: float | None = None) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right_ts <= left_ts`` per key (``direction='backward'``), the
    earliest right row with ``right_ts >= left_ts`` (``'forward'``), or
    the closer of the two (``'nearest'``, |dt| ties to backward).
    Spark has no native as-of join (SURVEY.md §2C); the scalable
    composition is the union + carried-value window trick:

      union both sides tagged → window per key ordered by (ts, tag) →
      ``last``/``first(right_value, ignorenulls=True)`` carried across →
      keep left rows.

    One shuffle on ``on`` (same as any join), no per-key pandas, no range
    explosion — this survives 100 TB where a naive theta-join
    (``l.key = r.key AND r.ts <= l.ts`` + max) would blow up the join
    output before aggregating it back down.

    Ties (right_ts == left_ts) match in both directions (the tag ordering
    places the tied right row inside the carrying frame).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}")
    lcols = left.columns
    pay_src = [right_ts, *right_values]
    l_tagged = left.select(
        *lcols, F.lit(1).alias("__tag"), F.col(left_ts).alias("__ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in pay_src])
    r_tagged = right.select(
        *[F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols],
        F.lit(0).alias("__tag"), F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in pay_src])
    unioned = l_tagged.unionByName(r_tagged)
    if direction == "nearest":
        # Both carried frames over ONE ordering (ts asc, tag asc), so the
        # plan pays a single Exchange + Sort: backward = last non-null in
        # (unbounded, current]; forward = first non-null in [current,
        # unbounded) — a tied right row (right_ts == left_ts) sorts
        # BEFORE the left row, landing it in the backward frame only,
        # which also implements the tie rule (|dt| equal -> backward
        # wins). Per carried column the closer side is chosen by
        # comparing the two deltas; works for numeric and timestamp ts
        # alike (interval comparison).
        order = (Window.partitionBy(*on)
                 .orderBy(F.col("__ts").asc(), F.col("__tag").asc()))
        wb = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wf = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        back = {c: F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(wb)
                for c in pay_src}
        fwd = {c: F.first(F.col(f"{c}{suffix}"), ignorenulls=True).over(wf)
               for c in pay_src}
        b_ts, f_ts = back[right_ts], fwd[right_ts]
        pick_back = f_ts.isNull() | (
            b_ts.isNotNull()
            & ((F.col("__ts") - b_ts) <= (f_ts - F.col("__ts"))))
        carried = [F.when(pick_back, back[c]).otherwise(fwd[c])
                   .alias(f"{c}{suffix}") for c in pay_src]
        out_cols = ([c for c in lcols] + [f"{right_ts}{suffix}"]
                    + [f"{c}{suffix}" for c in right_values])
        return _asof_tolerance(
            unioned.select(*lcols, F.col("__tag"), *carried)
            .filter(F.col("__tag") == 1).select(*out_cols),
            left_ts, right_ts, right_values, suffix, tolerance_seconds)
    if direction == "backward":
        w = (Window.partitionBy(*on)
             .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carry = F.last
    else:  # forward: tag desc puts the tied right row after the left row,
        # inside the (currentRow, following) frame
        w = (Window.partitionBy(*on)
             .orderBy(F.col("__ts").asc(), F.col("__tag").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        carry = F.first
    carried = [carry(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
               for c in [right_ts, *right_values]]
    out_cols = [c for c in lcols] + [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in right_values]
    return _asof_tolerance(
        unioned.select(*lcols, F.col("__tag"), *carried)
        .filter(F.col("__tag") == 1).select(*out_cols),
        left_ts, right_ts, right_values, suffix, tolerance_seconds)


def interval_join(left: DataFrame, right: DataFrame,
                  left_point: str, right_start: str, right_end: str,
                  bucket_width: float | int,
                  extra_on: list[str] | None = None) -> DataFrame:
    """Point-in-interval join, bucketized so it scales.

    A plain theta join (``start <= p AND p < end``) is a broadcast
    nested-loop at best. Instead: explode each right interval into the
    equi-width buckets it covers, equi-join on bucket (plus optional keys),
    then re-check the exact predicate. Shuffle volume is
    O(rows × intervals_per_bucket) — tunable via ``bucket_width``.
    """
    on = list(extra_on or [])
    lb = left.withColumn("__bucket", F.floor(F.col(left_point) / F.lit(bucket_width)))
    rb = right.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(F.col(right_start) / F.lit(bucket_width)),
                             F.floor(F.col(right_end) / F.lit(bucket_width)))))
    joined = lb.join(rb, on=on + ["__bucket"], how="inner")
    return (joined
            .filter((F.col(right_start) <= F.col(left_point)) &
                    (F.col(left_point) < F.col(right_end)))
            .drop("__bucket"))


def grouping_sets(df: DataFrame, sets: list[list[str]], aggs: list[Column],
                  view_name: str = "__gs_input") -> DataFrame:
    """GROUPING SETS — Catalyst supports it in SQL only; expose it as a
    DataFrame-in/DataFrame-out recipe. Physical plan is a single Expand +
    hash aggregate (one shuffle), not one pass per set.

    Caveat: aggs round-trip through Column -> SQL text, which drops
    countDistinct's DISTINCT flag — pass ``F.expr("count(DISTINCT c)")``
    for distinct aggregates (see time_rollup_multigrain)."""
    spark = df.sparkSession
    df.createOrReplaceTempView(view_name)
    all_cols = sorted({c for s in sets for c in s})
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    agg_sql = ", ".join(a._jc.toString() if hasattr(a, "_jc") else str(a) for a in aggs)
    return spark.sql(
        f"SELECT {', '.join(all_cols)}, {agg_sql} FROM {view_name} "
        f"GROUP BY GROUPING SETS ({sets_sql})")


def unpivot(df: DataFrame, ids: list[str], values: list[str],
            var_name: str = "variable", value_name: str = "value") -> DataFrame:
    """Unpivot/melt (reverse of pivot) — built-in since Spark 3.4."""
    return df.unpivot(ids, values, var_name, value_name)


def salted_join(left: DataFrame, right: DataFrame,
                left_on: str, right_on: str,
                how: str = "inner", salt: int = 16,
                seed: int = 42) -> DataFrame:
    """Skew-mitigating equi-join: spread a hot key across ``salt`` tasks.

    Each left row gets a uniform random salt in ``[0, salt)``; the right
    side is replicated once per salt value, and the join key becomes
    ``(key, salt)`` — so a key holding 30% of a 100 TB fact table lands on
    ``salt`` reducers instead of one. Cost: the right side shuffles
    ``salt``× its size. Use when the right side is too large to broadcast
    (else ``broadcast()`` already avoids the skewed shuffle) and AQE's
    skew-split (which halves oversized *partitions*, but cannot split one
    giant *key*) is not enough.

    Only left-preserving joins are well-defined under right-side
    replication: inner / left / left_semi / left_anti.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports left-preserving joins only, got {how!r} "
            "(an unmatched right row would surface once per salt replica)")
    sc = "_salt"
    l = left.withColumn(sc, (F.rand(seed) * salt).cast("int"))
    r = right.withColumn(
        sc, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")))
    cond = (l[left_on] == r[right_on]) & (l[sc] == r[sc])
    out = l.join(r, cond, how)
    if how in ("left_semi", "left_anti"):
        return out.drop(sc)
    return out.drop(l[sc]).drop(r[sc])


def upsert(base: DataFrame, updates: DataFrame,
           keys: list[str], null_safe: bool = True) -> DataFrame:
    """MERGE-emulation without a table format: full-outer join on the key,
    update columns win where present, base rows survive otherwise, new
    keys are appended. (A lakehouse MERGE INTO does this transactionally;
    the relational algebra is identical. Caveat: an update cannot set a
    column to NULL — coalesce semantics — which is the standard
    upsert-by-join limitation.)

    One shuffle on the key for each side; at 100 TB both sides should be
    bucketed on the key (save_bucketed) so the join is exchange-free.
    ``null_safe=True`` (default) matches NULL keys to each other via
    ``<=>`` — but Catalyst does not treat ``<=>`` as a clustering key, so
    it re-shuffles even bucketed tables. When keys are non-nullable (the
    normal case) pass ``null_safe=False``: plain equality, and the
    bucketed merge plans with zero Exchange
    (tests/test_scale_ops.py::test_upsert_on_bucketed_tables_is_shuffle_free).
    """
    non_keys = [c for c in base.columns if c not in keys]
    # string-qualified refs: base/updates often share lineage (same scan),
    # where DataFrame-object column refs are ambiguous
    b, u = base.alias("__ups_b"), updates.alias("__ups_u")

    def bc(c): return F.col(f"__ups_b.{c}")
    def uc(c): return F.col(f"__ups_u.{c}")

    def keq(k):
        return (bc(k).eqNullSafe(uc(k)) if null_safe
                else bc(k) == uc(k))

    cond = keq(keys[0])
    for k in keys[1:]:
        cond = cond & keq(k)
    joined = b.join(u, cond, "full_outer")
    out = [F.coalesce(uc(k), bc(k)).alias(k) for k in keys]
    out += [F.coalesce(uc(c), bc(c)).alias(c) if c in updates.columns
            else bc(c).alias(c) for c in non_keys]
    return joined.select(*out)


def constraint_violations(df: DataFrame,
                          rules: list[tuple[str, Column]],
                          unique_keys: list[list[str]] | None = None
                          ) -> DataFrame:
    """Data-quality gate: per-rule violation counts in ONE scan.

    ``rules``: (name, predicate-that-must-hold) pairs — all folded into a
    single global aggregate (sum of failures per rule), so checking 20
    constraints on 100 TB costs one pass, not 20. ``unique_keys``: key
    sets that must be unique; each costs one distinct-count aggregate
    (count - countDistinct = duplicate rows). Returns (rule,
    n_violations) — empty counts stay present so downstream gates can
    assert on every rule by name.
    """
    aggs = [F.sum(F.when(~cond, 1).otherwise(0)).cast("long").alias(name)
            for name, cond in rules]
    row = df.agg(*aggs)
    spark = df.sparkSession
    parts = [row.selectExpr(f"'{name}' AS rule", f"`{name}` AS n_violations")
             for name, _ in rules]
    for keys in unique_keys or []:
        kname = "unique_" + "_".join(keys)
        dup = df.agg(
            (F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys]))
            .cast("long").alias("n"))
        parts.append(dup.selectExpr(f"'{kname}' AS rule",
                                    "n AS n_violations"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def bloom_prune_join(big: DataFrame, small: DataFrame, big_key: str,
                     small_key: str, m_bits: int = 4096,
                     k_hashes: int = 2) -> DataFrame:
    """Explicit Bloom-filter semi-join reduction: build a ``m_bits``-bit
    filter over the small side's DISTINCT keys (``k_hashes`` md5-window
    hashes per key, the engine-portable `_md5_bucket` convention), pack
    it into 64-bit words with a ``bit_or`` aggregate, pivot the <=
    m_bits/64 words into ONE map row, and broadcast that row so the big
    side tests membership MAP-SIDE — rows that cannot join never reach
    the shuffle. Returns the pruned big frame (false positives possible
    at the Bloom's rate, false negatives impossible — the caller's real
    join removes the former and the filter never drops the latter).

    Scale shape: this is the semi-join runtime filter Spark's own
    `spark.sql.optimizer.runtime.bloomFilter` injects, surfaced as a
    composable operator so pipelines can prune BEFORE an expensive
    downstream stage (decode, shuffle, UDF) rather than only inside one
    join. The filter costs one pass over the small side's distinct keys
    and a fixed m_bits/8-byte broadcast (512 B at the default) no
    matter how large the big side is; the probe is whole-stage-codegen
    arithmetic on each big row. With |small| distinct keys n, the false
    positive rate is ~(1 - e^(-k*n/m))^k; size m_bits ~ 10 bits/key for
    ~1% FP.
    """
    from mapreduce_wsi_spark.operators.evaluation import _md5_bucket

    assert m_bits % 64 == 0
    keys = small.select(
        F.col(small_key).cast("string").alias("__bf_k")).distinct()
    pos = keys.select(F.explode(F.array(
        *[_md5_bucket(F.col("__bf_k"), s, m_bits)
          for s in range(k_hashes)])).alias("pos"))
    words = pos.groupBy(F.expr("pos DIV 64").cast("int").alias("word")) \
        .agg(F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"))
            .alias("bits"))
    bloom = words.agg(F.map_from_entries(
        F.collect_list(F.struct("word", "bits"))).alias("__bf_map"))

    probed = big.crossJoin(F.broadcast(bloom))
    tmp = []
    for s in range(k_hashes):
        c = f"__bf_p{s}"
        tmp.append(c)
        probed = probed.withColumn(
            c, _md5_bucket(F.col(big_key), s, m_bits))
    cond = " AND ".join(
        f"(coalesce(try_element_at(__bf_map, CAST({c} DIV 64 AS INT)), "
        f"CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), "
        f"CAST({c} % 64 AS INT))) != 0"
        for c in tmp)
    return probed.filter(F.expr(cond)).drop("__bf_map", *tmp)


def skyline_2d(df: DataFrame, min_col: str, max_col: str,
               id_col: str) -> DataFrame:
    """2D skyline / Pareto front: rows not STRICTLY dominated by any
    other (q dominates p iff q.min_col <= p.min_col AND q.max_col >=
    p.max_col with at least one strict inequality). Classic two-phase
    distributed plan:

    phase 1 — batch-local skyline in one Arrow mapInPandas pass (numpy
    sort + running max). Correct as a prefilter by domination
    transitivity: if a dropped row dominated p, the batch survivor
    that dominated IT still dominates p, so the union of local
    skylines is a superset of the global one. The corpus is never
    shuffled; typical survivor counts are tiny (O(sqrt n) for
    independent dims).
    phase 2 — exact sweep over the survivors: order by (min_col asc,
    max_col desc, id), keep rows beating the running max of max_col
    over STRICTLY smaller min_col (range frame) and not beaten
    strictly within their own min_col group. One global window over
    the bounded survivor set only — the full corpus never sees a
    single-partition sort. Worst case (data forming one huge
    anti-chain) every row IS skyline and phase 2 degrades to the
    output size — inherent to the problem, not the plan.

    ``min_col`` must be integer-typed (scale prices to cents first):
    the strictly-smaller frame is RANGE .. 1 PRECEDING."""
    import numpy as np

    out_schema = df.select(id_col, min_col, max_col).schema

    def local_skyline(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            order = np.lexsort(
                (-pdf[max_col].to_numpy(), pdf[min_col].to_numpy()))
            mn = pdf[min_col].to_numpy()[order]
            mx = pdf[max_col].to_numpy()[order]
            keep = np.zeros(len(order), dtype=bool)
            best = -np.inf  # running max of max_col
            best_mn = None
            for i in range(len(order)):
                # sorted by (mn asc, mx desc): dominated iff an earlier
                # row has mx >= ours with a strict edge somewhere
                if mx[i] > best or (mx[i] == best and mn[i] == best_mn):
                    keep[i] = True
                    if mx[i] > best:
                        best, best_mn = mx[i], mn[i]
            yield pdf.iloc[order[keep]]

    survivors = (df.select(id_col, min_col, max_col)
                 .mapInPandas(local_skyline, out_schema))

    w_lt = (Window.orderBy(F.col(min_col).cast("long"))
            .rangeBetween(Window.unboundedPreceding, -1))
    w_grp = Window.partitionBy(min_col)
    cummax_lt = F.max(max_col).over(w_lt)
    grp_max = F.max(max_col).over(w_grp)
    return (survivors
            .withColumn("__lt", cummax_lt)
            .withColumn("__gm", grp_max)
            .filter((F.col("__lt").isNull()
                     | (F.col(max_col) > F.col("__lt")))
                    & (F.col(max_col) == F.col("__gm")))
            .drop("__lt", "__gm"))


def join_size_preflight(left: DataFrame, right: DataFrame,
                        left_key: str, right_key: str) -> DataFrame:
    """EXACT output-size forecast for an equi-join, computed without
    running it: |A join B| = sum_k cA(k) * cB(k) over the per-key
    count tables — the planner pre-flight that catches a key-explosion
    join (the classic many-to-many accident) BEFORE it materializes
    100 TB of output. Also reports the worst single key (the row the
    skew/salting decision reads) and both distinct-key counts.

    Cost: two partial-aggregated groupBys + one join on the (much
    smaller) key tables + a 1-row summary — orders of magnitude
    cheaper than the join it predicts. The max-key row rides the same
    aggregation (argmax via struct max), no extra pass.
    """
    ca = left.groupBy(F.col(left_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__ca"))
    cb = right.groupBy(F.col(right_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__cb"))
    prod = (ca.join(cb, "__k")
            .select("__k", (F.col("__ca") * F.col("__cb")).alias("__p")))
    tot_a = ca.agg(F.count(F.lit(1)).alias("n_keys_left"))
    tot_b = cb.agg(F.count(F.lit(1)).alias("n_keys_right"))
    est = prod.agg(
        F.count(F.lit(1)).alias("n_keys_matched"),
        F.sum("__p").alias("join_rows"),
        F.max(F.struct(F.col("__p"), F.col("__k"))).alias("__mx"))
    return (est.crossJoin(F.broadcast(tot_a))
            .crossJoin(F.broadcast(tot_b))
            .select("n_keys_left", "n_keys_right", "n_keys_matched",
                    F.col("join_rows").cast("long").alias("join_rows"),
                    F.col("__mx.__k").cast("long").alias("heaviest_key"),
                    F.col("__mx.__p").cast("long")
                    .alias("heaviest_key_rows")))
