"""Lakehouse-style table maintenance: MERGE/upsert, incremental aggregate
maintenance, and Z-order clustering keys.

The reference has no analogue (its tables are write-once HDFS text +
RDBMS append, MapReduceWSIImpl.java:180-210); these are the operations a
user keeping a 100 TB table current actually runs. Design posture:

- ``merge_upsert`` is the copy-on-write MERGE rewrite: the huge target is
  scanned (twice) but NEVER shuffled — the CDC batch rides broadcast hash
  joins on both passes, and the insert branch anti-joins the batch against
  the (small, <=|batch|) matched-key set rather than the target. At 1000
  executors the cost is two table scans + one broadcast, which is the
  floor for copy-on-write semantics.
- ``merge_aggregates`` is incremental-view-maintenance for the mergeable
  aggregate triple (count, sum): refreshing a day's partition touches the
  prior aggregate (small) and the delta (small), never the base table.
- ``zorder_key`` interleaves the bits of two dimension columns so a range
  sort clusters BOTH dimensions, making file-level min/max pruning
  effective for predicates on either column. Pure integer div/mod
  arithmetic (unrolled, whole-stage-codegen-friendly, and portable to the
  DuckDB oracle verbatim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str],
                 delete_col: str | None = None) -> DataFrame:
    """MERGE INTO target USING source ON keys:
    matched & delete -> drop; matched -> take source's row (full-row
    upsert, CDC after-image semantics); unmatched source -> insert.

    ``source`` must carry target's schema (plus ``delete_col``); it is
    assumed small (a CDC batch) and is broadcast — the target side is
    scanned but never shuffled. Returns the merged table.
    """
    data_cols = [c for c in target.columns if c not in keys]
    src_payload = source.select(*keys, *data_cols,
                                *( [delete_col] if delete_col else [] ))

    # Pass 1: target rows not touched by the batch (anti builds the
    # broadcast source side — no exchange on target).
    untouched = target.join(F.broadcast(src_payload.select(*keys)),
                            on=keys, how="left_anti")

    # Pass 2: matched rows -> source after-image, minus deletes.
    matched = (target.select(*keys)
               .join(F.broadcast(src_payload), on=keys, how="inner"))
    if delete_col:
        matched = matched.filter(~F.col(delete_col))
    updated = matched.select(*keys, *data_cols)

    # Inserts: batch keys that matched nothing. The matched-key set is
    # <=|batch| rows, so this anti-join broadcasts it — the target is not
    # re-scanned a third time and nothing large shuffles.
    matched_keys = (target.select(*keys)
                    .join(F.broadcast(src_payload.select(*keys)),
                          on=keys, how="left_semi"))
    inserts = src_payload.join(F.broadcast(matched_keys),
                               on=keys, how="left_anti")
    if delete_col:
        # a delete for a key the target doesn't have is a no-op, not an
        # insert of a tombstone
        inserts = inserts.filter(~F.col(delete_col))
    inserts = inserts.select(*keys, *data_cols)

    return untouched.unionByName(updated).unionByName(inserts)


def merge_aggregates(prev: DataFrame, delta: DataFrame, keys: list[str],
                     count_col: str, sum_cols: list[str]) -> DataFrame:
    """Incremental aggregate maintenance: combine two partial aggregates
    (count + sums are mergeable; averages re-derive from the merged sums)
    without touching the base table. union + re-agg — Spark's partial
    aggregation makes the shuffle O(groups), not O(rows)."""
    merged = (prev.unionByName(delta)
              .groupBy(*keys)
              .agg(F.sum(count_col).alias(count_col),
                   *[F.sum(c).alias(c) for c in sum_cols]))
    return merged


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns
    into a Z-value (Morton code): bit i of x lands at position 2i, bit i
    of y at 2i+1. Unrolled div/mod arithmetic — no bit-op builtins, so the
    identical formula runs in DuckDB for the oracle and stays inside
    whole-stage codegen here."""
    x = x.cast("long") % F.lit(1 << bits)
    y = y.cast("long") % F.lit(1 << bits)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + ((x / F.lit(1 << i)).cast("long") % 2) * F.lit(1 << (2 * i))
        z = z + ((y / F.lit(1 << i)).cast("long") % 2) * F.lit(1 << (2 * i + 1))
    return z


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The DuckDB-portable twin of :func:`zorder_key` — same unrolled
    integer arithmetic, rendered as SQL text."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x_expr}) // {1 << i} % 2) * {1 << (2 * i)}")
        terms.append(f"(({y_expr}) // {1 << i} % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def table_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Keyed table diff: classify every key as added / removed / changed
    (unchanged keys are dropped). The migration-validation companion to
    the order-insensitive table fingerprint — fingerprint says WHETHER
    tables differ, this says WHERE.

    Non-key columns are collapsed to one xxhash64 fingerprint per side
    before the join, so the full-outer join shuffles (keys + 8 bytes) per
    row instead of whole rows — at 100 TB that's the difference between
    shuffling the table and shuffling its key index. If both sides are
    bucketed on the keys the join is exchange-free.
    """
    data_cols = sorted(c for c in old.columns if c not in keys)
    o = old.select(*keys, F.xxhash64(*data_cols).alias("__h_old"))
    n = new.select(*keys, F.xxhash64(*data_cols).alias("__h_new"))
    j = o.join(n, on=keys, how="full_outer")
    change = (F.when(F.col("__h_old").isNull(), F.lit("added"))
              .when(F.col("__h_new").isNull(), F.lit("removed"))
              .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed")))
    return (j.select(*keys, change.alias("change_type"))
            .filter(F.col("change_type").isNotNull()))


# ---------------------------------------------------------------------------
# Snapshot versioning / time travel
# ---------------------------------------------------------------------------

def write_snapshot(df: DataFrame, path: str) -> int:
    """Append a new immutable snapshot of ``df`` under ``path/v=<n>`` and
    return the new version number (1-based).

    The versioned-directory layout is the minimal time-travel scheme:
    every version is a complete, immutable parquet table, so readers of
    v=k never see a concurrent writer (who only creates v=k+1), and
    retention is directory deletion (``vacuum_snapshots``). Version
    discovery walks the directory through Hadoop's FileSystem API, so
    the layout works on any supported filesystem; a production
    object-store deployment would add an atomic commit marker
    (_SUCCESS rename or a manifest swap, the Iceberg/Delta refinement)
    — full-table copy-on-write is the honest baseline the MERGE and
    diff operators here already assume.
    """
    v = latest_snapshot_version(df.sparkSession, path) + 1
    df.write.mode("errorifexists").parquet(f"{path}/v={v}")
    return v


def _fs_versions(spark, path: str) -> list[int]:
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                pass
    return sorted(out)


def latest_snapshot_version(spark, path: str) -> int:
    """Highest committed version at ``path`` (0 when none)."""
    vs = _fs_versions(spark, path)
    return vs[-1] if vs else 0


def read_snapshot(spark, path: str, version: int | None = None) -> DataFrame:
    """Time travel: read the table as of ``version`` (default: latest)."""
    vs = _fs_versions(spark, path)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs} at {path}")
    return spark.read.parquet(f"{path}/v={v}")


def vacuum_snapshots(spark, path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` versions; returns the
    removed version numbers. Readers of retained versions are unaffected
    (snapshots are immutable, never rewritten in place)."""
    vs = _fs_versions(spark, path)
    drop = vs[:-keep_last] if keep_last > 0 else vs
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for v in drop:
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/v={v}")
        p.getFileSystem(conf).delete(p, True)
    return drop


def join_view_delta(a_old: DataFrame, delta_a: DataFrame,
                    b_old: DataFrame, delta_b: DataFrame,
                    on: list[str]) -> DataFrame:
    """Incremental JOIN-view maintenance for append-only sources: the
    delta of V = A JOIN B after appending dA and dB is exactly

        dV  =  dA JOIN (B_old UNION dB)   UNION   A_old JOIN dB

    (dA x dB lands in the first term; nothing is counted twice because
    the second term joins only the OLD A). The maintenance cost is two
    joins whose small side is a DELTA — broadcast here — instead of
    re-running the full A JOIN B: at 100 TB a daily refresh touches
    day-sized deltas plus one pass over each base table, and the base
    view V_old is never rescanned at all (callers append dV to it, the
    merge_aggregates posture applied to joins). Append-only contract:
    updates/deletes need the MERGE path (merge_upsert), not this."""
    b_new = b_old.unionByName(delta_b)
    d1 = b_new.join(F.broadcast(delta_a), on=on)
    d2 = a_old.join(F.broadcast(delta_b), on=on)
    cols = sorted(set(d1.columns) & set(d2.columns))
    return d1.select(*cols).unionByName(d2.select(*cols))


def incremental_new_files(spark, base_path: str,
                          processed_files: list[str]) -> DataFrame:
    """File-level incremental processing: read a growing parquet
    directory but keep only rows from files NOT in the processed
    manifest — the manifest-driven ingest pattern (Auto Loader /
    Iceberg snapshot-diff style) that lets a 100 TB daily pipeline
    touch only the new files instead of rescanning the table.

    The filter is on ``input_file_name()`` — file-path metadata, so
    with parquet it prunes at the scan (whole files skip, no row-level
    work for already-processed files) and the incremental cost is
    O(new data). The manifest is a driver-side list (file PATHS, not
    data — bounded by file count; a production variant keeps it in a
    table and broadcast-joins it).
    """
    df = spark.read.parquet(base_path)
    return df.filter(~F.input_file_name().isin(processed_files))
