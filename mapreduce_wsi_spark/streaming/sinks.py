"""Streaming sinks beyond append-only files: incremental upsert (MERGE)
of a keyed stream into a parquet-backed state table via ``foreachBatch``.

The reference's only egress is append-into-existing-RDBMS-table
(MapReduceWSIImpl.java:282-305); a training-data pipeline also needs the
"current state per key" shape (latest doc version, latest feature row).
``foreachBatch`` + a keyed latest-wins merge gives MERGE without a
lakehouse format, and the merge is *idempotent*: replaying a microbatch
after a crash converges to the same state, so checkpoint restarts are
effectively-once even though the sink itself is not transactional.

At 100 TB the same plan targets a bucketed table (bucketBy on the key) so
each microbatch's full-outer join is exchange-free; the swap-directory
commit below becomes a metastore partition swap / format-level MERGE.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(batch: DataFrame, keys: list[str],
                   order_col: str) -> DataFrame:
    """Collapse a microbatch to one row per key (greatest order_col wins;
    deterministic tie-break on the keys is unnecessary — rows with equal
    order_col and key are duplicates by contract)."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def upsert_parquet_sink(stream_df: DataFrame, keys: list[str],
                        order_col: str, target_dir: str,
                        checkpoint_dir: str):
    """Start a streaming query that MERGEs each microbatch into a parquet
    state table: one row per key, newest ``order_col`` wins across
    batches. Returns the StreamingQuery (caller stops/awaits).

    Merge = union + latest-per-key rather than a blind upsert: a replayed
    (post-crash) or out-of-order microbatch carrying older rows must lose
    to newer state already in the table — last-writer-wins by event order,
    not by arrival order."""

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        b = latest_per_key(batch, keys, order_col)
        if os.path.isdir(target_dir):
            base = spark.read.parquet(target_dir)
            merged = latest_per_key(base.unionByName(b), keys, order_col)
        else:
            merged = b
        tmp = target_dir + f".__tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = target_dir + ".__old"
        if os.path.isdir(target_dir):
            os.rename(target_dir, old)
        os.rename(tmp, target_dir)
        shutil.rmtree(old, ignore_errors=True)

    return (stream_df.writeStream
            .foreachBatch(handle_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start())
