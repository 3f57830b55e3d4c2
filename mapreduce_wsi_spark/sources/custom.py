"""Custom connector surface: a Python DataSource (Spark 4 extension API).

The reference's only extension point for new sources is "write a MapReduce
job that reads it" (MapReduceWSI.java:62-79); Spark's DataSource API makes
a connector a first-class, partition-parallel scan that Catalyst treats
like any other relation. This module ships a deterministic synthetic
documents generator — the pattern (plan partitions driver-side, generate/
fetch rows executor-side per partition) is exactly how a real connector to
an internal API or storage system slots in at 100 TB: N partitions scan in
parallel, no driver bottleneck.

Register per-session with ``register_synth_docs(spark)``; then
``spark.read.format("synthdocs").option("rows", 1000).load()``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


_WORDS = ("data spark engine shuffle join scan filter window stream "
          "batch token model corpus sample split train").split()


def _doc_text(i: int) -> str:
    # deterministic pseudo-text: md5-driven word choice, length 5..20
    h = hashlib.md5(str(i).encode()).digest()
    n = 5 + h[0] % 16
    return " ".join(_WORDS[h[j % 16] % len(_WORDS)] for j in range(1, n + 1))


class SynthDocsDataSource(DataSource):
    """``format("synthdocs")``: options ``rows`` (total) and
    ``partitions`` (parallel generators)."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_words int"

    def reader(self, schema) -> "SynthDocsReader":
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "SynthDocsStreamReader":
        return SynthDocsStreamReader(self.options)


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        # driver plans ranges only — no data materializes driver-side
        step = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
        return [_RangePartition(s, min(s + step, self.n_rows))
                for s in range(0, self.n_rows, step)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            text = _doc_text(i)
            yield (i, text, text.count(" ") + 1)


def register_synth_docs(spark) -> None:
    spark.dataSource.register(SynthDocsDataSource)


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming variant: each microbatch emits the next
    ``batch_rows`` documents; the offset is just the row index, so replay
    between committed offsets is deterministic (exactly-once with a
    checkpointed sink). The same shape fits any cursor/sequence-numbered
    upstream (Kafka-less queues, DB change logs, paginated APIs)."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batchrows", 50))
        self.max_rows = int(options.get("rows", 200))

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start):
        s = start["idx"]
        e = min(s + self.batch_rows, self.max_rows)
        # the runner drains this with next() — must be an iterator
        return iter([(i, _doc_text(i), _doc_text(i).count(" ") + 1)
                     for i in range(s, e)]), {"idx": e}

    def readBetweenOffsets(self, start, end):
        # deterministic replay for recovery
        return iter([(i, _doc_text(i), _doc_text(i).count(" ") + 1)
                     for i in range(start["idx"], end["idx"])])
