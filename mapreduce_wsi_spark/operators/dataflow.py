"""Arbitrary-dataflow surface: the reference's two "bring your own program"
entry points, re-expressed in-process.

- ``run_job`` ≈ runMapReduce (MapReduceWSIImpl.java:89-115): the reference
  SCPs a client JAR and runs its main() via ``yarn jar`` with arg0 = the
  scope's HDFS prefix (contract MapReduceWSI.java:68-73). Here the "JAR" is
  a Python callable ``fn(spark, scope_prefix, *args)`` — same contract,
  no SSH/SCP, one Catalyst DAG end to end.

- ``pipe_map_reduce`` ≈ runStreamingMapReduce (MapReduceWSIImpl.java:132-211):
  Hadoop Streaming fidelity — mapper/reducer arrive as *source strings with
  shebangs* (MapReduceWSI.java:87-92), are materialized to files, and talk
  the stdin/stdout tab-separated KV line protocol. Between the stages the
  framework guarantees hash-partition-by-key + sort-within-partition
  (reducers rely on sorted contiguous keys: EndToEndTest.java:94-98) —
  reproduced with repartitionAndSortWithinPartitions, the one place the
  engine deliberately drops to the RDD API (the line protocol is
  row-oriented by definition; see SURVEY.md §7.4).

The modern fast path for Python-native map/reduce without the line-protocol
tax is ``mapInPandas``/``applyInPandas`` (Arrow-batched) — exposed here as
``arrow_map_reduce`` so users can migrate off pipes incrementally.
"""

from __future__ import annotations

import os
import stat
import tempfile
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

from mapreduce_wsi_spark.scope import scope_path


def run_job(engine, scope_id: int, fn: Callable, *args, **kwargs):
    """Run a user job against a scope: ``fn(spark, scope_prefix, *args)``.

    arg0-is-the-scope-prefix mirrors MapReduceWSI.java:68-73; everything
    else is ordinary PySpark in the caller's hands.
    """
    prefix = scope_path(engine.base_path, scope_id)
    return fn(engine.spark, prefix, *args, **kwargs)


def run_job_artifact(engine, scope_id: int, artifact_path: str,
                     entry_module: str, entry_func: str = "main",
                     *args, **kwargs):
    """Compiled-artifact flavor of ``run_job`` — the reference's actual
    contract ships a self-contained client JAR and invokes its ``main()``
    with arg0 = the scope prefix (MapReduceWSIImpl.java:89-115,
    MapReduceWSI.java:68-73). Here the artifact is a ``.zip``/``.egg``/
    ``.py`` Python bundle shipped via ``addPyFile`` — importable on the
    driver AND every executor (so UDFs defined inside the artifact
    resolve) — and ``<entry_module>.<entry_func>(spark, scope_prefix,
    *args)`` is the main().
    """
    if not os.path.isfile(artifact_path):
        raise FileNotFoundError(f"artifact not found: {artifact_path}")
    engine.spark.sparkContext.addPyFile(artifact_path)
    import importlib
    mod = importlib.import_module(entry_module)
    fn = getattr(mod, entry_func)
    prefix = scope_path(engine.base_path, scope_id)
    return fn(engine.spark, prefix, *args, **kwargs)


def _materialize_script(source: str, tag: str) -> str:
    """Write a script source string (with shebang) to an executable temp
    file (≈ writeTempFile + SCP, MapReduceWSIImpl.java:119-130,146-151)."""
    fd, path = tempfile.mkstemp(prefix=f"mrwsi_{tag}_", suffix=".script")
    with os.fdopen(fd, "w") as f:
        f.write(source)
    os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR | stat.S_IXGRP)
    return path


def pipe_map_reduce(engine, scope_id: int, mapper_script: str,
                    reducer_script: str, input_name: str, output_name: str,
                    num_reducers: int | None = None,
                    files: list[str] | None = None) -> None:
    """Hadoop-Streaming-compatible script dataflow over a scope dataset.

    Protocol fidelity (MapReduceWSI.java:81-105, EndToEndTest.java:84-98):
      - mapper: raw input lines on stdin -> ``key\\tvalue`` lines on stdout
      - framework: hash partition by key, byte-order sort within partition
      - reducer: sorted grouped lines on stdin -> output lines on stdout
    Output is written as text to ``<scope>/<output_name>``.

    ``files``: auxiliary side files (lookup tables, configs) shipped to
    every executor's working directory alongside the scripts — the
    reference ships N side files via repeated ``-file`` flags
    (MapReduceWSIImpl.java:194-197). Scripts open them by BASENAME:
    ``SparkFiles.getRootDirectory()`` is prepended to PATH-relative reads
    via the pipe env, matching Hadoop Streaming's cwd-symlink behavior.
    """
    spark = engine.spark
    sc = spark.sparkContext
    n_red = num_reducers or sc.defaultParallelism

    mapper_path = _materialize_script(mapper_script, "mapper")
    reducer_path = _materialize_script(reducer_script, "reducer")
    # ship to executors (≈ the -file flags, MapReduceWSIImpl.java:194-197)
    sc.addFile(mapper_path)
    sc.addFile(reducer_path)
    for aux in files or []:
        if not os.path.isfile(aux):
            raise FileNotFoundError(f"aux file not found: {aux}")
        sc.addFile(aux)

    in_path = scope_path(engine.base_path, scope_id, input_name)
    out_path = scope_path(engine.base_path, scope_id, output_name)

    # Where shipped side files land: on a YARN cluster addFile localizes
    # into the container cwd (pipe children inherit it — bare basenames
    # work, as in Hadoop Streaming); in local mode they land in the
    # SparkFiles root instead, so export it for scripts to join against.
    from pyspark import SparkFiles
    pipe_env = {"MRWSI_FILES_DIR": SparkFiles.getRootDirectory()}

    lines = spark.read.text(in_path).rdd.map(lambda r: r[0])
    mapped = lines.pipe(mapper_path, env=pipe_env)
    # key = text before first tab (Hadoop KeyValueTextInputFormat semantics)
    keyed = mapped.map(lambda ln: (ln.split("\t", 1)[0], ln))
    # default partitionFunc is pyspark's portable_hash (stable across
    # processes, unlike builtin hash with randomized PYTHONHASHSEED)
    shuffled = keyed.repartitionAndSortWithinPartitions(numPartitions=n_red)
    reduced = shuffled.values().pipe(reducer_path, env=pipe_env)
    reduced.map(lambda ln: (ln,)).toDF(["value"]).write.mode("overwrite") \
        .text(out_path)
    for p in (mapper_path, reducer_path):
        try:
            os.unlink(p)  # ≈ temp cleanup, MapReduceWSIImpl.java:156-161
        except OSError:
            pass


def arrow_map_reduce(df: DataFrame,
                     map_fn: Callable[[Iterator], Iterator],
                     map_schema: str,
                     group_cols: list[str] | None = None,
                     reduce_fn: Callable | None = None,
                     reduce_schema: str | None = None) -> DataFrame:
    """Modern map/shuffle/reduce: Arrow-batched pandas stages instead of
    forked processes and text pipes (~10-100x less overhead).

    ``map_fn``: iterator-of-pandas -> iterator-of-pandas (mapInPandas).
    ``reduce_fn``: per-group pandas -> pandas (applyInPandas), optional.
    """
    mapped = df.mapInPandas(map_fn, map_schema)
    if reduce_fn is None:
        return mapped
    assert group_cols and reduce_schema
    return mapped.groupBy(*group_cols).applyInPandas(reduce_fn, reduce_schema)
