"""Worker-side package shipping.

The driver contract (`__spark_entry__.py`) is imported by an external
harness whose cwd/PYTHONPATH we don't control. Functions pickled for
Python workers (pandas UDFs, rdd.pipe parsers) are serialized *by
reference* to this package, so workers must be able to import it — which
fails if the harness ran from outside the repo. Shipping the package as a
zip via ``SparkContext.addPyFile`` makes every executor self-sufficient,
exactly how the reference ships user code to the cluster (`-file` /
SCP'd JARs, MapReduceWSIImpl.java:93-110,194-197) — except here it's the
engine itself being shipped, once per context.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[str] = set()


def iter_checkpoint(df):
    """Cut lineage inside an iterative loop (connected components, BFS,
    pointer doubling, k-means) — the plan must not grow with the round
    count.

    Two modes:
    - default: ``localCheckpoint(eager=True)`` — blocks live on executors,
      no HDFS round-trip. Fastest, and the right call on local[N], but on
      a real cluster an executor loss makes the truncated lineage
      unrecoverable mid-job (the blocks ARE the recovery point).
    - reliable: when a checkpoint dir is configured — either via
      ``SparkContext.setCheckpointDir`` (e.g. session.get_spark's
      ``checkpoint_dir``) or the ``SPARK_GRAFT_CHECKPOINT_DIR`` env var —
      use ``checkpoint(eager=True)``, which writes to that (HDFS/object
      store) path and survives executor loss. The per-round write is the
      price of fault tolerance on long jobs at 100 TB.

    Eager is deliberate (re-established by r14 A/B): a non-eager
    ``localCheckpoint`` under AQE is a false economy — building the
    checkpoint RDD forces AdaptiveSparkPlanExec to materialize its
    query stages right there (a job at call time), and the final stage
    is then recomputed by EVERY downstream action instead of read from
    blocks (measured: lazy cost one extra job and ~2x the action time
    on the probe loops). A non-eager reliable ``checkpoint()`` is worse
    still: the RDD checkpoint contract recomputes the whole plan in a
    second job to write the files.

    Identical results either way (pytest-pinned); only the storage of the
    cut changes.
    """
    sc = df.sparkSession.sparkContext
    ckdir = sc.getCheckpointDir()
    if ckdir is None:
        env_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
        if env_dir:
            sc.setCheckpointDir(env_dir)
            ckdir = env_dir
    if ckdir is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def iter_checkpoint_probe(df, *exprs):
    """``iter_checkpoint`` + scalar probe in ONE action (r14): the
    iterative loops' convergence probes (label sums, edge-set
    fingerprints, frontier counts, max scores) ride the checkpoint
    materialization job via ``Dataset.observe`` (CollectMetrics)
    instead of paying a second scheduler round-trip per round — on a
    real cluster every saved action is a saved driver barrier.

    Returns ``(checkpointed_df, metrics)`` where metrics is the
    observed one-row aggregate as a dict. Exactness: CollectMetrics
    evaluates the same Catalyst aggregate expressions over the same
    materialized rows as a separate ``df.agg(...)`` would, so the probe
    values are bit-identical (measured: identical sums/fingerprints on
    every oracle replay); empty input yields count=0 / sum=max=None,
    the same as ``.agg()``. The checkpointed frame's downstream plan is
    a plain Scan ExistingRDD — the CollectMetrics node does not survive
    the lineage cut. Both checkpoint modes fire the metrics (verified:
    eager localCheckpoint and reliable checkpoint each run the
    materialization through the observed plan)."""
    from pyspark.sql import Observation
    obs = Observation()
    out = iter_checkpoint(df.observe(obs, *exprs))
    return out, obs.get


def _split_schema(schema: str) -> list[tuple[str, str]]:
    """Parse 'name type, name type' with nested generics
    (array<double>, map<string,int>) into (name, type) pairs."""
    fields, depth, cur = [], 0, ""
    for ch in schema:
        if ch == "," and depth == 0:
            fields.append(cur.strip())
            cur = ""
            continue
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        cur += ch
    if cur.strip():
        fields.append(cur.strip())
    out = []
    for f in fields:
        name, t = f.split(None, 1)
        out.append((name, t))
    return out


def literal_df(spark, rows, schema: str):
    """Small bounded DataFrame from Python rows as a PURE-EXPRESSION
    plan: explode of a literal struct array, each field cast to its
    declared type.

    Why not ``spark.createDataFrame(rows, schema)``: that path
    parallelizes PICKLED Python objects into an RDD, so EVERY
    evaluation of the frame — each action, each broadcast build, each
    bench rerun — round-trips through Python workers (r14 measurement:
    1.6-4.0 s per action for a 16-row frame vs 0.1 s as literals, and
    a 16x16 crossJoin of such a frame scheduled over executor-count
    partitions per side). Literal plans evaluate JVM-side in
    microseconds and broadcast for free. Use for the bounded driver-side
    tables this engine embeds (centroids, learned merges, offsets,
    collected iterates) — never for real data.

    ``rows`` cells may be scalars or lists (lists become typed array
    literals); values must round-trip via F.lit (int/float/str/bool/
    None/datetime). Empty ``rows`` falls back to an empty
    createDataFrame (a LocalRelation — no Python RDD either)."""
    from pyspark.sql import functions as F

    fields = _split_schema(schema)
    if not rows:
        return spark.createDataFrame([], schema)

    def cell(v, t):
        if isinstance(v, (list, tuple)):
            c = F.array(*[F.lit(x) for x in v]) if len(v) else F.array()
        else:
            c = F.lit(v)
        return c.cast(t)

    structs = [
        F.struct(*[cell(v, t).alias(name)
                   for (name, t), v in zip(fields, row)])
        for row in rows]
    return (spark.range(1)
            .select(F.explode(F.array(*structs)).alias("__lit"))
            .select(*[F.col(f"__lit.{name}").alias(name)
                      for name, _t in fields]))


def scratch_dir(kind: str, sf_dir: str) -> str:
    """Fresh per-process scratch directory for catalog fixture builders
    (JDBC/ORC/manifest/time-travel entries write a small derived table
    before querying it). Keyed by (kind, sf basename, pid): two
    concurrent sessions on the same fixture — e.g. the round driver and
    bench.py — get DISJOINT dirs instead of racing one shared path, and
    the rmtree below can only ever invalidate THIS process's previous
    build (ADVICE r10). Bounded: one small dir per (kind, process),
    reused across rebuilds within the process."""
    import shutil

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(tempfile.gettempdir(),
                        f"{kind}_{tag}_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    return base


def ensure_package_on_workers(spark) -> None:
    """Zip this package and addPyFile it, once per SparkContext."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    pkg = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg)
    zpath = os.path.join(
        tempfile.gettempdir(), f"mapreduce_wsi_spark_{os.getpid()}.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo_root))
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
