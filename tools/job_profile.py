#!/usr/bin/env python3
"""Per-query job/stage profile: how many Spark JOBS (scheduler
round-trips) a bench row costs, split into build phase and one timed
noop execution. The r14 optimization round's first-pass triage tool:
at sf0.1 the sandbox's per-job floor is ~0.1-0.3 s (bench calib_sec),
so a row whose wall time ~= n_jobs * calib is scheduler-bound — the
fix is fewer actions/rounds, not kernel work. On a real cluster each
job is likewise a scheduler round-trip, so job count is the
scale-relevant metric, not a local[32] artifact.

Usage: python3 tools/job_profile.py [query ...]   (default: top rows)
Prints one line per query: name, build_jobs, run_jobs, build_sec,
run_sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mapreduce_wsi_spark.session import get_spark
    spark = get_spark(
        app_name="job_profile",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import bench
    from mapreduce_wsi_spark.plans.registry import load_catalog
    catalog = load_catalog()
    overrides = bench._bench_overrides()
    if not names:
        names = bench.HEADLINE

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10).count()

    st = sc.statusTracker()
    out = {}
    for name in names:
        fn = overrides.get(name) or getattr(catalog.get(name), "fn", None)
        if fn is None:
            print(f"{name}: NOT FOUND", file=sys.stderr)
            continue
        build_in_timing = name in bench.BUILD_IN_TIMING

        def n_jobs(group, body):
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            body()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            return len(st.getJobIdsForGroup(group)), dt

        if build_in_timing:
            # warm-up (codegen) untimed, then one timed run incl. build
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            bj, bt = 0, 0.0
            rj, rt = n_jobs(f"{name}-run", lambda: fn(spark, sf_dir)
                            .write.mode("overwrite").format("noop").save())
        else:
            bj, bt = n_jobs(f"{name}-build", lambda: fn(spark, sf_dir))
            built = fn(spark, sf_dir)
            built.write.mode("overwrite").format("noop").save()  # warm
            rj, rt = n_jobs(f"{name}-run", lambda: built.write
                            .mode("overwrite").format("noop").save())
        out[name] = {"build_jobs": bj, "run_jobs": rj,
                     "build_sec": round(bt, 3), "run_sec": round(rt, 3)}
        print(f"{name:42s} build_jobs={bj:3d} run_jobs={rj:3d} "
              f"build={bt:7.3f}s run={rt:7.3f}s", flush=True)

    with open("/tmp/job_profile.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
