#!/usr/bin/env python3
"""Drift adjudication probe: time the named catalog entries n>=5 times
at one SF and report min/median/max — the repo's evidence standard for
any bench row that moved >1.4x round-over-round (SCALE.md "drift
adjudication" protocol, established for mm_decode_gif in r6).

Timings use the exact bench.py path: noop sink, one untimed warm-up
run (codegen), then n timed runs. Median is the adjudication statistic
(best-of-N hides bimodality; mean is GC-pause-sensitive).

Usage: python3 tools/drift_probe.py [-n 7] query [query ...]
Prints one JSON line: {query: {"min": s, "median": s, "max": s,
"runs": [...]}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mapreduce_wsi_spark.session import get_spark
    spark = get_spark(
        app_name="drift_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from mapreduce_wsi_spark.plans.registry import load_catalog
    catalog = load_catalog()
    from bench import _bench_overrides
    overrides = _bench_overrides()

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()

    out: dict[str, dict] = {}
    for name in args:
        fn = overrides.get(name) or getattr(catalog.get(name), "fn", None)
        if fn is None:
            print(f"unknown query: {name}", file=sys.stderr)
            continue

        def run_once():
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

        run_once()  # untimed warm-up (whole-stage-codegen compile)
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            run_once()
            runs.append(round(time.perf_counter() - t0, 4))
        out[name] = {"min": min(runs),
                     "median": round(statistics.median(runs), 4),
                     "max": max(runs), "runs": runs}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
