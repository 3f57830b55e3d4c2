#!/usr/bin/env python3
"""Time a subset of bench HEADLINE rows with bench.py's exact
methodology (warm-up + best-of-3, noop sink, BUILD_IN_TIMING rules).
A/B tool for the optimization rounds — the full bench stays the
official number.

Usage: python3 tools/bench_subset.py query [query ...]
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
    spark = get_spark(app_name="bench_subset",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    from mapreduce_wsi_spark.plans.registry import load_catalog
    catalog = load_catalog()
    overrides = bench._bench_overrides()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10).count()
    calib = bench._calibrate(spark)

    timings = {}
    for name in names:
        fn = overrides.get(name) or getattr(catalog.get(name), "fn", None)
        if fn is None:
            print(f"{name}: NOT FOUND", file=sys.stderr)
            continue
        build_in_timing = name in bench.BUILD_IN_TIMING

        def run_once():
            df = fn(spark, sf_dir) if build_in_timing else built
            df.write.mode("overwrite").format("noop").save()

        built = None if build_in_timing else fn(spark, sf_dir)
        run_once()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run_once()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"{name:42s} {best:8.3f}s", flush=True)
    print(json.dumps({"calib_sec": calib, "queries": timings}))


if __name__ == "__main__":
    main()
