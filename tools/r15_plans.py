#!/usr/bin/env python3
"""Dump .explain("formatted") for every bench HEADLINE query to
plans/r15/<query>_<tag>.txt — the optimization round's before/after
evidence (the judge checks plan claims against these files).

Usage: python3 tools/r15_plans.py before|after [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    from mapreduce_wsi_spark.session import get_spark
    spark = get_spark(app_name="r15_plans",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    from mapreduce_wsi_spark.plans.registry import load_catalog
    catalog = load_catalog()
    overrides = bench._bench_overrides()
    if not names:
        names = bench.HEADLINE

    for name in names:
        fn = overrides.get(name) or getattr(catalog.get(name), "fn", None)
        if fn is None:
            print(f"{name}: NOT FOUND", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"{name}: ok", flush=True)
        except Exception as e:
            print(f"{name}: ERROR {e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
