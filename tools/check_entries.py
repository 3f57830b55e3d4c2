"""Targeted local parity check: run named catalog entries through the
driver-gate replica (plans/parity.py) at sf0.01.

Usage: python tools/check_entries.py name1 name2 ...
       python tools/check_entries.py --module q_curation   # all entries
           registered by that plans module (by __module__ suffix)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")


def main() -> int:
    from mapreduce_wsi_spark.plans.parity import compare, duckdb_connection
    from mapreduce_wsi_spark.plans.registry import load_catalog
    from mapreduce_wsi_spark.session import get_spark

    catalog = load_catalog()
    args = sys.argv[1:]
    if args and args[0] == "--module":
        suffix = args[1]
        names = [n for n, e in catalog.items()
                 if e.fn.__module__.endswith(suffix)]
    else:
        names = args
    unknown = [n for n in names if n not in catalog]
    if unknown:
        print(f"unknown entries: {unknown}")
        return 2
    spark = get_spark(app_name="check_entries",
                      extra_conf={"spark.ui.enabled": "false"})
    con = duckdb_connection(SF)
    n_bad = 0
    for name in names:
        e = catalog[name]
        t0 = time.monotonic()
        try:
            if e.oracle is None:
                n = e.fn(spark, SF).count()
                print(f"ROWS-ONLY {name}: {n} rows "
                      f"({time.monotonic() - t0:.1f}s)")
                continue
            res = compare(name, e.fn(spark, SF), con, e.oracle)
        except Exception as ex:  # noqa: BLE001 - report and continue
            print(f"FAIL {name}: raised {type(ex).__name__}: {ex}")
            n_bad += 1
            continue
        tag = "ok" if res.ok else "FAIL"
        print(f"{tag} {name}: {res.detail} ({time.monotonic() - t0:.1f}s)")
        n_bad += 0 if res.ok else 1
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
