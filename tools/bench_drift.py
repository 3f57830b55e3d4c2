#!/usr/bin/env python3
"""Mechanical bench-drift table (VERDICT r9 ask #6): compare two
BENCH_DETAIL-shaped JSON files with per-row times normalized by each
file's ``calib_sec`` (the median no-op 32-task job time bench.py
measures), so scheduler-generation swings — the documented 1.4x-3x
cross-box noise — divide out before any row is called a regression.

For each query present in BOTH files it emits
    norm_ratio = (t_new / calib_new) / (t_old / calib_old)
and flags rows with norm_ratio > FLAG (default 1.4) AND an absolute
delta above ABS_FLOOR (default 0.15 s — sub-second rows swing on
scheduler noise; the r9 text_quality lesson: 0.18 -> 0.28 s is 1.52x
and 0.09 s of nothing).

Usage: python3 tools/bench_drift.py OLD.json NEW.json [--flag 1.4]
                                    [--abs-floor 0.15] [--md]
Prints one JSON line {summary..., "flagged": {...}}; --md prints a
markdown table of the flagged rows (plus the 5 biggest movers each
way) for pasting into SCALE.md.
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> tuple[dict[str, float], float, float | None]:
    with open(path) as f:
        d = json.load(f)
    calib = float(d.get("calib_sec") or 0) or 1.0
    scan = d.get("calib_scan_sec")
    return ({k: float(v) for k, v in d["queries"].items()}, calib,
            float(scan) if scan else None)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--flag", type=float, default=1.4)
    ap.add_argument("--abs-floor", type=float, default=0.15)
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args()

    old_q, old_c, old_s = load(args.old)
    new_q, new_c, new_s = load(args.new)
    shared = sorted(set(old_q) & set(new_q))
    rows = []
    for q in shared:
        t_old, t_new = old_q[q], new_q[q]
        # regime-matched normalization (r10 session-2): data-bound rows
        # (>= 1 s) divide by the sustained-throughput calib_scan_sec
        # when BOTH files carry it — the end-of-r10 runs showed
        # throughput swinging 1.3x while the no-op calib barely moved;
        # scheduler-bound sub-second rows keep the no-op calib.
        # Regime is classified from the BASELINE time alone (ADVICE
        # r10): min(t_old, t_new) made a row hovering around 1 s flip
        # calibrations across runs, so its norm_ratio series was not
        # comparable over time — t_old-only keeps every (old, new)
        # comparison of a given baseline on one calibration.
        # When either file predates calib_scan_sec, a data-bound row is
        # compared RAW (calib 1.0) rather than by the no-op calib — a
        # scheduler floor the row doesn't ride on (the r9->r10 regen
        # showed the no-op calib moving 0.65x while multi-second rows
        # held flat, which read as phantom 1.6x "regressions").
        if t_old >= 1.0:
            if old_s and new_s:
                c_old, c_new = old_s, new_s
            else:
                c_old, c_new = 1.0, 1.0
        else:
            c_old, c_new = old_c, new_c
        norm = (t_new / c_new) / (t_old / c_old) if t_old > 0 else None
        rows.append({"query": q, "old": t_old, "new": t_new,
                     "raw_ratio": round(t_new / t_old, 3) if t_old else None,
                     "norm_ratio": round(norm, 3) if norm else None,
                     "abs_delta": round(t_new - t_old, 3)})
    flagged = [r for r in rows
               if r["norm_ratio"] and r["norm_ratio"] > args.flag
               and r["abs_delta"] > args.abs_floor]
    summary = {
        "n_shared": len(shared),
        "calib_old": old_c, "calib_new": new_c,
        "calib_ratio": round(new_c / old_c, 3),
        "total_old": round(sum(old_q[q] for q in shared), 2),
        "total_new": round(sum(new_q[q] for q in shared), 2),
        "flag_threshold": args.flag, "abs_floor": args.abs_floor,
        "flagged": {r["query"]: r["norm_ratio"] for r in flagged},
    }
    print(json.dumps(summary))
    if args.md:
        movers = sorted((r for r in rows if r["norm_ratio"]),
                        key=lambda r: r["norm_ratio"])
        show = {r["query"]: r for r in flagged}
        for r in movers[:5] + movers[-5:]:
            show[r["query"]] = r
        print("\n| query | old s | new s | raw x | calib-norm x | flag |")
        print("|---|---|---|---|---|---|")
        for q in sorted(show):
            r = show[q]
            mark = "FLAG" if r in flagged else ""
            print(f"| {q} | {r['old']:.2f} | {r['new']:.2f} | "
                  f"{r['raw_ratio']} | {r['norm_ratio']} | {mark} |")


if __name__ == "__main__":
    main()
