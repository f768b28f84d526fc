#!/usr/bin/env python
"""Round-over-round bench regression report.

Compares the two highest-numbered BENCH_DETAIL_r*.json files (or two
paths given on the command line) and reports per-query movers beyond
a ratio threshold (default 1.5x either direction).

The host VM's throughput swings 2-5x run-to-run, so raw ratios lie.
Each detail file carries calib_start_sec/calib_end_sec — a fixed
CPU-bound probe — and this report normalizes every query time by the
file's mean calibration time before comparing. A query is flagged
only if its CALIBRATED ratio crosses the threshold; the raw ratio is
shown alongside. Per the soak-derived rule (PROGRESS round 5):
isolate-reproduce a flagged regression before "fixing" it.

Usage:
    python scripts/bench_compare.py [OLD.json NEW.json] [--threshold 1.5]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def _latest_two(repo_root: str) -> tuple[str, str]:
    # A round can carry two detail files: the in-round run
    # (BENCH_DETAIL_rNN.json) and the driver's post-round run
    # (BENCH_DETAIL_rNN_driver.json — round 7's landed mis-stamped as
    # r08 and was renamed to its true round). Prefer the _driver
    # variant when both exist: the driver harness is what the NEXT
    # round's driver numbers compare against.
    files = {}
    for p in sorted(glob.glob(os.path.join(repo_root, "BENCH_DETAIL_r*.json"))):
        m = re.search(r"BENCH_DETAIL_r(\d+)(_driver)?\.json$", p)
        if m and (m.group(2) or int(m.group(1)) not in files):
            files[int(m.group(1))] = p
    if len(files) < 2:
        sys.exit(
            "need two BENCH_DETAIL_r*.json files to compare "
            f"(found {len(files)} in {repo_root})"
        )
    hi = sorted(files)[-2:]
    return files[hi[0]], files[hi[1]]


def _calib_one(doc: dict, prefix: str) -> float | None:
    vals = [doc.get(f"{prefix}start_sec"), doc.get(f"{prefix}end_sec")]
    vals = [v for v in vals if isinstance(v, (int, float)) and v > 0]
    return sum(vals) / len(vals) if vals else None


def pair_calib(old: dict, new: dict) -> tuple[float, float, str]:
    """Calibration pair for two detail files. Prefers the Spark-side
    shuffle probe (spark_calib_*, round 10+): the pure-scan probe
    tracks raw CPU but missed a uniform 1.6x Spark-throughput swing in
    round 9 (it claimed the host was FASTER while every untouched
    query ran slower). Falls back to the scan probe — consistently for
    BOTH files — when either side predates the shuffle probe."""
    for prefix, label in (("spark_calib_", "spark"), ("calib_", "scan")):
        a, b = _calib_one(old, prefix), _calib_one(new, prefix)
        if a is not None and b is not None:
            return a, b, label
    return 1.0, 1.0, "none"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="*", help="OLD.json NEW.json (default: two latest)")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if len(args.paths) == 2:
        old_path, new_path = args.paths
    elif not args.paths:
        old_path, new_path = _latest_two(repo_root)
    else:
        ap.error("give zero or two paths")

    with open(old_path) as fh:
        old = json.load(fh)
    with open(new_path) as fh:
        new = json.load(fh)

    old_q, new_q = old.get("queries", {}), new.get("queries", {})
    c_old, c_new, probe = pair_calib(old, new)
    print(f"old: {os.path.basename(old_path)} (calib {c_old:.2f}s, {probe} probe)")
    print(f"new: {os.path.basename(new_path)} (calib {c_new:.2f}s, {probe} probe)")

    shared = sorted(set(old_q) & set(new_q))
    movers = []
    for name in shared:
        a, b = old_q[name], new_q[name]
        if not a or not b:
            continue
        raw = b / a
        cal = (b / c_new) / (a / c_old)
        if cal >= args.threshold or cal <= 1 / args.threshold:
            movers.append((cal, raw, a, b, name))

    print(f"shared queries: {len(shared)}; "
          f"new-only: {sorted(set(new_q) - set(old_q))}; "
          f"gone: {sorted(set(old_q) - set(new_q))}")
    if not movers:
        print(f"no calibrated movers beyond {args.threshold}x")
        return 0
    movers.sort(reverse=True)
    print(f"\ncalibrated movers beyond {args.threshold}x "
          "(cal_ratio raw_ratio old_s new_s name):")
    for cal, raw, a, b, name in movers:
        direction = "SLOWER" if cal > 1 else "faster"
        print(f"  {cal:6.2f}x {raw:6.2f}x {a:8.3f} {b:8.3f}  {name}  [{direction}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
