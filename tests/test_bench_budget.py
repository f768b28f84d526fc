"""Per-query bench-budget regression gate (round-8 verdict item 7).

A 10x plan regression used to surface only when the judge diffed
BENCH_DETAIL files between rounds. This gate makes it a deterministic
CI failure: the LATEST committed bench detail must keep every query
under BUDGET_FACTOR x its time in the PREVIOUS round's detail, after
normalizing both files by their calibration probes (the host VM's
throughput swings 2-5x run-to-run; the fixed CPU-bound calib probe in
each detail file factors that out — same rule as
scripts/bench_compare.py).

The ceiling is deliberately generous (3x calibrated, with a 0.3 s
floor so sub-noise queries can't flake): it will never fire on host
noise — the round-8 verdict's worst genuine noise mover was 1.29x —
but a quadratic plan or a lost broadcast (typically 5-50x) fails the
suite the moment bench.py records it, instead of a round later.

No Spark work happens here: the gate reads the two highest-round
BENCH_DETAIL_r*.json files already on disk (preferring the _driver
variant within a round, like bench_compare). With fewer than two
files the gate skips — a fresh clone cannot regress against nothing.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_FACTOR = 3.0
FLOOR_SEC = 0.3  # calibrated; below this, timer noise dominates


def _detail_files() -> dict[int, str]:
    files: dict[int, str] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*.json"))):
        m = re.search(r"BENCH_DETAIL_r(\d+)(_driver)?\.json$", p)
        if m and (m.group(2) or int(m.group(1)) not in files):
            files[int(m.group(1))] = p
    return files


def _pair_calib(base: dict, cur: dict) -> tuple[float, float]:
    # Prefer the Spark-side shuffle probe (spark_calib_*, round 10+):
    # the pure-scan probe missed a uniform 1.6x Spark-throughput swing
    # in round 9. Fall back to the scan probe consistently for BOTH
    # files when either predates it (same rule as bench_compare).
    for prefix in ("spark_calib_", "calib_"):
        vals = []
        for doc in (base, cur):
            v = [doc.get(f"{prefix}start_sec"), doc.get(f"{prefix}end_sec")]
            v = [x for x in v if isinstance(x, (int, float)) and x > 0]
            vals.append(sum(v) / len(v) if v else None)
        if vals[0] is not None and vals[1] is not None:
            return vals[0], vals[1]
    return 1.0, 1.0


def test_no_query_blows_its_budget():
    files = _detail_files()
    if len(files) < 2:
        pytest.skip("need two BENCH_DETAIL rounds to compare")
    lo, hi = sorted(files)[-2:]
    with open(files[lo]) as fh:
        base = json.load(fh)
    with open(files[hi]) as fh:
        cur = json.load(fh)
    if base.get("sf") != cur.get("sf"):
        pytest.skip("details ran at different scale factors")
    c_base, c_cur = _pair_calib(base, cur)
    over = []
    for name, b_sec in base.get("queries", {}).items():
        n_sec = cur.get("queries", {}).get(name)
        if not isinstance(b_sec, (int, float)) or not isinstance(
            n_sec, (int, float)
        ):
            continue  # query added/removed between rounds
        if b_sec <= 0 or n_sec <= 0:
            continue  # recorded failure — the correctness gate owns those
        base_cal = max(b_sec / c_base, FLOOR_SEC)
        if n_sec / c_cur > BUDGET_FACTOR * base_cal:
            over.append(
                f"{name}: {n_sec:.2f}s vs budget "
                f"{BUDGET_FACTOR * base_cal * c_cur:.2f}s "
                f"(r{lo} {b_sec:.2f}s, calib {c_base:.2f}->{c_cur:.2f})"
            )
    assert not over, (
        "bench budget exceeded (3x calibrated vs previous round) — "
        "isolate-reproduce before 'fixing' (PROGRESS round-5 rule):\n"
        + "\n".join(over)
    )
