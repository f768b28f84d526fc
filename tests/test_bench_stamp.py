"""Round-stamp guard for bench.py's detail files (round-9 verdict #2).

The driver runs bench minutes AFTER writing CORRECTNESS_r{N}.json, so
the max+1 file inference stamped the NEXT round three rounds in a row
(r7, r8, r9 each needed a manual rename to BENCH_DETAIL_r{N}_driver).
bench._write_detail now detects a fresh round-(n-1) snapshot and
re-stamps the run as r{n-1}_driver. These tests pin both branches of
that logic without running Spark: they call _write_detail against a
temp repo dir by monkeypatching bench's directory resolution.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_write_detail(tmp_path, monkeypatch, argv=None, env=None):
    bench = _load_bench()
    bench.__file__ = str(tmp_path / "bench.py")
    monkeypatch.setattr(sys, "argv", ["bench.py"] + (argv or []))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ROUND", raising=False)
    for k, v in (env or {}).items():
        monkeypatch.setenv(k, v)
    bench._write_detail({"queries": {}, "sf": 0.1})
    return sorted(p.name for p in tmp_path.glob("BENCH_DETAIL_*.json"))


def _snapshot(tmp_path, n: int, age_sec: float) -> None:
    p = tmp_path / f"CORRECTNESS_r{n:02d}.json"
    p.write_text("{}\n")
    past = time.time() - age_sec
    os.utime(p, (past, past))


def test_fresh_snapshot_restamps_as_prev_round_driver(tmp_path, monkeypatch):
    # Driver scenario: CORRECTNESS_r09 written 6 min ago, bench runs
    # with no --round -> must stamp r09_driver, not r10.
    _snapshot(tmp_path, 9, age_sec=360)
    names = _run_write_detail(tmp_path, monkeypatch)
    assert names == ["BENCH_DETAIL_r09_driver.json"]


def test_stale_snapshot_keeps_inferred_next_round(tmp_path, monkeypatch):
    # In-round agent scenario: the round-start snapshot is hours old,
    # so a bare run is round 10's first bench and stamps r10.
    _snapshot(tmp_path, 9, age_sec=3 * 3600)
    names = _run_write_detail(tmp_path, monkeypatch)
    assert names == ["BENCH_DETAIL_r10.json"]


def test_explicit_round_overrides_freshness(tmp_path, monkeypatch):
    _snapshot(tmp_path, 9, age_sec=60)
    names = _run_write_detail(tmp_path, monkeypatch, argv=["--round", "10"])
    assert names == ["BENCH_DETAIL_r10.json"]


def test_driver_restamp_preserves_incumbent(tmp_path, monkeypatch):
    # A second fresh-snapshot run must not clobber the first driver
    # detail silently: the incumbent moves to _prev.
    _snapshot(tmp_path, 9, age_sec=60)
    (tmp_path / "BENCH_DETAIL_r09_driver.json").write_text(
        json.dumps({"queries": {"old": 1.0}})
    )
    names = _run_write_detail(tmp_path, monkeypatch)
    assert names == [
        "BENCH_DETAIL_r09_driver.json",
        "BENCH_DETAIL_r09_driver_prev.json",
    ]
    kept = json.loads((tmp_path / "BENCH_DETAIL_r09_driver_prev.json").read_text())
    assert kept["queries"] == {"old": 1.0}
