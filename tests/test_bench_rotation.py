"""Rotation coverage gate (round-12 verdict task 4): every registry
query must get an sf0.1 bench timing at least once per rotation
cycle. No Spark work — pure slot arithmetic over the registry names,
plus a soft budget check of the newest rotation sample against prior
ones when two BENCH_DETAIL files carry overlapping rotation data."""

from __future__ import annotations

import glob
import importlib.util
import json
import math
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _bench()


@pytest.fixture(scope="module")
def registry_names():
    from searchengine_spark.registry import all_queries

    return set(all_queries())


def test_headline_names_all_registered(bench, registry_names):
    missing = [n for n in bench.HEADLINE if n not in registry_names]
    assert not missing, missing


def test_rotation_slots_partition_the_pool(bench, registry_names):
    pool = bench.rotation_pool(registry_names)
    n_cycles = max(1, math.ceil(len(pool) / bench.ROTATION_SIZE))
    seen: list[str] = []
    for r in range(n_cycles):
        slot = bench.rotation_slot_names(registry_names, r)
        assert len(slot) <= bench.ROTATION_SIZE + n_cycles  # near-even
        seen.extend(slot)
    # one full cycle covers the whole non-headline pool exactly once
    assert sorted(seen) == pool
    # slots are deterministic and periodic
    assert bench.rotation_slot_names(registry_names, 0) == bench.rotation_slot_names(
        registry_names, n_cycles
    )


def test_every_name_timed_within_one_cycle(bench, registry_names):
    """The verdict's done-bar: every registry name is timed at sf0.1
    at least once every ceil(pool/40)+1 rounds — headline names every
    round, pool names once per cycle."""
    pool = bench.rotation_pool(registry_names)
    n_cycles = max(1, math.ceil(len(pool) / bench.ROTATION_SIZE))
    for name in registry_names:
        if name in bench.HEADLINE:
            continue
        i = pool.index(name)
        rounds_hit = [
            r for r in range(13, 13 + n_cycles)
            if name in bench.rotation_slot_names(registry_names, r)
        ]
        assert rounds_hit, f"{name} never scheduled in a full cycle"


def test_rotation_budget_vs_prior_samples():
    """Soft regression gate over rotation samples: when the two newest
    BENCH_DETAIL files both carry a rotation section with shared
    names, each must stay under the same 3x median-normalized budget
    the headline gate uses (median host factor from the shared
    HEADLINE timings, the population that exists in every file)."""
    files: dict[int, str] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*.json"))):
        m = re.search(r"BENCH_DETAIL_r(\d+)(_driver)?\.json$", p)
        if m and (m.group(2) or int(m.group(1)) not in files):
            files[int(m.group(1))] = p
    docs = []
    for n in sorted(files):
        try:
            with open(files[n]) as fh:
                doc = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        if doc.get("rotation", {}).get("queries"):
            docs.append(doc)
    if len(docs) < 2:
        pytest.skip("need two rotation-bearing BENCH_DETAIL rounds")
    base, cur = docs[-2], docs[-1]
    shared_head = {
        k: (b, cur["queries"][k])
        for k, b in base.get("queries", {}).items()
        if isinstance(b, (int, float)) and b > 0
        and isinstance(cur.get("queries", {}).get(k), (int, float))
        and cur["queries"][k] > 0
    }
    if len(shared_head) < 20:
        pytest.skip("too few shared headline queries to normalize")
    import statistics

    host = statistics.median(n / b for b, n in shared_head.values())
    over = []
    for name, b_sec in base["rotation"]["queries"].items():
        n_sec = cur["rotation"]["queries"].get(name)
        if not isinstance(n_sec, (int, float)) or n_sec <= 0 or b_sec <= 0:
            continue
        if n_sec > 3.0 * max(b_sec, 0.3) * host:
            over.append((name, b_sec, n_sec))
    assert not over, f"rotation queries over budget (host={host:.2f}): {over}"
