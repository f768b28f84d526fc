"""SOAK.json must stay structurally sound: every soaked query has
timings for every factor, no errors, and no recorded blow-up beyond
the documented bound. Regenerate with `python scripts/soak.py`."""

import importlib.util
import json

# x5 bound: linear work would be <=5; the recorded worst cases are the
# documented sublinear-cluster trades (~2.8). Anything past 5 means a
# new blow-up was recorded without being triaged.
MAX_RATIO = 5.0


def _soak_queries():
    spec = importlib.util.spec_from_file_location(
        "soak", "/root/repo/scripts/soak.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.QUERIES, mod.FACTORS


def test_soak_record_matches_script_and_stays_linear():
    with open("/root/repo/SOAK.json") as fh:
        rec = json.load(fh)
    queries, factors = _soak_queries()
    assert set(rec["queries"]) == set(queries), (
        "SOAK.json is stale — rerun scripts/soak.py"
    )
    for name, r in rec["queries"].items():
        for f in factors:
            assert r.get(f"x{f}", -1) > 0, f"{name}: missing/failed x{f}"
            assert f"x{f}_err" not in r, f"{name}: {r.get(f'x{f}_err')}"
        assert r["ratio_x5"] <= MAX_RATIO, (
            f"{name}: x5 ratio {r['ratio_x5']} exceeds the linear bound — "
            "triage before re-recording"
        )
