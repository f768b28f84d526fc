"""relational/stats_tests.py — two-sample KS and Benjamini-Hochberg
FDR. Registry oracle parity runs in test_oracle_parity.py; here:
planted-effect recovery (replicating the md5 coin in Python), null
behavior, and the step-up's structural invariants."""

from __future__ import annotations

import hashlib
import os
from datetime import datetime

import pytest

from searchengine_spark.relational.stats_tests import (
    BH_MAX_M,
    BH_SALT,
    KS_SALT,
    ORACLES,
    QUERIES,
    _BH_CRIT,
)
from tests.helpers import assert_matches_oracle

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _coin(salt: str, uid: int) -> bool:
    """Python replica of operators.sampling.hash_bucket(n=2) == 0."""
    h = int(hashlib.md5(f"{salt}{uid}".encode()).hexdigest()[:15], 16)
    return h % 2 == 0


def _plant(spark, tmp_path_factory, rows, name):
    d = str(tmp_path_factory.mktemp(name))
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def test_bh_crit_constants_are_sane():
    for m, per_k in _BH_CRIT.items():
        assert len(per_k) == m
        # step-up thresholds loosen with rank
        crits = [per_k[k] for k in range(1, m + 1)]
        assert all(a > b for a, b in zip(crits, crits[1:]))
    # k=m is the unadjusted two-sided 5% z
    assert _BH_CRIT[BH_MAX_M][BH_MAX_M] == pytest.approx(1.959964, abs=1e-6)


def test_ks_null_does_not_reject(spark, sf_dir):
    r = QUERIES["events_ks_variant"](spark, sf_dir).collect()[0]
    assert 0.0 <= r.ks_d <= 1.0
    assert r.reject_null == (r.ks_d > r.threshold)
    assert not r.reject_null, "hash coin carries no treatment"


def test_ks_detects_planted_separation(spark, tmp_path_factory):
    ts = datetime(2024, 1, 1)
    rows = []
    for uid in range(200):
        v = 1.0 if _coin(KS_SALT, uid) else 100.0
        rows.append((uid, ts, uid, "view", v, "{}"))
    d = _plant(spark, tmp_path_factory, rows, "ks_sep")
    r = QUERIES["events_ks_variant"](spark, d).collect()[0]
    assert r.ks_d == pytest.approx(1.0, abs=1e-9), "disjoint supports -> D = 1"
    assert r.reject_null
    assert r.d_at_cents == 100  # the A-side mass sits at $1.00
    assert_matches_oracle(
        QUERIES["events_ks_variant"](spark, d),
        ORACLES["events_ks_variant"],
        d,
        "events_ks_variant planted",
    )


def test_bh_rejects_only_planted_metric(spark, tmp_path_factory):
    ts = datetime(2024, 1, 1)
    rows, eid = [], 0
    for uid in range(400):
        a = _coin(BH_SALT, uid)
        for etype in ("view", "click", "purchase"):
            # 'purchase' carries a real effect; noise is deterministic
            base = 10.0 + (uid % 7)
            v = base + (50.0 if (etype == "purchase" and a) else 0.0)
            rows.append((eid, ts, uid, etype, v, "{}"))
            eid += 1
    d = _plant(spark, tmp_path_factory, rows, "bh_eff")
    out = {r.event_type: r for r in QUERIES["events_bh_fdr"](spark, d).collect()}
    assert out["purchase"].rejected
    assert not out["view"].rejected and not out["click"].rejected
    assert out["purchase"].z_rank == 1
    ranks = sorted(r.z_rank for r in out.values())
    assert ranks == [1, 2, 3]
    assert_matches_oracle(
        QUERIES["events_bh_fdr"](spark, d),
        ORACLES["events_bh_fdr"],
        d,
        "events_bh_fdr planted",
    )


def test_bh_null_rejects_nothing(spark, sf_dir):
    rows = QUERIES["events_bh_fdr"](spark, sf_dir).collect()
    assert len(rows) <= BH_MAX_M
    assert all(not r.rejected for r in rows)
    # BH step-up contiguity: rejections (if any) are a prefix of ranks
    flags = [r.rejected for r in sorted(rows, key=lambda r: r.z_rank)]
    assert flags == sorted(flags, reverse=True)


def test_median_ci_planted_exact(spark, tmp_path_factory):
    import math

    from searchengine_spark.relational.stats_tests import MEDIAN_Z

    ts = datetime(2024, 1, 1)
    # values 1..100 dollars: median = value at rank 50; CI ranks from
    # the normal-approx binomial bound, replicated exactly
    rows = [(i, ts, i, "view", float(i + 1), "{}") for i in range(100)]
    d = _plant(spark, tmp_path_factory, rows, "medci")
    r = QUERIES["events_median_ci"](spark, d).collect()[0]
    n = 100
    half = MEDIAN_Z * math.sqrt(n) / 2.0
    r_lo = max(1, math.floor(n / 2 - half))
    r_med = math.ceil(n / 2)
    r_hi = min(n, math.ceil(n / 2 + half))
    assert r.n_events == n
    assert r.median == float(r_med)
    assert r.ci_lo == float(r_lo)
    assert r.ci_hi == float(r_hi)
    assert r.ci_lo < r.median < r.ci_hi
    assert_matches_oracle(
        QUERIES["events_median_ci"](spark, d),
        ORACLES["events_median_ci"],
        d,
        "events_median_ci planted",
    )
