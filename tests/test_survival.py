"""relational/survival.py — Kaplan-Meier time-to-conversion.
Registry oracle parity runs in test_oracle_parity.py; here:
hand-computed curve on a planted cohort, censoring semantics, and
the estimator's shape invariants."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest

from searchengine_spark.relational.survival import (
    HORIZON_H,
    ORACLES,
    QUERIES,
)
from tests.helpers import assert_matches_oracle

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _plant(spark, tmp_path_factory, rows, name):
    d = str(tmp_path_factory.mktemp(name))
    ev = spark.createDataFrame(rows, _SCHEMA)
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def test_km_hand_computed_cohort(spark, tmp_path_factory):
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(uid, etype, hours):
        nonlocal eid
        eid += 1
        return (eid, t0 + timedelta(hours=hours), uid, etype, 1.0, "{}")

    # u1 converts at 2h, u2 converts at 2h, u3 converts at 5h,
    # u4 never converts (censored at horizon), u5 converts past the
    # horizon (administratively censored at horizon).
    rows += [ev(1, "signup", 0), ev(1, "purchase", 2.5)]
    rows += [ev(2, "signup", 0), ev(2, "purchase", 2.5)]
    rows += [ev(3, "signup", 0), ev(3, "purchase", 5.0)]
    rows += [ev(4, "signup", 0)]
    rows += [ev(5, "signup", 0), ev(5, "purchase", HORIZON_H + 10)]
    # keep the corpus max far out so nothing else censors early
    rows += [ev(6, "view", HORIZON_H + 200)]

    d = _plant(spark, tmp_path_factory, rows, "km_hand")
    out = {r.t_hours: r for r in QUERIES["events_survival_km"](spark, d).collect()}

    # t=2: 5 at risk, 2 deaths -> S = 3/5
    assert out[2].at_risk == 5 and out[2].deaths == 2
    assert out[2].survival == pytest.approx(0.6, abs=1e-6)
    # t=5: 3 at risk, 1 death -> S = 0.6 * 2/3 = 0.4
    assert out[5].at_risk == 3 and out[5].deaths == 1
    assert out[5].survival == pytest.approx(0.4, abs=1e-6)
    # horizon row: both non-converters censored there, S unchanged
    assert out[HORIZON_H].n_censored == 2 and out[HORIZON_H].deaths == 0
    assert out[HORIZON_H].survival == pytest.approx(0.4, abs=1e-6)

    assert_matches_oracle(
        QUERIES["events_survival_km"](spark, d),
        ORACLES["events_survival_km"],
        d,
        "events_survival_km planted",
    )


def test_km_shape_invariants(spark, sf_dir):
    curve = QUERIES["events_survival_km"](spark, sf_dir).collect()
    assert curve, "curve must be non-empty"
    s_prev, risk_prev, t_prev = 1.0 + 1e-9, None, -1
    total_leaving = 0
    for r in curve:
        assert r.t_hours > t_prev
        assert 0.0 <= r.survival <= s_prev + 1e-9, "S must be nonincreasing"
        assert r.deaths + r.n_censored >= 1, "empty strata must not appear"
        if risk_prev is not None:
            assert r.at_risk < risk_prev, "risk set must shrink"
        assert r.t_hours <= HORIZON_H
        total_leaving += r.deaths + r.n_censored
        s_prev, risk_prev, t_prev = r.survival, r.at_risk, r.t_hours
    # everyone who entered leaves exactly once
    assert total_leaving == curve[0].at_risk


def test_km_no_censoring_matches_ecdf(spark, tmp_path_factory):
    # all users convert inside the horizon -> S(t) = 1 - ECDF(t)
    t0 = datetime(2024, 1, 1)
    rows = []
    for uid in range(10):
        rows.append((2 * uid, t0, uid, "signup", 1.0, "{}"))
        rows.append(
            (2 * uid + 1, t0 + timedelta(hours=uid + 1), uid, "purchase", 1.0, "{}")
        )
    d = _plant(spark, tmp_path_factory, rows, "km_ecdf")
    curve = QUERIES["events_survival_km"](spark, d).collect()
    seen = 0
    for r in curve:
        seen += r.deaths
        assert r.survival == pytest.approx(1.0 - seen / 10.0, abs=1e-6)
    assert seen == 10
