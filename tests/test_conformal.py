"""relational/conformal.py — split-conformal anomaly detection:
exact Python replica on a planted series + structural invariants.
Registry oracle parity runs in test_oracle_parity.py."""

from __future__ import annotations

import math
import os
from datetime import datetime, timedelta

from searchengine_spark.relational.conformal import (
    CONF_ALPHA,
    CONF_SEASON_H,
    q_events_conformal_anomaly,
)

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def test_conformal_matches_python_replica(spark, tmp_path_factory):
    t0 = datetime(2024, 1, 1)
    # deterministic bumpy hourly series: one event per hour, value in
    # whole cents so the replica is exact
    H = 24 + 60
    vals = [round(10.0 + (h * 13 % 7) + (h % 5) * 0.25, 2) for h in range(H)]
    rows = [
        (h, t0 + timedelta(hours=h), 1, "view", vals[h], "{}") for h in range(H)
    ]
    d = str(tmp_path_factory.mktemp("conf"))
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )

    # replica
    cents = [round(v * 100) for v in vals]
    scores = [
        (h, abs(cents[h] - cents[h - CONF_SEASON_H]))
        for h in range(CONF_SEASON_H, H)
    ]
    n = len(scores)
    cal, test = scores[: n // 2], scores[n // 2 :]
    k = math.ceil((len(cal) + 1) * (1.0 - CONF_ALPHA))
    q_hat = sorted(s for _, s in cal)[k - 1]
    n_flagged = sum(1 for _, s in test if s > q_hat)

    r = q_events_conformal_anomaly(spark, d).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_cal == len(cal) and row.n_test == len(test)
    assert row.threshold == q_hat / 100.0
    assert row.n_flagged == n_flagged
    assert row.flag_rate == round(n_flagged / len(test), 6)


def test_conformal_rate_near_alpha_on_corpus(spark, sf_dir):
    rows = q_events_conformal_anomaly(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_cal > 0 and r.n_test > 0
        assert r.threshold is not None and r.threshold >= 0
        assert 0.0 <= r.flag_rate <= 1.0
        # no distributional claim on the real series (the tiny-SF
        # corpus is visibly nonstationary between halves, which is
        # precisely what the monitor should flag) — the guarantee
        # itself is pinned by the planted replica above
        assert r.n_flagged <= r.n_test
