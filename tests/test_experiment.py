"""relational/experiment.py — Poisson bootstrap CI and
difference-in-differences. Registry oracle parity is covered by
test_oracle_parity.py; here: planted-effect recovery, degenerate
behavior, and the invariants the hashes don't explain."""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta

import pytest

from searchengine_spark.relational.experiment import (
    BOOT_B,
    DID_SALT,
    ORACLES,
    QUERIES,
    _POIS_CDF,
)
from tests.helpers import assert_matches_oracle


def _did_treated(uid: int) -> bool:
    h = int(hashlib.md5(f"{DID_SALT}{uid}".encode()).hexdigest()[:15], 16)
    return h % 2 == 1


def test_pois_cdf_constants_are_sane():
    # thresholds are a valid CDF for Poisson(1)
    assert _POIS_CDF[0] == pytest.approx(0.367879, abs=1e-6)
    assert all(b > a for a, b in zip(_POIS_CDF, _POIS_CDF[1:]))
    assert _POIS_CDF[-1] > 0.9994


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    r = QUERIES["events_bootstrap_ci"](spark, sf_dir).collect()[0]
    assert r.n_replicates == BOOT_B
    assert r.ci_lo <= r.mean_value <= r.ci_hi
    assert r.ci_lo < r.ci_hi, "noisy data must give a non-trivial CI"


def test_bootstrap_ci_collapses_on_constant_data(spark, tmp_path_factory):
    # constant metric -> every replicate mean equals it -> zero-width CI
    ts = datetime(2024, 1, 1)
    rows = [(i, ts, i % 7, "view", 5.0, "{}") for i in range(200)]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path_factory.mktemp("bootc"))
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    r = QUERIES["events_bootstrap_ci"](spark, d).collect()[0]
    assert r.mean_value == 5.0
    assert r.ci_lo == 5.0 and r.ci_hi == 5.0
    assert_matches_oracle(
        QUERIES["events_bootstrap_ci"](spark, d),
        ORACLES["events_bootstrap_ci"],
        d,
        name="events_bootstrap_ci_planted",
    )


def test_did_recovers_planted_effect(spark, tmp_path_factory):
    # per-user baseline 10 + small spread; TREATED users get exactly
    # +8 post. True DiD = 8, control delta = 0. The baseline spread
    # cancels inside each user's delta, so per-user delta variance is
    # ZERO — the paired SE (var(post-pre)/n, round-9 ADVICE fix) must
    # report se=0 and an undefined (NULL) t, where the old
    # independent-cell formula wrongly reported finite noise from the
    # baseline spread it failed to pair away.
    t0 = datetime(2024, 1, 1)
    t1 = t0 + timedelta(days=10)
    rows = []
    eid = 0
    for u in range(80):
        base = 10.0 + (u % 5) * 0.1
        rows.append((eid, t0, u, "view", base, "{}")); eid += 1
        post = base + (8.0 if _did_treated(u) else 0.0)
        rows.append((eid, t1, u, "view", post, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path_factory.mktemp("didp"))
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    r = QUERIES["events_did_estimate"](spark, d).collect()[0]
    assert r.n_treated + r.n_control == 80
    assert r.control_delta == 0.0
    assert r.treated_delta == 8.0
    assert r.did == 8.0
    assert r.se == 0.0, "deterministic per-user deltas -> zero paired SE"
    assert r.t_stat is None, "zero SE -> undefined t, not a crash"
    assert_matches_oracle(
        QUERIES["events_did_estimate"](spark, d),
        ORACLES["events_did_estimate"],
        d,
        name="events_did_estimate_planted",
    )


def test_did_paired_se_drops_baseline_variance(spark, tmp_path_factory):
    # Same planted +8 effect but with per-user DELTA jitter and a big
    # baseline spread. The paired SE must reflect only the delta
    # jitter (t recovers the effect with high confidence); an
    # independent-cell SE would be dominated by the baseline spread
    # (~100x the jitter) and miss it.
    t0 = datetime(2024, 1, 1)
    t1 = t0 + timedelta(days=10)
    rows = []
    eid = 0
    for u in range(80):
        base = 10.0 + (u % 7) * 25.0  # baseline spread, cancels in delta
        jitter = (u % 3) * 0.3  # per-user delta noise, same law both groups
        rows.append((eid, t0, u, "view", base, "{}")); eid += 1
        post = base + jitter + (8.0 if _did_treated(u) else 0.0)
        rows.append((eid, t1, u, "view", post, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path_factory.mktemp("didj"))
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    r = QUERIES["events_did_estimate"](spark, d).collect()[0]
    assert abs(r.did - 8.0) < 0.5
    assert 0 < r.se < 0.2, "paired SE ~ delta jitter, not baseline spread"
    assert r.t_stat > 10
    assert_matches_oracle(
        QUERIES["events_did_estimate"](spark, d),
        ORACLES["events_did_estimate"],
        d,
        name="events_did_estimate_jitter",
    )


def test_did_null_effect_on_fixture(spark, sf_dir):
    # random assignment over organic data: no real effect, |t| small
    r = QUERIES["events_did_estimate"](spark, sf_dir).collect()[0]
    assert abs(r.t_stat) < 3.0
    assert r.se > 0


def test_bootstrap_plan_is_single_scan(spark, sf_dir):
    plan = (
        QUERIES["events_bootstrap_ci"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # B replicates as conditional aggs on ONE scan: no join of the
    # events table against a replicate table, no window
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_ab_power_planted_known_variance(spark, tmp_path):
    """Two users per variant with hand-computable sums: verify the
    MDE formula end to end against a pure-Python recomputation."""
    import math

    import pandas as pd

    from searchengine_spark.operators.sampling import hash_bucket
    from searchengine_spark.relational.events import CUPED_SALT
    from searchengine_spark.relational.experiment import (
        Z_ALPHA_2,
        Z_BETA,
        q_events_ab_power,
    )
    from pyspark.sql import functions as F

    # find user ids landing on each side of the md5 coin
    probe = spark.createDataFrame([(i,) for i in range(40)], "user_id long")
    sides = {
        r["user_id"]: r["v"]
        for r in probe.select(
            "user_id",
            hash_bucket(F.col("user_id"), n_buckets=2, salt=CUPED_SALT).alias("v"),
        ).collect()
    }
    a_users = [u for u, v in sides.items() if v == 0][:2]
    b_users = [u for u, v in sides.items() if v == 1][:2]
    vals = {a_users[0]: 10.0, a_users[1]: 20.0, b_users[0]: 12.0, b_users[1]: 28.0}
    pdf = pd.DataFrame(
        {
            "event_id": range(4),
            "ts": pd.to_datetime(["2024-01-01"] * 4),
            "user_id": list(vals),
            "event_type": ["view"] * 4,
            "value": list(vals.values()),
        }
    )
    d = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d}/events.parquet")
    r = q_events_ab_power(spark, d).collect()[0]
    assert r["n_a"] == 2 and r["n_b"] == 2
    # hand recompute in cents
    va = ((1000 - 1500) ** 2 + (2000 - 1500) ** 2) / 1.0
    vb = ((1200 - 2000) ** 2 + (2800 - 2000) ** 2) / 1.0
    mde = (Z_ALPHA_2 + Z_BETA) * math.sqrt(va / 2 + vb / 2) / 100.0
    assert abs(r["mde_abs"] - round(mde, 6)) < 1e-9
    assert r["mean_a"] == 15.0
    assert r["n_per_arm_for_10pct"] >= 1


def test_ab_power_real_data_sanity(spark, sf_dir):
    from searchengine_spark.relational.experiment import q_events_ab_power

    r = q_events_ab_power(spark, sf_dir).collect()[0]
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert r["mde_abs"] > 0 and 0 < r["mde_rel"]
    # more users than the fixture -> detecting 10% needs more than we have
    assert r["n_per_arm_for_10pct"] > 0
