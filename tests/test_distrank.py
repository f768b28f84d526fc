"""distrank.distributed_rank — the two-level bucket prefix-sum rank.

Three proof obligations (the round-8 verdict's `weak` family):
1. rank-identity: exactly ROW_NUMBER() OVER (PARTITION BY g ORDER BY
   o) on a PLANTED ONE-GIANT-GROUP frame (the shape local soak cannot
   expose — group count doesn't grow with replication);
2. plan pins: at every adopted call site the big row_number Window is
   partitioned by (group, _db) — never by the group alone, which
   would sort a whole source/stratum in one task;
3. max_rank pruning keeps the surviving row set identical.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from searchengine_spark.operators.distrank import distributed_rank, range_bucket


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def giant_group(spark):
    """3,000 rows in one source, 10 in the other — the one-giant-group
    shape where a naive per-group window serializes on a single task."""
    rows = [(i, "giant", (i * 7919) % 997) for i in range(3000)]
    rows += [(10_000 + i, "tiny", i) for i in range(10)]
    return spark.createDataFrame(rows, "id long, src string, v long").cache()


def _expected_ranks(df, order_cols):
    w = Window.partitionBy("src").orderBy(*order_cols)
    return {
        (r["src"], r["id"]): r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }


def test_rank_identity_desc_with_ties(spark, giant_group):
    # v has heavy ties ((i*7919) % 997 cycles), so tie handling across
    # bucket boundaries is genuinely exercised
    ext, bucket = range_bucket(giant_group, "v", n_buckets=64, descending=True)
    got = distributed_rank(
        ext, ["src"], [F.desc("v"), F.asc("id")], bucket, rank_name="rk"
    )
    expected = _expected_ranks(giant_group, [F.desc("v"), F.asc("id")])
    actual = {(r["src"], r["id"]): r["rk"] for r in got.collect()}
    assert actual == expected


def test_rank_identity_asc(spark, giant_group):
    ext, bucket = range_bucket(giant_group, "v", n_buckets=64)
    got = distributed_rank(
        ext, ["src"], [F.asc("v"), F.asc("id")], bucket, rank_name="rk"
    )
    expected = _expected_ranks(giant_group, [F.asc("v"), F.asc("id")])
    actual = {(r["src"], r["id"]): r["rk"] for r in got.collect()}
    assert actual == expected


def test_max_rank_prunes_but_keeps_survivors_identical(spark, giant_group):
    ext, bucket = range_bucket(giant_group, "v", n_buckets=64)
    full = distributed_rank(
        ext, ["src"], [F.asc("v"), F.asc("id")], bucket, rank_name="rk"
    )
    pruned = distributed_rank(
        ext, ["src"], [F.asc("v"), F.asc("id")], bucket, rank_name="rk",
        max_rank=25,
    )
    want = {
        (r["src"], r["id"]): r["rk"]
        for r in full.filter(F.col("rk") <= 25).collect()
    }
    got = {
        (r["src"], r["id"]): r["rk"]
        for r in pruned.filter(F.col("rk") <= 25).collect()
    }
    assert got == want
    assert sum(v == 25 for v in got.values()) == 1  # giant reaches 25
    assert sum(1 for (s, _) in got if s == "tiny") == 10  # tiny kept whole
    # pruning really dropped work: far fewer rows ever reached the window
    assert pruned.count() < 3010


def test_group_count_matches(spark, giant_group):
    ext, bucket = range_bucket(giant_group, "v", n_buckets=64)
    got = distributed_rank(
        ext, ["src"], [F.asc("v"), F.asc("id")], bucket, rank_name="rk",
        group_count_name="gn",
    )
    per = {r["src"]: r["gn"] for r in got.select("src", "gn").distinct().collect()}
    assert per == {"giant": 3000, "tiny": 10}


def test_range_bucket_is_monotone_and_bounded(spark, giant_group):
    ext, bucket = range_bucket(giant_group, "v", n_buckets=64, descending=True)
    rows = ext.select("v", bucket.alias("b")).distinct().collect()
    assert all(0 <= r["b"] < 64 for r in rows)
    by_v = sorted(rows, key=lambda r: -r["v"])
    bs = [r["b"] for r in by_v]
    assert bs == sorted(bs), "bucket must be non-decreasing along v DESC"


# ------------------------------------------------ plan pins per site

_RN_SPEC = re.compile(r"row_number\(\) windowspecdefinition\(([^)]*)\)")


def _big_rownum_specs(plan: str) -> list[str]:
    """Partition+order args of every row_number window in the plan."""
    return [m.group(1) for m in _RN_SPEC.finditer(plan)]


def test_curriculum_plan_windows_key_on_bucket(spark, sf_dir):
    from searchengine_spark.operators.mixture import QUERIES

    plan = _plan(QUERIES["mix_curriculum_interleave"](spark, sf_dir))
    specs = _big_rownum_specs(plan)
    data_specs = [s for s in specs if "n_chars" in s]
    assert data_specs, "expected the curriculum rank window in the plan"
    for s in data_specs:
        assert "_db#" in s, f"corpus window sorts a whole source in one task: {s}"


def test_stratified_plan_windows_key_on_bucket(spark, sf_dir):
    from searchengine_spark.operators.sampling import QUERIES

    plan = _plan(QUERIES["sample_stratified_exact"](spark, sf_dir))
    specs = _big_rownum_specs(plan)
    assert specs, "expected the md5-rank window in the plan"
    for s in specs:
        assert "_db#" in s, f"stratum window sorts a whole stratum in one task: {s}"


def test_quota_plan_windows_key_on_bucket(spark, sf_dir):
    from searchengine_spark.operators.sampling import QUERIES

    plan = _plan(QUERIES["sample_source_quota"](spark, sf_dir))
    specs = _big_rownum_specs(plan)
    assert specs, "expected the quota rank window in the plan"
    for s in specs:
        assert "_db#" in s, f"quota window sorts a whole source in one task: {s}"


def test_kmv_sketch_plan_windows_key_on_bucket(spark, sf_dir):
    from searchengine_spark.operators.approx import QUERIES

    plan = _plan(QUERIES["approx_kmv_distinct_users"](spark, sf_dir))
    specs = _big_rownum_specs(plan)
    assert specs, "expected the K-smallest rank window"
    for s in specs:
        assert "_db#" in s, f"KMV sorts a whole event type in one task: {s}"


def test_quality_calibration_plan_windows_key_on_bucket(spark, sf_dir):
    from searchengine_spark.text.quality import QUERIES

    plan = _plan(QUERIES["text_quality_calibrated"](spark, sf_dir))
    assert "percent_rank" not in plan
    specs = re.findall(r"rank\(\w+#\d+\) windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the per-source RANK window"
    for s in specs:
        assert "_db#" in s, f"calibration sorts a whole source in one task: {s}"


def test_rank_method_matches_plain_rank_with_ties(spark):
    # heavy ties: rank() semantics must survive the bucket decomposition
    rows = [(i, "g", (i * 3) % 7) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, src string, v long")
    ext, bucket = range_bucket(df, "v", n_buckets=4)
    got = {
        r["id"]: r["rk"]
        for r in distributed_rank(
            ext, ["src"], [F.asc("v")], bucket, rank_name="rk", method="rank"
        ).collect()
    }
    w = Window.partitionBy("src").orderBy(F.asc("v"))
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn("rk", F.rank().over(w)).collect()
    }
    assert got == want


def test_skew_profile_plan_has_no_per_key_rank(spark, sf_dir):
    from searchengine_spark.operators.skew import QUERIES

    plan = _plan(QUERIES["skew_key_profile"](spark, sf_dir))
    # per-key ranks are never materialized: the only window runs over
    # the count-value histogram; top-10 is a TakeOrderedAndProject
    assert "row_number" not in plan
    assert "TakeOrderedAndProject(limit=10" in plan
