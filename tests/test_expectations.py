"""Data-quality expectations: violations detected, one-job plan."""

from searchengine_spark.operators.expectations import (
    completeness,
    in_set,
    min_rows,
    non_negative,
    run_checks,
    uniqueness,
)


def test_violations_detected_precisely(spark):
    rows = [
        (1, "A", 5.0),
        (2, "A", -1.0),   # negative
        (2, "B", 3.0),    # duplicate key
        (None, "Z", 2.0), # null key + bad enum
    ]
    df = spark.createDataFrame(rows, "k long, status string, price double")
    got = {
        r["constraint"]: (r["metric"], r["passed"])
        for r in run_checks(
            df,
            [
                completeness("k"),
                uniqueness("k"),
                non_negative("price"),
                in_set("status", ["A", "B"]),
                min_rows(3),
            ],
        ).collect()
    }
    assert got["completeness_k"] == (0.75, False)
    # 2 distinct non-null keys over 4 rows
    assert got["uniqueness_k"] == (0.5, False)
    assert got["non_negative_price"] == (1.0, False)
    assert got["in_set_status"] == (1.0, False)
    assert got["min_rows"] == (4.0, True)


def test_clean_table_passes_everything(spark):
    df = spark.createDataFrame(
        [(i, "A", float(i)) for i in range(10)], "k long, status string, price double"
    )
    got = run_checks(
        df,
        [completeness("k"), uniqueness("k"), non_negative("price"),
         in_set("status", ["A"]), min_rows(10)],
    ).collect()
    assert all(r["passed"] for r in got)


def test_single_aggregation_job(spark):
    df = spark.createDataFrame([(1, "A", 1.0)], "k long, status string, price double")
    out = run_checks(df, [completeness("k"), uniqueness("k"), min_rows(1)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one aggregation pass: no join, no extra scan beyond the input
    assert plan.count("Scan ") <= 1 and "Join" not in plan


def test_events_expectations_all_pass_and_match_oracle(spark, sf_dir):
    """Temporal DQ on the streaming-source table: every constraint
    (incl. the event-time month bound) passes on clean testdata, and
    the verdict frame hash-matches."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators import expectations as X
    from tests.helpers import assert_matches_oracle

    df = X.q_events_expectations(spark, sf_dir).cache()
    assert df.count() == 7
    assert df.filter(~F.col("passed")).count() == 0
    assert_matches_oracle(
        df,
        X.ORACLES["dq_events_expectations"],
        sf_dir,
        name="dq_events_expectations",
    )
    df.unpersist()


def test_ts_in_range_catches_epoch_default(spark):
    """A 1970 epoch-default timestamp must trip the temporal check."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators import expectations as X

    df = spark.createDataFrame(
        [(1, 1704100000), (2, 0)], ["event_id", "secs"]
    )
    out = X.run_checks(
        df,
        [X.ts_in_range(F.col("secs"), "ts_in_month",
                       X.EVENTS_TS_LO, X.EVENTS_TS_HI)],
    ).collect()[0]
    assert out["metric"] == 1.0 and not out["passed"]
