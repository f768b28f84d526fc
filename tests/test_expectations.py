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
