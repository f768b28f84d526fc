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


def test_embeddings_expectations_all_pass_and_match_oracle(spark, sf_dir):
    """Vector DQ: dims, NaNs, norm band, id uniqueness all clean on
    testdata, verdict frame hash-matches."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators import expectations as X
    from tests.helpers import assert_matches_oracle

    df = X.q_embeddings_expectations(spark, sf_dir).cache()
    assert df.count() == 6
    assert df.filter(~F.col("passed")).count() == 0
    assert_matches_oracle(
        df,
        X.ORACLES["dq_embeddings_expectations"],
        sf_dir,
        name="dq_embeddings_expectations",
    )
    df.unpersist()


def test_vector_dq_catches_broken_encoder_outputs(spark):
    """Planted defects: a NaN element, a short vector, and a zero
    vector must each trip exactly their check."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators import expectations as X

    rows = [
        (1, [0.125] * 64),  # norm-sq = 1.0
        (2, [float("nan")] + [0.125] * 63),  # NaN
        (3, [1.0] * 8),  # wrong dim (also off-norm: 8.0)
        (4, [0.0] * 64),  # zero vector -> norm band
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    import searchengine_spark.operators.expectations as XX
    import searchengine_spark.io as io_mod

    orig = io_mod.load_table
    # drive the query body directly on the planted frame
    norm_sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    ev = emb.select(
        "vec_id",
        "embedding",
        norm_sq.alias("_nsq"),
        F.exists("embedding", lambda x: F.isnan(x)).alias("_nan"),
    )
    got = {
        r["constraint"]: r
        for r in X.run_checks(
            ev,
            [
                X.Check(
                    "dim_is_expected",
                    F.sum(F.when(F.size("embedding") != X.EMB_DIM_EXPECTED, 1).otherwise(0)),
                    F.col("m_dim_is_expected") == 0.0,
                ),
                X.Check(
                    "no_nan_elements",
                    F.sum(F.when(F.col("_nan"), 1).otherwise(0)),
                    F.col("m_no_nan_elements") == 0.0,
                ),
                X.Check(
                    "unit_norm_band",
                    F.sum(
                        F.when(
                            (F.col("_nsq") < X.EMB_NORM_LO)
                            | (F.col("_nsq") > X.EMB_NORM_HI),
                            1,
                        ).otherwise(0)
                    ),
                    F.col("m_unit_norm_band") == 0.0,
                ),
            ],
        ).collect()
    }
    assert got["dim_is_expected"]["metric"] == 1.0  # vec 3
    assert got["no_nan_elements"]["metric"] == 1.0  # vec 2
    # vec 3 (8.0) and vec 4 (0.0) break the band; vec 2's NaN norm
    # ALSO trips it — Spark and DuckDB both order NaN above every
    # number, so `NaN > hi` is true in both engines (consistent)
    assert got["unit_norm_band"]["metric"] == 3.0
    assert not got["unit_norm_band"]["passed"]
