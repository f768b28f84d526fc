"""The r14 scaled-bigint fold (operators/similarity._k12) must be
bit-identical to the historical DECIMAL(28,12) aggregate path it
replaced in emb_label_silhouette / sim_centroid_outliers: summing
CAST(round(x,12) AS DECIMAL(28,12)) then casting to double, versus
summing round(round(x,12)*1e12) bigints then dividing by 1e12 in
double. Oracle parity pins the query outputs; this pins the
building block on adversarial magnitudes (including negatives and
values near the rounding boundary)."""

from pyspark.sql import functions as F


def test_k12_fold_matches_decimal_sum(spark):
    from searchengine_spark.operators.similarity import _K12_SCALE, _k12

    # Deterministic pseudo-random doubles in roughly [-4, 4] — the
    # magnitude range of centroid products in the audits.
    vals = spark.range(5000).select(
        "id",
        (
            (F.pmod(F.col("id") * 2654435761, F.lit(100003)) - F.lit(50001))
            / F.lit(12503.0)
        ).alias("x"),
        F.pmod(F.col("id"), F.lit(16)).alias("g"),
    )
    per = vals.select(
        "g",
        F.round(F.col("x") * F.col("x"), 12)
        .cast("decimal(28,12)")
        .alias("dec"),
        _k12(F.col("x") * F.col("x")).alias("k"),
    )
    agg = per.groupBy("g").agg(
        F.sum("dec").cast("double").alias("via_decimal"),
        (F.sum("k").cast("double") / F.lit(_K12_SCALE)).alias("via_bigint"),
    )
    rows = agg.collect()
    assert len(rows) == 16
    for r in rows:
        assert r["via_decimal"] == r["via_bigint"], r

    # per-element unscaled equality too (k == dec * 1e12 exactly)
    bad = per.filter(
        F.col("dec") != (F.col("k").cast("decimal(28,12)") / F.lit(_K12_SCALE)).cast("decimal(28,12)")
    ).count()
    assert bad == 0
