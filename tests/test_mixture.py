"""Mixture resampling: composition converges to target weights,
selection is deterministic/stable, unweighted groups drop."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.mixture import mixture_resample


def _docs(spark, groups):
    # groups: dict group -> count; ids globally unique
    rows, i = [], 0
    for g, n in groups.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, source string")


def test_composition_matches_weights(spark):
    df = _docs(spark, {"a": 4000, "b": 4000})
    out = mixture_resample(df, "source", {"a": 3.0, "b": 1.0}, "doc_id")
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    # scale = min(4000/3, 4000/1) = 1333.3; targets ~ 4000 and ~1333.
    assert got["a"] == pytest.approx(4000, rel=0.05)
    assert got["b"] == pytest.approx(4000 / 3, rel=0.1)


def test_deterministic_and_subset_stable(spark):
    df = _docs(spark, {"a": 1000, "b": 1000})
    w = {"a": 1.0, "b": 1.0}
    first = {r.doc_id for r in mixture_resample(df, "source", w, "doc_id").collect()}
    second = {r.doc_id for r in mixture_resample(df, "source", w, "doc_id").collect()}
    assert first == second
    # Equal weights + equal counts -> rates ~1.0: nothing dropped
    # beyond the floor() boundary epsilon.
    assert len(first) >= 0.999 * 2000


def test_unweighted_group_dropped(spark):
    df = _docs(spark, {"a": 100, "junk": 100})
    out = mixture_resample(df, "source", {"a": 1.0}, "doc_id")
    assert out.filter(F.col("source") == "junk").count() == 0


def test_argmin_group_kept_nearly_whole(spark):
    df = _docs(spark, {"rare": 200, "common": 2000})
    out = mixture_resample(
        df, "source", {"rare": 1.0, "common": 1.0}, "doc_id"
    )
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    # rare is the binding constraint: keep ~all of it; common sampled to match.
    assert got["rare"] >= 195
    assert got["common"] == pytest.approx(200, rel=0.15)


def test_temperature_flattens_toward_alpha_distribution(spark):
    from searchengine_spark.operators.mixture import temperature_resample

    df = _docs(spark, {"en": 4000, "fr": 500, "de": 500})
    out = temperature_resample(df, "source", "doc_id", alpha=0.3)
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    # targets: p^0.3 normalized over (0.8, 0.1, 0.1) -> (0.47, 0.26, 0.26)
    # with the tail groups as the binding constraint (kept ~whole)
    assert got["fr"] >= 490 and got["de"] >= 490
    # en drops from 8x the tail to ~1.8x of it
    assert got["en"] == pytest.approx(1.8 * got["fr"], rel=0.15)


def test_temperature_resample_matches_oracle(spark, sf_dir):
    from searchengine_spark.operators.mixture import ORACLES, q_temperature_resample
    from tests.helpers import assert_matches_oracle

    df = q_temperature_resample(spark, sf_dir)
    # non-degenerate: something was actually dropped, en most of all
    from searchengine_spark.io import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert 0 < df.count() < n_docs
    assert_matches_oracle(
        df,
        ORACLES["mix_temperature_resample"],
        sf_dir,
        name="mix_temperature_resample",
    )
