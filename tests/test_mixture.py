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
