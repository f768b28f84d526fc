"""TF-IDF document similarity (operators/text_sim.py).

Oracle parity runs in test_oracle_parity; here: planted-near-dup
recall, the df-cap actually dropping hot features, probe-path plan
shape (broadcast join, no shuffle of the probe side), and the
exact-integer determinism claim.
"""

from pyspark.sql import functions as F

from searchengine_spark.operators.dedup import shingle_frame
from searchengine_spark.operators.text_sim import (
    DF_CAP,
    _weights,
    tfidf_probe_topk,
    tfidf_shingle_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_planted_near_duplicate_pair_found(spark):
    base = (
        "quick brown foxes jump over lazy dogs near quiet rivers every "
        "morning while distant mountains hold ancient forests full of "
        "hidden creatures singing strange songs under golden autumn skies"
    )
    edited = base.replace("quiet", "silent")
    fillers = [
        "completely different subject matter about spark engines",
        "gardening tips tulip bulbs prefer cool dry soil conditions",
        "orchestral music blends strings brass woodwind percussion families",
        "sailing requires wind charts tide tables careful navigation",
        "volcanic islands form along tectonic plate boundary zones",
        "chess openings trade tempo material positional advantage slowly",
        "bread baking needs patient kneading long fermentation times",
        "marathon training builds aerobic capacity through weekly mileage",
        "glass blowing shapes molten silica with breath precision",
        "beekeeping hives produce honey wax propolis royal jelly",
    ]
    rows = [(0, base), (1, edited)] + list(enumerate(fillers, start=2))
    docs = _docs(spark, rows)
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    pairs = tfidf_shingle_pairs(shingle_frame(docs), n, min_cos=0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in found
    got = next(r for r in pairs if (r["doc_a"], r["doc_b"]) == (0, 1))
    assert got["cosine"] > 0.6


def test_unrelated_docs_produce_no_pairs(spark):
    # NB: unique suffix letters, not digits — digits are tokenizer
    # delimiters, so "alpha0".."alpha7" would all collapse to "alpha"
    # and make every doc identical (zero-idf, zero-norm).
    rows = [
        (i, " ".join(f"{wrd}{suf}" for wrd in ("alpha", "beta", "gamma", "delta", "epsilon")))
        for i, suf in enumerate("bcdfghjk")
    ]
    docs = _docs(spark, rows)
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    assert tfidf_shingle_pairs(shingle_frame(docs), n).count() == 0


def test_df_cap_drops_boilerplate_features(spark):
    """A feature present in > DF_CAP docs must not appear in the
    capped weight table."""
    rows = [
        (i, f"shared boiler plate header text unique{i} tail{i} words{i}")
        for i in range(DF_CAP + 5)
    ]
    docs = _docs(spark, rows)
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    tf = (
        shingle_frame(docs)
        .select("doc_id", F.explode("shingles").alias("feature"))
        .groupBy("doc_id", "feature")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = _weights(tf, n)
    hot = (
        w.groupBy("feature")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > DF_CAP)
    )
    assert hot.count() == 0
    # and uncapped mode keeps them
    assert (
        _weights(tf, n, df_cap=None)
        .groupBy("feature")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > DF_CAP)
        .count()
        > 0
    )


def test_probe_plan_broadcasts_probe_vector(spark, sf_dir):
    from searchengine_spark.io import load_table

    from searchengine_spark.operators.text_sim import tfidf_probe_topk_plan

    docs = load_table(spark, sf_dir, "documents")
    # plan-shape assertion reads the LAZY side; the public
    # tfidf_probe_topk eagerly cuts lineage and releases scratch
    # persists (r14), so its returned plan is a checkpoint scan.
    lazy, scratch = tfidf_probe_topk_plan(docs)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    for frame in scratch:
        frame.unpersist()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_weights_are_exact_integers(spark, sf_dir):
    """The fixed-point contract: every weight, dot, and norm is a
    bigint — the dtype IS the determinism argument."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    pairs = tfidf_shingle_pairs(shingle_frame(docs), n)
    schema = {f.name: f.dataType.simpleString() for f in pairs.schema.fields}
    assert schema["shared_features"] == "bigint"
    assert schema["cosine"] == "double"
