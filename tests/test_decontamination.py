"""Decontamination: planted overlap is found, boilerplate shingles
don't count, threshold respected."""

from pyspark.sql import functions as F

from searchengine_spark.operators.decontamination import contamination_pairs
from searchengine_spark.operators.dedup import shingle_frame
from searchengine_spark.operators.sampling import N_BUCKETS, hash_bucket


def _pairs(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    return contamination_pairs(shingle_frame(docs), **kw)


def _eval_id(spark, salt="evalset", frac=0.5):
    """Find small doc_ids that land in the eval bucket for frac."""
    cutoff = int(frac * N_BUCKETS)
    df = spark.range(0, 50).select(
        F.col("id"), (hash_bucket(F.col("id"), salt=salt) < cutoff).alias("ev")
    )
    rows = {r.id: r.ev for r in df.collect()}
    ev = [i for i, e in rows.items() if e]
    tr = [i for i, e in rows.items() if not e]
    return ev, tr


def test_planted_overlap_detected(spark):
    ev, tr = _eval_id(spark)
    shared = "alpha bravo charlie delta echo foxtrot"
    rows = [
        (ev[0], f"{shared} golf hotel india"),
        (tr[0], f"{shared} juliet kilo lima"),
        (tr[1], "mike november oscar papa quebec romeo sierra"),
    ]
    out = _pairs(spark, rows, eval_fraction=0.5).collect()
    assert [(r.train_doc_id, r.eval_doc_id) for r in out] == [(tr[0], ev[0])]
    # "alpha bravo charlie ... foxtrot" = 6 tokens -> 4 shared shingles
    assert out[0].n_shared == 4


def test_boilerplate_shingles_excluded(spark):
    ev, tr = _eval_id(spark)
    boiler = "terms of service apply here always"
    # boilerplate present in MANY train docs -> df cap excludes it.
    rows = [(ev[0], boiler + " unique ending one")]
    rows += [(tr[i], boiler + f" {'x' * (i + 1)} y z") for i in range(6)]
    out = _pairs(spark, rows, eval_fraction=0.5, max_shingle_df=3).collect()
    assert out == []


def test_min_shared_threshold(spark):
    ev, tr = _eval_id(spark)
    # Exactly ONE shared shingle (3 shared tokens) < MIN_SHARED=2.
    rows = [
        (ev[0], "red green blue purple orange"),
        (tr[0], "red green blue yellow cyan"),
    ]
    assert _pairs(spark, rows, eval_fraction=0.5, min_shared=2).collect() == []
    got = _pairs(spark, rows, eval_fraction=0.5, min_shared=1).collect()
    assert [(r.train_doc_id, r.eval_doc_id, r.n_shared) for r in got] == [
        (tr[0], ev[0], 1)
    ]


def test_bloom_variant_matches_exact_and_prunes(spark, sf_dir):
    """The Bloom-prefiltered scale path must be byte-identical to the
    exact join on real corpus data, and the prefilter must actually
    prune (engagement counter: bloomed train shingle rows < raw train
    shingle rows — the map-side semi-join the operator exists for)."""
    from searchengine_spark.io import load_table
    from searchengine_spark.operators.bloom import bloom_build, bloom_prefilter
    from searchengine_spark.operators.decontamination import (
        EVAL_FRACTION,
        EVAL_SALT,
        bloom_contamination_pairs,
    )
    from searchengine_spark.operators.sampling import N_BUCKETS, hash_bucket

    sh = shingle_frame(load_table(spark, sf_dir, "documents")).cache()
    exact = {
        (r["train_doc_id"], r["eval_doc_id"], r["n_shared"])
        for r in contamination_pairs(sh).collect()
    }
    bloomed = {
        (r["train_doc_id"], r["eval_doc_id"], r["n_shared"])
        for r in bloom_contamination_pairs(sh).collect()
    }
    assert bloomed == exact, "bloom prefilter changed the pair set"

    cutoff = int(EVAL_FRACTION * N_BUCKETS)
    flat = sh.select(
        "doc_id",
        (hash_bucket(F.col("doc_id"), salt=EVAL_SALT) < cutoff).alias(
            "is_eval"
        ),
        F.explode(F.array_distinct("shingles")).alias("s"),
    ).cache()
    ev = flat.filter(F.col("is_eval")).select("s")
    words, m_bits = bloom_build(ev, "s")
    train = flat.filter(~F.col("is_eval"))
    raw = train.count()
    kept = bloom_prefilter(train, "s", words, m_bits).count()
    assert kept < raw // 2, (
        f"bloom kept {kept}/{raw} train shingle rows — no pruning"
    )
