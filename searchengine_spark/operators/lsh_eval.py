"""LSH self-audit: measured recall of MinHash banding vs exact truth.

The banded MinHash join (operators/dedup.py) is probabilistic — its
S-curve leaves a known false-negative rate near the threshold. This
operator MEASURES it on the corpus: ground truth from the exact
prefix-filtered set join (operators/setjoin.py, provably lossless),
candidates from the banding, recall = |caught| / |true|. At 100 TB
you run this on a sampled stratum to pick NUM_HASHES/BAND_SIZE before
committing a full dedup pass — the standard tuning loop for any
sketch-based pipeline, here as one query whose number the driver
hash-checks against a DuckDB twin (brute-force truth + the same
banding arithmetic).

The audited banding is the PRODUCTION one: hot buckets above
``max_bucket`` (default AUDIT_MAX_BUCKET, matching
pipeline.CURATE_MAX_BUCKET) are excluded from candidate generation,
exactly as ``pipeline.curate`` runs it — so the recall number the
audit reports is the recall a real curation run would see, not the
recall of an uncapped variant nobody deploys. ``n_hot_buckets``
surfaces how many buckets the cap excluded (0 on clean corpora).

Scale shape: both inputs reuse the session shingle cache; the audit
adds one semi-join keyed on (doc_a, doc_b) and three 1-row aggregates
(combined lazily via broadcast crossJoin — no collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.operators.dedup import (
    _BANDS_CTE,
    hot_buckets,
    minhash_bands,
    neardup_candidate_pairs,
)
from searchengine_spark.operators.setjoin import T_DEN, T_NUM, prefix_jaccard_pairs

# Same production cap as pipeline.CURATE_MAX_BUCKET (kept as a local
# constant so the modules stay import-independent; a test pins them
# equal). Far above any fixture dup-group, so fixture recall is
# unchanged — the cap exists for the boilerplate detonation case.
AUDIT_MAX_BUCKET = 64


def lsh_recall(
    shingles: DataFrame,
    *,
    max_bucket: int | None = AUDIT_MAX_BUCKET,
    bands: DataFrame | None = None,
    cands: DataFrame | None = None,
    true_pairs: DataFrame | None = None,
) -> DataFrame:
    """``bands``/``cands``/``true_pairs``: pass precomputed (cached)
    stages to share them with the rest of the dedup family — the
    registry entry point reuses the session caches; callers passing
    only ``shingles`` get the self-contained derivation."""
    if true_pairs is None:
        true_pairs = prefix_jaccard_pairs(shingles)
    true_pairs = true_pairs.select("doc_a", "doc_b")
    if bands is None:
        bands = minhash_bands(shingles=shingles)
    if cands is None:
        cands = neardup_candidate_pairs(bands, max_bucket=max_bucket)
    caught = true_pairs.join(cands, ["doc_a", "doc_b"], "left_semi")
    n_true = true_pairs.agg(F.count(F.lit(1)).alias("n_true"))
    n_cand = cands.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_caught = caught.agg(F.count(F.lit(1)).alias("n_caught"))
    n_hot = (
        hot_buckets(bands, max_bucket) if max_bucket is not None else bands.limit(0)
    ).agg(F.count(F.lit(1)).alias("n_hot_buckets"))
    return (
        n_true.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_caught))
        .crossJoin(F.broadcast(n_hot))
        .select(
            "n_true",
            "n_candidates",
            "n_caught",
            F.when(
                F.col("n_true") > 0,
                F.round(
                    F.col("n_caught").cast("double")
                    / F.col("n_true").cast("double"),
                    6,
                ),
            ).alias("lsh_recall"),
            "n_hot_buckets",
        )
    )


def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AUDIT_MAX_BUCKET == dedup.DEFAULT_MAX_BUCKET (pinned by test),
    # so the audited candidate set IS the shared session-cached one.
    from searchengine_spark.operators.dedup import (
        _bands,
        _capped_pairs,
        _shingles,
    )
    from searchengine_spark.operators.setjoin import _true_pairs

    return lsh_recall(
        _shingles(spark, sf_dir),
        bands=_bands(spark, sf_dir),
        cands=_capped_pairs(spark, sf_dir),
        true_pairs=_true_pairs(spark, sf_dir),
    )


_RECALL_SQL = f"""{_BANDS_CTE},
sized AS (
  SELECT doc_id, band, band_hash,
         COUNT(*) OVER (PARTITION BY band, band_hash) AS bsz
  FROM bands
),
keepb AS (
  SELECT doc_id, band, band_hash FROM sized WHERE bsz <= {AUDIT_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keepb a JOIN keepb b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
sets AS (
  SELECT doc_id, list_distinct(shingles) AS s FROM sh
),
truep AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
  WHERE {T_DEN} * len(list_intersect(a.s, b.s))
        >= {T_NUM} * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
),
caught AS (
  SELECT t.doc_a, t.doc_b FROM truep t
  JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
)
SELECT (SELECT count(*) FROM truep)::BIGINT AS n_true,
       (SELECT count(*) FROM cand)::BIGINT AS n_candidates,
       (SELECT count(*) FROM caught)::BIGINT AS n_caught,
       CASE WHEN (SELECT count(*) FROM truep) > 0 THEN
         round(CAST((SELECT count(*) FROM caught) AS DOUBLE)
               / CAST((SELECT count(*) FROM truep) AS DOUBLE), 6)
       END AS lsh_recall,
       (SELECT count(*) FROM (
          SELECT band, band_hash FROM bands
          GROUP BY band, band_hash HAVING COUNT(*) > {AUDIT_MAX_BUCKET}
       ))::BIGINT AS n_hot_buckets
"""

QUERIES = {"dedup_lsh_recall_audit": q_lsh_recall}
ORACLES = {"dedup_lsh_recall_audit": _RECALL_SQL}
