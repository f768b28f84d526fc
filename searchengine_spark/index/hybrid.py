"""Hybrid search: reciprocal-rank fusion of BM25 and embedding cosine.

The modern retrieval stack pairs a lexical ranker (BM25, exact term
match — this repo's `index/bm25.py`) with a semantic one (embedding
cosine — `operators/similarity.py`) and fuses the two rank lists with
RRF (Cormack et al., SIGIR 2009):

    rrf(d) = sum over lists L of 1 / (K + rank_L(d))

K = 60 is the published default. RRF needs only RANKS, not
comparable scores — which is the whole point: BM25 scores and
cosines live on unrelated scales.

Scale shape: each retriever produces its top-N via
TakeOrderedAndProject (distributed partial top-k per partition, no
global sort); the rank assignment then runs a window over the tiny
N-row fused frame (driver-scale, not data-scale). The fusion itself
is a full-outer equi-join of two N-row lists. At 100 TB the semantic
side swaps brute-force cosine for the IVF probe path
(`operators/ann.ivf_search_pruned`) — same (doc_id, rank-list)
contract, so the fusion is untouched.

Determinism: both retrievers rank on scores ROUNDED to 6 with
doc_id tiebreak (the established cross-engine convention), so ranks
— and therefore the fused scores — are bit-identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.index.queries import (
    BM25_SCORED_CTE,
    _INDEX_CTES,
    q_bm25_scores,
)
from searchengine_spark.operators.similarity import QUERY_VEC_ID, cosine_expr

RRF_K = 60     # the SIGIR'09 constant
FUSE_N = 50    # depth of each retriever's rank list
HYBRID_K = 10


def _ranked(df: DataFrame, score_col: str, id_col: str, n: int) -> DataFrame:
    """Top-n by (score desc, id asc), then 1-based ranks.

    limit(n) plans as TakeOrderedAndProject; the row_number window
    runs over the surviving n rows only — never a data-scale sort."""
    top = df.orderBy(F.desc(score_col), F.asc(id_col)).limit(n)
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return top.select(F.col(id_col), F.row_number().over(w).alias("rank"))


def rrf_fuse(
    lists: list[DataFrame], *, id_col: str = "doc_id", k: int = RRF_K
) -> DataFrame:
    """Full-outer fuse of (id, rank) lists into (id, rrf_score).

    A doc absent from a list contributes 0 for it (the standard RRF
    convention for truncated lists)."""
    fused = None
    for i, lst in enumerate(lists):
        cur = lst.select(F.col(id_col), F.col("rank").alias(f"_r{i}"))
        fused = cur if fused is None else fused.join(cur, id_col, "full_outer")
    score = None
    for i in range(len(lists)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"_r{i}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return fused.select(F.col(id_col), F.round(score, 6).alias("rrf_score"))


# --------------------------------------------------------------- queries

def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-50 + cosine top-50 -> RRF -> top-10."""
    lex = _ranked(q_bm25_scores(spark, sf_dir), "total_score", "doc_id", FUSE_N)

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    sem_scores = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_expr(F.col("embedding"), F.col("qvec")), 6).alias(
                "cosine"
            ),
        )
    )
    sem = _ranked(sem_scores, "cosine", "doc_id", FUSE_N)

    return (
        rrf_fuse([lex, sem])
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(HYBRID_K)
    )


QUERIES = {"se_hybrid_rrf_topk": q_hybrid_rrf_topk}

ORACLES = {
    "se_hybrid_rrf_topk": f"""{_INDEX_CTES}{BM25_SCORED_CTE},
        lex AS (
          SELECT doc_id, round(sum(term_score), 6) AS s
          FROM scored GROUP BY doc_id
        ),
        lexr AS (
          SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r
          FROM lex QUALIFY r <= {FUSE_N}
        ),
        q AS (
          SELECT embedding::DOUBLE[] AS e FROM embeddings
          WHERE vec_id = {QUERY_VEC_ID}
        ),
        sem AS (
          SELECT l.vec_id AS doc_id,
                 round(list_dot_product(l.e, q.e) /
                       (sqrt(list_dot_product(l.e, l.e)) *
                        sqrt(list_dot_product(q.e, q.e))), 6) AS c
          FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
                WHERE vec_id <> {QUERY_VEC_ID}) l, q
        ),
        semr AS (
          SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id ASC) AS r
          FROM sem QUALIFY r <= {FUSE_N}
        )
        SELECT COALESCE(lexr.doc_id, semr.doc_id) AS doc_id,
               round(COALESCE(1.0 / ({RRF_K} + lexr.r), 0)
                     + COALESCE(1.0 / ({RRF_K} + semr.r), 0), 6) AS rrf_score
        FROM lexr FULL OUTER JOIN semr ON lexr.doc_id = semr.doc_id
        ORDER BY rrf_score DESC, doc_id ASC
        LIMIT {HYBRID_K}
    """,
}
