"""RAG chunk-retrieval recall audit: does retrieving fixed-size
CHUNKS find the same documents as retrieving whole documents?

The standard RAG design question — chunking improves passage
precision but can lose whole-document recall (a doc whose evidence
is spread across chunks scores lower per-chunk). This audit runs the
SAME BM25 machinery twice — once over documents, once over
``text.chunking.chunk_documents`` windows — maps the top chunks back
to their parent documents, and reports per-query overlap with the
doc-level top-k. No new retrieval code: both sides are the shared
``build_index``/``search_many`` path (reference parity: the
reference scores whole documents only — searchenginespark.py's
rank_bm25 corpus is one row per document; chunk-granularity
retrieval is the extension that makes it a RAG corpus engine).

Scale shape: the chunk index is the same keyed-aggregate build as
the doc index (chunks fan out ~n_tokens/stride rows per doc, still
corpus-linear); both searches are IN-list posting joins + per-query
window top-k. The parent-doc map is integer division on the chunk
gid — no join. Session-cached like the doc index, so repeated
queries pay the build once.

Oracle: both index derivations share `queries.index_body_sql` (the
chunk side under prefix 'c'), the chunk definition is chunking's
`_CHUNKS_SQL` grid, and the BM25 arithmetic is restated with the
same K1/B constants — every stage of both retrievals is recomputed
in DuckDB and the overlap math is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Chunk gid = doc_id * CHUNK_GID_BASE + chunk_id. chunk_id <
# CHUNK_GID_BASE always: chunk_id <= n_tokens/stride and a document
# is orders of magnitude shorter than CHUNK_GID_BASE * stride tokens
# (same bound argument as chunking.chunk_exact_dedup's 1024 encode).
CHUNK_GID_BASE = 10_000
RAG_CHUNK_K = 20  # chunk hits per query, mapped down to parent docs


def _chunk_index(spark: SparkSession, sf_dir: str):
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.io import load_table, session_cached
    from searchengine_spark.text.chunking import chunk_documents

    def _build():
        from searchengine_spark.text.tokenizer import MIN_TOKEN_LEN, STOPWORDS

        chunks = chunk_documents(
            load_table(spark, sf_dir, "documents"), with_tokens=True
        )
        as_docs = chunks.select(
            (F.col("doc_id") * CHUNK_GID_BASE + F.col("chunk_id"))
            .cast("bigint")
            .alias("doc_id"),
            F.col("chunk_toks"),
        )
        # chunk_toks are the raw tokens chunk_text was joined from, so
        # applying the tokenizer's filter chain to them is identical
        # to tokens_column(chunk_text) — minus the second regexp split
        # over the chunk corpus (r13 optimization).
        toks = F.filter(
            F.col("chunk_toks"),
            lambda w: (F.length(w) >= MIN_TOKEN_LEN) & ~w.isin(*STOPWORDS),
        )
        return build_index(as_docs, tokens=toks).coalesce(8).materialized()

    return session_cached(spark, "chunk_index", sf_dir, _build)


def q_chunk_retrieval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per batch query: doc-level BM25 top-k vs the parent documents
    of the chunk-level top-``RAG_CHUNK_K``; recall = fraction of the
    doc-level top-k recovered through chunks."""
    from searchengine_spark.index.bm25 import search_many
    from searchengine_spark.index.queries import BATCH_QUERIES, batch_top

    # Doc-level side = the session-shared se_bm25_batch result (same
    # search_many call; computed once per session — r13 optimization).
    doc_top = batch_top(spark, sf_dir).select("query_id", "doc_id")
    chunk_top = search_many(
        _chunk_index(spark, sf_dir),
        dict(BATCH_QUERIES),
        k=RAG_CHUNK_K,
        round_scores=6,
    )
    cdocs = chunk_top.select(
        "query_id",
        F.expr(f"doc_id div {CHUNK_GID_BASE}").cast("bigint").alias("doc_id"),
    ).distinct()
    dcounts = doc_top.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_doc_topk")
    )
    ccounts = cdocs.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunk_docs")
    )
    ov = (
        doc_top.join(cdocs, ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    return (
        dcounts.join(ccounts, "query_id", "left")
        .join(ov, "query_id", "left")
        .na.fill({"n_chunk_docs": 0, "n_overlap": 0})
        .select(
            "query_id",
            "n_doc_topk",
            "n_chunk_docs",
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("n_doc_topk"), 6).alias(
                "recall"
            ),
        )
        .orderBy("query_id")
    )


def _score_top_sql(p: str, k: int) -> str:
    """BM25 scoring + per-query top-k over a prefixed index CTE chain
    (same arithmetic/rounding/tiebreak as queries._BM25_BATCH_SQL)."""
    from searchengine_spark.index.queries import B, K1

    return f""",
{p}scored AS (
  SELECT q.query_id, {p}tf.doc_id,
         {p}idf.idf * ({p}tf.term_freq * {K1 + 1.0}) /
           ({p}tf.term_freq + {K1} * (1.0 - {B} + {B} * {p}dl.doc_length /
             (SELECT avgdl FROM {p}params))) AS term_score
  FROM {p}tf
  JOIN qterms q ON {p}tf.word = q.word
  JOIN {p}idf ON {p}tf.word = {p}idf.word
  JOIN {p}dl ON {p}tf.doc_id = {p}dl.doc_id
),
{p}totals AS (
  SELECT query_id, doc_id, round(sum(term_score), 6) AS total_score
  FROM {p}scored GROUP BY query_id, doc_id
),
{p}top AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY total_score DESC, doc_id ASC
           ) AS rnk
    FROM {p}totals
  ) WHERE rnk <= {k}
)
"""


def _rag_recall_sql() -> str:
    from searchengine_spark.index.queries import (
        _BATCH_QTERMS_SQL,
        BM25_K,
        index_body_sql,
    )
    from searchengine_spark.text.chunking import _CHUNKS_SQL, CHUNK_SIZE
    from searchengine_spark.text.tokenizer import sql_tokens_expr

    return (
        _CHUNKS_SQL
        + f""",
tok AS (
  SELECT doc_id, unnest({sql_tokens_expr('text')}) AS word FROM documents
)"""
        + index_body_sql()
        + f""",
chunksrc AS (
  SELECT doc_id, chunk_id::INT AS chunk_id,
         array_to_string(toks[s + 1 : s + {CHUNK_SIZE}], ' ') AS chunk_text
  FROM grid
),
ctok AS (
  SELECT doc_id * {CHUNK_GID_BASE} + chunk_id AS doc_id,
         unnest({sql_tokens_expr('chunk_text')}) AS word
  FROM chunksrc
)"""
        + index_body_sql("c")
        + f""",
qterms(query_id, word) AS (SELECT * FROM (VALUES {_BATCH_QTERMS_SQL}))"""
        + _score_top_sql("", BM25_K)
        + _score_top_sql("c", RAG_CHUNK_K)
        + f""",
cdocs AS (
  SELECT DISTINCT query_id, CAST(doc_id // {CHUNK_GID_BASE} AS BIGINT) AS doc_id
  FROM ctop
),
dcounts AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_doc_topk
  FROM top GROUP BY query_id
),
ccounts AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_chunk_docs
  FROM cdocs GROUP BY query_id
),
ov AS (
  SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM top t JOIN cdocs c ON t.query_id = c.query_id AND t.doc_id = c.doc_id
  GROUP BY t.query_id
)
SELECT d.query_id, d.n_doc_topk,
       COALESCE(c.n_chunk_docs, 0) AS n_chunk_docs,
       COALESCE(o.n_overlap, 0) AS n_overlap,
       round(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / d.n_doc_topk, 6)
         AS recall
FROM dcounts d
LEFT JOIN ccounts c ON d.query_id = c.query_id
LEFT JOIN ov o ON d.query_id = o.query_id
ORDER BY d.query_id
"""
    )


QUERIES = {
    "se_chunk_retrieval_recall": q_chunk_retrieval_recall,
}

ORACLES = {
    "se_chunk_retrieval_recall": _rag_recall_sql(),
}
