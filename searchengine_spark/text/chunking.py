"""Document chunking for LLM training pipelines.

Splits each document into overlapping fixed-size token windows —
the preprocessing step between curation and tokenizer/packing in a
training-data run. Pure array expressions: token slice windows are
computed with sequence + slice (no UDF, no per-row Python), so
chunking is a map-only stage over the corpus scan at any scale.

Chunk grid: starts at 0, stride = chunk_size - overlap; the last
chunk is the final (possibly shorter) remainder window. Every token
belongs to >= 1 chunk; consecutive chunks share `overlap` tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import (
    default_persist_dir,
    ensure_min_partitions,
    load_table,
    materialize_barrier,
)
from searchengine_spark.text.tokenizer import raw_tokens_column, sql_raw_tokens_expr

CHUNK_SIZE = 50
OVERLAP = 10


def chunk_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    chunk_size: int = CHUNK_SIZE,
    overlap: int = OVERLAP,
    persist_dir: str | None = None,
    with_tokens: bool = False,
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text) — one row per window.

    ``persist_dir`` (default $SPARK_GRAFT_PERSIST_DIR): stage barrier
    via persisted parquet instead of a full shuffle (see
    io.materialize_barrier) — the build-scale default.

    ``with_tokens``: additionally emit the window's raw token array
    as ``chunk_toks``. chunk_text is ``array_join(chunk_toks, ' ')``
    and raw tokens never contain the delimiter, so re-splitting
    chunk_text reproduces chunk_toks exactly — consumers that only
    need tokens (the chunk BM25 index) can skip that second regexp
    pass over the chunk corpus (r13 optimization, guide §1.2 step 1).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    persist_dir = persist_dir if persist_dir is not None else default_persist_dir()
    toked = materialize_barrier(
        ensure_min_partitions(docs).select(
            F.col("doc_id"), raw_tokens_column(text_col).alias("toks")
        ),
        persist_dir,
        tag="chunk_tokens",
    )
    n = F.size("toks")
    # A start s is useful only while the PREVIOUS window hasn't already
    # reached end-of-document: s < n - overlap. Without the cap, any
    # doc with n mod stride in 1..overlap (incl. n == chunk_size) gets
    # a trailing chunk fully contained in the previous one — duplicate
    # training text beyond the intended overlap.
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride)
    )
    chunks = toked.filter(n > 0).select(
        "doc_id",
        F.posexplode(
            F.transform(
                starts, lambda s: F.slice("toks", s + 1, chunk_size)
            )
        ).alias("chunk_id", "chunk_toks"),
    )
    out = [
        F.col("doc_id"),
        F.col("chunk_id"),
        F.size("chunk_toks").cast("bigint").alias("n_tokens"),
        F.array_join("chunk_toks", " ").alias("chunk_text"),
    ]
    if with_tokens:
        out.append(F.col("chunk_toks"))
    return chunks.select(*out)


PACK_CAPACITY = 512
N_SHARDS = 32


def pack_chunks(
    chunks: DataFrame,
    *,
    capacity: int = PACK_CAPACITY,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Assign chunks to training-context packs of ~`capacity` tokens.

    Contiguous packing: within a shard, chunks are laid out in
    (doc_id, chunk_id) order and pack_id = floor(preceding-token-
    count / capacity) — deterministic, one window per shard, no
    global sort. Sharding (pmod(doc_id, n_shards)) keeps the window
    parallel at any scale; a pack never spans shards. Chunks may
    straddle a pack boundary (the trainer truncates/pads) — this is
    the standard streaming-packing tradeoff, traded for a fully
    parallel, deterministic layout.
    """
    from pyspark.sql import Window

    shard = F.pmod(F.col("doc_id"), F.lit(n_shards))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        chunks.withColumn("shard", shard.cast("int"))
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            "shard",
            "doc_id",
            "chunk_id",
            "n_tokens",
            F.floor((F.col("_cum") - F.col("n_tokens")) / capacity)
            .cast("bigint")
            .alias("pack_id"),
            (F.col("_cum") - F.col("n_tokens")).alias("token_offset"),
        )
    )


def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(load_table(spark, sf_dir, "documents"))


def q_packed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_chunks(chunk_documents(load_table(spark, sf_dir, "documents")))


_RAW = sql_raw_tokens_expr("text")
_STRIDE = CHUNK_SIZE - OVERLAP

_CHUNKS_SQL = f"""
WITH toked AS (
  SELECT doc_id, {_RAW} AS toks FROM documents
),
grid AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(len(toks) - {OVERLAP} - 1, 0) + 1, {_STRIDE})) AS s,
         generate_subscripts(range(0, greatest(len(toks) - {OVERLAP} - 1, 0) + 1, {_STRIDE}), 1) - 1 AS chunk_id
  FROM toked WHERE len(toks) > 0
),
chunks AS (
  SELECT doc_id, chunk_id::INT AS chunk_id,
         len(toks[s + 1 : s + {CHUNK_SIZE}])::BIGINT AS n_tokens
  FROM grid
)
"""

def chunk_exact_dedup(chunks: DataFrame) -> DataFrame:
    """Chunk-granularity exact dedup (RAG-corpus hygiene: identical
    passages from different documents collapse to one). Groups by
    md5(chunk_text); emits only groups with >= 2 copies, with the
    lexicographically-smallest (doc_id, chunk_id) as canonical.

    The canonical pair is encoded as doc_id * 1024 + chunk_id for a
    single-column MIN (chunk_id < 1024 always: chunk_id <= n_tokens /
    stride, and documents are orders of magnitude shorter than
    1024 * stride tokens) — the same one-shuffle shape as doc-level
    exact_dedup_groups, keyed by a uniform 128-bit hash.
    """
    enc = F.col("doc_id") * 1024 + F.col("chunk_id")
    return (
        chunks.select(
            F.md5(F.col("chunk_text").cast("binary")).alias("chunk_hash"),
            enc.alias("enc"),
        )
        .groupBy("chunk_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("enc").alias("c"))
        .filter(F.col("n_copies") >= 2)
        .select(
            "chunk_hash",
            "n_copies",
            F.expr("c div 1024").alias("canonical_doc_id"),
            F.pmod("c", F.lit(1024)).cast("int").alias("canonical_chunk_id"),
        )
    )


def q_chunk_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_exact_dedup(chunk_documents(load_table(spark, sf_dir, "documents")))


# ------------------------------- T5-style span corruption examples

MASK_SALT = "spanmask"
MASK_RATE = 0.15  # fraction of token positions masked (T5's default)


def span_corruption_examples(
    docs: DataFrame, *, text_col: str = "text", mask_rate: float = MASK_RATE
) -> DataFrame:
    """Denoising training examples (T5 span corruption — Raffel et
    al. 2020, public recipe): deterministically mask ~mask_rate of
    each document's token positions, collapse runs of masked tokens
    into numbered sentinel spans, and emit
      input_text  — unmasked tokens with <extra_id_k> at each span
      target_text — <extra_id_k> followed by that span's tokens
    Position masking is a per-(doc_id, pos) hash — stable across
    partitionings and appends, so the oracle reproduces every example
    byte for byte. (Deterministic single-position Bernoulli masking
    gives mean span ~1.2 tokens, not T5's length-3 geometric spans —
    the structure, numbering, and budget are the point here; a span-
    length sampler would need an agreed RNG in both engines.) Docs
    with no masked position emit n_spans = 0 with an empty target.

    Shape: one tokenize scan -> posexplode bounded by doc length ->
    doc-keyed windows (lag + running span count) -> one doc-keyed
    agg re-assembling both strings in position order. No joins.
    """
    from pyspark.sql.window import Window

    from searchengine_spark.operators.sampling import N_BUCKETS, hash_bucket

    cut = int(mask_rate * N_BUCKETS)
    toks = docs.select(
        "doc_id", F.posexplode(raw_tokens_column(text_col)).alias("pos", "w")
    )
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    base = (
        toks.withColumn(
            "mk",
            hash_bucket(
                F.concat_ws("_", F.col("doc_id"), F.col("pos")),
                salt=MASK_SALT,
            )
            < cut,
        )
        .withColumn(
            "st",
            F.col("mk") & ~F.coalesce(F.lag("mk").over(w_ord), F.lit(False)),
        )
        .withColumn("sid", F.sum(F.col("st").cast("int")).over(w_ord))
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("sid").cast("string"), F.lit(">")
    )
    piece_in = F.when(~F.col("mk"), F.col("w")).when(F.col("st"), sentinel)
    piece_tg = F.when(
        F.col("mk") & F.col("st"),
        F.concat(sentinel, F.lit(" "), F.col("w")),
    ).when(F.col("mk"), F.col("w"))

    def assemble(piece) -> F.Column:
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            piece.isNotNull(),
                            F.struct(F.col("pos"), piece.alias("p")),
                        )
                    )
                ),
                lambda x: x["p"],
            ),
            " ",
        )

    return base.groupBy("doc_id").agg(
        F.max("sid").cast("bigint").alias("n_spans"),
        assemble(piece_in).alias("input_text"),
        assemble(piece_tg).alias("target_text"),
    )


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_corruption_examples(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "text_chunks": q_text_chunks,
    "text_packed_chunks": q_packed_chunks,
    "text_chunk_exact_dedup": q_chunk_exact_dedup,
    "export_span_corruption": q_span_corruption,
}

from searchengine_spark.operators.sampling import N_BUCKETS as _NB  # noqa: E402
from searchengine_spark.operators.sampling import _bucket_sql  # noqa: E402

_MASK_CUT = int(MASK_RATE * _NB)

_SPAN_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(generate_subscripts(t, 1) - 1 AS BIGINT) AS pos,
         unnest(t) AS w
  FROM (SELECT doc_id, {_RAW} AS t FROM documents)
),
m AS (
  SELECT doc_id, pos, w,
         {_bucket_sql("doc_id || '_' || pos", MASK_SALT)} < {_MASK_CUT} AS mk
  FROM toks
),
s AS (
  SELECT *,
         mk AND NOT COALESCE(LAG(mk) OVER (PARTITION BY doc_id ORDER BY pos),
                             FALSE) AS st
  FROM m
),
sd AS (
  SELECT *,
         SUM(CASE WHEN st THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS sid
  FROM s
)
SELECT doc_id,
       CAST(MAX(sid) AS BIGINT) AS n_spans,
       COALESCE(string_agg(
         CASE WHEN NOT mk THEN w
              WHEN st THEN '<extra_id_' || sid || '>' END,
         ' ' ORDER BY pos), '') AS input_text,
       COALESCE(string_agg(
         CASE WHEN mk AND st THEN '<extra_id_' || sid || '> ' || w
              WHEN mk THEN w END,
         ' ' ORDER BY pos), '') AS target_text
FROM sd GROUP BY doc_id
"""

ORACLES = {
    "export_span_corruption": _SPAN_SQL,
    "text_chunk_exact_dedup": f"""{_CHUNKS_SQL},
        chunk_texts AS (
          SELECT doc_id, chunk_id::INT AS chunk_id,
                 array_to_string(toks[s + 1 : s + {CHUNK_SIZE}], ' ') AS chunk_text
          FROM grid
        ),
        grouped AS (
          SELECT md5(chunk_text) AS chunk_hash,
                 COUNT(*) AS n_copies,
                 MIN(doc_id * 1024 + chunk_id) AS c
          FROM chunk_texts
          GROUP BY md5(chunk_text)
          HAVING COUNT(*) >= 2
        )
        SELECT chunk_hash, n_copies,
               (c // 1024) AS canonical_doc_id,
               (c % 1024)::INT AS canonical_chunk_id
        FROM grouped
    """,
    "text_packed_chunks": f"""{_CHUNKS_SQL},
        packed AS (
          SELECT (doc_id % {N_SHARDS})::INT AS shard, doc_id, chunk_id, n_tokens,
                 CAST(SUM(n_tokens) OVER (
                   PARTITION BY doc_id % {N_SHARDS} ORDER BY doc_id, chunk_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cum
          FROM chunks
        )
        SELECT shard, doc_id, chunk_id, n_tokens,
               ((cum - n_tokens) // {PACK_CAPACITY})::BIGINT AS pack_id,
               (cum - n_tokens) AS token_offset
        FROM packed
    """,
    "text_chunks": f"""
        WITH toked AS (
          SELECT doc_id, {_RAW} AS toks FROM documents
        ),
        grid AS (
          SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks) - {OVERLAP} - 1, 0) + 1, {_STRIDE})) AS s,
                 generate_subscripts(range(0, greatest(len(toks) - {OVERLAP} - 1, 0) + 1, {_STRIDE}), 1) - 1 AS chunk_id
          FROM toked WHERE len(toks) > 0
        )
        SELECT doc_id, chunk_id::INT AS chunk_id,
               len(toks[s + 1 : s + {CHUNK_SIZE}])::BIGINT AS n_tokens,
               array_to_string(toks[s + 1 : s + {CHUNK_SIZE}], ' ') AS chunk_text
        FROM grid
    """,
}
