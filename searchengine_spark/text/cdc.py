"""Content-defined chunking (CDC): rolling-window hash boundaries.

Fixed-size chunking breaks under edits: inserting one byte shifts
every later chunk, so chunk-level dedup (RAG passage hygiene,
storage dedup, delta-sync of a 100 TB corpus between sites) finds
nothing shared between two near-identical documents. CDC instead
cuts where the CONTENT says so: a boundary falls after position k
iff a hash of the last ``WINDOW`` characters lands in bucket 0 of
``TARGET`` — so boundaries are a pure function of a small local
window, and an edit perturbs only the chunks it touches (plus at
most one window's worth downstream); everything after re-aligns and
dedups again. Expected chunk length = TARGET chars.

This is the fixed-window Rabin/Gear family with the rolling
recurrence replaced by an md5 of the window — same boundary
semantics (local, content-derived), chosen because md5 is the
repo-wide cross-engine hash convention (operators/sampling.py), so
the DuckDB oracle reproduces every boundary exactly. The classic
min/max chunk-size clamps are deliberately omitted: they make each
boundary depend on the previous one (a sequential scan per doc),
which kills both the all-native-columns Spark plan and the SQL
restatement; the un-clamped variant keeps the dedup property that
matters and stays embarrassingly parallel.

Scale shape: boundary detection + chunk emission is one map-only
stage of native column ops (sequence/transform/filter/substr/md5 —
whole-stage codegen, no Python, no shuffle); the dup-chunk rollup is
one groupBy on the chunk hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import ensure_min_partitions, load_table

WINDOW = 8    # chars hashed to decide a boundary
TARGET = 64   # boundary probability 1/TARGET => ~64-char chunks


def _bucket(window_col):
    """md5-prefix bucket in [0, TARGET) — sampling.hash_bucket's
    convention, applied to the window text."""
    h = F.conv(
        F.substring(F.md5(window_col.cast("binary")), 1, 15), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(TARGET))


def cdc_chunks(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(doc_id, chunk_idx, start, chunk_len, chunk_md5) — contiguous
    cover of each non-empty document by content-defined chunks.

    A boundary ENDS a chunk at position k (1-based, k >= WINDOW) when
    the window text[k-WINDOW+1 .. k] hashes to bucket 0. A boundary
    at the last position produces no empty tail chunk."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    ln = F.length(txt)
    bounds = F.when(
        ln >= WINDOW,
        F.filter(
            F.transform(
                F.sequence(F.lit(WINDOW), ln),
                lambda k: F.when(
                    _bucket(txt.substr(k - (WINDOW - 1), F.lit(WINDOW)))
                    == 0,
                    k,
                ),
            ),
            lambda x: x.isNotNull(),
        ),
    ).otherwise(F.array().cast("array<int>"))

    # Materialize the boundary array ONCE before it is referenced by
    # both starts and ends — Catalyst does not CSE the two lambda
    # trees, and the array costs one md5 per character position.
    with_bounds = docs.select("doc_id", txt.alias("_t"), bounds.alias("_bounds"))
    bcol = F.col("_bounds")
    starts = F.concat(
        F.array(F.lit(1)), F.transform(bcol, lambda b: b + 1)
    )
    ends = F.concat(bcol, F.array(F.length("_t")))
    pairs = F.filter(
        F.zip_with(
            starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
        ),
        lambda p: p["s"] <= p["e"],
    )

    rows = with_bounds.select(
        "doc_id", F.col("_t"), F.posexplode(pairs).alias("chunk_idx", "p")
    )
    chunk = F.col("_t").substr(
        F.col("p.s"), F.col("p.e") - F.col("p.s") + F.lit(1)
    )
    return rows.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("p.s").cast("int").alias("start"),
        (F.col("p.e") - F.col("p.s") + 1).cast("int").alias("chunk_len"),
        F.md5(chunk.cast("binary")).alias("chunk_md5"),
    )


def dup_chunks(chunks: DataFrame) -> DataFrame:
    """Chunk hashes shared by >= 2 documents — the cross-doc shared
    content CDC exists to expose."""
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("chunk_len").alias("chunk_len"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# --------------------------------------------------------------- queries

def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return cdc_chunks(docs)


def q_cdc_dup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_chunks(q_cdc_chunks(spark, sf_dir))


QUERIES = {
    "text_cdc_chunks": q_cdc_chunks,
    "text_cdc_dup_chunks": q_cdc_dup_chunks,
}

_CHUNKS_SQL = f"""
        d AS (
          SELECT doc_id, COALESCE(text, '') AS t,
                 length(COALESCE(text, '')) AS ln
          FROM documents
        ),
        b AS (
          SELECT doc_id, t, ln,
                 CASE WHEN ln >= {WINDOW} THEN
                   list_filter(
                     list_transform(range({WINDOW}, ln + 1), k ->
                       CASE WHEN (('0x' || substr(md5(substr(t, CAST(k AS INT) - {WINDOW - 1}, {WINDOW})), 1, 15))::BIGINT
                                  % {TARGET}) = 0
                            THEN k ELSE NULL END),
                     x -> x IS NOT NULL)
                 ELSE [] END AS bounds
          FROM d
        ),
        paired AS (
          SELECT doc_id, t,
                 list_filter(
                   list_transform(range(0, len(bounds) + 1), i ->
                     struct_pack(
                       s := CASE WHEN i = 0 THEN 1
                                 ELSE bounds[CAST(i AS INT)] + 1 END,
                       e := CASE WHEN i = len(bounds) THEN ln
                                 ELSE bounds[CAST(i AS INT) + 1] END)),
                   p -> p.s <= p.e) AS pairs
          FROM b WHERE ln > 0
        ),
        exploded AS (
          SELECT doc_id, t,
                 CAST(generate_subscripts(pairs, 1) - 1 AS INT) AS chunk_idx,
                 unnest(pairs) AS p
          FROM paired
        ),
        chunks AS (
          SELECT doc_id, chunk_idx,
                 CAST(p.s AS INT) AS start,
                 CAST(p.e - p.s + 1 AS INT) AS chunk_len,
                 md5(substr(t, CAST(p.s AS INT), CAST(p.e - p.s + 1 AS INT)))
                   AS chunk_md5
          FROM exploded
        )
"""

ORACLES = {
    "text_cdc_chunks": f"""
        WITH {_CHUNKS_SQL}
        SELECT doc_id, chunk_idx, start, chunk_len, chunk_md5 FROM chunks
    """,
    "text_cdc_dup_chunks": f"""
        WITH {_CHUNKS_SQL}
        SELECT chunk_md5,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               MAX(chunk_len) AS chunk_len
        FROM chunks
        GROUP BY chunk_md5 HAVING COUNT(DISTINCT doc_id) >= 2
    """,
}
