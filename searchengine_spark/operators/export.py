"""Training-set export: deterministic global shuffle, exact global
row index, and fixed-size shard assignment — WITHOUT a global sort.

The last mile of a data pipeline hands the trainer (a) a
reproducible row ORDER (training-order shuffling must be
deterministic for resumable jobs and ablation parity) and (b)
fixed-size SHARDS (webdataset/tfrecord convention: equal-row files
the loader can stripe across workers). Both need an exact global row
index, and the naive way — one unpartitioned row_number window — is
a single-task sort of the whole table.

This module reuses the distributed prefix-sum shape from
`operators/sampling.weighted_pps_sample` with weight==1:

  1. hash-bucket every row by id (content-derived: the bucket order
     IS the deterministic shuffle — uncorrelated with scan order,
     stable across runs and repartitionings);
  2. per-bucket counts (one small agg, N_BUCKETS rows);
  3. exclusive offsets over the bucket totals (a window over 10^4
     rows — the only single-partition step, constant-size at any
     data scale);
  4. broadcast offsets back; within-bucket row_number shuffles on
     the bucket key only.

global index = bucket offset + within-bucket rank, equivalent to
ROW_NUMBER() OVER (ORDER BY bucket, id) — which is exactly what the
DuckDB oracle states. shard = index DIV rows_per_shard.

The reference engine exports by writing one file from a single
process (no sharding contract at all); this is the scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.operators.sampling import hash_bucket

ROWS_PER_SHARD = 64


def global_shuffle_index(
    df: DataFrame, id_col: str, *, salt: str = "shuf"
) -> DataFrame:
    """Add `gidx` — the row's exact position in the deterministic
    hash-shuffled global order — via the distributed prefix sum (no
    global sort; the only single-partition step is over bucket
    totals)."""
    from pyspark.sql import Window

    rows = df.withColumn("_b", hash_bucket(F.col(id_col), salt=salt))
    totals = rows.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    off_win = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_n").over(off_win), F.lit(0))
    ).select("_b", "_off")
    in_win = Window.partitionBy("_b").orderBy(F.col(id_col))
    return (
        rows.join(F.broadcast(offsets), "_b")
        .withColumn(
            "gidx", (F.col("_off") + F.row_number().over(in_win) - 1).cast("bigint")
        )
        .drop("_b", "_off")
    )


def shard_assignments(
    df: DataFrame,
    id_col: str,
    *,
    rows_per_shard: int = ROWS_PER_SHARD,
    salt: str = "shuf",
) -> DataFrame:
    """`gidx` plus the fixed-size shard it lands in: every shard has
    exactly ``rows_per_shard`` rows except the last."""
    return global_shuffle_index(df, id_col, salt=salt).withColumn(
        "shard", (F.col("gidx") / rows_per_shard).cast("bigint")
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    *,
    rows_per_shard: int = ROWS_PER_SHARD,
    salt: str = "shuf",
) -> dict[int, int]:
    """Materialize fixed-size shards: one parquet directory per
    shard, each holding one file (the shard fits a task by
    construction — that's the point of bounding rows_per_shard).
    Returns {shard: n_rows} read back from the written files — the
    export manifest a loader stripes over."""
    assigned = shard_assignments(
        df, id_col, rows_per_shard=rows_per_shard, salt=salt
    )
    (
        assigned.repartition("shard")
        .sortWithinPartitions("shard", "gidx")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    spark = df.sparkSession
    out = spark.read.parquet(path)
    return {
        int(r["shard"]): int(r["n"])
        for r in out.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }


SHARD_BYTE_BUDGET = 4096


def byte_budget_shards(
    df: DataFrame,
    id_col: str,
    bytes_col,
    *,
    budget: int = SHARD_BYTE_BUDGET,
    salt: str = "shuf",
) -> DataFrame:
    """(id, n_bytes, shard_id): greedy byte-budget packing in the
    deterministic shuffled order — the webdataset/tar convention
    where shards target a BYTE size (sequential-read granularity for
    the loader), not a row count, because document sizes vary.

    Same two-level distributed prefix sum as global_shuffle_index,
    weighted by bytes instead of 1: per-bucket byte totals ->
    constant-size exclusive-offset window -> broadcast back ->
    within-bucket running sum. shard_id = cum_bytes_before // budget
    (greedy fill: a document is assigned by its start offset, so a
    shard may overshoot by at most one document — the standard
    contract). Shares the 'shuf' salt with the row-count sharding so
    both layouts agree on the global order."""
    from pyspark.sql import Window

    rows = df.withColumn("_b", hash_bucket(F.col(id_col), salt=salt))
    totals = rows.groupBy("_b").agg(F.sum(bytes_col).alias("_n"))
    off_win = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_n").over(off_win), F.lit(0))
    ).select("_b", "_off")
    in_win = (
        Window.partitionBy("_b")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        rows.join(F.broadcast(offsets), "_b")
        .withColumn(
            "_cumb",
            F.col("_off") + F.coalesce(F.sum(bytes_col).over(in_win), F.lit(0)),
        )
        .select(
            id_col,
            F.col(bytes_col).cast("bigint").alias("n_bytes"),
            F.expr(f"CAST(_cumb DIV {budget} AS BIGINT)").alias("shard_id"),
        )
    )


# --------------------------------------------------------------- queries


def q_export_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-shuffle shard assignment over documents: the
    prefix-sum global index must equal ROW_NUMBER over the hashed
    order (the oracle's formulation) — any off-by-one in the offsets
    or a nondeterministic within-bucket order breaks the hash."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shard_assignments(docs, "doc_id").orderBy("gidx")


_SHARD_SQL = f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substr(md5('shuf' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             % 10000 AS b
      FROM documents
    ), r AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY b, doc_id) - 1 AS gidx FROM h
    )
    SELECT doc_id, CAST(gidx AS BIGINT) AS gidx,
           CAST(gidx // {ROWS_PER_SHARD} AS BIGINT) AS shard
    FROM r
    ORDER BY gidx
"""


def q_export_byte_budget_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budget packing over documents (weight = length(text)):
    the distributed weighted prefix sum must equal the running-sum
    window the oracle states — a lost byte, a wrong offset, or an
    unstable within-bucket order all shift every later shard id."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("_bytes")
    )
    return byte_budget_shards(docs, "doc_id", "_bytes").orderBy("doc_id")


_BYTE_SHARD_SQL = f"""
    WITH h AS (
      SELECT doc_id, length(text) AS n_bytes,
             ('0x' || substr(md5('shuf' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             % 10000 AS b
      FROM documents
    ), r AS (
      SELECT doc_id, n_bytes,
             COALESCE(SUM(n_bytes) OVER (
               ORDER BY b, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cumb
      FROM h
    )
    SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(cumb // {SHARD_BYTE_BUDGET} AS BIGINT) AS shard_id
    FROM r
    ORDER BY doc_id
"""


PACK_WINDOW_TOKENS = 512
PACK_RANGE = 1_000  # doc_id bucket width for the two-level prefix sum


def packed_windows(
    docs: DataFrame,
    *,
    text_col: str = "text",
    window: int = PACK_WINDOW_TOKENS,
) -> DataFrame:
    """(doc_id, window_id, tok_start, tok_end, n_span): fixed-size
    context-window packing of the corpus token stream — the training
    convention where documents are concatenated in corpus order and
    cut into exactly-``window``-token examples, SPLITTING documents
    across window boundaries (GPT-style packing; contrast
    byte_budget_shards, which keeps documents whole and lets shards
    overshoot). ``tok_start``/``tok_end`` are the within-document
    token range each window takes, so every token lands in exactly
    one window and no padding is ever emitted except in the final
    window.

    Scale shape: the same two-level distributed prefix sum as
    global_shuffle_index, but bucketed by MONOTONE doc_id ranges
    (order must be corpus order, not hashed-shuffle order, and
    (range, doc_id) order == doc_id order) — per-range token totals,
    constant-size offsets window, broadcast back, within-range running
    sum. The window fan-out per document is ceil(n_tok/window)+1 rows
    max, emitted by a sequence() explode — never a join.
    """
    from pyspark.sql import Window

    from searchengine_spark.text.tokenizer import raw_tokens_column

    toks = docs.select(
        "doc_id",
        F.size(raw_tokens_column(F.col(text_col))).cast("bigint").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    rows = toks.withColumn("_b", F.expr(f"CAST(doc_id DIV {PACK_RANGE} AS BIGINT)"))
    totals = rows.groupBy("_b").agg(F.sum("n_tok").alias("_n"))
    off_win = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_n").over(off_win), F.lit(0))
    ).select("_b", "_off")
    in_win = (
        Window.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w = F.lit(int(window)).cast("bigint")
    return (
        rows.join(F.broadcast(offsets), "_b")
        .withColumn(
            "_gstart",
            (F.col("_off") + F.coalesce(F.sum("n_tok").over(in_win), F.lit(0))).cast(
                "bigint"
            ),
        )
        .withColumn(
            "window_id",
            F.explode(
                F.sequence(
                    F.expr(f"CAST(_gstart DIV {window} AS BIGINT)"),
                    F.expr(f"CAST((_gstart + n_tok - 1) DIV {window} AS BIGINT)"),
                )
            ),
        )
        .select(
            "doc_id",
            F.col("window_id").cast("bigint").alias("window_id"),
            F.greatest(F.lit(0).cast("bigint"), w * F.col("window_id") - F.col("_gstart"))
            .cast("bigint")
            .alias("tok_start"),
            F.least(F.col("n_tok"), w * (F.col("window_id") + 1) - F.col("_gstart"))
            .cast("bigint")
            .alias("tok_end"),
        )
        .withColumn("n_span", (F.col("tok_end") - F.col("tok_start")).cast("bigint"))
    )


def q_export_packed_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing over documents: every (doc, window)
    span of the 512-token packed stream. The oracle restates the
    packing as ONE running-sum window + generate_series — any lost
    token, off-by-one boundary, or unstable order shifts every later
    span and breaks the hash."""
    from searchengine_spark.io import load_table

    return packed_windows(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_id", "window_id"
    )


def _packed_sql(window: int = PACK_WINDOW_TOKENS) -> str:
    from searchengine_spark.text.tokenizer import sql_raw_tokens_expr

    return f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({sql_raw_tokens_expr("text")}) AS BIGINT) AS n_tok
      FROM documents
    ),
    nz AS (SELECT * FROM t WHERE n_tok > 0),
    pre AS (
      SELECT doc_id, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS gstart
      FROM nz
    ),
    spans AS (
      SELECT doc_id, n_tok, gstart,
             unnest(generate_series(gstart // {window},
                                    (gstart + n_tok - 1) // {window})) AS wid
      FROM pre
    )
    SELECT doc_id,
           CAST(wid AS BIGINT) AS window_id,
           CAST(GREATEST(0, wid * {window} - gstart) AS BIGINT) AS tok_start,
           CAST(LEAST(n_tok, (wid + 1) * {window} - gstart) AS BIGINT) AS tok_end,
           CAST(LEAST(n_tok, (wid + 1) * {window} - gstart)
                - GREATEST(0, wid * {window} - gstart) AS BIGINT) AS n_span
    FROM spans
    ORDER BY doc_id, window_id
    """


# --------------------------------------------- length-bucketed batching

LEN_BUCKET_MAX_POW = 20  # buckets 1,2,4,...,2^20 tokens; longer -> 2^21


def _pow2_bucket_case():
    """Next-power-of-two bucket as a pure 21-branch CASE chain — NO
    log2/ceil float math (2.0000000000000004-style ulp drift would
    flip buckets at exact powers of two between engines) and no
    lookup join. Returns (Spark Column fn over an int column name,
    SQL CASE string over an expr)."""
    powers = [1 << i for i in range(LEN_BUCKET_MAX_POW + 1)]

    def col_fn(n: str):
        c = F.lit(1 << (LEN_BUCKET_MAX_POW + 1)).cast("bigint")
        for p in reversed(powers):
            c = F.when(F.col(n) <= p, F.lit(p).cast("bigint")).otherwise(c)
        return c

    def sql_fn(expr: str) -> str:
        whens = " ".join(f"WHEN {expr} <= {p} THEN {p}" for p in powers)
        return (
            f"CAST(CASE {whens} ELSE {1 << (LEN_BUCKET_MAX_POW + 1)} END"
            " AS BIGINT)"
        )

    return col_fn, sql_fn


def length_buckets(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(bucket_tokens, n_docs, sum_tokens, padded_tokens, efficiency,
    naive_efficiency): the length-bucketed batching audit — pad each
    document to the next power-of-two token length and batch within
    the bucket (the standard padding-waste mitigation for non-packed
    training/inference). ``efficiency`` = real/padded tokens per
    bucket; ``naive_efficiency`` is the same ratio if the whole
    corpus padded to its longest document — the number bucketing is
    beating. Contrast packed_windows, which eliminates padding by
    splitting docs; bucketing keeps documents whole (needed for
    contrastive/reward training where truncation changes the label).

    Scale shape: one tokenize scan -> per-doc count (map-only) ->
    groupBy on <=22 bucket values; the corpus-wide totals fold in as
    a 1-row broadcast. Nothing wider than 22 rows past the scan.
    """
    from searchengine_spark.text.tokenizer import raw_tokens_column

    col_fn, _ = _pow2_bucket_case()
    per_doc = docs.select(
        F.size(raw_tokens_column(text_col)).cast("bigint").alias("n_tok")
    ).filter(F.col("n_tok") >= 1)
    bucketed = per_doc.select("n_tok", col_fn("n_tok").alias("bucket_tokens"))
    per_bucket = bucketed.groupBy("bucket_tokens").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
    )
    tot = per_doc.agg(
        F.sum("n_tok").alias("_sum_all"),
        F.count(F.lit(1)).alias("_n_all"),
        F.max("n_tok").alias("_max_tok"),
    )
    return (
        per_bucket.crossJoin(F.broadcast(tot))
        .select(
            "bucket_tokens",
            "n_docs",
            F.col("sum_tokens").cast("bigint").alias("sum_tokens"),
            (F.col("n_docs") * F.col("bucket_tokens"))
            .cast("bigint")
            .alias("padded_tokens"),
            F.round(
                F.col("sum_tokens") / (F.col("n_docs") * F.col("bucket_tokens")),
                6,
            ).alias("efficiency"),
            F.round(
                F.col("_sum_all") / (F.col("_n_all") * F.col("_max_tok")), 6
            ).alias("naive_efficiency"),
        )
        .orderBy("bucket_tokens")
    )


def q_export_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-efficiency audit of power-of-two length bucketing over
    the documents table."""
    from searchengine_spark.io import load_table

    return length_buckets(load_table(spark, sf_dir, "documents"))


def _length_buckets_sql() -> str:
    from searchengine_spark.text.tokenizer import sql_raw_tokens_expr

    _, sql_fn = _pow2_bucket_case()
    return f"""
        WITH per_doc AS (
          SELECT CAST(len({sql_raw_tokens_expr('text')}) AS BIGINT) AS n_tok
          FROM documents
        ),
        filt AS (SELECT n_tok FROM per_doc WHERE n_tok >= 1),
        bucketed AS (
          SELECT n_tok, {sql_fn('n_tok')} AS bucket_tokens FROM filt
        ),
        per_bucket AS (
          SELECT bucket_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
          FROM bucketed GROUP BY bucket_tokens
        ),
        tot AS (
          SELECT CAST(SUM(n_tok) AS BIGINT) AS sum_all,
                 CAST(COUNT(*) AS BIGINT) AS n_all,
                 CAST(MAX(n_tok) AS BIGINT) AS max_tok
          FROM filt
        )
        SELECT bucket_tokens, n_docs, sum_tokens,
               CAST(n_docs * bucket_tokens AS BIGINT) AS padded_tokens,
               round(CAST(sum_tokens AS DOUBLE)
                     / (n_docs * bucket_tokens), 6) AS efficiency,
               round(CAST(sum_all AS DOUBLE) / (n_all * max_tok), 6)
                 AS naive_efficiency
        FROM per_bucket, tot
        ORDER BY bucket_tokens
    """


def q_export_global_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact GLOBAL rank of every document in a value order (longest
    first, id tiebreak) — ROW_NUMBER() OVER (ORDER BY n_chars DESC,
    doc_id) without the single-task global sort it implies: the
    no-partition case of `distrank.distributed_rank` (value-range
    buckets from a 1-row min/max fold; the only ordered single
    partition is the |buckets|-row offsets frame). The rank a
    curriculum/export step attaches before writing shards."""
    from searchengine_spark.io import load_table
    from searchengine_spark.operators.distrank import (
        distributed_rank,
        range_bucket,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ext, bucket = range_bucket(docs, "n_chars", descending=True)
    ranked = distributed_rank(
        ext,
        [],
        [F.desc("n_chars"), F.asc("doc_id")],
        bucket,
        rank_name="global_rank",
    )
    return ranked.select("doc_id", "n_chars", "global_rank").orderBy("doc_id")


_GLOBAL_RANK_SQL = """
    SELECT doc_id, n_chars,
           CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC)
                AS BIGINT) AS global_rank
    FROM documents
    ORDER BY doc_id
"""


CHECKSUM_MOD = 1 << 61


def q_export_shard_integrity_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard integrity manifest: (shard, n_docs, total_chars,
    checksum) where checksum is an ORDER-INDEPENDENT fold of per-doc
    content digests — sum of 60-bit md5 prefixes mod 2^61. A loader
    (or a re-export on another cluster) recomputes the same manifest
    and diffs it: any lost/duplicated/corrupted document flips its
    shard's checksum, regardless of row order inside the shard.

    Order-independence is the point: a concatenation hash would force
    a per-shard sort just to verify; the additive fold verifies from
    ANY partitioning (the exact-integer sums are commutative), so at
    100 TB verification is one scan + one keyed agg. Sums ride in
    decimal(38,0) (Spark) / HUGEINT (DuckDB) — both exact well past
    10^9 rows x 2^60 — and reduce mod 2^61 only at release."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    assigned = shard_assignments(docs, "doc_id")
    digest = F.conv(
        F.substring(F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")), 1, 15),
        16,
        10,
    ).cast("decimal(38,0)")
    return (
        assigned.select(
            "shard",
            digest.alias("digest"),
            F.length(F.coalesce(F.col("text"), F.lit(""))).cast("bigint").alias(
                "n_chars"
            ),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.pmod(F.sum("digest"), F.lit(CHECKSUM_MOD).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("checksum"),
        )
    )


_MANIFEST_SQL = f"""
    WITH h AS (
      SELECT doc_id, COALESCE(text, '') AS t,
             ('0x' || substr(md5('shuf' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             % 10000 AS b
      FROM documents
    ), r AS (
      SELECT t, (ROW_NUMBER() OVER (ORDER BY b, doc_id) - 1)
                // {ROWS_PER_SHARD} AS shard
      FROM h
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           count(*)::BIGINT AS n_docs,
           SUM(length(t))::BIGINT AS total_chars,
           CAST(SUM(CAST(('0x' || substr(md5(t), 1, 15))::BIGINT AS HUGEINT))
                % {CHECKSUM_MOD} AS BIGINT) AS checksum
    FROM r GROUP BY shard
"""




REBAL_FROM, REBAL_TO = 8, 9
REBAL_SALT = "rebal"


def _rdv_hash(id_col, slot: int):
    """Rendezvous weight of (row, slot): first 60 bits of
    md5('rdv<slot>#' || id) — same digest family as hash_bucket."""
    s = F.concat(F.lit(f"rdv{slot}#"), id_col.cast("string"))
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast(
        "bigint"
    )


def _rdv_shard(id_col, n: int):
    return F.array_max(
        F.array(
            *[
                F.struct(_rdv_hash(id_col, s).alias("h"), F.lit(s).alias("s"))
                for s in range(n)
            ]
        )
    )["s"]


def q_export_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-resize churn audit: what fraction of rows MOVE when the
    shard count grows REBAL_FROM -> REBAL_TO, under (a) mod-hash
    placement and (b) rendezvous / highest-random-weight placement
    (Thaler & Ravishankar 1996, public — the consistent-hashing
    family memcached/Ceph-style stores use).

    Mod-hash reshuffles ~n/(n+1) of all rows on a resize (every
    residue class moves); rendezvous moves EXACTLY the rows whose new
    slot's weight beats their previous max — 1/(n+1) in expectation —
    because per-slot weights are independent of n. For a 100 TB
    export feeding resumable training, that is the difference between
    re-shipping the whole dataset and re-shipping one shard's worth.

    Map-only over doc ids + one 1-row aggregate; both placements are
    pure md5 integer arithmetic (exact twins)."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    placed = docs.select(
        hash_bucket(F.col("doc_id"), n_buckets=REBAL_FROM, salt=REBAL_SALT)
        .alias("mod_a"),
        hash_bucket(F.col("doc_id"), n_buckets=REBAL_TO, salt=REBAL_SALT)
        .alias("mod_b"),
        _rdv_shard(F.col("doc_id"), REBAL_FROM).alias("rdv_a"),
        _rdv_shard(F.col("doc_id"), REBAL_TO).alias("rdv_b"),
    )
    agg = placed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("mod_a") != F.col("mod_b")).cast("long")).alias("mv_mod"),
        F.sum((F.col("rdv_a") != F.col("rdv_b")).cast("long")).alias("mv_rdv"),
    )
    stacked = agg.selectExpr(
        "n",
        "stack(2, 'mod', mv_mod, 'rendezvous', mv_rdv)"
        " AS (scheme, n_moved)",
    )
    return stacked.select(
        "scheme",
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("n_moved").cast("bigint").alias("n_moved"),
        F.round(
            F.col("n_moved").cast("double") / F.col("n").cast("double"), 6
        ).alias("moved_frac"),
    ).orderBy("scheme")


def _rebalance_sql() -> str:
    def rdv(n: int) -> str:
        items = ", ".join(
            f"struct_pack(h := ('0x' || substr(md5('rdv{s}#' ||"
            f" CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, s := {s})"
            for s in range(n)
        )
        return f"list_max([{items}]).s"

    def mod(n: int) -> str:
        return (
            f"(('0x' || substr(md5('{REBAL_SALT}' ||"
            f" CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % {n})"
        )

    return f"""
        WITH placed AS (
          SELECT {mod(REBAL_FROM)} AS mod_a, {mod(REBAL_TO)} AS mod_b,
                 {rdv(REBAL_FROM)} AS rdv_a, {rdv(REBAL_TO)} AS rdv_b
          FROM documents
        ), agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN mod_a <> mod_b THEN 1 ELSE 0 END) AS BIGINT)
                   AS mv_mod,
                 CAST(SUM(CASE WHEN rdv_a <> rdv_b THEN 1 ELSE 0 END) AS BIGINT)
                   AS mv_rdv
          FROM placed
        )
        SELECT scheme, n AS n_docs, n_moved,
               round(CAST(n_moved AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS moved_frac
        FROM (
          SELECT n, 'mod' AS scheme, mv_mod AS n_moved FROM agg
          UNION ALL
          SELECT n, 'rendezvous' AS scheme, mv_rdv AS n_moved FROM agg
        )
        ORDER BY scheme
    """


QUERIES = {
    "export_rebalance_audit": q_export_rebalance_audit,
    "export_shard_integrity_manifest": q_export_shard_integrity_manifest,
    "export_global_order_rank": q_export_global_order_rank,
    "export_shard_assignment": q_export_shard_assignment,
    "export_byte_budget_shards": q_export_byte_budget_shards,
    "export_packed_windows": q_export_packed_windows,
    "export_length_buckets": q_export_length_buckets,
}
ORACLES = {
    "export_rebalance_audit": _rebalance_sql(),
    "export_shard_integrity_manifest": _MANIFEST_SQL,
    "export_global_order_rank": _GLOBAL_RANK_SQL,
    "export_shard_assignment": _SHARD_SQL,
    "export_byte_budget_shards": _BYTE_SHARD_SQL,
    "export_packed_windows": _packed_sql(),
    "export_length_buckets": _length_buckets_sql(),
}
