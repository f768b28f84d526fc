"""Text analytics for LLM-data-pipeline curation — quality scoring,
token statistics, language signals, document fingerprints.

All computations are per-document array/string expressions (no
explode, no shuffle except the small groupBy rollups) — at 100 TB
this is a pure map stage over the corpus scan, which is exactly what
you want for a quality-filter pass. Every query has a DuckDB oracle
twin; ratios are rounded to 6 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import ensure_min_partitions, load_table
from searchengine_spark.text.tokenizer import (
    STOPWORDS,
    raw_tokens_column as _raw_tokens,
    sql_raw_tokens_expr,
)

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token counts, stopword ratio,
    mean token length, quality score. Pure map stage (array exprs)."""
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the token array once; re-using the tokenize
    # *expression* would re-run the split per derived column.
    base = ensure_min_partitions(docs).select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        _raw_tokens(F.col("text")).alias("toks"),
        # sum(len(token)) == count of alpha chars — avoids a fold.
        F.length(F.regexp_replace(F.lower("text"), "[^a-z]", "")).alias("alpha_chars"),
    )
    n_tokens = F.size("toks")
    n_stop = F.size(F.filter("toks", lambda w: w.isin(*STOPWORDS)))
    return base.select(
        "doc_id",
        "n_chars",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct_tokens"),
        n_stop.cast("bigint").alias("n_stopwords"),
        F.round(n_stop / n_tokens, 6).alias("stopword_ratio"),
        F.round(F.col("alpha_chars") / n_tokens, 6).alias("avg_token_len"),
        # Simple curation score: longer docs with more lexical variety
        # and fewer stopwords score higher.
        F.round(
            F.log(n_tokens + F.lit(1.0))
            * (F.size(F.array_distinct("toks")) / n_tokens)
            * (F.lit(1.0) - n_stop / n_tokens),
            6,
        ).alias("quality_score"),
    ).filter(F.col("n_tokens") > 0)


def q_token_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token-length histogram (explode + tiny-key agg)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        ensure_min_partitions(docs)
        .select(F.explode(_raw_tokens(F.col("text"))).alias("word"))
        .groupBy(F.length("word").alias("token_len"))
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.countDistinct("word").alias("n_distinct"))
    )


def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram frequency (n-gram language-model stats).

    Bigrams built from materialized token arrays (barrier pattern —
    see operators/dedup.shingle_frame), exploded, counted; top-100 by
    (count desc, bigram) for a deterministic cutoff.
    """
    docs = load_table(spark, sf_dir, "documents")
    toked = ensure_min_partitions(docs).select(_raw_tokens(F.col("text")).alias("toks"))
    toked = toked.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    bigrams = toked.select(
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 2),
                    lambda i: F.concat_ws(
                        " ", F.element_at("toks", i + 1), F.element_at("toks", i + 2)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(100)
    )


def q_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("n_chars") / F.count(F.lit(1)), 6).alias("avg_chars"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint: md5 of the space-joined raw
    token stream. Whitespace/punct/case-insensitive — the first-line
    near-exact dedup key for a crawl corpus."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.array_join(_raw_tokens(F.col("text")), " ")
    return docs.select(
        "doc_id", F.md5(normalized.cast("binary")).alias("fingerprint")
    )


# BPE-ish pre-tokenization pattern (GPT-2 style, RE2/Java-compatible
# subset: no lookarounds): contractions, space-prefixed letter runs,
# digit runs, punctuation runs, residual whitespace.
BPE_PATTERN = "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9']+"


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token COUNTING the way an LLM data pipeline sizes a corpus:
    GPT-2-style regex pre-tokenization (the split BPE merges run
    inside), counted per language. Pure map + tiny-key agg; the
    pattern avoids lookarounds so Java (Spark) and RE2 (DuckDB)
    agree match-for-match."""
    docs = load_table(spark, sf_dir, "documents")
    n_bpe = F.size(F.expr(f"regexp_extract_all(text, \"{BPE_PATTERN}\", 0)")).cast(
        "bigint"
    )
    return (
        docs.select("lang", n_bpe.alias("n_bpe_tokens"), F.col("n_chars"))
        .groupBy("lang")
        .agg(
            F.sum("n_bpe_tokens").alias("total_tokens"),
            F.round(
                F.sum("n_chars") / F.sum("n_bpe_tokens"), 6
            ).alias("chars_per_token"),
        )
    )


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY audit per language: bytes/token and
    tokens/word over the BPE-ish pre-tokenization — the standard
    multilingual-corpus health check (a language whose fertility is
    far above the corpus median is under-served by the tokenizer:
    its documents cost more context window per word, and its
    token-budget share shrinks relative to its text share).

    bytes = UTF-8 octets (what storage and most tokenizer-training
    budgets count); words = the lowercase alpha runs of the shared
    raw-tokenize twin; tokens = the same GPT-2-style regex count as
    text_bpe_token_counts. Pure map + one tiny keyed agg — at 100 TB
    this rides the corpus scan like every other signal here."""
    docs = load_table(spark, sf_dir, "documents")
    n_bpe = F.size(
        F.expr(f"regexp_extract_all(text, \"{BPE_PATTERN}\", 0)")
    ).cast("bigint")
    n_words = F.size(_raw_tokens(F.col("text"))).cast("bigint")
    per_doc = docs.select(
        "lang",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        n_bpe.alias("n_bpe"),
        n_words.alias("n_words"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum("n_bpe").cast("bigint").alias("total_tokens"),
        F.sum("n_words").cast("bigint").alias("total_words"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_bytes",
        "total_tokens",
        "total_words",
        F.round(
            F.when(
                F.col("total_tokens") > 0,
                F.col("total_bytes") / F.col("total_tokens"),
            ),
            6,
        ).alias("bytes_per_token"),
        F.round(
            F.when(
                F.col("total_words") > 0,
                F.col("total_tokens") / F.col("total_words"),
            ),
            6,
        ).alias("tokens_per_word"),
    )


_RAW_TOK_SQL = sql_raw_tokens_expr("text")

def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document — the
    classic readability pair, a standard quality-scoring feature for
    training-data curation. Pure map stage (regex counts only).

    Deterministic proxies (both engines, same regexes):
    words = lowercase alpha runs; sentences = runs of [.!?] (min 1);
    syllables = vowel-group count, with all-consonant words floored
    at 1 syllable."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        _raw_tokens(F.col("text")).alias("toks"),
        F.regexp_count(F.lower("text"), F.lit("[aeiouy]+")).alias("vg"),
        F.greatest(
            F.regexp_count(F.coalesce("text", F.lit("")), F.lit("[.!?]+")),
            F.lit(1),
        ).alias("n_sentences"),
    )
    n_words = F.size("toks")
    no_vowel = F.size(F.filter("toks", lambda w: ~w.rlike("[aeiouy]")))
    syll = (F.col("vg") + no_vowel).cast("bigint")
    wps = n_words.cast("double") / F.col("n_sentences")
    spw = syll.cast("double") / n_words
    return base.filter(n_words > 0).select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.col("n_sentences").cast("bigint").alias("n_sentences"),
        syll.alias("n_syllables"),
        F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
        ).alias("flesch_ease"),
        F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
        ).alias("fk_grade"),
    )


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the character distribution —
    the compressibility-style quality signal (boilerplate and
    repeated templates sit at low entropy; natural prose ~4.0-4.5
    bits/char). One explode + two keyed aggs; per-term products are
    cast to DECIMAL(28,12) before the sum so the fold is
    order-independent and both engines agree bit-for-bit."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").over(Window.partitionBy("doc_id"))
    term = ((F.col("c") / n) * F.log2(F.col("c") / n)).cast("decimal(28,12)")
    return (
        counts.select("doc_id", F.col("c").alias("c"), term.alias("t"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_chars_counted"),
            F.round(-F.sum("t").cast("double"), 6).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


def compression_ratio(docs: DataFrame, *, level: int = 6) -> DataFrame:
    """zlib-compressibility signal: compressed_len / raw_len per doc
    (Arrow-batched mapInPandas; fixed level => deterministic bytes).
    Highly compressible text (< ~0.3) is boilerplate/repetition —
    the complementary signal to entropy, sensitive to LONG-range
    repetition a unigram entropy can't see. No SQL engine exposes
    zlib, so this is pytest-covered rather than oracle-checked."""
    import zlib

    import pandas as pd

    def batches(it):
        for pdf in it:
            texts = pdf["text"]
            raw = [len(t.encode("utf-8")) if t else 0 for t in texts]
            comp = [
                len(zlib.compress(t.encode("utf-8"), level)) if t else 0
                for t in texts
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_bytes": raw,
                    "compression_ratio": [
                        round(c / r, 6) if r else None for c, r in zip(comp, raw)
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        batches, "doc_id long, raw_bytes long, compression_ratio double"
    )


def q_source_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto contribution analysis per source: which sources carry
    80% of the corpus characters. One keyed agg onto the |sources|
    domain, then cumulative windows over that TINY frame (never the
    corpus); the head-80 flag uses the cumulative share BEFORE the
    row so the source that crosses the threshold is still included.
    All shares divide exact integer sums — cross-engine identical."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    w_cum = Window.orderBy(F.desc("total_chars"), F.asc("source")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = F.sum("total_chars").over(w_cum)
    grand = F.sum("total_chars").over(w_all)
    return per_src.select(
        "source",
        "n_docs",
        "total_chars",
        F.round(cum.cast("double") / grand.cast("double"), 6).alias("cum_share"),
        (
            (cum - F.col("total_chars")).cast("double")
            / grand.cast("double")
            < 0.8
        )
        .cast("int")
        .alias("in_head80"),
    )


_SOURCE_PARETO_SQL = """
WITH per_src AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY source
)
SELECT source, n_docs, total_chars,
       round(CAST(SUM(total_chars) OVER w AS DOUBLE)
             / CAST(SUM(total_chars) OVER () AS DOUBLE), 6) AS cum_share,
       CASE WHEN CAST(SUM(total_chars) OVER w - total_chars AS DOUBLE)
                 / CAST(SUM(total_chars) OVER () AS DOUBLE) < 0.8
            THEN 1 ELSE 0 END AS in_head80
FROM per_src
WINDOW w AS (ORDER BY total_chars DESC, source ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


ZIPF_TOP_N = 100


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency audit: OLS slope of ln(count) on ln(rank)
    over the top-100 raw tokens — natural corpora sit near slope −1;
    a corpus of templated/boilerplate text (or one mangled by a bad
    extraction pass) drifts far off, making this a cheap whole-corpus
    health probe. Per-row ln runs on identical (rank, count) integers
    in both engines; every OLS accumulator term is rounded to 12
    decimals and summed as DECIMAL(28,12), so the 100-term sums are
    order-independent exactly like the repo's money sums — no float
    fold ever depends on execution order.

    Scale shape: one token count agg + TakeOrderedAndProject(100);
    everything after is a 100-row frame."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(_raw_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(ZIPF_TOP_N)
    )
    w = Window.orderBy(F.desc("n"), F.asc("word"))  # 100 rows
    xy = counts.withColumn("rank", F.row_number().over(w)).select(
        F.round(F.log(F.col("rank").cast("double")), 12).alias("x"),
        F.round(F.log(F.col("n").cast("double")), 12).alias("y"),
    )
    dec = "decimal(28,12)"
    sums = xy.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 12).cast(dec))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 12).cast(dec))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("y") * F.col("y"), 12).cast(dec))
        .cast("double")
        .alias("syy"),
    )
    kd = F.col("k").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / kd
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / kd
    vary = F.col("syy") - F.col("sy") * F.col("sy") / kd
    # degenerate corpus (single word / identical counts): no slope —
    # NULL stats, zipf_like false, instead of an ANSI divide-by-zero
    ok = (varx > F.lit(0.0)) & (vary > F.lit(0.0))
    slope = F.when(ok, cov / varx)
    return sums.select(
        F.col("k").cast("bigint").alias("n_words"),
        F.round(slope, 6).alias("slope"),
        F.round(
            F.when(ok, (F.col("sy") - slope * F.col("sx")) / kd), 6
        ).alias("intercept"),
        F.round(F.when(ok, cov * cov / (varx * vary)), 6).alias("r2"),
        F.coalesce(
            (slope >= F.lit(-1.5)) & (slope <= F.lit(-0.5)), F.lit(False)
        ).alias("zipf_like"),
    )


_ZIPF_SQL = f"""
WITH counts AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest({_RAW_TOK_SQL}) AS word FROM documents)
  GROUP BY word
  ORDER BY n DESC, word ASC
  LIMIT {ZIPF_TOP_N}
),
xy AS (
  SELECT round(ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word ASC)
                       AS DOUBLE)), 12) AS x,
         round(ln(CAST(n AS DOUBLE)), 12) AS y
  FROM counts
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(x * y, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(y * y, 12) AS DECIMAL(28,12))) AS DOUBLE) AS syy
  FROM xy
)
SELECT k AS n_words,
       CASE WHEN ok THEN round(cov / varx, 6) END AS slope,
       CASE WHEN ok THEN round((sy - (cov / varx) * sx)
                               / CAST(k AS DOUBLE), 6) END AS intercept,
       CASE WHEN ok THEN round((cov * cov) / (varx * vary), 6) END AS r2,
       COALESCE((cov / varx) >= -1.5 AND (cov / varx) <= -0.5
                AND ok, FALSE) AS zipf_like
FROM (
  SELECT *,
         (sxy - sx * sy / CAST(k AS DOUBLE)) AS cov,
         (sxx - sx * sx / CAST(k AS DOUBLE)) AS varx,
         (syy - sy * sy / CAST(k AS DOUBLE)) AS vary,
         (sxx - sx * sx / CAST(k AS DOUBLE)) > 0.0
         AND (syy - sy * sy / CAST(k AS DOUBLE)) > 0.0 AS ok
  FROM sums
)
"""


# Heaps'-law checkpoints: hash-bucket cutoffs (of sampling.N_BUCKETS
# = 10000) giving ~1%, ~3.2%, 10%, ~32%, 100% document prefixes —
# log-spaced so the log-log OLS x values spread evenly.
HEAPS_CUTS = (100, 316, 1000, 3162, 10000)
HEAPS_SALT = "heaps"


def q_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth probe: V(n) ~ K * n^beta — how fast
    the distinct-token vocabulary grows as the corpus grows. Natural
    text sits near beta ~ 0.4-0.6; templated/duplicated corpora
    (vocabulary saturates) or OCR-noise corpora (vocabulary explodes)
    drift far off, making this the growth-side complement to the Zipf
    rank-frequency probe. Checkpoints are DETERMINISTIC HASH PREFIXES
    of the document set (md5 bucket < cut), not scan order, so the
    curve is reproducible on any cluster layout — and the whole
    computation is order-independent: a word's first-seen position is
    just MIN(bucket) over its occurrences, so V(cut) = #words with
    min-bucket < cut needs one keyed agg, never a sequential pass.

    Scale shape: one tokenize scan (explode) feeding two aggregates —
    the per-word MIN(bucket) (vocabulary-sized groupBy on the uniform
    word key) and |cuts| conditional counts — plus a |cuts|-row OLS
    with the Zipf probe's DECIMAL(28,12) order-independent
    accumulators. No windows, no sorts.
    """
    from searchengine_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), salt=HEAPS_SALT)
    toks = docs.select(
        b.alias("b"), F.explode(_raw_tokens(F.col("text"))).alias("word")
    )
    wmin = toks.groupBy("word").agg(F.min("b").alias("fb"))
    vstats = wmin.agg(
        *[
            F.sum((F.col("fb") < c).cast("long")).alias(f"_v{c}")
            for c in HEAPS_CUTS
        ]
    )
    tstats = toks.agg(
        *[
            F.sum((F.col("b") < c).cast("long")).alias(f"_t{c}")
            for c in HEAPS_CUTS
        ]
    )
    dstats = docs.agg(
        *[F.sum((b < c).cast("long")).alias(f"_d{c}") for c in HEAPS_CUTS]
    )
    stacked = ", ".join(
        f"CAST({c} AS BIGINT), _d{c}, _t{c}, _v{c}" for c in HEAPS_CUTS
    )
    curve = (
        dstats.crossJoin(F.broadcast(tstats))
        .crossJoin(F.broadcast(vstats))
        .selectExpr(
            f"stack({len(HEAPS_CUTS)}, {stacked})"
            " AS (cut_bucket, n_docs, n_tokens, vocab)"
        )
        .select(
            "cut_bucket",
            F.coalesce(F.col("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("vocab"), F.lit(0)).alias("vocab"),
        )
    )
    xy = curve.filter(
        (F.col("n_tokens") > 0) & (F.col("vocab") > 0)
    ).select(
        F.round(F.log(F.col("n_tokens").cast("double")), 12).alias("x"),
        F.round(F.log(F.col("vocab").cast("double")), 12).alias("y"),
    )
    dec = "decimal(28,12)"
    sums = xy.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 12).cast(dec))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 12).cast(dec))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("y") * F.col("y"), 12).cast(dec))
        .cast("double")
        .alias("syy"),
    )
    kd = F.col("k").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / kd
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / kd
    vary = F.col("syy") - F.col("sy") * F.col("sy") / kd
    ok = (F.col("k") >= 2) & (varx > F.lit(0.0)) & (vary > F.lit(0.0))
    beta = F.when(ok, cov / varx)
    ols = sums.select(
        F.round(beta, 6).alias("heaps_beta"),
        F.round(F.when(ok, cov * cov / (varx * vary)), 6).alias("r2"),
    )
    return curve.crossJoin(F.broadcast(ols)).orderBy("cut_bucket")


def _heaps_sql() -> str:
    from searchengine_spark.operators.sampling import _bucket_sql

    cuts_values = ", ".join(f"({c})" for c in HEAPS_CUTS)
    return f"""
WITH tok AS (
  SELECT {_bucket_sql("doc_id", HEAPS_SALT)} AS b,
         unnest({_RAW_TOK_SQL}) AS word
  FROM documents
),
wmin AS (SELECT word, MIN(b) AS fb FROM tok GROUP BY word),
cuts(cut_bucket) AS (VALUES {cuts_values}),
dstats AS (
  SELECT c.cut_bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents d JOIN cuts c ON {_bucket_sql("d.doc_id", HEAPS_SALT)} < c.cut_bucket
  GROUP BY c.cut_bucket
),
tstats AS (
  SELECT c.cut_bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM tok t JOIN cuts c ON t.b < c.cut_bucket GROUP BY c.cut_bucket
),
vstats AS (
  SELECT c.cut_bucket, CAST(COUNT(*) AS BIGINT) AS vocab
  FROM wmin w JOIN cuts c ON w.fb < c.cut_bucket GROUP BY c.cut_bucket
),
curve AS (
  SELECT CAST(c.cut_bucket AS BIGINT) AS cut_bucket,
         COALESCE(d.n_docs, 0) AS n_docs,
         COALESCE(t.n_tokens, 0) AS n_tokens,
         COALESCE(v.vocab, 0) AS vocab
  FROM cuts c
  LEFT JOIN dstats d USING (cut_bucket)
  LEFT JOIN tstats t USING (cut_bucket)
  LEFT JOIN vstats v USING (cut_bucket)
),
xy AS (
  SELECT round(ln(CAST(n_tokens AS DOUBLE)), 12) AS x,
         round(ln(CAST(vocab AS DOUBLE)), 12) AS y
  FROM curve WHERE n_tokens > 0 AND vocab > 0
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(x * y, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(y * y, 12) AS DECIMAL(28,12))) AS DOUBLE) AS syy
  FROM xy
),
ols AS (
  SELECT CASE WHEN ok THEN round(cov / varx, 6) END AS heaps_beta,
         CASE WHEN ok THEN round((cov * cov) / (varx * vary), 6) END AS r2
  FROM (
    SELECT (sxy - sx * sy / CAST(k AS DOUBLE)) AS cov,
           (sxx - sx * sx / CAST(k AS DOUBLE)) AS varx,
           (syy - sy * sy / CAST(k AS DOUBLE)) AS vary,
           k >= 2
           AND (sxx - sx * sx / CAST(k AS DOUBLE)) > 0.0
           AND (syy - sy * sy / CAST(k AS DOUBLE)) > 0.0 AS ok
    FROM sums
  )
)
SELECT curve.*, ols.heaps_beta, ols.r2 FROM curve, ols
ORDER BY cut_bucket
"""


QUERIES = {
    "text_heaps_vocab_growth": q_heaps_vocab_growth,
    "text_zipf_slope": q_zipf_slope,
    "text_source_pareto": q_source_pareto,
    "text_char_entropy": q_char_entropy,
    "text_readability": q_readability,
    "text_bpe_token_counts": q_bpe_token_counts,
    "text_tokenizer_fertility": q_tokenizer_fertility,
    "text_stats": q_text_stats,
    "text_top_bigrams": q_top_bigrams,
    "text_token_length_hist": q_token_length_hist,
    "text_lang_distribution": q_lang_distribution,
    "text_doc_fingerprint": q_doc_fingerprint,
}

ORACLES = {
    "text_heaps_vocab_growth": _heaps_sql(),
    "text_zipf_slope": _ZIPF_SQL,
    "text_source_pareto": _SOURCE_PARETO_SQL,
    "text_char_entropy": """
        WITH chars AS (
          SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
        ), counts AS (
          SELECT doc_id, ch, COUNT(*) AS c
          FROM chars WHERE ch <> '' GROUP BY doc_id, ch
        ), terms AS (
          SELECT doc_id, c,
                 CAST((c / SUM(c) OVER (PARTITION BY doc_id))
                      * log2(c / SUM(c) OVER (PARTITION BY doc_id))
                      AS DECIMAL(28,12)) AS t
          FROM counts
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_chars_counted,
               round(-CAST(SUM(t) AS DOUBLE), 6) AS entropy_bits
        FROM terms GROUP BY doc_id
        ORDER BY doc_id
    """,
    "text_readability": f"""
        WITH base AS (
          SELECT doc_id,
                 {sql_raw_tokens_expr("text")} AS toks,
                 len(regexp_extract_all(lower(text), '[aeiouy]+')) AS vg,
                 greatest(len(regexp_extract_all(COALESCE(text, ''), '[.!?]+')), 1) AS n_sentences
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 len(toks) AS n_words,
                 n_sentences,
                 vg + len(list_filter(toks, w -> NOT regexp_matches(w, '[aeiouy]')))
                   AS n_syllables
          FROM base
          WHERE len(toks) > 0
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(n_syllables AS BIGINT) AS n_syllables,
               round(206.835 - 1.015 * (n_words::DOUBLE / n_sentences)
                     - 84.6 * (n_syllables::DOUBLE / n_words), 6) AS flesch_ease,
               round(0.39 * (n_words::DOUBLE / n_sentences)
                     + 11.8 * (n_syllables::DOUBLE / n_words) - 15.59, 6) AS fk_grade
        FROM m
    """,
    "text_bpe_token_counts": f"""
        WITH t AS (
          SELECT lang, n_chars,
                 len(regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}')) AS n_bpe
          FROM documents
        )
        SELECT lang,
               CAST(SUM(n_bpe) AS BIGINT) AS total_tokens,
               round(SUM(n_chars) * 1.0 / SUM(n_bpe), 6) AS chars_per_token
        FROM t GROUP BY lang
    """,
    "text_tokenizer_fertility": f"""
        WITH t AS (
          SELECT lang,
                 CAST(strlen(text) AS BIGINT) AS n_bytes,
                 CAST(len(regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_bpe,
                 CAST(len({_RAW_TOK_SQL}) AS BIGINT) AS n_words
          FROM documents
        ),
        agg AS (
          SELECT lang,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
                 CAST(SUM(n_bpe) AS BIGINT) AS total_tokens,
                 CAST(SUM(n_words) AS BIGINT) AS total_words
          FROM t GROUP BY lang
        )
        SELECT lang, n_docs, total_bytes, total_tokens, total_words,
               round(CASE WHEN total_tokens > 0
                     THEN CAST(total_bytes AS DOUBLE) / total_tokens END, 6)
                 AS bytes_per_token,
               round(CASE WHEN total_words > 0
                     THEN CAST(total_tokens AS DOUBLE) / total_words END, 6)
                 AS tokens_per_word
        FROM agg
    """,
    "text_stats": f"""
        WITH base AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 {_RAW_TOK_SQL} AS toks,
                 length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha_chars
          FROM documents
        )
        SELECT doc_id, n_chars,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct_tokens,
               len(list_filter(toks, w -> w IN ({_STOP_SQL}))) AS n_stopwords,
               round(len(list_filter(toks, w -> w IN ({_STOP_SQL}))) / len(toks), 6) AS stopword_ratio,
               round(alpha_chars / len(toks), 6) AS avg_token_len,
               round(ln(len(toks) + 1.0)
                     * (len(list_distinct(toks)) / len(toks))
                     * (1.0 - len(list_filter(toks, w -> w IN ({_STOP_SQL}))) / len(toks)), 6)
                 AS quality_score
        FROM base WHERE len(toks) > 0
    """,
    "text_top_bigrams": f"""
        WITH toked AS (
          SELECT {_RAW_TOK_SQL} AS toks FROM documents
        ),
        bg AS (
          SELECT unnest(CASE WHEN len(toks) >= 2
                        THEN list_transform(range(1, len(toks)),
                                            i -> toks[i] || ' ' || toks[i+1])
                        ELSE [] END) AS bigram
          FROM toked
        )
        SELECT bigram, COUNT(*) AS n
        FROM bg GROUP BY bigram
        ORDER BY n DESC, bigram ASC
        LIMIT 100
    """,
    "text_token_length_hist": f"""
        WITH tok AS (
          SELECT unnest({_RAW_TOK_SQL}) AS word FROM documents
        )
        SELECT length(word)::INT AS token_len, COUNT(*) AS n_tokens,
               COUNT(DISTINCT word) AS n_distinct
        FROM tok GROUP BY 1
    """,
    "text_lang_distribution": """
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               round(SUM(n_chars) / COUNT(*), 6) AS avg_chars
        FROM documents GROUP BY lang
    """,
    "text_doc_fingerprint": f"""
        SELECT doc_id, md5(array_to_string({_RAW_TOK_SQL}, ' ')) AS fingerprint
        FROM documents
    """,
}
