"""Count-Min sketch as pure relational algebra — the mergeable
counter for key universes too large to count exactly.

Complements the other sketch families: Misra-Gries
(`operators/heavy_hitters.py`) finds WHICH items are heavy but needs
a second exact pass for counts; HLL (`operators/approx.py`) counts
DISTINCT; CMS answers point FREQUENCY queries from fixed D*W state
with one-sided error (estimate >= truth always; overestimate <= eN
with probability 1-delta for D = ln(1/delta) rows of W = e/eps
columns, Cormode & Muthukrishnan 2005).

Spark-first shape: the "sketch" is literally a (row, col, cnt)
DataFrame — build is ONE keyed agg over a D-way explode (map-side
partials shrink every partition to <= D*W cells before the shuffle,
the same reason the sketch works at all), point queries are a
broadcast join of the probe set onto the D*W table + a per-word MIN.
Merging shards/streams is just summing cnt by (row, col) — the
associativity the structure exists for.

Unlike HLL, every step here is md5-bucket integer arithmetic, so the
ESTIMATES THEMSELVES hash-check against the DuckDB twin — not just
an error-bound boolean. W=16 is deliberately far below the ~30-word
corpus vocabulary so collisions (and the min-over-rows recovery)
actually happen in the checked output; production sizing is W=2^20,
D=4-6 and changes nothing structurally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators.sampling import hash_bucket
from searchengine_spark.text.tokenizer import (
    raw_tokens_column as _raw_tokens,
    sql_raw_tokens_expr,
)

D = 4  # hash rows
W = 16  # columns per row — tiny on purpose, see docstring


def _col_for(word, i: int):
    return hash_bucket(word, n_buckets=W, salt=f"cms{i}")


def cms_build(words: DataFrame) -> DataFrame:
    """(ri, cj, cnt): the D x W counter table from a (word) stream."""
    cells = [
        F.struct(
            F.lit(i).alias("ri"), _col_for(F.col("word"), i).alias("cj")
        )
        for i in range(D)
    ]
    return (
        words.select(F.explode(F.array(*cells)).alias("c"))
        .groupBy(F.col("c.ri").alias("ri"), F.col("c.cj").alias("cj"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame) -> DataFrame:
    """(word, cms_est): min-over-rows point estimates for a probe
    set. The sketch side is D*W rows — always the broadcast side."""
    pc = probes.select(
        "word",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ri"),
                        _col_for(F.col("word"), i).alias("cj"),
                    )
                    for i in range(D)
                ]
            )
        ).alias("c"),
    ).select("word", "c.ri", "c.cj")
    return (
        pc.join(F.broadcast(sketch), ["ri", "cj"])
        .groupBy("word")
        .agg(F.min("cnt").alias("cms_est"))
    )


def q_cms_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS point estimates for every vocabulary word vs exact truth.
    over_ok (estimate >= truth) is the structural one-sided-error
    guarantee; with W=16 < vocab some words genuinely overestimate,
    and those exact overestimates are part of the hash."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(_raw_tokens(F.col("text"))).alias("word"))
    sketch = cms_build(words)
    truth = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_true"))
    est = cms_estimate(sketch, truth.select("word"))
    return (
        truth.join(est, "word")
        .select(
            "word",
            F.col("n_true").cast("bigint").alias("n_true"),
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") >= F.col("n_true")).alias("over_ok"),
        )
        .orderBy("word")
    )


_RAW = sql_raw_tokens_expr("text")


def _cms_sql() -> str:
    bucket = (
        "('0x' || substr(md5('cms' || CAST(r.i AS VARCHAR) || {w}), 1, 15))"
        f"::BIGINT % {W}"
    )
    return f"""
        WITH words AS (
          SELECT unnest({_RAW}) AS word FROM documents
        ),
        cells AS (
          SELECT r.i AS ri, {bucket.format(w='word')} AS cj
          FROM words, range({D}) r(i)
        ),
        sketch AS (
          SELECT ri, cj, COUNT(*) AS cnt FROM cells GROUP BY ri, cj
        ),
        truth AS (
          SELECT word, COUNT(*) AS n_true FROM words GROUP BY word
        ),
        pc AS (
          SELECT t.word, r.i AS ri, {bucket.format(w='t.word')} AS cj
          FROM truth t, range({D}) r(i)
        ),
        est AS (
          SELECT pc.word, MIN(s.cnt) AS cms_est
          FROM pc JOIN sketch s ON s.ri = pc.ri AND s.cj = pc.cj
          GROUP BY pc.word
        )
        SELECT t.word,
               CAST(t.n_true AS BIGINT) AS n_true,
               CAST(e.cms_est AS BIGINT) AS cms_est,
               e.cms_est >= t.n_true AS over_ok
        FROM truth t JOIN est e USING (word)
        ORDER BY word
    """


QUERIES = {"approx_cms_word_counts": q_cms_word_counts}
ORACLES = {"approx_cms_word_counts": _cms_sql()}
