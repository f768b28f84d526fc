"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The missing piece between "clean the corpus" and "train the model":
learning the tokenizer itself. Classic byte-pair encoding over a
corpus of words:

    repeat n_merges times:
      count adjacent symbol pairs across the (weighted) word corpus
      merge the most frequent pair everywhere

Determinism contract (what makes this testable to the digit): the
argmax tie-break is (count DESC, left ASC, right ASC) — fully
ordered, so the learned merge list is a pure function of the corpus,
reproducible on any engine/partitioning. `train_bpe` is pytest-pinned
against a pure-Python reference implementation; the per-round pair
count (the distributed workhorse) is ALSO driver-oracle-checked as
`text_bpe_top_pairs` (one round restates in SQL; the full loop's
corpus rewrites are not SQL-expressible, the same boundary as the
other iterative trainers' unrolled oracles — kmeans unrolls in
integers, BPE rewrites arrays).

Scale shape per round:
  1. pair counts: one explode over word symbol arrays + groupBy
     (left, right) with map-side partials, WEIGHTED by word
     frequency — the corpus collapses to its vocabulary first
     (`word_freq_frame`: one groupBy(word)), so round cost scales
     with |vocab|, not corpus tokens. That collapse is what makes
     corpus-scale BPE training tractable: 100 TB of text is ~10^7
     distinct words.
  2. argmax: TakeOrderedAndProject of 1 row.
  3. merge-apply: map-only rewrite of the vocabulary's symbol arrays
     (an Arrow-batched pandas_udf — per-row adjacent-pair collapse is
     a sequential scan, the one thing array higher-order functions
     can't express).
  Driver round-trips once per merge (the merge pair itself — O(1)
  data), exactly like kmeans' centroid loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import ensure_min_partitions, load_table
from searchengine_spark.text.tokenizer import raw_tokens_column, sql_raw_tokens_expr

END = "</w>"  # end-of-word marker, per the original BPE formulation


def word_freq_frame(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(word, freq) — the corpus collapsed to its weighted vocabulary."""
    return (
        docs.select(F.explode(raw_tokens_column(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _symbols(vocab: DataFrame) -> DataFrame:
    """(word, freq, syms array<string>) — chars + end-of-word mark."""
    return vocab.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("syms"),
    )


def pair_counts(symed: DataFrame) -> DataFrame:
    """(left, right, n) — adjacent-pair counts weighted by word freq."""
    pairs = symed.select(
        "freq",
        F.explode(
            F.when(
                F.size("syms") >= 2,
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda l, r: F.struct(l.alias("lhs"), r.alias("rhs")),
                ),
            ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy("p.lhs", "p.rhs").agg(F.sum("freq").alias("n"))


def _apply_merge(symed: DataFrame, left: str, right: str) -> DataFrame:
    """Collapse every adjacent (left, right) into one symbol, left to
    right greedily — the sequential per-word scan, Arrow-batched."""

    @F.pandas_udf("array<string>")
    def merge_udf(syms: pd.Series) -> pd.Series:
        def merge_one(arr):
            out, i, n = [], 0, len(arr)
            while i < n:
                if i + 1 < n and arr[i] == left and arr[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(arr[i])
                    i += 1
            return out

        return syms.map(merge_one)

    return symed.withColumn("syms", merge_udf("syms"))


def train_bpe(
    docs: DataFrame, n_merges: int, *, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns them in learned order.

    Ties break (count DESC, left ASC, right ASC) — deterministic on
    any engine and partitioning."""
    symed = _symbols(word_freq_frame(docs, text_col=text_col)).persist()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (
                pair_counts(symed)
                .orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            left, right = top[0]["lhs"], top[0]["rhs"]
            merges.append((left, right))
            nxt = _apply_merge(symed, left, right).persist()
            nxt.count()  # materialize before dropping the parent
            symed.unpersist()
            symed = nxt
        return merges
    finally:
        symed.unpersist()


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges to one word (driver-side; the distributed
    encode is the same kernel inside _apply_merge)."""
    arr = list(word) + [END]
    for left, right in merges:
        out, i = [], 0
        while i < len(arr):
            if i + 1 < len(arr) and arr[i] == left and arr[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(arr[i])
                i += 1
        arr = out
    return arr


# --------------------------------------------------------------- queries

TOP_PAIRS_K = 20


def q_bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-1 pair statistics (the distributed workhorse of BPE
    training), driver-checked: top-20 adjacent symbol pairs over the
    freq-weighted vocabulary."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    counts = pair_counts(_symbols(word_freq_frame(docs)))
    return counts.orderBy(
        F.desc("n"), F.asc("lhs"), F.asc("rhs")
    ).limit(TOP_PAIRS_K)


QUERIES = {"text_bpe_top_pairs": q_bpe_top_pairs}

ORACLES = {
    "text_bpe_top_pairs": f"""
        WITH vocab AS (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest({sql_raw_tokens_expr("text")}) AS word FROM documents
          ) GROUP BY word
        ),
        symed AS (
          SELECT word, freq, list_append(split(word, ''), '{END}') AS syms
          FROM vocab
        ),
        ex AS (
          SELECT word, freq,
                 generate_subscripts(syms, 1) AS idx,
                 unnest(syms) AS sym
          FROM symed
        )
        SELECT a.sym AS lhs, b.sym AS rhs, CAST(SUM(a.freq) AS BIGINT) AS n
        FROM ex a JOIN ex b ON a.word = b.word AND b.idx = a.idx + 1
        GROUP BY a.sym, b.sym
        ORDER BY n DESC, lhs ASC, rhs ASC
        LIMIT {TOP_PAIRS_K}
    """,
}
