"""Exact distributed heavy hitters — Misra-Gries candidates + exact
recount (the two-phase pattern for frequency mining over keys too
numerous to hash-aggregate, e.g. URLs/domains/tokens at web scale).

Why not just groupBy().count()? For word counts it IS fine (map-side
partial aggregation bounds the shuffle), and that's exactly what the
oracle does. The two-phase shape exists for the regime where even
the partial-agg hash table can't hold the key universe: phase 1 runs
a bounded-memory Misra-Gries sketch per partition (capacity k
counters, whatever the cardinality), phase 2 exactly recounts ONLY
the candidate set via a broadcast semi-join.

Correctness is exact, not approximate: if an item has global
frequency >= theta of total, then in at least one partition its
local frequency is >= theta of that partition (pigeonhole over the
weighted average), and Misra-Gries with capacity k > 1/theta retains
every item whose local frequency exceeds 1/k — so no true heavy
hitter can be missed, and the recount discards any false candidate.
The driver check therefore compares against a plain GROUP BY/HAVING
oracle and must match EXACTLY.

This is also the repo's reference use of mapInPandas for partial
*sketches* (bounded state per partition, tiny output), complementing
the multimodal (per-row transform) and UDAF (per-group) examples.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import ensure_min_partitions, load_table
from searchengine_spark.text.tokenizer import (
    raw_tokens_column as _raw_tokens,
    sql_raw_tokens_expr,
)

THETA = 0.002  # heavy = >= 0.2% of all tokens
MG_CAPACITY = 1024  # > 1/THETA, so the sketch can't miss a heavy hitter


def _mg_partition_sketch(capacity: int):
    import pandas as pd

    def sketch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for w in pdf["word"]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < capacity:
                    counters[w] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"word": list(counters.keys())})

    return sketch


def heavy_hitters(
    words: DataFrame,
    *,
    theta: float = THETA,
    capacity: int = MG_CAPACITY,
) -> DataFrame:
    """Exact items with frequency >= theta from a (word) stream.

    Output: (word, n_occurrences, frac) — identical to the full
    GROUP BY answer, computed with bounded phase-1 memory.
    """
    if capacity <= 1.0 / theta:
        raise ValueError("need capacity > 1/theta for the no-miss guarantee")
    words = ensure_min_partitions(words.select("word"))
    candidates = (
        words.mapInPandas(_mg_partition_sketch(capacity), "word string")
        .distinct()
    )
    total = words.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        words.join(F.broadcast(candidates), "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") >= F.lit(theta) * F.col("n_total"))
        .select(
            "word",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("n_total"), 6).alias("frac"),
        )
    )


def q_heavy_hitter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(_raw_tokens(F.col("text"))).alias("word"))
    return heavy_hitters(words)


_RAW = sql_raw_tokens_expr("text")

QUERIES = {"text_heavy_hitter_words": q_heavy_hitter_words}

ORACLES = {
    "text_heavy_hitter_words": f"""
        WITH words AS (
          SELECT unnest({_RAW}) AS word FROM documents
        ),
        total AS (SELECT COUNT(*) AS n_total FROM words)
        SELECT word,
               COUNT(*) AS n_occurrences,
               round(COUNT(*) * 1.0 / t.n_total, 6) AS frac
        FROM words, total t
        GROUP BY word, t.n_total
        HAVING COUNT(*) >= {THETA} * t.n_total
    """,
}
