"""Fuzzy (edit-distance) term matching via SymSpell deletion variants.

Gives the search engine typo tolerance (the reference has none — its
query terms either hit the vocabulary or silently contribute nothing,
/root/reference/searchenginespark.py:236-249), with a candidate
generation scheme that scales: every vocabulary word and every query
term expands to its single-character-deletion variants, and candidate
pairs come from an EQUI-JOIN on the shared variant. For Levenshtein
distance <= 1 this is exhaustive (a substitution deletes the same
position on both sides; an insert/delete deletes on one side and
matches the other verbatim), so the final levenshtein() filter only
discards, never misses.

Scale shape: the variant explode multiplies the VOCABULARY (orders of
magnitude smaller than the corpus) by ~avg word length; the join is a
uniform-key equi-join. The naive alternative — levenshtein() over
vocab x query terms — is a cartesian product per query term and is
exactly what the DuckDB oracle does (fine at oracle scale, ruinous on
a 100 TB vocabulary); the hash match proves the pruned join loses
nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Mixed probe set: exact vocabulary hits (dist 0), one-edit typos of
# common corpus words (substitution, insertion, trailing addition),
# and one term with no vocabulary word within distance 1.
FUZZY_QUERY_TERMS = ("spark", "joim", "windoe", "fastt", "tabel", "qqqqq")
MAX_DIST = 1


def deletion_variants(col: str) -> Column:
    """array<string>: the word itself plus every single-character
    deletion (SymSpell candidate key set for edit distance 1).
    ``col`` is a column NAME (interpolated into a SQL lambda)."""
    deletions = F.expr(
        "transform(sequence(1, length({0})), i -> "
        "concat(substring({0}, 1, i-1), substring({0}, i+1, length({0})-i)))".format(col)
    )
    return F.array_union(F.array(F.col(col)), deletions)


def _variant_frame(df: DataFrame, word_col: str, out_col: str) -> DataFrame:
    return df.select(
        F.col(word_col),
        F.explode(deletion_variants(word_col)).alias(out_col),
    )


def fuzzy_term_matches(
    vocab: DataFrame,
    terms: tuple[str, ...] | list[str],
    *,
    word_col: str = "word",
    max_dist: int = MAX_DIST,
) -> DataFrame:
    """(term, word, dist, doc_freq) for vocabulary words within
    ``max_dist`` edits of each query term.

    ``vocab``: (word, doc_freq) — e.g. idf_values. The query-term
    variant set is tiny and broadcasts; distinct() collapses pairs
    that share several variants before the levenshtein filter runs.
    """
    if max_dist != 1:
        raise ValueError("deletion-variant candidates cover max_dist=1 only")
    spark = vocab.sparkSession
    qterms = spark.createDataFrame([(t,) for t in terms], f"term string")
    cand = (
        _variant_frame(vocab.select(word_col), word_col, "variant")
        .join(
            F.broadcast(_variant_frame(qterms, "term", "variant")),
            "variant",
        )
        .select("term", word_col)
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("term", word_col).cast("bigint"))
        .filter(F.col("dist") <= max_dist)
        .join(vocab, word_col)
        .select("term", word_col, "dist", "doc_freq")
    )


# ------------------------------------------------------- registry glue


def q_fuzzy_term_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from searchengine_spark.index.queries import _index

    vocab = _index(spark, sf_dir).idf_values.select("word", "doc_freq")
    return fuzzy_term_matches(vocab, FUZZY_QUERY_TERMS)


QUERIES = {"se_fuzzy_term_match": q_fuzzy_term_match}


def _oracle() -> str:
    from searchengine_spark.index.queries import _TOK_CTE

    terms = ", ".join(f"'{t}'" for t in FUZZY_QUERY_TERMS)
    return f"""{_TOK_CTE},
    vocab AS (
      SELECT word, count(DISTINCT doc_id)::BIGINT AS doc_freq
      FROM tok GROUP BY word
    )
    SELECT q.term, v.word,
           CAST(levenshtein(q.term, v.word) AS BIGINT) AS dist,
           doc_freq
    FROM (SELECT unnest([{terms}]) AS term) q
    CROSS JOIN vocab v
    WHERE levenshtein(q.term, v.word) <= {MAX_DIST}
    """


ORACLES = {"se_fuzzy_term_match": _oracle()}
