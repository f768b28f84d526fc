"""Fuzzy (edit-distance) term matching via SymSpell deletion variants
(Garbe's public symmetric-delete spelling-correction algorithm),
re-expressed as a Spark equi-join.

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


def _deletions_expr(base: str) -> str:
    """SQL for the array of single-character deletions of ``base``
    (a SQL string expression)."""
    return (
        "transform(sequence(1, length({0})), i -> "
        "concat(substring({0}, 1, i-1), substring({0}, i+1, length({0})-i)))"
    ).format(base)


def deletion_variants(col: str, *, max_deletes: int = 1) -> Column:
    """array<string>: the word plus every way of deleting up to
    ``max_deletes`` characters (SymSpell candidate key set for edit
    distance == max_deletes). ``col`` is a column NAME (interpolated
    into SQL lambdas). Depth 2 nests the deletion transform over each
    depth-1 variant and flattens — still a per-row expression, no
    join, ~len^2/2 keys per word."""
    if max_deletes not in (1, 2):
        raise ValueError("max_deletes must be 1 or 2")
    d1 = F.expr(_deletions_expr(col))
    out = F.array_union(F.array(F.col(col)), d1)
    if max_deletes == 2:
        d2 = F.expr(
            f"flatten(transform({_deletions_expr(col)}, v -> {_deletions_expr('v')}))"
        )
        out = F.array_union(out, d2)
    return F.array_distinct(out)


def _variant_frame(
    df: DataFrame, word_col: str, out_col: str, *, max_deletes: int = 1
) -> DataFrame:
    return df.select(
        F.col(word_col),
        F.explode(deletion_variants(word_col, max_deletes=max_deletes)).alias(out_col),
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
    ``max_dist`` 1 or 2 — depth-d deletion sets on both sides are
    exhaustive for Levenshtein distance <= d (every edit script of
    length <= d factors into <= d deletions on each side reaching a
    common string), so the post-join filter only discards.
    """
    if max_dist not in (1, 2):
        raise ValueError("deletion-variant candidates cover max_dist 1 or 2")
    spark = vocab.sparkSession
    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    cand = (
        _variant_frame(vocab.select(word_col), word_col, "variant", max_deletes=max_dist)
        .join(
            F.broadcast(
                _variant_frame(qterms, "term", "variant", max_deletes=max_dist)
            ),
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


def correct_terms_batch(
    vocab: DataFrame,
    terms: list[str] | tuple[str, ...],
    *,
    word_col: str = "word",
    max_dist: int = MAX_DIST,
) -> dict[str, str | None]:
    """Best in-vocabulary correction per term, for a whole batch in
    ONE variant join (the batch-serving twin of the per-term scan in
    phrase.suggest_terms — same choice rule: min distance, then max
    doc_freq, then lexicographic; None = nothing within reach).

    In-vocabulary terms map to themselves (distance 0 always wins).
    The result is terms-sized — collecting it is a driver-side
    lookup, not a data motion.
    """
    from pyspark.sql import Window

    matches = fuzzy_term_matches(vocab, tuple(dict.fromkeys(terms)), word_col=word_col, max_dist=max_dist)
    w = Window.partitionBy("term").orderBy(
        F.asc("dist"), F.desc("doc_freq"), F.asc(word_col)
    )
    best = {
        r["term"]: r[word_col]
        for r in matches.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .collect()
    }
    return {t: best.get(t) for t in terms}


def search_many_corrected(
    index,
    queries: dict[str, str | list[str]],
    k: int = 10,
    *,
    max_dist: int = MAX_DIST,
    **search_kwargs,
):
    """Batched BM25 with batched typo correction: tokenize every
    query, correct ALL unknown terms via one SymSpell variant join,
    then score the corrected batch in one pass (bm25.search_many).
    Returns (results, corrections) where corrections maps each
    out-of-vocabulary term to its replacement (or None if dropped).
    """
    from searchengine_spark.index.bm25 import search_many
    from searchengine_spark.text.tokenizer import tokenize_query

    tokenized = {
        qid: (tokenize_query(q) if isinstance(q, str) else list(q))
        for qid, q in queries.items()
    }
    all_terms = sorted({t for ts in tokenized.values() for t in ts})
    vocab = index.idf_values.select("word", "doc_freq")
    fixed = correct_terms_batch(vocab, all_terms, max_dist=max_dist)
    corrections = {t: w for t, w in fixed.items() if w != t}
    corrected = {
        qid: [fixed[t] for t in ts if fixed[t] is not None]
        for qid, ts in tokenized.items()
    }
    return search_many(index, corrected, k=k, **search_kwargs), corrections


# ------------------------------------------------------- registry glue


def q_fuzzy_term_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from searchengine_spark.index.queries import _index

    vocab = _index(spark, sf_dir).idf_values.select("word", "doc_freq")
    return fuzzy_term_matches(vocab, FUZZY_QUERY_TERMS)


# Pre-tokenized typo'd query batch for the end-to-end corrected
# search: every term is either an exact vocabulary hit, a one-edit
# typo of one (correcting per the min-dist/max-df/lexicographic
# rule), or unreachable (dropped from the query).
CORRECTED_BATCH: dict[str, list[str]] = {
    "q_typo_join": ["joim", "windoe"],
    "q_typo_table": ["fastt", "tabel"],
    "q_mixed": ["spark", "qqqqq"],
}
CORRECTED_K = 10


def q_search_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did-you-mean end to end: the typo'd batch is corrected via ONE
    SymSpell variant join, then the corrected batch is BM25-scored in
    one pass — driver-checked against a twin that restates BOTH the
    correction rule and the scoring, so a wrong correction surfaces
    as a ranking mismatch, not just a term diff."""
    from searchengine_spark.index.queries import _index

    idx = _index(spark, sf_dir)
    results, _corrections = search_many_corrected(
        idx, dict(CORRECTED_BATCH), k=CORRECTED_K, round_scores=6
    )
    return results


QUERIES = {
    "se_fuzzy_term_match": q_fuzzy_term_match,
    "se_search_corrected": q_search_corrected,
}


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


def _corrected_oracle() -> str:
    from searchengine_spark.index.queries import _INDEX_CTES, B, K1

    typo_vals = ", ".join(
        f"('{qid}', '{t}')"
        for qid, terms in CORRECTED_BATCH.items()
        for t in terms
    )
    return f"""{_INDEX_CTES},
    typos(query_id, term) AS (SELECT * FROM (VALUES {typo_vals})),
    cand AS (
      SELECT t.query_id, t.term, v.word,
             levenshtein(t.term, v.word) AS dist, v.doc_freq
      FROM typos t CROSS JOIN idf v
      WHERE levenshtein(t.term, v.word) <= {MAX_DIST}
    ),
    qterms AS (
      SELECT query_id, word FROM (
        SELECT query_id, term, word,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id, term
                 ORDER BY dist, doc_freq DESC, word
               ) AS rk
        FROM cand
      ) WHERE rk = 1
    ),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             idf.idf * (tf.term_freq * {K1 + 1.0}) /
               (tf.term_freq + {K1} * (1.0 - {B} + {B} * dl.doc_length /
                 (SELECT avgdl FROM params))) AS term_score
      FROM tf
      JOIN qterms q ON tf.word = q.word
      JOIN idf ON tf.word = idf.word
      JOIN dl ON tf.doc_id = dl.doc_id
    ),
    totals AS (
      SELECT query_id, doc_id, round(sum(term_score), 6) AS total_score
      FROM scored GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, total_score, rnk FROM (
      SELECT query_id, doc_id, total_score,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY total_score DESC, doc_id ASC
             ) AS rnk
      FROM totals
    ) WHERE rnk <= {CORRECTED_K}
    """


ORACLES = {
    "se_fuzzy_term_match": _oracle(),
    "se_search_corrected": _corrected_oracle(),
}
