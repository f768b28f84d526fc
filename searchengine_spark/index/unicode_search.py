"""Unicode tokenizer mode, oracle-checked (round-11 verdict item 3).

The DEFAULT tokenizer is deliberately ASCII-only — reference parity
with the NLTK ``isalpha`` pipeline over English caselaw
(/root/reference/searchenginespark.py:57-62; text/tokenizer.py). That
is correct for the reference, but a multilingual 100 TB pipeline
cannot tokenize non-Latin documents to zero tokens. This module
exercises ``tokens_column(unicode=True)``: tokens are maximal runs of
Unicode LETTER codepoints (``\\p{L}``), same stopword list and length
floor as the default mode.

Cross-engine parity argument: Java regex (Spark) and RE2 (DuckDB)
agree on ``\\p{L}`` category membership, and both engines' ``lower()``
apply the same simple case mappings for the scripts in the fixture
(Latin-1 accents, Cyrillic, Greek, CJK — no Turkish dotted-I or final
sigma, whose full mappings are engine-dependent). The driver's hash
compare of the two queries below IS the proof.

Fixture: the synthetic ``documents`` table is pure-ASCII English, so
each doc gets a deterministic multilingual suffix appended IN BOTH
ENGINES — ``doc_id % 8`` picks from a literal sentence list (accented
French/German/Spanish, Cyrillic, CJK, Greek, mixed-script, Turkish).
Uppercase accented/Cyrillic words are included on purpose: they pin
the Unicode ``lower()`` path, not just ``\\p{L}`` splitting.

Scale: both queries are the standard tokenize->explode->agg shape —
one corpus scan, map-side projection, one shuffle per aggregate;
the suffix append is a constant-width column expression. Identical
plan economics to the ASCII index build at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.index.bm25 import bm25_term_score
from searchengine_spark.index.builder import build_index
from searchengine_spark.index.queries import B, K1, index_body_sql
from searchengine_spark.io import load_table, session_cached
from searchengine_spark.text.tokenizer import sql_tokens_expr, tokens_column

# One sentence per residue class of doc_id % 8. Single quotes are
# forbidden (they'd need SQL escaping); every non-ASCII token is >= 2
# chars so the length floor keeps it.
UNICODE_SUFFIXES: tuple[str, ...] = (
    "Café crème à Paris où naïveté reçue",
    "Straße über MÜNCHEN gemütlichkeit",
    "mañana corazón niño español",
    "Русский текст про поиск данных",
    "機械学習 モデル 訓練 データ",
    "ελληνικά γράμματα ανάλυση",
    "mixed script data поиск café 機械学習",
    "türkçe veri işleme çözümleme",
)

# Mixed-script query: accented Latin, Cyrillic, CJK, umlaut. All four
# appear in the suffixes (document frequency n/8 .. 2n/8), so BM25
# scores are well-defined and the top-k cut is contested.
UNICODE_QUERY_TERMS: tuple[str, ...] = ("café", "поиск", "機械学習", "münchen")
UNICODE_K = 10


def with_unicode_suffix(docs: DataFrame) -> DataFrame:
    """documents + deterministic multilingual suffix (doc_id % 8)."""
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in UNICODE_SUFFIXES]),
        (F.col("doc_id") % len(UNICODE_SUFFIXES) + 1).cast("int"),
    )
    # coalesce: null text must not null the whole row (SQL || is
    # null-propagating; the oracle coalesces identically).
    return docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")), F.lit(" "), suffix
        ).alias("text"),
    )


def _udocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_unicode_suffix(load_table(spark, sf_dir, "documents"))


def _uindex(spark: SparkSession, sf_dir: str):
    return session_cached(
        spark, "unicode-index", sf_dir,
        lambda: build_index(
            _udocs(spark, sf_dir),
            tokens=tokens_column("text", unicode=True),
        )
        .coalesce(8)
        .materialized(),
    )


def q_unicode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-vocabulary term statistics under the Unicode tokenizer —
    every accented/Cyrillic/Greek/CJK token must survive with exact
    frequencies (the ASCII default would tokenize them away)."""
    toks = tokens_column("text", unicode=True)
    return (
        _udocs(spark, sf_dir)
        .select("doc_id", F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def q_bm25_topk_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k over the Unicode-tokenized index for a mixed-script
    query — end-to-end proof the whole index/scoring path (not just
    the splitter) is script-agnostic."""
    idx = _uindex(spark, sf_dir)
    terms = list(UNICODE_QUERY_TERMS)
    tf = idx.term_frequencies.filter(F.col("word").isin(terms))
    scored = (
        tf.join(
            F.broadcast(idx.idf_values.filter(F.col("word").isin(terms))),
            "word",
        )
        .join(idx.doc_lengths, "doc_id")
        .crossJoin(F.broadcast(idx.scoring_params.select("avgdl")))
        .select(
            "doc_id",
            bm25_term_score(
                F.col("term_freq"),
                F.col("doc_length"),
                F.col("avgdl"),
                F.col("idf"),
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 6).alias("total_score"))
        .orderBy(F.desc("total_score"), F.asc("doc_id"))
        .limit(UNICODE_K)
    )


# ------------------------------------------------------------- oracle

_SUFFIX_LIST_SQL = "[" + ", ".join(f"'{s}'" for s in UNICODE_SUFFIXES) + "]"

_UDOCS_CTES = f"""
WITH udocs AS (
  SELECT doc_id,
         coalesce(text, '') || ' ' ||
           ({_SUFFIX_LIST_SQL})[(doc_id % {len(UNICODE_SUFFIXES)}) + 1] AS text
  FROM documents
),
utok AS (
  SELECT doc_id, unnest({sql_tokens_expr('text', unicode=True)}) AS word
  FROM udocs
)"""

_UTERMS_SQL = ", ".join(f"'{t}'" for t in UNICODE_QUERY_TERMS)

QUERIES = {
    "text_unicode_tokens": q_unicode_tokens,
    "se_bm25_topk_unicode": q_bm25_topk_unicode,
}

ORACLES = {
    "text_unicode_tokens": f"""{_UDOCS_CTES}
        SELECT word, count(*)::BIGINT AS freq,
               count(DISTINCT doc_id)::BIGINT AS n_docs
        FROM utok GROUP BY word
    """,
    "se_bm25_topk_unicode": f"""{_UDOCS_CTES}{index_body_sql('u')},
        scored AS (
          SELECT utf.doc_id,
                 uidf.idf * (utf.term_freq * {K1 + 1.0}) /
                   (utf.term_freq + {K1} * (1.0 - {B} + {B} * udl.doc_length /
                     (SELECT avgdl FROM uparams))) AS term_score
          FROM utf
          JOIN uidf ON utf.word = uidf.word
          JOIN udl ON utf.doc_id = udl.doc_id
          WHERE utf.word IN ({_UTERMS_SQL})
        )
        SELECT doc_id, round(sum(term_score), 6) AS total_score
        FROM scored GROUP BY doc_id
        ORDER BY total_score DESC, doc_id ASC LIMIT {UNICODE_K}
    """,
}
