"""SQL scalar functions (CREATE FUNCTION ... RETURN <expr>).

Exposes the engine's core expressions to SQL-only users — the
reference's notebook audience works in SQL-ish one-liners
(/root/reference/searchenginespark.py:214-235 sketches the scoring
as raw SQL), and a 100 TB platform's consumers are mostly SQL.

These are Spark 4 *SQL UDFs*: the body is a SQL expression inlined
into the calling plan at resolution time, so calls stay inside
whole-stage codegen — zero Python, zero serialization, unlike
`spark.udf.register`. Each function body mirrors the corresponding
Column implementation and the tests pin them equal row-for-row:

    se_tokenize(text)           <-> text.tokenizer.tokens_column
    se_hash_bucket(key, salt)   <-> operators.sampling.hash_bucket
    se_bm25_term(...)           <-> index.bm25.bm25_term_score
    se_zorder_key(a, b)         <-> operators.layout.zorder_key
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from searchengine_spark.operators.sampling import N_BUCKETS
from searchengine_spark.text.tokenizer import (
    MIN_TOKEN_LEN,
    STOPWORDS,
    TOKEN_SPLIT_REGEX,
)

_STOPWORD_ARRAY = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"

# One (name, signature, returns, body) per function; bodies are pure
# SQL expressions over the arguments.
_FUNCTIONS: tuple[tuple[str, str, str, str], ...] = (
    (
        "se_tokenize",
        "(t STRING)",
        "ARRAY<STRING>",
        f"""
        filter(
          split(lower(t), '{TOKEN_SPLIT_REGEX}'),
          w -> length(w) >= {MIN_TOKEN_LEN}
               AND NOT array_contains({_STOPWORD_ARRAY}, w)
        )
        """,
    ),
    (
        "se_hash_bucket",
        "(key STRING, salt STRING)",
        "BIGINT",
        f"""
        pmod(
          cast(conv(substring(md5(cast(concat(salt, key) as binary)), 1, 15),
                    16, 10) as bigint),
          {N_BUCKETS})
        """,
    ),
    (
        "se_bm25_term",
        "(tf BIGINT, idf DOUBLE, dl BIGINT, avgdl DOUBLE, k1 DOUBLE, b DOUBLE)",
        "DOUBLE",
        "idf * (tf * (k1 + 1.0d)) / (tf + k1 * (1.0d - b + b * dl / avgdl))",
    ),
)


def _spread_sql(v: str) -> str:
    x = f"cast({v} as bigint)"
    x = f"((({x}) | shiftleft(({x}), 8)) & 71777214294589695)"
    x = f"((({x}) | shiftleft(({x}), 4)) & 1085102592571150095)"
    x = f"((({x}) | shiftleft(({x}), 2)) & 3689348814741910323)"
    x = f"((({x}) | shiftleft(({x}), 1)) & 6148914691236517205)"
    return x


def register_sql_functions(spark: SparkSession) -> None:
    """Create (or replace) the TEMPORARY SQL functions in this
    session's catalog."""
    for name, sig, returns, body in _FUNCTIONS:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {returns} RETURN {body}"
        )
    # z-key needs the big spread expression composed in Python (SQL
    # UDF bodies are single expressions; subquery forms above are
    # clumsy — compose directly instead)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION se_zorder_key"
        "(a BIGINT, b BIGINT) RETURNS BIGINT RETURN "
        f"({_spread_sql('a')}) | shiftleft(({_spread_sql('b')}), 1)"
    )
