"""Tokenization — the engine's text front-end.

Two modes, mirroring the reference's two pipelines (SURVEY.md §2.8):

- ``simple`` (default, fully native): lowercase -> split on non-letter
  runs -> drop empties -> drop stopwords. Pure Column expressions, so
  the whole path stays inside whole-stage codegen and is expressible
  1:1 in ANSI SQL for the DuckDB oracle. This is the X3 "no-stem"
  variant of the reference (/root/reference/nltksearchv1.py:132-134).

- ``porter``: simple mode + Porter stemming, matching the reference's
  Spark path (/root/reference/searchenginespark.py:57-62: lowercase ->
  tokenize -> stopword filter -> isalpha -> PorterStemmer). Stemming
  is the one operation Spark has no native function for, so it runs
  as an Arrow-batched pandas_udf over the token array — one Python
  round-trip per batch, not per row.

Stopword filtering happens BEFORE stemming (on the unstemmed
lowercase token), matching the reference's order — this matters:
"running" must survive the stopword test as "running", then stem to
"run".
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from searchengine_spark.text.porter import porter_stem

# Classic English stopword list (subset of the NLTK list the
# reference uses; /root/reference/searchenginespark.py:44). Kept
# deliberately compact so it can be inlined into oracle SQL.
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "been", "but", "by",
    "for", "from", "had", "has", "have", "he", "her", "his", "i",
    "in", "is", "it", "its", "not", "of", "on", "or", "s", "she",
    "so", "t", "that", "the", "their", "them", "they", "this", "to",
    "was", "we", "were", "which", "will", "with", "you",
)

# Token = maximal run of ASCII letters; everything else is a
# delimiter. This encodes the reference's `isalpha()` filter
# (searchenginespark.py:61) directly into the split. Tokens shorter
# than MIN_TOKEN_LEN are dropped — the fragments a punctuation split
# produces from "U.S." / "v." that the reference's isalpha() test
# would have discarded whole.
TOKEN_SPLIT_REGEX = "[^a-z]+"
MIN_TOKEN_LEN = 2

# Unicode mode (round-11 verdict item 3): a token is a maximal run of
# Unicode LETTER codepoints (category L) — accented Latin, Cyrillic,
# Greek, CJK all tokenize instead of vanishing. Java regex (Spark) and
# RE2 (DuckDB) agree on \p{L} membership, and both engines' lower()
# apply the same simple case mappings for these scripts; cross-engine
# parity is hash-proved by index/unicode_search.py's oracle queries.
# The ASCII default above is the REFERENCE-PARITY mode (NLTK isalpha
# over English caselaw) and is pinned by goldens — it must not move.
UNICODE_TOKEN_SPLIT_REGEX = r"[^\p{L}]+"


def tokens_column(
    text: Column | str, *, stem: bool = False, unicode: bool = False
) -> Column:
    """Array-of-tokens Column from a text Column — all native ops.

    lowercase -> split on non-letters -> drop '' -> drop stopwords
    [-> Porter stem via pandas_udf when ``stem=True``].
    ``unicode=True`` splits on non-LETTER codepoints (\\p{L}) instead
    of non-[a-z]; stopword list and length floor are unchanged.
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(
        F.lower(col),
        UNICODE_TOKEN_SPLIT_REGEX if unicode else TOKEN_SPLIT_REGEX,
    )
    toks = F.filter(
        toks, lambda w: (F.length(w) >= MIN_TOKEN_LEN) & ~w.isin(*STOPWORDS)
    )
    if stem:
        toks = stem_tokens_udf(toks)
    return toks


@F.pandas_udf(ArrayType(StringType()))
def stem_tokens_udf(tokens: pd.Series) -> pd.Series:
    """Porter-stem each token array; Arrow-batched (no per-row pickle)."""
    return tokens.map(
        lambda arr: [porter_stem(w) for w in arr] if arr is not None else None
    )


def unicode_letter_runs(text: str) -> list[str]:
    """Maximal runs of Unicode LETTER codepoints — the exact Python
    twin of Java/RE2 ``\\p{L}`` splitting. Python ``re`` has no
    ``\\p{L}`` and ``[^\\W\\d_]`` keeps Nl/No numeric codepoints
    (Ⅻ, ½, ①) that the engines split on (ADVICE r12), so membership
    is decided per-codepoint from ``unicodedata.category`` instead:
    a letter iff the category starts with 'L'. Queries are tiny, so
    the per-char loop costs nothing."""
    import unicodedata

    out: list[str] = []
    cur: list[str] = []
    for c in text:
        if unicodedata.category(c).startswith("L"):
            cur.append(c)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def tokenize_query(
    query: str, *, stem: bool = False, unicode: bool = False
) -> list[str]:
    """Driver-side query tokenization — same rules as tokens_column.

    Queries are tiny, so this is plain Python (the reference does the
    same: /root/reference/pyapp.py:55-61). Unlike the reference's
    query path, we keep the isalpha symmetry with the document path
    so a query term can never silently fail to match (the reference's
    X1/X2 asymmetry is documented in SURVEY.md §2.8 as a bug-like
    quirk, not a feature).
    """
    import re

    if unicode:
        toks = unicode_letter_runs(query.lower())
    else:
        toks = re.split(TOKEN_SPLIT_REGEX, query.lower())
    toks = [w for w in toks if len(w) >= MIN_TOKEN_LEN]
    toks = [w for w in toks if w not in STOPWORDS]
    if stem:
        toks = [porter_stem(w) for w in toks]
    return toks


def raw_tokens_column(text: Column | str, *, unicode: bool = False) -> Column:
    """All lowercase alpha runs, stopwords INCLUDED, no length floor —
    the raw token stream used by text analytics / quality gating.
    Canonical definition: every module needing raw tokens must import
    this (and its SQL twin) so Spark and the DuckDB oracles can never
    diverge. ``unicode=True`` splits on non-letter codepoints, same
    contract as tokens_column."""
    col = F.col(text) if isinstance(text, str) else text
    regex = UNICODE_TOKEN_SPLIT_REGEX if unicode else TOKEN_SPLIT_REGEX
    return F.filter(F.split(F.lower(col), regex), lambda w: w != F.lit(""))


def sql_raw_tokens_expr(text_expr: str = "text", *, unicode: bool = False) -> str:
    """DuckDB twin of raw_tokens_column."""
    regex = r"[^\p{L}]+" if unicode else "[^a-z]+"
    return (
        f"list_filter(regexp_split_to_array(lower({text_expr}), '{regex}'), "
        "w -> w <> '')"
    )


def sql_tokens_expr(text_expr: str, *, unicode: bool = False) -> str:
    """ANSI-SQL (DuckDB) twin of ``tokens_column`` for oracle queries.

    Returns an expression producing the token LIST; callers unnest it.
    Must stay semantically identical to tokens_column().
    """
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    regex = r"[^\p{L}]+" if unicode else "[^a-z]+"
    return (
        f"list_filter(regexp_split_to_array(lower({text_expr}), '{regex}'), "
        f"w -> length(w) >= {MIN_TOKEN_LEN} AND w NOT IN ({stop}))"
    )
