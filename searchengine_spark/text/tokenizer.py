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

# Per-language stopword lists for the unicode mode (round-12 verdict
# task 3): the English list alone leaves "и"/"le"/"der" as the hottest
# terms of a multilingual index — high-df noise postings exactly where
# BM25's idf discrimination matters at 100 TB. Compact public
# function-word lists (the same public-knowledge family as NLTK's
# shipped lists and text/langid.py's markers), deliberately small so
# each inlines into oracle SQL; single quotes forbidden (SQL literal
# embedding). "cjk" is empty by design: character bigrams have no
# function-word list, and stopping is done by df at query time.
STOPWORDS_BY_LANG: dict[str, tuple[str, ...]] = {
    "en": STOPWORDS,
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
           "ich", "sie", "mit", "auf", "dass", "von", "sich", "den",
           "dem", "des", "im", "auch", "als", "an", "aus", "bei",
           "nach", "wie", "zu", "es", "er", "war", "sind", "hat",
           "oder", "aber", "wenn", "nur", "noch", "so", "um"),
    "es": ("el", "la", "los", "las", "es", "una", "uno", "que", "con",
           "para", "por", "como", "pero", "esta", "este", "ser", "se",
           "no", "en", "un", "de", "del", "al", "lo", "su", "sus",
           "fue", "son", "hay", "muy", "ya", "le"),
    "fr": ("le", "la", "les", "est", "une", "des", "que", "qui",
           "dans", "pour", "pas", "avec", "sur", "ce", "sont", "vous",
           "un", "du", "de", "et", "il", "elle", "au", "aux", "ne",
           "se", "son", "ses", "mais", "ou", "par"),
    "ru": ("не", "на", "что", "он", "как", "это", "все", "она", "так",
           "его", "но", "да", "ты", "же", "вы", "за", "бы", "по",
           "только", "мне", "было", "вот", "от", "меня", "еще", "нет",
           "из", "ему"),
    "el": ("και", "το", "να", "του", "με", "για", "είναι", "από",
           "στο", "που", "δεν", "ότι", "οι", "τον", "ήταν", "τη",
           "την", "της", "τα", "ως", "θα", "ένα", "μια", "αν"),
    "cjk": (),
}


def stopwords_for(lang: str | None) -> tuple[str, ...]:
    """Stopword list for a language code; None or unknown -> the
    English default (byte-identical to the pre-round-13 behavior)."""
    if lang is None:
        return STOPWORDS
    return STOPWORDS_BY_LANG.get(lang, STOPWORDS)


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
    text: Column | str,
    *,
    stem: bool = False,
    unicode: bool = False,
    lang: str | None = None,
) -> Column:
    """Array-of-tokens Column from a text Column — all native ops.

    lowercase -> split on non-letters -> drop '' -> drop stopwords
    [-> Porter stem via pandas_udf when ``stem=True``].
    ``unicode=True`` splits on non-LETTER codepoints (\\p{L}) instead
    of non-[a-z]; length floor unchanged. ``lang`` picks the stopword
    list via :func:`stopwords_for` (None -> the English default,
    byte-identical to the pre-lang behavior; "cjk" -> empty list, no
    stopword filter).
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(
        F.lower(col),
        UNICODE_TOKEN_SPLIT_REGEX if unicode else TOKEN_SPLIT_REGEX,
    )
    stops = stopwords_for(lang)
    if stops:
        toks = F.filter(
            toks, lambda w: (F.length(w) >= MIN_TOKEN_LEN) & ~w.isin(*stops)
        )
    else:
        toks = F.filter(toks, lambda w: F.length(w) >= MIN_TOKEN_LEN)
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


def sql_tokens_expr(
    text_expr: str, *, unicode: bool = False, lang: str | None = None
) -> str:
    """ANSI-SQL (DuckDB) twin of ``tokens_column`` for oracle queries.

    Returns an expression producing the token LIST; callers unnest it.
    Must stay semantically identical to tokens_column() — including
    the ``lang`` stopword-list selection.
    """
    stops = stopwords_for(lang)
    regex = r"[^\p{L}]+" if unicode else "[^a-z]+"
    if stops:
        stop = ", ".join(f"'{w}'" for w in stops)
        pred = f"length(w) >= {MIN_TOKEN_LEN} AND w NOT IN ({stop})"
    else:
        pred = f"length(w) >= {MIN_TOKEN_LEN}"
    return (
        f"list_filter(regexp_split_to_array(lower({text_expr}), '{regex}'), "
        f"w -> {pred})"
    )
