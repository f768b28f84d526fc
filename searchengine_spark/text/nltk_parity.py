"""NLTK token-for-token parity mode (SURVEY.md §2.8 X1/X2).

The reference tokenizes with ``nltk.word_tokenize(text.lower())``,
filters the full NLTK English stopword list, keeps only
``tok.isalpha()`` tokens, and Porter-stems the survivors
(/root/reference/searchenginespark.py:57-62). The engine's default
tokenizer (text/tokenizer.py) deliberately uses an oracle-expressible
native split instead; this module provides the parity path.

NLTK is not installed in this environment, so parity is achieved by
reimplementing the two public algorithms ``word_tokenize`` composes:

- Treebank word tokenization — a fixed, published regex cascade
  (nltk/tokenize/treebank.py, itself a port of Robert MacIntyre's
  sed script tokenizer.sed from the Penn Treebank distribution).
  Ported faithfully rule by rule below.
- Punkt sentence segmentation — a TRAINED model (pickled parameters),
  not reproducible from first principles. Approximated with a
  boundary regex (sentence-final [.!?]" sequences followed by
  whitespace). word_tokenize only uses sentence boundaries so the
  Treebank tokenizer can split sentence-final periods; for the
  downstream filter chain (isalpha kills every token containing a
  period) the approximation differs from Punkt only on abbreviation-
  heavy text, and errs toward keeping tokens rather than losing them.

If the real ``nltk`` package is importable (import-try), it is used
wholesale and this module's role reduces to the filter chain; the
tests then assert token-for-token equality between the two paths.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from searchengine_spark.text.porter import porter_stem

try:  # pragma: no cover - nltk absent in the build container
    from nltk.corpus import stopwords as _nltk_stopwords
    from nltk.stem import PorterStemmer as _NltkPorter
    from nltk.tokenize import word_tokenize as _nltk_word_tokenize

    _nltk_word_tokenize("probe sentence.")  # raises if punkt data missing
    _NLTK_AVAILABLE = True
except Exception:  # ImportError or missing punkt/stopwords data
    _NLTK_AVAILABLE = False

# The full NLTK English stopword list (nltk_data corpora/stopwords/
# english, 179 entries, stable since NLTK 3.x) — the list the
# reference loads at /root/reference/searchenginespark.py:44.
NLTK_STOPWORDS: frozenset[str] = frozenset((
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "you're", "you've", "you'll", "you'd", "your", "yours",
    "yourself", "yourselves", "he", "him", "his", "himself", "she",
    "she's", "her", "hers", "herself", "it", "it's", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "that'll", "these", "those", "am",
    "is", "are", "was", "were", "be", "been", "being", "have", "has",
    "had", "having", "do", "does", "did", "doing", "a", "an", "the",
    "and", "but", "if", "or", "because", "as", "until", "while",
    "of", "at", "by", "for", "with", "about", "against", "between",
    "into", "through", "during", "before", "after", "above", "below",
    "to", "from", "up", "down", "in", "out", "on", "off", "over",
    "under", "again", "further", "then", "once", "here", "there",
    "when", "where", "why", "how", "all", "any", "both", "each",
    "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s",
    "t", "can", "will", "just", "don", "don't", "should",
    "should've", "now", "d", "ll", "m", "o", "re", "ve", "y", "ain",
    "aren", "aren't", "couldn", "couldn't", "didn", "didn't",
    "doesn", "doesn't", "hadn", "hadn't", "hasn", "hasn't", "haven",
    "haven't", "isn", "isn't", "ma", "mightn", "mightn't", "mustn",
    "mustn't", "needn", "needn't", "shan", "shan't", "shouldn",
    "shouldn't", "wasn", "wasn't", "weren", "weren't", "won",
    "won't", "wouldn", "wouldn't",
))

# ---------------------------------------------------------------------------
# Treebank word tokenizer — regex cascade port (public algorithm).
# Rule order and replacement strings follow nltk/tokenize/treebank.py.
# ---------------------------------------------------------------------------

_STARTING_QUOTES = [
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]

_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    # Sentence-final period (kept attached mid-sentence — this is why
    # word_tokenize needs sentence segmentation first).
    (re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_PARENS_BRACKETS = [(re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> ")]

_DOUBLE_DASHES = [(re.compile(r"--"), r" -- ")]

_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

# MacIntyre contractions: cannot -> can not, gonna -> gon na, ...
_CONTRACTIONS2 = [
    re.compile(p, re.IGNORECASE)
    for p in (
        r"\b(can)(not)\b",
        r"\b(d)('ye)\b",
        r"\b(gim)(me)\b",
        r"\b(gon)(na)\b",
        r"\b(got)(ta)\b",
        r"\b(lem)(me)\b",
        r"\b(more)('n)\b",
        r"\b(wan)(na)(?=\s)",
    )
]
_CONTRACTIONS3 = [
    re.compile(p, re.IGNORECASE) for p in (r" ('t)(is)\b", r" ('t)(was)\b")
]


def treebank_tokenize(sentence: str) -> list[str]:
    """Tokenize ONE sentence with the Penn Treebank rules."""
    text = sentence
    for pat, repl in _STARTING_QUOTES:
        text = pat.sub(repl, text)
    for pat, repl in _PUNCTUATION:
        text = pat.sub(repl, text)
    for pat, repl in _PARENS_BRACKETS:
        text = pat.sub(repl, text)
    for pat, repl in _DOUBLE_DASHES:
        text = pat.sub(repl, text)
    text = " " + text + " "
    for pat, repl in _ENDING_QUOTES:
        text = pat.sub(repl, text)
    for pat in _CONTRACTIONS2:
        text = pat.sub(r" \1 \2 ", text)
    for pat in _CONTRACTIONS3:
        text = pat.sub(r" \1 \2 ", text)
    return text.split()


# Sentence-boundary approximation of Punkt: break at whitespace
# following [.!?], optionally with up to two closing quote/bracket
# chars in between. The separator is ONLY the whitespace (fixed-width
# lookbehinds) — closing quotes stay in the sentence so the Treebank
# rules can emit them as tokens, matching NLTK.
_CLOSE = r"[\]\)}>\"']"
_SENT_BOUNDARY = re.compile(
    rf"(?:(?<=[.!?])|(?<=[.!?]{_CLOSE})|(?<=[.!?]{_CLOSE}{_CLOSE}))\s+"
)


def sent_tokenize_approx(text: str) -> list[str]:
    return [s for s in _SENT_BOUNDARY.split(text) if s]


def word_tokenize(text: str) -> list[str]:
    """``nltk.word_tokenize`` — real NLTK when importable, else the
    Treebank cascade over approximate sentence splits."""
    if _NLTK_AVAILABLE:  # pragma: no cover
        return _nltk_word_tokenize(text)
    return [tok for sent in sent_tokenize_approx(text) for tok in treebank_tokenize(sent)]


if _NLTK_AVAILABLE:  # pragma: no cover
    _nltk_stemmer = _NltkPorter()
    _nltk_stop = frozenset(_nltk_stopwords.words("english"))

    def _stem(w: str) -> str:
        return _nltk_stemmer.stem(w)

    _stopset = _nltk_stop
else:
    def _stem(w: str) -> str:
        return porter_stem(w, mode="nltk")

    _stopset = NLTK_STOPWORDS


def preprocess_text_nltk(text: str | None) -> list[str] | None:
    """X1 wholesale: the reference's document pipeline
    (searchenginespark.py:57-62) — word_tokenize(lower) ->
    stopword test on the unstemmed token -> isalpha -> Porter stem."""
    if text is None:
        return None
    return [
        _stem(tok)
        for tok in word_tokenize(text.lower())
        if tok not in _stopset and tok.isalpha()
    ]


def preprocess_query_nltk(query: str) -> list[str]:
    """X2: the reference's query pipeline (searchenginespark.py:179-194)
    — same as X1 MINUS isalpha, so punctuation/numeric tokens survive.
    The asymmetry is preserved deliberately in parity mode (a query
    term like "42" can never match a document — documented reference
    quirk, SURVEY.md §2.8)."""
    return [
        _stem(tok) for tok in word_tokenize(query.lower()) if tok not in _stopset
    ]


@F.pandas_udf(ArrayType(StringType()))
def nltk_tokens_udf(text: pd.Series) -> pd.Series:
    """Arrow-batched X1 pipeline: one Python round-trip per batch.
    This is the SURVEY §7.4 'wrap word_tokenize in the stemmer UDF
    wholesale' option — index-time only; the native tokenizer remains
    the default scale path."""
    return text.map(preprocess_text_nltk)


def nltk_tokens_column(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return nltk_tokens_udf(col)


QUERIES = {
    "se_flat_words_nltk_parity": lambda spark, sf_dir: _q_flat_words_nltk(spark, sf_dir),
}


def _nltk_oracle_sql() -> str:
    """DuckDB twin of the X1 parity pipeline FOR THE CLOSED TESTDATA
    CORPUS: whitespace-only text over a fixed 31-word vocabulary, so
    word_tokenize degenerates to a whitespace split and the
    NLTK-mode Porter stem becomes a dictionary generated from the
    golden-tested porter_stem (tests/test_nltk_parity.py pins the
    stemmer itself against published NLTK behavior). Punkt/Treebank
    are NOT SQL-expressible in general — on any drifted text with
    punctuation the whitespace assumption breaks visibly (hash
    mismatch), and any out-of-vocabulary word raises via error()
    (see porter.sql_stem_case_expr), so this oracle can only fail
    loudly, never silently pass."""
    from searchengine_spark.io import TESTDATA_DOC_VOCAB
    from searchengine_spark.text.porter import sql_stem_case_expr

    # NLTK stopwords include apostrophe forms ("don't", "shan't"):
    # double the quotes for SQL literals.
    stop = ", ".join("'{}'".format(w.replace("'", "''")) for w in sorted(NLTK_STOPWORDS))
    stem_case = sql_stem_case_expr(TESTDATA_DOC_VOCAB, var="w", mode="nltk")
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   w -> w <> '' AND regexp_matches(w, '^[a-z]+$')
                        AND w NOT IN ({stop})
                 )) AS w
          FROM documents
          WHERE text IS NOT NULL
        )
        SELECT doc_id, {stem_case} AS word FROM tok
    """


ORACLES: dict[str, str] = {"se_flat_words_nltk_parity": _nltk_oracle_sql()}


def _q_flat_words_nltk(spark, sf_dir):
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id"),
        F.explode(nltk_tokens_column("text")).alias("word"),
    )
