"""Marker-word language identification (n-gram/stopword heuristic).

The classic cheap lang-ID for corpus triage: score each language by
distinct-overlap between the document's tokens and a small set of
high-frequency marker words; pick the argmax (ties broken by
language code, so results are deterministic). Pure array expressions
(array_intersect on a literal array) — a map-only stage at any
scale, and fully oracle-checkable.

Accuracy on real multilingual text is tested in
tests/test_langid.py with native-language fixtures; the synthetic
`documents` table is English-ish, so its guesses mostly exercise the
operator shape, not linguistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import ensure_min_partitions, load_table
from searchengine_spark.text.tokenizer import raw_tokens_column as _raw_tokens

# High-frequency function words per language (public knowledge).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "ich",
           "sie", "mit", "auf", "werden", "haben", "dass", "von", "sich"),
    "en": ("the", "and", "is", "not", "are", "was", "have", "that", "with",
           "this", "from", "they", "will", "which", "been", "their"),
    "es": ("el", "la", "los", "las", "es", "una", "uno", "que", "con",
           "para", "por", "como", "pero", "esta", "este", "ser"),
    "fr": ("le", "la", "les", "est", "une", "des", "que", "qui", "dans",
           "pour", "pas", "avec", "sur", "ce", "sont", "vous"),
}


def lang_scores(tokens: Column) -> list[Column]:
    """Distinct-overlap count per language, as columns lang_<code>."""
    distinct = F.array_distinct(tokens)
    return [
        F.size(
            F.array_intersect(distinct, F.array(*[F.lit(w) for w in words]))
        ).alias(f"score_{code}")
        for code, words in sorted(LANG_MARKERS.items())
    ]


def guess_lang_expr() -> Column:
    """argmax over the score_<code> columns; ties -> lexicographic
    first (deterministic)."""
    codes = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{c}") for c in codes])
    expr = F.lit(None).cast("string")
    # reversed so the FIRST code wins ties after the fold
    for c in reversed(codes):
        expr = F.when(F.col(f"score_{c}") == best, F.lit(c)).otherwise(expr)
    return expr


def identify_language(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    base = ensure_min_partitions(docs).select(
        "doc_id", _raw_tokens(F.col(text_col)).alias("toks")
    )
    scored = base.select("doc_id", *lang_scores(F.col("toks")))
    return scored.select(
        "doc_id",
        guess_lang_expr().alias("lang_guess"),
        F.greatest(*[F.col(f"score_{c}") for c in sorted(LANG_MARKERS)]).cast("bigint").alias("marker_hits"),
    )


def q_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    return identify_language(load_table(spark, sf_dir, "documents"))


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-quality audit: confusion matrix of the labeled lang
    column vs the marker-word guess, with per-truth-label rates. Two
    tiny aggs on top of the map-only scorer; the rate window
    partitions the |langs|^2 cell table, never the corpus."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    guessed = identify_language(docs)
    cells = (
        guessed.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "lang_guess",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("rate"),
    )


CHUNK_CHARS = 256
MIN_CHUNK_HITS = 2


def mixed_language_chunks(
    docs: DataFrame,
    *,
    text_col: str = "text",
    chunk_chars: int = CHUNK_CHARS,
    min_hits: int = MIN_CHUNK_HITS,
) -> DataFrame:
    """Per-document language-consistency audit: run the marker scorer
    over fixed CHUNK_CHARS-character windows and count how many
    distinct languages the INFORMATIVE chunks (marker_hits >=
    min_hits) vote for. Docs whose chunks disagree (is_mixed) are the
    code-switching / concatenated-boilerplate / wrong-segmentation
    cases a corpus curator routes to review — a doc-level guess alone
    averages the evidence away.

    Shape: one explode bounded by len(text)/chunk_chars, then the same
    map-only marker arithmetic as identify_language and one doc-keyed
    agg — no joins, no windows; all outputs exact ints/bools."""
    base = (
        ensure_min_partitions(docs)
        .filter(F.length(F.col(text_col)) > 0)
        .select("doc_id", F.col(text_col).alias("_t"))
    )
    chunks = base.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.length("_t") - 1) / chunk_chars).cast("int"),
            )
        ).alias("ci"),
        "_t",
    ).select(
        "doc_id",
        F.expr(
            f"substring(_t, ci * {chunk_chars} + 1, {chunk_chars})"
        ).alias("chunk"),
    )
    scored = chunks.select(
        "doc_id", *lang_scores(_raw_tokens(F.col("chunk")))
    )
    codes = sorted(LANG_MARKERS)
    guessed = scored.select(
        "doc_id",
        guess_lang_expr().alias("g"),
        F.greatest(*[F.col(f"score_{c}") for c in codes]).alias("hits"),
    )
    informative = F.col("hits") >= min_hits
    return guessed.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(informative.cast("int")).cast("bigint").alias("n_informative"),
        F.countDistinct(F.when(informative, F.col("g")))
        .cast("bigint")
        .alias("n_langs"),
        (
            F.countDistinct(F.when(informative, F.col("g"))) > 1
        ).alias("is_mixed"),
    )


def q_mixed_lang_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixed_language_chunks(load_table(spark, sf_dir, "documents"))


def _markers_sql(code: str) -> str:
    return ", ".join(f"'{w}'" for w in LANG_MARKERS[code])


def _lang_sql() -> str:
    codes = sorted(LANG_MARKERS)
    scores = ",\n         ".join(
        f"len(list_intersect(toks_d, [{_markers_sql(c)}])) AS score_{c}"
        for c in codes
    )
    best = f"greatest({', '.join(f'score_{c}' for c in codes)})"
    # same tie-break: first code in sorted order wins
    case = "CASE " + " ".join(
        f"WHEN score_{c} = {best} THEN '{c}'" for c in codes
    ) + " END"
    return f"""
WITH base AS (
  SELECT doc_id,
         list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                   w -> w <> '')) AS toks_d
  FROM documents
),
scored AS (
  SELECT doc_id, {scores} FROM base
)
SELECT doc_id, {case} AS lang_guess, {best} AS marker_hits
FROM scored
"""


def _confusion_sql() -> str:
    guess = _lang_sql().strip()
    return f"""
WITH guessed AS ({guess})
SELECT d.lang, g.lang_guess, count(*)::BIGINT AS n,
       round(count(*) * 1.0 / SUM(count(*)) OVER (PARTITION BY d.lang), 6)
         AS rate
FROM guessed g JOIN documents d ON g.doc_id = d.doc_id
GROUP BY d.lang, g.lang_guess
"""


def _mixed_chunks_sql() -> str:
    codes = sorted(LANG_MARKERS)
    scores = ",\n         ".join(
        f"len(list_intersect(toks_d, [{_markers_sql(c)}])) AS score_{c}"
        for c in codes
    )
    best = f"greatest({', '.join(f'score_{c}' for c in codes)})"
    case = "CASE " + " ".join(
        f"WHEN score_{c} = {best} THEN '{c}'" for c in codes
    ) + " END"
    return f"""
WITH base AS (
  SELECT doc_id, text AS t FROM documents WHERE length(text) > 0
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, CAST(floor((length(t) - 1) / {CHUNK_CHARS}) AS BIGINT) + 1),
           i -> substr(t, CAST(i * {CHUNK_CHARS} + 1 AS INT), {CHUNK_CHARS})
         )) AS chunk
  FROM base
),
toks AS (
  SELECT doc_id,
         list_distinct(list_filter(regexp_split_to_array(lower(chunk), '[^a-z]+'),
                                   w -> w <> '')) AS toks_d
  FROM chunks
),
scored AS (
  SELECT doc_id, {scores} FROM toks
),
guessed AS (
  SELECT doc_id, {case} AS g, {best} AS hits FROM scored
)
SELECT doc_id,
       count(*)::BIGINT AS n_chunks,
       CAST(SUM(CASE WHEN hits >= {MIN_CHUNK_HITS} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_informative,
       CAST(COUNT(DISTINCT CASE WHEN hits >= {MIN_CHUNK_HITS} THEN g END) AS BIGINT)
         AS n_langs,
       COUNT(DISTINCT CASE WHEN hits >= {MIN_CHUNK_HITS} THEN g END) > 1
         AS is_mixed
FROM guessed GROUP BY doc_id
"""


QUERIES = {
    "text_lang_guess": q_lang_guess,
    "text_langid_confusion": q_langid_confusion,
    "text_mixed_lang_chunks": q_mixed_lang_chunks,
}
ORACLES = {
    "text_lang_guess": _lang_sql(),
    "text_langid_confusion": _confusion_sql(),
    "text_mixed_lang_chunks": _mixed_chunks_sql(),
}


# ------------------------------------------------------ unicode mode

# The default identifier is ASCII-only by construction (raw tokens
# split on [^a-z]) — Cyrillic/Greek/CJK documents score 0 for every
# language. The unicode mode is additive, mirroring the tokenizer
# design: the ASCII path above stays reference-fixture-parity, and
# this path tokenizes with \p{L} runs, carries marker sets for the
# non-Latin alphabetic languages, and routes CJK via script share
# (marker words are useless for unsegmented text; the share of
# Han/Hiragana/Katakana tokens is the standard cheap signal).

UNICODE_EXTRA_MARKERS: dict[str, tuple[str, ...]] = {
    "ru": ("и", "в", "не", "на", "что", "он", "как", "это", "все",
           "она", "так", "его", "но", "да", "ты", "к", "у", "же",
           "вы", "за"),
    "el": ("και", "το", "να", "του", "με", "για", "είναι", "από",
           "στο", "που", "δεν", "ότι", "οι", "τον", "ήταν", "της"),
}
UNICODE_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    **LANG_MARKERS,
    **UNICODE_EXTRA_MARKERS,
}
CJK_SHARE_MIN = 0.3

# Java/RE2 spellings of the same script class (see text/cjk.py).
_CJK_JAVA = r"^[\p{IsHan}\p{IsHiragana}\p{IsKatakana}ー々]+$"
_CJK_RE2 = r"^[\p{Han}\p{Hiragana}\p{Katakana}ー々]+$"

# Function-word-rich fixture sentences, one per doc_id % 8 residue —
# unlike the tokenizer fixture (content words), language ID needs the
# high-frequency function words the marker sets key on.
LANGID_SENTS: tuple[str, ...] = (
    "the model is not ready and they will have been with this from that which",
    "der hund und die katze sind nicht mit dem haus ich habe das von auf sie werden",
    "el perro y la casa es una cosa que con para por como pero este ser",
    "le chien est dans la maison pour que vous avez pas sur ce sont les qui",
    "и не на что он как это все она так его но да ты к у же вы за",
    "και το να του με για είναι από στο που δεν ότι οι τον ήταν",
    "これはテストです 機械学習のモデルを訓練します データ処理",
    "data processing with the spark engine is fast and they like it",
)


def with_langid_sentence(docs: DataFrame) -> DataFrame:
    """(doc_id, text) fixture: deterministic multilingual sentence per
    doc — the oracle restates the same literal-list pick."""
    sent = F.element_at(
        F.array(*[F.lit(s) for s in LANGID_SENTS]),
        (F.col("doc_id") % len(LANGID_SENTS) + 1).cast("int"),
    )
    return docs.select("doc_id", sent.alias("text"))


def identify_language_unicode(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Marker argmax over UNICODE_LANG_MARKERS, with a CJK script-
    share override: share >= CJK_SHARE_MIN -> 'cjk' (marker words
    cannot represent unsegmented text). Pure column expressions."""
    codes = sorted(UNICODE_LANG_MARKERS)
    toks = _raw_tokens(F.col(text_col), unicode=True)
    base = ensure_min_partitions(docs).select(
        "doc_id", toks.alias("toks")
    )
    distinct = F.array_distinct(F.col("toks"))
    scores = [
        F.size(
            F.array_intersect(
                distinct,
                F.array(*[F.lit(w) for w in UNICODE_LANG_MARKERS[code]]),
            )
        ).alias(f"score_{code}")
        for code in codes
    ]
    n_toks = F.size(F.col("toks"))
    cjk_share = F.when(n_toks > 0,
        F.size(F.filter(F.col("toks"), lambda w: w.rlike(_CJK_JAVA)))
        / n_toks,
    ).otherwise(F.lit(0.0))
    scored = base.select("doc_id", cjk_share.alias("cjk_share"), *scores)
    best = F.greatest(*[F.col(f"score_{c}") for c in codes])
    argmax = F.lit(None).cast("string")
    for c in reversed(codes):
        argmax = F.when(F.col(f"score_{c}") == best, F.lit(c)).otherwise(argmax)
    return scored.select(
        "doc_id",
        F.when(F.col("cjk_share") >= CJK_SHARE_MIN, F.lit("cjk"))
        .otherwise(argmax)
        .alias("lang_guess"),
        best.cast("bigint").alias("marker_hits"),
        F.round("cjk_share", 6).alias("cjk_share"),
    )


def q_lang_guess_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return identify_language_unicode(
        with_langid_sentence(load_table(spark, sf_dir, "documents"))
    )


def _unicode_markers_sql(code: str) -> str:
    return ", ".join(f"'{w}'" for w in UNICODE_LANG_MARKERS[code])


def _lang_unicode_sql() -> str:
    from searchengine_spark.text.tokenizer import sql_raw_tokens_expr

    codes = sorted(UNICODE_LANG_MARKERS)
    sents = "[" + ", ".join(f"'{s}'" for s in LANGID_SENTS) + "]"
    scores = ",\n         ".join(
        f"len(list_intersect(toks_d, [{_unicode_markers_sql(c)}])) AS score_{c}"
        for c in codes
    )
    best = f"greatest({', '.join(f'score_{c}' for c in codes)})"
    case = "CASE " + " ".join(
        f"WHEN score_{c} = {best} THEN '{c}'" for c in codes
    ) + " END"
    return f"""
WITH ldocs AS (
  SELECT doc_id,
         ({sents})[(doc_id % {len(LANGID_SENTS)}) + 1] AS text
  FROM documents
),
base AS (
  SELECT doc_id,
         {sql_raw_tokens_expr('text', unicode=True)} AS toks
  FROM ldocs
),
scored AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0 THEN
           len(list_filter(toks, w -> regexp_matches(w, '{_CJK_RE2}')))::DOUBLE
             / len(toks)
         ELSE 0.0 END AS cjk_share,
         {scores}
  FROM (SELECT doc_id, toks, list_distinct(toks) AS toks_d FROM base)
)
SELECT doc_id,
       CASE WHEN cjk_share >= {CJK_SHARE_MIN} THEN 'cjk' ELSE {case} END
         AS lang_guess,
       CAST({best} AS BIGINT) AS marker_hits,
       round(cjk_share, 6) AS cjk_share
FROM scored
"""


QUERIES["text_lang_guess_unicode"] = q_lang_guess_unicode
ORACLES["text_lang_guess_unicode"] = _lang_unicode_sql()
