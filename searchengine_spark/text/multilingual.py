"""Language-routed multilingual tokenization and curation (round-13).

Round 12 built the pieces — NFC normalization (text/normalize.py),
the Unicode \\p{L} tokenizer (text/tokenizer.py), CJK character
bigrams (text/cjk.py), unicode langid with CJK script-share routing
(text/langid.py), per-language stopword lists (tokenizer.py,
STOPWORDS_BY_LANG) — but the default pipeline still tokenized
ASCII-only, so a mixed multilingual corpus routed through
pipeline.curate() dropped every non-Latin document's tokens. This
module composes them into ONE per-document routed path:

    NFC-normalize -> langid (marker argmax + CJK script-share
    override) -> per-language stopword filter -> CJK runs
    re-segmented into character bigrams when the doc routes 'cjk'

and wires that path into (a) a curation chain with the same
gate -> exact-dedup -> MinHash-near-dedup stages as pipeline.curate
(exact dedup keyed on the NORMALIZED text, so composed/decomposed
byte twins merge), and (b) a BM25 index + routed query terms.

Engine split: everything is native column expressions except the one
Arrow-batched NFC pandas_udf the normalize step already pays. The
DuckDB oracles restate the full routing chain CTE-for-CTE, and the
near-dup tail is shared VERBATIM with pipeline.py's oracle
(NEARDUP_TAIL_CTES) so the two restatements cannot drift.

Scale: the routing adds only map-side work to the curation chain —
langid is array-intersect against literal marker arrays, the stop
filter is an array filter against a per-language literal list picked
by a CASE, and re-segmentation is the same flatten/transform as the
CJK index mode. Shuffle count is identical to the ASCII pipeline.

Reference parity note: the reference (English caselaw, NLTK isalpha
— /root/reference/searchenginespark.py:57-62) has no multilingual
path; this is north-star LLM-pipeline surface. The ASCII default is
pinned unchanged by goldens (tests/test_bm25_golden.py) and the
lang=None stopword default is pinned byte-identical in
tests/test_multilingual.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.index.bm25 import bm25_term_score
from searchengine_spark.index.builder import build_index
from searchengine_spark.index.queries import B, K1, index_body_sql
from searchengine_spark.io import (
    ensure_min_partitions,
    load_table,
    session_cached,
)
from searchengine_spark.operators.dedup import (
    SHINGLE_K,
    _cut_lineage,
    jaccard_pairs,
    minhash_bands,
    neardup_candidate_pairs,
    shingles_column,
)
from searchengine_spark.pipeline import (
    CURATE_MAX_BUCKET,
    JACCARD_CUT,
    MAX_STOP_RATIO,
    MIN_TOKENS,
    NEARDUP_TAIL_CTES,
    fill_neardup_placeholders,
)
from searchengine_spark.text.cjk import (
    _CJK_RUN_JAVA,
    _CJK_RUN_RE2,
    cjk_resegment,
    is_cjk_char,
    sql_cjk_bigram_expr,
)
from searchengine_spark.text.langid import CJK_SHARE_MIN, UNICODE_LANG_MARKERS
from searchengine_spark.text.normalize import (
    normalize_text_column,
    sql_normalize_expr,
)
from searchengine_spark.text.tokenizer import (
    MIN_TOKEN_LEN,
    STOPWORDS_BY_LANG,
    raw_tokens_column,
    sql_raw_tokens_expr,
    unicode_letter_runs,
)

_LANG_CODES = sorted(UNICODE_LANG_MARKERS)  # de el en es fr ru


# ------------------------------------------------------------ fixture

# The synthetic `documents` table is pure-ASCII English, so the
# multilingual fixture REPLACES each doc's text by residue class
# (doc_id % 8): one function-word-rich sentence per language plus a
# content tail varying by (doc_id // 8) % 3 — enough byte variety to
# exercise every curation stage. Residue 0 keeps the ORIGINAL corpus
# text (prepended), so the English slice retains corpus-scale
# variability for the quality/dedup stages. Residue 7 is written with
# EXPLICIT decomposed escapes (combining accents) so NFC has real
# work and no tool can silently re-normalize the source; its tails 0
# and 1 are the decomposed/composed forms of the SAME string, so
# normalization-aware exact dedup MUST merge them. Residue 2's tails
# 0 and 2 differ in one trailing word — a planted near-dup pair.
# Single quotes forbidden (SQL literal embedding).
ML_BASE_SENTS: tuple[str, ...] = (
    "the search engine and data processing with spark clusters running fast queries",
    "der moderne rechner verarbeitet große datenmengen und die schnelle suche ist wichtig",
    "el sistema procesa los datos grandes y la búsqueda rápida es importante",
    "le système traite les données massives et la recherche rapide est importante",
    "и система как он обрабатывает большие данные что поиск работает быстро и точно",
    "και το σύστημα επεξεργάζεται μεγάλα δεδομένα ενώ η γρήγορη αναζήτηση είναι σημαντική",
    "機械学習モデルの訓練データ処理は高速である",
    "donne\u0301es franc\u0327aises e\u0301le\u0301gantes avec le cafe\u0301 et la cre\u0300me",
)

ML_TAILS: tuple[str, ...] = (
    # r0 en — v2 is all-stopwords (diluted by the original corpus
    # text on this residue; the hard quality-gate case is r4 v2)
    "machine learning models",
    "vector index shards",
    "that was the and of to in it is was",
    # r1 de
    "neuronale netze lernen",
    "verteilte systeme skalieren",
    "schnelle indizes helfen",
    # r2 es — v0/v2 differ in ONE word: planted near-dup pair
    "modelos aprenden rápido ahora",
    "índices distribuidos escalan",
    "modelos aprenden rápido hoy",
    # r3 fr
    "modèles apprennent vite",
    "index distribués évoluent",
    "requêtes complexes marchent",
    # r4 ru — v2 is all-stopwords: with no original-text dilution on
    # this residue, the combined stop ratio crosses MAX_STOP_RATIO
    # and the quality gate must drop the whole (r4, v2) class
    "модели учатся быстро",
    "индексы растут надежно",
    "не что как это все так его но да же вы за",
    # r5 el
    "μοντέλα μαθαίνουν γρήγορα",
    "δείκτες κλιμακώνονται καλά",
    "ερωτήματα δουλεύουν σωστά",
    # r6 cjk
    "高速処理",
    "分散計算",
    "深層学習",
    # r7 fr-messy — v0 decomposed / v1 composed of the SAME string
    "cafe\u0301 chaud",
    "caf\u00e9 chaud",
    "mode\u0300les re\u0301cents",
)


def with_multilingual_text(docs: DataFrame) -> DataFrame:
    """(doc_id, text) multilingual fixture — deterministic per doc_id,
    restated literally by the oracles."""
    r = (F.col("doc_id") % 8).cast("int")
    v = (F.floor(F.col("doc_id") / F.lit(8)) % 3).cast("int")
    base = F.element_at(F.array(*[F.lit(s) for s in ML_BASE_SENTS]), r + 1)
    tail = F.element_at(F.array(*[F.lit(s) for s in ML_TAILS]), r * 3 + v + 1)
    head = F.when(
        r == 0, F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(" "))
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(head, base, F.lit(" "), tail).alias("text")
    )


# ------------------------------------------------- routed token frame


def _stop_array_expr(lang: Column) -> Column:
    """Per-language stopword list as a CASE over literal arrays."""
    expr = F.array(*[F.lit(w) for w in STOPWORDS_BY_LANG["en"]])
    for code in sorted(STOPWORDS_BY_LANG):
        words = STOPWORDS_BY_LANG[code]
        arr = (
            F.array(*[F.lit(w) for w in words])
            if words
            else F.array().cast("array<string>")
        )
        expr = F.when(lang == code, arr).otherwise(expr)
    return expr


def routed_frame(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(doc_id, ntext, lang, words, n_base, n_stop) — the per-document
    routed view every multilingual consumer shares.

    ntext   NFC-normalized text (the dedup/index key)
    lang    langid route: marker argmax over UNICODE_LANG_MARKERS,
            overridden to 'cjk' when the CJK script share of raw
            tokens >= CJK_SHARE_MIN (text/langid.py semantics)
    words   final token array: length-floored \\p{L} runs, the doc's
            language stopwords removed, CJK runs re-segmented to
            character bigrams when lang='cjk'
    n_base  token units before stopword removal (for 'cjk', the
            bigram count — whole-run counts are meaningless there)
    n_stop  stopword tokens removed (0 for 'cjk')
    """
    base = ensure_min_partitions(docs).select(
        "doc_id", normalize_text_column(text_col).alias("ntext")
    )
    raw = base.select(
        "doc_id", "ntext", raw_tokens_column("ntext", unicode=True).alias("raw")
    )
    distinct = F.array_distinct(F.col("raw"))
    scores = [
        F.size(
            F.array_intersect(
                distinct,
                F.array(*[F.lit(w) for w in UNICODE_LANG_MARKERS[c]]),
            )
        ).alias(f"score_{c}")
        for c in _LANG_CODES
    ]
    n = F.size("raw")
    cjk_share = F.when(
        n > 0,
        F.size(F.filter("raw", lambda w: w.rlike(_CJK_RUN_JAVA))) / n,
    ).otherwise(F.lit(0.0))
    scored = raw.select(
        "doc_id", "ntext", "raw", cjk_share.alias("cjk_share"), *scores
    )
    best = F.greatest(*[F.col(f"score_{c}") for c in _LANG_CODES])
    argmax = F.lit(None).cast("string")
    for c in reversed(_LANG_CODES):
        argmax = F.when(F.col(f"score_{c}") == best, F.lit(c)).otherwise(argmax)
    lang = (
        F.when(F.col("cjk_share") >= CJK_SHARE_MIN, F.lit("cjk"))
        .otherwise(argmax)
    )
    langed = scored.select("doc_id", "ntext", "raw", lang.alias("lang"))
    based = langed.select(
        "doc_id",
        "ntext",
        "lang",
        F.filter("raw", lambda w: F.length(w) >= MIN_TOKEN_LEN).alias("base"),
    )
    kept = based.select(
        "doc_id",
        "ntext",
        "lang",
        "base",
        F.filter(
            "base",
            lambda w: ~F.array_contains(_stop_array_expr(F.col("lang")), w),
        ).alias("kept"),
    )
    worded = kept.select(
        "doc_id",
        "ntext",
        "lang",
        "base",
        "kept",
        F.when(F.col("lang") == "cjk", cjk_resegment(F.col("kept")))
        .otherwise(F.col("kept"))
        .alias("words"),
    )
    return worded.select(
        "doc_id",
        "ntext",
        "lang",
        "words",
        F.when(F.col("lang") == "cjk", F.size("words"))
        .otherwise(F.size("base"))
        .cast("bigint")
        .alias("n_base"),
        (F.size("base") - F.size("kept")).cast("bigint").alias("n_stop"),
    )


def routed_query_terms(query: str) -> list[str]:
    """Driver-side query terms for a routed index: \\p{L} runs,
    length-floored; all-CJK runs emit their character bigrams;
    alphabetic terms are dropped if they are a stopword in ANY
    language (the query side cannot know the document's route, and a
    term that is a function word anywhere is a noise term
    everywhere)."""
    union_stops: set[str] = set()
    for ws in STOPWORDS_BY_LANG.values():
        union_stops.update(ws)
    out: list[str] = []
    for w in unicode_letter_runs(query.lower()):
        if len(w) < MIN_TOKEN_LEN:
            continue
        if all(is_cjk_char(c) for c in w):
            out.extend(w[i : i + 2] for i in range(len(w) - 1))
        elif w not in union_stops:
            out.append(w)
    return out


# ------------------------------------------------- routed curation


def multilingual_stages(
    docs: DataFrame, *, max_bucket: int | None = CURATE_MAX_BUCKET
):
    """(quality, exact_keep, near_drop) decision frames — the routed
    twin of pipeline._stages. Gate: n_base >= MIN_TOKENS and
    per-language stop ratio <= MAX_STOP_RATIO ('cjk' has no stopword
    list, so its ratio is 0 and the floor applies to BIGRAM units —
    whole-run token counts would spuriously fail every CJK doc).
    Exact dedup keys md5(NFC text): byte-variant twins merge. Near
    dedup shingles the ROUTED words through the same MinHash/LSH/
    verify chain as pipeline.curate, bucket cap included."""
    return _stages_from_routed(routed_frame(docs), max_bucket=max_bucket)


def _stages_from_routed(
    routed: DataFrame, *, max_bucket: int | None = CURATE_MAX_BUCKET
):
    quality = routed.filter(
        (F.col("n_base") >= MIN_TOKENS)
        & (F.col("n_stop") <= MAX_STOP_RATIO * F.col("n_base"))
    ).select("doc_id", "ntext", "words")
    exact_keep = (
        quality.select(F.md5(F.col("ntext").cast("binary")).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = quality.join(exact_keep, "doc_id", "left_semi").select(
        "doc_id", "words"
    )
    sh = (
        survivors.filter(F.size("words") >= SHINGLE_K)
        .select("doc_id", shingles_column(F.col("words")).alias("shingles"))
        .cache()
    )
    pairs = neardup_candidate_pairs(
        minhash_bands(shingles=sh), max_bucket=max_bucket
    )
    near = jaccard_pairs(None, pairs, shingles=sh).filter(
        F.col("jaccard") >= JACCARD_CUT
    )
    drop = near.select(F.col("doc_b").alias("doc_id")).distinct()
    return quality, exact_keep, drop


def curate_multilingual(
    docs: DataFrame, *, max_bucket: int | None = CURATE_MAX_BUCKET
) -> DataFrame:
    """Curated keep-list (doc_id) for a mixed multilingual corpus —
    the language-routed composition of the round-12 pieces that
    pipeline.curate's ASCII default would mis-handle (non-Latin docs
    tokenize to zero tokens there and all fail the gate)."""
    quality, exact_keep, drop = multilingual_stages(docs, max_bucket=max_bucket)
    survivors = quality.join(exact_keep, "doc_id", "left_semi")
    return survivors.join(drop, "doc_id", "left_anti").select("doc_id")


# ------------------------------------------------- registry queries


def _cached_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized routed frame over the fixture corpus — the
    NFC pandas_udf + langid pass runs once per (session, sf_dir) for
    all five multilingual queries (the _cached_stages convention)."""
    return session_cached(
        spark,
        "ml-routed-frame",
        sf_dir,
        lambda: _cut_lineage(
            routed_frame(
                with_multilingual_text(load_table(spark, sf_dir, "documents"))
            )
        ),
    )


def _cached_ml_stages(spark: SparkSession, sf_dir: str):
    def build():
        q, e, d = _stages_from_routed(_cached_routed(spark, sf_dir))
        return (_cut_lineage(q), _cut_lineage(e), _cut_lineage(d))

    return session_cached(spark, "ml-stages", sf_dir, build)


def q_routed_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document routing audit: language route, token units,
    stopword mass — the per-doc numbers a multilingual curation run
    reports before committing a keep-list."""
    routed = _cached_routed(spark, sf_dir)
    return routed.select(
        "doc_id",
        "lang",
        "n_base",
        "n_stop",
        F.size("words").cast("bigint").alias("n_words"),
    )


def q_unicode_tokens_stopworded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full vocabulary of the ROUTED token stream: per-language
    stopwords must be absent ("и"/"le"/"der" no longer the hottest
    terms), CJK text appears as character bigrams, and every
    surviving term has exact frequencies."""
    routed = _cached_routed(spark, sf_dir)
    return (
        routed.select("doc_id", F.explode("words").alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def q_curated_docs_multilingual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multilingual keep-list: language-routed gate ->
    NFC-keyed exact dedup -> routed-shingle MinHash near-dedup."""
    quality, exact_keep, drop = _cached_ml_stages(spark, sf_dir)
    survivors = quality.join(exact_keep, "doc_id", "left_semi")
    return survivors.join(drop, "doc_id", "left_anti").select("doc_id")


# Mixed-language query: a French, Spanish and Russian content word
# plus a CJK run that segments to bigrams — every term resolves in a
# different language's slice of the routed index.
ROUTED_QUERY = "données búsqueda поиск 機械学習"
ROUTED_K = 10


def _ml_index(spark: SparkSession, sf_dir: str):
    return session_cached(
        spark,
        "ml-routed-index",
        sf_dir,
        lambda: build_index(
            _cached_routed(spark, sf_dir).select("doc_id", "words"),
            tokens=F.col("words"),
        )
        .coalesce(8)
        .materialized(),
    )


def q_bm25_topk_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k over the language-routed index for a mixed-language
    query — the retrieval proof that one index serves every route:
    per-language stopword lists shaped the postings, and the CJK
    terms hit bigram vocabulary."""
    idx = _ml_index(spark, sf_dir)
    terms = routed_query_terms(ROUTED_QUERY)
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
        .limit(ROUTED_K)
    )


# ---------------------------------------------------------- oracles

_BASE_SQL = "[" + ", ".join(f"'{s}'" for s in ML_BASE_SENTS) + "]"
_TAIL_SQL = "[" + ", ".join(f"'{s}'" for s in ML_TAILS) + "]"

_MLDOCS_CTE = f"""
WITH mldocs AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 8 = 0 THEN coalesce(text, '') || ' ' ELSE '' END)
           || ({_BASE_SQL})[(doc_id % 8) + 1]
           || ' ' || ({_TAIL_SQL})[((doc_id % 8) * 3) + ((doc_id // 8) % 3) + 1]
           AS text
  FROM documents
)"""


def _markers_sql(code: str) -> str:
    return ", ".join(f"'{w}'" for w in UNICODE_LANG_MARKERS[code])


_BEST_SQL = "greatest(" + ", ".join(f"score_{c}" for c in _LANG_CODES) + ")"
_ARGMAX_SQL = (
    "CASE "
    + " ".join(f"WHEN score_{c} = {_BEST_SQL} THEN '{c}'" for c in _LANG_CODES)
    + " END"
)


def _stop_case_sql() -> str:
    whens = []
    for code in sorted(STOPWORDS_BY_LANG):
        words = STOPWORDS_BY_LANG[code]
        if words:
            lits = ", ".join(f"'{w}'" for w in words)
            whens.append(f"WHEN '{code}' THEN [{lits}]")
        else:
            whens.append(f"WHEN '{code}' THEN CAST([] AS VARCHAR[])")
    en = ", ".join(f"'{w}'" for w in STOPWORDS_BY_LANG["en"])
    return "CASE lang " + " ".join(whens) + f" ELSE [{en}] END"


_SCORE_COLS_SQL = ",\n         ".join(
    f"len(list_intersect(rawd, [{_markers_sql(c)}])) AS score_{c}"
    for c in _LANG_CODES
)

# The routed chain, CTE-for-CTE the same shape as routed_frame().
_ROUTED_CTES = f""",
mnorm AS (
  SELECT doc_id, {sql_normalize_expr('text')} AS ntext FROM mldocs
),
mraw AS (
  SELECT doc_id, ntext, {sql_raw_tokens_expr('ntext', unicode=True)} AS raw
  FROM mnorm
),
mscored AS (
  SELECT doc_id, ntext, raw,
         CASE WHEN len(raw) > 0 THEN
           len(list_filter(raw, w -> regexp_matches(w, '{_CJK_RUN_RE2}')))::DOUBLE
             / len(raw)
         ELSE 0.0 END AS cjk_share,
         {_SCORE_COLS_SQL}
  FROM (SELECT doc_id, ntext, raw, list_distinct(raw) AS rawd FROM mraw)
),
mlang AS (
  SELECT doc_id, ntext, raw,
         CASE WHEN cjk_share >= {CJK_SHARE_MIN} THEN 'cjk'
              ELSE {_ARGMAX_SQL} END AS lang
  FROM mscored
),
mkept AS (
  SELECT doc_id, ntext, lang, base,
         list_filter(base, w -> NOT list_contains({_stop_case_sql()}, w)) AS kept
  FROM (
    SELECT doc_id, ntext, lang,
           list_filter(raw, w -> length(w) >= {MIN_TOKEN_LEN}) AS base
    FROM mlang
  )
),
mrouted AS MATERIALIZED (
  SELECT doc_id, ntext, lang, words,
         (CASE WHEN lang = 'cjk' THEN len(words) ELSE len(base) END)::BIGINT
           AS n_base,
         (len(base) - len(kept))::BIGINT AS n_stop
  FROM (
    SELECT doc_id, ntext, lang, base, kept,
           CASE WHEN lang = 'cjk' THEN {sql_cjk_bigram_expr('kept')}
                ELSE kept END AS words
    FROM mkept
  )
)"""
# ^ MATERIALIZED: every downstream CTE (and especially the MinHash
# tail, whose pairs/near joins reference their inputs repeatedly)
# would otherwise re-inline the whole NFC+langid+routing chain —
# measured exponential-ish planning/runtime blowup (DuckDB OOM at
# sf0.001) without the fence. Spark-side the same role is played by
# the _cut_lineage/session cache in _cached_routed.

_ROUTED_CHAIN = _MLDOCS_CTE + _ROUTED_CTES

_ROUTED_TERMS_SQL = ", ".join(f"'{t}'" for t in routed_query_terms(ROUTED_QUERY))

_CURATE_ML_SQL = fill_neardup_placeholders(
    f"""{_ROUTED_CHAIN},
quality AS (
  SELECT doc_id, ntext, words FROM mrouted
  WHERE n_base >= {MIN_TOKENS} AND n_stop <= {MAX_STOP_RATIO} * n_base
),
exact_keep AS (
  SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(ntext)
),
survivors AS (
  SELECT q.doc_id, q.words FROM quality q
  WHERE EXISTS (SELECT 1 FROM exact_keep e WHERE e.doc_id = q.doc_id)
),
toks AS (
  SELECT doc_id, words AS t FROM survivors
),
{NEARDUP_TAIL_CTES}
SELECT doc_id FROM survivors
WHERE doc_id NOT IN (SELECT doc_b FROM near)
"""
)

# ------------------------------------- routed-language temperature mix


def q_routed_lang_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled resampling keyed on the DETECTED language —
    the balancing step a real multilingual pipeline runs (mT5 §3.2 /
    XLM-R): production corpora carry no language labels, so the
    mixing weights p_l^alpha come from the langid route, and the
    dominant languages (en + the two fr residues here) are
    down-sampled toward the flattened distribution. Pure composition:
    operators/mixture.temperature_resample over the routed frame —
    |langs|-row aggregates, broadcast rate table, deterministic
    hash-bucket keep decision per doc."""
    from searchengine_spark.operators.mixture import temperature_resample

    routed = _cached_routed(spark, sf_dir).select("doc_id", "lang")
    return temperature_resample(routed, "lang", "doc_id").select(
        "doc_id", "lang"
    )


def _routed_resample_oracle() -> str:
    from searchengine_spark.operators.mixture import ALPHA, TEMP_SALT
    from searchengine_spark.operators.sampling import N_BUCKETS, _bucket_sql

    return f"""{_ROUTED_CHAIN},
rl AS (SELECT doc_id, lang FROM mrouted),
counts AS (SELECT lang, COUNT(*) AS n FROM rl GROUP BY lang),
t AS (SELECT SUM(n) AS tot FROM counts),
w AS (
  SELECT lang, n, round(pow(n / t.tot, {ALPHA}), 6) AS wt
  FROM counts, t
),
s AS (SELECT MIN(n / wt) AS scale FROM w),
rates AS (
  SELECT lang, CAST(floor(s.scale * wt / n * {N_BUCKETS}) AS BIGINT) AS cutoff
  FROM w, s
)
SELECT d.doc_id, d.lang
FROM rl d JOIN rates r USING (lang)
WHERE {_bucket_sql("d.doc_id", TEMP_SALT)} < r.cutoff
"""


# ------------------------------------------ mixed-script (confusable)

# UTS #39-flavored spoofing audit: a token mixing Latin with Cyrillic
# or Greek letters is the classic homoglyph vector ("pаypal"
# with a Cyrillic а) — a quality/security signal every web-scale
# ingest wants BEFORE the text reaches dedup keys and the index.
# Latin+CJK mixing is deliberately NOT flagged (legitimate and
# routine in CJK text, cf. UTS #39 highly-restrictive profile).
_CONFUSABLE_JAVA = (r"\p{IsLatin}", r"\p{IsCyrillic}", r"\p{IsGreek}")
_CONFUSABLE_RE2 = (r"\p{Latin}", r"\p{Cyrillic}", r"\p{Greek}")

# Planted suffix per doc_id % 4 (explicit escapes): residues 1 and 2
# carry homoglyph-mixed tokens; 0 and 3 are clean single-script.
CONFUSABLE_SUFFIXES: tuple[str, ...] = (
    "paypal secure login",
    "p\u0430ypal verify mos\u043aow",
    "\u03b1lpha t\u0435st release",
    "\u043f\u043e\u0438\u0441\u043a \u0434\u0430\u043d\u043d\u044b\u0445",
)


def q_confusable_script_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mixed-script token audit over the planted
    fixture: n_mixed counts tokens whose letters span >= 2 of
    {Latin, Cyrillic, Greek}; suspicious docs are the review queue.
    Map-only: one \\p{L} tokenize + three rlike probes per token."""
    docs = load_table(spark, sf_dir, "documents")
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in CONFUSABLE_SUFFIXES]),
        (F.col("doc_id") % len(CONFUSABLE_SUFFIXES) + 1).cast("int"),
    )
    fixture = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")), F.lit(" "), suffix
        ).alias("text"),
    )
    toks = raw_tokens_column("text", unicode=True)
    n_scripts = lambda w: sum(  # noqa: E731 — tiny local combinator
        (w.rlike(p)).cast("int") for p in _CONFUSABLE_JAVA
    )
    base = ensure_min_partitions(fixture).select(
        "doc_id", toks.alias("toks")
    )
    return base.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.filter("toks", lambda w: n_scripts(w) >= 2))
        .cast("bigint")
        .alias("n_mixed"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_mixed",
        (F.col("n_mixed") > 0).alias("suspicious"),
    )


def _confusable_oracle() -> str:
    sfx = "[" + ", ".join(f"'{s}'" for s in CONFUSABLE_SUFFIXES) + "]"
    probes = " + ".join(
        f"CASE WHEN regexp_matches(w, '{p}') THEN 1 ELSE 0 END"
        for p in _CONFUSABLE_RE2
    )
    return f"""
WITH cdocs AS (
  SELECT doc_id,
         coalesce(text, '') || ' ' ||
           ({sfx})[(doc_id % {len(CONFUSABLE_SUFFIXES)}) + 1] AS text
  FROM documents
),
base AS (
  SELECT doc_id, {sql_raw_tokens_expr('text', unicode=True)} AS toks
  FROM cdocs
)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       len(list_filter(toks, w -> ({probes}) >= 2))::BIGINT AS n_mixed,
       len(list_filter(toks, w -> ({probes}) >= 2)) > 0 AS suspicious
FROM base
"""


QUERIES = {
    "text_routed_langs": q_routed_langs,
    "text_unicode_tokens_stopworded": q_unicode_tokens_stopworded,
    "pipeline_curated_docs_multilingual": q_curated_docs_multilingual,
    "se_bm25_topk_routed": q_bm25_topk_routed,
    "mix_routed_lang_resample": q_routed_lang_resample,
    "text_confusable_script_audit": q_confusable_script_audit,
}

ORACLES = {
    "mix_routed_lang_resample": _routed_resample_oracle(),
    "text_confusable_script_audit": _confusable_oracle(),
    "text_routed_langs": f"""{_ROUTED_CHAIN}
        SELECT doc_id, lang, n_base, n_stop, len(words)::BIGINT AS n_words
        FROM mrouted
    """,
    "text_unicode_tokens_stopworded": f"""{_ROUTED_CHAIN}
        SELECT word, count(*)::BIGINT AS freq,
               count(DISTINCT doc_id)::BIGINT AS n_docs
        FROM (SELECT doc_id, unnest(words) AS word FROM mrouted)
        GROUP BY word
    """,
    "pipeline_curated_docs_multilingual": _CURATE_ML_SQL,
    "se_bm25_topk_routed": f"""{_ROUTED_CHAIN},
mtok AS (
  SELECT doc_id, unnest(words) AS word FROM mrouted
){index_body_sql('m')},
scored AS (
  SELECT mtf.doc_id,
         midf.idf * (mtf.term_freq * {K1 + 1.0}) /
           (mtf.term_freq + {K1} * (1.0 - {B} + {B} * mdl.doc_length /
             (SELECT avgdl FROM mparams))) AS term_score
  FROM mtf
  JOIN midf ON mtf.word = midf.word
  JOIN mdl ON mtf.doc_id = mdl.doc_id
  WHERE mtf.word IN ({_ROUTED_TERMS_SQL})
)
SELECT doc_id, round(sum(term_score), 6) AS total_score
FROM scored GROUP BY doc_id
ORDER BY total_score DESC, doc_id ASC LIMIT {ROUTED_K}
""",
}
