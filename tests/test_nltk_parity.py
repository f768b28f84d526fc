"""Golden tests for the NLTK token-for-token parity mode (X1/X2).

NLTK itself is not installed in the build container, so the goldens
pin known published NLTK behavior: the PorterStemmer demo vocabulary
(nltk/stem/porter.py docstring), classic word_tokenize examples from
the NLTK documentation, and hand-traced X1/X2 chains. If nltk IS
importable, the same assertions run against the real library too —
token-for-token.
"""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.text.nltk_parity import (
    NLTK_STOPWORDS,
    nltk_tokens_column,
    preprocess_query_nltk,
    preprocess_text_nltk,
    treebank_tokenize,
    word_tokenize,
)
from searchengine_spark.text.porter import porter_stem


def test_full_stopword_list_shape():
    assert len(NLTK_STOPWORDS) == 179
    # spot members across the list, incl. contraction fragments the
    # compact engine list lacks
    for w in ("i", "ourselves", "you're", "that'll", "should've",
              "mustn't", "wouldn't", "ma", "ain", "y"):
        assert w in NLTK_STOPWORDS
    # not stopwords
    for w in ("cannot", "court", "one", "never"):
        assert w not in NLTK_STOPWORDS


# The NLTK PorterStemmer demo vocabulary (public docstring) plus the
# extension-specific forms NLTK's default mode handles differently
# from the 1980 paper.
PORTER_NLTK_GOLDENS = {
    "caresses": "caress", "flies": "fli", "dies": "die", "mules": "mule",
    "denied": "deni", "died": "die", "agreed": "agre", "owned": "own",
    "humbled": "humbl", "sized": "size", "meeting": "meet",
    "stating": "state", "siezing": "siez", "itemization": "item",
    "sensational": "sensat", "traditional": "tradit",
    "reference": "refer", "colonizer": "colon", "plotted": "plot",
    # irregular pool
    "skies": "sky", "sky": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "news": "news", "innings": "inning",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    # step1c consonant-before-y condition
    "happy": "happi", "enjoy": "enjoy", "by": "by", "say": "say",
    "crying": "cri",
    # BLI->BLE departure (NLTK mode replaces the paper's ABLI->ABLE)
    "possibly": "possibl", "terribly": "terribl", "visibly": "visibl",
    "remarkably": "remark",
    # ies/ied on 4-letter words
    "ties": "tie",
    # ordinary inflection
    "courts": "court", "running": "run", "quickly": "quickli",
    "judges": "judg", "ruled": "rule", "property": "properti",
    "rights": "right",
}


@pytest.mark.parametrize("word,expected", sorted(PORTER_NLTK_GOLDENS.items()))
def test_porter_nltk_mode_goldens(word, expected):
    assert porter_stem(word, mode="nltk") == expected


def test_porter_original_mode_unchanged():
    # the engine default must not pick up the NLTK extensions
    assert porter_stem("dies") == "di"
    assert porter_stem("skies") == "ski"
    assert porter_stem("enjoy") == "enjoi"


TREEBANK_GOLDENS = [
    # classic NLTK doc example (lowercased, as the reference pipeline
    # always feeds lowercase text)
    (
        "good muffins cost $3.88 in new york.",
        ["good", "muffins", "cost", "$", "3.88", "in", "new", "york", "."],
    ),
    (
        "they'll save and invest more.",
        ["they", "'ll", "save", "and", "invest", "more", "."],
    ),
    (
        "hi, my name can't hello,",
        ["hi", ",", "my", "name", "ca", "n't", "hello", ","],
    ),
    ("i cannot do it", ["i", "can", "not", "do", "it"]),
    (
        "the court's ruling (no. 42) stands -- final.",
        ["the", "court", "'s", "ruling", "(", "no", ".", "42", ")",
         "stands", "--", "final", "."],
    ),
]


@pytest.mark.parametrize("text,expected", TREEBANK_GOLDENS)
def test_word_tokenize_goldens(text, expected):
    assert word_tokenize(text) == expected


def test_closing_quote_after_sentence_final_period_is_kept():
    # the sentence splitter must not swallow closing quotes/brackets:
    # NLTK emits them as '' / ) tokens
    assert word_tokenize('he said "stop." next one came.') == [
        "he", "said", "``", "stop", ".", "''", "next", "one", "came", ".",
    ]
    from searchengine_spark.text import nltk_parity

    if not nltk_parity._NLTK_AVAILABLE:
        # approximation-specific: real Punkt may treat "fig." as an
        # abbreviation and not split there
        assert word_tokenize("(see fig. 2.) done.") == [
            "(", "see", "fig", ".", "2", ".", ")", "done", ".",
        ]


def test_treebank_final_period_split_needs_sentence_boundaries():
    # within one sentence the mid-text period stays attached; the
    # sentence splitter is what exposes it to the final-period rule
    assert treebank_tokenize("one. two.") == ["one.", "two", "."]
    assert word_tokenize("one. two.") == ["one", ".", "two", "."]


def test_x1_document_chain_golden():
    text = "The courts were running quickly. Judges ruled on property rights."
    assert preprocess_text_nltk(text) == [
        "court", "run", "quickli", "judg", "rule", "properti", "right",
    ]
    assert preprocess_text_nltk(None) is None


def test_x2_query_chain_keeps_nonalpha():
    # X2 = X1 minus isalpha: numerals and punctuation survive
    # (the reference's documented asymmetry, SURVEY.md §2.8)
    assert preprocess_query_nltk("Can't judges rule on 42 rights?") == [
        "ca", "n't", "judg", "rule", "42", "right", "?",
    ]


def test_x1_stopword_test_precedes_stemming():
    # "having" is a stopword and must be dropped BEFORE stemming
    # (stem "have" is not in the list); "has" likewise.
    assert preprocess_text_nltk("having has haviness") == ["havi"]


def test_spark_udf_matches_driver_side(spark):
    texts = [
        "The courts were running quickly. Judges ruled on property rights.",
        "good muffins cost $3.88 in new york.",
        "I cannot enjoy the skies; they'll know.",
        None,
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r.id: r.toks
        for r in df.select("id", nltk_tokens_column("text").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == preprocess_text_nltk(t), f"row {i}"


def test_nltk_parity_index_end_to_end(spark):
    """build_index(tokens=nltk parity) + pre-tokenized query search."""
    from searchengine_spark.index.bm25 import search
    from searchengine_spark.index.builder import build_index

    docs = spark.createDataFrame(
        [
            (1, "The judge ruled on property rights."),
            (2, "Property values are rising quickly."),
            (3, "The running judge can't stop."),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs, tokens=nltk_tokens_column("text"))
    rows = search(idx, preprocess_query_nltk("property rights"), k=3).collect()
    assert rows and rows[0].doc_id == 1  # both terms hit doc 1
    assert {r.doc_id for r in rows} == {1, 2}
