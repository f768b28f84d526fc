"""SymSpell deletion-variant candidate generation must be exhaustive
for Levenshtein distance <= 1 — verified against brute force."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.fuzzy import deletion_variants, fuzzy_term_matches


def _brute(vocab_words, terms, max_dist=1):
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    return {
        (t, w, lev(t, w))
        for t in terms
        for w in vocab_words
        if lev(t, w) <= max_dist
    }


VOCAB = [
    "spark", "sparks", "shark", "join", "joint", "coin", "a", "b", "ab",
    "window", "widow", "windows", "x", "table", "cable", "fable",
]


@pytest.mark.parametrize(
    "terms",
    [
        ("spark", "join"),            # exact hits
        ("spak", "joinn", "windw"),   # deletion / insertion / deletion
        ("joim", "tabel", "zzz"),     # substitution, transpo-as-2-subs, miss
        ("a", "c", ""),               # single chars and the empty string
    ],
)
def test_matches_brute_force(spark, terms):
    vocab = spark.createDataFrame(
        [(w, 1) for w in VOCAB], "word string, doc_freq long"
    )
    got = {
        (r["term"], r["word"], r["dist"])
        for r in fuzzy_term_matches(vocab, terms).collect()
    }
    assert got == _brute(VOCAB, terms)


def test_deletion_variants_column(spark):
    df = spark.createDataFrame([("abc",), ("a",)], "w string")
    rows = {r["w"]: sorted(r["v"]) for r in df.select(
        "w", deletion_variants("w").alias("v")
    ).collect()}
    assert rows["abc"] == ["ab", "abc", "ac", "bc"]
    assert rows["a"] == ["", "a"]


def test_no_cartesian_in_plan(spark):
    vocab = spark.createDataFrame(
        [(w, 1) for w in VOCAB], "word string, doc_freq long"
    )
    plan = fuzzy_term_matches(vocab, ("spark",))._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan


@pytest.mark.parametrize(
    "terms",
    [
        ("spark", "sprk", "sprrk"),        # 1- and 2-deletion typos
        ("wnidow", "windwo", "jion"),      # transpositions (= 2 subs)
        ("tble", "cble", "zz", ""),        # deletions, misses, empty
    ],
)
def test_distance2_matches_brute_force(spark, terms):
    vocab = spark.createDataFrame(
        [(w, 1) for w in VOCAB], "word string, doc_freq long"
    )
    got = {
        (r["term"], r["word"], r["dist"])
        for r in fuzzy_term_matches(vocab, terms, max_dist=2).collect()
    }
    assert got == _brute(VOCAB, terms, max_dist=2)


def test_rejects_unsupported_distance(spark):
    vocab = spark.createDataFrame([("a", 1)], "word string, doc_freq long")
    with pytest.raises(ValueError):
        fuzzy_term_matches(vocab, ("a",), max_dist=3)


def test_batch_correction_matches_per_term_suggest(spark, sf_dir):
    """The one-join batch corrector must pick exactly what the
    interactive per-term scan picks (same tie rule)."""
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.index.fuzzy import correct_terms_batch
    from searchengine_spark.index.phrase import suggest_terms
    from searchengine_spark.io import load_table

    idx = build_index(load_table(spark, sf_dir, "documents"))
    vocab = idx.idf_values.select("word", "doc_freq")
    terms = ["spark", "joim", "windoe", "zzzzqq", "tabel"]
    batch = correct_terms_batch(vocab, terms, max_dist=1)
    for t in terms:
        rows = suggest_terms(vocab, t, max_distance=1, k=1).collect()
        want = rows[0]["word"] if rows else None
        assert batch[t] == want, (t, batch[t], want)


def test_search_many_corrected_equals_clean_batch(spark, sf_dir):
    """Typo'd queries, once corrected, must score identically to the
    clean batch."""
    from searchengine_spark.index.bm25 import search_many
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.index.fuzzy import search_many_corrected
    from searchengine_spark.io import load_table

    idx = build_index(load_table(spark, sf_dir, "documents")).cache()
    typod = {"q1": "sparkk joim", "q2": "windoe fast"}
    clean = {"q1": "spark join", "q2": "window fast"}
    got, corrections = search_many_corrected(idx, typod, k=5)
    want = search_many(idx, clean, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert corrections == {"sparkk": "spark", "joim": "join", "windoe": "window"}


def test_search_corrected_end_to_end(spark, sf_dir):
    """Typos correct then rank: corrected results equal searching the
    intended clean terms directly; oracle restates correction+scoring."""
    from searchengine_spark.index import fuzzy as FZ
    from searchengine_spark.index.bm25 import search_many
    from searchengine_spark.index.queries import _index
    from tests.helpers import assert_matches_oracle

    df = FZ.q_search_corrected(spark, sf_dir).cache()
    idx = _index(spark, sf_dir)
    clean = search_many(
        idx,
        {
            "q_typo_join": ["join", "window"],
            # "tabel" is 2 edits from "table" (transposition) and
            # nothing in vocab is within 1 — it drops entirely
            "q_typo_table": ["fast"],
            "q_mixed": ["spark"],
        },
        k=FZ.CORRECTED_K,
        round_scores=6,
    )
    assert df.exceptAll(clean).count() == 0
    assert clean.exceptAll(df).count() == 0
    assert_matches_oracle(
        df,
        FZ.ORACLES["se_search_corrected"],
        sf_dir,
        name="se_search_corrected",
    )
    df.unpersist()
