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
