"""A-priori 2-itemsets: planted supports, prune == no-prune, lift."""

import itertools

import pytest

from searchengine_spark.operators.itemsets import frequent_pairs


@pytest.fixture()
def baskets(spark):
    # aa+bb co-occur in 4 docs; aa+cc in 2; dd appears once (infrequent
    # item — must be pruned before pair generation). Repeated words in
    # one doc count once (presence, not tf).
    rows = [
        (0, "aa bb aa"),
        (1, "aa bb cc"),
        (2, "aa bb cc"),
        (3, "aa bb dd"),
        (4, "aa ee"),
        (5, ""),  # empty basket still dilutes lift
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def _brute(rows, min_support):
    import re

    sets = {
        i: {w for w in re.split("[^a-z]+", t.lower()) if len(w) >= 2}
        for i, t in rows
    }
    n_docs = len(rows)
    df = {}
    for s in sets.values():
        for w in s:
            df[w] = df.get(w, 0) + 1
    pair_n = {}
    for s in sets.values():
        for w1, w2 in itertools.combinations(sorted(s), 2):
            pair_n[(w1, w2)] = pair_n.get((w1, w2), 0) + 1
    return {
        (w1, w2): (n, round(n * n_docs / (df[w1] * df[w2]), 6))
        for (w1, w2), n in pair_n.items()
        if n >= min_support and df[w1] >= min_support and df[w2] >= min_support
    }


def test_planted_supports_and_lift(spark, baskets):
    rows, df = baskets
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["lift"])
        for r in frequent_pairs(df, min_support=2).collect()
    }
    assert got == _brute(rows, 2)
    assert got[("aa", "bb")][0] == 4
    # lift(aa,bb) = 4 * 6 / (5 * 4) = 1.2
    assert got[("aa", "bb")][1] == pytest.approx(1.2)
    assert ("aa", "dd") not in got  # dd infrequent -> a-priori pruned


def test_prune_never_loses_a_frequent_pair(spark):
    # The a-priori prune is an optimization, not a semantics change:
    # the result must equal brute force (which doesn't prune items).
    import random

    rng = random.Random(5)
    vocab = ["red", "green", "blue", "cyan", "teal", "plum", "rare"]
    rows = [
        (i, " ".join(rng.sample(vocab[:-1], rng.randint(1, 4))))
        for i in range(40)
    ]
    rows.append((99, "rare teal"))  # 'rare' df=1: below any support
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["lift"])
        for r in frequent_pairs(df, min_support=5).collect()
    }
    assert got == _brute(rows, 5)
    assert len(got) >= 3
