"""Prefix-filtered exact Jaccard join: completeness vs brute force
on planted data, and the prefix actually prunes."""

import itertools

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.dedup import shingle_frame
from searchengine_spark.operators.setjoin import prefix_jaccard_pairs


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(shingle_rows, t_num, t_den):
    sets = {r["doc_id"]: set(r["shingles"]) for r in shingle_rows}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and t_den * inter >= t_num * union:
            out.add((a, b))
    return out


@pytest.mark.parametrize("t_num,t_den", [(3, 5), (4, 5), (9, 10)])
def test_matches_brute_force_on_planted_neardups(spark, t_num, t_den):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,
        base + " extra",                     # high-jaccard neighbor
        base.replace("delta", "replaced"),   # one-substitution neighbor
        "totally different words entirely here now",
        base,                                # exact duplicate of 0
        " ".join(base.split()[::-1]),        # same words, reversed order
    ]
    sh = shingle_frame(_docs(spark, texts))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_jaccard_pairs(sh, t_num=t_num, t_den=t_den).collect()
    }
    assert got == _brute(sh.collect(), t_num, t_den)


def test_prefix_prunes_frequent_tokens(spark):
    # 30 docs sharing one hot shingle but otherwise disjoint: the
    # candidate set must not contain all C(30,2) pairs. NB: the
    # tokenizer strips digits, so distinctness must be alphabetic.
    letters = "abcdefghijklmnopqrstuvwxyz"
    texts = [
        f"common shared shingle u{letters[i % 26]}{letters[i // 26]}x "
        f"w{letters[i % 26]}{letters[i // 26]}y t{letters[i % 26]}{letters[i // 26]}z"
        for i in range(30)
    ]
    sh = shingle_frame(_docs(spark, texts))
    pairs = prefix_jaccard_pairs(sh)
    assert pairs.count() == 0  # nothing actually meets the threshold
    # structural: no cartesian in the plan
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
