"""Property-based tests (hypothesis) for the text/scoring kernels."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.text.porter import porter_stem
from searchengine_spark.text.tokenizer import MIN_TOKEN_LEN, STOPWORDS, tokenize_query

text_strategy = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=200
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_tokens_are_normalized(text):
    toks = tokenize_query(text)
    for t in toks:
        assert t == t.lower()
        assert t.isalpha() and t.isascii()
        assert len(t) >= MIN_TOKEN_LEN
        assert t not in STOPWORDS


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_tokenize_deterministic(text):
    assert tokenize_query(text) == tokenize_query(text)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200))
@settings(max_examples=200, deadline=None)
def test_tokenize_case_insensitive_ascii(text):
    # ASCII only: Unicode case-folding is not involutive (hypothesis
    # found 'ß'.upper() == 'SS', which the ASCII [a-z] tokenizer keeps
    # while dropping 'ß'). The engine's tokenizer is ASCII-by-design.
    assert tokenize_query(text.upper()) == tokenize_query(text)


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=30))
@settings(max_examples=500, deadline=None)
def test_porter_output_sane(word):
    stem = porter_stem(word)
    assert stem  # never empty
    assert len(stem) <= len(word)  # suffix stripping never grows
    assert stem.isalpha()


def test_asof_join_matches_naive_definition(spark=None):
    """asof(left, right): matched_ts == max(right.ts <= left.ts) per
    key — checked against a brute-force python computation on a
    deterministic pseudo-random dataset."""
    import itertools

    from searchengine_spark.relational.advanced import asof_join_last_event
    from searchengine_spark.session import get_spark

    spark = get_spark("prop-asof", shuffle_partitions=4)
    rng_state = 12345
    def rng():
        nonlocal rng_state
        rng_state = (rng_state * 1103515245 + 12345) % (1 << 31)
        return rng_state

    lefts = [(rng() % 5, 1000 + rng() % 500, i) for i in range(80)]
    rights = [(rng() % 5, 1000 + rng() % 500) for _ in range(60)]

    left_df = spark.createDataFrame(
        [(k, t, e) for k, t, e in lefts], "user_id bigint, ts bigint, event_id bigint"
    ).selectExpr("user_id", "timestamp_seconds(ts) as ts", "event_id")
    right_df = spark.createDataFrame(
        [(k, t) for k, t in rights], "user_id bigint, ts bigint"
    ).selectExpr("user_id", "timestamp_seconds(ts) as ts")

    got = {
        r.event_id: (None if r.matched_ts is None else int(r.matched_ts.timestamp()))
        for r in asof_join_last_event(left_df, right_df, key="user_id").collect()
    }
    for k, t, e in lefts:
        candidates = [rt for rk, rt in rights if rk == k and rt <= t]
        expect = max(candidates) if candidates else None
        assert got[e] == expect, (e, k, t)
    """More occurrences of a query term -> higher score, all else equal."""
    k1, b = 1.2, 0.75
    idf, dl, avgdl = 0.5, 100.0, 100.0

    def score(tf):
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    scores = [score(tf) for tf in range(1, 20)]
    assert all(a < b_ for a, b_ in zip(scores, scores[1:]))
    # bounded by idf*(k1+1)
    assert all(s < idf * (k1 + 1) for s in scores)


def test_bm25_penalizes_long_docs():
    k1, b = 1.2, 0.75

    def score(dl):
        return 0.5 * (3 * (k1 + 1)) / (3 + k1 * (1 - b + b * dl / 100.0))

    assert score(50) > score(100) > score(500)


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=12, deadline=None)
def test_connected_components_matches_union_find(spark, edge_list):
    """Spark min-label propagation == plain union-find on random
    graphs (self-loops and duplicate edges included)."""
    from searchengine_spark.operators.dedup import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edge_list:
        union(a, b)
    # representative = min node of each component (matches min-label)
    comp = {}
    for n in list(parent):
        r = find(n)
        comp.setdefault(r, set()).add(n)
    expected = {n: min(members) for members in comp.values() for n in members}

    edges = spark.createDataFrame(
        edge_list, "doc_a bigint, doc_b bigint"
    )
    got = {
        r.node: r.component
        for r in connected_components(edges, max_iterations=40).collect()
    }
    assert got == expected
