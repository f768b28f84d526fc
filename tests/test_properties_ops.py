"""Property-based tests (hypothesis) for the round-4 operators:
driver-side brute-force models vs the distributed implementations.

Spark jobs are slow per example, so each property batches many
random cases into ONE DataFrame per example and keeps max_examples
small — hypothesis still explores the structure (duplicates, empty
strings, singletons) via its shrinking heuristics.
"""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="abcdef", min_size=0, max_size=6)
SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


@SLOW
@given(
    vocab=st.lists(WORD, min_size=1, max_size=20, unique=True),
    terms=st.lists(WORD, min_size=1, max_size=5, unique=True),
    dist=st.sampled_from([1, 2]),
)
def test_fuzzy_join_equals_brute_force(spark, vocab, terms, dist):
    from searchengine_spark.index.fuzzy import fuzzy_term_matches

    vdf = spark.createDataFrame([(w, 1) for w in vocab], "word string, doc_freq long")
    got = {
        (r["term"], r["word"])
        for r in fuzzy_term_matches(vdf, tuple(terms), max_dist=dist).collect()
    }
    want = {(t, w) for t in terms for w in vocab if _lev(t, w) <= dist}
    assert got == want


@SLOW
@given(
    docs=st.lists(
        st.lists(st.integers(0, 30), min_size=1, max_size=12),
        min_size=2,
        max_size=12,
    ),
    t=st.sampled_from([(1, 2), (3, 5), (4, 5)]),
)
def test_prefix_join_equals_brute_force(spark, docs, t):
    """Feed arbitrary integer 'shingle' sets straight into the join
    (bypassing text shingling) — completeness must hold for ANY set
    family, not just 3-gram structure."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.setjoin import prefix_jaccard_pairs

    t_num, t_den = t
    sh = spark.createDataFrame(
        [(i, [str(x) for x in d]) for i, d in enumerate(docs)],
        "doc_id long, shingles array<string>",
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_jaccard_pairs(sh, t_num=t_num, t_den=t_den).collect()
    }
    sets = {i: set(map(str, d)) for i, d in enumerate(docs)}
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if t_den * inter >= t_num * union:
            want.add((a, b))
    assert got == want


@SLOW
@given(
    splits=st.lists(st.integers(0, 2), min_size=1, max_size=30),
)
def test_incremental_rollup_any_split_equals_full(spark, splits):
    """However events are partitioned into three append batches, the
    maintained rollup equals the full recompute."""
    import datetime

    from pyspark.sql import functions as F

    from searchengine_spark.relational.incremental_agg import (
        init_rollup,
        merge_rollup,
        rollup_view,
    )

    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1, 9 + (i % 3), 7 * (i % 5)),
            i % 4,
            "view" if i % 2 else "click",
            float(i) + 0.25,
        )
        for i in range(len(splits))
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    full = (
        ev.groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    batches = [
        ev.filter(
            F.col("event_id").isin([i for i, s in enumerate(splits) if s == k])
        )
        for k in (0, 1, 2)
    ]
    state = init_rollup(batches[0])
    state = merge_rollup(state, batches[1])
    state = merge_rollup(state, batches[2])
    assert sorted(map(tuple, rollup_view(state).collect())) == sorted(
        map(tuple, full.collect())
    )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["upsert", "delete"]),
            st.integers(min_value=0, max_value=4),   # small key space -> collisions
            st.integers(min_value=0, max_value=99),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_mor_replay_equals_dict_model(spark, ops):
    """Merge-on-read vs the obvious sequential model: apply the same
    random upsert/delete sequence to a python dict; read_mor after
    committing each op as its own delta must equal the dict. Small
    key space forces update-after-delete, delete-missing, and
    repeated-key chains."""
    import tempfile

    from searchengine_spark.sources import versioned as V

    t = tempfile.mkdtemp(prefix="mor_prop_")
    model: dict[int, int] = {}
    for kind, k, v in ops:
        if kind == "upsert":
            model[k] = v
            row = [(k, v, False)]
        else:
            model.pop(k, None)
            row = [(k, 0, True)]
        V.append_delta(
            spark,
            spark.createDataFrame(row, "k long, v long, _tombstone boolean").coalesce(1),
            t,
        )
    got = {r["k"]: r["v"] for r in V.read_mor(spark, t, key="k").collect()}
    assert got == model
