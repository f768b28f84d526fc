"""Dedup efficacy on synthetic duplicates: exact copies, near copies
(small edits), and unrelated docs."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    minhash_bands,
    neardup_candidate_pairs,
    shingle_frame,
)
from searchengine_spark.operators.simhash import simhash_neardup_pairs, simhash_signatures

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the fence and the birds sing in the morning light over the hills "
    "as farmers walk slowly towards the distant market carrying baskets "
    "of fresh apples pears plums and grapes for the weekend village fair"
)
NEAR = BASE.replace("morning", "evening")  # one-token edit
OTHER = (
    "completely different content about database engines join algorithms "
    "shuffle partitions and columnar storage formats for analytical queries"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, BASE), (2, BASE), (3, NEAR), (4, OTHER)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_groups(docs):
    groups = {r.text_hash: r for r in exact_dedup_groups(docs).collect()}
    sizes = sorted(g.n_copies for g in groups.values())
    assert sizes == [1, 1, 2]
    dup = [g for g in groups.values() if g.n_copies == 2][0]
    assert dup.canonical_doc_id == 1


def test_minhash_lsh_finds_near_duplicates(docs):
    pairs = neardup_candidate_pairs(minhash_bands(docs)).collect()
    got = {(p.doc_a, p.doc_b) for p in pairs}
    assert (1, 2) in got          # exact copies always collide
    assert (1, 3) in got or (2, 3) in got  # near copies collide
    assert (1, 4) not in got and (2, 4) not in got and (3, 4) not in got


def test_jaccard_verification_scores(docs):
    sh = shingle_frame(docs)
    pairs = neardup_candidate_pairs(minhash_bands(shingles=sh))
    scored = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(None, pairs, shingles=sh).collect()}
    assert scored[(1, 2)] == pytest.approx(1.0)
    if (1, 3) in scored:
        assert 0.5 < scored[(1, 3)] < 1.0


def test_minhash_signature_estimates_jaccard(spark):
    """Statistical property of the hash family: the fraction of
    matching signature components estimates shingle-set Jaccard."""
    from searchengine_spark.operators.dedup import (
        NUM_HASHES,
        minhash_signature_cols,
        shingle_frame,
        shingle_hashes,
    )
    from pyspark.sql import functions as F

    # Two docs sharing ~2/3 of a long token stream.
    w = lambda i: "t" + chr(97 + i // 26) + chr(97 + i % 26)
    a = " ".join(w(i) for i in range(120))
    b = " ".join(w(i) for i in range(40, 160))
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id bigint, text string")

    sh = shingle_frame(docs)
    sigs = sh.select(
        "doc_id", *minhash_signature_cols(shingle_hashes(F.col("shingles")))
    ).collect()
    s1, s2 = sorted(sigs, key=lambda r: r.doc_id)
    matches = sum(
        1 for i in range(NUM_HASHES) if s1[f"sig_{i}"] == s2[f"sig_{i}"]
    )
    est = matches / NUM_HASHES

    shs = {r.doc_id: set(r.shingles) for r in sh.collect()}
    true_j = len(shs[1] & shs[2]) / len(shs[1] | shs[2])
    # 16 hashes -> sigma ~ sqrt(J(1-J)/16) ~ 0.12; allow 3 sigma.
    assert abs(est - true_j) <= 0.36, (est, true_j)


def test_simhash_near_duplicates(docs):
    sigs = simhash_signatures(docs)
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_neardup_pairs(sigs).collect()}
    assert pairs.get((1, 2)) == 0          # identical text -> same simhash
    assert (1, 4) not in pairs             # unrelated docs don't pair


def test_connected_components_transitive_closure(spark):
    """A~B, B~C, D~E: {A,B,C} one cluster (despite A,C never matching
    directly), {D,E} another; labels are the cluster-min ids."""
    from searchengine_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    got = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    """A 12-node path graph needs diameter-many propagation rounds —
    exercises the iteration loop well past one hop."""
    from searchengine_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "doc_a bigint, doc_b bigint"
    )
    comps = {r.component for r in connected_components(edges).collect()}
    assert comps == {100}


def test_connected_components_star_handoff_on_long_chain(spark):
    """Exhausting max_iterations hands off to large-star/small-star
    contraction and still returns the CORRECT clustering — an
    adversarial chain can no longer abort the job."""
    from searchengine_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200, 230)], "doc_a bigint, doc_b bigint"
    )
    got = {r.node: r.component for r in connected_components(chain, max_iterations=2).collect()}
    assert set(got) == set(range(200, 231))
    assert set(got.values()) == {200}


def test_star_components_10k_node_path(spark):
    """Property from the SoCC'14 paper: star contraction converges in
    O(log^2 n) rounds on a PATH graph — the worst case for per-round
    label propagation (diameter = n). 10k nodes, one component."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.dedup import _star_components

    n = 10_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    sym = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = _star_components(sym, max_rounds=30)
    rows = labels.groupBy("component").count().collect()
    assert len(rows) == 1
    assert rows[0].component == 0 and rows[0]["count"] == n


def test_star_components_matches_union_find(spark):
    """Randomized cross-check: star labels == Python union-find
    ground truth on an arbitrary small graph."""
    import random

    from searchengine_spark.operators.dedup import connected_components

    rnd = random.Random(13)
    nodes = list(range(60))
    edge_list = [
        (rnd.choice(nodes), rnd.choice(nodes)) for _ in range(70)
    ]
    edge_list = [(a, b) for a, b in edge_list if a != b]

    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {}
    for a, b in edge_list:
        for v in (a, b):
            truth[v] = find(v)

    edges = spark.createDataFrame(edge_list, "doc_a bigint, doc_b bigint")
    # max_iterations=1 forces the star path on any non-trivial graph
    got = {r.node: r.component for r in connected_components(edges, max_iterations=1).collect()}
    assert got == truth


def test_incremental_neardup_matches_full_rebuild(spark, sf_dir):
    """Split the corpus into 'existing' and 'new batch'; incremental
    banding must find exactly the full-corpus pairs that involve at
    least one new doc (and never re-band the existing corpus)."""
    from searchengine_spark.io import load_table
    from searchengine_spark.operators.dedup import (
        incremental_neardup_pairs,
        minhash_bands,
        neardup_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 5 != 0)
    new_batch = docs.filter(F.col("doc_id") % 5 == 0)

    full = {
        (r.doc_a, r.doc_b)
        for r in neardup_candidate_pairs(minhash_bands(docs)).collect()
    }
    expected = {
        (a, b) for a, b in full if a % 5 == 0 or b % 5 == 0
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in incremental_neardup_pairs(
            new_batch, minhash_bands(existing)
        ).collect()
    }
    assert got == expected
    assert expected, "test corpus should contain cross-batch near-dups"


def test_persisted_barrier_same_results_no_exchange(spark, sf_dir, tmp_path):
    """Build-scale path: minhash banding through persisted parquet
    intermediates must (a) produce byte-identical band tables and
    (b) plan with NO corpus-wide Exchange — the shuffle of the token
    stream is replaced by map-only writes + scans."""
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.dedup import minhash_bands

    docs = load_table(spark, sf_dir, "documents")
    base = {tuple(r) for r in minhash_bands(docs).collect()}
    persisted_df = minhash_bands(docs, persist_dir=str(tmp_path))
    got = {tuple(r) for r in persisted_df.collect()}
    assert got == base

    plan = persisted_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # the intermediates landed where promised (session-unique suffixes)
    import glob
    import os

    assert glob.glob(os.path.join(str(tmp_path), "tokens-*"))
    assert glob.glob(os.path.join(str(tmp_path), "shingle_hashes-*"))


def test_incremental_pairs_correct_under_persist_dir(spark, sf_dir, tmp_path, monkeypatch):
    """Regression: the incremental query bands the corpus and then the
    batch; with a shared persist_dir the second banding must NOT
    overwrite intermediates the first's lazy scan still needs (paths
    are call-unique now)."""
    from searchengine_spark.registry import all_queries

    q = all_queries()["dedup_incremental_pairs"]
    base = {tuple(r) for r in q(spark, sf_dir).collect()}
    monkeypatch.setenv("SPARK_GRAFT_PERSIST_DIR", str(tmp_path))
    got = {tuple(r) for r in q(spark, sf_dir).collect()}
    assert got == base


class TestCrossDocSpans:
    """cross_doc_spans: Lee et al.-style verbatim overlap detection."""

    @staticmethod
    def _w(i):
        # pure-alpha synthetic words (raw tokens split on non-alpha)
        return "w" + chr(97 + i // 26) + chr(97 + i % 26)

    def test_planted_overlap_found_with_exact_positions(self, spark):
        from searchengine_spark.operators.dedup import cross_doc_spans

        common = " ".join(self._w(i) for i in range(15))
        pre_a = " ".join(self._w(100 + i) for i in range(5))
        pre_b = " ".join(self._w(200 + i) for i in range(3))
        suf = " ".join(self._w(300 + i) for i in range(4))
        docs = spark.createDataFrame(
            [
                (1, f"{pre_a} {common} {suf}"),
                (2, f"{pre_b} {common}"),
                (3, " ".join(self._w(400 + i) for i in range(30))),  # disjoint
            ],
            "doc_id long, text string",
        )
        rows = cross_doc_spans(docs, k=10).collect()
        assert [
            (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens) for r in rows
        ] == [(1, 2, 5, 3, 15)]

    def test_overlap_shorter_than_k_not_reported(self, spark):
        from searchengine_spark.operators.dedup import cross_doc_spans

        common = " ".join(self._w(i) for i in range(9))  # 9 < k=10
        docs = spark.createDataFrame(
            [
                (1, common + " " + " ".join(self._w(100 + i) for i in range(6))),
                (2, common + " " + " ".join(self._w(200 + i) for i in range(6))),
            ],
            "doc_id long, text string",
        )
        assert cross_doc_spans(docs, k=10).count() == 0

    def test_df_cap_suppresses_boilerplate(self, spark):
        from searchengine_spark.operators.dedup import cross_doc_spans

        boiler = " ".join(self._w(i) for i in range(10))
        docs = spark.createDataFrame(
            [(i, boiler) for i in range(1, 23)],  # 22 docs > df_cap=20
            "doc_id long, text string",
        )
        assert cross_doc_spans(docs, k=10, df_cap=20).count() == 0
        # under the cap the same corpus reports all pairs
        under = cross_doc_spans(docs.filter("doc_id <= 5"), k=10, df_cap=20)
        assert under.count() == 10  # C(5,2) pairs x 1 span

    def test_repeated_phrase_yields_one_span_per_occurrence_pair(self, spark):
        from searchengine_spark.operators.dedup import cross_doc_spans

        phrase = " ".join(self._w(i) for i in range(10))
        filler = " ".join(self._w(100 + i) for i in range(10))
        docs = spark.createDataFrame(
            [(1, f"{phrase} {filler} {phrase}"), (2, phrase)],
            "doc_id long, text string",
        )
        rows = cross_doc_spans(docs, k=10).collect()
        got = sorted((r.start_a, r.start_b, r.span_tokens) for r in rows)
        assert got == [(0, 0, 10), (20, 0, 10)]


def test_reliable_checkpoint_path_identical_components(spark, tmp_path, monkeypatch):
    """With $SPARK_GRAFT_PERSIST_DIR set, the iterative CC loops cut
    lineage via RELIABLE checkpoint() (survives executor loss on a
    cluster) and must reach exactly the same fixed point as the
    localCheckpoint default."""
    import glob
    import os

    from searchengine_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    baseline = sorted(
        (r.node, r.component) for r in connected_components(edges).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_PERSIST_DIR", str(tmp_path))
    reliable = sorted(
        (r.node, r.component) for r in connected_components(edges).collect()
    )
    assert reliable == baseline
    ckpt_dir = spark.sparkContext.getCheckpointDir()
    assert ckpt_dir is not None
    # reliable checkpoints actually hit storage (rdd-* block dirs
    # under the session's <dir>/<uuid> checkpoint root)
    assert glob.glob(os.path.join(ckpt_dir.replace("file:", ""), "rdd-*"))


class TestSpanRemoval:
    """remove_cross_doc_spans: keep-lowest excision (Lee et al. pt 2)."""

    @staticmethod
    def _w(i):
        return "w" + chr(97 + i // 26) + chr(97 + i % 26)

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_higher_doc_loses_span_lower_keeps(self, spark):
        from searchengine_spark.operators.dedup import remove_cross_doc_spans

        common = " ".join(self._w(i) for i in range(12))
        pre = " ".join(self._w(100 + i) for i in range(3))
        suf = " ".join(self._w(200 + i) for i in range(3))
        docs = self._docs(
            spark,
            [(1, f"{pre} {common}"), (2, f"{common} {suf}"),
             (3, " ".join(self._w(300 + i) for i in range(15)))],
        )
        out = {r.doc_id: r for r in remove_cross_doc_spans(docs, k=10).collect()}
        assert out[1].clean_text == f"{pre} {common}"      # keeper untouched
        assert out[1].n_removed_tokens == 0
        assert out[2].clean_text == suf                     # span excised
        assert out[2].n_removed_tokens == 12
        assert out[3].n_removed_tokens == 0                 # bystander

    def test_triple_copy_leaves_exactly_one_occurrence(self, spark):
        from searchengine_spark.operators.dedup import (
            cross_doc_spans,
            remove_cross_doc_spans,
        )

        span = " ".join(self._w(i) for i in range(10))
        docs = self._docs(spark, [(1, span), (2, span), (3, span)])
        out = {r.doc_id: r.clean_text for r in
               remove_cross_doc_spans(docs, k=10).collect()}
        assert out == {1: span, 2: "", 3: ""}
        # idempotence: nothing left to find on the scrubbed corpus
        rescrubbed = self._docs(spark, [(i, t) for i, t in out.items()])
        assert cross_doc_spans(rescrubbed, k=10).count() == 0

    def test_overlapping_cut_ranges_collapse(self, spark):
        from searchengine_spark.operators.dedup import remove_cross_doc_spans

        # doc 3 shares one long span with doc 1 and a shifted sub-span
        # with doc 2 — the two cut ranges overlap and must not
        # double-count removed tokens.
        long_span = " ".join(self._w(i) for i in range(14))
        sub_span = " ".join(self._w(i) for i in range(2, 13))  # 11 toks inside
        docs = self._docs(
            spark,
            [(1, long_span), (2, sub_span), (3, long_span)],
        )
        out = {r.doc_id: r for r in remove_cross_doc_spans(docs, k=10).collect()}
        assert out[3].clean_text == ""
        assert out[3].n_removed_tokens == 14  # union of ranges, not 14+11
        assert out[1].n_removed_tokens == 0   # lowest id keeps
        # doc 2 loses its whole text to doc 1 (1 < 2)
        assert out[2].clean_text == "" and out[2].n_removed_tokens == 11


def test_cross_doc_spans_matches_bruteforce_reference(spark):
    """Randomized cross-check: the distributed shingle/diagonal/island
    pipeline must equal a direct O(pairs x positions) Python reference
    on corpora engineered for heavy k-gram collision (3-word vocab)."""
    import random

    from searchengine_spark.operators.dedup import cross_doc_spans

    rnd = random.Random(42)
    vocab = ["aa", "bb", "cc"]
    k = 3
    docs_py = {
        d: [rnd.choice(vocab) for _ in range(rnd.randint(k, 14))]
        for d in range(1, 9)
    }

    expected = set()
    for a in docs_py:
        for b in docs_py:
            if a >= b:
                continue
            ta, tb = docs_py[a], docs_py[b]
            matches = {
                (i, j)
                for i in range(len(ta) - k + 1)
                for j in range(len(tb) - k + 1)
                if ta[i : i + k] == tb[j : j + k]
            }
            by_diag = {}
            for i, j in matches:
                by_diag.setdefault(i - j, []).append(i)
            for d, pos in by_diag.items():
                pos.sort()
                run = [pos[0]]
                for p in pos[1:]:
                    if p == run[-1] + 1:
                        run.append(p)
                    else:
                        expected.add((a, b, run[0], run[0] - d, run[-1] - run[0] + k))
                        run = [p]
                expected.add((a, b, run[0], run[0] - d, run[-1] - run[0] + k))

    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs_py.items()], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        for r in cross_doc_spans(docs, k=k, df_cap=10_000).collect()
    }
    assert got == expected


class TestHotBucketCap:
    """The LSH hot-bucket guard: B near-identical boilerplate docs share
    every band bucket and would emit B^2/2 pairs from one key — the
    quadratic-output hazard AQE cannot fix (it splits partitions, not
    keys). The cap excludes oversized buckets from the pair join and
    surfaces them via hot_buckets()."""

    N_BOILER = 1000

    @pytest.fixture(scope="class")
    def planted(self, spark):
        # 1000 byte-identical boilerplate docs (the survives-exact-dedup
        # worst case is near-identical; byte-identical maximizes bucket
        # size, the quantity under test) + the normal near-dup group.
        rows = [(i, BASE + " boilerplate footer text here") for i in range(100_000, 100_000 + self.N_BOILER)]
        rows += [(1, OTHER), (2, OTHER), (3, OTHER.replace("join", "merge"))]
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_capped_output_bounded_recall_kept(self, planted):
        from searchengine_spark.operators.dedup import hot_buckets

        bands = minhash_bands(planted).cache()
        try:
            cap = 10
            pairs = neardup_candidate_pairs(bands, max_bucket=cap).collect()
            got = {(p.doc_a, p.doc_b) for p in pairs}
            # Normal-group recall unchanged: the 3-doc OTHER group is
            # far below the cap and fully detected.
            assert (1, 2) in got
            assert (1, 3) in got or (2, 3) in got
            # Quadratic output eliminated: the 1000-copy bucket would
            # contribute ~500k pairs uncapped; capped output stays
            # O(cap^2 * n_bands) — assert a hard generous bound far
            # below B^2/2.
            n_bands = bands.select("band").distinct().count()
            assert len(got) <= (cap * (cap - 1) // 2) * n_bands + 10
            assert not any(a >= 100_000 for a, _ in got)
            # The exclusion is LOUD: every band reports the boilerplate
            # bucket with its true size.
            hot = hot_buckets(bands, cap).collect()
            assert len(hot) == n_bands
            assert all(h.n_docs == self.N_BOILER for h in hot)
        finally:
            bands.unpersist()

    def test_uncapped_optin_and_subcap_default_unchanged(self, planted):
        # Since round 8 the DEFAULT is capped (DEFAULT_MAX_BUCKET);
        # uncapped is opt-in via max_bucket=None. For sub-cap buckets
        # (10 copies < 64) BOTH paths must emit every pair — the
        # oracle-checked contract for dedup_neardup_pairs.
        bands = minhash_bands(planted.filter(F.col("doc_id") < 100_010))
        for mb in (None, "default"):
            pairs = (
                neardup_candidate_pairs(bands)
                if mb == "default"
                else neardup_candidate_pairs(bands, max_bucket=None)
            )
            got = {(p.doc_a, p.doc_b) for p in pairs.collect()}
            boiler = [(a, b) for a, b in got if a >= 100_000 and b >= 100_000]
            assert len(boiler) == 10 * 9 // 2  # all pairs of the 10 copies


def test_minhash_accuracy_audit(spark, sf_dir):
    """Per candidate pair: signature agreement tracks exact Jaccard
    (bucket-mates agree on most slots), and the frame hash-matches."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators import dedup as D
    from tests.helpers import assert_matches_oracle

    df = D.q_minhash_accuracy(spark, sf_dir).cache()
    rows = df.collect()
    assert rows, "banding produced no candidate pairs"
    assert all(0 <= r["n_sig_match"] <= D.NUM_HASHES for r in rows)
    # LSH candidates share >= 1 full band by construction
    assert all(r["n_sig_match"] >= D.BAND_SIZE for r in rows)
    # the estimator tracks truth in aggregate: mean |est - jaccard|
    # stays under 2 sigma of a NUM_HASHES-sample mean
    err = df.agg(
        F.avg(F.abs(F.col("n_sig_match") / D.NUM_HASHES - F.col("jaccard")))
    ).collect()[0][0]
    assert err < 0.25
    assert_matches_oracle(
        df,
        D.ORACLES["dedup_minhash_accuracy"],
        sf_dir,
        name="dedup_minhash_accuracy",
    )
    df.unpersist()


def test_shared_stage_caches_identity(spark, sf_dir):
    """The r13 shared-stage caches: bands/capped-pairs/true-pairs are
    built once per (session, sf_dir) — the second call returns the
    SAME frame object — and the cached pairs equal a from-scratch
    derivation row for row."""
    from searchengine_spark.operators import dedup as D
    from searchengine_spark.operators.setjoin import _true_pairs

    b1, b2 = D._bands(spark, sf_dir), D._bands(spark, sf_dir)
    p1, p2 = D._capped_pairs(spark, sf_dir), D._capped_pairs(spark, sf_dir)
    t1, t2 = _true_pairs(spark, sf_dir), _true_pairs(spark, sf_dir)
    assert b1 is b2 and p1 is p2 and t1 is t2

    fresh = D.neardup_candidate_pairs(
        D.minhash_bands(shingles=D._shingles(spark, sf_dir))
    )
    assert sorted(map(tuple, p1.collect())) == sorted(
        map(tuple, fresh.collect())
    )
