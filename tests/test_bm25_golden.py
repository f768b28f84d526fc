"""Hand-computed BM25 goldens from FIXTURES.md §4 — the reference's
exact scoring semantics (k1=1.2, b=0.75, idf=log10(N/df))."""

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.bm25 import search
from searchengine_spark.index.builder import build_index


@pytest.fixture(scope="module")
def micro_index(spark):
    # Pre-tokenized micro corpus (5 docs, avgdl=3.0) from FIXTURES §4.
    rows = [
        (1, ["murder", "trial", "court"]),
        (2, ["contract", "breach", "court", "court"]),
        (3, ["murder", "murder", "appeal"]),
        (4, ["properti", "right", "court"]),
        (5, ["appeal", "court"]),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, words array<string>")
    return build_index(docs, tokens=F.col("words"), cache_tokens=False)


def test_index_stats(micro_index):
    params = micro_index.scoring_params.collect()[0]
    assert params.n_docs == 5
    assert params.avgdl == pytest.approx(3.0)
    idf = {r.word: r.idf for r in micro_index.idf_values.collect()}
    assert idf["murder"] == pytest.approx(math.log10(5 / 2), abs=1e-9)
    assert idf["court"] == pytest.approx(math.log10(5 / 4), abs=1e-9)
    dl = {r.doc_id: r.doc_length for r in micro_index.doc_lengths.collect()}
    assert dl == {1: 3, 2: 4, 3: 3, 4: 3, 5: 2}


def test_single_term_query(micro_index):
    res = search(micro_index, ["murder"], k=10).collect()
    assert [(r.doc_id, round(r.total_score, 6)) for r in res] == [
        (3, 0.547168),
        (1, 0.397940),
    ]


def test_multi_term_query_with_tiebreak(micro_index):
    res = search(micro_index, ["court", "appeal"], k=10).collect()
    got = [(r.doc_id, round(r.total_score, 6)) for r in res]
    # Golden from FIXTURES §4 (doc 5 recomputed at full precision:
    # the .md rounds each term's score before summing -> 0.572985;
    # exact = 0.09691001*2.2/1.9 + 0.39794001*2.2/1.9 = 0.5729842).
    # Docs 1 and 4 tie -> doc_id ascending.
    assert got == [
        (5, 0.572984),
        (3, 0.397940),
        (2, 0.121830),
        (1, 0.096910),
        (4, 0.096910),
    ]


def test_empty_and_unknown_queries(micro_index):
    assert search(micro_index, [], k=5).count() == 0
    assert search(micro_index, ["zzz"], k=5).count() == 0


def test_topk_limit(micro_index):
    assert search(micro_index, ["court"], k=2).count() == 2


def test_tfidf_variant(micro_index):
    from searchengine_spark.index.bm25 import tfidf_search

    res = tfidf_search(micro_index, ["murder"], k=10).collect()
    # doc 3: tf=2 -> (1+log10(2))*idf; doc 1: tf=1 -> idf
    idf = math.log10(5 / 2)
    assert [(r.doc_id, round(r.total_score, 9)) for r in res] == [
        (3, round((1 + math.log10(2)) * idf, 9)),
        (1, round(idf, 9)),
    ]
    assert tfidf_search(micro_index, [], k=5).count() == 0


def test_okapi_variant_orders_differently_but_ranks(micro_index):
    res = search(micro_index, ["murder"], k=10, idf_variant="okapi").collect()
    # rank_bm25-style idf: ln((N-df+0.5)/(df+0.5)+1); doc 3 still first.
    assert res[0].doc_id == 3
    expected_idf = math.log((5 - 2 + 0.5) / (2 + 0.5) + 1)
    # doc 1: tf=1, dl=3=avgdl -> idf * 2.2/2.2 = idf
    doc1 = [r for r in res if r.doc_id == 1][0]
    assert doc1.total_score == pytest.approx(expected_idf, abs=1e-9)


def test_search_many_matches_single_query_search(spark, sf_dir):
    """Batched serving must return exactly the single-query results
    for every query in the batch."""
    from searchengine_spark.index.bm25 import search, search_many
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.io import load_table

    idx = build_index(load_table(spark, sf_dir, "documents")).cache()
    queries = {
        "a": ["spark", "join", "window", "fast"],
        "b": ["merge", "sort", "table"],
        "empty": [],
    }
    batch = search_many(idx, queries, k=10)
    rows = batch.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.doc_id, round(r.total_score, 9)))
    for qid in ("a", "b"):
        single = [
            (r.doc_id, round(r.total_score, 9))
            for r in search(idx, queries[qid], k=10).collect()
        ]
        got = sorted(by_q[qid], key=lambda t: t[0])
        assert sorted(single, key=lambda t: t[0]) == got, qid
    assert "empty" not in by_q  # no-term query contributes no rows
    # rnk is a contiguous 1..k ranking per query
    ranks = sorted(r.rnk for r in rows if r.query_id == "a")
    assert ranks == list(range(1, len(ranks) + 1))


def test_search_many_empty_batch_schema(spark, sf_dir):
    from searchengine_spark.index.bm25 import search_many
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.io import load_table

    idx = build_index(load_table(spark, sf_dir, "documents"))
    empty = search_many(idx, {}, k=5)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "doc_id", "total_score", "rnk"]


def test_boolean_not_only_query_returns_complement(spark, sf_dir):
    from searchengine_spark.index.bm25 import boolean_search
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.io import load_table

    idx = build_index(load_table(spark, sf_dir, "documents")).cache()
    universe = {r.doc_id for r in idx.doc_lengths.select("doc_id").collect()}
    containing = {
        r.doc_id
        for r in idx.term_frequencies.filter(F.col("word") == "spark")
        .select("doc_id")
        .collect()
    }
    got = {r.doc_id for r in boolean_search(idx, [], ["spark"]).collect()}
    assert got == universe - containing
    assert got  # non-trivial complement on the test corpus


def test_rank_bm25_epsilon_floor_golden(spark):
    """Exact rank_bm25 BM25Okapi fidelity on a fixture where the
    ε-floor is ACTIVE: 'common' appears in 4/5 docs -> raw idf
    ln(1.5/4.5) < 0 -> floored to 0.25 * mean(raw idf). Expected
    scores computed by an independent pure-Python evaluation of the
    published algorithm (rank_bm25.BM25Okapi: k1=1.5, b=0.75,
    epsilon=0.25).

    BASELINE.md's published top-10 (3.5183…3.4497) cannot be replayed
    here: it needs the 91k-doc CAP Illinois corpus, which the
    reference repo does not ship (documented impossibility); this
    golden pins the same formula instead.
    """
    import math

    from pyspark.sql import functions as F

    from searchengine_spark.index.bm25 import search
    from searchengine_spark.index.builder import build_index

    corpus = {
        1: "common alpha beta",
        2: "common alpha gamma gamma",
        3: "common beta delta",
        4: "common delta delta epsilon",
        5: "zeta eta theta",
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id bigint, text string"
    )
    idx = build_index(docs)

    # --- independent reference implementation (published algorithm)
    toks = {d: t.split() for d, t in corpus.items()}
    N = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / N
    df = {}
    for words in toks.values():
        for w in set(words):
            df[w] = df.get(w, 0) + 1
    raw = {w: math.log((N - f + 0.5) / (f + 0.5)) for w, f in df.items()}
    avg_idf = sum(raw.values()) / len(raw)
    eps = 0.25 * avg_idf
    idf = {w: (eps if v < 0 else v) for w, v in raw.items()}
    assert raw["common"] < 0 and idf["common"] == eps  # floor active

    k1, b = 1.5, 0.75
    def score(doc, terms):
        dl = len(toks[doc])
        s = 0.0
        for t in terms:
            f = toks[doc].count(t)
            if f:
                s += idf[t] * (f * (k1 + 1)) / (f + k1 * (1 - b + b * dl / avgdl))
        return s

    terms = ["common", "gamma"]
    expected = {d: score(d, terms) for d in corpus if score(d, terms) > 0}

    got = {
        r.doc_id: r.total_score
        for r in search(idx, terms, k=10, k1=1.5, idf_variant="rank_bm25").collect()
    }
    assert set(got) == set(expected)
    for d, v in expected.items():
        assert abs(got[d] - v) < 1e-9, (d, got[d], v)
