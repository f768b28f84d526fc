"""Fixed-point PageRank: structural properties on known graphs and
bit-determinism under repartitioning."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.graph import (
    PR_SCALE,
    pagerank_fixed_point,
    symmetrize,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_star_center_ranks_highest(spark):
    # star: 0 connected to 1..5; center must out-rank every leaf
    pairs = _pairs(spark, [(0, i) for i in range(1, 6)])
    r = {row["node"]: row["rank_fp"] for row in pagerank_fixed_point(symmetrize(pairs)).collect()}
    assert all(r[0] > r[i] for i in range(1, 6))
    leaf_ranks = {r[i] for i in range(1, 6)}
    assert len(leaf_ranks) == 1  # symmetry: identical leaves tie exactly


def test_ring_is_uniform_and_mass_conserved(spark):
    ring = _pairs(spark, [(i, (i + 1) % 8) for i in range(8)])
    rows = pagerank_fixed_point(symmetrize(ring)).collect()
    ranks = {r["rank_fp"] for r in rows}
    assert len(ranks) == 1  # perfect symmetry -> identical fixed-point ranks
    total = sum(r["rank_fp"] for r in rows)
    # integer truncation loses a little mass but stays near SCALE
    assert 0.99 * PR_SCALE < total <= PR_SCALE


def test_deterministic_under_repartition(spark):
    import random

    rng = random.Random(7)
    edges = list({(rng.randrange(50), rng.randrange(50)) for _ in range(120)})
    edges = [(a, b) for a, b in edges if a != b]
    p = _pairs(spark, edges)
    a = sorted(map(tuple, pagerank_fixed_point(symmetrize(p)).collect()))
    b = sorted(
        map(tuple, pagerank_fixed_point(symmetrize(p.repartition(13))).collect())
    )
    assert a == b  # integer arithmetic: bit-equal on any layout


def test_triangle_counts_on_known_graph(spark):
    from searchengine_spark.operators.graph import triangle_counts

    # 4-clique on 0-3 (4 triangles; each node in C(3,2)=3) plus a
    # triangle-free path 10-11-12.
    import itertools

    edges = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    edges += [(10, 11), (11, 12)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    assert sum(got.values()) == 4 * 3  # 4 triangles x 3 members


def test_eigenvector_centrality_prefers_dense_clique(spark):
    """A 4-clique's members must outrank the members of a 4-chain of
    the same size — the signal EC adds over degree/PageRank."""
    from searchengine_spark.operators.graph import (
        eigenvector_centrality,
        symmetrize,
    )

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(10, 11), (11, 12), (12, 13)]
    pairs = spark.createDataFrame(
        clique + chain, ["doc_a", "doc_b"]
    )
    got = {
        r["node"]: r["ec_fp"]
        for r in eigenvector_centrality(symmetrize(pairs)).collect()
    }
    assert min(got[n] for n in range(4)) > max(got[n] for n in (10, 11, 12, 13))


def test_eigenvector_centrality_matches_oracle(spark, sf_dir):
    from searchengine_spark.operators import graph as G
    from tests.helpers import assert_matches_oracle

    assert_matches_oracle(
        G.q_eigenvector_centrality(spark, sf_dir),
        G.ORACLES["dedup_eigenvector_centrality"],
        sf_dir,
        name="dedup_eigenvector_centrality",
    )


def test_bfs_hops_on_path_graph(spark):
    # path 0-1-2-3-4-5, seed {0}: hops = index, capped at BFS_HOPS
    from searchengine_spark.operators.graph import BFS_HOPS, bfs_hops

    assert BFS_HOPS == 3
    pairs = _pairs(spark, [(i, i + 1) for i in range(5)])
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r["node"]: r["hops"] for r in bfs_hops(symmetrize(pairs), seeds).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}  # 4,5 beyond the horizon


def test_bfs_multi_source_takes_min(spark):
    # path 0-1-2-3-4, seeds {0, 4}: node 2 is 2 hops from both ends
    from searchengine_spark.operators.graph import bfs_hops

    pairs = _pairs(spark, [(i, i + 1) for i in range(4)])
    seeds = spark.createDataFrame([(0,), (4,)], "node long")
    out = {r["node"]: r["hops"] for r in bfs_hops(symmetrize(pairs), seeds).collect()}
    assert out == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_bfs_seed_stays_zero_on_cycle(spark):
    # triangle with seed {0}: relaxation must never raise a settled node
    from searchengine_spark.operators.graph import bfs_hops

    pairs = _pairs(spark, [(0, 1), (1, 2), (0, 2)])
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r["node"]: r["hops"] for r in bfs_hops(symmetrize(pairs), seeds).collect()}
    assert out == {0: 0, 1: 1, 2: 1}


def test_personalized_pagerank_matches_integer_reference(spark):
    # exact Python replica of the scaled-integer recursion on a path
    # 0-1-2-3-4 seeded at node 0 (3 iterations — NOT converged, so
    # this pins the arithmetic, not an asymptotic property)
    from searchengine_spark.operators.graph import (
        DAMP_DEN,
        DAMP_NUM,
        PR_ITERS,
        personalized_pagerank,
    )

    path = _pairs(spark, [(i, i + 1) for i in range(4)])
    seeds = spark.createDataFrame([(0,)], "node long")
    r = {
        row["node"]: row["rank_fp"]
        for row in personalized_pagerank(symmetrize(path), seeds).collect()
    }

    adj = {0: [1], 1: [0, 2], 2: [1, 3], 3: [2, 4], 4: [3]}
    base = {v: ((DAMP_DEN - DAMP_NUM) * PR_SCALE) // DAMP_DEN if v == 0 else 0 for v in adj}
    ref = {v: PR_SCALE if v == 0 else 0 for v in adj}
    for _ in range(PR_ITERS):
        nxt = {}
        for v in adj:
            s = sum(ref[u] // len(adj[u]) for u in adj if v in adj[u])
            nxt[v] = base[v] + (DAMP_NUM * s) // DAMP_DEN
        ref = nxt
    assert r == ref
    assert r[0] > 0 and r[4] >= 0


def test_personalized_pagerank_seedless_node_gets_no_teleport(spark):
    from searchengine_spark.operators.graph import personalized_pagerank

    # two disconnected edges; the seed sits on one component — the
    # other component must end at exactly zero (no teleport, no path)
    pairs = _pairs(spark, [(0, 1), (2, 3)])
    seeds = spark.createDataFrame([(0,)], "node long")
    r = {
        row["node"]: row["rank_fp"]
        for row in personalized_pagerank(symmetrize(pairs), seeds).collect()
    }
    assert r[0] > 0 and r[1] > 0
    assert r[2] == 0 and r[3] == 0


def test_personalized_pagerank_multi_seed_additivity_of_support(spark):
    from searchengine_spark.operators.graph import personalized_pagerank

    # star 0-{1..5}; seeds on two leaves: the hub bridges them, and
    # non-seed leaves still receive mass only through the hub
    pairs = _pairs(spark, [(0, i) for i in range(1, 6)])
    seeds = spark.createDataFrame([(1,), (2,)], "node long")
    r = {
        row["node"]: row["rank_fp"]
        for row in personalized_pagerank(symmetrize(pairs), seeds).collect()
    }
    assert r[1] == r[2], "symmetric seeds tie exactly"
    assert r[0] > r[3] > 0, "hub beats non-seed leaves; mass still spreads"
    assert r[3] == r[4] == r[5]
