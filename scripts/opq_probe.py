#!/usr/bin/env python
"""Offline OPQ-rotation evaluation — the evidence behind
operators/pqrefine.py's design choice (round-11).

OPQ (Ge et al., "Optimized Product Quantization", CVPR 2013, public)
redistributes ANISOTROPIC variance across PQ subspaces; its parametric
form initializes from an eigenvalue/variance-balancing permutation.
This probe measures, on the actual corpus embeddings with the same
deterministic float Lloyd shape the repo's PQ uses:

  1. per-dimension variance spread (isotropy check)
  2. plain PQ quantization error vs the snake variance-balanced
     permutation (a permutation IS an orthogonal rotation)

Committed result at sf0.01 (500 vecs, 64 dims, M=8, K=16, 3 iters):
variance spread max/min = 1.31x; permuted error = +0.43 % WORSE than
plain — nothing for a rotation to exploit on near-isotropic data,
hence pqrefine.py ships residual refinement instead.

Usage: python scripts/opq_probe.py [embeddings.parquet]
(numpy + duckdb only — no Spark session.)
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

M, K, ITERS = 8, 16, 3


def pq_error(x: np.ndarray, m_count: int = M) -> float:
    sub = x.shape[1] // m_count
    err = 0.0
    for m in range(m_count):
        s = x[:, m * sub : (m + 1) * sub]
        c = s[:K].copy()  # deterministic first-K init, like pq_train
        for _ in range(ITERS):
            a = ((s[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(1)
            for k in range(K):
                if (a == k).any():
                    c[k] = s[a == k].mean(0)
        err += ((s[:, None, :] - c[None, :, :]) ** 2).sum(-1).min(1).sum()
    return float(err)


def main() -> None:
    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.01/embeddings.parquet"
    )
    x = np.array(
        duckdb.sql(
            f"SELECT embedding FROM read_parquet('{path}') ORDER BY vec_id"
        )
        .fetchnumpy()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    d = x.shape[1]
    var = x.var(0)
    print(
        f"n={len(x)} dims={d}  variance spread max/min = "
        f"{var.max() / var.min():.3f}"
    )
    # snake variance-balancing permutation: rank dims by variance desc,
    # deal them to subspaces boustrophedon so every subspace gets an
    # equal share of high- and low-variance dims.
    order = np.argsort(-var)
    assign = np.empty(d, dtype=int)
    for r, dim in enumerate(order):
        cyc, pos = divmod(r, M)
        assign[dim] = pos if cyc % 2 == 0 else M - 1 - pos
    cols = [dim for s in range(M) for dim in range(d) if assign[dim] == s]
    base = pq_error(x)
    rot = pq_error(x[:, cols])
    print(
        f"plain PQ sq-err = {base:.4f}; snake-permuted = {rot:.4f}; "
        f"delta = {(rot - base) / base * 100:+.2f} %"
    )


if __name__ == "__main__":
    main()
