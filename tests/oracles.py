"""Independent dense-numpy oracles for the iterative algorithms,
implementing the reference semantics (page_rank.c / hits.c) directly —
float64 power iteration over the full vector, no Spark, no graph
library. These deliberately share no code with aduana_spark.graph."""

from __future__ import annotations

import numpy as np


def pagerank_numpy(
    edges: list[tuple[int, int]],
    n: int,
    damping: float = 0.85,
    scores: dict[int, float] | None = None,
    precision: float = 1e-9,
    max_iters: int = 1000,
) -> np.ndarray:
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    deg = np.zeros(n)
    np.add.at(deg, src, 1.0)
    s = np.zeros(n)
    if scores:
        for i, v in scores.items():
            s[i] = v
    total = s.sum() or 1.0
    v1 = np.full(n, 1.0 / n)
    v1 /= v1.sum()
    for _ in range(max_iters):
        v2 = np.zeros(n)
        np.add.at(v2, dst, damping * v1[src] / deg[src])
        rem = 1.0 - v2.sum()
        if scores:
            v2 += rem * s / total
        else:
            v2 += rem / n
        delta = np.abs(v2 - v1).max()
        v1 = v2
        if delta <= precision:
            break
    return v1


def hits_numpy(
    edges: list[tuple[int, int]],
    n: int,
    precision: float = 1e-12,
    max_iters: int = 2000,
    scores: dict[int, float] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    w = np.ones(n)
    if scores:
        w = np.zeros(n)
        for i, v in scores.items():
            w[i] = v
    h1 = np.full(n, 1.0 / n)
    a1 = np.full(n, 1.0 / n)
    for _ in range(max_iters):
        h2 = np.zeros(n)
        a2 = np.zeros(n)
        np.add.at(h2, src, w[dst] * a1[dst])
        np.add.at(a2, dst, h1[src])
        h2 /= h2.sum()
        a2 /= a2.sum()
        delta = max(np.abs(h2 - h1).max(), np.abs(a2 - a1).max())
        h1, a1 = h2, a2
        if delta <= precision:
            break
    return h1, a1
