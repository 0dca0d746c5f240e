"""Pure-numpy oracles for graph algorithms (scipy absent in this container)."""

from __future__ import annotations

import numpy as np


def pagerank_oracle(edges, n, damping=0.85, iters=500, tol=1e-13):
    """Dense power iteration, dangling mass spread uniformly (standard
    PageRank semantics — same as networkx/scipy implementation)."""
    out_deg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    for _ in range(iters):
        contrib = np.zeros(n)
        share = r[src] / out_deg[src]
        np.add.at(contrib, dst, share)
        dangling = r[out_deg == 0].sum()
        new_r = (1.0 - damping) / n + damping * (contrib + dangling / n)
        if np.abs(new_r - r).max() < tol:
            r = new_r
            break
        r = new_r
    return r


def lpa_oracle(und_edges, n, iters=5):
    """Synchronous LPA, max-count min-label tie-break, matching
    landscape_spark.graph.lpa semantics exactly."""
    adj = [[] for _ in range(n)]
    for a, b in und_edges:
        adj[a].append(b)
        adj[b].append(a)
    labels = list(range(n))
    for _ in range(iters):
        new = labels[:]
        for v in range(n):
            if not adj[v]:
                continue
            counts: dict[int, int] = {}
            for w in adj[v]:
                counts[labels[w]] = counts.get(labels[w], 0) + 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def triangle_oracle(und_edges):
    """Exact triangle count via sorted adjacency intersection."""
    from collections import defaultdict

    nbrs = defaultdict(set)
    for a, b in und_edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    count = 0
    for a, b in und_edges:
        if a < b:
            count += sum(1 for c in nbrs[a] & nbrs[b] if c > b)
    return count
