"""Literal reference validation fixtures, regenerated in code (FIXTURES.md F3).

- clique_ring: five 4-cliques (vertices 0-3, 4-7, 8-11, 12-15, 16-19) joined
  in a ring by single bridge edges 3-4, 7-8, 11-12, 15-16, 19-0
  (validation/clique_ring.txt:1-44). Correct CPM/modularity communities are
  the five cliques.
- clique_ring_weighted: same topology, bridge weight 0.5.
- weighted_triangle: 0-1 (0.3), 1-2 (0.4), 2-0 (0.1)
  (validation/weighted_edges.txt:1-3); m = 0.8, one triangle.
"""

from __future__ import annotations

import numpy as np


def clique_ring_edges(n_cliques: int = 5, clique_size: int = 4,
                      bridge_weight: float = 1.0):
    """(src, dst, weight) int64/int64/float64 arrays, one row per undirected edge."""
    src, dst, w = [], [], []
    for c in range(n_cliques):
        base = c * clique_size
        for i in range(clique_size):
            for j in range(i + 1, clique_size):
                src.append(base + i)
                dst.append(base + j)
                w.append(1.0)
    n = n_cliques * clique_size
    for c in range(n_cliques):
        u = c * clique_size + (clique_size - 1)
        v = ((c + 1) * clique_size) % n
        src.append(u)
        dst.append(v)
        w.append(bridge_weight)
    return (np.asarray(src, np.int64), np.asarray(dst, np.int64),
            np.asarray(w, np.float64))


def clique_ring_weighted_edges():
    return clique_ring_edges(bridge_weight=0.5)


def weighted_triangle_edges():
    return (np.asarray([0, 1, 2], np.int64),
            np.asarray([1, 2, 0], np.int64),
            np.asarray([0.3, 0.4, 0.1], np.float64))


def edges_to_table(src, dst, w):
    import pyarrow as pa

    return pa.table({"src": pa.array(src, pa.int64()),
                     "dst": pa.array(dst, pa.int64()),
                     "weight": pa.array(w, pa.float64())})
