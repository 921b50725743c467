"""k-core decomposition: engine (h-index BSP fixpoint) vs brute-force
Batagelj-Zaversnik peeling, across partition counts, plus a random-graph
sweep and the self-loop / isolated-vertex conventions."""
import numpy as np
import pytest

from leiden_cuda_ray.graph.build import build_graph_from_arrays
from leiden_cuda_ray.sources.fixtures import clique_ring_edges


def _gather(refs):
    import ray
    return np.concatenate(ray.get(refs))


def kcore_oracle(src, dst, V):
    """Sequential min-degree peel (the textbook algorithm the h-index
    fixpoint must agree with). Undirected simple graph; self-loops and
    duplicate pairs removed here, matching the engine's CSR + keep mask."""
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    keep = a != b
    pairs = {(int(x), int(y)) for x, y in zip(a[keep], b[keep])}
    adj = [set() for _ in range(V)]
    for x, y in pairs:
        adj[x].add(y)
        adj[y].add(x)
    deg = {v: len(adj[v]) for v in range(V)}
    core = np.zeros(V, np.int64)
    k = 0
    while deg:
        v = min(deg, key=lambda x: deg[x])  # O(V^2) textbook peel
        k = max(k, deg[v])
        core[v] = k
        del deg[v]
        for u in adj[v]:
            if u in deg:
                deg[u] -= 1
    return core


@pytest.mark.parametrize("P", [1, 3])
def test_kcore_clique_ring(P):
    from leiden_cuda_ray.algorithms.kcore import kcore

    src, dst, w = clique_ring_edges()  # 5 cliques of 4, ring-bridged
    g = build_graph_from_arrays(src, dst, w, P=P)
    refs, steps, changed = kcore(g)
    assert changed == 0
    got = _gather(refs)
    assert np.array_equal(got, kcore_oracle(src, dst, 20))
    # every clique-of-4 member sits in the 3-core
    assert got.min() == 3 and got.max() == 3


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kcore_random_graph_matches_peeling(seed):
    from leiden_cuda_ray.algorithms.kcore import kcore

    rng = np.random.default_rng(seed)
    V, E = 60, 300
    src = rng.integers(0, V, E).astype(np.int64)
    dst = rng.integers(0, V, E).astype(np.int64)  # dupes+self-loops likely
    w = np.ones(E)
    g = build_graph_from_arrays(src, dst, w, V=V, P=4)
    refs, _, changed = kcore(g)
    assert changed == 0
    assert np.array_equal(_gather(refs), kcore_oracle(src, dst, V))


def test_kcore_isolated_and_selfloop():
    from leiden_cuda_ray.algorithms.kcore import kcore

    # triangle 0-1-2, self-loop at 3, isolated 4: self-loops contribute
    # nothing to coreness, isolated vertices are 0-core
    src = np.array([0, 1, 0, 3], np.int64)
    dst = np.array([1, 2, 2, 3], np.int64)
    w = np.ones(4)
    g = build_graph_from_arrays(src, dst, w, V=5, P=2)
    refs, _, changed = kcore(g)
    assert changed == 0
    assert np.array_equal(_gather(refs), np.array([2, 2, 2, 0, 0]))


def test_kcore_deterministic_across_P():
    from leiden_cuda_ray.algorithms.kcore import kcore

    src, dst, w = clique_ring_edges()
    outs = []
    for P in (1, 2, 4):
        g = build_graph_from_arrays(src, dst, w, P=P)
        refs, _, _ = kcore(g)
        outs.append(_gather(refs))
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[1], outs[2])
