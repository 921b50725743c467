"""Graph algorithms vs independent oracles (SURVEY.md §5 test plan)."""

import numpy as np
import pytest
import ray

from leiden_cuda_ray.config import LabelPropConfig, LeidenConfig, LouvainConfig, PageRankConfig
from leiden_cuda_ray.graph.build import build_graph_from_arrays
from leiden_cuda_ray.sources.fixtures import (
    clique_ring_edges,
    clique_ring_weighted_edges,
    weighted_triangle_edges,
)


def _sym(src, dst, w):
    off = src != dst
    return (np.concatenate([src, dst[off]]), np.concatenate([dst, src[off]]),
            np.concatenate([w, w[off]]))


def _dense_adj(src, dst, w, V):
    A = np.zeros((V, V))
    s, d, ww = _sym(src, dst, w)
    A[s, d] = ww
    return A


def pagerank_oracle(src, dst, w, V, alpha=0.85, eps=1e-6, iters=500):
    A = _dense_adj(src, dst, w, V)
    deg = A.sum(axis=1)
    r = np.full(V, 1.0 / V)
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        contrib = np.zeros(V)
        nz = deg > 0
        contrib = (A[nz] / deg[nz, None] * r[nz, None]).sum(axis=0)
        new_r = (1 - alpha) / V + alpha * (contrib + dangling / V)
        if np.abs(new_r - r).sum() < eps:
            r = new_r
            break
        r = new_r
    return r


def cc_oracle(src, dst, V):
    parent = np.arange(V)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        parent[find(a)] = find(b)
    roots = np.array([find(v) for v in range(V)])
    # min-id labeling
    lab = {}
    for v in range(V):
        lab.setdefault(roots[v], v)
    return np.array([lab[roots[v]] for v in range(V)])


def lp_oracle(src, dst, w, V, max_iter=100):
    A = _dense_adj(src, dst, w, V)
    np.fill_diagonal(A, 0.0)
    label = np.arange(V)
    for _ in range(max_iter):
        new = label.copy()
        for v in range(V):
            wsum = {}
            for u in np.flatnonzero(A[v]):
                wsum[label[u]] = wsum.get(label[u], 0.0) + A[v, u]
            if wsum:
                best = max(wsum.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
        if np.array_equal(new, label):
            return new
        label = new
    return label


def triangles_oracle(src, dst, V):
    A = _dense_adj(src, dst, np.ones(len(src)), V) > 0
    np.fill_diagonal(A, False)
    counts = np.zeros(V, np.int64)
    for a in range(V):
        for b in range(a + 1, V):
            if not A[a, b]:
                continue
            for c in range(b + 1, V):
                if A[a, c] and A[b, c]:
                    counts[a] += 1
                    counts[b] += 1
                    counts[c] += 1
    return counts


def _gather_state(refs):
    return np.concatenate(ray.get(refs))


@pytest.mark.parametrize("P", [1, 3])
def test_pagerank_clique_ring(P):
    from leiden_cuda_ray.algorithms.pagerank import pagerank

    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=P)
    ranks, iters, err = pagerank(g)
    r = _gather_state(ranks)
    oracle = pagerank_oracle(src, dst, w, 20)
    assert np.allclose(r, oracle, atol=1e-6)
    assert abs(r.sum() - 1.0) < 1e-9


def test_pagerank_with_isolated_vertex():
    from leiden_cuda_ray.algorithms.pagerank import pagerank

    src = np.array([0, 1], np.int64)
    dst = np.array([1, 2], np.int64)
    w = np.ones(2)
    g = build_graph_from_arrays(src, dst, w, V=5, P=2)  # vertices 3,4 isolated
    ranks, _, _ = pagerank(g)
    r = _gather_state(ranks)
    oracle = pagerank_oracle(src, dst, w, 5)
    assert np.allclose(r, oracle, atol=1e-6)


@pytest.mark.parametrize("P", [1, 3])
def test_connected_components(P):
    from leiden_cuda_ray.algorithms.components import connected_components

    # two components: ring bridge removed variant
    src, dst, w = clique_ring_edges()
    keep = ~((src % 4 == 3) & (dst % 4 == 0))  # drop bridges
    src2, dst2 = src[keep], dst[keep]
    g = build_graph_from_arrays(src2, dst2, w[keep], V=20, P=P)
    labels, steps = connected_components(g)
    lab = _gather_state(labels)
    oracle = cc_oracle(src2, dst2, 20)
    assert np.array_equal(lab, oracle)
    assert len(np.unique(lab)) == 5  # five disconnected cliques


def test_connected_single_component():
    from leiden_cuda_ray.algorithms.components import connected_components

    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=2)
    labels, _ = connected_components(g)
    lab = _gather_state(labels)
    assert np.all(lab == 0)


@pytest.mark.parametrize("P", [1, 3])
def test_label_propagation_matches_oracle(P):
    from leiden_cuda_ray.algorithms.labelprop import label_propagation

    src, dst, w = clique_ring_weighted_edges()
    g = build_graph_from_arrays(src, dst, w, P=P)
    labels, steps, _ = label_propagation(g)
    lab = _gather_state(labels)
    oracle = lp_oracle(src, dst, w, 20)
    assert np.array_equal(lab, oracle)


def test_label_propagation_deterministic_across_P():
    from leiden_cuda_ray.algorithms.labelprop import label_propagation

    src, dst, w = clique_ring_edges()
    labs = []
    for P in (1, 2, 4):
        g = build_graph_from_arrays(src, dst, w, P=P)
        refs, _, _ = label_propagation(g)
        labs.append(_gather_state(refs))
    assert np.array_equal(labs[0], labs[1])
    assert np.array_equal(labs[1], labs[2])


@pytest.mark.parametrize("P", [1, 3])
def test_triangles_clique_ring(P):
    from leiden_cuda_ray.algorithms.triangles import triangle_counts

    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=P)
    counts, total = triangle_counts(g)
    c = _gather_state(counts)
    oracle = triangles_oracle(src, dst, 20)
    assert np.array_equal(c, oracle)
    assert total == 20  # 5 cliques x C(4,3)=4 triangles


def test_triangles_weighted_triangle():
    from leiden_cuda_ray.algorithms.triangles import triangle_counts

    src, dst, w = weighted_triangle_edges()
    g = build_graph_from_arrays(src, dst, w, P=1)
    counts, total = triangle_counts(g)
    assert total == 1
    assert np.array_equal(_gather_state(counts), [1, 1, 1])


@pytest.mark.parametrize("P,lock", [(1, False), (3, False), (2, True)])
def test_leiden_clique_ring(P, lock):
    """The reference validation answer: five 4-cliques (FIXTURES.md F3) —
    in both the lock-free default and the CUDA-style community-lock mode."""
    from leiden_cuda_ray.algorithms.leiden import leiden

    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=P)
    refs, info = leiden(g, LeidenConfig(gamma=0.1, lock_communities=lock))
    comm = _gather_state(refs)
    # communities == the 5 cliques
    groups = {}
    for v, c in enumerate(comm):
        groups.setdefault(c, set()).add(v)
    expected = [{0, 1, 2, 3}, {4, 5, 6, 7}, {8, 9, 10, 11},
                {12, 13, 14, 15}, {16, 17, 18, 19}]
    assert sorted(groups.values(), key=min) == expected


def test_leiden_deterministic_across_P():
    from leiden_cuda_ray.algorithms.leiden import leiden

    src, dst, w = clique_ring_weighted_edges()
    results = []
    for P in (1, 2):
        g = build_graph_from_arrays(src, dst, w, P=P)
        refs, _ = leiden(g, LeidenConfig(gamma=0.05))
        results.append(_gather_state(refs))
    assert np.array_equal(results[0], results[1])


def test_leiden_cpm_positive_on_cliques():
    from leiden_cuda_ray.algorithms.leiden import leiden
    from leiden_cuda_ray.algorithms.objectives import score

    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=2)
    refs, info = leiden(g, LeidenConfig(gamma=0.1))
    s = score(g, refs, gamma=0.1)
    # 5 cliques: W_in = 5*6 = 30; penalty = 5 * 0.1 * 4*3/2 = 3
    assert s["num_communities"] == 5
    assert s["cpm"] == pytest.approx(30 - 3.0)
    # singleton partition CPM = 0; clique partition must beat it
    assert s["cpm"] > 0


@pytest.mark.parametrize("P", [1, 3])
def test_louvain_two_cliques(P):
    """Two 4-cliques + bridge (the custom_louvain.py:376-391 fixture shape):
    modularity keeps the cliques separate (merge ΔQ = −0.068 < 0)."""
    from leiden_cuda_ray.algorithms.louvain import louvain

    src, dst, w = clique_ring_edges(n_cliques=2, clique_size=4)
    # drop the second bridge so there is exactly one bridge (7-0 removed)
    keep = ~((src == 7) & (dst == 0))
    g = build_graph_from_arrays(src[keep], dst[keep], w[keep], V=8, P=P)
    refs, info = louvain(g, LouvainConfig())
    comm = _gather_state(refs)
    groups = {}
    for v, c in enumerate(comm):
        groups.setdefault(c, set()).add(v)
    assert sorted(groups.values(), key=min) == [{0, 1, 2, 3}, {4, 5, 6, 7}]


@pytest.mark.parametrize("P", [1, 3])
def test_louvain_clique_ring_level0(P):
    """Level-0 moving recovers the 5 cliques; coarse levels may merge
    adjacent cliques (the reference's per-level m + once-counted coarse
    self-loop convention makes that ΔQ=+0.00245 > 0 — resolution limit),
    so the final partition must be a union of whole cliques."""
    from leiden_cuda_ray.algorithms.louvain import louvain

    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=P)
    refs, info = louvain(g, LouvainConfig())
    comm = _gather_state(refs)
    assert info["levels"][0]["communities"] == 5
    # each clique stays intact inside one final community
    for c in range(5):
        clique = comm[c * 4:(c + 1) * 4]
        assert len(set(clique)) == 1


def test_louvain_deterministic_across_P():
    from leiden_cuda_ray.algorithms.louvain import louvain

    src, dst, w = clique_ring_edges()
    results = []
    for P in (1, 2):
        g = build_graph_from_arrays(src, dst, w, P=P)
        refs, _ = louvain(g, LouvainConfig())
        results.append(_gather_state(refs))
    assert np.array_equal(results[0], results[1])


def test_triu_range_matches_numpy():
    from leiden_cuda_ray.algorithms.triangles import _triu_range

    for k in (2, 3, 7, 64, 1001):
        iu, ju = np.triu_indices(k, 1)
        n = len(iu)
        for p0, p1 in ((0, n), (1, n - 1), (n // 3, 2 * n // 3), (5, 5)):
            a, b = _triu_range(k, p0, p1)
            assert np.array_equal(a, iu[p0:p1])
            assert np.array_equal(b, ju[p0:p1])


@pytest.mark.parametrize("P", [1, 3])
def test_triangles_hub_row_split(P, monkeypatch):
    """A single hub row whose C(outdeg, 2) exceeds the chunk budget must
    be split internally by triu-index ranges (wedge-space chunking), not
    silently blow the per-chunk heap bound."""
    import leiden_cuda_ray.algorithms.triangles as T

    monkeypatch.setattr(T, "_CHUNK_WEDGES", 7)
    # hub 0 connected to 1..12, plus triangle-closing chords among leaves
    rng = np.random.RandomState(7)
    hub_dst = np.arange(1, 13, dtype=np.int64)
    hub_src = np.zeros(12, np.int64)
    chords = np.array([[1, 2], [2, 3], [4, 7], [8, 9], [10, 11], [3, 5]],
                      np.int64)
    src = np.concatenate([hub_src, chords[:, 0]])
    dst = np.concatenate([hub_dst, chords[:, 1]])
    w = np.ones(len(src))
    g = build_graph_from_arrays(src, dst, w, P=P)
    counts, total = T.triangle_counts(g)
    c = _gather_state(counts)
    oracle = triangles_oracle(src, dst, 13)
    assert np.array_equal(c, oracle)
    assert total == oracle.sum() // 3


@pytest.mark.parametrize("P", [1, 3])
def test_hits_matches_dense_reference(P):
    """HITS over a random directed graph must equal the dense-numpy
    unnormalized iteration + final L2 normalize, bit-for-bit (both run
    float64 sums over in/out-neighbor sets)."""
    import pyarrow as pa
    import ray.data

    from leiden_cuda_ray.algorithms.hits import hits

    rng = np.random.RandomState(11)
    V, E = 61, 340
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    src, dst = pairs[:, 0].copy(), pairs[:, 1].copy()
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src),
                                       "dst": pa.array(dst)}))
    out = (hits(ds, V, iters=8, P=P, ndigits=None)
           .to_pandas().sort_values("vertex"))

    A = np.zeros((V, V))
    A[src, dst] = 1.0
    h = np.ones(V)
    a = np.zeros(V)
    for _ in range(8):
        a = A.T @ h
        h = A @ a
    h /= np.linalg.norm(h)
    a /= np.linalg.norm(a)
    assert np.abs(out["hub"].to_numpy() - h).max() < 1e-12
    assert np.abs(out["authority"].to_numpy() - a).max() < 1e-12


@pytest.mark.parametrize("P", [1, 4])
def test_bfs_hops_matches_level_oracle(P):
    """Multi-source BFS distances must equal a sequential level-order
    BFS from the same seed set; unreachable = -1."""
    from leiden_cuda_ray.algorithms.bfs import bfs_hops

    rng = np.random.RandomState(3)
    V, E = 80, 140  # sparse: leaves some vertices unreachable
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    w = np.ones(E)
    g = build_graph_from_arrays(src, dst, w, P=P)
    dists, _steps, max_dist = bfs_hops(g, seed_mod=37)
    got = np.concatenate([np.asarray(d) for d in ray.get(dists)])

    adj = [set() for _ in range(V)]
    for a, b in zip(src, dst):
        adj[a].add(int(b))
        adj[b].add(int(a))
    want = np.full(V, -1, np.int64)
    frontier = [v for v in range(V) if v % 37 == 0]
    want[frontier] = 0
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for t in adj[u]:
                if want[t] == -1:
                    want[t] = d
                    nxt.append(t)
        frontier = nxt
    assert np.array_equal(got, want)
    assert max_dist == int(got.max())


@pytest.mark.parametrize("P", [1, 4])
def test_triangle_support_matches_brute_force(P):
    """Per-edge triangle support must equal |N(u) ∩ N(v)| for every
    canonical edge of a simple random graph, at any partitioning."""
    import pandas as pd

    from leiden_cuda_ray.algorithms.trisupport import triangle_support

    rng = np.random.RandomState(9)
    V, E = 60, 400
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    m = src != dst
    pairs = np.unique(np.stack([np.minimum(src, dst)[m],
                                np.maximum(src, dst)[m]], 1), axis=0)
    src, dst = pairs[:, 0].copy(), pairs[:, 1].copy()
    g = build_graph_from_arrays(src, dst, np.ones(len(src)), P=P)
    df = (triangle_support(g).to_pandas()
          .sort_values(["src", "dst"]).reset_index(drop=True))

    adj = [set() for _ in range(V)]
    for a, b in zip(src, dst):
        adj[a].add(int(b))
        adj[b].add(int(a))
    rows = [(u, v, len(adj[u] & adj[v]))
            for u in range(V) for v in sorted(adj[u]) if v > u]
    want = pd.DataFrame(rows, columns=["src", "dst", "support"])
    assert len(df) == len(want)
    assert (df.values == want.values).all()


@pytest.mark.parametrize("P", [1, 3])
def test_ktruss_matches_sequential_peel(P):
    """k-truss peeling must converge to the same edge set + supports as
    a sequential peel, at any partitioning."""
    from leiden_cuda_ray.algorithms.trisupport import ktruss

    rng = np.random.RandomState(4)
    V, E = 50, 300
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    m = src != dst
    pairs = np.unique(np.stack([np.minimum(src, dst)[m],
                                np.maximum(src, dst)[m]], 1), axis=0)
    src, dst = pairs[:, 0].copy(), pairs[:, 1].copy()

    edges = set(zip(src.tolist(), dst.tolist()))
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
        drop = {e for e, s in sup.items() if s < 2}
        if not drop:
            break
        edges -= drop

    g = build_graph_from_arrays(src, dst, np.ones(len(src)), P=P)
    ds, rounds = ktruss(g, k=4)
    df = ds.to_pandas()
    got = {(r.src, r.dst): r.support for r in df.itertuples()}
    assert got == sup
    assert rounds <= 12


@pytest.mark.parametrize("P", [1, 3])
def test_personalized_pagerank_matches_dense(P):
    """PPR must equal the dense seeded iteration: teleport + dangling
    mass restricted to seeds, fixed iterations."""
    from leiden_cuda_ray.algorithms.pagerank import personalized_pagerank

    src, dst, w = clique_ring_edges()
    # varied INTEGER weights (the engine graph's weights are counts)
    w = (np.arange(len(src)) % 5 + 1).astype(np.float64)
    V = 20
    g = build_graph_from_arrays(src, dst, w, P=P)
    ranks = personalized_pagerank(g, seed_mod=7, alpha=0.85, iters=15)
    got = _gather_state(ranks)

    A = _dense_adj(src, dst, w, V)
    deg = A.sum(axis=1)
    seeds = (np.arange(V) % 7) == 0
    nS = seeds.sum()
    r = np.where(seeds, 1.0 / nS, 0.0)
    for _ in range(15):
        dangling = r[deg == 0].sum()
        nz = deg > 0
        contrib = (A[nz] / deg[nz, None] * r[nz, None]).sum(axis=0)
        r = 0.85 * contrib + seeds * ((1 - 0.85) / nS
                                      + 0.85 * dangling / nS)
    assert np.abs(got - r).max() < 1e-12


@pytest.mark.parametrize("P", [1, 3])
def test_assortativity_sums_match_brute(P):
    """The four assortativity sums must equal a direct computation over
    the canonical non-self edge set with distinct-neighbor degrees."""
    from leiden_cuda_ray.algorithms.stats import assortativity_sums

    rng = np.random.RandomState(13)
    V, E = 40, 200
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    m = src != dst
    pairs = np.unique(np.stack([np.minimum(src, dst)[m],
                                np.maximum(src, dst)[m]], 1), axis=0)
    a, b = pairs[:, 0], pairs[:, 1]
    g = build_graph_from_arrays(a.copy(), b.copy(), np.ones(len(a)), P=P)
    got = assortativity_sums(g).to_pandas().iloc[0]

    deg = np.zeros(V, np.int64)
    np.add.at(deg, a, 1)
    np.add.at(deg, b, 1)
    j, k = deg[a], deg[b]
    assert got["m"] == len(a)
    assert got["s_jk"] == (j * k).sum()
    assert got["s_sum"] == (j + k).sum()
    assert got["s_sq"] == (j * j + k * k).sum()


def test_leiden_conductance_invariants():
    """vol/cut integers must satisfy the basic identities: cut(c) ≤
    vol(c) (cut edges are incident to the community) and every listed
    community is non-empty."""
    from leiden_cuda_ray.pipelines.corpus_queries import (
        graph_leiden_conductance,
    )

    df = graph_leiden_conductance("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    assert (df.n_vertices > 0).all()
    assert (df.cut <= df.vol).all()
    assert (df.vol.values >= 0).all() and (df.cut.values >= 0).all()
    # ordered by vol desc then community asc
    v = df.vol.to_numpy()
    assert (v[:-1] >= v[1:]).all()


def test_repo_pagerank_mass_and_determinism():
    """Repo-level PageRank: one row per repo, probability mass 1,
    deterministic across runs (fixed iterations, no RNG)."""
    from leiden_cuda_ray.pipelines.corpus_queries import repo_pagerank

    t1 = repo_pagerank("/root/testdata/sf0.001").to_pandas()
    t2 = repo_pagerank("/root/testdata/sf0.001").to_pandas()
    assert t1.equals(t2)
    assert len(t1) == t1.repo.nunique()
    assert abs(t1.pagerank.sum() - 1.0) < 1e-3  # rounding to 6 decimals


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 10_000),
       V=st.integers(8, 60),
       density=st.floats(0.02, 0.35),
       P=st.sampled_from([1, 2, 4]))
def test_triangle_support_property_sweep(seed, V, density, P):
    """Property sweep over random simple graphs: support(u,v) must
    equal |N(u) ∩ N(v)| for every canonical edge, at any partitioning
    (exercises the wedge-slot leg accumulation across chunk and hub
    shapes the fixed-seed tests don't reach)."""
    import pandas as pd

    from leiden_cuda_ray.algorithms.trisupport import triangle_support

    rng = np.random.RandomState(seed)
    E = max(1, int(V * (V - 1) / 2 * density))
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    m = src != dst
    if not m.any():
        return
    pairs = np.unique(np.stack([np.minimum(src, dst)[m],
                                np.maximum(src, dst)[m]], 1), axis=0)
    a, b = pairs[:, 0].copy(), pairs[:, 1].copy()
    g = build_graph_from_arrays(a, b, np.ones(len(a)), V=V, P=P)
    df = (triangle_support(g).to_pandas()
          .sort_values(["src", "dst"]).reset_index(drop=True))

    adj = [set() for _ in range(V)]
    for u, v in zip(a, b):
        adj[u].add(int(v))
        adj[v].add(int(u))
    rows = [(u, v, len(adj[u] & adj[v]))
            for u in range(V) for v in sorted(adj[u]) if v > u]
    want = pd.DataFrame(rows, columns=["src", "dst", "support"])
    assert len(df) == len(want)
    assert (df.values == want.values).all()


@pytest.mark.parametrize("P", [1, 4])
def test_clustering_coefficient_brute_force(P):
    """Per-vertex (tri, degree, coeff) must match brute-force neighbor-set
    counting on a simple random graph, at any partitioning."""
    from leiden_cuda_ray.algorithms.trisupport import clustering_coefficient

    rng = np.random.RandomState(11)
    V, E = 50, 300
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    m = src != dst
    pairs = np.unique(np.stack([np.minimum(src, dst)[m],
                                np.maximum(src, dst)[m]], 1), axis=0)
    src, dst = pairs[:, 0].copy(), pairs[:, 1].copy()
    g = build_graph_from_arrays(src, dst, np.ones(len(src)), P=P)
    df = (clustering_coefficient(g).to_pandas()
          .sort_values("vertex").reset_index(drop=True))

    adj = [set() for _ in range(V)]
    for a, b in zip(src, dst):
        adj[a].add(int(b))
        adj[b].add(int(a))
    for _, r in df.iterrows():
        v = int(r["vertex"])
        deg = len(adj[v])
        tri = sum(len(adj[v] & adj[w]) for w in adj[v]) // 2
        assert deg == r["degree"] and tri == r["tri"]
        want = round(2.0 * tri / (deg * (deg - 1)), 6) if deg > 1 else 0.0
        assert abs(r["coeff"] - want) < 1e-9
    assert len(df) == sum(1 for a in adj if a)  # isolated excluded


@pytest.mark.parametrize("P", [1, 4])
def test_edge_jaccard_brute_force(P):
    """Per-edge (inter, uni, jaccard) must match brute-force neighbor-set
    intersection/union (raw sets: v ∈ N(u)), at any partitioning."""
    from leiden_cuda_ray.algorithms.trisupport import edge_jaccard

    rng = np.random.RandomState(13)
    V, E = 40, 220
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    m = src != dst
    pairs = np.unique(np.stack([np.minimum(src, dst)[m],
                                np.maximum(src, dst)[m]], 1), axis=0)
    src, dst = pairs[:, 0].copy(), pairs[:, 1].copy()
    g = build_graph_from_arrays(src, dst, np.ones(len(src)), P=P)
    df = (edge_jaccard(g).to_pandas()
          .sort_values(["src", "dst"]).reset_index(drop=True))

    adj = [set() for _ in range(V)]
    for a, b in zip(src, dst):
        adj[a].add(int(b))
        adj[b].add(int(a))
    assert len(df) == len(src)
    for _, r in df.iterrows():
        u, v = int(r["src"]), int(r["dst"])
        inter = len(adj[u] & adj[v])
        uni = len(adj[u] | adj[v])
        assert inter == r["inter"] and uni == r["uni"]
        assert abs(r["jaccard"] - round(inter / uni, 6)) < 1e-9


@pytest.mark.parametrize("P", [1, 4])
def test_adamic_adar_brute_force(P):
    """Per-edge exact-integer Adamic-Adar must match brute-force
    common-neighbor summation of round(1e9/ln(deg(w))), at any
    partitioning; aa is the unrounded quotient aa_int / 1e9."""
    from leiden_cuda_ray.algorithms.linkpred import _AA_SCALE, adamic_adar

    rng = np.random.RandomState(17)
    V, E = 60, 400
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    m = src != dst
    pairs = np.unique(np.stack([np.minimum(src, dst)[m],
                                np.maximum(src, dst)[m]], 1), axis=0)
    src, dst = pairs[:, 0].copy(), pairs[:, 1].copy()
    g = build_graph_from_arrays(src, dst, np.ones(len(src)), P=P)
    df = (adamic_adar(g).to_pandas()
          .sort_values(["src", "dst"]).reset_index(drop=True))

    adj = [set() for _ in range(V)]
    for a, b in zip(src, dst):
        adj[a].add(int(b))
        adj[b].add(int(a))
    assert len(df) == len(src)
    for _, r in df.iterrows():
        u, v = int(r["src"]), int(r["dst"])
        want = sum(int(np.round(_AA_SCALE / np.log(len(adj[w]))))
                   for w in adj[u] & adj[v])
        assert want == r["aa_int"]
        assert r["aa"] == r["aa_int"] / _AA_SCALE


@pytest.mark.parametrize("P", [1, 4])
def test_random_walks_brute_force(P):
    """The distributed walk table must match a sequential replay of the
    deterministic rank hash over sorted adjacency, at any
    partitioning."""
    import pandas as pd

    from leiden_cuda_ray.algorithms.walks import _WALK_A, _WALK_B, \
        random_walks

    rng = np.random.RandomState(5)
    V, E = 70, 300
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    m = src != dst
    pairs = np.unique(np.stack([np.minimum(src, dst)[m],
                                np.maximum(src, dst)[m]], 1), axis=0)
    src, dst = pairs[:, 0].copy(), pairs[:, 1].copy()
    g = build_graph_from_arrays(src, dst, np.ones(len(src)), P=P)
    df = (random_walks(g, length=8, seed_mod=13).to_pandas()
          .sort_values(["start", "step"]).reset_index(drop=True))

    aset = [set() for _ in range(V)]
    for a, b in zip(src, dst):
        aset[a].add(int(b))
        aset[b].add(int(a))
    adj = [sorted(x) for x in aset]
    rows = []
    for v0 in range(0, V, 13):
        if not adj[v0]:
            continue
        cur = v0
        rows.append((v0, 0, v0))
        for t in range(1, 9):
            cur = adj[cur][(cur * _WALK_A + _WALK_B * t) % len(adj[cur])]
            rows.append((v0, t, cur))
    want = pd.DataFrame(rows, columns=["start", "step", "vertex"])
    assert len(df) == len(want)
    assert (df.values == want.values).all()


@pytest.mark.parametrize("seed,P", [(3, 1), (3, 4), (11, 3), (29, 4)])
def test_scc_brute_force(seed, P):
    """SCC labels must equal brute-force mutual-reachability min ids on
    random directed graphs, at any partitioning; singleton and
    multi-phase (DAG-ish) regimes both covered by the seeds."""
    import pyarrow as pa
    import ray.data

    from leiden_cuda_ray.algorithms.scc import strongly_connected_components

    rng = np.random.RandomState(seed)
    V, E = (50, 60) if seed == 29 else (40, 90)
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    m = src != dst
    pairs = np.unique(np.stack([src[m], dst[m]], 1), axis=0)
    ds = ray.data.from_arrow(pa.table({"src": pairs[:, 0],
                                       "dst": pairs[:, 1]}))
    res, phases = strongly_connected_components(ds, V, P=P)
    df = res.to_pandas().sort_values("vertex").reset_index(drop=True)

    adj = [[] for _ in range(V)]
    for u, v in pairs:
        adj[u].append(int(v))

    def reach(s):
        seen = {s}
        st = [s]
        while st:
            x = st.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    st.append(y)
        return seen

    fw = [reach(v) for v in range(V)]
    want = [min(w for w in fw[v] if v in fw[w]) for v in range(V)]
    assert len(df) == V
    assert (df["scc"].to_numpy() == np.array(want, np.int64)).all()
    assert phases <= 16


@pytest.mark.parametrize("seed,P", [(5, 1), (5, 4), (17, 3)])
def test_dag_depth_brute_force(seed, P):
    """dag_depth must equal longest-path-length-ending-at-v on random
    DAGs (edges forced low→high id, so acyclic by construction)."""
    import pyarrow as pa
    import ray.data

    from leiden_cuda_ray.algorithms.scc import dag_depth

    rng = np.random.RandomState(seed)
    V, E = 60, 120
    a = rng.randint(0, V, E).astype(np.int64)
    b = rng.randint(0, V, E).astype(np.int64)
    m = a != b
    src = np.minimum(a[m], b[m])
    dst = np.maximum(a[m], b[m])
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    ds = ray.data.from_arrow(pa.table({"src": pairs[:, 0],
                                       "dst": pairs[:, 1]}))
    df = (dag_depth(ds, V, P=P).to_pandas()
          .sort_values("vertex").reset_index(drop=True))

    want = np.zeros(V, np.int64)
    for u, v in pairs:  # pairs sorted by (src, dst); src<dst = topo order
        want[v] = max(want[v], want[u] + 1)
    assert len(df) == V
    assert (df["depth"].to_numpy() == want).all()


def test_dag_depth_cycle_is_loud():
    import pyarrow as pa
    import ray.data

    from leiden_cuda_ray.algorithms.scc import dag_depth

    ds = ray.data.from_arrow(pa.table(
        {"src": np.array([0, 1, 2], np.int64),
         "dst": np.array([1, 2, 0], np.int64)}))
    with pytest.raises(ValueError, match="cycle"):
        dag_depth(ds, 3, P=2, max_iterations=20)


@pytest.mark.parametrize("seed,P", [(3, 1), (3, 4), (29, 3)])
def test_condensation_depth_brute_force(seed, P):
    """condensation_depth must equal the longest cross-SCC chain ending
    at each vertex's component, computed by brute force (mutual-reach
    SCCs + memoized longest path on the condensation)."""
    import pyarrow as pa
    import ray.data

    from leiden_cuda_ray.algorithms.scc import condensation_depth

    rng = np.random.RandomState(seed)
    V, E = 40, 90
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    m = src != dst
    pairs = np.unique(np.stack([src[m], dst[m]], 1), axis=0)
    ds = ray.data.from_arrow(pa.table({"src": pairs[:, 0],
                                       "dst": pairs[:, 1]}))
    df = (condensation_depth(ds, V, P=P).to_pandas()
          .sort_values("vertex").reset_index(drop=True))

    adj = [[] for _ in range(V)]
    for u, v in pairs:
        adj[u].append(int(v))

    def reach(s):
        seen = {s}
        st = [s]
        while st:
            x = st.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    st.append(y)
        return seen

    fw = [reach(v) for v in range(V)]
    scc = [min(w for w in fw[v] if v in fw[w]) for v in range(V)]
    cond = {(scc[u], scc[v]) for u, v in pairs if scc[u] != scc[v]}
    import functools

    @functools.lru_cache(maxsize=None)
    def depth(c):
        preds = [a for a, b in cond if b == c]
        return 0 if not preds else 1 + max(depth(a) for a in preds)

    assert len(df) == V
    assert (df["scc"].to_numpy() == np.array(scc, np.int64)).all()
    want = np.array([depth(c) for c in scc], np.int64)
    assert (df["depth"].to_numpy() == want).all()


@pytest.mark.parametrize("seed,P", [(7, 1), (7, 4), (19, 3)])
def test_components_from_pairs_brute_force(seed, P):
    """Min-label components over a raw (directed) pair stream must equal
    undirected connectivity min ids, at any partitioning; edge-free ids
    are singletons."""
    import pyarrow as pa
    import ray.data

    from leiden_cuda_ray.algorithms.scc import components_from_pairs

    rng = np.random.RandomState(seed)
    V, E = 50, 40  # sparse: several components + isolated ids
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    m = src != dst
    pairs = np.unique(np.stack([src[m], dst[m]], 1), axis=0)
    ds = ray.data.from_arrow(pa.table({"src": pairs[:, 0],
                                       "dst": pairs[:, 1]}))
    df = (components_from_pairs(ds, V, P=P).to_pandas()
          .sort_values("vertex").reset_index(drop=True))

    lab = np.arange(V)
    for _ in range(V):
        changed = False
        for u, v in pairs:
            m2 = min(lab[u], lab[v])
            if lab[u] != m2 or lab[v] != m2:
                lab[u] = lab[v] = m2
                changed = True
        if not changed:
            break
    assert len(df) == V
    assert (df["component"].to_numpy() == lab).all()


@pytest.mark.parametrize("seed,P", [(4, 1), (4, 4), (37, 3)])
def test_shortest_path_counts_brute_force(seed, P):
    """σ and dist must equal brute-force BFS path counting per seed, at
    any partitioning; unreachable pairs report (-1, 0)."""
    from collections import deque

    from leiden_cuda_ray.algorithms.spcount import shortest_path_counts

    rng = np.random.RandomState(seed)
    V, E = 60, 110
    a = rng.randint(0, V, E).astype(np.int64)
    b = rng.randint(0, V, E).astype(np.int64)
    m = a != b
    src, dst = np.minimum(a[m], b[m]), np.maximum(a[m], b[m])
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    g = build_graph_from_arrays(pairs[:, 0], pairs[:, 1],
                                np.ones(len(pairs)), V=V, P=P)
    ds, depth = shortest_path_counts(g, seed_mod=17, max_seeds=3)
    df = (ds.to_pandas().sort_values(["seed", "vertex"])
          .reset_index(drop=True))

    adj = [[] for _ in range(V)]
    for u, v in pairs:
        adj[u].append(int(v))
        adj[v].append(int(u))
    rows = []
    for s in [0, 17, 34]:
        dist = np.full(V, -1, np.int64)
        sig = np.zeros(V, np.int64)
        dist[s], sig[s] = 0, 1
        q = deque([s])
        order = [s]
        while q:
            u = q.popleft()
            for w in adj[u]:
                if dist[w] == -1:
                    dist[w] = dist[u] + 1
                    q.append(w)
                    order.append(w)
        for u in order:  # settle σ in level order
            for w in adj[u]:
                if dist[w] == dist[u] + 1:
                    sig[w] += sig[u]
        for v in range(V):
            rows.append((s, v, dist[v], sig[v]))
    import pandas as pd
    want = pd.DataFrame(rows, columns=["seed", "vertex", "dist", "sigma"])
    assert len(df) == len(want)
    assert (df.values == want.values).all()
    assert depth <= 16


@pytest.mark.parametrize("seed,P", [(4, 1), (4, 4), (37, 3)])
def test_betweenness_quantized_brute_force(seed, P):
    """delta_q must equal a sequential replay of the pinned integer
    recurrence δq(v) = σ(v)·Σ_succ (SCALE + δq(w)) // σ(w), and track
    true Brandes δ within the quantization error, at any partitioning."""
    from collections import deque

    from leiden_cuda_ray.algorithms.spcount import (_DELTA_SCALE,
                                                    betweenness_quantized)

    rng = np.random.RandomState(seed)
    V, E = 60, 110
    a = rng.randint(0, V, E).astype(np.int64)
    b = rng.randint(0, V, E).astype(np.int64)
    m = a != b
    src, dst = np.minimum(a[m], b[m]), np.maximum(a[m], b[m])
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    g = build_graph_from_arrays(pairs[:, 0], pairs[:, 1],
                                np.ones(len(pairs)), V=V, P=P)
    ds, depth = betweenness_quantized(g, seed_mod=17, max_seeds=3)
    df = (ds.to_pandas().sort_values(["seed", "vertex"])
          .reset_index(drop=True))

    adj = [[] for _ in range(V)]
    for u, v in pairs:
        adj[u].append(int(v))
        adj[v].append(int(u))
    for s in [0, 17, 34]:
        dist = np.full(V, -1, np.int64)
        sig = np.zeros(V, np.int64)
        dist[s], sig[s] = 0, 1
        q = deque([s])
        order = [s]
        while q:
            u = q.popleft()
            for w in adj[u]:
                if dist[w] == -1:
                    dist[w] = dist[u] + 1
                    q.append(w)
                    order.append(w)
        for u in order:
            for w in adj[u]:
                if dist[w] == dist[u] + 1:
                    sig[w] += sig[u]
        dq = np.zeros(V, np.int64)
        delta = np.zeros(V, np.float64)  # true Brandes for the bound
        for u in reversed(order):
            for w in adj[u]:
                if dist[w] == dist[u] + 1:
                    dq[u] += sig[u] * ((_DELTA_SCALE + dq[w]) // sig[w])
                    delta[u] += sig[u] / sig[w] * (1 + delta[w])
        dq[s] = 0
        delta[s] = 0.0
        sub = df[df.seed == s]
        got = sub["delta_q"].to_numpy()
        assert (got == dq).all()
        reached = dist >= 0
        err = np.abs(got[reached] / _DELTA_SCALE - delta[reached])
        assert err.max(initial=0) < 0.01  # quantization stays tight
    assert depth <= 16


@pytest.mark.parametrize("seed,P", [(2, 1), (2, 4), (31, 3)])
def test_matching_handshake_equivalence(seed, P):
    """The distributed handshake matching must equal a sequential
    simulation of the same synchronous rounds, be a valid matching
    (mate[mate[v]] == v), and be maximal — at any partitioning."""
    from leiden_cuda_ray.algorithms.matching import maximal_matching
    from leiden_cuda_ray.algorithms.mis import mis_key

    rng = np.random.RandomState(seed)
    V, E = 60, 120
    a = rng.randint(0, V - 4, E).astype(np.int64)  # 4 isolated vertices
    b = rng.randint(0, V - 4, E).astype(np.int64)
    m = a != b
    src, dst = np.minimum(a[m], b[m]), np.maximum(a[m], b[m])
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    g = build_graph_from_arrays(pairs[:, 0], pairs[:, 1],
                                np.ones(len(pairs)), V=V, P=P)
    ds, rounds = maximal_matching(g, seed=13)
    df = ds.to_pandas().sort_values("vertex").reset_index(drop=True)
    got = df["mate"].to_numpy()

    keys = mis_key(np.arange(V, dtype=np.int64), V, 13)
    adj = [set() for _ in range(V)]
    for u, v in pairs:
        adj[u].add(int(v))
        adj[v].add(int(u))
    mate = np.full(V, -1, np.int64)
    while True:
        prop = {}
        for v in range(V):
            if mate[v] == -1:
                alive = [u for u in adj[v] if mate[u] == -1]
                if alive:
                    prop[v] = min(alive, key=lambda u: keys[u])
        if not prop:
            break
        for v, u in prop.items():
            if prop.get(u) == v:
                mate[v] = u
                mate[u] = v
    assert (got == mate).all()
    matched = np.flatnonzero(got != -1)
    assert (got[got[matched]] == matched).all()  # involution
    for u, v in pairs:  # maximal: no edge with both endpoints free
        assert got[u] != -1 or got[v] != -1
    assert got[V - 4:].max() == -1  # isolated stay unmatched
    assert rounds <= 20


@pytest.mark.parametrize("cutover", [0, 40, 10**9])
def test_matching_drain_cutover_invariance(cutover):
    """mate arrays must be BIT-IDENTICAL across execution schedules:
    pure distributed waves (cutover=0), mid-drain cutover (the
    distributed rounds run until the alive set shrinks under 40, then
    the in-process cursor drain finishes), and immediate drain."""
    from leiden_cuda_ray.algorithms.matching import maximal_matching
    from leiden_cuda_ray.algorithms.mis import mis_key

    rng = np.random.RandomState(7)
    V, E = 80, 200
    a = rng.randint(0, V, E).astype(np.int64)
    b = rng.randint(0, V, E).astype(np.int64)
    m = a != b
    src, dst = np.minimum(a[m], b[m]), np.maximum(a[m], b[m])
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    g = build_graph_from_arrays(pairs[:, 0], pairs[:, 1],
                                np.ones(len(pairs)), V=V, P=4)
    ds, rounds = maximal_matching(g, seed=13, drain_cutover=cutover)
    got = (ds.to_pandas().sort_values("vertex")
           .reset_index(drop=True)["mate"].to_numpy())

    # sequential synchronous-round simulation (the semantics oracle)
    keys = mis_key(np.arange(V, dtype=np.int64), V, 13)
    adj = [set() for _ in range(V)]
    for u, v in pairs:
        adj[u].add(int(v))
        adj[v].add(int(u))
    mate = np.full(V, -1, np.int64)
    while True:
        prop = {}
        for v in range(V):
            if mate[v] == -1:
                alive = [u for u in adj[v] if mate[u] == -1]
                if alive:
                    prop[v] = min(alive, key=lambda u: keys[u])
        if not prop:
            break
        for v, u in prop.items():
            if prop.get(u) == v:
                mate[v] = u
                mate[u] = v
    assert (got == mate).all()


@pytest.mark.parametrize("seed,P", [(1, 1), (1, 4), (23, 3), (42, 5)])
def test_mis_greedy_equivalence(seed, P):
    """The parallel fixed-priority Luby MIS must equal the SEQUENTIAL
    greedy MIS taken in ascending mis_key order, at any partitioning;
    isolated vertices always join."""
    from leiden_cuda_ray.algorithms.mis import (maximal_independent_set,
                                                mis_key)

    rng = np.random.RandomState(seed)
    V, E = 60, 140
    a = rng.randint(0, V - 5, E).astype(np.int64)  # 5 isolated vertices
    b = rng.randint(0, V - 5, E).astype(np.int64)
    m = a != b
    src, dst = np.minimum(a[m], b[m]), np.maximum(a[m], b[m])
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    g = build_graph_from_arrays(pairs[:, 0], pairs[:, 1],
                                np.ones(len(pairs)), V=V, P=P)
    ds, rounds = maximal_independent_set(g, seed=11)
    df = ds.to_pandas().sort_values("vertex").reset_index(drop=True)

    keys = mis_key(np.arange(V, dtype=np.int64), V, 11)
    adj = [set() for _ in range(V)]
    for u, v in pairs:
        adj[u].add(int(v))
        adj[v].add(int(u))
    want = np.zeros(V, np.int64)
    dead = np.zeros(V, bool)
    for v in np.argsort(keys):
        if not dead[v]:
            want[v] = 1
            dead[v] = True
            for u in adj[v]:
                dead[u] = True
    assert len(df) == V
    assert (df["in_mis"].to_numpy() == want).all()
    assert want[V - 5:].all()  # isolated vertices are all in the MIS
    # independence + maximality directly
    got = df["in_mis"].to_numpy().astype(bool)
    for u, v in pairs:
        assert not (got[u] and got[v])
    for v in range(V):
        assert got[v] or any(got[u] for u in adj[v])
    assert rounds <= 20


@pytest.mark.parametrize("seed,P", [(3, 1), (3, 4), (29, 3)])
def test_jp_coloring_proper_and_greedy_equivalent(seed, P):
    """JP wave coloring must equal the sequential recurrence
    color(v) = 1 + max(color(u) : u adjacent, key(u) < key(v)) taken in
    ascending mis_key order, be a PROPER coloring, and be P-invariant;
    isolated vertices get color 1."""
    from leiden_cuda_ray.algorithms.coloring import jp_coloring
    from leiden_cuda_ray.algorithms.mis import mis_key

    rng = np.random.RandomState(seed)
    V, E = 60, 140
    a = rng.randint(0, V - 5, E).astype(np.int64)  # 5 isolated vertices
    b = rng.randint(0, V - 5, E).astype(np.int64)
    m = a != b
    src, dst = np.minimum(a[m], b[m]), np.maximum(a[m], b[m])
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    g = build_graph_from_arrays(pairs[:, 0], pairs[:, 1],
                                np.ones(len(pairs)), V=V, P=P)
    df = (jp_coloring(g, seed=11).to_pandas()
          .sort_values("vertex").reset_index(drop=True))
    got = df["color"].to_numpy()

    keys = mis_key(np.arange(V, dtype=np.int64), V, 11)
    adj = [set() for _ in range(V)]
    for u, v in pairs:
        adj[u].add(int(v))
        adj[v].add(int(u))
    want = np.zeros(V, np.int64)
    for v in np.argsort(keys):  # ascending keys: deps already colored
        lower = [want[u] for u in adj[v] if keys[u] < keys[v]]
        want[v] = 1 + (max(lower) if lower else 0)
    assert len(df) == V
    assert (got == want).all()
    assert (got[V - 5:] == 1).all()   # isolated vertices
    for u, v in pairs:                # proper coloring
        assert got[u] != got[v]


def sssp_oracle(src, dst, w, V, seed_mod):
    """Dense Bellman-Ford reference over the symmetrized graph."""
    s, d, ww = _sym(src, dst, w)
    wi = np.rint(ww).astype(np.int64)
    INF = np.int64(1) << np.int64(62)
    dist = np.where(np.arange(V) % seed_mod == 0, np.int64(0), INF)
    for _ in range(V):
        nd = dist.copy()
        np.minimum.at(nd, d, dist[s] + wi)
        if np.array_equal(nd, dist):
            break
        dist = nd
    return np.where(dist >= INF, np.int64(-1), dist)


@pytest.mark.parametrize("P", [1, 3])
def test_sssp_weighted_clique_ring(P):
    from leiden_cuda_ray.algorithms.sssp import sssp_weighted

    src, dst, w = clique_ring_edges()
    # varied INTEGER weights (the engine graph's weights are counts)
    w = (np.arange(len(src)) % 5 + 1).astype(np.float64)
    V = 20
    g = build_graph_from_arrays(src, dst, w, P=P)
    dists, steps, max_dist = sssp_weighted(g, seed_mod=7)
    got = _gather_state(dists)
    want = sssp_oracle(src, dst, w, V, 7)
    assert np.array_equal(got, want)
    fin = got[got >= 0]
    assert len(fin) and max_dist == int(fin.max())


def test_sssp_p_invariant():
    from leiden_cuda_ray.algorithms.sssp import sssp_weighted

    src, dst, w = clique_ring_edges()
    outs = []
    for P in (1, 2, 4):
        g = build_graph_from_arrays(src, dst, w, P=P)
        dists, _, _ = sssp_weighted(g, seed_mod=7)
        outs.append(_gather_state(dists))
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[1], outs[2])


@pytest.mark.parametrize("P", [1, 3])
def test_pseudo_diameter_clique_ring(P):
    from leiden_cuda_ray.algorithms.bfs import pseudo_diameter

    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=P)
    far_a, ecc_0, far_b, dlb = pseudo_diameter(g)
    # 5 cliques of 4 on a ring: true diameter 5 (hop across the ring
    # via bridges); BFS from 0 reaches a farthest vertex at its
    # eccentricity, the return sweep can only match or improve it
    d = sssp_oracle(src, dst, np.ones_like(w), 20, seed_mod=10**9)
    # seed_mod > V ⟹ only vertex 0 seeds; oracle dist = BFS from 0
    assert ecc_0 == int(d.max())
    assert far_a == int(np.flatnonzero(d == d.max()).min())
    assert dlb >= ecc_0
