"""Degree-skew handling: edge-balanced partition boundaries."""

import numpy as np
import ray

from leiden_cuda_ray.graph.build import _balanced_bounds, build_graph_from_arrays
from tests.test_algorithms import _gather_state, pagerank_oracle


def _star_plus_chain(n_leaves=2000, chain=2000):
    """Hub vertex 0 with n_leaves spokes, then a long chain — a uniform
    id split would put the hub's whole adjacency in partition 0."""
    hub_src = np.zeros(n_leaves, np.int64)
    hub_dst = np.arange(1, n_leaves + 1, dtype=np.int64)
    c0 = np.arange(n_leaves + 1, n_leaves + chain, dtype=np.int64)
    src = np.concatenate([hub_src, c0])
    dst = np.concatenate([hub_dst, c0 + 1])
    w = np.ones(len(src))
    return src, dst, w


def test_balanced_bounds_even_edge_load():
    src, dst, w = _star_plus_chain()
    V = int(max(src.max(), dst.max())) + 1
    off = src != dst
    s_sym = np.concatenate([src, dst[off]])
    hist = np.bincount(s_sym, minlength=V)
    bounds = _balanced_bounds(hist, V, 4)
    assert bounds[0] == 0 and bounds[-1] == V
    assert np.all(np.diff(bounds) > 0)
    cum = np.concatenate([[0], np.cumsum(hist)])
    loads = np.diff(cum[bounds])
    # hub partition carries ~1/4 of edges, not ~1/2
    assert loads.max() <= 1.8 * loads.mean()


def test_skewed_graph_partition_loads():
    src, dst, w = _star_plus_chain()
    g = build_graph_from_arrays(src, dst, w, P=4)
    parts = ray.get(g.parts)
    loads = [len(p["indices"]) for p in parts]
    assert max(loads) <= 1.8 * (sum(loads) / len(loads))
    # boundaries are a proper partition of the id space
    assert parts[0]["vlo"] == 0
    for a, b in zip(parts, parts[1:]):
        assert a["vhi"] == b["vlo"]
    assert parts[-1]["vhi"] == g.V


def test_skewed_graph_algorithms_correct():
    from leiden_cuda_ray.algorithms.components import connected_components
    from leiden_cuda_ray.algorithms.pagerank import pagerank

    src, dst, w = _star_plus_chain(n_leaves=300, chain=100)
    V = int(max(src.max(), dst.max())) + 1
    g = build_graph_from_arrays(src, dst, w, P=4)
    ranks, _, _ = pagerank(g)
    assert np.allclose(_gather_state(ranks),
                       pagerank_oracle(src, dst, w, V), atol=1e-6)
    labels, _ = connected_components(g)
    lab = _gather_state(labels)
    assert len(np.unique(lab)) == 2  # star and chain are disjoint


def test_lsh_giant_duplicate_bucket_capped():
    """A 5,000-copy duplicate group lands every member in the same bucket
    of every band; the capped emitter must produce O(k) pairs per band
    (not 12.5M per band), stay connected, and minhash dedup must still
    collapse the whole group to one keeper."""
    import time

    import pandas as pd
    import ray.data

    from leiden_cuda_ray.functions import dedup

    n_dup = 5000
    texts = ["the same boilerplate text appears everywhere " * 5] * n_dup
    texts += [f"unique document number {i} with its own words {i * 7}"
              for i in range(50)]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df)
    t0 = time.perf_counter()
    sigs = dedup.minhash_signatures(ds)
    pairs = dedup.lsh_candidate_pairs(sigs, threshold=0.8)
    n_pairs = pairs.count()
    elapsed = time.perf_counter() - t0
    # capped: ~2 pairs per member per band upper bound, nowhere near k^2/2
    assert n_pairs < 16 * 2 * n_dup
    assert elapsed < 120, f"straggler bucket: {elapsed:.0f}s"
    # the duplicate group must still collapse to its min id via greedy
    # min-id dedup (connectivity of the ring+chord subset)
    keepers = dedup.minhash_dedup_keepers(ds, threshold=0.8)
    kept = sorted(r["doc_id"] for r in keepers.take_all())
    dup_kept = [k for k in kept if k < n_dup]
    assert dup_kept == [0], f"duplicate group not collapsed: {dup_kept[:5]}"
