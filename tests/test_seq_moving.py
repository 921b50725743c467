"""Sequential-queue drain (moving._seq_queue_core / _run_seq_level_task):
small graphs run lock-mode local moving as the reference's COMPLETE
sequential queue algorithm (custom_leiden.py:534-599). These tests pin

- exact per-vertex equality with the vendored reference oracle's queue
  mover on seeded ER graphs (unit weights => exact float arithmetic on
  both sides, so equality is deterministic, not probabilistic), and
- cross-P bit-identity of the merged-graph drain path.
"""

import numpy as np
import pytest
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

from leiden_cuda_ray.algorithms.louvain import louvain
from leiden_cuda_ray.algorithms.moving import _seq_queue_core
from leiden_cuda_ray.config import LouvainConfig
from leiden_cuda_ray.graph.build import build_graph_from_arrays
from leiden_cuda_ray.graph.csr import build_partition_csr
from leiden_cuda_ray.sources.fixtures import clique_ring_edges
from tests.reference_oracle import _build_adj, _move_nodes_fast, ref_louvain


def _er_graph(n=150, p=0.06, seed=3):
    """Seeded ER graph as unique canonical (u < v) unit-weight pairs."""
    rng = np.random.RandomState(seed)
    su, sv = np.triu_indices(n, k=1)
    keep = rng.rand(len(su)) < p
    src = su[keep].astype(np.int64)
    dst = sv[keep].astype(np.int64)
    return src, dst, np.ones(len(src), np.float64), n


def _drain(src, dst, w, n, gamma):
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ww = np.concatenate([w, w])
    csr = build_partition_csr(s, d, ww, 0, n)
    comm = np.arange(n, dtype=np.int64)
    agg = np.ones(n, np.int64)
    active = np.ones(n, bool)
    moved = _seq_queue_core(csr["offsets"], csr["indices"], csr["weights"],
                            csr["self_w"], csr["deg_w"], comm,
                            agg.astype(np.float64), active, "cpm", gamma)
    return comm, active, moved


@pytest.mark.parametrize("gamma", [0.02, 0.05, 0.1])
def test_seq_queue_matches_oracle_exactly(gamma):
    src, dst, w, n = _er_graph()
    comm, active, moved = _drain(src, dst, w, n, gamma)
    assert not active.any()  # fully drained, no cap

    adj, nodes = _build_adj(src, dst, w)
    ocomm, _ = _move_nodes_fast(adj, nodes, {v: v for v in nodes},
                                {v: 1.0 for v in nodes}, gamma)
    # isolated vertices (absent from the oracle's edge-derived node set)
    # keep their singleton label on both sides
    expected = np.array([ocomm.get(v, v) for v in range(n)], np.int64)
    assert np.array_equal(comm, expected)
    assert moved > 0  # the drain did real work


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000),
       n=st.integers(5, 40),
       p_pct=st.integers(5, 40),
       gamma=st.sampled_from([0.02, 0.05, 0.09, 0.1, 0.3]),
       wscale=st.sampled_from([1.0, 10.0]))
def test_seq_queue_matches_oracle_property(seed, n, p_pct, gamma, wscale):
    """Property: the vectorized drain equals the reference oracle's queue
    mover on arbitrary small ER graphs, unit or x10 integer weights (both
    sides compute exact float sums, so equality is deterministic)."""
    rng = np.random.RandomState(seed)
    su, sv = np.triu_indices(n, k=1)
    keep = rng.rand(len(su)) < p_pct / 100.0
    src = su[keep].astype(np.int64)
    dst = sv[keep].astype(np.int64)
    if not len(src):
        return
    w = wscale * rng.randint(1, 4, len(src)).astype(np.float64)

    comm, active, _ = _drain(src, dst, w, n, gamma)
    assert not active.any()
    adj, nodes = _build_adj(src, dst, w)
    ocomm, _ = _move_nodes_fast(adj, nodes, {v: v for v in nodes},
                                {v: 1.0 for v in nodes}, gamma)
    expected = np.array([ocomm.get(v, v) for v in range(n)], np.int64)
    assert np.array_equal(comm, expected)


def test_seq_queue_weighted_large_deltas():
    """Regression: with edge weights >> 1 the best delta exceeds the
    magnitude where `M - 1e-15` rounds back to M; the near-max mask went
    empty and argmax(all-False) = 0 picked a garbage move (possibly the
    -inf own-community slot). The drain must stay oracle-exact and CPM
    (which starts at 0 from singletons) must end non-negative."""
    src, dst, w, n = _er_graph(seed=23)
    rng = np.random.RandomState(7)
    w = (10.0 * rng.randint(1, 11, len(src))).astype(np.float64)
    gamma = 0.05

    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ww = np.concatenate([w, w])
    csr = build_partition_csr(s, d, ww, 0, n)
    comm = np.arange(n, dtype=np.int64)
    moved = _seq_queue_core(csr["offsets"], csr["indices"], csr["weights"],
                            csr["self_w"], csr["deg_w"], comm,
                            np.ones(n, np.float64), np.ones(n, bool),
                            "cpm", gamma)
    assert moved > 0

    adj, nodes = _build_adj(src, dst, w)
    ocomm, _ = _move_nodes_fast(adj, nodes, {v: v for v in nodes},
                                {v: 1.0 for v in nodes}, gamma)
    expected = np.array([ocomm.get(v, v) for v in range(n)], np.int64)
    assert np.array_equal(comm, expected)

    # CPM must not go below its singleton start (0): every applied move
    # claims a positive delta
    srcg = np.repeat(np.arange(n, dtype=np.int64), np.diff(csr["offsets"]))
    intra = comm[srcg] == comm[csr["indices"]]
    w_in = csr["weights"][intra].sum() / 2.0
    sizes = np.bincount(comm, minlength=n).astype(np.float64)
    cpm = w_in - gamma * (sizes * (sizes - 1) / 2).sum()
    assert cpm > 0


def test_seq_queue_second_drain_matches_oracle_second_drain():
    """Re-draining the drained state stays in lockstep with the oracle
    (the queue rule wakes only MOVERS' neighbors, so a second all-active
    pass may legitimately find more moves — identically on both sides)."""
    src, dst, w, n = _er_graph(seed=11)
    comm, _, _ = _drain(src, dst, w, n, 0.05)

    adj, nodes = _build_adj(src, dst, w)
    ocomm, _ = _move_nodes_fast(adj, nodes, {v: v for v in nodes},
                                {v: 1.0 for v in nodes}, 0.05)
    ocomm, _ = _move_nodes_fast(adj, nodes, ocomm,
                                {v: 1.0 for v in nodes}, 0.05)

    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ww = np.concatenate([w, w])
    csr = build_partition_csr(s, d, ww, 0, n)
    _seq_queue_core(csr["offsets"], csr["indices"], csr["weights"],
                    csr["self_w"], csr["deg_w"], comm,
                    np.ones(n, np.float64), np.ones(n, bool), "cpm", 0.05)
    expected = np.array([ocomm.get(v, v) for v in range(n)], np.int64)
    assert np.array_equal(comm, expected)


def _canon(comm):
    groups = {}
    for v, c in enumerate(comm):
        groups.setdefault(int(c), []).append(v)
    out = np.empty(len(comm), np.int64)
    for members in groups.values():
        out[members] = min(members)
    return out


def test_distributed_lock_loop_still_correct(monkeypatch):
    """The colored-BSP claims loop is the scale path (V > LOCK_DRAIN_V_MAX
    on a real cluster): force it on the clique ring and check it still
    finds the five cliques, at P=1 and P=3 identically."""
    from leiden_cuda_ray.algorithms import moving
    from leiden_cuda_ray.algorithms.leiden import leiden
    from leiden_cuda_ray.config import LeidenConfig

    monkeypatch.setattr(moving, "LOCK_DRAIN_V_MAX", 0)
    monkeypatch.setattr(moving, "SEQ_V_MAX", 0)
    results = []
    for P in (1, 3):
        src, dst, w = clique_ring_edges()
        g = build_graph_from_arrays(src, dst, w, P=P)
        refs, _info = leiden(g, LeidenConfig(gamma=0.1,
                                             lock_communities=True))
        comm = np.concatenate(ray.get(refs))
        groups = {}
        for v, c in enumerate(comm):
            groups.setdefault(int(c), set()).add(v)
        assert sorted(groups.values(), key=min) == [
            {0, 1, 2, 3}, {4, 5, 6, 7}, {8, 9, 10, 11},
            {12, 13, 14, 15}, {16, 17, 18, 19}]
        results.append(comm)
    assert np.array_equal(results[0], results[1])


def test_louvain_lock_mode_matches_reference():
    """Modularity kind through the sequential drain (lock mode on a small
    graph) recovers the reference partition on the clique ring."""
    src, dst, w = clique_ring_edges()
    n = int(max(src.max(), dst.max()) + 1)
    oracle = ref_louvain(src, dst, w)
    expected = _canon(np.array([oracle[v] for v in range(n)]))

    for P in (1, 2):
        g = build_graph_from_arrays(src, dst, w, P=P)
        refs, _info = louvain(g, LouvainConfig(lock_communities=True))
        comm = np.concatenate(ray.get(refs))
        assert np.array_equal(_canon(comm), expected), f"P={P}"
