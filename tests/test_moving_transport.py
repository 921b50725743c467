"""Transport invariance of fast local moving: pack-group size and the
frontier-sparse tail are TRANSPORT choices — final communities, total
moves and superstep counts must be bit-identical across all of them
(and across P, which test_algorithms pins)."""

import numpy as np
import pytest
import ray

from leiden_cuda_ray.algorithms import moving as mv
from leiden_cuda_ray.config import LeidenConfig
from leiden_cuda_ray.graph.build import build_graph_from_arrays
from leiden_cuda_ray.sources.fixtures import clique_ring_edges


@ray.remote
def _comm(state):
    return state["comm"]


def _run(graph, cfg):
    states = [mv.init_move_state.remote(graph.parts[i])
              for i in range(graph.P)]
    states, moves, steps = mv.run_local_moving(
        graph, states, "cpm", cfg.gamma, cfg.seed, cfg.max_supersteps,
        lock_fallback=False)
    comms = np.concatenate(ray.get([_comm.remote(s) for s in states]))
    return comms, moves, steps


@pytest.mark.parametrize("groups", [None, 1, 2, 1000])
def test_pack_groups_bit_identical(monkeypatch, groups):
    src, dst, w = clique_ring_edges()
    cfg = LeidenConfig(gamma=0.1)
    monkeypatch.setattr(mv, "_FORCE_GROUPS", None)
    monkeypatch.setattr(mv, "SPARSE_CUT_DIV", 0)  # dense reference
    g = build_graph_from_arrays(src, dst, w, P=3)
    want = _run(g, cfg)

    monkeypatch.setattr(mv, "_FORCE_GROUPS", groups)
    g2 = build_graph_from_arrays(src, dst, w, P=3)
    got = _run(g2, cfg)
    assert np.array_equal(want[0], got[0])
    assert want[1:] == got[1:]


@pytest.mark.parametrize("cut_div", [1, 128])
def test_sparse_tail_bit_identical(monkeypatch, cut_div):
    """cut_div=1 forces the sparse handoff after the first completed
    superstep (cut = V), exercising the tail over most of the run;
    cut_div=128 is the production switch point."""
    src, dst, w = clique_ring_edges()
    cfg = LeidenConfig(gamma=0.1)
    monkeypatch.setattr(mv, "SPARSE_CUT_DIV", 0)
    g = build_graph_from_arrays(src, dst, w, P=3)
    want = _run(g, cfg)

    monkeypatch.setattr(mv, "SPARSE_CUT_DIV", cut_div)
    g2 = build_graph_from_arrays(src, dst, w, P=3)
    got = _run(g2, cfg)
    assert np.array_equal(want[0], got[0])
    assert want[1:] == got[1:]


def test_sparse_tail_direct_whole_run(monkeypatch):
    """Drive _run_sparse_tail directly over the ENTIRE run (transition
    superstep + steady sparse supersteps + termination): it must
    reproduce the dense loop's final communities, total moves and
    superstep count bit-for-bit. (In production the tail only takes the
    last few supersteps; the lookahead pipeline often finishes small
    graphs before the handoff, so this direct call is the coverage.)"""
    src, dst, w = clique_ring_edges()
    cfg = LeidenConfig(gamma=0.1)
    monkeypatch.setattr(mv, "SPARSE_CUT_DIV", 0)
    g = build_graph_from_arrays(src, dst, w, P=3)
    want = _run(g, cfg)

    g2 = build_graph_from_arrays(src, dst, w, P=3)
    P = g2.P
    G = mv._pack_groups(P)
    states = [mv.init_move_state.remote(g2.parts[i]) for i in range(P)]
    packs = []
    for i in range(P):
        r = mv._push_pack.options(num_returns=G if G > 1 else 1).remote(
            g2.parts[i], states[i], g2.block, P, i, "cpm", G)
        packs.append(list(r) if G > 1 else [r])
    states, moves, steps, stalled = mv._run_sparse_tail(
        g2, states, packs, "cpm", cfg.gamma, cfg.seed,
        cfg.max_supersteps, 0, 0, None, None, 0, G)
    comms = np.concatenate(ray.get([_comm.remote(s) for s in states]))
    assert np.array_equal(want[0], comms)
    assert (moves, steps) == want[1:]
    assert not stalled
