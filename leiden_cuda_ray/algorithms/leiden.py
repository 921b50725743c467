"""Leiden community detection — the engine's flagship algorithm.

Level loop mirrors `custom_leiden` (custom_leiden.py:693-757):
  m → local moving (CPM) → all-communities-singleton? stop
    → refinement → maintain_p → coarsen → next level
with the dendrogram kept as per-level mapping tables and the final
communities produced by composing them coarse→fine
(`propagate_partitions`, custom_leiden.py:659-677).

The next level's initial partition is the maintained P: each refined
community inherits the pre-refinement community of its members
(`maintain_p`, custom_leiden.py:493-523) — implemented from the
(refined_comm → p_comm) pairs the refinement tasks emit, relabelled to the
coarse id space as L(q) = min coarse_id(r) over refined comms r in q.
"""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.coarsen import coarsen
from leiden_cuda_ray.algorithms.moving import init_move_state, run_local_moving
from leiden_cuda_ray.algorithms.refine import refine_level
from leiden_cuda_ray.config import LeidenConfig
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.csr import part_range


@ray.remote
def _get_comm(state):
    return state["comm"]


@ray.remote
def _n_distinct_part(state):
    return np.unique(state["comm"])


@ray.remote
def _n_distinct(*parts):
    return len(np.unique(np.concatenate(parts)))


@ray.remote
def _assemble(*parts):
    return np.concatenate(parts)


@ray.remote
def _gather_map(level_map, comp):
    return comp[level_map]


@ray.remote
def _coarse_init_comm(uniq, new_V, *rq_pairs):
    """maintain_p relabel: refined comm r (coarse id) ← label of its p_comm.

    Label(q) = min coarse_id(r') over refined comms r' with p-comm q."""
    r = np.concatenate([p[0] for p in rq_pairs])
    q = np.concatenate([p[1] for p in rq_pairs])
    cid = np.searchsorted(uniq, r).astype(np.int64)
    order = np.lexsort((cid, q))
    q_s, c_s = q[order], cid[order]
    first = np.empty(len(q_s), bool)
    if len(q_s):
        first[0] = True
        np.not_equal(q_s[1:], q_s[:-1], out=first[1:])
    # map each refined comm to its group's min coarse id
    group_idx = np.cumsum(first) - 1
    label_per_row = c_s[np.flatnonzero(first)][group_idx]
    out = np.empty(new_V, np.int64)
    out[c_s] = label_per_row
    return out


@ray.remote
def _slice(arr, lo, hi):
    return arr[lo:hi]


def _split_by_ranges(full_ref, graph: Graph):
    return [_slice.remote(full_ref, vlo, vhi) for vlo, vhi in graph.ranges()]


def leiden(graph: Graph, cfg: LeidenConfig = LeidenConfig()):
    """Returns (root community refs per partition of the INPUT graph, info).

    info: {"levels": [...per-level dicts...], "num_communities": int}
    """
    cur = graph
    init_comm = None
    aggs = graph.agg_refs
    maps = []
    levels_info = []

    for level in range(cfg.max_levels):
        states = [
            init_move_state.remote(
                cur.parts[i],
                None if init_comm is None else init_comm[i],
                None if aggs is None else aggs[i])
            for i in range(cur.P)
        ]
        states, moves, steps = run_local_moving(
            cur, states, "cpm", cfg.gamma, cfg.seed + 1000 * level,
            cfg.max_supersteps)
        comm_refs = [_get_comm.remote(s) for s in states]
        n_comms = ray.get(_n_distinct.remote(
            *[_n_distinct_part.remote(s) for s in states]))
        levels_info.append({"level": level, "V": cur.V, "moves": moves,
                            "supersteps": steps, "communities": n_comms})

        if n_comms == cur.V or level == cfg.max_levels - 1:
            final_comm = _assemble.remote(*comm_refs)
            break

        assigns, rq_refs = refine_level(cur, states, cfg.gamma)
        if aggs is None:
            aggs = [_ones_agg.remote(p) for p in cur.parts]
        new_graph, level_map, uniq = coarsen(cur, assigns, aggs)
        if new_graph.V == cur.V:
            # refinement merged nothing: no further coarsening possible
            final_comm = _assemble.remote(*comm_refs)
            break
        init_full = _coarse_init_comm.remote(uniq, new_graph.V, *rq_refs)
        # initial communities must be labels in the NEW vertex-id space and
        # are vertex ids there, matching the singleton convention
        init_comm = _split_by_ranges(init_full, new_graph)
        maps.append(level_map)
        aggs = new_graph.agg_refs
        cur = new_graph
    else:  # max_levels exhausted without break
        final_comm = _assemble.remote(
            *[_get_comm.remote(s) for s in states])

    comp = final_comm
    for level_map in reversed(maps):
        comp = _gather_map.remote(level_map, comp)
    root_refs = _split_by_ranges(comp, graph)
    info = {"levels": levels_info,
            "num_communities": levels_info[-1]["communities"]}
    return root_refs, info


@ray.remote
def _ones_agg(csr):
    return np.ones(csr["vhi"] - csr["vlo"], np.int64)
