"""Louvain community detection (modularity objective, no refinement).

Level loop mirrors `custom_louvain` (custom_louvain.py:345-374):
  m → community graph → modularity sweeps → no merges? stop → aggregate →
  next level (singleton init). Shares the local-moving superstep machinery
with Leiden; only the delta formula differs (moving.py kind="mod")."""

from __future__ import annotations

import ray

from leiden_cuda_ray.algorithms.coarsen import coarsen, propagate_level
from leiden_cuda_ray.algorithms.leiden import (
    _get_comm,
    _n_distinct,
    _n_distinct_part,
)
from leiden_cuda_ray.algorithms import moving as _moving
from leiden_cuda_ray.algorithms.moving import init_move_state, run_local_moving
from leiden_cuda_ray.config import LouvainConfig
from leiden_cuda_ray.graph.build import Graph


def louvain(graph: Graph, cfg: LouvainConfig = LouvainConfig()):
    """Returns (root community refs per partition, info)."""
    cur = graph
    maps = []
    levels_info = []
    final_refs = None

    for level in range(cfg.max_levels):
        states = [init_move_state.remote(cur.parts[i])
                  for i in range(cur.P)]
        # same size gating as Leiden: graphs small enough for the
        # in-process sequential drain skip the non-monotone fast mode
        states, moves, steps = run_local_moving(
            cur, states, "mod", cur.m, cfg.seed + 1000 * level,
            cfg.max_supersteps,
            lock_communities=(cfg.lock_communities
                              or cur.V <= _moving.SEQ_V_MAX))
        comm_refs = [_get_comm.remote(s) for s in states]
        n_comms = ray.get(_n_distinct.remote(
            *[_n_distinct_part.remote(s) for s in states]))
        levels_info.append({"level": level, "V": cur.V, "moves": moves,
                            "supersteps": steps, "communities": n_comms})
        final_refs = comm_refs
        if n_comms == cur.V or level == cfg.max_levels - 1:
            break
        new_graph, lm = coarsen(cur, comm_refs, None)
        maps.append(lm)
        cur = new_graph

    comp_refs = final_refs
    for lm in reversed(maps):
        comp_refs = propagate_level(lm, comp_refs)
    info = {"levels": levels_info,
            "num_communities": levels_info[-1]["communities"]}
    return comp_refs, info
