"""Louvain community detection (modularity objective, no refinement).

Level loop mirrors `custom_louvain` (custom_louvain.py:345-374):
  m → community graph → modularity sweeps → no merges? stop → aggregate →
  next level (singleton init). Shares the local-moving superstep machinery
with Leiden; only the delta formula differs (moving.py kind="mod")."""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.coarsen import coarsen
from leiden_cuda_ray.algorithms.leiden import (
    _assemble,
    _gather_map,
    _get_comm,
    _n_distinct,
    _n_distinct_part,
    _split_by_ranges,
)
from leiden_cuda_ray.algorithms.moving import init_move_state, run_local_moving
from leiden_cuda_ray.config import LouvainConfig
from leiden_cuda_ray.graph.build import Graph


def louvain(graph: Graph, cfg: LouvainConfig = LouvainConfig()):
    """Returns (root community refs per partition, info)."""
    cur = graph
    maps = []
    levels_info = []
    final_comm = None

    for level in range(cfg.max_levels):
        states = [init_move_state.remote(cur.parts[i])
                  for i in range(cur.P)]
        states, moves, steps = run_local_moving(
            cur, states, "mod", cur.m, cfg.seed + 1000 * level,
            cfg.max_supersteps, lock_communities=cfg.lock_communities)
        comm_refs = [_get_comm.remote(s) for s in states]
        n_comms = ray.get(_n_distinct.remote(
            *[_n_distinct_part.remote(s) for s in states]))
        levels_info.append({"level": level, "V": cur.V, "moves": moves,
                            "supersteps": steps, "communities": n_comms})
        final_comm = _assemble.remote(*comm_refs)
        if n_comms == cur.V or level == cfg.max_levels - 1:
            break
        assigns = comm_refs
        new_graph, level_map, _uniq = coarsen(cur, assigns, None)
        maps.append(level_map)
        cur = new_graph

    comp = final_comm
    for level_map in reversed(maps):
        comp = _gather_map.remote(level_map, comp)
    root_refs = _split_by_ranges(comp, graph)
    info = {"levels": levels_info,
            "num_communities": levels_info[-1]["communities"]}
    return root_refs, info
