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
    # sentinel init: coarse ids absent from rq_pairs (refine's singleton
    # fallback) default to themselves — never uninitialized memory
    out = np.full(new_V, -1, np.int64)
    out[c_s] = label_per_row
    missing = out < 0
    if missing.any():
        out[missing] = np.flatnonzero(missing)
    return out


@ray.remote
def _slice(arr, lo, hi):
    return arr[lo:hi]


def _split_by_ranges(full_ref, graph: Graph):
    return [_slice.remote(full_ref, vlo, vhi) for vlo, vhi in graph.ranges()]


class CheckpointCrash(RuntimeError):
    """Raised by the crash_after test hook after a checkpoint is published."""


def leiden(graph: Graph, cfg: LeidenConfig = LeidenConfig(),
           checkpointer=None, resume: bool = False,
           crash_after: int | None = None):
    """Returns (root community refs per partition of the INPUT graph, info).

    info: {"levels": [...per-level dicts...], "num_communities": int}

    checkpointer: state.Checkpointer — persists per-superstep vertex state,
    the per-level graph, and dendrogram maps; with resume=True the run
    continues from the latest published manifest mid-level and produces a
    result bit-identical to an uninterrupted run (deterministic supersteps).
    crash_after: TEST HOOK — raise CheckpointCrash after that many
    checkpoints have been published (simulates a mid-iteration kill).
    """
    cur = graph
    init_comm = None
    aggs = graph.agg_refs
    maps = []
    levels_info = []

    start_level = 0
    resume_states = None
    resume_step = 1
    resume_moves = 0
    resume_ctl = None
    if resume and checkpointer is not None:
        man = checkpointer.latest()
        if man is not None:
            start_level = man["level"]
            maps = [checkpointer.load_map(l) for l in range(start_level)]
            cur = checkpointer.load_level_graph(start_level)
            resume_states = checkpointer.load_states(
                start_level, man["superstep"])
            resume_step = man["superstep"] + 1
            resume_moves = man["metrics"].get("total_moves", 0)
            resume_ctl = man["metrics"]

    n_ckpts = 0

    def _cb_for(level):
        if checkpointer is None:
            return None

        def cb(step, states, metrics):
            nonlocal n_ckpts
            checkpointer.save_superstep(level, step, cur, states, metrics)
            n_ckpts += 1
            if crash_after is not None and n_ckpts >= crash_after:
                raise CheckpointCrash(f"crashed after {n_ckpts} checkpoints")
        return cb

    for level in range(start_level, cfg.max_levels):
        if resume_states is not None:
            states = resume_states
            resume_states = None
            start_step, tot0 = resume_step, resume_moves
            ctl0, resume_ctl = resume_ctl, None
        else:
            ctl0 = None
            if checkpointer is not None:
                checkpointer.save_level_graph(level, cur)
            states = [
                init_move_state.remote(
                    cur.parts[i],
                    None if init_comm is None else init_comm[i],
                    None if aggs is None else aggs[i])
                for i in range(cur.P)
            ]
            start_step, tot0 = 1, 0
        states, moves, steps = run_local_moving(
            cur, states, "cpm", cfg.gamma, cfg.seed + 1000 * level,
            cfg.max_supersteps, start_step=start_step, total_moves=tot0,
            ckpt_cb=_cb_for(level),
            lock_communities=cfg.lock_communities, resume_ctl=ctl0)
        comm_refs = [_get_comm.remote(s) for s in states]
        n_comms = ray.get(_n_distinct.remote(
            *[_n_distinct_part.remote(s) for s in states]))
        levels_info.append({"level": level, "V": cur.V, "moves": moves,
                            "supersteps": steps, "communities": n_comms})

        if n_comms == cur.V or level == cfg.max_levels - 1:
            final_comm = _assemble.remote(*comm_refs)
            break

        assigns, rq_refs = refine_level(cur, states, cfg.gamma)
        # agg counts ride in the move state (set at init, constant per level)
        aggs = [_get_agg.remote(s) for s in states]
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
        if checkpointer is not None:
            checkpointer.save_map(level, level_map)
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
def _get_agg(state):
    return state["agg"]
