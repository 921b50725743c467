"""Leiden community detection — the engine's flagship algorithm.

Level loop mirrors `custom_leiden` (custom_leiden.py:693-757):
  m → local moving (CPM) → all-communities-singleton? stop
    → refinement → maintain_p → coarsen → next level
with the dendrogram kept as per-level sharded mapping slices (LevelMap) and
the final communities produced by request/reply pulls coarse→fine
(`propagate_partitions`, custom_leiden.py:659-677 — coarsen.propagate_level).

The next level's initial partition is the maintained P: each refined
community inherits the pre-refinement community of its members
(`maintain_p`, custom_leiden.py:493-523) — implemented from the
(refined_comm → p_comm) pairs the refinement tasks emit, relabelled to the
coarse id space as L(q) = min coarse_id(r) over refined comms r in q. The
relabel is a 4-wave sharded exchange (owner-of-r rank attach → owner-of-q
min-label group → owner-of-coarse-id scatter); no task allocates O(V).
"""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.coarsen import (
    LevelMap,
    coarsen,
    propagate_level,
)
from leiden_cuda_ray.algorithms import moving as _moving
from leiden_cuda_ray.algorithms.moving import (
    init_move_state,
    run_local_moving,
)
from leiden_cuda_ray.config import LeidenConfig
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.csr import part_range
from leiden_cuda_ray.graph.runtime import shard_by_owner


@ray.remote
def _get_comm(state):
    return state["comm"]


@ray.remote
def _get_agg(state):
    return state["agg"]


@ray.remote
def _n_distinct_part(state):
    return np.unique(state["comm"])


@ray.remote
def _n_distinct(*parts):
    return len(np.unique(np.concatenate(parts)))


# ------------------------------------------------- maintain_p relabel ----

@ray.remote
def _rq_shard(rq, block, P):
    r, q = rq
    shards = shard_by_owner(np.asarray(r, np.int64), block, P,
                            np.asarray(q, np.int64))
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _rq_attach_cid(U_k, offset, block, P, *shards):
    """Attach coarse ids to refined comms owned here; route by owner(q)."""
    r = np.concatenate([s[0] for s in shards]) if shards else \
        np.empty(0, np.int64)
    q = np.concatenate([s[1] for s in shards]) if shards else \
        np.empty(0, np.int64)
    cid = offset + np.searchsorted(U_k, r).astype(np.int64)
    out = shard_by_owner(q, block, P, cid)
    if P == 1:
        return out[0]
    return tuple(out)


@ray.remote
def _rq_label(new_block, new_P, *shards):
    """Group co-located (q, cid) pairs by q, label = min cid per group;
    emit (cid, label) routed to the NEW owner of cid."""
    q = np.concatenate([s[0] for s in shards]) if shards else \
        np.empty(0, np.int64)
    cid = np.concatenate([s[1] for s in shards]) if shards else \
        np.empty(0, np.int64)
    if len(q):
        order = np.lexsort((cid, q))
        q_s, c_s = q[order], cid[order]
        first = np.empty(len(q_s), bool)
        first[0] = True
        np.not_equal(q_s[1:], q_s[:-1], out=first[1:])
        group_idx = np.cumsum(first) - 1
        label = c_s[np.flatnonzero(first)][group_idx]
    else:
        c_s = cid
        label = cid
    out = shard_by_owner(c_s, new_block, new_P, label)
    if new_P == 1:
        return out[0]
    return tuple(out)


@ray.remote
def _init_from_labels(vlo, nv, *shards):
    """Scatter (cid → label) into this new partition's init-comm slice.

    Sentinel init: coarse ids absent from rq_pairs (refine's singleton
    fallback) default to themselves — never uninitialized memory."""
    out = np.full(nv, -1, np.int64)
    for cid, label in shards:
        out[cid - vlo] = label
    missing = out < 0
    if missing.any():
        out[missing] = vlo + np.flatnonzero(missing)
    return out


def _maintain_p_init(lm: LevelMap, rq_refs: list) -> list:
    """maintain_p relabel as a sharded exchange → per-NEW-partition init
    community arrays (labels live in the new vertex-id space)."""
    P, new_P = lm.old_P, lm.new_P
    n_buckets = len(rq_refs)
    s1 = []
    for b in range(n_buckets):
        r = _rq_shard.options(num_returns=P if P > 1 else 1).remote(
            rq_refs[b], lm.old_block, P)
        s1.append(list(r) if P > 1 else [r])
    s2 = []
    for k in range(P):
        r = _rq_attach_cid.options(num_returns=P if P > 1 else 1).remote(
            lm.uniq_refs[k], int(lm.offsets[k]), lm.old_block, P,
            *[s1[b][k] for b in range(n_buckets)])
        s2.append(list(r) if P > 1 else [r])
    s3 = []
    for o in range(P):
        r = _rq_label.options(num_returns=new_P if new_P > 1 else 1).remote(
            lm.new_block, new_P, *[s2[k][o] for k in range(P)])
        s3.append(list(r) if new_P > 1 else [r])
    out = []
    for j in range(new_P):
        vlo, vhi = part_range(j, lm.new_block, new_P, lm.new_V)
        out.append(_init_from_labels.remote(
            vlo, vhi - vlo, *[s3[o][j] for o in range(P)]))
    return out


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
    maps: list[LevelMap] = []
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
        import time as _time

        t0 = _time.perf_counter()
        # a crash during the stall-guard lock fallback must resume INTO the
        # lock phase (the phase is recorded in the checkpoint metrics).
        # Graphs small enough for the in-process sequential drain
        # (moving.SEQ_V_MAX — every coarse level, by coarsen's P=1
        # collapse) skip the fast mode entirely: the drain IS the
        # reference algorithm (custom_leiden.py:534-599), monotone and
        # exact, and one drain is faster than fast-mode supersteps plus a
        # fallback. Fast mode exists for the scale the drain can't hold.
        lock_this = cfg.lock_communities or cur.V <= _moving.SEQ_V_MAX or (
            ctl0 is not None and ctl0.get("phase") == "lock")
        states, moves, steps = run_local_moving(
            cur, states, "cpm", cfg.gamma, cfg.seed + 1000 * level,
            cfg.max_supersteps, start_step=start_step, total_moves=tot0,
            ckpt_cb=_cb_for(level),
            lock_communities=lock_this, resume_ctl=ctl0)
        comm_refs = [_get_comm.remote(s) for s in states]
        n_comms = ray.get(_n_distinct.remote(
            *[_n_distinct_part.remote(s) for s in states]))
        levels_info.append({"level": level, "V": cur.V, "P": cur.P,
                            "E": cur.sym_edges, "moves": moves,
                            "supersteps": steps, "communities": n_comms,
                            "t_moving": round(_time.perf_counter() - t0, 3)})

        if n_comms == cur.V or level == cfg.max_levels - 1:
            final_refs = comm_refs
            break

        t0 = _time.perf_counter()
        assigns, rq_refs = refine_level_lazy(cur, states, cfg.gamma)
        # agg counts ride in the move state (set at init, constant per level)
        aggs = [_get_agg.remote(s) for s in states]
        new_graph, lm = coarsen(cur, assigns, aggs)
        levels_info[-1]["t_refine_coarsen"] = round(
            _time.perf_counter() - t0, 3)
        if new_graph.V == cur.V:
            # refinement merged nothing: no further coarsening possible
            final_refs = comm_refs
            break
        init_comm = _maintain_p_init(lm, rq_refs)
        maps.append(lm)
        if checkpointer is not None:
            checkpointer.save_map(level, lm)
        aggs = new_graph.agg_refs
        cur = new_graph
    else:  # max_levels exhausted without break
        final_refs = [_get_comm.remote(s) for s in states]

    comp_refs = final_refs
    for lm in reversed(maps):
        comp_refs = propagate_level(lm, comp_refs)
    info = {"levels": levels_info,
            "num_communities": levels_info[-1]["communities"]}
    return comp_refs, info


def refine_level_lazy(cur, states, gamma):
    from leiden_cuda_ray.algorithms.refine import refine_level

    return refine_level(cur, states, gamma)
