"""Distributed local-moving phase (Leiden phase 1 / Louvain sweeps).

This is the BSP reformulation of the reference's parallel local moving
(`move_nodes_fast_kernel`, csrc/src/leiden_kernel.cu:27-169), with the
sequential queue semantics of custom_leiden.py:534-599 replaced — exactly as
the CUDA code does — by supersteps of:

 1. community totals   (groupby(community).sum — L7/A3 analogue)
 2. gather shuffle     (groupby(dst, src_community).sum(weight) — the
                        edge-parallel gather of leiden_kernel.cu:187-227)
 3. move selection     (objective delta, argmax per vertex; random-coloring
                        defer rule of leiden_kernel.cu:66-76 with curand
                        replaced by a deterministic hash priority)
 4. community claims   (the atomicCAS two-community try-locks of
                        leiden_kernel.cu:144-159 become a deterministic
                        per-community winner reduce: a move is applied iff it
                        wins BOTH its source and target community)
 5. apply + frontier   (apply_node_moves_kernel, leiden_kernel.cu:302-349:
                        movers deactivate, their out-of-community neighbors
                        reactivate)

Determinism: priorities are hash(vertex, superstep, seed); winners are
(delta desc, vertex asc); candidate ties break to the lowest community id —
so distributed runs with any partition count P produce identical results
(SURVEY.md §7.4).

Objectives (pluggable, §2.7 "user-extension surface"):
  kind="cpm": ΔH = (k_v→new − γ·a_v·A_new) − (k_v→old − γ·a_v·(A_old − a_v))
              (custom_leiden.py:262-280; identical to leiden_kernel.cu:135)
  kind="mod": ΔQ = (k_v→new − k_v→old)/m + k_v·(T_old − T_new − k_v)/(2m²)
              (algebraic reduction of move_modularity_change,
              custom_louvain.py:124-160 — the community sum_in terms cancel)
where k_v→C always counts the vertex's self-loop (custom_leiden.py:88-94).

Scale note (round 2): community totals are OWNER-SHARDED — wave 1 pushes
gather tuples plus totals contributions and (consumer, comm) requests, wave
2 owners merge their slice and reply with exactly the totals each consumer
asked about — so no task allocates an O(V) array at any partition count.
In fast mode the push for superstep s+1 is fused into the eval of s
(2 waves, 2P tasks per superstep) and up to 3 supersteps are pipelined.
When the stall guard detects a limit cycle, the level falls back to the
monotone lock semantics (run_local_moving lock_fallback).
"""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import (
    segmax_by_key,
    segsum_by_key,
    segsum_by_pair,
    shard_by_owner,
    vertex_priority,
)


@ray.remote
def init_move_state(csr, init_comm=None, agg=None):
    nv = csr["vhi"] - csr["vlo"]
    comm = (np.arange(csr["vlo"], csr["vhi"], dtype=np.int64)
            if init_comm is None else np.asarray(init_comm, np.int64))
    return {
        "comm": comm.copy(),
        "agg": (np.ones(nv, np.int64) if agg is None
                else np.asarray(agg, np.int64)),
        "active": np.ones(nv, bool),
    }


def _uniq_pairs(a: np.ndarray, b: np.ndarray):
    """Distinct (a, b) rows, sorted by (a, b). Vectorized (fused-key sort
    when the ranges allow; ids are nonnegative here)."""
    if len(a) == 0:
        return a, b
    bmax = int(b.max())
    amax = int(a.max())
    if a.min() >= 0 and b.min() >= 0 and amax < (1 << 62) // (bmax + 1):
        span = bmax + 1
        k = np.unique(a * span + b)
        return k // span, k % span
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.empty(len(a), bool)
    keep[0] = True
    np.logical_or(a[1:] != a[:-1], b[1:] != b[:-1], out=keep[1:])
    return a[keep], b[keep]


def _owner_arr(v, block, P):
    from leiden_cuda_ray.graph.csr import owner_of

    if P == 1:
        return np.zeros(len(v), np.int64)
    return owner_of(v, block, P)


def _push_pack_core(csr, state, block, P, pid, kind):
    """Fast-mode push kernel (pure function): gather tuples, totals
    contributions and requests, PACKED per owner so each partition's wave
    emits exactly P objects: pack[j] = (react_j, gather_j, contrib_j,
    request_j) — react is filled by the apply step (empty at bootstrap).
    The serve task for owner j and the eval task for consumer j are the
    same partition, so the packed object travels to one node only."""
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + csr["vlo"]
    dst = csr["indices"]
    comm = state["comm"]
    nonself = dst != src_g
    d, c, w = segsum_by_pair(dst[nonself], comm[src_slot][nonself],
                             csr["weights"][nonself])
    vals = (state["agg"].astype(np.float64) if kind == "cpm"
            else csr["deg_w"])
    tids, tsums = segsum_by_key(comm, vals)
    _, tcnts = segsum_by_key(comm, np.ones(len(comm), np.float64))
    cons = np.asarray(_owner_arr(d, block, P), np.int64)
    rq_comm = np.concatenate([c, comm])
    rq_cons = np.concatenate([cons, np.full(len(comm), pid, np.int64)])
    rq_comm, rq_cons = _uniq_pairs(rq_comm, rq_cons)
    g1 = shard_by_owner(d, block, P, c, w)
    t1 = shard_by_owner(tids, block, P, tsums, tcnts)
    t2 = shard_by_owner(rq_comm, block, P, rq_cons)
    empty_react = (np.empty(0, np.int64), np.empty(0, np.int64))
    return [(empty_react, g1[j], t1[j], t2[j]) for j in range(P)]


#: test override for the pack-group count (None = one group per node)
_FORCE_GROUPS: int | None = None


def _pack_groups(P: int) -> int:
    """Pack-group count G (transport granularity only — per-destination
    entries and all math are unchanged). Grouping folds the slices for
    `span = ceil(P/G)` destinations into ONE object, so a wave creates
    O(P·G) objects instead of O(P²): the object graph is the measured
    superstep floor (the G sweep at sf0.1/P=32: G=32 3.98s, G=16 3.03s,
    G=8 3.41s, G=1 5.91s — fat objects lose because every consumer
    deserializes all P entries). Default span=2 halves the per-wave
    object count for at most 2× pull waste when the paired destinations
    land on different nodes; G never drops below the cluster node count,
    so no node ever receives slices for a third node's partitions."""
    if _FORCE_GROUPS is not None:
        return max(1, min(P, _FORCE_GROUPS))
    try:
        n = max(1, sum(1 for x in ray.nodes() if x.get("Alive", False)))
    except Exception:
        n = 1
    return min(P, max(n, -(-P // 2)))


def _group(entries, P, G):
    """Per-destination entries [P] → G contiguous group tuples."""
    span = -(-P // G)
    return [tuple(entries[g * span:min((g + 1) * span, P)])
            for g in range(G)]


@ray.remote
def _push_pack(csr, state, block, P, pid, kind, G):
    """Bootstrap wave for the fast-mode loop (steady-state packs are
    produced inside _eval_apply_push). Returns G group objects."""
    groups = _group(_push_pack_core(csr, state, block, P, pid, kind), P, G)
    return tuple(groups) if G > 1 else groups[0]


@ray.remote
def _serve_totals(P, *shards):
    """Wave-2 totals owner: merge contribution shards into global totals
    for owned comms, answer each requester with (ids, vals, cnts) for the
    comms it asked about. Allocates O(owned comms), never O(V).

    shards[i] = (contrib (ids, sums, cnts), request (comm, consumer)) from
    origin partition i. Returns one reply per consumer partition."""
    return _serve_totals_core(P, shards)


@ray.remote
def _serve_packed(P, k, G, *pack_groups):
    """Fast-mode serve for owner k: pack_groups[i] = origin i's group
    object covering k; the (react, gather, contrib, request) entry for k
    sits at k % span. Reads contrib/request only. Returns G reply-group
    objects (replies for the consumers of each group)."""
    span = -(-P // G)
    ent = [pg[k % span] for pg in pack_groups]
    replies = _serve_totals_core(P, [(e[2], e[3]) for e in ent])
    if P == 1:
        replies = [replies]
    groups = _group(list(replies), P, G)
    return tuple(groups) if G > 1 else groups[0]


def _serve_totals_core(P, shards):
    contribs = [s[0] for s in shards]
    reqs = [s[1] for s in shards]
    ids = np.concatenate([s[0] for s in contribs])
    sums = np.concatenate([s[1] for s in contribs])
    cnts = np.concatenate([s[2] for s in contribs])
    # merge preserves per-comm addition order (stable sort over the
    # origin-ordered concat) — identical float sums to the dense path
    uids, usums = segsum_by_key(ids, sums)
    _, ucnts = segsum_by_key(ids, cnts)
    ucnts = ucnts.astype(np.int64)

    rc = np.concatenate([s[0] for s in reqs])
    rj = np.concatenate([s[1] for s in reqs])
    rc, rj = _uniq_pairs(rc, rj)
    pos = np.searchsorted(uids, rc)
    # every requested comm has >= 1 member, so it must have contributed
    assert len(uids) == 0 or (
        (pos < len(uids)).all() and (uids[pos] == rc).all()), \
        "totals request for a memberless community"
    order = np.argsort(rj, kind="stable")
    rj_s, rc_s, pos_s = rj[order], rc[order], pos[order]
    bounds = np.searchsorted(rj_s, np.arange(P + 1))
    out = []
    for j in range(P):
        sl = slice(bounds[j], bounds[j + 1])
        out.append((rc_s[sl], usums[pos_s[sl]], ucnts[pos_s[sl]]))
    if P == 1:
        return out[0]
    return tuple(out)


def _merge_replies(replies):
    """Per-owner reply shards → one sorted sparse lookup (ids, vals, cnts).

    Owners hold disjoint ascending comm ranges and each reply is sorted, so
    a plain concat in owner order is already globally sorted."""
    ids = np.concatenate([r[0] for r in replies]) if replies else \
        np.empty(0, np.int64)
    vals = np.concatenate([r[1] for r in replies]) if replies else \
        np.empty(0, np.float64)
    cnts = np.concatenate([r[2] for r in replies]) if replies else \
        np.empty(0, np.int64)
    return ids, vals, cnts


def _tot_get(tids, arr, q):
    """Sparse totals lookup (q must be present — guaranteed by requests)."""
    return arr[np.searchsorted(tids, q)]


def _eval_core(csr, state, totals, kind, param, superstep, seed, lock,
               shards):
    """Select the best positive-delta move per eligible vertex.

    Conflict avoidance:
    - lock=True: random-coloring defer (a vertex yields to any higher-
      priority active neighbor, leiden_kernel.cu:66-76); claims resolve the
      rest. Resting follows the reference's COMPLETE (Python) queue
      semantics rather than the CUDA visited-flags: every ACTIVE vertex is
      evaluated, and one with no positive-delta move leaves the frontier
      immediately — it re-enters only when a neighbor moves to a different
      community (custom_leiden.py:584-593 re-enqueues exactly those). The
      CUDA kernel instead keeps unvisited vertices active until their
      coloring turn (leiden_kernel.cu:54-76), which on dense coarse graphs
      drains the frontier at ~V/avg_degree per superstep — a cap-bound
      grind of full-edge gathers that moves almost nothing. Only
      color-ELIGIBLE vertices with positive moves emit claims; a positive
      but ineligible vertex stays active for its turn.
    - lock=False: direction gating — even supersteps only admit moves to a
      SMALLER community id, odd supersteps to a larger one. Adjacent
      simultaneous swap cycles (A→comm(B) while B→comm(A)) are impossible
      within a superstep, no priority exchange is needed, and roughly half
      of all desired moves proceed each round instead of one independent
      set. A vertex whose best move is gated stays active and retries next
      superstep. Deterministic for any P.

    Singleton-chase guard (lock=False): a singleton moving into another
    singleton is only admitted on DOWN steps, so singleton chains walk
    monotonically down the community-id order and must terminate — the
    classic parallel-Louvain limit cycle (A→{B} while B→{C} while C→…,
    alternating forever) is impossible.

    Returns (moves dict, rest mask). moves: v/old/new/delta arrays
    (v global); `rest` = vertices to deactivate after this superstep.

    totals: SPARSE sorted community-totals lookup (ids, vals, cnts)
    covering every community referenced by this partition's candidates and
    vertices — assembled from the owner-sharded request/reply exchange, so
    no O(V) array exists anywhere in the superstep when P > 1."""
    tids, tvals, tcnts = totals
    vlo = csr["vlo"]
    nv = csr["vhi"] - vlo
    comm = state["comm"]
    agg = state["agg"].astype(np.float64)
    active = state["active"]
    self_w = csr["self_w"]

    d = np.concatenate([s[0][0] for s in shards]) if shards else np.empty(0, np.int64)
    c = np.concatenate([s[0][1] for s in shards]) if shards else np.empty(0, np.int64)
    w = np.concatenate([s[0][2] for s in shards]) if shards else np.empty(0, np.float64)
    d, c, w = segsum_by_pair(d, c, w)

    if lock:
        d2 = np.concatenate([s[1][0] for s in shards]) if shards else \
            np.empty(0, np.int64)
        p2 = np.concatenate([s[1][1] for s in shards]) if shards else \
            np.empty(0, np.uint64)
        d2u, p2u = segmax_by_key(d2, p2)
        max_nbr_prio = np.zeros(nv, np.uint64)
        max_nbr_prio[d2u - vlo] = p2u
        own_prio = vertex_priority(
            np.arange(vlo, csr["vhi"], dtype=np.int64), superstep, seed)
        eligible = active & ~(max_nbr_prio > own_prio)
    else:
        eligible = active

    # k_v→old per vertex (self-loop always counted: custom_leiden.py:88-94)
    loc = d - vlo
    k_old = self_w.copy()
    own_rows = c == comm[loc]
    k_old[loc[own_rows]] += w[own_rows]

    cand = (~own_rows) & (active[loc] if lock else eligible[loc])
    dl = loc[cand]
    cc = c[cand]
    k_new = w[cand] + self_w[dl]
    a_v = agg[dl]
    val_cc = _tot_get(tids, tvals, cc)
    val_own = _tot_get(tids, tvals, comm[dl])
    if kind == "cpm":
        gamma = param
        delta = ((k_new - gamma * a_v * val_cc)
                 - (k_old[dl] - gamma * a_v * (val_own - a_v)))
    else:
        m = param
        k_v = csr["deg_w"][dl]
        delta = ((k_new - k_old[dl]) / m
                 + k_v * (val_own - val_cc - k_v)
                 / (2.0 * m * m))

    rest = active.copy() if lock else eligible.copy()
    if len(dl):
        positive = delta > 1e-15
        if not lock:
            down = cc < comm[dl]
            ss = ((_tot_get(tids, tcnts, cc) == 1)
                  & (_tot_get(tids, tcnts, comm[dl]) == 1))
            allowed = positive & np.where(
                superstep % 2 == 0, down, (~down) & ~ss)
            # gated-but-positive vertices must retry next superstep
            gated = np.zeros(nv, bool)
            gated[dl[positive & ~allowed]] = True
            rest &= ~gated
        else:
            # no-hope actives rest now (queue semantics); positive movers
            # either claim (eligible) or stay active for their turn
            haspos = np.zeros(nv, bool)
            haspos[dl[positive]] = True
            rest = active & ~haspos
            allowed = positive & eligible[dl]
        dl2, cc2, ds2 = dl[allowed], cc[allowed], delta[allowed]
        if len(dl2):
            order = np.lexsort((cc2, -ds2, dl2))
            dls, ccs, ds_ = dl2[order], cc2[order], ds2[order]
            first = np.empty(len(dls), bool)
            first[0] = True
            np.not_equal(dls[1:], dls[:-1], out=first[1:])
            mv_loc = dls[first]
            moves = {
                "v": mv_loc + vlo,
                "old": comm[mv_loc],
                "new": ccs[first],
                "delta": ds_[first],
            }
        else:
            moves = {"v": np.empty(0, np.int64),
                     "old": np.empty(0, np.int64),
                     "new": np.empty(0, np.int64),
                     "delta": np.empty(0, np.float64)}
    else:
        moves = {"v": np.empty(0, np.int64), "old": np.empty(0, np.int64),
                 "new": np.empty(0, np.int64),
                 "delta": np.empty(0, np.float64)}
    return moves, rest


def _eap_core(csr, state, kind, param, superstep, seed, block, P, pid,
              replies, reacts, statics):
    """Shared fast-mode kernel: absorb reactivations, evaluate, apply,
    push the next packs. statics[i] = (gather, contrib, request)."""
    totals = _merge_replies(replies)
    empty_prio = (np.empty(0, np.int64), np.empty(0, np.uint64))
    gshards = [(s[0], empty_prio) for s in statics]
    state = _absorb_core(state, csr["vlo"], reacts)
    moves, rest = _eval_core(csr, state, totals, kind, param, superstep,
                             seed, False, gshards)
    accepted = np.ones(len(moves["v"]), bool)
    new_state, moved, out_shards = _apply_core(
        csr, state, moves, rest, accepted, block, P)
    n_active = int(new_state["active"].sum())
    next_packs = _push_pack_core(csr, new_state, block, P, pid, kind)
    return new_state, moved, n_active, out_shards, next_packs


def _split_meta(moved, n_active, out_shards, next_packs, P):
    """Driver metadata for the frontier-sparse tail: per-destination
    reactivation counts and, per totals owner, WHICH consumers the next
    requests name (the exact serve-needed condition — requests are pushed
    on behalf of gather consumers, so a bare count per owner is not
    enough to decide whether a skipped consumer makes the serve idle)."""
    req_consumers = np.zeros((P, P), bool)
    for k in range(P):
        cons = next_packs[k][3][1]
        if len(cons):
            req_consumers[k][np.unique(cons)] = True
    return {"moved": moved, "active": n_active,
            "react_counts": np.array([len(s[0]) for s in out_shards],
                                     np.int64),
            "req_consumers": req_consumers}


@ray.remote
def _eval_apply_push(csr, state, kind, param, superstep, seed, block, P,
                     pid, G, *shards, split=False):
    """Fast-mode steady-state kernel: absorb the previous superstep's
    reactivations (riding inside the packs), evaluate, apply — then
    immediately compute the NEXT superstep's push pack from the new state,
    so a superstep is only TWO waves (serve totals → eval+apply+push).

    shards = (*reply groups [P: one per owner], *pack groups [P: one per
    origin]), each group object covering this pid (entry at pid % span);
    pack entries are (react, gather, contrib, request).
    Returns (new_state, moved, n_active, *next pack groups [G]).

    split=True is the dense→sparse transition (num_returns=2+P+G):
    returns (new_state, meta, *react_shards [P], *static groups [G]) —
    reacts separated per DESTINATION so the sparse tail can reuse a
    skipped partition's statics without re-delivering consumed
    reactivations (absorb re-activates, and the priority gating is
    superstep-parity-dependent, so a double absorb would fork the
    trajectory from the dense run)."""
    span = -(-P // G)
    off = pid % span
    replies = [rg[off] for rg in shards[:P]]
    packs = [pg[off] for pg in shards[P:]]
    new_state, moved, n_active, out_shards, next_packs = _eap_core(
        csr, state, kind, param, superstep, seed, block, P, pid,
        replies, [p[0] for p in packs], [p[1:] for p in packs])
    if split:
        meta = _split_meta(moved, n_active, out_shards, next_packs, P)
        sgroups = _group([p[1:] for p in next_packs], P, G)
        return (new_state, meta, *out_shards, *sgroups)
    out = [(out_shards[j], *next_packs[j][1:]) for j in range(P)]
    groups = _group(out, P, G)
    if G == 1:
        return new_state, moved, n_active, groups[0]
    return (new_state, moved, n_active, *groups)


@ray.remote
def _eval_apply_push_split(csr, state, kind, param, superstep, seed,
                           block, P, pid, G, *shards):
    """Sparse-tail steady-state kernel: identical math to
    _eval_apply_push, split transport. shards = (*reply groups [P],
    *react_shards [P] (per destination = this pid), *static groups [P:
    origin i's group covering pid]). Returns (new_state, meta,
    *react_shards [P], *static groups [G])."""
    span = -(-P // G)
    off = pid % span
    replies = [rg[off] for rg in shards[:P]]
    reacts = shards[P:2 * P]
    statics = [sg[off] for sg in shards[2 * P:]]
    new_state, moved, n_active, out_shards, next_packs = _eap_core(
        csr, state, kind, param, superstep, seed, block, P, pid,
        replies, reacts, statics)
    meta = _split_meta(moved, n_active, out_shards, next_packs, P)
    sgroups = _group([p[1:] for p in next_packs], P, G)
    return (new_state, meta, *out_shards, *sgroups)


@ray.remote
def _serve_static(P, k, G, *static_groups):
    """Sparse-tail serve for owner k: static_groups[i] = origin i's group
    covering k; entries are (gather, contrib, request). Returns G
    reply-group objects."""
    span = -(-P // G)
    ent = [sg[k % span] for sg in static_groups]
    replies = _serve_totals_core(P, [(e[1], e[2]) for e in ent])
    if P == 1:
        replies = [replies]
    groups = _group(list(replies), P, G)
    return tuple(groups) if G > 1 else groups[0]


@ray.remote
def _absorb_shards(state, vlo, *shards):
    """Absorb bare reactivation shards (sparse-tail stall handoff)."""
    return _absorb_core(state, vlo, shards)


def _lock_push_core(csr, state, block, P, pid, superstep, seed, kind,
                    react):
    """Lock-mode wave-A kernel (pure function): absorb the previous
    superstep's reactivations, then emit per-owner packs (gather,
    priority, contrib, request). Returns (absorbed_state, packs [P]).

    (A frontier-filtered variant — gather only for active destinations,
    value-identical — was measured SLOWER here: broadcasting P active-id
    lists each superstep plus the extra absorb wave cost more than the
    kernel it saved. Full-gather supersteps match the reference's own
    model: its edge-parallel kernel rescans every edge per superstep.)"""
    if react:
        state = _absorb_core(state, csr["vlo"], react)
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + csr["vlo"]
    dst = csr["indices"]
    comm = state["comm"]
    nonself = dst != src_g
    d, c, w = segsum_by_pair(dst[nonself], comm[src_slot][nonself],
                             csr["weights"][nonself])
    # coloring: max active-neighbor priority per dst
    act = nonself & state["active"][src_slot]
    prio = vertex_priority(src_g[act], superstep, seed)
    d2, p2 = segmax_by_key(dst[act], prio)
    vals = (state["agg"].astype(np.float64) if kind == "cpm"
            else csr["deg_w"])
    tids, tsums = segsum_by_key(comm, vals)
    _, tcnts = segsum_by_key(comm, np.ones(len(comm), np.float64))
    cons = np.asarray(_owner_arr(d, block, P), np.int64)
    rq_comm = np.concatenate([c, comm])
    rq_cons = np.concatenate([cons, np.full(len(comm), pid, np.int64)])
    rq_comm, rq_cons = _uniq_pairs(rq_comm, rq_cons)
    g1 = shard_by_owner(d, block, P, c, w)
    g2 = shard_by_owner(d2, block, P, p2)
    t1 = shard_by_owner(tids, block, P, tsums, tcnts)
    t2 = shard_by_owner(rq_comm, block, P, rq_cons)
    return state, [(g1[j], g2[j], t1[j], t2[j]) for j in range(P)]


@ray.remote
def _lock_push(csr, state, block, P, pid, superstep, seed, kind, *react):
    state, packs = _lock_push_core(csr, state, block, P, pid, superstep,
                                   seed, kind, react)
    if P == 1:
        return state, packs[0]
    return (state, *packs)


@ray.remote
def _serve_lock(P, *packs):
    return _serve_totals_core(P, [(p[2], p[3]) for p in packs])


@ray.remote
def _eval_claims(csr, state, kind, param, superstep, seed, block, P,
                 *shards):
    """Fused lock-mode eval: select moves AND emit the per-community claim
    shards in one task (the atomicCAS try-locks' claims).

    shards = (*totals replies [P], *packs [P]).
    Returns ((moves, eligible), *claim_shards [P])."""
    totals = _merge_replies(shards[:P])
    packs = shards[P:]
    gshards = [(p[0], p[1]) for p in packs]
    moves, eligible = _eval_core(csr, state, totals, kind, param,
                                 superstep, seed, True, gshards)
    c = np.concatenate([moves["old"], moves["new"]])
    v = np.concatenate([moves["v"], moves["v"]])
    delta = np.concatenate([moves["delta"], moves["delta"]])
    cshards = shard_by_owner(c, block, P, v, delta)
    if P == 1:
        return (moves, eligible), cshards[0]
    return ((moves, eligible), *cshards)


@ray.remote
def _resolve_claims(*origin_shards):
    out = _resolve_claims_core(origin_shards)
    return tuple(out) if len(origin_shards) > 1 else out[0]


def _resolve_claims_core(origin_shards):
    """Per-community winner: (delta desc, v asc). Returns per-origin
    acceptance bools aligned with each origin's shard row order."""
    cs, vs, ds, origin, row = [], [], [], [], []
    for i, (c, v, delta) in enumerate(origin_shards):
        cs.append(c)
        vs.append(v)
        ds.append(delta)
        origin.append(np.full(len(c), i, np.int64))
        row.append(np.arange(len(c), dtype=np.int64))
    c = np.concatenate(cs) if cs else np.empty(0, np.int64)
    if len(c) == 0:
        return [np.empty(0, bool) for _ in origin_shards]
    v = np.concatenate(vs)
    delta = np.concatenate(ds)
    order = np.lexsort((v, -delta, c))
    c_s, v_s = c[order], v[order]
    first = np.empty(len(c_s), bool)
    first[0] = True
    np.not_equal(c_s[1:], c_s[:-1], out=first[1:])
    win_c = c_s[first]
    win_v = v_s[first]
    pos = np.searchsorted(win_c, c)
    accepted = win_v[pos] == v
    out = []
    o = np.concatenate(origin)
    r = np.concatenate(row)
    for i, shard in enumerate(origin_shards):
        acc = np.empty(len(shard[0]), bool)
        sel = o == i
        acc[r[sel]] = accepted[sel]
        out.append(acc)
    return out


def _apply_core(csr, state, moves, eligible, accepted, block, P):
    """Apply accepted moves; emit frontier reactivation shards.

    Returns (new_state, moved_count, shards list)."""
    vlo = csr["vlo"]
    mv_loc = moves["v"] - vlo

    comm = state["comm"].copy()
    active = state["active"].copy()
    comm[mv_loc[accepted]] = moves["new"][accepted]
    # resting vertices deactivate; claim losers stay active to retry.
    # Accepted movers always rest — queue semantics in BOTH modes: a moved
    # vertex leaves the queue and re-enters only via neighbor reactivation
    # (custom_leiden.py:584-593), even if it still holds a direction-gated
    # positive candidate (fast mode) or lost a second claim (lock mode).
    active[eligible] = False
    active[mv_loc[~accepted]] = True
    active[mv_loc[accepted]] = False

    # frontier: neighbors of movers not in the mover's new community
    # (apply_node_moves_kernel, leiden_kernel.cu:340-347)
    if accepted.any():
        acc_loc = mv_loc[accepted]
        new_c = moves["new"][accepted]
        offs = csr["offsets"]
        starts = offs[acc_loc]
        lens = (offs[acc_loc + 1] - starts).astype(np.int64)
        total = int(lens.sum())
        slot_idx = (np.repeat(starts, lens)
                    + (np.arange(total, dtype=np.int64)
                       - np.repeat(np.cumsum(lens) - lens, lens)))
        dsts = csr["indices"][slot_idx]
        comms = np.repeat(new_c, lens)
        keep = dsts != np.repeat(acc_loc + vlo, lens)
        dsts, comms = dsts[keep], comms[keep]
    else:
        dsts = np.empty(0, np.int64)
        comms = np.empty(0, np.int64)

    new_state = {"comm": comm, "agg": state["agg"], "active": active}
    shards = shard_by_owner(dsts, block, P, comms)
    return new_state, int(accepted.sum()), shards


def _absorb_core(state, vlo, shards):
    """Apply reactivation shards to the active mask (returns new state)."""
    active = state["active"].copy()
    comm = state["comm"]
    for ids, comms in shards:
        if len(ids) == 0:
            continue
        loc = ids - vlo
        react = comm[loc] != comms
        active[loc[react]] = True
    return {"comm": comm, "agg": state["agg"], "active": active}


@ray.remote
def _apply_moves(csr, state, moves_eligible, block, P, *verdicts):
    """Apply claim-winning moves; emit frontier reactivations (lock mode).

    verdicts are variadic (Ray only resolves refs in direct args).
    Returns (new_state, moved_count, *reactivation_shards)."""
    moves, eligible = moves_eligible
    n_mv = len(moves["v"])

    if not verdicts:  # lock-free mode: every proposed move is applied
        accepted = np.ones(n_mv, bool)
    elif n_mv:
        # reassemble acceptance from per-owner verdicts (shard order is the
        # deterministic stable sort _claim_push used)
        from leiden_cuda_ray.graph.csr import owner_of

        c_all = np.concatenate([moves["old"], moves["new"]])
        acc_all = np.empty(2 * n_mv, bool)
        owner = (owner_of(c_all, block, P) if P > 1
                 else np.zeros(2 * n_mv, np.int64))
        order = np.argsort(owner, kind="stable")
        flat = (np.concatenate(verdicts) if P > 1
                else np.asarray(verdicts[0]))
        acc_all[order] = flat
        accepted = acc_all[:n_mv] & acc_all[n_mv:]
    else:
        accepted = np.empty(0, bool)

    new_state, moved, shards = _apply_core(
        csr, state, moves, eligible, accepted, block, P)
    n_active = int(new_state["active"].sum())
    if P == 1:
        return new_state, moved, n_active, shards[0]
    return (new_state, moved, n_active, *shards)


@ray.remote
def _absorb(state, vlo, *shards):
    new_state = _absorb_core(state, vlo, shards)
    return new_state, int(new_state["active"].sum())


@ray.remote
def _absorb_packed(state, vlo, off, *pack_groups):
    """Absorb the reactivations riding in the pack groups covering this
    partition (checkpoint-time state normalization)."""
    return _absorb_core(state, vlo, [pg[off][0] for pg in pack_groups])


def run_local_moving(graph: Graph, states: list, kind: str, param: float,
                     seed: int, max_supersteps: int,
                     start_step: int = 1, total_moves: int = 0,
                     ckpt_cb=None, lock_communities: bool = False,
                     resume_ctl: dict | None = None,
                     lock_fallback: bool = True):
    """Run the local-moving loop to frontier convergence.

    states: per-partition move-state refs (init_move_state).
    start_step/total_moves allow resuming mid-level from a checkpoint;
    ckpt_cb(step, states, metrics) is called after each applied superstep.
    resume_ctl: loop-control state (prev_moved / best_active / since_best)
    saved in the checkpoint metrics — restoring it makes a crash+resume
    take the stall-guard decisions at exactly the supersteps an
    uninterrupted run would (the bit-identical-resume guarantee).

    lock_communities=True runs the monotone reference semantics. Its
    EXECUTION is size-gated: graphs fitting one worker
    (V <= LOCK_DRAIN_V_MAX) drain in-process with the reference's
    sequential queue algorithm (_seq_queue_core, custom_leiden.py:534-599
    — exact convergence, oracle-verified move-for-move); larger graphs
    run the CUDA reference's per-community try-locks
    (leiden_kernel.cu:144-159) as a distributed deterministic claims
    reduce. The default False skips the claims exchange entirely: in BSP
    the community totals are recomputed from scratch next superstep, so
    the lock's consistency role disappears and the hash-priority coloring
    alone prevents adjacent conflicting moves — communities can absorb
    many vertices per superstep, cutting superstep counts by an order of
    magnitude on large groups. All modes are deterministic for any
    partition count P.

    Stall guard: limit cycles of the simultaneous-move dynamics (periodic
    move patterns that never converge) are detected by the frontier size —
    if `active` hasn't reached a new minimum for `stall_window` supersteps,
    the level is declared converged-enough and the loop breaks
    (deterministic: depends only on the metric stream). The CUDA reference
    bounds the same risk with a hard 10-superstep cap
    (leiden_kernel.cu:1211-1213).

    Returns (states, total_moves, supersteps)."""
    ctl = resume_ctl or {}
    if not lock_communities:
        states, total_moves, step, stalled = _run_fast(
            graph, states, kind, param, seed, max_supersteps,
            start_step, total_moves, ckpt_cb, ctl)
        if stalled and lock_fallback and step < max_supersteps:
            # Stall-guard fallback (quality guard, see LeidenConfig): the
            # fast mode detected a limit cycle — finish the level under the
            # monotone per-community try-lock semantics instead of leaving
            # it unconverged. Deterministic: the switch point depends only
            # on the metric stream; the phase is recorded in checkpoint
            # metrics so resume re-enters the right loop.
            return run_local_moving(
                graph, states, kind, param, seed, max_supersteps,
                start_step=step + 1, total_moves=total_moves,
                ckpt_cb=ckpt_cb, lock_communities=True)
        return states, total_moves, step
    P = graph.P
    if graph.V <= LOCK_DRAIN_V_MAX:
        # Graphs that fit one worker run the reference's sequential queue
        # algorithm in one task: exact monotone convergence instead of
        # ~100 colored-BSP supersteps. The drain is a function of the
        # graph alone (any P), and resume needs no mid-level state: one
        # drain-end checkpoint is published; a crash mid-drain resumes
        # from the pre-drain checkpoint and re-drains the identical state
        # to the identical fixpoint.
        merged, moved_ref = _run_seq_level_task.remote(
            kind, param, *graph.parts, *states)
        moved = int(ray.get(moved_ref))
        total_moves += moved
        step = start_step
        if P == 1:
            out_states = [merged]
        else:
            out_states = [_slice_state.remote(merged, lo, hi)
                          for lo, hi in graph.ranges()]
        if ckpt_cb is not None:
            ckpt_cb(step, out_states,
                    {"moves": moved, "active": 0,
                     "total_moves": total_moves, "best_active": 0,
                     "since_best": 0, "phase": "lock"})
        return out_states, total_moves, step
    if P == 1 and ckpt_cb is None and not ctl:
        # whole-level in-process lock loop (bit-identical, see
        # _run_lock_level_task) — the niche above the drain cutover:
        # single-partition graphs with V > LOCK_DRAIN_V_MAX (super-sparse
        # giants); checkpointed/resumed levels keep the distributed path
        # so the saved state sequence is unchanged
        state, tot, step = _run_lock_level_task.remote(
            graph.parts[0], states[0], kind, param, seed, max_supersteps,
            start_step, total_moves)
        tot, step = ray.get([tot, step])
        return [state], int(tot), int(step)
    step = start_step - 1
    stall_window = 8
    best_active = ctl.get("best_active")
    since_best = ctl.get("since_best", 0)
    if best_active is not None and since_best >= stall_window:
        # resumed exactly at the stall step: return without another wave
        return states, total_moves, step
    # No speculation here (unlike _run_fast): lock supersteps are
    # kernel-heavy full-gather waves, and measured end-to-end the wasted
    # speculative work past each level's break point COSTS more than the
    # hidden driver latency saves (90.7s vs 75.2s at sf0.1). The deque
    # structure is kept so the knob is one constant.
    lookahead = 0

    def _submit_lock(step_i, cur_states, cur_react):
        # wave A: absorb pending reactivations + emit packs
        pushed = [
            list(_lock_push.options(num_returns=1 + P).remote(
                graph.parts[i], cur_states[i], graph.block, P, i, step_i,
                seed, kind, *cur_react[i]))
            for i in range(P)
        ]
        new_states = [pushed[i][0] for i in range(P)]
        packs = [[pushed[i][1 + j] for i in range(P)] for j in range(P)]
        # wave B: owner-sharded totals serve
        serves = [
            _serve_lock.options(num_returns=P if P > 1 else 1).remote(
                P, *packs[k])
            for k in range(P)
        ]
        if P == 1:
            replies = [[serves[0]]]
        else:
            replies = [[serves[k][j] for k in range(P)] for j in range(P)]
        # wave C: eval + claim emission (fused)
        evals = [
            list(_eval_claims.options(num_returns=1 + P).remote(
                graph.parts[j], new_states[j], kind, param, step_i, seed,
                graph.block, P, *replies[j], *packs[j]))
            for j in range(P)
        ]
        moves_refs = [evals[j][0] for j in range(P)]
        cshards = [[evals[i][1 + k] for i in range(P)] for k in range(P)]
        # wave D: per-community claim winners
        verdicts = [
            _resolve_claims.options(
                num_returns=P if P > 1 else 1).remote(*cshards[k])
            for k in range(P)
        ]
        if P > 1:
            verd_lists = [[verdicts[k][i] for k in range(P)]
                          for i in range(P)]
        else:
            verd_lists = [[verdicts[0]]]
        # wave E: apply winning moves (reactivations carried to next A)
        applied = [
            list(_apply_moves.options(num_returns=3 + P).remote(
                graph.parts[i], new_states[i], moves_refs[i],
                graph.block, P, *verd_lists[i]))
            for i in range(P)
        ]
        out_states = [a[0] for a in applied]
        moved_refs = [a[1] for a in applied]
        act_refs = [a[2] for a in applied]
        new_react = [[applied[i][3 + j] for i in range(P)]
                     for j in range(P)]
        return out_states, new_react, moved_refs, act_refs

    from collections import deque

    pending: deque = deque()
    submit_step = start_step - 1
    sub_states = states
    sub_react: list[list] = [[] for _ in range(P)]
    while True:
        while (len(pending) <= lookahead
               and submit_step < max_supersteps):
            submit_step += 1
            sub_states, sub_react, moved_refs, act_refs = _submit_lock(
                submit_step, sub_states, sub_react)
            pending.append((submit_step, sub_states, sub_react,
                            moved_refs, act_refs))
        if not pending:
            break
        step, states, react, moved_refs, act_refs = pending.popleft()
        moved = sum(ray.get(moved_refs))
        n_active = sum(ray.get(act_refs))
        total_moves += moved
        # stall-guard bookkeeping, computed up-front so the checkpoint can
        # persist the exact loop-control state a resume must restore
        if best_active is None or n_active < best_active:
            next_best, next_since = n_active, 0
        else:
            next_best, next_since = best_active, since_best + 1
        if ckpt_cb is not None:
            absorbed = [
                _absorb.options(num_returns=2).remote(
                    states[j], graph.ranges()[j][0], *react[j])
                for j in range(P)
            ]
            states = [a[0] for a in absorbed]
            react = [[] for _ in range(P)]
            sub_states, sub_react = states, react
            ckpt_cb(step, states, {"moves": moved, "active": n_active,
                                   "total_moves": total_moves,
                                   "best_active": next_best,
                                   "since_best": next_since,
                                   "phase": "lock"})
        # moved == 0 => no new reactivations; the previous superstep's
        # were absorbed in this superstep's push — a zero frontier is final
        if moved == 0 and n_active == 0:
            break
        best_active, since_best = next_best, next_since
        if since_best >= stall_window:
            break
    return states, total_moves, step


def _gather_ctx(csr):
    """Per-level dst index for frontier-filtered in-process gathers.

    One stable argsort by dst (over non-self rows) lets every later
    superstep gather ONLY the rows whose destination is still active, in
    an order that preserves the src-major sequence within each (dst, comm)
    group — so segsum_by_pair's stable grouping adds the same floats in
    the same order as a full gather, and the sums are bit-identical."""
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + csr["vlo"]
    dst = csr["indices"]
    nonself = dst != src_g
    dstf = dst[nonself]
    order = np.argsort(dstf, kind="stable")
    return {"dstf": dstf, "srcf": src_slot[nonself],
            "src_gf": src_g[nonself], "wf": csr["weights"][nonself],
            "order": order, "dst_sorted": dstf[order]}


def _frontier_rows(ctx, active_ids):
    """Row indices (into the nonself-filtered arrays) whose dst is active,
    ascending dst then original slot order; None when a full gather is
    cheaper (frontier covers more than ~1/3 of the edges)."""
    lo = np.searchsorted(ctx["dst_sorted"], active_ids, side="left")
    hi = np.searchsorted(ctx["dst_sorted"], active_ids, side="right")
    lens = hi - lo
    total = int(lens.sum())
    if total * 3 >= len(ctx["dstf"]):
        return None
    if total == 0:
        return np.empty(0, np.int64)
    out = (np.repeat(lo, lens)
           + (np.arange(total, dtype=np.int64)
              - np.repeat(np.cumsum(lens) - lens, lens)))
    return ctx["order"][out]


def _level_gather(ctx, comm, active, with_prio, superstep, seed):
    """(d, c, w)[, (d2, p2)] for the in-process level loops: full-edge or
    frontier-filtered, value-identical either way."""
    rows = _frontier_rows(ctx, np.flatnonzero(active))
    if rows is None:
        d, c, w = segsum_by_pair(ctx["dstf"], comm[ctx["srcf"]], ctx["wf"])
        if not with_prio:
            return d, c, w, None, None
        act = active[ctx["srcf"]]
        prio = vertex_priority(ctx["src_gf"][act], superstep, seed)
        d2, p2 = segmax_by_key(ctx["dstf"][act], prio)
        return d, c, w, d2, p2
    d, c, w = segsum_by_pair(ctx["dstf"][rows], comm[ctx["srcf"][rows]],
                             ctx["wf"][rows])
    if not with_prio:
        return d, c, w, None, None
    act = active[ctx["srcf"][rows]]
    prio = vertex_priority(ctx["src_gf"][rows][act], superstep, seed)
    d2, p2 = segmax_by_key(ctx["dstf"][rows][act], prio)
    return d, c, w, d2, p2


# ------------------------------------------------- sequential drain ----

# Graphs at or below this vertex count skip fast mode entirely and run
# local moving as the reference's sequential queue algorithm (matches
# coarsen's P=1 collapse threshold, so every coarse Leiden level drains).
SEQ_V_MAX = 32_768

# Lock-mode EXECUTION strategy cutover: at or below this vertex count the
# lock phase (stall fallback or explicit lock_communities) runs as the
# in-process sequential drain — one task holding the merged graph
# (~1.5 GB at V=1M with E~60M). Above it, the distributed colored-BSP
# claims loop runs: at 100 TB scale V >> this and the drain never applies.
# Module attribute (read at call time) so tests can force the distributed
# path on small fixtures.
LOCK_DRAIN_V_MAX = 1 << 20


def _seq_queue_core(offsets, indices, weights, self_w, deg_w, comm, vals,
                    active, kind, param):
    """The reference's COMPLETE sequential queue local moving
    (custom_leiden.py:534-599) with the SURVEY §7.4 determinization: FIFO
    queue seeded with the active vertices in ascending id, greedy argmax
    community choice (the lowest community id among candidates within
    1e-15 of the max — the oracle's ascending scan), and a mover
    re-enqueuing its neighbors outside its new community in
    sorted-adjacency order. EXACT: drains to a state where no
    single-vertex move improves the objective — no superstep cap, no
    limit cycles, no stall guard. Same ΔCPM/Δmod formulas as _eval_core
    (leiden_kernel.cu:135; self-loop counted in k_v→C per
    custom_leiden.py:88-94).

    In-process only (V <= SEQ_V_MAX): the dense `tot` array is O(V) by
    design here — at most 32k entries inside a single task, never
    broadcast. comm/active are modified in place; vals = agg counts (CPM)
    or weighted degree (modularity); param = gamma or m.
    Returns the number of applied moves."""
    from collections import deque

    V = len(comm)
    tot = np.zeros(V, np.float64)
    np.add.at(tot, comm, vals)
    q = deque(np.flatnonzero(active).tolist())
    in_q = active.copy()
    moved = 0
    is_cpm = kind == "cpm"
    while q:
        v = q.popleft()
        in_q[v] = False
        active[v] = False
        lo, hi = offsets[v], offsets[v + 1]
        nbrs = indices[lo:hi]
        nw = weights[lo:hi]
        ns = nbrs != v
        if not ns.all():
            nbrs, nw = nbrs[ns], nw[ns]
        if not len(nbrs):
            continue
        nc = comm[nbrs]
        cids, inv = np.unique(nc, return_inverse=True)
        ks = np.bincount(inv, weights=nw)
        old = comm[v]
        sw = self_w[v]
        i_old = int(np.searchsorted(cids, old))
        has_old = i_old < len(cids) and cids[i_old] == old
        k_old = sw + (ks[i_old] if has_old else 0.0)
        k_new = ks + sw
        a_v = vals[v]
        if is_cpm:
            delta = ((k_new - param * a_v * tot[cids])
                     - (k_old - param * a_v * (tot[old] - a_v)))
        else:
            delta = ((k_new - k_old) / param
                     + a_v * (tot[old] - tot[cids] - a_v)
                     / (2.0 * param * param))
        if has_old:
            delta[i_old] = -np.inf
        # Reference tie rule (custom_leiden.py:428-450 determinized):
        # ascending scan updating on `d > best + 1e-15`. Equivalent here:
        # among the near-max set run the same scan (it keeps the lowest
        # community id across mathematically-equal deltas, which land
        # ~ulp apart in float; distinct ones differ by >> 1e-15). NB the
        # subtraction M - 1e-15 rounds back to M once ulp(M)/2 > 1e-15,
        # making the mask empty — fall back to the exact-max set, which
        # is what the oracle's scan degrades to at that magnitude.
        M = delta.max()
        if not (M > 1e-15):
            continue
        sel = np.flatnonzero(delta > M - 1e-15)
        if len(sel) == 0:
            sel = np.flatnonzero(delta == M)
        bi = int(sel[0])
        bd = delta[bi]
        for j in sel[1:]:
            dj = delta[j]
            if dj > bd + 1e-15:
                bd = dj
                bi = int(j)
        best = int(cids[bi])
        tot[old] -= a_v
        tot[best] += a_v
        comm[v] = best
        moved += 1
        wake = nbrs[(nc != best) & ~in_q[nbrs]]
        if len(wake):
            in_q[wake] = True
            active[wake] = True
            q.extend(wake.tolist())
    return moved


@ray.remote(num_returns=2)
def _run_seq_level_task(kind, param, *parts_and_states):
    """Whole-graph sequential drain in ONE task (V <= SEQ_V_MAX).

    Merges the contiguous partition CSRs/states (partitions own ascending
    [vlo, vhi) ranges covering [0, V)), runs _seq_queue_core, returns the
    merged final state + applied move count. The merge makes the result a
    function of the GRAPH alone, so it is bit-identical at every partition
    count — the cross-P determinism invariant the colored-BSP path keeps."""
    P = len(parts_and_states) // 2
    csrs = parts_and_states[:P]
    sts = parts_and_states[P:]
    indices = np.concatenate([c["indices"] for c in csrs])
    weights = np.concatenate([c["weights"] for c in csrs])
    offs = [np.asarray(csrs[0]["offsets"])]
    shift = len(csrs[0]["indices"])
    for c in csrs[1:]:
        offs.append(np.asarray(c["offsets"][1:]) + shift)
        shift += len(c["indices"])
    offsets = np.concatenate(offs)
    self_w = np.concatenate([c["self_w"] for c in csrs])
    deg_w = np.concatenate([c["deg_w"] for c in csrs])
    comm = np.concatenate([np.asarray(s["comm"]) for s in sts])
    agg = np.concatenate([np.asarray(s["agg"]) for s in sts])
    active = np.concatenate([np.asarray(s["active"]) for s in sts])
    vals = agg.astype(np.float64) if kind == "cpm" else deg_w
    moved = _seq_queue_core(offsets, indices, weights, self_w, deg_w,
                            comm, vals, active, kind, param)
    return {"comm": comm, "agg": agg, "active": active}, moved


@ray.remote
def _slice_state(state, lo, hi):
    return {"comm": state["comm"][lo:hi], "agg": state["agg"][lo:hi],
            "active": state["active"][lo:hi]}


@ray.remote(num_returns=3)
def _run_lock_level_task(csr, state, kind, param, seed, max_supersteps,
                         start_step, total_moves):
    """Whole-level LOCK-mode loop for a single-partition graph in ONE task.

    Same kernel sequence as the distributed lock loop (push → serve →
    eval+claims → resolve → apply) via the shared _core kernels, so the
    metric stream, every termination decision and the final state are
    bit-identical to the distributed path at P=1. Two in-process-only
    shortcuts (both value-identical): the totals request/serve exchange
    collapses to passing the full sorted totals straight to _eval_core,
    and after the first supersteps the edge gather is frontier-filtered
    through a per-level dst index (_gather_ctx) — lock tails touch a tiny
    frontier, so full O(E) rescans per superstep are pure waste."""
    assert csr["vlo"] == 0
    step = start_step - 1
    stall_window = 8
    best_active = None
    since_best = 0
    react: list = []
    ctx = _gather_ctx(csr)
    for step in range(start_step, max_supersteps + 1):
        if react:
            state = _absorb_core(state, 0, react)
        comm = state["comm"]
        d, c, w, d2, p2 = _level_gather(ctx, comm, state["active"], True,
                                        step, seed)
        vals = (state["agg"].astype(np.float64) if kind == "cpm"
                else csr["deg_w"])
        tids, tsums = segsum_by_key(comm, vals)
        _, tcnts = segsum_by_key(comm, np.ones(len(comm), np.float64))
        totals = (tids, tsums, tcnts.astype(np.int64))
        moves, eligible = _eval_core(csr, state, totals, kind, param,
                                     step, seed, True, [((d, c, w),
                                                         (d2, p2))])
        n_mv = len(moves["v"])
        cc = np.concatenate([moves["old"], moves["new"]])
        vv = np.concatenate([moves["v"], moves["v"]])
        delta = np.concatenate([moves["delta"], moves["delta"]])
        acc_all = _resolve_claims_core([(cc, vv, delta)])[0]
        accepted = (acc_all[:n_mv] & acc_all[n_mv:]) if n_mv else \
            np.empty(0, bool)
        state, moved, react = _apply_core(csr, state, moves, eligible,
                                          accepted, 1, 1)
        n_active = int(state["active"].sum())
        total_moves += moved
        # identical bookkeeping order to the distributed lock loop
        if best_active is None or n_active < best_active:
            next_best, next_since = n_active, 0
        else:
            next_best, next_since = best_active, since_best + 1
        if moved == 0 and n_active == 0:
            break
        best_active, since_best = next_best, next_since
        if since_best >= stall_window:
            break
    return state, total_moves, step


@ray.remote(num_returns=4)
def _run_level_task(csr, state, kind, param, seed, max_supersteps,
                    start_step, total_moves):
    """Whole-level loop for a single-partition graph in ONE task.

    Coarse Leiden/Louvain levels shrink to a few thousand vertices; running
    their supersteps as distributed waves is pure scheduling latency. This
    executes the identical fast-mode control flow (same kernels, same
    metric stream, same termination decisions as _run_fast with P=1) fully
    in-process, so results are bit-identical to the distributed path."""
    V = csr["vhi"]
    assert csr["vlo"] == 0
    step = start_step - 1
    stall_window = 8
    best_active = None
    since_best = 0
    prev_moved = None
    stalled = False
    ctx = _gather_ctx(csr)
    for step in range(start_step, max_supersteps + 1):
        vals = (state["agg"].astype(np.float64) if kind == "cpm"
                else csr["deg_w"])
        tids, tvals = segsum_by_key(state["comm"], vals)
        _, tcnts = segsum_by_key(state["comm"],
                                 np.ones(len(state["comm"]), np.float64))
        totals = (tids, tvals, tcnts.astype(np.int64))

        d, c, w, _, _ = _level_gather(ctx, state["comm"], state["active"],
                                      False, step, seed)
        gshard = ((d, c, w), (np.empty(0, np.int64),
                              np.empty(0, np.uint64)))
        moves, rest = _eval_core(csr, state, totals, kind, param,
                                 step, seed, False, (gshard,))
        accepted = np.ones(len(moves["v"]), bool)
        state, moved, shards = _apply_core(csr, state, moves, rest,
                                           accepted, 1, 1)
        n_active = int(state["active"].sum())  # pre-absorb, as _run_fast
        state = _absorb_core(state, 0, shards)
        total_moves += moved
        if moved == 0 and prev_moved == 0:
            break
        prev_moved = moved
        # moved == 0 => no new reactivations, and last step's pending ones
        # were absorbed before this eval: a zero frontier is final
        if moved == 0 and n_active == 0:
            break
        if best_active is None or n_active < best_active:
            best_active = n_active
            since_best = 0
        else:
            since_best += 1
            if since_best >= stall_window:
                stalled = True
                break
    return state, total_moves, step, stalled


def _run_fast(graph: Graph, states: list, kind: str, param: float,
              seed: int, max_supersteps: int, start_step: int,
              total_moves: int, ckpt_cb, ctl: dict | None = None):
    """Fast-mode loop: two waves per superstep (serve totals →
    eval+apply+push-next); reactivation shards ride inside the packs into
    the NEXT superstep's kernel instead of an absorb wave. Termination: two
    consecutive zero-move supersteps (both gating parities admitted nothing
    and no reactivations are pending) or the stall guard on the post-apply
    active count (returns stalled=True so the caller can fall back to lock
    mode). With a checkpoint callback an absorb normalizes the saved state
    each superstep so resume sees no pending shards; the metric stream (and
    therefore every control-flow decision) is identical with and without
    checkpointing."""
    ctl = ctl or {}
    P = graph.P
    if P == 1 and ckpt_cb is None and not ctl:
        state, tot, step, stalled = _run_level_task.remote(
            graph.parts[0], states[0], kind, param, seed, max_supersteps,
            start_step, total_moves)
        tot, step, stalled = ray.get([tot, step, stalled])
        return [state], int(tot), int(step), bool(stalled)
    step = start_step - 1
    stall_window = 8
    best_active = ctl.get("best_active")
    since_best = ctl.get("since_best", 0)
    prev_moved = ctl.get("prev_moved")
    if best_active is not None and since_best >= stall_window:
        # resumed exactly at the stall step: the uninterrupted run broke
        # before applying another superstep — do the same
        return states, total_moves, start_step - 1, True

    # Pipelined submission: up to `lookahead` supersteps are in flight
    # before the driver reads the metrics that decide termination. The DAG
    # chains through immutable state refs, so speculative supersteps past
    # the break point are simply discarded — the metric stream and every
    # control decision are identical to fully synchronous execution, the
    # driver's per-superstep ray.get latency just stops serializing the
    # waves. Checkpointing runs synchronously (lookahead=0) so the saved
    # state sequence is unchanged.
    lookahead = 0 if ckpt_cb is not None else 3

    # pack-group transport: packs[i] = list of G group refs from origin i
    # (group g covers destinations [g*span, (g+1)*span))
    G = _pack_groups(P)
    span = -(-P // G)

    def _bootstrap_packs(cur_states):
        packs = []
        for i in range(P):
            r = _push_pack.options(num_returns=G if G > 1 else 1).remote(
                graph.parts[i], cur_states[i], graph.block, P, i, kind, G)
            packs.append(list(r) if G > 1 else [r])
        return packs

    def _submit(step_i, cur_states, cur_packs):
        serves = [
            _serve_packed.options(num_returns=G if G > 1 else 1).remote(
                P, k, G, *[cur_packs[i][k // span] for i in range(P)])
            for k in range(P)
        ]
        sgroups = [list(s) if G > 1 else [s] for s in serves]
        outs = [
            _eval_apply_push.options(num_returns=3 + G).remote(
                graph.parts[j], cur_states[j], kind, param, step_i,
                seed, graph.block, P, j, G,
                *[sgroups[k][j // span] for k in range(P)],
                *[cur_packs[i][j // span] for i in range(P)])
            for j in range(P)
        ]
        new_states = [o[0] for o in outs]
        new_packs = [[outs[i][3 + g] for g in range(G)] for i in range(P)]
        moved_refs = [o[1] for o in outs]
        act_refs = [o[2] for o in outs]
        return new_states, new_packs, moved_refs, act_refs

    from collections import deque

    pending: deque = deque()
    submit_step = start_step - 1
    sub_states = states
    sub_packs = _bootstrap_packs(states)
    stalled = False
    terminated = False
    # frontier-sparse handoff: once moved AND active collapse below the
    # cut, stop pipelining dense full-width waves and let the sparse tail
    # submit only the partitions that still have work (ckpt runs keep the
    # dense loop: the saved per-superstep state sequence must not change)
    go_sparse = False
    sparse_cut = (max(32, graph.V // SPARSE_CUT_DIV)
                  if SPARSE_CUT_DIV else -1)  # 0 disables (A/B testing)

    while True:
        while (not go_sparse and len(pending) <= lookahead
               and submit_step < max_supersteps):
            submit_step += 1
            sub_states, sub_packs, moved_refs, act_refs = \
                _submit(submit_step, sub_states, sub_packs)
            pending.append((submit_step, sub_states, sub_packs,
                            moved_refs, act_refs))
        if not pending:
            break
        step, states, packs, moved_refs, act_refs = pending.popleft()
        moved = sum(ray.get(moved_refs))
        n_active = sum(ray.get(act_refs))
        total_moves += moved

        # stall-guard bookkeeping, computed up-front so the checkpoint can
        # persist the exact loop-control state a resume must restore
        if best_active is None or n_active < best_active:
            next_best, next_since = n_active, 0
        else:
            next_best, next_since = best_active, since_best + 1

        if ckpt_cb is not None:
            # normalize the saved state: absorb the pending reactivations
            # riding in the packs (the next eval re-absorbs them — a no-op,
            # absorb is idempotent for an unchanged community assignment)
            states = [
                _absorb_packed.remote(states[j], graph.ranges()[j][0],
                                      j % span,
                                      *[packs[i][j // span]
                                        for i in range(P)])
                for j in range(P)
            ]
            sub_states = states
            ckpt_cb(step, states, {"moves": moved, "active": n_active,
                                   "total_moves": total_moves,
                                   "prev_moved": moved,
                                   "best_active": next_best,
                                   "since_best": next_since,
                                   "phase": "fast"})

        if moved == 0 and prev_moved == 0:
            terminated = True
            break
        prev_moved = moved
        # moved == 0 => no new reactivations, and last step's pending ones
        # were absorbed before this eval: a zero frontier is final
        if moved == 0 and n_active == 0:
            terminated = True
            break
        best_active, since_best = next_best, next_since
        if since_best >= stall_window:
            stalled = True
            if ckpt_cb is None:
                # the lock-fallback phase reads `active`, so the pending
                # reactivations riding in the packs must be absorbed at the
                # handoff (the ckpt branch already normalized states above)
                states = [
                    _absorb_packed.remote(states[j], graph.ranges()[j][0],
                                          j % span,
                                          *[packs[i][j // span]
                                            for i in range(P)])
                    for j in range(P)
                ]
            break
        if (not go_sparse and ckpt_cb is None and P > 1
                and moved <= sparse_cut and n_active <= sparse_cut):
            go_sparse = True
    if (go_sparse and not terminated and not stalled
            and step < max_supersteps):
        return _run_sparse_tail(graph, states, packs, kind, param, seed,
                                max_supersteps, step, total_moves,
                                prev_moved, best_active, since_best, G)
    return states, total_moves, step, stalled


#: frontier-sparse switch: hand the fast loop to the sparse tail once
#: moved and active both fall to max(32, V // SPARSE_CUT_DIV)
SPARSE_CUT_DIV = 128

#: when a probe/test sets this to a list, the sparse tail appends the
#: wave width (number of eval tasks submitted) of every superstep it
#: runs — evidence that waves narrow with the frontier
SPARSE_WAVE_LOG: list | None = None


def _run_sparse_tail(graph, states, packs, kind, param, seed,
                     max_supersteps, step, total_moves, prev_moved,
                     best_active, since_best, G):
    """Frontier-sparse synchronous tail: once the frontier collapses,
    supersteps stop paying for empty partitions. Each superstep submits
    eval tasks ONLY for partitions with active vertices or pending
    incoming reactivations, and serve tasks ONLY for owners whose current
    requests name a running consumer. Skipped partitions' static packs
    (gather/contrib/request — pure functions of their unchanged state)
    are reused by reference; reactivation shards travel as separate refs
    so a consumed react is never delivered twice (absorb re-activates,
    and move gating is superstep-parity-dependent, so a double absorb
    would fork the trajectory from the dense run).

    The metric stream (moved/active per superstep) is exactly the dense
    loop's — a skipped partition would compute moved=0, keep active=0 and
    emit identical packs — so termination, stall decisions, superstep
    counts and the final state are bit-identical at any P; waves just
    narrow with the frontier. Returns (states, total_moves, step,
    stalled)."""
    P = graph.P
    # G is handed down from the dense loop that built `packs`: recomputing
    # it here reads live ray.nodes(), and a node-count change between the
    # dense loop and the handoff would mis-slice the incoming pack entries
    span = -(-P // G)
    stall_window = 8
    stalled = False
    empty_react = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))
    _er = (np.empty(0, np.int64), np.empty(0, np.float64),
           np.empty(0, np.int64))
    empty_reply_group = ray.put(tuple(_er for _ in range(span)))
    reacts = [[None] * P for _ in range(P)]    # reacts[i][j]: i → j
    statics = [[None] * G for _ in range(P)]   # statics[i][g]: group refs
    act = np.zeros(P, np.int64)
    react_counts = np.zeros((P, P), np.int64)  # [i][j]
    # req_consumers[i][k][j]: i's current requests to owner k name consumer j
    req_consumers = np.zeros((P, P, P), bool)
    states = list(states)
    first = True

    while step < max_supersteps:
        step += 1
        if first:
            # transition superstep: full width, combined packs in, split out
            run = list(range(P))
            if SPARSE_WAVE_LOG is not None:
                SPARSE_WAVE_LOG.append(P)
            serves = {k: _serve_packed.options(
                num_returns=G if G > 1 else 1).remote(
                    P, k, G, *[packs[i][k // span] for i in range(P)])
                for k in range(P)}
            sg = {k: (list(s) if G > 1 else [s]) for k, s in serves.items()}
            outs = {
                j: _eval_apply_push.options(num_returns=2 + P + G).remote(
                    graph.parts[j], states[j], kind, param, step, seed,
                    graph.block, P, j, G,
                    *[sg[k][j // span] for k in range(P)],
                    *[packs[i][j // span] for i in range(P)],
                    split=True)
                for j in run
            }
            first = False
        else:
            run = [j for j in range(P)
                   if act[j] > 0 or react_counts[:, j].any()]
            if SPARSE_WAVE_LOG is not None:
                SPARSE_WAVE_LOG.append(len(run))
            if not run:
                # zero frontier, no pending reactivations: the dense loop
                # would run one full no-op wave (moved=0, active=0) and
                # break on its termination checks — break without the wave
                break
            need = np.zeros((P, P), bool)
            for i in range(P):
                need |= req_consumers[i]
            serves = {
                k: _serve_static.options(
                    num_returns=G if G > 1 else 1).remote(
                        P, k, G, *[statics[i][k // span]
                                   for i in range(P)])
                for k in range(P) if need[k][run].any()
            }
            sg = {k: (list(s) if G > 1 else [s]) for k, s in serves.items()}
            outs = {}
            for j in run:
                replies_j = [sg[k][j // span] if k in sg
                             else empty_reply_group for k in range(P)]
                outs[j] = _eval_apply_push_split.options(
                    num_returns=2 + P + G).remote(
                        graph.parts[j], states[j], kind, param, step,
                        seed, graph.block, P, j, G, *replies_j,
                        *[reacts[i][j] for i in range(P)],
                        *[statics[i][j // span] for i in range(P)])
        # reacts delivered to the running consumers are consumed
        for j in run:
            for i in range(P):
                reacts[i][j] = empty_react
                react_counts[i][j] = 0
        metas = ray.get([outs[j][1] for j in run])
        moved = 0
        for j, meta in zip(run, metas):
            states[j] = outs[j][0]
            for d in range(P):
                reacts[j][d] = outs[j][2 + d]
            for g in range(G):
                statics[j][g] = outs[j][2 + P + g]
            act[j] = meta["active"]
            react_counts[j] = meta["react_counts"]
            req_consumers[j] = meta["req_consumers"]
            moved += meta["moved"]
        total_moves += moved
        n_active = int(act.sum())
        # bookkeeping + termination: byte-for-byte the dense loop's logic
        if best_active is None or n_active < best_active:
            next_best, next_since = n_active, 0
        else:
            next_best, next_since = best_active, since_best + 1
        if moved == 0 and prev_moved == 0:
            break
        prev_moved = moved
        if moved == 0 and n_active == 0:
            break
        best_active, since_best = next_best, next_since
        if since_best >= stall_window:
            stalled = True
            # pending reactivations must be visible to the lock fallback
            states = [
                _absorb_shards.remote(states[j], graph.ranges()[j][0],
                                      *[reacts[i][j] for i in range(P)])
                for j in range(P)
            ]
            break
    return states, total_moves, step, stalled
