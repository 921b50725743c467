"""Distributed maximal matching (beyond-reference link-graph operator).

Deterministic greedy handshake (the Israeli–Itai proposal round with
FIXED priorities instead of coin flips): every round, each alive vertex
proposes to its minimum-key alive neighbor (key = mis.mis_key — distinct
splitmix priorities, so argmin is unambiguous), and an edge joins the
matching iff the proposals are MUTUAL. Matched endpoints leave the
graph. Progress is guaranteed: the globally minimum-key alive vertex m
with any alive neighbor is every such neighbor's argmin, so m's own
proposal is always reciprocated — at least one edge matches per round
per alive region. The fixpoint is maximal (an alive vertex with an
alive neighbor keeps proposing) and a pure function of (graph, seed):
P-invariant, and expressible in SQL as an unrolled round recurrence
(the MIS/kcore oracle pattern).

Decoding trick: mis_key(v) = (hash >> 32)·V + v, so the PROPOSAL TARGET
is recovered from the segmin VALUE itself (argmin = min_key mod V).
Mutuality is checked owner-side: v matches u iff an incoming proposal
(v, u) exists AND v's own proposal is u — both owners reach the same
verdict independently, no confirmation round.

Scheduling shape (the r4 bench fix — `matching` was 15 s at sf0.1, 3×
Leiden's local moving): the drain is ~84 data-dependent rounds on the
co-commit graph with only ~2% of vertices matching per round, so any
per-round O(E) work (the old full-slot segmin + dead-mask scan) costs
~E·rounds/2 total. The proposal pass is now INCREMENTAL: keys are
static and the alive set only SHRINKS, so an alive vertex's argmin
changes exactly when its current target dies — each round recomputes
proposals only for that frontier (scanning just those vertices' slots
against a shared dead bitmap) and re-emits cached proposals for the
rest. Per-round cost is O(alive vertices + frontier slots); the O(E)
segmin happens once, in round 1. The big slot arrays are IMMUTABLE
object-store refs passed to every round's tasks (never re-serialized);
mutable state (proposal/mate arrays per partition: O(V/P), and one
V-byte dead bitmap folded by a tiny side task off the critical path)
is small. Rounds are two pipelined task waves (propose, decide); the
driver probes convergence `lookahead` rounds behind the submission
front so its blocking ray.get stays off the critical path —
post-convergence rounds are strict no-ops (zero proposals → mate
unchanged), so overshooting is harmless. The reported round count is
the first all-quiet round on the distributed path; when the drain
cutover lands in the ≤`lookahead`-round window after the true
fixpoint, the drain reports its own (slightly later) quiet round —
mate arrays are identical either way. Matching runs on FEWER, larger
partitions than the graph (~2M simple slots each): per-round cost is a
fixed task-wave overhead plus frontier work, so big-but-few wins for
50+ round drains.

Reference scope note: the reference (knagaitsev/leiden-cuda) has no
matching operator; this extends its Leiden port's CSR-partition
infrastructure (graph/runtime.py fan-out exchange).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.algorithms.kcore import _ranges, _simple_mask
from leiden_cuda_ray.algorithms.mis import mis_key
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import segmin_by_key, shard_by_owner


@ray.remote
def _mm_plan(V: int, seed: int, *csrs):
    """One-time merged plan over adjacent CSR partitions: flat simple-
    graph slots sorted by local src (CSR order survives concatenation),
    a per-vertex slot-offset array, and static neighbor keys. Immutable
    for the whole drain — every round receives the same ref."""
    vlo = int(csrs[0]["vlo"])
    parts_s, parts_d, nv = [], [], 0
    for csr in csrs:  # adjacent ranges, ascending
        src_slot = local_src_per_slot(csr)
        keep = _simple_mask(csr)
        parts_s.append(src_slot[keep] + nv)  # re-base to merged range
        parts_d.append(csr["indices"][keep])
        nv += int(csr["vhi"]) - int(csr["vlo"])
    s = np.concatenate(parts_s) if parts_s else np.zeros(0, np.int64)
    d = np.concatenate(parts_d) if parts_d else np.zeros(0, np.int64)
    dkeys = mis_key(d, V, seed)
    # per-vertex slots sorted by KEY: a vertex's argmin alive neighbor
    # is its first alive slot, so the drain's cursors only ever advance
    order = np.lexsort((dkeys, s))
    s, d, dkeys = s[order], d[order], dkeys[order]
    return {"vlo": vlo, "nv": nv, "d": d, "dkeys": dkeys,
            "off": np.searchsorted(s, np.arange(nv + 1))}


@ray.remote
def _mm_fold_bitmap(V: int, bitmap, *deltas):
    """Fold a round's matched-id deltas into the global dead bitmap
    (immutable chain — one V-byte object per round, produced OFF the
    critical path, in parallel with the propose wave that still works
    from bitmap + raw deltas)."""
    bm = np.zeros(V, bool) if bitmap is None else bitmap.copy()
    for a in deltas:
        bm[a] = True
    return bm


@ray.remote
def _mm_propose(plan, V, prop, mate, bitmap, block, P, *deltas):
    """Incremental proposal pass. Dead-as-of-this-round = bitmap (deaths
    through round r-2) ∪ deltas (round r-1). Recomputes the argmin only
    for the FRONTIER — alive vertices whose cached target just died —
    by scanning their slots; every other cached proposal is still the
    min-key alive neighbor (keys static, aliveness only shrinks).
    Returns (prop, *P shards of (target, proposer))."""
    nd = (np.sort(np.concatenate([a for a in deltas if len(a)]))
          if any(len(a) for a in deltas) else np.zeros(0, np.int64))

    def is_dead(x: np.ndarray) -> np.ndarray:
        dead = bitmap[x] if bitmap is not None else np.zeros(len(x), bool)
        if len(nd):
            pos = np.searchsorted(nd, x)
            pos[pos == len(nd)] = 0
            dead = dead | (nd[pos] == x)
        return dead

    nv, vlo = plan["nv"], plan["vlo"]
    d, dkeys, off = plan["d"], plan["dkeys"], plan["off"]
    alive_v = (np.ones(nv, bool) if mate is None else mate == -1)
    if prop is None:  # round 1: every vertex recomputes
        prop = np.full(nv, -1, np.int64)
        frontier = np.flatnonzero(alive_v)
    else:
        prop = prop.copy()
        idx = np.flatnonzero(alive_v & (prop != -1))
        frontier = idx[is_dead(prop[idx])]
    if len(frontier):
        cnt = off[frontier + 1] - off[frontier]
        e = _ranges(off[frontier], cnt)
        sv = np.repeat(frontier, cnt)
        am = ~is_dead(d[e])
        ids, mins = segmin_by_key(sv[am], dkeys[e][am])
        prop[frontier] = -1
        if len(ids):
            prop[ids] = mins % V  # mis_key(v) ≡ v (mod V), keys distinct
    live = np.flatnonzero(alive_v & (prop != -1))
    targets = prop[live]
    shards = shard_by_owner(targets, block, P, live + vlo)
    return (prop, shards[0]) if P == 1 else (prop, *shards)


@ray.remote
def _mm_decide(vlo: int, prop, mate, *shards):
    """v matches u iff an incoming proposal (v, u) exists AND v's own
    proposal is u. Returns (mate, newly matched global ids, #incoming
    proposals) — zero proposals anywhere certifies maximality."""
    out = (np.full(len(prop), -1, np.int64) if mate is None
           else mate.copy())
    seen = 0
    newly = []
    for ids, proposers in shards:
        seen += len(ids)
        loc = ids - vlo
        hit = prop[loc] == proposers
        if hit.any():
            out[loc[hit]] = proposers[hit]
            newly.append(ids[hit])
    nw = (np.sort(np.concatenate(newly)) if newly
          else np.zeros(0, np.int64))
    return out, nw, seen


@ray.remote
def _mm_emit(vlo: int, mate) -> pa.Table:
    return pa.table({
        "vertex": pa.array(np.arange(vlo, vlo + len(mate), dtype=np.int64),
                           pa.int64()),
        "mate": pa.array(mate, pa.int64()),
    })


@ray.remote(num_returns=2)
def _mm_gather_alive(plan, mate):
    """Alive-subgraph extraction for the in-process drain: this
    partition's slots whose SOURCE is unmatched (the drain re-checks
    target aliveness itself — mate is the bitmap there), global-id
    based, key-sorted per vertex. Second return: the alive slot count,
    so the driver can enforce the drain heap cap before shipping
    anything big."""
    nv, vlo = plan["nv"], plan["vlo"]
    off = plan["off"]
    s = np.repeat(np.arange(nv, dtype=np.int64), np.diff(off))
    keep = (mate[s] == -1) if mate is not None else np.ones(len(s), bool)
    return ((s[keep] + vlo, plan["d"][keep], mate, vlo, nv),
            int(keep.sum()))


@ray.remote
def _mm_drain(V: int, start_round: int, max_rounds: int, *parts):
    """In-process drain: the synchronous handshake rounds, bit-identical
    to the distributed waves, on the gathered alive subgraph — the
    Leiden-drain pattern. Once per-round work is frontier-sized, the
    per-round TASK-WAVE latency (not compute or wire) dominates the
    distributed schedule at ~84 data-dependent rounds; below the cutover
    the remaining rounds are a tight numpy loop.

    Slots arrive sorted by key within each vertex, so a vertex's
    proposal is its FIRST ALIVE slot and each vertex keeps a CURSOR
    that only advances (aliveness only shrinks): proposal maintenance
    over the WHOLE drain is O(E) amortized — the naive
    recompute-frontier-vertices'-slots variant measured 14× E slot
    re-scans on the sf0.1 co-commit graph (hub deaths strand tens of
    thousands of proposers per round). Returns (mate over all V,
    rounds)."""
    mate = np.full(V, -1, np.int64)
    for sg, d, mt, vlo, nv in parts:
        if mt is not None:
            mate[vlo:vlo + nv] = mt
    D = np.concatenate([p[1] for p in parts])
    S = np.concatenate([p[0] for p in parts])
    # partitions cover ascending disjoint ranges and slots are
    # src-sorted within each, so S arrives globally sorted
    off = np.searchsorted(S, np.arange(V + 1, dtype=np.int64))
    cursor = off[:-1].copy()
    end = off[1:]
    prop = np.full(V, -1, np.int64)

    for rnd in range(start_round, max_rounds + 1):
        # advance cursors past dead targets (amortized O(E) total);
        # settled cursor = current proposal, exhausted = no alive nbr
        seek = np.flatnonzero(mate == -1)
        while len(seek):
            cur = cursor[seek]
            exhausted = cur >= end[seek]
            settled = np.zeros(len(seek), bool)
            settled[~exhausted] = mate[D[cur[~exhausted]]] == -1
            done = exhausted | settled
            prop[seek[exhausted]] = -1
            prop[seek[settled]] = D[cur[settled]]
            adv = seek[~done]
            cursor[adv] += 1
            seek = adv
        live = np.flatnonzero((mate == -1) & (prop != -1))
        if len(live) == 0:
            return mate, rnd
        t = prop[live]
        mutual = prop[t] == live  # symmetric: both rows of a pair hit
        mate[live[mutual]] = t[mutual]
    raise ValueError(
        f"matching did not converge within {max_rounds} rounds — with "
        f"uniform keys the handshake drains in O(log V) w.h.p.; raise "
        f"max_rounds")


@ray.remote
def _mm_emit_range(mate, vlo: int, vhi: int) -> pa.Table:
    return pa.table({
        "vertex": pa.array(np.arange(vlo, vhi, dtype=np.int64),
                           pa.int64()),
        "mate": pa.array(mate[vlo:vhi], pa.int64()),
    })


def maximal_matching(graph: Graph, seed: int = 13, max_rounds: int = 256,
                     lookahead: int = 3,
                     drain_cutover: int = 2_000_000,
                     drain_slot_cap: int = 300_000_000):
    """→ (Dataset[vertex:int64, mate:int64 (-1 = unmatched)], rounds).
    Deterministic greedy handshake matching; maximal at the fixpoint.
    Result is a pure function of (graph, seed) — partitioning, the task
    schedule and the drain cutover only change WHERE work runs, never
    the mate arrays (test_matching_handshake_equivalence pins this at
    several P and cutover settings).

    Whenever the (probed) alive count is ≤ `drain_cutover` AND the
    alive subgraph is ≤ `drain_slot_cap` slots (heap guard, ~16 B per
    slot), the drain moves in-process (immediately, for graphs that
    start below the cutover); above the caps the distributed waves run,
    cutting over mid-drain once the alive set shrinks enough — or to
    the fixpoint if it never does."""
    import ray.data

    P0 = graph.P
    ranges0 = graph.ranges()
    # coarsen: ~2M simple slots per matching partition (see module doc)
    P = max(1, min(P0, -(-int(graph.sym_edges) // 2_000_000)))
    g = -(-P0 // P)
    groups = [list(range(k, min(k + g, P0))) for k in range(0, P0, g)]
    P = len(groups)
    ranges = [(ranges0[grp[0]][0], ranges0[grp[-1]][1]) for grp in groups]
    block = np.array([r[0] for r in ranges] + [graph.V], np.int64)
    plans = [_mm_plan.remote(graph.V, seed,
                             *[graph.parts[i] for i in grp])
             for grp in groups]

    def _emit(mates_refs, rounds):
        blocks = [_mm_emit.remote(ranges[j][0], mates_refs[j])
                  for j in range(P)]
        return ray.data.from_arrow_refs(blocks), rounds

    props: list = [None] * P
    mates: list = [None] * P
    deltas: list = []
    bitmap = None
    pending: list = []  # (round, mate-refs, seen-refs, delta-refs)
    matched_probed = 0
    result = None
    # slot-cap backoff: a failed drain attempt pays a full O(alive-slot)
    # gather, so don't retry until the probed alive count has HALVED
    drain_retry_below = graph.V + 1
    for rnd in range(1, max_rounds + 1):
        alive_est = graph.V - matched_probed
        if alive_est <= drain_cutover and alive_est < drain_retry_below:
            gaths = [_mm_gather_alive.options(num_returns=2).remote(
                plans[i], mates[i]) for i in range(P)]
            if sum(ray.get([gth[1] for gth in gaths])) <= drain_slot_cap:
                mate_ref, rr = _mm_drain.options(num_returns=2).remote(
                    graph.V, rnd, max_rounds, *[gth[0] for gth in gaths])
                rounds = ray.get(rr)
                blocks = [_mm_emit_range.remote(mate_ref, lo, hi)
                          for lo, hi in ranges]
                return ray.data.from_arrow_refs(blocks), rounds
            drain_retry_below = alive_est // 2
        pv = [_mm_propose.options(num_returns=P + 1).remote(
            plans[i], graph.V, props[i], mates[i], bitmap, block, P,
            *deltas)
            for i in range(P)]
        if P == 1:
            props = [pv[0][0]]
            shards = [[pv[0][1]]]
        else:
            props = [pv[i][0] for i in range(P)]
            shards = [[pv[i][1 + j] for i in range(P)] for j in range(P)]
        if deltas:  # fold last round's deaths off the critical path
            bitmap = _mm_fold_bitmap.remote(graph.V, bitmap, *deltas)
        outs = [_mm_decide.options(num_returns=3).remote(
            ranges[j][0], props[j], mates[j], *shards[j])
            for j in range(P)]
        mates = [o[0] for o in outs]
        deltas = [o[1] for o in outs]
        pending.append((rnd, mates, [o[2] for o in outs], deltas))
        if len(pending) > lookahead:
            r0, m0, s0, d0 = pending.pop(0)
            if sum(ray.get(s0)) == 0:
                result = (r0, m0)
                break
            matched_probed += sum(len(a) for a in ray.get(d0))
    if result is None:
        for r0, m0, s0, _d0 in pending:
            if sum(ray.get(s0)) == 0:
                result = (r0, m0)
                break
    if result is None:
        raise ValueError(
            f"matching did not converge within {max_rounds} rounds — "
            f"with uniform keys the handshake drains in O(log V) "
            f"w.h.p.; raise max_rounds")
    rnd, mates = result
    return _emit(mates, rnd)
