"""Distributed maximal matching (beyond-reference link-graph operator).

Deterministic greedy handshake (the Israeli–Itai proposal round with
FIXED priorities instead of coin flips): every round, each alive vertex
proposes to its minimum-key alive neighbor (key = mis.mis_key — distinct
splitmix priorities, so argmin is unambiguous), and an edge joins the
matching iff the proposals are MUTUAL. Matched endpoints leave the
graph. Progress is guaranteed: the globally minimum-key alive vertex m
with any alive neighbor is every such neighbor's argmin, so m's own
proposal is always reciprocated — at least one edge matches per round
per alive region, and with uniform keys the alive set shrinks
geometrically (O(log V) rounds in practice). The fixpoint is maximal
(an alive vertex with an alive neighbor keeps proposing) and a pure
function of (graph, seed): P-invariant, and expressible in SQL as an
unrolled round recurrence (the MIS/kcore oracle pattern).

Decoding trick: mis_key(v) = (hash >> 32)·V + v, so the PROPOSAL TARGET
is recovered from the segmin VALUE itself (argmin = min_key mod V) — the
per-partition proposal pass is one segmin over CSR slots, no argmin
scatter. Mutuality is checked owner-side: v matches u iff an incoming
proposal (v, u) exists AND v's own proposal is u — both owners reach the
same verdict independently, no confirmation round. Dead-neighbor slot
masks grow from per-round matched-id deltas (mis._grow_dead_mask), so
wire volume tracks the shrinking alive subgraph.

Reference scope note: the reference (knagaitsev/leiden-cuda) has no
matching operator; this extends its Leiden port's CSR-partition
infrastructure (graph/runtime.py fan-out exchange).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.algorithms.kcore import _simple_mask
from leiden_cuda_ray.algorithms.mis import mis_key
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import segmin_by_key, shard_by_owner


@ray.remote
def _match_plan(csr, V: int, seed: int):
    """Per-partition flat simple-graph edge plan + neighbor keys + mate
    array (-1 = unmatched/alive) + dead-neighbor slot mask."""
    src_slot = local_src_per_slot(csr)
    keep = _simple_mask(csr)
    s, d = src_slot[keep], csr["indices"][keep]
    vlo, vhi = int(csr["vlo"]), int(csr["vhi"])
    nv = vhi - vlo
    dkeys = mis_key(d, V, seed)
    return ({"vlo": vlo, "nv": nv, "s": s, "d": d, "dkeys": dkeys},
            np.full(nv, -1, np.int64), np.zeros(len(d), bool))


@ray.remote
def _propose_targets(plan, mate, nbr_dead, V, block, P):
    """Proposal pass: min-key alive neighbor per alive local vertex,
    argmin decoded as (min key) mod V. Returns the local proposal array
    (global target per local slot, -1 = none) followed by P shards of
    (target, proposer) routed to the targets' owners."""
    s = plan["s"]
    sel = (mate[s] == -1) & ~nbr_dead
    ids, mins = segmin_by_key(s[sel], plan["dkeys"][sel])
    prop = np.full(plan["nv"], -1, np.int64)
    targets = mins % V  # mis_key(v) ≡ v (mod V), keys are distinct
    prop[ids] = targets
    proposers = ids + plan["vlo"]
    shards = shard_by_owner(targets, block, P, proposers)
    return (prop, *shards)


@ray.remote(num_returns=3)
def _decide(plan, mate, prop, *shards):
    """v matches u iff an incoming proposal (v, u) exists AND v's own
    proposal is u. Returns (mate, newly-matched global ids, #incoming
    proposals) — zero proposals anywhere certifies maximality."""
    vlo = plan["vlo"]
    out = mate.copy()
    seen = 0
    for ids, proposers in shards:
        seen += len(ids)
        loc = ids - vlo
        hit = prop[loc] == proposers
        out[loc[hit]] = proposers[hit]
    newly = np.flatnonzero(out != mate) + vlo
    return out, np.sort(newly), seen


@ray.remote(num_returns=2)
def _retire_slots(plan, nbr_dead, mate, *newly_dead):
    """OR this round's matched-id deltas into the per-slot mask, and —
    when more than half the remaining slots are dead on either endpoint
    — COMPACT the plan to the alive slots. Without compaction every
    round pays O(E_original) for the gathers/segmin even when two
    vertices remain; with halving-triggered compaction total round cost
    is a geometric series in the alive subgraph (the sf1 sweep measured
    the uncompacted handshake spending whole rounds in this mask pass)."""
    ne = [a for a in newly_dead if len(a)]
    mask = nbr_dead
    if ne:
        dead = np.concatenate(ne)
        dead.sort()
        d = plan["d"]
        pos = np.searchsorted(dead, d)
        pos[pos == len(dead)] = 0
        mask = nbr_dead | (dead[pos] == d)
    gone = mask | (mate[plan["s"]] != -1)
    n_dead = int(gone.sum())
    if n_dead * 2 <= len(gone):
        return plan, mask
    keep = ~gone
    new_plan = {"vlo": plan["vlo"], "nv": plan["nv"],
                "s": plan["s"][keep], "d": plan["d"][keep],
                "dkeys": plan["dkeys"][keep]}
    return new_plan, np.zeros(int(keep.sum()), bool)


@ray.remote
def _emit_mate(vlo: int, mate) -> pa.Table:
    return pa.table({
        "vertex": pa.array(np.arange(vlo, vlo + len(mate), dtype=np.int64),
                           pa.int64()),
        "mate": pa.array(mate, pa.int64()),
    })


def maximal_matching(graph: Graph, seed: int = 13, max_rounds: int = 64):
    """→ (Dataset[vertex:int64, mate:int64 (-1 = unmatched)], rounds).
    Deterministic greedy handshake matching; maximal at the fixpoint."""
    import ray.data

    P = graph.P
    ranges = graph.ranges()
    inits = [_match_plan.options(num_returns=3).remote(
        graph.parts[i], graph.V, seed) for i in range(P)]
    plans = [o[0] for o in inits]
    mates = [o[1] for o in inits]
    nbr_dead = [o[2] for o in inits]

    for rnd in range(1, max_rounds + 1):
        pv = [_propose_targets.options(num_returns=P + 1).remote(
            plans[i], mates[i], nbr_dead[i], graph.V, graph.block, P)
            for i in range(P)]
        if P == 1:
            props = [pv[0][0]]
            shards = [[pv[0][1]]]
        else:
            props = [pv[i][0] for i in range(P)]
            shards = [[pv[i][1 + j] for i in range(P)] for j in range(P)]
        outs = [
            _decide.options(num_returns=3).remote(
                plans[j], mates[j], props[j], *shards[j])
            for j in range(P)
        ]
        mates = [o[0] for o in outs]
        deltas = [o[1] for o in outs]
        seen = sum(ray.get([o[2] for o in outs]))
        if seen == 0:
            blocks = [_emit_mate.remote(ranges[j][0], mates[j])
                      for j in range(P)]
            return ray.data.from_arrow_refs(blocks), rnd
        ret = [_retire_slots.remote(plans[i], nbr_dead[i], mates[i],
                                    *deltas)
               for i in range(P)]
        plans = [o[0] for o in ret]
        nbr_dead = [o[1] for o in ret]
    raise ValueError(
        f"matching did not converge within {max_rounds} rounds — with "
        f"uniform keys the handshake drains in O(log V) w.h.p.; raise "
        f"max_rounds")
