"""Distributed maximal independent set (beyond-reference link-graph op).

Luby's algorithm (Luby, SIAM J. Comput. 1986) with FIXED deterministic
priorities: key(v) = (splitmix64(v, seed) >> 32) · V + v — the high hash
word scattered uniformly, the +v term making every key distinct even
under 32-bit hash collisions. With priorities fixed across rounds the
parallel fixpoint equals the SEQUENTIAL greedy MIS taken in ascending
key order (a key-local-minimum vertex is exactly what greedy would pick
next in its neighborhood; removing it and its neighbors commutes with
the parallel round), so the result is a pure function of (graph, seed):
reproducible at any partition count, and expressible in SQL as an
unrolled round recurrence over the identical HUGEINT-transcribed hash
(the kcore/ktruss oracle pattern).

Per round, over the ALIVE (undecided) subgraph:
  1. every alive vertex pushes its key to its still-alive neighbors;
     owners take the per-vertex min (segmin combiner inside the push
     task — a partition sends at most one candidate per destination);
  2. an alive vertex with key < min(alive-neighbor keys) joins the MIS
     (isolated-in-the-alive-subgraph vertices join: min of nothing = ∞);
  3. new members push "taken" to their neighbors, which become excluded.
Both exchanges touch only edges with an alive endpoint, and a per-slot
dead-neighbor mask (refreshed from owner statuses each round) keeps the
key push off edges into decided territory — wire volume tracks the
alive subgraph, which Luby rounds shrink geometrically (O(log V) rounds
w.h.p.). State is per-partition (status) arrays; nothing O(V) on the
driver. max_rounds exhaustion raises LOUDLY.

Reference scope note: the reference (knagaitsev/leiden-cuda) has no MIS
operator; this extends the CSR-partition infrastructure of its Leiden
port (graph/runtime.py fan-out exchange, kcore.py's simple-graph mask).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.algorithms.kcore import _simple_mask
from leiden_cuda_ray.functions.sampling import splitmix_value
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, segmin_by_key, shard_by_owner

#: status codes
_UND, _IN, _OUT = 0, 1, 2


def mis_key(ids: np.ndarray, V: int, seed: int) -> np.ndarray:
    """Distinct deterministic priority per vertex, int64-exact (also the
    quantity the SQL oracle recomputes in HUGEINT)."""
    if V >= (1 << 31):
        raise ValueError(
            f"mis_key packs (hash >> 32) * V + v into int64; V={V} "
            f"overflows — widen the key to two columns first")
    hi = (splitmix_value(ids.astype(np.uint64), seed)
          >> np.uint64(32)).astype(np.int64)
    return hi * np.int64(V) + ids.astype(np.int64)


@ray.remote
def _mis_plan(csr, V: int, seed: int):
    """Per-partition flat edge plan (simple-graph slots: distinct
    non-self neighbors) + the partition's key and status arrays."""
    src_slot = local_src_per_slot(csr)
    keep = _simple_mask(csr)
    s, d = src_slot[keep], csr["indices"][keep]
    vlo, vhi = int(csr["vlo"]), int(csr["vhi"])
    nv = vhi - vlo
    keys = mis_key(np.arange(vlo, vhi, dtype=np.int64), V, seed)
    status = np.zeros(nv, np.int8)
    return ({"vlo": vlo, "nv": nv, "s": s, "d": d}, keys, status,
            np.zeros(len(d), bool))


@ray.remote
def _push_keys(plan, keys, status, nbr_dead, block, P):
    """Alive vertices push their key to neighbors not yet known-dead;
    per-dst min combiner inside the task."""
    s, d = plan["s"], plan["d"]
    sel = (status[s] == _UND) & ~nbr_dead
    ids, mins = segmin_by_key(d[sel], keys[s[sel]])
    shards = shard_by_owner(ids, block, P, mins)
    return shards[0] if P == 1 else tuple(shards)


@ray.remote
def _decide(plan, keys, status, *shards):
    """Join the MIS where key < min incoming alive-neighbor key; return
    (status, joined-local-slot mask, #undecided-after-join)."""
    nv = plan["nv"]
    vlo = plan["vlo"]
    nbr_min = np.full(nv, np.iinfo(np.int64).max, np.int64)
    for ids, mins in shards:
        np.minimum.at(nbr_min, ids - vlo, mins)
    und = status == _UND
    join = und & (keys < nbr_min)
    out = status.copy()
    out[join] = _IN
    return out, join, int(und.sum() - join.sum())


@ray.remote
def _push_taken(plan, joined_mask, block, P):
    """New members notify their neighbors (ids only, deduped)."""
    s, d = plan["s"], plan["d"]
    ids = np.unique(d[joined_mask[s]])
    shards = shard_by_owner(ids, block, P)
    return shards[0] if P == 1 else tuple(shards)


@ray.remote(num_returns=2)
def _exclude(plan, status, joined_mask, *shards):
    """Mark undecided neighbors of new members excluded; also emit this
    round's newly-decided GLOBAL ids (joins + fresh exclusions, sorted)
    — the delta every partition needs to retire edges into decided
    territory without ever reshipping whole status arrays."""
    vlo = plan["vlo"]
    out = status.copy()
    newly = [np.flatnonzero(joined_mask).astype(np.int64) + vlo]
    ne = [s[0] for s in shards if len(s[0])]  # shards are 1-tuples (ids,)
    if ne:
        loc = np.concatenate(ne) - vlo
        hit = out[loc] == _UND
        out[loc[hit]] = _OUT
        newly.append(loc[hit] + vlo)
    return out, np.sort(np.concatenate(newly))


@ray.remote(num_returns=2)
def _grow_dead_mask(plan, nbr_dead, status, *newly_dead):
    """OR this round's decided-id deltas into the per-slot mask (sorted
    searchsorted membership — O(|slots| log Δ), no O(V) state), and
    COMPACT the plan to the alive slots once more than half are dead on
    either endpoint — so per-round gather/segmin cost tracks the
    shrinking alive subgraph instead of the original E (a geometric
    series via the halving trigger). Returns (plan', mask')."""
    ne = [a for a in newly_dead if len(a)]
    mask = nbr_dead
    if ne:
        dead = np.concatenate(ne)
        dead.sort()
        d = plan["d"]
        pos = np.searchsorted(dead, d)
        pos[pos == len(dead)] = 0
        mask = nbr_dead | (dead[pos] == d)
    gone = mask | (status[plan["s"]] != _UND)
    if int(gone.sum()) * 2 <= len(gone):
        return plan, mask
    keep = ~gone
    new_plan = {"vlo": plan["vlo"], "nv": plan["nv"],
                "s": plan["s"][keep], "d": plan["d"][keep]}
    return new_plan, np.zeros(int(keep.sum()), bool)


@ray.remote
def _emit_mis(vlo: int, status) -> pa.Table:
    n = len(status)
    return pa.table({
        "vertex": pa.array(np.arange(vlo, vlo + n, dtype=np.int64),
                           pa.int64()),
        "in_mis": pa.array((status == _IN).astype(np.int64), pa.int64()),
    })


def maximal_independent_set(graph: Graph, seed: int = 11,
                            max_rounds: int = 64):
    """→ (Dataset[vertex:int64, in_mis:int64 (0/1)], rounds). Result is
    the greedy MIS in ascending mis_key order — independent of P."""
    import ray.data

    P = graph.P
    ranges = graph.ranges()
    inits = [_mis_plan.options(num_returns=4).remote(
        graph.parts[i], graph.V, seed) for i in range(P)]
    plans = [o[0] for o in inits]
    keys = [o[1] for o in inits]
    status = [o[2] for o in inits]
    nbr_dead = [o[3] for o in inits]

    for rnd in range(1, max_rounds + 1):
        shards = fanout(
            _push_keys,
            [(plans[i], keys[i], status[i], nbr_dead[i], graph.block, P)
             for i in range(P)], P)
        outs = [
            _decide.options(num_returns=3).remote(
                plans[j], keys[j], status[j], *shards[j])
            for j in range(P)
        ]
        status = [o[0] for o in outs]
        joined = [o[1] for o in outs]
        left = sum(ray.get([o[2] for o in outs]))
        tshards = fanout(
            _push_taken,
            [(plans[i], joined[i], graph.block, P) for i in range(P)], P)
        exc = [
            _exclude.remote(plans[j], status[j], joined[j], *tshards[j])
            for j in range(P)
        ]
        status = [o[0] for o in exc]
        deltas = [o[1] for o in exc]
        if left == 0:
            blocks = [_emit_mis.remote(ranges[j][0], status[j])
                      for j in range(P)]
            return ray.data.from_arrow_refs(blocks), rnd
        ret = [_grow_dead_mask.remote(plans[i], nbr_dead[i], status[i],
                                      *deltas)
               for i in range(P)]
        plans = [o[0] for o in ret]
        nbr_dead = [o[1] for o in ret]
    raise ValueError(
        f"MIS did not converge within {max_rounds} rounds — with "
        f"uniform priorities Luby needs O(log V) w.h.p.; raise "
        f"max_rounds")
