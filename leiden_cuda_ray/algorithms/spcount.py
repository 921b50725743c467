"""Distributed shortest-path counting (σ) from a fixed seed set.

Level-synchronous BFS with path-count accumulation — the forward half of
Brandes' betweenness algorithm (Brandes, J. Math. Sociol. 2001): for
each seed s and vertex v, σ_s(v) = number of distinct shortest s→v
paths, with σ_s(v) = Σ σ_s(u) over the predecessors u (dist d-1
neighbors). Synchronous levels make the sum exact in one shot: every
level-d vertex is newly settled in the same superstep, pushes exactly
once in the next, and a level-d+1 vertex receives ALL its predecessor
contributions together (contributions into already-settled vertices —
same-level or backward edges — are masked out by the pre-superstep
distance snapshot).

The seed set is small and FIXED (the first ≤4 multiples of 97 below V),
so per-partition state is (nv × S) dist/σ matrices — state stays
O(S·V/P) per owner and the push volume is O(S · frontier edges) per
superstep. σ values are exact int64 with a LOUD 2^53 overflow guard
(2^53 so any float64 cast downstream — including the DuckDB HUGEINT →
DOUBLE comparisons — stays exact).

Reference scope note: the reference (knagaitsev/leiden-cuda) has no
centrality operators; this extends its Leiden port's CSR-partition
infrastructure (graph/runtime.py fan-out exchange), sharing the BFS
relaxation shape of algorithms/bfs.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, segsum_by_key, shard_by_owner

_UNREACHED = np.iinfo(np.int64).max
_SIGMA_CAP = 1 << 53


@ray.remote
def _push_sigma(csr, dist, sigma, d, block, P, S):
    """Per seed: frontier (dist == d) vertices push σ along out-edges,
    partial-summed per destination. Returns P routed outputs, each a
    tuple over seeds of (ids, sums)."""
    src_slot = local_src_per_slot(csr)
    per_owner: list[list] = [[] for _ in range(P)]
    for s in range(S):
        sel = dist[src_slot, s] == d
        ids, sums = segsum_by_key(csr["indices"][sel],
                                  sigma[src_slot[sel], s])
        shards = shard_by_owner(ids, block, P, sums)
        for j in range(P):
            per_owner[j].append(shards[j])
    out = [tuple(x) for x in per_owner]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _reduce_sigma(dist, sigma, vlo, d, *shards):
    """Settle newly reached vertices at level d+1: dist and the full
    predecessor σ sum. The pre-superstep dist snapshot masks every
    contribution into already-settled vertices."""
    nd = dist.copy()
    ns = sigma.copy()
    newly = 0
    S = dist.shape[1]
    for s in range(S):
        parts = [sh[s] for sh in shards]
        ids = np.concatenate([p[0] for p in parts])
        sums = np.concatenate([p[1] for p in parts])
        if not len(ids):
            continue
        loc = ids - vlo
        un = dist[loc, s] == _UNREACHED  # snapshot, not nd
        loc, sums = loc[un], sums[un]
        nd[loc, s] = d + 1
        np.add.at(ns[:, s], loc, sums)
        newly += len(np.unique(loc))
    if ns.max(initial=0) >= _SIGMA_CAP:
        raise ValueError(
            f"shortest-path count exceeded 2^53 at level {d + 1} — "
            f"σ no longer float64-exact; this graph needs a bigint "
            f"σ representation")
    return nd, ns, newly


@ray.remote
def _emit_sp(vlo: int, dist, sigma, seeds) -> pa.Table:
    nv, S = dist.shape
    v = np.repeat(np.arange(vlo, vlo + nv, dtype=np.int64), S)
    sd = np.tile(np.asarray(seeds, np.int64), nv)
    d = dist.reshape(-1).copy()
    unr = d == _UNREACHED
    d[unr] = -1
    return pa.table({
        "seed": pa.array(sd, pa.int64()),
        "vertex": pa.array(v, pa.int64()),
        "dist": pa.array(d, pa.int64()),
        "sigma": pa.array(sigma.reshape(-1), pa.int64()),
    })


#: fixed-point scale for the quantized Brandes dependency recurrence —
#: a power of two so engine (numpy //) and oracle (DuckDB //) floor-divs
#: agree on exactly representable integers
_DELTA_SCALE = 1 << 20


@ray.remote
def _push_delta(csr, dist, sigma, delta, d, block, P, S):
    """Per seed: level-d vertices broadcast q = (SCALE + δq) // σ along
    their edges (partial-summed per destination); owners keep only their
    level-(d-1) rows — the predecessors."""
    src_slot = local_src_per_slot(csr)
    per_owner: list[list] = [[] for _ in range(P)]
    for s in range(S):
        sel = dist[src_slot, s] == d
        q = (_DELTA_SCALE + delta[src_slot[sel], s]) \
            // sigma[src_slot[sel], s]
        ids, sums = segsum_by_key(csr["indices"][sel], q)
        shards = shard_by_owner(ids, block, P, sums)
        for j in range(P):
            per_owner[j].append(shards[j])
    out = [tuple(x) for x in per_owner]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _reduce_delta(dist, sigma, delta, vlo, d, *shards):
    """δq(v) = σ(v) · Σ q over level-d successors, for v at level d-1
    (other recipients are same-level or successor edges — dropped)."""
    nd = delta.copy()
    S = dist.shape[1]
    for s in range(S):
        parts = [sh[s] for sh in shards]
        ids = np.concatenate([p[0] for p in parts])
        sums = np.concatenate([p[1] for p in parts])
        if not len(ids):
            continue
        loc = ids - vlo
        pred = dist[loc, s] == d - 1
        loc, sums = loc[pred], sums[pred]
        acc = np.zeros(dist.shape[0], np.int64)
        np.add.at(acc, loc, sums)
        nd[:, s] = nd[:, s] + sigma[:, s] * acc
    if nd.max(initial=0) >= _SIGMA_CAP:
        raise ValueError(
            f"quantized dependency exceeded 2^53 at level {d} — "
            f"this graph needs a wider δ representation")
    return nd


@ray.remote
def _emit_bc(vlo: int, dist, sigma, delta, seeds) -> pa.Table:
    nv, S = dist.shape
    v = np.repeat(np.arange(vlo, vlo + nv, dtype=np.int64), S)
    sd = np.tile(np.asarray(seeds, np.int64), nv)
    d = dist.reshape(-1).copy()
    unr = d == _UNREACHED
    d[unr] = -1
    dq = delta.reshape(-1).copy()
    dq[sd == v] = 0  # Brandes excludes the source itself
    return pa.table({
        "seed": pa.array(sd, pa.int64()),
        "vertex": pa.array(v, pa.int64()),
        "dist": pa.array(d, pa.int64()),
        "sigma": pa.array(sigma.reshape(-1), pa.int64()),
        "delta_q": pa.array(dq, pa.int64()),
    })


def betweenness_quantized(graph: Graph, seed_mod: int = 97,
                          max_seeds: int = 4,
                          max_iterations: int = 10_000):
    """Sampled-source Brandes betweenness with PINNED integer
    arithmetic: forward σ levels, then the dependency backprop
      δq(v) = σ(v) · Σ_{succ w} (SCALE + δq(w)) // σ(w)
    run level-by-level from the deepest frontier — every op is int64
    (floor division, SCALE = 2^20), so the recurrence is bit-exact at
    any partition count AND replayable in SQL; δq/SCALE ≈ Brandes'
    δ = Σ σ_sv/σ_sw (1 + δ(w)) with per-edge quantization error
    < σ(v)/SCALE. → (Dataset[seed, vertex, dist, sigma, delta_q],
    depth); delta_q = 0 at the seed itself (Brandes convention) and for
    unreachable pairs."""
    import ray.data

    P = graph.P
    (dists, sigmas, seeds, depth) = _forward(graph, seed_mod, max_seeds,
                                             max_iterations)
    S = len(seeds)

    @ray.remote
    def _zero(dist):
        return np.zeros_like(dist)

    deltas = [_zero.remote(dists[i]) for i in range(P)]
    for d in range(depth, 0, -1):
        shards = fanout(
            _push_delta,
            [(graph.parts[i], dists[i], sigmas[i], deltas[i], d,
              graph.block, P, S) for i in range(P)], P)
        deltas = [
            _reduce_delta.remote(dists[j], sigmas[j], deltas[j],
                                 graph.ranges()[j][0], d, *shards[j])
            for j in range(P)
        ]
    blocks = [
        _emit_bc.remote(graph.ranges()[j][0], dists[j], sigmas[j],
                        deltas[j], seeds)
        for j in range(P)
    ]
    return ray.data.from_arrow_refs(blocks), depth


def _forward(graph: Graph, seed_mod: int, max_seeds: int,
             max_iterations: int):
    """Forward σ/dist levels shared by shortest_path_counts and
    betweenness_quantized; returns per-partition state refs."""
    P = graph.P
    seeds = [s for s in range(0, min(graph.V, seed_mod * max_seeds),
                              seed_mod)]
    S = len(seeds)
    seeds_arr = np.asarray(seeds, np.int64)

    @ray.remote(num_returns=2)
    def _init(csr):
        vlo, vhi = int(csr["vlo"]), int(csr["vhi"])
        nv = vhi - vlo
        dist = np.full((nv, S), _UNREACHED, np.int64)
        sigma = np.zeros((nv, S), np.int64)
        for s, sv in enumerate(seeds_arr):
            if vlo <= sv < vhi:
                dist[sv - vlo, s] = 0
                sigma[sv - vlo, s] = 1
        return dist, sigma

    inits = [_init.remote(graph.parts[i]) for i in range(P)]
    dists = [o[0] for o in inits]
    sigmas = [o[1] for o in inits]

    depth = 0
    for d in range(max_iterations):
        shards = fanout(
            _push_sigma,
            [(graph.parts[i], dists[i], sigmas[i], d, graph.block, P, S)
             for i in range(P)], P)
        outs = [
            _reduce_sigma.options(num_returns=3).remote(
                dists[j], sigmas[j], graph.ranges()[j][0], d, *shards[j])
            for j in range(P)
        ]
        dists = [o[0] for o in outs]
        sigmas = [o[1] for o in outs]
        if sum(ray.get([o[2] for o in outs])) == 0:
            depth = d
            break
    else:
        # LOUD failure (module convention, matching scc/mis/matching):
        # a silent partial dist/sigma would zero the backward pass
        raise ValueError(
            f"spcount BFS did not converge within {max_iterations} "
            f"iterations (graph deeper than the bound)")
    return dists, sigmas, seeds, depth


def shortest_path_counts(graph: Graph, seed_mod: int = 97,
                         max_seeds: int = 4,
                         max_iterations: int = 10_000):
    """→ (Dataset[seed, vertex, dist, sigma], depth). Seeds are the
    first `max_seeds` multiples of `seed_mod` below V; dist = -1 and
    sigma = 0 for unreachable (seed, vertex) pairs; sigma(seed, seed)
    = 1 (the empty path)."""
    import ray.data

    P = graph.P
    dists, sigmas, seeds, depth = _forward(graph, seed_mod, max_seeds,
                                           max_iterations)
    blocks = [
        _emit_sp.remote(graph.ranges()[j][0], dists[j], sigmas[j], seeds)
        for j in range(P)
    ]
    return ray.data.from_arrow_refs(blocks), depth
