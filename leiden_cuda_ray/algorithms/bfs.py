"""Distributed multi-source BFS (hop distance to the nearest seed).

The standard data-parallel BFS relaxation (e.g. Pregel's SSSP example,
Malewicz et al., SIGMOD 2010) over the package's CSR partitions: seeds
start at distance 0, every superstep pushes dist+1 along the out-edges
of vertices whose distance changed, owners min-reduce. The frontier
mask makes late supersteps touch a vanishing fraction of the CSR —
same shape as components.py's min-label propagation, with a distance
payload instead of a label payload.

Seed choice is a deterministic predicate (vertex % seed_mod == 0) so
the DuckDB oracle can name the identical seed set; distances are exact
(unit hop weights, synchronous relaxation = BFS level order), and
unreachable vertices report -1.
"""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, segmin_by_key, shard_by_owner

_UNREACHED = np.iinfo(np.int64).max


@ray.remote
def _push_dist(csr, dist, active, block, P):
    src_slot = local_src_per_slot(csr)
    sel = active[src_slot]
    ids, mins = segmin_by_key(csr["indices"][sel],
                              dist[src_slot][sel] + 1)
    shards = shard_by_owner(ids, block, P, mins)
    return shards[0] if P == 1 else tuple(shards)


@ray.remote
def _reduce_dist(dist, vlo, *shards):
    new = dist.copy()
    for ids, mins in shards:
        np.minimum.at(new, ids - vlo, mins)
    changed = new != dist
    return new, changed, int(changed.sum())


def bfs_hops(graph: Graph, seed_mod: int = 97,
             max_iterations: int = 10_000, source: int | None = None):
    """Returns (dist_refs per partition, supersteps, max_dist).

    dist arrays hold the exact hop count to the nearest seed
    (vertex % seed_mod == 0, or the single `source` vertex when given);
    unreachable vertices hold -1."""
    P = graph.P

    @ray.remote
    def _init(csr):
        v = np.arange(csr["vlo"], csr["vhi"], dtype=np.int64)
        seed = (v == source) if source is not None else (v % seed_mod) == 0
        dist = np.where(seed, np.int64(0), _UNREACHED)
        return dist, seed.copy()

    inits = [_init.options(num_returns=2).remote(graph.parts[i])
             for i in range(P)]
    dists = [o[0] for o in inits]
    actives = [o[1] for o in inits]

    steps = 0
    for steps in range(1, max_iterations + 1):
        shards = fanout(
            _push_dist,
            [(graph.parts[i], dists[i], actives[i], graph.block, P)
             for i in range(P)], P)
        outs = [
            _reduce_dist.options(num_returns=3).remote(
                dists[j], graph.ranges()[j][0], *shards[j])
            for j in range(P)
        ]
        dists = [o[0] for o in outs]
        actives = [o[1] for o in outs]
        if sum(ray.get([o[2] for o in outs])) == 0:
            break

    @ray.remote
    def _finalize(d):
        out = d.copy()
        out[out == _UNREACHED] = -1
        return out, int(out.max())

    fin = [_finalize.options(num_returns=2).remote(d) for d in dists]
    dists = [f[0] for f in fin]
    max_dist = max(ray.get([f[1] for f in fin]), default=-1)
    return dists, steps, max_dist


def pseudo_diameter(graph: Graph):
    """Double-sweep diameter lower bound (Magnien–Latapy–Habib, JEA
    2009): BFS from vertex 0 finds a farthest vertex a (tie → min id);
    a second BFS from a reports its eccentricity — a classic, often
    tight lower bound on the true diameter (exact on trees). Both
    sweeps are the engine's frontier-sparse BFS waves; the argmax fold
    is P partition-level rows. Deterministic and P-invariant.

    Returns (far_a, ecc_0, far_b, diameter_lb) over vertex 0's
    component."""
    import ray as _ray

    @ray.remote
    def _argmax(d, vlo):
        if len(d) == 0 or d.max() < 0:
            return -1, np.int64(-1)
        mx = d.max()
        return int(mx), np.int64(vlo + int(np.argmax(d)))

    def _far(dists):
        outs = _ray.get([
            _argmax.remote(d, graph.ranges()[i][0])
            for i, d in enumerate(dists)])
        best = max(outs, key=lambda t: (t[0], -t[1]))
        return int(best[1]), int(best[0])

    d0, _, _ = bfs_hops(graph, source=0)
    far_a, ecc_0 = _far(d0)
    d1, _, _ = bfs_hops(graph, source=far_a)
    far_b, diameter_lb = _far(d1)
    return far_a, ecc_0, far_b, diameter_lb
