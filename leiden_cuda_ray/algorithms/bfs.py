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
             max_iterations: int = 10_000):
    """Returns (dist_refs per partition, supersteps, max_dist).

    dist arrays hold the exact hop count to the nearest seed
    (vertex % seed_mod == 0); unreachable vertices hold -1."""
    P = graph.P

    @ray.remote
    def _init(csr):
        v = np.arange(csr["vlo"], csr["vhi"], dtype=np.int64)
        seed = (v % seed_mod) == 0
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
