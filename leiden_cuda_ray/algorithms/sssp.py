"""Distributed weighted single-source shortest paths (multi-source).

The canonical Pregel SSSP relaxation (Malewicz et al., SIGMOD 2010)
over the package's CSR partitions — bfs.py with a weighted payload:
seeds (vertex % seed_mod == 0) start at distance 0; every superstep,
vertices whose distance improved push dist + w(edge) along their
out-edges; owners min-reduce. Synchronous Bellman–Ford with
non-negative integer weights is exact at the fixpoint (no change
anywhere), and the frontier mask keeps late supersteps touching a
vanishing fraction of the CSR.

Edge weights are the canonical union-graph weights (import=1 plus
summed co-commit counts), integer-valued by construction; distances
are exact int64, -1 for unreachable. Deterministic and P-invariant:
min-reduction is order-free.

Reference scope note: the reference (knagaitsev/leiden-cuda) has no
weighted-path operator; this extends its Leiden port's CSR-partition
infrastructure (graph/runtime.py fan-out exchange), reusing the BFS
wave shape (algorithms/bfs.py).
"""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, segmin_by_key, shard_by_owner

_UNREACHED = np.int64(1) << np.int64(62)


@ray.remote
def _wplan(csr):
    """Once-per-run immutable plan: integer slot weights (weights are
    static; converting them every superstep would cost S x O(E))."""
    return np.rint(np.asarray(csr["weights"],
                              np.float64)).astype(np.int64)


@ray.remote
def _push_wdist(csr, wi, dist, active, block, P):
    src_slot = local_src_per_slot(csr)
    sel = active[src_slot]
    ids, mins = segmin_by_key(csr["indices"][sel],
                              dist[src_slot][sel] + wi[sel])
    shards = shard_by_owner(ids, block, P, mins)
    return shards[0] if P == 1 else tuple(shards)


@ray.remote
def _reduce_wdist(dist, vlo, *shards):
    new = dist.copy()
    for ids, mins in shards:
        np.minimum.at(new, ids - vlo, mins)
    changed = new != dist
    return new, changed, int(changed.sum())


def sssp_weighted(graph: Graph, seed_mod: int = 97,
                  max_iterations: int = 10_000):
    """Returns (dist_refs per partition, supersteps, max finite dist).

    dist arrays hold the exact weighted distance to the nearest seed
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
    wis = [_wplan.remote(graph.parts[i]) for i in range(P)]

    steps = 0
    for steps in range(1, max_iterations + 1):
        shards = fanout(
            _push_wdist,
            [(graph.parts[i], wis[i], dists[i], actives[i],
              graph.block, P)
             for i in range(P)], P)
        outs = [
            _reduce_wdist.options(num_returns=3).remote(
                dists[j], graph.ranges()[j][0], *shards[j])
            for j in range(P)
        ]
        dists = [o[0] for o in outs]
        actives = [o[1] for o in outs]
        if sum(ray.get([o[2] for o in outs])) == 0:
            break
    else:
        raise ValueError(
            f"SSSP did not converge within {max_iterations} supersteps")

    @ray.remote
    def _final(dist):
        fin = dist[dist < _UNREACHED]
        mx = int(fin.max()) if len(fin) else 0
        return np.where(dist >= _UNREACHED, np.int64(-1), dist), mx

    outs = [_final.options(num_returns=2).remote(d) for d in dists]
    finals = [o[0] for o in outs]
    max_dist = max(ray.get([o[1] for o in outs]), default=0)
    return finals, steps, max_dist
