"""Distributed connected components via min-label propagation
(north-rule algorithm, SURVEY.md §2.8: label_v = min(label_v, min label of
neighbors) to fixpoint; exact vs scipy union-find oracle).

Frontier-optimized: a partition only pushes along edges whose src label
changed in the previous superstep, so late supersteps touch a vanishing
fraction of the CSR. Symmetrized edges guarantee convergence to the
min-vertex-id labeling."""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, segmin_by_key, shard_by_owner


@ray.remote
def _push_min(csr, label, active, block, P):
    src_slot = local_src_per_slot(csr)
    sel = active[src_slot]
    ids, mins = segmin_by_key(csr["indices"][sel], label[src_slot][sel])
    shards = shard_by_owner(ids, block, P, mins)
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _reduce_min(label, vlo, *shards):
    new_label = label.copy()
    for ids, mins in shards:
        loc = ids - vlo
        np.minimum.at(new_label, loc, mins)
    changed = new_label != label
    return new_label, changed, int(changed.sum())


def connected_components(graph: Graph, max_iterations: int = 10_000):
    """Returns (label_refs per partition, supersteps). Labels = min vertex id
    reachable; exact."""
    P = graph.P

    @ray.remote
    def _init(csr):
        return (np.arange(csr["vlo"], csr["vhi"], dtype=np.int64),
                np.ones(csr["vhi"] - csr["vlo"], bool))

    inits = [_init.options(num_returns=2).remote(graph.parts[i])
             for i in range(P)]
    labels = [o[0] for o in inits]
    actives = [o[1] for o in inits]

    steps = 0
    for steps in range(1, max_iterations + 1):
        shards = fanout(
            _push_min,
            [(graph.parts[i], labels[i], actives[i], graph.block, P)
             for i in range(P)], P)
        outs = [
            _reduce_min.options(num_returns=3).remote(
                labels[j], graph.ranges()[j][0], *shards[j])
            for j in range(P)
        ]
        labels = [o[0] for o in outs]
        actives = [o[1] for o in outs]
        total_changed = sum(ray.get([o[2] for o in outs]))
        if total_changed == 0:
            break
    return labels, steps
