"""Distributed label propagation (north-rule algorithm, SURVEY.md §2.8).

Synchronous sweeps: label_v ← argmax_c Σ_{u∼v, label_u=c} w(u,v), with the
deterministic tie-break (max weight, then MIN label). The per-superstep
shuffle key is (dst, label) — the same combiner-then-shard pattern as the
reference's edge-parallel gather (leiden_kernel.cu:187-227): partials are
summed inside each partition before crossing the wire.

Synchronous LP can 2-cycle on bipartite structures, so convergence is
"no vertex changed" OR the iteration cap; both runs of the identical seedless
spec produce identical labels (the oracle in tests is the same spec run
single-process)."""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.config import LabelPropConfig
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, segsum_by_pair, shard_by_owner


@ray.remote
def _push_labels(csr, label, block, P):
    src_slot = local_src_per_slot(csr)
    dst = csr["indices"]
    # exclude self-loops: a vertex should not vote for itself
    keep = dst != (src_slot + csr["vlo"])
    d, l, w = segsum_by_pair(dst[keep], label[src_slot][keep],
                             csr["weights"][keep])
    shards = shard_by_owner(d, block, P, l, w)
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _reduce_labels(label, vlo, *shards):
    if all(len(s[0]) == 0 for s in shards):
        return label, 0
    d = np.concatenate([s[0] for s in shards])
    l = np.concatenate([s[1] for s in shards])
    w = np.concatenate([s[2] for s in shards])
    d, l, w = segsum_by_pair(d, l, w)  # merge partials across partitions
    # winner per dst: max weight, tie -> min label
    order = np.lexsort((l, -w, d))
    d_s, l_s = d[order], l[order]
    first = np.empty(len(d_s), bool)
    if len(d_s):
        first[0] = True
        np.not_equal(d_s[1:], d_s[:-1], out=first[1:])
    new_label = label.copy()
    new_label[d_s[first] - vlo] = l_s[first]
    changed = int((new_label != label).sum())
    return new_label, changed


def label_propagation(graph: Graph, cfg: LabelPropConfig = LabelPropConfig()):
    """Returns (label_refs per partition, supersteps, changed_last)."""
    P = graph.P

    @ray.remote
    def _init(csr):
        return np.arange(csr["vlo"], csr["vhi"], dtype=np.int64)

    labels = [_init.remote(graph.parts[i]) for i in range(P)]
    changed_total = 0
    steps = 0
    for steps in range(1, cfg.max_iterations + 1):
        shards = fanout(
            _push_labels,
            [(graph.parts[i], labels[i], graph.block, P) for i in range(P)],
            P)
        outs = [
            _reduce_labels.options(num_returns=2).remote(
                labels[j], graph.ranges()[j][0], *shards[j])
            for j in range(P)
        ]
        labels = [o[0] for o in outs]
        changed_total = sum(ray.get([o[1] for o in outs]))
        if changed_total == 0:
            break
    return labels, steps, changed_total
