"""Leiden phase 3 — graph aggregation / coarsening (SURVEY.md §2.5 A1/A3).

`aggregate_graph` (custom_leiden.py:611-637) sums edge weights by the
endpoint communities, including community self-loops. Distributed shape:
dense-renumber the surviving community ids, map every CSR slot through the
broadcast level map, partially aggregate (cu, cv, w) inside each partition,
shard by the NEW owner of cu, and build the coarse CSR partitions directly in
the reduce tasks — the "graph-coarsening repartition" of the north rule.

Self-loop convention: the reference's coarse nx self-edge carries the
subset's internal weight counted ONCE per undirected edge
(aggregate_graph iterates G.edges once). Aggregating our symmetrized rows
counts internal u≠v edges twice and original self-loops once, so the reduce
applies W'(c,c) = (W_sym(c,c) + S(c)) / 2 with S(c) = Σ original self-loop
weights inside c.

Scale note: the level map (old vertex → coarse id) is one dense array
broadcast to the mapping tasks; at extreme V this becomes a sharded join on
dst — the exchange already routes by owner so only the lookup side changes.
"""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.csr import build_partition_csr, part_range
from leiden_cuda_ray.graph.runtime import (
    fanout,
    segsum_by_key,
    segsum_by_pair,
    shard_by_owner,
)


@ray.remote
def _uniq_part(assign):
    return np.unique(assign)


@ray.remote
def _assemble_uniq(*parts):
    return np.unique(np.concatenate(parts))


@ray.remote
def _map_part(uniq, assign):
    return np.searchsorted(uniq, assign).astype(np.int64)


@ray.remote
def _assemble_map(*parts):
    return np.concatenate(parts)


@ray.remote
def _push_coarse_edges(csr, level_map, new_block, new_P):
    """Map CSR slots to coarse ids, partial-aggregate, shard by new owner.

    Emits per owner: ((cu, cv, wsum), (cself, s_orig_sum))."""
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + csr["vlo"]
    cu = level_map[src_g]
    cv = level_map[csr["indices"]]
    w = csr["weights"]
    a, b, s = segsum_by_pair(cu, cv, w)
    selfs = src_g == csr["indices"]
    cs, ss = segsum_by_key(cu[selfs], w[selfs])
    s1 = shard_by_owner(a, new_block, new_P, b, s)
    s2 = shard_by_owner(cs, new_block, new_P, ss)
    out = [(s1[j], s2[j]) for j in range(new_P)]
    if new_P == 1:
        return out[0]
    return tuple(out)


@ray.remote
def _build_coarse_part(pid, new_block, new_P, new_V, *shards):
    """Merge shards, correct self-loop weights, build the partition CSR.

    Returns (csr, m_contrib) where Σ m_contrib over partitions = total
    undirected weight of the coarse graph."""
    vlo, vhi = part_range(pid, new_block, new_P, new_V)
    cu = np.concatenate([s[0][0] for s in shards]) if shards else \
        np.empty(0, np.int64)
    cv = np.concatenate([s[0][1] for s in shards]) if shards else \
        np.empty(0, np.int64)
    w = np.concatenate([s[0][2] for s in shards]) if shards else \
        np.empty(0, np.float64)
    cu, cv, w = segsum_by_pair(cu, cv, w)
    cs = np.concatenate([s[1][0] for s in shards]) if shards else \
        np.empty(0, np.int64)
    ss = np.concatenate([s[1][1] for s in shards]) if shards else \
        np.empty(0, np.float64)
    cs, ss = segsum_by_key(cs, ss)

    diag = cu == cv
    if diag.any():
        s_orig = np.zeros(int(diag.sum()), np.float64)
        pos = np.searchsorted(cs, cu[diag])
        if len(cs):
            inb = pos < len(cs)
            hit = np.zeros(len(pos), bool)
            hit[inb] = cs[pos[inb]] == cu[diag][inb]
            s_orig[hit] = ss[pos[hit]]
        w = w.copy()
        w[diag] = (w[diag] + s_orig) / 2.0
    m_contrib = float(w[diag].sum() + w[~diag].sum() / 2.0)
    return build_partition_csr(cu, cv, w, vlo, vhi), m_contrib


@ray.remote
def _coarse_agg_push(assign, uniq, agg, new_block, new_P):
    coarse = np.searchsorted(uniq, assign).astype(np.int64)
    ids, sums = segsum_by_key(coarse, agg.astype(np.float64))
    shards = shard_by_owner(ids, new_block, new_P, sums)
    if new_P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _coarse_agg_reduce(vlo, nv, *shards):
    out = np.zeros(nv, np.int64)
    for ids, sums in shards:
        np.add.at(out, ids - vlo, sums.astype(np.int64))
    return out


def coarsen(graph: Graph, assigns: list, aggs: list | None,
            new_P: int | None = None):
    """Coarsen by per-partition assignment arrays (global community ids).

    Returns (new_graph, level_map_ref, uniq_ref).
    level_map: dense old-V array of coarse ids; uniq: sorted surviving ids.
    """
    P = graph.P
    uniq = _assemble_uniq.remote(*[_uniq_part.remote(a) for a in assigns])
    new_V = int(ray.get(_len.remote(uniq)))
    if new_P is None:
        new_P = max(1, min(P, -(-new_V // max(1, graph.V // max(P, 1)))))
        new_P = min(new_P, new_V)
    new_block = max(1, -(-new_V // new_P))

    level_map = _assemble_map.remote(
        *[_map_part.remote(uniq, a) for a in assigns])

    eshards = fanout(
        _push_coarse_edges,
        [(graph.parts[i], level_map, new_block, new_P) for i in range(P)],
        new_P)

    built = [
        _build_coarse_part.options(num_returns=2).remote(
            j, new_block, new_P, new_V, *eshards[j])
        for j in range(new_P)
    ]
    parts = [b[0] for b in built]
    m_new = float(sum(ray.get([b[1] for b in built])))

    if aggs is None:
        agg_refs = None
    else:
        ashards = fanout(
            _coarse_agg_push,
            [(assigns[i], uniq, aggs[i], new_block, new_P)
             for i in range(P)], new_P)
        agg_refs = [
            _coarse_agg_reduce.remote(
                part_range(j, new_block, new_P, new_V)[0],
                part_range(j, new_block, new_P, new_V)[1]
                - part_range(j, new_block, new_P, new_V)[0],
                *ashards[j])
            for j in range(new_P)
        ]

    new_graph = Graph(V=new_V, P=new_P, block=new_block, parts=parts,
                      m=m_new, sym_edges=-1, agg_refs=agg_refs)
    return new_graph, level_map, uniq


@ray.remote
def _len(arr):
    return len(arr)
