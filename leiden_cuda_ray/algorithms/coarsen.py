"""Leiden phase 3 — graph aggregation / coarsening (SURVEY.md §2.5 A1/A3).

`aggregate_graph` (custom_leiden.py:611-637) sums edge weights by the
endpoint communities, including community self-loops. Distributed shape —
every structure sharded, no task allocates an O(V) array at any P:

 1. surviving-id renumber: each partition routes its distinct community ids
    to the id's owner; owners hold the sorted owned survivors U_k; dense
    coarse ids are offset_k + rank (driver sees only the P sizes);
 2. rank replies: owners answer each origin with the coarse ids of exactly
    the survivors it sent, and origins build their LOCAL level map slice
    (old local vertex → coarse id, O(V/P));
 3. coarse edges in two hops: (dst, cu, w) partially aggregated and routed
    to the OLD owner of dst (which attaches cv from its local map slice),
    then (cu, cv, w) routed to the NEW owner of cu for the final reduce +
    CSR build; original self-loop sums route straight to the new owner.

Self-loop convention: the reference's coarse nx self-edge carries the
subset's internal weight counted ONCE per undirected edge
(aggregate_graph iterates G.edges once). Aggregating our symmetrized rows
counts internal u≠v edges twice and original self-loops once, so the reduce
applies W'(c,c) = (W_sym(c,c) + S(c)) / 2 with S(c) = Σ original self-loop
weights inside c.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.csr import build_partition_csr, owner_of, part_range
from leiden_cuda_ray.graph.runtime import (
    fanout,
    segsum_by_key,
    segsum_by_pair,
    shard_by_owner,
)


@dataclass
class LevelMap:
    """Dendrogram level: per-OLD-partition map slices + both partitionings.

    maps[i][v - vlo_i] = coarse id of old vertex v. Everything needed to
    pull coarse values back to the fine level with a request/reply
    exchange (propagate_level)."""

    maps: list                 # per old partition: ObjectRef[int64 array]
    old_block: object
    old_P: int
    old_V: int
    new_block: object
    new_P: int
    new_V: int
    # owner-sharded survivor tables for rank lookups (maintain_p relabel)
    uniq_refs: list = field(default_factory=list)   # per owner: sorted U_k
    offsets: object = None                          # int64[P] rank offsets


@ray.remote
def _uniq_shard(assign, block, P):
    u = np.unique(assign)
    shards = shard_by_owner(u, block, P)
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _merge_uniq(*shards):
    ids = np.concatenate([s[0] for s in shards]) if shards else \
        np.empty(0, np.int64)
    u = np.unique(ids)
    return u, len(u)


@ray.remote
def _rank_reply(U_k, offset, *shards):
    """Per-origin coarse ids for the survivor ids each origin sent."""
    out = []
    for (ids,) in shards:
        out.append(offset + np.searchsorted(U_k, ids).astype(np.int64))
    if len(shards) == 1:
        return out[0]
    return tuple(out)


@ray.remote
def _local_level_map(assign, *replies):
    """Origin-side map slice: local vertex → coarse id.

    The k-ordered concat of replies aligns exactly with the sorted
    unique(assign) (owner ranges are ascending and disjoint)."""
    uniq = np.unique(assign)
    cids = np.concatenate(replies)
    assert len(cids) == len(uniq)
    return cids[np.searchsorted(uniq, assign)]


@ray.remote
def _push_coarse1(csr, level_map, old_block, old_P, new_block, new_P):
    """Hop 1: (dst, cu, w) partial-aggregated to the OLD owner of dst;
    original self-loop sums (cu, w) straight to the NEW owner of cu."""
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + csr["vlo"]
    cu = level_map[src_slot]
    dst = csr["indices"]
    w = csr["weights"]
    d, c, s = segsum_by_pair(dst, cu, w)
    selfs = src_g == dst
    cs, ss = segsum_by_key(cu[selfs], w[selfs])
    s1 = shard_by_owner(d, old_block, old_P, c, s)
    s2 = shard_by_owner(cs, new_block, new_P, ss)
    return (*s1, *s2) if old_P + new_P > 2 else (s1[0], s2[0])


@ray.remote
def _attach_cv(level_map, vlo, new_block, new_P, *tuple_shards):
    """Hop 2: attach cv from the local map slice, aggregate, route to the
    NEW owner of cu."""
    ds, cs, ws = [], [], []
    for d, c, s in tuple_shards:
        ds.append(d)
        cs.append(c)
        ws.append(s)
    d = np.concatenate(ds) if ds else np.empty(0, np.int64)
    c = np.concatenate(cs) if cs else np.empty(0, np.int64)
    w = np.concatenate(ws) if ws else np.empty(0, np.float64)
    cv = level_map[d - vlo]
    a, b, s = segsum_by_pair(c, cv, w)
    shards = shard_by_owner(a, new_block, new_P, b, s)
    if new_P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _build_coarse_part(pid, new_block, new_P, new_V, n_edge, *shards):
    """Merge shards, correct self-loop weights, build the partition CSR.

    shards = (*edge shards [n_edge], *self-loop shards). Returns
    (csr, m_contrib) where Σ m_contrib = total coarse undirected weight."""
    eshards = shards[:n_edge]
    sshards = shards[n_edge:]
    vlo, vhi = part_range(pid, new_block, new_P, new_V)
    cu = np.concatenate([s[0] for s in eshards]) if eshards else \
        np.empty(0, np.int64)
    cv = np.concatenate([s[1] for s in eshards]) if eshards else \
        np.empty(0, np.int64)
    w = np.concatenate([s[2] for s in eshards]) if eshards else \
        np.empty(0, np.float64)
    cu, cv, w = segsum_by_pair(cu, cv, w)
    cs = np.concatenate([s[0] for s in sshards]) if sshards else \
        np.empty(0, np.int64)
    ss = np.concatenate([s[1] for s in sshards]) if sshards else \
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
    csr = build_partition_csr(cu, cv, w, vlo, vhi)
    return csr, m_contrib, int(len(csr["indices"]))


@ray.remote
def _coarse_agg_push(level_map, agg, new_block, new_P):
    ids, sums = segsum_by_key(level_map, agg.astype(np.float64))
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

    Returns (new_graph, LevelMap)."""
    P = graph.P

    # 1. survivors → owners; driver sees only the P sizes
    sent = fanout(_uniq_shard,
                  [(assigns[i], graph.block, P) for i in range(P)], P)
    merged = [_merge_uniq.options(num_returns=2).remote(*sent[k])
              for k in range(P)]
    sizes = ray.get([m[1] for m in merged])
    uniq_refs = [m[0] for m in merged]
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    new_V = int(np.sum(sizes))

    if new_P is None:
        # adaptive P per level: scale partitions with the SHRUNK vertex
        # count (coarse graphs keep most edge weight but few vertices, so
        # V-proportional partitions keep each one kernel-bound rather than
        # wave-latency-bound). Small levels collapse to P=1 outright: both
        # the fast and the lock loop then run whole-level in a single task
        # (moving._run_level_task / _run_lock_level_task), and coarse
        # levels spend most supersteps in the lock fallback where a
        # distributed wave costs 0.3–0.8 s against ~10 ms in-process
        # (results are bit-identical at any P — tested invariant).
        if new_V <= 32_768:
            new_P = 1
        else:
            new_P = max(1, min(P, -(-new_V // max(1, graph.V
                                                  // max(P, 1)))))
        new_P = min(new_P, new_V)
    new_block = max(1, -(-new_V // new_P))

    # 2. rank replies → local level-map slices
    ranks = [
        _rank_reply.options(num_returns=P if P > 1 else 1).remote(
            uniq_refs[k], int(offsets[k]), *sent[k])
        for k in range(P)
    ]
    if P == 1:
        rank_replies = [[ranks[0]]]
    else:
        rank_replies = [[ranks[k][i] for k in range(P)] for i in range(P)]
    level_maps = [
        _local_level_map.remote(assigns[i], *rank_replies[i])
        for i in range(P)
    ]

    # 3. coarse edges: two hops, then per-new-partition reduce + build
    hop1 = [
        list(_push_coarse1.options(
            num_returns=P + new_P if P + new_P > 2 else 2).remote(
            graph.parts[i], level_maps[i], graph.block, P, new_block,
            new_P))
        for i in range(P)
    ]
    tuple_shards = [[hop1[i][k] for i in range(P)] for k in range(P)]
    self_shards = [[hop1[i][P + j] for i in range(P)] for j in range(new_P)]
    hop2 = []
    for k in range(P):
        r = _attach_cv.options(
            num_returns=new_P if new_P > 1 else 1).remote(
            level_maps[k], graph.ranges()[k][0], new_block, new_P,
            *tuple_shards[k])
        hop2.append(list(r) if new_P > 1 else [r])
    edge_shards = [[hop2[k][j] for k in range(P)] for j in range(new_P)]

    built = [
        _build_coarse_part.options(num_returns=3).remote(
            j, new_block, new_P, new_V, len(edge_shards[j]),
            *edge_shards[j], *self_shards[j])
        for j in range(new_P)
    ]
    parts = [b[0] for b in built]
    scalars = ray.get([r for b in built for r in b[1:]])
    m_new = float(sum(scalars[0::2]))
    nnz = int(sum(scalars[1::2]))

    if aggs is None:
        agg_refs = None
    else:
        ashards = fanout(
            _coarse_agg_push,
            [(level_maps[i], aggs[i], new_block, new_P)
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
                      m=m_new, sym_edges=nnz, agg_refs=agg_refs)
    lm = LevelMap(maps=level_maps, old_block=graph.block, old_P=P,
                  old_V=graph.V, new_block=new_block, new_P=new_P,
                  new_V=new_V, uniq_refs=uniq_refs, offsets=offsets)
    return new_graph, lm


# ---------------------------------------------------- value propagation ----

@ray.remote
def _req_coarse_ids(level_map, new_block, new_P):
    ids = np.unique(level_map)
    shards = shard_by_owner(ids, new_block, new_P)
    if new_P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _serve_values(values, vlo, *req_shards):
    out = []
    for (ids,) in req_shards:
        out.append((ids, values[ids - vlo]))
    if len(req_shards) == 1:
        return out[0]
    return tuple(out)


@ray.remote
def _apply_replies(level_map, *replies):
    ids = np.concatenate([r[0] for r in replies])
    vals = np.concatenate([r[1] for r in replies])
    # owner-ordered concat of disjoint sorted ranges is globally sorted
    return vals[np.searchsorted(ids, level_map)]


def propagate_level(lm: LevelMap, coarse_value_refs: list) -> list:
    """Pull per-coarse-vertex values down one dendrogram level.

    coarse_value_refs: per NEW partition arrays (e.g. final communities).
    Returns per OLD partition arrays — a 2-wave request/reply exchange,
    O(V_old/P) per task (the sharded form of `propagate_partitions`,
    custom_leiden.py:659-677)."""
    P, new_P = lm.old_P, lm.new_P
    reqs = fanout(_req_coarse_ids,
                  [(lm.maps[i], lm.new_block, new_P) for i in range(P)],
                  new_P)
    serves = [
        _serve_values.options(num_returns=P if P > 1 else 1).remote(
            coarse_value_refs[k],
            part_range(k, lm.new_block, new_P, lm.new_V)[0], *reqs[k])
        for k in range(new_P)
    ]
    if P == 1:
        replies = [[serves[k] for k in range(new_P)]]
    else:
        replies = [[serves[k][i] for k in range(new_P)] for i in range(P)]
    return [
        _apply_replies.remote(lm.maps[i], *replies[i]) for i in range(P)
    ]
