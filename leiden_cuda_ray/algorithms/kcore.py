"""Distributed k-core decomposition (beyond-reference link-graph operator).

Computes every vertex's core number — the largest k such that the vertex
belongs to a subgraph of minimum degree k — via the h-index fixpoint
iteration (Lu, Zhou, Zhang, Stanley, "The H-index of a network node and
its relation to degree and coreness", Nature Communications 2016):

    c_0(v) = deg(v)            (unweighted, self-loops excluded)
    c_{n+1}(v) = H({ c_n(u) : u ~ v })

where H is the h-index of the neighbor-value multiset (the largest k with
at least k neighbors of value >= k). The sequence is pointwise
non-increasing and converges to the core number in finitely many rounds,
so the synchronous BSP schedule below is exact, not approximate — the
classic sequential min-degree peel (Batagelj-Zaversnik) is inherently
serial, while the h-operator is embarrassingly vertex-parallel.

Distribution shape (same as labelprop.py): each superstep every partition
scans its CSR once and emits (dst, value) pairs COMBINED to per-(dst,value)
counts before crossing the wire — the h-index depends only on the neighbor
VALUE HISTOGRAM, so the count combiner is lossless and per-superstep bytes
are O(distinct (dst,value) pairs), not O(E). Owners merge shards and
evaluate H per vertex with one lexsort + segmented cumsum/reduceat — no
Python loop over vertices. Converges when no value changed.

Reference scope note: the reference (knagaitsev/leiden-cuda) has no k-core
operator; this extends the same CSR-partition infrastructure its Leiden
port uses (graph/runtime.py fan-out exchange).
"""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, segsum_by_pair, shard_by_owner


def _h_per_dst(d: np.ndarray, v: np.ndarray, c: np.ndarray):
    """H-index per destination from combined (dst, value, count) triples.

    For each dst: sort its values descending; with cum(v) = number of
    neighbors of value >= v, H = max over present values of min(v, cum(v)).
    Returns (unique dsts ascending, h per dst). Fully vectorized.
    """
    order = np.lexsort((-v, d))
    d_s, v_s, c_s = d[order], v[order], c[order]
    seg = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
    cum = np.cumsum(c_s)
    base = np.repeat(cum[seg] - c_s[seg],
                     np.diff(np.r_[seg, len(d_s)]))
    within = cum - base  # inclusive per-segment cumulative neighbor count
    h_cand = np.minimum(v_s, within)
    h = np.maximum.reduceat(h_cand, seg) if len(d_s) else h_cand
    return d_s[seg], h


def _simple_mask(csr) -> np.ndarray:
    """Slot mask selecting each DISTINCT non-self neighbor once per row.

    Core numbers are defined on the simple graph: self-loops contribute
    nothing and parallel edges count one neighbor. CSR rows are sorted
    (graph/csr.py), so duplicates are consecutive — one vectorized diff."""
    src_slot = local_src_per_slot(csr)
    dst = csr["indices"]
    first_slot = np.r_[True, src_slot[1:] != src_slot[:-1]] if len(dst) \
        else np.zeros(0, bool)
    fresh = np.r_[True, dst[1:] != dst[:-1]] if len(dst) \
        else np.zeros(0, bool)
    return (first_slot | fresh) & (dst != (src_slot + csr["vlo"]))


@ray.remote
def _push_values(csr, val, block, P):
    src_slot = local_src_per_slot(csr)
    dst = csr["indices"]
    keep = _simple_mask(csr)
    d, v, c = segsum_by_pair(dst[keep], val[src_slot][keep],
                             np.ones(int(keep.sum()), np.int64))
    shards = shard_by_owner(d, block, P, v, c)
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _reduce_h(val, vlo, *shards):
    if all(len(s[0]) == 0 for s in shards):
        return val, 0
    d = np.concatenate([s[0] for s in shards])
    v = np.concatenate([s[1] for s in shards])
    c = np.concatenate([s[2] for s in shards])
    d, v, c = segsum_by_pair(d, v, c)  # merge partial histograms
    dst, h = _h_per_dst(d, v, c)
    new_val = val.copy()
    new_val[dst - vlo] = h  # isolated vertices keep 0 (H of empty set)
    changed = int((new_val != val).sum())
    return new_val, changed


@ray.remote
def _init_degrees(csr):
    """c_0 = simple-graph degree (self-loops and parallel edges excluded,
    via the same slot mask the push uses)."""
    src_slot = local_src_per_slot(csr)
    keep = _simple_mask(csr)
    n_local = csr["vhi"] - csr["vlo"]
    return np.bincount(src_slot[keep],
                       minlength=n_local).astype(np.int64)


def kcore(graph: Graph, max_iterations: int = 200):
    """Returns (core-number refs per partition, supersteps, changed_last).

    `changed_last == 0` certifies the h-operator fixpoint was reached, i.e.
    the values ARE the core numbers (not a truncated approximation)."""
    P = graph.P
    values = [_init_degrees.remote(graph.parts[i]) for i in range(P)]
    changed_total = 0
    steps = 0
    for steps in range(1, max_iterations + 1):
        shards = fanout(
            _push_values,
            [(graph.parts[i], values[i], graph.block, P) for i in range(P)],
            P)
        outs = [
            _reduce_h.options(num_returns=2).remote(
                values[j], graph.ranges()[j][0], *shards[j])
            for j in range(P)
        ]
        values = [o[0] for o in outs]
        changed_total = sum(ray.get([o[1] for o in outs]))
        if changed_total == 0:
            break
    return values, steps, changed_total
