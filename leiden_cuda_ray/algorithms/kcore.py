"""Distributed k-core decomposition (beyond-reference link-graph operator).

Computes every vertex's core number — the largest k such that the vertex
belongs to a subgraph of minimum degree k — by h-index relaxation
(Lu, Zhou, Zhang, Stanley, Nature Communications 2016):

    c_0(v) = deg(v)            (simple graph: self-loops and parallel
                                edges contribute nothing)
    c(v)  <- H({ c(u) : u ~ v })   until nothing changes

where H is the h-index of the neighbor-value multiset. Estimates are
pointwise non-increasing, bounded below by the core number, and ANY fair
update schedule converges to exactly the core numbers (Montresor, De
Pellegrini, Miorandi, "Distributed k-core decomposition", IEEE TPDS 2013)
— so the schedule is free to exploit locality:

Superstep = one cross-partition exchange + local relaxation to fixpoint.
Each partition pushes (dst, value) COUNT pairs for its cross-partition
edges only (the h-index needs just the value histogram, so the combiner
is lossless), then every owner re-relaxes its local subgraph to a LOCAL
fixpoint with the remote contributions held fixed — one vectorized
segsum + lexsort sweep per local iteration, no Python loop over vertices.
Intra-partition peeling cascades (the dominant structure here: corpus
vertex ids are (repo, path)-sorted, so intra-repo co-commit cliques land
in one contiguous range) collapse inside a single superstep instead of
paying one BSP barrier per h-step; only cross-partition propagation costs
rounds. The pure synchronous schedule needed 92 rounds at sf0.1 — local
relaxation needs the cross-partition dependency depth only.

Termination: a superstep in which NO vertex changed recomputed H for
every vertex from fresh neighbor values and kept it — that certifies the
global fixpoint, i.e. the values ARE the core numbers.

Reference scope note: the reference (knagaitsev/leiden-cuda) has no
k-core operator; this extends the CSR-partition infrastructure its
Leiden port uses (graph/runtime.py fan-out exchange).
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
    if len(d) == 0:
        return d, v
    order = np.lexsort((-v, d))
    d_s, v_s, c_s = d[order], v[order], c[order]
    seg = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
    cum = np.cumsum(c_s)
    base = np.repeat(cum[seg] - c_s[seg],
                     np.diff(np.r_[seg, len(d_s)]))
    within = cum - base  # inclusive per-segment cumulative neighbor count
    h_cand = np.minimum(v_s, within)
    return d_s[seg], np.maximum.reduceat(h_cand, seg)


def _simple_mask(csr) -> np.ndarray:
    """Slot mask selecting each DISTINCT non-self neighbor once per row.

    Core numbers are defined on the simple graph: self-loops contribute
    nothing and parallel edges count one neighbor. CSR rows are sorted
    (graph/csr.py), so duplicates are consecutive — one vectorized diff."""
    src_slot = local_src_per_slot(csr)
    dst = csr["indices"]
    if len(dst) == 0:
        return np.zeros(0, bool)
    first_slot = np.r_[True, src_slot[1:] != src_slot[:-1]]
    fresh = np.r_[True, dst[1:] != dst[:-1]]
    return (first_slot | fresh) & (dst != (src_slot + csr["vlo"]))


def _ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenated [start, start+count) index ranges, no Python loop."""
    tot = int(counts.sum())
    if tot == 0:
        return np.zeros(0, np.int64)
    ends = np.cumsum(counts)
    within = np.arange(tot, dtype=np.int64) - np.repeat(ends - counts,
                                                        counts)
    return np.repeat(starts, counts) + within


@ray.remote
def _make_plan(csr):
    """One-time per-partition edge plan: simple-graph slots split into
    intra-partition (relaxed locally every sweep) and cross-partition
    (pushed once per superstep). Local edges stay src-sorted with a CSR
    offset array so a frontier's incident edges are gathered by range.
    Also returns c_0 = simple degree."""
    src_slot = local_src_per_slot(csr)
    keep = _simple_mask(csr)
    s, d = src_slot[keep], csr["indices"][keep]
    vlo, vhi = csr["vlo"], csr["vhi"]
    lm = (d >= vlo) & (d < vhi)
    n_local = vhi - vlo
    src_l, dst_l = s[lm], d[lm] - vlo
    src_r, dst_r = s[~lm], d[~lm]
    plan = {
        "vlo": int(vlo),
        "n_local": int(n_local),
        "dst_l": dst_l,                          # local slot -> local slot
        "off_l": np.searchsorted(src_l, np.arange(n_local + 1)),
        "dst_r": dst_r,                          # local slot -> global id
        "off_r": np.searchsorted(src_r, np.arange(n_local + 1)),
    }
    deg = np.bincount(s, minlength=n_local).astype(np.int64)
    return plan, deg


@ray.remote
def _push_remote(plan, val, block, P):
    """Bootstrap full push: each cross edge contributes (dst, val[src])."""
    src_r = np.repeat(np.arange(plan["n_local"], dtype=np.int64),
                      np.diff(plan["off_r"]))
    d, v, c = segsum_by_pair(plan["dst_r"], val[src_r],
                             np.ones(len(plan["dst_r"]), np.int64))
    shards = shard_by_owner(d, block, P, v, c)
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _relax_step(plan, val, rhist, block, P, *in_shards):
    """One fused superstep: merge incoming cross-partition histogram
    DELTAS into the cached remote histogram, relax the local subgraph to
    its fixpoint, and emit outgoing deltas for the owner's own changes.

    Frontier-incremental: the opening frontier is exactly the delta
    destinations (the local subgraph already sat at a local fixpoint
    w.r.t. the old remote values, so nothing else can move); each
    subsequent sweep touches only the local neighbors of vertices that
    just changed — sweep cost is O(edges incident to the frontier), not
    O(E_local). Values only decrease (H is monotone, every input only
    decreases) and each continuing sweep strictly decreases some value,
    so termination is guaranteed. Wire cost per superstep is
    O(cross edges of CHANGED vertices), not O(E_cross).

    Returns (new values, #changed, updated remote histogram,
    *P outgoing delta shards)."""
    vlo = plan["vlo"]
    n_local = plan["n_local"]
    ne = [s for s in in_shards if len(s[0])]
    if ne:
        dd = np.concatenate([s[0] for s in ne]) - vlo
        dv = np.concatenate([s[1] for s in ne])
        dc = np.concatenate([s[2] for s in ne])
        dd, dv, dc = segsum_by_pair(dd, dv, dc)
    else:
        dd = dv = dc = np.zeros(0, np.int64)
    if rhist is None:
        # bootstrap: the incoming shards ARE the full histogram
        rd, rv, rc = dd, dv, dc
        frontier = np.arange(n_local, dtype=np.int64)
    else:
        rd, rv, rc = rhist
        rd, rv, rc = segsum_by_pair(
            np.concatenate([rd, dd]), np.concatenate([rv, dv]),
            np.concatenate([rc, dc]))
        nz = rc != 0
        rd, rv, rc = rd[nz], rv[nz], rc[nz]
        frontier = np.unique(dd)
    off, dst_l = plan["off_l"], plan["dst_l"]
    start = val
    cur = val
    while len(frontier):
        cnt = off[frontier + 1] - off[frontier]
        e = _ranges(off[frontier], cnt)
        # raw (dst, neighbor-value, count) rows for the frontier: local
        # neighbor values read live, remote rows spliced from the cached
        # histogram; _h_per_dst tolerates duplicate (d, v) rows (counts
        # accumulate in its per-segment cumsum)
        lo = np.searchsorted(rd, frontier)
        hi = np.searchsorted(rd, frontier, side="right")
        re_ = _ranges(lo, hi - lo)
        md = np.concatenate([np.repeat(frontier, cnt), rd[re_]])
        mv = np.concatenate([cur[dst_l[e]], rv[re_]])
        mc = np.concatenate([np.ones(len(e), np.int64), rc[re_]])
        dsts, h = _h_per_dst(md, mv, mc)
        moved = dsts[cur[dsts] != h]
        if len(moved) == 0:
            break
        nxt = cur.copy()
        nxt[dsts] = h  # no-neighbor vertices keep 0 (H of empty set)
        cur = nxt
        mcnt = off[moved + 1] - off[moved]
        frontier = np.unique(dst_l[_ranges(off[moved], mcnt)])
    # outgoing deltas: retract the old value, assert the new, for every
    # cross edge of every changed vertex
    ch = np.flatnonzero(cur != start)
    off_r, dst_r = plan["off_r"], plan["dst_r"]
    ccnt = off_r[ch + 1] - off_r[ch]
    er = _ranges(off_r[ch], ccnt)
    src_rep = np.repeat(ch, ccnt)
    od = np.concatenate([dst_r[er], dst_r[er]])
    ov = np.concatenate([start[src_rep], cur[src_rep]])
    oc = np.concatenate([np.full(len(er), -1, np.int64),
                         np.ones(len(er), np.int64)])
    if len(od):
        od, ov, oc = segsum_by_pair(od, ov, oc)
        nz = oc != 0
        od, ov, oc = od[nz], ov[nz], oc[nz]
    shards = shard_by_owner(od, block, P, ov, oc)
    return (cur, int(len(ch)), (rd, rv, rc), *shards)


def kcore(graph: Graph, max_iterations: int = 500):
    """Returns (core-number refs per partition, supersteps, changed_last).

    `changed_last == 0` certifies the h-operator fixpoint was reached,
    i.e. the values ARE the core numbers (not a truncated approximation).
    `supersteps` counts cross-partition exchanges, not h-steps."""
    P = graph.P
    inits = [_make_plan.options(num_returns=2).remote(graph.parts[i])
             for i in range(P)]
    plans = [o[0] for o in inits]
    values = [o[1] for o in inits]
    rhists: list = [None] * P
    # bootstrap wave: full cross-edge histograms (deltas after that)
    in_shards = fanout(
        _push_remote,
        [(plans[i], values[i], graph.block, P) for i in range(P)],
        P)
    changed_total = 0
    steps = 0
    for steps in range(1, max_iterations + 1):
        outs = [
            _relax_step.options(num_returns=3 + P).remote(
                plans[j], values[j], rhists[j], graph.block, P,
                *in_shards[j])
            for j in range(P)
        ]
        values = [o[0] for o in outs]
        rhists = [o[2] for o in outs]
        in_shards = [[outs[i][3 + j] for i in range(P)] for j in range(P)]
        changed_total = sum(ray.get([o[1] for o in outs]))
        if changed_total == 0:
            break
    return values, steps, changed_total
