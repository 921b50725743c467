"""Distributed per-vertex triangle counting (north-rule, SURVEY.md §2.8).

Degree orientation for hub-skew control: edge u→v is kept iff
(deg_u, u) < (deg_v, v), so every triangle {a,b,c} is discovered exactly once
from its lowest-degree corner and wedge fan-out is O(E^1.5) total instead of
Σ deg² (the reference logs exactly this hub-scan bottleneck for its
vertex-parallel kernel at report.txt:11).

Plan per partition (three sharded exchanges, no dense-V array anywhere):
  1. degree request/reply: each partition asks the owners of exactly the
     vertex ids it references (own + neighbors) and builds a sparse sorted
     (ids, deg) lookup from the replies;
  2. orient local CSR rows with the lookup;
  3. ADJACENCY request/reply: each partition pulls the oriented out-rows
     N⁺(v) of exactly the distinct vertex ids in its oriented neighbor
     lists, merging the replies into a sorted (a*V + b) probe-key array;
  4. wedges are generated AND probed locally, one heap-bounded chunk at a
     time: emit (a, b) for each oriented neighbor pair of local u, test
     b ∈ N⁺(a) against the pulled keys, fold +1 contributions into a
     sparse (id, count) accumulator, and only route the folded sparse
     counts to their owners.

Wedges never cross the wire and never accumulate in the object store.
The previous design shipped every wedge to owner(a) and fan-in probed
them, which meant ALL Σ C(outdeg⁺, 2) wedges were alive in plasma at once
— on sf1's co-commit cliques that is ~10⁹ wedges (a 64-clique alone holds
64³/6 ≈ 44k), which OOM-killed workers un-chunked and filled the spill
disk chunked. Pulled adjacency is bounded by Σ|N⁺(v)| over referenced v
≤ E per partition — linear, not quadratic, in local edges.

Encoding a pair as a*V+b needs V < 2^31.5; larger graphs would switch to a
segmented (per-row searchsorted) membership test — asserted, not silent.

Self-loops are excluded throughout (a self-loop cannot form a triangle).
"""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, shard_by_owner


@ray.remote
def _deg_no_self(csr):
    src_slot = local_src_per_slot(csr)
    nonself = csr["indices"] != (src_slot + csr["vlo"])
    nv = csr["vhi"] - csr["vlo"]
    deg = np.zeros(nv, np.int64)
    np.add.at(deg, src_slot[nonself], 1)
    return deg


@ray.remote
def _request_degs(csr, block, P):
    """Unique referenced vertex ids (neighbors + own), sharded by owner —
    the request half of the degree exchange (no dense-V broadcast)."""
    ids = np.unique(np.concatenate([
        csr["indices"],
        np.arange(csr["vlo"], csr["vhi"], dtype=np.int64)]))
    shards = shard_by_owner(ids, block, P)
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _serve_degs(deg, vlo, *req_shards):
    """Reply (ids, degs) per requesting partition from the local slice."""
    out = []
    for (ids,) in req_shards:
        out.append((ids, deg[ids - vlo]))
    if len(req_shards) == 1:
        return out[0]
    return tuple(out)


def _merge_deg_replies(replies):
    """Per-owner (ids, degs) replies → sorted sparse lookup (concat of
    disjoint ascending owner ranges is globally sorted)."""
    ids = np.concatenate([r[0] for r in replies])
    degs = np.concatenate([r[1] for r in replies])
    return ids, degs


def _orient(csr, deg_lookup):
    """Oriented CSR: keep slot (u→v) iff (deg_u,u) < (deg_v,v), drop selfs.

    Each row's out-neighbors are stored sorted by the ORIENTATION KEY
    (deg, id), not by id: wedge pairs taken in stored order (iu < ju) are
    then already (a, b)-ordered with key(a) < key(b), so the probe needs
    no per-wedge degree lookups at all (two searchsorted passes and five
    temp arrays per wedge batch gone — first-touch page faults across 32
    concurrent workers were the dominant cost of the old kernel).

    deg_lookup: sparse sorted (ids, degs) covering own + neighbor ids."""
    ids, degs = deg_lookup
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + csr["vlo"]
    dst = csr["indices"]
    du = degs[np.searchsorted(ids, src_g)]
    dv = degs[np.searchsorted(ids, dst)]
    keep = (du < dv) | ((du == dv) & (src_g < dst))
    src_k = src_slot[keep]
    dst_k = dst[keep]
    dv_k = dv[keep]
    order = np.lexsort((dst_k, dv_k, src_k))
    src_k = src_k[order]
    dst_k = dst_k[order]
    nv = csr["vhi"] - csr["vlo"]
    counts = np.bincount(src_k, minlength=nv)
    offsets = np.zeros(nv + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return offsets, dst_k, counts


#: heap budget per probe chunk: one chunk never materializes more wedges
#: than this, and wedges never leave the task that generated them.
#: Chunks are spans of the per-partition WEDGE-INDEX space (not row
#: boundaries), so a single hub row with C(outdeg⁺, 2) above the budget
#: is split internally by triu-index ranges — the heap bound holds for
#: any degree distribution.
#:
#: SIZED FOR FIRST-TOUCH COST, not just peak heap: a probe task's chunk
#: loop frees each slab before allocating the next, so its resident heap
#: is one slab's temporaries (~6 int64 arrays ≈ 12 MB at 256k). The
#: previous 2M-wedge slabs made every fresh worker fault ~150 MB of new
#: pages before its first chunk finished — measured 15.0 s cold vs 0.76 s
#: warm for the identical sf0.1 probe wave (32 workers faulting in
#: parallel); at 256k slabs the same cold wave is 0.96 s.
_CHUNK_WEDGES = 262_144

#: target wedges folded per probe task. Each task pays one fixed fold at
#: the end (a bincount over the pulled-key array, which at sf1 is tens of
#: millions of entries per partition), so tasks must stay coarse enough to
#: amortize it; chunks only bound the slab heap, tasks bound the fold
#: count. Per partition: n_tasks = ceil(wedge_total / _WEDGES_PER_TASK),
#: so sf0.1 (74M wedges) runs one task per partition and sf1 (6e9) ~24.
_WEDGES_PER_TASK = 8_000_000


@ray.remote
def _oriented(csr, V, *deg_replies):
    """Per-partition oriented artifacts, built ONCE and shared by every
    serve/probe task through the object store: oriented CSR
    (offsets/nbrs/counts, rows key-sorted) and the per-row wedge-count
    prefix sum used to map wedge-index chunks back to rows."""
    deg_lookup = _merge_deg_replies(deg_replies)
    offsets, nbrs, counts = _orient(csr, deg_lookup)
    w = counts.astype(np.int64)
    w = w * (w - 1) // 2
    wcum = np.zeros(len(w) + 1, np.int64)
    np.cumsum(w, out=wcum[1:])
    return {"offsets": offsets, "nbrs": nbrs, "counts": counts,
            "wcum": wcum, "vlo": csr["vlo"]}


def _plan_chunks(wedge_total):
    """Equal-size chunk bounds over the partition's wedge-index space
    [0, wedge_total): every chunk holds ≤ _CHUNK_WEDGES wedges regardless
    of how skewed the per-row wedge counts are (Σ C(outdeg⁺, 2) explodes
    on co-commit cliques; a single hub row can exceed the budget alone)."""
    bounds = np.arange(0, wedge_total, _CHUNK_WEDGES, dtype=np.int64)
    return np.concatenate([bounds, [wedge_total]])


def _triu_range(k, p0, p1):
    """Pair-index slice [p0, p1) of np.triu_indices(k, 1), computed
    directly (no O(k²) materialization): row-major (i, j) pairs, i < j.

    i(t) solves t ∈ [S(i), S(i+1)) with S(i) = i·k − i(i+1)/2; the float
    closed form is corrected exactly afterwards, so the result is
    bit-identical to slicing np.triu_indices (tested)."""
    t = np.arange(p0, p1, dtype=np.int64)
    b = 2 * k - 1
    i = ((b - np.sqrt(b * b - 8.0 * t)) // 2).astype(np.int64)
    i = np.clip(i, 0, k - 2)
    # exact correction for float rounding (off by at most 1 either way)
    start = i * (2 * k - i - 1) // 2
    i = np.where(t < start, i - 1, i)
    start = i * (2 * k - i - 1) // 2
    nxt = (i + 1) * (2 * k - i - 2) // 2
    i = np.where(t >= nxt, i + 1, i)
    start = i * (2 * k - i - 1) // 2
    j = t - start + i + 1
    return i, j


@ray.remote
def _request_adj(o, block, P):
    """Distinct oriented-neighbor ids, sharded by owner — the request
    half of the adjacency pull."""
    ids = np.unique(o["nbrs"])
    shards = shard_by_owner(ids, block, P)
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _serve_adj(o, *req_shards):
    """Reply (ids, row_lens, nbrs_concat) per requesting partition: the
    oriented out-rows of exactly the requested local ids."""
    offsets, nbrs, counts, vlo = (o["offsets"], o["nbrs"], o["counts"],
                                  o["vlo"])
    out = []
    for (ids,) in req_shards:
        slots = ids - vlo
        lens = counts[slots].astype(np.int64)
        total = int(lens.sum())
        if total:
            starts = offsets[slots]
            base = np.repeat(starts - np.concatenate([[0],
                                                      np.cumsum(lens)[:-1]]),
                             lens)
            sub = nbrs[base + np.arange(total)]
        else:
            sub = np.empty(0, np.int64)
        out.append((ids, lens, sub))
    if len(req_shards) == 1:
        return out[0]
    return tuple(out)


def _wedges_for_span(o, wlo, whi):
    """Wedges (a, b, u) for the partition's wedge-index span [wlo, whi).

    Rows fully inside the span go through one vectorized triu per distinct
    out-degree; a row only partially covered (a hub whose C(outdeg⁺, 2)
    straddles or exceeds the chunk budget) is sliced by _triu_range, so no
    single row can blow the heap bound. Rows are key-sorted, so pairs in
    stored order already satisfy key(a) < key(b)."""
    offsets, nbrs, wcum = o["offsets"], o["nbrs"], o["wcum"]
    vlo = o["vlo"]
    a_out, b_out, u_out = [], [], []

    def _partial(row, p0, p1):
        c = int(o["counts"][row])
        iu, ju = _triu_range(c, p0, p1)
        nb = nbrs[offsets[row]:offsets[row] + c]
        a_out.append(nb[iu])
        b_out.append(nb[ju])
        u_out.append(np.full(p1 - p0, row + vlo, np.int64))

    r0 = int(np.searchsorted(wcum, wlo, side="right")) - 1
    r1 = int(np.searchsorted(wcum, whi, side="left"))  # rows [r0, r1)
    if r0 >= r1:
        e = np.empty(0, np.int64)
        return e, e, e
    full_lo, full_hi = r0, r1
    if wcum[r0] < wlo:  # head row partially covered
        _partial(r0, int(wlo - wcum[r0]), int(min(whi, wcum[r0 + 1])
                                               - wcum[r0]))
        full_lo = r0 + 1
    if full_hi > full_lo and wcum[r1] > whi:  # tail row partially covered
        _partial(r1 - 1, 0, int(whi - wcum[r1 - 1]))
        full_hi = r1 - 1
    if full_hi > full_lo:
        counts = o["counts"][full_lo:full_hi]
        # one vectorized triu per distinct out-degree k among full rows
        for k in np.unique(counts):
            if k < 2:
                continue
            rows = full_lo + np.flatnonzero(counts == k)
            starts = offsets[rows]
            mat = nbrs[starts[:, None] + np.arange(k)]
            iu, ju = np.triu_indices(int(k), 1)
            a_out.append(mat[:, iu].ravel())
            b_out.append(mat[:, ju].ravel())
            u_out.append(np.repeat(rows + vlo, len(iu)))
    if a_out:
        return (np.concatenate(a_out), np.concatenate(b_out),
                np.concatenate(u_out))
    e = np.empty(0, np.int64)
    return e, e, e


@ray.remote
def _merge_adj(V, *adj_replies):
    """Pulled-adjacency probe keys (a*V + b), built ONCE per partition
    and shared by its probe tasks through the object store. Rows are
    key-sorted (not id-sorted), so the concatenation needs one explicit
    sort (K ≤ pulled edges per partition — cheap)."""
    keys_parts = [np.repeat(ids, lens) * V + sub
                  for ids, lens, sub in adj_replies if len(sub)]
    if not keys_parts:
        return np.empty(0, np.int64)
    keys = np.concatenate(keys_parts)
    keys.sort()
    return keys


@ray.remote
def _probe_rows(o, block, P, V, bounds, adj_keys):
    """Generate wedges for the wedge-index chunk spans in `bounds` and
    probe them in place against the pulled oriented adjacency. Only folded
    sparse (id, count) contributions are routed to owners — wedges die
    inside this task.

    Contributions are accumulated WITHOUT per-chunk sorts (the sf1 probe
    is hit-dominated: 4.2e9 of 6.0e9 wedges hit, so sorting 3 ids per hit
    per chunk cost more than the probes themselves): a hit increments its
    POSITION in the sorted pulled-key array (per-chunk bincount append),
    u-legs use a dense per-partition row counter (nv = V/P slots, not
    O(V)), and one fold per TASK maps position counts back to (a, b) ids
    — a_ids come out of the sorted keys pre-sorted, so the final
    segsum_by_key sorts only ~2·distinct-hit-keys values once."""
    from leiden_cuda_ray.graph.runtime import segsum_by_key

    nv = len(o["counts"])
    vlo = o["vlo"]
    u_cnt = np.zeros(nv, np.int64)
    pos_hits = []
    for c in range(len(bounds) - 1):
        a, b, u = _wedges_for_span(o, int(bounds[c]), int(bounds[c + 1]))
        if len(a) == 0 or len(adj_keys) == 0:
            continue
        q = a * V + b
        pos = np.searchsorted(adj_keys, q)
        np.minimum(pos, len(adj_keys) - 1, out=pos)
        hit = adj_keys[pos] == q
        if not hit.any():
            continue
        u_cnt += np.bincount(u[hit] - vlo, minlength=nv)
        pos_hits.append(pos[hit])
    if pos_hits:
        key_cnt = np.bincount(np.concatenate(pos_hits),
                              minlength=len(adj_keys))
        nz = np.flatnonzero(key_cnt)
        keys_nz = adj_keys[nz]
        c_nz = key_cnt[nz].astype(np.float64)
        acc_ids, acc_cnt = segsum_by_key(
            np.concatenate([keys_nz // V, keys_nz % V]),
            np.concatenate([c_nz, c_nz]))
    else:
        acc_ids = np.empty(0, np.int64)
        acc_cnt = np.empty(0, np.float64)
    unz = np.flatnonzero(u_cnt)
    if len(unz):
        acc_ids, acc_cnt = segsum_by_key(
            np.concatenate([acc_ids, unz + vlo]),
            np.concatenate([acc_cnt, u_cnt[unz].astype(np.float64)]))
    shards = shard_by_owner(acc_ids, block, P, acc_cnt)
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _count(vlo, nv, *shards):
    counts = np.zeros(nv, np.int64)
    for ids, cnt in shards:
        if len(ids):
            counts[ids - vlo] += cnt.astype(np.int64)
    return counts


def triangle_counts(graph: Graph):
    """Returns (per-partition triangle-count refs, total_triangles)."""
    assert graph.V < (1 << 31), \
        "pair encoding a*V+b needs V < 2^31; use segmented probe for larger"
    P = graph.P
    degs = [_deg_no_self.remote(p) for p in graph.parts]

    # degree request/reply exchange: every partition gets (ids, deg) for
    # exactly the vertices it references — no dense-V broadcast array
    req_shards = fanout(
        _request_degs,
        [(graph.parts[i], graph.block, P) for i in range(P)], P)
    serves = [
        _serve_degs.options(num_returns=P if P > 1 else 1).remote(
            degs[k], graph.ranges()[k][0], *req_shards[k])
        for k in range(P)
    ]
    if P == 1:
        deg_replies = [[serves[0]]]
    else:
        deg_replies = [[serves[k][i] for k in range(P)] for i in range(P)]

    oriented = [
        _oriented.remote(graph.parts[i], graph.V, *deg_replies[i])
        for i in range(P)
    ]

    # adjacency request/reply exchange: each partition pulls N⁺(v) for
    # exactly the distinct ids in its oriented neighbor lists
    adj_req = fanout(
        _request_adj, [(oriented[i], graph.block, P) for i in range(P)], P)
    adj_serves = [
        _serve_adj.options(num_returns=P if P > 1 else 1).remote(
            oriented[k], *adj_req[k])
        for k in range(P)
    ]
    if P == 1:
        adj_replies = [[adj_serves[0]]]
    else:
        adj_replies = [[adj_serves[k][i] for k in range(P)]
                       for i in range(P)]
    adj_keys = [_merge_adj.remote(graph.V, *adj_replies[i])
                for i in range(P)]

    @ray.remote
    def _wedge_total(o):
        return int(o["wcum"][-1])

    totals = ray.get([_wedge_total.remote(o) for o in oriented])
    bounds = [_plan_chunks(t) for t in totals]

    # local emit+probe: wedges are generated and consumed inside one
    # heap-bounded task. Chunk count bounds the slab heap; TASK count is
    # planned separately per partition (~_WEDGES_PER_TASK wedges each) so
    # the per-task pulled-key fold stays amortized at any scale.
    contrib_shard_lists: list[list] = [[] for _ in range(P)]
    for i in range(P):
        b = bounds[i]
        n_chunks = len(b) - 1
        n_tasks = max(1, -(-totals[i] // _WEDGES_PER_TASK))
        chunks_per_task = max(1, -(-n_chunks // n_tasks))
        for t0 in range(0, n_chunks, chunks_per_task):
            sub = b[t0:t0 + chunks_per_task + 1]
            if sub[0] == sub[-1] and len(b) > 2:
                continue
            r = _probe_rows.options(
                num_returns=P if P > 1 else 1).remote(
                    oriented[i], graph.block, P, graph.V, sub,
                    adj_keys[i])
            refs = list(r) if P > 1 else [r]
            for j in range(P):
                contrib_shard_lists[j].append(refs[j])

    counts = [
        _count.remote(graph.ranges()[j][0],
                      graph.ranges()[j][1] - graph.ranges()[j][0],
                      *contrib_shard_lists[j])
        for j in range(P)
    ]

    @ray.remote
    def _sum(c):
        return int(c.sum())

    total = sum(ray.get([_sum.remote(c) for c in counts])) // 3
    return counts, total
