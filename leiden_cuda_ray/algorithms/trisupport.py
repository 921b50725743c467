"""Per-edge triangle support (the k-truss support metric).

support(u, v) = number of triangles containing edge {u, v} — the base
quantity of truss decomposition (Cohen, "Trusses: cohesive subgraphs
for social network analysis", 2008) and a standard edge-strength /
community-pruning signal. Reuses the triangle module's scale design
wholesale: degree orientation, sparse degree and adjacency
request/reply exchanges, and heap-bounded wedge-index chunking
(algorithms/triangles.py) — wedges are generated and probed inside one
task and never travel.

The difference from counting: a hit wedge (a, b) centered at u closes
triangle {u, a, b} and must credit all THREE edges {a,b}, {u,a}, {u,b}.
The probe stays bincount-only even so (the triangles-module
discipline — a first design that seg-summed 3 canonical keys per hit
ran 6.4× the triangle count at sf1): the closing edge increments its
POSITION in the pulled-key array, and the two legs increment their
SLOT in the local oriented CSR (the wedge generator also emits leg
slot indices), so per-chunk work is three bincounts over
partition-local arrays and one per-task fold maps both sparse
counters to canonical edge keys.

Output: one row per canonical non-self edge (src < dst) with its
support (0 if the edge is in no triangle) — rows emitted per partition
from its own CSR slots, counts routed by owner(min endpoint).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.algorithms.triangles import (
    _deg_no_self,
    _merge_adj,
    _oriented,
    _plan_chunks,
    _request_adj,
    _request_degs,
    _serve_adj,
    _serve_degs,
    _WEDGES_PER_TASK,
)
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, segsum_by_key, shard_by_owner

def _wedges_with_slots(o, wlo, whi):
    """_wedges_for_span plus the absolute SLOT indices (into o['nbrs'])
    of each wedge's two legs: wedge (a, b) at center u comes from slots
    (u→a) and (u→b) of the local oriented CSR, so per-edge leg credits
    can accumulate as bincounts over slot indices instead of per-hit
    key segsums (the 6.4× tri_support-vs-triangles cost at sf1 was
    exactly those segsums). Returns (a, b, sa, sb)."""
    offsets, nbrs, wcum = o["offsets"], o["nbrs"], o["wcum"]
    a_out, b_out, sa_out, sb_out = [], [], [], []

    def _partial(row, p0, p1):
        from leiden_cuda_ray.algorithms.triangles import _triu_range

        c = int(o["counts"][row])
        iu, ju = _triu_range(c, p0, p1)
        base = offsets[row]
        nb = nbrs[base:base + c]
        a_out.append(nb[iu])
        b_out.append(nb[ju])
        sa_out.append(base + iu)
        sb_out.append(base + ju)

    r0 = int(np.searchsorted(wcum, wlo, side="right")) - 1
    r1 = int(np.searchsorted(wcum, whi, side="left"))
    if r0 >= r1:
        e = np.empty(0, np.int64)
        return e, e, e, e
    full_lo, full_hi = r0, r1
    if wcum[r0] < wlo:
        _partial(r0, int(wlo - wcum[r0]), int(min(whi, wcum[r0 + 1])
                                               - wcum[r0]))
        full_lo = r0 + 1
    if full_hi > full_lo and wcum[r1] > whi:
        _partial(r1 - 1, 0, int(whi - wcum[r1 - 1]))
        full_hi = r1 - 1
    if full_hi > full_lo:
        counts = o["counts"][full_lo:full_hi]
        for k in np.unique(counts):
            if k < 2:
                continue
            rows = full_lo + np.flatnonzero(counts == k)
            starts = offsets[rows]
            mat = nbrs[starts[:, None] + np.arange(k)]
            iu, ju = np.triu_indices(int(k), 1)
            a_out.append(mat[:, iu].ravel())
            b_out.append(mat[:, ju].ravel())
            sa_out.append((starts[:, None] + iu[None, :]).ravel())
            sb_out.append((starts[:, None] + ju[None, :]).ravel())
    if a_out:
        return (np.concatenate(a_out), np.concatenate(b_out),
                np.concatenate(sa_out), np.concatenate(sb_out))
    e = np.empty(0, np.int64)
    return e, e, e, e


@ray.remote
def _probe_support(o, block, P, V, bounds, adj_keys):
    """Probe the wedge spans in `bounds`; accumulate per-edge credits
    WITHOUT per-hit segsums (the triangles-module discipline): the
    closing edge (a, b) increments its POSITION in the pulled-key array,
    the two legs increment their SLOT in the local oriented CSR — three
    bincounts per chunk, all bounded by partition-local array sizes.
    One fold per TASK maps both sparse counters to canonical edge keys
    and shards them by owner(min endpoint)."""
    nslots = len(o["nbrs"])
    vlo = o["vlo"]
    slot_cnt = np.zeros(nslots, np.int64)
    pos_hits = []
    for ci in range(len(bounds) - 1):
        a, b, sa, sb = _wedges_with_slots(o, int(bounds[ci]),
                                          int(bounds[ci + 1]))
        if len(a) == 0 or len(adj_keys) == 0:
            continue
        q = a * V + b
        pos = np.searchsorted(adj_keys, q)
        np.minimum(pos, len(adj_keys) - 1, out=pos)
        hit = adj_keys[pos] == q
        if not hit.any():
            continue
        slot_cnt += np.bincount(sa[hit], minlength=nslots)
        slot_cnt += np.bincount(sb[hit], minlength=nslots)
        pos_hits.append(pos[hit])
    keys_parts: list[np.ndarray] = []
    cnt_parts: list[np.ndarray] = []
    if pos_hits:
        key_cnt = np.bincount(np.concatenate(pos_hits),
                              minlength=len(adj_keys))
        nz = np.flatnonzero(key_cnt)
        kk = adj_keys[nz]
        aa = kk // V
        bb = kk - aa * V
        keys_parts.append(np.minimum(aa, bb) * V + np.maximum(aa, bb))
        cnt_parts.append(key_cnt[nz].astype(np.float64))
    snz = np.flatnonzero(slot_cnt)
    if len(snz):
        nv = len(o["counts"])
        row_of_slot = np.repeat(np.arange(nv, dtype=np.int64),
                                o["counts"])
        u_g = row_of_slot[snz] + vlo
        t_g = o["nbrs"][snz]
        keys_parts.append(np.minimum(u_g, t_g) * V
                          + np.maximum(u_g, t_g))
        cnt_parts.append(slot_cnt[snz].astype(np.float64))
    if keys_parts:
        acc_k, acc_c = segsum_by_key(np.concatenate(keys_parts),
                                     np.concatenate(cnt_parts))
    else:
        acc_k = np.empty(0, np.int64)
        acc_c = np.empty(0, np.float64)
    owner_key = acc_k // V  # min endpoint owns the edge row
    shards = shard_by_owner(owner_key, block, P, acc_k, acc_c)
    out = [(s[1], s[2]) for s in shards]  # (edge_keys, counts)
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _emit_edges(csr, V, *shards):
    """One partition's output rows: every canonical non-self edge
    (src < dst) with src local, support summed from the routed shards."""
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + csr["vlo"]
    dst = csr["indices"]
    canon = dst > src_g  # canonical orientation; drops selfs + mirrors
    s = src_g[canon]
    d = dst[canon]
    keys = s * V + d  # row-major + per-row dst sort ⇒ already ascending
    support = np.zeros(len(keys), np.int64)
    for ek, cnt in shards:
        if len(ek) == 0:
            continue
        pos = np.searchsorted(keys, ek)
        if len(keys):
            np.minimum(pos, len(keys) - 1, out=pos)
            ok = keys[pos] == ek
        else:
            ok = np.zeros(len(ek), bool)
        if not ok.all():
            raise ValueError(
                "triangle support routed to a non-existent edge — "
                "orientation/ownership mismatch")
        np.add.at(support, pos, cnt.astype(np.int64))
    return pa.table({
        "src": pa.array(s, pa.int64()),
        "dst": pa.array(d, pa.int64()),
        "support": pa.array(support, pa.int64()),
    })


def triangle_support(graph: Graph):
    """Returns a Dataset[src:int64, dst:int64, support:int64] with one
    row per canonical non-self edge."""
    import ray.data

    assert graph.V < (1 << 31), \
        "pair encoding a*V+b needs V < 2^31; use segmented probe for larger"
    P = graph.P
    degs = [_deg_no_self.remote(p) for p in graph.parts]
    req_shards = fanout(
        _request_degs,
        [(graph.parts[i], graph.block, P) for i in range(P)], P)
    serves = [
        _serve_degs.options(num_returns=P if P > 1 else 1).remote(
            degs[k], graph.ranges()[k][0], *req_shards[k])
        for k in range(P)
    ]
    deg_replies = ([[serves[0]]] if P == 1 else
                   [[serves[k][i] for k in range(P)] for i in range(P)])
    oriented = [
        _oriented.remote(graph.parts[i], graph.V, *deg_replies[i])
        for i in range(P)
    ]
    adj_req = fanout(
        _request_adj, [(oriented[i], graph.block, P) for i in range(P)], P)
    adj_serves = [
        _serve_adj.options(num_returns=P if P > 1 else 1).remote(
            oriented[k], *adj_req[k])
        for k in range(P)
    ]
    adj_replies = ([[adj_serves[0]]] if P == 1 else
                   [[adj_serves[k][i] for k in range(P)] for i in range(P)])
    adj_keys = [_merge_adj.remote(graph.V, *adj_replies[i])
                for i in range(P)]

    @ray.remote
    def _wedge_total(o):
        return int(o["wcum"][-1])

    totals = ray.get([_wedge_total.remote(o) for o in oriented])
    bounds = [_plan_chunks(t) for t in totals]

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
            r = _probe_support.options(
                num_returns=P if P > 1 else 1).remote(
                    oriented[i], graph.block, P, graph.V, sub,
                    adj_keys[i])
            refs = list(r) if P > 1 else [r]
            for j in range(P):
                contrib_shard_lists[j].append(refs[j])

    blocks = [
        _emit_edges.remote(graph.parts[j], graph.V,
                           *contrib_shard_lists[j])
        for j in range(P)
    ]
    return ray.data.from_arrow_refs(blocks)


@ray.remote
def _dropped_shards(tbl, V, block, P, thresh):
    """One support block → per-owner canonical keys of its DROPPED
    edges, delivered to BOTH endpoint owners (each must mask its own
    direction's slots)."""
    sup = np.asarray(tbl.column("support"), np.int64)
    m = sup < thresh
    a = np.asarray(tbl.column("src"), np.int64)[m]
    b = np.asarray(tbl.column("dst"), np.int64)[m]
    keys = a * V + b  # src < dst by construction
    sa = shard_by_owner(a, block, P, keys)
    sb = shard_by_owner(b, block, P, keys)
    out = tuple(np.concatenate([sa[j][1], sb[j][1]]) for j in range(P))
    return out if P > 1 else out[0]


@ray.remote(num_returns=3)
def _mask_part(csr, V, *key_shards):
    """Drop the routed canonical edges from one CSR partition IN PLACE:
    no surviving edge travels — the per-round exchange is bounded by
    the DROPPED edge count, not the graph size (a full fused rebuild
    re-shuffles every surviving edge and dominated sf1 peel rounds).
    Returns (filtered csr, kept canonical weight, kept slot count)."""
    from leiden_cuda_ray.graph.csr import build_partition_csr

    parts = [s for s in key_shards if len(s)]
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + csr["vlo"]
    dst = csr["indices"]
    if not parts:  # nothing dropped here: partition unchanged
        canon0 = dst > src_g
        return csr, float(csr["weights"][canon0].sum()), int(len(dst))
    dropped = np.unique(np.concatenate(parts))
    kk = np.minimum(src_g, dst) * V + np.maximum(src_g, dst)
    pos = np.searchsorted(dropped, kk)
    np.minimum(pos, len(dropped) - 1, out=pos)
    keep = dropped[pos] != kk
    s = src_g[keep]
    d = dst[keep]
    w = csr["weights"][keep]
    canon = d > s
    new_csr = build_partition_csr(s, d, w, csr["vlo"], csr["vhi"],
                                  presorted=True)
    return new_csr, float(w[canon].sum()), int(len(s))


def _peel_graph(graph: Graph, sup_mat, thresh: int) -> Graph:
    """New Graph with the below-threshold edges of `sup_mat` (a
    materialized support Dataset) removed — same V/P/block, slots
    masked locally, only dropped keys cross the wire."""
    refs = []
    for bundle in sup_mat.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    shard_refs = [
        _dropped_shards.options(num_returns=graph.P if graph.P > 1 else 1)
        .remote(r, graph.V, graph.block, graph.P, thresh)
        for r in refs]
    if graph.P == 1:
        per_owner = [[s for s in shard_refs]]
    else:
        per_owner = [[shard_refs[i][j] for i in range(len(shard_refs))]
                     for j in range(graph.P)]
    outs = [_mask_part.remote(graph.parts[j], graph.V, *per_owner[j])
            for j in range(graph.P)]
    parts = [o[0] for o in outs]
    stats = ray.get([(o[1]) for o in outs])
    slot_counts = ray.get([(o[2]) for o in outs])
    return Graph(V=graph.V, P=graph.P, block=graph.block, parts=parts,
                 m=float(sum(stats)), sym_edges=int(sum(slot_counts)))


def ktruss(graph: Graph, k: int = 4, max_rounds: int = 12,
           checkpointer=None, resume: bool = False):
    """k-truss subgraph by iterative support peeling: repeatedly drop
    every edge with support < k-2 and recompute support on the remaining
    subgraph until no edge drops (Cohen 2008). Returns
    (Dataset[src, dst, support], rounds) — the surviving canonical edges
    with their support IN THE FINAL subgraph (all ≥ k-2 by convergence).

    Each round is one full triangle_support pass plus an IN-PLACE edge
    drop (`_peel_graph`): only the DROPPED canonical keys cross the
    wire (routed to both endpoint owners, slots masked locally), so the
    per-round exchange is bounded by the drop count — a full fused
    rebuild re-shuffled every surviving edge and dominated sf1 rounds.
    Edge sets only shrink, so work per round is monotonically
    non-increasing, and the peel typically converges in a handful of
    rounds. max_rounds must not exceed the DuckDB oracle's unroll
    depth; exceeding it raises loudly rather than returning an
    unverifiable result.

    checkpointer: state.Checkpointer — the surviving subgraph (the
    whole inter-round state) is saved after every drop; resume=True
    reloads the latest round's subgraph and continues the peel there,
    so a killed sf1-scale run (~tri_support cost × rounds) repeats at
    most one round. `rounds` is the ABSOLUTE peel round at convergence
    (resume continues the numbering; a converged-manifest resume
    returns 1 — a single support re-derivation)."""
    import pyarrow.compute as pc
    import ray.data

    thresh = k - 2
    g = graph
    start_round = 1
    if resume and checkpointer is not None:
        man = checkpointer.latest()
        if man is not None:
            g = checkpointer.load_level_graph(man["level"])
            if man["metrics"].get("converged"):
                # final subgraph saved: one support pass re-derives the
                # (all ≥ k-2) per-edge supports, no peeling needed
                return triangle_support(g), 1
            start_round = man["level"] + 1
    for rounds in range(start_round, max_rounds + 1):
        sup = triangle_support(g).materialize()

        def _nlow(t: pa.Table) -> pa.Table:
            low = pc.less(t.column("support"), thresh)
            n = pc.sum(pc.cast(low, pa.int64())).as_py() or 0
            return pa.table({"n_low": pa.array([n], pa.int64()),
                             "n_all": pa.array([t.num_rows], pa.int64())})

        stats = sup.map_batches(_nlow, batch_format="pyarrow")
        agg = stats.sum(["n_low", "n_all"])
        n_low, n_all = agg["sum(n_low)"], agg["sum(n_all)"]
        if n_low == 0:
            if checkpointer is not None:
                checkpointer.save_round_graph(
                    max(rounds - 1, start_round - 1), g,
                    {"converged": True, "k": k, "n_edges": int(n_all)})
            return sup, rounds
        if n_low == n_all:  # nothing survives
            empty = pa.table({"src": pa.array([], pa.int64()),
                              "dst": pa.array([], pa.int64()),
                              "support": pa.array([], pa.int64())})
            return ray.data.from_arrow(empty), rounds

        g = _peel_graph(g, sup, thresh)
        if checkpointer is not None:
            checkpointer.save_round_graph(
                rounds, g,
                {"converged": False, "k": k,
                 "n_edges": int(n_all - n_low)})
    raise ValueError(
        f"k-truss peel did not converge within {max_rounds} rounds — "
        f"raise max_rounds AND the oracle's unroll depth together")


# --------------------------------------------------------------------------
# derived per-vertex / per-edge similarity metrics over the support stream
# --------------------------------------------------------------------------

def clustering_coefficient(graph: Graph):
    """Per-vertex local clustering coefficient: tri(v) = triangles
    containing v, degree(v) = distinct neighbors, coeff = 2·tri /
    (deg·(deg−1)) (0.0 when deg < 2 — the standard convention).

    Rides the per-edge triangle-support stream: each canonical edge
    appears exactly once with its exact support, so per-endpoint COUNT is
    the distinct-neighbor degree and per-endpoint SUM(support) counts
    every triangle at v twice (a triangle touches v through two incident
    edges, each carrying it in their support). One batch-local partial
    aggregation then a single groupby shuffle over ≤2 partial rows per
    vertex — no join, no O(V) driver state. Isolated (degree-0) vertices
    have no incident edge and are excluded.

    Returns Dataset[vertex:int64, tri:int64, degree:int64,
    coeff:float64]."""
    import ray.data  # noqa: F401  (Dataset ops below)

    sup = triangle_support(graph)

    def partial(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"), np.int64)
        d = np.asarray(batch.column("dst"), np.int64)
        w = np.asarray(batch.column("support"), np.int64)
        u, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
        tri2 = np.zeros(len(u), np.int64)
        np.add.at(tri2, inv, np.concatenate([w, w]))
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table({"vertex": pa.array(u, pa.int64()),
                         "tri2": pa.array(tri2, pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())})

    agg = (sup.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
           .groupby("vertex").sum(["tri2", "cnt"]))

    def finish(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("vertex"), np.int64)
        tri = np.asarray(batch.column("sum(tri2)"), np.int64) // 2
        deg = np.asarray(batch.column("sum(cnt)"), np.int64)
        den = (deg * (deg - 1)).astype(np.float64)
        coeff = np.where(
            deg > 1,
            np.round((2 * tri).astype(np.float64)
                     / np.where(den > 0, den, 1.0), 6),
            0.0)
        return pa.table({"vertex": pa.array(v, pa.int64()),
                         "tri": pa.array(tri, pa.int64()),
                         "degree": pa.array(deg, pa.int64()),
                         "coeff": pa.array(coeff, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


@ray.remote
def _part_degrees(part: dict) -> pa.Table:
    """One CSR partition's (vertex, degree) rows — row lengths are the
    distinct-neighbor degrees of the dedup'd symmetrized graph (self-loop
    free by construction of the corpus derive; callers with self-loops
    should strip them first). Degree-0 vertices are excluded."""
    deg = part["deg"]
    nz = np.flatnonzero(deg)
    return pa.table({"vertex": pa.array(nz + part["vlo"], pa.int64()),
                     "degree": pa.array(deg[nz], pa.int64())})


def edge_jaccard(graph: Graph):
    """Per-edge neighborhood Jaccard similarity (link-strength scoring):
    for every canonical non-self edge (u, v), inter = |N(u) ∩ N(v)| (the
    edge's triangle support) and uni = |N(u) ∪ N(v)| = deg(u) + deg(v)
    − inter. Convention: N(u) is the raw neighbor set, so v ∈ N(u) and
    u ∈ N(v) — uni ≥ 2 always, no zero division. jaccard = inter / uni
    rounded to 6.

    Composition: the triangle-support stream supplies inter; degrees come
    straight from the CSR partitions (vertex-aligned, no shuffle) and are
    attached with two distributed int-key hash joins — E rows through
    each, no broadcast of O(V) state.

    Returns Dataset[src:int64, dst:int64, inter:int64, uni:int64,
    jaccard:float64]."""
    import ray.data

    from leiden_cuda_ray.stages.joins import hash_join

    sup = triangle_support(graph)
    degs = ray.data.from_arrow_refs(
        [_part_degrees.remote(p) for p in graph.parts])

    j1 = hash_join(sup, degs, on=("src",), right_on=("vertex",))

    def keep1(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("src"),
                         "dst": batch.column("dst"),
                         "support": batch.column("support"),
                         "deg_src": batch.column("degree")})

    j2 = hash_join(j1.map_batches(keep1, batch_format="pyarrow"),
                   degs, on=("dst",), right_on=("vertex",))

    def finish(batch: pa.Table) -> pa.Table:
        inter = np.asarray(batch.column("support"), np.int64)
        uni = (np.asarray(batch.column("deg_src"), np.int64)
               + np.asarray(batch.column("degree"), np.int64) - inter)
        jac = np.round(inter.astype(np.float64) / uni.astype(np.float64), 6)
        return pa.table({"src": batch.column("src"),
                         "dst": batch.column("dst"),
                         "inter": pa.array(inter, pa.int64()),
                         "uni": pa.array(uni, pa.int64()),
                         "jaccard": pa.array(jac, pa.float64())})

    return j2.map_batches(finish, batch_format="pyarrow")
