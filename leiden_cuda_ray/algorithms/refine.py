"""Leiden phase 2 — distributed refinement (SURVEY.md §2.4).

`refine_partition` (custom_leiden.py:463-485) resets every vertex to a
singleton community and refines each subset S (a community of the moving
partition P) independently; subsets are independent because well-connectivity
and CPM deltas only read state inside S (custom_leiden.py:350-460).

Distributed shape: two sharded exchanges co-locate each subset's vertices and
intra-subset edges on one task by hash(p_community) — the Ray-native
equivalent of `groupby(p_community).map_groups(refine_fn)` — then
`refine_subset` executes the reference's sequential greedy semantics exactly
(with the deterministic visit order pinned to ascending vertex id in place of
the reference's random.shuffle, per SURVEY.md §7.4).

Faithfulness notes (all custom_leiden.py cites):
- well-connectivity uses aggregate node counts, not edge weights
  (S_tot/v_tot = candidate_node_count sums; :363-386),
- v_in / c_in exclude self-loops (:115-157, the commented-out TODOs),
- ΔCPM counts the mover's self-loop in k_v→C (:88-94),
- only still-singleton vertices move (:393-394),
- a move removes the vacated singleton from remaining_comms (:459) and
  incrementally adds the mover's edges to the refined community graph (:460,
  add_community_graph_edges_singleton_move :640-657),
- candidate choice is greedy argmax with strictly-positive delta (:428-450;
  the randomized-θ branch is disabled in the reference).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, shard_by_owner


def _hash_shard(keys: np.ndarray, P: int, *payloads: np.ndarray):
    """Shard rows by hash(key) % P (for keys without block ownership)."""
    if P == 1:
        return [(keys, *payloads)]
    h = (keys.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
    order = np.argsort(h, kind="stable")
    h_s = h[order]
    k_s = keys[order]
    pays = [p[order] for p in payloads]
    bounds = np.searchsorted(h_s, np.arange(P + 1, dtype=np.uint64))
    return [(k_s[bounds[j]:bounds[j + 1]],
             *[p[bounds[j]:bounds[j + 1]] for p in pays])
            for j in range(P)]


@ray.remote
def _push_edges_with_comm(csr, state, block, P):
    """Route (src, dst, w, comm_src) to owner(dst) for intra-filtering."""
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + csr["vlo"]
    shards = shard_by_owner(csr["indices"], block, P, src_g,
                            csr["weights"], state["comm"][src_slot])
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _filter_and_bucket(state, vlo, P, *shards):
    """Keep intra-community edges; bucket by hash(p_community)."""
    comm = state["comm"]
    us, vs, ws, qs = [], [], [], []
    for dst, src, w, comm_src in shards:
        if len(dst) == 0:
            continue
        loc = dst - vlo
        intra = comm[loc] == comm_src
        # one row per undirected edge: keep src <= dst (selfs appear once)
        intra &= src <= dst
        us.append(src[intra])
        vs.append(dst[intra])
        ws.append(w[intra])
        qs.append(comm_src[intra])
    if us:
        u = np.concatenate(us)
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        q = np.concatenate(qs)
    else:
        u = v = q = np.empty(0, np.int64)
        w = np.empty(0, np.float64)
    out = _hash_shard(q, P, u, v, w)
    if P == 1:
        return out[0]
    return tuple(out)


@ray.remote
def _push_vertices(state, vlo, P):
    nv = len(state["comm"])
    ids = np.arange(vlo, vlo + nv, dtype=np.int64)
    out = _hash_shard(state["comm"], P, ids, state["agg"])
    if P == 1:
        return out[0]
    return tuple(out)


def refine_subset(vs, aggs, eu, ev, ew, self_w, gamma: float):
    """Sequential greedy refinement of one subset S (pure function).

    vs: member vertex ids (sorted); aggs: aggregate counts per member;
    (eu, ev, ew): intra-S undirected edges (u < v); self_w: self-loop weight
    per member (same order as vs). Returns {v: refined_community_id}."""
    comm = {int(x): int(x) for x in vs}
    if len(vs) == 1:
        return comm
    a = {int(x): float(g) for x, g in zip(vs, aggs)}
    sw = {int(x): float(s) for x, s in zip(vs, self_w)}
    members = {int(x): {int(x)} for x in vs}
    cagg = {int(x): float(a[int(x)]) for x in vs}

    adj = defaultdict(list)
    for x, y, wgt in zip(eu, ev, ew):
        x, y, wgt = int(x), int(y), float(wgt)
        if x == y:
            continue
        adj[x].append((y, wgt))
        adj[y].append((x, wgt))

    S_tot = sum(a.values())
    v_in = {x: sum(w for _, w in adj[x]) for x in comm}

    # refined community graph edges (within S): ce[c1][c2] = weight
    ce = defaultdict(lambda: defaultdict(float))
    for x, y, wgt in zip(eu, ev, ew):
        x, y, wgt = int(x), int(y), float(wgt)
        ce[x][y] += wgt
        if x != y:
            ce[y][x] += wgt

    remaining = set(comm.keys())

    def c_in(c):
        return sum(w for c2, w in ce[c].items()
                   if c2 != c and c2 in remaining)

    R = [x for x in sorted(comm) if v_in[x] >= gamma * a[x] * (S_tot - a[x])]

    for x in R:
        cur = comm[x]
        if len(members[cur]) != 1:
            continue
        T = [c for c in sorted(remaining)
             if c_in(c) >= gamma * cagg[c] * (S_tot - cagg[c])]
        if not T:
            continue
        kw = defaultdict(float)
        for y, wgt in adj[x]:
            kw[comm[y]] += wgt
        k_old = sw[x]  # singleton: only the self-loop is "in" the old comm
        best_delta = 0.0
        best_c = None
        for c in T:
            if c == cur:
                continue
            k_new = kw.get(c, 0.0) + sw[x]
            delta = ((k_new - gamma * a[x] * cagg[c])
                     - (k_old - gamma * a[x] * (cagg[cur] - a[x])))
            if delta > best_delta:
                best_delta = delta
                best_c = c
        if best_c is None:
            continue
        # move x: cur (a singleton) dissolves into best_c
        members[cur].discard(x)
        members[best_c].add(x)
        cagg[best_c] += a[x]
        comm[x] = best_c
        remaining.discard(cur)
        # incremental community-graph update (custom_leiden.py:640-657)
        for y, wgt in adj[x]:
            cy = comm[y]
            ce[best_c][cy] += wgt
            if cy != best_c:
                ce[cy][best_c] += wgt
        if sw[x]:
            ce[best_c][best_c] += sw[x]
    return comm


@ray.remote
def _refine_bucket(gamma, block, P, n_vshards, *all_shards):
    """Run refine_subset per p-community in this hash bucket.

    all_shards = (*vertex_shards, *edge_shards) — flattened because Ray only
    resolves ObjectRefs passed as direct task arguments, not inside lists.
    Returns (*assignment shards by owner(v), rq_pairs)."""
    vertex_shards = all_shards[:n_vshards]
    edge_shards = all_shards[n_vshards:]
    if vertex_shards:
        q_v = np.concatenate([s[0] for s in vertex_shards])
        v_v = np.concatenate([s[1] for s in vertex_shards])
        g_v = np.concatenate([s[2] for s in vertex_shards])
    else:
        q_v = v_v = g_v = np.empty(0, np.int64)
    if edge_shards:
        q_e = np.concatenate([s[0] for s in edge_shards])
        u_e = np.concatenate([s[1] for s in edge_shards])
        v_e = np.concatenate([s[2] for s in edge_shards])
        w_e = np.concatenate([s[3] for s in edge_shards])
    else:
        q_e = u_e = v_e = np.empty(0, np.int64)
        w_e = np.empty(0, np.float64)

    # self-loop weights arrive via the edge stream (u == v rows)
    out_v, out_r = [], []
    rq_r, rq_q = [], []

    vo = np.argsort(q_v, kind="stable")
    q_v, v_v, g_v = q_v[vo], v_v[vo], g_v[vo]
    vb = np.flatnonzero(np.concatenate(
        [[True], q_v[1:] != q_v[:-1]])) if len(q_v) else np.empty(0, np.int64)
    vb = np.append(vb, len(q_v))

    eo = np.argsort(q_e, kind="stable")
    q_e, u_e, v_e, w_e = q_e[eo], u_e[eo], v_e[eo], w_e[eo]

    for gi in range(len(vb) - 1):
        lo, hi = vb[gi], vb[gi + 1]
        q = q_v[lo]
        vs = v_v[lo:hi]
        order = np.argsort(vs)
        vs = vs[order]
        aggs = g_v[lo:hi][order]
        el, eh = np.searchsorted(q_e, q), np.searchsorted(q_e, q, side="right")
        eu, ev, ew = u_e[el:eh], v_e[el:eh], w_e[el:eh]
        selfs = eu == ev
        self_w = np.zeros(len(vs), np.float64)
        if selfs.any():
            pos = np.searchsorted(vs, eu[selfs])
            np.add.at(self_w, pos, ew[selfs])
        res = refine_subset(vs, aggs, eu[~selfs], ev[~selfs], ew[~selfs],
                            self_w, gamma)
        vv = np.fromiter(res.keys(), np.int64, len(res))
        rr = np.fromiter(res.values(), np.int64, len(res))
        out_v.append(vv)
        out_r.append(rr)
        uniq_r = np.unique(rr)
        rq_r.append(uniq_r)
        rq_q.append(np.full(len(uniq_r), q, np.int64))

    vv = np.concatenate(out_v) if out_v else np.empty(0, np.int64)
    rr = np.concatenate(out_r) if out_r else np.empty(0, np.int64)
    rq = (np.concatenate(rq_r) if rq_r else np.empty(0, np.int64),
          np.concatenate(rq_q) if rq_q else np.empty(0, np.int64))
    shards = shard_by_owner(vv, block, P, rr)
    if P == 1:
        return shards[0], rq
    return (*shards, rq)


@ray.remote
def _merge_assignment(vlo, nv, *shards):
    out = np.full(nv, -1, np.int64)
    for ids, rr in shards:
        out[ids - vlo] = rr
    # every owned vertex appears in exactly one subset; fall back to
    # singleton for safety
    missing = out < 0
    if missing.any():
        out[missing] = np.arange(vlo, vlo + nv, dtype=np.int64)[missing]
    return out


def refine_level(graph: Graph, states: list, gamma: float):
    """Distributed refinement of the current level.

    Returns (refined assignment refs per partition, rq_pairs refs list)."""
    P = graph.P
    eshards = fanout(
        _push_edges_with_comm,
        [(graph.parts[i], states[i], graph.block, P) for i in range(P)], P)
    bshards = fanout(
        _filter_and_bucket,
        [(states[j], graph.ranges()[j][0], P, *eshards[j])
         for j in range(P)], P)
    vshards = fanout(
        _push_vertices,
        [(states[j], graph.ranges()[j][0], P) for j in range(P)], P)

    refined = [
        _refine_bucket.options(num_returns=P + 1).remote(
            gamma, graph.block, P, len(vshards[b]),
            *vshards[b], *bshards[b])
        for b in range(P)
    ]
    if P == 1:
        assign_shards = [[refined[0][0]]]
        rq_refs = [refined[0][1]]
    else:
        assign_shards = [[refined[b][j] for b in range(P)] for j in range(P)]
        rq_refs = [refined[b][P] for b in range(P)]

    assigns = [
        _merge_assignment.remote(
            graph.ranges()[j][0],
            graph.ranges()[j][1] - graph.ranges()[j][0],
            *assign_shards[j])
        for j in range(P)
    ]
    return assigns, rq_refs
