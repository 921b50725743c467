"""Adamic–Adar edge scoring (link-prediction strength for existing
edges).

AA(u, v) = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w)) — the classic
link-prediction score (Adamic & Adar, "Friends and neighbors on the
Web", 2003), here computed for every canonical non-self edge of the
symmetrized graph (common neighbors of an EXISTING edge always have
deg ≥ 2, so ln(deg) > 0 and no term diverges).

Exact-integer discipline (the repo's oracle pattern, cf.
algorithms/objectives.py): each term is quantized ONCE per vertex
degree as q(d) = round(1e9 / ln(d)) and summed in int64, so the
result is an order-independent BIGINT that DuckDB recomputes
bit-identically (float summation order would differ between the
distributed fold and SQL). The float score aa = aa_int / 1e9 is
derived deterministically from the integer.

Scale design is triangle_support's wholesale (algorithms/triangles.py
+ trisupport.py): degree orientation, sparse request/reply exchanges,
heap-bounded wedge-index chunking, and a bincount-only probe — a hit
wedge (a, b) centered at u closes triangle {u, a, b} and credits
  edge (a, b): q(deg(u))   — by POSITION in the pulled-key array,
  edge (u, a): q(deg(b))   — by SLOT in the local oriented CSR,
  edge (u, b): q(deg(a))   — by SLOT,
three weighted bincounts per chunk over partition-local arrays (per-
chunk float64 bincount sums stay < 2^53 — ≤ 262144 wedges × q ≤
1.443e9 ≈ 3.8e14 — and are cast back to int64 before accumulating, so
exactness holds at any scale). The per-slot/per-row degree arrays the
weights need are built once per partition from the SAME degree
request/reply exchange the orientation already performs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.algorithms.triangles import (
    _deg_no_self,
    _merge_adj,
    _merge_deg_replies,
    _oriented,
    _plan_chunks,
    _request_adj,
    _request_degs,
    _serve_adj,
    _serve_degs,
    _WEDGES_PER_TASK,
)
from leiden_cuda_ray.algorithms.trisupport import _wedges_with_slots
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, segsum_by_key, shard_by_owner

#: weight quantization: q(d) = round(SCALE / ln(d)) summed as int64.
#: SCALE=1e9 keeps every term < 2^31 (max q = q(2) ≈ 1.443e9) while a
#: single edge would need ~6e9 common neighbors to overflow int64.
_AA_SCALE = 1_000_000_000.0


def _q_of_deg(deg: np.ndarray) -> np.ndarray:
    """Quantized AA weight per degree value; deg < 2 maps to 0 (a
    vertex of degree < 2 cannot be a common neighbor of an edge, and
    the hit filter drops those wedges anyway — 0 keeps the array
    total)."""
    out = np.zeros(len(deg), np.int64)
    m = deg >= 2
    out[m] = np.round(_AA_SCALE / np.log(deg[m].astype(np.float64)))
    return out


@ray.remote
def _slot_q(o, *deg_replies):
    """Per-partition weight artifacts, built once and shared by every
    probe task: q per oriented SLOT (deg of o['nbrs'][slot], via the
    same sparse degree lookup the orientation consumed) and q per local
    ROW (deg of the wedge center)."""
    ids, degs = _merge_deg_replies(deg_replies)
    nbr_q = _q_of_deg(degs[np.searchsorted(ids, o["nbrs"])])
    nv = len(o["counts"])
    row_ids = np.arange(o["vlo"], o["vlo"] + nv, dtype=np.int64)
    row_q = _q_of_deg(degs[np.searchsorted(ids, row_ids)])
    return {"nbr_q": nbr_q, "row_q": row_q}


@ray.remote
def _probe_aa(o, q, block, P, V, bounds, adj_keys):
    """Probe the wedge spans in `bounds`; accumulate per-edge integer
    AA credits without per-hit segsums: three weighted bincounts per
    chunk (closing edge by position, two legs by slot), int64-exact by
    construction, one fold per task maps both sparse counters to
    canonical edge keys and shards them by owner(min endpoint)."""
    nslots = len(o["nbrs"])
    nv = len(o["counts"])
    row_of_slot = np.repeat(np.arange(nv, dtype=np.int64), o["counts"])
    slot_cred = np.zeros(nslots, np.int64)
    pos_hits: list[np.ndarray] = []
    pos_ws: list[np.ndarray] = []
    for ci in range(len(bounds) - 1):
        a, b, sa, sb = _wedges_with_slots(o, int(bounds[ci]),
                                          int(bounds[ci + 1]))
        if len(a) == 0 or len(adj_keys) == 0:
            continue
        qk = a * V + b
        pos = np.searchsorted(adj_keys, qk)
        np.minimum(pos, len(adj_keys) - 1, out=pos)
        hit = adj_keys[pos] == qk
        if not hit.any():
            continue
        sa_h, sb_h = sa[hit], sb[hit]
        wa = q["nbr_q"][sa_h].astype(np.float64)  # q(deg(a))
        wb = q["nbr_q"][sb_h].astype(np.float64)  # q(deg(b))
        wc = q["row_q"][row_of_slot[sa_h]]        # q(deg(center u))
        # leg (u→a) is credited by the THIRD vertex b, and vice versa
        slot_cred += np.bincount(sa_h, weights=wb,
                                 minlength=nslots).astype(np.int64)
        slot_cred += np.bincount(sb_h, weights=wa,
                                 minlength=nslots).astype(np.int64)
        pos_hits.append(pos[hit])
        pos_ws.append(wc)
    keys_parts: list[np.ndarray] = []
    cred_parts: list[np.ndarray] = []
    if pos_hits:
        key_cred = np.bincount(np.concatenate(pos_hits),
                               weights=np.concatenate(pos_ws)
                               .astype(np.float64),
                               minlength=len(adj_keys)).astype(np.int64)
        nz = np.flatnonzero(key_cred)
        kk = adj_keys[nz]
        aa = kk // V
        bb = kk - aa * V
        keys_parts.append(np.minimum(aa, bb) * V + np.maximum(aa, bb))
        cred_parts.append(key_cred[nz].astype(np.float64))
    snz = np.flatnonzero(slot_cred)
    if len(snz):
        u_g = row_of_slot[snz] + o["vlo"]
        t_g = o["nbrs"][snz]
        keys_parts.append(np.minimum(u_g, t_g) * V
                          + np.maximum(u_g, t_g))
        cred_parts.append(slot_cred[snz].astype(np.float64))
    if keys_parts:
        acc_k, acc_c = segsum_by_key(np.concatenate(keys_parts),
                                     np.concatenate(cred_parts))
    else:
        acc_k = np.empty(0, np.int64)
        acc_c = np.empty(0, np.float64)
    owner_key = acc_k // V  # min endpoint owns the edge row
    shards = shard_by_owner(owner_key, block, P, acc_k, acc_c)
    out = [(s[1], s[2]) for s in shards]
    return out[0] if P == 1 else tuple(out)


@ray.remote
def _emit_aa(csr, V, *shards):
    """One partition's output rows: every canonical non-self edge
    (src < dst) with its exact-integer AA sum and the derived float."""
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + csr["vlo"]
    dst = csr["indices"]
    canon = dst > src_g
    s = src_g[canon]
    d = dst[canon]
    keys = s * V + d
    aa_int = np.zeros(len(keys), np.int64)
    for ek, cred in shards:
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
                "adamic-adar credit routed to a non-existent edge — "
                "orientation/ownership mismatch")
        np.add.at(aa_int, pos, cred.astype(np.int64))
    return pa.table({
        "src": pa.array(s, pa.int64()),
        "dst": pa.array(d, pa.int64()),
        "aa_int": pa.array(aa_int, pa.int64()),
        # UNROUNDED IEEE quotient: bit-identical to DuckDB's
        # aa_int / 1e9, so the driver's round-to-6-then-hash compare
        # sees the same double on both sides (engine-side ROUND vs SQL
        # ROUND can differ on half-way cases; aa_int % 1000 == 500 is
        # ~1/1000 of edges — a real flake source, not a theoretical one)
        "aa": pa.array(aa_int / _AA_SCALE, pa.float64()),
    })


def adamic_adar(graph: Graph):
    """Returns Dataset[src:int64, dst:int64, aa_int:int64, aa:float64]
    with one row per canonical non-self edge (aa_int = 0 for edges in
    no triangle). Orchestration mirrors trisupport.triangle_support
    (degree exchange → orientation → adjacency pull → chunked probes →
    per-owner emit) with one extra per-partition artifact: the
    quantized degree weights (`_slot_q`), fed by the same degree
    replies the orientation consumes."""
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
    slot_q = [_slot_q.remote(oriented[i], *deg_replies[i])
              for i in range(P)]
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
            r = _probe_aa.options(
                num_returns=P if P > 1 else 1).remote(
                    oriented[i], slot_q[i], graph.block, P, graph.V,
                    sub, adj_keys[i])
            refs = list(r) if P > 1 else [r]
            for j in range(P):
                contrib_shard_lists[j].append(refs[j])

    blocks = [
        _emit_aa.remote(graph.parts[j], graph.V,
                        *contrib_shard_lists[j])
        for j in range(P)
    ]
    return ray.data.from_arrow_refs(blocks)
