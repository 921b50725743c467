"""Distributed objective scoring: CPM and modularity (SURVEY.md §2.6).

CPM (custom_leiden.py:238-260):
    H = Σ_c [ W_in(c) − γ·n_c(n_c−1)/2 ]
with W_in counted once per undirected internal edge and n_c = Σ member
aggregate counts (1 per root vertex).

Modularity (custom_louvain.py:92-122, double-count convention):
    Q = Σ_c [ sum_in_c/(2m) − (sum_tot_c/(2m))² ]
with sum_in double-counting internal edges (self-loops ×2) and
sum_tot = Σ weighted degrees of members.

One sharded exchange: push (dst, comm_src, w) for non-self slots, owners keep
intra rows and group-sum by community; self-loops are summed locally at their
owner. Only per-community scalars cross the wire after the exchange.
"""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, segsum_by_key, shard_by_owner


@ray.remote
def _push_comm_edges(csr, comm, block, P):
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + csr["vlo"]
    dst = csr["indices"]
    nonself = dst != src_g
    shards = shard_by_owner(dst[nonself], block, P,
                            comm[src_slot][nonself],
                            csr["weights"][nonself])
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _intra_sums(csr, comm, agg, vlo, *shards):
    """Per-community partials: (ids, nonself_intra_w, self_w, agg_sum, tot_w)."""
    nv = len(comm)
    # self-loop weights per community (local)
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + vlo
    selfs = csr["indices"] == src_g
    c_self, w_self = segsum_by_key(comm[src_slot][selfs],
                                   csr["weights"][selfs])
    # incoming non-self rows where communities match
    ds, cs, ws = [], [], []
    for d, c, w in shards:
        if len(d) == 0:
            continue
        loc = d - vlo
        intra = comm[loc] == c
        ds.append(c[intra])
        ws.append(w[intra])
    if ds:
        c_in, w_in = segsum_by_key(np.concatenate(ds), np.concatenate(ws))
    else:
        c_in = np.empty(0, np.int64)
        w_in = np.empty(0, np.float64)
    c_agg, a_sum = segsum_by_key(comm, agg.astype(np.float64))
    c_tot, t_sum = segsum_by_key(comm, csr["deg_w"])
    return (c_in, w_in), (c_self, w_self), (c_agg, a_sum), (c_tot, t_sum)


@ray.remote
def _fold(gamma, m, *parts):
    def merge(idx):
        ids = np.concatenate([p[idx][0] for p in parts])
        vals = np.concatenate([p[idx][1] for p in parts])
        return segsum_by_key(ids, vals)

    c_in, w_in = merge(0)      # non-self intra, each undirected edge twice
    c_self, w_self = merge(1)  # self-loop weights
    c_agg, a_sum = merge(2)    # Σ agg per community
    c_tot, t_sum = merge(3)    # Σ weighted degree per community

    # align sparse vectors on the union of community ids
    all_c = np.unique(np.concatenate([c_in, c_self, c_agg]))

    def dense(ids, vals):
        out = np.zeros(len(all_c), np.float64)
        out[np.searchsorted(all_c, ids)] = vals
        return out

    W_nonself = dense(c_in, w_in)
    W_self = dense(c_self, w_self)
    N = dense(c_agg, a_sum)
    T = dense(c_tot, t_sum)

    w_in_once = W_nonself / 2.0 + W_self
    cpm_val = float((w_in_once - gamma * N * (N - 1) / 2.0).sum())
    sum_in = W_nonself + 2.0 * W_self
    q = float((sum_in / (2 * m) - (T / (2 * m)) ** 2).sum())
    # exact integer aggregates (weights are integer counts, so every sum
    # below is an exactly-representable integer): the objective-recompute
    # oracles check 20·CPM(γ=0.05) and the modularity numerator as BIGINTs
    # against a DuckDB recompute over the engine's written partition
    # squares/products promote through object dtype (Python ints): int64
    # wraps silently once a community's summed weighted degree passes
    # ~3e9 (squares exceed 2^63) — at the 100-TB regime that is reachable,
    # and the BIGINT oracle guarantee must break loudly, never silently
    n_obj = N.astype(np.int64).astype(object)
    t_obj = T.astype(np.int64).astype(object)
    # float64 sums are exact only below 2^53 — assert, don't drift
    assert W_nonself.sum() < 2.0 ** 53 and W_self.sum() < 2.0 ** 53, \
        "intra-weight sums exceed exact float64 range; widen to int"
    ints = {
        "win2": int(W_nonself.sum()),          # doubled non-self intra w
        "wself": int(W_self.sum()),            # self-loop intra w
        "snn": int((n_obj * (n_obj - 1)).sum()),
        "stt": int((t_obj * t_obj).sum()),     # Σ_c (Σ deg_w)²
        "two_m": int(round(2 * m)),
    }
    return {"cpm": cpm_val, "modularity": q,
            "num_communities": int(len(all_c)), "ints": ints}


def score(graph: Graph, comm_refs: list, gamma: float,
          agg_refs: list | None = None) -> dict:
    """Compute CPM and modularity of a community assignment."""
    P = graph.P
    shards = fanout(
        _push_comm_edges,
        [(graph.parts[i], comm_refs[i], graph.block, P) for i in range(P)],
        P)
    aggs = agg_refs
    if aggs is None:
        aggs = [_ones.remote(p) for p in graph.parts]
    parts = [
        _intra_sums.remote(graph.parts[j], comm_refs[j], aggs[j],
                           graph.ranges()[j][0], *shards[j])
        for j in range(P)
    ]
    return ray.get(_fold.remote(gamma, graph.m, *parts))


@ray.remote
def _ones(csr):
    return np.ones(csr["vhi"] - csr["vlo"], np.int64)
