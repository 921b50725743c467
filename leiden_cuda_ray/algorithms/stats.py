"""Exact whole-graph statistics.

Degree assortativity (Newman, "Assortative mixing in networks", PRL
2002) in EXACT INTEGER form: over the canonical non-self edge set with
endpoint degrees (j, k) — degree = distinct non-self neighbors — the
Pearson coefficient is r = (4·M·S_jk − S_sum²) / (2·M·S_sq − S_sum²)
where M = edge count, S_jk = Σ j·k, S_sum = Σ (j+k), S_sq = Σ (j²+k²).
The operator emits the four raw sums as BIGINTs (one row), so the
result is bit-exact, SQL-recomputable, and r is derivable without any
float summation-order hazard.

One pass: the triangle module's sparse degree request/reply exchange
gives every partition (ids, deg) for exactly the vertices it
references; each partition folds its canonical slots into four scalar
partials; the driver sums P scalars. No dense-V array, nothing
quadratic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.algorithms.triangles import (
    _deg_no_self,
    _merge_deg_replies,
    _request_degs,
    _serve_degs,
)
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout


@ray.remote
def _part_sums(csr, *deg_replies):
    ids, degs = _merge_deg_replies(deg_replies)
    src_slot = local_src_per_slot(csr)
    src_g = src_slot + csr["vlo"]
    dst = csr["indices"]
    canon = dst > src_g  # canonical non-self edges owned by this partition
    j = degs[np.searchsorted(ids, src_g[canon])]
    k = degs[np.searchsorted(ids, dst[canon])]
    if len(j):
        # conservative pre-check: numpy int64 sums wrap silently, so
        # bound max-term x count BEFORE summing (objectives.py pattern)
        if float(j.max()) * float(k.max()) * len(j) >= 2.0 ** 62:
            raise OverflowError(
                "assortativity partial could exceed int64 — widen to "
                "object ints")
    s_jk = int((j * k).sum())
    s_sum = int((j + k).sum())
    s_sq = int((j * j + k * k).sum())
    return int(canon.sum()), s_jk, s_sum, s_sq


def assortativity_sums(graph: Graph):
    """Returns a one-row Dataset[m, s_jk, s_sum, s_sq] (all int64).

    int64 headroom: S_sq ≤ M·max_deg² — at M=1.25e8 edges and
    max_deg=1e4 that is ~1e16, far under 2^63; asserted per partial so
    overflow is loud, never silent."""
    import ray.data

    P = graph.P
    degs = [_deg_no_self.remote(p) for p in graph.parts]
    req_shards = fanout(
        _request_degs,
        [(graph.parts[i], graph.block, P) for i in range(P)], P)
    serves = [
        _serve_degs.options(num_returns=P if P > 1 else 1).remote(
            degs[kk], graph.ranges()[kk][0], *req_shards[kk])
        for kk in range(P)
    ]
    deg_replies = ([[serves[0]]] if P == 1 else
                   [[serves[kk][i] for kk in range(P)] for i in range(P)])
    parts = ray.get([
        _part_sums.remote(graph.parts[i], *deg_replies[i])
        for i in range(P)
    ])
    m = sum(p[0] for p in parts)
    s_jk = sum(p[1] for p in parts)
    s_sum = sum(p[2] for p in parts)
    s_sq = sum(p[3] for p in parts)
    assert max(m, s_jk, s_sum, s_sq) < 2 ** 63, \
        "assortativity sums exceed int64 — widen to object ints"
    t = pa.table({"m": pa.array([m], pa.int64()),
                  "s_jk": pa.array([s_jk], pa.int64()),
                  "s_sum": pa.array([s_sum], pa.int64()),
                  "s_sq": pa.array([s_sq], pa.int64())})
    return ray.data.from_arrow(t)
