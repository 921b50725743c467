"""Distributed HITS (hubs & authorities) over a DIRECTED edge set.

Kleinberg's iteration (public algorithm: "Authoritative Sources in a
Hyperlinked Environment", JACM 1999) over the corpus import graph — the
one directed relation the derive pipeline produces (imports have a
direction; co-commit edges don't). Complements the symmetrized-graph
family (pagerank/components/…): same push-model BSP machinery, but each
round pushes BOTH ways, so every partition holds two CSRs over the same
uniform vertex range:

  fwd: rows = local u, slots = out-edges u→v   (authority gather)
  rev: rows = local v, slots = in-edges  u→v   (hub gather)

Rounds run UNNORMALIZED with one final L2 normalization — the direction
of (h, a) is identical to the per-round-normalized textbook iteration
(normalization is a positive scalar, and the update is linear), and it
keeps the driver fully out of the loop: a fixed-iteration run submits
every superstep's tasks without a single intermediate ray.get. Float64
headroom is ample: values grow like λ(AAᵀ)^k and even λ=1e6 over 8
rounds stays ~1e48 ≪ 1e308, while RELATIVE precision (what survives the
final normalize + round) is scale-free.

Scale: the exchange is the package-standard shard_by_owner fan-out —
O(E/P) rows per task, P ObjectRefs per task per direction, no dense-V
state outside the per-partition range slices. Uniform ranges (not
degree-balanced) because the two directions must agree on ownership;
in-degree and out-degree skew differ, so balancing one direction would
unbalance the other.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.graph.csr import build_partition_csr
from leiden_cuda_ray.graph.runtime import fanout, segsum_by_key, shard_by_owner


@ray.remote
def _shard_block(block, V: int, bsize: int, P: int):
    """One edge block → 2P shards: P forward (by owner(src)) then P
    reverse (by owner(dst), columns swapped so dst is the CSR row)."""
    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block)
    if block.num_rows == 0 or "src" not in block.column_names:
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        return tuple(empty for _ in range(2 * P))
    src = np.asarray(block.column("src"), np.int64)
    dst = np.asarray(block.column("dst"), np.int64)
    fwd = shard_by_owner(src, bsize, P, dst)
    rev = shard_by_owner(dst, bsize, P, src)
    return tuple(fwd) + tuple(rev)


@ray.remote
def _build_part(vlo: int, vhi: int, *shards):
    rows = np.concatenate([s[0] for s in shards]) if shards else \
        np.empty(0, np.int64)
    cols = np.concatenate([s[1] for s in shards]) if shards else \
        np.empty(0, np.int64)
    w = np.ones(len(rows), np.float64)
    return build_partition_csr(rows, cols, w, vlo, vhi)


def build_directed_parts(pairs_ds, V: int, P: int | None = None):
    """Dataset[src:int64, dst:int64] (distinct directed edges) →
    (fwd_parts, rev_parts, bsize, P, ranges). Never materializes edges on
    the driver: blocks are sharded in tasks, partitions built in tasks."""
    mat = pairs_ds.materialize()
    refs, n_rows = [], 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            refs.append(ref)
            n_rows += meta.num_rows or 0
    cpus = int(ray.cluster_resources().get("CPU", 4))
    if P is None:
        by_edges = max(1, -(-n_rows // 250_000))
        P = int(max(1, min(by_edges, cpus, 512, V)))
    bsize = -(-V // P)

    shard_refs = [
        _shard_block.options(num_returns=2 * P).remote(ref, V, bsize, P)
        for ref in refs]
    ranges = [(i * bsize, min(V, (i + 1) * bsize)) for i in range(P)]
    fwd_parts = [
        _build_part.remote(ranges[j][0], ranges[j][1],
                           *[s[j] for s in shard_refs])
        for j in range(P)]
    rev_parts = [
        _build_part.remote(ranges[j][0], ranges[j][1],
                           *[s[P + j] for s in shard_refs])
        for j in range(P)]
    return fwd_parts, rev_parts, bsize, P, ranges


@ray.remote
def _push(csr, x, bsize, P):
    """Push x along the CSR rows' edges: contrib(row→col) = x_row · w,
    partial-sum by col (combiner), shard by owner(col)."""
    row_slot = local_src_per_slot(csr)
    contrib = x[row_slot] * csr["weights"]
    ids, sums = segsum_by_key(csr["indices"], contrib)
    shards = shard_by_owner(ids, bsize, P, sums)
    return shards[0] if P == 1 else tuple(shards)


@ray.remote
def _reduce_dense(vlo, nv, *shards):
    acc = np.zeros(nv, np.float64)
    for ids, sums in shards:
        np.add.at(acc, ids - vlo, sums)
    return acc


@ray.remote
def _sumsq(x):
    return float((x * x).sum())


@ray.remote
def _final_block(vlo, h, a, h_norm, a_norm, ndigits):
    ids = np.arange(vlo, vlo + len(h), dtype=np.int64)
    hn = h / h_norm if h_norm > 0 else h
    an = a / a_norm if a_norm > 0 else a
    if ndigits is not None:
        hn = np.round(hn, ndigits)
        an = np.round(an, ndigits)
    return pa.table({"vertex": pa.array(ids, pa.int64()),
                     "hub": pa.array(hn, pa.float64()),
                     "authority": pa.array(an, pa.float64())})


def hits(pairs_ds, V: int, iters: int = 8, P: int | None = None,
         ndigits: int | None = 6):
    """HITS over a distinct directed edge Dataset → Dataset[vertex, hub,
    authority], L2-normalized, rounded to `ndigits` (None = raw floats).

    h⁰ = 1; aᵏ = Aᵀhᵏ⁻¹; hᵏ = Aaᵏ; output (hᴷ/‖hᴷ‖₂, aᴷ/‖aᴷ‖₂).
    Fixed iteration count so the DuckDB oracle can unroll the identical
    recurrence (same pattern as graph_pagerank_fixed)."""
    import ray.data

    fwd, rev, bsize, P, ranges = build_directed_parts(pairs_ds, V, P)

    hs = [ray.put(np.ones(hi - lo, np.float64)) for lo, hi in ranges]
    as_ = None
    for _ in range(iters):
        shards = fanout(_push, [(fwd[i], hs[i], bsize, P)
                                for i in range(P)], P)
        as_ = [_reduce_dense.remote(ranges[j][0],
                                    ranges[j][1] - ranges[j][0],
                                    *shards[j]) for j in range(P)]
        shards = fanout(_push, [(rev[i], as_[i], bsize, P)
                                for i in range(P)], P)
        hs = [_reduce_dense.remote(ranges[j][0],
                                   ranges[j][1] - ranges[j][0],
                                   *shards[j]) for j in range(P)]

    h_norm = float(np.sqrt(sum(ray.get([_sumsq.remote(x) for x in hs]))))
    a_norm = float(np.sqrt(sum(ray.get([_sumsq.remote(x) for x in as_]))))
    blocks = [_final_block.remote(ranges[j][0], hs[j], as_[j],
                                  h_norm, a_norm, ndigits)
              for j in range(P)]
    return ray.data.from_arrow_refs(blocks)
