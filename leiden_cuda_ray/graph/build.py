"""Distributed graph build: edge table → object-store CSR partitions.

Two paths:
- `build_graph_from_dataset`: the scale path — ONE fused owner-sharded
  exchange (the same raw-task exchange pattern the superstep runtime uses):
  map tasks canonicalize + symmetrize + partially combine their blocks and
  shard rows by a provisional contiguous src range; reduce tasks merge and
  dedup-sum their range; the driver derives edge-balanced partition bounds
  from a bucket-granularity degree sketch (NOT a dense V histogram) and P
  build tasks slice the sorted reduce outputs into final CSR partitions.
  This replaces round 1's Ray-Data groupby canonicalize + stats aggregate +
  pid-partitioned parquet spill round-trip (3 passes, 27 s + 2 passes at
  sf0.1) with one exchange (~6 s); durability of level graphs is owned by
  state.Checkpointer.save_level_graph, not the build.
- `build_graph_from_arrays`: in-memory path for fixtures and coarsened
  levels that already live in numpy.

Scale notes: no task allocates an O(V) array — the degree sketch is capped
at `_N_BUCKETS` and partition bounds are cut at bucket granularity. Ref
fan-out is (map tasks ≈ 4·cpus) × (K reduce ranges ≤ 64); at thousands of
nodes both knobs grow sub-linearly (coarser map groups, K per node) before
tree-merge routing would be needed.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from leiden_cuda_ray.graph.csr import build_partition_csr, owner_of, part_range

_N_BUCKETS = 8192


@dataclass
class Graph:
    """Driver-side handle; all bulk data lives in the Ray object store."""

    V: int
    P: int
    # int => uniform contiguous ranges; int64 array of P+1 boundaries =>
    # edge-balanced contiguous ranges (degree-skew mitigation)
    block: object
    parts: list  # list[ObjectRef[dict]] — CSR partition dicts
    m: float     # total undirected edge weight (each edge once, self once)
    sym_edges: int  # number of symmetrized directed rows
    # per-vertex aggregate counts carried across Leiden coarsening levels
    # (csrc/src/leiden.cpp:20-27 initializes these to 1); None => all ones
    agg_refs: list | None = None

    def owner(self, v):
        return owner_of(v, self.block, self.P)

    def ranges(self):
        return [part_range(i, self.block, self.P, self.V)
                for i in range(self.P)]


def _derive_P(num_sym_edges: int, P: int | None,
              target: int = 250_000) -> int:
    """Partition count: enough partitions that every CPU has superstep work
    (up to one per CPU) but no partition drops below ~`target` edges —
    below that, task-launch overhead dominates the numpy kernels."""
    if P is not None:
        return max(1, P)
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    by_edges = max(1, -(-num_sym_edges // target))
    return int(max(1, min(by_edges, cpus, 512)))


def build_graph_from_arrays(src, dst, w, V: int | None = None,
                            P: int | None = None,
                            symmetrized: bool = False) -> Graph:
    """Edge arrays (canonical src<=dst unique, or pre-symmetrized) → Graph."""
    import ray

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float64)
    if V is None:
        V = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
    if not symmetrized:
        off = src != dst
        m = float(w.sum())
        src_s = np.concatenate([src, dst[off]])
        dst_s = np.concatenate([dst, src[off]])
        w_s = np.concatenate([w, w[off]])
    else:
        self_mask = src == dst
        m = float((w[~self_mask].sum() / 2.0) + w[self_mask].sum())
        src_s, dst_s, w_s = src, dst, w

    P = min(_derive_P(len(src_s), P), max(1, V))
    block = _balanced_bounds(np.bincount(src_s, minlength=V), V, P)

    @ray.remote
    def _build(pid, s, d, ww):
        vlo, vhi = part_range(pid, block, P, V)
        return build_partition_csr(s, d, ww, vlo, vhi)

    own = owner_of(src_s, block, P)
    parts = []
    for pid in range(P):
        mask = own == pid
        parts.append(_build.remote(pid, src_s[mask], dst_s[mask], w_s[mask]))
    return Graph(V=V, P=P, block=block, parts=parts, m=m,
                 sym_edges=len(src_s))


#: fused (src*V + dst) int64 keys need V*(V+1) < 2**63; above this vertex
#: count the exchange falls back to explicit (src, dst) pair columns
_FUSE_V_MAX = 3_000_000_000


def _plan_map_groups(blocks_meta, n_map):
    """Row-balanced map-task groups: list of [(ref, (lo, hi) | None), ...].

    Upstream block sizes are wildly skewed (sf1 co-commit: max block 5.6M
    rows vs 128k median — a 22× straggler under round-robin ref grouping).
    Oversized blocks are split into row ranges sliced INSIDE the map task
    (pa.Table.slice is zero-copy on the shared plasma buffer), then pieces
    are packed largest-first onto the least-loaded group."""
    total = sum(n for _, n in blocks_meta)
    target = max(1, -(-total // n_map))
    items = []  # (ref, slice | None, rows)
    for ref, n in blocks_meta:
        if n <= max(target, 1) * 5 // 4:
            items.append((ref, None, n))
        else:
            pieces = -(-n // target)
            step = -(-n // pieces)
            for lo in range(0, n, step):
                hi = min(lo + step, n)
                items.append((ref, (lo, hi), hi - lo))
    groups = [[] for _ in range(n_map)]
    loads = np.zeros(n_map, np.int64)
    for ref, sl, n in sorted(items, key=lambda x: -x[2]):
        i = int(np.argmin(loads))
        groups[i].append((ref, sl))
        loads[i] += n
    return [g for g in groups if g]


def _map_shard(kbounds, bucket_size, n_buckets, span, slices, *blocks):
    """Canonicalize + symmetrize + partial-combine + range-shard one group
    of edge blocks. `slices[i]` is an optional (lo, hi) row range of
    `blocks[i]` (oversized blocks are split across map tasks for balance).

    span > 0 (the fused path, V < _FUSE_V_MAX): rows travel as sorted
    fused keys src*span + dst — duplicate combining is one SIMD np.sort +
    run-length pass when every input weight is 1.0 (the dominant case:
    both derive branches emit unit weights), an unstable argsort + reduceat
    otherwise. Returns (*K (key, w) shards, histogram).

    span == 0 (legacy path): explicit (src, dst, w) shards via the
    two-key segsum (kept for V ≥ _FUSE_V_MAX)."""
    from leiden_cuda_ray.graph.runtime import segsum_by_pair

    srcs, dsts, ws = [], [], []
    uniform = True
    for t, sl in zip(blocks, slices):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t)
        if t.num_rows == 0 or "src" not in t.column_names:
            continue  # empty/schema-less blocks from union boundaries
        if sl is not None:
            t = t.slice(sl[0], sl[1] - sl[0])
        s = np.asarray(t.column("src"), np.int64)
        d = np.asarray(t.column("dst"), np.int64)
        if "weight" in t.column_names:
            w = np.asarray(t.column("weight"), np.float64)
            uniform = uniform and bool((w == 1.0).all())
        else:
            w = np.ones(len(s), np.float64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        off = lo != hi
        srcs.append(np.concatenate([lo, hi[off]]))
        dsts.append(np.concatenate([hi, lo[off]]))
        ws.append(np.concatenate([w, w[off]]))
    src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
    w = np.concatenate(ws) if ws else np.empty(0, np.float64)

    K = len(kbounds) - 1
    if span == 0:
        src, dst, w = segsum_by_pair(src, dst, w)
        hist = np.bincount(src // bucket_size,
                           minlength=n_buckets).astype(np.int64)
        cuts = np.searchsorted(src, kbounds)
        out = [(src[cuts[k]:cuts[k + 1]], dst[cuts[k]:cuts[k + 1]],
                w[cuts[k]:cuts[k + 1]]) for k in range(K)]
        return (*out, hist) if K > 1 else (out[0], hist)

    # symmetrization put every endpoint id into src, so one column bounds
    # them all: ids >= span would silently collide in fused-key space
    if len(src) and (int(src.max()) >= span or int(src.min()) < 0):
        raise ValueError(
            f"edge id outside [0, {span}) — wrong V passed to the graph "
            f"build; fused keys would collide")
    key = src * span + dst
    if len(key) == 0:
        ku = key
        sums = w
    elif uniform:
        key.sort()  # SIMD int64 sort; duplicates collapse to run lengths
        cut = np.empty(len(key), bool)
        cut[0] = True
        np.not_equal(key[1:], key[:-1], out=cut[1:])
        starts = np.flatnonzero(cut)
        ku = key[starts]
        sums = np.diff(np.concatenate([starts, [len(key)]])
                       ).astype(np.float64)
    else:
        order = np.argsort(key)  # unstable: rows in a group are summed
        k = key[order]           # in sort order (deterministic per input)
        v = w[order]
        cut = np.empty(len(k), bool)
        cut[0] = True
        np.not_equal(k[1:], k[:-1], out=cut[1:])
        starts = np.flatnonzero(cut)
        ku = k[starts]
        sums = np.add.reduceat(v, starts)

    # floor-div composition: key // (span*bucket) == (key//span) // bucket
    hist = np.bincount(ku // (span * bucket_size),
                       minlength=n_buckets).astype(np.int64)
    cuts = np.searchsorted(ku, np.asarray(kbounds, np.int64) * span)
    out = [(ku[cuts[k]:cuts[k + 1]], sums[cuts[k]:cuts[k + 1]])
           for k in range(K)]
    return (*out, hist) if K > 1 else (out[0], hist)


def _reduce_range(span, *shards):
    """Merge + dedup-sum one provisional src range.

    Returns (rows sorted by (src, dst), stats (m, n_canon, n_self,
    n_sym)); rows are (key, w) on the fused path, (src, dst, w) legacy."""
    from leiden_cuda_ray.graph.runtime import (segsum_by_key,
                                               segsum_by_pair)

    if span == 0:
        src = np.concatenate([s[0] for s in shards]) if shards else \
            np.empty(0, np.int64)
        dst = np.concatenate([s[1] for s in shards]) if shards else \
            np.empty(0, np.int64)
        w = np.concatenate([s[2] for s in shards]) if shards else \
            np.empty(0, np.float64)
        src, dst, w = segsum_by_pair(src, dst, w)
    else:
        key = np.concatenate([s[0] for s in shards]) if shards else \
            np.empty(0, np.int64)
        w = np.concatenate([s[1] for s in shards]) if shards else \
            np.empty(0, np.float64)
        key, w = segsum_by_key(key, w)  # stable sort rides the sorted runs
        src = key // span
        dst = key - src * span
    selfs = src == dst
    fwd = src < dst
    stats = (float(w[fwd].sum() + w[selfs].sum()),
             int(fwd.sum() + selfs.sum()),
             int(selfs.sum()),
             len(w))
    rows = (src, dst, w) if span == 0 else (key, w)
    return rows, stats


def _slice_build(vlo, vhi, span, *range_rows):
    """Concat the overlapping reduce outputs, slice to [vlo, vhi), build.

    Reduce ranges partition the src space in ascending order, so the
    concatenation is already globally sorted by (src, dst) — the CSR
    build skips its row sort (presorted=True)."""
    if span == 0:
        ss, ds, ws = [], [], []
        for src, dst, w in range_rows:
            a = np.searchsorted(src, vlo)
            b = np.searchsorted(src, vhi)
            ss.append(src[a:b])
            ds.append(dst[a:b])
            ws.append(w[a:b])
        s = np.concatenate(ss) if ss else np.empty(0, np.int64)
        d = np.concatenate(ds) if ds else np.empty(0, np.int64)
        w = np.concatenate(ws) if ws else np.empty(0, np.float64)
        return build_partition_csr(s, d, w, vlo, vhi, presorted=True)
    ks, ws = [], []
    for key, w in range_rows:
        a = np.searchsorted(key, vlo * span)
        b = np.searchsorted(key, vhi * span)
        ks.append(key[a:b])
        ws.append(w[a:b])
    key = np.concatenate(ks) if ks else np.empty(0, np.int64)
    w = np.concatenate(ws) if ws else np.empty(0, np.float64)
    s = key // span
    d = key - s * span
    return build_partition_csr(s, d, w, vlo, vhi, presorted=True)


def build_graph_from_dataset(edges_ds, V: int, P: int | None = None,
                             spill_dir: str | None = None) -> Graph:
    """Edge Dataset → Graph via one fused exchange.

    edges_ds columns: src:int64, dst:int64[, weight:float64] — either the
    canonical unique table or raw (possibly duplicated, any direction)
    pair rows; duplicates are weight-SUMMED (co-occurrence semantics), so
    min-dedup inputs must be deduplicated upstream (dedup_min_weight).

    spill_dir is accepted for API compatibility and ignored: the build no
    longer round-trips through a parquet spill — durable level graphs are
    written by state.Checkpointer.save_level_graph (shared-URI capable).
    """
    import ray

    mat = edges_ds.materialize()
    blocks_meta = []  # (ref, num_rows)
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            blocks_meta.append((ref, int(meta.num_rows or 0)))
    cpus = int(ray.cluster_resources().get("CPU", 4))
    K = int(max(1, min(cpus, 64, V)))
    n_buckets = int(min(V, _N_BUCKETS))
    bucket_size = -(-V // n_buckets)
    kb = np.minimum(np.arange(K + 1, dtype=np.int64) * (-(-V // K)), V)
    kb[K] = V
    span = V if V < _FUSE_V_MAX else 0

    n_map = max(1, min(len(blocks_meta), 4 * cpus))
    groups = _plan_map_groups(blocks_meta, n_map)

    map_task = ray.remote(_map_shard)
    reduce_task = ray.remote(_reduce_range)
    build_task = ray.remote(_slice_build)

    mapped = [map_task.options(num_returns=K + 1).remote(
        kb, bucket_size, n_buckets, span, [sl for _, sl in g],
        *[ref for ref, _ in g]) for g in groups]
    n_map = len(groups)
    if K == 1:
        shard_lists = [[m[0] for m in mapped]]
    else:
        shard_lists = [[mapped[i][k] for i in range(n_map)]
                       for k in range(K)]
    hist_refs = [m[K] if K > 1 else m[1] for m in mapped]

    reduced = [reduce_task.options(num_returns=2).remote(
        span, *shard_lists[k]) for k in range(K)]
    rows_refs = [r[0] for r in reduced]
    stats = ray.get([r[1] for r in reduced])
    m = float(sum(s[0] for s in stats))
    n_self = int(sum(s[2] for s in stats))
    n_canon = int(sum(s[1] for s in stats))
    n_sym = int(sum(s[3] for s in stats))
    assert n_sym == 2 * (n_canon - n_self) + n_self

    hist = sum(ray.get(hist_refs))
    P = min(_derive_P(n_sym, P), max(1, V))
    block = _bucket_bounds(hist, bucket_size, V, P)

    parts = []
    for pid in range(P):
        vlo, vhi = part_range(pid, block, P, V)
        # only reduce ranges overlapping [vlo, vhi) feed this partition
        need = [rows_refs[k] for k in range(K)
                if kb[k] < vhi and kb[k + 1] > vlo]
        parts.append(build_task.remote(vlo, vhi, span, *need))
    return Graph(V=V, P=P, block=block, parts=parts, m=m, sym_edges=n_sym)


def _bucket_bounds(bucket_hist: np.ndarray, bucket_size: int, V: int,
                   P: int) -> np.ndarray:
    """Edge-balanced partition boundaries cut at bucket granularity.

    Same contract as _balanced_bounds but over the capped-size degree
    sketch: every partition owns ≈ sym_edges/P CSR rows to within one
    bucket's worth of skew (bucket ≈ V/8192 ids)."""
    if P == 1:
        return np.array([0, V], np.int64)
    cum = np.concatenate([[0], np.cumsum(bucket_hist, dtype=np.int64)])
    total = cum[-1]
    bounds = np.zeros(P + 1, np.int64)
    bounds[P] = V
    prev = 0
    for i in range(1, P):
        bkt = int(np.searchsorted(cum, total * i / P))
        b = min(bkt * bucket_size, V)
        b = max(b, prev + 1)
        b = min(b, V - (P - i))
        bounds[i] = b
        prev = b
    return bounds


def _balanced_bounds(deg_hist: np.ndarray, V: int, P: int) -> np.ndarray:
    """Contiguous range boundaries cut at equal cumulative-degree quantiles.

    Every partition then owns ≈ sym_edges/P CSR rows regardless of where
    hub vertices sit in the id order (degree-based skew handling; the
    reference acknowledges but never fixes its hub-scan imbalance,
    report.txt:11). Returns int64 boundaries of length P+1."""
    if P == 1:
        return np.array([0, V], np.int64)
    cum = np.concatenate([[0], np.cumsum(deg_hist, dtype=np.int64)])
    total = cum[-1]
    bounds = np.zeros(P + 1, np.int64)
    bounds[P] = V
    prev = 0
    for i in range(1, P):
        b = int(np.searchsorted(cum, total * i / P))
        b = max(b, prev + 1)
        b = min(b, V - (P - i))
        bounds[i] = b
        prev = b
    return bounds
