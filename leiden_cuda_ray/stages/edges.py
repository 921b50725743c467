"""Edge canonicalization / dedup / symmetrization.

Reference semantics being reproduced (SURVEY.md §2.2 G1, csrc/test/main.cpp):
- undirected graph: every edge inserted in both directions during CSR build
  (main.cpp:55-74) → `symmetrize` (a shuffle-free map_batches union);
- parallel-edge dedup (EdgeStore::insert, main.cpp:26-33; reference keeps the
  first occurrence — this engine keeps the min weight for a deterministic
  distributed equivalent; identical on inputs without parallel edges, which
  includes every reference fixture) → `dedup_min_weight`;
- derived corpus edges accumulate co-occurrence counts instead →
  `canonicalize_edges(sum_weights=True)` (raw owner-sharded exchange).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

def _canonical_batch(batch: pa.Table, directed: bool = False) -> pa.Table:
    src = np.asarray(batch.column("src"), dtype=np.int64)
    dst = np.asarray(batch.column("dst"), dtype=np.int64)
    w = (np.asarray(batch.column("weight"), dtype=np.float64)
         if "weight" in batch.column_names
         else np.ones(len(src), np.float64))
    if directed:
        return pa.table({"src": src, "dst": dst, "weight": w})
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    return pa.table({"src": lo, "dst": hi, "weight": w})


def _agg_pairs(s, d, w, sum_weights: bool):
    """Vectorized per-pair aggregate: sort by (s, d), then segment-sum or
    segment-min the weights."""
    if not len(s):
        return s, d, w
    order = np.lexsort((d, s))
    s, d, w = s[order], d[order], w[order]
    first = np.empty(len(s), bool)
    first[0] = True
    np.logical_or(s[1:] != s[:-1], d[1:] != d[:-1], out=first[1:])
    idx = np.flatnonzero(first)
    if sum_weights:
        sums = np.add.reduceat(w, idx)
    else:
        sums = np.minimum.reduceat(w, idx)
    return s[idx], d[idx], sums


def _canon_map_fused(K, sum_weights, span, directed, slices, *blocks):
    """Fused-key map side: canonicalize + partial-combine + hash-shard.

    Same fused src*span+dst trick as the graph build's exchange
    (graph/build.py::_map_shard): one SIMD np.sort + run-length pass when
    every weight is 1.0, argsort + reduceat otherwise. Shards by a
    golden-ratio hash of the fused key; a stable argsort on the owner
    keeps keys sorted within each shard. directed=True skips the min/max
    flip (per-ordered-pair aggregation, e.g. import-edge distinct)."""
    keys, ws = [], []
    uniform = True
    for t, sl in zip(blocks, slices):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t)
        if t.num_rows == 0 or "src" not in t.column_names:
            continue
        if sl is not None:
            t = t.slice(sl[0], sl[1] - sl[0])
        s = np.asarray(t.column("src"), np.int64)
        d = np.asarray(t.column("dst"), np.int64)
        if "weight" in t.column_names:
            w = np.asarray(t.column("weight"), np.float64)
            uniform = uniform and bool((w == 1.0).all())
        else:
            w = np.ones(len(s), np.float64)
        hi = np.maximum(s, d)
        if len(hi) and (int(hi.max()) >= span or int(np.minimum(s, d).min()) < 0):
            raise ValueError(
                f"edge id outside [0, {span}) — wrong V passed to "
                f"canonicalize_edges; fused keys would collide")
        keys.append(s * span + d if directed
                    else np.minimum(s, d) * span + hi)
        ws.append(w)
    key = np.concatenate(keys) if keys else np.empty(0, np.int64)
    w = np.concatenate(ws) if ws else np.empty(0, np.float64)

    if len(key) == 0:
        ku, agg = key, w
    elif uniform:
        key.sort()
        cut = np.empty(len(key), bool)
        cut[0] = True
        np.not_equal(key[1:], key[:-1], out=cut[1:])
        starts = np.flatnonzero(cut)
        ku = key[starts]
        if sum_weights:
            agg = np.diff(np.concatenate([starts, [len(key)]])
                          ).astype(np.float64)
        else:  # min of all-1.0 weights is 1.0
            agg = np.ones(len(ku), np.float64)
    else:
        order = np.argsort(key)
        k = key[order]
        v = w[order]
        cut = np.empty(len(k), bool)
        cut[0] = True
        np.not_equal(k[1:], k[:-1], out=cut[1:])
        starts = np.flatnonzero(cut)
        ku = k[starts]
        agg = (np.add.reduceat(v, starts) if sum_weights
               else np.minimum.reduceat(v, starts))

    with np.errstate(over="ignore"):
        own = (ku.astype(np.uint64)
               * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(K)
    order = np.argsort(own, kind="stable")
    ku, agg, own = ku[order], agg[order], own[order]
    bounds = np.searchsorted(own, np.arange(K + 1, dtype=np.uint64))
    out = [(ku[bounds[k]:bounds[k + 1]], agg[bounds[k]:bounds[k + 1]])
           for k in range(K)]
    return tuple(out) if K > 1 else out[0]


def _canon_reduce_fused(sum_weights, span, *shards):
    from leiden_cuda_ray.graph.runtime import segmin_by_key, segsum_by_key

    key = np.concatenate([x[0] for x in shards]) if shards else \
        np.empty(0, np.int64)
    w = np.concatenate([x[1] for x in shards]) if shards else \
        np.empty(0, np.float64)
    key, w = (segsum_by_key(key, w) if sum_weights
              else segmin_by_key(key, w))
    s = key // span
    return pa.table({"src": pa.array(s, pa.int64()),
                     "dst": pa.array(key - s * span, pa.int64()),
                     "weight": pa.array(w, pa.float64())})


def canonicalize_edges(ds, sum_weights: bool = True, V: int | None = None,
                       directed: bool = False):
    """(src,dst[,weight]) any direction → canonical (src<=dst) unique rows.

    sum_weights=True  → weight = Σ per pair (co-occurrence counting)
    sum_weights=False → weight = min per pair (parallel-edge dedup)
    directed=True     → aggregate per ORDERED pair (no min/max flip) —
                        the distinct/count primitive for directed edge
                        streams (import pairs); same exchange shapes.

    Runs as a raw owner-sharded exchange (map tasks canonicalize +
    partial-aggregate and shard by pair hash; K reducers finish), the
    graph build's pattern — a Ray Data groupby on the same input spends
    ~10× the wall time in shuffle fixed costs (46 s vs ~4 s for 4.7 M
    int pairs at 32 CPUs).

    Pass V (vertex-id upper bound) to take the fused-key path: rows travel
    as src*V+dst int64 keys with row-balanced map groups — the same shapes
    that made the graph build 9.6× faster at sf1 (graph/build.py). Output
    row set and weights are identical either way (weight sums here are
    counts of 1.0s, exact under any association below 2^53); only the
    row→reducer hash differs. V=None keeps the pair-column path."""
    import ray
    import ray.data

    from leiden_cuda_ray.graph.build import _FUSE_V_MAX, _plan_map_groups

    mat = ds.materialize()
    cpus = int(ray.cluster_resources().get("CPU", 4))
    K = max(1, min(cpus, 32))
    if V is not None and 0 < V < _FUSE_V_MAX:
        blocks_meta = []
        for bundle in mat.iter_internal_ref_bundles():
            for ref, meta in zip(bundle.block_refs, bundle.metadata):
                blocks_meta.append((ref, int(meta.num_rows or 0)))
        n_map = max(1, min(len(blocks_meta), 4 * cpus))
        groups = _plan_map_groups(blocks_meta, n_map)
        map_task = ray.remote(_canon_map_fused)
        reduce_task = ray.remote(_canon_reduce_fused)
        mapped = [map_task.options(num_returns=K).remote(
            K, sum_weights, V, directed, [sl for _, sl in g],
            *[r for r, _ in g]) for g in groups]
        if K == 1:
            shard_lists = [[m for m in mapped]]
        else:
            mapped = [list(m) for m in mapped]
            shard_lists = [[mapped[i][k] for i in range(len(groups))]
                           for k in range(K)]
        outs = [reduce_task.remote(sum_weights, V, *shard_lists[k])
                for k in range(K)]
        return ray.data.from_arrow_refs(outs)

    refs = mat.to_arrow_refs()
    n_map = max(1, min(len(refs), 4 * cpus))
    groups = [refs[i::n_map] for i in range(n_map)]

    def _map(K, sum_weights, *blocks):
        ss, dd, ww = [], [], []
        for t in blocks:
            if not isinstance(t, pa.Table):
                t = pa.Table.from_pandas(t)
            if t.num_rows == 0:
                continue
            ct = _canonical_batch(t, directed=directed)
            ss.append(np.asarray(ct.column("src"), np.int64))
            dd.append(np.asarray(ct.column("dst"), np.int64))
            ww.append(np.asarray(ct.column("weight"), np.float64))
        s = np.concatenate(ss) if ss else np.empty(0, np.int64)
        d = np.concatenate(dd) if dd else np.empty(0, np.int64)
        w = np.concatenate(ww) if ww else np.empty(0, np.float64)
        s, d, w = _agg_pairs(s, d, w, sum_weights)  # combiner
        with np.errstate(over="ignore"):
            own = ((s.astype(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15))
                   ^ d.astype(np.uint64)) % np.uint64(K)
        order = np.argsort(own, kind="stable")
        s, d, w, own = s[order], d[order], w[order], own[order]
        bounds = np.searchsorted(own, np.arange(K + 1, dtype=np.uint64))
        out = [(s[bounds[k]:bounds[k + 1]], d[bounds[k]:bounds[k + 1]],
                w[bounds[k]:bounds[k + 1]]) for k in range(K)]
        return tuple(out) if K > 1 else out[0]

    def _reduce(sum_weights, *shards):
        s = np.concatenate([x[0] for x in shards]) if shards else \
            np.empty(0, np.int64)
        d = np.concatenate([x[1] for x in shards]) if shards else \
            np.empty(0, np.int64)
        w = np.concatenate([x[2] for x in shards]) if shards else \
            np.empty(0, np.float64)
        s, d, w = _agg_pairs(s, d, w, sum_weights)
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64()),
                         "weight": pa.array(w, pa.float64())})

    map_task = ray.remote(_map)
    reduce_task = ray.remote(_reduce)
    mapped = [map_task.options(num_returns=K).remote(K, sum_weights, *g)
              for g in groups]
    if K == 1:
        shard_lists = [[m for m in mapped]]
    else:
        mapped = [list(m) for m in mapped]
        shard_lists = [[mapped[i][k] for i in range(n_map)]
                       for k in range(K)]
    outs = [reduce_task.remote(sum_weights, *shard_lists[k])
            for k in range(K)]
    return ray.data.from_arrow_refs(outs)


def dedup_min_weight(ds, V: int | None = None):
    return canonicalize_edges(ds, sum_weights=False, V=V)


def _symmetrize_batch(batch: pa.Table) -> pa.Table:
    src = np.asarray(batch.column("src"), dtype=np.int64)
    dst = np.asarray(batch.column("dst"), dtype=np.int64)
    w = np.asarray(batch.column("weight"), dtype=np.float64)
    off = src != dst  # self-loops stay single (main.cpp dedup drops the twin)
    return pa.table({
        "src": np.concatenate([src, dst[off]]),
        "dst": np.concatenate([dst, src[off]]),
        "weight": np.concatenate([w, w[off]]),
    })


def has_self_loops(ds) -> bool:
    """Self-loop probe (examples/test1.py:40-42): any edge with src == dst.

    Streaming filter + count — no materialization."""
    def only_selfs(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"), np.int64)
        dst = np.asarray(batch.column("dst"), np.int64)
        keep = src == dst
        return pa.table({"src": src[keep]})

    return ds.map_batches(only_selfs, batch_format="pyarrow",
                          zero_copy_batch=True).count() > 0


def symmetrize(canonical_ds):
    """Canonical (src<=dst, unique) edges → both directions, self-loops once.

    Shuffle-free: pure per-batch duplication (the swapped copy of a canonical
    unique pair cannot collide with any other row).
    """
    return canonical_ds.map_batches(_symmetrize_batch, batch_format="pyarrow",
                                    zero_copy_batch=True)
