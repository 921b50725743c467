"""Edge canonicalization / dedup / symmetrization.

Reference semantics being reproduced (SURVEY.md §2.2 G1, csrc/test/main.cpp):
- undirected graph: every edge inserted in both directions during CSR build
  (main.cpp:55-74) → `symmetrize` (a shuffle-free map_batches union);
- parallel-edge dedup (EdgeStore::insert, main.cpp:26-33; reference keeps the
  first occurrence — this engine keeps the min weight for a deterministic
  distributed equivalent; identical on inputs without parallel edges, which
  includes every reference fixture) → `dedup_min_weight`;
- derived corpus edges accumulate co-occurrence counts instead →
  `canonicalize_edges(...).groupby.sum`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Min, Sum


def _canonical_batch(batch: pa.Table) -> pa.Table:
    src = np.asarray(batch.column("src"), dtype=np.int64)
    dst = np.asarray(batch.column("dst"), dtype=np.int64)
    w = (np.asarray(batch.column("weight"), dtype=np.float64)
         if "weight" in batch.column_names
         else np.ones(len(src), np.float64))
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    return pa.table({"src": lo, "dst": hi, "weight": w})


def _canonical_combine_batch(batch: pa.Table) -> pa.Table:
    """Canonicalize + per-batch partial sum (combiner before the shuffle):
    repeated pairs inside a batch collapse locally, so the groupby moves
    one row per distinct in-batch pair instead of one per occurrence."""
    from leiden_cuda_ray.graph.runtime import segsum_by_pair

    t = _canonical_batch(batch)
    a, b, s = segsum_by_pair(np.asarray(t.column("src"), np.int64),
                             np.asarray(t.column("dst"), np.int64),
                             np.asarray(t.column("weight"), np.float64))
    return pa.table({"src": a, "dst": b, "weight": s})


def canonicalize_edges(ds, sum_weights: bool = True):
    """(src,dst[,weight]) any direction → canonical (src<=dst) unique rows.

    sum_weights=True  → weight = Σ per pair (co-occurrence counting)
    sum_weights=False → weight = min per pair (parallel-edge dedup)
    """
    if sum_weights:
        canon = ds.map_batches(_canonical_combine_batch,
                               batch_format="pyarrow", zero_copy_batch=True)
        agg = Sum("weight", alias_name="weight")
    else:
        canon = ds.map_batches(_canonical_batch, batch_format="pyarrow",
                               zero_copy_batch=True)
        agg = Min("weight", alias_name="weight")
    return canon.groupby(["src", "dst"]).aggregate(agg)


def dedup_min_weight(ds):
    return canonicalize_edges(ds, sum_weights=False)


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
