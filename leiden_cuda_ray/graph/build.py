"""Distributed graph build: canonical edge table → object-store CSR partitions.

Two paths:
- `build_graph_from_dataset`: the scale path. Symmetrize (shuffle-free
  map_batches), tag each row with its owner partition, spill to
  pid-partitioned Parquet (`write_parquet(partition_cols=["pid"])` — this
  doubles as the immutable graph checkpoint), then P parallel build tasks
  each read ONLY their partition directory and hold the CSR in the object
  store. No edge row ever passes through the driver.
- `build_graph_from_arrays`: in-memory path for fixtures and coarsened
  levels that already live in numpy (still builds partitions via remote
  tasks so superstep code is identical).

The partition count P is derived from edge count unless given
(EngineConfig.derive_partitions)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from leiden_cuda_ray.graph.csr import build_partition_csr, owner_of, part_range


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


def build_graph_from_dataset(edges_ds, V: int, P: int | None = None,
                             spill_dir: str | None = None) -> Graph:
    """Canonical edge Dataset (src<=dst unique, weighted) → Graph.

    edges_ds columns: src:int64, dst:int64, weight:float64.
    The pid-partitioned Parquet spill at `spill_dir` is also the graph's
    durable checkpoint (resumable builds skip straight to the CSR tasks).
    """
    import ray

    from leiden_cuda_ray.stages.edges import symmetrize

    if spill_dir is None:
        spill_dir = f"/tmp/leiden_cuda_ray/graph_{os.getpid()}_{id(edges_ds)}"

    stats = edges_ds.aggregate(_weight_agg(V))
    m, n_canon, n_self, deg_hist = stats["edge_stats"]
    m = float(m)
    n_canon = int(n_canon)
    n_self = int(n_self)
    n_sym = 2 * (n_canon - n_self) + n_self

    P = min(_derive_P(n_sym, P), max(1, V))
    block = _balanced_bounds(deg_hist, V, P)

    # the spill layout depends on the partitioning: key the directory by it
    # so a re-run with different V/P/bounds never reads a stale layout
    import hashlib

    bkey = hashlib.blake2b(np.asarray(block).tobytes(),
                           digest_size=6).hexdigest()
    spill_dir = os.path.join(spill_dir, f"V{V}_P{P}_B{bkey}")
    done_marker = os.path.join(spill_dir, "_BUILD_DONE")
    if not os.path.exists(done_marker):
        sym = symmetrize(edges_ds)

        def _tag(batch: pa.Table) -> pa.Table:
            s = np.asarray(batch.column("src"), np.int64)
            pid = owner_of(s, block, P)
            return batch.append_column("pid", pa.array(pid, pa.int64()))

        sym.map_batches(_tag, batch_format="pyarrow").write_parquet(
            spill_dir, partition_cols=["pid"])
        with open(done_marker, "w") as f:
            f.write("ok")

    @ray.remote
    def _build(pid):
        import pyarrow.parquet as pq

        vlo, vhi = part_range(pid, block, P, V)
        pdir = os.path.join(spill_dir, f"pid={pid}")
        if os.path.isdir(pdir):
            t = pq.read_table(pdir, columns=["src", "dst", "weight"])
            s = np.asarray(t.column("src"), np.int64)
            d = np.asarray(t.column("dst"), np.int64)
            ww = np.asarray(t.column("weight"), np.float64)
        else:  # partition with only isolated vertices
            s = np.empty(0, np.int64)
            d = np.empty(0, np.int64)
            ww = np.empty(0, np.float64)
        return build_partition_csr(s, d, ww, vlo, vhi)

    parts = [_build.remote(pid) for pid in range(P)]
    return Graph(V=V, P=P, block=block, parts=parts, m=m, sym_edges=n_sym)


def _weight_agg(V: int):
    """One streaming pass over the canonical table:
    (Σ weight, row count, self-loop count, symmetrized-degree histogram).

    The histogram feeds the edge-balanced partition boundaries (degree-skew
    mitigation). Scale note: the dense V-sized accumulator would become a
    quantile sketch of the src distribution at extreme V; everything else
    is unchanged."""
    from ray.data.aggregate import AggregateFn

    def acc_block(acc, blk):
        t = _as_table(blk)
        w = np.asarray(t.column("weight"), np.float64)
        s = np.asarray(t.column("src"), np.int64)
        d = np.asarray(t.column("dst"), np.int64)
        selfs = s == d
        hist = acc[3].copy()
        np.add.at(hist, s, 1)
        np.add.at(hist, d[~selfs], 1)
        return (acc[0] + float(w.sum()), acc[1] + len(w),
                acc[2] + int(selfs.sum()), hist)

    return AggregateFn(
        init=lambda k: (0.0, 0, 0, np.zeros(V, np.int64)),
        accumulate_block=acc_block,
        merge=lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2],
                            a[3] + b[3]),
        name="edge_stats",
    )


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


def _as_table(blk) -> pa.Table:
    if isinstance(blk, pa.Table):
        return blk
    import pandas as pd

    if isinstance(blk, pd.DataFrame):
        return pa.Table.from_pandas(blk)
    return pa.table(blk)
