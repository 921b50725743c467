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
    block: int
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

    P = _derive_P(len(src_s), P)
    block = max(1, -(-V // P))

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

    stats = edges_ds.aggregate(_weight_agg())
    m, n_canon, n_self = stats["edge_stats"]
    m = float(m)
    n_canon = int(n_canon)
    n_self = int(n_self)
    n_sym = 2 * (n_canon - n_self) + n_self

    P = _derive_P(n_sym, P)
    block = max(1, -(-V // P))

    # the spill layout depends on the partitioning: key the directory by it
    # so a re-run with different V/P/block never reads a stale layout
    spill_dir = os.path.join(spill_dir, f"V{V}_P{P}_B{block}")
    done_marker = os.path.join(spill_dir, "_BUILD_DONE")
    if not os.path.exists(done_marker):
        sym = symmetrize(edges_ds)

        def _tag(batch: pa.Table) -> pa.Table:
            s = np.asarray(batch.column("src"), np.int64)
            pid = np.minimum(s // block, P - 1)
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


def _weight_agg():
    """One streaming pass over the canonical table:
    (Σ weight, row count, self-loop count)."""
    from ray.data.aggregate import AggregateFn

    def acc_block(acc, blk):
        t = _as_table(blk)
        w = np.asarray(t.column("weight"), np.float64)
        s = np.asarray(t.column("src"), np.int64)
        d = np.asarray(t.column("dst"), np.int64)
        return (acc[0] + float(w.sum()), acc[1] + len(w),
                acc[2] + int((s == d).sum()))

    return AggregateFn(
        init=lambda k: (0.0, 0, 0),
        accumulate_block=acc_block,
        merge=lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
        name="edge_stats",
    )


def _as_table(blk) -> pa.Table:
    if isinstance(blk, pa.Table):
        return blk
    import pandas as pd

    if isinstance(blk, pd.DataFrame):
        return pa.Table.from_pandas(blk)
    return pa.table(blk)
