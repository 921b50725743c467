"""Shared helpers for the iterative algorithms."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def state_to_dataset(graph, refs: list, column: str, dtype=pa.int64()):
    """Per-partition state arrays → Dataset[vertex:int64, <column>].

    Blocks are created by remote tasks directly from the object-store arrays;
    the driver never materializes rows."""
    import ray
    import ray.data

    @ray.remote
    def _mk(arr, vlo):
        ids = np.arange(vlo, vlo + len(arr), dtype=np.int64)
        return pa.table({"vertex": pa.array(ids, pa.int64()),
                         column: pa.array(arr, dtype)})

    blocks = [_mk.remote(r, vlo) for r, (vlo, _) in zip(refs, graph.ranges())]
    return ray.data.from_arrow_refs(blocks)


def local_src_per_slot(csr: dict) -> np.ndarray:
    """Local row index per CSR slot (edge-parallel src mirror)."""
    nv = csr["vhi"] - csr["vlo"]
    return np.repeat(np.arange(nv, dtype=np.int64), np.diff(csr["offsets"]))
