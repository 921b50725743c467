"""Vertex numbering: distinct node keys → deterministic dense int64 ids.

Mirrors the reference renumbering contract (min id → 0, dense range;
csrc/test/main.cpp:153-175) for arbitrary string keys: sort the distinct
(repo, path) keys globally, then assign ids by global rank. The rank
assignment is distributed: sort → per-block row counts (tiny driver scalars)
→ per-block offset added inside parallel tasks. No row ever passes through
the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def zip_with_index(ds, id_column: str = "vertex"):
    """Append a global, order-preserving dense int64 id to a sorted Dataset.

    The input must already be sorted in the desired id order. Blocks are kept
    in the object store; only per-block row counts reach the driver.
    """
    import ray

    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def _assign(t: pa.Table, offset: int, col: str) -> pa.Table:
        ids = np.arange(offset, offset + t.num_rows, dtype=np.int64)
        return t.append_column(col, pa.array(ids, pa.int64()))

    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    out_refs = [_assign.remote(r, int(off), id_column)
                for r, off in zip(refs, offsets)]
    import ray.data

    return ray.data.from_arrow_refs(out_refs), int(np.sum(counts))


def build_vertex_numbering(file_table_ds):
    """Dataset[repo, path, ...] (distinct) → (Dataset[repo, path, vertex], V).

    Deterministic: ids are the rank in (repo, path) sort order.
    """
    sorted_ds = file_table_ds.select_columns(["repo", "path"]).sort(
        ["repo", "path"])
    return zip_with_index(sorted_ds, "vertex")
