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


def _dedup_sorted_refs(refs, keys: list[str]):
    """Distinct rows of globally-sorted blocks, without another shuffle.

    Per-block consecutive dedup runs in parallel tasks; only each block's
    boundary keys (first/last row) reach the driver, which drops a
    block-leading row when it equals the previous block's last key —
    duplicates of one key split across blocks collapse to its first
    occurrence. Returns the deduped block refs."""
    import ray

    @ray.remote(num_returns=3)
    def _dedup_block(t: pa.Table, keys):
        if t.num_rows == 0:
            return t, None, None
        cols = [np.asarray(t.column(k)).astype(object) for k in keys]
        keep = np.ones(t.num_rows, bool)
        # a row is a duplicate only if EVERY key equals the previous row's
        same = np.ones(t.num_rows - 1, bool)
        for c in cols:
            same &= c[1:] == c[:-1]
        keep[1:] = ~same
        first = tuple(c[0] for c in cols)
        last = tuple(c[-1] for c in cols)
        return t.filter(pa.array(keep)), first, last

    @ray.remote
    def _drop_first(t: pa.Table) -> pa.Table:
        return t.slice(1)

    out = [list(_dedup_block.remote(r, keys)) for r in refs]
    firsts = ray.get([o[1] for o in out])
    lasts = ray.get([o[2] for o in out])
    deduped = []
    prev_last = None
    for (tref, _f, _l), first, last in zip(out, firsts, lasts):
        if first is None:
            continue
        if prev_last is not None and first == prev_last:
            tref = _drop_first.remote(tref)
            # a block holding only duplicates of prev_last becomes empty;
            # its last key equals prev_last, so the chain continues
        deduped.append(tref)
        prev_last = last
    return deduped


def build_vertex_numbering(file_table_ds, dedup: bool = False):
    """Dataset[repo, path, ...] → (Dataset[repo, path, vertex], V).

    Deterministic: ids are the rank in (repo, path) sort order. With
    dedup=True the input may contain duplicate (repo, path) rows (e.g.
    one row per commit): the distinct happens INSIDE the sort's output
    blocks (_dedup_sorted_refs) instead of a separate groupby shuffle.
    """
    import ray
    import ray.data

    sorted_ds = file_table_ds.select_columns(["repo", "path"]).sort(
        ["repo", "path"])
    if not dedup:
        return zip_with_index(sorted_ds, "vertex")
    refs = sorted_ds.materialize().to_arrow_refs()
    deduped = _dedup_sorted_refs(refs, ["repo", "path"])
    if not deduped:
        deduped = refs[:1]
    return zip_with_index(ray.data.from_arrow_refs(deduped), "vertex")
