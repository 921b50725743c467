"""Sequence packing for LLM training: place every document in a fixed
token-budget bin stream (contiguous packing in global doc order, splits
allowed — a doc belongs to the bin where its first token lands).

Scale shape: the bin assignment is a GLOBAL prefix sum of token counts,
computed the way the vertex numbering is: a range-partitioned sort by
doc id orders the blocks, per-block token-count SUMS (one scalar per
block) reach the driver, and each block assigns its rows from its own
cumsum plus the block offset. Nothing row-sized leaves the object
store, and the result is independent of blocking by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _count_tokens(batch: pa.Table) -> pa.Table:
    toks = pc.split_pattern_regex(batch.column("text"), r"\s+")
    flat = pc.list_flatten(toks)
    par_arr = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    par = np.asarray(par_arr.filter(mask), np.int64)
    n = np.bincount(par, minlength=len(batch)).astype(np.int64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n, pa.int64()),
    })


def pack_sequences(ds, budget: int = 2048):
    """documents → (doc_id, n_tokens, bin, bin_offset): the packing
    assignment for a training run with `budget` tokens per sequence.
    bin = global-token-prefix // budget, bin_offset = prefix % budget,
    prefix taken over ascending doc_id."""
    import ray.data

    counted = (ds.select_columns(["doc_id", "text"])
               .map_batches(_count_tokens, batch_format="pyarrow",
                            zero_copy_batch=True))
    mat = counted.sort("doc_id").materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def _block_sum(t: pa.Table) -> int:
        s = pc.sum(t.column("n_tokens")).as_py()
        return int(s or 0)

    @ray.remote
    def _assign(t: pa.Table, offset: int) -> pa.Table:
        n = np.asarray(t.column("n_tokens"), np.int64)
        start = offset + np.cumsum(n) - n
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": t.column("n_tokens"),
            "bin": pa.array(start // budget, pa.int64()),
            "bin_offset": pa.array(start % budget, pa.int64()),
        })

    sums = ray.get([_block_sum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)
    out = [_assign.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)
