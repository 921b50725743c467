"""Scale the driver testdata tiers by deterministic tiling (robustness
sweeps only — correctness stays pinned to the driver's sf0.01 oracles).

Each replica r of a table offsets its primary/foreign keys by r * (max
key + 1) so joins stay replica-local and output cardinalities scale
linearly. Document texts get a replica suffix token and embeddings get a
per-replica cyclic dimension shift so exact/near-dup structure replicates
per-tile instead of exploding quadratically across tiles (a 10x corpus
with identical tiles would turn every dup group into a 10x group and
every near-dup pair count into 100x — a different workload, not a bigger
one). region/nation are fixed dimension tables and are copied as-is.

Usage: python tools/gen_scaled_testdata.py SRC_DIR DST_DIR REPLICAS
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table key columns to offset: (column, stride-source-table-key)
_OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# the stride for each key column comes from ITS owning table's key span
_KEY_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def scale_dir(src: str, dst: str, replicas: int) -> None:
    os.makedirs(dst, exist_ok=True)
    strides = {}
    for col, (tab, key) in _KEY_OWNER.items():
        t = pq.read_table(f"{src}/{tab}.parquet", columns=[key])
        strides[col] = int(pc.max(t.column(key)).as_py()) + 1

    for name in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{dst}/{name}.parquet")

    for name, keys in _OFFSET_KEYS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        tiles = []
        for r in range(replicas):
            cols = {}
            for f in t.schema:
                arr = t.column(f.name)
                if f.name in keys:
                    arr = pc.add(arr, r * strides[f.name])
                elif name == "documents" and f.name == "text" and r > 0:
                    # distinct per tile: dup groups replicate, not explode
                    arr = pc.binary_join_element_wise(
                        arr, pa.array([f"tile{r}"] * len(t)), " ")
                elif name == "embeddings" and f.name == "embedding" and r:
                    flat = np.asarray(arr.combine_chunks().flatten(),
                                      np.float32)
                    n = len(t)
                    dim = len(flat) // n
                    m = np.roll(flat.reshape(n, dim), r % dim, axis=1)
                    arr = pa.FixedSizeListArray.from_arrays(
                        pa.array(m.ravel(), pa.float32()), dim).cast(
                        pa.list_(pa.float32()))
                cols[f.name] = arr
            tiles.append(pa.table(cols))
        out = pa.concat_tables(tiles)
        if name == "documents":
            # keep n_chars consistent with the suffixed text
            out = out.set_column(
                out.schema.get_field_index("n_chars"), "n_chars",
                pc.cast(pc.utf8_length(out.column("text")), pa.int64()))
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {len(t)} -> {len(out)} rows")


if __name__ == "__main__":
    scale_dir(sys.argv[1], sys.argv[2], int(sys.argv[3]))
