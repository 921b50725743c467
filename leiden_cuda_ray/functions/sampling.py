"""Deterministic sampling / dataset-split operators.

A 100-TB training-data pipeline needs reproducible, coordination-free
sampling: any worker must assign any row to the same split without a
shuffle, a broadcast, or an RNG stream. Everything here keys off the
splitmix64 finalizer over a stable id column — the same hash family the
package uses for centroid seeding (functions/similarity.py) and vertex
priorities (graph/runtime.py) — so the assignment is a pure, vectorized
function of (id, seed) and the split is stable across runs, partition
layouts and cluster sizes.

The finalizer is exactly expressible in DuckDB SQL (128-bit HUGEINT
arithmetic with the 64-bit multiply split into 32-bit halves), so the
driver oracle checks the split bit-for-bit — see
`__ray_entry__._splitmix_sql`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xBF58476D1CE4E5B9)


def splitmix_bucket(ids: np.ndarray, seed: int, mod: int) -> np.ndarray:
    """splitmix64-finalize (id + GOLDEN*seed) and reduce mod `mod`."""
    with np.errstate(over="ignore"):
        x = ids.astype(np.uint64) + _GOLDEN * np.uint64(seed)
        x ^= x >> np.uint64(30)
        x *= _MIX_B
        x ^= x >> np.uint64(27)
    return (x % np.uint64(mod)).astype(np.int64)


def hash_split(ds, id_col: str = "doc_id", train_pct: int = 80,
               seed: int = 42):
    """Append a deterministic 'split' column ('train'/'val'): row goes to
    train iff splitmix64(id, seed) % 100 < train_pct. Stateless per batch
    — no shuffle, no driver round-trip, stable under any blocking."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col))
        b = splitmix_bucket(ids, seed, 100)
        split = np.where(b < train_pct, "train", "val")
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
