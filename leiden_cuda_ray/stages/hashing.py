"""Per-row content hashing (the north-rule sha256 invariant).

Stateless `map_batches` over zero-copy Arrow batches: adds `sha256:string`
derived from the `content` column. The hash travels with every derived row so
outputs can be verified row-wise against inputs keyed by (repo, path, commit)
without ever re-shipping file bodies through iterative state (SURVEY.md §7.4
"Wide `content` rows").
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def _sha256_batch(batch: pa.Table) -> pa.Table:
    col = batch.column("content")
    digests = [hashlib.sha256(v.encode() if isinstance(v, str) else v).hexdigest()
               for v in col.to_pylist()]
    return batch.append_column("sha256", pa.array(digests, pa.string()))


def with_sha256(ds):
    """Dataset[... content] -> Dataset[... content, sha256]."""
    return ds.map_batches(_sha256_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
