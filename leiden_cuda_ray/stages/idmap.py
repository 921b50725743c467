"""Broadcast vertex-id mapping: the small-side-join killer for edge derivation.

The vertex numbering is tiny relative to the pair stream (V files vs O(E)
pair rows), so it is shipped once per node through the object store and ids
are substituted inside STATELESS map_batches tasks — zero shuffles instead
of two string-key hash joins (pipelines/derive.py round 1), and no actor
pool that could reserve the whole CPU budget on a small cluster (the 2-CPU
starvation hazard joins.py documents for aggregators applies to actor-pool
map operators too).

Lookup structure: a sorted uint64 array of key hashes + aligned vertex ids.
Keys are hashed vectorized (polars ahash with a fixed seed — deterministic
within one environment) and resolved by np.searchsorted; the builder
verifies the hash set is collision-free and falls back to the distributed
join path otherwise (also above `max_broadcast_keys`, where the driver-side
fetch no longer belongs in one process).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HASH_SEED = 0x5EED


def _hash_keys(arr) -> np.ndarray:
    """Vectorized 64-bit hash of a pyarrow string array (polars ahash;
    falls back to a Python blake2b loop without polars)."""
    try:
        import polars as pl

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        s = pl.from_arrow(arr)
        return s.hash(seed=_HASH_SEED).to_numpy().astype(np.uint64)
    except ImportError:
        import hashlib

        return np.array([
            int.from_bytes(hashlib.blake2b(
                x.encode(), digest_size=8).digest(), "big")
            for x in arr.to_pylist()], np.uint64)


def _key_hashes(repo, path) -> np.ndarray:
    return _hash_keys(pc.binary_join_element_wise(repo, path, "|"))


def build_vertex_maps(ft_ds, numbering_ds,
                      max_broadcast_keys: int = 2_000_000):
    """→ ObjectRef of the lookup dict, or None (→ join fallback).

    path map: hash("repo|path") → vertex. stem map: hash("repo|stem") →
    vertex for import-target resolution. None when the numbering exceeds
    the broadcast threshold, when stems are ambiguous within a repo (a
    1:1 lookup cannot reproduce the join's fan-out), or on hash collision.
    """
    import ray

    num_t = pa.concat_tables(ray.get(numbering_ds.to_arrow_refs()))
    if num_t.num_rows > max_broadcast_keys:
        return None
    ft_t = pa.concat_tables(ray.get(ft_ds.to_arrow_refs()))

    verts = np.asarray(num_t.column("vertex"), np.int64)
    ph = _key_hashes(num_t.column("repo"), num_t.column("path"))
    order = np.argsort(ph)
    path_hash = ph[order]
    path_vid = verts[order]
    if len(path_hash) > 1 and (path_hash[1:] == path_hash[:-1]).any():
        return None  # hash collision — use the join path

    fh = _key_hashes(ft_t.column("repo"), ft_t.column("path"))
    sh = _hash_keys(pc.binary_join_element_wise(
        ft_t.column("repo"), ft_t.column("stem"), "|"))
    # resolve each file's vertex id through the path map
    pos = np.searchsorted(path_hash, fh)
    assert (path_hash[np.minimum(pos, len(path_hash) - 1)] == fh).all()
    svid = path_vid[pos]
    order = np.argsort(sh)
    stem_hash = sh[order]
    stem_vid = svid[order]
    if len(stem_hash) > 1 and (stem_hash[1:] == stem_hash[:-1]).any():
        return None  # ambiguous stems (or collision)

    return ray.put({
        "path_hash": path_hash, "path_vid": path_vid,
        "stem_hash": stem_hash, "stem_vid": stem_vid,
    })


def _resolve(hashes: np.ndarray, table_h: np.ndarray,
             table_v: np.ndarray) -> np.ndarray:
    """hash array → vertex ids; -1 where absent."""
    pos = np.searchsorted(table_h, hashes)
    out = np.full(len(hashes), -1, np.int64)
    if len(table_h):
        inb = pos < len(table_h)
        hit = np.zeros(len(hashes), bool)
        hit[inb] = table_h[pos[inb]] == hashes[inb]
        out[hit] = table_v[pos[hit]]
    return out


def make_import_mapper(maps_ref, drop_self: bool = True):
    """(src_repo, src_path, dst_repo, dst_stem) → (src, dst, weight) int
    edges; unresolved targets dropped (inner-join semantics). Stateless
    task fn — the lookup arrays come zero-copy from the object store.
    drop_self=False keeps self-imports (the import_pairs oracle has no
    self filter; the graph build drops them)."""
    def fn(batch: pa.Table) -> pa.Table:
        import ray

        maps = ray.get(maps_ref)
        src = _resolve(_key_hashes(batch.column("src_repo"),
                                   batch.column("src_path")),
                       maps["path_hash"], maps["path_vid"])
        if (src < 0).any():
            raise KeyError("unnumbered source file in import stream")
        dst = _resolve(_key_hashes(batch.column("dst_repo"),
                                   batch.column("dst_stem")),
                       maps["stem_hash"], maps["stem_vid"])
        keep = (dst >= 0) & (src != dst) if drop_self else (dst >= 0)
        return pa.table({
            "src": pa.array(src[keep], pa.int64()),
            "dst": pa.array(dst[keep], pa.int64()),
            "weight": pa.array(np.ones(int(keep.sum())), pa.float64()),
        })
    return fn


def make_path_mapper(maps_ref):
    """(repo, commit, path) → (repo, commit, vid) for co-commit pairing:
    the groupby then shuffles an int64 instead of the path string."""
    def fn(batch: pa.Table) -> pa.Table:
        import ray

        maps = ray.get(maps_ref)
        vid = _resolve(_key_hashes(batch.column("repo"),
                                   batch.column("path")),
                       maps["path_hash"], maps["path_vid"])
        if (vid < 0).any():
            raise KeyError("unnumbered file in co-commit stream")
        return pa.table({
            "repo": batch.column("repo"),
            "commit": batch.column("commit"),
            "vid": pa.array(vid, pa.int64()),
        })
    return fn
