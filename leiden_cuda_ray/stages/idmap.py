"""Broadcast vertex-id mapping: the small-side-join killer for edge derivation.

The vertex numbering is tiny relative to the pair stream (V files vs O(E)
pair rows), so shipping it once per node through the object store and mapping
ids inside a stateless batch pass replaces TWO string-key hash joins (src and
dst resolution, pipelines/derive.py round 1) with zero shuffles. Lookup
tables are built ONCE per actor in __init__ (pd.Index — C-hash lookups), not
per batch.

Scale gate: above `max_broadcast_keys` distinct files the driver-side fetch
and per-actor index no longer fit comfortably in worker heaps, and
derive_edges falls back to the distributed hash-join path. The threshold is
a config knob; the broadcast object itself is shared per node via plasma.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def build_vertex_maps(ft_ds, numbering_ds,
                      max_broadcast_keys: int = 2_000_000):
    """→ ObjectRef of {path_keys, stem_keys, stem_vids} or None.

    path map: "repo|path" → vertex (vertex == position: numbering rows are
    fetched in id order). stem map: "repo|stem" → vertex for import-target
    resolution; None is returned (→ join fallback) when stems are ambiguous
    within a repo (two files with the same basename), because a broadcast
    1:1 lookup cannot reproduce the join's fan-out semantics.
    """
    import ray

    num_t = pa.concat_tables(ray.get(numbering_ds.to_arrow_refs()))
    if num_t.num_rows > max_broadcast_keys:
        return None
    ft_t = pa.concat_tables(ray.get(ft_ds.to_arrow_refs()))

    verts = np.asarray(num_t.column("vertex"), np.int64)
    order = np.argsort(verts)
    path_keys = np.asarray(
        pc.binary_join_element_wise(num_t.column("repo"),
                                    num_t.column("path"), "|"),
        dtype=object)[order]

    # stem table joined to ids driver-side (V rows)
    ft_df = pd.DataFrame({
        "key": np.asarray(
            pc.binary_join_element_wise(ft_t.column("repo"),
                                        ft_t.column("path"), "|"),
            dtype=object),
        "stem_key": np.asarray(
            pc.binary_join_element_wise(ft_t.column("repo"),
                                        ft_t.column("stem"), "|"),
            dtype=object),
    })
    if ft_df["stem_key"].duplicated().any():
        return None
    pos = pd.Index(path_keys).get_indexer(ft_df["key"].to_numpy())
    assert (pos >= 0).all()
    return ray.put({
        "path_keys": path_keys,
        "stem_keys": ft_df["stem_key"].to_numpy(),
        "stem_vids": pos.astype(np.int64),
    })


class _MapperBase:
    def __init__(self, maps_ref):
        import ray

        maps = ray.get(maps_ref) if hasattr(maps_ref, "hex") else maps_ref
        self.path_index = pd.Index(maps["path_keys"])
        self.stem_index = pd.Index(maps["stem_keys"])
        self.stem_vids = maps["stem_vids"]

    def _path_ids(self, repo, path) -> np.ndarray:
        keys = np.asarray(pc.binary_join_element_wise(repo, path, "|"),
                          dtype=object)
        ids = self.path_index.get_indexer(keys)
        if (ids < 0).any():
            missing = keys[ids < 0][:3]
            raise KeyError(f"unnumbered file keys: {list(missing)}")
        return ids.astype(np.int64)

    def _stem_ids(self, repo, stem) -> np.ndarray:
        keys = np.asarray(pc.binary_join_element_wise(repo, stem, "|"),
                          dtype=object)
        pos = self.stem_index.get_indexer(keys)
        found = pos >= 0
        out = np.full(len(keys), -1, np.int64)
        out[found] = self.stem_vids[pos[found]]
        return out  # -1 = unresolved (target outside the corpus)


class ImportIdMapper(_MapperBase):
    """(src_repo, src_path, dst_repo, dst_stem) → (src, dst, weight) int
    edges; unresolved targets dropped (inner-join semantics)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = self._path_ids(batch.column("src_repo"),
                             batch.column("src_path"))
        dst = self._stem_ids(batch.column("dst_repo"),
                             batch.column("dst_stem"))
        keep = (dst >= 0) & (src != dst)
        return pa.table({
            "src": pa.array(src[keep], pa.int64()),
            "dst": pa.array(dst[keep], pa.int64()),
            "weight": pa.array(np.ones(int(keep.sum())), pa.float64()),
        })


class PathIdMapper(_MapperBase):
    """(repo, commit, path) → (repo, commit, vid) for co-commit pairing:
    the groupby then shuffles an int64 instead of the path string."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid = self._path_ids(batch.column("repo"), batch.column("path"))
        return pa.table({
            "repo": batch.column("repo"),
            "commit": batch.column("commit"),
            "vid": pa.array(vid, pa.int64()),
        })
