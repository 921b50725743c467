"""Co-commit edge builder: files touched by the same (repo, commit).

North-rule operator (SURVEY.md §2.2): `groupby(["repo","commit"]).map_groups`
emitting canonical pairwise edges. Giant commits are the canonical skew hazard
(a commit touching k files emits k·(k−1)/2 pairs); groups larger than `cap`
are deterministically down-sampled to a ring + hash-selected chords so the
fan-out stays O(cap·k) instead of O(k²) while keeping the group connected.

Pairing runs in INT vertex-id space only: both derive branches (broadcast id
map and distributed hash-join fallback) resolve (repo, path) → vid BEFORE
pairing, so the quadratic pair stream never carries strings (the round-1
4-string-column shape measured 437 s vs 44 s at sf0.1, COVERAGE.md) and the
two branches share one emit implementation and stay bit-identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pairs_for_vids(vids: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic pair selection for one commit group.

    vids: sorted unique int64 vertex ids. Returns (lo_idx, hi_idx) index
    pairs into vids. k <= cap: all C(k,2) pairs. k > cap: ring + one
    splitmix-hashed chord per node (degree ~4, connected)."""
    k = len(vids)
    if k < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if k <= cap:
        iu = np.triu_indices(k, 1)
        return iu[0], iu[1]
    from leiden_cuda_ray.graph.runtime import vertex_priority

    i = np.arange(k, dtype=np.int64)
    h = vertex_priority(vids, 0, 0)
    chord_b = (i + 2 + (h % np.uint64(max(1, k - 3))).astype(np.int64)) % k
    a = np.concatenate([i, i])
    b = np.concatenate([(i + 1) % k, chord_b])
    keep = a != b
    a, b = a[keep], b[keep]
    return np.minimum(a, b), np.maximum(a, b)


def _vid_emit_pairs(cap: int):
    def fn(group: pa.Table) -> pa.Table:
        vids = np.unique(group.column("vid").to_numpy().astype(np.int64))
        lo, hi = _pairs_for_vids(vids, cap)
        return pa.table({
            "src": vids[lo], "dst": vids[hi],
            "weight": np.ones(len(lo), np.float64),
        })
    return fn


def cocommit_vid_edges(mapped_ds, cap: int = 64):
    """(repo, commit, vid) rows → Dataset[src, dst, weight] int pair edges.

    The (repo, commit) groupby shuffles an int64 vid instead of path
    strings, and pairs come out already numbered and canonical (src<=dst
    because vids are sorted within the group before pairing)."""
    return (mapped_ds.groupby(["repo", "commit"])
            .map_groups(_vid_emit_pairs(cap), batch_format="pyarrow"))
