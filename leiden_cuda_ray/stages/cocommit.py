"""Co-commit edge builder: files touched by the same (repo, commit).

North-rule operator (SURVEY.md §2.2): `groupby(["repo","commit"]).map_groups`
emitting canonical pairwise edges. Giant commits are the canonical skew hazard
(a commit touching k files emits k·(k−1)/2 pairs); groups larger than `cap`
are deterministically down-sampled to a ring + hash-selected chords so the
fan-out stays O(cap·k) instead of O(k²) while keeping the group connected.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _pairs_for_group(paths: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic pair selection for one commit group (paths sorted)."""
    k = len(paths)
    if k < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if k <= cap:
        iu = np.triu_indices(k, 1)
        return iu[0], iu[1]
    # skew guard: ring + per-node hashed chords (degree ~ 4, connected)
    i = np.arange(k, dtype=np.int64)
    ring_a, ring_b = i, (i + 1) % k
    h = np.array([
        int.from_bytes(hashlib.blake2b(p.encode(), digest_size=8).digest(), "big")
        for p in paths], dtype=np.uint64)
    chord_b = (i + 2 + (h % np.uint64(max(1, k - 3)))).astype(np.int64) % k
    a = np.concatenate([ring_a, i])
    b = np.concatenate([ring_b, chord_b])
    keep = a != b
    a, b = a[keep], b[keep]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return lo, hi


def _emit_pairs(cap: int):
    def fn(group: pd.DataFrame) -> pd.DataFrame:
        paths = np.sort(group["path"].unique())
        lo, hi = _pairs_for_group(paths, cap)
        repo = group["repo"].iloc[0]
        return pd.DataFrame({
            "src_repo": repo, "src_path": paths[lo],
            "dst_repo": repo, "dst_path": paths[hi],
        })
    return fn


def cocommit_edges(corpus_ds, cap: int = 64):
    """Corpus → Dataset[src_repo, src_path, dst_repo, dst_path] pair edges."""
    return (corpus_ds.select_columns(["repo", "commit", "path"])
            .groupby(["repo", "commit"])
            .map_groups(_emit_pairs(cap), batch_format="pandas"))


def _vid_emit_pairs(cap: int):
    def fn(group: pd.DataFrame) -> pd.DataFrame:
        vids = np.sort(group["vid"].unique()).astype(np.int64)
        k = len(vids)
        if k < 2:
            return pd.DataFrame({"src": np.empty(0, np.int64),
                                 "dst": np.empty(0, np.int64),
                                 "weight": np.empty(0, np.float64)})
        if k <= cap:
            lo, hi = np.triu_indices(k, 1)
        else:
            # same ring+chord skew guard as _pairs_for_group, hashed on the
            # vertex id (splitmix) instead of the path string
            from leiden_cuda_ray.graph.runtime import vertex_priority

            i = np.arange(k, dtype=np.int64)
            h = vertex_priority(vids, 0, 0)
            chord_b = (i + 2 + (h % np.uint64(max(1, k - 3))).astype(
                np.int64)) % k
            a = np.concatenate([i, i])
            b = np.concatenate([(i + 1) % k, chord_b])
            keep = a != b
            a, b = a[keep], b[keep]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({
            "src": vids[lo], "dst": vids[hi],
            "weight": np.ones(len(lo), np.float64),
        })
    return fn


def cocommit_vid_edges(mapped_ds, cap: int = 64):
    """(repo, commit, vid) rows → Dataset[src, dst, weight] int pair edges.

    The broadcast-id fast path: the (repo, commit) groupby shuffles an int64
    vid instead of path strings, and pairs come out already numbered. For
    uncapped groups the emitted pair SET is identical to the string path
    (all unordered member pairs, canonicalized); capped groups pick the same
    ring + deterministic-chord shape but hash on vid rather than path."""
    return (mapped_ds.groupby(["repo", "commit"])
            .map_groups(_vid_emit_pairs(cap), batch_format="pandas"))
