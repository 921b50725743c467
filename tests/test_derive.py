"""Edge derivation: sha256, imports, co-commit, numbering, canonical edges."""

import hashlib

import numpy as np
import pytest

import ray.data

from leiden_cuda_ray.sources.corpus import CorpusParams, generate_corpus_rows
from leiden_cuda_ray.stages.cocommit import _pairs_for_vids
from leiden_cuda_ray.stages.hashing import with_sha256
from leiden_cuda_ray.pipelines.derive import derive_edges


def test_sha256_stage(tiny_corpus):
    ds = with_sha256(ray.data.read_parquet(tiny_corpus))
    rows = ds.take(5)
    for r in rows:
        assert r["sha256"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_cocommit_cap():
    vids = np.arange(1000, 1200, dtype=np.int64)
    lo, hi = _pairs_for_vids(vids, cap=64)
    assert len(lo) <= 2 * 200  # ring + chords, not C(200,2)=19900
    assert np.all(lo < hi)
    # connectivity of the capped group (union-find over emitted pairs)
    parent = np.arange(200)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(lo, hi):
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(200)}) == 1


def test_cocommit_small_group_all_pairs():
    vids = np.array([3, 7, 11], dtype=np.int64)
    lo, hi = _pairs_for_vids(vids, cap=64)
    assert sorted(zip(lo.tolist(), hi.tolist())) == [(0, 1), (0, 2), (1, 2)]


def test_derive_edges_tiny(tiny_corpus):
    edges, numbering, V = derive_edges(tiny_corpus)
    assert V == 2 * 2 * 8  # tiny tier: 2 clusters x 2 repos x 8 files
    tbl = edges.to_pandas()
    assert set(tbl.columns) == {"src", "dst", "weight"}
    assert (tbl.src <= tbl.dst).all()
    assert tbl.src.min() >= 0 and tbl.dst.max() < V
    assert not tbl.duplicated(["src", "dst"]).any()
    assert (tbl.weight >= 1.0).all()
    # the planted ring bridges connect the 2 clusters: graph is connected at
    # the cluster level — every vertex id appears in at least one edge
    verts = set(tbl.src) | set(tbl.dst)
    assert verts == set(range(V))

    num = numbering.to_pandas().sort_values("vertex")
    assert list(num.vertex) == list(range(V))
    # deterministic rank order = (repo, path) sort order
    assert list(num[["repo", "path"]].itertuples(index=False)) == sorted(
        num[["repo", "path"]].itertuples(index=False))


def test_derive_edges_deterministic(tiny_corpus):
    e1, _, _ = derive_edges(tiny_corpus)
    e2, _, _ = derive_edges(tiny_corpus)
    t1 = e1.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    t2 = e2.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert t1.equals(t2)


def test_broadcast_and_join_paths_identical(tiny_corpus):
    """The broadcast id-map fast path and the distributed hash-join
    fallback must produce the identical canonical edge set."""
    e1, _, V1 = derive_edges(tiny_corpus)
    e2, _, V2 = derive_edges(tiny_corpus, max_broadcast_keys=0)  # force join
    assert V1 == V2
    t1 = e1.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    t2 = e2.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert t1.equals(t2)


def test_broadcast_and_join_paths_identical_capped(tiny_corpus):
    """Bit-identical even when the skew cap triggers: both branches pair
    through the same _pairs_for_vids (vid-hashed ring + chords), so a
    capped giant commit picks the same down-sampled pair set either way."""
    e1, _, _ = derive_edges(tiny_corpus, cocommit_cap=3)
    e2, _, _ = derive_edges(tiny_corpus, cocommit_cap=3,
                            max_broadcast_keys=0)
    t1 = e1.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    t2 = e2.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert t1.equals(t2)
    # cap actually bit: fewer pairs than the uncapped run
    eu, _, _ = derive_edges(tiny_corpus)
    assert len(t1) < len(eu.to_pandas())


def test_import_extraction_vectorized_matches_rowloop(tiny_corpus):
    """polars extract_all path == compiled-regex row loop on real corpus."""
    import pyarrow.parquet as pq

    from leiden_cuda_ray.stages.imports import (
        _extract_batch,
        _extract_batch_rowloop,
    )

    t = pq.read_table(tiny_corpus,
                      columns=["repo", "path", "lang", "content"])
    a = _extract_batch(t).to_pandas()
    b = _extract_batch_rowloop(t).to_pandas()
    key = ["src_repo", "src_path", "dst_repo", "dst_stem"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))


def test_import_pairs_fallback_bit_identical():
    """import_pairs' >2M-file join fallback (int-space distinct) must
    emit exactly the broadcast branch's rows (VERDICT r3 item 3)."""
    from leiden_cuda_ray.pipelines.corpus_queries import import_pairs

    sf_dir = "/root/testdata/sf0.001"
    cols = ["src_repo", "src_path", "dst_repo", "dst_path"]
    a = (import_pairs(sf_dir).to_pandas()
         .sort_values(cols).reset_index(drop=True))
    b = (import_pairs(sf_dir, max_broadcast_keys=0).to_pandas()
         .sort_values(cols).reset_index(drop=True))
    assert len(a) > 0
    assert a.equals(b)
