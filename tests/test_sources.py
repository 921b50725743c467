"""Sources: corpus generator, edge-list parser, fixtures."""

import hashlib

import numpy as np
import pyarrow.parquet as pq
import pytest

from leiden_cuda_ray.sources.corpus import (
    CorpusParams, gen_corpus, generate_corpus_rows)
from leiden_cuda_ray.sources.edge_list import parse_edge_list_text, read_edge_list
from leiden_cuda_ray.sources.fixtures import (
    clique_ring_edges, weighted_triangle_edges)


def test_corpus_deterministic(tmp_path):
    rows1 = list(generate_corpus_rows(CorpusParams()))
    rows2 = list(generate_corpus_rows(CorpusParams()))
    assert rows1 == rows2
    h1 = hashlib.sha256(str(rows1).encode()).hexdigest()
    assert len(rows1) == 2 * 2 * 8
    # content hash stable (regression pin for the sha256 invariant tests)
    assert all(r["content"] for r in rows1)
    assert h1 == hashlib.sha256(str(rows2).encode()).hexdigest()


def test_corpus_parquet_schema(tiny_corpus):
    schema = pq.read_schema(tiny_corpus)
    assert schema.names == ["repo", "path", "commit", "lang", "content"]
    assert all(str(schema.field(n).type) == "string" for n in schema.names)


def test_parse_edge_list_text():
    t = parse_edge_list_text(["% comment", "", "0 1", "1 2 0.5", "  2 0  "])
    assert t.column("src").to_pylist() == [0, 1, 2]
    assert t.column("dst").to_pylist() == [1, 2, 0]
    assert t.column("weight").to_pylist() == [1.0, 0.5, 1.0]


def test_read_edge_list_renumber(tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("% KONECT style\n5 6\n6 7 2.0\n7 5\n")
    ds = read_edge_list(str(p))
    rows = sorted((r["src"], r["dst"], r["weight"]) for r in ds.take_all())
    assert rows == [(0, 1, 1.0), (1, 2, 2.0), (2, 0, 1.0)]


def test_clique_ring_fixture():
    src, dst, w = clique_ring_edges()
    assert len(src) == 5 * 6 + 5  # 5 cliques x C(4,2) + 5 bridges
    assert src.max() < 20 and dst.max() < 20
    assert np.all(w == 1.0)


def test_weighted_triangle_fixture():
    src, dst, w = weighted_triangle_edges()
    assert pytest.approx(w.sum()) == 0.8


def test_dedup_sorted_refs_boundary_runs():
    """_dedup_sorted_refs: key runs split across sorted blocks collapse to
    one row — including a block consisting ENTIRELY of duplicates of the
    previous block's last key (it must vanish without breaking the chain)."""
    import pyarrow as pa
    import ray

    from leiden_cuda_ray.stages.numbering import _dedup_sorted_refs

    def t(pairs):
        return pa.table({"repo": pa.array([p[0] for p in pairs]),
                         "path": pa.array([p[1] for p in pairs])})

    blocks = [
        t([("r", "a"), ("r", "a"), ("r", "b")]),
        t([("r", "b"), ("r", "b")]),          # all dups of prev last
        t([("r", "b"), ("r", "c")]),          # still leading with b
        t([]),                                 # empty block
        t([("r", "c"), ("s", "a")]),
    ]
    refs = [ray.put(b) for b in blocks]
    out = ray.get(_dedup_sorted_refs(refs, ["repo", "path"]))
    rows = [(r, p) for tbl in out
            for r, p in zip(tbl.column("repo").to_pylist(),
                            tbl.column("path").to_pylist())]
    assert rows == [("r", "a"), ("r", "b"), ("r", "c"), ("s", "a")]


def test_build_vertex_numbering_dedup_equals_distinct():
    """Numbering over duplicated (repo, path) rows (dedup=True) must equal
    the numbering of the pre-distinct table."""
    import pyarrow as pa
    import ray.data

    from leiden_cuda_ray.stages.numbering import build_vertex_numbering

    rng = np.random.RandomState(4)
    keys = [(f"r{i % 7}", f"p{i:03d}") for i in range(60)]
    dup = [keys[rng.randint(len(keys))] for _ in range(300)] + keys
    tbl = pa.table({"repo": pa.array([k[0] for k in dup]),
                    "path": pa.array([k[1] for k in dup])})
    ds = ray.data.from_arrow(tbl).repartition(9)
    got, V = build_vertex_numbering(ds, dedup=True)
    got_rows = sorted((r["repo"], r["path"], r["vertex"])
                      for r in got.take_all())

    uniq = sorted(set(keys))
    distinct = pa.table({"repo": pa.array([k[0] for k in uniq]),
                         "path": pa.array([k[1] for k in uniq])})
    exp, V2 = build_vertex_numbering(ray.data.from_arrow(distinct))
    exp_rows = sorted((r["repo"], r["path"], r["vertex"])
                      for r in exp.take_all())
    assert V == V2 == len(set(keys))
    assert got_rows == exp_rows
