"""Registry, output sink, self-loop probe, JSON stats."""

import numpy as np
import pyarrow as pa
import ray
import ray.data

from leiden_cuda_ray.algorithms.registry import (REGISTRY, as_dataset, run,
                                                 write_scores,
                                                 write_scores_resumable)
from leiden_cuda_ray.graph.build import build_graph_from_arrays
from leiden_cuda_ray.sources.fixtures import clique_ring_edges, edges_to_table
from leiden_cuda_ray.stages.edges import has_self_loops


def test_registry_runs_all():
    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=2)
    for name in REGISTRY:
        refs, info = run(name, g)
        ds = as_dataset(g, refs, info)
        assert ds.count() == 20, name
        assert set(ds.schema().names) == {"vertex", info["column"]}, name


def test_registry_config_override():
    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=1)
    refs, info = run("leiden", g, gamma=0.1, seed=7)
    comm = np.concatenate(ray.get(refs))
    assert len(np.unique(comm)) == 5


def test_registry_unknown():
    import pytest

    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=1)
    with pytest.raises(KeyError):
        run("nope", g)


def test_write_scores(tmp_path):
    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=2)
    refs, info = run("pagerank", g)
    out = write_scores(g, refs, info, str(tmp_path / "scores"))
    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) == 20
    assert abs(back.pagerank.sum() - 1.0) < 1e-9


def test_write_scores_resumable(tmp_path):
    """Second run skips every finished partition; deleting one marker
    rewrites exactly that partition; torn writes (no marker) re-run."""
    import os

    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=2)
    refs, info = run("pagerank", g)
    out = str(tmp_path / "scores")
    r1 = write_scores_resumable(g, refs, info, out)
    assert r1 == {"written": 2, "skipped": 0}
    files = sorted(os.listdir(out))
    assert files == ["_done-00000", "_done-00001",
                     "part-00000.parquet", "part-00001.parquet"]
    mt = {f: os.path.getmtime(os.path.join(out, f)) for f in files}
    r2 = write_scores_resumable(g, refs, info, out)
    assert r2 == {"written": 0, "skipped": 2}
    assert all(os.path.getmtime(os.path.join(out, f)) == mt[f]
               for f in files)
    # torn write: data present but marker missing -> that shard re-runs
    os.remove(os.path.join(out, "_done-00001"))
    r3 = write_scores_resumable(g, refs, info, out)
    assert r3 == {"written": 1, "skipped": 1}
    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) == 20
    assert abs(back.pagerank.sum() - 1.0) < 1e-9


def test_has_self_loops():
    src, dst, w = clique_ring_edges()
    ds = ray.data.from_arrow(edges_to_table(src, dst, w))
    assert not has_self_loops(ds)
    src2 = np.append(src, 5)
    dst2 = np.append(dst, 5)
    w2 = np.append(w, 1.0)
    ds2 = ray.data.from_arrow(edges_to_table(src2, dst2, w2))
    assert has_self_loops(ds2)


def test_events_json_stats_matches_duckdb():
    import duckdb

    from leiden_cuda_ray.pipelines.relational import events_json_stats

    got = events_json_stats("/root/testdata/sf0.001").to_pandas()
    want = duckdb.sql("""
        SELECT event_type,
               SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
               COUNT(*) AS n_events
        FROM read_parquet('/root/testdata/sf0.001/events.parquet')
        GROUP BY event_type""").fetchdf()
    g = got.sort_values("event_type").reset_index(drop=True)
    w = want.sort_values("event_type").reset_index(drop=True)
    assert list(g.event_type) == list(w.event_type)
    assert list(g.sum_k.astype(int)) == list(w.sum_k.astype(int))
    assert list(g.n_events.astype(int)) == list(w.n_events.astype(int))
