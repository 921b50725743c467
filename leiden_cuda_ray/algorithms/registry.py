"""Algorithm registry — the engine's user-extension surface (SURVEY.md §2.7:
the reference's de-facto extension points are the objective-function swap and
gamma/theta/max_iter knobs; here both are first-class).

    from leiden_cuda_ray.algorithms.registry import run
    comm_refs, info = run("leiden", graph, gamma=0.1)

Each entry takes a Graph plus its config dataclass's keyword overrides and
returns (per-partition state refs, info). Outputs are converted to Datasets
with `as_dataset`, or written with `write_scores` (one parquet file per
partition — the community printer S7 of SURVEY.md §2.1, made resumable)."""

from __future__ import annotations

import pyarrow as pa

from leiden_cuda_ray.algorithms.common import state_to_dataset
from leiden_cuda_ray.config import (
    LabelPropConfig,
    LeidenConfig,
    LouvainConfig,
    PageRankConfig,
)
from leiden_cuda_ray.graph.build import Graph


def _pagerank(graph: Graph, **kw):
    from leiden_cuda_ray.algorithms.pagerank import pagerank

    refs, iters, err = pagerank(graph, PageRankConfig(**kw))
    return refs, {"iterations": iters, "l1_error": err,
                  "column": "pagerank", "dtype": pa.float64()}


def _components(graph: Graph, **kw):
    from leiden_cuda_ray.algorithms.components import connected_components

    refs, steps = connected_components(graph, **kw)
    return refs, {"supersteps": steps, "column": "component",
                  "dtype": pa.int64()}


def _labelprop(graph: Graph, **kw):
    from leiden_cuda_ray.algorithms.labelprop import label_propagation

    refs, steps, changed = label_propagation(graph, LabelPropConfig(**kw))
    return refs, {"supersteps": steps, "changed_last": changed,
                  "column": "label", "dtype": pa.int64()}


def _triangles(graph: Graph, **kw):
    from leiden_cuda_ray.algorithms.triangles import triangle_counts

    refs, total = triangle_counts(graph)
    return refs, {"total_triangles": total, "column": "triangles",
                  "dtype": pa.int64()}


def _louvain(graph: Graph, **kw):
    from leiden_cuda_ray.algorithms.louvain import louvain

    refs, info = louvain(graph, LouvainConfig(**kw))
    return refs, {**info, "column": "community", "dtype": pa.int64()}


def _leiden(graph: Graph, **kw):
    from leiden_cuda_ray.algorithms.leiden import leiden

    refs, info = leiden(graph, LeidenConfig(**kw))
    return refs, {**info, "column": "community", "dtype": pa.int64()}


def _kcore(graph: Graph, **kw):
    from leiden_cuda_ray.algorithms.kcore import kcore

    refs, steps, changed = kcore(graph, **kw)
    return refs, {"supersteps": steps, "changed_last": changed,
                  "column": "core", "dtype": pa.int64()}


REGISTRY = {
    "pagerank": _pagerank,
    "connected_components": _components,
    "label_propagation": _labelprop,
    "triangle_count": _triangles,
    "kcore": _kcore,
    "louvain": _louvain,
    "leiden": _leiden,
}


def run(name: str, graph: Graph, **config):
    if name not in REGISTRY:
        raise KeyError(f"unknown algorithm {name!r}; "
                       f"available: {sorted(REGISTRY)}")
    return REGISTRY[name](graph, **config)


def as_dataset(graph: Graph, refs: list, info: dict):
    return state_to_dataset(graph, refs, info["column"], info["dtype"])


def write_scores(graph: Graph, refs: list, info: dict, out_dir: str):
    """Write (vertex, <column>) as partitioned parquet — one file per graph
    partition, so a failed writer can re-run per partition (resumable)."""
    as_dataset(graph, refs, info).write_parquet(out_dir)
    return out_dir


def write_scores_resumable(graph: Graph, refs: list, info: dict,
                           out_dir: str) -> dict:
    """Resumable partitioned sink: one parquet file per graph partition
    under a DETERMINISTIC name (part-{i:05d}.parquet) plus an
    underscore-prefixed marker (_done-{i:05d}; parquet dataset discovery
    skips _-prefixed files) published AFTER the data file via atomic
    rename — a torn write leaves
    no marker, so re-running rewrites exactly the unfinished partitions
    and skips the finished ones (the 100-TB contract: a failed job never
    repeats completed shards; never one giant file). Returns
    {written, skipped} partition counts."""
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def _write_part(arr, vlo, i):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        ids = np.arange(vlo, vlo + len(arr), dtype=np.int64)
        pq.write_table(pa.table({"vertex": pa.array(ids, pa.int64()),
                                 info["column"]: pa.array(arr,
                                                          info["dtype"])}),
                       tmp)
        os.replace(tmp, path)
        # marker last: its existence GUARANTEES the data file is complete
        mtmp = os.path.join(out_dir, f"_done-{i:05d}.tmp.{os.getpid()}")
        with open(mtmp, "w") as f:
            f.write(str(len(arr)))
        os.replace(mtmp, os.path.join(out_dir, f"_done-{i:05d}"))
        return i

    pending = []
    skipped = 0
    for i, (r, (vlo, _)) in enumerate(zip(refs, graph.ranges())):
        if os.path.exists(os.path.join(out_dir, f"_done-{i:05d}")):
            skipped += 1
            continue
        pending.append(_write_part.remote(r, vlo, i))
    ray.get(pending)
    return {"written": len(pending), "skipped": skipped}
