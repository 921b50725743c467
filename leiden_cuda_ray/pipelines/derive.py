"""Corpus → canonical integer edge table (the engine's graph-ingest pipeline).

End-to-end (SURVEY.md §7.1 steps 2-3):
    read_parquet(corpus, pruned columns)
      → import extraction (map_batches regex) → resolve (hash join)
      → co-commit pairing (groupby.map_groups, capped)
      → union → vertex numbering (sorted distinct keys → dense ids)
      → id join → canonicalize + weight accumulation (groupby.sum)

Returns the *canonical* (src<=dst unique, weighted) edge Dataset; the graph
runtime symmetrizes at partition-build time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from leiden_cuda_ray.sources.corpus import read_corpus
from leiden_cuda_ray.stages.cocommit import cocommit_edges
from leiden_cuda_ray.stages.edges import canonicalize_edges
from leiden_cuda_ray.stages.imports import extract_imports, file_table, resolve_imports
from leiden_cuda_ray.stages.numbering import build_vertex_numbering


def derive_edges(corpus_path: str, cocommit_cap: int = 64,
                 num_join_partitions: int | None = None,
                 include_imports: bool = True,
                 include_cocommit: bool = True):
    """Returns (edges_ds, numbering_ds, num_vertices).

    edges_ds:     Dataset[src:int64, dst:int64, weight:float64], src<=dst,
                  unique pairs, weight = co-occurrence count
    numbering_ds: Dataset[repo, path, vertex] (dense ids by sorted key rank)
    """
    # column-pruned reads: never ship `content` to stages that don't need it
    corpus_meta = read_corpus(corpus_path, columns=["repo", "path"])
    # materialize shared intermediates: Datasets are lazy, so every consumer
    # would otherwise re-execute the upstream chain (ft feeds the numbering
    # AND the import resolution join)
    ft = file_table(corpus_meta).materialize()
    numbering, num_vertices = build_vertex_numbering(ft)
    numbering = numbering.materialize()  # small (V rows), reused by 2 joins

    pair_sets = []
    if include_imports:
        corpus_imp = read_corpus(
            corpus_path, columns=["repo", "path", "lang", "content"])
        raw_imports = extract_imports(corpus_imp)
        pair_sets.append(resolve_imports(raw_imports, ft,
                                         num_partitions=num_join_partitions))
    if include_cocommit:
        corpus_cc = read_corpus(corpus_path, columns=["repo", "commit", "path"])
        pair_sets.append(cocommit_edges(corpus_cc, cap=cocommit_cap))

    pairs = pair_sets[0]
    for extra in pair_sets[1:]:
        pairs = pairs.union(extra)

    from leiden_cuda_ray.stages.joins import hash_join

    with_src = hash_join(
        pairs, numbering, on=("src_repo", "src_path"),
        right_on=("repo", "path"), num_partitions=num_join_partitions,
        right_suffix="_n").rename_columns({"vertex": "src"})
    with_both = hash_join(
        with_src.select_columns(["src", "dst_repo", "dst_path"]),
        numbering, on=("dst_repo", "dst_path"), right_on=("repo", "path"),
        num_partitions=num_join_partitions,
        right_suffix="_n").rename_columns({"vertex": "dst"})

    def _project(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"), np.int64)
        dst = np.asarray(batch.column("dst"), np.int64)
        keep = src != dst  # drop self-imports
        return pa.table({"src": src[keep], "dst": dst[keep],
                         "weight": np.ones(int(keep.sum()), np.float64)})

    int_edges = with_both.map_batches(_project, batch_format="pyarrow")
    # materialized: the graph build consumes this twice (stats + spill)
    edges = canonicalize_edges(int_edges, sum_weights=True).materialize()
    return edges, numbering, num_vertices
