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
from leiden_cuda_ray.stages.imports import extract_imports, resolve_imports
from leiden_cuda_ray.stages.numbering import build_vertex_numbering


def derive_edges(corpus_path: str, cocommit_cap: int = 64,
                 num_join_partitions: int | None = None,
                 include_imports: bool = True,
                 include_cocommit: bool = True,
                 max_broadcast_keys: int = 2_000_000,
                 canonical: bool = True):
    """Returns (edges_ds, numbering_ds, num_vertices).

    edges_ds:     Dataset[src:int64, dst:int64, weight:float64], src<=dst,
                  unique pairs, weight = co-occurrence count
    numbering_ds: Dataset[repo, path, vertex] (dense ids by sorted key rank)

    Id resolution strategy: with ≤ max_broadcast_keys distinct files the
    vertex numbering is broadcast once (ray.put) and ids are substituted in
    a stateless batch pass — zero shuffles instead of two string-key hash
    joins. Above the threshold (or with ambiguous import stems) the
    distributed hash-join path is used; both produce the identical edge set.

    canonical=False skips the standalone canonicalize groupby and returns
    the raw (possibly duplicated, any-direction) int pair rows — the path
    for graph builds, where build_graph_from_dataset fuses canonicalization
    into its own exchange and the groupby would be a redundant shuffle.
    """
    # column-pruned reads: never ship `content` to stages that don't need it
    corpus_meta = read_corpus(corpus_path, columns=["repo", "path"])
    # numbering sorts the raw (repo, path) rows and dedups INSIDE the
    # sorted blocks (stages/numbering.py) — no standalone groupby-distinct
    # shuffle; the file table (distinct + stem) then derives from the
    # numbering with a stateless map instead of its own shuffle
    numbering, num_vertices = build_vertex_numbering(corpus_meta,
                                                     dedup=True)
    numbering = numbering.materialize()
    from leiden_cuda_ray.stages.imports import _stem_batch

    ft = numbering.select_columns(["repo", "path"]).map_batches(
        _stem_batch, batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    from leiden_cuda_ray.stages.idmap import build_vertex_maps

    maps_ref = build_vertex_maps(ft, numbering,
                                 max_broadcast_keys=max_broadcast_keys)
    if maps_ref is not None:
        int_edges = _derive_int_edges_broadcast(
            corpus_path, maps_ref, cocommit_cap, include_imports,
            include_cocommit)
    else:
        int_edges = _derive_int_edges_joins(
            corpus_path, ft, numbering, cocommit_cap, num_join_partitions,
            include_imports, include_cocommit)

    if not canonical:
        return int_edges.materialize(), numbering, num_vertices
    edges = canonicalize_edges(int_edges, sum_weights=True).materialize()
    return edges, numbering, num_vertices


def _derive_int_edges_broadcast(corpus_path, maps_ref, cocommit_cap,
                                include_imports, include_cocommit):
    from leiden_cuda_ray.stages.cocommit import cocommit_vid_edges
    from leiden_cuda_ray.stages.idmap import make_import_mapper, make_path_mapper

    edge_sets = []
    if include_imports:
        corpus_imp = read_corpus(
            corpus_path, columns=["repo", "path", "lang", "content"])
        edge_sets.append(extract_imports(corpus_imp).map_batches(
            make_import_mapper(maps_ref),
            batch_format="pyarrow", zero_copy_batch=True))
    if include_cocommit:
        corpus_cc = read_corpus(corpus_path,
                                columns=["repo", "commit", "path"])
        mapped = corpus_cc.map_batches(
            make_path_mapper(maps_ref),
            batch_format="pyarrow", zero_copy_batch=True)
        edge_sets.append(cocommit_vid_edges(mapped, cap=cocommit_cap))
    out = edge_sets[0]
    for extra in edge_sets[1:]:
        out = out.union(extra)
    return out


def _derive_int_edges_joins(corpus_path, ft, numbering, cocommit_cap,
                            num_join_partitions, include_imports,
                            include_cocommit):
    """Round-1 distributed path: string pairs → two hash joins (the scale
    fallback when the numbering exceeds the broadcast threshold)."""
    pair_sets = []
    if include_imports:
        corpus_imp = read_corpus(
            corpus_path, columns=["repo", "path", "lang", "content"])
        raw_imports = extract_imports(corpus_imp)
        pair_sets.append(resolve_imports(raw_imports, ft,
                                         num_partitions=num_join_partitions))
    if include_cocommit:
        corpus_cc = read_corpus(corpus_path,
                                columns=["repo", "commit", "path"])
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

    return with_both.map_batches(_project, batch_format="pyarrow")
