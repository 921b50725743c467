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
from leiden_cuda_ray.stages.edges import canonicalize_edges
from leiden_cuda_ray.stages.imports import extract_imports
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

    # ft carries the vid so the join-fallback path can resolve import
    # targets (repo, stem) -> vertex in ONE join on the import stream
    ft = numbering.map_batches(
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
    edges = canonicalize_edges(int_edges, sum_weights=True,
                               V=num_vertices).materialize()
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
    return _union_edge_sets(edge_sets)


def _union_edge_sets(edge_sets):
    """Union the import/co-commit streams via their materialized forms.

    A lazy union makes the streaming executor interleave both plans in one
    run, and its Union operator emits a schema-less empty sentinel bundle
    that trips the "RefBundle with a different schema" warning on every
    derive. Each stream is materialized anyway right after the union (by
    canonicalize_edges or derive_edges itself), so materializing the sides
    first costs nothing and the union becomes a pure ref concatenation."""
    mats = [es.materialize() for es in edge_sets]
    out = mats[0]
    for extra in mats[1:]:
        out = out.union(extra)
    return out


def _derive_int_edges_joins(corpus_path, ft, numbering, cocommit_cap,
                            num_join_partitions, include_imports,
                            include_cocommit):
    """Distributed scale path (numbering > max_broadcast_keys, i.e. the
    100-TB regime): endpoints are resolved to int64 vertex ids BEFORE
    pairing, so every string-key hash join runs over a linear-cardinality
    stream (corpus rows / import statements) and the quadratic co-commit
    pair stream only ever exists in int space. Pairing goes through the
    same `cocommit_vid_edges` as the broadcast path, so both branches emit
    the identical edge set (capped groups included). Round 2 paired in
    4-string-column space and joined the PAIR stream twice — the shape the
    sf0.1 sweep measured at 437 s vs 44 s (COVERAGE.md)."""
    from leiden_cuda_ray.stages.cocommit import cocommit_vid_edges
    from leiden_cuda_ray.stages.joins import hash_join

    edge_sets = []
    if include_imports:
        corpus_imp = read_corpus(
            corpus_path, columns=["repo", "path", "lang", "content"])
        raw_imports = extract_imports(corpus_imp)
        # src endpoint: one join on the import-statement stream
        with_src = hash_join(
            raw_imports, numbering, on=("src_repo", "src_path"),
            right_on=("repo", "path"), num_partitions=num_join_partitions,
            right_suffix="_n").rename_columns({"vertex": "src"})
        # dst endpoint: stem table carries the vid, so one more join
        # resolves (repo, stem) -> dst vid with the join's fan-out
        # semantics (a stem matching k files emits k edges)
        with_both = hash_join(
            with_src.select_columns(["src", "dst_repo", "dst_stem"]),
            ft, on=("dst_repo", "dst_stem"), right_on=("repo", "stem"),
            num_partitions=num_join_partitions, right_suffix="_t")

        def _project(batch: pa.Table) -> pa.Table:
            src = np.asarray(batch.column("src"), np.int64)
            dst = np.asarray(batch.column("vertex"), np.int64)
            keep = src != dst  # drop self-imports
            return pa.table({"src": src[keep], "dst": dst[keep],
                             "weight": np.ones(int(keep.sum()),
                                               np.float64)})

        edge_sets.append(with_both.map_batches(_project,
                                               batch_format="pyarrow"))
    if include_cocommit:
        corpus_cc = read_corpus(corpus_path,
                                columns=["repo", "commit", "path"])
        # resolve (repo, path) -> vid on the CORPUS rows (linear), then
        # pair in int space — identical to the broadcast branch
        mapped = hash_join(
            corpus_cc, numbering, on=("repo", "path"),
            num_partitions=num_join_partitions, right_suffix="_n")

        def _to_vid(batch: pa.Table) -> pa.Table:
            return pa.table({
                "repo": batch.column("repo"),
                "commit": batch.column("commit"),
                "vid": pa.array(np.asarray(batch.column("vertex"),
                                           np.int64), pa.int64()),
            })

        mapped = mapped.map_batches(_to_vid, batch_format="pyarrow",
                                    zero_copy_batch=True)
        edge_sets.append(cocommit_vid_edges(mapped, cap=cocommit_cap))

    return _union_edge_sets(edge_sets)
