"""Corpus-derived graph queries (the engine's flagship surface).

Each callable takes sf_dir (the driver's testdata directory), ensures the
deterministic synthetic corpus for that tier exists under /tmp/graft_corpus
(BASELINE.json input_hint schema; generated, never downloaded), and runs a
Ray pipeline over it. The graph is built once per sf_dir and cached
(module-level) so the six algorithm queries share partitions.

Vertex ids are the rank in (repo, path) sort order — reproducible in SQL as
row_number() OVER (ORDER BY repo, path) - 1, which is what the DuckDB
oracles use."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from leiden_cuda_ray.functions.arrowutil import int_bincount

import ray
import ray.data

from leiden_cuda_ray.algorithms.common import state_to_dataset
from leiden_cuda_ray.config import LeidenConfig, LouvainConfig
from leiden_cuda_ray.sources.corpus import (
    ensure_corpus_for_sf_dir,
    read_corpus,
)
from leiden_cuda_ray.stages.hashing import with_sha256
from leiden_cuda_ray.stages.imports import extract_imports

_GRAPH_CACHE: dict = {}

#: uncapped derived edge tables per (sf_dir, include_imports), raw and
#: canonical — derived ONCE and shared across the corpus queries
#: (VERDICT r3 item 6: at sf1 each re-derive costs hundreds of seconds,
#: and degree_topk / cocommit_pairs / the graph_* family all need the
#: same pair set)
_EDGE_CACHE: dict = {}


def _derived_edges(sf_dir: str, canonical: bool,
                   include_imports: bool = True):
    """(edges, numbering, V) for the uncapped derivation, cached.

    The raw (any-direction, duplicated) int-pair stream is derived and
    materialized once per (sf_dir, include_imports); the canonical form
    is one extra groupby over the cached raw stream — identical to what
    derive_edges(canonical=True) returns, since that is exactly
    canonicalize_edges(raw, sum_weights=True)."""
    from leiden_cuda_ray.pipelines.derive import derive_edges
    from leiden_cuda_ray.stages.edges import canonicalize_edges

    raw_key = (sf_dir, include_imports, "raw")
    if raw_key not in _EDGE_CACHE:
        path = ensure_corpus_for_sf_dir(sf_dir)
        _EDGE_CACHE[raw_key] = derive_edges(
            path, cocommit_cap=1 << 30, canonical=False,
            include_imports=include_imports)
    edges, numbering, V = _EDGE_CACHE[raw_key]
    if not canonical:
        return edges, numbering, V
    canon_key = (sf_dir, include_imports, "canon")
    if canon_key not in _EDGE_CACHE:
        _EDGE_CACHE[canon_key] = canonicalize_edges(
            edges, sum_weights=True, V=V).materialize()
    return _EDGE_CACHE[canon_key], numbering, V


def corpus_sha256(sf_dir: str):
    """(repo, path, commit, sha256) — the per-row content invariant."""
    path = ensure_corpus_for_sf_dir(sf_dir)
    ds = with_sha256(read_corpus(path))
    return ds.select_columns(["repo", "path", "commit", "sha256"])


def cocommit_pairs(sf_dir: str):
    """Uncapped co-commit pairs with co-occurrence weight (SQL-oracle-able;
    the capped skew-guarded variant is what the graph build uses).

    Runs in INT id space: the uncapped pair stream is quadratic in giant
    commits, so emitting and counting '4 string column' rows shuffles GBs
    of strings (437 s at sf0.1). derive's broadcast id map emits vid
    pairs, the canonical exchange counts occurrences, and only the OUTPUT
    rows join back to strings. Vid order is (repo, path) rank, so
    (min vid, max vid) is the same canonical orientation as the string
    form."""
    from leiden_cuda_ray.stages.joins import hash_join

    edges, numbering, _V = _derived_edges(sf_dir, canonical=True,
                                          include_imports=False)

    def wcast(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(batch.column("src"), pa.int64()),
            "dst": pc.cast(batch.column("dst"), pa.int64()),
            "weight": pc.cast(pc.round(batch.column("weight")),
                              pa.int64()),
        })

    e = edges.map_batches(wcast, batch_format="pyarrow",
                          zero_copy_batch=True)
    j1 = hash_join(e, numbering, on=("src",), right_on=("vertex",))

    def name_src(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src_repo": pc.cast(batch.column("repo"), pa.string()),
            "src_path": pc.cast(batch.column("path"), pa.string()),
            "dst": pc.cast(batch.column("dst"), pa.int64()),
            "weight": pc.cast(batch.column("weight"), pa.int64()),
        })

    j2 = hash_join(j1.map_batches(name_src, batch_format="pyarrow"),
                   numbering, on=("dst",), right_on=("vertex",))

    def name_dst(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src_repo": pc.cast(batch.column("src_repo"), pa.string()),
            "src_path": pc.cast(batch.column("src_path"), pa.string()),
            "dst_repo": pc.cast(batch.column("repo"), pa.string()),
            "dst_path": pc.cast(batch.column("path"), pa.string()),
            "weight": pc.cast(batch.column("weight"), pa.int64()),
        })

    return j2.map_batches(name_dst, batch_format="pyarrow")


def _import_vid_pairs(sf_dir: str, max_broadcast_keys: int = 2_000_000):
    """Distinct DIRECTED import edges in int-vid space, cached per sf_dir.

    Returns (pairs_ds[src:int64, dst:int64], numbering, V). The directed
    pair set is what import_pairs names and what graph_hits iterates on;
    deriving it once per sf_dir saves the full extract+resolve pass
    (~240 s at sf1) on every consumer.

    INT id space end-to-end (same treatment as cocommit_pairs): resolve
    endpoints through the broadcast id map, distinct on (src, dst) int64
    pairs; strings join back only onto distinct OUTPUT rows (the round-2
    shape — hash join + 4-string-column distinct over the raw statement
    stream — shuffled every import statement as strings, 127 s at
    50k-doc sweep scale). Self-imports are kept (the oracle has no self
    filter); the >2M-file fallback resolves endpoints with two linear
    string joins, then runs the same int-space distinct."""
    from leiden_cuda_ray.stages.idmap import build_vertex_maps, make_import_mapper
    from leiden_cuda_ray.stages.imports import _stem_batch
    from leiden_cuda_ray.stages.joins import hash_join
    from leiden_cuda_ray.stages.numbering import build_vertex_numbering

    cache_key = (sf_dir, max_broadcast_keys, "import_vids")
    if cache_key in _EDGE_CACHE:
        return _EDGE_CACHE[cache_key]

    path = ensure_corpus_for_sf_dir(sf_dir)
    numbering, _V = build_vertex_numbering(
        read_corpus(path, columns=["repo", "path"]), dedup=True)
    numbering = numbering.materialize()
    ft = numbering.map_batches(_stem_batch, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    maps_ref = build_vertex_maps(ft, numbering,
                                 max_broadcast_keys=max_broadcast_keys)
    corpus = read_corpus(path, columns=["repo", "path", "lang", "content"])
    if maps_ref is None:
        # distributed fallback (ambiguous stems / >2M files): endpoints
        # resolved to int64 vids on the LINEAR import-statement stream
        # (one string join per endpoint, same shape as derive's
        # _derive_int_edges_joins), then distinct on (src, dst) int64 —
        # never a 4-string-column groupby over the raw statement stream
        # (the shape the sf1 sweep measured at 663 s vs 240 s broadcast)
        raw = extract_imports(corpus)
        with_src = hash_join(
            raw, numbering, on=("src_repo", "src_path"),
            right_on=("repo", "path"),
            right_suffix="_n").rename_columns({"vertex": "src"})
        with_both = hash_join(
            with_src.select_columns(["src", "dst_repo", "dst_stem"]),
            ft, on=("dst_repo", "dst_stem"), right_on=("repo", "stem"),
            right_suffix="_t")

        def _proj(batch: pa.Table) -> pa.Table:
            return pa.table({
                "src": pc.cast(batch.column("src"), pa.int64()),
                "dst": pc.cast(batch.column("vertex"), pa.int64()),
            })

        int_pairs = with_both.map_batches(_proj, batch_format="pyarrow")
    else:
        int_pairs = extract_imports(corpus).map_batches(
            make_import_mapper(maps_ref, drop_self=False),
            batch_format="pyarrow", zero_copy_batch=True)
    # distinct on ORDERED (src, dst) int64 via the fused-key exchange —
    # a Ray Data groupby over the same 25.6M-row sf1 stream spends 181 s
    # in shuffle fixed costs vs ~8 s for this exchange (directed=True
    # keeps import direction; drop the count to get the distinct set)
    from leiden_cuda_ray.stages.edges import canonicalize_edges

    distinct = canonicalize_edges(int_pairs, sum_weights=True, V=_V,
                                  directed=True)

    def cast_int(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(batch.column("src"), pa.int64()),
            "dst": pc.cast(batch.column("dst"), pa.int64()),
        })

    e = distinct.map_batches(cast_int,
                             batch_format="pyarrow").materialize()
    _EDGE_CACHE[cache_key] = (e, numbering, _V)
    return _EDGE_CACHE[cache_key]


def import_pairs(sf_dir: str, max_broadcast_keys: int = 2_000_000):
    """Resolved distinct import edges (src file → dst file), named rows.

    Derivation (shared, cached): `_import_vid_pairs`. This query only
    joins the file names back onto the distinct int-pair output rows."""
    from leiden_cuda_ray.stages.joins import hash_join

    e, numbering, _V = _import_vid_pairs(sf_dir, max_broadcast_keys)
    j1 = hash_join(e, numbering, on=("src",), right_on=("vertex",))

    def name_src(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src_repo": pc.cast(batch.column("repo"), pa.string()),
            "src_path": pc.cast(batch.column("path"), pa.string()),
            "dst": pc.cast(batch.column("dst"), pa.int64()),
        })

    j2 = hash_join(j1.map_batches(name_src, batch_format="pyarrow"),
                   numbering, on=("dst",), right_on=("vertex",))

    def name_dst(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src_repo": pc.cast(batch.column("src_repo"), pa.string()),
            "src_path": pc.cast(batch.column("src_path"), pa.string()),
            "dst_repo": pc.cast(batch.column("repo"), pa.string()),
            "dst_path": pc.cast(batch.column("path"), pa.string()),
        })

    return j2.map_batches(name_dst, batch_format="pyarrow")


def _edge_union(sf_dir: str):
    """Distinct canonical neighbor pairs (import ∪ co-commit), as key strings."""
    imp = import_pairs(sf_dir)
    cc = cocommit_pairs(sf_dir).drop_columns(["weight"])
    both = imp.union(cc)

    def canon(batch: pa.Table) -> pa.Table:
        a = pc.binary_join_element_wise(batch.column("src_repo"),
                                        batch.column("src_path"), "|")
        b = pc.binary_join_element_wise(batch.column("dst_repo"),
                                        batch.column("dst_path"), "|")
        a_np = np.asarray(a, dtype=object)
        b_np = np.asarray(b, dtype=object)
        lo = np.minimum(a_np, b_np)
        hi = np.maximum(a_np, b_np)
        return pa.table({"key_a": pa.array(lo, pa.string()),
                         "key_b": pa.array(hi, pa.string())})

    return (both.map_batches(canon, batch_format="pyarrow")
            .groupby(["key_a", "key_b"]).count()
            .drop_columns(["count()"]))


@ray.remote
def _part_degree_topk(part: dict, k: int):
    """Per-partition top-k by (degree desc, vertex asc) over the CSR row
    lengths. Threshold-select (kth-largest value) keeps every candidate
    tied at the boundary so the global merge is exact."""
    deg = part["deg"]
    nz = np.flatnonzero(deg)
    if nz.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    kk = min(k, nz.size)
    dnz = deg[nz]
    thresh = np.partition(dnz, nz.size - kk)[nz.size - kk]
    cand = nz[dnz >= thresh]
    order = np.lexsort((cand, -deg[cand]))[:k]
    sel = cand[order]
    return sel + part["vlo"], deg[sel]


def degree_topk(sf_dir: str, k: int = 10):
    """Top-k files by distinct-neighbor degree (the reference's top-10
    degree report, examples/test1.py:31-35).

    Rides the graph build instead of a dataset groupby: the fused-key
    exchange already dedups/symmetrizes the pair set, and each CSR
    partition's row lengths ARE the distinct-neighbor degrees (derive
    drops self-imports, so there is no self-loop double-count delta vs
    the canonical pair list). Per-partition threshold top-k → a P×k
    driver merge replaces the groupby("vertex").aggregate shuffle that
    cost 300 s at sf1 (V=1.6M, 100M pairs); partitions own disjoint
    vertex ranges, so local winners are globally sufficient. Only the k
    winners join back to strings. Vertex ids are the rank of the sorted
    (repo, path) keys, so breaking degree ties by ascending vertex IS
    the oracle's ORDER BY repo, path tie-break."""
    from leiden_cuda_ray.stages.joins import hash_join

    graph, numbering = _build_graph(sf_dir)
    tops = ray.get([_part_degree_topk.remote(p, k) for p in graph.parts])
    vs = np.concatenate([t[0] for t in tops])
    ds = np.concatenate([t[1] for t in tops])
    order = np.lexsort((vs, -ds))[:k]
    top = ray.data.from_arrow(pa.table({
        "vertex": pa.array(vs[order], pa.int64()),
        "degree": pa.array(ds[order], pa.int64()),
    }))
    out = hash_join(top, numbering, on=("vertex",))
    return (out.sort(["degree", "vertex"], descending=[True, False])
            .select_columns(["repo", "path", "degree"]))


def _build_graph(sf_dir: str):
    if sf_dir in _GRAPH_CACHE:
        return _GRAPH_CACHE[sf_dir]
    from leiden_cuda_ray.graph.build import build_graph_from_dataset

    # uncapped co-commit pairs: the DuckDB oracles for the graph_* queries
    # enumerate ALL pairs, so the skew cap (which the scale pipeline keeps,
    # see stages/cocommit.py + test_skew.py) must be off here or results
    # silently diverge once a (repo, commit) group exceeds the cap
    edges, numbering, V = _derived_edges(sf_dir, canonical=False)
    import os

    tier = os.path.basename(os.path.normpath(sf_dir))
    graph = build_graph_from_dataset(
        edges, V, spill_dir=f"/tmp/graft_graph/{tier}")
    _GRAPH_CACHE[sf_dir] = (graph, numbering)
    return _GRAPH_CACHE[sf_dir]


def _with_names(sf_dir: str, ds):
    _, numbering = _build_graph(sf_dir)
    from leiden_cuda_ray.stages.joins import hash_join

    return hash_join(ds, numbering, on=("vertex",))


def graph_pagerank(sf_dir: str):
    from leiden_cuda_ray.algorithms.pagerank import pagerank

    graph, _ = _build_graph(sf_dir)
    ranks, iters, err = pagerank(graph)
    return state_to_dataset(graph, ranks, "pagerank", pa.float64())


def graph_pagerank_fixed(sf_dir: str):
    """Oracle-checkable PageRank: exactly 15 iterations (epsilon=0 disables
    the convergence stop), ranks rounded to 6 decimals. Matches the
    unrolled DuckDB power iteration in `__ray_entry__.oracle_sql()`
    (raw float64 divergence ≈ 2e-18, far below the rounding quantum)."""
    from leiden_cuda_ray.algorithms.pagerank import pagerank
    from leiden_cuda_ray.config import PageRankConfig

    graph, _ = _build_graph(sf_dir)
    ranks, _it, _err = pagerank(graph, PageRankConfig(epsilon=0.0,
                                                      max_iterations=15))
    ds = state_to_dataset(graph, ranks, "pagerank", pa.float64())

    def rnd(t: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table({
            "vertex": t.column("vertex"),
            "pagerank": pa.array(
                np.round(np.asarray(t.column("pagerank"), np.float64), 6),
                pa.float64()),
        })

    return ds.map_batches(rnd, batch_format="pyarrow")


def graph_tri_support(sf_dir: str):
    """Per-edge triangle support (k-truss support) over the symmetrized
    union graph — algorithms/trisupport.py. One row per canonical
    non-self edge (src < dst) with the exact number of triangles the
    edge closes; the DuckDB oracle recomputes it from the oriented
    wedge join the graph_triangles oracle already uses."""
    from leiden_cuda_ray.algorithms.trisupport import triangle_support

    graph, _ = _build_graph(sf_dir)
    return triangle_support(graph)


def graph_clustering(sf_dir: str):
    """Per-vertex local clustering coefficient over the symmetrized union
    graph (algorithms/trisupport.py::clustering_coefficient); see that
    docstring for the support-stream derivation. Isolated vertices have
    no incident edge and are excluded, matching the edge-derived
    oracle."""
    from leiden_cuda_ray.algorithms.trisupport import clustering_coefficient

    graph, _ = _build_graph(sf_dir)
    return clustering_coefficient(graph)


def graph_jaccard_edges(sf_dir: str):
    """Per-edge neighborhood Jaccard similarity
    (algorithms/trisupport.py::edge_jaccard) — link-strength scoring over
    every canonical non-self edge."""
    from leiden_cuda_ray.algorithms.trisupport import edge_jaccard

    graph, _ = _build_graph(sf_dir)
    return edge_jaccard(graph)


def graph_adamic_adar(sf_dir: str):
    """Adamic–Adar score for every canonical edge of the symmetrized
    union graph (algorithms/linkpred.py::adamic_adar) — exact-integer
    quantized sums so the DuckDB oracle reproduces the BIGINT
    bit-for-bit; see the module docstring for the discipline."""
    from leiden_cuda_ray.algorithms.linkpred import adamic_adar

    graph, _ = _build_graph(sf_dir)
    return adamic_adar(graph)


def graph_walks(sf_dir: str, length: int = 8):
    """Deterministic random-walk corpus over the symmetrized union
    graph (algorithms/walks.py::random_walks) — the walk table a
    graph-embedding trainer (DeepWalk/node2vec) consumes, SQL-checkable
    through the deterministic rank hash."""
    from leiden_cuda_ray.algorithms.walks import random_walks

    graph, _ = _build_graph(sf_dir)
    return random_walks(graph, length=length)


def repo_pagerank(sf_dir: str, iters: int = 15):
    """Repo-level PageRank: aggregate the file-level import edges to a
    repo dependency graph (edge weight = number of distinct file-level
    import pairs between the repos, self-dependencies dropped) and rank
    repos with the same fixed-iteration weighted power iteration as
    graph_pagerank_fixed. Multi-granularity composition: the cached
    `_import_vid_pairs` stream maps to repo ids with one broadcast
    boundary array (vertex ids are (repo, path)-sorted ranks, so each
    repo owns a CONTIGUOUS vid range and repo_of(vid) is a searchsorted
    over R+1 boundaries — no join, no shuffle); the aggregated graph has
    one vertex per repo. Output (repo, pagerank) rounded to 6."""
    import ray as _ray

    from leiden_cuda_ray.algorithms.pagerank import pagerank
    from leiden_cuda_ray.config import PageRankConfig
    from leiden_cuda_ray.graph.build import build_graph_from_dataset

    pairs, numbering, _V = _import_vid_pairs(sf_dir)

    def rb_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        repo = batch.column("repo").to_numpy(zero_copy_only=False)
        vid = np.asarray(batch.column("vertex"), np.int64)
        codes, inv = np.unique(repo, return_inverse=True)
        mins = np.full(len(codes), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mins, inv, vid)
        return pa.table({"repo": pa.array(pd.Series(codes), pa.string()),
                         "first_vid": pa.array(mins, pa.int64())})

    rb = (numbering.map_batches(rb_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
          .to_pandas().groupby("repo", as_index=False)["first_vid"].min()
          .sort_values("first_vid"))
    repo_names = rb["repo"].to_numpy()
    bounds = rb["first_vid"].to_numpy(np.int64)
    R = len(repo_names)
    bounds_ref = _ray.put(bounds)

    def to_repo_pairs(batch: pa.Table) -> pa.Table:
        b = _ray.get(bounds_ref)
        s = np.searchsorted(b, np.asarray(batch.column("src"), np.int64),
                            side="right") - 1
        d = np.searchsorted(b, np.asarray(batch.column("dst"), np.int64),
                            side="right") - 1
        keep = s != d
        return pa.table({"src": pa.array(s[keep], pa.int64()),
                         "dst": pa.array(d[keep], pa.int64())})

    redges = pairs.map_batches(to_repo_pairs, batch_format="pyarrow",
                               zero_copy_batch=True)
    g = build_graph_from_dataset(redges, V=R)
    ranks, _it, _err = pagerank(g, PageRankConfig(epsilon=0.0,
                                                  max_iterations=iters))
    r = np.concatenate([np.asarray(x) for x in _ray.get(ranks)])
    return pa.table({
        "repo": pa.array(repo_names, pa.string()),
        "pagerank": pa.array(np.round(r, 6), pa.float64()),
    })


def graph_assortativity(sf_dir: str):
    """Degree assortativity in exact integer form (algorithms/stats.py):
    one row (m, s_jk, s_sum, s_sq) of BIGINT sums over the canonical
    non-self edge set — Pearson r = (4·m·s_jk − s_sum²) /
    (2·m·s_sq − s_sum²) is derivable exactly; the DuckDB oracle
    recomputes the identical integers from the edge CTE."""
    from leiden_cuda_ray.algorithms.stats import assortativity_sums

    graph, _ = _build_graph(sf_dir)
    return assortativity_sums(graph)


def graph_leiden_conductance(sf_dir: str, k: int = 20):
    """Per-community volume/cut for the Leiden partition — the exact
    integer ingredients of conductance φ(c) = cut(c)/min(vol(c), 2m−vol(c))
    — for the k highest-volume communities (vol DESC, community ASC).

    Written-artifact oracle (the graph_leiden_objective pattern): the
    engine writes its (vertex, community) partition to parquet and emits
    (community, n_vertices, vol, cut) as BIGINTs; DuckDB recomputes the
    identical integers from the written partition joined to the weighted
    edge CTE. Distributed shape: a community request/reply exchange
    (reusing the triangle module's sparse serve machinery) gives every
    partition the community of exactly the vertices its slots reference;
    per-partition segsum partials (vol = Σ deg_w by community over rows,
    cut = Σ w over cross-community slots) merge in one reduce whose
    input is bounded by community count, not V or E."""
    import ray as _ray

    from leiden_cuda_ray.algorithms.leiden import leiden
    from leiden_cuda_ray.algorithms.triangles import (
        _merge_deg_replies,
        _request_degs,
        _serve_degs,
    )
    from leiden_cuda_ray.graph.runtime import fanout, segsum_by_key

    graph, _ = _build_graph(sf_dir)
    refs, _info = leiden(graph, LeidenConfig(gamma=0.05))
    ds = state_to_dataset(graph, refs, "community")
    _write_partition(sf_dir, ds, "leiden_comm_cond")

    P = graph.P
    req_shards = fanout(
        _request_degs,
        [(graph.parts[i], graph.block, P) for i in range(P)], P)
    serves = [
        _serve_degs.options(num_returns=P if P > 1 else 1).remote(
            refs[j], graph.ranges()[j][0], *req_shards[j])
        for j in range(P)
    ]
    replies = ([[serves[0]]] if P == 1 else
               [[serves[j][i] for j in range(P)] for i in range(P)])

    @_ray.remote
    def _partials(csr, comm, *comm_replies):
        from leiden_cuda_ray.algorithms.common import local_src_per_slot

        ids, comms = _merge_deg_replies(comm_replies)
        src_slot = local_src_per_slot(csr)
        cu = comm[src_slot]
        cv = comms[np.searchsorted(ids, csr["indices"])]
        cross = cu != cv
        cut_c, cut_w = segsum_by_key(cu[cross], csr["weights"][cross])
        vol_c, vol_w = segsum_by_key(comm, csr["deg_w"])
        nv_c, nv_n = segsum_by_key(comm, np.ones(len(comm), np.float64))
        return (vol_c, vol_w, cut_c, cut_w, nv_c, nv_n)

    parts = [
        _partials.remote(graph.parts[i], refs[i], *replies[i])
        for i in range(P)
    ]

    @_ray.remote
    def _merge(*parts):
        vol_c, vol_w = segsum_by_key(
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]))
        cut_c, cut_w = segsum_by_key(
            np.concatenate([p[2] for p in parts]),
            np.concatenate([p[3] for p in parts]))
        nv_c, nv_n = segsum_by_key(
            np.concatenate([p[4] for p in parts]),
            np.concatenate([p[5] for p in parts]))
        # align onto the full community list (nv covers every community)
        pos = np.searchsorted(nv_c, vol_c)
        vol_full = np.zeros(len(nv_c), np.float64)
        vol_full[pos] = vol_w
        cut_full = np.zeros(len(nv_c), np.float64)
        cut_full[np.searchsorted(nv_c, cut_c)] = cut_w
        order = np.lexsort((nv_c, -vol_full))[:k]
        return pa.table({
            "community": pa.array(nv_c[order], pa.int64()),
            "n_vertices": pa.array(nv_n[order].astype(np.int64),
                                   pa.int64()),
            "vol": pa.array(np.round(vol_full[order]).astype(np.int64),
                            pa.int64()),
            "cut": pa.array(np.round(cut_full[order]).astype(np.int64),
                            pa.int64()),
        })

    import ray.data

    return ray.data.from_arrow_refs([_merge.remote(*parts)])


def graph_ppr(sf_dir: str, seed_mod: int = 97, iters: int = 15):
    """Personalized PageRank from the seed set v % 97 == 0 (the same
    deterministic predicate graph_bfs uses) — fixed 15 iterations,
    rounded to 6 decimals; the DuckDB oracle unrolls the identical
    seeded recurrence (same contract as graph_pagerank_fixed)."""
    from leiden_cuda_ray.algorithms.pagerank import personalized_pagerank

    graph, _ = _build_graph(sf_dir)
    ranks = personalized_pagerank(graph, seed_mod=seed_mod, iters=iters)
    ds = state_to_dataset(graph, ranks, "ppr", pa.float64())

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": t.column("vertex"),
            "ppr": pa.array(
                np.round(np.asarray(t.column("ppr"), np.float64), 6),
                pa.float64()),
        })

    return ds.map_batches(rnd, batch_format="pyarrow")


def graph_ktruss(sf_dir: str, k: int = 4):
    """4-truss subgraph by iterative support peeling
    (algorithms/trisupport.py::ktruss): surviving canonical edges with
    their support in the converged subgraph. The DuckDB oracle unrolls
    12 peel rounds (post-fixpoint rounds are no-ops); the engine raises
    if it needs more rounds than the oracle unrolls."""
    from leiden_cuda_ray.algorithms.trisupport import ktruss

    graph, _ = _build_graph(sf_dir)
    ds, _rounds = ktruss(graph, k=k, max_rounds=12)
    return ds


def graph_diameter(sf_dir: str):
    """Double-sweep pseudo-diameter (algorithms/bfs.py::pseudo_diameter):
    BFS from vertex 0 → farthest vertex a (tie → min id), BFS from a →
    its eccentricity, a classic tight lower bound on the true diameter.
    One row (far_a, ecc_0, far_b, diameter_lb), exact BIGINTs; the
    DuckDB oracle replays both sweeps as recursive CTEs with the same
    (dist DESC, vertex ASC) argmax tie-break."""
    from leiden_cuda_ray.algorithms.bfs import pseudo_diameter

    graph, _ = _build_graph(sf_dir)
    far_a, ecc_0, far_b, dlb = pseudo_diameter(graph)
    if max(ecc_0, dlb) >= 64:
        raise ValueError(
            f"eccentricity {max(ecc_0, dlb)} exceeds the oracle's "
            f"recursion cap (64); raise the cap in the graph_diameter "
            f"oracle to match")
    return pa.table({
        "far_a": pa.array([far_a], pa.int64()),
        "ecc_0": pa.array([ecc_0], pa.int64()),
        "far_b": pa.array([far_b], pa.int64()),
        "diameter_lb": pa.array([dlb], pa.int64()),
    })


def graph_sssp(sf_dir: str, seed_mod: int = 97,
               max_oracle_iters: int = 40):
    """Weighted multi-source shortest paths to the nearest seed vertex
    (vertex % seed_mod == 0) over the symmetrized union graph with its
    integer edge weights — algorithms/sssp.py (synchronous Bellman–Ford
    relaxation, the weighted sibling of graph_bfs's hop distances).
    Exact int64 distances, -1 for unreachable. The DuckDB oracle
    unrolls the identical relaxation `max_oracle_iters` rounds;
    post-fixpoint rounds are no-ops, so the engine asserts its
    convergence superstep stays under the unroll."""
    from leiden_cuda_ray.algorithms.sssp import sssp_weighted

    graph, _ = _build_graph(sf_dir)
    dists, steps, _max_dist = sssp_weighted(graph, seed_mod=seed_mod)
    if steps >= max_oracle_iters:
        raise ValueError(
            f"SSSP took {steps} supersteps, >= the oracle's unroll "
            f"({max_oracle_iters}); raise _sssp_sql's iters to match")
    return state_to_dataset(graph, dists, "dist")


def graph_bfs(sf_dir: str, seed_mod: int = 97):
    """Multi-source BFS hop distance to the nearest seed vertex
    (vertex % seed_mod == 0) over the symmetrized union graph —
    algorithms/bfs.py. Exact integer distances, -1 for unreachable.
    The DuckDB oracle replays the same relaxation as a recursive CTE
    capped at depth 64; the engine asserts its true max distance stays
    under that cap so the cap can never truncate a shortest path."""
    from leiden_cuda_ray.algorithms.bfs import bfs_hops

    graph, _ = _build_graph(sf_dir)
    dists, _steps, max_dist = bfs_hops(graph, seed_mod=seed_mod)
    if max_dist >= 64:
        raise ValueError(
            f"BFS depth {max_dist} exceeds the oracle's recursion cap "
            f"(64); raise the cap in _bfs_sql to match")
    return state_to_dataset(graph, dists, "dist")


def graph_hits(sf_dir: str, iters: int = 8):
    """HITS hubs/authorities over the DIRECTED import graph
    (algorithms/hits.py): exactly `iters` unnormalized rounds h⁰=1,
    aᵏ=Aᵀhᵏ⁻¹, hᵏ=Aaᵏ, one final L2 normalization, rounded to 6
    decimals — the same fixed-iteration + round contract as
    graph_pagerank_fixed, unrolled identically by the DuckDB oracle.
    The directed pair stream is the cached `_import_vid_pairs` set the
    import_pairs oracle already pins row-for-row."""
    from leiden_cuda_ray.algorithms.hits import hits

    pairs, _numbering, V = _import_vid_pairs(sf_dir)
    return hits(pairs, V, iters=iters, ndigits=6)


def graph_reciprocity(sf_dir: str):
    """Edge reciprocity of the DIRECTED import graph: the fraction of
    non-self directed edges whose reverse edge also exists — the
    standard directed-graph symmetry diagnostic (Garlaschelli & Loffredo
    2004) a pipeline reads before deciding whether a directed dataset
    may be treated as undirected. Exact BIGINTs + one IEEE quotient.

    Scale shape: one map over the cached distinct import pairs fuses
    each edge to its undirected key with a direction bit, one
    groupby-sum (bit sums: 1=fwd only, 2=rev only, 3=both — pairs are
    distinct, so no other value is possible), then tiny per-block
    partials fold on the driver. Nothing vertex- or edge-sized is ever
    collected."""
    pairs, _numbering, V = _import_vid_pairs(sf_dir)
    if V >= (1 << 31):
        raise ValueError("fused undirected key min*V+max overflows "
                         f"int64 at V={V}; widen to two columns")

    def keys(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("src"), np.int64)
        w = np.asarray(batch.column("dst"), np.int64)
        m = u != w
        u, w = u[m], w[m]
        key = np.minimum(u, w) * np.int64(V) + np.maximum(u, w)
        bit = np.where(u < w, 1, 2).astype(np.int64)
        return pa.table({"key": pa.array(key, pa.int64()),
                         "bit": pa.array(bit, pa.int64())})

    agg = (pairs.map_batches(keys, batch_format="pyarrow",
                             zero_copy_batch=True)
           .groupby("key").sum("bit"))

    def partial(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("sum(bit)"), np.int64)
        both = int((s == 3).sum())
        return pa.table({
            "n_keys": pa.array([len(s)], pa.int64()),
            "n_both": pa.array([both], pa.int64()),
        })

    parts = agg.map_batches(partial, batch_format="pyarrow",
                            batch_size=None).take_all()
    n_keys = sum(r["n_keys"] for r in parts)
    n_both = sum(r["n_both"] for r in parts)
    n_edges = n_keys + n_both          # each reciprocated key = 2 edges
    n_recip = 2 * n_both
    rec = float(n_recip) / float(n_edges) if n_edges > 0 else 0.0
    return ray.data.from_arrow(pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_reciprocated": pa.array([n_recip], pa.int64()),
        "reciprocity": pa.array([rec], pa.float64()),
    }))


def graph_scc(sf_dir: str):
    """Strongly connected components over the DIRECTED import graph
    (algorithms/scc.py — min-pivot forward/backward peeling); scc = the
    component's minimum member id, edge-free files are singletons. The
    directed pair stream is the cached `_import_vid_pairs` set the
    import_pairs oracle already pins row-for-row."""
    from leiden_cuda_ray.algorithms.scc import strongly_connected_components

    pairs, _numbering, V = _import_vid_pairs(sf_dir)
    res, _phases = strongly_connected_components(pairs, V)
    return res


def graph_import_depth(sf_dir: str):
    """Dependency depth over the import graph's SCC condensation
    (algorithms/scc.py::condensation_depth): each file's SCC label and
    the longest chain of cross-SCC import edges ending at its component.
    The dag_depth cycle guard doubles as an SCC correctness assertion —
    a wrong SCC labeling would leave a cycle and fail LOUDLY."""
    from leiden_cuda_ray.algorithms.scc import condensation_depth

    pairs, _numbering, V = _import_vid_pairs(sf_dir)
    return condensation_depth(pairs, V)


def graph_mis(sf_dir: str, max_oracle_rounds: int = 16):
    """Deterministic maximal independent set over the canonical corpus
    graph (algorithms/mis.py — fixed-priority Luby ≡ greedy MIS in
    ascending mis_key order). The round count is asserted ≤ the oracle's
    unroll depth so post-fixpoint oracle rounds are provably no-ops."""
    from leiden_cuda_ray.algorithms.mis import maximal_independent_set

    graph, _ = _build_graph(sf_dir)
    ds, rounds = maximal_independent_set(graph, seed=11)
    if graph.V <= 10_000 and rounds > max_oracle_rounds:
        raise ValueError(
            f"MIS used {rounds} rounds > oracle unroll "
            f"{max_oracle_rounds}; deepen the SQL unroll")
    return ds


def graph_coloring(sf_dir: str, max_oracle_rounds: int = 40):
    """Jones–Plassmann greedy coloring over the canonical corpus graph
    (algorithms/coloring.py — color = 1 + longest path ending at v in
    the low→high mis_key orientation, one dag_depth relaxation). The
    color count is asserted ≤ the oracle's unroll depth (oracle-compared
    sizes only) so post-fixpoint oracle rounds are provably no-ops."""
    from leiden_cuda_ray.algorithms.coloring import jp_coloring

    graph, _ = _build_graph(sf_dir)
    ds = jp_coloring(graph, seed=11)
    if graph.V <= 10_000:
        ds = ds.materialize()
        cmax = ds.max("color")
        if cmax - 1 > max_oracle_rounds:
            raise ValueError(
                f"coloring used {cmax} colors > oracle unroll "
                f"{max_oracle_rounds} + 1; deepen the SQL unroll")
    return ds


def graph_spcount(sf_dir: str, max_oracle_levels: int = 16):
    """Shortest-path counts σ from the first 4 multiples of 97 (the
    forward half of Brandes betweenness, algorithms/spcount.py). Exact
    integer σ per (seed, vertex); BFS depth asserted under the oracle's
    level unroll so trailing oracle levels are provably no-ops."""
    from leiden_cuda_ray.algorithms.spcount import shortest_path_counts

    graph, _ = _build_graph(sf_dir)
    ds, depth = shortest_path_counts(graph, seed_mod=97, max_seeds=4)
    if graph.V <= 10_000 and depth > max_oracle_levels:
        raise ValueError(
            f"BFS depth {depth} exceeds the oracle's level unroll "
            f"{max_oracle_levels}; deepen _spcount_sql")
    return ds


def graph_degree_hist(sf_dir: str):
    """Exact degree-frequency histogram (degree, n_vertices), degree 0
    included — the scale-analytics summary a 100-TB graph job wants
    BEFORE choosing partitioning (skew detection). Rides the CSR
    partitions: one bincount per partition (row lengths ARE the
    distinct-neighbor degrees), then a tiny distinct-degree merge —
    nothing vertex-sized leaves the partitions."""
    import ray.data

    graph, _ = _build_graph(sf_dir)

    @ray.remote
    def _part_hist(part) -> pa.Table:
        deg = part["deg"]
        cnt = np.bincount(deg)
        nz = np.flatnonzero(cnt)
        return pa.table({"degree": pa.array(nz, pa.int64()),
                         "n_vertices": pa.array(cnt[nz], pa.int64())})

    partials = ray.data.from_arrow_refs(
        [_part_hist.remote(p) for p in graph.parts])

    def merge(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("degree"), np.int64)
        c = np.asarray(batch.column("n_vertices"), np.int64)
        ud, inv = np.unique(d, return_inverse=True)
        s = int_bincount(inv, c, len(ud))
        return pa.table({"degree": pa.array(ud, pa.int64()),
                         "n_vertices": pa.array(s, pa.int64())})

    return partials.repartition(1).map_batches(merge,
                                               batch_format="pyarrow",
                                               batch_size=None)


def graph_harmonic(sf_dir: str, max_oracle_levels: int = 16):
    """Quantized harmonic centrality from the spcount seed set:
    h_q(v) = Σ_seeds (2^20 // dist(s, v)) over reached, non-self pairs —
    exact integer floor-div, so the oracle recomputes it bit-for-bit
    from the same unrolled BFS levels. No extra exchange: each spcount
    emit block holds ALL seeds for its vertices (vertex-major layout),
    so the per-vertex sum is one in-block reshape."""
    from leiden_cuda_ray.algorithms.spcount import shortest_path_counts

    graph, _ = _build_graph(sf_dir)
    ds, depth = shortest_path_counts(graph, seed_mod=97, max_seeds=4)
    if graph.V <= 10_000 and depth > max_oracle_levels:
        raise ValueError(
            f"BFS depth {depth} exceeds the oracle's level unroll "
            f"{max_oracle_levels}; deepen _spcount_sql")
    scale = 1 << 20

    def fold(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("vertex"), np.int64)
        d = np.asarray(batch.column("dist"), np.int64)
        contrib = np.where(d > 0, scale // np.maximum(d, 1), 0)
        uv, inv = np.unique(v, return_inverse=True)
        h = int_bincount(inv, contrib, len(uv))
        return pa.table({"vertex": pa.array(uv, pa.int64()),
                         "harmonic_q": pa.array(h, pa.int64())})

    return ds.map_batches(fold, batch_format="pyarrow", batch_size=None)


def graph_betweenness(sf_dir: str, max_oracle_levels: int = 16):
    """Sampled-source Brandes betweenness with pinned integer
    arithmetic (algorithms/spcount.py::betweenness_quantized): per
    (seed, vertex) the exact σ plus delta_q — the quantized dependency,
    bit-replayable in SQL as a backward level-unrolled recurrence.
    delta_q / 2^20 tracks true Brandes δ within the quantization error."""
    from leiden_cuda_ray.algorithms.spcount import betweenness_quantized

    graph, _ = _build_graph(sf_dir)
    ds, depth = betweenness_quantized(graph, seed_mod=97, max_seeds=4)
    if graph.V <= 10_000 and depth > max_oracle_levels:
        raise ValueError(
            f"BFS depth {depth} exceeds the oracle's level unroll "
            f"{max_oracle_levels}; deepen _betweenness_sql")
    return ds


def graph_matching(sf_dir: str, max_oracle_rounds: int = 24):
    """Deterministic maximal matching over the canonical corpus graph
    (algorithms/matching.py — greedy handshake with fixed splitmix
    keys). Round count asserted ≤ the oracle's unroll depth."""
    from leiden_cuda_ray.algorithms.matching import maximal_matching

    graph, _ = _build_graph(sf_dir)
    ds, rounds = maximal_matching(graph, seed=13, max_rounds=4096)
    # the unroll contract only binds at oracle-compared tiers (the
    # driver compares at sf0.01, V=640); at scale tiers the handshake
    # legitimately needs rounds ~ max residual clique size and the
    # result is correct at any round count
    if graph.V <= 10_000 and rounds > max_oracle_rounds:
        raise ValueError(
            f"matching used {rounds} rounds > oracle unroll "
            f"{max_oracle_rounds}; deepen the SQL unroll")
    return ds


def graph_components(sf_dir: str):
    from leiden_cuda_ray.algorithms.components import connected_components

    graph, _ = _build_graph(sf_dir)
    labels, _ = connected_components(graph)
    return state_to_dataset(graph, labels, "component")


def graph_labelprop(sf_dir: str):
    from leiden_cuda_ray.algorithms.labelprop import label_propagation

    graph, _ = _build_graph(sf_dir)
    labels, _, _ = label_propagation(graph)
    return state_to_dataset(graph, labels, "label")


def graph_kcore(sf_dir: str):
    from leiden_cuda_ray.algorithms.kcore import kcore

    graph, _ = _build_graph(sf_dir)
    values, _steps, changed = kcore(graph)
    assert changed == 0, "h-index iteration did not reach its fixpoint"
    return state_to_dataset(graph, values, "core")


def graph_triangles(sf_dir: str):
    from leiden_cuda_ray.algorithms.triangles import triangle_counts

    graph, _ = _build_graph(sf_dir)
    counts, _total = triangle_counts(graph)
    return state_to_dataset(graph, counts, "triangles")


def graph_clustering_coef(sf_dir: str):
    """Local clustering coefficient per vertex over the simple graph:
    coef(v) = 2·T(v) / (deg(v)·(deg(v)−1)) for simple degree ≥ 2, else
    0.0 (the isolated/leaf convention, pinned on the oracle side too).

    Rides the existing heap-bounded triangle pipeline (per-vertex counts
    never leave the partitions) plus one per-partition simple-degree
    bincount — no new exchange; the DOUBLE is the single division
    2·T / (deg·(deg−1)), the identical IEEE op on both sides."""
    from leiden_cuda_ray.algorithms.triangles import triangle_counts

    graph, _ = _build_graph(sf_dir)
    counts, _total = triangle_counts(graph)

    @ray.remote
    def _part_coef(csr, tri) -> pa.Table:
        from leiden_cuda_ray.algorithms.common import local_src_per_slot
        from leiden_cuda_ray.algorithms.kcore import _simple_mask

        vlo, vhi = int(csr["vlo"]), int(csr["vhi"])
        keep = _simple_mask(csr)
        deg = np.bincount(local_src_per_slot(csr)[keep],
                          minlength=vhi - vlo).astype(np.int64)
        t = np.asarray(tri, np.int64)
        denom = deg * (deg - 1)
        coef = np.zeros(vhi - vlo, np.float64)
        nz = denom > 0
        coef[nz] = (2.0 * t[nz]) / denom[nz]
        return pa.table({
            "vertex": pa.array(np.arange(vlo, vhi, dtype=np.int64),
                               pa.int64()),
            "triangles": pa.array(t, pa.int64()),
            "deg": pa.array(deg, pa.int64()),
            "clustering_coef": pa.array(coef, pa.float64()),
        })

    return ray.data.from_arrow_refs(
        [_part_coef.remote(p, r) for p, r in zip(graph.parts, counts)])


def graph_leiden(sf_dir: str):
    from leiden_cuda_ray.algorithms.leiden import leiden

    graph, _ = _build_graph(sf_dir)
    refs, _info = leiden(graph, LeidenConfig(gamma=0.05))
    return state_to_dataset(graph, refs, "community")


def graph_louvain(sf_dir: str):
    from leiden_cuda_ray.algorithms.louvain import louvain

    graph, _ = _build_graph(sf_dir)
    refs, _info = louvain(graph, LouvainConfig())
    return state_to_dataset(graph, refs, "community")


# partitions THIS process wrote, keyed (tier, name) → published dir.
# partition_rand_index reuses these instead of re-running an optimizer:
# safe because both optimizers are pure functions of (graph, config) —
# a partition written by an earlier query in this process is
# bit-identical to a fresh run — and process-scoped so a stale dir left
# by an older process (possibly over a REGENERATED corpus) never leaks in.
_PARTITION_PATHS: dict = {}


def _write_partition(sf_dir: str, ds, name: str) -> str:
    """Write a (vertex, community) partition under /tmp/graft_oracle/<tier>
    so the DuckDB objective oracle can recompute the objective from the
    engine's actual output. Returns the directory."""
    import os
    import shutil

    tier = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/graft_oracle/{tier}/{name}"
    # write to a pid-unique staging dir and swap in atomically: a failure
    # mid-write leaves the previous partition in place (the objective
    # scalar then mismatches loudly instead of DuckDB reading a
    # half-written directory), and the published path stays fixed for the
    # static oracle SQL
    tmp = f"{out}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    shutil.rmtree(out, ignore_errors=True)
    os.rename(tmp, out)
    _PARTITION_PATHS[(tier, name)] = out
    return out


def _copy_partition(sf_dir: str, src: str, name: str) -> str:
    """Publish an already-written partition under a second oracle name
    (atomic staging + rename, like _write_partition)."""
    import os
    import shutil

    tier = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/graft_oracle/{tier}/{name}"
    tmp = f"{out}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    shutil.rmtree(out, ignore_errors=True)
    os.rename(tmp, out)
    _PARTITION_PATHS[(tier, name)] = out
    return out


def graph_leiden_objective(sf_dir: str):
    """Oracle-checked invariant for graph_leiden (VERDICT r2 item 5): the
    engine's partition is written to parquet and its CPM(γ=0.05) is
    returned in EXACT integer form, 20·CPM = 20·W_in − Σ_c n_c(n_c−1)
    (edge weights are integer co-occurrence counts and 20γ = 1, so both
    sides are BIGINTs — no float summation-order hazard). The DuckDB
    oracle recomputes the same integer from the written partition joined
    to the edge CTE; the engine-side assert ties the reported float cpm
    to the integer form. Mirrors the reference's external CPM check
    (examples/leiden-alg.py:12-23)."""
    from leiden_cuda_ray.algorithms.leiden import leiden
    from leiden_cuda_ray.algorithms.objectives import score

    graph, _ = _build_graph(sf_dir)
    refs, _info = leiden(graph, LeidenConfig(gamma=0.05))
    s = score(graph, refs, gamma=0.05)
    i = s["ints"]
    # 20·CPM = 20·W_in − Σ n(n−1)/2  (20γ = 1; n(n−1) even → exact int)
    cpm20 = 10 * i["win2"] + 20 * i["wself"] - i["snn"] // 2
    assert abs(cpm20 / 20.0 - s["cpm"]) <= 1e-6 * max(1.0, abs(s["cpm"])), \
        (cpm20, s["cpm"])
    ds = state_to_dataset(graph, refs, "community")
    _write_partition(sf_dir, ds, "leiden_comm")
    return ray.data.from_arrow(pa.table({
        "cpm20": pa.array([cpm20], pa.int64()),
        "num_communities": pa.array([s["num_communities"]], pa.int64()),
    }))


def graph_louvain_objective(sf_dir: str):
    """Oracle-checked invariant for graph_louvain: modularity in exact
    integer form. Q = qnum / (2m)² with
    qnum = 2m·Σ_c sum_in_c − Σ_c (Σ_{v∈c} deg_v)² — every term an
    integer (weights are counts), so the DuckDB recompute over the
    written partition matches as BIGINTs."""
    from leiden_cuda_ray.algorithms.louvain import louvain
    from leiden_cuda_ray.algorithms.objectives import score

    graph, _ = _build_graph(sf_dir)
    refs, _info = louvain(graph, LouvainConfig())
    s = score(graph, refs, gamma=0.05)
    i = s["ints"]
    qnum = i["two_m"] * (i["win2"] + 2 * i["wself"]) - i["stt"]
    assert abs(qnum / float(i["two_m"]) ** 2 - s["modularity"]) <= 1e-9, \
        (qnum, s["modularity"])
    ds = state_to_dataset(graph, refs, "community")
    _write_partition(sf_dir, ds, "louvain_comm")
    return ray.data.from_arrow(pa.table({
        "qnum": pa.array([qnum], pa.int64()),
        "two_m": pa.array([i["two_m"]], pa.int64()),
        "num_communities": pa.array([s["num_communities"]], pa.int64()),
    }))


def sf_of(sf_dir: str) -> float:
    import os

    tier = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(tier.replace("sf", ""))
    except ValueError:
        return 0.001


def graph_eccentricity(sf_dir: str, max_oracle_levels: int = 16):
    """Seeded eccentricity: for each spcount seed, the exact BFS
    eccentricity over its reachable set, plus n_reached (self included)
    and Σ dist — all BIGINTs. Rides the spcount forward state (no new
    exchange): each emit block reduces to ≤ |seeds| partial rows
    (max / count / sum per seed), so the merge input is
    O(seeds · blocks) whatever V is."""
    from leiden_cuda_ray.algorithms.spcount import shortest_path_counts

    graph, _ = _build_graph(sf_dir)
    ds, depth = shortest_path_counts(graph, seed_mod=97, max_seeds=4)
    if graph.V <= 10_000 and depth > max_oracle_levels:
        raise ValueError(
            f"BFS depth {depth} exceeds the oracle's level unroll "
            f"{max_oracle_levels}; deepen _spcount_sql")

    def partial(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("seed"), np.int64)
        d = np.asarray(batch.column("dist"), np.int64)
        us, inv = np.unique(s, return_inverse=True)
        ecc = np.full(len(us), -1, np.int64)
        np.maximum.at(ecc, inv, d)
        reached = int_bincount(inv, (d >= 0).astype(np.int64), len(us))
        sumd = np.zeros(len(us), np.int64)
        np.add.at(sumd, inv, np.where(d > 0, d, 0))
        return pa.table({"seed": pa.array(us, pa.int64()),
                         "ecc": pa.array(ecc, pa.int64()),
                         "n_reached": pa.array(reached, pa.int64()),
                         "sum_dist": pa.array(sumd, pa.int64())})

    def merge(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("seed"), np.int64)
        us, inv = np.unique(s, return_inverse=True)
        ecc = np.full(len(us), -1, np.int64)
        np.maximum.at(ecc, inv, np.asarray(batch.column("ecc"), np.int64))
        out = {"ecc": ecc}
        for c in ("n_reached", "sum_dist"):
            acc = np.zeros(len(us), np.int64)
            np.add.at(acc, inv, np.asarray(batch.column(c), np.int64))
            out[c] = acc
        return pa.table({"seed": pa.array(us, pa.int64()),
                         "ecc": pa.array(out["ecc"], pa.int64()),
                         "n_reached": pa.array(out["n_reached"],
                                               pa.int64()),
                         "sum_dist": pa.array(out["sum_dist"],
                                              pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(1).map_batches(merge, batch_format="pyarrow",
                                        batch_size=None))


def graph_weight_hist(sf_dir: str):
    """Exact edge-weight histogram (weight, n_edges) over the canonical
    undirected graph — the weight-granularity skew probe next to
    graph_degree_hist (a handful of giant co-commit weights is the skew
    signature the cocommit cap guards against). Rides the CSR
    partitions: each undirected edge lives twice in CSR, so a partition
    counts only its src < dst slots (the derived graph is self-loop-
    free); one bincount per partition, distinct-weight merge."""
    import ray.data

    graph, _ = _build_graph(sf_dir)

    @ray.remote
    def _part_whist(part) -> pa.Table:
        vlo, vhi = part["vlo"], part["vhi"]
        src = np.repeat(np.arange(vlo, vhi, dtype=np.int64),
                        np.diff(part["offsets"]))
        keep = src < part["indices"]
        wi = np.rint(np.asarray(part["weights"],
                                np.float64)[keep]).astype(np.int64)
        uw, cnt = np.unique(wi, return_counts=True)
        return pa.table({"weight": pa.array(uw, pa.int64()),
                         "n_edges": pa.array(cnt.astype(np.int64),
                                             pa.int64())})

    partials = ray.data.from_arrow_refs(
        [_part_whist.remote(p) for p in graph.parts])

    def merge(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch.column("weight"), np.int64)
        c = np.asarray(batch.column("n_edges"), np.int64)
        uw, inv = np.unique(w, return_inverse=True)
        s = np.zeros(len(uw), np.int64)
        np.add.at(s, inv, c)
        return pa.table({"weight": pa.array(uw, pa.int64()),
                         "n_edges": pa.array(s, pa.int64())})

    return partials.repartition(1).map_batches(merge,
                                               batch_format="pyarrow",
                                               batch_size=None)


def partition_rand_index(sf_dir: str):
    """Pair-counting agreement between the engine's Leiden and Louvain
    partitions, in EXACT integer form — the clustering-comparison op
    (Rand index) a community-detection engine owes its users.

    Both optimizers run over the SAME cached graph, so their
    per-partition community arrays are vertex-aligned block-for-block:
    one remote task per partition folds its aligned (c_leiden,
    c_louvain) pair into a local contingency table (np.unique over a
    fused int64 key — no shuffle touches a vertex row), and only the
    contingency rows (≤ #communities², in practice ≈ #communities)
    enter the groupby. The three pair sums are then folded with
    object-dtype (Python-int) products so a 100-TB community's n(n−1)
    cannot wrap int64 (the objectives.py overflow contract).

    Exact-integer protocol: with N vertices, contingency n_ij and
    marginals a_i (Leiden), b_j (Louvain),
      s_nij = Σ n_ij(n_ij−1), s_a = Σ a_i(a_i−1), s_b = Σ b_j(b_j−1),
      agree2 = N(N−1) − s_a − s_b + 2·s_nij  (twice the agreeing pairs;
      RI = agree2 / N(N−1)).
    The DuckDB oracle recomputes every sum as HUGEINT from the two
    written (vertex, community) partitions joined on vertex — the
    written-partition external-check pattern of graph_*_objective.

    Partition REUSE (VERDICT r4 item 5): when THIS process already ran
    graph_leiden_objective and graph_louvain_objective (their written
    partitions are tracked in _PARTITION_PATHS), the optimizers — by
    far the dominant cost; the sf1 fresh path measured 1156 s — are
    skipped: the written partitions are republished under the ri_*
    oracle names and the contingency folds from the files in one task
    (two aligned int64 arrays, V-bounded with a loud cap). Safe because
    both optimizers are deterministic pure functions of (graph,
    config), so the cached partitions are bit-identical to a fresh
    run; the fresh path remains the fallback and the scale path."""
    import os

    tier = os.path.basename(os.path.normpath(sf_dir))
    le_src = _PARTITION_PATHS.get((tier, "leiden_comm"))
    lo_src = _PARTITION_PATHS.get((tier, "louvain_comm"))
    from ray.data.aggregate import Sum

    if (le_src and lo_src and os.path.isdir(le_src)
            and os.path.isdir(lo_src)):
        graph, _ = _build_graph(sf_dir)
        if graph.V > 50_000_000:
            raise ValueError(
                "partition_rand_index reuse path holds 2 int64 arrays "
                f"of V={graph.V} rows in one task; above 50M vertices "
                "run the fresh distributed path (clear _PARTITION_PATHS)")
        le_dir = _copy_partition(sf_dir, le_src, "ri_leiden_comm")
        lo_dir = _copy_partition(sf_dir, lo_src, "ri_louvain_comm")

        @ray.remote
        def _contingency_files(le_path, lo_path, V):
            import pyarrow.parquet as pq

            def read_sorted(path):
                t = pq.read_table(path, columns=["vertex", "community"])
                v = np.asarray(t.column("vertex"), np.int64)
                c = np.asarray(t.column("community"), np.int64)
                assert len(v) == V, (len(v), V)
                return c[np.argsort(v)]

            c1, c2 = read_sorted(le_path), read_sorted(lo_path)
            lim = np.int64(1) << np.int64(31)
            assert c1.max(initial=0) < lim and c2.max(initial=0) < lim, \
                "community ids exceed 31 bits; widen the fused key"
            key = (c1 << np.int64(31)) | c2
            u, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "c1": pa.array(u >> np.int64(31), pa.int64()),
                "c2": pa.array(u & (lim - np.int64(1)), pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            })

        cont = ray.data.from_arrow_refs(
            [_contingency_files.remote(le_dir, lo_dir, graph.V)]
        ).materialize()
    else:
        from leiden_cuda_ray.algorithms.leiden import leiden
        from leiden_cuda_ray.algorithms.louvain import louvain

        graph, _ = _build_graph(sf_dir)
        refs_le, _ = leiden(graph, LeidenConfig(gamma=0.05))
        refs_lo, _ = louvain(graph, LouvainConfig())
        _write_partition(sf_dir,
                         state_to_dataset(graph, refs_le, "community"),
                         "ri_leiden_comm")
        _write_partition(sf_dir,
                         state_to_dataset(graph, refs_lo, "community"),
                         "ri_louvain_comm")

        @ray.remote
        def _contingency(le, lo):
            c1 = np.asarray(le, np.int64)
            c2 = np.asarray(lo, np.int64)
            lim = np.int64(1) << np.int64(31)
            assert c1.max(initial=0) < lim and c2.max(initial=0) < lim, \
                "community ids exceed 31 bits; widen the fused key"
            key = (c1 << np.int64(31)) | c2
            u, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "c1": pa.array(u >> np.int64(31), pa.int64()),
                "c2": pa.array(u & (lim - np.int64(1)), pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            })

        blocks = [_contingency.remote(a, b)
                  for a, b in zip(refs_le, refs_lo)]
        cont = (ray.data.from_arrow_refs(blocks)
                .groupby(["c1", "c2"])
                .aggregate(Sum("cnt", alias_name="cnt"))
                .materialize())

    def _pair_sum(ds, group_col):
        rows = (ds.groupby(group_col).aggregate(
            Sum("cnt", alias_name="m")).take_all())
        return sum(int(r["m"]) * (int(r["m"]) - 1) for r in rows)

    s_nij = sum(int(r["cnt"]) * (int(r["cnt"]) - 1)
                for r in cont.take_all())
    s_a = _pair_sum(cont, "c1")
    s_b = _pair_sum(cont, "c2")
    N = int(graph.V)
    agree2 = N * (N - 1) - s_a - s_b + 2 * s_nij
    assert 0 <= agree2 <= N * (N - 1)
    return ray.data.from_arrow(pa.table({
        "n_vertices": pa.array([N], pa.int64()),
        "s_nij": pa.array([s_nij], pa.int64()),
        "s_a": pa.array([s_a], pa.int64()),
        "s_b": pa.array([s_b], pa.int64()),
        "agree2": pa.array([agree2], pa.int64()),
    }))
