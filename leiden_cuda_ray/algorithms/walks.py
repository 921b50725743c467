"""Deterministic random-walk generation (DeepWalk-style corpus).

Produces the walk corpus a graph-embedding trainer consumes
(Perozzi et al., "DeepWalk", KDD 2014): from every seed vertex, a
fixed-length walk over the symmetrized graph, emitted long-form as
(start, step, vertex) rows. Seeds are the deterministic predicate
v % seed_mod == 0 restricted to non-isolated vertices (an isolated
vertex has no step-1 move; every vertex REACHED by a walk has degree
≥ 1 by symmetry, so no dead ends after the seed filter).

The "random" choice is a deterministic hash so the whole corpus is
SQL-checkable: at step t (1-based) from vertex u, the walk moves to
the r-th smallest neighbor of u where

    r = (u * 1000003 + 7919 * t) % deg(u)

(int64-safe for u < 2^31; deg = distinct-neighbor count = CSR row
length — the graph build dedups edges and strips self-loops, and the
DuckDB oracle derives the identical degree from its canonical edge
CTE). CSR rows are stored dst-ascending (graph/csr.py), so "r-th
smallest neighbor" is a direct slot index — no per-step sort.

Scale design: the frontier is owner-sharded (start, cur) pairs; each
of the L supersteps is one fanout of per-partition tasks that index
their local CSR row (pure vectorized gather), emit the step's output
block, and route the advanced pairs to the next owners. Walk state
never concentrates on the driver and no task holds more than its
partition's share of the frontier (frontier size is constant at
n_seeds rows per step).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import shard_by_owner

_WALK_A = 1_000_003
_WALK_B = 7_919


def _emit(starts: np.ndarray, step: int, verts: np.ndarray) -> pa.Table:
    return pa.table({
        "start": pa.array(starts, pa.int64()),
        "step": pa.array(np.full(len(starts), step, np.int64), pa.int64()),
        "vertex": pa.array(verts, pa.int64()),
    })


@ray.remote(num_returns=2)
def _seed_part(csr, seed_mod: int):
    """One partition's walk seeds: local non-isolated vertices with
    v % seed_mod == 0. Returns (step-0 output block, initial frontier
    shard (cur, start)) — seeds are their own owner, no routing."""
    v = np.arange(csr["vlo"], csr["vhi"], dtype=np.int64)
    s = v[(v % seed_mod == 0) & (csr["deg"] > 0)]
    return _emit(s, 0, s), (s, s.copy())


@ray.remote
def _walk_step(csr, block, P: int, t: int, *shards):
    """Advance this partition's share of the frontier one step: gather
    the deterministic-rank neighbor from the local CSR, emit the step's
    (start, t, vertex) rows, route advanced (cur, start) pairs to the
    owners of the new vertices. Returns (emit block, P frontier
    shards)."""
    curs = np.concatenate([s[0] for s in shards]) if shards else \
        np.empty(0, np.int64)
    starts = np.concatenate([s[1] for s in shards]) if shards else \
        np.empty(0, np.int64)
    if len(curs) == 0:
        out = shard_by_owner(curs, block, P, starts)
        return tuple([_emit(starts, t, curs)]
                     + [(o[0], o[1]) for o in out])
    local = curs - csr["vlo"]
    deg = csr["deg"][local]
    if (deg == 0).any():
        raise ValueError("walk reached an isolated vertex — frontier "
                         "routed to the wrong owner or graph has "
                         "asymmetric edges")
    rnk = (curs * _WALK_A + _WALK_B * t) % deg
    nxt = csr["indices"][csr["offsets"][local] + rnk]
    out = shard_by_owner(nxt, block, P, starts)
    return tuple([_emit(starts, t, nxt)]
                 + [(o[0], o[1]) for o in out])


def random_walks(graph: Graph, length: int = 8, seed_mod: int = 13):
    """Returns Dataset[start:int64, step:int64, vertex:int64] with one
    row per (seed, step) — (length+1) rows per seed including step 0.
    Requires a symmetrized, self-loop-free graph (the corpus derive's
    output; asymmetric inputs fail loudly at the isolated-vertex
    check)."""
    import ray.data

    assert graph.V < (1 << 31), "rank hash needs u < 2^31"
    P = graph.P
    seed_outs = [_seed_part.remote(graph.parts[j], seed_mod)
                 for j in range(P)]
    emits = [o[0] for o in seed_outs]
    incoming = [[seed_outs[j][1]] for j in range(P)]
    for t in range(1, length + 1):
        outs = [
            _walk_step.options(num_returns=1 + P).remote(
                graph.parts[j], graph.block, P, t, *incoming[j])
            for j in range(P)
        ]
        emits.extend(o[0] for o in outs)
        incoming = [[outs[i][1 + j] for i in range(P)]
                    for j in range(P)]
    return ray.data.from_arrow_refs(emits)
