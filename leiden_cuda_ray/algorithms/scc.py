"""Distributed strongly connected components (directed graph).

Min-pivot forward/backward peeling — the label-based variant of
FW-BW decomposition (Fleischer/Hendrickson/Pinar 2000; coloring of
Orzan 2004, with min labels instead of max):

per phase, over the ALIVE subgraph,
  f(v) = min id that can reach v   (min-label fixpoint along fwd edges)
  g(v) = min id v can reach        (same fixpoint along rev edges)
and every alive v with f(v) = g(v) = m is assigned scc = m: m reaches
v and v reaches m, so v ∈ SCC(m); conversely every member of SCC(m)
computes the identical (f, g) pair, so whole SCCs are assigned — and
peeled — together (removing whole SCCs never breaks a surviving
cycle: a cycle through u lies entirely inside SCC(u)). The assigned
label is exactly the SCC's minimum member id (any smaller mutual
partner would lower f and g equally), which is what the DuckDB
closure oracle computes. The globally minimal alive vertex always
satisfies f = g = itself, so every phase assigns at least one SCC and
termination is guaranteed; practically each phase clears every
"basin-minimal" SCC at once and DAG-like regions drain in a handful
of phases. max_phases failure is LOUD (the ktruss convention), never
a silently partial answer.

Scale shape: reuses hits.py::build_directed_parts (fwd + rev CSR per
partition, edges sharded in tasks, never on the driver); each
propagation is the components.py frontier relaxation — a partition
pushes only along edges whose src label changed last superstep, and
dead vertices neither push nor receive. State is per-partition
(scc, alive) arrays; nothing O(V) lives on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.algorithms.hits import build_directed_parts
from leiden_cuda_ray.graph.runtime import (fanout, segmax_by_key,
                                           segmin_by_key, shard_by_owner)


@ray.remote
def _init_labels(vlo: int, vhi: int, alive):
    lab = np.arange(vlo, vhi, dtype=np.int64)
    return lab, alive.copy()


@ray.remote
def _push_min_alive(csr, lab, alive, active, bsize, P):
    """Push min labels along this partition's (directed) CSR slots whose
    src is alive and changed last superstep."""
    src_slot = local_src_per_slot(csr)
    sel = alive[src_slot] & active[src_slot]
    ids, mins = segmin_by_key(csr["indices"][sel], lab[src_slot][sel])
    shards = shard_by_owner(ids, bsize, P, mins)
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _reduce_min_alive(lab, alive, vlo, *shards):
    new = lab.copy()
    for ids, mins in shards:
        loc = ids - vlo
        np.minimum.at(new, loc, mins)
    np.copyto(new, lab, where=~alive)  # dead vertices don't receive
    changed = new != lab
    return new, changed, int(changed.sum())


def _propagate_min(parts, alives, ranges, bsize, P,
                   max_iterations: int) -> list:
    """Min-label fixpoint over the alive subgraph of the given directed
    CSR partitions; returns per-partition label refs."""
    inits = [_init_labels.options(num_returns=2).remote(
        ranges[i][0], ranges[i][1], alives[i]) for i in range(P)]
    labels = [o[0] for o in inits]
    actives = [o[1] for o in inits]
    for _ in range(max_iterations):
        shards = fanout(
            _push_min_alive,
            [(parts[i], labels[i], alives[i], actives[i], bsize, P)
             for i in range(P)], P)
        outs = [
            _reduce_min_alive.options(num_returns=3).remote(
                labels[j], alives[j], ranges[j][0], *shards[j])
            for j in range(P)
        ]
        labels = [o[0] for o in outs]
        actives = [o[1] for o in outs]
        if sum(ray.get([o[2] for o in outs])) == 0:
            return labels
    raise ValueError(
        f"SCC label propagation did not converge in {max_iterations} "
        f"supersteps")


@ray.remote
def _assign(scc, alive, f, g):
    m = alive & (f == g)
    out = scc.copy()
    out[m] = f[m]
    alive2 = alive & ~m
    return out, alive2, int(alive2.sum())


@ray.remote
def _emit_scc(vlo: int, scc) -> pa.Table:
    return pa.table({
        "vertex": pa.array(np.arange(vlo, vlo + len(scc), dtype=np.int64),
                           pa.int64()),
        "scc": pa.array(scc, pa.int64()),
    })


def strongly_connected_components(pairs_ds, V: int, P: int | None = None,
                                  max_phases: int = 64,
                                  max_iterations: int = 10_000):
    """Dataset[src:int64, dst:int64] (distinct directed edges) →
    (Dataset[vertex:int64, scc:int64], phases) over all V vertices
    (edge-free vertices are singleton SCCs, assigned in phase 1).
    scc = minimum member id of the vertex's strongly connected
    component."""
    import ray.data

    fwd, rev, bsize, P, ranges = build_directed_parts(pairs_ds, V, P)

    @ray.remote(num_returns=2)
    def _init_state(vlo, vhi):
        nv = vhi - vlo
        return np.full(nv, -1, np.int64), np.ones(nv, bool)

    inits = [_init_state.remote(ranges[i][0], ranges[i][1])
             for i in range(P)]
    sccs = [o[0] for o in inits]
    alives = [o[1] for o in inits]

    for phase in range(1, max_phases + 1):
        f = _propagate_min(fwd, alives, ranges, bsize, P, max_iterations)
        g = _propagate_min(rev, alives, ranges, bsize, P, max_iterations)
        outs = [
            _assign.options(num_returns=3).remote(
                sccs[j], alives[j], f[j], g[j])
            for j in range(P)
        ]
        sccs = [o[0] for o in outs]
        alives = [o[1] for o in outs]
        if sum(ray.get([o[2] for o in outs])) == 0:
            blocks = [_emit_scc.remote(ranges[j][0], sccs[j])
                      for j in range(P)]
            return ray.data.from_arrow_refs(blocks), phase
    raise ValueError(
        f"SCC peeling did not converge within {max_phases} phases — "
        f"pathological chain structure; raise max_phases")


def components_from_pairs(pairs_ds, V: int, P: int | None = None,
                          max_iterations: int = 10_000):
    """Dataset[src:int64, dst:int64] (directed OR undirected pair
    stream) → Dataset[vertex:int64, component:int64] over all V ids,
    where component = min id connected to the vertex ignoring edge
    direction (edge-free ids are singletons).

    This is min-label propagation over the symmetrized graph — the same
    frontier fixpoint SCC's phases run, but one pass total because
    symmetric reachability IS connectivity. Unlike
    algorithms/components.py (which takes a built CSR Graph), this
    operates directly on a pair stream in a sparse id space — the shape
    dedup-cluster assignment needs, where building a full corpus Graph
    for a handful of near-dup pairs would be waste."""
    import ray.data

    fwd, rev, bsize, P, ranges = build_directed_parts(pairs_ds, V, P)

    @ray.remote
    def _ones(vlo, vhi):
        return np.ones(vhi - vlo, bool)

    alives = [_ones.remote(ranges[i][0], ranges[i][1]) for i in range(P)]
    # push along BOTH direction partitions each superstep: fwd CSR rows
    # push src→dst, rev CSR rows push dst→src — together the symmetric
    # relaxation, without materializing a symmetrized edge copy
    labels = _propagate_min_sym(fwd, rev, alives, ranges, bsize, P,
                                max_iterations)
    blocks = [
        _emit_labeled.remote(ranges[j][0], labels[j], "component")
        for j in range(P)
    ]
    return ray.data.from_arrow_refs(blocks)


def _propagate_min_sym(fwd, rev, alives, ranges, bsize, P,
                       max_iterations: int) -> list:
    """Min-label fixpoint pushing along fwd AND rev partitions (the
    symmetrized relaxation); otherwise identical to _propagate_min."""
    inits = [_init_labels.options(num_returns=2).remote(
        ranges[i][0], ranges[i][1], alives[i]) for i in range(P)]
    labels = [o[0] for o in inits]
    actives = [o[1] for o in inits]
    for _ in range(max_iterations):
        shards_f = fanout(
            _push_min_alive,
            [(fwd[i], labels[i], alives[i], actives[i], bsize, P)
             for i in range(P)], P)
        shards_r = fanout(
            _push_min_alive,
            [(rev[i], labels[i], alives[i], actives[i], bsize, P)
             for i in range(P)], P)
        outs = [
            _reduce_min_alive.options(num_returns=3).remote(
                labels[j], alives[j], ranges[j][0],
                *shards_f[j], *shards_r[j])
            for j in range(P)
        ]
        labels = [o[0] for o in outs]
        actives = [o[1] for o in outs]
        if sum(ray.get([o[2] for o in outs])) == 0:
            return labels
    raise ValueError(
        f"component label propagation did not converge in "
        f"{max_iterations} supersteps")


@ray.remote
def _emit_labeled(vlo: int, lab, colname: str) -> pa.Table:
    return pa.table({
        "vertex": pa.array(np.arange(vlo, vlo + len(lab), dtype=np.int64),
                           pa.int64()),
        colname: pa.array(lab, pa.int64()),
    })


@ray.remote
def _push_depth(csr, dep, active, bsize, P):
    """Push dep(src)+1 along this partition's directed CSR slots whose
    src depth changed last superstep (max-relaxation frontier)."""
    src_slot = local_src_per_slot(csr)
    sel = active[src_slot]
    ids, maxs = segmax_by_key(csr["indices"][sel], dep[src_slot][sel] + 1)
    shards = shard_by_owner(ids, bsize, P, maxs)
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _reduce_depth(dep, vlo, *shards):
    new = dep.copy()
    for ids, maxs in shards:
        np.maximum.at(new, ids - vlo, maxs)
    changed = new != dep
    return new, changed, int(changed.sum())


@ray.remote
def _emit_depth(vlo: int, dep) -> pa.Table:
    return pa.table({
        "vertex": pa.array(np.arange(vlo, vlo + len(dep), dtype=np.int64),
                           pa.int64()),
        "depth": pa.array(dep, pa.int64()),
    })


def dag_depth(pairs_ds, V: int, P: int | None = None,
              max_iterations: int = 10_000):
    """Dataset[src:int64, dst:int64] (distinct directed edges of an
    ACYCLIC graph) → Dataset[vertex:int64, depth:int64] over all V ids,
    where depth(v) = length of the longest directed path ending at v
    (0 for sources and edge-free ids).

    Frontier max-relaxation: a vertex pushes dep+1 along its out-edges
    only in the superstep after its depth grew, so total push volume is
    Σ_v out-deg(v) · (#times dep(v) grows) ≤ E · L — and each superstep's
    wave shrinks to the vertices whose longest path actually lengthened.
    Converges in exactly L+1 supersteps (L = longest path); a CYCLE in
    the input would relax forever, so exhausting max_iterations raises
    LOUDLY naming the cause rather than returning a partial answer."""
    import ray.data

    fwd, _rev, bsize, P, ranges = build_directed_parts(pairs_ds, V, P)

    @ray.remote(num_returns=2)
    def _zeros(vlo, vhi):
        nv = vhi - vlo
        return np.zeros(nv, np.int64), np.ones(nv, bool)

    inits = [_zeros.remote(ranges[i][0], ranges[i][1]) for i in range(P)]
    deps = [o[0] for o in inits]
    actives = [o[1] for o in inits]
    for _ in range(max_iterations):
        shards = fanout(
            _push_depth,
            [(fwd[i], deps[i], actives[i], bsize, P) for i in range(P)], P)
        outs = [
            _reduce_depth.options(num_returns=3).remote(
                deps[j], ranges[j][0], *shards[j])
            for j in range(P)
        ]
        deps = [o[0] for o in outs]
        actives = [o[1] for o in outs]
        if sum(ray.get([o[2] for o in outs])) == 0:
            blocks = [_emit_depth.remote(ranges[j][0], deps[j])
                      for j in range(P)]
            return ray.data.from_arrow_refs(blocks)
    raise ValueError(
        f"dag_depth did not converge in {max_iterations} supersteps — "
        f"the input graph almost certainly contains a directed cycle "
        f"(run strongly_connected_components and condense first)")


def condensation_depth(pairs_ds, V: int, P: int | None = None):
    """Dataset[src, dst] (distinct directed edges) → Dataset[vertex:int64,
    scc:int64, depth:int64]: each vertex's SCC label (min member id) and
    the dependency depth of that SCC in the condensation DAG — the
    longest chain of cross-SCC edges ending at the component (0 for
    components nobody imports from... i.e. no incoming cross-SCC edge).

    Composition, all distributed: strongly_connected_components supplies
    labels; edges map into SCC space via two int-key hash joins (E rows
    each, no O(V) broadcast); the cross-SCC pairs deduplicate through the
    fused-key exchange (canonicalize_edges directed distinct); dag_depth
    max-relaxes over the condensation, which is acyclic BY CONSTRUCTION —
    so its cycle guard doubles as an SCC correctness assertion."""
    from leiden_cuda_ray.stages.edges import canonicalize_edges
    from leiden_cuda_ray.stages.joins import hash_join

    scc_ds, _phases = strongly_connected_components(pairs_ds, V, P)

    j1 = hash_join(pairs_ds, scc_ds, on=("src",), right_on=("vertex",))

    def keep1(batch: pa.Table) -> pa.Table:
        return pa.table({"cu": batch.column("scc"),
                         "dst": batch.column("dst")})

    j2 = hash_join(j1.map_batches(keep1, batch_format="pyarrow"),
                   scc_ds, on=("dst",), right_on=("vertex",))

    def cross(batch: pa.Table) -> pa.Table:
        cu = np.asarray(batch.column("cu"), np.int64)
        cv = np.asarray(batch.column("scc"), np.int64)
        m = cu != cv
        return pa.table({"src": pa.array(cu[m], pa.int64()),
                         "dst": pa.array(cv[m], pa.int64())})

    cond = canonicalize_edges(j2.map_batches(cross, batch_format="pyarrow"),
                              sum_weights=False, V=V, directed=True)
    dep = dag_depth(cond, V, P)

    out = hash_join(scc_ds, dep, on=("scc",), right_on=("vertex",))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"vertex": batch.column("vertex"),
                         "scc": batch.column("scc"),
                         "depth": batch.column("depth")})

    return out.map_batches(finish, batch_format="pyarrow")
