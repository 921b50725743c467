"""Gather-scatter superstep machinery over CSR partitions.

The push-model analogue of the reference's edge-parallel gather kernel
(`edge_gather_new_neighbor_comm_weights_kernel`, csrc/src/leiden_kernel.cu:
187-227): every superstep, each partition scans its local CSR once, partially
aggregates per-destination messages (the combiner — mirrors the per-thread
atomicAdd partials), and shards them by the destination's owner partition
(`num_returns=P` fan-out — the all-to-all exchange Ray Data's shuffle uses
internally). Owners merge shards and update their slice of vertex state.
No per-row data touches the driver; the driver only sees scalar metrics.

Scale note: the exchange creates P ObjectRefs per task, O(P²) per wave.
That is fine to the P=512 cap (_derive_P) this engine uses — ~260k refs,
well inside Ray's per-node limits — and each ref's payload shrinks as
1/P², so bytes stay O(E). Beyond thousands of partitions the exchange
would need tree/multi-hop routing (combine shards at √P intermediate
hops); the shard_by_owner layout already groups rows per owner, so that
change would be local to fanout().
"""

from __future__ import annotations

import numpy as np


def shard_by_owner(ids: np.ndarray, block, P: int,
                   *payloads: np.ndarray):
    """Split (ids, *payloads) into P groups by owner(ids).

    `block`: int (uniform ranges) or int64 boundary array of length P+1
    (edge-balanced ranges, see csr.owner_of). Returns a list of P tuples
    (ids_j, payload1_j, ...). Uses a single argsort + searchsorted (no
    Python loop over rows).
    """
    if P == 1:
        return [(ids, *payloads)]
    if isinstance(block, np.ndarray):
        owner = np.searchsorted(block, ids, side="right") - 1
    else:
        owner = np.minimum(ids // block, P - 1)
    order = np.argsort(owner, kind="stable")
    owner_s = owner[order]
    ids_s = ids[order]
    pays = [p[order] for p in payloads]
    bounds = np.searchsorted(owner_s, np.arange(P + 1))
    out = []
    for j in range(P):
        sl = slice(bounds[j], bounds[j + 1])
        out.append((ids_s[sl], *[p[sl] for p in pays]))
    return out


def fanout(remote_fn, per_part_args: list[tuple], P: int):
    """Launch one task per partition, each returning P routed outputs.

    remote_fn must return a tuple/list of length P (when P > 1).
    Returns shards[j] = list over source partitions of the j-th output ref.
    """
    outs = []
    for args in per_part_args:
        if P == 1:
            outs.append([remote_fn.options(num_returns=1).remote(*args)])
        else:
            outs.append(list(
                remote_fn.options(num_returns=P).remote(*args)))
    return [[outs[i][j] for i in range(len(per_part_args))]
            for j in range(P)]


def segsum_by_key(keys: np.ndarray, vals: np.ndarray):
    """Group-sum vals by int64 keys → (unique_keys, sums). Vectorized."""
    if len(keys) == 0:
        return keys, vals
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    v = vals[order]
    cut = np.empty(len(k), bool)
    cut[0] = True
    np.not_equal(k[1:], k[:-1], out=cut[1:])
    starts = np.flatnonzero(cut)
    sums = np.add.reduceat(v, starts)
    return k[starts], sums


def segsum_by_pair(key_a: np.ndarray, key_b: np.ndarray, vals: np.ndarray):
    """Group-sum by (key_a, key_b) pairs → (a_unique, b_unique, sums).

    Fast path: nonnegative keys whose product range fits int64 are fused
    into one key — a single stable argsort is ~2× faster than a two-key
    lexsort and this sits on every superstep's critical path."""
    if len(key_a) == 0:
        return key_a, key_b, vals
    bmax = int(key_b.max())
    amax = int(key_a.max())
    if (key_a.min() >= 0 and key_b.min() >= 0
            and amax < (1 << 62) // (bmax + 1)):
        span = bmax + 1
        key = key_a * span + key_b
        order = np.argsort(key, kind="stable")
        k = key[order]
        v = vals[order]
        cut = np.empty(len(k), bool)
        cut[0] = True
        np.not_equal(k[1:], k[:-1], out=cut[1:])
        starts = np.flatnonzero(cut)
        ku = k[starts]
        return ku // span, ku % span, np.add.reduceat(v, starts)
    order = np.lexsort((key_b, key_a))
    a, b, v = key_a[order], key_b[order], vals[order]
    cut = np.empty(len(a), bool)
    cut[0] = True
    np.logical_or(a[1:] != a[:-1], b[1:] != b[:-1], out=cut[1:])
    starts = np.flatnonzero(cut)
    return a[starts], b[starts], np.add.reduceat(v, starts)


def segmin_by_key(keys: np.ndarray, vals: np.ndarray):
    """Group-min vals by int64 keys → (unique_keys, mins)."""
    if len(keys) == 0:
        return keys, vals
    order = np.lexsort((vals, keys))
    k = keys[order]
    v = vals[order]
    cut = np.empty(len(k), bool)
    cut[0] = True
    np.not_equal(k[1:], k[:-1], out=cut[1:])
    return k[cut], v[cut]


def segmax_by_key(keys: np.ndarray, vals: np.ndarray):
    if len(keys) == 0:
        return keys, vals
    # descending sort key: bitwise-not is order-reversing for unsigned ints
    # (negating uint64 wraps, which would rank a 0 priority as maximal)
    desc = ~vals if vals.dtype.kind == "u" else -vals
    order = np.lexsort((desc, keys))
    k = keys[order]
    v = vals[order]
    cut = np.empty(len(k), bool)
    cut[0] = True
    np.not_equal(k[1:], k[:-1], out=cut[1:])
    return k[cut], v[cut]


def vertex_priority(ids: np.ndarray, superstep: int, seed: int) -> np.ndarray:
    """Deterministic per-(vertex, superstep) uniform priority.

    Replaces the reference's curand draw (csrc/src/leiden_kernel.cu:8-23)
    with a splitmix64-style hash so distributed runs are reproducible
    (SURVEY.md §4 "Ordering assumptions")."""
    with np.errstate(over="ignore"):  # uint64 wrap-around is the point
        x = (ids.astype(np.uint64)
             + np.uint64(0x9E3779B97F4A7C15) * np.uint64(superstep + 1)
             + np.uint64(0xBF58476D1CE4E5B9) * np.uint64(seed + 1))
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x
