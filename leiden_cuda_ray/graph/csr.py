"""Partition-local CSR construction (numpy over zero-copy Arrow columns).

Semantics mirror the reference CSR builder `to_csr` (csrc/test/main.cpp:45-115):
- dense offsets covering isolated vertices in the partition's id range
  (main.cpp:85-89),
- neighbor lists sorted by dst id (main.cpp:92-94),
- input is the already-symmetrized, deduplicated edge set (both directions
  present, parallel edges collapsed upstream).

A partition owns the contiguous vertex range [vlo, vhi) and stores the CSR of
all out-edges whose src falls in that range. dst ids stay global.
"""

from __future__ import annotations

import numpy as np


def owner_of(v: np.ndarray | int, block, P: int):
    """Partition owning vertex v.

    `block` is either an int (uniform contiguous ranges) or an int64 array
    of P+1 range boundaries (edge-balanced contiguous ranges — the
    degree-skew mitigation: boundaries are cut at equal cumulative-degree
    quantiles so a partition of hub-heavy ids holds fewer vertices)."""
    if isinstance(block, np.ndarray):
        return np.searchsorted(block, np.asarray(v), side="right") - 1
    return np.minimum(np.asarray(v) // block, P - 1) if P > 1 else (
        np.zeros_like(np.asarray(v)) if not np.isscalar(v) else 0)


def part_range(pid: int, block, P: int, V: int) -> tuple[int, int]:
    if isinstance(block, np.ndarray):
        return int(block[pid]), int(block[pid + 1])
    vlo = min(pid * block, V)
    vhi = V if pid == P - 1 else min(V, (pid + 1) * block)
    return vlo, vhi


def build_partition_csr(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                        vlo: int, vhi: int, presorted: bool = False) -> dict:
    """Build one partition's CSR dict from its symmetrized edge arrays.

    presorted=True asserts rows already arrive sorted by (src, dst) —
    the distributed build's reduce ranges emit sorted runs that concatenate
    in ascending src order, so the O(E log E) lexsort is skipped. deg_w
    still accumulates via np.add.at in row order, bit-identical to the
    sorted path."""
    nv = vhi - vlo
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float64)
    if len(src) and (src.min() < vlo or src.max() >= vhi):
        raise ValueError(
            f"partition [{vlo},{vhi}) received src ids outside its range "
            f"[{src.min()},{src.max()}] — stale spill or wrong partitioning")
    local = src - vlo
    if not presorted:
        order = np.lexsort((dst, local))  # row-major, rows sorted by dst
        local, dst, w = local[order], dst[order], w[order]
    counts = np.bincount(local, minlength=nv)
    offsets = np.zeros(nv + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    deg_w = np.zeros(nv, np.float64)
    np.add.at(deg_w, local, w)
    self_mask = dst == (local + vlo)
    self_w = np.zeros(nv, np.float64)
    if self_mask.any():
        np.add.at(self_w, local[self_mask], w[self_mask])
    return {
        "vlo": int(vlo),
        "vhi": int(vhi),
        "offsets": offsets,
        "indices": dst,
        "weights": w,
        "deg_w": deg_w,          # weighted degree, self-loop counted once
        "deg": counts.astype(np.int64),  # unweighted degree (CSR row length)
        "self_w": self_w,        # self-loop weight per owned vertex
    }


def row_ids(csr: dict) -> np.ndarray:
    """Global src id per CSR slot (edge-parallel mirror, leiden_kernel.cuh COO)."""
    nv = csr["vhi"] - csr["vlo"]
    return np.repeat(np.arange(csr["vlo"], csr["vhi"], dtype=np.int64),
                     np.diff(csr["offsets"]))
