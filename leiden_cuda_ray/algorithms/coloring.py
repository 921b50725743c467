"""Distributed greedy graph coloring (beyond-reference link-graph op).

Jones–Plassmann wave coloring with FIXED deterministic priorities
(Jones & Plassmann, SIAM J. Sci. Comput. 1993): orient every edge from
its lower-`mis_key` endpoint to its higher one (keys are injective, so
the orientation is a DAG), then

    color(v) = 1 + max(color(u) : u adjacent, key(u) < key(v))
             = 1 + (length of the longest directed path ending at v).

This is exactly the round in which the classic JP loop would color v
("take a color once every lower-priority neighbor is colored"), so the
whole computation reduces to ONE longest-path relaxation over the key
orientation — reusing `scc.dag_depth`'s frontier max-relaxation, which
converges in (max color) supersteps with push volume tracking the
shrinking frontier. Adjacent vertices always differ: the edge between
them is oriented, so the head's depth strictly exceeds the tail's.
The color count is the DAG's depth (≤ the longest decreasing-key path,
O(log V / log log V) w.h.p. for bounded degree), not the chromatic
number — the standard JP trade: a proper coloring in logarithmically
many parallel waves, deterministic at any partition count.

Reference scope note: the reference (knagaitsev/leiden-cuda) has no
coloring operator; this extends its Leiden port's CSR-partition
infrastructure (the same `mis_key` priorities algorithms/mis.py pins,
so the SQL oracle reuses the proven HUGEINT hash transcription).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.algorithms.kcore import _simple_mask
from leiden_cuda_ray.algorithms.mis import mis_key
from leiden_cuda_ray.algorithms.scc import dag_depth
from leiden_cuda_ray.graph.build import Graph


@ray.remote
def _orient_low_high(csr, V: int, seed: int) -> pa.Table:
    """One CSR partition → its directed low-key→high-key edges. Each
    undirected edge is emitted by exactly one partition (the one owning
    its lower-key endpoint), keys are computed locally (pure function of
    the global id — no exchange), and the strict inequality drops
    self-loops for free."""
    src_slot = local_src_per_slot(csr)
    keep = _simple_mask(csr)
    src_g = (src_slot + csr["vlo"])[keep]
    dst = csr["indices"][keep]
    ku = mis_key(src_g, V, seed)
    kv = mis_key(dst, V, seed)
    fwd = ku < kv
    return pa.table({"src": pa.array(src_g[fwd], pa.int64()),
                     "dst": pa.array(dst[fwd], pa.int64())})


def jp_coloring(graph: Graph, seed: int = 11):
    """→ Dataset[vertex:int64, color:int64 (1-based)]: a proper
    distance-1 coloring, deterministic at any P (pure function of
    (graph, seed)); isolated vertices get color 1."""
    import pyarrow.compute as pc

    import ray.data

    P = graph.P
    tabs = [_orient_low_high.remote(graph.parts[i], graph.V, seed)
            for i in range(P)]
    pairs = ray.data.from_arrow_refs(tabs)
    depth = dag_depth(pairs, graph.V, P)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": batch.column("vertex"),
            "color": pc.add(batch.column("depth"),
                            pa.scalar(1, pa.int64())),
        })

    return depth.map_batches(finish, batch_format="pyarrow",
                             zero_copy_batch=True)
