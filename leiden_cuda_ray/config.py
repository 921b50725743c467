"""Engine + algorithm configuration.

The reference exposes gamma / theta / max_iter knobs scattered across entry
points (csrc/test/main.cpp:203, custom_leiden.py:693,
examples/cugraph-cpp-api/leiden_cugraph.cpp:93-101); here they are one
dataclass. PageRank parameters mirror the cuGraph call at
examples/cugraph-cpp-api/leiden_cugraph.cpp:72-83.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """Physical execution knobs (partitioning, batching)."""

    # number of graph partitions; None => derived from edge count
    num_partitions: int | None = None
    # target edges per partition when deriving num_partitions
    target_edges_per_partition: int = 2_000_000
    # map_batches batch size for stateless text stages
    batch_size: int = 4096
    # cap on pairwise fan-out per (repo, commit) group (skew guard for
    # giant commits; groups above the cap are sampled deterministically)
    cocommit_cap: int = 64

    def derive_partitions(self, num_edges: int) -> int:
        if self.num_partitions is not None:
            return max(1, self.num_partitions)
        return max(1, -(-num_edges // self.target_edges_per_partition))


@dataclass(frozen=True)
class LeidenConfig:
    gamma: float = 0.05          # csrc/test/main.cpp:203
    theta: float = 1.0           # custom_leiden.py:350 (randomized-θ disabled)
    max_levels: int = 20
    max_supersteps: int = 100    # reference CUDA caps at 10 greedy supersteps
    seed: int = 42
    # True runs the per-community try-lock mode (one membership
    # change per community per superstep); False (default) lets communities
    # absorb many vertices per superstep — see moving.run_local_moving.
    # QUALITY TRADEOFF (documented, deliberate): with False, all proposed
    # moves in a superstep are applied against community totals that are one
    # superstep stale, so the objective is not guaranteed monotone within a
    # superstep. When the stall guard detects a limit cycle, the level
    # FALLS BACK to lock mode (moving.run_local_moving lock_fallback) and
    # finishes monotonically instead of ending unconverged; use
    # lock_communities=True to run strictly monotone from the first
    # superstep. Lock-mode EXECUTION depends on graph size: graphs that
    # fit one worker (V <= moving.LOCK_DRAIN_V_MAX) run the reference's
    # COMPLETE sequential queue algorithm in-process
    # (moving._seq_queue_core, custom_leiden.py:534-599 — exact monotone
    # convergence, no superstep cap); larger graphs run the distributed
    # colored-BSP per-community claims loop with queue-semantics resting
    # (see moving._eval_core). Graphs at or below moving.SEQ_V_MAX —
    # every coarse Leiden level, by coarsen's P=1 collapse — skip fast
    # mode entirely and drain directly.
    lock_communities: bool = False


@dataclass(frozen=True)
class PageRankConfig:
    alpha: float = 0.85          # leiden_cugraph.cpp:79
    epsilon: float = 1e-6        # leiden_cugraph.cpp:80
    max_iterations: int = 500    # leiden_cugraph.cpp:81


@dataclass(frozen=True)
class LabelPropConfig:
    max_iterations: int = 100
    seed: int = 42


@dataclass(frozen=True)
class LouvainConfig:
    max_levels: int = 20
    max_supersteps: int = 200
    seed: int = 42
    lock_communities: bool = False
