"""Distributed weighted PageRank (north-rule algorithm, SURVEY.md §2.8).

Parameters mirror the cuGraph call the reference sketches
(examples/cugraph-cpp-api/leiden_cugraph.cpp:72-83): alpha=0.85,
epsilon=1e-6 (L1 convergence), max_iterations=500.

Superstep (push model, no halo state needed):
  per partition: contrib(u→v) = r_u · w(u,v) / wdeg_u for every local CSR
  slot → partial-sum by dst (combiner) → shard by owner(dst);
  per owner:     r'_v = (1−α)/V + α·(Σ shards_v + dangling/V); emits the L1
  delta and its dangling mass for the NEXT superstep as scalar side outputs.
Driver sees only P scalar refs per superstep.
"""

from __future__ import annotations

import numpy as np
import ray

from leiden_cuda_ray.algorithms.common import local_src_per_slot
from leiden_cuda_ray.config import PageRankConfig
from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.runtime import fanout, segsum_by_key, shard_by_owner


@ray.remote
def _init_part(csr):
    nv = csr["vhi"] - csr["vlo"]
    return np.full(nv, 0.0, np.float64)  # placeholder; set to 1/V by caller


@ray.remote
def _push(csr, rank, block, P):
    src_slot = local_src_per_slot(csr)
    wdeg = csr["deg_w"]
    safe = np.where(wdeg > 0, wdeg, 1.0)
    contrib = rank[src_slot] * (csr["weights"] / safe[src_slot])
    ids, sums = segsum_by_key(csr["indices"], contrib)
    shards = shard_by_owner(ids, block, P, sums)
    if P == 1:
        return shards[0]
    return tuple(shards)


@ray.remote
def _reduce(old_rank, csr, V, alpha, dangling_total, *shards):
    vlo = csr["vlo"]
    nv = csr["vhi"] - vlo
    acc = np.zeros(nv, np.float64)
    for ids, sums in shards:
        np.add.at(acc, ids - vlo, sums)
    new_rank = (1.0 - alpha) / V + alpha * (acc + dangling_total / V)
    err = float(np.abs(new_rank - old_rank).sum())
    dangling_next = float(new_rank[csr["deg_w"] == 0].sum())
    return new_rank, err, dangling_next


def pagerank(graph: Graph, cfg: PageRankConfig = PageRankConfig(),
             checkpointer=None, resume: bool = False,
             checkpoint_every: int = 5):
    """Returns (rank_refs per partition, iterations, final L1 error).

    checkpointer: state.Checkpointer — persists (vertex, pagerank) per
    partition every `checkpoint_every` supersteps; resume=True continues
    from the latest manifest (identical trajectory: the superstep index and
    dangling mass are restored from the manifest)."""
    P = graph.P
    V = graph.V

    @ray.remote
    def _uniform(csr):
        return np.full(csr["vhi"] - csr["vlo"], 1.0 / V, np.float64)

    ranks = [_uniform.remote(graph.parts[i]) for i in range(P)]
    start_it = 1

    @ray.remote
    def _dangling(csr, rank):
        return float(rank[csr["deg_w"] == 0].sum())

    if resume and checkpointer is not None:
        loaded = checkpointer.load_vector("pagerank")
        if loaded is not None:
            ranks, man = loaded
            if man["metrics"]["l1_error"] < cfg.epsilon:
                # checkpoint was written at convergence: re-entering the
                # loop would apply an extra iteration and diverge from the
                # uninterrupted run's ranks
                return ranks, man["superstep"], man["metrics"]["l1_error"]
            start_it = man["superstep"] + 1
            dangling_total = man["metrics"]["dangling"]
        else:
            dangling_total = sum(ray.get(
                [_dangling.remote(graph.parts[i], ranks[i])
                 for i in range(P)]))
    else:
        dangling_total = sum(ray.get(
            [_dangling.remote(graph.parts[i], ranks[i]) for i in range(P)]))

    it = start_it - 1
    err = np.inf
    for it in range(start_it, cfg.max_iterations + 1):
        shards = fanout(
            _push, [(graph.parts[i], ranks[i], graph.block, P)
                    for i in range(P)], P)
        outs = [
            _reduce.options(num_returns=3).remote(
                ranks[j], graph.parts[j], V, cfg.alpha, dangling_total,
                *shards[j])
            for j in range(P)
        ]
        ranks = [o[0] for o in outs]
        errs = ray.get([o[1] for o in outs])
        danglings = ray.get([o[2] for o in outs])
        err = float(sum(errs))
        dangling_total = float(sum(danglings))
        if checkpointer is not None and (it % checkpoint_every == 0
                                         or err < cfg.epsilon):
            checkpointer.save_vector(it, graph, ranks, "pagerank",
                                     {"l1_error": err,
                                      "dangling": dangling_total})
        if err < cfg.epsilon:
            break
    return ranks, it, err


@ray.remote
def _reduce_ppr(csr, alpha, dangling_total, seed_mod, n_seeds, *shards):
    vlo = csr["vlo"]
    nv = csr["vhi"] - vlo
    acc = np.zeros(nv, np.float64)
    for ids, sums in shards:
        np.add.at(acc, ids - vlo, sums)
    new_rank = alpha * acc
    seed = ((np.arange(vlo, csr["vhi"], dtype=np.int64) % seed_mod) == 0)
    new_rank[seed] += ((1.0 - alpha) / n_seeds
                       + alpha * dangling_total / n_seeds)
    dangling_next = float(new_rank[csr["deg_w"] == 0].sum())
    return new_rank, dangling_next


def personalized_pagerank(graph: Graph, seed_mod: int = 97,
                          alpha: float = 0.85, iters: int = 15):
    """Personalized PageRank: teleport (and dangling mass) restricted to
    the seed set {v : v % seed_mod == 0} — the standard seeded random
    walk with restart used for local community detection. Fixed
    iteration count (no convergence stop) so the DuckDB oracle can
    unroll the identical recurrence; same push/shard machinery as
    pagerank. Returns per-partition rank refs."""
    P = graph.P
    V = graph.V
    n_seeds = -(-V // seed_mod)  # |{0, seed_mod, 2·seed_mod, ...} ∩ [0,V)|

    @ray.remote
    def _init(csr):
        v = np.arange(csr["vlo"], csr["vhi"], dtype=np.int64)
        r = np.where(v % seed_mod == 0, 1.0 / n_seeds, 0.0)
        return r, float(r[csr["deg_w"] == 0].sum())

    inits = [_init.options(num_returns=2).remote(graph.parts[i])
             for i in range(P)]
    ranks = [o[0] for o in inits]
    dangling_total = float(sum(ray.get([o[1] for o in inits])))

    for _ in range(iters):
        shards = fanout(
            _push, [(graph.parts[i], ranks[i], graph.block, P)
                    for i in range(P)], P)
        outs = [
            _reduce_ppr.options(num_returns=2).remote(
                graph.parts[j], alpha, dangling_total, seed_mod, n_seeds,
                *shards[j])
            for j in range(P)
        ]
        ranks = [o[0] for o in outs]
        dangling_total = float(sum(ray.get([o[1] for o in outs])))
    return ranks
