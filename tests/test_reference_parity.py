"""Reference-semantics parity on a non-trivial graph (VERDICT.md round-1
item 1 / SURVEY.md §5): the engine's BSP Leiden/Louvain must produce the
SAME partition as the vendored single-process, seed-pinned port of the
reference semantics (tests/reference_oracle.py) on a seeded planted-
partition graph — pinning refinement (custom_leiden.py:350-460) and
maintain_p (custom_leiden.py:493-523) far harder than the clique-ring
fixtures do. γ sweep covers the reference's own values 0.05 / 0.09 / 0.1
(main.cpp:203, custom_leiden.py:796, test1.py:50)."""

import numpy as np
import pytest
import ray

from leiden_cuda_ray.algorithms.leiden import leiden
from leiden_cuda_ray.algorithms.louvain import louvain
from leiden_cuda_ray.config import LeidenConfig, LouvainConfig
from leiden_cuda_ray.graph.build import build_graph_from_arrays
from tests.reference_oracle import ref_leiden, ref_louvain


def planted_partition(n_groups=5, group_size=20, p_in=0.7, p_out=0.015,
                      seed=7):
    """Seeded ER-with-planted-partition graph (~100 vertices)."""
    rng = np.random.RandomState(seed)
    n = n_groups * group_size
    src, dst = [], []
    for u in range(n):
        for v in range(u + 1, n):
            same = (u // group_size) == (v // group_size)
            p = p_in if same else p_out
            if rng.rand() < p:
                src.append(u)
                dst.append(v)
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    return src, dst, np.ones(len(src), np.float64), n


def _canon(labels_by_vertex: dict) -> dict:
    """Partition → canonical form: vertex → min member id of its group."""
    groups = {}
    for v, c in labels_by_vertex.items():
        groups.setdefault(c, []).append(v)
    out = {}
    for members in groups.values():
        lo = min(members)
        for v in members:
            out[v] = lo
    return out


@pytest.mark.parametrize("gamma", [0.05, 0.09, 0.1])
@pytest.mark.parametrize("P", [1, 3])
def test_leiden_matches_reference_semantics(gamma, P):
    src, dst, w, n = planted_partition()
    oracle = _canon(ref_leiden(src, dst, w, gamma))

    g = build_graph_from_arrays(src, dst, w, V=n, P=P)
    refs, _info = leiden(g, LeidenConfig(gamma=gamma))
    comm = np.concatenate(ray.get(refs))
    engine = _canon({v: int(comm[v]) for v in range(n)})
    assert engine == oracle


@pytest.mark.parametrize("P", [1, 2])
def test_louvain_matches_reference_semantics(P):
    src, dst, w, n = planted_partition()
    oracle = _canon(ref_louvain(src, dst, w))

    g = build_graph_from_arrays(src, dst, w, V=n, P=P)
    refs, _info = louvain(g, LouvainConfig())
    comm = np.concatenate(ray.get(refs))
    engine = _canon({v: int(comm[v]) for v in range(n)})
    assert engine == oracle


def test_oracle_finds_planted_partition():
    """Sanity: at γ in the sweep the oracle itself recovers the planted
    groups exactly — so the parity assertions above pin real structure."""
    src, dst, w, n = planted_partition()
    oracle = _canon(ref_leiden(src, dst, w, 0.1))
    planted = {v: (v // 20) * 20 for v in range(n)}
    assert oracle == planted
