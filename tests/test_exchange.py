"""Fused-key exchange tests: canonicalize_edges' fused path and the
distributed graph build must be bit-identical to their reference shapes
(the pair-column path resp. the in-memory build), and the V-bound guards
must fire before fused keys can collide."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from leiden_cuda_ray.graph.build import (
    _plan_map_groups,
    build_graph_from_arrays,
    build_graph_from_dataset,
)
from leiden_cuda_ray.graph.csr import row_ids
from leiden_cuda_ray.graph.runtime import segsum_by_pair
from leiden_cuda_ray.stages.edges import canonicalize_edges


def _rand_edges(n=30_000, V=800, seed=3, unit=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, V, n).astype(np.int64)
    dst = rng.integers(0, V, n).astype(np.int64)
    w = (np.ones(n) if unit
         else rng.integers(1, 5, n).astype(np.float64))
    return src, dst, w


@pytest.mark.parametrize("unit", [True, False])
@pytest.mark.parametrize("sum_weights", [True, False])
def test_canonicalize_fused_matches_pair_path(unit, sum_weights):
    src, dst, w = _rand_edges(unit=unit)
    V = 800
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst,
                                 "weight": w})).repartition(7)
    a = (canonicalize_edges(ds, sum_weights=sum_weights).to_pandas()
         .sort_values(["src", "dst"]).reset_index(drop=True))
    b = (canonicalize_edges(ds, sum_weights=sum_weights, V=V).to_pandas()
         .sort_values(["src", "dst"]).reset_index(drop=True))
    assert a.equals(b)
    assert (b["src"] <= b["dst"]).all()


@pytest.mark.parametrize("use_v", [True, False])
def test_canonicalize_directed_distinct(use_v):
    src, dst, w = _rand_edges(n=20_000, V=300, seed=11)
    V = 300
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst,
                                 "weight": w})).repartition(6)
    out = (canonicalize_edges(ds, sum_weights=True,
                              V=V if use_v else None, directed=True)
           .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True))
    # oracle: pandas groupby on the ordered pair
    import pandas as pd
    exp = (pd.DataFrame({"src": src, "dst": dst, "weight": w})
           .groupby(["src", "dst"], as_index=False)["weight"].sum()
           .sort_values(["src", "dst"]).reset_index(drop=True))
    assert np.array_equal(out["src"].to_numpy(), exp["src"].to_numpy())
    assert np.array_equal(out["dst"].to_numpy(), exp["dst"].to_numpy())
    assert np.allclose(out["weight"].to_numpy(), exp["weight"].to_numpy())
    # direction preserved: (a, b) and (b, a) stay distinct rows
    assert not (out["src"] <= out["dst"]).all()


def _global_rows(g):
    parts = ray.get(g.parts)
    return (np.concatenate([row_ids(p) for p in parts]),
            np.concatenate([p["indices"] for p in parts]),
            np.concatenate([p["weights"] for p in parts]),
            np.concatenate([p["deg_w"] for p in parts]),
            np.concatenate([p["self_w"] for p in parts]))


@pytest.mark.parametrize("unit", [True, False])
def test_build_from_dataset_matches_in_memory(unit):
    src, dst, w = _rand_edges(unit=unit, seed=9)
    V = 800
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst,
                                 "weight": w})).repartition(5)
    g = build_graph_from_dataset(ds, V)
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    cs, cd, cw = segsum_by_pair(lo, hi, w)
    g2 = build_graph_from_arrays(cs, cd, cw, V=V)
    assert g.m == g2.m and g.sym_edges == g2.sym_edges
    for x, y in zip(_global_rows(g), _global_rows(g2)):
        assert np.array_equal(x, y)


def test_fused_v_bound_guards_fire():
    t = pa.table({"src": np.array([0, 1, 5], np.int64),
                  "dst": np.array([1, 2, 3], np.int64),
                  "weight": np.ones(3)})
    ds = rd.from_arrow(t)
    assert canonicalize_edges(ds, V=6).count() == 3
    with pytest.raises(Exception, match="would collide"):
        canonicalize_edges(ds, V=4).materialize()
    with pytest.raises(Exception, match="would collide"):
        ray.get(build_graph_from_dataset(ds, V=4).parts)


def test_plan_map_groups_splits_and_balances():
    # one giant block + many small ones: no group should carry more than
    # ~2x the mean row load once the giant is sliced
    meta = [("big", 1_000_000)] + [(f"s{i}", 10_000) for i in range(20)]
    groups = _plan_map_groups(meta, 8)
    loads = []
    for g in groups:
        load = 0
        for ref, sl in g:
            n = dict(meta)[ref]
            load += (sl[1] - sl[0]) if sl is not None else n
        loads.append(load)
    total = sum(n for _, n in meta)
    assert sum(loads) == total
    assert max(loads) <= 2 * total / 8
    # every slice of the big block is disjoint and covers it exactly
    slices = sorted(sl for g in groups for ref, sl in g if ref == "big")
    assert slices[0][0] == 0 and slices[-1][1] == 1_000_000
    for (a, b), (c, d) in zip(slices, slices[1:]):
        assert b == c
