"""Checkpoint/resume: kill after superstep k, resume, identical final state
(FIXTURES.md checkpoint manifest fixture)."""

import json
import os

import numpy as np
import pytest
import ray

from leiden_cuda_ray.algorithms.leiden import CheckpointCrash, leiden
from leiden_cuda_ray.config import LeidenConfig
from leiden_cuda_ray.graph.build import build_graph_from_arrays
from leiden_cuda_ray.sources.fixtures import clique_ring_edges
from leiden_cuda_ray.state.checkpoint import Checkpointer


def _final(refs):
    return np.concatenate(ray.get(refs))


def test_kill_and_resume_bitwise_identical(tmp_path):
    src, dst, w = clique_ring_edges()
    cfg = LeidenConfig(gamma=0.1)

    g1 = build_graph_from_arrays(src, dst, w, P=2)
    refs, info = leiden(g1, cfg)
    expected = _final(refs)

    # every level drains in one pass now (sequential queue), so the run
    # publishes one checkpoint per level — crash at the first one
    ck = Checkpointer(str(tmp_path), "leiden")
    g2 = build_graph_from_arrays(src, dst, w, P=2)
    with pytest.raises(CheckpointCrash):
        leiden(g2, cfg, checkpointer=ck, crash_after=1)

    man = ck.latest()
    assert man is not None and man["algorithm"] == "leiden"
    assert set(man) >= {"level", "superstep", "partition_lineage", "metrics"}
    # every lineage file exists (torn writes never published)
    for path in man["partition_lineage"].values():
        assert os.path.exists(path)

    g3 = build_graph_from_arrays(src, dst, w, P=2)
    refs3, info3 = leiden(g3, cfg, checkpointer=ck, resume=True)
    assert np.array_equal(_final(refs3), expected)


def test_resume_mid_coarse_level(tmp_path):
    """Crash deep enough that resume starts at a coarse level (level >= 1)."""
    src, dst, w = clique_ring_edges()
    cfg = LeidenConfig(gamma=0.1)

    g1 = build_graph_from_arrays(src, dst, w, P=2)
    expected = _final(leiden(g1, cfg)[0])

    # count level-0 checkpoints of a full run, then crash one superstep
    # into level 1
    ck_probe = Checkpointer(str(tmp_path / "probe"), "leiden")
    g2 = build_graph_from_arrays(src, dst, w, P=2)
    leiden(g2, cfg, checkpointer=ck_probe)
    lvl = 0
    while os.path.isdir(ck_probe.dir + f"/level_{lvl}"):
        lvl += 1
    assert lvl >= 2, "fixture should coarsen at least once"
    level0_states = len([d for d in os.listdir(ck_probe.dir + "/level_0")
                         if d.startswith("state_")])

    ck = Checkpointer(str(tmp_path / "real"), "leiden")
    g3 = build_graph_from_arrays(src, dst, w, P=2)
    with pytest.raises(CheckpointCrash):
        leiden(g3, cfg, checkpointer=ck, crash_after=level0_states + 1)
    assert ck.latest()["level"] >= 1

    g4 = build_graph_from_arrays(src, dst, w, P=2)
    refs4, _ = leiden(g4, cfg, checkpointer=ck, resume=True)
    assert np.array_equal(_final(refs4), expected)


def test_pagerank_checkpoint_resume(tmp_path):
    from leiden_cuda_ray.algorithms.pagerank import pagerank
    from leiden_cuda_ray.config import PageRankConfig

    src, dst, w = clique_ring_edges()
    g = build_graph_from_arrays(src, dst, w, P=2)
    full, iters, _ = pagerank(g)
    expected = _final(full)

    # run only a few iterations with checkpointing, then resume to the end
    ck = Checkpointer(str(tmp_path), "pagerank")
    g2 = build_graph_from_arrays(src, dst, w, P=2)
    pagerank(g2, PageRankConfig(max_iterations=6), checkpointer=ck,
             checkpoint_every=2)
    man = ck.latest()
    assert man is not None and man["superstep"] == 6

    g3 = build_graph_from_arrays(src, dst, w, P=2)
    resumed, it3, err3 = pagerank(g3, checkpointer=ck, resume=True)
    assert it3 == iters  # same trajectory, same convergence step
    assert np.allclose(_final(resumed), expected, atol=0, rtol=0)


def test_checkpointed_run_unchanged(tmp_path):
    """Checkpointing must not perturb the result."""
    src, dst, w = clique_ring_edges()
    cfg = LeidenConfig(gamma=0.05)
    g1 = build_graph_from_arrays(src, dst, w, P=2)
    expected = _final(leiden(g1, cfg)[0])
    ck = Checkpointer(str(tmp_path), "leiden")
    g2 = build_graph_from_arrays(src, dst, w, P=2)
    got = _final(leiden(g2, cfg, checkpointer=ck)[0])
    assert np.array_equal(got, expected)
    assert ck.latest()["metrics"]["active"] == 0  # converged state published


def test_kill_and_resume_via_shared_uri_root(tmp_path):
    """Cluster-safe storage: the checkpoint root given as a filesystem URI
    (file://) must behave identically to a plain path — all reads/writes go
    through the pyarrow filesystem handle inside remote tasks, the shape a
    multi-node shared store (s3://...) needs."""
    src, dst, w = clique_ring_edges()
    cfg = LeidenConfig(gamma=0.1)

    g1 = build_graph_from_arrays(src, dst, w, P=2)
    expected = _final(leiden(g1, cfg)[0])

    root = f"file://{tmp_path}/uri_ckpt"
    os.makedirs(f"{tmp_path}/uri_ckpt", exist_ok=True)
    ck = Checkpointer(root, "leiden")
    g2 = build_graph_from_arrays(src, dst, w, P=2)
    with pytest.raises(CheckpointCrash):
        leiden(g2, cfg, checkpointer=ck, crash_after=1)
    assert ck.latest() is not None

    g3 = build_graph_from_arrays(src, dst, w, P=2)
    refs3, _ = leiden(g3, cfg, checkpointer=ck, resume=True)
    assert np.array_equal(_final(refs3), expected)


def _torus_edges(n=12):
    """Symmetric torus grid — limit-cycles under the fast mode's gating, so
    levels reliably enter the stall-guard LOCK fallback phase."""
    def vid(i, j):
        return (i % n) * n + (j % n)

    src, dst = [], []
    for i in range(n):
        for j in range(n):
            src += [vid(i, j), vid(i, j)]
            dst += [vid(i + 1, j), vid(i, j + 1)]
    return (np.asarray(src, np.int64), np.asarray(dst, np.int64),
            np.ones(len(src), np.float64))


class _SpyCheckpointer(Checkpointer):
    def __init__(self, *a):
        super().__init__(*a)
        self.phases = []

    def save_superstep(self, level, step, graph, states, metrics):
        self.phases.append(metrics.get("phase"))
        super().save_superstep(level, step, graph, states, metrics)


def test_resume_at_stall_point_enters_drain(tmp_path, monkeypatch):
    """Production path for V in (SEQ_V_MAX, LOCK_DRAIN_V_MAX]: fast
    supersteps -> stall guard -> in-process drain. Crash at the LAST
    fast-phase checkpoint (the stall step): resume must restore the
    loop-control state, detect the stall WITHOUT applying another fast
    superstep, and re-drain to the uninterrupted result bit-identically."""
    from leiden_cuda_ray.algorithms import moving

    monkeypatch.setattr(moving, "SEQ_V_MAX", 0)  # keep fast-first
    src, dst, w = _torus_edges()
    cfg = LeidenConfig(gamma=0.05)

    g1 = build_graph_from_arrays(src, dst, w, P=2)
    expected = _final(leiden(g1, cfg)[0])

    probe = _SpyCheckpointer(str(tmp_path / "probe"), "leiden")
    g2 = build_graph_from_arrays(src, dst, w, P=2)
    leiden(g2, cfg, checkpointer=probe)
    assert "fast" in probe.phases and "lock" in probe.phases
    crash_at = probe.phases.index("lock")  # last fast ckpt = stall step
    assert probe.phases[crash_at - 1] == "fast"

    ck = Checkpointer(str(tmp_path / "real"), "leiden")
    g3 = build_graph_from_arrays(src, dst, w, P=2)
    with pytest.raises(CheckpointCrash):
        leiden(g3, cfg, checkpointer=ck, crash_after=crash_at)
    assert ck.latest()["metrics"]["phase"] == "fast"

    g4 = build_graph_from_arrays(src, dst, w, P=2)
    refs4, _ = leiden(g4, cfg, checkpointer=ck, resume=True)
    assert np.array_equal(_final(refs4), expected)


def test_resume_inside_distributed_lock_loop(tmp_path, monkeypatch):
    """V above LOCK_DRAIN_V_MAX (forced via monkeypatch): the stall
    fallback runs the DISTRIBUTED claims loop — the 100-TB-scale shape —
    which checkpoints every lock superstep. Crash inside that loop (past
    its first superstep) and resume bit-identically; pins that the
    claims-loop state sequence itself is resumable, not just the
    in-process drain's single drain-end checkpoint."""
    from leiden_cuda_ray.algorithms import moving

    monkeypatch.setattr(moving, "SEQ_V_MAX", 0)
    monkeypatch.setattr(moving, "LOCK_DRAIN_V_MAX", 0)
    src, dst, w = _torus_edges()
    cfg = LeidenConfig(gamma=0.05)

    g1 = build_graph_from_arrays(src, dst, w, P=2)
    expected = _final(leiden(g1, cfg)[0])

    probe = _SpyCheckpointer(str(tmp_path / "probe"), "leiden")
    g2 = build_graph_from_arrays(src, dst, w, P=2)
    leiden(g2, cfg, checkpointer=probe)
    assert probe.phases.count("lock") >= 2, \
        "distributed lock loop must checkpoint per superstep"
    # crash strictly inside the lock loop: after its second checkpoint
    crash_at = probe.phases.index("lock") + 2

    ck = Checkpointer(str(tmp_path / "real"), "leiden")
    g3 = build_graph_from_arrays(src, dst, w, P=2)
    with pytest.raises(CheckpointCrash):
        leiden(g3, cfg, checkpointer=ck, crash_after=crash_at)
    assert ck.latest()["metrics"]["phase"] == "lock"

    g4 = build_graph_from_arrays(src, dst, w, P=2)
    refs4, _ = leiden(g4, cfg, checkpointer=ck, resume=True)
    assert np.array_equal(_final(refs4), expected)


def test_resume_mid_lock_fallback_phase(tmp_path):
    """Crash INSIDE the stall-guard lock-fallback phase; resume must
    re-enter the lock loop (phase recorded in the manifest metrics) and
    reproduce the uninterrupted result bit-identically."""
    src, dst, w = _torus_edges()
    cfg = LeidenConfig(gamma=0.05)

    g1 = build_graph_from_arrays(src, dst, w, P=2)
    expected = _final(leiden(g1, cfg)[0])

    probe = _SpyCheckpointer(str(tmp_path / "probe"), "leiden")
    g2 = build_graph_from_arrays(src, dst, w, P=2)
    leiden(g2, cfg, checkpointer=probe)
    assert "lock" in probe.phases, "fixture must trigger the lock fallback"
    # the sequential lock drain publishes ONE drain-end checkpoint per
    # level: crash exactly at the first lock-phase checkpoint, so resume
    # re-enters the lock phase on the drained state
    crash_at = probe.phases.index("lock") + 1

    ck = Checkpointer(str(tmp_path / "real"), "leiden")
    g3 = build_graph_from_arrays(src, dst, w, P=2)
    with pytest.raises(CheckpointCrash):
        leiden(g3, cfg, checkpointer=ck, crash_after=crash_at)
    assert ck.latest()["metrics"]["phase"] == "lock"

    g4 = build_graph_from_arrays(src, dst, w, P=2)
    refs4, _ = leiden(g4, cfg, checkpointer=ck, resume=True)
    assert np.array_equal(_final(refs4), expected)


@pytest.mark.parametrize("P", [1, 3])
def test_ktruss_resume_after_round_budget(tmp_path, P):
    """A peel killed by its round budget must resume from the saved
    subgraph and converge to the identical edge set + supports."""
    import numpy as np

    from leiden_cuda_ray.algorithms.trisupport import ktruss
    from leiden_cuda_ray.graph.build import build_graph_from_arrays

    rng = np.random.RandomState(4)
    V, E = 50, 300
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    m = src != dst
    pairs = np.unique(np.stack([np.minimum(src, dst)[m],
                                np.maximum(src, dst)[m]], 1), axis=0)
    src, dst = pairs[:, 0].copy(), pairs[:, 1].copy()
    w = np.ones(len(src))

    def fresh():
        return build_graph_from_arrays(src, dst, w, P=P)

    ref, _ = ktruss(fresh(), k=4)  # uninterrupted run (converges in 6)
    want = ref.to_pandas().sort_values(["src", "dst"]).reset_index(
        drop=True)

    ck = Checkpointer(str(tmp_path / f"kt{P}"), "ktruss")
    with pytest.raises(ValueError, match="did not converge"):
        ktruss(fresh(), k=4, max_rounds=2, checkpointer=ck)
    man = ck.latest()
    assert man is not None and man["level"] == 2
    assert man["metrics"]["converged"] is False

    res, rounds = ktruss(fresh(), k=4, checkpointer=ck, resume=True)
    got = res.to_pandas().sort_values(["src", "dst"]).reset_index(
        drop=True)
    assert got.equals(want)
    # absolute round numbering continued from the checkpoint (the full
    # peel converges at round 6; this process ran only rounds 3..6)
    assert rounds == 6

    # converged manifest: a further resume does one support pass only
    res2, rounds2 = ktruss(fresh(), k=4, checkpointer=ck, resume=True)
    assert rounds2 == 1
    got2 = res2.to_pandas().sort_values(["src", "dst"]).reset_index(
        drop=True)
    assert got2.equals(want)
