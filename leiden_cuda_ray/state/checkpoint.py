"""Per-superstep checkpointing + resume (north-rule; no reference analogue —
the reference has no fault tolerance at all, SURVEY.md §4).

Layout under <root>/<algorithm>/:
    level_<L>/graph/part_<pid>.parquet   symmetrized edge rows of partition pid
    level_<L>/graph_meta.json            {V, P, block, m, sym_edges}
    level_<L>/init/part_<pid>.parquet    initial comm/agg per partition
    level_<L>/state_<S>/part_<pid>.parquet  vertex state after superstep S
    level_<L>/map.parquet                vertex -> coarse id (dendrogram level)
    manifest.json                        latest complete checkpoint pointer:
        {algorithm, level, superstep, partition_lineage {pid: file},
         metrics {moves, active}, levels_done}

Writes are per-partition parallel remote tasks; the manifest is written last
(atomic rename), so a torn run never publishes an incomplete superstep —
resume reads the manifest and loads exactly the files it names.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.csr import build_partition_csr, part_range


@ray.remote
def _write_state_part(path, vlo, state):
    ids = np.arange(vlo, vlo + len(state["comm"]), dtype=np.int64)
    t = pa.table({
        "vertex": pa.array(ids, pa.int64()),
        "community": pa.array(state["comm"], pa.int64()),
        "agg_count": pa.array(state["agg"], pa.int64()),
        "active": pa.array(state["active"], pa.bool_()),
    })
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


@ray.remote
def _read_state_part(path):
    t = pq.read_table(path)
    return {
        "comm": np.asarray(t.column("community"), np.int64).copy(),
        "agg": np.asarray(t.column("agg_count"), np.int64).copy(),
        "active": np.asarray(t.column("active")).copy(),
    }


@ray.remote
def _write_graph_part(path, csr):
    from leiden_cuda_ray.algorithms.common import local_src_per_slot

    src = local_src_per_slot(csr) + csr["vlo"]
    t = pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(csr["indices"], pa.int64()),
        "weight": pa.array(csr["weights"], pa.float64()),
    })
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


@ray.remote
def _read_graph_part(path, vlo, vhi):
    t = pq.read_table(path)
    return build_partition_csr(
        np.asarray(t.column("src"), np.int64),
        np.asarray(t.column("dst"), np.int64),
        np.asarray(t.column("weight"), np.float64), vlo, vhi)


@ray.remote
def _write_vector_part(path, vlo, arr, column):
    ids = np.arange(vlo, vlo + len(arr), dtype=np.int64)
    t = pa.table({"vertex": pa.array(ids, pa.int64()),
                  column: pa.array(arr)})
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


@ray.remote
def _read_vector_part(path, column):
    t = pq.read_table(path)
    return np.asarray(t.column(column)).copy()


@ray.remote
def _write_map(path, arr):
    t = pa.table({"coarse": pa.array(arr, pa.int64())})
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


@ray.remote
def _read_map(path):
    return np.asarray(pq.read_table(path).column("coarse"), np.int64).copy()


class Checkpointer:
    def __init__(self, root_dir: str, algorithm: str):
        self.dir = os.path.join(root_dir, algorithm)
        self.algorithm = algorithm
        os.makedirs(self.dir, exist_ok=True)

    # --- manifest ---------------------------------------------------------
    def _manifest_path(self):
        return os.path.join(self.dir, "manifest.json")

    def latest(self) -> dict | None:
        p = self._manifest_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _publish(self, manifest: dict):
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path())

    # --- level graph ------------------------------------------------------
    def save_level_graph(self, level: int, graph: Graph):
        gdir = os.path.join(self.dir, f"level_{level}", "graph")
        os.makedirs(gdir, exist_ok=True)
        blk = graph.block
        meta = {"V": graph.V, "P": graph.P,
                "block": blk.tolist() if isinstance(blk, np.ndarray)
                else blk,
                "m": graph.m, "sym_edges": graph.sym_edges}
        paths = ray.get([
            _write_graph_part.remote(
                os.path.join(gdir, f"part_{i}.parquet"), graph.parts[i])
            for i in range(graph.P)
        ])
        with open(os.path.join(self.dir, f"level_{level}",
                               "graph_meta.json"), "w") as f:
            json.dump(meta, f)
        return paths

    def load_level_graph(self, level: int) -> Graph:
        ldir = os.path.join(self.dir, f"level_{level}")
        with open(os.path.join(ldir, "graph_meta.json")) as f:
            meta = json.load(f)
        blk = meta["block"]
        if isinstance(blk, list):
            blk = np.asarray(blk, np.int64)
        parts = [
            _read_graph_part.remote(
                os.path.join(ldir, "graph", f"part_{i}.parquet"),
                *part_range(i, blk, meta["P"], meta["V"]))
            for i in range(meta["P"])
        ]
        return Graph(V=meta["V"], P=meta["P"], block=blk,
                     parts=parts, m=meta["m"], sym_edges=meta["sym_edges"])

    # --- superstep state --------------------------------------------------
    def save_superstep(self, level: int, superstep: int, graph: Graph,
                       states: list, metrics: dict):
        sdir = os.path.join(self.dir, f"level_{level}", f"state_{superstep}")
        os.makedirs(sdir, exist_ok=True)
        lineage = {}
        writes = []
        for i in range(graph.P):
            path = os.path.join(sdir, f"part_{i}.parquet")
            lineage[str(i)] = path
            writes.append(_write_state_part.remote(
                path, graph.ranges()[i][0], states[i]))
        ray.get(writes)
        self._publish({
            "algorithm": self.algorithm,
            "level": level,
            "superstep": superstep,
            "partition_lineage": lineage,
            "metrics": metrics,
        })

    def load_states(self, level: int, superstep: int) -> list:
        man = self.latest()
        assert man and man["level"] == level and man["superstep"] == superstep
        return [_read_state_part.remote(path)
                for _, path in sorted(man["partition_lineage"].items(),
                                      key=lambda kv: int(kv[0]))]

    # --- generic per-vertex vector state (pagerank ranks, cc labels, ...) -
    def save_vector(self, superstep: int, graph: Graph, refs: list,
                    column: str, metrics: dict):
        sdir = os.path.join(self.dir, f"state_{superstep}")
        os.makedirs(sdir, exist_ok=True)
        lineage = {}
        writes = []
        for i in range(graph.P):
            path = os.path.join(sdir, f"part_{i}.parquet")
            lineage[str(i)] = path
            writes.append(_write_vector_part.remote(
                path, graph.ranges()[i][0], refs[i], column))
        ray.get(writes)
        self._publish({
            "algorithm": self.algorithm,
            "level": 0,
            "superstep": superstep,
            "partition_lineage": lineage,
            "metrics": metrics,
        })

    def load_vector(self, column: str) -> tuple[list, dict] | None:
        man = self.latest()
        if man is None:
            return None
        refs = [_read_vector_part.remote(path, column)
                for _, path in sorted(man["partition_lineage"].items(),
                                      key=lambda kv: int(kv[0]))]
        return refs, man

    # --- dendrogram maps --------------------------------------------------
    def save_map(self, level: int, lm):
        """Persist a coarsen.LevelMap: per-old-partition slices + meta."""
        mdir = os.path.join(self.dir, f"level_{level}", "map")
        os.makedirs(mdir, exist_ok=True)
        writes = [
            _write_map.remote(os.path.join(mdir, f"part_{i}.parquet"),
                              lm.maps[i])
            for i in range(lm.old_P)
        ]
        blk_o, blk_n = lm.old_block, lm.new_block
        meta = {
            "old_block": blk_o.tolist() if isinstance(blk_o, np.ndarray)
            else blk_o,
            "old_P": lm.old_P, "old_V": lm.old_V,
            "new_block": blk_n.tolist() if isinstance(blk_n, np.ndarray)
            else blk_n,
            "new_P": lm.new_P, "new_V": lm.new_V,
        }
        ray.get(writes)
        with open(os.path.join(mdir, "meta.json"), "w") as f:
            json.dump(meta, f)

    def load_map(self, level: int):
        from leiden_cuda_ray.algorithms.coarsen import LevelMap

        mdir = os.path.join(self.dir, f"level_{level}", "map")
        with open(os.path.join(mdir, "meta.json")) as f:
            meta = json.load(f)
        for k in ("old_block", "new_block"):
            if isinstance(meta[k], list):
                meta[k] = np.asarray(meta[k], np.int64)
        maps = [
            _read_map.remote(os.path.join(mdir, f"part_{i}.parquet"))
            for i in range(meta["old_P"])
        ]
        # uniq_refs/offsets are only needed at coarsen time, not for
        # propagation on resume
        return LevelMap(maps=maps, **meta)

    def has_map(self, level: int) -> bool:
        return os.path.exists(
            os.path.join(self.dir, f"level_{level}", "map", "meta.json"))
