"""Per-superstep checkpointing + resume (north-rule; no reference analogue —
the reference has no fault tolerance at all, SURVEY.md §4).

Layout under <root>/<algorithm>/:
    level_<L>/graph/part_<pid>.parquet   symmetrized edge rows of partition pid
    level_<L>/graph_meta.json            {V, P, block, m, sym_edges}
    level_<L>/state_<S>/part_<pid>.parquet  vertex state after superstep S
    level_<L>/map/part_<pid>.parquet     dendrogram level-map slices + meta
    manifest.json                        latest complete checkpoint pointer:
        {algorithm, level, superstep, partition_lineage {pid: file},
         metrics {moves, active, ...loop-control state}}

CLUSTER-SAFE STORAGE: the root may be any pyarrow-filesystem URI
("file:///shared/ckpt", "s3://bucket/ckpt", ...) or a plain local path.
Every write/read happens inside remote tasks through the SAME filesystem
handle (pyarrow FileSystem objects are picklable), so on a multi-node
cluster the tasks all target the shared store — nothing assumes the
driver's local disk. The single-node /tmp default remains for the sandbox.

Writes are per-partition parallel remote tasks; the manifest is written
last (tmp + move — atomic on local/posix filesystems, last-writer-wins on
object stores), so a torn run never publishes an incomplete superstep —
resume reads the manifest and loads exactly the files it names.
"""

from __future__ import annotations

import json
import posixpath

import numpy as np
import pyarrow as pa
import pyarrow.fs as pafs
import pyarrow.parquet as pq
import ray

from leiden_cuda_ray.graph.build import Graph
from leiden_cuda_ray.graph.csr import build_partition_csr, part_range


def _fs_for(root: str):
    """URI or local path → (FileSystem, fs-relative root path)."""
    if "://" in root:
        return pafs.FileSystem.from_uri(root)
    return pafs.LocalFileSystem(), root


def _write_table(fs, path, t: pa.Table):
    tmp = path + ".tmp"
    with fs.open_output_stream(tmp) as f:
        pq.write_table(t, f)
    fs.move(tmp, path)


def _read_pq(fs, path) -> pa.Table:
    with fs.open_input_file(path) as f:
        return pq.read_table(f)


@ray.remote
def _write_state_part(fs, path, vlo, state):
    ids = np.arange(vlo, vlo + len(state["comm"]), dtype=np.int64)
    t = pa.table({
        "vertex": pa.array(ids, pa.int64()),
        "community": pa.array(state["comm"], pa.int64()),
        "agg_count": pa.array(state["agg"], pa.int64()),
        "active": pa.array(state["active"], pa.bool_()),
    })
    _write_table(fs, path, t)
    return path


@ray.remote
def _read_state_part(fs, path):
    t = _read_pq(fs, path)
    return {
        "comm": np.asarray(t.column("community"), np.int64).copy(),
        "agg": np.asarray(t.column("agg_count"), np.int64).copy(),
        "active": np.asarray(t.column("active")).copy(),
    }


@ray.remote
def _write_graph_part(fs, path, csr):
    from leiden_cuda_ray.algorithms.common import local_src_per_slot

    src = local_src_per_slot(csr) + csr["vlo"]
    t = pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(csr["indices"], pa.int64()),
        "weight": pa.array(csr["weights"], pa.float64()),
    })
    _write_table(fs, path, t)
    return path


@ray.remote
def _read_graph_part(fs, path, vlo, vhi):
    t = _read_pq(fs, path)
    return build_partition_csr(
        np.asarray(t.column("src"), np.int64),
        np.asarray(t.column("dst"), np.int64),
        np.asarray(t.column("weight"), np.float64), vlo, vhi)


@ray.remote
def _write_vector_part(fs, path, vlo, arr, column):
    ids = np.arange(vlo, vlo + len(arr), dtype=np.int64)
    t = pa.table({"vertex": pa.array(ids, pa.int64()),
                  column: pa.array(arr)})
    _write_table(fs, path, t)
    return path


@ray.remote
def _read_vector_part(fs, path, column):
    return np.asarray(_read_pq(fs, path).column(column)).copy()


@ray.remote
def _write_map(fs, path, arr):
    _write_table(fs, path, pa.table({"coarse": pa.array(arr, pa.int64())}))
    return path


@ray.remote
def _read_map(fs, path):
    return np.asarray(_read_pq(fs, path).column("coarse"), np.int64).copy()


class Checkpointer:
    def __init__(self, root_dir: str, algorithm: str):
        self.fs, root = _fs_for(root_dir)
        self.dir = posixpath.join(root, algorithm)
        self.algorithm = algorithm
        self.fs.create_dir(self.dir, recursive=True)

    def _exists(self, path) -> bool:
        return self.fs.get_file_info(path).type != pafs.FileType.NotFound

    def _put_json(self, path, obj):
        tmp = path + ".tmp"
        with self.fs.open_output_stream(tmp) as f:
            f.write(json.dumps(obj, indent=1).encode())
        self.fs.move(tmp, path)

    def _get_json(self, path):
        with self.fs.open_input_stream(path) as f:
            return json.loads(f.read().decode())

    # --- manifest ---------------------------------------------------------
    def _manifest_path(self):
        return posixpath.join(self.dir, "manifest.json")

    def latest(self) -> dict | None:
        p = self._manifest_path()
        if not self._exists(p):
            return None
        return self._get_json(p)

    def _publish(self, manifest: dict):
        self._put_json(self._manifest_path(), manifest)

    # --- level graph ------------------------------------------------------
    def save_level_graph(self, level: int, graph: Graph):
        gdir = posixpath.join(self.dir, f"level_{level}", "graph")
        self.fs.create_dir(gdir, recursive=True)
        blk = graph.block
        meta = {"V": graph.V, "P": graph.P,
                "block": blk.tolist() if isinstance(blk, np.ndarray)
                else blk,
                "m": graph.m, "sym_edges": graph.sym_edges}
        paths = ray.get([
            _write_graph_part.remote(
                self.fs, posixpath.join(gdir, f"part_{i}.parquet"),
                graph.parts[i])
            for i in range(graph.P)
        ])
        self._put_json(posixpath.join(self.dir, f"level_{level}",
                                      "graph_meta.json"), meta)
        return paths

    def load_level_graph(self, level: int) -> Graph:
        ldir = posixpath.join(self.dir, f"level_{level}")
        meta = self._get_json(posixpath.join(ldir, "graph_meta.json"))
        blk = meta["block"]
        if isinstance(blk, list):
            blk = np.asarray(blk, np.int64)
        parts = [
            _read_graph_part.remote(
                self.fs,
                posixpath.join(ldir, "graph", f"part_{i}.parquet"),
                *part_range(i, blk, meta["P"], meta["V"]))
            for i in range(meta["P"])
        ]
        return Graph(V=meta["V"], P=meta["P"], block=blk,
                     parts=parts, m=meta["m"], sym_edges=meta["sym_edges"])

    def save_round_graph(self, round_no: int, graph: Graph,
                         metrics: dict):
        """Checkpoint an edge-peeling round: the surviving SUBGRAPH is
        the whole state (k-truss and similar peels carry no per-vertex
        vectors between rounds). Graph parts written first, manifest
        published last — a torn round never resumes."""
        self.save_level_graph(round_no, graph)
        self._publish({
            "algorithm": self.algorithm,
            "level": round_no,
            "superstep": 0,
            "partition_lineage": {},
            "metrics": metrics,
        })

    # --- superstep state --------------------------------------------------
    def save_superstep(self, level: int, superstep: int, graph: Graph,
                       states: list, metrics: dict):
        sdir = posixpath.join(self.dir, f"level_{level}",
                              f"state_{superstep}")
        self.fs.create_dir(sdir, recursive=True)
        lineage = {}
        writes = []
        for i in range(graph.P):
            path = posixpath.join(sdir, f"part_{i}.parquet")
            lineage[str(i)] = path
            writes.append(_write_state_part.remote(
                self.fs, path, graph.ranges()[i][0], states[i]))
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
        return [_read_state_part.remote(self.fs, path)
                for _, path in sorted(man["partition_lineage"].items(),
                                      key=lambda kv: int(kv[0]))]

    # --- generic per-vertex vector state (pagerank ranks, cc labels, ...) -
    def save_vector(self, superstep: int, graph: Graph, refs: list,
                    column: str, metrics: dict):
        sdir = posixpath.join(self.dir, f"state_{superstep}")
        self.fs.create_dir(sdir, recursive=True)
        lineage = {}
        writes = []
        for i in range(graph.P):
            path = posixpath.join(sdir, f"part_{i}.parquet")
            lineage[str(i)] = path
            writes.append(_write_vector_part.remote(
                self.fs, path, graph.ranges()[i][0], refs[i], column))
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
        refs = [_read_vector_part.remote(self.fs, path, column)
                for _, path in sorted(man["partition_lineage"].items(),
                                      key=lambda kv: int(kv[0]))]
        return refs, man

    # --- dendrogram maps --------------------------------------------------
    def save_map(self, level: int, lm):
        """Persist a coarsen.LevelMap: per-old-partition slices + meta."""
        mdir = posixpath.join(self.dir, f"level_{level}", "map")
        self.fs.create_dir(mdir, recursive=True)
        writes = [
            _write_map.remote(self.fs,
                              posixpath.join(mdir, f"part_{i}.parquet"),
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
        self._put_json(posixpath.join(mdir, "meta.json"), meta)

    def load_map(self, level: int):
        from leiden_cuda_ray.algorithms.coarsen import LevelMap

        mdir = posixpath.join(self.dir, f"level_{level}", "map")
        meta = self._get_json(posixpath.join(mdir, "meta.json"))
        for k in ("old_block", "new_block"):
            if isinstance(meta[k], list):
                meta[k] = np.asarray(meta[k], np.int64)
        maps = [
            _read_map.remote(self.fs,
                             posixpath.join(mdir, f"part_{i}.parquet"))
            for i in range(meta["old_P"])
        ]
        # uniq_refs/offsets are only needed at coarsen time, not for
        # propagation on resume
        return LevelMap(maps=maps, **meta)

    def has_map(self, level: int) -> bool:
        return self._exists(
            posixpath.join(self.dir, f"level_{level}", "map", "meta.json"))
