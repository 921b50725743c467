"""Timeline probe: in-task busy time vs wall during Leiden local moving.

Runs the headline local-moving loop warm at RAY_GRAFT_CPUS, dumps
ray.timeline(), and reports per-superstep wall, total task-execution
seconds inside the window, and implied utilization — the evidence for
where the 8->32 leg's efficiency goes.
"""
import json, os, sys, time
import numpy as np
import ray

cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ray.init(address="local", num_cpus=cpus, include_dashboard=False)
import ray.data

sys.path.insert(0, "/root/repo")
cache = "/tmp/graft_graph/edge_cache_sf0.1"
with open(cache + ".meta.json") as f:
    V = json.load(f)["V"]
edges = ray.data.read_parquet(cache)
from leiden_cuda_ray.graph.build import build_graph_from_dataset
from leiden_cuda_ray.algorithms.moving import init_move_state, run_local_moving
from leiden_cuda_ray.config import LeidenConfig

P_force = int(os.environ.get("GRAFT_FORCE_P", "0")) or None
graph = build_graph_from_dataset(edges, V, P=P_force, spill_dir=f"/tmp/graft_graph/probe_{cpus}")
ray.get(graph.parts)
cfg = LeidenConfig(gamma=0.05)

# warm-up reps
walls = []
for rep in range(1):
    t0 = time.perf_counter()
    states = [init_move_state.remote(graph.parts[i]) for i in range(graph.P)]
    states, mv, steps = run_local_moving(graph, states, "cpm", cfg.gamma,
                                         cfg.seed, cfg.max_supersteps,
                                         lock_fallback=False)
    ray.get(states)
    walls.append(time.perf_counter() - t0)
    if rep == 0:
        t_start_mark = time.time()
t_rep_start = time.time()
t0 = time.perf_counter()
states = [init_move_state.remote(graph.parts[i]) for i in range(graph.P)]
states, mv, steps = run_local_moving(graph, states, "cpm", cfg.gamma,
                                     cfg.seed, cfg.max_supersteps,
                                     lock_fallback=False)
ray.get(states)
wall = time.perf_counter() - t0
t_rep_end = time.time()

tl = ray.timeline()
# events: ts/dur in microseconds since epoch; cname, name, pid/tid
busy = 0.0      # pure kernel time: the leiden_cuda_ray.* function events
overhead = 0.0  # per-task runtime overhead: deserialize + store_outputs
n_tasks = 0
by_name = {}
for ev in tl:
    if ev.get("ph") != "X":
        continue
    ts = ev["ts"] / 1e6
    dur = ev.get("dur", 0) / 1e6
    if ts < t_rep_start or ts > t_rep_end:
        continue
    name = ev.get("name", "?")
    k = name.split("::")[-1][:40]
    if "leiden_cuda_ray" in name:
        busy += dur
        n_tasks += 1
    elif k in ("task:deserialize_arguments", "task:store_outputs"):
        overhead += dur
    a = by_name.setdefault(k, [0, 0.0])
    a[0] += 1; a[1] += dur
print(json.dumps({
    "cpus": cpus, "P": graph.P, "steps": steps, "warm_walls": [round(w, 3) for w in walls],
    "final_wall": round(wall, 3),
    "kernel_sec": round(busy, 2), "overhead_sec": round(overhead, 2),
    "kernel_events": n_tasks,
    "utilization": round(busy / (wall * cpus), 3),
    "per_step_ms": round(wall / steps * 1000, 1),
    "top": sorted(((v[1], v[0], k) for k, v in by_name.items()),
                   reverse=True)[:8],
}))
ray.shutdown()
