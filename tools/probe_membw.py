"""Memory-bandwidth ceiling probe for the 8->32 strong-scaling leg.

Launches C concurrent worker processes, each streaming a private float64
array through a sum-reduction (the same read-dominated access pattern as
the engine's segment-reduction kernels), and reports the per-worker and
aggregate effective bandwidth at each concurrency level.

Evidence use: if per-worker GB/s at C=32 drops by ~ the same factor as the
engine's per-task kernel-second inflation at P=32 vs P=8 (ray.timeline
probe, tools/probe_scaling.py), the 8->32 efficiency floor is the box's
physical memory-bandwidth ceiling — a resource a real 4x cluster scales
with node count, but a single host cannot.

Usage: python tools/probe_membw.py [conc ...]   (default: 8 32)
"""
import json
import multiprocessing as mp
import sys
import time

import numpy as np

N = 64 * 1024 * 1024          # 512 MB of float64 per worker
REPS = 6


def _worker(q):
    a = np.ones(N, np.float64)
    a.sum()                    # fault pages + warm
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(REPS):
        s += a.sum()
    dt = time.perf_counter() - t0
    q.put((REPS * a.nbytes / dt / 1e9, s))


def measure(conc: int) -> dict:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(q,)) for _ in range(conc)]
    for p in procs:
        p.start()
    rates = [q.get()[0] for _ in procs]
    for p in procs:
        p.join()
    return {
        "conc": conc,
        "per_worker_gbps": round(float(np.median(rates)), 2),
        "aggregate_gbps": round(float(np.sum(rates)), 1),
        "min_gbps": round(float(np.min(rates)), 2),
        "max_gbps": round(float(np.max(rates)), 2),
    }


if __name__ == "__main__":
    levels = [int(x) for x in sys.argv[1:]] or [8, 32]
    out = [measure(c) for c in levels]
    if len(out) >= 2:
        lo, hi = out[0], out[-1]
        out.append({
            "per_worker_drop": round(
                lo["per_worker_gbps"] / hi["per_worker_gbps"], 2),
            "aggregate_gain": round(
                hi["aggregate_gbps"] / lo["aggregate_gbps"], 2),
        })
    print(json.dumps(out))
