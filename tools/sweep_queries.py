"""Run every queries() entry against a testdata dir with per-query wall
times (the scale-tier robustness sweep; VERDICT r2 item 3, min-of-N +
canary added per VERDICT r4 item 4). Writes one JSON line per query so
a hung query still leaves a record.

This host swings 2–2.5× between bit-identical back-to-back runs
(memory-bandwidth co-tenancy — see BASELINE.md's membw probes), so a
single-timing sweep cannot tell an engine regression from weather:
each query runs `--reps N` times and the record carries every rep,
the MIN (the engine's honest cost), and a per-rep streaming-bandwidth
CANARY (GB/s of a fixed 256 MB numpy sum-reduction) — a slow rep with
a slow canary is weather; a slow rep with a fast canary is the engine.

Usage: PYTHONPATH=/root/repo python tools/sweep_queries.py \
           SF_DIR [OUT] [ONLY] [--reps N]
ONLY: comma-separated query-name substrings to include.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np
import ray
import ray.data

_CANARY_BUF = None


def canary_gbps() -> float:
    """Streaming-bandwidth canary: GB/s summing a fixed 256 MB buffer."""
    global _CANARY_BUF
    if _CANARY_BUF is None:
        _CANARY_BUF = np.ones(32 * 1024 * 1024, np.float64)  # 256 MB
    t0 = time.perf_counter()
    s = float(_CANARY_BUF.sum())
    dt = time.perf_counter() - t0
    assert s > 0
    return round(_CANARY_BUF.nbytes / dt / 1e9, 2)


def main(sf_dir: str, out_path: str, only: str | None = None,
         reps: int = 1) -> None:
    ray.init(address="local", num_cpus=32, include_dashboard=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    # "=name" selects exactly that query; bare patterns stay substrings
    pats = only.split(",") if only else None
    with open(out_path, "a") as out:
        for name, fn in entry.queries().items():
            if pats is not None and not any(
                    name == p[1:] if p.startswith("=") else p in name
                    for p in pats):
                continue
            secs, canaries, rows, err, trace = [], [], None, None, None
            for _rep in range(max(1, reps)):
                canaries.append(canary_gbps())
                t0 = time.perf_counter()
                try:
                    res = fn(sf_dir)
                    n = (res.count() if isinstance(res, ray.data.Dataset)
                         else len(res))
                    secs.append(round(time.perf_counter() - t0, 2))
                    rows = int(n)
                except Exception as e:  # noqa: BLE001
                    secs.append(round(time.perf_counter() - t0, 2))
                    err = f"{type(e).__name__}: {e}"
                    trace = traceback.format_exc()[-1500:]
                    break
            rec = {"query": name, "sec": min(secs), "secs": secs,
                   "canary_gbps": canaries, "ok": err is None}
            if err is None:
                rec["rows"] = rows
            else:
                rec["err"] = err
                rec["trace"] = trace
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(json.dumps({k: v for k, v in rec.items()
                              if k != "trace"}))
    ray.shutdown()


if __name__ == "__main__":
    args = sys.argv[1:]
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    main(args[0],
         args[1] if len(args) > 1 else "/tmp/sweep_results.jsonl",
         args[2] if len(args) > 2 else None,
         reps=reps)
