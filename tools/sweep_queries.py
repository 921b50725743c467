"""Run every queries() entry against a testdata dir with per-query wall
times (the scale-tier robustness sweep; VERDICT r2 item 3). Writes one
JSON line per query so a hung query still leaves a record.

Usage: PYTHONPATH=/root/repo python tools/sweep_queries.py SF_DIR [OUT] [ONLY]
ONLY: comma-separated query-name substrings to include.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import ray
import ray.data


def main(sf_dir: str, out_path: str, only: str | None = None) -> None:
    ray.init(address="local", num_cpus=32, include_dashboard=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    pats = only.split(",") if only else None
    results = {}
    with open(out_path, "a") as out:
        for name, fn in entry.queries().items():
            if pats is not None and not any(p in name for p in pats):
                continue
            t0 = time.perf_counter()
            try:
                res = fn(sf_dir)
                n = (res.count() if isinstance(res, ray.data.Dataset)
                     else len(res))
                rec = {"query": name, "sec": round(time.perf_counter() - t0,
                                                   2),
                       "rows": int(n), "ok": True}
            except Exception as e:  # noqa: BLE001
                rec = {"query": name,
                       "sec": round(time.perf_counter() - t0, 2),
                       "ok": False,
                       "err": f"{type(e).__name__}: {e}",
                       "trace": traceback.format_exc()[-1500:]}
            results[name] = rec
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(json.dumps({k: v for k, v in rec.items()
                              if k != "trace"}))
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1],
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_results.jsonl",
         sys.argv[3] if len(sys.argv) > 3 else None)
