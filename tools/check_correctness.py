"""Local stand-in for the driver's correctness gate.

Runs every `__ray_entry__.queries()` entry over an sf dir and compares
row count / sorted-column schema / value hash against its
`oracle_sql()` DuckDB result (rows-only queries are reported without a
verdict), mirroring the driver's compare: columns sorted by name, rows
sorted by all columns, float columns rounded to 6 decimals before
hashing.

Usage: PYTHONPATH=/root/repo python tools/check_correctness.py [sf_dir]
(owns its Ray session; default sf_dir=/root/testdata/sf0.01)
"""
import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray
import ray.data

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

if not ray.is_initialized():
    ray.init(address="local", num_cpus=32, include_dashboard=False)

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entry  # noqa: E402

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{SF}/{t}.parquet')")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def vhash(df: pd.DataFrame) -> str:
    h = hashlib.blake2b(digest_size=16)
    for c in df.columns:
        v = df[c]
        if v.dtype.kind == "f":
            h.update(np.round(v.values.astype(np.float64), 6).tobytes())
        else:
            h.update(pd.util.hash_pandas_object(v, index=False)
                     .values.tobytes())
    return h.hexdigest()


oracles = entry.oracle_sql()
only = set(sys.argv[2:])  # optional: check just these query names
fails = []
for name, fn in entry.queries().items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        res = fn(SF)
        df = (res.to_pandas() if isinstance(res, ray.data.Dataset)
              else res if isinstance(res, pd.DataFrame) else res.to_pandas())
        if name not in oracles:
            print(f"{name:28s} rows={len(df):7d} (rows-only) "
                  f"{time.time() - t0:5.1f}s", flush=True)
            continue
        odf = con.execute(oracles[name]).df()
        a, b = norm(df), norm(odf)
        rows = len(a) == len(b)
        schema = list(a.columns) == list(b.columns)
        hmatch = rows and schema and vhash(a) == vhash(b)
        ok = rows and schema and hmatch
        status = "OK" if ok else f"FAIL rows={rows} schema={schema} hash={hmatch}"
        if not ok:
            fails.append(name)
        print(f"{name:28s} rows={len(df):7d} {status} "
              f"{time.time() - t0:5.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001 — report and continue
        fails.append(name)
        print(f"{name:28s} ERROR {type(e).__name__}: {str(e)[:120]}",
              flush=True)
print("FAILS:", fails)
ray.shutdown()
sys.exit(1 if fails else 0)
