"""Text edge-list source with the reference loader's semantics.

Reference: `load_edge_list` at csrc/test/main.cpp:117-177 — whitespace
`u v [w]` integer pairs, `%`-prefixed comment lines and blanks skipped,
default weight 1.0 (main.cpp:136), error on an empty result, and vertex ids
renumbered so the global minimum becomes 0 (main.cpp:153-175).

Ray-Data-first: `ray.data.read_text` → vectorized `map_batches` parser →
(optionally) a driver-scalar min + stateless subtract for the renumber.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EDGE_SCHEMA = pa.schema([
    ("src", pa.int64()), ("dst", pa.int64()), ("weight", pa.float64()),
])


def parse_edge_list_text(lines: list[str]) -> pa.Table:
    """Vectorized parse of `u v [w]` lines; '%' comments and blanks skipped."""
    srcs: list[int] = []
    dsts: list[int] = []
    ws: list[float] = []
    for ln in lines:
        s = ln.strip()
        if not s or s.startswith("%"):
            continue
        parts = s.split()
        srcs.append(int(parts[0]))
        dsts.append(int(parts[1]))
        ws.append(float(parts[2]) if len(parts) > 2 else 1.0)
    return pa.table({
        "src": pa.array(srcs, pa.int64()),
        "dst": pa.array(dsts, pa.int64()),
        "weight": pa.array(ws, pa.float64()),
    })


def _parse_batch(batch: pa.Table) -> pa.Table:
    return parse_edge_list_text(batch.column("text").to_pylist())


def read_edge_list(path: str, renumber: bool = True):
    """Edge-list file → Dataset[src:int64, dst:int64, weight:float64].

    With renumber=True the min endpoint id is subtracted from all endpoints
    (driver scalar + stateless map_batches, per SURVEY.md §2.1 S2).
    """
    import ray.data

    ds = ray.data.read_text(path).map_batches(
        _parse_batch, batch_format="pyarrow")
    if not renumber:
        return ds
    lo = ds.min(["src", "dst"])
    if lo is None or lo.get("min(src)") is None:
        # mirror the reference loader's error on an empty edge list
        # (csrc/test/main.cpp:147-151)
        raise ValueError(f"edge list {path!r} contains no edges")
    base = int(min(lo["min(src)"], lo["min(dst)"]))
    if base == 0:
        return ds

    def shift(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src")) - base
        dst = np.asarray(batch.column("dst")) - base
        return pa.table({"src": src, "dst": dst,
                         "weight": batch.column("weight")})

    return ds.map_batches(shift, batch_format="pyarrow")
