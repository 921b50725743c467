"""Interchange-format sources: JSONL and CSV readers with parquet parity.

The engine's native storage is Parquet, but pipelines routinely ingest
line-delimited JSON and CSV drops. These helpers materialize a
deterministic JSONL/CSV copy of a driver table once per tier (atomic
rename, pid-unique staging — concurrent runs never read a torn copy)
and read it back through ray.data's native readers, so the downstream
operators run identically regardless of the wire format. The DuckDB
oracles for queries built on these sources are the SAME SQL as their
parquet twins — the round trip itself is what's being checked."""

from __future__ import annotations

import os
import shutil

import ray.data


def _tier(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _ensure(out: str, build) -> str:
    """Build `out` atomically once; reuse it afterwards."""
    if os.path.isdir(out) and os.listdir(out):
        return out
    tmp = f"{out}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    build(tmp)
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out


def read_documents_jsonl(sf_dir: str):
    """documents as line-delimited JSON → Dataset (same schema as the
    parquet read; JSON string escaping round-trips arbitrary text)."""
    out = f"/tmp/graft_interchange/{_tier(sf_dir)}/documents_jsonl"

    def build(tmp):
        (ray.data.read_parquet(f"{sf_dir}/documents.parquet")
         .write_json(tmp))

    return ray.data.read_json(_ensure(out, build))


def read_events_csv(sf_dir: str):
    """events (ts, user_id, value) as CSV → Dataset; arrow's CSV reader
    re-infers the timestamp column, which the parity oracle pins."""
    out = f"/tmp/graft_interchange/{_tier(sf_dir)}/events_csv"

    def build(tmp):
        (ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id", "value"])
         .write_csv(tmp))

    return ray.data.read_csv(_ensure(out, build))
