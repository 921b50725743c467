"""Driver preflight: run every queries() entry at sf0.01 and compare with its
oracle_sql() via DuckDB — row count, schema (column names), and
order-insensitive values — mirroring the driver's CORRECTNESS gate."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry_mod():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__

    return importlib.reload(__ray_entry__)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object and len(df) and isinstance(
                df[c].iloc[0], float):
            df[c] = df[c].astype(np.float64).round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name, ray_df, sql_df):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), \
        f"{name}: columns {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}"
    assert len(ray_df) == len(sql_df), \
        f"{name}: rows {len(ray_df)} vs {len(sql_df)}"
    a = _canon(ray_df)
    b = _canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            assert np.allclose(av.astype(float), bv.astype(float),
                               atol=1e-6), f"{name}.{c} float mismatch"
        else:
            assert (av == bv).all(), f"{name}.{c} value mismatch"


def test_all_oracle_queries(entry_mod, con):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(queries)
    failures = []
    for name, sql in oracles.items():
        try:
            ray_df = _to_pandas(queries[name](SF_DIR))
            sql_df = con.execute(sql).fetchdf()
            _compare(name, ray_df, sql_df)
        except AssertionError as e:
            failures.append(str(e))
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


def test_hash_critical_queries_bit_exact(entry_mod, con):
    """The driver hashes raw values: the three round-1 hash failures
    (pricing_summary / events_json_stats / sessionize_events) must match the
    oracle EXACTLY — same dtypes, identical bits, no rounding tolerance."""
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in ["pricing_summary", "events_json_stats",
                 "sessionize_events"]:
        ray_df = _to_pandas(queries[name](SF_DIR))
        sql_df = con.execute(oracles[name]).fetchdf()
        a = ray_df[sorted(ray_df.columns)].sort_values(
            sorted(ray_df.columns)).reset_index(drop=True)
        b = sql_df[sorted(sql_df.columns)].sort_values(
            sorted(sql_df.columns)).reset_index(drop=True)
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            assert av.dtype == bv.dtype, \
                f"{name}.{c}: dtype {av.dtype} vs {bv.dtype}"
            assert (av == bv).all(), f"{name}.{c}: values not bit-identical"


def test_rows_only_queries_run(entry_mod):
    """Queries without an oracle still must run and return rows/schema."""
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in set(queries) - set(oracles):
        df = _to_pandas(queries[name](SF_DIR))
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke(entry_mod):
    df = _to_pandas(entry_mod.entry())
    assert len(df) > 0
    assert {"vertex", "community", "pagerank", "repo", "path"} <= set(
        df.columns)
