"""Unit tests for the temporal operators (as-of join, rolling window,
distributed exact percentiles) beyond the sf0.01 oracle parity sweep."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _pdf(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df):
    cols = sorted(df.columns)
    return (df[cols].sort_values(cols).reset_index(drop=True))


def test_attribution_partition_invariant(ray_session):
    from leiden_cuda_ray.pipelines.temporal import event_attribution

    a = _canon(_pdf(event_attribution(SF, num_partitions=1)))
    b = _canon(_pdf(event_attribution(SF, num_partitions=64)))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)
    # every as-of match really is the max prior ts: monotone invariant
    assert (a["last_click_ts"] <= a["last_click_ts"].max()).all()
    assert (a["n_prior_clicks"] >= 1).all()


def test_rolling_partition_invariant_and_window(ray_session):
    from leiden_cuda_ray.pipelines.temporal import events_rolling

    a = _canon(_pdf(events_rolling(SF, num_partitions=1)))
    b = _canon(_pdf(events_rolling(SF, num_partitions=64)))
    pd.testing.assert_frame_equal(a, b)
    # rn=1 rows: rolling sum is exactly that row's value
    import duckdb

    v = duckdb.sql(
        f"SELECT event_id, value FROM '{SF}/events.parquet'").fetchdf()
    first = a[a.rn == 1].merge(v, on="event_id")
    assert np.allclose(first.roll_sum, np.round(first.value, 6))


def test_ord_prefix_is_order_preserving():
    from leiden_cuda_ray.pipelines.temporal import _ord_prefix

    rng = np.random.default_rng(7)
    x = np.concatenate([rng.normal(0, 1e6, 1000), [-0.0, 0.0, 1e-300,
                                                   -1e-300, 1e300]])
    order = np.argsort(x, kind="stable")
    p = _ord_prefix(x)[order]
    assert (np.diff(p) >= 0).all()


def test_percentiles_match_numpy(ray_session):
    from leiden_cuda_ray.pipelines.temporal import segment_order_percentiles

    got = _pdf(segment_order_percentiles(SF)).set_index("c_mktsegment")
    import duckdb

    df = duckdb.sql(
        f"SELECT c_mktsegment, o_totalprice FROM '{SF}/orders.parquet' o "
        f"JOIN '{SF}/customer.parquet' c ON o_custkey=c_custkey").fetchdf()
    for seg, grp in df.groupby("c_mktsegment"):
        vals = grp["o_totalprice"].to_numpy()
        assert got.loc[seg, "n_orders"] == len(vals)
        assert got.loc[seg, "p50"] == pytest.approx(
            round(float(np.quantile(vals, 0.5)), 6), abs=1e-6)
        assert got.loc[seg, "p95"] == pytest.approx(
            round(float(np.quantile(vals, 0.95)), 6), abs=1e-6)


def test_interarrival_partition_invariant_and_brute_force(ray_session):
    from leiden_cuda_ray.pipelines.temporal import events_interarrival

    a = _canon(_pdf(events_interarrival(SF, num_partitions=1)))
    b = _canon(_pdf(events_interarrival(SF, num_partitions=64)))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    got = a.set_index("user_id")
    for uid, grp in ev.groupby("user_id"):
        ts = np.sort(grp["ts"].to_numpy().astype("datetime64[us]")
                     .view(np.int64))
        assert got.loc[uid, "n_events"] == len(ts)
        assert got.loc[uid, "span_us"] == int(ts[-1] - ts[0])
        want_gap = int(np.diff(ts).max()) if len(ts) > 1 else 0
        assert got.loc[uid, "max_gap_us"] == want_gap


def test_sliding_median3_brute_force(ray_session):
    """Partition-invariance + pandas rolling-median brute force (in
    doubled cents, the operator's exact-integer protocol)."""
    from leiden_cuda_ray.pipelines.temporal import sliding_median3

    a = _canon(_pdf(sliding_median3(SF, num_partitions=1)))
    b = _canon(_pdf(sliding_median3(SF, num_partitions=64)))
    pd.testing.assert_frame_equal(a, b)
    import duckdb

    ev = duckdb.sql(
        f"SELECT event_id, user_id, ts, value FROM '{SF}/events.parquet'"
        " ORDER BY user_id, ts, event_id").fetchdf()
    ev["v_c"] = np.rint(ev["value"].to_numpy() * 100.0).astype(np.int64)
    exp = (ev.groupby("user_id")["v_c"]
           .rolling(3, min_periods=1).median().reset_index(drop=True))
    ev["med3_c2"] = np.rint(2 * exp.to_numpy()).astype(np.int64)
    got = a.set_index("event_id")["med3_c2"]
    want = ev.set_index("event_id")["med3_c2"]
    assert got.sort_index().equals(want.sort_index())


def test_asof_price_index_brute_force(ray_session):
    """Every matched index row is the latest day at-or-before shipdate,
    verified against a pandas merge_asof."""
    from leiden_cuda_ray.pipelines.temporal import asof_price_index

    a = _pdf(asof_price_index(SF))
    import duckdb

    orders = duckdb.sql(
        f"SELECT o_orderdate, CAST(ROUND(o_totalprice*100) AS BIGINT) p"
        f" FROM '{SF}/orders.parquet'").fetchdf()
    idx = (orders.groupby("o_orderdate")["p"].agg(["sum", "count"])
           .reset_index().sort_values("o_orderdate"))
    li = duckdb.sql(
        f"SELECT l_orderkey, CAST(l_linenumber AS BIGINT) l_linenumber,"
        f" l_shipdate FROM '{SF}/lineitem.parquet'").fetchdf()
    li = li.sort_values("l_shipdate")
    m = pd.merge_asof(li, idx, left_on="l_shipdate",
                      right_on="o_orderdate", direction="backward")
    assert len(a) == len(m) == m["o_orderdate"].notna().sum()
    key = ["l_orderkey", "l_linenumber", "idx_day", "idx_sum_c", "idx_n"]
    got = a[key].sort_values(key).reset_index(drop=True)
    m = m.rename(columns={"o_orderdate": "idx_day", "sum": "idx_sum_c",
                          "count": "idx_n"})
    m["idx_n"] = m["idx_n"].astype(np.int64)
    want = m[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_order_deciles_vs_argsort(ray_session):
    """Decile assignment equals the explicit argsort NTILE at sf0.001,
    including the first-(n%k)-tiles-take-the-extra-row fill rule."""
    from leiden_cuda_ray.pipelines.relational import order_deciles

    a = _canon(_pdf(order_deciles(SF)))
    import duckdb

    o = duckdb.sql(
        f"SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) p"
        f" FROM '{SF}/orders.parquet'").fetchdf()
    order = np.lexsort((o["o_orderkey"].to_numpy(),
                        o["p"].to_numpy()))
    n, k = len(o), 10
    base, extra = divmod(n, k)
    sizes = np.full(k, base, np.int64)
    sizes[:extra] += 1
    tile = np.repeat(np.arange(1, k + 1, dtype=np.int64), sizes)
    p_sorted = o["p"].to_numpy()[order]
    want = pd.DataFrame({
        "tile": np.arange(1, k + 1, dtype=np.int64),
        "n_orders": sizes,
        "sum_price_c": np.add.reduceat(
            p_sorted, np.r_[0, np.cumsum(sizes)[:-1]]).astype(np.int64),
    })
    pd.testing.assert_frame_equal(a, _canon(want))


def test_order_deciles_heavy_ties_brute_force(ray_session, tmp_path):
    """Randomized NTILE stress with only 5 distinct prices: the tile
    boundaries collapse into a handful of histogram buckets, forcing the
    sliver/rank path through mass duplication; compare against the
    explicit argsort NTILE."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from leiden_cuda_ray.pipelines.relational import order_deciles

    rng = np.random.RandomState(13)
    n, k = 2000, 10
    prices = rng.choice([10.0, 10.01, 250.5, 250.51, 9999.99], size=n)
    keys = rng.permutation(n).astype(np.int64)
    pq.write_table(pa.table({"o_orderkey": keys,
                             "o_totalprice": prices}),
                   str(tmp_path / "orders.parquet"))
    got = _canon(_pdf(order_deciles(str(tmp_path))))
    p_c = np.rint(prices * 100).astype(np.int64)
    order = np.lexsort((keys, p_c))
    base, extra = divmod(n, k)
    sizes = np.full(k, base, np.int64)
    sizes[:extra] += 1
    want = pd.DataFrame({
        "tile": np.arange(1, k + 1, dtype=np.int64),
        "n_orders": sizes,
        "sum_price_c": np.add.reduceat(
            p_c[order], np.r_[0, np.cumsum(sizes)[:-1]]).astype(np.int64),
    })
    pd.testing.assert_frame_equal(got, _canon(want))


def test_order_deciles_radix_path(ray_session, tmp_path):
    """Force the >cap radix-narrowing branch with pull_cap=4: boundary
    prices shared by hundreds of rows must resolve their tie-break key
    via 8-bit digit histograms, matching the explicit argsort NTILE."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from leiden_cuda_ray.pipelines.relational import order_deciles

    rng = np.random.RandomState(29)
    n, k = 1200, 10
    prices = rng.choice([5.0, 77.25, 1234.56], size=n)
    # huge spread-out keys so narrowing takes several digit passes
    keys = (rng.permutation(n).astype(np.int64) * 48_271_009_113
            + 1_000_003)
    pq.write_table(pa.table({"o_orderkey": keys,
                             "o_totalprice": prices}),
                   str(tmp_path / "orders.parquet"))
    got = _canon(_pdf(order_deciles(str(tmp_path), pull_cap=4)))
    p_c = np.rint(prices * 100).astype(np.int64)
    order = np.lexsort((keys, p_c))
    base, extra = divmod(n, k)
    sizes = np.full(k, base, np.int64)
    sizes[:extra] += 1
    want = pd.DataFrame({
        "tile": np.arange(1, k + 1, dtype=np.int64),
        "n_orders": sizes,
        "sum_price_c": np.add.reduceat(
            p_c[order], np.r_[0, np.cumsum(sizes)[:-1]]).astype(np.int64),
    })
    pd.testing.assert_frame_equal(got, _canon(want))


def test_parts_intersect_cross_batch_bits(ray_session, tmp_path):
    """A part whose window-A rows and window-B rows land in DIFFERENT
    blocks must still be kept: the per-window bits fold with Max (OR)
    across batches — a fused mask under Max would lose it."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from leiden_cuda_ray.pipelines.relational import parts_intersect

    d = str(tmp_path / "lineitem.parquet")
    os.makedirs(d)
    day_a = np.datetime64("1995-06-01", "us")
    day_b = np.datetime64("2000-06-01", "us")
    # file 1: parts 1, 2 ship in window A only
    pq.write_table(pa.table({
        "l_partkey": np.array([1, 2], np.int64),
        "l_shipdate": pa.array(np.array([day_a, day_a]),
                               pa.timestamp("us")),
    }), os.path.join(d, "f1.parquet"))
    # file 2: parts 1, 3 ship in window B only
    pq.write_table(pa.table({
        "l_partkey": np.array([1, 3], np.int64),
        "l_shipdate": pa.array(np.array([day_b, day_b]),
                               pa.timestamp("us")),
    }), os.path.join(d, "f2.parquet"))
    got = _pdf(parts_intersect(str(tmp_path)))
    assert got["l_partkey"].tolist() == [1]


def test_events_range_window_invariance_and_brute_force(ray_session):
    """Partition-count invariance plus a brute-force per-user replay of
    the trailing 10-minute RANGE frame (peers at equal ts included)."""
    from leiden_cuda_ray.pipelines.temporal import events_range_window

    a = _canon(_pdf(events_range_window(SF, num_partitions=1)))
    b = _canon(_pdf(events_range_window(SF, num_partitions=64)))
    pd.testing.assert_frame_equal(a, b)
    import duckdb

    ev = duckdb.sql(
        f"SELECT event_id, user_id, epoch_us(ts) tus, value"
        f" FROM '{SF}/events.parquet'").fetchdf()
    ev["v_c"] = np.rint(ev.value.to_numpy() * 100).astype(np.int64)
    win = 10 * 60_000_000
    got = a.set_index("event_id")["win_sum_c"]
    for uid, g in ev.groupby("user_id"):
        t = g.tus.to_numpy()
        v = g.v_c.to_numpy()
        for i in range(len(g)):
            m = (t >= t[i] - win) & (t <= t[i])
            assert got[g.event_id.iloc[i]] == v[m].sum()
