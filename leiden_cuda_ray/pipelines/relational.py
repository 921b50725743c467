"""Relational demo pipelines over the driver's TPC-H-ish tables.

These exercise the engine's relational operator surface (SURVEY.md §2.7:
grouped aggregates, joins, sort/top-k, distinct, filter/project, windowed
aggregation) with DuckDB-checkable semantics. Aggregated doubles are rounded
to 6 decimals on BOTH sides so order-of-addition float noise cannot flip the
driver's value hash; column names match the oracle SQL exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from leiden_cuda_ray.functions.arrowutil import (dense_pair_codes,
                                                 int_bincount,
                                                 pair_group_codes)
from leiden_cuda_ray.stages.joins import hash_join


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                 columns=columns)


def _round_cols(ds, cols, digits: int = 6):
    def fn(batch: pa.Table) -> pa.Table:
        for c in cols:
            batch = batch.set_column(
                batch.column_names.index(c), c,
                pc.round(batch.column(c), ndigits=digits))
        return batch
    return ds.map_batches(fn, batch_format="pyarrow")


def pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary (filter → grouped aggregates).

    Prices/quantities/discounts carry 2 decimals, so sums are aggregated as
    exact int64 "cents" (price and the 1−discount factor each ×100) and
    divided back once at the end — order-of-addition float noise cannot
    appear, so the result hashes identically to the DuckDB oracle doing the
    same integer aggregation."""
    import datetime

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = datetime.datetime(2000, 1, 1)

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.less_equal(batch.column("l_shipdate"),
                             pa.scalar(cutoff, type=pa.timestamp("us")))
        t = batch.filter(keep)
        qty_c = np.rint(
            np.asarray(t.column("l_quantity"), np.float64) * 100.0
        ).astype(np.int64)
        price_c = np.rint(
            np.asarray(t.column("l_extendedprice"), np.float64) * 100.0
        ).astype(np.int64)
        keep_c = np.rint(
            (1.0 - np.asarray(t.column("l_discount"), np.float64)) * 100.0
        ).astype(np.int64)
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty_c": pa.array(qty_c, pa.int64()),
            "price_c": pa.array(price_c, pa.int64()),
            "disc_e4": pa.array(price_c * keep_c, pa.int64()),
        })

    agg = (li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("qty_c", alias_name="sum_qty_c"),
                      Sum("price_c", alias_name="sum_price_c"),
                      Sum("disc_e4", alias_name="sum_disc_e4"),
                      Count(alias_name="count_order")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "sum_qty": pc.divide(
                pc.cast(batch.column("sum_qty_c"), pa.float64()), 100.0),
            "sum_base_price": pc.divide(
                pc.cast(batch.column("sum_price_c"), pa.float64()), 100.0),
            "sum_disc_price": pc.divide(
                pc.cast(batch.column("sum_disc_e4"), pa.float64()), 10000.0),
            "count_order": batch.column("count_order"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def top_customers(sf_dir: str, k: int = 10):
    """orders ⋈ customer, grouped sum, deterministic top-k."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    spent = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_spent"))
    joined = hash_join(spent, cust, on=("o_custkey",),
                       right_on=("c_custkey",))
    out = joined.sort(["total_spent", "o_custkey"],
                      descending=[True, False]).limit(k)

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch.column("o_custkey"),
            "c_name": batch.column("c_name"),
            "total_spent": pc.round(batch.column("total_spent"), ndigits=6),
        })

    return out.map_batches(proj, batch_format="pyarrow")


def nation_order_counts(sf_dir: str):
    """customer ⋈ nation ⋈ orders → orders per nation (multi-join)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    oc = hash_join(orders, cust, on=("o_custkey",),
                   right_on=("c_custkey",))

    def cast_key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": pc.cast(batch.column("c_nationkey"), pa.int32()),
        })

    on_nation = oc.map_batches(cast_key, batch_format="pyarrow")
    joined = hash_join(on_nation, nation, on=("c_nationkey",),
                       right_on=("n_nationkey",))
    return joined.groupby("n_name").aggregate(
        Count(alias_name="order_count"))


def region_revenue(sf_dir: str):
    """region ⋈ nation ⋈ customer ⋈ orders → orders + exact revenue per
    region (the 4-table join chain; totals aggregated as int64 cents)."""
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    # every projection below CASTS every output column explicitly: Ray's
    # hash-shuffle join emits pandas blocks, and an EMPTY pandas block
    # round-trips passthrough columns as null-typed arrow — one such block
    # gives the next join conflicting schemas ("No match or multiple
    # matches for key field"), which only shows up at partition counts
    # where some join partition is empty
    def cents(batch: pa.Table) -> pa.Table:
        price_c = np.rint(np.asarray(batch.column("o_totalprice"),
                                     np.float64) * 100.0).astype(np.int64)
        return pa.table({
            "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
            "price_c": pa.array(price_c, pa.int64()),
        })

    oc = hash_join(orders.map_batches(cents, batch_format="pyarrow",
                                      zero_copy_batch=True),
                   cust, on=("o_custkey",), right_on=("c_custkey",))

    def nat_key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": pc.cast(batch.column("c_nationkey"), pa.int32()),
            "price_c": pc.cast(batch.column("price_c"), pa.int64()),
        })

    on_nation = hash_join(
        oc.map_batches(nat_key, batch_format="pyarrow"), nation,
        on=("c_nationkey",), right_on=("n_nationkey",))

    def reg_key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_regionkey": pc.cast(batch.column("n_regionkey"), pa.int32()),
            "price_c": pc.cast(batch.column("price_c"), pa.int64()),
        })

    on_region = hash_join(
        on_nation.map_batches(reg_key, batch_format="pyarrow"), region,
        on=("n_regionkey",), right_on=("r_regionkey",))
    agg = on_region.groupby("r_name").aggregate(
        Count(alias_name="n_orders"),
        Sum("price_c", alias_name="revenue_c"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "r_name": batch.column("r_name"),
            "n_orders": batch.column("n_orders"),
            "revenue": pc.divide(
                pc.cast(batch.column("revenue_c"), pa.float64()), 100.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def brand_item_counts(sf_dir: str):
    """lineitem ⋈ part → items per brand."""
    li = _read(sf_dir, "lineitem", ["l_partkey"])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    joined = hash_join(li, part, on=("l_partkey",),
                       right_on=("p_partkey",))
    return joined.groupby("p_brand").aggregate(Count(alias_name="n_items"))


def high_value_orders(sf_dir: str, threshold: float = 400000.0):
    """filter + project (no aggregation)."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch.column("o_totalprice"),
                          pa.scalar(threshold))
        return batch.filter(keep)

    return orders.map_batches(fn, batch_format="pyarrow",
                              zero_copy_batch=True)


def distinct_segments(sf_dir: str):
    """distinct (exact dedup on a column)."""
    cust = _read(sf_dir, "customer", ["c_mktsegment"])
    return cust.groupby("c_mktsegment").count().drop_columns(["count()"])


def supplier_balance_by_nation(sf_dir: str):
    sup = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    agg = sup.groupby("s_nationkey").aggregate(
        Sum("s_acctbal", alias_name="total_balance"),
        Count(alias_name="n_suppliers"))
    return _round_cols(agg, ["total_balance"])


def part_type_stats(sf_dir: str):
    part = _read(sf_dir, "part", ["p_type", "p_retailprice"])
    agg = part.groupby("p_type").aggregate(
        Count(alias_name="n_parts"),
        Mean("p_retailprice", alias_name="avg_price"))
    return _round_cols(agg, ["avg_price"])


def events_hourly(sf_dir: str):
    """windowed (tumbling 1h) event counts per type."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def trunc(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "hour": pc.floor_temporal(batch.column("ts"), unit="hour"),
        })

    agg = (ev.map_batches(trunc, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["event_type", "hour"])
           .aggregate(Count(alias_name="n_events")))

    # Ray's sort-aggregate re-infers hour-floored timestamps as
    # timestamp[s]; pin the unit so the output dtype matches the source
    # (and the DuckDB oracle) exactly
    def fix_unit(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("hour"), "hour",
            pc.cast(batch.column("hour"), pa.timestamp("us")))

    return agg.map_batches(fix_unit, batch_format="pyarrow")


def user_mode_event(sf_dir: str):
    """Grouped MODE: each user's most frequent event type, tie-break
    pinned to the lexicographically smallest type among the tied counts
    (SQL mode() leaves ties unspecified; the oracle replays this exact
    order with ROW_NUMBER OVER (count DESC, type ASC)).

    Scale shape: per-batch (user, type) count partials (each block
    collapses to its own distinct pairs), one grouped sum — the only
    shuffle — then argmax-per-user via PARTIAL TOP-1 combiners: "best
    under (count DESC, type ASC)" is an associative-commutative max, so
    each block keeps one candidate row per user and the final merge
    folds candidates, never co-locating a user's full history."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("user_id"), np.int64)
        t = batch.column("event_type").to_numpy(zero_copy_only=False)
        tvals, tinv = np.unique(t, return_inverse=True)
        raw = u * np.int64(len(tvals)) + tinv
        uraw, codes = np.unique(raw, return_inverse=True)
        cnt = np.bincount(codes, minlength=len(uraw)).astype(np.int64)
        return pa.table({
            "user_id": pa.array(uraw // len(tvals), pa.int64()),
            "event_type": pa.array(
                np.asarray(tvals[uraw % len(tvals)], object), pa.string()),
            "cnt": pa.array(cnt, pa.int64()),
        })

    counts = (ev.map_batches(partial_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["user_id", "event_type"])
              .aggregate(Sum("cnt", alias_name="n_type")))

    def top1(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("user_id"), np.int64)
        t = batch.column("event_type").to_numpy(zero_copy_only=False)
        n = np.asarray(batch.column("n_type"), np.int64)
        order = np.lexsort((t, -n, u))
        g = u[order]
        first = np.r_[True, g[1:] != g[:-1]]
        sel = order[first]
        return pa.table({
            "user_id": pa.array(u[sel], pa.int64()),
            "mode_type": pa.array(np.asarray(t[sel], object), pa.string()),
            "n_type": pa.array(n[sel], pa.int64()),
        })

    return (counts.map_batches(top1, batch_format="pyarrow")
            .repartition(1)
            .map_batches(lambda b: top1(b.rename_columns(
                ["user_id", "event_type", "n_type"])),
                batch_format="pyarrow", batch_size=None))


def events_json_stats(sf_dir: str):
    """JSON extraction over the events props column (string/JSON functions —
    the engine's only JSON op; vectorized via polars' JSON path kernel)."""
    ev = _read(sf_dir, "events", ["event_type", "props"])

    def fn(batch: pa.Table) -> pa.Table:
        try:
            import polars as pl

            k = (pl.from_arrow(batch.column("props"))
                 .str.json_path_match("$.k").cast(pl.Int64))
            karr = pa.array(k.to_list(), pa.int64())
        except ImportError:
            import json as _json

            karr = pa.array(
                [int(_json.loads(p)["k"])
                 for p in batch.column("props").to_pylist()], pa.int64())
        return pa.table({"event_type": batch.column("event_type"),
                         "k": karr})

    return (ev.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("event_type")
            .aggregate(Sum("k", alias_name="sum_k"),
                       Count(alias_name="n_events")))


def sessionize_events(sf_dir: str, gap_minutes: int = 30,
                      num_partitions: int = 64):
    """per-user sessionization: a session breaks after a 30-min silence.

    The window op (SURVEY.md §2.7) vectorized: users are hash-bucketed
    into `num_partitions` groups, so ONE shuffle co-locates each user and
    the scan runs once per PARTITION (a single sorted diff-and-cumsum
    over every user in the bucket) instead of once per user — the
    per-group pandas frame overhead of groupby(user).map_groups amortizes
    away while the output stays row-identical."""
    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    gap = np.timedelta64(gap_minutes, "m")

    def add_part(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id"), np.int64)
        # multiplicative mix so adversarial id patterns still spread
        part = ((uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(33)) % np.uint64(num_partitions)
        return batch.append_column("part",
                                   pa.array(part.astype(np.int64),
                                            pa.int64()))

    def emit(group: pa.Table) -> pa.Table:
        uid0 = group.column("user_id").to_numpy().astype(np.int64)
        ts0 = group.column("ts").to_numpy()
        eid0 = group.column("event_id").to_numpy()
        order = np.lexsort((eid0, ts0, uid0))
        uid, ts = uid0[order], ts0[order]
        n = len(uid)
        new_sess = np.ones(n, bool)
        if n > 1:
            new_sess[1:] = ((uid[1:] != uid[:-1])
                            | ((ts[1:] - ts[:-1]) > gap))
        starts = np.flatnonzero(new_sess)
        counts = np.diff(np.append(starts, n)).astype(np.int64)
        su = uid[starts]
        # session_id = rank within user; sessions of one user are
        # consecutive, so subtract the index of the user's first session
        idx = np.arange(len(starts), dtype=np.int64)
        user_first = np.ones(len(starts), bool)
        user_first[1:] = su[1:] != su[:-1]
        session_id = idx - np.maximum.accumulate(np.where(user_first,
                                                          idx, 0))
        return pa.table({"user_id": su, "session_id": session_id,
                         "n_events": counts})

    return (ev.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part").map_groups(emit, batch_format="pyarrow"))


def top_docs_per_group(sf_dir: str, k: int = 3):
    """Grouped top-k (SURVEY §2.7 sort/top-k, grouped): the k longest
    documents per (lang, source) by n_chars, ties broken by MIN doc_id.

    Scale shape: a per-batch PARTIAL top-k combiner (one lexsort per
    batch) reduces every block to ≤ groups·k rows before anything moves,
    so the final merge sees O(blocks · groups · k) rows no matter how many
    documents exist — the grouped analogue of knn's partial top-k. The
    merge runs in one task (repartition(1)): group count is bounded by
    the lang×source vocabulary, not the corpus size."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source",
                                       "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        n = batch.column("n_chars").to_numpy().astype(np.int64)
        did = batch.column("doc_id").to_numpy().astype(np.int64)
        # collision-free integer pair code (NEVER string-concat:
        # numpy U-dtype strips trailing NULs, merging distinct groups)
        inv = pair_group_codes(lang, src)
        order = np.lexsort((did, -n, inv))
        g = inv[order]
        pos = np.arange(len(g)) - np.searchsorted(g, g, side="left")
        take = order[pos < k]
        return batch.take(pa.array(take))

    merged = docs.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).repartition(1)

    def final(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        n = batch.column("n_chars").to_numpy().astype(np.int64)
        did = batch.column("doc_id").to_numpy().astype(np.int64)
        inv = pair_group_codes(lang, src)
        order = np.lexsort((did, -n, inv))
        g = inv[order]
        rnk = (np.arange(len(g))
               - np.searchsorted(g, g, side="left") + 1).astype(np.int64)
        keep = rnk <= k
        take = order[keep]
        out = batch.take(pa.array(take))
        return out.append_column("rnk", pa.array(rnk[keep], pa.int64()))

    # batch_size=None: one block after repartition(1) → one merge batch
    return merged.map_batches(final, batch_format="pyarrow",
                              batch_size=None)


def rollup_revenue(sf_dir: str):
    """Hierarchical (ROLLUP) aggregate: exact order count + revenue
    cents per (nation, order-year), per nation, and grand total — the
    GROUP BY ROLLUP(n_name, year) surface. Sentinels 'ALL' / -1 stand in
    for the rolled-up levels so the schema stays NULL-free (NULL markers
    hash differently across engines; sentinels compare exactly).

    Scale shape: the detail aggregation is the only pass over the fact
    table (orders ⋈ customer ⋈ nation, int64 cents); both rollup levels
    derive from the (nation, year) CELL table — 25 nations × a handful
    of years — inside one final task, so the rollup costs nothing extra
    at any scale."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_totalprice", "o_orderdate"])

    def prep(batch: pa.Table) -> pa.Table:
        price_c = np.rint(np.asarray(batch.column("o_totalprice"),
                                     np.float64) * 100.0).astype(np.int64)
        return pa.table({
            "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
            "o_year": pc.cast(pc.year(batch.column("o_orderdate")),
                              pa.int64()),
            "price_c": pa.array(price_c, pa.int64()),
        })

    oc = hash_join(orders.map_batches(prep, batch_format="pyarrow",
                                      zero_copy_batch=True),
                   cust, on=("o_custkey",), right_on=("c_custkey",))

    def nat_key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": pc.cast(batch.column("c_nationkey"), pa.int32()),
            "o_year": pc.cast(batch.column("o_year"), pa.int64()),
            "price_c": pc.cast(batch.column("price_c"), pa.int64()),
        })

    on_nation = hash_join(
        oc.map_batches(nat_key, batch_format="pyarrow"), nation,
        on=("c_nationkey",), right_on=("n_nationkey",))
    cells = on_nation.groupby(["n_name", "o_year"]).aggregate(
        Count(alias_name="n_orders"),
        Sum("price_c", alias_name="revenue_c"))

    def rollup(batch: pa.Table) -> pa.Table:
        import pandas as pd

        name = batch.column("n_name").to_numpy(zero_copy_only=False)
        year = np.asarray(batch.column("o_year"), np.int64)
        cnt = np.asarray(batch.column("n_orders"), np.int64)
        rev = np.asarray(batch.column("revenue_c"), np.int64)
        codes, uniq = pd.factorize(name)
        ncnt = int_bincount(codes, cnt, len(uniq))
        nrev = int_bincount(codes, rev, len(uniq))
        return pa.table({
            "n_name": pa.array(
                list(name) + list(np.asarray(uniq, object)) + ["ALL"],
                pa.string()),
            "o_year": pa.array(
                np.concatenate([year,
                                np.full(len(uniq) + 1, -1, np.int64)]),
                pa.int64()),
            "n_orders": pa.array(
                np.concatenate([cnt, ncnt, [cnt.sum()]]), pa.int64()),
            "revenue_c": pa.array(
                np.concatenate([rev, nrev, [rev.sum()]]), pa.int64()),
        })

    return cells.repartition(1).map_batches(rollup, batch_format="pyarrow",
                                            batch_size=None)


def customers_without_orders(sf_dir: str, min_price: float = 350_000.0):
    """Anti-join: customers with NO order above `min_price` —
    (c_custkey, c_name, c_acctbal_c). Distributed as customer LEFT OUTER
    (filtered orders → distinct custkeys) with a null-marker filter: the
    predicate + distinct shrink the probe side to unique qualifying
    custkeys before the join, so the exchange carries keys, not the
    orders fact table."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        bal_c = np.rint(np.asarray(batch.column("c_acctbal"),
                                   np.float64) * 100.0).astype(np.int64)
        return pa.table({
            "c_custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
            "c_name": pc.cast(batch.column("c_name"), pa.string()),
            "c_acctbal_c": pa.array(bal_c, pa.int64()),
        })

    def okey(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch.column("o_totalprice"),
                                    min_price))
        return pa.table({
            "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
        })

    okeys = (orders.map_batches(okey, batch_format="pyarrow",
                                zero_copy_batch=True)
             .groupby("o_custkey").aggregate(Count(alias_name="n_o")))
    j = hash_join(cust.map_batches(prep, batch_format="pyarrow",
                                   zero_copy_batch=True),
                  okeys, on=("c_custkey",), right_on=("o_custkey",),
                  join_type="left_outer")

    def anti(batch: pa.Table) -> pa.Table:
        keep = pc.is_null(batch.column("n_o"))
        t = batch.filter(keep)
        return pa.table({
            "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
            "c_name": pc.cast(t.column("c_name"), pa.string()),
            "c_acctbal_c": pc.cast(t.column("c_acctbal_c"), pa.int64()),
        })

    return j.map_batches(anti, batch_format="pyarrow")


def funnel_stages(sf_dir: str, num_partitions: int = 64):
    """Per-user funnel progression view → click → purchase: stage 1 =
    viewed, 2 = first click STRICTLY after the first view, 3 = first
    purchase strictly after that click; 0 = never viewed. One hash-
    bucket shuffle co-locates each user (the sessionize pattern) and the
    per-partition evaluation is three vectorized reduceat passes — min
    view ts per user, min qualifying click ts, min qualifying purchase
    ts — no per-user Python loop. → Dataset[user_id, stage]."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        # every user stays visible (stage 0 included): non-funnel rows
        # carry code 0
        uid = np.asarray(batch.column("user_id"), np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        code = np.zeros(len(uid), np.int64)
        code[et == "view"] = 1
        code[et == "click"] = 2
        code[et == "purchase"] = 3
        part = ((uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(33)) % np.uint64(num_partitions)
        return pa.table({
            "user_id": pa.array(uid, pa.int64()),
            "ts": batch.column("ts"),
            "code": pa.array(code, pa.int64()),
            "part": pa.array(part.astype(np.int64), pa.int64()),
        })

    def _min_per_user(uid, ts, mask, n_users, inv, sentinel):
        """min ts per user over masked rows (inv = per-row user index)."""
        out = np.full(n_users, sentinel)
        if mask.any():
            np.minimum.at(out, inv[mask], ts[mask])
        return out

    def emit(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy().astype(np.int64)
        ts = group.column("ts").to_numpy()  # datetime64[us]
        code = group.column("code").to_numpy().astype(np.int64)
        users, inv = np.unique(uid, return_inverse=True)
        nu = len(users)
        sentinel = np.datetime64("2200-01-01", "us")
        t1 = _min_per_user(uid, ts, code == 1, nu, inv, sentinel)
        t2 = _min_per_user(uid, ts, (code == 2) & (ts > t1[inv]),
                           nu, inv, sentinel)
        t3 = _min_per_user(uid, ts, (code == 3) & (ts > t2[inv]),
                           nu, inv, sentinel)
        stage = ((t1 < sentinel).astype(np.int64)
                 + (t2 < sentinel) + (t3 < sentinel))
        return pa.table({"user_id": pa.array(users, pa.int64()),
                         "stage": pa.array(stage, pa.int64())})

    return (ev.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part").map_groups(emit, batch_format="pyarrow"))


def price_histogram(sf_dir: str, width_c: int = 5_000_000):
    """Equi-width histogram of order totals: bucket = price_cents //
    width (width $50,000), with exact order count and revenue cents per
    bucket. One streaming pass of per-batch bincount partials; the merge
    input is O(buckets · blocks) — nothing row-sized shuffles."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        price_c = np.rint(np.asarray(batch.column("o_totalprice"),
                                     np.float64) * 100.0).astype(np.int64)
        b = price_c // width_c
        ub, inv = np.unique(b, return_inverse=True)
        n = np.bincount(inv, minlength=len(ub)).astype(np.int64)
        s = int_bincount(inv, price_c, len(ub))
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "n_orders": pa.array(n, pa.int64()),
                         "revenue_c": pa.array(s, pa.int64())})

    def merge(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch.column("bucket"), np.int64)
        n = np.asarray(batch.column("n_orders"), np.int64)
        s = np.asarray(batch.column("revenue_c"), np.int64)
        ub, inv = np.unique(b, return_inverse=True)
        return pa.table({
            "bucket": pa.array(ub, pa.int64()),
            "n_orders": pa.array(int_bincount(inv, n, len(ub)),
                                 pa.int64()),
            "revenue_c": pa.array(int_bincount(inv, s, len(ub)),
                                  pa.int64()),
        })

    return (orders.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(1).map_batches(merge, batch_format="pyarrow",
                                        batch_size=None))


def bloom_semijoin_revenue(sf_dir: str, min_acctbal: float = 9000.0,
                           m_bits: int = 1 << 17, k_hashes: int = 4,
                           max_keys: int = 4_000_000):
    """Bloom-filtered semi-join: revenue per high-balance customer
    (c_acctbal > min_acctbal), with the orders fact table pre-filtered
    by a broadcast Bloom filter BEFORE the join shuffle. The filter is
    a pure wire-volume optimization — false positives are removed by
    the verifying hash join, so the result is exactly the plain join's
    (what the oracle checks) while ~90% of fact rows never enter the
    exchange. Filter bits are k splitmix hashes (seeds 1..k) mod m;
    the ~16 KB bit array ships once per task via ray.put.

    The qualifying key set is pulled driver-side to build the filter
    (the package's broadcast-id-map pattern) behind a max_keys guard
    that names the distributed alternative."""
    import ray

    from leiden_cuda_ray.functions.sampling import splitmix_value

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_acctbal"])

    def small(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch.column("c_acctbal"),
                                    min_acctbal))
        return pa.table({
            "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
            "c_name": pc.cast(t.column("c_name"), pa.string()),
        })

    sm = cust.map_batches(small, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    n_small = sm.count()
    if n_small > max_keys:
        raise ValueError(
            f"bloom build side has {n_small} keys > max_keys={max_keys}; "
            f"partition the filter (per-bucket blooms) at this scale")
    keys = np.array([r["c_custkey"] for r in
                     sm.select_columns(["c_custkey"]).take_all()],
                    np.int64)
    bloom = np.zeros(m_bits, bool)
    for s in range(1, k_hashes + 1):
        bloom[(splitmix_value(keys, s) % np.uint64(m_bits))
              .astype(np.int64)] = True
    bloom_ref = ray.put(bloom)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    class _BloomFilter:
        def __init__(self, ref):
            self.bloom = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = np.asarray(batch.column("o_custkey"), np.int64)
            hit = np.ones(len(ck), bool)
            for s in range(1, k_hashes + 1):
                hit &= self.bloom[
                    (splitmix_value(ck, s) % np.uint64(m_bits))
                    .astype(np.int64)]
            price_c = np.rint(
                np.asarray(batch.column("o_totalprice"),
                           np.float64)[hit] * 100.0).astype(np.int64)
            return pa.table({
                "o_custkey": pa.array(ck[hit], pa.int64()),
                "price_c": pa.array(price_c, pa.int64()),
            })

    cand = orders.map_batches(_BloomFilter,
                              fn_constructor_args=(bloom_ref,),
                              concurrency=(1, 8),
                              batch_format="pyarrow",
                              zero_copy_batch=True)
    j = hash_join(cand, sm, on=("o_custkey",), right_on=("c_custkey",))
    agg = j.groupby("o_custkey").aggregate(
        Count(alias_name="n_orders"),
        Sum("price_c", alias_name="revenue_c"))

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
            "n_orders": pc.cast(batch.column("n_orders"), pa.int64()),
            "revenue_c": pc.cast(batch.column("revenue_c"), pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def daily_running_revenue(sf_dir: str):
    """Per-day order revenue with a GLOBAL running total (the ordered
    cumulative-window op). One streaming pass of per-batch (day,
    revenue) partials; days are few (years × 365), so the ordered
    prefix sum runs in one final task over the day table — a global
    ORDER BY of the fact table never happens. Days as 'YYYY-MM-DD'
    strings so both engines hash identical values."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").to_numpy()
        day = ts.astype("datetime64[D]")
        price_c = np.rint(np.asarray(batch.column("o_totalprice"),
                                     np.float64) * 100.0).astype(np.int64)
        ud, inv = np.unique(day, return_inverse=True)
        s = int_bincount(inv, price_c, len(ud))
        n = np.bincount(inv, minlength=len(ud)).astype(np.int64)
        return pa.table({"day": pa.array(ud.astype(str), pa.string()),
                         "n_orders": pa.array(n, pa.int64()),
                         "revenue_c": pa.array(s, pa.int64())})

    def fold(batch: pa.Table) -> pa.Table:
        d = batch.column("day").to_numpy(zero_copy_only=False)
        n = np.asarray(batch.column("n_orders"), np.int64)
        s = np.asarray(batch.column("revenue_c"), np.int64)
        ud, inv = np.unique(d, return_inverse=True)  # sorted ascending
        ns = int_bincount(inv, n, len(ud))
        ss = int_bincount(inv, s, len(ud))
        return pa.table({
            "day": pa.array(ud, pa.string()),
            "n_orders": pa.array(ns, pa.int64()),
            "revenue_c": pa.array(ss, pa.int64()),
            "running_revenue_c": pa.array(np.cumsum(ss), pa.int64()),
        })

    return (orders.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(1).map_batches(fold, batch_format="pyarrow",
                                        batch_size=None))


def _skyline_mask(price_c, size, tiebreak):
    """Boolean mask of the 2-d skyline (minimize price_c, maximize size).

    A row survives iff no other row has price ≤ AND size ≥ with at least
    one strict; duplicates of a surviving (price, size) point all survive.
    One lexsort sweep: survivor ⟺ size equals the max at its exact price
    AND exceeds the max over every strictly cheaper price."""
    order = np.lexsort((tiebreak, -size, price_c))
    p, s = price_c[order], size[order]
    new_p = np.ones(len(p), bool)
    new_p[1:] = p[1:] != p[:-1]
    gidx = np.cumsum(new_p) - 1
    gmax = s[new_p]  # sorted size-desc within price ⟹ first = group max
    cheaper = np.full(len(gmax), np.iinfo(np.int64).min, np.int64)
    cheaper[1:] = np.maximum.accumulate(gmax)[:-1]
    keep_sorted = (s == gmax[gidx]) & (s > cheaper[gidx])
    mask = np.zeros(len(p), bool)
    mask[order] = keep_sorted
    return mask


def pareto_parts(sf_dir: str):
    """Skyline (pareto-optimal) parts: minimize retail price, maximize
    size — no other part is both cheaper-or-equal AND larger-or-equal
    with one strict. → (p_partkey, price_c, p_size).

    Scale shape: skyline(A ∪ B) ⊆ skyline(A) ∪ skyline(B), so a per-batch
    PARTIAL skyline is a valid combiner — every block reduces to its own
    skyline (≤ distinct-price points) before anything moves, and the
    final pass re-runs the identical sweep over the concatenated partials
    in one task. The fact table never shuffles."""
    part = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])

    def prep(batch: pa.Table) -> pa.Table:
        price_c = np.rint(np.asarray(batch.column("p_retailprice"),
                                     np.float64) * 100.0).astype(np.int64)
        return pa.table({
            "p_partkey": pc.cast(batch.column("p_partkey"), pa.int64()),
            "price_c": pa.array(price_c, pa.int64()),
            "p_size": pc.cast(batch.column("p_size"), pa.int64()),
        })

    def sky(batch: pa.Table) -> pa.Table:
        mask = _skyline_mask(np.asarray(batch.column("price_c"), np.int64),
                             np.asarray(batch.column("p_size"), np.int64),
                             np.asarray(batch.column("p_partkey"), np.int64))
        return batch.filter(pa.array(mask))

    partials = part.map_batches(prep, batch_format="pyarrow",
                                zero_copy_batch=True).map_batches(
        sky, batch_format="pyarrow")
    return partials.repartition(1).map_batches(sky, batch_format="pyarrow",
                                               batch_size=None)


def priority_value_variance(sf_dir: str):
    """Exact distributed variance: per order priority, the SAMPLE
    variance of order totals in cents² as an exact integer —
    var_c2 = (n·Σc² − (Σc)²) // (n·(n−1)).

    Scale shape: one streaming pass of per-batch integer partials. c² (up
    to ~2^52 for 8-digit cent totals) would overflow int64 when summed
    over a large batch, so each partial carries the square split as
    (Σ hi, Σ lo) with hi = c²>>31, lo = c² & (2^31−1) — both sums stay
    far under 2^63 for any batch size ≤ 2^30 rows. The final fold over
    the O(priorities · blocks) partials reassembles Σc² in arbitrary-
    precision Python ints, so the variance is bit-exact at any scale and
    replayable in DuckDB HUGEINT arithmetic."""
    import pandas as pd

    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    _LO = np.int64((1 << 31) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        prio = batch.column("o_orderpriority").to_numpy(
            zero_copy_only=False)
        c = np.rint(np.asarray(batch.column("o_totalprice"),
                               np.float64) * 100.0).astype(np.int64)
        assert c.size == 0 or c.max() < (1 << 31), \
            "order total cents exceed 2^31: widen the hi/lo split"
        codes, uniq = pd.factorize(prio)
        k = len(uniq)
        sq = c * c
        return pa.table({
            "o_orderpriority": pa.array(np.asarray(uniq, object),
                                        pa.string()),
            "n": pa.array(np.bincount(codes, minlength=k).astype(np.int64),
                          pa.int64()),
            "sum_c": pa.array(int_bincount(codes, c, k), pa.int64()),
            "ssq_hi": pa.array(int_bincount(codes, sq >> 31, k),
                               pa.int64()),
            "ssq_lo": pa.array(int_bincount(codes, sq & _LO, k),
                               pa.int64()),
        })

    def fold(batch: pa.Table) -> pa.Table:
        prio = batch.column("o_orderpriority").to_numpy(
            zero_copy_only=False)
        codes, uniq = pd.factorize(prio)
        k = len(uniq)
        # int_bincount, not bincount(weights=): the hi-word sums pass
        # 2^53 long before int64 overflows, and float64 weights would
        # silently round there
        n = int_bincount(codes, np.asarray(batch.column("n"), np.int64), k)
        sc = int_bincount(codes, np.asarray(batch.column("sum_c"),
                                            np.int64), k)
        hi = int_bincount(codes, np.asarray(batch.column("ssq_hi"),
                                            np.int64), k)
        lo = int_bincount(codes, np.asarray(batch.column("ssq_lo"),
                                            np.int64), k)
        var = np.empty(k, np.int64)
        for i in range(k):  # k = priority vocabulary, a handful of rows
            ssq = (int(hi[i]) << 31) + int(lo[i])
            ni, si = int(n[i]), int(sc[i])
            var[i] = ((ni * ssq - si * si) // (ni * (ni - 1))
                      if ni > 1 else 0)
        return pa.table({
            "o_orderpriority": pa.array(np.asarray(uniq, object),
                                        pa.string()),
            "n_orders": pa.array(n, pa.int64()),
            "sum_c": pa.array(sc, pa.int64()),
            "var_c2": pa.array(var, pa.int64()),
        })

    return (orders.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(1).map_batches(fold, batch_format="pyarrow",
                                        batch_size=None))


def lineitem_corr(sf_dir: str):
    """Grouped Pearson correlation / population covariance / OLS slope
    between quantity (units) and extended price (cents) per
    (l_returnflag, l_linestatus) — the two-variable analogue of
    priority_value_variance, same exact-integer protocol.

    Scale shape: one streaming pass of per-batch integer partials
    (n, Σx, Σy, Σx², Σxy, Σy²). The big square/cross terms (y² up to
    ~2^47 for 8-digit cent prices) would overflow int64 summed across
    enough batches, so each partial carries them split as
    (Σ hi, Σ lo) with hi = t>>31, lo = t & (2^31−1); the final fold
    reassembles them in arbitrary-precision Python ints, so every
    sufficient statistic is bit-exact at any scale (the DuckDB oracle
    replays them in HUGEINT). The derived DOUBLEs are each ONE IEEE
    expression over exact integers — float summation order never
    appears:
      corr  = (nΣxy−ΣxΣy) / (√(nΣx²−Σx²́) · √(nΣy²−Σy²́))
      covar = (nΣxy−ΣxΣy) / n²           (population)
      slope = (nΣxy−ΣxΣy) / (nΣx²−Σx²́)  (OLS of price on quantity)
    with zero-variance groups pinned to 0.0 on both sides."""
    import pandas as pd

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice"])
    _LO = np.int64((1 << 31) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        flag = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        stat = batch.column("l_linestatus").to_numpy(zero_copy_only=False)
        x = np.rint(np.asarray(batch.column("l_quantity"),
                               np.float64)).astype(np.int64)
        y = np.rint(np.asarray(batch.column("l_extendedprice"),
                               np.float64) * 100.0).astype(np.int64)
        assert y.size == 0 or (y.max() < (1 << 31) and x.max() < (1 << 16)), \
            "value exceeds the hi/lo split bounds: widen the split"
        codes, uniq = dense_pair_codes(flag, stat)
        k = len(uniq[0])
        xy = x * y
        yy = y * y
        cols = {
            "l_returnflag": pa.array(np.asarray(uniq[0], object),
                                     pa.string()),
            "l_linestatus": pa.array(np.asarray(uniq[1], object),
                                     pa.string()),
            "n": pa.array(np.bincount(codes, minlength=k).astype(np.int64),
                          pa.int64()),
            "sx": pa.array(int_bincount(codes, x, k), pa.int64()),
            "sy": pa.array(int_bincount(codes, y, k), pa.int64()),
            "sxx": pa.array(int_bincount(codes, x * x, k), pa.int64()),
            "sxy_hi": pa.array(int_bincount(codes, xy >> 31, k), pa.int64()),
            "sxy_lo": pa.array(int_bincount(codes, xy & _LO, k), pa.int64()),
            "syy_hi": pa.array(int_bincount(codes, yy >> 31, k), pa.int64()),
            "syy_lo": pa.array(int_bincount(codes, yy & _LO, k), pa.int64()),
        }
        return pa.table(cols)

    def fold(batch: pa.Table) -> pa.Table:
        flag = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        stat = batch.column("l_linestatus").to_numpy(zero_copy_only=False)
        codes, uniq = dense_pair_codes(flag, stat)
        k = len(uniq[0])
        acc = {c: int_bincount(codes, np.asarray(batch.column(c), np.int64),
                               k)
               for c in ("n", "sx", "sy", "sxx",
                         "sxy_hi", "sxy_lo", "syy_hi", "syy_lo")}
        corr = np.zeros(k, np.float64)
        covar = np.zeros(k, np.float64)
        slope = np.zeros(k, np.float64)
        for i in range(k):  # k = flag×status vocabulary, a handful
            n, sx, sy = int(acc["n"][i]), int(acc["sx"][i]), int(acc["sy"][i])
            sxx = int(acc["sxx"][i])
            sxy = (int(acc["sxy_hi"][i]) << 31) + int(acc["sxy_lo"][i])
            syy = (int(acc["syy_hi"][i]) << 31) + int(acc["syy_lo"][i])
            num = n * sxy - sx * sy
            dx = n * sxx - sx * sx
            dy = n * syy - sy * sy
            if dx > 0 and dy > 0:
                corr[i] = (float(num)
                           / (np.sqrt(float(dx)) * np.sqrt(float(dy))))
            covar[i] = float(num) / float(n * n) if n else 0.0
            if dx > 0:
                slope[i] = float(num) / float(dx)
        return pa.table({
            "l_returnflag": pa.array(np.asarray(uniq[0], object),
                                     pa.string()),
            "l_linestatus": pa.array(np.asarray(uniq[1], object),
                                     pa.string()),
            "n": pa.array(acc["n"], pa.int64()),
            "sum_q": pa.array(acc["sx"], pa.int64()),
            "sum_price_c": pa.array(acc["sy"], pa.int64()),
            "corr_qp": pa.array(corr, pa.float64()),
            "covar_qp": pa.array(covar, pa.float64()),
            "slope_qp": pa.array(slope, pa.float64()),
        })

    return (li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(1).map_batches(fold, batch_format="pyarrow",
                                        batch_size=None))


def parts_churn(sf_dir: str, year_a: int = 1996, year_b: int = 1997):
    """Set difference (EXCEPT): parts shipped in year A but never in
    year B. One shuffle: per-row year indicators, grouped MAX per
    partkey, filter has_a AND NOT has_b — the two distinct sets and the
    anti-join collapse into a single int-key aggregation."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate"])

    def prep(batch: pa.Table) -> pa.Table:
        yr = np.asarray(pc.year(batch.column("l_shipdate")), np.int64)
        keep = (yr == year_a) | (yr == year_b)
        pk = np.asarray(batch.column("l_partkey"), np.int64)[keep]
        yk = yr[keep]
        return pa.table({
            "l_partkey": pa.array(pk, pa.int64()),
            "in_a": pa.array((yk == year_a).astype(np.int64), pa.int64()),
            "in_b": pa.array((yk == year_b).astype(np.int64), pa.int64()),
        })

    from ray.data.aggregate import Max

    agg = (li.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("l_partkey")
           .aggregate(Max("in_a", alias_name="has_a"),
                      Max("in_b", alias_name="has_b")))

    def fin(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(batch.column("has_a"), 1),
                       pc.equal(batch.column("has_b"), 0))
        t = batch.filter(keep)
        return pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def above_segment_avg(sf_dir: str, num: int = 15, den: int = 10):
    """Correlated-subquery shape: customers whose total order spend
    exceeds num/den × their market segment's average customer spend.
    → (c_custkey, c_mktsegment, spent_c).

    Scale shape: per-customer spend is one int-key aggregation over the
    fact table; the per-segment (Σ spend, n customers) table is a
    handful of rows pulled once and broadcast via ray.put; the filter
    replays the exact integer cross-multiplication spent·den·n >
    num·Σspend inside map_batches — no second pass over orders and no
    float division on either side."""
    import ray

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def cents(batch: pa.Table) -> pa.Table:
        price_c = np.rint(np.asarray(batch.column("o_totalprice"),
                                     np.float64) * 100.0).astype(np.int64)
        return pa.table({
            "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
            "price_c": pa.array(price_c, pa.int64()),
        })

    spent = (orders.map_batches(cents, batch_format="pyarrow",
                                zero_copy_batch=True)
             .groupby("o_custkey")
             .aggregate(Sum("price_c", alias_name="spent_c")))
    j = hash_join(spent, cust, on=("o_custkey",),
                  right_on=("c_custkey",)).materialize()
    seg_rows = (j.groupby("c_mktsegment")
                .aggregate(Sum("spent_c", alias_name="seg_sum"),
                           Count(alias_name="seg_n")).take_all())
    seg = {r["c_mktsegment"]: (int(r["seg_sum"]), int(r["seg_n"]))
           for r in seg_rows}
    seg_ref = ray.put(seg)

    class _Filter:
        def __init__(self, ref):
            self.seg = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            segn = batch.column("c_mktsegment").to_numpy(
                zero_copy_only=False)
            spent_c = np.asarray(batch.column("spent_c"), np.int64)
            import pandas as pd

            codes, uniq = pd.factorize(segn)
            ssum = np.array([self.seg[s][0] for s in uniq], np.int64)
            sn = np.array([self.seg[s][1] for s in uniq], np.int64)
            # loud int64 overflow guard on the cross-multiplication
            assert spent_c.size == 0 or (
                spent_c.max() < (1 << 62) // (den * max(1, sn.max()))
                and ssum.max() < (1 << 62) // num), \
                "cross-multiplication would overflow int64: use HUGEINT"
            keep = spent_c * den * sn[codes] > num * ssum[codes]
            t = batch.filter(pa.array(keep))
            return pa.table({
                "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "c_mktsegment": pc.cast(t.column("c_mktsegment"),
                                        pa.string()),
                "spent_c": pc.cast(t.column("spent_c"), pa.int64()),
            })

    return j.map_batches(_Filter, fn_constructor_args=(seg_ref,),
                         concurrency=(1, 8), batch_format="pyarrow")


def events_hopping(sf_dir: str, size_us: int = 3_600_000_000,
                   hop_us: int = 1_800_000_000):
    """Hopping (overlapping) windows: event counts per type per 1-hour
    window sliding by 30 minutes — each event lands in size/hop = 2
    windows. The expansion is a vectorized per-batch flat emit (no
    per-window pass over the fact table), then one grouped count; the
    output is O(types · windows) however large the event stream is."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])
    k = size_us // hop_us

    def expand(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        base = us // hop_us * hop_us  # newest window containing t
        starts = np.concatenate([base - j * hop_us for j in range(k)])
        et = pa.concat_arrays(
            [batch.column("event_type").combine_chunks()] * k)
        return pa.table({
            "event_type": et,
            "window_start": pa.array(starts.astype("datetime64[us]"),
                                     pa.timestamp("us")),
        })

    from ray.data.aggregate import Count

    agg = (ev.map_batches(expand, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["event_type", "window_start"])
           .aggregate(Count(alias_name="n_events")))

    def fix_unit(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("window_start"), "window_start",
            pc.cast(batch.column("window_start"), pa.timestamp("us")))

    return agg.map_batches(fix_unit, batch_format="pyarrow")


def distinct_users_by_type(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): distinct users per event type.
    Per-batch pair pre-distinct (factorize + unique) shrinks every block
    BEFORE the shuffle; the pair groupby finishes the global distinct
    and a second tiny aggregation counts per type. The canonical
    two-phase distinct-count shape (the approximate sibling is
    distinct_kmv)."""
    import pandas as pd

    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def pre_distinct(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        uid = np.asarray(batch.column("user_id"), np.int64)
        codes, uniq = pd.factorize(et)
        key = codes.astype(np.int64) * (uid.max() + 1 if len(uid) else 1) \
            + uid
        _, idx = np.unique(key, return_index=True)
        return batch.take(pa.array(np.sort(idx)))

    pairs = (ev.map_batches(pre_distinct, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby(["event_type", "user_id"])
             .aggregate(Count(alias_name="n_")))
    return (pairs.groupby("event_type")
            .aggregate(Count(alias_name="n_users")))


def lineitem_ols(sf_dir: str):
    """Distributed exact OLS sums: per returnflag, the linear-regression
    sufficient statistics of extended price (cents) on quantity
    (hundredths) — n, Σx, Σy, Σxy, Σxx, all exact BIGINTs (inputs carry
    2 decimals, so the products are exact integers — no quantization
    step needed). slope = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) is derivable on
    either side. One streaming pass of per-batch bincount partials."""
    import pandas as pd

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        x = np.rint(np.asarray(batch.column("l_quantity"),
                               np.float64) * 100.0).astype(np.int64)
        y = np.rint(np.asarray(batch.column("l_extendedprice"),
                               np.float64) * 100.0).astype(np.int64)
        codes, uniq = pd.factorize(rf)
        m = len(uniq)
        out = {"n": np.bincount(codes, minlength=m).astype(np.int64)}
        for name, v in (("sum_x", x), ("sum_y", y),
                        ("sum_xy", x * y), ("sum_xx", x * x)):
            acc = np.zeros(m, np.int64)
            np.add.at(acc, codes, v)
            out[name] = acc
        cols = {"l_returnflag": pa.array(np.asarray(uniq, object),
                                         pa.string())}
        cols.update({k: pa.array(v, pa.int64()) for k, v in out.items()})
        return pa.table(cols)

    def merge(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(rf)
        m = len(uniq)
        cols = {"l_returnflag": pa.array(np.asarray(uniq, object),
                                         pa.string())}
        for c in ("n", "sum_x", "sum_y", "sum_xy", "sum_xx"):
            acc = np.zeros(m, np.int64)
            np.add.at(acc, codes, np.asarray(batch.column(c), np.int64))
            cols[c] = pa.array(acc, pa.int64())
        return pa.table(cols)

    return (li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(1).map_batches(merge, batch_format="pyarrow",
                                        batch_size=None))


def orders_status_pivot(sf_dir: str):
    """Conditional aggregates (PIVOT shape): per order year, the order
    count and exact revenue cents per status code as columns. Per-batch
    masked bincount partials keyed by year; the status vocabulary is
    fixed (O/F/P), so the pivot costs one pass and the merge input is
    O(years · blocks)."""
    orders = _read(sf_dir, "orders",
                   ["o_orderstatus", "o_totalprice", "o_orderdate"])
    statuses = ("O", "F", "P")

    def partial(batch: pa.Table) -> pa.Table:
        yr = np.asarray(pc.year(batch.column("o_orderdate")), np.int64)
        st = batch.column("o_orderstatus").to_numpy(zero_copy_only=False)
        price_c = np.rint(np.asarray(batch.column("o_totalprice"),
                                     np.float64) * 100.0).astype(np.int64)
        uy, inv = np.unique(yr, return_inverse=True)
        cols = {"o_year": pa.array(uy, pa.int64())}
        for s in statuses:
            mask = st == s
            n = np.bincount(inv[mask], minlength=len(uy)).astype(np.int64)
            r = np.zeros(len(uy), np.int64)
            np.add.at(r, inv[mask], price_c[mask])
            cols[f"n_{s}"] = pa.array(n, pa.int64())
            cols[f"rev_{s}_c"] = pa.array(r, pa.int64())
        return pa.table(cols)

    def merge(batch: pa.Table) -> pa.Table:
        yr = np.asarray(batch.column("o_year"), np.int64)
        uy, inv = np.unique(yr, return_inverse=True)
        cols = {"o_year": pa.array(uy, pa.int64())}
        for c in batch.column_names:
            if c == "o_year":
                continue
            acc = np.zeros(len(uy), np.int64)
            np.add.at(acc, inv, np.asarray(batch.column(c), np.int64))
            cols[c] = pa.array(acc, pa.int64())
        return pa.table(cols)

    return (orders.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(1).map_batches(merge, batch_format="pyarrow",
                                        batch_size=None))


def _week_floor_us(ts: np.ndarray) -> np.ndarray:
    """datetime64 → Monday-aligned week start as datetime64[us]
    (DuckDB's date_trunc('week') convention; numpy's 'W' unit aligns to
    Thursday and would diverge)."""
    dse = ts.astype("datetime64[D]").astype(np.int64)
    monday = dse - ((dse - 4) % 7)  # 1970-01-05 (dse=4) was a Monday
    return monday.astype("datetime64[D]").astype("datetime64[us]")


def priority_price_quartiles(sf_dir: str, shift: int = 12):
    """Grouped INTERPOLATED quantiles (quantile_cont semantics: value at
    fractional rank h = p·(n−1) is v[⌊h⌋] + (h−⌊h⌋)·(v[⌊h⌋+1]−v[⌊h⌋]))
    — q1/median/q3 of order totals per priority, plus the count of
    upper-IQR outliers (price > q3 + 1.5·IQR). Complements order_deciles
    (discrete NTILE): this is the continuous-percentile op.

    Scale shape (the deciles 2-pass selection, no sort, no fact row
    moves): pass 1 folds a per-priority COARSE histogram
    (price_c >> shift — domain-bounded, ≤ |price domain|/2^shift rows);
    the needed order-statistic ranks land in ≤ 6 buckets per group;
    pass 2 folds an EXACT-price histogram restricted to those buckets
    (≤ 6·2^shift entries per group, bounded by bucket WIDTH — mass ties
    cannot blow it); pass 3 counts outliers against thresholds shipped
    in the task closure. The interpolation DOUBLE is one pinned IEEE
    expression over exact integer order statistics — the oracle selects
    the same ranks with ROW_NUMBER and replays the identical formula."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def proj(batch: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(batch.column("o_totalprice"),
                               np.float64) * 100.0).astype(np.int64)
        return pa.table({
            "prio": batch.column("o_orderpriority"),
            "price_c": pa.array(c, pa.int64()),
        })

    po = orders.map_batches(proj, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def bucket_hist(batch: pa.Table) -> pa.Table:
        prio = batch.column("prio").to_numpy(zero_copy_only=False)
        b = np.asarray(batch.column("price_c"), np.int64) >> shift
        codes, uniq = dense_pair_codes(prio, b)
        cnt = np.bincount(codes, minlength=len(uniq[0])).astype(np.int64)
        return pa.table({
            "prio": pa.array(np.asarray(uniq[0], object), pa.string()),
            "bucket": pa.array(uniq[1].astype(np.int64), pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        })

    hist = (po.map_batches(bucket_hist, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["prio", "bucket"]).aggregate(
                Sum("cnt", alias_name="cnt")).take_all())
    prios = sorted({r["prio"] for r in hist})
    P_QS = (0.25, 0.5, 0.75)
    # per prio: cumulative coarse histogram → needed (rank → bucket)
    need: dict = {}
    ranks: dict = {}
    ns: dict = {}
    for p in prios:
        rows = sorted((r["bucket"], r["cnt"]) for r in hist
                      if r["prio"] == p)
        bks = np.array([b for b, _ in rows], np.int64)
        cs = np.array([c for _, c in rows], np.int64)
        cum = np.concatenate([[0], np.cumsum(cs)])
        n = int(cum[-1])
        ns[p] = n
        want = []
        for q in P_QS:
            h = q * (n - 1)
            lo = int(np.floor(h))
            want += [lo, min(lo + 1, n - 1)]
        ranks[p] = want
        bpos = np.searchsorted(cum[1:], np.array(want), side="right")
        need[p] = set(bks[bpos].tolist())

    def exact_price(batch: pa.Table) -> pa.Table:
        prio = batch.column("prio").to_numpy(zero_copy_only=False)
        c = np.asarray(batch.column("price_c"), np.int64)
        keep = np.zeros(len(c), bool)
        for p, bset in need.items():
            keep |= (prio == p) & np.isin(c >> shift,
                                          np.fromiter(bset, np.int64))
        prio, c = prio[keep], c[keep]
        codes, uniq = dense_pair_codes(prio, c)
        cnt = np.bincount(codes, minlength=len(uniq[0])).astype(np.int64)
        return pa.table({
            "prio": pa.array(np.asarray(uniq[0], object), pa.string()),
            "price_c": pa.array(uniq[1].astype(np.int64), pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        })

    ep = (po.map_batches(exact_price, batch_format="pyarrow",
                         zero_copy_batch=True)
          .repartition(1)
          .groupby(["prio", "price_c"]).aggregate(
              Sum("cnt", alias_name="cnt")).take_all())
    qs: dict = {}
    for p in prios:
        rows = sorted((r["price_c"], r["cnt"]) for r in ep
                      if r["prio"] == p)
        vals = np.array([v for v, _ in rows], np.int64)
        cs = np.array([c for _, c in rows], np.int64)
        # global start rank of each exact value = rows in earlier coarse
        # buckets + rows on smaller values within the same bucket
        hrows = sorted((r["bucket"], r["cnt"]) for r in hist
                       if r["prio"] == p)
        hb = np.array([b for b, _ in hrows], np.int64)
        hc = np.array([c for _, c in hrows], np.int64)
        hcum = np.concatenate([[0], np.cumsum(hc)])
        vb = vals >> shift
        run = np.cumsum(cs) - cs
        first = np.r_[True, vb[1:] != vb[:-1]]
        seg0 = np.maximum.accumulate(np.where(first, run, 0))
        start = hcum[np.searchsorted(hb, vb)] + (run - seg0)

        def val_at(rank: int) -> int:
            i = int(np.searchsorted(start, rank, side="right")) - 1
            return int(vals[i])

        n = ns[p]
        out = []
        for qi, q in enumerate(P_QS):
            h = q * (n - 1)
            lo = int(np.floor(h))
            vlo = val_at(ranks[p][2 * qi])
            vhi = val_at(ranks[p][2 * qi + 1])
            out.append(float(vlo) + (h - lo)
                       * (float(vhi) - float(vlo)))
        qs[p] = out

    thr = {p: qs[p][2] + 1.5 * (qs[p][2] - qs[p][0]) for p in prios}

    def outlier_partial(batch: pa.Table) -> pa.Table:
        prio = batch.column("prio").to_numpy(zero_copy_only=False)
        c = np.asarray(batch.column("price_c"), np.int64)
        ps, cnts = [], []
        for p, t in thr.items():
            ps.append(p)
            cnts.append(int((c[prio == p].astype(np.float64) > t).sum()))
        return pa.table({"prio": pa.array(ps, pa.string()),
                         "n_out": pa.array(cnts, pa.int64())})

    outs = (po.map_batches(outlier_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("prio").aggregate(
                Sum("n_out", alias_name="n_out")).take_all())
    omap = {r["prio"]: int(r["n_out"]) for r in outs}
    return pa.table({
        "o_orderpriority": pa.array(prios, pa.string()),
        "n": pa.array([ns[p] for p in prios], pa.int64()),
        "q1": pa.array([qs[p][0] for p in prios], pa.float64()),
        "median": pa.array([qs[p][1] for p in prios], pa.float64()),
        "q3": pa.array([qs[p][2] for p in prios], pa.float64()),
        "n_outliers_hi": pa.array([omap.get(p, 0) for p in prios],
                                  pa.int64()),
    })


def daily_new_users(sf_dir: str):
    """Running DISTINCT-over-time without a running distinct: each
    user's FIRST-SEEN day (an associative grouped MIN — per-batch
    partials, one grouped min), then per-day first-seen counts with a
    global running total folded in one bounded merge (O(days) rows).
    The cumulative row for day d equals COUNT(DISTINCT user) over all
    events up to d — computed without ever holding a distinct set.

    → (day ISO string, n_new, cum_users), exact BIGINTs."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("user_id"), np.int64)
        day = pc.strftime(batch.column("ts"),
                          format="%Y-%m-%d").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, u))
        us, ds_ = u[order], day[order]
        first = np.r_[True, us[1:] != us[:-1]]
        return pa.table({
            "user_id": pa.array(us[first], pa.int64()),
            "day": pa.array(np.asarray(ds_[first], object), pa.string()),
        })

    firsts = (ev.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("user_id").aggregate(Min("day", alias_name="day")))

    def day_counts(batch: pa.Table) -> pa.Table:
        day = batch.column("day").to_numpy(zero_copy_only=False)
        ud, cnt = np.unique(day, return_counts=True)
        return pa.table({
            "day": pa.array(np.asarray(ud, object), pa.string()),
            "n_new": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    def running(batch: pa.Table) -> pa.Table:
        day = batch.column("day").to_numpy(zero_copy_only=False)
        n = np.asarray(batch.column("n_new"), np.int64)
        ud, inv = np.unique(day, return_inverse=True)
        tot = int_bincount(inv, n, len(ud))
        return pa.table({
            "day": pa.array(np.asarray(ud, object), pa.string()),
            "n_new": pa.array(tot, pa.int64()),
            "cum_users": pa.array(np.cumsum(tot), pa.int64()),
        })

    return (firsts.map_batches(day_counts, batch_format="pyarrow")
            .repartition(1).map_batches(running, batch_format="pyarrow",
                                        batch_size=None))


def retention_cohorts(sf_dir: str, num_partitions: int = 64):
    """Cohort retention matrix: users grouped by their FIRST event week
    (cohort), counted once per (cohort, activity week) they were active
    in. One user-hash bucket shuffle (the sessionize pattern)
    co-locates each user; the per-partition pass computes first-week
    and distinct activity weeks vectorized, emitting bounded
    (cohort, week, n) partials."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id"), np.int64)
        part = ((uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(33)) % np.uint64(num_partitions)
        week = _week_floor_us(batch.column("ts").to_numpy())
        return pa.table({
            "user_id": pa.array(uid, pa.int64()),
            "month": pa.array(week, pa.timestamp("us")),
            "part": pa.array(part.astype(np.int64), pa.int64()),
        })

    def emit(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy().astype(np.int64)
        mo = group.column("month").to_numpy()
        users, inv = np.unique(uid, return_inverse=True)
        first = np.full(len(users), np.datetime64("2200-01", "us"))
        np.minimum.at(first, inv, mo)
        # distinct (user, month) pairs, then count per (cohort, month)
        order = np.lexsort((mo.view(np.int64), inv))
        iu, im = inv[order], mo[order]
        keep = np.ones(len(iu), bool)
        keep[1:] = (iu[1:] != iu[:-1]) | (im[1:] != im[:-1])
        cu, cm = iu[keep], im[keep]
        key = np.stack([first[cu].view(np.int64), cm.view(np.int64)])
        uk, cnt = np.unique(key, axis=1, return_counts=True)
        return pa.table({
            "cohort_week": pa.array(uk[0].view("datetime64[us]"),
                                     pa.timestamp("us")),
            "week": pa.array(uk[1].view("datetime64[us]"),
                              pa.timestamp("us")),
            "n_users": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    partials = (ev.map_batches(add_part, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("part").map_groups(emit, batch_format="pyarrow"))

    def merge(batch: pa.Table) -> pa.Table:
        ch = batch.column("cohort_week").to_numpy().astype(np.int64)
        mo = batch.column("week").to_numpy().astype(np.int64)
        n = np.asarray(batch.column("n_users"), np.int64)
        key = np.stack([ch, mo])
        uk, inv = np.unique(key, axis=1, return_inverse=True)
        s = np.zeros(uk.shape[1], np.int64)
        np.add.at(s, inv, n)
        return pa.table({
            "cohort_week": pa.array(uk[0].view("datetime64[us]"),
                                     pa.timestamp("us")),
            "week": pa.array(uk[1].view("datetime64[us]"),
                              pa.timestamp("us")),
            "n_users": pa.array(s, pa.int64()),
        })

    return partials.repartition(1).map_batches(merge,
                                               batch_format="pyarrow",
                                               batch_size=None)


def event_type_pairs(sf_dir: str, num_partitions: int = 64):
    """Market-basket pair support: for every unordered pair of event
    types, how many users performed BOTH. One user-bucket shuffle
    co-locates each user; the per-partition pass builds a per-user type
    BITMASK (bitwise-or scatter — idempotent, so no distinct pass) and
    counts each pair with two shifts and an AND. Partials are
    O(type², partitions) rows — the type vocabulary is tiny, the user
    dimension never leaves the partitions."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id"), np.int64)
        part = ((uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(33)) % np.uint64(num_partitions)
        return batch.append_column(
            "part", pa.array(part.astype(np.int64), pa.int64()))

    def emit(group: pa.Table) -> pa.Table:
        import pandas as pd

        uid = group.column("user_id").to_numpy().astype(np.int64)
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        tcodes, types = pd.factorize(et)
        assert len(types) <= 62, "type vocabulary exceeds the bitmask"
        users, uinv = np.unique(uid, return_inverse=True)
        mask = np.zeros(len(users), np.int64)
        np.bitwise_or.at(mask, uinv, np.int64(1) << tcodes.astype(np.int64))
        ta, tb, n = [], [], []
        order = np.argsort(np.asarray(types, object))
        for i in range(len(order)):
            for j in range(i + 1, len(order)):
                a, b = order[i], order[j]
                both = ((mask >> np.int64(a)) & 1) \
                    & ((mask >> np.int64(b)) & 1)
                ta.append(types[a])
                tb.append(types[b])
                n.append(int(both.sum()))
        return pa.table({
            "type_a": pa.array(ta, pa.string()),
            "type_b": pa.array(tb, pa.string()),
            "n_users": pa.array(np.array(n, np.int64), pa.int64()),
        })

    partials = (ev.map_batches(add_part, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("part").map_groups(emit, batch_format="pyarrow"))

    def merge(batch: pa.Table) -> pa.Table:
        import pandas as pd

        key = pd.Series(
            batch.column("type_a").to_numpy(zero_copy_only=False)
        ).str.cat(pd.Series(
            batch.column("type_b").to_numpy(zero_copy_only=False)),
            sep=" ")
        codes, uniq = pd.factorize(key.to_numpy())
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, codes, np.asarray(batch.column("n_users"), np.int64))
        parts = pd.Series(uniq).str.partition(" ")
        keep = s > 0
        return pa.table({
            "type_a": pa.array(parts[0].to_numpy()[keep], pa.string()),
            "type_b": pa.array(parts[2].to_numpy()[keep], pa.string()),
            "n_users": pa.array(s[keep], pa.int64()),
        })

    return partials.repartition(1).map_batches(merge,
                                               batch_format="pyarrow",
                                               batch_size=None)


# ---------------------------------------------------------------------------
# band (time-range) join via broadcast prefix histogram
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def ship_window_counts(sf_dir: str, window_days: int = 7):
    """Band join: for every order, the number of lineitems (across ALL
    orders) shipped in [o_orderdate, o_orderdate + window_days). A naive
    plan is an inequality join (orders × lineitem) — quadratic blow-up
    under skewed date ranges. Dates are day-granular (checked in the
    generator contract), so the 1-D range count collapses to a prefix
    histogram: one streaming pass pre-aggregates lineitem shipdates to
    per-day counts (calendar-bounded — thousands of rows at ANY data
    scale), the driver folds them into a cumulative array that ships in
    the probe-task closure, and every orders batch answers its band
    counts with two vectorized searchsorteds. No fact-table row is ever
    replicated; wire volume is O(days), not O(rows)."""
    li = _read(sf_dir, "lineitem", ["l_shipdate"])

    def day_counts(batch: pa.Table) -> pa.Table:
        day = (np.asarray(batch.column("l_shipdate"), "datetime64[us]")
               .view(np.int64) // _DAY_US)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    hist = (li.map_batches(day_counts, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("day").aggregate(Sum("cnt", alias_name="cnt"))
            .take_all())
    days = np.array([r["day"] for r in hist], np.int64)
    order = np.argsort(days)
    days = days[order]
    counts = np.array([r["cnt"] for r in hist], np.int64)[order]
    cum = np.zeros(len(days) + 1, np.int64)
    np.cumsum(counts, out=cum[1:])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    # the day histogram is calendar-bounded (thousands of int64s): ship
    # it in the task closure, no actor pool needed

    def band_count(batch: pa.Table) -> pa.Table:
        d0 = (np.asarray(batch.column("o_orderdate"),
                         "datetime64[us]").view(np.int64) // _DAY_US)
        lo = np.searchsorted(days, d0, side="left")
        hi = np.searchsorted(days, d0 + window_days, side="left")
        n = cum[hi] - cum[lo]
        return pa.table({
            "o_orderkey": pc.cast(batch.column("o_orderkey"),
                                  pa.int64()),
            "n_shipped_7d": pa.array(n, pa.int64()),
        })

    return orders.map_batches(band_count, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------------------
# full outer join (reconciliation shape)
# ---------------------------------------------------------------------------

def customer_event_outer(sf_dir: str, min_price: float = 300_000.0):
    """FULL OUTER reconciliation of two independently-keyed aggregates:
    high-value order spend per customer vs event activity per user (the
    two id spaces overlap but neither contains the other once the order
    side is threshold-filtered). Both sides pre-aggregate to one row per
    key INSIDE the engine before the join, so the outer exchange carries
    |keys|, not |facts|. Null-free output contract: absent sides surface
    as 0-filled columns plus has_hv / has_ev indicator bits — int64
    everywhere, so the hash compare never meets a NaN-vs-NULL ambiguity."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def hv(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch.column("o_totalprice"),
                                    min_price))
        price_c = np.rint(np.asarray(t.column("o_totalprice"),
                                     np.float64) * 100.0).astype(np.int64)
        return pa.table({
            "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            "price_c": pa.array(price_c, pa.int64()),
        })

    left = (orders.map_batches(hv, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("o_custkey")
            .aggregate(Count(alias_name="hv_n"),
                       Sum("price_c", alias_name="hv_sum_c")))

    events = _read(sf_dir, "events", ["user_id", "value"])

    def ev(batch: pa.Table) -> pa.Table:
        val_c = np.rint(np.asarray(batch.column("value"),
                                   np.float64) * 100.0).astype(np.int64)
        return pa.table({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "value_c": pa.array(val_c, pa.int64()),
        })

    right = (events.map_batches(ev, batch_format="pyarrow",
                                zero_copy_batch=True)
             .groupby("user_id")
             .aggregate(Count(alias_name="ev_n"),
                        Sum("value_c", alias_name="ev_value_c")))

    j = hash_join(left, right, on=("o_custkey",), right_on=("user_id",),
                  join_type="full_outer")

    def fin(batch: pa.Table) -> pa.Table:
        # Ray's full_outer coalesces the join key into the LEFT column
        # name, so o_custkey is already non-null on right-only rows
        key = np.asarray(batch.column("o_custkey"), np.int64)

        def fill(name):
            return np.asarray(
                pc.fill_null(batch.column(name), 0), np.int64)

        hv_n = fill("hv_n")
        ev_n = fill("ev_n")
        return pa.table({
            "custkey": pa.array(key, pa.int64()),
            "hv_n": pa.array(hv_n, pa.int64()),
            "hv_sum_c": pa.array(fill("hv_sum_c"), pa.int64()),
            "ev_n": pa.array(ev_n, pa.int64()),
            "ev_value_c": pa.array(fill("ev_value_c"), pa.int64()),
            "has_hv": pa.array((hv_n > 0).astype(np.int64), pa.int64()),
            "has_ev": pa.array((ev_n > 0).astype(np.int64), pa.int64()),
        })

    return j.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact global NTILE via boundary-key selection
# ---------------------------------------------------------------------------

def order_deciles(sf_dir: str, k: int = 10, shift: int = 6,
                  pull_cap: int = 1_000_000):
    """EXACT global NTILE(k) over orders ordered by (o_totalprice,
    o_orderkey), aggregated per tile — the total-order bucketing op. A
    naive plan global-sorts the fact table; this one never sorts and
    never moves a fact row:

    pass 1 streams per-batch counts over coarse price buckets
    (price_c >> shift; the domain is price-bounded, not data-bounded) —
    the driver folds a histogram of ≤ a few million int64s, locates the
    k−1 tile-boundary ranks in the cumulative histogram;
    pass 2 resolves each boundary's exact price via an exact-price
    histogram restricted to the boundary buckets — bounded by the bucket
    WIDTH (≤ |buckets|·2^shift entries), never by how many rows pile
    onto them;
    pass 3 resolves the o_orderkey tie-break: one batched pull for
    boundary prices shared by ≤ pull_cap rows, else per-price 8-bit
    radix narrowing over the key space (a distributed selection — no
    task ever holds more than pull_cap keys);
    pass 4 assigns tiles with k−1 vectorized lexicographic compares
    against the boundary keys shipped in the task closure (keys are
    unique — orderkey breaks price ties — so
    tile = 1 + #{boundaries ≤ key}), and pre-aggregates
    (tile, count, sum) inside each batch; the final groupby folds k
    rows.

    NTILE fill semantics (first n % k tiles take the extra row) are
    encoded in the boundary ranks, matching DuckDB/ANSI exactly."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def proj(batch: pa.Table) -> pa.Table:
        price_c = np.rint(np.asarray(batch.column("o_totalprice"),
                                     np.float64) * 100.0).astype(np.int64)
        return pa.table({
            "o_orderkey": pc.cast(batch.column("o_orderkey"), pa.int64()),
            "price_c": pa.array(price_c, pa.int64()),
        })

    po = orders.map_batches(proj, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def bucket_hist(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch.column("price_c"), np.int64) >> shift
        u, c = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    hist = (po.map_batches(bucket_hist, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt"))
            .take_all())
    buckets = np.array([r["bucket"] for r in hist], np.int64)
    order = np.argsort(buckets)
    buckets = buckets[order]
    cnts = np.array([r["cnt"] for r in hist], np.int64)[order]
    cum = np.zeros(len(buckets) + 1, np.int64)
    np.cumsum(cnts, out=cum[1:])
    n = int(cum[-1])

    # 0-based start rank of tiles 2..k under NTILE fill semantics
    base, extra = divmod(n, k)
    sizes = np.full(k, base, np.int64)
    sizes[:extra] += 1
    bounds_rank = np.cumsum(sizes)[:-1]
    # bucket holding each boundary rank (rank = #rows strictly before)
    bpos = np.searchsorted(cum[1:], bounds_rank, side="right")
    need = np.unique(buckets[bpos])

    # pass 2: EXACT-price histogram restricted to the boundary buckets.
    # Its size is bounded by the bucket WIDTH (≤ |need|·2^shift distinct
    # cent values), NOT by how many rows pile onto them — so mass ties
    # (every order the same price) cannot blow the driver fold
    # the boundary-bucket set is ≤ k−1 ints: ship it in the task
    # closure — an actor pool's startup would dwarf the state it carries

    def exact_price(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch.column("price_c"), np.int64)
        p = p[np.isin(p >> shift, need)]
        u, c = np.unique(p, return_counts=True)
        return pa.table({"price_c": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64),
                                         pa.int64())})

    # ≤ (k−1)·2^shift partial rows per block: one reduce partition
    # suffices (empty reduce partitions emit schemaless RefBundles)
    ep = (po.map_batches(exact_price, batch_format="pyarrow",
                         zero_copy_batch=True)
          .repartition(1)
          .groupby("price_c").aggregate(Sum("cnt", alias_name="cnt"))
          .take_all())
    eprice = np.array([r["price_c"] for r in ep], np.int64)
    eorder = np.argsort(eprice)
    eprice = eprice[eorder]
    ecnt = np.array([r["cnt"] for r in ep], np.int64)[eorder]
    # global start rank of each exact price = rows in earlier coarse
    # buckets + rows on smaller prices within the same bucket
    ebkt = eprice >> shift
    ecum_in = np.zeros(len(eprice), np.int64)
    if len(eprice):
        run = np.cumsum(ecnt) - ecnt
        bstart_first = np.ones(len(ebkt), bool)
        bstart_first[1:] = ebkt[1:] != ebkt[:-1]
        seg0 = np.maximum.accumulate(
            np.where(bstart_first, run, 0))
        ecum_in = run - seg0
    estart = cum[np.searchsorted(buckets, ebkt)] + ecum_in

    # boundary price + residual rank within that price, per target
    pos = np.searchsorted(estart, bounds_rank, side="right") - 1
    b_price = eprice[pos]
    resid = bounds_rank - estart[pos]

    def _okey_at(price: int, r: int) -> int:
        """o_orderkey order statistic r among rows with price_c == price:
        pull directly when few rows share the price, else narrow the key
        range with 8-bit radix histogram passes (bounded partials per
        pass — a distributed selection, never a sort)."""
        lo, hi = 0, 1 << 63
        while True:
            lo_c, hi_c, pr = lo, hi, int(price)

            def count_pass(batch: pa.Table) -> pa.Table:
                p = np.asarray(batch.column("price_c"), np.int64)
                o = np.asarray(batch.column("o_orderkey"), np.int64)
                m = (p == pr) & (o >= lo_c) & (o < hi_c)
                return pa.table({"o_orderkey": pa.array(o[m], pa.int64())})

            span = hi - lo
            if span <= pull_cap:
                rows = (po.map_batches(count_pass, batch_format="pyarrow",
                                       zero_copy_batch=True).take_all())
                ok = np.sort(np.array([x["o_orderkey"] for x in rows],
                                      np.int64))
                return int(ok[r])
            s = max(0, span.bit_length() - 8)

            def digit_hist(batch: pa.Table) -> pa.Table:
                p = np.asarray(batch.column("price_c"), np.int64)
                o = np.asarray(batch.column("o_orderkey"), np.int64)
                m = (p == pr) & (o >= lo_c) & (o < hi_c)
                d = (o[m] - lo_c) >> s
                u, c = np.unique(d, return_counts=True)
                return pa.table({"d": pa.array(u, pa.int64()),
                                 "cnt": pa.array(c.astype(np.int64),
                                                 pa.int64())})

            parts = (po.map_batches(digit_hist, batch_format="pyarrow",
                                    zero_copy_batch=True).take_all())
            dh = np.zeros(257, np.int64)
            total = 0
            for x in parts:
                dh[int(x["d"]) + 1] += int(x["cnt"])
                total += int(x["cnt"])
            if total <= pull_cap:
                # few enough rows left: one exact pull ends the loop
                rows = (po.map_batches(count_pass, batch_format="pyarrow",
                                       zero_copy_batch=True).take_all())
                ok = np.sort(np.array([x["o_orderkey"] for x in rows],
                                      np.int64))
                return int(ok[r])
            dcum = np.cumsum(dh)
            d = int(np.searchsorted(dcum[1:], r, side="right"))
            r -= int(dcum[d])
            lo, hi = lo + (d << s), min(hi, lo + ((d + 1) << s))

    # resolve tie-break keys: ONE pass pulls the keys of every
    # low-multiplicity boundary price together (the common case); only a
    # price shared by >1M rows falls back to per-price radix narrowing
    b_key = np.empty(len(b_price), np.int64)
    small = ecnt[pos] <= pull_cap
    small_prices = np.unique(b_price[small])
    if len(small_prices):
        def pull_keys(batch: pa.Table) -> pa.Table:
            p = np.asarray(batch.column("price_c"), np.int64)
            o = np.asarray(batch.column("o_orderkey"), np.int64)
            m = np.isin(p, small_prices)
            return pa.table({"price_c": pa.array(p[m], pa.int64()),
                             "o_orderkey": pa.array(o[m], pa.int64())})

        rows = (po.map_batches(pull_keys, batch_format="pyarrow",
                               zero_copy_batch=True)
                .take_all())
        pp = np.array([x["price_c"] for x in rows], np.int64)
        ok = np.array([x["o_orderkey"] for x in rows], np.int64)
        so = np.lexsort((ok, pp))
        pp, ok = pp[so], ok[so]
        for i in np.flatnonzero(small):
            a = np.searchsorted(pp, b_price[i], side="left")
            b_key[i] = ok[a + resid[i]]
    for i in np.flatnonzero(~small):
        b_key[i] = _okey_at(int(b_price[i]), int(resid[i]))
    bp_arr, bk_arr = b_price.copy(), b_key.copy()

    def assign(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch.column("price_c"), np.int64)
        o = np.asarray(batch.column("o_orderkey"), np.int64)
        tile = np.ones(len(p), np.int64)
        for bp, bk in zip(bp_arr, bk_arr):
            tile += (p > bp) | ((p == bp) & (o >= bk))
        u, inv = np.unique(tile, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        s_exact = np.zeros(len(u), np.int64)
        np.add.at(s_exact, inv, p)
        return pa.table({"tile": pa.array(u, pa.int64()),
                         "n_orders": pa.array(cnt, pa.int64()),
                         "sum_price_c": pa.array(s_exact, pa.int64())})

    agg = (po.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)
           .repartition(1)  # ≤ k partial rows per block (see ep note)
           .groupby("tile").aggregate(
               Sum("n_orders", alias_name="n_orders"),
               Sum("sum_price_c", alias_name="sum_price_c")))

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile": pc.cast(batch.column("tile"), pa.int64()),
            "n_orders": pc.cast(batch.column("n_orders"), pa.int64()),
            "sum_price_c": pc.cast(batch.column("sum_price_c"),
                                   pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# grouped ordered string aggregation
# ---------------------------------------------------------------------------

def nation_top_names(sf_dir: str, k: int = 5):
    """Grouped ORDERED string aggregation: per nation key, the '|'-joined
    names of its top-k customers by (acctbal DESC, custkey ASC) — the
    string_agg(... ORDER BY ...) shape. Unbounded per-group string
    concatenation cannot scale, so the contract caps the aggregate at k
    rows per group FIRST via the same per-batch partial top-k combiner as
    top_docs_per_group (each block shrinks to ≤ nations·k rows before the
    single tiny merge), making the final string O(k·name_len) per group
    no matter how many customers exist."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey", "c_acctbal"])

    def prep(batch: pa.Table) -> pa.Table:
        bal_c = np.rint(np.asarray(batch.column("c_acctbal"),
                                   np.float64) * 100.0).astype(np.int64)
        return pa.table({
            "c_custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
            "c_name": pc.cast(batch.column("c_name"), pa.string()),
            "c_nationkey": pc.cast(batch.column("c_nationkey"),
                                   pa.int64()),
            "bal_c": pa.array(bal_c, pa.int64()),
        })

    def partial(batch: pa.Table) -> pa.Table:
        nk = np.asarray(batch.column("c_nationkey"), np.int64)
        bal = np.asarray(batch.column("bal_c"), np.int64)
        ck = np.asarray(batch.column("c_custkey"), np.int64)
        order = np.lexsort((ck, -bal, nk))
        g = nk[order]
        pos = np.arange(len(g)) - np.searchsorted(g, g, side="left")
        return batch.take(pa.array(order[pos < k]))

    merged = (cust.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True)
              .map_batches(partial, batch_format="pyarrow")
              .repartition(1))

    def final(batch: pa.Table) -> pa.Table:
        nk = np.asarray(batch.column("c_nationkey"), np.int64)
        bal = np.asarray(batch.column("bal_c"), np.int64)
        ck = np.asarray(batch.column("c_custkey"), np.int64)
        names = batch.column("c_name").to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -bal, nk))
        g = nk[order]
        pos = np.arange(len(g)) - np.searchsorted(g, g, side="left")
        keep = order[pos < k]
        gk = nk[keep]
        kept_names = names[keep]
        new = np.ones(len(gk), bool)
        new[1:] = gk[1:] != gk[:-1]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(gk)]
        nat = gk[starts]
        joined = ["|".join(kept_names[s:e]) for s, e in
                  zip(starts, ends)]
        cnt = (ends - starts).astype(np.int64)
        return pa.table({
            "c_nationkey": pa.array(nat, pa.int64()),
            "n_top": pa.array(cnt, pa.int64()),
            "top_names": pa.array(joined, pa.string()),
        })

    return merged.map_batches(final, batch_format="pyarrow",
                              batch_size=None)


# ---------------------------------------------------------------------------
# set intersection (INTERSECT)
# ---------------------------------------------------------------------------

def parts_intersect(sf_dir: str,
                    a_lo: str = "1995-01-01", a_hi: str = "1996-01-01",
                    b_lo: str = "2000-01-01", b_hi: str = "2001-01-01"):
    """INTERSECT: distinct part keys shipped in BOTH window A and window
    B (the set-op dual of parts_churn's EXCEPT). One pass tags each row
    with its window membership bit, one groupby ORs the bits per key, and
    the filter keeps keys with both bits — the fact table is reduced to
    (key, 2-bit mask) partials inside each batch before the exchange."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate"])
    a0 = int(np.datetime64(a_lo, "us").astype(np.int64))
    a1 = int(np.datetime64(a_hi, "us").astype(np.int64))
    b0 = int(np.datetime64(b_lo, "us").astype(np.int64))
    b1 = int(np.datetime64(b_hi, "us").astype(np.int64))

    def tag(batch: pa.Table) -> pa.Table:
        ship = (np.asarray(batch.column("l_shipdate"), "datetime64[us]")
                .view(np.int64))
        pk = np.asarray(batch.column("l_partkey"), np.int64)
        in_a = (ship >= a0) & (ship < a1)
        in_b = (ship >= b0) & (ship < b1)
        sel = in_a | in_b
        pk, in_a, in_b = pk[sel], in_a[sel], in_b[sel]
        # per-batch partial: one row per key with per-window 0/1 bits
        # (kept as SEPARATE columns: Max folds each bit as OR across
        # batches — a fused mask under Max would lose bits, max(1,2)≠3)
        u, inv = np.unique(pk, return_inverse=True)
        ma = np.zeros(len(u), np.int64)
        mb = np.zeros(len(u), np.int64)
        np.maximum.at(ma, inv, in_a.astype(np.int64))
        np.maximum.at(mb, inv, in_b.astype(np.int64))
        return pa.table({"l_partkey": pa.array(u, pa.int64()),
                         "in_a": pa.array(ma, pa.int64()),
                         "in_b": pa.array(mb, pa.int64())})

    agg = (li.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("l_partkey").aggregate(Max("in_a", alias_name="in_a"),
                                           Max("in_b", alias_name="in_b")))

    def fin(batch: pa.Table) -> pa.Table:
        keep = (np.asarray(batch.column("in_a"), np.int64)
                & np.asarray(batch.column("in_b"), np.int64)) == 1
        return pa.table({
            "l_partkey": pa.array(
                np.asarray(batch.column("l_partkey"), np.int64)[keep],
                pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# UNPIVOT / melt
# ---------------------------------------------------------------------------

def lineitem_melt(sf_dir: str):
    """UNPIVOT (melt): the per-returnflag wide aggregate
    (sum_qty_c, sum_price_c, n_rows) rotated into long form
    (l_returnflag, measure, value) — the inverse of orders_status_pivot.
    The wide aggregate is computed with the usual per-batch partial +
    groupby fold; the melt itself is a constant-width per-row fan-out
    (3 output rows per aggregate row), a pure map stage."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        qty_c = np.rint(np.asarray(batch.column("l_quantity"),
                                   np.float64) * 100.0).astype(np.int64)
        pr_c = np.rint(np.asarray(batch.column("l_extendedprice"),
                                  np.float64) * 100.0).astype(np.int64)
        u, inv = np.unique(rf.astype(str), return_inverse=True)
        sq = np.zeros(len(u), np.int64)
        sp = np.zeros(len(u), np.int64)
        np.add.at(sq, inv, qty_c)
        np.add.at(sp, inv, pr_c)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table({"l_returnflag": pa.array(u, pa.string()),
                         "sum_qty_c": pa.array(sq, pa.int64()),
                         "sum_price_c": pa.array(sp, pa.int64()),
                         "n_rows": pa.array(cnt, pa.int64())})

    agg = (li.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("l_returnflag").aggregate(
               Sum("sum_qty_c", alias_name="sum_qty_c"),
               Sum("sum_price_c", alias_name="sum_price_c"),
               Sum("n_rows", alias_name="n_rows")))

    def melt(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        cols = ["sum_qty_c", "sum_price_c", "n_rows"]
        vals = [np.asarray(batch.column(c), np.int64) for c in cols]
        n = len(rf)
        return pa.table({
            "l_returnflag": pa.array(np.repeat(rf, len(cols)),
                                     pa.string()),
            "measure": pa.array(np.tile(np.array(cols, object), n),
                                pa.string()),
            "value": pa.array(np.stack(vals, axis=1).reshape(-1),
                              pa.int64()),
        })

    return agg.map_batches(melt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# CUBE grouping sets
# ---------------------------------------------------------------------------

def orders_cube(sf_dir: str):
    """CUBE(status, priority) over orders: all four grouping sets —
    (status, priority), (status), (priority), () — with exact-cent
    revenue and counts, absent dimensions labeled 'ALL'. The fact table
    is folded ONCE to the finest (status × priority) aggregate (a
    per-batch partial then one small groupby); the three coarser sets
    are derived from that tiny grid in a single final task, so adding
    grouping sets costs nothing at scale — the rollup_revenue pattern
    generalized to the full lattice."""
    orders = _read(sf_dir, "orders",
                   ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        st = batch.column("o_orderstatus").to_numpy(zero_copy_only=False)
        pr = batch.column("o_orderpriority").to_numpy(
            zero_copy_only=False)
        price_c = np.rint(np.asarray(batch.column("o_totalprice"),
                                     np.float64) * 100.0).astype(np.int64)
        # collision-free pair code: factorize each part, compose ints
        # (string-concat keys collide for adversarial vocabularies)
        st_vals, st_inv = np.unique(st, return_inverse=True)
        pr_vals, pr_inv = np.unique(pr, return_inverse=True)
        raw = st_inv.astype(np.int64) * np.int64(len(pr_vals)) + pr_inv
        u, inv = np.unique(raw, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, price_c)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        # object arrays, never .astype(str): numpy U-dtype strips
        # trailing NULs, re-merging groups the pair code kept distinct
        return pa.table({
            "o_orderstatus": pa.array(
                np.asarray(st_vals[u // len(pr_vals)], object),
                pa.string()),
            "o_orderpriority": pa.array(
                np.asarray(pr_vals[u % len(pr_vals)], object),
                pa.string()),
            "n_orders": pa.array(cnt, pa.int64()),
            "revenue_c": pa.array(s, pa.int64()),
        })

    grid = (orders.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(["o_orderstatus", "o_orderpriority"])
            .aggregate(Sum("n_orders", alias_name="n_orders"),
                       Sum("revenue_c", alias_name="revenue_c"))
            .repartition(1))

    def cube(batch: pa.Table) -> pa.Table:
        st = batch.column("o_orderstatus").to_numpy(zero_copy_only=False)
        pr = batch.column("o_orderpriority").to_numpy(
            zero_copy_only=False)
        cnt = np.asarray(batch.column("n_orders"), np.int64)
        rev = np.asarray(batch.column("revenue_c"), np.int64)

        def fold(keys):
            u, inv = np.unique(keys, return_inverse=True)
            c = np.zeros(len(u), np.int64)
            r = np.zeros(len(u), np.int64)
            np.add.at(c, inv, cnt)
            np.add.at(r, inv, rev)
            return u, c, r

        rows_st, rows_pr, rows_c, rows_r = [], [], [], []
        rows_st += list(st)
        rows_pr += list(pr)
        rows_c += list(cnt)
        rows_r += list(rev)
        u, c, r = fold(st)
        rows_st += list(u)
        rows_pr += ["ALL"] * len(u)
        rows_c += list(c)
        rows_r += list(r)
        u, c, r = fold(pr)
        rows_st += ["ALL"] * len(u)
        rows_pr += list(u)
        rows_c += list(c)
        rows_r += list(r)
        rows_st.append("ALL")
        rows_pr.append("ALL")
        rows_c.append(int(cnt.sum()))
        rows_r.append(int(rev.sum()))
        return pa.table({
            "o_orderstatus": pa.array([str(x) for x in rows_st],
                                      pa.string()),
            "o_orderpriority": pa.array([str(x) for x in rows_pr],
                                        pa.string()),
            "n_orders": pa.array(np.array(rows_c, np.int64), pa.int64()),
            "revenue_c": pa.array(np.array(rows_r, np.int64), pa.int64()),
        })

    return grid.map_batches(cube, batch_format="pyarrow",
                            batch_size=None)


# ---------------------------------------------------------------------------
# one-pass table profile (data-quality validation shape)
# ---------------------------------------------------------------------------

def orders_profile(sf_dir: str):
    """Single-pass column profile of the orders fact table — the
    data-quality validation op a pipeline runs before training jobs:
    per numeric column (price in exact cents), row/null counts and
    min/max/sum as BIGINTs. One streaming pass emits a 3-row partial per
    batch; the groupby folds |columns| rows total, so profiling cost is
    one scan regardless of table size."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        # stats over NON-NULL values only (drop_null before the fold), so
        # a null can never pollute min/max/sum; the null count is its own
        # column. All-null batches keep int64 min/max sentinels that the
        # Min/Max aggregators absorb against any real value.
        def cents(col):
            return np.rint(np.asarray(col.drop_null(), np.float64)
                           * 100.0).astype(np.int64)

        cols = {
            "o_orderkey": np.asarray(
                batch.column("o_orderkey").drop_null(), np.int64),
            "o_custkey": np.asarray(
                batch.column("o_custkey").drop_null(), np.int64),
            "o_totalprice_c": cents(batch.column("o_totalprice")),
        }
        nulls = {
            "o_orderkey": batch.column("o_orderkey").null_count,
            "o_custkey": batch.column("o_custkey").null_count,
            "o_totalprice_c": batch.column("o_totalprice").null_count,
        }
        names, n, nn, mn, mx, sm = [], [], [], [], [], []
        imax = np.iinfo(np.int64).max
        for name, v in cols.items():
            names.append(name)
            n.append(len(v) + int(nulls[name]))
            nn.append(int(nulls[name]))
            mn.append(int(v.min()) if len(v) else imax)
            mx.append(int(v.max()) if len(v) else -imax)
            sm.append(int(v.sum()))
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n_rows": pa.array(np.array(n, np.int64), pa.int64()),
            "n_nulls": pa.array(np.array(nn, np.int64), pa.int64()),
            "min_v": pa.array(np.array(mn, np.int64), pa.int64()),
            "max_v": pa.array(np.array(mx, np.int64), pa.int64()),
            "sum_v": pa.array(np.array(sm, np.int64), pa.int64()),
        })

    agg = (orders.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("column").aggregate(
               Sum("n_rows", alias_name="n_rows"),
               Sum("n_nulls", alias_name="n_nulls"),
               Min("min_v", alias_name="min_v"),
               Max("max_v", alias_name="max_v"),
               Sum("sum_v", alias_name="sum_v")))

    def fin(batch: pa.Table) -> pa.Table:
        out = {"column": pc.cast(batch.column("column"), pa.string())}
        for c in ["n_rows", "n_nulls", "min_v", "max_v", "sum_v"]:
            out[c] = pc.cast(batch.column(c), pa.int64())
        return pa.table(out)

    return agg.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# row-level multi-way join enrichment
# ---------------------------------------------------------------------------

def order_lines_enriched(sf_dir: str):
    """Row-level 3-way join: lineitem → orders → customer, carrying the
    fact rows through both exchanges (the denormalization shape). Both
    dimension sides are column-pruned to (key, payload) BEFORE the join
    so the exchange carries keys + one attribute, not whole tables; the
    fact table streams through two hash joins sized by the size-aware
    partition rule."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice"])

    def prep_li(batch: pa.Table) -> pa.Table:
        price_c = np.rint(np.asarray(batch.column("l_extendedprice"),
                                     np.float64) * 100.0).astype(np.int64)
        return pa.table({
            "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
            "l_linenumber": pc.cast(batch.column("l_linenumber"),
                                    pa.int64()),
            "price_c": pa.array(price_c, pa.int64()),
        })

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def prep_o(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(batch.column("o_orderkey"), pa.int64()),
            "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
        })

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def prep_c(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
            "c_mktsegment": pc.cast(batch.column("c_mktsegment"),
                                    pa.string()),
        })

    j1 = hash_join(
        li.map_batches(prep_li, batch_format="pyarrow",
                       zero_copy_batch=True),
        orders.map_batches(prep_o, batch_format="pyarrow",
                           zero_copy_batch=True),
        on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = hash_join(
        j1,
        cust.map_batches(prep_c, batch_format="pyarrow",
                         zero_copy_batch=True),
        on=("o_custkey",), right_on=("c_custkey",))

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
            "l_linenumber": pc.cast(batch.column("l_linenumber"),
                                    pa.int64()),
            "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
            "c_mktsegment": pc.cast(batch.column("c_mktsegment"),
                                    pa.string()),
            "price_c": pc.cast(batch.column("price_c"), pa.int64()),
        })

    return j2.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# grouped DENSE_RANK top-k (ties share rank)
# ---------------------------------------------------------------------------

def docs_dense_topk(sf_dir: str, k: int = 2):
    """All documents whose n_chars is among their language's top-k
    DISTINCT lengths — DENSE_RANK semantics, where every tied row
    qualifies (the ROW_NUMBER variant top_docs_per_group keeps exactly k
    rows; this keeps k VALUE CLASSES). Pass 1 folds per-batch distinct
    top-k values per group (≤ groups·k rows per block); the merged
    thresholds broadcast in the filter-task closure for pass 2 — no
    per-group materialization, tie mass never concentrates anywhere."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        n = np.asarray(batch.column("n_chars"), np.int64)
        order = np.lexsort((-n, lang.astype(str)))
        l_s, n_s = lang[order], n[order]
        # distinct (lang, n) runs, keep first k per lang
        first = np.ones(len(l_s), bool)
        first[1:] = (l_s[1:] != l_s[:-1]) | (n_s[1:] != n_s[:-1])
        l_d, n_d = l_s[first], n_s[first]
        newg = np.ones(len(l_d), bool)
        newg[1:] = l_d[1:] != l_d[:-1]
        pos = (np.arange(len(l_d))
               - np.maximum.accumulate(
                   np.where(newg, np.arange(len(l_d)), 0)))
        keep = pos < k
        return pa.table({
            "lang": pa.array(l_d[keep].astype(str), pa.string()),
            "n_chars": pa.array(n_d[keep], pa.int64()),
        })

    merged = (docs.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
              .repartition(1)
              .map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
              .take_all())
    # lang -> sorted distinct top-k values, rank = position + 1
    thresh: dict = {}
    for r in merged:
        thresh.setdefault(r["lang"], []).append(int(r["n_chars"]))
    thresh = {la: sorted(vs, reverse=True) for la, vs in thresh.items()}

    def flt(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        n = np.asarray(batch.column("n_chars"), np.int64)
        did = np.asarray(batch.column("doc_id"), np.int64)
        rank = np.zeros(len(n), np.int64)
        for la, vals in thresh.items():
            m = lang == la
            for i, v in enumerate(vals):
                rank[m & (n == v)] = i + 1
        keep = rank > 0
        return pa.table({
            "doc_id": pa.array(did[keep], pa.int64()),
            "lang": pa.array(lang[keep].astype(str), pa.string()),
            "n_chars": pa.array(n[keep], pa.int64()),
            "rnk": pa.array(rank[keep], pa.int64()),
        })

    return docs.map_batches(flt, batch_format="pyarrow",
                            zero_copy_batch=True)
