"""Temporal join and order-statistics operators over the events/orders tables.

Three operators the reference lacks but a large-scale training-data /
analytics pipeline needs (SURVEY.md §2.7 "beyond-reference relational
surface"), each expressed Ray-Data-first and DuckDB-oracle-checkable:

- `event_attribution` — AS-OF + RANGE join: every purchase event finds the
  same user's most recent click at-or-before its timestamp (the as-of
  match, returning the matched row's attributes) plus the count of all
  prior clicks (the range-join aggregate). One hash-bucket shuffle
  co-locates each user's rows; the per-partition kernel is a fused-key
  searchsorted over ALL users in the bucket at once — no per-user Python.
- `events_rolling` — windowed aggregate: per-user ROW_NUMBER and a rolling
  sum over the current + 6 preceding rows (ROWS BETWEEN 6 PRECEDING AND
  CURRENT ROW), same bucketing, one vectorized scan per partition.
- `segment_order_percentiles` — EXACT distributed quantile_cont (median /
  p95 of order totals per market segment) via two-pass histogram
  refinement: pass 1 streams order-preserving 32-bit-prefix bucket counts
  (a tiny pre-aggregated histogram per batch), the driver locates the
  buckets holding the target order statistics, pass 2 pulls ONLY the rows
  in those buckets (a vanishing fraction). No segment's values are ever
  materialized in one task, so a hot segment at 100 TB cannot OOM a
  worker — unlike a naive groupby(segment).map_groups(np.quantile).

Partitioning assumptions (documented per the custom-operator contract):
the as-of and rolling kernels require all rows of one user in one
partition — guaranteed by the multiplicative-hash bucket shuffle; skew is
bounded by per-user row counts, not user count. The percentile passes are
embarrassingly parallel; only O(segments × distinct 32-bit prefixes)
histogram rows and O(rows-in-target-buckets) values reach the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                 columns=columns)


def _bucket_part(uid: np.ndarray, num_partitions: int) -> np.ndarray:
    """Multiplicative-mix hash bucket (same spread as sessionize_events)."""
    part = ((uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(33)) % np.uint64(num_partitions)
    return part.astype(np.int64)


# ---------------------------------------------------------------------------
# as-of + range join
# ---------------------------------------------------------------------------

def event_attribution(sf_dir: str, target: str = "purchase",
                      source: str = "click", num_partitions: int = 64):
    """For each `target` event: most recent prior-or-simultaneous `source`
    event by the same user (as-of match: its event_id and ts) and the count
    of all such events (range-join aggregate). Inner-join semantics —
    targets with no prior source rows are dropped. Tie-break SEMANTICS
    (pinned, matching the oracle's composite arg_max): among source
    events sharing the maximal ts <= target ts, the one with the MAX
    event_id wins — deterministic even when (user, ts) pairs repeat."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, target), pc.equal(et, source))
        b = batch.filter(keep)
        uid = np.asarray(b.column("user_id"), np.int64)
        return pa.table({
            "event_id": b.column("event_id"),
            "ts": b.column("ts"),
            "user_id": b.column("user_id"),
            "is_src": pc.equal(b.column("event_type"), source),
            "part": pa.array(_bucket_part(uid, num_partitions), pa.int64()),
        })

    def _empty() -> pa.Table:
        return pa.table({
            "purchase_id": np.empty(0, np.int64),
            "user_id": np.empty(0, np.int64),
            "n_prior_clicks": np.empty(0, np.int64),
            "last_click_ts": pa.array(
                np.empty(0, "datetime64[us]")),
            "last_click_id": np.empty(0, np.int64),
        })

    def emit(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy().astype(np.int64)
        ts = group.column("ts").to_numpy()          # datetime64[us]
        eid = group.column("event_id").to_numpy().astype(np.int64)
        is_src = group.column("is_src").to_numpy().astype(bool)
        ts_i = ts.astype("datetime64[us]").view(np.int64)

        c_uid, c_ts, c_eid = uid[is_src], ts_i[is_src], eid[is_src]
        p_uid, p_ts, p_eid = uid[~is_src], ts_i[~is_src], eid[~is_src]
        if len(c_uid) == 0 or len(p_uid) == 0:
            return _empty()

        # bucket-local dense user ranks + source-ts codes: the fused key
        # urank * U + code can never overflow regardless of raw id ranges
        users = np.unique(uid)
        c_ur = np.searchsorted(users, c_uid)
        p_ur = np.searchsorted(users, p_uid)
        uts = np.unique(c_ts)
        U = np.int64(len(uts) + 1)
        fused = c_ur.astype(np.int64) * U + np.searchsorted(uts, c_ts)
        order = np.lexsort((c_eid, fused))  # deterministic under ts ties
        fused_s = fused[order]
        c_ts_s = c_ts[order]
        c_eid_s = c_eid[order]

        code_q = np.searchsorted(uts, p_ts, side="right") - 1
        valid = code_q >= 0
        base = p_ur.astype(np.int64) * U
        pos = np.searchsorted(fused_s, base[valid] + code_q[valid],
                              side="right")
        lo = np.searchsorted(fused_s, base[valid], side="left")
        n_prior = pos - lo
        hit = n_prior > 0
        pos_h = pos[hit] - 1
        return pa.table({
            "purchase_id": p_eid[valid][hit],
            "user_id": p_uid[valid][hit],
            "n_prior_clicks": n_prior[hit].astype(np.int64),
            "last_click_ts": pa.array(
                c_ts_s[pos_h].view("datetime64[us]")),
            "last_click_id": c_eid_s[pos_h],
        })

    return (ev.map_batches(tag, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part").map_groups(emit, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# rolling-window aggregate
# ---------------------------------------------------------------------------

def events_rolling(sf_dir: str, window: int = 7,
                   num_partitions: int = 64):
    """Per-user ROW_NUMBER (ordered by ts, event_id) and rolling sum of
    `value` over the current + (window-1) preceding rows. One shuffle
    co-locates users; each partition runs a single vectorized scan — the
    rolling sum is `window` masked shifted adds, not a per-row loop."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id"), np.int64)
        return batch.append_column(
            "part", pa.array(_bucket_part(uid, num_partitions), pa.int64()))

    def emit(group: pa.Table) -> pa.Table:
        uid0 = group.column("user_id").to_numpy().astype(np.int64)
        if len(uid0) == 0:
            return pa.table({"event_id": np.empty(0, np.int64),
                             "user_id": np.empty(0, np.int64),
                             "rn": np.empty(0, np.int64),
                             "roll_sum": np.empty(0, np.float64)})
        ts0 = group.column("ts").to_numpy()
        eid0 = group.column("event_id").to_numpy().astype(np.int64)
        val0 = group.column("value").to_numpy().astype(np.float64)
        order = np.lexsort((eid0, ts0, uid0))
        uid, eid, val = uid0[order], eid0[order], val0[order]
        n = len(uid)
        idx = np.arange(n, dtype=np.int64)
        new_user = np.ones(n, bool)
        new_user[1:] = uid[1:] != uid[:-1]
        first = np.maximum.accumulate(np.where(new_user, idx, 0))
        rn = idx - first + 1
        roll = val.copy()
        for k in range(1, window):
            shifted = np.empty(n, np.float64)
            shifted[:k] = 0.0
            shifted[k:] = val[:-k]
            np.add(roll, np.where(idx - k >= first, shifted, 0.0),
                   out=roll)
        return pa.table({"event_id": eid, "user_id": uid, "rn": rn,
                         "roll_sum": np.round(roll, 6)})

    return (ev.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part").map_groups(emit, batch_format="pyarrow"))


def events_interarrival(sf_dir: str, num_partitions: int = 64):
    """Per-user inter-arrival statistics — the LEAD/LAG window shape:
    (user_id, n_events, span_us, max_gap_us) where gaps are the
    microsecond deltas between the user's consecutive events ordered by
    (ts, event_id), span = last - first, max_gap = the largest single
    silence (0 for single-event users, matching COALESCE(MAX(gap), 0)).

    Same partitioning contract as the as-of/rolling kernels: one
    multiplicative-hash bucket shuffle co-locates each user, then one
    vectorized sorted-diff scan per PARTITION — consecutive-diff
    aggregates only need the per-user sorted multiset of timestamps, so
    the result is independent of tie order among equal timestamps."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id"), np.int64)
        return batch.append_column(
            "part", pa.array(_bucket_part(uid, num_partitions), pa.int64()))

    def emit(group: pa.Table) -> pa.Table:
        uid0 = group.column("user_id").to_numpy().astype(np.int64)
        if len(uid0) == 0:
            return pa.table({"user_id": np.empty(0, np.int64),
                             "n_events": np.empty(0, np.int64),
                             "span_us": np.empty(0, np.int64),
                             "max_gap_us": np.empty(0, np.int64)})
        ts0 = (group.column("ts").to_numpy()
               .astype("datetime64[us]").view(np.int64))
        eid0 = group.column("event_id").to_numpy().astype(np.int64)
        order = np.lexsort((eid0, ts0, uid0))
        uid, ts = uid0[order], ts0[order]
        n = len(uid)
        # dense per-partition user codes: users are consecutive post-sort
        new_user = np.ones(n, bool)
        new_user[1:] = uid[1:] != uid[:-1]
        code = np.cumsum(new_user) - 1
        nu = int(code[-1]) + 1
        users = uid[new_user]
        n_events = np.bincount(code, minlength=nu).astype(np.int64)
        first = np.zeros(nu, np.int64)
        last = np.zeros(nu, np.int64)
        first[code[new_user]] = ts[new_user]
        last_mask = np.ones(n, bool)
        last_mask[:-1] = new_user[1:]
        last[code[last_mask]] = ts[last_mask]
        max_gap = np.zeros(nu, np.int64)
        if n > 1:
            same = ~new_user[1:]
            gaps = ts[1:] - ts[:-1]
            np.maximum.at(max_gap, code[1:][same], gaps[same])
        return pa.table({"user_id": users,
                         "n_events": n_events,
                         "span_us": last - first,
                         "max_gap_us": max_gap})

    return (ev.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part").map_groups(emit, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# distributed exact percentiles (two-pass histogram refinement)
# ---------------------------------------------------------------------------

def _ord_prefix(x: np.ndarray) -> np.ndarray:
    """Order-preserving 32-bit prefix of float64 values: map the IEEE bits
    through the standard sign-flip transform (total order matching <) and
    keep the top 32 bits. Values sharing a prefix are near-equal, so the
    refinement pass pulls only a sliver of rows."""
    b = np.ascontiguousarray(x, np.float64).view(np.uint64)
    neg = (b >> np.uint64(63)).astype(bool)
    flip = np.where(neg, np.uint64(0xFFFFFFFFFFFFFFFF),
                    np.uint64(0x8000000000000000))
    return ((b ^ flip) >> np.uint64(32)).astype(np.int64)


def segment_order_percentiles(sf_dir: str, qs=(0.5, 0.95)):
    """Exact quantile_cont(o_totalprice, q) per customer market segment,
    computed without ever holding one segment's values in one task.

    Pass 1 streams (segment, 32-bit-prefix bucket, count) partials —
    pre-aggregated per batch, reduced by one small groupby — giving every
    segment's value histogram at 2^-32 relative resolution. The driver
    turns target ranks h = (n-1)·q into bucket hits via cumulative counts.
    Pass 2 re-streams the join and keeps only rows in hit buckets (a few
    per segment); exact order statistics and the linear interpolation
    v_lo + frac·(v_hi - v_lo) — quantile_cont's definition — run on that
    sliver. Returns one pyarrow row per segment."""
    from leiden_cuda_ray.stages.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = hash_join(orders, cust, on=("o_custkey",),
                       right_on=("c_custkey",))

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": batch.column("c_mktsegment"),
            "price": pc.cast(batch.column("o_totalprice"), pa.float64()),
        })

    sp = joined.map_batches(project, batch_format="pyarrow").materialize()

    def hist(batch: pa.Table) -> pa.Table:
        seg = batch.column("c_mktsegment").combine_chunks()
        enc = seg.dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        cats = enc.dictionary
        buck = _ord_prefix(batch.column("price").to_numpy())
        # fused (code, bucket) partial counts — one sort per batch
        span = np.int64(buck.max() - buck.min() + 1) if len(buck) else \
            np.int64(1)
        b0 = np.int64(buck.min()) if len(buck) else np.int64(0)
        key = codes * span + (buck - b0)
        ku, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "c_mktsegment": cats.take(pa.array(ku // span)),
            "bucket": (ku % span) + b0,
            "cnt": cnt.astype(np.int64),
        })

    hrows = (sp.map_batches(hist, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby(["c_mktsegment", "bucket"]).sum("cnt")
             .take_all())
    by_seg: dict[str, list[tuple[int, int]]] = {}
    for r in hrows:
        by_seg.setdefault(r["c_mktsegment"], []).append(
            (int(r["bucket"]), int(r["sum(cnt)"])))

    # driver: locate the bucket holding each target order statistic
    need: dict[str, set[int]] = {}
    plan: dict[str, dict] = {}
    for seg, pairs in by_seg.items():
        pairs.sort()
        bks = np.array([p[0] for p in pairs], np.int64)
        cns = np.array([p[1] for p in pairs], np.int64)
        cum = np.cumsum(cns)
        n = int(cum[-1])
        ranks = []
        for q in qs:
            h = (n - 1) * q
            ranks += [int(np.floor(h)), int(np.ceil(h))]
        hit = np.searchsorted(cum, np.array(ranks), side="right")
        need[seg] = set(int(b) for b in bks[hit])
        plan[seg] = {"n": n, "bks": bks, "cum": cum}

    def pick(batch: pa.Table) -> pa.Table:
        seg = batch.column("c_mktsegment").to_pylist()
        price = batch.column("price").to_numpy()
        buck = _ord_prefix(price)
        keep = np.fromiter(
            (b in need.get(s, ()) for s, b in zip(seg, buck)),
            bool, len(seg))
        return batch.filter(pa.array(keep))

    sliver = (sp.map_batches(pick, batch_format="pyarrow",
                             zero_copy_batch=True).take_all())
    vals: dict[tuple[str, int], list[float]] = {}
    for r in sliver:
        b = int(_ord_prefix(np.array([r["price"]]))[0])
        vals.setdefault((r["c_mktsegment"], b), []).append(r["price"])

    def order_stat(seg: str, rank: int) -> float:
        p = plan[seg]
        j = int(np.searchsorted(p["cum"], rank, side="right"))
        before = int(p["cum"][j - 1]) if j > 0 else 0
        v = np.sort(np.array(vals[(seg, int(p["bks"][j]))], np.float64))
        return float(v[rank - before])

    segs = sorted(plan)
    out = {"c_mktsegment": segs,
           "n_orders": [plan[s]["n"] for s in segs]}
    for qi, q in enumerate(qs):
        col = []
        for s in segs:
            n = plan[s]["n"]
            h = (n - 1) * q
            lo, hi = int(np.floor(h)), int(np.ceil(h))
            v0 = order_stat(s, lo)
            v1 = v0 if hi == lo else order_stat(s, hi)
            col.append(round(v0 + (h - lo) * (v1 - v0), 6))
        out[f"p{int(q * 100)}"] = col
    return pa.table({
        "c_mktsegment": pa.array(out["c_mktsegment"], pa.string()),
        "n_orders": pa.array(out["n_orders"], pa.int64()),
        **{f"p{int(q * 100)}": pa.array(out[f"p{int(q * 100)}"],
                                        pa.float64()) for q in qs},
    })


# ---------------------------------------------------------------------------
# broadcast as-of join (fact stream vs bounded time series)
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def asof_price_index(sf_dir: str):
    """AS-OF join of a fact stream against a small time series — the
    trades→quotes shape: every lineitem row picks the LATEST daily
    order-price index row at-or-before its l_shipdate.

    The index side (per-day SUM of order totals in cents + order count,
    grouped on the raw day-granular o_orderdate) is calendar-bounded —
    one row per distinct date, a few thousand rows no matter the data
    scale — so the scale-correct plan is broadcast, not shuffle: the
    sorted (day, sum, n) arrays ship ONCE in the probe-task closure and
    every batch resolves its matches with one vectorized searchsorted. The
    per-entity partitioned as-of (unbounded right side) is
    `event_attribution`; this operator is the bounded-right-side dual.

    Index values are EXACT integers (cent sums / counts), so the DuckDB
    ASOF JOIN oracle matches bit-for-bit with no float-summation-order
    hazard. Rows before the first index day would drop (inner as-of);
    on this corpus min(l_shipdate) > min(o_orderdate) so none do."""
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        day = (np.asarray(batch.column("o_orderdate"), "datetime64[us]")
               .view(np.int64) // _DAY_US)
        price_c = np.rint(np.asarray(batch.column("o_totalprice"),
                                     np.float64) * 100.0).astype(np.int64)
        return pa.table({"day": pa.array(day, pa.int64()),
                         "price_c": pa.array(price_c, pa.int64())})

    idx = (orders.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("day").aggregate(Sum("price_c",
                                         alias_name="idx_sum_c"),
                                     Count(alias_name="idx_n"))
           .take_all())
    days = np.array([r["day"] for r in idx], np.int64)
    order = np.argsort(days)
    days = days[order]
    sums = np.array([r["idx_sum_c"] for r in idx], np.int64)[order]
    ns = np.array([r["idx_n"] for r in idx], np.int64)[order]
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_shipdate"])

    # the index is a few thousand (day, sum, n) triples — ship it in the
    # task closure; an actor pool's startup would dwarf the state

    def asof_probe(batch: pa.Table) -> pa.Table:
        ship = (np.asarray(batch.column("l_shipdate"),
                           "datetime64[us]").view(np.int64) // _DAY_US)
        pos = np.searchsorted(days, ship, side="right") - 1
        hit = pos >= 0
        pos = pos[hit]
        okey = np.asarray(batch.column("l_orderkey"), np.int64)[hit]
        lnum = np.asarray(batch.column("l_linenumber")).astype(
            np.int64)[hit]
        idx_day = (days[pos] * _DAY_US).view("datetime64[us]")
        return pa.table({
            "l_orderkey": pa.array(okey, pa.int64()),
            "l_linenumber": pa.array(lnum, pa.int64()),
            "idx_day": pa.array(idx_day,
                                pa.timestamp("us")),
            "idx_sum_c": pa.array(sums[pos], pa.int64()),
            "idx_n": pa.array(ns[pos], pa.int64()),
        })

    return li.map_batches(asof_probe, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# per-entity sliding-window median
# ---------------------------------------------------------------------------

def sliding_median3(sf_dir: str, num_partitions: int = 64):
    """Per-user sliding median over the trailing 3-row window (ROWS
    BETWEEN 2 PRECEDING AND CURRENT ROW, ordered by ts then event_id) —
    the order-statistic window shape that plain running sums can't
    express. Same partitioning contract as the other per-user kernels
    (one multiplicative-hash bucket shuffle co-locates each user), then
    one vectorized pass per partition: the ≤3-row windows are stacked
    into an (n, 3) array whose row-wise np.sort middle column IS the
    median — no per-row Python, no per-user loop.

    EXACT-INTEGER PROTOCOL: values are 2-decimal, so medians are
    half-cent multiples; the engine works in doubled cents
    (med3_c2 = 2·100·median, a BIGINT) and the oracle casts DuckDB's
    float window median through ROUND(200·x), eliminating the
    interpolation-rounding mismatch between quantile_cont's
    a+(b−a)·0.5 and numpy's (a+b)/2."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id"), np.int64)
        return batch.append_column(
            "part", pa.array(_bucket_part(uid, num_partitions), pa.int64()))

    def emit(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({"event_id": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64()),
                          "med3_c2": pa.array([], pa.int64())})
        if n == 0:
            return empty
        uid0 = group.column("user_id").to_numpy().astype(np.int64)
        ts0 = (group.column("ts").to_numpy()
               .astype("datetime64[us]").view(np.int64))
        eid0 = group.column("event_id").to_numpy().astype(np.int64)
        val0 = group.column("value").to_numpy().astype(np.float64)
        order = np.lexsort((eid0, ts0, uid0))
        uid, eid = uid0[order], eid0[order]
        v_c = np.rint(val0[order] * 100.0).astype(np.int64)
        new_user = np.ones(n, bool)
        new_user[1:] = uid[1:] != uid[:-1]
        # per-user row number (0-based): position - user's start position
        starts = np.maximum.accumulate(
            np.where(new_user, np.arange(n, dtype=np.int64), 0))
        rown = np.arange(n, dtype=np.int64) - starts
        # trailing window in cents: lag1/lag2 are in-user only where
        # rown permits, so cross-user reads never surface
        lag1 = np.empty(n, np.int64)
        lag2 = np.empty(n, np.int64)
        lag1[1:] = v_c[:-1]
        lag1[0] = 0
        lag2[2:] = v_c[:-2]
        lag2[:2] = 0
        med2x = np.empty(n, np.int64)
        full = rown >= 2
        if full.any():
            stack = np.sort(
                np.stack([v_c[full], lag1[full], lag2[full]], axis=1),
                axis=1)
            med2x[full] = 2 * stack[:, 1]
        two = rown == 1
        med2x[two] = v_c[two] + lag1[two]
        one = rown == 0
        med2x[one] = 2 * v_c[one]
        return pa.table({"event_id": pa.array(eid, pa.int64()),
                         "user_id": pa.array(uid, pa.int64()),
                         "med3_c2": pa.array(med2x, pa.int64())})

    return (ev.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part").map_groups(emit, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# time-RANGE trailing window (value-based frame)
# ---------------------------------------------------------------------------

def events_range_window(sf_dir: str, window_minutes: int = 10,
                        num_partitions: int = 64):
    """Per-user trailing time-RANGE sum: for every event, the sum of the
    user's event values (cents) over ts ∈ [ts − window, ts] — the
    RANGE BETWEEN INTERVAL ... PRECEDING frame, which row-count frames
    (events_rolling) cannot express. RANGE semantics include ALL peer
    rows sharing the current timestamp, before and after the current row.

    One hash-bucket shuffle co-locates each user; the per-partition
    kernel is loop-free over all users at once: rows sort by (user, ts),
    each user-segment's timestamps are offset by seg_id·(span+window+1)
    so the composite array is GLOBALLY sorted, and the frame sum becomes
    cumsum[searchsorted(right peers)] − cumsum[searchsorted(t − window)]
    — two vectorized searchsorteds, segment-safe because no window can
    cross an offset gap."""
    win_us = window_minutes * 60_000_000
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id"), np.int64)
        return batch.append_column(
            "part", pa.array(_bucket_part(uid, num_partitions), pa.int64()))

    def emit(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "win_sum_c": pa.array([], pa.int64())})
        uid0 = group.column("user_id").to_numpy().astype(np.int64)
        ts0 = (group.column("ts").to_numpy()
               .astype("datetime64[us]").view(np.int64))
        eid0 = group.column("event_id").to_numpy().astype(np.int64)
        v_c0 = np.rint(group.column("value").to_numpy()
                       .astype(np.float64) * 100.0).astype(np.int64)
        order = np.lexsort((eid0, ts0, uid0))
        uid, ts, eid, v_c = (uid0[order], ts0[order], eid0[order],
                             v_c0[order])
        new_user = np.ones(n, bool)
        new_user[1:] = uid[1:] != uid[:-1]
        seg = np.cumsum(new_user) - 1
        t_rel = ts - ts.min()
        stride = int(t_rel.max()) + win_us + 1
        n_seg = int(seg[-1]) + 1
        # the composite key must stay in int64: users-per-partition ×
        # time-span bounds the offset; raise LOUDLY instead of wrapping
        if n_seg * stride >= (1 << 62):
            raise ValueError(
                f"events_range_window: {n_seg} users × {stride}us span "
                f"overflows the segment-offset key; raise num_partitions "
                f"so each bucket holds fewer users")
        t_off = t_rel + seg * stride
        cum = np.zeros(n + 1, np.int64)
        np.cumsum(v_c, out=cum[1:])
        lo = np.searchsorted(t_off, t_off - win_us, side="left")
        hi = np.searchsorted(t_off, t_off, side="right")
        return pa.table({"event_id": pa.array(eid, pa.int64()),
                         "user_id": pa.array(uid, pa.int64()),
                         "win_sum_c": pa.array(cum[hi] - cum[lo],
                                               pa.int64())})

    return (ev.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part").map_groups(emit, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# CDC-style compaction (latest record per key)
# ---------------------------------------------------------------------------

def latest_event_compaction(sf_dir: str, num_partitions: int = 64):
    """Upsert/CDC compaction: the LATEST event per (user_id, event_type)
    by (ts, event_id) — the keep-newest-record shape every
    change-capture ingest needs. Scale contract: each batch first
    reduces to one candidate row per key it contains (a vectorized
    lexsort partial — blocks shrink before anything moves), then one
    hash-bucket groupby folds candidates; no group ever exceeds
    candidates-per-block × blocks."""
    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id"), np.int64)
        if len(uid) == 0:
            return batch
        ts = (np.asarray(batch.column("ts"), "datetime64[us]")
              .view(np.int64))
        eid = np.asarray(batch.column("event_id"), np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        # sort on both key parts directly — no combined string key (a
        # printable separator collides when it appears inside a value)
        order = np.lexsort((-eid, -ts, uid, et))
        et_s, uid_s = et[order], uid[order]
        first = np.ones(len(order), bool)
        first[1:] = (et_s[1:] != et_s[:-1]) | (uid_s[1:] != uid_s[:-1])
        return batch.take(pa.array(order[first]))

    def add_part(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id"), np.int64)
        return batch.append_column(
            "part", pa.array(_bucket_part(uid, num_partitions), pa.int64()))

    def emit(group: pa.Table) -> pa.Table:
        uid = np.asarray(group.column("user_id"), np.int64)
        if len(uid) == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "value_c": pa.array([], pa.int64()),
            })
        ts = (np.asarray(group.column("ts"), "datetime64[us]")
              .view(np.int64))
        eid = np.asarray(group.column("event_id"), np.int64)
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        v_c = np.rint(group.column("value").to_numpy()
                      .astype(np.float64) * 100.0).astype(np.int64)
        order = np.lexsort((-eid, -ts, uid, et))
        et_s, uid_s = et[order], uid[order]
        first = np.ones(len(order), bool)
        first[1:] = (et_s[1:] != et_s[:-1]) | (uid_s[1:] != uid_s[:-1])
        keep = order[first]
        return pa.table({
            "user_id": pa.array(uid[keep], pa.int64()),
            "event_type": pa.array(et[keep].astype(str), pa.string()),
            "event_id": pa.array(eid[keep], pa.int64()),
            "ts": pa.array(ts[keep].view("datetime64[us]"),
                           pa.timestamp("us")),
            "value_c": pa.array(v_c[keep], pa.int64()),
        })

    return (ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(emit, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# SCD-2 validity intervals (row-level LEAD)
# ---------------------------------------------------------------------------

_OPEN_SENTINEL_US = np.int64(253370764800000000)  # 9999-01-01, null-free


def event_validity_intervals(sf_dir: str, num_partitions: int = 64):
    """Slowly-changing-dimension (type 2) interval construction: each
    event's value is valid from its ts until the SAME (user, type)'s
    next event (LEAD), the final version staying open until the
    9999-01-01 sentinel (null-free output, so the hash compare never
    meets NaN-vs-NULL). One hash-bucket shuffle per user; the kernel is
    one lexsort + one shifted compare per partition — vectorized across
    every (user, type) run at once."""
    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id"), np.int64)
        return batch.append_column(
            "part", pa.array(_bucket_part(uid, num_partitions), pa.int64()))

    def emit(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "event_id": pa.array([], pa.int64()),
                "value_c": pa.array([], pa.int64()),
                "valid_from": pa.array([], pa.timestamp("us")),
                "valid_to": pa.array([], pa.timestamp("us")),
            })
        uid = np.asarray(group.column("user_id"), np.int64)
        ts = (np.asarray(group.column("ts"), "datetime64[us]")
              .view(np.int64))
        eid = np.asarray(group.column("event_id"), np.int64)
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        v_c = np.rint(group.column("value").to_numpy()
                      .astype(np.float64) * 100.0).astype(np.int64)
        order = np.lexsort((eid, ts, uid, et))
        et_s, uid_s, ts_s = et[order], uid[order], ts[order]
        nxt = np.full(n, _OPEN_SENTINEL_US, np.int64)
        same = (et_s[1:] == et_s[:-1]) & (uid_s[1:] == uid_s[:-1])
        nxt[:-1][same] = ts_s[1:][same]
        return pa.table({
            "user_id": pa.array(uid[order], pa.int64()),
            "event_type": pa.array(et[order].astype(str), pa.string()),
            "event_id": pa.array(eid[order], pa.int64()),
            "value_c": pa.array(v_c[order], pa.int64()),
            "valid_from": pa.array(ts_s.view("datetime64[us]"),
                                   pa.timestamp("us")),
            "valid_to": pa.array(nxt.view("datetime64[us]"),
                                 pa.timestamp("us")),
        })

    return (ev.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part").map_groups(emit, batch_format="pyarrow"))
