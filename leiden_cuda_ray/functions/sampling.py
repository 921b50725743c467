"""Deterministic sampling / dataset-split operators.

A 100-TB training-data pipeline needs reproducible, coordination-free
sampling: any worker must assign any row to the same split without a
shuffle, a broadcast, or an RNG stream. Everything here keys off the
splitmix64 finalizer over a stable id column — the same hash family the
package uses for centroid seeding (functions/similarity.py) and vertex
priorities (graph/runtime.py) — so the assignment is a pure, vectorized
function of (id, seed) and the split is stable across runs, partition
layouts and cluster sizes.

The finalizer is exactly expressible in DuckDB SQL (128-bit HUGEINT
arithmetic with the 64-bit multiply split into 32-bit halves), so the
driver oracle checks the split bit-for-bit — see
`__ray_entry__._splitmix_sql`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xBF58476D1CE4E5B9)


def splitmix_value(ids: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64-finalize (id + GOLDEN*seed) → uint64 hash values."""
    with np.errstate(over="ignore"):
        x = ids.astype(np.uint64) + _GOLDEN * np.uint64(seed)
        x ^= x >> np.uint64(30)
        x *= _MIX_B
        x ^= x >> np.uint64(27)
    return x


def splitmix_bucket(ids: np.ndarray, seed: int, mod: int) -> np.ndarray:
    """splitmix64-finalize (id + GOLDEN*seed) and reduce mod `mod`."""
    return (splitmix_value(ids, seed) % np.uint64(mod)).astype(np.int64)


def hash_split(ds, id_col: str = "doc_id", train_pct: int = 80,
               seed: int = 42):
    """Append a deterministic 'split' column ('train'/'val'): row goes to
    train iff splitmix64(id, seed) % 100 < train_pct. Stateless per batch
    — no shuffle, no driver round-trip, stable under any blocking."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col))
        b = splitmix_bucket(ids, seed, 100)
        split = np.where(b < train_pct, "train", "val")
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds, group_col: str = "lang", id_col: str = "doc_id",
                      n: int = 25, seed: int = 7):
    """Exactly-n-per-stratum deterministic sample: the n rows of each
    group with the SMALLEST splitmix64(id, seed), ties by id. Output
    (id, group, rnk).

    This is reproducible reservoir-free stratified sampling: membership
    is a pure function of (id, seed, the group's hash order), so any
    worker can evaluate its own rows and a per-batch partial top-n
    combiner (one lexsort per batch) bounds what moves to
    O(blocks · groups · n) — no shuffle of the data rows themselves.
    The final merge is one task over the combined partials (group count
    × n rows per block). Same hash family as hash_split, so the DuckDB
    oracle ranks with the identical HUGEINT-transcribed finalizer."""
    import pyarrow.compute as pc  # noqa: F401  (parity with siblings)

    def _key_cols(batch: pa.Table):
        ids = np.asarray(batch.column(id_col), np.int64)
        h = splitmix_value(ids, seed)
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        _, inv = np.unique(grp, return_inverse=True)
        return ids, h, inv

    def partial(batch: pa.Table) -> pa.Table:
        ids, h, g = _key_cols(batch)
        order = np.lexsort((ids, h, g))
        gs = g[order]
        pos = np.arange(len(gs)) - np.searchsorted(gs, gs, side="left")
        take = order[pos < n]
        return batch.take(pa.array(take))

    merged = (ds.select_columns([id_col, group_col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .repartition(1))

    def final(batch: pa.Table) -> pa.Table:
        ids, h, g = _key_cols(batch)
        order = np.lexsort((ids, h, g))
        gs = g[order]
        rnk = (np.arange(len(gs))
               - np.searchsorted(gs, gs, side="left") + 1).astype(np.int64)
        keep = rnk <= n
        sel = order[keep]
        out = batch.take(pa.array(sel))
        return out.append_column("rnk", pa.array(rnk[keep], pa.int64()))

    return merged.map_batches(final, batch_format="pyarrow",
                              batch_size=None)


def kmv_distinct(ds, id_col: str = "user_id", k: int = 64,
                 seed: int = 101):
    """KMV (k-minimum-values) distinct-count sketch with a fully
    deterministic, SQL-replayable protocol (Bar-Yossef et al.,
    RANDOM 2002): hash every distinct id with the splitmix64 finalizer,
    keep the k smallest UNIQUE hash values, and estimate
      D ≈ (k-1) · 2^64 / h_(k)
    computed in exact integer arithmetic (Python int // here, HUGEINT //
    in the oracle), so the estimate is bit-identical on both sides —
    the sketch's PROTOCOL is exact even though the estimate itself is
    approximate. When fewer than k distinct hashes exist the sketch IS
    the exact count and reports it.

    Scale shape: each block shrinks to its own ≤k minima before the
    merge (one lexsort per batch); the single merge input is
    O(k · blocks). The exact distinct count emitted alongside (for the
    accuracy check) is the one genuinely wide step — a distinct
    aggregation — and is the quantity the sketch REPLACES at 100 TB.

    → single-row pa.Table (n_exact, k_used, kmv_estimate), all int64.
    """
    import pyarrow.compute as pc
    import ray

    proj = ds.select_columns([id_col])

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(batch.column(id_col), np.int64))
        h = np.unique(splitmix_value(ids, seed))
        return pa.table({"h": pa.array(h[:k], pa.uint64())})

    mins = (proj.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .repartition(1).take_all())
    hs = np.unique(np.array([r["h"] for r in mins], np.uint64))
    if len(hs) < k:
        est = int(len(hs))
    else:
        est = ((k - 1) * (1 << 64)) // int(hs[k - 1])
    n_exact = proj.groupby(id_col).count().count()
    return pa.table({
        "n_exact": pa.array([int(n_exact)], pa.int64()),
        "k_used": pa.array([k], pa.int64()),
        "kmv_estimate": pa.array([est], pa.int64()),
    })


def weighted_sample(ds, weight_col: str = "n_chars",
                    id_col: str = "doc_id", n: int = 100, seed: int = 19):
    """Deterministic weighted sample (sequential Poisson / priority
    sampling, Ohlsson 1998): each row draws priority
    q = splitmix64(id, seed) // max(weight, 1) and the n rows with the
    SMALLEST q win — heavier rows draw stochastically smaller priorities,
    so inclusion probability grows with weight, yet the whole draw is a
    pure function of (id, seed) with no RNG stream and no coordination.
    The integer floor-div keeps the protocol bit-replayable in DuckDB
    HUGEINT arithmetic (ties broken by id on both sides). Output
    (id, weight, rnk), rnk = 1..n by (priority, id).

    Scale shape: a per-batch partial top-n combiner (one lexsort per
    block) bounds what moves to O(blocks · n) rows; the final merge is
    one task over the combined partials."""

    def _prio(batch: pa.Table):
        ids = np.asarray(batch.column(id_col), np.int64)
        w = np.asarray(batch.column(weight_col), np.int64)
        w = np.maximum(w, 1).astype(np.uint64)
        q = splitmix_value(ids, seed) // w
        return ids, q

    def partial(batch: pa.Table) -> pa.Table:
        ids, q = _prio(batch)
        order = np.lexsort((ids, q))[:n]
        return batch.take(pa.array(order))

    merged = (ds.select_columns([id_col, weight_col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .repartition(1))

    def final(batch: pa.Table) -> pa.Table:
        ids, q = _prio(batch)
        order = np.lexsort((ids, q))[:n]
        out = batch.take(pa.array(order))
        return out.append_column(
            "rnk", pa.array(np.arange(1, len(order) + 1, dtype=np.int64),
                            pa.int64()))

    return merged.map_batches(final, batch_format="pyarrow",
                              batch_size=None)


def _splitmix_full(ids: np.ndarray, seed: int) -> np.ndarray:
    """The FULL splitmix64 finalizer (both multiplies + final shift).

    hll_distinct needs it: the reduced chain `splitmix_value` pins for
    the sampling oracles leaves the register field of SEQUENTIAL ids
    structured enough to bias the HLL max-rank statistics ~30% low
    (measured over 5 seeds on ids 0..1499); the full finalizer is
    unbiased on the same inputs. Kept separate so the reduced chain's
    existing oracle transcriptions stay untouched."""
    with np.errstate(over="ignore"):
        x = ids.astype(np.uint64) + _GOLDEN * np.uint64(seed)
        x ^= x >> np.uint64(30)
        x *= _MIX_B
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _hll_ranks(ids: np.ndarray, b: int, seed: int):
    """The pinned HLL observation protocol shared by the global and
    grouped sketches (and transcribed twice in oracle SQL): full
    splitmix64 hash → (register = top-b bits, rank = (64−b)+1 −
    bitlength of the low word, bitlength via exact binary clz — no
    float log2, which misrounds above 2^53)."""
    W = 64 - b
    h = _splitmix_full(ids, seed)
    reg = (h >> np.uint64(W)).astype(np.int64)
    w = h & np.uint64((1 << W) - 1)
    bl = np.zeros(len(w), np.int64)
    v = w.copy()
    for s_ in (32, 16, 8, 4, 2, 1):
        big = v >= np.uint64(1 << s_)
        bl[big] += s_
        v[big] >>= np.uint64(s_)
    bl[w > np.uint64(0)] += 1
    return reg, W + 1 - bl


def _hll_estimate(regmax: np.ndarray, m: int, alpha: float):
    """Pinned estimator over a merged register bank: exact 2^62-scaled
    register sum, raw vs linear-counting branch — the identical IEEE
    expression order the oracles replay. → (v0, rank_sum, estimate)."""
    v0 = int((regmax == 0).sum())
    s_exact = sum(1 << (62 - int(r)) for r in regmax)
    raw = ((alpha * m) * m) * float(1 << 62) / float(s_exact)
    if raw <= 2.5 * m and v0 > 0:
        est = m * float(np.log(float(m) / float(v0)))
    else:
        est = raw
    return v0, int(regmax.sum()), est


def hll_distinct(ds, id_col: str = "user_id", b: int = 5,
                 seed: int = 131):
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007) with a
    fully deterministic, SQL-replayable protocol, the mergeable-register
    sibling of kmv_distinct: h = full splitmix64(id, seed); register
    j = h >> (64−b) (top b bits); rank = (64−b) + 1 − bitlength(h mod
    2^(64−b)); per-register MAX rank. The estimator replays exactly on
    both sides because Σ 2^(−M_j) is scaled by 2^62 into an EXACT
    integer S = Σ 2^(62−M_j) (Python int here, HUGEINT in the oracle),
    and the small-range linear-counting branch (raw ≤ 2.5m with zero
    registers present) is pinned identically. Registers are
    duplicate-insensitive maxes, so no distinct pass is needed.

    Scale shape: each block collapses to its m = 2^b register maxes
    before the merge (np.maximum.at per batch); the single merge input
    is O(m · blocks) and the merged sketch is O(m) forever — the exact
    distinct count emitted alongside (for the accuracy check) is the
    wide aggregation the sketch REPLACES at 100 TB.

    → single-row pa.Table (n_exact, m, n_zero_regs, rank_sum int64;
    hll_estimate float64)."""
    m = 1 << b
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m))
    proj = ds.select_columns([id_col])

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), np.int64)
        reg, rank = _hll_ranks(ids, b, seed)
        regmax = np.zeros(m, np.int64)
        np.maximum.at(regmax, reg, rank)
        return pa.table({
            "reg": pa.array(np.arange(m, dtype=np.int64), pa.int64()),
            "mx": pa.array(regmax, pa.int64()),
        })

    import ray

    parts = (proj.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
             .repartition(1).take_all())
    regmax = np.zeros(m, np.int64)
    for r in parts:
        regmax[r["reg"]] = max(regmax[r["reg"]], r["mx"])
    v0, rank_sum, est = _hll_estimate(regmax, m, alpha)
    n_exact = proj.groupby(id_col).count().count()
    return pa.table({
        "n_exact": pa.array([int(n_exact)], pa.int64()),
        "m": pa.array([m], pa.int64()),
        "n_zero_regs": pa.array([v0], pa.int64()),
        "rank_sum": pa.array([rank_sum], pa.int64()),
        "hll_estimate": pa.array([est], pa.float64()),
    })


def hll_distinct_grouped(ds, id_col: str = "user_id",
                         group_col: str = "event_type", b: int = 5,
                         seed: int = 131):
    """Per-GROUP HyperLogLog distinct counts — hll_distinct with one
    register bank per group value, the shape a 100-TB pipeline actually
    runs ("distinct users per surface/day"). Identical pinned protocol
    (full splitmix64, exact clz ranks, 2^62-scaled exact register sum,
    both estimator branches); per-batch partials carry only the NONZERO
    (group, register, max-rank) triples, so a block's partial is
    ≤ groups·2^b rows regardless of row count, and banks merge by
    elementwise max. The exact per-group distinct count rides along as
    the accuracy reference (the wide aggregation the sketch replaces).

    → pa.Table (group, n_exact, m, n_zero_regs, rank_sum,
    hll_estimate), one row per group value, group-sorted."""
    m = 1 << b
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m))
    proj = ds.select_columns([group_col, id_col])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        ids = np.asarray(batch.column(id_col), np.int64)
        reg, rank = _hll_ranks(ids, b, seed)
        gu, ginv = np.unique(g, return_inverse=True)
        bank = np.zeros(len(gu) * m, np.int64)
        np.maximum.at(bank, ginv * m + reg, rank)
        nz = np.flatnonzero(bank)
        return pa.table({
            group_col: pa.array(np.asarray(gu[nz // m], object),
                                pa.string()),
            "reg": pa.array(nz % m, pa.int64()),
            "mx": pa.array(bank[nz], pa.int64()),
        })

    parts = (proj.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
             .repartition(1).take_all())

    def _distinct_pairs(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        ids = np.asarray(batch.column(id_col), np.int64)
        gu, ginv = np.unique(g, return_inverse=True)
        uniq = np.unique(np.stack([ginv, ids]), axis=1)
        return pa.table({
            group_col: pa.array(np.asarray(gu[uniq[0]], object),
                                pa.string()),
            id_col: pa.array(uniq[1], pa.int64()),
        })

    from ray.data.aggregate import Count

    exact_rows = (proj.map_batches(_distinct_pairs,
                                   batch_format="pyarrow",
                                   zero_copy_batch=True)
                  .groupby([group_col, id_col])
                  .aggregate(Count(alias_name="c"))
                  .groupby(group_col)
                  .aggregate(Count(alias_name="n_exact")).take_all())
    n_exact = {r[group_col]: int(r["n_exact"]) for r in exact_rows}

    banks: dict = {}
    for r in parts:
        bank = banks.setdefault(r[group_col], np.zeros(m, np.int64))
        bank[r["reg"]] = max(bank[r["reg"]], r["mx"])
    groups = sorted(banks)
    v0s, rsums, ests = [], [], []
    for gname in groups:
        v0, rsum, est = _hll_estimate(banks[gname], m, alpha)
        v0s.append(v0)
        rsums.append(rsum)
        ests.append(est)
    return pa.table({
        group_col: pa.array(groups, pa.string()),
        "n_exact": pa.array([n_exact[g] for g in groups], pa.int64()),
        "m": pa.array([m] * len(groups), pa.int64()),
        "n_zero_regs": pa.array(v0s, pa.int64()),
        "rank_sum": pa.array(rsums, pa.int64()),
        "hll_estimate": pa.array(ests, pa.float64()),
    })
