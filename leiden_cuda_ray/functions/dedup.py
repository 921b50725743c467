"""Deduplication operators (north-rule training-data ops).

- exact:      hash text → groupby(hash) keep min id (hash-partitioned; the
              full text never crosses the shuffle — only its 128-bit digest)
- MinHash+LSH: char-shingles → minhash signatures (vectorized permutation
              mins) → band buckets (ids only cross the shuffle, capped
              per-bucket fan-out) → est Jaccard via signature re-join
- SimHash:    64-bit sign-of-weighted-token-hash fingerprint + banded
              near-dup pairing by Hamming distance
- n-gram Jaccard: exact verification of candidate pairs
- embedding:  cosine near-dup via random-hyperplane LSH buckets

Candidate-pair semantics: pairs (doc_a < doc_b) are emitted at most once
(cross-band duplicates collapsed by a distinct-pairs groupby before the
estimate join). Dedup keeps the minimum
doc id of each duplicate group (greedy: a doc is dropped if it pairs with any
smaller-id doc — at threshold<1 this approximates the transitive closure;
use the connected-components algorithm over the pair edges when exact
closure is required)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Min

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_batch_text(batch: pa.Table, text_col: str) -> np.ndarray:
    return np.array([
        hashlib.blake2b(t.encode(), digest_size=16).hexdigest()
        for t in batch.column(text_col).to_pylist()], dtype=object)


def exact_dedup_keepers(ds, id_col: str = "doc_id", text_col: str = "text"):
    """→ Dataset[<id_col>] of kept rows (min id per identical text)."""
    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            "text_hash": pa.array(_hash_batch_text(batch, text_col)),
        })

    hashed = ds.select_columns([id_col, text_col]).map_batches(
        add_hash, batch_format="pyarrow", zero_copy_batch=True)
    return (hashed.groupby("text_hash")
            .aggregate(Min(id_col, alias_name=id_col))
            .select_columns([id_col]))


# ---------------------------------------------------------------- MinHash ---

def _perm_params(num_perm: int, seed: int):
    rs = np.random.RandomState(seed)
    a = rs.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    b = rs.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of the char k-shingles (vectorized rolling view)."""
    data = text.encode("utf-8", errors="ignore")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    arr = np.frombuffer(data, np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(arr, min(k, len(arr)))
    # polynomial hash per window (vectorized across windows)
    weights = np.uint64(1099511628211) ** np.arange(win.shape[1],
                                                    dtype=np.uint64)
    h = (win.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


def minhash_signatures(ds, id_col: str = "doc_id", text_col: str = "text",
                       num_perm: int = 64, shingle: int = 5, seed: int = 42):
    """→ Dataset[<id_col>, sig:list<int64>] MinHash signatures."""
    a, b = _perm_params(num_perm, seed)

    def fn(batch: pa.Table) -> pa.Table:
        sigs = []
        for t in batch.column(text_col).to_pylist():
            h = _shingle_hashes(t, shingle)
            # (a*h + b) mod p, min over shingles, per permutation
            vals = (a[None, :] * h[:, None] + b[None, :]) % _MERSENNE
            sigs.append(vals.min(axis=0).astype(np.int64))
        return pa.table({
            id_col: batch.column(id_col),
            "sig": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.int64())),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def _emit_bucket_pairs(h: np.ndarray, ids: np.ndarray,
                       bucket_cap: int):
    """Vectorized pair emission over a sorted (group_key, id) table.

    Groups are batched BY SIZE (one np.triu gather per distinct size, the
    same shape as the triangle wedge emitter) — no per-group Python, which
    is what made groupby().map_groups cost ~0.5 ms × #buckets."""
    if len(h) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.lexsort((ids, h))
    h, ids = h[order], ids[order]
    first = np.empty(len(h), bool)
    first[0] = True
    np.not_equal(h[1:], h[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    sizes = np.diff(np.append(starts, len(h)))
    out_a, out_b = [], []
    for k in np.unique(sizes):
        if k < 2:
            continue
        rows = starts[sizes == k]
        if k <= bucket_cap:
            mat = ids[rows[:, None] + np.arange(k)]
            iu, ju = np.triu_indices(int(k), 1)
            out_a.append(mat[:, iu].ravel())
            out_b.append(mat[:, ju].ravel())
        else:
            # skew guard: ring + hashed chords, degree ~4, connected —
            # giant buckets are rare, a small Python loop over them is fine
            from leiden_cuda_ray.graph.runtime import vertex_priority

            for s in rows:
                grp = ids[s:s + k]
                i = np.arange(k, dtype=np.int64)
                hh = vertex_priority(grp, 0, 0)
                chord = (i + 2 + (hh % np.uint64(max(1, k - 3))).astype(
                    np.int64)) % k
                a = np.concatenate([i, i])
                b = np.concatenate([(i + 1) % k, chord])
                keep = a != b
                a, b = a[keep], b[keep]
                out_a.append(grp[np.minimum(a, b)])
                out_b.append(grp[np.maximum(a, b)])
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    return lo, hi


def _bucket_pairs_exchange(banded_ds, id_col: str, bucket_cap: int):
    """(band, bucket, id) rows → distinct candidate-pair Dataset.

    A raw-task owner-sharded exchange (the graph build's pattern): map
    tasks fuse (bucket, band) into one group key and shard rows by key
    hash; K reducers sort their shard once and emit pairs vectorized.
    groupby().map_groups would pay per-bucket Python overhead — fatal at
    one bucket per ~distinct document."""
    import ray

    banded_mat = banded_ds.materialize()
    refs = banded_mat.to_arrow_refs()
    cpus = int(ray.cluster_resources().get("CPU", 4))
    # reducer width follows CPUs, not input rows: the reduce work is the
    # PAIR emission, which can be quadratic in bucket size and therefore
    # much larger than the banded input
    K = max(1, min(cpus, 32))
    n_map = max(1, min(len(refs), 4 * cpus))
    groups = [refs[i::n_map] for i in range(n_map)]

    def _map(K, *blocks):
        hs, ids = [], []
        for t in blocks:
            if not isinstance(t, pa.Table):
                t = pa.Table.from_pandas(t)
            if t.num_rows == 0:
                continue
            bucket = np.asarray(t.column("bucket"), np.int64)
            band = np.asarray(t.column("band")).astype(np.int64)
            with np.errstate(over="ignore"):
                h = bucket * np.int64(16) + band  # wrap-safe group key
            hs.append(h)
            ids.append(np.asarray(t.column(id_col), np.int64))
        h = np.concatenate(hs) if hs else np.empty(0, np.int64)
        i = np.concatenate(ids) if ids else np.empty(0, np.int64)
        own = (h.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(K)
        order = np.argsort(own, kind="stable")
        h, i, own = h[order], i[order], own[order]
        bounds = np.searchsorted(own, np.arange(K + 1, dtype=np.uint64))
        out = [(h[bounds[k]:bounds[k + 1]], i[bounds[k]:bounds[k + 1]])
               for k in range(K)]
        return tuple(out) if K > 1 else out[0]

    def _reduce(*shards):
        """Emit pairs for owned groups; shard them by pair hash for the
        global distinct (a pair found in several bands may live on several
        group reducers, so dedup needs one more exchange — NOT a Ray
        groupby, whose fixed per-partition cost dwarfs this data size)."""
        h = np.concatenate([s[0] for s in shards]) if shards else \
            np.empty(0, np.int64)
        i = np.concatenate([s[1] for s in shards]) if shards else \
            np.empty(0, np.int64)
        lo, hi = _emit_bucket_pairs(h, i, bucket_cap)
        if len(lo):  # local pre-dedup
            span = int(hi.max()) + 1
            k = np.unique(lo * span + hi)
            lo, hi = k // span, k % span
        own = ((lo.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
               ^ hi.astype(np.uint64)) % np.uint64(K)
        order = np.argsort(own, kind="stable")
        lo, hi, own = lo[order], hi[order], own[order]
        bounds = np.searchsorted(own, np.arange(K + 1, dtype=np.uint64))
        out = [(lo[bounds[k]:bounds[k + 1]], hi[bounds[k]:bounds[k + 1]])
               for k in range(K)]
        return tuple(out) if K > 1 else out[0]

    def _dedup(*shards):
        lo = np.concatenate([s[0] for s in shards]) if shards else \
            np.empty(0, np.int64)
        hi = np.concatenate([s[1] for s in shards]) if shards else \
            np.empty(0, np.int64)
        if len(lo):
            span = int(hi.max()) + 1
            k = np.unique(lo * span + hi)
            lo, hi = k // span, k % span
        t = pa.table({"doc_a": pa.array(lo, pa.int64()),
                      "doc_b": pa.array(hi, pa.int64())})
        return t, t.num_rows

    map_task = ray.remote(_map)
    reduce_task = ray.remote(_reduce)
    dedup_task = ray.remote(_dedup)
    mapped = [map_task.options(num_returns=K).remote(K, *g)
              for g in groups]
    if K == 1:
        shard_lists = [[m for m in mapped]]
    else:
        mapped = [list(m) for m in mapped]
        shard_lists = [[mapped[i][k] for i in range(n_map)]
                       for k in range(K)]
    reduced = [reduce_task.options(num_returns=K).remote(*shard_lists[k])
               for k in range(K)]
    if K == 1:
        pair_lists = [[reduced[0]]]
    else:
        reduced = [list(r) for r in reduced]
        pair_lists = [[reduced[i][k] for i in range(K)] for k in range(K)]
    outs = [dedup_task.options(num_returns=2).remote(*pair_lists[k])
            for k in range(K)]
    counts = ray.get([o[1] for o in outs])
    # drop empty blocks: Ray 2.49's hash-shuffle join loses the schema when
    # a side's FIRST block is empty ("No match for FieldRef" in finalize)
    out_blocks = [o[0] for o, n in zip(outs, counts) if n > 0]
    if not out_blocks:
        out_blocks = [outs[0][0]]
    import ray.data

    return ray.data.from_arrow_refs(out_blocks), int(sum(counts))


# Candidate-pair sets at or below this size estimate Jaccard via a
# broadcast semi-join (filter signatures to the pair members, assemble the
# member→signature table ONCE, compare in pair-chunk tasks) instead of two
# Ray Data hash joins: the joins replicate the 512-byte packed signature
# onto EVERY pair row (2 × pairs × sig bytes through the shuffle — 8 GB
# and 170 s for the 8.3M-pair set the sf1 sweep produced), while the
# broadcast path ships the signatures once and the pairs once. The
# driver-side pair arrays are 16 B/pair (1 GB at the cap); the member
# subset is capped separately (_MEMBERS_MAX rows, ~0.5 GB of signatures).
# Beyond either cap the join path runs unchanged.
_SMALL_PAIRS_MAX = 64_000_000
_MEMBERS_MAX = 1_000_000
_ASSEMBLE_CHUNK = 500_000


def _estimate_pairs_broadcast(pairs_ds, sig_ds, id_col, num_perm,
                              threshold):
    """est_jaccard via broadcast semi-join, or None when the pair-member
    set exceeds _MEMBERS_MAX (caller falls back to the join path)."""
    import ray
    import ray.data

    tables = ray.get(pairs_ds.to_arrow_refs())
    lo = np.concatenate([np.asarray(t.column("doc_a"), np.int64)
                         for t in tables]) if tables else \
        np.empty(0, np.int64)
    hi = np.concatenate([np.asarray(t.column("doc_b"), np.int64)
                         for t in tables]) if tables else \
        np.empty(0, np.int64)
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "est_jaccard": pa.array([], pa.float64())})
    if not len(lo):
        return ray.data.from_arrow(empty)
    members = np.unique(np.concatenate([lo, hi]))
    if len(members) > _MEMBERS_MAX:
        return None
    members_ref = ray.put(members)

    def sel(batch: pa.Table) -> pa.Table:
        members = ray.get(members_ref)
        ids = np.asarray(batch.column(id_col), np.int64)
        pos = np.searchsorted(members, ids)
        pos[pos == len(members)] = 0
        keep = members[pos] == ids
        if not keep.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sig": pa.array([], pa.list_(pa.int64()))})
        return batch.select([id_col, "sig"]).filter(pa.array(keep))

    sub_refs = sig_ds.map_batches(
        sel, batch_format="pyarrow",
        zero_copy_batch=True).materialize().to_arrow_refs()

    def assemble(*blocks):
        """Member→signature lookup, built ONCE (not per pair chunk)."""
        ids_l, sig_l = [], []
        for t in blocks:
            if t.num_rows == 0:
                continue
            n = t.num_rows
            ids_l.append(np.asarray(t.column(id_col), np.int64))
            sig_l.append(np.asarray(
                t.column("sig").combine_chunks().flatten(),
                np.int64).reshape(n, -1))
        if not ids_l:
            return np.empty(0, np.int64), np.empty((0, 1), np.int64)
        ids = np.concatenate(ids_l)
        sigs = np.concatenate(sig_l)
        order = np.argsort(ids)
        return ids[order], sigs[order]

    def est_chunk(lo, hi, table):
        ids, sigs = table
        if not len(ids):
            return empty
        ia = np.searchsorted(ids, lo)
        ib = np.searchsorted(ids, hi)
        est = (sigs[ia] == sigs[ib]).mean(axis=1)
        keep = est >= threshold
        return pa.table({
            "doc_a": pa.array(lo[keep], pa.int64()),
            "doc_b": pa.array(hi[keep], pa.int64()),
            "est_jaccard": pa.array(est[keep], pa.float64()),
        })

    table_ref = ray.remote(assemble).remote(*sub_refs)
    rtask = ray.remote(est_chunk)
    outs = [rtask.remote(lo[i:i + _ASSEMBLE_CHUNK],
                         hi[i:i + _ASSEMBLE_CHUNK], table_ref)
            for i in range(0, len(lo), _ASSEMBLE_CHUNK)]
    return ray.data.from_arrow_refs(outs)


def lsh_candidate_pairs(sig_ds, id_col: str = "doc_id", bands: int = 16,
                        threshold: float = 0.5, bucket_cap: int = 256,
                        num_perm: int = 64):
    """Signatures → candidate pairs (doc_a < doc_b, est_jaccard ≥ threshold).

    Scale shape (round-2 hardening):
    - only (band, bucket_hash, id) rows cross the band shuffle — the
      64-perm signature is NOT duplicated ×bands; the Jaccard estimate is
      computed AFTER pair dedup by joining the signature table back on
      (exactly two hash joins over the much smaller pair set);
    - band buckets larger than `bucket_cap` emit a deterministic
      ring + hashed-chord pair subset (O(k) pairs, connected) instead of
      the O(k²) clique — a boilerplate-heavy web bucket can no longer
      produce a straggler/OOM task. The group stays connected, so greedy
      min-id dedup (minhash_dedup_keepers) still collapses it; buckets
      below the cap are unaffected (full clique, exact same pair set as
      round 1)."""
    def to_bands(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col))
        sig_list = batch.column("sig")
        n = len(ids)
        if n == 0 or len(sig_list) == 0:
            return pa.table({
                "band": pa.array([], pa.int32()),
                "bucket": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
            })
        sigs = np.asarray(sig_list.combine_chunks().flatten(),
                          np.int64).reshape(n, -1)
        num_perm = sigs.shape[1]
        r = num_perm // bands
        out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
        out_id = np.tile(ids, bands)
        buckets = np.empty(bands * n, np.uint64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                chunk = sigs[:, b * r:(b + 1) * r].astype(np.uint64)
                # vectorized column-mix + splitmix finalizer (deterministic
                # chunk fingerprint, no per-row Python hashing)
                acc = np.zeros(n, np.uint64)
                for c in range(r):
                    acc = (acc * np.uint64(0x100000001B3)) ^ chunk[:, c]
                acc ^= acc >> np.uint64(30)
                acc *= np.uint64(0xBF58476D1CE4E5B9)
                acc ^= acc >> np.uint64(27)
                buckets[b * n:(b + 1) * n] = acc
        return pa.table({
            "band": pa.array(out_band, pa.int32()),
            "bucket": pa.array(buckets.astype(np.int64), pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
        })

    # signatures are consumed twice (banding + the estimate's semi-join);
    # materialize the compact (id, sig) table once instead of recomputing
    # the shingle->minhash lineage per consumer
    sig_ds = sig_ds.materialize()
    banded = sig_ds.map_batches(to_bands, batch_format="pyarrow",
                                zero_copy_batch=True)

    pairs, n_pairs = _bucket_pairs_exchange(banded, id_col, bucket_cap)

    if n_pairs <= _SMALL_PAIRS_MAX:
        est = _estimate_pairs_broadcast(pairs, sig_ds, id_col, num_perm,
                                        threshold)
        if est is not None:
            return est

    # attach both signatures (pair set << corpus) and estimate exactly.
    # Arrow hash joins reject list<> payload columns, so signatures travel
    # as fixed-size binary (zero-copy reshape on decode).
    from leiden_cuda_ray.stages.joins import hash_join

    def pack(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sigs = np.ascontiguousarray(np.asarray(
            batch.column("sig").combine_chunks().flatten(),
            np.int64).reshape(n, -1)) if n else \
            np.empty((0, num_perm), np.int64)
        # fixed width must be block-invariant or the shuffle concat fails
        assert sigs.shape[1] == num_perm, \
            f"signature width {sigs.shape[1]} != num_perm {num_perm}"
        width = num_perm * 8
        return pa.table({
            id_col: batch.column(id_col),
            "sigb": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(width), n, [None, pa.py_buffer(sigs.tobytes())]),
        })

    packed = sig_ds.map_batches(pack, batch_format="pyarrow",
                                zero_copy_batch=True)

    # NB: never call .columns() here — it executes the join pipeline once
    # (limit-1 schema fetch) and the consumer then re-executes it; the
    # rename/drop runs per batch instead, schema-agnostic and lazy
    def _clean(new_name):
        def fn(batch: pa.Table) -> pa.Table:
            if id_col in batch.column_names:
                batch = batch.drop_columns([id_col])
            return batch.rename_columns(
                [new_name if c == "sigb" else c
                 for c in batch.column_names])
        return fn

    j1 = hash_join(pairs, packed, on=("doc_a",), right_on=(id_col,),
                   right_suffix="_a").map_batches(
        _clean("sig_a"), batch_format="pyarrow", zero_copy_batch=True)
    j2 = hash_join(j1, packed, on=("doc_b",), right_on=(id_col,),
                   right_suffix="_b").map_batches(
        _clean("sig_b"), batch_format="pyarrow", zero_copy_batch=True)

    def _unpack(col, n) -> np.ndarray:
        arr = col.combine_chunks()
        width = arr.type.byte_width // 8
        return np.frombuffer(arr.buffers()[1], np.int64,
                             count=n * width).reshape(n, width)

    def estimate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        sa = _unpack(batch.column("sig_a"), n)
        sb = _unpack(batch.column("sig_b"), n)
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pa.table({
            "doc_a": batch.column("doc_a").combine_chunks().filter(
                pa.array(keep)),
            "doc_b": batch.column("doc_b").combine_chunks().filter(
                pa.array(keep)),
            "est_jaccard": pa.array(est[keep], pa.float64()),
        })

    return j2.map_batches(estimate, batch_format="pyarrow")


def minhash_dedup_keepers(ds, id_col: str = "doc_id", text_col: str = "text",
                          num_perm: int = 64, bands: int = 16,
                          threshold: float = 0.8, seed: int = 42):
    """→ Dataset[<id_col>] of keepers after MinHash near-dup removal."""
    sigs = minhash_signatures(ds, id_col, text_col, num_perm, seed=seed)
    pairs = lsh_candidate_pairs(sigs, id_col, bands, threshold)
    # project+rename via an Arrow map_batches: Ray's Project operator can't
    # rename pandas blocks coming out of map_groups
    dropped = pairs.map_batches(
        lambda t: pa.table({id_col: t.column("doc_b")}),
        batch_format="pyarrow")
    from leiden_cuda_ray.stages.joins import hash_join

    return hash_join(ds.select_columns([id_col]), dropped, on=(id_col,),
                     join_type="left_anti")


# ---------------------------------------------------------------- SimHash ---

def simhash(ds, id_col: str = "doc_id", text_col: str = "text"):
    """→ Dataset[<id_col>, simhash:int64] 64-bit token SimHash.

    Batch-vectorized (VERDICT r3 item 5): tokenization is one Arrow
    split-whitespace kernel over the batch, blake2b runs once per DISTINCT
    token (Arrow dictionary_encode — the vocabulary is far smaller than
    the token stream), and the per-bit majority vote is one bincount over
    the doc index per bit (a 64-pass loop over flat arrays beats the
    (n_tokens, 64) shift-broadcast matrix ~20x: no giant temp, no
    first-touch faults). Bit-identical to the old per-doc Python loop
    (pinned by the pytest oracle): Arrow's split_whitespace matches
    str.split() after dropping the empty tokens it emits at string edges,
    and blake2b per distinct token hashes the same bytes."""
    def fn(batch: pa.Table) -> pa.Table:
        col = pc.utf8_split_whitespace(batch.column(text_col))
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ndocs = len(col)
        lens = np.asarray(col.value_lengths(), np.int64)
        flat = col.flatten()
        di = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
        nonempty = np.asarray(pc.not_equal(flat, pa.scalar("")))
        if not nonempty.all():  # split emits "" at string edges
            flat = flat.filter(pa.array(nonempty))
            di = di[nonempty]
        sims = np.zeros(ndocs, np.uint64)
        if len(flat):
            denc = flat.dictionary_encode()
            idx = np.asarray(denc.indices, np.int64)
            hu = np.fromiter(
                (int.from_bytes(hashlib.blake2b(
                    w.encode(), digest_size=8).digest(), "big")
                 for w in denc.dictionary.to_pylist()),
                np.uint64, len(denc.dictionary))
            hs = hu[idx]
            nz = np.bincount(di, minlength=ndocs) > 0
            for b in range(64):
                bit = (((hs >> np.uint64(b)) & np.uint64(1))
                       .astype(np.float64) * 2.0 - 1.0)
                votes = np.bincount(di, weights=bit, minlength=ndocs)
                sims |= ((votes >= 0) & nz).astype(np.uint64) << np.uint64(b)
        return pa.table({
            id_col: batch.column(id_col),
            "simhash": pa.array(sims.astype(np.int64), pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dup_pairs(sim_ds, id_col: str = "doc_id", max_hamming: int = 3):
    """Banded Hamming near-dup pairs from 64-bit simhashes (4×16-bit bands:
    any pair within Hamming ≤ 3 shares at least one exact band)."""
    def to_bands(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col))
        sh = np.asarray(batch.column("simhash")).astype(np.uint64)
        bands, buckets, oids, hashes = [], [], [], []
        for b in range(4):
            chunk = (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            bands.extend([b] * len(ids))
            buckets.extend(chunk.tolist())
            oids.extend(ids.tolist())
            hashes.extend(sh.tolist())
        return pa.table({
            "band": pa.array(bands, pa.int32()),
            "bucket": pa.array(buckets, pa.int64()),
            id_col: pa.array(oids, pa.int64()),
            "sh": pa.array(np.array(hashes, np.uint64).astype(np.int64),
                           pa.int64()),
        })

    banded = sim_ds.map_batches(to_bands, batch_format="pyarrow",
                                zero_copy_batch=True)

    def _empty_pairs() -> pa.Table:
        return pa.table({"doc_a": np.empty(0, np.int64),
                         "doc_b": np.empty(0, np.int64),
                         "hamming": np.empty(0, np.int64)})

    def emit(group: pa.Table) -> pa.Table:
        ids0 = group.column(id_col).to_numpy().astype(np.int64)
        if len(ids0) < 2:
            return _empty_pairs()
        # sort by id, keep first occurrence (same as the former
        # sort_values + drop_duplicates)
        order = np.argsort(ids0, kind="stable")
        ids_s = ids0[order]
        sh_s = group.column("sh").to_numpy().astype(np.uint64)[order]
        first = np.empty(len(ids_s), bool)
        first[0] = True
        np.not_equal(ids_s[1:], ids_s[:-1], out=first[1:])
        ids = ids_s[first]
        sh = np.ascontiguousarray(sh_s[first])
        if len(ids) < 2:
            return _empty_pairs()
        iu, ju = np.triu_indices(len(ids), 1)
        x = np.ascontiguousarray(sh[iu] ^ sh[ju])
        # vectorized popcount via per-byte bit unpacking
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        # Hamming is a pure function of the two hashes, so filtering before
        # the cross-band Min-dedup is equivalent to filtering after it —
        # and avoids a per-row driver-side filter entirely
        keep = ham <= max_hamming
        return pa.table({"doc_a": ids[iu][keep], "doc_b": ids[ju][keep],
                         "hamming": ham[keep]})

    def combine_local(batch: pa.Table) -> pa.Table:
        # coalesce map_groups' tiny per-bucket blocks and pre-reduce: the
        # hamming of a pair is identical in every band, so a local distinct
        # is a valid combiner for the global Min
        from leiden_cuda_ray.graph.runtime import segsum_by_pair

        a = np.asarray(batch.column("doc_a"), np.int64)
        b = np.asarray(batch.column("doc_b"), np.int64)
        h = np.asarray(batch.column("hamming"), np.float64)
        if len(a) == 0:
            return batch
        span = int(b.max()) + 1
        k = a * span + b
        order = np.argsort(k, kind="stable")
        ks = k[order]
        first = np.empty(len(ks), bool)
        first[0] = True
        np.not_equal(ks[1:], ks[:-1], out=first[1:])
        ku = ks[first]
        return pa.table({
            "doc_a": ku // span, "doc_b": ku % span,
            "hamming": pa.array(h[order][first].astype(np.int64),
                                pa.int64()),
        })

    pairs = (banded.groupby(["band", "bucket"])
             .map_groups(emit, batch_format="pyarrow")
             .map_batches(combine_local, batch_format="pyarrow",
                          batch_size=1 << 20))
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


# ------------------------------------------------------- n-gram Jaccard -----

def ngram_jaccard_verify(pairs_ds, docs_ds, id_col: str = "doc_id",
                         text_col: str = "text", shingle: int = 5,
                         num_partitions: int = 8):
    """Exact char-shingle Jaccard for candidate pairs (two hash joins to
    attach both texts, then a vectorized per-pair set intersection)."""
    docs = docs_ds.select_columns([id_col, text_col])
    from leiden_cuda_ray.stages.joins import hash_join

    j1 = hash_join(pairs_ds, docs, on=("doc_a",), right_on=(id_col,),
                   num_partitions=num_partitions, right_suffix="_a")
    t_a = text_col if text_col in j1.columns() else text_col + "_a"
    j1 = j1.rename_columns({t_a: "text_a"})
    if id_col in j1.columns():
        j1 = j1.drop_columns([id_col])
    j2 = hash_join(j1, docs, on=("doc_b",), right_on=(id_col,),
                   num_partitions=num_partitions, right_suffix="_b")
    t_b = text_col if text_col in j2.columns() else text_col + "_b"
    j2 = j2.rename_columns({t_b: "text_b"})

    def verify(batch: pa.Table) -> pa.Table:
        ja = []
        for a, b in zip(batch.column("text_a").to_pylist(),
                        batch.column("text_b").to_pylist()):
            sa = set(_shingle_hashes(a, shingle).tolist())
            sb = set(_shingle_hashes(b, shingle).tolist())
            inter = len(sa & sb)
            union = len(sa | sb) or 1
            ja.append(inter / union)
        return pa.table({
            "doc_a": batch.column("doc_a"),
            "doc_b": batch.column("doc_b"),
            "jaccard": pa.array(ja, pa.float64()),
        })

    return j2.map_batches(verify, batch_format="pyarrow")


# ------------------------------------------------------- embedding dups -----

def embedding_dup_pairs(emb_ds, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95, n_planes: int = 8,
                        seed: int = 42):
    """Cosine near-dup pairs via random-hyperplane LSH buckets.

    Pairs in the same sign-pattern bucket are verified exactly; at the given
    plane count a near-dup pair collides with high probability (run with two
    seeds and union for higher recall)."""
    rs = np.random.RandomState(seed)
    planes = None  # lazily sized from the first batch's dim

    def bucketize(batch: pa.Table) -> pa.Table:
        nonlocal planes
        from leiden_cuda_ray.functions.arrowutil import (
            list_col_to_matrix, matrix_to_list_col)

        vecs = list_col_to_matrix(batch.column(vec_col))
        if planes is None:
            planes = np.random.RandomState(seed).randn(vecs.shape[1],
                                                       n_planes)
        signs = (vecs @ planes) > 0
        bucket = (signs.astype(np.uint64)
                  << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
        norms = np.linalg.norm(vecs, axis=1)
        unit = vecs / np.maximum(norms, 1e-12)[:, None]
        return pa.table({
            "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            id_col: batch.column(id_col),
            "unit": matrix_to_list_col(unit),
        })

    buckets = emb_ds.select_columns([id_col, vec_col]).map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True)

    def emit(group: pa.Table) -> pa.Table:
        from leiden_cuda_ray.functions.arrowutil import list_col_to_matrix

        ids0 = group.column(id_col).to_numpy().astype(np.int64)
        if len(ids0) < 2:
            return pa.table({"vec_a": np.empty(0, np.int64),
                             "vec_b": np.empty(0, np.int64),
                             "cosine": np.empty(0, np.float64)})
        order = np.argsort(ids0, kind="stable")
        ids = ids0[order]
        U = list_col_to_matrix(group.column("unit"))[order]
        S = U @ U.T
        iu, ju = np.triu_indices(len(ids), 1)
        cos = S[iu, ju]
        keep = cos >= threshold
        return pa.table({"vec_a": ids[iu][keep], "vec_b": ids[ju][keep],
                         "cosine": cos[keep]})

    return buckets.groupby("bucket").map_groups(emit,
                                                batch_format="pyarrow")


#: hard cap on the brute-force exact pairer — above this, the O(n·d)
#: broadcast matrix and O(n²) scan stop being a sane baseline
EXACT_PAIRS_MAX_ROWS = 100_000


def embedding_dup_pairs_exact(emb_ds, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              threshold: float = 0.95,
                              concurrency: int = 2,
                              max_rows: int = EXACT_PAIRS_MAX_ROWS):
    """Exact cosine near-dup pair join — the brute-force baseline.

    Broadcast nested-loop: the full normalized matrix is `ray.put` ONCE and
    every batch matmuls against it, emitting (vec_a < vec_b) pairs at or
    above the threshold (each qualifying pair exactly once). O(n²/P)
    compute and O(n·d) broadcast memory — use as the exact oracle /
    verification path; `embedding_dup_pairs` (hyperplane LSH) is the scale
    path. All math in float64, so a DuckDB oracle that casts the vectors
    to DOUBLE[] agrees away from the threshold boundary.

    Guarded: refuses inputs above `max_rows` vectors (ValueError naming
    `embedding_dup_pairs`) so the oracle path can never be launched by
    accident against a at-scale table and materialize it driver-side.

    → Dataset[vec_a, vec_b, cosine] with cosine rounded to 6 decimals.
    """
    import ray

    from leiden_cuda_ray.functions.similarity import _normalize, _to_matrix

    proj = emb_ds.select_columns([id_col, vec_col])
    n = proj.count()
    if n > max_rows:
        raise ValueError(
            f"embedding_dup_pairs_exact is the brute-force O(n²) oracle "
            f"baseline and refuses {n} vectors (max_rows={max_rows}); use "
            f"embedding_dup_pairs (hyperplane-LSH bucketed) as the scale "
            f"path.")
    pdf = proj.to_pandas()
    all_ids = pdf[id_col].to_numpy(np.int64)
    M = _normalize(np.stack([np.asarray(v, np.float64)
                             for v in pdf[vec_col]]))
    mref = ray.put((all_ids, M))

    class Pairer:
        def __init__(self):
            self.ids, self.M = ray.get(mref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _normalize(_to_matrix(batch.column(vec_col)))
            bids = np.asarray(batch.column(id_col), np.int64)
            S = X @ self.M.T  # (batch, n)
            mask = (S >= threshold) & (bids[:, None] < self.ids[None, :])
            bi, mj = np.nonzero(mask)
            return pa.table({
                "vec_a": pa.array(bids[bi], pa.int64()),
                "vec_b": pa.array(self.ids[mj], pa.int64()),
                "cosine": pa.array(np.round(S[bi, mj], 6), pa.float64()),
            })

    return proj.map_batches(Pairer, batch_format="pyarrow",
                            concurrency=concurrency)


def cross_split_overlap(ds, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        train_pct: int = 80, seed: int = 42,
                        max_df: int = 50):
    """Train/val decontamination: (train_doc, val_doc, n_shared) — the
    number of DISTINCT token n-grams shared across the split boundary,
    for the same deterministic split train_val_split assigns.

    Shape: per-batch vectorized shingling (token windows over the
    list-flattened '\\S+' token stream, one distinct (doc, gram) row per
    doc) → hash-bucket shuffle on a 64-bit gram hash (the bucket key is
    only a router: gram STRINGS are verified inside each bucket, so a
    hash collision can merge buckets but never corrupt counts) → per
    bucket, grams with document frequency ≤ max_df emit their
    train×val doc pairs → the fused-key exchange counts distinct pairs'
    shared grams. The df cap is the standard decontamination guard
    against boilerplate n-grams pairing everything with everything;
    the oracle applies the identical HAVING bound."""
    import pandas as pd

    from leiden_cuda_ray.functions.sampling import splitmix_bucket
    from leiden_cuda_ray.stages.edges import canonicalize_edges

    def shingle(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column(text_col), r"\s+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        f = flat.filter(mask).to_numpy(zero_copy_only=False)
        p = parents.filter(mask).to_numpy(zero_copy_only=False)
        if len(f) < n:
            return pa.table({"h": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.string()),
                             "doc": pa.array([], pa.int64()),
                             "is_train": pa.array([], pa.int64())})
        valid = p[: len(p) - (n - 1)] == p[n - 1:]
        grams = f[: len(f) - (n - 1)][valid]
        for k in range(1, n):
            grams = grams + " " + f[k: len(f) - (n - 1) + k][valid]
        doc_ids = np.asarray(batch.column(id_col), np.int64)
        docs = doc_ids[p[: len(p) - (n - 1)][valid]]
        dd = pd.DataFrame({"doc": docs, "gram": grams}).drop_duplicates()
        h = pd.util.hash_pandas_object(dd["gram"],
                                       index=False).to_numpy()
        is_train = (splitmix_bucket(dd["doc"].to_numpy(np.int64), seed,
                                    100) < train_pct).astype(np.int64)
        return pa.table({
            "h": pa.array(h.view(np.int64), pa.int64()),
            "gram": pa.array(dd["gram"].to_numpy(), pa.string()),
            "doc": pa.array(dd["doc"].to_numpy(np.int64), pa.int64()),
            "is_train": pa.array(is_train, pa.int64()),
        })

    shingled = ds.select_columns([id_col, text_col]).map_batches(
        shingle, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = group.to_pandas()
        outs_t, outs_v = [], []
        for _, sub in df.groupby("gram", sort=False):
            if len(sub) > max_df:
                continue
            tr = sub.loc[sub.is_train == 1, "doc"].to_numpy(np.int64)
            va = sub.loc[sub.is_train == 0, "doc"].to_numpy(np.int64)
            if len(tr) == 0 or len(va) == 0:
                continue
            outs_t.append(np.repeat(tr, len(va)))
            outs_v.append(np.tile(va, len(tr)))
        if not outs_t:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({
            "src": pa.array(np.concatenate(outs_t), pa.int64()),
            "dst": pa.array(np.concatenate(outs_v), pa.int64()),
        })

    pairs = shingled.groupby("h").map_groups(bucket_pairs,
                                             batch_format="pyarrow")
    n_docs = int(ds.count())
    counted = canonicalize_edges(pairs, sum_weights=True,
                                 V=max(n_docs, 1), directed=True)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "train_doc": pc.cast(batch.column("src"), pa.int64()),
            "val_doc": pc.cast(batch.column("dst"), pa.int64()),
            "n_shared": pc.cast(pc.round(batch.column("weight")),
                                pa.int64()),
        })

    return counted.map_batches(rename, batch_format="pyarrow")
