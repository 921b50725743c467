"""Similarity search over an embedding column (north-rule training-data op).

- knn_brute: the baseline — per-batch cosine top-k against a broadcast query
  matrix (numpy matmul inside an actor pool; queries are loaded once per
  actor in __init__, not per batch), then a global per-query top-k merge.
- knn_ivf: the scale path — deterministic coarse quantizer (seeded sample +
  one Lloyd refinement), vectors bucketed by nearest centroid, queries probe
  the n_probe nearest buckets only.

Outputs (query_id, neighbor_id, rank, score) with rank 1..k ordered by
(score desc, neighbor_id asc) — the deterministic tie-break keeps results
oracle-comparable."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from leiden_cuda_ray.functions.arrowutil import list_col_to_matrix as _to_matrix


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1), 1e-12)[:, None]


class _BruteScorer:
    """Actor-pool stage: queries normalized ONCE per actor in __init__."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        import ray

        q = queries_ref
        if hasattr(q, "hex"):  # an ObjectRef
            q = ray.get(q)
        self.Q = _normalize(np.asarray(q, np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(_to_matrix(batch.column(self.vec_col)))
        ids = np.asarray(batch.column(self.id_col))
        S = self.Q @ X.T  # (n_queries, batch)
        k = min(self.k, S.shape[1])
        # per-query partial top-k within this batch (combiner before shuffle)
        part = np.argpartition(-S, k - 1, axis=1)[:, :k]
        qidx = np.repeat(np.arange(S.shape[0]), k)
        vidx = part.ravel()
        return pa.table({
            "query_id": pa.array(qidx, pa.int64()),
            "neighbor_id": pa.array(ids[vidx], pa.int64()),
            "score": pa.array(S[qidx, vidx], pa.float64()),
        })


def _topk_merge(k: int):
    def fn(group: pa.Table) -> pa.Table:
        scores = group.column("score").to_numpy()
        nbr = group.column("neighbor_id").to_numpy().astype(np.int64)
        qid = group.column("query_id").to_numpy().astype(np.int64)
        order = np.lexsort((nbr, -scores))[:k]  # score desc, id asc
        return pa.table({
            "query_id": qid[order],
            "neighbor_id": nbr[order],
            "rank": np.arange(1, len(order) + 1, dtype=np.int64),
            "score": scores[order],
        })
    return fn


def knn_brute(emb_ds, queries: np.ndarray, k: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding",
              concurrency: int = 2):
    """→ Dataset[query_id, neighbor_id, rank, score]."""
    import ray

    Q = np.asarray(queries, np.float64)
    # small query sets ride inline in the actor spec (an ObjectRef in
    # constructor args makes actor RESTART depend on the ref staying
    # alive — ray#53727); big ones broadcast through the object store
    qarg = Q if Q.nbytes <= (4 << 20) else ray.put(Q)
    scored = emb_ds.select_columns([id_col, vec_col]).map_batches(
        _BruteScorer,
        fn_constructor_args=(qarg, k, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    # the per-batch combiner already reduced the stream to ≤ n_queries·k
    # rows per upstream block; one partition for the final merge costs
    # nothing at that cardinality
    return _merge_topk(scored, k)


def _merge_topk(scored, k: int):
    # repartition(1): the combined stream is ≤ n_queries·k rows per block,
    # and one non-empty sort partition means Ray's empty-block UDF bypass
    # (which emits schema-less empty blocks) can't trigger
    return scored.repartition(1).groupby("query_id").map_groups(
        _topk_merge(k), batch_format="pyarrow")


def deterministic_centroids(emb_ds, n_centroids: int,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            seed: int = 42,
                            lloyd_iters: int = 3) -> np.ndarray:
    """Seeded coarse quantizer: hash-sampled seeds + `lloyd_iters` Lloyd
    refinements, each one streamed pass of per-batch partial sums (classic
    mini-EM over map_batches — no full materialize, deterministic)."""
    def sample_fn(batch: pa.Table) -> pa.Table:
        # vectorized splitmix-style hash over the id column (deterministic
        # across processes; replaces a per-row Python filter)
        ids = np.asarray(batch.column(id_col)).astype(np.uint64)
        with np.errstate(over="ignore"):
            x = ids + np.uint64(0x9E3779B97F4A7C15) * np.uint64(seed + 1)
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
        keep = (x % np.uint64(997)) < np.uint64(200)
        return batch.filter(pa.array(keep))

    sample = emb_ds.select_columns([id_col, vec_col]).map_batches(
        sample_fn, batch_format="pyarrow", zero_copy_batch=True)
    seeds = _to_matrix(pa.Table.from_pandas(
        sample.limit(n_centroids * 4).to_pandas()).column(vec_col))
    if len(seeds) < n_centroids:
        raise ValueError("not enough vectors to seed centroids")
    C = seeds[:n_centroids].copy()
    vecs = emb_ds.select_columns([vec_col])

    for _it in range(lloyd_iters):
        Cc = C  # capture current centroids for the streamed pass

        def partial(batch: pa.Table, C=Cc) -> pa.Table:
            X = _to_matrix(batch.column(vec_col))
            assign = np.argmin(
                ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1)
            sums = np.zeros_like(C)
            np.add.at(sums, assign, X)
            counts = np.bincount(assign,
                                 minlength=len(C)).astype(np.float64)
            return pa.table({
                "centroid": pa.array(np.arange(len(C)), pa.int64()),
                "sum": pa.array([s.tolist() for s in sums],
                                pa.list_(pa.float64())),
                "count": pa.array(counts, pa.float64()),
            })

        parts = pa.Table.from_pandas(vecs.map_batches(
            partial, batch_format="pyarrow").to_pandas())
        cid = np.asarray(parts.column("centroid"), np.int64)
        block_sums = np.asarray(
            parts.column("sum").combine_chunks().flatten(),
            np.float64).reshape(len(cid), -1)
        block_counts = np.asarray(parts.column("count"), np.float64)
        sums = np.zeros_like(C)
        np.add.at(sums, cid, block_sums)
        counts = np.zeros(len(C))
        np.add.at(counts, cid, block_counts)
        nz = counts > 0
        newC = C.copy()
        newC[nz] = sums[nz] / counts[nz, None]
        if np.allclose(newC, C):
            C = newC
            break
        C = newC
    return C


def knn_ivf(emb_ds, queries: np.ndarray, k: int = 5, n_centroids: int = 8,
            n_probe: int = 2, id_col: str = "vec_id",
            vec_col: str = "embedding", seed: int = 42):
    """IVF approximate k-NN: probe only the n_probe nearest buckets.

    → Dataset[query_id, neighbor_id, rank, score]."""
    import ray

    C = deterministic_centroids(emb_ds, n_centroids, vec_col, id_col, seed)
    Q = np.asarray(queries, np.float64)
    qdist = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qdist, axis=1)[:, :n_probe]  # (nq, n_probe)
    cref = ray.put(C)
    pref = ray.put(probes)
    qref = ray.put(_normalize(Q))

    class Scorer:
        def __init__(self):
            self.C = ray.get(cref)
            self.probes = ray.get(pref)
            self.Qn = ray.get(qref)
            # query lists per bucket
            self.bucket_queries = {}
            for qi, row in enumerate(self.probes):
                for b in row:
                    self.bucket_queries.setdefault(int(b), []).append(qi)

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _to_matrix(batch.column(vec_col))
            ids = np.asarray(batch.column(id_col))
            assign = np.argmin(
                ((X[:, None, :] - self.C[None, :, :]) ** 2).sum(axis=2),
                axis=1)
            Xn = _normalize(X)
            out_q, out_id, out_s = [], [], []
            for b in np.unique(assign):
                qs = self.bucket_queries.get(int(b))
                if not qs:
                    continue
                mask = assign == b
                S = self.Qn[qs] @ Xn[mask].T
                kk = min(k, S.shape[1])
                part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
                for row_i, qi in enumerate(qs):
                    sel = part[row_i]
                    out_q.extend([qi] * len(sel))
                    out_id.extend(ids[mask][sel].tolist())
                    out_s.extend(S[row_i, sel].tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            })

    scored = emb_ds.select_columns([id_col, vec_col]).map_batches(
        Scorer, batch_format="pyarrow", concurrency=2)
    return _merge_topk(scored, k)


def embedding_centroids(ds, scale: int = 1 << 20):
    """Per-label quantized centroid sums: (label, dim, sum_q, n_vecs)
    with sum_q = Σ FLOOR(x·2^20) as exact int64 (float32 → float64 is
    exact and ×2^20 is a power-of-two scale, so both engines quantize
    identical doubles). The centroid itself is sum_q / (n_vecs·2^20).

    Scale shape: each block reduces to a (labels × dims) int64 partial
    via one zero-copy matrix view + np.add.at — the merge input is
    O(labels · dims · blocks) rows regardless of vector count, and the
    final fold is one bincount task."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        M = _to_matrix(batch.column("embedding"), np.float64)
        lab = np.asarray(batch.column("label"), np.int64)
        n, d = M.shape if M.size else (0, 0)
        if n == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "sum_q": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64())})
        q = np.floor(M * float(scale)).astype(np.int64)
        codes, uniq = pd.factorize(lab)
        k = len(uniq)
        acc = np.zeros((k, d), np.int64)
        np.add.at(acc, codes, q)
        cnt = np.bincount(codes, minlength=k).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    k), pa.int64()),
            "sum_q": pa.array(acc.ravel(), pa.int64()),
            "n_vecs": pa.array(np.repeat(cnt, d), pa.int64()),
        })

    def fold(batch: pa.Table) -> pa.Table:
        lab = np.asarray(batch.column("label"), np.int64)
        dim = np.asarray(batch.column("dim"), np.int64)
        sq = np.asarray(batch.column("sum_q"), np.int64)
        nv = np.asarray(batch.column("n_vecs"), np.int64)
        dmax = int(dim.max()) + 1
        key = lab * dmax + dim
        ukey, inv = np.unique(key, return_inverse=True)
        # int64 np.add.at, not float-weighted bincount: partial sums can
        # exceed 2^53 at billion-vector scale and must stay exact
        ssum = np.zeros(len(ukey), np.int64)
        np.add.at(ssum, inv, sq)
        nsum = np.zeros(len(ukey), np.int64)
        np.add.at(nsum, inv, nv)
        return pa.table({
            "label": pa.array(ukey // dmax, pa.int64()),
            "dim": pa.array(ukey % dmax, pa.int64()),
            "sum_q": pa.array(ssum, pa.int64()),
            "n_vecs": pa.array(nsum, pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(1).map_batches(fold, batch_format="pyarrow",
                                        batch_size=None))


def kmeans_quantized(ds, k: int = 8, iters: int = 2,
                     scale: int = 1 << 20, vec_col: str = "embedding",
                     id_col: str = "vec_id"):
    """Distributed Lloyd k-means in an EXACT-INTEGER protocol, so a SQL
    oracle can replay every iteration bit-for-bit (the iterative-ML
    analogue of graph_pagerank_fixed's unrolled power iteration):

    - vectors quantize to xq = FLOOR((x+1)·2^20) — the +1 offset keeps
      every value positive, so integer centroid division is floor==trunc
      in numpy AND DuckDB;
    - seeds are the k vectors with the smallest ids (found by a per-batch
      partial min-k combiner, never a global sort);
    - assignment is argmin of the exact integer distance Σ(xq−cq)²
      (computed as ‖x‖² − 2x·c + ‖c‖² with an int64 matmul), ties broken
      toward the LOWEST centroid id (np.argmin's first-min == the
      oracle's ORDER BY d2, cid);
    - the update divides integer sums by counts (cq = Σxq // n); an
      empty cluster keeps its previous centroid.

    Each iteration is ONE streaming pass: batches emit (cid, dim,
    sum_q, n) partials (k·d rows), a groupby folds them, and the k×d
    centroid grid broadcasts back — no vector ever crosses the wire.
    Returns k rows: (cid, n_members, sum_cq, inertia), all BIGINT."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def q_batch(batch: pa.Table):
        M = _to_matrix(batch.column(vec_col), np.float64)
        ids = np.asarray(batch.column(id_col), np.int64)
        return ids, np.floor((M + 1.0) * float(scale)).astype(np.int64)

    # --- seeds: partial min-k by id per batch, one tiny merge ---
    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), np.int64)
        keep = np.argsort(ids)[:k]
        return batch.take(pa.array(keep))

    seed_rows = (ds.map_batches(seed_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .repartition(1)
                 .map_batches(seed_partial, batch_format="pyarrow",
                              batch_size=None)
                 .take_all())
    seed_rows.sort(key=lambda r: r[id_col])
    C = np.floor((np.stack([np.asarray(r[vec_col], np.float64)
                            for r in seed_rows]) + 1.0)
                 * float(scale)).astype(np.int64)
    d = C.shape[1]

    def assign(M_q: np.ndarray, C_now: np.ndarray) -> np.ndarray:
        x2 = (M_q * M_q).sum(axis=1)
        c2 = (C_now * C_now).sum(axis=1)
        d2 = x2[:, None] - 2 * (M_q @ C_now.T) + c2[None, :]
        return np.argmin(d2, axis=1), d2

    for _it in range(iters):
        C_now = C.copy()  # k×d ints: ship in the task closure — an
        # actor pool's startup would dwarf the broadcast it carries

        def _iter_partial(batch: pa.Table, C_now=C_now) -> pa.Table:
            _, Mq = q_batch(batch)
            if len(Mq) == 0:
                return pa.table({"cid": pa.array([], pa.int64()),
                                 "dim": pa.array([], pa.int64()),
                                 "sum_q": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            a, _ = assign(Mq, C_now)
            acc = np.zeros((k, d), np.int64)
            np.add.at(acc, a, Mq)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.repeat(np.arange(k, dtype=np.int64),
                                          d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                        k), pa.int64()),
                "sum_q": pa.array(acc.ravel(), pa.int64()),
                "n": pa.array(np.repeat(cnt, d), pa.int64()),
            })

        rows = (ds.map_batches(_iter_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby(["cid", "dim"])
                .aggregate(Sum("sum_q", alias_name="sum_q"),
                           Sum("n", alias_name="n"))
                .take_all())
        newC = C.copy()
        for r in rows:
            if r["n"] > 0:
                newC[r["cid"], r["dim"]] = r["sum_q"] // r["n"]
        C = newC

    # --- final reporting assignment against the converged centroids ---
    C_fin = C.copy()

    def report(batch: pa.Table) -> pa.Table:
        _, Mq = q_batch(batch)
        if len(Mq) == 0:
            return pa.table({"cid": pa.array([], pa.int64()),
                             "n_members": pa.array([], pa.int64()),
                             "inertia": pa.array([], pa.int64())})
        a, d2 = assign(Mq, C_fin)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        best = d2[np.arange(len(a)), a]
        inr = np.zeros(k, np.int64)
        np.add.at(inr, a, best)
        cid = np.arange(k, dtype=np.int64)
        return pa.table({"cid": pa.array(cid, pa.int64()),
                         "n_members": pa.array(cnt, pa.int64()),
                         "inertia": pa.array(inr, pa.int64())})

    # report emits ≤ k rows per block: repartition(1) keeps the final
    # groupby to a single reduce partition (empty reduce partitions emit
    # schemaless RefBundles that trip the executor's schema warning)
    rep = (ds.map_batches(report, batch_format="pyarrow",
                          zero_copy_batch=True)
           .repartition(1)
           .groupby("cid")
           .aggregate(Sum("n_members", alias_name="n_members"),
                      Sum("inertia", alias_name="inertia")))
    sum_cq = C.sum(axis=1)
    import pyarrow.compute as _pc

    def fin(batch: pa.Table) -> pa.Table:
        cid = np.asarray(batch.column("cid"), np.int64)
        return pa.table({
            "cid": pa.array(cid, pa.int64()),
            "n_members": _pc.cast(batch.column("n_members"), pa.int64()),
            "sum_cq": pa.array(sum_cq[cid], pa.int64()),
            "inertia": _pc.cast(batch.column("inertia"), pa.int64()),
        })

    return rep.map_batches(fin, batch_format="pyarrow")


def embedding_quantize(ds, bits: int = 8):
    """Per-vector max-abs int8 post-training quantization (the standard
    embedding-compression preprocessing step): scale = max|x| over the
    vector, q_i = floor(x_i / scale · 127 + 0.5) ∈ [−127, 127]
    (all-zero vectors quantize to 0 with scale 0). Output is the LONG
    layout (vec_id, dim, qval, scale) — one row per component — so the
    protocol is exactly SQL-replayable (floor(x/s·127 + 0.5) over
    float64-cast components is the identical IEEE chain on both sides;
    list indexing replays per-dim).

    Scale shape: stateless per-batch map over the zero-copy matrix view
    — no shuffle, no state; compression-side work a 100-TB embedding
    store runs in one streaming pass."""
    qmax = float((1 << (bits - 1)) - 1)

    def fn(batch: pa.Table) -> pa.Table:
        M = _to_matrix(batch.column("embedding"), np.float64)
        n, d = M.shape
        vid = np.asarray(batch.column("vec_id"), np.int64)
        s = np.max(np.abs(M), axis=1)
        safe = np.where(s == 0.0, 1.0, s)
        q = np.floor(M / safe[:, None] * qmax + 0.5).astype(np.int64)
        q[s == 0.0, :] = 0
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    n), pa.int64()),
            "qval": pa.array(q.ravel(), pa.int64()),
            "scale": pa.array(np.repeat(s, d), pa.float64()),
        })

    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)
