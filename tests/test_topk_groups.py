"""Grouped top-k: partial-combiner correctness vs a pandas oracle, and
invariance to how the input is blocked (the partial top-k must be a
lossless combiner)."""
import numpy as np
import pandas as pd
import pyarrow as pa


def _oracle(df: pd.DataFrame, k: int = 3) -> pd.DataFrame:
    df = df.sort_values(["lang", "source", "n_chars", "doc_id"],
                        ascending=[True, True, False, True])
    df["rnk"] = df.groupby(["lang", "source"]).cumcount() + 1
    return (df[df["rnk"] <= k]
            .sort_values(["lang", "source", "rnk"])
            .reset_index(drop=True))


def test_top_docs_per_group_matches_oracle(tmp_path):
    import ray.data

    from leiden_cuda_ray.pipelines.relational import top_docs_per_group

    rng = np.random.default_rng(7)
    n = 2000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["x"] * n,
        "lang": rng.choice(["en", "de", "fr"], n),
        "source": rng.choice(["web", "book", "code", "wiki"], n),
        # heavy ties so the doc_id tie-break is actually exercised
        "n_chars": rng.integers(0, 40, n).astype(np.int64),
    })
    (tmp_path / "documents.parquet").write_bytes(b"")
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet")

    got = (top_docs_per_group(str(tmp_path), k=3).to_pandas()
           .sort_values(["lang", "source", "rnk"]).reset_index(drop=True))
    want = _oracle(df.drop(columns=["text"]), k=3)[got.columns]
    pd.testing.assert_frame_equal(got, want)


def test_partial_topk_blocking_invariance(tmp_path):
    """Same rows, pathological blocking (1-row blocks via repartition):
    the partial combiner must not lose any global top-k candidate."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from leiden_cuda_ray.pipelines.relational import top_docs_per_group

    rng = np.random.default_rng(11)
    n = 300
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["x"] * n,
        "lang": rng.choice(["en", "de"], n),
        "source": rng.choice(["web", "book"], n),
        "n_chars": rng.integers(0, 10, n).astype(np.int64),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet",
                   row_group_size=7)  # many tiny row groups → many blocks
    got = (top_docs_per_group(str(tmp_path), k=3).to_pandas()
           .sort_values(["lang", "source", "rnk"]).reset_index(drop=True))
    want = _oracle(df.drop(columns=["text"]), k=3)[got.columns]
    pd.testing.assert_frame_equal(got, want)


def test_pareto_parts_brute_force_and_blocking_invariant(tmp_path):
    """The partial-skyline combiner must produce exactly the brute-force
    dominance skyline at any blocking."""
    import pyarrow.parquet as pq

    from leiden_cuda_ray.pipelines.relational import pareto_parts

    rng = np.random.RandomState(7)
    n = 300
    price = rng.randint(100, 5000, n) / 100.0
    size = rng.randint(1, 50, n)
    t = pa.table({
        "p_partkey": pa.array(np.arange(n), pa.int64()),
        "p_name": pa.array([f"p{i}" for i in range(n)], pa.string()),
        "p_brand": pa.array(["b"] * n, pa.string()),
        "p_type": pa.array(["t"] * n, pa.string()),
        "p_size": pa.array(size.astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(price, pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "part.parquet"))

    pc_ = np.rint(price * 100).astype(np.int64)
    keep = []
    for i in range(n):
        dominated = np.any(
            (pc_ <= pc_[i]) & (size >= size[i])
            & ((pc_ < pc_[i]) | (size > size[i])))
        if not dominated:
            keep.append(i)
    df = (pareto_parts(str(tmp_path)).to_pandas()
          .sort_values("p_partkey").reset_index(drop=True))
    assert list(df.p_partkey) == keep
    assert list(df.price_c) == [int(pc_[i]) for i in keep]
