"""hash_split: determinism, blocking invariance, ratio sanity."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_hash_split_deterministic_and_blocking_invariant(tmp_path):
    import ray.data

    from leiden_cuda_ray.functions.sampling import hash_split

    n = 5000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "d.parquet", row_group_size=137)

    def run(parallelism):
        ds = ray.data.read_parquet(str(tmp_path / "d.parquet"),
                                   override_num_blocks=parallelism)
        out = hash_split(ds).to_pandas().sort_values("doc_id")
        return out["split"].values

    a, b = run(1), run(16)
    assert np.array_equal(a, b)  # split independent of blocking
    frac = (a == "train").mean()
    assert 0.77 < frac < 0.83  # 80% +- hash noise at n=5000


def test_hash_split_seed_changes_assignment():
    import ray.data

    from leiden_cuda_ray.functions.sampling import splitmix_bucket

    ids = np.arange(1000, dtype=np.int64)
    a = splitmix_bucket(ids, seed=42, mod=100)
    b = splitmix_bucket(ids, seed=43, mod=100)
    assert (a != b).any()
    # stable: same call, same result
    assert np.array_equal(a, splitmix_bucket(ids, seed=42, mod=100))


def test_stratified_sample_blocking_invariant_and_exact():
    """stratified_sample must return exactly n per group, the n smallest
    splitmix hashes (ties by id), independent of block layout."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from leiden_cuda_ray.functions.sampling import (
        splitmix_value,
        stratified_sample,
    )

    rows = [{"doc_id": i, "lang": ["en", "de", "fr"][i % 3]}
            for i in range(90)]
    t = pa.Table.from_pylist(rows)

    def run(n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        return (stratified_sample(ds, n=5, seed=7).to_pandas()
                .sort_values(["lang", "rnk"]).reset_index(drop=True))

    got1, got6 = run(1), run(6)
    pd.testing.assert_frame_equal(got1, got6)

    df = pd.DataFrame(rows)
    df["h"] = splitmix_value(df.doc_id.to_numpy(np.int64), 7)
    df = df.sort_values(["lang", "h", "doc_id"])
    df["rnk"] = df.groupby("lang").cumcount() + 1
    want = (df[df.rnk <= 5][["doc_id", "lang", "rnk"]]
            .reset_index(drop=True))
    want["rnk"] = want["rnk"].astype("int64")
    pd.testing.assert_frame_equal(got1, want)
    assert (got1.groupby("lang").size() == 5).all()


def test_weighted_sample_blocking_invariant_and_exact():
    """weighted_sample = sequential Poisson sampling: the n smallest
    splitmix(id) // max(w, 1) priorities (ties by id), independent of
    block layout; heavier rows must be overrepresented vs uniform."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from leiden_cuda_ray.functions.sampling import (
        splitmix_value,
        weighted_sample,
    )

    n_rows = 2000
    # weights: 10% of rows are 100x heavier
    w = np.where(np.arange(n_rows) % 10 == 0, 5000, 50).astype(np.int64)
    rows = pa.table({"doc_id": pa.array(np.arange(n_rows), pa.int64()),
                     "n_chars": pa.array(w, pa.int64())})

    def run(n_blocks):
        ds = ray.data.from_arrow(rows).repartition(n_blocks)
        return (weighted_sample(ds, n=100, seed=19).to_pandas()
                .sort_values("rnk").reset_index(drop=True))

    got1, got8 = run(1), run(8)
    pd.testing.assert_frame_equal(got1, got8)

    ids = np.arange(n_rows, dtype=np.int64)
    q = splitmix_value(ids, 19) // np.maximum(w, 1).astype(np.uint64)
    order = np.lexsort((ids, q))[:100]
    want = pd.DataFrame({"doc_id": ids[order], "n_chars": w[order],
                         "rnk": np.arange(1, 101, dtype=np.int64)})
    pd.testing.assert_frame_equal(got1, want)

    # heavy rows are 100x the weight of light ones: with 10% of rows
    # heavy, the sample must be dominated by them (uniform would give ~10)
    heavy = (got1["n_chars"] == 5000).sum()
    assert heavy > 50, heavy
