"""partition_rand_index partition-reuse path (VERDICT r4 item 5): when
graph_leiden_objective / graph_louvain_objective already ran in this
process, the rand index must fold from their WRITTEN partitions instead
of re-running both optimizers — and produce bit-identical sums to the
fresh path (the optimizers are deterministic pure functions, so the
cached partitions equal a fresh run's)."""
def test_rand_index_reuse_matches_fresh(tmp_path):
    import leiden_cuda_ray.pipelines.corpus_queries as cq

    # tier name = tmp dirname → unparseable sf → generator uses sf=0.001
    sf_dir = str(tmp_path)

    # fresh path first (no partitions cached for this tier yet)
    cq._PARTITION_PATHS.clear()
    fresh = cq.partition_rand_index(sf_dir).to_pandas()
    tier_keys = [k for k in cq._PARTITION_PATHS if k[1].startswith("ri_")]
    assert tier_keys, "fresh path must publish ri_* partitions"

    # now seed the cache the way the objective queries do, and re-run
    cq.graph_leiden_objective(sf_dir).to_pandas()
    cq.graph_louvain_objective(sf_dir).to_pandas()
    tier = tier_keys[0][0]
    assert (tier, "leiden_comm") in cq._PARTITION_PATHS
    assert (tier, "louvain_comm") in cq._PARTITION_PATHS
    reused = cq.partition_rand_index(sf_dir).to_pandas()

    assert fresh.equals(reused), (fresh, reused)
    assert int(fresh["agree2"].iloc[0]) >= 0
    # RI in [0, 1]
    n = int(fresh["n_vertices"].iloc[0])
    assert 0 <= int(fresh["agree2"].iloc[0]) <= n * (n - 1)
    cq._PARTITION_PATHS.clear()
