"""Hash-join helper: one place for partition-count and aggregator sizing.

Ray Data's join spawns `num_partitions` HashShuffleAggregator actors; with
default actor resources a small cluster (fewer CPUs than partitions — or a
plan with several joins) deadlocks: the aggregator pools reserve every CPU
and the upstream map tasks starve. Every engine join goes through here:
partitions scale with the cluster and aggregators request num_cpus=0 so
they always schedule and never reserve cores away from the producers.
"""

from __future__ import annotations


def _drop_empty_blocks(ds):
    """Ray 2.49's hash-shuffle join breaks on empty blocks: they bypass
    map UDFs (so a projection between two joins never fixes their schema)
    and reach the next join as schema-less/stale pandas blocks, failing
    key resolution ("No match or multiple matches for key field") at any
    partition count where some join partition is empty. Joins consume
    their whole input into aggregators anyway, so materializing here adds
    one metadata pass, not a new bottleneck."""
    import ray
    import ray.data

    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def _n(t):
        # blocks may arrive as pyarrow Tables OR pandas DataFrames
        return len(t)

    counts = ray.get([_n.remote(r) for r in refs])
    if all(n > 0 for n in counts):
        return mat

    @ray.remote
    def _to_arrow(t):
        import pandas as pd
        import pyarrow as pa

        return pa.Table.from_pandas(t) if isinstance(t, pd.DataFrame) else t

    keep = [r for r, n in zip(refs, counts) if n > 0]
    if not keep:
        keep = refs[:1]
    return ray.data.from_arrow_refs([_to_arrow.remote(r) for r in keep])


def hash_join(left, right, on, right_on=None, join_type: str = "inner",
              num_partitions: int | None = None, right_suffix: str = "_r",
              rows_per_partition: int = 65_536):
    import ray

    left = _drop_empty_blocks(left)
    right = _drop_empty_blocks(right)
    if num_partitions is None:
        # size-aware: the inputs are materialized above, so their row
        # counts are free metadata. Small joins (dimension tables,
        # pre-aggregated sides) don't get CPU-many aggregator actors —
        # actor startup dominates tiny exchanges; large joins still
        # scale to the CPU count.
        cpus = int(ray.cluster_resources().get("CPU", 4))
        rows = left.count() + right.count()
        by_size = max(2, -(-rows // rows_per_partition))
        num_partitions = min(max(2, min(cpus, 64)), by_size)
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on) if not isinstance(on, tuple) else on,
        right_on=(tuple(right_on) if right_on is not None
                  and not isinstance(right_on, tuple) else right_on),
        right_suffix=right_suffix,
        aggregator_ray_remote_args={"num_cpus": 0},
    )
