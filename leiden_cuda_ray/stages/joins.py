"""Hash-join helper: one place for partition-count and aggregator sizing.

Ray Data's join spawns `num_partitions` HashShuffleAggregator actors; with
default actor resources a small cluster (fewer CPUs than partitions — or a
plan with several joins) deadlocks: the aggregator pools reserve every CPU
and the upstream map tasks starve. Every engine join goes through here:
partitions scale with the cluster and aggregators request num_cpus=0 so
they always schedule and never reserve cores away from the producers.
"""

from __future__ import annotations


def hash_join(left, right, on, right_on=None, join_type: str = "inner",
              num_partitions: int | None = None, right_suffix: str = "_r"):
    import ray

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, min(cpus, 64))
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
