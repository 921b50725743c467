import os

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    from leiden_cuda_ray.sources.corpus import gen_corpus

    path = str(tmp_path_factory.mktemp("corpus") / "tiny.parquet")
    gen_corpus(path, sf=0.001)
    return path
