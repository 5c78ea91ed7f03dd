import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(ray_session, tmp_path_factory):
    """A tiny deterministic corpus + its in-memory dict for oracles."""
    from snapcrawler_ray.sources.corpus import CorpusSpec, generate_corpus

    spec = CorpusSpec(seed=42, n_pages=300, n_hosts=8, buckets=8)
    root = str(tmp_path_factory.mktemp("corpus"))
    path = generate_corpus(root, spec, use_ray=False)
    return spec, path
