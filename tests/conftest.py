import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_fixtures():
    """Fixture parquet dir for the tiny scale (6000-row images table)."""
    from geomesa_ray.sources.fixtures import ensure_fixtures

    return ensure_fixtures(SF_TINY)


@pytest.fixture(scope="session")
def small_fixtures():
    from geomesa_ray.sources.fixtures import ensure_fixtures

    return ensure_fixtures(SF_SMALL)
