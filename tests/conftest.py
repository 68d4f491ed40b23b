import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_tables(tmp_path_factory):
    """Generate the t1 smoke fixture tables (FIXTURES.md §4) once per session."""
    from sievedata.fixtures import generate_fixture

    root = tmp_path_factory.mktemp("t1")
    paths = generate_fixture(str(root), n_docs=2000, n_vendors=20, seed=42)
    return paths
