"""Session-scoped Ray fixture — init ONCE per pytest session."""

from __future__ import annotations

import sys

import pytest

# Concurrent pytest runs (driver + judge + builder) can race on pytest's
# assertion-rewrite .pyc cache under tests/__pycache__, surfacing as
# spurious collection-time ImportErrors. Rewriting in memory is cheap;
# never write bytecode from the test session.
sys.dont_write_bytecode = True


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
    yield
    ray.shutdown()


@pytest.fixture(scope="session", autouse=True)
def _quiet_ray_data():
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
