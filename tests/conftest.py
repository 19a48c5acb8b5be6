import os

import pytest

# Before ray.init so workers inherit it — see stringzilla_ray/__init__.py
# for the measured jemalloc-vs-system page-fault story on this host.
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
# MALLOC_TRIM/MMAP_THRESHOLD_ deliberately NOT raised — serving large
# Arrow buffers from sbrk heap measured 3x slower at the 6.7M-turn
# corpus (see bench.py).


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
