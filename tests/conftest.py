import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def transcripts_dir():
    from data_profiler_ray.synthetic import transcripts_path
    return transcripts_path(20000, seed=42)


@pytest.fixture(scope="session")
def dirty_transcripts_dir():
    from data_profiler_ray.synthetic import transcripts_path
    return transcripts_path(
        20000, seed=42, dup_frac=0.01, gap_frac=0.005, bad_role_frac=0.01,
        ts_regression_frac=0.005, dangling_tool_frac=0.2)
