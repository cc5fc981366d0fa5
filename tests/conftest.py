from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
    # tokens is a list<int32> payload column; keep it an Arrow list, never a
    # ragged-tensor extension (ragged lists fail the auto-cast on to_pandas)
    ctx.enable_tensor_extension_casting = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def micro_table() -> pa.Table:
    from aisdb_ray.fixtures import build_token_table

    return build_token_table("t0-micro")


@pytest.fixture(scope="session")
def micro_df(micro_table) -> pd.DataFrame:
    return micro_table.to_pandas()


@pytest.fixture(scope="session")
def micro_dir() -> str:
    from aisdb_ray.fixtures import fixture_dir

    return fixture_dir("t0-micro")


@pytest.fixture(scope="session")
def small_dir() -> str:
    from aisdb_ray.fixtures import fixture_dir

    return fixture_dir("t1-small")


@pytest.fixture(scope="session")
def small_df() -> pd.DataFrame:
    from aisdb_ray.fixtures import build_token_table

    return build_token_table("t1-small").to_pandas()
