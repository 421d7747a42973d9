from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from auto_ml_platform_with_timeseries_data_spark.session import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
