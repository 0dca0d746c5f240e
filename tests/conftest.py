from __future__ import annotations

import pytest

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    from landscape_spark.session import get_spark

    s = get_spark(app_name="landscape_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small():
    return SF0001


@pytest.fixture(scope="session")
def sf_mid():
    return SF001
