from __future__ import annotations

import os

import pytest

# Keep unit-test sessions small and fast; bench/driver use local[32].
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("WIKID_SPARK_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_DIR_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from wikid_spark.session import get_spark

    s = get_spark(app_name="wikid_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
