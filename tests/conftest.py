from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from storage_spark.session import get_spark

    s = get_spark("storage_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
