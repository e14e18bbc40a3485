from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("OPS_SPARK_TEST_SF", "/root/testdata/sf0.001")
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from ops_spark.session import get_session

    spark = get_session(app_name="ops_spark_tests", cores=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
