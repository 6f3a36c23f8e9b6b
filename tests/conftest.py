import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("EZ_CDC_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from ez_cdc_spark.session import get_spark

    s = get_spark("ez_cdc_spark-tests")
    yield s
    # session is shared; don't stop between modules


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE
