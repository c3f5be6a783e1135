from __future__ import annotations

import pytest

from retail_datalakehouse_spark.session import build_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_spark("tests", master="local[4]")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
