from __future__ import annotations

import pytest

from retail_datalakehouse_spark.session import build_spark
from retail_datalakehouse_spark.streaming.jobs import bootstrap_protobuf_env

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # BEFORE the JVM exists: export a discovered protobuf into the env so
    # transformWithState's JVM-spawned python runners inherit it (the
    # typed-state tests skip cleanly when none is found)
    bootstrap_protobuf_env()
    # tools/fast_tests.py runs shards in parallel processes; each shard
    # gets its own warehouse dir so saveAsTable tests can't collide
    import os

    extra = {}
    wh = os.environ.get("RDL_TEST_WAREHOUSE")
    if wh:
        extra["spark.sql.warehouse.dir"] = wh
    s = build_spark("tests", master="local[4]", extra_conf=extra)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
