from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aduana_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="aduana-tests",
        master="local[8]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "8g",
            "spark.sql.warehouse.dir": "/tmp/aduana-wh",
            # tiny fixtures: AQE's extra stages only add latency here;
            # production sessions (session.get_spark defaults) keep it on
            "spark.sql.adaptive.enabled": "false",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
