import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running subprocess/soak tests"
    )


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from steel_energy_consumption_prediction_using_pyspark_spark.session import (
        get_session,
    )

    wh = tmp_path_factory.mktemp("warehouse")
    s = get_session(
        "engine-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
