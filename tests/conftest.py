from __future__ import annotations

import pytest

from node_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("node-etl-spark-tests", master="local[4]", shuffle_partitions=4)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
