import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # smaller local session for tests

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from geomesa_spark.session import get_spark
    s = get_spark("geomesa-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
