import os

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF0001 = f"{TESTDATA}/sf0.001"
SF001 = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from baum_welch_spark.session import get_spark

    s = get_spark(app_name="baum-welch-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
