import os

import pytest


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # fast test startup
    from sjot_spark.session import get_spark

    s = get_spark(app_name="sjot_spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
