import os

import pytest


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # fast test startup
    # Pin the test driver heap so the suite's JVM and the DuckDB oracle
    # (bounded in test_oracle_parity.py) cannot starve each other when
    # the full suite runs in one process on a loaded host.
    os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
    from sjot_spark.session import get_spark

    s = get_spark(app_name="sjot_spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
