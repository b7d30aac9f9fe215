import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small + fast for unit tests


@pytest.fixture(scope="session")
def spark():
    from crumble_spark.session import get_spark

    s = get_spark(app="crumble-spark-tests", shuffle_partitions=4)
    yield s
    s.stop()
