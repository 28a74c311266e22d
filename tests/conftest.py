from __future__ import annotations

import pytest

from affinity_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="affinity-spark-tests",
        master="local[4]",
        conf={"spark.sql.shuffle.partitions": "4"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
