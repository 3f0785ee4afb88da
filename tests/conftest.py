from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from rust_s2_spark.engine.session import get_spark

    s = get_spark(app_name="rust-s2-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
