from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from ragflow_ocr_spark.spark.session import get_spark

    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
