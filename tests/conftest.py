from __future__ import annotations

import pytest

from who_focus_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="wfc-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
