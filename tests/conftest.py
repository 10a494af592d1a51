from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from skipmap_processor_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master="local[4]",
        app_name="skipmap-tests",
        shuffle_partitions=4,
        driver_memory="4g",
    )
    yield s
    s.stop()


@pytest.fixture()
def warehouse(tmp_path):
    d = tmp_path / "warehouse"
    d.mkdir()
    return str(d)
