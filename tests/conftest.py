from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickstreamtoclickhouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small local session for tests: fewer threads/partitions = faster startup
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8, driver_memory="8g")
    yield s


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"
