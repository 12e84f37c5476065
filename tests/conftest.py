from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

FIXTURE_OSM = "/root/reference/test/processor_SUITE_data/osm/1.osm"
FIXTURE_POLY = "/root/reference/test/processor_SUITE_data/poly/simple.poly"


@pytest.fixture(scope="session")
def spark():
    from osm_cut_spark.session import get_session

    s = get_session(app_name="osm_cut_spark_tests", cpus=4, shuffle_partitions=8)
    yield s
