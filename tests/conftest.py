import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from cqi_engine.session import build_session
    # CQI_TEST_CPUS lets the same suite run at two cluster sizes
    # (north-rule verification: `pytest -x -q` at N and 4N executors).
    cpus = int(os.environ.get("CQI_TEST_CPUS", "4"))
    s = build_session("cqi-tests", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus))
    yield s
