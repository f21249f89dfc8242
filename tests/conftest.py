import pytest


@pytest.fixture(scope="session")
def spark():
    from cqi_engine.session import build_session
    s = build_session("cqi-tests", master="local[4]", shuffle_partitions=8)
    yield s
