import pytest


@pytest.fixture(scope="session")
def spark():
    from py_sema_spark.session import build_session

    s = build_session(app_name="pytest", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
