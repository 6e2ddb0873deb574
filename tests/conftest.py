import pytest


@pytest.fixture(scope="session")
def spark():
    from cs_search_engine_architecture_spark.session import get_spark

    s = get_spark(app_name="spark-sea-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
