import pytest


@pytest.fixture(scope="session")
def spark():
    from sorting_compressed_time_series_spark.session import get_spark

    s = get_spark(app="tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
