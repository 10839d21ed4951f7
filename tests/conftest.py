import pytest

from liq_stream_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="liq_stream_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
