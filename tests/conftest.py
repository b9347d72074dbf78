import pytest

from dachshund_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dachshund_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        driver_memory="8g",
    )
    yield s
