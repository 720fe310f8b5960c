import pytest


@pytest.fixture(scope="session")
def spark():
    from aperag_spark.session import get_spark

    s = get_spark(
        app_name="aperag-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    yield s
    s.stop()
