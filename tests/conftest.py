import pytest


@pytest.fixture(scope="session")
def spark():
    from warc2text_spark.session import get_spark
    s = get_spark("warc2text-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
