import pytest


@pytest.fixture(scope="session")
def spark():
    from itext2kg_spark.session import get_spark

    s = get_spark(app_name="itext2kg_spark-tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
