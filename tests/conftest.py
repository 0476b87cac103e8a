import pytest


@pytest.fixture(scope="session")
def spark():
    from openpolicedata_spark import get_spark

    spark = get_spark(app_name="opdspark-tests", master="local[8]",
                      shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def source(spark, sf_dir):
    from openpolicedata_spark import Source, local_testdata_catalog

    return Source("TestData", catalog=local_testdata_catalog(sf_dir), spark=spark)
