import pytest

from datamunging_spark import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", **{"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from datamunging_spark.sources import load_tables

    return load_tables(spark, SF)
