from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from mongo_olap_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    from mongo_olap_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "events").cache()
