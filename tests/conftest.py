from __future__ import annotations

import pytest

from orientdb_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [
            (1, "Alice ", 10, 100.0),
            (2, "bob", 20, 200.0),
            (3, "Carol", 10, None),
            (4, None, 30, 50.0),
        ],
        "id int, name string, dept int, salary double",
    )


@pytest.fixture()
def depts(spark):
    return spark.createDataFrame(
        [(10, "eng"), (20, "sales")], "dept_id int, dept_name string"
    )
