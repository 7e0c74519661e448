from __future__ import annotations

import pytest

from orientdb_etl_spark.session import get_spark


@pytest.fixture(scope="session", autouse=True)
def _events_fixture_preflight():
    # Loud one-line failure if the driver regenerates events.parquet with a
    # ts storage type normalize_ts doesn't handle (it has silently changed
    # between rounds before: timestamp[ns] -> timestamp[us]).
    import pyarrow.parquet as pq

    ts = str(pq.read_schema("/root/testdata/sf0.001/events.parquet").field("ts").type)
    known = {"timestamp[us]", "timestamp[ns]", "int64"}
    assert ts in known, (
        f"events.parquet ts stored as {ts!r}, not one of {sorted(known)}; "
        "update orientdb_etl_spark.session.normalize_ts for the new fixture schema"
    )


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
