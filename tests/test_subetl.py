from __future__ import annotations

from orientdb_etl_spark import Pipeline


def test_subetl_embedded_list(spark):
    orders = spark.createDataFrame([(1,), (2,), (3,)], "okey int")
    items = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (2, 1, "c")], "okey int, line int, sku string"
    )
    p = Pipeline(
        {
            "extractor": {"table": {"name": "orders"}},
            "transformers": [
                {"etl": {
                    "pipeline": {"extractor": {"table": {"name": "items"}}},
                    "joinFieldName": "okey",
                    "fieldName": "lines",
                    "type": "EMBEDDEDLIST",
                    "orderBy": "line",
                }}
            ],
        },
        spark=spark,
    )
    p.register_table("orders", orders)
    p.register_table("items", items)
    rows = {r.okey: r.lines for r in p.compile().collect()}
    assert [x.sku for x in rows[1]] == ["a", "b"]
    assert [x.sku for x in rows[2]] == ["c"]
    assert rows[3] is None


def test_subetl_embedded_map(spark):
    orders = spark.createDataFrame([(1,)], "okey int")
    items = spark.createDataFrame(
        [(1, "k1", 10), (1, "k2", 20)], "okey int, k string, v int"
    )
    p = Pipeline(
        {
            "extractor": {"table": {"name": "orders"}},
            "transformers": [
                {"etl": {
                    "pipeline": {"extractor": {"table": {"name": "items"}}},
                    "joinFieldName": "okey",
                    "fieldName": "kv",
                    "type": "EMBEDDEDMAP",
                    "keyField": "k",
                    "valueField": "v",
                }}
            ],
        },
        spark=spark,
    )
    p.register_table("orders", orders)
    p.register_table("items", items)
    row = p.compile().first()
    assert row.kv == {"k1": 10, "k2": 20}


def test_subetl_linkset(spark):
    orders = spark.createDataFrame([(1,), (2,)], "okey int")
    items = spark.createDataFrame(
        [(1, 5), (1, 5), (1, 3)], "okey int, line int"
    )
    p = Pipeline(
        {
            "extractor": {"table": {"name": "orders"}},
            "transformers": [
                {"etl": {
                    "pipeline": {"extractor": {"table": {"name": "items"}}},
                    "joinFieldName": "okey",
                    "fieldName": "lines",
                    "type": "LINKSET",
                    "valueField": "line",
                }}
            ],
        },
        spark=spark,
    )
    p.register_table("orders", orders)
    p.register_table("items", items)
    rows = {r.okey: r.lines for r in p.compile().collect()}
    assert rows[1] == [3, 5]
