from __future__ import annotations

from orientdb_etl_spark import Pipeline


def run(spark, cfg, tables):
    p = Pipeline(cfg, spark=spark)
    for name, df in tables.items():
        p.register_table(name, df)
    return p.compile()


def test_aggregate(spark, people):
    out = run(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"aggregate": {
                    "groupBy": ["dept"],
                    "aggregations": ["count(1) AS n", "sum(salary) AS total"],
                }}
            ],
        },
        {"people": people},
    )
    rows = {r.dept: (r.n, r.total) for r in out.collect()}
    assert rows[10] == (2, 100.0)
    assert rows[20] == (1, 200.0)


def test_join_broadcast(spark, people, depts):
    out = run(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"join": {"with": "depts", "on": "dept = dept_id", "broadcast": True}}
            ],
        },
        {"people": people, "depts": depts},
    )
    assert out.count() == 3
    assert "dept_name" in out.columns


def test_topk(spark, people):
    out = run(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [{"topk": {"by": ["salary DESC NULLS LAST"], "k": 2}}],
        },
        {"people": people},
    )
    assert [r.id for r in out.collect()] == [2, 1]


def test_window(spark, people):
    out = run(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"window": {"columns": [
                    "row_number() OVER (PARTITION BY dept ORDER BY id) AS rn"
                ]}}
            ],
        },
        {"people": people},
    )
    rows = {r.id: r.rn for r in out.collect()}
    assert rows[1] == 1 and rows[3] == 2 and rows[2] == 1


def test_distinct_and_union(spark, people):
    out = run(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"select": {"columns": ["dept"]}},
                {"distinct": {}},
                {"union": {"with": "more"}},
            ],
        },
        {
            "people": people,
            "more": people.sparkSession.createDataFrame([(99,)], "dept int"),
        },
    )
    assert sorted(r.dept for r in out.collect()) == [10, 20, 30, 99]


def test_bm25_config_transformer(spark):
    docs = spark.createDataFrame(
        [(0, "spark window spark"), (1, "window"), (2, "nothing")],
        "doc_id long, text string",
    )
    out = run(
        spark,
        {
            "extractor": {"table": {"name": "docs"}},
            "transformers": [
                {"bm25": {"idField": "doc_id", "query": ["spark", "window"], "k": 3}},
            ],
        },
        {"docs": docs},
    )
    rows = out.collect()
    assert [r.doc_id for r in rows][:2] == [0, 1] and rows[0].bm25 > rows[1].bm25


def test_topk_per_group_exact_and_rank(spark):
    from orientdb_etl_spark.operators.relational import topk_per_group

    rows = [(g, i, v) for g in ("a", "b") for i, v in enumerate([5, 9, 1, 9, 3])]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    got = topk_per_group(df, "g", ["v DESC", "i ASC"], 2, rank_col="rank").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, []).append((r.rank, r.i, r.v))
    # v=9 at i=1 and i=3; tie broken by i ascending
    assert sorted(by_g["a"]) == [(1, 1, 9), (2, 3, 9)]
    assert sorted(by_g["b"]) == [(1, 1, 9), (2, 3, 9)]


def test_topk_per_group_plan_partial_window_group_limit(spark):
    from orientdb_etl_spark.operators.relational import topk_per_group

    df = spark.range(10_000).selectExpr("id % 50 AS g", "id AS v")
    plan = (
        topk_per_group(df, "g", ["v DESC"], 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the rank filter must become WindowGroupLimit with a Partial
    # pre-shuffle pass — not a full window over all rows
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_topk_per_group_config(spark):
    from orientdb_etl_spark import Pipeline

    df = spark.range(100).selectExpr("id % 4 AS g", "id AS v")
    p = Pipeline(
        {
            "extractor": {"table": {"name": "t"}},
            "transformers": [
                {"topkPerGroup": {"by": ["g"], "orderBy": ["v DESC"], "k": 1}}
            ],
        },
        spark=spark,
    ).register_table("t", df)
    got = {(r.g, r.v) for r in p.compile().collect()}
    assert got == {(0, 96), (1, 97), (2, 98), (3, 99)}


def test_explode_transformer_variants(spark):
    from orientdb_etl_spark import Pipeline

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)], "id long, xs array<string>"
    )

    def run(cfg):
        p = Pipeline(
            {"extractor": {"table": {"name": "t"}}, "transformers": [cfg]},
            spark=spark,
        ).register_table("t", df)
        return p.compile().collect()

    inner = run({"explode": {"field": "xs", "outField": "x"}})
    assert sorted((r.id, r.x) for r in inner) == [(1, "a"), (1, "b")]

    outer = run({"explode": {"field": "xs", "outField": "x", "outer": True}})
    got = sorted(
        ((r.id, r.x) for r in outer), key=lambda t: (t[0], t[1] or "")
    )
    assert got == [(1, "a"), (1, "b"), (2, None), (3, None)]

    posed = run({"explode": {"field": "xs", "outField": "x", "position": "i"}})
    assert sorted((r.id, r.i, r.x) for r in posed) == [(1, 0, "a"), (1, 1, "b")]


def test_unpivot_transformer_melt(spark):
    from orientdb_etl_spark import Pipeline

    df = spark.createDataFrame([(1, 10.0, 0.5)], "k long, qty double, tax double")
    p = Pipeline(
        {
            "extractor": {"table": {"name": "t"}},
            "transformers": [
                {"unpivot": {"ids": ["k"], "values": ["qty", "tax"],
                             "varField": "metric", "valueField": "v"}}
            ],
        },
        spark=spark,
    ).register_table("t", df)
    got = sorted((r.k, r.metric, r.v) for r in p.compile().collect())
    assert got == [(1, "qty", 10.0), (1, "tax", 0.5)]


def test_merge_rollup_law_and_refusals(spark):
    """merge(partials) == rollup(whole), for arbitrary splits; avg-style
    states are refused outright."""
    import pytest

    from orientdb_etl_spark.operators.relational import merge_rollup
    from pyspark.sql import functions as F

    df = spark.range(1000).selectExpr("id % 7 AS k", "id AS v")

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        )

    parts = [agg(df.filter(f"id % 3 = {i}")) for i in range(3)]
    merged = merge_rollup(parts, ["k"], {"n": "sum", "s": "sum", "mn": "min", "mx": "max"})
    whole = agg(df)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
    with pytest.raises(ValueError, match="unmergeable"):
        merge_rollup(parts, ["k"], {"n": "avg"})
    with pytest.raises(ValueError, match="at least one"):
        merge_rollup([], ["k"], {"n": "sum"})
