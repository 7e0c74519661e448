from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orientdb_etl_spark import Pipeline
from orientdb_etl_spark.loaders import edges_df, vertices_df
from orientdb_etl_spark.operators.core import ETLHaltError


def make_pipeline(spark, cfg, tables):
    p = Pipeline(cfg, spark=spark)
    for name, df in tables.items():
        p.register_table(name, df)
    return p


def test_merge_enriches_and_overwrites(spark, people):
    updates = spark.createDataFrame(
        [(1, 999.0), (3, 300.0)], "id int, salary double"
    )
    p = make_pipeline(
        spark,
        {
            "extractor": {"table": {"name": "updates"}},
            "transformers": [
                {"merge": {"joinFieldName": "id", "lookup": "people.id"}}
            ],
        },
        {"updates": updates, "people": people},
    )
    out = p.compile()
    rows = {r.id: (r.name, r.salary) for r in out.collect()}
    # incoming salary wins; name carried from existing
    assert rows[1] == ("Alice ", 999.0)
    assert rows[3] == ("Carol", 300.0)


def test_merge_skip_action_drops_misses(spark, people):
    updates = spark.createDataFrame([(1,), (99,)], "id int")
    p = make_pipeline(
        spark,
        {
            "extractor": {"table": {"name": "updates"}},
            "transformers": [
                {"merge": {
                    "joinFieldName": "id",
                    "lookup": "people.id",
                    "unresolvedLinkAction": "SKIP",
                }}
            ],
        },
        {"updates": updates, "people": people},
    )
    assert [r.id for r in p.compile().collect()] == [1]


def test_merge_halt_action(spark, people):
    updates = spark.createDataFrame([(99,)], "id int")
    p = make_pipeline(
        spark,
        {
            "extractor": {"table": {"name": "updates"}},
            "transformers": [
                {"merge": {
                    "joinFieldName": "id",
                    "lookup": "people.id",
                    "unresolvedLinkAction": "HALT",
                }}
            ],
        },
        {"updates": updates, "people": people},
    )
    # HALT is a validation gate at action time (observe() rides the sink
    # job — no second pass over the join): compile() stays lazy and runs
    # NO Spark job; run() raises
    sc = p.ctx.spark.sparkContext
    sc.setJobGroup("halt_compile_probe", "assert compile is lazy")
    p.compile()
    assert list(sc.statusTracker().getJobIdsForGroup("halt_compile_probe")) == []
    sc.setJobGroup("default", "")
    with pytest.raises(ETLHaltError):
        p.run()


def test_link_scalar(spark, people, depts):
    p = make_pipeline(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"link": {
                    "joinFieldName": "dept",
                    "lookup": "depts.dept_id",
                    "linkFieldName": "dept_name",
                    "linkValueField": "dept_name",
                    "removeJoinField": True,
                }}
            ],
        },
        {"people": people, "depts": depts},
    )
    out = p.compile()
    assert "dept" not in out.columns
    rows = {r.id: r.dept_name for r in out.collect()}
    assert rows == {1: "eng", 2: "sales", 3: "eng", 4: None}


def test_link_array_linkset(spark, depts):
    src = spark.createDataFrame(
        [(1, [10, 20, 20]), (2, [30]), (3, None)],
        "id int, depts array<int>",
    )
    p = make_pipeline(
        spark,
        {
            "extractor": {"table": {"name": "src"}},
            "transformers": [
                {"link": {
                    "joinFieldName": "depts",
                    "lookup": "depts.dept_id",
                    "linkFieldName": "names",
                    "linkValueField": "dept_name",
                    "type": "LINKSET",
                }}
            ],
        },
        {"src": src, "depts": depts},
    )
    rows = {r.id: r.names for r in p.compile().collect()}
    assert rows[1] == ["eng", "sales"]
    assert rows[2] == []
    assert rows[3] == []


def test_link_array_halt_on_unresolved_element(spark, depts):
    src = spark.createDataFrame(
        [(1, [10, 20]), (2, [30])], "id int, depts array<int>"
    )
    p = make_pipeline(
        spark,
        {
            "extractor": {"table": {"name": "src"}},
            "transformers": [
                {"link": {
                    "joinFieldName": "depts",
                    "lookup": "depts.dept_id",
                    "linkFieldName": "names",
                    "linkValueField": "dept_name",
                    "type": "LINKSET",
                    "unresolvedLinkAction": "HALT",
                }}
            ],
        },
        {"src": src, "depts": depts},
    )
    with pytest.raises(ETLHaltError):
        p.run()


def test_link_array_create_appends_placeholders(spark, depts):
    src = spark.createDataFrame(
        [(1, [10, 30]), (2, [30, 40])], "id int, depts array<int>"
    )
    p = make_pipeline(
        spark,
        {
            "extractor": {"table": {"name": "src"}},
            "transformers": [
                {"link": {
                    "joinFieldName": "depts",
                    "lookup": "depts.dept_id",
                    "linkFieldName": "links",
                    "type": "LINKSET",
                    "unresolvedLinkAction": "CREATE",
                }}
            ],
        },
        {"src": src, "depts": depts},
    )
    out = p.compile()
    rows = {r.id: sorted(r.links) for r in out.collect()}
    assert rows[1] == [10, 30]  # 30 resolved against its placeholder
    assert rows[2] == [30, 40]
    dim = p.ctx.tables["depts"]
    assert sorted(r.dept_id for r in dim.collect()) == [10, 20, 30, 40]
    assert dim.filter(F.col("dept_id") == 40).first().dept_name is None


def test_link_create_appends_placeholders(spark, people, depts):
    p = make_pipeline(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"link": {
                    "joinFieldName": "dept",
                    "lookup": "depts.dept_id",
                    "linkFieldName": "dept_link",
                    "unresolvedLinkAction": "CREATE",
                }}
            ],
        },
        {"people": people, "depts": depts},
    )
    out = p.compile()
    # dept 30 had no dimension row -> placeholder created, link resolves
    rows = {r.id: r.dept_link for r in out.collect()}
    assert rows[4] == 30
    dim = p.ctx.tables["depts"]
    assert dim.count() == 3
    placeholder = dim.filter(F.col("dept_id") == 30).first()
    assert placeholder.dept_name is None


def test_vertex_and_edge(spark, people, depts):
    p = make_pipeline(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"vertex": {"class": "Person", "idField": "id"}},
                {"edge": {
                    "joinFieldName": "dept",
                    "lookup": "depts.dept_id",
                    "class": "WORKS_IN",
                    "sourceIdField": "id",
                }},
            ],
        },
        {"people": people, "depts": depts},
    )
    p.compile()
    v = vertices_df(p.ctx)
    e = edges_df(p.ctx)
    assert v.filter(F.col("label") == "Person").count() == 4
    edges = {(r.src, r.dst) for r in e.collect()}
    assert edges == {("1", "10"), ("3", "10"), ("2", "20")}


def test_edge_direction_in_swaps(spark, people, depts):
    p = make_pipeline(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"edge": {
                    "joinFieldName": "dept",
                    "lookup": "depts.dept_id",
                    "class": "HAS_MEMBER",
                    "sourceIdField": "id",
                    "direction": "in",
                }},
            ],
        },
        {"people": people, "depts": depts},
    )
    p.compile()
    edges = {(r.src, r.dst) for r in edges_df(p.ctx).collect()}
    assert ("10", "1") in edges


def test_edge_create_placeholder_vertices(spark, people, depts):
    p = make_pipeline(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"edge": {
                    "joinFieldName": "dept",
                    "lookup": "depts.dept_id",
                    "class": "WORKS_IN",
                    "sourceIdField": "id",
                    "unresolvedLinkAction": "CREATE",
                }},
            ],
        },
        {"people": people, "depts": depts},
    )
    p.compile()
    v = vertices_df(p.ctx)
    assert v.filter((F.col("label") == "depts") & (F.col("id") == "30")).count() == 1
    e = edges_df(p.ctx)
    assert ("4", "30") in {(r.src, r.dst) for r in e.collect()}
