"""Loader (sink) paths: parquet/csv/json/graph/memory round-trips."""

from __future__ import annotations

import pytest

from orientdb_etl_spark import Pipeline


@pytest.fixture()
def base_cfg():
    return {"extractor": {"table": {"name": "people"}}}


def _pipeline(cfg, spark, people):
    p = Pipeline(cfg, spark=spark)
    p.register_table("people", people)
    return p


def test_parquet_sink_partitioned(spark, people, tmp_path):
    out = str(tmp_path / "out_parquet")
    cfg = {
        "extractor": {"table": {"name": "people"}},
        "loader": {"parquet": {"path": out, "partitionBy": ["dept"]}},
    }
    _pipeline(cfg, spark, people).run()
    back = spark.read.parquet(out)
    assert back.count() == 4
    # partition pruning works on the layout
    assert (tmp_path / "out_parquet" / "dept=10").exists()


def test_csv_sink_roundtrip(spark, people, tmp_path):
    out = str(tmp_path / "out_csv")
    cfg = {
        "extractor": {"table": {"name": "people"}},
        "loader": {"csv": {"path": out, "header": True}},
    }
    _pipeline(cfg, spark, people).run()
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 4 and set(back.columns) == {"id", "name", "dept", "salary"}


def test_json_sink_roundtrip(spark, people, tmp_path):
    out = str(tmp_path / "out_json")
    cfg = {
        "extractor": {"table": {"name": "people"}},
        "loader": {"json": {"path": out}},
    }
    _pipeline(cfg, spark, people).run()
    assert spark.read.json(out).count() == 4


def test_orc_sink_roundtrip_via_orc_extractor(spark, people, tmp_path):
    """ORC path sink -> ORC extractor round-trip (the columnar
    interchange twin of the parquet path; README claims it, this pins
    it), including partitioned layout."""
    out = str(tmp_path / "out_orc")
    cfg = {
        "extractor": {"table": {"name": "people"}},
        "loader": {"orc": {"path": out, "partitionBy": ["dept"]}},
    }
    _pipeline(cfg, spark, people).run()
    back_cfg = {
        "extractor": {"orc": {"path": out}},
        "loader": {"memory": {"view": "back"}},
    }
    r = Pipeline(back_cfg, spark=spark).run()
    back = r.outputs["back"]
    assert back.count() == 4
    assert set(back.columns) == {"id", "name", "dept", "salary"}
    assert {x.dept for x in back.select("dept").distinct().collect()} == {
        r2.dept for r2 in people.select("dept").distinct().collect()
    }


def test_orientdb_graph_sink(spark, people, depts, tmp_path):
    out = str(tmp_path / "graph")
    cfg = {
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
        "loader": {"orientdb": {"path": out}},
    }
    p = _pipeline(cfg, spark, people)
    p.register_table("depts", depts)
    p.run()
    docs = spark.read.parquet(f"{out}/documents")
    verts = spark.read.parquet(f"{out}/vertices")
    edges = spark.read.parquet(f"{out}/edges")
    assert docs.count() == 4 and verts.count() == 4
    # depts 10 and 20 resolve; dept 30 has no target → no edge
    assert edges.count() == 3
    assert set(edges.select("label").distinct().toPandas()["label"]) == {"WORKS_IN"}


def test_orientdb_jdbc_ddl_roundtrip(spark, people, tmp_path):
    """classes/indexes config → real sink DDL on an embedded Derby DB
    (OOrientDBLoader.java:406-513): typed columns, CREATE UNIQUE INDEX,
    ensure-exists on re-run, and read-back parity."""
    url = f"jdbc:derby:{tmp_path}/ddl_db;create=true"
    cfg = {
        "extractor": {"table": {"name": "people"}},
        "loader": {"orientdb": {
            "dbURL": url,
            "class": "PEOPLE",
            "classes": [{
                "name": "PEOPLE",
                "fields": [
                    {"name": "id", "type": "LONG"},
                    {"name": "salary", "type": "DOUBLE"},
                ],
            }],
            "indexes": [
                {"class": "PEOPLE", "fields": ["id:long"], "type": "UNIQUE"}
            ],
        }},
    }
    _pipeline(cfg, spark, people).run()

    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "PEOPLE")
        .load()
    )
    assert back.count() == 4
    assert dict(back.dtypes)["id"] == "bigint"  # classes DDL applied the cast

    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        rs = conn.getMetaData().getIndexInfo(None, None, "PEOPLE", False, False)
        idx = set()
        while rs.next():
            n = rs.getString("INDEX_NAME")
            if n:
                idx.add(n)
    finally:
        conn.close()
    assert "PEOPLE_id_idx" in idx

    # ensure-exists: re-running the same pipeline must not fail on the
    # already-present index
    _pipeline(cfg, spark, people).run()


def test_orientdb_unique_index_validation_halts(spark, tmp_path):
    from orientdb_etl_spark.operators.core import ETLHaltError

    dup = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "id int, v string"
    )
    cfg = {
        "extractor": {"table": {"name": "people"}},
        "loader": {"orientdb": {
            "path": str(tmp_path / "out"),
            "indexes": [
                {"class": "V", "fields": ["id:integer"], "type": "UNIQUE"}
            ],
        }},
    }
    p = _pipeline(cfg, spark, dup)
    with pytest.raises(ETLHaltError):
        p.run()


def test_memory_loader_and_output_var(spark, people):
    cfg = {
        "extractor": {"table": {"name": "people"}},
        "transformers": [{"filter": {"condition": "dept = 10"}}],
        "loader": {"memory": {"view": "eng_only"}},
    }
    res = _pipeline(cfg, spark, people).run()
    assert res.outputs["eng_only"].count() == 2
    assert spark.table("eng_only").count() == 2


def test_observe_rows_loaded_metric(spark, people, tmp_path):
    cfg = {
        "extractor": {"table": {"name": "people"}},
        "transformers": [{"filter": {"condition": "dept = 10"}}],
        "loader": {"parquet": {"path": str(tmp_path / "obs_out")}},
    }
    res = _pipeline(cfg, spark, people).run()
    assert res.stats.rows_loaded == 2
    assert any("rows_loaded: 2" in n for n in res.stats.notes)


def test_bucketed_tables_join_without_shuffle(spark, people, depts, tmp_path):
    import shutil

    from pyspark.sql import functions as F

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, df, key in (("b_people", people, "dept"), ("b_depts", depts, "dept_id")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        cfg = {
            "extractor": {"table": {"name": "src"}},
            "loader": {"table": {"name": name,
                                  "bucketBy": {"n": 4, "columns": [key]}}},
        }
        p = Pipeline(cfg, spark=spark)
        p.register_table("src", df)
        p.run()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_people").join(
            spark.table("b_depts"),
            F.col("dept") == F.col("dept_id"),
        )
        assert j.count() == 3
        plan = j._jdf.queryExecution().executedPlan().toString()
        # bucketing co-locates both sides: no shuffle exchange in the join
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_sorted_parquet_write_produces_skippable_files(spark, tmp_path):
    """sortBy layout: each output file must cover a narrow, near-disjoint
    key range (parquet row-group min/max stats enable file/row-group
    skipping for selective predicates)."""
    import glob

    import pyarrow.parquet as pq

    df = spark.range(0, 100_000).selectExpr(
        "cast(id as bigint) k", "id % 7 v"
    # scatter input so unsorted files would each span the full key range
    ).repartition(8)
    out = str(tmp_path / "sorted")
    cfg = {
        "extractor": {"table": {"name": "src"}},
        "loader": {"parquet": {"path": out, "sortBy": ["k"], "numFiles": 8}},
    }
    p = Pipeline(cfg, spark=spark)
    p.register_table("src", df)
    p.run()

    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        ki = next(
            i for i in range(len(md.schema.names))
            if md.schema.column(i).name == "k"
        )
        mins = [md.row_group(r).column(ki).statistics.min for r in range(md.num_row_groups)]
        maxs = [md.row_group(r).column(ki).statistics.max for r in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4
    # every file spans a small slice of the 100k key space...
    assert all(hi - lo <= 100_000 / len(ranges) * 1.5 for lo, hi in ranges)
    # ...and the slices are pairwise non-overlapping (range partitioner)
    ranges.sort()
    assert all(ranges[i][1] <= ranges[i + 1][0] for i in range(len(ranges) - 1))

    # round-trip intact
    assert spark.read.parquet(out).count() == 100_000


def test_parquet_numfiles_compaction(spark, tmp_path):
    import glob

    out = str(tmp_path / "compacted")
    p = Pipeline(
        {
            "extractor": {"table": {"name": "src"}},
            "loader": {"parquet": {"path": out, "numFiles": 2}},
        },
        spark=spark,
    )
    p.register_table("src", spark.range(10_000).repartition(16))
    p.run()
    assert len(glob.glob(f"{out}/*.parquet")) == 2
    assert spark.read.parquet(out).count() == 10_000


def test_parquet_merge_mode_idempotent_rerun(spark, tmp_path):
    """The batch MERGE sink: re-running the SAME pipeline must leave the
    sink byte-for-byte identical (same rows), and an overlapping second
    batch must replace exactly its keys (last-writer-wins)."""
    from orientdb_etl_spark.context import PipelineContext
    from orientdb_etl_spark.loaders import run_loader

    target = str(tmp_path / "merged")
    ctx = PipelineContext(spark=spark)

    b1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, v string, x double",
    )
    cfg = {"parquet": {"path": target, "mode": "merge", "keys": ["k"],
                       "numBuckets": 8}}
    run_loader(ctx, b1, cfg)
    first = {(r.k, r.v, r.x) for r in spark.read.parquet(target)
             .select("k", "v", "x").collect()}
    assert first == {(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)}

    # idempotency: replaying the identical batch changes nothing
    run_loader(ctx, b1, cfg)
    again = {(r.k, r.v, r.x) for r in spark.read.parquet(target)
             .select("k", "v", "x").collect()}
    assert again == first

    # overlap: key 2 replaced, key 4 added, keys 1/3 untouched
    b2 = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "k long, v string, x double"
    )
    run_loader(ctx, b2, cfg)
    final = {(r.k, r.v, r.x) for r in spark.read.parquet(target)
             .select("k", "v", "x").collect()}
    assert final == {(1, "a", 10.0), (2, "B", 200.0), (3, "c", 30.0),
                     (4, "d", 40.0)}


def test_parquet_merge_mode_requires_keys(spark, tmp_path):
    import pytest

    from orientdb_etl_spark.context import PipelineContext
    from orientdb_etl_spark.loaders import run_loader

    ctx = PipelineContext(spark=spark)
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="needs 'keys'"):
        run_loader(ctx, df, {"parquet": {"path": str(tmp_path / "t"),
                                         "mode": "merge"}})
