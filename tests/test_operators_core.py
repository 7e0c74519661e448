from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orientdb_etl_spark import Pipeline
from orientdb_etl_spark.operators.core import ETLHaltError


def run_mem(spark, cfg, tables=None):
    cfg = dict(cfg)
    cfg.setdefault("loader", {"memory": {"view": "res"}})
    p = Pipeline(cfg, spark=spark)
    for name, df in (tables or {}).items():
        p.register_table(name, df)
    return p.run().outputs["res"]


def test_csv_declared_columns(spark):
    lines = spark.createDataFrame(
        [("1;a;2.5",), ("2;b;3.5",)], "value string"
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "lines"}},
            "transformers": [
                {"csv": {"separator": ";", "columns": ["id:INTEGER", "s:STRING", "x:DOUBLE"]}}
            ],
        },
        {"lines": lines},
    )
    rows = {r.id: (r.s, r.x) for r in out.collect()}
    assert rows == {1: ("a", 2.5), 2: ("b", 3.5)}
    assert dict(out.dtypes) == {"id": "int", "s": "string", "x": "double"}


def test_csv_header_and_inference(spark):
    lines = spark.createDataFrame(
        [("id,name,score",), ("1,ann,9.5",), ("2,bo,7.0",)], "value string"
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "lines"}},
            "transformers": [{"csv": {"columnsOnFirstLine": True}}],
        },
        {"lines": lines},
    )
    assert set(out.columns) == {"id", "name", "score"}
    assert out.count() == 2
    types = dict(out.dtypes)
    assert types["id"] == "bigint"
    assert types["score"] == "double"


def test_csv_null_value(spark):
    lines = spark.createDataFrame([("1,NULL",), ("2,x",)], "value string")
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "lines"}},
            "transformers": [
                {"csv": {"columns": ["id:INTEGER", "s:STRING"], "nullValue": "NULL"}}
            ],
        },
        {"lines": lines},
    )
    rows = {r.id: r.s for r in out.collect()}
    assert rows == {1: None, 2: "x"}


def test_field_set_remove(spark, people):
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"field": {"fieldName": "name2", "expression": "name.trim()"}},
                {"field": {"fieldName": "const", "value": 42}},
                {"field": {"operation": "remove", "fieldName": "salary"}},
            ],
        },
        {"people": people},
    )
    assert "salary" not in out.columns
    row = out.filter(F.col("id") == 1).first()
    assert row.name2 == "Alice" and row.const == 42


def test_rename(spark, people):
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [{"rename": {"fields": {"name": "full_name"}}}],
        },
        {"people": people},
    )
    assert "full_name" in out.columns and "name" not in out.columns


def test_flow_skip_with_if(spark, people):
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [{"flow": {"operation": "skip", "if": "dept = 10"}}],
        },
        {"people": people},
    )
    assert sorted(r.id for r in out.collect()) == [2, 4]


def test_flow_halt_raises(spark, people):
    with pytest.raises(ETLHaltError):
        run_mem(
            spark,
            {
                "extractor": {"table": {"name": "people"}},
                "transformers": [{"flow": {"operation": "halt", "if": "salary IS NULL"}}],
            },
            {"people": people},
        )


def test_json_transformer(spark):
    data = spark.createDataFrame(
        [(1, '{"a": 5, "b": "x"}'), (2, '{"a": 7, "b": "y"}')], "id int, value string"
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "data"}},
            "transformers": [{"json": {"field": "value"}}],
        },
        {"data": data},
    )
    rows = {r.id: (r.a, r.b) for r in out.collect()}
    assert rows == {1: (5, "x"), 2: (7, "y")}


def test_code_transformer(spark, people):
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"code": {"code": "df.filter(F.col('dept') == 10).select('id')"}}
            ],
        },
        {"people": people},
    )
    assert sorted(r.id for r in out.collect()) == [1, 3]


def test_command_transformer(spark, people):
    out = run_mem(
        spark,
        {
            "config": {"mindept": 15},
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"command": {"command": "SELECT id FROM input WHERE dept > ${mindept}"}}
            ],
        },
        {"people": people},
    )
    assert sorted(r.id for r in out.collect()) == [2, 4]


def test_output_branch_keeps_main_lineage(spark, people):
    p = Pipeline(
        {
            "extractor": {"table": {"name": "people"}},
            "transformers": [
                {"filter": {"condition": "dept = 10", "output": "eng_only"}},
                {"field": {"fieldName": "tag", "value": "main"}},
            ],
            "loader": {"memory": {"view": "res"}},
        },
        spark=spark,
    )
    p.register_table("people", people)
    res = p.run()
    # side branch captured the filtered set; main lineage kept all rows
    assert res.outputs["eng_only"].count() == 2
    assert res.outputs["res"].count() == 4


def test_let_block_and_variable(spark, people):
    out = run_mem(
        spark,
        {
            "begin": [{"let": {"name": "cut", "expression": "5 + 5"}}],
            "extractor": {"table": {"name": "people"}},
            "transformers": [{"filter": {"condition": "dept > $cut"}}],
        },
        {"people": people},
    )
    assert sorted(r.id for r in out.collect()) == [2, 4]


def test_quality_and_curate_config_transformers(spark):
    """The curation family as config citizens: gopher flags append/filter,
    c4 rewrites text, curate runs the whole composition from JSON."""
    from orientdb_etl_spark import Pipeline

    good = "This is a perfectly normal sentence for the tiny corpus."
    rows = [
        (0, good + "\nif (x) { bad(); }"),
        (1, good + "\nif (x) { bad(); }"),
        (2, "#### #### #### #### spam"),
    ]
    src = spark.createDataFrame(rows, "doc_id long, text string")

    p = Pipeline(
        {
            "extractor": {"table": {"name": "docs"}},
            "transformers": [
                {"quality": {"method": "c4", "minWords": 1,
                             "requireTerminalPunct": False}},
                {"quality": {"method": "gopher", "filter": True}},
                {"quality": {"method": "ngram", "ns": [2]}},
            ],
        },
        spark=spark,
    )
    p.register_table("docs", src)
    out = p.compile().collect()
    ids = sorted(r.doc_id for r in out)
    assert ids == [0, 1]  # spam dropped by gopher, brace line cleaned by c4
    row0 = next(r for r in out if r.doc_id == 0)
    assert row0.text == good and row0.n_kept == 1
    assert row0.q_passes in (True, False) and "rep2" in row0.asDict()

    p2 = Pipeline(
        {
            "extractor": {"table": {"name": "docs"}},
            "transformers": [
                {"curate": {"textField": "text", "idField": "doc_id",
                            "minWords": 1, "requireTerminalPunct": False,
                            "nearDupThreshold": None}},
            ],
        },
        spark=spark,
    )
    p2.register_table("docs", src)
    out2 = {r.doc_id for r in p2.compile().collect()}
    assert out2 == {0}  # dup collapsed to min id, spam filtered


def test_sampling_packing_decontam_profile_config_transformers(spark):
    """The remaining training-data families as config citizens: split +
    stratified sampling, packing, decontamination against a registered
    eval table, and profiling — all from JSON config."""
    from orientdb_etl_spark import Pipeline

    rows = [(i, f"src{i % 2}", f"doc number {i} with shared tokens") for i in range(20)]
    src = spark.createDataFrame(rows, "doc_id long, source string, text string")
    ev = spark.createDataFrame(
        [(0, "doc number 3 with shared tokens")], "eid long, text string"
    )

    p = Pipeline(
        {
            "extractor": {"table": {"name": "docs"}},
            "transformers": [
                {"sample": {"method": "split", "idField": "doc_id",
                            "weights": {"train": 0.8, "val": 0.2}}},
                {"sample": {"method": "stratified", "groupField": "source",
                            "idField": "doc_id", "nPerGroup": 5}},
                {"field": {"fieldName": "n_tokens",
                           "expression": "size(split(text, ' '))"}},
                {"pack": {"method": "greedy", "capacity": 12}},
            ],
        },
        spark=spark,
    )
    p.register_table("docs", src)
    out = p.compile()
    rows_out = out.collect()
    assert len(rows_out) == 10  # 5 per source
    # pack returns the packing assignment (its contract projects to it)
    assert {"pack_id", "pack_tokens", "doc_id"} <= set(out.columns)
    assert all(r.pack_tokens <= 12 for r in rows_out)

    p2 = Pipeline(
        {
            "extractor": {"table": {"name": "docs"}},
            "transformers": [
                {"decontaminate": {"evalTable": "eval_docs", "n": 6,
                                   "mode": "filter"}},
                {"profile": {"method": "heavyHitters", "keyField": "source",
                             "k": 5}},
            ],
        },
        spark=spark,
    )
    p2.register_table("docs", src)
    p2.register_table("eval_docs", ev)
    prof = {r.key: r.n for r in p2.compile().collect()}
    # doc 3 ("doc number 3 with shared tokens", 6 tokens) is contaminated
    # and filtered before profiling: src1 loses one of its ten
    assert prof == {"src0": 10, "src1": 9}


def test_similarity_config_methods(spark):
    """All five ANN methods drivable from config; brute is the recall
    reference for the approximate ones on a clustered toy set."""
    import numpy as np

    from orientdb_etl_spark import Pipeline

    rng = np.random.RandomState(5)
    base = rng.standard_normal((8, 16))
    vecs = [(i, (base[i % 8] + rng.standard_normal(16) * 0.05).tolist())
            for i in range(80)]
    src = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = vecs[0][1]

    results = {}
    for method, extra in [
        ("brute", {}), ("lsh", {"hamming": 2}),
        ("ivf", {"nlist": 8, "nprobe": 4}), ("pairwise", {"k": 3}),
        ("jl", {"dim": 16, "outDim": 8, "expand": 4}),
    ]:
        p = Pipeline(
            {
                "extractor": {"table": {"name": "emb"}},
                "transformers": [
                    {"similarity": {"method": method, "vecField": "embedding",
                                    "idField": "vec_id",
                                    **({} if method == "pairwise" else {"query": q}),
                                    **extra}},
                ],
            },
            spark=spark,
        )
        p.register_table("emb", src)
        results[method] = p.compile().collect()
    exact = {r.vec_id for r in results["brute"]}
    assert len(exact) == 10
    assert len({r.vec_id for r in results["lsh"]} & exact) >= 5
    assert len({r.vec_id for r in results["ivf"]} & exact) >= 5
    assert len({r.vec_id for r in results["jl"]} & exact) >= 5
    assert len(results["pairwise"]) == 80 * 3  # 3 neighbors per vector


def test_weighted_temperature_html_config_transformers(spark):
    """Round-5 additions as config citizens: weighted sampling,
    temperature mixture, and HTML extraction from JSON config."""
    from orientdb_etl_spark import Pipeline

    rows = [
        (i, "big" if i < 160 else "small",
         f"<p>doc &amp; {i}</p><script>x</script>", float(10 + i % 5))
        for i in range(200)
    ]
    src = spark.createDataFrame(rows, "doc_id long, source string, html string, w double")

    p = Pipeline(
        {
            "extractor": {"table": {"name": "docs"}},
            "transformers": [
                {"htmlExtract": {"htmlField": "html", "outField": "text"}},
                {"sample": {"method": "temperature", "groupField": "source",
                            "idField": "doc_id", "alpha": 0.5}},
                {"sample": {"method": "weighted", "idField": "doc_id",
                            "weightField": "w", "k": 15}},
            ],
        },
        spark=spark,
    )
    p.register_table("docs", src)
    got = p.compile().collect()
    assert len(got) == 15
    # html extracted: tags and script gone, entity decoded
    assert all(r.text == f"doc & {r.doc_id}" for r in got)
    # temperature stage kept all of 'small' (rate 1e6) and thinned 'big'
    kept_small = sum(1 for r in got if r.source == "small")
    assert kept_small > 0


# ---------------------------------------------------------------------------
# round-5 config transformers: analyze / cluster / shard / twap /
# islands / concurrency / linkPredict


def test_analyze_transformer_dispatch(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0), ("c", 9.0)],
        "g string, v double",
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "t"}},
            "transformers": [
                {"analyze": {"method": "kruskal", "groupField": "g",
                             "valueField": "v"}}
            ],
        },
        tables={"t": df},
    )
    assert out.collect()[0].k == 3

    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "t"}},
            "transformers": [
                {"analyze": {"method": "diversity", "groupField": "g",
                             "categoryField": "v"}}
            ],
        },
        tables={"t": df},
    )
    assert out.count() == 3

    with pytest.raises(ValueError, match="unknown analyze method"):
        run_mem(
            spark,
            {
                "extractor": {"table": {"name": "t"}},
                "transformers": [{"analyze": {"method": "nope"}}],
            },
            tables={"t": df},
        )


def test_cluster_and_shard_transformers(spark):
    emb = spark.createDataFrame(
        [(i, [float(i % 2 * 10), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "e"}},
            "transformers": [
                {"cluster": {"vecField": "embedding", "idField": "vec_id",
                             "k": 2, "rounds": 2, "stats": True}}
            ],
        },
        tables={"e": emb},
    )
    rows = out.collect()
    assert sum(r.n for r in rows) == 20

    keys = spark.createDataFrame([(i,) for i in range(50)], "k long")
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "k"}},
            "transformers": [{"shard": {"keyField": "k", "shards": 4}}],
        },
        tables={"k": keys},
    )
    shards = {r.shard for r in out.collect()}
    assert shards <= {0, 1, 2, 3} and len(shards) > 1


def test_twap_islands_concurrency_linkpredict_transformers(spark):
    ev = spark.createDataFrame(
        [(1, 0, 10.0, 1), (1, 100, 20.0, 2), (1, 200, 30.0, 3)],
        "k long, t long, v double, id long",
    ).withColumn("t", F.col("t").cast("timestamp"))
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "ev"}},
            "transformers": [
                {"twap": {"keyField": "k", "tsField": "t",
                          "valueField": "v", "idField": "id"}}
            ],
        },
        tables={"ev": ev},
    )
    assert out.collect()[0].twap == 15.0

    keys = spark.createDataFrame([(1,), (2,), (5,)], "k long")
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "kk"}},
            "transformers": [{"islands": {"keyField": "k"}}],
        },
        tables={"kk": keys},
    )
    assert [tuple(r) for r in out.collect()] == [(1, 2, 2), (5, 5, 1)]

    iv = spark.createDataFrame([(0, 10), (5, 15)], "s long, e long")
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "iv"}},
            "transformers": [
                {"concurrency": {"startField": "s", "endField": "e",
                                 "topK": 1}}
            ],
        },
        tables={"iv": iv},
    )
    assert out.collect()[0].concurrency == 2

    b = spark.createDataFrame(
        [("b1", "x"), ("b1", "y"), ("b2", "x"), ("b2", "y")],
        "b string, i string",
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "b"}},
            "transformers": [
                {"linkPredict": {"basketField": "b", "itemField": "i",
                                 "minCommon": 2}}
            ],
        },
        tables={"b": b},
    )
    assert out.collect()[0].n_common == 2


def test_analyze_series_and_resolve_transformers(spark):
    ev = spark.createDataFrame(
        [("x", f"2024-01-01 00:{m:02d}:00") for m in (0, 3, 6)]
        + [("y", f"2024-01-01 00:{m:02d}:00") for m in (2, 5, 8)],
        "lab string, ts string",
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "ev"}},
            "transformers": [
                {"analyze": {"method": "crossCorrelation", "tsField": "ts",
                             "labelField": "lab", "labelX": "x",
                             "labelY": "y", "maxLag": 2,
                             "bucketSeconds": 60}}
            ],
        },
        tables={"ev": ev},
    )
    rows = {r.lag: r.xcorr for r in out.collect()}
    assert max(rows, key=rows.get) == 2

    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "ev"}},
            "transformers": [
                {"analyze": {"method": "changepoint", "tsField": "ts",
                             "bucketSeconds": 60}}
            ],
        },
        tables={"ev": ev},
    )
    assert out.collect()[0].n_buckets == 9

    roster = spark.createDataFrame(
        [(1, "aaa", "x"), (2, "aab", "x"), (3, "zzz", "q")],
        "id bigint, nm string, city string",
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "r"}},
            "transformers": [
                {"resolve": {"idField": "id", "blockField": "nm",
                             "fields": ["city"],
                             "rules": {"first_nm": ["earliest", "nm"]},
                             "window": 2, "orderField": "id"}}
            ],
        },
        tables={"r": roster},
    )
    got = {r.entity_id: r.n_records for r in out.collect()}
    assert got == {1: 2, 3: 1}


def test_analyze_anova_levene_mk_and_ohlc_rankeval_transformers(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 3.0), ("b", 5.0)],
        "g string, v double",
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "t"}},
            "transformers": [
                {"analyze": {"method": "anova", "groupField": "g",
                             "valueField": "v"}}
            ],
        },
        tables={"t": df},
    )
    assert out.collect()[0].f_stat == 2.0

    ev = spark.createDataFrame(
        [("2024-01-01 00:%02d:00" % m,) for m in (0, 1, 2)], "ts string"
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "e"}},
            "transformers": [
                {"analyze": {"method": "mannKendall", "tsField": "ts",
                             "bucketSeconds": 60}}
            ],
        },
        tables={"e": ev},
    )
    assert out.collect()[0].s_stat == 0  # flat 1/1/1 series

    ticks = spark.createDataFrame(
        [("k", "2024-01-01 00:00:01", 5.0, 1),
         ("k", "2024-01-01 00:30:00", 9.0, 2)],
        "k string, ts string, v double, id long",
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "x"}},
            "transformers": [
                {"ohlc": {"keyField": "k", "tsField": "ts",
                          "valueField": "v", "idField": "id"}}
            ],
        },
        tables={"x": ticks},
    )
    r = out.collect()[0]
    assert (r.open, r.close, r.n_ticks) == (5.0, 9.0, 2)

    ranked = spark.createDataFrame(
        [("q", 0.9, 1, 1), ("q", 0.8, 0, 2)],
        "q string, s double, y int, id long",
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "r"}},
            "transformers": [
                {"rankEval": {"queryField": "q", "scoreField": "s",
                              "labelField": "y", "idField": "id"}}
            ],
        },
        tables={"r": ranked},
    )
    assert out.collect()[0].mrr == 1.0


def test_round5_completion_wave_transformers(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox. it runs!"), (2, "lazy dog naps")],
        "id bigint, txt string",
    )
    snips = spark.createDataFrame(
        [(10, "quick brown"), (11, "dog naps")], "sid bigint, s string"
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "snips"}},
            "transformers": [
                {"containmentJoin": {"idField": "sid", "textField": "s",
                                     "rightTable": "docs",
                                     "rightIdField": "id",
                                     "rightTextField": "txt",
                                     "threshold": 1.0}}
            ],
        },
        tables={"snips": snips, "docs": docs},
    )
    assert {(r.left_id, r.right_id) for r in out.collect()} == {
        (10, 1), (11, 2)
    }

    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "docs"}},
            "transformers": [
                {"phraseSearch": {"idField": "id", "textField": "txt",
                                  "phrase": "quick brown fox."}}
            ],
        },
        tables={"docs": docs},
    )
    assert [(r.id, r.n_hits) for r in out.collect()] == [(1, 1)]

    pairs = spark.createDataFrame(
        [(1, "martha", "marhta")], "id int, a string, b string"
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "p"}},
            "transformers": [{"jwScore": {"fieldA": "a", "fieldB": "b"}}],
        },
        tables={"p": pairs},
    )
    assert abs(out.collect()[0].jw - 0.9611111111111111) < 1e-12

    kv = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 2), (2, 3)], "k int, v int"
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "kv"}},
            "transformers": [
                {"fdAudit": {"candidates": [["k", "v"]]}}
            ],
        },
        tables={"kv": kv},
    )
    r = out.collect()[0]
    assert r.n_violating == 1 and r.g3 == 0.25

    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "docs"}},
            "transformers": [
                {"readability": {"textField": "txt", "outField": "rd"}}
            ],
        },
        tables={"docs": docs},
    )
    got = {r.id: r.rd for r in out.collect()}
    assert got[1].n_sentences == 2 and got[2].n_sentences == 1


def test_drift_report_transformer(spark):
    ref = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id int, v double")
    cur = spark.createDataFrame([(3, 5.0), (4, None)], "id int, v double")
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "cur"}},
            "transformers": [
                {"driftReport": {"refTable": "ref", "columns": ["v"]}}
            ],
        },
        tables={"cur": cur, "ref": ref},
    )
    r = out.collect()[0]
    assert r.null_rate_delta == 0.5 and r.range_changed


def test_mmr_transformer(spark):
    cands = spark.createDataFrame(
        [(1, 0.9, [1.0, 0.0]), (2, 0.89, [1.0, 0.001]),
         (3, 0.5, [0.0, 1.0])],
        "id long, score double, vec array<double>",
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "c"}},
            "transformers": [
                {"mmr": {"idField": "id", "scoreField": "score",
                         "vecField": "vec", "k": 2, "lambda": 0.5}}
            ],
        },
        tables={"c": cands},
    )
    assert [(r.mmr_rank, r.id) for r in out.orderBy("mmr_rank").collect()] \
        == [(1, 1), (2, 3)]  # near-dup id=2 displaced by diverse id=3


def test_shared_spans_transformer(spark):
    quote = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [
            (1, quote + " " + " ".join(f"a{i}" for i in range(15))),
            (2, " ".join(f"b{i}" for i in range(15)) + " " + quote),
            (3, " ".join(f"c{i}" for i in range(30))),
        ],
        "id bigint, txt string",
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "docs"}},
            "transformers": [
                {"sharedSpans": {"idField": "id", "textField": "txt",
                                 "window": 8}}
            ],
        },
        tables={"docs": docs},
    )
    assert {(r.id_a, r.id_b, r.shared_windows) for r in out.collect()} == {
        (1, 2, 3)
    }


def test_strip_spans_transformer(spark):
    span = "w0 w1 w2 w3 w4 w5 w6 w7"
    docs = spark.createDataFrame(
        [(1, span + " keepme"), (2, "intro " + span)],
        "id bigint, txt string",
    )
    out = run_mem(
        spark,
        {
            "extractor": {"table": {"name": "docs"}},
            "transformers": [
                {"stripSpans": {"idField": "id", "textField": "txt"}}
            ],
        },
        tables={"docs": docs},
    )
    got = {r.id: (r.txt, r.removed_tokens) for r in out.collect()}
    assert got == {1: (span + " keepme", 0), 2: ("intro", 8)}


def test_soft_dedup_and_unimax_config_wiring(spark):
    """Round-8 mlops config surface: dedup method=soft and sample
    method=unimax drive the new functions from JSON config."""
    from orientdb_etl_spark import Pipeline

    rows = [(i, f"l{i % 3}", f"text {i % 4}", 50 + i) for i in range(12)]
    src = spark.createDataFrame(rows, "doc_id long, lang string, text string, n long")

    out = (
        Pipeline(
            {
                "extractor": {"table": {"name": "docs"}},
                "transformers": [
                    {"dedup": {"method": "soft", "textField": "text",
                               "idField": "doc_id", "alpha": 1.0}},
                ],
                "loader": {"memory": {"view": "w"}},
            },
            spark=spark,
        )
        .register_table("docs", src)
        .run()
        .outputs["w"]
    )
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == 12 and got[0].dup_count == 3
    assert abs(got[0].weight - 1 / 3) < 1e-6

    mix = (
        Pipeline(
            {
                "extractor": {"table": {"name": "docs"}},
                "transformers": [
                    {"sample": {"method": "unimax", "groupField": "lang",
                                "tokenField": "n", "budget": 300,
                                "maxEpochs": 2.0}},
                ],
                "loader": {"memory": {"view": "m"}},
            },
            spark=spark,
        )
        .register_table("docs", src)
        .run()
        .outputs["m"]
    )
    per = {r.lang: r for r in mix.collect()}
    assert set(per) == {"l0", "l1", "l2"}
    assert abs(sum(r.quota for r in per.values()) - 300) < 1e-3
    assert all(r.epochs <= 2.0 + 1e-9 for r in per.values())
