from __future__ import annotations

from pyspark.sql import functions as F

from orientdb_etl_spark.functions.profiling import (
    column_profile,
    heavy_hitters,
    ngram_topk,
)


def test_column_profile_exact(spark, people):
    prof = {r.column: r for r in column_profile(people, exact=True).collect()}
    assert set(prof) == {"id", "name", "dept", "salary"}
    assert all(r.n_rows == 4 for r in prof.values())
    assert prof["name"].n_null == 1 and prof["salary"].n_null == 1
    assert prof["dept"].n_distinct == 3
    assert prof["id"].min_value == "1" and prof["id"].max_value == "4"
    # native-type ordering, not lexicographic: 9 < 10 numerically
    nums = spark.createDataFrame([(9,), (10,)], "v int")
    row = column_profile(nums).collect()[0]
    assert (row.min_value, row.max_value) == ("9", "10")


def test_column_profile_single_job(spark, people):
    # the whole profile is ONE aggregation pass: no per-column scans
    plan = column_profile(people)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_heavy_hitters_share_and_order(spark):
    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 6 + ["b"] * 3 + ["c"] * 1], "k string"
    )
    rows = heavy_hitters(df, "k", k=2).collect()
    assert [(r.key, r.n) for r in rows] == [("a", 6), ("b", 3)]
    assert abs(rows[0].share - 0.6) < 1e-9


def test_ngram_topk_document_frequency(spark):
    df = spark.createDataFrame(
        [
            (1, "x y x y x y"),  # repeated gram counts ONCE for this doc
            (2, "x y z"),
            (3, "z q"),
        ],
        "doc_id long, text string",
    )
    rows = ngram_topk(df, "text", n=2, k=3).collect()
    top = {r.gram: r.doc_freq for r in rows}
    assert top["x y"] == 2  # doc frequency, not term frequency
    assert top["y x"] == 1


def test_incremental_dedup_filter_and_flag(spark):
    from orientdb_etl_spark.functions.dedup import incremental_dedup

    seen = spark.createDataFrame([(1, "Hello, World!")], "doc_id long, text string")
    new = spark.createDataFrame(
        [
            (2, "hello   world"),  # canonical-equal to seen doc 1
            (3, "fresh content"),
        ],
        "doc_id long, text string",
    )
    kept = incremental_dedup(new, seen).collect()
    assert [r.doc_id for r in kept] == [3]
    flagged = {
        r.doc_id: r.seen_before
        for r in incremental_dedup(new, seen, mode="flag").collect()
    }
    assert flagged == {2: True, 3: False}


def test_embedding_centroids_exact_mean(spark):
    from orientdb_etl_spark.functions.similarity import embedding_centroids

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0]),
            (0, [3.0, 6.0]),
            (1, [5.0, 5.0]),
        ],
        "label int, embedding array<float>",
    )
    rows = {r.label: r for r in embedding_centroids(df, "embedding", "label").collect()}
    assert rows[0].n_vecs == 2 and rows[0].centroid == [2.0, 4.0]
    assert rows[1].centroid == [5.0, 5.0]
    # deterministic under different partitioning
    again = {
        r.label: r.centroid
        for r in embedding_centroids(
            df.repartition(3), "embedding", "label"
        ).collect()
    }
    assert again == {k: r.centroid for k, r in rows.items()}


def test_approx_distinct_certificate(spark):
    from orientdb_etl_spark.functions.profiling import approx_distinct_certificate

    df = spark.createDataFrame(
        [(i, i % 7, "x" * (i % 3)) for i in range(500)],
        "a long, b long, c string",
    )
    rows = {r.column: r for r in approx_distinct_certificate(df, ["a", "b", "c"]).collect()}
    assert rows["a"].n_exact == 500 and rows["a"].within_tol
    assert rows["b"].n_exact == 7 and rows["b"].within_tol
    assert rows["c"].n_exact == 3 and rows["c"].within_tol
