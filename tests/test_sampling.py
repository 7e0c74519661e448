"""Deterministic sampling/splitting/shuffling (training-data builds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orientdb_etl_spark.functions.sampling import (
    deterministic_shuffle,
    hash_bucket,
    hash_split,
    mixture_sample,
)


def test_hash_split_stable_under_growth(spark):
    small = spark.range(500).withColumnRenamed("id", "doc_id")
    big = spark.range(2000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s_small = {r.doc_id: r.split for r in hash_split(small, "doc_id", w).collect()}
    s_big = {r.doc_id: r.split for r in hash_split(big, "doc_id", w).collect()}
    # assignments of existing ids never change as the dataset grows
    assert all(s_big[k] == v for k, v in s_small.items())
    # proportions roughly honored
    from collections import Counter

    c = Counter(s_big.values())
    assert 0.7 < c["train"] / 2000 < 0.9
    assert set(c) == {"train", "val", "test"}


def test_mixture_sample_rates_and_determinism(spark):
    df = spark.range(4000).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, "click").otherwise("view").alias("event_type"),
    )
    out1 = mixture_sample(df, "event_type", "event_id", {"click": 0.5, "view": 0.1})
    out2 = mixture_sample(df, "event_type", "event_id", {"click": 0.5, "view": 0.1})
    got1 = sorted(r.event_id for r in out1.collect())
    assert got1 == sorted(r.event_id for r in out2.collect())  # deterministic
    counts = {r.event_type: r.n for r in out1.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert 0.4 < counts["click"] / 2000 < 0.6
    assert 0.05 < counts["view"] / 2000 < 0.16


def test_deterministic_shuffle_reproducible_and_permutes(spark):
    df = spark.range(300).withColumnRenamed("id", "doc_id")
    o1 = [r.doc_id for r in deterministic_shuffle(df, "doc_id").collect()]
    o2 = [r.doc_id for r in deterministic_shuffle(df, "doc_id").collect()]
    assert o1 == o2 and sorted(o1) == list(range(300)) and o1 != list(range(300))
    # different seed → different order
    o3 = [r.doc_id for r in deterministic_shuffle(df, "doc_id", seed=7).collect()]
    assert o3 != o1


def test_hash_bucket_uniformish(spark):
    df = spark.range(10000).select(hash_bucket("id", 10).alias("b"))
    counts = [r.n for r in df.groupBy("b").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 10 and min(counts) > 600  # no collapsed buckets


def test_stratified_sample_exact_n_and_determinism(spark):
    from orientdb_etl_spark.functions.sampling import stratified_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("grp"),
    )
    a = stratified_sample(df, "grp", "doc_id", 10)
    b = stratified_sample(df, "grp", "doc_id", 10)
    rows_a = sorted((r.grp, r.doc_id) for r in a.collect())
    assert rows_a == sorted((r.grp, r.doc_id) for r in b.collect())
    from collections import Counter

    c = Counter(g for g, _ in rows_a)
    assert c == {"0": 10, "1": 10, "2": 10}
    # groups smaller than n are kept whole
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, grp string")
    assert stratified_sample(tiny, "grp", "doc_id", 10).count() == 2


def test_token_budget_sample_prefix_and_crossing_doc(spark):
    from orientdb_etl_spark.functions.sampling import hash_bucket, token_budget_sample

    df = spark.createDataFrame(
        [(i, "a" if i < 6 else "b", 10) for i in range(12)],
        "id long, grp string, toks long",
    )
    out = token_budget_sample(df, "grp", "id", "toks", {"a": 25}, default_budget=None)
    got_a = {r.id for r in out.filter("grp = 'a'").collect()}
    # expected: hash-ordered prefix of group a while prev-cum < 25 ->
    # 3 docs (10+10 < 25, third crosses and is kept; fourth is not)
    order = sorted(
        range(6),
        key=lambda i: (
            ((i + 42) % 1_000_003) * 2654435761 % 2_000_000_011, i
        ),
    )
    assert got_a == set(order[:3])
    # group b has no budget and default None -> passes through whole
    assert out.filter("grp = 'b'").count() == 6
    # deterministic under different partitioning
    again = {r.id for r in token_budget_sample(
        df.repartition(5), "grp", "id", "toks", {"a": 25}, default_budget=None
    ).filter("grp = 'a'").collect()}
    assert again == got_a


def test_quantile_bucket_exact_boundaries(spark):
    from orientdb_etl_spark.functions.sampling import quantile_bucket

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, score double"
    )
    out = quantile_bucket(df, "score", k=4)
    got = {r.id: r.score_bucket for r in out.collect()}
    # boundaries at exact quantiles 24.75/49.5/74.25; ties-to-lower
    assert got[0] == 0 and got[24] == 0
    assert got[25] == 1 and got[49] == 1
    assert got[50] == 2 and got[74] == 2
    assert got[75] == 3 and got[99] == 3
    # every bucket is (near-)equal mass
    from collections import Counter

    sizes = Counter(got.values())
    assert set(sizes) == {0, 1, 2, 3} and max(sizes.values()) - min(sizes.values()) <= 1

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        quantile_bucket(df, "score", k=1)


def test_quantile_bucket_no_global_sort_window(spark):
    """The bucketing must be scalar-attach shaped: no Window, no global
    Sort over the table (the ntile anti-pattern)."""
    from orientdb_etl_spark.functions.sampling import quantile_bucket

    df = spark.range(1000).selectExpr("id", "id % 37 AS score")
    plan = quantile_bucket(df, "score", k=3)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row boundary attach


def test_quantile_bucket_null_scores_get_null_bucket(spark):
    from orientdb_etl_spark.functions.sampling import quantile_bucket

    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0), (4, None)],
        "id long, score double",
    )
    got = {r.id: r.score_bucket for r in quantile_bucket(df, "score", k=2).collect()}
    # unscored rows must NOT flood the head bucket — they belong to no quantile
    assert got[4] is None
    assert all(got[i] is not None for i in range(4))
