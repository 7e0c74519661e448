from __future__ import annotations

import random

import pytest

from orientdb_etl_spark.operators.relational import abc_classes, exclusive_prefix


def test_exclusive_prefix_sum_matches_serial(spark):
    rng = random.Random(3)
    rows = [(i, rng.randint(1, 100)) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r.k: r.pre for r in
           exclusive_prefix(df, ["k"], "v", "sum", "pre", "bigint",
                            partitions=5).collect()}
    acc = 0
    for k, v in sorted(rows):
        assert got[k] == (acc if acc else got[k]) if acc == 0 else True
        if acc == 0:
            assert got[k] in (None, 0)  # first row: empty prefix
        else:
            assert got[k] == acc
        acc += v


def test_exclusive_prefix_partition_invariant(spark):
    rows = [(i, i % 7 + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, v long")
    a = {r.k: r.pre for r in
         exclusive_prefix(df, ["k"], "v", "sum", "pre", "bigint",
                          partitions=2).collect()}
    b = {r.k: r.pre for r in
         exclusive_prefix(df.repartition(11), ["k"], "v", "sum", "pre",
                          "bigint", partitions=9).collect()}
    assert a == b


def test_exclusive_prefix_rejects_bad_agg(spark):
    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(ValueError, match="agg must be"):
        exclusive_prefix(df, ["k"], "v", "avg", "pre", "double")


def test_abc_classes_shares_and_boundaries(spark):
    # values 50, 30, 15, 5 -> cumulative shares .5, .8, .95, 1.0
    rows = [(1, 50.0), (2, 30.0), (3, 15.0), (4, 5.0)]
    df = spark.createDataFrame(rows, "k long, v double")
    out = {r.k: r for r in abc_classes(df, ["k"], "v").collect()}
    assert out[1].abc_class == "A" and out[1].cum_share == pytest.approx(0.5)
    assert out[2].abc_class == "A" and out[2].cum_share == pytest.approx(0.8)
    assert out[3].abc_class == "B" and out[3].cum_share == pytest.approx(0.95)
    assert out[4].abc_class == "C" and out[4].cum_share == pytest.approx(1.0)


def test_abc_classes_aggregates_and_tiebreaks(spark):
    # two rows per key sum; equal sums ordered by key -> deterministic
    rows = [(1, 10.0), (1, 10.0), (2, 20.0), (3, 20.0)]
    df = spark.createDataFrame(rows, "k long, v double")
    out = sorted((r.k, r.value, r.cum_share) for r in
                 abc_classes(df, ["k"], "v").collect())
    assert out[0] == (1, 20.0, pytest.approx(1 / 3))
    assert out[1] == (2, 20.0, pytest.approx(2 / 3))
    assert out[2] == (3, 20.0, pytest.approx(1.0))


def test_abc_rejects_bad_thresholds(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="thresholds"):
        abc_classes(df, ["k"], "v", thresholds=(0.9, 0.5))


def test_abc_transformer(spark):
    from orientdb_etl_spark import Pipeline

    df = spark.createDataFrame(
        [(1, 80.0), (2, 15.0), (3, 5.0)], "k long, v double"
    )
    p = Pipeline(
        {
            "extractor": {"table": {"name": "t"}},
            "transformers": [{"abc": {"keys": ["k"], "valueField": "v"}}],
            "loader": {"memory": {"view": "res"}},
        },
        spark=spark,
    ).register_table("t", df)
    got = {r.k: r.abc_class for r in p.run().outputs["res"].collect()}
    assert got == {1: "A", 2: "B", 3: "C"}
