"""Salted-join correctness: identical results to the plain join under skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from orientdb_etl_spark import Pipeline
from orientdb_etl_spark.operators.skew import salted_join, top_keys


def _skewed(spark):
    # 900 rows on key 1, a few elsewhere — the hot-key shape
    hot = spark.range(900).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(10).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    return hot.union(cold)


def _dim(spark):
    return spark.range(20).select(
        (F.col("id") + 1).alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )


def test_salted_join_matches_plain_inner(spark):
    fact, dim = _skewed(spark), _dim(spark)
    plain = fact.join(dim, fact.k == dim.dk).select("k", "v", "name")
    salted = salted_join(fact, dim, "k", "dk", salt=4).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_keeps_misses(spark):
    fact = _skewed(spark).withColumn("k", F.col("k") + 100)  # no matches
    dim = _dim(spark)
    out = salted_join(fact, dim, "k", "dk", salt=4, how="left")
    assert out.count() == fact.count()
    assert out.filter(F.col("name").isNotNull()).count() == 0


def test_top_keys_profile(spark):
    prof = top_keys(_skewed(spark), "k", n=1).collect()
    assert prof[0].k == 1 and prof[0].n_rows == 900


def test_salted_join_config_form(spark):
    p = Pipeline(
        {
            "extractor": {"table": {"name": "fact"}},
            "transformers": [
                {"salted_join": {"with": "dim", "on": "k", "dimKey": "dk", "salt": 4}},
            ],
        },
        spark=spark,
    )
    p.register_table("fact", _skewed(spark))
    p.register_table("dim", _dim(spark))
    out = p.compile()
    assert out.count() == 900 + 10  # key 1 hits, and all cold keys 2..11 ∈ dim 1..20


def test_salted_join_shuffles_on_key_and_salt(spark):
    """The whole point: in the shuffled (non-broadcast) regime the
    exchange partitions on (key, _salt), not key alone — a hot key then
    spans `salt` reducers. Broadcast is disabled to pin the shuffle path
    (with a dim small enough to broadcast, salting is moot anyway)."""
    fact, dim = _skewed(spark), _dim(spark)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            salted_join(fact, dim, "k", "dk", salt=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert ex and all("_salt" in ln for ln in ex), ex


def test_aqe_skew_join_mitigation_fires(spark):
    """Evidence (not assertion-by-docstring) that AQE's skew-join
    mitigation engages on a deliberately skewed sort-merge join: with the
    skew thresholds lowered to fixture scale, the FINAL adaptive plan
    must mark the join skew=true. This is the built-in path; salted_join
    (operators/skew.py) remains the explicit fallback for engines/joins
    AQE cannot rewrite (e.g. pre-shuffle aggregation on the salted key)."""
    from pyspark.sql import functions as F

    confs = {
        # force a shuffled SMJ (no broadcast), make the hot partition
        # cross the skew threshold at fixture size
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # one hot key carrying ~95% of fact rows, with a fat payload so
        # the hot shuffle partition dwarfs the 64KB threshold
        # payload must be incompressible and must SURVIVE column pruning
        # into the shuffle (skew detection measures compressed shuffle
        # bytes) — sha2 per row, consumed after the join
        fact = spark.range(0, 60_000).select(
            F.when(F.col("id") < 57_000, 0)
            .otherwise(F.col("id") % 96 + 1)  # cold keys 1..96, disjoint from hot 0
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(0, 97).select(
            F.col("id").alias("k"), F.sha1(F.col("id").cast("string")).alias("d")
        )
        # NOTE: no same-key aggregation directly on the join output — AQE
        # (rightly) skips the skew split when the downstream plan requires
        # the join's hash partitioning, since splitting would re-shuffle.
        # That case is exactly what salted_join exists for.
        joined = fact.join(dim, "k").select("k", F.length("payload").alias("pl"))
        ks = [r.k for r in joined.collect()]
        assert len(ks) == 60_000 and sum(1 for k in ks if k == 0) == 57_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_prefilter_join_equals_plain_join(spark):
    """The prefilter must be result-invisible: no false negatives, and
    false positives die in the exact join."""
    from orientdb_etl_spark.operators.skew import bloom_prefilter_join

    big = spark.range(20_000).selectExpr("id AS k", "id * 2 AS v")
    small = spark.range(0, 20_000, 37).selectExpr(
        "id AS k", "concat('d', id) AS name"
    )
    got = bloom_prefilter_join(big, small, "k").orderBy("k").collect()
    want = big.join(small, "k").orderBy("k").collect()
    assert got == want
    assert len(got) == len(range(0, 20_000, 37))


def test_bloom_prefilter_join_narrow_bitmap_still_exact(spark):
    """A deliberately tiny bitmap (high fp rate) must still give the
    exact join result — only the prefilter's selectivity degrades."""
    from orientdb_etl_spark.operators.skew import bloom_prefilter_join

    big = spark.range(5_000).selectExpr("id AS k")
    small = spark.range(0, 5_000, 100).selectExpr("id AS k")
    got = sorted(r.k for r in bloom_prefilter_join(big, small, "k", m_bits=256, k=2).collect())
    assert got == list(range(0, 5_000, 100))


def test_bloom_prefilter_join_refuses_outer(spark):
    import pytest

    from orientdb_etl_spark.operators.skew import bloom_prefilter_join

    df = spark.range(10).selectExpr("id AS k")
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_prefilter_join(df, df, "k", how="left")


def test_bloom_prefilter_join_multi_column_key(spark):
    from orientdb_etl_spark.operators.skew import bloom_prefilter_join

    big = spark.range(1_000).selectExpr("id % 10 AS a", "id % 7 AS b", "id AS v")
    small = spark.createDataFrame([(3, 2), (5, 5)], "a long, b long")
    got = bloom_prefilter_join(big, small, ["a", "b"]).count()
    want = big.join(small, ["a", "b"]).count()
    assert got == want > 0


def test_bloom_join_config_transformer(spark):
    from orientdb_etl_spark import Pipeline

    big = spark.range(2_000).selectExpr("id AS k", "id AS v")
    dim = spark.range(0, 2_000, 50).selectExpr("id AS k")
    p = Pipeline(
        {
            "extractor": {"table": {"name": "fact"}},
            "transformers": [{"bloomJoin": {"table": "dim", "on": ["k"]}}],
        },
        spark=spark,
    )
    p.register_table("fact", big).register_table("dim", dim)
    assert p.compile().count() == 40
