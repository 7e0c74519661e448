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
