"""Skew-aware join helpers.

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by default
in this engine's session) handles most skew at runtime by splitting
oversized partitions. These helpers cover the cases AQE cannot: a hot key
so dominant that even split partitions hammer one reducer, and pre-AQE
deterministic plans (e.g. streaming foreachBatch joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.context import PipelineContext
from orientdb_etl_spark.operators import register


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the fact side's hot keys spread over ``salt`` reducers.

    The fact row gets a random salt in [0, salt); the dim side is exploded
    into ``salt`` replicas so every (key, salt) pair finds its match. Skewed
    key K's rows now land on ``salt`` reducers instead of one. Cost: dim
    shuffle volume × salt — use for large-dim joins where broadcast is
    impossible and one key dominates; broadcast remains the first choice
    for small dims.
    """
    dim_key = dim_key or fact_key
    fact_s = fact.withColumn(
        "_salt", F.floor(F.rand(seed) * salt).cast("int")
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {salt - 1})"))
    )
    cond = (fact_s[fact_key] == dim_s[dim_key]) & (fact_s["_salt"] == dim_s["_salt"])
    return fact_s.join(dim_s, cond, how).drop("_salt")


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Key-frequency profile — the planning input for choosing between
    broadcast / AQE / explicit salting."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc())
        .limit(n)
    )


@register("salted_join")
def salted_join_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"salted_join": {"with": "dim", "on": "k",
    "dimKey": "k2", "salt": 16, "how": "left"}}."""
    other_name = cfg["with"]
    other = ctx.outputs.get(other_name) or ctx.tables.get(other_name)
    if other is None:
        other = ctx.spark.table(other_name)
    return salted_join(
        df,
        other,
        cfg["on"],
        cfg.get("dimKey"),
        int(cfg.get("salt", 8)),
        cfg.get("how", "inner"),
    )
