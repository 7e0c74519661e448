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


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    m_bits: int = 1 << 23,
    k: int = 5,
) -> DataFrame:
    """Equi-join with a Bloom semi-join reduction on the big side: build
    a Bloom bitmap of the SMALL side's join keys, broadcast the bitmap
    (m_bits/8 bytes REGARDLESS of key count), drop big-side rows that
    cannot match BEFORE the shuffle, then run the exact join on the
    survivors.

    The result is EXACTLY the plain join: Bloom filters have no false
    negatives (every matching row survives the prefilter), and false
    positives are eliminated by the join itself — which is what makes
    this oracle-checkable against the unfiltered join.

    When to use: the small side's distinct-key table is too large to
    broadcast as a hash map (so Spark would pick a shuffle join moving
    BOTH sides), but the match rate on the big side is low — the classic
    fact⋈filtered-dim at 100 TB. The bitmap stays broadcast-sized at any
    key count (fp rate ≈ (1-e^{-kN/m})^k); only the surviving fraction of
    the big side enters the shuffle. This is the manual form of Spark's
    runtime row-group Bloom filtering, usable where the optimizer's
    version doesn't reach (non-parquet sources, streaming foreachBatch,
    multi-column keys).

    Restricted to inner/semi joins: an outer join needs the NON-matching
    rows too, so a prefilter would change the result.
    """
    import numpy as np
    import pandas as pd

    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/semi joins, got {how!r} "
            "(outer joins need the non-matching rows the prefilter drops)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    spark = big.sparkSession

    gh = F.xxhash64(*[F.col(c) for c in keys])
    pos_cols = [F.pmod(F.xxhash64(F.lit(i), gh), F.lit(m_bits)) for i in range(k)]

    from orientdb_etl_spark.functions.decontam import pack_bloom_positions

    small_gh = small.select(F.xxhash64(*[F.col(c) for c in keys]).alias("_gh"))
    pos = small_gh.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.lit(i), F.col("_gh")), F.lit(m_bits))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    bits = pack_bloom_positions(pos, m_bits)
    bc = spark.sparkContext.broadcast(bits)

    def _might_contain(*cols):
        b = bc.value
        ok = np.ones(len(cols[0]), dtype=bool)
        for c in cols:
            idx = c.to_numpy(dtype=np.int64)
            ok &= (b[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 == 1
        return pd.Series(ok)

    might_contain = F.pandas_udf(_might_contain, "boolean")
    survivors = big.filter(might_contain(*pos_cols))
    return survivors.join(small, keys, how)


@register("bloomJoin")
def bloom_join_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"bloomJoin": {"table": "dim", "on": ["key"],
    "how": "inner", "mBits": 8388608, "k": 5}} — the pipeline frame is
    the big side, the registered table the small side."""
    return bloom_prefilter_join(
        df,
        ctx.tables[cfg["table"]],
        cfg["on"],
        how=str(cfg.get("how", "inner")),
        m_bits=int(cfg.get("mBits", 1 << 23)),
        k=int(cfg.get("k", 5)),
    )
