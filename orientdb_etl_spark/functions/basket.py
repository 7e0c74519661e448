"""Market-basket co-occurrence: frequent item pairs with
support / confidence / lift (association rules at the pair level).

The warehouse classic (Agrawal & Srikant, VLDB'94 — Apriori): which
items co-occur in the same basket more often than chance? This module
computes the pair level exactly — the level virtually all production
deployments stop at — rather than unbounded itemset mining, because the
pair level is expressible as ONE self-join and replays verbatim in a SQL
oracle.

Scale shape (the quadratic hazard is per-basket pair fan-out, s·(s-1)/2
pairs for a basket of size s):

* **Frequent-item prefilter (lossless).** Apriori monotonicity: every
  item of a pair with count >= min_pair_count itself has count >=
  min_pair_count. Items below the floor are dropped BEFORE pairing via a
  broadcast semi-join, so rare-item-heavy baskets shrink before the
  quadratic step. This is exactly the "candidate generation uses only
  frequent 1-itemsets" rule of Apriori, applied relationally.
* **Basket-size cap (explicit, not silent).** A degenerate basket of
  10^5 items would emit 5·10^9 pairs; ``max_basket_size`` drops baskets
  above the cap (count-per-basket is one map-side-combinable
  aggregation). Dropping, not sampling, keeps the result deterministic;
  the cap is OFF by default so the oracle-replayed shape is exact.
* The pair join shuffles on the basket key — one exchange, co-located
  with the per-basket dedup's. Item counts broadcast back onto the
  (much smaller) pair frame.

Reference scope: the reference ETL (OETLProcessor.java:252-283) has no
analytics surface; this extends SURVEY §2.8 the same way stats.py does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.context import PipelineContext
from orientdb_etl_spark.operators import register

__all__ = ["frequent_pairs", "item_similarity"]


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_size: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Exact pair-level association rules over (basket, item) rows.

    Returns one row per unordered co-occurring pair with
    ``item_a < item_b``: ``(item_a, item_b, pair_n, n_a, n_b, support,
    confidence_ab, lift)`` where support = pair_n / n_baskets,
    confidence_ab = P(b | a) = pair_n / n_a, and
    lift = support / (P(a)·P(b)). Only pairs with
    ``pair_n >= min_pair_count`` are kept; metrics are rounded to
    ``round_to`` decimals with explicit portable arithmetic so a SQL
    oracle reproduces them bit-for-bit.
    """
    b, i = F.col(basket_col), F.col(item_col)
    baskets = df.select(b.alias("basket"), i.alias("item")).where(
        b.isNotNull() & i.isNotNull()
    ).distinct()

    if max_basket_size is not None:
        sized = baskets.groupBy("basket").agg(F.count(F.lit(1)).alias("_sz"))
        keep = sized.filter(F.col("_sz") <= int(max_basket_size)).select("basket")
        baskets = baskets.join(F.broadcast(keep), "basket", "left_semi")

    n_baskets = baskets.select("basket").distinct().count()
    if n_baskets == 0:
        raise ValueError("no non-null baskets to mine")

    item_n = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    # Apriori prefilter: an item appearing in < min_pair_count baskets
    # cannot participate in any surviving pair (monotonicity) — lossless
    frequent = item_n.filter(F.col("n") >= int(min_pair_count))
    pruned = baskets.join(
        F.broadcast(frequent.select("item")), "item", "left_semi"
    )

    a = pruned.select(F.col("basket"), F.col("item").alias("item_a"))
    c = pruned.select(F.col("basket"), F.col("item").alias("item_b"))
    pairs = (
        a.join(c, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= int(min_pair_count))
    )

    na = frequent.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))
    nb = frequent.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))
    out = pairs.join(F.broadcast(na), "item_a").join(F.broadcast(nb), "item_b")
    nb_lit = F.lit(float(n_baskets))
    return out.select(
        "item_a",
        "item_b",
        "pair_n",
        "n_a",
        "n_b",
        F.round(F.col("pair_n") / nb_lit, round_to).alias("support"),
        F.round(F.col("pair_n") / F.col("n_a"), round_to).alias("confidence_ab"),
        F.round(
            (F.col("pair_n") * nb_lit) / (F.col("n_a") * F.col("n_b")), round_to
        ).alias("lift"),
    )


@register("frequentPairs")
def frequent_pairs_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"frequentPairs": {"basketField": "o_orderkey",
    "itemField": "p_brand", "minPairCount": 2, "maxBasketSize": 1000}}."""
    return frequent_pairs(
        df,
        basket_col=cfg["basketField"],
        item_col=cfg["itemField"],
        min_pair_count=int(cfg.get("minPairCount", 2)),
        max_basket_size=(
            int(cfg["maxBasketSize"]) if "maxBasketSize" in cfg else None
        ),
        round_to=int(cfg.get("round", 6)),
    )


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 5,
    min_pair_count: int = 2,
    max_basket_size: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Item-to-item collaborative filtering (Linden, Smith & York —
    IEEE Internet Computing 2003, the Amazon "customers who bought
    this" algorithm): cosine similarity over basket co-occurrence,
    ``sim(i, j) = c_ij / sqrt(c_i · c_j)``, keeping each item's top-k
    neighbors. Returns ``(item, neighbor, pair_n, cosine)`` — both
    directions of every kept pair, ranked per item by
    ``(cosine desc, neighbor asc)``.

    Scale shape: the pair build IS :func:`frequent_pairs`'s (one
    basket-key exchange under the lossless Apriori prefilter and the
    explicit basket-size cap); symmetrization doubles the (tiny) pair
    frame, not the basket stream; per-item top-k compiles to the
    partial WindowGroupLimit prune. The cosine denominator uses the
    SAME basket-level item counts the pair frame already carries — no
    extra scan.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    pairs = frequent_pairs(
        df,
        basket_col,
        item_col,
        min_pair_count=min_pair_count,
        max_basket_size=max_basket_size,
    ).select("item_a", "item_b", "pair_n", "n_a", "n_b")
    sym = pairs.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("neighbor"),
        "pair_n",
        F.col("n_a").alias("_ni"),
        F.col("n_b").alias("_nj"),
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("neighbor"),
            "pair_n",
            F.col("n_b").alias("_ni"),
            F.col("n_a").alias("_nj"),
        )
    )
    cos = F.col("pair_n") / F.sqrt(F.col("_ni") * F.col("_nj"))
    from pyspark.sql import Window

    w = Window.partitionBy("item").orderBy(
        cos.desc(), F.col("neighbor").asc()
    )
    return (
        sym.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(top_k))
        .select(
            "item",
            "neighbor",
            "pair_n",
            F.round(cos, round_to).alias("cosine"),
        )
        .orderBy("item", F.col("cosine").desc(), "neighbor")
    )
