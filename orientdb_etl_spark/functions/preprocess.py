"""Numeric feature preparation: imputation and standardization.

The cleaning stage between profiling (which FINDS the nulls/outliers —
column_profile, mad_outliers) and modeling: fill what can be filled,
scale what needs scaling. Both operators are scalar-attach shaped — one
grouped (or global) aggregation whose tiny result broadcasts back onto
the stream, then a pure projection. No window, no global sort; at
100 TB swap exact percentile for percentile_approx in median mode and
the shape is unchanged.

(The reference has no numeric prep at all — its `field` transformer can
set constants per row but computes no corpus statistics; SURVEY §2.3.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grouped_attach(df: DataFrame, by: str | None, aggs: list) -> DataFrame:
    if by is not None:
        stats = df.groupBy(by).agg(*aggs)
        return df.join(F.broadcast(stats), by)
    return df.join(F.broadcast(df.agg(*aggs)))


def impute(
    df: DataFrame,
    cols: list[str],
    strategy: str = "mean",
    by: str | None = None,
) -> DataFrame:
    """Fill NULLs in ``cols`` with the column's mean / exact median /
    constant — globally or per ``by`` group (group-wise fill is the
    honest default when domains differ: a global mean smears sources
    together). ``strategy`` is ``"mean"``, ``"median"``, or any numeric
    constant. A group whose statistic is itself NULL (all values null)
    leaves its rows null rather than inventing data."""
    if strategy == "mean":
        aggs = [F.avg(c).alias(f"__fill_{c}") for c in cols]
    elif strategy == "median":
        aggs = [
            F.expr(f"percentile({c}, 0.5)").alias(f"__fill_{c}") for c in cols
        ]
    elif isinstance(strategy, (int, float)):
        out = df
        for c in cols:
            out = out.withColumn(
                c, F.coalesce(F.col(c), F.lit(float(strategy)))
            )
        return out
    else:
        raise ValueError(
            f"strategy must be 'mean', 'median', or a number, got {strategy!r}"
        )
    joined = _grouped_attach(df, by, aggs)
    for c in cols:
        joined = joined.withColumn(
            c, F.coalesce(F.col(c).cast("double"), F.col(f"__fill_{c}"))
        )
    return joined.drop(*[f"__fill_{c}" for c in cols])


def standardize(
    df: DataFrame,
    cols: list[str],
    by: str | None = None,
    suffix: str = "_z",
    round_to: int | None = 6,
) -> DataFrame:
    """Z-score standardization: (x - mean) / stddev_samp per column,
    globally or per group, appended as ``<col><suffix>``. Zero-variance
    groups yield NULL scores (a constant has no z-score; dividing by ~0
    would manufacture infinities). NULL inputs stay NULL."""
    aggs = []
    for c in cols:
        aggs += [
            F.avg(c).alias(f"__mu_{c}"),
            F.stddev_samp(c).alias(f"__sd_{c}"),
        ]
    joined = _grouped_attach(df, by, aggs)
    for c in cols:
        z = (F.col(c) - F.col(f"__mu_{c}")) / F.col(f"__sd_{c}")
        z = F.when(F.col(f"__sd_{c}") > 0, z)
        joined = joined.withColumn(
            c + suffix, F.round(z, round_to) if round_to is not None else z
        )
    return joined.drop(
        *[f"__mu_{c}" for c in cols], *[f"__sd_{c}" for c in cols]
    )


def quantile_map(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ref_group,
    n_q: int = 100,
    out_col: str = "mapped",
    round_to: int = 6,
) -> DataFrame:
    """Distribution mapping (quantile normalization): replace every
    value with the REFERENCE group's empirical quantile at the value's
    within-group percent rank — after mapping, every group follows the
    reference group's distribution. The cross-group bias-correction
    step (microarray quantile normalization, climate-model quantile
    mapping) for "instrument A reads systematically hotter than B".

    Mechanics: within-group ``percent_rank`` (a keyed window), the
    reference group's curve discretized onto ``n_q + 1`` equal-rank
    buckets (per-bucket max, forward-filled — the type-1 / lower
    empirical quantile), each row's bucket looked up in that curve.
    Adds ``out_col``; NULL values pass through as NULL.

    Scale shape: one keyed window per group (no global sort); the
    reference curve is ``n_q + 1`` rows BY CONSTRUCTION — broadcast to
    every executor regardless of data size; its forward-fill window
    runs over those rows only. Rank→bucket arithmetic is the identical
    float expression in both engines (same doubles, same floor), which
    is what the oracle twin relies on.
    """
    if n_q < 1:
        raise ValueError(f"n_q must be >= 1, got {n_q}")
    w = Window.partitionBy("_g").orderBy("_v")
    base = df.select(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v"), "*"
    )
    # rank ONLY non-null rows: engines disagree on where NULLs sort
    # (Spark NULLS FIRST, DuckDB NULLS LAST), and a null must not shift
    # real values' percent ranks anyway
    nn = base.where(F.col("_v").isNotNull()).withColumn(
        "_b", F.floor(F.percent_rank().over(w) * n_q).cast("int")
    )
    nl = base.where(F.col("_v").isNull()).withColumn(
        "_b", F.lit(None).cast("int")
    )
    ranked = nn.unionByName(nl)
    curve = (
        ranked.where((F.col("_g") == ref_group) & F.col("_v").isNotNull())
        .groupBy("_b")
        .agg(F.max("_v").alias("_q"))
    )
    grid = df.sparkSession.range(0, n_q + 1).select(F.col("id").cast("int").alias("_b"))
    wg = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    dense = (
        grid.join(curve, "_b", "left")
        # tiny frame: n_q + 1 rows — the global window is bounded by
        # construction, and the forward fill is the type-1 quantile
        .withColumn("_q", F.last("_q", ignorenulls=True).over(wg))
    )
    return (
        ranked.join(F.broadcast(dense), "_b", "left")
        .withColumn(out_col, F.round(F.col("_q"), round_to))
        .drop("_b", "_q", "_g", "_v")
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    method: str = "smoothed",
    smoothing: float = 20.0,
    out_col: str = "encoded",
    round_to: int = 6,
) -> DataFrame:
    """Target (mean) encoding of a categorical column — the
    high-cardinality-categorical workhorse (Micci-Barreca, SIGKDD
    Explorations 2001). Adds ``out_col``:

    * ``smoothed`` — ``(sum_c + m·prior) / (n_c + m)``: the category
      mean shrunk toward the global prior by pseudo-count ``m``
      (``smoothing``); rare categories land near the prior instead of
      memorizing noise.
    * ``loo`` — leave-one-out: ``(sum_c − y_i) / (n_c − 1)``, the
      train-time variant that excludes each row's OWN target so the
      encoding never leaks the row's label into its feature; singleton
      categories (n_c = 1) yield NULL (no peers to learn from).

    Rows with NULL category or target keep a NULL encoding and do not
    contribute to any category's statistics.

    Scale shape: one map-side-combinable (sum, count) per category plus
    a scalar prior; the category frame joins back on the category key
    (AQE decides broadcast vs shuffle — a web-scale vocabulary is not
    reliably broadcastable). LOO needs no second pass: the subtraction
    uses the row's own target against the category totals.
    """
    if method not in ("smoothed", "loo"):
        raise ValueError(f"method must be smoothed|loo, got {method!r}")
    c, y = F.col(cat_col), F.col(target_col).cast("double")
    valid = c.isNotNull() & y.isNotNull()
    stats = (
        df.where(valid)
        .groupBy(c.alias("_cat"))
        .agg(F.sum(y).alias("_sum"), F.count(F.lit(1)).alias("_n"))
    )
    prior = df.where(valid).agg(F.avg(y).alias("_prior"))
    joined = (
        df.join(stats, c == F.col("_cat"), "left")
        .crossJoin(F.broadcast(prior))
    )
    if method == "smoothed":
        m = float(smoothing)
        enc = (F.col("_sum") + F.lit(m) * F.col("_prior")) / (
            F.col("_n") + F.lit(m)
        )
    else:
        enc = F.when(
            F.col("_n") > 1, (F.col("_sum") - y) / (F.col("_n") - 1)
        )
    return (
        joined.withColumn(
            out_col, F.round(F.when(valid, enc), round_to)
        )
        .drop("_cat", "_sum", "_n", "_prior")
    )
