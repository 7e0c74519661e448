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
    from orientdb_etl_spark.operators.relational import join_back_null_safe

    if by is not None:
        # NULL-SAFE attach: a NULL group is its own class under groupBy;
        # plain on=by would silently drop its rows from the output
        stats = df.groupBy(by).agg(*aggs)
        return join_back_null_safe(df, F.broadcast(stats), [by])
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


def woe_iv(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    smooth: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Weight-of-Evidence encoding + Information Value per category of
    ``feature_col`` against a binary ``label_col``: one row per category
    ``(feature, n, n_pos, n_neg, woe, iv_contrib, iv_total)`` with
    Laplace smoothing ``smooth`` added to each cell (the credit-scoring
    convention — keeps one-sided categories finite without dropping
    them). ``woe = ln(dist_pos / dist_neg)``, ``iv_contrib =
    (dist_pos - dist_neg) · woe``, ``iv_total`` repeated on every row
    (IV < 0.02 useless, > 0.5 suspicious — the standard screen).

    Scale shape: ONE grouped count over categories (the frame shrinks to
    |categories|), one broadcast scalar of the label totals, pure
    expressions after that. Integer counts keep every ratio a single
    deterministic double op; the iv_total fold runs over the tiny
    category frame.
    """
    f, y = F.col(feature_col), F.col(label_col).cast("int")
    cell = (
        df.where(f.isNotNull() & y.isNotNull())
        .select(f.alias("_f"), y.alias("_y"))
        .groupBy("_f")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("n_pos"),
        )
        .withColumn("n_neg", F.col("n") - F.col("n_pos"))
    )
    tot = cell.agg(
        F.sum("n_pos").alias("_tp"),
        F.sum("n_neg").alias("_tn"),
        F.count(F.lit(1)).alias("_k"),
    )
    t = cell.crossJoin(F.broadcast(tot))
    s = float(smooth)
    dp = (F.col("n_pos") + s) / (F.col("_tp") + s * F.col("_k"))
    dn = (F.col("n_neg") + s) / (F.col("_tn") + s * F.col("_k"))
    woe = F.log(dp / dn)
    scored = t.select(
        F.col("_f").alias(feature_col),
        "n",
        "n_pos",
        "n_neg",
        F.round(woe, round_to).alias("woe"),
        ((dp - dn) * woe).alias("_ivc"),
    )
    iv = scored.agg(F.sum("_ivc").alias("_iv"))
    return (
        scored.crossJoin(F.broadcast(iv))
        .select(
            feature_col,
            "n",
            "n_pos",
            "n_neg",
            "woe",
            F.round(F.col("_ivc"), round_to).alias("iv_contrib"),
            F.round(F.col("_iv"), round_to).alias("iv_total"),
        )
        .orderBy(feature_col)
    )


def best_split(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    checkpoint: bool = True,
) -> DataFrame:
    """Decision-stump split finder: the threshold ``v`` on
    ``feature_col`` minimizing the weighted Gini impurity of the
    ``x <= v`` / ``x > v`` partition against a binary label. One row:
    ``(split_value, n_left, n_right, gini_parent, gini_split, gain)``
    with the deterministic tie-break "smallest threshold".

    Scale shape: candidates collapse to per-distinct-value (count,
    positives) in ONE aggregation, both running sums come from the
    range-partitioned
    :func:`~orientdb_etl_spark.operators.relational.exclusive_prefix`
    (chained — never a global ORDER BY window over raw rows), and the
    winner is a TakeOrderedAndProject over the distinct-value frame.
    Integer counts make each candidate's impurity a fixed chain of
    double ops — exactly replayable in the SQL twin. The classic
    single-feature CART step, distributed.
    """
    from orientdb_etl_spark.operators.relational import exclusive_prefix

    d = df.select(
        F.col(feature_col).alias("_v"),
        F.col(label_col).cast("int").alias("_y"),
    ).where(F.col(feature_col).isNotNull() & F.col(label_col).isNotNull())
    per_v = d.groupBy("_v").agg(
        F.count(F.lit(1)).alias("_t"), F.sum("_y").alias("_p")
    )
    pv = exclusive_prefix(
        per_v, ["_v"], "_t", "sum", "_lt", "bigint", checkpoint=checkpoint
    )
    pv = exclusive_prefix(
        pv, ["_v"], "_p", "sum", "_lp", "bigint", checkpoint=checkpoint
    )
    tot = per_v.agg(
        F.sum("_t").alias("_n"), F.sum("_p").alias("_pos")
    )
    c = pv.crossJoin(F.broadcast(tot))
    nl = F.coalesce(F.col("_lt"), F.lit(0)) + F.col("_t")
    posl = F.coalesce(F.col("_lp"), F.lit(0)) + F.col("_p")
    negl = nl - posl
    nr = F.col("_n") - nl
    posr = F.col("_pos") - posl
    negr = nr - posr
    # weighted Gini: 2·(posl·negl/nl + posr·negr/nr)/n — integer
    # numerators, one division per side, deterministic in both engines
    imp = (
        2.0
        * (
            posl * negl / nl.cast("double")
            + posr * negr / nr.cast("double")
        )
        / F.col("_n")
    )
    gp = (
        2.0
        * (F.col("_pos") * (F.col("_n") - F.col("_pos")))
        / (F.col("_n").cast("double") * F.col("_n"))
    )
    cand = c.where(nr > 0).select(
        F.col("_v").alias("split_value"),
        nl.alias("n_left"),
        nr.alias("n_right"),
        F.round(gp, 6).alias("gini_parent"),
        F.round(imp, 6).alias("gini_split"),
        F.round(gp - imp, 6).alias("gain"),
        imp.alias("_raw_imp"),
    )
    return cand.orderBy("_raw_imp", "split_value").limit(1).drop("_raw_imp")


def feature_hash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dims: int = 64,
    signed: bool = True,
    seed: int = 11,
    portable: bool = False,
) -> DataFrame:
    """Feature hashing ("the hashing trick" — Weinberger et al.
    ICML'09): vectorize token text into a FIXED ``dims``-dimensional
    integer count vector without ever building a vocabulary — index =
    hash(token) mod dims, and (``signed``) a second hash bit contributes
    ±1 so colliding tokens cancel in expectation instead of piling up.
    The vectorizer of choice when the vocabulary is unbounded or the
    pipeline must be stateless (no fit step, no vocab broadcast, new
    tokens never break the schema).

    The production hash is ``xxhash64`` (JVM-side, fast);
    ``portable=True`` swaps in the base-31 codepoint polynomial mod the
    32-bit prime — the ``minhash_signatures_portable`` twin discipline —
    so the SQL oracle replays every vector bit-for-bit. Returns
    ``(id, features)`` with ``features`` an ``array<bigint>`` of length
    ``dims``.

    Scale shape: one explode + ONE hash aggregation on (doc, dim) + a
    per-doc map assembly (``map_from_entries`` over ≤ dims entries —
    bounded); no vocabulary state, no joins. The fixed output width is
    what makes the downstream matmul/ANN stages schema-stable at 100 TB.
    """
    if dims < 1:
        raise ValueError(f"dims must be >= 1, got {dims}")
    if portable:
        h = (
            f"(aggregate(sequence(1, length(_tok)), cast({seed} as bigint), "
            f"(acc, i) -> (acc * 31 + ascii(substring(_tok, i, 1))) "
            f"% 4294967291))"
        )
    else:
        h = f"abs(xxhash64(_tok, {seed}))"
    idx = f"CAST({h} % {dims} AS INT)"
    sign = (
        f"CASE WHEN CAST({h} DIV {dims} AS BIGINT) % 2 = 0 "
        "THEN 1 ELSE -1 END"
        if signed
        else "1"
    )
    toks = (
        df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
        )
        .where(F.col("_tok") != "")
    )
    per_dim = (
        toks.select("id", F.expr(idx).alias("_d"), F.expr(sign).alias("_s"))
        .groupBy("id", "_d")
        .agg(F.sum("_s").cast("bigint").alias("_w"))
    )
    assembled = per_dim.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_d"), F.col("_w")))
        ).alias("_m")
    )
    fill = F.expr(
        f"transform(sequence(0, {dims - 1}), "
        f"d -> coalesce(element_at(_m, d), CAST(0 AS BIGINT)))"
    )
    return assembled.select("id", fill.alias("features"))
