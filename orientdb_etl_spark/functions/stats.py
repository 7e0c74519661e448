"""Inferential statistics and distribution-drift checks.

The decision layer on top of :mod:`profiling`: once a pipeline computes
per-snapshot profiles, these operators answer "did the distribution
move?" (PSI, KS), "is the difference real?" (Welch t-test), "what is the
trend?" (per-group OLS), and "how concentrated is it?" (Gini) — the
checks a 100 TB curation pipeline runs between snapshots before
promoting a new corpus build.

Scale shape: every operator is one or two declarative aggregation passes
(map-side partial aggregation, one shuffle) or a single windowed pass
over an already-aggregated tiny frame. No UDFs, no collects; arithmetic
is written in explicit portable SQL so the DuckDB oracle replays it
verbatim (the working convention from :mod:`layout` — one generator, two
engines).

Reference scope note: the reference ETL (OETLProcessor.java:252-283) has
no statistics surface; this extends §2.8 analytics the same way
profiling.py does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "welch_ttest",
    "group_trend",
    "psi",
    "ks_2sample",
    "gini",
]

#: Smoothing floor for PSI bucket proportions — empty buckets would make
#: ln(p/q) blow up; the conventional floor (e.g. SAS/credit-scoring
#: practice) is a small epsilon on the proportion itself.
PSI_EPS = 1e-6


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance t-test between two groups, in ONE
    aggregation pass (conditional aggregates — no second scan, no join).

    Returns one row: ``n_a, n_b, mean_a, mean_b, t_stat, welch_df,
    significant`` where ``welch_df`` is the Welch–Satterthwaite degrees
    of freedom and ``significant`` flags |t| > 1.96 (the z approximation
    — fine at pipeline sample sizes; exact t-CDF would need SciPy, which
    neither engine ships).

    Scale shape: conditional ``avg``/``var_samp``/``count`` fold into a
    single partial-aggregate pass; the result is a scalar row.
    """
    a = F.col(group_col) == group_a
    b = F.col(group_col) == group_b
    v = F.col(value_col)
    agg = df.agg(
        F.count(F.when(a, v)).alias("n_a"),
        F.count(F.when(b, v)).alias("n_b"),
        F.avg(F.when(a, v)).alias("mean_a"),
        F.avg(F.when(b, v)).alias("mean_b"),
        F.var_samp(F.when(a, v)).alias("_va"),
        F.var_samp(F.when(b, v)).alias("_vb"),
    )
    se2 = F.col("_va") / F.col("n_a") + F.col("_vb") / F.col("n_b")
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2)
    # Welch–Satterthwaite: (va/na + vb/nb)^2 / ((va/na)^2/(na-1) + ...)
    wdf = (se2 * se2) / (
        (F.col("_va") / F.col("n_a")) ** 2 / (F.col("n_a") - 1)
        + (F.col("_vb") / F.col("n_b")) ** 2 / (F.col("n_b") - 1)
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(wdf, 2).alias("welch_df"),
        (F.abs(t) > 1.96).alias("significant"),
    )


def group_trend(
    df: DataFrame,
    keys: list[str],
    x_col,
    y_col: str,
    min_n: int = 3,
) -> DataFrame:
    """Per-group OLS line fit (slope / intercept / r²) via closed-form
    moment aggregates — the "is this metric drifting per segment?" pass.

    ``x_col`` may be a Column (e.g. an epoch-seconds cast of a
    timestamp). Uses ``covar_samp`` / ``var_samp`` (numerically stable
    single-pass aggregates in both Spark and DuckDB) rather than raw
    Σxy − ΣxΣy/n, which cancels catastrophically on epoch-scale x.
    Groups with fewer than ``min_n`` points or zero x-variance are
    dropped (a line through <3 points is noise, and a vertical fit is
    undefined).

    Scale shape: one hash-aggregate shuffle on the group keys; four
    moment aggregates per group, all with map-side partials.
    """
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col)
    g = df.groupBy(*keys).agg(
        F.count(F.when(x.isNotNull() & y.isNotNull(), 1)).alias("n"),
        F.covar_samp(x, y).alias("_cov"),
        F.var_samp(x).alias("_vx"),
        F.var_samp(y).alias("_vy"),
        F.avg(x).alias("_mx"),
        F.avg(y).alias("_my"),
    )
    slope = F.col("_cov") / F.col("_vx")
    return (
        g.filter((F.col("n") >= min_n) & (F.col("_vx") > 0))
        .select(
            *keys,
            "n",
            F.round(slope, 6).alias("slope"),
            F.round(F.col("_my") - slope * F.col("_mx"), 6).alias("intercept"),
            F.round(
                F.when(
                    F.col("_vy") > 0,
                    (F.col("_cov") * F.col("_cov")) / (F.col("_vx") * F.col("_vy")),
                ).otherwise(F.lit(None)),
                6,
            ).alias("r2"),
        )
    )


def _psi_bucket(value_col: str, bins: int) -> tuple[F.Column, F.Column, F.Column]:
    """(mn, mx, bucket) scalar-attach expressions shared with
    :func:`psi`; the bucket arithmetic mirrors :func:`profiling.histogram`
    exactly (explicit floor arithmetic — no engine width_bucket
    internals) with out-of-reference-range current values CLAMPED into
    the end buckets via greatest/least."""
    v = F.col(value_col).cast("double")
    mn, mx = F.col("_mn"), F.col("_mx")
    raw = F.floor((v - mn) / (mx - mn) * bins) + 1
    bucket = F.when(mn == mx, F.lit(1)).otherwise(
        F.greatest(F.least(raw.cast("int"), F.lit(bins)), F.lit(1))
    )
    return mn, mx, bucket


def psi(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of ``value_col`` — the standard drift gate (PSI < 0.1 stable,
    0.1–0.25 moderate, > 0.25 action).

    Buckets are equi-width from the REFERENCE min/max (current values
    outside the reference range clamp into the end buckets — they are
    drift, not errors). Per-bucket proportions are floored at
    :data:`PSI_EPS` so empty buckets contribute a large-but-finite term.
    Output: one row per occupied bucket with ``(bucket, p_ref, p_cur,
    psi_term)`` plus the grand ``psi_total`` repeated on every row (a
    window sum over the tiny aggregated frame).

    Scale shape: one scalar aggregate over ref (min/max, broadcast
    back), one hash-aggregate per snapshot on the bucket id (``bins``
    groups — trivially small shuffle), one window over ≤ ``bins`` rows.
    """
    stats = ref.agg(
        F.min(F.col(value_col).cast("double")).alias("_mn"),
        F.max(F.col(value_col).cast("double")).alias("_mx"),
        F.count(value_col).alias("_n_ref"),
    )
    n_cur = cur.agg(F.count(value_col).alias("_n_cur"))

    def _bucketed(df: DataFrame, out: str) -> DataFrame:
        *_, bucket = _psi_bucket(value_col, bins)
        return (
            df.filter(F.col(value_col).isNotNull())
            .join(F.broadcast(stats.select("_mn", "_mx")))
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    r = _bucketed(ref, "n_ref")
    c = _bucketed(cur, "n_cur")
    joined = (
        r.join(c, "bucket", "full_outer")
        .join(F.broadcast(stats.select("_n_ref")))
        .join(F.broadcast(n_cur))
        .select(
            "bucket",
            (
                F.greatest(
                    F.coalesce(F.col("n_ref"), F.lit(0)) / F.col("_n_ref"),
                    F.lit(PSI_EPS),
                )
            ).alias("p_ref"),
            (
                F.greatest(
                    F.coalesce(F.col("n_cur"), F.lit(0)) / F.col("_n_cur"),
                    F.lit(PSI_EPS),
                )
            ).alias("p_cur"),
        )
    )
    term = (F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref"))
    w = Window.partitionBy()
    return joined.select(
        "bucket",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round(term, 6).alias("psi_term"),
        F.round(F.sum(term).over(w), 6).alias("psi_total"),
    )


def ks_2sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic D = sup |F_a − F_b|,
    computed relationally: aggregate per distinct value (ties collapse),
    running cumulative counts per side, max absolute ECDF gap. Returns
    one row ``(n_a, n_b, d_stat, d_crit, significant)`` with the 5%
    critical value 1.358·√((n_a+n_b)/(n_a·n_b)).

    Scale shape: hash-aggregate on value (one shuffle), then a single
    ordered window over the distinct-value frame — far smaller than the
    input whenever values repeat; a final scalar max. The unpartitioned
    window is over the aggregated frame only.
    """
    a = F.col(group_col) == group_a
    b = F.col(group_col) == group_b
    per_v = (
        df.filter((a | b) & F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("_v"))
        .agg(
            F.count(F.when(a, 1)).alias("_ca"),
            F.count(F.when(b, 1)).alias("_cb"),
        )
    )
    totals = per_v.agg(F.sum("_ca").alias("n_a"), F.sum("_cb").alias("n_b"))
    w = Window.partitionBy().orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        F.sum("_ca").over(w).alias("_fa"),
        F.sum("_cb").over(w).alias("_fb"),
    )
    tot = (
        cum.join(F.broadcast(totals))
        .groupBy("n_a", "n_b")
        .agg(
            F.max(
                F.abs(F.col("_fa") / F.col("n_a") - F.col("_fb") / F.col("n_b"))
            ).alias("_d")
        )
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n_a") + F.col("n_b")) / (F.col("n_a") * F.col("n_b"))
    )
    return tot.select(
        "n_a",
        "n_b",
        F.round("_d", 6).alias("d_stat"),
        F.round(crit, 6).alias("d_crit"),
        (F.col("_d") > crit).alias("significant"),
    )


def gini(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-group Gini concentration of a non-negative value:
    G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n over the ascending-sorted values
    (rank formula; order among tied values does not affect the sum).

    The "how concentrated is spend / traffic / token mass?" diagnostic —
    e.g. Gini of per-domain document counts tells you whether the crawl
    mix is dominated by a handful of hosts before you apply
    :func:`webcure.domain_cap`.

    Scale shape: one keyed exchange; a rank window and the aggregate
    reuse the SAME partitioning (single shuffle total). Groups with
    Σx = 0 return NULL.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(value_col))
    ranked = df.filter(F.col(value_col).isNotNull()).select(
        *keys,
        F.col(value_col).alias("_x"),
        F.row_number().over(w).alias("_i"),
    )
    g = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_i") * F.col("_x")).alias("_six"),
    )
    val = (F.lit(2.0) * F.col("_six")) / (F.col("n") * F.col("_sx")) - (
        F.col("n") + 1
    ) / F.col("n")
    return g.select(
        *keys,
        "n",
        F.round(
            F.when(F.col("_sx") != 0, val).otherwise(F.lit(None)), 6
        ).alias("gini"),
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Shannon entropy of two categorical columns and their mutual
    information (nats): one row ``(n, h_a, h_b, h_ab, mi)`` with
    ``mi = H(A) + H(B) - H(A,B)`` — the dependence audit behind feature
    selection and leakage checks ("does this column secretly encode the
    label?"). Rows with a NULL on either side are excluded (they belong
    to no cell).

    Plan shape: ONE grouped count over (a, b); both marginals re-aggregate
    that (tiny) joint frame, so the input is scanned once. Entropies use
    the ``H = ln(n) - Σ c·ln(c) / n`` identity — one aggregate per
    frame, no per-row probability column. All arithmetic is explicit
    and portable; results round to ``round_to``.
    """
    d = df.select(F.col(col_a).alias("_a"), F.col(col_b).alias("_b")).where(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    )
    joint = d.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_c"))
    clogc = F.sum(F.expr("_c * ln(_c * 1.0)"))
    jn = joint.agg(
        F.sum("_c").alias("_n"), clogc.alias("_jcl")
    )
    ma = joint.groupBy("_a").agg(F.sum("_c").alias("_c")).agg(clogc.alias("_acl"))
    mb = joint.groupBy("_b").agg(F.sum("_c").alias("_c")).agg(clogc.alias("_bcl"))
    out = jn.crossJoin(F.broadcast(ma)).crossJoin(F.broadcast(mb))
    h = lambda cl: F.expr(f"ln(_n * 1.0) - {cl} / _n")  # noqa: E731
    return out.select(
        F.col("_n").alias("n"),
        F.round(h("_acl"), round_to).alias("h_a"),
        F.round(h("_bcl"), round_to).alias("h_b"),
        F.round(h("_jcl"), round_to).alias("h_ab"),
        F.round(h("_acl") + h("_bcl") - h("_jcl"), round_to).alias("mi"),
    )
