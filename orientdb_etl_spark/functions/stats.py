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
    "chi_square",
    "benford_digits",
    "mann_whitney_u",
    "acf",
    "theil_sen",
    "seasonal_anomaly",
    "kaplan_meier",
    "nelson_aalen",
    "diversity_metrics",
    "js_divergence",
    "spearman_corr",
    "kruskal_wallis",
    "cuped",
    "cross_correlation",
    "changepoint",
    "log_rank",
    "anova_oneway",
    "levene_bf",
    "mann_kendall",
    "max_drawdown",
    "proportion_ci",
    "seasonal_decompose",
    "mutual_information",
    "psi_from_counts",
    "forecast_backtest",
    "contribution_analysis",
    "srm_check",
    "diff_in_diff",
    "stratified_ate",
    "wasserstein_1d",
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
    # ONE population for every moment: covar_samp only sees complete
    # (x, y) pairs, so var/avg must too — otherwise asymmetric nulls mix
    # populations and skew slope/intercept (and r² can exceed 1)
    both = x.isNotNull() & y.isNotNull()
    xp, yp = F.when(both, x), F.when(both, y)
    g = df.groupBy(*keys).agg(
        F.count(F.when(both, 1)).alias("n"),
        F.covar_samp(xp, yp).alias("_cov"),
        F.var_samp(xp).alias("_vx"),
        F.var_samp(yp).alias("_vy"),
        F.avg(xp).alias("_mx"),
        F.avg(yp).alias("_my"),
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
    ).localCheckpoint(eager=True)  # 1 row; probed AND broadcast below
    s = stats.first()
    if s["_mn"] is not None and s["_mn"] == s["_mx"]:
        raise ValueError(
            f"psi: reference {value_col!r} is constant ({s['_mn']}); "
            "equi-width buckets are undefined and PSI would report 0 "
            "for ANY drift — fix the reference snapshot"
        )

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
    return psi_from_counts(r, c)


def psi_from_counts(r: DataFrame, c: DataFrame) -> DataFrame:
    """PSI from pre-bucketed counts — ``r`` is ``(bucket, n_ref)``,
    ``c`` is ``(bucket, n_cur)``, both bucketed against the SAME
    reference edges. The counts-based core of :func:`psi`, shared with
    the streaming drift monitor
    (:func:`~orientdb_etl_spark.streaming.ops.read_stream_drift`) whose
    current side exists only as per-epoch bucket counts. Identical
    output contract to :func:`psi`; count sums are integers, so a
    micro-batched accumulation equals the one-shot batch computation
    exactly."""
    nr = r.agg(F.sum("n_ref").alias("_n_ref"))
    nc = c.agg(F.sum("n_cur").alias("_n_cur"))
    joined = (
        r.join(c, "bucket", "full_outer")
        .join(F.broadcast(nr))
        .join(F.broadcast(nc))
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

    Scale shape: hash-aggregate on value (one shuffle); BOTH cumulative
    ECDF counts come from the range-partitioned exclusive prefix over
    the distinct-value frame — a continuous metric's distinct-value
    frame is input-sized, so a global ORDER BY window here would funnel
    it through one task (the mann_whitney midrank lesson); a final
    scalar max.
    """
    from orientdb_etl_spark.operators.relational import exclusive_prefix

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
    pre = exclusive_prefix(per_v, ["_v"], "_ca", "sum", "_pa", "bigint")
    pre = exclusive_prefix(pre, ["_v"], "_cb", "sum", "_pb", "bigint")
    cum = pre.select(
        (F.coalesce(F.col("_pa"), F.lit(0)) + F.col("_ca")).alias("_fa"),
        (F.coalesce(F.col("_pb"), F.lit(0)) + F.col("_cb")).alias("_fb"),
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


def chi_square(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V effect size — one row ``(n, r, s, dof,
    chi2, cramers_v)``. The inferential complement of
    :func:`mutual_information` (same joint-count frame, a test statistic
    instead of an information measure). NULL on either side excludes the
    row (it belongs to no cell).

    Uses the identity ``chi2 = n * (sum over observed cells of
    o^2 / (row_total * col_total)) - n`` which is EXACT including
    structurally-empty cells (an o=0 cell contributes 0 to the sum and
    exactly its expected count to the classical form — the identity
    absorbs both), so no dense r×s expected-count frame is ever built.

    Plan shape: ONE grouped count over (a, b); both marginals
    re-aggregate that tiny joint frame and broadcast back onto it —
    the input is scanned once, like :func:`mutual_information`.
    No p-value: neither engine ships a chi-square CDF; ``chi2`` and
    ``dof`` let the caller apply any critical-value table.
    """
    d = df.select(F.col(col_a).alias("_a"), F.col(col_b).alias("_b")).where(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    )
    joint = d.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_c"))
    ma = joint.groupBy("_a").agg(F.sum("_c").alias("_ra"))
    mb = joint.groupBy("_b").agg(F.sum("_c").alias("_cb"))
    cell = joint.join(F.broadcast(ma), "_a").join(F.broadcast(mb), "_b")
    agg = cell.agg(
        F.sum("_c").alias("_n"),
        # CAST, not a `* 1.0` literal: Spark parses 1.0 as DECIMAL and
        # decimal division would diverge from the oracle's double math
        F.sum(F.expr("(_c * _c) / (CAST(_ra AS DOUBLE) * _cb)")).alias("_q"),
        F.countDistinct("_a").alias("r"),
        F.countDistinct("_b").alias("s"),
    )
    # clamp: the identity is >= 0 analytically, but float residue can
    # leave n*q - n at ~-1e-13 and sqrt(negative) would NaN Cramér's V
    chi2 = F.greatest(F.col("_n") * F.col("_q") - F.col("_n"), F.lit(0.0))
    return agg.select(
        F.col("_n").alias("n"),
        "r",
        "s",
        ((F.col("r") - 1) * (F.col("s") - 1)).alias("dof"),
        F.round(chi2, round_to).alias("chi2"),
        # a 1×k table has dof 0: Cramér's V is undefined there (NULL),
        # not a divide-by-zero (ANSI mode would raise)
        F.round(
            F.when(
                F.least(F.col("r") - 1, F.col("s") - 1) > 0,
                F.sqrt(
                    chi2 / (F.col("_n") * F.least(F.col("r") - 1, F.col("s") - 1))
                ),
            ),
            round_to,
        ).alias("cramers_v"),
    )


def benford_digits(
    df: DataFrame,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic bulk-data plausibility audit (Nigrini's forensic-accounting
    test): naturally-occurring magnitudes follow
    ``P(d) = log10(1 + 1/d)``; fabricated or truncated data usually
    don't. Returns nine rows ``(digit, n_d, obs_p, exp_p, abs_dev)``
    with every digit 1..9 present (zero-count digits included).

    Only rows with ``floor(abs(value)) >= 1`` participate (Benford's law
    applies to MAGNITUDES — a ledger of debits tests the same as its
    credits): the first digit is
    then the leading character of the INTEGER part — pure integer/string
    arithmetic that replays bit-identically in any engine, avoiding the
    ``floor(v / 10^floor(log10(v)))`` float form whose log10 can wobble
    at exact powers of ten.

    Plan shape: one filtered grouped count (9 groups, map-side combine),
    right-joined onto a literal 9-row digit frame; the total broadcast
    back. Scalar output regardless of input size.
    """
    digit = F.substring(
        F.col("_iv").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.select(F.floor(F.abs(F.col(value_col))).alias("_iv"))
        .where(F.col("_iv") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_d"))
    )
    digits = df.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    dense = digits.join(counts, "digit", "left").select(
        "digit", F.coalesce("n_d", F.lit(0)).alias("n_d")
    )
    tot = dense.agg(F.sum("n_d").alias("_tot"))
    exp_p = F.expr("log10(1.0 + 1.0 / digit)")
    return (
        dense.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_d",
            F.round(F.col("n_d") / F.col("_tot"), round_to).alias("obs_p"),
            F.round(exp_p, round_to).alias("exp_p"),
            F.round(
                F.abs(F.col("n_d") / F.col("_tot") - exp_p), round_to
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
    checkpoint: bool = True,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test between two groups — the
    nonparametric complement of :func:`welch_ttest` (no normality
    assumption; detects any stochastic-dominance shift). One row:
    ``(n_a, n_b, u_a, z_stat, significant)`` with the normal
    approximation and the standard tie correction; ``significant``
    flags |z| > 1.96.

    Rank computation NEVER builds a global ORDER BY window over raw
    rows. The midrank identity — rank(v) = (# values < v) +
    (ties(v)+1)/2 — needs only per-distinct-value counts plus their
    running sum, so: ONE grouped count over distinct values (the frame
    shrinks to |distinct|), then :func:`~orientdb_etl_spark.operators.
    relational.exclusive_prefix` for the distributed running count
    (range partitioning, never an Exchange SinglePartition), then one
    scalar aggregate. Tie correction sum(t^3 - t) folds over the same
    frame. Counts are integers throughout — the prefix sum is exact;
    midranks are half-integers, exactly representable in doubles.
    """
    from orientdb_etl_spark.operators.relational import exclusive_prefix

    a = F.col(group_col) == group_a
    d = (
        df.where((a | (F.col(group_col) == group_b)) & F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("_v"), a.alias("_isa"))
    )
    per_v = d.groupBy("_v").agg(
        F.count(F.lit(1)).alias("_t"),
        F.sum(F.when(F.col("_isa"), 1).otherwise(0)).alias("_ca"),
    )
    # checkpoint=False keeps the plan inspectable for the plan audit
    # (localCheckpoint truncates explain output — the layout.py rule)
    pv = exclusive_prefix(
        per_v, ["_v"], "_t", "sum", "_lt", "bigint", checkpoint=checkpoint
    )
    agg = pv.agg(
        F.sum("_ca").alias("n_a"),
        F.sum(F.col("_t") - F.col("_ca")).alias("n_b"),
        F.sum(
            F.col("_ca")
            * (F.coalesce(F.col("_lt"), F.lit(0)) + (F.col("_t") + 1) / 2.0)
        ).alias("_ra"),
        F.sum(F.expr("_t * _t * _t - _t")).alias("_ties"),
    )
    n = F.col("n_a") + F.col("n_b")
    u_a = F.col("_ra") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    mu = F.col("n_a") * F.col("n_b") / 2.0
    sig2 = (
        F.col("n_a")
        * F.col("n_b")
        / 12.0
        * ((n + 1) - F.col("_ties") / (n * (n - 1)))
    )
    z = (u_a - mu) / F.sqrt(sig2)
    return agg.select(
        "n_a",
        "n_b",
        F.round(u_a, 1).alias("u_a"),
        F.round(z, round_to).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant"),
    )


def acf(
    df: DataFrame,
    ts_col: str,
    max_lag: int = 24,
    bucket_seconds: int = 3600,
    round_to: int = 6,
) -> DataFrame:
    """Autocorrelation function of the event-arrival series: bucket the
    timestamps (default hourly), zero-fill the gaps, and compute the
    sample ACF ``r_k = sum_t (x_t - m)(x_{t+k} - m) / sum_t (x_t - m)^2``
    for lags 1..max_lag — the seasonality/burstiness audit behind
    "is traffic hourly-periodic?" Returns ``(lag, n_pairs, acf)``.

    Scale shape: the raw frame collapses to per-bucket counts in ONE
    map-side-combinable aggregation; everything after operates on the
    series frame whose size is time-range / bucket — bounded by
    CONSTRUCTION, independent of row volume (a decade of hourly buckets
    is 87k rows). Gaps zero-fill via ``spark.range(min, max+1)`` (only
    two scalars ever reach the driver); the k-shifted products come from
    one self-join on ``t + k`` after a lag explode — shuffled on the
    bucket key, never a global ORDER BY window. Mean and denominator use
    the full zero-filled series (the standard biased estimator, which
    keeps |r_k| <= 1 and is what statsmodels/R compute).
    """
    spark = df.sparkSession
    b = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.floor(
                F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                / F.lit(bucket_seconds)
            ).alias("_t")
        )
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_x"))
    )
    # bucket-sized frame, re-scanned by the probe, the spine join, and
    # the downstream statistic: checkpoint so the raw input scans ONCE
    b = b.localCheckpoint()
    lo, hi = b.agg(F.min("_t"), F.max("_t")).first()
    if lo is None:
        raise ValueError(f"acf: no non-null timestamps in {ts_col!r}")
    series = (
        spark.range(int(lo), int(hi) + 1)
        .select(F.col("id").alias("_t"))
        .join(b, "_t", "left")
        .select("_t", F.coalesce("_x", F.lit(0)).cast("double").alias("_x"))
    )
    mom = series.agg(F.avg("_x").alias("_m"))
    # denominator: sum (x - m)^2 over the FULL series
    sm = series.crossJoin(F.broadcast(mom))
    den = sm.agg(F.sum(F.expr("(_x - _m) * (_x - _m)")).alias("_c0")).first()["_c0"]
    if not den:
        raise ValueError("acf: constant series has no autocorrelation")
    lags = spark.range(1, max_lag + 1).select(F.col("id").cast("int").alias("lag"))
    left = sm.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("_t") + F.col("lag")).alias("_t"), (F.col("_x") - F.col("_m")).alias("_dl")
    )
    right = sm.select("_t", (F.col("_x") - F.col("_m")).alias("_dr"))
    return (
        left.join(right, "_t")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(F.col("_dl") * F.col("_dr")) / F.lit(float(den)), round_to).alias(
                "acf"
            ),
        )
        .orderBy("lag")
    )


def theil_sen(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    max_group_size: int = 200,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Theil–Sen robust trend: the MEDIAN of all pairwise
    slopes ``(y_j - y_i) / (x_j - x_i)`` — up to ~29% outlier
    contamination leaves the estimate intact, where the OLS slope of
    :func:`group_trend` would be dragged arbitrarily. Returns
    ``(group, n_used, n_slopes, ts_slope)``.

    The quadratic hazard (s·(s-1)/2 pairs per group) is bounded by an
    EXPLICIT deterministic cap, the :func:`~orientdb_etl_spark.functions.
    basket.frequent_pairs` discipline: each group keeps its first
    ``max_group_size`` rows in (x, y) order (a per-GROUP window
    row_number — partitioned, never global), so a group contributes at
    most ``max_group_size^2 / 2`` slopes no matter how hot it is.
    Dropping deterministically, not sampling, keeps the oracle replay
    exact. The pair build is ONE self-equi-join on the group key; the
    median is two order statistics via a per-group slope window (exact
    lower/upper middle average — identical selection in any engine, no
    interpolating percentile built-in whose convention could differ).
    """
    rn = F.row_number().over(
        Window.partitionBy("_g").orderBy("_x", "_y")
    )
    base = (
        df.select(
            F.col(group_col).alias("_g"),
            F.col(x_col).cast("double").alias("_x"),
            F.col(y_col).cast("double").alias("_y"),
        )
        .where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .withColumn("_rn", rn)
        .where(F.col("_rn") <= max_group_size)
    )
    l_, r_ = base.alias("l"), base.alias("r")
    slopes = (
        # NULL-SAFE group equality: a NULL group key is its own series
        l_.join(
            r_,
            F.col("l._g").eqNullSafe(F.col("r._g"))
            & (F.col("l._rn") < F.col("r._rn")),
        )
        .where(F.col("l._x") != F.col("r._x"))
        .select(
            F.col("l._g").alias("_g"),
            (
                (F.col("r._y") - F.col("l._y")) / (F.col("r._x") - F.col("l._x"))
            ).alias("_s"),
        )
    )
    w = Window.partitionBy("_g").orderBy("_s")
    ranked = slopes.withColumn("_sr", F.row_number().over(w))
    sized = ranked.groupBy("_g").agg(F.count(F.lit(1)).alias("n_slopes"))
    used = base.groupBy("_g").agg(F.count(F.lit(1)).alias("n_used"))
    # middle order statistics: _sr*2 == n+1 selects the single middle of
    # an odd run; _sr*2 in {n, n+2} the two middles of an even run (the
    # odd-n condition is unsatisfiable for even n and vice versa)
    from orientdb_etl_spark.operators.relational import join_back_null_safe

    med = (
        join_back_null_safe(ranked, F.broadcast(sized), ["_g"])
        .where(
            (F.col("_sr") * 2 == F.col("n_slopes") + 1)
            | (F.col("_sr") * 2 == F.col("n_slopes"))
            | (F.col("_sr") * 2 == F.col("n_slopes") + 2)
        )
        .groupBy("_g", "n_slopes")
        .agg(F.round(F.avg("_s"), round_to).alias("ts_slope"))
    )
    return (
        join_back_null_safe(med, used, ["_g"])
        .select(
            F.col("_g").alias(group_col), "n_used", "n_slopes", "ts_slope"
        )
        .orderBy(group_col)
    )


def seasonal_anomaly(
    df: DataFrame,
    ts_col: str,
    bucket_seconds: int = 3600,
    period: int = 24,
    z_thresh: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """Seasonal-profile anomaly detection on the arrival series: bucket
    the timestamps, zero-fill gaps (an EMPTY hour is an anomaly a
    non-densified series would silently skip), group buckets by phase
    ``t % period`` (hour-of-day for hourly buckets, hour-of-week with
    period=168), and flag buckets whose count deviates from THEIR
    phase's mean by more than ``z_thresh`` sample standard deviations —
    "is 3 AM Tuesday unusually quiet for a 3 AM?" rather than a global
    threshold that fires on every daily peak. Returns the full series
    ``(bucket, phase, x, mean_p, sd_p, z, is_anomaly)``.

    Scale shape: like :func:`acf`, the raw frame collapses to the
    bucket series (time-range / bucket rows — bounded by construction)
    in one map-side-combinable pass; phase profiles re-aggregate that
    tiny frame and broadcast back. Degenerate phases (sd = 0 or a
    single observation) yield NULL z and never flag.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2 buckets, got {period}")
    spark = df.sparkSession
    b = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.floor(
                F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                / F.lit(bucket_seconds)
            ).alias("_t")
        )
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_x"))
    )
    # bucket-sized frame, re-scanned by the probe, the spine join, and
    # the downstream statistic: checkpoint so the raw input scans ONCE
    b = b.localCheckpoint()
    lo, hi = b.agg(F.min("_t"), F.max("_t")).first()
    if lo is None:
        raise ValueError(f"seasonal_anomaly: no non-null timestamps in {ts_col!r}")
    series = (
        spark.range(int(lo), int(hi) + 1)
        .select(F.col("id").alias("_t"))
        .join(b, "_t", "left")
        .select(
            "_t",
            F.coalesce("_x", F.lit(0)).cast("double").alias("_x"),
            # pmod: negative time indices stay congruent with their
            # positive phase instead of forming a parallel negative one
            F.pmod(F.col("_t"), F.lit(period)).alias("_ph"),
        )
    )
    prof = series.groupBy("_ph").agg(
        F.avg("_x").alias("_mp"),
        F.stddev_samp("_x").alias("_sp"),
        F.count(F.lit(1)).alias("_np"),
    )
    z = F.when(
        (F.col("_np") > 1) & (F.col("_sp") > 0),
        (F.col("_x") - F.col("_mp")) / F.col("_sp"),
    )
    return (
        series.join(F.broadcast(prof), "_ph")
        .select(
            F.col("_t").alias("bucket"),
            F.col("_ph").alias("phase"),
            F.col("_x").cast("bigint").alias("x"),
            F.round("_mp", round_to).alias("mean_p"),
            F.round("_sp", round_to).alias("sd_p"),
            F.round(z, round_to).alias("z"),
            F.coalesce(F.abs(z) > F.lit(float(z_thresh)), F.lit(False)).alias(
                "is_anomaly"
            ),
        )
        .orderBy("bucket")
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Kaplan–Meier survival estimator with right-censoring: one row per
    distinct event time ``t`` (durations where >= 1 OBSERVED event
    happened) with ``(t, n_risk, n_events, survival)`` where

        n_risk_t  = #subjects with duration >= t
        S(t)      = prod over event times u <= t of (1 - d_u / n_risk_u)

    — the product-limit curve behind retention/churn lifetime analysis
    (Kaplan & Meier 1958). Censored subjects (``observed_col`` false)
    leave the risk set at their duration without contributing an event;
    ties follow the standard convention (events at ``t`` precede
    censorings at ``t``, both counted at risk).

    Scale shape: subjects collapse to per-duration (total, observed)
    counts in ONE aggregation; the at-risk count is total-minus-
    exclusive-prefix over that distinct-duration frame and the product
    folds as exp(prefix sum of ln terms) — both via
    :func:`~orientdb_etl_spark.operators.relational.exclusive_prefix`
    (range partitioned, never a global raw-row window). Integer
    arithmetic for the risk counts; the only float fold is the ln sum
    over the (tiny) event-time frame. A time where every at-risk
    subject dies gets survival exactly 0.0 (no ln(0): Spark would NULL
    it, DuckDB would raise — both engines special-case the row).
    """
    from orientdb_etl_spark.operators.relational import exclusive_prefix

    life = df.select(
        F.col(duration_col).cast("bigint").alias("_t"),
        F.col(observed_col).cast("boolean").alias("_obs"),
    ).where(F.col(duration_col).isNotNull())
    per_t = life.groupBy("_t").agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum(F.when(F.col("_obs"), 1).otherwise(0)).alias("_d"),
    )
    total = per_t.agg(F.sum("_c").alias("_n"))
    risk = (
        exclusive_prefix(per_t, ["_t"], "_c", "sum", "_before", "bigint")
        .crossJoin(F.broadcast(total))
        .select(
            "_t",
            "_d",
            (F.col("_n") - F.coalesce(F.col("_before"), F.lit(0))).alias("_nr"),
        )
        .where(F.col("_d") > 0)
    )
    # a fatal time (d == n_risk) can only be the LAST event time, so the
    # dummy 0.0 term never pollutes earlier rows
    lnterm = F.when(
        F.col("_d") < F.col("_nr"),
        F.log(F.lit(1.0) - F.col("_d") / F.col("_nr")),
    ).otherwise(F.lit(0.0))
    folded = exclusive_prefix(
        risk.withColumn("_ln", lnterm), ["_t"], "_ln", "sum", "_lnpref", "double"
    )
    surv = F.when(F.col("_d") == F.col("_nr"), F.lit(0.0)).otherwise(
        F.exp(F.coalesce(F.col("_lnpref"), F.lit(0.0)) + F.col("_ln"))
    )
    return (
        folded.select(
            F.col("_t").alias("t"),
            F.col("_nr").alias("n_risk"),
            F.col("_d").alias("n_events"),
            F.round(surv, round_to).alias("survival"),
        )
        .orderBy("t")
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator with right-censoring:
    one row per distinct event time ``t`` with ``(t, n_risk, n_events,
    cum_hazard)`` where ``H(t) = sum over event times u <= t of
    d_u / n_risk_u`` — the additive counterpart of :func:`kaplan_meier`
    (Aalen 1978); preferred when the hazard itself (not survival) is the
    modeling target, and it never degenerates at a fatal time (no
    ``ln(0)`` special case: the last increment is just ``d/n = 1``).

    Scale shape: identical to :func:`kaplan_meier` — subjects collapse
    to per-duration counts in ONE aggregation, the at-risk count is
    total-minus-exclusive-prefix, and the cumulative sum folds over the
    tiny distinct-event-time frame via
    :func:`~orientdb_etl_spark.operators.relational.exclusive_prefix`.
    Risk-set arithmetic is all integer; the only float fold is the
    ``d/n`` sum over event times.
    """
    from orientdb_etl_spark.operators.relational import exclusive_prefix

    life = df.select(
        F.col(duration_col).cast("bigint").alias("_t"),
        F.col(observed_col).cast("boolean").alias("_obs"),
    ).where(F.col(duration_col).isNotNull())
    per_t = life.groupBy("_t").agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum(F.when(F.col("_obs"), 1).otherwise(0)).alias("_d"),
    )
    total = per_t.agg(F.sum("_c").alias("_n"))
    risk = (
        exclusive_prefix(per_t, ["_t"], "_c", "sum", "_before", "bigint")
        .crossJoin(F.broadcast(total))
        .select(
            "_t",
            "_d",
            (F.col("_n") - F.coalesce(F.col("_before"), F.lit(0))).alias("_nr"),
        )
        .where(F.col("_d") > 0)
    )
    term = F.col("_d") / F.col("_nr")
    folded = exclusive_prefix(
        risk.withColumn("_h", term), ["_t"], "_h", "sum", "_hpref", "double"
    )
    return (
        folded.select(
            F.col("_t").alias("t"),
            F.col("_nr").alias("n_risk"),
            F.col("_d").alias("n_events"),
            F.round(
                F.coalesce(F.col("_hpref"), F.lit(0.0)) + F.col("_h"), round_to
            ).alias("cum_hazard"),
        )
        .orderBy("t")
    )


def diversity_metrics(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group categorical diversity: one row per group with
    ``(group, n, k, entropy, entropy_norm, simpson, top_share)`` —
    Shannon entropy in nats, Pielou-normalized entropy ``H / ln(k)``
    (NULL for single-category groups, where evenness is undefined),
    Gini–Simpson index ``1 - sum p_i^2`` and the top category's share.
    The mixture-health audit a corpus build runs per source/shard:
    "did this slice collapse onto one language/domain?".

    Plan shape: ONE grouped count over (group, category) — the frame
    shrinks to |groups|·|cats| — then one re-aggregation per group.
    Entropy uses ``H = ln(n) - sum c·ln(c) / n`` (one fold, no per-row
    probability column); ``sum c^2`` stays integer so the Simpson ratio
    is a single deterministic double division.
    """
    g, c = F.col(group_col), F.col(cat_col)
    cell = (
        df.where(g.isNotNull() & c.isNotNull())
        .select(g.alias("_g"), c.alias("_c"))
        .groupBy("_g", "_c")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    per_g = cell.groupBy("_g").agg(
        F.sum("_n").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.expr("_n * ln(CAST(_n AS DOUBLE))")).alias("_cl"),
        F.sum(F.expr("_n * _n")).alias("_c2"),
        F.max("_n").alias("_top"),
    )
    h = F.expr("ln(CAST(n AS DOUBLE)) - _cl / n")
    return per_g.select(
        F.col("_g").alias(group_col),
        "n",
        "k",
        F.round(h, round_to).alias("entropy"),
        F.round(
            F.when(F.col("k") > 1, h / F.expr("ln(CAST(k AS DOUBLE))")),
            round_to,
        ).alias("entropy_norm"),
        F.round(
            F.lit(1.0) - F.col("_c2") / F.expr("CAST(n AS DOUBLE) * n"), round_to
        ).alias("simpson"),
        F.round(F.col("_top") / F.expr("CAST(n AS DOUBLE)"), round_to).alias(
            "top_share"
        ),
    ).orderBy(group_col)


def js_divergence(
    df: DataFrame,
    cat_col: str,
    flag_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Jensen–Shannon divergence between the categorical distributions
    of the ``flag_col``-true rows (P) and the false rows (Q): one row
    ``(n_p, n_q, k, jsd, jsd_norm)`` in nats, with ``jsd_norm = jsd /
    ln(2)`` in [0, 1]. The symmetric, always-finite drift measure —
    unlike KL/PSI it needs no epsilon smoothing for categories present
    on only one side (the ``p·ln(p/m)`` term is 0 at p = 0, and m > 0
    whenever the category exists at all), which is exactly the regime of
    snapshot-over-snapshot topic/language drift checks (Lin 1991).

    Plan shape: ONE grouped count over (category, flag) pivoted to
    per-category (a, b) counts, two broadcast scalars, one fold over the
    tiny category frame. NULL categories and NULL flags are excluded.
    """
    c, fl = F.col(cat_col), F.col(flag_col).cast("boolean")
    cell = (
        df.where(c.isNotNull() & fl.isNotNull())
        .select(c.alias("_c"), fl.alias("_f"))
        .groupBy("_c")
        .agg(
            F.sum(F.when(F.col("_f"), 1).otherwise(0)).alias("_a"),
            F.sum(F.when(F.col("_f"), 0).otherwise(1)).alias("_b"),
        )
    )
    tot = cell.agg(F.sum("_a").alias("_na"), F.sum("_b").alias("_nb"))
    t = cell.crossJoin(F.broadcast(tot))
    p = F.col("_a") / F.col("_na")
    q = F.col("_b") / F.col("_nb")
    m = (p + q) / 2
    term = F.when(F.col("_a") > 0, p * F.log(p / m)).otherwise(F.lit(0.0)) + F.when(
        F.col("_b") > 0, q * F.log(q / m)
    ).otherwise(F.lit(0.0))
    agg = t.agg(
        F.max("_na").alias("n_p"),
        F.max("_nb").alias("n_q"),
        F.count(F.lit(1)).alias("k"),
        F.sum(term).alias("_s"),
    )
    jsd = F.col("_s") / 2
    return agg.select(
        "n_p",
        "n_q",
        "k",
        F.round(jsd, round_to).alias("jsd"),
        F.round(jsd / F.log(F.lit(2.0)), round_to).alias("jsd_norm"),
    )


def _midranks(d: DataFrame, val: str, out: str, checkpoint: bool) -> DataFrame:
    """Distinct-value midrank map for ``val``: ``(val, out)`` with
    ``out = (# values < v) + (ties(v)+1)/2`` — the :func:`mann_whitney_u`
    rank machinery factored for reuse (one grouped count, one
    :func:`~orientdb_etl_spark.operators.relational.exclusive_prefix`,
    never a global raw-row ORDER BY window). Counts are integers, so
    midranks are exact half-integers."""
    from orientdb_etl_spark.operators.relational import exclusive_prefix

    per_v = d.groupBy(val).agg(F.count(F.lit(1)).alias("_t"))
    pv = exclusive_prefix(
        per_v, [val], "_t", "sum", "_lt", "bigint", checkpoint=checkpoint
    )
    return pv.select(
        val,
        (
            F.coalesce(F.col("_lt"), F.lit(0)) + (F.col("_t") + 1) / 2.0
        ).alias(out),
    )


def spearman_corr(
    df: DataFrame,
    col_x: str,
    col_y: str,
    round_to: int = 6,
    checkpoint: bool = True,
) -> DataFrame:
    """Spearman rank correlation between two numeric columns — one row
    ``(n, rho)``. The monotone-association check that survives outliers
    and nonlinearity (Pearson on midranks, the standard tie-aware
    definition). Rows with a NULL on either side are excluded.

    Scale shape: two distinct-value midrank maps (grouped count +
    distributed exclusive prefix each — the :func:`mann_whitney_u`
    machinery, never a global window), joined back onto the rows, then
    ONE moment aggregate. Midranks are exact half-integers, so every
    sum (Σr, Σr², Σrxry) is exact in doubles at any realistic n and the
    final expression replays bit-identically in the oracle. The centered
    form uses mean rank = (n+1)/2 exactly — no catastrophic n·Σ
    products.
    """
    d = df.select(
        F.col(col_x).alias("_x"), F.col(col_y).alias("_y")
    ).where(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
    rx = _midranks(d.select("_x"), "_x", "_rx", checkpoint)
    ry = _midranks(d.select("_y"), "_y", "_ry", checkpoint)
    ranked = d.join(rx, "_x").join(ry, "_y")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("_sxy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_syy"),
    )
    mean = (F.col("n") + 1) / 2.0
    nm2 = F.col("n") * mean * mean
    num = F.col("_sxy") - nm2
    den = F.sqrt((F.col("_sxx") - nm2) * (F.col("_syy") - nm2))
    return agg.select(
        "n",
        F.round(
            F.when(den > 0, num / den), round_to
        ).alias("rho"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
    checkpoint: bool = True,
) -> DataFrame:
    """Kruskal–Wallis H test: does ``value_col`` differ in location
    across the k groups of ``group_col``? One row ``(n, k, dof, h,
    h_corrected)`` with the standard tie correction ``C = 1 -
    Σ(t³-t)/(N³-N)`` (``h_corrected`` NULL when every value ties — C =
    0). The k-sample extension of :func:`mann_whitney_u`; no p-value for
    the same reason as :func:`chi_square` (no chi-square CDF in either
    engine — ``h`` is chi-square with ``dof = k-1`` under H0).

    Scale shape: pooled midranks from the shared distinct-value
    machinery (:func:`_midranks` — grouped count + exclusive prefix),
    one (group, value) count frame joined to the rank map, one per-group
    fold, one scalar fold over the k-row frame. Rank sums R_j are exact
    (integer counts × half-integer midranks).
    """
    d = df.select(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    ).where(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
    ranks = _midranks(d.select("_v"), "_v", "_m", checkpoint)
    per_gv = d.groupBy("_g", "_v").agg(F.count(F.lit(1)).alias("_c"))
    per_g = (
        per_gv.join(ranks, "_v")
        .groupBy("_g")
        .agg(
            F.sum("_c").alias("_nj"),
            F.sum(F.col("_c") * F.col("_m")).alias("_rj"),
        )
    )
    ties = d.groupBy("_v").agg(F.count(F.lit(1)).alias("_t")).agg(
        F.sum(F.expr("_t * _t * _t - _t")).alias("_ties")
    )
    agg = per_g.agg(
        F.sum("_nj").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("_rj") * F.col("_rj") / F.col("_nj")).alias("_s"),
    ).crossJoin(F.broadcast(ties))
    n = F.col("n")
    h = 12.0 / (n * (n + 1)) * F.col("_s") - 3.0 * (n + 1)
    corr = F.lit(1.0) - F.col("_ties") / (n * n * n - n)
    return agg.select(
        "n",
        "k",
        (F.col("k") - 1).alias("dof"),
        F.round(h, round_to).alias("h"),
        F.round(F.when(corr > 0, h / corr), round_to).alias("h_corrected"),
    )


def cuped(
    df: DataFrame,
    unit_col: str,
    arm_col: str,
    pre_col: str,
    post_col: str,
    round_to: int = 6,
) -> DataFrame:
    """CUPED variance reduction for A/B experiments (Deng et al.
    WSDM'13): adjust each unit's experiment-period metric by its
    PRE-period metric, ``y_adj = y - θ·(x - mean(x))`` with the pooled
    ``θ = cov(x, y) / var(x)``, and report per-arm
    ``(arm, n, mean_post, mean_adj, std_post, std_adj, var_reduction)``.
    Dispersion is reported as standard deviations, not raw variances:
    cent-scale metrics make variances ~1e9, where the 6-decimal round
    sits past double's 15-16 significant digits and the two engines'
    round() algorithms land on ADJACENT doubles — sqrt compresses the
    magnitude back inside the portable range.
    Because θ is pooled and x is pre-assignment, the adjustment is
    unbiased for the treatment effect while removing the x-explained
    variance — the standard way to cut experiment runtimes 30-50%.

    Input is one row per unit (already aggregated): ``unit_col`` is
    documentation of that grain. **Pass integer-valued metrics** (e.g.
    cents) — every Σx/Σy/Σxy/Σxx/Σyy moment is then an exact
    (order-independent) integer sum, and everything downstream is a
    fixed chain of scalar IEEE ops, so the oracle replays bit-
    identically. ``var_adj`` comes from the identity ``var(y) -
    2θ·cov(x,y) + θ²·var(x)`` — never a second variance pass over
    derived doubles (whose fold order would differ between engines).
    Plan shape: one pooled moment pass (θ), one per-arm moment pass;
    both are single hash-aggregates over a per-unit frame that is
    already tiny relative to the raw events.
    """
    x = F.col(pre_col).cast("double")
    y = F.col(post_col).cast("double")
    d = df.select(
        F.col(arm_col).alias("_arm"), x.alias("_x"), y.alias("_y")
    ).where(x.isNotNull() & y.isNotNull())

    def _moments(frame, keys: list[str]) -> DataFrame:
        g = frame.groupBy(*keys) if keys else frame
        return g.agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_x").alias("_sx"),
            F.sum("_y").alias("_sy"),
            F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
            F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        )

    # pooled θ = (n·Σxy - Σx·Σy) / (n·Σxx - Σx·Σx); the cancellation-
    # prone raw form is fine because cent-scale integer sums are exact
    mom = _moments(d, [])
    theta = (
        F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    ) / (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
    glob = mom.select(
        theta.alias("_theta"), (F.col("_sx") / F.col("_n")).alias("_mx")
    )

    arm = _moments(d, ["_arm"]).crossJoin(F.broadcast(glob))
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    th = F.col("_theta")
    var_y = (F.col("_syy") - sy * sy / n) / (n - 1)
    var_x = (F.col("_sxx") - sx * sx / n) / (n - 1)
    cov_xy = (F.col("_sxy") - sx * sy / n) / (n - 1)
    var_adj = var_y - 2 * th * cov_xy + th * th * var_x
    out = arm.select(
        F.col("_arm").alias(arm_col),
        n.alias("n"),
        F.round(sy / n, round_to).alias("mean_post"),
        F.round(sy / n - th * (sx / n - F.col("_mx")), round_to).alias(
            "mean_adj"
        ),
        F.round(F.sqrt(var_y), round_to).alias("std_post"),
        F.round(F.sqrt(var_adj), round_to).alias("std_adj"),
        F.round(
            F.when(var_y > 0, F.lit(1.0) - var_adj / var_y), round_to
        ).alias("var_reduction"),
    )
    return out.orderBy(arm_col)


def cross_correlation(
    df: DataFrame,
    ts_col: str,
    label_col: str,
    label_x: str,
    label_y: str,
    max_lag: int = 12,
    bucket_seconds: int = 3600,
    round_to: int = 6,
) -> DataFrame:
    """Lead–lag cross-correlation between two event streams: bucket the
    arrivals of ``label_x`` and ``label_y`` (default hourly), zero-fill
    both series on the COMMON spine, and compute ``r_k = Σ_t (x_t -
    m_x)(y_{t+k} - m_y) / sqrt(Σ(x-m_x)² Σ(y-m_y)²)`` for lags
    ``-max_lag..max_lag`` — positive lag means x LEADS y by k buckets
    (the "do errors precede churn?" / "does marketing lead signups?"
    audit). Returns ``(lag, n_pairs, xcorr)``.

    Scale shape — the :func:`acf` plan, doubled: the raw frame
    collapses to per-(label, bucket) counts in ONE aggregation; all
    later work runs on the series frame whose size is
    time-range/bucket, bounded by CONSTRUCTION. Means and denominators
    use each FULL zero-filled series (the biased estimator keeping
    |r| <= 1); the shifted products come from one equi-join on
    ``t + k`` after a lag explode — never a global ORDER BY window.
    Only the spine bounds and the two denominators reach the driver.
    """
    spark = df.sparkSession
    b = (
        df.where(
            F.col(ts_col).isNotNull()
            & F.col(label_col).isin(label_x, label_y)
        )
        .select(
            F.col(label_col).alias("_l"),
            F.floor(
                F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                / F.lit(bucket_seconds)
            ).alias("_t"),
        )
        .groupBy("_l", "_t")
        .agg(F.count(F.lit(1)).alias("_x"))
    )
    # bucket-sized frame, re-scanned by the probe, the spine join, and
    # the downstream statistic: checkpoint so the raw input scans ONCE
    b = b.localCheckpoint()
    lo, hi = b.agg(F.min("_t"), F.max("_t")).first()
    if lo is None:
        raise ValueError(
            f"cross_correlation: no rows for {label_x!r}/{label_y!r}"
        )
    spine = spark.range(int(lo), int(hi) + 1).select(F.col("id").alias("_t"))

    def _series(lab: str) -> DataFrame:
        s = b.where(F.col("_l") == lab).select("_t", "_x")
        return spine.join(s, "_t", "left").select(
            "_t", F.coalesce("_x", F.lit(0)).cast("double").alias("_x")
        )

    sx, sy = _series(label_x), _series(label_y)
    mx = sx.agg(F.avg("_x").alias("_m"))
    my = sy.agg(F.avg("_x").alias("_m"))
    dx = sx.crossJoin(F.broadcast(mx)).select(
        "_t", (F.col("_x") - F.col("_m")).alias("_d")
    )
    dy = sy.crossJoin(F.broadcast(my)).select(
        "_t", (F.col("_x") - F.col("_m")).alias("_d")
    )
    denx = dx.agg(F.sum(F.col("_d") * F.col("_d"))).first()[0]
    deny = dy.agg(F.sum(F.col("_d") * F.col("_d"))).first()[0]
    if not denx or not deny:
        raise ValueError("cross_correlation: a constant series has no correlation")
    den = float(denx) ** 0.5 * float(deny) ** 0.5
    lags = spark.range(-int(max_lag), int(max_lag) + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    left = dx.crossJoin(F.broadcast(lags)).select(
        "lag",
        (F.col("_t") + F.col("lag")).alias("_t"),
        F.col("_d").alias("_dl"),
    )
    return (
        left.join(dy.select("_t", F.col("_d").alias("_dr")), "_t")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum(F.col("_dl") * F.col("_dr")) / F.lit(den), round_to
            ).alias("xcorr"),
        )
        .orderBy("lag")
    )


def changepoint(
    df: DataFrame,
    ts_col: str,
    bucket_seconds: int = 3600,
    round_to: int = 6,
    checkpoint: bool = True,
) -> DataFrame:
    """Single level-shift changepoint in the event-arrival series:
    bucket the timestamps, zero-fill, and find the boundary minimizing
    the two-segment sum of squared errors — exact binary-segmentation
    step 1 (Scott & Knott 1974 lineage; the "when did the rate change?"
    incident audit). One row: ``(n_buckets, split_epoch, n_before,
    n_after, mean_before, mean_after, sse_total, sse_split, gain)``
    where ``split_epoch`` starts the AFTER segment and the tie-break is
    the earliest boundary.

    Scale shape: the raw frame collapses to per-bucket integer counts
    in ONE aggregation; the series frame is bounded by construction
    (time-range/bucket). Because the spine is DENSE integers, a
    bucket's position is ``t - lo + 1`` — no rank pass at all. Both
    running sums (Σx, Σx²) come from the range-partitioned
    :func:`~orientdb_etl_spark.operators.relational.exclusive_prefix`
    (never a global ORDER BY window), every candidate's SSE is a fixed
    chain of double ops over exact BIGINT prefix sums — the squares stay
    exact integers so the SQL oracle replays them bit-for-bit, and a
    pre-flight guard raises when the EXACT ``sum(x²)`` (a decimal(38,0)
    probe aggregate, so the guard itself can't wrap) exceeds int64
    (increase ``bucket_seconds``) instead of letting the wrapped sum
    corrupt the SSEs silently — and the winner is a
    TakeOrderedAndProject over the bucket frame.
    """
    from orientdb_etl_spark.operators.relational import exclusive_prefix

    spark = df.sparkSession
    b = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.floor(
                F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                / F.lit(bucket_seconds)
            ).alias("_t")
        )
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_x"))
    )
    b = b.localCheckpoint()  # bucket-sized; probed AND joined below
    # the probe also takes the EXACT Σx² (decimal(38,0) sum can't wrap:
    # per-bucket squares fit 2^126, 38 digits holds any realistic total)
    lo, hi, ss = b.agg(
        F.min("_t"),
        F.max("_t"),
        F.sum(
            (F.col("_x").cast("decimal(19,0)") * F.col("_x")).cast(
                "decimal(38,0)"
            )
        ),
    ).first()
    if lo is None:
        raise ValueError(f"changepoint: no non-null timestamps in {ts_col!r}")
    n_buckets = int(hi) - int(lo) + 1
    if n_buckets < 2:
        raise ValueError("changepoint needs at least 2 buckets")
    # Σx² stays EXACT BIGINT (oracle-replayable); guard the wrap on the
    # EXACT sum of squares (zero-filled buckets add 0, so the sum over
    # the dense series equals this probe) instead of the conservative
    # n·max² worst case, which raised on valid one-hot-bucket inputs
    if ss is None or int(ss) > (1 << 62):
        raise ValueError(
            f"changepoint: sum of squared bucket counts overflows int64 "
            f"(sum(x^2)={int(ss)}, n_buckets={n_buckets}); "
            "increase bucket_seconds"
        )
    series = (
        spark.range(int(lo), int(hi) + 1)
        .select(F.col("id").alias("_t"))
        .join(b, "_t", "left")
        .select(
            "_t",
            F.coalesce("_x", F.lit(0)).cast("bigint").alias("_x"),
        )
        .withColumn("_x2", F.col("_x") * F.col("_x"))
    )
    pv = exclusive_prefix(
        series, ["_t"], "_x", "sum", "_ps1", "bigint", checkpoint=checkpoint
    )
    pv = exclusive_prefix(
        pv, ["_t"], "_x2", "sum", "_ps2", "bigint", checkpoint=checkpoint
    )
    tot = series.agg(
        F.sum("_x").alias("_S1"), F.sum("_x2").alias("_S2")
    )
    c = pv.crossJoin(F.broadcast(tot))
    k = (F.col("_t") - F.lit(int(lo)) + 1).cast("bigint")
    s1k = (F.coalesce(F.col("_ps1"), F.lit(0)) + F.col("_x")).cast("bigint")
    s2k = (F.coalesce(F.col("_ps2"), F.lit(0)) + F.col("_x2")).cast("bigint")
    nn = F.lit(n_buckets).cast("bigint")
    nr = nn - k
    s1r = F.col("_S1") - s1k
    s2r = F.col("_S2") - s2k
    d = lambda col: col.cast("double")  # noqa: E731
    sse_l = d(s2k) - d(s1k) * d(s1k) / d(k)
    sse_r = d(s2r) - d(s1r) * d(s1r) / d(nr)
    sse_t = d(F.col("_S2")) - d(F.col("_S1")) * d(F.col("_S1")) / d(nn)
    cand = c.where(nr > 0).select(
        ((F.col("_t") + 1) * F.lit(int(bucket_seconds))).alias("split_epoch"),
        k.alias("n_before"),
        nr.alias("n_after"),
        F.round(d(s1k) / d(k), round_to).alias("mean_before"),
        F.round(d(s1r) / d(nr), round_to).alias("mean_after"),
        F.round(sse_t, round_to).alias("sse_total"),
        F.round(sse_l + sse_r, round_to).alias("sse_split"),
        F.round(sse_t - (sse_l + sse_r), round_to).alias("gain"),
        (sse_l + sse_r).alias("_raw"),
    )
    return (
        cand.orderBy("_raw", "split_epoch")
        .limit(1)
        .select(F.lit(n_buckets).alias("n_buckets"), "*")
        .drop("_raw")
    )


def log_rank(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966): does group A's survival
    curve differ from group B's? At each distinct EVENT time the
    observed group-A deaths are compared with the hypergeometric
    expectation ``d·n_a/n`` under the pooled-hazard null; the statistic
    ``chi2 = (Σ(d_a − e_a))² / Σv`` is χ²(1). One row: ``(n_a, n_b,
    n_times, obs_a, exp_a, obs_b, exp_b, chi2)`` — the significance
    companion of :func:`kaplan_meier` (same tie conventions: events at
    ``t`` precede censorings at ``t``).

    Scale shape: subjects collapse to ONE per-duration aggregation with
    both groups' (at-risk, death) counts as conditional sums; the
    at-risk counts are total-minus-exclusive-prefix over the
    distinct-duration frame (range partitioned, never a global ORDER BY
    window); the two totals are the only driver-side state (exact
    BIGINTs, embedded as literals so the oracle replays the identical
    arithmetic). Risk-set math is all integer; the only float folds are
    the e/v sums over the (tiny) event-time frame.
    """
    from orientdb_etl_spark.operators.relational import exclusive_prefix

    life = df.select(
        F.col(duration_col).cast("bigint").alias("_t"),
        F.col(observed_col).cast("boolean").alias("_obs"),
        F.when(F.col(group_col) == group_a, F.lit(1))
        .when(F.col(group_col) == group_b, F.lit(0))
        .alias("_ga"),
    ).where(F.col(duration_col).isNotNull() & F.col("_ga").isNotNull())
    per_t = life.groupBy("_t").agg(
        F.sum(F.col("_ga")).alias("_c1"),
        F.sum(1 - F.col("_ga")).alias("_c2"),
        F.sum(F.when(F.col("_obs") & (F.col("_ga") == 1), 1).otherwise(0)).alias("_d1"),
        F.sum(F.when(F.col("_obs") & (F.col("_ga") == 0), 1).otherwise(0)).alias("_d2"),
    )
    tot = per_t.agg(F.sum("_c1"), F.sum("_c2")).first()
    n_a, n_b = int(tot[0] or 0), int(tot[1] or 0)
    if n_a == 0 or n_b == 0:
        raise ValueError(
            f"log_rank: empty group (n_a={n_a}, n_b={n_b}) — both "
            f"{group_a!r} and {group_b!r} need at least one subject"
        )
    pv = exclusive_prefix(per_t, ["_t"], "_c1", "sum", "_b1", "bigint")
    pv = exclusive_prefix(pv, ["_t"], "_c2", "sum", "_b2", "bigint")
    d = lambda c: c.cast("double")  # noqa: E731
    ev = pv.select(
        "_t",
        "_d1",
        "_d2",
        (F.lit(n_a) - F.coalesce(F.col("_b1"), F.lit(0))).alias("_n1"),
        (F.lit(n_b) - F.coalesce(F.col("_b2"), F.lit(0))).alias("_n2"),
    ).where((F.col("_d1") + F.col("_d2")) > 0)
    dt = (F.col("_d1") + F.col("_d2")).cast("bigint")
    nt = (F.col("_n1") + F.col("_n2")).cast("bigint")
    e1 = d(dt) * d(F.col("_n1")) / d(nt)
    v = F.when(
        nt > 1,
        d(dt)
        * (d(F.col("_n1")) / d(nt))
        * (d(F.col("_n2")) / d(nt))
        * (d(nt - dt) / d(nt - 1)),
    ).otherwise(F.lit(0.0))
    agg = ev.agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_d1").alias("_o1"),
        F.sum("_d2").alias("_o2"),
        F.sum(e1).alias("_e1"),
        F.sum(v).alias("_v"),
    )
    chi2 = F.when(
        F.col("_v") > 0,
        (d(F.col("_o1")) - F.col("_e1"))
        * (d(F.col("_o1")) - F.col("_e1"))
        / F.col("_v"),
    )
    return agg.select(
        F.lit(n_a).cast("bigint").alias("n_a"),
        F.lit(n_b).cast("bigint").alias("n_b"),
        F.col("_k").alias("n_times"),
        F.col("_o1").alias("obs_a"),
        F.round(F.col("_e1"), round_to).alias("exp_a"),
        F.col("_o2").alias("obs_b"),
        F.round(
            (d(F.col("_o1")) + d(F.col("_o2"))) - F.col("_e1"), round_to
        ).alias("exp_b"),
        F.round(chi2, round_to).alias("chi2"),
    )


def _anova_f(grouped: DataFrame, round_to: int) -> DataFrame:
    """Shared one-way-ANOVA tail over a ``(_g, _x BIGINT)`` frame: one
    per-group (n, Σx, Σx²) aggregation, then the between/within sum-of-
    squares decomposition as a fixed chain of double ops over exact
    integers. Only scale-free statistics are emitted (F, η²) — raw SS
    magnitudes would be hostage to float-fold order across engines."""
    d = lambda c: c.cast("double")  # noqa: E731
    per = grouped.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).alias("_q"),
    )
    t = per.agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_n").alias("_nt"),
        F.sum("_s").alias("_st"),
        F.sum("_q").alias("_qt"),
        F.sum(d(F.col("_s")) * d(F.col("_s")) / d(F.col("_n"))).alias("_sb"),
    )
    ssb = F.col("_sb") - d(F.col("_st")) * d(F.col("_st")) / d(F.col("_nt"))
    ssw = d(F.col("_qt")) - F.col("_sb")
    dfb = (F.col("_k") - 1).cast("bigint")
    dfw = (F.col("_nt") - F.col("_k")).cast("bigint")
    f = F.when(
        (dfb > 0) & (dfw > 0) & (ssw > 0),
        (ssb / d(dfb)) / (ssw / d(dfw)),
    )
    eta = F.when(ssb + ssw > 0, ssb / (ssb + ssw))
    return t.select(
        F.col("_k").alias("k_groups"),
        F.col("_nt").alias("n_total"),
        dfb.alias("df_between"),
        dfw.alias("df_within"),
        F.round(f, round_to).alias("f_stat"),
        F.round(eta, round_to).alias("eta_sq"),
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """One-way ANOVA F-test — the parametric counterpart of
    :func:`kruskal_wallis`: do the group means differ more than the
    within-group noise explains? One row: ``(k_groups, n_total,
    df_between, df_within, f_stat, eta_sq)``.

    Values quantize to integer units of ``1/scale`` (the
    :func:`~orientdb_etl_spark.operators.temporal.twap` cents
    discipline) so the per-group Σx and Σx² are EXACT BIGINTs — grouped
    float folds are not bit-associative across engines, and raw
    sums-of-squares at corpus scale would flip 6-dp rounding. F and η²
    are scale-invariant, so the quantization cancels out of both. Σx²
    stays exact while ``n·(scale·max|x|)² < 2⁶³`` — beyond that, shift
    ``scale`` down (documented, never silent).

    Scale shape: one grouped aggregation to k rows, one k-row global
    fold — no window, no join, no driver state.
    """
    g = df.select(
        F.col(group_col).alias("_g"),
        F.floor(F.col(value_col) * F.lit(int(scale)))
        .cast("bigint")
        .alias("_x"),
    ).where(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
    return _anova_f(g, round_to)


def levene_bf(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Brown–Forsythe test for equality of group VARIANCES (Levene's
    test with the median center — Brown & Forsythe 1974, the
    robust-to-skew variant): one-way ANOVA of the absolute deviations
    ``|x − median_g|``. One row, same schema as :func:`anova_oneway`.
    Run it before trusting that test's equal-variance assumption.

    Exactness: values quantize to integer ``1/scale`` units; the group
    median of integers is integer-or-half-integer, so the deviations
    ``|2x − 2·median|`` are EXACT BIGINTs and the ANOVA tail replays
    bit-identically (F and η² are invariant to the doubling). The exact
    ``percentile`` aggregate buffers one group's values per task — the
    documented preprocess.py trade-off; at 100 TB swap in
    ``percentile_approx`` (different test, same plan).
    """
    b = df.select(
        F.col(group_col).alias("_g"),
        F.floor(F.col(value_col) * F.lit(int(scale)))
        .cast("bigint")
        .alias("_v"),
    ).where(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
    med = b.groupBy("_g").agg(
        F.expr("percentile(_v, 0.5D)").alias("_med")
    )
    g = b.join(med, "_g").select(
        "_g",
        F.abs(
            F.col("_v") * F.lit(2) - (F.col("_med") * F.lit(2.0)).cast("bigint")
        ).alias("_x"),
    )
    return _anova_f(g, round_to)


def mann_kendall(
    df: DataFrame,
    ts_col: str,
    bucket_seconds: int = 3600,
    round_to: int = 6,
) -> DataFrame:
    """Mann–Kendall monotonic-trend test on the event-arrival series —
    the significance companion of :func:`theil_sen`: ``S = Σ_{i<j}
    sign(x_j − x_i)`` over the zero-filled bucket series, with the
    tie-corrected variance ``Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]
    / 18`` and the continuity-corrected normal statistic ``Z``. One
    row: ``(n_buckets, s_stat, n_tie_groups, var_s, z)``. S > 0 means
    rising arrivals.

    Scale shape: the raw frame collapses to per-bucket integer counts
    in ONE aggregation; everything after runs on the zero-filled series
    frame, whose size is time-range/bucket — bounded by CONSTRUCTION.
    The pair fold is a self-join on that bounded frame: quadratic in
    the BUCKET count only (never in row volume), capped by the caller's
    ``bucket_seconds`` choice and documented — a decade of daily
    buckets is ~3.7k rows / 6.7M pairs. S and the tie correction are
    exact BIGINTs; Var(S) takes one /18 double op, so the oracle
    replays bit-identically.
    """
    spark = df.sparkSession
    b = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.floor(
                F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                / F.lit(int(bucket_seconds))
            ).alias("_t")
        )
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_x"))
    )
    # bucket-sized frame, re-scanned by the probe, the spine join, and
    # the downstream statistic: checkpoint so the raw input scans ONCE
    b = b.localCheckpoint()
    lo, hi = b.agg(F.min("_t"), F.max("_t")).first()
    if lo is None:
        raise ValueError(f"mann_kendall: no non-null timestamps in {ts_col!r}")
    n_buckets = int(hi) - int(lo) + 1
    if n_buckets < 2:
        raise ValueError("mann_kendall needs at least 2 buckets")
    pos = (
        spark.range(int(lo), int(hi) + 1)
        .select(F.col("id").alias("_t"))
        .join(b, "_t", "left")
        .select("_t", F.coalesce("_x", F.lit(0)).cast("bigint").alias("_v"))
    )
    l = pos.select(F.col("_t").alias("_ti"), F.col("_v").alias("_vi"))
    r = pos.select(F.col("_t").alias("_tj"), F.col("_v").alias("_vj"))
    s_row = (
        # the bucket frame is bounded by construction — broadcast one
        # side so the non-equi pair join is one BNLJ pass, not a
        # partitions² cartesian
        l.join(F.broadcast(r), F.col("_tj") > F.col("_ti"))
        .agg(
            F.sum(
                F.when(F.col("_vj") > F.col("_vi"), 1)
                .when(F.col("_vj") < F.col("_vi"), -1)
                .otherwise(0)
            ).alias("_s")
        )
    )
    ties = (
        pos.groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") > 1)
        .agg(
            F.count(F.lit(1)).alias("_ng"),
            F.coalesce(
                F.sum(
                    F.col("_c")
                    * (F.col("_c") - 1)
                    * (2 * F.col("_c") + 5)
                ),
                F.lit(0),
            ).alias("_tc"),
        )
    )
    n = F.lit(n_buckets).cast("bigint")
    var_num = (n * (n - 1) * (2 * n + 5)).cast("bigint") - F.col("_tc")
    d = lambda c: c.cast("double")  # noqa: E731
    var_s = d(var_num) / F.lit(18.0)
    z = F.when(F.col("_s") > 0, (d(F.col("_s")) - 1.0) / F.sqrt(var_s)).when(
        F.col("_s") < 0, (d(F.col("_s")) + 1.0) / F.sqrt(var_s)
    ).otherwise(F.lit(0.0))
    return s_row.crossJoin(F.broadcast(ties)).select(
        F.lit(n_buckets).alias("n_buckets"),
        F.col("_s").alias("s_stat"),
        F.col("_ng").alias("n_tie_groups"),
        F.round(var_s, round_to).alias("var_s"),
        F.round(F.when(var_num > 0, z), round_to).alias("z"),
    )


def max_drawdown(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-key maximum drawdown of a value series: with the series
    ordered by time, the largest peak-to-trough drop ``max_t (max_{s<=t}
    v_s − v_t)`` — the standard downside-risk summary for any cumulative
    metric (portfolio value, retention curve, cumulative conversions).
    Returns ``(key, n_points, peak, max_drawdown)`` where ``peak`` is
    the series' global maximum and ``max_drawdown`` is in value units
    (0 for a non-decreasing series).

    ``tiebreak`` disambiguates equal timestamps (make it a total order —
    e.g. an event id) so the running maximum is engine-independent;
    without it, ties make the prefix maximum order-dependent and two
    engines may legitimately disagree.

    Scale shape: one window pass (running max over the key partition,
    rows unbounded-preceding..current) + one grouped aggregate on the
    SAME key, so the exchange is shared — two stages, one shuffle. No
    self-joins, no driver state; drawdown is a prefix scan, exactly what
    a window function is for.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = (
        Window.partitionBy(F.col(key_col))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col).cast("double")
    scanned = (
        df.where(
            F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .withColumn("_peak", F.max(v).over(w))
        .withColumn("_dd", F.col("_peak") - v)
    )
    return scanned.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.max(v), round_to).alias("peak"),
        F.round(F.max("_dd"), round_to).alias("max_drawdown"),
    )


def proportion_ci(
    df: DataFrame,
    group_col: str,
    success_col: str,
    z: float = 1.959964,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Wilson score interval for a proportion (Wilson JASA
    1927): ``(group, n, n_success, p_hat, ci_lo, ci_hi)`` with

        center = (p̂ + z²/2n) / (1 + z²/n)
        half   = z·sqrt(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)

    — the interval that behaves at p̂ near 0/1 and small n where the
    naive normal interval collapses or escapes [0, 1]; the standard
    per-segment conversion-rate error bar. ``success_col`` is any
    boolean-valued expression column (non-null rows count toward n).

    Scale shape: ONE map-side-combinable grouped aggregate (count +
    conditional count); the interval arithmetic is closed-form scalar
    math on the aggregated frame. The cheapest possible statistic.
    """
    s = F.col(success_col).cast("boolean")
    agg = (
        df.where(s.isNotNull())
        .groupBy(F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(s, 1).otherwise(0)).cast("bigint").alias(
                "n_success"
            ),
        )
    )
    zz = float(z) * float(z)
    n = F.col("n").cast("double")
    p = F.col("n_success").cast("double") / n
    denom = 1.0 + zz / n
    center = (p + zz / (2.0 * n)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(p * (1.0 - p) / n + zz / (4.0 * n * n))
        / denom
    )
    return agg.select(
        F.col(group_col),
        "n",
        "n_success",
        F.round(p, round_to).alias("p_hat"),
        F.round(center - half, round_to).alias("ci_lo"),
        F.round(center + half, round_to).alias("ci_hi"),
    )


def seasonal_decompose(
    df: DataFrame,
    ts_col: str,
    bucket_seconds: int = 3600,
    period: int = 24,
    round_to: int = 6,
) -> DataFrame:
    """Classical additive decomposition of the arrival series (the
    moving-average method behind STL's initial pass): bucket and
    zero-fill the series, estimate TREND as the centered moving
    average over one full period (the symmetric window that cancels any
    period-periodic component exactly), SEASONAL as the per-phase mean
    of the detrended series re-centered to sum to zero over a period,
    and REMAINDER as what's left. Returns the full series ``(bucket,
    phase, x, trend, seasonal, remainder)``; edge buckets without a full
    centered window carry NULL trend/remainder (honest NULLs beat
    extrapolated ones).

    For even ``period`` the centered MA is the standard 2×MA: the
    window spans period+1 buckets with half weight on both endpoints.

    Scale shape: the raw frame collapses to the bounded bucket series in
    one pass (the :func:`seasonal_anomaly` discipline); trend is one
    window scan over that tiny frame, the seasonal profile is one
    re-aggregation broadcast back. Everything after the first
    aggregation is O(time-range / bucket), independent of row volume.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2 buckets, got {period}")
    spark = df.sparkSession
    b = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.floor(
                F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                / F.lit(int(bucket_seconds))
            ).alias("_t")
        )
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_x"))
    )
    # bucket-sized frame, re-scanned by the probe, the spine join, and
    # the downstream statistic: checkpoint so the raw input scans ONCE
    b = b.localCheckpoint()
    lo, hi = b.agg(F.min("_t"), F.max("_t")).first()
    if lo is None:
        raise ValueError(
            f"seasonal_decompose: no non-null timestamps in {ts_col!r}"
        )
    series = (
        spark.range(int(lo), int(hi) + 1)
        .select(F.col("id").alias("_t"))
        .join(b, "_t", "left")
        .select(
            "_t",
            F.coalesce("_x", F.lit(0)).cast("double").alias("_x"),
            # pmod: negative time indices stay congruent with their
            # positive phase instead of forming a parallel negative one
            F.pmod(F.col("_t"), F.lit(period)).alias("_ph"),
        )
    )
    p = int(period)
    half = p // 2
    wo = Window.orderBy("_t")
    if p % 2 == 0:
        # 2xMA: period+1 window, half-weight endpoints => (sum(full
        # window) + sum(inner window)) / (2*period); NULL unless the
        # full centered window exists
        full_w = wo.rowsBetween(-half, half)
        inner_w = wo.rowsBetween(-(half - 1), half - 1)
        cnt = F.count(F.lit(1)).over(full_w)
        trend = F.when(
            cnt == p + 1,
            (F.sum("_x").over(full_w) + F.sum("_x").over(inner_w))
            / F.lit(2.0 * p),
        )
    else:
        full_w = wo.rowsBetween(-half, half)
        cnt = F.count(F.lit(1)).over(full_w)
        trend = F.when(cnt == p, F.sum("_x").over(full_w) / F.lit(float(p)))
    detr = series.withColumn("_tr", trend).withColumn(
        "_de", F.col("_x") - F.col("_tr")
    )
    prof = detr.where(F.col("_de").isNotNull()).groupBy("_ph").agg(
        F.avg("_de").alias("_sraw")
    )
    centered = prof.crossJoin(
        F.broadcast(prof.agg(F.avg("_sraw").alias("_smean")))
    ).select("_ph", (F.col("_sraw") - F.col("_smean")).alias("_seas"))
    return (
        detr.join(F.broadcast(centered), "_ph", "left")
        .select(
            (F.col("_t") * bucket_seconds).alias("bucket_start"),
            F.col("_ph").alias("phase"),
            F.col("_x").alias("x"),
            F.round("_tr", round_to).alias("trend"),
            F.round("_seas", round_to).alias("seasonal"),
            F.round(
                F.col("_x") - F.col("_tr") - F.col("_seas"), round_to
            ).alias("remainder"),
        )
    )


def forecast_backtest(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
    season: int = 24,
    scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Rolling-origin one-step-ahead forecast evaluation per key: bucket
    the series (default hourly), zero-fill gaps, forecast each bucket
    with the two classical benchmarks — naive (previous bucket) and
    seasonal naive (same bucket one season earlier, Hyndman & Athanasopoulos
    FPP ch. 5) — and score them on every bucket after the first season.
    Emits one row per (key, model): ``n_eval``, ``mae``, ``rmse``,
    ``wape`` (Σ|e|/Σ|y| — the retail-forecasting workhorse), and
    ``mase`` (Σ|e_model|/Σ|e_naive|; the naive row is 1.0 by
    construction, so seasonal_naive's value IS its skill vs naive).
    Any candidate model that can't beat these two numbers on the
    holdout is not worth shipping — this is the pre-flight gate.

    Scale shape: the raw frame collapses to per-(key, bucket) sums in
    ONE map-side-combinable aggregation; the spine is a per-key
    chunked ``sequence()`` explode (8192-bucket chunks — per-row
    arrays stay bounded for any time span, never row
    volume, and no per-key driver collect); forecasts are two ``lag``
    expressions over one keyed window (single exchange, no global
    sort); metrics are ratios of exact BIGINT sums (values floored to
    integer ``scale``-ths), so both engines agree bit-for-bit — no
    float accumulation-order hazard.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if season < 1:
        raise ValueError(f"season must be >= 1, got {season}")
    b = (
        df.where(
            F.col(ts_col).isNotNull()
            & F.col(value_col).isNotNull()
            & F.expr(" AND ".join(f"{k} IS NOT NULL" for k in keys))
        )
        .groupBy(
            *keys,
            F.floor(
                F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                / F.lit(bucket_seconds)
            ).alias("_t"),
        )
        .agg(
            F.sum(
                F.floor(F.col(value_col) * scale).cast("long")
            ).alias("_y")
        )
    )
    # two-level explode: the outer sequence steps in 8192-bucket chunks,
    # the inner fills each chunk — per-ROW array size stays bounded at
    # 8192 regardless of a key's time span (a single flat
    # sequence(_lo, _hi) materializes the whole span in one row: a
    # year of 1-second buckets is a 31.5M-element array in one task)
    _chunk = 8192
    spine = (
        b.groupBy(*keys)
        .agg(F.min("_t").alias("_lo"), F.max("_t").alias("_hi"))
        .select(
            *keys,
            "_hi",
            F.explode(
                F.sequence("_lo", "_hi", F.lit(_chunk))
            ).alias("_c0"),
        )
        .select(
            *keys,
            F.explode(
                F.sequence(
                    "_c0", F.least(F.col("_c0") + (_chunk - 1), F.col("_hi"))
                )
            ).alias("_t"),
        )
    )
    series = spine.join(b, [*keys, "_t"], "left").select(
        *keys, "_t", F.coalesce("_y", F.lit(0)).cast("long").alias("_y")
    )
    w = Window.partitionBy(*keys).orderBy("_t")
    scored = (
        series.select(
            *keys,
            F.col("_y"),
            F.lag("_y", 1).over(w).alias("_fn"),
            F.lag("_y", season).over(w).alias("_fs"),
            F.row_number().over(w).alias("_rn"),
        )
        .where(F.col("_rn") > season)
    )
    agg = scored.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.abs(F.col("_y") - F.col("_fn"))).alias("_an"),
        F.sum(
            (F.col("_y") - F.col("_fn")) * (F.col("_y") - F.col("_fn"))
        ).alias("_qn"),
        F.sum(F.abs(F.col("_y") - F.col("_fs"))).alias("_as"),
        F.sum(
            (F.col("_y") - F.col("_fs")) * (F.col("_y") - F.col("_fs"))
        ).alias("_qs"),
        F.sum(F.abs("_y")).alias("_ay"),
    )
    models = agg.select(
        *keys,
        F.col("_n"),
        F.col("_an"),
        F.col("_ay"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("naive").alias("model"),
                    F.col("_an").alias("_a"),
                    F.col("_qn").alias("_q"),
                ),
                F.struct(
                    F.lit("seasonal_naive").alias("model"),
                    F.col("_as").alias("_a"),
                    F.col("_qs").alias("_q"),
                ),
            )
        ).alias("_m"),
    )
    dn = F.col("_m._a").cast("double")
    return models.select(
        *keys,
        F.col("_m.model").alias("model"),
        F.col("_n").alias("n_eval"),
        F.round(dn / F.col("_n") / scale, round_to).alias("mae"),
        F.round(
            F.sqrt(F.col("_m._q").cast("double") / F.col("_n")) / scale,
            round_to,
        ).alias("rmse"),
        F.when(
            F.col("_ay") > 0,
            F.round(dn / F.col("_ay").cast("double"), round_to),
        ).alias("wape"),
        F.when(
            F.col("_an") > 0,
            F.round(dn / F.col("_an").cast("double"), round_to),
        ).alias("mase"),
    )


def contribution_analysis(
    before: DataFrame,
    after: DataFrame,
    dims: "list[str]",
    value_col: str,
    top_k: int = 10,
    scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Root-cause decomposition of a metric move: for each analysis
    dimension, which member values drove the period-over-period delta
    and what share of the total change each explains — the "why did
    revenue drop 4%?" answer as a table. Returns the ``top_k``
    contributors per dimension ranked by absolute delta:
    ``(dimension, value, before, after, delta, share_of_delta, rank)``.
    Shares sum to 1 over ALL members of a dimension (each dimension is
    a complete partition of the same global delta), so offsetting
    movers (+8% here, −12% there) surface instead of netting out.
    NULL dimension values are excluded (they partition nothing).

    Scale shape: per dimension, both frames collapse to one
    map-side-combinable sum per member (exact BIGINT after flooring to
    integer ``scale``-ths — cross-engine determinism), joined
    member-collapsed with a full outer join; the global delta rides a
    broadcast scalar; per-dimension top-k goes through
    :func:`~orientdb_etl_spark.operators.relational.topk_per_group`
    (partial WindowGroupLimit — map tasks pre-prune before the
    exchange). The fact frames are scanned once per dimension and
    nothing downstream scales with row volume.
    """
    from orientdb_etl_spark.operators.relational import topk_per_group

    if not dims:
        raise ValueError("contribution_analysis needs at least one dim")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")

    def _sums(df: DataFrame, dim: str, out: str) -> DataFrame:
        return (
            df.where(F.col(dim).isNotNull() & F.col(value_col).isNotNull())
            .groupBy(F.col(dim).cast("string").alias("value"))
            .agg(
                F.sum(
                    F.floor(F.col(value_col) * scale).cast("long")
                ).alias(out)
            )
        )

    parts = []
    for dim in dims:
        b = _sums(before, dim, "_b")
        a = _sums(after, dim, "_a")
        j = (
            b.join(a, "value", "full_outer")
            .select(
                F.lit(dim).alias("dimension"),
                "value",
                F.coalesce("_b", F.lit(0)).alias("_b"),
                F.coalesce("_a", F.lit(0)).alias("_a"),
            )
            .withColumn("_d", F.col("_a") - F.col("_b"))
        )
        tot = j.agg(F.sum("_d").alias("_td"))
        parts.append(j.crossJoin(F.broadcast(tot)))
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    ranked = topk_per_group(
        allp.withColumn("_ad", F.abs("_d")),
        "dimension",
        ["_ad DESC", "value ASC"],
        int(top_k),
        rank_col="rank",
    )
    return ranked.select(
        "dimension",
        "value",
        F.round(F.col("_b").cast("double") / scale, round_to).alias(
            "before"
        ),
        F.round(F.col("_a").cast("double") / scale, round_to).alias(
            "after"
        ),
        F.round(F.col("_d").cast("double") / scale, round_to).alias(
            "delta"
        ),
        F.when(
            F.col("_td") != 0,
            F.round(
                F.col("_d").cast("double") / F.col("_td").cast("double"),
                round_to,
            ),
        ).alias("share_of_delta"),
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("dimension", "rank")


def srm_check(
    df: DataFrame,
    arm_col: str,
    expected: "dict[str, float]",
    round_to: int = 6,
) -> DataFrame:
    """Sample-ratio-mismatch guardrail for experiments: chi-square
    goodness-of-fit of observed arm counts against the DESIGNED
    allocation — the first thing to check before reading any A/B
    result, because a biased assignment invalidates everything
    downstream (Fabijan et al., KDD'19 diagnostics). One row per arm:
    ``(arm, n, expected_share, expected_n, chi2, dof)`` with the
    scalar test statistic broadcast onto every row; compare ``chi2``
    against the chi-square critical value at ``dof`` (no p-value —
    neither engine ships the CDF; same convention as
    :func:`chi_square`). Arms observed in the data but absent from
    ``expected`` raise: an unknown arm IS the incident.

    Scale shape: ONE map-side-combinable count per arm; everything
    after operates on the arms-sized frame (a handful of rows).
    """
    if not expected:
        raise ValueError("srm_check needs the designed allocation")
    tot_share = sum(float(v) for v in expected.values())
    if abs(tot_share - 1.0) > 1e-9:
        raise ValueError(
            f"expected shares must sum to 1, got {tot_share}"
        )
    counts = (
        df.where(F.col(arm_col).isNotNull())
        .groupBy(F.col(arm_col).cast("string").alias("arm"))
        .agg(F.count(F.lit(1)).alias("n"))
        # arm-collapsed = arms-sized; checkpoint so the unknown-arm
        # probe and the statistic share ONE scan of the input
        .localCheckpoint()
    )
    spark = df.sparkSession
    design = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(expected.items())],
        "arm string, expected_share double",
    )
    # anti-join probe, limit(1): never collects more than one row even
    # when someone passes a high-cardinality column as the arm
    unknown = (
        counts.join(design.select("arm"), "arm", "left_anti")
        .limit(1)
        .collect()
    )
    if unknown:
        raise ValueError(
            f"arm not in the designed allocation: {unknown[0]['arm']!r}"
        )
    # observations in a ZERO-share designed arm are the same violation as
    # an unknown arm (the chi-square contribution is infinite; the
    # expected_n > 0 guard below would otherwise map it to 0 and the
    # guardrail would miss an impossible allocation)
    zero_viol = (
        counts.join(
            design.where(F.col("expected_share") <= 0.0).select("arm"),
            "arm",
        )
        .where(F.col("n") > 0)
        .limit(1)
        .collect()
    )
    if zero_viol:
        raise ValueError(
            f"arm {zero_viol[0]['arm']!r} has expected_share 0 but "
            f"{zero_viol[0]['n']} observations — impossible under the design"
        )
    # full design frame (left join) so a silently EMPTY arm still
    # contributes its expected count to the statistic
    per = design.join(counts, "arm", "left").select(
        "arm",
        F.coalesce("n", F.lit(0)).alias("n"),
        "expected_share",
    )
    tot = per.agg(F.sum("n").alias("_nt"))
    e = per.crossJoin(F.broadcast(tot)).withColumn(
        "expected_n", F.col("expected_share") * F.col("_nt")
    )
    stat = e.agg(
        F.sum(
            F.when(
                F.col("expected_n") > 0,
                (F.col("n") - F.col("expected_n"))
                * (F.col("n") - F.col("expected_n"))
                / F.col("expected_n"),
            ).otherwise(F.lit(0.0))
        ).alias("_chi2"),
        (F.count(F.lit(1)) - 1).cast("int").alias("dof"),
    )
    return (
        e.crossJoin(F.broadcast(stat))
        .select(
            "arm",
            "n",
            F.round("expected_share", round_to).alias("expected_share"),
            F.round("expected_n", round_to).alias("expected_n"),
            F.round("_chi2", round_to).alias("chi2"),
            "dof",
        )
        .orderBy("arm")
    )


def diff_in_diff(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    value_col: str,
    scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Two-period difference-in-differences point estimate (Card &
    Krueger 1994 design): with boolean treatment and period columns,
    ``did = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)``
    — the parallel-trends-adjusted treatment effect, the workhorse of
    observational launch analysis alongside :func:`cuped` (experimental)
    and :func:`srm_check` (allocation).

    One row: the four cell means plus the estimate. Exact-integer
    discipline: values are scaled to BIGINT (×``scale``) and summed
    exactly; the four means and the final subtraction are one fixed
    double chain over exact integers, so both engines land on the same
    bits. One aggregation pass (4 conditional sum/count pairs — a
    single scan, map-side combinable); rows with NULL treatment,
    period, or value are excluded.
    """
    q = F.floor(F.col(value_col).cast("double") * scale).cast("bigint")
    t = F.col(treat_col).cast("boolean")
    p = F.col(post_col).cast("boolean")
    base = df.where(
        t.isNotNull() & p.isNotNull() & F.col(value_col).isNotNull()
    )
    cells = []
    for tv, pv, name in (
        (False, False, "c_pre"),
        (False, True, "c_post"),
        (True, False, "t_pre"),
        (True, True, "t_post"),
    ):
        cond = (t == tv) & (p == pv)
        cells.append(F.sum(F.when(cond, q).otherwise(0)).alias(f"_s_{name}"))
        cells.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"_n_{name}")
        )
    agg = base.agg(*cells)
    mean = lambda n: (  # noqa: E731
        F.col(f"_s_{n}") / F.col(f"_n_{n}").cast("double") / scale
    )
    did = (mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre"))
    out = [F.round(mean(n), round_to).alias(f"mean_{n}") for n in
           ("c_pre", "c_post", "t_pre", "t_post")]
    ns = [F.col(f"_n_{n}").alias(f"n_{n}") for n in
          ("c_pre", "c_post", "t_pre", "t_post")]
    return agg.select(*ns, *out, F.round(did, round_to).alias("did"))


def stratified_ate(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    stratum_col: str,
    scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Stratified-adjustment treatment-effect estimate (Cochran 1968
    subclassification): within each stratum compute the treated-minus-
    control outcome difference, then average the differences weighted by
    stratum size — the covariate-adjusted estimate that removes the
    confounding a raw mean difference absorbs. The observational
    companion of :func:`diff_in_diff` (time confounding) and
    :func:`cuped` (variance): this one handles COMPOSITION confounding.

    Common support: strata missing either arm contribute nothing and
    are excluded from the weighting denominator too (the standard
    subclassification rule); ``n_dropped_strata`` reports how many fell.
    Returns one row ``(n_strata, n_used_strata, n_rows_used, naive_diff,
    ate)`` — compare ``naive_diff`` vs ``ate`` to see the confounding.

    Exact-integer discipline: per-stratum sums are BIGINT cents; each
    stratum's difference is a fixed double chain over exact integers;
    the weighted average divides once at the end. One grouped
    aggregation + one scalar aggregation — no joins, no windows.
    """
    q = F.floor(F.col(outcome_col).cast("double") * scale).cast("bigint")
    t = F.col(treat_col).cast("boolean")
    base = df.where(
        t.isNotNull()
        & F.col(outcome_col).isNotNull()
        & F.col(stratum_col).isNotNull()
    )
    per = base.groupBy(F.col(stratum_col).alias("_s")).agg(
        F.sum(F.when(t, q).otherwise(0)).alias("_st"),
        F.sum(F.when(t, 1).otherwise(0)).cast("bigint").alias("_nt"),
        F.sum(F.when(~t, q).otherwise(0)).alias("_sc"),
        F.sum(F.when(~t, 1).otherwise(0)).cast("bigint").alias("_nc"),
    )
    used = (F.col("_nt") > 0) & (F.col("_nc") > 0)
    diff = (
        F.col("_st") / F.col("_nt").cast("double")
        - F.col("_sc") / F.col("_nc").cast("double")
    )
    n_s = F.col("_nt") + F.col("_nc")
    g = per.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(used.cast("long")).cast("bigint").alias("n_used_strata"),
        F.sum(F.when(used, n_s).otherwise(0)).cast("bigint").alias("n_rows_used"),
        F.sum(F.when(used, diff * n_s.cast("double")).otherwise(0.0)).alias(
            "_wsum"
        ),
        F.sum("_st").alias("_gst"),
        F.sum("_nt").cast("bigint").alias("_gnt"),
        F.sum("_sc").alias("_gsc"),
        F.sum("_nc").cast("bigint").alias("_gnc"),
    )
    naive = (
        F.col("_gst") / F.col("_gnt").cast("double")
        - F.col("_gsc") / F.col("_gnc").cast("double")
    ) / scale
    ate = F.col("_wsum") / F.col("n_rows_used").cast("double") / scale
    return g.select(
        "n_strata",
        "n_used_strata",
        "n_rows_used",
        F.round(naive, round_to).alias("naive_diff"),
        F.round(ate, round_to).alias("ate"),
    )


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between two
    samples: ``W₁ = ∫ |F_a(x) − F_b(x)| dx`` over the merged support —
    the magnitude-aware drift metric that completes the family (PSI and
    JSD compare bucket masses, :func:`ks_2sample` the sup-norm; W₁ also
    weighs HOW FAR the mass moved, in the value's own units). Returns
    one row ``(n_a, n_b, w1)``.

    Exact-integer discipline: values quantize to BIGINT (×``scale``);
    between consecutive distinct values the integrand is constant, so
    ``W₁·n_a·n_b·scale = Σ |cumA·n_b − cumB·n_a| · gap`` — an exact
    BIGINT sum (cum ≤ n, gap in quantized units), divided once at the
    end. Both engines land on identical bits.

    Scale shape: one hash aggregation onto the distinct-value frame,
    cumulative counts via the range-partitioned exclusive prefix (never
    a global ORDER BY window — the :func:`ks_2sample` shape), the
    next-value gap from the same prefix machinery run on the reversed
    order (an exclusive MIN of successor values), then one scalar sum.
    """
    from orientdb_etl_spark.operators.relational import exclusive_prefix

    a = F.col(group_col) == group_a
    b = F.col(group_col) == group_b
    q = F.floor(F.col(value_col).cast("double") * scale).cast("bigint")
    per_v = (
        df.filter((a | b) & F.col(value_col).isNotNull())
        .groupBy(q.alias("_v"))
        .agg(
            F.count(F.when(a, 1)).alias("_ca"),
            F.count(F.when(b, 1)).alias("_cb"),
        )
        # distinct-value-sized; probed by totals AND the segment stream
        .localCheckpoint()
    )
    totals = per_v.agg(
        F.sum("_ca").cast("bigint").alias("n_a"),
        F.sum("_cb").cast("bigint").alias("n_b"),
    )
    pre = exclusive_prefix(per_v, ["_v"], "_ca", "sum", "_pa", "bigint")
    pre = exclusive_prefix(pre, ["_v"], "_cb", "sum", "_pb", "bigint")
    # successor gap: exclusive MIN over the DESCENDING value order is
    # the minimum of all larger values = the next distinct value
    pre = pre.withColumn("_nv", -F.col("_v"))
    pre = exclusive_prefix(pre, ["_nv"], "_v", "min", "_succ", "bigint")
    seg = pre.select(
        (F.coalesce(F.col("_pa"), F.lit(0)) + F.col("_ca")).alias("_fa"),
        (F.coalesce(F.col("_pb"), F.lit(0)) + F.col("_cb")).alias("_fb"),
        (F.col("_succ") - F.col("_v")).alias("_gap"),  # NULL at the max
    ).where(F.col("_gap").isNotNull())
    # numerator: sum |fa*n_b - fb*n_a| * gap — totals attached as a
    # broadcast scalar
    num = (
        seg.crossJoin(F.broadcast(totals))
        .agg(
            F.sum(
                F.abs(
                    F.col("_fa") * F.col("n_b") - F.col("_fb") * F.col("n_a")
                )
                * F.col("_gap")
            )
            .cast("bigint")
            .alias("_num"),
        )
    )
    # counts come from totals, NOT first() over the segment stream: a
    # single-distinct-value pool has ZERO segments, and identical
    # distributions must report (n_a, n_b, 0.0) — not a row of NULLs
    return num.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        F.round(
            F.coalesce(F.col("_num"), F.lit(0)).cast("double")
            / F.col("n_a").cast("double")
            / F.col("n_b").cast("double")
            / float(scale),
            round_to,
        ).alias("w1"),
    )
