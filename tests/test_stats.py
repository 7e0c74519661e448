from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from orientdb_etl_spark.functions.stats import (
    gini,
    group_trend,
    ks_2sample,
    psi,
    welch_ttest,
)


def _vals(spark, pairs):
    return spark.createDataFrame(pairs, "g string, v double")


def test_welch_ttest_matches_closed_form(spark):
    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.0, 4.0, 6.0, 8.0]
    df = _vals(spark, [("a", x) for x in a] + [("b", x) for x in b])
    row = welch_ttest(df, "g", "v", "a", "b").collect()[0]
    # closed form recomputed with plain python
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    se2 = va / len(a) + vb / len(b)
    t = (ma - mb) / math.sqrt(se2)
    wdf = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert (row.n_a, row.n_b) == (5, 4)
    assert abs(row.t_stat - round(t, 6)) < 1e-9
    assert abs(row.welch_df - round(wdf, 2)) < 1e-9
    assert row.significant == (abs(t) > 1.96)


def test_welch_ttest_identical_groups_not_significant(spark):
    df = _vals(spark, [("a", float(i % 7)) for i in range(50)] * 2)
    df = df.union(
        _vals(spark, [("b", float(i % 7)) for i in range(50)] * 2)
    )
    row = welch_ttest(df, "g", "v", "a", "b").collect()[0]
    assert row.t_stat == 0.0 and not row.significant


def test_group_trend_exact_line(spark):
    # y = 3x + 1 exactly -> slope 3, intercept 1, r2 = 1
    df = spark.createDataFrame(
        [("k", float(x), 3.0 * x + 1.0) for x in range(10)],
        "k string, x double, y double",
    )
    row = group_trend(df, ["k"], "x", "y").collect()[0]
    assert (row.slope, row.intercept, row.r2) == (3.0, 1.0, 1.0)


def test_group_trend_drops_degenerate_groups(spark):
    df = spark.createDataFrame(
        [
            ("flat_x", 1.0, 1.0),
            ("flat_x", 1.0, 2.0),
            ("flat_x", 1.0, 3.0),
            ("tiny", 1.0, 1.0),
            ("tiny", 2.0, 2.0),
        ],
        "k string, x double, y double",
    )
    assert group_trend(df, ["k"], "x", "y").count() == 0


def test_psi_identical_distributions_is_zero(spark):
    vals = [float(i % 20) for i in range(200)]
    ref = _vals(spark, [("r", v) for v in vals])
    row = psi(ref, ref, "v", bins=10).collect()
    assert all(r.psi_term == 0.0 for r in row)
    assert all(r.psi_total == 0.0 for r in row)


def test_psi_shifted_distribution_flags_drift(spark):
    ref = _vals(spark, [("r", float(i % 10)) for i in range(200)])
    cur = _vals(spark, [("c", float(i % 10) + 6.0) for i in range(200)])
    rows = psi(ref, cur, "v", bins=10).collect()
    total = rows[0].psi_total
    assert total > 0.25  # clear action-threshold drift
    # out-of-range current values clamp into the top bucket
    assert max(r.bucket for r in rows) == 10


def test_psi_proportions_sum_to_one_before_flooring(spark):
    ref = _vals(spark, [("r", float(i)) for i in range(100)])
    cur = _vals(spark, [("c", float(i)) for i in range(50)])
    rows = psi(ref, cur, "v", bins=5).collect()
    # empty current buckets are floored at PSI_EPS, so allow that slack
    assert abs(sum(r.p_ref for r in rows) - 1.0) < 1e-5
    assert abs(sum(r.p_cur for r in rows) - 1.0) < 1e-5


def test_ks_identical_zero_distinct_one(spark):
    same = [("a", float(i % 13)) for i in range(100)] + [
        ("b", float(i % 13)) for i in range(100)
    ]
    row = ks_2sample(_vals(spark, same), "g", "v", "a", "b").collect()[0]
    assert row.d_stat == 0.0 and not row.significant

    disjoint = [("a", float(i)) for i in range(50)] + [
        ("b", 1000.0 + i) for i in range(50)
    ]
    row = ks_2sample(_vals(spark, disjoint), "g", "v", "a", "b").collect()[0]
    assert row.d_stat == 1.0 and row.significant


def test_ks_matches_scipy_style_reference(spark):
    # hand-computed: a = {1,2,3,4}, b = {3,4,5,6} -> D = 0.5 at v=2
    pairs = [("a", v) for v in [1.0, 2.0, 3.0, 4.0]] + [
        ("b", v) for v in [3.0, 4.0, 5.0, 6.0]
    ]
    row = ks_2sample(_vals(spark, pairs), "g", "v", "a", "b").collect()[0]
    assert row.d_stat == 0.5


def test_gini_uniform_vs_concentrated(spark):
    eq = _vals(spark, [("eq", 5.0)] * 10)
    one = _vals(spark, [("one", 0.0)] * 9 + [("one", 100.0)])
    rows = {r.g: r for r in gini(eq.union(one), ["g"], "v").collect()}
    assert rows["eq"].gini == 0.0
    # single holder of all mass: G = (n-1)/n = 0.9
    assert abs(rows["one"].gini - 0.9) < 1e-9


def test_gini_null_for_zero_mass(spark):
    z = _vals(spark, [("z", 0.0)] * 4)
    assert gini(z, ["g"], "v").collect()[0].gini is None


def test_gini_tie_order_invariant(spark):
    # many tied values: result must not depend on row_number tie order
    df = _vals(spark, [("k", float(v)) for v in [1, 1, 1, 2, 2, 3]])
    a = gini(df, ["g"], "v").collect()[0].gini
    b = gini(df.repartition(7), ["g"], "v").collect()[0].gini
    assert a == b
    # closed form: sorted x = [1,1,1,2,2,3], sum=10, sum(i*x)=42
    assert abs(a - round(2 * 42 / (6 * 10) - 7 / 6, 6)) < 1e-9


# ---------------------------------------------------------------------------
# mutual_information
# ---------------------------------------------------------------------------


def test_mi_independent_is_zero(spark):
    import itertools

    from orientdb_etl_spark.functions.stats import mutual_information

    # perfectly independent uniform grid: MI must be exactly 0
    rows = list(itertools.product(["x", "y"], ["p", "q", "r"])) * 4
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r.n == 24 and r.mi == 0.0


def test_mi_identical_columns_equal_entropy(spark):
    import math

    from orientdb_etl_spark.functions.stats import mutual_information

    rows = [("x", "x")] * 3 + [("y", "y")] * 1
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert r.h_a == r.h_b == r.h_ab == round(h, 6)
    assert r.mi == round(h, 6)  # MI(A, A) = H(A)


def test_mi_nulls_excluded(spark):
    from orientdb_etl_spark.functions.stats import mutual_information

    rows = [("x", "p"), ("x", None), (None, "p"), ("y", "q")]
    df = spark.createDataFrame(rows, "a string, b string")
    assert mutual_information(df, "a", "b").collect()[0].n == 2


# ---------------------------------------------------------------------------
# chi_square
# ---------------------------------------------------------------------------


def _cat(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


def test_chi_square_matches_hand_computed_2x2(spark):
    from orientdb_etl_spark.functions.stats import chi_square

    # observed: [[10, 20], [30, 40]]
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20 + [("y", "p")] * 30 + [("y", "q")] * 40
    )
    row = chi_square(_cat(spark, rows), "a", "b").collect()[0]
    o = {("x", "p"): 10, ("x", "q"): 20, ("y", "p"): 30, ("y", "q"): 40}
    n = 100
    ra = {"x": 30, "y": 70}
    cb = {"p": 40, "q": 60}
    chi2 = sum(
        (c - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for (a, b), c in o.items()
    )
    assert (row.n, row.r, row.s, row.dof) == (100, 2, 2, 1)
    assert abs(row.chi2 - round(chi2, 6)) < 1e-6
    assert abs(row.cramers_v - round(math.sqrt(chi2 / n), 6)) < 1e-6


def test_chi_square_independent_is_zero(spark):
    from orientdb_etl_spark.functions.stats import chi_square

    # perfect product distribution: every (a, b) cell = 5 rows
    rows = [(a, b) for a in "xyz" for b in "pq" for _ in range(5)]
    row = chi_square(_cat(spark, rows), "a", "b").collect()[0]
    assert row.chi2 == 0.0
    assert row.cramers_v == 0.0
    assert row.dof == 2


def test_chi_square_perfect_association(spark):
    from orientdb_etl_spark.functions.stats import chi_square

    rows = [("x", "p")] * 7 + [("y", "q")] * 9
    row = chi_square(_cat(spark, rows), "a", "b").collect()[0]
    # Cramér's V = 1 for a diagonal table
    assert row.cramers_v == 1.0


def test_chi_square_nulls_excluded(spark):
    from orientdb_etl_spark.functions.stats import chi_square

    rows = [("x", "p")] * 4 + [(None, "p")] * 3 + [("x", None)] * 2
    row = chi_square(_cat(spark, rows), "a", "b").collect()[0]
    assert row.n == 4
    # the surviving table is 1×1: dof 0, Cramér's V undefined (NULL)
    assert row.dof == 0 and row.cramers_v is None


# ---------------------------------------------------------------------------
# benford_digits
# ---------------------------------------------------------------------------


def test_benford_all_digits_present_and_proportions(spark):
    from orientdb_etl_spark.functions.stats import benford_digits

    df = spark.createDataFrame(
        [(float(v),) for v in [1, 12, 19, 2, 25, 3, 999]], "v double"
    )
    rows = benford_digits(df, "v").collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    got = {r.digit: r.n_d for r in rows}
    assert got == {1: 3, 2: 2, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 1}
    assert abs(got[1] / 7 - rows[0].obs_p) < 1e-6
    assert abs(rows[0].exp_p - round(math.log10(2), 6)) < 1e-9


def test_benford_sub_one_and_negative_values(spark):
    from orientdb_etl_spark.functions.stats import benford_digits

    # |value| < 1 excluded; negatives keep their leading digit via abs
    df = spark.createDataFrame(
        [(0.5,), (0.01,), (-34.2,), (7.0,), (None,)], "v double"
    )
    rows = benford_digits(df, "v").collect()
    got = {r.digit: r.n_d for r in rows}
    assert got[3] == 1 and got[7] == 1
    assert sum(got.values()) == 2


# ---------------------------------------------------------------------------
# mann_whitney_u
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_reference_with_ties(spark):
    from orientdb_etl_spark.functions.stats import mann_whitney_u

    a = [1.0, 2.0, 2.0, 5.0, 7.0]
    b = [2.0, 4.0, 4.0, 6.0]
    df = _vals(spark, [("a", x) for x in a] + [("b", x) for x in b])
    row = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    # midranks by hand over sorted pool [1,2,2,2,4,4,5,6,7]:
    # rank(1)=1, rank(2)=(2+3+4)/3=3, rank(4)=5.5, rank(5)=7, rank(6)=8,
    # rank(7)=9  ->  R_a = 1 + 3 + 3 + 7 + 9 = 23
    na, nb = 5, 4
    ra = 23.0
    u_a = ra - na * (na + 1) / 2
    mu = na * nb / 2
    ties = (3**3 - 3) + (2**3 - 2)
    nn = na + nb
    sig2 = na * nb / 12 * ((nn + 1) - ties / (nn * (nn - 1)))
    z = (u_a - mu) / math.sqrt(sig2)
    assert (row.n_a, row.n_b) == (na, nb)
    assert row.u_a == round(u_a, 1)
    assert abs(row.z_stat - round(z, 6)) < 1e-9
    assert row.significant == (abs(z) > 1.96)


def test_mann_whitney_identical_groups_z_zero(spark):
    from orientdb_etl_spark.functions.stats import mann_whitney_u

    vals = [float(i % 11) for i in range(99)]
    df = _vals(
        spark, [("a", x) for x in vals] + [("b", x) for x in vals]
    )
    row = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert row.z_stat == 0.0
    assert not row.significant


# ---------------------------------------------------------------------------
# acf
# ---------------------------------------------------------------------------


def _event_times(spark, hours):
    # one event per listed hour index (hour 0 = epoch)
    return spark.createDataFrame(
        [(f"2024-01-01 {h:02d}:30:00",) for h in hours], "ts string"
    ).select(F.col("ts").cast("timestamp").alias("ts"))


def test_acf_periodic_series(spark):
    from orientdb_etl_spark.functions.stats import acf

    # events only in even hours over 0..23 -> series alternates 1,0,...
    hours = [h for h in range(24) if h % 2 == 0]
    rows = acf(_event_times(spark, hours), "ts", max_lag=4).collect()
    got = {r.lag: r.acf for r in rows}
    # replay the estimator in plain python
    x = [1.0 if h % 2 == 0 else 0.0 for h in range(23)]  # buckets 0..22
    m = sum(x) / len(x)
    c0 = sum((v - m) ** 2 for v in x)

    def ref(k):
        return round(
            sum((x[t] - m) * (x[t + k] - m) for t in range(len(x) - k)) / c0, 6
        )

    for k in range(1, 5):
        assert abs(got[k] - ref(k)) < 1e-6
    assert got[2] > 0.8 and got[1] < 0


def test_acf_zero_fills_gaps(spark):
    from orientdb_etl_spark.functions.stats import acf

    # hours 0 and 5 only: the series must span 6 buckets (4 zero-filled)
    rows = acf(_event_times(spark, [0, 5]), "ts", max_lag=5).collect()
    got = {r.lag: r.n_pairs for r in rows}
    assert got == {1: 5, 2: 4, 3: 3, 4: 2, 5: 1}


def test_acf_constant_series_raises(spark):
    import pytest as _pytest

    from orientdb_etl_spark.functions.stats import acf

    with _pytest.raises(ValueError, match="constant"):
        acf(_event_times(spark, list(range(6))), "ts", max_lag=2)


# ---------------------------------------------------------------------------
# theil_sen
# ---------------------------------------------------------------------------


def _xy(spark, rows):
    return spark.createDataFrame(rows, "g string, x double, y double")


def test_theil_sen_exact_line_with_outlier(spark):
    from orientdb_etl_spark.functions.stats import theil_sen

    # y = 2x + 1 on 9 points plus one wild outlier: median slope stays 2
    pts = [("a", float(x), 2.0 * x + 1.0) for x in range(9)]
    pts.append(("a", 9.0, 500.0))
    row = theil_sen(_xy(spark, pts), "g", "x", "y").collect()[0]
    assert row.n_used == 10
    assert row.n_slopes == 45
    assert row.ts_slope == 2.0


def test_theil_sen_even_slope_count_averages_middles(spark):
    from orientdb_etl_spark.functions.stats import theil_sen

    # 4 points -> 6 slopes; median = mean of 3rd and 4th sorted slopes
    pts = [("a", 0.0, 0.0), ("a", 1.0, 1.0), ("a", 2.0, 4.0), ("a", 3.0, 9.0)]
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (_, x1, y1) in enumerate(pts)
        for (_, x2, y2) in pts[i + 1 :]
    )
    want = round((slopes[2] + slopes[3]) / 2, 6)
    row = theil_sen(_xy(spark, pts), "g", "x", "y").collect()[0]
    assert row.ts_slope == want


def test_theil_sen_cap_is_deterministic(spark):
    from orientdb_etl_spark.functions.stats import theil_sen

    pts = [("a", float(x), float(x)) for x in range(50)]
    r1 = theil_sen(_xy(spark, pts), "g", "x", "y", max_group_size=10).collect()[0]
    assert r1.n_used == 10
    assert r1.n_slopes == 45
    assert r1.ts_slope == 1.0


# ---------------------------------------------------------------------------
# seasonal_anomaly
# ---------------------------------------------------------------------------


def _hourly_events(spark, counts):
    # counts[i] events in hour-bucket i (hours since 2024-01-01 00:00 UTC)
    rows = []
    for h, c in enumerate(counts):
        d, hh = divmod(h, 24)
        rows += [(f"2024-01-{d + 1:02d} {hh:02d}:15:00",)] * c
    return spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )


def test_seasonal_anomaly_flags_phase_outlier_not_daily_peak(spark):
    from orientdb_etl_spark.functions.stats import seasonal_anomaly

    # 6 days of a strong daily pattern: quiet nights (2), busy noon (40).
    # Day 5's hour 0 spikes to 41 — tiny vs the noon peak, huge vs other
    # midnights. A global threshold misses it; the phase profile must not.
    counts = []
    for day in range(6):
        for hh in range(24):
            base = 40 if hh == 12 else 2
            counts.append(base + (1 if (day, hh) in ((0, 3), (2, 7)) else 0))
    counts[4 * 24 + 0] = 41  # midnight spike on day 5
    out = seasonal_anomaly(_hourly_events(spark, counts), "ts", z_thresh=2.0)
    flagged = {r.bucket % (24 * 365 * 100) for r in out.where("is_anomaly").collect()}
    rel = {b % 24 for b in flagged}
    assert 0 in rel  # the midnight spike's phase
    noon = [r for r in out.collect() if r.phase == 12]
    assert all(not r.is_anomaly for r in noon)  # ordinary peaks don't flag


def test_seasonal_anomaly_zero_filled_hour_can_flag(spark):
    from orientdb_etl_spark.functions.stats import seasonal_anomaly

    # constant 10/hour except one MISSING hour on the last day — the
    # zero-filled bucket must exist and carry the most extreme z
    counts = [10] * (24 * 5)
    counts[24 * 4 + 6] = 0
    out = seasonal_anomaly(_hourly_events(spark, counts), "ts", z_thresh=1.5)
    rows = out.collect()
    assert len(rows) == 24 * 5  # mid-range empty hour: full span kept
    zero = [r for r in rows if r.x == 0]
    assert len(zero) == 1 and zero[0].is_anomaly


def test_seasonal_anomaly_degenerate_phase_never_flags(spark):
    from orientdb_etl_spark.functions.stats import seasonal_anomaly

    # 24 buckets, period 24: every phase has exactly one observation
    out = seasonal_anomaly(_hourly_events(spark, [3] * 24), "ts")
    rows = out.collect()
    assert all(r.z is None and not r.is_anomaly for r in rows)


# ---------------------------------------------------------------------------
# zipf_fit (profiling)
# ---------------------------------------------------------------------------


def test_zipf_fit_exact_power_law(spark):
    import math as _math

    from orientdb_etl_spark.functions.profiling import zipf_fit

    # construct counts c_r = round(1000 * r^-1): OLS slope must be ~ -1
    words = [f"w{r}" for r in range(1, 21)]
    rows = []
    for r, w in enumerate(words, start=1):
        rows += [(w + " ",)] * round(1000 / r)
    df = spark.createDataFrame([(" ".join(t[0] for t in rows),)], "text string")
    out = zipf_fit(df, "text").collect()[0]
    assert out.vocab == 20
    assert out.total_tokens == sum(round(1000 / r) for r in range(1, 21))
    assert abs(out.zipf_slope - (-1.0)) < 0.01
    assert out.r2 > 0.999


def test_zipf_fit_uniform_corpus_slope_zero(spark):
    from orientdb_etl_spark.functions.profiling import zipf_fit

    df = spark.createDataFrame(
        [("alpha beta gamma delta " * 25,)], "text string"
    )
    out = zipf_fit(df, "text").collect()[0]
    assert out.vocab == 4
    assert out.zipf_slope == 0.0 or abs(out.zipf_slope) < 1e-9


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------


def _lifetimes(spark, rows):
    return spark.createDataFrame(rows, "dur bigint, obs boolean")


def _km_ref(rows):
    """Plain-python product-limit replay."""
    from collections import Counter

    total = len(rows)
    cnt = Counter(d for d, _ in rows)
    dth = Counter(d for d, o in rows if o)
    out, s, seen = [], 1.0, 0
    for t in sorted(cnt):
        n_risk = total - seen
        seen += cnt[t]
        d = dth.get(t, 0)
        if d == 0:
            continue
        s = 0.0 if d == n_risk else s * (1.0 - d / n_risk)
        out.append((t, n_risk, d, round(s, 6)))
    return out


def test_kaplan_meier_matches_reference(spark):
    from orientdb_etl_spark.functions.stats import kaplan_meier

    # classic textbook-style data with censoring interleaved
    rows = [
        (1, True), (2, True), (2, False), (3, True), (4, False),
        (5, True), (5, True), (6, False), (8, True), (9, False),
    ]
    got = [
        (r.t, r.n_risk, r.n_events, r.survival)
        for r in kaplan_meier(_lifetimes(spark, rows), "dur", "obs").collect()
    ]
    assert got == _km_ref(rows)


def test_kaplan_meier_censored_only_times_absent(spark):
    from orientdb_etl_spark.functions.stats import kaplan_meier

    rows = [(1, True), (2, False), (3, True)]
    got = kaplan_meier(_lifetimes(spark, rows), "dur", "obs").collect()
    assert [r.t for r in got] == [1, 3]
    # censoring at 2 still shrank the risk set for t=3
    assert got[1].n_risk == 1


def test_kaplan_meier_everyone_dies_hits_zero(spark):
    from orientdb_etl_spark.functions.stats import kaplan_meier

    rows = [(1, True), (2, True), (2, True)]
    got = kaplan_meier(_lifetimes(spark, rows), "dur", "obs").collect()
    assert got[-1].survival == 0.0
    assert got[-1].n_events == got[-1].n_risk == 2


# ---------------------------------------------------------------------------
# nelson_aalen


def test_nelson_aalen_matches_hand_computation(spark):
    from orientdb_etl_spark.functions.stats import nelson_aalen

    # durations: events at 1 (d=1), 2 (d=2), censor at 3, event at 4
    rows = [(1, True), (2, True), (2, True), (3, False), (4, True)]
    df = spark.createDataFrame(rows, "dur long, obs boolean")
    out = nelson_aalen(df, "dur", "obs").collect()
    got = {r.t: (r.n_risk, r.n_events, r.cum_hazard) for r in out}
    assert got[1] == (5, 1, round(1 / 5, 6))
    assert got[2] == (4, 2, round(1 / 5 + 2 / 4, 6))
    # censored-only time 3 emits no row; at t=4 the risk set is 1
    assert 3 not in got
    assert got[4] == (1, 1, round(1 / 5 + 2 / 4 + 1 / 1, 6))


def test_nelson_aalen_fatal_last_time_no_special_case(spark):
    from orientdb_etl_spark.functions.stats import nelson_aalen

    df = spark.createDataFrame(
        [(1, True), (1, True)], "dur long, obs boolean"
    )
    out = nelson_aalen(df, "dur", "obs").collect()
    assert len(out) == 1 and out[0].cum_hazard == 1.0


# ---------------------------------------------------------------------------
# diversity_metrics


def test_diversity_metrics_hand_values(spark):
    import math

    from orientdb_etl_spark.functions.stats import diversity_metrics

    rows = (
        [("A", "x")] * 2 + [("A", "y")] * 2 + [("B", "z")] * 3
    )
    df = spark.createDataFrame(rows, "src string, cat string")
    out = {r.src: r for r in diversity_metrics(df, "src", "cat").collect()}
    a = out["A"]
    assert (a.n, a.k) == (4, 2)
    assert a.entropy == round(math.log(2), 6)
    assert a.entropy_norm == 1.0
    assert a.simpson == 0.5
    assert a.top_share == 0.5
    b = out["B"]
    # single-category group: zero entropy, evenness undefined (NULL)
    assert (b.n, b.k, b.entropy, b.simpson, b.top_share) == (3, 1, 0.0, 0.0, 1.0)
    assert b.entropy_norm is None


def test_diversity_metrics_excludes_nulls(spark):
    from orientdb_etl_spark.functions.stats import diversity_metrics

    rows = [("A", "x"), ("A", None), (None, "y")]
    df = spark.createDataFrame(rows, "src string, cat string")
    out = diversity_metrics(df, "src", "cat").collect()
    assert len(out) == 1 and out[0].n == 1


# ---------------------------------------------------------------------------
# js_divergence


def test_js_divergence_identical_and_disjoint(spark):
    from orientdb_etl_spark.functions.stats import js_divergence

    same = [("x", True)] * 3 + [("y", True)] * 2 + [("x", False)] * 3 + [
        ("y", False)
    ] * 2
    row = js_divergence(
        spark.createDataFrame(same, "c string, f boolean"), "c", "f"
    ).collect()[0]
    assert row.jsd == 0.0 and row.jsd_norm == 0.0

    disjoint = [("x", True)] * 4 + [("y", False)] * 6
    row = js_divergence(
        spark.createDataFrame(disjoint, "c string, f boolean"), "c", "f"
    ).collect()[0]
    # maximal divergence: jsd = ln 2, normalized exactly 1
    import math

    assert row.jsd == round(math.log(2), 6)
    assert row.jsd_norm == 1.0


def test_js_divergence_one_sided_category_finite(spark):
    from orientdb_etl_spark.functions.stats import js_divergence

    rows = [("x", True)] * 3 + [("x", False)] * 2 + [("y", False)] * 2
    row = js_divergence(
        spark.createDataFrame(rows, "c string, f boolean"), "c", "f"
    ).collect()[0]
    assert row.jsd is not None and 0 < row.jsd < 0.6931


# ---------------------------------------------------------------------------
# spearman_corr


def test_spearman_perfect_monotone(spark):
    from orientdb_etl_spark.functions.stats import spearman_corr

    rows = [(float(i), float(i**3)) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert spearman_corr(df, "x", "y").collect()[0].rho == 1.0
    rows = [(float(i), float(-i)) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert spearman_corr(df, "x", "y").collect()[0].rho == -1.0


def test_spearman_ties_match_hand_midranks(spark):
    from orientdb_etl_spark.functions.stats import spearman_corr

    xs = [1.0, 2.0, 2.0, 3.0]
    ys = [10.0, 20.0, 30.0, 30.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    rho = spearman_corr(df, "x", "y").collect()[0].rho
    # midranks: x -> [1, 2.5, 2.5, 4]; y -> [1, 2, 3.5, 3.5]
    rx, ry = [1, 2.5, 2.5, 4], [1, 2, 3.5, 3.5]
    n = 4
    m = (n + 1) / 2
    num = sum(a * b for a, b in zip(rx, ry)) - n * m * m
    den = (
        (sum(a * a for a in rx) - n * m * m)
        * (sum(b * b for b in ry) - n * m * m)
    ) ** 0.5
    assert rho == round(num / den, 6)


def test_spearman_constant_column_null(spark):
    from orientdb_etl_spark.functions.stats import spearman_corr

    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
    )
    assert spearman_corr(df, "x", "y").collect()[0].rho is None


# ---------------------------------------------------------------------------
# kruskal_wallis


def test_kruskal_wallis_hand_computation(spark):
    from orientdb_etl_spark.functions.stats import kruskal_wallis

    groups = {"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0], "c": [7.0, 8.0, 9.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    row = kruskal_wallis(df, "g", "v").collect()[0]
    # no ties: ranks are 1..9, R = [6, 15, 24], N = 9
    n, s = 9, (36 / 3 + 225 / 3 + 576 / 3)
    h = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    assert (row.n, row.k, row.dof) == (9, 3, 2)
    assert row.h == round(h, 6)
    assert row.h_corrected == row.h  # no ties -> correction is identity


def test_kruskal_wallis_all_tied_null_correction(spark):
    from orientdb_etl_spark.functions.stats import kruskal_wallis

    rows = [("a", 5.0)] * 4 + [("b", 5.0)] * 4
    df = spark.createDataFrame(rows, "g string, v double")
    row = kruskal_wallis(df, "g", "v").collect()[0]
    assert row.h_corrected is None  # C = 0: every value ties


# ---------------------------------------------------------------------------
# cuped


def test_cuped_perfect_covariate_removes_all_variance(spark):
    from orientdb_etl_spark.functions.stats import cuped

    # y = 2x exactly: theta = 2, adjusted variance exactly 0
    rows = [(i, i % 2, 100 + 7 * i, 2 * (100 + 7 * i)) for i in range(40)]
    df = spark.createDataFrame(rows, "u long, arm int, x long, y long")
    out = cuped(df, "u", "arm", "x", "y").collect()
    assert len(out) == 2
    for r in out:
        assert r.std_adj == 0.0
        assert r.var_reduction == 1.0
        assert r.std_post > 0


def test_cuped_unrelated_covariate_keeps_means(spark):
    from orientdb_etl_spark.functions.stats import cuped

    # x constant-ish noise uncorrelated with y: theta ~ small, adjusted
    # means stay near raw means and variance is not inflated much
    rows = [
        (i, i % 2, (i * 37) % 11, 1000 + (i * 13) % 7) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "u long, arm int, x long, y long")
    out = cuped(df, "u", "arm", "x", "y").collect()
    for r in out:
        assert abs(r.mean_adj - r.mean_post) < 5.0
        assert r.std_adj <= r.std_post * 1.1


# ---------------------------------------------------------------------------
# cross_correlation / changepoint


def _minute_events(spark, counts_by_label):
    rows = []
    for lab, counts in counts_by_label.items():
        for minute, c in enumerate(counts):
            for k in range(c):
                rows.append((lab, f"2024-01-01 00:{minute:02d}:{k:02d}"))
    return spark.createDataFrame(rows, "lab string, ts string")


def test_cross_correlation_detects_known_lead(spark):
    from orientdb_etl_spark.functions.stats import cross_correlation

    x = [5, 0, 0, 3, 0, 0, 7, 0, 0, 0]
    y = [0, 0, 5, 0, 0, 3, 0, 0, 7, 0]  # x shifted right by 2
    df = _minute_events(spark, {"x": x, "y": y})
    out = {
        r.lag: r
        for r in cross_correlation(
            df, "ts", "lab", "x", "y", max_lag=3, bucket_seconds=60
        ).collect()
    }
    assert set(out) == set(range(-3, 4))
    # the spine spans the OBSERVED bucket range: minute 0 (x) .. 8 (y)
    xs, ys = x[:9], y[:9]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denx = sum((v - mx) ** 2 for v in xs)
    deny = sum((v - my) ** 2 for v in ys)
    den = denx**0.5 * deny**0.5
    for k in range(-3, 4):
        num = sum(
            (xs[t] - mx) * (ys[t + k] - my)
            for t in range(n)
            if 0 <= t + k < n
        )
        assert out[k].xcorr == round(num / den, 6)
        assert out[k].n_pairs == n - abs(k)
    best = max(out.values(), key=lambda r: r.xcorr)
    assert best.lag == 2


def test_cross_correlation_validation(spark):
    import pytest as _pytest

    from orientdb_etl_spark.functions.stats import cross_correlation

    df = _minute_events(spark, {"x": [1, 1, 1], "y": [2, 1, 2]})
    with _pytest.raises(ValueError, match="no rows"):
        cross_correlation(df, "ts", "lab", "missing", "also_missing").collect()
    with _pytest.raises(ValueError, match="constant series"):
        cross_correlation(df, "ts", "lab", "x", "y", max_lag=1,
                          bucket_seconds=60).collect()


def test_changepoint_finds_level_shift(spark):
    from orientdb_etl_spark.functions.stats import changepoint

    df = _minute_events(spark, {"e": [2, 2, 2, 2, 2, 10, 10, 10, 10, 10]})
    row = changepoint(df, "ts", bucket_seconds=60).collect()[0]
    assert row.n_buckets == 10
    assert (row.n_before, row.n_after) == (5, 5)
    assert (row.mean_before, row.mean_after) == (2.0, 10.0)
    assert row.sse_split == 0.0
    assert row.gain == row.sse_total > 0
    # split_epoch starts the AFTER segment: minute 5 of 2024-01-01
    import datetime as _dt

    want = int(
        _dt.datetime(2024, 1, 1, 0, 5, tzinfo=_dt.timezone.utc).timestamp()
    )
    assert row.split_epoch == want


def test_changepoint_zero_fills_gaps_and_validates(spark):
    import pytest as _pytest

    from orientdb_etl_spark.functions.stats import changepoint

    # minutes 0 and 4 only: buckets 1-3 zero-fill, so n_buckets = 5
    df = _minute_events(spark, {"e": [3, 0, 0, 0, 3]})
    row = changepoint(df, "ts", bucket_seconds=60).collect()[0]
    assert row.n_buckets == 5
    assert row.n_before + row.n_after == 5
    one = _minute_events(spark, {"e": [4]})
    with _pytest.raises(ValueError, match="at least 2 buckets"):
        changepoint(one, "ts", bucket_seconds=60)


# ---------------------------------------------------------------------------
# log_rank / anova_oneway / levene_bf


def test_log_rank_identical_groups_is_zero(spark):
    from orientdb_etl_spark.functions.stats import log_rank

    rows = [(g, t, True) for g in ("a", "b") for t in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "g string, dur long, obs boolean")
    r = log_rank(df, "dur", "obs", "g", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.n_times) == (5, 5, 5)
    assert r.obs_a == 5 and r.obs_b == 5
    assert r.exp_a == 5.0 and r.exp_b == 5.0
    assert r.chi2 == 0.0


def test_log_rank_hand_computed(spark):
    from orientdb_etl_spark.functions.stats import log_rank

    # group a dies at 1, 2; group b dies at 3; b censored at 4
    rows = [("a", 1, True), ("a", 2, True), ("b", 3, True), ("b", 4, False)]
    df = spark.createDataFrame(rows, "g string, dur long, obs boolean")
    r = log_rank(df, "dur", "obs", "g", "a", "b").collect()[0]
    # t=1: n=4 (2a, 2b), d=1, e_a = 1*2/4 = .5, v = 1*(2/4)*(2/4)*(3/3)=.25
    # t=2: n=3 (1a, 2b), d=1, e_a = 1/3,      v = (1/3)*(2/3)*(1) = 2/9
    # t=3: n=2 (0a, 2b), d=1, e_a = 0,        v = 0
    ea = 0.5 + 1 / 3
    vv = 0.25 + 2 / 9
    assert r.obs_a == 2 and r.obs_b == 1
    assert r.exp_a == round(ea, 6)
    assert r.exp_b == round(3 - ea, 6)
    assert r.chi2 == round((2 - ea) ** 2 / vv, 6)


def test_log_rank_empty_group_raises(spark):
    import pytest as _pytest

    from orientdb_etl_spark.functions.stats import log_rank

    df = spark.createDataFrame(
        [("a", 1, True)], "g string, dur long, obs boolean"
    )
    with _pytest.raises(ValueError, match="empty group"):
        log_rank(df, "dur", "obs", "g", "a", "b")


def test_anova_oneway_hand_computed(spark):
    from orientdb_etl_spark.functions.stats import anova_oneway

    # groups with means 2, 4 and identical within-variance
    rows = [("a", 1.0), ("a", 3.0), ("b", 3.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    # cents: a = (100, 300), b = (300, 500); ssb = 4e4 cents^2 * ... :
    # grand mean 300; ssb = 2*(200-300)^2 + 2*(400-300)^2 = 40000 (x100^2)
    # ssw = 2*(100^2) * 2 groups = 40000 (x100^2); f = (ssb/1)/(ssw/2) = 2
    assert (r.k_groups, r.n_total) == (2, 4)
    assert (r.df_between, r.df_within) == (1, 2)
    assert r.f_stat == 2.0
    assert r.eta_sq == 0.5


def test_anova_oneway_degenerate_nulls(spark):
    from orientdb_etl_spark.functions.stats import anova_oneway

    # single group: df_between = 0 -> NULL f; constant values -> ssw = 0
    one = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, v double"
    )
    r = anova_oneway(one, "g", "v").collect()[0]
    assert r.f_stat is None
    const = spark.createDataFrame(
        [("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 2.0)],
        "g string, v double",
    )
    r = anova_oneway(const, "g", "v").collect()[0]
    assert r.f_stat is None and r.eta_sq is None


def test_levene_bf_detects_variance_difference(spark):
    from orientdb_etl_spark.functions.stats import levene_bf

    # same medians, wildly different spreads
    rows = [("tight", 100.0 + d) for d in (-1, -0.5, 0, 0.5, 1)] + [
        ("wide", 100.0 + d) for d in (-50, -25, 0, 25, 50)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = levene_bf(df, "g", "v").collect()[0]
    assert (r.k_groups, r.n_total) == (2, 10)
    assert r.f_stat > 5  # spread difference dominates

    same = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3)] + [("b", float(v) + 100) for v in (1, 2, 3)],
        "g string, v double",
    )
    r = same.transform(lambda d: levene_bf(d, "g", "v")).collect()[0]
    # identical |x - median| multisets in both groups: F exactly 0
    assert r.f_stat == 0.0


def test_mann_kendall_monotone_and_flat(spark):
    from orientdb_etl_spark.functions.stats import mann_kendall

    # strictly rising counts 1..6 -> S = 15 (every pair concordant)
    rising = _minute_events(spark, {"e": [1, 2, 3, 4, 5, 6]})
    r = mann_kendall(rising, "ts", bucket_seconds=60).collect()[0]
    assert (r.n_buckets, r.s_stat, r.n_tie_groups) == (6, 15, 0)
    # var = 6*5*17/18 = 28.333333, z = 14/sqrt(var)
    assert r.var_s == round(6 * 5 * 17 / 18, 6)
    assert r.z == round(14 / (6 * 5 * 17 / 18) ** 0.5, 6)

    flat = _minute_events(spark, {"e": [3, 3, 3, 3]})
    r = mann_kendall(flat, "ts", bucket_seconds=60).collect()[0]
    # all tied: S = 0, one tie group of 4, var = (4*3*13 - 4*3*13)/18 = 0
    assert (r.s_stat, r.n_tie_groups, r.var_s) == (0, 1, 0.0)
    assert r.z is None  # degenerate variance


def test_mann_kendall_zero_fill_and_validation(spark):
    import pytest as _pytest

    from orientdb_etl_spark.functions.stats import mann_kendall

    # events at minutes 0 and 2 only: minute 1 zero-fills
    df = _minute_events(spark, {"e": [2, 0, 1]})
    r = mann_kendall(df, "ts", bucket_seconds=60).collect()[0]
    # series [2, 0, 1]: pairs (2,0)-1 (2,1)-1 (0,1)+1 -> S = -1
    assert (r.n_buckets, r.s_stat) == (3, -1)
    one = _minute_events(spark, {"e": [4]})
    with _pytest.raises(ValueError, match="at least 2 buckets"):
        mann_kendall(one, "ts", bucket_seconds=60)


# ---------- max_drawdown ----------


def test_max_drawdown_hand_computed(spark):
    from orientdb_etl_spark.functions.stats import max_drawdown

    df = spark.createDataFrame(
        [
            # key a: 10 -> 30 -> 20 -> 25 -> 5 : peak 30, max dd 30-5=25
            ("a", 1, 10.0),
            ("a", 2, 30.0),
            ("a", 3, 20.0),
            ("a", 4, 25.0),
            ("a", 5, 5.0),
            # key b monotone rising: dd 0
            ("b", 1, 1.0),
            ("b", 2, 2.0),
            ("b", 3, 3.0),
        ],
        "k string, ts int, v double",
    )
    out = {
        r["k"]: r
        for r in max_drawdown(df, "k", "ts", "v").collect()
    }
    assert out["a"]["max_drawdown"] == 25.0
    assert out["a"]["peak"] == 30.0
    assert out["a"]["n_points"] == 5
    assert out["b"]["max_drawdown"] == 0.0


def test_max_drawdown_tiebreak_deterministic(spark):
    from orientdb_etl_spark.functions.stats import max_drawdown

    # two rows share ts=2; tiebreak id orders 100-valued row FIRST, so
    # the 40-valued row sees peak 100 -> dd 60
    df = spark.createDataFrame(
        [("a", 1, 1, 50.0), ("a", 2, 2, 100.0), ("a", 2, 3, 40.0)],
        "k string, ts int, id int, v double",
    )
    (row,) = max_drawdown(df, "k", "ts", "v", tiebreak="id").collect()
    assert row["max_drawdown"] == 60.0
    # nulls dropped
    df2 = df.union(
        spark.createDataFrame([("a", None, 9, 1.0)], df.schema)
    )
    (row2,) = max_drawdown(df2, "k", "ts", "v", tiebreak="id").collect()
    assert row2["n_points"] == 3


# ---------- proportion_ci ----------


def test_proportion_ci_wilson_hand_computed(spark):
    import math

    from orientdb_etl_spark.functions.stats import proportion_ci

    # g: 3 successes of 4 -> p=0.75, z=1.959964
    rows = [("g", True)] * 3 + [("g", False)]
    df = spark.createDataFrame(rows, "grp string, ok boolean")
    (r,) = proportion_ci(df, "grp", "ok").collect()
    z = 1.959964
    n, p = 4.0, 0.75
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert r["n"] == 4 and r["n_success"] == 3
    assert abs(r["p_hat"] - 0.75) < 1e-9
    assert abs(r["ci_lo"] - round(center - half, 6)) < 1e-9
    assert abs(r["ci_hi"] - round(center + half, 6)) < 1e-9
    # interval stays inside [0, 1] even at p_hat = 1
    df2 = spark.createDataFrame([("h", True)] * 3, "grp string, ok boolean")
    (r2,) = proportion_ci(df2, "grp", "ok").collect()
    assert 0.0 <= r2["ci_lo"] <= r2["ci_hi"] <= 1.0


# ---------- seasonal_decompose ----------


def test_seasonal_decompose_recovers_pure_seasonal(spark):
    from orientdb_etl_spark.functions.stats import seasonal_decompose

    # 6 days of hourly arrivals with a pure period-4 pattern (counts
    # 1,2,3,2 repeating) built by emitting that many events per hour
    rows = []
    pat = [1, 2, 3, 2]
    for t in range(96):
        for _ in range(pat[t % 4]):
            rows.append((t * 3600,))
    df = spark.createDataFrame(rows, "es bigint").selectExpr(
        "CAST(from_unixtime(es) AS timestamp) AS ts"
    )
    out = seasonal_decompose(df, "ts", 3600, 4).orderBy("bucket_start")
    got = out.collect()
    assert len(got) == 96
    mid = [r for r in got if r["trend"] is not None]
    # centered MA of a pure periodic series is flat = mean(pattern) = 2
    assert all(abs(r["trend"] - 2.0) < 1e-6 for r in mid)
    # seasonal effects recover the centered pattern: -1, 0, +1, 0
    want = {0: -1.0, 1: 0.0, 2: 1.0, 3: 0.0}
    for r in mid:
        assert abs(r["seasonal"] - want[r["phase"]]) < 1e-6
        assert abs(r["remainder"]) < 1e-6
    # edges (first/last half-window) carry NULL trend, never fake values
    assert got[0]["trend"] is None and got[-1]["trend"] is None


def test_seasonal_decompose_validation(spark):
    import pytest as _pt

    from orientdb_etl_spark.functions.stats import seasonal_decompose

    df = spark.createDataFrame([(None,)], "ts timestamp")
    with _pt.raises(ValueError, match="period"):
        seasonal_decompose(df, "ts", 3600, 1)
    with _pt.raises(ValueError, match="no non-null"):
        seasonal_decompose(df, "ts", 3600, 4)


def test_forecast_backtest_known_series(spark):
    """Perfectly periodic series: seasonal naive is EXACT (mae=0,
    mase=0) while naive pays the step cost every bucket; gap buckets
    zero-fill into the spine; evaluation starts after one season."""
    from orientdb_etl_spark.functions.stats import forecast_backtest

    pat = [10.0, 20.0, 30.0]
    rows = [
        ("k", t * 3600, pat[t % 3])
        for t in range(12)
        if t != 7  # dropped bucket -> zero-filled, breaks periodicity
    ]
    df = spark.createDataFrame(rows, "k string, es bigint, v double").selectExpr(
        "k", "CAST(from_unixtime(es) AS timestamp) AS ts", "v"
    )
    out = forecast_backtest(df, "k", "ts", "v", 3600, season=3)
    got = {r["model"]: r for r in out.collect()}
    assert set(got) == {"naive", "seasonal_naive"}
    # 12 buckets, eval on rn > 3 -> 9 rows; naive mase = 1 by construction
    assert got["naive"]["n_eval"] == 9
    assert got["naive"]["mase"] == 1.0
    # snaive errs ONLY where the zero-filled bucket breaks the cycle:
    # t=7 (forecast 20, actual 0) and t=10 (forecast 0, actual 20)
    assert abs(got["seasonal_naive"]["mae"] - (20.0 + 20.0) / 9) < 1e-6
    # naive |e| over t=3..11: 20+10+10+20+10+30+20+10+10 = 140
    assert abs(got["naive"]["mae"] - 140.0 / 9) < 1e-6
    ay = 10 + 20 + 30 + 10 + 0 + 30 + 10 + 20 + 30  # |y| over eval rows
    assert abs(got["naive"]["wape"] - 140.0 / ay) < 1e-6
    assert abs(got["seasonal_naive"]["mase"] - 40.0 / 140.0) < 1e-6


def test_forecast_backtest_validation(spark):
    import pytest as _pt

    from orientdb_etl_spark.functions.stats import forecast_backtest

    df = spark.createDataFrame([("k", None, 1.0)], "k string, ts timestamp, v double")
    with _pt.raises(ValueError, match="season"):
        forecast_backtest(df, "k", "ts", "v", season=0)


def test_contribution_analysis_decomposition(spark):
    """Per-dimension deltas partition the same global delta; shares sum
    to 1 within each dimension; members absent from one period
    zero-fill; NULL dim values drop."""
    from orientdb_etl_spark.functions.stats import contribution_analysis

    before = spark.createDataFrame(
        [("x", "p", 10.0), ("x", "q", 20.0), ("y", "p", 30.0), (None, "p", 99.0)],
        "d1 string, d2 string, v double",
    )
    after = spark.createDataFrame(
        [("x", "p", 5.0), ("z", "q", 25.0), ("y", "p", 30.0)],
        "d1 string, d2 string, v double",
    )
    out = contribution_analysis(before, after, ["d1", "d2"], "v", top_k=10)
    rows = out.collect()
    d1 = {r["value"]: r for r in rows if r["dimension"] == "d1"}
    # global delta (NULL-d1 excluded): 60 -> 60 => 0; shares undefined
    assert d1["x"]["before"] == 30.0 and d1["x"]["after"] == 5.0
    assert d1["x"]["delta"] == -25.0
    assert d1["z"]["before"] == 0.0 and d1["z"]["after"] == 25.0
    assert d1["y"]["delta"] == 0.0
    assert all(r["share_of_delta"] is None for r in d1.values())
    # d2 keeps the NULL-d1 row (it has a d2 value): p 139->35, q 20->25
    # so the d2 global delta is -104 + 5 = -99
    d2 = {r["value"]: r for r in rows if r["dimension"] == "d2"}
    assert d2["p"]["before"] == 139.0 and d2["p"]["after"] == 35.0
    assert abs(d2["p"]["share_of_delta"] - (-104.0 / -99.0)) < 1e-6
    assert abs(d2["q"]["share_of_delta"] - (5.0 / -99.0)) < 1e-6
    # ranked by |delta| within dimension
    assert d2["p"]["rank"] == 1 and d2["q"]["rank"] == 2


def test_srm_check_detects_mismatch(spark):
    from orientdb_etl_spark.functions.stats import srm_check

    import pytest as _pt

    df = spark.createDataFrame(
        [("A",)] * 70 + [("B",)] * 30, "arm string"
    )
    out = srm_check(df, "arm", {"A": 0.5, "B": 0.5}).collect()
    got = {r["arm"]: r for r in out}
    # chi2 = (70-50)^2/50 + (30-50)^2/50 = 16; dof 1 -> flagrant SRM
    assert got["A"]["n"] == 70 and got["A"]["expected_n"] == 50.0
    assert abs(got["A"]["chi2"] - 16.0) < 1e-9 and got["A"]["dof"] == 1
    # empty-but-designed arm still contributes its expected count
    out2 = srm_check(df, "arm", {"A": 0.5, "B": 0.25, "C": 0.25}).collect()
    got2 = {r["arm"]: r for r in out2}
    assert got2["C"]["n"] == 0 and got2["C"]["expected_n"] == 25.0
    # unknown observed arm raises (that IS the incident)
    with _pt.raises(ValueError, match="not in the designed"):
        srm_check(df, "arm", {"A": 1.0})
    with _pt.raises(ValueError, match="sum to 1"):
        srm_check(df, "arm", {"A": 0.5, "B": 0.3})


# ------------------------------------------------------------ Wasserstein


def test_wasserstein_shift_and_identity(spark):
    from orientdb_etl_spark.functions.stats import wasserstein_1d

    # a shifted distribution's W1 equals the shift
    rows = [("a", float(v)) for v in (0, 1, 2, 3)] + [
        ("b", float(v) + 2.5) for v in (0, 1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.w1) == (4, 4, 2.5)
    same = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("a", 9.0), ("b", 9.0)], "g string, v double"
    )
    assert wasserstein_1d(same, "g", "v", "a", "b").collect()[0].w1 == 0.0


def test_wasserstein_matches_scipy_style_reference(spark):
    import random

    from orientdb_etl_spark.functions.stats import wasserstein_1d

    rng = random.Random(3)
    # quarter-grid values are exact at scale=100, so the float reference
    # and the quantized BIGINT path see identical numbers
    xs = [rng.randrange(0, 200) / 4.0 for _ in range(80)]
    ys = [rng.randrange(40, 280) / 4.0 for _ in range(50)]

    def w1_ref(u, v):
        # integral of |F_u - F_v| over the merged support
        pts = sorted(set(u) | set(v))
        su, sv = sorted(u), sorted(v)
        import bisect

        tot = 0.0
        for lo, hi in zip(pts, pts[1:]):
            fu = bisect.bisect_right(su, lo) / len(su)
            fv = bisect.bisect_right(sv, lo) / len(sv)
            tot += abs(fu - fv) * (hi - lo)
        return tot

    rows = [("a", x) for x in xs] + [("b", y) for y in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    got = wasserstein_1d(df, "g", "v", "a", "b").collect()[0].w1
    assert abs(got - w1_ref(xs, ys)) < 1e-6


def test_group_trend_asymmetric_nulls_one_population(spark):
    """Round-6 review: every moment must see only complete (x, y) pairs —
    a huge x with NULL y used to inflate var(x) and crush the slope."""
    from orientdb_etl_spark.functions.stats import group_trend

    rows = [("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 3.0, 3.0),
            ("g", 100.0, None)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = group_trend(df, ["g"], "x", "y").collect()[0]
    assert r.n == 3 and r.slope == 1.0 and r.intercept == 0.0 and r.r2 == 1.0


def test_psi_constant_reference_raises(spark):
    import pytest

    from orientdb_etl_spark.functions.stats import psi

    ref = spark.createDataFrame([(42.0,)] * 5, "v double")
    cur = spark.createDataFrame([(1000.0,), (-5.0,)], "v double")
    with pytest.raises(ValueError, match="constant"):
        psi(ref, cur, "v")


def test_srm_zero_share_arm_with_observations_raises(spark):
    import pytest

    from orientdb_etl_spark.functions.stats import srm_check

    df = spark.createDataFrame(
        [("control",)] * 10 + [("holdout",)] * 3, "arm string"
    )
    with pytest.raises(ValueError, match="expected_share 0"):
        srm_check(df, "arm", {"control": 1.0, "holdout": 0.0})
    # an EMPTY zero-share arm is fine (it is simply absent)
    ok = srm_check(
        spark.createDataFrame([("control",)] * 10, "arm string"),
        "arm",
        {"control": 1.0, "holdout": 0.0},
    )
    assert ok.count() == 2


def test_wasserstein_identical_single_value_is_zero(spark):
    from orientdb_etl_spark.functions.stats import wasserstein_1d

    df = spark.createDataFrame(
        [("a", 7.0)] * 4 + [("b", 7.0)] * 3, "g string, v double"
    )
    r = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.w1) == (4, 3, 0.0)


def test_changepoint_overflow_guard_exact_sum():
    # the guard is on the EXACT sum(x²) now: one hot bucket among many
    # small ones passes even though the old worst-case n·max² bound
    # would have rejected the same (valid) input
    n_buckets, mx = 10**5, 10**7
    assert n_buckets * mx * mx > (1 << 62)  # old conservative bound: raise
    exact = mx * mx + (n_buckets - 1) * 1  # the actual series' sum(x²)
    assert exact <= (1 << 62)  # new exact guard: pass
