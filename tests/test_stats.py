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
