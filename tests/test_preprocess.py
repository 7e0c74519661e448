"""Numeric prep: imputation and standardization (scalar-attach shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orientdb_etl_spark.functions.preprocess import impute, standardize


def test_impute_mean_median_constant(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", None),
         (4, "b", 100.0), (5, "b", None)],
        "id long, g string, v double",
    )
    mean = {r.id: r.v for r in impute(df, ["v"], "mean", by="g").collect()}
    assert mean[3] == 15.0 and mean[5] == 100.0
    med = {r.id: r.v for r in impute(df, ["v"], "median", by="g").collect()}
    assert med[3] == 15.0  # exact interpolated median of {10, 20}
    const = {r.id: r.v for r in impute(df, ["v"], -1).collect()}
    assert const[3] == -1.0 and const[5] == -1.0 and const[1] == 10.0
    with pytest.raises(ValueError, match="strategy"):
        impute(df, ["v"], "mode")


def test_impute_all_null_group_stays_null(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", None), (3, "b", 5.0)],
        "id long, g string, v double",
    )
    got = {r.id: r.v for r in impute(df, ["v"], "mean", by="g").collect()}
    assert got[1] is None and got[2] is None  # no invented data
    assert got[3] == 5.0


def test_standardize_known_z_and_zero_variance(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
         (4, "c", 7.0), (5, "c", 7.0)],
        "id long, g string, v double",
    )
    got = {r.id: r.v_z for r in standardize(df, ["v"], by="g").collect()}
    # group a: mean 20, sample sd 10 -> z = -1, 0, 1
    assert got[1] == -1.0 and got[2] == 0.0 and got[3] == 1.0
    # constant group: no z-score, not infinities
    assert got[4] is None and got[5] is None


def test_standardize_plan_is_broadcast_attach(spark):
    df = spark.range(1000).selectExpr("id % 5 AS g", "CAST(id AS DOUBLE) AS v")
    plan = standardize(df, ["v"], by="g")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# quantile_map
# ---------------------------------------------------------------------------


def test_quantile_map_identity_on_reference_group(spark):
    from pyspark.sql import functions as F

    from orientdb_etl_spark.functions.preprocess import quantile_map

    # reference group mapped onto itself must reproduce its own values
    # (n_q large enough that each value owns a bucket)
    rows = [("ref", float(v)) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_map(df, "g", "v", "ref", n_q=100, out_col="m")
    assert all(r.m == r.v for r in out.collect())


def test_quantile_map_shifts_distribution_onto_reference(spark):
    from orientdb_etl_spark.functions.preprocess import quantile_map

    # group b = group a + 100: after mapping, b's values equal a's
    rows = [("a", float(v)) for v in range(20)] + [
        ("b", float(v) + 100.0) for v in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_map(df, "g", "v", "a", n_q=100, out_col="m")
    got = sorted(r.m for r in out.where("g = 'b'").collect())
    assert got == sorted(float(v) for v in range(20))


def test_quantile_map_nulls_pass_through(spark):
    from orientdb_etl_spark.functions.preprocess import quantile_map

    rows = [("a", 1.0), ("a", 2.0), ("b", None), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_map(df, "g", "v", "a", n_q=10, out_col="m").collect()
    bynull = {r.v: r.m for r in out if r.g == "b"}
    assert bynull[None] is None
    # b's only non-null value has percent_rank 0 -> maps to a's minimum,
    # and the null row did NOT shift that rank
    assert bynull[5.0] == 1.0


def test_quantile_map_validation(spark):
    import pytest as _pytest

    from orientdb_etl_spark.functions.preprocess import quantile_map

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with _pytest.raises(ValueError, match="n_q"):
        quantile_map(df, "g", "v", "a", n_q=0)


# ---------------------------------------------------------------------------
# target_encode
# ---------------------------------------------------------------------------


def test_target_encode_smoothed_shrinks_rare_to_prior(spark):
    from orientdb_etl_spark.functions.preprocess import target_encode

    # 'big' has 10 rows at mean 1.0; 'rare' has 1 row at 100.0;
    # prior = (10*1 + 100)/11 = 10.0
    rows = [("big", 1.0)] * 10 + [("rare", 100.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    got = {
        r.c: r.encoded
        for r in target_encode(df, "c", "y", smoothing=20.0).collect()
    }
    prior = 10.0
    assert got["big"] == round((10 * 1.0 + 20 * prior) / 30, 6)
    # the rare category lands close to the prior, far from its own 100
    assert abs(got["rare"] - (100 + 20 * prior) / 21) < 1e-6  # 6dp rounding
    assert abs(got["rare"] - prior) < abs(100.0 - prior) / 4


def test_target_encode_loo_excludes_own_row(spark):
    from orientdb_etl_spark.functions.preprocess import target_encode

    rows = [("a", 1.0), ("a", 3.0), ("a", 5.0), ("solo", 7.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    got = [
        (r.c, r.y, r.encoded)
        for r in target_encode(df, "c", "y", method="loo")
        .orderBy("c", "y")
        .collect()
    ]
    # each 'a' row sees the mean of the OTHER two
    assert got[0] == ("a", 1.0, 4.0)
    assert got[1] == ("a", 3.0, 3.0)
    assert got[2] == ("a", 5.0, 2.0)
    assert got[3][2] is None  # singleton has no peers


def test_target_encode_nulls_inert(spark):
    from orientdb_etl_spark.functions.preprocess import target_encode

    rows = [("a", 2.0), ("a", None), (None, 9.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = target_encode(df, "c", "y", smoothing=0.0).collect()
    by = {(r.c, r.y): r.encoded for r in out}
    assert by[("a", 2.0)] == 2.0  # null target did not dilute the mean
    assert by[("a", None)] is None
    assert by[(None, 9.0)] is None


# ---------------------------------------------------------------------------
# woe_iv / best_split


def test_woe_iv_hand_case(spark):
    import math

    from orientdb_etl_spark.functions.preprocess import woe_iv

    # cat A: 3 pos / 1 neg; cat B: 1 pos / 3 neg
    rows = [("A", 1)] * 3 + [("A", 0)] + [("B", 1)] + [("B", 0)] * 3
    df = spark.createDataFrame(rows, "f string, y int")
    out = {r.f: r for r in woe_iv(df, "f", "y").collect()}
    tp, tn, k, s = 4, 4, 2, 0.5
    dp_a, dn_a = (3 + s) / (tp + s * k), (1 + s) / (tn + s * k)
    woe_a = math.log(dp_a / dn_a)
    assert out["A"].woe == round(woe_a, 6)
    assert out["A"].iv_contrib == round((dp_a - dn_a) * woe_a, 6)
    # symmetric construction: B mirrors A
    assert out["B"].woe == round(-woe_a, 6)
    assert out["A"].iv_total == out["B"].iv_total
    assert out["A"].iv_total > 0


def test_woe_iv_one_sided_category_finite(spark):
    from orientdb_etl_spark.functions.preprocess import woe_iv

    rows = [("A", 1)] * 5 + [("B", 0)] * 5
    df = spark.createDataFrame(rows, "f string, y int")
    out = woe_iv(df, "f", "y").collect()
    assert all(r.woe is not None for r in out)  # smoothing keeps it finite


def test_best_split_perfectly_separable(spark):
    from orientdb_etl_spark.functions.preprocess import best_split

    rows = [(float(v), 0) for v in range(10)] + [
        (float(v), 1) for v in range(10, 20)
    ]
    df = spark.createDataFrame(rows, "x double, y int")
    r = best_split(df, "x", "y").collect()[0]
    assert r.split_value == 9.0  # x <= 9 is pure-negative
    assert r.gini_split == 0.0
    assert r.gain == r.gini_parent == 0.5
    assert (r.n_left, r.n_right) == (10, 10)


def test_best_split_tie_breaks_to_smallest_threshold(spark):
    from orientdb_etl_spark.functions.preprocess import best_split

    # constant label: every split has impurity 0; smallest v must win
    rows = [(float(v), 1) for v in range(5)]
    df = spark.createDataFrame(rows, "x double, y int")
    r = best_split(df, "x", "y").collect()[0]
    assert r.split_value == 0.0 and r.gini_parent == 0.0


# ---------------------------------------------------------- feature hash


def test_feature_hash_shape_and_determinism(spark):
    from orientdb_etl_spark.functions.preprocess import feature_hash

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "x y"), (3, "")], "doc_id bigint, text string"
    )
    out = {r.id: list(r.features)
           for r in feature_hash(docs, "text", "doc_id", dims=16).collect()}
    assert set(out) == {1, 2}  # empty doc yields no tokens -> no row
    assert all(len(v) == 16 for v in out.values())
    # total absolute mass <= token count (signed collisions can cancel)
    assert sum(abs(x) for x in out[1]) <= 4
    # repartitioning never changes the vectors
    out2 = {r.id: list(r.features)
            for r in feature_hash(
                docs.repartition(5), "text", "doc_id", dims=16).collect()}
    assert out == out2


def test_feature_hash_unsigned_counts(spark):
    from orientdb_etl_spark.functions.preprocess import feature_hash

    docs = spark.createDataFrame([(1, "w w w")], "doc_id bigint, text string")
    v = feature_hash(docs, "text", "doc_id", dims=8, signed=False).collect()[0]
    assert sum(v.features) == 3 and max(v.features) == 3


def test_feature_hash_portable_matches_duckdb_recipe(spark):
    import duckdb

    from orientdb_etl_spark.functions.preprocess import feature_hash

    docs = spark.createDataFrame(
        [(i, f"tok{i} shared word{i % 3}") for i in range(20)],
        "doc_id bigint, text string",
    )
    got = {r.id: list(r.features)
           for r in feature_hash(
               docs, "text", "doc_id", dims=8, portable=True).collect()}
    rows = ", ".join(
        f"({i}, 'tok{i} shared word{i % 3}')" for i in range(20)
    )
    want = dict(duckdb.sql(
        "WITH d(doc_id, text) AS (VALUES " + rows + "), "
        "tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM d), "
        "hs AS (SELECT doc_id, list_reduce(list_prepend(CAST(11 AS BIGINT), "
        "list_transform(range(1, length(tok) + 1), "
        "i -> CAST(ascii(tok[CAST(i AS INT)]) AS BIGINT))), "
        "(a, c) -> (a * 31 + c) % 4294967291) AS h FROM tk WHERE tok <> ''), "
        "pd AS (SELECT doc_id, CAST(h % 8 AS INT) AS dd, "
        "CAST(sum(CASE WHEN (h // 8) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS w "
        "FROM hs GROUP BY 1, 2), "
        "g AS (SELECT doc_id, unnest(range(0, 8)) AS dd FROM "
        "(SELECT DISTINCT doc_id FROM pd)), "
        "fl AS (SELECT g.doc_id, g.dd, CAST(coalesce(pd.w, 0) AS BIGINT) AS w "
        "FROM g LEFT JOIN pd ON pd.doc_id = g.doc_id AND pd.dd = g.dd) "
        "SELECT doc_id, list(w ORDER BY dd) FROM fl GROUP BY doc_id"
    ).fetchall())
    assert got == {k: list(v) for k, v in want.items()}


def test_grouped_attach_ops_keep_null_group(spark):
    """Round-6 null-safe-attach sweep: impute/standardize/winsorize/
    temperature_sample/theil_sen must keep NULL-group rows (NULL is its
    own class under groupBy) instead of silently dropping them at the
    stats join-back."""
    import pyspark.sql.functions as F

    from orientdb_etl_spark.functions.preprocess import impute, standardize
    from orientdb_etl_spark.functions.sampling import winsorize

    rows = [(None, 1.0), (None, 3.0), (None, None), ("a", 10.0), ("a", 20.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    # impute: NULL-group missing value filled with ITS group's mean (2.0)
    out = impute(df, ["v"], strategy="mean", by="g")
    got = [(r.g, r.v) for r in out.collect()]
    assert (None, 2.0) in got and len(got) == 5
    # standardize: all 5 rows survive
    assert standardize(df, ["v"], by="g").count() == 5
    # winsorize: all 5 rows survive
    assert winsorize(df, "v", by="g", lower=0.0, upper=1.0).count() == 5

    from orientdb_etl_spark.functions.stats import theil_sen

    srows = [(g, float(t), float(2 * t)) for g in (None, "a") for t in range(5)]
    sdf = spark.createDataFrame(srows, "g string, x double, y double")
    slopes = {r["g"]: r["ts_slope"] for r in theil_sen(sdf, "g", "x", "y").collect()}
    assert slopes.get(None) == 2.0 and slopes.get("a") == 2.0
