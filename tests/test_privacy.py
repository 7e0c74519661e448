"""k-anonymity / l-diversity audit (functions/privacy.py)."""

from __future__ import annotations

import pytest


def test_k_anonymity_classes_and_flags(spark):
    from orientdb_etl_spark.functions.privacy import k_anonymity_audit

    df = spark.createDataFrame(
        [
            # class (10, "A"): 3 rows, sensitive {x, x, y} -> l=2
            (10, "A", "x"),
            (10, "A", "x"),
            (10, "A", "y"),
            # class (10, "B"): 1 row -> k-violation at k=2; l=1 violation
            (10, "B", "x"),
            # class (NULL, "A"): NULL quasi forms its own class
            (None, "A", "z"),
        ],
        "zip int, seg string, diag string",
    )
    out = {
        (r["zip"], r["seg"]): r
        for r in k_anonymity_audit(
            df, ["zip", "seg"], k=2, sensitive_col="diag"
        ).collect()
    }
    assert out[(10, "A")]["n_rows"] == 3
    assert out[(10, "A")]["n_sensitive"] == 2
    assert not out[(10, "A")]["k_violation"]
    assert not out[(10, "A")]["l_violation"]
    assert out[(10, "B")]["k_violation"] and out[(10, "B")]["l_violation"]
    assert (None, "A") in out  # NULL is a class, not dropped


def test_k_anonymity_violations_only_and_no_sensitive(spark):
    from orientdb_etl_spark.functions.privacy import k_anonymity_audit

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "q int, s string"
    )
    v = k_anonymity_audit(df, ["q"], k=2, violations_only=True).collect()
    assert [r["q"] for r in v] == [2]
    assert "n_sensitive" not in v[0].asDict()
    with pytest.raises(ValueError, match="quasi"):
        k_anonymity_audit(df, [], k=2)
    with pytest.raises(ValueError, match="k must"):
        k_anonymity_audit(df, ["q"], k=0)


def test_k_anonymity_transformer_registered(spark):
    from orientdb_etl_spark.context import PipelineContext
    from orientdb_etl_spark.operators import apply_transformer

    df = spark.createDataFrame(
        [(1, "a", "s1"), (1, "a", "s2"), (2, "b", "s1")],
        "zip int, seg string, diag string",
    )
    ctx = PipelineContext(spark)
    out = apply_transformer(
        ctx,
        df,
        "kAnonymity",
        {
            "quasi": ["zip", "seg"],
            "k": 2,
            "sensitiveField": "diag",
            "violationsOnly": True,
        },
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["zip"] == 2


def test_erasure_audit_counts_and_certificate(spark):
    from orientdb_etl_spark.functions.privacy import erasure_audit

    users = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "uid int, name string"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 4)], "oid int, uid int"
    )
    subjects = users.where("uid <= 2")
    out = erasure_audit(
        subjects, "uid", {"users": (users, "uid"), "orders": (orders, "uid")}
    )
    got = {r["table_name"]: r for r in out.collect()}
    assert got["users"]["n_rows_affected"] == 2
    assert got["users"]["n_subjects_present"] == 2
    assert got["orders"]["n_rows_affected"] == 3  # uid 1 twice + uid 2
    assert got["orders"]["n_subjects_present"] == 2
    # completion certificate: after the deletion anti-joins, all zeros
    users2 = users.join(subjects.select("uid"), "uid", "left_anti")
    orders2 = orders.join(subjects.select("uid"), "uid", "left_anti")
    post = erasure_audit(
        subjects, "uid", {"users": (users2, "uid"), "orders": (orders2, "uid")}
    )
    assert all(
        r["n_rows_affected"] == 0 and r["n_subjects_present"] == 0
        for r in post.collect()
    )
    # the subject set rides a broadcast join — fact tables never shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_erasure_audit_validation(spark):
    import pytest as _pt

    from orientdb_etl_spark.functions.privacy import erasure_audit

    df = spark.createDataFrame([(1,)], "uid int")
    with _pt.raises(ValueError, match="at least one table"):
        erasure_audit(df, "uid", {})


# ------------------------------------------------------------ t-closeness


def test_t_closeness_hand_computed(spark):
    from orientdb_etl_spark.functions.privacy import t_closeness_audit

    # global: v=0 x4, v=1 x4 (N=8, m=2). class A all v=0 -> EMD = 0.5;
    # class B balanced 2/2 -> EMD = 0
    rows = [("A", 0)] * 4 + [("B", 0)] * 0 + [("B", 0), ("B", 0)] * 0
    rows = [("A", 0)] * 4 + [("B", 0), ("B", 0), ("B", 1), ("B", 1)]
    # adjust globals: A has 4x v0; B has 2x v0 + 2x v1 -> global 6x v0, 2x v1
    df = spark.createDataFrame(rows, "q string, v bigint")
    out = {r.q: (r.n_rows, r.t_emd, r.t_violation)
           for r in t_closeness_audit(df, ["q"], "v", t=0.2).collect()}
    # N=8, gv0=6, gv1=2, m=2. A: cum_c=4, cum_g=6, |4*8-6*4|=8 ->
    # emd = 8/(8*4*1) = 0.25. B: |2*8-6*4| = 8 -> emd = 8/(8*4*1) = 0.25
    assert out["A"] == (4, 0.25, True)
    assert out["B"] == (4, 0.25, True)


def test_t_closeness_identical_distribution_is_zero(spark):
    from orientdb_etl_spark.functions.privacy import t_closeness_audit

    rows = [(q, v) for q in ("A", "B") for v in (0, 1, 2) for _ in range(5)]
    df = spark.createDataFrame(rows, "q string, v bigint")
    for r in t_closeness_audit(df, ["q"], "v", t=0.05).collect():
        assert r.t_emd == 0.0 and not r.t_violation


def test_t_closeness_validates_params(spark):
    import pytest

    from orientdb_etl_spark.functions.privacy import t_closeness_audit

    df = spark.createDataFrame([("A", 1)], "q string, v bigint")
    with pytest.raises(ValueError):
        t_closeness_audit(df, [], "v")
    with pytest.raises(ValueError):
        t_closeness_audit(df, ["q"], "v", t=0.0)

def test_t_closeness_null_quasi_class_gets_real_distribution(spark):
    """A NULL quasi value is its own equivalence class (the documented
    k_anonymity semantics) — its class×value counts must attach through
    the NULL-SAFE join, not coalesce to zero (which produced EMD > 1
    and a spurious violation before round 6)."""
    from orientdb_etl_spark.functions.privacy import t_closeness_audit

    rows = (
        [(None, 0), (None, 0), (None, 1), (None, 1)]
        + [("A", 0), ("A", 0), ("A", 1), ("A", 1)]
    )
    df = spark.createDataFrame(rows, "q string, v bigint")
    out = {
        r.q: (r.n_rows, r.t_emd, r.t_violation)
        for r in t_closeness_audit(df, ["q"], "v", t=0.2).collect()
    }
    # both classes mirror the global 50/50 split exactly -> EMD 0
    assert out[None] == (4, 0.0, False)
    assert out["A"] == (4, 0.0, False)
    # EMD is a normalized distance: never above 1 for any class
    skewed = df.union(
        spark.createDataFrame([(None, 0)] * 4, "q string, v bigint")
    )
    for r in t_closeness_audit(skewed, ["q"], "v", t=0.2).collect():
        assert 0.0 <= r.t_emd <= 1.0
