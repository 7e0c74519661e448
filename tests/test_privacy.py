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
