from __future__ import annotations

import pytest

from orientdb_etl_spark.functions.objectives import (
    span_corruption_plan,
    span_corruption_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_span_plan_bounds_and_rate(spark):
    text = " ".join(f"w{i}" for i in range(47))  # 2 full blocks + tail of 7
    df = _docs(spark, [(1, text)])
    plan = span_corruption_plan(df, "text", "doc_id", block=20, span_len=3).collect()
    assert len(plan) == 2
    for r in plan:
        # span stays inside its own block (offset < block - span_len + 1)
        assert r.start // 20 == r.span_id
        assert r.start % 20 <= 17
        assert r.length == 3
        assert r.span_text == f"w{r.start} w{r.start+1} w{r.start+2}"
    st = span_corruption_stats(df, "text", "doc_id", block=20, span_len=3).collect()[0]
    assert (st.n_tokens, st.n_spans, st.n_masked) == (47, 2, 6)
    assert st.mask_frac == round(6 / 47, 6)


def test_span_plan_deterministic_across_partitioning(spark):
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(25 + i))) for i in range(1, 30)]
    df = _docs(spark, rows)
    a = sorted(
        map(tuple, span_corruption_plan(df, "text", "doc_id").collect())
    )
    b = sorted(
        map(
            tuple,
            span_corruption_plan(df.repartition(7), "text", "doc_id").collect(),
        )
    )
    assert a == b and len(a) > 0


def test_span_plan_short_doc_yields_no_spans(spark):
    df = _docs(spark, [(1, "only five tokens right here")])
    assert span_corruption_plan(df, "text", "doc_id", block=20).count() == 0


def test_span_plan_validates_params(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        span_corruption_plan(df, "text", "doc_id", block=3, span_len=3)
    with pytest.raises(ValueError):
        span_corruption_stats(df, "text", "doc_id", block=5, span_len=0)


def test_preference_pairs_best_vs_worst_with_ties_and_margin(spark):
    from orientdb_etl_spark.functions.objectives import preference_pairs

    rows = [
        # prompt p1: clear winner r3 (9.0), loser r1 (1.0)
        ("p1", "r1", 1.0), ("p1", "r2", 5.0), ("p1", "r3", 9.0),
        # prompt p2: tied top (r1, r2 at 4.0) -> chosen = r1 (smaller id);
        # tied bottom (r3, r4 at 2.0) -> rejected = r3
        ("p2", "r1", 4.0), ("p2", "r2", 4.0),
        ("p2", "r3", 2.0), ("p2", "r4", 2.0),
        # prompt p3: margin 0.5 < min_margin -> dropped
        ("p3", "r1", 3.0), ("p3", "r2", 2.5),
        # prompt p4: single response -> chosen == rejected -> dropped
        ("p4", "r1", 7.0),
    ]
    df = spark.createDataFrame(rows, "p string, r string, s double")
    got = {
        row.prompt: row
        for row in preference_pairs(
            df, "p", "r", "s", min_margin=1.0
        ).collect()
    }
    assert set(got) == {"p1", "p2"}
    assert (got["p1"].chosen, got["p1"].rejected) == ("r3", "r1")
    assert got["p1"].margin == 8.0
    assert (got["p2"].chosen, got["p2"].rejected) == ("r1", "r3")
    assert got["p2"].chosen_score == 4.0 and got["p2"].rejected_score == 2.0
