from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from orientdb_etl_spark.operators.temporal import rfm_segments, transition_counts


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )


def _t(s):
    return datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# transition_counts
# ---------------------------------------------------------------------------


def test_transitions_counts_and_probs(spark):
    rows = [
        (1, _t("2026-01-01T00:00:00"), "view", 0.0),
        (1, _t("2026-01-01T00:01:00"), "cart", 0.0),
        (1, _t("2026-01-01T00:02:00"), "buy", 0.0),
        (2, _t("2026-01-01T00:00:00"), "view", 0.0),
        (2, _t("2026-01-01T00:01:00"), "view", 0.0),
        (2, _t("2026-01-01T00:02:00"), "cart", 0.0),
    ]
    out = {
        (r.from_state, r.to_state): (r.n, r.p)
        for r in transition_counts(
            _ev(spark, rows), "user_id", "event_type", "ts"
        ).collect()
    }
    assert out == {
        ("view", "cart"): (2, 0.666667),
        ("view", "view"): (1, 0.333333),
        ("cart", "buy"): (1, 1.0),
    }


def test_transitions_no_cross_sequence_steps(spark):
    # last event of user 1 must NOT chain into first event of user 2
    rows = [
        (1, _t("2026-01-01T00:00:00"), "a", 0.0),
        (2, _t("2026-01-01T00:01:00"), "b", 0.0),
    ]
    assert (
        transition_counts(_ev(spark, rows), "user_id", "event_type", "ts").count()
        == 0
    )


def test_transitions_tiebreak_orders_equal_timestamps(spark):
    t0 = _t("2026-01-01T00:00:00")
    df = spark.createDataFrame(
        [(1, t0, "a", 1), (1, t0, "b", 2), (1, t0, "c", 3)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    out = {
        (r.from_state, r.to_state)
        for r in transition_counts(
            df, "user_id", "event_type", "ts", tiebreak="event_id"
        ).collect()
    }
    assert out == {("a", "b"), ("b", "c")}


# ---------------------------------------------------------------------------
# rfm_segments
# ---------------------------------------------------------------------------


def test_rfm_scores_and_segment(spark):
    # 4 users with strictly increasing recency/frequency/monetary spread
    rows = []
    for u in range(1, 5):
        for j in range(u):  # frequency = u
            rows.append((u, _t(f"2026-01-0{u}T00:00:00"), "e", 10.0 * u))
    out = {r.entity: r for r in
           rfm_segments(_ev(spark, rows), "user_id", "ts", "value", k=2).collect()}
    # user 4: most recent, most frequent, highest spend -> best on all axes
    assert out[4].segment == "2-2-2"
    assert out[1].segment == "1-1-1"
    assert out[4].frequency == 4 and out[4].monetary == pytest.approx(160.0)
    # user with the latest event has recency 0
    assert out[4].recency_s == 0
    for r in out.values():
        assert r.segment == f"{r.r_score}-{r.f_score}-{r.m_score}"


def test_rfm_bucket_ties_share_a_bucket(spark):
    # all users identical -> every metric sits ON the quantile boundary,
    # ties go to the LOWER bucket in every engine
    rows = [(u, _t("2026-01-01T00:00:00"), "e", 5.0) for u in (1, 2, 3)]
    segs = {r.segment for r in
            rfm_segments(_ev(spark, rows), "user_id", "ts", "value", k=2).collect()}
    assert segs == {"2-1-1"}  # recency 0 = best bucket; freq/monetary tie low


def test_rfm_transformer(spark):
    from orientdb_etl_spark import Pipeline

    rows = [
        (1, _t("2026-01-01T00:00:00"), "e", 1.0),
        (2, _t("2026-01-02T00:00:00"), "e", 2.0),
    ]
    p = Pipeline(
        {
            "extractor": {"table": {"name": "t"}},
            "transformers": [
                {"rfm": {"idField": "user_id", "on": "ts",
                         "valueField": "value", "k": 2}}
            ],
            "loader": {"memory": {"view": "res"}},
        },
        spark=spark,
    ).register_table("t", _ev(spark, rows))
    assert p.run().outputs["res"].count() == 2


def test_transitions_transformer(spark):
    from orientdb_etl_spark import Pipeline

    rows = [
        (1, _t("2026-01-01T00:00:00"), "a", 0.0),
        (1, _t("2026-01-01T00:01:00"), "b", 0.0),
    ]
    p = Pipeline(
        {
            "extractor": {"table": {"name": "t"}},
            "transformers": [
                {"transitions": {"by": "user_id", "stateField": "event_type",
                                 "on": "ts"}}
            ],
            "loader": {"memory": {"view": "res"}},
        },
        spark=spark,
    ).register_table("t", _ev(spark, rows))
    got = p.run().outputs["res"].collect()
    assert len(got) == 1 and got[0].p == 1.0


# ---------------------------------------------------------------------------
# conversion_lag
# ---------------------------------------------------------------------------


def test_conversion_lag_first_to_first_after(spark):
    rows = [
        (1, _t("2026-01-01T00:00:00"), "view", 0.0),
        (1, _t("2026-01-01T00:00:30"), "view", 0.0),    # later view ignored
        (1, _t("2026-01-01T00:02:00"), "purchase", 0.0),
        (1, _t("2026-01-01T00:05:00"), "purchase", 0.0),  # later buy ignored
        (2, _t("2026-01-01T00:01:00"), "purchase", 0.0),  # buy BEFORE any view
        (2, _t("2026-01-01T00:02:00"), "view", 0.0),
        (3, _t("2026-01-01T00:00:00"), "view", 0.0),      # never converts
    ]
    from orientdb_etl_spark.operators.temporal import conversion_lag

    out = {r.entity: r for r in conversion_lag(
        _ev(spark, rows), "user_id", "ts", "event_type", "view", "purchase"
    ).collect()}
    assert set(out) == {1}
    assert out[1].lag_s == 120


def test_conversion_lag_same_second_not_after(spark):
    t0 = _t("2026-01-01T00:00:00")
    rows = [(1, t0, "view", 0.0), (1, t0, "purchase", 0.0)]
    from orientdb_etl_spark.operators.temporal import conversion_lag

    assert conversion_lag(
        _ev(spark, rows), "user_id", "ts", "event_type", "view", "purchase"
    ).count() == 0


def test_conversion_lag_transformer(spark):
    from orientdb_etl_spark import Pipeline

    rows = [
        (1, _t("2026-01-01T00:00:00"), "view", 0.0),
        (1, _t("2026-01-01T00:00:45"), "purchase", 0.0),
    ]
    p = Pipeline(
        {
            "extractor": {"table": {"name": "t"}},
            "transformers": [
                {"conversionLag": {"userField": "user_id", "on": "ts",
                                   "typeField": "event_type",
                                   "from": "view", "to": "purchase"}}
            ],
            "loader": {"memory": {"view": "res"}},
        },
        spark=spark,
    ).register_table("t", _ev(spark, rows))
    got = p.run().outputs["res"].collect()
    assert len(got) == 1 and got[0].lag_s == 45


# ---------------------------------------------------------------------------
# top_paths
# ---------------------------------------------------------------------------


def test_top_paths_orders_and_truncates(spark):
    from orientdb_etl_spark.operators.temporal import top_paths

    rows = []
    for u in (1, 2):
        rows += [
            (u, _t("2026-01-01T00:00:00"), "view", 0.0),
            (u, _t("2026-01-01T00:01:00"), "click", 0.0),
            (u, _t("2026-01-01T00:02:00"), "buy", 0.0),
        ]
    rows += [
        (3, _t("2026-01-01T00:00:00"), "view", 0.0),
        (3, _t("2026-01-01T00:01:00"), "view", 0.0),
    ]
    out = [(r.path, r.n) for r in top_paths(
        _ev(spark, rows), "user_id", "ts", "event_type", max_len=2, k=10
    ).collect()]
    # max_len=2 truncates the 3-step journeys to their 2-step prefix
    assert out == [("view>click", 2), ("view>view", 1)]


def test_top_paths_k_boundary_tiebreaks_by_path(spark):
    from orientdb_etl_spark.operators.temporal import top_paths

    rows = [
        (1, _t("2026-01-01T00:00:00"), "b", 0.0),
        (2, _t("2026-01-01T00:00:00"), "a", 0.0),
    ]
    out = [r.path for r in top_paths(
        _ev(spark, rows), "user_id", "ts", "event_type", k=1
    ).collect()]
    assert out == ["a"]  # equal counts -> lexicographic path wins the cut


def test_top_paths_transformer(spark):
    from orientdb_etl_spark import Pipeline

    rows = [
        (1, _t("2026-01-01T00:00:00"), "x", 0.0),
        (1, _t("2026-01-01T00:01:00"), "y", 0.0),
    ]
    p = Pipeline(
        {
            "extractor": {"table": {"name": "t"}},
            "transformers": [
                {"topPaths": {"by": "user_id", "on": "ts",
                              "typeField": "event_type", "k": 5}}
            ],
            "loader": {"memory": {"view": "res"}},
        },
        spark=spark,
    ).register_table("t", _ev(spark, rows))
    got = p.run().outputs["res"].collect()
    assert len(got) == 1 and got[0].path == "x>y"


# ---------------------------------------------------------------------------
# holt_linear (Brown double smoothing)
# ---------------------------------------------------------------------------


def _holt_ref(xs, alpha, lookback, horizon=1):
    """Plain-python replay of the bounded-lookback double smoothing."""

    def sm(series, t):
        num = den = 0.0
        for i in range(lookback):
            j = t - i
            if j < 0 or series[j] is None:
                continue
            w = (1.0 - alpha) ** i
            num += series[j] * w
            den += w
        return num / den if den > 0 else None

    s1 = [sm(xs, t) for t in range(len(xs))]
    s2 = [sm(s1, t) for t in range(len(xs))]
    k = alpha / (1.0 - alpha)
    out = []
    for a, b in zip(s1, s2):
        if a is None or b is None:
            out.append((None, None, None))
        else:
            lvl, tr = 2.0 * a - b, k * (a - b)
            out.append((lvl, tr, lvl + horizon * tr))
    return out


def test_holt_matches_python_reference(spark):
    from orientdb_etl_spark.operators.temporal import holt_linear

    xs = [1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 8.0, 7.0, 9.0, 11.0]
    df = spark.createDataFrame(
        [("u", f"2024-01-01 00:{i:02d}:00", i, x) for i, x in enumerate(xs)],
        "k string, ts string, i long, v double",
    )
    rows = (
        holt_linear(df, "k", "ts", "v", alpha=0.3, lookback=8, tiebreak="i")
        .orderBy("i")
        .collect()
    )
    ref = _holt_ref(xs, 0.3, 8)
    for r, (lvl, tr, fc) in zip(rows, ref):
        assert abs(r.level - lvl) < 1e-9
        assert abs(r.trend - tr) < 1e-9
        assert abs(r.forecast - fc) < 1e-9


def test_holt_tracks_linear_trend(spark):
    from orientdb_etl_spark.operators.temporal import holt_linear

    # exact line y = 2t: once the lookback window is saturated the
    # one-step forecast must overshoot the level in the trend direction
    # and beat the level-only EWMA's lag
    df = spark.createDataFrame(
        [("u", f"2024-01-01 00:{i:02d}:00", i, 2.0 * i) for i in range(20)],
        "k string, ts string, i long, v double",
    )
    last = (
        holt_linear(df, "k", "ts", "v", alpha=0.5, lookback=8, tiebreak="i")
        .orderBy("i")
        .collect()[-1]
    )
    assert last.trend > 1.5  # close to the true slope 2
    assert last.forecast > last.level


def test_holt_alpha_validation(spark):
    import pytest as _pytest

    from orientdb_etl_spark.operators.temporal import holt_linear

    df = spark.createDataFrame([("u", "2024-01-01", 1, 1.0)],
                               "k string, ts string, i long, v double")
    with _pytest.raises(ValueError, match="alpha"):
        holt_linear(df, "k", "ts", "v", alpha=1.0)


# ---------------------------------------------------------------------------
# growth_accounting
# ---------------------------------------------------------------------------


def _activity(spark, pairs, bucket=100):
    # (user, period) pairs expressed as one event at period*bucket seconds
    rows = [(u, p * bucket) for u, p in pairs]
    return spark.createDataFrame(rows, "user_id bigint, es bigint").select(
        "user_id", F.timestamp_seconds(F.col("es")).alias("ts")
    )


def test_growth_accounting_classification(spark):
    from orientdb_etl_spark.operators.temporal import growth_accounting

    # p0: users 1,2 new. p1: 1 retained, 3 new; 2 churns.
    # p2: nobody.  (gap periods have no row)  p3: 2 resurrected, 1 res.
    pairs = [(1, 0), (2, 0), (1, 1), (3, 1), (1, 3), (2, 3)]
    rows = {
        r.period: r
        for r in growth_accounting(
            _activity(spark, pairs), "user_id", "ts", bucket_seconds=100
        ).collect()
    }
    p0, p1, p3 = rows[0], rows[1], rows[3]
    assert (p0.active, p0.new_users, p0.retained, p0.resurrected) == (2, 2, 0, 0)
    assert p0.churned is None
    assert (p1.active, p1.new_users, p1.retained, p1.resurrected) == (2, 1, 1, 0)
    assert p1.churned == 1  # user 2 left
    # period 2 has no activity -> no row; period 3 follows a gap:
    # nobody can be "retained", churn vs p2 is undefined (NULL)
    assert (p3.active, p3.new_users, p3.retained, p3.resurrected) == (2, 0, 0, 2)
    assert p3.churned is None


def test_growth_accounting_identity_holds(spark):
    import random

    from orientdb_etl_spark.operators.temporal import growth_accounting

    rng = random.Random(3)
    pairs = {(rng.randrange(30), rng.randrange(8)) for _ in range(120)}
    rows = growth_accounting(
        _activity(spark, sorted(pairs)), "user_id", "ts", bucket_seconds=100
    ).collect()
    for r in rows:
        assert r.active == r.new_users + r.retained + r.resurrected
        assert r.resurrected >= 0


# ---------------------------------------------------------------------------
# attribution
# ---------------------------------------------------------------------------


def _touch_conv(spark):
    # user 1: touches at t=0(email),100(ads),200(search); conv at 250 (w=300)
    # user 2: one touch at t=50(ads); conv at 100
    # user 3: touch OUTSIDE the window (conv 1000, touch at 100)
    touches = spark.createDataFrame(
        [
            (1, 0, "email", 10),
            (1, 100, "ads", 11),
            (1, 200, "search", 12),
            (2, 50, "ads", 20),
            (3, 100, "email", 30),
        ],
        "user_id bigint, es bigint, channel string, tid bigint",
    ).select("user_id", F.timestamp_seconds(F.col("es")).alias("ts"),
             "channel", "tid")
    conv = spark.createDataFrame(
        [(1, 250, 91), (2, 100, 92), (3, 1000, 93)],
        "user_id bigint, es bigint, cid bigint",
    ).select("user_id", F.timestamp_seconds(F.col("es")).alias("ts"), "cid")
    return touches, conv


def _run(spark, model):
    from orientdb_etl_spark.operators.temporal import attribution

    touches, conv = _touch_conv(spark)
    return {
        r.channel: (r.conversions_touched, r.credit)
        for r in attribution(
            touches, conv, "user_id", "ts", "channel", "cid", "ts",
            window_seconds=300, model=model, tiebreak="tid",
        ).collect()
    }


def test_attribution_linear(spark):
    got = _run(spark, "linear")
    # user1: 3 touches -> 1/3 each; user2: 1 touch -> 1.0; user3: none
    assert got["email"] == (1, round(1 / 3, 6))
    assert got["ads"] == (2, round(1 / 3 + 1.0, 6))
    assert got["search"] == (1, round(1 / 3, 6))


def test_attribution_first_and_last(spark):
    first = _run(spark, "first_touch")
    assert first["email"] == (1, 1.0)
    assert first["ads"] == (2, 1.0)   # 0 from user1 + 1.0 from user2
    assert first["search"] == (1, 0.0)
    last = _run(spark, "last_touch")
    assert last["search"] == (1, 1.0)
    assert last["ads"] == (2, 1.0)
    assert last["email"] == (1, 0.0)


def test_attribution_position_u_shape(spark):
    got = _run(spark, "position")
    # user1 k=3: email 0.4 (first), search 0.4 (last), ads 0.2; user2 k=1: ads 1.0
    assert got["email"] == (1, 0.4)
    assert got["search"] == (1, 0.4)
    assert got["ads"] == (2, 1.2)


def test_attribution_model_validation(spark):
    import pytest as _pytest

    from orientdb_etl_spark.operators.temporal import attribution

    touches, conv = _touch_conv(spark)
    with _pytest.raises(ValueError, match="model"):
        attribution(touches, conv, "user_id", "ts", "channel", "cid", "ts",
                    300, model="shapley")


# ---------------------------------------------------------------------------
# window_funnel
# ---------------------------------------------------------------------------


def test_window_funnel_enforces_order_and_deadline(spark):
    from orientdb_etl_spark.operators.temporal import window_funnel

    rows = [
        # user 1 completes all 3 inside the hour
        (1, _t("2026-01-01T00:00:00"), "view", 0.0),
        (1, _t("2026-01-01T00:10:00"), "click", 0.0),
        (1, _t("2026-01-01T00:20:00"), "buy", 0.0),
        # user 2: click BEFORE view -> stops at view
        (2, _t("2026-01-01T00:10:00"), "view", 0.0),
        (2, _t("2026-01-01T00:05:00"), "click", 0.0),
        # user 3: click after the 1h deadline from first view
        (3, _t("2026-01-01T00:00:00"), "view", 0.0),
        (3, _t("2026-01-01T01:30:00"), "click", 0.0),
        # user 4: buy exactly AT the deadline (inclusive)
        (4, _t("2026-01-01T00:00:00"), "view", 0.0),
        (4, _t("2026-01-01T00:30:00"), "click", 0.0),
        (4, _t("2026-01-01T01:00:00"), "buy", 0.0),
    ]
    row = window_funnel(
        _ev(spark, rows), ["view", "click", "buy"], 3600
    ).collect()[0]
    assert row.n1_view == 4
    assert row.n2_click == 2   # users 1 and 4
    assert row.n3_buy == 2     # user 4's buy at t+3600 is inclusive


def test_window_funnel_anchor_is_first_step_one(spark):
    from orientdb_etl_spark.operators.temporal import window_funnel

    # the documented trade-off: a LATER view would open a valid window,
    # but the anchor is the FIRST view, so the user does not convert
    rows = [
        (1, _t("2026-01-01T00:00:00"), "view", 0.0),
        (1, _t("2026-01-01T05:00:00"), "view", 0.0),
        (1, _t("2026-01-01T05:10:00"), "click", 0.0),
    ]
    row = window_funnel(_ev(spark, rows), ["view", "click"], 3600).collect()[0]
    assert (row.n1_view, row.n2_click) == (1, 0)


def test_window_funnel_validation(spark):
    from orientdb_etl_spark.operators.temporal import window_funnel

    with pytest.raises(ValueError, match="window_seconds"):
        window_funnel(_ev(spark, []), ["a"], 0)


# ---------------------------------------------------------------------------
# collapse_runs
# ---------------------------------------------------------------------------


def test_collapse_runs_basic(spark):
    from orientdb_etl_spark.operators.temporal import collapse_runs

    rows = [
        (1, _t("2026-01-01T00:00:00"), "ok", 0.0),
        (1, _t("2026-01-01T00:01:00"), "ok", 0.0),
        (1, _t("2026-01-01T00:02:00"), "err", 0.0),
        (1, _t("2026-01-01T00:03:00"), "ok", 0.0),   # ok again = NEW run
        (2, _t("2026-01-01T00:00:00"), "ok", 0.0),
    ]
    got = [
        (r.user_id, r.event_type, r.n_events)
        for r in collapse_runs(_ev(spark, rows), "user_id", "ts", "event_type")
        .orderBy("user_id", "start_es")
        .collect()
    ]
    assert got == [(1, "ok", 2), (1, "err", 1), (1, "ok", 1), (2, "ok", 1)]


def test_collapse_runs_null_states_form_runs(spark):
    from orientdb_etl_spark.operators.temporal import collapse_runs

    rows = [
        (1, _t("2026-01-01T00:00:00"), None, 0.0),
        (1, _t("2026-01-01T00:01:00"), None, 0.0),
        (1, _t("2026-01-01T00:02:00"), "a", 0.0),
    ]
    got = collapse_runs(_ev(spark, rows), "user_id", "ts", "event_type").collect()
    assert [(r.event_type, r.n_events) for r in got] == [(None, 2), ("a", 1)]


def test_collapse_runs_duration_bounds(spark):
    from orientdb_etl_spark.operators.temporal import collapse_runs

    rows = [
        (1, _t("2026-01-01T00:00:00"), "x", 0.0),
        (1, _t("2026-01-01T00:10:00"), "x", 0.0),
    ]
    r = collapse_runs(_ev(spark, rows), "user_id", "ts", "event_type").collect()[0]
    assert r.end_es - r.start_es == 600


# --------------------------------------------------------------- croston


def test_croston_hand_computed_single_key(spark):
    from orientdb_etl_spark.operators.temporal import croston

    # nonzero demands at t=0 (4), t=2 (6): gaps = [None, 2]
    # alpha=0.5, lookback=2 -> weights 1.0, 0.5
    # at the last row: z = (6*1 + 4*0.5)/1.5 = 16/3; p = 2 (only one gap)
    rows = [(1, 0, 4), (1, 1, 0), (1, 2, 6)]
    df = spark.createDataFrame(rows, "k int, t bigint, d int")
    r = croston(df, ["k"], "t", "d", alpha=0.5, lookback=2).collect()[0]
    assert r.n_demand_periods == 2
    assert r.size_level == round(16 / 3, 6)
    assert r.interval_level == 2.0
    assert r.forecast == round(16 / 3 / 2, 6)


def test_croston_zero_only_key_absent_and_validation(spark):
    import pytest

    from orientdb_etl_spark.operators.temporal import croston

    df = spark.createDataFrame(
        [(1, 0, 5), (2, 0, 0), (2, 1, 0)], "k int, t bigint, d int"
    )
    out = croston(df, ["k"], "t", "d").collect()
    assert [r.k for r in out] == [1]  # all-zero series has no forecast
    # single demand: no gap -> interval NULL -> forecast NULL
    assert out[0].interval_level is None and out[0].forecast is None
    with pytest.raises(ValueError):
        croston(df, ["k"], "t", "d", alpha=0)


# --------------------------------------------------------- stratified ATE


def test_stratified_ate_removes_composition_confounding(spark):
    from orientdb_etl_spark.functions.stats import stratified_ate

    # Within each stratum the true effect is +1. Treated rows are
    # over-represented in the high-outcome stratum, so the naive diff
    # is inflated; the stratified estimate recovers +1 exactly.
    rows = (
        [(True, 11.0, "hi")] * 30 + [(False, 10.0, "hi")] * 10
        + [(True, 2.0, "lo")] * 10 + [(False, 1.0, "lo")] * 30
    )
    df = spark.createDataFrame(rows, "treat boolean, y double, s string")
    r = stratified_ate(df, "treat", "y", "s").collect()[0]
    assert r.ate == 1.0
    assert r.naive_diff > 3.0  # confounded
    assert (r.n_strata, r.n_used_strata, r.n_rows_used) == (2, 2, 80)


def test_stratified_ate_drops_single_arm_strata(spark):
    from orientdb_etl_spark.functions.stats import stratified_ate

    rows = [(True, 5.0, "both"), (False, 3.0, "both"), (True, 99.0, "t_only")]
    df = spark.createDataFrame(rows, "treat boolean, y double, s string")
    r = stratified_ate(df, "treat", "y", "s").collect()[0]
    assert (r.n_strata, r.n_used_strata, r.n_rows_used) == (2, 1, 2)
    assert r.ate == 2.0


# ------------------------------------------------------------ Holt-Winters


def test_holt_winters_recovers_pure_seasonality(spark):
    from orientdb_etl_spark.operators.temporal import holt_winters_additive

    # period-4 sawtooth, no trend: deseasonalized series is CONSTANT, so
    # level = the mean, trend = 0, forecast = mean + s(next phase)
    pat = [10.0, 20.0, 30.0, 40.0]
    rows = [("a", t, pat[t % 4]) for t in range(16)]
    df = spark.createDataFrame(rows, "k string, t bigint, x double")
    r = holt_winters_additive(
        df, ["k"], "t", "x", period=4, alpha=0.3, lookback=4, horizon=1
    ).collect()[0]
    assert (r.n_periods, r.level, r.trend) == (16, 25.0, 0.0)
    # last t = 15 (phase 3); next phase 0 -> index 10 - 25 = -15
    assert r.seasonal_next == -15.0 and r.forecast == 10.0


def test_holt_winters_unseen_next_phase_is_null(spark):
    from orientdb_etl_spark.operators.temporal import holt_winters_additive

    # only phases 0..2 ever observed; horizon lands on phase 3
    rows = [("a", t, float(t)) for t in (0, 1, 2, 4, 5, 6)]
    df = spark.createDataFrame(rows, "k string, t bigint, x double")
    r = holt_winters_additive(
        df, ["k"], "t", "x", period=4, alpha=0.3, lookback=4, horizon=1
    ).collect()[0]
    assert r.seasonal_next is None and r.forecast is None
    assert r.n_periods == 6


def test_holt_winters_validates_params(spark):
    import pytest

    from orientdb_etl_spark.operators.temporal import holt_winters_additive

    df = spark.createDataFrame([("a", 0, 1.0)], "k string, t bigint, x double")
    with pytest.raises(ValueError):
        holt_winters_additive(df, ["k"], "t", "x", period=1)
    with pytest.raises(ValueError):
        holt_winters_additive(df, ["k"], "t", "x", alpha=1.0)
