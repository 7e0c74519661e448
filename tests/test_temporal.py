"""asof_join / range_join semantics on hand-built fixtures.

merge_asof-parity cases: backward/forward direction, inclusive equal
timestamps, tolerance null-out, unmatched-left nulls; range containment
at the bounds and across bucket boundaries.
"""

from datetime import datetime

import pyspark.sql.functions as F

from orientdb_etl_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:00")),
            (2, "A", _ts("2024-01-01 10:05:00")),
            (3, "B", _ts("2024-01-01 10:01:00")),
            (4, "C", _ts("2024-01-01 10:00:00")),  # no quotes for C
        ],
        "trade_id int, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59:00"), 10.0),
            ("A", _ts("2024-01-01 10:05:00"), 11.0),  # equal-ts vs trade 2
            ("A", _ts("2024-01-01 10:30:00"), 12.0),
            ("B", _ts("2024-01-01 10:02:00"), 20.0),  # after trade 3
        ],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward_inclusive_and_unmatched(spark):
    trades, quotes = _trades_quotes(spark)
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(trades, quotes, on="ts", by="sym").collect()
    }
    assert out[1] == 10.0  # most recent quote at or before
    assert out[2] == 11.0  # equal timestamp matches (inclusive)
    assert out[3] is None  # only future quotes for B
    assert out[4] is None  # no quotes at all for C


def test_asof_forward(spark):
    trades, quotes = _trades_quotes(spark)
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, on="ts", by="sym", direction="forward"
        ).collect()
    }
    assert out[1] == 11.0  # earliest quote at or after 10:00
    assert out[2] == 11.0  # equal timestamp matches (inclusive)
    assert out[3] == 20.0
    assert out[4] is None


def test_asof_tolerance_nulls_far_matches(spark):
    trades, quotes = _trades_quotes(spark)
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades,
            quotes,
            on="ts",
            by="sym",
            tolerance="INTERVAL 30 seconds",
        ).collect()
    }
    assert out[1] is None  # 09:59 quote is 60s away > 30s tolerance
    assert out[2] == 11.0  # 0s away


def test_asof_name_collision_gets_suffix(spark):
    trades, quotes = _trades_quotes(spark)
    quotes2 = quotes.withColumnRenamed("px", "trade_id")  # collide on purpose
    out = asof_join(trades, quotes2, on="ts", by="sym")
    assert "trade_id_r" in out.columns and "trade_id" in out.columns


def test_range_join_bounds_and_bucket_straddle(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),  # exactly at start (inclusive)
            (2, _ts("2024-01-01 10:30:00")),  # exactly at end (inclusive)
            (3, _ts("2024-01-01 10:15:00")),  # inside, different bucket from start
            (4, _ts("2024-01-01 10:31:00")),  # outside
        ],
        "pid int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00"))],
        "iid int, s timestamp, e timestamp",
    )
    # bucket width (600s) smaller than the interval: interval spans 4 buckets
    got = sorted(
        r["pid"]
        for r in range_join(
            points, intervals, "ts", "s", "e", bucket_seconds=600
        ).collect()
    )
    assert got == [1, 2, 3]


def test_range_join_by_key_and_left(spark):
    points = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:05:00")), (2, "u2", _ts("2024-01-01 10:05:00"))],
        "pid int, u string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(9, "u1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:10:00"))],
        "iid int, u string, s timestamp, e timestamp",
    )
    inner = range_join(points, intervals, "ts", "s", "e", by="u")
    assert [r["pid"] for r in inner.collect()] == [1]  # u2 filtered by key
    left = range_join(points, intervals, "ts", "s", "e", by="u", how="left")
    rows = {r["pid"]: r["iid"] for r in left.collect()}
    assert rows == {1: 9, 2: None}


def test_asof_plan_single_shuffle(spark):
    """The whole as-of join is one Exchange (by-key) + window — no
    nested-loop/cartesian node anywhere."""
    trades, quotes = _trades_quotes(spark)
    plan = (
        asof_join(trades, quotes, on="ts", by="sym")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_resample_fills_gaps_and_aggregates(spark):
    from orientdb_etl_spark.operators.temporal import resample

    ev = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 10:10:00"), 1.0),
            ("a", _ts("2024-01-01 10:50:00"), 2.0),
            # hour 11 missing entirely for key a
            ("a", _ts("2024-01-01 12:05:00"), 4.0),
            ("b", _ts("2024-01-01 10:30:00"), 7.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = resample(
        ev, "ts", 3600, keys="k",
        aggs=["count(1) AS n", "sum(v) AS sv"],
        fill={"n": 0},
    ).collect()
    rows = {(r.k, r.bucket_ts.hour): (r.n, r.sv) for r in out}
    assert rows[("a", 10)] == (2, 3.0)
    assert rows[("a", 11)] == (0, None)  # gap row: filled n, unfilled sv
    assert rows[("a", 12)] == (1, 4.0)
    # key b spans one bucket only -> no spine beyond it
    assert [k for k in rows if k[0] == "b"] == [("b", 10)]


def test_resample_single_wide_shuffle(spark):
    """The dense spine is generated, never shuffled from data: the only
    exchanges are the pass-1 aggregation and the tiny per-key span agg."""
    from orientdb_etl_spark.operators.temporal import resample

    ev = spark.createDataFrame(
        [("a", _ts("2024-01-01 10:10:00"), 1.0)], "k string, ts timestamp, v double"
    )
    plan = (
        resample(ev, "ts", 3600, keys="k", aggs=["count(1) AS n"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_funnel_counts_ordering(spark):
    from orientdb_etl_spark.operators.temporal import funnel_counts

    rows = [
        # user 1 completes the funnel in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # user 2 clicks BEFORE the first view -> stops at view
        (2, "click", 5), (2, "view", 10),
        # user 3 views and clicks, purchase precedes click -> stops at click
        (3, "view", 1), (3, "purchase", 2), (3, "click", 3),
        # user 4 never views
        (4, "click", 1), (4, "purchase", 2),
    ]
    ev = spark.createDataFrame(
        [(u, t, _ts(f"2024-01-01 00:00:{s:02d}")) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )
    out = funnel_counts(ev, ["view", "click", "purchase"]).first()
    assert (out.n1_view, out.n2_click, out.n3_purchase) == (3, 2, 1)


def test_rolling_agg_hand_computed_frames(spark):
    from orientdb_etl_spark.operators.temporal import rolling_agg

    # one user, events at t=0,30,61,100s; 60s trailing window (inclusive)
    rows = [(i, 1, float(10 * (i + 1)), t) for i, t in enumerate([0, 30, 61, 100])]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, sec long"
    ).selectExpr("event_id", "user_id", "value", "timestamp_seconds(sec) AS ts")
    out = {
        r.event_id: (r.roll_n, r.roll_sum)
        for r in rolling_agg(
            df, "ts", "user_id", {"roll_n": "count(1)", "roll_sum": "sum(value)"}, 60
        ).collect()
    }
    assert out[0] == (1, 10.0)          # frame [-60, 0] = {0}
    assert out[1] == (2, 30.0)          # frame [-30, 30] = {0, 30}
    assert out[2] == (2, 50.0)          # frame [1, 61] = {30, 61}; 0 is OUT
    assert out[3] == (2, 70.0)          # frame [40, 100] = {61, 100}


def test_rolling_agg_range_peers_share_frame(spark):
    """Two events in the same second are RANGE peers: both see both."""
    from orientdb_etl_spark.operators.temporal import rolling_agg

    df = spark.createDataFrame(
        [(0, 1, 1.0, 50), (1, 1, 2.0, 50)],
        "event_id long, user_id long, value double, sec long",
    ).selectExpr("event_id", "user_id", "value", "timestamp_seconds(sec) AS ts")
    out = rolling_agg(df, "ts", "user_id", {"s": "sum(value)"}, 10).collect()
    assert all(r.s == 3.0 for r in out)


def test_rolling_agg_refuses_unkeyed(spark):
    import pytest

    from orientdb_etl_spark.operators.temporal import rolling_agg

    df = spark.range(5).selectExpr("id", "timestamp_seconds(id) AS ts")
    with pytest.raises(ValueError, match="partition keys"):
        rolling_agg(df, "ts", None, {"n": "count(1)"}, 60)


def test_rolling_agg_plan_partitioned_no_single_task(spark):
    from orientdb_etl_spark.operators.temporal import rolling_agg

    df = spark.range(100).selectExpr(
        "id AS event_id", "id % 7 AS user_id", "timestamp_seconds(id) AS ts"
    )
    plan = (
        rolling_agg(df, "ts", "user_id", {"n": "count(1)"}, 60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    assert "SinglePartition" not in plan  # keyed window, never one task


def test_scd2_history_collapses_runs(spark):
    from orientdb_etl_spark.operators.temporal import scd2_history

    rows = [
        (1, "free", 10), (1, "free", 20), (1, "pro", 30), (1, "free", 40),
        (2, "pro", 15),
    ]
    df = spark.createDataFrame(rows, "uid long, plan string, sec long").selectExpr(
        "uid", "plan", "timestamp_seconds(sec) AS ts", "sec AS oid"
    )
    got = sorted(
        (r.uid, r.plan, r.valid_from.second + r.valid_from.minute * 60 if r.valid_from else None,
         r.valid_to.second + r.valid_to.minute * 60 if r.valid_to else None)
        for r in scd2_history(df, "uid", "ts", ["plan"], ["oid"]).collect()
    )
    # user 1: free [10,30) -> pro [30,40) -> free [40, open); user 2: pro open
    assert got == [
        (1, "free", 10, 30), (1, "free", 40, None), (1, "pro", 30, 40),
        (2, "pro", 15, None),
    ]


def test_scd2_history_null_attr_first_row_not_lost(spark):
    """A key whose first observation has NULL attributes must still open
    a run (eqNullSafe(NULL, lag NULL) would otherwise claim 'same')."""
    from orientdb_etl_spark.operators.temporal import scd2_history

    df = spark.createDataFrame(
        [(1, None, 10), (1, "x", 20)], "uid long, plan string, sec long"
    ).selectExpr("uid", "plan", "timestamp_seconds(sec) AS ts", "sec AS oid")
    got = scd2_history(df, "uid", "ts", ["plan"], ["oid"]).collect()
    assert len(got) == 2
    assert {r.plan for r in got} == {None, "x"}


def test_scd2_history_point_in_time_lookup(spark):
    """The intervals must answer as-of queries correctly."""
    from pyspark.sql import functions as F

    from orientdb_etl_spark.operators.temporal import scd2_history

    rows = [(1, "a", i) for i in range(0, 50, 10)] + [(1, "b", i) for i in range(50, 100, 10)]
    df = spark.createDataFrame(rows, "uid long, v string, sec long").selectExpr(
        "uid", "v", "timestamp_seconds(sec) AS ts", "sec AS oid"
    )
    hist = scd2_history(df, "uid", "ts", ["v"], ["oid"])
    t = F.lit("1970-01-01 00:00:55").cast("timestamp")
    at = hist.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).collect()
    assert len(at) == 1 and at[0].v == "b"


def test_merge_intervals_islands_and_gaps(spark):
    from orientdb_etl_spark.operators.temporal import merge_intervals

    rows = [
        # key a: [0,10] [5,20] [20,25] chain into one island; [40,50] alone
        ("a", 0, 10), ("a", 5, 20), ("a", 20, 25), ("a", 40, 50),
        # an interval CONTAINED in an earlier one must not split the island
        ("a", 6, 8),
        ("b", 0, 1),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = sorted((r.k, r.s, r.e, r.n_merged) for r in merge_intervals(df, "k", "s", "e").collect())
    assert got == [("a", 0, 25, 4), ("a", 40, 50, 1), ("b", 0, 1, 1)]


def test_merge_intervals_touching_counts_as_overlap(spark):
    """start == previous end merges (closed intervals touch)."""
    from orientdb_etl_spark.operators.temporal import merge_intervals

    df = spark.createDataFrame([("k", 0, 10), ("k", 10, 20)], "k string, s long, e long")
    got = merge_intervals(df, "k", "s", "e").collect()
    assert len(got) == 1 and (got[0].s, got[0].e, got[0].n_merged) == (0, 20, 2)


def test_cohort_retention_hand_computed(spark):
    from orientdb_etl_spark.operators.temporal import cohort_retention

    # bucket = 10s; users 1,2 first appear in bucket 0; user 1 returns in
    # bucket 1 and 2, user 2 only in bucket 2. User 3 starts in bucket 1.
    rows = [
        (1, 5), (1, 15), (1, 25),
        (2, 7), (2, 27),
        (3, 12),
    ]
    df = spark.createDataFrame(rows, "user_id long, sec long").selectExpr(
        "user_id", "timestamp_seconds(sec) AS ts"
    )
    got = {
        (r.cohort_bucket, r.offset): (r.n_users, r.frac)
        for r in cohort_retention(df, "user_id", "ts", bucket_seconds=10).collect()
    }
    assert got[(0, 0)] == (2, 1.0)
    assert got[(0, 1)] == (1, 0.5)   # only user 1 back in bucket 1
    assert got[(0, 2)] == (2, 1.0)   # both back in bucket 2
    assert got[(1, 0)] == (1, 1.0)   # user 3's own cohort
    assert len(got) == 4


def test_asof_nearest_picks_closer_side_and_ties_backward(spark):
    trades, quotes = _trades_quotes(spark)
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, on="ts", by="sym", direction="nearest"
        ).collect()
    }
    # trade 1 @10:00: quotes at 09:59 (60s back) vs 10:05 (300s fwd) -> back
    assert out[1] == 10.0
    # trade 2 @10:05: exact-ts quote wins with distance 0
    assert out[2] == 11.0
    # trade 3 @10:01: only future quote 10:02 -> forward match
    assert out[3] == 20.0
    # no quotes for C at all
    assert out[4] is None


def test_asof_nearest_equidistant_prefers_backward(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 10:00:10"))], "lid int, sym string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:00"), 1.0),
         ("A", _ts("2024-01-01 10:00:20"), 2.0)],
        "sym string, ts timestamp, px double",
    )
    out = asof_join(left, right, on="ts", by="sym", direction="nearest").first()
    assert out.px == 1.0  # 10s either way -> backward wins (pandas parity)


def test_asof_nearest_tolerance(spark):
    trades, quotes = _trades_quotes(spark)
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, on="ts", by="sym", direction="nearest",
            tolerance="INTERVAL 30 seconds",
        ).collect()
    }
    assert out[1] is None   # nearest (60s) is beyond the 30s bound
    assert out[2] == 11.0   # distance 0


# ---------------------------------------------------------------------------
# ewma / cusum_changepoints
# ---------------------------------------------------------------------------


def _series(spark, vals, key="k"):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (key, i, base + timedelta(minutes=i), None if v is None else float(v))
            for i, v in enumerate(vals)
        ],
        "k string, i int, ts timestamp, v double",
    )


def test_ewma_matches_hand_weights(spark):
    from orientdb_etl_spark.operators.temporal import ewma

    df = _series(spark, [1, 2, 3])
    rows = {
        r.i: r.ewma
        for r in ewma(df, "k", "ts", "v", alpha=0.5, tiebreak="i").collect()
    }
    assert abs(rows[0] - 1.0) < 1e-12
    assert abs(rows[1] - (2 + 0.5 * 1) / 1.5) < 1e-12
    assert abs(rows[2] - (3 + 0.5 * 2 + 0.25 * 1) / 1.75) < 1e-12


def test_ewma_skips_null_lags_in_normalizer(spark):
    from orientdb_etl_spark.operators.temporal import ewma

    df = _series(spark, [1, None, 3])
    rows = {
        r.i: r.ewma
        for r in ewma(df, "k", "ts", "v", alpha=0.5, tiebreak="i").collect()
    }
    # at i=2: lag1 is NULL -> excluded from numerator AND normalizer
    assert abs(rows[2] - (3 + 0.25 * 1) / 1.25) < 1e-12
    assert rows[1] == 1.0  # only the lag-1 history exists


def test_ewma_bounded_lookback(spark):
    from orientdb_etl_spark.operators.temporal import ewma

    df = _series(spark, list(range(10)))
    rows = ewma(df, "k", "ts", "v", alpha=0.5, lookback=2, tiebreak="i").collect()
    last = [r.ewma for r in sorted(rows, key=lambda r: r.i)][-1]
    # only x_9 and x_8 participate
    assert abs(last - (9 + 0.5 * 8) / 1.5) < 1e-12


def test_cusum_closed_form_equals_recursion(spark):
    import statistics

    from orientdb_etl_spark.operators.temporal import cusum_changepoints

    vals = [0.0] * 10 + [5.0] * 5
    df = _series(spark, vals)
    out = {
        r.i: r
        for r in cusum_changepoints(
            df, "k", "ts", "v", k=0.5, h=3.0, tiebreak="i"
        ).collect()
    }
    mu = statistics.mean(vals)
    sd = statistics.stdev(vals)
    sp = sn = 0.0
    for i, v in enumerate(vals):
        z = (v - mu) / sd
        sp = max(0.0, sp + z - 0.5)
        sn = max(0.0, sn - z - 0.5)
        assert abs(out[i].s_pos - sp) < 1e-9, i
        assert abs(out[i].s_neg - sn) < 1e-9, i
        assert out[i].changepoint == (sp > 3.0 or sn > 3.0)
    # the level shift must actually fire the detector
    assert any(out[i].changepoint for i in range(10, 15))
    assert not any(out[i].changepoint for i in range(10))


def test_cusum_zero_variance_never_flags(spark):
    from orientdb_etl_spark.operators.temporal import cusum_changepoints

    df = _series(spark, [7.0] * 8)
    rows = cusum_changepoints(df, "k", "ts", "v", tiebreak="i").collect()
    assert all(r.s_pos == 0.0 and r.s_neg == 0.0 for r in rows)
    assert not any(r.changepoint for r in rows)


def test_ewma_cusum_transformers(spark):
    from orientdb_etl_spark.context import PipelineContext
    from orientdb_etl_spark.operators import get_transformer

    df = _series(spark, [1, 2, 3, 10])
    ctx = PipelineContext(spark)
    e = get_transformer("ewma")(
        ctx, df, {"by": ["k"], "on": "ts", "valueField": "v", "tiebreak": "i"}
    )
    assert "ewma" in e.columns and e.count() == 4
    c = get_transformer("cusum")(
        ctx, df, {"by": ["k"], "on": "ts", "valueField": "v", "tiebreak": "i"}
    )
    assert {"s_pos", "s_neg", "changepoint"} <= set(c.columns)


def test_peak_concurrency_hand_case(spark):
    from orientdb_etl_spark.operators.temporal import peak_concurrency

    # [0,10) [5,15) [5,8) -> conc: t0=1, t5=3, t8=2, t10=1, t15=0
    iv = spark.createDataFrame(
        [(0, 10), (5, 15), (5, 8)], "s long, e long"
    )
    out = [tuple(r) for r in peak_concurrency(iv, "s", "e", top_k=3).collect()]
    assert out == [(5, 3), (8, 2), (0, 1)]


def test_peak_concurrency_half_open_no_false_overlap(spark):
    from orientdb_etl_spark.operators.temporal import peak_concurrency

    # [0,5) and [5,10) touch but never overlap
    iv = spark.createDataFrame([(0, 5), (5, 10)], "s long, e long")
    out = peak_concurrency(iv, "s", "e", top_k=1).collect()
    assert out[0].concurrency == 1


def test_peak_concurrency_ignores_null_endpoints(spark):
    from orientdb_etl_spark.operators.temporal import peak_concurrency

    iv = spark.createDataFrame(
        [(0, 10), (None, 4), (6, None)], "s long, e long"
    )
    out = peak_concurrency(iv, "s", "e", top_k=1).collect()
    assert out[0].concurrency == 1


def test_twap_step_interpolation_hand_case(spark):
    from orientdb_etl_spark.operators.temporal import twap

    # value 10 holds 0..100 (100s), value 20 holds 100..400 (300s):
    # twap = (10*100 + 20*300) / 400 = 17.5; last event has no interval
    rows = [(1, 0, 10.0, 1), (1, 100, 20.0, 2), (1, 400, 99.0, 3)]
    df = spark.createDataFrame(rows, "k long, t long, v double, id long")
    ts = df.withColumn("t", F.col("t").cast("timestamp"))
    out = twap(ts, "k", "t", "v", "id").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_obs, r.span_seconds, r.twap) == (3, 400, 17.5)


def test_twap_duplicate_timestamps_deterministic(spark):
    from orientdb_etl_spark.operators.temporal import twap

    # two events at t=0: the (ts, id) order gives id=1 a zero-length
    # hold and id=2 the full interval — same answer on any partitioning
    rows = [(1, 0, 10.0, 1), (1, 0, 50.0, 2), (1, 100, 99.0, 3)]
    df = spark.createDataFrame(rows, "k long, t long, v double, id long")
    ts = df.withColumn("t", F.col("t").cast("timestamp"))
    a = twap(ts, "k", "t", "v", "id").collect()[0]
    b = twap(ts.repartition(5), "k", "t", "v", "id").collect()[0]
    assert a.twap == b.twap == 50.0


def test_twap_single_event_key_dropped(spark):
    from orientdb_etl_spark.operators.temporal import twap

    rows = [(1, 0, 10.0, 1), (2, 0, 5.0, 2), (1, 60, 20.0, 3)]
    df = spark.createDataFrame(rows, "k long, t long, v double, id long")
    ts = df.withColumn("t", F.col("t").cast("timestamp"))
    out = twap(ts, "k", "t", "v", "id").collect()
    assert [r.k for r in out] == [1]


def test_ohlc_bars_hand_computed(spark):
    from orientdb_etl_spark.operators.temporal import ohlc_bars

    rows = [
        ("k", "2024-01-01 00:00:05", 10.0, 1),
        ("k", "2024-01-01 00:20:00", 30.0, 2),
        ("k", "2024-01-01 00:40:00", 5.0, 3),
        ("k", "2024-01-01 00:59:59", 20.0, 4),
        ("k", "2024-01-01 01:10:00", 7.0, 5),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double, id long")
    out = {r.bucket_start: r for r in ohlc_bars(df, "k", "ts", "v", "id").collect()}
    assert len(out) == 2
    b0 = sorted(out)[0]
    r = out[b0]
    assert (r.open, r.high, r.low, r.close, r.n_ticks) == (10.0, 30.0, 5.0, 20.0, 4)
    assert out[b0 + 3600].open == 7.0


def test_ohlc_bars_duplicate_ts_tiebreak(spark):
    from orientdb_etl_spark.operators.temporal import ohlc_bars

    rows = [
        ("k", "2024-01-01 00:00:00", 50.0, 9),
        ("k", "2024-01-01 00:00:00", 60.0, 2),  # same second: id orders
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double, id long")
    r = ohlc_bars(df, "k", "ts", "v", "id").collect()[0]
    assert (r.open, r.close) == (60.0, 50.0)


def test_holt_winters_null_key_series_kept(spark):
    """Regression (round-6 null-safe join-back sweep): a NULL series key
    must forecast like any other series instead of vanishing at the
    seasonal-profile join."""
    from orientdb_etl_spark.operators.temporal import holt_winters_additive

    rows = []
    for g in (None, "a"):
        for t in range(12):
            rows.append((g, t, float(10 + (t % 3))))
    df = spark.createDataFrame(rows, "g string, t int, x double")
    out = holt_winters_additive(df, "g", "t", "x", period=3)
    got = {r.g: r.n_periods for r in out.collect()}
    assert set(got) == {None, "a"}
    assert got[None] == got["a"] == 12


def test_holt_winters_negative_time_index_phases(spark):
    """Negative bucket indices (relative/centered time) must share a
    phase with their positive congruents — pmod, not the sign-keeping
    %, which split them into phantom negative phases."""
    from orientdb_etl_spark.operators.temporal import holt_winters_additive

    # identical series, one shifted to start at -6 (two full periods
    # earlier): same seasonal profile -> same forecast
    pos = [("a", t, float(10 + (t % 3))) for t in range(0, 12)]
    neg = [("b", t, float(10 + ((t + 600) % 3))) for t in range(-6, 6)]
    df = spark.createDataFrame(pos + neg, "g string, t int, x double")
    out = {r.g: (r.seasonal_next, r.forecast)
           for r in holt_winters_additive(df, "g", "t", "x", period=3).collect()}
    assert out["a"] == out["b"]
