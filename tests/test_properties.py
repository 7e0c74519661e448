"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures — determinism under repartitioning, dedup
idempotence, budget-prefix maximality.

Strategy sizes are kept small and deadlines disabled: each example runs
Spark jobs, so the value is breadth of shapes (empty groups, ties,
single-row groups, unicode), not example count.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),        # id (dups allowed)
        st.sampled_from(["a", "b", "c"]),              # group
        st.integers(min_value=0, max_value=20),        # tokens
    ),
    min_size=0,
    max_size=30,
)


@_settings
@given(rows=_rows)
def test_exact_dedup_idempotent_and_minimal(spark, rows):
    from orientdb_etl_spark.functions.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, g) for i, g, _ in rows] or [(0, "a")], "id long, grp string"
    )
    once = exact_dedup(df, ["grp"], tie_break="id")
    got = {(r.id, r.grp) for r in once.collect()}
    # one survivor per group, and it is the min id of that group
    by_grp = {}
    for i, g in {(r.id, r.grp) for r in df.collect()}:
        by_grp.setdefault(g, set()).add(i)
    want = {(min(ids), g) for g, ids in by_grp.items()}
    assert got == want
    # idempotent
    again = {(r.id, r.grp) for r in exact_dedup(once, ["grp"], tie_break="id").collect()}
    assert again == got


@_settings
@given(rows=_rows, budget=st.integers(min_value=1, max_value=60))
def test_token_budget_prefix_is_maximal_and_partition_invariant(spark, rows, budget):
    from orientdb_etl_spark.functions.sampling import token_budget_sample

    uniq = {r[0]: r for r in rows}.values()  # unique ids
    data = [(i, g, t) for i, g, t in uniq] or [(0, "a", 1)]
    df = spark.createDataFrame(data, "id long, grp string, toks long")
    kept = token_budget_sample(
        df, "grp", "id", "toks", {"a": budget, "b": budget, "c": budget}
    )
    got = {r.id for r in kept.collect()}

    # python replay: hash-order prefix per group, crossing doc kept
    def h(i):
        return (((i + 42) % 1_000_003) * 2654435761 % 2_000_000_011, i)

    want = set()
    for g in ("a", "b", "c"):
        cum = 0
        for i, _, t in sorted((r for r in data if r[1] == g), key=lambda r: h(r[0])):
            if cum < budget:
                want.add(i)
            cum += t
    assert got == want
    # partitioning must not change the selection
    again = {
        r.id
        for r in token_budget_sample(
            df.repartition(7), "grp", "id", "toks",
            {"a": budget, "b": budget, "c": budget},
        ).collect()
    }
    assert again == got


@_settings
@given(
    words=st.lists(
        st.text(alphabet="abcdefghij0123456789", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    ),
    seps=st.lists(st.sampled_from([" ", "  ", "\t", " \t ", "\n"]), min_size=7, max_size=7),
    caps=st.booleans(),
    punct=st.booleans(),
)
def test_doc_fingerprint_invariant_under_formatting(spark, words, seps, caps, punct):
    # the canonical-content fingerprint (exact-dedup key) must not change
    # under whitespace layout, letter case, or punctuation noise
    from orientdb_etl_spark.functions.text import doc_fingerprint

    base = " ".join(words)
    variant = ""
    for i, w in enumerate(words):
        token = w.upper() if caps else w
        if punct:
            token += "!,"
        variant += token + seps[i % len(seps)]
    df = spark.createDataFrame(
        [(0, base), (1, variant)], "id long, text string"
    )
    fps = [
        r.fp for r in df.select(doc_fingerprint("text").alias("fp")).collect()
    ]
    assert fps[0] == fps[1]


@_settings
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=0,
        max_size=25,
    )
)
def test_triangle_count_matches_bruteforce(spark, edges):
    from itertools import combinations

    from orientdb_etl_spark.functions.graph import triangle_count

    df = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )
    got = triangle_count(df).first().n_triangles

    adj = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    verts = {v for e in adj for v in e}
    want = sum(
        1
        for a, b, c in combinations(sorted(verts), 3)
        if (a, b) in adj and (a, c) in adj and (b, c) in adj
    )
    assert got == want


_texts = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),       # id (dups allowed)
        st.sampled_from([
            "the quick brown fox jumps over the lazy sleeping dog",
            "the quick brown fox jumps over the lazy sleeping cat",
            "pack my box with five dozen assorted liquor jugs now",
            "sphinx of black quartz judge my vow said the editor",
        ]),
    ),
    min_size=1,
    max_size=25,
)


@_settings
@given(rows=_texts)
def test_corpus_dedup_pipeline_invariants(spark, rows):
    """For ANY corpus: survivors ⊆ corpus, at most one survivor per exact
    text group and it is that group's min id (exact stage determinism),
    survivor count ≤ distinct texts, and the pipeline is idempotent."""
    from orientdb_etl_spark.functions.dedup import corpus_dedup_pipeline

    uniq = list({(i, t) for i, t in rows})
    df = spark.createDataFrame(uniq, "doc_id long, text string")
    out = corpus_dedup_pipeline(
        df, "text", "doc_id", num_perm=32, bands=8, threshold=0.9
    )
    surv = {(r.doc_id, r.text) for r in out.collect()}
    corpus = set(uniq)
    assert surv <= corpus
    by_text = {}
    for i, t in corpus:
        by_text.setdefault(t, set()).add(i)
    surv_by_text = {}
    for i, t in surv:
        surv_by_text.setdefault(t, set()).add(i)
    for t, ids in surv_by_text.items():
        assert len(ids) == 1
        assert ids == {min(by_text[t])}  # exact-stage keeper is the min id
    assert len(surv) <= len(by_text)
    again = {
        (r.doc_id, r.text)
        for r in corpus_dedup_pipeline(
            out, "text", "doc_id", num_perm=32, bands=8, threshold=0.9
        ).collect()
    }
    assert again == surv  # idempotent


def test_snapshot_diff_apply_roundtrip_property(spark):
    """CDC round-trip law on randomized snapshots:
    apply(old, diff(old, new)) == new, exactly, for arbitrary overlaps
    of added/removed/changed/unchanged keys (nulls included)."""
    import random

    from orientdb_etl_spark.functions.profiling import (
        apply_snapshot_diff,
        snapshot_diff,
    )

    rng = random.Random(23)
    for trial in range(3):
        old_rows, new_rows = [], []
        for k in range(200):
            v_old = rng.choice([None, "a", "b", "c"])
            w_old = rng.randrange(5)
            fate = rng.random()
            if fate < 0.25:
                old_rows.append((k, v_old, w_old))          # removed
            elif fate < 0.5:
                new_rows.append((k, v_old, w_old))          # added
            elif fate < 0.75:
                old_rows.append((k, v_old, w_old))          # changed
                new_rows.append((k, rng.choice([None, "x", "y"]), w_old + 1))
            else:
                old_rows.append((k, v_old, w_old))          # unchanged
                new_rows.append((k, v_old, w_old))
        old = spark.createDataFrame(old_rows, "k long, v string, w long")
        new = spark.createDataFrame(new_rows, "k long, v string, w long")
        diff = snapshot_diff(old, new, ["k"])
        rebuilt = apply_snapshot_diff(old, diff, ["k"], ["v", "w"])
        got = sorted(((r.k, r.v, r.w) for r in rebuilt.collect()))
        want = sorted(new_rows)
        assert got == want, f"trial {trial}: roundtrip mismatch"


_intervals = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),
        st.integers(min_value=0, max_value=60),   # start
        st.integers(min_value=0, max_value=30),   # length
    ),
    min_size=1,
    max_size=25,
)


@given(_intervals)
@_settings
def test_merge_intervals_matches_python_sweep(spark, items):
    """For ANY interval set: islands equal the classic sorted sweep, and
    the result covers exactly the union of inputs."""
    from orientdb_etl_spark.operators.temporal import merge_intervals

    rows = [(k, s, s + ln) for k, s, ln in items]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = sorted(
        (r.k, r.s, r.e, r.n_merged)
        for r in merge_intervals(df, "k", "s", "e").collect()
    )

    want = []
    by_key: dict = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, ivs in by_key.items():
        ivs.sort()
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s <= cur_e:
                cur_e = max(cur_e, e)
                n += 1
            else:
                want.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        want.append((k, cur_s, cur_e, n))
    assert got == sorted(want)


_observations = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # key
        st.sampled_from(["x", "y", None]),          # attr (nullable)
        st.integers(min_value=0, max_value=40),     # second (ties allowed)
    ),
    min_size=1,
    max_size=25,
)


@given(_observations)
@_settings
def test_scd2_history_matches_python_run_collapse(spark, items):
    """For ANY observation log (ties, NULL attrs): the history equals
    the sequential run-collapse, intervals chain per key, and exactly
    one open row per key exists."""
    from orientdb_etl_spark.operators.temporal import scd2_history

    rows = [(k, a, s, i) for i, (k, a, s) in enumerate(items)]
    df = spark.createDataFrame(
        rows, "k long, attr string, sec long, oid long"
    ).selectExpr("k", "attr", "timestamp_seconds(sec) AS ts", "oid")
    got = sorted(
        (
            (r.k, r.attr, r.valid_from.second + 60 * r.valid_from.minute,
             (r.valid_to.second + 60 * r.valid_to.minute) if r.valid_to else None)
            for r in scd2_history(df, "k", "ts", ["attr"], ["oid"]).collect()
        ),
        key=repr,
    )

    want = []
    by_key: dict = {}
    for k, a, s, i in rows:
        by_key.setdefault(k, []).append((s, i, a))
    for k, obs in by_key.items():
        obs.sort()
        runs = []
        for s, _, a in obs:
            if not runs or runs[-1][1] != a:
                runs.append([s, a])
        for j, (s, a) in enumerate(runs):
            nxt = runs[j + 1][0] if j + 1 < len(runs) else None
            want.append((k, a, s, nxt))
    assert got == sorted(want, key=repr)


_events_for_rolling = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # key
        st.integers(min_value=0, max_value=120),   # second (ties allowed)
        st.integers(min_value=-5, max_value=5),    # value
    ),
    min_size=1,
    max_size=25,
)


@given(_events_for_rolling)
@_settings
def test_rolling_agg_matches_python_reference(spark, items):
    """For ANY event set (ties included): every row's trailing-60s frame
    equals the brute-force [t-60, t] filter per key — RANGE peers at
    equal truncated seconds all included."""
    from orientdb_etl_spark.operators.temporal import rolling_agg

    rows = [(i, k, s, float(v)) for i, (k, s, v) in enumerate(items)]
    df = spark.createDataFrame(
        rows, "rid long, k long, sec long, v double"
    ).selectExpr("rid", "k", "v", "sec", "timestamp_seconds(sec) AS ts")
    got = {
        r.rid: (r.n, r.s)
        for r in rolling_agg(
            df, "ts", ["k"], {"n": "count(1)", "s": "sum(v)"}, 60
        ).collect()
    }
    for rid, k, sec, v in rows:
        frame = [(v2) for _, k2, s2, v2 in rows if k2 == k and sec - 60 <= s2 <= sec]
        assert got[rid] == (len(frame), sum(frame)), (rid, k, sec)


@_settings
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),                 # key
            st.integers(min_value=-5, max_value=5),      # value
            st.integers(min_value=0, max_value=4),       # weight (>= 0)
        ),
        min_size=1,
        max_size=25,
    ),
    p=st.sampled_from([1, 25, 50, 75, 100]),
)
def test_weighted_percentiles_matches_python_reference(spark, rows, p):
    """Type-1 weighted quantile against a plain-python reference:
    smallest value whose inclusive cumulative weight reaches p% of the
    key total; zero-weight-only keys absent; repartition-invariant."""
    from orientdb_etl_spark.functions.profiling import weighted_percentiles

    df = spark.createDataFrame(
        rows, "k string, v int, w int"
    ).repartition(5)
    got = {
        (r["k"], r["percentile"]): (r["value"], r["total_weight"])
        for r in weighted_percentiles(df, "k", "v", "w", [p]).collect()
    }
    # python reference over collapsed (key, value) weights
    agg: dict = {}
    for k, v, w in rows:
        agg[(k, v)] = agg.get((k, v), 0) + w
    keys = {k for k, _ in agg}
    for k in keys:
        vals = sorted(v for kk, v in agg if kk == k)
        total = sum(agg[(k, v)] for v in vals)
        if total == 0:
            assert not any(kk == k for kk, _ in got)
            continue
        cum = 0
        pick = None
        for v in vals:
            cum += agg[(k, v)]
            if cum * 100 >= p * total:
                pick = v
                break
        assert got[(k, p)] == (pick, total)


@_settings
@given(
    vals=st.lists(
        st.integers(min_value=-3, max_value=9), min_size=5, max_size=18
    ),
    season=st.sampled_from([1, 2, 3]),
)
def test_forecast_backtest_matches_python_reference(spark, vals, season):
    """Naive/seasonal-naive error sums against a plain-python replay of
    the same bucket series (consecutive hourly buckets, one key)."""
    from orientdb_etl_spark.functions.stats import forecast_backtest

    rows = [("k", t * 3600, float(v)) for t, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "k string, es bigint, v double"
    ).selectExpr("k", "CAST(from_unixtime(es) AS timestamp) AS ts", "v")
    out = {
        r["model"]: r
        for r in forecast_backtest(df, "k", "ts", "v", 3600, season).collect()
    }
    y = [v * 100 for v in vals]  # integer cents, exactly as the engine
    idx = list(range(season, len(y)))
    if not idx:
        assert not out
        return
    n = len(idx)
    an = sum(abs(y[t] - y[t - 1]) for t in idx)
    asn = sum(abs(y[t] - y[t - season]) for t in idx)
    ay = sum(abs(y[t]) for t in idx)
    assert out["naive"]["n_eval"] == n
    assert abs(out["naive"]["mae"] - round(an / n / 100, 6)) < 1e-9
    assert abs(
        out["seasonal_naive"]["mae"] - round(asn / n / 100, 6)
    ) < 1e-9
    if ay:
        assert abs(out["naive"]["wape"] - round(an / ay, 6)) < 1e-9
    else:
        assert out["naive"]["wape"] is None
    if an:
        assert abs(
            out["seasonal_naive"]["mase"] - round(asn / an, 6)
        ) < 1e-9
    else:
        assert out["seasonal_naive"]["mase"] is None
