"""Deterministic sampling/splitting/shuffling (training-data builds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orientdb_etl_spark.functions.sampling import (
    deterministic_shuffle,
    hash_bucket,
    hash_split,
    mixture_sample,
)


def test_hash_split_stable_under_growth(spark):
    small = spark.range(500).withColumnRenamed("id", "doc_id")
    big = spark.range(2000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s_small = {r.doc_id: r.split for r in hash_split(small, "doc_id", w).collect()}
    s_big = {r.doc_id: r.split for r in hash_split(big, "doc_id", w).collect()}
    # assignments of existing ids never change as the dataset grows
    assert all(s_big[k] == v for k, v in s_small.items())
    # proportions roughly honored
    from collections import Counter

    c = Counter(s_big.values())
    assert 0.7 < c["train"] / 2000 < 0.9
    assert set(c) == {"train", "val", "test"}


def test_mixture_sample_rates_and_determinism(spark):
    df = spark.range(4000).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, "click").otherwise("view").alias("event_type"),
    )
    out1 = mixture_sample(df, "event_type", "event_id", {"click": 0.5, "view": 0.1})
    out2 = mixture_sample(df, "event_type", "event_id", {"click": 0.5, "view": 0.1})
    got1 = sorted(r.event_id for r in out1.collect())
    assert got1 == sorted(r.event_id for r in out2.collect())  # deterministic
    counts = {r.event_type: r.n for r in out1.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert 0.4 < counts["click"] / 2000 < 0.6
    assert 0.05 < counts["view"] / 2000 < 0.16


def test_deterministic_shuffle_reproducible_and_permutes(spark):
    df = spark.range(300).withColumnRenamed("id", "doc_id")
    o1 = [r.doc_id for r in deterministic_shuffle(df, "doc_id").collect()]
    o2 = [r.doc_id for r in deterministic_shuffle(df, "doc_id").collect()]
    assert o1 == o2 and sorted(o1) == list(range(300)) and o1 != list(range(300))
    # different seed → different order
    o3 = [r.doc_id for r in deterministic_shuffle(df, "doc_id", seed=7).collect()]
    assert o3 != o1


def test_hash_bucket_uniformish(spark):
    df = spark.range(10000).select(hash_bucket("id", 10).alias("b"))
    counts = [r.n for r in df.groupBy("b").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 10 and min(counts) > 600  # no collapsed buckets


def test_stratified_sample_exact_n_and_determinism(spark):
    from orientdb_etl_spark.functions.sampling import stratified_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("grp"),
    )
    a = stratified_sample(df, "grp", "doc_id", 10)
    b = stratified_sample(df, "grp", "doc_id", 10)
    rows_a = sorted((r.grp, r.doc_id) for r in a.collect())
    assert rows_a == sorted((r.grp, r.doc_id) for r in b.collect())
    from collections import Counter

    c = Counter(g for g, _ in rows_a)
    assert c == {"0": 10, "1": 10, "2": 10}
    # groups smaller than n are kept whole
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, grp string")
    assert stratified_sample(tiny, "grp", "doc_id", 10).count() == 2


def test_token_budget_sample_prefix_and_crossing_doc(spark):
    from orientdb_etl_spark.functions.sampling import hash_bucket, token_budget_sample

    df = spark.createDataFrame(
        [(i, "a" if i < 6 else "b", 10) for i in range(12)],
        "id long, grp string, toks long",
    )
    out = token_budget_sample(df, "grp", "id", "toks", {"a": 25}, default_budget=None)
    got_a = {r.id for r in out.filter("grp = 'a'").collect()}
    # expected: hash-ordered prefix of group a while prev-cum < 25 ->
    # 3 docs (10+10 < 25, third crosses and is kept; fourth is not)
    order = sorted(
        range(6),
        key=lambda i: (
            ((i + 42) % 1_000_003) * 2654435761 % 2_000_000_011, i
        ),
    )
    assert got_a == set(order[:3])
    # group b has no budget and default None -> passes through whole
    assert out.filter("grp = 'b'").count() == 6
    # deterministic under different partitioning
    again = {r.id for r in token_budget_sample(
        df.repartition(5), "grp", "id", "toks", {"a": 25}, default_budget=None
    ).filter("grp = 'a'").collect()}
    assert again == got_a


def test_quantile_bucket_exact_boundaries(spark):
    from orientdb_etl_spark.functions.sampling import quantile_bucket

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, score double"
    )
    out = quantile_bucket(df, "score", k=4)
    got = {r.id: r.score_bucket for r in out.collect()}
    # boundaries at exact quantiles 24.75/49.5/74.25; ties-to-lower
    assert got[0] == 0 and got[24] == 0
    assert got[25] == 1 and got[49] == 1
    assert got[50] == 2 and got[74] == 2
    assert got[75] == 3 and got[99] == 3
    # every bucket is (near-)equal mass
    from collections import Counter

    sizes = Counter(got.values())
    assert set(sizes) == {0, 1, 2, 3} and max(sizes.values()) - min(sizes.values()) <= 1

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        quantile_bucket(df, "score", k=1)


def test_quantile_bucket_no_global_sort_window(spark):
    """The bucketing must be scalar-attach shaped: no Window, no global
    Sort over the table (the ntile anti-pattern)."""
    from orientdb_etl_spark.functions.sampling import quantile_bucket

    df = spark.range(1000).selectExpr("id", "id % 37 AS score")
    plan = quantile_bucket(df, "score", k=3)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row boundary attach


def test_quantile_bucket_null_scores_get_null_bucket(spark):
    from orientdb_etl_spark.functions.sampling import quantile_bucket

    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0), (4, None)],
        "id long, score double",
    )
    got = {r.id: r.score_bucket for r in quantile_bucket(df, "score", k=2).collect()}
    # unscored rows must NOT flood the head bucket — they belong to no quantile
    assert got[4] is None
    assert all(got[i] is not None for i in range(4))


def test_weighted_sample_matches_python_reference(spark):
    """The E-S selection is a pure function of (id, weight, seed): replay
    the exact key arithmetic in Python and demand identical ids."""
    import math

    from orientdb_etl_spark.functions.sampling import weighted_sample

    rows = [(i, float(1 + (i * 7) % 50)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(r.doc_id for r in weighted_sample(df, "doc_id", "w", k=25).collect())

    def key(i, w, seed=42):
        b = ((i + seed) % 1_000_003) * 2654435761 % 1_000_003
        return -math.log((b + 1) / 1_000_004.0) / w

    want = sorted(
        i for i, _ in sorted(rows, key=lambda r: (key(*r), r[0]))[:25]
    )
    assert got == want


def test_weighted_sample_prefers_heavy_rows(spark):
    """A 100×-weight block must be overrepresented: with ids 0-999 and
    weight 100 on the first 100 ids, most of a k=50 sample lands there."""
    from orientdb_etl_spark.functions.sampling import weighted_sample

    df = spark.range(1000).selectExpr(
        "id AS doc_id", "CASE WHEN id < 100 THEN 100.0 ELSE 1.0 END AS w"
    )
    got = [r.doc_id for r in weighted_sample(df, "doc_id", "w", k=50).collect()]
    heavy = sum(1 for i in got if i < 100)
    assert heavy >= 35  # expectation ≈ 46; uniform sampling would give ≈ 5


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    import pytest

    from orientdb_etl_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame(
        [(0, 5.0), (1, 0.0), (2, -3.0), (3, None), (4, 2.0)],
        "doc_id long, w double",
    )
    got = sorted(r.doc_id for r in weighted_sample(df, "doc_id", "w", k=10).collect())
    assert got == [0, 4]  # k > eligible rows keeps all eligible, no pad
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, "doc_id", "w", k=0)


def test_weighted_sample_plan_is_topk_not_global_sort(spark):
    from orientdb_etl_spark.functions.sampling import weighted_sample

    df = spark.range(1000).selectExpr("id AS doc_id", "1.0 + id % 7 AS w")
    plan = (
        weighted_sample(df, "doc_id", "w", k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_temperature_rates_alpha_one_keeps_everything(spark):
    from orientdb_etl_spark.functions.sampling import temperature_rates

    df = spark.range(900).selectExpr("id AS doc_id", "concat('g', id % 3) AS g")
    rates = temperature_rates(df, "g", alpha=1.0).collect()
    assert all(r.rate_ppm == 1_000_000 for r in rates)


def test_temperature_rates_flatten_toward_small_domains(spark):
    """alpha<1 downsamples big domains only: the smallest-mass domain
    keeps rate 1e6, bigger domains get monotonically smaller rates, and
    the realized mixture is flatter than the raw one."""
    import pytest

    from orientdb_etl_spark.functions.sampling import (
        temperature_rates,
        temperature_sample,
    )

    # 3 domains with mass ratio 1 : 4 : 16
    df = spark.range(2100).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 100 THEN 'small' WHEN id < 500 THEN 'mid' "
        "ELSE 'big' END AS g",
    )
    r = {x.g: x.rate_ppm for x in temperature_rates(df, "g", alpha=0.5).collect()}
    assert r["small"] == 1_000_000
    assert r["small"] > r["mid"] > r["big"]
    # alpha=0.5 on 1:4:16 → rates 1 : 1/2 : 1/4
    assert abs(r["mid"] - 500_000) <= 1 and abs(r["big"] - 250_000) <= 1
    kept = temperature_sample(df, "g", "doc_id", alpha=0.5)
    counts = {x.g: x.n for x in kept.groupBy("g").agg(F.count("*").alias("n")).collect()}
    # realized mixture 1:2:4-ish instead of 1:4:16 — flatter, never upsampled
    assert counts["small"] == 100
    assert 120 <= counts["mid"] <= 280  # expectation 200
    assert 280 <= counts["big"] <= 520  # expectation 400
    with pytest.raises(ValueError, match="alpha"):
        temperature_rates(df, "g", alpha=0.0)


def test_winsorize_clips_to_exact_percentiles(spark):
    import pytest

    from orientdb_etl_spark.functions.sampling import winsorize

    # values 1..100: p05 = 5.95, p95 = 95.05 (linear interpolation)
    df = spark.range(1, 101).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    got = {r.id: r.vw for r in winsorize(df, "v", 0.05, 0.95, out_col="vw").collect()}
    assert abs(got[1] - 5.95) < 1e-9 and abs(got[3] - 5.95) < 1e-9
    assert abs(got[100] - 95.05) < 1e-9
    assert got[50] == 50.0  # interior values untouched
    with pytest.raises(ValueError, match="lower < upper"):
        winsorize(df, "v", 0.9, 0.5)


def test_winsorize_null_passthrough_and_groups(spark):
    from orientdb_etl_spark.functions.sampling import winsorize

    rows = [("a", i, float(i)) for i in range(1, 11)]
    rows += [("b", 100 + i, float(1000 * i)) for i in range(1, 11)]
    rows.append(("a", 999, None))
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {r.id: r.v for r in winsorize(df, "v", 0.1, 0.9, by="g").collect()}
    assert got[999] is None                 # NULL stays NULL
    assert got[5] == 5.0                    # interior of group a
    # group b: values 1000..10000 → p10 = 1900, p90 = 9100 (interpolated)
    assert abs(got[101] - 1900.0) < 1e-9    # 1000 clipped UP to b's p10
    assert abs(got[110] - 9100.0) < 1e-9    # 10000 clipped DOWN to b's p90
    # group bounds are independent: a's clips stay inside a's range
    assert max(v for k, v in got.items() if k < 100 and v is not None) < 10.0


def test_weighted_sample_per_group_exact_python_replay(spark):
    import math

    from orientdb_etl_spark.functions.sampling import weighted_sample_per_group

    rows = [(i, f"g{i % 3}", float(1 + (i * 11) % 30)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    got = sorted(
        (r.g, r.doc_id)
        for r in weighted_sample_per_group(df, "g", "doc_id", "w", k=4).collect()
    )

    def key(i, w, seed=42):
        b = ((i + seed) % 1_000_003) * 2654435761 % 1_000_003
        return -math.log((b + 1) / 1_000_004.0) / w

    want = []
    for g in ("g0", "g1", "g2"):
        members = [(i, w) for i, gg, w in rows if gg == g]
        members.sort(key=lambda t: (key(*t), t[0]))
        want += [(g, i) for i, _ in members[:4]]
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# negative_samples
# ---------------------------------------------------------------------------


def test_negative_samples_never_returns_interactions(spark):
    from orientdb_etl_spark.functions.sampling import negative_samples

    rows = [(u, i) for u in range(5) for i in range(10) if (u + i) % 3 == 0]
    df = spark.createDataFrame(rows, "u bigint, i bigint")
    got = negative_samples(df, "u", "i", k=3).collect()
    seen = set(rows)
    assert all((r.u, r.i) not in seen for r in got)
    per_user = {}
    for r in got:
        per_user.setdefault(r.u, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_user.values())
    assert all(len(v) <= 3 for v in per_user.values())


def test_negative_samples_deterministic_and_seed_sensitive(spark):
    from orientdb_etl_spark.functions.sampling import negative_samples

    rows = [(u, i) for u in range(4) for i in range(12) if (u + i) % 3 != 0]
    df = spark.createDataFrame(rows, "u bigint, i bigint")
    a = sorted(map(tuple, negative_samples(df, "u", "i", k=2, seed=7).collect()))
    b = sorted(map(tuple, negative_samples(df.repartition(9), "u", "i", k=2, seed=7).collect()))
    c = sorted(map(tuple, negative_samples(df, "u", "i", k=2, seed=8).collect()))
    assert a == b          # partitioning-invariant
    assert a != c          # seed changes the draw


def test_negative_samples_short_vocab_gives_fewer(spark):
    from orientdb_etl_spark.functions.sampling import negative_samples

    # user 0 interacted with 2 of 3 items -> only 1 negative available
    rows = [(0, 0), (0, 1), (1, 2)]
    df = spark.createDataFrame(rows, "u bigint, i bigint")
    got = [r for r in negative_samples(df, "u", "i", k=5).collect() if r.u == 0]
    assert [(r.i, r.rank) for r in got] == [(2, 1)]


# ---------------------------------------------------------------------------
# rendezvous_shards


def test_rendezvous_minimal_disruption(spark):
    from orientdb_etl_spark.functions.sampling import rendezvous_shards

    keys = spark.createDataFrame([(i,) for i in range(400)], "k long")
    a8 = rendezvous_shards(keys, "k", shards=8)
    a9 = rendezvous_shards(keys, "k", shards=9, out_col="shard9")
    j = a8.join(a9, "k").collect()
    moved = [r for r in j if r.shard != r.shard9]
    # the defining property: every key that moves, moves TO the new
    # shard (its old winner is unchanged among shards 0..7)
    assert all(r.shard9 == 8 for r in moved)
    assert 0 < len(moved) < len(j) / 4  # ~1/9 expected, never a rehash


def test_rendezvous_preserves_duplicates_and_nulls(spark):
    from orientdb_etl_spark.functions.sampling import rendezvous_shards

    df = spark.createDataFrame([(1,), (1,), (None,), (2,)], "k long")
    out = rendezvous_shards(df, "k", shards=4).collect()
    assert len(out) == 4
    by_k = {}
    for r in out:
        by_k.setdefault(r.k, []).append(r.shard)
    assert len(by_k[1]) == 2 and len(set(by_k[1])) == 1
    assert by_k[None] == [None]


def test_neyman_allocation_hand_computed(spark):
    """n_h ∝ N_h·S_h; largest-remainder split sums exactly to the
    budget; zero-variance strata get weight 0; validation raises."""
    import pytest as _pt

    from orientdb_etl_spark.functions.sampling import neyman_allocation

    rows = (
        # stratum a: 4 rows spread {0, 10} -> sd ~ 5.77
        [("a", 0.0), ("a", 10.0), ("a", 0.0), ("a", 10.0)]
        # stratum b: 8 constant rows -> sd 0, weight 0
        + [("b", 5.0)] * 8
        # stratum c: 2 rows spread {0, 100} -> sd ~ 70.7
        + [("c", 0.0), ("c", 100.0)]
    )
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: r for r in neyman_allocation(df, "k", "v", 10).collect()
    }
    import math

    w_a = 4 * math.sqrt((4 * (2 * 1000**2) - 2000**2) / (4 * 3)) / 100
    w_c = 2 * math.sqrt((2 * 10000**2 - 10000**2) / (2 * 1)) / 100
    assert got["b"]["weight"] == 0.0 and got["b"]["alloc_n"] == 0
    assert abs(got["a"]["weight"] - round(w_a, 6)) < 1e-6
    assert abs(got["c"]["weight"] - round(w_c, 6)) < 1e-6
    assert sum(r["alloc_n"] for r in got.values()) == 10
    # c dominates: weight 141.4 vs a's 23.1
    assert got["c"]["alloc_n"] > got["a"]["alloc_n"] > 0

    with _pt.raises(ValueError, match="total_n"):
        neyman_allocation(df, "k", "v", 0)


def test_dsir_upweights_target_like_docs(spark):
    """DSIR log-weights must rank raw documents that share the target's
    n-gram profile above off-distribution ones; empty docs emit no row;
    the weight is a pure function of (corpora, seeds) — re-run equal."""
    from orientdb_etl_spark.functions.dsir import dsir_logweights

    target = spark.createDataFrame(
        [(100 + i, "spark sql window join") for i in range(4)],
        "doc_id int, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "spark sql window group"),
            (2, "cat dog mouse bird"),
            (3, "spark sql join plan"),
            (4, None),
            (5, "   "),
        ],
        "doc_id int, text string",
    )
    lw = dsir_logweights(raw, target, buckets=64, n_max=2)
    rows = {r.doc_id: (r.n_feats, r.logw) for r in lw.collect()}
    assert set(rows) == {1, 2, 3}  # NULL/blank docs carry no evidence
    assert rows[1][1] > rows[2][1]  # target-like beats off-distribution
    assert rows[3][1] > rows[2][1]
    # unigrams + bigrams of a 4-token doc = 4 + 3
    assert rows[1][0] == 7
    again = {r.doc_id: (r.n_feats, r.logw)
             for r in dsir_logweights(raw, target, buckets=64, n_max=2).collect()}
    assert again == rows


def test_dsir_resample_deterministic_topk(spark):
    """Gumbel-top-k selection: k rows, keys are (logw + gumbel) rounded
    to 6 dp, the selection replays identically, and raising a doc's
    importance can only help its inclusion (monotonicity probed on a
    corpus where one doc dominates)."""
    from pyspark.sql import functions as F

    from orientdb_etl_spark.functions.dsir import dsir_resample

    target = spark.createDataFrame(
        [(100, "alpha beta gamma delta alpha beta")],
        "doc_id int, text string",
    )
    raw = spark.createDataFrame(
        [(i, "alpha beta gamma delta") if i % 3 == 0 else (i, f"junk{i} filler noise")
         for i in range(30)],
        "doc_id int, text string",
    )
    out = dsir_resample(raw, target, k=8, buckets=128, n_max=2)
    rows = out.collect()
    assert len(rows) == 8
    assert {"doc_id", "text", "n_feats", "logw", "key"} <= set(out.columns)
    picked = {r.doc_id for r in rows}
    # the on-distribution docs dominate the selection
    on_dist = {i for i in range(30) if i % 3 == 0}
    assert len(picked & on_dist) >= 6
    again = {r.doc_id for r in dsir_resample(raw, target, k=8, buckets=128, n_max=2).collect()}
    assert again == picked


def test_dsir_config_transformer(spark):
    """dsirSelect through the config surface: targetTable resolves from
    the registered-table namespace; weightsOnly emits the score table;
    a missing target raises."""
    import pytest

    from orientdb_etl_spark import Pipeline

    target = spark.createDataFrame(
        [(100, "alpha beta gamma")], "doc_id int, text string"
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "x y z"), (3, "alpha x beta")],
        "doc_id int, text string",
    )
    p = Pipeline(
        {
            "extractor": {"table": {"name": "raw"}},
            "transformers": [{"dsirSelect": {
                "targetTable": "tgt", "k": 2, "buckets": 64}}],
            "loader": {"memory": {"view": "sel"}},
        },
        spark=spark,
    ).register_table("raw", raw).register_table("tgt", target)
    out = p.run().outputs["sel"]
    assert out.count() == 2
    assert {"doc_id", "logw", "key"} <= set(out.columns)
    p2 = Pipeline(
        {
            "extractor": {"table": {"name": "raw"}},
            "transformers": [{"dsirSelect": {
                "targetTable": "tgt", "weightsOnly": True, "buckets": 64}}],
            "loader": {"memory": {"view": "w"}},
        },
        spark=spark,
    ).register_table("raw", raw).register_table("tgt", target)
    w = p2.run().outputs["w"]
    assert set(w.columns) == {"doc_id", "n_feats", "logw"}
    with pytest.raises(ValueError, match="targetTable"):
        Pipeline(
            {
                "extractor": {"table": {"name": "raw"}},
                "transformers": [{"dsirSelect": {"targetTable": "nope", "k": 1}}],
                "loader": {"memory": {}},
            },
            spark=spark,
        ).register_table("raw", raw).run()


def test_unimax_allocation_water_filling_matches_sequential_fold(spark):
    """Relational closed form == the published sequential fold: ascending
    cap order, each group takes min(cap, remaining/groups_left)."""
    from orientdb_etl_spark.functions.sampling import unimax_allocation

    rows = [("a", 100), ("b", 1000), ("c", 5000), ("d", 40), ("e", 900)]
    df = spark.createDataFrame(rows, "lang string, n int")
    budget, eps = 4000, 2.0
    out = {
        r.lang: r
        for r in unimax_allocation(df, "lang", "n", budget, eps).collect()
    }
    # reference fold (driver-side, groups-sized)
    per = sorted(
        ((int(n * eps), lang, n) for lang, n in rows), key=lambda t: (t[0], t[1])
    )
    remaining, left, want = float(budget), len(per), {}
    for cap, lang, n in per:
        take = min(float(cap), remaining / left)
        want[lang] = take
        remaining -= take
        left -= 1
    for lang, n in rows:
        assert abs(out[lang].quota - want[lang]) < 1e-6, lang
        assert out[lang].n_tokens == n
        assert abs(out[lang].epochs - round(want[lang] / n, 4)) < 1e-9
    # budget fully distributed (no group hits the cap short of exhaustion)
    assert abs(sum(r.quota for r in out.values()) - budget) < 1e-4


def test_unimax_allocation_all_capped_and_validation(spark):
    import pytest

    from orientdb_etl_spark.functions.sampling import unimax_allocation

    df = spark.createDataFrame([("a", 10), ("b", 20)], "lang string, n int")
    # budget far above total capacity: every group pins at its cap
    out = {r.lang: r for r in unimax_allocation(df, "lang", "n", 10_000, 1.0).collect()}
    assert out["a"].quota == 10.0 and out["b"].quota == 20.0
    assert out["a"].epochs == 1.0 and out["b"].epochs == 1.0
    with pytest.raises(ValueError, match="budget"):
        unimax_allocation(df, "lang", "n", 0)
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_allocation(df, "lang", "n", 100, max_epochs=0)
