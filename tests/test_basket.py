from __future__ import annotations

import pytest

from orientdb_etl_spark.functions.basket import frequent_pairs


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


def test_frequent_pairs_counts_and_metrics(spark):
    # 4 baskets: {a,b} together in 3 of them; {a,c} in 1 (below floor)
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "c"),
        (4, "a"), (4, "c"),
    ]
    out = {(r.item_a, r.item_b): r for r in
           frequent_pairs(_baskets(spark, rows), "basket", "item",
                          min_pair_count=2).collect()}
    assert set(out) == {("a", "b"), ("a", "c")}
    ab = out[("a", "b")]
    assert (ab.pair_n, ab.n_a, ab.n_b) == (3, 4, 3)
    assert ab.support == pytest.approx(0.75)
    assert ab.confidence_ab == pytest.approx(0.75)
    # lift = pair_n * N / (n_a * n_b) = 3*4 / (4*3) = 1.0
    assert ab.lift == pytest.approx(1.0)


def test_frequent_pairs_dedups_within_basket(spark):
    # a repeated twice in basket 1 must count once (presence, not quantity)
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    out = frequent_pairs(_baskets(spark, rows), "basket", "item",
                         min_pair_count=2).collect()
    assert len(out) == 1 and out[0].pair_n == 2 and out[0].n_a == 2


def test_frequent_pairs_prefilter_is_lossless(spark):
    # rare item z appears once — pruned pre-join; surviving pairs unchanged
    rows = [(i, x) for i in range(5) for x in ("a", "b")] + [(0, "z")]
    with_rare = frequent_pairs(_baskets(spark, rows), "basket", "item",
                               min_pair_count=2).collect()
    assert {(r.item_a, r.item_b, r.pair_n) for r in with_rare} == {("a", "b", 5)}


def test_frequent_pairs_basket_cap_drops_whole_basket(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a"), (3, "b")]
    out = frequent_pairs(_baskets(spark, rows), "basket", "item",
                         min_pair_count=2, max_basket_size=2).collect()
    # basket 1 (size 3) dropped entirely: ab pair counted only in 2 and 3
    assert {(r.item_a, r.item_b, r.pair_n) for r in out} == {("a", "b", 2)}


def test_frequent_pairs_rejects_all_null(spark):
    with pytest.raises(ValueError, match="no non-null baskets"):
        frequent_pairs(
            _baskets(spark, [(None, "a")]), "basket", "item"
        )


def test_frequent_pairs_transformer(spark):
    from orientdb_etl_spark import Pipeline

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    p = Pipeline(
        {
            "extractor": {"table": {"name": "t"}},
            "transformers": [
                {"frequentPairs": {"basketField": "basket",
                                   "itemField": "item", "minPairCount": 2}}
            ],
            "loader": {"memory": {"view": "res"}},
        },
        spark=spark,
    ).register_table("t", _baskets(spark, rows))
    got = p.run().outputs["res"].collect()
    assert len(got) == 1 and got[0].lift == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# item_similarity
# ---------------------------------------------------------------------------


def test_item_similarity_cosine_and_symmetry(spark):
    import math

    from orientdb_etl_spark.functions.basket import item_similarity

    # baskets: {a,b} x3, {a,c} x1  -> c_a=4, c_b=3, c_c=1
    rows = []
    for i in range(3):
        rows += [(i, "a"), (i, "b")]
    rows += [(9, "a"), (9, "c")]
    df = spark.createDataFrame(rows, "basket bigint, item string")
    got = {
        (r.item, r.neighbor): (r.pair_n, r.cosine)
        for r in item_similarity(df, "basket", "item", min_pair_count=1).collect()
    }
    cos_ab = round(3 / math.sqrt(4 * 3), 6)
    cos_ac = round(1 / math.sqrt(4 * 1), 6)
    assert got[("a", "b")] == (3, cos_ab)
    assert got[("b", "a")] == (3, cos_ab)  # both directions present
    assert got[("a", "c")] == (1, cos_ac)
    assert ("b", "c") not in got  # never co-occur


def test_item_similarity_topk_cuts_per_item(spark):
    from orientdb_etl_spark.functions.basket import item_similarity

    # item "hub" co-occurs with x1..x4 at descending strength
    rows = []
    bid = 0
    for rank, other in enumerate(["x1", "x2", "x3", "x4"]):
        for _ in range(4 - rank):
            rows += [(bid, "hub"), (bid, other)]
            bid += 1
    df = spark.createDataFrame(rows, "basket bigint, item string")
    out = item_similarity(df, "basket", "item", top_k=2, min_pair_count=1)
    hub = [r.neighbor for r in out.where("item = 'hub'").collect()]
    assert hub == ["x1", "x2"]


def test_item_similarity_validation(spark):
    import pytest as _pytest

    from orientdb_etl_spark.functions.basket import item_similarity

    df = spark.createDataFrame([(1, "a")], "basket bigint, item string")
    with _pytest.raises(ValueError, match="top_k"):
        item_similarity(df, "basket", "item", top_k=0)
