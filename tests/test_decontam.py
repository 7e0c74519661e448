"""Benchmark decontamination (token n-gram overlap vs an eval set)."""

from __future__ import annotations

from orientdb_etl_spark.functions.decontam import decontaminate, token_ngram_array


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap here at all"),
            (3, "prefix words then the quick brown fox appears again"),
            (4, "short doc"),
            (5, None),
        ],
        "doc_id long, text string",
    )


def _eval(spark):
    return spark.createDataFrame(
        [(100, "we test the quick brown fox benchmark phrase")],
        "doc_id long, text string",
    )


def test_ngram_array_boundaries(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "t string")
    out = [r[0] for r in df.select(token_ngram_array("t", 3)).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == []  # fewer tokens than n
    assert out[2] == []


def test_decontaminate_flags_overlapping_docs(spark):
    hits = decontaminate(_corpus(spark), _eval(spark), n=3, mode="hits").collect()
    got = {r.doc_id: r.n_hits for r in hits}
    # docs 1 and 3 contain "the quick brown" / "quick brown fox"
    assert set(got) == {1, 3}
    assert got[1] >= 2 and got[3] >= 2


def test_decontaminate_filter_and_flag(spark):
    kept = decontaminate(_corpus(spark), _eval(spark), n=3, mode="filter")
    assert sorted(r.doc_id for r in kept.collect()) == [2, 4, 5]
    flagged = decontaminate(_corpus(spark), _eval(spark), n=3, mode="flag")
    fm = {r.doc_id: r.contaminated for r in flagged.collect()}
    assert fm == {1: True, 2: False, 3: True, 4: False, 5: False}


def test_decontaminate_high_n_no_hits(spark):
    hits = decontaminate(_corpus(spark), _eval(spark), n=13, mode="hits")
    assert hits.count() == 0


def test_decontaminate_broadcast_plan(spark):
    df = decontaminate(_corpus(spark), _eval(spark), n=3, mode="hits")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles for the join
