from __future__ import annotations

import itertools

from orientdb_etl_spark.functions.linkage import fuzzy_join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(ls, rs, d):
    return {
        (i, j)
        for (i, a), (j, b) in itertools.product(enumerate(ls), enumerate(rs))
        if _lev(a, b) <= d
    }


def _pairs(spark, ls, rs, d):
    left = spark.createDataFrame(list(enumerate(ls)), "lid int, a string")
    right = spark.createDataFrame(list(enumerate(rs)), "rid int, b string")
    out = fuzzy_join(left, right, "a", "b", "lid", "rid", max_dist=d)
    return {(r.lid, r.rid) for r in out.collect()}, out


WORDS = [
    "almond", "almonds", "amond", "almend", "salmon", "lemon", "melon",
    "mellon", "banana", "bananna", "banan", "cherry", "chery", "cherries",
    "kiwi", "kiwis", "wiki", "fig", "fog", "fg", "grape", "grapes",
    "grap", "pear", "bear", "peer", "", "a", "b", "ab",
]


def test_fuzzy_join_equals_brute_force_d1(spark):
    got, _ = _pairs(spark, WORDS, WORDS, 1)
    assert got == _brute(WORDS, WORDS, 1)


def test_fuzzy_join_equals_brute_force_d2(spark):
    got, _ = _pairs(spark, WORDS, WORDS, 2)
    assert got == _brute(WORDS, WORDS, 2)


def test_fuzzy_join_asymmetric_sides(spark):
    ls = ["color", "colour", "cloud"]
    rs = ["colour", "could", "colors", "flavor"]
    got, out = _pairs(spark, ls, rs, 2)
    assert got == _brute(ls, rs, 2)
    # the reported distance is the true levenshtein
    for r in out.collect():
        assert r.dist == _lev(r.a, r.b)


def test_fuzzy_join_d0_is_exact_join(spark):
    ls = ["x", "y", "zz"]
    rs = ["x", "zz", "zz"]
    got, _ = _pairs(spark, ls, rs, 0)
    assert got == {(0, 0), (2, 1), (2, 2)}


def test_fuzzy_join_nulls_never_match(spark):
    left = spark.createDataFrame([(1, None), (2, "ab")], "lid int, a string")
    right = spark.createDataFrame([(3, None), (4, "ab")], "rid int, b string")
    out = fuzzy_join(left, right, "a", "b", "lid", "rid", max_dist=2)
    assert {(r.lid, r.rid) for r in out.collect()} == {(2, 4)}


def test_fuzzy_join_no_cartesian_in_plan(spark):
    left = spark.createDataFrame([(1, "abcdef")], "lid int, a string")
    right = spark.createDataFrame([(2, "abcdxf")], "rid int, b string")
    plan = (
        fuzzy_join(left, right, "a", "b", "lid", "rid", max_dist=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
