from __future__ import annotations

import math
import random

import pytest

from orientdb_etl_spark.functions.spatial import grid_radius_join


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id bigint, x bigint, y bigint")


def _brute(rows, r):
    out = set()
    for i, (ia, xa, ya) in enumerate(rows):
        for ib, xb, yb in rows[i + 1 :]:
            if xa is None or xb is None or ya is None or yb is None:
                continue
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= r * r:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                out.add((a, b, d2))
    return out


def test_grid_radius_join_equals_brute_force_random(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 300), rng.randrange(0, 300)) for i in range(120)]
    for r in (1, 17, 50):
        got = {
            (p.id_a, p.id_b, p.dist2)
            for p in grid_radius_join(_pts(spark, rows), "id", "x", "y", r).collect()
        }
        assert got == _brute(rows, r), f"radius {r}"


def test_grid_radius_join_boundary_is_exact(spark):
    # dist2 == r² must be included; r² + 1 must not
    rows = [(1, 0, 0), (2, 3, 4), (3, 3, 5)]  # d(1,2)=5 exactly, d(1,3)²=34
    got = {
        (p.id_a, p.id_b, p.dist2)
        for p in grid_radius_join(_pts(spark, rows), "id", "x", "y", 5).collect()
    }
    assert (1, 2, 25) in got
    assert all(a != 1 or b != 3 for a, b, _ in got)


def test_grid_radius_join_negative_coords_cross_cell_zero(spark):
    # floor (not trunc) cell math: points straddling the origin pair up
    rows = [(1, -1, -1), (2, 1, 1)]
    got = grid_radius_join(_pts(spark, rows), "id", "x", "y", 3).collect()
    assert [(p.id_a, p.id_b, p.dist2) for p in got] == [(1, 2, 8)]


def test_grid_radius_join_no_duplicate_pairs(spark):
    # co-located points in one cell must appear exactly once
    rows = [(1, 10, 10), (2, 10, 10), (3, 11, 10)]
    got = [
        (p.id_a, p.id_b) for p in
        grid_radius_join(_pts(spark, rows), "id", "x", "y", 100).collect()
    ]
    assert sorted(got) == [(1, 2), (1, 3), (2, 3)]
    assert len(got) == len(set(got))


def test_grid_radius_join_nulls_and_validation(spark):
    df = spark.createDataFrame([(1, None, 5), (2, 0, 0)], "id bigint, x bigint, y bigint")
    assert grid_radius_join(df, "id", "x", "y", 10).count() == 0
    with pytest.raises(ValueError, match="radius"):
        grid_radius_join(df, "id", "x", "y", 0)
