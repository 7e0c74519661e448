from __future__ import annotations

import random

from orientdb_etl_spark.operators.relational import skyline2d


def _brute(points, min_x=True, min_y=True):
    def norm(p):
        return (p[0] if min_x else -p[0], p[1] if min_y else -p[1])

    out = []
    for p in points:
        px, py = norm(p)
        dominated = any(
            (qx <= px and qy <= py and (qx < px or qy < py))
            for qx, qy in map(norm, points)
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_matches_brute_force_random(spark):
    rng = random.Random(7)
    pts = [(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r.x, r.y) for r in skyline2d(df, "x", "y").collect())
    assert got == _brute(pts)


def test_skyline_duplicates_both_kept(spark):
    df = spark.createDataFrame([(1, 1), (1, 1), (5, 0)], "x long, y long")
    got = sorted((r.x, r.y) for r in skyline2d(df, "x", "y").collect())
    assert got == [(1, 1), (1, 1), (5, 0)]


def test_skyline_maximize_direction(spark):
    pts = [(1, 1), (2, 2), (3, 1), (1, 3)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted(
        (r.x, r.y)
        for r in skyline2d(df, "x", "y", minimize_x=False, minimize_y=False).collect()
    )
    assert got == _brute(pts, min_x=False, min_y=False) == [(1, 3), (2, 2), (3, 1)]


def test_skyline_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, None), (None, 1), (2, 2)], "x long, y long"
    )
    assert [(r.x, r.y) for r in skyline2d(df, "x", "y").collect()] == [(2, 2)]


def test_skyline_partitioning_invariant(spark):
    rng = random.Random(11)
    pts = [(rng.randint(0, 100), rng.randint(0, 100)) for _ in range(500)]
    df = spark.createDataFrame(pts, "x long, y long")
    a = sorted((r.x, r.y) for r in skyline2d(df, "x", "y", partitions=2).collect())
    b = sorted(
        (r.x, r.y)
        for r in skyline2d(df.repartition(13), "x", "y", partitions=7).collect()
    )
    assert a == b == _brute(pts)


def test_skyline_transformer(spark):
    from orientdb_etl_spark import Pipeline

    df = spark.createDataFrame([(1, 2), (2, 1), (3, 3)], "x long, y long")
    p = Pipeline(
        {
            "extractor": {"table": {"name": "t"}},
            "transformers": [{"skyline": {"x": "x", "y": "y"}}],
            "loader": {"memory": {"view": "res"}},
        },
        spark=spark,
    ).register_table("t", df)
    got = sorted((r.x, r.y) for r in p.run().outputs["res"].collect())
    assert got == [(1, 2), (2, 1)]
