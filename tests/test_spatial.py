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


# ------------------------------------------------------- grid density


def _brute_grid_clusters(rows, eps, min_pts):
    """Reference implementation: dense cells, 8-adjacency BFS, min-key
    labels; noise = None."""
    from collections import defaultdict, deque

    cells = defaultdict(list)
    for i, x, y in rows:
        if x is None or y is None:
            continue
        cells[(x // eps, y // eps)].append(i)
    dense = {c for c, m in cells.items() if len(m) >= min_pts}
    key = lambda c: c[0] * 4_294_967_296 + c[1] + 2_147_483_648  # noqa: E731
    label = {}
    for c in dense:
        if c in label:
            continue
        comp, q = [], deque([c])
        seen = {c}
        while q:
            cur = q.popleft()
            comp.append(cur)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cur[0] + dx, cur[1] + dy)
                    if nb in dense and nb not in seen:
                        seen.add(nb)
                        q.append(nb)
        lbl = min(key(c2) for c2 in comp)
        for c2 in comp:
            label[c2] = lbl
    out = {}
    for c, members in cells.items():
        for i in members:
            out[i] = label.get(c) if c in dense else None
    return out


def test_grid_density_clusters_match_bfs_reference(spark):
    from orientdb_etl_spark.functions.spatial import grid_density_clusters

    rng = random.Random(11)
    # two blobs + scattered noise
    rows = []
    n = 0
    for cx, cy in ((50, 50), (240, 260)):
        for _ in range(60):
            rows.append((n, cx + rng.randrange(-25, 25), cy + rng.randrange(-25, 25)))
            n += 1
    for _ in range(40):
        rows.append((n, rng.randrange(0, 300), rng.randrange(0, 300)))
        n += 1
    eps, min_pts = 20, 4
    got = {
        r.id: r.cluster
        for r in grid_density_clusters(
            _pts(spark, rows), "id", "x", "y", eps=eps, min_pts=min_pts
        ).collect()
    }
    assert got == _brute_grid_clusters(rows, eps, min_pts)


def test_grid_density_isolated_dense_cell_is_its_own_cluster(spark):
    from orientdb_etl_spark.functions.spatial import grid_density_clusters

    # one dense cell far from anything; a sparse single point elsewhere
    rows = [(1, 5, 5), (2, 6, 6), (3, 7, 7), (4, 500, 500)]
    out = {
        r.id: r.cluster
        for r in grid_density_clusters(
            _pts(spark, rows), "id", "x", "y", eps=10, min_pts=3
        ).collect()
    }
    # cell (0,0) -> key 0*2^32 + 0 + 2^31
    assert out[1] == out[2] == out[3] == 2_147_483_648
    assert out[4] is None


def test_grid_density_validates_params(spark):
    from orientdb_etl_spark.functions.spatial import grid_density_clusters

    df = _pts(spark, [(1, 1, 1)])
    with pytest.raises(ValueError):
        grid_density_clusters(df, "id", "x", "y", eps=0)
    with pytest.raises(ValueError):
        grid_density_clusters(df, "id", "x", "y", eps=5, min_pts=0)


def test_grid_density_tiers_agree(spark):
    # driver union-find (default) and the distributed star-contraction
    # fallback (cap=0 forces it) must produce identical min-key labels
    from orientdb_etl_spark.functions.spatial import grid_density_clusters

    rng = random.Random(23)
    rows = [(i, rng.randrange(0, 200), rng.randrange(0, 200)) for i in range(250)]
    df = _pts(spark, rows)
    a = sorted(
        map(tuple, grid_density_clusters(df, "id", "x", "y", 25, 3).collect())
    )
    b = sorted(
        map(
            tuple,
            grid_density_clusters(
                df, "id", "x", "y", 25, 3, driver_cells_cap=0
            ).collect(),
        )
    )
    assert a == b


def test_grid_density_cell_key_no_collision_at_large_indices(spark):
    """Regression: the old cx*1e6+cy packing collided whenever
    |cell_y| >= 500k — (cx=0, cy=1_000_000) and (cx=1, cy=0) shared a
    key and far-apart clusters silently merged. The 2^32-shift pack is
    a bijection over int32 cell indices."""
    from orientdb_etl_spark.functions.spatial import grid_density_clusters

    rows = [
        (1, 0.5, 1_000_000.5),
        (2, 0.6, 1_000_000.6),
        (3, 1.5, 0.5),
        (4, 1.6, 0.6),
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = grid_density_clusters(df, "id", "x", "y", eps=1, min_pts=2)
    clusters = {r.id: r.cluster for r in out.collect()}
    assert clusters[1] == clusters[2]
    assert clusters[3] == clusters[4]
    assert clusters[1] != clusters[3]  # collided before the fix


def test_grid_density_cell_index_overflow_raises(spark):
    from orientdb_etl_spark.functions.spatial import grid_density_clusters

    df = spark.createDataFrame(
        [(1, 3.0e9, 0.0), (2, 3.0e9, 0.1)], "id long, x double, y double"
    )
    import pytest

    with pytest.raises(ValueError, match="int32"):
        grid_density_clusters(df, "id", "x", "y", eps=1, min_pts=1)
