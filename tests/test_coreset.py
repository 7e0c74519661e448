"""Facility-location coreset selection: greedy trajectory vs the SQL
twin, submodularity invariants, and degenerate inputs."""

from __future__ import annotations

import pytest

from orientdb_etl_spark.functions.coreset import (
    facility_location_select,
    facility_location_sql,
)


def _clustered(spark, n=200, dim=12, clusters=4, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(clusters, dim)) * 4
    rows = [
        (i, [float(x) for x in centers[i % clusters] + rng.normal(size=dim)])
        for i in range(n)
    ]
    return (
        spark.createDataFrame(rows, "vec_id bigint, emb array<double>"),
        rows,
    )


def test_facility_location_matches_sql_twin(spark):
    import duckdb
    import pandas as pd

    df, rows = _clustered(spark)
    got = sorted(
        tuple(r)
        for r in facility_location_select(
            df, "emb", "vec_id", k=5, pool=16
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "emb",
        pd.DataFrame(
            {"vec_id": [r[0] for r in rows], "e": [r[1] for r in rows]}
        ),
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            facility_location_sql("emb", "e", "vec_id", k=5, pool=16)
        ).fetchall()
    )
    assert got == want


def test_facility_location_submodular_invariants(spark):
    """Marginal gains are non-increasing (submodularity of facility
    location under greedy), coverage is the running gain sum, and no
    exemplar repeats."""
    df, _ = _clustered(spark, clusters=3)
    out = sorted(
        facility_location_select(df, "emb", "vec_id", k=6, pool=20).collect(),
        key=lambda r: r.step,
    )
    gains = [r.gain for r in out]
    assert gains == sorted(gains, reverse=True)
    assert len({r.vec_id for r in out}) == 6
    for i, r in enumerate(out):
        assert abs(r.coverage - sum(gains[: i + 1])) < 1e-6
    # the first pick covers a clustered corpus far better than the last
    assert gains[0] > 10 * max(gains[-1], 1e-9)


def test_facility_location_validation_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (None, [0.0, 1.0]), (3, [0.0, 0.0])],
        "vec_id bigint, emb array<double>",
    )
    with pytest.raises(ValueError, match="k must be"):
        facility_location_select(df, "emb", "vec_id", k=0)
    with pytest.raises(ValueError, match="pool must be"):
        facility_location_select(df, "emb", "vec_id", k=5, pool=3)
    # null id/vec rows drop; the zero vector contributes 0 coverage
    out = facility_location_select(df, "emb", "vec_id", k=1, pool=2).collect()
    assert len(out) == 1 and out[0].gain >= 1.0  # covers itself at cos 1


def test_facility_location_config_transformer(spark):
    from orientdb_etl_spark import Pipeline

    df, _ = _clustered(spark, n=80, clusters=2)
    p = Pipeline(
        {
            "extractor": {"table": {"name": "emb"}},
            "transformers": [
                {
                    "coresetSelect": {
                        "vecField": "emb",
                        "idField": "vec_id",
                        "k": 3,
                        "pool": 10,
                    }
                }
            ],
            "loader": {"memory": {"view": "sel"}},
        },
        spark=spark,
    ).register_table("emb", df)
    out = p.run().outputs["sel"].collect()
    assert [r.step for r in sorted(out, key=lambda r: r.step)] == [1, 2, 3]
