"""Embedding projection operators: portable JL sign projection, one-pass
Gram matrix, power-iteration PCA (+ deflation, + distributed variant), the
numpy production path, and the leakage-safe cluster split."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from orientdb_etl_spark.functions.projections import (
    deflate_sql,
    gram_matrix,
    gram_matrix_expr,
    gram_sql,
    jl_distortion,
    jl_project,
    jl_sign,
    jl_signs_sql,
    pca_embed,
    power_iteration,
    power_iteration_distributed,
    power_iteration_sql,
    project_components,
    top_components,
)
from orientdb_etl_spark.functions.sampling import (
    cluster_split,
    hash_split,
    split_leakage_report,
)

DIM = 8


@pytest.fixture(scope="module")
def vecs(spark):
    # deterministic anisotropic cloud: dominant direction along dim 1-2
    rng = np.random.RandomState(7)
    base = rng.randn(120, DIM) * 0.1
    base[:, 0] += rng.randn(120) * 1.5
    base[:, 1] += base[:, 0] * 0.5
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(len(base))]
    return spark.createDataFrame(rows, "vid long, v array<double>"), base


def test_jl_sign_is_balanced_and_not_checkerboard():
    signs = [[jl_sign(i, j) for j in range(1, 33)] for i in range(1, 33)]
    flat = [s for row in signs for s in row]
    assert abs(sum(flat)) < 0.25 * len(flat)  # roughly balanced
    # a parity-broken hash would satisfy s(i,j) == (-1)^(i+j+c) everywhere
    checker = sum(
        1
        for i in range(32)
        for j in range(32)
        if signs[i][j] == (1 if (i + j) % 2 == 0 else -1)
    )
    assert 0.2 < checker / 1024 < 0.8
    # the sharper invariant (the one the first linear hash FAILED, at
    # row correlation −0.94): worst off-diagonal row correlation of the
    # 64×64 sign matrix must sit inside the random-matrix envelope
    S = np.array([[jl_sign(i, j) for j in range(1, 65)] for i in range(1, 65)])
    C = S @ S.T / 64.0
    np.fill_diagonal(C, 0.0)
    assert float(np.abs(C).max()) < 0.7


def test_jl_project_preserves_distances_in_expectation(spark, vecs):
    df, base = vecs
    out = jl_project(df, "v", DIM, out_dim=32, seed=42).collect()
    got = {r["vid"]: [r[f"jl{j}"] for j in range(1, 33)] for r in out}
    ratios = []
    for a in range(0, 100, 2):
        dx = base[a] - base[a + 1]
        dy = np.array(got[a]) - np.array(got[a + 1])
        ratios.append(float(dy @ dy) / float(dx @ dx))
    assert 0.75 < float(np.mean(ratios)) < 1.25


def test_jl_project_matches_duckdb_sign_table(spark, vecs):
    duckdb = pytest.importorskip("duckdb")
    df, base = vecs
    out = jl_project(df, "v", DIM, out_dim=4, seed=42)
    got = {
        (r["vid"], j): round(r[f"jl{j}"], 6)
        for r in out.collect()
        for j in range(1, 5)
    }
    con = duckdb.connect()
    con.register(
        "emb",
        out.sparkSession.createDataFrame(
            [(int(i), [float(x) for x in base[i]]) for i in range(len(base))],
            "vid long, v array<double>",
        ).toPandas(),
    )
    rows = con.execute(
        f"WITH signs AS ({jl_signs_sql(DIM, 4, 42)}) "
        "SELECT e.vid, s.j, SUM((v::DOUBLE[])[s.i] * s.s) / sqrt(4.0) AS y "
        "FROM emb e, signs s GROUP BY 1, 2"
    ).fetchall()
    for vid, j, y in rows:
        assert got[(vid, j)] == pytest.approx(y, abs=1e-6)


def test_jl_distortion_certificate_shape(spark, vecs):
    df, _ = vecs
    row = jl_distortion(df, "v", "vid", DIM, out_dim=16).collect()[0]
    assert row["n_pairs"] == 60
    assert 0 < row["min_ratio"] <= row["avg_ratio"] <= row["max_ratio"]


def test_gram_matrix_arrow_matches_expr_twin(spark, vecs):
    df, base = vecs
    arrow = {
        (r["i"], r["j"]): r["g"] for r in gram_matrix(df, "v", DIM).collect()
    }
    expr = {
        (r["i"], r["j"]): r["g"]
        for r in gram_matrix_expr(df, "v", "vid", DIM).collect()
    }
    ref = base.T @ base
    assert len(arrow) == DIM * DIM
    for (i, j), g in arrow.items():
        assert g == pytest.approx(expr[(i, j)], abs=1e-9)
        assert g == pytest.approx(ref[i - 1][j - 1], abs=1e-9)


def test_power_iteration_matches_numpy_eigh(spark, vecs):
    df, base = vecs
    v, lam = power_iteration(gram_matrix(df, "v", DIM), DIM, steps=60)
    vals, vecs_np = np.linalg.eigh(base.T @ base)
    top = vecs_np[:, -1]
    assert abs(float(np.dot(v, top))) > 0.9999
    assert lam == pytest.approx(float(vals[-1]), rel=1e-6)


def test_top_components_deflation_orthogonal(spark, vecs):
    df, base = vecs
    comps = top_components(gram_matrix(df, "v", DIM), DIM, k=2, steps=80)
    (v1, l1), (v2, l2) = comps
    assert l1 > l2 > 0
    assert abs(sum(a * b for a, b in zip(v1, v2))) < 1e-4
    vals, vecs_np = np.linalg.eigh(base.T @ base)
    assert abs(float(np.dot(v2, vecs_np[:, -2]))) > 0.999


def test_power_iteration_distributed_matches_collected(spark, vecs):
    df, _ = vecs
    gram = gram_matrix(df, "v", DIM)
    v_c, lam_c = power_iteration(gram, DIM, steps=15)
    v_d, lam_d = power_iteration_distributed(gram, DIM, steps=15)
    assert lam_d == pytest.approx(lam_c, rel=1e-9)
    for a, b in zip(v_c, v_d):
        assert a == pytest.approx(b, abs=1e-9)


def test_power_iteration_sql_replays_python(spark, vecs):
    duckdb = pytest.importorskip("duckdb")
    df, base = vecs
    v, lam = power_iteration(gram_matrix(df, "v", DIM), DIM, steps=10)
    con = duckdb.connect()
    con.register("emb", df.toPandas())
    sql = (
        f"WITH gram AS MATERIALIZED ({gram_sql('emb', 'v', DIM)}), "
        + power_iteration_sql("gram", DIM, steps=10)
        + " SELECT f.i, f.x, (SELECT lam FROM v_lam) AS lam "
        "FROM v_final f ORDER BY f.i"
    )
    rows = con.execute(sql).fetchall()
    assert len(rows) == DIM
    for i, x, lam_sql in rows:
        assert x == pytest.approx(v[i - 1], abs=1e-9)
        assert lam_sql == pytest.approx(lam, rel=1e-9)


def test_deflate_sql_second_component(spark, vecs):
    duckdb = pytest.importorskip("duckdb")
    df, _ = vecs
    comps = top_components(gram_matrix(df, "v", DIM), DIM, k=2, steps=12)
    con = duckdb.connect()
    con.register("emb", df.toPandas())
    sql = (
        f"WITH gram AS MATERIALIZED ({gram_sql('emb', 'v', DIM)}), "
        + power_iteration_sql("gram", DIM, steps=12, vec_name="v1")
        + ", "
        + deflate_sql("gram", "v1", "gram2")
        + ", "
        + power_iteration_sql("gram2", DIM, steps=12, vec_name="v2")
        + " SELECT i, x FROM v2_final ORDER BY i"
    )
    rows = con.execute(sql).fetchall()
    v2 = comps[1][0]
    for i, x in rows:
        assert x == pytest.approx(v2[i - 1], abs=1e-8)


def test_project_components_literal_dot(spark, vecs):
    df, base = vecs
    comps = [[1.0] + [0.0] * (DIM - 1), [0.0, 1.0] + [0.0] * (DIM - 2)]
    rows = project_components(df, "v", comps).orderBy("vid").collect()
    for r in rows:
        assert r["pc1"] == pytest.approx(base[r["vid"]][0], abs=1e-9)
        assert r["pc2"] == pytest.approx(base[r["vid"]][1], abs=1e-9)


def test_pca_embed_production_parity(spark, vecs):
    df, base = vecs
    got = pca_embed(df, "v", DIM, k=1).orderBy("vid").collect()
    comps = top_components(gram_matrix(df, "v", DIM), DIM, k=1, steps=80)
    via_power = (
        project_components(df, "v", [comps[0][0]]).orderBy("vid").collect()
    )
    for a, b in zip(got, via_power):
        assert a["pc1"] == pytest.approx(b["pc1"], abs=1e-4)


def test_cluster_split_colocates_members(spark):
    rows = [(i, i % 17) for i in range(400)]  # 17 clusters
    df = spark.createDataFrame(rows, "doc_id long, cluster long")
    out = cluster_split(df, "cluster", {"train": 0.8, "test": 0.2})
    rep = split_leakage_report(out, "cluster", "split").collect()[0]
    assert rep["n_clusters"] == 17
    assert rep["n_spanning"] == 0
    assert rep["max_splits_per_cluster"] == 1
    # every split still non-trivially populated at these weights
    n_by = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(n_by) == {"train", "test"}


def test_naive_split_leaks_where_cluster_split_does_not(spark):
    # planted duplicate pairs: (i, i+10000) share cluster i
    rows = [(i, i) for i in range(200)] + [(i + 10000, i) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, cluster long")
    naive = hash_split(df, "doc_id", {"train": 0.8, "test": 0.2})
    safe = cluster_split(df, "cluster", {"train": 0.8, "test": 0.2})
    n_naive = split_leakage_report(naive, "cluster", "split").collect()[0][
        "n_spanning"
    ]
    n_safe = split_leakage_report(safe, "cluster", "split").collect()[0][
        "n_spanning"
    ]
    assert n_naive > 0
    assert n_safe == 0


def test_split_fractions_track_weights(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "cluster")
    out = cluster_split(df, "cluster", {"train": 0.7, "valid": 0.1, "test": 0.2})
    n_by = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert n_by["train"] / 5000 == pytest.approx(0.7, abs=0.03)
    assert n_by["valid"] / 5000 == pytest.approx(0.1, abs=0.02)
    assert n_by["test"] / 5000 == pytest.approx(0.2, abs=0.03)


def test_jl_topk_matches_brute_force(spark, vecs):
    from orientdb_etl_spark.functions.projections import jl_topk

    df, base = vecs
    q = [float(x) for x in base[0]]
    rows = jl_topk(df, "v", "vid", q, dim=DIM, out_dim=8, k=5, expand=6).collect()
    ids = [r["vid"] for r in rows]
    # exact brute force in numpy
    sims = (base @ np.array(q)) / (
        np.linalg.norm(base, axis=1) * np.linalg.norm(q)
    )
    assert ids[0] == 0  # the query vector itself survives the bottleneck
    # the anisotropic cloud has MANY near-tie cosines (≈0.99 apart by
    # <1e-3), which a JL bottleneck cannot and need not separate — the
    # right assertion is QUALITY, not identity: every returned neighbor
    # must be within a small margin of the exact 5th-best cosine
    fifth_best = float(np.sort(sims)[-5])
    for r in rows:
        assert float(sims[r["vid"]]) >= fifth_best - 0.02


def test_jl_topk_cosines_are_exact_for_returned_ids(spark, vecs):
    from orientdb_etl_spark.functions.projections import jl_topk

    df, base = vecs
    q = [float(x) for x in base[3]]
    rows = jl_topk(df, "v", "vid", q, dim=DIM, out_dim=8, k=5, expand=6).collect()
    for r in rows:
        ref = float(
            base[r["vid"]] @ np.array(q)
            / (np.linalg.norm(base[r["vid"]]) * np.linalg.norm(q))
        )
        # re-rank uses the EXACT vectors, not the reduced ones
        assert r["cosine_sim"] == pytest.approx(ref, abs=1e-9)


def test_stream_gram_equals_batch(spark, tmp_path, vecs):
    from orientdb_etl_spark.functions.projections import gram_matrix
    from orientdb_etl_spark.streaming.ops import (
        foreach_batch_gram,
        read_stream_gram,
    )

    df, base = vecs
    src = str(tmp_path / "src")
    for s in range(3):
        df.filter(F.col("vid") % 3 == s).coalesce(1).write.parquet(
            f"{src}/slice{s}"
        )
    allv = spark.read.parquet(f"{src}/slice*")
    out = str(tmp_path / "gram")
    q = (
        spark.readStream.schema(allv.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/slice*")
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(foreach_batch_gram(out, "v", DIM))
        .start()
    )
    q.awaitTermination()
    merged = {
        (r["i"], r["j"]): r["g"] for r in read_stream_gram(spark, out).collect()
    }
    batch = {
        (r["i"], r["j"]): r["g"] for r in gram_matrix(allv, "v", DIM).collect()
    }
    assert len(merged) == DIM * DIM
    for key, g in batch.items():
        assert merged[key] == pytest.approx(g, abs=1e-9)


def test_stream_gram_negative_witness(spark, tmp_path, vecs):
    """Losing an epoch directory must move the merged Gram away from the
    batch Gram — the certificate is falsifiable, not tautological."""
    import shutil

    from orientdb_etl_spark.functions.projections import gram_matrix
    from orientdb_etl_spark.streaming.ops import (
        foreach_batch_gram,
        read_stream_gram,
    )

    df, _ = vecs
    src = str(tmp_path / "src")
    for s in range(2):
        df.filter(F.col("vid") % 2 == s).coalesce(1).write.parquet(
            f"{src}/slice{s}"
        )
    allv = spark.read.parquet(f"{src}/slice*")
    out = str(tmp_path / "gram")
    q = (
        spark.readStream.schema(allv.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/slice*")
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(foreach_batch_gram(out, "v", DIM))
        .start()
    )
    q.awaitTermination()
    import glob

    epochs = sorted(glob.glob(f"{out}/epoch=*"))
    assert len(epochs) == 2
    shutil.rmtree(epochs[0])
    merged = {
        (r["i"], r["j"]): r["g"] for r in read_stream_gram(spark, out).collect()
    }
    batch = {
        (r["i"], r["j"]): r["g"] for r in gram_matrix(allv, "v", DIM).collect()
    }
    worst = max(abs(merged[k] - batch[k]) for k in batch)
    assert worst > 1e-6


# ---------------------------------------------------------------------------
# SQ8 scalar quantization
# ---------------------------------------------------------------------------


def test_sq8_roundtrip_error_bounded_by_half_step(spark):
    from orientdb_etl_spark.functions.projections import (
        sq8_quantize,
        sq8_reconstruct_expr,
        sq8_stats,
    )

    rows = [
        (1, [0.0, -1.0, 5.0]),
        (2, [1.0, 1.0, 5.0]),
        (3, [0.25, 0.4, 5.0]),
        (4, [0.7499, -0.33, 5.0]),
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    stats = sq8_stats(df, "v", dim=3)
    assert stats == [(0.0, 1.0), (-1.0, 1.0), (5.0, 5.0)]
    out = (
        sq8_quantize(df, "v", stats, out_col="q")
        .withColumn("r", sq8_reconstruct_expr("q", stats))
        .collect()
    )
    for row in out:
        assert all(0 <= c <= 255 for c in row.q)
        for x, xh, (mn, mx) in zip(row.v, row.r, stats):
            # reconstruction error <= half a code step (0 for const dims)
            assert abs(x - xh) <= (mx - mn) / 255.0 / 2.0 + 1e-12
    # constant dimension codes to 0 and reconstructs exactly
    assert all(r.q[2] == 0 and r.r[2] == 5.0 for r in out)


def test_sq8_exact_on_grid_points(spark):
    from orientdb_etl_spark.functions.projections import (
        sq8_quantize,
        sq8_reconstruct_expr,
        sq8_stats,
    )

    # values that sit exactly on the 255-step grid survive the round trip
    grid = [0.0, 51.0, 102.0, 255.0]
    df = spark.createDataFrame(
        [(i, [g]) for i, g in enumerate(grid)] , "id long, v array<double>"
    )
    stats = sq8_stats(df, "v", dim=1)
    out = (
        sq8_quantize(df, "v", stats, out_col="q")
        .withColumn("r", sq8_reconstruct_expr("q", stats))
        .collect()
    )
    for row in out:
        assert row.r[0] == row.v[0]
