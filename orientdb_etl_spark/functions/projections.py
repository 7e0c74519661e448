"""Embedding dimensionality reduction for curation at corpus scale.

The SemDeDup/clustering/ANN operators all get cheaper when the embedding
column is reduced from its source width (768-1536 in production corpora)
to a few tens of dimensions first.  This module provides the two standard
reductions as Spark-first operators:

- **Johnson-Lindenstrauss sign projection** (:func:`jl_project`): a
  data-independent ±1 random projection evaluated as UNROLLED codegen
  expressions — zero Python in the hot path, no shuffle, no fitted state.
  The sign matrix is derived from portable integer arithmetic (the same
  multiply-mod scheme as :mod:`sampling`), so any engine that can do
  int64 arithmetic reproduces it exactly — which is what makes the
  operator hash-checkable in DuckDB (:func:`jl_signs_sql`).
- **PCA via a one-pass Gram matrix + power iteration**
  (:func:`gram_matrix`, :func:`top_components`, :func:`project_components`):
  the corpus is touched ONCE to build the d×d second-moment matrix
  (Arrow-batched partial ``X.T @ X`` per partition — the map-side combine
  IS the algorithm: each partition emits d² partial cells, the one shuffle
  carries ``partitions × d²`` rows, never the corpus), after which every
  eigenvector iteration runs on d×d state only.  Driver state is d²
  doubles — the same bounded-by-construction shape as k-means' k×d
  centroids; for d beyond ~20k use :func:`power_iteration_distributed`,
  which keeps the Gram distributed and collects only the d-sized vector
  per step.
- **Production path** (:func:`pca_embed`): same one-pass Gram, then
  ``numpy.linalg.eigh`` on the driver; the components come back as plain
  float literals so the projection itself stays JVM-side codegen (no UDF).
  Parity with the portable power-iteration path is pinned by test.

Reference parity: the reference ETL (orientdb-etl, Java) has no linear
algebra surface at all; this family exists for the LLM-pipeline side of
the brief (reduce → cluster → SemDeDup / IVF).
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared with sampling.py: Knuth's odd 32-bit multiplicative constant and
# a ~2^20 prime. NOTE the operation ORDER differs from hash_bucket on
# purpose — see jl_sign.
_MULT = 2654435761
_PRIME = 1_000_003


def jl_sign(i: int, j: int, seed: int = 42) -> int:
    """±1 sign for (input dim ``i``, output dim ``j``), both 1-indexed.

    Two SQUARING rounds before the parity: any purely multiplicative
    (linear) mix fails here — adjacent rows of a linear-hash sign matrix
    differ by a FIXED offset mod the prime, so their parities are near-
    perfectly anti-correlated (measured −0.94 on the first attempt: a
    quasi-checkerboard, i.e. a rank-deficient projection, not a random
    one). Squaring makes the step between adjacent rows depend on the
    value itself; with two rounds the 64×64 sign matrix's worst
    off-diagonal row correlation is 0.53 ≈ 4/sqrt(64) — exactly the
    random-matrix envelope (pinned by test). All intermediates stay far
    below 2^63 for any i, j (the first mod bounds x, so x² < 10^12), so
    the arithmetic is overflow-free in engines that error on BIGINT
    overflow (DuckDB) as well as ones that wrap.
    """
    x = (i * 131 + j * 137 + seed) % _PRIME
    y = (x * x + i * 193 + j * 389) % _PRIME
    return 1 - 2 * ((((y * y) % _PRIME) * _MULT % _PRIME) % 2)


def jl_project(
    df: DataFrame,
    vec_col: str,
    dim: int,
    out_dim: int = 8,
    seed: int = 42,
    prefix: str = "jl",
) -> DataFrame:
    """Append ``out_dim`` columns ``{prefix}1..{prefix}m`` with the scaled
    sign projection ``y_j = (1/sqrt(m)) * sum_i x_i * s(i, j)``.

    The whole operator is one ``select`` of unrolled literal-coefficient
    sums — per-row codegen, no shuffle, no fitted state, so it composes
    with any upstream scan and survives any repartitioning.  E‖y_a−y_b‖²
    = ‖x_a−x_b‖² (the JL guarantee); :func:`jl_distortion` measures the
    realized spread on concrete pairs.
    """
    inv = 1.0 / math.sqrt(out_dim)
    # build each output as ONE SQL string parsed by a single F.expr call:
    # constructing dim×out_dim Column objects through the Python API is
    # thousands of py4j round-trips (~9 s of driver time at 64×16 before
    # any execution); the parsed tree — left-associated sum of
    # cast(element_at)·cast(literal) products — is operator-identical
    outs: list[Column] = []
    for j in range(1, out_dim + 1):
        terms = " + ".join(
            f"cast(element_at({vec_col}, {i}) as double) * "
            f"cast({float(jl_sign(i, j, seed))!r} as double)"
            for i in range(1, dim + 1)
        )
        outs.append(
            F.expr(f"({terms}) * cast({inv!r} as double)").alias(
                f"{prefix}{j}"
            )
        )
    return df.select("*", *outs)


def jl_signs_sql(dim: int, out_dim: int, seed: int = 42) -> str:
    """CTE body (ANSI SQL) producing the (i, j, s) sign table with the
    exact :func:`jl_sign` arithmetic — the DuckDB oracle's replay."""
    return (
        f"SELECT i, j, 1 - 2 * ((((y * y) % {_PRIME}) * {_MULT} % {_PRIME}) % 2) AS s "
        f"FROM (SELECT i, j, ((x * x + i * 193 + j * 389) % {_PRIME}) AS y "
        f"FROM (SELECT i, j, ((i * 131 + j * 137 + {seed}) % {_PRIME}) AS x "
        f"FROM range(1, {dim + 1}) d(i), range(1, {out_dim + 1}) o(j)))"
    )


def jl_distortion(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    out_dim: int = 16,
    seed: int = 42,
) -> DataFrame:
    """One-row distortion certificate for the sign projection: pair each
    even id with id+1, compute ‖Δy‖²/‖Δx‖² per pair, return
    (n_pairs, min/avg/max ratio).  Both norms are unrolled codegen sums;
    the pairing is an id-shifted self-join (broadcast-sized at the
    fixtures, key-partitioned at scale)."""
    # pair (2k, 2k+1) via ONE groupBy on the pair key instead of an
    # id-shifted self-join: the join evaluated the dim×out_dim unrolled
    # projection on BOTH sides (twice per row) and shuffled the
    # projected rows through the join — the grouped form projects once
    # and aggregates. (a−b)² == (max−min)² per dimension for the
    # 2-member group (ids are unique by contract), same doubles in the
    # same per-dimension order, so the ratios are bit-identical.
    proj = jl_project(df, vec_col, dim, out_dim, seed, prefix="_y")
    grp = proj.groupBy(
        F.floor(F.col(id_col) / 2).alias("_pk")
    ).agg(
        F.count(F.lit(1)).alias("_c"),
        *[
            agg(f"_y{j}").alias(f"_{mm}y{j}")
            for j in range(1, out_dim + 1)
            for mm, agg in (("a", F.max), ("b", F.min))
        ],
        *[
            agg(F.element_at(F.col(vec_col), i).cast("double")).alias(
                f"_{mm}x{i}"
            )
            for i in range(1, dim + 1)
            for mm, agg in (("a", F.max), ("b", F.min))
        ],
    )
    dy2 = " + ".join(
        f"(_ay{j} - _by{j}) * (_ay{j} - _by{j})"
        for j in range(1, out_dim + 1)
    )
    dx2 = " + ".join(
        f"(_ax{i} - _bx{i}) * (_ax{i} - _bx{i})" for i in range(1, dim + 1)
    )
    pairs = (
        grp.filter(F.col("_c") == 2)
        .select(F.expr(f"({dy2}) / ({dx2})").alias("ratio"))
        .filter(F.col("ratio").isNotNull())
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.min("ratio"), 4).alias("min_ratio"),
        F.round(F.avg("ratio"), 4).alias("avg_ratio"),
        F.round(F.max("ratio"), 4).alias("max_ratio"),
    )


def gram_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One-pass d×d second-moment matrix as (i, j, g) rows, 1-indexed.

    Arrow-batched partial ``X.T @ X`` per partition: each partition emits
    exactly d² cells regardless of its row count, so the single shuffle
    carries ``num_partitions × d²`` rows — never the corpus.  float32
    inputs are widened to float64 before the products (exact), matching
    the DuckDB replay's ``::DOUBLE[]`` cast.
    """
    import numpy as np  # noqa: F401 — imported here so the closure ships it
    import pandas as pd

    def _partial(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        acc = np.zeros((dim, dim), dtype=np.float64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(
                [np.asarray(r, dtype=np.float64) for r in pdf[vec_col]],
                dtype=np.float64,
            )
            acc += X.T @ X
            seen = True
        if not seen:
            return
        ii, jj = np.meshgrid(
            np.arange(1, dim + 1), np.arange(1, dim + 1), indexing="ij"
        )
        yield pd.DataFrame(
            {"i": ii.ravel(), "j": jj.ravel(), "g": acc.ravel()}
        )

    return (
        df.select(vec_col)
        .mapInPandas(_partial, "i int, j int, g double")
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )


def gram_matrix_expr(df: DataFrame, vec_col: str, id_col: str, dim: int) -> DataFrame:
    """Expression-only Gram twin (posexplode self-join, N×d² shuffle rows)
    — the oracle-shaped variant used to pin the Arrow path by test.  Use
    :func:`gram_matrix` in production; this one scales with N×d², not d²."""
    e = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("_p", "_x"),
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a._id") == F.col("b._id"))
        .groupBy(
            (F.col("a._p") + 1).alias("i"), (F.col("b._p") + 1).alias("j")
        )
        .agg(F.sum(F.col("a._x") * F.col("b._x")).alias("g"))
    )


def gram_sql(table: str, vec_col: str, dim: int) -> str:
    """CTE body replaying :func:`gram_matrix` in ANSI SQL (1-indexed list
    access; DuckDB lists are 1-indexed natively)."""
    return (
        f"SELECT d1.i AS i, d2.i AS j, "
        f"SUM(({vec_col}::DOUBLE[])[d1.i] * ({vec_col}::DOUBLE[])[d2.i]) AS g "
        f"FROM {table}, range(1, {dim + 1}) d1(i), range(1, {dim + 1}) d2(i) "
        f"GROUP BY 1, 2"
    )


def _sign_fix(v: list[float]) -> list[float]:
    """Deterministic sign convention: the loading with the largest |value|
    (ties: smallest index) is made positive — same rule as the SQL replay."""
    k = max(range(len(v)), key=lambda i: (abs(v[i]), -i))
    return [-x for x in v] if v[k] < 0 else list(v)


def _collect_gram(gram: DataFrame | Sequence[Sequence[float]], dim: int):
    if isinstance(gram, DataFrame):
        G = [[0.0] * dim for _ in range(dim)]
        for r in gram.collect():  # bounded: d² cells by construction
            G[r["i"] - 1][r["j"] - 1] = float(r["g"])
        return G
    return [list(row) for row in gram]


def power_iteration(
    gram: DataFrame | Sequence[Sequence[float]],
    dim: int,
    steps: int = 30,
) -> tuple[list[float], float]:
    """Leading eigenvector of the Gram matrix by fixed-step power
    iteration from the uniform start vector ``1/sqrt(d)``.

    Driver state is the d² Gram plus one d-vector (k-means-centroid-shaped
    bounded state; see :func:`power_iteration_distributed` for the
    d-beyond-driver variant).  A FIXED step count — not a convergence
    test — keeps the arithmetic exactly replayable in the SQL oracle
    (:func:`power_iteration_sql`): both engines run the same trajectory
    whether or not it has converged.  Returns (sign-fixed unit vector,
    Rayleigh quotient v'Gv)."""
    G = _collect_gram(gram, dim)
    v = [1.0 / math.sqrt(dim)] * dim
    for _ in range(steps):
        w = [sum(G[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        nrm = math.sqrt(sum(x * x for x in w))
        v = [x / nrm for x in w]
    lam = sum(v[i] * G[i][j] * v[j] for i in range(dim) for j in range(dim))
    return _sign_fix(v), lam


def top_components(
    gram: DataFrame | Sequence[Sequence[float]],
    dim: int,
    k: int = 2,
    steps: int = 30,
) -> list[tuple[list[float], float]]:
    """Top-k eigenpairs by power iteration with Hotelling deflation:
    after each component, ``G ← G − λ v v'``.  The Gram is collected ONCE;
    every subsequent iteration is d² driver arithmetic."""
    G = _collect_gram(gram, dim)
    out: list[tuple[list[float], float]] = []
    for _ in range(k):
        v, lam = power_iteration(G, dim, steps)
        out.append((v, lam))
        for i in range(dim):
            for j in range(dim):
                G[i][j] -= lam * v[i] * v[j]
    return out


def power_iteration_distributed(
    gram: DataFrame, dim: int, steps: int = 30
) -> tuple[list[float], float]:
    """Power iteration keeping the Gram DISTRIBUTED: each step broadcasts
    the current d-vector, joins it against the (i, j, g) cells, and
    collects only the d-sized result — the k-means update loop shape.
    Use when d² no longer fits the driver (e.g. vocabulary co-occurrence
    PCA at d ~ 10^5, where the Gram is 10^10 cells but a step's output is
    still just d rows)."""
    spark = gram.sparkSession
    gram = gram.cache()
    try:
        v = [1.0 / math.sqrt(dim)] * dim
        for _ in range(steps):
            vdf = spark.createDataFrame(
                [(j + 1, x) for j, x in enumerate(v)], "j int, x double"
            )
            rows = (
                gram.join(F.broadcast(vdf), "j")
                .groupBy("i")
                .agg(F.sum(F.col("g") * F.col("x")).alias("w"))
                .collect()
            )
            w = [0.0] * dim
            for r in rows:
                w[r["i"] - 1] = float(r["w"])
            nrm = math.sqrt(sum(x * x for x in w))
            v = [x / nrm for x in w]
        vdf = spark.createDataFrame(
            [(j + 1, x) for j, x in enumerate(v)], "j int, x double"
        )
        lam_row = (
            gram.join(F.broadcast(vdf), "j")
            .join(
                F.broadcast(vdf.withColumnRenamed("j", "i").withColumnRenamed("x", "xi")),
                "i",
            )
            .agg(F.sum(F.col("g") * F.col("x") * F.col("xi")).alias("lam"))
            .collect()[0]
        )
        return _sign_fix(v), float(lam_row["lam"])
    finally:
        gram.unpersist()


def power_iteration_sql(
    gram_cte: str,
    dim: int,
    steps: int = 30,
    vec_name: str = "v",
    materialized: bool = True,
) -> str:
    """Chain of CTE bodies replaying :func:`power_iteration` — matrix-
    vector product + normalize per step, uniform start, then the same
    max-|loading| sign fix.  ``gram_cte`` is the NAME of an in-scope
    (i, j, g) CTE.  Emits CTEs ``{vec_name}0..{vec_name}{steps}`` plus
    ``{vec_name}_final`` (columns i, x) and ``{vec_name}_lam``
    (column lam); splice into a WITH chain.

    ``materialized=True`` (the default, DuckDB syntax) is load-bearing:
    every step references its predecessor twice (the product and the
    norm subquery), so an INLINING planner doubles the expression tree
    per step — exponential in ``steps`` (the kcore/lpa/kmeans rounds-SQL
    generators hit the same blowup; same fix)."""
    mat = "MATERIALIZED " if materialized else ""
    parts = [
        f"{vec_name}0(i, x) AS {mat}(SELECT i, 1.0 / sqrt({dim}) "
        f"FROM range(1, {dim + 1}) d(i))"
    ]
    prev = f"{vec_name}0"
    for s in range(1, steps + 1):
        w = f"{vec_name}w{s}"
        cur = f"{vec_name}{s}"
        parts.append(
            f"{w}(i, x) AS {mat}(SELECT g.i, SUM(g.g * p.x) FROM {gram_cte} g "
            f"JOIN {prev} p ON p.i = g.j GROUP BY g.i)"
        )
        parts.append(
            f"{cur}(i, x) AS {mat}(SELECT i, x / (SELECT sqrt(SUM(x * x)) FROM {w}) "
            f"FROM {w})"
        )
        prev = cur
    parts.append(
        f"{vec_name}_final(i, x) AS {mat}(SELECT i, x * (SELECT CASE WHEN x < 0 "
        f"THEN -1 ELSE 1 END FROM {prev} ORDER BY abs(x) DESC, i ASC LIMIT 1) "
        f"FROM {prev})"
    )
    parts.append(
        f"{vec_name}_lam(lam) AS {mat}(SELECT SUM(g.g * a.x * b.x) FROM {gram_cte} g "
        f"JOIN {vec_name}_final a ON a.i = g.i "
        f"JOIN {vec_name}_final b ON b.i = g.j)"
    )
    return ", ".join(parts)


def deflate_sql(
    gram_cte: str, vec_name: str, out_cte: str, materialized: bool = True
) -> str:
    """CTE body for Hotelling deflation: ``G − λ v v'`` over the (i, j, g)
    cells, pairing :func:`power_iteration_sql`'s ``{vec_name}_final`` and
    ``{vec_name}_lam``.  ``materialized`` as in :func:`power_iteration_sql`
    (the deflated Gram feeds every step of the next component's chain)."""
    mat = "MATERIALIZED " if materialized else ""
    return (
        f"{out_cte}(i, j, g) AS {mat}(SELECT g.i, g.j, "
        f"g.g - (SELECT lam FROM {vec_name}_lam) * a.x * b.x "
        f"FROM {gram_cte} g "
        f"JOIN {vec_name}_final a ON a.i = g.i "
        f"JOIN {vec_name}_final b ON b.i = g.j)"
    )


def project_components(
    df: DataFrame,
    vec_col: str,
    components: Iterable[Sequence[float]],
    prefix: str = "pc",
) -> DataFrame:
    """Append ``{prefix}1..{prefix}k`` dot-product columns.  The loadings
    arrive as plain floats and become literal coefficients in an unrolled
    codegen sum — the projection itself never leaves the JVM, regardless
    of how the components were fitted (power iteration or numpy)."""
    v = F.col(vec_col)
    outs: list[Column] = []
    for c, comp in enumerate(components, start=1):
        expr: Column | None = None
        for i, coef in enumerate(comp, start=1):
            term = F.element_at(v, i).cast("double") * F.lit(float(coef))
            expr = term if expr is None else expr + term
        outs.append(expr.alias(f"{prefix}{c}"))
    return df.select("*", *outs)


def pca_embed(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int = 2,
    prefix: str = "pc",
) -> DataFrame:
    """Production PCA: one-pass Arrow Gram → ``numpy.linalg.eigh`` on the
    driver (d² bounded state) → JVM-side literal projection.  Components
    carry the same sign convention as :func:`power_iteration`; parity
    between the two fitters is pinned by test (|cos| of the leading
    component > 0.999 at the fixtures)."""
    import numpy as np

    G = np.array(_collect_gram(gram_matrix(df, vec_col, dim), dim))
    vals, vecs = np.linalg.eigh(G)
    comps = [
        _sign_fix([float(x) for x in vecs[:, -c]]) for c in range(1, k + 1)
    ]
    return project_components(df, vec_col, comps, prefix)


def jl_project_vector(
    q: Sequence[float], dim: int, out_dim: int, seed: int = 42
) -> list[float]:
    """Driver-side twin of :func:`jl_project` for a single query vector
    (same signs, same 1/sqrt(m) scale) — the reduced query becomes
    literal coefficients in :func:`jl_topk`'s candidate scorer."""
    inv = 1.0 / math.sqrt(out_dim)
    return [
        inv * sum(float(q[i - 1]) * jl_sign(i, j, seed) for i in range(1, dim + 1))
        for j in range(1, out_dim + 1)
    ]


def jl_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    dim: int,
    out_dim: int = 16,
    k: int = 10,
    expand: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k through the JL bottleneck: score every row by COSINE in
    the REDUCED space (out_dim multiplies per row instead of dim — the
    scan gets dim/out_dim× cheaper), keep the top ``k×expand``
    candidates (TakeOrderedAndProject — no shuffle, no window), then
    re-rank just those by exact cosine.  Returns (id, cosine_sim) for
    the final top k, ties broken by id.

    The candidate cut normalizes by the per-row reduced norm rather than
    ranking raw dot products: a raw dot-product cut is norm-biased (a
    small-norm query loses to any large-norm row pointing the same way
    — it can miss ITSELF), while reduced cosine is scale-invariant and
    tracks the exact-cosine ranking the re-rank uses.

    Everything is literal-coefficient codegen (the reduced query comes
    from :func:`jl_project_vector`), so the whole pipeline — signs,
    projection, candidate cut, exact re-rank — replays relationally in
    the SQL oracle; unlike the gaussian-plane LSH path there is no
    pinned-recall certificate, the result itself is hash-checked.
    """
    yq = jl_project_vector(query, dim, out_dim, seed)
    yqn = math.sqrt(sum(c * c for c in yq)) or 1.0
    proj = jl_project(df, vec_col, dim, out_dim, seed, prefix="_jl")
    rdot: Column | None = None
    rnrm: Column | None = None
    for j, c in enumerate(yq, start=1):
        y = F.col(f"_jl{j}")
        term = y * F.lit(float(c))
        rdot = term if rdot is None else rdot + term
        rnrm = y * y if rnrm is None else rnrm + y * y
    # scale-invariant reduced cosine; zero-norm rows rank below any real
    # cosine instead of promoting to NaN (NaN sorts ABOVE all doubles)
    score = F.when(rnrm > 0, rdot / (F.sqrt(rnrm) * F.lit(yqn))).otherwise(
        F.lit(-2.0)
    )
    cands = (
        proj.withColumn("_red_score", score)
        .orderBy(F.col("_red_score").desc(), F.col(id_col).asc())
        .limit(k * expand)
    )
    v = F.col(vec_col)
    dot: Column | None = None
    nrm: Column | None = None
    qn = math.sqrt(sum(float(x) * float(x) for x in query))
    for i in range(1, dim + 1):
        x = F.element_at(v, i).cast("double")
        t = x * F.lit(float(query[i - 1]))
        dot = t if dot is None else dot + t
        nrm = x * x if nrm is None else nrm + x * x
    cos = dot / (F.sqrt(nrm) * F.lit(qn))
    return (
        cands.select(F.col(id_col), cos.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def sq8_stats(
    df: DataFrame, vec_col: str, dim: int
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) of an embedding column — the fitted
    state of :func:`sq8_quantize`. ONE whole-stage-codegen aggregation
    (2·dim agg expressions over element_at, no explode, no shuffle
    beyond the final combine); driver state is 2·dim doubles (the
    k-means/PCA bounded-driver-state discipline). min/max are exact
    and order-free, so any engine reproduces them bit-for-bit."""
    v = F.col(vec_col).cast("array<double>")
    aggs = []
    for i in range(1, int(dim) + 1):
        aggs.append(F.min(F.element_at(v, i)).alias(f"_mn{i}"))
        aggs.append(F.max(F.element_at(v, i)).alias(f"_mx{i}"))
    row = df.agg(*aggs).first()
    return [
        (row[f"_mn{i}"], row[f"_mx{i}"]) for i in range(1, int(dim) + 1)
    ]


def sq8_quantize(
    df: DataFrame,
    vec_col: str,
    stats: list[tuple[float, float]],
    out_col: str = "q8",
) -> DataFrame:
    """Scalar int8 quantization (the FAISS ScalarQuantizer / SQ8
    shape): each dimension maps affinely onto the 0..255 code grid —
    ``q_i = clamp(round((x_i − min_i)·255/(max_i − min_i)), 0, 255)``
    — cutting vector bytes 4-8× ahead of ANN/clustering while keeping
    recall near-exact. Constant dimensions (max = min) code to 0.

    The fitted ``stats`` bake in as LITERAL arrays, so the projection
    is pure unrolled codegen over the corpus — no join, no shuffle, no
    Python; the single-expression affine map is engine-portable
    (identical AST → identical doubles → identical rounding) which is
    what makes the certificate row hash-checkable."""
    # UNROLLED per-dimension map with scalar literals: an
    # element_at(<array literal>, i) inside a transform lambda is NOT
    # constant-folded — the dim-element array rebuilds per element per
    # row (dim² literal evals/row; the certificate's measured hot
    # spot). The constant-dimension branch resolves at build time (the
    # same exact-double compare the CASE did).
    cells = []
    for i, (mn_i, mx_i) in enumerate(stats, start=1):
        if mx_i == mn_i:
            cells.append("cast(0.0 as int)")
        else:
            cells.append(
                f"cast(greatest(least(round("
                f"(element_at(cast({vec_col} as array<double>), {i}) "
                f"- cast({float(mn_i)!r} as double)) * 255.0 "
                f"/ (cast({float(mx_i)!r} as double) "
                f"- cast({float(mn_i)!r} as double))), 255.0), 0.0) as int)"
            )
    return df.withColumn(out_col, F.expr("array(" + ", ".join(cells) + ")"))


def sq8_reconstruct_expr(
    q_col: str, stats: list[tuple[float, float]]
) -> F.Column:
    """Dequantize an SQ8 code array back to ``array<double>``:
    ``x̂_i = min_i + q_i·(max_i − min_i)/255`` — the asymmetric-distance
    (ADC) side of the certificate: queries stay exact, the corpus is
    reconstructed from codes."""
    # unrolled per-dimension affine map (see sq8_quantize: array
    # literals inside transform lambdas re-evaluate per element)
    cells = [
        f"cast({float(mn_i)!r} as double) + element_at({q_col}, {i}) * "
        f"(cast({float(mx_i)!r} as double) "
        f"- cast({float(mn_i)!r} as double)) / 255.0"
        for i, (mn_i, mx_i) in enumerate(stats, start=1)
    ]
    return F.expr("array(" + ", ".join(cells) + ")")
