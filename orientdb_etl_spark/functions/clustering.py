"""Distributed k-means over embedding columns — Lloyd's algorithm on an
integer-quantized grid so every round replays bit-identically in a SQL
oracle.

Why quantize: float centroid means are grouped float folds, which are
not bit-associative — two engines (or two partitionings) legitimately
disagree in the last ulp, and after a few rounds one flipped boundary
assignment cascades into different clusters. Quantizing each coordinate
to ``floor(x * scale)`` (scale a power of two — FLOAT→DOUBLE widening
and the multiply are both exact) makes every distance an exact BIGINT
and every centroid update an exact integer division with an explicit
round-half-up rule, so k-means becomes a deterministic integer program:
any engine that follows the same rules lands on the same clusters.

Scale shape (the IVF discipline from :mod:`similarity`): the only
driver-side state is the k×dims centroid table collected once per round
(bounded, like ``ivf_index``'s centroids); assignment is a single
narrow map over the quantized vectors with the centroids broadcast as
literals (k·dims comparisons per row, no shuffle); the update is ONE
hash-aggregate on (cluster, dim-wise sums) per round. ``rounds`` is a
fixed small constant — this is the bounded-iteration rule the dedup
connected-components follows, not an unbounded convergence loop.

Reference scope note: the reference ETL (OETLProcessor.java:252-283) has
no clustering surface; this extends the §2.8 analytics layer the same
way similarity.py does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmeans_quantized",
    "kmeans_cluster_stats",
    "kmeans_rounds_sql",
    "clustering_agreement",
    "clustering_agreement_sql",
]

#: Knuth multiplicative constant — the repo-wide portable hash (sampling.py).
_KNUTH = 2654435761
_MOD = 1000003


def _quantize(vec_col: str, scale: int) -> F.Column:
    # FLOAT → DOUBLE widening is exact; scale is a power of two so the
    # multiply is exact; floor of an exact double is engine-independent
    return F.expr(
        f"transform({vec_col}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
    )


def _seed_centroids(
    q: DataFrame, id_col: str, k: int, seed: int
) -> list[list[int]]:
    """First ``k`` quantized vectors in Knuth-hash order of the id — a
    deterministic, engine-portable 'random' seed pick; the collect is
    k rows (driver-bounded by construction)."""
    rows = (
        q.select(
            "_q",
            F.expr(
                f"({id_col} + {seed}) % {_MOD} * {_KNUTH} % {_MOD}"
            ).alias("_h"),
            F.col(id_col).alias("_id"),
        )
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    return [list(r["_q"]) for r in rows]


def _dist2(cent: list[int]) -> F.Column:
    arr = F.array(*[F.lit(int(c)).cast("long") for c in cent])
    return F.aggregate(
        F.zip_with("_q", arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(q: DataFrame, cents: list[list[int]]) -> DataFrame:
    dists = F.array(*[_dist2(c) for c in cents])
    return q.withColumn("_dists", dists).select(
        "*",
        (F.array_position(F.col("_dists"), F.array_min("_dists")) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min("_dists").alias("_d2"),
    )


def kmeans_quantized(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    rounds: int = 2,
    scale: int = 1024,
    seed: int = 7,
) -> tuple[DataFrame, list[list[int]]]:
    """Run ``rounds`` Lloyd iterations and return ``(assignments,
    centroids)`` where assignments carries ``(id_col, cluster, _d2)``
    for the FINAL assignment against the round-``rounds`` centroids,
    and centroids is the final integer centroid table.

    Update rule: per-cluster per-dim integer mean with explicit
    round-half-up, ``floor((2·sum + n) / (2·n))`` — both engines divide
    exact integers as doubles and floor, and the quotient can never sit
    within an ulp of an integer for these magnitudes, so the result is
    engine-independent. A cluster that receives no members keeps its
    previous centroid (deterministic; the oracle replicates via left
    join + coalesce).
    """
    q, cents = _kmeans_rounds(df, vec_col, id_col, k, rounds, scale, seed)
    # materialize the final assignment (executor-side, one narrow row
    # per vector) so the round-cached quantized frame can be released —
    # the cache-discipline rule from SCALE.md: whoever caches, unpersists
    final = (
        _assign(q, cents)
        .select(F.col(id_col), "cluster", F.col("_d2").alias("dist2"))
        .localCheckpoint(eager=True)
    )
    q.unpersist()
    return final, cents


def _kmeans_rounds(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    rounds: int,
    scale: int,
    seed: int,
) -> tuple[DataFrame, list[list[int]]]:
    """Shared Lloyd loop: returns the CACHED quantized frame (caller
    must unpersist) and the round-``rounds`` centroids. The dimension
    count comes from the seed centroids themselves — the old separate
    ``df.first()`` probe was one whole extra job per call."""
    q = (
        df.select(F.col(id_col), _quantize(vec_col, scale).alias("_q"))
        .where(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
        .cache()
    )
    cents = _seed_centroids(q, id_col, k, seed)
    if not cents:
        raise ValueError("kmeans: input has no non-null vectors")
    dims = len(cents[0])
    for _ in range(int(rounds)):
        asg = _assign(q, cents)
        sums = (
            asg.select(
                "cluster", F.posexplode("_q").alias("dim", "v")
            )
            .groupBy("cluster", "dim")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = (
                r["s"],
                r["n"],
            )
        new_cents = []
        for j in range(k):
            if j in by_cluster:
                new_cents.append(
                    [
                        _int_mean(*by_cluster[j][d])
                        for d in range(dims)
                    ]
                )
            else:
                new_cents.append(cents[j])
        cents = new_cents
    return q, cents


def _int_mean(s: int, n: int) -> int:
    """floor((2s + n) / (2n)) — round-half-up integer mean, written in
    plain integer arithmetic so the driver-side fold is exact."""
    import math

    return math.floor((2 * s + n) / (2 * n)) if n else 0


def kmeans_cluster_stats(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    rounds: int = 2,
    scale: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Gate-facing wrapper: ``(cluster, n, inertia)`` per final cluster,
    ordered by cluster id — inertia is the exact BIGINT sum of squared
    quantized distances, so the whole result hash-matches the unrolled
    SQL twin (:func:`kmeans_rounds_sql`)."""
    final, _ = kmeans_quantized(
        df, vec_col, id_col, k=k, rounds=rounds, scale=scale, seed=seed
    )
    return (
        final.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dist2").alias("inertia"),
        )
        .orderBy("cluster")
    )


def kmeans_rounds_sql(
    k: int = 8,
    rounds: int = 2,
    scale: int = 1024,
    seed: int = 7,
    table: str = "embeddings",
    vec: str = "embedding",
    id_col: str = "vec_id",
    materialized: bool = True,
) -> str:
    """Portable unrolled twin of :func:`kmeans_cluster_stats` — one
    generator, both engines' constants. Distances via zipped parallel
    unnest (value + subscript), centroid updates via the same
    ``floor((2s + n) / (2n))`` rule, empty clusters keep the previous
    centroid through a left join + coalesce. MATERIALIZED CTEs: DuckDB
    inlines plain CTEs at every reference site, and the round
    recursion references each centroid table k times."""
    mat = "MATERIALIZED " if materialized else ""
    parts = [
        # quantized vectors exploded to (id, dim, v) once
        f"qv AS {mat}(SELECT {id_col} AS id, "
        f"list_transform({vec}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS q "
        f"FROM {table} WHERE {id_col} IS NOT NULL "
        f"AND {vec} IS NOT NULL)",
        f"qd AS {mat}(SELECT id, unnest(q) AS v, "
        f"CAST(unnest(range(1, len(q) + 1)) AS INTEGER) AS dim FROM qv)",
        # seed pick: first k ids in Knuth-hash order, cluster = rank
        f"seed AS {mat}(SELECT id, CAST(row_number() OVER (ORDER BY "
        f"(id + {seed}) % {_MOD} * {_KNUTH} % {_MOD}, id) - 1 AS INTEGER) "
        f"AS cluster FROM qv ORDER BY "
        f"(id + {seed}) % {_MOD} * {_KNUTH} % {_MOD}, id LIMIT {k})",
        f"c0 AS {mat}(SELECT seed.cluster, qd.dim, qd.v AS c "
        f"FROM seed JOIN qd USING (id))",
    ]
    for r in range(1, int(rounds) + 1):
        prev = f"c{r-1}"
        parts.append(
            # per-(id, cluster) exact integer distance, then argmin with
            # min-cluster tie-break (matches array_position-of-first)
            f"d{r} AS {mat}(SELECT qd.id, {prev}.cluster, "
            f"sum((qd.v - {prev}.c) * (qd.v - {prev}.c)) AS d2 "
            f"FROM qd JOIN {prev} USING (dim) GROUP BY 1, 2)"
        )
        parts.append(
            f"a{r} AS {mat}(SELECT id, cluster FROM ("
            f"SELECT id, cluster, row_number() OVER (PARTITION BY id "
            f"ORDER BY d2, cluster) AS rn FROM d{r}) WHERE rn = 1)"
        )
        parts.append(
            f"m{r} AS {mat}(SELECT a{r}.cluster, qd.dim, "
            f"CAST(floor((2 * sum(qd.v) + count(*)) / "
            f"(2 * count(*))) AS BIGINT) AS c "
            f"FROM a{r} JOIN qd USING (id) GROUP BY 1, 2)"
        )
        parts.append(
            f"c{r} AS {mat}(SELECT {prev}.cluster, {prev}.dim, "
            f"coalesce(m{r}.c, {prev}.c) AS c FROM {prev} "
            f"LEFT JOIN m{r} ON m{r}.cluster = {prev}.cluster "
            f"AND m{r}.dim = {prev}.dim)"
        )
    rr = int(rounds)
    parts.append(
        f"df AS {mat}(SELECT qd.id, c{rr}.cluster, "
        f"sum((qd.v - c{rr}.c) * (qd.v - c{rr}.c)) AS d2 "
        f"FROM qd JOIN c{rr} USING (dim) GROUP BY 1, 2)"
    )
    parts.append(
        f"af AS {mat}(SELECT id, cluster, d2 FROM ("
        f"SELECT id, cluster, d2, row_number() OVER (PARTITION BY id "
        f"ORDER BY d2, cluster) AS rn FROM df) WHERE rn = 1)"
    )
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT cluster, count(*) AS n, "
        "CAST(sum(d2) AS BIGINT) AS inertia FROM af "
        "GROUP BY cluster ORDER BY cluster"
    )


def clustering_agreement(
    df: DataFrame,
    pred_col: str,
    gold_col: str,
    round_to: int = 6,
) -> DataFrame:
    """External clustering-quality metrics — how well a predicted
    partition (e.g. near-dup cluster labels, k-means cells, blocking
    keys) recovers a gold partition: B-cubed precision/recall/F1
    (Bagga & Baldwin '98 — the coreference/dedup standard, per-ITEM
    averaged so giant clusters can't swamp the score) and the Adjusted
    Rand Index (Hubert & Arabie '85 — pair-counting agreement,
    chance-corrected, 1 = identical partitions, ~0 = random).

    One row: ``(n_items, bcubed_precision, bcubed_recall, bcubed_f1,
    ari)``. NULL labels on either side are excluded.

    Determinism/portability: every statistic reduces to exact integer
    pair counts — per-(pred, gold) cell sizes and the two marginal
    cluster sizes. The B³ means sum per-cell INTEGER-NANO
    contributions (``round(1e9·n_pg²/n_p)``) so cross-cell addition is
    order-free; ARI is integer combinatorics with one final division —
    a SQL oracle replays both bit-for-bit.

    Scale shape: ONE corpus-sized aggregation to the contingency cells
    (cells ≤ |pred clusters|·|gold clusters|, in practice ≈ max side),
    two cell-sized aggregations for the marginals, two broadcast-sized
    joins back — never a pair materialization (the naive Rand index
    over item pairs is O(n²); the cell form is exactly why it's
    computable at corpus scale).
    """
    base = df.select(
        F.col(pred_col).alias("_p"), F.col(gold_col).alias("_g")
    ).where(F.col(pred_col).isNotNull() & F.col(gold_col).isNotNull())
    cells = base.groupBy("_p", "_g").agg(F.count(F.lit(1)).alias("_npg"))
    pm = cells.groupBy("_p").agg(F.sum("_npg").alias("_np"))
    gm = cells.groupBy("_g").agg(F.sum("_npg").alias("_ng"))
    j = cells.join(pm, "_p").join(gm, "_g")
    nano = 1_000_000_000
    stats = j.agg(
        F.sum("_npg").alias("_n"),
        # B³: Σ_cells n_pg · (n_pg / n_p) — per-cell nano-pinned
        F.sum(
            F.round(
                F.lit(float(nano))
                * F.col("_npg")
                * F.col("_npg")
                / F.col("_np").cast("double")
            ).cast("bigint")
        ).alias("_bp"),
        F.sum(
            F.round(
                F.lit(float(nano))
                * F.col("_npg")
                * F.col("_npg")
                / F.col("_ng").cast("double")
            ).cast("bigint")
        ).alias("_br"),
        # ARI: exact C(x,2) sums (integers throughout)
        F.sum(
            (F.col("_npg") * (F.col("_npg") - 1) / 2).cast("bigint")
        ).alias("_sij"),
    )
    pa = pm.agg(
        F.sum((F.col("_np") * (F.col("_np") - 1) / 2).cast("bigint")).alias(
            "_sa"
        )
    )
    ga = gm.agg(
        F.sum((F.col("_ng") * (F.col("_ng") - 1) / 2).cast("bigint")).alias(
            "_sb"
        )
    )
    out = stats.crossJoin(F.broadcast(pa)).crossJoin(F.broadcast(ga))
    n2 = (F.col("_n") * (F.col("_n") - 1) / 2).cast("bigint")
    expected = (
        F.col("_sa").cast("double") * F.col("_sb") / n2.cast("double")
    )
    max_idx = (F.col("_sa") + F.col("_sb")).cast("double") / 2.0
    bp = F.col("_bp").cast("double") / (F.lit(nano) * F.col("_n").cast("double"))
    br = F.col("_br").cast("double") / (F.lit(nano) * F.col("_n").cast("double"))
    return out.select(
        F.col("_n").alias("n_items"),
        F.round(bp, round_to).alias("bcubed_precision"),
        F.round(br, round_to).alias("bcubed_recall"),
        F.round(2.0 * bp * br / (bp + br), round_to).alias("bcubed_f1"),
        F.round(
            F.when(
                max_idx - expected != 0.0,
                (F.col("_sij").cast("double") - expected)
                / (max_idx - expected),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("ari"),
    )


def clustering_agreement_sql(
    src_cte: str, pred: str, gold: str, round_to: int = 6
) -> str:
    """DuckDB replay of :func:`clustering_agreement`: identical cells,
    identical nano-pinned B³ sums, identical integer pair counts."""
    return (
        f"WITH b AS (SELECT {pred} AS p, {gold} AS g FROM {src_cte} "
        f"WHERE {pred} IS NOT NULL AND {gold} IS NOT NULL), "
        "cells AS (SELECT p, g, count(*) AS npg FROM b GROUP BY 1, 2), "
        "pm AS (SELECT p, CAST(SUM(npg) AS BIGINT) AS np FROM cells "
        "GROUP BY p), "
        "gm AS (SELECT g, CAST(SUM(npg) AS BIGINT) AS ng FROM cells "
        "GROUP BY g), "
        "j AS (SELECT c.npg, pm.np, gm.ng FROM cells c "
        "JOIN pm ON pm.p = c.p JOIN gm ON gm.g = c.g), "
        "st AS (SELECT CAST(SUM(npg) AS BIGINT) AS n, "
        "CAST(SUM(CAST(round(1e9 * npg * npg "
        "/ CAST(np AS DOUBLE)) AS BIGINT)) AS BIGINT) AS bp, "
        "CAST(SUM(CAST(round(1e9 * npg * npg "
        "/ CAST(ng AS DOUBLE)) AS BIGINT)) AS BIGINT) AS br, "
        "CAST(SUM(CAST(npg * (npg - 1) / 2 AS BIGINT)) AS BIGINT) "
        "AS sij FROM j), "
        "pa AS (SELECT CAST(SUM(CAST(np * (np - 1) / 2 AS BIGINT)) "
        "AS BIGINT) AS sa FROM pm), "
        "ga AS (SELECT CAST(SUM(CAST(ng * (ng - 1) / 2 AS BIGINT)) "
        "AS BIGINT) AS sb FROM gm), "
        "f AS (SELECT n, "
        "bp / (1e9 * CAST(n AS DOUBLE)) AS bpf, "
        "br / (1e9 * CAST(n AS DOUBLE)) AS brf, "
        "CAST(sij AS DOUBLE) AS sij, CAST(sa AS DOUBLE) AS sa, "
        "CAST(sb AS DOUBLE) AS sb, "
        "CAST(CAST(n * (n - 1) / 2 AS BIGINT) AS DOUBLE) AS n2 "
        "FROM st CROSS JOIN pa CROSS JOIN ga) "
        "SELECT n AS n_items, "
        f"round(bpf, {round_to}) AS bcubed_precision, "
        f"round(brf, {round_to}) AS bcubed_recall, "
        f"round(2.0 * bpf * brf / (bpf + brf), {round_to}) AS bcubed_f1, "
        "round(CASE WHEN (sa + sb) / 2.0 - sa * sb / n2 <> 0.0 "
        "THEN (sij - sa * sb / n2) / ((sa + sb) / 2.0 - sa * sb / n2) "
        f"ELSE 0.0 END, {round_to}) AS ari FROM f"
    )
