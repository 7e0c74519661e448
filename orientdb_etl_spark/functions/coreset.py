"""Submodular coreset selection over embedding columns.

:func:`facility_location_select` — greedy maximization of the facility-
location objective ``F(S) = Σ_x max_{c∈S} sim(x, c)`` (Nemhauser et al.
1978 gives the (1−1/e) guarantee for greedy on monotone submodular
functions; Sener & Savarese ICLR'18 and Mirzasoleiman et al. ICML'20
use exactly this objective to pick representative training subsets /
exemplars). Each selected exemplar is the point whose addition covers
the most still-uncovered similarity mass — the "pick k documents that
best represent the corpus" primitive a curation pipeline runs before
expensive human review or as a seed set for quality classifiers.

Candidate pool: greedy over ALL n points is O(n²k); the standard scale
fix is to restrict candidates to a small uniform pool (stochastic /
"lazier than lazy" greedy, Mirzasoleiman et al. AAAI'15 — a uniform
candidate sample preserves the approximation guarantee in expectation).
Here the pool is the ``pool`` smallest Knuth-ladder id hashes —
deterministic, engine-replayable, uniform-ish — so the whole greedy
trajectory is a pure function of (data, k, pool, seed).

Determinism discipline (the :mod:`quality_clf` pattern): per-pair
cosines quantize to ``scale`` integer units immediately after the one
float dot product (round-to-4 is the repo's established cross-engine
cosine pinning); every gain and coverage total after that is an INTEGER
sum — order-free across engines and partitionings — and the argmax ties
break to the smaller candidate id. :func:`facility_location_sql` replays
the exact trajectory in DuckDB (MATERIALIZED is load-bearing: each
step's state feeds two consumers).

Scale shape at 100 TB: the similarity table is ONE corpus × pool pass
(pool is a constant; the broadcast side is pool rows), built once and
reused across all k steps; per step there is one integer aggregation
over it (gain), a pool-sized argmax, and one corpus-sized state update
(``localCheckpoint`` — the state column is referenced by both the next
gain pass and the coverage total). No pairwise n², no driver-side data.

No counterpart in the reference (no ML surface; OETLProcessor.java);
SURVEY §2.8 training-data extension like sampling.py / dsir.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["facility_location_select", "facility_location_sql"]

_KNUTH, _MOD = 2654435761, 1000003


def facility_location_select(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 6,
    pool: int = 24,
    seed: int = 9,
    scale: int = 10000,
    round_to: int = 6,
) -> DataFrame:
    """Greedy facility-location selection of ``k`` exemplars from the
    ``pool``-candidate hash pool. Returns ``k`` rows ``(step, vec_id,
    gain, coverage)``: the chosen exemplar per step, its marginal gain
    and the cumulative coverage ``Σ_x max_{c∈S} sim(x,c)`` after the
    step (both in cosine units — integer sums divided by ``scale``).
    ``sim`` is cosine clamped at 0 (facility location needs
    non-negative similarities); zero-norm vectors contribute 0.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if pool < k:
        raise ValueError(f"pool must be >= k, got pool={pool}, k={k}")
    spark = df.sparkSession
    base = df.where(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("_x"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    h = F.expr(f"(_x + {seed}) % {_MOD} * {_KNUTH} % {_MOD}")
    cands = (
        base.select("_x", "_v", h.alias("_h"))
        .orderBy("_h", "_x")
        .limit(int(pool))
        .select(F.col("_x").alias("_c"), F.col("_v").alias("_cv"))
    )
    dot = (
        "aggregate(zip_with(_v, _cv, (a, b) -> a * b), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )
    nx = (
        "sqrt(aggregate(transform(_v, a -> a * a), "
        "cast(0.0 as double), (acc, v) -> acc + v))"
    )
    nc = (
        "sqrt(aggregate(transform(_cv, a -> a * a), "
        "cast(0.0 as double), (acc, v) -> acc + v))"
    )
    s_expr = F.expr(
        f"cast(round(greatest(if({nx} > 0 and {nc} > 0, "
        f"({dot}) / (({nx}) * ({nc})), 0.0), 0.0) * {int(scale)}) "
        "as bigint)"
    )
    # ONE corpus × pool pass, reused by every step's gain aggregation
    # and the winner's state update
    sims = (
        base.crossJoin(F.broadcast(cands))
        .select("_x", "_c", s_expr.alias("_s"))
        .localCheckpoint()
    )
    cur = base.select("_x", F.lit(0).cast("bigint").alias("_cur"))
    chosen: list[tuple[int, int, int, int]] = []
    taken: list = []
    for step in range(1, int(k) + 1):
        gains = (
            sims.join(cur, "_x")
            .where(~F.col("_c").isin(taken) if taken else F.lit(True))
            .groupBy("_c")
            .agg(
                F.sum(
                    F.greatest(F.col("_s") - F.col("_cur"), F.lit(0))
                ).alias("_g")
            )
        )
        pick = gains.orderBy(
            F.col("_g").desc(), F.col("_c").asc()
        ).first()  # pool-sized frame — bounded argmax
        taken.append(pick["_c"])
        win = sims.where(F.col("_c") == pick["_c"]).select("_x", "_s")
        # state referenced by the next gain pass AND the coverage total
        cur = (
            cur.join(win, "_x", "left")
            .select(
                "_x",
                F.greatest(
                    F.col("_cur"), F.coalesce(F.col("_s"), F.lit(0))
                ).alias("_cur"),
            )
            .localCheckpoint()
        )
        cov = cur.agg(F.sum("_cur").alias("_t")).first()["_t"]
        chosen.append((step, pick["_c"], pick["_g"], cov))
    out = spark.createDataFrame(
        chosen, "step int, vec_id bigint, _g bigint, _t bigint"
    )
    return out.select(
        "step",
        "vec_id",
        F.round(F.col("_g") / F.lit(float(scale)), round_to).alias("gain"),
        F.round(F.col("_t") / F.lit(float(scale)), round_to).alias(
            "coverage"
        ),
    )


def facility_location_sql(
    table: str,
    vec_col: str,
    id_col: str,
    k: int = 6,
    pool: int = 24,
    seed: int = 9,
    scale: int = 10000,
    round_to: int = 6,
) -> str:
    """Portable unrolled twin of :func:`facility_location_select` — the
    same hash pool, the same quantized-integer greedy trajectory, one
    MATERIALIZED state CTE per step (each state feeds the next gain
    aggregation and its coverage total — inlining would re-derive the
    whole prefix per consumer)."""
    kk, r, sc = int(k), int(round_to), int(scale)
    parts = [
        (
            f"base AS MATERIALIZED (SELECT {id_col} AS x, "
            f"{vec_col}::DOUBLE[] AS v FROM {table} "
            f"WHERE {id_col} IS NOT NULL AND {vec_col} IS NOT NULL)"
        ),
        (
            f"cand AS MATERIALIZED (SELECT x AS c, v AS cv FROM base "
            f"ORDER BY (x + {seed}) % {_MOD} * {_KNUTH} % {_MOD}, x "
            f"LIMIT {int(pool)})"
        ),
        (
            "sims AS MATERIALIZED (SELECT b.x, cand.c, "
            "CAST(round(greatest(CASE WHEN "
            "sqrt(list_dot_product(b.v, b.v)) > 0 AND "
            "sqrt(list_dot_product(cand.cv, cand.cv)) > 0 THEN "
            "list_dot_product(b.v, cand.cv) / "
            "(sqrt(list_dot_product(b.v, b.v)) * "
            "sqrt(list_dot_product(cand.cv, cand.cv))) ELSE 0.0 END, "
            f"0.0) * {sc}) AS BIGINT) AS s FROM base b, cand)"
        ),
        "cur0 AS MATERIALIZED (SELECT x, CAST(0 AS BIGINT) AS cur FROM base)",
    ]
    for i in range(1, kk + 1):
        not_taken = (
            ""
            if i == 1
            else (
                " WHERE c NOT IN ("
                + " UNION ALL ".join(
                    f"SELECT c FROM p{j}" for j in range(1, i)
                )
                + ")"
            )
        )
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT c, "
            f"CAST(SUM(greatest(s - cur, 0)) AS BIGINT) AS g "
            f"FROM sims JOIN cur{i-1} USING (x){not_taken} GROUP BY c)"
        )
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT c, g FROM g{i} "
            f"ORDER BY g DESC, c LIMIT 1)"
        )
        parts.append(
            f"cur{i} AS MATERIALIZED (SELECT cur{i-1}.x, "
            f"greatest(cur{i-1}.cur, COALESCE(w.s, 0)) AS cur "
            f"FROM cur{i-1} LEFT JOIN "
            f"(SELECT sims.x, sims.s FROM sims JOIN p{i} USING (c)) w "
            f"USING (x))"
        )
        parts.append(
            f"cov{i} AS MATERIALIZED (SELECT CAST(SUM(cur) AS BIGINT) "
            f"AS t FROM cur{i})"
        )
    rows = " UNION ALL ".join(
        f"SELECT {i} AS step, p{i}.c AS vec_id, "
        f"round(p{i}.g / {float(sc)!r}, {r}) AS gain, "
        f"round(cov{i}.t / {float(sc)!r}, {r}) AS coverage "
        f"FROM p{i}, cov{i}"
        for i in range(1, kk + 1)
    )
    return "WITH " + ", ".join(parts) + " " + rows
