"""Privacy / re-identification auditing over pipeline outputs.

The reference loads person-shaped rows into OrientDB (its shipped
examples are person/DBPedia datasets — reference `examples/` configs and
OETLProcessor.java's CSV person pipelines) but has no way to ASK whether
the loaded table is safe to release. This module adds the standard
release-audit primitive: Sweeney's k-anonymity (IJUFKS 2002) with the
l-diversity refinement (Machanavajjhala et al. ICDE'06) — "does every
combination of quasi-identifiers hide each row among at least k others,
and does each such group carry at least l distinct sensitive values?"

Scale shape: ONE hash aggregate on the quasi-identifier tuple (count +
count-distinct-sensitive fold into the same grouped pass, map-side
combinable) — the audit costs the same as any groupBy at 100 TB and
never materializes pairs or windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.context import PipelineContext
from orientdb_etl_spark.operators import register

__all__ = ["erasure_audit", "k_anonymity_audit", "t_closeness_audit"]


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: "list[str]",
    k: int = 5,
    sensitive_col: str | None = None,
    l_diversity: int = 2,
    violations_only: bool = False,
) -> DataFrame:
    """Equivalence-class audit: group rows by the quasi-identifier tuple
    and report, per class, its size and whether it violates k-anonymity
    (``n_rows < k``); with ``sensitive_col`` also the number of DISTINCT
    sensitive values and the l-diversity violation flag (``n_sensitive <
    l_diversity`` — a class whose members all share one diagnosis is
    re-identifying even when it is large). ``violations_only`` keeps
    only failing classes — the release blocklist.

    Returns ``(*quasi_cols, n_rows, k_violation[, n_sensitive,
    l_violation])``. NULL quasi values form their own class (NULL is a
    disclosure too: "the only row with an unknown ZIP").

    Scale shape: one grouped aggregation on the quasi tuple; the
    distinct-sensitive count is an exact ``count(DISTINCT)`` inside the
    same grouped pass (one extra shuffle keyed identically, which AQE
    coalesces). No joins, no windows, no driver state.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity_audit needs at least one quasi column")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive")
        )
    out = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    out = out.withColumn("k_violation", F.col("n_rows") < F.lit(int(k)))
    if sensitive_col is not None:
        if l_diversity < 1:
            raise ValueError(f"l_diversity must be >= 1, got {l_diversity}")
        out = out.withColumn(
            "l_violation", F.col("n_sensitive") < F.lit(int(l_diversity))
        )
    if violations_only:
        cond = F.col("k_violation")
        if sensitive_col is not None:
            cond = cond | F.col("l_violation")
        out = out.filter(cond)
    return out


@register("kAnonymity")
def k_anonymity_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"kAnonymity": {"quasi": ["zip", "age"], "k": 5,
    "sensitiveField": "diagnosis", "l": 2, "violationsOnly": true}}"""
    return k_anonymity_audit(
        df,
        list(cfg["quasi"]),
        k=int(cfg.get("k", 5)),
        sensitive_col=cfg.get("sensitiveField"),
        l_diversity=int(cfg.get("l", 2)),
        violations_only=bool(cfg.get("violationsOnly", False)),
    )


def erasure_audit(
    subjects: DataFrame,
    subject_key: str,
    tables: "dict[str, tuple[DataFrame, str]]",
) -> DataFrame:
    """Right-to-erasure pre-flight (GDPR art. 17 / CCPA deletion): given
    the data subjects to erase and the FK column that reaches each
    downstream table, report the cascade blast radius — per table, how
    many rows reference an erased subject and how many of the requested
    subjects actually appear there. The deletion job itself is then an
    anti-join per table; this audit is what you review (and log) BEFORE
    running it, and re-run afterwards expecting all zeros — the
    completion certificate.

    ``tables`` maps table name -> (DataFrame, fk_col). Returns one row
    per table: ``(table_name, n_rows_affected, n_subjects_present)``.

    Scale shape: the subject key set is broadcast (a deletion batch is
    thousands of ids, never corpus-sized), so each table contributes one
    broadcast semi-join + one aggregate — no shuffle of the fact
    tables, and the per-table scans run as independent jobs. The
    distinct-subject count folds into the same grouped pass.
    """
    if not tables:
        raise ValueError("erasure_audit needs at least one table")
    keys = F.broadcast(
        subjects.select(F.col(subject_key).alias("_ek")).where(
            F.col(subject_key).isNotNull()
        ).distinct()
    )
    parts = []
    for name, (df, fk) in tables.items():
        hit = df.join(keys, df[fk] == F.col("_ek"), "inner")
        parts.append(
            hit.agg(
                F.lit(name).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows_affected"),
                F.countDistinct(F.col(fk)).alias("n_subjects_present"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register("erasure")
def erasure_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"erasure": {"keyField": "c_custkey",
    "tables": {"orders": "o_custkey", "customer": "c_custkey"}}} —
    the incoming frame is the deletion batch; each audited table is a
    registered pipeline table, mapped to the FK column the subjects
    reach it through."""
    return erasure_audit(
        df,
        cfg["keyField"],
        {
            name: (ctx.tables[name], fk)
            for name, fk in dict(cfg["tables"]).items()
        },
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: "list[str]",
    sensitive_col: str,
    t: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE'07) for an
    ORDERED sensitive attribute: per quasi-identifier equivalence class,
    the Earth Mover's Distance between the class's sensitive-value
    distribution and the global one, flagged when it exceeds ``t`` —
    the refinement that catches what l-diversity misses (a class whose
    values are distinct but all clustered at the sick end of the scale
    still discloses).

    For ordered values v₁<…<v_m, EMD = (1/(m−1))·Σᵢ|Σ_{j≤i}(p_j − q_j)|.
    Exact-integer discipline: the cumulative deviation is computed as
    ``|cum_c·N − cum_g·n|`` over BIGINT counts (one exact integer per
    prefix), summed exactly, with ONE double division at the end — so
    the audit hash-matches a SQL twin bit-for-bit, never a tolerance
    band. Returns ``(*quasi_cols, n_rows, t_emd, t_violation)``.

    Scale shape: two hash aggregations (class×value counts, global value
    counts) + a (classes × m) grid join — bounded by the sensitive
    attribute's domain size m, which is small by the audit's own premise
    (t-closeness is only meaningful for low-cardinality ordered
    sensitives) — then a per-class window ordered by value (keyed
    window, never global). No pairs, no driver state.
    """
    if not quasi_cols:
        raise ValueError("t_closeness_audit needs at least one quasi column")
    if not 0 < t <= 1:
        raise ValueError(f"t must be in (0, 1], got {t}")
    from pyspark.sql import Window

    base = df.where(F.col(sensitive_col).isNotNull())
    cv = base.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("_n")
    )
    gv = base.groupBy(F.col(sensitive_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_g")
    )
    tot = base.agg(
        F.count(F.lit(1)).alias("_totn"),
        F.count_distinct(F.col(sensitive_col)).alias("_m"),
    )
    class_val = base.groupBy(
        *[F.col(c) for c in quasi_cols], F.col(sensitive_col).alias("_v")
    ).agg(F.count(F.lit(1)).alias("_c"))
    # full (class × value) grid: classes missing a value still move the
    # cumulative deviation; both frames are already aggregated (bounded).
    # Quasi keys join NULL-SAFE (eqNullSafe) — a NULL quasi value is its
    # own equivalence class (k_anonymity_audit's documented semantics),
    # so its class×value counts must attach, not fall to the 0-coalesce
    cvg = cv.crossJoin(F.broadcast(gv))
    cl = class_val
    for c in quasi_cols:
        cl = cl.withColumnRenamed(c, f"_q_{c}")
    cond = [cvg[c].eqNullSafe(cl[f"_q_{c}"]) for c in quasi_cols]
    cond.append(cvg["_v"] == cl["_v"])
    grid = cvg.join(cl, cond, "left").select(
        *[cvg[c] for c in quasi_cols],
        cvg["_n"],
        cvg["_v"],
        cvg["_g"],
        F.coalesce(cl["_c"], F.lit(0)).cast("bigint").alias("_c"),
    )
    w = Window.partitionBy(*quasi_cols).orderBy("_v")
    dev = grid.crossJoin(F.broadcast(tot)).select(
        *quasi_cols,
        "_n",
        "_totn",
        "_m",
        "_v",
        F.sum("_c").over(w).alias("_cc"),
        F.sum("_g").over(w).alias("_cg"),
    )
    # the final prefix (i = m) is identically zero; keeping it changes
    # nothing and avoids a rank column
    num = dev.groupBy(*quasi_cols, "_n", "_totn", "_m").agg(
        F.sum(
            F.abs(F.col("_cc") * F.col("_totn") - F.col("_cg") * F.col("_n"))
        ).alias("_num")
    )
    emd = F.when(
        F.col("_m") > 1,
        F.col("_num").cast("double")
        / (
            F.col("_totn").cast("double")
            * F.col("_n").cast("double")
            * (F.col("_m") - 1).cast("double")
        ),
    ).otherwise(F.lit(0.0))
    return num.select(
        *quasi_cols,
        F.col("_n").alias("n_rows"),
        F.round(emd, round_to).alias("t_emd"),
        (emd > F.lit(float(t))).alias("t_violation"),
    )


@register("tCloseness")
def t_closeness_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"tCloseness": {"quasi": ["zip", "age"],
    "sensitiveField": "salary_band", "t": 0.2}}"""
    return t_closeness_audit(
        df,
        list(cfg["quasi"]),
        cfg["sensitiveField"],
        t=float(cfg.get("t", 0.2)),
    )
