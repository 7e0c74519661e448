"""Declarative data-quality expectations: Deequ-style constraint checks
compiled into ONE aggregation pass.

A 100 TB ingest needs a validation gate between "landed" and "published":
row counts, null fractions, key uniqueness, domains, ranges, regex
conformance. The design point (same as AWS Deequ, Schelter et al. VLDB'18)
is that ALL constraints over a table share one scan: every constraint
lowers to an aggregate expression, the whole list becomes a single
``df.agg(...)`` (map-side partial aggregation, one exchange of one row per
partition), and the tiny 1-row result is exploded into a per-constraint
report. Python never touches data rows — only the final report row.

Scale notes:
- ``unique`` uses exact ``count_distinct``; multiple exact distincts on
  different columns make Catalyst plan an ``Expand`` (input amplified by
  the number of distinct groups). With ``approx=True`` uniqueness drops to
  ``approx_count_distinct`` (HLL, 2% default error) and the plan stays a
  plain single-pass hash aggregate — the right trade at corpus scale for
  a smoke gate; keep exact for the publish gate.
- Fractions are ratios of two exact longs — engine-portable doubles (no
  float summation order dependence). Constraints on float aggregates are
  limited to min/max, which are order-independent.

No counterpart in the reference (nearest is OCSVTransformer's per-cell
type coercion, OCSVTransformer.java:141-210); north-star extension per
SURVEY §2.8.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Report schema: one row per constraint.
REPORT_COLS = ("constraint", "column", "observed", "passed")


def _lower(spec: dict[str, Any], approx: bool) -> tuple[str, str, Column, Column]:
    """Lower one constraint spec to (name, column, observed_agg, passed).

    ``observed`` is always a DOUBLE aggregate; ``passed`` is a boolean
    expression over aggregates (evaluated post-agg, still JVM-side)."""
    kind = spec["type"]
    col = spec.get("column", "")
    c = F.col(col) if col else None
    total = F.count(F.lit(1))
    if kind == "row_count":
        obs = total.cast("double")
        ok = F.lit(True)
        if "min" in spec:
            ok = ok & (total >= int(spec["min"]))
        if "max" in spec:
            ok = ok & (total <= int(spec["max"]))
        return "row_count", col, obs, ok
    if kind == "not_null":
        frac = F.count(c) / total
        return (
            "not_null", col, frac,
            frac >= float(spec.get("minFraction", 1.0)),
        )
    if kind == "unique":
        distinct = (
            F.approx_count_distinct(c) if approx else F.count_distinct(c)
        )
        return (
            "unique", col, distinct.cast("double"),
            distinct == F.count(c) if not approx
            # HLL is an estimate: within rsd of the non-null count
            else (distinct >= (F.count(c) * (1 - float(spec.get("rsd", 0.05))))),
        )
    if kind == "min":
        obs = F.min(c).cast("double")
        return "min", col, obs, obs >= float(spec["atLeast"])
    if kind == "max":
        obs = F.max(c).cast("double")
        return "max", col, obs, obs <= float(spec["atMost"])
    if kind == "in_set":
        vals = list(spec["values"])
        frac = F.count_if(c.isin(*vals)) / total
        return (
            "in_set", col, frac,
            frac >= float(spec.get("minFraction", 1.0)),
        )
    if kind == "matches":
        frac = F.count_if(c.rlike(str(spec["pattern"]))) / total
        return (
            "matches", col, frac,
            frac >= float(spec.get("minFraction", 1.0)),
        )
    if kind == "satisfies":
        # arbitrary row predicate (SQL text) — the general escape hatch
        frac = F.count_if(F.expr(str(spec["predicate"]))) / total
        return (
            "satisfies",
            col or str(spec["predicate"]),
            frac,
            frac >= float(spec.get("minFraction", 1.0)),
        )
    raise ValueError(f"unknown constraint type {kind!r}")


def check_expectations(
    df: DataFrame,
    constraints: Sequence[dict[str, Any]],
    approx: bool = False,
) -> DataFrame:
    """Validate ``constraints`` against ``df`` in ONE aggregation pass.

    Returns the report DataFrame ``(constraint, column, observed,
    passed)`` with exactly ``len(constraints)`` rows, in spec order.
    See module docstring for the single-scan compilation contract."""
    if not constraints:
        raise ValueError("constraints must be a non-empty list")
    lowered = [_lower(dict(s), approx) for s in constraints]
    aggs = []
    structs = []
    for i, (name, col, obs, ok) in enumerate(lowered):
        aggs.append(obs.alias(f"_obs_{i}"))
        aggs.append(ok.alias(f"_ok_{i}"))
        structs.append(
            F.struct(
                F.lit(name).alias("constraint"),
                F.lit(col).alias("column"),
                F.col(f"_obs_{i}").cast("double").alias("observed"),
                F.col(f"_ok_{i}").alias("passed"),
            )
        )
    report_row = df.agg(*aggs)
    return (
        report_row.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
    )


def assert_expectations(
    df: DataFrame,
    constraints: Sequence[dict[str, Any]],
    approx: bool = False,
) -> DataFrame:
    """Run :func:`check_expectations`; raise ``ValueError`` listing every
    failing constraint if any failed, else return ``df`` unchanged (the
    pass-through lets a pipeline gate publication on quality). The only
    driver materialization is the report itself — ``len(constraints)``
    rows, never data rows."""
    report = check_expectations(df, constraints, approx=approx).collect()
    failed = [r for r in report if not r.passed]
    if failed:
        detail = "; ".join(
            f"{r.constraint}({r.column}) observed={r.observed}" for r in failed
        )
        raise ValueError(f"{len(failed)} expectation(s) failed: {detail}")
    return df


def referential_audit(
    constraints: Sequence[dict[str, Any]],
) -> DataFrame:
    """Cross-table referential-integrity audit: one report row per
    foreign-key constraint with total / non-null / orphan counts and an
    ``ok`` flag. ``constraints`` is a list of dicts::

        {"name": "lineitem.l_orderkey -> orders",
         "child": child_df, "fk": "l_orderkey",
         "parent": parent_df, "pk": "o_orderkey"}

    The single-table :func:`check_expectations` gate validates a frame in
    isolation; this is the between-tables half (the classic warehouse
    publish check — no fact row may reference a missing dimension row).

    Scale shape per constraint: parent keys are projected and
    de-duplicated BEFORE the join (column-pruned scan, one small
    hash-agg), then a LEFT join + conditional count — Catalyst/AQE
    broadcasts the distinct key set when it is small (dimension tables)
    and falls back to a shuffled hash join otherwise; either way only
    (fk) pairs move. Constraint reports are unioned — independent stages
    that can run concurrently.

    No counterpart in the reference (its `link` transformer resolves FKs
    but drops/NULLs misses silently, OLinkTransformer.java:88-120); this
    is the audit that tells you HOW MANY would drop, before you load.
    """
    if not constraints:
        raise ValueError("constraints must be a non-empty list")
    reports = []
    for spec in constraints:
        child: DataFrame = spec["child"]
        parent: DataFrame = spec["parent"]
        fk, pk = spec["fk"], spec["pk"]
        name = spec.get("name", f"{fk}->{pk}")
        keys = parent.select(F.col(pk).alias("_pk")).distinct()
        joined = child.select(F.col(fk).alias("_fk")).join(
            keys, F.col("_fk") == F.col("_pk"), "left"
        )
        reports.append(
            joined.agg(
                F.lit(name).alias("constraint"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count("_fk").alias("n_nonnull"),
                F.count(F.when(F.col("_fk").isNotNull() & F.col("_pk").isNull(), 1)).alias(
                    "n_orphans"
                ),
            ).select(
                "constraint",
                "n_rows",
                "n_nonnull",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("ok"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
