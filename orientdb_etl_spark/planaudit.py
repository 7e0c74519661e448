"""Static physical-plan lint: the 100-TB hazards, flagged before a job
runs.

``audit_plan(df)`` inspects a DataFrame's formatted physical plan and
returns typed findings for the plan shapes that are fine at 60k rows
and fatal at 100 TB — the same properties tests/test_plans.py pins for
this repo's own operators, packaged as a reusable pre-flight check for
user-authored pipelines:

* ``cartesian``            — CartesianProduct: O(n·m) pairs.
* ``nested_loop_join``     — BroadcastNestedLoopJoin: per-row scan of
  the broadcast side; legitimate ONLY for scalar/tiny broadcasts
  (severity warn, not error, for that reason).
* ``global_window``        — an Exchange SinglePartition in a plan with
  a Window: the every-row-through-one-task shape (``ORDER BY`` windows
  with no PARTITION BY).
* ``global_sort``          — Exchange rangepartitioning feeding a final
  Sort when a TakeOrderedAndProject would do.
* ``row_python``           — BatchEvalPython: row-at-a-time Python in
  the hot path (~10-100× slower than Arrow/JVM).
* ``arrow_python``         — ArrowEvalPython / pandas exec nodes: info,
  the acceptable escape hatch.
* ``unpushed_filter``      — a file scan whose PushedFilters is empty
  while the plan filters rows above it: predicate pushdown lost
  (casts/UDFs on the filter column are the usual cause).
* ``wide_scan``            — a scan reading more than ``max_read_cols``
  columns: column pruning lost.

Findings are dicts ``{rule, severity, detail}`` (severity
``error`` > ``warn`` > ``info``), ordered most severe first. This is a
HEURISTIC static check on the pre-execution plan (AQE may still
re-plan at runtime); the point is catching the always-wrong shapes
early, not certifying the plan optimal.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["audit_plan"]

_SEV_ORDER = {"error": 0, "warn": 1, "info": 2}


def _formatted(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _window_feeds_single_partition(df: DataFrame) -> bool:
    """Structural check for the global-window funnel: a ``Window`` node
    (not the partial ``WindowGroupLimit``) whose INPUT chain — the next
    few tree lines below it, i.e. at most a Sort away — is an
    ``Exchange SinglePartition``. Mere co-occurrence of a single-
    partition exchange elsewhere in the plan (the usual 1-row scalar
    aggregate feeding a broadcast) must NOT fire this rule."""
    simple = df._jdf.queryExecution().executedPlan().toString()
    lines = simple.splitlines()
    for i, ln in enumerate(lines):
        if re.search(r"\bWindow \[", ln) is None:
            continue
        for nxt in lines[i + 1 : i + 4]:
            if "Exchange SinglePartition" in nxt:
                return True
            # the window's own input chain may route through a Sort (or
            # an AQE shuffle-read wrapper); any OTHER exchange kind or
            # operator means the input is properly partitioned
            if re.search(r"\bSort \[|ShuffleQueryStage|AQEShuffleRead", nxt):
                continue
            break
    return False


def audit_plan(df: DataFrame, max_read_cols: int | None = 24) -> list[dict]:
    """Lint ``df``'s physical plan; returns findings most-severe first
    (empty list = nothing flagged). See module docstring for rules."""
    plan = _formatted(df)
    out: list[dict] = []

    if "CartesianProduct" in plan:
        out.append(
            {
                "rule": "cartesian",
                "severity": "error",
                "detail": "CartesianProduct joins every row with every "
                "row; at scale this never finishes. Add an equi-join key "
                "or a blocking/bucketing scheme.",
            }
        )
    if "BroadcastNestedLoopJoin" in plan:
        out.append(
            {
                "rule": "nested_loop_join",
                "severity": "warn",
                "detail": "BroadcastNestedLoopJoin scans the broadcast "
                "side per row — fine for a 1-row scalar, fatal for a "
                "table. Check the broadcast side is tiny by construction.",
            }
        )
    if "BatchEvalPython" in plan:
        out.append(
            {
                "rule": "row_python",
                "severity": "error",
                "detail": "Row-at-a-time Python UDF in the plan "
                "(BatchEvalPython): ~10-100x slower than built-in "
                "expressions. Rewrite with pyspark.sql.functions or an "
                "Arrow-batched pandas UDF.",
            }
        )
    if "ArrowEvalPython" in plan:
        out.append(
            {
                "rule": "arrow_python",
                "severity": "info",
                "detail": "Arrow-batched Python stage present — the "
                "acceptable escape hatch, but JVM expressions still beat "
                "it when the logic is expressible.",
            }
        )
    if _window_feeds_single_partition(df):
        out.append(
            {
                "rule": "global_window",
                "severity": "error",
                "detail": "A Window's input chain is an Exchange "
                "SinglePartition: an unpartitioned ORDER BY window "
                "funnels every row through one task. Partition the "
                "window, or use the range-partitioned exclusive-prefix "
                "pattern.",
            }
        )
    if re.search(r"Exchange rangepartitioning", plan) and "Sort" in plan and (
        "TakeOrderedAndProject" not in plan
    ):
        out.append(
            {
                "rule": "global_sort",
                "severity": "warn",
                "detail": "Global sort (rangepartitioning exchange + "
                "Sort). For top-k, limit should compile to "
                "TakeOrderedAndProject; for ordered output, ask whether "
                "the consumer actually needs a total order.",
            }
        )
    # scans: a Filter node above a scan whose PushedFilters carries no
    # real predicate (empty, or only the automatic IsNotNull guards) —
    # the comparison stayed post-scan, commonly because a cast/function
    # wrapped the filter column
    has_filter = re.search(r"\(\d+\) Filter", plan) is not None
    only_nullchecks = re.compile(
        r"PushedFilters: \[(\s*IsNotNull\([^)]*\)\s*,?)*\]"
    )
    for m in re.finditer(r"PushedFilters: \[[^\]]*\]", plan):
        if has_filter and only_nullchecks.fullmatch(m.group(0)):
            out.append(
                {
                    "rule": "unpushed_filter",
                    "severity": "warn",
                    "detail": "A scan pushes no real predicate (empty or "
                    "IsNotNull-only PushedFilters) while the plan filters "
                    "rows above it — pushdown was lost (commonly a "
                    "cast/function wrapped around the filter column). "
                    "The scan reads every row group.",
                }
            )
            break
    if max_read_cols is not None:
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
            ncols = len([c for c in m.group(1).split(",") if ":" in c])
            if ncols > max_read_cols:
                out.append(
                    {
                        "rule": "wide_scan",
                        "severity": "warn",
                        "detail": f"A scan reads {ncols} columns "
                        f"(> {max_read_cols}): column pruning lost — "
                        "select only what downstream uses.",
                    }
                )
                break
    out.sort(key=lambda f: _SEV_ORDER[f["severity"]])
    return out
