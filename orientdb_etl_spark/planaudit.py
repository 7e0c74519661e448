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
  (severity warn, not error, for that reason). When EVERY build side in
  the plan is provably bounded by construction — a keyless aggregate
  (1 row), a limit/top-k, a driver-local literal frame, a small literal
  range, or a join/union of such — the finding carries a
  ``bounded_side`` annotation stating the structural proof; a missing
  annotation means a potentially table-sized broadcast.
* ``global_window``        — an Exchange SinglePartition in a plan with
  a Window: the every-row-through-one-task shape (``ORDER BY`` windows
  with no PARTITION BY).
* ``global_sort``          — Exchange rangepartitioning feeding a final
  Sort when a TakeOrderedAndProject would do.
* ``row_python``           — BatchEvalPython: row-at-a-time Python in
  the hot path (~10-100× slower than Arrow/JVM).
* ``arrow_python``         — ArrowEvalPython / pandas exec nodes: info,
  the acceptable escape hatch.
* ``unpushed_filter``      — a Filter holding a SOURCE-PUSHABLE
  comparison (bare or cast-wrapped column vs literal) sitting DIRECTLY
  on a file scan (through Project/ColumnarToRow only) whose
  PushedFilters carries no real predicate: pushdown genuinely lost
  (a cast around the filter column is the usual cause).
* ``compute_filter``       — info: a scan-adjacent Filter whose
  predicates are expressions of scan columns (length/regex/modulo) —
  un-pushable by nature, evaluated scan-fused in the same codegen
  stage; no extra pass, nothing pushable lost.
* ``residual_filter``      — info: filters exist only above barrier
  nodes (Exchange/Aggregate/Join/Window) on computed columns while some
  scan pushes nothing — HAVING / post-join predicates; no scan could
  absorb them, kept as an annotation rather than a warning.
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


#: nodes a predicate can slide through on its way to the scan — anything
#: else (Exchange, HashAggregate, joins, Window, Generate, Arrow stages)
#: produces or reshapes rows, so a Filter above it is residual by nature
_PASS_THROUGH = {"Project", "Filter", "ColumnarToRow", "InputAdapter"}

_TREE_NODE = re.compile(
    r"^(?P<pre>[:+|\- ]*?)(?:\* )?(?P<name>[A-Za-z].*?)\s*\((?P<id>\d+)\)\s*$"
)
_FILE_SCAN = re.compile(r"^Scan (parquet|orc|csv|json|text|avro)\b")
_ONLY_NULLCHECKS = re.compile(r"\[(\s*IsNotNull\([^)]*\)\s*,?)*\]")
# a source-pushable LEAF: a bare attribute reference (optionally
# cast-wrapped — the classic authoring bug; parameterized target types
# like decimal(12,2) included) compared to a pure literal, in either
# operand order, or an IN over literals. Matched against WHOLE boolean
# leaves, never substrings — comparisons nested inside
# isnotnull()/coalesce()/CASE are null-guards or derived expressions, not
# predicates a source could take. AND/OR trees of pushable leaves are
# pushable too (sources translate And/Or recursively).
_ATTR = r"(?:cast\()?\w+#\d+[A-Za-z]*(?: as \w+(?:\(\d+(?:,\d+)?\))?\))?"
#: literal operand: bare (date/timestamp/number/string forms carry no
#: parens and no #N suffix) OR cast-wrapped — Catalyst prints typed
#: constants as ``cast(2020-01-01 as date)`` / ``cast(0.07 as
#: decimal(12,2))``, which a source CAN take (the cast folds into the
#: filter value), so they must not downgrade the leaf to compute_filter
_LIT = r"(?:cast\([^()#]+ as \w+(?:\(\d+(?:,\d+)?\))?\)|[^()#]+)"
_PUSHABLE_CMP = re.compile(
    rf"(?:{_ATTR}\s*(?:=|>=|<=|>|<)\s*{_LIT}"
    rf"|{_LIT}\s*(?:=|>=|<=|>|<)\s*{_ATTR}"
    rf"|{_ATTR} IN \([^()#]*\))"
)


def _strip_outer(s: str) -> str:
    """Strip redundant outer parentheses (conditions print as fully
    parenthesized binary trees)."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i < len(s) - 1:
                    return s  # outer parens don't span the whole string
        s = s[1:-1].strip()
    return s


def _split_top(cond: str, op: str) -> "list[str]":
    """Split on a top-level boolean operator (``AND``/``OR``) at paren
    depth 0, after stripping redundant outer parens."""
    cond = _strip_outer(cond)
    token = f" {op} "
    parts: list[str] = []
    depth = last = i = 0
    while i < len(cond):
        ch = cond[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and cond.startswith(token, i):
            parts.append(cond[last:i])
            i += len(token)
            last = i
            continue
        i += 1
    parts.append(cond[last:])
    return parts


def _conjuncts(cond: str) -> "list[str]":
    """Recursively split a Spark Condition string into its top-level AND
    conjuncts."""
    parts = _split_top(cond, "AND")
    if len(parts) == 1:
        return [_strip_outer(cond)]
    return [c for p in parts for c in _conjuncts(p)]


def _pushable_expr(expr: str) -> bool:
    """True when the WHOLE boolean expression is translatable to source
    filters: a pushable leaf, or an AND/OR tree whose every leaf is
    pushable (matching DataSourceStrategy's recursive And/Or translation)."""
    expr = _strip_outer(expr)
    if _PUSHABLE_CMP.fullmatch(expr):
        return True
    for op in ("OR", "AND"):
        parts = _split_top(expr, op)
        if len(parts) > 1:
            return all(_pushable_expr(p) for p in parts)
    return False


def _is_null_guard(expr: str) -> bool:
    """A (possibly derived-expression) isnotnull guard — mirrors the
    scan's automatic pushed nullchecks, so it never counts as a real
    predicate."""
    expr = _strip_outer(expr)
    if not expr.startswith("isnotnull("):
        return False
    # must be a single isnotnull(...) spanning the whole conjunct, not
    # the left arm of a top-level OR
    return (
        len(_split_top(expr, "OR")) == 1
        and len(_split_top(expr, "AND")) == 1
        and expr.endswith(")")
    )


def _parse_trees(plan: str) -> "list[list[dict]]":
    """Parse every tree section of a FORMATTED plan (the main physical
    plan and each ``Subquery:`` block) into linked nodes
    ``{name, id, depth, children}``; returns one node list per tree, in
    print order (first node = root)."""
    trees: list[list[dict]] = []
    lines = plan.splitlines()
    i = 0
    while i < len(lines):
        if lines[i].startswith("== Physical Plan ==") or lines[i].startswith(
            "Subquery:"
        ):
            i += 1
            nodes: list[dict] = []
            stack: list[dict] = []
            while i < len(lines) and lines[i].strip():
                m = _TREE_NODE.match(lines[i])
                i += 1
                if not m:
                    continue
                depth = len(m.group("pre")) // 3
                node = {
                    "name": m.group("name").strip(),
                    "id": int(m.group("id")),
                    "depth": depth,
                    "children": [],
                }
                while stack and stack[-1]["depth"] >= depth:
                    stack.pop()
                if stack:
                    stack[-1]["children"].append(node)
                stack.append(node)
                nodes.append(node)
            if nodes:
                trees.append(nodes)
        else:
            i += 1
    return trees


def _detail_blocks(plan: str) -> "dict[int, str]":
    """Node-id → detail block ("(7) HashAggregate\\nKeys: []\\n...")
    from the FORMATTED plan's per-node section."""
    out: dict[int, str] = {}
    for block in plan.split("\n\n"):
        m = re.match(r"\((\d+)\) ", block.lstrip("\n"))
        if m:
            out[int(m.group(1))] = block
    return out


#: single-child nodes that cannot INCREASE the build side's row count —
#: a bound proven below them holds above them
_ROW_PRESERVING = {
    "Project",
    "Filter",
    "ColumnarToRow",
    "RowToColumnar",
    "InputAdapter",
    "Sort",
    "Exchange",
    "BroadcastExchange",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "TableCacheQueryStage",
    "InMemoryTableScan",
    "Coalesce",
    "WholeStageCodegen",
}

#: cap for counting a literal ``Range`` as a bounded build side
_BOUNDED_RANGE_ROWS = 100_000


def _bound_desc(node: dict, details: "dict[int, str]", depth: int = 0):
    """A human-readable proof that ``node``'s output row count is
    bounded BY CONSTRUCTION (never input-sized), or ``None`` when no
    bound is provable. Used to adjudicate BroadcastNestedLoopJoin build
    sides: a keyless aggregate is exactly 1 row, limits bound
    explicitly, driver-local literal frames are driver-sized, and
    joins/unions of bounded sides stay bounded."""
    if depth > 64:
        return None
    head = node["name"].split()[0]
    block = details.get(node["id"], "")
    if head in ("HashAggregate", "SortAggregate", "ObjectHashAggregate"):
        if re.search(r"^Keys: \[\]", block, re.M):
            return "scalar aggregate (no grouping keys → 1 row)"
        return None  # grouped aggregate: cardinality is key-sized
    if head == "LocalTableScan":
        return "driver-local literal table"
    if head == "Scan" and "ExistingRDD" in node["name"]:
        return "driver-created local frame"
    if head == "Scan" and "JDBCRelation" in node["name"]:
        # the pushed subquery is embedded in the node name:
        # Scan JDBCRelation((SELECT count(*) ... ) SPARK_GEN_SUBQ_0) ...
        m = re.search(
            r"JDBCRelation\(\((SELECT .*?)\)? SPARK_GEN_SUBQ",
            node["name"],
            re.I | re.S,
        )
        if (
            m
            and not re.search(r"\bGROUP\s+BY\b", m.group(1), re.I)
            and re.match(
                r"SELECT\s+(?:count|sum|min|max|avg)\s*\(", m.group(1), re.I
            )
        ):
            return "JDBC scalar-aggregate subquery (1 row)"
        return None
    if head in ("GlobalLimit", "LocalLimit", "CollectLimit"):
        m = re.search(r"Arguments: (\d+)", block)
        return f"limit ({m.group(1)} rows)" if m else "limit-bounded"
    if head == "TakeOrderedAndProject":
        m = re.search(r"Arguments: limit=(\d+)", block)
        return f"top-k ({m.group(1)} rows)" if m else "top-k bounded"
    if head == "Range":
        m = re.search(r"Range \((-?\d+), (-?\d+)", block)
        if m:
            n = int(m.group(2)) - int(m.group(1))
            if 0 <= n <= _BOUNDED_RANGE_ROWS:
                return f"literal range ({n} rows)"
        return None
    if head in _ROW_PRESERVING and len(node["children"]) == 1:
        return _bound_desc(node["children"][0], details, depth + 1)
    if head == "ReusedExchange":
        # "Arguments: [...], BroadcastExchange (8)" etc. — resolve the
        # reused node by id and classify ITS subtree (the detail blocks
        # are global, but the tree node is elsewhere; the id alone is
        # enough only for detail-classified heads, so be conservative)
        m = re.search(r", \w+ \((\d+)\)\s*$", block)
        if m and int(m.group(1)) in details:
            ref = {"name": "Exchange", "id": int(m.group(1)), "children": []}
            # detail-only classification: works when the reused subtree
            # root is itself a bounding node (agg/limit/local scan)
            refblock = details[int(m.group(1))]
            rm = re.match(r"\(\d+\) (\S+)", refblock.lstrip("\n"))
            if rm:
                ref["name"] = rm.group(1)
                return _bound_desc(ref, details, depth + 1)
        return None
    if head in (
        "BroadcastHashJoin",
        "ShuffledHashJoin",
        "SortMergeJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        sides = [
            _bound_desc(c, details, depth + 1) for c in node["children"]
        ]
        if len(sides) >= 2 and all(sides):
            return f"join of bounded sides ({sides[0]}; {sides[1]})"
        return None
    if head == "Union":
        sides = [
            _bound_desc(c, details, depth + 1) for c in node["children"]
        ]
        if sides and all(sides):
            return "union of bounded sides"
        return None
    return None


def _nlj_bounds(plan: str) -> "list[str | None]":
    """For each BroadcastNestedLoopJoin in the plan, the provable bound
    of its BUILD side (``None`` = not provable — a potential per-row
    scan of a table-sized broadcast)."""
    details = _detail_blocks(plan)
    out: "list[str | None]" = []
    for nodes in _parse_trees(plan):
        for node in nodes:
            if not node["name"].startswith("BroadcastNestedLoopJoin"):
                continue
            if len(node["children"]) != 2:
                out.append(None)
                continue
            build = (
                node["children"][0]
                if "BuildLeft" in node["name"]
                else node["children"][1]
            )
            out.append(_bound_desc(build, details))
    return out


def _classify_filters(plan: str) -> "tuple[bool, bool, bool]":
    """Parse the FORMATTED plan's tree section(s) and classify every
    Filter node. Returns ``(lost_pushdown, compute_filter, residual)``:

    ``lost_pushdown`` — some Filter holding a source-pushable comparison
    reaches a scan through pass-through nodes only, and that scan pushes
    no real predicate: a predicate the scan COULD have taken stayed out.

    ``compute_filter`` — scan-adjacent filters exist but all their
    predicates are expressions over scan columns (un-pushable, fused
    into the scan's codegen stage).

    ``residual`` — filters exist only above barrier nodes (computed
    columns) while some scan still pushes nothing: the old coarse rule's
    trigger, kept as an info-level annotation.
    """
    # PushedFilters per FILE-scan node id (detail blocks: "(7) Scan
    # parquet ..."); in-memory scans (ExistingRDD, LocalTableScan) have
    # nothing to push and never count as a pushdown defect
    pushed: dict[int, str] = {}
    conditions: dict[int, str] = {}
    for block in plan.split("\n\n"):
        block = block.lstrip("\n")
        m = re.match(r"\((\d+)\) (Scan [^\n]*)", block)
        if m and _FILE_SCAN.match(m.group(2)):
            pm = re.search(r"PushedFilters: (\[[^\]]*\])", block)
            pushed[int(m.group(1))] = pm.group(1) if pm else "[]"
            continue
        fm = re.match(r"\((\d+)\) Filter\b", block)
        if fm:
            cm = re.search(r"Condition : (.*)", block)
            conditions[int(fm.group(1))] = cm.group(1) if cm else ""

    def _real_conjuncts(filter_id: int) -> "list[str]":
        # conjuncts that are NOT isnotnull(...) guards (a guard over a
        # derived expression is still a guard)
        return [
            c
            for c in _conjuncts(conditions.get(filter_id, ""))
            if c.strip() and not _is_null_guard(c)
        ]

    def real_condition(filter_id: int) -> bool:
        # a Filter that is ONLY isnotnull(...) guards mirrors the scan's
        # pushed nullchecks — nothing was lost
        return bool(_real_conjuncts(filter_id))

    def pushable_comparison(filter_id: int) -> bool:
        # some WHOLE conjunct is a predicate tree a parquet source COULD
        # have taken. Expression predicates (length(x) > 0, id % 50 = 0,
        # NOT coalesce(x < 0, false)) are un-pushable by nature:
        # scan-fused in the same codegen stage, not a defect.
        return any(
            _pushable_expr(c) for c in _real_conjuncts(filter_id)
        )

    def no_real_push(scan_id: int) -> bool:
        p = pushed.get(scan_id, "[]")
        return _ONLY_NULLCHECKS.fullmatch(p) is not None

    # tree blocks: the main physical plan and each subquery print a
    # node-per-line tree terminated by a blank line
    scan_adjacent = False
    compute_filter = False
    any_filter = False
    for nodes in _parse_trees(plan):
        for node in nodes:
            if node["name"] != "Filter":
                continue
            if not real_condition(node["id"]):
                continue  # pure isnotnull guard, mirrors the pushdown
            any_filter = True
            cur = node
            while (
                len(cur["children"]) == 1
                and cur["children"][0]["name"] in _PASS_THROUGH
            ):
                cur = cur["children"][0]
            if len(cur["children"]) == 1 and cur["children"][0][
                "id"
            ] in pushed:
                if no_real_push(cur["children"][0]["id"]):
                    if pushable_comparison(node["id"]):
                        scan_adjacent = True
                    else:
                        compute_filter = True
    some_scan_unpushed = any(no_real_push(sid) for sid in pushed)
    residual = (
        any_filter
        and not scan_adjacent
        and not compute_filter
        and some_scan_unpushed
    )
    return scan_adjacent, compute_filter, residual


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
        bounds = _nlj_bounds(plan)
        finding = {
            "rule": "nested_loop_join",
            "severity": "warn",
            "detail": "BroadcastNestedLoopJoin scans the broadcast "
            "side per row — fine for a 1-row scalar, fatal for a "
            "table. Check the broadcast side is tiny by construction.",
        }
        if bounds and all(bounds):
            # every build side in the plan carries a structural bound:
            # the per-row scan is over a constant-sized frame
            finding["bounded_side"] = "; ".join(bounds)
        out.append(finding)
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
    # filters vs scans, tree-aware (round 6): a Filter whose input chain
    # reaches a scan THROUGH ONLY pass-through nodes (Project /
    # ColumnarToRow) is scan-adjacent — if that scan pushes no real
    # predicate, pushdown was genuinely lost (warn). A Filter above an
    # Exchange / Aggregate / Join / Window / Generate consumes COMPUTED
    # columns (HAVING, post-join residual, similarity threshold) — no
    # scan could ever absorb it, so it is informational, not a defect.
    scan_adjacent, compute_filter, residual = _classify_filters(plan)
    if scan_adjacent:
        out.append(
            {
                "rule": "unpushed_filter",
                "severity": "warn",
                "detail": "A Filter holding a SOURCE-PUSHABLE comparison "
                "(bare or cast-wrapped column vs literal) sits directly "
                "on a scan that pushes no real predicate — pushdown "
                "was lost (commonly a cast around the filter column). "
                "The scan reads every row group.",
            }
        )
    elif compute_filter:
        out.append(
            {
                "rule": "compute_filter",
                "severity": "info",
                "detail": "A Filter on computed expressions "
                "(length/regex/modulo of scan columns) sits on a scan "
                "— un-pushable by nature, evaluated scan-fused in "
                "the same codegen stage; no extra pass, nothing pushable "
                "lost.",
            }
        )
    elif residual:
        out.append(
            {
                "rule": "residual_filter",
                "severity": "info",
                "detail": "The plan filters rows above a shuffle/agg/"
                "join boundary on computed columns (and some scan "
                "carries no pushed predicate) — expected for HAVING / "
                "post-join predicates; nothing for the scan to absorb.",
            }
        )
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
