"""audit_plan: each rule must fire on a planted bad plan and stay
quiet on the good twin."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from orientdb_etl_spark.planaudit import audit_plan


def _rules(findings):
    return {f["rule"] for f in findings}


def test_clean_aggregate_has_no_findings(spark):
    df = spark.range(100).groupBy((F.col("id") % 5).alias("k")).count()
    assert audit_plan(df) == []


def test_cartesian_flagged(spark):
    a, b = spark.range(10), spark.range(10)
    got = audit_plan(a.crossJoin(b))
    assert "cartesian" in _rules(got) or "nested_loop_join" in _rules(got)
    assert got[0]["severity"] in ("error", "warn")


def test_global_window_flagged_partitioned_not(spark):
    df = spark.range(100).select("id", (F.col("id") % 5).alias("k"))
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    assert "global_window" in _rules(audit_plan(bad))
    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert "global_window" not in _rules(audit_plan(good))


def test_row_python_flagged(spark):
    from pyspark.sql.types import LongType

    plus_one = F.udf(lambda x: x + 1, LongType())
    bad = spark.range(10).select(plus_one("id").alias("y"))
    got = audit_plan(bad)
    assert "row_python" in _rules(got)
    assert got[0]["severity"] == "error"


def test_unpushed_filter_and_clean_pushdown(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(1000).select(
        "id", (F.col("id") % 7).alias("k")
    ).write.mode("overwrite").parquet(p)
    t = spark.read.parquet(p)
    # cast around the column defeats pushdown
    bad = t.filter(F.col("k").cast("string") == "3")
    assert "unpushed_filter" in _rules(audit_plan(bad))
    good = t.filter(F.col("k") == 3)
    assert "unpushed_filter" not in _rules(audit_plan(good))


def test_wide_scan_threshold(spark, tmp_path):
    p = str(tmp_path / "wide.parquet")
    cols = [F.col("id").alias(f"c{i}") for i in range(30)]
    spark.range(50).select(*cols).write.mode("overwrite").parquet(p)
    wide = spark.read.parquet(p)
    assert "wide_scan" in _rules(audit_plan(wide.filter(F.col("c0") > 1)))
    assert "wide_scan" not in _rules(
        audit_plan(wide.select("c0", "c1"), max_read_cols=24)
    )


def test_findings_ordered_most_severe_first(spark):
    from pyspark.sql.types import LongType

    plus_one = F.udf(lambda x: x + 1, LongType())
    df = spark.range(10).crossJoin(
        spark.range(3).select(F.col("id").alias("j"))
    ).select(plus_one("id").alias("y"))
    sev = [f["severity"] for f in audit_plan(df)]
    assert sev == sorted(sev, key=("error", "warn", "info").index)


def test_driver_registry_has_no_error_severity_plans(spark):
    """Dogfood: every driver-registry query's physical plan must be free
    of error-severity hazards (cartesian products, row-Python stages,
    unpartitioned ORDER BY windows). Warn/info findings are allowed —
    e.g. the q11 scalar-threshold BroadcastNestedLoopJoin is the
    documented legitimate use."""
    import __spark_entry__ as E

    SF = "/root/testdata/sf0.001"
    bad = {}
    for name, fn in E.queries().items():
        errs = [
            f["rule"]
            for f in audit_plan(fn(spark, SF))
            if f["severity"] == "error"
        ]
        if errs:
            bad[name] = errs
    assert bad == {}


def test_filter_classification_three_way(spark, tmp_path):
    """Round-6 tree-aware split: lost pushdown (pushable comparison left
    above a scan pushing nothing) warns; scan-fused expression predicates
    and post-shuffle residual filters are info annotations."""
    p = str(tmp_path / "cls.parquet")
    spark.range(1000).select(
        "id", (F.col("id") % 7).alias("k")
    ).write.mode("overwrite").parquet(p)
    t = spark.read.parquet(p)

    def sev(fs, rule):
        return next((f["severity"] for f in fs if f["rule"] == rule), None)

    # expression predicate: scan-fused, info not warn
    got = audit_plan(t.filter((F.col("k") % 3) == 0))
    assert sev(got, "compute_filter") == "info"
    assert "unpushed_filter" not in _rules(got)

    # HAVING above the aggregation: residual, info not warn
    having = t.groupBy("k").agg(F.sum("id").alias("s")).filter(
        F.col("s") > 100
    )
    got = audit_plan(having)
    assert sev(got, "residual_filter") == "info"
    assert "unpushed_filter" not in _rules(got)

    # catalyst's own isnotnull guard above a scan: no finding at all
    j = t.join(t.withColumnRenamed("id", "id2"), "k")
    got = audit_plan(j)
    assert "unpushed_filter" not in _rules(got)
    assert "compute_filter" not in _rules(got)

    # lost pushdown coexisting with a HAVING: the warn wins
    both = (
        t.filter(F.col("k").cast("string") == "3")
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
        .filter(F.col("s") > 1)
    )
    got = audit_plan(both)
    assert sev(got, "unpushed_filter") == "warn"
    assert "residual_filter" not in _rules(got)


def test_pushable_expr_cases():
    """Leaf/tree pushability used by the unpushed_filter rule: casts with
    parameterized target types and AND/OR trees of pushable leaves count
    as lost pushdown; null-guards, derived expressions, and
    coalesce-wrapped comparisons do not."""
    from orientdb_etl_spark.planaudit import _is_null_guard, _pushable_expr

    assert _pushable_expr("(cast(k#3L as string) = 3)")
    assert _pushable_expr("(cast(price#5 as decimal(12,2)) = 100.00)")
    assert _pushable_expr(
        "((cast(k#3L as string) = 1) OR (cast(k#3L as string) = 2))"
    )
    assert _pushable_expr("((a#1 = 1) AND ((b#2 > 0) OR (b#2 < -5)))")
    # cast-wrapped LITERALS (typed constants Catalyst prints with
    # parens) are source-pushable — the cast folds into the filter value
    assert _pushable_expr("(d#7 >= cast(2020-01-01 as date))")
    assert _pushable_expr("(cast(2020-01-01 as date) <= d#7)")
    assert _pushable_expr("(ts#8 < cast(2020-01-01 00:00:00 as timestamp))")
    assert _pushable_expr("(p#9 = cast(0.07 as decimal(12,2)))")
    assert _pushable_expr(
        "((d#7 >= cast(2020-01-01 as date)) AND (d#7 < cast(2021-01-01 as date)))"
    )
    # but a cast wrapping a DERIVED expression is still not pushable
    assert not _pushable_expr("(cast(length(t#2) as bigint) > 0)")
    assert not _pushable_expr("NOT coalesce((c#1 < 0.0), false)")
    assert not _pushable_expr("(length(t#2) > 0)")
    assert not _pushable_expr("((a#1 = 1) OR (length(t#2) > 0))")
    assert _is_null_guard("isnotnull(cast((a#1 = x) as int))")
    assert not _is_null_guard("(isnotnull(a#1) OR (a#1 = 3))")


def test_nlj_bounded_side_annotations(spark):
    """nested_loop_join findings carry a structural bounded_side proof
    when every build side is bounded by construction, and omit it when
    the broadcast could be table-sized."""
    df = spark.range(100).withColumnRenamed("id", "x")
    scalar = df.agg(F.sum("x").alias("s"))
    f = [
        g
        for g in audit_plan(df.crossJoin(F.broadcast(scalar)))
        if g["rule"] == "nested_loop_join"
    ][0]
    assert "scalar aggregate" in f["bounded_side"]
    f = [
        g
        for g in audit_plan(df.crossJoin(F.broadcast(df.limit(5))))
        if g["rule"] == "nested_loop_join"
    ][0]
    assert "limit (5 rows)" in f["bounded_side"]
    big = spark.range(200_000).withColumnRenamed("id", "y")
    f = [
        g
        for g in audit_plan(df.crossJoin(F.broadcast(big)))
        if g["rule"] == "nested_loop_join"
    ][0]
    assert "bounded_side" not in f  # table-sized broadcast: unproven


def test_nlj_bound_classifier_on_plan_text():
    """_nlj_bounds parses FORMATTED plan text directly — pin the JDBC
    scalar-subquery rule (no Derby needed) and the unbounded fallback."""
    from orientdb_etl_spark.planaudit import _nlj_bounds

    jdbc_plan = """== Physical Plan ==
AdaptiveSparkPlan (5)
+- BroadcastNestedLoopJoin Cross BuildRight (4)
   :- Project (2)
   :  +- Range (1)
   +- BroadcastExchange (3)
      +- Scan JDBCRelation((SELECT count(*) AS n FROM SYS.T WHERE x) SPARK_GEN_SUBQ_0) [numPartitions=1] (2)


(1) Range
Output [1]: [id#0L]
Arguments: Range (0, 100, step=1, splits=Some(32))
"""
    # NOTE: the tree reuses id 2 above only for test compactness; the
    # classifier reads the NAME on the tree line, not the detail block
    assert _nlj_bounds(jdbc_plan) == ["JDBC scalar-aggregate subquery (1 row)"]
    grouped = jdbc_plan.replace("WHERE x", "WHERE x GROUP BY y")
    assert _nlj_bounds(grouped) == [None]


def test_planaudit_artifact_fully_accounted():
    """The committed sweep artifacts must carry zero unaccounted
    findings: every global window has a bounded_frame, every unpushed
    filter an adjudication, every nested-loop join a bounded_side or a
    hand adjudication (NLJ_OK)."""
    import json
    from pathlib import Path

    for name in ("PLANAUDIT.json", "PLANAUDIT_cluster.json"):
        p = Path(__file__).resolve().parent.parent / name
        if not p.exists():
            continue
        d = json.loads(p.read_text())
        assert d["unaccounted_global_windows"] == [], name
        assert d["unaccounted_unpushed_filters"] == [], name
        assert d["unaccounted_nested_loops"] == [], name


def test_planaudit_cluster_artifact_matches_local_shapes():
    """The cluster-profile audit (12k shuffle partitions, 256 MB
    broadcast threshold, 128 MB AQE advisory) must cover EVERY query
    with zero plan errors, and its (query, rule) finding-set must equal
    the local profile's. Equality is the expected outcome here, not a
    tautology: the queries plan against sf0.001 statistics, where every
    frame that fits 256 MB also fits the local 10 MB threshold — so a
    DIFFERENCE would mean a conf leaked into a plan rule some other way
    (a hardcoded partition count, a threshold-sensitive rewrite), which
    is exactly the regression this pin exists to catch. Size-driven
    broadcast upgrades only appear with production-scale statistics,
    which no local artifact can honestly claim to capture."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    cp, lp = root / "PLANAUDIT_cluster.json", root / "PLANAUDIT.json"
    if not (cp.exists() and lp.exists()):
        return
    c, l = json.loads(cp.read_text()), json.loads(lp.read_text())
    assert c["profile"] == "cluster"
    assert c["errors"] == {}, "cluster sweep must plan every query"
    assert c["n_planned"] == c["n_queries"]
    conf = c["profile_conf"]
    assert conf["spark.sql.autoBroadcastJoinThreshold"] == "268435456"
    assert conf["spark.sql.shuffle.partitions"] == "12000"
    cset = {(n, f["rule"]) for n, fs in c["findings"].items() for f in fs}
    lset = {(n, f["rule"]) for n, fs in l["findings"].items() for f in fs}
    assert cset == lset, (
        f"cluster-only={sorted(cset - lset)} local-only={sorted(lset - cset)}"
    )


def test_planaudit_artifacts_cover_current_registry():
    """The committed plan-audit artifacts must be in sync with the
    CURRENT registry: n_queries == len(queries_all()) in BOTH profiles.
    Round 7 shipped audits one query stale (unigram_lm_pruned landed
    after the sweep and nothing noticed); this pin makes a query that
    lands after the sweep a test failure, not a silent gap."""
    import json
    from pathlib import Path

    import __spark_entry__ as entry

    n = len(entry.queries_all())
    root = Path(__file__).resolve().parent.parent
    for name in ("PLANAUDIT.json", "PLANAUDIT_cluster.json"):
        art = json.loads((root / name).read_text())
        assert art["n_queries"] == n, (
            f"{name} audited {art['n_queries']} queries but the registry "
            f"has {n} — re-run tools/plan_audit_sweep.py for both profiles"
        )
