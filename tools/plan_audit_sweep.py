"""Plan-audit sweep: run the static 100-TB plan lint over EVERY query
in the registry and write a committed findings artifact.

This is the dogfooding pass for ``planaudit.audit_plan``: each
``queries_all()`` entry is planned at sf0.001 (planning only — no
execution) and its findings recorded, so a reviewer can see at a glance
which plans carry which shapes and that no query carries an ``error``-
severity hazard (cartesian product, row-at-a-time Python, global-window
funnel). ``warn``/``info`` findings are expected for specific
documented shapes — 1-row scalar broadcasts (nested_loop_join),
computed-column filters (unpushed_filter), and Arrow-batched stages
(arrow_python) — the artifact names them per query instead of asserting
them away.

    python tools/plan_audit_sweep.py [sf_dir] [out_json] [profile]

``profile`` is ``local`` (default: the test confs) or ``cluster``:
the 100 TB design point from ``session.cluster_profile(4000, 32, 8)``
— 12k shuffle partitions, 256 MB broadcast threshold, 128 MB AQE
advisory. The cluster run answers the question SCALE.md used to answer
in prose: do the plan shapes hold under the confs a real deployment
would run, not just under local[32]'s 10 MB broadcast default? (The
queries still PLAN against sf0.001 statistics, so size-estimate-driven
strategy choices — e.g. sort-merge joins upgrading to broadcast-hash —
shift; `tests/test_planaudit.py` pins that the local and cluster
artifacts differ only in documented, justified ways.)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402
from orientdb_etl_spark import get_spark  # noqa: E402
from orientdb_etl_spark.planaudit import audit_plan  # noqa: E402


#: Queries whose flagged global window runs over a frame BOUNDED BY
#: CONSTRUCTION (never input-sized) — the finding is kept in the
#: artifact but annotated, with the bound stated. Anything flagged and
#: NOT listed here is a regression to fix (heavy_hitters and ks_test
#: were exactly that, and were rewritten to broadcast-scalar /
#: exclusive-prefix shapes when this sweep first ran).
#: Queries whose warn-level ``unpushed_filter`` finding is adjudicated
#: legitimate, with the reason stated (same discipline as
#: BOUNDED_WINDOW_OK). Round 6 made the rule itself tree-aware — filters
#: above shuffles are ``residual_filter`` info, scan-fused expression
#: predicates are ``compute_filter`` info — so anything still warning
#: carries a genuinely pushable comparison left above a scan; it must be
#: fixed or adjudicated here.
SCAN_FILTER_OK: dict[str, str] = {}

#: Queries whose ``nested_loop_join`` warn is adjudicated legitimate by
#: HAND even though ``audit_plan`` could not prove the build side
#: bounded structurally (the normal path: the finding's own
#: ``bounded_side`` annotation, derived from the plan — keyless
#: aggregate, limit, literal frame). Anything landing here should first
#: be attempted as a classifier improvement; these three are
#: SEMANTICALLY bounded in ways no plan inspection can prove.
NLJ_OK: dict[str, str] = {
    "ann_lsh_topk": (
        "build side is the literal probe-id filter over the embeddings "
        "scan — row count equals the fixed probe set, not the corpus "
        "(bounded by the query, not provable from the plan)"
    ),
    "negative_samples": (
        "build side is the DISTINCT item vocabulary; the operator "
        "documents the bounded-vocabulary regime (items ≪ interactions) "
        "and the web-scale pre-bucketing boundary "
        "(functions/sampling.py negative_samples docstring)"
    ),
    "t_closeness": (
        "build side is the global sensitive-value distribution grouped "
        "by spec-fixed bands — cardinality is the configured band "
        "count, not the table (functions/privacy.py)"
    ),
    "bitext_mine": (
        "the exact-variant certificate's cross join is over the "
        "spec-fixed vec_id<800 even/odd split — ≤400 rows per side at "
        "every SF by construction; the production path (bitext_mine in "
        "similarity.py) never materializes the quadratic matrix "
        "(LSH-bucketed k-NN candidates only)"
    ),
    "bitext_mine_lsh": (
        "runs the same bounded exact-variant certificate (vec_id<800 "
        "split) alongside the LSH production path to pin their "
        "agreement — the cross join is the certificate instrument, not "
        "the operator"
    ),
}

BOUNDED_WINDOW_OK = {
    "gains_chart": "cumulative pass over the n_buckets-row frame (10)",
    "growth_accounting": "period frame — bounded by the calendar range",
    "neyman_allocation": "largest-remainder rank over the strata frame",
    "psi_drift": "PSI total over the bucket frame (spec-fixed buckets)",
    "quantile_map": "forward-fill over the 101-row reference curve",
    "seasonal_decompose": "moving average over the time-bucket series",
    "contribution": "rank over the per-dimension-member delta frame",
    "ranking_eval": "per-query rank frames (k-bounded candidate lists)",
    "bt_leaderboard": (
        "final rank over the |items|-row leaderboard (distinct battle "
        "participants — the sources column, 5 values; a leaderboard is "
        "items-sized by contract, never corpus-sized)"
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLANAUDIT.json"
    profile = sys.argv[3] if len(sys.argv) > 3 else "local"
    extra_conf = None
    if profile == "cluster":
        from orientdb_etl_spark.session import cluster_profile

        extra_conf = dict(cluster_profile(4000, 32, 8))
        # sweep-session-only (NOT part of the deploy profile): the six
        # streaming queries materialize a micro-batch to expose a plan,
        # and 12k shuffle partitions × per-task status overhead on ONE
        # local driver trips the 1g default maxResultSize even though
        # the sf0.001 results are tiny. A real cluster spreads those
        # task results over its own driver sizing.
        extra_conf["spark.driver.maxResultSize"] = "0"
    elif profile != "local":
        raise SystemExit(f"unknown profile {profile!r} (local|cluster)")
    spark = get_spark("plan_audit_sweep", extra_conf=extra_conf)
    queries = entry.queries_all()
    findings: dict[str, list[dict]] = {}
    errors: dict[str, str] = {}
    t0 = time.time()
    for name, fn in queries.items():
        # sweep-session-only valve #2: the stream_* queries EXECUTE a
        # micro-batch to expose a plan, and each stateful streaming
        # shuffle partition instantiates a state store (plus its
        # checkpoint/maintenance threads) — at the cluster profile's
        # 12k partitions on ONE local JVM that is ~10⁵ native threads
        # and the process dies with "unable to create native thread"
        # (observed: Thread-166972 before the round-6 capture crashed).
        # State-store count is a deployment-sizing knob a real cluster
        # spreads over its executors, not a plan-shape rule, so the
        # micro-batch materializes under a local-safe count while the
        # plan-shaping confs (broadcast threshold, AQE advisory,
        # maxPartitionBytes) stay at cluster values. Recorded in the
        # artifact as ``streaming_exec_partitions``.
        throttle = profile == "cluster" and name.startswith("stream_")
        if throttle:
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "64")
        try:
            findings[name] = audit_plan(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — a sweep must finish
            errors[name] = f"{type(e).__name__}: {e}"
        finally:
            if throttle:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
    by_rule: dict[str, int] = {}
    by_sev: dict[str, int] = {}
    for fs in findings.values():
        for f in fs:
            by_rule[f["rule"]] = by_rule.get(f["rule"], 0) + 1
            by_sev[f["severity"]] = by_sev.get(f["severity"], 0) + 1
    out = {
        "sf_dir": sf_dir,
        "profile": profile,
        "profile_conf": extra_conf or {},
        "streaming_exec_partitions": 64 if profile == "cluster" else None,
        "n_queries": len(queries),
        "n_planned": len(findings),
        "n_clean": sum(1 for fs in findings.values() if not fs),
        "by_severity": by_sev,
        "by_rule": by_rule,
        "errors": errors,
        "elapsed_s": round(time.time() - t0, 1),
        "findings": {
            n: [
                {
                    "rule": f["rule"],
                    "severity": f["severity"],
                    **(
                        {"bounded_frame": BOUNDED_WINDOW_OK[n]}
                        if f["rule"] == "global_window"
                        and n in BOUNDED_WINDOW_OK
                        else {}
                    ),
                    **(
                        {"adjudicated": SCAN_FILTER_OK[n]}
                        if f["rule"] == "unpushed_filter"
                        and n in SCAN_FILTER_OK
                        else {}
                    ),
                    **(
                        {"bounded_side": f["bounded_side"]}
                        if f["rule"] == "nested_loop_join"
                        and "bounded_side" in f
                        else {}
                    ),
                    **(
                        {"adjudicated": NLJ_OK[n]}
                        if f["rule"] == "nested_loop_join"
                        and "bounded_side" not in f
                        and n in NLJ_OK
                        else {}
                    ),
                }
                for f in fs
            ]
            for n, fs in findings.items()
            if fs
        },
        "unaccounted_global_windows": sorted(
            n
            for n, fs in findings.items()
            if any(f["rule"] == "global_window" for f in fs)
            and n not in BOUNDED_WINDOW_OK
        ),
        "unaccounted_unpushed_filters": sorted(
            n
            for n, fs in findings.items()
            if any(f["rule"] == "unpushed_filter" for f in fs)
            and n not in SCAN_FILTER_OK
        ),
        "unaccounted_nested_loops": sorted(
            n
            for n, fs in findings.items()
            if any(
                f["rule"] == "nested_loop_join" and "bounded_side" not in f
                for f in fs
            )
            and n not in NLJ_OK
        ),
    }
    Path(out_path).write_text(json.dumps(out, indent=1, sort_keys=True))
    print(
        json.dumps(
            {k: out[k] for k in
             ("n_queries", "n_planned", "n_clean", "by_severity", "by_rule",
              "elapsed_s")}
        )
    )
    if errors:
        print(f"PLAN ERRORS: {errors}")


if __name__ == "__main__":
    main()
