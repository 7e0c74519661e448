"""Measure one or more registry queries in isolation and capture plans.

Usage:
    python tools/measure_query.py [--runs N] [--plan-tag TAG]
                                  [--plan-round rNN] query [query ...]

Times each query exactly as bench.py does (build DataFrame + noop-sink
write — ``df.write.format('noop')`` computes every column of every row
and discards it, guide §1.4 — cache cleared before each run) and, when
--plan-tag is given, writes ``plans/<round>/<query>_<TAG>.txt`` with the
``explain('formatted')`` output of the returned DataFrame. Honors
$SPARK_GRAFT_SF_DIR and $SPARK_GRAFT_CPUS like bench.py. The row count
is taken once OUTSIDE the timed region (informational only), matching
bench.py's methodology since the round-8 timed-action fix.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402
from orientdb_etl_spark import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plan-tag", default=None)
    ap.add_argument("--plan-round", default="r09")
    args = ap.parse_args()
    if args.runs < 1:
        ap.error("--runs must be >= 1")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("measure_query", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = entry.queries_all()

    plan_dir = (
        Path(__file__).resolve().parent.parent / "plans" / args.plan_round
    )
    if args.plan_tag:
        plan_dir.mkdir(parents=True, exist_ok=True)

    # warm the JVM/session the same way bench.py does
    spark.range(1024).repartition(int(cpus)).count()

    for name in args.queries:
        fn = registry[name]
        if args.plan_tag:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            (plan_dir / f"{name}_{args.plan_tag}.txt").write_text(txt)
        samples = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"measure: {name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        n = df.count()  # informational, outside the timed region
        print(
            f"{name}: min {min(samples):.3f}s  samples "
            + "/".join(f"{s:.2f}" for s in samples)
            + f"  ({n} rows)",
            flush=True,
        )


if __name__ == "__main__":
    main()
