"""Reconstruct a bench.py capture-window artifact from its stdout log.

bench.py writes its detail JSON only at the END of a run; a window
killed by a wall-clock timeout loses the artifact but not the
measurements — every completed query printed a summary line

    # <name>: <min>s (<rows> rows; samples a/b[/c]; <label>)

with the committed minimum, every sample, and the per-query contention
label. This tool parses those lines back into the window schema the
merge tool consumes (queries/quality/value/sf/runs_per_query), marked
``"partial": true`` + ``"salvaged_from"`` so the merged artifact
self-reports that this window covers only the queries that finished
before the timeout. No numbers are typed by hand — everything comes
from the log the run itself printed.

    python tools/salvage_bench_window.py in.log out.json [sf] [runs]
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    log_path, out_path = sys.argv[1], sys.argv[2]
    sf = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    queries: dict[str, float] = {}
    quality: dict[str, str] = {}
    samples: dict[str, list[float]] = {}
    pat = re.compile(
        r"^# (\S+): ([\d.]+)s \(\d+ rows; samples ([\d./]+); "
        r"(ok|contended)[^)]*\)"
    )
    for line in open(log_path, errors="replace"):
        m = pat.match(line.strip())
        if not m:
            continue
        name, v, smp, label = m.groups()
        queries[name] = float(v)
        quality[name] = label
        samples[name] = [float(x) for x in smp.split("/")]
    if not queries:
        raise SystemExit(f"no query lines found in {log_path}")
    out = {
        "metric": "headline_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "quality": quality,
        "samples": samples,
        "sf": sf,
        "runs_per_query": runs,
        "partial": True,
        "salvaged_from": log_path.split("/")[-1],
        "n_queries_completed": len(queries),
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(out))
    print(json.dumps({"n": len(queries), "value": out["value"]}))


if __name__ == "__main__":
    main()
