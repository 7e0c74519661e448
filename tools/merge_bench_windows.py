"""Merge N bench.py capture windows into one artifact.

Each window is a bench.py DETAIL artifact (the BENCH_local.json file a
run writes — per-query min over $SPARK_GRAFT_BENCH_RUNS runs plus
samples, per-query quality labels, and the window's host-contention
snapshot). The compact stdout line also parses, but it lacks the
quality map, so every query merges as label "unknown" and the
contended-minimum guard cannot fire — prefer the detail files.
The merge takes the per-query MIN across windows — the
repeatable cost of the work on a machine with documented 2-4× contention
bursts — and carries every window's min and host summary so the artifact
is self-adjudicating (no prose needed to tell contention from
regression). Queries present in only some windows (added mid-capture)
keep their available samples, flagged by a shorter samples list.

    python tools/merge_bench_windows.py out.json w1.json w2.json ...
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, win_paths = sys.argv[1], sys.argv[2:]
    wins = [json.load(open(p)) for p in win_paths]
    names: list[str] = []
    for w in wins:
        for q in w["queries"]:
            if q not in names:
                names.append(q)
    # per-query window-quality guard (round-6): a window whose min sample
    # was labelled "contended" cannot supply the committed minimum when a
    # non-contended window exists for the query. "unknown" windows
    # (pre-round-6 artifacts with no quality map) still COMPETE with "ok"
    # ones — absence of the label is not evidence of contention, and
    # discarding their legitimate minima would inflate the merged total.
    # A query with ONLY contended windows keeps its min and carries the
    # label so the artifact self-reports the untrusted number.
    queries: dict = {}
    quality: dict = {}
    for q in names:
        entries = [
            (w["queries"][q], w.get("quality", {}).get(q, "unknown"))
            for w in wins
            if q in w["queries"]
        ]
        clean = [(v, lbl) for v, lbl in entries if lbl != "contended"]
        pool = clean or entries
        queries[q], quality[q] = min(pool, key=lambda e: e[0])
    samples = {
        q: [w["queries"][q] for w in wins if q in w["queries"]] for q in names
    }
    hosts = []
    n_windows = 0
    for w in wins:
        if "windows_host" in w:  # an already-merged artifact used as input
            hosts.extend(w["windows_host"])
            n_windows += len(w["windows_host"])
            continue
        h = w.get("host", {})
        hosts.append(
            {
                "loadavg_start": h.get("start", {}).get("loadavg"),
                "loadavg_end": h.get("end", {}).get("loadavg"),
                "cpu_busy_frac": h.get("cpu_busy_frac"),
                "cpu_steal_frac": h.get("cpu_steal_frac"),
                "window_total": w["value"],
            }
        )
        n_windows += 1
    # generated host telemetry summary — bench narratives must cite THIS,
    # never hand-typed numbers (a round-7 paragraph misquoted the
    # round-6 per-window steal because it was typed from memory)
    def _summ(key: str) -> dict:
        vals = sorted(h[key] for h in hosts if h.get(key) is not None)
        if not vals:
            return {"median": None, "max": None, "n": 0}
        mid = len(vals) // 2
        med = (
            vals[mid]
            if len(vals) % 2
            else (vals[mid - 1] + vals[mid]) / 2.0
        )
        return {
            "median": round(med, 4),
            "max": round(vals[-1], 4),
            "n": len(vals),
        }

    merged = {
        "metric": "headline_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": wins[0]["sf"],
        "runs_per_query": wins[0].get("runs_per_query"),
        "aggregation": (
            f"per-query min over {n_windows} capture windows x "
            f"{wins[0].get('runs_per_query')} runs each; per-window host "
            "load/steal captured below (self-adjudication)"
        ),
        "samples": samples,
        "quality": quality,
        "windows_host": hosts,
        "host_summary": {
            "cpu_steal_frac": _summ("cpu_steal_frac"),
            "cpu_busy_frac": _summ("cpu_busy_frac"),
        },
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(merged))
    print(json.dumps({"value": merged["value"], "n_queries": len(queries),
                      "windows": len(wins)}))


if __name__ == "__main__":
    main()
