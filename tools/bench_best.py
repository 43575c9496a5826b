#!/usr/bin/env python3
"""Merge N full-suite bench runs into a best-of-N per-query MIN table.

The shared box's load is bursty at hour granularity: single-run totals
carry tainted_load/tainted_ext flags more rounds than not, while the
per-query MIN across runs spread over the close window is a stable
comparator (VERDICT r14 #4). This emits a first-class artifact the
judge/driver can read next to BENCH_r{N}.json.

Usage: python3 tools/bench_best.py OUT.json RUN1.log [RUN2.log ...]

Each RUNi.log is a file containing (anywhere) one bench stdout JSON line
{"metric":"total", "queries": {...}, ...}. The output carries per-query
mins, which run won each query, per-run totals + taint flags, and the
best-of total (sum of per-query mins).
"""
import json
import sys


def extract(path):
    with open(path) as f:
        lines = [l for l in f if '"metric"' in l and '"queries"' in l]
    if not lines:
        raise SystemExit(f"{path}: no bench JSON line found")
    line = lines[-1]
    return json.loads(line[line.index("{"):])


def main():
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [extract(p) for p in run_paths]
    names = sorted(set().union(*[r["queries"].keys() for r in runs]))
    best, winner = {}, {}
    for q in names:
        vals = [(r["queries"][q], i) for i, r in enumerate(runs)
                if q in r["queries"]]
        v, i = min(vals)
        best[q], winner[q] = v, i
    artifact = {
        "metric": "total_best_of_n",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "n_runs": len(runs),
        "n_queries": len(names),
        "queries": {q: round(v, 3) for q, v in best.items()},
        "winner_run": winner,
        "runs": [{
            "source": p,
            "value": r.get("value"),
            "value_median": r.get("value_median"),
            "sf": r.get("sf"),
            "tainted": r.get("tainted"),
            "tainted_load": r.get("tainted_load"),
            "tainted_ext": r.get("tainted_ext"),
            "tainted_io": r.get("tainted_io"),
            "ext_max": r.get("ext_max"),
        } for p, r in zip(run_paths, runs)],
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"best-of-{len(runs)} total {artifact['value']}s "
          f"over {len(names)} queries -> {out_path}")


if __name__ == "__main__":
    main()
