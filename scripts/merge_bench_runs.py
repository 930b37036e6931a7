"""Merge N full bench.py records into one clean record: per-query MIN
across runs (the BENCH_LOCAL_r14_clean methodology — each single run's
contention-spike set is disjoint, the min is the steady-state reading),
noise as the max/min across the merged runs' per-query values, and the
regression report recomputed from bench.py's own BASELINE table.

Usage: python scripts/merge_bench_runs.py OUT.json RUN1.json RUN2.json ...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [json.loads(open(p).read().strip().splitlines()[-1])
            for p in run_paths]
    base = runs[0]
    names = set(base["queries"])
    for r in runs[1:]:
        if set(r["queries"]) != names:
            raise SystemExit("query sets differ between runs")
    queries = {k: min(r["queries"][k] for r in runs) for k in names}
    noise = {k: round(max(r["queries"][k] for r in runs)
                      / max(queries[k], 1e-9), 2) for k in names}

    import bench

    out = {
        "metric": base["metric"],
        "value": round(sum(queries.values()), 3),
        "unit": base["unit"],
        "queries": {k: queries[k] for k in base["queries"]},
        "sf": base["sf"],
        "runs_per_query": base["runs_per_query"],
        "aggregation": f"min across {len(runs)} full runs (per-run min-of-N)",
        "noise_max_over_min_across_runs": noise,
        "errors": {k: v for r in runs for k, v in r.get("errors", {}).items()},
        "merged_from_totals": [r["value"] for r in runs],
    }
    out.update(bench._regression_report(queries))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}: total {out['value']}, "
          f"median_vs_baseline {out.get('median_vs_baseline')}, "
          f"regressions {out.get('regressions')}, "
          f"unbaselined {out.get('unbaselined')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
