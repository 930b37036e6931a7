"""Standalone min-of-N timing for a subset of registry queries — the
bench.py methodology (noop sink, warm-up for EXTRA_RUNS-class shapes)
without the full 137-query run, for targeted A/B during optimization.

Usage: python scripts/time_queries.py <query> [query ...]
       env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
       TQ_RUNS (default 3), TQ_WARM (default 1 untimed warm-up)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ncbi_analysis_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("TQ_RUNS", "3"))
    n_warm = int(os.environ.get("TQ_WARM", "1"))
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")

    from ncbi_analysis_spark.plans import driver_queries, registry

    qs = driver_queries.queries()
    for s in registry.STAGED:
        qs.update(registry.round_queries(s))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        if name not in qs:
            print(f"SKIP {name}")
            continue
        fn = qs[name]
        try:
            for _ in range(n_warm):
                noop(fn(spark, sf_dir))
            runs = []
            for _ in range(n_runs):
                t0 = time.time()
                noop(fn(spark, sf_dir))
                runs.append(round(time.time() - t0, 3))
            out[name] = {"min": min(runs), "runs": runs}
            print(f"{name}: min {min(runs)}  runs {runs}", flush=True)
        except Exception as exc:  # noqa: BLE001 — keep timing the rest
            print(f"FAIL {name}: {type(exc).__name__}: {str(exc)[:160]}",
                  flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
