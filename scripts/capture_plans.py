"""Dump ``.explain("formatted")`` for registry queries to text files.

Usage: python scripts/capture_plans.py <outdir> <suffix> [query ...]
       (suffix is appended to the file name: plans/r15/<q>_<suffix>.txt;
       no queries given = the non-eager core set is skipped — pass names
       explicitly. Building a query's DataFrame may run its eager prep
       (model fits, index builds); the captured plan is the final
       returned DataFrame's, same object bench.py times.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ncbi_analysis_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    from ncbi_analysis_spark.plans import driver_queries, registry

    qs = driver_queries.queries()
    for s in registry.STAGED:
        qs.update(registry.round_queries(s))

    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in registry")
            continue
        try:
            df = qs[name](spark, sf_dir)
            jvm = spark.sparkContext._jvm
            plan = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 — keep capturing the rest
            print(f"FAIL {name}: {type(exc).__name__}: {str(exc)[:200]}")
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange, "
              f"{plan.count('EvalPython')} EvalPython)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
