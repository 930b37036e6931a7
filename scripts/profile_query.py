"""Per-job wall-clock attribution for one registry query (guide §1).

Runs a single ``queries()`` entry under a UI-enabled session (REST API
on an ephemeral port), executes it with the same noop-sink methodology
as bench.py, then prints every Spark job with its duration plus the
driver-side gaps between jobs. The job list is the empirical profile
the optimization guide's §1.1 asks for: which jobs dominate, and how
much wall is driver-side (gaps) vs executor-side.

Usage: python scripts/profile_query.py <query> [sf_dir] [--cold]
       (default sf_dir /root/testdata/sf0.1; one untimed warm-up run
       first unless --cold)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ui_spark(app_name: str, port: int):
    """session.py's get_spark builder, with the UI enabled for REST."""
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/ncbi-analysis-warehouse"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(port))
        .getOrCreate()
    )


def _ts(s: str) -> float:
    d = dt.datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")
    return d.replace(tzinfo=dt.timezone.utc).timestamp()


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cold = "--cold" in sys.argv
    if not args:
        print(__doc__)
        return 2
    qname = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    port = int(os.environ.get("PROFILE_UI_PORT", "4049"))

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = _ui_spark(f"profile-{qname}", port)
    spark.sparkContext.setLogLevel("ERROR")

    from ncbi_analysis_spark.plans import driver_queries, registry

    qs = driver_queries.queries()
    for s in registry.STAGED:
        qs.update(registry.round_queries(s))
    if qname not in qs:
        print(f"unknown query {qname}")
        return 2
    fn = qs[qname]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    if not cold:
        spark.sparkContext.setJobDescription(f"{qname}: warmup")
        noop(fn(spark, sf_dir))

    spark.sparkContext.setJobDescription(f"{qname}: timed")
    t0 = time.time()
    noop(fn(spark, sf_dir))
    wall = time.time() - t0
    t_end = time.time()

    api = f"http://localhost:{port}/api/v1"
    app_id = json.load(urllib.request.urlopen(f"{api}/applications"))[0]["id"]
    jobs = json.load(urllib.request.urlopen(
        f"{api}/applications/{app_id}/jobs?status=succeeded"))

    sel = []
    for j in jobs:
        sub = _ts(j["submissionTime"])
        if t0 - 0.5 <= sub <= t_end + 0.5:
            comp = _ts(j.get("completionTime", j["submissionTime"]))
            sel.append((sub, comp, j["jobId"],
                        (j.get("description") or j["name"])[:110],
                        j.get("numTasks", 0)))
    sel.sort()
    print(f"\n=== {qname}  wall {wall:.2f}s  ({len(sel)} jobs) ===")
    prev_end = t0
    gap_total = job_total = 0.0
    for sub, comp, jid, desc, nt in sel:
        gap = max(0.0, sub - prev_end)
        gap_total += gap
        job_total += comp - sub
        print(f"  gap {gap:6.2f}s | job {jid:4d} {comp - sub:6.2f}s "
              f"{nt:5d}t | {desc}")
        prev_end = max(prev_end, comp)
    print(f"  tail gap {max(0.0, t_end - prev_end):.2f}s")
    print(f"  sum: jobs {job_total:.2f}s, gaps(driver) {gap_total:.2f}s, "
          f"wall {wall:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
