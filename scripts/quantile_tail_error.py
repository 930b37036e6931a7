"""Measured rank error of the bottom-k quantile sketch at tail
quantiles — the "measure, don't guess" readout behind the k-vs-accuracy
trade documented in operators/sketches.py::quantile_sketch.

The sketch's k bottom-by-hash rows are a simple random sample of the
group (md5 is uniform on ids), so the q-quantile estimate's TRUE rank
deviates from q with std ≈ sqrt(q*(1-q)/k) (the binomial order-
statistic bound). That is small in absolute rank terms — but at
q=0.999 with k=1024 it is ~sqrt(0.000999/1024) ≈ 0.00099, i.e. the
SAME size as the tail mass (1-q) itself: p99.9 from a 1k sample can
land anywhere between ~p99.7 and ~p100. This script quantifies that on
the engine itself.

Method: n ids with values = the ids (so true rank of a value is the
value), T trials per (k, q) by offsetting the id space (the sketch
hash is a pure function of the id string, so each offset is an
independent uniform draw). For each trial: quantile_sketch →
quantile_sketch_estimate → |est_v / n - q| = exact rank error. Reports
mean and max over trials, alongside the 1-sigma bound.

Usage: python scripts/quantile_tail_error.py [n] [trials]
Writes a markdown table to stdout (pasted into SCALING.md round 13).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ncbi_analysis_spark.operators import sketches as sk  # noqa: E402
from ncbi_analysis_spark.session import get_spark  # noqa: E402

KS = (256, 1024, 4096)
QS = (0.5, 0.9, 0.99, 0.999)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    print(f"n={n} rows/trial, {trials} trials per (k, q); "
          "value = 1-based rank, so |est_v/n - q| IS the rank error\n")
    print("| k | q | mean rank err | max rank err | sqrt(q(1-q)/k) "
          "| max/sigma |")
    print("|---|---|---------------|--------------|----------------"
          "|-----------|")
    for k in KS:
        for q in QS:
            errs = []
            for t in range(trials):
                base = spark.range(1, n + 1).select(
                    (F.col("id") + t * 10 * n).alias("rid"),
                    F.col("id").alias("v"),
                )
                s = sk.quantile_sketch(base, "v", "rid", k=k)
                est = sk.quantile_sketch_estimate(s, [q]).collect()[0]
                errs.append(abs(est["est_v"] / n - q))
            sigma = math.sqrt(q * (1 - q) / k)
            print(f"| {k} | {q} | {sum(errs)/len(errs):.6f} "
                  f"| {max(errs):.6f} | {sigma:.6f} "
                  f"| {max(errs)/sigma:.2f} |")


if __name__ == "__main__":
    main()
