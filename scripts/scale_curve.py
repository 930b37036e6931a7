"""Flagship-scan scale curve: wall time vs genome length.

Reproduces the SCALING.md linearity numbers: scans synthetic genomes of
1/4/16/64 Mbp (2 queries x 2 strands, floor mode) and prints min-of-N
seconds per size. Near-linear growth (64x bases in ~5x wall) is the
expected shape after the r6 fixes (numeric chunk spread + byte-sliced
chunking); superlinear growth here means one of those regressed.

Usage: python scripts/scale_curve.py [--windowed] [mbp ...]
(default sizes: 1 4 16 64; --windowed runs the SAME scan through the
giant-accession pre-split layout — split_genome_windows(1 MiB windows)
-> similarity_scan_windowed — so no operator ever holds the whole
sequence; near-linear growth here proves the window->chunk regroup
stays flat as the accession grows)
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ncbi_analysis_spark.plans.similarity_scan import similarity_scan  # noqa: E402
from ncbi_analysis_spark.session import get_spark  # noqa: E402

N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def main() -> None:
    args = sys.argv[1:]
    windowed = "--windowed" in args
    sizes = [int(a) for a in args if a != "--windowed"] or [1, 4, 16, 64]
    spark = get_spark(app_name="scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    rnd = random.Random(2)
    queries = [(f"q{i}", "".join(rnd.choice("acgt") for _ in range(12)))
               for i in range(2)]
    q_df = spark.createDataFrame(queries, ["name", "gene"])
    base = "".join(rnd.choice("acgt") for _ in range(1_000_000))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the Arrow worker pool so size 1 doesn't pay interpreter start
    warm = spark.createDataFrame([("w", base[:10000])], ["accession", "seq"])
    noop(similarity_scan(warm, q_df, {"direct": 1.0, "consistency": 2.0},
                         top_k=5, candidate_distance=5, patience=2,
                         chunk_size=65536, score_floor=8.0))

    if windowed:
        from ncbi_analysis_spark.plans.similarity_scan import (
            similarity_scan_windowed,
            split_genome_windows,
        )

    results = {}
    for mbp in sizes:
        g_df = spark.createDataFrame([("bench", base * mbp)], ["accession", "seq"])
        runs = []
        for _ in range(N_RUNS):
            t0 = time.time()
            if windowed:
                noop(similarity_scan_windowed(
                    split_genome_windows(g_df, 1 << 20), q_df,
                    {"direct": 1.0, "consistency": 2.0}, top_k=20,
                    candidate_distance=5, patience=2, chunk_size=65536,
                    score_floor=8.0))
            else:
                noop(similarity_scan(
                    g_df, q_df, {"direct": 1.0, "consistency": 2.0}, top_k=20,
                    candidate_distance=5, patience=2, chunk_size=65536,
                    score_floor=8.0))
            runs.append(round(time.time() - t0, 2))
        results[mbp] = min(runs)
        label = "windowed" if windowed else "single"
        print(f"{mbp:3d} Mbp ({label}): runs={runs} min={min(runs)}", flush=True)
    if 1 in results and max(sizes) in results and results[1] > 0:
        top = max(sizes)
        print(f"growth: {top}x bases -> {results[top] / results[1]:.1f}x wall")


if __name__ == "__main__":
    main()
