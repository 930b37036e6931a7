"""Corpus-operator scale curve: wall time vs corpus scale factor.

Complements scripts/scale_curve.py (flagship genome linearity) on the
LLM-pipeline side: runs a representative slice of the driver registry at
each testdata scale factor and prints min-of-N seconds per (query, sf),
plus the sf0.01 -> sf0.1 growth ratio. The corpora grow 10x per step, so
a near-10x (or lower) wall ratio means the operator is scaling linearly
in data with fixed overhead amortizing out; super-10x growth flags a
quadratic stage or a skew collapse.

The slice covers the structurally different shapes: hash-agg dedup,
LSH banding + connected components (iterative), inverted-index Jaccard
(the skew-capped self-join), the multi-stage curation pipeline, ANN
probe (broadcast + bucket prune), n-gram LM (explode + model join), and
the line-scrub (explode + anti-join + ordered regroup).

Usage: python scripts/corpus_scale_curve.py [sf ...]  (default: 0.001 0.01 0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

QUERIES = [
    "dedup_exact_groups",
    "dedup_minhash_signature",
    "dedup_dup_clusters",
    "dedup_ngram_jaccard",
    "curation_pipeline",
    "ann_ivf",
    "ngram_lm_quality",
]


def main() -> None:
    sfs = [float(a) for a in sys.argv[1:]] or [0.001, 0.01, 0.1]
    import __spark_entry__ as e
    from ncbi_analysis_spark.plans.driver_queries_r7 import queries_r7
    from ncbi_analysis_spark.plans.driver_queries_r8 import queries_r8
    from ncbi_analysis_spark.session import get_spark

    spark = get_spark(app_name="corpus-scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**e.queries(), **queries_r7(), **queries_r8()}
    # round-8-staged shapes: anchor-window span dedup, apportionment +
    # repeat explode, distinct-score cumulative scan, shard map + keyed
    # window, id-keyed full outer join, and the persisted composition
    names = QUERIES + [
        "boilerplate_scrub",
        "dup_span_removal", "epoch_mixture", "quality_quantile_gate",
        "curriculum_layout", "corpus_snapshot_diff", "curation_v3",
    ]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the Arrow worker pool + JVM codegen before any timing
    noop(qs["dedup_minhash_signature"](spark, f"/root/testdata/sf{sfs[0]:g}"))

    results: dict[str, dict[float, float]] = {n: {} for n in names}
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf:g}"
        for name in names:
            runs = []
            for _ in range(N_RUNS):
                t0 = time.time()
                noop(qs[name](spark, sf_dir))
                runs.append(round(time.time() - t0, 2))
            results[name][sf] = min(runs)
            print(f"sf{sf:g} {name}: runs={runs} min={min(runs)}", flush=True)

    if 0.01 in sfs and 0.1 in sfs:
        print("\nsf0.01 -> sf0.1 growth (10x rows):")
        for name in names:
            a, b = results[name].get(0.01), results[name].get(0.1)
            if a is not None and b is not None:
                # sub-5ms minima round to 0.0 — report without a ratio
                # rather than dividing by zero or silently skipping
                ratio = f"({b / a:.1f}x wall)" if a > 0 else "(sf0.01 under timer resolution)"
                print(f"  {name}: {a} -> {b} s  {ratio}")


if __name__ == "__main__":
    main()
