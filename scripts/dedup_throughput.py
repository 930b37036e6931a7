"""Dedup-family throughput at corpus scale: docs/sec on a synthetic
200k-document corpus generated in-Spark (no parquet staging, pure
expression generation — the corpus never exists on the driver).

The testdata documents tables top out at ~5k rows; this script is the
scale probe for the dedup operators' real cost: ~25% of documents are
exact/near duplicates (id % 4 == 0 rows re-derive their word stream
from id % 4096, so dup groups average ~12 members — heavy enough to
exercise the pair generation, not so heavy that one bucket dominates).

Usage: python scripts/dedup_throughput.py [n_docs]   (default 200000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

VOCAB = ["the", "data", "spark", "join", "agg", "row", "scan", "fast",
         "slow", "key", "value", "table", "part", "hash", "sort", "read",
         "write", "batch", "window", "col"]


def corpus(spark, n: int):
    arr = F.array(*[F.lit(w) for w in VOCAB])
    seed = F.when(F.col("id") % 4 == 0, F.col("id") % 4096).otherwise(F.col("id"))
    nw = F.abs(F.hash(seed)) % 40 + 30
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), nw),
                        lambda i: F.element_at(arr, (F.abs(F.hash(seed, i)) % 20) + 1)),
            " ").alias("text"))


def main() -> None:
    from ncbi_analysis_spark.operators.dedup import (
        exact_dup_groups,
        minhash_lsh_pairs,
        remove_repeated_lines,
        simhash_pairs,
    )
    from ncbi_analysis_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="dedup-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    d = corpus(spark, n)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t0 = time.time()
    noop(d)
    gen = time.time() - t0
    print(f"corpus gen {n}: {gen:.2f}s", flush=True)

    for name, thunk in [
        ("exact_dup_groups", lambda: exact_dup_groups(d, "text", "doc_id")),
        ("minhash_lsh_pairs(8 perms, 4 bands)",
         lambda: minhash_lsh_pairs(d, "text", "doc_id", num_perm=8, bands=4,
                                   shingle_n=3)),
        ("simhash_pairs", lambda: simhash_pairs(d, "text", "doc_id")),
        ("remove_repeated_lines(sep=' the ', min_docs=100)",
         lambda: remove_repeated_lines(d, "text", "doc_id", sep=" the ",
                                       min_docs=100)),
    ]:
        t0 = time.time()
        noop(thunk())
        dt = time.time() - t0
        print(f"{name}: {dt:.2f}s  ({n / dt:,.0f} docs/s)", flush=True)


if __name__ == "__main__":
    main()
