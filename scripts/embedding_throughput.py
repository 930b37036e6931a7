"""SemDeDup + DSIR throughput at corpus scale: rows/sec on synthetic
inputs generated in-Spark (expression-generated, never on the driver —
the dedup_throughput.py pattern for the embedding/importance operators).

Embeddings: 64-d pseudo-random vectors; rows with id % 4 == 0 re-derive
their direction from id % 4096 plus a tiny per-id perturbation, so ~25%
of rows form near-dup groups (~12 members) with cosine ~0.999 — heavy
enough to exercise the within-cluster pair stage and the component
clustering, not so heavy that one cluster degenerates.

Usage: python scripts/embedding_throughput.py [n_rows]   (default 200000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DIM = 64


def embeddings(spark, n: int):
    seed = F.when(F.col("id") % 4 == 0, F.col("id") % 4096).otherwise(F.col("id"))
    base = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: ((F.abs(F.hash(seed, j)) % 2001) - 1000).cast("double") / 1000.0,
    )
    jitter = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: ((F.abs(F.hash(F.col("id"), j, F.lit(7))) % 21) - 10).cast("double") / 2000.0,
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.zip_with(base, jitter, lambda b, e: b + e).alias("embedding"),
    )


def docs(spark, n: int):
    # the dedup_throughput corpus shape: 30-70 words from a 20-word vocab
    vocab = ["the", "data", "spark", "join", "agg", "row", "scan", "fast",
             "slow", "key", "value", "table", "part", "hash", "sort", "read",
             "write", "batch", "window", "col"]
    arr = F.array(*[F.lit(w) for w in vocab])
    nw = F.abs(F.hash("id")) % 40 + 30
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), nw),
                        lambda i: F.element_at(arr, (F.abs(F.hash("id", i)) % 20) + 1)),
            " ").alias("text"))


def main() -> None:
    from ncbi_analysis_spark.operators.dedup import semantic_dedup
    from ncbi_analysis_spark.operators.similarity_search import train_ivf_centroids
    from ncbi_analysis_spark.operators.terms import dsir_logratios, dsir_score
    from ncbi_analysis_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="embedding-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    e = embeddings(spark, n)
    t0 = time.time()
    noop(e)
    print(f"embedding gen {n}: {time.time() - t0:.2f}s", flush=True)

    t0 = time.time()
    cents = train_ivf_centroids(e, k=max(8, n // 2000), sample_cap=16384, n_iter=8, seed=7)
    cents.count()
    print(f"train_ivf_centroids(k={max(8, n // 2000)}): {time.time() - t0:.2f}s", flush=True)

    t0 = time.time()
    noop(semantic_dedup(e, "embedding", "vec_id", cents, threshold=0.99,
                        assign_method="np"))
    dt = time.time() - t0
    print(f"semantic_dedup (np pair stage): {dt:.2f}s  ({n / dt:,.0f} rows/s)", flush=True)

    d = docs(spark, n)
    t0 = time.time()
    noop(d)
    print(f"doc gen {n}: {time.time() - t0:.2f}s", flush=True)

    target = d.filter(F.col("doc_id") % 37 == 0)
    t0 = time.time()
    w = dsir_logratios(target, d, "text", "doc_id", n_buckets=8192, ngram_max=2)
    print(f"dsir_logratios (two corpus passes): {time.time() - t0:.2f}s", flush=True)

    t0 = time.time()
    noop(dsir_score(d, "text", "doc_id", w, n_buckets=8192, ngram_max=2))
    dt = time.time() - t0
    print(f"dsir_score: {dt:.2f}s  ({n / dt:,.0f} docs/s)", flush=True)


if __name__ == "__main__":
    main()
