"""stream_ivf_gate soak under the PRODUCTION configuration (r13 verdict
ask 5): fixed-size micro-batch, k_centroids ~ sqrt(N).

The per-round oracle query freezes an 8-centroid quantizer at every sf
(parity needs a fixed literal quantizer), so its soak row conflates the
index growing 10x with each probe scanning 10x-bigger buckets. The
production contract documented in operators/similarity_search.py is
k ~ sqrt(N): per-batch probe cost ~ |batch| * nprobe * N/k =
|batch| * nprobe * sqrt(N) — sqrt(10) ~ 3.2x per data decade with a
CONSTANT batch, before bucket-directory pruning amortization.

This script measures exactly that: a fixed 500-vector stream batch
gated against an IVF index of all remaining vectors, k = 8 at sf0.1 and
25 (~8 * sqrt(10)) at the synthesized sf1, nprobe=2 at both. Prints
min-of-N wall for the gate drain (index build excluded — it is the
amortized offline part) and the decade ratio.

Usage: python scripts/ivf_stream_soak.py [runs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_ROWS = 500


def synth_sf1_embeddings(spark) -> str:
    """The corpus_scale_curve sf1 synthesis, embeddings leg only."""
    from scripts.corpus_scale_curve import _sf_dir

    return _sf_dir(spark, 1.0)


def run_gate(spark, emb, k_centroids: int, runs: int) -> float:
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.similarity_search import (
        ivf_assign,
        write_ivf_index,
    )
    from ncbi_analysis_spark.streaming.events import (
        read_gated_docs,
        stream_ivf_decon,
    )

    # deterministic split: a FIXED-SIZE batch (the first BATCH_ROWS ids
    # by md5 order — scale-invariant membership), everything else
    # indexed under a k-centroid quantizer sampled from the corpus
    from pyspark.sql.window import Window

    ids = emb.select(
        "vec_id", F.md5(F.col("vec_id").cast("string")).alias("h")
    ).orderBy("h").limit(BATCH_ROWS)
    batch = emb.join(ids.select("vec_id"), "vec_id")
    corpus = emb.join(ids.select("vec_id"), "vec_id", "left_anti")
    cents = (
        emb.orderBy(F.md5((F.col("vec_id") + 7).cast("string")))
        .limit(k_centroids)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("c_id"),
            "embedding",
        )
    )
    cents = cents.localCheckpoint(eager=True)

    tmp = tempfile.mkdtemp(prefix="ivf_soak_")
    best = float("inf")
    try:
        idx = f"{tmp}/index"
        write_ivf_index(ivf_assign(corpus, cents), idx, centroids=cents)
        from ncbi_analysis_spark.plans.driver_queries_r11 import (
            _stage_as_stream,
        )

        src = _stage_as_stream(spark, batch, tmp)
        for r in range(runs):
            out, ck = f"{tmp}/gated_{r}", f"{tmp}/ck_{r}"
            stream = spark.readStream.schema(batch.schema).parquet(src)
            t0 = time.time()
            stream_ivf_decon(stream, idx, cents, out, ck,
                             threshold=0.32, nprobe=2)
            n = read_gated_docs(spark, out).count()
            dt = time.time() - t0
            print(f"    k={k_centroids} run {r}: {dt:.2f}s "
                  f"({n} clean rows)", flush=True)
            best = min(best, dt)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return best


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from ncbi_analysis_spark.session import get_spark

    spark = get_spark(app_name="ivf-stream-soak")
    spark.sparkContext.setLogLevel("ERROR")

    e01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    sf1_dir = synth_sf1_embeddings(spark)
    e1 = spark.read.parquet(f"{sf1_dir}/embeddings.parquet")
    n01, n1 = e01.count(), e1.count()
    print(f"sf0.1 N={n01} (k=8) / sf1 N={n1} (k=25); "
          f"batch={BATCH_ROWS} at both", flush=True)

    t01 = run_gate(spark, e01, 8, runs)
    t1 = run_gate(spark, e1, 25, runs)
    print(f"\nsf0.1 -> sf1 (10x vectors, fixed batch, k~sqrt(N)):")
    print(f"  gate drain: {t01:.2f} -> {t1:.2f} s "
          f"({t1 / t01:.1f}x wall; sqrt(10)~3.2x is the probe-work "
          f"model's prediction)")


if __name__ == "__main__":
    main()
