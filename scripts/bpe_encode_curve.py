"""BPE encode throughput curve (round-8 verdict ask #9).

The trained-BPE budget path (``functions/bpe.py::bpe_token_counts``)
now feeds packing and mixture quotas; this script measures what that
costs versus the heuristic regex counter
(``functions/text.py::bpe_ish_token_count``) on the same corpora, so
the trained path's price stays an observed number instead of a vibe.

For each sf: train merges once (untimed — train-offline posture), then
min-of-N wall time of (a) trained encode counts, (b) heuristic counts,
plus corpus token totals so the cost can be read as tokens/sec.

Usage: python scripts/bpe_encode_curve.py [sf ...]   (default 0.1 1)
sf=1 reuses corpus_scale_curve.py's synthesized corpus.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def main() -> None:
    sfs = [float(a) for a in sys.argv[1:]] or [0.1, 1]
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.functions import text as textf
    from ncbi_analysis_spark.functions.bpe import bpe_token_counts, train_bpe
    from ncbi_analysis_spark.session import get_spark
    from scripts.corpus_scale_curve import _sf_dir

    spark = get_spark(app_name="bpe-encode-curve")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for sf in sfs:
        d = spark.read.parquet(
            os.path.join(_sf_dir(spark, sf), "documents.parquet"))
        d = d.select("doc_id", "text").persist()
        n_docs = d.count()  # also warms the cache so both legs read memory
        merges = train_bpe(d, "text", num_merges=200)

        def timed(thunk):
            runs = []
            for _ in range(N_RUNS):
                t0 = time.time()
                thunk()
                runs.append(round(time.time() - t0, 2))
            return min(runs), runs

        trained, tr_runs = timed(lambda: noop(bpe_token_counts(d, merges)))
        heur, he_runs = timed(lambda: noop(d.select(
            textf.bpe_ish_token_count(F.col("text")).alias("n"))))
        tokens = d.select(
            F.sum(textf.bpe_ish_token_count(F.col("text")))).first()[0]
        d.unpersist()
        ratio = trained / heur if heur > 0 else float("inf")
        print(f"sf{sf:g}: docs={n_docs} heuristic_tokens={tokens} | "
              f"trained={trained}s {tr_runs} "
              f"({tokens / trained / 1e6:.1f} Mtok/s) | "
              f"heuristic={heur}s {he_runs} "
              f"({tokens / heur / 1e6:.1f} Mtok/s) | "
              f"trained/heuristic={ratio:.1f}x", flush=True)


if __name__ == "__main__":
    main()
