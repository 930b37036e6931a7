"""ANN operating curve: recall@k vs wall time across the tunables of
each search tier, measured on the real corpus (sf1 synth by default)
instead of assumed from rules of thumb.

Sweeps
  ann_ivf          nprobe in {1, 2, 4, 8}        (16 centroids)
  ann_pca_rerank   shortlist in {20, 40, 80, 160} (PCA k=8 of d)
  ann_ivf_pq       nprobe in {1, 2, 4, 8}         (PQ m=8, 16 cents)
  ann_ivf_sq8      nprobe in {1, 2, 4, 8}         (trained bounds;
                   both pure-SQ and rerank=4k asymmetric-then-exact)

against the exact brute-force top-10 for the SAME sampled query batch.
Each configuration reports min-of-N wall (noop sink, the bench
convention) and mean/p10 recall@10 — the artifact SCALING.md's
operating-curve table is built from. The brute-force leg is measured
once as the 1.0-recall anchor.

Usage: python scripts/ann_operating_curve.py [sf] [n_queries] [n_cents]
       (defaults: sf=1 — synthesized like corpus_scale_curve —
        n_queries=48, n_cents=16, runs=$SPARK_GRAFT_BENCH_RUNS or 3;
        raise n_cents to shrink buckets until the recall axis actually
        moves — with coarse buckets every config recalls 1.0 and the
        sweep only measures wall)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _recall(exact, approx, q_id="q_id", id_col="vec_id"):
    """Per-query recall of ``approx`` against ``exact`` (both
    (q_id, id_col) result tables) — the ann_recall_audit join."""
    from pyspark.sql import functions as F

    e = exact.select(q_id, id_col, F.lit(1).alias("in_e"))
    a = approx.select(q_id, id_col, F.lit(1).alias("in_a"))
    per = (
        e.join(a, [q_id, id_col], "full_outer")
        .groupBy(q_id)
        .agg(
            F.coalesce(F.sum("in_e"), F.lit(0)).alias("n_e"),
            F.coalesce(F.sum(F.col("in_e") * F.col("in_a")), F.lit(0))
            .alias("n_hit"),
        )
        .filter(F.col("n_e") > 0)
        .select((F.col("n_hit") / F.col("n_e")).alias("r"))
        .collect()
    )
    rs = sorted(row["r"] for row in per)
    mean = sum(rs) / len(rs)
    p10 = rs[max(0, int(0.10 * len(rs)) - 1)] if len(rs) >= 10 else rs[0]
    return round(mean, 4), round(p10, 4)


def run() -> None:
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.embeddings import pca_fit
    from ncbi_analysis_spark.operators.similarity_search import (
        brute_force_topk,
        ivf_assign,
        ivf_pq_topk,
        ivf_sq8_topk,
        ivf_topk,
        pq_encode,
        reduced_rerank_topk,
        sq8_encode_index,
        train_pq_codebooks,
        train_sq_bounds,
    )
    from ncbi_analysis_spark.session import get_spark

    args = sys.argv[1:]
    sf = float(args[0]) if args else 1.0
    n_queries = int(args[1]) if len(args) > 1 else 48
    n_cents = int(args[2]) if len(args) > 2 else 16
    spark = get_spark(app_name="ann-operating-curve")
    spark.sparkContext.setLogLevel("ERROR")

    if sf == 1.0 and not os.path.isdir("/root/testdata/sf1"):
        # reuse corpus_scale_curve's cached synthesis
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "corpus_scale_curve",
            os.path.join(os.path.dirname(__file__), "corpus_scale_curve.py"),
        )
        csc = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(csc)
        sf_dir = csc._sf_dir(spark, 1.0)
    else:
        sf_dir = f"/root/testdata/sf{sf:g}"

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    cents = emb.filter(F.col("vec_id") < n_cents).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    k = 10

    def timed(thunk):
        runs = []
        for _ in range(N_RUNS):
            t0 = time.time()
            thunk()
            runs.append(time.time() - t0)
        return round(min(runs), 2)

    # exact anchor: timed UNPERSISTED (a persisted frame would time the
    # cache read), then persisted as the recall denominator
    t_exact = timed(lambda: _noop(brute_force_topk(emb, q, k=k)))
    exact = brute_force_topk(emb, q, k=k).persist()
    n_rows = exact.count()  # materialize the persist
    n_corpus = emb.count()
    print(f"sf{sf:g} corpus={n_corpus} n_queries={n_queries} "
          f"exact brute-force: {t_exact}s ({n_rows} rows)", flush=True)

    # IVF: index built once (production shape), sweep nprobe
    index = ivf_assign(emb, cents).persist()
    index.count()
    for nprobe in (1, 2, 4, 8):
        res = ivf_topk(emb, q, cents, k=k, nprobe=nprobe, assigned=index)
        t = timed(lambda res=res: _noop(res))
        mean_r, p10_r = _recall(exact, res)
        print(f"ann_ivf nprobe={nprobe} cents={n_cents}: wall={t}s recall@10 "
              f"mean={mean_r} p10={p10_r}", flush=True)
    index.unpersist()

    # PCA rerank: fit once, sweep shortlist
    mean_v, comps, _ = pca_fit(emb, k=8)
    for shortlist in (20, 40, 80, 160):
        res = reduced_rerank_topk(
            emb, q, mean_v, comps, k=k, shortlist=shortlist)
        t = timed(lambda res=res: _noop(res))
        mean_r, p10_r = _recall(exact, res)
        print(f"ann_pca_rerank shortlist={shortlist}: wall={t}s recall@10 "
              f"mean={mean_r} p10={p10_r}", flush=True)

    # IVF-PQ: codebooks trained + corpus encoded once, sweep nprobe
    B = train_pq_codebooks(emb, m=8)
    codes = pq_encode(emb, B).persist()
    codes.count()
    index2 = ivf_assign(emb, cents).persist()
    index2.count()
    for nprobe in (1, 2, 4, 8):
        res = ivf_pq_topk(
            emb, q, cents, B, k=k, nprobe=nprobe, rerank=4 * k,
            assigned=index2, codes=codes)
        t = timed(lambda res=res: _noop(res))
        mean_r, p10_r = _recall(exact, res)
        print(f"ann_ivf_pq nprobe={nprobe}: wall={t}s recall@10 "
              f"mean={mean_r} p10={p10_r}", flush=True)
    # IVF-SQ8: bounds trained + index coded once, sweep nprobe; the
    # rerank leg re-scores a 4k shortlist exactly (the production knob)
    bounds = train_sq_bounds(emb)
    coded = sq8_encode_index(index2, bounds).persist()
    coded.count()
    for nprobe in (1, 2, 4, 8):
        res = ivf_sq8_topk(emb, q, cents, bounds=bounds, k=k,
                           nprobe=nprobe, index=coded)
        t = timed(lambda res=res: _noop(res))
        mean_r, p10_r = _recall(exact, res)
        rr = ivf_sq8_topk(emb, q, cents, bounds=bounds, k=k,
                          nprobe=nprobe, rerank=4 * k, index=coded)
        t2 = timed(lambda rr=rr: _noop(rr))
        mean_r2, p10_r2 = _recall(exact, rr)
        print(f"ann_ivf_sq8 nprobe={nprobe}: wall={t}s recall@10 "
              f"mean={mean_r} p10={p10_r} | rerank=4k wall={t2}s "
              f"mean={mean_r2} p10={p10_r2}", flush=True)
    coded.unpersist()
    codes.unpersist()
    index2.unpersist()
    exact.unpersist()


if __name__ == "__main__":
    run()
