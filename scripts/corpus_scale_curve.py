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

Usage: python scripts/corpus_scale_curve.py [sf ...] [--steep]
                                            [--only q1,q2,...]
       (default sfs: 0.001 0.01 0.1; ``--steep`` restricts to the
       standing sf1 soak set — the round-7 verdict's steep shapes plus
       each later round's newcomers; ``--only`` restricts to an
       explicit comma-separated query list)

sf=1 has no driver-generated corpus; the script SYNTHESIZES one under
/tmp (cached across runs) by replicating the sf0.1 documents 10x with
shifted doc_ids and a per-replica salt token appended to the text, so
row count and digest cardinalities grow ~linearly rather than every
document gaining 9 exact copies (which would make the dedup shapes
measure a degenerate corpus, not scale).
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


# the shapes with the steepest sf0.01 -> sf0.1 curves (round-7 verdict):
# inverted-index Jaccard (skew-capped self-join), the distinct-score
# cumulative scan, anchored span dedup, and the persisted multi-stage
# composition — all documents-table-only, so the sf1 synthesis stays a
# one-table job
STEEP = ["dedup_ngram_jaccard", "quality_quantile_gate",
         "dup_span_removal", "curation_v3",
         # round-9 soak of the r8/r9 newcomers (round-8 verdict ask #6)
         # + the r10-staged perceptual pairing — all documents-only, so
         # the sf1 synthesis stays a one-table job
         "gopher_repetition_gate", "bpe_vocab", "lsh_incremental_decon",
         "stream_curation", "image_phash_near_dup",
         # late-round-9 staged additions (all documents-only)
         "source_curation_report", "curation_v4", "pack_bpe_budget",
         "video_frame_near_dup",
         # final round-9 staged additions (documents-only; the third,
         # cluster_diversity_sample, is embeddings-table and the sf1
         # synthesis is documents-only — its decade curve is
         # sf0.01 -> 0.1 via the default run)
         "unicode_normalize", "lsh_recall_audit",
         # round-10 soaks (r9 verdict ask 7): the never-soaked r10
         # registrations — events and embeddings tables are now
         # synthesized at sf1 too — plus the r11-staged sketches
         "pca_embedding_project", "hll_user_distinct",
         "hll_merge_snapshots", "pca_variance_gate",
         "kmv_content_overlap", "zorder_layout_events",
         # late-round-10 staged additions
         "stream_dedup_digests", "stream_hll_user_distinct",
         "vocab_drift_report", "hll_user_cube", "ann_pca_rerank",
         # round-10 retrieval additions (documents-only)
         "bm25_search", "rrf_hybrid_search",
         # round-12 staged additions (all documents-only)
         "bm25_index_batch", "quantile_sketch_estimates",
         "quantile_sketch_gate", "heavy_hitters_report",
         "cm_heavy_estimates", "priority_sample_mixture",
         # late-round-12 staged additions (documents-only)
         "dsir_priority_mixture", "priority_sample_per_lang",
         "quantile_sketch_per_lang", "drift_top_tokens",
         "kmv_crawl_diff",
         # round-13 staged additions: the index-delete family
         # (documents-table), streaming CM, and the span-recall audit
         # (its brute-force truth leg is the deliberate cost);
         # ivf_delete_search is embeddings-table — synthesized at sf1
         # since v2
         "bm25_delete_search", "bm25_compacted_search",
         "lsh_delete_probe", "ivf_delete_search",
         "stream_cm_publish", "span_recall_planted",
         "bpe_encode_ids", "stream_quantile_publish",
         "heavy_hitters_per_lang", "curation_v5"]
         # (flagship_multi_accession is scale-CAPPED by design — its
         # genome is doc_id < 200 at every sf, so a soak would measure
         # a constant; the 1 Mbp bench shapes cover scan scaling)
         # (w1_topk_pruned is lineitem-table — the sf1 synthesis is
         # documents/events/embeddings only; its decade curve is
         # sf0.01 -> 0.1 via the default run, the
         # cluster_diversity_sample precedent)


def _sf_dir(spark, sf: float) -> str:
    """Resolve (or synthesize) the corpus directory for a scale factor."""
    path = f"/root/testdata/sf{sf:g}"
    if os.path.isdir(path):
        return path
    if sf != 1:
        raise SystemExit(f"no corpus for sf{sf:g} and no synthesis rule")
    synth = "/tmp/spark_graft_synth_sf1"
    # v2: events + embeddings added to the synthesis (round-10 soaks);
    # a v1 cache (documents-only) regenerates
    marker = os.path.join(synth, "_SYNTH_DONE_v2")
    if os.path.exists(marker):
        return synth
    from pyspark.sql import functions as F

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = None
    for i in range(10):
        r = base.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            *[c for c in base.columns if c not in ("doc_id", "text")],
            (F.col("text") if i == 0 else F.concat_ws(
                " ", F.col("text"), F.lit(f"rep{i}"))).alias("text"),
        ).select(base.columns)
        reps = r if reps is None else reps.unionByName(r)
    reps.repartition(64).write.mode("overwrite").parquet(
        os.path.join(synth, "documents.parquet"))
    # events: replicate with shifted event_id AND user_id so distinct
    # cardinalities (the HLL/KMV work drivers) grow ~linearly, not
    # every user gaining 9 aliases of identical behavior
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    ev_reps = None
    for i in range(10):
        r = ev.select(
            (F.col("event_id") + i * 100_000_000).alias("event_id"),
            (F.col("user_id") + i * 10_000_000).alias("user_id"),
            *[c for c in ev.columns if c not in ("event_id", "user_id")],
        ).select(ev.columns)
        ev_reps = r if ev_reps is None else ev_reps.unionByName(r)
    ev_reps.repartition(64).write.mode("overwrite").parquet(
        os.path.join(synth, "events.parquet"))
    # embeddings: shifted vec_id, vectors as-is (row count drives the
    # moments/projection work; the spectrum itself is scale-free)
    em = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    em_reps = None
    for i in range(10):
        r = em.select(
            (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
            *[c for c in em.columns if c != "vec_id"],
        ).select(em.columns)
        em_reps = r if em_reps is None else em_reps.unionByName(r)
    em_reps.repartition(16).write.mode("overwrite").parquet(
        os.path.join(synth, "embeddings.parquet"))
    open(marker, "w").close()
    return synth


def main() -> None:
    argv = sys.argv[1:]
    only: list[str] = []
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1].split(",")
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if a != "--steep"]
    steep_only = "--steep" in argv
    sfs = [float(a) for a in args] or [0.001, 0.01, 0.1]
    import __spark_entry__ as e
    from ncbi_analysis_spark.plans import registry
    from ncbi_analysis_spark.session import get_spark

    spark = get_spark(app_name="corpus-scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**e.queries(), **registry.staged_queries()}
    # round-8-staged shapes: anchor-window span dedup, apportionment +
    # repeat explode, distinct-score cumulative scan, shard map + keyed
    # window, id-keyed full outer join, and the persisted composition
    names = QUERIES + [
        "boilerplate_scrub",
        "dup_span_removal", "epoch_mixture", "quality_quantile_gate",
        "curriculum_layout", "corpus_snapshot_diff", "curation_v3",
    ]
    if steep_only:
        names = list(STEEP)
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            raise SystemExit(f"--only: unknown queries {unknown}")
        names = list(only)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the Arrow worker pool + JVM codegen before any timing
    noop(qs["dedup_minhash_signature"](spark, _sf_dir(spark, sfs[0])))

    results: dict[str, dict[float, float]] = {n: {} for n in names}
    for sf in sfs:
        sf_dir = _sf_dir(spark, sf)
        for name in names:
            runs = []
            for _ in range(N_RUNS):
                t0 = time.time()
                noop(qs[name](spark, sf_dir))
                runs.append(round(time.time() - t0, 2))
            results[name][sf] = min(runs)
            print(f"sf{sf:g} {name}: runs={runs} min={min(runs)}", flush=True)

    for lo, hi in ((0.01, 0.1), (0.1, 1)):
        if not (lo in sfs and hi in sfs):
            continue
        print(f"\nsf{lo:g} -> sf{hi:g} growth (10x rows):")
        for name in names:
            a, b = results[name].get(lo), results[name].get(hi)
            if a is not None and b is not None:
                # sub-5ms minima round to 0.0 — report without a ratio
                # rather than dividing by zero or silently skipping
                ratio = (f"({b / a:.1f}x wall)" if a > 0
                         else f"(sf{lo:g} under timer resolution)")
                print(f"  {name}: {a} -> {b} s  {ratio}")


if __name__ == "__main__":
    main()
