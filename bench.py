"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Execution is forced with the noop sink (full pipeline runs, nothing is
collected to the driver).

Each query is timed $SPARK_GRAFT_BENCH_RUNS times (default 3) and the
reported per-query number is the MINIMUM — round 2 showed 2-3x
single-run swings on identical code on this host (e.g. dedup_simhash
1.89s vs 6.24s), so single-shot timings cannot support a regression
verdict in either direction. The max/min spread per query is emitted as
"noise" so a reader can judge how steady the host was.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from ncbi_analysis_spark.plans import driver_queries  # noqa: E402
from ncbi_analysis_spark.session import get_spark  # noqa: E402

N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

# Shapes whose min-of-3 driver noise (max/min) has exceeded ~2x get
# extra executions so the reported min is a steady-state reading and the
# 2x regression gate stays meaningful (r9 verdict: 3.76-3.79 on these
# two; everything else <=3). Values are total runs, replacing N_RUNS.
EXTRA_RUNS = {
    "flagship_scan_1mbp": max(N_RUNS, 5),
    "image_phash_near_dup": max(N_RUNS, 5),
    # r12: the two cheap window shapes read noise 2.0-2.4 in the final
    # r12 clean run (cold first execution dominates their ~1s wall);
    # the standing rule is warm-up for any shape past 2
    "w2_local_max_suppression": max(N_RUNS, 4),
    "w7_gap_regions": max(N_RUNS, 4),
    # r13: retrains the merge table per execution — the cold first run
    # (histogram collect + driver merge loop warmup) read 3.6x noise at
    # seeding; warm-up keeps the min a steady-state reading
    "bpe_encode_ids": max(N_RUNS, 4),
    # r14: both were driver-flagged in r13 on single-run noise (their
    # cold first executions read 2.9x / 4.0x their steady state in the
    # r14 re-measure — scan caches + the eager model collect) while the
    # min-of-3 clean runs sat at ~1.2x; warm-up makes the driver record
    # a steady-state reading too. bm25_search additionally got the
    # columnar single-scan fast path this round (2.87s -> 1.45s
    # standalone min-of-5, control 0.467).
    "bm25_search": max(N_RUNS, 4),
    "heavy_hitters_report": max(N_RUNS, 4),
    # r14: retrains the merge table per execution (bpe_encode_ids'
    # cold-first-run class)
    "bpe_roundtrip": max(N_RUNS, 4),
    # r14: both flagged on in-run cold-first noise in the first r14
    # clean run (3.4x / 2x first-vs-steady; standalone min-of-5 read
    # 1.12x and 1.0x vs baseline with the control at 0.476)
    "ann_ivf_search": max(N_RUNS, 4),
    "s10_pubmed_report": max(N_RUNS, 4),
    # r14: cold first execution read 2.9x steady at seeding (the
    # staged 64-file publish amplifies scan-cache cold starts)
    "cc_labels_parted": max(N_RUNS, 4),
    # r15: the five r14 driver-record flags (dup_span_removal 2.76x,
    # fuzzy_decon 2.02x, quality_classifier 1.95x, curation_v3 1.89x,
    # flagship_scan_1mbp_full 1.5x) all adjudicated to time-local box
    # contention — clean-run history flat since r8, no code change in
    # their paths. Warm-up + extra runs give each a wider window to
    # catch steady state; the retry-on-flag pass below is the backstop.
    "dup_span_removal": max(N_RUNS, 4),
    "fuzzy_decon": max(N_RUNS, 4),
    "quality_classifier": max(N_RUNS, 4),
    "curation_v3": max(N_RUNS, 4),
    "flagship_scan_1mbp_full": max(N_RUNS, 4),
    # r15 opt: shapes past the standing noise-2x rule in the
    # pre-optimization clean record (BENCH_LOCAL_r15opt_pre noise:
    # flagship_multi_accession 6.56, stream_fuzzy_decon 3.75,
    # hll_user_cube 3.5, text_stats 2.81, pack_bpe_budget 2.78,
    # video_frame_near_dup 2.57, pack_sequences 2.39,
    # a1_priority_distribution 2.06) — all cold-first-execution class
    # (codegen of 1 Mbp literals / stream start / cube planning /
    # merge-table retrain), steady-state flat.
    "flagship_multi_accession": max(N_RUNS, 4),
    "stream_fuzzy_decon": max(N_RUNS, 4),
    "hll_user_cube": max(N_RUNS, 4),
    "text_stats": max(N_RUNS, 4),
    "pack_bpe_budget": max(N_RUNS, 4),
    "video_frame_near_dup": max(N_RUNS, 4),
    "pack_sequences": max(N_RUNS, 4),
    "a1_priority_distribution": max(N_RUNS, 4),
    # r15 opt: chronically retry-flagged streaming publishers — hit the
    # retry-on-flag pass in BOTH full r15-opt runs (pre: 5.21->1.40 /
    # 4.04->1.81; post: 2.13->1.66 / 2.67->3.00 on a measured-1.24x-slow
    # box) with flat clean history and r10-era baselines; stream-start
    # cold cost dominates their ~1.5s walls
    "stream_dedup_digests": max(N_RUNS, 4),
    "stream_hll_user_distinct": max(N_RUNS, 4),
}

# Thunks whose resources are torn down before the retry pass runs (temp
# staging dirs removed in their finally blocks) — never retried.
NON_RETRYABLE = {"stream_curation_durable"}

# Headline set: the scan-agg core, window ops, every join family, and the
# LLM-pipeline ops — each stresses a distinct shuffle/UDF shape.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_local_supplier_volume",
    "a1_priority_distribution",
    "w1_topk_per_group",
    "w2_local_max_suppression",
    "w7_gap_regions",
    "j1_cluster_parts",
    "j2_nation_rollup",
    "j3_interval_overlap",
    "j4_asof_backward",
    "j5_asof_forward",
    "dedup_exact_groups",
    "dedup_minhash_signature",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_dup_clusters",
    "decon_ngram_overlap",
    "curation_pipeline",
    "repetition_quality",
    "text_stats",
    "pack_sequences",
    "tfidf_terms",
    "ngram_lm_quality",
    "ann_brute_force",
    "ann_ivf",
    "ann_ivf_trained",
    "ann_pq_rerank",
    "stream_windowed_counts",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time_best(thunk: Callable[[], None], n: int = N_RUNS) -> tuple[float, float]:
    """(min, max/min spread) over n executions of thunk."""
    runs = []
    for _ in range(n):
        t0 = time.time()
        thunk()
        runs.append(time.time() - t0)
    best = min(runs)
    return round(best, 3), round(max(runs) / best, 2) if best > 0 else 1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="ncbi-analysis-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = driver_queries.queries()

    # warmup: exercise codegen/JIT + file index once so timings reflect
    # steady-state executor behavior, not JVM startup
    for warm in ("q3_top_revenue", "j1_cluster_parts"):
        try:
            _noop(qs[warm](spark, sf_dir))
        except Exception:  # noqa: BLE001 — warmup must never kill the run
            pass

    # warm the Arrow python-worker pool (pandas/numpy imports in each of
    # the 32 workers) with a tiny scan, so the flagship timing below
    # measures the pipeline rather than cold interpreter startup
    from ncbi_analysis_spark.plans.similarity_scan import similarity_scan

    warm_g = spark.createDataFrame([("warm", "acgt" * 2500)], ["accession", "seq"])
    warm_q = spark.createDataFrame([("wq", "acgtacgtacgt")], ["name", "gene"])
    _noop(similarity_scan(
        warm_g, warm_q, {"direct": 1.0, "consistency": 2.0}, top_k=5,
        candidate_distance=5, patience=2, chunk_size=512,
    ))

    timings: dict[str, float] = {}
    noise: dict[str, float] = {}
    errors: dict[str, str] = {}
    thunks: dict[str, Callable[[], None]] = {}

    def _run(name: str, thunk: Callable[[], None]) -> None:
        """Time one query; a failure records an error entry instead of
        aborting the run (round 4 lost ALL timings to one broken query).
        EXTRA_RUNS shapes get one UNTIMED warm-up first — their driver
        noise came from the cold first execution (scan caches, codegen
        for the 1 Mbp literals), which min-of-N absorbs in the min but
        not in the max/min noise figure."""
        try:
            thunks[name] = thunk
            if name in EXTRA_RUNS:
                thunk()
            timings[name], noise[name] = _time_best(
                thunk, EXTRA_RUNS.get(name, N_RUNS)
            )
        except Exception as exc:  # noqa: BLE001 — fault isolation by design
            errors[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}"

    for name in BENCH_QUERIES:
        fn = qs[name]
        _run(name, lambda fn=fn: _noop(fn(spark, sf_dir)))

    # round-7+ registry entries (wired AND staged) are timed via their
    # round dicts so every baseline series stays continuous and staged
    # rounds bench ahead of registration (baselines seeded before the
    # driver ever times them); which rounds that covers comes from the
    # one staging list in plans/registry.py
    from ncbi_analysis_spark.plans import registry

    for suffix in registry.bench_rounds():
        for name, fn in registry.round_queries(suffix).items():
            _run(name, lambda fn=fn: _noop(fn(spark, sf_dir)))

    # flagship genomic scan at real genome scale: 1 Mbp x 2 queries x 2
    # strands with branch-and-bound floor (the scale configuration; the
    # exact no-floor parity mode scores every offset with the vectorized
    # kernels and runs ~2-3x slower)
    import random

    rnd = random.Random(2)
    genome = "".join(rnd.choice("acgt") for _ in range(1_000_000))
    gq = [(f"q{i}", "".join(rnd.choice("acgt") for _ in range(12))) for i in range(2)]
    g_df = spark.createDataFrame([("bench", genome)], ["accession", "seq"])
    q_df = spark.createDataFrame(gq, ["name", "gene"])
    _run("flagship_scan_1mbp", lambda: _noop(similarity_scan(
        g_df, q_df, {"direct": 1.0, "consistency": 2.0}, top_k=20,
        candidate_distance=5, patience=2, chunk_size=65536, score_floor=8.0,
    )))

    # the reference driver's full scorer mix (all four kernels + pattern
    # conditions + text-edit abort, src/1-run_gene_similarity_match.py:14-44)
    # on the same 1 Mbp — exercises the batched text-edit DP and the
    # vectorized pattern plan. The staged branch-and-bound applies: the
    # pattern score is bounded by must+optional totals and a second
    # prune with the exact cheap scores gates the O(L^2) DP, so with
    # score_floor=8 most offsets never reach the text-edit kernel
    full_conds = {
        "must": [{"offset": 0, "length": 4}, {"offset": -4, "length": 4}],
        "optional": [{"offset": 4, "length": 1}, {"offset": -5, "length": 1}],
    }
    _run("flagship_scan_1mbp_full", lambda: _noop(similarity_scan(
        g_df, q_df,
        {"direct": 1.0, "consistency": 1.0, "text_edit": 1.0, "pattern": 1.0},
        top_k=20, candidate_distance=5, patience=2,
        continuous_mismatch_limit=10, pattern_conditions=full_conds,
        chunk_size=65536, score_floor=8.0,
    )))

    # the same 1 Mbp scan through the pre-split window layout (the
    # giant-accession path): tracks the window->chunk regroup overhead
    # against flagship_scan_1mbp (~2% at introduction)
    from ncbi_analysis_spark.plans.similarity_scan import (
        similarity_scan_windowed,
        split_genome_windows,
    )

    g_windows = split_genome_windows(g_df, 1 << 16)
    _run("flagship_windowed_1mbp", lambda: _noop(similarity_scan_windowed(
        g_windows, q_df, {"direct": 1.0, "consistency": 2.0}, top_k=20,
        candidate_distance=5, patience=2, chunk_size=65536, score_floor=8.0,
    )))

    # big x big interval overlap via coordinate binning — the 100 TB
    # shape for J3 (the broadcast path benches inside j3_interval_overlap
    # above): two 1M-interval sides, 4 chromosome-ish partition keys,
    # ~2M overlap pairs; no broadcast, no nested-loop join
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.intervals import interval_join_binned

    def _intervals(side: str, id_col: str):
        start = F.abs(F.hash(F.col("id"), F.lit(side))) % 25_000_000
        length = F.abs(F.hash(F.col("id"), F.lit(side + "len"))) % 200 + 1
        return spark.range(1_000_000).select(
            F.col("id").alias(id_col),
            (F.abs(F.hash(F.col("id"), F.lit(side + "acc"))) % 4).alias("acc"),
            start.alias(side[0] + "s"),
            (start + length).alias(side[0] + "e"),
        )

    big_l = _intervals("lft", "lid")
    big_r = _intervals("rgt", "rid")
    _run("j3_interval_binned_bigbig", lambda: _noop(interval_join_binned(
        big_l, big_r, "ls", "le", "rs", "re",
        bin_size=10_000, partition_keys=["acc"],
    )))

    # vectorized ANN production path (BLAS matmul per Arrow batch; the
    # expression-fold form benches as ann_brute_force above)

    from ncbi_analysis_spark.operators.similarity_search import brute_force_topk_np

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qv = emb.filter(F.col("vec_id") < 16).select(F.col("vec_id").alias("q_id"), "embedding")
    _run("ann_brute_force_np", lambda: _noop(brute_force_topk_np(emb, qv, k=10)))

    # IVF production shape: the index (nearest-centroid assignment) is
    # built ONCE offline — at scale it's written bucketed by c_id — and
    # queries pay only probe + bucket-pruned re-rank. Build is untimed
    # (cached + materialized first); the timed part is the search.
    from ncbi_analysis_spark.operators.similarity_search import ivf_assign, ivf_topk

    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    q48 = emb.filter(F.col("vec_id") < 48).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    try:
        index = ivf_assign(emb, cents).persist()
        index.count()
        _run("ann_ivf_search",
             lambda: _noop(ivf_topk(emb, q48, cents, k=10, nprobe=2, assigned=index)))
        index.unpersist()
    except Exception as exc:  # noqa: BLE001 — fault isolation by design
        errors["ann_ivf_search"] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}"

    # end-to-end DURABLE streaming curation (run_curation_job): parquet
    # file source -> stateless decon+score+gate -> exactly-once parquet
    # sink with checkpoint. stream_curation above times the in-memory
    # sink; this is the restartable production form. Model fit + source
    # staging are untimed (train-offline posture). Each timed run gets a
    # FRESH checkpoint + output dir — with a reused checkpoint the
    # exactly-once contract makes reruns no-ops, which would bench the
    # no-op.
    import glob as _glob
    import itertools as _it
    import shutil as _shutil
    import tempfile as _tempfile

    from ncbi_analysis_spark.operators.terms import quality_classifier_weights
    from ncbi_analysis_spark.plans.driver_queries_r8 import _QC_PARAMS
    from ncbi_analysis_spark.streaming.events import run_curation_job

    d_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    cur_corpus = d_docs.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    cur_bench = d_docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("bench_id"), "text")
    stage_root = _tempfile.mkdtemp(prefix="bench_stream_cur_")
    try:
        # many-file staging (r7 lesson: interpreted row work
        # parallelizes by source file count)
        cur_corpus.repartition(16).write.parquet(f"{stage_root}/stage")
        os.makedirs(f"{stage_root}/src")
        for _i, _p in enumerate(sorted(_glob.glob(f"{stage_root}/stage/part-*.parquet"))):
            _shutil.copy(_p, f"{stage_root}/src/docs{_i}.parquet")
        w_df, bias = quality_classifier_weights(
            d_docs.filter(F.col("lang") == "en"),
            d_docs.filter(F.col("lang") != "en"),
            "text", "doc_id", **_QC_PARAMS)
        _cur_seq = _it.count()

        def _durable_run():
            n = next(_cur_seq)
            run_curation_job(
                spark, f"{stage_root}/src", cur_corpus.schema, cur_bench,
                w_df, bias, f"{stage_root}/out{n}", f"{stage_root}/ck{n}",
                min_prob=0.0, num_perm=4, bands=2, **_QC_PARAMS)

        _run("stream_curation_durable", _durable_run)
    except Exception as exc:  # noqa: BLE001 — fault isolation by design
        errors["stream_curation_durable"] = (
            f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}")
    finally:
        _shutil.rmtree(stage_root, ignore_errors=True)

    # Retry-on-flag pass (r15, verdict ask 1): two rounds running, every
    # driver-record regression flag adjudicated after the fact to
    # time-local box contention (2 flags r13, 5 flags r14 — clean-run
    # history flat, no code change in the flagged paths). Re-measure any
    # query the report WOULD flag, at the end of the session when the
    # contention window has usually passed, and keep the min. A real
    # plan regression is slow on the retry too and stays flagged; a
    # contention spike clears. The retry seconds are recorded so the
    # record shows what happened rather than silently absorbing it.
    retried: dict[str, list[float]] = {}
    if sf == 0.1:
        flagged = list(_regression_report(timings).get("regressions", {}))
        for name in flagged:
            if name in NON_RETRYABLE or name not in thunks:
                continue
            try:
                first = timings[name]
                thunks[name]()  # untimed warm-up (cold-cache decorrelation)
                best, _ = _time_best(thunks[name], 3)
                retried[name] = [first, best]
                if best < first:
                    timings[name] = best
            except Exception as exc:  # noqa: BLE001 — fault isolation
                errors[f"retry:{name}"] = (
                    f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}")

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": N_RUNS,
        "aggregation": "min",
        "noise_max_over_min": noise,
        "errors": errors,
    }
    if retried:
        out["retried_flagged"] = retried
    if sf == 0.1:
        out.update(_regression_report(timings))
    print(json.dumps(out))


# Per-query self-baseline: (seconds, round the baseline was recorded).
# Round 1 (BENCH_r01.json, single-shot) is the absolute baseline for the
# queries that existed then; queries added — or deliberately re-scoped
# (ann_* workloads were enlarged in round 2) — after r01 are baselined at
# their BENCH_r03.json minima, the first min-of-3 record, so every bench
# query has a tracked baseline. r01 numbers are single-shot while this
# harness reports min-of-N, so ratios vs round-1 baselines are biased
# slightly DOWN — a flagged regression is therefore conservative.
#
# The host VM shows variable CPU steal, so a raw >1.5x threshold would
# flag whole runs on a busy day: a query is only reported as a regression
# when it is ALSO slow relative to this run's median ratio (i.e. it
# specifically regressed, not the machine). A uniform whole-run slowdown
# is flagged separately via run_flag when the median itself exceeds 2x.
BASELINE = {
    "q1_pricing_summary": (1.398, 1), "q3_top_revenue": (2.02, 1),
    "q5_local_supplier_volume": (1.132, 1), "a1_priority_distribution": (0.417, 1),
    "w1_topk_per_group": (1.536, 1), "w2_local_max_suppression": (0.63, 1),
    "w7_gap_regions": (1.174, 1), "j1_cluster_parts": (0.254, 1),
    "j2_nation_rollup": (0.59, 1), "j3_interval_overlap": (1.037, 1),
    "j4_asof_backward": (1.044, 1), "j5_asof_forward": (0.737, 1),
    "dedup_exact_groups": (0.422, 1), "dedup_minhash_signature": (1.433, 1),
    "dedup_simhash": (1.638, 1), "dedup_ngram_jaccard": (3.176, 1),
    "decon_ngram_overlap": (1.274, 1), "curation_pipeline": (5.225, 1),
    "repetition_quality": (1.202, 1), "text_stats": (1.924, 1),
    "flagship_scan_1mbp": (3.068, 1), "ann_brute_force_np": (0.361, 1),
    # added/re-scoped after r01 -> r03 min-of-3 minima
    "dedup_dup_clusters": (2.254, 3),
    # reseeded r7 (BENCH_LOCAL_r07_clean.json): box-wide slowdown vs the
    # r3 seed era — the dedup_exact_groups noise control itself runs 2x
    # its r5 value (0.43 vs 0.214) and the pure-numpy ann_brute_force_np
    # twin is +24%, so 0.357 -> 0.60 is environment, not plan
    "pack_sequences": (0.6, 7),
    "tfidf_terms": (0.84, 3), "ann_brute_force": (4.07, 3),
    "ann_ivf": (2.261, 3), "ann_ivf_search": (1.479, 3),
    # added in r05 (min-of-3 at introduction)
    "ann_ivf_trained": (3.405, 5), "ann_pq_rerank": (1.709, 5),
    "stream_windowed_counts": (2.216, 5),
    # added in r06 (min-of-3 at introduction)
    "flagship_scan_1mbp_full": (3.339, 6),
    # reseeded r7: the 1.331 r6 seed was a quiet-window minimum; the
    # operator is unchanged since its seed commit and a late-r7
    # standalone min-of-5 reads 1.93 (clean same-round runs spanned
    # 1.56-2.10 with the dedup_exact_groups noise control normal) —
    # box drift, the pack_sequences pattern, not a plan change
    "j3_interval_binned_bigbig": (1.93, 7),
    # r10 note: one full-session run read 4.74 min-of-3 (2.3x) while
    # the noise control stayed normal; a fresh-session min-of-4 in the
    # same hour read 1.239 — in-session JVM state noise, not a plan
    # change (all three in-session runs were slow, so EXTRA_RUNS
    # would not have absorbed it). Plan untouched since r6.
    "ngram_lm_quality": (2.059, 6),
    # reseeded r7 from the committed clean min-of-3 measurement
    # (BENCH_LOCAL_r07_clean.json, idle box), replacing r6's
    # hand-derived 2.6 estimate per the round-6 review note
    "flagship_windowed_1mbp": (3.08, 7),
    # reseeded r7: the 0.63 seed was a round-6 quiet-window minimum the
    # query never reproduced (driver r6 measured 1.037, clean r7 run
    # 1.10 — BENCH_r06.json / BENCH_LOCAL_r07_clean.json); operator
    # unchanged since its seed commit
    "boilerplate_scrub": (1.037, 6),
    # staged-r7 entries seeded at their round-6 quiet-run minima
    # (min over two clean min-of-3 runs on an otherwise idle box)
    "semantic_dedup_prune": (5.577, 6),
    "stream_static_enrich": (2.047, 6), "multimodal_media_stats": (0.355, 6),
    "temperature_mixture": (0.44, 6), "doc_chunks": (0.303, 6),
    "fuzzy_decon": (2.52, 6),
    # reseeded r7 after the fused single-pass DSIR fit
    # (dsir_logratios_pred: one job instead of two; min-of-3)
    "dsir_importance": (2.922, 7), "curation_v2": (8.314, 7),
    # staged-r8 entries seeded from standalone min-of-3 on the idle r7
    # box (same session as BENCH_LOCAL_r07_clean.json)
    "dup_span_removal": (3.094, 7), "quality_classifier": (5.772, 7),
    # curation_v3 reseeded after persisting the scrubbed stage across
    # its two jobs (13.4s -> 6.7s min-of-3; ReusedExchange can't span
    # the mid-pipeline top-250 collect)
    "curation_v3": (6.683, 7), "decon_span_scrub": (2.036, 7),
    # streaming gate twins, seeded at standalone min-of-3 after the
    # many-file source staging fix (one task per file; a coalesce(1)
    # stage serialized the interpreted HOF row work onto one core)
    "stream_fuzzy_decon": (4.12, 7), "stream_quality_gate": (5.588, 7),
    "epoch_mixture": (1.389, 7), "rag_retrieval": (2.575, 7),
    "quality_quantile_gate": (1.823, 7), "jsonl_roundtrip": (0.724, 7),
    "quality_quantile_by_lang": (1.704, 7), "corpus_snapshot_diff": (0.724, 7),
    "contamination_report": (1.792, 7),
    "curriculum_layout": (2.485, 7),
    # staged-r9 entries seeded from standalone min-of-3 on the r8 box
    # (noise control dedup_exact_groups read 0.549 in the same session)
    "ann_index_append": (4.559, 8),
    "location_report_fixture": (2.485, 8),
    "quantile_gate_autodegrade": (2.706, 8),
    "stream_curation": (9.551, 8),
    "bpe_vocab": (0.801, 8),
    "lsh_incremental_decon": (2.776, 8),
    # seeded r9 AFTER the Arrow-batched Counter twin replaced the
    # interpreted HOF fold past 1000 rows (expr path measured 17.8s
    # min-of-3 in the same session — a 21x plan improvement, so the
    # pre-twin shape was never baselined); standalone min-of-3, noise
    # control dedup_exact_groups read 0.328
    "gopher_repetition_gate": (0.851, 9),
    # staged-r10 entry seeded from standalone min-of-3 on the r9 box
    # (noise control dedup_exact_groups read 0.360 in the same session)
    "image_phash_near_dup": (1.843, 9),
    # durable streaming curation (run_curation_job, exactly-once parquet
    # sink; 4166 survivors at sf0.1), min-of-3 post-warmup standalone
    # runs 7.75/7.87/9.03 — noise control read 0.283 in the same session
    "stream_curation_durable": (7.746, 9),
    # staged-r10 domain-gate report, standalone min-of-3 (noise control
    # read 0.315 in the same session)
    "source_curation_report": (1.528, 9),
    # staged-r10 four-stage flagship composition, standalone min-of-3
    # (noise control read 0.302 in the same session)
    "curation_v4": (7.567, 9),
    # staged-r10 trained-budget packing, standalone min-of-3 (noise
    # control read 0.335 in the same session)
    "pack_bpe_budget": (1.021, 9),
    # staged-r10 video frame near-dup, standalone min-of-3 (noise
    # control read 0.355 in the same session)
    "video_frame_near_dup": (2.76, 9),
    # staged-r10 unicode normalizer (Arrow map pass over planted
    # denormalized variants), standalone min-of-3 (noise control read
    # 0.446 in the same session)
    "unicode_normalize": (0.744, 9),
    # staged-r10 LSH s-curve audit (exact-Jaccard + banding legs on the
    # md5 half-sample), standalone min-of-3 (noise control read 0.446
    # in the same session)
    "lsh_recall_audit": (3.055, 9),
    # staged-r10 diversity sampling (trained k=8 quantizer + pure-map
    # assign + per-cluster rank), standalone min-of-3 (noise control
    # read 0.446 in the same session)
    "cluster_diversity_sample": (1.754, 9),
    # staged-r10 ANN recall audit (brute + IVF legs on the 48-query
    # batch + overlap), standalone min-of-3 (noise control read 0.369
    # in the same session)
    "ann_recall_audit": (5.233, 9),
    # r10 seeds closing BENCH_r09's `unbaselined` gap, one standalone
    # min-of-3 session on the r10 box (noise control dedup_exact_groups
    # read 0.382 in the same session)
    "hll_user_distinct": (0.723, 10),
    "pca_embedding_project": (0.541, 10),
    # registered-at-r10 zorder key derivation, same session
    "zorder_layout_events": (0.462, 10),
    # staged-r11 HLL snapshot-merge contract query, same session
    "hll_merge_snapshots": (0.531, 10),
    # staged-r11 moments-fit variance gate (full d=64 spectrum from the
    # Arrow moment partials + threshold ranks), same session
    "pca_variance_gate": (0.659, 10),
    # staged-r11 KMV overlap + the two stateful streaming queries, a
    # second standalone min-of-3 session on the r10 box (noise control
    # dedup_exact_groups read 0.433 in that session)
    "kmv_content_overlap": (1.253, 10),
    "stream_dedup_digests": (1.026, 10),
    "stream_hll_user_distinct": (1.314, 10),
    # staged-r11 drift monitor (shared-tokenize persisted base, two
    # witness ranks + pinned fold). Reseeded r13 (code change, NOT box
    # drift — the session's control matched its seed): the r11 eager
    # bounded return + the r12/r13 in-plan counts-reuse guards (md5
    # recompute per vocab row since r13, the bidirectional-mismatch
    # fix) are deliberate correctness spend on a vocabulary-bounded
    # table; min-of-5 on an idle box read 2.823. History: (1.93, 10).
    "vocab_drift_report": (2.823, 13),
    # staged-r11 HLL cube (fine-grain scan + 3 register-table rollups),
    # standalone min-of-3 (noise control read 0.408 in the session)
    "hll_user_cube": (0.862, 10),
    # staged-r11 PCA-shortlist + exact-rerank search (two expr
    # projections + reduced BF + keyed rerank), standalone min-of-3
    # (noise control read 0.375 in the same session)
    "ann_pca_rerank": (2.523, 10),
    # staged-r11 BM25 retrieval (doc lengths + filtered tf explode +
    # driver model + keyed scoring), standalone min-of-3 (noise
    # control read 0.422 in the same session)
    "bm25_search": (1.145, 10),
    # staged-r11 RRF hybrid search (the full BM25 leg + length-prior
    # top-k + rank fusion), standalone min-of-3 (noise control read
    # 0.402 in the same session)
    "rrf_hybrid_search": (1.298, 10),
    # staged-r12 entries, seeded from the round-12 full clean run
    # (min-of-3, zero errors, noise control dedup_exact_groups read
    # 0.225 — an idle box). bm25_index_batch's wall is dominated by
    # the per-run index write+append (the amortized-in-production
    # part); the 3-query batch search itself is the tail.
    "bm25_index_batch": (5.966, 12),
    # Reseeded r13, dual cause: (1) the r13 (h,v) tie-order fix added a
    # secondary sort key to the bottom-k cut (correctness spend — sketch
    # membership is now a total-order function of the row set); (2) the
    # second-session box drifted 1.55x on cheap shapes (control 0.348
    # vs the r12 seed session's 0.225 — see RESEED_CONTROLS). Standalone
    # min-of-5 read 1.1 (conservative; the same-day clean run read
    # 0.826). History: (0.529, 12). Siblings on the same code path
    # stayed under the gate (gate 1.27x, per_lang 0.91x) and keep
    # their seeds.
    "quantile_sketch_estimates": (1.1, 13),
    "quantile_sketch_gate": (0.494, 12),
    "heavy_hitters_report": (0.709, 12),
    "cm_heavy_estimates": (1.117, 12),
    # Reseeded r13 as box drift (code unchanged since r12): the final
    # r13 clean run read 0.562 (1.94x) against a control of 0.267-0.382
    # vs the r12 seed session's 0.225 — a standalone min-of-5 re-measure
    # on the same box read 0.549 with control 0.382 (1.70x box-wide),
    # which explains most of the 1.89x. History: (0.29, 12).
    "priority_sample_mixture": (0.549, 13),
    # staged-r12 streaming sketch publisher (stage + foreachBatch
    # publish + merged read-back), from the second r12 session
    "stream_hll_publish": (1.401, 12),
    # late-staged r12 entries, standalone min-of-3 (the session's noise
    # control read 1.685 — a hot box, so these seeds are conservative:
    # the clean-run numbers should come in at or under them)
    "dsir_priority_mixture": (2.489, 12),
    "priority_sample_per_lang": (0.422, 12),
    "quantile_sketch_per_lang": (0.425, 12),
    # exact drift top-N via HH candidates (same hot-box session class,
    # noise control 1.356)
    "drift_top_tokens": (1.232, 12),
    # two-phase pruned W1 (same session as its A/B: noise control 2.01,
    # window form read 1.47 alongside — the pruned form wins 1.6x on
    # the real lineitem shape)
    "w1_topk_pruned": (0.936, 12),
    # KMV crawl-diff ledger (same hot-box session class, noise control
    # 1.711)
    "kmv_crawl_diff": (1.1, 12),
    # staged-r13 entries, standalone min-of-3 at sf0.1 (noise control
    # dedup_exact_groups read 0.354 min — an idle box; its 4.61 noise
    # is the usual cold-first-run artifact on a sub-second shape).
    # The three index-maintenance shapes are dominated by the per-run
    # write(+delete/compact/append) cycle — the amortized-in-production
    # part; the probe/search tail is the production cost.
    "bm25_delete_search": (5.233, 13),
    "bm25_compacted_search": (8.063, 13),
    "lsh_delete_probe": (2.808, 13),
    "ivf_delete_search": (2.894, 13),
    # streaming CM publisher (stage + foreachBatch publish + merged
    # read-back), same session
    "stream_cm_publish": (1.311, 13),
    # span-recall audit: the brute-force every-position truth leg on
    # the planted-duplicate tenth-sample IS the cost, by design
    "span_recall_planted": (2.141, 13),
    # late-staged r13 three-genome flagship scan (Arrow pool pre-warmed
    # as in the bench run; control dedup_exact_groups read 0.28)
    "flagship_multi_accession": (1.334, 13),
    # late-staged r13 BPE encode-to-ids (train + Arrow-batched encode;
    # control read 0.399)
    "bpe_encode_ids": (0.792, 13),
    # late-staged r13 streaming quantile publisher (stage + foreachBatch
    # publish + merged read + estimates; control read 0.485 — same
    # hot-box class as the dsir_priority_mixture seed, conservative)
    "stream_quantile_publish": (1.906, 13),
    # late-staged r13 per-group heavy hitters (grouped candidate sweep
    # + one grouped recount; control read 0.414)
    "heavy_hitters_per_lang": (1.085, 13),
    # late-staged r13 crawl-refresh composition (LSH-index decon +
    # published-sketch gate + BPE encode + real-token packing; control
    # read 0.412 — wall is dominated by the per-run index/sketch/train
    # builds, the amortized-in-production part)
    "curation_v5": (3.521, 13),
    # second-session r13 entries, standalone min-of-3 at sf0.1 (noise
    # control dedup_exact_groups read 0.317 min — an idle box).
    # cc_incremental: LSH pair gen + full CC over the history split +
    # the incremental fold of the batch split (two iterative fixpoints
    # per run — the oracle-parity shape; production folds ONE batch).
    "cc_incremental_clusters": (4.705, 13),
    # exact-mode span dedup: every-position windows through the digest
    # shuffle (~16x the anchored row count at anchor_bits=4) — the
    # deliberate exact-tier cost; the anchored form is the scale path
    "dup_span_removal_exact": (6.022, 13),
    # streaming LSH gate: index write + tombstone + stage + foreachBatch
    # probe drain + gated read-back (wall dominated by the per-run
    # index build, the amortized-in-production part)
    "stream_lsh_gate": (3.619, 13),
    # dedup-centric crawl-refresh composition (uncapped oracle-parity
    # LSH pairs + full-CC-on-history + incremental fold + EXACT-mode
    # span scrub over survivors — two iterative fixpoints and the
    # every-position window shuffle in one plan; control 0.380)
    "curation_v6": (10.761, 13),
    # doc-level duplication-mass gate (anchored window pipeline +
    # coverage fold, counts-only projection; control 0.361)
    "span_dup_ratio_gate": (2.648, 13),
    # streaming IVF gate: index write + tombstone + stage + foreachBatch
    # probe drain + gated read-back (wall dominated by per-run build,
    # the amortized-in-production part; control 0.381)
    "stream_ivf_gate": (4.32, 13),
    # persisted labels loop: full CC on the first bucket + two locked
    # fold-rewrite-swap cycles (three iterative fixpoints per run — the
    # oracle-parity shape; production folds ONE batch into the
    # artifact; control 0.478, a busier box — conservative seed)
    "cc_labels_artifact": (7.414, 13),
    # one-scan 5-column documents profile, exact distincts (Expand);
    # the eager one-row collect dominates its sub-second wall; cold
    # first run read 2.7x noise at seeding (control 0.324)
    "table_profile": (1.066, 13),
    # --- staged-r14 seeds (standalone min-of-4 at sf0.1; noise control
    # dedup_exact_groups read 0.405 in the same session) ---
    # position-helper expansion: dim index window + bounds agg over the
    # broadcast cross join + candidate BNLJ + cover window
    "genes_near_range": (1.672, 14),
    # locus parse + byte-sliced strand extract off the broadcast genome
    "gentamycin_report": (0.852, 14),
    # capped incremental CC (the production path of the crawl loop;
    # min-of-3, control 0.453 in the same session) — ~uncapped twin's
    # wall at sf0.1 where few buckets exceed the cap
    "cc_incremental_capped": (4.094, 14),
    # fixture-sized pubmed pivot report (min-of-3, control 0.415)
    "s10_pubmed_report": (0.49, 14),
    # trains 120 merges + encode + decode + compare per execution
    # (min-of-5 standalone, control 0.351)
    "bpe_roundtrip": (1.438, 14),
    # one combined groupBy + counts-total broadcast + bounded top-k
    # (min-of-4, control 0.532 in the same session)
    "skew_report_events": (0.648, 14),
    # partition-versioned labels loop (write + 2 folds through the
    # 16-way staged publish + manifest commits; min-of-3, control
    # 0.575 — the flat twin read 7.53 in the same session: the parted
    # layout PAYS overhead at toy scale and wins on write IO only when
    # partitions are GB-sized, see SCALING.md r14 notes)
    "cc_labels_parted": (11.231, 14),
    # --- staged-r15 seeds: min-of-3 from the first full r15 clean
    # bench run (regressions {} / errors {} in the same record, so the
    # in-run numbers ARE steady-state; a collect()-based standalone
    # cross-check read the same stream gate wall and ~2x on the tiny
    # batch shapes purely from the different sink method) ---
    # map-side genome fill over the broadcast byte-encoded dim
    "f2b_range_extract": (0.408, 15),
    # position-helper expansion + window/string_agg aggregation
    "gentamycin_atcc_report": (1.06, 15),
    # same expansion + the JSON-dict explode
    "gentamycin_atcc_consistency": (1.105, 15),
    # build + tombstone + single-batch drain (index leg + intra-batch
    # semantic_dedup) — the stream-gate lifecycle class
    "stream_semdedup_gate": (9.732, 15),
    # --- late-r15 staged seeds, standalone min-of-3 (first run of each
    # is JVM/session warm-up: 14.7s/15.2s discarded by the min) ---
    # three fixture decodes through mapInPandas — cost is Arrow batch
    # setup, not the numpy Huffman+IDCT (µs-scale at 16x24)
    "image_jpeg_features": (2.468, 15),
    # bounds train (d-row shuffle) + assignment + coded probe scan;
    # compare ann_ivf (2.261 @ r3) — the SQ add-on is encode+dequant
    "ann_ivf_sq8": (5.142, 15),
    # full persisted lifecycle (write + append + tombstone + search);
    # warmed min-of-3 on the idle box (6.69/5.54/5.41 — replaces the
    # contended 7.274 first seed taken under the pytest suite)
    "sq8_delete_search": (5.406, 15),
    # three fixture decodes through the audio mapInPandas — same
    # Arrow-setup-bound class as image_jpeg_features
    "audio_wav_features": (1.962, 15),
    # two bm25_topk corpus scans + the bounded eval join; warmed
    # min-of-3 on the idle box
    "bm25_ndcg_eval": (4.15, 15),
    # shard write (applyInPandas tar stream) + binaryFile untar read;
    # warmed min-of-3 on the idle box
    "webdataset_roundtrip": (2.423, 15),
}

# Audit trail for baseline reseeds (round-7 review ask): every reseed
# justified as "box drift" must record the noise-control reading
# (dedup_exact_groups, the cheapest all-rounds query — a pure groupBy
# whose plan has never changed) from the SAME committed measurement
# session, so a later audit can re-derive the drift claim instead of
# trusting the commit message. control = dedup_exact_groups seconds in
# that session; control_seed = its value when the reseeded query was
# originally seeded. A reseed is only legitimate when
# control/control_seed explains most of the query's apparent slowdown.
RESEED_CONTROLS = {
    # r7 reseeds, all from BENCH_LOCAL_r07_clean.json (idle box,
    # min-of-3): control 0.358 vs the r5-era 0.214 seed = 1.67x
    # box-wide drift on interpreted/shuffle-light work
    "pack_sequences": {"round": 7, "control": 0.358, "control_seed": 0.214},
    "j3_interval_binned_bigbig": {"round": 7, "control": 0.358,
                                  "control_seed": 0.214},
    "boilerplate_scrub": {"round": 7, "control": 0.358,
                          "control_seed": 0.214},
    "flagship_windowed_1mbp": {"round": 7, "control": 0.358,
                               "control_seed": 0.214},
    # r13 reseed of vocab_drift_report is a CODE-CHANGE reseed, not box
    # drift: control 0.332 vs its r10-era session control ~0.4 (box at
    # or better than seed time); the wall moved because the operator
    # gained the eager bounded return (r11) and the in-plan counts
    # guard, md5-complete since r13 — see the BASELINE comment
    "vocab_drift_report": {"round": 13, "control": 0.332,
                           "control_seed": 0.4},
    # r13 second-session box-drift reseed: min-of-5 standalone session
    # control 0.382 vs the r12 seed session's 0.225 (1.70x), query
    # 0.549 vs 0.29 (1.89x) — drift explains most of it; residual 1.11
    "priority_sample_mixture": {"round": 13, "control": 0.382,
                                "control_seed": 0.225},
    # r13 dual-cause reseed (code change + drift): min-of-5 standalone
    # control 0.348 vs 0.225 (1.55x), query 1.1 vs 0.529 (2.08x) —
    # drift explains 1.55x, the (h,v) tie-order fix the ~1.3x residual
    "quantile_sketch_estimates": {"round": 13, "control": 0.348,
                                  "control_seed": 0.225},
}


def _regression_report(timings: dict[str, float]) -> dict:
    import statistics

    ratios = {k: t / BASELINE[k][0] for k, t in timings.items() if k in BASELINE}
    missing = sorted(k for k in timings if k not in BASELINE)
    if not ratios:
        return {}
    med = statistics.median(ratios.values())
    regressions = {
        k: {"ratio": round(r, 2), "baseline_round": BASELINE[k][1]}
        for k, r in sorted(ratios.items(), key=lambda kv: -kv[1])
        if r > 1.5 and r > 1.5 * med
    }
    report = {
        "baseline_rounds": sorted({rnd for _, rnd in BASELINE.values()}),
        "median_vs_baseline": round(med, 2),
        "regressions": regressions,
        # every timed query must carry a baseline; non-empty means a new
        # bench query was added without seeding one
        "unbaselined": missing,
    }
    if med > 2.0:
        # per-query regression detection is median-normalized, so a
        # uniform whole-run slowdown (session config change, host) would
        # otherwise be silently absorbed
        report["run_flag"] = (
            f"whole-run median vs baseline is {med:.2f}x (>2.0): either "
            "the host is degraded or a session-wide change slowed every query"
        )
    return report


if __name__ == "__main__":
    main()
