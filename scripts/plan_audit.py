"""Physical-plan audit over the whole driver registry.

Builds every ``queries()`` DataFrame at the given sf dir and scans its
formatted physical plan for scale anti-patterns (construction is lazy —
no execution — for all but the documented eager-bounded-return skip set
below, which are excluded precisely because building them runs the job
and returns a LocalTableScan with nothing to audit):

- ``CartesianProduct``                — O(n*m) row pairing
- ``BroadcastNestedLoopJoin``        — per-row scan of the broadcast side
- ``Exchange SinglePartition``       — the whole dataset through one task

Each marker is either a genuine scale bug or a *deliberate, documented*
choice (e.g. non-equi broadcast interval joins ARE BroadcastNestedLoop;
a scalar global aggregate IS a single partition; driver-parity queries
that rank a bounded fixture globally). The committed expectation table
below pins every known-and-justified occurrence; the audit fails on NEW
unexplained markers, so a future operator that silently introduces a
cartesian or a single-partition funnel trips tests/test_plan_audit.py.

Usage: python scripts/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKERS = ("CartesianProduct", "BroadcastNestedLoopJoin", "Exchange SinglePartition")

# query -> set of markers that are expected and justified (comments say
# why). Audited empirically at sf0.01: the registry shows ZERO
# CartesianProduct and ZERO static single-partition exchanges; every
# BroadcastNestedLoopJoin below is a deliberate broadcast-small-side
# cross join, which plans as BNLJ by definition (no equi-keys).
#
# Note on Exchange SinglePartition: under AQE the static formatted plan
# rarely materializes one (partition counts are decided at runtime), so
# this audit only catches statically-planned funnels. The runtime
# complement is tests/test_plans.py::
# test_flagship_scorer_input_actually_spreads, which guards the one
# place a runtime byte-coalesce funnel was actually observed (and
# fixed): CPU-dense Arrow stages need an explicit numeric repartition.
EXPECTED: dict[str, set[str]] = {
    # Flagship scans: query genes broadcast against every genome chunk
    # (the intended shape — queries are small by problem construction).
    "flagship_similarity_scan": {"BroadcastNestedLoopJoin"},
    "flagship_windowed_scan": {"BroadcastNestedLoopJoin"},
    "w4_ascending_scan": {"BroadcastNestedLoopJoin"},
    # ANN: the bounded query set broadcast against every vector batch.
    "ann_brute_force": {"BroadcastNestedLoopJoin"},
    "ann_ivf": {"BroadcastNestedLoopJoin"},
    "ann_ivf_pq": {"BroadcastNestedLoopJoin"},
    "ann_ivf_trained": {"BroadcastNestedLoopJoin"},
    # Hyperplane-LSH bucketing: the tiny random-plane matrix broadcast
    # against the corpus.
    "dedup_embedding_pairs": {"BroadcastNestedLoopJoin"},
    # Broadcast of a scalar/model small side (LM total, corpus doc
    # count) — one-row cross joins.
    "ngram_lm_quality": {"BroadcastNestedLoopJoin"},
    "tfidf_terms": {"BroadcastNestedLoopJoin"},
    # Quantile gate: the SINGLE-ROW threshold broadcast-cross-joined
    # into the corpus filter (the per-group form joins on the group key
    # and plans as a hash join — no marker).
    "quality_quantile_gate": {"BroadcastNestedLoopJoin"},
    # Filtered-ANN retrieval: the bounded query set cross-joined against
    # the centroid table to build probes — ann_ivf's shape.
    "rag_retrieval": {"BroadcastNestedLoopJoin"},
    # Contamination audit: three ONE-ROW scalar aggregates (two method
    # counts + the corpus denominator) cross-joined — the
    # ngram_lm_quality scalar-small-side class.
    "contamination_report": {"BroadcastNestedLoopJoin"},
    # --- staged r9 (audited pre-registration) ---
    # Probe construction: bounded query set x centroid table —
    # ann_ivf's shape (the search over the appended index).
    "ann_index_append": {"BroadcastNestedLoopJoin"},
    # --- staged r13 (audited pre-registration) ---
    # Same probe-construction cross join over the tombstone-compacted
    # index (ann_ivf's shape; the delete machinery is all equi-joins).
    "ivf_delete_search": {"BroadcastNestedLoopJoin"},
    # Scalar-small-side report join: the one-row sample count
    # cross-joined onto the one-row coverage aggregate (the
    # lsh_recall_audit / contamination_report class).
    "span_recall_planted": {"BroadcastNestedLoopJoin"},
    # The flagship's pinned shape (queries x chunks scoring cross join —
    # flagship_similarity_scan's expectation), now over 3 accessions.
    "flagship_multi_accession": {"BroadcastNestedLoopJoin"},
    # Bounded PARITY mode by design (locate_matches(bounded=True) on the
    # committed reference fixture): non-equi broadcast candidate join
    # (BNLJ); the global rank over the ~7-row annotation table plans
    # without a static SinglePartition under AQE. The scale path is the
    # keyed unbounded mode.
    "location_report_fixture": {"BroadcastNestedLoopJoin"},
    # Same workload as quality_quantile_gate: one-row threshold
    # broadcast cross join; the HLL probe runs as a separate bounded
    # job at construction time.
    "quantile_gate_autodegrade": {"BroadcastNestedLoopJoin"},
    # --- staged r10 (audited pre-registration) ---
    # Final stage is the quantile gate: one-row threshold broadcast
    # cross join (quality_quantile_gate's pinned shape). Every other
    # stage (domain aggregate, band-digest decon, map-only repetition
    # gate) plans marker-free.
    "curation_v4": {"BroadcastNestedLoopJoin"},
    # Final report row: two ONE-ROW scalar aggregates (sample count,
    # confusion counts) cross-joined — the contamination_report class.
    # Both measurement legs underneath are the standing bucketed
    # operators on the bounded hash-sample.
    "lsh_recall_audit": {"BroadcastNestedLoopJoin"},
    # The exact leg IS ann_brute_force (bounded query batch broadcast
    # against every vector — its pinned shape); the IVF leg adds the
    # probe-construction cross join (ann_ivf's pinned shape).
    "ann_recall_audit": {"BroadcastNestedLoopJoin"},
    # --- staged r11 (audited pre-registration) ---
    # (vocab_drift_report: the r11 rework collects the bounded k-row
    # report and rebuilds it via createDataFrame — the returned plan is
    # a LocalTableScan with no markers, so no expectation entry; the
    # corpus-sized legs execute during construction and are audited by
    # their own operator tests.)
    # The reduced-space shortlist IS brute_force_topk's pinned shape
    # (bounded query batch broadcast against the corpus); the exact
    # re-rank joins are keyed.
    "ann_pca_rerank": {"BroadcastNestedLoopJoin"},
    # --- staged r12 (audited pre-registration) ---
    # One-row sketch-derived threshold broadcast cross-joined into the
    # corpus filter — quality_quantile_gate's pinned shape (the
    # threshold now comes from a published sketch, not a corpus pass).
    "quantile_sketch_gate": {"BroadcastNestedLoopJoin"},
    # One-row tau (the (k+1)-th priority) broadcast cross-joined into
    # the bounded k-row sample — the same scalar-small-side class; the
    # corpus already reduced via TakeOrderedAndProject upstream.
    "priority_sample_mixture": {"BroadcastNestedLoopJoin"},
    # (dsir_priority_mixture: eager bounded return — the DSIR scoring
    # is persisted, sampled, collected (64 rows) and rebuilt, so the
    # returned plan is a LocalTableScan; in the skip set below, the
    # vocab_drift_report/bpe_vocab class. The tau cross join inside is
    # priority_sample_mixture's pinned shape. The grouped per-lang
    # form joins tau on the group key — keyed hash join, no marker.)
    # --- staged r14 (audited pre-registration) ---
    # Position-helper expansion: the 25-row annotation dim broadcast
    # twice (bounds agg cross join + non-equi candidate join) — BNLJ by
    # definition. (The dim's row_number index is a deliberate
    # single-partition window over a bounded annotation table —
    # documented in operators/genes.py::nearby_genes_by_range — but
    # under AQE it never appears in the STATIC plan this audit scans,
    # per the module-note on Exchange SinglePartition.)
    "genes_near_range": {"BroadcastNestedLoopJoin"},
    # One-row counts-total broadcast cross-joined onto the bounded
    # key-count table — the quality_quantile_gate scalar-small-side
    # class (key_skew_report's share_ppm denominator).
    "skew_report_events": {"BroadcastNestedLoopJoin"},
    # --- staged r15 (audited pre-registration) ---
    # Both ATCC gentamycin rows run the position-helper expansion on
    # their DR subset — genes_near_range's pinned shape (bounded
    # annotation dim broadcast into the bounds cross join + non-equi
    # candidate join); the report's re-join onto the gene list is a
    # keyed broadcast hash join, no marker.
    "gentamycin_atcc_report": {"BroadcastNestedLoopJoin"},
    "gentamycin_atcc_consistency": {"BroadcastNestedLoopJoin"},
    # SQ8 search builds probes via the same queries x broadcast-centroid
    # cross join as ann_ivf; index join / rerank joins are keyed.
    "ann_ivf_sq8": {"BroadcastNestedLoopJoin"},
}


def plan_string(df) -> str:
    jqe = df._jdf.queryExecution()
    try:  # Spark >= 3.4 formatted explain via PythonSQLUtils
        jvm = df.sparkSession._jvm
        return jvm.PythonSQLUtils.explainString(jqe, "formatted")
    except Exception:  # noqa: BLE001 — fall back to the basic plan dump
        return jqe.toString()


def audit(
    spark, sf_dir: str, names: list[str] | None = None,
    errors: dict[str, str] | None = None,
) -> dict[str, set[str]]:
    """Return {query: set(markers found)} for every requested query.
    Construction failures are recorded in ``errors`` (if given) so
    callers can FAIL on them — a query that errors out of the audit must
    not silently escape the marker/staleness gates. Queries whose
    *construction* executes side work (stream_* staging, sink
    round-trips, persisted-index builds) are skipped: their plan is the
    final read, not the pipeline, so a marker scan is meaningless."""
    from ncbi_analysis_spark.plans import driver_queries, registry

    skip_prefixes = ("stream_",)
    skip = {"corpus_shard_roundtrip", "s11_tsv_roundtrip", "s12_fasta_roundtrip",
            "ann_ivf_persisted",
            # sq8_delete_search's construction runs the full persisted
            # lifecycle (write/append/delete); its plan is the final
            # probe read — ann_ivf_persisted's class
            "sq8_delete_search",
            # lsh_incremental_decon's construction writes+appends the
            # persisted band index; its final plan is the probe read
            "lsh_incremental_decon",
            # bpe_vocab's construction runs the histogram+merge train;
            # its returned frame is the literal merge table — nothing
            # to scan
            "bpe_vocab",
            # vocab_drift_report's r11 construction executes the full
            # drift pipeline (collects the bounded k-row report, then
            # createDataFrame) — the returned plan is a LocalTableScan,
            # nothing to scan (same class as bpe_vocab)
            "vocab_drift_report",
            # dsir_priority_mixture: same eager-bounded-return class
            # (persisted DSIR scoring, 64-row sample collected and
            # rebuilt)
            "dsir_priority_mixture",
            # bm25_search / bm25_index_batch: bm25_topk's r12 eager
            # bounded return (top-k rows collected to release the
            # postings caches, then rebuilt) means the returned plan is
            # a LocalTableScan — the real pipeline's marker scans are
            # not visible, and construction executes the job (same
            # class as vocab_drift_report). rrf_hybrid_search keeps a
            # live plan (its fusion join is lazy), so it stays audited.
            "bm25_search", "bm25_index_batch",
            # bm25_ndcg_eval runs two bm25_topk jobs at construction
            # (eager bounded return, the bm25_search class); the final
            # plan is the eval join over two ten-row local tables
            "bm25_ndcg_eval",
            # webdataset_roundtrip's construction writes+reads the tar
            # shards (sink lifecycle; the s11/s12 roundtrip class)
            "webdataset_roundtrip",
            # r13 staged: same eager-bounded-return class (index
            # write+delete+compact executed during construction)
            "bm25_delete_search", "bm25_compacted_search",
            # construction writes+deletes+compacts the band index; the
            # final plan is the probe read (lsh_incremental_decon class)
            "lsh_delete_probe",
            # bpe_encode_ids trains the merge table during construction
            # (the bpe_vocab class); the returned plan is the encode
            # projection, worth nothing to a marker scan
            "bpe_encode_ids",
            # curation_v5's construction writes the LSH index, publishes
            # the quantile sketch, and trains the BPE table (the
            # lsh_incremental_decon + bpe_vocab classes combined)
            "curation_v5",
            # second-session r13: constructions that EXECUTE the
            # iterative CC fixpoints (eager localCheckpoints per round)
            # — the returned plan is checkpoint scans + the final
            # joins, so a marker scan audits the wrong thing; and
            # cc_labels_artifact additionally writes/swaps the staged
            # artifact and returns a LocalTableScan (the
            # lsh_delete_probe class)
            "cc_incremental_clusters", "curation_v6",
            "cc_labels_artifact",
            # staged r14: the capped twin executes the same iterative
            # CC fixpoint at construction
            "cc_incremental_capped",
            # staged r14: trains the merge table at construction (the
            # bpe_vocab / bpe_encode_ids class)
            "bpe_roundtrip",
            # staged r14: executes the partitioned write+folds at
            # construction (the cc_labels_artifact class)
            "cc_labels_parted",
            # table_profile collects its one aggregate row during
            # construction (the bounded-model convention) and returns a
            # LocalTableScan
            "table_profile"}
    # staged next-round entries are audited BEFORE registration, so a
    # plan anti-pattern is caught while the query is still staged
    qs = {**driver_queries.queries(), **registry.staged_queries()}
    out: dict[str, set[str]] = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        if name in skip or name.startswith(skip_prefixes):
            continue
        try:
            plan = plan_string(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            msg = f"{type(exc).__name__}: {str(exc).splitlines()[0][:160]}"
            print(f"ERR  {name}: {msg}")
            if errors is not None:
                errors[name] = msg
            continue
        found = {m for m in MARKERS if m in plan}
        out[name] = found
    return out


def main() -> None:
    from ncbi_analysis_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    errors: dict[str, str] = {}
    results = audit(spark, sf_dir, names, errors=errors)
    unexplained: dict[str, set[str]] = {}
    for name in sorted(results):
        found = results[name]
        allowed = EXPECTED.get(name, set())
        extra = found - allowed
        status = "OK  " if not extra else "FLAG"
        detail = ",".join(sorted(found)) or "-"
        print(f"{status} {name}: {detail}")
        if extra:
            unexplained[name] = extra
    stale = {
        n: allowed - results[n]
        for n, allowed in EXPECTED.items()
        if n in results and allowed - results[n]
    }
    print(f"\n{len(results)} audited, {len(unexplained)} with unexplained markers, "
          f"{len(errors)} construction errors")
    if stale:
        print(f"stale expectations (marker no longer present): {stale}")
    sys.exit(1 if (unexplained or errors) else 0)


if __name__ == "__main__":
    main()
