"""Physical-plan audit over the whole driver registry.

Builds (does not execute) every ``queries()`` DataFrame at the given sf
dir and scans its formatted physical plan for scale anti-patterns:

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

# query -> set of markers that are expected and justified (comments say why).
EXPECTED: dict[str, set[str]] = {
    # Non-equi range predicates over a broadcast side: BNLJ is the point
    # of the broadcast interval-join mode (small annotation side).
    "j3_interval_overlap": {"BroadcastNestedLoopJoin"},
    "j3b_interval_overlap_broadcast": {"BroadcastNestedLoopJoin"},
    # Bounded-fixture parity queries: a global rank/order over a
    # known-small literal or fixture table (driver-side parity harness,
    # not a scale path — the scale twin is the keyed/binned mode).
    "j7_cover_preference": {"Exchange SinglePartition"},
    "j8_reorder_by_index": {"Exchange SinglePartition"},
    "f13_direction_glyphs": {"Exchange SinglePartition"},
    "f16_promoter_select": {"Exchange SinglePartition"},
    "f17_split_triples": {"Exchange SinglePartition"},
    # Scalar global aggregates (partial agg upstream, one tiny row out)
    # or a final small-result global sort in a fixture/report query.
    "a7_progress_counters": {"Exchange SinglePartition"},
    "s4_cluster_fixture": {"Exchange SinglePartition"},
    "ngram_lm_quality": {"Exchange SinglePartition"},
    "corpus_profile": {"Exchange SinglePartition"},
    "skew_profile": {"Exchange SinglePartition"},
    "dedup_char_windows": {"Exchange SinglePartition"},
    "decon_ngram_overlap": {"Exchange SinglePartition"},
    "stream_click_purchase_join": {"Exchange SinglePartition"},
}


def plan_string(df) -> str:
    jqe = df._jdf.queryExecution()
    try:  # Spark >= 3.4 formatted explain via PythonSQLUtils
        jvm = df.sparkSession._jvm
        return jvm.PythonSQLUtils.explainString(jqe, "formatted")
    except Exception:  # noqa: BLE001 — fall back to the basic plan dump
        return jqe.toString()


def audit(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, set[str]]:
    """Return {query: set(markers found)} for every requested query.
    Queries whose *construction* executes side work (stream_* staging,
    sink round-trips, persisted-index builds) are skipped: their plan is
    the final read, not the pipeline, so a marker scan is meaningless."""
    from ncbi_analysis_spark.plans import driver_queries

    skip_prefixes = ("stream_",)
    skip = {"corpus_shard_roundtrip", "s11_tsv_roundtrip", "s12_fasta_roundtrip",
            "ann_ivf_persisted"}
    qs = driver_queries.queries()
    out: dict[str, set[str]] = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        if name in skip or name.startswith(skip_prefixes):
            continue
        try:
            plan = plan_string(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            print(f"ERR  {name}: {type(exc).__name__}: {str(exc).splitlines()[0][:160]}")
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
    results = audit(spark, sf_dir, names)
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
    print(f"\n{len(results)} audited, {len(unexplained)} with unexplained markers")
    if stale:
        print(f"stale expectations (marker no longer present): {stale}")
    sys.exit(1 if unexplained else 0)


if __name__ == "__main__":
    main()
