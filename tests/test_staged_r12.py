"""Staged round-12 driver queries (plans/driver_queries_r12.py), held
to the driver's own bar before registration: DuckDB oracle parity with
the check_oracle comparator at sf0.001 (the test_staged_r10/r11
pattern), plus semantic checks the hash comparison can't express."""

from __future__ import annotations

import importlib.util
import os

import duckdb
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "check_oracle.py"),
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)


def test_all_staged_r12_queries_duckdb_parity(spark):
    """Every staged round-12 entry must already clear the exact-match
    bar the driver will apply at registration — same comparator as
    scripts/check_oracle.py, no weaker check for staged queries."""
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        oracle_sql_r12,
        queries_r12,
    )

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    try:
        qs, oracles = queries_r12(), oracle_sql_r12()
    finally:
        del os.environ["SPARK_GRAFT_ORACLE_SF_DIR"]
    assert set(qs) == set(oracles)
    con = duckdb.connect()
    for t in _co.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    for name, fn in qs.items():
        got = fn(spark, SF_DIR).toPandas()
        want = con.sql(oracles[name]).df()
        issues = _co.compare(name, got, want)
        assert not issues, f"{name}: {issues}"
        assert len(got) > 0, name


def test_bm25_index_batch_semantics(spark):
    """Per-query ranks must be 1-based contiguous, scores
    non-increasing within a query, and the batch's query-1 results
    must bit-match the from-scratch single-query scorer over the same
    corpus (index-vs-corpus equivalence, per query)."""
    from ncbi_analysis_spark.operators.retrieval import bm25_topk
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        _BM25_BATCH,
        _BM25_BATCH_K,
        bm25_index_batch,
    )

    rows = bm25_index_batch(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    queries = dict(_BM25_BATCH)
    for qid, qrows in by_q.items():
        qrows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in qrows] == list(range(1, len(qrows) + 1))
        scores = [r["score"] for r in qrows]
        assert scores == sorted(scores, reverse=True)
        want = [(r["doc_id"], r["n_terms_matched"], r["score"])
                for r in bm25_topk(d, queries[qid], k=_BM25_BATCH_K).collect()]
        got = [(r["doc_id"], r["n_terms_matched"], r["score"])
               for r in qrows]
        assert got == want, qid


def test_quantile_sketch_estimates_semantics(spark):
    """Estimates must be nondecreasing in q and drawn from the actual
    value domain; q=1.0 must be the sample maximum."""
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        quantile_sketch_estimates,
    )

    rows = sorted(quantile_sketch_estimates(spark, SF_DIR).collect(),
                  key=lambda r: r["q_ppm"])
    vals = [r["est_v"] for r in rows]
    assert vals == sorted(vals)
    domain = {r["n_chars"] for r in spark.read.parquet(
        f"{SF_DIR}/documents.parquet").select("n_chars").collect()}
    assert all(v in domain for v in vals)


def test_quantile_sketch_gate_semantics(spark):
    """The sketch-derived gate must keep a nonempty strict subset and
    every survivor must clear the threshold (checked via the corpus)."""
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        quantile_sketch_gate,
    )

    rows = quantile_sketch_gate(spark, SF_DIR).collect()
    assert rows
    thr = {r["threshold"] for r in rows}
    assert len(thr) == 1
    thr = thr.pop()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_total = d.count()
    n_kept = sum(r["n_kept"] for r in rows)
    n_expected = d.filter(F.col("n_chars") >= thr).count()
    assert 0 < n_kept < n_total and n_kept == n_expected


def test_heavy_hitters_report_semantics(spark):
    """Counts non-increasing, every count positive, and the guaranteed
    rows really clear the Misra-Gries bound."""
    from ncbi_analysis_spark.functions.text import tokens
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        _HH_M,
        heavy_hitters_report,
    )

    rows = heavy_hitters_report(spark, SF_DIR).collect()
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True) and all(c > 0 for c in cnts)
    total = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select(F.explode(tokens(F.col("text"))).alias("g"))
        .count()
    )
    for r in rows:
        assert r["guaranteed"] == (r["cnt"] * (_HH_M + 1) > total)


def test_cm_heavy_estimates_semantics(spark):
    """Count-Min one-sidedness on the staged query itself: every
    estimate >= the exact count (merge cannot undercount)."""
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        cm_heavy_estimates,
    )

    rows = cm_heavy_estimates(spark, SF_DIR).collect()
    assert rows
    assert all(r["est_cnt"] >= r["exact_cnt"] > 0 for r in rows)


def test_priority_sample_mixture_semantics(spark):
    """tau constant and positive (the corpus saturates k), est_weight
    = max(weight, tau) row-wise, and membership is layout-independent
    (repartitioned corpus -> identical sample)."""
    from ncbi_analysis_spark.operators.scale import priority_sample
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        _PS_K,
        priority_sample_mixture,
    )

    rows = priority_sample_mixture(spark, SF_DIR).collect()
    assert len(rows) == _PS_K
    taus = {r["tau"] for r in rows}
    assert len(taus) == 1 and taus.pop() > 0
    assert all(r["est_weight"] == max(float(r["weight"]), r["tau"])
               for r in rows)
    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0))
        .select("doc_id", "n_chars")
        .repartition(13)
    )
    again = priority_sample(d, "n_chars", _PS_K, "doc_id").collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in rows}


def test_dsir_priority_mixture_semantics(spark):
    """Weights are the shifted-exp of logw: bounded in (0, 1] with the
    1e-6 floor, 6dp-stable, monotone in logw; est_weight = max(w, tau)
    with one positive tau."""
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        _DSIR_PS_K,
        dsir_priority_mixture,
    )

    rows = dsir_priority_mixture(spark, SF_DIR).collect()
    assert len(rows) == _DSIR_PS_K
    assert max(r["w"] for r in rows) <= 1.0
    assert all(1e-6 <= r["w"] == round(r["w"], 6) for r in rows)
    assert all(r["est_weight"] == max(r["w"], r["tau"]) for r in rows)
    taus = {r["tau"] for r in rows}
    assert len(taus) == 1 and taus.pop() > 0
    # w monotone in logw on the sampled rows (above the floor)
    above = sorted((r["logw"], r["w"]) for r in rows if r["w"] > 1e-6)
    ws = [w for _, w in above]
    assert ws == sorted(ws)


def test_priority_sample_per_lang_semantics(spark):
    """k per saturated group, one tau per group, tau > 0 where the
    group saturates, est_weight = max(weight, tau) row-wise."""
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        _PSG_K,
        priority_sample_per_lang,
    )

    rows = priority_sample_per_lang(spark, SF_DIR).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        assert len(rs) <= _PSG_K
        taus = {r["tau"] for r in rs}
        assert len(taus) == 1
        if len(rs) == _PSG_K:
            assert all(r["tau"] > 0 for r in rs)
        assert all(r["est_weight"] == max(float(r["weight"]), r["tau"])
                   for r in rs)


def test_quantile_sketch_per_lang_semantics(spark):
    """Each language reports p50 <= p90 and every estimate is a real
    n_chars value of that language."""
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        quantile_sketch_per_lang,
    )

    rows = quantile_sketch_per_lang(spark, SF_DIR).collect()
    langs = {r["lang"] for r in rows}
    assert len(langs) >= 2
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["q_ppm"]] = r["est_v"]
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for lang, qs in by_lang.items():
        assert qs[500_000] <= qs[900_000]
        domain = {r["n_chars"] for r in
                  d.filter(F.col("lang") == lang).collect()}
        assert qs[500_000] in domain and qs[900_000] in domain


def test_drift_top_tokens_semantics(spark):
    """Drift non-increasing, shares consistent with counts, and the
    en/non-en split's top offenders must include language-specific
    tokens (drift > 0 everywhere in the top-20)."""
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        drift_top_tokens,
    )

    rows = drift_top_tokens(spark, SF_DIR).collect()
    ds = [r["drift"] for r in rows]
    assert ds == sorted(ds, reverse=True) and all(d > 0 for d in ds)
    for r in rows:
        assert r["drift"] == abs(r["p_a"] - r["p_b"])
        assert (r["n_a"] > 0) or (r["n_b"] > 0)


def test_kmv_crawl_diff_semantics(spark):
    """Partition identity (only_a + only_b + both == sketch size),
    exact columns consistent (snapshots overlap so exact_inter > 0),
    and unsaturated languages report EXACT estimates."""
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        _KMV_DIFF_K,
        kmv_crawl_diff,
    )

    rows = kmv_crawl_diff(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert (r["n_only_a"] + r["n_only_b"] + r["n_both"]
                == r["n_union_sketch"])
        assert r["exact_inter"] >= 0
        if r["n_union_sketch"] < _KMV_DIFF_K:  # unsaturated -> exact
            assert r["n_only_a"] == r["exact_only_a"]
            assert r["n_only_b"] == r["exact_only_b"]
            assert r["n_both"] == r["exact_inter"]
            assert r["est_union"] == float(r["n_union_sketch"])
