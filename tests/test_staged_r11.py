"""Staged round-11 driver queries (plans/driver_queries_r11.py), held to
the driver's own bar before registration: DuckDB oracle parity with
sorted-column / sorted-row exact-value comparison at sf0.001 (the
test_staged_r10 pattern, carried forward), plus semantic checks the
hash comparison can't express."""

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


def test_all_staged_r11_queries_duckdb_parity(spark):
    """Every staged round-11 entry must already clear the exact-match
    bar the driver will apply at registration — same comparator as
    scripts/check_oracle.py, no weaker check for staged queries."""
    from ncbi_analysis_spark.plans.driver_queries_r11 import (
        oracle_sql_r11,
        queries_r11,
    )

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    try:
        qs, oracles = queries_r11(), oracle_sql_r11()
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


def test_pca_variance_gate_semantics(spark):
    """k_star must be nondecreasing in the threshold and the captured
    fraction must actually clear it (properties the hash match can't
    see)."""
    from ncbi_analysis_spark.plans.driver_queries_r11 import (
        pca_variance_gate,
    )

    rows = sorted(
        pca_variance_gate(spark, SF_DIR).collect(),
        key=lambda r: r["threshold_ppm"],
    )
    ks = [r["k_star"] for r in rows]
    assert ks == sorted(ks)
    for r in rows:
        assert r["captured_ppm"] >= r["threshold_ppm"] - 1
        assert 1 <= r["k_star"] <= 64


def test_kmv_overlap_estimates_track_exact(spark):
    """Sketch estimates must sit near their exact counterparts on every
    oracled row (binomial noise at k=64 is ~12%; allow 4 sigma)."""
    from ncbi_analysis_spark.plans.driver_queries_r11 import (
        kmv_content_overlap,
    )

    for r in kmv_content_overlap(spark, SF_DIR).collect():
        assert 0 < r["n_union_sketch"] <= 64
        assert abs(r["jaccard_est"] - r["exact_jaccard"]) < 0.5
        if r["n_union_sketch"] < 64:  # unsaturated -> exact by design
            assert r["est_union_distinct"] == r["exact_union"]


def test_ann_pca_rerank_recall_vs_brute(spark):
    """Recall discipline on the NEAR-ISOTROPIC synthetic embeddings
    (top-8/64 axes hold only ~20% of variance — pca_variance_gate's
    own reading — so this is the tier's documented worst case, not its
    habitat): recall clears the measured floor at shortlist=40 and
    must strictly improve as the shortlist grows, reaching 1.0 when
    the shortlist stops truncating (the other test pins that limit)."""
    from ncbi_analysis_spark.operators import embeddings as em
    from ncbi_analysis_spark.operators.similarity_search import (
        reduced_rerank_topk,
    )
    from ncbi_analysis_spark.plans.driver_queries import ann_brute_force
    from ncbi_analysis_spark.plans.driver_queries_r10 import _PCA_PARAMS
    from ncbi_analysis_spark.plans.driver_queries_r11 import (
        ann_pca_rerank,
    )

    got = {(r["q_id"], r["vec_id"])
           for r in ann_pca_rerank(spark, SF_DIR).collect()}
    exact = {(r["q_id"], r["vec_id"])
             for r in ann_brute_force(spark, SF_DIR).collect()}
    r40 = len(got & exact) / len(exact)
    assert r40 >= 0.4, r40  # measured 0.49 on the isotropic table

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 48).select(
        F.col("vec_id").alias("q_id"), "embedding")
    mean, comps, _ = em.pca_fit(e, **_PCA_PARAMS)
    wide = {(r["q_id"], r["vec_id"]) for r in reduced_rerank_topk(
        e, q, mean, comps, k=10, shortlist=200).collect()}
    r200 = len(wide & exact) / len(exact)
    assert r200 > r40


def test_rrf_hybrid_search_semantics(spark):
    """Properties the hash match can't see: every fused doc comes from
    one of the two source lists with the rank that list actually
    assigned it (recomputed independently here), n_lists counts its
    list memberships, and the output ordering/cut is by fused score
    with doc_id tiebreak."""
    from ncbi_analysis_spark.operators.retrieval import bm25_topk
    from ncbi_analysis_spark.plans.driver_queries_r11 import (
        _BM25_QUERY,
        _RRF_LIST_K,
        rrf_hybrid_search,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    bm = bm25_topk(
        d.select("doc_id", "text"), _BM25_QUERY, k=_RRF_LIST_K
    ).collect()
    bm_rk = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(bm, key=lambda r: (-r["score"], r["doc_id"]))
        )
    }
    lp = d.select("doc_id", "n_chars").collect()
    lp_rk = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(lp, key=lambda r: (-r["n_chars"], r["doc_id"]))
        )
        if i < _RRF_LIST_K
    }
    rows = rrf_hybrid_search(spark, SF_DIR).collect()
    for r in rows:
        want_n = (r["doc_id"] in bm_rk) + (r["doc_id"] in lp_rk)
        assert r["n_lists"] == want_n and want_n >= 1
        want = sum(
            1.0 / (60.0 + float(rk))
            for rk in (
                [bm_rk[r["doc_id"]]] if r["doc_id"] in bm_rk else []
            )
            + ([lp_rk[r["doc_id"]]] if r["doc_id"] in lp_rk else [])
        )
        assert r["rrf_score"] == want
    keys = [(-r["rrf_score"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
