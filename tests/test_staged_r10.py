"""Staged round-10 driver queries (plans/driver_queries_r10.py), held to
the driver's own bar before registration: DuckDB oracle parity with
sorted-column / sorted-row exact-value comparison at sf0.001 (the
test_staged_r9 pattern, carried forward)."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "check_oracle.py"),
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)


def test_all_staged_r10_queries_duckdb_parity(spark):
    """Every staged round-10 entry must already clear the exact-match bar
    the driver will apply at registration — same comparator as
    scripts/check_oracle.py, no weaker check for staged queries."""
    from ncbi_analysis_spark.plans.driver_queries_r10 import (
        oracle_sql_r10,
        queries_r10,
    )

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    try:
        qs, oracles = queries_r10(), oracle_sql_r10()
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


def test_normalize_unicode_forms_and_nulls(spark):
    """normalize_unicode_np semantics on handpicked rows: canonical
    composed/decomposed equivalence, accent folding, NFKC compatibility
    folding (ligatures + fullwidth), whitespace collapse with the
    ASCII-only class (NBSP is a word char by contract), and NULL
    propagation."""
    from ncbi_analysis_spark.functions.text import normalize_unicode_np

    rows = [
        (0, "Café latte"),          # decomposed acute
        (1, "Caf\u00e9 latte"),       # precomposed — same canonical str
        (2, "  tabs\tand\nnewlines  "),
        (3, "nbsp stays"),           # NBSP not in the ws class
        (4, None),
        (5, "\ufb01ne \uff46ull"),    # ligature fi + fullwidth f
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        r["doc_id"]: r
        for r in normalize_unicode_np(
            df, strip_marks=True, lower=True, collapse_ws=True
        ).collect()
    }
    # composed and decomposed collapse to the identical folded string
    assert out[0]["text_norm"] == out[1]["text_norm"] == "cafe latte"
    assert out[0]["changed"] == 1 and out[1]["changed"] == 1
    # decomposed form is 1 codepoint longer before normalization
    assert out[0]["n_before"] == out[1]["n_before"] + 1
    assert out[2]["text_norm"] == "tabs and newlines"
    assert out[3]["text_norm"] == "nbsp stays" and out[3]["changed"] == 0
    assert out[4]["text_norm"] is None and out[4]["changed"] is None
    # NFC (default) preserves compatibility characters...
    assert out[5]["text_norm"] == "\ufb01ne \uff46ull"

    # ...NFKC folds them
    nfkc = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_unicode_np(df, form="NFKC", lower=True).collect()
    }
    assert nfkc[5] == "fine full"

    with pytest.raises(ValueError, match="normalization form"):
        normalize_unicode_np(df, form="NFX")


def test_normalize_unicode_plan_is_map_only(spark):
    """The normalizer is one Arrow-batched map pass: no exchange in the
    physical plan (zero-shuffle by construction at any corpus size)."""
    from ncbi_analysis_spark.functions.text import normalize_unicode_np

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = normalize_unicode_np(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_lsh_recall_audit_semantics(spark):
    """lsh_recall_audit on a constructed corpus: exact duplicates (and
    their shingle sets) MUST collide in every band -> recall 1.0 when
    all true pairs are exact dups; disjoint docs produce no candidates
    -> NULL recall/precision when nothing is similar; sample_mod=1
    audits everything."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.dedup import lsh_recall_audit

    words = ["alpha beta gamma delta epsilon zeta eta theta",
             "one two three four five six seven eight nine"]
    rows = [(i, words[0]) for i in range(4)] + [
        (10 + i, f"unique{i} " + " ".join(f"w{i}x{j}" for j in range(8)))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    r = lsh_recall_audit(
        df, "text", "doc_id", threshold=0.9, num_perm=4, bands=2,
        sample_mod=1,
    ).collect()[0]
    # 6 exact-dup pairs among doc_ids 0-3; identical signatures collide
    # in every band, so LSH cannot miss them
    assert r["n_sample"] == 8
    assert r["n_true"] == 6 and r["n_hit"] == 6
    assert r["recall"] == 1.0
    assert r["n_cand"] >= 6 and 0.0 < r["precision"] <= 1.0

    disjoint = spark.createDataFrame(
        [(i, f"only{i}a only{i}b only{i}c only{i}d") for i in range(5)],
        "doc_id long, text string",
    )
    r2 = lsh_recall_audit(disjoint, "text", "doc_id", sample_mod=1).collect()[0]
    assert r2["n_true"] == 0 and r2["n_cand"] == 0
    assert r2["recall"] is None and r2["precision"] is None


def test_cluster_balanced_sample_flattens_density(spark):
    """cluster_balanced_sample on a constructed corpus: a dense clump
    (80 vectors on one axis) and a sparse clump (5 on an orthogonal
    one). With per_cluster=10 the dense cluster is cut to exactly 10,
    the sparse kept whole, and the plan between scan and window is
    join-free (assignment is a pure map)."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.scale import cluster_balanced_sample

    dense = [(i, [1.0 + 0.001 * i, 0.0]) for i in range(80)]
    sparse = [(100 + i, [0.0, 1.0 + 0.001 * i]) for i in range(5)]
    df = spark.createDataFrame(
        dense + sparse, "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "c_id long, embedding array<double>"
    )
    out = cluster_balanced_sample(df, cents, per_cluster=10)
    rows = out.collect()
    by_c = {}
    for r in rows:
        by_c.setdefault(r["c_id"], set()).add(r["vec_id"])
    assert len(by_c[0]) == 10 and by_c[0] <= set(range(80))
    assert by_c[1] == {100, 101, 102, 103, 104}
    assert all(r["rk"] <= 10 for r in rows)

    # determinism: same inputs -> same selection
    again = {(r["vec_id"], r["c_id"], r["rk"])
             for r in cluster_balanced_sample(df, cents, per_cluster=10).collect()}
    assert again == {(r["vec_id"], r["c_id"], r["rk"]) for r in rows}

    # assignment stage is a pure map: no join markers in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin",
                   "CartesianProduct"):
        assert marker not in plan, marker


def test_ann_recall_audit_full_probe_is_exact(spark):
    """ann_recall_audit with nprobe = number of centroids: probing every
    bucket IS the full scan, so recall must be exactly 1.0 for every
    query — the audit's self-consistency anchor. With nprobe=1 on a
    corpus engineered so each query's true top-k straddles two buckets,
    recall must drop strictly below 1."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.similarity_search import (
        ann_recall_audit,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), "embedding")
    cents = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("c_id"), "embedding")

    full = ann_recall_audit(e, q, cents, k=5, nprobe=4).collect()
    assert len(full) == 6
    assert all(r["recall"] == 1.0 and r["n_exact"] == 5 for r in full)

    narrow = ann_recall_audit(e, q, cents, k=5, nprobe=1).collect()
    assert min(r["recall"] for r in narrow) < 1.0
