"""verify_*_index fsck tests: a healthy index passes every check; each
seeded corruption (out-of-range partitions, orphan postings, marker
stat drift, quantizer drift, swap residue, stale locks, foreign
tombstone schemas) is detected by exactly the check that owns it.
All verifiers are read-only — the corrupted fixtures must look the
same after the audit."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import tombstones as ts
from ncbi_analysis_spark.sources import fsutil


def _by_check(report: list[dict]) -> dict[str, dict]:
    return {r["check"]: r for r in report}


def _docs(spark):
    return spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "zeta eta theta iota kappa"),
         (3, "lambda mu nu xi omicron pi")],
        "doc_id long, text string")


def test_verify_lsh_index(spark, tmp_path):
    from ncbi_analysis_spark.operators.dedup import (
        delete_from_lsh_index, verify_lsh_index, write_lsh_index)

    idx = str(tmp_path / "lsh")
    write_lsh_index(_docs(spark), "text", "doc_id", idx,
                    num_perm=4, bands=2, shingle_n=3)
    delete_from_lsh_index(spark.createDataFrame([(3,)], "id long"), idx)
    assert all(r["ok"] for r in verify_lsh_index(spark, idx))

    # out-of-range band smuggled in behind the append guard
    spark.createDataFrame([(9, "deadbeef", 99)],
                          "id long, band_hash string, band int") \
        .write.mode("append").partitionBy("band").parquet(idx)
    rep = _by_check(verify_lsh_index(spark, idx))
    assert not rep["band_range"]["ok"]
    assert rep["schema"]["ok"]

    # stale lock + swap residue
    fsutil.write_text(spark, f"{idx}/{ts.LOCK_FILE}", json.dumps(
        {"owner": "x", "what": "compact", "acquired_unix": 1.0,
         "ttl_s": 1}))
    fsutil.write_text(spark, f"{idx}/_retired_band=0/marker", "")
    rep = _by_check(verify_lsh_index(spark, idx))
    assert not rep["no_stale_lock"]["ok"]
    assert not rep["no_pending_swap"]["ok"]
    # the retired dir's '=' collides with the live partition column, so
    # the root is LOUDLY unreadable until recovery — fsck must report
    # that, not crash on it
    assert not rep["readable"]["ok"]
    fsutil.delete(spark, f"{idx}/_retired_band=0")

    # live lock reports ok=True (held, not stale)
    fsutil.delete(spark, f"{idx}/{ts.LOCK_FILE}")
    with ts.maintenance_lock(spark, idx, "live_op"):
        rep = _by_check(verify_lsh_index(spark, idx))
        assert rep["no_stale_lock"]["ok"]
        assert "live" in rep["no_stale_lock"]["detail"]


def test_verify_lsh_index_foreign_tombstones(spark, tmp_path):
    from ncbi_analysis_spark.operators.dedup import (
        verify_lsh_index, write_lsh_index)

    idx = str(tmp_path / "lsh")
    write_lsh_index(_docs(spark), "text", "doc_id", idx,
                    num_perm=4, bands=2, shingle_n=3)
    spark.createDataFrame([(1,)], "wrong_col long").write.parquet(
        f"{idx}/{ts.TOMBSTONES_DIR}")
    rep = _by_check(verify_lsh_index(spark, idx))
    assert not rep["tombstones_schema"]["ok"]


def test_verify_ivf_index(spark, tmp_path):
    from ncbi_analysis_spark.operators.similarity_search import (
        ivf_assign, verify_ivf_index, write_ivf_index)

    vecs = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(12)],
        "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 1.0]), (2, [2.0, 1.0])],
        "c_id long, embedding array<double>")
    idx = str(tmp_path / "ivf")
    write_ivf_index(ivf_assign(vecs, cents), idx, centroids=cents)
    assert all(r["ok"] for r in verify_ivf_index(spark, idx, cents))

    # drifted quantizer: digest mismatch AND stored buckets it lacks
    drifted = spark.createDataFrame(
        [(0, [0.5, 1.0]), (5, [9.0, 9.0])],
        "c_id long, embedding array<double>")
    rep = _by_check(verify_ivf_index(spark, idx, drifted))
    assert not rep["centroid_digest"]["ok"]
    assert not rep["buckets_known"]["ok"]
    # without centroids those checks are skipped; the rest still pass
    rep = _by_check(verify_ivf_index(spark, idx))
    assert "centroid_digest" not in rep
    assert all(r["ok"] for r in rep.values())


def test_verify_bm25_index(spark, tmp_path):
    from ncbi_analysis_spark.operators.retrieval import (
        _BM25_PARAMS_FILE, verify_bm25_index, write_bm25_index)

    idx = str(tmp_path / "bm25")
    write_bm25_index(_docs(spark), idx, n_buckets=8)
    assert all(r["ok"] for r in verify_bm25_index(spark, idx))

    # orphan posting: a doc_id with no doclens row
    spark.createDataFrame([("ghost", 999, 1, 3)],
                          "g string, doc_id long, tf long, bucket int") \
        .select("g", "doc_id", "tf", "bucket") \
        .write.mode("append").partitionBy("bucket") \
        .parquet(f"{idx}/postings")
    rep = _by_check(verify_bm25_index(spark, idx))
    assert not rep["postings_have_doclens"]["ok"]
    assert rep["marker_stats"]["ok"]  # doclens untouched

    # marker stats drifted (crashed append/delete simulation)
    marker = json.loads(fsutil.read_text(spark, f"{idx}/{_BM25_PARAMS_FILE}"))
    marker["stats"]["n_docs"] += 7
    fsutil.write_text(spark, f"{idx}/{_BM25_PARAMS_FILE}",
                      json.dumps(marker))
    rep = _by_check(verify_bm25_index(spark, idx))
    assert not rep["marker_stats"]["ok"]

    # swap residue inside the SUBDIR (where BM25 swaps actually run)
    fsutil.write_text(spark, f"{idx}/doclens/_compact_tmp/x", "")
    rep = _by_check(verify_bm25_index(spark, idx))
    assert not rep["no_pending_swap"]["ok"]
    assert "doclens" in rep["no_pending_swap"]["detail"]


def test_verify_cc_labels_healthy_and_corruptions(spark, tmp_path):
    """CC labels fsck: healthy artifact passes every check; seeded
    corruptions (retire residue, orphan component label, nulls, no
    committed version) are each caught by the owning check; a
    non-artifact dir raises."""
    import pytest as _pytest

    from ncbi_analysis_spark.operators.components import (
        fold_into_cc_labels, verify_cc_labels, write_cc_labels)
    from ncbi_analysis_spark.sources import fsutil

    df = lambda es: spark.createDataFrame(es, ["id_a", "id_b"])  # noqa: E731
    path = str(tmp_path / "labels")
    write_cc_labels(df([(1, 2), (4, 5)]), path)
    fold_into_cc_labels(df([(2, 3)]), path)

    def by_check(res):
        return {r["check"]: r["ok"] for r in res}

    ok = by_check(verify_cc_labels(spark, path))
    assert all(ok.values()), ok
    for leg in ("params_marker", "committed_version", "retire_residue",
                "schema", "no_nulls", "labels_are_members"):
        assert leg in ok

    # retire residue: plant a committed version older than the grace
    spark.createDataFrame([(9, 9)], "id long, component long") \
        .write.parquet(f"{path}/v99")
    fold_into_cc_labels(df([(5, 6)]), path)   # current jumps past 99+1?
    # (v99 became current after the plant; the fold published v100 and
    # retired <99 — so plant residue BELOW current instead)
    spark.createDataFrame([(9, 9)], "id long, component long") \
        .write.parquet(f"{path}/v1")
    res = by_check(verify_cc_labels(spark, path))
    assert res["retire_residue"] is False

    # orphan component label in the current version
    p2 = str(tmp_path / "labels2")
    write_cc_labels(df([(1, 2)]), p2)
    spark.createDataFrame([(7, 42)], "id long, component long") \
        .write.mode("append").parquet(f"{p2}/v0")
    res = by_check(verify_cc_labels(spark, p2))
    assert res["labels_are_members"] is False

    # no committed version at all
    p3 = str(tmp_path / "labels3")
    fsutil.write_text(spark, f"{p3}/_cc_params.json",
                      '{"kind": "cc_labels"}')
    res = by_check(verify_cc_labels(spark, p3))
    assert res["committed_version"] is False

    with _pytest.raises(ValueError, match="not a write_cc_labels"):
        verify_cc_labels(spark, str(tmp_path / "nope"))


def test_verify_sq8_index_healthy_and_corruptions(spark, tmp_path):
    """Healthy coded index passes every leg; seeded corruptions —
    out-of-range codes, a hand-swapped bounds table, a missing bounds
    dir — are each caught by the owning check (read-only audit)."""
    import random

    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators import similarity_search as ss

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("c_id"), "embedding")
    bounds = ss.train_sq_bounds(e)
    path = str(tmp_path / "sq8")
    ss.write_sq8_index(ss.ivf_assign(e, cents), bounds, path,
                       centroids=cents)

    checks = {c["check"]: c["ok"]
              for c in ss.verify_sq8_index(spark, path, centroids=cents)}
    assert checks["readable"] and checks["code_column"]
    assert checks["codes_in_range"] and checks["bounds_digest"]
    assert checks["bounds_ordered"] and checks["centroid_digest"]
    assert checks["buckets_known"]

    # corruption 1: out-of-range codes appended behind the guard's back
    spark.createDataFrame(
        [(999, 1, [300] * 8)], "vec_id long, c_id long, sq_code array<int>"
    ).write.mode("append").partitionBy("c_id").parquet(path)
    checks = {c["check"]: c["ok"] for c in ss.verify_sq8_index(spark, path)}
    assert not checks["codes_in_range"]

    # corruption 2: hand-swapped bounds table -> digest leg fails
    bounds.withColumn("hi", F.col("hi") * 2).coalesce(1).write.mode(
        "overwrite").parquet(path + "/_sq_bounds")
    checks = {c["check"]: c["ok"] for c in ss.verify_sq8_index(spark, path)}
    assert not checks["bounds_digest"]

    # corruption 3: bounds dir gone entirely
    import shutil

    shutil.rmtree(path + "/_sq_bounds")
    checks = {c["check"]: c["ok"] for c in ss.verify_sq8_index(spark, path)}
    assert not checks["bounds_digest"]
