"""Tombstone-delete + compaction for the persisted index family
(operators/tombstones.py; delete_from_/compact_ in dedup.py,
similarity_search.py, retrieval.py).

The contract under test, per family: delete(X) then search ≡ search
over an index rebuilt without X — BEFORE and AFTER compaction,
bit-identical rows; deletes are idempotent; appending a tombstoned id
is refused until compaction; compaction folds small files and clears
the tombstones; BM25 marker stats track the live view exactly.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import dedup as dd
from ncbi_analysis_spark.operators import retrieval as rt
from ncbi_analysis_spark.operators import similarity_search as ss
from ncbi_analysis_spark.operators import tombstones as ts


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


# ---------------------------------------------------------------- BM25

_TEXTS = [
    "zebra data pipeline", "data data data", "data model zebra",
    "data lake merge", "big data stream", "merge stream stream",
    "dup dup alpha", "stream beta gamma", "omega phi zebra",
    "alpha beta data",
]


def _docs(spark):
    return spark.createDataFrame(
        list(enumerate(_TEXTS)), "doc_id long, text string")


def _bm25_search(spark, path):
    q = spark.createDataFrame(
        [(1, "zebra data"), (2, "stream merge")],
        "query_id long, query string")
    return rt.bm25_topk_batch(spark, path, q, k=5)


def _marker(path):
    return json.loads(open(os.path.join(path, rt._BM25_PARAMS_FILE)).read())


def test_bm25_delete_equals_rebuild_and_compaction(spark, tmp_path):
    full = str(tmp_path / "full")
    ref = str(tmp_path / "ref")
    d = _docs(spark)
    rt.write_bm25_index(d, full, n_buckets=4)
    rt.write_bm25_index(d.filter(F.col("doc_id") % 3 != 0), ref, n_buckets=4)

    doomed = d.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    n = rt.delete_from_bm25_index(doomed, full)
    assert n == 4  # doc_ids 0,3,6,9

    want = _rows(_bm25_search(spark, ref), "query_id", "rk")
    assert _rows(_bm25_search(spark, full), "query_id", "rk") == want

    # marker stats track the live view exactly (idf/avgdl/N all moved)
    assert _marker(full)["stats"] == _marker(ref)["stats"]

    # compaction: same rows, tombstones gone, stats intact
    rt.compact_bm25_index(spark, full)
    assert not ts.has_tombstones(spark, full)
    assert _rows(_bm25_search(spark, full), "query_id", "rk") == want
    assert _marker(full)["stats"] == _marker(ref)["stats"]

    # post-compaction the previously-deleted ids are appendable again
    rt.append_to_bm25_index(d.filter(F.col("doc_id") % 3 == 0), full,
                            n_buckets=4)
    fullb = str(tmp_path / "fullb")
    rt.write_bm25_index(d, fullb, n_buckets=4)
    assert (_rows(_bm25_search(spark, full), "query_id", "rk")
            == _rows(_bm25_search(spark, fullb), "query_id", "rk"))


def test_bm25_delete_idempotent_and_absent_ids(spark, tmp_path):
    path = str(tmp_path / "idx")
    d = _docs(spark)
    rt.write_bm25_index(d, path, n_buckets=4)
    ids = spark.createDataFrame([(1,), (999,)], "doc_id long")
    rt.delete_from_bm25_index(ids, path)
    s1 = _marker(path)["stats"]
    r1 = _rows(_bm25_search(spark, path), "query_id", "rk")
    # re-delete: stats and results unchanged (999 never existed; 1 is
    # already tombstoned)
    rt.delete_from_bm25_index(ids, path)
    assert _marker(path)["stats"] == s1
    assert _rows(_bm25_search(spark, path), "query_id", "rk") == r1


def test_bm25_append_tombstoned_id_refused(spark, tmp_path):
    path = str(tmp_path / "idx")
    d = _docs(spark)
    rt.write_bm25_index(d.filter(F.col("doc_id") < 8), path, n_buckets=4)
    rt.delete_from_bm25_index(
        spark.createDataFrame([(2,)], "doc_id long"), path)
    with pytest.raises(ValueError, match="tombstoned"):
        rt.append_to_bm25_index(d.filter(F.col("doc_id") >= 2), path,
                                n_buckets=4)
    # a clean delta still appends, and stats keep tracking
    rt.append_to_bm25_index(d.filter(F.col("doc_id") >= 8), path,
                            n_buckets=4)
    live = rt.read_bm25_index(spark, path)["doclens"]
    got = live.agg(F.count("*").alias("n"),
                   F.sum("dl").alias("s")).collect()[0]
    assert _marker(path)["stats"] == {"n_docs": got["n"],
                                      "sum_dl": int(got["s"])}


def test_bm25_delete_requires_index_dir(spark, tmp_path):
    with pytest.raises(ValueError, match="not a write_bm25_index"):
        rt.delete_from_bm25_index(
            spark.createDataFrame([(1,)], "doc_id long"),
            str(tmp_path / "nope"))


def test_bm25_compaction_folds_small_files(spark, tmp_path):
    path = str(tmp_path / "idx")
    d = _docs(spark)
    rt.write_bm25_index(d.filter(F.col("doc_id") == 0), path, n_buckets=2)
    for i in range(1, 6):
        rt.append_to_bm25_index(d.filter(F.col("doc_id") == i), path,
                                n_buckets=2)
    def n_files(sub):
        return len(glob.glob(os.path.join(path, sub, "**", "*.parquet"),
                             recursive=True))
    before = n_files("postings")
    want = _rows(_bm25_search(spark, path), "query_id", "rk")
    rt.compact_bm25_index(spark, path)
    # one file per bucket
    assert n_files("postings") <= 2 < before
    assert _rows(_bm25_search(spark, path), "query_id", "rk") == want


# ----------------------------------------------------------------- LSH

def _lsh_kw():
    return dict(num_perm=4, bands=2, shingle_n=3)


def _lsh_probe(spark, new, path):
    index = dd.read_lsh_index(spark, path)
    return dd.lsh_index_collisions(new, index, "text", "doc_id",
                                   **_lsh_kw())


def test_lsh_delete_equals_rebuild_and_compaction(spark, tmp_path):
    d = _docs(spark)
    old = d.filter(F.col("doc_id") % 2 == 0)
    new = d.filter(F.col("doc_id") % 2 == 1)
    full = str(tmp_path / "full")
    ref = str(tmp_path / "ref")
    dd.write_lsh_index(old, "text", "doc_id", full, **_lsh_kw())
    dd.write_lsh_index(old.filter(F.col("doc_id") != 2), "text", "doc_id",
                       ref, **_lsh_kw())

    dd.delete_from_lsh_index(
        spark.createDataFrame([(2,)], "id long"), full)
    want = _rows(_lsh_probe(spark, new, ref), "doc_id", "indexed_id")
    got = _rows(_lsh_probe(spark, new, full), "doc_id", "indexed_id")
    assert got == want
    assert all(pair[1] != 2 for pair in got)

    dd.compact_lsh_index(spark, full)
    assert not ts.has_tombstones(spark, full)
    assert _rows(_lsh_probe(spark, new, full),
                 "doc_id", "indexed_id") == want
    # deleted id appendable again post-compaction; index returns to the
    # original full contents
    dd.append_to_lsh_index(old.filter(F.col("doc_id") == 2), "text",
                           "doc_id", full, **_lsh_kw())
    fullb = str(tmp_path / "fullb")
    dd.write_lsh_index(old, "text", "doc_id", fullb, **_lsh_kw())
    assert (_rows(_lsh_probe(spark, new, full), "doc_id", "indexed_id")
            == _rows(_lsh_probe(spark, new, fullb), "doc_id", "indexed_id"))


def test_lsh_append_tombstoned_refused_and_guards(spark, tmp_path):
    d = _docs(spark)
    path = str(tmp_path / "idx")
    dd.write_lsh_index(d, "text", "doc_id", path, **_lsh_kw())
    dd.delete_from_lsh_index(
        spark.createDataFrame([(5,)], "id long"), path)
    with pytest.raises(ValueError, match="tombstoned"):
        dd.append_to_lsh_index(d.filter(F.col("doc_id") >= 5), "text",
                               "doc_id", path, **_lsh_kw())
    with pytest.raises(ValueError, match="not a write_lsh_index"):
        dd.delete_from_lsh_index(
            spark.createDataFrame([(1,)], "id long"),
            str(tmp_path / "nope"))


# ----------------------------------------------------------------- IVF

def _vectors(spark):
    e = spark.range(0, 40).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            F.round(F.sin(F.col("id") * (i + 1) * 0.7), 6)
            for i in range(4)
        ]).cast("array<double>").alias("embedding"),
    )
    return e


def _ivf_search(spark, e, q, cents, path):
    index = ss.read_ivf_index(spark, path)
    out = ss.ivf_topk(e, q, cents, k=5, nprobe=2, assigned=index,
                      prefilter_partitions=True)
    return out.select("q_id", "vec_id", "cos_sim",
                      F.col("rk").cast("long").alias("rk"))


def test_ivf_delete_equals_rebuild_and_compaction(spark, tmp_path):
    e = _vectors(spark)
    cents = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("c_id"), "embedding")
    q = e.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), "embedding")
    doomed = [7, 21, 33]

    full = str(tmp_path / "full")
    ref = str(tmp_path / "ref")
    ss.write_ivf_index(ss.ivf_assign(e, cents), full, centroids=cents)
    kept = e.filter(~F.col("vec_id").isin(doomed))
    ss.write_ivf_index(ss.ivf_assign(kept, cents), ref, centroids=cents)

    ss.delete_from_ivf_index(
        spark.createDataFrame([(i,) for i in doomed], "vec_id long"), full)
    want = _rows(_ivf_search(spark, kept, q, cents, ref), "q_id", "rk")
    got = _rows(_ivf_search(spark, kept, q, cents, full), "q_id", "rk")
    assert got == want
    assert all(r[1] not in doomed for r in got)

    ss.compact_ivf_index(spark, full)
    assert not ts.has_tombstones(spark, full)
    assert _rows(_ivf_search(spark, kept, q, cents, full),
                 "q_id", "rk") == want
    # one file per bucket after compaction
    for bucket in glob.glob(os.path.join(full, "c_id=*")):
        assert len(glob.glob(os.path.join(bucket, "*.parquet"))) == 1
    # deleted ids appendable again post-compaction
    ss.append_to_ivf_index(e.filter(F.col("vec_id").isin(doomed)), cents,
                           full)
    fullb = str(tmp_path / "fullb")
    ss.write_ivf_index(ss.ivf_assign(e, cents), fullb, centroids=cents)
    assert (_rows(_ivf_search(spark, e, q, cents, full), "q_id", "rk")
            == _rows(_ivf_search(spark, e, q, cents, fullb), "q_id", "rk"))


def test_ivf_append_tombstoned_refused_and_guards(spark, tmp_path):
    e = _vectors(spark)
    cents = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("c_id"), "embedding")
    path = str(tmp_path / "idx")
    ss.write_ivf_index(ss.ivf_assign(e, cents), path, centroids=cents)
    ss.delete_from_ivf_index(
        spark.createDataFrame([(9,)], "vec_id long"), path)
    with pytest.raises(ValueError, match="tombstoned"):
        ss.append_to_ivf_index(e.filter(F.col("vec_id") == 9), cents, path)
    with pytest.raises(ValueError, match="marker"):
        ss.delete_from_ivf_index(
            spark.createDataFrame([(1,)], "vec_id long"),
            str(tmp_path / "nope"))


# ------------------------------------------------------------- shared

def test_tombstone_column_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "idx")
    rt.write_bm25_index(_docs(spark), path, n_buckets=2)
    # write a tombstone table under a different column name by hand
    spark.createDataFrame([(1,)], "other long").write.parquet(
        ts.tombstones_path(path))
    with pytest.raises(ValueError, match="different id column"):
        rt.read_bm25_index(spark, path)["postings"].count()


def test_tombstone_broadcast_warn(spark, tmp_path, monkeypatch):
    """warn_if_tombstones_large fires once the accumulated tombstones
    pass the broadcast-comfort bound (threshold shrunk for the test)."""
    import warnings as _w

    path = str(tmp_path / "idx")
    rt.write_bm25_index(_docs(spark), path, n_buckets=2)
    monkeypatch.setattr(ts, "BROADCAST_WARN_ROWS", 2)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        rt.delete_from_bm25_index(
            spark.createDataFrame([(1,), (2,), (3,)], "doc_id long"), path)
    assert any("compact the index" in str(w.message) for w in rec)


def test_lsh_compaction_crash_recovery_at_every_rename(spark, tmp_path,
                                                       monkeypatch):
    """Fault injection across the whole swap: kill compaction at the
    k-th rename for every k (covers crashes in the retire phase, at the
    phase marker boundary, and in the move phase), then re-run
    compaction — resume_pending_swap must leave probes identical to a
    never-crashed compaction, with no leftover swap state."""
    from ncbi_analysis_spark.sources import fsutil

    d = _docs(spark)
    kw = dict(num_perm=4, bands=2, shingle_n=3)
    new = d.filter(F.col("doc_id") % 2 == 1)
    ref = str(tmp_path / "ref")
    dd.write_lsh_index(
        d.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") != 2)),
        "text", "doc_id", ref, **_lsh_kw())
    want = _rows(_lsh_probe(spark, new, ref), "doc_id", "indexed_id")

    real_rename = fsutil.rename
    k = 0
    while True:
        path = str(tmp_path / f"idx_{k}")
        dd.write_lsh_index(d.filter(F.col("doc_id") % 2 == 0), "text",
                           "doc_id", path, **_lsh_kw())
        dd.delete_from_lsh_index(
            spark.createDataFrame([(2,)], "id long"), path)

        calls = {"n": 0}

        def crashing(spark_, src, dst, _k=k):
            if calls["n"] >= _k:
                raise RuntimeError("injected crash")
            calls["n"] += 1
            return real_rename(spark_, src, dst)

        monkeypatch.setattr(fsutil, "rename", crashing)
        try:
            dd.compact_lsh_index(spark, path)
            crashed = False
        except RuntimeError:
            crashed = True
        finally:
            monkeypatch.setattr(fsutil, "rename", real_rename)

        # recovery: the next compaction call must land on the exact
        # same probe results, with clean swap state
        dd.compact_lsh_index(spark, path)
        assert _rows(_lsh_probe(spark, new, path),
                     "doc_id", "indexed_id") == want, k
        children = fsutil.list_children(spark, path)
        assert not any(c.startswith(("_retired_", "_SWAP_MOVING",
                                     "_compact_tmp")) for c in children), k
        assert not ts.has_tombstones(spark, path), k
        if not crashed:
            break  # k exceeded the total rename count — swap completed
        k += 1
    assert k >= 4  # retire(2 bands) + move(2 bands) at minimum
