"""Scheme-agnostic marker I/O (sources/fsutil.py) and the index
parameter guards that ride on it.

The guards used to use driver-local ``open``/``os.makedirs``, which on
an object-store index directory write to the WRONG filesystem. These
tests drive every path through an explicit ``file:`` scheme URI —
local ``open("file:/tmp/...")`` fails outright, so a regression back to
local-FS calls cannot pass them.
"""

import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.sources import fsutil


def test_fsutil_roundtrip_scheme_uri(spark, tmp_path):
    uri = f"file:{tmp_path}/deep/nested/marker.json"
    assert not fsutil.exists(spark, uri)
    fsutil.write_text(spark, uri, '{"a": 1}')
    assert fsutil.exists(spark, uri)
    assert fsutil.read_text(spark, uri) == '{"a": 1}'
    # overwrite, including shrink (a partial-overwrite bug would leave a tail)
    fsutil.write_text(spark, uri, "x")
    assert fsutil.read_text(spark, uri) == "x"
    # unicode payload survives the byte boundary
    fsutil.write_text(spark, uri, "café —  ")
    assert fsutil.read_text(spark, uri) == "café —  "


def test_lsh_params_guard_over_scheme_uri(spark, tmp_path):
    from ncbi_analysis_spark.operators.dedup import (
        append_to_lsh_index,
        write_lsh_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(20)],
        ["doc_id", "text"],
    )
    path = f"file:{tmp_path}/lsh_idx"
    write_lsh_index(docs.filter(F.col("doc_id") < 15), "text", "doc_id",
                    path, num_perm=8, bands=4)
    counts = append_to_lsh_index(docs.filter(F.col("doc_id") >= 15),
                                 "text", "doc_id", path,
                                 num_perm=8, bands=4)
    assert sum(r["n_appended"] for r in counts.collect()) == 5 * 4
    # drifted parameters still fail loudly through the Hadoop FS path
    with pytest.raises(ValueError, match="built with"):
        append_to_lsh_index(docs, "text", "doc_id", path,
                            num_perm=16, bands=8)


def test_ivf_centroid_drift_guard(spark, tmp_path):
    from ncbi_analysis_spark.operators.similarity_search import (
        append_to_ivf_index,
        ivf_assign,
        read_ivf_index,
        write_ivf_index,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i % 4), float(i % 3), 1.0]) for i in range(24)],
        ["vec_id", "embedding"],
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0, 1.0]), (1, [3.0, 2.0, 1.0])],
        ["c_id", "embedding"],
    )
    path = f"file:{tmp_path}/ivf_idx"
    base = vecs.filter(F.col("vec_id") < 18)
    write_ivf_index(ivf_assign(base, cents), path, centroids=cents)

    # same frozen quantizer appends fine
    delta = vecs.filter(F.col("vec_id") >= 18)
    append_to_ivf_index(delta, cents, path)
    assert read_ivf_index(spark, path).count() == 24

    # drifted centroids raise BEFORE any write corrupts the index
    drifted = spark.createDataFrame(
        [(0, [0.5, 0.0, 1.0]), (1, [3.0, 2.0, 1.0])],
        ["c_id", "embedding"],
    )
    with pytest.raises(ValueError, match="drifted"):
        append_to_ivf_index(delta, drifted, path)
    assert read_ivf_index(spark, path).count() == 24

    # pre-guard directories (no marker) keep the by-contract behavior
    legacy = f"file:{tmp_path}/ivf_legacy"
    write_ivf_index(ivf_assign(base, cents), legacy)
    append_to_ivf_index(delta, drifted, legacy)  # no marker -> no check


def test_fsutil_children_delete_rename_dir_size(spark, tmp_path):
    """Direct coverage of the r13 helpers the compaction swaps are
    built on: list_children includes hidden entries (unlike the parquet
    reader's listing), delete is recursive and False on absent paths,
    rename moves directories whole, and dir_size sums recursively."""
    from ncbi_analysis_spark.sources import fsutil

    root = f"file:{tmp_path}/fsroot"
    fsutil.write_text(spark, f"{root}/_marker.json", "{}")
    fsutil.write_text(spark, f"{root}/sub/a.txt", "aaaa")
    fsutil.write_text(spark, f"{root}/sub/b.txt", "bb")
    fsutil.write_text(spark, f"{root}/vis.txt", "cc")

    assert fsutil.list_children(spark, root) == [
        "_marker.json", "sub", "vis.txt"]
    assert fsutil.list_subdirs(spark, root) == ["sub"]
    assert fsutil.dir_size(spark, f"{root}/sub") == 6
    assert fsutil.dir_size(spark, root) == 6 + 2 + 2  # + marker "{}"
    assert fsutil.dir_size(spark, f"{root}/nope") == 0

    fsutil.rename(spark, f"{root}/sub", f"{root}/_retired_sub")
    assert "sub" not in fsutil.list_children(spark, root)
    assert fsutil.read_text(spark, f"{root}/_retired_sub/a.txt") == "aaaa"
    # rename onto an existing path refuses (the swap protocol relies
    # on this to never clobber a moved-in child)
    fsutil.write_text(spark, f"{root}/dst.txt", "x")
    import pytest as _pytest
    with _pytest.raises(IOError, match="rename failed"):
        fsutil.rename(spark, f"{root}/vis.txt", f"{root}/dst.txt")

    assert fsutil.delete(spark, f"{root}/_retired_sub") is True
    assert fsutil.delete(spark, f"{root}/_retired_sub") is False
    assert fsutil.list_subdirs(spark, root) == []
