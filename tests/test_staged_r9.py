"""Staged round-9 driver queries (plans/driver_queries_r9.py), held to
the driver's own bar before registration: DuckDB oracle parity with
sorted-column / sorted-row exact-value comparison at sf0.001."""

from __future__ import annotations

import importlib.util
import os

import duckdb

SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "check_oracle.py"),
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)


def test_all_staged_r9_queries_duckdb_parity(spark):
    """Every staged round-9 entry must already clear the exact-match bar
    the driver will apply at registration — same comparator as
    scripts/check_oracle.py, no weaker check for staged queries."""
    from ncbi_analysis_spark.plans.driver_queries_r9 import (
        oracle_sql_r9,
        queries_r9,
    )

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    try:
        qs, oracles = queries_r9(), oracle_sql_r9()
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


def test_lsh_index_incremental_crawl_loop(spark, tmp_path):
    """The persisted LSH index's crawl-ingest loop: build from part of
    the corpus, append the rest (only band directories gain files),
    probe with a new batch — collisions equal the recompute-everything
    fuzzy_decon_pairs, parameter drift fails loudly, and broadcast_new
    keeps the index side unshuffled."""
    import glob as _glob
    import os as _os

    import pytest
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.dedup import (
        append_to_lsh_index,
        fuzzy_decon_pairs,
        lsh_index_collisions,
        read_lsh_index,
        write_lsh_index,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    old = d.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    new = d.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    kw = dict(num_perm=4, bands=2, shingle_n=3)

    path = str(tmp_path / "lsh_index")
    write_lsh_index(old.filter(F.col("doc_id") % 5 != 0),
                    "text", "doc_id", path, **kw)
    files_before = {b: sorted(_os.listdir(b))
                    for b in _glob.glob(path + "/band=*")}
    counts = append_to_lsh_index(old.filter(F.col("doc_id") % 5 == 0),
                                 "text", "doc_id", path, **kw)
    assert {r["band"] for r in counts.collect()} == {0, 1}
    for b, before in files_before.items():
        after = sorted(_os.listdir(b))
        assert set(before) < set(after), f"{b} must gain files, not rewrite"

    index = read_lsh_index(spark, path)
    got = {(r["doc_id"], r["indexed_id"]) for r in lsh_index_collisions(
        new, index, "text", "doc_id", **kw).collect()}
    # recompute-everything reference: fuzzy_decon_pairs(new vs old)
    want = {(r["doc_id"], r["bench_id"]) for r in fuzzy_decon_pairs(
        new, old.select(F.col("doc_id").alias("bench_id"), "text"),
        "text", "doc_id", bench_id_col="bench_id", **kw).collect()}
    assert got == want and got
    # parameter drift fails loudly
    with pytest.raises(ValueError, match="built with"):
        append_to_lsh_index(new, "text", "doc_id", path,
                            num_perm=16, bands=8, shingle_n=3)
    with pytest.raises(ValueError, match="write_lsh_index"):
        append_to_lsh_index(new, "text", "doc_id", str(tmp_path / "nope"),
                            **kw)
    # the probe broadcasts the new side: the index is never shuffled
    plan = lsh_index_collisions(new, index, "text", "doc_id", **kw) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
