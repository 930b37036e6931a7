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
