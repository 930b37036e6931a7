"""Round-14 staged oracle queries.

Staged per the registry cadence (``plans/registry.py``): every entry
here is oracle-checked by ``scripts/check_oracle.py --staged`` and
bench-timed for baseline seeding this round, then wired into the
driver registry at round-15 start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def queries_r14() -> dict:
    return {}


def oracle_sql_r14() -> dict[str, str]:
    return {}
