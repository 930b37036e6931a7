"""Round-13 staged driver queries.

Queries added this round live here until they are registered into
``plans/driver_queries.py``'s build-order dicts at the start of round 14
(the standing cadence — see COVERAGE.md's round-close checklist).
``scripts/check_oracle.py --staged`` runs these alongside the registry.
"""
from __future__ import annotations


def queries_r13() -> dict:
    return {}


def oracle_sql_r13() -> dict[str, str]:
    return {}
