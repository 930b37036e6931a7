"""Single source of truth for which per-round query modules are wired.

Round staging used to require edits in four places (the build-order
dicts in ``driver_queries.py``, the ``--staged`` import in
``scripts/check_oracle.py``, the expected-set import in
``scripts/round_close.py``, and a per-round timing block in
``bench.py``) — the exact cadence failure mode COVERAGE.md documents
from round 8. This module replaces all four edit sites with one list.

Cadence now:

* **stage a round**: create ``plans/driver_queries_r{N}.py`` exposing
  ``queries_r{N}()`` / ``oracle_sql_r{N}()`` and put ``"r{N}"`` in
  :data:`STAGED`. The staged entries are oracle-checked by
  ``check_oracle.py --staged`` / ``round_close.py`` and bench-timed
  (baseline seeding) but NOT exposed to the driver's ``queries()``.
* **wire at next round's start**: move the suffix from :data:`STAGED`
  to the front of :data:`WIRED`. Nothing else to edit.
"""

from __future__ import annotations

import importlib

# Build order, newest round first (matches the historical merge order in
# driver_queries.py; order only affects the registry's insertion-order
# tiebreak during stalest-first rotation).
WIRED: list[str] = [
    "r15", "r14", "r13", "r12", "r11", "r10", "r9", "r8", "r7", "r6",
    "r5", "r3b", "r2", "r3",
]

# Staged for the NEXT round: oracle-gated and bench-seeded this round,
# registered at next round's start. (Round 16 is an optimization round:
# nothing new is staged.)
STAGED: list[str] = []


def _round_num(suffix: str) -> int:
    return int("".join(ch for ch in suffix[1:] if ch.isdigit()))


def _mod(suffix: str):
    return importlib.import_module(
        f"ncbi_analysis_spark.plans.driver_queries_{suffix}"
    )


def round_queries(suffix: str) -> dict:
    return getattr(_mod(suffix), f"queries_{suffix}")()


def round_oracle_sql(suffix: str) -> dict:
    return getattr(_mod(suffix), f"oracle_sql_{suffix}")()


def wired_queries() -> dict:
    out: dict = {}
    for s in WIRED:
        out.update(round_queries(s))
    return out


def wired_oracle_sql() -> dict:
    out: dict = {}
    for s in WIRED:
        out.update(round_oracle_sql(s))
    return out


def staged_queries() -> dict:
    out: dict = {}
    for s in STAGED:
        out.update(round_queries(s))
    return out


def staged_oracle_sql() -> dict:
    out: dict = {}
    for s in STAGED:
        out.update(round_oracle_sql(s))
    return out


def bench_rounds() -> list[str]:
    """Rounds whose entries bench.py times via their round dicts, oldest
    first (r2–r6 shapes are listed in bench.BENCH_QUERIES directly);
    staged rounds bench ahead of registration so baselines are seeded
    before the driver ever times them."""
    wired = sorted((s for s in WIRED if _round_num(s) >= 7), key=_round_num)
    return wired + list(STAGED)
