#!/usr/bin/env python3
"""Print, per driver-contract query, the most recent round whose
CORRECTNESS_r{N}.json OR ORACLE_LOCAL_r{N}.json (a committed full local
``check_oracle.py --json`` run — same row shape, same bar) holds a
fully-green row (rows+schema+hash all true, no error), plus queries
never yet checked.

The driver checks 50 of the registry's queries per round with a
stalest-first rotation (plans/driver_queries.py::_rotate), while the
local round-close run covers everything; freshness audits over the
union of both records.

Usage: python scripts/last_green.py [--stale-only]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def last_green_rounds(repo: str) -> tuple[dict[str, int], dict[str, int]]:
    """(query -> last fully-green round, query -> last checked round)."""
    green: dict[str, int] = {}
    checked: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")) + glob.glob(
        os.path.join(repo, "ORACLE_LOCAL_r*.json")
    ):
        m = re.search(r"(?:CORRECTNESS|ORACLE_LOCAL)_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            checked[name] = max(checked.get(name, 0), rnd)
            ok = (
                rec.get("rows_match") is True
                and rec.get("schema_match") is True
                # rows-only checks carry no hash_match; an explicit False
                # is an exact-match failure and must NOT read as green
                and rec.get("hash_match") is not False
                and rec.get("err") in (None, "")
            )
            if ok and rnd > green.get(name, 0):
                green[name] = rnd
    return green, checked


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entry

    registry = list(entry.queries())
    green, checked = last_green_rounds(repo)
    newest = max(green.values(), default=0)
    stale_only = "--stale-only" in sys.argv

    rows = []
    n_fresh = 0
    for name in registry:
        g = green.get(name)
        c = checked.get(name)
        if g is None:
            status = "NEVER-CHECKED" if c is None else f"NEVER-GREEN (checked r{c})"
        elif c is not None and c > g:
            status = f"r{g} (LAST CHECK FAILED r{c})"
        elif g < newest:
            status = f"r{g} (stale)"
        else:
            status = f"r{g}"
            n_fresh += 1  # counted BEFORE the stale-only filter
            if stale_only:
                continue
        rows.append((name, status))

    width = max((len(n) for n, _ in rows), default=0)
    for name, status in rows:
        print(f"{name:<{width}}  {status}")
    print(
        f"\n{len(registry)} queries; newest round r{newest}; "
        f"{n_fresh} fresh, {len(registry) - n_fresh} stale/unchecked"
    )


if __name__ == "__main__":
    main()
