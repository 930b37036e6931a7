"""Registry-wide physical-plan audit as a regression gate.

Builds every driver query's plan (no execution beyond bounded
construction-time collects) and fails when a scale anti-pattern —
CartesianProduct, BroadcastNestedLoopJoin, statically-planned
single-partition exchange — appears on a query that doesn't have a
documented justification in scripts/plan_audit.py::EXPECTED.
"""

from __future__ import annotations

from scripts.plan_audit import EXPECTED, audit

SF_DIR = "/root/testdata/sf0.001"


def test_no_unexplained_plan_markers(spark):
    errors: dict[str, str] = {}
    results = audit(spark, SF_DIR, errors=errors)
    assert errors == {}  # a construction failure must not escape the gate
    assert len(results) >= 80  # the audit actually covered the registry
    unexplained = {
        name: sorted(found - EXPECTED.get(name, set()))
        for name, found in results.items()
        if found - EXPECTED.get(name, set())
    }
    assert unexplained == {}, (
        "new scale anti-pattern markers (justify in plan_audit.EXPECTED "
        f"or fix the plan): {unexplained}"
    )
    # expectations must not go stale either: every documented marker is
    # still present, so the table keeps describing reality
    stale = {
        name: sorted(allowed - results[name])
        for name, allowed in EXPECTED.items()
        if name in results and allowed - results[name]
    }
    assert stale == {}, f"EXPECTED entries no longer observed: {stale}"
