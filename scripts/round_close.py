"""Round-close checklist runner (COVERAGE.md header, item 2-3).

One command instead of three so the r8 lapse (forgetting to commit the
round-close oracle record) can't recur by oversight:

  1. full local oracle gate incl. the staged set, written to
     ``ORACLE_LOCAL_r{N}.json`` (the committed freshness record);
  2. ``last_green.py`` staleness audit (must end "0 stale");
  3. bench sanity: the committed clean bench record must exist for the
     round and contain no ``unbaselined`` entries / errors.

Usage: python scripts/round_close.py <round-number>
Exits non-zero if any leg fails; COMMIT the artifacts it names.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    oracle_json = os.path.join(REPO, f"ORACLE_LOCAL_r{rnd:02d}.json")

    print(f"[1/3] full oracle gate -> {oracle_json}", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/check_oracle.py"),
         "/root/testdata/sf0.01", "--staged", "--json", oracle_json],
        cwd=REPO)
    if r.returncode != 0:
        print("FAIL: oracle gate not green")
        return 1

    # loud completeness check (r9 verdict ask 4): the record must cover
    # every registered AND every currently-staged query — catches the
    # r9 lapse where round_close ran before late staged additions, so a
    # stale committed record silently missed them
    sys.path.insert(0, REPO)
    import __spark_entry__ as e
    from ncbi_analysis_spark.plans import registry

    expected = set(e.queries()) | set(registry.staged_queries())
    rec_keys = set(json.load(open(oracle_json)))
    missing = sorted(expected - rec_keys)
    if missing:
        print(f"FAIL: oracle record missing {len(missing)} "
              f"registered/staged queries: {missing} — re-run "
              "round_close AFTER the last staged addition")
        return 1
    print(f"  record covers all {len(expected)} registered+staged "
          "queries")

    print("[2/3] staleness audit", flush=True)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/last_green.py")],
        cwd=REPO, capture_output=True, text=True).stdout
    tail = out.strip().splitlines()[-1] if out.strip() else ""
    print("  " + tail)
    if " 0 stale" not in tail:
        print("FAIL: stale queries remain — commit the oracle record "
              "and re-run")
        return 1

    print("[3/3] bench record sanity", flush=True)
    bench_json = os.path.join(REPO, f"BENCH_LOCAL_r{rnd:02d}_clean.json")
    if not os.path.exists(bench_json):
        print(f"FAIL: {bench_json} missing — run `python bench.py > "
              f"{os.path.basename(bench_json)}` on an idle box and commit it")
        return 1
    rec = json.load(open(bench_json))
    bad = rec.get("unbaselined") or []
    errs = rec.get("errors") or {}
    if bad or errs:
        print(f"FAIL: unbaselined={bad} errors={list(errs)}")
        return 1
    print(f"  median_vs_baseline={rec.get('median_vs_baseline')} "
          f"regressions={rec.get('regressions')}")

    print(f"\nround {rnd} close: all green — commit "
          f"{os.path.basename(oracle_json)} (and the bench record if new)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
