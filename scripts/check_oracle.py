"""Local correctness harness mimicking the driver's DuckDB-oracle gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given scale factor, then compares: row count, sorted column names,
dtypes (loosely), and an order-insensitive exact value comparison.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       (``--staged`` anywhere in args also runs the next round's staged
       entries — ``plans/registry.py``'s STAGED list — under the same
       comparator;
       ``--json PATH`` additionally writes a CORRECTNESS_r{N}-shaped
       verdict — per query rows/schema/hash match booleans — so a full
       local run can be committed as ``ORACLE_LOCAL_r{N}.json`` and the
       freshness auditor (scripts/last_green.py) can count it)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    issues = []
    if len(spark_pdf) != len(oracle_pdf):
        issues.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        issues.append(f"columns spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}")
        return issues
    a, b = canon(spark_pdf), canon(oracle_pdf)
    if len(a) != len(b):
        return issues
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if a[c].dtype.kind == "f":
            both_nan = pd.isna(av) & pd.isna(bv)
            exact = (av == bv) | both_nan
            if not exact.all():
                close = np.isclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True)
                n_bad = int((~exact).sum())
                if close.all():
                    ix = np.where(~exact)[0][:3]
                    issues.append(
                        f"col {c}: {n_bad} values differ in last ulps (close) e.g. "
                        f"{[(av[i], bv[i]) for i in ix]}"
                    )
                else:
                    ix = np.where(~close)[0][:3]
                    issues.append(
                        f"col {c}: {n_bad} differ, NOT close e.g. {[(av[i], bv[i]) for i in ix]}"
                    )
        else:
            neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
            if neq.any():
                ix = np.where(neq)[0][:3]
                issues.append(
                    f"col {c}: {int(neq.sum())} values differ e.g. {[(av[i], bv[i]) for i in ix]}"
                )
    return issues


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--staged"]
    staged = "--staged" in sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check_oracle.py [SF_DIR] [QUERY ...] [--staged] "
                  "[--json OUT_PATH]", file=sys.stderr)
            return 2
        json_path = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    # generated oracles (trained-IVF centroid literals) must derive from
    # the same data the Spark side reads
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as e
    from ncbi_analysis_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    if staged:
        from ncbi_analysis_spark.plans import registry

        qs = {**qs, **registry.staged_queries()}
        oracles = {**oracles, **registry.staged_oracle_sql()}
    n_pass = n_fail = 0
    record: dict[str, dict] = {}

    def rec(name, spark_rows=None, oracle_rows=None, issues=None, err=None):
        # the driver's CORRECTNESS_r{N}.json row shape, so last_green.py
        # can treat a committed local run like a driver record
        has_issues = bool(issues)
        record[name] = {
            "rows_match": (None if err else
                           not any(i.startswith("rowcount") for i in (issues or []))),
            "schema_match": (None if err else
                             not any(i.startswith("columns") for i in (issues or []))),
            "hash_match": None if err else not has_issues,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": err,
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {str(ex)[:500]}")
            rec(name, err=f"spark: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"PASS {name}: rows={len(spark_pdf)} (rows-only, no oracle) [{t1-t0:.1f}s]")
            record[name] = {
                "rows_match": True, "schema_match": True, "hash_match": None,
                "spark_rows": len(spark_pdf), "oracle_rows": None, "err": None,
            }
            n_pass += 1
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {type(ex).__name__}: {str(ex)[:500]}")
            rec(name, spark_rows=len(spark_pdf),
                err=f"oracle: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        issues = compare(name, spark_pdf, oracle_pdf)
        rec(name, spark_rows=len(spark_pdf), oracle_rows=len(oracle_pdf),
            issues=issues)
        if issues:
            print(f"FAIL {name}: rows={len(spark_pdf)} [{t1-t0:.1f}s]")
            for i in issues:
                print(f"  - {i}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(spark_pdf)} exact-match [{t1-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(record, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path} ({len(record)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
