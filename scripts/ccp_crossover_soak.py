"""Partition-versioned CC labels: the write-IO crossover measurement.

The r14 SCALING.md row recorded the honest toy-scale negative: at
sf0.1 (669 labeled ids) the parted artifact's fold wrote MORE bytes
than the flat artifact's whole-table rewrite, because every partition
file sat below parquet's ~1.6 KB file-overhead floor. The parted
layout's claim lives in the opposite regime — partitions much larger
than the floor — and this soak measures that point (VERDICT r14 ask
5): a synthetic labels table of N_NODES ids (default 2,000,000 —
~31k rows / ~180 KB per partition at 64 partitions, two orders of
magnitude above the floor), one small fold batch, and the fold-write
bytes of both layouts counted from the filesystem (new files only).

History: 1M disjoint (2i, 2i+1) edges -> 2M labeled ids. Fold batch:
8 bridge edges (8i*4, 8i*4+2) merging adjacent pairs — a bounded
blast radius, the production shape (a day's crawl dups touch a tiny
id neighborhood, not the corpus).

Usage: python scripts/ccp_crossover_soak.py [n_nodes] [n_parts]
Prints one JSON line; the SCALING.md row records it.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tree_files(root: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.path.getsize(p)
    return out


def _new_bytes(before: dict[str, int], after: dict[str, int]) -> int:
    return sum(sz for p, sz in after.items() if p not in before)


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from ncbi_analysis_spark.operators.components import (
        fold_into_cc_labels,
        fold_into_cc_labels_parted,
        read_cc_labels_parted,
        write_cc_labels,
        write_cc_labels_parted,
    )
    from ncbi_analysis_spark.session import get_spark

    spark = get_spark(shuffle_partitions=32)
    from pyspark.sql import functions as F

    half = n_nodes // 2
    hist = spark.range(half).select(
        (F.col("id") * 2).alias("id_a"),
        (F.col("id") * 2 + 1).alias("id_b"),
    )
    batch = spark.range(8).select(
        (F.col("id") * 32).alias("id_a"),
        (F.col("id") * 32 + 2).alias("id_b"),
    )

    tmp = tempfile.mkdtemp(prefix="ccp_crossover_")
    flat, parted = f"{tmp}/flat", f"{tmp}/parted"
    res: dict = {"n_nodes": n_nodes, "n_parts": n_parts}
    try:
        t0 = time.time()
        write_cc_labels(hist, flat)
        res["flat_build_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        write_cc_labels_parted(hist, parted, n_parts=n_parts)
        res["parted_build_s"] = round(time.time() - t0, 2)
        res["table_bytes"] = sum(_tree_files(parted).values())

        b_flat = _tree_files(flat)
        t0 = time.time()
        fold_into_cc_labels(batch, flat)
        res["flat_fold_s"] = round(time.time() - t0, 2)
        res["flat_fold_bytes"] = _new_bytes(b_flat, _tree_files(flat))

        b_part = _tree_files(parted)
        t0 = time.time()
        fold_into_cc_labels_parted(batch, parted)
        res["parted_fold_s"] = round(time.time() - t0, 2)
        after = _tree_files(parted)
        res["parted_fold_bytes"] = _new_bytes(b_part, after)
        rewritten = {
            p.split("/part=")[1].split("/")[0]
            for p in after
            if p not in b_part and "/part=" in p
        }
        res["parted_rewritten"] = len(rewritten)
        res["bytes_vs_flat"] = round(
            res["parted_fold_bytes"] / res["flat_fold_bytes"], 3)
        # sanity: the fold actually merged the 8 bridged components
        n = read_cc_labels_parted(spark, parted)
        res["labeled_rows"] = n.count()
        res["components_after"] = n.select("component").distinct().count()
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
