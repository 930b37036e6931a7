"""Randomized property tests for the round-13 tombstone family: a
seeded-random interleaving of write/append/delete/compact on a
persisted index must always present exactly the live view a pure-Python
set model predicts — whatever the operation order and whether or not a
compaction has folded the tombstones in (the test_property_batch.py
pattern: the model is written here, not re-imported engine code)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import dedup as dd
from ncbi_analysis_spark.operators import retrieval as rt


def _texts(n: int, rnd: random.Random) -> list[tuple[int, str]]:
    words = ["alpha", "beta", "gamma", "delta", "merge", "stream",
             "dup", "scan", "row", "hash"]
    return [
        (i, " ".join(rnd.choice(words) for _ in range(rnd.randrange(4, 10))))
        for i in range(n)
    ]


def test_lsh_index_random_maintenance_matches_set_model(spark, tmp_path):
    kw = dict(num_perm=4, bands=2, shingle_n=3)
    for seed in (7, 19):
        rnd = random.Random(seed)
        rows = _texts(40, rnd)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        path = str(tmp_path / f"lsh_{seed}")

        first = sorted(rnd.sample(range(40), 15))
        dd.write_lsh_index(df.filter(F.col("doc_id").isin(first)),
                           "text", "doc_id", path, **kw)
        live = set(first)
        pending = [i for i in range(40) if i not in live]
        tombstoned: set[int] = set()

        for _ in range(6):
            op = rnd.choice(["append", "delete", "compact"])
            if op == "append" and pending:
                batch = [pending.pop() for _ in
                         range(min(len(pending), rnd.randrange(1, 5)))]
                # appending a tombstoned id is refused — model respects
                # the same contract by construction (ids never reused
                # while tombstoned)
                dd.append_to_lsh_index(
                    df.filter(F.col("doc_id").isin(batch)),
                    "text", "doc_id", path, **kw)
                live |= set(batch)
            elif op == "delete" and live:
                batch = rnd.sample(sorted(live), rnd.randrange(1, 4))
                dd.delete_from_lsh_index(
                    spark.createDataFrame([(i,) for i in batch], "id long"),
                    path)
                live -= set(batch)
                tombstoned |= set(batch)
            elif op == "compact":
                dd.compact_lsh_index(spark, path)
                # compaction frees the tombstoned ids for future reuse
                pending.extend(sorted(tombstoned))
                tombstoned.clear()
            got = {r["id"] for r in
                   dd.read_lsh_index(spark, path).select("id")
                   .distinct().collect()}
            assert got == live, (seed, op, got ^ live)


def test_bm25_index_random_maintenance_tracks_stats(spark, tmp_path):
    for seed in (11,):
        rnd = random.Random(seed)
        rows = _texts(30, rnd)
        dl = {i: len(t.split()) for i, t in rows}
        df = spark.createDataFrame(rows, "doc_id long, text string")
        path = str(tmp_path / f"bm25_{seed}")

        first = sorted(rnd.sample(range(30), 12))
        rt.write_bm25_index(df.filter(F.col("doc_id").isin(first)), path,
                            n_buckets=4)
        live = set(first)
        pending = [i for i in range(30) if i not in live]
        tombstoned: set[int] = set()

        def check():
            stats = rt._bm25_marker_read(spark, path)["stats"]
            assert stats == {"n_docs": len(live),
                             "sum_dl": sum(dl[i] for i in live)}
            got = {r["doc_id"] for r in
                   rt.read_bm25_index(spark, path)["doclens"]
                   .select("doc_id").collect()}
            assert got == live

        for _ in range(6):
            op = rnd.choice(["append", "delete", "delete", "compact"])
            if op == "append" and pending:
                batch = [pending.pop() for _ in
                         range(min(len(pending), rnd.randrange(1, 5)))]
                rt.append_to_bm25_index(
                    df.filter(F.col("doc_id").isin(batch)), path,
                    n_buckets=4)
                live |= set(batch)
            elif op == "delete" and live:
                # deletes may include absent / already-deleted ids —
                # stats must not double-subtract
                batch = rnd.sample(sorted(live), rnd.randrange(1, 4))
                noise = [999, *rnd.sample(sorted(tombstoned), 1)] \
                    if tombstoned else [999]
                rt.delete_from_bm25_index(
                    spark.createDataFrame(
                        [(i,) for i in batch + noise], "doc_id long"),
                    path)
                live -= set(batch)
                tombstoned |= set(batch)
            elif op == "compact":
                rt.compact_bm25_index(spark, path)
                pending.extend(sorted(tombstoned))
                tombstoned.clear()
            check()


def test_cc_incremental_fold_is_idempotent_and_order_tolerant(spark):
    """Replaying an already-folded batch must be a no-op (the
    at-least-once delivery property a crawl scheduler relies on), and
    folding batches in a different order must converge to the same
    labeling as the full recompute."""
    from ncbi_analysis_spark.operators.components import (
        connected_components, connected_components_incremental)

    rnd = random.Random(41)
    edges = [(rnd.randrange(60), rnd.randrange(60)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    e1, e2 = edges[: len(edges) // 2], edges[len(edges) // 2:]
    df = lambda es: spark.createDataFrame(es, ["id_a", "id_b"])  # noqa: E731

    want = {r["id"]: r["component"]
            for r in connected_components(df(edges)).collect()}

    base = connected_components(df(e1))
    once = connected_components_incremental(base, df(e2))
    twice = connected_components_incremental(once, df(e2))  # replay
    got_once = {r["id"]: r["component"] for r in once.collect()}
    got_twice = {r["id"]: r["component"] for r in twice.collect()}
    assert got_once == want
    assert got_twice == want

    # reversed batch order, same fixpoint
    rev = connected_components_incremental(
        connected_components(df(e2)), df(e1))
    assert {r["id"]: r["component"] for r in rev.collect()} == want
