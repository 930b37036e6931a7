"""Guarded round-robin spread for CPU-dense stages on byte-narrow
inputs (guide §2.5 / §1.2).

Several operators run expressions that are heavy per ROW while their
input is tiny per BYTE — interpreted HOF cosine folds, the per-position
md5 anchor probe of the span-dedup family, string-rebuild folds. Spark
plans stage width from BYTES (scan splits, AQE coalescing), so at small
data sizes these stages land on 1-2 tasks and serialize a 32-core box
(measured r15: a 3.8s single-task brute-force leg; a 4.1s two-task span
probe inside curation_v6).

``spread_narrow`` round-robins the input across the session's intended
parallelism ONLY when its physical partitioning is narrower — a no-op
(no added exchange) once the input is at least that wide, so at corpus
scale it never adds a shuffle. The explicit ``repartition(n)`` is a
user-specified exchange, which AQE does not re-coalesce.

Placement must not affect results: callers apply this only above
per-row pure computations whose consumers re-aggregate or re-order by
their own keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_parallelism(spark) -> int:
    """Task count for CPU-dense stages: the larger of
    defaultParallelism and spark.sql.shuffle.partitions (the
    plans.similarity_scan._scorer_parallelism rule — shuffle.partitions
    is the deploy-time statement of intended width and floors the
    at-submit executor count under dynamic allocation)."""
    sc = spark.sparkContext
    try:
        shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except (ValueError, TypeError):
        shuffle = 0
    return max(sc.defaultParallelism, shuffle, 1)


def spread_narrow(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` across :func:`spread_parallelism` partitions
    WHEN its pre-execution partitioning is narrower; identity
    otherwise. See the module docstring for when this is sound."""
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning quirk: skip the spread
        return df
    if n >= spread_parallelism(df.sparkSession):
        return df
    return df.repartition(spread_parallelism(df.sparkSession))
