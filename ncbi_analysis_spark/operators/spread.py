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


def spread_narrow_est(df: DataFrame,
                      per_task_bytes: int = 1 << 20) -> DataFrame:
    """The :func:`spread_narrow` guard for POST-SHUFFLE inputs, where
    the pre-execution partition count is the static
    ``shuffle.partitions`` and the narrowness only appears when AQE
    coalesces the stage at runtime (profiled r15: the Arrow batch
    scorer ran as a 2-task 1.7s job inside curation_v2 because the
    deduped corpus coalesced to ~2 partitions at sf0.1). Guard on the
    optimizer's SIZE estimate instead: spread only when the input would
    occupy fewer than ``spread_parallelism`` tasks at ``per_task_bytes``
    each — data-derived, so a corpus-scale input (estimate ≫
    parallelism · 1 MB) is untouched and no exchange is added."""
    try:
        est = int(df._jdf.queryExecution().optimizedPlan()
                  .stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — no estimate: leave the plan alone
        return df
    p = spread_parallelism(df.sparkSession)
    if est <= 0 or est >= p * per_task_bytes:
        return df
    return df.repartition(p)
