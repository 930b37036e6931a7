"""Neighborhood suppression / local-max dedup (SURVEY.md §2.5 W2).

Reference: a sliding deque over genome positions marks candidates
``should_ignore`` when a strictly better candidate lies within
``candidate_distance``; zero/negative scores are dropped
(update_candidate_list, src/analysis/gene_similarity_match.py:259-277).

Spark-first: a RANGE window ``max(score) OVER (PARTITION BY group ORDER BY
pos RANGE BETWEEN d PRECEDING AND d FOLLOWING)`` then keep rows equal to
their local max. Equivalent to the deque for strict dominance; ties within
distance all survive (matches the reference's strict ``>`` comparison).

Scale: one shuffle on the partition keys; the range frame is evaluated in
a single sorted pass per partition — same O(n) work as the deque, but
distributed and spill-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def local_max_suppress(
    df: DataFrame,
    partition_by: list[str | Column],
    pos: str | Column,
    score: str | Column,
    distance: int | float,
    drop_nonpositive: bool = True,
) -> DataFrame:
    """Keep rows whose ``score`` equals the max score within ``distance``
    of their ``pos`` (per group)."""
    pos = F.col(pos) if isinstance(pos, str) else pos
    score = F.col(score) if isinstance(score, str) else score
    if drop_nonpositive:
        df = df.filter(score > 0)
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(pos)
        .rangeBetween(-distance, distance)
    )
    return (
        df.withColumn("__local_max", F.max(score).over(w))
        .filter(score >= F.col("__local_max"))
        .drop("__local_max")
    )
