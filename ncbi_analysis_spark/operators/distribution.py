"""Group-count + ratio distributions (SURVEY.md §2.4 A1).

Reference: ``Counter`` over source names / nearest-gene names, emitting
``(key, count, count/total %)`` sorted descending
(src/analysis/neighbor_analysis.py:138-153).

Spark-first: hash aggregate (map-side partial combine for free) + a ratio
computed against the grand total. The grand total is obtained with a
window over the *aggregated* (already small) result — the expensive
shuffle happens once on the raw data, the total-window touches only
|distinct keys| rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def value_distribution(
    df: DataFrame,
    key_cols: list[str | Column],
    count_alias: str = "cnt",
    ratio_alias: str = "ratio",
    ratio_digits: int = 6,
) -> DataFrame:
    """``(key..., cnt, ratio)`` sorted by cnt desc then key asc.

    ``ratio`` is rounded so the value is reproducible across engines.
    """
    agg = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias(count_alias))
    total = Window.partitionBy()
    return (
        agg.withColumn(
            ratio_alias,
            F.round(F.col(count_alias) / F.sum(count_alias).over(total), ratio_digits),
        )
        .orderBy(F.desc(count_alias), *[F.asc(c) for c in agg.columns if c != count_alias])
    )
