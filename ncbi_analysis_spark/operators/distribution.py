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


def with_progress_counters(df: DataFrame, name: str = "progress",
                           success_pred: Column | None = None) -> DataFrame:
    """A7 success/failure counters (reference running solved/succ/fail
    tallies, src/analysis/ecocyc_analysis.py:53-111): Spark-native
    ``observe()`` metrics — read them from the QueryExecutionListener or
    ``df.observe`` result after an action; no extra pass over the data."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if success_pred is not None:
        metrics.append(F.sum(success_pred.cast("long")).alias("n_success"))
    return df.observe(name, *metrics)


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
