"""Explicit-order reorder join (SURVEY.md §2.3 J8 / §2.5 W6).

Reference: output blocks in the order given by a user-supplied index file
(src/analysis/location_reorder.py:18-45).

Spark-first: join on the index key and sort by the supplied rank. The
index side is tiny -> broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reorder_by_index(
    df: DataFrame,
    index_df: DataFrame,
    on: str,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep rows matching the index and order them by ``rank_col``."""
    return (
        df.join(F.broadcast(index_df), on=on, how="inner")
        .orderBy(F.col(rank_col))
    )
