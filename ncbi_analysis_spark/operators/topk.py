"""Per-group top-k (SURVEY.md §2.5 W1).

Reference: bounded min-heap of size ``top_k`` per (gene, strand, slice),
merged and truncated (src/analysis/gene_similarity_match.py:105-107,202-208;
ordering on MatchCandidate src/analysis/models/match_candidate.py:36-46).

Spark-first: a rank window. Physically this is a shuffle on the partition
keys followed by a per-key sort — Spark's window TopK; with no partition
keys Catalyst plans ``TakeOrderedAndProject`` (partial top-k per partition
+ merge, exactly the reference's heap-merge but distributed).

Scale notes: for huge groups and tiny k, pre-filtering with an
approximate per-group threshold would cut the shuffle; AQE handles skewed
groups. The ordering should always include a unique tiebreaker column so
results are deterministic (the reference relies on stable Python sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    partition_by: list[str | Column],
    order_by: list[Column],
    k: int,
    rank_col: str = "rk",
    keep_rank: bool = True,
) -> DataFrame:
    """Keep the top ``k`` rows of each group under ``order_by``.

    ``order_by`` must define a total order within each group (append a
    unique id as tiebreaker) for deterministic output.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def global_topk(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k — ``orderBy().limit()`` so Catalyst plans
    TakeOrderedAndProject (no full sort, no single-partition shuffle)."""
    return df.orderBy(*order_by).limit(k)
