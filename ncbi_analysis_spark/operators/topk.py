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


def topk_per_group_pruned(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[tuple[str, bool]],
    k: int,
    rank_col: str = "rk",
    keep_rank: bool = True,
) -> DataFrame:
    """Two-phase EXACT per-group top-k — the 100 TB form of
    ``topk_per_group`` (whose scale note this implements): the plain
    rank window shuffles EVERY row of every group; this first reduces
    each partition to its own per-group top-k (Arrow-batched, no
    shuffle), so the window only ranks <= partitions * groups * k
    surviving rows. Structurally this IS the reference's design,
    distributed: a bounded heap per worker, merged and re-truncated
    (src/analysis/gene_similarity_match.py:105-107,202-208) — phase 1
    is the per-worker heap, phase 2 the merge.

    Exactness: each group's true global top-k rows live in some
    partition, and within that partition each is among the group's
    partition-local top-k (otherwise k better rows exist there, which
    would also beat it globally — contradiction). The union therefore
    contains the true top-k, and ranking it under the same total order
    yields identical rows AND ranks to the unpruned operator (asserted
    against ``topk_per_group`` in tests and by the staged driver
    oracle).

    ``order_by`` is ``[(column_name, ascending)]`` — plain columns, not
    expressions, because phase 1 sorts in pandas. The order must be
    TOTAL (append unique id tiebreakers) and the order columns must be
    non-NULL: pandas and Spark disagree on NULL placement, which would
    break phase-1/phase-2 agreement. Group keys may be NULL (both
    engines group NULLs together; ``dropna=False``).
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"topk_per_group_pruned: k={k} must be >= 1")
    if not order_by:
        raise ValueError("topk_per_group_pruned: order_by is required")
    cols = [c for c, _ in order_by]
    asc = [a for _, a in order_by]
    schema = df.schema

    def _partial(batches):
        acc = None
        for pdf in batches:
            cur = pd.concat([acc, pdf]) if acc is not None else pdf
            cur = cur.sort_values(by=cols, ascending=asc, kind="mergesort")
            acc = cur.groupby(partition_by, sort=False, dropna=False).head(k)
        if acc is not None and len(acc):
            yield acc

    pruned = df.mapInPandas(_partial, schema)
    order_cols = [
        (F.asc(c) if a else F.desc(c)) for c, a in order_by
    ]
    return topk_per_group(pruned, list(partition_by), order_cols, k,
                          rank_col, keep_rank)
