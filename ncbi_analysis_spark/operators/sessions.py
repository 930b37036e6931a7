"""Batch sessionization: gap-based session assignment over an event
table (the batch counterpart of streaming/events.py's
applyInPandasWithState sessionizer — same semantics, one windowed pass).

Scale: one shuffle on the session keys, two sorted window passes per
partition (new-session flag, running sum), then an aggregation that
reuses the same partitioning. Linear in events; no state beyond the
window frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign a per-key running ``session_no`` (1-based): a new session
    starts when the gap to the previous event exceeds ``gap`` (same
    units as ``ts_col``). ``tiebreak`` makes the ordering total when
    timestamps can collide."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(prev.isNull() | ((F.col(ts_col) - prev) > gap), 1).otherwise(0)
    running = Window.partitionBy(*key_cols).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_no", F.sum(new_sess).over(running).cast("long"))


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-session summary ``(keys..., session_no, session_start,
    session_end, n_events)``."""
    s = sessionize(df, key_cols, ts_col, gap, tiebreak)
    return s.groupBy(*key_cols, "session_no").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
