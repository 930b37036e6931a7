"""Table profiling — the "what is actually in this table" operator a
data engine needs before any curation decision: per-column row/null/
distinct counts, min/max, and total string length, computed in ONE
corpus scan.

Two distinct-count tiers (the repo's standing exact-vs-sketch split):

- ``exact_distinct=True`` (default, the oracled path): one
  ``count_distinct`` per column. Spark plans multiple distincts in a
  single pass via Expand — each input row is replicated once per
  distinct aggregate, so the shuffle grows ~n_cols×; exact answers,
  affordable up to wide-corpus scales where n_cols× one table scan is
  acceptable.
- ``exact_distinct=False`` (the 100 TB path): ``approx_count_distinct``
  (Spark's HyperLogLog++), no Expand, one plain aggregation pass. The
  estimates are Spark-internal (rsd default 5%) and NOT cross-engine
  reproducible — profile-level decisions tolerate that; anything that
  must be exact goes through the sketch tier (``operators/sketches``)
  or the exact mode.

All stats come back in a uniform, engine-portable schema — one row per
column: ``(column, n_rows, n_nulls, n_distinct, min_value, max_value,
sum_len)`` with min/max/sum_len over the STRING cast (bigint/varchar
casts are bit-identical across Spark and DuckDB; float columns profile
too, but their string forms are engine-specific — keep those out of
exact-match comparisons). Integer arithmetic only, no float division.

The aggregate row is collected (one row, 6×n_cols scalars — the
bounded-model convention) and re-emitted as a tiny DataFrame; the scan
itself is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """One-scan per-column profile of ``df`` (see module docstring).
    Returns one row per profiled column, ordered by column name."""
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: no such column(s) {missing}")
    if not cols:
        raise ValueError("profile_table: no columns to profile")

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{i}"),
            (F.count_distinct(F.col(c)) if exact_distinct
             else F.approx_count_distinct(F.col(c))).alias(f"__nd_{i}"),
            F.min(s).alias(f"__mn_{i}"),
            F.max(s).alias(f"__mx_{i}"),
            F.sum(F.length(s)).alias(f"__sl_{i}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [
        (c, int(row["__rows"]), int(row[f"__nn_{i}"]),
         int(row[f"__nd_{i}"]), row[f"__mn_{i}"], row[f"__mx_{i}"],
         int(row[f"__sl_{i}"]) if row[f"__sl_{i}"] is not None else 0)
        for i, c in enumerate(cols)
    ]
    out.sort(key=lambda r: r[0])
    return df.sparkSession.createDataFrame(
        out,
        "column string, n_rows long, n_nulls long, n_distinct long, "
        "min_value string, max_value string, sum_len long",
    )
