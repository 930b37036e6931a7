"""Events table reader — physical timestamp-layout normalization.

The driver testdata's ``events.parquet`` has shipped with two physical
``ts`` layouts across rounds:

- ``TIMESTAMP(NANOS)``: Spark's parquet reader rejects nanos unless
  ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case ``ts``
  arrives as bigint nanos. We truncate to microseconds — the same
  floor(ns/1000) DuckDB applies when reading ns timestamps — so both
  engines see identical instants.
- ``TIMESTAMP_NTZ(MICROS)`` (the current layout): Spark reads it as
  TIMESTAMP_NTZ, which ``unix_micros``/``withWatermark`` reject. The
  session timezone is pinned to UTC (session.py), so casting to
  TIMESTAMP preserves the instant and matches DuckDB's epoch_us view of
  the same file.

Every consumer (batch driver queries, the streaming layer, tests) must
read events through this module so a future layout change is a one-line
fix rather than a scattered regression (round 4 broke two driver queries
and the bench because the conversion lived in each call site).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize any shipped ``ts`` physical layout to a TIMESTAMP column.

    Idempotent: a frame already carrying TIMESTAMP passes through
    unchanged, so callers can apply it defensively.
    """
    ts_type = dict(df.dtypes).get(col)
    if ts_type == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Batch events reader: ``path`` is either the parquet file itself or
    an sf directory containing ``events.parquet``."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p = path if path.endswith(".parquet") else os.path.join(path, "events.parquet")
    return normalize_event_ts(spark.read.parquet(p))
