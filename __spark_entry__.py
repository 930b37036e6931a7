"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the LLM-data-pipeline extensions, each checked against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from ncbi_analysis_spark.plans import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: join + aggregate +
    global top-k (TPC-H Q3 shape) — exercises broadcast join, partial
    aggregation, and TakeOrderedAndProject."""
    return driver_queries.q3_top_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    return driver_queries.oracle_sql()
