"""Relational operator builders: DataFrame -> DataFrame functions.

Each module maps to a row of SURVEY.md §2's operator inventory and carries
the reference citation in its docstrings.
"""

from ncbi_analysis_spark.operators import (  # noqa: F401
    asof,
    cluster,
    dedup,
    distribution,
    intervals,
    multimodal,
    reorder,
    similarity_search,
    suppression,
    topk,
)
