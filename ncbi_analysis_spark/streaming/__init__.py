"""Structured Streaming extension (SURVEY.md §2.8).

The reference is 100% batch — no watermarks, event-time windows, or
stateful operators anywhere (verified in SURVEY §2.8). Streaming is an
*extension* of this engine, not reference parity: the batch operators
whose forms are streaming-compatible (groupBy/window aggregations, exact
dedup) are exposed here over ``readStream``, plus a custom stateful
sessionizer via ``applyInPandasWithState``.
"""

from ncbi_analysis_spark.streaming import events  # noqa: F401
