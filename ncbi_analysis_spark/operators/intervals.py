"""Interval-overlap joins and region numbering (SURVEY.md §2.3 J3/J7, §2.5 W7).

Reference: binary search over a sorted interval list to a candidate window,
then per-pair classification into 8 interval relations
(src/analysis/gene_location_analysis.py:149-204,278-304,421-437); region
gap numbering walks the sorted segment list emitting inter-genic gaps
(src/analysis/gene_range_analysis.py:24-39).

Spark-first:

- Small annotation side (the common genomic case: ~4.5k genes/genome):
  broadcast range join — Catalyst plans BroadcastNestedLoopJoin, which is
  fine when one side broadcasts.
- Big x big: a pure range predicate would force a nested-loop join. We
  instead *bin* the coordinate space: each interval joins on the bins it
  covers (equi-join on bin id + residual range predicate). To emit each
  matching pair exactly once without a distinct, a pair is produced only
  in the bin containing ``greatest(a.left, b.left)``. This converts the
  join into a hash shuffle join whose cost scales with
  (rows x avg interval length / bin_size) — the distributed equivalent of
  the reference's binary-search probe.

Region numbering is a lag window over the sorted intervals — one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ncbi_analysis_spark.functions.sequence import interval_relation, overlap_size


def interval_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    l_start: str, l_end: str,
    r_start: str, r_end: str,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Overlap join with a broadcast small side (annotation table)."""
    cond = (F.col(l_start) <= F.col(r_end)) & (F.col(l_end) >= F.col(r_start))
    if extra_cond is not None:
        cond = cond & extra_cond
    return left.join(F.broadcast(right), cond, "inner")


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    l_start: str, l_end: str,
    r_start: str, r_end: str,
    bin_size: int = 10_000,
    partition_keys: list[str] | None = None,
) -> DataFrame:
    """Big x big overlap join via coordinate binning (see module doc).

    ``partition_keys`` are equality keys joined alongside the bin
    (e.g. accession) — always provide them when both sides carry one.
    """
    pk = partition_keys or []

    def with_bins(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    (F.col(s) / bin_size).cast("long"),
                    (F.col(e) / bin_size).cast("long"),
                )
            ),
        )

    lb = with_bins(left, l_start, l_end)
    rb = with_bins(right, r_start, r_end).withColumnRenamed("__bin", "__rbin")
    for k in pk:
        rb = rb.withColumnRenamed(k, f"__r_{k}")
    cond = F.col("__bin") == F.col("__rbin")
    for k in pk:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    cond = cond & (F.col(l_start) <= F.col(r_end)) & (F.col(l_end) >= F.col(r_start))
    # dedupe: emit each pair only in the bin holding the overlap start
    cond = cond & (
        (F.greatest(F.col(l_start), F.col(r_start)) / bin_size).cast("long") == F.col("__bin")
    )
    return lb.join(rb, cond, "inner").drop("__bin", "__rbin", *[f"__r_{k}" for k in pk])


def classify_overlaps(joined: DataFrame, m_left: str, m_right: str,
                      g_left: str, g_right: str) -> DataFrame:
    """Append the 8-way relation + overlap length columns (J3 tail)."""
    return joined.withColumn(
        "relation",
        interval_relation(F.col(m_left), F.col(m_right), F.col(g_left), F.col(g_right)),
    ).withColumn(
        "overlap_len",
        overlap_size(F.col(m_left), F.col(m_right), F.col(g_left), F.col(g_right)),
    )


def gap_regions(
    df: DataFrame,
    partition_by: list[str],
    start: str,
    end: str,
    min_gap: int = 1,
) -> DataFrame:
    """Inter-genic gap regions with running numbering (W7).

    Reference walks sorted segments emitting ``region_k`` rows for gaps
    between genes (src/analysis/gene_range_analysis.py:24-39). Here:
    ``lag(max-end-so-far)`` over the sorted intervals; a gap exists when
    the next interval starts after the running covered end.
    """
    w = Window.partitionBy(*partition_by).orderBy(F.col(start), F.col(end))
    covered = F.max(F.col(end)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    out = (
        df.withColumn("__prev_end", covered)
        .filter(F.col("__prev_end").isNotNull() & (F.col(start) - F.col("__prev_end") > min_gap))
        .select(
            *partition_by,
            (F.col("__prev_end") + 1).alias("gap_start"),
            (F.col(start) - 1).alias("gap_end"),
        )
    )
    w2 = Window.partitionBy(*partition_by).orderBy("gap_start")
    return out.withColumn("region_no", F.row_number().over(w2)).withColumn(
        "region_name", F.concat(F.lit("region_"), F.col("region_no"))
    )
