"""Source/domain-level corpus curation.

The web-scale curation pipelines (C4 §2.2, RefinedWeb §3, Gopher A1.1)
gate by PROVENANCE as well as by document content: a domain whose pages
are mostly mutual duplicates, boilerplate, or low quality is dropped
wholesale, because per-document filters leak systematic junk that is
only visible in aggregate. This module is that layer over the generic
``source`` column: aggregate per-source health stats, derive a
blocklist, gate the corpus by it.

Scale shape: one map-side per-document projection (digest + quality +
repetition, all codegen) -> ONE aggregate keyed by source. Report size
is source-cardinality (domains: ~10^7 at web scale — still a toy table
next to the corpus), so the blocklist broadcasts into the gate join and
the corpus itself is never shuffled. Exact ``countDistinct`` is used
for the dup fraction (two-phase partial agg; digests, not text, cross
the wire) — swap ``approx_count_distinct`` past ~10^9 docs/domain if
the exactness isn't worth the second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ncbi_analysis_spark.functions.text import dup_word_frac, quality_score, tokens
from ncbi_analysis_spark.operators.dedup import normalize_text


def source_quality_report(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    repetitive_threshold: float = 0.5,
) -> DataFrame:
    """Per-source corpus-health report:

    - ``n_docs``, ``total_chars``;
    - ``dup_frac``: 1 - distinct-normalized-digest/docs — the
      within-source exact-duplicate mass (mirror-site / template
      signature);
    - ``mean_quality``: average composite ``quality_score`` (summed as
      decimal so the value is addition-order-independent and
      oracle-exact — the q1_pricing_summary pattern);
    - ``repetitive_frac``: fraction of docs whose duplicate-word
      fraction exceeds ``repetitive_threshold`` (the Gopher word-level
      repetition rule, in aggregate).

    All ratios are single double divisions of exact values, rounded to
    6 places for display."""
    t = F.col(text)
    per_doc = df.select(
        F.col(source_col).alias("source"),
        F.md5(normalize_text(t)).alias("__digest"),
        F.length(t).cast("long").alias("__chars"),
        # round-then-decimal: exact, order-independent summation
        F.round(quality_score(t, tokens(F.lower(t))), 6)
        .cast("decimal(18,6)").alias("__q"),
        (dup_word_frac(tokens(t)) > repetitive_threshold)
        .cast("long").alias("__rep"),
    )
    n = F.count(F.lit(1))
    return per_doc.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        F.sum("__chars").cast("long").alias("total_chars"),
        F.round(
            F.lit(1.0) - F.countDistinct("__digest") / n, 6
        ).alias("dup_frac"),
        F.round(F.sum("__q").cast("double") / n, 6).alias("mean_quality"),
        F.round(F.sum("__rep") / n, 6).alias("repetitive_frac"),
    )


def derive_source_blocklist(
    report: DataFrame,
    max_dup_frac: float = 0.5,
    min_mean_quality: float = 0.0,
    max_repetitive_frac: float = 1.0,
) -> DataFrame:
    """Sources failing any health gate — 1 column, broadcast-sized."""
    return report.filter(
        (F.col("dup_frac") > max_dup_frac)
        | (F.col("mean_quality") < min_mean_quality)
        | (F.col("repetitive_frac") > max_repetitive_frac)
    ).select("source")


def filter_by_source_blocklist(
    df: DataFrame, blocklist: DataFrame, source_col: str = "source"
) -> DataFrame:
    """Drop every document from a blocklisted source (broadcast anti
    join — the corpus side never shuffles)."""
    bl = blocklist.select(F.col("source").alias(source_col)).distinct()
    return df.join(F.broadcast(bl), source_col, "left_anti")
