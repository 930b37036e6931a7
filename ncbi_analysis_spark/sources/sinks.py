"""Sink layer (SURVEY.md §2.1 S11-S13).

Parquet is the engine's native interchange (stage handoffs are
DataFrames, never text files). These sinks exist for reference-format
compatibility: TSV tables, FASTA records, and human-readable block
reports, all rendered JVM-side (format_string) and written as text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S11: tab-separated with header (reference pandas to_csv(sep='\\t'),
    src/analysis/gentamycin.py:37-41)."""
    df.write.option("sep", "\t").option("header", True).mode(mode).csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_fasta(df: DataFrame, path: str, name: str = "name", start: str = "start",
                end: str = "end", seq: str = "seq", mode: str = "overwrite") -> None:
    """S12: ``>name/start-end\\nSEQ`` records
    (reference src/analysis/cluster_match.py:115-135)."""
    rec = F.format_string(">%s/%s-%s\n%s", F.col(name), F.col(start), F.col(end), F.col(seq))
    df.select(rec.alias("value")).write.mode(mode).text(path)


def match_block(name: Column, start: Column, end: Column, direction: Column,
                score: Column) -> Column:
    """S13: one similarity-match block header line
    (reference src/analysis/gene_similarity_match.py:126-155)."""
    return F.format_string(
        ">%s/%d-%d\tdirection=%s,weighted_similarity=%s",
        name, start, end, direction, F.round(score, 4).cast("string"),
    )


def write_match_blocks(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S13 block-report sink over a similarity_scan result."""
    direction = F.when(F.col("start") <= F.col("end"), F.lit(">")).otherwise(F.lit("<"))
    df.select(
        match_block(
            F.col("name"), F.col("start"), F.col("end"), direction,
            F.col("weighted_similarity"),
        ).alias("value")
    ).write.mode(mode).text(path)


def fixed_width_row(cols: list[Column], widths: list[int]) -> Column:
    """S13 fixed-width sample rows (reference src/analysis/cluster_match.py:105-114)."""
    return F.concat(*[
        F.rpad(c.cast("string"), w, " ") for c, w in zip(cols, widths)
    ])
