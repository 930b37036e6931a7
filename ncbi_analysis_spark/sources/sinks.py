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


def write_training_shards(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    max_records_per_file: int = 0,
    mode: str = "overwrite",
) -> None:
    """Training-corpus output layout: parquet partitioned by the given
    columns (split/lang/source — one directory per value, the partition-
    prune key for downstream consumers) with per-file record bounds.

    ``maxRecordsPerFile`` is the 100 TB knob: without it a skewed
    upstream task writes one multi-GB shard that straggles every
    downstream reader; with it shard granularity is independent of the
    upstream task layout. Combine with a prior
    ``repartition(partition_cols)`` when many tasks would otherwise each
    open a file per partition value (the small-files explosion)."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_by).parquet(path)


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


# SimilarityType enum order + reference attribute labels
# (src/analysis/models/similarity_type.py:5-10; note TextEdit.name.lower()
# is "textedit", no underscore)
_SCORER_ORDER = {"text_edit": 0, "direct": 1, "consistency": 2, "pattern": 3, "blat": 4}
_SCORER_LABEL = {"text_edit": "textedit", "direct": "direct",
                 "consistency": "consistency", "pattern": "pattern", "blat": "blat"}


def write_match_report(
    df: DataFrame,
    path: str,
    scorers: list[str],
    data_name: str | None = None,
    mode: str = "overwrite",
    ascending: bool = False,
) -> None:
    """S13 full match report: numbered per-candidate blocks with the
    per-scorer similarity attributes AND the alignment-render triple per
    scorer, byte-compatible with the reference report
    (gene_similarity_match.py:113-155 builds headers name/direction/
    weighted_similarity/{scorer}_similarity/'original      :', then
    appends '{scorer}_{gene,target,match}_format' entries from
    rendering_sequence; blocks are numbered '(i)' per gene file and
    separated by a blank line).

    ``df`` is the output of ``render_candidates`` — per-query top-k rows
    carrying ``{scorer}_similarity`` and ``{scorer}_render`` columns —
    so the window below is keyed by gene name over a bounded report set
    (the reference emits one numbered file per gene; numbering restarts
    per name here too).

    ``ascending`` mirrors ``similarity_scan(ascending=)`` (W4
    OrderType.Increment): the reference sorts candidates by the NEGATED
    score, i.e. raw score ascending, so block numbering must follow the
    same polarity or a mixed-sign ascending report comes out reversed.
    """
    from pyspark.sql import Window

    ordered = sorted(scorers, key=lambda s: _SCORER_ORDER[s])
    direction = F.when(F.col("start") <= F.col("end"), F.lit("+")).otherwise(F.lit("-"))
    src = F.lit(data_name) if data_name is not None else F.col("accession")

    attrs = [
        F.format_string("name=%s", F.col("name")),
        F.format_string("direction=%s", direction),
        F.format_string("weighted_similarity=%.2f", F.col("weighted_similarity")),
    ]
    # attribute order follows the configured weights dict (insertion
    # order == caller's scorer list), as the reference headers do
    for s in scorers:
        attrs.append(F.format_string(
            f"{_SCORER_LABEL[s]}_similarity=%.2f",
            F.col(f"{_SCORER_LABEL[s]}_similarity")))
    attrs.append(F.format_string("original      :=%s", F.col("gene")))
    # render triples follow in SimilarityType enum order (the reference
    # sorts weighted.items() by enum value before rendering)
    for s in ordered:
        r = F.col(f"{s}_render")
        attrs.append(F.format_string(f"{_SCORER_LABEL[s]}_gene_format   :=%s", r[0]))
        attrs.append(F.format_string(f"{_SCORER_LABEL[s]}_target_format :=%s", r[1]))
        attrs.append(F.format_string(f"{_SCORER_LABEL[s]}_match_format  :=%s", r[2]))

    score_order = (
        F.asc("weighted_similarity") if ascending else F.desc("weighted_similarity")
    )
    idx = F.row_number().over(
        Window.partitionBy("name").orderBy(score_order, F.asc("start"))
    )
    block = F.format_string(
        "(%d)\n>%s/%d-%d\t%s\n",
        idx, src, F.col("start"), F.col("end"),
        F.concat_ws(",", *attrs),
    )
    df.select(block.alias("value")).write.mode(mode).text(path)


def fixed_width_row(cols: list[Column], widths: list[int]) -> Column:
    """S13 fixed-width sample rows (reference src/analysis/cluster_match.py:105-114)."""
    return F.concat(*[
        F.rpad(c.cast("string"), w, " ") for c, w in zip(cols, widths)
    ])
