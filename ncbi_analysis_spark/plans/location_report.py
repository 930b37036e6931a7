"""Pipeline-2 final formatting stage: the consistency-record TSV.

Reference: ``src/analysis/gene_location_analysis.py:307-346``
(``format_data_to_tsv``) + ``:348-419`` (``extract_consistency_record``)
— the ``3-run_file_format.py`` workflow that turns location-result
blocks into a tab-separated report with headers
``index name weighted_similarity textedit_similarity direct_similarity
consistency_similarity location gene_name type exonic_gene_sizes
product site target_sequence`` plus ``location start i``/``location end
i`` pairs when any record carries location intervals (dynamic width:
headers are padded to the widest row; data rows are NOT padded — each
row is exactly 13 + 2·(its own interval count) fields, as the reference
writes them).

Two entry points produce the same record schema:

- ``consistency_records``: parse an existing stage-2 location-result
  FILE (sources.legacy_blocks.read_consistency_blocks — the literal
  stage-3 input) and enrich with gene metadata. Use this to re-format
  files the reference pipeline already produced.
- ``location_report``: the COMPOSED plan — S5 match-block scan ->
  bounded probe-window classification (plans.location.locate_matches,
  the stage-2 semantics) -> labels -> metadata join, skipping the
  intermediate text file entirely. Byte-identical TSV to running the
  reference's stage 2 then stage 3 (tests/test_location_report.py
  replays the reference-executed golden).

Scale: the annotation table broadcasts (the genomic case is ~4.5k
rows); matches never shuffle except the final tiny sort in the sink
(a presentation artifact over a bounded report set, like the S13
sinks). For corpus-scale classification WITHOUT the report formatting,
call locate_matches directly with partition keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPORT_HEADERS = [
    "index", "name", "weighted_similarity", "textedit_similarity",
    "direct_similarity", "consistency_similarity", "location",
    "gene_name", "type", "exonic_gene_sizes", "product", "site",
    "target_sequence",
]

# stage-1 report attribute keys, in SimilarityType enum order — the
# stage-2 match_info preserves this order, and stage 3's target_format
# parse is last-one-wins (gene_similarity_match.py:118-119 sorted
# weighted.items(); similarity_type.py enum values)
_SCORER_ENUM_ORDER = ["textedit", "direct", "consistency", "pattern", "blat"]


def _with_gene_metadata(records: DataFrame, ecocyc_records: DataFrame) -> DataFrame:
    """LEFT-join type/exonic_gene_sizes/product for non-inter-genic
    records by trimmed gene name (reference get_target_gene lookup,
    gene_location_analysis.py:362-368; a miss — e.g. a promoter name —
    leaves the fields empty)."""
    meta_cols = ["type", "exonic_gene_sizes", "product"]
    dims = ecocyc_records.select(
        F.col("gene").alias("__g"),
        *[F.coalesce(F.col(c).cast("string"), F.lit("")).alias(f"__m_{c}")
          for c in meta_cols],
    )
    joined = records.join(
        F.broadcast(dims),
        (F.trim(F.col("gene_name")) == F.col("__g"))
        & (F.col("location") != "inter genic"),
        "left",
    )
    for c in meta_cols:
        joined = joined.withColumn(
            c, F.coalesce(F.col(f"__m_{c}"), F.lit(""))
        ).drop(f"__m_{c}")
    return joined.drop("__g")


def consistency_records(
    spark: SparkSession, location_result_path: str, ecocyc_path: str
) -> DataFrame:
    """Stage-3-from-file: location-result blocks -> enriched
    consistency records (the rows of the final TSV)."""
    from ncbi_analysis_spark.sources.ecocyc import read_ecocyc_records
    from ncbi_analysis_spark.sources.legacy_blocks import read_consistency_blocks

    recs = read_consistency_blocks(spark, location_result_path)
    return _with_gene_metadata(recs, read_ecocyc_records(spark, ecocyc_path))


def location_report(
    spark: SparkSession, match_path: str, ecocyc_path: str
) -> DataFrame:
    """The composed stage-2+3 plan: S5 match blocks + Ecocyc annotations
    -> classified, enriched consistency records, without materializing
    the intermediate location-result text file.

    Column-for-column parity with ``consistency_records`` over the
    reference's own stage-2 output, including the faithful quirks
    documented on ``parse_consistency_blocks`` (empty
    textedit/direct_similarity columns; no location intervals)."""
    from ncbi_analysis_spark.plans.location import locate_matches
    from ncbi_analysis_spark.sources.ecocyc import read_ecocyc
    from ncbi_analysis_spark.sources.legacy_blocks import read_match_blocks

    mb = read_match_blocks(spark, match_path)
    ec_records, inter = read_ecocyc(spark, ecocyc_path)

    target = F.coalesce(
        *[F.col("attrs")[f"{s}_target_format :"]
          for s in reversed(_SCORER_ENUM_ORDER)],
        F.lit(""),
    )
    matches = mb.select(
        (F.col("block_no") + 1).cast("string").alias("index"),
        F.coalesce(F.col("attrs")["name"], F.lit("")).alias("rpt_name"),
        F.coalesce(F.col("attrs")["weighted_similarity"], F.lit(""))
        .alias("weighted_similarity"),
        F.coalesce(F.col("attrs")["consistency_similarity"], F.lit(""))
        .alias("consistency_similarity"),
        F.concat_ws("-", F.col("start").cast("string"),
                    F.col("end").cast("string")).alias("site"),
        target.alias("target_sequence"),
        F.col("direction").alias("m_dir"),
        "start", "end",
    )

    located = locate_matches(matches, inter, bounded=True)

    loc = (
        F.when(F.col("label") == "inter-genic", F.lit("inter genic"))
        .otherwise(
            F.concat(
                F.when(F.col("rec_dir") == F.col("m_dir"), F.lit("antisense"))
                .otherwise(F.lit("sense")),
                F.lit(" "),
                F.when(F.col("label").isin("5'", "3'"),
                       F.concat(F.col("label"), F.lit("utr")))
                .otherwise(F.col("label")),
            )
        )
    )
    gene_name = F.when(
        F.col("label") == "inter-genic",
        # rec_name holds the rendered 'inter-genic of A, B' line; the
        # reference re-splits it on ' of ' (format_data_to_tsv:389)
        F.element_at(F.split(F.col("rec_name"), " of ", 2), 2),
    ).otherwise(F.col("rec_name"))

    from pyspark.sql import Window

    order_w = Window.partitionBy("index").orderBy(
        F.col("rec_start").asc_nulls_last(), F.col("rec_name")
    )
    recs = located.select(
        "index",
        (F.row_number().over(order_w) - 1).cast("long").alias("record_no"),
        F.col("rpt_name").alias("name"),
        "weighted_similarity",
        F.lit("").alias("textedit_similarity"),
        F.lit("").alias("direct_similarity"),
        "consistency_similarity",
        loc.alias("location"),
        gene_name.alias("gene_name"),
        "site",
        "target_sequence",
        F.array().cast("array<string>").alias("location_intervals"),
    )
    return _with_gene_metadata(recs, ec_records)


def format_location_report(records: DataFrame) -> DataFrame:
    """Render enriched consistency records as the reference's TSV lines:
    ``(sort_index, sort_record, line)`` rows, header excluded (the sink
    prepends it). Each data row is tab-joined base fields plus that
    row's own flattened intervals — rows are not padded to a common
    width, exactly as the reference writes them."""
    base = [
        F.coalesce(F.col(h).cast("string"), F.lit("")) for h in REPORT_HEADERS
    ]
    # join base fields, then append intervals only when present (a
    # trailing concat_ws segment would add a spurious '\t' on
    # interval-less rows)
    line = F.when(
        F.size(F.coalesce(F.col("location_intervals"),
                          F.array().cast("array<string>"))) > 0,
        F.concat(F.concat_ws("\t", *base), F.lit("\t"),
                 F.array_join(F.col("location_intervals"), "\t")),
    ).otherwise(F.concat_ws("\t", *base))
    return records.select(
        F.col("index").cast("long").alias("sort_index"),
        F.col("record_no").alias("sort_record"),
        line.alias("line"),
    )


def report_header_line(records: DataFrame) -> str:
    """The dynamic-width header: base headers extended with
    ``location start i``/``location end i`` pairs up to the widest
    row's interval count (format_data_to_tsv:340-343). One tiny
    aggregation (a single max over per-row array sizes)."""
    row = records.agg(
        F.max(F.size(F.coalesce(F.col("location_intervals"),
                                F.array().cast("array<string>"))))
    ).collect()
    extra = int(row[0][0] or 0)
    headers = list(REPORT_HEADERS)
    idx = 1
    while len(headers) < len(REPORT_HEADERS) + extra:
        headers.extend([f"location start {idx}", f"location end {idx}"])
        idx += 1
    return "\t".join(headers)


def write_location_report_tsv(records: DataFrame, path: str,
                              mode: str = "overwrite") -> None:
    """Single-file TSV sink, byte-compatible with the reference output:
    header first, rows in (block, record) order. A presentation
    artifact over a bounded report set (the S13 sink family) — the one
    partition is deliberate."""
    header = report_header_line(records)
    lines = format_location_report(records)
    out = (
        lines.select(
            F.col("sort_index"), F.col("sort_record"), F.col("line"))
        .unionByName(
            records.sparkSession.createDataFrame(
                [(-1, -1, header)], "sort_index long, sort_record long, line string"
            )
        )
        .repartition(1)
        .sortWithinPartitions("sort_index", "sort_record")
        .select("line")
    )
    out.write.mode(mode).text(path)
