"""Ecocyc annotation TSV source (SURVEY.md §2.1 S3).

Reference: header-line schema, each row -> EcocycRecord; each record
explodes into 1-2 interval rows (the gene interval; optionally the
promoter interval when ``promoter_name`` is set), globally sorted by
``start``; ``start > end`` encodes the reverse strand
(src/utils/ecocyc_data_loader.py:11-96).

Spark-first: header CSV read -> typed select -> ``explode(array(...))``
of interval structs -> orderBy. The reference's binary-search position
index (find_first_le) is unnecessary — downstream joins are range joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POS_COLS = ("promoter_pos", "gene_start_pos", "map_start_pos", "map_end_pos")


def read_ecocyc_records(spark: SparkSession, path: str) -> DataFrame:
    """Typed records table; ''/missing position columns become -1 (the
    reference's sentinel, ecocyc_data_loader.py:58-62)."""
    raw = spark.read.option("header", True).option("sep", "\t").csv(path)
    out = raw
    for c in _POS_COLS:
        expr = (
            F.coalesce(F.col(c).cast("long"), F.lit(-1)) if c in raw.columns
            else F.lit(-1).cast("long")
        )
        out = out.withColumn(c, expr)
    for c in ("gene", "product", "promoter_name"):
        if c not in raw.columns:
            out = out.withColumn(c, F.lit(""))
    return out


def explode_inter_records(records: DataFrame, output_promoter: bool = False) -> DataFrame:
    """inter_records(name, product, start, end, is_gene, direction, left,
    right) sorted by start."""
    gene_rec = F.struct(
        F.col("gene").alias("name"),
        F.col("product").alias("product"),
        F.col("map_start_pos").alias("start"),
        F.col("map_end_pos").alias("end"),
        F.lit(True).alias("is_gene"),
    )
    recs = F.array(gene_rec)
    if output_promoter:
        promoter_rec = F.struct(
            F.col("promoter_name").alias("name"),
            F.lit("").alias("product"),
            F.col("promoter_pos").alias("start"),
            F.col("gene_start_pos").alias("end"),
            F.lit(False).alias("is_gene"),
        )
        recs = F.when(
            F.coalesce(F.col("promoter_name"), F.lit("")) != "",
            F.array(gene_rec, promoter_rec),
        ).otherwise(F.array(gene_rec))
    ex = records.select(F.explode(recs).alias("r")).select("r.*")
    return ex.select(
        "name", "product", "start", "end", "is_gene",
        F.when(F.col("start") < F.col("end"), F.lit(">")).otherwise(F.lit("<")).alias("direction"),
        F.least("start", "end").alias("left"),
        F.greatest("start", "end").alias("right"),
    ).orderBy("start")


def read_ecocyc(spark: SparkSession, path: str, output_promoter: bool = False):
    records = read_ecocyc_records(spark, path)
    return records, explode_inter_records(records, output_promoter)
