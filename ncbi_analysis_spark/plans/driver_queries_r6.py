"""Round-6 driver-contract queries.

New operators through the exact-match gate this round:

- ``flagship_windowed_scan`` — the windowed pre-split scan path
  (plans/similarity_scan.py::similarity_scan_windowed, the giant-
  accession reader from the round-5 verdict ask #3) over the SAME
  synthetic genome as ``flagship_similarity_scan``. Results must be
  identical to the single-row path, so it shares FLAGSHIP_SQL — the
  full DuckDB re-derivation of scoring, suppression, top-k and
  coordinate mapping — as its oracle. A drift between the pre-split
  chunk assembly and the single-string path hash-mismatches here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def flagship_windowed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flagship_similarity_scan re-run through the pre-split reader:
    the synthetic genome is emitted as 311-char window rows
    (split_genome_windows layout — no operator holds the full sequence)
    and scanned with similarity_scan_windowed. Same oracle as the
    single-row flagship."""
    from ncbi_analysis_spark.plans.similarity_scan import (
        similarity_scan_windowed,
        split_genome_windows,
    )

    d = _t(spark, sf_dir, "documents")
    base = F.translate(F.md5(F.col("text")), "0123456789abcdef", "acgtacgtacgtacgt")
    parts = d.filter(F.col("doc_id") < 200).select(
        F.struct(F.col("doc_id"), base.alias("h")).alias("s")
    )
    genome_df = parts.agg(
        F.concat_ws(
            "",
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s["h"]),
        ).alias("seq")
    ).select(F.lit("synthetic").alias("accession"), "seq")
    queries_df = d.filter(F.col("doc_id") < 2).select(
        F.concat(F.lit("q"), F.col("doc_id")).alias("name"),
        F.substring(base, 1, 12).alias("gene"),
    )
    windows = split_genome_windows(genome_df, 311)
    return similarity_scan_windowed(
        windows, queries_df, {"direct": 1.0, "consistency": 2.0},
        top_k=10, candidate_distance=5, patience=2, chunk_size=1024,
    ).select(
        "name", "accession", "strand", "offset",
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("end"),
        "weighted_similarity",
        F.col("rk").cast("long").alias("rk"),
    )


def queries_r6() -> dict:
    return {
        "flagship_windowed_scan": flagship_windowed_scan,
    }


def oracle_sql_r6() -> dict[str, str]:
    from ncbi_analysis_spark.plans.driver_queries import FLAGSHIP_SQL

    return {
        "flagship_windowed_scan": FLAGSHIP_SQL,
    }
