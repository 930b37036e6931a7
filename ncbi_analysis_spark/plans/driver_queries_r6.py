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


def flagship_windowed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flagship_similarity_scan re-run through the pre-split reader:
    the synthetic genome is emitted as 311-char window rows
    (split_genome_windows layout — no operator holds the full sequence)
    and scanned with similarity_scan_windowed. Same workload, same
    oracle as the single-row flagship."""
    from ncbi_analysis_spark.plans.driver_queries import (
        flagship_select,
        synthetic_genome_and_queries,
    )
    from ncbi_analysis_spark.plans.similarity_scan import (
        similarity_scan_windowed,
        split_genome_windows,
    )

    genome_df, queries_df = synthetic_genome_and_queries(spark, sf_dir)
    windows = split_genome_windows(genome_df, 311)
    return flagship_select(similarity_scan_windowed(
        windows, queries_df, {"direct": 1.0, "consistency": 2.0},
        top_k=10, candidate_distance=5, patience=2, chunk_size=1024,
    ))


def queries_r6() -> dict:
    return {
        "flagship_windowed_scan": flagship_windowed_scan,
    }


def oracle_sql_r6() -> dict[str, str]:
    from ncbi_analysis_spark.plans.driver_queries import FLAGSHIP_SQL

    return {
        "flagship_windowed_scan": FLAGSHIP_SQL,
    }
