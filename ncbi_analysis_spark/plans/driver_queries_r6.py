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


def ngram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style n-gram LM quality scoring, self-trained on the corpus
    (train on a reference corpus in production): char-trigram counts with
    min_count=2 (singletons are OOV), then per-document occurrence /
    OOV / probability-mass signals. Exactness: the shared denominator
    makes the probability mass an exact integer numerator over total
    (one final IEEE division, no ln, no float aggregation), so the
    DuckDB re-derivation hash-matches bit-for-bit."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.terms import char_ngram_lm, ngram_lm_score

    # the sf parquet is one file -> one input split; hash-spread the docs
    # so the 300x gram explode parallelizes (the operators stay pure: at
    # corpus scale the input is naturally multi-split and an extra
    # full-corpus shuffle would be wrong). The explicit numeric count is
    # required: a bare repartition(col) is AQE-coalesced back to one
    # partition on these few MB, re-serializing the explode
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    lm = char_ngram_lm(d, n=3, min_count=2)
    return ngram_lm_score(d, lm, n=3).orderBy("doc_id").select(
        "doc_id", "n_grams", "oov", "sum_prob", "mean_prob",
    )


NGRAM_LM_SQL = """
WITH g0 AS (
  SELECT doc_id, lower(text) AS tx,
         unnest(range(1, greatest(length(lower(text)) - 1, 1))) AS s
  FROM documents
),
g AS (SELECT doc_id, substr(tx, s::INT, 3) AS ngram FROM g0),
lm AS (
  SELECT ngram, COUNT(*)::BIGINT AS cnt FROM g GROUP BY 1
  HAVING COUNT(*) >= 2
),
tot AS (SELECT SUM(cnt)::BIGINT AS total FROM lm)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_grams,
       COUNT(*) FILTER (WHERE lm.cnt IS NULL)::BIGINT AS oov,
       COALESCE(SUM(lm.cnt), 0)::BIGINT::DOUBLE / ANY_VALUE(tot.total)::DOUBLE
         AS sum_prob,
       COALESCE(SUM(lm.cnt), 0)::BIGINT::DOUBLE / ANY_VALUE(tot.total)::DOUBLE
         / COUNT(*) AS mean_prob
FROM g LEFT JOIN lm USING (ngram) CROSS JOIN tot
GROUP BY doc_id
ORDER BY doc_id
"""


def queries_r6() -> dict:
    return {
        "flagship_windowed_scan": flagship_windowed_scan,
        "ngram_lm_quality": ngram_lm_quality,
    }


def oracle_sql_r6() -> dict[str, str]:
    from ncbi_analysis_spark.plans.driver_queries import FLAGSHIP_SQL

    return {
        "flagship_windowed_scan": FLAGSHIP_SQL,
        "ngram_lm_quality": NGRAM_LM_SQL,
    }
