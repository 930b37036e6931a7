"""Round-10 staged driver queries.

New operators built in round 9 stage here (the ``--staged`` leg of
``scripts/check_oracle.py`` and the ahead-of-registration bench loop in
``bench.py``) and get wired into the main driver gate at round-10 start
— the standing one-round staging pattern (see driver_queries_r9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup end-to-end
    (operators/multimodal.py::phash_near_dup): documents' bytes as
    opaque image payloads -> md5-stub perceptual hash (real decoder is
    a drop-in), plant re-encode variants (hash xor a 2-bit mask — inside
    the radius) and heavier-edit variants (4-bit mask — outside), then
    pair via Hamming-band LSH with exact bit_count(xor) verification.

    The oracle is deliberately a DIFFERENT algorithm: brute-force
    all-pairs in DuckDB. Exact-match therefore proves the pigeonhole
    banding loses no pair within the radius (recall exactly 1.0), not
    just that two implementations of the same plan agree."""
    from ncbi_analysis_spark.operators import multimodal as mm
    from ncbi_analysis_spark.operators.multimodal import phash_near_dup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("data"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit("png").alias("format"),
        ).alias("meta"),
    )
    feats = mm.image_features(media).select("media_id", "phash64")
    near = feats.filter(F.col("media_id") % 10 == 0).select(
        (F.col("media_id") + 1_000_000).alias("media_id"),
        F.col("phash64").bitwiseXOR(F.lit(5)).alias("phash64"),
    )
    far = feats.filter(F.col("media_id") % 7 == 0).select(
        (F.col("media_id") + 2_000_000).alias("media_id"),
        F.col("phash64").bitwiseXOR(F.lit(120)).alias("phash64"),
    )
    corpus = feats.unionByName(near).unionByName(far)
    return phash_near_dup(corpus, max_hamming=3, max_band_freq=10_000)


_PHASH_NEAR_DUP_SQL = """
WITH hx AS (SELECT doc_id AS media_id, md5(text) AS hx FROM documents),
h AS (
  SELECT media_id,
    (CASE WHEN ('0x' || substr(hx, 1, 16))::UBIGINT >= 9223372036854775808::UBIGINT
          THEN (('0x' || substr(hx, 1, 16))::UBIGINT - 9223372036854775808::UBIGINT)::BIGINT
               - 9223372036854775807 - 1
          ELSE ('0x' || substr(hx, 1, 16))::UBIGINT::BIGINT END) AS ph
  FROM hx
),
corpus AS (
  SELECT media_id, ph FROM h
  UNION ALL
  SELECT media_id + 1000000, xor(ph, 5::BIGINT) FROM h WHERE media_id % 10 = 0
  UNION ALL
  SELECT media_id + 2000000, xor(ph, 120::BIGINT) FROM h WHERE media_id % 7 = 0
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       bit_count(xor(a.ph, b.ph))::BIGINT AS hamming
FROM corpus a JOIN corpus b ON a.media_id < b.media_id
WHERE bit_count(xor(a.ph, b.ph)) <= 3
"""


def source_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation (operators/domains.py — the C4 §2.2 /
    RefinedWeb §3 provenance gate): per-source health report over the
    corpus with exact-duplicate mass planted (every %17 doc re-ingested
    under a shifted id, same source — the mirror-site signature), then
    the ``derive_source_blocklist`` membership as a ``blocked`` flag.
    The thresholds are chosen to split the synthetic sources so both
    branches of the gate are exercised.

    Scale shape: one map-side projection + one source-keyed aggregate;
    the report is source-cardinality-sized and the blocklist joins back
    broadcast."""
    from ncbi_analysis_spark.operators.domains import (
        derive_source_blocklist,
        source_quality_report,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = d.select("doc_id", "source", "text")
    planted = base.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "source", "text")
    corpus = base.unionByName(planted)
    rep = source_quality_report(corpus)
    bl = derive_source_blocklist(
        rep, max_dup_frac=0.055, min_mean_quality=0.78,
        max_repetitive_frac=0.55,
    ).withColumn("blocked", F.lit(1).cast("long"))
    return (
        rep.join(bl, "source", "left")
        .withColumn("blocked", F.coalesce(F.col("blocked"), F.lit(0).cast("long")))
    )


def _source_report_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries import (
        _LTOKS,
        _text_stats_sql,  # noqa: F401 — formula provenance, see below
    )

    stop = "['the', 'of', 'and', 'to', 'a', 'in', 'is', 'that', 'it', 'for']"
    alpha = ("(CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE "
             "LENGTH(regexp_replace(LOWER(text), '[^a-z ]', '', 'g'))"
             " / LENGTH(text) END)")
    stopr = (f"(CASE WHEN len({_LTOKS}) = 0 THEN 0.0 ELSE "
             f"len(list_filter({_LTOKS}, t -> list_contains({stop}, t)))"
             f" / len({_LTOKS}) END)")
    tokc = ("(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE "
            "len(string_split_regex(TRIM(text), '\\s+')) END)")
    quality = (f"(0.4 * LEAST(1.0, {tokc}::DOUBLE / 64.0) + 0.3 * {alpha} "
               f"+ 0.3 * (1.0 - ABS({stopr} - 0.4)))")
    dupw = ("(CASE WHEN len(ws) <= 0 THEN 0.0 ELSE "
            "1.0 - len(list_distinct(ws)) * 1.0 / len(ws) END)")
    return f"""
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, source, text FROM documents WHERE doc_id % 17 = 0
),
per AS (
  SELECT source,
    md5(regexp_replace(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS digest,
    LENGTH(text)::BIGINT AS chars,
    ROUND({quality}, 6)::DECIMAL(18,6) AS q,
    (CASE WHEN {dupw} > 0.5 THEN 1 ELSE 0 END)::BIGINT AS rep
  FROM (SELECT *, list_filter(string_split(trim(text), ' '), x -> x <> '') AS ws
        FROM corpus)
),
report AS (
  SELECT source,
    COUNT(*)::BIGINT AS n_docs,
    SUM(chars)::BIGINT AS total_chars,
    ROUND(1.0 - COUNT(DISTINCT digest) * 1.0 / COUNT(*), 6) AS dup_frac,
    ROUND(SUM(q)::DOUBLE / COUNT(*), 6) AS mean_quality,
    ROUND(SUM(rep) * 1.0 / COUNT(*), 6) AS repetitive_frac
  FROM per GROUP BY source
)
SELECT *,
  (CASE WHEN dup_frac > 0.055 OR mean_quality < 0.78
          OR repetitive_frac > 0.55
        THEN 1 ELSE 0 END)::BIGINT AS blocked
FROM report
"""


def queries_r10() -> dict:
    return {
        "image_phash_near_dup": image_phash_near_dup,
        "source_curation_report": source_curation_report,
    }


def oracle_sql_r10() -> dict[str, str]:
    return {
        "image_phash_near_dup": _PHASH_NEAR_DUP_SQL,
        "source_curation_report": _source_report_sql(),
    }
