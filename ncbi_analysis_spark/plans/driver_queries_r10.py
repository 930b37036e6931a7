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


def queries_r10() -> dict:
    return {
        "image_phash_near_dup": image_phash_near_dup,
    }


def oracle_sql_r10() -> dict[str, str]:
    return {
        "image_phash_near_dup": _PHASH_NEAR_DUP_SQL,
    }
