"""Round-3b driver queries: the training-data pipeline widening —
sequence packing (concat-and-chunk), per-group quota sampling, TF-IDF
top terms, and embedding normalize/quantize. Each entry pairs the Spark
operator with an exact DuckDB re-derivation (integer / IEEE-identical
arithmetic only — see the determinism rules at the top of
driver_queries.py).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk into 128-token bins, 4 shards)
# ---------------------------------------------------------------------------


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing of the documents corpus into
    128-token training bins over 4 independent md5-sharded streams
    (operators/packing.py). Capacity is deliberately ≲ the mean doc
    length so the boundary-crossing fragment path is exercised on every
    shard."""
    from ncbi_analysis_spark.operators.packing import pack_fragments

    d = _t(spark, sf_dir, "documents")
    return pack_fragments(d, capacity=128, n_shards=4)


PACK_SQL = r"""
WITH base AS (
  SELECT doc_id,
         (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
               ELSE len(string_split_regex(TRIM(text), '\s+')) END)::BIGINT AS n_tokens,
         (('0x' || substr(md5('pack' || doc_id::VARCHAR), 1, 8))::BIGINT % 4)::INT AS shard,
         md5('pack|' || doc_id::VARCHAR) AS ord_
  FROM documents
),
nz AS (SELECT * FROM base WHERE n_tokens > 0),
stream AS (
  SELECT *, SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord_, doc_id
             ROWS UNBOUNDED PRECEDING)::BIGINT AS tok_end
  FROM nz
),
s2 AS (SELECT *, tok_end - n_tokens AS tok_start FROM stream),
frag AS (
  SELECT shard, doc_id, n_tokens, tok_start, tok_end, b.bin_id
  FROM s2, LATERAL (SELECT UNNEST(generate_series(tok_start // 128,
                                                  (tok_end - 1) // 128)) AS bin_id) b
)
SELECT shard, bin_id, doc_id, n_tokens,
       GREATEST(tok_start, bin_id * 128) - tok_start AS frag_start,
       LEAST(tok_end, (bin_id + 1) * 128) - tok_start AS frag_end,
       GREATEST(tok_start, bin_id * 128) - bin_id * 128 AS bin_off
FROM frag
"""


# ---------------------------------------------------------------------------
# Per-group quota sampling (domain balancing)
# ---------------------------------------------------------------------------


def quota_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quota cap: at most 10 documents per (lang, source)
    group, selected by md5(doc_id) order (operators/scale.py
    quota_sample) — the corpus-mixer domain-balancing step. Quota 10 is
    below the largest sf0.01 group (16), so the cap genuinely drops
    rows at every scale."""
    from ncbi_analysis_spark.operators.scale import quota_sample

    d = _t(spark, sf_dir, "documents")
    return quota_sample(d, ["lang", "source"], "doc_id", 10).select(
        "doc_id", "lang", "source"
    )


QUOTA_SQL = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY lang, source
           ORDER BY md5('quota|' || doc_id::VARCHAR), doc_id) AS rk
  FROM documents) WHERE rk <= 10
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------


def tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per document by smoothed rational
    TF-IDF (operators/terms.py; the log-free weight keeps the score an
    exactly-rounded int ratio on both engines)."""
    from ncbi_analysis_spark.operators.terms import tfidf_top_terms

    d = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(d, k=5)


TFIDF_SQL = r"""
WITH terms AS (
  SELECT doc_id, UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS term
  FROM documents
),
t2 AS (SELECT doc_id, term FROM terms WHERE term <> ''),
tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM t2 GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id)::BIGINT AS nd FROM documents),
sc AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         (tf.tf * (n.nd + 1))::DOUBLE / ((dfq.df + 1)::DOUBLE) AS score
  FROM tf JOIN dfq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, score, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY score DESC, term ASC) AS rk
  FROM sc) WHERE rk <= 5
"""


# ---------------------------------------------------------------------------
# Embedding normalize + int8 quantize
# ---------------------------------------------------------------------------


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding storage transforms: L2 norm, unit-normalization check
    (norm of the normalized vector), symmetric int8 quantization
    (functions/vectors.py). Arrays are projected to scalar columns
    (joined string + component sum) because the driver's value hash
    compares scalars."""
    from ncbi_analysis_spark.functions import vectors as V

    e = _t(spark, sf_dir, "embeddings")
    q = V.quantize_int8(F.col("embedding"))
    nv = V.l2_normalize(F.col("embedding"))
    return e.select(
        "vec_id",
        V.norm(F.col("embedding")).alias("norm"),
        V.norm(nv).alias("unit_norm"),
        F.concat_ws(",", F.transform(q, lambda x: x.cast("string"))).alias("q8"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q8_sum"),
    )


# Fold order mirrors functions/vectors.py exactly: dot = left fold over
# per-element double products (DuckDB list_reduce's first-element seed ==
# Spark's 0.0 seed because 0.0 + x == x); the quantize scale is computed
# ONCE as 127.0/max|x| then multiplied (x*(127/m), not x*127/m — the two
# round differently).
QUANT_SQL = r"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
d AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm,
         list_max(list_transform(v, x -> abs(x))) AS m
  FROM e
),
u AS (
  SELECT vec_id, v, nrm, m,
         CASE WHEN nrm = 0 THEN v
              ELSE list_transform(v, x -> x / nrm) END AS nv,
         CASE WHEN m = 0 THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> floor(x * (127.0 / m) + 0.5)::INT) END AS q
  FROM d
)
SELECT vec_id,
       nrm AS norm,
       sqrt(list_reduce(list_transform(nv, x -> x * x), (a, b) -> a + b)) AS unit_norm,
       array_to_string(q, ',') AS q8,
       list_reduce(list_prepend(0::BIGINT, list_transform(q, x -> x::BIGINT)),
                   (a, b) -> a + b) AS q8_sum
FROM u
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


def queries_r3b() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pack_sequences": pack_sequences,
        "quota_lang_source": quota_lang_source,
        "tfidf_terms": tfidf_terms,
        "embedding_quantize": embedding_quantize,
    }


def oracle_sql_r3b() -> dict[str, str]:
    return {
        "pack_sequences": PACK_SQL,
        "quota_lang_source": QUOTA_SQL,
        "tfidf_terms": TFIDF_SQL,
        "embedding_quantize": QUANT_SQL,
    }
