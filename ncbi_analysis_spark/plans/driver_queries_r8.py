"""Round-8 driver-contract queries — STAGED, not yet wired into
``driver_queries._queries_in_build_order``.

Why staged: the driver's correctness gate records the first 50 registry
entries per round, and the round-7 gate's slots are taken by the 9
newly-registered round-7 queries plus the stalest rotation rows.
Registering another never-recorded query mid-round would bump a stale
row out of the round-7 gate. AT ROUND-8 START, wire these in: add
``**_r8().queries_r8(),`` / ``**_r8().oracle_sql_r8(),`` to the
build-order dicts in ``driver_queries`` (lazy ``_r8()`` import helper
like ``_r7()``'s), then re-run ``python scripts/check_oracle.py`` — the
rotation puts them at the front of the round-8 gate automatically.

Until then the entries below are held to the same bar out-of-band:
``tests/test_staged_r8.py`` replays each query against its DuckDB
oracle at sf0.001 with the driver's own canonicalization (sorted
columns, sorted rows, exact values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup (operators/dedup.py::
    remove_dup_spans, the Lee et al. 2022 transform): duplicated
    32-char windows at content-defined anchor positions (winnowing-
    style, offset-independent) are cut out of every document except the
    corpus-wide keeper; documents come back reassembled with per-doc
    removal counts. The rebuilt text is md5'd for a compact, still
    content-exact driver payload."""
    from ncbi_analysis_spark.operators.dedup import remove_dup_spans

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    out = remove_dup_spans(d, "text", "doc_id", window=32, min_docs=2)
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        "n_spans_removed",
        "n_chars_removed",
    )


DUP_SPAN_SQL = r"""
WITH d AS (SELECT doc_id, COALESCE(text, '') AS tx FROM documents),
w AS (
  SELECT doc_id, s::INT AS span_start, (s + 32)::INT AS span_end,
         md5(substr(tx, (s + 1)::INT, 32)) AS wh
  FROM (SELECT doc_id, tx,
               UNNEST(range(0, GREATEST(LENGTH(tx) - 32 + 1, 0))) AS s
        FROM d)
  WHERE substr(md5(substr(tx, (s + 1)::INT, 8)), 1, 1) = '0'),
dups AS (
  SELECT wh, MIN(doc_id) AS keeper
  FROM w GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2),
rem AS (
  SELECT w.doc_id, span_start, span_end
  FROM w JOIN dups USING (wh) WHERE w.doc_id <> dups.keeper),
marked AS (
  SELECT doc_id, span_start, span_end,
         CASE WHEN span_start <= MAX(span_end) OVER (
                PARTITION BY doc_id ORDER BY span_start, span_end
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS brk
  FROM rem),
isl AS (
  SELECT doc_id, span_start, span_end,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY span_start, span_end
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM marked),
mspans AS (
  SELECT doc_id, MIN(span_start) AS s, MAX(span_end) AS e
  FROM isl GROUP BY doc_id, g),
segs AS (
  SELECT doc_id,
         COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS ks,
         s AS ke
  FROM mspans),
reb AS (
  SELECT segs.doc_id,
         string_agg(substr(d.tx, ks + 1, ke - ks), '' ORDER BY ks) AS head
  FROM segs JOIN d USING (doc_id) GROUP BY segs.doc_id),
fin AS (
  SELECT doc_id, COUNT(*) AS n_spans, SUM(e - s) AS n_chars, MAX(e) AS last_e
  FROM mspans GROUP BY doc_id)
SELECT d.doc_id,
       md5(CASE WHEN fin.doc_id IS NULL THEN d.tx
                ELSE COALESCE(reb.head, '') || substr(d.tx, (fin.last_e + 1)::INT)
           END) AS text_md5,
       COALESCE(fin.n_spans, 0)::BIGINT AS n_spans_removed,
       COALESCE(fin.n_chars, 0)::BIGINT AS n_chars_removed
FROM d LEFT JOIN fin USING (doc_id) LEFT JOIN reb USING (doc_id)
"""


_QC_PARAMS = dict(n_buckets=1024, ngram_max=2)


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality classifier end-to-end (operators/terms.py::
    quality_classifier_weights + quality_probability; Joulin et al.
    2016): a hashed-bigram logistic model trained English-vs-rest in
    driver numpy from two bounded 1024-bucket count vectors, then every
    document scored with its calibrated target probability. The oracle
    twin re-runs the identical ``_logistic_fit`` on identical counts, so
    the weight literals — and the bucket-ordered score fold — match
    bit-exactly."""
    from ncbi_analysis_spark.operators.terms import (
        quality_classifier_weights,
        quality_probability,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = d.filter(F.col("lang") == "en")
    nontarget = d.filter(F.col("lang") != "en")
    w, bias = quality_classifier_weights(
        target, nontarget, "text", "doc_id", **_QC_PARAMS)
    return quality_probability(d, "text", "doc_id", w, bias, **_QC_PARAMS)


def _qc_sql() -> str:
    """Generated oracle: weight/bias literals re-derived Spark-free by
    quality_classifier_local (same numpy fit, same counts), features via
    the engine-mirrored tokenizer/md5-bucket idioms (dsir's), the
    bucket-ordered fold mean-pooled, then the sigmoid."""
    from ncbi_analysis_spark.operators.terms import quality_classifier_local
    from ncbi_analysis_spark.plans.driver_queries_r5 import (
        _dlit,
        _oracle_sf_dir,
    )

    W, bias = quality_classifier_local(
        f"{_oracle_sf_dir()}/documents.parquet",
        target_pred=lambda r: r["lang"] == "en",
        **_QC_PARAMS,
    )
    rows = ",\n  ".join(f"({b}, {_dlit(w)})" for b, w in W)
    B = _QC_PARAMS["n_buckets"]
    blit = _dlit(bias)
    return rf"""
WITH tk AS (SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t
            FROM documents),
f1 AS (SELECT doc_id, UNNEST(t) AS g FROM tk),
f2 AS (SELECT doc_id,
              UNNEST(list_transform(range(GREATEST(len(t) - 2, 0) + 1),
                     i -> array_to_string(t[i+1:i+2], ' '))) AS g
       FROM tk),
feats AS (
  SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % {B} AS bucket
  FROM (SELECT * FROM f1 UNION ALL SELECT * FROM f2)
),
per AS (SELECT doc_id, bucket, COUNT(*)::BIGINT AS c
        FROM feats GROUP BY doc_id, bucket),
w AS (SELECT * FROM (VALUES
  {rows}
) AS t(bucket, w)),
j AS (SELECT doc_id, bucket, c, c * w AS term FROM per JOIN w USING (bucket)),
folded AS (
  SELECT doc_id, SUM(c)::BIGINT AS n_feats,
         ({blit}) + list_reduce(
           list_prepend(0.0::DOUBLE,
             list_transform(list_sort(list({{'b': bucket, 't': term}})),
                            s -> s.t)),
           (a, b) -> a + b) / SUM(c) AS logit
  FROM j GROUP BY doc_id)
SELECT doc_id, n_feats, ROUND(logit, 6) AS logit,
       ROUND(1.0 / (1.0 + exp(-logit)), 6) AS prob
FROM folded
"""


def queries_r8() -> dict:
    return {
        "dup_span_removal": dup_span_removal,
        "quality_classifier": quality_classifier,
    }


def oracle_sql_r8() -> dict[str, str]:
    return {
        "dup_span_removal": DUP_SPAN_SQL,
        "quality_classifier": _qc_sql(),
    }
