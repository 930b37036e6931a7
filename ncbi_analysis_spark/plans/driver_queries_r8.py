"""Round-8 driver-contract queries — WIRED into
``driver_queries._queries_in_build_order`` at round-8 start (the
staged-query gate pattern: built and oracle-verified in round 7,
registered first thing in round 8 so the rotation puts the
never-recorded entries at the front of the round-8 driver gate).

``tests/test_staged_r8.py`` additionally replays each query against
its DuckDB oracle at sf0.001 with the driver's own canonicalization
(sorted columns, sorted rows, exact values).
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


def _qc_weight_rows() -> tuple[str, str]:
    """(VALUES body, bias literal) from the Spark-free twin — shared by
    the quality_classifier and curation_v3 oracles. Trained on the
    ORIGINAL corpus (English-vs-rest), exactly like the Spark queries."""
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
    return ",\n  ".join(f"({b}, {_dlit(w)})" for b, w in W), _dlit(bias)


def _qc_sql() -> str:
    """Generated oracle: weight/bias literals re-derived Spark-free by
    quality_classifier_local (same numpy fit, same counts), features via
    the engine-mirrored tokenizer/md5-bucket idioms (dsir's), the
    bucket-ordered fold mean-pooled, then the sigmoid."""
    rows, blit = _qc_weight_rows()
    B = _QC_PARAMS["n_buckets"]
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


def curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation pipeline v3 — the round-7 operator family composed as
    ONE DataFrame: fuzzy decontamination (drop corpus docs MinHash-LSH-
    colliding with the held-out bench split) → span-level exact-
    substring scrub (remove_dup_spans: duplicated passages cut from
    non-keepers) → trained-quality-classifier filter (English-vs-rest
    logistic model on the ORIGINAL corpus, scored on the SCRUBBED text,
    keep prob ≥ 0.5) → 48-token chunking. Output: one row per surviving
    chunk with its calibrated probability; chunk text md5'd (compact,
    content-exact).

    Scale: each stage is the already-verified operator; the composition
    adds two doc-keyed joins (anti for decon, inner for scores) and
    nothing driver-side beyond the classifier's two bounded bucket
    vectors."""
    from ncbi_analysis_spark.operators.dedup import (
        fuzzy_decon_pairs,
        remove_dup_spans,
    )
    from ncbi_analysis_spark.operators.packing import chunk_documents
    from ncbi_analysis_spark.operators.terms import (
        quality_classifier_weights,
        quality_probability,
    )
    from ncbi_analysis_spark.operators.topk import global_topk

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    bench = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    flagged = fuzzy_decon_pairs(
        corpus, bench, "text", "doc_id", bench_id_col="bench_id",
        num_perm=4, bands=2,
    ).select("doc_id").distinct()
    clean = corpus.select("doc_id", "text").join(flagged, "doc_id", "left_anti")
    # persist: the scrubbed lineage (decon + span scrub, the two
    # priciest stages) feeds TWO SEPARATE JOBS — the bounded top-250
    # collect below, then the final chunk job after return — and
    # ReusedExchange only deduplicates subtrees within one job (the
    # plans/curation.py finding doesn't apply across jobs; measured
    # 13.4s -> 8.5s min-of-3 at sf0.1). The cache is doc-scale text,
    # MBs; the collect below materializes it before return, and the
    # blocks are LRU-evicted with the session — no unpersist, because
    # the caller consumes the returned frame lazily.
    scrubbed = remove_dup_spans(clean, "text", "doc_id", window=32).select(
        "doc_id", "text"
    ).persist()
    w, bias = quality_classifier_weights(
        d.filter(F.col("lang") == "en"), d.filter(F.col("lang") != "en"),
        "text", "doc_id", **_QC_PARAMS)
    scored = quality_probability(
        scrubbed, "text", "doc_id", w, bias, **_QC_PARAMS)
    # materialize the bounded top-250 through the driver (the weights
    # table's bounded-collect pattern): joining the ranked table back to
    # the frame it derives from is an ambiguous self-join, which Spark
    # silently resolved to a trivially-true condition here (observed:
    # 250 arbitrary left-right pairings, probs from unrelated docs).
    # Two independent local relations from the same collected rows give
    # the two downstream joins zero shared lineage — and a broadcast.
    top_rows = [(r["doc_id"], r["prob"]) for r in global_topk(
        scored.select("doc_id", "prob"),
        [F.desc("prob"), F.asc("doc_id")], 250).collect()]
    schema = "doc_id bigint, prob double"
    kept = scrubbed.join(
        F.broadcast(spark.createDataFrame(top_rows, schema)), "doc_id")
    chunks = chunk_documents(
        kept.select("doc_id", "text"), "text", "doc_id",
        max_tokens=48, stride=48)
    return chunks.join(
        F.broadcast(spark.createDataFrame(top_rows, schema)), "doc_id"
    ).select(
        "doc_id", "chunk_no",
        F.md5("chunk_text").alias("chunk_md5"), "n_tokens", "prob",
    )


def _curation_v3_sql() -> str:
    """Composed oracle: the fuzzy-decon band-collision CTEs (r7's
    mirror), the dup-span islands CTEs rebuilding the scrubbed text, the
    classifier feature/fold/sigmoid CTEs over the SCRUBBED text with the
    shared weight literals, the rank-based top-250 keep, and the chunk explode —
    each the already-verified mirror of its operator."""
    from ncbi_analysis_spark.plans.driver_queries import _SHINGLES_SQL

    rows, blit = _qc_weight_rows()
    B = _QC_PARAMS["n_buckets"]
    band_rows = """
  SELECT doc_id, 0 AS band, md5(mh0 || ',' || mh1) AS bh FROM MM
  UNION ALL
  SELECT doc_id, 1 AS band, md5(mh2 || ',' || mh3) AS bh FROM MM"""
    mh = """
  SELECT doc_id,
        list_aggregate(list_transform(sh, x -> md5('0|' || x)), 'min') AS mh0,
        list_aggregate(list_transform(sh, x -> md5('1|' || x)), 'min') AS mh1,
        list_aggregate(list_transform(sh, x -> md5('2|' || x)), 'min') AS mh2,
        list_aggregate(list_transform(sh, x -> md5('3|' || x)), 'min') AS mh3
  FROM SHG"""
    return rf"""
WITH csh AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents
             WHERE doc_id % 7 <> 0),
cm AS ({mh.replace('SHG', 'csh')}),
cb AS ({band_rows.replace('MM', 'cm')}),
bsh AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents
        WHERE doc_id % 7 = 0),
bm AS ({mh.replace('SHG', 'bsh')}),
bb AS (SELECT DISTINCT band, bh
       FROM ({band_rows.replace('MM', 'bm')})),
flagged AS (SELECT DISTINCT c.doc_id
            FROM cb c JOIN bb b ON c.band = b.band AND c.bh = b.bh),
d AS (SELECT doc_id, COALESCE(text, '') AS tx FROM documents
      WHERE doc_id % 7 <> 0 AND doc_id NOT IN (SELECT doc_id FROM flagged)),
w0 AS (
  SELECT doc_id, s::INT AS span_start, (s + 32)::INT AS span_end,
         md5(substr(tx, (s + 1)::INT, 32)) AS wh
  FROM (SELECT doc_id, tx,
               UNNEST(range(0, GREATEST(LENGTH(tx) - 32 + 1, 0))) AS s
        FROM d)
  WHERE substr(md5(substr(tx, (s + 1)::INT, 8)), 1, 1) = '0'),
dups AS (
  SELECT wh, MIN(doc_id) AS keeper
  FROM w0 GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2),
rem AS (
  SELECT w0.doc_id, span_start, span_end
  FROM w0 JOIN dups USING (wh) WHERE w0.doc_id <> dups.keeper),
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
  SELECT doc_id, MAX(e) AS last_e FROM mspans GROUP BY doc_id),
scrub AS (
  SELECT d.doc_id,
         CASE WHEN fin.doc_id IS NULL THEN d.tx
              ELSE COALESCE(reb.head, '') || substr(d.tx, (fin.last_e + 1)::INT)
         END AS tx
  FROM d LEFT JOIN fin USING (doc_id) LEFT JOIN reb USING (doc_id)),
tk AS (SELECT doc_id, string_split_regex(TRIM(tx), '\s+') AS t FROM scrub),
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
wt AS (SELECT * FROM (VALUES
  {rows}
) AS t(bucket, w)),
j AS (SELECT doc_id, bucket, c, c * w AS term FROM per JOIN wt USING (bucket)),
folded AS (
  SELECT doc_id, SUM(c)::BIGINT AS n_feats,
         ({blit}) + list_reduce(
           list_prepend(0.0::DOUBLE,
             list_transform(list_sort(list({{'b': bucket, 't': term}})),
                            s -> s.t)),
           (a, b) -> a + b) / SUM(c) AS logit
  FROM j GROUP BY doc_id),
kept AS (
  SELECT doc_id, ROUND(1.0 / (1.0 + exp(-logit)), 6) AS prob
  FROM folded
  ORDER BY prob DESC, doc_id LIMIT 250),
ctk AS (
  SELECT scrub.doc_id, prob,
         string_split_regex(TRIM(tx), '\s+') AS t,
         CASE WHEN LENGTH(TRIM(tx)) = 0 THEN 0
              ELSE len(string_split_regex(TRIM(tx), '\s+'))
         END AS n
  FROM scrub JOIN kept USING (doc_id)),
cex AS (SELECT doc_id, prob, t, n,
               UNNEST(range(0, GREATEST(CAST(ceil((n - 48) / 48.0) AS BIGINT) * 48,
                                        0) + 1, 48)) AS s
        FROM ctk)
SELECT doc_id, (s / 48)::BIGINT AS chunk_no,
       md5(array_to_string(t[s+1:s+48], ' ')) AS chunk_md5,
       (CASE WHEN n = 0 THEN 0 ELSE LEAST(48, n - s) END)::BIGINT AS n_tokens,
       prob
FROM cex
"""


def decon_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination (operators/dedup.py::
    remove_bench_spans): every anchored 32-char window of a corpus
    document whose content also appears in the held-out benchmark split
    (doc_id % 7) is cut out and the document reassembled — the
    passage-granularity alternative to dropping whole contaminated
    documents. Rebuilt text md5'd for the driver payload."""
    from ncbi_analysis_spark.operators.dedup import remove_bench_spans

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    out = remove_bench_spans(corpus, bench, "text", "doc_id", window=32)
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        "n_spans_removed",
        "n_chars_removed",
    )


DECON_SPAN_SQL = r"""
WITH d AS (SELECT doc_id, COALESCE(text, '') AS tx FROM documents
           WHERE doc_id % 7 <> 0),
b AS (SELECT doc_id, COALESCE(text, '') AS tx FROM documents
      WHERE doc_id % 7 = 0),
w AS (
  SELECT doc_id, s::INT AS span_start, (s + 32)::INT AS span_end,
         md5(substr(tx, (s + 1)::INT, 32)) AS wh
  FROM (SELECT doc_id, tx,
               UNNEST(range(0, GREATEST(LENGTH(tx) - 32 + 1, 0))) AS s
        FROM d)
  WHERE substr(md5(substr(tx, (s + 1)::INT, 8)), 1, 1) = '0'),
bw AS (
  SELECT DISTINCT md5(substr(tx, (s + 1)::INT, 32)) AS wh
  FROM (SELECT tx,
               UNNEST(range(0, GREATEST(LENGTH(tx) - 32 + 1, 0))) AS s
        FROM b)
  WHERE substr(md5(substr(tx, (s + 1)::INT, 8)), 1, 1) = '0'),
rem AS (
  SELECT w.doc_id, span_start, span_end FROM w SEMI JOIN bw USING (wh)),
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


_stream_q_seq = 0


def stream_fuzzy_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming fuzzy decontamination (streaming/events.py::
    fuzzy_decon_stream) through the gate: the document corpus streamed
    file-source style, band-colliding docs against the held-out %7
    benchmark split emitted in keep='flagged' audit mode. The stateless
    expression-form band hashes must reproduce the batch aggregate
    form's digests exactly, so the oracle is the r7 fuzzy_decon SQL's
    distinct corpus side (num_perm=4/bands=2, the oracle-parity
    sizes)."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.streaming.events import (
        fuzzy_decon_stream,
        run_to_memory,
    )

    global _stream_q_seq
    _stream_q_seq += 1
    name = f"drv_stream_fdecon_{_stream_q_seq}"

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    tmp = tempfile.mkdtemp(prefix="stream_fdecon_")
    try:
        stage = f"{tmp}/stage"
        # stage as MANY files: the file source assigns one task per
        # file, and the per-row HOF expressions are interpreted (no
        # codegen for lambdas) — a coalesce(1) stage serializes the
        # whole microbatch onto one core (measured 22s -> 3s at sf0.1);
        # a post-source repartition can't fix it because the filter is
        # pushed below the exchange
        corpus.repartition(16).write.parquet(stage)
        src = f"{tmp}/src"
        import glob as _glob
        import os as _os

        _os.makedirs(src)
        for _i, _p in enumerate(sorted(_glob.glob(f"{stage}/part-*.parquet"))):
            shutil.copy(_p, f"{src}/docs{_i}.parquet")
        stream = spark.readStream.schema(corpus.schema).parquet(src)
        out = fuzzy_decon_stream(stream, bench, "text",
                                 num_perm=4, bands=2, keep="flagged")
        run_to_memory(out.select("doc_id"), name, timeout_s=300)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(name)


def _stream_fuzzy_decon_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r7 import _fuzzy_decon_sql

    return f"SELECT DISTINCT doc_id FROM ({_fuzzy_decon_sql()}) pairs"


def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-quality-gate scoring in-flight (streaming/events.py::
    quality_score_stream) through the gate: the classifier trained in
    batch (English-vs-rest, the quality_classifier query's model), every
    streamed document scored statelessly per row. The oracle replays the
    STREAM's own fold — terms in feature order (unigrams then bigrams,
    document order), left-to-right list_reduce, weight lookups in an
    ARRAY literal — so the doubles are bit-identical, not merely
    close."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.operators.terms import quality_classifier_weights
    from ncbi_analysis_spark.streaming.events import (
        quality_score_stream,
        run_to_memory,
    )

    global _stream_q_seq
    _stream_q_seq += 1
    name = f"drv_stream_qgate_{_stream_q_seq}"

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w, bias = quality_classifier_weights(
        d.filter(F.col("lang") == "en"), d.filter(F.col("lang") != "en"),
        "text", "doc_id", **_QC_PARAMS)
    docs = d.select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="stream_qgate_")
    try:
        stage = f"{tmp}/stage"
        # many-file staging for per-file task parallelism (see
        # stream_fuzzy_decon's note)
        docs.repartition(16).write.parquet(stage)
        src = f"{tmp}/src"
        import glob as _glob
        import os as _os

        _os.makedirs(src)
        for _i, _p in enumerate(sorted(_glob.glob(f"{stage}/part-*.parquet"))):
            shutil.copy(_p, f"{src}/docs{_i}.parquet")
        stream = spark.readStream.schema(docs.schema).parquet(src)
        out = quality_score_stream(stream, w, bias, "text", **_QC_PARAMS)
        run_to_memory(out.select("doc_id", "n_feats", "prob"), name,
                      timeout_s=300)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(name)


def _stream_quality_gate_sql() -> str:
    """Stream-fold mirror: the weight ARRAY literal indexed per gram
    occurrence, folded left-to-right in the stream's own feature order."""
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
    warr = ", ".join(_dlit(w) for _, w in W)
    B = _QC_PARAMS["n_buckets"]
    blit = _dlit(bias)
    return rf"""
WITH tk AS (SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t
            FROM documents),
g AS (
  SELECT doc_id,
         t || (CASE WHEN len(t) >= 2
               THEN list_transform(range(len(t) - 1),
                    i -> array_to_string(t[i+1:i+2], ' '))
               ELSE [array_to_string(t, ' ')] END) AS grams
  FROM tk),
warr AS (SELECT [{warr}]::DOUBLE[] AS w),
scored AS (
  SELECT doc_id, len(grams)::BIGINT AS n_feats,
         ({blit}) + list_reduce(
           list_prepend(0.0::DOUBLE,
             list_transform(grams,
               x -> w[(('0x' || substr(md5(x), 1, 8))::BIGINT % {B} + 1)::INT])),
           (a, b) -> a + b) / len(grams) AS logit
  FROM g, warr)
SELECT doc_id, n_feats,
       ROUND(1.0 / (1.0 + exp(-logit)), 6) AS prob
FROM scored
"""


def epoch_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-with-replacement mixture materialization
    (operators/scale.py::temperature_quotas(cap_at_group_size=False) +
    epoch_materialize): the mT5 temperature rule with a total ABOVE the
    corpus size, so low-resource languages repeat for multiple epochs —
    each document emitted floor(target/n) times plus one more for the
    first target%n docs in md5 order, with a 1-based ``epoch`` index.
    The oracle re-derives the uncapped apportionment and the repeat
    explode relationally (generate_series)."""
    from ncbi_analysis_spark.operators.scale import (
        epoch_materialize,
        temperature_quotas,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = temperature_quotas(
        d, ["lang"], total=12000, alpha=0.5, cap_at_group_size=False
    )
    return epoch_materialize(d, q, ["lang"], "doc_id").select(
        "doc_id", "lang", "epoch"
    )


EPOCH_MIXTURE_SQL = """
WITH g AS (SELECT lang, COUNT(*)::BIGINT AS n_rows FROM documents GROUP BY lang),
w AS (SELECT lang, n_rows, sqrt(n_rows::DOUBLE) AS wv FROM g),
tot AS (SELECT list_reduce(
          list_prepend(0.0::DOUBLE,
            list_transform(list_sort(list({'l': lang, 'w': wv})), s -> s.w)),
          (a, b) -> a + b) AS tw FROM w),
s AS (SELECT lang, n_rows, wv / tw * 12000.0 AS share FROM w, tot),
f AS (SELECT lang, n_rows, share, FLOOR(share)::BIGINT AS fl FROM s),
sp AS (SELECT list_reduce(
         list_prepend(0::BIGINT,
           list_transform(list_sort(list({'l': lang, 'f': fl})), s -> s.f)),
         (a, b) -> a + b) AS spent FROM f),
r AS (SELECT lang, n_rows, fl,
             ROW_NUMBER() OVER (ORDER BY share - fl DESC, lang) AS rk,
             12000 - sp.spent AS leftn
      FROM f, sp),
qt AS (SELECT lang, n_rows,
              (fl + CASE WHEN rk <= leftn THEN 1 ELSE 0 END)::BIGINT AS quota
       FROM r),
rk2 AS (SELECT d.doc_id, d.lang, qt.quota, qt.n_rows,
               ROW_NUMBER() OVER (PARTITION BY d.lang
                 ORDER BY md5('quota|' || d.doc_id::VARCHAR), d.doc_id) AS erk
        FROM documents d JOIN qt USING (lang)),
ep AS (SELECT doc_id, lang,
              (FLOOR(quota::DOUBLE / n_rows::DOUBLE)::BIGINT
               + CASE WHEN erk <= quota % n_rows THEN 1 ELSE 0 END) AS n_ep
       FROM rk2)
SELECT doc_id, lang, UNNEST(range(1, n_ep + 1))::BIGINT AS epoch
FROM ep
"""


def rag_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered-ANN retrieval — the RAG serving shape: a metadata
    PRE-filter (lang + length over the documents table) restricts the
    searchable corpus BEFORE the IVF bucket prune, so top-k is computed
    over eligible rows only (pre-filter semantics: k survivors
    guaranteed eligible, unlike post-filtering a larger top-k), and the
    hits come back joined to their document metadata. Composition of
    individually-oracled pieces: broadcast dimension filter +
    similarity_search.ivf_topk + a return-metadata join."""
    from ncbi_analysis_spark.operators.similarity_search import ivf_topk

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    eligible = d.filter(
        (F.col("lang") == "en") & (F.col("n_chars") >= 200)
    ).select(F.col("doc_id").alias("vec_id"), "source")
    corpus = e.join(F.broadcast(eligible.select("vec_id")), "vec_id")
    q = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    out = ivf_topk(corpus, q, cents, k=5, nprobe=2)
    return (
        out.withColumn("rk", F.col("rk").cast("long"))
        .join(F.broadcast(eligible), "vec_id")
        .select("q_id", "vec_id", "cos_sim", "rk", "source")
    )


def _rag_retrieval_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries import _DOT, _cos_sql

    return f"""
WITH elig AS (SELECT doc_id AS vec_id, source FROM documents
              WHERE lang = 'en' AND n_chars >= 200),
cent AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
corpus AS (SELECT e.vec_id, e.embedding AS v
           FROM embeddings e JOIN elig USING (vec_id)),
q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 16),
assign0 AS (
  SELECT c.vec_id, c.v, ct.c_id,
         (CASE WHEN sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) = 0 THEN 0.0
               ELSE {_DOT.format(a='c.v', b='ct.cv')}
                    / sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) END) AS sim
  FROM corpus c CROSS JOIN cent ct
),
assign AS (SELECT vec_id, v, c_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_id) AS rn FROM assign0
) WHERE rn = 1),
probe0 AS (
  SELECT q.q_id, q.qv, ct.c_id, {_cos_sql('q.qv', 'ct.cv')} AS sim
  FROM q CROSS JOIN cent ct
),
probes AS (SELECT q_id, qv, c_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn FROM probe0
) WHERE rn <= 2),
scored AS (
  SELECT p.q_id, a.vec_id, ROUND({_cos_sql('p.qv', 'a.v')}, 6) AS cos_sim
  FROM probes p JOIN assign a USING (c_id)
)
SELECT q_id, vec_id, cos_sim, rk, source FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id)::BIGINT AS rk
  FROM scored
) r JOIN elig USING (vec_id) WHERE rk <= 5
"""


def quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide quantile quality gate (operators/scale.py::
    filter_by_quantile): keep the documents scoring at or above the
    exact discrete p75 of the composite quality score — "keep the top
    quarter of the corpus by quality", the percentile-thresholded
    filtering step of a curation stack. Threshold = value at row
    ceil(0.75*n) of the sorted score distribution (corpus_profile's
    integer-index convention, no interpolation floats); ties at the
    threshold all survive. The oracle re-derives the distinct-score
    cumulative scan relationally."""
    from ncbi_analysis_spark.functions import text as textf
    from ncbi_analysis_spark.operators.scale import filter_by_quantile

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.col("text")
    scored = d.select(
        "doc_id",
        F.round(
            textf.quality_score(t, textf.tokens(F.lower(t))), 6
        ).alias("quality"),
    )
    return filter_by_quantile(scored, "quality", q=0.75)


def _quality_quantile_sql() -> str:
    from ncbi_analysis_spark.functions import text as textf
    from ncbi_analysis_spark.plans.driver_queries import _LTOKS, _TOKS

    stop = "[" + ", ".join(f"'{w}'" for w in textf.EN_STOPWORDS) + "]"
    alpha = ("(CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE "
             "LENGTH(regexp_replace(LOWER(text), '[^a-z ]', '', 'g')) / LENGTH(text) END)")
    stopr = (f"(CASE WHEN len({_LTOKS}) = 0 THEN 0.0 ELSE "
             f"len(list_filter({_LTOKS}, t -> list_contains({stop}, t))) / len({_LTOKS}) END)")
    tokc = f"(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE len({_TOKS}) END)"
    quality = (f"(0.4 * LEAST(1.0, {tokc}::DOUBLE / 64.0) + 0.3 * {alpha} "
               f"+ 0.3 * (1.0 - ABS({stopr} - 0.4)))")
    return rf"""
WITH s AS (SELECT doc_id, ROUND({quality}, 6) AS quality FROM documents),
c AS (SELECT quality, COUNT(*)::BIGINT AS cnt FROM s
      WHERE quality IS NOT NULL GROUP BY quality),
cc AS (SELECT quality,
              SUM(cnt) OVER (ORDER BY quality
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              SUM(cnt) OVER () AS n
       FROM c),
thr AS (SELECT MIN(quality) AS t FROM cc WHERE cum >= CEIL(n::DOUBLE * 0.75))
SELECT doc_id, quality FROM s, thr WHERE quality >= t
"""


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL corpus sink/source round-trip (sources/jsonl.py — the
    interchange format of published LLM corpora): documents -> one JSON
    object per line -> schema'd PERMISSIVE read-back with quarantine
    split. Exercises JSON string escaping (newlines, quotes, unicode)
    and lossless bigint round-trip; the oracle is the identity (the
    parquet originals)."""
    from ncbi_analysis_spark.plans.driver_queries_r5 import _staging_dir
    from ncbi_analysis_spark.sources.jsonl import (
        read_jsonl,
        split_quarantine,
        write_jsonl,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = _staging_dir("spark_graft_jsonl")
    write_jsonl(d, path)
    back = read_jsonl(
        spark, path,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    clean, _bad = split_quarantine(back)
    return clean.select("doc_id", "text", "lang", "source", "n_chars")


JSONL_SQL = "SELECT doc_id, text, lang, source, n_chars FROM documents"


def quality_quantile_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quantile quality gate (operators/scale.py::
    filter_by_quantile(group_cols=['lang'])): each language keeps its
    own top quarter by the composite quality score, so one high-scoring
    language can't swallow the quality budget — the stratified form of
    quality_quantile_gate. Returns the survivors with their language and
    score; the oracle partitions the distinct-score cumulative scan by
    language."""
    from ncbi_analysis_spark.functions import text as textf
    from ncbi_analysis_spark.operators.scale import filter_by_quantile

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.col("text")
    scored = d.select(
        "doc_id", "lang",
        F.round(
            textf.quality_score(t, textf.tokens(F.lower(t))), 6
        ).alias("quality"),
    )
    return filter_by_quantile(scored, "quality", q=0.75, group_cols=["lang"])


def _quality_quantile_by_lang_sql() -> str:
    from ncbi_analysis_spark.functions import text as textf
    from ncbi_analysis_spark.plans.driver_queries import _LTOKS, _TOKS

    stop = "[" + ", ".join(f"'{w}'" for w in textf.EN_STOPWORDS) + "]"
    alpha = ("(CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE "
             "LENGTH(regexp_replace(LOWER(text), '[^a-z ]', '', 'g')) / LENGTH(text) END)")
    stopr = (f"(CASE WHEN len({_LTOKS}) = 0 THEN 0.0 ELSE "
             f"len(list_filter({_LTOKS}, t -> list_contains({stop}, t))) / len({_LTOKS}) END)")
    tokc = f"(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE len({_TOKS}) END)"
    quality = (f"(0.4 * LEAST(1.0, {tokc}::DOUBLE / 64.0) + 0.3 * {alpha} "
               f"+ 0.3 * (1.0 - ABS({stopr} - 0.4)))")
    return rf"""
WITH s AS (SELECT doc_id, lang, ROUND({quality}, 6) AS quality FROM documents),
c AS (SELECT lang, quality, COUNT(*)::BIGINT AS cnt FROM s
      WHERE quality IS NOT NULL GROUP BY lang, quality),
cc AS (SELECT lang, quality,
              SUM(cnt) OVER (PARTITION BY lang ORDER BY quality
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              SUM(cnt) OVER (PARTITION BY lang) AS n
       FROM c),
thr AS (SELECT lang, MIN(quality) AS t FROM cc
        WHERE cum >= CEIL(n::DOUBLE * 0.75) GROUP BY lang)
SELECT doc_id, s.lang, quality FROM s JOIN thr USING (lang)
WHERE quality >= t
"""


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (operators/dedup.py::corpus_diff — the
    change audit of an incremental crawl): old = docs with id%5!=0,
    new = docs with id%7!=0 where every id%11==0 doc got re-crawled
    with edited text — so all four statuses (added/removed/changed/
    unchanged) appear. Normalized-digest comparison, the exact_dedup
    canonical form; the oracle replays the full outer join."""
    from ncbi_analysis_spark.operators.dedup import corpus_diff

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = d.filter(F.col("doc_id") % 5 != 0).select("doc_id", "text")
    new = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" [v2]"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return corpus_diff(old, new, "text", "doc_id")


CORPUS_DIFF_SQL = r"""
WITH old AS (
  SELECT doc_id,
         md5(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS d_old
  FROM documents WHERE doc_id % 5 != 0),
new AS (
  SELECT doc_id,
         md5(regexp_replace(LOWER(TRIM(
           CASE WHEN doc_id % 11 = 0 THEN text || ' [v2]' ELSE text END
         )), '\s+', ' ', 'g')) AS d_new
  FROM documents WHERE doc_id % 7 != 0)
SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old.doc_id IS NULL THEN 'added'
            WHEN new.doc_id IS NULL THEN 'removed'
            WHEN d_old IS NOT DISTINCT FROM d_new THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old FULL OUTER JOIN new USING (doc_id)
"""


def curriculum_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordered training layout (operators/scale.py::
    curriculum_shards): 8 difficulty shards ascending by the composite
    quality score (value-based boundaries — tied scores land in the
    same shard, pure integer shard math), md5-shuffled within each
    shard. Readers consume shard 1..8 in order for an easy-to-hard
    schedule. The oracle replays the distinct-score cumulative shard
    map and the within-shard rank."""
    from ncbi_analysis_spark.functions import text as textf
    from ncbi_analysis_spark.operators.scale import curriculum_shards

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.col("text")
    scored = d.select(
        "doc_id",
        F.round(
            textf.quality_score(t, textf.tokens(F.lower(t))), 6
        ).alias("quality"),
    )
    return curriculum_shards(scored, "quality", "doc_id", 8).select(
        "doc_id", "quality", "shard", "pos"
    )


def _curriculum_sql() -> str:
    from ncbi_analysis_spark.functions import text as textf
    from ncbi_analysis_spark.plans.driver_queries import _LTOKS, _TOKS

    stop = "[" + ", ".join(f"'{w}'" for w in textf.EN_STOPWORDS) + "]"
    alpha = ("(CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE "
             "LENGTH(regexp_replace(LOWER(text), '[^a-z ]', '', 'g')) / LENGTH(text) END)")
    stopr = (f"(CASE WHEN len({_LTOKS}) = 0 THEN 0.0 ELSE "
             f"len(list_filter({_LTOKS}, t -> list_contains({stop}, t))) / len({_LTOKS}) END)")
    tokc = f"(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE len({_TOKS}) END)"
    quality = (f"(0.4 * LEAST(1.0, {tokc}::DOUBLE / 64.0) + 0.3 * {alpha} "
               f"+ 0.3 * (1.0 - ABS({stopr} - 0.4)))")
    return rf"""
WITH s AS (SELECT doc_id, ROUND({quality}, 6) AS quality FROM documents),
c AS (SELECT quality, COUNT(*)::BIGINT AS cnt FROM s
      WHERE quality IS NOT NULL GROUP BY quality),
cc AS (SELECT quality,
              SUM(cnt) OVER (ORDER BY quality
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              SUM(cnt) OVER () AS n
       FROM c),
m AS (SELECT quality,
             LEAST((cum * 8 + n - 1) // n, 8)::BIGINT AS shard
      FROM cc)
SELECT doc_id, quality, shard,
       ROW_NUMBER() OVER (PARTITION BY shard
         ORDER BY md5('curriculum#' || doc_id::VARCHAR), doc_id)::BIGINT AS pos
FROM s JOIN m USING (quality)
"""


def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-method contamination audit — the observability view a decon
    run publishes before anything is dropped: for the held-out %7 bench
    split, how many corpus documents each method flags (exact
    normalized-digest collision vs MinHash-LSH fuzzy collision) and the
    flagged rate. One row per method; the oracle re-derives both
    counts."""
    from ncbi_analysis_spark.operators.dedup import (
        fuzzy_decon_pairs,
        normalize_text,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    n_corpus = corpus.select(F.count(F.lit(1)).alias("n_corpus"))

    exact_flagged = (
        corpus.join(
            bench.select(
                F.md5(normalize_text(F.col("text"))).alias("__bd")
            ).distinct(),
            F.md5(normalize_text(corpus["text"])) == F.col("__bd"),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_flagged"))
        .select(F.lit("exact_digest").alias("method"), "n_flagged")
    )
    fuzzy_flagged = (
        fuzzy_decon_pairs(
            corpus, bench, "text", "doc_id", bench_id_col="bench_id",
            num_perm=4, bands=2,
        )
        .select("doc_id").distinct()
        .agg(F.count(F.lit(1)).alias("n_flagged"))
        .select(F.lit("fuzzy_minhash").alias("method"), "n_flagged")
    )
    return (
        exact_flagged.unionByName(fuzzy_flagged)
        .join(F.broadcast(n_corpus), how="cross")
        .select(
            "method", "n_flagged", "n_corpus",
            F.round(
                F.col("n_flagged").cast("double") / F.col("n_corpus"), 6
            ).alias("rate"),
        )
    )


def _contamination_report_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r7 import _fuzzy_decon_sql

    return rf"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 != 0),
bench AS (SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 7 = 0),
n AS (SELECT COUNT(*)::BIGINT AS n_corpus FROM corpus),
ex AS (
  SELECT 'exact_digest' AS method, COUNT(*)::BIGINT AS n_flagged
  FROM corpus WHERE md5(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g')) IN (
    SELECT DISTINCT md5(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g'))
    FROM bench)
),
fz AS (
  SELECT 'fuzzy_minhash' AS method,
         COUNT(DISTINCT doc_id)::BIGINT AS n_flagged
  FROM ({_fuzzy_decon_sql()}) pairs
)
SELECT method, n_flagged, n_corpus,
       ROUND(n_flagged::DOUBLE / n_corpus, 6) AS rate
FROM (SELECT * FROM ex UNION ALL SELECT * FROM fz), n
"""


def queries_r8() -> dict:
    return {
        "dup_span_removal": dup_span_removal,
        "quality_classifier": quality_classifier,
        "curation_v3": curation_v3,
        "decon_span_scrub": decon_span_scrub,
        "stream_fuzzy_decon": stream_fuzzy_decon,
        "stream_quality_gate": stream_quality_gate,
        "epoch_mixture": epoch_mixture,
        "rag_retrieval": rag_retrieval,
        "quality_quantile_gate": quality_quantile_gate,
        "jsonl_roundtrip": jsonl_roundtrip,
        "quality_quantile_by_lang": quality_quantile_by_lang,
        "corpus_snapshot_diff": corpus_snapshot_diff,
        "curriculum_layout": curriculum_layout,
        "contamination_report": contamination_report,
    }


def oracle_sql_r8() -> dict[str, str]:
    return {
        "dup_span_removal": DUP_SPAN_SQL,
        "quality_classifier": _qc_sql(),
        "curation_v3": _curation_v3_sql(),
        "decon_span_scrub": DECON_SPAN_SQL,
        "stream_fuzzy_decon": _stream_fuzzy_decon_sql(),
        "stream_quality_gate": _stream_quality_gate_sql(),
        "epoch_mixture": EPOCH_MIXTURE_SQL,
        "rag_retrieval": _rag_retrieval_sql(),
        "quality_quantile_gate": _quality_quantile_sql(),
        "jsonl_roundtrip": JSONL_SQL,
        "quality_quantile_by_lang": _quality_quantile_by_lang_sql(),
        "corpus_snapshot_diff": CORPUS_DIFF_SQL,
        "curriculum_layout": _curriculum_sql(),
        "contamination_report": _contamination_report_sql(),
    }
