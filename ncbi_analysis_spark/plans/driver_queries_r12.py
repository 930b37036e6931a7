"""Staged round-12 driver queries: persisted-BM25 batch retrieval, the
quantile-sketch family, Count-Min + heavy hitters (incl. the exact
drift top-N), priority sampling (plain / per-group / DSIR-weighted),
and the streaming HLL snapshot publisher.

Registered into the driver gate next round (the stage-then-register
cadence). Each query here follows the repo's determinism rules (see
driver_queries.py header): every cross-engine comparison is either
exact integer/string arithmetic or a pinned chain of IEEE ops shared
with the DuckDB oracle; transcendentals are evaluated ONCE driver-side
from exact integers (BM25 idf), probed bit-identical (ln —
tests/test_retrieval.py::test_bm25_libm_probe), or absorbed by a 6dp
round on identical operands (the DSIR mixture's exp — the
quality-classifier sigmoid precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# ---------------------------------------------------------------------------
# Persisted BM25 index + batch-query search (operators/retrieval.py)
# ---------------------------------------------------------------------------

# three queries sharing terms with the standing _BM25_QUERY mix: a rare
# term, mid-frequency terms, and near-ubiquitous ones — exercises the
# idf spread AND cross-query posting reuse in one batch
_BM25_BATCH = [
    (1, "dup merge stream"),
    (2, "join hash row"),
    (3, "dup scan filter"),
]
_BM25_BATCH_K = 10


def bm25_index_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-BM25 retrieval end-to-end
    (operators/retrieval.py::write_bm25_index / append_to_bm25_index /
    bm25_topk_batch): build the inverted index from the even-doc_id
    half of the corpus, append the odd half as a crawl-delta batch
    (append ≡ rebuild — any drift between the append path and a
    from-scratch index hash-mismatches here), then serve a THREE-query
    batch from partition-pruned index reads. The oracle recomputes
    BM25 from the raw corpus independently — so this one row also pins
    index-vs-corpus equivalence, the persisted-index contract."""
    from ncbi_analysis_spark.operators.retrieval import (
        append_to_bm25_index,
        bm25_topk_batch,
        write_bm25_index,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import _staging_dir

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = _staging_dir("spark_graft_bm25_index")
    write_bm25_index(d.filter(F.col("doc_id") % 2 == 0), path, n_buckets=32)
    append_to_bm25_index(d.filter(F.col("doc_id") % 2 == 1), path,
                         n_buckets=32)
    qdf = spark.createDataFrame(_BM25_BATCH, "query_id long, query string")
    return bm25_topk_batch(spark, path, qdf, k=_BM25_BATCH_K)


def _bm25_batch_sql(corpus_pred: str = "TRUE") -> str:
    """The staged-r12 batch-BM25 oracle; ``corpus_pred`` narrows the
    corpus (r13's delete oracles score against a corpus-without-X
    rebuild — the tombstoned index must match it exactly)."""
    from ncbi_analysis_spark.operators.retrieval import query_terms

    all_terms = sorted({t for _, q in _BM25_BATCH for t in query_terms(q)})
    in_list = ", ".join(f"'{t}'" for t in all_terms)
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, q in _BM25_BATCH for t in query_terms(q)
    )
    return rf"""
WITH d AS (SELECT doc_id, text FROM documents
           WHERE text IS NOT NULL AND ({corpus_pred})),
dl AS (
  SELECT doc_id,
         CASE WHEN length(TRIM(text)) = 0 THEN 0
              ELSE len(string_split_regex(TRIM(text), '\s+')) END AS dl
  FROM d
),
toks AS (
  SELECT doc_id, UNNEST(string_split_regex(TRIM(text), '\s+')) AS g
  FROM d
),
q(query_id, g) AS (VALUES {qvals}),
tf AS (
  SELECT doc_id, g, count(*)::BIGINT AS tf
  FROM toks WHERE g IN ({in_list}) GROUP BY doc_id, g
),
dfv AS (SELECT g, count(*)::BIGINT AS df FROM tf GROUP BY g),
st AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS s FROM dl),
model AS (
  SELECT t.g,
         ln(1.0 + (st.n::DOUBLE - COALESCE(dfv.df, 0)::DOUBLE + 0.5)
                  / (COALESCE(dfv.df, 0)::DOUBLE + 0.5)) AS idf
  FROM (SELECT DISTINCT g FROM q) t
  LEFT JOIN dfv ON t.g = dfv.g CROSS JOIN st
),
scored AS (
  SELECT q.query_id, tf.doc_id, tf.g,
         m.idf * (tf.tf::DOUBLE /
           (tf.tf::DOUBLE + 1.2 * ((1.0 - 0.75) + 0.75 *
             (dl.dl::DOUBLE / (st.s::DOUBLE / st.n::DOUBLE))))) AS contrib
  FROM tf
  JOIN q ON tf.g = q.g
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN model m ON tf.g = m.g
  CROSS JOIN st
),
agg AS (
  SELECT query_id, doc_id, count(*)::BIGINT AS n_terms_matched,
         list_reduce(list_prepend(0.0, list(contrib ORDER BY g)),
                     (a, b) -> a + b) AS score
  FROM scored GROUP BY query_id, doc_id
),
rk AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id)::BIGINT AS rk
  FROM agg
)
SELECT query_id, doc_id, n_terms_matched, score, rk
FROM rk WHERE rk <= {_BM25_BATCH_K}
"""


# ---------------------------------------------------------------------------
# Quantile sketch (operators/sketches.py::quantile_sketch family)
# ---------------------------------------------------------------------------

_QSK_K = 128
_QSK_QS = (0.25, 0.5, 0.9, 1.0)


def quantile_sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch end-to-end: sketch the even-doc_id and
    odd-doc_id halves of the corpus INDEPENDENTLY, merge the two
    sketches, estimate quantiles of n_chars from the merged sketch.
    The oracle computes the bottom-k sample of the WHOLE corpus
    directly — so a hash match proves merge(A, B) ≡ sketch(A ∪ B) (the
    hll_merge_snapshots contract) AND pins the estimator's discrete
    ceil(q*n) arithmetic cross-engine."""
    from ncbi_analysis_spark.operators import sketches as sk

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    a = d.filter(F.col("doc_id") % 2 == 0)
    b = d.filter(F.col("doc_id") % 2 == 1)
    merged = sk.quantile_sketch_merge(
        sk.quantile_sketch(a, "n_chars", "doc_id", k=_QSK_K),
        sk.quantile_sketch(b, "n_chars", "doc_id", k=_QSK_K),
        _QSK_K,
    )
    return sk.quantile_sketch_estimate(merged, list(_QSK_QS))


def _quantile_sketch_sql() -> str:
    qvals = ", ".join(f"({int(round(q * 1_000_000))})" for q in _QSK_QS)
    return f"""
WITH s AS (
  SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT AS h,
         n_chars AS v
  FROM documents WHERE n_chars IS NOT NULL
  ORDER BY h, v LIMIT {_QSK_K}
),
r AS (
  SELECT v, row_number() OVER (ORDER BY v, h) AS rk,
         count(*) OVER () AS n
  FROM s
),
q(q_ppm) AS (VALUES {qvals})
SELECT q_ppm::BIGINT AS q_ppm, r.n::BIGINT AS n_sample, r.v AS est_v
FROM q JOIN r
  ON r.rk = (q_ppm * r.n + 999999) // 1000000
"""


_QSK_GATE_Q = 0.5


def quantile_sketch_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter_by_quantile from a PUBLISHED sketch instead of a corpus
    pass (the incremental-gate ask): publish the n_chars quantile
    sketch, read it back (marker-validated), derive the median
    threshold, and gate the corpus — per-lang survivor counts plus the
    threshold column. The only corpus-sized work is the final filtered
    aggregate; the threshold came from sketch artifacts."""
    from ncbi_analysis_spark.operators import sketches as sk
    from ncbi_analysis_spark.plans.driver_queries_r5 import _staging_dir

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = _staging_dir("spark_graft_qsketch")
    sk.write_quantile_sketch(
        sk.quantile_sketch(d, "n_chars", "doc_id", k=_QSK_K), path, k=_QSK_K
    )
    sketch = sk.read_quantile_sketch(spark, path, k=_QSK_K)
    thr = sk.quantile_sketch_threshold(sketch, _QSK_GATE_Q)
    return (
        d.crossJoin(F.broadcast(thr))
        .filter(F.col("n_chars") >= F.col("threshold"))
        .groupBy("lang", "threshold")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


def _quantile_gate_sql() -> str:
    q_ppm = int(round(_QSK_GATE_Q * 1_000_000))
    return f"""
WITH s AS (
  SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT AS h,
         n_chars AS v
  FROM documents WHERE n_chars IS NOT NULL
  ORDER BY h, v LIMIT {_QSK_K}
),
r AS (
  SELECT v, row_number() OVER (ORDER BY v, h) AS rk,
         count(*) OVER () AS n
  FROM s
),
thr AS (
  SELECT v AS threshold FROM r
  WHERE rk = ({q_ppm} * n + 999999) // 1000000
)
SELECT lang, threshold, count(*)::BIGINT AS n_kept
FROM documents CROSS JOIN thr
WHERE n_chars >= threshold
GROUP BY lang, threshold
"""


# ---------------------------------------------------------------------------
# Heavy hitters (operators/heavy_hitters.py)
# ---------------------------------------------------------------------------

_HH_N = 20
_HH_M = 256


def heavy_hitters_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass exact top-N tokens of the document corpus
    (operators/heavy_hitters.py::heavy_hitters_topn): per-partition
    top-m candidates (Misra-Gries coverage), exact recount of the
    candidate set only, per-row layout-independence guarantee flag.
    The oracle is the direct vocabulary-wide count — agreement proves
    the bounded candidate pass lost nothing at this corpus's skew."""
    from ncbi_analysis_spark.functions.text import tokens
    from ncbi_analysis_spark.operators.heavy_hitters import heavy_hitters_topn

    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select(F.explode(tokens(F.col("text"))).alias("g"))
    )
    return heavy_hitters_topn(toks, "g", n=_HH_N, m=_HH_M)


def _heavy_hitters_sql() -> str:
    return rf"""
WITH toks AS (
  SELECT UNNEST(string_split_regex(TRIM(text), '\s+')) AS g
  FROM documents WHERE text IS NOT NULL
),
tot AS (SELECT count(*)::BIGINT AS n FROM toks)
SELECT g AS token, count(*)::BIGINT AS cnt,
       (count(*)::BIGINT * {_HH_M + 1} > tot.n) AS guaranteed
FROM toks CROSS JOIN tot
GROUP BY g, tot.n
ORDER BY cnt DESC, token LIMIT {_HH_N}
"""


_CM_W = 512
_CM_D = 3
_CM_TOP = 15


def cm_heavy_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min snapshot workflow: sketch the even/odd doc_id halves'
    token streams INDEPENDENTLY, merge the register tables, and
    estimate frequencies for the heavy-hitter candidate set
    (heavy_hitters_topn's top-15 — the production pairing). The oracle
    rebuilds the registers from the whole corpus in DuckDB (same md5
    buckets, exact integer counts) — a hash match proves
    merge ≡ rebuild AND pins the min-over-rows estimator."""
    from ncbi_analysis_spark.functions.text import tokens
    from ncbi_analysis_spark.operators.heavy_hitters import (
        cm_estimate,
        cm_merge,
        cm_sketch,
        heavy_hitters_topn,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )

    def _toks(side):
        return side.select(F.explode(tokens(F.col("text"))).alias("g"))

    merged = cm_merge(
        cm_sketch(_toks(docs.filter(F.col("doc_id") % 2 == 0)), "g",
                  _CM_W, _CM_D),
        cm_sketch(_toks(docs.filter(F.col("doc_id") % 2 == 1)), "g",
                  _CM_W, _CM_D),
    )
    cands = heavy_hitters_topn(_toks(docs), "g", n=_CM_TOP, m=_HH_M).select(
        F.col("token").alias("g"), F.col("cnt").alias("exact_cnt")
    )
    est = cm_estimate(merged, cands, "g", _CM_W, _CM_D)
    return est.join(
        F.broadcast(cands.withColumnRenamed("g", "item")), "item"
    ).select("item", "est_cnt", "exact_cnt")


def _cm_heavy_sql() -> str:
    rows = ", ".join(f"({i})" for i in range(_CM_D))
    return rf"""
WITH toks AS (
  SELECT UNNEST(string_split_regex(TRIM(text), '\s+')) AS g
  FROM documents WHERE text IS NOT NULL
),
rws(i) AS (VALUES {rows}),
regs AS (
  SELECT i AS row,
         ('0x' || substr(md5('cm' || i::VARCHAR || '|' || g), 1, 8))::BIGINT
           % {_CM_W} AS bucket,
         count(*)::BIGINT AS cnt
  FROM toks CROSS JOIN rws
  GROUP BY row, bucket
),
tot AS (SELECT count(*)::BIGINT AS n FROM toks),
cands AS (
  SELECT g AS item, count(*)::BIGINT AS exact_cnt
  FROM toks GROUP BY g ORDER BY exact_cnt DESC, item LIMIT {_CM_TOP}
),
probes AS (
  SELECT item, exact_cnt, i AS row,
         ('0x' || substr(md5('cm' || i::VARCHAR || '|' || item), 1, 8))::BIGINT
           % {_CM_W} AS bucket
  FROM cands CROSS JOIN rws
)
SELECT p.item, min(COALESCE(r.cnt, 0))::BIGINT AS est_cnt,
       p.exact_cnt
FROM probes p
LEFT JOIN regs r ON p.row = r.row AND p.bucket = r.bucket
GROUP BY p.item, p.exact_cnt
"""


# ---------------------------------------------------------------------------
# Priority sampling (operators/scale.py::priority_sample)
# ---------------------------------------------------------------------------

_PS_K = 64


def priority_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-without-replacement corpus sample
    (operators/scale.py::priority_sample): 64 documents drawn with
    probability proportional to n_chars, with the Horvitz-Thompson
    estimation weight and threshold tau. The key is one exact IEEE
    division of pinned md5-uniforms (no transcendentals — the reason
    this is priority sampling and not A-ES), so sample MEMBERSHIP, tau
    and est_weight all hash-match the oracle bit-for-bit."""
    from ncbi_analysis_spark.operators.scale import priority_sample

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0))
        .select("doc_id", "n_chars")
    )
    s = priority_sample(d, "n_chars", _PS_K, "doc_id")
    return s.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        "est_weight",
        "tau",
    )


def _priority_sample_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, n_chars FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
),
p AS (
  SELECT doc_id, n_chars,
         n_chars::DOUBLE /
           ((('0x' || substr(md5('psample|' || doc_id::VARCHAR), 1, 13))::BIGINT
             + 1)::DOUBLE / 4503599627370496.0) AS pr
  FROM d
),
r AS (
  SELECT *, row_number() OVER (ORDER BY pr DESC, doc_id) AS rk FROM p
),
tau AS (
  SELECT COALESCE(max(CASE WHEN rk = {_PS_K + 1} THEN pr END), 0.0) AS tau
  FROM r WHERE rk <= {_PS_K + 1}
)
SELECT doc_id, n_chars::BIGINT AS weight,
       greatest(n_chars::DOUBLE, tau.tau) AS est_weight, tau.tau AS tau
FROM r CROSS JOIN tau
WHERE rk <= {_PS_K}
"""


# ---------------------------------------------------------------------------
# Streaming HLL snapshot publisher (streaming/events.py, round-12
# stretch): versioned marker-guarded sketch artifacts from a stream
# ---------------------------------------------------------------------------


def stream_hll_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sketch publication end-to-end
    (streaming/events.py::publish_hll_snapshots/read_hll_snapshots):
    the events table as a file stream, each micro-batch's bounded
    register table published as a versioned, marker-guarded snapshot
    via foreachBatch, then the snapshot directory read back and merged
    by register-wise max. The merged table must equal the batch sketch
    of the whole corpus EXACTLY regardless of how the stream was
    batched (associativity + idempotence of max) — the same
    whole-corpus oracle the snapshot-merge and streaming-HLL queries
    pin."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.plans.driver_queries import _events
    from ncbi_analysis_spark.streaming.events import (
        publish_hll_snapshots,
        read_hll_snapshots,
    )

    ev = _events(spark, sf_dir).select("event_type", "user_id")
    tmp = tempfile.mkdtemp(prefix="stream_hll_pub_")
    try:
        from ncbi_analysis_spark.plans.driver_queries_r11 import (
            _stage_as_stream,
            _staged_stream_conf,
        )

        src = _stage_as_stream(spark, ev, tmp)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        out = f"{tmp}/sketches"
        with _staged_stream_conf(spark, src):
            publish_hll_snapshots(
                stream, "user_id", out, f"{tmp}/ck", p=8,
                group_by=["event_type"],
            )
            merged = read_hll_snapshots(
                spark, out, p=8, group_by=["event_type"]
            )
            # the snapshot directory dies with tmp: materialize the
            # bounded (groups x 2^p) merged table before cleanup
            rows = merged.collect()
            schema = merged.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# DSIR -> priority-sampling integration (the r11 verdict's framing:
# importance weights should feed a weighted SAMPLE, not a top-k cut)
# ---------------------------------------------------------------------------

_DSIR_PS_K = 64


def dsir_priority_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a DSIR-weighted mixture the statistically right way:
    per-doc DSIR importance (the registered dsir_importance fit —
    English-target hashed-bigram log-ratios), converted to a sampling
    weight ``w = max(round(exp(logw - max_logw), 6), 1e-6)`` (shift by
    the corpus max makes exp overflow-free and scale-invariance of
    priority sampling makes the shift semantics-free; the 6dp round
    absorbs the last-ulp libm-vs-JVM exp difference — the
    quality_classifier sigmoid precedent — and the 1e-6 floor keeps the
    deep tail samplable instead of tripping the positive-weight guard),
    then a 64-doc priority sample with Horvitz-Thompson estimation
    weights. Replaces the deterministic top-k cut (curation_v2's
    top-250-by-prob pattern) for mixture materialization: every doc has
    inclusion probability ~min(1, w/tau) instead of the head being
    certain and the tail impossible."""
    from ncbi_analysis_spark.operators.scale import priority_sample
    from ncbi_analysis_spark.operators.terms import (
        dsir_logratios_pred,
        dsir_score,
    )
    from ncbi_analysis_spark.plans.driver_queries_r7 import _DSIR_PARAMS

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = dsir_logratios_pred(
        d, F.col("lang") == "en", "text", "doc_id", **_DSIR_PARAMS
    )
    # per-doc score table is (doc_id, n_feats, logw) — corpus-row-count
    # sized but text-free; persist so the max collect and the sampling
    # job score the corpus ONCE, then release via the eager bounded
    # return (the bm25_topk lifecycle)
    scored = dsir_score(d, "text", "doc_id", w, **_DSIR_PARAMS).persist()
    try:
        mx = scored.agg(F.max("logw")).collect()[0][0]
        weighted = scored.select(
            "doc_id",
            "logw",
            F.greatest(
                F.round(F.exp(F.col("logw") - F.lit(float(mx))), 6),
                F.lit(1e-6),
            ).alias("w"),
        )
        samp = priority_sample(
            weighted, "w", _DSIR_PS_K, "doc_id", salt="dsir"
        ).select("doc_id", "logw", "w", "est_weight", "tau")
        schema = samp.schema
        rows = samp.collect()
    finally:
        scored.unpersist()
    return spark.createDataFrame(rows, schema)


def _dsir_priority_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r7 import _dsir_sql

    return f"""
WITH dsirt AS ({_dsir_sql()}),
mx AS (SELECT max(logw) AS m FROM dsirt),
wtab AS (
  SELECT doc_id, logw,
         GREATEST(ROUND(exp(logw - mx.m), 6), 0.000001) AS w
  FROM dsirt CROSS JOIN mx
),
p AS (
  SELECT doc_id, logw, w,
         w / ((('0x' || substr(md5('dsir|' || doc_id::VARCHAR), 1, 13))::BIGINT
               + 1)::DOUBLE / 4503599627370496.0) AS pr
  FROM wtab
),
r AS (
  SELECT *, row_number() OVER (ORDER BY pr DESC, doc_id) AS rk FROM p
),
tau AS (
  SELECT COALESCE(max(CASE WHEN rk = {_DSIR_PS_K + 1} THEN pr END), 0.0) AS tau
  FROM r WHERE rk <= {_DSIR_PS_K + 1}
)
SELECT doc_id, logw, w, greatest(w, tau.tau) AS est_weight, tau.tau AS tau
FROM r CROSS JOIN tau
WHERE rk <= {_DSIR_PS_K}
"""


# ---------------------------------------------------------------------------
# Grouped forms of the r12 operators through the driver gate (the
# per-group code paths are pytest-covered; these pin them cross-engine)
# ---------------------------------------------------------------------------

_PSG_K = 8


def priority_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped priority sampling: 8 docs per language, weight n_chars —
    the per-domain mixture-quota form (every group pays its own tau).
    Output one row per kept doc with the group's tau; groups smaller
    than k keep everything at tau 0."""
    from ncbi_analysis_spark.operators.scale import priority_sample

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(
            F.col("n_chars").isNotNull() & (F.col("n_chars") > 0)
            & F.col("lang").isNotNull()
        )
        .select("doc_id", "lang", "n_chars")
    )
    s = priority_sample(d, "n_chars", _PSG_K, "doc_id",
                        group_by=["lang"])
    return s.select(
        "doc_id", "lang",
        F.col("n_chars").cast("long").alias("weight"),
        "est_weight", "tau",
    )


def _priority_per_lang_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, lang, n_chars FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0 AND lang IS NOT NULL
),
p AS (
  SELECT doc_id, lang, n_chars,
         n_chars::DOUBLE /
           ((('0x' || substr(md5('psample|' || doc_id::VARCHAR), 1, 13))::BIGINT
             + 1)::DOUBLE / 4503599627370496.0) AS pr
  FROM d
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY lang ORDER BY pr DESC, doc_id) AS rk
  FROM p
),
tau AS (
  SELECT lang,
         COALESCE(max(CASE WHEN rk = {_PSG_K + 1} THEN pr END), 0.0) AS tau
  FROM r WHERE rk <= {_PSG_K + 1} GROUP BY lang
)
SELECT r.doc_id, r.lang, r.n_chars::BIGINT AS weight,
       greatest(r.n_chars::DOUBLE, tau.tau) AS est_weight, tau.tau AS tau
FROM r JOIN tau ON r.lang = tau.lang
WHERE r.rk <= {_PSG_K}
"""


def quantile_sketch_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped quantile sketch: per-language n_chars medians and p90s
    from per-language bottom-k samples — the per-domain length-profile
    a mixture designer reads before setting quotas. Pins the grouped
    sketch + grouped estimator paths cross-engine."""
    from ncbi_analysis_spark.operators import sketches as sk

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("lang").isNotNull())
        .select("doc_id", "lang", "n_chars")
    )
    s = sk.quantile_sketch(d, "n_chars", "doc_id", k=_QSK_K,
                           group_by=["lang"])
    return sk.quantile_sketch_estimate(s, [0.5, 0.9], group_by=["lang"])


def _quantile_per_lang_sql() -> str:
    return f"""
WITH h AS (
  SELECT lang,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT AS h,
         n_chars AS v,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT,
                    n_chars
         ) AS hrk
  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
),
s AS (SELECT lang, h, v FROM h WHERE hrk <= {_QSK_K}),
r AS (
  SELECT lang, v,
         row_number() OVER (PARTITION BY lang ORDER BY v, h) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM s
),
q(q_ppm) AS (VALUES (500000), (900000))
SELECT r.lang, q.q_ppm::BIGINT AS q_ppm, r.n::BIGINT AS n_sample,
       r.v AS est_v
FROM q JOIN r ON r.rk = (q.q_ppm * r.n + 999999) // 1000000
"""


# ---------------------------------------------------------------------------
# Exact top-N drifted tokens via heavy-hitter candidates (the r11
# verdict's drift gap: actual offenders, not one witness per bucket)
# ---------------------------------------------------------------------------

_DRIFT_HH_N = 20
_DRIFT_HH_M = 256


def drift_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact unigram-share drift between the English and non-English
    snapshots of the corpus, top-20 tokens by |p_a - p_b|
    (operators/drift.py::top_drifted_tokens_exact): heavy-hitter
    candidates from BOTH sides (coverage: drift past 1/(m+1) forces
    heavy-hitterdom on one side), exact recounts of the candidate set
    only, integer-arithmetic guarantee flags. The oracle computes the
    drift over the FULL vocabulary — agreement proves the bounded
    candidate pass lost nothing at this corpus's skew."""
    from ncbi_analysis_spark.operators.drift import top_drifted_tokens_exact

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    return top_drifted_tokens_exact(
        d.filter(F.col("lang") == "en"),
        d.filter(F.col("lang") != "en"),
        n=_DRIFT_HH_N,
        m=_DRIFT_HH_M,
    )


def _drift_top_tokens_sql() -> str:
    return rf"""
WITH base AS (
  SELECT lang, text FROM documents
  WHERE text IS NOT NULL AND lang IS NOT NULL
),
ta AS (
  SELECT UNNEST(string_split_regex(TRIM(text), '\s+')) AS token
  FROM base WHERE lang = 'en'
),
tb AS (
  SELECT UNNEST(string_split_regex(TRIM(text), '\s+')) AS token
  FROM base WHERE lang != 'en'
),
fa AS (SELECT token FROM ta WHERE length(token) > 0),
fb AS (SELECT token FROM tb WHERE length(token) > 0),
tot AS (SELECT (SELECT count(*) FROM fa)::BIGINT AS na,
               (SELECT count(*) FROM fb)::BIGINT AS nb),
ca AS (SELECT token, count(*)::BIGINT AS n_a FROM fa GROUP BY token),
cb AS (SELECT token, count(*)::BIGINT AS n_b FROM fb GROUP BY token),
j AS (
  SELECT COALESCE(ca.token, cb.token) AS token,
         COALESCE(ca.n_a, 0)::BIGINT AS n_a,
         COALESCE(cb.n_b, 0)::BIGINT AS n_b
  FROM ca FULL OUTER JOIN cb ON ca.token = cb.token
),
scored AS (
  SELECT token, n_a, n_b,
         n_a::DOUBLE / tot.na::DOUBLE AS p_a,
         n_b::DOUBLE / tot.nb::DOUBLE AS p_b,
         abs(n_a::DOUBLE / tot.na::DOUBLE
             - n_b::DOUBLE / tot.nb::DOUBLE) AS drift,
         (abs(n_a::HUGEINT * tot.nb::HUGEINT - n_b::HUGEINT * tot.na::HUGEINT)
            * {_DRIFT_HH_M + 1}::HUGEINT
            > tot.na::HUGEINT * tot.nb::HUGEINT) AS guaranteed
  FROM j CROSS JOIN tot
)
SELECT token, n_a, n_b, p_a, p_b, drift, guaranteed
FROM scored ORDER BY drift DESC, token LIMIT {_DRIFT_HH_N}
"""


# ---------------------------------------------------------------------------
# Two-phase pruned per-group top-k (W1's bandwidth-bound form)
# ---------------------------------------------------------------------------


def w1_topk_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 per-group top-k through the two-phase pruned form
    (operators/topk.py::topk_per_group_pruned): each partition reduces
    to its per-group top-5 Arrow-side, then the rank window sees only
    <= partitions * groups * 5 rows — shuffle BYTES bounded regardless
    of group sizes (the network-bound-cluster variant; measured locally
    at parity, SCALING.md round-12 A/B). Shares W1\'s oracle: rows AND
    ranks must equal the full window form exactly."""
    from ncbi_analysis_spark.operators.topk import topk_per_group_pruned

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber",
        "l_extendedprice",
    )
    out = topk_per_group_pruned(
        li,
        ["l_returnflag", "l_linestatus"],
        [("l_extendedprice", False), ("l_orderkey", True),
         ("l_linenumber", True)],
        5,
    )
    return out.withColumn("rk", F.col("rk").cast("long"))


# ---------------------------------------------------------------------------
# KMV crawl-diff ledger (operators/sketches.py::kmv_diff)
# ---------------------------------------------------------------------------

_KMV_DIFF_K = 64


def kmv_crawl_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-ledger set arithmetic from published sketches
    (operators/sketches.py::kmv_diff): the kmv_content_overlap
    snapshots (doc_id % 3 != 0 vs % 2 != 0), per-language estimates of
    how much content is NEW in each snapshot and how much is shared —
    the question HLL registers cannot answer — side-by-side with the
    exact partition so each row shows the estimator's error. Integer
    memberships + the one-division union estimator + one
    multiply-of-a-ratio per subset: bit-exact cross-engine."""
    from ncbi_analysis_spark.operators.sketches import kmv_diff, kmv_sketch

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .filter(F.col("text").isNotNull())
    )
    snap_a = d.filter(F.col("doc_id") % 3 != 0)
    snap_b = d.filter(F.col("doc_id") % 2 != 0)
    est = kmv_diff(
        kmv_sketch(snap_a, "text", k=_KMV_DIFF_K, group_by=["lang"]),
        kmv_sketch(snap_b, "text", k=_KMV_DIFF_K, group_by=["lang"]),
        _KMV_DIFF_K,
        group_by=["lang"],
    )
    per_h = d.groupBy("lang", F.md5("text").alias("h")).agg(
        F.max(F.when(F.col("doc_id") % 3 != 0, 1).otherwise(0)).alias("a"),
        F.max(F.when(F.col("doc_id") % 2 != 0, 1).otherwise(0)).alias("b"),
    )
    exact = per_h.filter((F.col("a") == 1) | (F.col("b") == 1)).groupBy(
        "lang"
    ).agg(
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("exact_only_a"),
        F.sum(F.col("b") * (1 - F.col("a"))).cast("long").alias("exact_only_b"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("exact_inter"),
    )
    return est.join(exact, "lang")


def _kmv_crawl_diff_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r5 import _dlit

    k = _KMV_DIFF_K
    numer = _dlit(float((k - 1) * (1 << 52)))
    rank = (
        "SELECT lang, h FROM (SELECT lang, h, row_number() OVER "
        "(PARTITION BY lang ORDER BY h) AS rn FROM {src}) WHERE rn <= "
        f"{k}"
    )
    return f"""
WITH d AS (
  SELECT doc_id, lang, text FROM documents WHERE text IS NOT NULL
),
h AS (
  SELECT lang, doc_id,
         ('0x' || substr(md5(text), 1, 13))::BIGINT AS h
  FROM d
),
ha AS (SELECT DISTINCT lang, h FROM h WHERE doc_id % 3 != 0),
hb AS (SELECT DISTINCT lang, h FROM h WHERE doc_id % 2 != 0),
sa AS ({rank.format(src='ha')}),
sb AS ({rank.format(src='hb')}),
hu AS (SELECT lang, h FROM sa UNION SELECT lang, h FROM sb),
su AS ({rank.format(src='hu')}),
tagged AS (
  SELECT su.lang, su.h,
         CASE WHEN EXISTS (SELECT 1 FROM sa
                           WHERE sa.lang = su.lang AND sa.h = su.h)
              THEN 1 ELSE 0 END AS ia,
         CASE WHEN EXISTS (SELECT 1 FROM sb
                           WHERE sb.lang = su.lang AND sb.h = su.h)
              THEN 1 ELSE 0 END AS ib
  FROM su
),
agg AS (
  SELECT lang, count(*)::BIGINT AS n_union_sketch, max(h) AS kth,
         sum(ia * (1 - ib))::BIGINT AS n_only_a,
         sum(ib * (1 - ia))::BIGINT AS n_only_b,
         sum(ia * ib)::BIGINT AS n_both
  FROM tagged GROUP BY lang
),
est AS (
  SELECT *, CASE WHEN n_union_sketch < {k} THEN n_union_sketch::DOUBLE
                 ELSE {numer} / kth::DOUBLE END AS est_union
  FROM agg
),
per AS (
  SELECT lang, md5(text) AS hh,
         max(CASE WHEN doc_id % 3 != 0 THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN doc_id % 2 != 0 THEN 1 ELSE 0 END) AS b
  FROM d GROUP BY lang, md5(text)
),
ex AS (
  SELECT lang,
         sum(a * (1 - b))::BIGINT AS exact_only_a,
         sum(b * (1 - a))::BIGINT AS exact_only_b,
         sum(a * b)::BIGINT AS exact_inter
  FROM per WHERE a = 1 OR b = 1 GROUP BY lang
)
SELECT est.lang, est.n_union_sketch, est.n_only_a, est.n_only_b,
       est.n_both, est.est_union,
       (est.n_only_a::DOUBLE / est.n_union_sketch::DOUBLE) * est.est_union
         AS est_only_a,
       (est.n_only_b::DOUBLE / est.n_union_sketch::DOUBLE) * est.est_union
         AS est_only_b,
       (est.n_both::DOUBLE / est.n_union_sketch::DOUBLE) * est.est_union
         AS est_inter,
       ex.exact_only_a, ex.exact_only_b, ex.exact_inter
FROM est JOIN ex ON est.lang = ex.lang
"""


def _w1_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries import W1_SQL

    return W1_SQL


def _hll_registers_sql() -> str:
    """The whole-corpus register-table oracle — identical to
    hll_merge_snapshots' / stream_hll_user_distinct's: any batching of
    the input must merge to exactly this table."""
    from ncbi_analysis_spark.plans.driver_queries_r11 import _HLL_MERGE_SQL

    return _HLL_MERGE_SQL


def queries_r12() -> dict:
    return {
        "bm25_index_batch": bm25_index_batch,
        "quantile_sketch_estimates": quantile_sketch_estimates,
        "quantile_sketch_gate": quantile_sketch_gate,
        "heavy_hitters_report": heavy_hitters_report,
        "cm_heavy_estimates": cm_heavy_estimates,
        "priority_sample_mixture": priority_sample_mixture,
        "stream_hll_publish": stream_hll_publish,
        "dsir_priority_mixture": dsir_priority_mixture,
        "priority_sample_per_lang": priority_sample_per_lang,
        "quantile_sketch_per_lang": quantile_sketch_per_lang,
        "drift_top_tokens": drift_top_tokens,
        "w1_topk_pruned": w1_topk_pruned,
        "kmv_crawl_diff": kmv_crawl_diff,
    }


def oracle_sql_r12() -> dict[str, str]:
    return {
        "bm25_index_batch": _bm25_batch_sql(),
        "quantile_sketch_estimates": _quantile_sketch_sql(),
        "quantile_sketch_gate": _quantile_gate_sql(),
        "heavy_hitters_report": _heavy_hitters_sql(),
        "cm_heavy_estimates": _cm_heavy_sql(),
        "priority_sample_mixture": _priority_sample_sql(),
        "stream_hll_publish": _hll_registers_sql(),
        "dsir_priority_mixture": _dsir_priority_sql(),
        "priority_sample_per_lang": _priority_per_lang_sql(),
        "quantile_sketch_per_lang": _quantile_per_lang_sql(),
        "drift_top_tokens": _drift_top_tokens_sql(),
        "w1_topk_pruned": _w1_sql(),
        "kmv_crawl_diff": _kmv_crawl_diff_sql(),
    }
