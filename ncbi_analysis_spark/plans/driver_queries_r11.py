"""Round-11 staged driver queries.

New operators built in round 10 stage here (the ``--staged`` leg of
``scripts/check_oracle.py`` and the ahead-of-registration bench loop in
``bench.py``) and get wired into the main driver gate at round-11 start
— the standing one-round staging pattern (see driver_queries_r10).
"""

from __future__ import annotations

from contextlib import contextmanager as _contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# HLL snapshot merge (round-10; r9 verdict stretch ask 8)
# ---------------------------------------------------------------------------


def hll_merge_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability contract of the HLL register tables, oracle-pinned
    (operators/sketches.py::hll_merge): split events into two disjoint
    "crawl snapshots" (event_id parity — the incremental-crawl shape
    where each snapshot publishes its own sketch), build each snapshot's
    per-event-type register table independently, merge with the
    register-wise max, and return the merged registers.

    The oracle computes the register table of the UNION directly (one
    pass over all events) — exact row match therefore proves
    ``merge(sketch(A), sketch(B)) == sketch(A ∪ B)`` register-for-
    register, the property that lets corpus-lifetime cardinality be a
    max-groupBy over published snapshot sketches with no re-scan of old
    data. Every value is integer (md5 carve + bin-length rho)."""
    from ncbi_analysis_spark.operators.sketches import (
        hll_merge,
        hll_registers,
    )
    from ncbi_analysis_spark.plans.driver_queries import _events

    ev = _events(spark, sf_dir).select("event_id", "event_type", "user_id")
    snap_a = ev.filter(F.col("event_id") % 2 == 0)
    snap_b = ev.filter(F.col("event_id") % 2 == 1)
    ra = hll_registers(snap_a, "user_id", p=8, group_by=["event_type"])
    rb = hll_registers(snap_b, "user_id", p=8, group_by=["event_type"])
    return hll_merge(ra, rb, group_by=["event_type"])


_HLL_MERGE_SQL = """
WITH vals AS (
  SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
hx AS (SELECT event_type, md5(user_id::VARCHAR) AS h FROM vals),
rr AS (
  SELECT event_type,
         ('0x' || substr(h, 1, 2))::BIGINT AS register,
         ('0x' || substr(h, 3, 13))::BIGINT AS w
  FROM hx
)
SELECT event_type, register::INT AS register,
       MAX(CASE WHEN w = 0 THEN 53
                ELSE 52 - length(bin(w)) + 1 END)::INT AS max_rho
FROM rr GROUP BY event_type, register
"""


# ---------------------------------------------------------------------------
# PCA variance gate on the moments fit (round-10; r9 verdict stretch 9)
# ---------------------------------------------------------------------------

_VARIANCE_THRESHOLDS_PPM = (250_000, 500_000, 750_000, 900_000)

# local-twin eigen spectra cached per (parquet_path) so the Spark-side
# query and the oracle-SQL builder don't each re-read the whole
# embeddings table into driver memory (r11 advice) — this gate query is
# bounded to oracle-scale data by design; the at-scale spectrum comes
# from the distributed pca_fit_moments it is validating.
_local_eig_cache: dict = {}


def _local_eig_full(parquet_path: str):
    """Full (k=d) local-twin eigen spectrum for ``parquet_path``,
    computed once per process."""
    if parquet_path not in _local_eig_cache:
        import pyarrow.parquet as pq

        from ncbi_analysis_spark.operators.embeddings import (
            pca_fit_moments_local,
        )

        d = len(
            pq.read_table(parquet_path, columns=["embedding"])["embedding"][0]
        )
        _, _, eig = pca_fit_moments_local(parquet_path, k=d)
        _local_eig_cache[parquet_path] = (d, eig)
    return _local_eig_cache[parquet_path]


def pca_variance_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle coverage for the distributed moments fit
    (operators/embeddings.py::pca_fit_moments — the at-scale all-rows
    estimator; only the sampled fit was oracled before): fit the FULL
    eigen spectrum (k = d) from the one-pass Arrow-batched moment
    partials, then answer the model-sizing question a curation pipeline
    asks before projecting — for each variance target, how many
    principal axes are needed (``k_star``) and what fraction is actually
    captured at that k (``captured_ppm``).

    Determinism contract (hardened per the round-10 advice): the
    distributed fit is value-deterministic but not bit-pinned (float
    partial-sum order across partitions), so it is gated by an explicit
    tolerance — ``fits_agree`` is TRUE iff every distributed eigenvalue
    is within 1e-9 (relative to the spectral scale) of the independent
    single-pass local twin's (``pca_fit_moments_local``). The ppm/k_star
    integers themselves are then computed from the LOCAL twin's
    eigenvalues with a pinned left-to-right fold (total = left fold of
    eig; cum_j = left-prefix-sum / total — exactly DuckDB's
    ``list_reduce`` order), and the oracle consumes the SAME eigenvalue
    literals. Sub-ulp spectrum noise can no longer flip a ppm floor:
    the only cross-engine comparison is identical IEEE op sequences on
    identical literals."""
    from ncbi_analysis_spark.operators import embeddings as em

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d, eig_l = _local_eig_full(f"{sf_dir}/embeddings.parquet")
    _, _, eig_d = em.pca_fit_moments(e, k=d)
    scale = max(abs(float(eig_l[0])), 1e-30)
    fits_agree = bool(
        max(abs(float(a) - float(b)) for a, b in zip(eig_d, eig_l))
        <= 1e-9 * scale
    )
    total = 0.0
    for v in eig_l:  # left-to-right fold, the list_reduce order
        total += float(v)
    if total <= 0.0:
        raise ValueError(
            "pca_variance_gate: degenerate corpus — total variance is "
            "zero, explained-variance ratios are undefined"
        )
    cum = []
    s = 0.0
    for v in eig_l:
        s += float(v)
        cum.append(s / total)
    rows = []
    for t_ppm in _VARIANCE_THRESHOLDS_PPM:
        t = t_ppm / 1_000_000.0
        k_star = 1 + sum(1 for c in cum if c < t)
        rows.append(
            (t_ppm, k_star, int(cum[k_star - 1] * 1_000_000.0), fits_agree)
        )
    return spark.createDataFrame(
        rows,
        "threshold_ppm bigint, k_star bigint, captured_ppm bigint,"
        " fits_agree boolean",
    )


def _pca_variance_gate_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r5 import (
        _dlit,
        _oracle_sf_dir,
    )

    path = f"{_oracle_sf_dir()}/embeddings.parquet"
    d, eig = _local_eig_full(path)
    e_lit = "[" + ", ".join(_dlit(x) for x in eig) + "]::DOUBLE[]"
    th = ", ".join(f"({t})" for t in _VARIANCE_THRESHOLDS_PPM)
    return f"""
WITH lit AS (SELECT {e_lit} AS e),
tot AS (SELECT list_reduce(e, (a, b) -> a + b) AS s FROM lit),
cum AS (
  SELECT j,
         list_reduce(e[1:j], (a, b) -> a + b) / s AS c
  FROM lit, tot, (SELECT unnest(range(1, {d + 1})) AS j)
),
th(t_ppm) AS (VALUES {th})
SELECT t_ppm::BIGINT AS threshold_ppm,
       min(j)::BIGINT AS k_star,
       floor(min_by(c, j) * 1000000.0)::BIGINT AS captured_ppm,
       TRUE AS fits_agree
FROM th JOIN cum ON c >= t_ppm / 1000000.0
GROUP BY t_ppm
"""


# ---------------------------------------------------------------------------
# Stateful streaming: cross-batch dedup + bounded-state HLL (round-10)
# ---------------------------------------------------------------------------

_stream_seq = 0


def _stage_as_stream(spark, df, tmp: str, n_files: int = 8) -> str:
    """Stage a DataFrame as a many-file streaming source directory (the
    r8 stream-gate staging pattern: per-file task parallelism)."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    stage = f"{tmp}/stage"
    df.repartition(n_files).write.parquet(stage)
    src = f"{tmp}/src"
    _os.makedirs(src)
    for i, p in enumerate(sorted(_glob.glob(f"{stage}/part-*.parquet"))):
        _shutil.copy(p, f"{src}/f{i}.parquet")
    return src


@_contextmanager
def _staged_stream_conf(spark, src: str, target_bytes: int = 32 << 20):
    """Scoped shuffle-partition conf for a staged-source streaming run
    (guide §2.2/§1.2: partition count derived from the data, set before
    the stateful exchange is planned).

    A streaming query fixes its stateful-exchange / foreachBatch
    partition count from ``spark.sql.shuffle.partitions`` at start; the
    session default is sized for corpus-scale batch work, so a staged
    micro-batch of a few MB pays ~32 state-store open/commit cycles for
    a few thousand rows (profiled r16: the batch job of
    stream_dedup_digests is 40 tasks / 0.95s, almost all state-store
    overhead). Derivation: ceil(staged_bytes / target_bytes), floored
    at the staged FILE count (per-file read parallelism) and capped at
    the session's configured value — so locally the tiny batch gets
    file-count partitions, and at corpus scale the derived count rises
    until the cap makes this a no-op (the admin-sized setting wins).
    Only valid for FRESH checkpoints: state partition counts persist in
    a checkpoint, so a restartable/durable stream must keep the session
    setting (stream_curation_durable is deliberately not wrapped)."""
    import math as _math
    import os as _os

    n_files, n_bytes = 0, 0
    for f in _os.listdir(src):
        p = _os.path.join(src, f)
        if _os.path.isfile(p):
            n_files += 1
            n_bytes += _os.path.getsize(p)
    key = "spark.sql.shuffle.partitions"
    session_n = int(spark.conf.get(key))
    derived = min(session_n,
                  max(n_files, _math.ceil(n_bytes / target_bytes), 1))
    spark.conf.set(key, str(derived))
    try:
        yield derived
    finally:
        spark.conf.set(key, str(session_n))


def stream_dedup_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming exact dedup end-to-end
    (streaming/events.py::stream_exact_dedup): the documents corpus as
    a file stream, content digests deduplicated across micro-batches in
    the state store (state = one row per distinct digest — the
    streaming twin of exact_dedup's groupBy index). Which doc survives
    per digest is arrival-order-dependent, so the oracled output is the
    order-free invariant: the kept DIGEST set, which must equal the
    corpus's distinct digest set exactly."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.streaming.events import (
        run_to_memory,
        stream_exact_dedup,
    )

    global _stream_seq
    _stream_seq += 1
    name = f"drv_stream_dedup_{_stream_seq}"

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.md5("text").alias("digest"))
    )
    tmp = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        src = _stage_as_stream(spark, d, tmp)
        stream = spark.readStream.schema(d.schema).parquet(src)
        kept = stream_exact_dedup(stream, ["digest"])
        with _staged_stream_conf(spark, src):
            run_to_memory(kept.select("digest"), name, timeout_s=300)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(name)


_STREAM_DEDUP_SQL = """
SELECT DISTINCT md5(text) AS digest FROM documents WHERE text IS NOT NULL
"""


def stream_hll_user_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming cardinality tracking end-to-end
    (streaming/events.py::stream_hll_registers): the events table as a
    file stream, per-event-type HLL registers maintained as a stateful
    streaming aggregation whose state is capped at groups x 2^p rows no
    matter how many events flow through (max is monotone — no
    watermark needed, complete-mode-safe forever). The final register
    table must equal the batch sketch of the whole corpus exactly,
    which is the same whole-corpus oracle the snapshot-merge query
    pins (register assignment and rho are integer-exact)."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.plans.driver_queries import _events
    from ncbi_analysis_spark.streaming.events import (
        run_to_memory,
        stream_hll_registers,
    )

    global _stream_seq
    _stream_seq += 1
    name = f"drv_stream_hll_{_stream_seq}"

    ev = _events(spark, sf_dir).select("event_type", "user_id")
    tmp = tempfile.mkdtemp(prefix="stream_hll_")
    try:
        src = _stage_as_stream(spark, ev, tmp)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        regs = stream_hll_registers(
            stream, "user_id", p=8, group_by=["event_type"]
        )
        with _staged_stream_conf(spark, src):
            run_to_memory(regs, name, timeout_s=300,
                          output_mode="complete")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(name)


# ---------------------------------------------------------------------------
# KMV sketch overlap (round-10)
# ---------------------------------------------------------------------------

_KMV_K = 64


def kmv_content_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-overlap bookkeeping from published sketches, end-to-end
    (operators/sketches.py::kmv_sketch/kmv_merge/kmv_estimate/
    kmv_jaccard): two overlapping "crawl snapshots" of the documents
    corpus (doc_id % 3 != 0 vs % 2 != 0 — ids coprime to 6 land in
    both, exact content Jaccard ~0.4), per-language KMV sketches of the
    distinct text digests (k=64: 'en' saturates both snapshots, the
    smaller languages stay unsaturated — both estimator branches on the
    oracled rows), merged-union estimate and sketch-Jaccard
    side-by-side with the exact intersection/union/Jaccard so each row
    shows the estimator's error.

    Every column is an integer count or ONE IEEE division of exact
    integers (the 52-bit hash space keeps ``(k-1) * 2^52`` exactly
    representable) — bit-exact cross-engine, no transcendentals."""
    from ncbi_analysis_spark.operators.sketches import (
        kmv_estimate,
        kmv_jaccard,
        kmv_merge,
        kmv_sketch,
    )

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .filter(F.col("text").isNotNull())
    )
    snap_a = d.filter(F.col("doc_id") % 3 != 0)
    snap_b = d.filter(F.col("doc_id") % 2 != 0)
    ka = kmv_sketch(snap_a, "text", k=_KMV_K, group_by=["lang"])
    kb = kmv_sketch(snap_b, "text", k=_KMV_K, group_by=["lang"])
    jac = kmv_jaccard(ka, kb, _KMV_K, group_by=["lang"])
    est_u = kmv_estimate(
        kmv_merge(ka, kb, _KMV_K, group_by=["lang"]),
        _KMV_K,
        group_by=["lang"],
    ).select("lang", F.col("est_distinct").alias("est_union_distinct"))
    per_h = d.groupBy("lang", F.md5("text").alias("h")).agg(
        F.max(
            F.when(F.col("doc_id") % 3 != 0, 1).otherwise(0)
        ).alias("a"),
        F.max(
            F.when(F.col("doc_id") % 2 != 0, 1).otherwise(0)
        ).alias("b"),
    )
    exact = (
        per_h.filter((F.col("a") == 1) | (F.col("b") == 1))
        .groupBy("lang")
        .agg(
            F.sum(F.col("a") * F.col("b")).cast("long").alias("exact_inter"),
            F.count("*").cast("long").alias("exact_union"),
        )
        .withColumn(
            "exact_jaccard",
            F.col("exact_inter").cast("double")
            / F.col("exact_union").cast("double"),
        )
    )
    return jac.join(est_u, "lang").join(exact, "lang")


def _kmv_overlap_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r5 import _dlit

    k = _KMV_K
    # (k-1) * 2^52, exactly representable — DuckDB would otherwise
    # parse the product as DECIMAL arithmetic and overflow
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
nu AS (
  SELECT lang, count(*)::BIGINT AS n_union_sketch, max(h) AS kth
  FROM su GROUP BY lang
),
ni AS (
  SELECT su.lang, count(*)::BIGINT AS n_inter
  FROM su
  WHERE EXISTS (SELECT 1 FROM sa WHERE sa.lang = su.lang AND sa.h = su.h)
    AND EXISTS (SELECT 1 FROM sb WHERE sb.lang = su.lang AND sb.h = su.h)
  GROUP BY su.lang
),
per AS (
  SELECT lang, md5(text) AS hh,
         max(CASE WHEN doc_id % 3 != 0 THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN doc_id % 2 != 0 THEN 1 ELSE 0 END) AS b
  FROM d GROUP BY lang, md5(text)
),
ex AS (
  SELECT lang, sum(a * b)::BIGINT AS exact_inter,
         count(*)::BIGINT AS exact_union
  FROM per WHERE a = 1 OR b = 1 GROUP BY lang
)
SELECT nu.lang, nu.n_union_sketch,
       COALESCE(ni.n_inter, 0)::BIGINT AS n_inter,
       COALESCE(ni.n_inter, 0)::DOUBLE / nu.n_union_sketch::DOUBLE
         AS jaccard_est,
       CASE WHEN nu.n_union_sketch < {k} THEN nu.n_union_sketch::DOUBLE
            ELSE {numer} / nu.kth::DOUBLE
       END AS est_union_distinct,
       ex.exact_inter, ex.exact_union,
       ex.exact_inter::DOUBLE / ex.exact_union::DOUBLE AS exact_jaccard
FROM nu LEFT JOIN ni ON nu.lang = ni.lang
JOIN ex ON nu.lang = ex.lang
"""


# ---------------------------------------------------------------------------
# BM25 retrieval (round-10)
# ---------------------------------------------------------------------------

_BM25_QUERY = "dup merge stream"


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval end-to-end
    (operators/retrieval.py::bm25_topk): top-10 documents for a query
    mixing one rare term ('dup', df≈25 at sf0.01) with two
    near-ubiquitous ones — the idf spread that separates BM25 from
    plain tf counting. idf is computed once driver-side in Python from
    exact integer (N, df) and injected as literals; every other op is
    pinned IEEE arithmetic with a term-order contribution fold, so the
    oracle — which recomputes df/N/avgdl AND the log independently
    (DuckDB ln, bit-identical to Python's math.log on this platform,
    probed in tests) — matches the raw doubles exactly."""
    from ncbi_analysis_spark.operators.retrieval import bm25_topk

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return bm25_topk(d, _BM25_QUERY, k=10)


def _bm25_sql(k: int = 10) -> str:
    from ncbi_analysis_spark.operators.retrieval import query_terms

    terms = query_terms(_BM25_QUERY)
    in_list = ", ".join(f"'{t}'" for t in terms)
    vals = ", ".join(f"('{t}')" for t in terms)
    return rf"""
WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
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
  FROM (VALUES {vals}) t(g)
  LEFT JOIN dfv ON t.g = dfv.g CROSS JOIN st
),
scored AS (
  SELECT tf.doc_id, tf.g,
         m.idf * (tf.tf::DOUBLE /
           (tf.tf::DOUBLE + 1.2 * ((1.0 - 0.75) + 0.75 *
             (dl.dl::DOUBLE / (st.s::DOUBLE / st.n::DOUBLE))))) AS contrib
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN model m ON tf.g = m.g
  CROSS JOIN st
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_terms_matched,
         list_reduce(list_prepend(0.0, list(contrib ORDER BY g)),
                     (a, b) -> a + b) AS score
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_terms_matched, score
FROM agg ORDER BY score DESC, doc_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Reciprocal-rank-fusion hybrid search (round-10)
# ---------------------------------------------------------------------------

_RRF_LIST_K = 50
_RRF_OUT_K = 20


def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion
    (operators/retrieval.py::rrf_fuse): the BM25 top-50 for the
    standing query fused with a length-prior top-50 (n_chars — the
    score-scale-incompatible second signal RRF exists for), top-20 by
    fused score. Ranks come from row_number over each BOUNDED top-50
    list (TakeOrderedAndProject feeds a <=50-row window — not a corpus
    funnel); the fuse itself is rrf_fuse's pinned (list, rank)-ordered
    fold, so the oracle's identical fold matches bit-for-bit. Ties
    across the output cut (single-list docs at equal rank score
    identically) break on doc_id in both engines."""
    from ncbi_analysis_spark.operators.retrieval import bm25_topk, rrf_fuse
    from pyspark.sql.window import Window

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    bm = bm25_topk(
        d.select("doc_id", "text"), _BM25_QUERY, k=_RRF_LIST_K
    ).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long")
        .alias("rk"),
    )
    lp = (
        d.select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(_RRF_LIST_K)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("n_chars"), F.asc("doc_id")))
            .cast("long")
            .alias("rk"),
        )
    )
    return (
        rrf_fuse([bm, lp])
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(_RRF_OUT_K)
    )


def _rrf_sql() -> str:
    return f"""
WITH bm AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM ({_bm25_sql(_RRF_LIST_K)})
),
lp AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
  FROM (
    SELECT doc_id, n_chars FROM documents
    WHERE text IS NOT NULL AND n_chars IS NOT NULL
    ORDER BY n_chars DESC, doc_id LIMIT {_RRF_LIST_K}
  )
),
u AS (
  SELECT doc_id, 0 AS src, rk FROM bm
  UNION ALL
  SELECT doc_id, 1 AS src, rk FROM lp
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_lists,
         list_reduce(
           list_prepend(0.0,
             list(1.0 / (60.0 + rk::DOUBLE) ORDER BY src, rk)),
           (a, b) -> a + b) AS rrf_score
  FROM u GROUP BY doc_id
)
SELECT doc_id, n_lists, rrf_score
FROM agg ORDER BY rrf_score DESC, doc_id LIMIT {_RRF_OUT_K}
"""


# ---------------------------------------------------------------------------
# PCA-shortlist ANN (round-10)
# ---------------------------------------------------------------------------

_PCA_RERANK_SHORTLIST = 40


def ann_pca_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-reduced shortlist + exact re-rank search end-to-end
    (operators/similarity_search.py::reduced_rerank_topk): the standing
    48-query batch, candidates shortlisted by cosine in the 8-dim PCA
    space (the deterministic sampled fit — the oracle-pinned model),
    exact full-dimension re-rank to top-10. The search tier between
    brute force (d-dim scan) and IVF (bucket pruning): k/d the scan
    bandwidth, no buckets to mis-probe.

    Generated oracle: pca_fit_local's bit-identical model embedded as
    frexp literals; the SQL recomputes both projections, the reduced
    shortlist rank, and the exact re-rank with the same pinned folds."""
    from ncbi_analysis_spark.operators import embeddings as em
    from ncbi_analysis_spark.operators.similarity_search import (
        reduced_rerank_topk,
    )
    from ncbi_analysis_spark.plans.driver_queries_r10 import _PCA_PARAMS

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 48).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    mean, comps, _ = em.pca_fit(e, **_PCA_PARAMS)
    out = reduced_rerank_topk(
        e, q, mean, comps, k=10, shortlist=_PCA_RERANK_SHORTLIST
    )
    return out.withColumn("rk", F.col("rk").cast("long"))


def _ann_pca_rerank_sql() -> str:
    import numpy as np

    from ncbi_analysis_spark.operators.embeddings import pca_fit_local
    from ncbi_analysis_spark.plans.driver_queries import _cos_sql
    from ncbi_analysis_spark.plans.driver_queries_r5 import (
        _dlit,
        _oracle_sf_dir,
    )
    from ncbi_analysis_spark.plans.driver_queries_r10 import _PCA_PARAMS

    mean, comps, _ = pca_fit_local(
        f"{_oracle_sf_dir()}/embeddings.parquet", **_PCA_PARAMS
    )
    k, d = comps.shape
    CT = comps.T
    ct_lit = "[" + ", ".join(
        "[" + ", ".join(_dlit(x) for x in CT[t]) + "]" for t in range(d)
    ) + "]::DOUBLE[][]"
    mc = [float(np.dot(mean, comps[j])) for j in range(k)]
    mc_lit = "[" + ", ".join(_dlit(x) for x in mc) + "]::DOUBLE[]"
    sl = _PCA_RERANK_SHORTLIST
    return f"""
WITH lit AS (SELECT {ct_lit} AS CT, {mc_lit} AS MC),
pc AS (
  SELECT vec_id,
         list_transform(range({k}), j ->
           list_reduce(list_transform(range({d}),
                       t -> embedding[t + 1]::DOUBLE * CT[t + 1][j + 1]),
                       (a, b) -> a + b) - MC[j + 1]) AS pv
  FROM embeddings CROSS JOIN lit
),
pq AS (SELECT vec_id AS q_id, pv AS qv FROM pc WHERE vec_id < 48),
shortscore AS (
  SELECT pq.q_id, c.vec_id,
         ROUND({_cos_sql('pq.qv', 'c.pv')}, 6) AS s
  FROM pc c CROSS JOIN pq
),
short AS (
  SELECT q_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY s DESC, vec_id) AS rn
    FROM shortscore
  ) WHERE rn <= {sl}
),
qe AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
       WHERE vec_id < 48),
scored AS (
  SELECT s.q_id, s.vec_id,
         ROUND({_cos_sql('qe.qv', 'e.embedding')}, 6) AS cos_sim
  FROM short s
  JOIN embeddings e ON s.vec_id = e.vec_id
  JOIN qe ON s.q_id = qe.q_id
)
SELECT q_id, vec_id, cos_sim, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, vec_id)::BIGINT
            AS rk
  FROM scored
) WHERE rk <= 10
"""


# ---------------------------------------------------------------------------
# HLL cube (round-10)
# ---------------------------------------------------------------------------


def hll_user_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count cube from one corpus scan
    (operators/sketches.py::hll_cube): the (event_type, day) fine-grain
    register table computed once, every coarser grouping set — by
    type, by day, overall — derived by register-wise max rollups that
    never re-touch the corpus. Output is all four grouping sets'
    register tables with SQL GROUPING-style ids.

    The oracle computes each grouping set's registers DIRECTLY from
    events, so exact match proves rollup-from-fine == sketch-from-
    corpus for every set — the hll_merge contract generalized to
    arbitrary partitions. Integer-exact throughout."""
    from ncbi_analysis_spark.operators.sketches import hll_cube
    from ncbi_analysis_spark.plans.driver_queries import _events

    ev = (
        _events(spark, sf_dir)
        .select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "user_id",
        )
    )
    return hll_cube(ev, "user_id", ["event_type", "day"], p=8)


_HLL_CUBE_SQL = """
WITH vals AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id
  FROM events WHERE user_id IS NOT NULL
),
rr AS (
  SELECT event_type, day,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::BIGINT AS register,
         ('0x' || substr(md5(user_id::VARCHAR), 3, 13))::BIGINT AS w
  FROM vals
),
r2 AS (
  SELECT event_type, day, register,
         CASE WHEN w = 0 THEN 53
              ELSE 52 - length(bin(w)) + 1 END AS rho
  FROM rr
)
SELECT event_type, day, 0::INT AS grouping_id,
       register::INT AS register, max(rho)::INT AS max_rho
FROM r2 GROUP BY event_type, day, register
UNION ALL
SELECT event_type, NULL, 1::INT, register::INT, max(rho)::INT
FROM r2 GROUP BY event_type, register
UNION ALL
SELECT NULL, day, 2::INT, register::INT, max(rho)::INT
FROM r2 GROUP BY day, register
UNION ALL
SELECT NULL, NULL, 3::INT, register::INT, max(rho)::INT
FROM r2 GROUP BY register
"""


# ---------------------------------------------------------------------------
# Vocabulary drift monitor (round-10)
# ---------------------------------------------------------------------------

_DRIFT_BUCKETS = 256


def vocab_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus distribution-shift monitoring end-to-end
    (operators/drift.py): the chi-square-style drift between two
    snapshots' hashed-unigram distributions (here the en vs non-en
    slices of documents — a real, large shift), reported as the top-10
    most-drifted buckets with the dominant witness token per side,
    each row also carrying the pinned-fold global drift statistic.

    Everything on the oracled path is integer counts, two exact
    divisions, rational contrib arithmetic in a pinned shape, and a
    bucket-order-pinned fold (the hll_estimate pattern) — no
    transcendentals, bit-exact cross-engine."""
    from ncbi_analysis_spark.operators.drift import (
        drift_statistic,
        token_bucket_counts,
        top_drifted_tokens,
        vocab_drift,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "lang", "text"
    )
    a = d.filter(F.col("lang") == "en")
    b = d.filter(F.col("lang") != "en")
    # tokenize each side ONCE; drift histogram + witness ranks both
    # derive from the persisted per-token tables. The k-row report is
    # materialized eagerly so the caches can be released before return
    # (bench/soak sessions invoke this repeatedly).
    ca = token_bucket_counts(a, n_buckets=_DRIFT_BUCKETS).persist()
    cb = token_bucket_counts(b, n_buckets=_DRIFT_BUCKETS).persist()
    try:
        drift = vocab_drift(
            a, b, n_buckets=_DRIFT_BUCKETS, a_counts=ca, b_counts=cb
        )
        top = top_drifted_tokens(
            a, b, drift, k=10, n_buckets=_DRIFT_BUCKETS,
            a_counts=ca, b_counts=cb,
        )
        stat = drift_statistic(drift)
        out = top.crossJoin(F.broadcast(stat))
        rows = out.collect()  # bounded: k rows
        return spark.createDataFrame(rows, out.schema)
    finally:
        ca.unpersist()
        cb.unpersist()


def _vocab_drift_sql() -> str:
    n = _DRIFT_BUCKETS
    side = (
        "SELECT ('0x' || substr(md5(g), 1, 8))::BIGINT % {n} AS bucket,"
        " count(*)::BIGINT AS {cnt}"
        " FROM (SELECT UNNEST(string_split_regex(TRIM(text), '\\s+')) AS g"
        "       FROM documents WHERE {cond}) WHERE length(g) > 0"
        " GROUP BY 1"
    )
    wit = (
        "SELECT bucket, g FROM ("
        "  SELECT bucket, g, count(*) AS c,"
        "         row_number() OVER (PARTITION BY bucket"
        "                            ORDER BY count(*) DESC, g) AS rn"
        "  FROM (SELECT ('0x' || substr(md5(g), 1, 8))::BIGINT % {n}"
        "               AS bucket, g"
        "        FROM (SELECT UNNEST(string_split_regex(TRIM(text),"
        "              '\\s+')) AS g FROM documents WHERE {cond})"
        "        WHERE length(g) > 0)"
        "  WHERE bucket IN (SELECT bucket FROM top) GROUP BY bucket, g"
        ") WHERE rn = 1"
    )
    return f"""
WITH ba AS ({side.format(n=n, cnt='n_a', cond="lang = 'en'")}),
bb AS ({side.format(n=n, cnt='n_b', cond="lang != 'en'")}),
m AS (
  SELECT COALESCE(ba.bucket, bb.bucket) AS bucket,
         COALESCE(n_a, 0)::BIGINT AS n_a,
         COALESCE(n_b, 0)::BIGINT AS n_b
  FROM ba FULL OUTER JOIN bb ON ba.bucket = bb.bucket
),
tot AS (SELECT sum(n_a)::BIGINT AS ta, sum(n_b)::BIGINT AS tb FROM m),
p AS (
  SELECT bucket, n_a, n_b,
         n_a::DOUBLE / ta::DOUBLE AS p_a,
         n_b::DOUBLE / tb::DOUBLE AS p_b
  FROM m, tot
),
c AS (
  SELECT *, CASE WHEN p_a + p_b > 0
                 THEN ((p_a - p_b) * (p_a - p_b)) / (p_a + p_b)
                 ELSE 0.0 END AS contrib
  FROM p
),
stat AS (
  SELECT count(*)::BIGINT AS n_buckets_seen,
         list_reduce(
           list_prepend(0.0, list(contrib ORDER BY bucket)),
           (x, y) -> x + y) AS drift_stat
  FROM c
),
top AS (
  SELECT bucket, n_a, n_b, p_a, p_b, contrib
  FROM c ORDER BY contrib DESC, bucket LIMIT 10
),
wa AS ({wit.format(n=n, cond="lang = 'en'")}),
wb AS ({wit.format(n=n, cond="lang != 'en'")})
SELECT top.bucket, top.n_a, top.n_b, top.p_a, top.p_b, top.contrib,
       wa.g AS top_token_a, wb.g AS top_token_b,
       stat.n_buckets_seen, stat.drift_stat
FROM top
LEFT JOIN wa ON top.bucket = wa.bucket
LEFT JOIN wb ON top.bucket = wb.bucket
CROSS JOIN stat
"""


def queries_r11() -> dict:
    return {
        "hll_merge_snapshots": hll_merge_snapshots,
        "pca_variance_gate": pca_variance_gate,
        "kmv_content_overlap": kmv_content_overlap,
        "stream_dedup_digests": stream_dedup_digests,
        "stream_hll_user_distinct": stream_hll_user_distinct,
        "vocab_drift_report": vocab_drift_report,
        "hll_user_cube": hll_user_cube,
        "ann_pca_rerank": ann_pca_rerank,
        "bm25_search": bm25_search,
        "rrf_hybrid_search": rrf_hybrid_search,
    }


def oracle_sql_r11() -> dict[str, str]:
    return {
        "hll_merge_snapshots": _HLL_MERGE_SQL,
        "pca_variance_gate": _pca_variance_gate_sql(),
        "kmv_content_overlap": _kmv_overlap_sql(),
        "stream_dedup_digests": _STREAM_DEDUP_SQL,
        "stream_hll_user_distinct": _HLL_MERGE_SQL,
        "vocab_drift_report": _vocab_drift_sql(),
        "hll_user_cube": _HLL_CUBE_SQL,
        "ann_pca_rerank": _ann_pca_rerank_sql(),
        "bm25_search": _bm25_sql(),
        "rrf_hybrid_search": _rrf_sql(),
    }
