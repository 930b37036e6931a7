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
        "curation_v4": curation_v4,
        "pack_bpe_budget": pack_bpe_budget,
        "video_frame_near_dup": video_frame_near_dup,
        "unicode_normalize": unicode_normalize,
        "lsh_recall_audit": lsh_recall_audit_query,
        "cluster_diversity_sample": cluster_diversity_sample,
        "ann_recall_audit": ann_recall_audit_query,
        "pca_embedding_project": pca_embedding_project,
        "hll_user_distinct": hll_user_distinct,
        "zorder_layout_events": zorder_layout_events,
    }


def oracle_sql_r10() -> dict[str, str]:
    return {
        "image_phash_near_dup": _PHASH_NEAR_DUP_SQL,
        "source_curation_report": _source_report_sql(),
        "curation_v4": _curation_v4_sql(),
        "pack_bpe_budget": _pack_bpe_sql(),
        "video_frame_near_dup": _VIDEO_NEAR_DUP_SQL,
        "unicode_normalize": _unicode_normalize_sql(),
        "lsh_recall_audit": _lsh_recall_audit_sql(),
        "cluster_diversity_sample": _cluster_diversity_sql(),
        "ann_recall_audit": _ann_recall_audit_sql(),
        "pca_embedding_project": _pca_project_sql(),
        "hll_user_distinct": _hll_user_distinct_sql(),
        "zorder_layout_events": _zorder_layout_sql(),
    }


def ann_recall_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index-quality audit end-to-end (operators/similarity_search
    .py::ann_recall_audit): per-query measured recall@10 of the
    first-8-centroid IVF at nprobe=2 against the exact brute-force
    top-10, for the standing 48-query batch (the ann_ivf/ann_brute_force
    configuration — so the audit measures exactly the index the other
    driver queries exercise). Measured spread at sf0.01: per-query
    recall 0.1-1.0, mean ~0.55 — nprobe=2 of 8 buckets genuinely loses
    neighbors on this distribution, which is precisely what the audit
    exists to surface.

    Oracle: the two proven SQL mirrors (ANN_BF_SQL / ANN_IVF_SQL)
    composed as CTE legs plus an independent overlap count."""
    from ncbi_analysis_spark.operators.similarity_search import (
        ann_recall_audit,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 48).select(
        F.col("vec_id").alias("q_id"), "embedding")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding")
    return ann_recall_audit(e, q, cents, k=10, nprobe=2)


def _ann_recall_audit_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries import (
        ANN_BF_SQL,
        ANN_IVF_SQL,
    )

    return f"""
WITH exact AS ({ANN_BF_SQL}),
approx AS ({ANN_IVF_SQL}),
j AS (
  SELECT COALESCE(e.q_id, a.q_id) AS q_id,
         (e.vec_id IS NOT NULL)::INT AS in_exact,
         (a.vec_id IS NOT NULL)::INT AS in_approx
  FROM exact e FULL OUTER JOIN approx a
    ON e.q_id = a.q_id AND e.vec_id = a.vec_id
)
SELECT q_id, SUM(in_exact)::BIGINT AS n_exact,
       SUM(in_approx)::BIGINT AS n_approx,
       SUM(in_exact * in_approx)::BIGINT AS n_hit,
       (CASE WHEN SUM(in_exact) > 0
             THEN ROUND(SUM(in_exact * in_approx) * 1.0 / SUM(in_exact), 6)
        END) AS recall
FROM j GROUP BY q_id
"""


def cluster_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced diversity sampling end-to-end (operators/
    scale.py::cluster_balanced_sample — the D4/SemDeDup density
    flattener): train the k=8 spherical quantizer on the embedding
    corpus (train_ivf_centroids, the proven ann_ivf_trained params),
    assign every vector to its nearest centroid as a pure map, keep at
    most 60 per cluster in the rerun-stable md5 order. The trained
    cluster sizes at sf0.01 span 56-72, so the cap truncates SOME
    clusters and keeps others whole — both branches exercised.

    Generated oracle (the ann_ivf_trained pattern): centroids re-derived
    Spark-free by train_ivf_centroids_local and spliced in as exact
    frexp literals; assignment fold-order and tie-break replicated, the
    per-cluster rank replayed as a window."""
    from ncbi_analysis_spark.operators.scale import cluster_balanced_sample
    from ncbi_analysis_spark.operators.similarity_search import (
        train_ivf_centroids,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import _TRAIN_PARAMS

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_ivf_centroids(e, **_TRAIN_PARAMS)
    return cluster_balanced_sample(
        e, cents, per_cluster=60, salt="diversity"
    )


def _cluster_diversity_sql() -> str:
    from ncbi_analysis_spark.operators.similarity_search import (
        train_ivf_centroids_local,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import (
        _DOT,
        _TRAIN_PARAMS,
        _dlit,
        _oracle_sf_dir,
    )

    C = train_ivf_centroids_local(
        f"{_oracle_sf_dir()}/embeddings.parquet", **_TRAIN_PARAMS
    )
    rows = ",\n  ".join(
        f"({i}, [{', '.join(_dlit(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(C)
    )
    return f"""
WITH cent AS (SELECT * FROM (VALUES
  {rows}
) AS t(c_id, cv)),
corpus AS (SELECT vec_id, embedding AS v FROM embeddings),
assign0 AS (
  -- dot(v, c) / ||c|| — same formula and fold order as ivf_assign's
  -- map-side argmax (the ||v|| division is skipped on both sides: a
  -- positive per-row constant can't change the argmax or tie-break)
  SELECT c.vec_id, ct.c_id,
         (CASE WHEN sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) = 0 THEN 0.0
               ELSE {_DOT.format(a='c.v', b='ct.cv')}
                    / sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) END) AS sim
  FROM corpus c CROSS JOIN cent ct
),
assign AS (SELECT vec_id, c_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_id) AS rn
  FROM assign0
) WHERE rn = 1)
SELECT vec_id, c_id::BIGINT AS c_id, rk FROM (
  SELECT vec_id, c_id,
         ROW_NUMBER() OVER (PARTITION BY c_id
           ORDER BY md5('diversity|' || vec_id::VARCHAR), vec_id)::BIGINT AS rk
  FROM assign
) WHERE rk <= 60
"""


def lsh_recall_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH parameter audit end-to-end (operators/dedup.py::
    lsh_recall_audit): measured recall/precision of (num_perm=8,
    bands=4) MinHash banding vs exact shingle Jaccard at threshold 0.5,
    on the deterministic md5 half-sample. Two near-dup populations are
    planted so the s-curve is exercised on BOTH flanks: %9 docs get a
    3-word-appended twin (Jaccard ~0.9 — the s-curve's near-certain
    region), %11 docs a self-reversed-suffix twin (Jaccard straddling
    ~0.5 — the region where banding genuinely loses pairs, so recall
    lands strictly between 0 and 1 and the audit is a real measurement,
    not a tautology).

    The oracle recomputes BOTH legs independently in DuckDB (brute
    all-pairs Jaccard; md5 minhash + band collision) and the same
    confusion counts — exact match pins the measured recall itself."""
    from ncbi_analysis_spark.operators.dedup import lsh_recall_audit

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = d.select("doc_id", "text")
    var_a = base.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz1 zz2 zz3")).alias("text"),
    )
    var_b = base.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" "),
            F.array_join(F.reverse(F.split(F.trim(F.col("text")), r"\s+")), " "),
        ).alias("text"),
    )
    corpus = base.unionByName(var_a).unionByName(var_b)
    return lsh_recall_audit(
        corpus, "text", "doc_id", threshold=0.5, num_perm=8, bands=4,
        shingle_n=3, sample_mod=2, salt="audit",
    )


def _lsh_recall_audit_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries import _SHINGLES_SQL

    mins = ",\n        ".join(
        f"list_aggregate(list_transform(sh, x -> md5('{i}|' || x)), 'min') AS mh{i}"
        for i in range(8)
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || ',' || mh{2 * b + 1}) AS bh FROM m"
        for b in range(4)
    )
    return f"""
WITH base AS (SELECT doc_id, text FROM documents),
var_a AS (SELECT doc_id + 1000000 AS doc_id, text || ' zz1 zz2 zz3' AS text
          FROM base WHERE doc_id % 9 = 0),
var_b AS (SELECT doc_id + 2000000 AS doc_id,
                 text || ' ' || array_to_string(
                   list_reverse(string_split_regex(trim(text), '\\s+')), ' ') AS text
          FROM base WHERE doc_id % 11 = 0),
corpus AS (SELECT * FROM base UNION ALL SELECT * FROM var_a
           UNION ALL SELECT * FROM var_b),
s AS (SELECT * FROM corpus
      WHERE ('0x' || substr(md5('audit|' || doc_id::VARCHAR), 1, 8))::BIGINT % 2 = 0),
sh AS (SELECT doc_id, UNNEST(list_distinct({_SHINGLES_SQL})) AS sh FROM s),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
truth AS (SELECT id_a, id_b
          FROM common JOIN sizes sa ON sa.doc_id = id_a
                      JOIN sizes sb ON sb.doc_id = id_b
          WHERE ROUND(c / (sa.n + sb.n - c), 6) >= 0.5),
shg AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM s),
m AS (SELECT doc_id,
        {mins}
      FROM shg),
bands AS (
  {band_rows}
),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
counts AS (
  SELECT (SELECT COUNT(*) FROM s)::BIGINT AS n_sample,
         (SELECT COUNT(*) FROM truth)::BIGINT AS n_true,
         (SELECT COUNT(*) FROM cand)::BIGINT AS n_cand,
         (SELECT COUNT(*) FROM truth t JOIN cand c
            ON t.id_a = c.id_a AND t.id_b = c.id_b)::BIGINT AS n_hit
)
SELECT n_sample, n_true, n_cand, n_hit,
  (CASE WHEN n_true > 0 THEN ROUND(n_hit * 1.0 / n_true, 6) END) AS recall,
  (CASE WHEN n_cand > 0 THEN ROUND(n_hit * 1.0 / n_cand, 6) END) AS precision
FROM counts
"""


def unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode normalization end-to-end (functions/text.py::
    normalize_unicode_np — NFC + accent folding + lowercase + ASCII-ws
    collapse): the corpus is pure-ASCII, so denormalized variants are
    planted deterministically — %4==0 docs get a DECOMPOSED accent
    prefix ('Cafe' + U+0301), %4==1 the PRECOMPOSED spelling of the
    same word (U+00E9), %4==2 an uppercased decomposed-diaeresis prefix
    with doubled whitespace, %4==3 stay untouched. The canonical-
    equivalence property under test: variants 0 and 1 — byte-different,
    hash-different, dedup-defeating — must normalize to the IDENTICAL
    string.

    The oracle is a different implementation by construction: DuckDB's
    utf8proc-backed ``nfc_normalize``/``strip_accents`` vs Python's
    ``unicodedata`` (probed equivalent on composed/decomposed Latin,
    ligatures, the ohm sign, fullwidth forms). Exact hash match proves
    cross-library Unicode agreement, not plan mirroring."""
    from ncbi_analysis_spark.functions.text import normalize_unicode_np

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = F.col("doc_id") % 4
    # explicit escapes: %4==0 plants the DECOMPOSED form (e + combining
    # acute U+0301), %4==1 the PRECOMPOSED code point U+00E9 --
    # byte-different spellings of the same canonical string
    v = d.select(
        "doc_id",
        F.when(m == 0, F.concat(F.lit("Cafe\u0301 "), F.col("text")))
        .when(m == 1, F.concat(F.lit("Caf\u00e9 "), F.col("text")))
        .when(m == 2, F.concat(F.lit("NAI\u0308VE  "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return normalize_unicode_np(
        v, strip_marks=True, lower=True, collapse_ws=True
    )


def _unicode_normalize_sql() -> str:
    from ncbi_analysis_spark.functions.text import _ASCII_WS_RE

    return f"""
WITH v AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'Cafe' || chr(769) || ' ' || text
      WHEN 1 THEN 'Caf' || chr(233) || ' ' || text
      WHEN 2 THEN 'NAI' || chr(776) || 'VE  ' || text
      ELSE text END AS t
  FROM documents
),
n AS (
  SELECT doc_id, t,
    trim(regexp_replace(lower(strip_accents(nfc_normalize(t))),
                        '{_ASCII_WS_RE}', ' ', 'g')) AS text_norm
  FROM v
)
SELECT doc_id, text_norm,
  (CASE WHEN text_norm <> t THEN 1 ELSE 0 END)::BIGINT AS changed,
  length(t)::BIGINT AS n_before,
  length(text_norm)::BIGINT AS n_after
FROM n
"""


def curation_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship curation v4 — the round-9 operator family composed into
    one pipeline, every stage an already-oracled primitive:

      1. domain gate (``operators.domains``): drop whole sources whose
         aggregate quality/repetition fails the provenance thresholds;
      2. fuzzy decontamination (``fuzzy_decon_pairs``): drop surviving
         docs MinHash-band-colliding with the held-out %7 benchmark;
      3. repetition gate (``functions.text.repetition_metrics`` — the
         expr/np auto twin): drop docs failing the Gopher word-level
         rules;
      4. quality quantile gate (``scale.filter_by_quantile``): keep the
         top quartile by composite quality score.

    Returns the curated ``(doc_id, source, quality)`` set. The oracle
    recomputes all four stages in one DuckDB CTE chain (domain
    aggregate -> band-collision set -> lateral-unnest repetition
    metrics -> distinct-score cumulative quantile scan), so stage
    boundaries AND values must agree bit-exactly end to end.

    Scale shape: stage 1 is one source-keyed aggregate + broadcast
    anti-join; stage 2 shuffles band digests only with the bench side
    broadcast; stage 3 is map-only (Arrow twin past 1000 rows); stage 4
    is the bounded distinct-score scan + broadcast threshold. No stage
    shuffles document text except the decon shingle explode."""
    from ncbi_analysis_spark.functions import text as textf
    from ncbi_analysis_spark.operators import scale
    from ncbi_analysis_spark.operators.dedup import fuzzy_decon_pairs
    from ncbi_analysis_spark.operators.domains import (
        derive_source_blocklist,
        filter_by_source_blocklist,
        source_quality_report,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text")
    # 1 — provenance gate over the full corpus
    rep = source_quality_report(d)
    bl = derive_source_blocklist(
        rep, max_dup_frac=1.0, min_mean_quality=0.79,
        max_repetitive_frac=0.60)
    gated = filter_by_source_blocklist(d, bl)
    # 2 — decon: %7 docs are the held-out benchmark (never gated)
    corpus = gated.filter(F.col("doc_id") % 7 != 0)
    bench = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("bench_id"), "text")
    flagged = fuzzy_decon_pairs(
        corpus, bench, "text", "doc_id", bench_id_col="bench_id",
        num_perm=4, bands=2).select("doc_id").distinct()
    s1 = corpus.join(flagged, "doc_id", "left_anti")
    # 3 — Gopher repetition gate (r9 thresholds)
    m = textf.repetition_metrics(s1, keep=("doc_id", "source", "text"))
    m = m.select(
        "doc_id", "source", "text",
        *[F.round(F.col(c), 6).alias(c) for c in textf.REPETITION_METRIC_COLS])
    rep_flag = (
        (F.col("dup_word_frac") > 0.65)
        | (F.col("top_bigram_frac") > 0.08)
        | (F.col("top_trigram_frac") > 0.18)
        | (F.col("mean_word_len") < 3.0)
        | (F.col("mean_word_len") > 10.0)
    )
    s2 = m.filter(~rep_flag).select("doc_id", "source", "text")
    # 4 — keep the top quartile by composite quality
    t = F.col("text")
    scored = s2.select(
        "doc_id", "source",
        F.round(textf.quality_score(t, textf.tokens(F.lower(t))), 6)
        .alias("quality"))
    return scale.filter_by_quantile(scored, "quality", 0.75)


def _curation_v4_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries import (
        _LTOKS,
        _SHINGLES_SQL,
        _TOKS,
    )

    stop = "['the', 'of', 'and', 'to', 'a', 'in', 'is', 'that', 'it', 'for']"
    alpha = ("(CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE "
             "LENGTH(regexp_replace(LOWER(text), '[^a-z ]', '', 'g'))"
             " / LENGTH(text) END)")
    stopr = (f"(CASE WHEN len({_LTOKS}) = 0 THEN 0.0 ELSE "
             f"len(list_filter({_LTOKS}, t -> list_contains({stop}, t)))"
             f" / len({_LTOKS}) END)")
    tokc = f"(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE len({_TOKS}) END)"
    quality = (f"(0.4 * LEAST(1.0, {tokc}::DOUBLE / 64.0) + 0.3 * {alpha} "
               f"+ 0.3 * (1.0 - ABS({stopr} - 0.4)))")
    dupw = ("(CASE WHEN len(ws) <= 0 THEN 0.0 ELSE "
            "1.0 - len(list_distinct(ws)) * 1.0 / len(ws) END)")
    mh = """
  SELECT doc_id,
        list_aggregate(list_transform(sh, x -> md5('0|' || x)), 'min') AS mh0,
        list_aggregate(list_transform(sh, x -> md5('1|' || x)), 'min') AS mh1,
        list_aggregate(list_transform(sh, x -> md5('2|' || x)), 'min') AS mh2,
        list_aggregate(list_transform(sh, x -> md5('3|' || x)), 'min') AS mh3
  FROM SHG"""
    band_rows = """
  SELECT doc_id, 0 AS band, md5(mh0 || ',' || mh1) AS bh FROM MM
  UNION ALL
  SELECT doc_id, 1 AS band, md5(mh2 || ',' || mh3) AS bh FROM MM"""
    return f"""
WITH perdoc AS (
  SELECT source,
    ROUND({quality}, 6)::DECIMAL(18,6) AS q,
    (CASE WHEN {dupw} > 0.5 THEN 1 ELSE 0 END)::BIGINT AS rep
  FROM (SELECT *, list_filter(string_split(trim(text), ' '), x -> x <> '') AS ws
        FROM documents)
),
report AS (
  SELECT source,
    ROUND(SUM(q)::DOUBLE / COUNT(*), 6) AS mean_quality,
    ROUND(SUM(rep) * 1.0 / COUNT(*), 6) AS repetitive_frac
  FROM perdoc GROUP BY source
),
blocked AS (SELECT source FROM report
            WHERE mean_quality < 0.79 OR repetitive_frac > 0.60),
corpus AS (
  SELECT doc_id, source, text FROM documents
  WHERE doc_id % 7 <> 0
    AND source NOT IN (SELECT source FROM blocked)
),
csh AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM corpus),
cm AS ({mh.replace('SHG', 'csh')}),
cb AS ({band_rows.replace('MM', 'cm')}),
bsh AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents
        WHERE doc_id % 7 = 0),
bm AS ({mh.replace('SHG', 'bsh')}),
bb AS (SELECT DISTINCT band, bh FROM ({band_rows.replace('MM', 'bm')})),
flagged AS (SELECT DISTINCT c.doc_id
            FROM cb c JOIN bb b ON c.band = b.band AND c.bh = b.bh),
s1 AS (
  SELECT doc_id, source, text,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS ws
  FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
),
base AS (
  SELECT doc_id, ws, len(ws) AS n, len(list_distinct(ws)) AS nd,
         list_aggregate(list_transform(ws, x -> length(x)), 'sum') AS chars
  FROM s1
),
g2 AS (SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
    FROM base, UNNEST(range(1, n)) AS t(i)) GROUP BY doc_id, g),
t2 AS (SELECT doc_id, MAX(c) AS mc, SUM(c) AS tc FROM g2 GROUP BY doc_id),
g3 AS (SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
    FROM base, UNNEST(range(1, n - 1)) AS t(i)) GROUP BY doc_id, g),
t3 AS (SELECT doc_id, MAX(c) AS mc, SUM(c) AS tc FROM g3 GROUP BY doc_id),
metrics AS (
  SELECT b.doc_id,
    ROUND(CASE WHEN n <= 0 THEN 0 ELSE 1.0 - nd * 1.0 / n END, 6) AS dup_word_frac,
    ROUND(COALESCE(t2.mc * 1.0 / t2.tc, 0), 6) AS top_bigram_frac,
    ROUND(COALESCE(t3.mc * 1.0 / t3.tc, 0), 6) AS top_trigram_frac,
    ROUND(CASE WHEN n <= 0 THEN 0 ELSE chars * 1.0 / n END, 6) AS mean_word_len
  FROM base b LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
),
s2 AS (
  SELECT s1.doc_id, s1.source, s1.text
  FROM s1 JOIN metrics USING (doc_id)
  WHERE NOT (dup_word_frac > 0.65 OR top_bigram_frac > 0.08
             OR top_trigram_frac > 0.18
             OR mean_word_len < 3.0 OR mean_word_len > 10.0)
),
sq AS (SELECT doc_id, source, ROUND({quality}, 6) AS quality FROM s2),
c AS (SELECT quality, COUNT(*)::BIGINT AS cnt FROM sq
      WHERE quality IS NOT NULL GROUP BY quality),
cc AS (SELECT quality,
              SUM(cnt) OVER (ORDER BY quality
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              SUM(cnt) OVER () AS n
       FROM c),
thr AS (SELECT MIN(quality) AS t FROM cc WHERE cum >= CEIL(n::DOUBLE * 0.75))
SELECT doc_id, source, quality FROM sq, thr WHERE quality >= t
"""


def pack_bpe_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-tokenizer-budget packing: train the BPE merge table on
    the corpus (``train_bpe``), count every document in TRAINED tokens
    (``bpe_token_counts``, Arrow-batched memoized encode), and pack by
    those budgets (``pack_fragments(tokens=...)``) — the "token budget
    that drives packing is the tokenizer you'll actually train with"
    loop, closed end to end.

    Capacity 384 sits below the mean trained-token doc length's small
    multiple so boundary-crossing fragments occur on every shard. The
    oracle embeds a Spark-free local twin's per-document counts as
    literals (pyarrow read + ``bpe_train_local`` + per-word
    ``encode_word``, the bpe_vocab generated-oracle pattern) and
    replays the packing math relationally — so the distributed trainer,
    the Arrow encode path, AND the packing windows are all checked
    against a from-scratch single-node derivation at once."""
    from ncbi_analysis_spark.functions.bpe import bpe_token_counts, train_bpe
    from ncbi_analysis_spark.operators.packing import pack_fragments

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(d, "text", num_merges=120)
    counted = bpe_token_counts(d, merges)
    return pack_fragments(
        counted, tokens=F.col("n_tokens"), capacity=384, n_shards=4)


def _pack_bpe_sql() -> str:
    from ncbi_analysis_spark.functions.bpe import bpe_train_local, encode_word
    from ncbi_analysis_spark.plans.driver_queries_r5 import _oracle_sf_dir

    import pyarrow.parquet as pq

    path = f"{_oracle_sf_dir()}/documents.parquet"
    merges = bpe_train_local(path, num_merges=120)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    tbl = pq.read_table(path, columns=["doc_id", "text"])
    cache: dict[str, int] = {}
    vals = []
    for did, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        t = "" if t is None else t.lower()
        total = 0
        for w in t.split():
            k = cache.get(w)
            if k is None:
                k = cache[w] = len(encode_word(w, ranks))
            total += k
        vals.append(f"({did}, {total})")
    return f"""
WITH bpe AS (SELECT * FROM (VALUES {", ".join(vals)}) AS t(doc_id, n_tokens)),
base AS (
  SELECT doc_id, n_tokens::BIGINT AS n_tokens,
         (('0x' || substr(md5('pack' || doc_id::VARCHAR), 1, 8))::BIGINT % 4)::INT AS shard,
         md5('pack|' || doc_id::VARCHAR) AS ord_
  FROM bpe
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
  FROM s2, LATERAL (SELECT UNNEST(generate_series(tok_start // 384,
                                                  (tok_end - 1) // 384)) AS bin_id) b
)
SELECT shard, bin_id, doc_id, n_tokens,
       GREATEST(tok_start, bin_id * 384) - tok_start AS frag_start,
       LEAST(tok_end, (bin_id + 1) * 384) - tok_start AS frag_end,
       GREATEST(tok_start, bin_id * 384) - bin_id * 384 AS bin_off
FROM frag
"""


def video_frame_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup end-to-end (operators/multimodal.py::
    video_near_dup): documents' bytes as opaque video payloads with
    2-4s durations, frame-sampled at 1 fps (stub frames: md5(data+ts));
    plant full re-encodes (same bytes, same duration — every frame
    shared) and trims (same bytes, 2s duration — exactly the first two
    frames shared), then pair clips whose sampled frames Hamming-collide
    on >= 2 distinct frames. The oracle is brute-force all-frame-pairs
    in DuckDB (the image query's different-algorithm posture), with the
    stub chain replayed as md5(md5(text || ts))."""
    from ncbi_analysis_spark.operators.multimodal import video_near_dup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def clip(idf, shift, dur_expr):
        return idf.select(
            (F.col("doc_id") + shift).alias("media_id"),
            F.lit("video").alias("kind"),
            F.encode("text", "utf-8").alias("data"),
            F.struct(
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(3).alias("channels"),
                F.lit(None).cast("int").alias("sample_rate"),
                dur_expr.cast("long").alias("duration_ms"),
                F.lit("mp4").alias("format"),
            ).alias("meta"),
        )

    dur = (F.col("n_chars") % 3 + 2) * 1000
    base = clip(d, 0, dur)
    re_enc = clip(d.filter(F.col("doc_id") % 10 == 0), 1_000_000, dur)
    trimmed = clip(d.filter(F.col("doc_id") % 15 == 0), 2_000_000, F.lit(2000))
    media = base.unionByName(re_enc).unionByName(trimmed)
    return video_near_dup(media, max_hamming=3, min_shared_frames=2)


_VIDEO_NEAR_DUP_SQL = """
WITH clips AS (
  SELECT doc_id AS media_id, text, (n_chars % 3 + 2) AS nf FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, (n_chars % 3 + 2) FROM documents
  WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000, text, 2 FROM documents WHERE doc_id % 15 = 0
),
fr AS (
  SELECT media_id, i AS frame_idx,
         md5(md5(text || (i * 1000)::VARCHAR)) AS hx
  FROM clips, UNNEST(range(0, nf)) AS t(i)
),
fh AS (
  SELECT media_id, frame_idx,
    (CASE WHEN ('0x' || substr(hx, 1, 16))::UBIGINT >= 9223372036854775808::UBIGINT
          THEN (('0x' || substr(hx, 1, 16))::UBIGINT - 9223372036854775808::UBIGINT)::BIGINT
               - 9223372036854775807 - 1
          ELSE ('0x' || substr(hx, 1, 16))::UBIGINT::BIGINT END) AS fh64
  FROM fr
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       COUNT(DISTINCT a.frame_idx)::BIGINT AS n_shared
FROM fh a JOIN fh b
  ON a.media_id < b.media_id
 AND bit_count(xor(a.fh64, b.fh64)) <= 3
GROUP BY a.media_id, b.media_id
HAVING COUNT(DISTINCT a.frame_idx) >= 2
"""


# ---------------------------------------------------------------------------
# PCA embedding projection (round-9 session 2)
# ---------------------------------------------------------------------------

_PCA_PARAMS = {"k": 8, "sample_cap": 65536}


def pca_embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of the embeddings table to 8 dims
    (operators/embeddings.py::pca_fit + pca_project — the data-dependent
    twin of the JL `embedding_project` query): fit on the deterministic
    md5-ordered sample (cap > corpus at sf0.01, so the fit sees every
    row), project with the Arrow-batched input-dim-order fold, explode
    to (vec_id, j, val) scalars.

    Generated oracle (the ann_ivf_trained pattern): pca_fit_local
    re-derives the bit-identical mean/components Spark-free; the SQL
    embeds components^T and the mean-dot-component scalars as exact
    frexp literals and mirrors the fold order, so every coordinate
    matches bit-for-bit."""
    from ncbi_analysis_spark.operators import embeddings as em

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mean, comps, _ = em.pca_fit(e, **_PCA_PARAMS)
    proj = em.pca_project(e, mean, comps)
    return proj.select(
        "vec_id", F.posexplode("proj").alias("j", "val")
    ).withColumn("j", F.col("j").cast("long"))


def _pca_project_sql() -> str:
    import numpy as np

    from ncbi_analysis_spark.operators.embeddings import pca_fit_local
    from ncbi_analysis_spark.plans.driver_queries_r5 import (
        _dlit,
        _oracle_sf_dir,
    )

    mean, comps, _ = pca_fit_local(
        f"{_oracle_sf_dir()}/embeddings.parquet", **_PCA_PARAMS
    )
    k, d = comps.shape
    CT = comps.T  # [t][j] — input dim major, matching the fold
    ct_lit = "[" + ", ".join(
        "[" + ", ".join(_dlit(x) for x in CT[t]) + "]" for t in range(d)
    ) + "]::DOUBLE[][]"
    mc = [float(np.dot(mean, comps[j])) for j in range(k)]
    mc_lit = "[" + ", ".join(_dlit(x) for x in mc) + "]::DOUBLE[]"
    return f"""
WITH lit AS (SELECT {ct_lit} AS CT, {mc_lit} AS MC)
SELECT vec_id, j::BIGINT AS j,
       list_reduce(list_transform(range({d}),
                   t -> embedding[t + 1]::DOUBLE * CT[t + 1][j + 1]),
                   (a, b) -> a + b) - MC[j + 1] AS val
FROM embeddings CROSS JOIN lit,
     LATERAL (SELECT UNNEST(range({k})) AS j) idx
"""


# ---------------------------------------------------------------------------
# HLL distinct sketch (round-9 session 2)
# ---------------------------------------------------------------------------


def hll_user_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog cardinality sketch end-to-end
    (operators/sketches.py): per-event-type approximate distinct user
    count (p=8, 256 registers) side-by-side with the exact count, so the
    oracled row itself shows the estimate's error.

    Everything on the oracled path is either integer-exact (register
    carve, rho via bin(), exact distinct) or a register-order-pinned
    fold of exact powers of two (est_raw) — no transcendentals — so
    DuckDB reproduces every column bit-for-bit."""
    from ncbi_analysis_spark.operators.sketches import hll_distinct
    from ncbi_analysis_spark.plans.driver_queries import _events

    ev = _events(spark, sf_dir).select("event_type", "user_id")
    est = hll_distinct(
        ev, "user_id", p=8, group_by=["event_type"], correct=False
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


def _hll_user_distinct_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r5 import _dlit

    alpha = 0.7213 / (1.0 + 1.079 / 256)
    return f"""
WITH vals AS (
  SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
hx AS (SELECT event_type, md5(user_id::VARCHAR) AS h FROM vals),
rr AS (
  SELECT event_type,
         ('0x' || substr(h, 1, 2))::BIGINT AS register,
         ('0x' || substr(h, 3, 13))::BIGINT AS w
  FROM hx
),
regs AS (
  SELECT event_type, register,
         MAX(CASE WHEN w = 0 THEN 53
                  ELSE 52 - length(bin(w)) + 1 END) AS max_rho
  FROM rr GROUP BY event_type, register
),
folded AS (
  SELECT event_type,
         COUNT(*)::BIGINT AS n_present,
         -- register-order left fold, 0.0 seed: bit-identical to the
         -- Spark aggregate() over the sorted collect_list
         list_reduce(
           list_prepend(0.0, list(pow(2.0, -max_rho) ORDER BY register)),
           (a, b) -> a + b) AS s_present
  FROM regs GROUP BY event_type
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM vals GROUP BY event_type
)
SELECT f.event_type, f.n_present,
       (256 - f.n_present)::BIGINT AS n_zero,
       {_dlit(alpha)} * 256.0 * 256.0
         / (f.s_present + (256 - f.n_present)) AS est_raw,
       e.exact_distinct
FROM folded f JOIN exact e USING (event_type)
"""


# ---------------------------------------------------------------------------
# Z-order layout key (round-9 session 2)
# ---------------------------------------------------------------------------

_ZORDER_BITS = 12


def zorder_layout_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key derivation end-to-end (operators/layout.py): exact
    min/max ranges of (user_id, value) over the events table, 12-bit
    min/max bins, Morton interleave — the multi-column data-skipping
    key ``zorder_layout`` range-partitions on before a curated-corpus
    write. Output (event_id, zvalue).

    The oracle recomputes the same extremes, the same float64 bin
    formula in the same operation order, and the same shift/mask
    interleave — every step is IEEE-exact cross-engine, no literals
    needed."""
    from ncbi_analysis_spark.operators import layout as lo
    from ncbi_analysis_spark.plans.driver_queries import _events

    ev = _events(spark, sf_dir).select("event_id", "user_id", "value")
    keyed = lo.add_zorder_key(ev, ["user_id", "value"], bits=_ZORDER_BITS)
    return keyed.select("event_id", "zvalue")


def _zorder_layout_sql() -> str:
    b = _ZORDER_BITS
    m = (1 << b) - 1
    terms = []
    for j, col in enumerate(("bu", "bv")):
        for t in range(b):
            terms.append(f"((({col} >> {t}) & 1) << {t * 2 + j})")
    z = " + ".join(terms)
    bin_ = (
        "COALESCE(floor(((({v}::DOUBLE) - ({mn}::DOUBLE)) / "
        "(({mx}::DOUBLE) - ({mn}::DOUBLE))) * {m}.0), 0)::BIGINT"
    )
    return f"""
WITH r AS (
  SELECT min(user_id::DOUBLE) AS mnu, max(user_id::DOUBLE) AS mxu,
         min(value::DOUBLE)  AS mnv, max(value::DOUBLE)  AS mxv
  FROM events
),
binned AS (
  SELECT event_id,
    {bin_.format(v='user_id', mn='r.mnu', mx='r.mxu', m=m)} AS bu,
    {bin_.format(v='value', mn='r.mnv', mx='r.mxv', m=m)} AS bv
  FROM events CROSS JOIN r
)
SELECT event_id, ({z})::BIGINT AS zvalue FROM binned
"""
