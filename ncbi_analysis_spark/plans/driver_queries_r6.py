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


def ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index ANN path through the exact-match gate (was
    pytest-only): ivf_assign -> write_ivf_index (parquet partitioned by
    c_id) -> read_ivf_index -> ivf_topk(assigned=...,
    prefilter_partitions=True), so probing physically reads only the
    probed bucket directories. Same workload as ann_ivf, hence shares
    ANN_IVF_SQL — a drift between the persisted layout and the inline
    path hash-mismatches here."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.similarity_search import (
        ivf_assign,
        ivf_topk,
        read_ivf_index,
        write_ivf_index,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import _staging_dir

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 48).select(F.col("vec_id").alias("q_id"), "embedding")
    cents = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("c_id"), "embedding")
    # bounded two-slot staging rotation (same pattern as
    # corpus_shard_roundtrip): no /tmp accumulation across runs, no
    # cross-process clobbering, and a lazily-read index from the
    # previous in-process call stays valid
    path = _staging_dir("spark_graft_ivf_index")
    write_ivf_index(ivf_assign(e, cents), path)
    index = read_ivf_index(spark, path)
    out = ivf_topk(e, q, cents, k=10, nprobe=2, assigned=index,
                   prefilter_partitions=True)
    return out.withColumn("rk", F.col("rk").cast("long"))


def j3b_interval_overlap_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3's BROADCAST mode through the gate on the same workload as the
    binned j3_interval_overlap (which shares its J3_SQL oracle): proves
    broadcast == binned on driver data, not just on the pytest fixture.
    The small side here is the same orders-window table — at real scale
    this mode is for annotation-table-sized right sides."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators import intervals

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey",
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias("s"),
        (F.unix_date(F.col("o_orderdate").cast("date")) + 30).cast("long").alias("e"),
    )
    right = o.select(
        F.col("o_orderkey").alias("o_orderkey_b"),
        F.col("o_custkey").alias("__r_cust"),
        F.col("s").alias("sb"), F.col("e").alias("eb"),
    )
    joined = intervals.interval_join_broadcast(
        o, right, "s", "e", "sb", "eb",
        extra_cond=F.col("o_custkey") == F.col("__r_cust"),
    ).filter(F.col("o_orderkey") < F.col("o_orderkey_b"))
    out = intervals.classify_overlaps(joined, "s", "e", "sb", "eb")
    return out.select(
        "o_custkey", "o_orderkey", "o_orderkey_b",
        F.col("overlap_len").cast("long").alias("overlap_days"), "relation",
    )


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio twin of multimodal_image_features: documents' bytes as
    opaque audio payloads -> mapInPandas decode -> per-media features.
    The md5 stub decoder keeps the oracle exact (real WAV decode is
    operators/multimodal.py::wave_audio_decoder, pytest-covered with
    synthesized PCM — stdlib wave, no optional dependency)."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators import multimodal as mm

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode("text", "utf-8").alias("data"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(1).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit("wav").alias("format"),
        ).alias("meta"),
    )
    out = mm.audio_features(media)
    return out.select(
        "media_id", "sample_rate", "duration_ms", "n_samples",
        F.round("rms", 6).alias("rms"), F.round("peak", 6).alias("peak"),
    )


# md5-hex byte k (0-based) = substr(hx, 2k+1, 2); mirrors
# deterministic_fake_audio_decoder byte-for-byte.
MULTIMODAL_AUDIO_SQL = """
WITH h AS (SELECT doc_id AS media_id, md5(text) AS hx FROM documents),
f AS (
  SELECT media_id,
         (CASE ('0x' || substr(hx, 1, 2))::INT % 3
               WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END) AS sample_rate,
         (('0x' || substr(hx, 3, 6))::BIGINT % 600000 + 1) AS duration_ms,
         ('0x' || substr(hx, 17, 2))::INT AS b8,
         ('0x' || substr(hx, 21, 2))::INT AS b10
  FROM h
)
SELECT media_id, sample_rate::INT AS sample_rate, duration_ms::BIGINT AS duration_ms,
       ((sample_rate::BIGINT * duration_ms) // 1000)::BIGINT AS n_samples,
       ROUND(b8 / 255.0, 6) AS rms,
       ROUND(b10 / 255.0, 6) AS peak
FROM f
"""


def dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus dedup survivorship: MinHash-LSH edges ->
    connected components -> keep each cluster's smallest doc_id (and
    every un-clustered doc), i.e. the filter step a training pipeline
    actually runs after near-dup detection. Same edge generation as
    dedup_dup_clusters; the kept set is documents anti-joined against
    the non-canonical cluster members."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators import dedup as dd
    from ncbi_analysis_spark.operators.components import component_dups

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dd.minhash_lsh_pairs(
        d, "text", "doc_id", num_perm=4, bands=2, shingle_n=3,
        max_band_freq=None,
    )
    losers = component_dups(pairs).select(F.col("id").alias("doc_id"))
    return d.join(losers, "doc_id", "left_anti") \
        .select("doc_id", "lang", "source", "n_chars")


def _keep_one_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r3 import _dup_clusters_sql

    # reuse the recursive-CTE component fixpoint; survivors are docs that
    # are not a non-canonical member of any cluster
    comp = _dup_clusters_sql().strip()
    return f"""
WITH comp AS ({comp})
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id != cluster_id)
"""


def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training order: md5-bucketed shard + md5
    row order within shard (operators/scale.py::deterministic_shuffle)
    — the reproducible "baked shuffle" every training pipeline needs.
    One shuffle + keyed window, no global sort."""
    from ncbi_analysis_spark.operators.scale import deterministic_shuffle

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return deterministic_shuffle(d, "doc_id", n_shards=8) \
        .select("doc_id", "shard", "pos")


CORPUS_SHUFFLE_SQL = """
WITH h AS (
  SELECT doc_id,
         (('0x' || substr(md5('shuffle' || doc_id::VARCHAR), 1, 8))::BIGINT % 8)::INT
           AS shard,
         md5('shuffle#' || doc_id::VARCHAR) AS ord
  FROM documents)
SELECT doc_id, shard,
       ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id)::BIGINT AS pos
FROM h
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling through the exact-match gate — completes the
    image/audio/video modality triple (operators/multimodal.py::
    sample_frames; reference has no video path, this is an LLM-pipeline
    extension). Documents' bytes stand in as opaque video payloads with
    a deterministic duration (n_chars * 37 ms); the stub extractor emits
    frame = md5(data || str(ts_ms)) so the per-frame explode shape, the
    1-row-minimum rule, and the frame bytes are all DuckDB-re-derivable.
    A real codec plugs in via ``extractor=`` / PIL adapters without
    changing the plan shape."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators import multimodal as mm

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "utf-8").alias("data"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.col("n_chars").cast("long") * 37).alias("duration_ms"),
            F.lit("mp4").alias("format"),
        ).alias("meta"),
    )
    frames = mm.sample_frames(media, every_ms=1000)
    return frames.select(
        "media_id", "frame_idx", "ts_ms",
        F.lower(F.hex("frame")).alias("frame_md5"),
    )


# mirrors the stub extractor byte-for-byte: frame bytes are
# md5(utf8(text) || str(ts_ms)), compared as lowercase hex
MULTIMODAL_FRAME_SQL = """
WITH f AS (
  SELECT doc_id AS media_id, text,
         greatest((n_chars * 37) // 1000, 1) AS nf
  FROM documents),
fr AS (SELECT media_id, text, unnest(range(0, nf)) AS i FROM f)
SELECT media_id,
       i::INT AS frame_idx,
       (i * 1000)::BIGINT AS ts_ms,
       md5(text || (i * 1000)::VARCHAR) AS frame_md5
FROM fr
"""


def queries_r6() -> dict:
    return {
        "flagship_windowed_scan": flagship_windowed_scan,
        "ngram_lm_quality": ngram_lm_quality,
        "ann_ivf_persisted": ann_ivf_persisted,
        "j3b_interval_overlap_broadcast": j3b_interval_overlap_broadcast,
        "multimodal_audio_features": multimodal_audio_features,
        "dedup_keep_one": dedup_keep_one,
        "corpus_shuffle_shards": corpus_shuffle_shards,
        "multimodal_frame_sample": multimodal_frame_sample,
    }


def oracle_sql_r6() -> dict[str, str]:
    from ncbi_analysis_spark.plans.driver_queries import (
        ANN_IVF_SQL,
        FLAGSHIP_SQL,
        J3_SQL,
    )

    return {
        "flagship_windowed_scan": FLAGSHIP_SQL,
        "ngram_lm_quality": NGRAM_LM_SQL,
        "ann_ivf_persisted": ANN_IVF_SQL,
        "j3b_interval_overlap_broadcast": J3_SQL,
        "multimodal_audio_features": MULTIMODAL_AUDIO_SQL,
        "dedup_keep_one": _keep_one_sql(),
        "corpus_shuffle_shards": CORPUS_SHUFFLE_SQL,
        "multimodal_frame_sample": MULTIMODAL_FRAME_SQL,
    }
