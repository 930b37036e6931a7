"""Round-13 staged driver queries.

Queries added this round live here until they are registered into
``plans/driver_queries.py``'s build-order dicts at the start of round 14
(the standing cadence — see COVERAGE.md's round-close checklist).
``scripts/check_oracle.py --staged`` runs these alongside the registry.

This round's theme: **deletion support for the persisted index family**
(operators/tombstones.py; ``delete_from_*`` / ``compact_*`` in
dedup.py, similarity_search.py, retrieval.py). Each delete oracle row
pins the tombstone contract end-to-end: delete(X) + search ≡ search
over an index REBUILT without X — the oracle recomputes the search from
the raw corpus with X filtered out, so any leak of a deleted doc
through the anti-join, the marker stats, or a compaction swap
hash-mismatches here. Also staged: the streaming Count-Min publisher
(``stream_cm_publish`` — batching invariance vs a whole-corpus register
rebuild), the exact-substring span-recall audit on planted unaligned
duplicates (``span_recall_planted``), and the three-genome flagship
scan pinning cross-accession top-k competition
(``flagship_multi_accession``); BPE encode-to-ids, the shard-writer
payload (``bpe_encode_ids`` — generated oracle pins the deterministic
vocab-id rule); and the streaming quantile publisher completing the
snapshot family (``stream_quantile_publish``).

Second-session r13 additions: incremental connected components
(``cc_incremental_clusters`` — fold ≡ full recompute, the oracle is the
full recursive-CTE fixpoint), EXACT-mode span dedup
(``dup_span_removal_exact`` — anchor_bits=0, every duplicated window
found), the streaming gate against the persisted LSH index
(``stream_lsh_gate`` — mid-life tombstones honored without restart),
and the dedup-centric crawl-refresh composition (``curation_v6``).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bm25_delete_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone deletion on the persisted BM25 index
    (operators/retrieval.py::delete_from_bm25_index): build the index
    over the WHOLE corpus, tombstone every doc_id % 3 == 0, then serve
    the r12 three-query batch. The oracle recomputes BM25 from the raw
    corpus with those docs filtered out — idf (live df counts), avgdl
    and N (marker stats maintained at delete time) must all move
    together, exactly. This is the pure tombstone path: no compaction,
    every probe goes through the anti-join + adjusted marker stats."""
    from ncbi_analysis_spark.operators.retrieval import (
        bm25_topk_batch,
        delete_from_bm25_index,
        write_bm25_index,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import _staging_dir
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        _BM25_BATCH,
        _BM25_BATCH_K,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = _staging_dir("spark_graft_bm25_del")
    write_bm25_index(d, path, n_buckets=32)
    delete_from_bm25_index(
        d.filter(F.col("doc_id") % 3 == 0).select("doc_id"), path
    )
    qdf = spark.createDataFrame(_BM25_BATCH, "query_id long, query string")
    return bm25_topk_batch(spark, path, qdf, k=_BM25_BATCH_K)


def _bm25_delete_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r12 import _bm25_batch_sql

    return _bm25_batch_sql(corpus_pred="doc_id % 3 <> 0")


def bm25_compacted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same delete as ``bm25_delete_search`` with
    ``compact_bm25_index`` folded in before the search (and an append
    AFTER the compaction — post-compaction the index must accept new
    ids again): tombstones rewritten into the data files, per-bucket
    small files coalesced, marker stats refreshed from the exact
    recompute. Same oracle as the tombstone path — compaction must be
    invisible to every score."""
    from ncbi_analysis_spark.operators.retrieval import (
        append_to_bm25_index,
        bm25_topk_batch,
        compact_bm25_index,
        delete_from_bm25_index,
        write_bm25_index,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import _staging_dir
    from ncbi_analysis_spark.plans.driver_queries_r12 import (
        _BM25_BATCH,
        _BM25_BATCH_K,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    keep = d.filter(F.col("doc_id") % 3 != 0)
    path = _staging_dir("spark_graft_bm25_compact")
    # build from 2/3 of the keep-set, delete strays, compact, then
    # append the last third — exercising write+delete+compact+append in
    # one maintenance cycle that must land exactly on the oracle corpus
    write_bm25_index(d.filter(F.col("doc_id") % 9 < 6), path, n_buckets=32)
    delete_from_bm25_index(
        d.filter((F.col("doc_id") % 9 < 6) & (F.col("doc_id") % 3 == 0))
        .select("doc_id"),
        path,
    )
    compact_bm25_index(spark, path)
    append_to_bm25_index(keep.filter(F.col("doc_id") % 9 >= 6), path,
                         n_buckets=32)
    qdf = spark.createDataFrame(_BM25_BATCH, "query_id long, query string")
    return bm25_topk_batch(spark, path, qdf, k=_BM25_BATCH_K)


def lsh_delete_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone deletion on the persisted MinHash-LSH index
    (operators/dedup.py::delete_from_lsh_index / compact_lsh_index):
    the lsh_incremental_decon crawl-ingest loop with a takedown batch
    folded in — index the old corpus (%7<>0), tombstone every indexed
    doc_id % 5 == 0, COMPACT (the probe must not see the difference),
    then probe with the new crawl batch (%7=0). Oracle: the recompute-
    everything fuzzy-collision SQL over the corpus minus the deleted
    docs, roles flipped (the lsh_incremental_decon shape)."""
    from ncbi_analysis_spark.operators.dedup import (
        compact_lsh_index,
        delete_from_lsh_index,
        lsh_index_collisions,
        read_lsh_index,
        write_lsh_index,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import _staging_dir

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = d.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    new = d.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    kw = dict(num_perm=4, bands=2, shingle_n=3)

    path = _staging_dir("spark_graft_lsh_del")
    write_lsh_index(old, "text", "doc_id", path, **kw)
    delete_from_lsh_index(
        old.filter(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("id")),
        path,
    )
    compact_lsh_index(spark, path)
    index = read_lsh_index(spark, path)
    return lsh_index_collisions(new, index, "text", "doc_id", **kw)


def _lsh_delete_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r7 import _fuzzy_decon_sql

    inner = _fuzzy_decon_sql(corpus_pred="doc_id % 5 <> 0")
    return (f"SELECT bench_id AS doc_id, doc_id AS indexed_id "
            f"FROM ({inner}) p")


def ivf_delete_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone deletion on the persisted IVF index
    (operators/similarity_search.py::delete_from_ivf_index /
    compact_ivf_index): the ann_index_append build with every
    vec_id % 5 == 0 tombstoned afterwards, compacted, then searched
    with partition-pruned probes. Oracle: the ann_ivf recompute with
    the deleted vectors filtered out of the corpus (queries and the
    frozen centroid set are untouched — centroids are parameters, not
    index rows, so deleting their source vectors must not move any
    bucket assignment)."""
    from ncbi_analysis_spark.operators.similarity_search import (
        compact_ivf_index,
        delete_from_ivf_index,
        ivf_assign,
        ivf_topk,
        read_ivf_index,
        write_ivf_index,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import _staging_dir

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 48).select(
        F.col("vec_id").alias("q_id"), "embedding")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding")

    path = _staging_dir("spark_graft_ivf_del")
    write_ivf_index(ivf_assign(e, cents), path, centroids=cents)
    delete_from_ivf_index(
        e.filter(F.col("vec_id") % 5 == 0).select("vec_id"), path
    )
    compact_ivf_index(spark, path)
    index = read_ivf_index(spark, path)
    out = ivf_topk(e, q, cents, k=10, nprobe=2, assigned=index,
                   prefilter_partitions=True)
    return out.withColumn("rk", F.col("rk").cast("long"))


def _ivf_delete_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries import ANN_IVF_SQL

    old = "corpus AS (SELECT vec_id, embedding AS v FROM embeddings),"
    new = ("corpus AS (SELECT vec_id, embedding AS v FROM embeddings "
           "WHERE vec_id % 5 <> 0),")
    if old not in ANN_IVF_SQL:
        raise RuntimeError(
            "ANN_IVF_SQL corpus CTE changed shape; update _ivf_delete_sql"
        )
    return ANN_IVF_SQL.replace(old, new)


_SCM_W, _SCM_D = 64, 3


def stream_cm_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy-hitter state end-to-end
    (streaming/events.py::publish_cm_snapshots/read_cm_snapshots — the
    r12 verdict's missing streaming frequency tier): the events table
    as a file stream, each micro-batch's Count-Min register table
    published as a versioned marker-guarded snapshot via foreachBatch,
    then the snapshot directory merged by elementwise add. The merged
    registers must equal the batch sketch of the whole corpus EXACTLY
    regardless of batching (integer + is associative/commutative; the
    checkpoint + per-batch overwrite carry re-delivery safety, since
    add — unlike HLL max — is not idempotent). Oracle: DuckDB register
    rebuild over all events (same md5 buckets, exact integer counts)."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.plans.driver_queries import _events
    from ncbi_analysis_spark.plans.driver_queries_r11 import (
        _stage_as_stream,
        _staged_stream_conf,
    )
    from ncbi_analysis_spark.streaming.events import (
        publish_cm_snapshots,
        read_cm_snapshots,
    )

    ev = _events(spark, sf_dir).select("user_id").filter(
        F.col("user_id").isNotNull()
    )
    tmp = tempfile.mkdtemp(prefix="stream_cm_pub_")
    try:
        src = _stage_as_stream(spark, ev, tmp)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        out = f"{tmp}/sketches"
        with _staged_stream_conf(spark, src):
            publish_cm_snapshots(
                stream, "user_id", out, f"{tmp}/ck",
                width=_SCM_W, depth=_SCM_D,
            )
            merged = read_cm_snapshots(spark, out,
                                       width=_SCM_W, depth=_SCM_D)
            # snapshot dir dies with tmp: materialize the depth×width-
            # bounded register table before cleanup
            rows = merged.collect()
            schema = merged.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _stream_cm_sql() -> str:
    rows = ", ".join(f"({i})" for i in range(_SCM_D))
    return f"""
WITH vals AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
rws(i) AS (VALUES {rows})
SELECT i::BIGINT AS row,
       ('0x' || substr(md5('cm' || i::VARCHAR || '|' || user_id::VARCHAR),
                       1, 8))::BIGINT % {_SCM_W} AS bucket,
       count(*)::BIGINT AS cnt
FROM vals CROSS JOIN rws
GROUP BY row, bucket
"""


def span_recall_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup recall, measured on PLANTED unaligned
    duplicates (operators/dedup.py::span_recall_audit — the r12 verdict
    gap: the content-defined anchor approximation of Lee et al.'s
    suffix-array exact mode had no recall measurement): every tenth
    document gets a copy with a per-doc variable-length pad prepended
    (1–7 chars, so the copies are UNALIGNED — the geometry fixed-stride
    sampling fails on and anchoring exists for), then the audit
    compares anchored duplicated-char coverage against the brute-force
    every-position truth. Expected recall at anchor density 1/16 with
    32-char windows is ≈ 1-(15/16)^32 ≈ 0.87 — strictly inside (0,1),
    which the oracle pins exactly (same md5 window/anchor rules in
    DuckDB)."""
    from ncbi_analysis_spark.operators.dedup import span_recall_audit

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("text").isNotNull())
    base = d.filter(F.col("doc_id") % 10 == 0)
    planted = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.substring(F.lit("##########"), 1,
                        (F.col("doc_id") % 7 + 1).cast("int")),
            F.col("text"),
        ).alias("text"),
    )
    corpus = base.unionByName(planted)
    return span_recall_audit(corpus, "text", "doc_id", window=32,
                             anchor_k=8, anchor_bits=4, min_docs=2)


_SPAN_RECALL_SQL = r"""
WITH base AS (
  SELECT doc_id, text AS tx FROM documents
  WHERE text IS NOT NULL AND doc_id % 10 = 0
),
corpus AS (
  SELECT doc_id, tx FROM base
  UNION ALL
  SELECT doc_id + 1000000,
         substr('##########', 1, (doc_id % 7 + 1)::INT) || tx
  FROM base
),
w AS (
  SELECT doc_id, s::BIGINT AS span_start, (s + 32)::BIGINT AS span_end,
         md5(substr(tx, (s + 1)::INT, 32)) AS wh,
         substr(md5(substr(tx, (s + 1)::INT, 8)), 1, 1) AS a1
  FROM (SELECT doc_id, tx,
               UNNEST(range(0, GREATEST(LENGTH(tx) - 32 + 1, 0))) AS s
        FROM corpus)
),
tdup AS (SELECT wh FROM w GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2),
tpos AS (
  SELECT DISTINCT doc_id, UNNEST(range(span_start, span_end)) AS pos
  FROM w JOIN tdup USING (wh)
),
aw AS (SELECT * FROM w WHERE a1 = '0'),
adup AS (SELECT wh FROM aw GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2),
apos AS (
  SELECT DISTINCT doc_id, UNNEST(range(span_start, span_end)) AS pos
  FROM aw JOIN adup USING (wh)
),
j AS (
  SELECT COALESCE(t.doc_id, a.doc_id) AS doc_id,
         (t.doc_id IS NOT NULL)::INT AS in_truth,
         (a.doc_id IS NOT NULL)::INT AS in_cand
  FROM tpos t FULL OUTER JOIN apos a
    ON t.doc_id = a.doc_id AND t.pos = a.pos
),
agg AS (
  SELECT COALESCE(SUM(in_truth), 0)::BIGINT AS truth_chars,
         COALESCE(SUM(in_cand), 0)::BIGINT AS anchored_chars,
         COALESCE(SUM(in_truth * in_cand), 0)::BIGINT AS hit_chars
  FROM j
),
ns AS (SELECT COUNT(*)::BIGINT AS n_sample FROM corpus)
SELECT ns.n_sample, agg.truth_chars, agg.anchored_chars, agg.hit_chars,
       CASE WHEN agg.truth_chars > 0
            THEN ROUND(agg.hit_chars::DOUBLE / agg.truth_chars::DOUBLE, 6)
       END AS recall
FROM ns CROSS JOIN agg
"""


def flagship_multi_accession(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship scan over THREE genomes in ONE plan (the r12
    verdict stretch: the chunked layout keys on accession, but no
    oracle row had ever pinned CROSS-genome semantics): documents are
    dealt round-robin into three synthetic accessions, both strands of
    all three scanned together, suppression per (query, accession,
    strand), and the top-k a single per-QUERY ranking in which the
    genomes COMPETE (ties broken accession asc — the registered
    flagship's ordering, now load-bearing). Oracle: FLAGSHIP_SQL with
    the genome/strands CTEs swapped for grouped 3-accession builds; the
    scoring/suppression/rank tail is accession-generic and shared
    verbatim."""
    from ncbi_analysis_spark.plans.driver_queries import (
        _t,
        flagship_select,
    )
    from ncbi_analysis_spark.plans.similarity_scan import similarity_scan

    d = _t(spark, sf_dir, "documents")
    base = F.translate(F.md5(F.col("text")), "0123456789abcdef",
                       "acgtacgtacgtacgt")
    parts = d.filter(F.col("doc_id") < 200).select(
        (F.col("doc_id") % 3).alias("k"),
        F.struct(F.col("doc_id"), base.alias("h")).alias("s"),
    )
    genome_df = (
        parts.groupBy("k")
        .agg(F.concat_ws(
            "",
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s["h"]),
        ).alias("seq"))
        .select(F.concat(F.lit("acc"), F.col("k")).alias("accession"),
                "seq")
    )
    queries_df = d.filter(F.col("doc_id") < 2).select(
        F.concat(F.lit("q"), F.col("doc_id")).alias("name"),
        F.substring(base, 1, 12).alias("gene"),
    )
    return flagship_select(similarity_scan(
        genome_df, queries_df, {"direct": 1.0, "consistency": 2.0},
        top_k=10, candidate_distance=5, patience=2, chunk_size=1024,
    ))


def _flagship_multi_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries import FLAGSHIP_SQL

    old_g = ("g AS (SELECT string_agg(h, '' ORDER BY doc_id) AS seq "
             "FROM d),")
    new_g = ("g AS (SELECT 'acc' || (doc_id % 3)::VARCHAR AS accession,\n"
             "            string_agg(h, '' ORDER BY doc_id) AS seq\n"
             "     FROM d GROUP BY doc_id % 3),")
    old_s = """strands AS (
  SELECT 'synthetic' AS accession, '+' AS strand, seq, LENGTH(seq)::BIGINT AS db_len FROM g
  UNION ALL
  SELECT 'synthetic', '-', reverse(translate(seq, 'acgt', 'tgca')), LENGTH(seq)::BIGINT FROM g
),"""
    new_s = """strands AS (
  SELECT accession, '+' AS strand, seq, LENGTH(seq)::BIGINT AS db_len FROM g
  UNION ALL
  SELECT accession, '-', reverse(translate(seq, 'acgt', 'tgca')), LENGTH(seq)::BIGINT FROM g
),"""
    if old_g not in FLAGSHIP_SQL or old_s not in FLAGSHIP_SQL:
        raise RuntimeError(
            "FLAGSHIP_SQL genome CTEs changed shape; update "
            "_flagship_multi_sql"
        )
    return FLAGSHIP_SQL.replace(old_g, new_g).replace(old_s, new_s)


def bpe_encode_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-BPE token-ID encoding end-to-end (functions/bpe.py::
    bpe_encode — the shard-writer's payload, closing the train→count→
    ENCODE gap: bpe_vocab pinned the merge table and bpe_token_counts
    the budget, but nothing pinned the actual id sequences a training
    pipeline persists). Distributed train (120 merges) + Arrow-batched
    encode; output (doc_id, n_tokens, ids_md5) — the id sequence
    hashed for a compact driver payload. Oracle: the generated-oracle
    pattern (bpe_vocab / ann_ivf_trained) — the Spark-free local twin
    trains from the same parquet and encodes every distinct WORD, and
    the SQL reassembles per-document id strings from that literal
    word→ids table in word order, so the deterministic vocab-id rule
    (unk=0, sorted base symbols, merge products in order) is pinned
    cross-implementation."""
    from ncbi_analysis_spark.functions.bpe import bpe_encode, train_bpe

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = train_bpe(d, "text", num_merges=120)
    enc = bpe_encode(d, merges, "text")
    return enc.select(
        "doc_id",
        F.size("token_ids").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(",", F.col("token_ids"))).alias("ids_md5"),
    )


def _bpe_encode_sql() -> str:
    from ncbi_analysis_spark.functions.bpe import (
        bpe_batch_encoder,
        bpe_train_local,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import _oracle_sf_dir

    import duckdb

    path = f"{_oracle_sf_dir()}/documents.parquet"
    merges = bpe_train_local(path, num_merges=120)
    enc = bpe_batch_encoder(merges)
    con = duckdb.connect()
    words = [r[0] for r in con.execute(
        r"SELECT DISTINCT unnest(string_split_regex(trim(lower(text)), "
        r"'\s+')) AS w FROM read_parquet(?) "
        "WHERE text IS NOT NULL ORDER BY w", [path]).fetchall()
        if r[0] != ""]

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    vals = ", ".join(
        f"({q(w)}, {q(','.join(str(i) for i in ids))}, {len(ids)})"
        for w, ids in ((w, enc([w])[0]) for w in words)
    )
    return rf"""
WITH d AS (SELECT doc_id, text FROM documents),
enc(w, ids, n) AS (VALUES {vals}),
ws AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(COALESCE(text, ''))),
                                        '\s+'), x -> x <> '') AS l
  FROM d
),
wpos AS (
  SELECT doc_id, t.i, l[t.i] AS w
  FROM ws, UNNEST(range(1, len(l) + 1)) AS t(i)
),
agg AS (
  SELECT wpos.doc_id,
         string_agg(e.ids, ',' ORDER BY wpos.i) AS idstr,
         SUM(e.n)::BIGINT AS n_tokens
  FROM wpos JOIN enc e ON wpos.w = e.w
  GROUP BY wpos.doc_id
)
SELECT d.doc_id,
       COALESCE(agg.n_tokens, 0)::BIGINT AS n_tokens,
       md5(COALESCE(agg.idstr, '')) AS ids_md5
FROM d LEFT JOIN agg USING (doc_id)
"""


_SQP_K = 128
_SQP_QS = (0.5, 0.9, 0.99)


def stream_quantile_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quantile state end-to-end
    (streaming/events.py::publish_quantile_snapshots/
    read_quantile_snapshots — completing the snapshot-publisher family:
    HLL r12, CM r13, quantile/KMV here): the events table as a file
    stream, each micro-batch's bottom-k value sample published as a
    versioned marker-guarded snapshot, the directory folded by min-k
    over the (h, v) total order, and per-group quantiles estimated from
    the merged sketch. Must equal the batch sketch of the whole corpus
    EXACTLY regardless of batching (min-k over disjoint-id batches is
    associative) — the oracle rebuilds the bottom-k sample and the
    discrete ceil(q·n) estimates from all events in DuckDB."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.operators.sketches import (
        quantile_sketch_estimate,
    )
    from ncbi_analysis_spark.plans.driver_queries import _events
    from ncbi_analysis_spark.plans.driver_queries_r11 import (
        _stage_as_stream,
        _staged_stream_conf,
    )
    from ncbi_analysis_spark.streaming.events import (
        publish_quantile_snapshots,
        read_quantile_snapshots,
    )

    ev = _events(spark, sf_dir).select("event_id", "value").filter(
        F.col("value").isNotNull()
    )
    tmp = tempfile.mkdtemp(prefix="stream_q_pub_")
    try:
        src = _stage_as_stream(spark, ev, tmp)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        out = f"{tmp}/sketches"
        with _staged_stream_conf(spark, src):
            publish_quantile_snapshots(
                stream, "value", "event_id", out, f"{tmp}/ck", k=_SQP_K,
            )
            merged = read_quantile_snapshots(spark, out, k=_SQP_K)
            est = quantile_sketch_estimate(merged, list(_SQP_QS))
            rows = est.collect()
            schema = est.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _stream_quantile_sql() -> str:
    qvals = ", ".join(f"({int(round(q * 1_000_000))})" for q in _SQP_QS)
    return f"""
WITH s AS (
  SELECT ('0x' || substr(md5(event_id::VARCHAR), 1, 13))::BIGINT AS h,
         value AS v
  FROM events WHERE value IS NOT NULL
  ORDER BY h, v LIMIT {_SQP_K}
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


_HHG_N, _HHG_M = 5, 64


def heavy_hitters_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP exact top-N heavy hitters
    (operators/heavy_hitters.py::heavy_hitters_topn_grouped — the
    curation question "what is the spam token in THIS language slice"):
    per-(partition, lang) Misra-Gries candidates, one recount pass with
    a per-group NULL-key fold for the group totals, per-group top-5
    with per-group guarantee flags. The oracle recounts every
    (lang, token) exactly in DuckDB — so candidate coverage, the
    grouped fold, and the N_group certificate arithmetic are all pinned
    in one row set."""
    from ncbi_analysis_spark.functions.text import tokens
    from ncbi_analysis_spark.operators.heavy_hitters import (
        heavy_hitters_topn_grouped,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    toks = d.select(
        "lang", F.explode(tokens(F.col("text"))).alias("g")
    )
    return heavy_hitters_topn_grouped(toks, "g", "lang",
                                      n=_HHG_N, m=_HHG_M)


def _hh_per_lang_sql() -> str:
    return rf"""
WITH toks AS (
  SELECT lang AS grp, UNNEST(string_split_regex(TRIM(text), '\s+')) AS token
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
),
cnt AS (
  SELECT grp, token, count(*)::BIGINT AS cnt FROM toks GROUP BY grp, token
),
tot AS (SELECT grp, count(*)::BIGINT AS n FROM toks GROUP BY grp),
rk AS (
  SELECT cnt.*, row_number() OVER (
    PARTITION BY grp ORDER BY cnt DESC, token) AS r
  FROM cnt
)
SELECT rk.grp, rk.token, rk.cnt,
       (rk.cnt * {_HHG_M + 1} > tot.n) AS guaranteed
FROM rk JOIN tot USING (grp) WHERE r <= {_HHG_N}
"""


_V5_K, _V5_CAP, _V5_SHARDS = 128, 128, 4


def curation_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship curation v5 — the round-13 tiers composed into one
    crawl-refresh pipeline, every stage an already-oracled primitive:

      1. history decon (persisted LSH index): the new crawl (%7=0)
         probed against the indexed archive (%7<>0); colliding docs
         dropped (``lsh_index_collisions`` over ``read_lsh_index``);
      2. quality gate from a PUBLISHED quantile sketch: the archive's
         median n_chars, derived from ``write_quantile_sketch`` /
         ``quantile_sketch_threshold`` artifacts — no archive re-scan;
      3. BPE encode-to-ids (``bpe_encode``, tokenizer trained on the
         whole crawl archive) — the real token budget;
      4. sequence packing by those REAL token counts
         (``pack_fragments(tokens=F.size(ids))``).

    Returns the training-batch manifest ``(shard, bin_id, doc_id,
    n_tokens, frag_start, frag_end, bin_off)`` for the curated new
    crawl. The oracle recomputes all four stages in one DuckDB chain
    (band-collision set → bottom-k discrete median → per-word literal
    token counts from the Spark-free local twin → the PACK_SQL stream
    fold), so stage boundaries AND values agree exactly end to end.

    Scale shape: stage 1 broadcasts the new batch's band rows against
    the partition-pruned index; stage 2 is k-row artifacts + one
    broadcast threshold; stage 3 is Arrow map-only; stage 4's only
    shuffle is the per-shard running-sum window over (doc_id, count)
    rows — no stage shuffles document text."""
    from ncbi_analysis_spark.functions.bpe import bpe_encode, train_bpe
    from ncbi_analysis_spark.operators.dedup import (
        lsh_index_collisions,
        read_lsh_index,
        write_lsh_index,
    )
    from ncbi_analysis_spark.operators.packing import pack_fragments
    from ncbi_analysis_spark.operators.sketches import (
        quantile_sketch,
        quantile_sketch_threshold,
        read_quantile_sketch,
        write_quantile_sketch,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import _staging_dir

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )
    old = d.filter(F.col("doc_id") % 7 != 0)
    new = d.filter(F.col("doc_id") % 7 == 0)
    kw = dict(num_perm=4, bands=2, shingle_n=3)

    ipath = _staging_dir("spark_graft_v5_lsh")
    write_lsh_index(old.select("doc_id", "text"), "text", "doc_id",
                    ipath, **kw)
    hits = lsh_index_collisions(
        new.select("doc_id", "text"), read_lsh_index(spark, ipath),
        "text", "doc_id", **kw,
    ).select("doc_id").distinct()
    survivors = new.join(hits, "doc_id", "left_anti")

    spath = _staging_dir("spark_graft_v5_qs")
    write_quantile_sketch(
        quantile_sketch(old, "n_chars", "doc_id", k=_V5_K),
        spath, k=_V5_K,
    )
    thr = quantile_sketch_threshold(
        read_quantile_sketch(spark, spath, k=_V5_K), 0.5
    )
    kept = (
        survivors.crossJoin(F.broadcast(thr))
        .filter(F.col("n_chars") >= F.col("threshold"))
        .drop("threshold")
    )

    merges = train_bpe(d, "text", num_merges=120)
    enc = bpe_encode(kept, merges, "text")
    return pack_fragments(
        enc, tokens=F.size("token_ids"),
        capacity=_V5_CAP, n_shards=_V5_SHARDS,
    )


def _curation_v5_sql() -> str:
    import duckdb

    from ncbi_analysis_spark.functions.bpe import (
        bpe_batch_encoder,
        bpe_train_local,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import _oracle_sf_dir
    from ncbi_analysis_spark.plans.driver_queries_r7 import _fuzzy_decon_sql

    path = f"{_oracle_sf_dir()}/documents.parquet"
    merges = bpe_train_local(path, num_merges=120)
    enc = bpe_batch_encoder(merges)
    con = duckdb.connect()
    words = [r[0] for r in con.execute(
        r"SELECT DISTINCT unnest(string_split_regex(trim(lower(text)), "
        r"'\s+')) AS w FROM read_parquet(?) "
        "WHERE text IS NOT NULL ORDER BY w", [path]).fetchall()
        if r[0] != ""]

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    vals = ", ".join(
        f"({q(w)}, {len(enc([w])[0])})" for w in words
    )
    return rf"""
WITH hits AS (
  SELECT DISTINCT bench_id AS doc_id FROM ({_fuzzy_decon_sql()}) p
),
survivors AS (
  SELECT doc_id, text, n_chars FROM documents
  WHERE doc_id % 7 = 0 AND doc_id NOT IN (SELECT doc_id FROM hits)
),
qs AS (
  SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT AS h,
         n_chars AS v
  FROM documents WHERE doc_id % 7 <> 0 AND n_chars IS NOT NULL
  ORDER BY h, v LIMIT {_V5_K}
),
thr AS (
  SELECT v AS threshold FROM (
    SELECT v, row_number() OVER (ORDER BY v, h) AS rk,
           count(*) OVER () AS n
    FROM qs
  ) WHERE rk = (500000 * n + 999999) // 1000000
),
kept AS (
  SELECT s.* FROM survivors s CROSS JOIN thr
  WHERE s.n_chars >= thr.threshold
),
encw(w, n) AS (VALUES {vals}),
ws AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(COALESCE(text, ''))),
                                        '\s+'), x -> x <> '') AS l
  FROM kept
),
wpos AS (
  SELECT doc_id, l[t.i] AS w
  FROM ws, UNNEST(range(1, len(l) + 1)) AS t(i)
),
ntok AS (
  SELECT ws.doc_id, COALESCE(SUM(e.n), 0)::BIGINT AS n_tokens
  FROM ws LEFT JOIN wpos ON ws.doc_id = wpos.doc_id
  LEFT JOIN encw e ON wpos.w = e.w
  GROUP BY ws.doc_id
),
base AS (
  SELECT doc_id, n_tokens,
         (('0x' || substr(md5('pack' || doc_id::VARCHAR), 1, 8))::BIGINT
            % {_V5_SHARDS})::INT AS shard,
         md5('pack|' || doc_id::VARCHAR) AS ord_
  FROM ntok WHERE n_tokens > 0
),
stream AS (
  SELECT *, SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord_, doc_id
             ROWS UNBOUNDED PRECEDING)::BIGINT AS tok_end
  FROM base
),
s2 AS (SELECT *, tok_end - n_tokens AS tok_start FROM stream),
frag AS (
  SELECT shard, doc_id, n_tokens, tok_start, tok_end, b.bin_id
  FROM s2, LATERAL (SELECT UNNEST(generate_series(tok_start // {_V5_CAP},
                    (tok_end - 1) // {_V5_CAP})) AS bin_id) b
)
SELECT shard, bin_id, doc_id, n_tokens,
       GREATEST(tok_start, bin_id * {_V5_CAP}) - tok_start AS frag_start,
       LEAST(tok_end, (bin_id + 1) * {_V5_CAP}) - tok_start AS frag_end,
       GREATEST(tok_start, bin_id * {_V5_CAP}) - bin_id * {_V5_CAP} AS bin_off
FROM frag
"""


def cc_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental connected-components fold (crawl-append clustering):
    the LSH pair edges over ``documents`` are split into a deterministic
    'history' ((ida+idb) % 3 != 0) and a 'today's batch' (the rest);
    the history is clustered with the full algorithm, then the batch is
    FOLDED in with ``connected_components_incremental`` — which
    re-clusters only components incident to a batch endpoint and passes
    everything else through an anti-join. The oracle is the full
    recursive-CTE recompute over ALL edges (the ``dedup_dup_clusters``
    fixpoint), so any fold error — a missed cross-batch merge, a stale
    label on a touched component, a lost batch-only node — is an exact
    hash mismatch. The split is intentionally invisible to the oracle:
    incremental ≡ full recompute is the whole contract."""
    from ncbi_analysis_spark.operators import dedup as dd
    from ncbi_analysis_spark.operators.components import (
        connected_components, connected_components_incremental)

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dd.minhash_lsh_pairs(
        d, "text", "doc_id", num_perm=4, bands=2, shingle_n=3,
        max_band_freq=None,
    ).localCheckpoint(eager=True)
    is_new = (F.col("id_a") + F.col("id_b")) % 3 == 0
    prior = connected_components(pairs.filter(~is_new))
    folded = connected_components_incremental(prior, pairs.filter(is_new))
    return folded.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def _cc_incremental_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r3 import _dup_clusters_sql

    return _dup_clusters_sql()


def dup_span_removal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT span-level substring dedup (``remove_dup_spans`` with
    ``anchor_bits=0`` — every position anchors, so every duplicated
    32-char window in the corpus is found and cut; the guarantee of Lee
    et al. 2022's suffix-array exact tier, previously exercised only as
    ``span_recall_audit``'s truth leg). The oracle is the anchored
    ``dup_span_removal`` SQL minus the anchor filter: DuckDB probes
    every start position, merges overlaps and rebuilds the complement —
    so a missed unaligned duplicate, an off-by-one at a window
    boundary, or an overlap-merge bug in the exact path is an exact
    hash mismatch on the rebuilt text."""
    from ncbi_analysis_spark.operators.dedup import remove_dup_spans

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    out = remove_dup_spans(d, "text", "doc_id", window=32, min_docs=2,
                           anchor_bits=0)
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        "n_spans_removed",
        "n_chars_removed",
    )


def _dup_span_exact_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r8 import DUP_SPAN_SQL

    anchored = "  WHERE substr(md5(substr(tx, (s + 1)::INT, 8)), 1, 1) = '0'"
    assert anchored in DUP_SPAN_SQL, "anchored SQL drifted; update the strip"
    return DUP_SPAN_SQL.replace(anchored, "")


def stream_lsh_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup gate against the PERSISTED LSH index end-to-end
    (streaming/events.py::stream_index_decon): the old corpus
    (doc_id % 7 != 0) is indexed with ``write_lsh_index``, a takedown
    batch (% 5 == 0) is tombstoned WITHOUT compaction, then the new
    crawl (% 7 == 0) flows through as a file stream — each micro-batch
    probed against the live index view via foreachBatch, survivors
    written per batch. The gated output must equal the batch recompute:
    new docs with no band collision against (old corpus minus deleted
    docs). Pins three things at once: the gate's verdicts are
    batching-invariant, mid-life tombstones are honored by a stream
    with NO compaction or restart, and the index-side join sees exactly
    the live view."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.operators.dedup import (
        delete_from_lsh_index,
        write_lsh_index,
    )
    from ncbi_analysis_spark.plans.driver_queries_r11 import (
        _stage_as_stream,
        _staged_stream_conf,
    )
    from ncbi_analysis_spark.streaming.events import (
        read_gated_docs,
        stream_index_decon,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = d.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    new = d.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")

    tmp = tempfile.mkdtemp(prefix="stream_lsh_gate_")
    try:
        idx = f"{tmp}/index"
        write_lsh_index(old, "text", "doc_id", idx,
                        num_perm=4, bands=2, shingle_n=3)
        delete_from_lsh_index(
            old.filter(F.col("doc_id") % 5 == 0)
            .select(F.col("doc_id").alias("id")),
            idx,
        )
        src = _stage_as_stream(spark, new, tmp)
        stream = spark.readStream.schema(new.schema).parquet(src)
        with _staged_stream_conf(spark, src):
            stream_index_decon(stream, idx, f"{tmp}/gated", f"{tmp}/ck")
        gated = read_gated_docs(spark, f"{tmp}/gated").select(
            "doc_id",
            F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("text_md5"),
        )
        rows = gated.collect()
        schema = gated.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _stream_lsh_gate_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r7 import _fuzzy_decon_sql

    coll = _fuzzy_decon_sql(corpus_pred="doc_id % 5 <> 0")
    return f"""
SELECT doc_id, md5(COALESCE(text, '')) AS text_md5
FROM documents
WHERE doc_id % 7 = 0
  AND doc_id NOT IN (SELECT bench_id FROM ({coll}) p)
"""


def curation_v6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-refresh curation, dedup-centric (the v5 sibling focused on
    the round's clustering tiers): (1) LSH pair edges over the corpus,
    split into retained-history edges and today's-batch edges (any edge
    touching a new doc); (2) history clustered once, the batch FOLDED
    in with ``connected_components_incremental`` — the production shape
    where yesterday's labels are an artifact, not a recompute; (3)
    component dedup keeps each cluster's min doc_id (plus all unnoded
    docs); (4) the survivor corpus gets EXACT span-level substring
    dedup (``anchor_bits=0`` — every duplicated 32-char window cut from
    non-keepers). Output: one row per surviving doc with its rebuilt
    text digest and span-removal counts. The oracle recomputes the
    whole chain from raw documents (full recursive-CTE components —
    the history/batch split must be invisible — then every-position
    span SQL over survivors), so a fold error, a lost survivor, or a
    span off-by-one all hash-mismatch."""
    from ncbi_analysis_spark.operators import dedup as dd
    from ncbi_analysis_spark.operators.components import (
        connected_components, connected_components_incremental)

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    pairs = dd.minhash_lsh_pairs(
        d, "text", "doc_id", num_perm=4, bands=2, shingle_n=3,
        max_band_freq=None,
    ).localCheckpoint(eager=True)
    is_new = (F.col("id_a") % 7 == 0) | (F.col("id_b") % 7 == 0)
    prior = connected_components(pairs.filter(~is_new))
    labels = connected_components_incremental(prior, pairs.filter(is_new))
    losers = labels.filter(F.col("id") != F.col("component")) \
                   .select(F.col("id").alias("doc_id"))
    survivors = d.join(losers, "doc_id", "left_anti")
    out = dd.remove_dup_spans(survivors, "text", "doc_id", window=32,
                              min_docs=2, anchor_bits=0)
    return out.select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("text_md5"),
        "n_spans_removed",
        "n_chars_removed",
    )


def _curation_v6_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries import _SHINGLES_SQL

    return f"""
WITH RECURSIVE
shg AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
m AS (SELECT doc_id,
        list_aggregate(list_transform(sh, x -> md5('0|' || x)), 'min') AS mh0,
        list_aggregate(list_transform(sh, x -> md5('1|' || x)), 'min') AS mh1,
        list_aggregate(list_transform(sh, x -> md5('2|' || x)), 'min') AS mh2,
        list_aggregate(list_transform(sh, x -> md5('3|' || x)), 'min') AS mh3
      FROM shg),
bandrows AS (
  SELECT doc_id, 0 AS band, md5(mh0 || ',' || mh1) AS bh FROM m
  UNION ALL
  SELECT doc_id, 1 AS band, md5(mh2 || ',' || mh3) AS bh FROM m
),
lsh_pairs AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
              FROM bandrows a JOIN bandrows b
                ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
cedges AS (SELECT ida AS u, idb AS v FROM lsh_pairs
           UNION SELECT idb, ida FROM lsh_pairs),
reach AS (
  SELECT u AS id, u AS r FROM (SELECT DISTINCT u FROM cedges)
  UNION
  SELECT e.u AS id, reach.r AS r FROM cedges e JOIN reach ON e.v = reach.id
),
labels AS (SELECT id AS doc_id, MIN(r) AS comp FROM reach GROUP BY id),
surv AS (
  SELECT d.doc_id, COALESCE(d.text, '') AS tx
  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
  WHERE l.doc_id IS NULL OR l.comp = d.doc_id),
w AS (
  SELECT doc_id, s::INT AS span_start, (s + 32)::INT AS span_end,
         md5(substr(tx, (s + 1)::INT, 32)) AS wh
  FROM (SELECT doc_id, tx,
               UNNEST(range(0, GREATEST(LENGTH(tx) - 32 + 1, 0))) AS s
        FROM surv)),
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
         string_agg(substr(surv.tx, ks + 1, ke - ks), '' ORDER BY ks) AS head
  FROM segs JOIN surv USING (doc_id) GROUP BY segs.doc_id),
fin AS (
  SELECT doc_id, COUNT(*) AS n_spans, SUM(e - s) AS n_chars, MAX(e) AS last_e
  FROM mspans GROUP BY doc_id)
SELECT surv.doc_id,
       md5(CASE WHEN fin.doc_id IS NULL THEN surv.tx
                ELSE COALESCE(reb.head, '') || substr(surv.tx, (fin.last_e + 1)::INT)
           END) AS text_md5,
       COALESCE(fin.n_spans, 0)::BIGINT AS n_spans_removed,
       COALESCE(fin.n_chars, 0)::BIGINT AS n_chars_removed
FROM surv LEFT JOIN fin USING (doc_id) LEFT JOIN reb USING (doc_id)
"""


def span_dup_ratio_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplication mass + keep verdict
    (operators/dedup.py::span_dup_stats — the RefinedWeb-style "drop
    documents that are mostly duplicated content" doc-level gate, the
    whole-document sibling of span removal): every doc's chars covered
    by 32-char windows occurring in >=2 docs (keeper-inclusive,
    anchored at the production density), as exact integer
    parts-per-million, plus the kept flag at the 50% threshold. The
    oracle rebuilds coverage with the anchored window SQL and the same
    overlap-merge — ratio arithmetic is integer ppm on both engines, so
    the match is exact, never float-close."""
    from ncbi_analysis_spark.operators.dedup import span_dup_stats

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    stats = span_dup_stats(d, "text", "doc_id", window=32, min_docs=2)
    return stats.select(
        "doc_id", "n_chars", "dup_chars", "dup_ratio_ppm",
        (F.col("dup_ratio_ppm") < 500_000).alias("kept"),
    )


_SPAN_RATIO_SQL = r"""
WITH d AS (SELECT doc_id, COALESCE(text, '') AS tx FROM documents),
w AS (
  SELECT doc_id, s::INT AS span_start, (s + 32)::INT AS span_end,
         md5(substr(tx, (s + 1)::INT, 32)) AS wh
  FROM (SELECT doc_id, tx,
               UNNEST(range(0, GREATEST(LENGTH(tx) - 32 + 1, 0))) AS s
        FROM d)
  WHERE substr(md5(substr(tx, (s + 1)::INT, 8)), 1, 1) = '0'),
dups AS (SELECT wh FROM w GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2),
rem AS (SELECT DISTINCT w.doc_id, span_start, span_end
        FROM w JOIN dups USING (wh)),
marked AS (
  SELECT doc_id, span_start, span_end,
         CASE WHEN span_start <= MAX(span_end) OVER (
                PARTITION BY doc_id ORDER BY span_start, span_end
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS brk
  FROM marked_src),
isl AS (
  SELECT doc_id, span_start, span_end,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY span_start, span_end
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM marked),
cov AS (
  SELECT doc_id, SUM(e - s) AS dup_chars
  FROM (SELECT doc_id, MIN(span_start) AS s, MAX(span_end) AS e
        FROM isl GROUP BY doc_id, g)
  GROUP BY doc_id)
SELECT d.doc_id,
       LENGTH(d.tx)::BIGINT AS n_chars,
       COALESCE(cov.dup_chars, 0)::BIGINT AS dup_chars,
       CASE WHEN LENGTH(d.tx) > 0
            THEN (COALESCE(cov.dup_chars, 0) * 1000000)
                 // LENGTH(d.tx)
            ELSE 0 END::BIGINT AS dup_ratio_ppm,
       (CASE WHEN LENGTH(d.tx) > 0
             THEN (COALESCE(cov.dup_chars, 0) * 1000000)
                  // LENGTH(d.tx)
             ELSE 0 END) < 500000 AS kept
FROM d LEFT JOIN cov USING (doc_id)
""".replace("marked_src", "rem")


def stream_ivf_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming embedding near-dup gate against the persisted IVF
    index end-to-end (streaming/events.py::stream_ivf_decon — the
    vector twin of ``stream_lsh_gate``): old vectors (% 7 != 0) are
    indexed under a frozen quantizer, a takedown batch (% 5 == 0) is
    tombstoned WITHOUT compaction, then the new vectors (% 7 == 0)
    stream through — each micro-batch IVF-probed against the live
    index, rows whose best probed cosine >= 0.32 dropped, survivors
    written per batch. Oracle: the ANN_IVF recompute (same assignment
    and probe SQL, k=1) over the corpus minus the deleted vectors,
    keeping new ids whose best cos is under the threshold or absent.
    Pins batching-invariance, the mid-life tombstone path, and the
    probe-bucket equivalence of index and recompute in one row set."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.operators.similarity_search import (
        delete_from_ivf_index,
        ivf_assign,
        write_ivf_index,
    )
    from ncbi_analysis_spark.plans.driver_queries_r11 import (
        _stage_as_stream,
        _staged_stream_conf,
    )
    from ncbi_analysis_spark.streaming.events import (
        read_gated_docs,
        stream_ivf_decon,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = e.filter(F.col("vec_id") % 7 != 0).select("vec_id", "embedding")
    new = e.filter(F.col("vec_id") % 7 == 0).select("vec_id", "embedding")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding")

    tmp = tempfile.mkdtemp(prefix="stream_ivf_gate_")
    try:
        idx = f"{tmp}/index"
        write_ivf_index(ivf_assign(old, cents), idx, centroids=cents)
        delete_from_ivf_index(
            old.filter(F.col("vec_id") % 5 == 0).select("vec_id"), idx)
        src = _stage_as_stream(spark, new, tmp)
        stream = spark.readStream.schema(new.schema).parquet(src)
        with _staged_stream_conf(spark, src):
            stream_ivf_decon(stream, idx, cents, f"{tmp}/gated",
                             f"{tmp}/ck", threshold=0.32, nprobe=2)
        gated = read_gated_docs(spark, f"{tmp}/gated").select("vec_id")
        rows = gated.collect()
        schema = gated.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _stream_ivf_gate_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries import ANN_IVF_SQL

    old_c = "corpus AS (SELECT vec_id, embedding AS v FROM embeddings),"
    new_c = ("corpus AS (SELECT vec_id, embedding AS v FROM embeddings "
             "WHERE vec_id % 7 <> 0 AND vec_id % 5 <> 0),")
    old_q = ("q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings "
             "WHERE vec_id < 48),")
    new_q = ("q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings "
             "WHERE vec_id % 7 = 0),")
    for frag in (old_c, old_q):
        if frag not in ANN_IVF_SQL:
            raise RuntimeError(
                "ANN_IVF_SQL CTE changed shape; update _stream_ivf_gate_sql")
    probe = ANN_IVF_SQL.replace(old_c, new_c).replace(old_q, new_q)
    return f"""
WITH best AS (
  SELECT q_id, MAX(cos_sim) AS best_cos
  FROM ({probe}) p WHERE rk = 1 GROUP BY q_id)
SELECT e.vec_id
FROM embeddings e LEFT JOIN best ON e.vec_id = best.q_id
WHERE e.vec_id % 7 = 0
  AND (best.q_id IS NULL OR best.best_cos < 0.32)
"""


def cc_labels_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted component-labels artifact end-to-end
    (operators/components.py::write_cc_labels/fold_into_cc_labels/
    read_cc_labels — the production crawl loop where yesterday's
    clustering is a durable table): history edges clustered and
    WRITTEN, then two successive edge batches FOLDED IN PLACE (each
    fold re-clusters only touched components and rewrites through the
    locked two-phase swap), then the artifact read back. Must equal
    the full recursive-CTE recompute over all edges — a fold that
    loses a batch, a swap that drops files, or a stale-prior rewrite
    all hash-mismatch."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.operators import dedup as dd
    from ncbi_analysis_spark.operators.components import (
        fold_into_cc_labels,
        read_cc_labels,
        write_cc_labels,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dd.minhash_lsh_pairs(
        d, "text", "doc_id", num_perm=4, bands=2, shingle_n=3,
        max_band_freq=None,
    ).localCheckpoint(eager=True)
    bucket = (F.col("id_a") + F.col("id_b")) % 3

    tmp = tempfile.mkdtemp(prefix="cc_labels_")
    try:
        path = f"{tmp}/labels"
        write_cc_labels(pairs.filter(bucket == 0), path)
        fold_into_cc_labels(pairs.filter(bucket == 1), path)
        fold_into_cc_labels(pairs.filter(bucket == 2), path)
        out = read_cc_labels(spark, path).select(
            F.col("id").alias("doc_id"), F.col("component").alias("cluster_id"))
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile (operators/profile.py::profile_table —
    the "what is in this table" pre-curation scan): row/null/distinct
    counts, string-cast min/max, and total string length for every
    documents column, one corpus scan, exact integer arithmetic. The
    oracle recomputes each column's row from raw SQL aggregates."""
    from ncbi_analysis_spark.operators.profile import profile_table

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return profile_table(d)


def _table_profile_sql() -> str:
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    legs = []
    for c in cols:
        legs.append(f"""
SELECT '{c}' AS "column",
       COUNT(*)::BIGINT AS n_rows,
       SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
       COUNT(DISTINCT {c})::BIGINT AS n_distinct,
       MIN({c}::VARCHAR) AS min_value,
       MAX({c}::VARCHAR) AS max_value,
       COALESCE(SUM(LENGTH({c}::VARCHAR)), 0)::BIGINT AS sum_len
FROM documents""")
    return "\nUNION ALL\n".join(legs)


def queries_r13() -> dict:
    return {
        "bm25_delete_search": bm25_delete_search,
        "bm25_compacted_search": bm25_compacted_search,
        "lsh_delete_probe": lsh_delete_probe,
        "ivf_delete_search": ivf_delete_search,
        "stream_cm_publish": stream_cm_publish,
        "span_recall_planted": span_recall_planted,
        "flagship_multi_accession": flagship_multi_accession,
        "bpe_encode_ids": bpe_encode_ids,
        "stream_quantile_publish": stream_quantile_publish,
        "heavy_hitters_per_lang": heavy_hitters_per_lang,
        "curation_v5": curation_v5,
        "cc_incremental_clusters": cc_incremental_clusters,
        "dup_span_removal_exact": dup_span_removal_exact,
        "stream_lsh_gate": stream_lsh_gate,
        "curation_v6": curation_v6,
        "span_dup_ratio_gate": span_dup_ratio_gate,
        "stream_ivf_gate": stream_ivf_gate,
        "cc_labels_artifact": cc_labels_artifact,
        "table_profile": table_profile,
    }


def oracle_sql_r13() -> dict[str, str]:
    return {
        "bm25_delete_search": _bm25_delete_sql(),
        "bm25_compacted_search": _bm25_delete_sql(),
        "lsh_delete_probe": _lsh_delete_sql(),
        "ivf_delete_search": _ivf_delete_sql(),
        "stream_cm_publish": _stream_cm_sql(),
        "span_recall_planted": _SPAN_RECALL_SQL,
        "flagship_multi_accession": _flagship_multi_sql(),
        "bpe_encode_ids": _bpe_encode_sql(),
        "stream_quantile_publish": _stream_quantile_sql(),
        "heavy_hitters_per_lang": _hh_per_lang_sql(),
        "curation_v5": _curation_v5_sql(),
        "cc_incremental_clusters": _cc_incremental_sql(),
        "dup_span_removal_exact": _dup_span_exact_sql(),
        "stream_lsh_gate": _stream_lsh_gate_sql(),
        "curation_v6": _curation_v6_sql(),
        "span_dup_ratio_gate": _SPAN_RATIO_SQL,
        "stream_ivf_gate": _stream_ivf_gate_sql(),
        "cc_labels_artifact": _cc_incremental_sql(),
        "table_profile": _table_profile_sql(),
    }
