"""Round-7 driver-contract queries.

Staged during round 6 (the round-6 gate's 50 slots were exactly full);
wired into ``driver_queries._queries_in_build_order`` /
``_oracle_sql_in_build_order`` at round-7 start via the lazy ``_r7()``
helper. The freshness rotation puts all nine at the front of the
round-7 driver gate (never recorded before r7). Each entry is also
replayed against its DuckDB oracle at sf0.001 by
``tests/test_boilerplate.py`` with the driver's own canonicalization
(sorted columns, sorted rows, exact values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# the documents fixture has no newlines, so the driver query derives a
# lined corpus by turning two mid-frequency filler words into line
# breaks — same regex on both engines (plain alternation, no engine-
# specific syntax); at sf0.01 this yields ~2.1k lines, ~120 of which
# repeat across documents
_LINE_BREAK_PATTERN = " table | data "


def boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal end-to-end
    (operators/dedup.py::remove_repeated_lines): every line occurring in
    >= 2 distinct documents is dropped corpus-wide, documents are
    reassembled from the surviving lines in order, and per-document
    removal counts come back for curation thresholds."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.dedup import remove_repeated_lines

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.regexp_replace("text", _LINE_BREAK_PATTERN, "\n").alias("text"),
    )
    return remove_repeated_lines(d, "text", "doc_id", sep="\n", min_docs=2)


BOILERPLATE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         regexp_replace(text, '{_LINE_BREAK_PATTERN}', chr(10), 'g') AS tx
  FROM documents),
l AS (
  SELECT doc_id, generate_subscripts(arr, 1) AS pos, unnest(arr) AS line
  FROM (SELECT doc_id, string_split(tx, chr(10)) AS arr FROM d)),
b AS (SELECT line FROM l GROUP BY line
      HAVING COUNT(DISTINCT doc_id) >= 2 AND line != ''),
k AS (SELECT doc_id, pos, line FROM l ANTI JOIN b USING (line)),
r AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
         COUNT(*)::BIGINT AS n_kept
  FROM k GROUP BY doc_id),
n AS (SELECT doc_id, len(string_split(tx, chr(10)))::BIGINT AS n_lines FROM d)
SELECT n.doc_id, COALESCE(r.clean, '') AS text, n.n_lines,
       (n.n_lines - COALESCE(r.n_kept, 0))::BIGINT AS n_removed
FROM n LEFT JOIN r USING (doc_id)
"""


def multimodal_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media rollup (operators/multimodal.py::media_stats)
    through the gate: per-kind counts, payload bytes, and typed-meta
    averages WITHOUT decoding — the layout claim being checked is that
    cheap stats never touch the binary column (column pruning drops it
    at the scan). Exactness: counts and byte totals are integer sums;
    the averages are an exact long sum over ints with one final IEEE
    division on both engines."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators import multimodal as mm

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    is_img = F.col("kind") == "image"
    media = d.select(
        F.col("doc_id").alias("media_id"), kind.alias("kind"),
        F.encode("text", "utf-8").alias("data"), "n_chars",
    ).select(
        "media_id", "kind", "data",
        F.struct(
            F.when(is_img, (F.col("n_chars") % 640 + 1).cast("int"))
            .alias("width"),
            F.when(is_img, (F.col("n_chars") % 480 + 1).cast("int"))
            .alias("height"),
            F.lit(None).cast("int").alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.when(~is_img, (F.col("n_chars").cast("long") * 37))
            .alias("duration_ms"),
            F.lit("mixed").alias("format"),
        ).alias("meta"),
    )
    return mm.media_stats(media)


MEDIA_STATS_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         octet_length(encode(text))::BIGINT AS nbytes,
         CASE WHEN doc_id % 3 = 0 THEN (n_chars % 640 + 1)::INT END AS width,
         CASE WHEN doc_id % 3 != 0 THEN (n_chars::BIGINT * 37) END AS duration_ms
  FROM documents)
SELECT kind, COUNT(*)::BIGINT AS n, SUM(nbytes)::BIGINT AS total_bytes,
       (SUM(width)::BIGINT::DOUBLE / COUNT(width)) AS avg_width,
       (SUM(duration_ms)::BIGINT::DOUBLE / COUNT(duration_ms)) AS avg_duration_ms
FROM m GROUP BY kind
"""


_SEM_THRESHOLD = 0.4  # the embeddings fixture's near-dup band (same as
# dedup_embedding_pairs); the canonical SemDeDup eps would be ~1 - 0.05


def semantic_dedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end (operators/dedup.py::semantic_dedup;
    Abbas et al. 2023): trained k-means buckets (the ann_ivf_trained
    quantizer, same params), within-cluster cosine edges, connected
    components, keep-the-outlier survivor per component. Every row comes
    back labeled (c_id, cent_sim, component, keep). ``max_cluster_rows=
    None`` mirrors the oracle's uncapped pair generation (the cap is a
    scale knob, off for parity runs — same stance as
    dedup_dup_clusters). ``pair_method='auto'`` keeps the bit-exact expr
    pair stage at gate scale (sf0.01, 500 rows) and switches to the
    blocked-BLAS form past ``max_expr_rows`` — the sf0.1 bench times the
    production path, the sf0.01 gate checks the oracle twin."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators import similarity_search as ss
    from ncbi_analysis_spark.operators.dedup import semantic_dedup
    from ncbi_analysis_spark.plans.driver_queries_r5 import _TRAIN_PARAMS

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ss.train_ivf_centroids(e, **_TRAIN_PARAMS)
    return semantic_dedup(
        e, "embedding", "vec_id", cents,
        threshold=_SEM_THRESHOLD, max_cluster_rows=None,
    )


def _semantic_dedup_sql() -> str:
    """Generated oracle: centroid literals re-derived Spark-free
    (bit-identical — driver_queries_r5 module docstring has the
    determinism argument), the ivf_assign argmax fold-mirrored, cosine
    edges within clusters, recursive-CTE components, and the
    keep-the-outlier window on the EXACT cent_sim double (rounding only
    in the outer projection)."""
    from ncbi_analysis_spark.operators.similarity_search import (
        train_ivf_centroids_local,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import (
        _DOT,
        _TRAIN_PARAMS,
        _cos_sql,
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
WITH RECURSIVE cent AS (SELECT * FROM (VALUES
  {rows}
) AS t(c_id, cv)),
corpus AS (SELECT vec_id, embedding AS v FROM embeddings),
assign0 AS (
  -- dot(v, c) / ||c|| — ivf_assign's map-side argmax fold (the ||v||
  -- division is skipped on both sides: a positive per-row constant
  -- can't change the argmax or its tie-break)
  SELECT c.vec_id, c.v, ct.c_id,
         (CASE WHEN sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) = 0 THEN 0.0
               ELSE {_DOT.format(a='c.v', b='ct.cv')}
                    / sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) END) AS sim
  FROM corpus c CROSS JOIN cent ct
),
assign AS (SELECT vec_id, v, c_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_id) AS rn
  FROM assign0
) WHERE rn = 1),
sims AS (
  SELECT a.vec_id, a.v, a.c_id, {_cos_sql('a.v', 'ct.cv')} AS cent_sim
  FROM assign a JOIN cent ct USING (c_id)
),
pairs AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb
  FROM assign a JOIN assign b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
  WHERE {_cos_sql('a.v', 'b.v')} >= {_dlit(_SEM_THRESHOLD)}
),
edges AS (SELECT ida AS u, idb AS w FROM pairs
          UNION SELECT idb, ida FROM pairs),
reach AS (
  SELECT u AS id, u AS r FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u AS id, reach.r AS r FROM edges e JOIN reach ON e.w = reach.id
),
comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
lab AS (
  SELECT s.vec_id, s.c_id, s.cent_sim, c.component
  FROM sims s LEFT JOIN comp c ON s.vec_id = c.id
)
SELECT vec_id, c_id, ROUND(cent_sim, 6) AS cent_sim, component, keep FROM (
  SELECT vec_id, c_id, cent_sim, component,
         (ROW_NUMBER() OVER (PARTITION BY COALESCE(component, vec_id)
                             ORDER BY cent_sim ASC, vec_id ASC) = 1) AS keep
  FROM lab
)
"""


_DSIR_PARAMS = dict(n_buckets=1024, ngram_max=2)


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scoring end-to-end (operators/terms.py::
    dsir_logratios + dsir_score; Xie et al. 2023): hashed-bigram bag
    models with the English subset as target and the full corpus as raw,
    every document scored with its target-vs-raw log importance. The
    weights are computed once in driver CPython from two bounded
    1024-bucket count vectors, so the oracle twin re-derives them
    bit-identically and the per-doc bucket-ordered fold hash-matches."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.terms import (
        dsir_logratios_pred,
        dsir_score,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # fused single-pass fit (target = predicate over raw): identical
    # counts and weights to the two-frame form, one job instead of two
    w = dsir_logratios_pred(d, F.col("lang") == "en", "text", "doc_id",
                            **_DSIR_PARAMS)
    return dsir_score(d, "text", "doc_id", w, **_DSIR_PARAMS)


def _dsir_weight_rows() -> str:
    """Weight literals from the Spark-free twin (pyarrow counts + the
    same CPython log) as a SQL VALUES body — shared by the dsir and
    curation-v2 oracles."""
    from ncbi_analysis_spark.operators.terms import dsir_logratios_local
    from ncbi_analysis_spark.plans.driver_queries_r5 import (
        _dlit,
        _oracle_sf_dir,
    )

    W = dsir_logratios_local(
        f"{_oracle_sf_dir()}/documents.parquet",
        target_pred=lambda r: r["lang"] == "en",
        **_DSIR_PARAMS,
    )
    return ",\n  ".join(f"({b}, {_dlit(w)})" for b, w in W)


def _dsir_sql() -> str:
    """Generated oracle: weight literals re-derived Spark-free, features
    via the engine-mirrored tokenizer/md5-bucket idioms, and the per-doc
    fold as list_sort + 0.0-seeded list_reduce — the exact double the
    Spark sort_array + aggregate fold produces."""
    B = _DSIR_PARAMS["n_buckets"]
    rows = _dsir_weight_rows()
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
j AS (SELECT doc_id, bucket, c, c * w AS term FROM per JOIN w USING (bucket))
SELECT doc_id, SUM(c)::BIGINT AS n_feats,
       ROUND(list_reduce(
         list_prepend(0.0::DOUBLE,
           list_transform(list_sort(list({{'b': bucket, 't': term}})),
                          s -> s.t)),
         (a, b) -> a + b), 6) AS logw
FROM j GROUP BY doc_id
"""


_stream_q_seq = 0


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (streaming/events.py::enrich_stream)
    through the gate: the events file-stream left-joined to the customer
    dimension (broadcast — map-side per micro-batch, zero shuffle), the
    stateless lookup pattern every streaming pipeline starts with. A
    bounded availableNow run over a static copy emits exactly the
    relational join, so the oracle is the plain SQL join."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ncbi_analysis_spark.streaming.events import (
        enrich_stream,
        read_event_stream,
        run_to_memory,
    )

    global _stream_q_seq
    _stream_q_seq += 1
    name = f"drv_stream_enrich_{_stream_q_seq}"

    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    d = tempfile.mkdtemp(prefix="stream_enrich_")
    try:
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        stream = read_event_stream(spark, d)
        out = enrich_stream(stream, dim, on="user_id", how="left")
        run_to_memory(out, name, timeout_s=300)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name).select(
        "event_id", F.unix_micros("ts").alias("ts_us"),
        "user_id", "event_type", "value", "c_name", "c_mktsegment",
    )


STREAM_ENRICH_SQL = """
SELECT e.event_id, epoch_us(e.ts) AS ts_us, e.user_id, e.event_type,
       e.value, c.c_name, c.c_mktsegment
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


def temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture quotas (operators/scale.py::
    temperature_quotas; the XLM-R/mT5 multilingual sampling rule) over
    the documents corpus grouped by language: integer quotas summing to
    200, α=0.5 via IEEE sqrt so every weight double is bit-stable, the
    normalizer and seat accounting folded in group-key order. The oracle
    re-derives the whole apportionment relationally."""
    from ncbi_analysis_spark.operators.scale import temperature_quotas

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return temperature_quotas(d, ["lang"], total=200, alpha=0.5)


TEMPERATURE_SQL = """
WITH g AS (SELECT lang, COUNT(*)::BIGINT AS n_rows FROM documents GROUP BY lang),
w AS (SELECT lang, n_rows, sqrt(n_rows::DOUBLE) AS wv FROM g),
tot AS (SELECT list_reduce(
          list_prepend(0.0::DOUBLE,
            list_transform(list_sort(list({'l': lang, 'w': wv})), s -> s.w)),
          (a, b) -> a + b) AS tw FROM w),
s AS (SELECT lang, n_rows, wv / tw * 200.0 AS share FROM w, tot),
f AS (SELECT lang, n_rows, share,
             LEAST(FLOOR(share)::BIGINT, n_rows) AS fl FROM s),
sp AS (SELECT list_reduce(
         list_prepend(0::BIGINT,
           list_transform(list_sort(list({'l': lang, 'f': fl})), s -> s.f)),
         (a, b) -> a + b) AS spent FROM f),
r AS (SELECT lang, n_rows, fl,
             ROW_NUMBER() OVER (
               ORDER BY CASE WHEN fl >= n_rows THEN -1.0
                             ELSE share - fl END DESC, lang) AS rk,
             200 - sp.spent AS leftn
      FROM f, sp)
SELECT lang, n_rows,
       LEAST(fl + CASE WHEN rk <= leftn AND fl < n_rows THEN 1 ELSE 0 END,
             n_rows)::BIGINT AS quota
FROM r
"""


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (operators/packing.py::
    chunk_documents): 48-token windows every 32 tokens (overlapping — the
    RAG/long-doc context-window prep) over the documents corpus; the
    map-only explode is re-derived relationally."""
    from ncbi_analysis_spark.operators.packing import chunk_documents

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(d, "text", "doc_id", max_tokens=48, stride=32)


DOC_CHUNKS_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         string_split_regex(TRIM(COALESCE(text, '')), '\s+') AS t,
         CASE WHEN LENGTH(TRIM(COALESCE(text, ''))) = 0 THEN 0
              ELSE len(string_split_regex(TRIM(COALESCE(text, '')), '\s+'))
         END AS n
  FROM documents),
ex AS (SELECT doc_id, t, n,
              UNNEST(range(0, GREATEST(CAST(ceil((n - 48) / 32.0) AS BIGINT) * 32,
                                       0) + 1, 32)) AS s
       FROM tk)
SELECT doc_id, (s / 32)::BIGINT AS chunk_no,
       array_to_string(t[s+1:s+48], ' ') AS chunk_text,
       (CASE WHEN n = 0 THEN 0 ELSE LEAST(48, n - s) END)::BIGINT AS n_tokens
FROM ex
"""


def curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation with the round-6 operator additions: exact
    dedup -> DSIR importance scoring -> global top-300 by importance ->
    temperature mixture quotas by language (α=0.5, total 150) ->
    per-group quota materialization -> 48-token sliding-window chunking.
    Every stage is an individually-oracled operator, so the whole
    composition is re-derived relationally and hash-checked
    (the curation_pipeline approach applied to the data-selection ops).
    Output: one row per chunk with its language, importance, and an md5
    of the chunk text (compact, still content-exact)."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.dedup import exact_dedup
    from ncbi_analysis_spark.operators.packing import chunk_documents
    from ncbi_analysis_spark.operators.scale import (
        apply_quotas,
        temperature_quotas,
    )
    from ncbi_analysis_spark.operators.terms import (
        dsir_logratios_pred,
        dsir_score,
    )
    from ncbi_analysis_spark.operators.topk import global_topk

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = exact_dedup(d, "text", "doc_id")
    w = dsir_logratios_pred(d, F.col("lang") == "en", "text", "doc_id",
                            **_DSIR_PARAMS)
    scored = dsir_score(s1, "text", "doc_id", w, **_DSIR_PARAMS)
    s1s = s1.join(scored.select("doc_id", "logw"), "doc_id")
    top = global_topk(s1s, [F.desc("logw"), F.asc("doc_id")], 300)
    quotas = temperature_quotas(top, ["lang"], total=150, alpha=0.5)
    samp = apply_quotas(top, quotas, ["lang"], "doc_id")
    chunks = chunk_documents(
        samp.select("doc_id", "text"), "text", "doc_id",
        max_tokens=48, stride=48,
    )
    return chunks.join(
        samp.select("doc_id", "lang", "logw"), "doc_id"
    ).select(
        "doc_id", "lang", "chunk_no",
        F.md5("chunk_text").alias("chunk_md5"), "n_tokens", "logw",
    )


def _curation_v2_sql() -> str:
    """Composed oracle: the dedup ROW_NUMBER CTE (curation_pipeline's),
    the DSIR scoring CTEs over the deduped set with the shared weight
    literals, ORDER BY/LIMIT for the top-300, the temperature
    apportionment CTEs at total=150, the md5-ordered per-group quota
    window, and the chunk explode — each the already-verified mirror of
    its operator.

    MAINTENANCE: these CTE blocks intentionally restate the standalone
    oracles (_dsir_sql, TEMPERATURE_SQL, DOC_CHUNKS_SQL) with different
    carried columns/params — a fix to any component mirror must be
    applied here too, or the composed oracle drifts while both still
    pass individually."""
    B = _DSIR_PARAMS["n_buckets"]
    rows = _dsir_weight_rows()
    return rf"""
WITH s1 AS (
  SELECT doc_id, text, lang FROM (
    SELECT doc_id, text, lang,
           ROW_NUMBER() OVER (
             PARTITION BY md5(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g'))
             ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1
),
tk AS (SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t FROM s1),
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
jw AS (SELECT doc_id, bucket, c, c * w AS term FROM per JOIN wt USING (bucket)),
scored AS (
  SELECT doc_id,
         ROUND(list_reduce(
           list_prepend(0.0::DOUBLE,
             list_transform(list_sort(list({{'b': bucket, 't': term}})),
                            s -> s.t)),
           (a, b) -> a + b), 6) AS logw
  FROM jw GROUP BY doc_id),
s1s AS (SELECT s1.doc_id, s1.text, s1.lang, scored.logw
        FROM s1 JOIN scored USING (doc_id)),
top AS (SELECT * FROM s1s ORDER BY logw DESC, doc_id LIMIT 300),
g AS (SELECT lang, COUNT(*)::BIGINT AS n_rows FROM top GROUP BY lang),
wv AS (SELECT lang, n_rows, sqrt(n_rows::DOUBLE) AS wv FROM g),
tot AS (SELECT list_reduce(
          list_prepend(0.0::DOUBLE,
            list_transform(list_sort(list({{'l': lang, 'w': wv}})), s -> s.w)),
          (a, b) -> a + b) AS tw FROM wv),
sh AS (SELECT lang, n_rows, wv / tw * 150.0 AS share FROM wv, tot),
fl AS (SELECT lang, n_rows, share,
              LEAST(FLOOR(share)::BIGINT, n_rows) AS fl FROM sh),
sp AS (SELECT list_reduce(
         list_prepend(0::BIGINT,
           list_transform(list_sort(list({{'l': lang, 'f': fl}})), s -> s.f)),
         (a, b) -> a + b) AS spent FROM fl),
qr AS (SELECT lang, n_rows, fl,
              ROW_NUMBER() OVER (
                ORDER BY CASE WHEN fl >= n_rows THEN -1.0
                              ELSE share - fl END DESC, lang) AS rk,
              150 - sp.spent AS leftn
       FROM fl, sp),
q AS (SELECT lang,
             LEAST(fl + CASE WHEN rk <= leftn AND fl < n_rows THEN 1 ELSE 0 END,
                   n_rows)::BIGINT AS quota
      FROM qr),
samp AS (
  SELECT doc_id, text, lang, logw FROM (
    SELECT top.*, q.quota,
           ROW_NUMBER() OVER (
             PARTITION BY top.lang
             ORDER BY md5('quota|' || doc_id::VARCHAR), doc_id) AS qrk
    FROM top JOIN q USING (lang)) WHERE qrk <= quota
),
ctk AS (
  SELECT doc_id, lang, logw,
         string_split_regex(TRIM(COALESCE(text, '')), '\s+') AS t,
         CASE WHEN LENGTH(TRIM(COALESCE(text, ''))) = 0 THEN 0
              ELSE len(string_split_regex(TRIM(COALESCE(text, '')), '\s+'))
         END AS n
  FROM samp),
cex AS (SELECT doc_id, lang, logw, t, n,
               UNNEST(range(0, GREATEST(n - 1, 0) + 1, 48)) AS s
        FROM ctk)
SELECT doc_id, lang, (s / 48)::BIGINT AS chunk_no,
       md5(array_to_string(t[s+1:s+48], ' ')) AS chunk_md5,
       (CASE WHEN n = 0 THEN 0 ELSE LEAST(48, n - s) END)::BIGINT AS n_tokens,
       logw
FROM cex
"""


def fuzzy_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination (operators/dedup.py::fuzzy_decon_pairs):
    corpus docs MinHash-LSH-colliding with held-out benchmark docs
    (doc_id % 7 split — wide enough that LSH collisions actually occur
    on the fixture at both gate scales), the near-dup complement
    of decon_ngram_overlap's exact n-gram check. num_perm=4/bands=2 are
    the oracle-parity sizes of dedup_minhash_signature."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.dedup import fuzzy_decon_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    bench = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return fuzzy_decon_pairs(
        corpus, bench, "text", "doc_id", bench_id_col="bench_id",
        num_perm=4, bands=2,
    )


def _fuzzy_decon_sql(corpus_pred: str = "TRUE") -> str:
    """``corpus_pred`` narrows the corpus (%7<>0) side — r13's LSH
    delete oracle compares the tombstoned index against a
    corpus-without-X recompute."""
    from ncbi_analysis_spark.plans.driver_queries import _SHINGLES_SQL

    band_rows = f"""
  SELECT doc_id, 0 AS band, md5(mh0 || ',' || mh1) AS bh FROM MM
  UNION ALL
  SELECT doc_id, 1 AS band, md5(mh2 || ',' || mh3) AS bh FROM MM"""
    mh = f"""
  SELECT doc_id,
        list_aggregate(list_transform(sh, x -> md5('0|' || x)), 'min') AS mh0,
        list_aggregate(list_transform(sh, x -> md5('1|' || x)), 'min') AS mh1,
        list_aggregate(list_transform(sh, x -> md5('2|' || x)), 'min') AS mh2,
        list_aggregate(list_transform(sh, x -> md5('3|' || x)), 'min') AS mh3
  FROM SHG"""
    return f"""
WITH csh AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents
             WHERE doc_id % 7 <> 0 AND ({corpus_pred})),
cm AS ({mh.replace('SHG', 'csh')}),
cb AS ({band_rows.replace('MM', 'cm')}),
bsh AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents
        WHERE doc_id % 7 = 0),
bm AS ({mh.replace('SHG', 'bsh')}),
bb AS (SELECT DISTINCT doc_id AS bench_id, band, bh
       FROM ({band_rows.replace('MM', 'bm')}))
SELECT DISTINCT c.doc_id, b.bench_id
FROM cb c JOIN bb b ON c.band = b.band AND c.bh = b.bh
"""


def queries_r7() -> dict:
    return {
        "boilerplate_scrub": boilerplate_scrub,
        "multimodal_media_stats": multimodal_media_stats,
        "semantic_dedup_prune": semantic_dedup_prune,
        "stream_static_enrich": stream_static_enrich,
        "dsir_importance": dsir_importance,
        "temperature_mixture": temperature_mixture,
        "doc_chunks": doc_chunks,
        "curation_v2": curation_v2,
        "fuzzy_decon": fuzzy_decon,
    }


def oracle_sql_r7() -> dict[str, str]:
    return {
        "boilerplate_scrub": BOILERPLATE_SQL,
        "multimodal_media_stats": MEDIA_STATS_SQL,
        "semantic_dedup_prune": _semantic_dedup_sql(),
        "stream_static_enrich": STREAM_ENRICH_SQL,
        "dsir_importance": _dsir_sql(),
        "temperature_mixture": TEMPERATURE_SQL,
        "doc_chunks": DOC_CHUNKS_SQL,
        "curation_v2": _curation_v2_sql(),
        "fuzzy_decon": _fuzzy_decon_sql(),
    }
