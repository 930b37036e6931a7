"""Round-5 driver queries: trained-IVF ANN search (the kmeans coarse
quantizer the round-4 verdict called the one missing piece of the ANN
story), plus enrichment-dimension fixture round-trips (S8/S9 moving from
pytest-only to driver-oracled).

Oracle strategy for the trained variants: kmeans/PQ training is not
SQL-expressible, but it IS deterministic — the trainers run on a stable
md5-ordered sample with seeded numpy kernels, so the ``*_local`` twins
(pyarrow, no Spark) re-derive bit-identical model floats at oracle-SQL
*generation* time and embed them as literals. Literals use the ``_dlit``
mantissa-x-2^e encoding because DuckDB's decimal parser is off by one
ulp for ~10% of shortest-repr doubles (measured on this build) — an
exact BIGINT cast times an exact power of two parses bit-exactly.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# The driver's oracle gate runs at sf0.01 (the contract); the local
# check_oracle harness exports the sf dir it was invoked with so trained
# literals always match the Spark side's training data.
def _oracle_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


_TRAIN_PARAMS = dict(k=8, sample_cap=2048, n_iter=8, seed=7)


def _dlit(x) -> str:
    """DOUBLE literal DuckDB parses bit-exactly. Its decimal parser is
    off by one ulp for ~10% of shortest-repr doubles (measured), so
    trained floats are emitted as mantissa x 2^e via frexp — an exact
    BIGINT->DOUBLE cast times an exact power of two."""
    import math

    x = float(x)
    if x == 0.0:
        return "0.0"
    if not math.isfinite(x):
        raise ValueError(f"non-finite literal: {x}")
    m, e = math.frexp(x)
    return f"({int(m * (1 << 53))}::DOUBLE * pow(2.0, {e - 53}))"


# ---------------------------------------------------------------------------
# Trained-IVF ANN search
# ---------------------------------------------------------------------------


def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 for the 48-query batch with a TRAINED coarse quantizer
    (operators.similarity_search.train_ivf_centroids: seeded spherical
    kmeans over a deterministic md5-ordered sample) instead of ann_ivf's
    first-8-vectors centroids. Same bucket-prune + exact re-rank search;
    this is the full offline-index-build -> search pipeline."""
    from ncbi_analysis_spark.operators import similarity_search

    e = _t(spark, sf_dir, "embeddings")
    cents = similarity_search.train_ivf_centroids(e, **_TRAIN_PARAMS)
    q = e.filter(F.col("vec_id") < 48).select(F.col("vec_id").alias("q_id"), "embedding")
    out = similarity_search.ivf_topk(e, q, cents, k=10, nprobe=2)
    return out.withColumn("rk", F.col("rk").cast("long"))


_DOT = (
    "list_reduce(list_transform(range(len({a})), i -> {a}[i+1]::DOUBLE * {b}[i+1]::DOUBLE),"
    " (x, y) -> x + y)"
)


def _cos_sql(a: str, b: str) -> str:
    d = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return (
        f"(CASE WHEN sqrt({na}) = 0 OR sqrt({nb}) = 0 THEN 0.0 "
        f"ELSE {d} / (sqrt({na}) * sqrt({nb})) END)"
    )


def _ann_ivf_trained_sql() -> str:
    """Generate the trained-IVF oracle: re-derive the exact centroids
    Spark-free and splice them in as literals (module docstring has the
    determinism argument)."""
    from ncbi_analysis_spark.operators.similarity_search import (
        train_ivf_centroids_local,
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
q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 48),
assign0 AS (
  -- dot(v, c) / ||c|| — same formula and fold order as ivf_assign's
  -- map-side argmax (the ||v|| division is skipped on both sides: a
  -- positive per-row constant can't change the argmax or tie-break)
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
SELECT q_id, vec_id, cos_sim, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id)::BIGINT AS rk
  FROM scored
) WHERE rk <= 10
"""


# ---------------------------------------------------------------------------
# S8/S9 enrichment-dimension fixture round-trips (F15 moving from
# pytest-only to driver-oracled; snapshot-ingestion model, SURVEY §2.1)
# ---------------------------------------------------------------------------

_FIXTURES = "/root/repo/tests/fixtures"


def s8_ecocyc_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: Ecocyc gene-search snapshot pages -> (gene, ecocyc_id) dim
    (sources.enrichment.ecocyc_id_dim; reference EcocycHTMLParser id
    paths). The committed fixture covers all three extraction paths —
    redirect script, typeObjectPage script, anchor link (incl. an inner
    formatting tag and a non-matching sibling anchor) — plus a no-match
    page yielding a NULL id. The oracle re-derives each path with DuckDB
    regexes over the same JSONL snapshots."""
    from ncbi_analysis_spark.sources.enrichment import ecocyc_id_dim

    pages = spark.read.json(f"{_FIXTURES}/driver_s8_ecocyc.jsonl")
    return ecocyc_id_dim(pages.select("key", "page"))


S8_SQL = rf"""
WITH p AS (SELECT key AS gene, page
           FROM read_ndjson_auto('{_FIXTURES}/driver_s8_ecocyc.jsonl')),
ex AS (
  SELECT gene, page,
    regexp_extract(page, 'window\.location\.replace\(''/gene\?([^'']*)''\)', 1) AS redir,
    (page LIKE '%typeObjectPage%') AS has_type,
    regexp_extract(page, 'gene:''([^'']+)''', 1) AS g_script,
    regexp_extract(page,
      '<a href="/gene\?orgid=ECOLI&id=([^"&'']*)"[^>]*>(?:<i>)?' || gene || '(?:</i>)?</a>',
      1) AS link_id
  FROM p
)
SELECT gene,
  COALESCE(
    NULLIF(regexp_extract(redir, '(?:^|[&?''"])id=([^&?''"]*)', 1), ''),
    CASE WHEN has_type THEN NULLIF(g_script, '') END,
    NULLIF(link_id, '')
  ) AS ecocyc_id
FROM ex
"""


def s9_kegg_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: KEGG bfind snapshot pages -> (gene, ko_id, ko_href) dim, one
    row per KO anchor in the 'KEGG ORTHOLOGY' section only
    (sources.enrichment.kegg_ko_dim; reference KeggIdHTMLParser). Fixture
    covers the KEGG GENES and KEGG MGENES terminators (whose anchors must
    be ignored) and a page with no orthology section (zero rows)."""
    from ncbi_analysis_spark.sources.enrichment import kegg_ko_dim

    pages = spark.read.json(f"{_FIXTURES}/driver_s9_kegg.jsonl")
    return kegg_ko_dim(pages.select("key", "page"))


S9_SQL = rf"""
WITH p AS (SELECT key AS gene, page
           FROM read_ndjson_auto('{_FIXTURES}/driver_s9_kegg.jsonl')),
sect AS (
  SELECT gene,
         CASE WHEN strpos(page, 'KEGG ORTHOLOGY') = 0 THEN ''
              ELSE substr(page, strpos(page, 'KEGG ORTHOLOGY')) END AS s0
  FROM p
),
sect2 AS (
  SELECT gene,
         CASE WHEN strpos(s0, 'KEGG GENES') > 0
                THEN substr(s0, 1, strpos(s0, 'KEGG GENES') - 1)
              WHEN strpos(s0, 'KEGG MGENES') > 0
                THEN substr(s0, 1, strpos(s0, 'KEGG MGENES') - 1)
              ELSE s0 END AS sec
  FROM sect
),
m AS (
  SELECT gene,
         regexp_extract_all(sec, '<a href="([^"]*)">(K[^<]*)</a>', 1) AS hrefs,
         regexp_extract_all(sec, '<a href="([^"]*)">(K[^<]*)</a>', 2) AS kos
  FROM sect2
)
SELECT gene, kos[i] AS ko_id, hrefs[i] AS ko_href
FROM m, LATERAL (SELECT UNNEST(generate_series(1, len(kos))) AS i) t
"""


# ---------------------------------------------------------------------------
# PQ (product quantization) ANN with exact re-rank
# ---------------------------------------------------------------------------

_PQ_PARAMS = dict(m=4, codewords=16, sample_cap=2048, n_iter=6, seed=5)


def ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ-style compressed-domain search: trained subspace codebooks
    (train_pq_codebooks), corpus encoded to 4 codes/row (pq_encode), ADC
    lookup-table scan for top-32 candidates, exact cosine re-rank to
    top-10 (pq_topk). Every float in the candidate path is a sequential
    fold, so the DuckDB oracle (codebook literals + list_reduce folds)
    reproduces the candidate set bit-exactly."""
    from ncbi_analysis_spark.operators import similarity_search as ss

    e = _t(spark, sf_dir, "embeddings")
    B = ss.train_pq_codebooks(e, **_PQ_PARAMS)
    codes = ss.pq_encode(e, B)
    q = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("q_id"), "embedding")
    out = ss.pq_topk(codes, q, B, corpus=e, k=10, rerank=32)
    return out.withColumn("rk", F.col("rk").cast("long"))


def _ann_pq_sql() -> str:
    """Generate the PQ oracle: re-derive the exact codebooks Spark-free,
    embed them (and their sequentially-accumulated squared norms) as
    literals, and mirror every fold the kernels perform — normalization,
    per-subspace argmin encode, LUT build, ADC sum — with list_reduce."""
    import numpy as np

    from ncbi_analysis_spark.operators.similarity_search import (
        train_pq_codebooks_local,
    )

    B = train_pq_codebooks_local(
        f"{_oracle_sf_dir()}/embeddings.parquet", **_PQ_PARAMS
    )
    m, ncode, sub = B.shape
    cn2 = np.zeros((m, ncode))
    for i in range(m):
        for t in range(sub):
            cn2[i] += B[i][:, t] * B[i][:, t]

    cb_lit = "[" + ", ".join(
        "[" + ", ".join(
            "[" + ", ".join(_dlit(x) for x in B[i][j]) + "]"
            for j in range(ncode)
        ) + "]"
        for i in range(m)
    ) + "]::DOUBLE[][][]"
    cn2_lit = "[" + ", ".join(
        "[" + ", ".join(_dlit(x) for x in cn2[i]) + "]" for i in range(m)
    ) + "]::DOUBLE[][]"

    def seqdot(xcol: str, i: int) -> str:
        # dot of subspace i of the normalized vector with codeword j
        # (j is the 0-based loop var of the enclosing list_transform)
        return (
            f"list_reduce(list_transform(range({sub}), "
            f"t -> {xcol}[{i * sub} + t + 1] * cb[{i + 1}][j + 1][t + 1]), "
            "(a, b) -> a + b)"
        )

    code_cols = ",\n         ".join(
        f"list_position(d2_{i}, list_aggregate(d2_{i}, 'min')) AS c{i}"
        for i in range(m)
    )
    d2_cols = ",\n         ".join(
        f"list_transform(range({ncode}), "
        f"j -> cn2[{i + 1}][j + 1] - 2 * {seqdot('xn', i)}) AS d2_{i}"
        for i in range(m)
    )
    lut_cols = ",\n         ".join(
        f"list_transform(range({ncode}), j -> {seqdot('qn', i)}) AS lut{i}"
        for i in range(m)
    )
    adc = " + ".join(f"q.lut{i}[c.c{i}]" for i in range(m))

    norm_expr = (
        "sqrt(list_reduce(list_transform({v}, x -> x::DOUBLE * x::DOUBLE),"
        " (a, b) -> a + b))"
    )

    return f"""
WITH cblit AS (SELECT {cb_lit} AS cb, {cn2_lit} AS cn2),
c0 AS (SELECT vec_id, embedding AS v,
              {norm_expr.format(v='embedding')} AS nv
       FROM embeddings),
cx AS (SELECT vec_id, v,
              CASE WHEN nv = 0 THEN list_transform(v, x -> x::DOUBLE)
                   ELSE list_transform(v, x -> x::DOUBLE / nv) END AS xn
       FROM c0),
cd2 AS (SELECT vec_id, v, xn,
         {d2_cols}
        FROM cx CROSS JOIN cblit),
codes AS (SELECT vec_id, v,
         {code_cols}
          FROM cd2),
q0 AS (SELECT vec_id AS q_id, embedding AS qv,
              {norm_expr.format(v='embedding')} AS nq
       FROM embeddings WHERE vec_id < 8),
qx AS (SELECT q_id, qv,
              CASE WHEN nq = 0 THEN list_transform(qv, x -> x::DOUBLE)
                   ELSE list_transform(qv, x -> x::DOUBLE / nq) END AS qn
       FROM q0),
qlut AS (SELECT q_id, qv,
         {lut_cols}
         FROM qx CROSS JOIN cblit),
scored AS (
  SELECT q.q_id, c.vec_id, q.qv, c.v, {adc} AS pq_score
  FROM codes c CROSS JOIN qlut q
),
cands AS (SELECT q_id, vec_id, qv, v FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY pq_score DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= 32),
rer AS (
  SELECT q_id, vec_id, ROUND({_cos_sql('qv', 'v')}, 6) AS cos_sim FROM cands
)
SELECT q_id, vec_id, cos_sim, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id)::BIGINT AS rk
  FROM rer
) WHERE rk <= 10
"""


def s_go_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GO-category dim from gene GO-table snapshot pages
    (sources.enrichment.go_terms_dim; reference GoHTMLParser): one row
    per (gene, category) with the linked terms comma-joined — including
    a category with no linked terms (empty string). The oracle slices
    the page on the outer label-cell anchor and regex-extracts each
    block's term anchors."""
    from ncbi_analysis_spark.sources.enrichment import go_terms_dim

    pages = spark.read.json(f"{_FIXTURES}/driver_s_go.jsonl")
    return go_terms_dim(pages.select("key", "page"))


S_GO_SQL = rf"""
WITH p AS (SELECT key AS gene, page FROM read_ndjson_auto('{_FIXTURES}/driver_s_go.jsonl')),
blocks AS (
  SELECT gene, b.blk, b.i
  FROM p, LATERAL (
    SELECT UNNEST(string_split(page, '<tr><td class="golabel">')) AS blk,
           generate_subscripts(string_split(page, '<tr><td class="golabel">'), 1) AS i
  ) b
  WHERE b.i > 1
)
SELECT gene,
       rtrim(trim(substr(blk, 1, strpos(blk, '</td>') - 1)), ':') AS go_category,
       COALESCE(array_to_string(regexp_extract_all(blk, '<a href="#">([^<]*)</a>', 1), ','), '') AS go_terms
FROM blocks
"""


def s7_nuccore_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: NCBI nuccore viewer snapshot pages -> (accession, uid) dim
    (sources.enrichment.nuccore_uid_dim; reference
    data_download_util.read_uid — line-7 meta-tag parse). Fixture covers
    a uid-bearing page, a page whose line 7 lacks the uid tag (null),
    and a short redirect page (null)."""
    from ncbi_analysis_spark.sources.enrichment import nuccore_uid_dim

    pages = spark.read.json(f"{_FIXTURES}/driver_s7_nuccore.jsonl")
    return nuccore_uid_dim(pages.select("key", "page"))


S7_SQL = rf"""
WITH p AS (SELECT key AS accession, page
           FROM read_ndjson_auto('{_FIXTURES}/driver_s7_nuccore.jsonl')),
ls AS (SELECT accession, string_split(page, chr(10)) AS lns FROM p),
ln AS (SELECT accession,
              CASE WHEN len(lns) >= 7 THEN trim(lns[7]) END AS line7
       FROM ls),
f0 AS (SELECT accession, string_split(line7, '/>') AS fr
       FROM ln WHERE line7 IS NOT NULL),
fr AS (SELECT accession, trim(UNNEST(fr[1:len(fr)-1])) AS frag FROM f0),
tok AS (SELECT accession, string_split(frag, ' ') AS ts FROM fr),
kv AS (SELECT accession,
              trim(string_split(ts[2], '=')[2], '"') AS name,
              trim(string_split(ts[3], '=')[2], '"') AS content
       FROM tok WHERE len(ts) = 3),
uid AS (SELECT accession, MAX(content) AS uid FROM kv
        WHERE name = 'ncbi_uidlist' GROUP BY accession)
SELECT p.accession, uid.uid FROM p LEFT JOIN uid USING (accession)
"""


def s10_pubmed_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: PubMed search snapshot pages -> (gene, keyword, count_raw,
    n_results) literature-count dim (sources.enrichment.pubmed_count_dim;
    reference run_search_count.py extract_result_info). Fixture covers
    the span-wrapped count, the no-results page ('0'), a messy value line
    (raw preserved, numeric parse null), and the marker-less
    single-result redirect ('1')."""
    from ncbi_analysis_spark.sources.enrichment import pubmed_count_dim

    pages = spark.read.json(f"{_FIXTURES}/driver_s10_pubmed.jsonl")
    return pubmed_count_dim(pages.select("key", "page"))


S10_SQL = rf"""
WITH p AS (SELECT key, page FROM read_ndjson_auto('{_FIXTURES}/driver_s10_pubmed.jsonl')),
l AS (SELECT key, unnest(string_split(page, chr(10))) AS line,
             generate_subscripts(string_split(page, chr(10)), 1) AS ln
      FROM p),
mk AS (SELECT key, MIN(ln) AS mln FROM l
       WHERE trim(line) = '<div class="results-amount">' GROUP BY key),
vl AS (SELECT l.key, MIN(l.ln) AS vln
       FROM l JOIN mk ON l.key = mk.key AND l.ln > mk.mln
       WHERE trim(l.line) != '' GROUP BY l.key),
v AS (SELECT l.key, trim(l.line) AS value
      FROM l JOIN vl ON l.key = vl.key AND l.ln = vl.vln),
raw AS (SELECT p.key,
          COALESCE(
            CASE WHEN v.value LIKE '%No results were found%' THEN '0'
                 ELSE replace(replace(v.value, '<span class="value">', ''),
                              '</span>', '') END,
            '1') AS count_raw
        FROM p LEFT JOIN v ON p.key = v.key)
SELECT CASE WHEN strpos(key, '|') > 0 THEN substr(key, 1, strpos(key, '|') - 1)
            ELSE key END AS gene,
       CASE WHEN strpos(key, '|') > 0 THEN substr(key, strpos(key, '|') + 1)
            ELSE '' END AS keyword,
       count_raw,
       CASE WHEN regexp_full_match(replace(count_raw, ',', ''), '[0-9]+')
            THEN replace(count_raw, ',', '')::BIGINT END AS n_results
FROM raw
"""


# ---------------------------------------------------------------------------
# Corpus profiling: per-language token-length distribution
# ---------------------------------------------------------------------------


def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile: doc counts, total tokens, and
    DISCRETE token-count percentiles (p50/p90/p99 as the value at row
    ceil(p*n) of the sorted distribution — integer-only index math, so
    the oracle is bit-exact with no interpolation-float risk). The
    dataset-card summary a corpus mixer reads before setting quotas."""
    from pyspark.sql import Window

    from ncbi_analysis_spark.functions import text as textf

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        textf.token_count(F.col("text")).cast("long").alias("tc"),
    )
    w = Window.partitionBy("lang").orderBy("tc", "doc_id")
    n_w = Window.partitionBy("lang")
    r = (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(n_w))
    )

    def disc(p: int):
        # ceil(n * p/100) with pure integer arithmetic
        idx = F.expr(f"(n * {p} + 99) div 100")
        return F.max(F.when(F.col("rn") == idx, F.col("tc"))).cast("long")

    return r.groupBy("lang").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.sum("tc").cast("long").alias("total_tokens"),
        disc(50).alias("p50_tc"),
        disc(90).alias("p90_tc"),
        disc(99).alias("p99_tc"),
        F.max("tc").cast("long").alias("max_tc"),
    )


_TOKC = (
    "(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 "
    "ELSE len(string_split_regex(TRIM(text), '\\s+')) END)"
)

CORPUS_PROFILE_SQL = rf"""
WITH t AS (SELECT doc_id, lang, {_TOKC}::BIGINT AS tc FROM documents),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tc, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM t)
SELECT lang,
       MAX(n)::BIGINT AS n_docs,
       SUM(tc)::BIGINT AS total_tokens,
       MAX(CASE WHEN rn = (n * 50 + 99) // 100 THEN tc END)::BIGINT AS p50_tc,
       MAX(CASE WHEN rn = (n * 90 + 99) // 100 THEN tc END)::BIGINT AS p90_tc,
       MAX(CASE WHEN rn = (n * 99 + 99) // 100 THEN tc END)::BIGINT AS p99_tc,
       MAX(tc)::BIGINT AS max_tc
FROM r GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Streaming through the oracle gate (bounded availableNow run)
# ---------------------------------------------------------------------------

_stream_q_seq = 0

_staging_seq: dict[str, int] = {}


def _staging_dir(base: str) -> str:
    """Bounded per-process staging-dir rotation: returns a fresh
    ``{tmp}/{base}_{pid}_{seq}`` and reclaims the seq-2 slot. Keeps at
    most two dirs per (base, process) — no unbounded /tmp growth across
    repeated bench/gate runs (r5 advice) — while a lazy DataFrame still
    holding the PREVIOUS call's directory keeps reading valid files
    (the in-process rebuild hazard a single shared dir had)."""
    import shutil
    import tempfile

    seq = _staging_seq.get(base, 0) + 1
    _staging_seq[base] = seq
    root = tempfile.gettempdir()
    shutil.rmtree(os.path.join(root, f"{base}_{os.getpid()}_{seq - 2}"),
                  ignore_errors=True)
    return os.path.join(root, f"{base}_{os.getpid()}_{seq}")


def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Structured Streaming engine, driver-oracle-checked: the
    events parquet replayed as a file stream through watermarked
    tumbling-window aggregation (streaming.events.windowed_event_counts)
    with an availableNow trigger — a bounded run whose emitted set is
    deterministic (append mode emits exactly the windows the final
    watermark closes). The oracle recomputes those closed windows
    relationally: watermark = max event time (ms floor) - delay, window
    closed iff window_end <= watermark."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.streaming.events import (
        read_event_stream,
        windowed_event_counts,
    )

    global _stream_q_seq
    _stream_q_seq += 1
    name = f"drv_stream_wc_{_stream_q_seq}"

    d = tempfile.mkdtemp(prefix="stream_wc_")
    try:
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        stream = read_event_stream(spark, d)
        out = windowed_event_counts(stream, window="1 hour", watermark="1 minute")
        q = (
            out.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        if not q.awaitTermination(300):
            # bounded run overran the timeout: stop the query BEFORE
            # the staged source dir is removed underneath it
            q.stop()
    finally:
        # bench times each query 5+ times; without cleanup the
        # staged events copies accumulate under /tmp (r5 advice)
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name).select(
        F.unix_micros("window_start").alias("ws_us"),
        "event_type", "cnt", "sum_value",
    )


def stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup through the oracle gate: the events parquet
    staged TWICE in the stream directory (a replayed/duplicated feed —
    the at-least-once delivery case), watermarked dropDuplicates
    emitting each event exactly once. Oracle: the distinct event set."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.streaming.events import (
        read_event_stream,
        streaming_dedup,
    )

    global _stream_q_seq
    _stream_q_seq += 1
    name = f"drv_stream_dd_{_stream_q_seq}"

    d = tempfile.mkdtemp(prefix="stream_dd_")
    try:
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events_a.parquet")
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events_b.parquet")
        stream = read_event_stream(spark, d)
        dd = streaming_dedup(stream, ["event_id"])
        q = (
            dd.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        if not q.awaitTermination(300):
            # bounded run overran the timeout: stop the query BEFORE
            # the staged source dir is removed underneath it
            q.stop()
    finally:
        # bench times each query 5+ times; without cleanup the
        # staged events copies accumulate under /tmp (r5 advice)
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name).select(
        "event_id", F.unix_micros("ts").alias("ts_us"),
        "user_id", "event_type", "value",
    )


STREAM_DD_SQL = """
SELECT DISTINCT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
FROM events
"""


def stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful streaming operator (applyInPandasWithState
    sessionizer) through the oracle gate: a bounded availableNow run
    emits (a) every session closed by a later event of the same user and
    (b) final sessions whose gap timeout the final watermark passes —
    both relationally derivable, so the emitted set is deterministic and
    the oracle recomputes it with the gaps-and-islands form plus the
    timeout filter."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.streaming.events import (
        read_event_stream,
        sessionize,
    )

    global _stream_q_seq
    _stream_q_seq += 1
    name = f"drv_stream_sess_{_stream_q_seq}"

    d = tempfile.mkdtemp(prefix="stream_sess_")
    try:
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        stream = read_event_stream(spark, d)
        sess = sessionize(stream, gap="10 minutes", watermark="1 minute")
        q = (
            sess.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        if not q.awaitTermination(300):
            # bounded run overran the timeout: stop the query BEFORE
            # the staged source dir is removed underneath it
            q.stop()
    finally:
        # bench times each query 5+ times; without cleanup the
        # staged events copies accumulate under /tmp (r5 advice)
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name).select(
        "user_id",
        F.unix_micros("session_start").alias("s_us"),
        F.unix_micros("session_end").alias("e_us"),
        "n_events",
    )


STREAM_SESS_SQL = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
mx AS (SELECT MAX(tsu) // 1000 - 60000 AS wm_ms FROM e),
f AS (
  SELECT user_id, tsu,
         CASE WHEN LAG(tsu) OVER w IS NULL
                OR tsu - LAG(tsu) OVER w > 600000000 THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
),
s AS (
  SELECT user_id, tsu,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY tsu
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS session_no
  FROM f
),
agg AS (
  SELECT user_id, session_no, MIN(tsu)::BIGINT AS s_us,
         MAX(tsu)::BIGINT AS e_us, COUNT(*)::BIGINT AS n_events
  FROM s GROUP BY user_id, session_no
),
marked AS (
  SELECT a.*, MAX(session_no) OVER (PARTITION BY user_id) AS max_no
  FROM agg a
)
SELECT user_id, s_us, e_us, n_events
FROM marked CROSS JOIN mx
WHERE session_no < max_no OR (e_us // 1000 + 600000) < wm_ms
"""


def stream_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join through the gate: each
    purchase joined to the same user's clicks within 30 minutes before
    it. An inner range join over an availableNow replay emits every
    qualifying pair (the watermark bounds state, not inner-join
    emission), so the oracle is the plain relational join."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.streaming.events import (
        read_event_stream,
        stream_stream_join,
    )

    global _stream_q_seq
    _stream_q_seq += 1
    name = f"drv_stream_ssj_{_stream_q_seq}"

    d = tempfile.mkdtemp(prefix="stream_ssj_")
    try:
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        clicks = read_event_stream(spark, d).filter(F.col("event_type") == "click")
        purchases = read_event_stream(spark, d).filter(F.col("event_type") == "purchase")
        joined = stream_stream_join(clicks, purchases, within="30 minutes")
        q = (
            joined.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        if not q.awaitTermination(300):
            # bounded run overran the timeout: stop the query BEFORE
            # the staged source dir is removed underneath it
            q.stop()
    finally:
        # bench times each query 5+ times; without cleanup the
        # staged events copies accumulate under /tmp (r5 advice)
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name).select(
        "user_id", "purchase_id",
        F.unix_micros("purchase_ts").alias("p_us"),
        "click_id",
        F.unix_micros("click_ts").alias("c_us"),
    )


STREAM_SSJ_SQL = """
WITH c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
           FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase')
SELECT p.user_id, purchase_id, p_us, click_id, c_us
FROM p JOIN c ON p.user_id = c.user_id
             AND c_us <= p_us AND c_us >= p_us - 1800000000
"""


def stream_local_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming W2 local-max suppression through the gate: the bounded
    run decides exactly the events whose ±distance window the final
    watermark closes; emitted = batch survivors among the decided set."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.streaming.events import (
        read_event_stream,
        suppress_local_max_stream,
    )

    global _stream_q_seq
    _stream_q_seq += 1
    name = f"drv_stream_lm_{_stream_q_seq}"

    d = tempfile.mkdtemp(prefix="stream_lm_")
    try:
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        stream = read_event_stream(spark, d)
        out = suppress_local_max_stream(stream, distance="5 minutes",
                                        watermark="1 minute")
        q = (
            out.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        if not q.awaitTermination(300):
            # bounded run overran the timeout: stop the query BEFORE
            # the staged source dir is removed underneath it
            q.stop()
    finally:
        # bench times each query 5+ times; without cleanup the
        # staged events copies accumulate under /tmp (r5 advice)
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name).select(
        "event_type", "event_id", F.unix_micros("ts").alias("ts_us"), "value",
    )


STREAM_LM_SQL = """
WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us, value
           FROM events WHERE value > 0),
mx AS (SELECT (MAX(ts_us) // 1000 - 60000) * 1000 AS wm_us FROM e),
m AS (
  SELECT *, MAX(value) OVER (PARTITION BY event_type ORDER BY ts_us
             RANGE BETWEEN 300000000 PRECEDING AND 300000000 FOLLOWING) AS lm
  FROM e
)
SELECT event_type, event_id, ts_us, value
FROM m CROSS JOIN mx
WHERE value >= lm AND ts_us + 300000000 < wm_us
"""


def stream_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming W1 per-window top-k through the gate: emitted = the
    top-3 per (event_type, 30-minute window) for every window the final
    watermark closes."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.streaming.events import (
        read_event_stream,
        windowed_topk_stream,
    )

    global _stream_q_seq
    _stream_q_seq += 1
    name = f"drv_stream_tk_{_stream_q_seq}"

    d = tempfile.mkdtemp(prefix="stream_tk_")
    try:
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        stream = read_event_stream(spark, d)
        out = windowed_topk_stream(stream, window="30 minutes", k=3,
                                   watermark="1 minute")
        q = (
            out.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        if not q.awaitTermination(300):
            # bounded run overran the timeout: stop the query BEFORE
            # the staged source dir is removed underneath it
            q.stop()
    finally:
        # bench times each query 5+ times; without cleanup the
        # staged events copies accumulate under /tmp (r5 advice)
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name).select(
        "event_type", F.unix_micros("window_start").alias("ws_us"),
        "event_id", "value", "rk",
    )


STREAM_TK_SQL = """
WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us, value FROM events),
mx AS (SELECT (MAX(ts_us) // 1000 - 60000) * 1000 AS wm_us FROM e),
w AS (SELECT event_type, event_id, value,
             ts_us // 1800000000 * 1800000000 AS ws_us
      FROM e),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, ws_us
                ORDER BY value DESC, event_id)::BIGINT AS rk
      FROM w)
SELECT event_type, ws_us, event_id, value, rk
FROM r CROSS JOIN mx
WHERE rk <= 3 AND ws_us + 1800000000 <= wm_us
"""


STREAM_WC_SQL = """
WITH mx AS (SELECT MAX(epoch_us(ts)) AS mt FROM events),
wm AS (SELECT (mt // 1000 - 60000) * 1000 AS wm_us FROM mx),
w AS (SELECT epoch_us(ts) // 3600000000 * 3600000000 AS ws_us, event_type, value
      FROM events)
SELECT ws_us, event_type,
       COUNT(*)::BIGINT AS cnt,
       SUM(value::DECIMAL(18,2))::DOUBLE AS sum_value
FROM w CROSS JOIN wm
WHERE ws_us + 3600000000 <= wm_us
GROUP BY ws_us, event_type
"""


_PROJ_PARAMS = dict(d_out=16, seed=11)


def embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection of the embeddings table to 16 dims
    (operators.similarity_search.project_embeddings, numpy path),
    exploded to (vec_id, j, val) scalars. The oracle embeds the seeded
    projection matrix as literals and mirrors the input-dim-order fold,
    so every projected coordinate matches bit-for-bit."""
    from ncbi_analysis_spark.operators import similarity_search as ss

    e = _t(spark, sf_dir, "embeddings")
    proj = ss.project_embeddings(e, **_PROJ_PARAMS)
    return proj.select(
        "vec_id", F.posexplode("proj").alias("j", "val")
    ).withColumn("j", F.col("j").cast("long"))


def _embedding_project_sql() -> str:
    import pyarrow.parquet as pq

    from ncbi_analysis_spark.operators.similarity_search import (
        random_projection_matrix,
    )

    t = pq.read_table(f"{_oracle_sf_dir()}/embeddings.parquet",
                      columns=["embedding"])
    d_in = len(t["embedding"][0])
    R = random_projection_matrix(d_in, _PROJ_PARAMS["d_out"], _PROJ_PARAMS["seed"])
    r_lit = "[" + ", ".join(
        "[" + ", ".join(_dlit(x) for x in R[t_]) + "]" for t_ in range(d_in)
    ) + "]::DOUBLE[][]"
    d_out = _PROJ_PARAMS["d_out"]
    return f"""
WITH rlit AS (SELECT {r_lit} AS R)
SELECT vec_id, j::BIGINT AS j,
       list_reduce(list_transform(range({d_in}),
                   t -> embedding[t + 1]::DOUBLE * R[t + 1][j + 1]),
                   (a, b) -> a + b) AS val
FROM embeddings CROSS JOIN rlit,
     LATERAL (SELECT UNNEST(range({d_out})) AS j) idx
"""


def token_rarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-rarity quality signals over documents
    (operators.terms.token_rarity): per-doc distinct-token count, summed
    corpus df, mean df, and hapax fraction — integer-exact arithmetic
    end to end."""
    from ncbi_analysis_spark.operators.terms import token_rarity

    return token_rarity(_t(spark, sf_dir, "documents"))


TOKEN_RARITY_SQL = r"""
WITH toks AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS tok
    FROM documents
  ) WHERE tok != ''
),
dfreq AS (SELECT tok, COUNT(*)::BIGINT AS tdf FROM toks GROUP BY tok)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_tok,
       SUM(tdf)::BIGINT AS sum_df,
       SUM(tdf)::BIGINT / COUNT(*)::BIGINT AS mean_df,
       SUM(CASE WHEN tdf = 1 THEN 1 ELSE 0 END)::BIGINT / COUNT(*)::BIGINT AS hapax_frac
FROM toks JOIN dfreq USING (tok)
GROUP BY doc_id
"""


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixer stratified sampling: keep 100% of src0, 40% of src1,
    10% of src2, 2% of everything else — per-group md5-bucket rates
    (operators.scale.stratified_sample), deterministic and retry-stable.
    Returns the surviving (doc_id, source) rows."""
    from ncbi_analysis_spark.operators.scale import stratified_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_sample(
        d, "source", {"src0": 1.0, "src1": 0.4, "src2": 0.1},
        "doc_id", default_rate=0.02,
    )


MIXTURE_SQL = """
WITH b AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('mix' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000000 AS bk
  FROM documents
)
SELECT doc_id, source FROM b
WHERE bk < CASE source WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 400000
                       WHEN 'src2' THEN 100000 ELSE 20000 END
"""


def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic: the top-10 heaviest join keys of
    lineitem.l_suppkey with their share of total rows — the profile that
    decides whether a key needs salting (operators.scale.salted_join) or
    AQE skew splitting before a big join. One count aggregation + a
    global top-k; the total is a driver scalar, not a single-partition
    window."""
    from ncbi_analysis_spark.operators.topk import topk_per_group

    li = _t(spark, sf_dir, "lineitem")
    total = li.count()
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    top = topk_per_group(
        counts.withColumn("__g", F.lit(1)), ["__g"],
        [F.desc("cnt"), F.asc("l_suppkey")], 10, rank_col="rk",
    ).drop("__g")
    return top.select(
        "l_suppkey", "cnt",
        (F.col("cnt") / F.lit(total)).alias("share"),
        F.col("rk").cast("long").alias("rk"),
    )


SKEW_PROFILE_SQL = """
WITH c AS (SELECT l_suppkey, COUNT(*)::BIGINT AS cnt FROM lineitem GROUP BY 1),
t AS (SELECT COUNT(*)::BIGINT AS total FROM lineitem),
r AS (SELECT l_suppkey, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, l_suppkey)::BIGINT AS rk
      FROM c)
SELECT l_suppkey, cnt, cnt / t.total AS share, rk
FROM r CROSS JOIN t WHERE rk <= 10
"""


def corpus_shard_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard sink round-trip: documents + deterministic split
    -> parquet partitioned by split with bounded records/file
    (sinks.write_training_shards) -> read back through the partitioned
    layout -> per-split totals. The oracle recomputes the same totals
    from the source table with the split rule inlined, so a lossy write,
    a dropped partition directory, or a split drift all hash-mismatch."""
    from ncbi_analysis_spark.operators.scale import hash_split
    from ncbi_analysis_spark.sources.sinks import write_training_shards

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    # the returned DataFrame reads this directory lazily, so it can't be
    # deleted here — staging dirs rotate through a bounded two-slot
    # window per process (_staging_dir): repeated bench/gate runs don't
    # accumulate copies under /tmp (r5 advice), concurrent processes
    # can't clobber each other (pid suffix), and a DataFrame held from
    # the PREVIOUS call in this process still reads its own slot — only
    # the call before that is reclaimed.
    out = _staging_dir("spark_graft_shard_roundtrip")
    write_training_shards(hash_split(d, "doc_id"), out, ["split"],
                          max_records_per_file=50)
    back = spark.read.parquet(out)
    return back.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )


SHARD_ROUNDTRIP_SQL = """
WITH b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000000 AS sb
  FROM documents
)
SELECT CASE WHEN sb < 980000 THEN 'train' WHEN sb < 990000 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*)::BIGINT AS n_docs,
       SUM(doc_id)::BIGINT AS sum_doc_id,
       COUNT(DISTINCT lang)::BIGINT AS n_langs
FROM b GROUP BY 1
"""


# ---------------------------------------------------------------------------
# IVF-PQ composed ANN (trained quantizers end to end)
# ---------------------------------------------------------------------------


def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full FAISS-shape ANN pipeline, every stage trained and
    oracle-exact: kmeans coarse quantizer (ann_ivf_trained's params) for
    the bucket prune, PQ codebooks (ann_pq_rerank's params) for the
    in-bucket ADC scan, exact cosine re-rank to top-10
    (operators.similarity_search.ivf_pq_topk)."""
    from ncbi_analysis_spark.operators import similarity_search as ss

    e = _t(spark, sf_dir, "embeddings")
    cents = ss.train_ivf_centroids(e, **_TRAIN_PARAMS)
    B = ss.train_pq_codebooks(e, **_PQ_PARAMS)
    q = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("q_id"), "embedding")
    out = ss.ivf_pq_topk(e, q, cents, B, k=10, nprobe=2, rerank=32)
    return out.withColumn("rk", F.col("rk").cast("long"))


def _ann_ivf_pq_sql() -> str:
    """Compose the IVF (centroid literals + argmax assign + probes) and
    PQ (codebook literals + encode + LUT + ADC) oracle machinery into
    one SQL: candidates = ADC ranking inside probed buckets, final =
    exact cosine re-rank. Every float path mirrors the kernels'
    sequential folds."""
    import numpy as np

    from ncbi_analysis_spark.operators.similarity_search import (
        train_ivf_centroids_local,
        train_pq_codebooks_local,
    )

    path = f"{_oracle_sf_dir()}/embeddings.parquet"
    C = train_ivf_centroids_local(path, **_TRAIN_PARAMS)
    B = train_pq_codebooks_local(path, **_PQ_PARAMS)
    m, ncode, sub = B.shape
    cn2 = np.zeros((m, ncode))
    for i in range(m):
        for t in range(sub):
            cn2[i] += B[i][:, t] * B[i][:, t]

    cent_rows = ",\n  ".join(
        f"({i}, [{', '.join(_dlit(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(C)
    )
    cb_lit = "[" + ", ".join(
        "[" + ", ".join(
            "[" + ", ".join(_dlit(x) for x in B[i][j]) + "]"
            for j in range(ncode)
        ) + "]"
        for i in range(m)
    ) + "]::DOUBLE[][][]"
    cn2_lit = "[" + ", ".join(
        "[" + ", ".join(_dlit(x) for x in cn2[i]) + "]" for i in range(m)
    ) + "]::DOUBLE[][]"

    def seqdot(xcol: str, i: int) -> str:
        return (
            f"list_reduce(list_transform(range({sub}), "
            f"t -> {xcol}[{i * sub} + t + 1] * cb[{i + 1}][j + 1][t + 1]), "
            "(a, b) -> a + b)"
        )

    d2_cols = ",\n         ".join(
        f"list_transform(range({ncode}), "
        f"j -> cn2[{i + 1}][j + 1] - 2 * {seqdot('xn', i)}) AS d2_{i}"
        for i in range(m)
    )
    code_cols = ",\n         ".join(
        f"list_position(d2_{i}, list_aggregate(d2_{i}, 'min')) AS c{i}"
        for i in range(m)
    )
    lut_cols = ",\n         ".join(
        f"list_transform(range({ncode}), j -> {seqdot('qn', i)}) AS lut{i}"
        for i in range(m)
    )
    adc = " + ".join(f"q.lut{i}[c.c{i}]" for i in range(m))
    norm_expr = (
        "sqrt(list_reduce(list_transform({v}, x -> x::DOUBLE * x::DOUBLE),"
        " (a, b) -> a + b))"
    )

    return f"""
WITH cent AS (SELECT * FROM (VALUES
  {cent_rows}
) AS t(cc_id, cv)),
cblit AS (SELECT {cb_lit} AS cb, {cn2_lit} AS cn2),
corpus AS (SELECT vec_id, embedding AS v FROM embeddings),
-- coarse assignment: dot(v, c)/||c|| argmax, first-max tie-break
assign0 AS (
  SELECT c.vec_id, ct.cc_id,
         (CASE WHEN sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) = 0 THEN 0.0
               ELSE {_DOT.format(a='c.v', b='ct.cv')}
                    / sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) END) AS sim
  FROM corpus c CROSS JOIN cent ct
),
assign AS (SELECT vec_id, cc_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cc_id) AS rn FROM assign0
) WHERE rn = 1),
-- PQ encode of every corpus row
cx AS (SELECT vec_id, v,
              CASE WHEN {norm_expr.format(v='v')} = 0
                   THEN list_transform(v, x -> x::DOUBLE)
                   ELSE list_transform(v, x -> x::DOUBLE / {norm_expr.format(v='v')}) END AS xn
       FROM corpus),
cd2 AS (SELECT vec_id, v, xn,
         {d2_cols}
        FROM cx CROSS JOIN cblit),
codes AS (SELECT vec_id, v,
         {code_cols}
          FROM cd2),
-- queries: probes + ADC lookup tables
q0 AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
probe0 AS (
  SELECT q.q_id, ct.cc_id, {_cos_sql('q.qv', 'ct.cv')} AS sim
  FROM q0 q CROSS JOIN cent ct
),
probes AS (SELECT q_id, cc_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, cc_id) AS rn FROM probe0
) WHERE rn <= 2),
qx AS (SELECT q_id, qv,
              CASE WHEN {norm_expr.format(v='qv')} = 0
                   THEN list_transform(qv, x -> x::DOUBLE)
                   ELSE list_transform(qv, x -> x::DOUBLE / {norm_expr.format(v='qv')}) END AS qn
       FROM q0),
qlut AS (SELECT q_id, qv,
         {lut_cols}
         FROM qx CROSS JOIN cblit),
-- ADC scoring inside probed buckets only
scored AS (
  SELECT q.q_id, c.vec_id, q.qv, c.v, {adc} AS pq_score
  FROM codes c
  JOIN assign a USING (vec_id)
  JOIN probes p ON p.cc_id = a.cc_id
  JOIN qlut q ON q.q_id = p.q_id
),
cands AS (SELECT q_id, vec_id, qv, v FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY pq_score DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= 32),
rer AS (
  SELECT q_id, vec_id, ROUND({_cos_sql('qv', 'v')}, 6) AS cos_sim FROM cands
)
SELECT q_id, vec_id, cos_sim, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id)::BIGINT AS rk
  FROM rer
) WHERE rk <= 10
"""


# ---------------------------------------------------------------------------
# Leakage-safe corpus split (dedup-aware train/val/test)
# ---------------------------------------------------------------------------


def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment keyed by the near-dup CLUSTER (MinHash
    LSH edges -> connected components -> md5 split on the component
    representative, operators.scale.leakage_safe_split): near-copies can
    never straddle the train/test boundary. Composes the dup-cluster
    pipeline with the hash-split rule, both already oracle-checked
    standalone; this oracle re-derives the composition end-to-end."""
    from ncbi_analysis_spark.operators import dedup as dd
    from ncbi_analysis_spark.operators import scale
    from ncbi_analysis_spark.operators.components import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(
        d, "text", "doc_id", num_perm=4, bands=2, shingle_n=3, max_band_freq=None
    )
    comp = connected_components(pairs)
    return scale.leakage_safe_split(d.select("doc_id"), "doc_id", comp).select(
        "doc_id", "rep", "split"
    )


def _leakage_split_sql() -> str:
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
prs AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
        FROM bandrows a JOIN bandrows b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
edges AS (SELECT ida AS u, idb AS v FROM prs
          UNION SELECT idb, ida FROM prs),
reach AS (
  SELECT u AS id, u AS r FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u AS id, reach.r AS r FROM edges e JOIN reach ON e.v = reach.id
),
comp AS (SELECT id AS doc_id, MIN(r) AS rep FROM reach GROUP BY id),
j AS (SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS rep
      FROM documents d LEFT JOIN comp c USING (doc_id)),
b AS (SELECT doc_id, rep,
             ('0x' || substr(md5('split' || rep::VARCHAR), 1, 8))::BIGINT % 1000000 AS sb
      FROM j)
SELECT doc_id, rep,
       CASE WHEN sb < 980000 THEN 'train' WHEN sb < 990000 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def queries_r5() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ann_ivf_trained": ann_ivf_trained,
        "s8_ecocyc_dim": s8_ecocyc_dim,
        "s9_kegg_dim": s9_kegg_dim,
        "leakage_safe_split": leakage_safe_split,
        "ann_pq_rerank": ann_pq_rerank,
        "corpus_profile": corpus_profile,
        "s7_nuccore_dim": s7_nuccore_dim,
        "s10_pubmed_dim": s10_pubmed_dim,
        "s_go_dim": s_go_dim,
        "ann_ivf_pq": ann_ivf_pq,
        "corpus_shard_roundtrip": corpus_shard_roundtrip,
        "skew_profile": skew_profile,
        "embedding_project": embedding_project,
        "stream_windowed_counts": stream_windowed_counts,
        "stream_dedup_replay": stream_dedup_replay,
        "stream_sessions": stream_sessions,
        "stream_local_max": stream_local_max,
        "stream_window_topk": stream_window_topk,
        "stream_click_purchase_join": stream_click_purchase_join,
        "mixture_sample": mixture_sample,
        "token_rarity": token_rarity_q,
    }


def oracle_sql_r5() -> dict[str, str]:
    out = {
        "s8_ecocyc_dim": S8_SQL,
        "s9_kegg_dim": S9_SQL,
        "leakage_safe_split": _leakage_split_sql(),
        "corpus_profile": CORPUS_PROFILE_SQL,
        "s7_nuccore_dim": S7_SQL,
        "s10_pubmed_dim": S10_SQL,
        "s_go_dim": S_GO_SQL,
        "corpus_shard_roundtrip": SHARD_ROUNDTRIP_SQL,
        "skew_profile": SKEW_PROFILE_SQL,
        "stream_windowed_counts": STREAM_WC_SQL,
        "stream_dedup_replay": STREAM_DD_SQL,
        "stream_sessions": STREAM_SESS_SQL,
        "stream_local_max": STREAM_LM_SQL,
        "stream_window_topk": STREAM_TK_SQL,
        "stream_click_purchase_join": STREAM_SSJ_SQL,
        "mixture_sample": MIXTURE_SQL,
        "token_rarity": TOKEN_RARITY_SQL,
    }
    # generated oracles: a failure degrades that query to the driver's
    # rows-only check — loudly (r5 advice: a silent downgrade hid which
    # queries lost exact-match verification)
    for name, gen in (
        ("ann_ivf_trained", _ann_ivf_trained_sql),
        ("ann_pq_rerank", _ann_pq_sql),
        ("ann_ivf_pq", _ann_ivf_pq_sql),
        ("embedding_project", _embedding_project_sql),
    ):
        try:
            out[name] = gen()
        except Exception as exc:  # noqa: BLE001 — degrade to rows-only check
            import warnings

            warnings.warn(
                f"oracle SQL generation failed for {name!r} "
                f"({type(exc).__name__}: {exc}); the driver will record a "
                "rows-only check instead of the exact-match oracle",
                stacklevel=2,
            )
    return out
