"""Round-15 staged oracle queries.

Staged per the registry cadence (``plans/registry.py``): every entry
here is oracle-checked by ``scripts/check_oracle.py --staged`` and
bench-timed for baseline seeding this round, then wired into the
driver registry at round-16 start.

The round's new rows close the last reference-pipeline gaps named by
VERDICT r14 (GeneExtract RANGE mode, ATCC-mode gentamycin), give the
r14 ``semantic_dedup`` batch operator its streaming-gate twin — the
one index family (LSH / IVF / BM25 all have one) that lacked it — and
pin the round's new capability surface: the pure-numpy baseline JPEG
codec (``image_jpeg_features``), the IVF-SQ8 tier + its persisted
lifecycle (``ann_ivf_sq8``, ``sq8_delete_search``), and the real-PCM
audio path with its new auto dispatch (``audio_wav_features``).

Cross-engine determinism rules are the registry-wide ones (see
``driver_queries.py`` header): integer arithmetic or pinned IEEE
doubles only, md5 as the shared hash, no engine RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_HEX_TO_ACGT = ("0123456789abcdef", "acgtacgtacgtacgt")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _genome(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r14 gentamycin genome dim: three md5-derived 10,240-char
    accessions (sf-independent — nation is fixed-size)."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 3)
    return n.select(
        F.concat(F.lit("acc"), F.col("n_nationkey")).alias("accession"),
        F.repeat(
            F.translate(
                F.md5(F.concat(F.lit("gen"), F.col("n_nationkey"))),
                *_HEX_TO_ACGT,
            ),
            320,
        ).alias("seq"),
    )


_GENOME_CTE = """
genome AS (
  SELECT 'acc' || n_nationkey::VARCHAR AS accession,
         repeat(translate(md5('gen' || n_nationkey::VARCHAR),
                          '0123456789abcdef', 'acgtacgtacgtacgt'),
                320) AS seq
  FROM nation WHERE n_nationkey < 3
)
"""


# ---------------------------------------------------------------------------
# F2b — GeneExtract RANGE mode (the last un-twinned reference entry
# point; VERDICT r14 "What's missing" #1)
# ---------------------------------------------------------------------------


def f2b_range_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeneExtract range mode end-to-end
    (plans/pipelines.py::extract_range_sequences; reference
    src/analysis/gene_extract.py:57-86, the DEFAULT of the runnable
    driver src/run_gene_extraction_analysis.py:6). The fixture
    exercises every quirk branch: forward windows ``[min .. max-1]``
    (1-in-2), reverse windows ``[min+1 .. max]`` revcomp'd (the
    deliberate +1 shift), ``a == b`` empty windows (1-in-11),
    non-integer coordinates left untouched (1-in-13, the try/except
    path), and already-filled ``sequence`` never overwritten
    (1-in-5). Coordinates are strings end-to-end, as in the
    reference's TSV rows."""
    from ncbi_analysis_spark.plans.pipelines import extract_range_sequences

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 9 == 0)
    k = F.col("o_orderkey")
    ll = (k * 17 % 9000 + 30).cast("long")
    rr = (ll + k % 150).cast("long")
    fwd = k % 2 == 0
    start0 = F.when(fwd, ll).otherwise(rr)
    end0 = F.when(k % 11 == 0, start0).otherwise(F.when(fwd, rr).otherwise(ll))
    rows = o.select(
        F.concat(F.lit("acc"), k % 3).alias("accession"),
        F.concat(F.lit("R"), k).alias("name"),
        F.when(k % 13 == 0, F.lit("x"))
        .otherwise(start0.cast("string")).alias("start"),
        end0.cast("string").alias("end"),
        F.when(k % 5 == 0, F.concat(F.lit("zz"), k))
        .otherwise(F.lit("")).alias("sequence"),
    )
    return extract_range_sequences(rows, _genome(spark, sf_dir),
                                   "start", "end")


def _range_extract_sql() -> str:
    return f"""
WITH {_GENOME_CTE},
r0 AS (
  SELECT o_orderkey AS k,
         (o_orderkey * 17 % 9000 + 30)::BIGINT AS ll,
         (o_orderkey * 17 % 9000 + 30 + o_orderkey % 150)::BIGINT AS rr
  FROM orders WHERE o_orderkey % 9 = 0
),
r1 AS (
  SELECT k, ll, rr,
         CASE WHEN k % 2 = 0 THEN ll ELSE rr END AS s0,
         CASE WHEN k % 11 = 0 THEN CASE WHEN k % 2 = 0 THEN ll ELSE rr END
              WHEN k % 2 = 0 THEN rr ELSE ll END AS e0
  FROM r0
),
r AS (
  SELECT 'acc' || (k % 3)::VARCHAR AS accession,
         'R' || k::VARCHAR AS name,
         CASE WHEN k % 13 = 0 THEN 'x' ELSE s0::VARCHAR END AS start,
         e0::VARCHAR AS "end",
         CASE WHEN k % 5 = 0 THEN 'zz' || k::VARCHAR ELSE '' END
           AS sequence
  FROM r1
),
c AS (
  SELECT r.*, g.seq,
         TRY_CAST(start AS BIGINT) AS a,
         TRY_CAST("end" AS BIGINT) AS b
  FROM r JOIN genome g USING (accession)
)
SELECT accession, name, start, "end",
       CASE WHEN sequence IS NOT NULL AND sequence <> '' THEN sequence
            WHEN a IS NULL OR b IS NULL THEN sequence
            WHEN a < b THEN substring(seq, least(a, b)::INT,
                                      (greatest(a, b) - least(a, b))::INT)
            ELSE reverse(translate(
                   substring(seq, (least(a, b) + 1)::INT,
                             (greatest(a, b) - least(a, b))::INT),
                   'acgt', 'tgca'))
       END AS sequence
FROM c
"""


# ---------------------------------------------------------------------------
# ATCC-mode gentamycin (VERDICT r14 "What's missing" #2): nearby-gene
# expansion -> related/hit columns + the name-tag consistency explode
# ---------------------------------------------------------------------------


def _atcc_gene_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gentamycin ATCC input: 1-in-7 orders rows, 1-in-3 of them DR
    (expanded), plus one exact-hit DR row per annotation gene so the
    'hit' column path is pinned at every sf."""
    from ncbi_analysis_spark.plans.driver_queries_r14 import _nation_genes

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    k = F.col("o_orderkey")
    ll = (k * 31 % 9000 + 20).cast("long")
    lr = (ll + k % 500 + 1).cast("long")
    d = F.when(k % 2 == 1, F.lit("-")).otherwise(F.lit("+"))
    base = o.select(
        F.concat(F.when(k % 3 == 0, F.lit("DR")).otherwise(F.lit("G")), k)
        .alias("Gene"),
        F.concat(F.lit("chr:"), ll, F.lit("-"), lr,
                 F.lit("("), d, F.lit(")")).alias("Locus"),
    )
    genes = _nation_genes(spark, sf_dir)
    hits = genes.select(
        F.concat(F.lit("DRH"), F.col("gene")).alias("Gene"),
        F.concat(F.lit("chr:"), F.col("gene_left"), F.lit("-"),
                 F.col("gene_right"), F.lit("(+)")).alias("Locus"),
    )
    return base.union(hits)


def gentamycin_atcc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATCC-mode GentamycinAnalysis end-to-end
    (plans/pipelines.py::gentamycin_report_atcc; reference
    src/analysis/gentamycin.py:44-75 — evident-intent twin, the
    reference branch itself crashes on its generator bug, adjudication
    in the pipeline docstring): DR rows expand to nearby genes via the
    position helper, 'hit' is the first expanded gene of type hit,
    'related' the remaining names comma-joined in (gene_left, gene)
    order, non-DR rows get empty strings. The JSON sequence column is
    pinned separately by ``gentamycin_atcc_consistency`` (its explode
    is JSON-format-free on both engines)."""
    from ncbi_analysis_spark.plans.driver_queries_r14 import _nation_genes
    from ncbi_analysis_spark.plans.pipelines import gentamycin_report_atcc

    gl = _atcc_gene_list(spark, sf_dir)
    return gentamycin_report_atcc(gl, _nation_genes(spark, sf_dir)).select(
        "Gene", "Locus", "related", "hit")


def gentamycin_atcc_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consistency TSV of the ATCC branch
    (plans/pipelines.py::gentamycin_consistency_atcc; reference
    generate_consistency_df, src/analysis/gentamycin.py:44-60): the
    report's tag->sequence JSON dict explodes into (name = Gene-tag,
    gene = sequence) rows — one per expanded gene, sequences
    complemented WITHOUT reversal on '-' ranges (the position helper's
    generate_result quirk). Pins the JSON round-trip content without
    comparing JSON text."""
    from ncbi_analysis_spark.plans.driver_queries_r14 import _nation_genes
    from ncbi_analysis_spark.plans.pipelines import (
        gentamycin_consistency_atcc,
        gentamycin_report_atcc,
    )

    gl = _atcc_gene_list(spark, sf_dir)
    rep = gentamycin_report_atcc(gl, _nation_genes(spark, sf_dir))
    return gentamycin_consistency_atcc(rep)


_ATCC_PAT = r"^(.+):(\d+)-(\d+)\((.)\)$"

# Expansion recompute shared by both ATCC rows: the r14
# _genes_near_range_sql CTE chain (correlated min-idx bounds, candidate
# between-join, cover window, position-helper type CASE) keyed by Gene.
_ATCC_EXP_CTE = """
g AS (
  SELECT g0.*, row_number() OVER (ORDER BY gene_left, gene) AS idx FROM g0
),
gl AS (
  SELECT (CASE WHEN o_orderkey % 3 = 0 THEN 'DR' ELSE 'G' END)
           || o_orderkey::VARCHAR AS "Gene",
         'chr:' || (o_orderkey * 31 % 9000 + 20)::VARCHAR || '-'
           || (o_orderkey * 31 % 9000 + 20 + o_orderkey % 500 + 1)::VARCHAR
           || '(' || (CASE WHEN o_orderkey % 2 = 1 THEN '-' ELSE '+' END)
           || ')' AS "Locus"
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT 'DRH' || gene,
         'chr:' || gene_left::VARCHAR || '-' || gene_right::VARCHAR
           || '(+)'
  FROM g0
),
r AS (
  SELECT "Gene" AS rid,
         CAST(regexp_extract("Locus", '{pat}', 2) AS BIGINT) AS "left",
         CAST(regexp_extract("Locus", '{pat}', 3) AS BIGINT) AS "right",
         regexp_extract("Locus", '{pat}', 4) AS direction
  FROM gl WHERE "Gene" LIKE 'DR%'
),
b AS (
  SELECT r.*,
    coalesce((SELECT min(idx) FROM g WHERE g.gene_left >= r."left"),
             (SELECT max(idx) + 1 FROM g)) AS lg,
    coalesce((SELECT min(idx) FROM g WHERE g.gene_left >= r."right"),
             (SELECT max(idx) + 1 FROM g)) - 1 AS rl,
    (SELECT max(idx) FROM g) AS n
  FROM r
),
cand AS (
  SELECT b.*, g.idx, g.gene, g.gene_left, g.gene_right,
         g.sequence AS gseq
  FROM b JOIN g
    ON g.idx BETWEEN greatest(least(b.lg, b.rl), 1)
                 AND least(greatest(b.lg, b.rl), b.n)
),
cc AS (
  SELECT cand.*,
         min(CASE WHEN gene_left <= "left" AND gene_right >= "right"
                  THEN idx END) OVER (PARTITION BY rid) AS cov
  FROM cand
),
exp AS (
  SELECT rid, gene, gene_left,
         CASE WHEN "left" = gene_left AND "right" = gene_right THEN 'hit'
              WHEN (CASE WHEN "right" < gene_left OR "left" > gene_right
                         THEN 0
                         WHEN "right" < gene_right
                         THEN "right" - gene_left + 1
                         ELSE gene_right - "left" + 1 END)
                   * 100.0 / ("right" - "left" + 1) >= 90.0
              THEN 'homology'
              WHEN gene_left <= "left" AND "right" <= gene_right
              THEN 'include'
              ELSE 'related' END AS type,
         CASE WHEN direction = '-' THEN translate(gseq, 'acgt', 'tgca')
              ELSE gseq END AS sequence
  FROM cc WHERE cov IS NULL OR idx = cov
)
"""


def _atcc_ctes() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r14 import _GENES_CTE

    return ("WITH " + _GENES_CTE.strip() + ","
            + _ATCC_EXP_CTE.replace("{pat}", _ATCC_PAT))


def _atcc_report_sql() -> str:
    return f"""
{_atcc_ctes()},
hitp AS (
  SELECT rid, gene AS hitg FROM (
    SELECT rid, gene,
           row_number() OVER (PARTITION BY rid
                              ORDER BY gene_left, gene) AS rn
    FROM exp WHERE type = 'hit'
  ) WHERE rn = 1
),
agg AS (
  SELECT e.rid,
         coalesce(string_agg(
           CASE WHEN e.gene <> coalesce(h.hitg, '') THEN e.gene END,
           ',' ORDER BY e.gene_left, e.gene), '') AS related,
         coalesce(any_value(h.hitg), '') AS hit
  FROM exp e LEFT JOIN hitp h USING (rid)
  GROUP BY e.rid
)
SELECT gl."Gene", gl."Locus",
       CASE WHEN gl."Gene" LIKE 'DR%' THEN coalesce(a.related, '')
            ELSE '' END AS related,
       CASE WHEN gl."Gene" LIKE 'DR%' THEN coalesce(a.hit, '')
            ELSE '' END AS hit
FROM gl LEFT JOIN agg a ON gl."Gene" = a.rid
"""


def _atcc_consistency_sql() -> str:
    return f"""
{_atcc_ctes()}
SELECT rid || '-' || gene AS name, sequence AS gene FROM exp
"""


# ---------------------------------------------------------------------------
# Streaming SemDeDup gate (VERDICT r14 ask 6): the semantic_dedup
# operator's streaming boundary, index leg + intra-batch leg
# ---------------------------------------------------------------------------

_SEMGATE_THRESHOLD = 0.32  # both legs bite at sf0.01: 22 index-leg
# collisions and one intra-batch component among the 72 streamed rows
# (measured while staging; 0.35 kills the batch leg, 0.4 the index leg)


def stream_semdedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SemDeDup gate end-to-end
    (streaming/events.py::stream_semdedup_decon; Abbas et al. 2023):
    old vectors (% 7 != 0) are indexed under a frozen 8-centroid
    quantizer, a takedown batch (% 5 == 0) is tombstoned WITHOUT
    compaction, then the new vectors (% 7 == 0) stream through in ONE
    micro-batch — history near-dups (6dp-rounded best cosine within
    the single nearest-centroid cluster >= 0.32) drop on the index
    leg, and the survivors run the paper's within-cluster
    keep-the-outlier rule against each other on the batch leg. The
    single-file staging pins the batching (the batch leg makes
    verdicts greedy-prefix, so a fixed batching is part of the row's
    contract). Oracle: full recompute — the ivf_assign argmax fold,
    rounded index-leg cut, exact-double pair edges, recursive-CTE
    components, cent_sim-ascending keep window."""
    import glob
    import os
    import shutil
    import tempfile

    from ncbi_analysis_spark.operators.similarity_search import (
        delete_from_ivf_index,
        ivf_assign,
        write_ivf_index,
    )
    from ncbi_analysis_spark.streaming.events import (
        read_gated_docs,
        stream_semdedup_decon,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = e.filter(F.col("vec_id") % 7 != 0).select("vec_id", "embedding")
    new = e.filter(F.col("vec_id") % 7 == 0).select("vec_id", "embedding")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding")

    tmp = tempfile.mkdtemp(prefix="stream_semdedup_gate_")
    try:
        idx = f"{tmp}/index"
        write_ivf_index(ivf_assign(old, cents), idx, centroids=cents)
        delete_from_ivf_index(
            old.filter(F.col("vec_id") % 5 == 0).select("vec_id"), idx)
        # ONE data file -> ONE micro-batch, whatever the trigger's
        # file-batching defaults (unlike the batching-invariant LSH/IVF
        # gates, the batch leg here makes batching part of the result)
        stage = f"{tmp}/stage"
        new.coalesce(1).write.parquet(stage)
        src = f"{tmp}/src"
        os.makedirs(src)
        shutil.copy(sorted(glob.glob(f"{stage}/part-*.parquet"))[0],
                    f"{src}/f0.parquet")
        stream = spark.readStream.schema(new.schema).parquet(src)
        stream_semdedup_decon(stream, idx, cents, f"{tmp}/gated",
                              f"{tmp}/ck", threshold=_SEMGATE_THRESHOLD)
        gated = read_gated_docs(spark, f"{tmp}/gated").select("vec_id")
        rows = gated.collect()
        schema = gated.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _stream_semdedup_gate_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r5 import (
        _DOT,
        _cos_sql,
        _dlit,
    )

    thr = _dlit(_SEMGATE_THRESHOLD)
    return f"""
WITH RECURSIVE
cent AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings
         WHERE vec_id < 8),
pool AS (SELECT vec_id, embedding AS v FROM embeddings),
assign0 AS (
  -- dot(v, c) / ||c|| — ivf_assign's map-side argmax fold; the probe
  -- argmax (full cosine) picks the same centroid because the ||v||
  -- division is a positive per-row constant
  SELECT p.vec_id, p.v, ct.c_id, ct.cv,
         (CASE WHEN sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) = 0 THEN 0.0
               ELSE {_DOT.format(a='p.v', b='ct.cv')}
                    / sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) END) AS sim
  FROM pool p CROSS JOIN cent ct
),
assign AS (SELECT vec_id, v, c_id, cv FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY sim DESC, c_id) AS rn
  FROM assign0
) WHERE rn = 1),
hist AS (SELECT * FROM assign WHERE vec_id % 7 <> 0 AND vec_id % 5 <> 0),
newv AS (SELECT * FROM assign WHERE vec_id % 7 = 0),
collide AS (
  -- index leg: best WITHIN-CLUSTER cosine vs the live index, at the
  -- family's 6dp round (ivf_topk)
  SELECT DISTINCT n.vec_id
  FROM newv n JOIN hist h ON n.c_id = h.c_id
  WHERE ROUND({_cos_sql('n.v', 'h.v')}, 6) >= {thr}
),
surv AS (
  SELECT n.* FROM newv n LEFT JOIN collide c ON n.vec_id = c.vec_id
  WHERE c.vec_id IS NULL
),
pairs AS (
  -- batch leg: exact-double within-cluster edges (semantic_dedup's
  -- expr pair stage)
  SELECT a.vec_id AS ida, b.vec_id AS idb
  FROM surv a JOIN surv b
    ON a.c_id = b.c_id AND a.vec_id < b.vec_id
  WHERE {_cos_sql('a.v', 'b.v')} >= {thr}
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
  SELECT s.vec_id, {_cos_sql('s.v', 's.cv')} AS cent_sim, c.component
  FROM surv s LEFT JOIN comp c ON s.vec_id = c.id
)
SELECT vec_id FROM (
  SELECT vec_id,
         ROW_NUMBER() OVER (PARTITION BY COALESCE(component, vec_id)
                            ORDER BY cent_sim ASC, vec_id ASC) AS rn
  FROM lab
) WHERE rn = 1
"""


def image_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-JPEG REAL-pixel decode through the full multimodal
    plumbing (r15, ``functions/jpeg.py``): the three committed JPEG
    fixtures — two DC-only analytic ones plus the 4:2:0 real-pixel
    gradient — ride ``image_features`` with its DEFAULT decoder, which
    now sniffs baseline JFIF onto the real path (pure numpy Huffman +
    IDCT; no Pillow anywhere). Luma is emitted as an exact integer
    (mean*1e9 rounded) so the cross-engine compare never touches float
    formatting; pHash literals are the deterministic float64 pins also
    asserted in tests/test_jpeg.py."""
    from ncbi_analysis_spark.operators import multimodal as mm

    fx = "/root/repo/tests/fixtures"
    rows = []
    for mid, path in [(1, f"{fx}/flat8.jpg"),
                      (2, f"{fx}/blocks16.jpg"),
                      (3, f"{fx}/media/gradient_rgb.jpg")]:
        with open(path, "rb") as f:
            rows.append((mid, "image", f.read(),
                         (None, None, None, None, None, None)))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.image_features(media)
    return out.select(
        "media_id", "width", "height", "phash64",
        F.round(F.col("mean_luma") * F.lit(1e9)).cast("long")
        .alias("luma_e9"),
    ).orderBy("media_id")


_IMAGE_JPEG_SQL = """
SELECT * FROM (VALUES
  (1,  8,  8, (-9223372036854775807 - 1)::BIGINT, 392156863::BIGINT),
  (2, 16, 16, -7993607021791215420::BIGINT, 626470588::BIGINT),
  (3, 24, 16, -8851168403618376406::BIGINT, 562062561::BIGINT)
) AS t(media_id, width, height, phash64, luma_e9)
ORDER BY media_id
"""


def ann_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + SQ8 scalar quantization (r15,
    ``operators/similarity_search.py::ivf_sq8_topk``): the FAISS-style
    middle tier between IVF-flat and IVF-PQ. Bounds are trained
    per-dimension over the corpus (one d-row shuffle), the index stores
    int codes (4-8x smaller than the float arrays — the regime where a
    100 TB index stops fitting the page cache), probed-bucket candidates
    are scored ASYMMETRICALLY (full-precision query vs dequantized
    code). Same 48-query batch / centroid-8 / nprobe-2 shape as the
    wired ``ann_ivf`` row so the two tiers stay comparable in bench.

    Cross-engine determinism: codes are floor(+0.5) integers; the
    dequantized doubles come from one multiply-add per element with the
    step computed once — both engines reproduce them bit-for-bit, so
    the rounded sims hash-match exactly."""
    from ncbi_analysis_spark.operators import similarity_search as ss

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 48).select(
        F.col("vec_id").alias("q_id"), "embedding")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding")
    out = ss.ivf_sq8_topk(e, q, cents, k=10, nprobe=2)
    return out.withColumn("rk", F.col("rk").cast("long"))


def _ann_ivf_sq8_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries import _DOT, _cos_sql

    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
b AS (SELECT pos, MIN(val) AS lo, MAX(val) AS hi
      FROM (SELECT unnest(v) AS val, unnest(range(len(v))) AS pos FROM e)
      GROUP BY pos),
bl AS (SELECT list(lo ORDER BY pos) AS los, list(hi ORDER BY pos) AS his
       FROM b),
cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 48),
assign0 AS (
  -- same assignment formula/fold as ivf_assign (see ANN_IVF_SQL)
  SELECT c.vec_id, c.v, ct.c_id,
         (CASE WHEN sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) = 0 THEN 0.0
               ELSE {_DOT.format(a='c.v', b='ct.cv')}
                    / sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) END) AS sim
  FROM e c CROSS JOIN cent ct
),
assign AS (SELECT vec_id, v, c_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_id)
         AS rn FROM assign0
) WHERE rn = 1),
-- SQ8 encode: floor(clip01((x-lo)/(hi-lo))*255 + 0.5); constant dims -> 0
coded AS (
  SELECT a.vec_id, a.c_id,
         list_transform(range(len(a.v)), i ->
           CASE WHEN bl.his[i+1] = bl.los[i+1] THEN 0
                ELSE floor(LEAST(GREATEST(
                       (a.v[i+1] - bl.los[i+1])
                       / (bl.his[i+1] - bl.los[i+1]), 0.0), 1.0)
                     * 255.0 + 0.5)::INT END) AS code
  FROM assign a CROSS JOIN bl
),
-- asymmetric reconstruction: lo + code * ((hi-lo)/255.0), step once
deq AS (
  SELECT vec_id, c_id,
         list_transform(range(len(code)), i ->
           bl.los[i+1] + code[i+1]::DOUBLE
           * ((bl.his[i+1] - bl.los[i+1]) / 255.0)) AS dv
  FROM coded CROSS JOIN bl
),
probe0 AS (
  SELECT q.q_id, q.qv, ct.c_id, {_cos_sql('q.qv', 'ct.cv')} AS sim
  FROM q CROSS JOIN cent ct
),
probes AS (SELECT q_id, qv, c_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)
         AS rn FROM probe0
) WHERE rn <= 2),
scored AS (
  SELECT p.q_id, d.vec_id, ROUND({_cos_sql('p.qv', 'd.dv')}, 6) AS sq_sim
  FROM probes p JOIN deq d USING (c_id)
)
SELECT q_id, vec_id, sq_sim, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY sq_sim DESC, vec_id)::BIGINT AS rk
  FROM scored
) WHERE rk <= 10
"""


def sq8_delete_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted SQ8 lifecycle through the exact-match gate (the coded
    sibling of ``ivf_delete_search``): write the codes-only index from
    a 3/4 base slice, APPEND the remaining quarter under the frozen
    quantizer + the index's own persisted bounds, tombstone-DELETE every
    97th id, then search the live view. Append ≡ rebuild-over-union and
    delete = anti-join, so the oracle recomputes over
    ``embeddings WHERE NOT vec_id % 97 = 0`` with no lifecycle at all —
    a drift anywhere in write/append/tombstone/bounds-persist
    hash-mismatches here."""
    from ncbi_analysis_spark.operators import similarity_search as ss
    from ncbi_analysis_spark.plans.driver_queries_r5 import _staging_dir

    e = _t(spark, sf_dir, "embeddings")
    n = e.count()
    cut = (n * 3) // 4
    q = e.filter(F.col("vec_id") < 48).select(
        F.col("vec_id").alias("q_id"), "embedding")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding")
    bounds = ss.train_sq_bounds(e)  # trained on the full corpus

    path = _staging_dir("spark_graft_sq8_index")
    ss.write_sq8_index(ss.ivf_assign(e.filter(F.col("vec_id") < cut), cents),
                       bounds, path, centroids=cents)
    ss.append_to_sq8_index(e.filter(F.col("vec_id") >= cut), cents, path)
    ss.delete_from_ivf_index(
        e.filter(F.col("vec_id") % 97 == 0).select("vec_id"), path)

    index = ss.read_sq8_index(spark, path)
    out = ss.ivf_sq8_topk(e, q, cents,
                          bounds=ss.read_sq8_bounds(spark, path),
                          index=index, k=10, nprobe=2)
    return out.withColumn("rk", F.col("rk").cast("long"))


def _sq8_delete_search_sql() -> str:
    # the lifecycle is invisible to the oracle by design: same SQL as
    # ann_ivf_sq8 with the tombstoned ids excluded from the INDEX side
    # (bounds/centroids/probes still come from the full corpus — bounds
    # were trained before the delete, and queries are corpus rows)
    sql = _ann_ivf_sq8_sql()
    return sql.replace(
        """scored AS (
  SELECT p.q_id, d.vec_id, ROUND(""",
        """live AS (SELECT * FROM deq WHERE NOT vec_id % 97 = 0),
scored AS (
  SELECT p.q_id, d.vec_id, ROUND(""",
    ).replace("FROM probes p JOIN deq d USING (c_id)",
              "FROM probes p JOIN live d USING (c_id)")


def audio_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM decode through the full audio plumbing (r15): the two
    committed WAV fixtures (16-bit mono sine, 8-bit stereo ramp — both
    closed-form signals, goldens on paper up to float64 rms) plus one
    md5-stub payload ride ``audio_features`` with its new DEFAULT
    ``auto_audio_decoder``, pinning the dispatch itself: RIFF/WAVE to
    the real path, everything else to the stub. rms/peak emitted as
    exact integers (x*1e9 rounded), the image_jpeg_features posture."""
    from ncbi_analysis_spark.operators import multimodal as mm

    fx = "/root/repo/tests/fixtures/media"
    rows = []
    for mid, payload in [
        (1, open(f"{fx}/sine440.wav", "rb").read()),
        (2, open(f"{fx}/ramp_stereo.wav", "rb").read()),
        (3, b"stub-audio-payload"),
    ]:
        rows.append((mid, "audio", payload,
                     (None, None, None, None, None, None)))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.audio_features(media)
    return out.select(
        "media_id", "sample_rate", "duration_ms", "n_samples",
        F.round(F.col("rms") * F.lit(1e9)).cast("long").alias("rms_e9"),
        F.round(F.col("peak") * F.lit(1e9)).cast("long").alias("peak_e9"),
    ).orderBy("media_id")


_AUDIO_WAV_SQL = """
SELECT * FROM (VALUES
  (1,  8000,    250,    2000, 353543769::BIGINT,  500000000::BIGINT),
  (2, 11025,     27,     300, 583469455::BIGINT, 1000000000::BIGINT),
  (3,  8000, 496444, 3971552, 552941176::BIGINT,  305882353::BIGINT)
) AS t(media_id, sample_rate, duration_ms, n_samples, rms_e9, peak_e9)
ORDER BY media_id
"""


_EVAL_QUERIES = [(1, "dup merge stream"), (2, "hash vector line")]


def bm25_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality audit through the gate (r15,
    ``operators/retrieval.py::retrieval_eval`` — the retrieval family's
    eval leg, sibling of ``ann_recall_audit``): two BM25 rankings (the
    standing rare+common query and an all-common one) judged against
    deterministic graded qrels — every 7th document, rel = number of
    distinct query terms it contains (0-3). Emits per-query nDCG@10 /
    MRR / P@10 / recall with the exact integer legs alongside. The
    oracle recomputes the BM25 ranking (the `_bm25_sql` arithmetic,
    parameterized by term list), the same qrels, and the same
    log2-discount DCG fold."""
    from ncbi_analysis_spark.functions import text as textf
    from ncbi_analysis_spark.operators.retrieval import (
        bm25_topk, query_terms, retrieval_eval)
    from pyspark.sql.window import Window

    from ncbi_analysis_spark.operators.concurrency import run_jobs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # bm25_topk is EAGER (it derives the model and collects the bounded
    # top-k before returning) and the two query legs are independent —
    # run them as concurrent jobs (guide §2.6) instead of paying two
    # sequential model-derivation walls
    rankings = run_jobs(*[
        (lambda qs=qs: bm25_topk(d, qs, k=10)) for _, qs in _EVAL_QUERIES
    ])
    res_parts = []
    qrel_parts = []
    for (qid, qs), r in zip(_EVAL_QUERIES, rankings):
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        res_parts.append(r.select(
            F.lit(qid).alias("query_id"), "doc_id",
            F.row_number().over(w).alias("rk")))
        terms = query_terms(qs)
        qrel_parts.append(
            d.filter((F.col("doc_id") % 7 == 0) & F.col("text").isNotNull())
            .select(
                F.lit(qid).alias("query_id"), "doc_id",
                F.size(F.array_intersect(
                    textf.tokens(F.col("text")),
                    F.array(*[F.lit(t) for t in terms]))).alias("rel")))
    results = res_parts[0].unionByName(res_parts[1])
    qrels = qrel_parts[0].unionByName(qrel_parts[1])
    return retrieval_eval(results, qrels, k=10).orderBy("query_id")


def _bm25_rank_sql(terms: list[str], qid: int) -> str:
    """The `_bm25_sql` arithmetic (driver_queries_r11) parameterized by
    term list, emitting (query_id, doc_id, rk) for the top-10."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    vals = ", ".join(f"('{t}')" for t in terms)
    return rf"""
  SELECT {qid} AS query_id, doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rk
  FROM (
    SELECT doc_id,
           list_reduce(list_prepend(0.0, list(contrib ORDER BY g)),
                       (a, b) -> a + b) AS score
    FROM (
      SELECT tf.doc_id, tf.g,
             m.idf * (tf.tf::DOUBLE /
               (tf.tf::DOUBLE + 1.2 * ((1.0 - 0.75) + 0.75 *
                 (dl.dl::DOUBLE / (st.s::DOUBLE / st.n::DOUBLE))))) AS contrib
      FROM (SELECT doc_id, g, count(*)::BIGINT AS tf FROM toks
            WHERE g IN ({in_list}) GROUP BY doc_id, g) tf
      JOIN dl ON tf.doc_id = dl.doc_id
      JOIN (SELECT t.g,
                   ln(1.0 + (st.n::DOUBLE - COALESCE(dfv.df, 0)::DOUBLE + 0.5)
                            / (COALESCE(dfv.df, 0)::DOUBLE + 0.5)) AS idf
            FROM (VALUES {vals}) t(g)
            LEFT JOIN (SELECT g, count(DISTINCT doc_id)::BIGINT AS df
                       FROM toks WHERE g IN ({in_list}) GROUP BY g) dfv
              ON t.g = dfv.g
            CROSS JOIN st) m ON tf.g = m.g
      CROSS JOIN st
    ) GROUP BY doc_id
  ) ORDER BY score DESC, doc_id LIMIT 10
"""


def _bm25_ndcg_eval_sql() -> str:
    from ncbi_analysis_spark.operators.retrieval import query_terms

    rank_union = " UNION ALL ".join(
        f"SELECT * FROM ({_bm25_rank_sql(query_terms(qs), qid)})"
        for qid, qs in _EVAL_QUERIES)
    qrel_union = " UNION ALL ".join(
        rf"""SELECT {qid} AS query_id, doc_id,
               len(list_intersect(
                     list_distinct(string_split_regex(TRIM(text), '\s+')),
                     [{", ".join(f"'{t}'" for t in query_terms(qs))}]))::DOUBLE
                 AS rel
             FROM d WHERE doc_id % 7 = 0"""
        for qid, qs in _EVAL_QUERIES)
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
st AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS s FROM dl),
results AS ({rank_union}),
qrels AS ({qrel_union}),
hit AS (
  SELECT r.query_id,
         sum(COALESCE(q.rel, 0.0) / log2(r.rk + 1)) AS dcg,
         sum(CASE WHEN COALESCE(q.rel, 0.0) > 0 THEN 1 ELSE 0 END)::BIGINT
           AS n_rel_ret,
         min(CASE WHEN COALESCE(q.rel, 0.0) > 0 THEN r.rk END) AS first_rel
  FROM results r
  LEFT JOIN qrels q ON r.query_id = q.query_id AND r.doc_id = q.doc_id
  WHERE r.rk <= 10 GROUP BY r.query_id
),
ideal AS (
  SELECT query_id,
         sum(CASE WHEN rn <= 10 THEN rel / log2(rn + 1) ELSE 0.0 END) AS idcg,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)::BIGINT AS n_rel
  FROM (SELECT query_id, rel,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, doc_id) AS rn
        FROM qrels)
  GROUP BY query_id
)
SELECT i.query_id, i.n_rel,
       COALESCE(h.n_rel_ret, 0)::BIGINT AS n_rel_ret,
       ROUND(CASE WHEN i.idcg > 0
                  THEN COALESCE(h.dcg, 0.0) / i.idcg ELSE 0.0 END, 6)
         AS ndcg_at_k,
       ROUND(CASE WHEN h.first_rel IS NOT NULL
                  THEN 1.0 / h.first_rel ELSE 0.0 END, 6) AS mrr,
       ROUND(COALESCE(h.n_rel_ret, 0) / 10.0, 6) AS p_at_k,
       CASE WHEN i.n_rel > 0
            THEN ROUND(COALESCE(h.n_rel_ret, 0)::DOUBLE / i.n_rel, 6)
       END AS recall_at_k
FROM ideal i LEFT JOIN hit h ON i.query_id = h.query_id
ORDER BY i.query_id
"""


def webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard sink/source through the gate (r15,
    ``sources/webdataset.py`` — the tar-shard interchange layout
    multimodal training loaders stream): every 11th document becomes a
    media row (md5-derived payload bytes, deterministic typed meta),
    shards are written (id//64 membership, byte-reproducible tars) and
    read back, and the output fingerprints the round-tripped rows.
    The lifecycle is invisible to the oracle by design — a torn member,
    meta drift, payload corruption or membership change hash-mismatches
    here."""
    from ncbi_analysis_spark.plans.driver_queries_r5 import _staging_dir
    from ncbi_analysis_spark.sources import webdataset as wds

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio")).alias("kind"),
        F.encode(F.md5(F.concat(F.lit("wds"), F.col("doc_id"))), "utf-8")
        .alias("data"),
        F.struct(
            (F.col("doc_id") % 64 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 48 + 1).cast("int").alias("height"),
            F.lit(3).cast("int").alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("format"),
        ).alias("meta"),
    )
    path = _staging_dir("spark_graft_wds")
    wds.write_webdataset_shards(media, path, samples_per_shard=64)
    back = wds.read_webdataset_shards(spark, path)
    return back.select(
        "media_id", "kind",
        F.md5(F.col("data").cast("binary")).alias("payload_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        (F.col("media_id") / 64).cast("long").alias("shard_id"),
    ).orderBy("media_id")


_WDS_SQL = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
       md5(md5('wds' || doc_id::VARCHAR)) AS payload_md5,
       (doc_id % 64 + 1)::INT AS width,
       (doc_id % 48 + 1)::INT AS height,
       (doc_id // 64)::BIGINT AS shard_id
FROM documents WHERE doc_id % 11 = 0
ORDER BY media_id
"""


def queries_r15() -> dict:
    return {
        "f2b_range_extract": f2b_range_extract,
        "gentamycin_atcc_report": gentamycin_atcc_report,
        "gentamycin_atcc_consistency": gentamycin_atcc_consistency,
        "stream_semdedup_gate": stream_semdedup_gate,
        "image_jpeg_features": image_jpeg_features,
        "ann_ivf_sq8": ann_ivf_sq8,
        "sq8_delete_search": sq8_delete_search,
        "audio_wav_features": audio_wav_features,
        "bm25_ndcg_eval": bm25_ndcg_eval,
        "webdataset_roundtrip": webdataset_roundtrip,
    }


def oracle_sql_r15() -> dict[str, str]:
    return {
        "f2b_range_extract": _range_extract_sql(),
        "gentamycin_atcc_report": _atcc_report_sql(),
        "gentamycin_atcc_consistency": _atcc_consistency_sql(),
        "stream_semdedup_gate": _stream_semdedup_gate_sql(),
        "image_jpeg_features": _IMAGE_JPEG_SQL,
        "ann_ivf_sq8": _ann_ivf_sq8_sql(),
        "sq8_delete_search": _sq8_delete_search_sql(),
        "audio_wav_features": _AUDIO_WAV_SQL,
        "bm25_ndcg_eval": _bm25_ndcg_eval_sql(),
        "webdataset_roundtrip": _WDS_SQL,
    }
