"""Round-14 staged oracle queries.

Staged per the registry cadence (``plans/registry.py``): every entry
here is oracle-checked by ``scripts/check_oracle.py --staged`` and
bench-timed for baseline seeding this round, then wired into the
driver registry at round-15 start.

Cross-engine determinism rules are the registry-wide ones (see
``driver_queries.py`` header): integer arithmetic or pinned IEEE
doubles only, md5 as the shared hash, no engine RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Named parity pipelines for the last reference drivers (VERDICT r13 §3)
# ---------------------------------------------------------------------------

_HEX_TO_ACGT = ("0123456789abcdef", "acgtacgtacgtacgt")


def _nation_genes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25-row gene annotation dim (nation is fixed-size at
    every sf, so fixture coverage is sf-independent): starts 400 apart
    in [13, 9613], widths 351-850 (adjacent genes overlap sometimes —
    allowed), sequence an md5-derived 32-char acgt string."""
    n = _t(spark, sf_dir, "nation")
    left = F.col("n_nationkey") * 400 + 13
    return n.select(
        left.cast("long").alias("gene_left"),
        (left + 350 + (F.col("n_nationkey") * 37) % 500)
        .cast("long").alias("gene_right"),
        F.concat(F.lit("g"), F.col("n_nationkey")).alias("gene"),
        F.translate(
            F.md5(F.concat(F.lit("seq"), F.col("n_nationkey"))),
            *_HEX_TO_ACGT,
        ).alias("sequence"),
    )


def genes_near_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FoundGeneNameNearARange end-to-end
    (plans/pipelines.py::genes_near_range over
    operators/genes.py::nearby_genes_by_range; reference
    src/analysis/found_gene_name_near_a_range.py:10-33 +
    src/utils/gene_position_helper.py:18-43): start>end encodes '-'
    and swaps, ranges expand to nearby genes with cover preference
    (single starter / all starters / two flanking neighbors), type from
    the position helper's quirky overlap formula, sequence complemented
    WITHOUT reversal on '-'. Ranges: 1-in-11 orders rows (interior to
    the gene span by construction) plus one exact-hit row per gene.
    Oracle: full recompute — correlated min-idx bounds, candidate
    between-join, cover window."""
    from ncbi_analysis_spark.plans.pipelines import genes_near_range as gnr

    genes = _nation_genes(spark, sf_dir)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    l0 = (F.col("o_orderkey") * 31 % 9000 + 20).cast("long")
    r0 = (l0 + F.col("o_orderkey") % 500 + 1).cast("long")
    ll = (F.col("o_orderkey") * 13 % 9000 + 20).cast("long")
    lr = (ll + F.col("o_orderkey") % 300).cast("long")
    d = F.when(F.col("o_orderkey") % 2 == 1, "-").otherwise("+")
    ranges = o.select(
        F.concat(F.lit("r"), F.col("o_orderkey")).alias("name"),
        F.when(d == "-", r0).otherwise(l0).alias("start"),
        F.when(d == "-", l0).otherwise(r0).alias("end"),
        F.concat(F.lit("acc"), F.col("o_orderkey") % 3, F.lit(":"),
                 ll, F.lit("-"), lr, F.lit("("), d, F.lit(")"))
        .alias("locus"),
    ).union(genes.select(
        F.concat(F.lit("h"), F.col("gene")).alias("name"),
        F.col("gene_left").alias("start"),
        F.col("gene_right").alias("end"),
        F.concat(F.lit("acc0:"), F.col("gene_left"), F.lit("-"),
                 F.col("gene_right"), F.lit("(+)")).alias("locus"),
    ))
    out = gnr(ranges, genes)
    return out.select(
        "name", "start", "end", "locus", "left", "right", "direction",
        "length", "compare_length", "type", "gene", "gene_left",
        "gene_right", "sequence",
    )


_GENES_CTE = """
g0 AS (
  SELECT (n_nationkey * 400 + 13)::BIGINT AS gene_left,
         (n_nationkey * 400 + 13 + 350 + (n_nationkey * 37) % 500)::BIGINT
           AS gene_right,
         'g' || n_nationkey::VARCHAR AS gene,
         translate(md5('seq' || n_nationkey::VARCHAR),
                   '0123456789abcdef', 'acgtacgtacgtacgt') AS sequence
  FROM nation
)
"""


def _genes_near_range_sql() -> str:
    return f"""
WITH {_GENES_CTE},
g AS (
  SELECT g0.*, row_number() OVER (ORDER BY gene_left, gene) AS idx FROM g0
),
r1 AS (
  SELECT 'r' || o_orderkey::VARCHAR AS name,
         CASE WHEN o_orderkey % 2 = 1
              THEN (o_orderkey * 31 % 9000 + 20 + o_orderkey % 500 + 1)
              ELSE (o_orderkey * 31 % 9000 + 20) END::BIGINT AS start,
         CASE WHEN o_orderkey % 2 = 1
              THEN (o_orderkey * 31 % 9000 + 20)
              ELSE (o_orderkey * 31 % 9000 + 20 + o_orderkey % 500 + 1)
              END::BIGINT AS "end",
         'acc' || (o_orderkey % 3)::VARCHAR || ':'
           || (o_orderkey * 13 % 9000 + 20)::VARCHAR || '-'
           || (o_orderkey * 13 % 9000 + 20 + o_orderkey % 300)::VARCHAR
           || '(' || (CASE WHEN o_orderkey % 2 = 1 THEN '-' ELSE '+' END)
           || ')' AS locus
  FROM orders WHERE o_orderkey % 11 = 0
  UNION ALL
  SELECT 'h' || gene, gene_left, gene_right,
         'acc0:' || gene_left::VARCHAR || '-' || gene_right::VARCHAR
           || '(+)'
  FROM g0
),
r AS (
  SELECT name, start, "end", locus,
         least(start, "end") AS "left",
         greatest(start, "end") AS "right",
         CASE WHEN start > "end" THEN '-' ELSE '+' END AS direction,
         (CAST(regexp_extract(locus, '^(.+):(\\d+)-(\\d+)\\((.)\\)$', 3)
               AS BIGINT)
          - CAST(regexp_extract(locus, '^(.+):(\\d+)-(\\d+)\\((.)\\)$', 2)
                 AS BIGINT) + 1) AS length,
         greatest(start, "end") - least(start, "end") + 1
           AS compare_length
  FROM r1
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
                  THEN idx END) OVER (PARTITION BY name) AS cov
  FROM cand
)
SELECT name, start, "end", locus, "left", "right", direction, length,
       compare_length,
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
       gene, gene_left, gene_right,
       CASE WHEN direction = '-' THEN translate(gseq, 'atcg', 'tagc')
            ELSE gseq END AS sequence
FROM cc WHERE cov IS NULL OR idx = cov
"""


def gentamycin_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NCBI-mode GentamycinAnalysis end-to-end
    (plans/pipelines.py::gentamycin_report; reference
    src/analysis/gentamycin.py:33-41,76-93): F11 locus parse, 1-based
    inclusive genome slice off the byte-encoded broadcast genome dim,
    reverse complement on '-', consistency-twin name column. Genome:
    three md5-derived 10,240-char accessions; gene list: 1-in-7 orders
    rows with slices up to 200 bases."""
    from ncbi_analysis_spark.plans.pipelines import gentamycin_report as gr

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    ll = (F.col("o_orderkey") * 13 % 9500 + 1).cast("long")
    lr = (ll + F.col("o_orderkey") % 200).cast("long")
    d = F.when(F.col("o_orderkey") % 2 == 1, "-").otherwise("+")
    gene_list = o.select(
        F.concat(F.lit("G"), F.col("o_orderkey")).alias("gene"),
        F.concat(F.lit("acc"), F.col("o_orderkey") % 3, F.lit(":"),
                 ll, F.lit("-"), lr, F.lit("("), d, F.lit(")"))
        .alias("locus"),
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 3)
    genome = n.select(
        F.concat(F.lit("acc"), F.col("n_nationkey")).alias("accession"),
        F.repeat(
            F.translate(
                F.md5(F.concat(F.lit("gen"), F.col("n_nationkey"))),
                *_HEX_TO_ACGT,
            ),
            320,
        ).alias("seq"),
    )
    return gr(gene_list, genome)


def _gentamycin_sql() -> str:
    return """
WITH genome AS (
  SELECT 'acc' || n_nationkey::VARCHAR AS accession,
         repeat(translate(md5('gen' || n_nationkey::VARCHAR),
                          '0123456789abcdef', 'acgtacgtacgtacgt'),
                320) AS seq
  FROM nation WHERE n_nationkey < 3
),
gl AS (
  SELECT 'G' || o_orderkey::VARCHAR AS gene,
         'acc' || (o_orderkey % 3)::VARCHAR AS accession,
         (o_orderkey * 13 % 9500 + 1)::BIGINT AS "left",
         (o_orderkey * 13 % 9500 + 1 + o_orderkey % 200)::BIGINT
           AS "right",
         CASE WHEN o_orderkey % 2 = 1 THEN '-' ELSE '+' END AS direction
  FROM orders WHERE o_orderkey % 7 = 0
)
SELECT gl.gene, gl.accession, gl."left", gl."right", gl.direction,
       CASE WHEN gl.direction = '-'
            THEN reverse(translate(
                   substring(g.seq, gl."left"::INT,
                             (gl."right" - gl."left" + 1)::INT),
                   'acgt', 'tgca'))
            ELSE substring(g.seq, gl."left"::INT,
                           (gl."right" - gl."left" + 1)::INT)
       END AS sequence,
       gl.gene AS name
FROM gl JOIN genome g USING (accession)
"""


# ---------------------------------------------------------------------------
# Capped incremental CC — the SCALE path of the crawl-clustering loop,
# oracle-pinned (VERDICT r13 ask 6)
# ---------------------------------------------------------------------------


def cc_incremental_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cc_incremental_clusters`` with the hot-bucket cap ON — the
    production default path (uncapped pair-gen is the parity tier; the
    capped tier is what runs at 100 TB, and r13's soak paid 475x
    synthetic edge growth precisely because the parity query disables
    the cap). ``max_band_freq=2`` is chosen so the cap BITES at the
    driver's sf0.01 gate (max bucket size there is 3): the oracle
    reproduces the cap as a bucket-size HAVING filter, so a dropped
    bucket leaking pairs — or the cap dropping the wrong bucket — is an
    exact hash mismatch. Split/fold semantics identical to the uncapped
    twin (incremental ≡ full recompute on the CAPPED edge set)."""
    from ncbi_analysis_spark.operators import dedup as dd
    from ncbi_analysis_spark.operators.components import (
        connected_components,
        connected_components_incremental,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dd.minhash_lsh_pairs(
        d, "text", "doc_id", num_perm=4, bands=2, shingle_n=3,
        max_band_freq=2,
    ).localCheckpoint(eager=True)
    is_new = (F.col("id_a") + F.col("id_b")) % 3 == 0
    prior = connected_components(pairs.filter(~is_new))
    folded = connected_components_incremental(prior, pairs.filter(is_new))
    return folded.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def _cc_capped_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r3 import _shingles_sql

    return f"""
WITH RECURSIVE
shg AS (SELECT doc_id, {_shingles_sql()} AS sh FROM documents),
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
-- the hot-bucket cap: buckets of size > 2 are DROPPED (observably, on
-- the Spark side) before pair generation
ok AS (SELECT band, bh FROM bandrows
       GROUP BY band, bh HAVING count(*) > 1 AND count(*) <= 2),
pairs AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
          FROM bandrows a
          JOIN ok ON ok.band = a.band AND ok.bh = a.bh
          JOIN bandrows b
            ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
edges AS (SELECT ida AS u, idb AS v FROM pairs
          UNION SELECT idb, ida FROM pairs),
reach AS (
  SELECT u AS id, u AS r FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u AS id, reach.r AS r FROM edges e JOIN reach ON e.v = reach.id
)
SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
"""


def s10_pubmed_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``pubmed_count.tsv`` report twin
    (sources/enrichment.py::pubmed_count_report; reference
    run_search_count.py:61-67): S10's per-(gene, keyword) count dim
    pivoted to one row per gene over the FIXED keyword list, missing
    pages reading 'Error' (the failed-download cell). Completes the
    run_search_count parity beyond the s10_pubmed_dim extraction."""
    from ncbi_analysis_spark.plans.driver_queries_r5 import _FIXTURES
    from ncbi_analysis_spark.sources.enrichment import (
        pubmed_count_dim,
        pubmed_count_report,
    )

    pages = spark.read.json(f"{_FIXTURES}/driver_s10_pubmed.jsonl")
    return pubmed_count_report(pubmed_count_dim(pages.select("key", "page")))


def _s10_report_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r5 import S10_SQL

    return f"""
WITH dim AS ({S10_SQL})
SELECT gene,
  coalesce(max(CASE WHEN keyword = 'drug' THEN count_raw END),
           'Error') AS drug,
  coalesce(max(CASE WHEN keyword = 'Kanamycin_B' THEN count_raw END),
           'Error') AS kanamycin_b,
  coalesce(max(CASE WHEN keyword = 'aminoglycoside' THEN count_raw END),
           'Error') AS aminoglycoside,
  coalesce(max(CASE WHEN keyword = 'antibiotic' THEN count_raw END),
           'Error') AS antibiotic,
  coalesce(max(CASE WHEN keyword = 'biofilm' THEN count_raw END),
           'Error') AS biofilm
FROM dim GROUP BY gene
"""


# ---------------------------------------------------------------------------
# BPE decode round-trip — the shard reader's side of bpe_encode_ids
# ---------------------------------------------------------------------------


def bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-BPE DECODE round-trip (functions/bpe.py::bpe_decode —
    closing the encode→persist→READ-BACK loop): train 120 merges,
    encode every document, decode the id sequences, and compare
    against the encoder's own normalization (lowercase +
    whitespace-collapse). Exactly the no-<unk> documents must round
    -trip — so a decode bug (wrong inverse vocab, lost word boundary,
    wrong piece order) flips ``round_trip_ok`` rows and hash-fails
    against the oracle, which derives ``has_unk`` independently from
    the Spark-free local twin's word→ids table and predicts
    ``round_trip_ok = NOT has_unk``."""
    from ncbi_analysis_spark.functions.bpe import (
        bpe_decode,
        bpe_encode,
        train_bpe,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = train_bpe(d, "text", num_merges=120)
    # one planted doc with a character OUTSIDE the training alphabet
    # (the corpus' own alphabet is fully covered by 120 merges, so the
    # <unk>/lossy-round-trip leg would otherwise never fire)
    planted = d.unionByName(spark.createDataFrame(
        [(1_000_000, "zz\u00a7zz the")], "doc_id long, text string"))
    enc = bpe_encode(planted, merges, "text")
    dec = bpe_decode(enc, merges)
    norm = F.regexp_replace(
        F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))),
        r"\s+", " ")
    return dec.select(
        "doc_id",
        F.size("token_ids").cast("long").alias("n_tokens"),
        F.array_contains("token_ids", 0).alias("has_unk"),
        (F.col("text_decoded") == norm).alias("round_trip_ok"),
    )


def _bpe_roundtrip_sql() -> str:
    import duckdb

    from ncbi_analysis_spark.functions.bpe import (
        bpe_batch_encoder,
        bpe_train_local,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import _oracle_sf_dir

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

    # the planted out-of-alphabet word rides the same literal table
    words = sorted(set(words) | {"zz\u00a7zz", "the"})
    vals = ", ".join(
        f"({q(w)}, {len(ids)}, {1 if 0 in ids else 0})"
        for w, ids in ((w, enc([w])[0]) for w in words)
    )
    return rf"""
WITH d AS (SELECT doc_id, text FROM documents
           UNION ALL SELECT 1000000, 'zz' || chr(167) || 'zz the'),
enc(w, n, unk) AS (VALUES {vals}),
ws AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(COALESCE(text, ''))),
                                        '\s+'), x -> x <> '') AS l
  FROM d
),
wrow AS (
  SELECT doc_id, UNNEST(l) AS w FROM ws
),
agg AS (
  SELECT wrow.doc_id,
         SUM(e.n)::BIGINT AS n_tokens,
         MAX(e.unk) AS has_unk
  FROM wrow JOIN enc e ON wrow.w = e.w
  GROUP BY wrow.doc_id
)
SELECT d.doc_id,
       COALESCE(agg.n_tokens, 0)::BIGINT AS n_tokens,
       COALESCE(agg.has_unk, 0) = 1 AS has_unk,
       COALESCE(agg.has_unk, 0) = 0 AS round_trip_ok
FROM d LEFT JOIN agg USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Key-skew diagnostic report
# ---------------------------------------------------------------------------


def skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic (operators/scale.py::key_skew_report): the
    20 heaviest users in the events table with exact counts,
    integer-ppm share, and the salt factor for a 1000-rows-per-task
    target (small so the salt column varies in the fixture) — the
    measure-before-salting step in front of salted_join. Oracle: plain
    count/rank/div recompute."""
    from ncbi_analysis_spark.operators.scale import key_skew_report
    from ncbi_analysis_spark.sources.events import read_events

    e = read_events(spark, f"{sf_dir}/events.parquet")
    return key_skew_report(e, ["user_id"], top_n=20,
                           target_rows_per_task=1000)


_SKEW_SQL = """
WITH c AS (
  SELECT user_id, count(*)::BIGINT AS n_rows FROM events GROUP BY user_id
),
t AS (SELECT sum(n_rows)::BIGINT AS total FROM c)
SELECT user_id, n_rows,
       (n_rows * 1000000) // t.total AS share_ppm,
       (n_rows + 999) // 1000 AS recommended_salt
FROM c CROSS JOIN t
ORDER BY n_rows DESC, user_id ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# Partition-versioned labels artifact — the billions-of-nodes fold
# ---------------------------------------------------------------------------


def cc_labels_parted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-versioned component-labels artifact end-to-end
    (operators/components.py::write_cc_labels_parted/
    fold_into_cc_labels_parted/read_cc_labels_parted — the flat
    artifact upgraded so a fold rewrites ONLY partitions containing
    touched ids, committed by one atomic manifest rename): history
    edges clustered and written across 16 hash partitions, two edge
    batches folded in place, the artifact read back through the
    manifest. Must equal the full recursive-CTE recompute over all
    edges — the layout (partitioning, per-partition versions, the
    manifest cut) is invisible to the oracle BY DESIGN: a fold that
    loses a partition, a torn manifest, or a stale-prior rewrite all
    hash-mismatch. Shares the flat twin's SQL."""
    import shutil
    import tempfile

    from ncbi_analysis_spark.operators import dedup as dd
    from ncbi_analysis_spark.operators.components import (
        fold_into_cc_labels_parted,
        read_cc_labels_parted,
        write_cc_labels_parted,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dd.minhash_lsh_pairs(
        d, "text", "doc_id", num_perm=4, bands=2, shingle_n=3,
        max_band_freq=None,
    ).localCheckpoint(eager=True)
    bucket = (F.col("id_a") + F.col("id_b")) % 3

    tmp = tempfile.mkdtemp(prefix="cc_labels_parted_")
    try:
        path = f"{tmp}/labels"
        write_cc_labels_parted(pairs.filter(bucket == 0), path,
                               n_parts=16)
        fold_into_cc_labels_parted(pairs.filter(bucket == 1), path)
        fold_into_cc_labels_parted(pairs.filter(bucket == 2), path)
        out = read_cc_labels_parted(spark, path).select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"))
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _cc_parted_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r3 import _dup_clusters_sql

    return _dup_clusters_sql()


def queries_r14() -> dict:
    return {
        "genes_near_range": genes_near_range,
        "gentamycin_report": gentamycin_report,
        "cc_incremental_capped": cc_incremental_capped,
        "s10_pubmed_report": s10_pubmed_report,
        "bpe_roundtrip": bpe_roundtrip,
        "skew_report_events": skew_report_events,
        "cc_labels_parted": cc_labels_parted,
    }


def oracle_sql_r14() -> dict[str, str]:
    return {
        "genes_near_range": _genes_near_range_sql(),
        "gentamycin_report": _gentamycin_sql(),
        "cc_incremental_capped": _cc_capped_sql(),
        "s10_pubmed_report": _s10_report_sql(),
        "bpe_roundtrip": _bpe_roundtrip_sql(),
        "skew_report_events": _SKEW_SQL,
        "cc_labels_parted": _cc_parted_sql(),
    }
