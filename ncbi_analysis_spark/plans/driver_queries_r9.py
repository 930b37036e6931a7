"""Round-9 driver-contract queries — STAGED, not yet wired into
``driver_queries._queries_in_build_order``.

The staged-query gate pattern (COVERAGE.md): queries built and
oracle-verified mid-round-8 stage here so round 8's driver gate keeps
its slots for the 14 newly-registered r8 entries; AT ROUND-9 START,
add ``**_r9().queries_r9(),`` / ``**_r9().oracle_sql_r9(),`` to the
build-order dicts in ``driver_queries`` (lazy ``_r9()`` helper like
``_r8()``'s) and re-run ``python scripts/check_oracle.py`` — rotation
then fronts these in the round-9 gate.

Until then the entries are held to the same bar out-of-band:
``tests/test_staged_r9.py`` replays each against its DuckDB oracle at
sf0.001 with the driver's own canonicalization, and
``scripts/check_oracle.py --staged`` runs them at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ann_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance end-to-end
    (operators/similarity_search.py::append_to_ivf_index): build the
    persisted index from 4/5 of the corpus, append the remaining fifth
    as a crawl-delta batch against the SAME frozen centroids, then
    search the appended index with partition-pruned probes. Because
    assignment depends only on the centroids, the appended index must
    equal a full rebuild — so this shares ann_ivf's oracle
    (driver_queries.ANN_IVF_SQL over the whole corpus): any drift
    between the append path and a rebuild hash-mismatches here."""
    from ncbi_analysis_spark.operators.similarity_search import (
        append_to_ivf_index,
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
    base = e.filter(F.col("vec_id") % 5 != 0)
    delta = e.filter(F.col("vec_id") % 5 == 0)

    path = _staging_dir("spark_graft_ivf_append")
    write_ivf_index(ivf_assign(base, cents), path, centroids=cents)
    append_to_ivf_index(delta, cents, path)
    index = read_ivf_index(spark, path)
    out = ivf_topk(e, q, cents, k=10, nprobe=2, assigned=index,
                   prefilter_partitions=True)
    return out.withColumn("rk", F.col("rk").cast("long"))


_LOCREP_FIXTURES = "/root/repo/tests/fixtures/location_report"


def location_report_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-2's composed formatting stage
    (plans/location_report.py::location_report — reference
    gene_location_analysis.py:307-419 + the stage-2 classification) on
    the committed reference-executed fixture: S5 match blocks ->
    bounded probe-window classification -> metadata join. The oracle is
    the GOLDEN TSV ITSELF (produced by executing the reference's stages
    2+3, scripts/gen_location_report_golden.py), read back by DuckDB —
    the strongest cross-check available for a presentation artifact:
    Spark must reproduce the reference's own output row-for-row."""
    from ncbi_analysis_spark.plans.location_report import (
        REPORT_HEADERS,
        location_report,
    )

    recs = location_report(
        spark, f"{_LOCREP_FIXTURES}/match_result.txt",
        f"{_LOCREP_FIXTURES}/ecocyc.txt")
    return recs.select(
        F.col("index").cast("long").alias("block_no"),
        *[F.coalesce(F.col(h).cast("string"), F.lit("")).alias(h)
          for h in REPORT_HEADERS if h != "index"],
    )


def _locrep_sql() -> str:
    from ncbi_analysis_spark.plans.location_report import REPORT_HEADERS

    cols = ", ".join(
        f"COALESCE(\"{h}\", '') AS {h}" for h in REPORT_HEADERS if h != "index"
    )
    return f"""
SELECT index::BIGINT AS block_no, {cols}
FROM read_csv('{_LOCREP_FIXTURES}/golden_format.tsv', delim='\t',
              header=true, all_varchar=true)
"""


def quantile_gate_autodegrade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter_by_quantile's on_overflow='approx' mode staying EXACT
    under the cap (operators/scale.py — the round-7 verdict ask): the
    HLL probe sees the rounded quality score's distinct count fits
    comfortably under max_distinct, takes the exact distinct-score
    cumulative path, and must therefore match the same discrete-quantile
    oracle as the default mode. A regression that degrades eagerly (or
    shifts the exact threshold) hash-mismatches here."""
    from ncbi_analysis_spark.functions import text as textf
    from ncbi_analysis_spark.operators.scale import filter_by_quantile

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.col("text")
    scored = d.select(
        "doc_id",
        F.round(textf.quality_score(t, textf.tokens(F.lower(t))), 6)
        .alias("quality"),
    )
    out = filter_by_quantile(scored, "quality", 0.75,
                             on_overflow="approx")
    return out.select("doc_id", "quality")


_stream_seq = 0


def stream_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming curation (streaming/events.py::
    curation_stream — the streaming twin of curation_v3's decon+quality
    prefix) through the gate: the corpus streamed file-source style,
    benchmark-colliding docs dropped in flight, survivors scored with
    the batch-trained quality classifier, all in one stateless
    transformation. min_prob=0 here because the sf0.001/sf0.01 score
    ranges don't overlap (no single non-trivial threshold exists at
    both scales; the gating filter is covered by the pytest parity
    tests) — the oracle composes the stream-fold scoring SQL with the
    decon SQL's flagged set, so both stages' values must be
    bit-identical."""
    import glob as _glob
    import os as _os
    import shutil
    import tempfile

    from ncbi_analysis_spark.operators.terms import quality_classifier_weights
    from ncbi_analysis_spark.plans.driver_queries_r8 import _QC_PARAMS
    from ncbi_analysis_spark.streaming.events import (
        curation_stream,
        run_to_memory,
    )

    global _stream_seq
    _stream_seq += 1
    name = f"drv_stream_curation_{_stream_seq}"

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("bench_id"), "text")
    w, bias = quality_classifier_weights(
        d.filter(F.col("lang") == "en"), d.filter(F.col("lang") != "en"),
        "text", "doc_id", **_QC_PARAMS)
    tmp = tempfile.mkdtemp(prefix="stream_curation_")
    try:
        stage = f"{tmp}/stage"
        # many-file staging for per-file task parallelism (the r8
        # stream-gate queries' measured finding: interpreted HOF row
        # work parallelizes by source file count)
        corpus.repartition(16).write.parquet(stage)
        src = f"{tmp}/src"
        _os.makedirs(src)
        for _i, _p in enumerate(sorted(_glob.glob(f"{stage}/part-*.parquet"))):
            shutil.copy(_p, f"{src}/docs{_i}.parquet")
        stream = spark.readStream.schema(corpus.schema).parquet(src)
        out = curation_stream(stream, bench, w, bias, min_prob=0.0,
                              num_perm=4, bands=2, **_QC_PARAMS)
        run_to_memory(out.select("doc_id", "n_feats", "prob"), name,
                      timeout_s=300)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(name)


def _stream_curation_sql() -> str:
    """Composition of the two oracled stream stages: the decon SQL's
    distinct flagged set anti-joined out of the %7 corpus, the
    survivors scored with the stream-fold scoring SQL (bit-identical
    fold order on both engines)."""
    from ncbi_analysis_spark.plans.driver_queries_r7 import _fuzzy_decon_sql
    from ncbi_analysis_spark.plans.driver_queries_r8 import (
        _stream_quality_gate_sql,
    )

    return f"""
WITH flagged AS (SELECT DISTINCT doc_id FROM ({_fuzzy_decon_sql()}) pairs),
scored AS ({_stream_quality_gate_sql()})
SELECT s.doc_id, s.n_feats, s.prob
FROM scored s
WHERE s.doc_id % 7 != 0
  AND s.doc_id NOT IN (SELECT doc_id FROM flagged)
"""


def bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable BPE tokenizer's merge table (functions/bpe.py::
    train_bpe — Sennrich et al. 2016): distributed word histogram +
    deterministic driver merge loop (lexicographic tie-break) over the
    documents corpus. The oracle embeds the Spark-free local twin's
    merges as literals (bpe_train_local reads the same parquet with
    pyarrow — the generated-oracle pattern of ann_ivf_trained), so the
    distributed trainer is checked rank-for-rank against a from-scratch
    single-node derivation."""
    from ncbi_analysis_spark.functions.bpe import train_bpe

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(d, "text", num_merges=120)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, lhs string, rhs string",
    )


def _bpe_vocab_sql() -> str:
    from ncbi_analysis_spark.functions.bpe import bpe_train_local
    from ncbi_analysis_spark.plans.driver_queries_r5 import _oracle_sf_dir

    merges = bpe_train_local(f"{_oracle_sf_dir()}/documents.parquet",
                             num_merges=120)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    vals = ", ".join(
        f"({i}, {q(a)}, {q(b)})" for i, (a, b) in enumerate(merges)
    )
    return (f"SELECT rank::BIGINT AS rank, lhs, rhs "
            f"FROM (VALUES {vals}) AS t(rank, lhs, rhs)")


def lsh_incremental_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted MinHash-LSH index crawl-ingest loop (operators/
    dedup.py::write_lsh_index/append_to_lsh_index/lsh_index_collisions
    — the fuzzy-dedup twin of ann_index_append): index built from part
    of the ingested corpus, the rest APPENDED (band rows are
    associative, so any write/append split yields the same index), then
    the new crawl batch (the %7 split) probed against it with the new
    side broadcast. The oracle is the recompute-everything fuzzy
    collision SQL with the pair roles flipped — the appended index must
    be indistinguishable from recomputing every old signature."""
    from ncbi_analysis_spark.operators.dedup import (
        append_to_lsh_index,
        lsh_index_collisions,
        read_lsh_index,
        write_lsh_index,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import _staging_dir

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = d.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    new = d.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    kw = dict(num_perm=4, bands=2, shingle_n=3)

    path = _staging_dir("spark_graft_lsh_index")
    write_lsh_index(old.filter(F.col("doc_id") % 5 != 0),
                    "text", "doc_id", path, **kw)
    append_to_lsh_index(old.filter(F.col("doc_id") % 5 == 0),
                        "text", "doc_id", path, **kw)
    index = read_lsh_index(spark, path)
    return lsh_index_collisions(new, index, "text", "doc_id", **kw)


def _lsh_incremental_sql() -> str:
    from ncbi_analysis_spark.plans.driver_queries_r7 import _fuzzy_decon_sql

    # _fuzzy_decon_sql emits (doc_id=old-corpus %7<>0, bench_id=%7=0)
    # collision pairs under the same 4-perm/2-band parameters; the
    # incremental probe's pair set is identical with the roles flipped
    return (f"SELECT bench_id AS doc_id, doc_id AS indexed_id "
            f"FROM ({_fuzzy_decon_sql()}) p")


def gopher_repetition_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate (Rae et al. 2021 table A1,
    functions/text.py::dup_word_frac/top_ngram_frac/mean_word_len):
    per-document word-repetition metrics — duplicate-word fraction,
    top bi-/tri-gram fraction, mean word length — and the composed
    repetition flag. The corpus here is single-line word streams, so
    the word-level rules are the meaningful subset of the paper's
    line/paragraph family. Scale shape: map-only, zero shuffle either
    way; ``repetition_metrics(engine='auto')`` picks the physical form —
    pure Column folds for oracle-sized inputs, the bit-identical
    Arrow-batched Counter twin past 1000 rows (the interpreted
    array_sort+fold HOFs were the most expensive bench shape at sf0.1;
    see SCALING.md round 9). The oracle recomputes the same metrics the
    classic way (lateral unnest + GROUP BY)."""
    from ncbi_analysis_spark.functions import text as textf

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = textf.repetition_metrics(d, text_col="text", keep=("doc_id",))
    m = m.select(
        "doc_id",
        *[F.round(F.col(c), 6).alias(c) for c in textf.REPETITION_METRIC_COLS],
    )
    flagged = (
        (F.col("dup_word_frac") > 0.65)
        | (F.col("top_bigram_frac") > 0.08)
        | (F.col("top_trigram_frac") > 0.18)
        | (F.col("mean_word_len") < 3.0)
        | (F.col("mean_word_len") > 10.0)
    )
    return m.withColumn("flagged", flagged.cast("long"))


_GOPHER_GATE_SQL = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS ws
  FROM documents
),
base AS (
  SELECT doc_id, ws, len(ws) AS n, len(list_distinct(ws)) AS nd,
         list_aggregate(list_transform(ws, x -> length(x)), 'sum') AS chars
  FROM w
),
g2 AS (SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
    FROM base, UNNEST(range(1, n)) AS t(i)) GROUP BY doc_id, g),
t2 AS (SELECT doc_id, MAX(c) AS mc, SUM(c) AS tc FROM g2 GROUP BY doc_id),
g3 AS (SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
    FROM base, UNNEST(range(1, n - 1)) AS t(i)) GROUP BY doc_id, g),
t3 AS (SELECT doc_id, MAX(c) AS mc, SUM(c) AS tc FROM g3 GROUP BY doc_id),
m AS (
  SELECT b.doc_id,
    ROUND(CASE WHEN n <= 0 THEN 0 ELSE 1.0 - nd * 1.0 / n END, 6) AS dup_word_frac,
    ROUND(COALESCE(t2.mc * 1.0 / t2.tc, 0), 6) AS top_bigram_frac,
    ROUND(COALESCE(t3.mc * 1.0 / t3.tc, 0), 6) AS top_trigram_frac,
    ROUND(CASE WHEN n <= 0 THEN 0 ELSE chars * 1.0 / n END, 6) AS mean_word_len
  FROM base b LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
)
SELECT *,
  CASE WHEN dup_word_frac > 0.65 OR top_bigram_frac > 0.08
         OR top_trigram_frac > 0.18
         OR mean_word_len < 3.0 OR mean_word_len > 10.0
       THEN 1 ELSE 0 END::BIGINT AS flagged
FROM m
"""


def queries_r9() -> dict:
    return {
        "ann_index_append": ann_index_append,
        "location_report_fixture": location_report_fixture,
        "quantile_gate_autodegrade": quantile_gate_autodegrade,
        "stream_curation": stream_curation,
        "bpe_vocab": bpe_vocab,
        "lsh_incremental_decon": lsh_incremental_decon,
        "gopher_repetition_gate": gopher_repetition_gate,
    }


def oracle_sql_r9() -> dict[str, str]:
    from ncbi_analysis_spark.plans import driver_queries as dq
    from ncbi_analysis_spark.plans import driver_queries_r8 as r8

    return {
        "ann_index_append": dq.ANN_IVF_SQL,
        "location_report_fixture": _locrep_sql(),
        # shares the exact discrete-quantile oracle with the default
        # mode's quality_quantile_gate (same workload, same threshold)
        "quantile_gate_autodegrade": r8._quality_quantile_sql(),
        "stream_curation": _stream_curation_sql(),
        "bpe_vocab": _bpe_vocab_sql(),
        "lsh_incremental_decon": _lsh_incremental_sql(),
        "gopher_repetition_gate": _GOPHER_GATE_SQL,
    }
