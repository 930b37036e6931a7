"""Edge-case robustness: empty inputs, degenerate strings, single rows.

These mirror failure modes the reference handles with ad-hoc guards (or
crashes on); the engine must return empty/identity results, not throw.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ncbi_analysis_spark.operators import asof, cluster, dedup, distribution, intervals
from ncbi_analysis_spark.operators.suppression import local_max_suppress
from ncbi_analysis_spark.operators.topk import topk_per_group
from ncbi_analysis_spark.similarity.scorers import (
    consistency_score,
    direct_score,
    text_edit_score,
)


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_empty_topk_suppress_distribution(spark):
    df = _empty(spark, "g string, id long, score double")
    assert topk_per_group(df, ["g"], [F.desc("score")], 3).count() == 0
    assert local_max_suppress(df, ["g"], "id", "score", 5).count() == 0
    assert distribution.value_distribution(df, ["g"]).count() == 0


def test_empty_joins(spark):
    probe = _empty(spark, "k long, t long")
    build = spark.createDataFrame([(1, 5, "x")], ["k", "bt", "v"])
    assert asof.asof_join(probe, build, ["k"], "t", "bt", ["v"]).count() == 0
    left = _empty(spark, "ls long, le long")
    right = spark.createDataFrame([(1, 5)], ["rs", "re"])
    assert intervals.interval_join_binned(left, right, "ls", "le", "rs", "re").count() == 0


def test_dedup_on_empty_and_single(spark):
    df = _empty(spark, "id long, text string")
    assert dedup.exact_dedup(df, "text", "id").count() == 0
    assert dedup.minhash_lsh_pairs(df, "text", "id", num_perm=4, bands=2).count() == 0
    one = spark.createDataFrame([(1, "only one document here")], ["id", "text"])
    assert dedup.exact_dedup(one, "text", "id").count() == 1
    assert dedup.ngram_jaccard_pairs(one, "text", "id").count() == 0


def test_scorers_degenerate_strings(spark):
    assert direct_score("", "") == 0.0
    assert consistency_score("", "", 2) == 0.0
    assert text_edit_score("", "", None) == 0.0
    assert text_edit_score("a", "a", 1) == 1.0
    # window shorter than gene: positional functions just stop early
    assert direct_score("acgt", "ac") == 2.0


def test_single_char_and_whitespace_text(spark):
    from ncbi_analysis_spark.functions import text as textf

    df = spark.createDataFrame([(1, "x"), (2, "   "), (3, "")], ["id", "text"])
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            textf.token_count(F.col("text")).alias("tc"),
            textf.lang_id(F.col("text")).alias("lang"),
            textf.simhash32(F.col("text")).alias("sh"),
        ).collect()
    }
    assert rows[1]["tc"] == 1 and rows[2]["tc"] == 0 and rows[3]["tc"] == 0
    assert rows[2]["lang"] == "und"
    assert rows[3]["sh"] is not None


def test_gap_regions_single_interval(spark):
    df = spark.createDataFrame([("a", 10, 20)], ["acc", "s", "e"])
    assert intervals.gap_regions(df, ["acc"], "s", "e").count() == 0


def test_cluster_single_row(spark):
    df = spark.createDataFrame([("AA", 7)], ["seq", "no"])
    row = cluster.cluster_by_key(df, F.col("seq"), F.col("no")).collect()[0]
    assert row["cluster_size"] == 1 and row["members"] == "7"


def test_decon_empty_benchmark(spark):
    from ncbi_analysis_spark.operators import dedup as dd

    docs = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    bench = spark.createDataFrame([], "doc_id LONG, text STRING")
    row = dd.benchmark_ngram_overlap(docs, bench, "text", "doc_id", 3).collect()[0]
    assert row["n_shared"] == 0 and row["contamination"] == 0.0


def test_char_window_dup_short_docs_dropped(spark):
    from ncbi_analysis_spark.operators import dedup as dd

    docs = spark.createDataFrame([(1, "short"), (2, "short")], ["doc_id", "text"])
    assert dd.char_window_dup_pairs(docs, "text", "doc_id", window=32).count() == 0


def test_curation_empty_corpus(spark):
    from ncbi_analysis_spark.plans.curation import curate_corpus

    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    bench = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    assert curate_corpus(empty, bench).count() == 0


def test_hash_split_single_class_weights(spark):
    from ncbi_analysis_spark.operators.scale import hash_split

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    rows = hash_split(df, "doc_id", {"all": 1.0}).collect()
    assert all(r["split"] == "all" for r in rows)


def test_pii_redact_null_text(spark):
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.functions.text import redact_pii

    df = spark.createDataFrame([(1, None)], "doc_id LONG, text STRING")
    assert df.select(redact_pii(F.col("text")).alias("r")).collect()[0]["r"] is None
