"""End-to-end pipeline composition tests (SURVEY.md §3.2 shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ncbi_analysis_spark.plans import pipelines


def _genes(spark):
    return spark.createDataFrame(
        [("acc", 10, 50, "+", "gA"), ("acc", 60, 95, "-", "gB"),
         ("acc", 130, 150, "+", "gC")],
        ["accession", "left", "right", "strand", "gene"],
    )


def _genome(spark):
    seq = "".join("acgt"[i % 4] for i in range(200))
    return spark.createDataFrame([("acc", seq)], ["accession", "seq"])


def test_cluster_sequences(spark):
    df = spark.createDataFrame(
        [(1, "1", "AAGG"), (2, "2", "aagg"), (3, "3", "CCTT")],
        ["record_no", "gene_no", "seq_align"],
    )
    out = {r["seq_key"]: r for r in pipelines.cluster_sequences(df).collect()}
    assert out["AAGG"]["cluster_size"] == 2 and out["AAGG"]["members"] == "1,2"


def test_aucg_filter_report(spark):
    df = spark.createDataFrame(
        [(1, "1", "AUCG"), (2, "2", "AUXG")], ["record_no", "gene_no", "seq_target"]
    )
    rows = {r["record_no"]: r for r in pipelines.aucg_filter_report(df).collect()}
    assert rows[1]["aucg_only"] is True and rows[1]["offending_chars"] is None
    assert rows[2]["aucg_only"] is False and rows[2]["offending_chars"] == ["X"]


def test_neighbor_analysis(spark):
    matches = spark.createDataFrame(
        [("acc", 100, 110)], ["accession", "left", "right"]
    )
    out = pipelines.neighbor_analysis(matches, _genes(spark)).collect()[0]
    assert out["left_gene"] == "gB" and out["right_gene"] == "gC"
    assert out["overlap_genes"] is None  # nothing overlaps 100-110


def test_neighbor_analysis_overlap(spark):
    matches = spark.createDataFrame([("acc", 40, 70)], ["accession", "left", "right"])
    out = pipelines.neighbor_analysis(matches, _genes(spark)).collect()[0]
    assert out["overlap_genes"] == "gA,gB"


def test_extract_gene_sequences(spark):
    q = spark.createDataFrame([("gA",), ("nope",)], ["gene"])
    hits, missing = pipelines.extract_gene_sequences(q, _genes(spark), _genome(spark))
    h = hits.collect()[0]
    seq = _genome(spark).collect()[0]["seq"]
    assert h["sequence"] == seq[9:50]  # 1-based inclusive slice
    assert missing.collect()[0]["gene"] == "nope"


def test_flanking_regions_strands(spark):
    q = spark.createDataFrame([("gA",), ("gB",)], ["gene"])
    out = {r["gene"]: r for r in
           pipelines.flanking_regions(q, _genes(spark), _genome(spark), limit=5).collect()}
    seq = _genome(spark).collect()[0]["seq"]
    # forward strand: plain slices
    assert out["gA"]["upstream"] == seq[4:9]
    assert out["gA"]["downstream"] == seq[50:55]
    # reverse strand: swapped + revcomp (gene_stream_analysis.py:30-45)
    import re

    def rc(s):
        return s[::-1].translate(str.maketrans("acgt", "tgca"))

    assert out["gB"]["upstream"] == rc(seq[95:100])
    assert out["gB"]["downstream"] == rc(seq[54:59])


def test_enrich_genes(spark):
    eco = spark.createDataFrame([("gA", "EG1", "prod")], ["gene", "ecocyc_id", "product"])
    out = pipelines.enrich_genes(_genes(spark), ecocyc_records=eco).collect()
    byg = {r["gene"]: r for r in out}
    assert byg["gA"]["ecocyc_id"] == "EG1"
    assert byg["gB"]["ecocyc_id"] is None
