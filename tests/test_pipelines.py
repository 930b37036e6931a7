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


def test_nearby_genes_by_range_cases(spark):
    """Hand-computed parity pins for the position helper (reference
    gene_position_helper.py:18-43,93-117): single starter (A), multiple
    starters (B), flanking neighbors (C), cover preference, the
    homology-beats-include quirk (overstated overlap formula), and
    complement-WITHOUT-reversal on '-'."""
    from ncbi_analysis_spark.operators.genes import nearby_genes_by_range

    genes = spark.createDataFrame(
        [("g1", 100, 200, "acgt"), ("g2", 300, 400, "ggcc"),
         ("g3", 350, 550, "ttaa")],
        "gene string, gene_left long, gene_right long, sequence string")
    ranges = spark.createDataFrame(
        [("A", 250, 320, "+"),    # one starter -> g2, related
         ("B", 250, 360, "+"),    # two starters -> g2+g3, both related
         ("HIT", 300, 400, "+"),  # covers+exact -> g2 only, hit
         ("C", 210, 290, "+"),    # no starter -> flanks g1+g2, related
         ("COV", 120, 180, "-"),  # covered by g1 -> g1 only; quirk:
                                  # ov=81 (not 61) -> 132% -> homology
         ],
        "range_id string, left long, right long, direction string")
    got = {
        (r["range_id"], r["gene"]): (r["type"], r["sequence"])
        for r in nearby_genes_by_range(ranges, genes).collect()
    }
    assert got == {
        ("A", "g2"): ("related", "ggcc"),
        ("B", "g2"): ("related", "ggcc"),
        ("B", "g3"): ("related", "ttaa"),
        ("HIT", "g2"): ("hit", "ggcc"),
        ("C", "g1"): ("related", "acgt"),
        ("C", "g2"): ("related", "ggcc"),
        # '-' complements WITHOUT reversing (generate_result quirk)
        ("COV", "g1"): ("homology", "tgca"),
    }


def test_gentamycin_report_strand_extract(spark):
    """NCBI-mode gentamycin: 1-based inclusive slice; '-' is the full
    reverse complement (get_opposite_dna(seq[::-1]))."""
    from ncbi_analysis_spark.plans.pipelines import gentamycin_report

    genome = spark.createDataFrame(
        [("x", "aacctggtt")], "accession string, seq string")
    gl = spark.createDataFrame(
        [("P", "x:2-5(+)"), ("M", "x:2-5(-)")],
        "gene string, locus string")
    got = {r["gene"]: (r["sequence"], r["name"], r["left"], r["right"])
           for r in gentamycin_report(gl, genome).collect()}
    assert got == {"P": ("acct", "P", 2, 5),
                   "M": ("aggt", "M", 2, 5)}
