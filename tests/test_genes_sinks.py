"""Tests for gene-position operators (J7/F13/F16/F17) and sinks (S11-S13)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import genes as gops
from ncbi_analysis_spark.sources import sinks


def test_cover_preference_join(spark):
    ranges = spark.createDataFrame(
        [("acc", 20, 30), ("acc", 5, 100)], ["accession", "left", "right"]
    )
    gene_tbl = spark.createDataFrame(
        [("acc", 10, 50, "cover_me"), ("acc", 25, 40, "partial"), ("acc", 60, 90, "far")],
        ["accession", "left", "right", "gene"],
    )
    out = gops.cover_preference_join(ranges, gene_tbl, ["accession"])
    by_range = {}
    for r in out.collect():
        by_range.setdefault((r["left"], r["right"]), set()).add(r["gene"])
    # 20-30 is covered by cover_me -> only covering gene survives
    assert by_range[(20, 30)] == {"cover_me"}
    # 5-100 covered by nobody -> all overlapping genes
    assert by_range[(5, 100)] == {"cover_me", "partial", "far"}


def test_select_promoter_direction_aware(spark):
    gene_tbl = spark.createDataFrame(
        [("acc", "gF", "+", 100), ("acc", "gR", "-", 200)],
        ["accession", "gene", "strand", "start"],
    )
    proms = spark.createDataFrame(
        [("acc", "+", 90, "pF"), ("acc", "+", 150, "pLate"),
         ("acc", "-", 230, "pR"), ("acc", "-", 150, "pEarly")],
        ["accession", "strand", "pos", "promoter"],
    )
    out = {r["gene"]: r for r in gops.select_promoter(gene_tbl, proms, ["accession"]).collect()}
    assert out["gF"]["promoter"] == "pF"      # nearest at/before start on +
    assert out["gR"]["promoter"] == "pR"      # nearest at/after start on -


def test_direction_glyphs(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    g = df.select(
        gops.direction_glyphs(
            F.lit(10), F.lit(14), F.lit(10), F.lit(19), F.lit("+")
        ).alias("g")
    ).collect()[0]["g"]
    assert len(g) == 10
    assert g == "*****>>>>>"  # first half overlapped -> starred


def test_random_split_triples(spark):
    df = spark.createDataFrame([(100.0,), (250.0,)], ["target"])
    out = gops.random_split_triples(df, "target", seed=1).collect()
    for r in out:
        assert abs(r["v1"] + r["v2"] + r["v3"] - 3 * r["target"]) < 1e-9
        assert 0.975 * r["target"] <= r["v1"] <= 1.025 * r["target"]


def test_tsv_and_fasta_sinks(spark, tmp_path):
    df = spark.createDataFrame([("g1", 5, 9, "AUCG")], ["name", "start", "end", "seq"])
    tsv_dir = str(tmp_path / "tsv")
    sinks.write_tsv(df, tsv_dir)
    content = "".join(open(f).read() for f in glob.glob(f"{tsv_dir}/*.csv"))
    assert "name\tstart\tend\tseq" in content and "g1\t5\t9\tAUCG" in content

    fasta_dir = str(tmp_path / "fasta")
    sinks.write_fasta(df, fasta_dir)
    content = "".join(open(f).read() for f in glob.glob(f"{fasta_dir}/part*"))
    assert ">g1/5-9\nAUCG" in content


def test_match_block_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [("q1", 11, 20, 7.5), ("q2", 30, 21, 3.25)],
        ["name", "start", "end", "weighted_similarity"],
    )
    out_dir = str(tmp_path / "blocks")
    sinks.write_match_blocks(df, out_dir)
    content = "".join(open(f).read() for f in glob.glob(f"{out_dir}/part*"))
    assert ">q1/11-20\tdirection=>" in content
    assert ">q2/30-21\tdirection=<" in content
