"""S13 alignment rendering + full match report (reference
render_similarity_for_candidates, gene_similarity_match.py:113-155,
237-256). The render triples themselves are reference-golden-tested in
test_similarity_goldens.py; here we verify the Spark plumbing — window
extraction on the scoring strand, per-scorer render columns, and the
report sink's byte format round-tripping through the legacy parser.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.plans.similarity_scan import render_candidates, similarity_scan
from ncbi_analysis_spark.similarity.scorers import (
    consistency_render_triple,
    direct_render,
    text_edit_render,
)
from ncbi_analysis_spark.sources import legacy_blocks, sinks

random.seed(77)
GENOME = "".join(random.choice("acgt") for _ in range(2000))
QUERIES = [("geneA", "acgtacgtta"), ("geneB", "ttgacagcta")]
WEIGHTS = {"direct": 1.0, "consistency": 2.0, "text_edit": 1.0}
SCORERS = list(WEIGHTS)


def revcomp_py(s: str) -> str:
    return s[::-1].translate(str.maketrans("acgt", "tgca"))


@pytest.fixture(scope="module")
def rendered(spark):
    genome = spark.createDataFrame([("acc1", GENOME)], "accession string, seq string")
    queries = spark.createDataFrame(QUERIES, "name string, gene string")
    hits = similarity_scan(genome, queries, WEIGHTS, top_k=4, candidate_distance=3,
                           chunk_size=512)
    return render_candidates(hits, genome, queries, SCORERS).collect()


def test_render_columns_match_kernels(rendered):
    """Each candidate's triples equal the kernels run on the window the
    reference would render: the scoring strand at the candidate offset."""
    assert len(rendered) > 0
    by_name = {}
    for r in rendered:
        by_name.setdefault(r["name"], []).append(r)
    assert set(by_name) == {"geneA", "geneB"}
    gene_of = dict(QUERIES)
    for r in rendered:
        gene = gene_of[r["name"]]
        db = GENOME if r["strand"] == "+" else revcomp_py(GENOME)
        window = db[r["offset"]: r["offset"] + len(gene) + 16]
        assert list(r["direct_render"]) == list(direct_render(gene, window))
        assert list(r["consistency_render"]) == list(
            consistency_render_triple(gene, window, patience=2))
        assert list(r["text_edit_render"]) == list(text_edit_render(gene, window))
        # gene_format of the direct renderer is the gene itself
        assert r["direct_render"][0] == gene


def test_match_report_roundtrip(spark, rendered, tmp_path):
    genome = spark.createDataFrame([("acc1", GENOME)], "accession string, seq string")
    queries = spark.createDataFrame(QUERIES, "name string, gene string")
    hits = similarity_scan(genome, queries, WEIGHTS, top_k=4, candidate_distance=3,
                           chunk_size=512)
    df = render_candidates(hits, genome, queries, SCORERS)
    out = str(tmp_path / "report")
    sinks.write_match_report(df, out, SCORERS, data_name="test_data")

    back = legacy_blocks.read_match_blocks(spark, out + "/part*").collect()
    assert len(back) == len(rendered)
    gene_of = dict(QUERIES)
    seen_idx = {}
    for row in back:
        assert row["name"] == "test_data"
        attrs = row["attrs"]
        # reference header set: name/direction/weighted + per-scorer
        # similarities (textedit label has no underscore) + original
        assert {"name", "direction", "weighted_similarity", "direct_similarity",
                "consistency_similarity", "textedit_similarity",
                "original      :"} <= set(attrs)
        gene = gene_of[attrs["name"]]
        assert attrs["original      :"] == gene
        assert attrs["direction"] in {"+", "-"}
        assert (attrs["direction"] == "+") == (row["start"] <= row["end"])
        # render triple per scorer, enum-ordered keys present
        for lbl in ("textedit", "direct", "consistency"):
            for fmt in ("gene_format   :", "target_format :", "match_format  :"):
                assert f"{lbl}_{fmt}" in attrs, (lbl, fmt)
            assert len(attrs[f"{lbl}_match_format  :"]) >= len(gene) - 2
        # direct render echoes the gene
        assert attrs["direct_gene_format   :"] == gene
        seen_idx.setdefault(attrs["name"], 0)

    # numbering restarts per gene: the report text contains "(1)" twice
    import glob
    text = "".join(open(p).read() for p in glob.glob(out + "/part*"))
    assert text.count("(1)\n") == 2
    # blocks are blank-line separated like the reference report
    assert "\n\n(" in text or text.count("\n\n") >= len(back)


def _report_scores_in_block_order(out_dir):
    """(block_idx, weighted_similarity) pairs in file order."""
    import glob
    import re

    text = "".join(open(p).read() for p in sorted(glob.glob(out_dir + "/part*")))
    pairs = []
    idx = None
    for line in text.splitlines():
        if m := re.fullmatch(r"\((\d+)\)", line.strip()):
            idx = int(m.group(1))
        elif m := re.search(r"weighted_similarity=(-?\d+\.?\d*)", line):
            pairs.append((idx, float(m.group(1))))
    return pairs


def test_match_report_ascending_numbering(spark, tmp_path):
    """W4 polarity in the sink (reference OrderType.Increment sorts by
    the negated score): ascending=True must number blocks raw-score
    ascending — with mixed-sign scores the descending numbering would be
    exactly reversed."""
    rows = [
        ("geneA", "acc1", "+", 10, 11, 20, -3.5, "g", 1.0),
        ("geneA", "acc1", "+", 50, 51, 60, 2.0, "g", 1.0),
        ("geneA", "acc1", "+", 90, 91, 100, -0.5, "g", 1.0),
    ]
    df = spark.createDataFrame(rows, [
        "name", "accession", "strand", "offset", "start", "end",
        "weighted_similarity", "gene", "direct_similarity",
    ]).withColumn("direct_render", F.array(F.col("gene"), F.col("gene"), F.col("gene")))
    asc_dir, desc_dir = str(tmp_path / "asc"), str(tmp_path / "desc")
    sinks.write_match_report(df, asc_dir, ["direct"], data_name="d", ascending=True)
    sinks.write_match_report(df, desc_dir, ["direct"], data_name="d")
    asc = sorted(_report_scores_in_block_order(asc_dir))
    desc = sorted(_report_scores_in_block_order(desc_dir))
    assert [s for _, s in asc] == [-3.5, -0.5, 2.0]       # block 1 = worst raw
    assert [s for _, s in desc] == [2.0, -0.5, -3.5]      # block 1 = best raw
