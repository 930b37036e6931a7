"""Source reader tests on synthetic fixtures mirroring the reference's
input formats (SURVEY.md §2.1 S1-S4)."""

from __future__ import annotations

import textwrap

from ncbi_analysis_spark.sources import cluster_blocks, ecocyc, fasta, genbank

GENBANK_TEXT = textwrap.dedent("""\
    LOCUS       NC_TEST              120 bp    DNA     circular CON 01-JAN-2020
    DEFINITION  Test genome.
    SOURCE      Escherichia coli str. K-12 substr. Test
      ORGANISM  Escherichia coli
    FEATURES             Location/Qualifiers
         source          1..120
         gene            3..50
                         /gene="thrA"
                         /locus_tag="b0001"
                         /db_xref="GeneID:944742"
                         /db_xref="ASAP:ABE-0000006"
         gene            complement(60..100)
                         /gene="thrB"
                         /product="homoserine kinase
                         with continuation"
                         /codon_start=1
         gene            join(10..20,30..40)
                         /gene="badjoin"
    ORIGIN
            1 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt
           61 aaaaccccgg ggttttaaaa ccccggggtt ttaaaacccc ggggttttaa aaccccgggg
    //
    """)


def test_parse_genbank_semantics():
    acc, source, dna, genes = genbank.parse_genbank(GENBANK_TEXT)
    assert acc == "NC_TEST"
    assert source == "Escherichia coli str. K-12 substr. Test"
    assert len(dna) == 120 and dna.startswith("acgtacgtac")
    # join(...) locations are skipped like the reference
    assert [g["gene"] for g in genes] == ["thrA", "thrB"]
    thrA, thrB = genes
    assert (thrA["left"], thrA["right"], thrA["strand"]) == (3, 50, "+")
    assert thrA["gene_id"] == 944742
    assert thrA["xref"] == {"ASAP": "ABE-0000006"}
    assert (thrB["left"], thrB["right"], thrB["strand"]) == (60, 100, "-")
    # multi-line attribute continuation
    assert thrB["product"] == "homoserine kinase with continuation"
    assert thrB["codon_start"] == 1


def test_read_genbank_dataframes(spark, tmp_path):
    p = tmp_path / "test.gb"
    p.write_text(GENBANK_TEXT)
    genes = genbank.read_genbank_genes(spark, str(p)).collect()
    genome = genbank.read_genbank_genome(spark, str(p)).collect()
    assert {g["gene"] for g in genes} == {"thrA", "thrB"}
    assert genome[0]["accession"] == "NC_TEST" and len(genome[0]["seq"]) == 120


FASTA_TEXT = textwrap.dedent("""\
    >lcl|NZ_TEST.1_gene_1 [gene=alr] [locus_tag=AT1] [location=complement(10..40)] [gbkey=Gene]
    acgtacgtacgtacgt
    acgtacgtacgtacgt
    >lcl|NZ_TEST.1_gene_2 [locus_tag=AT2] [location=50..70] [gbkey=Gene]
    ttttccccggggaaaa
    """)


def test_fasta_reader(spark, tmp_path):
    p = tmp_path / "atcc.fasta"
    p.write_text(FASTA_TEXT)
    segs = fasta.read_fasta_segments(spark, str(p)).collect()
    assert len(segs) == 2
    s1, s2 = sorted(segs, key=lambda s: s["start"])
    assert (s1["gene"], s1["start"], s1["end"], s1["strand"]) == ("alr", 10, 40, "-")
    assert s1["sequence"] == "acgtacgtacgtacgt" * 2
    # missing gene attr falls back to Unknown:<locus_tag> like the reference
    assert s2["gene"] == "Unknown:AT2" and s2["strand"] == "+"


def test_fasta_record_roundtrip(spark, tmp_path):
    """S12 sink format: write_fasta -> read_fasta_records is lossless,
    including names containing '/' (greedy name match) and multi-line
    sequence bodies on the read side."""
    from ncbi_analysis_spark.sources.sinks import write_fasta

    df = spark.createDataFrame(
        [("geneA", 1, 16, "acgtacgtacgtacgt"), ("x/y", 40, 12, "ttttcccc")],
        ["name", "start", "end", "seq"],
    )
    out = str(tmp_path / "recs")
    write_fasta(df, out)
    back = {r["name"]: r for r in fasta.read_fasta_records(spark, out).collect()}
    assert (back["geneA"]["start"], back["geneA"]["end"],
            back["geneA"]["seq"]) == (1, 16, "acgtacgtacgtacgt")
    # reverse coords and slash-in-name survive
    assert (back["x/y"]["start"], back["x/y"]["end"], back["x/y"]["seq"]) == (40, 12, "ttttcccc")
    # hand-wrapped sequence lines concatenate
    p = tmp_path / "wrapped.fa"
    p.write_text(">w/1-8\nacgt\nacgt\n")
    rec = fasta.parse_fasta_records(p.read_text())
    assert rec == [{"name": "w", "start": 1, "end": 8, "seq": "acgtacgt"}]


ECOCYC_TSV = (
    "gene\tproduct\tpromoter_name\tpromoter_pos\tgene_start_pos\tmap_start_pos\tmap_end_pos\n"
    "thrL\tleader\tthrLp\t148\t190\t190\t255\n"
    "revG\trev product\t\t\t\t500\t400\n"
)


def test_ecocyc_reader(spark, tmp_path):
    p = tmp_path / "ecocyc.tsv"
    p.write_text(ECOCYC_TSV)
    records, inter = ecocyc.read_ecocyc(spark, str(p), output_promoter=True)
    recs = {r["gene"]: r for r in records.collect()}
    assert recs["revG"]["promoter_pos"] == -1  # '' -> -1 sentinel
    rows = inter.collect()
    # thrL gene + thrL promoter + revG gene; sorted by start
    assert [r["name"] for r in rows] == ["thrLp", "thrL", "revG"]
    prom = rows[0]
    assert (prom["is_gene"], prom["start"], prom["end"]) == (False, 148, 190)
    rev = rows[2]
    assert rev["direction"] == "<" and (rev["left"], rev["right"]) == (400, 500)


CLUSTER_TEXT = textwrap.dedent("""\
    >> block one
    comment line
    another
    (17) ?
    rna_tag 5 AUCG 8
    NZ_1 5 acgu 8
    NZ_1 5 ACGU 8

    >> block two
    x
    y
    (18) skipme
    rna_tag 1 AAAA 4
    NZ_2 1 cccc 4
    NZ_2 1 GGGG 4
    """)


def test_cluster_block_reader(spark, tmp_path):
    p = tmp_path / "clusters.fna"
    p.write_text(CLUSTER_TEXT)
    rows = cluster_blocks.read_cluster_blocks(spark, str(p), "rna_tag").collect()
    # block two fails the ?/! flag filter (P4)
    assert len(rows) == 1
    r = rows[0]
    assert r["gene_no"] == "17"
    assert (r["name"], r["start"], r["end"]) == ("NZ_1", 5, 8)
    assert (r["seq_rna"], r["seq_align"], r["seq_target"]) == ("AUCG", "acgu", "ACGU")


REF_ECOCYC = "/root/reference/data/rna_analysis/Ecocyc_NC_000913.txt"


def test_ecocyc_source_on_real_reference_data(spark):
    """Load the reference repo's actual Ecocyc table (read-only) and
    check the invariants its loader establishes
    (src/utils/ecocyc_data_loader.py:11-96): 4553 records; gene interval
    per record plus a promoter interval iff promoter_name is set (2643
    of them); inter_records globally sorted by start."""
    import os

    import pytest

    if not os.path.exists(REF_ECOCYC):
        pytest.skip("reference data not present")
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.sources import ecocyc

    recs = ecocyc.read_ecocyc_records(spark, REF_ECOCYC)
    assert recs.count() == 4553
    assert recs.filter(F.col("gene") == "thrL").count() == 1

    no_prom = ecocyc.explode_inter_records(recs, output_promoter=False)
    assert no_prom.count() == 4553
    with_prom = ecocyc.explode_inter_records(recs, output_promoter=True)
    assert with_prom.count() == 4553 + 2643

    starts = [r["start"] for r in with_prom.select("start").collect()]
    assert starts == sorted(starts)
    assert with_prom.filter(~F.col("is_gene")).count() == 2643


def test_fasta_windows_reader_matches_in_memory_split(spark, tmp_path):
    """read_fasta_windows must emit exactly the split_genome_windows
    layout — bounded-memory streaming, multi-record files, wrapped and
    mixed-case sequence lines, ragged final windows."""
    import random

    from ncbi_analysis_spark.plans.similarity_scan import split_genome_windows

    rnd = random.Random(23)
    g1 = "".join(rnd.choice("acgt") for _ in range(2377))
    g2 = "".join(rnd.choice("ACGT") for _ in range(991))  # upper -> lowered
    p = tmp_path / "genome.fa"
    with open(p, "w") as fh:
        fh.write(">chr1 Escherichia coli test\n")
        for i in range(0, len(g1), 70):
            fh.write(g1[i:i + 70] + "\n")
        fh.write("\n>chr2\n")
        for i in range(0, len(g2), 61):
            fh.write(g2[i:i + 61] + "\n")

    genome_df = spark.createDataFrame(
        [("chr1", g1), ("chr2", g2.lower())], ["accession", "seq"])
    for wsize in (256, 1000):
        want = sorted(map(tuple, split_genome_windows(genome_df, wsize).collect()))
        got = sorted(map(tuple, fasta.read_fasta_windows(
            spark, str(p), window_size=wsize).collect()))
        assert got == want, wsize


def test_fasta_windows_streaming_is_bounded(tmp_path):
    """The per-file iterator never buffers more than ~window_size chars:
    feed a record 50x the window and check every yielded window except
    the last is exactly window_size, offsets are contiguous, and the
    reassembly equals the input."""
    import random

    rnd = random.Random(29)
    g = "".join(rnd.choice("acgt") for _ in range(50 * 64 + 17))
    p = tmp_path / "big.fa"
    with open(p, "w") as fh:
        fh.write(">acc\n")
        for i in range(0, len(g), 80):
            fh.write(g[i:i + 80] + "\n")
    wins = list(fasta.iter_fasta_windows(str(p), 64))
    assert [w[2] for w in wins] == list(range(0, len(g), 64))
    assert all(len(w[3]) == 64 for w in wins[:-1])
    assert "".join(w[3] for w in wins) == g


def test_jsonl_quarantine_and_blank_lines(spark, tmp_path):
    """Malformed lines land verbatim in the quarantine frame (never
    dropped silently, never failing the job); blank lines are skipped
    like spark.read.json; well-formed lines parse typed."""
    from ncbi_analysis_spark.sources.jsonl import read_jsonl, split_quarantine

    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part.jsonl").write_text(
        '{"doc_id": 1, "text": "ok one", "lang": "en"}\n'
        "THIS IS NOT JSON\n"
        "\n"
        '{"doc_id": 2, "text": "ok two", "lang": "de"}\n'
        '{"doc_id": 3, "text": truncated\n'
    )
    back = read_jsonl(spark, str(p), "doc_id bigint, text string, lang string")
    clean, bad = split_quarantine(back)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    lines = sorted(r["raw_line"] for r in bad.collect())
    assert lines[0] == "THIS IS NOT JSON"
    assert lines[1].startswith('{"doc_id": 3')


def test_jsonl_roundtrip_escaping(spark, tmp_path):
    """Newlines, tabs, quotes, and unicode in text survive the jsonl
    round-trip byte-exactly; a missing optional field reads NULL (not
    quarantined — schema drift is data, not corruption)."""
    from ncbi_analysis_spark.sources.jsonl import (
        read_jsonl,
        split_quarantine,
        write_jsonl,
    )

    rows = [
        (1, 'line1\nline2\ttabbed "quoted" \\backslash', "en"),
        (2, "unicode: café 中文 \U0001f600", "zh"),
        (3, "", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "rt")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, "doc_id bigint, text string, lang string")
    clean, bad = split_quarantine(back)
    assert bad.count() == 0
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in clean.collect()}
    assert got == {i: (t, lg) for i, t, lg in rows}
    # gzip write round-trips too
    gz = str(tmp_path / "gz")
    write_jsonl(df, gz, compression="gzip")
    import glob
    assert glob.glob(f"{gz}/*.gz")
    back_gz, _ = split_quarantine(
        read_jsonl(spark, gz, "doc_id bigint, text string, lang string"))
    assert back_gz.count() == 3
    # schema drift: a line missing 'lang' parses with NULL lang
    drift = tmp_path / "drift"
    drift.mkdir()
    (drift / "d.jsonl").write_text('{"doc_id": 9, "text": "no lang"}\n')
    c2, b2 = split_quarantine(
        read_jsonl(spark, str(drift), "doc_id bigint, text string, lang string"))
    assert b2.count() == 0 and c2.first()["lang"] is None
