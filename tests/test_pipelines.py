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


def test_nearby_genes_by_range_fuzz_vs_reference_model(spark):
    """Parity fuzz: a direct Python port of the reference's control
    flow (find_first_greater_equal bisection + the three candidate
    cases + candidate-only cover scan + the quirky overlap classifier,
    gene_position_helper.py:18-117) over random gene dims and ranges,
    vs the Spark operator. The DuckDB oracle shares the operator's
    min-idx formulation; this model follows the REFERENCE's loops, so
    a formulation error can't hide in both."""
    import random

    from ncbi_analysis_spark.operators.genes import nearby_genes_by_range

    def ref_first_ge(lefts, pos):
        lo, hi = 0, len(lefts) - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if lefts[mid] < pos:
                lo = mid + 1
            else:
                hi = mid
        return hi if lefts[hi] >= pos else hi + 1

    def ref_type(rl, rr, gl, gr):
        if rl == gl and rr == gr:
            return "hit"
        if rr < gl or rl > gr:
            ov = 0
        elif rr < gr:
            ov = rr - gl + 1
        else:
            ov = gr - rl + 1
        if ov * 100.0 / (rr - rl + 1) >= 90.0:
            return "homology"
        if gl <= rl <= rr <= gr:
            return "include"
        return "related"

    def ref_expand(segs, rl, rr, direction):
        lefts = [s[1] for s in segs]
        lg = ref_first_ge(lefts, rl)
        rlt = ref_first_ge(lefts, rr) - 1
        if lg == rlt:
            cand = [lg]
        elif lg < rlt:
            cand = list(range(lg, rlt + 1))
        else:
            cand = [rlt, lg]
        cand = [i for i in cand if 0 <= i < len(segs)]  # engine clamps
        cov = next((i for i in cand
                    if segs[i][1] <= rl and segs[i][2] >= rr), None)
        keep = [cov] if cov is not None else cand
        out = set()
        for i in keep:
            g, gl, gr, seq = segs[i]
            if direction == "-":
                seq = seq.translate(str.maketrans("atcg", "tagc"))
            out.add((g, ref_type(rl, rr, gl, gr), seq))
        return out

    rng = random.Random(77)
    for trial in range(6):
        n_genes = rng.randint(3, 12)
        lefts = sorted(rng.sample(range(10, 3000), n_genes))
        segs = [(f"g{i}", lf, lf + rng.randint(1, 600),
                 "".join(rng.choice("acgt") for _ in range(8)))
                for i, lf in enumerate(lefts)]
        genes = spark.createDataFrame(
            segs, "gene string, gene_left long, gene_right long, "
                  "sequence string")
        ranges = []
        lo_bound, hi_bound = lefts[0] + 1, lefts[-1] - 1
        for j in range(40):
            a = rng.randint(lo_bound, hi_bound)
            b = min(a + rng.randint(0, 700), hi_bound)
            ranges.append((f"r{j}", a, b,
                           "-" if rng.random() < 0.5 else "+"))
        rdf = spark.createDataFrame(
            ranges, "range_id string, left long, right long, "
                    "direction string")
        got: dict = {}
        for r in nearby_genes_by_range(rdf, genes).collect():
            got.setdefault(r["range_id"], set()).add(
                (r["gene"], r["type"], r["sequence"]))
        for name, rl, rr, d in ranges:
            want = ref_expand(segs, rl, rr, d)
            assert got.get(name, set()) == want, (
                f"trial {trial} {name} [{rl},{rr}]{d}: "
                f"{got.get(name)} != {want}")


def test_extract_range_sequences_reference_golden(spark):
    """Replay tests/fixtures/range_extract_golden.json — the EXECUTED
    reference GeneExtract range mode (scripts/gen_range_extract_golden
    .py, src/analysis/gene_extract.py:57-86) — against the engine twin.
    Pins the quirks: forward [min..max-1] / reverse [min+1..max]
    windows, a==b reverse-empty, prefilled passthrough, non-int
    passthrough, revcomp reverse fill."""
    import json
    import os

    fx = json.load(open(os.path.join(
        os.path.dirname(__file__), "fixtures",
        "range_extract_golden.json")))
    genome = spark.createDataFrame(
        [("acc0", fx["dna"])], "accession string, seq string")
    rows = spark.createDataFrame(
        [tuple(r) for r in fx["input_rows"]],
        ", ".join(f"{h} string" for h in fx["headers"]))
    out = pipelines.extract_range_sequences(rows, genome, "start", "end")
    assert out.columns == fx["headers"]
    got = {r["name"]: [r[h] for h in fx["headers"]]
           for r in out.collect()}
    for want in fx["output_rows"]:
        assert got[want[0]] == want, (
            f"{want[0]}: {got[want[0]]} != {want}")
    assert len(got) == len(fx["output_rows"])


def test_extract_range_sequences_requires_sequence_column(spark):
    import pytest as _pytest

    genome = spark.createDataFrame([("a", "acgt")],
                                   "accession string, seq string")
    rows = spark.createDataFrame([("r", "1", "2")],
                                 "name string, start string, end string")
    with _pytest.raises(ValueError, match="sequence"):
        pipelines.extract_range_sequences(rows, genome, "start", "end")


def test_extract_range_sequences_multi_accession(spark):
    """The engine extension beyond the reference's single-genome shape:
    rows carrying `accession` key the genome join."""
    genome = spark.createDataFrame(
        [("a1", "acgtacgtac"), ("a2", "ttttggggcc")],
        "accession string, seq string")
    rows = spark.createDataFrame(
        [("r1", "a1", "", 2, 5), ("r2", "a2", "", 5, 2)],
        "name string, accession string, sequence string, "
        "start long, end long")
    got = {r["name"]: r["sequence"]
           for r in pipelines.extract_range_sequences(
               rows, genome, "start", "end").collect()}
    # fwd [2..4] of acgtacgtac = cgt; rev = revcomp("ttg" = [3..5] of
    # ttttggggcc) = caa
    assert got == {"r1": "cgt", "r2": "caa"}


def test_gentamycin_atcc_report_and_consistency(spark):
    """ATCC branch (reference src/analysis/gentamycin.py:44-75,
    evident-intent twin): DR rows expand via the position helper into
    related/hit + the tag->sequence JSON; non-DR rows get the empty
    triple; the consistency frame explodes the JSON into name-tag
    rows with the complement-without-reversal sequences."""
    import json

    from ncbi_analysis_spark.plans.pipelines import (
        gentamycin_consistency_atcc,
        gentamycin_report_atcc,
    )

    genes = spark.createDataFrame(
        [("g1", 100, 200, "acgt"), ("g2", 300, 400, "ggtt"),
         ("g3", 600, 700, "ccaa")],
        "gene string, gene_left long, gene_right long, sequence string")
    gl = spark.createDataFrame(
        [("DR1", "chr:100-200(+)"),   # exact hit of g1
         ("DR2", "chr:250-290(-)"),   # between g1 and g2 -> flanking
         ("G3", "chr:100-200(+)")],   # non-DR: untouched
        "Gene string, Locus string")
    rep = {r["Gene"]: r.asDict()
           for r in gentamycin_report_atcc(gl, genes).collect()}
    assert rep["DR1"]["hit"] == "g1"
    assert rep["DR1"]["related"] == ""
    assert json.loads(rep["DR1"]["sequence"]) == {"g1": "acgt"}
    assert rep["DR2"]["hit"] == ""
    assert rep["DR2"]["related"] == "g1,g2"
    # '-' range: complement WITHOUT reversal (the position helper's
    # generate_result quirk)
    assert json.loads(rep["DR2"]["sequence"]) == {"g1": "tgca", "g2": "ccaa"}
    assert (rep["G3"]["related"], rep["G3"]["hit"], rep["G3"]["sequence"]) \
        == ("", "", "")

    cons = {(r["name"], r["gene"]) for r in gentamycin_consistency_atcc(
        gentamycin_report_atcc(gl, genes)).collect()}
    assert cons == {("DR1-g1", "acgt"), ("DR2-g1", "tgca"),
                    ("DR2-g2", "ccaa")}


def test_nearby_genes_by_range_rejects_clashing_payload(spark):
    """A payload column colliding case-insensitively with the
    expansion's output ('Gene' vs 'gene') must fail fast with the fix,
    not AMBIGUOUS_REFERENCE mid-plan (the default-case-insensitive
    resolution trap both engines share)."""
    import pytest

    from ncbi_analysis_spark.operators.genes import nearby_genes_by_range

    genes = spark.createDataFrame(
        [("g1", 100, 200, "acgt")],
        "gene string, gene_left long, gene_right long, sequence string")
    ranges = spark.createDataFrame(
        [("DR1", 100, 200, "+")],
        "Gene string, left long, right long, direction string")
    with pytest.raises(ValueError, match="collide"):
        nearby_genes_by_range(ranges, genes, r_id="Gene")
