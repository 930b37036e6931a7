"""Generate tests/fixtures/location_report/ by EXECUTING the reference
pipeline-2/3 formatting stages on a deterministic fixture:

  stage 2 (src/analysis/gene_location_analysis.py::GeneLocationAnalysis)
    match-result file + Ecocyc annotation file -> location-result blocks
  stage 3 (gene_location_analysis.py:307-346 format_data_to_tsv +
    extract_consistency_record) -> the final consistency-record TSV

Committed outputs (replayed by tests/test_location_report.py without
the reference present):

  ecocyc.txt         — annotation fixture (EcocycDataLoader format)
  match_result.txt   — stage-1-style match blocks (S5 format)
  location_result.txt— reference stage-2 output (read by our S5b source)
  golden_format.tsv  — reference stage-3 output (the parity target)

The fixture exercises every interval status (5'/3'/cds/cover and
inter-genic), both strands, sense+antisense pairings, and a promoter
annotation row (whose gene-metadata lookup misses, leaving type/
exonic_gene_sizes/product empty — reference behavior).

Run once with /root/reference present; read-only on the reference.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REF = "/root/reference"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "location_report")

ECOCYC_HEADERS = [
    "gene", "product_type", "product", "promoter_name", "promoter_pos",
    "gene_start_pos", "map_start_pos", "map_end_pos", "exonic_gene_sizes",
    "type",
]

# (gene, product_type, product, promoter_name, promoter_pos,
#  gene_start_pos, map_start_pos, map_end_pos, exonic_gene_sizes, type)
# start > end encodes the reverse strand, as in the real Ecocyc dump.
ECOCYC_ROWS = [
    ("geneA", "p", "alpha protein", "", "", "", "200", "400", "201", "CDS"),
    ("geneB", "p", "beta protein", "", "", "", "700", "520", "181", "CDS"),
    ("geneC", "p", "gamma protein", "promC", "840", "900", "900", "1100",
     "201", "CDS"),
    ("geneD", "p", "delta protein", "", "", "", "1400", "1250", "151", "CDS"),
    ("geneE", "p", "epsilon protein", "", "", "", "1700", "1900", "201",
     "CDS"),
    ("geneF", "p", "zeta protein", "", "", "", "2300", "2150", "151", "CDS"),
    ("geneG", "p", "eta protein", "", "", "", "2600", "2800", "201", "CDS"),
]

# stage-1-style candidates: (start, end, gene_name, weighted, textedit,
# direct, consistency, target_seq). start > end = reverse-strand match.
MATCHES = [
    # inner on forward geneA -> sense cds
    (250, 300, "srnaA", "9.20", "5.00", "6.00", "7.00", "aauugg"),
    # inner on reverse geneB, forward match -> antisense? (rec '<',
    # match '>': differs -> 'sense cds' per the reference formula)
    (560, 640, "srnaB", "8.10", "4.00", "5.50", "6.00", "ccggau"),
    # reverse match inner on reverse geneB -> rec '<' == match '<'
    (650, 600, "srnaB2", "7.90", "4.10", "5.10", "6.20", "uuagcc"),
    # intersect-left of forward geneC (5' of geneC) + promoter window
    (850, 950, "srnaC", "7.50", "3.90", "5.00", "5.80", "ggccaa"),
    # cover of reverse geneD
    (1200, 1450, "srnaD", "7.10", "3.60", "4.70", "5.50", "acgacg"),
    # intersect-right of forward geneE (3' of geneE)
    (1850, 1950, "srnaE", "6.80", "3.30", "4.40", "5.20", "ugucau"),
    # inter-genic between geneE and geneF
    (1950, 2100, "srnaF", "6.40", "3.00", "4.10", "4.90", "gaugac"),
    # reverse match intersecting reverse geneF left edge
    (2190, 2120, "srnaG", "6.10", "2.80", "3.90", "4.60", "ccuagg"),
    # inter-genic before everything (nearest None, geneA)
    (40, 90, "srnaH", "5.70", "2.50", "3.60", "4.30", "aaccgg"),
]

SCORERS = ["textedit", "direct", "consistency"]


def write_fixture_inputs(ecocyc_path: str, match_path: str) -> None:
    with open(ecocyc_path, "w", encoding="utf8") as fw:
        fw.write("\t".join(ECOCYC_HEADERS) + "\n")
        for row in ECOCYC_ROWS:
            fw.write("\t".join(row) + "\n")
    blocks = []
    for i, (start, end, name, w, te, di, co, tgt) in enumerate(MATCHES, 1):
        gene = "acguacgu"
        attrs = [
            f"name={name}",
            "direction=+" if start <= end else "direction=-",
            f"weighted_similarity={w}",
            f"textedit_similarity={te}",
            f"direct_similarity={di}",
            f"consistency_similarity={co}",
            f"original      :={gene}",
        ]
        for s in SCORERS:
            attrs.append(f"{s}_gene_format   :={gene}")
            attrs.append(f"{s}_target_format :={tgt}")
            attrs.append(f"{s}_match_format  :=.**.*.")
        blocks.append("(%d)\n>NC_000913/%d-%d\t%s\n" % (
            i, start, end, ",".join(attrs)))
    with open(match_path, "w", encoding="utf8") as fw:
        fw.write("\n".join(blocks))


def main() -> int:
    if not os.path.isdir(os.path.join(REF, "src")):
        print("reference repo not present; goldens not regenerated",
              file=sys.stderr)
        return 1
    sys.path.insert(0, REF)
    from src.analysis.gene_location_analysis import (
        GeneLocationAnalysis,
        format_data_to_tsv,
    )
    from src.utils.ecocyc_data_loader import EcocycDataLoader

    os.makedirs(OUT_DIR, exist_ok=True)
    ecocyc_path = os.path.join(OUT_DIR, "ecocyc.txt")
    match_path = os.path.join(OUT_DIR, "match_result.txt")
    write_fixture_inputs(ecocyc_path, match_path)

    with tempfile.TemporaryDirectory() as tmp:
        staged_input = os.path.join(tmp, "match_result.txt")
        shutil.copy(match_path, staged_input)
        job = GeneLocationAnalysis(
            input_file_path=staged_input,
            ecocyc_file_path=ecocyc_path,
            output_directory=tmp,
            process_sub_data=False,
        )
        job.run()
        loc_path = job.result_path
        shutil.copy(loc_path, os.path.join(OUT_DIR, "location_result.txt"))

        loader = EcocycDataLoader(ecocyc_path)
        loader.build_database()
        tsv_path = os.path.join(tmp, "golden_format.tsv")
        format_data_to_tsv(loc_path, tsv_path, loader)
        shutil.copy(tsv_path, os.path.join(OUT_DIR, "golden_format.tsv"))

    print("wrote", OUT_DIR)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
