"""Generate tests/fixtures/range_extract_golden.json by EXECUTING the
reference GeneExtract RANGE mode (src/analysis/gene_extract.py:57-86,
the default mode of src/run_gene_extraction_analysis.py) on a
deterministic fixture, pinning its quirks for the engine twin
(plans/pipelines.py::extract_range_sequences):

* forward window [min..max-1], reverse window [min+1..max] (the
  0-index shift + reversed-only "+= 1" dance);
* a == b counts as REVERSE (direction = a < b) and yields the empty
  window;
* non-empty `sequence` passes through untouched;
* a non-integer coordinate leaves the row untouched (try/except);
* reverse fill = get_opposite_dna(dna[::-1]) — revcomp.

The reference method is driven directly (the object is constructed
without NCBIDatabase — its only role for range mode is supplying
dna_code, which the fixture provides). Run once with /root/reference
present; read-only on the reference. Replayed by
tests/test_pipelines.py::test_extract_range_sequences_reference_golden
without the reference present.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import sys

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "range_extract_golden.json")

HEADERS = ["name", "note", "sequence", "start", "end"]


def make_dna(n: int = 400) -> str:
    """Deterministic lowercase-acgt genome (md5 chain, no RNG)."""
    out = []
    seed = b"range-extract-golden"
    while len(out) < n:
        seed = hashlib.md5(seed).digest()
        out.extend("acgt"[b & 3] for b in seed)
    return "".join(out[:n])


def fixture_rows() -> list[list[str]]:
    return [
        ["r1", "fwd", "", "5", "20"],          # forward, window [5..19]
        ["r2", "rev", "", "40", "25"],         # reverse, window [26..40]
        ["r3", "eq", "", "33", "33"],          # a == b -> reverse, empty
        ["r4", "prefilled", "acgu", "7", "90"],  # non-empty: untouched
        ["r5", "badint", "", "x", "60"],       # non-int: untouched
        ["r6", "fwd-adjacent", "", "100", "101"],  # 1-base forward window
        ["r7", "rev-adjacent", "", "101", "100"],  # 1-base reverse window
        ["r8", "fwd-long", "", "200", "399"],
        ["r9", "rev-long", "", "399", "200"],
        ["r10", "fwd-at-start", "", "1", "4"],
        ["r11", "rev-at-end", "", "400", "396"],
    ]


def main() -> int:
    if not os.path.isdir(os.path.join(REF, "src")):
        print("reference repo not present; golden not regenerated",
              file=sys.stderr)
        return 1
    sys.path.insert(0, os.path.join(REF, "src"))
    from analysis.gene_extract import GeneExtract

    dna = make_dna()
    rows = fixture_rows()

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        rna_path = os.path.join(td, "ranges.txt")
        with open(rna_path, "w", encoding="utf8") as fw:
            fw.write("\t".join(HEADERS) + "\n")
            for r in rows:
                fw.write("\t".join(r) + "\n")
        ge = object.__new__(GeneExtract)  # skip NCBIDatabase __post_init__
        ge.rna_path = rna_path
        ge.headers = {}
        ge.inv_headers = []
        ge.left_idx = -2
        ge.right_idx = -1
        sink = io.StringIO()
        ge.extract_sequence_based_on_range(dna, sink)
    lines = sink.getvalue().rstrip("\n").split("\n")
    assert lines[0] == "\t".join(HEADERS)
    out_rows = [line.split("\t") for line in lines[1:]]
    assert len(out_rows) == len(rows)

    golden = {
        "dna": dna,
        "headers": HEADERS,
        "input_rows": rows,
        "output_rows": out_rows,
    }
    with open(OUT, "w", encoding="utf8") as fw:
        json.dump(golden, fw, indent=1)
    print(f"wrote {OUT}: {len(out_rows)} rows")
    for r in out_rows:
        print(r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
