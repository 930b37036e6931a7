"""Malformed-input fuzz for every pure-Python parser.

The engine/oracle contract breaks in two ways on bad input: a wrong
value (the oracle catches it) or a raised exception inside a Spark task
(the oracle can't — the job dies while the DuckDB side returns NULLs;
see the r5 ADVICE extract_nuccore_uid finding). This suite pins the
second class: every parser must RETURN on arbitrarily truncated,
spliced, and deleted variants of real fixture content — any return
value is acceptable, raising is not.

Deterministic (seeded) mutations, no hypothesis dependency at runtime.
"""

from __future__ import annotations

import json
import os
import random

import pytest

from ncbi_analysis_spark.sources import enrichment as en
from ncbi_analysis_spark.sources.cluster_blocks import parse_cluster_blocks
from ncbi_analysis_spark.sources.fasta import parse_fasta_attrs, parse_fasta_records
from ncbi_analysis_spark.sources.genbank import parse_genbank
from ncbi_analysis_spark.sources.legacy_blocks import (
    parse_match_blocks,
    parse_neighbor_blocks,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _fixture_text(name: str) -> str:
    with open(os.path.join(FIX, name)) as fh:
        return fh.read()


def _jsonl_pages(name: str) -> list[str]:
    pages = []
    with open(os.path.join(FIX, name)) as fh:
        for line in fh:
            if line.strip():
                pages.append(json.loads(line)["page"])
    return pages


def _mutations(text: str, seed: int = 13, n_random: int = 40):
    """Deterministic malformed variants: truncations at awkward points,
    char deletions, line shuffles/splices, doubled content."""
    yield ""
    yield "   \n\n\t"
    step = max(len(text) // 23, 1)
    for cut in range(0, len(text), step):
        yield text[:cut]
        yield text[cut:]
    rnd = random.Random(seed)
    chars = list(text)
    for _ in range(n_random):
        t = list(chars)
        for _ in range(rnd.randrange(1, 6)):
            if t:
                del t[rnd.randrange(len(t))]
        yield "".join(t)
    lines = text.splitlines()
    if len(lines) > 1:
        shuffled = list(lines)
        rnd.shuffle(shuffled)
        yield "\n".join(shuffled)
        yield "\n".join(lines[1::2])  # every other line
    yield text + text  # doubled / concatenated records


PARSERS = [
    ("genbank", parse_genbank, "driver_s1.gb"),
    ("fasta_attrs", parse_fasta_attrs, "driver_s2.fasta"),
    ("fasta_records", parse_fasta_records, "driver_s2.fasta"),
    ("cluster_blocks", lambda t: parse_cluster_blocks(t, "16s"), "driver_s4.fna"),
    ("match_blocks", parse_match_blocks, "driver_s5.txt"),
    ("neighbor_blocks", parse_neighbor_blocks, "driver_s6.txt"),
]


@pytest.mark.parametrize("name,parser,fixture", PARSERS, ids=[p[0] for p in PARSERS])
def test_file_parsers_never_raise(name, parser, fixture):
    text = _fixture_text(fixture)
    n = 0
    for variant in _mutations(text):
        parser(variant)  # any return is fine; raising is the bug
        n += 1
    assert n > 50


EXTRACTORS = [
    ("ecocyc_id", en.extract_ecocyc_id, "driver_s8_ecocyc.jsonl"),
    ("nuccore_uid", en.extract_nuccore_uid, "driver_s7_nuccore.jsonl"),
    ("pubmed_count", en.extract_pubmed_count, "driver_s10_pubmed.jsonl"),
    ("kegg_orthology", en.extract_kegg_orthology_ids, "driver_s9_kegg.jsonl"),
    ("kegg_pathways", en.extract_kegg_pathways, "driver_s9_kegg.jsonl"),
    ("go_table", en.extract_go_table, "driver_s_go.jsonl"),
]


@pytest.mark.parametrize("name,extractor,fixture", EXTRACTORS,
                         ids=[e[0] for e in EXTRACTORS])
def test_html_extractors_never_raise(name, extractor, fixture):
    for page in _jsonl_pages(fixture):
        for variant in _mutations(page, n_random=15):
            extractor(variant)


def test_cluster_seq_line_corruption_degrades():
    """Regression pins for the two _parse_seq_line crashers the generic
    fuzz missed (they need a structurally-valid block around the corrupt
    line): single-token digit-tail lines and non-numeric coordinate
    tokens must degrade to sequence continuation, not raise."""
    for bad in (
        ">>\nA\nB\n(1) ?\n16s5",          # one token ending in a digit
        ">>\nA\nB\n(1) ?\n16s x 5",       # non-numeric start token
        ">>\nA\nB\n(1) ?\n16s 1 acgt x9",  # non-numeric end token
        ">>\nA\nB\n(1) ?\n16s --5 acgt 9",  # isdigit-passing, int-failing
        ">>\nA\nB\n(1) ?\n16s ² acgt 9",  # unicode digit: int() rejects
    ):
        parse_cluster_blocks(bad, "16s")


def test_neighbor_corrupt_head_skips_block():
    rows = parse_neighbor_blocks("g1 > 10 20\n\nbad > 80nearest: x 9\n\ng2 < 5 9")
    assert [r["name"] for r in rows] == ["g1", "g2"]


def test_map_position_malformed_returns_none():
    assert en.extract_map_position("no brackets") == (None, None)
    assert en.extract_map_position("[1,000 -> junk]") == (None, None)
    assert en.extract_map_position("] backwards [") == (None, None)
    assert en.extract_map_position("[10 20]") == (None, None)  # no arrow
    # well-formed still parses, both arrow directions
    assert en.extract_map_position("x [3,806,107 -> 3,808,770] y") == (3806107, 3808770)
    assert en.extract_map_position("[3,808,770 <- 3,806,107]") == (3806107, 3808770)
    # a stray ']' BEFORE the bracket pair must not mask it
    assert en.extract_map_position("a] b [1,000 -> 2,000] c") == (1000, 2000)


def test_map_position_never_raises():
    base = "map position: 81.1 centisomes [map 3,806,107 -> 3,808,770]"
    for variant in _mutations(base):
        en.extract_map_position(variant)
