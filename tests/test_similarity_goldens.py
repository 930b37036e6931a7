"""Replay tests/fixtures/similarity_goldens.json — scores AND alignment
render triples computed by EXECUTING the reference similarity classes
(scripts/gen_similarity_goldens.py) — against this repo's kernels.

This is the committed fuzz-vs-reference parity evidence SURVEY §5
prescribes for F5-F9 and the match-report renderers (reference
src/analysis/similarities/{direct_match,consistency,text_edit,pattern,
blat}_similarity.py). The fixture is self-contained: the test runs
without /root/reference present.
"""

from __future__ import annotations

import json
import os

import pytest

from ncbi_analysis_spark.similarity.pattern import MatchPattern, pattern_score
from ncbi_analysis_spark.similarity.scorers import (
    blat_render,
    blat_score,
    consistency_render_triple,
    consistency_score,
    direct_render,
    direct_score,
    pattern_render,
    text_edit_render,
    text_edit_score,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "similarity_goldens.json")


@pytest.fixture(scope="module")
def goldens():
    with open(FIXTURE) as f:
        return json.load(f)


def test_fixture_shape(goldens):
    assert len(goldens["cases"]) == 300
    assert len(goldens["blat_cases"]) == 400
    # enough matched blat cases that the render path is actually exercised
    assert sum(1 for c in goldens["blat_cases"] if c["flag"]) >= 50


def test_scores_match_reference(goldens):
    for c in goldens["cases"]:
        g, w = c["gene"], c["window"]
        assert direct_score(g, w) == c["direct_score"], (g, w)
        assert consistency_score(g, w, patience=2) == c["consistency_score"], (g, w)
        assert text_edit_score(g, w, 3) == c["textedit_abort3_score"], (g, w)
        assert text_edit_score(g, w, None) == c["textedit_score"], (g, w)
        pat = MatchPattern(g, goldens["conditions"])
        assert pattern_score(pat, w) == c["pattern_score"], (g, w)


def test_render_triples_match_reference(goldens):
    for c in goldens["cases"]:
        g, w = c["gene"], c["window"]
        assert list(direct_render(g, w)) == c["direct_render"], (g, w)
        assert list(consistency_render_triple(g, w, patience=2)) == c["consistency_render"], (g, w)
        assert list(text_edit_render(g, w)) == c["textedit_render"], (g, w)
        assert list(pattern_render(g, w)) == c["pattern_render"], (g, w)


def test_blat_matches_reference(goldens):
    for c in goldens["blat_cases"]:
        g, d, off = c["gene"], c["database"], c["offset"]
        flag, end = blat_score(g, d, off)
        assert flag == c["flag"], (g, d, off)
        assert end == c["end"], (g, d, off)
        if flag:
            assert list(blat_render(g, d, off)) == c["render"], (g, d, off)
        else:
            assert blat_render(g, d, off) is None
