"""Positional-condition pattern matching (SURVEY.md §2.7 F8).

The reference builds a regex from positional conditions on the query RNA:
each ``must`` block (offset, length — negative offsets count from the
end) contributes the corresponding RNA slice with every ``c`` rewritten to
``(c|t)``; blocks are joined by ``.+``; ``^``/``$`` anchors appear when a
block touches an end. ``optional`` conditions each form an extra pattern
(that condition + all must blocks) whose score is its extra length.
Score = sum of matched condition lengths
(reference: src/analysis/models/match_pattern.py:6-48,
src/analysis/similarities/pattern_similarity.py:13-24).
"""

from __future__ import annotations

import re


def _c_to_ct(seq: str) -> str:
    return "".join("(c|t)" if ch == "c" else ch for ch in seq.lower())


def _build(rna: str, conditions: list[dict]) -> tuple[str, int]:
    n = len(rna)
    conds = sorted(conditions, key=lambda c: c["offset"] if c["offset"] >= 0 else n + c["offset"])
    pattern = ""
    score = 0
    cursor = 0
    for cond in conds:
        off, length = cond["offset"], cond["length"]
        if off < 0:
            off = n + off
        if off == 0:
            pattern += "^"
        if off > cursor:
            pattern += ".+"
        pattern += _c_to_ct(rna[off:off + length])
        cursor = off + length
        if cursor == n:
            pattern += "$"
        score += length
    if cursor != n:
        pattern += ".+"
    return pattern, score


class MatchPattern:
    """Compiled must/optional patterns for one query RNA.

    ``conditions`` = {"must": [{"offset": int, "length": int}, ...],
                      "optional": [{"offset": int, "length": int}, ...]}
    """

    def __init__(self, rna: str, conditions: dict):
        self.must_pattern, self.must_score = _build(rna, list(conditions["must"]))
        self.option_patterns: list[tuple[str, int]] = []
        for opt in conditions.get("optional", []):
            pat, score = _build(rna, [opt, *conditions["must"]])
            self.option_patterns.append((pat, score - self.must_score))
        self._must_re = re.compile(self.must_pattern)
        self._opt_res = [(re.compile(p), s) for p, s in self.option_patterns]


def pattern_score(pattern: MatchPattern | None, window: str) -> float:
    """Score a database window: 0 unless the must pattern matches (from
    the window start); matched optional patterns add their extra score."""
    if pattern is None:
        return 0.0
    if not pattern._must_re.match(window):
        return 0.0
    score = pattern.must_score
    for creg, s in pattern._opt_res:
        if creg.match(window):
            score += s
    return float(score)
