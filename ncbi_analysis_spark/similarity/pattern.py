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


def _build_plan(rna: str, conditions: list[dict]):
    """Structured twin of ``_build``'s regex for vectorized evaluation:
    returns (blocks, anchored, dollar, trailing_gap) where ``blocks`` is
    the list of literal runs (adjacent conditions merged), every
    inter-block separator is an implicit ``.+`` (gap >= 1), ``anchored``
    pins block 0 to the window start, ``dollar`` pins the last block's
    end to the window end, and ``trailing_gap`` requires >= 1 window char
    after the last block. Returns None for shapes the plan can't express
    (overlapping conditions, a mid-pattern ^ or $, zero-length blocks) —
    callers fall back to the compiled regex per window there."""
    n = len(rna)
    conds = sorted(conditions, key=lambda c: c["offset"] if c["offset"] >= 0 else n + c["offset"])
    blocks: list[str] = []
    anchored = False
    dollar = False
    cursor = 0
    for cond in conds:
        off, length = cond["offset"], cond["length"]
        if off < 0:
            off = n + off
        if length <= 0 or off < 0 or off + length > n:
            return None
        if dollar:  # $ already emitted mid-pattern — regex territory
            return None
        if blocks and off == 0:  # mid-pattern ^ in the regex form
            return None
        if off < cursor:  # overlapping conditions concatenate oddly
            return None
        if off == 0:
            anchored = True
        text = rna[off:off + length].lower()
        if blocks and off == cursor:
            blocks[-1] += text  # adjacency: no .+ emitted between
        else:
            blocks.append(text)
        cursor = off + length
        if cursor == n:
            dollar = True
    trailing_gap = 1 if cursor != n else 0
    return blocks, anchored, dollar, trailing_gap


_PLAN_BIG = 1 << 40


def _block_tables(text: str, chunk_a, cache: dict):
    """(match, nxt, len) for one literal block over the chunk: ``match[q]``
    = block matches chunk[q:q+len] under the c->t rule; ``nxt[i]`` =
    smallest q >= i with a match (sentinel otherwise, array length
    n_chunk + 2 so clamped indexing is always in range)."""
    import numpy as np

    hit = cache.get(text)
    if hit is not None:
        return hit
    b = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
    lb = len(b)
    n = len(chunk_a)
    nq = n - lb + 1
    if nq <= 0:
        match = np.zeros(0, dtype=bool)
    else:
        win = np.lib.stride_tricks.sliding_window_view(chunk_a, lb)
        match = ((win == b) | ((b == ord("c")) & (win == ord("t")))).all(axis=1)
    nxt = np.full(n + 2, _PLAN_BIG, dtype=np.int64)
    if nq > 0:
        idx = np.where(match, np.arange(nq, dtype=np.int64), _PLAN_BIG)
        nxt[:nq] = np.minimum.accumulate(idx[::-1])[::-1]
    cache[text] = (match, nxt, lb)
    return cache[text]


def _plan_ok(plan, chunk_a, starts, L: int, cache: dict):
    """Bool array over window starts: does the plan's pattern match
    chunk[p:p+L] (``re.match`` semantics)? Greedy-leftmost block chaining
    via the next-match tables — correct for satisfiability since every
    gap is an unbounded ``.+``."""
    import numpy as np

    blocks, anchored, dollar, trailing_gap = plan
    p = starts.astype(np.int64)
    end = p + L
    n = len(chunk_a)
    if not blocks:
        # pattern is just ".+" (or empty): needs trailing_gap chars
        return L >= trailing_gap if isinstance(p, int) else np.full(len(p), L >= trailing_gap)
    m = len(blocks)
    last = m - 1 if dollar else m
    # chain blocks 0..last-1 greedily (when dollar, the final block is
    # position-pinned and handled separately below)
    q = None
    q_end = None  # exclusive end of the previous block (+BIG propagates)
    for bi in range(last):
        match, nxt, lb = _block_tables(blocks[bi], chunk_a, cache)
        if bi == 0:
            if anchored:
                ok0 = (p < len(match)) & match[np.minimum(p, max(len(match) - 1, 0))] \
                    if len(match) else np.zeros(len(p), dtype=bool)
                q = np.where(ok0, p, _PLAN_BIG)
            else:
                q = nxt[np.minimum(p + 1, n + 1)]
        else:
            q = nxt[np.minimum(q_end + 1, n + 1)]
        q_end = q + lb
    if dollar:
        match, nxt, lb = _block_tables(blocks[m - 1], chunk_a, cache)
        e = end - lb
        in_rng = (e >= 0) & (e < len(match)) if len(match) else np.zeros(len(p), dtype=bool)
        ok = in_rng & match[np.clip(e, 0, max(len(match) - 1, 0))]
        if m > 1:
            ok &= e >= q_end + 1
        elif anchored:
            ok &= e == p
        else:
            ok &= e >= p + 1
        return ok
    return q_end + trailing_gap <= end


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
        # structured plans for the vectorized chunk evaluator; None when
        # the regex shape isn't plan-representable (fallback per window)
        self._must_plan = _build_plan(rna, list(conditions["must"]))
        self._opt_plans = [
            _build_plan(rna, [opt, *conditions["must"]])
            for opt in conditions.get("optional", [])
        ]


def pattern_scores_chunk(pattern: MatchPattern | None, chunk: str, starts, L: int):
    """Vectorized ``pattern_score`` over the windows chunk[p:p+L] for
    every p in ``starts`` — one sliding-window match + next-match table
    per distinct literal block per chunk (O(len(chunk) * block_len)),
    then O(#blocks) vectorized gathers per window, instead of a Python
    regex call per offset. Falls back to the per-window regex when a
    pattern shape is not plan-representable. Parity with the scalar
    ``pattern_score`` is fuzz-asserted in tests/test_pattern.py."""
    import numpy as np

    starts = np.asarray(starts, dtype=np.int64)
    out = np.zeros(len(starts), dtype=np.float64)
    if pattern is None or len(starts) == 0:
        return out
    plans_ok = pattern._must_plan is not None and all(
        pl is not None for pl in pattern._opt_plans
    )
    if not plans_ok:
        for t in range(len(starts)):
            p = int(starts[t])
            out[t] = pattern_score(pattern, chunk[p:p + L])
        return out
    chunk_a = np.frombuffer(chunk.encode("ascii"), dtype=np.uint8)
    cache: dict = {}
    must_ok = _plan_ok(pattern._must_plan, chunk_a, starts, L, cache)
    out = np.where(must_ok, float(pattern.must_score), 0.0)
    for plan, (_creg, extra) in zip(pattern._opt_plans, pattern._opt_res):
        opt_ok = _plan_ok(plan, chunk_a, starts, L, cache)
        out = out + np.where(must_ok & opt_ok, float(extra), 0.0)
    return out


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
