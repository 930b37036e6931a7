"""Similarity scoring kernels (pure Python/numpy; wrapped as pandas UDFs
in similarity.udfs).

Semantics re-derived from the reference (not ported code):

- char rule (F4): gene char a matches database char b iff a == b or
  (a == 'c' and b == 't') — asymmetric bisulfite-style C->T tolerance
  (reference: src/analysis/similarities/base_similarity.py:12-18). This
  is why plain ``levenshtein`` can't be used anywhere.
- direct (F6): positional match count
  (src/analysis/similarities/direct_match_similarity.py:22-28).
- consistency (F7): longest run of consecutive matches, where a window of
  up to ``patience+1`` consecutive runs may be merged when the merged
  span contains at most ``patience`` mismatches
  (src/analysis/similarities/consistency_similarity.py:35-64).
- text_edit (F5): full O(L^2) edit-distance DP (unit indels, substitution
  cost by the char rule); score = L - dp[L][L]; if
  ``continuous_mismatch_limit`` is set, a traceback preferring
  diagonal > delete > insert aborts to 0 when it sees that many
  consecutive non-matching steps
  (src/analysis/similarities/text_edit_similarity.py:13-48).
- blat (F9): seed-and-extend for 8-mer queries: first 4 bases with <= 2
  skipped database chars, middle gap <= 10, last 4 with <= 2 skips;
  returns (matched, end_pos)
  (src/analysis/similarities/blat_similarity.py:58-116).
- weighted mix (A5): weighted mean of the enabled scorers
  (src/analysis/gene_similarity_match.py:304-328).
"""

from __future__ import annotations

INF = 1 << 30


def char_match(a: str, b: str) -> bool:
    """Gene char ``a`` vs database char ``b`` under the c->t rule."""
    return a == b or (a == "c" and b == "t")


def direct_score(gene: str, window: str) -> float:
    """Positional match count of ``gene`` against ``window`` (same length
    prefix of the window is used)."""
    return float(sum(1 for ga, wb in zip(gene, window) if char_match(ga, wb)))


def _match_runs(gene: str, window: str) -> list[tuple[int, int]]:
    """Consecutive-match runs as (length, end_exclusive) pairs, including
    zero-length runs at every mismatch position (the reference's
    score_queue shape, which the patience merge iterates over)."""
    runs: list[tuple[int, int]] = []
    cur = 0
    n = len(gene)
    for i in range(n):
        if char_match(gene[i], window[i]):
            cur += 1
            if i == n - 1:
                runs.append((cur, n))
        else:
            runs.append((cur, i))
            cur = 0
    return runs


def consistency_score(gene: str, window: str, patience: int = 2) -> float:
    """Longest match run, allowing runs to be bridged while the merged
    span carries <= ``patience`` mismatches."""
    runs = _match_runs(gene, window)
    best = max((ln for ln, _ in runs), default=0)
    for i in range(len(runs)):
        span_start = runs[i][1] - runs[i][0]
        merged = 0
        for w in range(patience + 1):
            if i + w >= len(runs):
                break
            span_len = runs[i + w][1] - span_start
            merged += runs[i + w][0]
            if span_len - merged > patience:
                break
            if merged > best:
                best = merged
    return float(best)


def consistency_render(gene: str, window: str, patience: int = 2) -> tuple[float, str]:
    """Score + glyph string for the consistency similarity: matched
    positions '*', bridged-merge gaps '-', others '.'
    (reference rendering_sequence,
    src/analysis/similarities/consistency_similarity.py:7-30)."""
    runs = _match_runs(gene, window)
    best = max((ln for ln, _ in runs), default=0)
    merge_lo, merge_hi = -1, -1
    for i in range(len(runs)):
        span_start = runs[i][1] - runs[i][0]
        merged = 0
        for w in range(patience + 1):
            if i + w >= len(runs):
                break
            span_len = runs[i + w][1] - span_start
            merged += runs[i + w][0]
            if span_len - merged > patience:
                break
            if merged > best:
                best = merged
                merge_lo, merge_hi = i, i + w
    glyphs: list[str] = []
    cur = 0
    n = len(gene)
    for idx, (ln, end) in enumerate(runs):
        run_start = end - ln
        while cur < run_start:
            glyphs.append("-" if merge_lo < idx <= merge_hi else ".")
            cur += 1
        while cur < end:
            glyphs.append("*")
            cur += 1
    while cur < n:
        glyphs.append(".")
        cur += 1
    return float(best), "".join(glyphs)


def text_edit_score(
    gene: str, window: str, continuous_mismatch_limit: int | None = None
) -> float:
    """Edit-distance similarity: L - editdist(gene, window[:L]) with the
    c->t substitution rule; optional traceback abort on a run of
    ``continuous_mismatch_limit`` consecutive non-match steps."""
    n = len(gene)
    dp = [[INF] * (n + 1) for _ in range(n + 1)]
    dp[0][0] = 0
    for i in range(1, n + 1):
        ga = gene[i - 1]
        row, prev = dp[i], dp[i - 1]
        for j in range(1, n + 1):
            sub = prev[j - 1] + (0 if char_match(ga, window[j - 1]) else 1)
            row[j] = min(prev[j] + 1, row[j - 1] + 1, sub)
    score = float(n - dp[n][n])
    if continuous_mismatch_limit is not None:
        i = j = n
        mismatch = 0
        while i > 0 or j > 0:
            if (
                i > 0
                and j > 0
                and dp[i][j]
                == dp[i - 1][j - 1] + (0 if char_match(gene[i - 1], window[j - 1]) else 1)
            ):
                mismatch = 0 if char_match(gene[i - 1], window[j - 1]) else mismatch + 1
                i, j = i - 1, j - 1
            elif i > 0 and dp[i][j] == dp[i - 1][j] + 1:
                mismatch += 1
                i -= 1
            elif j > 0 and dp[i][j] == dp[i][j - 1] + 1:
                mismatch += 1
                j -= 1
            else:  # unreachable on a consistent DP table
                break
            if mismatch >= continuous_mismatch_limit:
                return 0.0
    return score


def direct_render(gene: str, window: str) -> tuple[str, str, str]:
    """Direct-match alignment triple (gene, target, glyphs): '*' where the
    c->t char rule matches, '.' elsewhere (reference rendering_sequence,
    src/analysis/similarities/direct_match_similarity.py:8-20)."""
    n = len(gene)
    glyphs = "".join("*" if char_match(gene[i], window[i]) else "." for i in range(n))
    return gene, window[:n], glyphs


def pattern_render(gene: str, window: str) -> tuple[str, str, str]:
    """Pattern-similarity alignment triple — positionally identical to the
    direct renderer (reference pattern_similarity.py:26-38 duplicates
    direct_match_similarity's loop)."""
    return direct_render(gene, window)


def consistency_render_triple(gene: str, window: str,
                              patience: int = 2) -> tuple[str, str, str]:
    """Consistency alignment triple: the glyph string from
    consistency_render over (gene, window[:n]) (reference
    consistency_similarity.py:7-30 emits gene/target verbatim)."""
    n = len(gene)
    _, glyphs = consistency_render(gene, window, patience)
    return gene, window[:n], glyphs


def text_edit_render(gene: str, window: str) -> tuple[str, str, str]:
    """Text-edit alignment triple from the DP traceback (reference
    rendering_sequence, text_edit_similarity.py:50-80): diagonal steps
    emit (gene char, target char, '*' on match / '.' on substitution);
    deletes emit (gene char, '.', '.'); inserts emit ('.', target char,
    '.'). Traceback preference diagonal > delete > insert — the same
    deterministic order the scorer's abort walk uses.

    NB the reference renders WITHOUT the abort: rendering_sequence walks
    the full table even when the scoring walk aborted to 0."""
    n = len(gene)
    dp = [[INF] * (n + 1) for _ in range(n + 1)]
    dp[0][0] = 0
    for i in range(1, n + 1):
        ga = gene[i - 1]
        row, prev = dp[i], dp[i - 1]
        for j in range(1, n + 1):
            sub = prev[j - 1] + (0 if char_match(ga, window[j - 1]) else 1)
            row[j] = min(prev[j] + 1, row[j - 1] + 1, sub)
    out_g: list[str] = []
    out_t: list[str] = []
    out_m: list[str] = []
    i = j = n
    while i > 0 or j > 0:
        ga = gene[i - 1] if i > 0 else "."
        wb = window[j - 1] if j > 0 else "."
        if (
            i > 0 and j > 0
            and dp[i][j] == dp[i - 1][j - 1] + (0 if char_match(gene[i - 1], window[j - 1]) else 1)
        ):
            out_g.append(ga)
            out_t.append(wb)
            out_m.append("*" if char_match(gene[i - 1], window[j - 1]) else ".")
            i, j = i - 1, j - 1
        elif i > 0 and dp[i][j] == dp[i - 1][j] + 1:
            out_g.append(ga)
            out_t.append(".")
            out_m.append(".")
            i -= 1
        elif j > 0 and dp[i][j] == dp[i][j - 1] + 1:
            out_g.append(".")
            out_t.append(wb)
            out_m.append(".")
            j -= 1
        else:  # unreachable on a consistent DP table
            break
    return "".join(reversed(out_g)), "".join(reversed(out_t)), "".join(reversed(out_m))


def blat_render(gene: str, database: str, offset: int,
                mid_limit: int = 10, end_limit: int = 2) -> tuple[str, str, str] | None:
    """Blat alignment triple (reference rendering_sequence,
    blat_similarity.py:12-56): walk the first 4 gene chars forward from
    ``offset`` (skipped database chars render as gene '-', glyph '.'),
    walk the last 4 backward from the match end, and fill the middle gap
    with database chars as gene '-'. Returns None when the seed-extend
    search found no match (the reference would crash on pos_data_end=None;
    callers render only matched candidates) — and also when a walk runs
    off either end of ``database``: blat_score's extend() reports ok
    when the database ends before all four tail chars are consumed, so
    on a truncated render window the replay below could index past the
    end (IndexError in the UDF) or, in the backward walk, silently read
    via Python negative indexing. Both are bounds-checked to None
    instead (ADVICE r02)."""
    flag, pos_data_end = blat_score(gene, database, offset, mid_limit, end_limit)
    if not flag or pos_data_end is None:
        return None
    n = len(database)
    out_g: list[str] = []
    out_t: list[str] = []
    out_m: list[str] = []
    pos_data = offset
    pos_gene = 0
    while pos_gene < 4:
        if pos_data >= n:
            return None
        if not char_match(gene[pos_gene], database[pos_data]):
            out_g.append("-")
            out_t.append(database[pos_data])
            out_m.append(".")
            pos_data += 1
        else:
            out_g.append(gene[pos_gene])
            out_t.append(database[pos_data])
            out_m.append("*")
            pos_gene += 1
            pos_data += 1
    rev_g: list[str] = []
    rev_t: list[str] = []
    rev_m: list[str] = []
    rev_pos_gene = 7
    rev_pos_data = pos_data_end - 1
    while rev_pos_gene > 3:
        if rev_pos_data < 0 or rev_pos_data >= n:
            return None
        if not char_match(gene[rev_pos_gene], database[rev_pos_data]):
            rev_g.append("-")
            rev_t.append(database[rev_pos_data])
            rev_m.append(".")
            rev_pos_data -= 1
        else:
            rev_g.append(gene[rev_pos_gene])
            rev_t.append(database[rev_pos_data])
            rev_m.append("*")
            rev_pos_gene -= 1
            rev_pos_data -= 1
    while pos_data <= rev_pos_data:
        out_g.append("-")
        out_t.append(database[pos_data])
        out_m.append(".")
        pos_data += 1
    out_g.extend(reversed(rev_g))
    out_t.extend(reversed(rev_t))
    out_m.extend(reversed(rev_m))
    return "".join(out_g), "".join(out_t), "".join(out_m)


def blat_score(
    gene: str, database: str, offset: int, mid_limit: int = 10, end_limit: int = 2
) -> tuple[bool, int | None]:
    """Seed-and-extend match of an 8-mer ``gene`` starting at ``offset``:
    anchor char must match; the first 4 gene chars must align with <= 2
    skipped database chars (and at least one clean adjacent pair); a
    middle gap of <= ``mid_limit`` database chars may follow; the last 4
    likewise with <= 2 skips. Returns (matched, end_pos_exclusive)."""
    if len(gene) != 8:
        raise ValueError("blat similarity requires an 8-char query")
    n = len(database)
    if offset >= n or not char_match(gene[0], database[offset]):
        return False, None

    def extend(pg: int, pd: int, inserts: int, upto: int):
        """Align gene[pg:upto] against database from pd, skipping database
        chars (<= end_limit total); needs one adjacent matched pair."""
        clean_pair = False
        run = 1
        while pg < upto and pd < n:
            while not char_match(gene[pg], database[pd]):
                run = 0
                inserts += 1
                pd += 1
                if inserts > end_limit or pd >= n:
                    return False, None, False
            if run > 0:
                clean_pair = True
            run += 1
            pg += 1
            pd += 1
        return True, pd, clean_pair

    ok, pd, clean = extend(1, offset + 1, 0, 4)
    if not ok or not clean:
        return False, None

    # middle: allow <= mid_limit skipped database chars before gene[4]
    def mid_and_tail(pd: int, inserts: int):
        if inserts > mid_limit or pd >= n:
            return False, None
        while not char_match(gene[4], database[pd]):
            pd += 1
            inserts += 1
            if pd >= n or inserts > mid_limit:
                return False, None
        ok, end, clean = extend(5, pd + 1, 0, 8)
        if ok and clean:
            return True, end
        return mid_and_tail(pd + 1, inserts + 1)

    flag = mid_and_tail(pd + 3, 3)
    return (flag[0], flag[1]) if flag[0] else (False, None)


def _te_forward_batch(gene_a, windows, need_table):
    """Vectorized forward pass of the text-edit DP across a batch of
    same-length windows.

    ``windows`` is (B, L) uint8, ``gene_a`` (L,) uint8. Returns
    (dp[:, L, L], full_table_or_None). The row recurrence
    row[j] = min(prev[j] + 1, row[j - 1] + 1, prev[j - 1] + cost) has a
    left-to-right dependency through row[j - 1]; it is resolved without a
    Python loop over j via the classic scan identity
    row[j] = min_{j' <= j} (tmp[j'] + (j - j')) with
    tmp[j] = min(prev[j] + 1, prev[j - 1] + cost), i.e. a cumulative min
    of (tmp[j] - j) plus j. Boundary semantics match the scalar kernel
    exactly: dp[0][0] = 0 and every other border cell is INF (the
    reference DP at src/analysis/similarities/text_edit_similarity.py
    never fills row/column 0, leaving them effectively infinite)."""
    import numpy as np

    B, L = windows.shape
    inf32 = np.int32(INF)
    dp = None
    if need_table:
        dp = np.empty((B, L + 1, L + 1), dtype=np.int32)
        dp[:, 0, 0] = 0
        dp[:, 0, 1:] = inf32
    prev = np.full((B, L + 1), inf32, dtype=np.int32)
    prev[:, 0] = 0
    ar = np.arange(L, dtype=np.int32)
    for i in range(1, L + 1):
        g = gene_a[i - 1]
        cost = windows != g
        if g == ord("c"):
            cost &= windows != ord("t")
        cost = cost.astype(np.int32)
        tmp = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        row = np.empty_like(prev)
        row[:, 0] = inf32
        row[:, 1:] = np.minimum.accumulate(tmp - ar, axis=1) + ar
        if need_table:
            dp[:, i, :] = row
        prev = row
    return prev[:, L], dp


def _te_traceback_abort_batch(gene_a, windows, dp, limit):
    """Vectorized replay of the scalar traceback (diagonal > delete >
    insert preference) over a batch; returns a bool mask of windows whose
    walk hits ``limit`` consecutive non-matching steps (score aborts to
    0). Each iteration advances every still-active walk by one step, so
    the loop runs at most 2L times with O(B) gathers per step."""
    import numpy as np

    B, L = windows.shape
    stride = L + 1
    dpf = dp.reshape(B, -1)
    rows = np.arange(B)
    i = np.full(B, L, dtype=np.int64)
    j = np.full(B, L, dtype=np.int64)
    mism = np.zeros(B, dtype=np.int64)
    aborted = np.zeros(B, dtype=bool)
    active = np.ones(B, dtype=bool)
    for _ in range(2 * L):
        active &= ((i > 0) | (j > 0)) & ~aborted
        if not active.any():
            break
        idx = rows[active]
        ii, jj = i[idx], j[idx]
        cur = dpf[idx, ii * stride + jj]
        gch = gene_a[np.maximum(ii - 1, 0)]
        wch = windows[idx, np.maximum(jj - 1, 0)]
        mat = (gch == wch) | ((gch == ord("c")) & (wch == ord("t")))
        can = (ii > 0) & (jj > 0)
        diag = can & (cur == dpf[idx, (ii - 1) * stride + (jj - 1)]
                      + np.where(mat, 0, 1))
        up = ~diag & (ii > 0) & (cur == dpf[idx, np.maximum(ii - 1, 0) * stride + jj] + 1)
        left = ~diag & ~up & (jj > 0) & (cur == dpf[idx, ii * stride + np.maximum(jj - 1, 0)] + 1)
        stepped = diag | up | left
        newm = np.where(diag & mat, 0, mism[idx] + 1)
        newm = np.where(stepped, newm, mism[idx])
        i[idx] = ii - (diag | up)
        j[idx] = jj - (diag | left)
        mism[idx] = newm
        aborted[idx] |= stepped & (newm >= limit)
        # a non-consistent DP cell is unreachable; the scalar kernel
        # breaks out of the walk there, so deactivate without aborting
        active[idx] &= stepped
    return aborted


def text_edit_scores_batch(
    gene_a,
    windows,
    continuous_mismatch_limit: int | None = None,
    block_cells: int = 16_000_000,
):
    """Batched ``text_edit_score`` (F5): scores every row of ``windows``
    ((K, L) uint8) against ``gene_a`` ((L,) uint8) at once. Semantics are
    bit-identical to the scalar kernel above, including the c->t char
    rule and the traceback abort — fuzz-asserted in
    tests/test_scorers.py. Work is split into blocks of at most
    ``block_cells`` DP cells so the stored table (needed only when the
    mismatch-limit traceback is on) stays a few tens of MB regardless of
    K and L."""
    import numpy as np

    K, L = windows.shape
    out = np.empty(K, dtype=np.float64)
    if K == 0:
        return out
    if L == 0:
        out.fill(0.0)
        return out
    need_table = continuous_mismatch_limit is not None
    cells = (L + 1) * (L + 1) if need_table else (L + 1)
    blk = max(1, block_cells // cells)
    for s in range(0, K, blk):
        w = windows[s:s + blk]
        final, dp = _te_forward_batch(gene_a, w, need_table)
        sc = (L - final).astype(np.float64)
        if need_table:
            ab = _te_traceback_abort_batch(gene_a, w, dp, continuous_mismatch_limit)
            sc[ab] = 0.0
        out[s:s + len(w)] = sc
    return out


def weighted_similarity(
    gene: str,
    window: str,
    weights: dict[str, float],
    patience: int = 2,
    continuous_mismatch_limit: int | None = None,
    pattern=None,
) -> tuple[float, dict[str, float]]:
    """Weighted mean of the enabled scorers (weights keyed by
    'direct' | 'consistency' | 'text_edit' | 'pattern')."""
    from ncbi_analysis_spark.similarity.pattern import pattern_score

    scores: dict[str, float] = {}
    total_w = 0.0
    acc = 0.0
    for kind, w in weights.items():
        if kind == "direct":
            s = direct_score(gene, window)
        elif kind == "consistency":
            s = consistency_score(gene, window, patience)
        elif kind == "text_edit":
            s = text_edit_score(gene, window, continuous_mismatch_limit)
        elif kind == "pattern":
            s = pattern_score(pattern, window)
        else:
            raise ValueError(f"unknown similarity kind {kind}")
        scores[kind] = s
        acc += s * w
        total_w += w
    return (acc / total_w if total_w else 0.0), scores
