"""Similarity-kernel tests against golden values derived by *executing*
the reference implementations (the reference's own unit tests are stale —
SURVEY.md §5 — so goldens were re-derived from
src/analysis/similarities/*.py at build time; 3100-case fuzz showed exact
parity)."""

from __future__ import annotations

import pytest

from ncbi_analysis_spark.similarity import (
    MatchPattern,
    blat_score,
    char_match,
    consistency_score,
    direct_score,
    pattern_score,
    text_edit_score,
    weighted_similarity,
)

GOLDEN = [
    ("consistency", "agcccaata", "accactctg", 2, 3),
    ("text_edit", "agcccaata", "accactctg", 3, 4.0),
    ("text_edit_nolimit", "agcccaata", "accactctg", None, 4.0),
    ("consistency", "agggatataggcaa", "catgtgcggcgacc", 2, 1),
    ("text_edit", "agggatataggcaa", "catgtgcggcgacc", 3, 0),
    ("text_edit_nolimit", "agggatataggcaa", "catgtgcggcgacc", None, 4.0),
    ("consistency", "gtgacgct", "gttgccta", 2, 3),
    ("text_edit", "gtgacgct", "gttgccta", 3, 4.0),
    ("text_edit_nolimit", "gtgacgct", "gttgccta", None, 4.0),
    ("consistency", "tttgaagga", "agcagccgc", 2, 1),
    ("text_edit", "tttgaagga", "agcagccgc", 3, 0),
    ("text_edit_nolimit", "tttgaagga", "agcagccgc", None, 2.0),
    ("consistency", "acaatacctcg", "tccgtgttacc", 2, 4),
    ("text_edit", "acaatacctcg", "tccgtgttacc", 3, 5.0),
    ("text_edit_nolimit", "acaatacctcg", "tccgtgttacc", None, 5.0),
    ("consistency", "acgtcctcttcaa", "tgaccctctcgtc", 2, 5),
    ("text_edit", "acgtcctcttcaa", "tgaccctctcgtc", 3, 0),
    ("text_edit_nolimit", "acgtcctcttcaa", "tgaccctctcgtc", None, 5.0),
]

BLAT_GOLDEN = [
    ("aaccctta", "gagttatatcagaccgttaccgccttaatg", 5, True, 19),
    ("taccccac", "tagcctacaattgccgttatagaggggtcg", 0, True, 20),
    ("ggtccacc", "tgggtatattacgcgaacttacttttgcca", 1, True, 19),
]


def test_char_rule():
    assert char_match("a", "a")
    assert char_match("c", "t")       # bisulfite-style tolerance
    assert not char_match("t", "c")   # asymmetric
    assert not char_match("a", "g")


def test_direct():
    assert direct_score("acgt", "acgt") == 4.0
    assert direct_score("cccc", "tttt") == 4.0  # all c->t
    assert direct_score("acgt", "tgca") == 0.0


@pytest.mark.parametrize("kind,gene,win,param,expect", GOLDEN)
def test_golden(kind, gene, win, param, expect):
    if kind == "consistency":
        got = consistency_score(gene, win, param)
    else:
        got = text_edit_score(gene, win, param)
    assert got == expect, (kind, gene, win, param)


@pytest.mark.parametrize("gene,db,off,flag,end", BLAT_GOLDEN)
def test_blat_golden(gene, db, off, flag, end):
    got_flag, got_end = blat_score(gene, db, off)
    assert (got_flag, got_end) == (flag, end)


def test_blat_anchor_fail():
    assert blat_score("aaaaaaaa", "ttttttttttttttt", 0) == (False, None)


def test_blat_render_truncated_window_is_none():
    """blat_score's extend() reports ok when the database ends before all
    four tail chars are consumed ('aaaatttag' ends after gene[5]); the
    render replay's backward walk would then run off the left end of the
    window (negative Python indexing, then IndexError). The render must
    return None instead of replaying out of bounds (ADVICE r02)."""
    from ncbi_analysis_spark.similarity.scorers import blat_render

    gene, db = "aaaaaggg", "aaaatttag"
    assert blat_score(gene, db, 0) == (True, len(db))  # truncated-ok quirk
    assert blat_render(gene, db, 0) is None
    # a complete window still renders
    full = blat_render("aaaaaaaa", "aaaattta" + "aaaa", 0)
    assert full is not None and len(full) == 3


def test_pattern_c_to_t_rewrite():
    p = MatchPattern("acgtacgtac", {"must": [{"offset": 0, "length": 4}], "optional": []})
    assert p.must_pattern == "^a(c|t)gt.+"
    assert pattern_score(p, "atgtaaaaaa") == 4.0  # c matched as t
    assert pattern_score(p, "aggtaaaaaa") == 0.0


def test_pattern_negative_offset_anchors_end():
    p = MatchPattern("acgtacgtac", {"must": [{"offset": -3, "length": 3}], "optional": []})
    assert p.must_pattern.endswith("$")
    assert p.must_pattern.startswith(".+")


def test_weighted_mix():
    w, scores = weighted_similarity(
        "acgt", "acga", {"direct": 2.0, "consistency": 1.0}, patience=1
    )
    assert scores["direct"] == 3.0
    assert scores["consistency"] == 3.0
    assert w == 3.0


def test_udfs_roundtrip(spark):
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.similarity.udfs import (
        consistency_similarity_udf,
        direct_similarity_udf,
        text_edit_similarity_udf,
    )

    df = spark.createDataFrame(
        [("agcccaata", "accactctg")], ["gene", "win"]
    )
    row = df.select(
        direct_similarity_udf("gene", "win").alias("d"),
        consistency_similarity_udf("gene", "win", F.lit(2)).alias("c"),
        text_edit_similarity_udf("gene", "win", F.lit(3)).alias("t"),
        text_edit_similarity_udf("gene", "win", F.lit(None).cast("int")).alias("t2"),
    ).collect()[0]
    assert row["c"] == 3.0
    assert row["t"] == 4.0
    assert row["t2"] == 4.0


def test_consistency_vec_matches_exact_kernel():
    """The vectorized two-pointer consistency (max matches in any window
    with <= patience mismatches) must agree with the exact patience-merge
    kernel at every offset, for every patience."""
    import random

    import numpy as np

    from ncbi_analysis_spark.plans.similarity_scan import (
        _consistency_vec,
        _match_matrix,
        _np_window_view,
    )
    from ncbi_analysis_spark.similarity.scorers import consistency_score

    rnd = random.Random(11)
    for patience in (0, 1, 2, 4):
        for _ in range(20):
            L = rnd.randint(1, 20)
            chunk = "".join(rnd.choice("acgt") for _ in range(rnd.randint(L, 120)))
            gene = "".join(rnd.choice("acgt") for _ in range(L))
            ca = np.frombuffer(chunk.encode(), dtype=np.uint8)
            ga = np.frombuffer(gene.encode(), dtype=np.uint8)
            mm = _match_matrix(ga, _np_window_view(ca, L))
            got = _consistency_vec(mm, patience)
            exp = [consistency_score(gene, chunk[o:o + L], patience)
                   for o in range(len(chunk) - L + 1)]
            assert got.tolist() == exp


def test_textedit_batch_matches_scalar_kernel():
    """The batched text-edit DP (numpy recurrence + vectorized traceback)
    must agree with the scalar kernel at every offset, for every abort
    limit, including block-split boundaries."""
    import random

    import numpy as np

    from ncbi_analysis_spark.similarity.scorers import (
        text_edit_score,
        text_edit_scores_batch,
    )

    rnd = random.Random(13)
    for limit in (None, 1, 2, 3, 5):
        for _ in range(20):
            L = rnd.randint(1, 14)
            gene = "".join(rnd.choice("acgt") for _ in range(L))
            wins = ["".join(rnd.choice("acgt") for _ in range(L))
                    for _ in range(rnd.randint(1, 40))]
            W = np.array([np.frombuffer(w.encode(), np.uint8) for w in wins])
            g = np.frombuffer(gene.encode(), np.uint8)
            got = text_edit_scores_batch(
                g, W, limit, block_cells=rnd.choice([60, 16_000_000])
            )
            want = [text_edit_score(gene, w, limit) for w in wins]
            assert np.allclose(got, want), (gene, limit)


def test_pattern_chunk_matches_scalar_kernel():
    """The vectorized chunk pattern evaluator (block plan + next-match
    tables) must agree with the per-window regex scorer, on both
    plan-representable and fallback shapes."""
    import random

    import numpy as np

    from ncbi_analysis_spark.similarity.pattern import (
        MatchPattern,
        pattern_score,
        pattern_scores_chunk,
    )

    rnd = random.Random(17)
    plan_trials = 0
    for _ in range(120):
        n = rnd.randint(5, 18)
        rna = "".join(rnd.choice("acgt") for _ in range(n))
        conds_m, cur = [], rnd.randint(0, 2)
        while cur < n and len(conds_m) < 3:
            length = rnd.randint(1, min(4, n - cur))
            off = cur if rnd.random() < 0.7 else cur - n
            conds_m.append({"offset": off, "length": length})
            cur += length + rnd.choice([0, 0, 1, 2, 3])
            if rnd.random() < 0.4:
                break
        if not conds_m:
            continue
        opts = [dict(conds_m[0])] if rnd.random() < 0.5 else []
        pat = MatchPattern(rna, {"must": conds_m, "optional": opts})
        if pat._must_plan is not None:
            plan_trials += 1
        chunk = "".join(rnd.choice("acgt") for _ in range(rnd.randint(n, 150)))
        starts = np.arange(0, len(chunk) - n + 1)
        if len(starts) == 0:
            continue
        got = pattern_scores_chunk(pat, chunk, starts, n)
        want = [pattern_score(pat, chunk[p:p + n]) for p in starts]
        assert np.allclose(got, want), (rna, conds_m)
    assert plan_trials > 50  # the vectorized path was actually exercised


def test_pattern_chunk_reference_conditions_take_plan_path():
    """The reference flagship's condition set
    (src/1-run_gene_similarity_match.py:28-43) must compile to the
    vectorized plan, not the regex fallback."""
    from ncbi_analysis_spark.similarity.pattern import MatchPattern

    conds = {"must": [{"offset": 0, "length": 4}, {"offset": -4, "length": 4}],
             "optional": [{"offset": 4, "length": 1}, {"offset": -5, "length": 1}]}
    pat = MatchPattern("acgtacgtacgtacgtacgt", conds)
    assert pat._must_plan is not None
    assert all(p is not None for p in pat._opt_plans)
