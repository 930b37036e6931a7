"""Vocabulary-drift monitor tests: identical corpora read zero, the
per-bucket table and pinned-fold statistic match a pure-Python replica
exactly, witness tokens are deterministic, and state stays bounded."""

from __future__ import annotations

import hashlib
from collections import Counter

from ncbi_analysis_spark.operators import drift as dr

N_BUCKETS = 256


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _py_drift(texts_a, texts_b):
    """Pure-Python replica of vocab_drift (same hash, same pinned
    arithmetic shape) -> {bucket: (n_a, n_b, p_a, p_b, contrib)}."""
    ca, cb = Counter(), Counter()
    for ts, c in ((texts_a, ca), (texts_b, cb)):
        for t in ts:
            for g in t.split():
                c[_bucket(g)] += 1
    ta, tb = sum(ca.values()), sum(cb.values())
    out = {}
    for bk in set(ca) | set(cb):
        na, nb = ca.get(bk, 0), cb.get(bk, 0)
        pa, pb = na / ta, nb / tb
        contrib = ((pa - pb) * (pa - pb)) / (pa + pb) if pa + pb > 0 else 0.0
        out[bk] = (na, nb, pa, pb, contrib)
    return out


def _df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], ["text"])


TEXTS_A = ["the cat sat on the mat", "the dog ran", "cat and dog",
           "alpha beta gamma", "the the the"]
TEXTS_B = ["le chat et le chien", "alpha beta", "chien chien chat",
           "gamma delta epsilon", "le le"]


def test_vocab_drift_matches_python_replica(spark):
    got = {
        r["bucket"]: (r["n_a"], r["n_b"], r["p_a"], r["p_b"], r["contrib"])
        for r in dr.vocab_drift(
            _df(spark, TEXTS_A), _df(spark, TEXTS_B),
            n_buckets=N_BUCKETS,
        ).collect()
    }
    assert got == _py_drift(TEXTS_A, TEXTS_B)
    assert len(got) <= N_BUCKETS


def test_drift_statistic_zero_for_identical_and_two_for_disjoint(spark):
    a = _df(spark, TEXTS_A)
    same = dr.drift_statistic(
        dr.vocab_drift(a, _df(spark, TEXTS_A), n_buckets=N_BUCKETS)
    ).collect()[0]
    assert same["drift_stat"] == 0.0
    # disjoint vocabularies: stat = 2 exactly, absent cross-side
    # hash collisions — pin against the replica's pinned-order fold
    b = _df(spark, ["zork quux blarg", "frobnitz zork"])
    stat = dr.drift_statistic(
        dr.vocab_drift(a, b, n_buckets=N_BUCKETS)
    ).collect()[0]
    rep = _py_drift(TEXTS_A, ["zork quux blarg", "frobnitz zork"])
    want = 0.0
    for bk in sorted(rep):
        want += rep[bk][4]
    assert stat["drift_stat"] == want
    # near the disjoint bound of 2 (cross-side bucket collisions — this
    # vocabulary has exactly one at 256 buckets — pull it below 2)
    assert stat["drift_stat"] > 1.5
    assert stat["n_buckets_seen"] == len(rep)


def test_top_drifted_tokens_witnesses(spark):
    a, b = _df(spark, TEXTS_A), _df(spark, TEXTS_B)
    d = dr.vocab_drift(a, b, n_buckets=N_BUCKETS)
    top = dr.top_drifted_tokens(a, b, d, k=3, n_buckets=N_BUCKETS)
    rows = top.collect()
    assert len(rows) == 3
    rep = _py_drift(TEXTS_A, TEXTS_B)
    want_order = sorted(rep, key=lambda bk: (-rep[bk][4], bk))[:3]
    assert sorted(r["bucket"] for r in rows) == sorted(want_order)
    # witness = dominant token per side, ties to lexicographic min
    for r in rows:
        for side, texts in (("top_token_a", TEXTS_A),
                            ("top_token_b", TEXTS_B)):
            c = Counter(
                g for t in texts for g in t.split()
                if _bucket(g) == r["bucket"]
            )
            if not c:
                assert r[side] is None
            else:
                best = sorted(c, key=lambda g: (-c[g], g))[0]
                assert r[side] == best, (r["bucket"], side)


def test_vocab_drift_null_and_empty_text(spark):
    a = spark.createDataFrame(
        [(None,), ("",), ("  ",), ("word",)], "text string")
    got = dr.vocab_drift(a, _df(spark, ["word"]),
                         n_buckets=N_BUCKETS).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_a"], r["n_b"], r["contrib"]) == (1, 1, 0.0)


def test_hashed_vocab_counts_reuse_validates_buckets(spark):
    """The counts= reuse path must reject a non-counts table
    driver-side and fail IN-PLAN when the table was built with a
    mismatched n_buckets in either direction (silent mis-bucketing is
    the failure mode)."""
    import pytest as _pytest

    from ncbi_analysis_spark.operators import drift as dr

    d = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha")],
        "doc_id long, text string")
    counts = dr.token_bucket_counts(d, n_buckets=1024)
    with _pytest.raises(ValueError, match="missing columns"):
        dr.hashed_vocab_counts(d, counts=counts.drop("g"))
    # matching reuse: identical to the direct computation
    direct = {(r["bucket"], r["n"])
              for r in dr.hashed_vocab_counts(d, n_buckets=1024).collect()}
    reused = {(r["bucket"], r["n"])
              for r in dr.hashed_vocab_counts(
                  d, n_buckets=1024, counts=counts).collect()}
    assert direct == reused
    # mismatched n_buckets: loud in-plan failure at execution, BOTH
    # directions (the recompute guard: a table built with a smaller
    # n_buckets used to pass the old range check silently)
    with _pytest.raises(Exception, match="different n_buckets"):
        dr.hashed_vocab_counts(d, n_buckets=2, counts=counts).collect()
    small = dr.token_bucket_counts(d, n_buckets=2)
    with _pytest.raises(Exception, match="different n_buckets"):
        dr.hashed_vocab_counts(d, n_buckets=1024, counts=small).collect()


def test_top_drifted_tokens_exact_matches_full_vocab(spark):
    """The HH-candidate pass must reproduce the full-vocabulary top-N
    on a skewed synthetic, with correct integer guarantee flags."""
    import pytest as _pytest

    from ncbi_analysis_spark.operators import drift as dr

    # side A: 'alpha' dominant; side B: 'beta' dominant; shared tail
    a_rows = [("alpha " * 5,)] * 30 + [("tail%d common" % i,) for i in range(10)]
    b_rows = [("beta " * 5,)] * 30 + [("tail%d common" % i,) for i in range(10)]
    a = spark.createDataFrame(a_rows, "text string").repartition(4)
    b = spark.createDataFrame(b_rows, "text string").repartition(4)
    got = dr.top_drifted_tokens_exact(a, b, n=3, m=16).collect()
    # full-vocab truth in Python
    import collections
    ca, cb = collections.Counter(), collections.Counter()
    for (t,) in a_rows: ca.update(t.split())
    for (t,) in b_rows: cb.update(t.split())
    na, nb = sum(ca.values()), sum(cb.values())
    drifts = sorted(
        ((abs(ca[g] / na - cb[g] / nb), g) for g in set(ca) | set(cb)),
        key=lambda x: (-x[0], x[1]))[:3]
    assert [(r["token"], r["drift"]) for r in got] == \
           [(g, d) for d, g in drifts]
    for r in got:
        want = abs(r["n_a"] * nb - r["n_b"] * na) * 17 > na * nb
        assert r["guaranteed"] == want
    # validation
    empty = spark.createDataFrame([], "text string")
    with _pytest.raises(ValueError, match="empty token stream"):
        dr.top_drifted_tokens_exact(a, empty, n=3)
    with _pytest.raises(ValueError, match="n=0"):
        dr.top_drifted_tokens_exact(a, b, n=0)
