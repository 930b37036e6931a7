"""Batch randomized property tests: Column expressions vs independent
pure-Python references.

Each test generates hundreds of seeded-random inputs, evaluates the
engine's Column expression in ONE Spark job, and compares every row
against a from-scratch Python model written here (not a re-import of
engine code) — the SQL-oracle idea applied at the function level, in
directions the fixture-based unit tests don't reach (arbitrary lengths,
empty strings, out-of-range coordinates, negative values).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from ncbi_analysis_spark.functions import sequence as seqf
from ncbi_analysis_spark.functions import vectors as vecf

# reference get_opposite_dna map (src/utils/gene_util.py:1-8): DNA-style
# a<->t / c<->g, case preserved, anything else (u, n, ...) untouched
_COMP = {"a": "t", "t": "a", "c": "g", "g": "c",
         "A": "T", "T": "A", "C": "G", "G": "C"}


def _py_revcomp(s: str) -> str:
    return "".join(_COMP.get(ch, ch) for ch in reversed(s))


def _rand_seqs(n=400, seed=29):
    rnd = random.Random(seed)
    out = []
    for _ in range(n):
        length = rnd.choice([0, 1, 2, rnd.randrange(3, 80)])
        out.append("".join(rnd.choice("aucgn") for _ in range(length)))
    return out


def test_revcomp_matches_python_model_and_involutes(spark):
    seqs = _rand_seqs()
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)], ["i", "s"])
    rows = df.select(
        "i", seqf.revcomp(F.col("s")).alias("rc"),
        seqf.revcomp(seqf.revcomp(F.col("s"))).alias("rcrc"), "s",
    ).collect()
    assert len(rows) == len(seqs)
    for r in rows:
        assert r["rc"] == _py_revcomp(seqs[r["i"]])
        # the a<->t / c<->g map is symmetric, so revcomp is an involution
        assert r["rcrc"] == seqs[r["i"]]


def test_strand_seq_matches_python_model(spark):
    """extract_strand_seq over random coordinates INCLUDING degenerate
    spans: forward start<=end is the 1-based inclusive substring,
    reverse start>end is the revcomp of [end, start]."""
    rnd = random.Random(31)
    cases = []
    for i in range(400):
        s = "".join(rnd.choice("aucg") for _ in range(rnd.randrange(1, 60)))
        a = rnd.randrange(1, len(s) + 1)
        b = rnd.randrange(1, len(s) + 1)
        cases.append((i, s, a, b))
    df = spark.createDataFrame(cases, ["i", "s", "a", "b"])
    rows = df.select(
        "i", seqf.extract_strand_seq(F.col("s"), F.col("a"), F.col("b")).alias("x"),
    ).collect()
    for r in rows:
        _, s, a, b = cases[r["i"]]
        if a <= b:
            expect = s[a - 1:b]
        else:
            expect = _py_revcomp(s[b - 1:a])
        assert r["x"] == expect, (s, a, b, r["x"], expect)


def test_flanks_match_python_model(spark):
    """upstream/downstream flanks at random coordinates incl. spans
    touching the sequence edges (flank shorter than the limit)."""
    rnd = random.Random(37)
    cases = []
    for i in range(400):
        s = "".join(rnd.choice("aucg") for _ in range(rnd.randrange(1, 50)))
        start = rnd.randrange(1, len(s) + 1)
        end = rnd.randrange(start, len(s) + 1)
        lim = rnd.randrange(0, 12)
        cases.append((i, s, start, end, lim))
    df = spark.createDataFrame(cases, ["i", "s", "start", "end", "lim"])
    rows = df.select(
        "i",
        seqf.upstream_flank(F.col("s"), F.col("start"), F.col("lim")).alias("up"),
        seqf.downstream_flank(F.col("s"), F.col("end"), F.col("lim")).alias("dn"),
    ).collect()
    for r in rows:
        _, s, start, end, lim = cases[r["i"]]
        assert r["up"] == s[max(start - 1 - lim, 0):start - 1], (s, start, lim, r["up"])
        assert r["dn"] == s[end:end + lim], (s, end, lim, r["dn"])


def test_overlap_size_matches_interval_model(spark):
    """overlap_size across random (incl. negative / inverted / disjoint)
    inclusive intervals == max(0, min(r) - max(l) + 1)."""
    rnd = random.Random(41)
    cases = [(i, rnd.randrange(-20, 50), rnd.randrange(-20, 50),
              rnd.randrange(-20, 50), rnd.randrange(-20, 50)) for i in range(600)]
    df = spark.createDataFrame(cases, ["i", "al", "ar", "bl", "br"])
    rows = df.select(
        "i", seqf.overlap_size(F.col("al"), F.col("ar"),
                               F.col("bl"), F.col("br")).alias("ov"),
    ).collect()
    for r in rows:
        _, al, ar, bl, br = cases[r["i"]]
        assert r["ov"] == max(0, min(ar, br) - max(al, bl) + 1)


def test_vector_ops_match_numpy(spark):
    import numpy as np

    rnd = random.Random(43)
    cases = []
    for i in range(300):
        d = rnd.choice([1, 2, 3, 8])
        v = [rnd.uniform(-2, 2) for _ in range(d)]
        w = [rnd.uniform(-2, 2) for _ in range(d)]
        cases.append((i, v, w))
    df = spark.createDataFrame(cases, ["i", "v", "w"])
    rows = df.select(
        "i",
        vecf.dot(F.col("v"), F.col("w")).alias("dot"),
        vecf.norm(F.col("v")).alias("norm"),
        vecf.l2_normalize(F.col("v")).alias("unit"),
        vecf.quantize_int8(F.col("v")).alias("q"),
    ).collect()
    for r in rows:
        _, v, w = cases[r["i"]]
        va, wa = np.array(v), np.array(w)
        assert math.isclose(r["dot"], float(va @ wa), rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r["norm"], float(np.linalg.norm(va)), rel_tol=1e-9)
        nv = np.linalg.norm(va)
        if nv > 0:
            assert math.isclose(
                float(np.linalg.norm(np.array(r["unit"]))), 1.0, rel_tol=1e-9)
        # int8 quantization: every slot in [-127, 127], max |v| slot hits
        # +-127, and dequantized values stay within one step of the input
        q = np.array(r["q"], dtype=np.int64)
        assert q.min() >= -127 and q.max() <= 127
        m = np.abs(va).max()
        if m > 0:
            assert np.abs(q).max() == 127
            deq = q * (m / 127.0)
            assert np.abs(deq - va).max() <= m / 127.0 + 1e-9


def test_non_ascii_genome_fails_loudly(spark):
    """Byte-sliced genome paths must raise a labeled error on non-ASCII
    sequences (silent byte-offset corruption is the failure mode being
    guarded), and the error names the offending accession."""
    import pytest

    from ncbi_analysis_spark.plans.similarity_scan import chunk_genome

    bad = spark.createDataFrame(
        [("okacc", "acgtacgt"), ("badacc", "acgt acgt")],
        ["accession", "seq"])
    ok = bad.filter(F.col("accession") == "okacc")
    assert chunk_genome(ok, 4, 2).count() > 0
    with pytest.raises(Exception, match="badacc"):
        chunk_genome(bad, 4, 2).count()


def test_char_gram_byte_fast_path_matches_char_semantics(spark):
    """ascii_fast_grams: the ASCII byte-sliced path and the non-ASCII
    char-substr fallback must both equal pure-Python char slicing —
    multibyte codepoints are never split."""
    from ncbi_analysis_spark.functions.text import char_shingles
    from ncbi_analysis_spark.operators.terms import char_ngrams

    texts = ["abcdefghij", "ab", "", "héllo wörld ünïcode",
             "日本語テキスト", "mixed ascii préfix", "a" * 300]
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    for r in df.select("t", char_shingles(F.col("t"), 4, 2).alias("sh")).collect():
        t = r["t"]
        expect = [t[i:i + 4] for i in range(0, max(len(t) - 3, 1), 2)] if t else [""]
        assert r["sh"] == expect, (t, r["sh"], expect)

    d2 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = sorted((r["doc_id"], r["ngram"]) for r in char_ngrams(d2, 3).collect())
    exp = sorted(
        (i, t.lower()[j:j + 3])
        for i, t in enumerate(texts) if len(t) >= 3
        for j in range(len(t) - 2)
    )
    assert got == exp


def test_scorer_bounds_and_known_identities():
    """Driver-side scalar kernels: score bounds and hand-derivable
    identities over random strings (the batched kernels are pinned to
    these scalars elsewhere; this pins the scalars to the math)."""
    from ncbi_analysis_spark.similarity.scorers import (
        consistency_score,
        direct_score,
        text_edit_score,
    )

    rnd = random.Random(47)
    for _ in range(300):
        n = rnd.randrange(1, 14)
        g = "".join(rnd.choice("acgt") for _ in range(n))
        w = "".join(rnd.choice("acgt") for _ in range(n))
        d = direct_score(g, w)
        c = consistency_score(g, w, patience=2)
        t = text_edit_score(g, w)
        assert 0 <= d <= n and 0 <= c <= n and t <= n
        # identical strings score n everywhere (c->t rule is a superset
        # of equality); consistency never beats the match count
        assert direct_score(g, g) == consistency_score(g, g) == n
        assert text_edit_score(g, g) == n
        assert c <= n and d <= n
        # text-edit is at least matches - edits >= direct - but bounded
        # below by -n; direct counts per-position rule matches exactly
        assert d == sum(
            1 for a, b in zip(g, w) if a == b or (a == "c" and b == "t"))


def test_dsir_matches_python_model(spark):
    """Randomized corpora vs a from-scratch DSIR model: random word docs
    (including empty and 1-token), weights and scores recomputed here in
    pure Python (hashlib md5 buckets, add-one-smoothed log ratios,
    bucket-ascending summation — the same fold order the operator pins),
    compared exactly."""
    import hashlib

    from ncbi_analysis_spark.operators.terms import dsir_logratios, dsir_score

    rnd = random.Random(83)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    B, NG = 64, 2

    def mk(n, bias):
        docs = []
        for i in range(n):
            ln = rnd.choice([0, 1, 2, 3, 8, 15])
            words = [rnd.choice(vocab[:4] if bias else vocab) for _ in range(ln)]
            docs.append((i, " ".join(words)))
        return docs

    target = mk(25, True)
    corpus = [(100 + i, t) for i, t in mk(60, False)]

    def grams(s):
        toks = s.strip().split()
        if not toks:
            toks = [""]  # regex \s+ split of empty -> one empty token
        out = []
        for n in range(1, NG + 1):
            if len(toks) >= n:
                out += [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            else:
                out.append(" ".join(toks))
        return out

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    def counts(docs):
        per, tot = {}, 0
        for _, t in docs:
            for g in grams(t):
                b = bucket(g)
                per[b] = per.get(b, 0) + 1
                tot += 1
        return per, tot

    t, T = counts(target)
    r, R = counts(corpus)
    w = {b: math.log((t.get(b, 0) + 1) / (T + B)) - math.log((r.get(b, 0) + 1) / (R + B))
         for b in range(B)}

    want = {}
    for i, txt in corpus:
        per = {}
        for g in grams(txt):
            b = bucket(g)
            per[b] = per.get(b, 0) + 1
        acc = 0.0
        for b in sorted(per):  # the pinned bucket-ascending fold
            acc = acc + per[b] * w[b]
        want[i] = (sum(per.values()), round(acc, 6))

    tdf = spark.createDataFrame(target, ["doc_id", "text"])
    cdf = spark.createDataFrame(corpus, ["doc_id", "text"])
    wdf = dsir_logratios(tdf, cdf, "text", "doc_id", n_buckets=B, ngram_max=NG)
    got = {r2["doc_id"]: (r2["n_feats"], r2["logw"]) for r2 in
           dsir_score(cdf, "text", "doc_id", wdf, n_buckets=B, ngram_max=NG).collect()}
    assert got == want


def _md5_rank_key(salt: str, doc_id: int) -> tuple:
    import hashlib

    return (hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest(), doc_id)


def test_epoch_materialize_matches_python_model(spark):
    """Randomized parity for the sampling-with-replacement materializer:
    per-group targets above/below/at group size, repeat counts and epoch
    indices recomputed from scratch in Python (md5 keep-rank, floor/mod
    arithmetic)."""
    from ncbi_analysis_spark.operators.scale import epoch_materialize

    rnd = random.Random(41)
    for trial in range(3):
        groups = ["g%d" % i for i in range(rnd.randrange(2, 5))]
        rows, targets = [], []
        nid = 0
        for g in groups:
            n = rnd.randrange(1, 15)
            for _ in range(n):
                rows.append((nid, g))
                nid += 1
            targets.append((g, rnd.choice([0, 1, n - 1 if n > 1 else 1, n,
                                           n + 3, 3 * n + rnd.randrange(3)])))
        df = spark.createDataFrame(rows, "doc_id long, g string")
        t = spark.createDataFrame(targets, "g string, quota long")
        got = sorted((r["doc_id"], r["epoch"]) for r in
                     epoch_materialize(df, t, ["g"], "doc_id").collect())

        want = []
        tmap = dict(targets)
        by_g: dict = {}
        for doc_id, g in rows:
            by_g.setdefault(g, []).append(doc_id)
        for g, ids in by_g.items():
            n, target = len(ids), tmap[g]
            order = sorted(ids, key=lambda i: _md5_rank_key("quota", i))
            base, extra = target // n, target % n
            for rank, doc_id in enumerate(order, start=1):
                reps = base + (1 if rank <= extra else 0)
                want += [(doc_id, e) for e in range(1, reps + 1)]
        assert got == sorted(want), f"trial {trial}"


def test_quantile_and_curriculum_match_python_model(spark):
    """Randomized parity for the discrete quantile threshold and the
    curriculum shard map on scores with heavy ties and NULLs."""
    from ncbi_analysis_spark.operators.scale import (
        curriculum_shards,
        quantile_threshold,
    )

    rnd = random.Random(43)
    for trial in range(3):
        vals = [rnd.choice([None, 0.0, 1.0, 2.0, 3.5, 7.25,
                            float(rnd.randrange(10))])
                for _ in range(rnd.randrange(20, 120))]
        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "doc_id long, s double")
        present = sorted(v for v in vals if v is not None)
        n = len(present)
        if n == 0:
            continue
        for q in (0.25, 0.5, 0.9, 1.0):
            want = present[math.ceil(q * n) - 1]
            got = quantile_threshold(df, "s", q).first()["threshold"]
            assert got == want, (trial, q)

        n_shards = rnd.randrange(1, 6)
        got_sh = {r["doc_id"]: r["shard"] for r in
                  curriculum_shards(df, "s", "doc_id", n_shards).collect()}
        # python model: distinct-score cum -> shard map
        from collections import Counter
        cnt = Counter(present)
        cum, smap = 0, {}
        for v in sorted(cnt):
            cum += cnt[v]
            smap[v] = min((cum * n_shards + n - 1) // n, n_shards)
        want_sh = {i: smap[v] for i, v in enumerate(vals) if v is not None}
        assert got_sh == want_sh, trial
