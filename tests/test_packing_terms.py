"""Invariant tests for the round-3b training-pipeline operators:
sequence packing, quota sampling, TF-IDF top terms, embedding quantize.
(Exact cross-engine values are covered by the driver oracles; these
tests pin the structural invariants the oracle can't see.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ncbi_analysis_spark.functions import vectors as V
from ncbi_analysis_spark.operators.packing import pack_fragments, packing_stats
from ncbi_analysis_spark.operators.scale import quota_sample
from ncbi_analysis_spark.operators.terms import tfidf_top_terms


def _docs(spark, n=80):
    rows = [(i, " ".join(f"w{j % 7}" for j in range(1 + (i * 13) % 40))) for i in range(n)]
    rows.append((n, "   "))  # whitespace-only -> 0 tokens, must be dropped
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pack_fragments_invariants(spark):
    capacity = 32
    frags = pack_fragments(_docs(spark), capacity=capacity, n_shards=3).cache()
    rows = frags.collect()
    assert rows, "no fragments produced"

    # every doc's fragments are contiguous and cover [0, n_tokens)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, fr in by_doc.items():
        fr.sort(key=lambda r: r.frag_start)
        assert fr[0].frag_start == 0
        assert fr[-1].frag_end == fr[0].n_tokens
        for a, b in zip(fr, fr[1:]):
            assert a.frag_end == b.frag_start
            assert b.bin_id == a.bin_id + 1  # crossing docs advance bins densely
        assert len({r.shard for r in fr}) == 1  # a doc lives in one shard

    # zero-token doc dropped
    assert 80 not in by_doc

    # every bin except the last of its shard is exactly full; none overflow
    fill: dict[tuple, int] = {}
    last_bin = {}
    for r in rows:
        fill[(r.shard, r.bin_id)] = fill.get((r.shard, r.bin_id), 0) + (
            r.frag_end - r.frag_start
        )
        last_bin[r.shard] = max(last_bin.get(r.shard, -1), r.bin_id)
    for (shard, bin_id), tot in fill.items():
        if bin_id < last_bin[shard]:
            assert tot == capacity, (shard, bin_id, tot)
        else:
            assert 0 < tot <= capacity

    # fragments within a bin tile it without gaps or overlap
    by_bin: dict[tuple, list] = {}
    for r in rows:
        by_bin.setdefault((r.shard, r.bin_id), []).append(r)
    for (shard, bin_id), fr in by_bin.items():
        fr.sort(key=lambda r: r.bin_off)
        assert fr[0].bin_off == 0
        for a, b in zip(fr, fr[1:]):
            assert a.bin_off + (a.frag_end - a.frag_start) == b.bin_off

    st = packing_stats(frags, capacity).collect()
    assert {s.shard for s in st} == {r.shard for r in rows}
    for s in st:
        assert 0 < s.fill_ratio <= 1.0


def test_pack_fragments_partition_invariant(spark):
    """Same fragments regardless of input partitioning (md5 order, not
    physical order)."""
    d = _docs(spark)
    a = sorted(map(tuple, pack_fragments(d, capacity=32, n_shards=3).collect()))
    b = sorted(
        map(tuple, pack_fragments(d.repartition(7), capacity=32, n_shards=3).collect())
    )
    assert a == b


def test_pack_fragments_rejects_bad_capacity(spark):
    import pytest

    with pytest.raises(ValueError, match="capacity"):
        pack_fragments(_docs(spark), capacity=0)


def test_quota_sample_caps_and_is_deterministic(spark):
    rows = [(i, "g%d" % (i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    out = quota_sample(df, ["grp"], "id", 7)
    got = out.groupBy("grp").count().collect()
    assert all(r["count"] == 7 for r in got) and len(got) == 3
    # subset of input, stable across partitioning
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, quota_sample(df.repartition(5), ["grp"], "id", 7).collect()))
    assert a == b
    assert set(a) <= set(map(tuple, rows))
    # quota above group size keeps everything
    assert quota_sample(df, ["grp"], "id", 1000).count() == 100


def test_tfidf_top_terms_ranking(spark):
    df = spark.createDataFrame(
        [
            (1, "apple apple apple shared"),
            (2, "banana shared shared"),
            (3, "cherry shared"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.rk)
        # rank is dense from 1 and ordered by (score desc, term)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert (a.score, b.term) >= (b.score, a.term)
    # the doc-unique term always outranks the everywhere-term
    assert by_doc[1][0].term == "apple"
    assert by_doc[2][0].term == "banana"
    assert by_doc[3][0].term == "cherry"
    # df counts documents, not occurrences
    shared = [r for r in out if r.term == "shared"]
    assert shared and all(r.df == 3 for r in shared)
    apple = [r for r in out if r.term == "apple"][0]
    assert apple.tf == 3 and apple.df == 1


def test_quantize_int8_and_normalize(spark):
    df = spark.createDataFrame(
        [
            (1, [3.0, -4.0]),
            (2, [0.0, 0.0]),
            (3, [1.0, 0.5, -1.0]),
        ],
        ["id", "vec"],
    )
    out = df.select(
        "id",
        V.quantize_int8(F.col("vec")).alias("q"),
        V.l2_normalize(F.col("vec")).alias("n"),
        V.norm(V.l2_normalize(F.col("vec"))).alias("un"),
    ).collect()
    byid = {r.id: r for r in out}
    # max-|x| element maps to ±127; all values within [-127, 127]
    assert byid[1].q == [95, -127]
    assert byid[3].q[0] == 127 and byid[3].q[2] == -127
    assert all(-127 <= v <= 127 for r in out for v in r.q)
    # zero vector: zero quant, unchanged normalize
    assert byid[2].q == [0, 0] and byid[2].n == [0.0, 0.0]
    assert abs(byid[1].un - 1.0) < 1e-12 and abs(byid[3].un - 1.0) < 1e-12
    assert abs(byid[1].n[0] - 0.6) < 1e-15 and abs(byid[1].n[1] + 0.8) < 1e-15


def test_pack_fragments_plan_no_single_partition(spark):
    """The packing window keys on shard — a real partition key. A global
    ordered cumsum would show as 'Exchange SinglePartition' (the
    locate_matches trap from VERDICT r02); guard against regressing."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        pack_fragments(d, capacity=128, n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan, plan[:2000]
    assert "hashpartitioning(shard" in plan


def test_quantize_normalize_map_only(spark):
    """Embedding transforms are per-row expressions — no shuffle."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = e.select(
        V.quantize_int8(F.col("embedding")).alias("q"),
        V.l2_normalize(F.col("embedding")).alias("n"),
    )
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()


def test_pack_fragments_matches_python_reference(spark):
    """Randomized cross-check against an independent pure-Python packer:
    same md5 sharding/ordering, simulated stream concat, chunk slicing."""
    import hashlib
    import random

    rnd = random.Random(7)
    docs = [(i, " ".join("t%d" % rnd.randint(0, 9) for _ in range(rnd.randint(0, 70))))
            for i in range(200)]
    capacity, n_shards, salt = 48, 5, "pack"

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    expected = set()
    streams: dict[int, list] = {}
    for doc_id, text in docs:
        n_tok = len(text.split())
        if n_tok == 0:
            continue
        shard = h32(salt + str(doc_id)) % n_shards
        ordk = hashlib.md5((salt + "|" + str(doc_id)).encode()).hexdigest()
        streams.setdefault(shard, []).append((ordk, doc_id, n_tok))
    for shard, items in streams.items():
        pos = 0
        for _, doc_id, n_tok in sorted(items):
            start, end = pos, pos + n_tok
            for b in range(start // capacity, (end - 1) // capacity + 1):
                lo, hi = max(start, b * capacity), min(end, (b + 1) * capacity)
                expected.add(
                    (shard, b, doc_id, n_tok, lo - start, hi - start, lo - b * capacity)
                )
            pos = end

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = set(map(tuple, pack_fragments(
        df, capacity=capacity, n_shards=n_shards, salt=salt).collect()))
    assert got == expected


def test_pack_and_quota_empty_inputs(spark):
    d = spark.createDataFrame([], "doc_id long, text string")
    assert pack_fragments(d, capacity=16).count() == 0
    assert quota_sample(d, ["text"], "doc_id", 3).count() == 0
    assert tfidf_top_terms(d).count() == 0


def test_token_rarity_hand_computed(spark):
    from ncbi_analysis_spark.operators.terms import token_rarity

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta"), (3, "alpha zulu")],
        ["doc_id", "text"],
    )
    # df: alpha=3, beta=2, gamma=1, zulu=1
    out = {r["doc_id"]: r for r in token_rarity(df).collect()}
    assert out[1]["n_tok"] == 3
    assert out[1]["sum_df"] == 6 and out[1]["mean_df"] == 2.0
    assert out[1]["hapax_frac"] == 1 / 3  # gamma
    assert out[2]["sum_df"] == 5 and out[2]["hapax_frac"] == 0.0
    assert out[3]["sum_df"] == 4 and out[3]["hapax_frac"] == 0.5  # zulu


def test_char_ngram_lm_and_score(spark):
    """Char-trigram LM counts and per-doc scoring against a hand-computed
    model, including OOV handling and the exact shared-denominator
    probability mass."""
    from ncbi_analysis_spark.operators.terms import (
        char_ngram_lm,
        char_ngrams,
        ngram_lm_score,
    )

    train = spark.createDataFrame(
        [(1, "abcabc"), (2, "abcd")], ["doc_id", "text"])
    # trigram occurrences: abc x2(d1) +1(d2), bca 1, cab 1, bcd 1
    lm = {r["ngram"]: r["cnt"] for r in char_ngram_lm(train, n=3).collect()}
    assert lm == {"abc": 3, "bca": 1, "cab": 1, "bcd": 1}
    assert char_ngram_lm(train, n=3, min_count=2).count() == 1  # only abc

    # short docs contribute nothing
    assert char_ngrams(spark.createDataFrame([(9, "ab")], ["doc_id", "text"]),
                       n=3).count() == 0

    lm_df = char_ngram_lm(train, n=3)  # total = 6
    test = spark.createDataFrame([(10, "abcx"), (11, "zzzz")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in ngram_lm_score(test, lm_df, n=3).collect()}
    # doc 10: grams abc(3), bcx(oov) -> n=2, oov=1, sum=3/6
    assert (out[10]["n_grams"], out[10]["oov"]) == (2, 1)
    assert out[10]["sum_prob"] == 3 / 6
    assert out[10]["mean_prob"] == 3 / 6 / 2
    # doc 11: all OOV -> sum_prob exactly 0
    assert (out[11]["n_grams"], out[11]["oov"], out[11]["sum_prob"]) == (2, 2, 0.0)


def test_ngram_lm_case_folding(spark):
    from ncbi_analysis_spark.operators.terms import char_ngram_lm

    df = spark.createDataFrame([(1, "AbCaBc")], ["doc_id", "text"])
    lm = {r["ngram"]: r["cnt"] for r in char_ngram_lm(df, n=3).collect()}
    assert lm == {"abc": 2, "bca": 1, "cab": 1}


def test_dsir_importance_direction_and_determinism(spark):
    """DSIR (hashed-n-gram importance weights): documents drawn from the
    target distribution must outscore raw-typical ones, the weight table
    covers every bucket, and the bucket-ordered fold is partition-layout
    invariant."""
    from ncbi_analysis_spark.operators.terms import dsir_logratios, dsir_score

    target_rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    other_rows = [(100 + i, "lorem ipsum dolor sit amet consectetur") for i in range(10)]
    corpus = spark.createDataFrame(target_rows + other_rows, ["doc_id", "text"])
    target = spark.createDataFrame(target_rows, ["doc_id", "text"])
    w = dsir_logratios(target, corpus, "text", "doc_id", n_buckets=256, ngram_max=2)
    assert w.count() == 256
    scored = {r["doc_id"]: r["logw"] for r in
              dsir_score(corpus, "text", "doc_id", w,
                         n_buckets=256, ngram_max=2).collect()}
    assert len(scored) == 20
    # every target-like doc beats every raw-only doc
    assert min(scored[i] for i in range(10)) > max(scored[100 + i] for i in range(10))
    # layout invariance: the fold sorts buckets, so repartitioning the
    # corpus cannot move a single bit of the score
    re_scored = {r["doc_id"]: r["logw"] for r in
                 dsir_score(corpus.repartition(7), "text", "doc_id", w,
                            n_buckets=256, ngram_max=2).collect()}
    assert scored == re_scored


def test_dsir_partial_shingle_semantics(spark):
    """A 1-token document contributes its token at every n (the
    shingle_rows partial rule) — n_feats counts it ngram_max times."""
    from ncbi_analysis_spark.operators.terms import dsir_logratios, dsir_score

    docs = spark.createDataFrame([(0, "solo")], ["doc_id", "text"])
    w = dsir_logratios(docs, docs, "text", "doc_id", n_buckets=64, ngram_max=2)
    out = dsir_score(docs, "text", "doc_id", w, n_buckets=64, ngram_max=2).collect()
    assert out[0]["n_feats"] == 2
    # target == raw -> every bucket weight is 0 -> the score is exactly 0
    assert out[0]["logw"] == 0.0


def test_batch_scorer_engines_bit_parity(spark):
    """The r15 hybrid batch scorer (one Arrow map-only pass, see
    _score_fold_np) must be row- and bit-identical to the expr pipeline
    for both dsir_score and quality_probability — including NULL text
    (dropped), the empty string (one ''-token doc), sub-n partial
    shingles, and multibyte text (utf-8 md5 parity)."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.terms import (
        dsir_logratios_pred,
        dsir_score,
        quality_classifier_weights,
        quality_probability,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "lorem ipsum dolor sit amet", "la"),
        (2, None, "en"),
        (3, "", "en"),
        (4, "solo", "la"),
        (5, "héllo wörld 世界", "de"),
        (6, "the the the of of and to a in is", "en"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    w = dsir_logratios_pred(d, F.col("lang") == "en", "text", "doc_id",
                            n_buckets=128, ngram_max=2)
    a = dsir_score(d, "text", "doc_id", w, 128, 2,
                   engine="expr").orderBy("doc_id").collect()
    b = dsir_score(d, "text", "doc_id", w, 128, 2,
                   engine="hybrid").orderBy("doc_id").collect()
    assert a == b and len(a) == 6  # NULL-text doc dropped under both

    qw, bias = quality_classifier_weights(
        d.filter(F.col("lang") == "en"), d.filter(F.col("lang") != "en"),
        "text", "doc_id", n_buckets=64, ngram_max=2)
    qa = quality_probability(d, "text", "doc_id", qw, bias, 64, 2,
                             engine="expr").orderBy("doc_id").collect()
    qb = quality_probability(d, "text", "doc_id", qw, bias, 64, 2,
                             engine="hybrid").orderBy("doc_id").collect()
    assert qa == qb and len(qa) == 6


def test_chunk_documents_windows(spark):
    """Sliding-window chunking: overlap via stride, short final window,
    empty doc keeps one empty chunk, chunk_no is document order."""
    from ncbi_analysis_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "x"), (2, "")], ["doc_id", "text"])
    out = chunk_documents(df, "text", "doc_id", max_tokens=4, stride=2)
    got = {(r["doc_id"], r["chunk_no"]): (r["chunk_text"], r["n_tokens"])
           for r in out.collect()}
    assert got[(0, 0)] == ("a b c d", 4)
    assert got[(0, 1)] == ("c d e", 3)
    # no (0, 2) "e" chunk: window starts stop once a window reaches the
    # document end, so a contained tail is never emitted
    assert got[(1, 0)] == ("x", 1)
    assert got[(2, 0)] == ("", 0)
    assert len(got) == 4
    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive"):
        chunk_documents(df, "text", "doc_id", max_tokens=4, stride=0)


def test_chunk_documents_gap_sampling_no_phantom_tail(spark):
    """stride > max_tokens (gap sampling) must not emit a start past the
    document end: n=60, max=48, stride=64 previously produced a phantom
    empty chunk at start 64 with n_tokens = -4 (round-7 review)."""
    from ncbi_analysis_spark.operators.packing import chunk_documents

    text = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = chunk_documents(df, "text", "doc_id",
                           max_tokens=48, stride=64).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_no"] == 0 and rows[0]["n_tokens"] == 48
    # a doc long enough for a second gap-sampled window still gets it
    text2 = " ".join(f"w{i}" for i in range(120))
    df2 = spark.createDataFrame([(0, text2)], ["doc_id", "text"])
    got = {r["chunk_no"]: r["n_tokens"]
           for r in chunk_documents(df2, "text", "doc_id",
                                    max_tokens=48, stride=64).collect()}
    assert got == {0: 48, 1: 48}
    # n_tokens is never negative / chunk never starts past the end for a
    # sweep of (max_tokens, stride) shapes including stride > max
    df3 = spark.createDataFrame(
        [(i, " ".join("t" * 1 for _ in range(n)))
         for i, n in enumerate([0, 1, 5, 47, 48, 49, 63, 64, 65, 130])],
        ["doc_id", "text"])
    for mx, st in ((48, 64), (4, 9), (1, 3)):
        for r in chunk_documents(df3, "text", "doc_id",
                                 max_tokens=mx, stride=st).collect():
            assert r["n_tokens"] >= 0, (mx, st, r)


def test_chunk_documents_matches_python_model(spark):
    """Randomized docs vs a from-scratch window model; every token of
    every doc appears in at least one chunk (no silent loss)."""
    import random as _random

    from ncbi_analysis_spark.operators.packing import chunk_documents

    rnd = _random.Random(59)
    docs = []
    for i in range(80):
        n = rnd.choice([0, 1, 2, 3, 7, 16, 33])
        docs.append((i, " ".join(f"w{rnd.randrange(50)}" for _ in range(n))))
    for mx, st in ((8, 8), (8, 3), (5, 5)):
        want = {}
        for i, t in docs:
            toks = t.split() if t.strip() else []
            n = len(toks)
            last = max(-(-(n - mx) // st), 0) * st
            starts = list(range(0, last + 1, st))
            for cn, s in enumerate(starts):
                w = toks[s:s + mx]
                want[(i, cn)] = (" ".join(w), len(w))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {(r["doc_id"], r["chunk_no"]): (r["chunk_text"], r["n_tokens"])
               for r in chunk_documents(df, "text", "doc_id",
                                        max_tokens=mx, stride=st).collect()}
        assert got == want, (mx, st)


def test_round6_new_ops_empty_inputs(spark):
    """Degenerate-input behavior for the round's new operators: empty
    corpora produce empty (or pure-smoothing) results, never crashes."""
    from ncbi_analysis_spark.operators.dedup import semantic_dedup
    from ncbi_analysis_spark.operators.packing import chunk_documents
    from ncbi_analysis_spark.operators.scale import temperature_quotas
    from ncbi_analysis_spark.operators.terms import dsir_logratios, dsir_score

    empty_e = spark.createDataFrame([], schema="id bigint, v array<float>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], schema="c_id bigint, v array<double>")
    assert semantic_dedup(empty_e, "v", "id", cents).count() == 0

    empty_d = spark.createDataFrame([], schema="doc_id bigint, text string")
    one_d = spark.createDataFrame([(0, "hello world")], ["doc_id", "text"])
    # an empty raw corpus still yields the full smoothed weight table
    assert dsir_logratios(one_d, empty_d, "text", "doc_id",
                          n_buckets=16).count() == 16
    w = dsir_logratios(one_d, one_d, "text", "doc_id", n_buckets=16)
    assert dsir_score(empty_d, "text", "doc_id", w, n_buckets=16).count() == 0
    assert temperature_quotas(empty_d, ["text"], total=10).count() == 0
    assert chunk_documents(empty_d, "text", "doc_id").count() == 0


def test_chunk_documents_null_text(spark):
    """NULL text behaves as the empty document: one empty chunk, not a
    junk NULL row (review finding)."""
    from ncbi_analysis_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(0, None), (1, "a b")], "doc_id long, text string")
    got = {(r["doc_id"], r["chunk_no"]): (r["chunk_text"], r["n_tokens"])
           for r in chunk_documents(df, "text", "doc_id", max_tokens=4).collect()}
    assert got[(0, 0)] == ("", 0)
    assert got[(1, 0)] == ("a b", 2)


def test_semantic_dedup_np_string_ids(spark):
    """The BLAS pair stage must work for non-long id types (review
    finding: the schema previously hardcoded long)."""
    from ncbi_analysis_spark.operators import dedup as dd

    rows = [("a", [1.0, 0.0]), ("b", [0.999, 0.01]), ("c", [0.0, 1.0])]
    df = spark.createDataFrame(rows, schema="id string, v array<float>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], schema="c_id bigint, v array<double>")
    out = {r["id"]: r.asDict() for r in dd.semantic_dedup(
        df, "v", "id", cents, threshold=0.95, pair_method="np").collect()}
    assert out["a"]["component"] == "a" and out["b"]["component"] == "a"
    assert out["b"]["keep"] and not out["a"]["keep"]
    assert out["c"]["keep"] and out["c"]["component"] is None


def test_quality_classifier_direction_and_parity(spark, tmp_path):
    """Target-like docs must score strictly higher than non-target docs,
    the local twin must reproduce the Spark weights bit-exactly, and
    scoring must be layout-invariant."""
    from ncbi_analysis_spark.operators.terms import (
        quality_classifier_local,
        quality_classifier_weights,
        quality_probability,
    )

    rows = [(i, "good clean prose sentence %d" % (i % 3), "en") for i in range(8)]
    rows += [(100 + i, "zzz qqq %d spam spam spam" % (i % 3), "xx") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    params = dict(n_buckets=64, ngram_max=2, iters=50)
    w, bias = quality_classifier_weights(
        df.filter("lang = 'en'"), df.filter("lang != 'en'"),
        "text", "doc_id", **params)
    scored = quality_probability(df.select("doc_id", "text"), "text", "doc_id",
                                 w, bias, n_buckets=64, ngram_max=2)
    got = {r["doc_id"]: r["prob"] for r in scored.collect()}
    assert min(got[i] for i in range(8)) > max(got[100 + i] for i in range(8))
    assert all(0.0 <= p <= 1.0 for p in got.values())

    # local twin: identical (bucket, w) floats and bias
    p = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(p)
    lw, lbias = quality_classifier_local(
        p, target_pred=lambda r: r["lang"] == "en", **params)
    sw = {r["bucket"]: r["w"] for r in w.collect()}
    assert lbias == bias
    assert sw == dict(lw)

    # layout invariance: a different partitioning folds to the same doubles
    re_scored = quality_probability(
        df.select("doc_id", "text").repartition(13), "text", "doc_id",
        w, bias, n_buckets=64, ngram_max=2)
    assert {r["doc_id"]: (r["logit"], r["prob"]) for r in re_scored.collect()} \
        == {r["doc_id"]: (r["logit"], r["prob"]) for r in scored.collect()}


def test_logistic_fit_degenerate(spark):
    """Empty counts -> zero model; training is deterministic across calls."""
    import numpy as np

    from ncbi_analysis_spark.operators.terms import _logistic_fit

    w, b = _logistic_fit([0, 0], [0, 0])
    assert list(w) == [0.0, 0.0] and b == 0.0
    w1, b1 = _logistic_fit([5, 0, 1], [0, 7, 1])
    w2, b2 = _logistic_fit([5, 0, 1], [0, 7, 1])
    assert list(w1) == list(w2) and b1 == b2
    # direction: target-heavy bucket positive, nontarget-heavy negative
    assert w1[0] > 0 > w1[1]
    assert not np.isnan(b1)


def test_dsir_logratios_pred_matches_two_frame_form(spark):
    """The fused single-pass fit must produce BIT-identical weights to
    the two-frame form on the same (raw, target=filter(pred)) input —
    including docs with NULL predicate values (non-target, matching
    filter semantics)."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.terms import (
        dsir_logratios,
        dsir_logratios_pred,
    )

    rows = [
        (1, "the quick brown fox", "en"),
        (2, "der schnelle braune fuchs", "de"),
        (3, "the lazy dog sleeps", "en"),
        (4, "le chien paresseux", "fr"),
        (5, "one token", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    two = {r["bucket"]: r["w"] for r in dsir_logratios(
        df.filter(F.col("lang") == "en"), df, "text", "doc_id",
        n_buckets=64, ngram_max=2).collect()}
    fused = {r["bucket"]: r["w"] for r in dsir_logratios_pred(
        df, F.col("lang") == "en", "text", "doc_id",
        n_buckets=64, ngram_max=2).collect()}
    assert two == fused  # exact double equality, not approx
