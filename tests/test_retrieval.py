"""BM25 retrieval tests: ranking semantics on hand-built corpora, the
cross-library transcendental probe the oracle's exactness rests on,
and input validation."""

from __future__ import annotations

import math

import pytest

from ncbi_analysis_spark.operators import retrieval as rt


def _corpus(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")


def test_bm25_idf_favors_rare_terms(spark):
    # 'zebra' appears in 1 doc, 'data' in all: the zebra doc must
    # outrank every data-only doc for the query "zebra data"
    texts = ["zebra data pipeline", "data data data", "data model",
             "data lake", "big data"]
    rows = rt.bm25_topk(_corpus(spark, texts), "zebra data", k=5).collect()
    assert rows[0]["doc_id"] == 0
    assert rows[0]["n_terms_matched"] == 2
    assert rows[0]["score"] > rows[1]["score"]


def test_bm25_tf_saturation_and_length_norm(spark):
    # same tf, shorter doc wins (length normalization); higher tf wins
    # at equal length but saturates (k1): going 1->2 occurrences gains
    # more than 5->6
    texts = [
        "term filler filler filler filler filler filler filler",  # tf=1 long
        "term filler",                                            # tf=1 short
        "term term filler filler",                                # tf=2
    ]
    got = {r["doc_id"]: r["score"]
           for r in rt.bm25_topk(_corpus(spark, texts), "term", k=5).collect()}
    assert got[1] > got[0]          # shorter doc, same tf
    assert got[2] > got[1]          # more tf at comparable length

    sat = ["term a b c", "term term a b", "term term term a",
           "term term term term", "x y z w"]
    s = {r["doc_id"]: r["score"]
         for r in rt.bm25_topk(_corpus(spark, sat), "term", k=5).collect()}
    gain_12 = s[1] - s[0]
    gain_23 = s[2] - s[1]
    assert gain_12 > gain_23 > 0    # diminishing returns in tf


def test_bm25_matches_python_model(spark):
    """Full pinned-arithmetic replica: scores must equal a pure-Python
    BM25 computed with the same operation order, bit-for-bit."""
    texts = ["dup merge stream", "merge stream stream merge",
             "dup dup alpha", "stream beta gamma delta", "omega phi"]
    rows = rt.bm25_topk(_corpus(spark, texts), "dup stream", k=5).collect()
    toks = [t.split() for t in texts]
    n = len(texts)
    avgdl = float(sum(len(t) for t in toks)) / float(n)
    df = {q: sum(1 for t in toks if q in t) for q in ("dup", "stream")}
    idf = {q: math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
           for q in df}
    want = {}
    for i, t in enumerate(toks):
        score, matched = 0.0, 0
        for q in sorted(df):        # term-order fold, the pinned order
            tf = t.count(q)
            if tf:
                matched += 1
                score = score + idf[q] * (
                    float(tf) / (float(tf) + 1.2 * (
                        (1.0 - 0.75) + 0.75 * (float(len(t)) / avgdl))))
        if matched:
            want[i] = (matched, score)
    got = {r["doc_id"]: (r["n_terms_matched"], r["score"]) for r in rows}
    assert got == want


def test_bm25_libm_probe():
    """The oracle's exactness premise: Python math.log and DuckDB ln
    resolve to the same correctly-rounded libm on this platform —
    probed across the whole realistic (N, df) grid. If this ever
    breaks, bm25_search's oracle must switch to generated idf
    literals."""
    import duckdb

    con = duckdb.connect()
    for n in (50, 500, 5000, 50000):
        for dfv in list(range(0, 50)) + [n // 2, n - 1]:
            py = math.log(1.0 + (n - dfv + 0.5) / (dfv + 0.5))
            db = con.execute(
                "SELECT ln(1.0 + (?::DOUBLE - ?::DOUBLE + 0.5)"
                " / (?::DOUBLE + 0.5))", [n, dfv, dfv]).fetchone()[0]
            assert py == db, (n, dfv)


def test_bm25_validation_and_nulls(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, None)], "doc_id long, text string")
    with pytest.raises(ValueError, match="no terms"):
        rt.bm25_topk(df, "   ")
    out = rt.bm25_topk(df, "alpha", k=5).collect()
    assert [r["doc_id"] for r in out] == [0]
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        rt.bm25_topk(empty, "alpha")


# --- persisted BM25 index + batch search -----------------------------


def test_bm25_index_append_equals_rebuild(spark, tmp_path):
    """Append ≡ rebuild: write(A) + append(B) must yield the same index
    CONTENTS as write(A∪B), and batch search over the appended index
    must bit-match the from-scratch single-query scorer."""
    texts = ["dup merge stream", "merge stream stream merge",
             "dup dup alpha", "stream beta gamma delta", "omega phi",
             "alpha beta dup", "merge omega", "stream stream alpha"]
    d = _corpus(spark, texts)
    split_idx = str(tmp_path / "split")
    full_idx = str(tmp_path / "full")
    a = d.filter("doc_id < 4")
    b = d.filter("doc_id >= 4")
    rt.write_bm25_index(a, split_idx, n_buckets=4)
    counts = rt.append_to_bm25_index(b, split_idx, n_buckets=4)
    assert counts.agg({"n_appended": "sum"}).collect()[0][0] > 0
    rt.write_bm25_index(d, full_idx, n_buckets=4)

    def contents(p):
        i = rt.read_bm25_index(spark, p)
        post = {(r["g"], r["doc_id"], r["tf"], r["bucket"])
                for r in i["postings"].collect()}
        dls = {(r["doc_id"], r["dl"]) for r in i["doclens"].collect()}
        return post, dls

    assert contents(split_idx) == contents(full_idx)

    qdf = spark.createDataFrame(
        [(1, "dup stream"), (2, "omega alpha")],
        "query_id long, query string")
    out = rt.bm25_topk_batch(spark, split_idx, qdf, k=5).collect()
    for qid, q in [(1, "dup stream"), (2, "omega alpha")]:
        want = [(r["doc_id"], r["n_terms_matched"], r["score"])
                for r in rt.bm25_topk(d, q, k=5).collect()]
        got = [(r["doc_id"], r["n_terms_matched"], r["score"])
               for r in sorted((r for r in out if r["query_id"] == qid),
                               key=lambda r: r["rk"])]
        assert got == want, qid


def test_bm25_index_param_guard_and_validation(spark, tmp_path):
    d = _corpus(spark, ["alpha beta", "beta gamma"])
    idx = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="not a write_bm25_index"):
        rt.read_bm25_index(spark, idx)
    rt.write_bm25_index(d, idx, n_buckets=8)
    with pytest.raises(ValueError, match="built with"):
        rt.append_to_bm25_index(d, idx, n_buckets=4)
    qdf = spark.createDataFrame([(1, "   ")], "query_id long, query string")
    with pytest.raises(ValueError, match="no query terms"):
        rt.bm25_topk_batch(spark, idx, qdf)


def test_bm25_batch_rank_and_miss_semantics(spark, tmp_path):
    # a query whose terms miss the corpus entirely yields no rows for
    # that query_id (not an error), and rk is 1-based contiguous
    d = _corpus(spark, ["alpha beta", "beta gamma", "gamma delta"])
    idx = str(tmp_path / "idx")
    rt.write_bm25_index(d, idx, n_buckets=8)
    qdf = spark.createDataFrame(
        [(1, "beta"), (2, "zzz_missing")], "query_id long, query string")
    rows = rt.bm25_topk_batch(spark, idx, qdf, k=10).collect()
    assert {r["query_id"] for r in rows} == {1}
    assert [r["rk"] for r in rows if r["query_id"] == 1] == [1, 2]


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rk long")


def test_rrf_fuse_matches_python_model(spark):
    """Pinned-arithmetic replica: fused scores must equal a pure-Python
    RRF folded in (list, rank) order, bit-for-bit."""
    a = [(10, 1), (11, 2), (12, 3)]
    b = [(12, 1), (10, 2), (13, 3), (14, 4)]
    got = {
        r["doc_id"]: (r["n_lists"], r["rrf_score"])
        for r in rt.rrf_fuse(
            [_ranking(spark, a), _ranking(spark, b)]
        ).collect()
    }
    want = {}
    for src, lst in enumerate([a, b]):
        for doc, rk in lst:
            n, s = want.get(doc, (0, 0.0))
            want[doc] = (n + 1, s + 1.0 / (60.0 + float(rk)))
    assert got == want
    # 1/61+1/62 (doc 10) > 1/61+1/63 (doc 12): assert the hand-derived
    # ordering, not just the replica equality
    assert got[10][1] > got[12][1] > got[11][1]
    assert got[11][1] > got[13][1] > got[14][1]
    assert got[10][0] == 2 and got[13][0] == 1


def test_rrf_fuse_consensus_beats_single_list(spark):
    # a mid-rank doc on BOTH lists outranks either list's runner-up
    # that the other list missed — the reason to fuse at all
    a = [(1, 1), (2, 2), (3, 3)]
    b = [(4, 1), (2, 2), (5, 3)]
    rows = rt.rrf_fuse([_ranking(spark, a), _ranking(spark, b)]).collect()
    top = max(rows, key=lambda r: (r["rrf_score"], -r["doc_id"]))
    assert top["doc_id"] == 2 and top["n_lists"] == 2


def test_rrf_fuse_input_order_invariant(spark):
    """The fold sorts by (list index, rank), so partition/row order of
    the inputs cannot change a single bit of the result; swapping the
    LISTS swaps fold order and is allowed to differ (documented), but
    here both orders are checked for self-consistency."""
    a = [(i, i + 1) for i in range(8)]
    b = [(i + 4, i + 1) for i in range(8)]
    da = _ranking(spark, a).repartition(7)
    db = _ranking(spark, list(reversed(b))).repartition(3)
    r1 = {(r["doc_id"], r["n_lists"], r["rrf_score"])
          for r in rt.rrf_fuse([da, db]).collect()}
    r2 = {(r["doc_id"], r["n_lists"], r["rrf_score"])
          for r in rt.rrf_fuse([da.repartition(2), db]).collect()}
    assert r1 == r2


def test_rrf_fuse_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        rt.rrf_fuse([])


# ---------------------------------------------------------------------------
# retrieval_eval (r15)
# ---------------------------------------------------------------------------


def test_retrieval_eval_hand_computed(spark):
    """nDCG/MRR/P@k/recall against hand-computed values on a tiny
    judged set, including: a perfect ranking (ndcg 1), a missed query
    (all zeros), a no-relevant query (recall NULL, ndcg 0), and a
    query absent from results entirely (reported, scored 0)."""
    import math

    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.retrieval import retrieval_eval

    results = spark.createDataFrame(
        [  # q1: perfect order of its two relevant docs
            (1, 101, 1), (1, 102, 2), (1, 999, 3),
            # q2: relevant doc at rank 3 only
            (2, 201, 1), (2, 202, 2), (2, 203, 3),
            # q3: judged query with no relevant docs at all
            (3, 301, 1),
        ],
        ["query_id", "doc_id", "rk"])
    qrels = spark.createDataFrame(
        [(1, 101, 2), (1, 102, 1),
         (2, 203, 3), (2, 777, 1),
         (3, 301, 0),
         (4, 401, 2)],  # q4 never retrieved
        ["query_id", "doc_id", "rel"])

    out = {r["query_id"]: r
           for r in retrieval_eval(results, qrels, k=3).collect()}
    assert set(out) == {1, 2, 3, 4}

    # q1: dcg = 2/log2(2) + 1/log2(3) == idcg -> ndcg 1, mrr 1
    assert out[1]["ndcg_at_k"] == 1.0
    assert out[1]["mrr"] == 1.0
    assert out[1]["n_rel"] == 2 and out[1]["n_rel_ret"] == 2
    assert out[1]["recall_at_k"] == 1.0
    assert abs(out[1]["p_at_k"] - round(2 / 3, 6)) < 1e-9

    # q2: dcg = 3/log2(4); idcg = 3/log2(2) + 1/log2(3)
    dcg = 3 / 2.0
    idcg = 3.0 + 1 / math.log2(3)
    assert abs(out[2]["ndcg_at_k"] - round(dcg / idcg, 6)) < 1e-9
    assert abs(out[2]["mrr"] - round(1 / 3, 6)) < 1e-9
    assert out[2]["recall_at_k"] == 0.5  # 1 of 2 relevant retrieved

    # q3: no relevant docs -> ndcg/mrr 0, recall NULL
    assert out[3]["ndcg_at_k"] == 0.0 and out[3]["mrr"] == 0.0
    assert out[3]["recall_at_k"] is None

    # q4: judged but never retrieved -> zeros, not a missing row
    assert out[4]["ndcg_at_k"] == 0.0 and out[4]["n_rel_ret"] == 0
    assert out[4]["recall_at_k"] == 0.0

    # rank cut: rows past k are invisible
    res2 = results.withColumn("rk", F.col("rk") + 10)
    out2 = {r["query_id"]: r
            for r in retrieval_eval(res2, qrels, k=3).collect()}
    assert all(out2[q]["ndcg_at_k"] == 0.0 for q in out2)
