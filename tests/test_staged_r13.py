"""Round-13 staged-query semantics tests (the staged r13 queries'
pytest complement: tombstone/compaction contracts live in
test_index_delete.py; this file covers the new audit/streaming
operators)."""

from __future__ import annotations

def test_span_recall_audit_semantics(spark):
    """span_recall_audit on constructed corpora: anchor_bits=0 makes
    the candidate leg THE truth leg (recall exactly 1); at the real
    anchor density on unaligned copies recall lands strictly inside
    (0,1); no duplicates -> NULL recall; hit == anchored (anchored
    windows are truth windows by construction — measured, not
    assumed)."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.dedup import span_recall_audit

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [(1, base), (2, "xx" + base), (3, "unrelated text " * 12)]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    r0 = span_recall_audit(d, "text", "doc_id", anchor_bits=0).collect()[0]
    assert r0["recall"] == 1.0
    assert r0["truth_chars"] > 0

    r = span_recall_audit(d, "text", "doc_id", anchor_bits=4).collect()[0]
    assert 0.0 < r["recall"] < 1.0
    assert r["hit_chars"] == r["anchored_chars"] <= r["truth_chars"]
    assert r["n_sample"] == 3

    nodup = spark.createDataFrame(
        [(1, "alpha " * 10), (2, "omega " * 10)], "doc_id long, text string")
    rn = span_recall_audit(nodup, "text", "doc_id").collect()[0]
    assert rn["recall"] is None and rn["truth_chars"] == 0


def test_remove_dup_spans_exact_catches_unaligned_copy(spark):
    """anchor_bits=0 (exact mode) must remove an UNALIGNED duplicated
    passage entirely from the non-keeper — recall 1.0 by construction —
    while leaving the keeper and unrelated text intact; the removed
    char count equals the union of every duplicated 32-char window."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.dedup import remove_dup_spans

    passage = "duplicated passage body shared verbatim!"  # 40 chars
    rows = [
        (1, "AAA " + passage + " tail one"),
        (2, "longer unaligned prefix>> " + passage + " other tail"),
        (3, "no shared content whatsoever here at all"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_dup_spans(
        d, "text", "doc_id", window=32, min_docs=2, anchor_bits=0
    ).collect()}
    # keeper (min doc_id holding each window) keeps its copy
    assert out[1]["text"] == rows[0][1]
    assert out[1]["n_spans_removed"] == 0
    # the non-keeper loses every char covered by a duplicated window:
    # both docs share ' ' + the 40-char passage + ' ' -> 42 shared
    # chars, 11 window start positions, union = 42 chars
    assert out[2]["n_spans_removed"] == 1
    assert out[2]["n_chars_removed"] == 42
    assert passage not in out[2]["text"]
    assert out[2]["text"] == "longer unaligned prefix>>other tail"
    assert out[3]["text"] == rows[2][1]


def test_span_dup_stats_and_gate(spark):
    """Keeper-INCLUSIVE duplication mass in exact integer ppm: a doc
    wholly contained in another reads 1,000,000 ppm and is dropped by
    the gate; the superset doc's ratio is its shared-substring coverage
    over its own length; unrelated and NULL docs read 0 and survive."""
    from ncbi_analysis_spark.operators.dedup import (
        drop_high_dup_docs, span_dup_stats)

    shared = "this passage is duplicated between the documents"  # 48
    rows = [
        (1, shared),                                  # fully duplicated
        (2, shared + " plus a long unique tail making it mostly fresh "
                      "content and then some more padding words here"),
        (3, "entirely unrelated body of text with no overlap at all"),
        (4, None),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(window=32, min_docs=2, anchor_bits=0)
    stats = {r["doc_id"]: r for r in
             span_dup_stats(d, "text", "doc_id", **kw).collect()}
    assert stats[1]["dup_chars"] == stats[1]["n_chars"] == len(shared)
    assert stats[1]["dup_ratio_ppm"] == 1_000_000
    # doc 1 IS the shared passage exactly, so the common region in
    # doc 2 is precisely those chars (no surrounding context is shared)
    assert stats[2]["dup_chars"] == len(shared)
    assert (stats[2]["dup_ratio_ppm"]
            == len(shared) * 1_000_000 // stats[2]["n_chars"])
    assert 0 < stats[2]["dup_ratio_ppm"] < 500_000
    assert stats[3]["dup_ratio_ppm"] == 0
    assert stats[4]["n_chars"] == 0 and stats[4]["dup_ratio_ppm"] == 0

    kept = {r["doc_id"] for r in drop_high_dup_docs(
        d, "text", "doc_id", **kw).collect()}
    assert kept == {2, 3, 4}


def test_bpe_encode_ids_semantics(spark):
    """bpe_encode: deterministic vocab-id rule (unk=0, sorted base
    symbols, merge products in merge order, first-occurrence dedupe),
    id-sequence consistency with the counter (len(ids) == count), and
    OOV characters mapping to UNK."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.functions import bpe

    rows = [(1, "aa ab aa"), (2, "ab aa ab aa"), (3, "aa aa")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.train_bpe(d, "text", num_merges=4)
    vocab = bpe.bpe_vocab_map(merges)
    assert vocab["<unk>"] == 0
    # base symbols sorted after unk; products appended in merge order
    base = sorted({bpe.EOW, "a", "b"})
    for i, s in enumerate(base):
        assert vocab[s] == 1 + i
    enc = bpe.bpe_encode(d, merges, "text")
    got = {r["doc_id"]: r["token_ids"] for r in enc.collect()}
    # local replica
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for doc_id, text in rows:
        want = []
        for w in text.split():
            want += [vocab.get(p, 0) for p in bpe.encode_word(w, ranks)]
        assert got[doc_id] == want, doc_id
    # count parity with the budget counter
    cnt = {r["doc_id"]: r["n_tokens"]
           for r in bpe.bpe_token_counts(d, merges).select(
               "doc_id", "n_tokens").collect()}
    assert all(len(got[k]) == cnt[k] for k in got)
    # OOV char -> unk id 0; NULL text -> empty sequence
    oov = spark.createDataFrame([(9, "zz"), (10, None)],
                                "doc_id long, text string")
    o = {r["doc_id"]: r["token_ids"]
         for r in bpe.bpe_encode(oov, merges, "text").collect()}
    assert set(o[9]) == {0, vocab[bpe.EOW]} or o[9] == [0, 0, vocab[bpe.EOW]]
    assert all(i == 0 or i == vocab[bpe.EOW] for i in o[9])
    assert o[10] == []


def test_profile_table_semantics(spark):
    """Exact mode: null/distinct/min/max/sum_len per column on a frame
    with NULLs and duplicates; approx mode still returns plausible
    counts; guards on unknown/empty column lists; the all-NULL column
    profiles to NULL min/max and zero sum_len."""
    import pytest as _pytest

    from ncbi_analysis_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "aa", None), (2, "bb", None), (2, None, None)],
        "k long, s string, dead string")
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert list(rows) == ["dead", "k", "s"]  # name-ordered
    assert rows["k"]["n_rows"] == 3 and rows["k"]["n_nulls"] == 0
    assert rows["k"]["n_distinct"] == 2
    assert rows["k"]["min_value"] == "1" and rows["k"]["max_value"] == "2"
    assert rows["k"]["sum_len"] == 3
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["s"]["sum_len"] == 4
    assert rows["dead"]["n_nulls"] == 3 and rows["dead"]["n_distinct"] == 0
    assert rows["dead"]["min_value"] is None
    assert rows["dead"]["sum_len"] == 0

    approx = {r["column"]: r for r in
              profile_table(df, ["k"], exact_distinct=False).collect()}
    assert approx["k"]["n_distinct"] >= 1  # HLL++ estimate, not pinned

    with _pytest.raises(ValueError, match="no such column"):
        profile_table(df, ["nope"])
    with _pytest.raises(ValueError, match="no columns"):
        profile_table(df, [])
