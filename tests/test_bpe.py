"""Trainable BPE tokenizer (functions/bpe.py): hand-computed merge
sequence, distributed-vs-local-twin training parity, encode inference
rule, tokenize-contract integration, and guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.functions.bpe import (
    EOW,
    bpe_batch_counter,
    bpe_token_counts,
    bpe_train_local,
    encode_word,
    train_bpe,
    word_histogram,
)

SF_DIR = "/root/testdata/sf0.001"


def test_merge_sequence_hand_computed(spark):
    """Classic toy corpus: merges follow pair frequency with
    lexicographic tie-break, and never cross word boundaries."""
    rows = [(0, "low low low low low lower lower newest newest newest "
                "newest newest newest widest widest widest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, "text", num_merges=4)
    # 'es' appears 9x (newest x6 + widest x3); 'est</w>' chain follows;
    # then 'lo' (low x5 + lower x2 = 7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert merges[3] == ("l", "o")


def test_train_matches_local_twin(spark):
    """The distributed histogram + driver loop equals the Spark-free
    pyarrow twin on the real corpus — partitioning-independent."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = train_bpe(d, "text", num_merges=60)
    want = bpe_train_local(f"{SF_DIR}/documents.parquet", num_merges=60)
    assert got == want
    # and repartitioning cannot change the result
    got2 = train_bpe(d.repartition(7), "text", num_merges=60)
    assert got2 == got


def test_encode_word_inference_rule():
    """Greedy lowest-rank-first merging; unknown chars stay split."""
    merges = [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est" + EOW]
    assert encode_word("low", ranks) == ["low", EOW]
    assert encode_word("xyz", ranks) == ["x", "y", "z", EOW]
    assert encode_word("", {}) == [EOW]


def test_bpe_token_counts_contract(spark):
    """Counts ride the tokenize.py UDF contract: NULL text -> 0, counts
    equal the per-word encode lengths, column appended in place."""
    merges = [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    rows = [(0, "low lowest"), (1, None), (2, ""), (3, "Low LOW")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"]
           for r in bpe_token_counts(df, merges).collect()}
    def n(w):
        return len(encode_word(w, ranks))
    assert got[0] == n("low") + n("lowest")
    assert got[1] == 0
    assert got[2] == 0
    assert got[3] == 2 * n("low")  # lowercase=True default
    # counter is reusable standalone (the HF-adapter contract)
    c = bpe_batch_counter(merges)
    assert c(["low lowest", None, ""]) == [got[0], 0, 0]


def test_trained_counts_compress_vs_chars(spark):
    """A trained tokenizer must actually compress: per-doc token counts
    land strictly between word count (perfect compression floor for
    whole-word merges... plus EOW splits) and character count."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    merges = train_bpe(d, "text", num_merges=150)
    out = bpe_token_counts(d, merges).select("doc_id", "n_tokens", "text")
    from ncbi_analysis_spark.functions.text import token_count

    joined = out.withColumn("words", token_count(F.col("text"))) \
        .withColumn("chars", F.length(F.coalesce(F.col("text"), F.lit(""))))
    bad = joined.filter(
        (F.col("words") > 0)
        & ~((F.col("n_tokens") >= F.col("words"))
            & (F.col("n_tokens") <= F.col("chars") + F.col("words")))
    ).count()
    assert bad == 0
    # and merges genuinely reduce vs character-level (no merges)
    tot_trained = joined.agg(F.sum("n_tokens")).first()[0]
    tot_chars = bpe_token_counts(d, []).agg(F.sum("n_tokens")).first()[0]
    assert tot_trained < tot_chars


def test_guards(spark):
    df = spark.createDataFrame(
        [(i, f"w{i} unique{i}") for i in range(50)], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_words"):
        train_bpe(df, "text", num_merges=5, max_words=10)
    # min_count prunes the long tail under the cap
    merges = train_bpe(df, "text", num_merges=5, max_words=10, min_count=51)
    assert merges == []
    # histogram excludes NULL/empty and respects min_count
    df2 = spark.createDataFrame(
        [(0, "a a b"), (1, None), (2, "  ")], "doc_id long, text string")
    hist = {r["word"]: r["n"]
            for r in word_histogram(df2, "text", min_count=2).collect()}
    assert hist == {"a": 2}


def test_merge_loop_matches_independent_reimplementation(spark):
    """_merge_loop is shared by the trainer and the oracle twin, so twin
    parity can't catch a bug inside it; this checks it against a
    from-scratch reimplementation (different data structures: pair
    index rebuilt per step from raw word list) on randomized corpora."""
    import random

    rnd = random.Random(20260814)

    def naive_bpe(word_counts, num_merges):
        words = {w: [*w, EOW] for w in word_counts}
        merges = []
        for _ in range(num_merges):
            counts = {}
            for w, sym in words.items():
                n = word_counts[w]
                for a, b in zip(sym, sym[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + n
            if not counts:
                break
            m = max(counts.values())
            pair = min(p for p, c in counts.items() if c == m)
            merges.append(pair)
            for w, sym in words.items():
                out, i = [], 0
                while i < len(sym):
                    if (i + 1 < len(sym)
                            and (sym[i], sym[i + 1]) == pair):
                        out.append(sym[i] + sym[i + 1])
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                words[w] = out
        return merges

    from ncbi_analysis_spark.functions.bpe import _merge_loop

    for trial in range(8):
        vocab = ["".join(rnd.choice("abcde") for _ in range(rnd.randint(1, 7)))
                 for _ in range(rnd.randint(3, 40))]
        hist = {w: rnd.randint(1, 9) for w in vocab}
        nm = rnd.randint(1, 25)
        assert _merge_loop(dict(hist), nm) == naive_bpe(hist, nm), (trial, hist)


def test_bpe_decode_roundtrip_and_unk(spark):
    """decode(encode(t)) == whitespace-collapsed t.lower() when every
    char is in the training alphabet; out-of-alphabet chars render as
    <unk> (lossy by contract); empty/None texts decode to ''."""
    from ncbi_analysis_spark.functions.bpe import (
        bpe_batch_decoder, bpe_batch_encoder, bpe_decode, bpe_encode,
        train_bpe)

    d = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the  CAT\tsat"),
         (3, None),
         (4, "")],
        "doc_id long, text string")
    merges = train_bpe(d, "text", num_merges=20)
    out = {r["doc_id"]: r["text_decoded"]
           for r in bpe_decode(bpe_encode(d, merges, "text"),
                               merges).collect()}
    assert out == {1: "the cat sat on the mat",
                   2: "the cat sat", 3: "", 4: ""}

    enc = bpe_batch_encoder(merges)
    dec = bpe_batch_decoder(merges)
    # out-of-alphabet char -> literal <unk> in the decode
    ids = enc(["the z§z cat"])[0]
    assert 0 in ids
    assert "<unk>" in dec([ids])[0]
