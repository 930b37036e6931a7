"""Real-tokenizer adapter (functions/tokenize.py): fake-counter contract,
heuristic default parity, pack_fragments budget integration, and the
skip-marked real-HF path (the Pillow optional-import pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.functions.tokenize import (
    hf_batch_counter,
    hf_tokenizers_available,
    real_token_counts,
    token_count_udf,
)


def _char_pair_counter_factory():
    """Deterministic fake 'tokenizer': ceil(len/2) tokens per text.
    Returned as a lambda so cloudpickle ships it BY VALUE — a
    module-level test function pickles by reference and the executors
    cannot import the test module."""
    return lambda texts: [(len(t) + 1) // 2 for t in texts]


def test_real_token_counts_with_injected_counter(spark):
    df = spark.createDataFrame(
        [(0, "abcd"), (1, "abc"), (2, ""), (3, None)], "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"] for r in
           real_token_counts(df, "text", counter=_char_pair_counter_factory()).collect()}
    assert got == {0: 2, 1: 2, 2: 0, 3: 0}  # NULL counts as empty doc


def test_real_token_counts_heuristic_default(spark):
    """counter=None must reproduce the whitespace heuristic exactly —
    every existing oracle is defined against it."""
    from ncbi_analysis_spark.functions.text import token_count

    df = spark.createDataFrame(
        [(0, "a b  c"), (1, ""), (2, None), (3, " x ")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"] for r in
           real_token_counts(df, "text").collect()}
    want = {r["doc_id"]: r["w"] for r in df.select(
        "doc_id",
        F.coalesce(token_count(F.coalesce("text", F.lit(""))), F.lit(0))
        .cast("long").alias("w")).collect()}
    assert got == want


def test_counter_misalignment_raises(spark):
    df = spark.createDataFrame([(0, "a"), (1, "b")], "doc_id long, text string")
    # always one extra count, whatever the Arrow batch split
    bad = real_token_counts(df, "text", counter=lambda ts: [1] * (len(ts) + 1))
    with pytest.raises(Exception, match="counts for"):
        bad.collect()


def test_pack_fragments_takes_real_budget(spark):
    """The adapter column feeds pack_fragments(tokens=...) directly; bins
    then budget by the injected tokenizer's counts, not whitespace."""
    from ncbi_analysis_spark.operators.packing import pack_fragments

    rows = [(i, "z" * 10) for i in range(8)]  # 5 fake-tokens each, 1 ws-token
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_fragments(
        df, tokens=token_count_udf(_char_pair_counter_factory())(F.col("text")),
        capacity=8, n_shards=1)
    rows_out = out.collect()
    assert all(r["n_tokens"] == 5 for r in rows_out)
    # 8 docs x 5 tokens = 40 tokens -> bins 0..4 at capacity 8
    assert {r["bin_id"] for r in rows_out} == {0, 1, 2, 3, 4}


@pytest.mark.skipif(not hf_tokenizers_available(),
                    reason="HF tokenizers not installed in this container")
def test_hf_batch_counter_real(tmp_path, spark):
    """Real HF path: build a tiny whitespace-model tokenizer.json, count
    through the full adapter stack."""
    import json

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {"hello": 0, "world": 1, "[UNK]": 2}
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    p = str(tmp_path / "tokenizer.json")
    tok.save(p)
    df = spark.createDataFrame(
        [(0, "hello world"), (1, "hello hello hello"), (2, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"] for r in
           real_token_counts(df, "text", counter=hf_batch_counter(p)).collect()}
    assert got == {0: 2, 1: 3, 2: 0}
