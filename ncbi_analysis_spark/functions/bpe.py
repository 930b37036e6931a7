"""Trainable byte-pair-encoding tokenizer (Sennrich et al. 2016,
arXiv:1508.07909) — the real-token-budget upgrade over
``functions.text.bpe_ish_token_count``'s 4-chars-per-token heuristic,
and the in-repo counterpart of the optional HF adapter
(``functions/tokenize.py``): train a merge table FROM the corpus, then
count/encode with it, no external wheel required.

Spark-first split (how every production BPE trainer works, including
HF's): the corpus-scale work is the WORD HISTOGRAM — one
``groupBy(word).count()`` with map-side combine, shuffle carrying
distinct words only — and the merge loop runs over that bounded
histogram on the driver (its cost is vocabulary-sized, independent of
corpus rows; ``max_words`` guards the collect loudly). Encoding rides
the ``tokenize.py`` contract: ``bpe_batch_counter(merges)`` is a
``list[str] -> list[int]`` Arrow-batched counter, so
``token_count_udf`` / ``real_token_counts`` / ``pack_fragments``
compose unchanged.

Determinism (oracle-grade): the merge loop breaks pair-count ties by
pair lexicographic order, and the histogram path is pure counts — so
the distributed trainer, the Spark-free local twin
(``bpe_train_local``, the generated-oracle pattern of
``train_ivf_centroids_local``), and any reimplementation agree
exactly, independent of partitioning.

Word model: whitespace words (``functions.text.tokens`` semantics),
lowercased by default, each word's symbol sequence is its characters
with a trailing ``</w>`` end-of-word marker (the original formulation —
merges never cross word boundaries).
"""

from __future__ import annotations

from collections import Counter
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def word_histogram(
    df: DataFrame,
    text: str,
    lowercase: bool = True,
    min_count: int = 1,
) -> DataFrame:
    """Distributed word histogram ``(word, n)`` — the corpus-scale half
    of BPE training. One hash aggregation; NULL/empty texts contribute
    nothing."""
    t = F.col(text)
    if lowercase:
        t = F.lower(t)
    words = df.filter(F.col(text).isNotNull()).select(
        F.explode(
            F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")
        ).alias("word")
    )
    out = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def _merge_loop(hist: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """The driver-side merge loop over a bounded word histogram —
    shared verbatim by the Spark trainer and the Spark-free local twin
    so the two cannot drift. Ties break lexicographically on the pair."""
    seqs: dict[str, tuple[tuple[str, ...], int]] = {
        w: (tuple(w) + (EOW,), n) for w, n in hist.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, n in seqs.values():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        top_n = max(pairs.values())
        best_pair = min(p for p, n in pairs.items() if n == top_n)
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_seqs = {}
        for w, (sym, n) in seqs.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_seqs[w] = (tuple(out), n)
        seqs = new_seqs
    return merges


def train_bpe(
    df: DataFrame,
    text: str,
    num_merges: int = 200,
    lowercase: bool = True,
    min_count: int = 1,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Train a BPE merge table from a corpus: distributed word
    histogram -> bounded collect (guarded by ``max_words`` — raise it
    explicitly for a bigger vocabulary budget, or raise ``min_count``
    to prune the long tail, the standard lever) -> deterministic driver
    merge loop. Returns the ordered merge list (rank = position).

    Practical ceiling: the merge loop is driver-side
    O(num_merges x unique_words x word_len) — the standard
    corpus-size-independent BPE-training posture, but at the guard's
    defaults (1M words) a 50k-merge production vocabulary is hours on
    one core. For that regime, prune with ``min_count`` (Zipf makes
    this nearly free in coverage) or train on a deterministic sample
    (``scale.sample_by_hash``); the histogram stage itself is the only
    corpus-sized work and stays distributed."""
    hist_df = word_histogram(df, text, lowercase, min_count)
    rows = hist_df.limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"train_bpe: word histogram exceeds max_words={max_words}; "
            "raise min_count to prune the long tail or raise max_words "
            "explicitly (the merge loop is driver-side over this table)"
        )
    return _merge_loop({r["word"]: r["n"] for r in rows}, num_merges)


def bpe_train_local(
    parquet_path: str,
    text: str = "text",
    num_merges: int = 200,
    lowercase: bool = True,
    min_count: int = 1,
) -> list[tuple[str, str]]:
    """Spark-free twin of ``train_bpe`` reading the parquet directly
    (pyarrow) — the generated-oracle pattern
    (``train_ivf_centroids_local``): oracle SQL embeds this function's
    output as literals, so the distributed trainer is checked against a
    from-scratch single-node derivation of the same corpus."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[text])
    hist: Counter = Counter()
    for v in tbl.column(text).to_pylist():
        if v is None:
            continue
        if lowercase:
            v = v.lower()
        for w in v.split():
            hist[w] += 1
    if min_count > 1:
        hist = Counter({w: n for w, n in hist.items() if n >= min_count})
    return _merge_loop(dict(hist), num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to one word (greedy lowest-rank-first, the
    BPE inference rule): repeatedly merge the adjacent pair with the
    best (lowest) rank until none applies."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_batch_counter(
    merges: list[tuple[str, str]], lowercase: bool = True
) -> Callable[[list], list]:
    """``list[str] -> list[int]`` batch counter over a trained merge
    table — plugs straight into ``tokenize.token_count_udf`` /
    ``real_token_counts`` (the HF-adapter contract), so the trained
    tokenizer's budget drives packing and quotas with no new plumbing.
    Per-word encodings are memoized per batch (Zipf makes the word set
    per Arrow batch far smaller than its token count)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def count(texts: list) -> list:
        cache: dict[str, int] = {}
        out = []
        for t in texts:
            t = "" if t is None else (t.lower() if lowercase else t)
            total = 0
            for w in t.split():
                k = cache.get(w)
                if k is None:
                    k = cache[w] = len(encode_word(w, ranks))
                total += k
            out.append(total)
        return out

    return count


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text: str = "text",
    out_col: str = "n_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Append trained-BPE token counts per document (Arrow-batched; the
    merge table rides the closure as a broadcast-sized literal —
    vocabulary-scale, never corpus-scale)."""
    from ncbi_analysis_spark.functions.tokenize import token_count_udf

    udf = token_count_udf(bpe_batch_counter(merges, lowercase))
    return df.withColumn(out_col, udf(F.col(text)))


UNK_ID = 0


def bpe_vocab_map(merges: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic piece -> id vocabulary from a trained merge table:
    id 0 is reserved for ``<unk>`` (characters never seen in training),
    ids 1.. are the BASE symbols (every single character appearing in
    any merge side, plus ``</w>``) in sorted order, then the merge
    PRODUCTS in merge order (first occurrence wins when two different
    merges concatenate to the same string, e.g. ('ab','c') and
    ('a','bc') both yielding 'abc'). A pure function of the merges, so
    any two engines holding the same merge table assign identical ids —
    the shard-interchange contract."""
    base = {EOW}
    for a, b in merges:
        for piece in (a, b):
            for ch in piece.replace(EOW, ""):
                base.add(ch)
    vocab: dict[str, int] = {"<unk>": UNK_ID}
    for s in sorted(base):
        vocab.setdefault(s, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def bpe_batch_encoder(
    merges: list[tuple[str, str]], lowercase: bool = True
) -> Callable[[list], list]:
    """``list[str] -> list[list[int]]`` batch ENCODER over a trained
    merge table — the token-ID sibling of ``bpe_batch_counter``, for
    pipelines that write actual id sequences to training shards rather
    than just budgeting by counts. Per-word encodings memoized per
    batch (Zipf); pieces outside the vocabulary (characters unseen in
    training) map to ``UNK_ID``."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    vocab = bpe_vocab_map(merges)

    def encode(texts: list) -> list:
        cache: dict[str, list[int]] = {}
        out = []
        for t in texts:
            t = "" if t is None else (t.lower() if lowercase else t)
            ids: list[int] = []
            for w in t.split():
                k = cache.get(w)
                if k is None:
                    k = cache[w] = [vocab.get(p, UNK_ID)
                                    for p in encode_word(w, ranks)]
                ids.extend(k)
            out.append(ids)
        return out

    return encode


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text: str = "text",
    out_col: str = "token_ids",
    lowercase: bool = True,
) -> DataFrame:
    """Append the trained-BPE token-ID sequence (``array<int>``) per
    document — what a training-shard writer actually persists; compose
    with ``F.size`` for the budget, ``packing.pack_fragments`` for
    sequence packing, and ``sources.sinks.write_training_shards`` for
    the shard layout. Arrow-batched pandas UDF; the merge table and the
    derived vocabulary ride the closure (vocabulary-scale literals,
    never corpus-scale)."""
    enc = bpe_batch_encoder(merges, lowercase)

    @F.pandas_udf("array<int>")
    def _enc(s: pd.Series) -> pd.Series:
        return pd.Series(enc(s.tolist()))

    return df.withColumn(out_col, _enc(F.col(text)))


def bpe_batch_decoder(
    merges: list[tuple[str, str]],
) -> Callable[[list], list]:
    """``list[list[int]] -> list[str]`` batch DECODER over a trained
    merge table — the inverse of ``bpe_batch_encoder`` up to the
    encoder's own normalization: pieces concatenate back to the
    lowercased words (merges preserve concatenation by construction),
    ``</w>`` markers become word boundaries, and the output joins
    words with single spaces. ``decode(encode(t))`` equals
    whitespace-collapsed ``t.lower()`` exactly when no character fell
    to ``<unk>`` (UNK_ID renders as the literal ``<unk>`` — lossy, by
    the same contract every subword tokenizer has)."""
    inv = {i: p for p, i in bpe_vocab_map(merges).items()}

    def decode(ids_rows: list) -> list:
        out = []
        for ids in ids_rows:
            s = "".join(inv.get(int(i), "<unk>") for i in (ids or []))
            out.append(" ".join(w for w in s.split(EOW) if w != ""))
        return out

    return decode


def bpe_decode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    ids_col: str = "token_ids",
    out_col: str = "text_decoded",
) -> DataFrame:
    """Append the decoded text for a trained-BPE id-sequence column —
    the shard READER's side of ``bpe_encode`` (inspect/debug training
    shards, re-materialize text for eval sets). Arrow-batched pandas
    UDF; the inverse vocabulary rides the closure."""
    dec = bpe_batch_decoder(merges)

    @F.pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        return pd.Series(dec(s.tolist()))

    return df.withColumn(out_col, _dec(F.col(ids_col)))
