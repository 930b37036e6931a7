"""Real-tokenizer adapter for token budgets.

``functions.text.token_count`` / ``bpe_ish_token_count`` are heuristic
(whitespace / ~4-chars-per-token) and stay the default everywhere — they
are pure codegen expressions and every existing oracle row is defined
against them. For a real training pipeline the token budget is the
*tokenizer's*, so this module adapts a trained tokenizer into the same
shape: a Column of per-document token counts that feeds
``pack_fragments(tokens=...)`` and any quota/chunk budget directly.

Optional-import posture (the Pillow pattern,
operators/multimodal.py::pil_image_decoder): the HF ``tokenizers``
package is not in this container, so ``hf_batch_counter`` raises
ImportError where it is absent and its test is skip-marked; any
``list[str] -> list[int]`` callable (a test fake, a sentencepiece
wrapper, tiktoken, …) satisfies the same contract.

Scale: the counter runs as an Arrow-batched pandas UDF — one Python
round-trip per ~10k-row Arrow batch, never per row; the tokenizer is
loaded once per executor (lazy module-level cache), not per batch. At
100 TB this is the honest floor for real tokenization: the text must
reach Python, so batch it, cache the tokenizer, and keep everything
around it (packing windows, quota math) JVM-side.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def hf_tokenizers_available() -> bool:
    """True when the HF ``tokenizers`` package is importable (this
    container ships without it; production clusters install it)."""
    import importlib.util

    return importlib.util.find_spec("tokenizers") is not None


def hf_batch_counter(tokenizer_file: str) -> Callable[[list], list]:
    """REAL batch token counter from a serialized HF tokenizer
    (``tokenizer.json``): ``list[str] -> list[int]`` via
    ``Tokenizer.encode_batch``. Optional import — raises ImportError
    where ``tokenizers`` is absent (tests skip-mark on
    ``hf_tokenizers_available()``).

    Pass the *file path*, not a Tokenizer object: the path is a small
    picklable closure the executors can each load once, while a live
    Rust tokenizer handle does not survive serialization to workers.
    """
    from tokenizers import Tokenizer  # noqa: F401 — import check here,

    # load lazily INSIDE the counter so the object is constructed on the
    # executor (once, via the closure cell), not shipped from the driver
    cache: list = []

    def count(texts: list) -> list:
        if not cache:
            from tokenizers import Tokenizer

            cache.append(Tokenizer.from_file(tokenizer_file))
        tok = cache[0]
        clean = ["" if t is None else t for t in texts]
        return [len(e.ids) for e in tok.encode_batch(clean)]

    return count


def token_count_udf(counter: Callable[[list], list]) -> Callable[..., Column]:
    """Wrap a ``list[str] -> list[int]`` batch counter as an
    Arrow-batched pandas UDF usable anywhere a count Column is:
    ``pack_fragments(df, tokens=token_count_udf(c)(F.col("text")))``.

    NULL text counts as 0 tokens (the empty document — chunk_documents'
    posture), enforced here so counters need not handle None.
    """

    @F.pandas_udf(LongType())
    def _count(texts: pd.Series) -> pd.Series:
        vals = counter(["" if t is None else t for t in texts.tolist()])
        if len(vals) != len(texts):
            raise ValueError(
                f"token counter returned {len(vals)} counts for "
                f"{len(texts)} texts; the contract is list-in/list-out "
                "with 1:1 positional alignment"
            )
        return pd.Series(vals, index=texts.index, dtype="int64")

    return _count


def real_token_counts(
    df: DataFrame,
    text: str = "text",
    counter: Callable[[list], list] | None = None,
    out_col: str = "n_tokens",
) -> DataFrame:
    """Append a per-document token-count column.

    ``counter=None`` keeps the heuristic default (whitespace
    ``token_count`` — pure codegen, no Python round-trip, the count
    every existing oracle is defined against); pass a real batch counter
    (``hf_batch_counter(path)`` or any ``list[str] -> list[int]``) to
    switch the budget to the tokenizer's.
    """
    from ncbi_analysis_spark.functions.text import token_count

    if counter is None:
        c = token_count(F.coalesce(F.col(text), F.lit(""))).cast("long")
    else:
        c = token_count_udf(counter)(F.col(text))
    return df.withColumn(out_col, c)
