"""BM25 text retrieval over the document corpus.

A training-data platform needs keyword search over its own corpus —
auditing what the pipeline kept ("show me the docs about X that
survived curation"), building retrieval baselines for RAG evaluations,
and sourcing hard negatives for embedding training. This is the
classic probabilistic ranking (Robertson & Zaragoza 2009; the Lucene
``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf variant, which stays
positive for stopword-frequency terms).

No reference analog (the reference searches sequences by alignment
similarity, src/analysis/gene_similarity_match.py — this is its text
twin); LLM-pipeline extension.

Determinism contract (the repo rule): the per-(doc, term) contribution
is a pinned chain of IEEE ops — ``idf * (tf / (tf + k1 * (1 - b +
b * (dl / avgdl))))`` — with ``idf`` computed ONCE driver-side in
Python from exact integer (N, df) and injected as literals; the
per-doc score folds contributions in TERM order (sorted struct
collect, bounded by |query terms| per doc — the hll_estimate pinning
pattern). Python's ``math.log`` and DuckDB's ``ln`` resolve to the
same platform libm (probed bit-identical across the df grid in
tests), so the oracle recomputes idf independently and still matches
bit-for-bit.

Scale shape: two corpus passes — one map-side token count (doc
lengths), one explode filtered to the |q| query terms BEFORE the
(doc, term) groupBy (the filter prunes the shuffle to matched
occurrences only). The df/N/avgdl model state is |q|+2 scalars
collected driver-side; scoring is a keyed join of the matched-doc tf
rows with doc lengths; top-k is orderBy+limit → TakeOrderedAndProject
(partial top-k per partition, no global sort).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ncbi_analysis_spark.functions.text import token_count, tokens


def query_terms(query: str) -> list[str]:
    """The query's distinct terms, sorted — the same whitespace
    tokenization as the corpus side (``functions.text.tokens``),
    mirrored in Python."""
    return sorted({t for t in query.strip().split() if t})


def bm25_topk(
    corpus: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25.

    Output ``(id_col, n_terms_matched, score)`` — ``score`` descending
    with ``id_col`` as tiebreak; only documents matching at least one
    query term appear. NULL-text documents are excluded from the
    corpus statistics (COUNT semantics, the dedup posture).
    """
    terms = query_terms(query)
    if not terms:
        raise ValueError("bm25_topk: query has no terms")
    d = corpus.filter(F.col(text_col).isNotNull())
    dl = d.select(F.col(id_col), token_count(F.col(text_col)).alias("dl"))

    toks = d.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("g")
    )
    tf = (
        toks.filter(F.col("g").isin(terms))
        .groupBy(id_col, "g")
        .agg(F.count("*").cast("long").alias("tf"))
    )

    # model state: |q| df rows + 2 scalars — driver-side by design
    df_rows = {
        r["g"]: r["n"]
        for r in tf.groupBy("g").agg(F.count("*").cast("long").alias("n")).collect()
    }
    stats = dl.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dl").cast("long").alias("s"),
    ).collect()[0]
    n_docs, sum_dl = stats["n"], stats["s"]
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")
    avgdl = float(sum_dl) / float(n_docs)

    # idf in Python from exact integers — injected as literals so both
    # the plan and the oracle share one transcendental evaluation rule
    idf = {
        t: math.log(
            1.0 + (n_docs - df_rows.get(t, 0) + 0.5)
            / (df_rows.get(t, 0) + 0.5)
        )
        for t in terms
    }
    idf_col = F.col("g")
    expr = F.lit(None).cast("double")
    for t in terms:
        expr = F.when(idf_col == t, F.lit(idf[t])).otherwise(expr)

    scored = tf.join(dl, id_col).select(
        id_col,
        "g",
        (
            expr
            * (
                F.col("tf").cast("double")
                / (
                    F.col("tf").cast("double")
                    + F.lit(float(k1))
                    * (
                        F.lit(1.0 - b)
                        + F.lit(float(b))
                        * (F.col("dl").cast("double") / F.lit(avgdl))
                    )
                )
            )
        ).alias("contrib"),
    )
    pairs = F.array_sort(F.collect_list(F.struct("g", "contrib")))
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_terms_matched"),
        F.aggregate(
            pairs, F.lit(0.0), lambda acc, s: acc + s["contrib"]
        ).alias("score"),
    )
    return per_doc.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rk",
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard way
    to combine heterogeneous rankings (keyword BM25 + a quality prior,
    or BM25 + embedding ANN) without calibrating their scores:
    ``score(id) = Σ_lists 1 / (c + rank)``. Rank-only fusion means the
    inputs' score scales never meet, and the arithmetic is exact
    rational (integer ranks, one IEEE division per term, fold in list
    order — pinned, bounded by len(rankings) per id).

    Each input needs ``(id_col, rank_col)`` with rank 1-based within
    that list. Output ``(id_col, n_lists, rrf_score)`` — ids missing
    from a list simply contribute nothing for it (the standard
    behavior). Scale: inputs are top-k tables (bounded); the fuse is a
    groupBy over their union — broadcastable by construction.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            F.col(id_col),
            F.lit(i).alias("__src"),
            F.col(rank_col).cast("long").alias("__rk"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    pairs = F.array_sort(F.collect_list(F.struct("__src", "__rk")))
    return tagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lists"),
        F.aggregate(
            pairs,
            F.lit(0.0),
            lambda acc, s: acc
            + F.lit(1.0) / (F.lit(float(c)) + s["__rk"].cast("double")),
        ).alias("rrf_score"),
    )
