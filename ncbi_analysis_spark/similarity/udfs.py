"""Pandas UDF wrappers for the similarity kernels (Arrow-batched).

These are scalar pandas UDFs over (gene, window) string pairs — the
engine's only Python-boxed compute (SURVEY.md §2.9). Use them after cheap
JVM-side pruning (fast-skip predicates, operators/../functions.sequence),
never as the first filter — Catalyst treats Python UDFs as optimization
barriers, so order filters explicitly (SURVEY.md §4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf

from ncbi_analysis_spark.similarity import scorers


@pandas_udf("double")
def direct_similarity_udf(gene: pd.Series, window: pd.Series) -> pd.Series:
    return pd.Series([
        scorers.direct_score(g, w) for g, w in zip(gene, window)
    ], dtype="float64")


@pandas_udf("double")
def consistency_similarity_udf(gene: pd.Series, window: pd.Series, patience: pd.Series) -> pd.Series:
    return pd.Series([
        scorers.consistency_score(g, w, int(p))
        for g, w, p in zip(gene, window, patience)
    ], dtype="float64")


@pandas_udf("double")
def text_edit_similarity_udf(
    gene: pd.Series, window: pd.Series, mismatch_limit: pd.Series
) -> pd.Series:
    return pd.Series([
        scorers.text_edit_score(g, w, None if pd.isna(m) else int(m))
        for g, w, m in zip(gene, window, mismatch_limit)
    ], dtype="float64")


@pandas_udf("boolean")
def blat_match_udf(gene: pd.Series, database: pd.Series, offset: pd.Series) -> pd.Series:
    return pd.Series([
        scorers.blat_score(g, d, int(o))[0] for g, d, o in zip(gene, database, offset)
    ], dtype="bool")


# ---------------------------------------------------------------------------
# Alignment-render UDFs (S13): each returns the reference rendering_sequence
# triple [gene_format, target_format, match_format] as array<string>
# (reference src/analysis/similarities/*_similarity.py rendering_sequence,
# consumed by gene_similarity_match.py:237-256). Run these AFTER top-k —
# the render set is per-query top_k rows, never the full candidate stream.


@pandas_udf("array<string>")
def direct_render_udf(gene: pd.Series, window: pd.Series) -> pd.Series:
    return pd.Series([
        list(scorers.direct_render(g, w)) for g, w in zip(gene, window)
    ])


@pandas_udf("array<string>")
def consistency_render_udf(
    gene: pd.Series, window: pd.Series, patience: pd.Series
) -> pd.Series:
    return pd.Series([
        list(scorers.consistency_render_triple(g, w, int(p)))
        for g, w, p in zip(gene, window, patience)
    ])


@pandas_udf("array<string>")
def text_edit_render_udf(gene: pd.Series, window: pd.Series) -> pd.Series:
    return pd.Series([
        list(scorers.text_edit_render(g, w)) for g, w in zip(gene, window)
    ])


@pandas_udf("array<string>")
def pattern_render_udf(gene: pd.Series, window: pd.Series) -> pd.Series:
    return pd.Series([
        list(scorers.pattern_render(g, w)) for g, w in zip(gene, window)
    ])


@pandas_udf("array<string>")
def blat_render_udf(gene: pd.Series, database: pd.Series, offset: pd.Series) -> pd.Series:
    out = []
    for g, d, o in zip(gene, database, offset):
        triple = scorers.blat_render(g, d, int(o))
        out.append(None if triple is None else list(triple))
    return pd.Series(out)
