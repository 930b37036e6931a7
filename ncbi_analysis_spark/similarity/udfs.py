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
