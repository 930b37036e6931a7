"""The five similarity scorers of the reference engine, re-implemented as
batch kernels + pandas UDFs (SURVEY.md §2.7 F4-F9, §2.9).

These are the only Python-boxed compute in the engine: the scoring
semantics (asymmetric c->t tolerance, patience-merged runs, traceback
mismatch aborts, seed-and-extend DFS) cannot be expressed with built-in
Spark functions. Everything around them (windowing, suppression, top-k,
joins) stays declarative.
"""

from ncbi_analysis_spark.similarity.scorers import (  # noqa: F401
    blat_score,
    char_match,
    consistency_score,
    direct_score,
    text_edit_score,
    weighted_similarity,
)
from ncbi_analysis_spark.similarity.pattern import MatchPattern, pattern_score  # noqa: F401
