"""Pure Column-expression libraries (JVM-side, whole-stage-codegen friendly)."""

from ncbi_analysis_spark.functions import sequence, text, vectors  # noqa: F401
