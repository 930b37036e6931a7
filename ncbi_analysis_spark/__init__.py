"""ncbi_analysis_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query / data-processing
capabilities of the reference toolkit ``tmeteorj/ncbi-analysis`` (a pure
Python, single-machine DNA/RNA batch toolkit), re-expressed as:

- ``sources``   — readers producing canonical DataFrames (GenBank, FASTA,
                  fna cluster blocks, dynamic-header TSV).
- ``functions`` — pure Column expression libraries (sequence ops, text
                  analysis, vector math). JVM-side, codegen-friendly.
- ``similarity``— the five similarity scorers (pandas UDFs — the only
                  Python-boxed compute in the engine).
- ``operators`` — relational operator builders (DataFrame -> DataFrame):
                  interval joins, as-of joins, per-group top-k, local-max
                  suppression, distributions, clustering, dedup family,
                  similarity search.
- ``plans``     — pipelines composing the above to reproduce the
                  reference's end-to-end entry points.
- ``streaming`` — Structured Streaming variants of the batch operators.

Design rules (enforced throughout):

1. DataFrame/SQL first — declare the logical plan, let Catalyst pick the
   physical strategy. No RDDs except inside custom file readers.
2. UDFs are the slow path — pandas UDFs (Arrow-batched) only where the
   semantics genuinely cannot be expressed with built-in functions
   (the edit-distance DP family).
3. Every operator is designed for a 1000-executor / 100 TB deployment:
   broadcast small sides, bin-bucketed range joins instead of
   BroadcastNestedLoopJoin, map-side partial aggregation, AQE-friendly
   shuffles, no driver-side collect loops.
"""

__version__ = "0.1.0"

from ncbi_analysis_spark.session import get_spark  # noqa: F401
