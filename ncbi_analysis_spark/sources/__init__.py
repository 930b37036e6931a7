"""Custom readers producing canonical DataFrames (SURVEY.md §2.1).

Each reader follows the same Spark-first pattern: whole-file text rows
(one genomic flat file is the natural unit of parallelism — files are
individually bounded, a corpus is many files) -> Arrow-batched Python
parse via ``mapInPandas`` -> typed DataFrame. No driver-side parsing, no
collect: a 10k-file corpus parses as 10k parallel tasks.
"""

from ncbi_analysis_spark.sources import cluster_blocks, ecocyc, fasta, genbank  # noqa: F401
