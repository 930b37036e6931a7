"""JSONL document corpus source/sink.

One JSON object per line is the de-facto interchange format of LLM data
pipelines (The Pile, RedPajama, Dolma, fineweb all ship as
jsonl[.gz|.zst]); a corpus engine that can't ingest it cleanly can't
ingest most published corpora. The reference engine exchanges TSV/FASTA
(SURVEY.md §2.1) — this module is the LLM-pipeline extension of that
sink family.

Design constraints at 100 TB:
- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full extra pass over the data to infer one, and infers
  it differently when a field is missing from the sampled files.
- **Malformed lines quarantine, they don't kill the job.** Crawler
  output contains truncated/mis-encoded lines; in PERMISSIVE mode they
  land whole in the corrupt-record column for audit instead of failing
  a 10^5-task job (FAILFAST) or silently vanishing (DROPMALFORMED).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write one JSON object per line (Spark's json sink IS jsonl).

    ``compression``: ``"gzip"``/``"bzip2"``/``None``. Gzip output is not
    splittable — one reader task per file — so for corpora meant to be
    re-read, bound file sizes upstream (``maxRecordsPerFile``, see
    ``write_training_shards``) rather than writing few huge .gz files.
    """
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark,
    path: str,
    schema: str,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Schema'd PERMISSIVE jsonl read: well-formed lines get the typed
    columns, malformed lines land whole (raw text) in ``corrupt_col``
    with every typed column NULL. ``schema`` is a DDL string WITHOUT the
    corrupt column (appended here). Blank lines are skipped (matching
    ``spark.read.json``).

    Formulated as a text scan + ``from_json`` rather than the raw json
    source: Spark refuses any query that references ONLY the raw json
    source's corrupt-record column (it could never be populated without
    parsing the typed columns), which would make the quarantine branch
    of ``split_quarantine`` throw; ``from_json`` over a text scan has no
    such restriction, costs the same single pass, and keeps the corrupt
    line verbatim. (Per-field column pruning inside the JSON is lost
    either way — a corpus read consumes the whole document object.)
    """
    full = f"{schema}, {corrupt_col} string"
    lines = spark.read.text(path).filter(F.trim("value") != "")
    return lines.select(
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("__j")
    ).select("__j.*")


def split_quarantine(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """Split a ``read_jsonl`` frame into (clean, quarantined).

    Clean rows drop the corrupt column; quarantined rows keep the raw
    line (``raw_line``) for audit.
    """
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return clean, bad
