"""ATCC FASTA-with-attributes source (SURVEY.md §2.1 S2).

Reference: splits on ``>lcl`` headers, regex-extracts
``[locus_tag=..][location=..][gbkey=..][gene=..]`` attributes,
``complement(a..b)`` or ``a..b`` locations, concatenates sequence lines,
sorts by start (src/utils/atcc_database.py:20-67).

Output: segments(accession_header, locus_tag, start, end, strand, gbkey,
gene, location, sequence) ordered by start.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEGMENT_SCHEMA = T.StructType([
    T.StructField("header", T.StringType()),
    T.StructField("locus_tag", T.StringType()),
    T.StructField("start", T.LongType()),
    T.StructField("end", T.LongType()),
    T.StructField("strand", T.StringType()),
    T.StructField("gbkey", T.StringType()),
    T.StructField("gene", T.StringType()),
    T.StructField("location", T.StringType()),
    T.StructField("sequence", T.StringType()),
])

_ATTR_RE = {a: re.compile(rf"\[{a}=([^\]]+)\]", re.IGNORECASE)
            for a in ("locus_tag", "location", "gbkey", "gene")}
_COMP_RE = re.compile(r"complement\((\d+)\.\.(\d+)\)", re.IGNORECASE)
_PLAIN_RE = re.compile(r"(\d+)\.\.(\d+)")


def parse_fasta_attrs(text: str) -> list[dict]:
    segs: list[dict] = []
    header = None
    seq_lines: list[str] = []

    def flush():
        if header is None:
            return
        attrs = {a: (m.group(1) if (m := rx.search(header)) else None)
                 for a, rx in _ATTR_RE.items()}
        start = end = None
        strand = "+"
        loc = attrs.get("location") or ""
        if m := _COMP_RE.search(loc):
            start, end, strand = int(m.group(1)), int(m.group(2)), "-"
        elif m := _PLAIN_RE.search(loc):
            start, end = int(m.group(1)), int(m.group(2))
        gene = attrs.get("gene") or (
            f"Unknown:{attrs.get('locus_tag')}" if attrs.get("locus_tag") else "Unknown:None"
        )
        segs.append({
            "header": header, "locus_tag": attrs.get("locus_tag"),
            "start": start, "end": end, "strand": strand,
            "gbkey": attrs.get("gbkey"), "gene": gene, "location": loc or None,
            "sequence": "".join(seq_lines).lower(),
        })

    for line in text.splitlines():
        line = line.strip()
        if line.startswith(">lcl"):
            flush()
            header = line
            seq_lines = []
        elif line:
            seq_lines.append(line)
    flush()
    return segs


def read_fasta_segments(spark: SparkSession, path: str) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for text in pdf["value"]:
                rows.extend(parse_fasta_attrs(text))
            yield pd.DataFrame(rows, columns=[f.name for f in SEGMENT_SCHEMA.fields])

    return (
        spark.read.text(path, wholetext=True)
        .mapInPandas(gen, SEGMENT_SCHEMA)
        .orderBy(F.col("start").asc_nulls_last())
    )


def fasta_record(name: F.Column, start: F.Column, end: F.Column, seq: F.Column) -> F.Column:
    """S12 FASTA sink record: ``>name/start-end\\nSEQ``
    (reference src/analysis/cluster_match.py:115-135)."""
    return F.format_string(">%s/%s-%s\n%s", name, start, end, seq)


RECORD_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("start", T.LongType()),
    T.StructField("end", T.LongType()),
    T.StructField("seq", T.StringType()),
])

_REC_HDR_RE = re.compile(r"^>(.*)/(\d+)-(\d+)\s*$")


def parse_fasta_records(text: str) -> list[dict]:
    """Parse the S12 sink format ``>name/start-end`` + sequence lines
    (the inverse of :func:`fasta_record` /
    ``sinks.write_fasta``; reference cluster_match.py:115-135 writes it,
    and its consumers re-read it with the same name/start-end split).
    Sequence lines between headers are concatenated verbatim."""
    recs: list[dict] = []
    cur: dict | None = None
    seq_lines: list[str] = []

    def flush():
        if cur is not None:
            recs.append({**cur, "seq": "".join(seq_lines)})

    for line in text.splitlines():
        if m := _REC_HDR_RE.match(line):
            flush()
            cur = {"name": m.group(1), "start": int(m.group(2)), "end": int(m.group(3))}
            seq_lines = []
        elif line.strip() and cur is not None:
            seq_lines.append(line.strip())
    flush()
    return recs


def read_fasta_records(spark: SparkSession, path: str) -> DataFrame:
    """S12-format scan: one row per ``>name/start-end`` record."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for text in pdf["value"]:
                rows.extend(parse_fasta_records(text))
            yield pd.DataFrame(rows, columns=[f.name for f in RECORD_SCHEMA.fields])

    return spark.read.text(path, wholetext=True).mapInPandas(gen, RECORD_SCHEMA)


GENOME_WINDOW_SCHEMA = T.StructType([
    T.StructField("accession", T.StringType()),
    T.StructField("window_id", T.IntegerType()),
    T.StructField("win_offset", T.LongType()),
    T.StructField("seq", T.StringType()),
])


def iter_fasta_windows(path: str, window_size: int, opener=open) -> Iterator[tuple]:
    """Stream one FASTA file as (accession, window_id, win_offset, seq)
    window tuples with O(window_size) memory — neither the file nor any
    record's sequence is ever materialized whole. Accession = first
    whitespace token after '>'; sequence lowercased (the reference
    lowercases its whole-genome string, src/utils/ncbi_database.py:64).

    ``opener`` is any ``path -> line-iterable context manager`` (default
    builtin ``open``; pass ``fsspec.open``-style adapters for
    HDFS/S3/GCS paths on a cluster)."""
    acc = None
    off = 0
    parts: list[str] = []
    buffered = 0

    with opener(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if acc is not None and buffered:
                    yield (acc, off // window_size, off, "".join(parts))
                acc = line[1:].split()[0] if len(line) > 1 else ""
                off, parts, buffered = 0, [], 0
            elif acc is not None:
                parts.append(line.lower())
                buffered += len(line)
                if buffered >= window_size:
                    buf = "".join(parts)
                    while len(buf) >= window_size:
                        yield (acc, off // window_size, off, buf[:window_size])
                        off += window_size
                        buf = buf[window_size:]
                    parts, buffered = ([buf] if buf else []), len(buf)
    if acc is not None and buffered:
        yield (acc, off // window_size, off, "".join(parts))


def read_fasta_windows(
    spark: SparkSession,
    path: str | list[str],
    window_size: int = 1 << 20,
    batch_rows: int = 2048,
    opener=open,
) -> DataFrame:
    """Giant-accession FASTA reader: emits the split_genome_windows
    layout (accession, window_id, win_offset, seq) directly from FASTA
    files, for plans.similarity_scan.similarity_scan_windowed /
    chunk_genome_from_windows.

    Scale shape: parallelism is per FILE (each task streams its files
    line-by-line; a 100 TB corpus is many files), while MEMORY per task
    is O(window_size) regardless of accession length — this is the
    ingest-side half of the giant-accession fix (the single-string
    reference model at src/utils/ncbi_database.py:64,92-95 holds the
    whole genome in RAM; the wholetext readers above inherit that
    ceiling, this reader removes it). FASTA has no record index, so one
    file parses sequentially by nature; split giant inputs into per-
    chromosome/per-accession files upstream for intra-genome
    parallelism."""
    import glob as _glob

    if isinstance(path, str):
        paths = sorted(_glob.glob(path)) or [path]
    else:
        paths = list(path)
    # round-robin, NOT hash-by-path: hashing collides ~1/e of N files
    # into shared tasks and leaves others empty, breaking the one-file-
    # per-task parallelism this reader promises
    files = spark.createDataFrame([(p,) for p in paths], "path string") \
        .repartition(max(len(paths), 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in GENOME_WINDOW_SCHEMA.fields]
        rows: list[tuple] = []
        for pdf in batches:
            for p in pdf["path"]:
                for tup in iter_fasta_windows(p, window_size, opener):
                    rows.append(tup)
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(gen, GENOME_WINDOW_SCHEMA)
