"""fna cluster-block source (SURVEY.md §2.1 S4).

Reference: splits the stream on ``>>`` block markers; per block, line 4
carries ``(gene_no) ?|!`` (anything else -> block ignored); then a
3-phase sub-parser accumulates (name, start, seq, end) for the rna /
alignment / target rows, where lines not ending in a digit are sequence
continuations (src/analysis/cluster_match.py:36-81,138-171).

Output (FIXTURES.md §5): cluster_elements(record_no, gene_no, name,
start, end, seq_rna, seq_align, seq_target).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ELEMENT_SCHEMA = T.StructType([
    T.StructField("record_no", T.IntegerType()),
    T.StructField("gene_no", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("start", T.LongType()),
    T.StructField("end", T.LongType()),
    T.StructField("seq_rna", T.StringType()),
    T.StructField("seq_align", T.StringType()),
    T.StructField("seq_target", T.StringType()),
])


def _parse_seq_line(elem: dict, line: str) -> None:
    s = line.strip()
    toks = re.split(r"\s+", s)
    # a well-formed coordinate line is `name start seq... end`; anything
    # else (bare sequence, or a corrupt line that happens to end in a
    # digit) is treated as sequence continuation — a malformed line must
    # degrade, not raise inside a Spark task
    if not s or not s[-1].isdigit() or len(toks) < 2:
        elem["seq"] = elem.get("seq", "") + s
        return
    try:  # int() is the authority — isdigit() passes unicode digits and
        # misses '--5', both of which int() rejects
        start, end = int(toks[1]), int(toks[-1])
    except ValueError:
        elem["seq"] = elem.get("seq", "") + s
        return
    elem.setdefault("name", toks[0])
    elem.setdefault("start", start)
    elem["end"] = end
    elem["seq"] = elem.get("seq", "") + " ".join(toks[2:-1])


def parse_cluster_blocks(text: str, rna_tag: str) -> list[dict]:
    blocks: list[list[str]] = []
    buff: list[str] = []
    for line in text.splitlines():
        if line.startswith(">>"):
            if buff:
                blocks.append(buff)
            buff = []
        buff.append(line)
    if buff:
        blocks.append(buff)

    rows: list[dict] = []
    for idx, lines in enumerate(blocks, start=1):
        if len(lines) < 4:
            continue
        info = re.split(r"\s+", lines[3].strip())
        if len(info) < 2 or info[1] not in ("?", "!"):
            continue  # ignore-flag filter (P4)
        gene_no = info[0].strip("()")
        elems: list[dict] = [{}, {}, {}]
        phase = 0
        for line in lines[4:]:
            if not line.strip():
                continue
            if line.strip().startswith(rna_tag):
                phase = 1
                _parse_seq_line(elems[0], line)
            elif phase == 1:
                phase = 2
                _parse_seq_line(elems[1], line)
            elif phase == 2:
                phase = 0
                _parse_seq_line(elems[2], line)
        rna, align, target = elems
        rows.append({
            "record_no": idx,
            "gene_no": gene_no,
            "name": align.get("name", rna.get("name")),
            "start": align.get("start"),
            "end": align.get("end"),
            "seq_rna": rna.get("seq"),
            "seq_align": align.get("seq"),
            "seq_target": target.get("seq"),
        })
    return rows


def read_cluster_blocks(spark: SparkSession, path: str, rna_tag: str) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for text in pdf["value"]:
                rows.extend(parse_cluster_blocks(text, rna_tag))
            yield pd.DataFrame(rows, columns=[f.name for f in ELEMENT_SCHEMA.fields])

    return spark.read.text(path, wholetext=True).mapInPandas(gen, ELEMENT_SCHEMA)
