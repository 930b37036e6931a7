"""Legacy block-file re-parsers (SURVEY.md §2.1 S5/S6).

In this engine, stage handoffs are DataFrames — these readers exist only
for compatibility with files produced by the reference (or by our
S13-compatible sinks): similarity-match result blocks
(``>acc/start-end\\tk=v,...`` headers,
src/analysis/gene_location_analysis.py:39-54,242-264) and blank-line
delimited neighbor blocks (src/analysis/neighbor_analysis.py:96-137).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MATCH_SCHEMA = T.StructType([
    T.StructField("header", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("start", T.LongType()),
    T.StructField("end", T.LongType()),
    T.StructField("direction", T.StringType()),   # '>' fwd, '<' rev
    T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
])

_HEADER_RE = re.compile(r"^>(.+)/(-?\d+)-(-?\d+)(?:\t(.*))?$")


def parse_match_blocks(text: str) -> list[dict]:
    """``>name/start-end\\tk=v,...`` header lines -> typed rows; start >
    end encodes the reverse strand (the reference re-derives direction
    the same way, gene_location_analysis.py:262)."""
    rows = []
    for line in text.splitlines():
        m = _HEADER_RE.match(line.strip())
        if not m:
            continue
        name, start, end, attr_str = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
        attrs = {}
        for kv in (attr_str or "").split(","):
            if "=" in kv:
                k, v = kv.split("=", 1)
                attrs[k.strip()] = v.strip()
        rows.append({
            "header": line.strip(), "name": name, "start": start, "end": end,
            "direction": ">" if start <= end else "<", "attrs": attrs,
        })
    return rows


def read_match_blocks(spark: SparkSession, path: str) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for text in pdf["value"]:
                rows.extend(parse_match_blocks(text))
            yield pd.DataFrame(rows, columns=[f.name for f in MATCH_SCHEMA.fields])

    return spark.read.text(path, wholetext=True).mapInPandas(gen, MATCH_SCHEMA)


NEIGHBOR_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("direction", T.StringType()),
    T.StructField("left", T.LongType()),
    T.StructField("right", T.LongType()),
    T.StructField("source", T.StringType()),
    T.StructField("nearest_gene", T.StringType()),
])


def parse_neighbor_blocks(text: str) -> list[dict]:
    """Blank-line delimited neighbor blocks: first line
    ``name direction left right``, then ``source: ...`` and
    ``nearest: ...`` attribute lines."""
    rows = []
    for block in re.split(r"\n\s*\n", text):
        lines = [ln.strip() for ln in block.splitlines() if ln.strip()]
        if not lines:
            continue
        head = re.split(r"\s+", lines[0])
        if len(head) < 4:
            continue
        try:
            left, right = int(head[2]), int(head[3])
        except ValueError:  # corrupt head line: skip the block, keep the task
            continue
        row = {
            "name": head[0], "direction": head[1],
            "left": left, "right": right,
            "source": None, "nearest_gene": None,
        }
        for ln in lines[1:]:
            if ln.lower().startswith("source:"):
                row["source"] = ln.split(":", 1)[1].strip()
            elif ln.lower().startswith("nearest:"):
                row["nearest_gene"] = ln.split(":", 1)[1].strip()
        rows.append(row)
    return rows


def read_neighbor_blocks(spark: SparkSession, path: str) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for text in pdf["value"]:
                rows.extend(parse_neighbor_blocks(text))
            yield pd.DataFrame(rows, columns=[f.name for f in NEIGHBOR_SCHEMA.fields])

    return spark.read.text(path, wholetext=True).mapInPandas(gen, NEIGHBOR_SCHEMA)
