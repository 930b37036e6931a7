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
    # 0-based header order within the source file — the reference
    # numbers its downstream report blocks by this position
    # (gene_location_analysis.py:55-57 enumerate(todo_list))
    T.StructField("block_no", T.LongType()),
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
            "block_no": len(rows),
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


# ---------------------------------------------------------------------------
# S5b — location-result block scan (pipeline-2 stage-2 output, the input
# of the reference's final formatting stage)
# ---------------------------------------------------------------------------

CONSISTENCY_SCHEMA = T.StructType([
    T.StructField("index", T.StringType()),
    T.StructField("record_no", T.LongType()),   # yield order within block
    T.StructField("name", T.StringType()),
    T.StructField("weighted_similarity", T.StringType()),
    T.StructField("textedit_similarity", T.StringType()),
    T.StructField("direct_similarity", T.StringType()),
    T.StructField("consistency_similarity", T.StringType()),
    T.StructField("location", T.StringType()),
    T.StructField("gene_name", T.StringType()),
    T.StructField("site", T.StringType()),
    T.StructField("target_sequence", T.StringType()),
    # flattened [start1, end1, start2, end2, ...] interval strings
    T.StructField("location_intervals", T.ArrayType(T.StringType())),
])

_SIM_KEYS = ("weighted_similarity", "text_distance_similarity",
             "direct_match_similarity", "consistency_similarity")
_LOC_TYPES = ("5'", "3'", "cds", "cover", "inter-genic")


def _consistency_location(location_type: str, direction_matched: str | None,
                          direction: str | None) -> str:
    """The reference's sense/antisense + region label
    (gene_location_analysis.py:349-361 update_data): 'inter genic' for
    the inter-genic record; otherwise 'antisense' when the annotation
    direction equals the match direction else 'sense' (the reference's
    own polarity, reproduced as-is), with \"5'utr\"/\"3'utr\" or the raw
    cds/cover type appended."""
    if location_type == "inter-genic":
        return "inter genic"
    loc = "antisense" if direction_matched == direction else "sense"
    if location_type in ("5'", "3'"):
        return loc + " " + location_type + "utr"
    return loc + " " + location_type


def parse_consistency_blocks(text: str) -> list[dict]:
    """Reference ``extract_consistency_record`` over blank-line
    delimited location-result blocks (gene_location_analysis.py:307-419,
    the ``3-run_file_format.py`` stage), minus the gene-metadata lookup
    (done relationally downstream): one record per ``<type> of <genes>``
    location line, carrying the block's shared similarity/site/target
    fields.

    Faithful quirks, reproduced deliberately (cite: format_data_to_tsv
    headers vs the keys parsed at :377-384): the TSV's
    ``textedit_similarity``/``direct_similarity`` columns are ALWAYS
    empty — the parser stores ``text_distance_similarity``/
    ``direct_match_similarity`` keys that the header list never reads —
    and ``location interval`` extraction (:404-415) compares run
    lengths against ``data['consistency']``, a key nothing ever sets,
    so with its 10000 default no interval can be emitted by
    reference-produced files. Both behaviors are preserved so the
    formatted TSV is byte-identical."""
    out = []
    for block in re.split(r"\n\s*\n", text):
        lines = [ln.strip() for ln in block.splitlines() if ln.strip()]
        if not lines:
            continue
        data: dict = {}
        record_no = 0
        location_type = ""
        direction = None
        direction_matched = None
        genes = ""

        def emit(data=data):
            nonlocal record_no
            rec = {
                "index": data.get("index", ""),
                "record_no": record_no,
                "name": data.get("name", ""),
                "weighted_similarity": data.get("weighted_similarity", ""),
                "textedit_similarity": data.get("textedit_similarity", ""),
                "direct_similarity": data.get("direct_similarity", ""),
                "consistency_similarity": data.get("consistency_similarity", ""),
                "location": _consistency_location(location_type,
                                                  direction_matched, direction),
                "gene_name": genes,
                "site": data.get("site", ""),
                "target_sequence": data.get("target_sequence", ""),
                "location_intervals": [x for pair in
                                       data.get("location interval", [])
                                       for x in pair],
            }
            record_no += 1
            out.append(rec)

        for line in lines:
            items = line.split("\t")
            if items[0] in _SIM_KEYS:
                data[items[0]] = line.split("\t")[1].strip("%")
            elif items[0] == "name":
                data["name"] = items[1]
            elif line.startswith(">>>"):
                direction = ">"
            elif line.startswith("<<<"):
                direction = "<"
            elif " of " in line:
                parts = line.split(" of ")
                if len(parts) != 2 or parts[0] not in _LOC_TYPES:
                    continue
                if location_type != "":
                    emit()
                location_type, genes = parts[0], parts[1]
            elif line.startswith("original direction"):
                direction_matched = line[-1]
            elif line.startswith(">NC"):
                data["site"] = line.strip().split("/")[-1]
            elif line.startswith("(") and line.endswith(")"):
                data["index"] = line[1:-1]
            elif line.startswith("match_format"):
                _, sequence = re.split(r"\s+", line.strip())
                sequence = sequence[1:]
                score = 0
                interval = []
                for idx, ch in enumerate(sequence):
                    if ch == ".":
                        score = 0
                    else:
                        score += 1
                    if score == int(data.get("consistency", 10000)):
                        interval.append([str(idx + 2 - score), str(idx + 1)])
                data["location interval"] = interval
            elif "target_format" in line:
                data["target_sequence"] = line[line.index(":") + 1:].strip()
        if location_type != "" or data:
            emit()
    return out


def read_consistency_blocks(spark: SparkSession, path: str) -> DataFrame:
    """Location-result block files -> consistency records (the rows of
    the reference's final dynamic-width TSV, before gene-metadata
    enrichment). Whole-file parse per the stage's blank-line block
    framing; one Arrow batch per file, parallel across files."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for text in pdf["value"]:
                rows.extend(parse_consistency_blocks(text))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in CONSISTENCY_SCHEMA.fields])

    return spark.read.text(path, wholetext=True).mapInPandas(gen, CONSISTENCY_SCHEMA)
