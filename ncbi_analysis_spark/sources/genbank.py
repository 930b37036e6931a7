"""GenBank flat-file source (SURVEY.md §2.1 S1).

Replaces the reference's 3-state line machine
(src/utils/ncbi_database.py:73-176: Header/GeneSegment/DNA parts, SOURCE
line, ``gene``/``repeat_region`` feature blocks with ``complement(a..b)``
locations and multi-line ``/attr="..."`` attributes, ORIGIN DNA lines)
with a per-file parser behind ``mapInPandas``.

Canonical outputs (SURVEY.md §1.3):

    genes(accession, left, right, strand, gene, product, locus_tag,
          gene_id, protein_id, gene_synonym, codon_start, transl_table,
          translation, xref MAP<STRING,STRING>)
    genome(accession, source, seq)

Scale: one task per file; the genome string stays inside its task until
explicitly chunked (plans.similarity_scan.chunk_genome).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GENE_SCHEMA = T.StructType([
    T.StructField("accession", T.StringType()),
    T.StructField("left", T.LongType()),
    T.StructField("right", T.LongType()),
    T.StructField("strand", T.StringType()),
    T.StructField("gene", T.StringType()),
    T.StructField("product", T.StringType()),
    T.StructField("locus_tag", T.StringType()),
    T.StructField("gene_id", T.LongType()),
    T.StructField("protein_id", T.StringType()),
    T.StructField("gene_synonym", T.StringType()),
    T.StructField("codon_start", T.IntegerType()),
    T.StructField("transl_table", T.IntegerType()),
    T.StructField("translation", T.StringType()),
    T.StructField("xref", T.MapType(T.StringType(), T.StringType())),
])

GENOME_SCHEMA = T.StructType([
    T.StructField("accession", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("seq", T.StringType()),
])

_STR_ATTRS = ("product", "gene", "protein_id", "gene_synonym", "locus_tag", "translation")
_INT_ATTRS = ("codon_start", "transl_table")
_FEATURE_RE = re.compile(r"^(gene|repeat_region)\s+(\S+)$")
_LOC_RE = re.compile(r"^(complement\()?<?(\d+)\.\.>?(\d+)\)?$")


def _finish_gene(block: list[str], accession: str) -> dict | None:
    """Parse one feature block (first line = keyword + location, rest =
    ``/attr=`` lines with continuations). join(...) locations are skipped,
    like the reference (ncbi_database.py:143-151 error path)."""
    m = _FEATURE_RE.match(block[0].strip())
    if not m:
        return None
    loc = m.group(2)
    lm = _LOC_RE.match(loc)
    if not lm:  # join(...) and friends
        return None
    left, right = int(lm.group(2)), int(lm.group(3))
    if left >= right:
        return None
    gene: dict = {k: None for k in ("gene", "product", "locus_tag", "gene_id",
                                    "protein_id", "gene_synonym", "codon_start",
                                    "transl_table", "translation")}
    gene.update(accession=accession, left=left, right=right,
                strand="-" if lm.group(1) else "+", xref={})
    cur = ""
    for raw in block[1:]:
        line = raw.strip()
        if not line:
            continue
        cur = line if line.startswith("/") else f"{cur} {line}"
        for attr in _STR_ATTRS:
            prefix = f"/{attr}="
            if cur.startswith(prefix):
                gene[attr] = cur[len(prefix):].strip('"')
        for attr in _INT_ATTRS:
            prefix = f"/{attr}="
            if cur.startswith(prefix):
                try:
                    gene[attr] = int(cur[len(prefix):].strip('"'))
                except ValueError:
                    pass
        if cur.startswith("/db_xref="):
            val = cur[len("/db_xref="):].strip('"')
            if ":" in val:
                key, ref = val.split(":", 1)
                if key.lower() == "geneid":
                    digits = re.sub(r"[^0-9]", "", ref)
                    gene["gene_id"] = int(digits) if digits else None
                else:
                    gene["xref"][key] = ref
    return gene


def parse_genbank(text: str) -> tuple[str, str, str, list[dict]]:
    """Parse one GenBank file -> (accession, source, dna, genes)."""
    accession = ""
    source = ""
    dna_parts: list[str] = []
    genes: list[dict] = []
    block: list[str] = []
    part = "header"

    for line in text.splitlines():
        stripped = line.strip()
        if part == "header":
            if stripped.startswith("LOCUS"):
                toks = re.split(r"\s+", stripped)
                accession = toks[1] if len(toks) > 1 else ""
            elif stripped.startswith("VERSION"):
                toks = re.split(r"\s+", stripped)
                if len(toks) > 1:
                    accession = toks[1]
            elif stripped.startswith("SOURCE"):
                source = " ".join(re.split(r"\s+", stripped)[1:])
            if _FEATURE_RE.match(stripped):
                part = "genes"
                block = [line]
        elif part == "genes":
            if _FEATURE_RE.match(stripped):
                g = _finish_gene(block, accession)
                if g:
                    genes.append(g)
                block = [line]
            elif line and line[0] != " ":  # ORIGIN -> DNA part
                g = _finish_gene(block, accession)
                if g:
                    genes.append(g)
                block = []
                part = "dna"
            else:
                block.append(line)
        else:  # dna
            if stripped.startswith("//"):
                break
            toks = re.split(r"\s+", stripped)
            dna_parts.extend(toks[1:])

    return accession, source, "".join(dna_parts), genes


def _read_raw(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path, wholetext=True)


def read_genbank_genes(spark: SparkSession, path: str) -> DataFrame:
    """genes table from one or many GenBank files (glob ok)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for text in pdf["value"]:
                _, _, _, genes = parse_genbank(text)
                rows.extend(genes)
            yield pd.DataFrame(rows, columns=[f.name for f in GENE_SCHEMA.fields])

    return _read_raw(spark, path).mapInPandas(gen, GENE_SCHEMA)


def read_genbank_genome(spark: SparkSession, path: str) -> DataFrame:
    """genome table (one row per file: accession, source, seq)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for text in pdf["value"]:
                acc, src, dna, _ = parse_genbank(text)
                rows.append({"accession": acc, "source": src, "seq": dna})
            yield pd.DataFrame(rows, columns=[f.name for f in GENOME_SCHEMA.fields])

    return _read_raw(spark, path).mapInPandas(gen, GENOME_SCHEMA)


def keep_prefix_words(source: F.Column, n: int) -> F.Column:
    """P8 prefix projection: first ``n`` whitespace words of the organism
    source name (reference src/analysis/neighbor_analysis.py:120-123)."""
    return F.array_join(F.slice(F.split(F.trim(source), r"\s+"), 1, n), " ")
