"""Enrichment snapshot parsers (SURVEY.md §2.1 S8-S10, §2.7 F15/F16/F18).

The reference fetches Ecocyc/KEGG/GO/PubMed pages live with caching and
retries (src/analysis/ecocyc_analysis.py:196-275, kegg_analysis.py:83-145,
run_search_count.py:35-64). In this engine the web layer is an
*ingestion* concern: pages are snapshotted to storage first; these
parsers turn snapshot tables ``(key, page)`` into dimension tables the
relational layer joins against (J9). The engine itself never fetches —
enrichment is deterministic and replayable.

All extractors are fresh implementations of the reference's observable
behavior (html_parser_util.py:48-301, gene_promoter_util.py:4-167).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# scalar extractors
# --------------------------------------------------------------------------

_ID_SCRIPT = re.compile(r"window\.location\.replace\('/gene\?([^']*)'\)")
_GENE_SCRIPT = re.compile(r"gene:'([^']+)'")


def extract_map_position(text: str) -> tuple[int | None, int | None]:
    """F18: ``[a -> b]`` / ``[b <- a]`` with comma grouping -> (start, end)
    (reference html_parser_util.py:13-23). Malformed fragments (missing
    brackets, no arrow, non-numeric bounds) yield (None, None) rather
    than raising — inside a Spark task an exception kills the job while
    the DuckDB oracle's regexp extraction yields NULL for the same
    input, a latent engine/oracle divergence (same class as the r5
    extract_nuccore_uid finding)."""
    lo = text.find("[")
    hi = text.find("]", lo + 1)  # first ']' AFTER the '[' — a stray
    # earlier ']' must not mask a well-formed pair later in the text
    if lo == -1 or hi == -1:
        return None, None
    inner = text[lo + 1:hi]
    if "<-" in inner:
        end, _, start = inner.partition("<-")
    elif "->" in inner:
        start, _, end = inner.partition("->")
    else:
        return None, None
    try:
        return (int(start.replace(",", "").strip()),
                int(end.replace(",", "").strip()))
    except ValueError:
        return None, None


def extract_ecocyc_id(html: str, gene_name: str | None = None) -> str | None:
    """Ecocyc id from a gene-search page: redirect script, typeObjectPage
    script, or a ``/gene?orgid=ECOLI&id=`` link whose anchor text equals
    the queried gene (reference EcocycHTMLParser id paths)."""
    m = _ID_SCRIPT.search(html)
    if m:
        for kv in re.split(r"['?&\"]", m.group(1)):
            if kv.startswith("id="):
                return kv[3:]
    m = _GENE_SCRIPT.search(html)
    if m and "typeObjectPage" in html:
        return m.group(1)

    class LinkFinder(HTMLParser):
        def __init__(self):
            super().__init__()
            self.found = None
            self._href = None
            self._text = ""

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                href = dict(attrs).get("href", "") or ""
                if href.startswith("/gene?orgid=ECOLI&id="):
                    self._href = href
                    self._text = ""

        def handle_data(self, data):
            if self._href is not None:
                self._text += data

        def handle_endtag(self, tag):
            if tag == "a" and self._href is not None:
                text = re.sub(r"<\w+>", "", self._text).strip()
                if gene_name is None or text == gene_name:
                    for kv in re.split(r"['?&\"]", self._href):
                        if kv.startswith("id="):
                            self.found = self.found or kv[3:]
                self._href = None

    p = LinkFinder()
    p.feed(html)
    return p.found


def extract_nuccore_uid(html: str) -> str | None:
    """S7: the nuccore uid from an NCBI viewer page — line 7 of the page
    holds ``<meta name="..." content="..." />`` tags; split on '/>' (last
    fragment dropped), parse each tag's name/content, return the
    ``ncbi_uidlist`` value (reference data_download_util.py:33-40,
    line-for-line: readlines()[6], split('/>')[:-1], the 3-token
    meta/name/content split). None when the page is too short or the
    uid tag is absent."""
    lines = html.splitlines()
    if len(lines) < 7:
        return None
    dic: dict[str, str] = {}
    for data in lines[6].strip().split("/>")[:-1]:
        parts = data.strip().split(" ")
        if len(parts) != 3:
            continue
        _, name, content = parts
        # malformed fragment lacking '=' (e.g. '<meta name content'):
        # skip instead of IndexError-ing the whole Spark task — mirrors
        # the S7 oracle's string_split(...)[2] yielding NULL there
        if "=" not in name or "=" not in content:
            continue
        name, content = [x.strip().split("=")[1].strip('"') for x in (name, content)]
        dic[name] = content
    return dic.get("ncbi_uidlist")


NUCCORE_DIM_SCHEMA = T.StructType([
    T.StructField("accession", T.StringType()),
    T.StructField("uid", T.StringType()),
])


def nuccore_uid_dim(pages: DataFrame) -> DataFrame:
    """(key=accession, page=viewer html) -> (accession, uid) — the
    accession->uid resolution table S7's downloader builds before
    fetching GenBank text (snapshot-ingestion model)."""
    return _map_pages(
        pages, NUCCORE_DIM_SCHEMA,
        lambda k, p: [{"accession": k, "uid": extract_nuccore_uid(p)}],
    )


def extract_pubmed_count(html: str) -> str:
    """S10: result count from a PubMed search page — the line after the
    ``results-amount`` div marker: 'No results were found' -> "0",
    otherwise the value with its span tags stripped (comma grouping
    preserved); pages with no marker are single-result redirects -> "1"
    (reference run_search_count.py:11-24, line-for-line behavior)."""
    step = -1
    for line in html.splitlines():
        line = line.strip()
        if line == '<div class="results-amount">':
            step = 0
        elif step == 0 and line:
            if "No results were found" in line:
                return "0"
            return line.replace('<span class="value">', "").replace("</span>", "")
    return "1"


def extract_kegg_orthology_ids(html: str) -> dict[str, str]:
    """KO id -> href from the 'KEGG ORTHOLOGY' section of a bfind page
    (reference KeggIdHTMLParser)."""

    class KO(HTMLParser):
        def __init__(self):
            super().__init__()
            self.active = False
            self._href = None
            self.ids: dict[str, str] = {}

        def handle_starttag(self, tag, attrs):
            if self.active and tag == "a":
                self._href = dict(attrs).get("href")
            elif self.active:
                self._href = None

        def handle_data(self, data):
            data = data.strip()
            if data == "KEGG ORTHOLOGY":
                self.active = True
            elif data in ("KEGG GENES", "KEGG MGENES"):
                self.active = False
            elif self.active and self._href and data.startswith("K"):
                self.ids[data] = self._href

    p = KO()
    p.feed(html)
    return p.ids


def extract_kegg_pathways(html: str) -> tuple[list[str], list[str]]:
    """(names, pathways) from a KEGG bget page: the 'Name' cell's
    comma-split values and each 'Pathway' table row joined by spaces
    (reference KeggPathwayHTMLParser)."""

    class PW(HTMLParser):
        def __init__(self):
            super().__init__()
            self.state = "idle"
            self.depth = 0
            self.names: list[str] = []
            self.pathways: list[str] = []
            self.current: list[str] = []
            self.lasttag = None

        def handle_starttag(self, tag, attrs):
            self.lasttag = tag
            if self.state in ("start_name", "start_pathway") and tag == "td":
                self.state = "in_" + self.state.split("_")[1]
                self.depth = 1
            elif self.state in ("in_name", "in_pathway") and tag == "td":
                self.depth += 1

        def handle_endtag(self, tag):
            if self.state in ("in_name", "in_pathway"):
                if tag == "td":
                    self.depth -= 1
                    if self.depth == 0:
                        self.state = "idle"
                elif tag == "table" and self.state == "in_pathway" and self.current:
                    self.pathways.append(" ".join(self.current))
                    self.current = []

        def handle_data(self, data):
            data = data.strip()
            if not data:
                return
            if data == "Pathway" and self.lasttag == "nobr" and self.state == "idle":
                self.state = "start_pathway"
            elif data == "Name" and self.lasttag == "nobr" and self.state == "idle":
                self.state = "start_name"
            elif self.state == "in_pathway":
                self.current.append(data)
            elif self.state == "in_name":
                self.names.extend(x.strip() for x in data.split(","))

    p = PW()
    p.feed(html)
    return p.names, p.pathways


def extract_go_table(html: str) -> list[tuple[str, str]]:
    """GO category -> comma-joined linked terms from the first
    class-attributed table (reference GoHTMLParser)."""

    class GO(HTMLParser):
        def __init__(self):
            super().__init__()
            self.stack: list[str] = []
            self.tb = 0
            self.td: list[int] = []
            self.rows: list[list[str]] = []
            self.ok_table = False

        def handle_starttag(self, tag, attrs):
            self.stack.append(tag)
            if tag == "table":
                self.tb += 1
                self.td.append(0)
                if self.tb == 1:
                    self.ok_table = any(a[0] == "class" for a in attrs)
            elif tag == "td" and self.td:
                self.td[-1] += 1
            elif tag == "tr" and self.td:
                self.td[-1] = 0

        def handle_endtag(self, tag):
            if self.stack:
                self.stack.pop()
            if tag == "table":
                self.tb -= 1
                if self.td:
                    self.td.pop()

        def handle_data(self, data):
            if not self.ok_table or not self.td:
                return
            if self.tb == 1 and self.td[-1] == 1 and self.stack and self.stack[-1] == "td":
                label = re.sub(r"^\s+", "", re.sub(r"(\s|:)+$", "", data))
                if label:
                    self.rows.append([label, ""])
            elif self.tb == 2 and self.td[-1] == 2 and self.stack and self.stack[-1] == "a":
                if self.rows:
                    self.rows[-1][1] = (self.rows[-1][1] + "," + data.strip()).lstrip(",")

    p = GO()
    p.feed(html)
    return [(a, b) for a, b in p.rows]


# --------------------------------------------------------------------------
# TU / promoter diagrams (F16, F18)
# --------------------------------------------------------------------------

def parse_tu_links(tu_json: str) -> list[dict]:
    """Transcription-unit diagram records from an Ecocyc promoter JSON
    ``links`` array: 7-tuples (idx, link, left, top, right, bottom,
    html-attr-string) -> attrs map via <BR>-split ``k: v`` pairs
    (reference GeneTUInfo, gene_promoter_util.py:4-86)."""
    doc = json.loads(tu_json)
    out = []
    for items in doc.get("links", []):
        if len(items) != 7:
            continue
        attr_str = re.sub(r"</?b>", "", str(items[6]))
        attrs: dict[str, str] = {}
        for line in re.split(r"<BR>|<br>", attr_str):
            if ":" in line:
                k, v = line.split(":", 1)
                attrs[k.strip()] = v.strip()
        if not attrs:
            attrs["Body"] = str(items[6])
        out.append({
            "idx": int(items[0]), "link": items[1],
            "left": int(items[2]), "top": int(items[3]),
            "right": int(items[4]), "bottom": int(items[5]),
            "attrs": attrs,
        })
    return out


def _tu_direction(attrs: dict) -> str | None:
    loc = attrs.get("Location", "")
    if "<-" in loc:
        return "Left"
    if "->" in loc:
        return "Right"
    return None


def _tu_gene_start(attrs: dict) -> int | None:
    parts = re.split(r"\s+", attrs.get("Location", ""))
    if len(parts) != 3:
        return None
    a, op, b = parts
    raw = b if op == "<-" else a
    return int(raw.replace(",", ""))


def select_target_promoter(tu_rows: list[dict], target_idx: int):
    """F16: direction-aware walk of the sorted TU diagram finding the
    promoter governing the target gene + nearest gene start position.
    Returns (promoter_name, promoter_pos, near_gene_pos), all None when
    the target is absent or unreachable
    (reference get_target_promoter, gene_promoter_util.py:141-167)."""
    target = next((r for r in tu_rows if r["idx"] == target_idx), None)
    if target is None:
        return None, None, None
    direction = _tu_direction(target["attrs"])
    genes = [r for r in tu_rows if "Gene" in r["attrs"] and _tu_direction(r["attrs"]) == direction]
    promoters = [
        r for r in tu_rows
        if "Promoter" in r["attrs"] and "Tr.Start site" in r["attrs"] and r["top"] <= target["top"]
    ]
    ls = genes + promoters
    ls.sort(key=lambda r: (r["left"] if direction == "Right" else r["right"]) * 10
            + int("Gene" in r["attrs"]))
    step = 1 if direction == "Right" else -1
    idx = 0 if direction == "Right" else len(ls) - 1
    last_promoter = None
    gene_appears = False
    near_gene_pos = None
    while 0 <= idx < len(ls):
        item = ls[idx]
        if "Gene" in item["attrs"]:
            if not gene_appears:
                gene_appears = True
                near_gene_pos = _tu_gene_start(item["attrs"])
            if item["idx"] == target_idx:
                name = last_promoter["attrs"].get("Promoter") if last_promoter else None
                pos = (
                    int(last_promoter["attrs"]["Tr.Start site"].replace(",", ""))
                    if last_promoter else None
                )
                return name, pos, near_gene_pos
        elif "Promoter" in item["attrs"]:
            if gene_appears or last_promoter is None:
                last_promoter = item
                gene_appears = False
        idx += step
    return None, None, None


# --------------------------------------------------------------------------
# dimension-table builders
# --------------------------------------------------------------------------

ECOCYC_DIM_SCHEMA = T.StructType([
    T.StructField("gene", T.StringType()),
    T.StructField("ecocyc_id", T.StringType()),
])

KEGG_DIM_SCHEMA = T.StructType([
    T.StructField("gene", T.StringType()),
    T.StructField("ko_id", T.StringType()),
    T.StructField("ko_href", T.StringType()),
])

GO_DIM_SCHEMA = T.StructType([
    T.StructField("gene", T.StringType()),
    T.StructField("go_category", T.StringType()),
    T.StructField("go_terms", T.StringType()),
])

PUBMED_DIM_SCHEMA = T.StructType([
    T.StructField("gene", T.StringType()),
    T.StructField("keyword", T.StringType()),
    T.StructField("count_raw", T.StringType()),
    T.StructField("n_results", T.LongType()),
])


def _map_pages(pages: DataFrame, schema: T.StructType, fn) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for rec in pdf.itertuples(index=False):
                rows.extend(fn(rec.key, rec.page))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return pages.select(F.col("key"), F.col("page")).mapInPandas(gen, schema)


def ecocyc_id_dim(pages: DataFrame) -> DataFrame:
    """(key=gene, page=search html) -> (gene, ecocyc_id)."""
    return _map_pages(
        pages, ECOCYC_DIM_SCHEMA,
        lambda k, p: [{"gene": k, "ecocyc_id": extract_ecocyc_id(p, k)}],
    )


def kegg_ko_dim(pages: DataFrame) -> DataFrame:
    """(key=gene, page=bfind html) -> one row per KO id (1-to-many, J9)."""
    return _map_pages(
        pages, KEGG_DIM_SCHEMA,
        lambda k, p: [
            {"gene": k, "ko_id": ko, "ko_href": href}
            for ko, href in extract_kegg_orthology_ids(p).items()
        ],
    )


def pubmed_count_dim(pages: DataFrame) -> DataFrame:
    """(key='gene|keyword', page=search html) -> (gene, keyword,
    count_raw, n_results) — the per-(gene, keyword) literature-count
    table the reference writes as pubmed_count.tsv (S10). ``n_results``
    is the comma-stripped integer of count_raw."""
    def fn(k: str, p: str):
        gene, _, kw = k.partition("|")
        raw = extract_pubmed_count(p)
        digits = raw.replace(",", "")
        return [{
            "gene": gene, "keyword": kw, "count_raw": raw,
            "n_results": int(digits) if digits.isdigit() else None,
        }]

    return _map_pages(pages, PUBMED_DIM_SCHEMA, fn)


def go_terms_dim(pages: DataFrame) -> DataFrame:
    """(key=gene, page=GO html) -> one row per GO category."""
    return _map_pages(
        pages, GO_DIM_SCHEMA,
        lambda k, p: [
            {"gene": k, "go_category": cat, "go_terms": terms}
            for cat, terms in extract_go_table(p)
        ],
    )


PUBMED_REPORT_KEYWORDS = [
    "drug", "Kanamycin_B", "aminoglycoside", "antibiotic", "biofilm",
]


def pubmed_count_report(counts: DataFrame) -> DataFrame:
    """The ``pubmed_count.tsv`` report the reference driver writes
    (run_search_count.py:61-67): one row per gene, one column per
    search keyword, cell = the extracted result count — ``'Error'``
    when the (gene, keyword) page is missing (the reference writes
    'Error' after 3 failed download retries; in the snapshot-ingestion
    model a missing page row is that same condition). Input is
    ``pubmed_count_dim`` output. Column names are the SQL-safe
    lowercase of the reference header ('Kanamycin+B' → kanamycin_b;
    files on disk use the '_' form already).

    Spark shape: a groupBy-pivot over the FIXED keyword list (explicit
    values, so no extra distinct-discovery pass) — one shuffle on gene.
    """
    pivoted = (
        counts.groupBy("gene")
        .pivot("keyword", PUBMED_REPORT_KEYWORDS)
        # max, not first: one page per (gene, keyword) by construction,
        # but duplicate snapshot keys must not make the cell
        # layout-dependent (and the DuckDB oracle's conditional agg is
        # max)
        .agg(F.max("count_raw"))
    )
    return pivoted.select(
        "gene",
        *[F.coalesce(F.col(f"`{kw}`"), F.lit("Error"))
          .alias(kw.lower().replace("+", "_"))
          for kw in PUBMED_REPORT_KEYWORDS],
    )
