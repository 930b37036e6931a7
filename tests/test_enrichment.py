"""Enrichment snapshot-parser tests (F15/F16/F18) on synthetic pages
shaped like the reference's cached downloads; promoter selection was
fuzz-verified 291/291 against the reference at build time."""

from __future__ import annotations

import json

from ncbi_analysis_spark.sources import enrichment as enr


def test_extract_map_position():
    assert enr.extract_map_position("blah [1,234 -> 5,678] x") == (1234, 5678)
    assert enr.extract_map_position("[9,000 <- 2,000]") == (2000, 9000)


def test_extract_ecocyc_id_redirect_script():
    html = "<script>window.location.replace('/gene?orgid=ECOLI&id=EG10284');</script>"
    assert enr.extract_ecocyc_id(html) == "EG10284"


def test_extract_ecocyc_id_link_with_gene_name():
    html = (
        '<a href="/gene?orgid=ECOLI&id=EG001">wrong</a>'
        '<a href="/gene?orgid=ECOLI&id=EG002">nuoL</a>'
    )
    assert enr.extract_ecocyc_id(html, "nuoL") == "EG002"


def test_extract_kegg_ko_ids():
    html = (
        "<div>KEGG ORTHOLOGY</div>"
        '<a href="/entry/K00001">K00001</a><a href="/entry/K02345">K02345</a>'
        "<div>KEGG GENES</div>"
        '<a href="/entry/K99999">K99999</a>'
    )
    ids = enr.extract_kegg_orthology_ids(html)
    assert ids == {"K00001": "/entry/K00001", "K02345": "/entry/K02345"}


def test_extract_kegg_pathways():
    html = (
        "<nobr>Name</nobr><td>alrA, alr2</td>"
        "<nobr>Pathway</nobr><td><table><tr><td>map00473</td>"
        "<td>D-Alanine metabolism</td></tr></table></td>"
    )
    names, pathways = enr.extract_kegg_pathways(html)
    assert names == ["alrA", "alr2"]
    assert pathways == ["map00473 D-Alanine metabolism"]


def test_extract_go_table():
    html = (
        '<table class="go"><tr><td>molecular_function:</td>'
        "<td><table><tr><td>x</td><td><a>GO:1</a><a>GO:2</a></td></tr></table></td>"
        "</tr></table>"
    )
    rows = enr.extract_go_table(html)
    assert rows == [("molecular_function", "GO:1,GO:2")]


def _tu_doc():
    links = [
        [0, "l0", 100, 10, 160, 15, "<b>Promoter:</b> pA<BR>Tr.Start site: 95"],
        [1, "l1", 200, 10, 260, 15, "<b>Gene:</b> gX<BR>Location: 200 -> 260"],
        [2, "l2", 300, 10, 360, 15, "<b>Gene:</b> gY<BR>Location: 300 -> 360"],
    ]
    return json.dumps({"links": links})


def test_parse_tu_links():
    rows = enr.parse_tu_links(_tu_doc())
    assert len(rows) == 3
    assert rows[0]["attrs"]["Promoter"] == "pA"
    assert rows[1]["attrs"]["Gene"] == "gX"
    assert (rows[1]["left"], rows[1]["right"]) == (200, 260)


def test_select_target_promoter():
    rows = enr.parse_tu_links(_tu_doc())
    name, pos, near = enr.select_target_promoter(rows, 1)
    assert (name, pos) == ("pA", 95)
    assert near == 200
    # downstream gene in the same TU: still governed by pA (the reference
    # keeps last_promoter until a new promoter follows a gene)
    name2, pos2, near2 = enr.select_target_promoter(rows, 2)
    assert (name2, pos2, near2) == ("pA", 95, 200)


def test_dimension_builders(spark):
    pages = spark.createDataFrame(
        [("nuoL", "<script>window.location.replace('/gene?orgid=ECOLI&id=EG10284');</script>")],
        ["key", "page"],
    )
    out = enr.ecocyc_id_dim(pages).collect()
    assert out[0]["gene"] == "nuoL" and out[0]["ecocyc_id"] == "EG10284"

    kegg_pages = spark.createDataFrame(
        [("alr", "<div>KEGG ORTHOLOGY</div><a href='/e/K1'>K1</a><div>KEGG GENES</div>")],
        ["key", "page"],
    )
    rows = enr.kegg_ko_dim(kegg_pages).collect()
    assert [(r["gene"], r["ko_id"]) for r in rows] == [("alr", "K1")]


def test_extract_pubmed_count():
    marker = '<div class="results-amount">'
    assert enr.extract_pubmed_count(
        f"x\n{marker}\n<span class=\"value\">2,041</span>\nresults\n") == "2,041"
    assert enr.extract_pubmed_count(
        f"{marker}\n\n No results were found for term.\n") == "0"
    assert enr.extract_pubmed_count("<html>single article page</html>") == "1"
    # marker with no following non-empty line -> single-result default
    assert enr.extract_pubmed_count(f"pre\n{marker}\n\n") == "1"


def test_pubmed_count_dim(spark):
    pages = spark.createDataFrame(
        [("gyrA|drug",
          '<div class="results-amount">\n<span class="value">12</span>\n')],
        ["key", "page"],
    )
    r = enr.pubmed_count_dim(pages).collect()[0]
    assert (r["gene"], r["keyword"], r["count_raw"], r["n_results"]) == (
        "gyrA", "drug", "12", 12)


def test_extract_nuccore_uid():
    good = "\n".join(["<html>", "<head>", "<t>", "<!-- -->", "<l />", "<s>",
                      '<meta name="ncbi_db" content="nuccore" />'
                      '<meta name="ncbi_uidlist" content="556503834" />',
                      "<body>"])
    assert enr.extract_nuccore_uid(good) == "556503834"
    assert enr.extract_nuccore_uid("<html><body>short</body></html>") is None
    no_uid = good.replace('name="ncbi_uidlist"', 'name="other"')
    assert enr.extract_nuccore_uid(no_uid) is None


def test_pubmed_count_report_pivot_and_errors(spark):
    """One row per gene over the FIXED keyword list; missing pages read
    'Error' (the failed-download cell); duplicate snapshot keys resolve
    by max (layout-independent)."""
    from ncbi_analysis_spark.sources.enrichment import pubmed_count_report

    counts = spark.createDataFrame(
        [("thrA", "drug", "1,234", 1234),
         ("thrA", "biofilm", "0", 0),
         ("lacZ", "drug", "7", 7),
         # duplicate key: max wins deterministically
         ("lacZ", "drug", "9", 9)],
        "gene string, keyword string, count_raw string, n_results long")
    got = {r["gene"]: r.asDict() for r in
           pubmed_count_report(counts).collect()}
    assert got["thrA"] == {
        "gene": "thrA", "drug": "1,234", "kanamycin_b": "Error",
        "aminoglycoside": "Error", "antibiotic": "Error",
        "biofilm": "0"}
    assert got["lacZ"]["drug"] == "9"
    assert got["lacZ"]["biofilm"] == "Error"
