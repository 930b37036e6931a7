"""S5/S6 legacy block readers — including a sink round-trip."""

from __future__ import annotations

from ncbi_analysis_spark.sources import legacy_blocks, sinks


def test_match_block_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("q1", 11, 20, 7.5), ("q2", 30, 21, 3.25)],
        ["name", "start", "end", "weighted_similarity"],
    )
    out_dir = str(tmp_path / "blocks")
    sinks.write_match_blocks(df, out_dir)
    back = {r["name"]: r for r in legacy_blocks.read_match_blocks(spark, out_dir + "/part*").collect()}
    assert (back["q1"]["start"], back["q1"]["end"], back["q1"]["direction"]) == (11, 20, ">")
    assert back["q2"]["direction"] == "<"
    assert back["q1"]["attrs"]["weighted_similarity"] == "7.5"


def test_parse_reference_style_header():
    rows = legacy_blocks.parse_match_blocks(
        ">NC_000913.3/4035-4055\tdirection=>,weighted_similarity=12.0\nnoise line\n"
    )
    assert len(rows) == 1
    assert rows[0]["name"] == "NC_000913.3"
    assert rows[0]["attrs"] == {"direction": ">", "weighted_similarity": "12.0"}


def test_neighbor_blocks(spark, tmp_path):
    text = (
        "NZ_1 > 100 200\nsource: Escherichia coli K-12\nnearest: thrA\n"
        "\n"
        "NZ_2 < 300 400\nsource: Salmonella enterica\n"
    )
    p = tmp_path / "neigh.txt"
    p.write_text(text)
    rows = {r["name"]: r for r in legacy_blocks.read_neighbor_blocks(spark, str(p)).collect()}
    assert rows["NZ_1"]["nearest_gene"] == "thrA"
    assert (rows["NZ_2"]["left"], rows["NZ_2"]["right"]) == (300, 400)
    assert rows["NZ_2"]["nearest_gene"] is None
