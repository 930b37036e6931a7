"""Gene-location analysis tests (J3 tail; fuzz-verified 120 random
matches bit-exact against the reference's interval_check + probe window
at build time — these are the distilled cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ncbi_analysis_spark.plans import location as loc
from ncbi_analysis_spark.similarity.scorers import consistency_render


def _recs(spark):
    # (name, direction, left, right, start): g1 forward 100-200,
    # g2 reverse 300-400 (start=400), g3 forward 500-600
    rows = [
        ("g1", ">", 100, 200, 100),
        ("g2", "<", 300, 400, 400),
        ("g3", ">", 500, 600, 500),
    ]
    return spark.createDataFrame(rows, ["name", "direction", "left", "right", "start"])


def run(spark, matches, **kw):
    m = spark.createDataFrame(matches, ["match_id", "start", "end"])
    out = loc.locate_matches(m, _recs(spark), **kw)
    got = {}
    for r in out.collect():
        got.setdefault(r["match_id"], set()).add((r["rec_name"], r["label"]))
    return got


def test_labels_forward_and_reverse(spark):
    got = run(spark, [(1, 90, 110), (2, 390, 410), (3, 150, 160)])
    # match crossing g1's left edge on a forward gene -> 5'
    assert ("g1", "5'") in got[1]
    # match crossing g2's right edge; g2 is reverse -> its 5' end
    assert ("g2", "5'") in got[2]
    # fully inside -> cds
    assert got[3] == {("g1", "cds")}


def test_inter_genic_fallback_names_neighbors(spark):
    got = run(spark, [(1, 210, 290)])
    assert got[1] == {("inter-genic of g1, g2", "inter-genic")}


def test_bounded_equals_unbounded_here(spark):
    matches = [(i, 80 + i * 37, 80 + i * 37 + 25) for i in range(12)]
    assert run(spark, matches, bounded=True) == run(spark, matches, bounded=False)


def test_remain_gene_semi_filter(spark):
    remain = spark.createDataFrame([("G1",)], ["gene"])
    got = run(spark, [(1, 150, 160), (2, 550, 560)], remain_genes=remain)
    assert 1 in got and 2 not in got  # only g1 (case-insensitive) survives


def test_keyed_locate_nearest_stays_within_accession(spark):
    """With on=["accession"], inter-genic fallback names must come from
    the match's OWN genome — a cross-genome bleed would mean the as-of
    key isn't actually partitioning."""
    recs = spark.createDataFrame(
        [
            ("A", "a1", ">", 100, 200, 100),
            ("A", "a2", ">", 500, 600, 500),
            ("B", "b1", ">", 290, 310, 290),  # overlaps A's gap midpoint
        ],
        ["accession", "name", "direction", "left", "right", "start"],
    )
    m = spark.createDataFrame(
        [("A", 1, 300, 320), ("B", 2, 100, 150)],
        ["accession", "match_id", "start", "end"],
    )
    out = loc.locate_matches(m, recs, on=["accession"], annotation_mode="broadcast")
    got = {r["match_id"]: (r["rec_name"], r["label"]) for r in out.collect()}
    # match 1 sits in A's gap; with the key it must name a1/a2, never b1
    assert got[1] == ("inter-genic of a1, a2", "inter-genic")
    # match 2 is left of every B gene: no left neighbor, right is b1
    assert got[2] == ("inter-genic of None, b1", "inter-genic")


def test_consistency_sub_locations(spark):
    score, glyph = consistency_render("acgtacgt", "acgtaaaa", patience=0)
    assert score == 5.0 and glyph.startswith("*****")
    df = spark.createDataFrame(
        [(1, glyph, int(score), 100, 107), (2, glyph, int(score), 207, 200)],
        ["match_id", "fmt", "best", "start", "end"],
    )
    out = loc.consistency_sub_locations(df, "fmt", "best", "start", "end").collect()
    rows = {r["match_id"]: r for r in out}
    assert (rows[1]["sub_left"], rows[1]["sub_right"]) == (1, 5)
    assert (rows[1]["sub_start"], rows[1]["sub_end"]) == (100, 104)
    # reverse-direction match walks coordinates downward
    assert (rows[2]["sub_start"], rows[2]["sub_end"]) == (207, 203)


def test_sub_span_filter_direction_aware(spark):
    rows = [
        (1, 95, 105, 100, 200),    # fwd gene start 100: within (-10, +10)
        (2, 130, 140, 100, 200),   # outside window
        (3, 105, 95, 100, 20),     # rev gene (start>end): within flipped window
    ]
    df = spark.createDataFrame(rows, ["id", "start", "end", "gene_start", "gene_end"])
    out = loc.sub_span_filter(df, 10, 10)
    assert sorted(r["id"] for r in out.collect()) == [1, 3]
