"""Z-order layout tests: interleave correctness vs a Python reference,
bin edge cases, and the data-skipping payoff measured from real parquet
footers (zorder prunes on BOTH dims where a linear sort prunes on one)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import layout as lo


def _interleave_py(vals, bits):
    z = 0
    c = len(vals)
    for j, v in enumerate(vals):
        for t in range(bits):
            z |= ((v >> t) & 1) << (t * c + j)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    got = df.select(
        "id",
        lo.interleave_bits([F.col("x"), F.col("y")], bits=8).alias("z"),
    ).collect()
    want = {r[0]: _interleave_py([r[1], r[2]], 8) for r in rows}
    for r in got:
        assert r["z"] == want[r["id"]]


def test_interleave_monotone_on_single_column(spark):
    df = spark.range(64).select(F.col("id").cast("long").alias("x"))
    got = [
        r["z"]
        for r in df.select(
            lo.interleave_bits([F.col("x")], bits=6).alias("z")
        ).orderBy("z").collect()
    ]
    assert got == list(range(64))  # 1-column interleave is identity


def test_interleave_key_width_guard():
    with pytest.raises(ValueError):
        lo.interleave_bits([F.lit(1), F.lit(1)], bits=32)
    with pytest.raises(ValueError):
        lo.interleave_bits([], bits=8)


def test_bin_column_edges(spark):
    df = spark.createDataFrame(
        [(0.0,), (5.0,), (10.0,), (None,)], ["v"]
    )
    got = sorted(
        df.select(lo.bin_column(F.col("v"), 0.0, 10.0, 4).alias("b"))
        .collect(),
        key=lambda r: (r["b"] is None, r["b"]),
    )
    bins = [r["b"] for r in got]
    assert bins[0] == 0  # null -> 0
    assert 0 in bins and 15 in bins  # min -> 0, max -> 2^bits - 1
    # degenerate range: everything bins to 0
    z = df.select(lo.bin_column(F.col("v"), 3.0, 3.0, 4).alias("b")).collect()
    assert all(r["b"] == 0 for r in z)


def test_add_zorder_key_deterministic_with_ranges(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["a", "b"])
    r = {"a": (0.0, 4.0), "b": (0.0, 40.0)}
    k1 = lo.add_zorder_key(df, ["a", "b"], bits=4, ranges=r).collect()
    k2 = lo.add_zorder_key(df, ["a", "b"], bits=4, ranges=r).collect()
    assert sorted(map(tuple, k1)) == sorted(map(tuple, k2))


def test_zorder_skipping_beats_linear_sort(spark, tmp_path):
    """The actual payoff: write the same table twice — sorted by x, and
    Z-ordered on (x, y) — and count parquet row groups a selective
    y-filter would touch. The x-sorted layout can't skip on y at all;
    the Z-order layout must skip most groups on BOTH dimensions."""
    n, parts = 4096, 16
    # full independent 64 x 64 grid: every (x, y) combination once
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 64).cast("long").alias("x"),
        F.floor(F.col("id") / 64).cast("long").alias("y"),
    )
    lin = str(tmp_path / "linear")
    zo = str(tmp_path / "zorder")
    df.repartitionByRange(parts, "x").sortWithinPartitions("x").write.parquet(lin)
    lo.zorder_layout(df, ["x", "y"], bits=6, num_partitions=parts).write.parquet(zo)

    lin_y = lo.skipping_stats(lin, "y", 0, 7)
    zo_y = lo.skipping_stats(zo, "y", 0, 7)
    zo_x = lo.skipping_stats(zo, "x", 0, 7)
    assert lin_y["total"] >= parts
    # linear-by-x: y is uniform in every file -> nothing skippable
    assert lin_y["overlapping"] == lin_y["total"]
    # zorder: the 1/8-selective y filter touches a minority of groups
    assert zo_y["overlapping"] <= zo_y["total"] // 2
    # and x locality survives too
    assert zo_x["overlapping"] <= zo_x["total"] // 2


def test_zorder_layout_preserves_rows(spark):
    df = spark.range(500).select(
        F.col("id"),
        (F.col("id") % 10).alias("x"),
        (F.col("id") % 7).alias("y"),
    )
    out = lo.zorder_layout(df, ["x", "y"], bits=4, num_partitions=4)
    assert out.count() == 500
    assert sorted(out.columns) == ["id", "x", "y"]
