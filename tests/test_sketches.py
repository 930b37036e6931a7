"""HyperLogLog register-table tests: accuracy vs exact distinct counts,
the exact merge property (merge == sketch-of-union), group parity, and
parameter validation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import sketches as sk


def _vals(spark, n, dup=1, offset=0):
    return spark.range(n * dup).select(
        (F.col("id") % n + offset).cast("string").alias("v")
    )


def _est(spark, df, p=8):
    row = sk.hll_distinct(df, "v", p=p).collect()
    assert len(row) == 1
    return row[0]


def test_hll_accuracy_across_cardinalities(spark):
    # std error ~ 1.04/sqrt(256) = 6.5%; assert 4 sigma
    for n in (50, 500, 5000):
        r = _est(spark, _vals(spark, n))
        assert abs(r["est"] - n) / n < 4 * 1.04 / math.sqrt(256), (n, r)


def test_hll_duplicates_do_not_move_estimate(spark):
    a = _est(spark, _vals(spark, 300, dup=1))
    b = _est(spark, _vals(spark, 300, dup=7))
    assert a == b  # identical registers -> identical floats


def test_hll_merge_equals_sketch_of_union(spark):
    x = _vals(spark, 400, offset=0)
    y = _vals(spark, 400, offset=200)  # half-overlapping
    ra = sk.hll_registers(x, "v")
    rb = sk.hll_registers(y, "v")
    merged = sk.hll_merge(ra, rb).collect()
    direct = sk.hll_registers(x.unionByName(y), "v").collect()
    key = lambda rows: sorted((r["register"], r["max_rho"]) for r in rows)  # noqa: E731
    assert key(merged) == key(direct)


def test_hll_grouped_matches_per_group_fits(spark):
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 700).cast("string").alias("v"),
    )
    grouped = {
        r["g"]: (r["n_present"], r["est_raw"])
        for r in sk.hll_distinct(df, "v", group_by=["g"]).collect()
    }
    assert set(grouped) == {"0", "1", "2"}
    for g in grouped:
        solo = sk.hll_distinct(df.filter(F.col("g") == g), "v").collect()[0]
        assert grouped[g] == (solo["n_present"], solo["est_raw"])


def test_hll_nulls_skipped_and_small_range_correction(spark):
    df = spark.createDataFrame(
        [(None,), ("a",), ("b",), ("a",)], ["v"]
    )
    r = _est(spark, df)
    # tiny set: linear counting branch, exact within a whisker
    assert r["n_present"] == 2
    assert abs(r["est"] - 2) < 0.1


def test_hll_register_bounds(spark):
    regs = sk.hll_registers(_vals(spark, 3000), "v", p=8).collect()
    assert all(0 <= r["register"] < 256 for r in regs)
    assert all(1 <= r["max_rho"] <= 53 for r in regs)
    assert len(regs) <= 256


def test_hll_param_validation(spark):
    df = _vals(spark, 10)
    with pytest.raises(ValueError):
        sk.hll_registers(df, "v", p=7)
    with pytest.raises(ValueError):
        sk.hll_registers(df, "v", p=20)
    with pytest.raises(ValueError):
        sk._alpha(8)


def test_hll_matches_pure_python_reference(spark):
    """Independent reimplementation check (the BPE-test posture): the
    Spark register table equals a from-scratch Python HLL over the same
    values."""
    import hashlib

    n = 800
    df = _vals(spark, n)
    got = {
        r["register"]: r["max_rho"]
        for r in sk.hll_registers(df, "v", p=8).collect()
    }
    want: dict = {}
    for i in range(n):
        h = hashlib.md5(str(i).encode()).hexdigest()
        reg = int(h[:2], 16)
        w = int(h[2 : 2 + 13], 16)
        rho = 53 if w == 0 else 52 - w.bit_length() + 1
        want[reg] = max(want.get(reg, 0), rho)
    assert got == want
