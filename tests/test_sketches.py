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


# --- KMV (k-minimum-values) sketches ------------------------------------


def test_kmv_sketch_size_and_order(spark):
    s = sk.kmv_sketch(_vals(spark, 500), "v", k=64).collect()
    hs = [r["h"] for r in s]
    assert len(hs) == 64
    assert all(0 <= h < (1 << 52) for h in hs)
    # the k SMALLEST distinct hashes: every member must be below any
    # non-member's hash — verify against a full hash recompute
    import hashlib

    all_h = {
        int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)
        for v in range(500)
    }
    assert set(hs) == set(sorted(all_h)[:64])


def test_kmv_unsaturated_is_exact(spark):
    # fewer distinct values than k: the sketch is the whole hash set
    # and the estimate is exactly the distinct count
    r = sk.kmv_estimate(
        sk.kmv_sketch(_vals(spark, 40, dup=3), "v", k=64), k=64
    ).collect()[0]
    assert r["n_hashes"] == 40
    assert r["est_distinct"] == 40.0


def test_kmv_estimate_accuracy(spark):
    # relative std error ~ 1/sqrt(k-2) = 6.4% at k=256; assert 4 sigma
    for n in (2000, 20000):
        r = sk.kmv_estimate(
            sk.kmv_sketch(_vals(spark, n), "v", k=256), k=256
        ).collect()[0]
        assert r["n_hashes"] == 256
        assert abs(r["est_distinct"] - n) / n < 0.26, (n, r)


def test_kmv_duplicates_do_not_move_sketch(spark):
    a = sk.kmv_sketch(_vals(spark, 300), "v", k=32).collect()
    b = sk.kmv_sketch(_vals(spark, 300, dup=5), "v", k=32).collect()
    assert sorted(r["h"] for r in a) == sorted(r["h"] for r in b)


def test_kmv_merge_equals_sketch_of_union(spark):
    # the hll_merge contract: merging two snapshot sketches must equal
    # the sketch of the unioned inputs, exactly
    a = _vals(spark, 400)
    b = _vals(spark, 400, offset=200)  # 200 shared values
    sa = sk.kmv_sketch(a, "v", k=64)
    sb = sk.kmv_sketch(b, "v", k=64)
    merged = sorted(
        r["h"] for r in sk.kmv_merge(sa, sb, k=64).collect()
    )
    direct = sorted(
        r["h"]
        for r in sk.kmv_sketch(a.unionByName(b), "v", k=64).collect()
    )
    assert merged == direct


def test_kmv_jaccard_estimate(spark):
    # |A|=|B|=600, |A∩B|=300, |A∪B|=900 -> J = 1/3
    a = _vals(spark, 600)
    b = _vals(spark, 600, offset=300)
    r = sk.kmv_jaccard(
        sk.kmv_sketch(a, "v", k=256),
        sk.kmv_sketch(b, "v", k=256),
        k=256,
    ).collect()[0]
    assert r["n_union_sketch"] == 256
    assert r["jaccard_est"] == r["n_inter"] / 256
    # binomial std err sqrt(J(1-J)/k) ~ 2.9%; assert 4 sigma
    assert abs(r["jaccard_est"] - 1 / 3) < 0.12, r
    # disjoint sets -> estimate exactly 0
    c = _vals(spark, 600, offset=10_000)
    r0 = sk.kmv_jaccard(
        sk.kmv_sketch(a, "v", k=256),
        sk.kmv_sketch(c, "v", k=256),
        k=256,
    ).collect()[0]
    assert r0["n_inter"] == 0 and r0["jaccard_est"] == 0.0
    # identical sets -> exactly 1
    r1 = sk.kmv_jaccard(
        sk.kmv_sketch(a, "v", k=256),
        sk.kmv_sketch(a, "v", k=256),
        k=256,
    ).collect()[0]
    assert r1["jaccard_est"] == 1.0


def test_kmv_grouped_matches_per_group(spark):
    df = spark.range(900).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 450).cast("string").alias("v"),
    )
    grouped = {
        (r["g"], r["h"])
        for r in sk.kmv_sketch(df, "v", k=32, group_by=["g"]).collect()
    }
    for g in ("0", "1", "2"):
        solo = {
            (g, r["h"])
            for r in sk.kmv_sketch(
                df.filter(F.col("g") == g), "v", k=32
            ).collect()
        }
        assert solo == {t for t in grouped if t[0] == g}


def test_kmv_nulls_skipped_and_validation(spark):
    df = spark.range(50).select(
        F.when(F.col("id") % 2 == 0, F.col("id").cast("string"))
        .alias("v")
    )
    r = sk.kmv_estimate(sk.kmv_sketch(df, "v", k=64), k=64).collect()[0]
    assert r["n_hashes"] == 25 and r["est_distinct"] == 25.0
    with pytest.raises(ValueError, match="k=1"):
        sk.kmv_sketch(df, "v", k=1)


# --- published-sketch parameter markers ---------------------------------


def test_sketch_publish_roundtrip_and_param_guard(spark, tmp_path):
    regs = sk.hll_registers(_vals(spark, 200), "v", p=8)
    p1 = str(tmp_path / "hll")
    sk.write_hll_sketch(regs, p1, p=8)
    back = sk.read_hll_sketch(spark, p1, p=8)
    assert sorted((r["register"], r["max_rho"]) for r in back.collect()) \
        == sorted((r["register"], r["max_rho"]) for r in regs.collect())
    # wrong p / wrong kind / wrong grouping all fail loudly
    with pytest.raises(ValueError, match="different parameter spaces"):
        sk.read_hll_sketch(spark, p1, p=12)
    with pytest.raises(ValueError, match="different parameter spaces"):
        sk.read_kmv_sketch(spark, p1, k=8)
    with pytest.raises(ValueError, match="different parameter spaces"):
        sk.read_hll_sketch(spark, p1, p=8, group_by=["g"])

    kv = sk.kmv_sketch(_vals(spark, 200), "v", k=32)
    p2 = str(tmp_path / "kmv")
    sk.write_kmv_sketch(kv, p2, k=32)
    got = sk.read_kmv_sketch(spark, p2, k=32)
    assert sorted(r["h"] for r in got.collect()) \
        == sorted(r["h"] for r in kv.collect())
    with pytest.raises(ValueError, match="different parameter spaces"):
        sk.read_kmv_sketch(spark, p2, k=64)


def test_sketch_read_without_marker_is_by_contract(spark, tmp_path):
    # a plain parquet directory (no marker) reads fine — the IVF
    # pre-guard posture
    p = str(tmp_path / "bare")
    sk.hll_registers(_vals(spark, 50), "v", p=8).write.parquet(p)
    assert sk.read_hll_sketch(spark, p, p=8).count() > 0


# --- HLL cube -----------------------------------------------------------


def test_hll_rollup_equals_direct_sketch(spark):
    df = spark.range(2000).select(
        (F.col("id") % 4).cast("string").alias("a"),
        (F.col("id") % 3).cast("string").alias("b"),
        (F.col("id") % 700).cast("string").alias("v"),
    )
    fine = sk.hll_registers(df, "v", p=8, group_by=["a", "b"])
    rolled = {
        (r["a"], r["register"]): r["max_rho"]
        for r in sk.hll_rollup(fine, ["a"]).collect()
    }
    direct = {
        (r["a"], r["register"]): r["max_rho"]
        for r in sk.hll_registers(df, "v", p=8, group_by=["a"]).collect()
    }
    assert rolled == direct


def test_hll_cube_grouping_sets(spark):
    df = spark.range(600).select(
        (F.col("id") % 2).cast("string").alias("a"),
        (F.col("id") % 3).cast("string").alias("b"),
        (F.col("id") % 150).cast("string").alias("v"),
    )
    cube = sk.hll_cube(df, "v", ["a", "b"], p=8).collect()
    by_gid = {}
    for r in cube:
        by_gid.setdefault(r["grouping_id"], []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    # gid bit semantics: 1 = b rolled up (a kept), 2 = a rolled up
    assert all(r["a"] is not None and r["b"] is not None
               for r in by_gid[0])
    assert all(r["a"] is not None and r["b"] is None for r in by_gid[1])
    assert all(r["a"] is None and r["b"] is not None for r in by_gid[2])
    assert all(r["a"] is None and r["b"] is None for r in by_gid[3])
    # every grouping set equals the direct sketch at that grain
    direct_a = {(r["a"], r["register"]): r["max_rho"] for r in
                sk.hll_registers(df, "v", p=8, group_by=["a"]).collect()}
    assert {(r["a"], r["register"]): r["max_rho"]
            for r in by_gid[1]} == direct_a
    direct_all = {r["register"]: r["max_rho"] for r in
                  sk.hll_registers(df, "v", p=8).collect()}
    assert {r["register"]: r["max_rho"] for r in by_gid[3]} == direct_all
    # the overall CORRECTED estimate (150 distinct in 256 registers is
    # the small-range linear-counting regime where est_raw biases high)
    est = sk.hll_estimate(
        spark.createDataFrame(
            [(r["register"], r["max_rho"]) for r in by_gid[3]],
            "register int, max_rho int"),
        p=8).collect()[0]
    assert abs(est["est"] - 150) / 150 < 0.2

    with pytest.raises(ValueError, match="at least one dim"):
        sk.hll_cube(df, "v", [])


# --- quantile sketch (bottom-k value sample) --------------------------


def _qdocs(spark, n, seed_mod=7):
    # deterministic synthetic: value = (i * seed_mod) % n spreads 0..n-1
    return spark.createDataFrame(
        [(i, (i * seed_mod) % n) for i in range(n)], "id long, v long")


def test_quantile_sketch_merge_equals_rebuild_saturated(spark):
    d = _qdocs(spark, 400)
    a, b = d.filter("id % 2 = 0"), d.filter("id % 2 = 1")
    k = 64  # saturated: every part has 200 > 64 rows
    sa = sk.quantile_sketch(a, "v", "id", k=k)
    sb = sk.quantile_sketch(b, "v", "id", k=k)
    merged = {(r["h"], r["v"])
              for r in sk.quantile_sketch_merge(sa, sb, k).collect()}
    rebuilt = {(r["h"], r["v"])
               for r in sk.quantile_sketch(d, "v", "id", k=k).collect()}
    assert merged == rebuilt and len(merged) == k


def test_quantile_sketch_unsaturated_is_exact(spark):
    # fewer rows than k: the sketch holds every value, estimates are
    # the exact discrete quantiles (ceil-index convention)
    vals = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]
    d = spark.createDataFrame(list(enumerate(vals)), "id long, v long")
    s = sk.quantile_sketch(d, "v", "id", k=64)
    est = {r["q_ppm"]: (r["n_sample"], r["est_v"])
           for r in sk.quantile_sketch_estimate(
               s, [0.1, 0.25, 0.5, 1.0]).collect()}
    assert est[100_000] == (10, 10)     # ceil(0.1*10)=1 -> 10
    assert est[250_000] == (10, 30)     # ceil(2.5)=3 -> 30
    assert est[500_000] == (10, 50)     # ceil(5)=5 -> 50
    assert est[1_000_000] == (10, 100)  # max


def test_quantile_sketch_estimate_close_to_exact(spark):
    n = 2000
    d = _qdocs(spark, n, seed_mod=13)
    s = sk.quantile_sketch(d, "v", "id", k=512)
    est = {r["q_ppm"]: r["est_v"]
           for r in sk.quantile_sketch_estimate(s, [0.25, 0.5, 0.9]).collect()}
    # true quantile of 0..n-1 ~ q*n; rank error O(1/sqrt(k)) ~ 4.4% ->
    # assert within 10% of n
    for q_ppm, want in [(250_000, 500), (500_000, 1000), (900_000, 1800)]:
        assert abs(est[q_ppm] - want) < 0.10 * n, (q_ppm, est[q_ppm])


def test_quantile_sketch_grouped_and_threshold(spark):
    d = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", i) for i in range(300)],
        "id long, g string, v long")
    s = sk.quantile_sketch(d, "v", "id", k=32, group_by=["g"])
    assert s.groupBy("g").count().agg({"count": "max"}).collect()[0][0] == 32
    est = sk.quantile_sketch_estimate(s, [0.5], group_by=["g"]).collect()
    assert {r["g"] for r in est} == {"a", "b"}
    # threshold twin: single-row frame usable as a gate input
    t = sk.quantile_sketch_threshold(
        sk.quantile_sketch(d, "v", "id", k=64), 0.5).collect()
    assert len(t) == 1 and 50 <= t[0]["threshold"] <= 250


def test_quantile_sketch_nulls_validation_and_publish(spark, tmp_path):
    import pytest as _pytest

    d = spark.createDataFrame(
        [(0, None), (1, 5), (2, 7)], "id long, v long")
    s = sk.quantile_sketch(d, "v", "id", k=8)
    assert s.count() == 2  # NULL value excluded
    with _pytest.raises(ValueError, match="k=1"):
        sk.quantile_sketch(d, "v", "id", k=1)
    with _pytest.raises(ValueError, match="must be in"):
        sk.quantile_sketch_estimate(s, [0.0])
    with _pytest.raises(ValueError, match="no quantiles"):
        sk.quantile_sketch_estimate(s, [])
    p = str(tmp_path / "qsk")
    sk.write_quantile_sketch(s, p, k=8)
    back = sk.read_quantile_sketch(spark, p, k=8)
    assert {(r["h"], r["v"]) for r in back.collect()} == \
           {(r["h"], r["v"]) for r in s.collect()}
    with _pytest.raises(ValueError, match="parameter spaces"):
        sk.read_quantile_sketch(spark, p, k=16)


# --- KMV set-difference estimates -------------------------------------


def test_kmv_diff_unsaturated_is_exact(spark):
    # |A|,|B| < k: the union sketch IS the union; counts are exact
    a = spark.createDataFrame([(f"a{i}",) for i in range(6)] +
                              [(f"s{i}",) for i in range(4)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(3)] +
                              [(f"s{i}",) for i in range(4)], "v string")
    r = sk.kmv_diff(sk.kmv_sketch(a, "v", k=64),
                    sk.kmv_sketch(b, "v", k=64), k=64).collect()[0]
    assert (r["n_only_a"], r["n_only_b"], r["n_both"]) == (6, 3, 4)
    assert r["est_union"] == 13.0
    assert r["est_only_a"] == 6.0 / 13.0 * 13.0
    assert r["est_inter"] == 4.0 / 13.0 * 13.0


def test_kmv_diff_estimate_accuracy_saturated(spark):
    """3000 A-only, 1000 B-only, 2000 shared at k=512: the engine must
    match a from-scratch Python bottom-k model BIT-FOR-BIT (the strong
    check — the deterministic md5 draw happens to run the smallest
    stratum ~3 sigma low, so statistical bounds on it stay loose)."""
    import hashlib

    def h52(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)

    A = [f"a{i}" for i in range(3000)] + [f"s{i}" for i in range(2000)]
    B = [f"b{i}" for i in range(1000)] + [f"s{i}" for i in range(2000)]
    a = spark.createDataFrame([(v,) for v in A], "v string")
    b = spark.createDataFrame([(v,) for v in B], "v string")
    k = 512
    r = sk.kmv_diff(sk.kmv_sketch(a, "v", k=k),
                    sk.kmv_sketch(b, "v", k=k), k=k).collect()[0]
    sa = set(sorted(map(h52, A))[:k])
    sb = set(sorted(map(h52, B))[:k])
    x = sorted(sa | sb)[:k]
    only_a = sum(1 for h in x if h in sa and h not in sb)
    only_b = sum(1 for h in x if h in sb and h not in sa)
    both = sum(1 for h in x if h in sa and h in sb)
    est_u = (k - 1) * float(1 << 52) / max(x)
    assert (r["n_only_a"], r["n_only_b"], r["n_both"]) == \
           (only_a, only_b, both)
    assert r["est_union"] == est_u
    assert r["est_only_a"] == only_a / k * est_u
    assert r["est_only_b"] == only_b / k * est_u
    assert r["est_inter"] == both / k * est_u
    # loose sanity on the big strata (the unlucky small stratum aside)
    assert abs(r["est_union"] - 6000) / 6000 < 0.15
    assert abs(r["est_only_a"] - 3000) / 3000 < 0.25
    assert r["n_only_a"] + r["n_only_b"] + r["n_both"] == r["n_union_sketch"]


def test_kmv_diff_grouped_and_python_model(spark):
    """Grouped form + bit-exact check of the membership counts against
    a from-scratch Python bottom-k model."""
    import hashlib

    def h52(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)

    rows_a = [("g1", f"x{i}") for i in range(40)] + \
             [("g2", f"y{i}") for i in range(10)]
    rows_b = [("g1", f"x{i}") for i in range(20, 60)] + \
             [("g2", f"z{i}") for i in range(10)]
    k = 16
    a = spark.createDataFrame(rows_a, "g string, v string")
    b = spark.createDataFrame(rows_b, "g string, v string")
    got = {r["g"]: r for r in sk.kmv_diff(
        sk.kmv_sketch(a, "v", k=k, group_by=["g"]),
        sk.kmv_sketch(b, "v", k=k, group_by=["g"]),
        k=k, group_by=["g"]).collect()}
    for g in ("g1", "g2"):
        sa = set(sorted(h52(v) for gg, v in rows_a if gg == g)[:k])
        sb = set(sorted(h52(v) for gg, v in rows_b if gg == g)[:k])
        x = set(sorted(sa | sb)[:k])
        r = got[g]
        assert r["n_only_a"] == len({h for h in x if h in sa and h not in sb})
        assert r["n_only_b"] == len({h for h in x if h in sb and h not in sa})
        assert r["n_both"] == len({h for h in x if h in sa and h in sb})


def test_quantile_sketch_tail_error_bound(spark):
    """The measured-accuracy envelope (SCALING.md round 13): on a
    known-rank corpus the q-quantile estimate's true rank must sit
    within 5*sqrt(q(1-q)/k) of q — the binomial order-statistic bound
    with headroom. Everything here is deterministic (md5 of fixed ids),
    so this pins the sampling uniformity of the hash+cut: a regression
    that biases the bottom-k sample fails loudly."""
    import math

    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators import sketches as sk

    n = 20_000
    base = spark.range(1, n + 1).select(
        F.col("id").alias("rid"), F.col("id").alias("v"))
    for k in (256, 1024):
        s = sk.quantile_sketch(base, "v", "rid", k=k)
        for q in (0.5, 0.9, 0.99, 0.999):
            est = sk.quantile_sketch_estimate(s, [q]).collect()[0]
            err = abs(est["est_v"] / n - q)
            bound = 5 * math.sqrt(q * (1 - q) / k)
            assert err <= bound, (k, q, err, bound)
