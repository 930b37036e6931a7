"""Count-Min sketch + two-pass exact top-N heavy hitters: merge
contract, one-sided error, Misra-Gries candidate coverage, and
guarantee-flag semantics on skewed synthetics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import heavy_hitters as hh


def _zipfy(spark, reps):
    # reps: dict token -> count; rows shuffled deterministically by id
    rows = []
    for tok, cnt in reps.items():
        rows.extend((tok,) for _ in range(cnt))
    return spark.createDataFrame(rows, "g string").repartition(5)


def test_cm_merge_equals_rebuild_and_one_sided(spark):
    reps = {f"t{i}": 5 + i for i in range(40)}
    d = _zipfy(spark, reps)
    a = d.filter(F.crc32("g") % 2 == 0)
    b = d.filter(F.crc32("g") % 2 == 1)
    W, D = 64, 3  # narrow on purpose: force collisions
    merged = hh.cm_merge(hh.cm_sketch(a, "g", W, D),
                         hh.cm_sketch(b, "g", W, D))
    rebuilt = hh.cm_sketch(d, "g", W, D)
    assert {tuple(r) for r in merged.collect()} == \
           {tuple(r) for r in rebuilt.collect()}
    items = spark.createDataFrame([(t,) for t in reps], "g string")
    est = {r["item"]: r["est_cnt"]
           for r in hh.cm_estimate(merged, items, "g", W, D).collect()}
    for t, true in reps.items():
        assert est[t] >= true, (t, est[t], true)  # never undercounts


def test_cm_estimate_absent_item_and_weighted(spark):
    d = _zipfy(spark, {"a": 10, "b": 3})
    s = hh.cm_sketch(d, "g", width=1024, depth=4)
    items = spark.createDataFrame(
        [("a",), ("zzz_never_seen",)], "g string")
    est = {r["item"]: r["est_cnt"]
           for r in hh.cm_estimate(s, items, "g", 1024, 4).collect()}
    assert est["a"] >= 10
    # wide sketch, tiny vocab: the absent item's registers are
    # overwhelmingly unhit -> estimate 0 (and never negative)
    assert est["zzz_never_seen"] >= 0
    # weighted counts: weight 3 per occurrence triples the register
    w = d.withColumn("w", F.lit(3))
    sw = hh.cm_sketch(w, "g", 1024, 4, weight_col="w")
    estw = {r["item"]: r["est_cnt"]
            for r in hh.cm_estimate(sw, items, "g", 1024, 4).collect()}
    assert estw["a"] >= 30


def test_cm_validation(spark):
    d = _zipfy(spark, {"a": 1})
    with pytest.raises(ValueError, match="width"):
        hh.cm_sketch(d, "g", width=1, depth=2)
    with pytest.raises(ValueError, match="width"):
        hh.cm_estimate(hh.cm_sketch(d, "g"), d, "g", 1024, 0)


def test_heavy_hitters_exact_on_skew(spark):
    # zipf-ish: two dominant tokens + a tail; top-3 unambiguous
    reps = {"big": 300, "mid": 150, "low": 80}
    reps.update({f"tail{i}": 2 for i in range(50)})
    d = _zipfy(spark, reps)
    out = hh.heavy_hitters_topn(d, "g", n=3, m=16).collect()
    assert [(r["token"], r["cnt"]) for r in out] == \
           [("big", 300), ("mid", 150), ("low", 80)]
    # all three clear N/(m+1) = 630/17 ~ 37 -> layout-independent
    assert all(r["guaranteed"] for r in out)


def test_heavy_hitters_guarantee_flag_below_bound(spark):
    # with m tiny, the bound N/(m+1) is high: tail rows in the top-n
    # report guaranteed=False
    reps = {"big": 100, "a": 6, "b": 5, "c": 4}
    d = _zipfy(spark, reps)
    out = {r["token"]: (r["cnt"], r["guaranteed"])
           for r in hh.heavy_hitters_topn(d, "g", n=4, m=2).collect()}
    assert out["big"] == (100, True)  # 100*3 > 115
    for t in ("a", "b", "c"):
        if t in out:
            assert out[t][1] is False


def test_heavy_hitters_tiebreak_and_validation(spark):
    d = _zipfy(spark, {"bb": 5, "aa": 5, "cc": 5})
    out = hh.heavy_hitters_topn(d, "g", n=2, m=8).collect()
    assert [r["token"] for r in out] == ["aa", "bb"]  # token asc on tie
    with pytest.raises(ValueError, match="n=0"):
        hh.heavy_hitters_topn(d, "g", n=0)
    with pytest.raises(ValueError, match="m=0"):
        hh.partition_top_tokens(d, "g", 0)


def test_partition_top_tokens_bounds_and_nulls(spark):
    d = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "g string").repartition(2)
    rows = hh.partition_top_tokens(d, "g", m=1).collect()
    # <= 1 row per partition, nulls skipped
    assert 1 <= len(rows) <= 2
    assert all(r["token"] in ("a", "b") for r in rows)


def test_heavy_hitters_topn_grouped_matches_model(spark):
    """Grouped two-pass top-N vs a pure-Python per-group recount, on a
    skewed synthetic spread over 4 partitions; per-group guarantee
    flags must use the GROUP total, not the corpus total."""
    from collections import Counter

    from ncbi_analysis_spark.operators.heavy_hitters import (
        heavy_hitters_topn_grouped,
    )

    rows = (
        [("en", "the")] * 40 + [("en", "cat")] * 9
        + [("en", f"t{i}") for i in range(12)]
        + [("fr", "le")] * 25 + [("fr", "chat")] * 7
        + [("fr", f"f{i}") for i in range(8)]
        + [(None, "skipme"), ("en", None)]
    )
    d = spark.createDataFrame(rows, "lang string, tok string").repartition(4)
    m, n = 8, 3
    got = heavy_hitters_topn_grouped(d, "tok", "lang", n=n, m=m).collect()

    by_grp: dict = {}
    for g, t in rows:
        if g is None or t is None:
            continue
        by_grp.setdefault(g, Counter())[t] += 1
    want = []
    for g in sorted(by_grp):
        tot = sum(by_grp[g].values())
        top = sorted(by_grp[g].items(), key=lambda kv: (-kv[1], kv[0]))[:n]
        want += [(g, t, c, c * (m + 1) > tot) for t, c in top]
    assert sorted(map(tuple, got)) == sorted(want)


def test_cm_subtract_is_exact_inverse_of_merge(spark):
    """Turnstile property: subtract(merge(A,B), B) == sketch(A)
    register-for-register, and estimates follow; subtracting unmerged
    data leaves (kept, unclamped) negative registers that a re-add
    cancels exactly."""
    from ncbi_analysis_spark.operators.heavy_hitters import (
        cm_merge,
        cm_sketch,
        cm_subtract,
    )

    W, D = 16, 3
    a = spark.createDataFrame(
        [(w,) for w in "x y x z q x y".split()], "t string")
    b = spark.createDataFrame(
        [(w,) for w in "z z y w".split()], "t string")
    sa, sb = cm_sketch(a, "t", W, D), cm_sketch(b, "t", W, D)
    back = cm_subtract(cm_merge(sa, sb), sb)
    assert sorted(map(tuple, back.collect())) == \
           sorted(map(tuple, sa.collect()))
    # unmerged subtract -> negatives kept; re-add cancels
    neg = cm_subtract(sa, sb)
    assert any(r["cnt"] < 0 for r in neg.collect())
    assert sorted(map(tuple, cm_merge(neg, sb).collect())) == \
           sorted(map(tuple, sa.collect()))
