"""Scale-technique tests: salting preserves semantics; bucketed joins
produce exchange-free plans (asserted on the physical plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import scale


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(300)], ["k", "v"]  # key 0 is hot
    )
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "tag"])
    plain = left.join(right, "k").select("k", "v", "tag")
    salted = scale.salted_join(left, right, "k", salt=4).select("k", "v", "tag")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_outer(spark):
    """right/full outer would replicate unmatched right rows salt x —
    the operator must refuse rather than silently corrupt."""
    import pytest

    left = spark.createDataFrame([(0, 1)], ["k", "v"])
    right = spark.createDataFrame([(0, "a"), (9, "z")], ["k", "tag"])
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            scale.salted_join(left, right, "k", salt=4, how=how)
    # left join stays supported and exact: unmatched LEFT rows carry one
    # salt value each, so they appear exactly once
    left2 = spark.createDataFrame([(0, 1), (7, 2)], ["k", "v"])
    got = sorted(map(tuple,
                     scale.salted_join(left2, right, "k", salt=4, how="left")
                     .select("k", "v", "tag").collect()))
    assert got == [(0, 1, "a"), (7, 2, None)]


def test_bucketed_join_no_exchange(spark):
    # warehouse dir is set (statically) by get_spark; broadcast disabled so
    # the join would need an exchange if bucketing didn't align partitions
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 1000).withColumn("k", F.col("id") % 50)
        b = spark.range(0, 500).withColumn("k", F.col("id") % 50).withColumn("w", F.lit("x"))
        scale.write_bucketed(a, "bt_a", "k", buckets=8)
        scale.write_bucketed(b, "bt_b", "k", buckets=8)
        joined = scale.bucketed_join(spark, "bt_a", "bt_b", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() == 50 * 20 * 10  # 50 keys x 20 left x 10 right
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_hash_split_deterministic_and_proportional(spark):
    from ncbi_analysis_spark.operators.scale import hash_split, sample_by_hash

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    # rerun-stable: identical assignment on a differently-partitioned copy
    out2 = hash_split(df.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(out2).count() == 0

    s1 = sample_by_hash(df, "doc_id", 0.2)
    s2 = sample_by_hash(df.repartition(3), "doc_id", 0.2)
    assert s1.exceptAll(s2).count() == 0
    assert abs(s1.count() / 5000 - 0.2) < 0.03
    # sampling is a pure map: no exchange in the plan
    assert "Exchange" not in s1._jdf.queryExecution().executedPlan().toString()


def test_leakage_safe_split_clusters_never_straddle(spark):
    """Every member of a near-dup cluster must land in the same split;
    singletons (absent from the components frame) hash on their own id,
    identical to a plain hash_split."""
    from ncbi_analysis_spark.operators.scale import hash_split, leakage_safe_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    # clusters: {0..4}, {100,101}, everything else singleton
    comp = spark.createDataFrame(
        [(i, 0) for i in range(5)] + [(100, 100), (101, 100)],
        ["id", "component"],
    )
    out = leakage_safe_split(df, "doc_id", comp,
                             {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r["doc_id"]: (r["rep"], r["split"]) for r in out.collect()}
    assert len(rows) == 2000
    assert len({rows[i][1] for i in range(5)}) == 1  # cluster 0..4 together
    assert rows[100][1] == rows[101][1]
    assert rows[3][0] == 0 and rows[101][0] == 100

    # singletons match the row-keyed split exactly
    plain = {r["doc_id"]: r["split"]
             for r in hash_split(df, "doc_id",
                                 {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    for i in (7, 999, 1500):
        assert rows[i][1] == plain[i]

    # deterministic under repartitioning
    out2 = leakage_safe_split(df.repartition(7), "doc_id", comp,
                              {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(out2).count() == 0


def test_write_training_shards_layout_and_file_bounds(spark, tmp_path):
    """Partition directories per split value; maxRecordsPerFile bounds
    every data file; read-back is lossless."""
    import glob

    from ncbi_analysis_spark.operators.scale import hash_split
    from ncbi_analysis_spark.sources.sinks import write_training_shards

    df = hash_split(
        spark.range(0, 1000).withColumnRenamed("id", "doc_id"), "doc_id",
        {"train": 0.8, "val": 0.2},
    )
    out = str(tmp_path / "shards")
    write_training_shards(df.repartition(1), out, ["split"], max_records_per_file=100)

    import os
    assert sorted(
        d for d in os.listdir(out) if d.startswith("split=")
    ) == ["split=train", "split=val"]
    for part in ("train", "val"):
        n = df.filter(F.col("split") == part).count()
        files = glob.glob(f"{out}/split={part}/*.parquet")
        assert len(files) >= -(-n // 100)  # ceil: the bound held
        for f in files:
            import pyarrow.parquet as pq
            assert pq.read_metadata(f).num_rows <= 100

    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.select(F.sum("doc_id")).collect()[0][0] == 499500


def test_stratified_sample_rates_and_stability(spark):
    from ncbi_analysis_spark.operators.scale import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(4000)], ["doc_id", "g"]
    )
    out = stratified_sample(df, "g", {"a": 1.0, "b": 0.1}, "doc_id")
    counts = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert counts["a"] == 2000  # rate 1.0 keeps everything
    assert abs(counts.get("b", 0) / 2000 - 0.1) < 0.03
    # unknown groups get default_rate (0 -> dropped entirely)
    df2 = spark.createDataFrame([(1, "zzz")], ["doc_id", "g"])
    assert stratified_sample(df2, "g", {"a": 1.0}, "doc_id").count() == 0
    # retry/partition stability
    out2 = stratified_sample(df.repartition(7), "g", {"a": 1.0, "b": 0.1}, "doc_id")
    assert out.exceptAll(out2).count() == 0
    # pure map: no exchange
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_deterministic_shuffle_stable_and_contiguous(spark):
    """deterministic_shuffle: (shard, pos) must be identical across
    partition layouts (layout independence is the whole point), shards
    within range, and pos a contiguous 1..N_shard numbering."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.operators.scale import deterministic_shuffle

    d1 = spark.range(500).select(F.col("id").alias("doc_id"))
    d2 = d1.repartition(7)  # different layout, same rows
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in deterministic_shuffle(d1, "doc_id", 8).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in deterministic_shuffle(d2, "doc_id", 8).collect()}
    assert a == b and len(a) == 500
    assert all(0 <= s < 8 for s, _ in a.values())
    by_shard = {}
    for s, p in a.values():
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), f"shard {s} not contiguous"


def test_staging_dir_rotation_keeps_previous_call_readable(spark):
    """The in-process rebuild hazard (r6 review): a lazy DataFrame held
    from the PREVIOUS corpus_shard_roundtrip call must still read its
    staged files after the next call re-stages — the two-slot rotation
    reclaims only the call before that."""
    from ncbi_analysis_spark.plans.driver_queries_r5 import (
        corpus_shard_roundtrip,
    )

    sf = "/root/testdata/sf0.001"
    df1 = corpus_shard_roundtrip(spark, sf)
    df2 = corpus_shard_roundtrip(spark, sf)
    # execute df1 AFTER df2's staging ran — with a single shared dir
    # this raised FileNotFound / read df2's files
    a = sorted(map(tuple, df1.collect()))
    b = sorted(map(tuple, df2.collect()))
    assert a == b and len(a) > 0


def test_temperature_quotas_allocation(spark):
    """Temperature mixture quotas: integer quotas sum to the requested
    total, α<1 upweights low-resource groups relative to proportional
    allocation, per-group caps bind, and the result is partition-layout
    invariant."""
    from ncbi_analysis_spark.operators.scale import temperature_quotas

    rows = (
        [("en", i) for i in range(900)]
        + [("de", i) for i in range(90)]
        + [("sw", i) for i in range(10)]
    )
    df = spark.createDataFrame(rows, ["lang", "doc_id"])
    got = {r["lang"]: r for r in
           temperature_quotas(df, ["lang"], total=100, alpha=0.5).collect()}
    quotas = {k: v["quota"] for k, v in got.items()}
    assert sum(quotas.values()) == 100
    # proportional would give en 90 / de 9 / sw 1; sqrt-temperature
    # shifts mass to the tail
    assert quotas["en"] < 90 and quotas["sw"] > 1
    assert all(quotas[k] <= got[k]["n_rows"] for k in quotas)
    re_got = {r["lang"]: r["quota"] for r in
              temperature_quotas(df.repartition(13), ["lang"],
                                 total=100, alpha=0.5).collect()}
    assert quotas == re_got


def test_temperature_quotas_caps_and_alpha1(spark):
    from ncbi_analysis_spark.operators.scale import temperature_quotas

    rows = [("a", i) for i in range(4)] + [("b", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["g", "i"])
    # total larger than group a can supply: a caps at 4, b absorbs its
    # one-round top-up share (single-round apportionment, documented)
    got = {r["g"]: r["quota"] for r in
           temperature_quotas(df, ["g"], total=50, alpha=1.0).collect()}
    assert got["a"] <= 4
    assert got["b"] <= 100
    assert sum(got.values()) <= 50


def test_apply_quotas_materializes_allowances(spark):
    from ncbi_analysis_spark.operators.scale import apply_quotas

    rows = [("en", i) for i in range(10)] + [("de", 100 + i) for i in range(4)]
    df = spark.createDataFrame(rows, ["lang", "doc_id"])
    q = spark.createDataFrame([("en", 3), ("de", 4)], ["lang", "quota"])
    out = apply_quotas(df, q, ["lang"], "doc_id").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(by_lang["en"]) == 3 and len(by_lang["de"]) == 4
    # md5 keep-order: identical on a different layout
    re_out = apply_quotas(df.repartition(7), q, ["lang"], "doc_id").collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in re_out}


def test_temperature_quotas_max_groups_guard(spark):
    """High-cardinality grouping must fail fast, not silently serialize
    the single-partition apportionment windows (review finding)."""
    import pytest

    from ncbi_analysis_spark.operators.scale import temperature_quotas

    df = spark.createDataFrame([(i, i) for i in range(40)], ["g", "doc_id"])
    # plan-embedded assert: fires on execution (no extra driver-side
    # count job), surfacing as a Spark runtime error with the message
    with pytest.raises(Exception, match="max_groups"):
        temperature_quotas(df, ["g"], total=10, max_groups=30).collect()
    # at or under the ceiling the allocation proceeds unchanged
    assert temperature_quotas(df, ["g"], total=10, max_groups=40).count() == 40


def test_temperature_quotas_uncapped_sums_to_total(spark):
    """cap_at_group_size=False: pure ∝ c^α apportionment — quotas sum to
    exactly the total and CAN exceed a group's row count (the
    sampling-with-replacement target)."""
    from ncbi_analysis_spark.operators.scale import temperature_quotas

    rows = [("a", i) for i in range(4)] + [("b", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["g", "i"])
    got = {r["g"]: r["quota"] for r in
           temperature_quotas(df, ["g"], total=50, alpha=1.0,
                              cap_at_group_size=False).collect()}
    assert sum(got.values()) == 50
    # uncapped default behaviour unchanged: the capped variant still
    # never exceeds group size on the same input
    capped = {r["g"]: r["quota"] for r in
              temperature_quotas(df, ["g"], total=200, alpha=1.0).collect()}
    assert capped["a"] <= 4
    un = {r["g"]: r["quota"] for r in
          temperature_quotas(df, ["g"], total=200, alpha=0.5,
                             cap_at_group_size=False).collect()}
    assert sum(un.values()) == 200 and un["a"] > 4  # a repeats


def test_epoch_materialize_counts_and_epochs(spark):
    """Each group emits exactly `target` rows: every row floor(target/n)
    times, the first target%n rows (md5 order) once more; epoch is the
    1-based repeat index."""
    from ncbi_analysis_spark.operators.scale import epoch_materialize

    rows = [("en", i) for i in range(10)] + [("sw", 100 + i) for i in range(4)]
    df = spark.createDataFrame(rows, ["lang", "doc_id"])
    t = spark.createDataFrame([("en", 7), ("sw", 11)], ["lang", "quota"])
    out = epoch_materialize(df, t, ["lang"], "doc_id").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append((r["doc_id"], r["epoch"]))
    # en: target < n -> 7 distinct docs, all epoch 1
    assert len(by_lang["en"]) == 7
    assert all(e == 1 for _, e in by_lang["en"])
    # sw: 11 = 2*4 + 3 -> every doc twice, three docs a third time
    assert len(by_lang["sw"]) == 11
    per_doc = {}
    for d, e in by_lang["sw"]:
        per_doc.setdefault(d, []).append(e)
    counts = sorted(len(v) for v in per_doc.values())
    assert counts == [2, 3, 3, 3]
    for d, es in per_doc.items():
        assert sorted(es) == list(range(1, len(es) + 1))
    # layout invariance
    re_out = epoch_materialize(df.repartition(7), t, ["lang"], "doc_id").collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in out) == \
        sorted((r["doc_id"], r["epoch"]) for r in re_out)


def test_epoch_materialize_degenerates_to_apply_quotas(spark):
    """target <= n must keep exactly apply_quotas' keep-set (shared
    _md5_keep_rank order) with epoch=1 — the two materializers can never
    diverge on which rows survive."""
    from ncbi_analysis_spark.operators.scale import (
        apply_quotas,
        epoch_materialize,
    )

    rows = [("en", i) for i in range(20)] + [("de", 100 + i) for i in range(9)]
    df = spark.createDataFrame(rows, ["lang", "doc_id"])
    q = spark.createDataFrame([("en", 5), ("de", 9)], ["lang", "quota"])
    keep = {r["doc_id"] for r in apply_quotas(df, q, ["lang"], "doc_id").collect()}
    ep = {r["doc_id"]: r["epoch"]
          for r in epoch_materialize(df, q, ["lang"], "doc_id").collect()}
    assert set(ep) == keep and set(ep.values()) == {1}


def test_epoch_materialize_max_epochs_guard(spark):
    """A target implying more repeats than max_epochs must fail loudly
    in-plan — a mis-set mixture total on a tiny group is a corpus-sized
    output bug, not a warning."""
    import pytest

    from ncbi_analysis_spark.operators.scale import epoch_materialize

    df = spark.createDataFrame([("a", 1), ("a", 2)], ["g", "doc_id"])
    t = spark.createDataFrame([("a", 500)], ["g", "quota"])
    with pytest.raises(Exception, match="max_epochs"):
        epoch_materialize(df, t, ["g"], "doc_id", max_epochs=100).collect()
    assert epoch_materialize(df, t, ["g"], "doc_id",
                             max_epochs=250).count() == 500


def test_quantile_threshold_discrete_with_ties(spark):
    """Threshold = value at row ceil(q*n) of the sorted distribution;
    ties collapse into the distinct-score table but keep their counts."""
    from ncbi_analysis_spark.operators.scale import quantile_threshold

    vals = [1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 5.0, 5.0, 10.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               ["doc_id", "s"])
    # n=9, q=0.5 -> target ceil(4.5)=5 -> cum: 1:1, 2:3, 3:4, 4:5 -> 4.0
    assert quantile_threshold(df, "s", 0.5).first()["threshold"] == 4.0
    # q=1.0 -> target 9 -> the max
    assert quantile_threshold(df, "s", 1.0).first()["threshold"] == 10.0
    # layout invariance
    assert quantile_threshold(df.repartition(5), "s", 0.5).first()[
        "threshold"] == 4.0
    import pytest
    with pytest.raises(ValueError, match="q must be"):
        quantile_threshold(df, "s", 0.0)


def test_filter_by_quantile_partitions_corpus(spark):
    """at_or_above and below are complementary: together they cover the
    corpus exactly once, and every survivor of the gate scores >= every
    reject."""
    from ncbi_analysis_spark.operators.scale import filter_by_quantile

    vals = [float(v) for v in (3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               ["doc_id", "s"])
    top = filter_by_quantile(df, "s", 0.6).collect()
    bot = filter_by_quantile(df, "s", 0.6, keep="below").collect()
    assert len(top) + len(bot) == len(vals)
    assert {r["doc_id"] for r in top}.isdisjoint({r["doc_id"] for r in bot})
    assert min(r["s"] for r in top) >= max(r["s"] for r in bot)
    import pytest
    with pytest.raises(ValueError, match="keep must be"):
        filter_by_quantile(df, "s", 0.6, keep="top")


def test_quantile_threshold_max_distinct_guard(spark):
    """An unrounded continuous score must fail fast, not silently
    serialize a corpus-sized distinct table through the cumulative
    window."""
    import pytest

    from ncbi_analysis_spark.operators.scale import quantile_threshold

    df = spark.createDataFrame([(i, i * 0.001) for i in range(50)],
                               ["doc_id", "s"])
    with pytest.raises(Exception, match="max_distinct"):
        quantile_threshold(df, "s", 0.5, max_distinct=10).collect()
    assert quantile_threshold(df, "s", 0.5, max_distinct=50).count() == 1


def test_filter_by_quantile_on_overflow_approx_switch(spark):
    """on_overflow='approx': over the cap the gate degrades to the
    percentile_approx twin (and still returns a sane partition of the
    corpus) instead of raising; under the cap it stays oracle-exact
    and emits the approx_threshold_used=0 marker."""
    import pytest

    from ncbi_analysis_spark.operators.scale import filter_by_quantile

    cont = spark.createDataFrame([(i, i * 0.001) for i in range(200)],
                                 ["doc_id", "s"])
    # default mode raises on overflow (unchanged contract)
    with pytest.raises(Exception, match="max_distinct"):
        filter_by_quantile(cont, "s", 0.5, max_distinct=10).collect()
    # approx mode degrades: no raise, and the kept set is ~top half
    top = filter_by_quantile(cont, "s", 0.5, max_distinct=10,
                             on_overflow="approx").collect()
    assert 80 <= len(top) <= 120
    assert all(r["s"] >= 0.08 for r in top)
    # under the cap the approx mode takes the exact path: identical
    # result to the default mode, ties at the threshold all survive
    disc = spark.createDataFrame(
        [(i, float(i % 5)) for i in range(50)], ["doc_id", "s"])
    exact = {r["doc_id"] for r in filter_by_quantile(disc, "s", 0.6).collect()}
    auto = {r["doc_id"] for r in filter_by_quantile(
        disc, "s", 0.6, on_overflow="approx").collect()}
    assert auto == exact
    # grouped form degrades per the largest group's cardinality
    g = cont.withColumn("g", (F.col("doc_id") % 2).cast("int"))
    gtop = filter_by_quantile(g, "s", 0.5, max_distinct=10,
                              group_cols=["g"], on_overflow="approx").collect()
    assert 80 <= len(gtop) <= 120
    with pytest.raises(ValueError, match="on_overflow"):
        filter_by_quantile(cont, "s", 0.5, on_overflow="maybe")


def test_group_quantile_thresholds_per_group_and_nulls(spark):
    """Per-group thresholds are each group's own discrete quantile;
    NULL scores are excluded from the distribution (Spark orders NULLs
    first, DuckDB last — letting them in would shift thresholds
    differently per engine) and NULL-score rows never survive the
    gate."""
    from ncbi_analysis_spark.operators.scale import (
        filter_by_quantile,
        group_quantile_thresholds,
        quantile_threshold,
    )

    rows = (
        [("a", i, float(v)) for i, v in enumerate([1, 2, 3, 4])]
        + [("b", 10 + i, float(v)) for i, v in enumerate([10, 20, 30, 40])]
        + [("a", 99, None), ("b", 98, None)]
    )
    df = spark.createDataFrame(rows, "g string, doc_id long, s double")
    thr = {r["g"]: r["threshold"]
           for r in group_quantile_thresholds(df, "s", 0.5, ["g"]).collect()}
    # per group: n=4 (NULL excluded), target ceil(2.0)=2 -> 2nd smallest
    assert thr == {"a": 2.0, "b": 20.0}
    out = filter_by_quantile(df, "s", 0.5, group_cols=["g"]).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 2, 3, 11, 12, 13]  # NULL-score rows dropped
    # corpus-wide form also excludes NULLs: n=8, target 4 -> 4.0
    assert quantile_threshold(df, "s", 0.5).first()["threshold"] == 4.0
    import pytest
    with pytest.raises(ValueError, match="group_cols is empty"):
        group_quantile_thresholds(df, "s", 0.5, [])


def test_curriculum_shards_value_based_and_deterministic(spark):
    """Shards ascend with score, tied scores land together, pos is a
    contiguous 1..N_shard numbering in md5 order, and the whole layout
    is partition-layout invariant."""
    from ncbi_analysis_spark.operators.scale import curriculum_shards

    rows = [(i, float((i * 37) % 10)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    out = curriculum_shards(df, "s", "doc_id", 4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append((r["s"], r["pos"]))
    assert sorted(by_shard) == [1, 2, 3, 4]
    # value-based: shard score ranges are disjoint and ascending
    ranges = [(min(s for s, _ in v), max(s for s, _ in v))
              for _, v in sorted(by_shard.items())]
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # tied scores in one shard
    shard_of = {}
    for r in out:
        shard_of.setdefault(r["s"], set()).add(r["shard"])
    assert all(len(v) == 1 for v in shard_of.values())
    # contiguous pos per shard
    for v in by_shard.values():
        assert sorted(p for _, p in v) == list(range(1, len(v) + 1))
    # layout invariance
    again = curriculum_shards(df.repartition(7), "s", "doc_id", 4).collect()
    assert sorted((r["doc_id"], r["shard"], r["pos"]) for r in out) == \
        sorted((r["doc_id"], r["shard"], r["pos"]) for r in again)
    import pytest
    with pytest.raises(ValueError, match="n_shards"):
        curriculum_shards(df, "s", "doc_id", 0)


def test_quantile_threshold_approx_tracks_exact(spark):
    """The sketch twin lands within a tight rank neighborhood of the
    exact discrete threshold on a continuous (unrounded) score — the
    production path the exact form's max_distinct guard points at."""
    from ncbi_analysis_spark.operators.scale import (
        quantile_threshold,
        quantile_threshold_approx,
    )

    rows = [(i, ((i * 2654435761) % 100_000) / 100_000.0)
            for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    exact = quantile_threshold(df, "s", 0.9, max_distinct=10_000).first()[
        "threshold"]
    approx = quantile_threshold_approx(df, "s", 0.9).first()["threshold"]
    # rank error bounded by n/accuracy = 0.5 ranks -> value gap tiny
    assert abs(approx - exact) < 0.01
    # per-group form
    df2 = df.withColumn("g", (df.doc_id % 2).cast("string"))
    got = quantile_threshold_approx(df2, "s", 0.9, group_cols=["g"]).collect()
    assert len(got) == 2 and all(0.8 < r["threshold"] <= 1.0 for r in got)
    import pytest
    with pytest.raises(ValueError, match="q must be"):
        quantile_threshold_approx(df, "s", 1.5)


def test_epoch_materialize_duplicate_target_guard(spark):
    """Duplicate group keys in the target table must fail loudly — a
    silent join multiplication would inflate every group's output."""
    import pytest

    from ncbi_analysis_spark.operators.scale import epoch_materialize

    df = spark.createDataFrame([("a", 1), ("a", 2)], ["g", "doc_id"])
    dup = spark.createDataFrame([("a", 3), ("a", 4)], ["g", "quota"])
    with pytest.raises(Exception, match="duplicate target"):
        epoch_materialize(df, dup, ["g"], "doc_id").collect()
    ok = spark.createDataFrame([("a", 3)], ["g", "quota"])
    assert epoch_materialize(df, ok, ["g"], "doc_id").count() == 3


# --- priority sampling (weighted-without-replacement) -----------------


def _wdocs(spark, n=400):
    # weights 1..n: heavy tail ids get big weights
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id long, w long")


def test_priority_sample_shape_and_determinism(spark):
    import pytest as _pytest

    d = _wdocs(spark)
    s1 = scale.priority_sample(d, "w", 40, "id").collect()
    s2 = scale.priority_sample(d.repartition(7), "w", 40, "id").collect()
    assert len(s1) == 40
    key = lambda rows: sorted((r["id"], r["est_weight"], r["tau"])
                              for r in rows)
    assert key(s1) == key(s2)  # layout-independent, rerun-stable
    # different salt -> (almost surely) different sample
    s3 = scale.priority_sample(d, "w", 40, "id", salt="other").collect()
    assert {r["id"] for r in s3} != {r["id"] for r in s1}
    with _pytest.raises(ValueError, match="k=0"):
        scale.priority_sample(d, "w", 0, "id")


def test_priority_sample_favors_heavy_weights(spark):
    # inclusion probability ~ min(1, w/tau): the heaviest decile must
    # be overrepresented vs the lightest
    d = _wdocs(spark, 500)
    ids = {r["id"] for r in scale.priority_sample(d, "w", 100, "id").collect()}
    heavy = sum(1 for i in ids if i >= 450)
    light = sum(1 for i in ids if i < 50)
    # inclusion ~ w/tau with tau ~ W/k ~ 1250: heaviest decile ~0.37
    # each (expect ~18), lightest ~0.02 (expect ~1)
    assert heavy > light
    assert heavy >= 10


def test_priority_sample_ht_estimator_unbiased(spark):
    # mean of the Horvitz-Thompson total over many independent salts
    # approaches the true total (Duffield-Lund-Thorup unbiasedness)
    d = _wdocs(spark, 300)
    true_total = sum(i + 1 for i in range(300))
    rel = []
    for i in range(20):
        rows = scale.priority_sample(d, "w", 60, "id", salt=f"t{i}").collect()
        rel.append(sum(r["est_weight"] for r in rows) / true_total - 1.0)
    mean_bias = sum(rel) / len(rel)
    assert abs(mean_bias) < 0.08, mean_bias


def test_priority_sample_small_group_exact(spark):
    # groups with <= k rows: everything kept, tau = 0, est_weight = w
    d = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)],
        "id long, g string, w long")
    rows = scale.priority_sample(
        d, "w", 5, "id", group_by=["g"]).collect()
    assert len(rows) == 3
    assert all(r["tau"] == 0.0 and r["est_weight"] == float(r["w"])
               for r in rows)


def test_priority_sample_grouped_k_per_group(spark):
    d = spark.createDataFrame(
        [(i, "g%d" % (i % 3), 1 + i % 7) for i in range(120)],
        "id long, g string, w long")
    out = scale.priority_sample(d, "w", 8, "id", group_by=["g"])
    cnt = {r["g"]: r["n"] for r in
           out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert cnt == {"g0": 8, "g1": 8, "g2": 8}
    # tau is constant within a group and > 0 (every group saturated)
    taus = {r["g"]: set() for r in out.collect()}
    for r in out.collect():
        taus[r["g"]].add(r["tau"])
    assert all(len(v) == 1 and v.pop() > 0 for v in taus.values())


def test_priority_sample_null_and_nonpositive_weights(spark):
    import pytest as _pytest

    d = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "id long, w long")
    rows = scale.priority_sample(d, "w", 10, "id").collect()
    assert {r["id"] for r in rows} == {1, 3}  # NULL weight excluded
    bad = spark.createDataFrame([(1, 0)], "id long, w long")
    with _pytest.raises(Exception, match="non-positive weight"):
        scale.priority_sample(bad, "w", 2, "id").collect()


def test_key_skew_report_exact_math(spark):
    """Exact counts, integer-ppm share, ceil salt factor, heaviest-first
    with key-asc tiebreak, top_n bound, target validation."""
    import pytest as _pytest

    from ncbi_analysis_spark.operators.scale import key_skew_report

    rows = ([("hot", i) for i in range(70)]
            + [("warm", i) for i in range(25)]
            + [("a_cold", 0), ("b_cold", 0), ("c_cold", 0),
               ("d_cold", 0), ("e_cold", 0)])
    df = spark.createDataFrame(rows, "k string, v long")
    got = [r.asDict() for r in
           key_skew_report(df, ["k"], top_n=3,
                           target_rows_per_task=30).collect()]
    assert got == [
        # 70/100 -> 700000 ppm; ceil(70/30) = 3
        {"k": "hot", "n_rows": 70, "share_ppm": 700000,
         "recommended_salt": 3},
        {"k": "warm", "n_rows": 25, "share_ppm": 250000,
         "recommended_salt": 1},
        # 1-row keys tie -> key-asc picks a_cold
        {"k": "a_cold", "n_rows": 1, "share_ppm": 10000,
         "recommended_salt": 1},
    ]
    with _pytest.raises(ValueError, match="target_rows_per_task"):
        key_skew_report(df, ["k"], target_rows_per_task=0)
