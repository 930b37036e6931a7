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
