"""Physical-plan regression guards: pushdown, broadcast, and
partitioning-reuse properties the 100 TB design depends on
(SCALING.md "Plan audit"). These assert on the executed plan string so
an innocent-looking refactor can't silently reintroduce a full scan,
a lost broadcast, or an extra exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from ncbi_analysis_spark.plans import driver_queries as dq

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = dq.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushes_date_filter_to_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q3_broadcasts_dimensions(spark):
    plan = _plan(spark, "q3_top_revenue")
    assert plan.count("BroadcastExchange") >= 2


def test_decon_single_corpus_scan(spark):
    plan = _plan(spark, "decon_ngram_overlap")
    # one corpus scan + one benchmark scan; benchmark grams broadcast
    assert plan.count("FileScan") == 2
    assert "BroadcastExchange" in plan


def test_decon_agg_reuses_shingle_partitioning(spark):
    # the distinct + count aggregation stack on the shingle window's
    # doc_id exchange: exactly one hashpartitioning(doc_id) per scan side
    plan = _plan(spark, "decon_ngram_overlap")
    assert plan.count("Exchange hashpartitioning(doc_id") == 2


def test_split_sample_is_map_only(spark):
    from ncbi_analysis_spark.operators.scale import sample_by_hash

    df = sample_by_hash(dq._t(spark, SF, "documents"), "doc_id", 0.5)
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()


def test_scan_column_pruning(spark):
    # projecting two columns must not read the wide table
    df = dq._t(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [line for line in plan.splitlines() if "FileScan" in line][0]
    assert "l_orderkey" in scan and "l_comment" not in scan


def test_q5_dimension_broadcasts(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    # region/nation/supplier (at least) must broadcast, never SMJ at this SF
    assert plan.count("BroadcastExchange") >= 3


def test_lsh_pairs_single_signature_scan(spark):
    """Round-2 fix: the banded pair generators must compute their
    signature pipeline ONCE (bucket-explode), not twice via an aliased
    self-join — one FileScan of the corpus in each physical plan."""
    from ncbi_analysis_spark.operators import dedup

    d = dq._t(spark, SF, "documents")
    for build in (
        lambda: dedup.minhash_lsh_pairs(d, "text", "doc_id", num_perm=8, bands=4),
        lambda: dedup.simhash_pairs(d, "text", "doc_id"),
        lambda: dedup.char_window_dup_pairs(d, "text", "doc_id", window=32,
                                            max_window_freq=50),
    ):
        plan = build()._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan") == 1, plan[:2000]


def test_ivf_assignment_is_map_side(spark):
    """Round-2 fix: nearest-centroid assignment must be a pure projection
    (broadcast centroid literal + argmax), not a cross join + window —
    i.e. NO exchange partitioned by the corpus id anywhere, and the
    bucket join must broadcast the probe side."""
    plan = _plan(spark, "ann_ivf")
    assert "Exchange hashpartitioning(vec_id" not in plan
    assert "Exchange hashpartitioning(__cv" not in plan
    assert "BroadcastExchange" in plan


def test_flagship_scan_plan_shape(spark):
    plan = _plan(spark, "flagship_similarity_scan")
    # query genes broadcast into the chunk cross join; exactly one Python
    # stage (the Arrow-batched scorer); chunks spread by an explicit
    # NUMERIC round-robin (AQE byte-coalescing must not apply — chunk
    # bytes say nothing about chunk scoring cost)
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("MapInPandas") == 1
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan


def test_flagship_scorer_input_actually_spreads(spark):
    """Runtime guard for the AQE funnel: with >= 8 chunks on a 1-row
    genome, the scorer-input repartition must land chunks in MULTIPLE
    tasks at execution time (byte-based AQE coalescing once funneled all
    chunks into ONE task, serializing the whole Python scoring stage)."""
    from pyspark.sql import functions as F

    from ncbi_analysis_spark.plans.similarity_scan import chunk_genome

    g = spark.createDataFrame([("acc", "acgt" * 4096)], ["accession", "seq"])
    n = spark.sparkContext.defaultParallelism
    chunks = chunk_genome(g, 1024, 11, halo=4).repartition(max(n, 1))
    pids = chunks.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    n_chunks = sum(r["count"] for r in pids)
    assert n_chunks >= 8
    assert len(pids) >= min(n_chunks, n) // 2  # spread, not funneled


def test_binned_interval_join_is_hash_join(spark):
    """The big x big overlap join must plan as an equi-join on the bin id
    (SortMergeJoin/ShuffledHashJoin with the range predicate residual),
    never a BroadcastNestedLoopJoin — at 100 TB a nested-loop overlap
    join is quadratic."""
    from ncbi_analysis_spark.operators.intervals import interval_join_binned

    left = dq._t(spark, SF, "lineitem").select(
        F.col("l_orderkey"), (F.col("l_partkey") * 10).alias("ls"),
        (F.col("l_partkey") * 10 + 100).alias("le"))
    right = dq._t(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("rid"), (F.col("l_partkey") * 10).alias("rs"),
        (F.col("l_partkey") * 10 + 50).alias("re"))
    # force the big x big regime: no auto-broadcast at this tiny SF
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = interval_join_binned(
            left, right, "ls", "le", "rs", "re", bin_size=1000,
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan[:2000]


def test_bounded_locate_guard(spark):
    """bounded=True is the <=4.5k-row parity mode; past broadcast size it
    must fail fast, not silently degrade."""
    import pytest as _pytest

    from ncbi_analysis_spark.plans.location import locate_matches

    matches = spark.createDataFrame(
        [(1, 10, 20)], "match_id long, start long, end long")
    recs = spark.range(0, 50).select(
        F.concat(F.lit("g"), F.col("id")).alias("name"),
        F.lit(">").alias("direction"),
        (F.col("id") * 100).alias("left"),
        (F.col("id") * 100 + 80).alias("right"),
        (F.col("id") * 100).alias("start"),
    )
    with _pytest.raises(ValueError, match="max_bounded_records"):
        locate_matches(matches, recs, bounded=True, max_bounded_records=10)
    # under the cap it still works
    out = locate_matches(matches, recs, bounded=True, max_bounded_records=1000)
    assert out.count() >= 1


def _locate_inputs(spark, n_acc=4, genes_per_acc=30, matches_per_acc=20):
    accs = F.concat(F.lit("NC_"), (F.col("id") % n_acc).cast("string"))
    recs = spark.range(0, n_acc * genes_per_acc).select(
        accs.alias("accession"),
        F.concat(F.lit("g"), F.col("id")).alias("name"),
        F.when(F.col("id") % 2 == 0, ">").otherwise("<").alias("direction"),
        ((F.col("id") / n_acc).cast("long") * 300 + 50).alias("left"),
        ((F.col("id") / n_acc).cast("long") * 300 + 250).alias("right"),
        ((F.col("id") / n_acc).cast("long") * 300 + 50).alias("start"),
    )
    matches = spark.range(0, n_acc * matches_per_acc).select(
        accs.alias("accession"),
        F.col("id").alias("match_id"),
        ((F.col("id") / n_acc).cast("long") * 137 + 10).alias("start"),
        ((F.col("id") / n_acc).cast("long") * 137 + 90).alias("end"),
    )
    return matches, recs


def test_locate_matches_keyed_is_distributed(spark):
    """VERDICT r02 'What's wrong #1': the unbounded mode used to key its
    nearest-gene as-of windows on a constant — every match in ONE window
    partition. With on=["accession"] the physical plan must contain no
    single-partition Exchange anywhere."""
    from ncbi_analysis_spark.plans.location import locate_matches

    matches, recs = _locate_inputs(spark)
    out = locate_matches(matches, recs, on=["accession"], annotation_mode="broadcast")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no constant-key exchange (hashpartitioning on the __all literal
    # routes every row to one partition) and no SinglePartition exchange
    assert "Exchange SinglePartition" not in plan, plan[:3000]
    assert "hashpartitioning(__all" not in plan, plan[:3000]
    assert "hashpartitioning(accession" in plan
    # the legacy keyless form DOES carry the degenerate constant-key
    # exchange (documented small-data fallback) — contrast guards that
    # the assertions above are meaningful
    legacy = locate_matches(
        matches.drop("accession"), recs.drop("accession"),
        annotation_mode="broadcast",
    )
    legacy_plan = legacy._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__all" in legacy_plan


def test_locate_matches_binned_annotation_join(spark):
    """annotation_mode='binned' (big annotation table) must plan the
    overlap join as a hash equi-join on (accession, bin) — never a
    BroadcastNestedLoopJoin."""
    from ncbi_analysis_spark.plans.location import locate_matches

    matches, recs = _locate_inputs(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = locate_matches(
            matches, recs, on=["accession"], annotation_mode="binned", bin_size=500
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        rows_binned = sorted(
            (r["match_id"], r["rec_name"], r["label"]) for r in out.collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    # and the binned join returns exactly what the broadcast mode returns
    ref = locate_matches(matches, recs, on=["accession"], annotation_mode="broadcast")
    rows_bcast = sorted(
        (r["match_id"], r["rec_name"], r["label"]) for r in ref.collect()
    )
    assert rows_binned == rows_bcast


def test_windowed_chunk_assembly_one_data_shuffle(spark):
    """chunk_genome_from_windows (r6): the per-accession totals must
    BROADCAST into the window rows and the only data-sized exchange is
    the chunk regroup — no sort-merge join of windows against totals,
    no extra exchange between the explode and the regroup."""
    from ncbi_analysis_spark.plans.similarity_scan import (
        chunk_genome_from_windows,
        split_genome_windows,
    )

    g = spark.createDataFrame([("a", "acgt" * 600)], ["accession", "seq"])
    w = split_genome_windows(g, 128)
    plan = chunk_genome_from_windows(w, 256, 9, halo=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan  # totals join
    # regroup exchanges (one per strand branch of the union at most);
    # everything else is broadcast or the tiny totals aggregation
    regroups = plan.count("Exchange hashpartitioning(accession")
    assert regroups <= 3, plan[:1500]
    assert "ObjectHashAggregate" in plan  # map-side partial collect_list


def test_ngram_lm_model_broadcasts(spark):
    """ngram_lm_score (r6): the LM join must broadcast the model
    (alphabet^n rows), never shuffle the gram stream against it."""
    plan = _plan(spark, "ngram_lm_quality")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
