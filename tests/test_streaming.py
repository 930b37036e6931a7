"""Structured Streaming extension tests (availableNow over the driver
testdata parquet — runs the real streaming engine, bounded)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.sources.events import read_events
from ncbi_analysis_spark.streaming import events as sev

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    """File-stream sources need a directory; stage the events parquet."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    return str(d)


def test_windowed_counts_match_batch(spark, stream_dir):
    stream = sev.read_event_stream(spark, stream_dir)
    out = sev.windowed_event_counts(stream, window="1 hour", watermark="1 minute")
    # complete-mode comparison needs an aggregation sink; use availableNow
    # append with watermark: all windows close because the source is finite
    q = (
        out.writeStream.format("memory").queryName("win_counts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select event_type, sum(cnt) as n from win_counts group by event_type"
    ).collect()
    got = {r["event_type"]: r["n"] for r in got}

    batch = read_events(spark, SF_DIR)
    want_rows = batch.groupBy("event_type").count().collect()
    want = {r["event_type"]: r["count"] for r in want_rows}
    # append mode drops windows still open past the max event time; allow
    # the final window's worth of slack per type but require bulk parity
    assert set(got) == set(want)
    for k in want:
        assert got[k] <= want[k]
        assert got[k] >= want[k] * 0.8


def test_sessionize_stream(spark, stream_dir):
    stream = sev.read_event_stream(spark, stream_dir)
    sess = sev.sessionize(stream, gap="10 minutes", watermark="1 minute")
    q = (
        sess.writeStream.format("memory").queryName("sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from sessions").collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1


def test_sessionize_stream_matches_batch(spark, stream_dir):
    """Stream/batch equivalence: every session the streaming sessionizer
    emits must exist identically in the batch sessionizer's output, and
    every batch session that the watermark provably closes must have
    been emitted. (The only legitimately missing sessions are each
    user's final one when the event-time timeout can't fire before the
    stream ends.)"""
    from ncbi_analysis_spark.operators.sessions import session_stats

    gap_us = 10 * 60 * 1_000_000
    wm_us = 60 * 1_000_000

    stream = sev.read_event_stream(spark, stream_dir)
    sess = sev.sessionize(stream, gap="10 minutes", watermark="1 minute")
    q = (
        sess.writeStream.format("memory").queryName("sess_parity")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["s"], r["e"], r["n_events"])
        for r in spark.sql(
            "select user_id, unix_micros(session_start) s, "
            "unix_micros(session_end) e, n_events from sess_parity"
        ).collect()
    }
    assert len(got) > 0

    batch = read_events(spark, SF_DIR).withColumn("ts_us", F.unix_micros("ts"))
    max_ts_us = batch.agg(F.max("ts_us")).collect()[0][0]
    stats = session_stats(batch, ["user_id"], "ts_us", gap_us)
    want_rows = stats.collect()
    want = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in want_rows}

    # 1. soundness: nothing emitted that batch doesn't agree with
    assert got <= want, f"streaming emitted non-batch sessions: {sorted(got - want)[:3]}"

    # 2. completeness: sessions the final watermark provably closes
    last_per_user = {}
    for r in want_rows:
        last_per_user[r["user_id"]] = max(
            last_per_user.get(r["user_id"], 0), r["session_no"])
    guaranteed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in want_rows
        if r["session_no"] < last_per_user[r["user_id"]]  # closed by a later event
        or r["session_end"] + gap_us < max_ts_us - wm_us  # closed by timeout
    }
    assert guaranteed <= got, f"missing guaranteed sessions: {sorted(guaranteed - got)[:3]}"


def test_stream_stream_join(spark, stream_dir):
    clicks = sev.read_event_stream(spark, stream_dir).filter(F.col("event_type") == "click")
    purchases = sev.read_event_stream(spark, stream_dir).filter(F.col("event_type") == "purchase")
    joined = sev.stream_stream_join(clicks, purchases, within="30 minutes")
    q = (
        joined.writeStream.format("memory").queryName("ss_join")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from ss_join").collect()
    assert len(rows) > 0
    for r in rows[:100]:
        assert r["click_ts"] <= r["purchase_ts"]
        delta = (r["purchase_ts"] - r["click_ts"]).total_seconds()
        assert 0 <= delta <= 1800


def test_suppress_local_max_stream_matches_batch(spark, stream_dir):
    """Streaming local-max suppression (W2's streaming twin) must agree
    with the batch RANGE-window operator: every emitted survivor is a
    batch survivor, and every batch survivor the final watermark provably
    decides must have been emitted."""
    from ncbi_analysis_spark.operators.suppression import local_max_suppress

    d_us = 5 * 60 * 1_000_000
    wm_us = 60 * 1_000_000

    stream = sev.read_event_stream(spark, stream_dir)
    sup = sev.suppress_local_max_stream(stream, distance="5 minutes",
                                        watermark="1 minute")
    q = (
        sup.writeStream.format("memory").queryName("w2_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {r["event_id"] for r in spark.sql("select * from w2_stream").collect()}
    assert len(got) > 0

    batch = read_events(spark, SF_DIR).withColumn("ts_us", F.unix_micros("ts"))
    max_ts_us = batch.agg(F.max("ts_us")).collect()[0][0]
    surv = local_max_suppress(batch, ["event_type"], "ts_us", "value", d_us)
    want = {(r["event_id"], r["ts_us"]) for r in surv.collect()}
    want_ids = {i for i, _ in want}

    assert got <= want_ids, f"stream emitted non-survivors: {sorted(got - want_ids)[:5]}"
    final_wm = max_ts_us - wm_us
    guaranteed = {i for i, t in want if t + d_us < final_wm}
    assert guaranteed <= got, f"missing decided survivors: {sorted(guaranteed - got)[:5]}"


def test_windowed_topk_stream_matches_batch(spark, stream_dir):
    """Streaming per-window top-k must agree with the batch window +
    row_number formulation on every window the final watermark closes,
    and emit nothing the batch form doesn't contain."""
    stream = sev.read_event_stream(spark, stream_dir)
    out = sev.windowed_topk_stream(stream, window="30 minutes", k=3,
                                   watermark="1 minute")
    q = (
        out.writeStream.format("memory").queryName("w1_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_type"], r["s"], r["event_id"], r["rk"])
        for r in spark.sql(
            "select event_type, unix_micros(window_start) s, event_id, rk "
            "from w1_stream"
        ).collect()
    }
    assert len(got) > 0

    from pyspark.sql import Window

    win_us = 30 * 60 * 1_000_000
    batch = read_events(spark, SF_DIR).withColumn("ts_us", F.unix_micros("ts"))
    max_ts_us = batch.agg(F.max("ts_us")).collect()[0][0]
    w = Window.partitionBy("event_type", "ws").orderBy(
        F.desc("value"), F.asc("event_id"))
    want_rows = (
        batch.withColumn("ws", F.expr(f"ts_us div {win_us} * {win_us}"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "ws", "event_id", "rk")
        .collect()
    )
    want = {(r["event_type"], r["ws"], r["event_id"], r["rk"]) for r in want_rows}
    assert got <= want, f"stream emitted non-batch rows: {sorted(got - want)[:5]}"
    final_wm = max_ts_us - 60 * 1_000_000
    guaranteed = {x for x in want if x[1] + win_us <= final_wm}
    assert guaranteed <= got, f"missing closed windows: {sorted(guaranteed - got)[:5]}"


@pytest.mark.parametrize("layout", ["ntz_us", "ns"])
def test_event_ts_layouts_normalize(spark, tmp_path, layout):
    """Both physical ts layouts the driver has shipped (TIMESTAMP_NTZ
    micros — current — and TIMESTAMP nanos) must normalize to TIMESTAMP
    through the shared reader, batch AND streaming-with-watermark (round
    4 regression: the NTZ layout broke unix_micros and withWatermark)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    unit = {"ntz_us": "us", "ns": "ns"}[layout]
    scale = 1000 if unit == "ns" else 1
    us = [1_700_000_000_000_000, 1_700_000_060_000_000]
    tbl = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([t * scale for t in us], pa.timestamp(unit)),
        "user_id": pa.array([7, 7], pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
    })
    d = tmp_path / layout
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")

    batch = read_events(spark, str(d))
    assert dict(batch.dtypes)["ts"] == "timestamp"
    got = sorted(r[0] for r in batch.select(F.unix_micros("ts")).collect())
    assert got == us

    stream = sev.read_event_stream(spark, str(d))
    out = sev.windowed_event_counts(stream, window="1 minute", watermark="0 seconds")
    q = (
        out.writeStream.format("memory").queryName(f"layout_{layout}")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    n = spark.sql(f"select sum(cnt) c from layout_{layout}").collect()[0]["c"]
    assert n >= 1  # the first window closes; the last may stay open


def test_streaming_dedup_runs(spark, stream_dir):
    stream = sev.read_event_stream(spark, stream_dir)
    dd = sev.streaming_dedup(stream, ["event_id"])
    q = (
        dd.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    n = spark.sql("select count(*) c from dedup_out").collect()[0]["c"]
    assert n == 1000  # sf0.001 events are unique by event_id


def test_enrich_stream_matches_batch(spark, stream_dir):
    """Stream-static left enrichment over a bounded run equals the batch
    join; unmatched stream rows survive with NULL dim columns."""
    # fixture user_ids span 0..14; stop the dim at 8 so the left side
    # has genuinely unmatched rows to keep
    dim = spark.createDataFrame(
        [(u, f"user-{u}") for u in range(0, 8)], ["user_id", "uname"]
    )
    stream = sev.read_event_stream(spark, stream_dir)
    out = sev.enrich_stream(stream, dim, on="user_id", how="left")
    sev.run_to_memory(
        out.select("event_id", "user_id", "uname"), "t_enrich_stream"
    )
    got = {r["event_id"]: r["uname"] for r in spark.table("t_enrich_stream").collect()}
    batch = read_events(spark, f"{SF_DIR}/events.parquet").join(
        dim, "user_id", "left"
    )
    want = {r["event_id"]: r["uname"] for r in
            batch.select("event_id", "uname").collect()}
    assert got == want and len(got) > 0
    # user_ids 8..14 exist in the fixture -> the left side must show NULLs
    assert any(v is None for v in got.values())
    assert any(v is not None for v in got.values())


def test_enrich_stream_rejects_dim_side_outer(spark, stream_dir):
    dim = spark.createDataFrame([(1, "x")], ["user_id", "uname"])
    stream = sev.read_event_stream(spark, stream_dir)
    with pytest.raises(ValueError, match="inner/left"):
        sev.enrich_stream(stream, dim, on="user_id", how="full")


def test_stream_to_parquet_exactly_once_on_restart(spark, tmp_path):
    """The durable sink's checkpoint makes replays idempotent: a second
    bounded run over the SAME source and checkpoint commits nothing new,
    and new source files arriving between runs are picked up exactly
    once. Read-back equals the batch input throughout."""
    src = tmp_path / "src"; src.mkdir()
    out = str(tmp_path / "out"); ck = str(tmp_path / "ck")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")

    def run():
        stream = sev.read_event_stream(spark, str(src))
        sev.stream_to_parquet(
            stream.select("event_id", "user_id", "event_type"), out, ck)

    run()
    first = spark.read.parquet(out)
    assert first.count() == 1000
    # restart over the same source: no batch re-commits, count unchanged
    run()
    assert spark.read.parquet(out).count() == 1000
    # a new source file between restarts lands exactly once (a real
    # part-FILE at the top level — the file-stream source doesn't
    # recurse into df.write.parquet's directory layout)
    import glob as _glob
    stage = str(tmp_path / "stage2")
    df2 = read_events(spark, f"{SF_DIR}/events.parquet").withColumn(
        "event_id", F.col("event_id") + 1_000_000)
    df2.coalesce(1).write.parquet(stage)
    shutil.copy(_glob.glob(f"{stage}/part-*.parquet")[0], src / "b.parquet")
    run()
    got = spark.read.parquet(out)
    assert got.count() == 2000
    assert got.select("event_id").distinct().count() == 2000


def test_stream_to_parquet_partitioned_layout(spark, tmp_path):
    src = tmp_path / "s2"; src.mkdir()
    out = str(tmp_path / "o2"); ck = str(tmp_path / "c2")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")
    stream = sev.read_event_stream(spark, str(src))
    sev.stream_to_parquet(
        stream.select("event_id", "event_type"), out, ck,
        partition_by=["event_type"])
    import os as _os
    kinds = {d for d in _os.listdir(out) if d.startswith("event_type=")}
    assert len(kinds) >= 2  # hive-style partition dirs for pruning
    assert spark.read.parquet(out).count() == 1000


def test_enrich_stream_anti_join_incremental_dedup(spark, stream_dir):
    """left_anti against a static digest table = streaming incremental
    dedup: events whose id already exists in the ingested set are
    dropped in-flight; the bounded run equals the batch anti join."""
    ingested = spark.createDataFrame(
        [(i,) for i in range(0, 1000, 2)], ["event_id"])  # evens known
    stream = sev.read_event_stream(spark, stream_dir)
    out = sev.enrich_stream(stream.select("event_id", "user_id"),
                            ingested, on="event_id", how="left_anti")
    sev.run_to_memory(out, "t_anti_stream")
    got = {r["event_id"] for r in spark.table("t_anti_stream").collect()}
    want = {r["event_id"] for r in
            read_events(spark, f"{SF_DIR}/events.parquet")
            .join(ingested, "event_id", "left_anti").collect()}
    assert got == want and len(got) == 500
    assert all(i % 2 == 1 for i in got)


def test_fuzzy_decon_stream_matches_batch(spark, tmp_path):
    """The stateless expression-form band hashes must flag EXACTLY the
    documents the batch aggregate-form fuzzy_decon_pairs flags — the
    availableNow run is the batch operator's twin on both keep modes."""
    from ncbi_analysis_spark.operators.dedup import fuzzy_decon_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    bench = docs.filter("doc_id % 17 = 0") \
        .select(F.col("doc_id").alias("bench_id"), "text")
    want_flagged = {r["doc_id"] for r in
                    fuzzy_decon_pairs(docs, bench, "text", "doc_id",
                                      bench_id_col="bench_id").collect()}
    assert want_flagged, "fixture must produce at least one collision"

    src = tmp_path / "docs_src"; src.mkdir()
    import glob as _glob
    stage = str(tmp_path / "stage")
    docs.coalesce(1).write.parquet(stage)
    shutil.copy(_glob.glob(f"{stage}/part-*.parquet")[0], src / "a.parquet")
    stream = spark.readStream.schema(docs.schema).parquet(str(src))

    flagged = sev.fuzzy_decon_stream(stream, bench, "text", keep="flagged")
    sev.run_to_memory(flagged, "t_decon_flagged")
    got_flagged = {r["doc_id"] for r in spark.table("t_decon_flagged").collect()}
    assert got_flagged == want_flagged

    clean = sev.fuzzy_decon_stream(stream, bench, "text")
    sev.run_to_memory(clean, "t_decon_clean")
    got_clean = {r["doc_id"] for r in spark.table("t_decon_clean").collect()}
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert got_clean == all_ids - want_flagged


def test_fuzzy_decon_stream_guards(spark, tmp_path):
    docs = spark.createDataFrame([(0, "a b c d")], "bench_id long, text string")
    empty = tmp_path / "empty_src"; empty.mkdir()
    stream = spark.readStream.schema("doc_id long, text string") \
        .parquet(str(empty))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="keep"):
        sev.fuzzy_decon_stream(stream, docs, "text", keep="bogus")
    with _pytest.raises(ValueError, match="max_bench_bands"):
        sev.fuzzy_decon_stream(stream, docs, "text", max_bench_bands=3)


def test_quality_score_stream_matches_batch(spark, tmp_path):
    """The per-row expression scorer must agree with the batch
    aggregate scorer on every document (same n_feats exactly; probs to
    float-sum rounding), and NULL text scores NULL instead of dropping
    the row."""
    from ncbi_analysis_spark.operators.terms import (
        quality_classifier_weights,
        quality_probability,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text", "lang")
    params = dict(n_buckets=256, ngram_max=2)
    w, bias = quality_classifier_weights(
        docs.filter("lang = 'en'"), docs.filter("lang != 'en'"),
        "text", "doc_id", **params)
    want = {r["doc_id"]: (r["n_feats"], r["prob"]) for r in
            quality_probability(docs, "text", "doc_id", w, bias,
                                **params).collect()}

    src = tmp_path / "q_src"; src.mkdir()
    import glob as _glob
    stage = str(tmp_path / "q_stage")
    base = docs.select("doc_id", "text")
    extra = spark.createDataFrame([(999999, None)], "doc_id long, text string")
    base.unionByName(extra).coalesce(1).write.parquet(stage)
    shutil.copy(_glob.glob(f"{stage}/part-*.parquet")[0], src / "a.parquet")
    stream = spark.readStream.schema("doc_id long, text string") \
        .parquet(str(src))
    out = sev.quality_score_stream(stream, w, bias, "text", **params)
    sev.run_to_memory(out.select("doc_id", "n_feats", "prob"), "t_qscore")
    got = {r["doc_id"]: (r["n_feats"], r["prob"]) for r in
           spark.table("t_qscore").collect()}
    assert got.pop(999999) == (None, None)  # NULL text -> NULL, row kept
    assert set(got) == set(want)
    for k, (nf, p) in want.items():
        assert got[k][0] == nf, k
        assert abs(got[k][1] - p) <= 1e-6, (k, got[k][1], p)
    # rounded-to-6 equality should hold for the overwhelming majority
    same = sum(1 for k in want if got[k][1] == want[k][1])
    assert same >= 0.99 * len(want)


def test_chunk_documents_is_stream_transparent(spark, tmp_path):
    """chunk_documents is a stateless map-only explode, so applying it
    UNCHANGED to a streaming frame must produce exactly the batch
    output — the property that lets any stateless corpus operator run
    at ingest without a streaming twin."""
    from ncbi_analysis_spark.operators.packing import chunk_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").filter("doc_id < 120")
    want = {(r["doc_id"], r["chunk_no"], r["chunk_text"], r["n_tokens"])
            for r in chunk_documents(docs, "text", "doc_id",
                                     max_tokens=32, stride=32).collect()}

    src = tmp_path / "chunk_src"; src.mkdir()
    import glob as _glob
    stage = str(tmp_path / "chunk_stage")
    docs.coalesce(1).write.parquet(stage)
    shutil.copy(_glob.glob(f"{stage}/part-*.parquet")[0], src / "a.parquet")
    stream = spark.readStream.schema(docs.schema).parquet(str(src))

    out = chunk_documents(stream, "text", "doc_id", max_tokens=32, stride=32)
    assert out.isStreaming
    sev.run_to_memory(out, "t_stream_chunks")
    got = {(r["doc_id"], r["chunk_no"], r["chunk_text"], r["n_tokens"])
           for r in spark.table("t_stream_chunks").collect()}
    assert got == want and len(got) > len({g[0] for g in got})


def _curation_fixtures(spark):
    """Shared batch-side model fit for the streaming-curation tests:
    %7 bench split, English-vs-rest classifier on the full table."""
    from ncbi_analysis_spark.operators.terms import quality_classifier_weights

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("bench_id"), "text")
    w, bias = quality_classifier_weights(
        d.filter(F.col("lang") == "en"), d.filter(F.col("lang") != "en"),
        "text", "doc_id", n_buckets=1024, ngram_max=2)
    return d, corpus, bench, w, bias


def test_curation_stream_matches_batch_prefix(spark, tmp_path):
    """The composed streaming curation equals curation_v3's
    decon+quality prefix run in batch: same surviving doc_ids, probs
    agreeing to float-sum reordering (the documented 1e-12-relative
    stream-vs-batch fold difference)."""
    from ncbi_analysis_spark.operators.dedup import fuzzy_decon_pairs
    from ncbi_analysis_spark.operators.terms import quality_probability

    d, corpus, bench, w, bias = _curation_fixtures(spark)

    # batch prefix: anti-join the flagged set, score, gate at 0.5
    flagged = fuzzy_decon_pairs(
        corpus, bench, "text", "doc_id", bench_id_col="bench_id",
        num_perm=4, bands=2).select("doc_id").distinct()
    clean = corpus.join(flagged, "doc_id", "left_anti")
    scored = quality_probability(clean, "text", "doc_id", w, bias,
                                 n_buckets=1024, ngram_max=2)
    # sf0.001 probs span ~[0.34, 0.39]; gate inside the range so the
    # parity assertion is non-vacuous (both kept and dropped rows exist)
    batch = {r["doc_id"]: r["prob"]
             for r in scored.filter(F.col("prob") >= 0.36).collect()}
    n_clean = clean.count()
    assert 0 < len(batch) < n_clean

    # streaming: same corpus through the file source
    src = tmp_path / "cur_src"; src.mkdir()
    stage = str(tmp_path / "cur_stage")
    corpus.repartition(4).write.parquet(stage)
    import glob as _glob
    for i, p in enumerate(sorted(_glob.glob(f"{stage}/part-*.parquet"))):
        shutil.copy(p, src / f"docs{i}.parquet")
    stream = spark.readStream.schema(corpus.schema).parquet(str(src))
    out = sev.curation_stream(stream, bench, w, bias, min_prob=0.36,
                              num_perm=4, bands=2)
    sev.run_to_memory(out.select("doc_id", "prob"), "cur_parity")
    got = {r["doc_id"]: r["prob"]
           for r in spark.table("cur_parity").collect()}

    assert set(got) == set(batch)
    for k, v in got.items():
        assert abs(v - batch[k]) < 1e-6, (k, v, batch[k])


def test_run_curation_job_exactly_once_on_restart(spark, tmp_path):
    """The durable composed job is restart-idempotent: re-running over
    the same source+checkpoint commits nothing; a file arriving between
    runs is curated exactly once; read-back stays gated (prob >= 0.5)
    and decontaminated throughout."""
    from ncbi_analysis_spark.operators.dedup import fuzzy_decon_pairs

    d, corpus, bench, w, bias = _curation_fixtures(spark)
    half_a = corpus.filter(F.col("doc_id") % 2 == 0)
    half_b = corpus.filter(F.col("doc_id") % 2 == 1)

    src = tmp_path / "job_src"; src.mkdir()
    out = str(tmp_path / "job_out"); ck = str(tmp_path / "job_ck")
    import glob as _glob

    def stage_in(df, name):
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(stage)
        shutil.copy(_glob.glob(f"{stage}/part-*.parquet")[0],
                    src / f"{name}.parquet")

    stage_in(half_a, "a")

    def run():
        sev.run_curation_job(
            spark, str(src), corpus.schema, bench, w, bias, out, ck,
            min_prob=0.36, num_perm=4, bands=2)

    run()
    first = spark.read.parquet(out)
    n1 = first.count()
    assert n1 > 0
    assert first.agg(F.min("prob")).first()[0] >= 0.36
    # restart over the same source: nothing re-commits
    run()
    assert spark.read.parquet(out).count() == n1
    # new arrivals curated exactly once
    stage_in(half_b, "b")
    run()
    got = spark.read.parquet(out)
    assert got.select("doc_id").distinct().count() == got.count()
    # every surviving doc is clean: no overlap with the flagged set
    flagged = fuzzy_decon_pairs(
        corpus, bench, "text", "doc_id", bench_id_col="bench_id",
        num_perm=4, bands=2).select("doc_id").distinct()
    assert got.join(flagged, "doc_id", "inner").count() == 0


def test_stream_gate_np_twins_match_expr(spark, tmp_path):
    """engine='np' must keep the IDENTICAL row set through the fuzzy
    decon gate (md5 band keys are bit-equal across forms) and score
    with exact n_feats and 6dp-equal probabilities (the single
    divergence risk is the last ulp of libm-vs-JVM exp in the sigmoid,
    which 6dp rounding absorbs; the expression form stays the oracle
    default). NULL text must survive scoring as NULL in both forms."""
    from ncbi_analysis_spark.operators.terms import quality_classifier_weights

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text", "lang")
    with_null = docs.select(
        "doc_id", F.when(F.col("doc_id") % 97 == 0, F.lit(None))
        .otherwise(F.col("text")).alias("text"))
    bench = docs.filter("doc_id % 17 = 0") \
        .select(F.col("doc_id").alias("bench_id"), "text")
    w, bias = quality_classifier_weights(
        docs.filter("lang = 'en'"), docs.filter("lang != 'en'"),
        "text", "doc_id", n_buckets=256, ngram_max=2)

    src = tmp_path / "src"; src.mkdir()
    import glob as _glob
    stage = str(tmp_path / "stage")
    with_null.coalesce(1).write.parquet(stage)
    shutil.copy(_glob.glob(f"{stage}/part-*.parquet")[0], src / "a.parquet")
    stream = spark.readStream.schema(with_null.schema).parquet(str(src))

    def run(engine, name):
        # curation_stream's min_prob gate would drop NULL probs, so
        # compare the decon+scored stream BEFORE the gate
        out = sev.quality_score_stream(
            sev.fuzzy_decon_stream(stream, bench, "text", num_perm=4,
                                   bands=2, engine=engine),
            w, bias, n_buckets=256, ngram_max=2, engine=engine)
        sev.run_to_memory(out, name)
        return {r["doc_id"]: (r["n_feats"], r["prob"])
                for r in spark.table(name).collect()}

    expr = run("expr", "t_np_twin_expr")
    npv = run("np", "t_np_twin_np")
    assert set(expr) == set(npv)          # identical decon row sets
    assert expr.keys() and any(v[0] is None for v in expr.values())
    for k in expr:
        assert expr[k][0] == npv[k][0], (k, "n_feats")
        a, b = expr[k][1], npv[k][1]
        assert (a is None) == (b is None)
        if a is not None:
            assert abs(a - b) < 5e-7, (k, a, b)   # 6dp-rounded parity
    # 'hybrid' (the r15 default: np md5/fold + JVM sigmoid) must be
    # BIT-identical to expr — it is what the oracled stream_* queries
    # now run, so exact equality (not ulp-tolerance) is the contract
    hyb = run("hybrid", "t_np_twin_hybrid")
    assert hyb == expr


def test_resolve_gate_engine_routing(spark, tmp_path):
    """'auto' must route streaming inputs to the Arrow hybrid replica
    (a stream is unbounded; the expr HOF gates are CodegenFallback),
    keep small batch inputs on the all-JVM expr plan (no Python-worker
    round-trip for tiny inputs), flip large batch inputs to hybrid past
    the bounded probe, and leave explicit choices untouched."""
    small = spark.range(10).withColumnRenamed("id", "doc_id")
    big = spark.range(2000).withColumnRenamed("id", "doc_id")

    src = tmp_path / "resolve_src"
    small.write.parquet(str(src))
    stream = spark.readStream.schema(small.schema).parquet(str(src))

    assert sev._resolve_gate_engine(stream, "auto") == "hybrid"
    assert sev._resolve_gate_engine(small, "auto") == "expr"
    assert sev._resolve_gate_engine(big, "auto") == "hybrid"
    for df in (stream, small):
        assert sev._resolve_gate_engine(df, "expr") == "expr"
        assert sev._resolve_gate_engine(df, "np") == "np"
        assert sev._resolve_gate_engine(df, "hybrid") == "hybrid"
    with pytest.raises(ValueError, match="unknown gate engine"):
        sev._resolve_gate_engine(small, "fast")


def test_stream_exact_dedup_across_batches_and_restarts(spark, tmp_path):
    """The state store is the dedup index: duplicates are dropped within
    a batch, across micro-batches, AND across job RESTARTS over the
    same checkpoint — the incremental-crawl posture with no bookkeeping
    code. Watermark-free mode keeps full-history state."""
    import glob as _glob

    src = tmp_path / "src"; src.mkdir()
    out = str(tmp_path / "out"); ck = str(tmp_path / "ck")

    def stage(name, rows):
        stage_dir = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, "doc_id long, digest string") \
            .coalesce(1).write.parquet(stage_dir)
        shutil.copy(_glob.glob(f"{stage_dir}/part-*.parquet")[0],
                    src / f"{name}.parquet")

    def run():
        stream = spark.readStream.schema(
            "doc_id long, digest string").parquet(str(src))
        sev.stream_to_parquet(
            sev.stream_exact_dedup(stream, ["digest"]), out, ck)

    # batch 1: an in-batch duplicate collapses
    stage("a", [(1, "x"), (2, "x"), (3, "y")])
    run()
    got = {r["digest"] for r in spark.read.parquet(out).collect()}
    assert got == {"x", "y"}
    assert spark.read.parquet(out).count() == 2
    # restart with new files: previously-seen digests stay dropped
    stage("b", [(4, "x"), (5, "y"), (6, "z")])
    run()
    after = spark.read.parquet(out)
    assert after.count() == 3
    assert {r["digest"] for r in after.collect()} == {"x", "y", "z"}
    # the survivor of z is doc 6; x/y survivors are from run 1
    kept = {r["digest"]: r["doc_id"] for r in after.collect()}
    assert kept["z"] == 6 and kept["x"] in (1, 2) and kept["y"] == 3


def test_stream_exact_dedup_validation(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="come together"):
        sev.stream_exact_dedup(df, ["id"], event_time="ts")


def test_stream_hll_registers_matches_batch(spark, stream_dir):
    """The streaming aggregation's final state must equal the batch
    register table exactly (max is order-insensitive), and its row
    count is bounded by groups x 2^p regardless of stream length."""
    from ncbi_analysis_spark.operators.sketches import hll_registers

    stream = sev.read_event_stream(spark, stream_dir)
    regs = sev.stream_hll_registers(
        stream, "user_id", p=8, group_by=["event_type"])
    sev.run_to_memory(regs, "hll_stream_regs", output_mode="complete")
    got = {(r["event_type"], r["register"]): r["max_rho"]
           for r in spark.table("hll_stream_regs").collect()}
    batch = read_events(spark, f"{SF_DIR}/events.parquet")
    want = {(r["event_type"], r["register"]): r["max_rho"]
            for r in hll_registers(
                batch, "user_id", p=8, group_by=["event_type"]).collect()}
    assert got == want and len(got) > 0
    n_groups = batch.select("event_type").distinct().count()
    assert len(got) <= n_groups * 256


def test_publish_hll_snapshots_restart_and_merge(spark, tmp_path):
    """The streaming sketch publisher: versioned marker-guarded batch
    snapshots; a restart over the same checkpoint publishes nothing
    new; new files land as NEW snapshots; and the merged read equals
    the batch sketch of everything that ever flowed through
    (register-for-register — the associativity/idempotence contract)."""
    import glob as _glob

    from ncbi_analysis_spark.operators.sketches import hll_registers
    from ncbi_analysis_spark.sources import fsutil

    src = tmp_path / "src"; src.mkdir()
    out = str(tmp_path / "sketches"); ck = str(tmp_path / "ck")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")

    def run():
        stream = sev.read_event_stream(spark, str(src))
        sev.publish_hll_snapshots(
            stream.select("user_id", "event_type"), "user_id", out, ck,
            p=8, group_by=["event_type"])

    run()
    dirs1 = fsutil.list_subdirs(spark, out)
    assert dirs1 and all(d.startswith("batch=") for d in dirs1)
    # layout check: every snapshot carries its parameter marker
    for d in dirs1:
        assert fsutil.exists(spark, f"{out}/{d}/_SKETCH_PARAMS.json")
    # restart, same source+checkpoint: no new snapshots
    run()
    assert fsutil.list_subdirs(spark, out) == dirs1
    # new file between restarts -> new snapshot(s), exactly once
    stage = str(tmp_path / "stage")
    df2 = read_events(spark, f"{SF_DIR}/events.parquet").withColumn(
        "user_id", F.col("user_id") + 777)
    df2.coalesce(1).write.parquet(stage)
    shutil.copy(_glob.glob(f"{stage}/part-*.parquet")[0], src / "b.parquet")
    run()
    dirs2 = fsutil.list_subdirs(spark, out)
    assert len(dirs2) > len(dirs1)

    # merged read == batch sketch of the union, register-for-register
    merged = sev.read_hll_snapshots(spark, out, p=8,
                                    group_by=["event_type"])
    both = read_events(spark, f"{SF_DIR}/events.parquet").select(
        "user_id", "event_type").unionByName(
        df2.select("user_id", "event_type"))
    want = hll_registers(both, "user_id", p=8, group_by=["event_type"])
    assert sorted(map(tuple, merged.collect())) == \
           sorted(map(tuple, want.collect()))

    # wrong-parameter read fails loudly
    with pytest.raises(ValueError, match="parameter spaces"):
        sev.read_hll_snapshots(spark, out, p=12, group_by=["event_type"])
    with pytest.raises(ValueError, match="no published"):
        sev.read_hll_snapshots(spark, str(tmp_path / "nothing"), p=8)


def test_publish_cm_snapshots_restart_and_merge(spark, tmp_path):
    """The streaming Count-Min publisher (the HLL publisher's posture
    for ADD-merged state): restart over the same checkpoint publishes
    nothing new (add is NOT idempotent, so this is load-bearing, not
    just tidy); new files land as new snapshots; and the merged read
    equals the batch sketch of everything that ever flowed through,
    register-for-register."""
    import glob as _glob

    from ncbi_analysis_spark.operators.heavy_hitters import cm_sketch
    from ncbi_analysis_spark.sources import fsutil

    src = tmp_path / "src"; src.mkdir()
    out = str(tmp_path / "sketches"); ck = str(tmp_path / "ck")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")
    W, D = 32, 3

    def run():
        stream = sev.read_event_stream(spark, str(src))
        sev.publish_cm_snapshots(
            stream.select("user_id"), "user_id", out, ck,
            width=W, depth=D)

    run()
    dirs1 = fsutil.list_subdirs(spark, out)
    assert dirs1 and all(d.startswith("batch=") for d in dirs1)
    # restart, same source+checkpoint: no new snapshots, and (the add
    # semantics) the merged counts are unchanged
    merged1 = sorted(map(tuple, sev.read_cm_snapshots(
        spark, out, width=W, depth=D).collect()))
    run()
    assert fsutil.list_subdirs(spark, out) == dirs1
    assert sorted(map(tuple, sev.read_cm_snapshots(
        spark, out, width=W, depth=D).collect())) == merged1

    # new file between restarts -> new snapshot(s), exactly once
    stage = str(tmp_path / "stage")
    df2 = read_events(spark, f"{SF_DIR}/events.parquet").withColumn(
        "user_id", F.col("user_id") + 777)
    df2.coalesce(1).write.parquet(stage)
    shutil.copy(_glob.glob(f"{stage}/part-*.parquet")[0], src / "b.parquet")
    run()
    assert len(fsutil.list_subdirs(spark, out)) > len(dirs1)

    merged = sev.read_cm_snapshots(spark, out, width=W, depth=D)
    both = read_events(spark, f"{SF_DIR}/events.parquet").select(
        "user_id").unionByName(df2.select("user_id"))
    want = cm_sketch(both, "user_id", width=W, depth=D)
    assert sorted(map(tuple, merged.collect())) == \
           sorted(map(tuple, want.collect()))

    # wrong-parameter read fails loudly
    with pytest.raises(ValueError, match="parameter spaces"):
        sev.read_cm_snapshots(spark, out, width=64, depth=D)
    with pytest.raises(ValueError, match="no published"):
        sev.read_cm_snapshots(spark, str(tmp_path / "nothing"))


def test_publish_quantile_and_kmv_snapshots(spark, tmp_path):
    """The round-13 completion of the snapshot-publisher family:
    quantile (min-k by (h,v) — overwrite-guarded like CM) and KMV
    (min-k over hash sets — merge-idempotent like HLL). Restart over
    the same checkpoint publishes nothing new; the merged reads equal
    the batch sketches of everything that flowed through; and for KMV a
    DUPLICATED snapshot directory is absorbed by the fold."""
    import shutil as _sh

    from ncbi_analysis_spark.operators.sketches import (
        kmv_sketch,
        quantile_sketch,
    )
    from ncbi_analysis_spark.sources import fsutil

    src = tmp_path / "src"; src.mkdir()
    qout = str(tmp_path / "qs"); qck = str(tmp_path / "qck")
    kout = str(tmp_path / "ks"); kck = str(tmp_path / "kck")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")
    K = 64

    def run_q():
        stream = sev.read_event_stream(spark, str(src))
        sev.publish_quantile_snapshots(
            stream.select("event_id", "value"), "value", "event_id",
            qout, qck, k=K)

    def run_k():
        stream = sev.read_event_stream(spark, str(src))
        sev.publish_kmv_snapshots(
            stream.select("user_id"), "user_id", kout, kck, k=K)

    run_q(); run_k()
    dirs_q = fsutil.list_subdirs(spark, qout)
    assert dirs_q and all(d.startswith("batch=") for d in dirs_q)
    run_q(); run_k()  # restart: no new snapshots
    assert fsutil.list_subdirs(spark, qout) == dirs_q

    ev = read_events(spark, f"{SF_DIR}/events.parquet")
    want_q = sorted(map(tuple, quantile_sketch(
        ev.filter(F.col("value").isNotNull()), "value", "event_id",
        k=K).collect()))
    got_q = sorted(map(tuple, sev.read_quantile_snapshots(
        spark, qout, k=K).collect()))
    assert got_q == want_q

    want_k = sorted(map(tuple, kmv_sketch(ev, "user_id", k=K).collect()))
    got_k = sorted(map(tuple, sev.read_kmv_snapshots(
        spark, kout, k=K).collect()))
    assert got_k == want_k

    # KMV fold absorbs a duplicated snapshot dir (merge idempotence)
    b0 = fsutil.list_subdirs(spark, kout)[0]
    _sh.copytree(f"{kout}/{b0}", f"{kout}/batch=999")
    assert sorted(map(tuple, sev.read_kmv_snapshots(
        spark, kout, k=K).collect())) == want_k

    # wrong-parameter reads fail loudly
    with pytest.raises(ValueError, match="parameter spaces"):
        sev.read_quantile_snapshots(spark, qout, k=K * 2)
    with pytest.raises(ValueError, match="parameter spaces"):
        sev.read_kmv_snapshots(spark, kout, k=K * 2)
    with pytest.raises(ValueError, match="no published"):
        sev.read_quantile_snapshots(spark, str(tmp_path / "none"), k=K)


def test_compact_snapshots_fold_and_crash_recovery(spark, tmp_path):
    """Snapshot-directory compaction: N batch dirs fold to ONE with
    identical reads (all four families share the swap; HLL exercised
    for the merge, CM for the add — each-batch-exactly-once), a fresh
    micro-batch lands beside the compacted dir without collision, and
    the crash-recovery path (tmp written, batches retired, rename
    missed) completes on re-run."""
    import glob as _glob

    from ncbi_analysis_spark.sources import fsutil

    src = tmp_path / "src"; src.mkdir()
    out = str(tmp_path / "sk"); ck = str(tmp_path / "ck")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")
    W, D = 32, 3

    def run():
        stream = sev.read_event_stream(spark, str(src))
        sev.publish_cm_snapshots(
            stream.select("user_id"), "user_id", out, ck,
            width=W, depth=D)

    run()
    # a second file -> second batch dir, so the fold is non-trivial
    stage = str(tmp_path / "stage")
    df2 = read_events(spark, f"{SF_DIR}/events.parquet").withColumn(
        "user_id", F.col("user_id") + 777)
    df2.coalesce(1).write.parquet(stage)
    shutil.copy(_glob.glob(f"{stage}/part-*.parquet")[0], src / "b.parquet")
    run()
    before = sorted(map(tuple, sev.read_cm_snapshots(
        spark, out, width=W, depth=D).collect()))
    assert len(fsutil.list_subdirs(spark, out)) >= 2

    sev.compact_cm_snapshots(spark, out, width=W, depth=D)
    assert fsutil.list_subdirs(spark, out) == ["batch=0"]
    assert sorted(map(tuple, sev.read_cm_snapshots(
        spark, out, width=W, depth=D).collect())) == before

    # a post-compaction micro-batch continues from the checkpoint id
    df3 = read_events(spark, f"{SF_DIR}/events.parquet").withColumn(
        "user_id", F.col("user_id") + 555_000)
    stage3 = str(tmp_path / "stage3")
    df3.coalesce(1).write.parquet(stage3)
    shutil.copy(_glob.glob(f"{stage3}/part-*.parquet")[0], src / "c.parquet")
    run()
    dirs = fsutil.list_subdirs(spark, out)
    assert "batch=0" in dirs and len(dirs) == 2

    # crash simulation: retire the batch dirs by hand after writing tmp
    # (the state a crash between steps 2 and 3 leaves), then recover
    merged = sev.read_cm_snapshots(spark, out, width=W, depth=D)
    want = sorted(map(tuple, merged.collect()))
    from ncbi_analysis_spark.operators.heavy_hitters import write_cm_sketch
    write_cm_sketch(merged, out + "/_compact_tmp", width=W, depth=D)
    for d in dirs:
        fsutil.rename(spark, f"{out}/{d}", f"{out}/_retired_{d}")
    with pytest.raises(ValueError, match="no published"):
        sev.read_cm_snapshots(spark, out, width=W, depth=D)
    sev.compact_cm_snapshots(spark, out, width=W, depth=D)  # recovery
    assert fsutil.list_subdirs(spark, out) == ["batch=0"]
    assert sorted(map(tuple, sev.read_cm_snapshots(
        spark, out, width=W, depth=D).collect())) == want

    # HLL family shares the swap: quick fold-equality check
    hout = str(tmp_path / "hll"); hck = str(tmp_path / "hck")
    stream = sev.read_event_stream(spark, str(src))
    sev.publish_hll_snapshots(
        stream.select("user_id", "event_type"), "user_id", hout, hck,
        p=8, group_by=["event_type"])
    hb = sorted(map(tuple, sev.read_hll_snapshots(
        spark, hout, p=8, group_by=["event_type"]).collect()))
    sev.compact_hll_snapshots(spark, hout, p=8, group_by=["event_type"])
    assert fsutil.list_subdirs(spark, hout) == ["batch=0"]
    assert sorted(map(tuple, sev.read_hll_snapshots(
        spark, hout, p=8, group_by=["event_type"]).collect())) == hb


def test_snapshot_compaction_crash_recovery_at_every_rename(
        spark, tmp_path, monkeypatch):
    """Fault injection for the snapshot swap (the index-swap test's
    sibling): kill compact_cm_snapshots at the k-th rename for every k,
    re-run, and require the merged read to equal the never-crashed
    fold — including when new batches were published BETWEEN the crash
    and the recovery (the restore-and-redo semantics must fold them
    in)."""
    import glob as _glob

    from ncbi_analysis_spark.sources import fsutil

    W, D = 16, 2
    src_all = tmp_path / "srcall"; src_all.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_all / "a.parquet")
    stage = str(tmp_path / "stage")
    df2 = read_events(spark, f"{SF_DIR}/events.parquet").withColumn(
        "user_id", F.col("user_id") + 777)
    df2.coalesce(1).write.parquet(stage)
    part2 = _glob.glob(f"{stage}/part-*.parquet")[0]

    real_rename = fsutil.rename
    k = 0
    while True:
        src = tmp_path / f"src_{k}"; src.mkdir()
        out = str(tmp_path / f"sk_{k}"); ck = str(tmp_path / f"ck_{k}")
        shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")

        def run():
            stream = sev.read_event_stream(spark, str(src))
            sev.publish_cm_snapshots(
                stream.select("user_id"), "user_id", out, ck,
                width=W, depth=D)

        run()
        calls = {"n": 0}

        def crashing(spark_, s, d, _k=k):
            if calls["n"] >= _k:
                raise RuntimeError("injected crash")
            calls["n"] += 1
            return real_rename(spark_, s, d)

        monkeypatch.setattr(fsutil, "rename", crashing)
        try:
            sev.compact_cm_snapshots(spark, out, width=W, depth=D)
            crashed = False
        except RuntimeError:
            crashed = True
        finally:
            monkeypatch.setattr(fsutil, "rename", real_rename)

        # a batch published AFTER the crash must survive recovery
        shutil.copy(part2, src / "b.parquet")
        run()
        sev.compact_cm_snapshots(spark, out, width=W, depth=D)

        from ncbi_analysis_spark.operators.heavy_hitters import cm_sketch
        both = read_events(spark, f"{SF_DIR}/events.parquet").select(
            "user_id").unionByName(df2.select("user_id"))
        want = sorted(map(tuple, cm_sketch(both, "user_id", W, D).collect()))
        got = sorted(map(tuple, sev.read_cm_snapshots(
            spark, out, width=W, depth=D).collect()))
        assert got == want, k
        assert fsutil.list_subdirs(spark, out) == ["batch=0"], k
        assert not any(c.startswith(("_retired_", "_compact_tmp"))
                       for c in fsutil.list_children(spark, out)), k
        if not crashed:
            break
        k += 1
    assert k >= 2  # at least one retire + the final rename


def test_stream_index_decon_gate(spark, tmp_path):
    """Index-backed streaming gate: clean/flagged partition the stream
    by collision with the persisted index's LIVE view; tombstoning the
    only colliding indexed doc (no compaction) flips its stream twin to
    clean; output is invariant to how the stream was batched; params
    come from the index marker (a foreign dir fails fast)."""
    from ncbi_analysis_spark.operators.dedup import (
        delete_from_lsh_index, write_lsh_index)

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different indexed content here")],
        "doc_id long, text string")
    idx = str(tmp_path / "idx")
    write_lsh_index(corpus, "text", "doc_id", idx,
                    num_perm=4, bands=2, shingle_n=3)

    new = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),  # dup of 1
         (101, "fresh never-seen document body"),
         (102, None)],                                          # NULL text
        "doc_id long, text string")
    src = str(tmp_path / "src")
    new.repartition(3).write.parquet(src)

    def drain(out, keep):
        stream = spark.readStream.schema(new.schema).parquet(src)
        sev.stream_index_decon(
            stream, idx, str(tmp_path / out), str(tmp_path / (out + "_ck")),
            keep=keep)
        return {r["doc_id"] for r in
                sev.read_gated_docs(spark, str(tmp_path / out)).collect()}

    assert drain("clean1", "clean") == {101, 102}
    assert drain("flag1", "flagged") == {100}

    # different batching (one file per row vs whatever repartition(3)
    # gave) -> same union
    src2 = str(tmp_path / "src2")
    new.repartition(1).write.parquet(src2)
    stream = spark.readStream.schema(new.schema).parquet(src2)
    sev.stream_index_decon(
        stream, idx, str(tmp_path / "clean2"), str(tmp_path / "ck2"))
    got = {r["doc_id"] for r in
           sev.read_gated_docs(spark, str(tmp_path / "clean2")).collect()}
    assert got == {101, 102}

    # tombstone the colliding indexed doc: its stream twin is now clean
    delete_from_lsh_index(
        spark.createDataFrame([(1,)], "id long"), idx)
    assert drain("clean3", "clean") == {100, 101, 102}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="keep must be"):
        sev.stream_index_decon(
            spark.readStream.schema(new.schema).parquet(src), idx,
            str(tmp_path / "x"), str(tmp_path / "xck"), keep="bogus")
    with _pytest.raises(ValueError, match="not a write_lsh_index"):
        sev.stream_index_decon(
            spark.readStream.schema(new.schema).parquet(src),
            str(tmp_path / "nonindex"),
            str(tmp_path / "y"), str(tmp_path / "yck"))
    with _pytest.raises(ValueError, match="no published batch"):
        sev.read_gated_docs(spark, str(tmp_path / "never_ran"))


def test_stream_ivf_decon_gate(spark, tmp_path):
    """Vector gate: near-dup stream rows (cos >= threshold vs the
    indexed corpus) drop under keep='clean' and are the only output
    under 'flagged'; tombstoning the colliding indexed vector (no
    compaction) flips its stream twin to clean; a drifted quantizer
    fails loudly up front."""
    from ncbi_analysis_spark.operators.similarity_search import (
        delete_from_ivf_index, ivf_assign, write_ivf_index)

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "c_id long, embedding array<double>")
    idx = str(tmp_path / "ivf")
    write_ivf_index(ivf_assign(corpus, cents), idx, centroids=cents)

    new = spark.createDataFrame(
        [(100, [0.999, 0.01]),   # near-dup of 1
         (101, [0.7, 0.7])],     # ~0.7 cos to both -> clean at 0.95
        "vec_id long, embedding array<double>")
    src = str(tmp_path / "src")
    new.repartition(2).write.parquet(src)

    def drain(out, keep):
        stream = spark.readStream.schema(new.schema).parquet(src)
        sev.stream_ivf_decon(
            stream, idx, cents, str(tmp_path / out),
            str(tmp_path / (out + "_ck")), threshold=0.95, keep=keep)
        return {r["vec_id"] for r in
                sev.read_gated_docs(spark, str(tmp_path / out)).collect()}

    assert drain("clean1", "clean") == {101}
    assert drain("flag1", "flagged") == {100}

    # takedown of the colliding indexed vector: twin becomes clean
    delete_from_ivf_index(
        spark.createDataFrame([(1,)], "vec_id long"), idx)
    assert drain("clean2", "clean") == {100, 101}

    import pytest as _pytest
    drifted = spark.createDataFrame(
        [(0, [0.5, 0.5]), (1, [0.0, 1.0])],
        "c_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="drift"):
        sev.stream_ivf_decon(
            spark.readStream.schema(new.schema).parquet(src), idx,
            drifted, str(tmp_path / "x"), str(tmp_path / "xck"))


def test_stream_ivf_decon_custom_id_col(spark, tmp_path):
    """ADVICE r13: id_col must reach read_ivf_index/ivf_topk — an index
    built with a non-default id column used to fail (AnalysisException
    on the 'vec_id' tombstone anti-join) despite the parameter."""
    from ncbi_analysis_spark.operators.similarity_search import (
        delete_from_ivf_index, ivf_assign, write_ivf_index)

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "doc_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "c_id long, embedding array<double>")
    idx = str(tmp_path / "ivf")
    write_ivf_index(ivf_assign(corpus, cents, id_col="doc_id"), idx,
                    centroids=cents)
    # a tombstone forces read_ivf_index down the anti-join path, where
    # the wrong id name blew up
    delete_from_ivf_index(
        spark.createDataFrame([(2,)], "doc_id long"), idx,
        id_col="doc_id")

    new = spark.createDataFrame(
        [(100, [0.999, 0.01]), (101, [0.0, 1.0])],
        "doc_id long, embedding array<double>")
    src = str(tmp_path / "src")
    new.write.parquet(src)
    stream = spark.readStream.schema(new.schema).parquet(src)
    sev.stream_ivf_decon(
        stream, idx, cents, str(tmp_path / "out"),
        str(tmp_path / "ck"), id_col="doc_id", threshold=0.95)
    # 100 collides with indexed 1; 101's twin (2) is tombstoned -> clean
    got = {r["doc_id"] for r in
           sev.read_gated_docs(spark, str(tmp_path / "out")).collect()}
    assert got == {101}


def test_stream_semdedup_decon_gate(spark, tmp_path):
    """SemDeDup gate: history near-dups drop on the index leg; two
    near-identical NEW rows arriving in one micro-batch collapse to the
    keep-the-outlier survivor on the batch leg (the case the
    history-only IVF gate structurally misses); 'flagged' emits the
    complement; intra_batch=False reverts to history-only verdicts."""
    from ncbi_analysis_spark.operators.similarity_search import (
        ivf_assign, write_ivf_index)

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "c_id long, embedding array<double>")
    hist = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    idx = str(tmp_path / "ivf")
    write_ivf_index(ivf_assign(hist, cents), idx, centroids=cents)

    new = spark.createDataFrame(
        [(100, [0.999, 0.01]),   # near-dup of indexed 1 -> index leg
         (101, [0.0, 1.0]),      # c1; near-dup of 102, cent_sim 1.0
         (102, [0.01, 0.999]),   # c1; cent_sim < 101's -> the outlier
         (103, [0.7, 0.7])],     # ~0.707 to everything -> novel
        "vec_id long, embedding array<double>")
    src = str(tmp_path / "src")
    new.coalesce(1).write.parquet(src)

    def drain(out, **kw):
        stream = spark.readStream.schema(new.schema).parquet(src)
        sev.stream_semdedup_decon(
            stream, idx, cents, str(tmp_path / out),
            str(tmp_path / (out + "_ck")), threshold=0.95, **kw)
        return {r["vec_id"] for r in
                sev.read_gated_docs(spark, str(tmp_path / out)).collect()}

    # 100 drops vs history; 101 drops to batch-mate 102 (keep the row
    # LEAST similar to its centroid); 103 is novel
    assert drain("clean") == {102, 103}
    assert drain("flag", keep="flagged") == {100, 101}
    # history-only: the batch-leg drop (101) comes back
    assert drain("noib", intra_batch=False) == {101, 102, 103}

    import pytest as _pytest
    drifted = spark.createDataFrame(
        [(0, [0.5, 0.5]), (1, [0.0, 1.0])],
        "c_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="drift"):
        sev.stream_semdedup_decon(
            spark.readStream.schema(new.schema).parquet(src), idx,
            drifted, str(tmp_path / "x"), str(tmp_path / "xck"))


def test_stream_semdedup_batch_parity(spark, tmp_path):
    """Single-batch drain over no colliding history == batch
    semantic_dedup keep=True set (the gate's batch-parity contract),
    and the standing drain-then-append loop makes the NEXT drain treat
    this drain's survivors as history."""
    from ncbi_analysis_spark.operators.dedup import semantic_dedup
    from ncbi_analysis_spark.operators.similarity_search import (
        append_to_ivf_index, ivf_assign, write_ivf_index)

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "c_id long, embedding array<double>")
    # history sits at ~0.707 cos to every stream row: never collides
    hist = spark.createDataFrame(
        [(1, [0.7, 0.7])], "vec_id long, embedding array<double>")
    idx = str(tmp_path / "ivf")
    write_ivf_index(ivf_assign(hist, cents), idx, centroids=cents)

    rows = [(200, [1.0, 0.0]), (201, [0.999, 0.02]),
            (202, [0.98, 0.05]), (203, [0.0, 1.0]),
            (204, [0.03, 0.999])]
    new = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    src = str(tmp_path / "src")
    new.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(new.schema).parquet(src)
    sev.stream_semdedup_decon(
        stream, idx, cents, str(tmp_path / "out"),
        str(tmp_path / "ck"), threshold=0.95)
    got = {r["vec_id"] for r in
           sev.read_gated_docs(spark, str(tmp_path / "out")).collect()}
    want = {r["vec_id"] for r in semantic_dedup(
        new, "embedding", "vec_id", cents, threshold=0.95,
    ).filter("keep").collect()}
    assert got == want

    # standing loop: fold survivors in, then their near-dups drop on
    # the INDEX leg of the next drain
    surv = sev.read_gated_docs(spark, str(tmp_path / "out"))
    append_to_ivf_index(surv, cents, idx)
    nxt = spark.createDataFrame(
        [(300, [0.97, 0.08])],  # near-dup of the kept 200-cluster row
        "vec_id long, embedding array<double>")
    src2 = str(tmp_path / "src2")
    nxt.coalesce(1).write.parquet(src2)
    sev.stream_semdedup_decon(
        spark.readStream.schema(nxt.schema).parquet(src2), idx, cents,
        str(tmp_path / "out2"), str(tmp_path / "ck2"), threshold=0.95)
    assert sev.read_gated_docs(spark, str(tmp_path / "out2")).count() == 0
