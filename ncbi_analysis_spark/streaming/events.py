"""Streaming operators over the events stream.

All operators take a streaming DataFrame (``spark.readStream``) and
return a transformed streaming DataFrame; callers pick the sink/trigger.
Watermarks bound state so these run indefinitely at cluster scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def read_event_stream(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """events as a file stream; ``path`` must be a directory (file-stream
    source requirement). ``ts`` is normalized to TIMESTAMP whatever the
    shipped physical layout — ``withWatermark`` rejects both bigint nanos
    and TIMESTAMP_NTZ (see sources.events for the layout history)."""
    from ncbi_analysis_spark.sources.events import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(path).schema
    return normalize_event_ts(spark.readStream.schema(schema).parquet(path))


def windowed_event_counts(stream: DataFrame, window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Event-time tumbling-window counts per event_type with late-data
    handling (A1's streaming form)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"),
                "event_type", "cnt", "sum_value")
    )


def streaming_dedup(stream: DataFrame, keys: list[str],
                    watermark: str = "10 minutes") -> DataFrame:
    """Exact dedup in a stream: dropDuplicates bounded by the watermark
    (the streaming form of operators.dedup.exact_dedup)."""
    return stream.withWatermark("ts", watermark).dropDuplicates([*keys, "ts"])


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])


def sessionize(stream: DataFrame, gap: str = "30 minutes",
               watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator: per-user session windows with a gap
    timeout, via ``applyInPandasWithState`` (the pattern the reference
    has no equivalent for — SURVEY §2.8 notes streaming as extension).

    Emits one row per closed session (event-time timeout)."""
    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            })
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        if not ts_us:
            return
        ts_us.sort()
        closed = []
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = ts_us[0], ts_us[0], 0
        for t in ts_us:
            if t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, n = t, 0
            last_us = t
            n += 1
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp(last_us // 1000 + int(pd.Timedelta(gap).total_seconds() * 1000))
        if closed:
            yield pd.DataFrame({
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            })

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


SUPPRESS_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])

_SUPPRESS_STATE = T.StructType([
    T.StructField("ts_us", T.ArrayType(T.LongType())),
    T.StructField("vals", T.ArrayType(T.DoubleType())),
    T.StructField("eids", T.ArrayType(T.LongType())),
    T.StructField("done", T.ArrayType(T.BooleanType())),
])


def suppress_local_max_stream(
    stream: DataFrame,
    distance: str = "10 minutes",
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming twin of operators.suppression.local_max_suppress (W2):
    per event_type, emit events whose value is the max among all events
    within ±``distance`` of their event time (ties survive, non-positive
    values dropped — the batch rule exactly).

    An event is decidable only once the watermark passes ``ts +
    distance`` (no in-window neighbor can still arrive); decided events
    stay buffered as neighbor context until ``wm - 2*distance`` then
    evict, so state per key is bounded by the event rate within a
    2-distance horizon regardless of stream length.
    """
    d_us = int(pd.Timedelta(distance).total_seconds() * 1_000_000)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (etype,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            ts_l, v_l, id_l, done_l = (list(x) for x in state.get)
        else:
            ts_l, v_l, id_l, done_l = [], [], [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                for t, v, eid in zip(pd.to_datetime(pdf["ts"]), pdf["value"], pdf["event_id"]):
                    if v is None or not float(v) > 0:
                        continue
                    ts_l.append(int(t.value // 1000))
                    v_l.append(float(v))
                    id_l.append(int(eid))
                    done_l.append(False)
        order = sorted(range(len(ts_l)), key=lambda i: (ts_l[i], id_l[i]))
        ts_l = [ts_l[i] for i in order]
        v_l = [v_l[i] for i in order]
        id_l = [id_l[i] for i in order]
        done_l = [done_l[i] for i in order]

        out = []
        n = len(ts_l)
        for i in range(n):
            if done_l[i] or ts_l[i] + d_us >= wm_us:
                continue
            local_max = max(
                v_l[j] for j in range(n) if abs(ts_l[j] - ts_l[i]) <= d_us
            )
            done_l[i] = True
            if v_l[i] >= local_max:
                out.append((etype, id_l[i], pd.Timestamp(ts_l[i], unit="us"), v_l[i]))

        keep = [i for i in range(n) if ts_l[i] >= wm_us - 2 * d_us or not done_l[i]]
        ts_l = [ts_l[i] for i in keep]
        v_l = [v_l[i] for i in keep]
        id_l = [id_l[i] for i in keep]
        done_l = [done_l[i] for i in keep]

        undecided = [ts_l[i] for i in range(len(ts_l)) if not done_l[i]]
        if ts_l:
            state.update((ts_l, v_l, id_l, done_l))
            if undecided:
                # fire when the earliest undecided event becomes decidable
                fire_ms = max(min(undecided) + d_us, wm_us) // 1000 + 1
                state.setTimeoutTimestamp(fire_ms)
        else:
            state.remove()
        if out:
            yield pd.DataFrame(out, columns=["event_type", "event_id", "ts", "value"])

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            fn, SUPPRESS_SCHEMA, _SUPPRESS_STATE, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


TOPK_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("window_start", T.TimestampType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("rk", T.LongType()),
])

_TOPK_STATE = T.StructType([
    T.StructField("ws_us", T.ArrayType(T.LongType())),
    T.StructField("eids", T.ArrayType(T.LongType())),
    T.StructField("vals", T.ArrayType(T.DoubleType())),
])


def windowed_topk_stream(
    stream: DataFrame,
    window: str = "1 hour",
    k: int = 3,
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming twin of W1 per-group top-k, per epoch-aligned tumbling
    window: when the watermark closes a window, emit that window's top-k
    events by value per event_type (ties broken by event_id ascending —
    the batch row_number order exactly).

    State per key is bounded by k x open-windows: candidates are pruned
    to the window top-k on every batch (top-k merges losslessly, so
    incremental truncation never changes the final answer).
    """
    win_us = int(pd.Timedelta(window).total_seconds() * 1_000_000)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (etype,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        cand: dict[int, list[tuple[float, int]]] = {}
        if state.exists:
            ws_l, id_l, v_l = state.get
            for w, i, v in zip(ws_l, id_l, v_l):
                cand.setdefault(int(w), []).append((float(v), int(i)))
        if not state.hasTimedOut:
            for pdf in pdfs:
                for t, v, eid in zip(pd.to_datetime(pdf["ts"]), pdf["value"], pdf["event_id"]):
                    ts_us = int(t.value // 1000)
                    w = ts_us // win_us * win_us
                    cand.setdefault(w, []).append((float(v), int(eid)))
        for w in cand:
            cand[w] = sorted(cand[w], key=lambda p: (-p[0], p[1]))[:k]

        out = []
        for w in sorted(cand):
            if w + win_us <= wm_us:
                for rk, (v, eid) in enumerate(cand[w], start=1):
                    out.append((etype, pd.Timestamp(w, unit="us"), eid, v, rk))
        open_ws = {w: c for w, c in cand.items() if w + win_us > wm_us}

        if open_ws:
            ws_l, id_l, v_l = [], [], []
            for w, lst in open_ws.items():
                for v, eid in lst:
                    ws_l.append(w)
                    id_l.append(eid)
                    v_l.append(v)
            state.update((ws_l, id_l, v_l))
            fire_ms = max(min(open_ws) + win_us, wm_us) // 1000 + 1
            state.setTimeoutTimestamp(fire_ms)
        else:
            state.remove()
        if out:
            yield pd.DataFrame(
                out, columns=["event_type", "window_start", "event_id", "value", "rk"]
            )

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            fn, TOPK_SCHEMA, _TOPK_STATE, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed stream-stream inner join: each purchase joined to the
    same user's click events within ``within`` before it. Watermarks on
    both sides bound the join state (Spark drops buffered rows once the
    event-time range condition can no longer match)."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
                F.col("event_id").alias("click_id"))
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select("user_id", F.col("ts").alias("purchase_ts"),
                F.col("event_id").alias("purchase_id"))
    )
    gap = f"INTERVAL {within}"
    return p.join(
        c,
        F.expr(
            f"user_id = c_user AND click_ts <= purchase_ts "
            f"AND click_ts >= purchase_ts - {gap}"
        ),
        "inner",
    ).select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — the stateless dimension-lookup
    pattern (every micro-batch joins against the static side; no
    watermark, no state store, late data impossible to mis-enrich
    because the dim is time-invariant within the run).

    ``broadcast_dim=True`` (default) hints the static side broadcast,
    which is right for the classic small-dim lookup: each executor joins
    map-side, zero shuffle per micro-batch. For a dim too large to
    broadcast set it False — Spark then shuffles each micro-batch
    against the (cached) dim; on a real cluster, pre-bucket the dim on
    the join key so only the stream side moves.

    Supported stream-side ``how``: inner, left, left_semi, left_anti
    (right/full are impossible from the stream's perspective — Spark
    would need to know which dim rows NEVER match, which an unbounded
    stream cannot decide). ``left_anti`` is the streaming incremental-
    dedup / decontamination shape: stream new documents, drop any whose
    key (e.g. an ``exact_dedup_against``-style md5 digest) already
    exists in the ingested-corpus digest table.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"stream-static join supports inner/left/left_semi/left_anti "
            f"from the stream side, got {how!r}"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
    timeout_s: int = 300,
):
    """Durable streaming sink: append the stream to partitioned parquet
    with exactly-once delivery. The checkpoint directory is the
    exactly-once mechanism — Spark records committed batch ids there, so
    a restart (same checkpoint) resumes AFTER the last committed batch
    and never rewrites rows, even when the previous run crashed
    mid-batch (the parquet sink commits files atomically per batch via
    its transaction log, `_spark_metadata`).

    ``available_now=True`` runs bounded (drain everything currently in
    the source, then stop — the batch-ingest-shaped invocation and the
    testable form) and RAISES if the drain overruns ``timeout_s`` — a
    partial drain must not look like success (the checkpoint makes the
    retry safe, but only a surfaced failure tells the caller to retry);
    False leaves the query running and returns the handle for the
    caller to manage.

    Scale: partition_by gives downstream readers partition pruning (the
    write_training_shards layout, incrementally maintained); pair with
    sufficiently coarse trigger intervals so each micro-batch writes
    shard-sized files rather than a small-files explosion.
    """
    w = stream_df.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint
    ).outputMode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if available_now:
        q = w.trigger(availableNow=True).start()
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"stream_to_parquet drain overran {timeout_s}s and was "
                f"stopped mid-batch; the checkpoint at {checkpoint!r} makes "
                "a retry exactly-once safe"
            )
        return None
    return w.start()


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    timeout_s: int = 120,
    output_mode: str = "append",
) -> None:
    """Run a streaming query to a memory sink with availableNow (test and
    smoke-check helper: processes everything currently in the source,
    then stops). A run that overruns ``timeout_s`` is STOPPED and raises
    ``TimeoutError`` (matching ``stream_to_parquet``'s fail-on-partial-
    drain contract) — a silent return would hand callers a PARTIAL memory
    table, turning a timeout into a confusing downstream row mismatch;
    and callers often remove the staged source directory right after, so
    a still-running query would read from underneath it.

    ``output_mode="complete"`` for stateful aggregations (the memory
    sink holds the final aggregate state — ``stream_hll_registers``'s
    consumption shape)."""
    q = (
        stream_df.writeStream.format("memory").queryName(name)
        .outputMode(output_mode).trigger(availableNow=True).start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"run_to_memory({name!r}) overran {timeout_s}s and was stopped "
            "mid-drain; the memory table holds only a PARTIAL result"
        )


def stream_exact_dedup(
    stream: DataFrame,
    key_cols: list[str],
    event_time: str | None = None,
    delay: str | None = None,
) -> DataFrame:
    """Stateful cross-micro-batch exact deduplication — the streaming
    twin of ``operators.dedup.exact_dedup``: the first document bearing
    each key passes, every later arrival (same batch, a later batch, or
    a later RESTART of the job over the same checkpoint) is dropped.
    The state store is the persisted dedup index, so the
    checkpoint-carried contract is exactly ``exact_dedup_against``'s
    incremental-crawl posture with zero bookkeeping code: point the job
    at tomorrow's crawl directory and re-run.

    Two state regimes:

    - ``event_time=None``: ``dropDuplicates`` — state holds ONE entry
      per distinct key forever. Right when the key is a content digest
      (state size = corpus distinct count, the same cardinality any
      batch dedup index carries; RocksDB state store spills it).
    - ``event_time + delay`` (e.g. ``("ts", "1 hour")``):
      ``dropDuplicatesWithinWatermark`` — keys older than the
      watermark are evicted, bounding state for UNBOUNDED key spaces
      (request ids, event ids) where duplicates only ever arrive close
      together.

    Dedup keys should be digests (``md5(text)``), never raw text —
    state-store bytes are the scarce resource (the exact_dedup
    "no text through the shuffle" rule, applied to state).
    """
    if (event_time is None) != (delay is None):
        raise ValueError(
            "stream_exact_dedup: event_time and delay come together "
            "(both for watermarked eviction, neither for full-history "
            "state)"
        )
    if event_time is not None:
        return stream.withWatermark(event_time, delay).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return stream.dropDuplicates(list(key_cols))


def stream_hll_registers(
    stream: DataFrame,
    col: str,
    p: int = 8,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Streaming HLL register table — live distinct-count tracking over
    an unbounded stream with state BOUNDED BY CONSTRUCTION.

    ``operators.sketches.hll_registers``'s plan (md5 carve → per-
    register max-rho groupBy) is a standard streaming aggregation, and
    its aggregation state is at most ``n_groups * 2^p`` rows NO MATTER
    HOW MANY EVENTS FLOW THROUGH — max is monotone, so no watermark,
    no eviction, no late-data anxiety: this is the rare stateful
    streaming operator that is safe in ``complete`` output mode
    forever. Consume with ``run_to_memory(..., output_mode="complete")``
    or a foreachBatch publisher; feed the materialized table to
    ``hll_estimate`` (batch) for the live cardinality readout, or
    ``hll_merge`` it with other snapshots' published sketches.
    """
    from ncbi_analysis_spark.operators.sketches import hll_registers

    return hll_registers(stream, col, p=p, group_by=group_by)


def fuzzy_decon_stream(
    stream: DataFrame,
    bench_df: DataFrame,
    text: str,
    num_perm: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    keep: str = "clean",
    max_bench_bands: int = 200_000,
    engine: str = "hybrid",
) -> DataFrame:
    """Streaming fuzzy decontamination — the streaming twin of
    ``operators.dedup.fuzzy_decon_pairs``: drop (or flag) stream
    documents whose MinHash-LSH band collides with a held-out benchmark
    document, so contaminated pages never reach the training corpus in
    the first place.

    Statelessness is the design constraint: the batch operator's
    signature pipeline aggregates shingles (groupBy + window), which a
    stream cannot run without state. Here the signature and its band
    hashes are computed as pure per-row Column expressions
    (``functions.text.minhash_signature`` / ``minhash_bands`` — the
    expression twins of the batch aggregate form, same salted hashes,
    same band digests), and the benchmark side is reduced ONCE, in
    batch, to its distinct ``band|hash`` keys, embedded as a broadcast
    literal set probed with ``arrays_overlap`` — zero state store, zero
    shuffle, works under any trigger.

    ``keep``: ``"clean"`` (default) passes only non-colliding documents
    through; ``"flagged"`` inverts — emit the contaminated ones (the
    audit stream). NULL-text documents are always clean (the batch
    operator's shingle explode drops them, so they can never collide).

    Scale: benchmark suites are small (the ``fuzzy_decon_pairs``
    broadcast posture); ``max_bench_bands`` fails fast past the bound
    where a literal probe set stops making sense — there, pre-filter
    with a Bloom filter (``build_ngram_bloom``'s 128 KiB broadcast
    pattern) or run the batch operator over micro-batch sinks instead.

    ``engine``: ``'hybrid'`` (default since r15 — for decon identical
    to ``'np'``), ``'np'``, ``'expr'`` (the all-JVM expression form),
    or ``'auto'`` (``_resolve_gate_engine``) — the np form is an
    Arrow-batched Python replica of the SAME salted-md5 signature/band
    pipeline (hashes are md5 on both sides, so band keys and therefore
    the kept row set are identical; see test_streaming.py's
    twin-parity test). The expression form's HOF lambdas are
    CodegenFallback — interpreted per shingle — which made them the
    dominant cost of the stream gates at bench scale; the replica does
    the same hashing in C-speed hashlib (measured A/B in SCALING.md
    round 9, default flipped on the r15 optimization measurement).
    """
    from ncbi_analysis_spark.functions.text import minhash_bands, minhash_signature
    from ncbi_analysis_spark.operators.dedup import _minhash_band_rows

    if keep not in ("clean", "flagged"):
        raise ValueError(f"keep must be 'clean' or 'flagged', got {keep!r}")
    bench_keys = [
        r["k"]
        for r in _minhash_band_rows(
            bench_df, text, bench_df.columns[0], num_perm, bands, shingle_n
        )
        .select(F.concat_ws("|", "band", "band_hash").alias("k"))
        .distinct()
        .collect()
    ]
    if len(bench_keys) > max_bench_bands:
        raise ValueError(
            f"benchmark reduces to {len(bench_keys)} band keys "
            f"(> max_bench_bands={max_bench_bands}); a literal probe set "
            "this large belongs in a Bloom filter (build_ngram_bloom) or "
            "the batch fuzzy_decon_pairs path"
        )
    engine = _resolve_gate_engine(stream, engine)
    if engine in ("np", "hybrid"):
        # decon has no float path at all — band keys are md5 on both
        # sides — so 'hybrid' and 'np' are the same (row-identical) form
        return _fuzzy_decon_stream_np(
            stream, frozenset(bench_keys), text, num_perm, bands,
            shingle_n, keep)
    # ONE array Literal node, never F.array(*[F.lit(k) ...]): a
    # CreateArray with 200k children makes every Catalyst rule walk
    # 200k nodes per pass (measured 24s/microbatch at 1.4k keys vs
    # ~1s as a single literal)
    bench_lit = (F.lit(sorted(bench_keys)) if bench_keys
                 else F.lit([]).cast("array<string>"))
    t = F.col(text)
    sig = minhash_signature(t, num_perm, shingle_n)
    keys = F.transform(
        minhash_bands(sig, bands, num_perm // bands),
        lambda b: F.concat_ws("|", b["band"], b["band_hash"]),
    )
    hit = F.when(t.isNull(), F.lit(False)).otherwise(
        F.arrays_overlap(keys, bench_lit)
    )
    return stream.filter(hit if keep == "flagged" else ~hit)


def quality_score_stream(
    stream: DataFrame,
    weights: DataFrame,
    bias: float,
    text: str = "text",
    n_buckets: int = 1024,
    ngram_max: int = 2,
    engine: str = "hybrid",
) -> DataFrame:
    """Stateless streaming scoring for a trained quality classifier —
    the streaming twin of ``operators.terms.quality_probability``: score
    each in-flight document with its calibrated target probability so a
    quality gate runs at ingest, before anything lands in the corpus.

    The batch scorer aggregates (doc, bucket) rows, which a stream
    cannot do without state; here the whole computation is per-row
    Column expressions — tokenize, build the 1..``ngram_max`` hashed
    n-gram features with ``_dsir_features``'s exact partial-shingle
    semantics, look each bucket up in the weight table embedded as a
    broadcast ARRAY literal (collected once from the batch-trained
    ``weights`` DataFrame — the classifier's own bounded-vector
    pattern), mean-pool, add the bias, sigmoid. Zero state store, zero
    shuffle, works under any trigger.

    Appends ``n_feats``, ``prob`` columns. NULL-text rows get NULL prob
    (the batch scorer drops them; a stream must not drop rows silently —
    filter ``prob IS NULL`` per policy downstream).

    Exactness note: the per-row fold sums weight terms in FEATURE order
    while the batch scorer folds per-bucket terms in bucket order, so
    the two agree to float-sum rounding (~1e-12 relative), not
    bit-exactly — fine for a gate threshold, not for an exact-match
    oracle (the batch query remains the oracled form).

    ``engine``: ``'hybrid'`` (default since r15: Arrow-batched md5 fold
    emits the logit, sigmoid+round stay JVM expressions — ``prob`` bits
    equal the expr form's) / ``'expr'`` / ``'np'`` / ``'auto'`` — same
    routing contract as ``fuzzy_decon_stream``.
    """
    from ncbi_analysis_spark.functions.text import _hash32, tokens

    w_rows = {r["bucket"]: r["w"] for r in weights.collect()}
    engine = _resolve_gate_engine(stream, engine)
    if engine in ("np", "hybrid"):
        return _quality_score_stream_np(
            stream, [float(w_rows.get(b, 0.0)) for b in range(n_buckets)],
            float(bias), text, n_buckets, ngram_max,
            jvm_sigmoid=(engine == "hybrid"))
    # single array Literal, not CreateArray-of-1024-children (see
    # fuzzy_decon_stream's bench_lit note) — same doubles, same fold
    arr = F.lit([float(w_rows.get(b, 0.0)) for b in range(n_buckets)])
    t = F.col(text)
    toks = tokens(t)

    def grams_n(n: int):
        full = F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[
                F.element_at(toks, i + F.lit(j + 1)) for j in range(n)
            ]),
        )
        partial = F.array(F.concat_ws(" ", toks))
        return F.when(F.size(toks) >= n, full).otherwise(partial)

    grams = grams_n(1)
    for n in range(2, ngram_max + 1):
        grams = F.concat(grams, grams_n(n))
    terms = F.transform(
        grams,
        lambda g: F.element_at(
            arr, (F.pmod(_hash32(g), F.lit(n_buckets)) + 1).cast("int")
        ),
    )
    n_feats = F.size(grams).cast("long")
    logit = F.lit(float(bias)) + F.aggregate(
        terms, F.lit(0.0), lambda acc, x: acc + x
    ) / n_feats
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    # explicit NULL-out: concat_ws('') on a NULL token array would
    # silently score NULL text as the empty document otherwise
    null_t = t.isNull()
    return stream.withColumn(
        "n_feats", F.when(null_t, F.lit(None)).otherwise(n_feats)
    ).withColumn(
        "prob", F.when(null_t, F.lit(None)).otherwise(F.round(prob, 6))
    )


# --- Arrow-batched replicas of the stream gates -------------------------
#
# The expression gates above are built from higher-order-function
# lambdas, which never enter whole-stage codegen (scale lesson 1,
# SCALING.md): every shingle hash and weight lookup runs interpreted.
# These replicas compute the SAME md5-based pipeline per Arrow batch in
# C-speed hashlib/str machinery. Band keys (and so decon row sets) are
# bit-identical; classifier probabilities agree to float-ulp (the one
# divergence risk is libm-vs-JVM exp in the final sigmoid — why the
# expression form remains the oracle default).


def _np_shingles(ws: list, n: int) -> list:
    """Python replica of ``functions.text.word_shingles`` on a token
    list: space-joined n-grams with the short-document fallback (fewer
    than n words -> the whole token list as one shingle)."""
    m = len(ws) - n
    if m < 0:
        m = 0
    return [" ".join(ws[i:i + n]) for i in range(m + 1)]


def _np_band_keys(t, num_perm: int, bands: int, shingle_n: int) -> list:
    """Replica of minhash_signature + minhash_bands + the "band|hash"
    key concat for one document (md5 on both sides -> identical keys)."""
    import hashlib

    from ncbi_analysis_spark.functions.text import _java_tokens

    sh = _np_shingles(_java_tokens(t), shingle_n)
    r = num_perm // bands
    sig = [
        min(hashlib.md5(f"{i}|{x}".encode()).hexdigest() for x in sh)
        for i in range(num_perm)
    ]
    return [
        f"{b}|" + hashlib.md5(",".join(sig[b * r:b * r + r]).encode()).hexdigest()
        for b in range(bands)
    ]


def _resolve_gate_engine(
    df: DataFrame, engine: str, max_expr_rows: int = 1000
) -> str:
    """Physical-form routing for the stream gates — the streaming twin
    of ``repetition_metrics``'s ``engine='auto'`` posture.

    ``'expr'``/``'np'``/``'hybrid'`` pass through. ``'auto'``: a
    STREAMING input is by definition unbounded, so it takes the Arrow
    hybrid replica (the production-ingest default — the expression
    gates' HOF lambdas are CodegenFallback and ~6x slower, SCALING.md
    round-9/10 A/B); a BATCH input (a gate reused on a static corpus)
    gets the same bounded ``limit().count()`` probe as
    repetition_metrics — expr up to ``max_expr_rows`` so tiny inputs
    skip the Python-worker round-trip, hybrid past it.

    ``'hybrid'`` (r15, the gates' default) does the md5 shingle/band
    hashing and the feature-order weight fold in Arrow-batched C-speed
    Python — bit-identical band keys and logit doubles (same IEEE add
    order as the expression fold) — and leaves ONLY the sigmoid
    (``exp``) to a JVM Column expression on the logit. That closes the
    one documented expr-vs-np divergence (libm-vs-JVM ``exp`` in the
    6th decimal): hybrid output is bit-equal to the expr form, so the
    oracled ``stream_*`` queries keep their hashes while the
    interpreted-HOF cost goes away (the r15 optimization measurement).
    ``'np'`` (all-Python, libm sigmoid) remains for posture parity."""
    if engine in ("expr", "np", "hybrid"):
        return engine
    if engine != "auto":
        raise ValueError(f"unknown gate engine: {engine!r}")
    if df.isStreaming:
        return "hybrid"
    return (
        "expr"
        if df.limit(max_expr_rows + 1).count() <= max_expr_rows
        else "hybrid"
    )


def _fuzzy_decon_stream_np(
    stream: DataFrame,
    bench_keys: frozenset,
    text: str,
    num_perm: int,
    bands: int,
    shingle_n: int,
    keep: str,
) -> DataFrame:
    schema = stream.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = []
            for t in pdf[text]:
                hit = t is not None and any(
                    k in bench_keys
                    for k in _np_band_keys(t, num_perm, bands, shingle_n)
                )
                mask.append(hit if keep == "flagged" else not hit)
            yield pdf[pd.Series(mask, index=pdf.index)]

    return stream.mapInPandas(gen, schema)


def _np_grams(ws: list, n: int) -> list:
    """Replica of quality_score_stream's exact-n gram builder with the
    partial-shingle fallback (``_dsir_features`` semantics)."""
    if len(ws) >= n:
        return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
    return [" ".join(ws)]


def _quality_score_stream_np(
    stream: DataFrame,
    w: list,
    bias: float,
    text: str,
    n_buckets: int,
    ngram_max: int,
    jvm_sigmoid: bool = False,
) -> DataFrame:
    """Arrow-batched scoring replica. ``jvm_sigmoid=False`` is the
    all-Python ``'np'`` form (libm ``exp``). ``jvm_sigmoid=True`` is
    the ``'hybrid'`` form: Python emits the logit double (bit-identical
    to the expression fold — same md5 buckets, same IEEE add order,
    same ``bias + total / n`` shape) and the sigmoid+round runs as the
    SAME JVM Column expression the expr gate uses, so hybrid ``prob``
    bits equal expr ``prob`` bits (the oracle contract)."""
    import math

    val_name = "__logit" if jvm_sigmoid else "prob"
    schema = T.StructType(
        list(stream.schema.fields)
        + [T.StructField("n_feats", T.LongType()),
           T.StructField(val_name, T.DoubleType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from ncbi_analysis_spark.functions.text import _java_tokens

        for pdf in batches:
            n_feats, vals = [], []
            for t in pdf[text]:
                if t is None:
                    n_feats.append(None)
                    vals.append(None)
                    continue
                ws = _java_tokens(t)
                grams: list = []
                for n in range(1, ngram_max + 1):
                    grams.extend(_np_grams(ws, n))
                # same feature-order left fold as the expression form
                total = 0.0
                for g in grams:
                    b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
                    total = total + w[b]
                logit = bias + total / len(grams)
                n_feats.append(len(grams))
                vals.append(logit if jvm_sigmoid
                            else round(1.0 / (1.0 + math.exp(-logit)), 6))
            out = pdf.copy()
            out["n_feats"] = pd.Series(n_feats, index=pdf.index, dtype="object")
            out[val_name] = pd.Series(vals, index=pdf.index, dtype="object")
            yield out

    mapped = stream.mapInPandas(gen, schema)
    if not jvm_sigmoid:
        return mapped
    lg = F.col("__logit")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-lg))
    return mapped.withColumn(
        "prob", F.when(lg.isNull(), F.lit(None).cast("double"))
                 .otherwise(F.round(prob, 6))
    ).drop("__logit")


def curation_stream(
    stream: DataFrame,
    bench_df: DataFrame,
    weights: DataFrame,
    bias: float,
    text: str = "text",
    min_prob: float = 0.5,
    num_perm: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    n_buckets: int = 1024,
    ngram_max: int = 2,
    engine: str = "hybrid",
) -> DataFrame:
    """End-to-end streaming curation — the streaming twin of
    ``curation_v3``'s decon+quality prefix, composed as ONE stateless
    transformation so it runs under any trigger with zero state store:

      fuzzy decontamination (``fuzzy_decon_stream``: drop documents
      MinHash-LSH-band-colliding with the held-out benchmark, in
      flight) → trained-quality scoring (``quality_score_stream``: the
      batch-trained classifier's broadcast weight vector, sigmoid per
      row) → quality gate (keep rounded prob ≥ ``min_prob``; NULL-text
      rows score NULL and are dropped by the gate, matching the batch
      pipeline's posture).

    Both models are fit IN BATCH (benchmark band keys; classifier
    weights) and enter the stream as broadcast literals — the
    train-offline / score-in-flight split every production ingest gate
    uses. Pipe the result into ``stream_to_parquet`` for the durable,
    exactly-once, restartable form (``run_curation_job``).

    Scale: pure per-row expressions end to end — no shuffle, no state;
    parallelism comes from the source layout (one task per file — see
    the many-file staging note on the r8 stream gate queries).
    """
    # resolve once here (one probe on batch inputs, not one per gate)
    engine = _resolve_gate_engine(stream, engine)
    deconned = fuzzy_decon_stream(
        stream, bench_df, text, num_perm=num_perm, bands=bands,
        shingle_n=shingle_n, keep="clean", engine=engine,
    )
    scored = quality_score_stream(
        deconned, weights, bias, text, n_buckets=n_buckets,
        ngram_max=ngram_max, engine=engine,
    )
    return scored.filter(F.col("prob") >= min_prob)


def run_curation_job(
    spark: SparkSession,
    source_path: str,
    schema,
    bench_df: DataFrame,
    weights: DataFrame,
    bias: float,
    out_path: str,
    checkpoint: str,
    text: str = "text",
    min_prob: float = 0.5,
    timeout_s: int = 300,
    engine: str = "auto",
    **curation_kwargs,
) -> None:
    """One restartable streaming-curation job: parquet file source →
    ``curation_stream`` → ``stream_to_parquet`` (availableNow). The
    checkpoint carries exactly-once across restarts — a re-run over the
    same source+checkpoint commits nothing new; files that arrive
    between runs are curated exactly once (the
    ``stream_to_parquet`` restart contract, asserted in
    tests/test_streaming.py's curation restart test).

    ``engine`` is a FIRST-CLASS parameter here (not a buried kwarg
    default — the r10 advice): the production entry point defaults to
    ``'auto'`` (streaming input → the Arrow hybrid fast path: md5/fold
    in C-speed Python, sigmoid as a JVM expression, so probabilities
    are bit-equal to the ``'expr'`` form — r15); ``'np'`` keeps the
    all-Python replica (libm sigmoid, 6th-decimal drift)."""
    stream = spark.readStream.schema(schema).parquet(source_path)
    curated = curation_stream(
        stream, bench_df, weights, bias, text=text, min_prob=min_prob,
        engine=engine, **curation_kwargs,
    )
    stream_to_parquet(curated, out_path, checkpoint, timeout_s=timeout_s)


def _run_snapshot_publisher(
    stream_df: DataFrame,
    publish_fn,
    checkpoint: str,
    available_now: bool,
    timeout_s: int,
    what: str,
):
    """Shared drain logic of the snapshot-publisher family (HLL / CM /
    quantile / KMV): foreachBatch + checkpoint, availableNow with the
    stream_to_parquet timeout contract (partial drains raise; a retry
    is exactly-once safe because the checkpoint resumes after the last
    committed batch and each batch overwrites its own directory)."""
    w = (
        stream_df.writeStream.foreachBatch(publish_fn)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        q = w.trigger(availableNow=True).start()
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"{what} drain overran {timeout_s}s and was stopped "
                f"mid-batch; the checkpoint at {checkpoint!r} makes a "
                "retry exactly-once safe"
            )
        return None
    return w.start()


def _snapshot_batch_dirs(spark, out_root: str) -> list[str]:
    from ncbi_analysis_spark.sources import fsutil

    root = out_root.rstrip("/")
    batches = [d for d in fsutil.list_subdirs(spark, root)
               if d.startswith("batch=")]
    if not batches:
        raise ValueError(
            f"{out_root!r} has no published batch=* snapshots"
        )
    return [f"{root}/{b}" for b in batches]


def _compact_snapshots(spark, out_root: str, read_fn,
                       write_fn) -> None:
    """Shared snapshot-directory compaction: replace all ``batch=*``
    dirs with ONE merged snapshot at ``batch=0`` — the pressure valve
    for a long-running stream's linear directory growth (the
    read-side multi-path scan already avoids deep plans; this reclaims
    the listing/open cost itself). MAINTENANCE op by contract: run it
    between drains (the availableNow publisher model), not against a
    live continuous query.

    Crash-safe swap protocol: (1) write the merged snapshot to a
    hidden tmp dir; (2) retire every ``batch=*`` dir to a hidden
    ``_retired_*`` name; (3) rename tmp → ``batch=0``; (4) delete the
    retired dirs. Snapshot names are unique (ids only grow), so
    recovery needs no phase marker: a surviving tmp means (3) never
    happened — the retired dirs are RESTORED (their names are free),
    the stale tmp dropped, and the compaction redone from the complete
    visible set (which also folds in any batches published since the
    crash); retired dirs WITHOUT a tmp mean (3) completed — the merged
    ``batch=0`` already contains them, so they are just cleaned up.
    Mid-crash reads fail LOUDLY ("no published batch=*"), never
    silently partial."""
    from ncbi_analysis_spark.sources import fsutil

    root = out_root.rstrip("/")
    tmp = root + "/_compact_tmp"
    retired = [d for d in fsutil.list_children(spark, root)
               if d.startswith("_retired_")]
    if fsutil.exists(spark, tmp):
        # crashed before the tmp -> batch=0 rename: restore and redo
        for d in retired:
            fsutil.rename(spark, f"{root}/{d}",
                          f"{root}/{d[len('_retired_'):]}")
        fsutil.delete(spark, tmp)
    elif retired:
        # crashed after the rename: merged batch=0 is live; clean up
        for d in retired:
            fsutil.delete(spark, f"{root}/{d}")
    batches = [d for d in fsutil.list_subdirs(spark, root)
               if d.startswith("batch=")]
    if not batches:
        raise ValueError(
            f"{out_root!r} has no batch=* snapshots — nothing to compact"
        )
    write_fn(read_fn(), tmp)
    for b in batches:
        fsutil.rename(spark, f"{root}/{b}", f"{root}/_retired_{b}")
    fsutil.rename(spark, tmp, root + "/batch=0")
    for d in fsutil.list_subdirs(spark, root):
        if d.startswith("_retired_"):
            fsutil.delete(spark, f"{root}/{d}")


def compact_hll_snapshots(spark, out_root: str, p: int = 8,
                          group_by: list[str] | None = None) -> None:
    """Fold a ``publish_hll_snapshots`` directory to one merged
    snapshot (see ``_compact_snapshots``). Reads before and after are
    identical — HLL merge is associative and idempotent, so folding the
    published set is exactly a re-batching."""
    from ncbi_analysis_spark.operators.sketches import write_hll_sketch

    _compact_snapshots(
        spark, out_root,
        lambda: read_hll_snapshots(spark, out_root, p=p,
                                   group_by=group_by),
        lambda df, path: write_hll_sketch(df, path, p=p,
                                          group_by=group_by))


def compact_cm_snapshots(spark, out_root: str, width: int = 1024,
                         depth: int = 4) -> None:
    """Fold a ``publish_cm_snapshots`` directory to one merged
    snapshot. CM merge is add — folding the published set once is
    exactly a re-batching (the swap protocol guarantees each batch
    contributes exactly once)."""
    from ncbi_analysis_spark.operators.heavy_hitters import write_cm_sketch

    _compact_snapshots(
        spark, out_root,
        lambda: read_cm_snapshots(spark, out_root, width=width,
                                  depth=depth),
        lambda df, path: write_cm_sketch(df, path, width=width,
                                         depth=depth))


def compact_quantile_snapshots(spark, out_root: str, k: int = 4096,
                               group_by: list[str] | None = None) -> None:
    """Fold a ``publish_quantile_snapshots`` directory to one merged
    snapshot (the min-k cut of the union — the merged sketch IS the
    sketch of everything published)."""
    from ncbi_analysis_spark.operators.sketches import (
        write_quantile_sketch,
    )

    _compact_snapshots(
        spark, out_root,
        lambda: read_quantile_snapshots(spark, out_root, k=k,
                                        group_by=group_by),
        lambda df, path: write_quantile_sketch(df, path, k=k,
                                               group_by=group_by))


def compact_kmv_snapshots(spark, out_root: str, k: int = 256,
                          group_by: list[str] | None = None) -> None:
    """Fold a ``publish_kmv_snapshots`` directory to one merged
    snapshot."""
    from ncbi_analysis_spark.operators.sketches import write_kmv_sketch

    _compact_snapshots(
        spark, out_root,
        lambda: read_kmv_snapshots(spark, out_root, k=k,
                                   group_by=group_by),
        lambda df, path: write_kmv_sketch(df, path, k=k,
                                          group_by=group_by))


def publish_quantile_snapshots(
    stream_df: DataFrame,
    value_col: str,
    id_col: str,
    out_root: str,
    checkpoint: str,
    k: int = 4096,
    group_by: list[str] | None = None,
    available_now: bool = True,
    timeout_s: int = 300,
):
    """Streaming QUANTILE state publisher (the publish_hll_snapshots
    posture for order statistics): each micro-batch's bottom-k value
    sample (``operators.sketches.quantile_sketch`` over just that
    batch, <= k rows per group) lands as a versioned marker-guarded
    snapshot at ``{out_root}/batch={id}``. ``read_quantile_snapshots``
    folds them by min-k over the union — exactly the sketch of
    everything that ever flowed through (ids unique across batches by
    the append contract), so a streaming pipeline gets corpus-lifetime
    quantile gates (p50/p90/p99 thresholds) from bounded artifacts.

    Re-delivery safety is the CM posture, not the HLL one: the merge is
    min-k over a row MULTISET, so a duplicated snapshot could seat the
    same sample row twice — the checkpoint plus per-batch overwrite
    (write_quantile_sketch is mode=overwrite) is what prevents
    double-publication, not merge idempotence."""
    from ncbi_analysis_spark.operators.sketches import (
        quantile_sketch,
        write_quantile_sketch,
    )

    def _publish(batch_df, batch_id: int) -> None:
        s = quantile_sketch(batch_df, value_col, id_col, k=k,
                            group_by=group_by)
        write_quantile_sketch(
            s, f"{out_root.rstrip('/')}/batch={batch_id}",
            k=k, group_by=group_by,
        )

    return _run_snapshot_publisher(
        stream_df, _publish, checkpoint, available_now, timeout_s,
        "publish_quantile_snapshots",
    )


def read_quantile_snapshots(
    spark,
    out_root: str,
    k: int = 4096,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Open a ``publish_quantile_snapshots`` directory as ONE merged
    sketch: validate every snapshot's (k, grouping) marker driver-side,
    scan all batch directories in a single multi-path read, and cut the
    k smallest by the (h, v) total order — feed to
    ``quantile_sketch_estimate`` / ``quantile_sketch_threshold``."""
    from ncbi_analysis_spark.operators.sketches import _sketch_marker_io
    from ncbi_analysis_spark.operators.topk import topk_per_group

    dirs = _snapshot_batch_dirs(spark, out_root)
    params = {"kind": "quantile_bottomk", "k": k,
              "group_by": list(group_by or [])}
    for d in dirs:
        _sketch_marker_io(spark, d, params, write=False)
    merged = spark.read.parquet(*dirs)
    gb = list(group_by or [])
    if gb:
        return topk_per_group(merged, gb, [F.col("h"), F.col("v")], k,
                              keep_rank=False)
    return merged.orderBy("h", "v").limit(k)


def publish_kmv_snapshots(
    stream_df: DataFrame,
    col: str,
    out_root: str,
    checkpoint: str,
    k: int = 256,
    group_by: list[str] | None = None,
    available_now: bool = True,
    timeout_s: int = 300,
):
    """Streaming KMV (distinct-value sample) publisher — per-batch
    ``operators.sketches.kmv_sketch`` snapshots, versioned and
    marker-guarded. Like HLL (and unlike CM/quantile), the merge is
    idempotent (min-k over hash SETS), so even a duplicated snapshot
    directory would be absorbed by the read-side fold; checkpoint +
    overwrite still keep the directory tidy. Feed the merged sketch to
    ``kmv_estimate`` / ``kmv_overlap`` / ``kmv_crawl_diff`` for
    streaming distinct counts, content overlap, and crawl ledgers."""
    from ncbi_analysis_spark.operators.sketches import (
        kmv_sketch,
        write_kmv_sketch,
    )

    def _publish(batch_df, batch_id: int) -> None:
        s = kmv_sketch(batch_df, col, k=k, group_by=group_by)
        write_kmv_sketch(
            s, f"{out_root.rstrip('/')}/batch={batch_id}",
            k=k, group_by=group_by,
        )

    return _run_snapshot_publisher(
        stream_df, _publish, checkpoint, available_now, timeout_s,
        "publish_kmv_snapshots",
    )


def read_kmv_snapshots(
    spark,
    out_root: str,
    k: int = 256,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Open a ``publish_kmv_snapshots`` directory as ONE merged sketch:
    marker-validated multi-path read, distinct hashes, k smallest per
    group (kmv_merge's fold generalized to N snapshots)."""
    from ncbi_analysis_spark.operators.sketches import _sketch_marker_io
    from ncbi_analysis_spark.operators.topk import topk_per_group

    dirs = _snapshot_batch_dirs(spark, out_root)
    params = {"kind": "kmv", "k": k, "group_by": list(group_by or [])}
    for d in dirs:
        _sketch_marker_io(spark, d, params, write=False)
    gb = list(group_by or [])
    u = spark.read.parquet(*dirs).select(*gb, "h").distinct()
    if gb:
        return topk_per_group(u, gb, [F.col("h")], k, keep_rank=False)
    return u.orderBy("h").limit(k)


def publish_hll_snapshots(
    stream_df: DataFrame,
    col: str,
    out_root: str,
    checkpoint: str,
    p: int = 8,
    group_by: list[str] | None = None,
    available_now: bool = True,
    timeout_s: int = 300,
):
    """Streaming sketch PUBLISHER: a ``foreachBatch`` job that turns an
    unbounded stream into versioned, marker-guarded HLL snapshot
    artifacts — the streaming producer side of the
    ``hll_merge_snapshots`` consumption contract.

    Each micro-batch's register table (``operators.sketches.
    hll_registers`` over just that batch — bounded at
    n_groups * 2^p rows) is published to ``{out_root}/batch={id}`` via
    ``write_hll_sketch``, parameter marker included. Because HLL merge
    is associative/commutative/IDEMPOTENT (register-wise max), the
    union of all published snapshots merged by ``read_hll_snapshots``
    equals the sketch of everything that ever flowed through —
    regardless of how the stream was batched.

    Restart idempotency (the ``stream_to_parquet`` contract, by a
    different mechanism): the checkpoint resumes AFTER the last
    committed batch, and a batch re-delivered after a mid-publish crash
    OVERWRITES its own ``batch={id}`` directory (write_hll_sketch is
    mode=overwrite), so re-publication cannot double-count — and even
    a duplicated batch directory would be absorbed by the merge's
    idempotence. ``available_now`` + timeout semantics match
    ``stream_to_parquet`` (partial drains raise; retry is safe).
    """
    from ncbi_analysis_spark.operators.sketches import (
        hll_registers,
        write_hll_sketch,
    )

    def _publish(batch_df, batch_id: int) -> None:
        regs = hll_registers(batch_df, col, p=p, group_by=group_by)
        write_hll_sketch(
            regs, f"{out_root.rstrip('/')}/batch={batch_id}",
            p=p, group_by=group_by,
        )

    return _run_snapshot_publisher(
        stream_df, _publish, checkpoint, available_now, timeout_s,
        "publish_hll_snapshots",
    )


def publish_cm_snapshots(
    stream_df: DataFrame,
    col: str,
    out_root: str,
    checkpoint: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
    available_now: bool = True,
    timeout_s: int = 300,
):
    """Streaming **heavy-hitter** state publisher: the
    ``publish_hll_snapshots`` posture for Count-Min registers — each
    micro-batch's register table (``operators.heavy_hitters.cm_sketch``
    over just that batch, bounded at depth×width rows) lands as a
    versioned, marker-guarded snapshot at ``{out_root}/batch={id}``.
    ``read_cm_snapshots`` merges them by elementwise add into exactly
    the sketch of everything that ever flowed through, regardless of
    batching (integer + is associative/commutative) — the streaming
    frequency tracking the batch tier's ``cm_sketch``/``cm_estimate``
    pairing was missing.

    Restart idempotency differs from the HLL publisher in one
    load-bearing way: CM merge is ADD, **not idempotent**, so a
    duplicated snapshot would double-count. Safety comes from the
    checkpoint (resume AFTER the last committed batch) plus
    ``write_cm_sketch``'s overwrite mode — a batch re-delivered after a
    mid-publish crash REPLACES its own ``batch={id}`` directory rather
    than adding to it. ``available_now``/timeout semantics match
    ``stream_to_parquet`` (partial drains raise; retry is safe)."""
    from ncbi_analysis_spark.operators.heavy_hitters import (
        cm_sketch,
        write_cm_sketch,
    )

    def _publish(batch_df, batch_id: int) -> None:
        regs = cm_sketch(batch_df, col, width=width, depth=depth,
                         weight_col=weight_col)
        write_cm_sketch(
            regs, f"{out_root.rstrip('/')}/batch={batch_id}",
            width=width, depth=depth,
        )

    return _run_snapshot_publisher(
        stream_df, _publish, checkpoint, available_now, timeout_s,
        "publish_cm_snapshots",
    )


def read_cm_snapshots(
    spark,
    out_root: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Open a ``publish_cm_snapshots`` directory as ONE merged register
    table: validate every snapshot's (width, depth) marker driver-side,
    scan all batch directories in a single multi-path parquet read (the
    ``read_hll_snapshots`` no-deep-union posture), and fold by
    elementwise integer add. Feed to ``cm_estimate`` for streaming
    point-frequency estimates, or ``cm_merge`` with batch-built
    sketches of older corpora."""
    from ncbi_analysis_spark.operators.sketches import _sketch_marker_io

    dirs = _snapshot_batch_dirs(spark, out_root)
    params = {"kind": "cm", "width": width, "depth": depth}
    for d in dirs:
        _sketch_marker_io(spark, d, params, write=False)
    merged = spark.read.parquet(*dirs)
    return (
        merged.groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def read_hll_snapshots(
    spark,
    out_root: str,
    p: int = 8,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Open a ``publish_hll_snapshots`` directory as ONE merged
    register table: validate every snapshot's parameter marker (a
    cross-parameter merge must fail loudly, the read_hll_sketch
    contract), union the per-batch registers, and merge by register-
    wise max (``hll_rollup`` keyed on the full grouping). Feed to
    ``hll_estimate`` for the corpus-lifetime cardinality readout, or
    ``hll_merge`` with other published sketches.

    Every snapshot's marker is validated driver-side (tiny JSON reads),
    then ALL batch directories are scanned in ONE multi-path parquet
    read — a long-running stream publishes thousands of micro-batch
    snapshots, and a per-batch union loop would build a linearly deep
    plan (driver analysis blowup). Each register table is
    n_groups×2^p-bounded, so even a many-thousand-snapshot union is a
    modest scan before the rollup's register-wise max."""
    from ncbi_analysis_spark.operators.sketches import (
        _sketch_marker_io,
        hll_rollup,
    )

    dirs = _snapshot_batch_dirs(spark, out_root)
    params = {"kind": "hll", "p": p, "group_by": list(group_by or [])}
    for d in dirs:
        _sketch_marker_io(spark, d, params, write=False)
    merged = spark.read.parquet(*dirs)
    return hll_rollup(merged, list(group_by or []))


def stream_index_decon(
    stream_df: DataFrame,
    index_path: str,
    out_root: str,
    checkpoint: str,
    text: str = "text",
    id_col: str = "doc_id",
    keep: str = "clean",
    available_now: bool = True,
    timeout_s: int = 300,
):
    """Streaming dedup/decon gate against a PERSISTED LSH index — the
    index-backed big brother of ``fuzzy_decon_stream``: that gate
    collects the reference side to a driver literal (hard-capped at
    ``max_bench_bands`` because a literal probe set stops making sense
    past ~10^5 keys); this one joins each micro-batch against a
    ``write_lsh_index`` directory of ANY size — the full ingested
    corpus, billions of band rows — so a crawl stream deduplicates
    against all of history, not just a benchmark suite.

    Each micro-batch runs as a bounded BATCH job (``foreachBatch``):
    the batch's band rows broadcast into the index join
    (``lsh_index_collisions`` — the corpus-sized index is never
    shuffled), colliding documents are dropped (``keep='clean'``) or
    emitted alone (``keep='flagged'``, the audit stream), and survivors
    land in ``{out_root}/batch={id}``. The index is read through
    ``read_lsh_index`` EVERY batch, so tombstones written by
    ``delete_from_lsh_index`` mid-stream (takedowns) take effect from
    the next micro-batch without restarting the query, and index
    parameters come from the directory's own marker (a probe can't
    drift from its index).

    Per-row verdicts depend only on the index — no cross-batch state —
    so the gated OUTPUT is batching-invariant, and restart is
    exactly-once: the checkpoint resumes after the last committed
    batch, a re-delivered batch overwrites its own directory. The
    standing crawl-ingest loop closes OUTSIDE the drain:
    ``append_to_lsh_index(read_gated_docs(...))`` after the stream
    stops, so the next drain deduplicates against this one (appending
    inside foreachBatch would make batch N's verdicts depend on the
    replay-vs-first-run history of batch N-1 — at-least-once, not
    exactly-once; the drain-then-append loop keeps every artifact
    exact).

    Read the gate's output back with ``read_gated_docs``.
    """
    from ncbi_analysis_spark.operators import dedup as dd

    if keep not in ("clean", "flagged"):
        raise ValueError(f"keep must be 'clean' or 'flagged', got {keep!r}")
    spark = stream_df.sparkSession
    # fail fast (and once) on a missing/foreign directory; the per-batch
    # reads below revalidate nothing but tombstones, which CAN change
    params = dd.read_lsh_params(spark, index_path)
    root = out_root.rstrip("/")
    how = "left_semi" if keep == "flagged" else "left_anti"

    def _gate(batch_df, batch_id: int) -> None:
        idx = dd.read_lsh_index(batch_df.sparkSession, index_path)
        hit_ids = (
            dd.lsh_index_collisions(batch_df, idx, text, id_col, **params)
            .select(id_col).distinct()
        )
        kept = batch_df.join(F.broadcast(hit_ids), id_col, how)
        kept.write.mode("overwrite").parquet(f"{root}/batch={batch_id}")

    return _run_snapshot_publisher(
        stream_df, _gate, checkpoint, available_now, timeout_s,
        "stream_index_decon",
    )


def read_gated_docs(spark, out_root: str) -> DataFrame:
    """Open a ``stream_index_decon`` output directory as one DataFrame:
    every ``batch=*`` directory in a single multi-path scan (no
    per-batch union loop — the ``read_hll_snapshots`` plan-depth
    lesson). Raises if the gate never committed a batch."""
    return spark.read.parquet(*_snapshot_batch_dirs(spark, out_root))


def stream_ivf_decon(
    stream_df: DataFrame,
    index_path: str,
    centroids: DataFrame,
    out_root: str,
    checkpoint: str,
    vec: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    nprobe: int = 2,
    keep: str = "clean",
    available_now: bool = True,
    timeout_s: int = 300,
):
    """Streaming EMBEDDING near-dup gate against a persisted IVF index
    — the vector twin of ``stream_index_decon``: drop (``keep='clean'``)
    or emit alone (``keep='flagged'``) stream rows whose best
    IVF-probed cosine against the indexed corpus reaches ``threshold``.
    Each micro-batch runs as a bounded batch job: the batch's probe set
    broadcasts into the bucket join and only the probed c_id partition
    directories are read (``ivf_topk(assigned=..., prefilter_
    partitions=True)``), so per-batch cost scales with
    batch × nprobe/k_centroids of the index, whatever its total size.

    The quantizer is validated against the index's digest marker ONCE
    up front (drifted centroids would probe buckets the data was not
    bucketed by — that fails loudly here instead of silently missing),
    and the index is re-read through the LIVE view every batch, so
    mid-stream tombstones take effect at the next micro-batch. Verdicts
    depend only on the (fixed) index → batching-invariant; per-batch
    directory overwrite → exactly-once on restart. Cosines compare at
    the family's 6dp round, so the threshold cut is deterministic.
    Read the output back with ``read_gated_docs``."""
    from ncbi_analysis_spark.operators import similarity_search as ss
    from ncbi_analysis_spark.operators.similarity_search import (
        _ivf_params_guard,
    )

    if keep not in ("clean", "flagged"):
        raise ValueError(f"keep must be 'clean' or 'flagged', got {keep!r}")
    spark = stream_df.sparkSession
    _ivf_params_guard(spark, index_path, centroids, vec, "c_id",
                      write=False)
    root = out_root.rstrip("/")
    how = "left_semi" if keep == "flagged" else "left_anti"

    def _gate(batch_df, batch_id: int) -> None:
        # id_col names the id column in BOTH the stream batch and the
        # index (rename the stream side upstream if they differ) — an
        # index built with a non-default id column must see it here,
        # or the tombstone anti-join/select fails on 'vec_id'
        idx = ss.read_ivf_index(batch_df.sparkSession, index_path,
                                id_col=id_col)
        q = batch_df.select(F.col(id_col).alias("__q_id"),
                            F.col(vec).alias(vec))
        best = ss.ivf_topk(idx, q, centroids, vec=vec, id_col=id_col,
                           q_id="__q_id", k=1, nprobe=nprobe,
                           assigned=idx, prefilter_partitions=True)
        hit_ids = (
            best.filter(F.col("cos_sim") >= threshold)
            .select(F.col("__q_id").alias(id_col)).distinct()
        )
        kept = batch_df.join(F.broadcast(hit_ids), id_col, how)
        kept.write.mode("overwrite").parquet(f"{root}/batch={batch_id}")

    return _run_snapshot_publisher(
        stream_df, _gate, checkpoint, available_now, timeout_s,
        "stream_ivf_decon",
    )


def stream_semdedup_decon(
    stream_df: DataFrame,
    index_path: str,
    centroids: DataFrame,
    out_root: str,
    checkpoint: str,
    vec: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    keep: str = "clean",
    intra_batch: bool = True,
    max_cluster_rows: int | None = 100_000,
    pair_method: str = "auto",
    available_now: bool = True,
    timeout_s: int = 300,
):
    """Streaming SemDeDup gate (Abbas et al. 2023) against a persisted
    survivor index — the semantic twin of ``stream_ivf_decon``, and the
    streaming boundary of ``dedup.semantic_dedup``. Two legs per
    micro-batch, both under the paper's membership rule (a row is
    compared ONLY within its single nearest-centroid cluster —
    ``nprobe=1``, unlike the recall-oriented multi-probe IVF gate):

    1. **index leg**: rows whose best within-cluster cosine against the
       persisted ``write_ivf_index`` survivor set reaches ``threshold``
       are semantic duplicates of history — dropped (``keep='clean'``)
       or emitted alone (``keep='flagged'``). Only the batch's assigned
       bucket directories are read (``prefilter_partitions=True``); the
       index-side corpus never shuffles.
    2. **batch leg** (``intra_batch=True``): the rows that survive the
       index leg run through ``semantic_dedup`` against the SAME frozen
       quantizer, so two near-identical documents arriving in one
       micro-batch collapse to the paper's keep-the-outlier survivor
       even though neither is indexed yet. ``stream_ivf_decon`` (a
       history-only gate) misses exactly this case. Pass
       ``intra_batch=False`` for history-only verdicts.

    Batching semantics, honestly: the index leg depends only on the
    (fixed) index, but the batch leg makes verdicts GREEDY-PREFIX —
    new-vs-new duplicates are resolved within each micro-batch, and
    across batches only after the standing loop folds survivors back
    (``append_to_ivf_index(read_gated_docs(...), centroids, index_path)``
    after the drain — appending inside ``foreachBatch`` would break
    exactly-once, see ``stream_index_decon``). For a FIXED batching the
    output is deterministic and restart is exactly-once (per-batch
    directory overwrite under the checkpoint); a single-batch drain
    over an empty-history index reproduces batch ``semantic_dedup``'s
    ``keep=True`` set exactly (batch-parity test).

    The quantizer is digest-validated against the index marker once up
    front; the index is re-read per batch, so mid-stream tombstones
    (takedowns) take effect at the next micro-batch. The index-leg cut
    compares at the family's 6dp round (``ivf_topk``); the batch leg
    orders on exact doubles (``semantic_dedup``). ``max_cluster_rows``
    and ``pair_method`` forward to the batch leg (the production cap /
    blocked-BLAS knobs). Read the output back with ``read_gated_docs``.
    """
    from ncbi_analysis_spark.operators import similarity_search as ss
    from ncbi_analysis_spark.operators.dedup import semantic_dedup
    from ncbi_analysis_spark.operators.similarity_search import (
        _ivf_params_guard,
    )

    if keep not in ("clean", "flagged"):
        raise ValueError(f"keep must be 'clean' or 'flagged', got {keep!r}")
    spark = stream_df.sparkSession
    _ivf_params_guard(spark, index_path, centroids, vec, "c_id",
                      write=False)
    root = out_root.rstrip("/")

    def _gate(batch_df, batch_id: int) -> None:
        from ncbi_analysis_spark.operators.components import _fixpoint_conf

        sp = batch_df.sparkSession
        # Scoped no-AQE conf for the WHOLE in-batch plan (the CC
        # fixpoint's _fixpoint_conf pattern, guide §1.4): the batch plan
        # chains many exchanges (ivf_topk join/top-k, anti-join,
        # semantic_dedup's probe/pairs/window) whose shapes never vary
        # batch-to-batch, so AQE's per-exchange re-planning only adds
        # stage-jobs and driver gaps to a latency-sensitive micro-batch
        # (profiled r15: ~50 in-batch jobs, driver gaps > executor
        # time). Every small side below is an explicit F.broadcast, so
        # no dynamic-broadcast decision is lost; the partition count is
        # batch-derived (floored at defaultParallelism), not a local
        # constant. Join/window results are set-identical under either
        # planner; the oracle re-pins that per round.
        n_parts = max(batch_df.rdd.getNumPartitions(),
                      sp.sparkContext.defaultParallelism)
        with _fixpoint_conf(sp, n_parts):
            idx = ss.read_ivf_index(sp, index_path, id_col=id_col)
            q = batch_df.select(F.col(id_col).alias("__q_id"),
                                F.col(vec).alias(vec))
            best = ss.ivf_topk(idx, q, centroids, vec=vec, id_col=id_col,
                               q_id="__q_id", k=1, nprobe=1,
                               assigned=idx, prefilter_partitions=True)
            hit_ids = (
                best.filter(F.col("cos_sim") >= threshold)
                .select(F.col("__q_id").alias(id_col)).distinct()
            )
            survivors = batch_df.join(F.broadcast(hit_ids), id_col,
                                      "left_anti")
            handles: list = []
            if intra_batch:
                lab = semantic_dedup(
                    survivors, vec, id_col, centroids,
                    threshold=threshold, max_cluster_rows=max_cluster_rows,
                    pair_method=pair_method, persist_handle=handles,
                )
                kept_ids = lab.filter(F.col("keep")).select(id_col)
                survivors = survivors.join(F.broadcast(kept_ids), id_col,
                                           "left_semi")
            if keep == "clean":
                out = survivors
            else:
                out = batch_df.join(
                    F.broadcast(survivors.select(id_col)), id_col,
                    "left_anti",
                )
            out.write.mode("overwrite").parquet(f"{root}/batch={batch_id}")
            for h in handles:
                # the write above materialized every consumer of the
                # per-batch cache; release it so a standing stream's
                # disk-tier blocks don't accrete one set per batch
                h.unpersist()

    return _run_snapshot_publisher(
        stream_df, _gate, checkpoint, available_now, timeout_s,
        "stream_semdedup_decon",
    )
