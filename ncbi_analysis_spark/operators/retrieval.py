"""BM25 text retrieval over the document corpus.

A training-data platform needs keyword search over its own corpus —
auditing what the pipeline kept ("show me the docs about X that
survived curation"), building retrieval baselines for RAG evaluations,
and sourcing hard negatives for embedding training. This is the
classic probabilistic ranking (Robertson & Zaragoza 2009; the Lucene
``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf variant, which stays
positive for stopword-frequency terms).

No reference analog (the reference searches sequences by alignment
similarity, src/analysis/gene_similarity_match.py — this is its text
twin); LLM-pipeline extension.

Determinism contract (the repo rule): the per-(doc, term) contribution
is a pinned chain of IEEE ops — ``idf * (tf / (tf + k1 * (1 - b +
b * (dl / avgdl))))`` — with ``idf`` computed ONCE driver-side in
Python from exact integer (N, df) and injected as literals; the
per-doc score folds contributions in TERM order (sorted struct
collect, bounded by |query terms| per doc — the hll_estimate pinning
pattern). Python's ``math.log`` and DuckDB's ``ln`` resolve to the
same platform libm (probed bit-identical across the df grid in
tests), so the oracle recomputes idf independently and still matches
bit-for-bit.

Scale shape: two corpus passes — one map-side token count (doc
lengths), one explode filtered to the |q| query terms BEFORE the
(doc, term) groupBy (the filter prunes the shuffle to matched
occurrences only). The df/N/avgdl model state is |q|+2 scalars
collected driver-side; scoring is a keyed join of the matched-doc tf
rows with doc lengths; top-k is orderBy+limit → TakeOrderedAndProject
(partial top-k per partition, no global sort).
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, Window, functions as F

from ncbi_analysis_spark.functions.text import token_count, tokens

_BM25_PARAMS_FILE = "_BM25_PARAMS.json"


def query_terms(query: str) -> list[str]:
    """The query's distinct terms, sorted — the same whitespace
    tokenization as the corpus side (``functions.text.tokens``),
    mirrored in Python."""
    return sorted({t for t in query.strip().split() if t})


def bm25_topk(
    corpus: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25.

    Output ``(id_col, n_terms_matched, score)`` — ``score`` descending
    with ``id_col`` as tiebreak; only documents matching at least one
    query term appear. NULL-text documents are excluded from the
    corpus statistics (COUNT semantics, the dedup posture).

    This is the from-scratch convenience form: it derives the model
    from the raw corpus on every call and returns EAGERLY (the top-k is
    bounded at ``k`` rows, collected and rebuilt driver-side so the
    intermediate caches are released before return — the
    vocab_drift_report lifecycle). Queries up to
    ``_COLUMNAR_MAX_TERMS`` terms take the COLUMNAR fast path (r14):
    per-term tf as array expressions in ONE corpus text scan, no token
    explode, only the tiny per-doc stats frame persisted — see
    ``_bm25_topk_columnar``. Wider queries fall back to the explode
    form, where ``dl``/``tf`` persist and the corpus is scanned twice.
    For repeated or multi-query search over the same corpus, build the
    index once with ``write_bm25_index`` and use ``bm25_topk_batch``.
    """
    terms = query_terms(query)
    if not terms:
        raise ValueError("bm25_topk: query has no terms")
    spark = corpus.sparkSession
    d = corpus.filter(F.col(text_col).isNotNull())
    if len(terms) <= _COLUMNAR_MAX_TERMS:
        return _bm25_topk_columnar(
            spark, d, terms, k, text_col, id_col, k1, b)
    # corpus pass 1: doc lengths (persisted — reused by the stats agg
    # and the scoring join)
    dl = d.select(
        F.col(id_col), token_count(F.col(text_col)).alias("dl")
    ).persist()

    # corpus pass 2: token explode pruned to the |q| query terms BEFORE
    # the (doc, term) groupBy (persisted — reused by the df collect and
    # the scoring join)
    toks = d.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("g")
    )
    tf = (
        toks.filter(F.col("g").isin(terms))
        .groupBy(id_col, "g")
        .agg(F.count("*").cast("long").alias("tf"))
        .persist()
    )

    try:
        # model state: |q| df rows + 2 scalars — driver-side by design
        df_rows = {
            r["g"]: r["n"]
            for r in tf.groupBy("g")
            .agg(F.count("*").cast("long").alias("n"))
            .collect()
        }
        stats = dl.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("dl").cast("long").alias("s"),
        ).collect()[0]
        n_docs, sum_dl = stats["n"], stats["s"]
        if n_docs == 0:
            raise ValueError("bm25_topk: empty corpus")
        avgdl = float(sum_dl) / float(n_docs)

        # idf in Python from exact integers — injected as literals so
        # both the plan and the oracle share one transcendental
        # evaluation rule
        idf = {
            t: math.log(
                1.0 + (n_docs - df_rows.get(t, 0) + 0.5)
                / (df_rows.get(t, 0) + 0.5)
            )
            for t in terms
        }
        scored = tf.join(dl, id_col).select(
            id_col,
            "g",
            _contrib_expr(idf, k1, b, avgdl).alias("contrib"),
        )
        pairs = F.array_sort(F.collect_list(F.struct("g", "contrib")))
        per_doc = scored.groupBy(id_col).agg(
            F.count("*").cast("long").alias("n_terms_matched"),
            F.aggregate(
                pairs, F.lit(0.0), lambda acc, s: acc + s["contrib"]
            ).alias("score"),
        )
        top = per_doc.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
        schema = top.schema
        rows = top.collect()
    finally:
        tf.unpersist()
        dl.unpersist()
    return spark.createDataFrame(rows, schema).orderBy(
        F.desc("score"), F.asc(id_col)
    )


# Crossover measured at sf0.1 (min-of-3, all-common-word queries so
# every term pays full tf work): columnar/explode = 0.86/1.13 at 4
# terms, 0.95/1.15 at 8, 1.58/1.09 at 16, 2.07/1.26 at 24 — the
# per-term array scans overtake one explode+shuffle between 8 and 16.
_COLUMNAR_MAX_TERMS = 8


def _term_eq(t: str):
    """Single-arg lambda factory for F.filter — NEVER write
    ``lambda x, t=t: ...`` here: Spark passes the ARRAY INDEX as the
    second lambda argument, silently shadowing the closure default."""
    return lambda x: x == F.lit(t)


def _bm25_topk_columnar(spark, d: DataFrame, terms: list[str], k: int,
                        text_col: str, id_col: str,
                        k1: float, b: float) -> DataFrame:
    """Small-query BM25 fast path: per-term tf as array expressions in
    ONE corpus scan — no token explode, no (doc, term) shuffle.

    ``tf_t = size(filter(tokens, x -> x = t))`` per query term turns
    the whole model into a map-side projection: the only things that
    ever move are the per-doc stats frame (id, dl, tf_1..tf_q — tens
    of bytes/row, persisted in place of the raw-token caches) and the
    final top-k. At 100 TB this is the difference between one
    pruned-column text scan and two plus an explode shuffle.

    Float contract is unchanged from the explode path: contributions
    are folded from 0.0 in sorted-term order, and an unmatched term's
    contribution is exactly ``0.0`` (``x + 0.0 == x`` in IEEE for the
    non-negative contributions here), so scores are bit-identical to
    the oracle's ``list_reduce(list_prepend(0.0, list(contrib ORDER
    BY g)))``."""
    import math

    ts = sorted(terms)
    tk = tokens(F.col(text_col))
    per_doc = d.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("dl"),
        *[F.size(F.filter(tk, _term_eq(t))).cast("long").alias(f"__tf{i}")
          for i, t in enumerate(ts)],
    ).persist()
    try:
        stats = per_doc.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("dl").cast("long").alias("s"),
            *[F.count(F.when(F.col(f"__tf{i}") > 0, True))
              .cast("long").alias(f"__df{i}") for i in range(len(ts))],
        ).collect()[0]
        n_docs, sum_dl = stats["n"], stats["s"]
        if n_docs == 0:
            raise ValueError("bm25_topk: empty corpus")
        avgdl = float(sum_dl) / float(n_docs)
        idf = {
            t: math.log(
                1.0 + (n_docs - stats[f"__df{i}"] + 0.5)
                / (stats[f"__df{i}"] + 0.5)
            )
            for i, t in enumerate(ts)
        }
        denom_tail = (
            F.lit(float(k1))
            * (F.lit(1.0 - b)
               + F.lit(float(b))
               * (F.col("dl").cast("double") / F.lit(float(avgdl))))
        )
        score = F.lit(0.0)
        for i, t in enumerate(ts):
            tf_d = F.col(f"__tf{i}").cast("double")
            score = score + F.lit(idf[t]) * (tf_d / (tf_d + denom_tail))
        matched = sum(
            (F.col(f"__tf{i}") > 0).cast("long") for i in range(len(ts))
        )
        any_match = F.greatest(
            *[F.col(f"__tf{i}") > 0 for i in range(len(ts))]
        ) if len(ts) > 1 else (F.col("__tf0") > 0)
        top = (
            per_doc.filter(any_match)
            .select(
                id_col,
                matched.alias("n_terms_matched"),
                score.alias("score"),
            )
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k)
        )
        schema = top.schema
        rows = top.collect()
    finally:
        per_doc.unpersist()
    return spark.createDataFrame(rows, schema).orderBy(
        F.desc("score"), F.asc(id_col)
    )


def _contrib_expr(idf: dict, k1: float, b: float, avgdl: float):
    """The pinned per-(doc, term) BM25 contribution over columns
    ``g`` / ``tf`` / ``dl``: ``idf * (tf / (tf + k1 * (1 - b + b *
    (dl / avgdl))))`` with idf injected as per-term literals."""
    expr = F.lit(None).cast("double")
    for t in sorted(idf):
        expr = F.when(F.col("g") == t, F.lit(idf[t])).otherwise(expr)
    return expr * (
        F.col("tf").cast("double")
        / (
            F.col("tf").cast("double")
            + F.lit(float(k1))
            * (
                F.lit(1.0 - b)
                + F.lit(float(b))
                * (F.col("dl").cast("double") / F.lit(float(avgdl)))
            )
        )
    )


# ---------------------------------------------------------------------------
# Persisted BM25 inverted index + batch-query search
# ---------------------------------------------------------------------------
#
# The at-scale posture (the write_lsh_index / write_ivf_index family):
# tokenize the corpus ONCE into a parquet inverted index, then serve
# every search — including whole query *tables* for hard-negative
# mining — from partition-pruned index reads, never re-scanning raw
# text. Layout under ``path/``:
#
#   postings/   (g, doc_id, tf) partitioned by bucket = pmod(xxhash64(g),
#               n_buckets) — a probe for |q| terms reads only the |q|
#               buckets those terms hash to (partition pruning), not
#               the whole index;
#   doclens/    (doc_id, dl) — the per-doc length table;
#   _BM25_PARAMS.json  parameter marker (n_buckets, tokenizer) via
#               sources/fsutil — appends and probes validate it, so a
#               bucketing-parameter drift fails loudly instead of
#               silently pruning to the wrong partitions. Since r13 it
#               also carries exact corpus stats {n_docs, sum_dl},
#               maintained by write/append/delete (integer arithmetic,
#               no drift; compact re-derives and asserts), so N/avgdl
#               cost zero corpus I/O at query time;
#   _tombstones/  optional delete batches (operators/tombstones.py) —
#               probes anti-join them out until compact_bm25_index
#               folds them in.
#
# Append ≡ rebuild: per-doc postings and doclens rows are independent,
# so any split of the corpus across write/append calls yields the same
# index CONTENTS (asserted by the staged oracle) — provided doc ids are
# unique across batches (the caller's contract, same as the LSH/IVF
# indexes).


def _bm25_marker_read(spark, path: str) -> dict:
    from ncbi_analysis_spark.sources import fsutil

    marker = path.rstrip("/") + "/" + _BM25_PARAMS_FILE
    if not fsutil.exists(spark, marker):
        raise ValueError(
            f"{path!r} is not a write_bm25_index directory (missing "
            f"{_BM25_PARAMS_FILE}); build it with write_bm25_index first"
        )
    return json.loads(fsutil.read_text(spark, marker))


def _bm25_marker_write(spark, path: str, n_buckets: int,
                       stats: dict | None) -> None:
    from ncbi_analysis_spark.sources import fsutil

    payload = {"n_buckets": n_buckets, "tokenizer": "ws"}
    if stats is not None:
        payload["stats"] = stats
    marker = path.rstrip("/") + "/" + _BM25_PARAMS_FILE
    fsutil.write_text(spark, marker, json.dumps(payload))


def _bm25_params_guard(
    spark, path: str, n_buckets: int, write: bool = False
) -> None:
    if write:
        _bm25_marker_write(spark, path, n_buckets, stats=None)
        return
    stored = _bm25_marker_read(spark, path)
    params = {"n_buckets": n_buckets, "tokenizer": "ws"}
    mine = {k: stored.get(k) for k in params}
    if mine != params:
        raise ValueError(
            f"BM25 index at {path!r} was built with {mine}, got "
            f"{params}; term buckets are not comparable across parameter "
            "changes — rebuild the index or match its parameters"
        )


def _doclen_stats(doclens) -> dict:
    """Exact (n_docs, sum_dl) of one doclens frame — integer-exact, so
    the running marker stats never drift from a recompute."""
    row = doclens.agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("s"),
    ).collect()[0]
    return {"n_docs": int(row["n"]), "sum_dl": int(row["s"])}


def _observe_doclen_stats(doclens):
    """(observed_doclens, thunk) — the same exact integers as
    :func:`_doclen_stats`, collected as observe() metrics riding
    whatever ACTION materializes the frame (guide §1/§5: the stats of a
    table being written should not cost a second pass over it — at
    index scale the read-back is a full extra scan of doclens, and at
    any scale it is one extra job). Call the thunk AFTER the action."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = doclens.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("s"),
    )
    return observed, lambda: {"n_docs": int(obs.get["n"]),
                              "sum_dl": int(obs.get["s"])}


def _bm25_index_rows(
    corpus: DataFrame, text_col: str, id_col: str, n_buckets: int
):
    """(postings, doclens) DataFrames for one corpus batch."""
    d = corpus.filter(F.col(text_col).isNotNull())
    doclens = d.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("dl"),
    )
    postings = (
        d.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("g"), F.lit(n_buckets)))
    )
    return postings, doclens


def write_bm25_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Build the persisted BM25 inverted index from scratch: ONE
    tokenize pass over the corpus writes term-bucketed postings and the
    doc-length table, then records the parameter marker."""
    spark = corpus.sparkSession
    postings, doclens = _bm25_index_rows(corpus, text_col, id_col, n_buckets)
    # overwrite first (clears the directory), THEN record the params —
    # a rebuild over a previously-deleted-from path must also drop the
    # old tombstones (the subdirectory writes don't clear the root)
    from ncbi_analysis_spark.operators import tombstones as ts

    ts.clear_tombstones(spark, path)
    # REBALANCE(bucket) before the partitioned write: without it each
    # upstream task writes a file into every bucket directory it
    # touches (tasks × buckets files — measured 500+ per lifecycle at
    # sf0.1); clustered by bucket, file count tracks per-bucket DATA
    # size (AQE coalesces small partitions and still splits a hot
    # bucket across writers at scale), not task count.
    # The two table writes are independent (disjoint subdirs, both
    # derived straight from the corpus) — run them as concurrent jobs
    # (guide §2.6); the marker stats ride the doclens write as
    # observe() metrics instead of a read-back of the written files
    # (one fewer pass over doclens, one fewer job).
    from ncbi_analysis_spark.operators.concurrency import run_jobs

    observed_dl, dl_stats = _observe_doclen_stats(doclens)
    run_jobs(
        lambda: postings.hint("rebalance", F.col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(
            path.rstrip("/") + "/postings"
        ),
        lambda: observed_dl.hint("rebalance")
        .write.mode("overwrite").parquet(path.rstrip("/") + "/doclens"),
    )
    # the marker carries exact corpus stats (N docs, Σ doclen) so batch
    # search never re-aggregates the doclens table per query batch;
    # append/delete maintain them transactionally (data first, marker
    # last — a crash in between is caught by the stats-vs-recompute
    # assert in compact_bm25_index and healed by re-running the write)
    _bm25_marker_write(spark, path, n_buckets, dl_stats())


def read_bm25_index(spark, path: str) -> dict:
    """Open a ``write_bm25_index`` directory for probing. Returns
    ``{"postings": DataFrame, "doclens": DataFrame, "params": dict}``
    (marker validated to exist; parameters come from the marker, not
    the caller)."""
    from ncbi_analysis_spark.operators import tombstones as ts

    params = _bm25_marker_read(spark, path)
    # LIVE views: ids tombstoned by delete_from_bm25_index are
    # anti-joined out of both tables (broadcast small side); marker
    # stats already exclude them, so searches over this dict are
    # exactly searches over a rebuild without the deleted docs
    return {
        "postings": ts.apply_tombstones(
            spark.read.parquet(path.rstrip("/") + "/postings"),
            path, "doc_id"),
        "doclens": ts.apply_tombstones(
            spark.read.parquet(path.rstrip("/") + "/doclens"),
            path, "doc_id"),
        "params": params,
    }


def verify_bm25_index(spark, path: str) -> list[dict]:
    """Integrity audit (fsck) of a ``write_bm25_index`` directory —
    read-only, run after a restore/migration or a suspicious crash
    before trusting searches. Returns ``[{check, ok, detail}, ...]``.
    Checks: every postings bucket within ``[0, n_buckets)`` (out of
    range ⇒ files appended under different parameters despite the
    guard, e.g. hand-copied); every postings doc_id has a doclens row
    (a missing length breaks that doc's score silently — its rows
    drop from the score join); the marker's running ``{n_docs,
    sum_dl}`` equals an exact recompute over the live doclens (a
    mismatch means a crashed append/delete left the marker behind the
    data — searches use subtly wrong idf/avgdl until
    ``compact_bm25_index`` heals it); plus the shared
    maintenance-state legs (swap residue checked in the postings/ and
    doclens/ subdirs where BM25 swaps run). Never repairs."""
    from ncbi_analysis_spark.operators import tombstones as ts

    params = _bm25_marker_read(spark, path)  # raises on non-index dirs
    root = path.rstrip("/")
    # maintenance-state legs FIRST: a half-swapped subdir is exactly
    # when fsck runs, and there the data scans fail loudly by design
    out = ts.shared_integrity_checks(
        spark, path, "doc_id",
        swap_roots=[root + "/postings", root + "/doclens"])
    try:
        # spark.read.parquet inside resolves both scans — a half-swapped
        # subdir raises right here
        idx = read_bm25_index(spark, path)
        postings, doclens = idx["postings"], idx["doclens"]
    except Exception as exc:  # noqa: BLE001 — report, never crash fsck
        out.append({"check": "readable", "ok": False,
                    "detail": str(exc).split("\n")[0][:200]})
        return out
    out.append({"check": "readable", "ok": True, "detail": ""})
    n_buckets = int(params["n_buckets"])
    bad = postings.filter(
        (F.col("bucket") < 0) | (F.col("bucket") >= n_buckets)
    ).count()
    out.append({"check": "bucket_range", "ok": bad == 0,
                "detail": "" if bad == 0 else
                          f"{bad} postings outside [0, {n_buckets})"})
    orphans = (
        postings.select("doc_id").distinct()
        .join(doclens.select("doc_id"), "doc_id", "left_anti").count()
    )
    out.append({
        "check": "postings_have_doclens",
        "ok": orphans == 0,
        "detail": "" if orphans == 0 else
                  f"{orphans} posted doc_id(s) with no doclens row — "
                  "their scores silently vanish from searches",
    })
    stats = params.get("stats")
    if stats is None:
        out.append({"check": "marker_stats", "ok": True,
                    "detail": "pre-r13 stat-less marker (batch search "
                              "falls back to the live aggregate)"})
    else:
        fresh = _doclen_stats(doclens)
        out.append({
            "check": "marker_stats",
            "ok": stats == fresh,
            "detail": ("" if stats == fresh else
                       f"marker {stats} != live recompute {fresh} — "
                       "crashed append/delete; compact_bm25_index heals"),
        })
    return out


def append_to_bm25_index(
    new_df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Incremental index maintenance: tokenize the NEW batch under the
    index's (validated) parameters and parquet-partition-append its
    postings + doclens — per-bucket directories gain files, nothing is
    rewritten, ingest I/O scales with the batch (the
    append_to_lsh_index posture). Returns per-bucket appended posting
    counts (bounded by ``n_buckets``)."""
    from ncbi_analysis_spark.operators import tombstones as ts

    spark = new_df.sparkSession
    _bm25_params_guard(spark, path, n_buckets, write=False)
    postings, doclens = _bm25_index_rows(new_df, text_col, id_col, n_buckets)
    # the lock covers the tombstone check (a concurrent delete landing
    # after the check would silently mask the batch) AND the marker
    # stats read-modify-write (two concurrent appends would lose one
    # delta)
    with ts.maintenance_lock(spark, path, "append_to_bm25_index") as lk:
        tomb = ts.read_tombstones(spark, path)
        if tomb is not None:
            # re-ingesting a tombstoned id would be silently masked by
            # the probe anti-join (and would desync the marker stats
            # from the live view) — refuse; compact first, then append
            n_bad = doclens.join(
                F.broadcast(tomb), "doc_id", "left_semi").count()
            if n_bad:
                raise ValueError(
                    f"append batch contains {n_bad} doc_id(s) tombstoned "
                    f"in {path!r}; run compact_bm25_index first to fold "
                    "the deletes in, then append"
                )
        postings = postings.persist()
        doclens = doclens.persist()
        try:
            lk.assert_owned()  # fence before the parquet-append commit
            # rebalance by bucket: the persisted frame's cached
            # partitioning (not AQE-coalesced) would otherwise fan out
            # cached-partitions × buckets tiny files per append.
            # The two appends hit disjoint subdirs — concurrent jobs
            # (guide §2.6); the batch stats ride the doclens append as
            # observe() metrics (no separate aggregation job)
            from ncbi_analysis_spark.operators.concurrency import run_jobs

            observed_dl, dl_stats = _observe_doclen_stats(doclens)
            run_jobs(
                lambda: postings.hint("rebalance", F.col("bucket"))
                .write.mode("append").partitionBy("bucket").parquet(
                    path.rstrip("/") + "/postings"
                ),
                lambda: observed_dl.hint("rebalance")
                .write.mode("append").parquet(
                    path.rstrip("/") + "/doclens"),
            )
            counts = (
                postings.groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("n_appended"))
                .collect()
            )
            batch = dl_stats()
        finally:
            postings.unpersist()
            doclens.unpersist()
        stored = _bm25_marker_read(spark, path).get("stats")
        if stored is not None:
            _bm25_marker_write(spark, path, n_buckets, {
                "n_docs": stored["n_docs"] + batch["n_docs"],
                "sum_dl": stored["sum_dl"] + batch["sum_dl"],
            })
    return spark.createDataFrame(
        [(int(r["bucket"]), int(r["n_appended"])) for r in counts],
        "bucket long, n_appended long",
    )


def delete_from_bm25_index(ids: DataFrame, path: str,
                           id_col: str = "doc_id") -> int:
    """Remove documents from a persisted BM25 index without rewriting
    it: append the ids to the index's tombstone table
    (``operators/tombstones.py``) and subtract the removed docs'
    (count, Σ doclen) from the marker's corpus stats — so
    ``bm25_topk_batch`` keeps serving the exact scores a rebuild
    without those docs would produce: idf (via live df counts), avgdl,
    and N all move together (staged ``bm25_delete_search`` oracle).

    The removed-stats delta is computed against the CURRENT live view
    (existing tombstones excluded, batch ids distinct-ed), so
    re-deletes and never-indexed ids subtract nothing — idempotent.
    Run ``compact_bm25_index`` periodically; appending previously
    deleted ids is refused until then. Returns the batch's distinct-id
    count."""
    from ncbi_analysis_spark.operators import tombstones as ts

    spark = ids.sparkSession
    _bm25_marker_read(spark, path)  # raises on non-index dirs
    with ts.maintenance_lock(spark, path, "delete_from_bm25_index") as lk:
        # marker read INSIDE the lock: the stats update below is a
        # read-modify-write against it
        stored = _bm25_marker_read(spark, path)
        batch = ids.select(F.col(id_col).alias("doc_id")).distinct() \
                   .persist()
        try:
            live_dl = ts.apply_tombstones(
                spark.read.parquet(path.rstrip("/") + "/doclens"),
                path, "doc_id")
            removed = _doclen_stats(
                live_dl.join(F.broadcast(batch), "doc_id", "left_semi"))
            lk.assert_owned()  # fence before the tombstone-append commit
            n = ts.append_tombstones(batch, path, "doc_id")
        finally:
            batch.unpersist()
        stats = stored.get("stats")
        if stats is not None:
            _bm25_marker_write(spark, path, int(stored["n_buckets"]), {
                "n_docs": stats["n_docs"] - removed["n_docs"],
                "sum_dl": stats["sum_dl"] - removed["sum_dl"],
            })
    ts.warn_if_tombstones_large(spark, path)
    return n


def compact_bm25_index(spark, path: str, files_per_bucket: int = 1) -> None:
    """Fold accumulated tombstones into the postings/doclens files and
    coalesce the small files each ``append_to_bm25_index`` call lands
    (per-bucket file count grows linearly with appends — SCALING.md
    records the curve): rewrite each table's live view into a hidden
    tmp dir, swap, clear the tombstones, and refresh the marker stats
    from an exact recompute over the compacted doclens (asserting they
    match the transactionally-maintained running stats — a mismatch
    means a crashed append/delete left the marker behind the data, and
    the recompute heals it).

    ``files_per_bucket`` bounds output file size at scale: postings are
    hash-spread across that many files per term bucket (doc_id-salted),
    so a 100 TB index compacts to buckets × files_per_bucket files
    without any single writer owning a whole bucket. Search results are
    bit-identical before/after (tests/test_index_delete.py).

    Reader caveat: the lock serializes WRITERS only. A search that
    LISTS the index during the few-second swap window sees, for the
    partitioned postings, retired ``band=``-style children that make
    the read fail loudly (safe); for the FLAT doclens dir it can see a
    partial file set — silently fewer docs for that one query. Run
    compaction in a read-quiet window, or re-run queries that overlap
    a compaction (the components labels artifact shows the versioned
    layout that removes this window; doclens keeps the flat layout for
    append-path compatibility)."""
    from ncbi_analysis_spark.operators import tombstones as ts

    root = path.rstrip("/")
    stored = _bm25_marker_read(spark, path)
    tmp = "_compact_tmp"
    with ts.maintenance_lock(spark, path, "compact_bm25_index") as lk:
        _compact_bm25_locked(spark, path, root, tmp, stored,
                             files_per_bucket, fence=lk.assert_owned)


def _compact_bm25_locked(spark, path, root, tmp, stored,
                         files_per_bucket, fence=None) -> None:
    from ncbi_analysis_spark.operators import tombstones as ts

    # finish any swap a previous compaction crashed out of (either
    # table) before deriving live views
    ts.resume_pending_swap(spark, root + "/postings")
    ts.resume_pending_swap(spark, root + "/doclens")

    live_post = ts.apply_tombstones(
        spark.read.parquet(root + "/postings"), path, "doc_id")
    if files_per_bucket <= 1:
        spread = live_post.repartition("bucket")
    else:
        spread = live_post.repartition(
            F.col("bucket"),
            F.pmod(F.xxhash64("doc_id"), F.lit(files_per_bucket)))
    live_dl = ts.apply_tombstones(
        spark.read.parquet(root + "/doclens"), path, "doc_id")
    # explicit size-based repartition: the scan alone does NOT fold
    # small files (spark.sql.files.minPartitionNum defaults to the core
    # count, so a many-small-files read stays many partitions — the
    # measured 20-appends run kept 20 doclens files without this);
    # target the session's maxPartitionBytes so output file count
    # tracks data size, not append count
    from ncbi_analysis_spark.operators.concurrency import run_jobs
    from ncbi_analysis_spark.sources import fsutil

    try:
        max_pb = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    except Exception:
        max_pb = 128 << 20
    n_out = max(1, -(-fsutil.dir_size(spark, root + "/doclens") // max_pb))
    # both live views rewrite into their own HIDDEN tmp dir — nothing is
    # visible until the swaps below, so the rewrites are independent
    # jobs (guide §2.6) run concurrently; the refreshed marker stats
    # ride the doclens rewrite as observe() metrics (the rows written
    # ARE the post-compaction doclens — same exact integers as the old
    # read-back, minus a full extra pass over the table)
    observed_dl, dl_stats = _observe_doclen_stats(live_dl)
    run_jobs(
        lambda: spread.write.mode("overwrite").partitionBy("bucket")
        .parquet(root + "/postings/" + tmp),
        lambda: observed_dl.repartition(n_out)
        .write.mode("overwrite").parquet(root + "/doclens/" + tmp),
    )
    if fence is not None:
        fence()  # owner fence before the first swap commit
    ts.swap_partition_dirs(spark, root + "/postings", tmp)
    ts.swap_partition_dirs(spark, root + "/doclens", tmp)
    ts.clear_tombstones(spark, path)

    fresh = dl_stats()
    stats = stored.get("stats")
    if stats is not None and stats != fresh:
        import warnings

        warnings.warn(
            f"BM25 marker stats {stats} disagreed with recompute "
            f"{fresh} at {path!r} (crashed append/delete?) — healed",
            stacklevel=2,
        )
    _bm25_marker_write(spark, path, int(stored["n_buckets"]), fresh)


def tokenize_queries(
    queries_df: DataFrame,
    query_id: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """``(query_id, g)`` distinct term rows for a query table — the
    corpus-side tokenizer applied to the query side, so batch search
    joins term-to-term with identical semantics."""
    return (
        queries_df.filter(
            F.col(query_col).isNotNull()
            & (F.length(F.trim(F.col(query_col))) > 0)
        )
        .select(
            F.col(query_id),
            F.explode(tokens(F.col(query_col))).alias("g"),
        )
        .distinct()
    )


def bm25_topk_batch(
    spark,
    path: str,
    queries_df: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` per query for a whole query TABLE, served from a
    persisted ``write_bm25_index`` directory — the hard-negative-mining
    form: no raw-text scan, no per-query Python loop.

    Output ``(query_id, doc_id, n_terms_matched, score, rk)`` with
    ``rk`` 1-based per query (score desc, doc_id asc tiebreak).

    Scale shape: the query table tokenizes into a bounded
    ``(query_id, g)`` term table; the distinct terms' buckets prune the
    postings read to |distinct terms| partitions; the pruned postings
    join the BROADCAST query-term table, then doc lengths on doc_id
    (keyed), then fold per (query, doc) in term order and window-top-k
    per query. Model state collected driver-side is bounded: (N, Σdl)
    read straight from the index marker (maintained exactly by
    write/append/delete — no per-batch doclens aggregation; legacy
    stat-less markers fall back to one scalar agg) plus one df
    row per distinct query term off the pruned postings — the idf
    literals stay a pinned Python ``math.log`` chain, same determinism
    contract as ``bm25_topk`` (idf table re-enters the plan as a
    broadcast literal table keyed by term).
    """
    from pyspark.sql import Window

    idx = read_bm25_index(spark, path)
    postings, doclens = idx["postings"], idx["doclens"]
    n_buckets = int(idx["params"]["n_buckets"])

    qterms = tokenize_queries(queries_df, query_id, query_col).persist()
    try:
        # the distinct-term table is bounded by construction (queries
        # are small); collect it once for the whole batch
        terms = sorted(
            {r["g"] for r in qterms.select("g").distinct().collect()}
        )
        if not terms:
            raise ValueError("bm25_topk_batch: no query terms")
        # buckets for the probe, computed by the SAME engine expression
        # that bucketed the index (xxhash64 is not re-derived in Python)
        tdf = spark.createDataFrame([(t,) for t in terms], "g string")
        trows = tdf.withColumn(
            "bucket", F.pmod(F.xxhash64("g"), F.lit(n_buckets))
        ).collect()
        buckets = sorted({int(r["bucket"]) for r in trows})

        # partition-pruned postings for the |terms| probe terms, reused
        # by the df collect and the scoring join
        pruned = (
            postings.filter(F.col("bucket").isin(buckets))
            .filter(F.col("g").isin(terms))
            .persist()
        )
        try:
            df_rows = {
                r["g"]: r["n"]
                for r in pruned.groupBy("g")
                .agg(F.count("*").cast("long").alias("n"))
                .collect()
            }
            # (N, Σdl) comes from the marker (maintained exactly at
            # write/append/delete — integer arithmetic, no drift), so a
            # query batch never pays a full doclens aggregation;
            # pre-stats legacy indexes fall back to the live-view agg
            stored = idx["params"].get("stats")
            if stored is not None:
                n_docs, sum_dl = stored["n_docs"], stored["sum_dl"]
            else:
                stats = doclens.agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum("dl").cast("long").alias("s"),
                ).collect()[0]
                n_docs, sum_dl = stats["n"], stats["s"]
            if n_docs == 0:
                raise ValueError("bm25_topk_batch: empty index")
            avgdl = float(sum_dl) / float(n_docs)
            idf = {
                t: math.log(
                    1.0
                    + (n_docs - df_rows.get(t, 0) + 0.5)
                    / (df_rows.get(t, 0) + 0.5)
                )
                for t in terms
            }

            # idf re-enters the plan as a broadcast literal TABLE keyed
            # by term, not _contrib_expr's chained WHEN — the per-term
            # expression chain is fine for human-sized single queries
            # but a 1,000-term synthetic batch would hit codegen
            # expression-depth pain; a hash-join lookup has no such
            # cliff and carries the exact same doubles
            idf_tbl = F.broadcast(spark.createDataFrame(
                [(t, float(idf[t])) for t in sorted(terms)],
                "g string, __idf double"))
            matched = pruned.join(F.broadcast(qterms), "g")
            contrib = F.col("__idf") * (
                F.col("tf").cast("double")
                / (
                    F.col("tf").cast("double")
                    + F.lit(float(k1))
                    * (
                        F.lit(1.0 - b)
                        + F.lit(float(b))
                        * (F.col("dl").cast("double")
                           / F.lit(float(avgdl)))
                    )
                )
            )
            scored = matched.join(doclens, "doc_id").join(
                idf_tbl, "g"
            ).select(
                query_id,
                "doc_id",
                "g",
                contrib.alias("contrib"),
            )
            pairs = F.array_sort(F.collect_list(F.struct("g", "contrib")))
            per_doc = scored.groupBy(query_id, "doc_id").agg(
                F.count("*").cast("long").alias("n_terms_matched"),
                F.aggregate(
                    pairs, F.lit(0.0), lambda acc, s: acc + s["contrib"]
                ).alias("score"),
            )
            w = Window.partitionBy(query_id).orderBy(
                F.desc("score"), F.asc("doc_id")
            )
            out = (
                per_doc.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= k)
            )
            # bounded output (|queries| * k rows): collect and rebuild
            # so the two probe caches are released before return
            schema = out.schema
            rows = out.collect()
        finally:
            pruned.unpersist()
    finally:
        qterms.unpersist()
    return spark.createDataFrame(rows, schema).orderBy(
        query_id, F.asc("rk")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rk",
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard way
    to combine heterogeneous rankings (keyword BM25 + a quality prior,
    or BM25 + embedding ANN) without calibrating their scores:
    ``score(id) = Σ_lists 1 / (c + rank)``. Rank-only fusion means the
    inputs' score scales never meet, and the arithmetic is exact
    rational (integer ranks, one IEEE division per term, fold in list
    order — pinned, bounded by len(rankings) per id).

    Each input needs ``(id_col, rank_col)`` with rank 1-based within
    that list. Output ``(id_col, n_lists, rrf_score)`` — ids missing
    from a list simply contribute nothing for it (the standard
    behavior). Scale: inputs are top-k tables (bounded); the fuse is a
    groupBy over their union — broadcastable by construction.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            F.col(id_col),
            F.lit(i).alias("__src"),
            F.col(rank_col).cast("long").alias("__rk"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    pairs = F.array_sort(F.collect_list(F.struct("__src", "__rk")))
    return tagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lists"),
        F.aggregate(
            pairs,
            F.lit(0.0),
            lambda acc, s: acc
            + F.lit(1.0) / (F.lit(float(c)) + s["__rk"].cast("double")),
        ).alias("rrf_score"),
    )


def retrieval_eval(
    results: DataFrame,
    qrels: DataFrame,
    q_id: str = "query_id",
    doc_id: str = "doc_id",
    rank_col: str = "rk",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Graded retrieval-quality metrics per query — the retrieval
    family's audit leg (the sibling of ``ann_recall_audit`` for ANN and
    ``lsh_banding_audit`` for dedup): judge a ranking
    (``bm25_topk_batch`` / ``rrf_fuse`` output, or any
    ``(q_id, doc_id, rank)`` table) against graded relevance judgments.

    Per query: ``ndcg_at_k`` (DCG with the standard ``rel / log2(rank
    + 1)`` position discount over the top-``k``, normalized by the
    ideal DCG of the query's own qrels), ``mrr`` (1/rank of the first
    relevant retrieved document), ``p_at_k`` (relevant-retrieved / k)
    and ``recall_at_k`` (relevant-retrieved / total relevant; NULL for
    a query with no relevant documents, whose ndcg/mrr are 0).

    Evaluation is driven from the QRELS side: every judged query gets a
    row, and a query the ranking missed entirely scores 0 — silent
    query dropout reads as a metric hit, not a shorter report.

    Scale: both legs are single keyed aggregations — the retrieved leg
    joins top-k rows (bounded |Q|·k) to qrels on (query, doc); the
    ideal leg windows qrels per query (judgment tables are
    sample-sized by construction). Nothing corpus-scale moves.
    Determinism: ranks and counts are integers; DCG sums of
    ``log2``-discounted grades are rounded to 6dp — the contract every
    float-emitting oracle row in this repo uses.
    """
    res = results.select(
        F.col(q_id).alias("__q"), F.col(doc_id).alias("__d"),
        F.col(rank_col).alias("__rk"),
    ).filter(F.col("__rk") <= k)
    qr = qrels.select(
        F.col(q_id).alias("__q"), F.col(doc_id).alias("__d"),
        F.col(rel_col).cast("double").alias("__rel"),
    )

    hit = (
        res.join(qr, ["__q", "__d"], "left")
        .withColumn("__rel", F.coalesce(F.col("__rel"), F.lit(0.0)))
        .groupBy("__q")
        .agg(
            F.sum(F.col("__rel") / F.log2(F.col("__rk") + 1)).alias("__dcg"),
            F.sum((F.col("__rel") > 0).cast("long")).alias("__n_rel_ret"),
            F.min(F.when(F.col("__rel") > 0, F.col("__rk"))).alias("__first"),
        )
    )

    w = Window.partitionBy("__q").orderBy(F.desc("__rel"), F.asc("__d"))
    ideal = (
        qr.withColumn("__rn", F.row_number().over(w))
        .groupBy("__q")
        .agg(
            F.sum(F.when(F.col("__rn") <= k,
                         F.col("__rel") / F.log2(F.col("__rn") + 1))
                  .otherwise(F.lit(0.0))).alias("__idcg"),
            F.sum((F.col("__rel") > 0).cast("long")).alias("__n_rel"),
        )
    )

    out = ideal.join(hit, "__q", "left")
    return out.select(
        F.col("__q").alias(q_id),
        F.col("__n_rel").alias("n_rel"),
        F.coalesce(F.col("__n_rel_ret"), F.lit(0)).alias("n_rel_ret"),
        F.round(
            F.when(F.col("__idcg") > 0,
                   F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.col("__idcg"))
            .otherwise(F.lit(0.0)), 6).alias("ndcg_at_k"),
        F.round(
            F.when(F.col("__first").isNotNull(), 1.0 / F.col("__first"))
            .otherwise(F.lit(0.0)), 6).alias("mrr"),
        F.round(F.coalesce(F.col("__n_rel_ret"), F.lit(0)) / F.lit(float(k)),
                6).alias("p_at_k"),
        F.when(F.col("__n_rel") > 0,
               F.round(F.coalesce(F.col("__n_rel_ret"), F.lit(0))
                       / F.col("__n_rel"), 6)).alias("recall_at_k"),
    )
